package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL extraction + domain-blocklist filtering — the C4/RefinedWeb
  * curation stage that runs before any content heuristic: pull URLs
  * out of the text, resolve their domains, and flag documents that
  * cite blocklisted domains. The regexes live in the RE2 ∩ Java
  * common subset (like [[Pii]]) so an external engine replays the
  * extraction; the blocklist is a BROADCAST dimension (real lists are
  * ~1e5-1e7 domains — always the small side at corpus scale).
  */
object Urls {

  val UrlRe = "https?://[a-z0-9.-]+[a-z0-9/._-]*"
  val DomainRe = "https?://([a-z0-9.-]+)"

  /** Per-document URL counts and blocklist verdict: one narrow
    * extract + explode_outer (keeps URL-free docs), a broadcast left
    * join on the domain, one map-side-combined groupBy back to doc
    * granularity. keep = cites no blocklisted domain.
    */
  def filterByBlocklist(docs: DataFrame, idCol: String, textCol: String,
                        blocklist: DataFrame): DataFrame = {
    val urls = docs.select(col(idCol),
      explode_outer(expr(s"regexp_extract_all($textCol, '$UrlRe', 0)")).as("url"))
    val withDomain = urls.withColumn("domain",
      regexp_extract(col("url"), DomainRe, 1))
    withDomain
      .join(broadcast(blocklist.select(col("domain"), lit(1).as("__blocked"))),
        Seq("domain"), "left")
      .groupBy(col(idCol))
      .agg(count(col("url")).as("n_urls"),
        sum(coalesce(col("__blocked"), lit(0))).as("n_blocked"))
      .select(col(idCol), col("n_urls"), col("n_blocked"),
        (col("n_blocked") === 0).cast("int").as("keep"))
  }
}
