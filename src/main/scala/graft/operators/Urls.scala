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

  /** Canonical form of a URL column — the CCNet/C4 URL-dedup key:
    * lowercase, strip the scheme, a leading `www.`, any query/fragment
    * tail (where the tracking params live), and a trailing slash.
    * Each step is one regexp_replace in the RE2 ∩ Java common subset,
    * so an external engine replays the key bit-for-bit.
    */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val lower0 = lower(url)
    val noScheme = regexp_replace(lower0, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noQuery = regexp_replace(noWww, "[?#].*$", "")
    regexp_replace(noQuery, "/$", "")
  }

  /** URL-keyed keep-first dedup — the stage crawl pipelines run
    * BEFORE any content pass (same page re-crawled under scheme/www/
    * tracking-param variants must not reach the expensive near-dup
    * machinery): group on [[canonicalUrl]], survivor = min id. One
    * narrow projection + one hash groupBy on a balanced key — the
    * [[Dedup.exact]] shape with the canonical URL as content hash.
    */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(col(idCol), canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_variants"))
      .select(col(idCol), col("canonical_url"), col("n_variants"))

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
