package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget sequence packing (the "pack documents into fixed
  * context windows" pre-training step).
  *
  * Two packers over the same hash-sharded layout:
  *  - the RUNNING-SUM packer (registered as `text_pack`): assign each
  *    doc to the bin its cumulative token count lands in — one window
  *    function, zero per-group state, but bins straddle doc
  *    boundaries' leftover space (waste grows with doc-length
  *    variance);
  *  - FIRST-FIT-DECREASING (here): within each shard, place docs
  *    longest-first into the first bin with room, opening a new bin
  *    when none fits. The classic bin-packing heuristic (≤ 11/9·OPT
  *    + 1 bins); waste is never worse than the running-sum packer on
  *    the same shard (PackingSpec asserts it empirically).
  *
  * Scale shape: ONE hash shuffle on the shard key (32-way+ parallel),
  * per-shard sorted iterator via [[GroupedApply]], per-shard state =
  * the open-bin capacity array (bounded by bins per shard). The
  * assignment depends on in-shard order, so it is deterministic given
  * (tokens desc, id) — but not SQL-window-expressible, hence
  * bench+spec coverage rather than a DuckDB oracle row.
  */
object Packing {

  /** FFD packing: returns (id, shard, tokens, pack_id). Docs longer
    * than `capacity` get a dedicated overflow bin (same as the
    * running-sum packer, which also cannot split a doc).
    */
  def packFFD(df: DataFrame, idCol: String, tokensCol: String,
              shardCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val in = df.select(col(shardCol).cast("long").as("shard"),
      col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("tokens"),
      (-col(tokensCol).cast("long")).as("neg_tokens"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("shard", LongType),
      StructField("tokens", LongType), StructField("pack_id", LongType)))
    GroupedApply(in, Seq("shard"), Seq("neg_tokens", "id"), outSchema) {
      (key, it) =>
        val shard = key.getLong(0)
        // remaining capacity per open bin; first-fit scan. Bounded by
        // the shard's bin count (≈ shard tokens / capacity).
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { r =>
          val id = r.getLong(1)
          val tokens = r.getLong(2)
          var bin = -1
          var i = 0
          while (bin < 0 && i < remaining.length) {
            if (remaining(i) >= tokens) bin = i
            i += 1
          }
          if (bin < 0) {
            remaining += math.max(capacity - tokens, 0L)
            bin = remaining.length - 1
          } else {
            remaining(bin) -= tokens
          }
          Row(id, shard, tokens, bin.toLong)
        }
    }
  }

  /** Mean per-bin waste fraction: Σ max(0, capacity − fill) /
    * (bins · capacity). Overflow bins (single doc > capacity) carry
    * zero waste by the max(0, ·) clamp — both packers create them
    * identically, so the comparison stays apples-to-apples.
    */
  def wasteFraction(packed: DataFrame, tokensCol: String,
                    shardCol: String, packCol: String, capacity: Long): Double = {
    val row = packed.groupBy(col(shardCol), col(packCol))
      .agg(sum(col(tokensCol)).as("fill"))
      .agg(sum(greatest(lit(capacity) - col("fill"), lit(0L))).as("waste"),
        count(lit(1)).as("bins"))
      .head()
    row.getLong(0).toDouble / (row.getLong(1) * capacity)
  }
}
