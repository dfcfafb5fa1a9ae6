package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking. `Window.orderBy(...)` with no partition
  * key moves ALL rows into one partition — a non-starter at scale.
  * This implementation keeps the sort distributed AND stays inside
  * whole-stage codegen (no RDD conversion):
  *
  *   1. `repartitionByRange` on the value (range shuffle, balanced by
  *      sampled boundaries) + `sortWithinPartitions`, then
  *      `localCheckpoint` to PIN the physical layout — the boundary
  *      sampling is per-execution, so an unpinned plan could hand the
  *      offset job and the final job different partitionings;
  *   2. `monotonically_increasing_id` = pid·2³³ + local row index in
  *      physical (= sorted) order; per-partition row counts (one tiny
  *      #partitions-row aggregation) turn into partition offsets,
  *      broadcast back as a literal map, so the global 0-based
  *      sequence is offset[pid] + local index — a narrow projection,
  *      no zipWithIndex, no extra shuffle;
  *   3. SQL tie semantics (`percent_rank`): rank of a value = MIN
  *      sequence among its equals, via one groupBy + an equi-join
  *      back on the value.
  *
  * Cost: one range shuffle + one hash shuffle + a #partitions-row
  * offset job — instead of a single-partition sort of the entire
  * dataset. Partitions are limited to 2³³ rows each by the id encoding
  * (8.6 B rows per partition — far beyond a sane partition size).
  */
object Rank {

  /** Adds `outCol` = row_number() over (ORDER BY sortExprs) — exact,
    * 1-based, DISTRIBUTED: range shuffle on the sort key +
    * per-partition offsets, never a single-partition window. The
    * caller must pass a TOTAL order (include a unique tiebreaker such
    * as user_id) — positions of true ties would otherwise depend on
    * physical placement. Same offset device (and the same 2³³
    * rows-per-partition guard) as [[withPercentRank]].
    */
  def withRowNumber(df: DataFrame, sortExprs: Seq[Column], outCol: String): DataFrame = {
    val (seqDf, _) = sequenced(df, sortExprs)
    seqDf.withColumn(outCol, col("__seq") + 1L).drop("__mid", "__seq")
  }

  /** Adds `outCol` = percent_rank() over (ORDER BY valueCol) — ties
    * share the rank of their first row; output in [0,1].
    * Nulls must be handled by the caller (SQL window semantics order
    * them; here they would rank first).
    */
  def withPercentRank(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val (seqDf, n) = sequenced(df, Seq(col(valueCol)))
    val ranks = seqDf.groupBy(col(valueCol)).agg(min(col("__seq")).as("__rank"))
    seqDf.join(ranks, valueCol)
      .withColumn(outCol,
        if (n <= 1) lit(0.0) else col("__rank").cast("double") / lit((n - 1).toDouble))
      .drop("__mid", "__seq", "__rank")
  }

  /** Shared core: range-shuffle on `sortExprs`, pin the layout, turn
    * per-partition row counts into offsets, and return (df + `__seq`
    * = exact 0-based global sequence in sort order, total row count).
    * `__mid` stays on the frame for callers that drop it themselves.
    */
  private def sequenced(df: DataFrame, sortExprs: Seq[Column]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(par, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    val pidCol = shiftright(col("__mid"), 33)
    val locCol = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val counts = sorted.groupBy(pidCol.as("__pid"))
      .agg(count(lit(1)).as("__c"), max(locCol).as("__mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // ENFORCE the 2^33-rows-per-partition encoding limit instead of
    // documenting it: a local index that spills into the pid bits shows
    // up as a partition whose max local index disagrees with its row
    // count (or as a phantom pid past the partition count) — fail
    // loudly rather than silently mis-rank an extreme-skew range.
    val numPart = sorted.rdd.getNumPartitions.toLong
    counts.foreach { case (pid, c, mx) =>
      require(mx == c - 1 && pid < numPart,
        s"Rank: partition $pid index corrupt (count=$c, maxLocal=$mx, " +
          s"partitions=$numPart) — a range partition exceeded 2^33 rows; " +
          "raise the partition count")
    }
    val n = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, c, _) =>
      val off = acc; acc += c; pid -> off
    }
    val seqDf =
      if (offsets.isEmpty) sorted.withColumn("__seq", lit(0L))
      else {
        val offMap = map(offsets.toSeq.flatMap { case (pid, off) =>
          Seq(lit(pid), lit(off))
        }: _*)
        sorted.withColumn("__seq", element_at(offMap, pidCol) + locCol)
      }
    (seqDf, n)
  }
}
