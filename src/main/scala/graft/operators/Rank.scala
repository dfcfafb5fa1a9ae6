package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global ranking. `Window.orderBy(...)` with no partition
  * key moves ALL rows into one partition — a non-starter at scale.
  * This implementation keeps the sort distributed:
  *
  *   1. `repartitionByRange` on the value (range shuffle, balanced by
  *      sampled boundaries) + `sortWithinPartitions`;
  *   2. `zipWithIndex` for the global 0-based sequence (partition
  *      sizes are counted once, offsets are added per partition —
  *      no data movement);
  *   3. SQL tie semantics (`percent_rank`): rank of a value = MIN
  *      sequence among its equals, via one groupBy + an equi-join
  *      back on the value.
  *
  * Cost: one range shuffle + one hash shuffle + a count job — instead
  * of a single-partition sort of the entire dataset.
  */
object Rank {

  /** Adds `outCol` = percent_rank() over (ORDER BY valueCol) — ties
    * share the rank of their first row; output in [0,1].
    * Nulls must be handled by the caller (SQL window semantics order
    * them; here they would rank first).
    */
  def withPercentRank(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(par, col(valueCol))
      .sortWithinPartitions(valueCol)
    val outSchema = sorted.schema.add("__seq", LongType, nullable = false)
    val zipped = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    val seqDf = spark.createDataFrame(zipped, outSchema)
    val n = df.count()
    val ranks = seqDf.groupBy(col(valueCol)).agg(min(col("__seq")).as("__rank"))
    seqDf.join(ranks, valueCol)
      .withColumn(outCol,
        if (n <= 1) lit(0.0) else col("__rank").cast("double") / lit((n - 1).toDouble))
      .drop("__seq", "__rank")
  }
}
