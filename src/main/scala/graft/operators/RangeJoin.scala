package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join WITHOUT an equi key.
  *
  * Spark's optimizer turns a bare `p.join(iv, p.v >= iv.lo && p.v <
  * iv.hi)` into a broadcast-nested-loop join — O(|points| ×
  * |intervals|), the classic scale-killer. The scalable formulation
  * buckets the value domain: each interval explodes to the fixed-width
  * buckets it covers, each point maps to its single bucket, and an
  * EQUI-join on the bucket id (one balanced hash shuffle) with the
  * range predicate as a residual filter reproduces the exact result.
  * Candidate fan-out per interval = ceil(length / bucketWidth) + 1, so
  * pick `bucketWidth` near the median interval length.
  *
  * A point falls in exactly one bucket, so no pair can be produced
  * twice — no dedup pass needed.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
