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

  /** Interval×interval OVERLAP join (half-open: a.lo < b.hi && b.lo <
    * a.hi) on non-negative integer bounds — same bucket trick, both
    * sides exploded to their covered buckets and equi-joined on
    * (keys…, bucket). A pair overlapping k shared buckets would emit
    * k times; instead of a distinct pass, each pair is attributed to
    * exactly ONE canonical bucket — the bucket of max(a.lo, b.lo),
    * which both sides provably cover — so the join output is already
    * duplicate-free. Fan-out per row = ceil(length/bucketWidth) + 1;
    * pick bucketWidth near the median interval length. One balanced
    * hash shuffle on (keys…, bucket); never a nested loop.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val le = left.withColumn("__bucket",
      explode(sequence(expr(s"$lLo div $bucketWidth"), expr(s"$lHi div $bucketWidth"))))
    val re = right.withColumn("__bucket",
      explode(sequence(expr(s"$rLo div $bucketWidth"), expr(s"$rHi div $bucketWidth"))))
    le.join(re, keys :+ "__bucket")
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bucket") === expr(s"greatest($lLo, $rLo) div $bucketWidth"))
      .drop("__bucket")
  }
}
