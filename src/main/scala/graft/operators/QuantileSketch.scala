package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic log-histogram quantile sketch — the mergeable,
  * bounded-state approximate-quantile path for 100 TB fits and
  * streaming profiles.
  *
  * Unlike t-digest / Greenwald-Khanna (whose centroids depend on merge
  * order, so no external engine can replay them), this sketch buckets
  * values on a FIXED geometric grid: bucket(v) = ⌊ln|v|/ln γ⌋ signed,
  * γ = 1.1, representative = mid-bucket sign·γ^(b+0.5). Every step is
  * a pure elementary function of the value, so the sketch is
  * order-free, mergeable by count addition, and an SQL oracle replays
  * it EXACTLY — the repo's correctness protocol keeps working on the
  * approximate path. Relative value error ≤ ~5% (half a γ-bucket);
  * rank error zero at bucket granularity. State per key is one count
  * per occupied bucket — ~290 buckets per decade-sign range at γ=1.1,
  * bounded regardless of row count.
  */
object QuantileSketch {
  val Gamma = 1.1
  val LnGamma: Double = math.log(Gamma)

  /** Mid-bucket representative of v's geometric bucket (0 → 0). */
  def repCol(v: Column): Column =
    when(v === 0, lit(0.0)).otherwise(
      signum(v) * exp((floor(log(abs(v)) / lit(LnGamma)) + lit(0.5)) * lit(LnGamma)))

  /** Scala mirror of [[repCol]] for driver/stream folds. Spark's
    * Catalyst math expressions call StrictMath (fdlibm), NOT the
    * intrinsified java.lang.Math — Math.exp differs by 1 ulp on real
    * inputs (caught by the stream-equals-batch spec), so the mirror
    * must call StrictMath too.
    */
  def repOf(v: Double): Double =
    if (v == 0.0) 0.0
    else math.signum(v) * java.lang.StrictMath.exp(
      (math.floor(java.lang.StrictMath.log(math.abs(v)) / LnGamma) + 0.5) * LnGamma)

  /** Per-key approximate quantiles from the sketch: one groupBy on
    * (key, bucket) with map-side combine, one per-key window over the
    * OCCUPIED buckets (bounded, not row count), quantile q = the first
    * representative whose cumulative count reaches q·n.
    */
  def profile(df: DataFrame, key: String, valueCol: String,
              qs: Seq[(String, Double)]): DataFrame = {
    val counts = df.groupBy(col(key), repCol(col(valueCol)).as("rep"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(key)).orderBy(col("rep"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(key))
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wAll))
    val aggs = max(col("n")).as("n") +: qs.map { case (name, q) =>
      min(when(col("cum") >= lit(q) * col("n"), col("rep"))).as(name)
    }
    cum.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Quantile selection from a bucket-count map — the identical
    * cumulative rule as [[profile]], for the streaming fold.
    */
  def select(buckets: Map[Double, Long], q: Double): Double =
    if (buckets.isEmpty) Double.NaN
    else {
      val sorted = buckets.toSeq.sortBy(_._1)
      val n = buckets.valuesIterator.sum
      var cum = 0L
      sorted.find { case (_, c) => cum += c; cum >= q * n }
        .map(_._1).getOrElse(sorted.last._1)
    }
}
