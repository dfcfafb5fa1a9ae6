package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Per-column statistics fitted in one pass. `quantiles(k)` holds the
  * exact k/(n+1)-quantile boundaries when kbins/quantile-grid scaling
  * was requested.
  */
final case class NumColStats(
    min: Double,
    max: Double,
    mean: Double,
    std: Double,
    quantiles: Seq[Double] = Nil,
)

/** Null-fill strategies for numerical columns
  * (reference: utils/numerical_transformer.py:67-103 NUM_FILL_NULL_STRATEGIES).
  * Order-dependent strategies (Forward/Backward/Interpolate) additionally
  * need a per-series window — see [[NumericalTransformer.forwardFill]] etc.
  */
sealed trait FillStrategy
object FillStrategy {
  case object None_       extends FillStrategy
  case object Mean        extends FillStrategy
  case object Min         extends FillStrategy
  case object Max         extends FillStrategy
  case object Zero        extends FillStrategy
  case object One         extends FillStrategy
  final case class Value(v: Double) extends FillStrategy
}

/** Numerical feature handling (reference: utils/numerical_transformer.py).
  *
  * Scale design: `fit` runs ONE aggregation job covering every column's
  * min/max/mean/std (+ exact percentile boundaries when needed); the
  * fitted model is a handful of doubles on the driver; every transform
  * and inverse is a pure column expression — narrow, whole-stage
  * codegen, zero shuffle regardless of data size.
  */
object NumericalTransformer {

  /** Anything bigger is suspicious (numerical_transformer.py:50). */
  val InfThreshold = 1e308

  /** ±inf / NaN / |x| > 1e308 → null (numerical_transformer.py:49-65). */
  def replaceInf(c: Column): Column =
    when(isnan(c) || c > InfThreshold || c < -InfThreshold, lit(null)).otherwise(c)

  /** One-pass stats for all `cols`; `quantileProbs` adds exact
    * percentile boundaries (used by kbins / quantile-grid scaling).
    * At very large scale pass `approxQuantiles = true` to swap the
    * exact sort-based percentile for the t-digest sketch.
    */
  def fit(
      df: DataFrame,
      cols: Seq[String],
      quantileProbs: Seq[Double] = Nil,
      approxQuantiles: Boolean = false,
  ): Map[String, NumColStats] = {
    require(cols.nonEmpty, "no numerical columns to fit")
    val cleaned = df.select(cols.map(c => replaceInf(col(c)).as(c)): _*)
    val aggs = cols.flatMap { c =>
      val qAgg =
        if (quantileProbs.isEmpty) Nil
        else if (approxQuantiles)
          Seq(percentile_approx(col(c), lit(quantileProbs.toArray), lit(10000)).as(s"${c}__q"))
        else Seq(percentile(col(c), lit(quantileProbs.toArray)).as(s"${c}__q"))
      Seq(
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        avg(col(c)).as(s"${c}__mean"),
        stddev_samp(col(c)).as(s"${c}__std"),
      ) ++ qAgg
    }
    val row = cleaned.agg(aggs.head, aggs.tail: _*).head()
    def d(n: String): Double = row.getAs[Any](n) match {
      case null               => Double.NaN
      case x: java.lang.Number => x.doubleValue()
    }
    cols.map { c =>
      val qs =
        if (quantileProbs.isEmpty) Nil
        else row.getAs[scala.collection.Seq[Double]](s"${c}__q").toSeq
      c -> NumColStats(d(s"${c}__min"), d(s"${c}__max"), d(s"${c}__mean"), d(s"${c}__std"), qs)
    }.toMap
  }

  /** Stateless fill using fit-time stats (mean/min/max) or constants. */
  def fill(c: Column, strategy: FillStrategy, stats: => NumColStats): Column =
    strategy match {
      case FillStrategy.None_    => c
      case FillStrategy.Mean     => coalesce(c, lit(stats.mean))
      case FillStrategy.Min      => coalesce(c, lit(stats.min))
      case FillStrategy.Max      => coalesce(c, lit(stats.max))
      case FillStrategy.Zero     => coalesce(c, lit(0.0))
      case FillStrategy.One      => coalesce(c, lit(1.0))
      case FillStrategy.Value(v) => coalesce(c, lit(v))
    }

  /** Series window: ALWAYS partitioned by a series key — a per-series
    * sort after one hash shuffle; never a global single-partition sort.
    */
  def seriesWindow(partition: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(order: _*)

  /** Last non-null value at or before the current row (polars
    * fill_null(strategy="forward")).
    */
  def forwardFill(c: Column, w: WindowSpec): Column =
    last(c, ignoreNulls = true).over(w.rowsBetween(Window.unboundedPreceding, 0))

  /** First non-null value at or after the current row (strategy="backward"). */
  def backwardFill(c: Column, w: WindowSpec): Column =
    first(c, ignoreNulls = true).over(w.rowsBetween(0, Window.unboundedFollowing))

  /** Linear interpolation by row position within the series (polars
    * `.interpolate()`): nulls between two known points are filled
    * linearly; leading/trailing nulls stay null. Four window
    * expressions over one shared (partition, order) — a single
    * shuffle+sort per series partition.
    */
  def interpolate(c: Column, w: WindowSpec): Column = {
    val back  = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd   = w.rowsBetween(0, Window.unboundedFollowing)
    val rn    = row_number().over(w)
    val rnOf  = when(c.isNotNull, rn)
    val prevV = last(c, ignoreNulls = true).over(back)
    val prevI = last(rnOf, ignoreNulls = true).over(back)
    val nextV = first(c, ignoreNulls = true).over(fwd)
    val nextI = first(rnOf, ignoreNulls = true).over(fwd)
    val interp = prevV + (nextV - prevV) * (rn - prevI) / (nextI - prevI)
    coalesce(c, interp)
  }
}
