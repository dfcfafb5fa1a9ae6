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

/** How quantile boundaries are fitted (kbins / quantile-grid / robust
  * scaling). The 100 TB DEFAULT IS `Sketch`: the exact sort-based
  * percentile is the right tool only below the scale where a per-column
  * sort hurts, and `TDigest`'s merge-order-dependent centroids can
  * never be replayed by an external engine — the deterministic
  * log-histogram sketch is mergeable, bounded-state, AND
  * oracle-replayable, so the correctness protocol survives the switch
  * to the approximate path. `Exact` stays the test-SF default so the
  * fitted boundaries keep matching DuckDB's `quantile_cont` bit-for-bit.
  */
sealed trait QuantileFitMode
object QuantileFitMode {
  /** Sort-based exact percentile (interpolating) — small/medium SF. */
  case object Exact extends QuantileFitMode
  /** `percentile_approx` (t-digest): bounded memory, but merge-order
    * dependent — no external engine can replay it; kept as the
    * comparison point the bench row measures.
    */
  case object TDigest extends QuantileFitMode
  /** Deterministic log-histogram sketch
    * ([[graft.operators.QuantileSketch]]) — the documented 100 TB
    * default: mergeable by count addition, state bounded by the value
    * range, and every step a pure elementary function, so an SQL
    * oracle replays the approximate boundaries EXACTLY.
    */
  case object Sketch extends QuantileFitMode
}

/** Numerical feature handling (reference: utils/numerical_transformer.py).
  *
  * Scale design: `fit` runs ONE aggregation job covering every column's
  * min/max/mean/std (+ exact percentile boundaries when needed); the
  * fitted model is a handful of doubles on the driver; every transform
  * and inverse is a pure column expression — narrow, whole-stage
  * codegen, zero shuffle regardless of data size. The `Sketch`
  * quantile mode adds one more (narrow, map-side-combined) aggregation
  * over (column, geometric bucket) pairs.
  */
object NumericalTransformer {

  /** Anything bigger is suspicious (numerical_transformer.py:50). */
  val InfThreshold = 1e308

  /** ±inf / NaN / |x| > 1e308 → null (numerical_transformer.py:49-65). */
  def replaceInf(c: Column): Column =
    when(isnan(c) || c > InfThreshold || c < -InfThreshold, lit(null)).otherwise(c)

  /** One-pass stats for all `cols`; `quantileProbs` adds percentile
    * boundaries (used by kbins / quantile-grid / robust scaling),
    * fitted per [[QuantileFitMode]] — `Exact` below scale,
    * [[QuantileFitMode.Sketch]] as the documented 100 TB default.
    */
  def fit(
      df: DataFrame,
      cols: Seq[String],
      quantileProbs: Seq[Double] = Nil,
      quantileFit: QuantileFitMode = QuantileFitMode.Exact,
  ): Map[String, NumColStats] = {
    require(cols.nonEmpty, "no numerical columns to fit")
    val cleaned = df.select(cols.map(c => replaceInf(col(c)).as(c)): _*)
    val aggs = cols.flatMap { c =>
      val qAgg = quantileFit match {
        case _ if quantileProbs.isEmpty => Nil
        case QuantileFitMode.Sketch     => Nil // separate bucket-count job
        case QuantileFitMode.TDigest =>
          Seq(percentile_approx(col(c), lit(quantileProbs.toArray), lit(10000)).as(s"${c}__q"))
        case QuantileFitMode.Exact =>
          Seq(percentile(col(c), lit(quantileProbs.toArray)).as(s"${c}__q"))
      }
      Seq(
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        avg(col(c)).as(s"${c}__mean"),
        stddev_samp(col(c)).as(s"${c}__std"),
      ) ++ qAgg
    }
    val row = cleaned.agg(aggs.head, aggs.tail: _*).head()
    // Sketch boundaries: unpivot to (column, value) and run ONE
    // (column, geometric-bucket) count aggregation — map-side combined,
    // so the shuffle carries #cols × #occupied-buckets rows, not data.
    // The boundary for prob p is the first bucket representative whose
    // cumulative count reaches p·n (identical rule to the per-key
    // sketch profile, replayable in SQL).
    val sketchQs: Map[String, Seq[Double]] =
      if (quantileProbs.isEmpty || quantileFit != QuantileFitMode.Sketch) Map.empty
      else {
        val long = cleaned.select(explode(array(cols.map(c =>
          struct(lit(c).as("f"), col(c).cast("double").as("v"))): _*)).as("e"))
          .select(col("e.f").as("f"), col("e.v").as("v"))
          .where(col("v").isNotNull)
        val named = quantileProbs.zipWithIndex.map { case (p, i) => s"__q$i" -> p }
        graft.operators.QuantileSketch.profile(long, "f", "v", named)
          .collect().map(r => r.getAs[String]("f") ->
            named.map { case (nm, _) => r.getAs[Double](nm) }).toMap
      }
    def d(n: String): Double = row.getAs[Any](n) match {
      case null               => Double.NaN
      case x: java.lang.Number => x.doubleValue()
    }
    cols.map { c =>
      val qs =
        if (quantileProbs.isEmpty) Nil
        else if (quantileFit == QuantileFitMode.Sketch) sketchQs.getOrElse(c, Nil)
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
