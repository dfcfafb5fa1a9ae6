package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** tsfresh-style per-series time-series features
  * (reference: preprocessor.py:558-638 `extract_ts_features`, which
  * delegates to tsfresh `extract_features`; definitions follow
  * tsfresh's feature_calculators).
  *
  * Scale design: every feature set is ONE `groupBy(seriesKey)` — hash
  * shuffle on the series key with map-side partial aggregation. The
  * order-dependent features (changes, autocorrelation, trend) first
  * apply a window partitioned BY THE SAME KEY, so the subsequent
  * groupBy reuses the exchange — one shuffle total, never a global
  * sort. Std/var are population (ddof=0) to match tsfresh/numpy.
  */
object TsFeatures {

  /** count/mean/std/min/max/sum/median/abs_energy
    * (tsfresh: length, mean, standard_deviation, minimum, maximum,
    * sum_values, median, abs_energy).
    */
  def basic(df: DataFrame, seriesKey: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.groupBy(col(seriesKey)).agg(
      count(v).as("n"),
      avg(v).as("mean_v"),
      stddev_pop(v).as("std_v"),
      min(v).as("min_v"),
      max(v).as("max_v"),
      sum(v).as("sum_v"),
      percentile(v, lit(0.5)).as("median_v"),
      sum(v * v).as("abs_energy"),
    )
  }

  /** mean_abs_change, mean_change, lag-1 autocorrelation (tsfresh
    * definitions: mean(|x_{i+1}-x_i|), (x_n-x_1)/(n-1), and
    * sum((x_t-mu)(x_{t+1}-mu)) / ((n-1) * var_pop)).
    */
  def change(df: DataFrame, seriesKey: String, orderCols: Seq[String], valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(seriesKey)).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col(seriesKey))
    val v = col(valueCol)
    val withLag = df.select(
      col(seriesKey), v.as("v"),
      lag(v, 1).over(w).as("prev"),
      avg(v).over(wAll).as("mu"),
    )
    // try_divide: single-point series (n-1 = 0) and constant series
    // (var_pop = 0) yield null, matching tsfresh's NaN
    withLag.groupBy(col(seriesKey)).agg(
      avg(abs(col("v") - col("prev"))).as("mean_abs_change"),
      try_divide(sum(col("v") - col("prev")), count(lit(1)) - 1).as("mean_change"),
      try_divide(sum((col("v") - col("mu")) * (col("prev") - col("mu"))),
        (count(lit(1)) - 1) * var_pop(col("v"))).as("autocorr_lag1"),
    )
  }

  /** Linear-trend slope/intercept of value over the 0-based row index
    * within the series (tsfresh linear_trend over range(len)).
    */
  def trend(df: DataFrame, seriesKey: String, orderCols: Seq[String], valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(seriesKey)).orderBy(orderCols.map(col): _*)
    val indexed = df.select(
      col(seriesKey), col(valueCol).as("v"),
      (row_number().over(w) - 1).cast("double").as("idx"),
    )
    indexed.groupBy(col(seriesKey)).agg(
      regr_slope(col("v"), col("idx")).as("trend_slope"),
      regr_intercept(col("v"), col("idx")).as("trend_intercept"),
    )
  }

  /** Distribution-shape features (tsfresh: population skewness/kurtosis
    * via central moments around the per-series mean,
    * count_above_mean / count_below_mean, first/last by time, range).
    * Window for the per-series mean + one groupBy on the same key —
    * the exchange is reused, one shuffle total.
    */
  def dist(df: DataFrame, seriesKey: String, orderCols: Seq[String], valueCol: String): DataFrame = {
    val wAll = Window.partitionBy(col(seriesKey))
    val v = col(valueCol)
    val withMu = df.select(
      col(seriesKey), v.as("v"),
      struct(orderCols.map(col): _*).as("ord"),
      avg(v).over(wAll).as("mu"),
    )
    // Central moments around the windowed-in per-series mean: raw power
    // sums avg(v^4) - 4*avg(v)*avg(v^3) + ... cancel catastrophically when
    // |mean| >> std, and distributed partial-agg order then diverges from a
    // sequential engine at 6 dp. avg((v-mu)^k) keeps magnitudes small and
    // the result order-stable.
    val d = col("v") - col("mu")
    val c2 = avg(d * d)
    val c3 = avg(d * d * d)
    val c4 = avg(d * d * d * d)
    withMu.groupBy(col(seriesKey)).agg(
      try_divide(c3, pow(c2, 1.5)).as("skewness"),
      (try_divide(c4, c2 * c2) - lit(3)).as("kurtosis"),
      sum(when(col("v") > col("mu"), 1L).otherwise(0L)).as("count_above_mean"),
      sum(when(col("v") < col("mu"), 1L).otherwise(0L)).as("count_below_mean"),
      min_by(col("v"), col("ord")).as("first_v"),
      max_by(col("v"), col("ord")).as("last_v"),
      (max(col("v")) - min(col("v"))).as("range_v"),
    )
  }

  /** The full feature matrix in ONE pass (reference:
    * preprocessor.py:558-638 `extract_ts_features` / tsfresh
    * `extract_features`): window-enrich (lag, series mean, index) on
    * the series key, then a single groupBy on the SAME key computes
    * every feature — the groupBy reuses the window's hash exchange, so
    * the whole matrix costs one shuffle.
    */
  def extract(df: DataFrame, seriesKey: String, orderCols: Seq[String],
              valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(seriesKey)).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col(seriesKey))
    val enriched = df.select(
      col(seriesKey), col(valueCol).as("v"),
      struct(orderCols.map(col): _*).as("ord"),
      lag(col(valueCol), 1).over(w).as("prev"),
      avg(col(valueCol)).over(wAll).as("mu"),
      (row_number().over(w) - 1).cast("double").as("idx"),
    )
    val v = col("v")
    // central moments around the windowed mu — see dist() for why
    val d = v - col("mu")
    val c2 = avg(d * d)
    val c3 = avg(d * d * d)
    val c4 = avg(d * d * d * d)
    enriched.groupBy(col(seriesKey)).agg(
      count(v).as("n"),
      avg(v).as("mean_v"),
      stddev_pop(v).as("std_v"),
      min(v).as("min_v"),
      max(v).as("max_v"),
      sum(v).as("sum_v"),
      percentile(v, lit(0.5)).as("median_v"),
      sum(v * v).as("abs_energy"),
      avg(abs(v - col("prev"))).as("mean_abs_change"),
      try_divide(sum(v - col("prev")), count(lit(1)) - 1).as("mean_change"),
      try_divide(sum((v - col("mu")) * (col("prev") - col("mu"))),
        (count(lit(1)) - 1) * var_pop(v)).as("autocorr_lag1"),
      regr_slope(v, col("idx")).as("trend_slope"),
      regr_intercept(v, col("idx")).as("trend_intercept"),
      try_divide(c3, pow(c2, 1.5)).as("skewness"),
      (try_divide(c4, c2 * c2) - lit(3)).as("kurtosis"),
      sum(when(v > col("mu"), 1L).otherwise(0L)).as("count_above_mean"),
      sum(when(v < col("mu"), 1L).otherwise(0L)).as("count_below_mean"),
      min_by(v, col("ord")).as("first_v"),
      max_by(v, col("ord")).as("last_v"),
      (max(v) - min(v)).as("range_v"),
    )
  }

  /** Relevance filter (reference: `extract_relevant_features` —
    * tsfresh keeps features significantly associated with the target).
    * Pearson |corr(feature, y)| >= minAbsCorr, computed for ALL
    * features in one aggregation over the joined (features ⋈ labels)
    * frame. Returns (feature, corr, kept) — constant-vs-target
    * features (corr undefined) are dropped.
    */
  def featureRelevance(features: DataFrame, labels: DataFrame, seriesKey: String,
                       labelCol: String, minAbsCorr: Double): DataFrame = {
    val featCols = features.columns.filterNot(_ == seriesKey).toSeq
    val joined = features.join(labels, seriesKey)
    val corrRow = joined.agg(
      featCols.map(c => corr(col(c).cast("double"), col(labelCol).cast("double")).as(c)).head,
      featCols.map(c => corr(col(c).cast("double"), col(labelCol).cast("double")).as(c)).tail: _*,
    ).head()
    val spark = features.sparkSession
    import spark.implicits._
    featCols.map { c =>
      val r = corrRow.getAs[Any](c) match {
        case null                        => None
        case d: java.lang.Double if d.isNaN => None
        case d: java.lang.Double         => Some(d.toDouble)
      }
      (c, r, r.exists(x => math.abs(x) >= minAbsCorr))
    }.toDF("feature", "corr", "kept")
  }

  /** Tumbling-window resample: bucket by `widthNanos` over a
    * nanosecond-epoch timestamp column, aggregate per (series, bucket).
    * One shuffle on the composite key.
    */
  def resample(df: DataFrame, seriesKey: String, tsNanosCol: String,
               valueCol: String, widthNanos: Long): DataFrame = {
    val bucket = floor(col(tsNanosCol) / lit(widthNanos)).as("bucket")
    // sum/mean ride an exact decimal(18,6) sum: double summation is
    // order-dependent, and distributed partial aggregation can flip the
    // 6-dp-rounded result vs a sequential engine on rounding-boundary
    // buckets. The decimal sum is exact → order-independent; mean is the
    // exact sum divided by n in double (identical inputs on both sides).
    val dec = sum(col(valueCol).cast("decimal(18,6)"))
    df.groupBy(col(seriesKey), bucket).agg(
      count(lit(1)).as("n"),
      dec.as("sum_dec"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"),
    ).select(
      col(seriesKey), col("bucket"), col("n"),
      (col("sum_dec").cast("double") / col("n")).as("mean_v"),
      col("sum_dec").cast("double").as("sum_v"),
      col("min_v"), col("max_v"),
    )
  }
}
