package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical seasonal decomposition and rolling anomaly scoring per
  * series — the statsmodels `seasonal_decompose` / rolling-z-score
  * monitoring pair a preprocessing engine feeds time-series models
  * with (reference scope: preprocessor.py's ts feature surface; these
  * are the decomposition/monitoring companions).
  *
  * Exactness (the ExactAgg convention throughout): every DISTRIBUTED
  * aggregation runs on micro-quantized int64 (order-free exact sums);
  * doubles appear only in per-row arithmetic on already-exact
  * integers, which is bit-deterministic between engines, so both
  * operators carry full value-level DuckDB oracles.
  */
object Decompose {

  /** Additive seasonal decomposition of each series' DAILY-TOTAL
    * sequence (statsmodels `seasonal_decompose(model="additive")`
    * analog, `period` over the observation index):
    *
    *   trend_i    = centered moving average over `period` rows
    *                (defined only where the full window exists)
    *   seasonal_p = mean of the detrended values at phase p, then
    *                normalized to zero mean across phases
    *   resid_i    = y_i − trend_i − seasonal_i
    *
    * The phase is (row index − 1) mod period over each series'
    * OBSERVED daily buckets — the semantics of "resample daily, drop
    * empty buckets, decompose by position", which keeps the operator
    * total on irregular series (no gap spine required).
    *
    * Integer plumbing: daily total dm = Σ round(v·1e6) (exact int
    * sum); centered-window numerator T = Σ_window dm (exact);
    * detrended ×period d7 = period·dm − T (exact); per-phase sum
    * S = Σ d7 (exact); phase mean micro-quantized once
    * (sq = round(S/(period·n))) so the cross-phase normalization is
    * again an exact integer sum. int64 headroom at sf0.1:
    * dm ≤ ~5e9, d7 ≤ ~4e10, S ≤ ~2e12 — a ≫1e6-day series would
    * shift the same formula to decimal(38).
    *
    * Scale: Exchange 1 hashes (key, bucket) for the daily rollup
    * (map-side combined); Exchange 2 hashes key for the index/trend
    * windows; the per-(key, phase) rollup re-shuffles only the tiny
    * daily table and its 7-row-per-key result broadcasts back. Wide
    * work is bounded by the daily row count, not the event count.
    */
  def seasonal(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, period: Int = 7): DataFrame = {
    val key: Column = col(keyCol)
    val nsPerDay = 86400000000000L
    val daily = df
      .select(key, expr(s"cast($tsCol as long) div $nsPerDay").as("bucket"),
        round(col(valueCol) * 1e6, 0).cast("long").as("mu"))
      .groupBy(key, col("bucket"))
      .agg(sum(col("mu")).as("dm"))
    val half = (period - 1) / 2
    val wIdx = Window.partitionBy(key).orderBy(col("bucket"))
    val wCtr = wIdx.rowsBetween(-half, half)
    val idxed = daily.select(key, col("bucket"), col("dm"),
      row_number().over(wIdx).as("idx"),
      sum(col("dm")).over(wCtr).as("t_num"),
      count(lit(1)).over(wCtr).as("t_cnt"))
    val withD7 = idxed.withColumn("phase", (col("idx") - 1) % period)
      .withColumn("d7",
        when(col("t_cnt") === period, lit(period) * col("dm") - col("t_num")))
    // the phase means and their cross-phase normalization ride WINDOWS
    // over the same frame instead of a groupBy + join-back: every
    // window partitions by (key) or (key, phase), both satisfied by
    // the hash(key) Exchange the index window already forced — so the
    // whole decomposition is ONE pass over one Exchange chain, where
    // the join-back formulation re-computed the daily rollup + trend
    // subtree a second time for the broadcast side (2x the heavy work
    // at 100 TB; caught by NewOpsPlanSpec's Exchange budget).
    val wPhase = Window.partitionBy(key, col("phase"))
    val wPhaseOrd = wPhase.orderBy(col("bucket"))
    val wKey = Window.partitionBy(key)
    val withSq = withD7
      .withColumn("sq",
        round(sum(col("d7")).over(wPhase) /
          (count(col("d7")).over(wPhase) * lit(period.toDouble)), 0).cast("long"))
      .withColumn("__rep",
        when(row_number().over(wPhaseOrd) === 1, col("sq")))
    val withSeas = withSq.withColumn("seas_m",
      col("sq") - sum(col("__rep")).over(wKey) / lit(period.toDouble))
    withSeas
      .select(key, col("bucket"),
        round(col("dm") / 1e6, 6).as("y_sum"),
        when(col("t_cnt") === period,
          round(col("t_num") / lit(period.toDouble) / 1e6, 6)).as("trend"),
        round(col("seas_m") / 1e6, 6).as("seasonal"),
        when(col("t_cnt") === period && col("seas_m").isNotNull,
          round((col("dm") - col("t_num") / lit(period.toDouble) - col("seas_m")) / 1e6, 6))
          .as("resid"))
  }

  /** Seasonal-strength metric over a [[seasonal]] output frame
    * (Hyndman & Athanasopoulos FPP: F = max(0, 1 −
    * Var(resid)/Var(seasonal+resid)) per series — near 1 = strongly
    * seasonal, 0 = none). Ratio of the n²-scaled variance numerators
    * (n·Σx² − (Σx)²), so n² cancels and no division order can drift;
    * inputs are the decompose frame's 6-dp-rounded doubles (identical
    * both engines), sums exact decimal(28,6) of per-row double
    * products — the q_corr_matrix recipe. Null when the denominator
    * variance is zero.
    */
  def seasonalStrength(decomposed: DataFrame, keyCol: String): DataFrame = {
    val key: Column = col(keyCol)
    val tot = col("seasonal") + col("resid")
    val v = decomposed
      .where(col("resid").isNotNull && col("seasonal").isNotNull)
      .groupBy(key)
      .agg(count(lit(1)).as("n"),
        sum(col("resid").cast("decimal(28,6)")).cast("double").as("sr"),
        sum((col("resid") * col("resid")).cast("decimal(28,6)")).cast("double").as("srr"),
        sum(tot.cast("decimal(28,6)")).cast("double").as("st"),
        sum((tot * tot).cast("decimal(28,6)")).cast("double").as("stt"))
    val numR = col("n") * col("srr") - col("sr") * col("sr")
    val numT = col("n") * col("stt") - col("st") * col("st")
    v.select(key, col("n"),
      when(numT > 0,
        round(greatest(lit(0.0), lit(1.0) - numR / numT), 6)).as("f_seasonal"))
  }

  /** Rolling z-score anomaly flags per series: each event scored
    * against the mean/std of the `window` PRECEDING events (current
    * row excluded — the score is a one-step-ahead surprise, so an
    * outlier never masks itself), flagged when |z| > `threshold`.
    * Undefined (null z) until `minN` history rows exist or when the
    * window has zero variance.
    *
    * Exactness: values quantize to 3 dp (m = round(v·1000)) so the
    * window's Σm and Σm² stay inside int64 (|v| ≤ ~5.6e2 at sf0.1 →
    * n·Σm² ≤ ~1.3e14); z = (n·m − S)/√(n·Q − S²) is a pure function
    * of exact integers. The 3-dp grid is the documented contract: z
    * is computed on quantized values (a 1e-3 value perturbation moves
    * z by ≤ ~1e-2/σ — monitoring-grade, and what makes the oracle
    * value-exact).
    *
    * Scale: ONE hash Exchange on the series key; the window sums are
    * a single sort + linear pass per partition. State is O(window)
    * per open frame — no global structure.
    */
  def rollingZ(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, window: Int = 20, minN: Int = 8,
               threshold: Double = 3.0): DataFrame = {
    val key: Column = col(keyCol)
    val e = df.select(key, col(tsCol).as("__ts"), col(valueCol).as("__v"),
      round(col(valueCol) * 1e3, 0).cast("long").as("m"))
    val w = Window.partitionBy(key).orderBy(col("__ts"))
      .rowsBetween(-window, -1)
    val scored = e.select(key, col("__ts"), col("__v"),
      col("m"), sum(col("m")).over(w).as("s"),
      sum(col("m") * col("m")).over(w).as("q"),
      count(lit(1)).over(w).as("n"))
    val varNum = col("n") * col("q") - col("s") * col("s")
    val z = when(col("n") >= minN && varNum > 0,
      (col("n") * col("m") - col("s")) / sqrt(varNum.cast("double")))
    scored.select(key, col("__ts").as(tsCol),
      round(col("__v"), 6).as("value"),
      round(z, 6).as("z"),
      when(z.isNotNull, (abs(z) > threshold).cast("int")).as("is_anomaly"))
  }
}
