package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.TsFeatures

/** Time-series feature extraction coverage (SURVEY §2.2 rows 25-28)
  * over events(user_id, ts, value). events.ts is Long nanoseconds in
  * Spark (TESTDATA nanos flag) and TIMESTAMP in DuckDB — oracles use
  * epoch_ns for parity.
  */
object TsQueries {

  // ---------------------------------------------------------------- §2.2/25
  val tsBasic: Q = Q(
    "ts_features_basic",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("value"))
      val f = TsFeatures.basic(e, "user_id", "value")
      f.select(col("user_id"), col("n"),
        round(col("mean_v"), 6).as("mean_v"),
        round(col("std_v"), 6).as("std_v"),
        round(col("min_v"), 6).as("min_v"),
        round(col("max_v"), 6).as("max_v"),
        round(col("sum_v"), 6).as("sum_v"),
        round(col("median_v"), 6).as("median_v"),
        round(col("abs_energy"), 6).as("abs_energy"))
    },
    Some("""
      SELECT user_id, count(value) AS n,
             round(avg(value), 6) AS mean_v,
             round(stddev_pop(value), 6) AS std_v,
             round(min(value), 6) AS min_v,
             round(max(value), 6) AS max_v,
             round(sum(value), 6) AS sum_v,
             round(median(value), 6) AS median_v,
             round(sum(value * value), 6) AS abs_energy
      FROM events GROUP BY user_id
    """),
  )

  // ---------------------------------------------------------------- §2.2/26
  val tsChange: Q = Q(
    "ts_features_change",
    (s, dir) => {
      val e = Tables.events(s, dir).select(
        col("user_id"), col("ts"), col("event_id"), col("value"))
      val f = TsFeatures.change(e, "user_id", Seq("ts", "event_id"), "value")
      f.select(col("user_id"),
        round(col("mean_abs_change"), 6).as("mean_abs_change"),
        round(col("mean_change"), 6).as("mean_change"),
        round(col("autocorr_lag1"), 6).as("autocorr_lag1"))
    },
    Some("""
      WITH lagged AS (
        SELECT user_id, value AS v,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
               avg(value) OVER (PARTITION BY user_id) AS mu
        FROM events)
      SELECT user_id,
             round(avg(abs(v - prev)), 6) AS mean_abs_change,
             round(sum(v - prev) / (count(*) - 1), 6) AS mean_change,
             round(sum((v - mu) * (prev - mu)) / ((count(*) - 1) * var_pop(v)), 6)
               AS autocorr_lag1
      FROM lagged GROUP BY user_id
    """),
  )

  // ---------------------------------------------------------------- §2.2/27
  val tsTrend: Q = Q(
    "ts_features_trend",
    (s, dir) => {
      val e = Tables.events(s, dir).select(
        col("user_id"), col("ts"), col("event_id"), col("value"))
      val f = TsFeatures.trend(e, "user_id", Seq("ts", "event_id"), "value")
      f.select(col("user_id"),
        round(col("trend_slope"), 6).as("trend_slope"),
        round(col("trend_intercept"), 6).as("trend_intercept"))
    },
    Some("""
      WITH indexed AS (
        SELECT user_id, value AS v,
               (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::DOUBLE
                 AS idx
        FROM events)
      SELECT user_id,
             round(regr_slope(v, idx), 6) AS trend_slope,
             round(regr_intercept(v, idx), 6) AS trend_intercept
      FROM indexed GROUP BY user_id
    """),
  )

  // ---------------------------------------------------------------- §2.2/28
  val tsResample: Q = Q(
    "ts_resample",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("ts"), col("value"))
      val f = TsFeatures.resample(e, "user_id", "ts", "value", 3600L * 1000 * 1000 * 1000)
      f.select(col("user_id"), col("bucket"), col("n"),
        round(col("mean_v"), 6).as("mean_v"),
        round(col("sum_v"), 6).as("sum_v"),
        round(col("min_v"), 6).as("min_v"),
        round(col("max_v"), 6).as("max_v"))
    },
    Some("""
      SELECT user_id,
             floor(epoch_ns(ts) / 3600000000000) AS bucket,
             count(*) AS n,
             round(avg(value), 6) AS mean_v,
             round(sum(value), 6) AS sum_v,
             round(min(value), 6) AS min_v,
             round(max(value), 6) AS max_v
      FROM events GROUP BY 1, 2
    """),
  )

  val all: Seq[Q] = Seq(tsBasic, tsChange, tsTrend, tsResample)
}
