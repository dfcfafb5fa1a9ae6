package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{AsofJoin, Skew}

/** Scale-pattern operators: as-of join and skew-salted aggregation.
  * Both oracle-checked (DuckDB has a native ASOF JOIN; the salted agg
  * must equal the plain GROUP BY).
  */
object ScaleOpsQueries {

  /** For every click event: the most recent error event of the same
    * user at or before it. Timestamps emitted at microsecond precision
    * (DuckDB reads the nanos parquet at micros).
    */
  val qAsof: Q = Q(
    "q_asof_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.where(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asof(clicks, errors, "user_id", "ts",
        leftCols = Seq("event_id"), rightCols = Seq("ts", "value"), prefix = "err_")
        .select(
          col("event_id"), col("user_id"),
          // integer division: `/` would cast the nanos Long (~2^60, above
          // double's 2^53 exact range) to double and land on the wrong µs
          expr("err_ts div 1000").as("err_ts_us"),
          round(col("err_value"), 6).as("err_value"))
    },
    Some("""
      SELECT l.event_id, l.user_id,
             epoch_us(r.ts) AS err_ts_us,
             round(r.value, 6) AS err_value
      FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """),
  )

  /** Q1-style aggregation over the 6-key l_returnflag/l_linestatus
    * space, two-stage salted — identical result to the plain groupBy,
    * but the first shuffle fans each hot key over 64 salt buckets.
    */
  val qAggSalted: Q = Q(
    "q_agg_salted",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("uk"))
      Skew.saltedAgg(l, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"), uniqueCol = "uk")
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_l_quantity"), 4).as("sum_qty"),
          col("cnt_l_quantity").as("n_qty"),
          round(col("min_l_quantity"), 4).as("min_qty"),
          round(col("max_l_quantity"), 4).as("max_qty"),
          round(col("avg_l_extendedprice"), 4).as("avg_price"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             count(l_quantity) AS n_qty,
             round(min(l_quantity), 4) AS min_qty,
             round(max(l_quantity), 4) AS max_qty,
             round(avg(l_extendedprice), 4) AS avg_price
      FROM lineitem GROUP BY 1, 2
    """),
  )

  val all: Seq[Q] = Seq(qAsof, qAggSalted)
}
