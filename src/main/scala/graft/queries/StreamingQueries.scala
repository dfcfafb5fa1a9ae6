package graft.queries

import graft.Q
import graft.streaming.StreamOps

/** Streaming coverage (SURVEY §2.4 row 46): the driver gets the final
  * materialized result of the streaming window aggregation, which must
  * equal the batch aggregation (and the DuckDB oracle).
  */
object StreamingQueries {

  val streamWindow: Q = Q(
    "stream_window",
    (s, dir) => StreamOps.runToBatch(s, StreamOps.windowAgg(StreamOps.eventsStream(s, dir))),
    Some("""
      SELECT floor(epoch_ns(ts) / 3600000000000)::BIGINT AS bucket,
             event_type,
             count(*) AS n,
             round(sum(value), 6) AS sum_v
      FROM events GROUP BY 1, 2
    """),
  )

  /** Stateful sessionization (30-min gap): streaming append mode emits
    * the gap-CLOSED sessions plus sessions closed by EVENT-TIME TIMEOUT
    * — after the data is drained the watermark settles at
    * max(event time) - 1h, and any open session with end + gap strictly
    * below it times out, emits, and evicts its state. The oracle
    * reproduces gap/cumsum sessionization and applies the identical
    * closed-or-timed-out predicate.
    */
  val streamSessionize: Q = Q(
    "stream_sessionize",
    (s, dir) => {
      val gap = 30L * 60 * 1000 * 1000 * 1000
      import org.apache.spark.sql.functions._
      // DuckDB reads the nanos timestamps at microsecond precision;
      // truncate for hash parity (session semantics unchanged)
      val events = StreamOps.eventsStream(s, dir)
        .withColumn("ts", expr("ts div 1000 * 1000"))
      StreamOps.runToBatch(s, StreamOps.sessionize(events, gap).toDF(),
        mode = "append")
        .select(col("user_id"), col("start_ns"), col("end_ns"), col("n"),
          round(col("sum_v"), 6).as("sum_v"))
    },
    Some("""
      WITH s AS (SELECT user_id, epoch_ns(ts) AS ts_ns, value FROM events),
      m AS (
        SELECT user_id, ts_ns, value,
               CASE WHEN ts_ns - lag(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns)
                         > 1800000000000 THEN 1 ELSE 0 END AS new_sess
        FROM s),
      c AS (
        SELECT user_id, ts_ns, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM m),
      g AS (
        SELECT user_id, sess_id, min(ts_ns) AS start_ns, max(ts_ns) AS end_ns,
               count(*) AS n, round(sum(value), 6) AS sum_v
        FROM c GROUP BY 1, 2),
      mx AS (SELECT user_id, max(end_ns) AS max_end FROM g GROUP BY 1),
      wm AS (SELECT max(ts_ns) // 1000000 - 3600000 AS wm_ms FROM s)
      SELECT g.user_id, g.start_ns, g.end_ns, g.n, g.sum_v
      FROM g JOIN mx ON g.user_id = mx.user_id CROSS JOIN wm
      WHERE g.end_ns < mx.max_end
         OR g.end_ns // 1000000 + 1800000 < wm.wm_ms
    """),
  )

  /** Streaming exact dedup on (user_id, event_type): append mode emits
    * each key's first occurrence — the emitted KEY SET equals batch
    * DISTINCT (the survivor row itself would depend on arrival order,
    * so only keys are emitted).
    */
  val streamDedup: Q = Q(
    "stream_dedup",
    (s, dir) => StreamOps.runToBatch(s,
      StreamOps.dedupStream(StreamOps.eventsStream(s, dir),
        Seq("user_id", "event_type")),
      mode = "append"),
    Some("SELECT DISTINCT user_id, event_type FROM events"),
  )

  val all: Seq[Q] = Seq(streamWindow, streamSessionize, streamDedup)
}
