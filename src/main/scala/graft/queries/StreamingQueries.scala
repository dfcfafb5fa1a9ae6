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

  val all: Seq[Q] = Seq(streamWindow)
}
