package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY §2.4 row 46): the same
  * tumbling-window aggregation the batch engine runs, expressed as
  * readStream -> watermark -> window agg -> writeStream, with a
  * helper that drains all available input and hands back the final
  * table for batch-equivalence checks.
  *
  * Scale notes: the aggregation state is keyed on (window, event_type)
  * — bounded by time range x type cardinality; the 1-hour watermark
  * bounds state retention under append semantics on an unbounded
  * source. Shuffle partitioning follows spark.sql.shuffle.partitions
  * exactly like the batch plan.
  */
object StreamOps {

  /** File-source stream over the events table (schema from a batch
    * probe; ts is Long nanoseconds — TESTDATA nanos flag).
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // the file source wants a directory: stream the table dir, glob
    // down to the events file
    s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
  }

  /** Watermarked tumbling 1-hour window aggregation per event_type.
    * Works identically on a batch events DataFrame (batch equivalence).
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withColumn("tse", timestamp_seconds(col("ts") / lit(1e9)))
      .withWatermark("tse", "1 hour")
      .groupBy(window(col("tse"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_v"))
      .select(
        floor(unix_timestamp(col("window.start")) / 3600).as("bucket"),
        col("event_type"), col("n"), col("sum_v"))

  /** Drain every available microbatch into a memory sink (complete
    * mode) and return the final result table.
    */
  def runToBatch(s: SparkSession, streamDf: DataFrame): DataFrame = {
    val name = s"graft_stream_${System.nanoTime()}"
    val q = streamDf.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }
}
