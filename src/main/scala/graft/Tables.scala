package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table readers for the driver-generated TPC-H-ish testdata.
  * Column pruning + filter pushdown happen at the parquet scan because
  * everything downstream is declarative DataFrame API.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** The engine convention is `ts` = Long nanoseconds since epoch.
    * The driver's generator has emitted events.ts as parquet
    * TIMESTAMP(NANOS) (readable only under the nanosAsLong legacy
    * flag, already as Long nanos) and as TIMESTAMP(MICROS)
    * (isAdjustedToUTC=0 → Spark TIMESTAMP_NTZ). Read either physical
    * type and normalize to Long nanos so every downstream
    * `cast(ts as long)` site keeps its meaning. Timestamps in the
    * testdata are UTC wall-clock; the session is pinned to UTC so the
    * NTZ→epoch interpretation is exact and replayable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeTs(t(s, d, "events"))
  }

  /** Normalize an events-shaped frame's `ts` to Long nanos since epoch
    * (no-op when the nanos legacy flag already produced a Long).
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df
    case TimestampNTZType | TimestampType =>
      df.withColumn(
        "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case other =>
      throw new IllegalStateException(s"events.ts: unexpected type $other")
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
