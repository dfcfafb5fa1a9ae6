package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark only reads
    * via the nanosAsLong legacy flag (as Long nanos since epoch) —
    * set lazily so it also holds under a driver-owned session.
    * Downstream code treats ts as Long nanos; `tsSeconds` converts.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
