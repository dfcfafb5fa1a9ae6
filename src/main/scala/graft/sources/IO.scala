package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks. Everything rides Spark's DataSource V2 file
  * formats, so column pruning, predicate/partition pruning, and split
  * planning come from Catalyst. Always pass an explicit schema when
  * reading text formats at scale — schema inference is a full extra
  * pass over the data.
  */
object IO {

  /** A PER-PROCESS scratch directory under /tmp/graft_io, wiped before
    * return: repeated bench/verify runs within one JVM reuse one
    * bounded location instead of leaking a fresh createTempDirectory
    * per execution — and sinks with append semantics (VersionedV2) get
    * the clean slate determinism needs. The path carries the JVM's pid
    * so two concurrent processes (e.g. the python smoke pytest
    * alongside a Scala Verify/Bench run) cannot wipe each other's live
    * table or checkpoint mid-query; accumulation stays bounded by
    * best-effort removal of same-name dirs whose owning pid is dead.
    */
  def freshScratchDir(name: String): String =
    scratchDir(name, wipeOwn = true)

  /** Like [[freshScratchDir]] but KEEPS the current process's existing
    * contents: callers that maintain a standing artifact across
    * queries within one JVM (the persisted MinHash band index that
    * `dedup_incremental` probes, built once by the `band_index_write`
    * bench row) get reuse instead of a rebuild per timed run, while
    * stale same-name dirs of dead pids are still reclaimed.
    */
  def stableScratchDir(name: String): String =
    scratchDir(name, wipeOwn = false)

  private def scratchDir(name: String, wipeOwn: Boolean): String = {
    def wipe(p: java.nio.file.Path): Unit =
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    val pid = ProcessHandle.current().pid()
    val root = java.nio.file.Paths.get("/tmp/graft_io")
    java.nio.file.Files.createDirectories(root)
    // reclaim stale siblings left by crashed/finished runs: same name
    // prefix, different pid, owner no longer alive
    val stale = java.nio.file.Files.list(root)
    try stale.forEach { d =>
      val fn = d.getFileName.toString
      if (fn.startsWith(s"$name-") && fn != s"$name-$pid") {
        val owner = fn.substring(name.length + 1)
        val alive = owner.nonEmpty && owner.length <= 18 &&
          owner.forall(_.isDigit) &&
          ProcessHandle.of(owner.toLong).map[Boolean](_.isAlive).orElse(false)
        if (!alive) try wipe(d) catch { case _: java.io.IOException => () }
      }
    } finally stale.close()
    val p = root.resolve(s"$name-$pid")
    if (wipeOwn) wipe(p)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Avro container-file source/sink — the row-oriented interchange
    * format a Kafka-fed ingest layer hands a 100 TB pipeline. Spark
    * 4 ships the Avro FileFormat inside spark-sql but does NOT list it
    * in the DataSourceRegister service file, so the short name "avro"
    * fails lookup; addressing the format by its fully-qualified class
    * name binds the exact same reader/writer (block-splittable scans,
    * filter pushdown, the usual FileFormat machinery).
    */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroFormat).load(path)

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroFormat).save(path)

  /** Line-oriented text source/sink (one string column). The raw-corpus
    * ingest format: split-planned like any file source, no parsing at
    * all. Rows must be newline-free — the sink writes one line per row.
    */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)
}
