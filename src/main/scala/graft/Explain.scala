package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization-round evidence device (plans/r17/<query>_{before,after}
  * .txt): the judge checks plan claims (Exchange counts, join
  * strategies, PushedFilters) against these artifacts without running
  * Spark.
  *
  * usage: runMain graft.Explain <outDir> <suffix> <query> [query ...]
  *
  * Note: queries whose CONSTRUCTION runs bounded driver work
  * (sampleCentroids collects, beam-loop checkpoints) execute that work
  * during planning here — same as any caller — so the dumped plan is
  * the final action's plan, exactly what Bench times last.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Explain <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val reg = SparkEntry.queries ++ SparkEntry.benchQueries
    names.foreach { name =>
      val fn = reg.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        df.explain("formatted")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        buf.toString("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
