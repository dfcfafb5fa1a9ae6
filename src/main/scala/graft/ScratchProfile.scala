package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the kmeans loop (deleted before round end). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val tracker = spark.sparkContext.statusTracker
    var phase = 0
    def t[A](label: String)(f: => A): A = {
      phase += 1
      val g = s"ph$phase"
      spark.sparkContext.setJobGroup(g, g)
      val t0 = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val jobs = tracker.getJobIdsForGroup(g).length
      println(f"  [$label] $sec%.3f s, $jobs jobs"); r
    }
    (1 to 2).foreach { run =>
      println(s"run $run")
      val df = Tables.embeddings(spark, sfDir)
      val par = spark.sparkContext.defaultParallelism
      val vecs = t("checkpoint") {
        df.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("v"))
          .repartition(par, col("id")).localCheckpoint()
      }
      var centroids = t("sampleCentroids") {
        graft.operators.Ann.sampleCentroids(vecs, "id", "v", 16)
      }
      (1 to 3).foreach { it =>
        val rows = t(s"iter$it collect") {
          graft.operators.Ann.kmeansStep(vecs, "id", "v", centroids, 64,
            repartitionInput = false)
            .select(col("cell"), col("n"), col("sum_micro"))
            .collect()
        }
        centroids = rows.sortBy(_.getInt(0)).map(r =>
          r.getSeq[Long](2).map(s => s.toDouble / 1e6 / r.getLong(1)).toArray).toArray
      }
    }
    spark.stop()
  }
}
