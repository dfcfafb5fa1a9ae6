package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Scratch experiment: hnsw recall vs search-depth params (deleted
  * after the r16 tuning lands).
  * usage: runMain graft.ExpHnsw <sfDir> <beamWidth> <hops0> <entryFactor>
  */
object ExpHnsw {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bw = args(1).toInt
    val h0 = args(2).toInt
    val ef = args(3).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir)
    val q = e.where(col("vec_id") < 20)
    val nShards = Ann.autoShards(e.count())
    val t0 = System.nanoTime()
    val edges = Ann.hnswBuild(e, "vec_id", "embedding",
      m = 4, degreeCap = 8, nShards = nShards, levelMod = 8).localCheckpoint()
    val tb = (System.nanoTime() - t0) / 1e9
    val truth = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("nn_id")).localCheckpoint()
    val nT = truth.count()
    val t1 = System.nanoTime()
    val got = Ann.hnswSearch(e, q, edges, "vec_id", "embedding", k = 5,
      beamWidth = bw, hops1 = 2, hops0 = h0,
      nEntry = math.max(16, ef * nShards), nShards = nShards)
    val hits = got.join(truth, Seq("query_id", "nn_id"), "left_semi").count()
    val ts = (System.nanoTime() - t1) / 1e9
    println(f"EXP dir=$dir shards=$nShards bw=$bw hops0=$h0 ef=$ef " +
      f"recall=${hits.toDouble / nT}%.3f build=$tb%.1fs search=$ts%.1fs")
    spark.stop()
  }
}
