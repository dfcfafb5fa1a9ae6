package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TEMPORARY measurement scratch — never committed.
  * Dumps the hnswBuild plan before (union-symmetrize, reconstructed)
  * and after (the in-tree explode-symmetrize) for plans/r18.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ann

    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Ann.dot(a, b)
    def norm(a: org.apache.spark.sql.Column) = Ann.norm(a)

    // the r17 build, reconstructed verbatim (union-symmetrize)
    def buildOld(corpus: DataFrame, m: Int, degreeCap: Int, nShards: Int,
                 levelMod: Int): DataFrame = {
      val h16 = conv(substring(md5(col("id").cast("string")), 1, 4), 16, 10)
        .cast("long")
      val hl = conv(substring(md5(concat(lit("L:"), col("id").cast("string"))),
        1, 4), 16, 10).cast("long")
      val b = corpus
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
        .select(col("id"), col("v"), norm(col("v")).as("nrm"),
          pmod(h16, lit(nShards)).as("shard"),
          when(pmod(hl, lit(levelMod)) === 0, 1).otherwise(0).as("lvl"))
        .repartition(math.max(nShards, 1), col("shard"))
      def levelEdges(nodes: DataFrame, level: Int): DataFrame = {
        val a = nodes.select(col("id"), col("v"), col("nrm"), col("shard"))
        val pairs = a.as("a").join(a.as("b"),
            col("a.shard") === col("b.shard") && col("b.id") < col("a.id"))
          .select(col("a.id").as("src"), col("b.id").as("dst"),
            (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cs"))
        val wSrc = Window.partitionBy(col("src")).orderBy(col("cs").desc, col("dst"))
        val fwd = pairs.withColumn("rn", row_number().over(wSrc))
          .where(col("rn") <= m).drop("rn")
        val sym = fwd.unionAll(
          fwd.select(col("dst").as("src"), col("src").as("dst"), col("cs")))
        sym.withColumn("rn", row_number().over(wSrc)).where(col("rn") <= degreeCap)
          .select(lit(level).as("level"), col("src"), col("dst"))
      }
      levelEdges(b, 0).unionAll(levelEdges(b.where(col("lvl") === 1), 1))
    }

    val e = Tables.embeddings(spark, dir)
    def dump(df: DataFrame, path: String): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        df.explain("formatted")
      }
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(path).getParent)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        buf.toString("UTF-8"))
      println(s"[scratch] wrote $path")
    }
    dump(buildOld(e, 8, 16, 1, 8),
      "/root/repo/plans/r18/hnsw_build_before.txt")
    dump(Ann.hnswBuild(e, "vec_id", "embedding",
      m = 8, degreeCap = 16, nShards = 1, levelMod = 8),
      "/root/repo/plans/r18/hnsw_build_after.txt")
    spark.stop()
  }
}
