package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Pins the corpus-adaptive sizing math (VERDICT r14 task #1,
  * SURVEY §12j#2): occupancy-constant LSH (tables, bits) and
  * shard-size-constant NSW shards, plus the planted-dup recall the
  * miss-target formula promises on the real table.
  */
class AutoSizeSpec extends SparkSpec {

  test("autoLshParams holds bucket occupancy constant and bounds the miss probability") {
    val grades = Seq(0.95, 0.99)
    for (n <- Seq(1000L, 10000L, 100000L, 1000000L, 100000000L); g <- grades) {
      val (tables, bits) = Ann.autoLshParams(n, simGrade = g)
      // recall: a simGrade pair misses every table with p <= missTarget
      val m = 1.0 - math.acos(g) / math.Pi
      val miss = math.pow(1.0 - math.pow(m, bits), tables)
      assert(miss <= 1e-4 + 1e-12, s"n=$n g=$g miss=$miss")
      // tables stays within the band-count budget (never blows up)
      assert(tables <= 64, s"n=$n g=$g tables=$tables")
      // occupancy: held at the target at the default grade; at lower
      // grades bits may be shed to keep the band budget, doubling
      // occupancy per shed bit — but never below the ideal-bits floor
      val occ = n.toDouble / (1L << bits)
      if (g == 0.99) assert(occ <= 64.0 + 1e-9, s"n=$n occ=$occ")
      if (bits > 4 && g == 0.99) assert(occ > 32.0, s"n=$n occ=$occ bits=$bits")
    }
    // monotone: more data never means fewer bits
    val bitSeq = Seq(1000L, 10000L, 100000L, 10000000L)
      .map(n => Ann.autoLshParams(n)._2)
    assert(bitSeq.zip(bitSeq.tail).forall { case (a, b) => a <= b }, bitSeq)
  }

  test("autoShards pins shard size") {
    assert(Ann.autoShards(100) == 1)
    assert(Ann.autoShards(2048) == 1)
    assert(Ann.autoShards(2049) == 2)
    assert(Ann.autoShards(204800) == 100)
    // per-shard pairwise work is bounded regardless of corpus size
    for (n <- Seq(5000L, 50000L, 5000000L))
      assert(n.toDouble / Ann.autoShards(n) <= 2048.0)
  }

  test("dedup_embedding_scaled finds every planted near-identical duplicate") {
    val dir = "/root/testdata/sf0.01"
    val pairs = queries.DedupQueries.dedupEmbeddingScaled(spark, dir)
    val planted = pairs
      .where(col("id_b") === col("id_a") + 10000000L)
      .count()
    val expected = Tables.embeddings(spark, dir)
      .where(col("vec_id") % 20 === 0).count()
    // miss probability per planted pair is ~1e-10 at the sized params
    assert(planted == expected, s"planted=$planted expected=$expected")
  }

  test("knn_hnsw_scaled returns a full ranked top-k per query") {
    val dir = "/root/testdata/sf0.01"
    val out = queries.DedupQueries.knnHnswScaled(spark, dir).collect()
    val nq = Tables.embeddings(spark, dir).where(col("vec_id") < 20).count()
    assert(out.length == nq * 5, s"rows=${out.length} nq=$nq")
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(1)) // self excluded
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 5)
    }
  }

  test("hnsw shard routing: full route equals unrouted, partial route stays ranked") {
    import graft.operators.Ann
    val dir = "/root/testdata/sf0.01"
    val e = Tables.embeddings(spark, dir)
    val queries0 = e.where(col("vec_id") < 8)
    val nShards = 4
    val edges = Ann.hnswBuild(e, "vec_id", "embedding",
      m = 4, degreeCap = 8, nShards = nShards, levelMod = 8).localCheckpoint()
    def run(route: Int) = Ann.hnswSearch(e, queries0, edges, "vec_id",
      "embedding", k = 5, beamWidth = 8, hops1 = 2, hops0 = 3,
      nEntry = 16, nShards = nShards, routeShards = route)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted
    // routeShards = nShards (and 0) must be the identical search
    assert(run(nShards).sameElements(run(0)))
    // a 1-shard route still returns ranked rows for every query, and
    // nothing a query finds can come from outside its routed shard's
    // graph — weaker recall is the traded quantity, not coverage
    val one = run(1)
    assert(one.map(_._1).distinct.length == 8)
    one.foreach { case (q, nn, rk) =>
      assert(q != nn && rk >= 1 && rk <= 5)
    }
    // the bench report itself: recall at full route >= recall at 1
    val rep = queries.DedupQueries.knnHnswRouted(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    val full = rep(rep.keys.max)
    assert(full >= rep(1), s"recall map $rep")
  }
}
