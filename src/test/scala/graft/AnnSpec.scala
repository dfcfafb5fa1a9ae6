package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine expressions") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
    val r = df.select(Ann.dot($"a", $"b"), Ann.cosine($"a", $"b")).collect()
    assert(r(0).getDouble(0) == 0.0 && math.abs(r(0).getDouble(1)) < 1e-12)
    assert(r(1).getDouble(0) == 2.0 && math.abs(r(1).getDouble(1) - 1.0) < 1e-12)
  }

  test("cosinePairs finds only the near-identical pair") {
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.99, 0.1, 0.0)), (3L, Seq(0.0, 1.0, 0.0)),
    ).toDF("id", "v")
    val pairs = Ann.cosinePairs(df, "id", "v", 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val out = Ann.bruteForceTopK(e, e.where($"vec_id" < 5), "vec_id", "embedding", 3)
    val rows = out.collect()
    assert(rows.length == 15) // 5 queries x 3
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sims = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivf top-k achieves reasonable recall vs brute force") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val q = e.where($"vec_id" < 10)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(e, q, "vec_id", "embedding", 5, nCells = 8, nProbe = 4)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.4, s"ivf recall $recall too low")
  }

  test("hnsw beam search: recall vs brute force at least matches ivf at equal probe budget") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val q = e.where($"vec_id" < 10)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val edges = Ann.hnswBuild(e, "vec_id", "embedding",
      m = 4, degreeCap = 8, nShards = 4, levelMod = 8)
    val hnsw = Ann.hnswSearch(e, q, edges, "vec_id", "embedding", k = 5,
      beamWidth = 8, hops1 = 2, hops0 = 3, nEntry = 16)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val hnswRecall = (bf intersect hnsw).size.toDouble / bf.size
    // equal probe budget: ivf scores nProbe/nCells = 1/4 of the corpus
    // per query; the beam touches ≤ beamWidth·(1+degreeCap)·hops ≈ the
    // same fraction of this fixture
    val ivf = Ann.ivfTopK(e, q, "vec_id", "embedding", 5, nCells = 8, nProbe = 2)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val ivfRecall = (bf intersect ivf).size.toDouble / bf.size
    assert(hnswRecall >= ivfRecall,
      s"hnsw recall $hnswRecall below ivf's $ivfRecall at equal budget")
    assert(hnswRecall >= 0.4, s"hnsw recall $hnswRecall too low")
    // rank/self-exclusion contract shared with the other knn rows
    val rows = Ann.hnswSearch(e, q, edges, "vec_id", "embedding", k = 5).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.groupBy(_.getLong(0)).values.forall(_.map(_.getInt(3)).sorted
      .sameElements(1 to 5)))
  }

  test("multiplexed hnsw search: each cfg equals its standalone routed search") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val q = e.where($"vec_id" < 10)
    val nShards = 2
    val edges = Ann.hnswBuild(e, "vec_id", "embedding",
      m = 4, degreeCap = 8, nShards = nShards, levelMod = 8)
    val prep = Ann.hnswPrepare(e, q, edges, "vec_id", "embedding",
      nEntry = 8, nShards = nShards)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      df.select($"query_id", $"nn_id", $"rank").as[(Long, Long, Int)]
        .collect().toSet
    val multi = Ann.hnswSearchPreparedMulti(prep, k = 5, beamWidth = 8,
      hops1 = 2, hops0 = 3, nShards = nShards, cfgs = Seq(1, 0)).cache()
    val routedMulti = rows(multi.where($"cfg" === 1))
    val fullMulti = rows(multi.where($"cfg" === 0))
    val routedSolo = rows(Ann.hnswSearchPrepared(prep, k = 5, beamWidth = 8,
      hops1 = 2, hops0 = 3, nShards = nShards, routeShards = 1))
    val fullSolo = rows(Ann.hnswSearchPrepared(prep, k = 5, beamWidth = 8,
      hops1 = 2, hops0 = 3, nShards = nShards, routeShards = 0))
    assert(routedMulti == routedSolo,
      "multiplexed cfg=1 diverged from the standalone routed search")
    assert(fullMulti == fullSolo,
      "multiplexed cfg=0 diverged from the standalone full search")
    // routing at 1 of 2 shards genuinely restricts the search
    assert(routedMulti != fullMulti || nShards == 1)
    multi.unpersist()
  }

  test("hnsw graph: degree cap holds, layer-1 is the md5 subset, edges stay in-shard") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val edges = Ann.hnswBuild(e, "vec_id", "embedding",
      m = 4, degreeCap = 8, nShards = 4, levelMod = 8).cache()
    val deg = edges.groupBy($"level", $"src").count().agg(max($"count")).head.getLong(0)
    assert(deg <= 8, s"degree cap violated: $deg")
    val h16 = conv(substring(md5($"vec_id".cast("string")), 1, 4), 16, 10).cast("long")
    val shardOf = Tables.embeddings(spark, sf)
      .select($"vec_id".as("node"), pmod(h16, lit(4)).as("shard"))
    val cross = edges
      .join(shardOf.withColumnRenamed("node", "src").withColumnRenamed("shard", "s1"), "src")
      .join(shardOf.withColumnRenamed("node", "dst").withColumnRenamed("shard", "s2"), "dst")
      .where($"s1" =!= $"s2").count()
    assert(cross == 0, "an edge crossed shards")
    // layer-1 endpoints all satisfy the level draw
    val hl = conv(substring(md5(concat(lit("L:"), $"node".cast("string"))), 1, 4), 16, 10)
      .cast("long")
    val l1nodes = edges.where($"level" === 1)
      .select($"src".as("node")).union(edges.where($"level" === 1).select($"dst"))
      .distinct().where(pmod(hl, lit(8)) =!= 0).count()
    assert(l1nodes == 0, "a non-sampled node reached layer 1")
    edges.unpersist()
  }

  test("k-means step assigns every vector once and improves assignment cosine") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
    val c = e.select($"vec_id".as("id"), $"embedding".cast("array<double>").as("cv"))
    val c0 = Ann.sampleCentroids(c, "id", "cv", nCells = 16)
    def meanAssignCos(cents: Array[Array[Double]]): Double =
      c.select(avg(element_at(
        graft.functions.GraftFunctions.topCells($"cv", cents, 1), 1)
        .getField("s"))).head().getDouble(0)
    val stepped = Ann.kmeansStep(e, "vec_id", "embedding", c0, dims = 64)
    assert(stepped.agg(sum("n")).head().getLong(0) == e.count())
    val c1 = stepped.orderBy("cell").collect().map(_.getSeq[Double](2).toArray)
    val (before, after) = (meanAssignCos(c0), meanAssignCos(c1))
    // mean-of-cell update ≈ the spherical k-means M-step (cosine is
    // centroid-norm invariant); allow a hair of non-monotonicity from
    // unnormalized input norms
    assert(after >= before - 1e-3, s"assignment cosine regressed: $before -> $after")
  }

  test("lsh top-k achieves reasonable recall vs brute force") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val q = e.where($"vec_id" < 10)
    val bf = Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(e, q, "vec_id", "embedding", 5, tables = 16, bits = 4)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("pq adc top-k: output shape, self-exclusion, determinism") {
    val e = Tables.embeddings(spark, sf)
    val q = e.where($"vec_id" < 3)
    val out = Ann.pqAdcTopK(e, q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(out.length == 15) // 3 queries x 5
    assert(out.forall(r => r.getLong(0) != r.getLong(1))) // self excluded
    // adc distance is non-decreasing in rank within each query
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val ds = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    // replaying the whole pipeline lands on identical rows (seed
    // selection, Lloyd step, codes, and ADC are all deterministic)
    val again = Ann.pqAdcTopK(e, q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("pq adc ranks an exact duplicate vector first") {
    import org.apache.spark.sql.functions.{col, lit}
    val e = Tables.embeddings(spark, sf)
    // plant an exact duplicate of vector 0 under a fresh id: its codes
    // equal vector 0's codes, so ADC distance ties at the minimum and
    // the (distance, id) order puts the twin at rank 1 for query 0
    val twin = e.where(col("vec_id") === 0)
      .select((col("vec_id") + lit(900000L)).as("vec_id"), col("embedding"))
    val corpus = e.select(col("vec_id"), col("embedding")).unionAll(twin)
    val out = Ann.pqAdcTopK(corpus, corpus.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    // the twin's quantized distance IS the achievable minimum; any
    // other vector at rank 1 must be a full 8-code collision (ties
    // break by id), so the minimum distance must equal the twin's
    val twinRow = out.find(_.getLong(1) == 900000L)
    assert(twinRow.isDefined,
      s"twin missing from top-3: ${out.map(_.toString).mkString(", ")}")
    assert(out(0).getDouble(2) == twinRow.get.getDouble(2),
      "rank-1 distance differs from the exact twin's")
  }

  test("ivfpq: output shape, self-exclusion, determinism") {
    val e = Tables.embeddings(spark, sf)
    val q = e.where($"vec_id" < 3)
    val out = Ann.ivfPqTopK(e, q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(out.length == 15) // 3 queries x 5 (probed cells hold >= 5)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val ds = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    val again = Ann.ivfPqTopK(e, q, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("ivfpq ranks an exact duplicate vector at the minimum distance") {
    import org.apache.spark.sql.functions.{col, lit}
    val e = Tables.embeddings(spark, sf)
    // an exact twin shares the query's cell assignment AND codes; its
    // per-sub code minimizes the distance to the query residual, so its
    // ADC sum is the achievable minimum over the probed cells
    val twin = e.where(col("vec_id") === 0)
      .select((col("vec_id") + lit(900000L)).as("vec_id"), col("embedding"))
    val corpus = e.select(col("vec_id"), col("embedding")).unionAll(twin)
    val out = Ann.ivfPqTopK(corpus, corpus.where(col("vec_id") === 0),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    val twinRow = out.find(_.getLong(1) == 900000L)
    assert(twinRow.isDefined,
      s"twin missing from top-3: ${out.map(_.toString).mkString(", ")}")
    assert(out(0).getDouble(2) == twinRow.get.getDouble(2),
      "rank-1 distance differs from the exact twin's")
  }

  test("kmeansTrain early-stops at the fixed point and emits the trajectory") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // four orthogonal one-hot-ish vectors: every vector is its own
    // cluster, the rounded means equal the sampled centroids, so the
    // very first iteration is already the fixed point
    val vecs = Seq(
      (0L, Seq(4.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 3.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 2.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 5.0)),
    ).toDF("vec_id", "embedding")
    val traj = graft.operators.Ann.kmeansTrain(vecs, "vec_id", "embedding",
      dims = 4, nCells = 4, maxIter = 3, tol = 0.0)
    val iters = traj.select("iter").distinct().collect().map(_.getInt(0)).toSet
    assert(iters === Set(1), s"expected early stop after iter 1, ran $iters")
    // each cell holds exactly its own vector
    val occ = traj.where(col("dim") === 0).select("cell", "n").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ.values.forall(_ == 1L) && occ.size == 4)
    // tol = -1 is the never-stop sentinel: all maxIter iterations run
    // even on the converged fixture (the fixed-T static-oracle shape)
    val pinned = graft.operators.Ann.kmeansTrain(vecs, "vec_id", "embedding",
      dims = 4, nCells = 4, maxIter = 3, tol = -1.0)
    assert(pinned.select("iter").distinct().count() == 3)
    // and on the real table
    val full = graft.operators.Ann.kmeansTrain(
      Tables.embeddings(spark, sf), "vec_id", "embedding",
      dims = 64, nCells = 16, maxIter = 2, tol = -1.0)
    assert(full.select("iter").distinct().count() == 2)
  }

  test("a training iteration over checkpointed vectors plans exactly one Exchange (the cell rollup)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .repartition(4, col("id")).localCheckpoint()
    val cents = graft.operators.Ann.sampleCentroids(vecs, "id", "v", 16)
    val step = graft.operators.Ann.kmeansStep(vecs, "id", "v", cents,
      dims = 64, repartitionInput = false)
    val plan = step.queryExecution.executedPlan.toString
    val n = "Exchange (hash|range|Single)".r.findAllIn(plan).size
    // the corpus does NOT re-shuffle: only the nCells x (dims+1)
    // partial-agg rollup exchanges
    assert(n === 1, plan)
  }

  test("pagerank loop: cycle graph converges after one iteration; trajectory plan is exchange-free") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // directed 6-cycle: outdeg 1 everywhere, uniform rank is the exact
    // integer fixed point — r1 == r0 and the tol=0 loop stops at once
    val nodes = (0L until 6L).toDF("vec_id")
    val adj = (0L until 6L).map(i => (i, 1, (i + 1) % 6))
      .toDF("src", "outdeg", "dst")
    val traj = graft.queries.DedupQueries.pagerankLoop(
      nodes, adj, maxIter = 4, tolMicro = 0L)
    val rows = traj.collect()
    assert(rows.map(_.getInt(0)).toSet === Set(1))
    assert(rows.forall(_.getLong(2) == 1000000L))
    // the emitted trajectory reads checkpointed iteration results —
    // collecting it must not replan (or re-shuffle) any iteration
    val plan = graft.queries.DedupQueries.qPagerank.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange (hash|range|Single)".r.findAllIn(plan).isEmpty, plan)
  }
}
