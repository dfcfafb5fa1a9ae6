package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "a completely different document about spark and large scale data"),
    (3L, "the quick brown fox jumps over the lazy dog again and often"),
  ).toDF("id", "text")

  test("wordShingles produces distinct k-grams; short text -> empty") {
    val sh = base.select(Dedup.wordShingles($"text", 3).as("sh"))
      .where($"sh".isNotNull).collect()
    assert(sh(0).getSeq[String](0).size == 10) // 12 words -> 10 trigrams
    val short = Seq("one two").toDF("text")
      .select(Dedup.wordShingles($"text", 3)).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("exact dedup keeps first id per identical content") {
    val df = base.unionAll(Seq((10L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text"))
    val out = Dedup.exact(df, "id", $"text").orderBy("id").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("minhash pairs finds the near-dup pair, not the unrelated one") {
    val pairs = Dedup.minhashPairs(base, "id", "text",
      shingleK = 2, numPerms = 128, numBands = 32, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 3L)
    // 11 distinct bigrams each, 10 shared: J = 10/12
    assert(math.abs(pairs(0).getDouble(2) - 10.0 / 12.0) < 1e-9)
  }

  test("ngram jaccard matches hand-computed value with blocking") {
    val blocked = base.withColumn("grp", lit("x"))
    val pairs = Dedup.ngramJaccardPairs(blocked, "id", "text",
      Seq("grp"), shingleK = 2, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(math.abs(pairs(0).getDouble(2) - 10.0 / 12.0) < 1e-9)
  }

  test("simhash: near-dups collide within hamming budget, unrelated don't") {
    val pairs = Dedup.simhashPairs(base, "id", "text", maxHamming = 8).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 3L))
    assert(!pairs.exists(r => r.getLong(1) == 2L || r.getLong(0) == 2L))
  }

  test("connected components label chains to the min id") {
    import spark.implicits._
    // components: {1,2,3} (chain), {10,11}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("driver-side and distributed CC paths agree on a deep chain") {
    import spark.implicits._
    // diameter-40 chain exercises pointer doubling in the distributed
    // loop; driverThreshold = 0 forces it, the default takes union-find
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, driverThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
    assert(fast.values.toSet == Set(1L) && fast.size == 40)
  }

  test("a graph just over the driver threshold stays distributed and correct") {
    import spark.implicits._
    // 40 pairs double to 80 directed edges; a threshold of 79 is one
    // short, so the label-propagation loop (not the driver union-find)
    // must run — and converge to the same single component
    val pairs = (1L until 41L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, driverThreshold = 79).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(1L) && cc.size == 41)
  }

  test("simhash bands are 16-bit values") {
    val sigs = Dedup.simhashBands(base, "id", "text").collect()
    sigs.foreach { r =>
      (1 to 4).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) < 65536))
    }
  }

  test("incremental minhash equals the full recompute restricted to new docs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val fresh = docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail marker words")).as("text"))
      .unionAll(docs.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    val idx = java.nio.file.Files.createTempDirectory("graft_band_spec")
      .toString + "/idx"
    Dedup.bandIndexWrite(docs, "doc_id", "text", idx)
    val inc = Dedup.incrementalMinhashPairs(fresh, docs, "doc_id", "text", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the full recompute over base ∪ new, kept to pairs touching a
    // new doc (new ids sit above the base id space)
    val full = Dedup.minhashPairs(docs.unionAll(fresh), "doc_id", "text")
      .where(col("id_b") >= 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
    // index ∪ delta must equal the band rows of the full corpus — the
    // committed nightly state is indistinguishable from a rebuild
    val stored = spark.read.parquet(idx)
      .unionByName(spark.read.parquet(idx + "_delta"))
      .select("id", "band", "band_hash")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val rebuilt = Dedup.bandRows(docs.unionAll(fresh), "doc_id", "text")
      .select("id", "band", "band_hash")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(stored === rebuilt)
  }

  test("incremental probe statically prunes the index to touched shards") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("graft_band_spec")
      .toString + "/idx"
    // 256 shards so a 2-doc probe (≤ 64 band rows) cannot touch all
    Dedup.bandIndexWrite(docs, "doc_id", "text", idx, nShards = 256)
    val two = docs.where(col("doc_id") % 250 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail words")).as("text"))
    val out = Dedup.incrementalMinhashPairs(two, docs, "doc_id", "text",
      idx, nShards = 256)
    val scan = out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains(idx) && !l.contains("_delta")).mkString("\n")
    assert(scan.contains("PartitionFilters: [") &&
      !scan.contains("PartitionFilters: []"), scan)
    out.collect() // and it still runs end to end
  }

  test("incremental dedup honors an explicit deltaPath (concurrent-run isolation)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("graft_band_spec")
      .toString + "/idx"
    Dedup.bandIndexWrite(docs, "doc_id", "text", idx)
    val fresh = docs.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val runA = idx + "_delta_runA"
    val out = Dedup.incrementalMinhashPairs(fresh, docs, "doc_id", "text",
      idx, deltaPath = runA)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the delta landed at the run-scoped path, NOT the shared default
    assert(spark.read.parquet(runA).count() > 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(idx + "_delta")))
    // and the result matches the default-path invocation exactly
    val dflt = Dedup.incrementalMinhashPairs(fresh, docs, "doc_id", "text",
      idx).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === dflt && pairs.nonEmpty)
  }
}
