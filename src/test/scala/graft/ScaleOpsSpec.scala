package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Skew}

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right at-or-before, null when none") {
    val left = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 5L, "c"), ("u2", 9L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(("u1", 7L, 1.0), ("u1", 10L, 2.0), ("u1", 15L, 3.0), ("u3", 1L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("tag"), Seq("v"))
      .orderBy("k", "ts").collect()
    // u1@5 -> none; u1@10 -> right@10 (inclusive); u1@20 -> right@15; u2@9 -> none
    assert(out(0).getString(2) == "c" && out(0).isNullAt(3))
    assert(out(1).getString(2) == "a" && out(1).getDouble(3) == 2.0)
    assert(out(2).getString(2) == "b" && out(2).getDouble(3) == 3.0)
    assert(out(3).getString(2) == "d" && out(3).isNullAt(3))
  }

  test("forward asof picks earliest right at-or-after, null when none") {
    val left = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u2", 9L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq(("u1", 10L, 1.0), ("u1", 15L, 2.0), ("u3", 1L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofForward(left, right, "k", "ts", Seq("tag"), Seq("v"))
      .orderBy("k", "ts").collect()
    // u1@10 -> right@10 (inclusive); u1@20 -> none; u2@9 -> none
    assert(out(0).getString(2) == "a" && out(0).getDouble(3) == 1.0)
    assert(out(1).getString(2) == "b" && out(1).isNullAt(3))
    assert(out(2).getString(2) == "c" && out(2).isNullAt(3))
  }

  test("asof ties on (key, ts) resolve deterministically to the greatest payload") {
    val left = Seq(("u1", 10L, "a")).toDF("k", "ts", "tag")
    // two right rows at the SAME (key, ts) with different payloads —
    // both directions must pick the greatest payload struct, never the
    // partition-layout-dependent one
    val right = Seq(("u1", 10L, 1.0), ("u1", 10L, 2.0)).toDF("k", "ts", "v")
    val back = AsofJoin.asof(left, right, "k", "ts", Seq("tag"), Seq("v")).collect()
    val fwd = AsofJoin.asofForward(left, right, "k", "ts", Seq("tag"), Seq("v")).collect()
    assert(back.head.getDouble(3) == 2.0)
    assert(fwd.head.getDouble(3) == 2.0)
  }

  test("nearest asof picks the closer side, breaks exact ties backward, one Exchange") {
    val left = Seq(("u1", 10L, "a"), ("u1", 100L, "b"), ("u1", 26L, "c"), ("u2", 5L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(("u1", 8L, 1.0), ("u1", 40L, 2.0), ("u3", 1L, 9.0))
      .toDF("k", "ts", "v")
    val df = AsofJoin.asofNearest(left, right, "k", "ts", Seq("tag"), Seq("v"))
    val out = df.orderBy("k", "ts").collect()
    // u1@10 -> 8 (d=2) over 40 (d=30); u1@26 -> d=18 back vs d=14 fwd -> 40;
    // u1@100 -> 40 (only backward); u2@5 -> none
    assert(out(0).getString(2) == "a" && out(0).getDouble(3) == 1.0)
    assert(out(1).getString(2) == "c" && out(1).getDouble(3) == 2.0)
    assert(out(2).getString(2) == "b" && out(2).getDouble(3) == 2.0)
    assert(out(3).getString(2) == "d" && out(3).isNullAt(3))
    // exact tie (d=5 both sides) resolves BACKWARD
    val tieL = Seq(("u1", 10L, "x")).toDF("k", "ts", "tag")
    val tieR = Seq(("u1", 5L, 1.0), ("u1", 15L, 2.0)).toDF("k", "ts", "v")
    val tie = AsofJoin.asofNearest(tieL, tieR, "k", "ts", Seq("tag"), Seq("v")).collect()
    assert(tie.head.getDouble(3) == 1.0)
    // both window passes ride ONE hash exchange (second sort is in-partition)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("salted agg equals plain groupBy exactly") {
    val df = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity",
        ($"l_orderkey" * 8 + $"l_linenumber").as("uk"))
    val salted = Skew.saltedAgg(df, Seq("l_returnflag"), Seq("l_quantity"), "uk")
      .select($"l_returnflag", $"sum_l_quantity", $"cnt_l_quantity",
        $"min_l_quantity", $"max_l_quantity")
      .collect().map(_.toSeq).toSet
    val plain = df.groupBy($"l_returnflag")
      .agg(sum($"l_quantity"), count($"l_quantity"), min($"l_quantity"), max($"l_quantity"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("bucketed range join equals the naive range join, without a nested loop") {
    val points = Seq(0.5, 1.5, 2.5, 7.9, 10.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val iv = Seq((0L, 0.0, 2.0), (1L, 1.0, 8.0), (2L, 9.5, 20.0))
      .toDF("k", "lo", "hi")
    val bucketed = graft.operators.RangeJoin
      .pointInInterval(points, "v", iv, "lo", "hi", bucketWidth = 2.0)
    val got = bucketed.select("id", "k").collect().map(_.toSeq).toSet
    val naive = points.join(iv, $"v" >= $"lo" && $"v" < $"hi")
      .select("id", "k").collect().map(_.toSeq).toSet
    assert(got == naive && got.nonEmpty)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range join must not fall back to a nested loop")
  }

  test("bucketed-table join runs without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS spec_l_b")
    spark.sql("DROP TABLE IF EXISTS spec_o_b")
    Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      .write.mode("overwrite").option("path", "/tmp/graft_bucketed_spec/l")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("spec_l_b")
    Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .write.mode("overwrite").option("path", "/tmp/graft_bucketed_spec/o")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("spec_o_b")
    // at test SF Spark would broadcast the small side (hiding the
    // bucketing); disable it to surface the sort-merge path a fact-fact
    // join takes at scale
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("spec_l_b")
        .join(spark.table("spec_o_b"), $"l_orderkey" === $"o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted join equals the plain join exactly") {
    val big = Tables.lineitem(spark, sf).select($"l_returnflag", $"l_quantity",
      ($"l_orderkey" * 8 + $"l_linenumber").as("uk"))
    val dim = big.select($"l_returnflag").distinct()
      .withColumn("code", ascii($"l_returnflag"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag").agg(count(lit(1)), sum($"l_quantity"))
        .collect().map(_.toSeq).toSet
    val salted = agg(graft.operators.Skew.saltedJoin(big, dim, "l_returnflag", "uk"))
    val plain = agg(big.join(dim, Seq("l_returnflag")))
    assert(salted == plain && salted.nonEmpty)
  }

  test("AQE splits a planted 30%-hot-key partition in a sort-merge join") {
    // verifies the runtime half of the skew story (SURVEY §7.14): the
    // salted joins handle PLANNED skew; AQE's OptimizeSkewedJoin must
    // catch UNPLANNED skew at runtime. Plant one key with ~30% of the
    // probe side, force sort-merge, lower the skew thresholds so the
    // tiny fixture qualifies, and assert the finalized plan marks the
    // join skew=true (split partitions).
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      val left = spark.range(300000).select(
        when($"id" % 10 < 3, lit(7L)).otherwise($"id" % 997).as("k"),
        $"id".as("payload"))
      val right = spark.range(997).select($"id".as("k"), ($"id" * 2).as("v"))
      val j = left.join(right, "k")
      // collect() executes THIS QueryExecution (count() would build a
      // separate one and leave this plan unfinalized)
      assert(j.collect().length == 300000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted partials spread each key over many salt buckets") {
    val df = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity",
        ($"l_orderkey" * 8 + $"l_linenumber").as("uk"))
      .withColumn("__salt", pmod(xxhash64($"uk"), lit(64)))
    val buckets = df.groupBy("l_returnflag").agg(countDistinct("__salt").as("n"))
      .agg(min("n")).head().getLong(0)
    assert(buckets > 32, s"expected keys spread over >32 salt buckets, got $buckets")
  }

  test("interval overlap join equals the naive overlap join, duplicate-free, no nested loop") {
    // intervals engineered to overlap multiple shared buckets (width 10)
    val a = Seq((1L, 0L, 35L), (2L, 5L, 12L), (3L, 40L, 41L), (4L, 90L, 95L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 3L, 50L), (11L, 34L, 36L), (12L, 60L, 70L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = graft.operators.RangeJoin
      .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketWidth = 10L)
    val rows = got.select("a_id", "b_id").collect().map(_.toSeq)
    // canonical-bucket attribution means NO duplicates even for pairs
    // sharing several buckets (e.g. a=1 x b=10 share buckets 0..3)
    assert(rows.length === rows.toSet.size, "overlap join emitted duplicate pairs")
    val naive = a.join(b, $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
      .select("a_id", "b_id").collect().map(_.toSeq).toSet
    assert(rows.toSet === naive && naive.nonEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "interval overlap must not fall back to a nested loop")
  }

  test("runtime bloom filter is injected into the fact-side scan and preserves results") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "-1")
      val j = graft.queries.ScaleOpsQueries.bloomJoinFrame(spark, sf)
      val withBloom = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected InjectRuntimeFilter to add a might_contain probe on the fact scan:\n$plan")
      spark.conf.set(keys(0), "false")
      val without = graft.queries.ScaleOpsQueries.bloomJoinFrame(spark, sf)
      val plainPlan = without.queryExecution
      val withoutBloom = without.collect()
      assert(!plainPlan.executedPlan.toString.contains("might_contain"))
      assert(withBloom.toSeq === withoutBloom.toSeq,
        "bloom filter must never change the join result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
