package graft

import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {

  test("stateful sessionization emits closed sessions and times out idle ones") {
    val gap = 30L * 60 * 1000 * 1000 * 1000 // 30 min in ns
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.sessionize(StreamOps.eventsStream(spark, sf), gap).toDF(),
      mode = "append")
      .collect().map(_.toSeq).toSet
    // exactSum: the streaming fold accumulates decSum-mirror micros,
    // so the batch twin must ride the same exact decimal sum
    val batchAll = StreamOps.sessionizeBatch(Tables.events(spark, sf), gap,
      exactSum = true)
    // append mode emits gap-closed sessions immediately; each user's
    // final open session emits iff it TIMES OUT under the final
    // watermark (max event time - 1h delay)
    val lastEnd = batchAll.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("end_ns").as("end_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wmMs = Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.expr("max(cast(ts as long) div 1000000)"))
      .head().getLong(0) - 3600000L
    val rows = batchAll.collect().map(_.toSeq)
    val expected = rows.filter { r =>
      val uid = r(0).asInstanceOf[Long]
      val end = r(2).asInstanceOf[Long]
      !lastEnd.contains((uid, end)) || end / 1000000L + 30 * 60 * 1000L < wmMs
    }.toSet
    assert(streamed.nonEmpty)
    assert(streamed == expected)
    // at least one session must have closed via timeout, not gap
    assert(streamed.size > rows.size - lastEnd.size)
  }

  test("idle sessions time out, emit, and evict their state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val q = StreamOps.sessionize(df, gapNanos = 60L * 1000000000L,
        watermarkDelay = "1 second").toDF()
      .writeStream.format("memory").queryName("evict_test")
      .outputMode("append").start()
    try {
      // non-zero base: an event at exactly epoch 0 ties the initial
      // watermark and is dropped as late
      mem.addData((1L, 1000L * 1000000000L, 1.0), (1L, 1001L * 1000000000L, 2.0))
      q.processAllAvailable()
      assert(spark.table("evict_test").count() == 0) // open session held
      mem.addData((2L, 7200L * 1000000000L, 1.0)) // 2h later -> watermark jumps
      q.processAllAvailable()
      // the timeout fires in the no-data microbatch AFTER the watermark
      // advances — poll briefly rather than racing it
      def emitted(): Boolean = spark.table("evict_test").collect()
        .exists(r => r.getLong(0) == 1L && r.getLong(3) == 2L)
      val deadline = System.currentTimeMillis + 15000
      while (!emitted() && System.currentTimeMillis < deadline) {
        q.processAllAvailable()
        Thread.sleep(200)
      }
      // user 1's session closed by timeout: emitted with both events merged
      assert(emitted())
    } finally q.stop()
  }

  test("streaming dedup emits exactly the batch-distinct key set") {
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.dedupStream(StreamOps.eventsStream(spark, sf),
        Seq("user_id", "event_type")),
      mode = "append").collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming near-dup emits exactly the batch-distinct simhash band key set") {
    import org.apache.spark.sql.functions._
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.neardupStream(StreamOps.docsStream(spark, sf), "doc_id", "text"),
      mode = "append").collect().map(_.toSeq).toSet
    val batch = Tables.documents(spark, sf)
      .select(posexplode(graft.functions.GraftFunctions.simhashBands(col("text")))
        .as(Seq("band", "band_val")))
      .distinct().collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("wordless docs have no simhash signature and emit no band keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "real words here"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.simhashBands(col("text")).as("sig"))
    assert(sigs.where(col("sig").isNotNull).count() == 1)
    // and the pair path never matches empty docs with each other
    val pairs = graft.operators.Dedup.simhashPairs(docs, "doc_id", "text")
    assert(pairs.count() == 0)
  }

  test("stream-static enrichment equals the batch join+agg and broadcasts the dim") {
    val dim = Tables.customer(spark, sf)
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.enrichAgg(StreamOps.eventsStream(spark, sf), dim,
        "c_custkey", "c_mktsegment")).collect().map(_.toSeq).toSet
    val batchDf = StreamOps.enrichAgg(Tables.events(spark, sf), dim,
      "c_custkey", "c_mktsegment")
    val batch = batchDf.collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // the stream side must not shuffle for the join
    val plan = batchDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("stream-stream interval self-join equals the batch interval join") {
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.intervalSelfJoin(StreamOps.eventsStream(spark, sf),
        StreamOps.eventsStream(spark, sf)),
      mode = "append").collect().map(_.toSeq).toSet
    val batch = StreamOps.intervalSelfJoin(Tables.events(spark, sf),
      Tables.events(spark, sf)).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("update-mode Welford profile equals the batch exact-arithmetic aggregation") {
    import org.apache.spark.sql.functions._
    val snap = StreamOps.runToBatch(spark,
      StreamOps.profileUpdate(StreamOps.eventsStream(spark, sf)).toDF(),
      mode = "update")
    // final state per key = the max-n snapshot
    val fields = snap.columns.filterNot(_ == "user_id").map(col)
    val streamed = snap.groupBy(col("user_id"))
      .agg(max_by(struct(fields: _*), col("n")).as("s"))
      .select(col("user_id") +: snap.columns.filterNot(_ == "user_id")
        .map(c => col(s"s.$c").as(c)): _*)
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sf).groupBy(col("user_id")).agg(
      count(col("value")).as("n"),
      round(graft.operators.ExactAgg.microAvg(col("value")), 6).as("mean_v"),
      round(stddev_pop(col("value")), 6).as("std_v"),
      min(col("value")).as("min_v"),
      max(col("value")).as("max_v"),
      graft.operators.ExactAgg.decSum(col("value")).as("sum_v"))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("update-mode profile emits only touched keys per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = StreamOps.profileUpdate(df).toDF()
      .writeStream.format("memory").queryName("profile_update_test")
      .outputMode("update").start()
    try {
      mem.addData((1L, 1000L, 1L, 2.0), (2L, 1001L, 2L, 4.0))
      q.processAllAvailable()
      assert(spark.table("profile_update_test").count() == 2)
      // second batch touches ONLY key 1 → exactly one new snapshot
      mem.addData((1L, 1002L, 3L, 6.0))
      q.processAllAvailable()
      val rows = spark.table("profile_update_test").collect()
      assert(rows.length == 3)
      val k1 = rows.filter(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
      assert(k1.length == 1)
      assert(k1.head.getDouble(2) == 4.0) // mean of 2, 6
      assert(k1.head.getDouble(6) == 8.0) // exact micro sum
    } finally q.stop()
  }

  test("left-outer interval join = inner pairs + null padding for proven non-matches") {
    val outer = StreamOps.runToBatch(spark,
      StreamOps.intervalSelfJoin(StreamOps.eventsStream(spark, sf),
        StreamOps.eventsStream(spark, sf), joinType = "left_outer"),
      mode = "append").collect()
    val inner = StreamOps.intervalSelfJoin(Tables.events(spark, sf),
      Tables.events(spark, sf)).collect().map(_.toSeq).toSet
    val (padded, matched) = outer.partition(_.isNullAt(2))
    assert(matched.map(_.toSeq).toSet == inner)
    assert(padded.nonEmpty) // horizon-cleared unmatched rows do emit
    // a padded row's event must genuinely have no in-horizon pair
    val matchedAs = inner.map(r => (r(0), r(1)))
    padded.foreach(r => assert(!matchedAs.contains((r.get(0), r.get(1)))))
  }

  test("streaming latest-by-key keeps only the newest row and emits touched keys") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = StreamOps.latestByKey(df).toDF()
      .writeStream.format("memory").queryName("latest_key_test")
      .outputMode("update").start()
    try {
      mem.addData((1L, 100L, 1L, "a", 1.0), (1L, 200L, 2L, "b", 2.0),
        (2L, 50L, 3L, "c", 3.0))
      q.processAllAvailable()
      val t1 = spark.table("latest_key_test").collect()
      assert(t1.length == 2) // one snapshot per key
      assert(t1.find(_.getLong(0) == 1L).get.getLong(2) == 2L) // newest row wins
      // an OLDER row for key 1 must not regress the state; key 2 untouched
      mem.addData((1L, 150L, 4L, "d", 4.0))
      q.processAllAvailable()
      val t2 = spark.table("latest_key_test").collect()
      assert(t2.length == 3) // only key 1 re-emitted
      val latest1 = t2.filter(_.getLong(0) == 1L).maxBy(r => (r.getLong(1), r.getLong(2)))
      assert(latest1.getLong(2) == 2L) // still event 2, not the late event 4
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: replayed batch overwrites, never duplicates") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_fb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fb_ckpt").toString
    val stream = StreamOps.eventsStream(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    StreamOps.runIdempotentSink(stream, out, ckpt)
    val once = spark.read.parquet(out)
    val expected = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .collect().map(_.toSeq).toSet
    assert(once.drop("batch_id").collect().map(_.toSeq).toSet == expected)
    // simulate the failure-replay: re-deliver batch 0 to the SAME writer
    // partition-column inference reads batch_id back as INT
    val batchIds = once.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val replayed = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    StreamOps.idempotentBatchWriter(out)(replayed, batchIds.head)
    val after = spark.read.parquet(out)
    assert(after.count() == expected.size) // no duplicates
    assert(after.drop("batch_id").collect().map(_.toSeq).toSet == expected)
  }

  test("streaming top-k vocabulary board equals the batch top-k") {
    import org.apache.spark.sql.functions._
    val counts = StreamOps.docsStream(spark, sf)
      .select(explode(split(lower(col("text")), " ", -1)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val board = StreamOps.topKBoard(counts, 100, statePartitions = Some(8))
    val batch = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ", -1)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(board.nonEmpty)
    assert(board == batch)
  }

  test("top-k board stays exact under a hot token and multi-batch trimming") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one token at ~20% frequency (the event-time-skew case for the
    // update-mode merge) plus a 300-word tail, delivered over 5
    // micro-batches so the k-entry board trims on every merge
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_skew").toString
    val docs = (0 until 5).map { b =>
      val tail = (0 until 60).map(i => s"tok${b}_$i w${(b * 7 + i) % 40}")
      val hot = Seq.fill(15)("hot hot")
      (tail ++ hot).zipWithIndex.map { case (t, i) => (b * 1000L + i, t) }
    }
    docs.zipWithIndex.foreach { case (rows, b) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .select(explode(split(lower(col("text")), " ", -1)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val board = StreamOps.topKBoard(stream, 10, statePartitions = Some(4))
    val batch = spark.read.parquet(dir)
      .select(explode(split(lower(col("text")), " ", -1)).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(board == batch)
    // the hot token dominates the board at ~20% of all tokens
    assert(board.head._1 == "hot")
    assert(board.head._2 == 150L)
  }

  test("salted interval join equals the un-salted join under a hot key") {
    import org.apache.spark.sql.functions._
    // the skew fixture: ~5% of events remapped onto one user, so the
    // (uid, slice) sub-bucketing actually has something to split
    def hot(df: org.apache.spark.sql.DataFrame) = df.withColumn("user_id",
      when(col("event_id") % 20 === 0, lit(1L)).otherwise(col("user_id")))
    val salted = StreamOps.runToBatch(spark,
      StreamOps.intervalSelfJoinSalted(hot(StreamOps.eventsStream(spark, sf)),
        hot(StreamOps.eventsStream(spark, sf))),
      mode = "append", statePartitions = Some(4))
      .collect().map(_.toSeq).toSet
    val plain = StreamOps.runToBatch(spark,
      StreamOps.intervalSelfJoin(hot(StreamOps.eventsStream(spark, sf)),
        hot(StreamOps.eventsStream(spark, sf))),
      mode = "append", statePartitions = Some(4))
      .collect().map(_.toSeq).toSet
    assert(salted.nonEmpty)
    assert(salted == plain) // exactly one sub-bucket match per true pair
  }

  test("keyed top-k board stays exact per group under multi-batch trimming") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two domains with disjoint hot tokens + per-domain tails, over 5
    // micro-batches so every group's k-entry board trims on each merge
    val dir = java.nio.file.Files.createTempDirectory("graft_ktopk").toString
    (0 until 5).foreach { b =>
      val rows = (0 until 40).flatMap { i =>
        Seq(("d1", s"a${(b * 3 + i) % 25} hot1"), ("d2", s"b${(b * 5 + i) % 25} hot2"))
      }.zipWithIndex.map { case ((g, t), i) => (b * 1000L + i, g, t) }
      rows.toDF("doc_id", "grp", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .select(col("grp"), explode(split(lower(col("text")), " ", -1)).as("w"))
      .where(col("w") =!= "")
    val counts = StreamOps.cumulativeKeyedCounts(stream,
      col("grp"), col("w"), "grp", "w")
    val board = StreamOps.keyedTopKBoard(counts, 5, "grp", "w", "n",
      statePartitions = Some(4))
    val batch = {
      import org.apache.spark.sql.expressions.Window
      val c = spark.read.parquet(dir)
        .select(col("grp"), explode(split(lower(col("text")), " ", -1)).as("w"))
        .where(col("w") =!= "")
        .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("grp")).orderBy(col("n").desc, col("w"))
      c.withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .orderBy(col("grp"), col("n").desc, col("w"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    }
    assert(board == batch)
    // each group's hot token leads its own board
    assert(board.filter(_._1 == "d1").head._2 == "hot1")
    assert(board.filter(_._1 == "d2").head._2 == "hot2")
  }

  test("streaming window agg equals the batch aggregation") {
    val streamed = StreamOps.runToBatch(spark,
      StreamOps.windowAgg(StreamOps.eventsStream(spark, sf)))
      .collect().map(_.toSeq).toSet
    val batch = StreamOps.windowAgg(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming rolling-z ring buffer carries across micro-batches") {
    import graft.operators.Decompose
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val q = StreamOps.rollingZScores(df, window = 5, minN = 3).toDF()
      .writeStream.format("memory").queryName("rollz_test")
      .outputMode("append").start()
    // 12 events split across THREE batches: scores for later events
    // depend on state built in earlier batches
    val vals = Seq(1.0, 2.0, 1.5, 2.5, 1.0, 2.0, 9.0, 1.5, 2.0, 1.0, 2.5, 1.5)
    val evs = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
    try {
      mem.addData(evs.take(4): _*); q.processAllAvailable()
      mem.addData(evs.slice(4, 8): _*); q.processAllAvailable()
      mem.addData(evs.drop(8): _*); q.processAllAvailable()
      // the batch operator rounds z/value to 6 dp itself; apply the
      // same rounding to the raw streamed scores before comparing
      val streamed = spark.table("rollz_test")
        .select(col("user_id"), col("ts"), round(col("value"), 6).as("value"),
          round(col("z"), 6).as("z"), col("is_anomaly"))
        .collect()
        .map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4)))).sortBy(_._1).toSeq
      val batchDf = evs.toDF("user_id", "ts", "value")
      val batch = Decompose.rollingZ(batchDf, "user_id", "ts", "value",
          window = 5, minN = 3)
        .collect().map(r => (r.getLong(1), Option(r.get(3)), Option(r.get(4))))
        .sortBy(_._1).toSeq
      assert(streamed.nonEmpty && streamed === batch)
      // the planted 9.0 at index 6 (scored against batch-1 state + two
      // batch-2 events) must be flagged
      assert(streamed(6)._3.contains(1))
    } finally q.stop()
  }

  test("streaming retention emits each (user, offset) once across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wk = 604800000000000L
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val df = mem.toDF().toDF("user_id", "ts")
    val q = StreamOps.retention(df)
      .toDF().writeStream.format("memory").queryName("ret_test")
      .outputMode("append").start()
    try {
      // user 1 cohorted at week 10; user 2 at week 11. Batch 2 repeats
      // user 1's week-10/11 activity (must NOT re-emit) and adds new
      // offsets for both users.
      mem.addData((1L, 10 * wk + 5), (1L, 11 * wk + 3), (2L, 11 * wk + 9))
      q.processAllAvailable()
      mem.addData((1L, 10 * wk + 7), (1L, 11 * wk + 8), (1L, 13 * wk + 1),
        (2L, 12 * wk + 2))
      q.processAllAvailable()
      val rows = spark.table("ret_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(rows === Seq((1L, 10L, 0L), (1L, 10L, 1L), (1L, 10L, 3L),
        (2L, 11L, 0L), (2L, 11L, 1L)))
    } finally q.stop()
  }

  test("streaming SCD2 closes versions across micro-batches and keeps the open one in state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Long)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "event_id")
    val q = StreamOps.scd2(df)
      .toDF().writeStream.format("memory").queryName("scd2_test")
      .outputMode("append").start()
    try {
      // batch 1: A(10) A(20) B(30) -> closes v1 (A, 10..30)
      mem.addData((1L, 10L, "A", 1L), (1L, 20L, "A", 2L), (1L, 30L, "B", 3L))
      q.processAllAvailable()
      // batch 2: the open B version carries over; C(50) closes it with
      // the version counter CONTINUING (v2), then C stays open
      mem.addData((1L, 50L, "C", 4L), (1L, 60L, "C", 5L))
      q.processAllAvailable()
      val rows = spark.table("scd2_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).sorted.toSeq
      assert(rows === Seq((1L, 1L, "A", 10L, 30L), (1L, 2L, "B", 30L, 50L)))
    } finally q.stop()
  }

  test("checkpointed stateful dedup is exactly-once across a query restart") {
    // the durability contract every long-running 100 TB stream relies
    // on: stop the query mid-corpus, restart from the SAME checkpoint
    // over new files — keys deduped before the restart must not
    // re-emit (state restored), new keys must still appear, and the
    // file sink must hold each key exactly once (no replayed batch)
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
    ev.where(col("user_id") % 2 === 0).repartition(1).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    def start() = {
      val stream = spark.readStream.schema(schema).parquet(src)
      StreamOps.dedupStream(stream, Seq("user_id", "event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    // "restart": new process would do exactly this — same checkpoint,
    // more source files
    ev.where(col("user_id") % 2 === 1).repartition(1)
      .write.mode("append").parquet(src)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(out)
    val expected = ev.select(col("user_id"), col("event_type")).distinct().count()
    assert(got.count() === expected)               // exactly-once: no re-emits
    assert(got.distinct().count() === expected)    // and every key present once
  }

  test("band-index probe runs stateless: no state store in the streaming plan") {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("graft_probe_spec")
      .toString + "/idx"
    graft.operators.Dedup.bandIndexWrite(base, "doc_id", "text", idx)
    val index = spark.read.parquet(idx)
    val fresh = StreamOps.docsStream(spark, sf)
      .select(col("doc_id"), col("text"))
      .where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail marker words")).as("text"))
    val probe = StreamOps.bandIndexProbe(fresh, "doc_id", "text", index, base)
    val name = s"graft_probe_${System.nanoTime()}"
    val q = probe.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    // both joins are stream-static: the executed micro-batch must
    // report NO stateful operator — that's the firehose-rate property
    assert(q.lastProgress.stateOperators.isEmpty, q.lastProgress.prettyJson)
    // and the emitted pairs are all cross-batch (new id >= 100000 on
    // exactly one side) with verified jaccard
    val rows = spark.table(name).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < 100000L && r.getLong(1) >= 100000L)
      assert(r.getDouble(2) >= 0.8)
    }
  }

  test("corpus contract: (user_id, ts) unique in events, (user_id, ts, event_id) total") {
    // Every stateful twin buffers one key's micro-batch and sorts by
    // (ts_ns, event_id); batch twins window-order by ts alone. Those
    // agree as long as (user_id, ts) is unique — assert it, so a future
    // corpus that breaks the contract fails HERE, loudly, instead of as
    // a nondeterministic stream/batch hash divergence.
    val ev = Tables.events(spark, sf)
    assert(ev.groupBy("user_id", "ts").count().filter("count > 1").count() === 0L)
    // and event_id itself is globally unique, so the sort key is total
    assert(ev.groupBy("event_id").count().filter("count > 1").count() === 0L)
  }

  test("stream_state_report: engine state accounting matches the bounded-state claims") {
    import org.apache.spark.sql.functions._
    // ONE drain of the three stateful queries; every assertion reads
    // from this collect (a second stateReport call would re-drain all
    // three streams just to look at two more columns)
    val full = graft.queries.StreamingQueries.stateReport(spark, sf).collect()
    val report = full.map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    val byQuery = report.groupBy(_._1)
    assert(byQuery.keySet === Set("sessionize", "interval_join",
      "quantile_profile"))

    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()

    // mapGroupsWithState profile: EXACTLY one state row per key
    val (_, profRows, profUpd) = report.find(_._1 == "quantile_profile").get
    assert(profRows === nUsers)
    assert(profUpd > 0)

    // sessionize (flatMapGroupsWithState): state is the OPEN sessions
    // only — bounded by keys, far below the event count (eviction ran)
    val (_, sessRows, _) = report.find(_._1 == "sessionize").get
    assert(sessRows > 0 && sessRows <= nUsers,
      s"sessionize state $sessRows vs $nUsers users")

    // stream-stream interval join: both sides buffer within the
    // watermark horizon — state is bounded by the buffered input rows
    // (two sides), never more
    val joinRows = report.filter(_._1 == "interval_join").map(_._2).sum
    assert(joinRows > 0 && joinRows <= 2 * nEvents,
      s"join state $joinRows vs ${2 * nEvents} bound")

    // every operator reported real accounting (bytes + watermark land
    // in the row; rows_updated is non-negative by construction)
    assert(full.forall(_.getLong(5) > 0), "memoryUsedBytes must be reported")
    assert(full.exists(_.getString(6).nonEmpty), "final watermark missing")
  }
}
