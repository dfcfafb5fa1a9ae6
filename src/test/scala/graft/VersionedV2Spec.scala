package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedV2

/** The DSv2 WRITE rung: two-phase commit on the directory-versioned
  * table — all-or-nothing publishes, planted-failure atomicity, time
  * travel, and the bit-exact write→read round trip.
  */
class VersionedV2Spec extends SparkSpec {

  private val FMT = "graft.sources.VersionedV2"

  private def tempTable(): String =
    Files.createTempDirectory("graft_versioned").toString + "/t"

  private def rows(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id"),
      (col("id").cast("double") / 7.0).as("val"))

  private def readTable(path: String, version: Option[Int] = None): DataFrame = {
    val r = spark.read.format(FMT).option("path", path)
    version.fold(r)(v => r.option("version", v.toString)).load()
  }

  test("write -> read round trip is bit-exact, append accumulates, overwrite truncates") {
    val path = tempTable()
    rows(0, 100).write.format(FMT).option("path", path)
      .mode("overwrite").save()
    assert(VersionedV2.latestVersion(path) == 1)
    val got1 = readTable(path).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got1 == (0L until 100L).map(i => (i, i / 7.0)).toSet)

    rows(100, 150).write.format(FMT).option("path", path)
      .mode("append").save()
    assert(VersionedV2.latestVersion(path) == 2)
    assert(readTable(path).count() == 150)

    rows(0, 10).write.format(FMT).option("path", path)
      .mode("overwrite").save()
    assert(VersionedV2.latestVersion(path) == 3)
    assert(readTable(path).count() == 10)
  }

  test("versions are immutable snapshots: time travel reads every committed state") {
    val path = tempTable()
    rows(0, 20).write.format(FMT).option("path", path).mode("overwrite").save()
    rows(20, 30).write.format(FMT).option("path", path).mode("append").save()
    rows(0, 5).write.format(FMT).option("path", path).mode("overwrite").save()
    assert(readTable(path, Some(1)).count() == 20)
    assert(readTable(path, Some(2)).count() == 30)
    assert(readTable(path, Some(3)).count() == 5)
    assert(readTable(path).count() == 5) // latest == v3
    // append never rewrote data: v2's manifest extends v1's
    assert(VersionedV2.manifest(path, 2).toSet
      .intersect(VersionedV2.manifest(path, 1).toSet)
      == VersionedV2.manifest(path, 1).toSet)
  }

  test("a planted task failure publishes NOTHING: pointer, snapshot, and staging all clean") {
    val path = tempTable()
    rows(0, 50).write.format(FMT).option("path", path).mode("overwrite").save()
    val before = readTable(path).collect().map(_.getLong(0)).toSet

    // one row poisons its task mid-write; other tasks commit their
    // staged files — the job must still publish NOTHING
    val poisoned = spark.range(0, 40, 1, 8).select(col("id"),
      when(col("id") === 17,
        expr("raise_error('planted write failure')").cast("double"))
        .otherwise(col("id").cast("double")).as("val"))
    val err = intercept[Exception] {
      poisoned.write.format(FMT).option("path", path).mode("append").save()
    }
    assert(err.getMessage != null)

    // all-or-nothing: version pointer unchanged, snapshot unchanged
    assert(VersionedV2.latestVersion(path) == 1)
    assert(readTable(path).collect().map(_.getLong(0)).toSet == before)
    // no partial data is visible OR retained: the staging area is gone
    // and the immutable pool only holds v1's published files
    assert(!Files.exists(Paths.get(path, "_staging")) ||
      !Files.list(Paths.get(path, "_staging")).findAny().isPresent)
    val pool = Files.list(Paths.get(path, "data")).iterator()
    val poolFiles = new scala.collection.mutable.ArrayBuffer[String]
    while (pool.hasNext) poolFiles += pool.next().getFileName.toString
    assert(poolFiles.toSet == VersionedV2.manifest(path, 1).toSet)
  }

  test("a successful commit after a failed one resumes the version chain") {
    val path = tempTable()
    rows(0, 10).write.format(FMT).option("path", path).mode("overwrite").save()
    intercept[Exception] {
      spark.range(0, 10).select(col("id"),
        expr("raise_error('boom')").cast("double").as("val"))
        .write.format(FMT).option("path", path).mode("append").save()
    }
    rows(10, 15).write.format(FMT).option("path", path).mode("append").save()
    assert(VersionedV2.latestVersion(path) == 2)
    assert(readTable(path).count() == 15)
  }

  test("a lost version race fails loudly and publishes nothing") {
    // single-writer contract: if another committer won version N+1
    // between our staging and publish (simulated by pre-creating the
    // version directory), the commit must THROW — never silently
    // clobber the other writer's manifest — and the pointer must not
    // move, so readers keep the last good snapshot
    val path = tempTable()
    rows(0, 10).write.format(FMT).option("path", path).mode("overwrite").save()
    Files.createDirectory(Paths.get(path, "v2")) // the rival's commit-in-flight
    val e = intercept[Exception] {
      rows(10, 20).write.format(FMT).option("path", path).mode("append").save()
    }
    assert(e != null)
    assert(VersionedV2.latestVersion(path) == 1)
    assert(readTable(path).count() == 10)
    // the race guard trips BEFORE the pool is touched: no orphaned
    // files from the losing commit pollute the immutable data pool
    val pool = Files.list(Paths.get(path, "data")).iterator()
    val poolFiles = new scala.collection.mutable.ArrayBuffer[String]
    while (pool.hasNext) poolFiles += pool.next().getFileName.toString
    assert(poolFiles.toSet == VersionedV2.manifest(path, 1).toSet)
  }

  test("vacuum drops old versions, collects unreferenced files, keeps the live snapshot") {
    val path = tempTable()
    rows(0, 40).write.format(FMT).option("path", path).mode("overwrite").save()
    rows(40, 50).write.format(FMT).option("path", path).mode("append").save()
    rows(0, 7).write.format(FMT).option("path", path).mode("overwrite").save()
    // plant an orphan (the crashed-commit residue vacuum must collect)
    Files.write(Paths.get(path, "data", "orphan.txt"),
      "1,0".getBytes("UTF-8"))
    val r = VersionedV2.vacuum(path, keepVersions = 1)
    assert(r.deletedVersions == 2) // v1, v2 dropped
    // v1+v2's files AND the orphan collected; v3's files retained
    assert(r.retainedFiles == VersionedV2.manifest(path, 3).size)
    val pool = Files.list(Paths.get(path, "data")).iterator()
    val poolFiles = new scala.collection.mutable.ArrayBuffer[String]
    while (pool.hasNext) poolFiles += pool.next().getFileName.toString
    assert(poolFiles.toSet == VersionedV2.manifest(path, 3).toSet)
    // the live snapshot is untouched; vacuumed versions fail loudly
    assert(VersionedV2.latestVersion(path) == 3)
    assert(readTable(path).count() == 7)
    intercept[Exception] { readTable(path, Some(1)).count() }
  }

  test("vacuum retention keeps time travel inside the window; dead claims reclaim only on request") {
    val path = tempTable()
    rows(0, 10).write.format(FMT).option("path", path).mode("overwrite").save()
    rows(10, 20).write.format(FMT).option("path", path).mode("append").save()
    // a commit that crashed after claiming v3 (manifest-less dir)
    Files.createDirectory(Paths.get(path, "v3"))
    val r1 = VersionedV2.vacuum(path, keepVersions = 2)
    assert(r1.deletedVersions == 0 && r1.reclaimedClaims == 0)
    assert(readTable(path, Some(1)).count() == 10) // inside the window
    assert(readTable(path, Some(2)).count() == 20)
    // reclaim on request: the dead claim goes, the next commit succeeds
    val r2 = VersionedV2.vacuum(path, keepVersions = 2,
      reclaimDeadClaims = true)
    assert(r2.reclaimedClaims == 1)
    rows(20, 25).write.format(FMT).option("path", path).mode("append").save()
    assert(VersionedV2.latestVersion(path) == 3)
    assert(readTable(path).count() == 25)
  }

  test("reclaimDeadClaims repairs a manifest-FULL dead claim (crash between manifest and pointer)") {
    val path = tempTable()
    rows(0, 10).write.format(FMT).option("path", path).mode("overwrite").save()
    rows(10, 20).write.format(FMT).option("path", path).mode("append").save()
    // plant the worst crash point: v3 claimed, manifest fully written,
    // pointer move LOST — the table is wedged for every writer kind
    Files.createDirectory(Paths.get(path, "v3"))
    Files.writeString(Paths.get(path, "v3", "manifest.txt"),
      VersionedV2.manifest(path, 2).mkString("\n"))
    // batch commit hits the existing claim and must fail loudly
    intercept[Exception] {
      rows(20, 25).write.format(FMT).option("path", path).mode("append").save()
    }
    // reads are unaffected: the pointer still says v2
    assert(readTable(path).count() == 20)
    // repair: the manifest-full dead claim above the pointer reclaims
    val r = VersionedV2.vacuum(path, keepVersions = 2, reclaimDeadClaims = true)
    assert(r.reclaimedClaims == 1)
    // and the table takes commits again — no manual directory surgery
    rows(20, 25).write.format(FMT).option("path", path).mode("append").save()
    assert(VersionedV2.latestVersion(path) == 3)
    assert(readTable(path).count() == 25)
    assert(readTable(path, Some(2)).count() == 20) // history intact
  }

  test("streaming sink: each micro-batch epoch publishes one immutable version") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tempTable()
    val ckpt = Files.createTempDirectory("graft_versioned_ckpt").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("id", "val")
      .writeStream.format(FMT)
      .option("path", path).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData((1L, 0.5), (2L, 1.5))
      q.processAllAvailable()
      assert(VersionedV2.latestVersion(path) == 1)
      assert(readTable(path).count() == 2)
      mem.addData((3L, 2.5))
      q.processAllAvailable()
      assert(VersionedV2.latestVersion(path) == 2)
      assert(readTable(path).collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 3L))
      // the first epoch stays readable as its own snapshot
      assert(readTable(path, Some(1)).count() == 2)
    } finally q.stop()
  }

  /** Drive the StreamingWrite surface directly — the shape a
    * restarted query produces when it re-runs its last micro-batch.
    */
  private def streamingWriter(path: String, writerId: String,
                              qid: String = "replay_test") = {
    import org.apache.spark.sql.connector.write.LogicalWriteInfo
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val table = new graft.sources.VersionedV2().getTable(
      VersionedV2.schema, Array.empty,
      new java.util.HashMap[String, String] { put("path", path) })
    val opts = new java.util.HashMap[String, String] {
      put("writerId", writerId)
    }
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(opts)
      override def queryId(): String = qid
      override def schema(): org.apache.spark.sql.types.StructType =
        VersionedV2.schema
    }
    table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
      .newWriteBuilder(info).build().toStreaming
  }

  private def runEpoch(sw: org.apache.spark.sql.connector.write.streaming.StreamingWrite,
                       epoch: Long, ids: Seq[Long]): Unit = {
    val factory = sw.createStreamingWriterFactory(null)
    val w = factory.createWriter(0, 0L, epoch)
    ids.foreach(i => w.write(new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](i, i / 2.0))))
    val msg = w.commit()
    sw.commit(epoch, Array(msg))
  }

  test("streaming sink: a replayed epoch commits exactly once") {
    val path = tempTable()
    rows(0, 3).write.format(FMT).option("path", path).mode("overwrite").save()
    val sw = streamingWriter(path, "wA")
    runEpoch(sw, 7L, Seq(10L, 11L))
    assert(VersionedV2.latestVersion(path) == 2)
    assert(readTable(path).count() == 5)
    // the REPLAY: same epoch id arrives again — no new version, no
    // duplicate rows, replayed staging dropped
    runEpoch(sw, 7L, Seq(10L, 11L))
    assert(VersionedV2.latestVersion(path) == 2)
    assert(readTable(path).count() == 5)
    assert(!Files.exists(Paths.get(path, "_staging", "replay_test")))
    // a NEW epoch still publishes
    runEpoch(sw, 8L, Seq(12L))
    assert(VersionedV2.latestVersion(path) == 3)
    assert(readTable(path).count() == 6)
  }

  test("epoch markers are writer-scoped: a second stream's epoch 0 is not a replay") {
    val path = tempTable()
    val a = streamingWriter(path, "streamA", qid = "qa")
    runEpoch(a, 0L, Seq(1L))
    runEpoch(a, 1L, Seq(2L))
    assert(VersionedV2.latestVersion(path) == 2)
    // a NEW query (fresh checkpoint, epoch ids restart at 0) must not
    // have its first batches swallowed as stream A's replays
    val b = streamingWriter(path, "streamB", qid = "qb")
    runEpoch(b, 0L, Seq(10L))
    runEpoch(b, 1L, Seq(11L))
    assert(VersionedV2.latestVersion(path) == 4)
    assert(readTable(path).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 10L, 11L))
    // while each writer's OWN replay still dedups
    runEpoch(b, 1L, Seq(11L))
    assert(VersionedV2.latestVersion(path) == 4)
  }

  test("vacuum works on a streaming-written table and retention cannot re-enable a replay") {
    val path = tempTable()
    val sw = streamingWriter(path, "wV")
    runEpoch(sw, 0L, Seq(1L))
    runEpoch(sw, 1L, Seq(2L))
    runEpoch(sw, 2L, Seq(3L))
    // version dirs hold epoch markers too — vacuum must still delete them
    val r = VersionedV2.vacuum(path, keepVersions = 1)
    assert(r.deletedVersions == 2)
    assert(readTable(path).count() == 3) // live snapshot intact (append chain)
    // the vacuumed markers folded into the ledger: replaying epoch 1
    // (whose version dir is GONE) must still be recognized, not
    // re-published as duplicate rows
    runEpoch(sw, 1L, Seq(2L))
    assert(VersionedV2.latestVersion(path) == 3)
    assert(readTable(path).count() == 3)
  }

  test("a commit that crashed mid-publish recovers on replay instead of wedging") {
    val path = tempTable()
    val sw = streamingWriter(path, "wC")
    runEpoch(sw, 0L, Seq(1L, 2L))
    assert(VersionedV2.latestVersion(path) == 1)

    // crash point A: claimed v2 + wrote the marker, no manifest (died
    // before/while moving files) — the replay must reclaim the dead
    // claim and publish, not throw FileAlreadyExistsException forever
    Files.createDirectory(Paths.get(path, "v2"))
    Files.write(Paths.get(path, "v2", "epoch.txt"),
      "wC:1".getBytes("UTF-8"))
    runEpoch(sw, 1L, Seq(3L))
    assert(VersionedV2.latestVersion(path) == 2)
    assert(readTable(path).count() == 3)

    // crash point B: marker + manifest fully written, died before the
    // pointer move — the replay completes the commit (pointer moves to
    // the already-published files) and drops its own staging
    val dataFile = "recovered-part.txt"
    Files.write(Paths.get(path, "data", dataFile), "99,0\n".getBytes("UTF-8"))
    Files.createDirectory(Paths.get(path, "v3"))
    Files.write(Paths.get(path, "v3", "epoch.txt"), "wC:2".getBytes("UTF-8"))
    val prev = VersionedV2.manifest(path, 2)
    Files.write(Paths.get(path, "v3", "manifest.txt"),
      (prev :+ dataFile).mkString("\n").getBytes("UTF-8"))
    runEpoch(sw, 2L, Seq(99L)) // the deterministic replay of that batch
    assert(VersionedV2.latestVersion(path) == 3)
    val ids = readTable(path).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L, 99L))
    assert(readTable(path).count() == 4) // no duplicate 99
  }

  test("delete is copy-on-write: only touched files rewrite, history time-travels, vacuum erases") {
    val path = tempTable()
    rows(0, 100).write.format(FMT).option("path", path).mode("overwrite").save()
    rows(100, 200).write.format(FMT).option("path", path).mode("append").save()
    val before = VersionedV2.manifest(path, 2)
    val v2Only = before.toSet -- VersionedV2.manifest(path, 1).toSet
    val rep = VersionedV2.delete(path, id => id % 10 == 0 && id < 100)
    assert(rep.version == 3 && rep.deletedRows == 10)
    val after = VersionedV2.manifest(path, 3).toSet
    assert(rep.carriedFiles + rep.rewrittenFiles == before.size)
    // the second commit's files (ids >= 100, no matches) carried by
    // reference; every NEW file in the manifest is a cow rewrite
    assert(v2Only.subsetOf(after))
    assert(after.diff(before.toSet).forall(_.startsWith("cow-v3-")))
    val replaced = before.toSet.diff(after)
    assert(replaced.size == rep.rewrittenFiles && rep.rewrittenFiles > 0)
    // snapshots: history intact pre-delete, rows gone post-delete
    assert(readTable(path, Some(2)).count() == 200)
    assert(readTable(path).count() == 190)
    assert(readTable(path).where(col("id") % 10 === 0 && col("id") < 100).count() == 0)
    // true erasure = delete + retention vacuum: the pre-rewrite files
    // (and with them the deleted rows' bytes) leave the pool
    val vr = VersionedV2.vacuum(path, keepVersions = 1)
    assert(vr.deletedVersions == 2)
    replaced.foreach { f =>
      assert(!Files.exists(Paths.get(path, "data", f)), s"$f not erased")
    }
    assert(readTable(path).count() == 190)
  }

  test("delete of every row in a file drops the file from the manifest") {
    val path = tempTable()
    rows(0, 50).write.format(FMT).option("path", path).mode("overwrite").save()
    val rep = VersionedV2.delete(path, _ => true)
    assert(rep.keptRows == 0 && rep.deletedRows == 50)
    assert(VersionedV2.manifest(path, rep.version).isEmpty)
    assert(readTable(path).count() == 0)
    assert(readTable(path, Some(1)).count() == 50) // history intact
  }

  test("add-column evolution: metadata-only version, null-fill on old files, honest time travel") {
    val path = tempTable()
    rows(0, 30).write.format(FMT).option("path", path).mode("overwrite").save()
    val ev = VersionedV2.evolveSchema(path, "tag", "string")
    assert(ev == 2)
    // metadata-only: same data files, no rewrite
    assert(VersionedV2.manifest(path, 2) == VersionedV2.manifest(path, 1))
    // pre-evolution snapshot keeps the OLD schema
    assert(readTable(path, Some(1)).columns.toSeq == Seq("id", "val"))
    // post-evolution read null-fills
    val v2 = readTable(path, Some(2))
    assert(v2.columns.toSeq == Seq("id", "val", "tag"))
    assert(v2.where(col("tag").isNull).count() == 30)
    // writes after the evolution must carry the column...
    rows(30, 40).withColumn("tag",
        when(col("id") % 2 === 0, concat(lit("t"), col("id"))))
      .write.format(FMT).option("path", path).mode("append").save()
    val v3 = readTable(path)
    assert(v3.count() == 40)
    assert(v3.where(col("tag").isNotNull).count() == 5)
    assert(v3.where(col("id") === 32).select("tag").head.getString(0) == "t32")
    // ...or may omit it: Spark's TableOutputResolver null-extends a
    // missing NULLABLE column by name (the lake-format courtesy for
    // not-yet-migrated writers) — values land in the right columns
    rows(40, 50).write.format(FMT).option("path", path).mode("append").save()
    val v4 = readTable(path)
    assert(v4.count() == 50)
    assert(v4.where(col("id") >= 40 && col("tag").isNull).count() == 10)
    assert(v4.where(col("id") === 45).select("val").head.getDouble(0) == 45 / 7.0)
    // overwrite after evolution keeps the evolved schema
    rows(0, 3).withColumn("tag", lit("x"))
      .write.format(FMT).option("path", path).mode("overwrite").save()
    assert(readTable(path).where(col("tag") === "x").count() == 3)
  }

  test("evolution survives vacuum, long/double columns round-trip, bad evolutions reject") {
    val path = tempTable()
    rows(0, 10).write.format(FMT).option("path", path).mode("overwrite").save()
    VersionedV2.evolveSchema(path, "w", "double")
    VersionedV2.evolveSchema(path, "k", "long")
    rows(10, 20)
      .withColumn("w", when(col("id") % 2 === 0, col("id") * 1.5))
      .withColumn("k", when(col("id") % 3 === 0, col("id") * 10))
      .write.format(FMT).option("path", path).mode("append").save()
    // schema history is table-level: retention vacuum cannot lose it
    VersionedV2.vacuum(path, keepVersions = 1)
    val d = readTable(path)
    assert(d.columns.toSeq == Seq("id", "val", "w", "k"))
    assert(d.where(col("id") === 12).select("w").head.getDouble(0) == 18.0)
    assert(d.where(col("id") === 12).select("k").head.getLong(0) == 120L)
    assert(d.where(col("id") === 13).select("w").head.isNullAt(0))
    assert(d.where(col("id") < 10 && col("w").isNull).count() == 10)
    // duplicate name and unsupported type reject loudly
    intercept[IllegalArgumentException] {
      VersionedV2.evolveSchema(path, "w", "double")
    }
    intercept[IllegalArgumentException] {
      VersionedV2.evolveSchema(path, "m", "map")
    }
  }

  test("delete and evolve claim the version chain like any commit: a dead claim blocks, reclaim repairs") {
    val path = tempTable()
    rows(0, 10).write.format(FMT).option("path", path).mode("overwrite").save()
    // plant a dead claim (a crashed commit's residue)
    Files.createDirectory(Paths.get(path, "v2"))
    intercept[Exception] { VersionedV2.delete(path, _ => true) }
    intercept[Exception] { VersionedV2.evolveSchema(path, "tag", "string") }
    assert(VersionedV2.latestVersion(path) == 1) // nothing published
    VersionedV2.vacuum(path, keepVersions = 1, reclaimDeadClaims = true)
    val rep = VersionedV2.delete(path, id => id < 5)
    assert(rep.version == 2 && readTable(path).count() == 5)
  }

  test("the writer rejects a mismatched schema loudly") {
    // Spark's DSv2 analyzer enforces the table schema before our own
    // newWriteBuilder guard even runs — either rejection is loud and
    // nothing is published
    val path = tempTable()
    val bad = spark.range(5).select(col("id"), col("id").as("not_val"))
    val e = intercept[Exception] {
      bad.write.format(FMT).option("path", path).mode("overwrite").save()
    }
    assert(e.getMessage.contains("val") ||
      e.getMessage.contains("VersionedV2 expects"))
    assert(VersionedV2.latestVersion(path) == 0)
  }
}
