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
