package graft

import org.apache.spark.sql.functions._

/** The custom DataSourceV2 ([[graft.sources.RangeV2]]): filter
  * pushdown must NARROW THE SCAN (no residual Filter node, pruned
  * splits never planned), column pruning must reach the reader, and
  * the generated rows must be exactly the deterministic spec.
  */
class RangeV2Spec extends SparkSpec {

  private def ranged(start: Long, end: Long, slices: Int = 8) =
    spark.read.format("graft.sources.RangeV2")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", slices.toString)
      .load()

  test("generates exactly [start, end) with the deterministic val column") {
    val rows = ranged(0, 100).orderBy(col("id")).collect()
    assert(rows.length === 100)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getDouble(1) === graft.sources.RangeV2.valOf(i.toLong))
    }
  }

  test("id-range filters push into the connector: narrowed scan, no residual Filter") {
    val df = ranged(0, 100000).where(col("id") >= 25000 && col("id") < 75000)
    val plan = df.queryExecution.executedPlan.toString
    // the scan itself narrowed...
    assert(plan.contains("GraftRangeV2[25000,75000)"))
    // ...and the predicate vanished from the plan (fully handled)
    assert(!plan.contains("Filter ("))
    assert(df.count() === 50000L)
  }

  test("equality filter collapses the scan to a single row") {
    val df = ranged(0, 1000000).where(col("id") === 424242)
    assert(df.queryExecution.executedPlan.toString
      .contains("GraftRangeV2[424242,424243)"))
    val r = df.head()
    assert(r.getLong(0) === 424242L)
  }

  test("column pruning reaches the reader (projected schema, correct sums)") {
    val df = ranged(0, 1000).select(col("id"))
    assert(df.schema.fieldNames.toSeq === Seq("id"))
    assert(df.agg(sum(col("id"))).head().getLong(0) === 999L * 1000 / 2)
  }

  test("slices control parallelism; empty after-pushdown range plans zero splits") {
    assert(ranged(0, 1000, slices = 4).rdd.getNumPartitions === 4)
    val empty = ranged(0, 1000).where(col("id") > 5000)
    assert(empty.count() === 0L)
  }

  test("aggregate pushdown: count/min/max/sum(id) collapse into the connector") {
    val df = ranged(0, 1000000).where(col("id") >= 100 && col("id") < 500000)
      .selectExpr("count(*) as n", "count(id) as nid", "min(id) as mn",
        "max(id) as mx", "sum(id) as s")
    val plan = df.queryExecution.executedPlan.toString
    // the scan IS the aggregate — no row generation, no HashAggregate input rows
    assert(plan.contains("GraftRangeV2Agg[100,500000)"), plan)
    val r = df.head()
    val n = 500000L - 100L
    assert(r.getLong(0) === n && r.getLong(1) === n)
    assert(r.getLong(2) === 100L && r.getLong(3) === 499999L)
    assert(r.getLong(4) === (100L + 499999L) * n / 2)
  }

  test("aggregate pushdown declines val-column aggs and GROUP BY (normal scan)") {
    val g = ranged(0, 1000).groupBy(expr("id % 10").as("k")).count()
    assert(!g.queryExecution.executedPlan.toString.contains("GraftRangeV2Agg"))
    assert(g.count() === 10L)
    val v = ranged(0, 1000).agg(sum(col("val")))
    assert(!v.queryExecution.executedPlan.toString.contains("GraftRangeV2Agg"))
    assert(v.head().getDouble(0) > 0.0)
  }

  test("aggregate pushdown on an empty pruned range yields count 0, null min/max/sum") {
    val df = ranged(0, 1000).where(col("id") > 5000)
      .selectExpr("count(*) as n", "min(id) as mn", "max(id) as mx", "sum(id) as s")
    val r = df.head()
    assert(r.getLong(0) === 0L && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("runtime V2 filtering: an IN predicate narrows planned splits to the value envelope") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val table = new graft.sources.RangeV2().getTable(
      graft.sources.RangeV2.schema, Array.empty,
      java.util.Map.of("start", "0", "end", "1000000", "slices", "8"))
    def freshScan() = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of())).build()
    val scan = freshScan()
    assert(scan.isInstanceOf[SupportsRuntimeV2Filtering])
    val rt = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rt.filterAttributes().map(_.describe()).toSeq === Seq("id"))
    // before: 8 splits over [0, 1e6); after IN(700000, 700123): the
    // envelope [700000, 700124) — 8 tiny splits, none outside it
    val before = scan.toBatch.planInputPartitions()
    assert(before.length === 8)
    rt.filter(Array(new Predicate("IN", Array(
      Expressions.column("id"),
      Expressions.literal(java.lang.Long.valueOf(700000L)),
      Expressions.literal(java.lang.Long.valueOf(700123L))))))
    val after = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.RangeV2Partition])
    assert(after.forall(p => p.lo >= 700000L && p.hi <= 700124L), after.toSeq)
    // empty build side prunes everything
    val scan2 = freshScan().asInstanceOf[SupportsRuntimeV2Filtering]
    scan2.filter(Array(new Predicate("IN", Array(Expressions.column("id")))))
    assert(scan2.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions().isEmpty)
    // a MIXED value list (one Long literal, one non-Long) must be a
    // NO-OP: narrowing to the parsed subset's envelope could prune
    // splits the unparsed value would have matched
    val scan3 = freshScan().asInstanceOf[SupportsRuntimeV2Filtering]
    scan3.filter(Array(new Predicate("IN", Array(
      Expressions.column("id"),
      Expressions.literal(java.lang.Long.valueOf(700000L)),
      Expressions.literal("5")))))
    val mixed = scan3.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions()
      .map(_.asInstanceOf[graft.sources.RangeV2Partition])
    assert(mixed.length === 8)
    assert(mixed.head.lo === 0L && mixed.last.hi === 1000000L, mixed.toSeq)
  }

  test("runtime filtering end-to-end: broadcast join delivers DPP and results stay exact") {
    import spark.implicits._
    val dim = Seq(1234L, 99999L, 567890L).toDF("k").where(col("k") > 0)
    val fact = ranged(0, 1000000)
    val j = fact.join(broadcast(dim), fact("id") === dim("k"))
      .select(col("id"), col("val"))
    val rows = j.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.keySet === Set(1234L, 99999L, 567890L))
    rows.foreach { case (id, v) =>
      assert(v === graft.sources.RangeV2.valOf(id))
    }
  }

  test("reported statistics drive broadcast: a filtered slice joins without a hint") {
    // no broadcast() hint anywhere: the small side must broadcast
    // because estimateStatistics reports its post-pushdown size
    val big = ranged(0, 2000000)
    val small = ranged(0, 2000000).where(col("id") >= 100 && col("id") < 200)
      .select(col("id").as("k"))
    val j = big.join(small, big("id") === small("k"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(j.count() === 100L)
    // and the stats themselves are the pruned envelope, not a default
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val table = new graft.sources.RangeV2().getTable(
      graft.sources.RangeV2.schema, Array.empty,
      java.util.Map.of("start", "0", "end", "1000000", "slices", "8"))
    val sb = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of()))
    sb.asInstanceOf[org.apache.spark.sql.connector.read.SupportsPushDownFilters]
      .pushFilters(Array(
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 10L),
        org.apache.spark.sql.sources.LessThan("id", 20L)))
    val stats = sb.build().asInstanceOf[SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong === 10L)
    assert(stats.sizeInBytes().getAsLong === 10L * 16L)
  }

  test("Long.MaxValue bounds don't wrap: <= MaxValue is a no-op, = / > MaxValue are empty") {
    // id <= MaxValue is vacuously true — the clamp must not shrink the scan
    assert(ranged(0, 1000).where(col("id") <= Long.MaxValue).count() === 1000L)
    // id = MaxValue / id > MaxValue-1: unrepresentable rows -> empty, not wrapped-negative
    assert(ranged(0, 1000).where(col("id") === Long.MaxValue).count() === 0L)
    assert(ranged(0, 1000).where(col("id") > Long.MaxValue - 1).count() === 0L)
  }

  test("limit pushdown truncates the generator itself (rung 6)") {
    // LIMIT 5 over a billion-id range: the scan must plan 5 rows of
    // work, not a billion — the connector truncates and reports the
    // pushed limit in its description
    val df = ranged(0, 1000000000L).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit=5"), plan)
    val got = df.collect().map(_.getLong(0)).sorted
    assert(got.length === 5)
    assert(got.forall(id => id >= 0 && id < 1000000000L))
    // composes with filter pushdown: the limit truncates the
    // FILTER-NARROWED range, so rows satisfy both
    val both = ranged(0, 1000000000L).where(col("id") >= 500).limit(3)
    val rows = both.collect().map(_.getLong(0))
    assert(rows.length === 3 && rows.forall(_ >= 500))
    assert(both.queryExecution.executedPlan.toString.contains("PushedLimit=3"))
    // statistics reflect the truncated envelope: 5 rows, not 1e9
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.forall(_ <= 5) ||
      stats.sizeInBytes <= BigInt(5 * 16))
    // a range wider than 2^63 (width wraps negative) must STILL
    // truncate — Spark dropped its own Limit on our total-push promise
    val huge = ranged(Long.MinValue + 10, Long.MaxValue - 10).limit(4)
    val hugeRows = huge.collect()
    assert(hugeRows.length === 4)
    assert(hugeRows.map(_.getLong(0)).toSet ===
      (Long.MinValue + 10 until Long.MinValue + 14).toSet)
  }
}
