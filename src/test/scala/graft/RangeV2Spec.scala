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

  test("Long.MaxValue bounds don't wrap: <= MaxValue is a no-op, = / > MaxValue are empty") {
    // id <= MaxValue is vacuously true — the clamp must not shrink the scan
    assert(ranged(0, 1000).where(col("id") <= Long.MaxValue).count() === 1000L)
    // id = MaxValue / id > MaxValue-1: unrepresentable rows -> empty, not wrapped-negative
    assert(ranged(0, 1000).where(col("id") === Long.MaxValue).count() === 0L)
    assert(ranged(0, 1000).where(col("id") > Long.MaxValue - 1).count() === 0L)
  }
}
