package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.HllAgg
import graft.operators.HllSketch
import graft.prep.Profiler

/** HllAgg (the single-expression deterministic HLL) must agree
  * BIT-FOR-BIT with the relational HllSketch path — same md5-register
  * construction, same estimate arithmetic — so the Profiler's
  * approxDistinct estimates stay externally replayable.
  */
class HllAggSpec extends SparkSpec {
  import spark.implicits._

  private def hllCol(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(HllAgg(
      ColumnBridge.expression(md5(c.cast("string")))).toAggregateExpression())

  test("HllAgg estimate equals HllSketch.estimate exactly (raw-HLL branch)") {
    val df = Tables.lineitem(spark, sf).select(col("l_partkey"))
    val viaSketch = HllSketch.estimate(HllSketch.registers(df, "l_partkey"))
      .collect()(0).getDouble(0)
    val viaAgg = df.where(col("l_partkey").isNotNull)
      .agg(hllCol(col("l_partkey")).as("est")).collect()(0).getDouble(0)
    assert(viaAgg == viaSketch)
  }

  test("HllAgg estimate equals HllSketch.estimate exactly (linear-counting branch)") {
    val df = Tables.events(spark, sf).select(col("user_id"))
    val viaSketch = HllSketch.estimate(HllSketch.registers(df, "user_id"))
      .collect()(0).getDouble(0)
    val viaAgg = df.where(col("user_id").isNotNull)
      .agg(hllCol(col("user_id")).as("est")).collect()(0).getDouble(0)
    assert(viaAgg == viaSketch)
  }

  test("HllAgg is partitioning-independent (merge = register max)") {
    val df = Tables.lineitem(spark, sf).select(col("l_orderkey"))
    val one = df.coalesce(1).agg(hllCol(col("l_orderkey"))).collect()(0).getDouble(0)
    val many = df.repartition(13).agg(hllCol(col("l_orderkey"))).collect()(0).getDouble(0)
    assert(one == many)
  }

  test("HllAgg skips nulls like the registers() isNotNull filter") {
    val df = Seq(Some("a"), None, Some("b"), Some("a"), None).toDF("v")
    val withNulls = df.agg(hllCol(col("v"))).collect()(0).getDouble(0)
    val noNulls = df.where(col("v").isNotNull)
      .agg(hllCol(col("v"))).collect()(0).getDouble(0)
    assert(withNulls == noNulls)
  }

  test("Profiler approxDistinct rides the deterministic sketch, other stats exact") {
    val df = Tables.orders(spark, sf)
    val cols = Seq("o_custkey", "o_orderstatus")
    val exact = Profiler.profile(df, cols).orderBy("column").collect()
    val approx = Profiler.profile(df, cols, approxDistinct = true)
      .orderBy("column").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      assert(e.getLong(1) == a.getLong(1)) // n_rows
      assert(e.getLong(2) == a.getLong(2)) // n_nulls
      // the estimate is the rounded deterministic HLL value
      val est = df.where(col(a.getString(0)).isNotNull)
        .agg(hllCol(col(a.getString(0)))).collect()(0).getDouble(0)
      assert(a.getLong(3) == math.round(est))
      // sketch error stays inside the HLL envelope (~1.04/sqrt(512) ≈ 4.6%)
      val rel = math.abs(a.getLong(3) - e.getLong(3)).toDouble /
        math.max(e.getLong(3), 1L)
      assert(rel < 0.15, s"estimate off ${rel * 100}% for ${a.getString(0)}")
    }
  }
}
