package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle key and runs") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle $k has no query"))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("q_agg groups are the 6 flag/status combos and sums positive") {
    val df = SparkEntry.queries("q_agg")(spark, sf)
    val rows = df.collect()
    assert(rows.length >= 3 && rows.length <= 6)
    // publish form is env-switched (double view default, exact
    // decimal(38,6) under SPARK_GRAFT_EXACT_DECIMAL=1) — compare
    // through Number so the spec passes under either arm
    assert(rows.forall(
      _.getAs[Number]("sum_qty").doubleValue > 0))
  }

  test("q_topk returns at most 3 per priority") {
    val df = SparkEntry.queries("q_topk")(spark, sf)
    val over = df.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .filter(col("n") > 3).count()
    assert(over == 0)
  }
}
