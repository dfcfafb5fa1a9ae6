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
    // sums publish as exact decimal(38,6) (the r15 >9e9 round-ambiguity
    // fix); compare numerically via BigDecimal
    assert(rows.forall(_.getAs[java.math.BigDecimal]("sum_qty").signum > 0))
  }

  test("q_topk returns at most 3 per priority") {
    val df = SparkEntry.queries("q_topk")(spark, sf)
    val over = df.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .filter(col("n") > 3).count()
    assert(over == 0)
  }
}
