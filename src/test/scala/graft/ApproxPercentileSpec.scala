package graft

import org.apache.spark.sql.functions._

/** The opt-in exact-percentile → log-histogram sketch optimizer
  * rewrite ([[graft.plans.ApproxPercentileRewrite]]): identity when
  * off, fires on scalar unit-frequency percentiles when on, leaves
  * array percentiles and weighted percentiles intact, answers stay
  * inside the half-γ-bucket (~5%) value-error envelope, and the
  * sketch aggregate equals the relational QuantileSketch path.
  */
class ApproxPercentileSpec extends SparkSpec {

  private def sql(q: String) = {
    Graft.registerAll(spark, sf)
    spark.sql(q)
  }

  private def planOf(q: String): String =
    sql(q).queryExecution.executedPlan.toString

  test("flag off (default): plan untouched, answer exact") {
    spark.conf.set("spark.graft.approxPercentile", "false")
    val df = sql("SELECT percentile(l_extendedprice, 0.5) AS p FROM lineitem")
    assert(!df.queryExecution.executedPlan.toString.contains("log_hist_quantile"))
    val exact = Tables.lineitem(spark, sf)
      .select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    assert(df.head().getDouble(0) === exact)
  }

  test("flag on: scalar percentile re-plans onto the sketch, answer within 5% of exact") {
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val q = "SELECT percentile(l_extendedprice, 0.5) AS p FROM lineitem"
      val plan = planOf(q)
      assert(plan.contains("log_hist_quantile"), plan)
      // TypedImperativeAggregate plans as ObjectHashAggregate with a
      // partial (map-side) stage — the sketch merges by count addition
      // before the 1-row exchange
      assert(plan.contains("ObjectHashAggregate"), plan)
      assert(plan.contains("partial_log_hist_quantile"), plan)
      val est = sql(q).head().getDouble(0)
      val exact = Tables.lineitem(spark, sf)
        .select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
      assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
      // deterministic on re-run
      assert(sql(q).head().getDouble(0) === est)
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }

  test("flag on: array and weighted percentiles are left intact") {
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val arr = planOf(
        "SELECT percentile(l_extendedprice, array(0.25, 0.75)) AS p FROM lineitem")
      assert(!arr.contains("log_hist_quantile"), arr)
      val weighted = planOf(
        "SELECT percentile(l_extendedprice, 0.5, l_linenumber) AS p FROM lineitem")
      assert(!weighted.contains("log_hist_quantile"), weighted)
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }

  test("flag on: reverse (DESC) percentile maps to 1-q, not the ascending q") {
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val q = """SELECT percentile_cont(0.25) WITHIN GROUP
                   (ORDER BY l_extendedprice DESC) AS p FROM lineitem"""
      val plan = planOf(q)
      assert(plan.contains("log_hist_quantile"), plan)
      val est = sql(q).head().getDouble(0)
      // DESC p25 == ASC p75; it must NOT land near the ASC p25
      val exact75 = Tables.lineitem(spark, sf)
        .select(expr("percentile(l_extendedprice, 0.75)")).head().getDouble(0)
      val exact25 = Tables.lineitem(spark, sf)
        .select(expr("percentile(l_extendedprice, 0.25)")).head().getDouble(0)
      assert(math.abs(est - exact75) / exact75 < 0.05, s"est=$est exact75=$exact75")
      assert(math.abs(est - exact25) / exact25 > 0.05, s"est=$est exact25=$exact25")
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }

  test("grouped sketch aggregate equals the relational QuantileSketch path") {
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      val rows = sql("""SELECT l_returnflag AS k,
                          percentile(l_quantity, 0.5) AS p50
                        FROM lineitem GROUP BY 1""")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val relational = graft.operators.QuantileSketch.profile(
        Tables.lineitem(spark, sf)
          .select(col("l_returnflag").as("k"),
            col("l_quantity").cast("double").as("v")),
        "k", "v", Seq("p50" -> 0.5))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
      assert(rows === relational)
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }

  test("null and empty groups evaluate to null like exact percentile") {
    import spark.implicits._
    spark.conf.set("spark.graft.approxPercentile", "true")
    try {
      Seq((1L, Option.empty[Double]), (1L, None), (2L, Some(3.0)))
        .toDF("k", "v").createOrReplaceTempView("sparse_vals")
      val rows = spark.sql(
        "SELECT k, percentile(v, 0.5) AS p FROM sparse_vals GROUP BY 1")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      assert(rows(1L) === null)
      assert(rows(2L) !== null)
    } finally spark.conf.set("spark.graft.approxPercentile", "false")
  }
}
