package graft

import org.apache.spark.sql.functions._

/** The opt-in count(DISTINCT) → deterministic-HLL optimizer rewrite
  * ([[graft.plans.ApproxDistinctRewrite]]): identity when off, fires
  * on single-column distincts when on, leaves multi-column distincts
  * intact, and answers stay inside the m=512 error envelope.
  */
class ApproxDistinctSpec extends SparkSpec {

  private def sql(q: String) = {
    Graft.registerAll(spark, sf)
    spark.sql(q)
  }

  private def planOf(q: String): String =
    sql(q).queryExecution.executedPlan.toString

  test("flag off (default): plan untouched, answer exact") {
    spark.conf.set("spark.graft.approxDistinct", "false")
    val df = sql("SELECT count(DISTINCT user_id) AS n FROM events")
    assert(!df.queryExecution.executedPlan.toString.contains("hll_agg"))
    val exact = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(df.head().getLong(0) === exact)
  }

  test("conf typos parse tolerantly: '1'/'yes'/garbage mean off, never a planning failure") {
    for (v <- Seq("1", "yes", "TRUE ", "garbage")) {
      spark.conf.set("spark.graft.approxDistinct", v)
      try {
        val df = sql("SELECT count(DISTINCT user_id) AS n FROM events")
        val rewritten = df.queryExecution.executedPlan.toString.contains("hll_agg")
        // only a case/whitespace variant of "true" turns the rule on
        assert(rewritten === v.trim.equalsIgnoreCase("true"), s"conf value '$v'")
        assert(df.head().getLong(0) > 0L)
      } finally spark.conf.set("spark.graft.approxDistinct", "false")
    }
  }

  test("flag on: single-column distinct re-plans onto hll_agg, no Expand, answer in the error envelope") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val q = "SELECT count(DISTINCT l_partkey) AS n FROM lineitem"
      val plan = planOf(q)
      assert(plan.contains("hll_agg"))
      assert(!plan.contains("Expand"))
      val est = sql(q).head().getLong(0)
      val exact = Tables.lineitem(spark, sf).select(col("l_partkey")).distinct().count()
      // m=512 → 1.04/sqrt(512) ~ 4.6% sigma; allow 4 sigma
      assert(math.abs(est - exact).toDouble / exact < 0.20)
      // deterministic: identical answer on re-run
      assert(sql(q).head().getLong(0) === est)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }

  test("flag on: multi-column distinct and plain counts are left intact") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val multi = planOf(
        "SELECT count(DISTINCT l_partkey, l_suppkey) AS n FROM lineitem")
      assert(!multi.contains("hll_agg"))
      val plain = sql("SELECT count(l_partkey) AS n FROM lineitem")
      assert(!plain.queryExecution.executedPlan.toString.contains("hll_agg"))
      assert(plain.head().getLong(0) ===
        Tables.lineitem(spark, sf).where(col("l_partkey").isNotNull).count())
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }

  test("grouped rewrite: per-group estimates carry one 512B buffer through a single shuffle") {
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val q = """SELECT l_returnflag, count(DISTINCT l_partkey) AS n
                 FROM lineitem GROUP BY 1"""
      val plan = planOf(q)
      assert(plan.contains("hll_agg"))
      val rows = sql(q).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.keySet === exact.keySet)
      rows.foreach { case (k, est) =>
        assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.20)
      }
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }
}
