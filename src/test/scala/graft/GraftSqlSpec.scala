package graft

class GraftSqlSpec extends SparkSpec {

  test("registerAll exposes tables and custom functions to spark.sql") {
    Graft.registerAll(spark, sf)
    val agg = spark.sql("""
      SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem GROUP BY 1 ORDER BY 1""").collect()
    assert(agg.nonEmpty)
    val knn = spark.sql("""
      SELECT a.vec_id,
             graft_dot(a.embedding, a.embedding) AS sq
      FROM embeddings a LIMIT 5""").collect()
    assert(knn.forall(_.getDouble(1) > 0.0))
    val sessions = spark.sql("""
      SELECT user_id, count(*) AS n FROM events GROUP BY 1""").count()
    assert(sessions > 0)
  }

  test("the full graft function surface is callable from SQL") {
    Graft.registerAll(spark, sf)
    val row = spark.sql("""
      SELECT size(graft_word_shingles('a b c d', 3))           AS n_shingles,
             size(graft_minhash(array(1L, 2L, 3L), 16))        AS n_sig,
             size(graft_simhash('hello world hello'))          AS n_bands,
             graft_mean_word_len('ab cd efg')                  AS mwl,
             graft_winnow_count('abcdefghij', 5, 4)            AS wc
    """).head()
    assert(row.getInt(0) == 2)    // "a b c", "b c d"
    assert(row.getInt(1) == 16)
    assert(row.getInt(2) == 4)
    assert(math.abs(row.getDouble(3) - 7.0 / 3) < 1e-12)
    assert(row.getInt(4) > 0)
  }

  test("GraftExtensions injects the same functions via spark.sql.extensions") {
    // applying the extensions hook must register cleanly; the builder
    // list is shared with registerAll, so SQL behavior is identical
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    assert(graft.functions.GraftFunctions.builders.map(_._1).distinct.size ==
      graft.functions.GraftFunctions.builders.size)
    // the deployment hook carries the whole engine layer: both AQP
    // optimizer rules and the native as-of planner strategy
    import org.apache.spark.sql.graft.ColumnBridge
    val rules = ColumnBridge.optimizerRules(ext, spark)
    assert(rules.contains(graft.plans.ApproxDistinctRewrite))
    assert(rules.contains(graft.plans.ApproxPercentileRewrite))
    assert(ColumnBridge.plannerStrategies(ext, spark)
      .contains(graft.plans.AsofJoinStrategy))
  }

  test("sketch aggregates are callable directly from SQL") {
    Graft.registerAll(spark, sf)
    // the explicit aggregate equals the relational sketch path
    val viaSql = spark.sql("""SELECT l_returnflag AS k,
        graft_quantile_sketch(l_quantity, 0.5) AS p50
      FROM lineitem GROUP BY 1""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaProfile = graft.operators.QuantileSketch.profile(
      Tables.lineitem(spark, sf)
        .select(org.apache.spark.sql.functions.col("l_returnflag").as("k"),
          org.apache.spark.sql.functions.col("l_quantity").cast("double").as("v")),
      "k", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    assert(viaSql === viaProfile)
    // the explicit HLL lands within the m=512 envelope of exact
    val est = spark.sql(
      "SELECT graft_approx_distinct(l_partkey) AS n FROM lineitem")
      .head().getDouble(0)
    val exact = spark.sql(
      "SELECT count(DISTINCT l_partkey) FROM lineitem").head().getLong(0)
    assert(math.abs(est - exact) / exact < 0.20)
  }

  test("graft_quantile_sketch rejects a non-foldable quantile cleanly") {
    Graft.registerAll(spark, sf)
    // a column reference as the quantile must raise the analyzer's
    // non-foldable-argument error, not an opaque NPE from eval(null)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""SELECT graft_quantile_sketch(l_quantity, l_tax)
        FROM lineitem""").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"), err.getMessage)
  }

  test("graft_quantile_sketch rejects a NULL quantile literal, never defaults it") {
    Graft.registerAll(spark, sf)
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${msgs(t.getCause)}"
    val err = intercept[Exception] {
      spark.sql("""SELECT graft_quantile_sketch(l_quantity,
        CAST(NULL AS DOUBLE)) FROM lineitem""").collect()
    }
    assert(msgs(err).contains("non-null literal"), msgs(err))
  }
}
