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
}
