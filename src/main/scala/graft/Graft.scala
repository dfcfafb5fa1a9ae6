package graft

import org.apache.spark.sql.SparkSession

/** SQL-level entry point: register the testdata tables as temp views
  * and graft's custom functions, so every capability is reachable from
  * `spark.sql(...)` as well as the DataFrame API.
  */
object Graft {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Create temp views for all tables under `dir` and register
    * graft_dot / graft_minhash for SQL use.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    TableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t        => Tables.t(spark, dir, t).createOrReplaceTempView(t)
    }
    graft.functions.GraftFunctions.register(spark)
    // opt-in AQP rewrites (spark.graft.approxDistinct /
    // spark.graft.approxPercentile = true) — idempotent
    Seq(graft.plans.ApproxDistinctRewrite, graft.plans.ApproxPercentileRewrite)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule)) {
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
        }
      }
  }
}
