package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Exchange-count guards for the whole extract family. The single-
  * Exchange property is the extract design's load-bearing claim at
  * 100 TB — every calculator tier lands in the same shuffle — so each
  * member pins its shuffle budget here, the same way `TsSpec` pins
  * `ts_features_multi`'s.
  *
  * The relevance batteries finish on a driver-assembled ≤84-row frame
  * (their final plan shows zero Exchanges), so their guard instruments
  * the INTERNAL jobs instead: a [[QueryExecutionListener]] captures
  * every action the battery triggers and the spec pins both the worst
  * single job and the whole run. A regression that adds a shuffle —
  * re-aggregating per feature, losing the broadcast, recomputing the
  * unchecked-pointed feature matrix — pushes a count over its pinned
  * budget and fails here before a bench ever runs it.
  */
class ExtractPlanSpec extends SparkSpec {

  private def hashExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  test("extract and windowed extract plan exactly one shuffle") {
    for (q <- Seq("ts_features_extract", "ts_features_windowed")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(hashExchanges(plan) == 1,
        s"$q must cost exactly one shuffle, got:\n$plan")
    }
  }

  test("relevance batteries stay inside their pinned shuffle budgets") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        captured.add((funcName, hashExchanges(qe.executedPlan.toString)))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // (query, max Exchanges in any single job, max across the run).
      // Measured at HEAD; a unit of slack would mask exactly the
      // one-extra-shuffle regression this spec exists to catch.
      val budgets = Seq(
        // feature localCheckpoint (2: window enrich + agg) + one
        // join+unpivot+groupBy correlation pass (4: label agg, SMJ
        // both sides, per-feature agg)
        ("ts_features_relevant", 4, 6),
        // per-user head (2) + grouped checkpoint (4) + MW ranks over
        // the checkpoint (2) + Fisher cells off the same checkpoint (0)
        ("ts_features_relevant_cls", 4, 8),
        // one GroupedApply pass: label join + unpivot + repartition(__f)
        ("ts_features_relevant_tau", 4, 4),
        // unpivot + groupBy(__f,__x) + rank window + per-feature agg,
        // all one uncheckpointed job
        ("ts_features_relevant_multi", 6, 6))
      for ((q, maxJob, maxTotal) <- budgets) {
        captured.clear()
        SparkEntry.queries(q)(spark, sf).count()
        // listener delivery is async; the trailing count() event is the
        // run's sentinel — wait for it (10 s ceiling)
        val deadline = System.nanoTime() + 10_000_000_000L
        import scala.jdk.CollectionConverters._
        while (!captured.asScala.exists(_._1 == "count") &&
               System.nanoTime() < deadline) Thread.sleep(100)
        val jobs = captured.asScala.toList
        assert(jobs.exists(_._1 == "count"), s"$q: listener never delivered")
        val worst = jobs.map(_._2).max
        val total = jobs.map(_._2).sum
        assert(worst <= maxJob && total <= maxTotal,
          s"$q shuffle budget exceeded: worst job $worst (max $maxJob), " +
            s"run total $total (max $maxTotal) — jobs: " +
            jobs.map { case (f, c) => s"$f=$c" }.mkString(", "))
      }
    } finally spark.listenerManager.unregister(listener)
  }
}
