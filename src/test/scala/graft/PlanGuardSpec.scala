package graft

/** Global scale guard over EVERY registered query: no plan may contain
  * a cartesian product or a broadcast nested-loop join. Either shape
  * is quadratic in at least one input — locally invisible at sf0.001,
  * fatal at 100 TB (the round-1 embedding-dedup all-pairs plan was
  * exactly this class of regression). Guarding the whole registry
  * catches the NEXT such plan before a bench ever runs it.
  */
class PlanGuardSpec extends SparkSpec {

  /** knn_bruteforce is the one DELIBERATE nested-loop: the broadcast
    * side is the bounded query set (q rows, q ≪ n), so the plan is
    * O(n·q) with one corpus scan — the documented exact baseline the
    * ANN paths are measured against, not an accidental cross join.
    * q_recall_at_k composes that same brute-force side as its ground
    * truth, and q_knn_classify as its voter; NewOpsPlanSpec pins each
    * to EXACTLY one nested loop so the exemption cannot hide a second
    * accidental one.
    */
  private val intendedNestedLoop =
    Set("knn_bruteforce", "q_recall_at_k", "q_knn_classify")

  test("no registered query plans a cartesian product or nested-loop join") {
    val offenders = (SparkEntry.queries ++ SparkEntry.benchQueries).toSeq.sortBy(_._1)
      .filterNot { case (name, _) => intendedNestedLoop(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(",")}") else None
      }
    assert(offenders.isEmpty, s"quadratic join shapes in: ${offenders.mkString("; ")}")
  }
}
