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

  /** The §14 bounded-grain contract, made STRUCTURAL (r9 verdict #6):
    * an unpartitioned Window sorts its entire input on one task, so it
    * is only admissible over a grain-bounded rollup (distinct value /
    * calendar day / segment grains — O(value domain) rows, not O(rows)).
    * Every query allowed to plan one is enumerated here WITH its grain;
    * anything else — the next q_gini-class slip — fails CI instead of
    * warning in a log. Structurally, each allowed site must also show
    * an Aggregate beneath the window (the rollup that bounds it).
    */
  private val boundedGrainWindows: Set[String] = Set(
    "q_gains_curve",      // score-grain prefix + decile-grain cumsum
    "stream_gains_curve", // same shared gains tail over drained snapshots
    "q_lorenz",           // revenue-cents value grain + decile grain
    "q_parity_report",    // segment grain (7 cohorts)
    "q_rrf_fusion",       // ranks over top-k LIMIT outputs (≤100/≤200 rows)
    "q_hosmer_lemeshow",  // score-cents value-grain prefix (§13 two-level rank)
    "q_sprt",             // calendar-day grain (cumulative LLR over days)
    "stream_sprt")        // same day grain over the drained snapshot

  test("unpartitioned windows only over enumerated bounded-grain rollups") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    val findings = (SparkEntry.queries ++ SparkEntry.benchQueries).toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val unpart = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (unpart.isEmpty) None
        else {
          // the bound must be structural: a rollup (Aggregate) or a
          // top-k (GlobalLimit) beneath the window, so the window's
          // input is O(grain)/O(k), never the row stream
          val allRollup = unpart.forall(w =>
            w.child.collectFirst {
              case a: Aggregate => a
              case l: GlobalLimit => l
            }.nonEmpty)
          Some((name, unpart.size, allRollup))
        }
      }
    val unlisted = findings.filterNot { case (n, _, _) => boundedGrainWindows(n) }
    assert(unlisted.isEmpty,
      s"unpartitioned windows outside the bounded-grain whitelist: " +
        unlisted.map { case (n, k, r) => s"$n(x$k,rollup=$r)" }.mkString("; "))
    val unbounded = findings.filter { case (n, _, ok) => boundedGrainWindows(n) && !ok }
    assert(unbounded.isEmpty,
      s"whitelisted queries whose unpartitioned window has NO rollup child: " +
        unbounded.map(_._1).mkString("; "))
  }

  test("the window guard detects a planted global row-grain window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val planted = Tables.events(spark, sf)
      .withColumn("rk", row_number().over(Window.orderBy(col("ts"))))
    val unpart = planted.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(unpart.nonEmpty, "detector failed to see the planted window")
    assert(unpart.exists(w => w.child.collectFirst {
      case a: Aggregate => a
      case l: GlobalLimit => l
    }.isEmpty), "planted row-grain window wrongly classified as bounded")
  }
}
