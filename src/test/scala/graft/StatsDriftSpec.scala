package graft

import org.apache.spark.sql.functions._
import graft.queries.StatsQueries

/** Naive replays + structural checks for the round-9 drift/test
  * battery additions (Mann–Whitney, runs, Ljung–Box, CUSUM, Levene,
  * calibration, Theil–Sen, partial corr, STL). The shared tails take
  * plain DataFrames, so the replays feed hand-computable fixtures and
  * compare against the textbook recursion/formula computed
  * independently here.
  */
class StatsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("mwFromRoll matches the hand-ranked U on a tied fixture") {
    // A = {1.00, 2.00, 2.00, 3.00}, B = {2.00, 4.00}
    // midranks: 100→1, 200→3, 300→5, 400→6 ⇒ R_A = 12, U_A = 12 − 10 = 2
    val roll = Seq((100L, 1L, 0L), (200L, 2L, 1L), (300L, 1L, 0L), (400L, 0L, 1L))
      .toDF("v", "na", "nb")
    val r = StatsQueries.mwFromRoll(roll).head()
    assert(r.getAs[Long]("n_a") === 4L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Double]("u_a") === 2.0)
    assert(r.getAs[Double]("p") > 0 && r.getAs[Double]("p") <= 1)
  }

  test("cusumFromDays equals the naive max(0, prev + e) recursion") {
    val days = Seq((0L, 10L), (1L, 10L), (2L, 30L), (3L, 10L)).toDF("d", "v")
    val r = StatsQueries.cusumFromDays(days).head()
    // nD=4, S=60, e=4v−60 = [−20,−20,60,−20]
    // C⁺ = [0,0,60,40] max 60@d2; C⁻ = [20,40,0,20] max 40@d1
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Double]("mean_daily") === 0.15)
    assert(r.getAs[Double]("cusum_pos") === 0.15) // 60/4/100
    assert(r.getAs[Long]("day_pos") === 2L)
    assert(r.getAs[Double]("cusum_neg") === 0.1) // 40/4/100
    assert(r.getAs[Long]("day_neg") === 1L)
  }

  test("theilSenFromDays equals the naive median of pairwise slopes") {
    val days = Seq((0L, 0L), (1L, 100L), (2L, 400L)).toDF("d", "v")
    val r = StatsQueries.theilSenFromDays(days).head()
    // slopes (cents/day): 100, 200, 300 → lower median 200 → $2.00/day
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Double]("slope_per_day") === 2.0)
  }

  test("q_runs_test counts are internally consistent on sf0.001") {
    val r = StatsQueries.qRunsTest.run(spark, sf).head()
    val (nd, n1, n2, runs) = (r.getAs[Long]("n_days"), r.getAs[Long]("n_above"),
      r.getAs[Long]("n_below"), r.getAs[Long]("runs"))
    assert(n1 + n2 <= nd) // at-median days discarded
    assert(runs >= 1 && runs <= n1 + n2)
    val p = r.getAs[Double]("p")
    assert(p >= 0 && p <= 1)
  }

  test("q_ljung_box yields a finite non-negative Q and a proper p") {
    val r = StatsQueries.qLjungBox.run(spark, sf).head()
    assert(r.getAs[Long]("n_hours") > 0)
    assert(r.getAs[Double]("q_lb") >= 0)
    val p = r.getAs[Double]("p_wh")
    assert(p >= 0 && p <= 1)
  }

  test("q_levene reports one group per event type and a non-negative F") {
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    val r = StatsQueries.qLevene.run(spark, sf).head()
    assert(r.getAs[Long]("k") === types)
    assert(r.getAs[Double]("f_bf") >= 0)
    assert(r.getAs[Double]("ssb") >= -1e-6 && r.getAs[Double]("ssw") >= 0)
  }

  test("q_calibration bins partition the users with proper rates") {
    val rows = StatsQueries.qCalibration.run(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === users)
    rows.foreach { r =>
      assert(r.getAs[Double]("conf") >= 0 && r.getAs[Double]("conf") <= 1)
      assert(r.getAs[Double]("acc") >= 0 && r.getAs[Double]("acc") <= 1)
      assert(r.getAs[Double]("ece") >= 0 && r.getAs[Double]("ece") <= 1)
    }
  }

  test("q_partial_corr stays in [-1, 1] and matches the raw-r identity") {
    val r = StatsQueries.qPartialCorr.run(spark, sf).head()
    val (rab, rac, rbc, part) = (r.getAs[Double]("r_ab"), r.getAs[Double]("r_ac"),
      r.getAs[Double]("r_bc"), r.getAs[Double]("r_ab_given_c"))
    Seq(rab, rac, rbc, part).foreach(x => assert(x >= -1.0 && x <= 1.0))
    val expect = (rab - rac * rbc) /
      math.sqrt((1.0 - rac * rac) * (1.0 - rbc * rbc))
    assert(math.abs(part - expect) < 2e-6) // both sides 6-dp rounded
  }

  test("q_stl_decompose emits 7 dow rows with a strength in [0, 1]") {
    val rows = StatsQueries.qStlDecompose.run(spark, sf).collect()
    assert(rows.length === 7)
    assert(rows.map(_.getAs[Long]("dow")).sorted.toSeq === (0L to 6L))
    rows.foreach { r =>
      val st = r.getAs[Double]("seasonal_strength")
      assert(st >= -1e-6 && st <= 1.0 + 1e-6)
      assert(r.getAs[Double]("ssw") <= r.getAs[Double]("sst") + 1e-6)
    }
  }

  test("stream twins equal their batch rows (MW, CUSUM, Theil-Sen)") {
    val pairs = Seq(
      (StatsQueries.qMannWhitney, graft.queries.StreamingQueries.streamMannWhitney),
      (StatsQueries.qCusumDrift, graft.queries.StreamingQueries.streamCusum),
      (StatsQueries.qTheilSen, graft.queries.StreamingQueries.streamTheilSen))
    pairs.foreach { case (b, t) =>
      val bt = b.run(spark, sf).collect().toSeq
      val st = t.run(spark, sf).collect().toSeq
      assert(bt === st, s"${b.name} vs ${t.name}")
    }
  }
}
