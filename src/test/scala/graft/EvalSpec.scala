package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

/** Closed-form pins for the eval/drift statistics (SURVEY §2 rows
  * q_auc / q_psi / stream_psi): tie-corrected AUC on hand-checkable
  * score-label sets, PSI smoothing and null-drift behavior.
  */
class EvalSpec extends SparkSpec {

  private def scored(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("s", "y")
  }

  test("perfectly separating score has AUC 1, reversed score AUC 0") {
    val df = scored(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
    assert(Eval.auc(df, "s", "y") === ((2L, 2L, 1.0)))
    val rev = scored(Seq((4L, 0L), (3L, 0L), (2L, 1L), (1L, 1L)))
    assert(Eval.auc(rev, "s", "y") === ((2L, 2L, 0.0)))
  }

  test("an uninformative constant score lands exactly on AUC 0.5 via tie correction") {
    val df = scored(Seq((7L, 0L), (7L, 1L), (7L, 0L), (7L, 1L)))
    assert(Eval.auc(df, "s", "y")._3 === 0.5)
  }

  test("half-overlapping ties reproduce the textbook rank-sum value") {
    // scores: neg {1, 2}, pos {2, 3}; ranks (avg on the 2-tie): 1, 2.5, 2.5, 4
    // U = sum_pos_ranks(2.5 + 4) - 2*3/2 = 3.5; AUC = 3.5/4
    val df = scored(Seq((1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)))
    assert(Eval.auc(df, "s", "y")._3 === 0.875)
  }

  test("AUC is partitioning-independent") {
    val rows = (1L to 400L).map(i => (i % 37, if (i % 3 == 0) 1L else 0L))
    val a = Eval.auc(scored(rows).repartition(1), "s", "y")
    val b = Eval.auc(scored(rows).repartition(13), "s", "y")
    assert(a === b)
  }

  test("identical distributions yield (near-)zero PSI terms and total") {
    val (terms, total) = Eval.psiTerms(Seq((0L, 100L, 100L), (1L, 50L, 50L), (2L, 10L, 10L)))
    assert(terms.forall(_._4 === 0L))
    assert(total === 0L)
  }

  test("a planted mass shift yields a positive total and per-bin signs follow the shift") {
    val (terms, total) = Eval.psiTerms(Seq((0L, 900L, 100L), (1L, 100L, 900L)))
    assert(total > 0L)
    // both a depleted and an inflated bin contribute POSITIVE terms
    // ((pB-pA) and ln(pB/pA) always share a sign)
    assert(terms.forall(_._4 > 0L))
  }

  test("Laplace smoothing keeps an empty bin finite") {
    val (terms, total) = Eval.psiTerms(Seq((0L, 1000L, 0L), (1L, 0L, 1000L)))
    assert(terms.forall(t => t._4 > 0L && t._4 < 20000000L))
    assert(total === terms.map(_._4).sum)
  }

  test("a perfectly associated 2x2 table has Cramér's V = 1 and chi2 = n") {
    val cells = Seq(("a", 0L, 50L), ("b", 1L, 50L))
    val (n, r, c, dof, chi2, v, _) = Eval.cramersV(cells)
    assert((n, r, c, dof) === ((100L, 2L, 2L, 1L)))
    assert(chi2 === 100.0)
    assert(v === 1.0)
  }

  test("an independent table has chi2 = 0, V = 0, and WH p near 1") {
    val cells = Seq(("a", 0L, 30L), ("a", 1L, 30L), ("b", 0L, 30L), ("b", 1L, 30L))
    val (_, _, _, _, chi2, v, p) = Eval.cramersV(cells)
    assert(chi2 === 0.0 && v === 0.0)
    assert(p > 0.9)
  }

  test("hand-computed 2x2 chi-squared replays through the micro-quantized terms") {
    // cells [[10, 20], [20, 10]]: E = 15 everywhere, chi2 = 4*25/15 = 20/3
    val cells = Seq(("a", 0L, 10L), ("a", 1L, 20L), ("b", 0L, 20L), ("b", 1L, 10L))
    val (_, _, _, _, chi2, _, p) = Eval.cramersV(cells)
    assert(math.abs(chi2 - 20.0 / 3.0) < 1e-5)
    assert(p > 0.005 && p < 0.02) // exact chi2_1 p = 0.0098
  }

  test("perfect association has MI = H_row = H_col (NMI = 1); independence has MI = 0") {
    val perfect = Seq(("a", 0L, 50L), ("b", 1L, 50L))
    val (_, mi, hr, hc) = Eval.mutualInfo(perfect)
    assert(mi === hr && mi === hc)
    // H = ln 2 for the uniform 2-way split
    assert(math.abs(mi / 1e6 - math.log(2.0)) < 2e-6)
    val indep = Seq(("a", 0L, 30L), ("a", 1L, 30L), ("b", 0L, 30L), ("b", 1L, 30L))
    assert(Eval.mutualInfo(indep)._2 === 0L)
  }

  test("MI is bounded by min(H_row, H_col) on a skewed table") {
    val cells = Seq(("a", 0L, 70L), ("a", 1L, 10L), ("b", 0L, 5L), ("b", 1L, 15L))
    val (_, mi, hr, hc) = Eval.mutualInfo(cells)
    assert(mi > 0L && mi <= math.min(hr, hc))
  }

  test("ols2 recovers an exact linear relation with R² = 1") {
    // y = 2 + 3*x1 - 5*x2 over a small exact grid
    val pts = for (x1 <- 0 to 4; x2 <- 0 to 3)
      yield (x1.toDouble, x2.toDouble, 2.0 + 3.0 * x1 - 5.0 * x2)
    val n = pts.size.toDouble
    def s(f: ((Double, Double, Double)) => Double) = pts.map(f).sum
    val (b0, b1, b2, r2) = Eval.ols2(n,
      s(_._1), s(_._2), s(_._3),
      s(p => p._1 * p._1), s(p => p._1 * p._2), s(p => p._2 * p._2),
      s(p => p._1 * p._3), s(p => p._2 * p._3), s(p => p._3 * p._3))
    assert(math.abs(b0 - 2.0) < 1e-9)
    assert(math.abs(b1 - 3.0) < 1e-9)
    assert(math.abs(b2 + 5.0) < 1e-9)
    assert(math.abs(r2 - 1.0) < 1e-12)
  }

  test("q_auc's corpus label construction is genuinely informative (0.5 < auc < 1)") {
    val y = (graft.operators.Sampling.hashBucket(col("event_id")) % 1000 <
      col("value") * 2).cast("long")
    val df = Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("cents"), y.as("y"))
    val (_, _, auc) = Eval.auc(df, "cents", "y")
    assert(auc > 0.55 && auc < 0.99)
  }
}
