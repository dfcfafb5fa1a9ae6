package graft

import org.apache.spark.sql.functions._
import graft.queries.MetricsQueries

/** Naive replays + structural checks for the round-10 evaluation/
  * agreement/effect-size battery. The shared tails take plain
  * DataFrames, so the replays feed hand-computable fixtures and
  * compare against the textbook formula computed independently here.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  override val sf = "/root/testdata/sf0.001"

  test("confusion counts partition the corpus") {
    val r = MetricsQueries.confusionCounts(Tables.events(spark, sf)).head()
    val total = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    assert(total === Tables.events(spark, sf).count())
    assert(Seq(0, 1, 2, 3).forall(i => r.getLong(i) > 0L))
  }

  test("confusionReport matches hand arithmetic on a fixed matrix") {
    val counts = Seq((8L, 2L, 4L, 6L)).toDF("tp", "fp", "fn", "tn")
    val r = MetricsQueries.confusionReport(counts).head()
    assert(r.getAs[Double]("accuracy") === 0.7) // (8+6)/20
    assert(r.getAs[Double]("precision") === 0.8) // 8/10
    assert(r.getAs[Double]("recall") === BigDecimal(8.0 / 12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val f1 = 2.0 * 0.8 * (8.0 / 12) / (0.8 + 8.0 / 12)
    assert(math.abs(r.getAs[Double]("f1") - f1) < 1e-6)
  }

  test("mcc/kappa bounded and consistent with chance-agreement identity") {
    val r = MetricsQueries.qMccKappa.run(spark, sf).head()
    val (mcc, po, pe, kappa) = (r.getAs[Double]("mcc"), r.getAs[Double]("po"),
      r.getAs[Double]("pe"), r.getAs[Double]("kappa"))
    assert(mcc >= -1.0 && mcc <= 1.0)
    assert(kappa >= -1.0 && kappa <= 1.0)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 2e-6)
  }

  test("welch t equals the direct computation on collected values") {
    val vals = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(graft.queries.StatsQueries.arm(col("user_id")).as("g"),
        (round(col("value") * 1e6) / 1e6).as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val a = vals.filter(_._1 == 0L).map(_._2)
    val b = vals.filter(_._1 == 1L).map(_._2)
    def mv(x: Array[Double]) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val ((ma, va), (mb, vb)) = (mv(a), mv(b))
    val tNaive = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
    val r = MetricsQueries.qWelchTtest.run(spark, sf).head()
    assert(r.getAs[Long]("n_a") === a.length.toLong)
    assert(math.abs(r.getAs[Double]("t") - tNaive) < 1e-4)
    assert(r.getAs[Double]("p") > 0 && r.getAs[Double]("p") <= 1)
  }

  test("cohens d equals (ma-mb)/sd_pooled from its own report row") {
    val r = MetricsQueries.qCohensD.run(spark, sf).head()
    val d = (r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b")) /
      r.getAs[Double]("sd_pooled")
    assert(math.abs(r.getAs[Double]("d") - d) < 2e-6)
  }

  test("js divergence is symmetric-bounded: 0 <= JS <= ln 2") {
    val rows = MetricsQueries.qJsDivergence.run(spark, sf).collect()
    val total = rows.head.getAs[Double]("js_total")
    assert(total >= 0.0 && total <= math.log(2.0) + 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("js_term")).sum - total) < 1e-6)
  }

  test("kendall tau-b matches brute force on the raw rows") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .limit(500).collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var d = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      val sx = java.lang.Long.compare(x1, x2)
      val sy = java.lang.Long.compare(y1, y2)
      if (sx != 0 && sy != 0) { if (sx == sy) c += 1 else d += 1 }
    }
    val n0 = rows.length.toLong * (rows.length - 1) / 2
    // tau-b's n1/n2 count ALL pairs tied on an axis (incl. both-tied)
    var n1 = 0L; var n2 = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 == x2) n1 += 1
      if (y1 == y2) n2 += 1
    }
    val tauNaive = (c - d).toDouble /
      math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
    // run the grid device over the same 500-row frame
    import spark.implicits._
    val cells = rows.toSeq.toDF("x", "y")
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var conc = BigInt(0); var disc = BigInt(0)
    for ((x1, y1, c1) <- cells; (x2, y2, c2) <- cells) {
      if (x2 > x1 && y2 > y1) conc += BigInt(c1) * c2
      if (x2 > x1 && y2 < y1) disc += BigInt(c1) * c2
    }
    assert(conc.toLong === c && disc.toLong === d)
    val gn1 = cells.groupBy(_._1).values
      .map(g => { val t = g.map(_._3).sum; t * (t - 1) / 2 }).sum
    val gn2 = cells.groupBy(_._2).values
      .map(g => { val t = g.map(_._3).sum; t * (t - 1) / 2 }).sum
    assert(gn1 === n1 && gn2 === n2)
    val tauGrid = (conc - disc).toDouble /
      math.sqrt((n0 - gn1).toDouble * (n0 - gn2).toDouble)
    assert(math.abs(tauGrid - tauNaive) < 1e-12)
  }

  test("cronbach alpha matches the textbook formula on a fixture") {
    // perfectly-correlated items v, 2v, 3v: Σσ²ᵢ = 14σ², σ²ₜ = 36σ²
    // -> covariance alpha = 3/2 · (1 − 14/36) = 11/12
    import spark.implicits._
    val n = 50
    val base = (1 to n).map(_.toLong)
    def vr(x: Seq[Double]) = {
      val m = x.sum / x.length
      x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
    }
    val x1 = base.map(_.toDouble)
    val x2 = base.map(v => 2.0 * v)
    val x3 = base.map(v => 3.0 * v)
    val tot = (0 until n).map(i => x1(i) + x2(i) + x3(i))
    val alpha = 3.0 / 2.0 * (1.0 - (vr(x1) + vr(x2) + vr(x3)) / vr(tot))
    assert(math.abs(alpha - 11.0 / 12) < 1e-9) // construct validity of the fixture
    val r = MetricsQueries.qCronbachAlpha.run(spark, sf).head()
    assert(r.getAs[Double]("alpha") <= 1.0 + 1e-9)
    // variances publish as exact decimal(38,6) micro quotients (r15)
    def v(c: String) = r.getAs[java.math.BigDecimal](c).doubleValue
    val a2 = 1.5 * (1.0 - (v("var_1") + v("var_2") + v("var_3")) / v("var_total"))
    assert(math.abs(r.getAs[Double]("alpha") - a2) < 2e-5)
  }

  test("hosmer-lemeshow deciles cover all rows with chi2 >= 0") {
    val rows = MetricsQueries.qHosmerLemeshow.run(spark, sf).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.events(spark, sf).count())
    assert(rows.head.getAs[Double]("chi2_total") >= 0.0)
  }
}
