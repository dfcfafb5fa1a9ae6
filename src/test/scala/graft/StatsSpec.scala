package graft

import org.apache.spark.sql.functions._
import graft.queries._

/** Semantic + plan-shape coverage for the round-9 stats /
  * experimentation / ML-step battery. Each operator gets an
  * independent driver-side replay (naive recomputation from collected
  * inputs) or a structural invariant the implementation cannot fake.
  */
class StatsSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_ks_test D equals the naive ECDF max-gap replay") {
    val row = StatsQueries.qKsTest.run(spark, sf).head()
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("v"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 2).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = purchases.filter(_._2 == 0).map(_._1).sorted
    val b = purchases.filter(_._2 == 1).map(_._1).sorted
    val vs = (a ++ b).distinct.sorted
    val dNaive = vs.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.length -
        b.count(_ <= v).toDouble / b.length)
    }.max
    assert(row.getLong(0) === a.length)
    assert(row.getLong(1) === b.length)
    assert(math.abs(row.getDouble(2) - dNaive) < 1e-6)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("q_cuped theta and adjusted lift equal the naive covariance replay") {
    val row = StatsQueries.qCuped.run(spark, sf).head()
    val ev = Tables.events(spark, sf)
    val mm = ev.agg(min(expr("cast(ts as long)")), max(expr("cast(ts as long)"))).head()
    val mid = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    val users = ev.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" && expr("cast(ts as long)") < lit(mid),
          round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" && expr("cast(ts as long)") >= lit(mid),
          round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .select(col("x"), col("y"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 2).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = users.length
    val xb = users.map(_._1).sum.toDouble / n
    val yb = users.map(_._2).sum.toDouble / n
    val cov = users.map(u => (u._1 - xb) * (u._2 - yb)).sum
    val varx = users.map(u => (u._1 - xb) * (u._1 - xb)).sum
    val thetaNaive = cov / varx
    assert(math.abs(row.getDouble(2) - thetaNaive) < 1e-4)
    // CUPED must not move the POINT estimate materially when arms are
    // hash-balanced, and the adjustment is exact when theta applies
    val a = users.filter(_._3 == 0); val b = users.filter(_._3 == 1)
    val liftRaw = b.map(_._2).sum.toDouble / b.length - a.map(_._2).sum.toDouble / a.length
    assert(math.abs(row.getDouble(3) - liftRaw) < 1e-4)
  }

  test("q_survival_km curve is a valid decreasing survival function that exhausts the cohort") {
    val rows = StatsQueries.qSurvivalKm.run(spark, sf)
      .orderBy(col("day")).collect()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === nUsers)
    assert(rows.head.getLong(1) === nUsers) // first day risks everyone
    val survs = rows.map(_.getDouble(4))
    assert(survs.zip(survs.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(survs.forall(s => s >= 0.0 && s <= 1.0))
    // n_risk telescopes by deaths+censored
    rows.sliding(2).foreach {
      case Array(p, q) =>
        assert(q.getLong(1) === p.getLong(1) - p.getLong(2) - p.getLong(3))
      case _ =>
    }
  }

  test("kmCurve hand case: 4 users, one censored, textbook KM factors") {
    import spark.implicits._
    val day = 86400000000000L
    // censoring = last event within 7 days of the corpus max (20d):
    // users 4 (l=15d) and 5 (l=20d, sets the max) are censored,
    // users 1-3 died long before the horizon
    val spans = Seq(
      (1L, 0L, 0L),                    // dies day 0
      (2L, 0L, 1L * day),              // dies day 1
      (3L, day, 2L * day),             // dies day 1 (lifetime 1)
      (4L, 0L, 15L * day),             // lifetime 15, censored
      (5L, 0L, 20L * day)              // lifetime 20, censored (max)
    ).toDF("user_id", "f", "l")
    val rows = StatsQueries.kmCurve(spans).orderBy(col("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // day 0: 5 at risk, 1 death -> surv 0.8
    // day 1: 4 at risk, 2 deaths -> surv 0.8 * 0.5 = 0.4
    // day 15: 2 at risk, censored -> surv stays 0.4
    // day 20: 1 at risk, censored -> surv stays 0.4
    assert(rows === Array(
      (0L, 5L, 1L, 0L, 0.8),
      (1L, 4L, 2L, 0L, 0.4),
      (15L, 2L, 0L, 1L, 0.4),
      (20L, 1L, 0L, 1L, 0.4)))
  }

  test("q_fk_violations audits every edge clean on the generated corpus") {
    val rows = StatsQueries.qFkViolations.run(spark, sf).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getLong(2) === 0L))
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("lineitem_orders") ===
      Tables.lineitem(spark, sf).count())
    assert(byName("events_customer") === Tables.events(spark, sf).count())
  }

  test("q_logreg_step weights equal the naive two-step replay") {
    val row = StatsQueries.qLogregStep.run(spark, sf).head()
    val users = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("x1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x2"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = users.length
    def rL(x: Double) = BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val feats = users.map { case (x1, x2) => (1L, x1, x2, if (x2 >= 14) 1L else 0L) }
    def w1m(idx: Int): Long = {
      val gt = feats.map(f => (1 - 2 * f._4) * Seq(f._1, f._2, f._3)(idx)).sum
      rL(-0.1 * (gt.toDouble / 2 / n) * 1e6)
    }
    val w1 = (0 to 2).map(w1m)
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val h = (0 to 2).map { j =>
      feats.map { f =>
        val z = (w1(0) * f._1 + w1(1) * f._2 + w1(2) * f._3).toDouble / 1e6
        rL((sig(z) - f._4) * Seq(f._1, f._2, f._3)(j) * 1e6)
      }.sum
    }
    val w2 = (0 to 2).map(j => rL((w1(j) / 1e6 - 0.1 * ((h(j) / 1e6) / n)) * 1e6))
    assert(row.getDouble(1) === r6(w2(0) / 1e6))
    assert(row.getDouble(2) === r6(w2(1) / 1e6))
    assert(row.getDouble(3) === r6(w2(2) / 1e6))
    // two fixed steps from w=0 guarantee replayability, not accuracy —
    // the acc column just has to be a valid rate
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
  }

  test("q_decision_stump finds the brute-force optimal threshold") {
    val row = StatsQueries.qDecisionStump.run(spark, sf).head()
    val pts = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .collect().map(r => (r.getLong(1), if (r.getLong(2) >= 14) 1L else 0L))
    val n = pts.length
    val cands = pts.map(_._1).distinct.sorted.dropRight(1)
    val best = cands.map { t =>
      val (l, r) = pts.partition(_._1 <= t)
      def gini(s: Array[(Long, Long)]): Double = {
        val c1 = s.count(_._2 == 1L).toDouble; val c0 = s.length - c1
        s.length - (c1 * c1 + c0 * c0) / s.length
      }
      (t, (gini(l) + gini(r)) / n)
    }.minBy { case (t, g) => (math.round(g * 1e9), t) }
    assert(row.getLong(0) === best._1)
    assert(math.abs(row.getDouble(3) - best._2) < 1e-6)
    assert(row.getLong(1) + row.getLong(2) === n)
  }

  test("q_naive_bayes confusion matrix covers exactly the held-out docs with trained labels") {
    val rows = StatsQueries.qNaiveBayes.run(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long"), lit(10)).as("b"))
    val nTest = docs.where(col("b") >= 8).count()
    val trainLangs = docs.where(col("b") < 8).select(col("lang"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getLong(2)).sum === nTest)
    assert(rows.map(_.getString(1)).toSet.subsetOf(trainLangs))
    // the synthetic corpus draws every lang from ONE shared vocabulary,
    // so chance-level accuracy is the expected outcome — the guarantee
    // is structural (replayable scores, exhaustive coverage) and the
    // oracle compare pins the exact arithmetic; determinism here:
    val again = StatsQueries.qNaiveBayes.run(spark, sf).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._2))
      === again.map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(t => (t._1, t._2)))
  }

  test("q_anova partitions total sum of squares (SSB + SSW = SST up to quantization)") {
    val row = StatsQueries.qAnova.run(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .select(round(col("value") * lit(1e6)).cast("long")).collect().map(_.getLong(0))
    val mean = vals.map(BigInt(_)).sum.toDouble / vals.length / 1e6
    val sst = vals.map(v => { val d = v / 1e6 - mean; d * d }).sum
    assert(math.abs(row.getDouble(2) + row.getDouble(3) - sst) / sst < 1e-3)
    assert(row.getDouble(4) > 0)
  }

  test("q_bootstrap_ci brackets the point estimate deterministically") {
    val q = StatsQueries.qBootstrapCi
    val a = q.run(spark, sf).head()
    val b = q.run(spark, sf).head()
    assert(a === b) // hash-derived weights: no RNG, stable across runs
    assert(a.getDouble(2) <= a.getDouble(1) && a.getDouble(1) <= a.getDouble(3))
  }

  test("q_als_step solves each user's ridge normal equations (naive replay)") {
    val rows = StatsQueries.qAlsStep.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val cells = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("(cast(ts as long) div 86400000000000 + 4) % 7").as("i"))
      .groupBy(col("user_id"), col("i")).agg(count(lit(1)).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    cells.map(_._1).distinct.take(5).foreach { uid =>
      val cs = cells.filter(_._1 == uid)
      val q = cs.map(c => Array(1.0, (c._2 + 1) / 8.0))
      val a11 = q.map(v => v(0) * v(0)).sum + 0.1
      val a12 = q.map(v => v(0) * v(1)).sum
      val a22 = q.map(v => v(1) * v(1)).sum + 0.1
      val b1 = cs.zip(q).map { case (c, v) => c._3 * v(0) }.sum
      val b2 = cs.zip(q).map { case (c, v) => c._3 * v(1) }.sum
      val det = a11 * a22 - a12 * a12
      val (p1, p2) = ((a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det)
      val got = rows(uid)
      assert(got._1 === cs.length)
      assert(math.abs(got._2 - p1) < 1e-4)
      assert(math.abs(got._3 - p2) < 1e-4)
    }
  }

  test("q_conformal_interval honors the finite-sample coverage target") {
    val row = StatsQueries.qConformalInterval.run(spark, sf).head()
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    assert(row.getDouble(2) > 0)
    // 90% nominal; allow finite-sample slack at sf0.001
    assert(row.getDouble(3) >= 0.8)
  }

  test("ts_sax emits one 8-char word with balanced quartile symbols per full series") {
    val rows = TsQueries.tsSax.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sax) = (r.getLong(1), r.getString(2))
      if (n >= 8) {
        assert(sax.length === 8)
        // ntile(4) over 8 segments: exactly two of each symbol
        assert("abcd".forall(c => sax.count(_ == c) == 2))
      } else assert(sax.nonEmpty && sax.forall("abcd".contains(_)))
    }
  }

  test("text_lix matches a direct recount on a sample document") {
    val rows = TextQueries.textLix.run(spark, sf).orderBy(col("doc_id")).limit(5)
      .collect()
    val texts = Tables.documents(spark, sf).orderBy(col("doc_id")).limit(5)
      .select(col("text")).collect().map(_.getString(0))
    rows.zip(texts).foreach { case (r, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      val nw = ws.length.toLong
      val ns = math.max(text.count(c => c == '.' || c == '!' || c == '?').toLong, 1L)
      val nl = ws.count(_.length >= 7).toLong
      assert(r.getLong(1) === nw)
      assert(r.getLong(2) === ns)
      assert(r.getLong(3) === nl)
      assert(r.getDouble(4) === r6(nw.toDouble / ns + 100.0 * nl / nw))
    }
  }

  test("stream_survival_km equals the batch KM curve") {
    val batch = StatsQueries.qSurvivalKm.run(spark, sf).orderBy(col("day"))
      .collect().toSeq
    val stream = StreamingQueries.streamSurvivalKm.run(spark, sf).orderBy(col("day"))
      .collect().toSeq
    assert(stream === batch)
  }

  test("stream_ab_lift equals the batch lift report") {
    val batch = RelationalQueries.qAbLift.run(spark, sf).collect().toSeq
    val stream = StreamingQueries.streamAbLift.run(spark, sf).collect().toSeq
    assert(stream === batch)
  }

  private def exchanges(q: Q): Int = {
    val plan = q.run(spark, sf).queryExecution.executedPlan.toString
    "Exchange (hash|range|Single)".r.findAllIn(plan).size
  }

  test("ts_sax rides one series Exchange (windows + both rollups share the user key)") {
    assert(exchanges(TsQueries.tsSax) === 1)
  }

  test("q_als_step stays within its 2-Exchange budget (cell rollup, then user rollup — both map-side combined)") {
    assert(exchanges(StatsQueries.qAlsStep) <= 2)
  }

  test("text_lix is a pure narrow projection (no Exchange)") {
    assert(exchanges(TextQueries.textLix) === 0)
  }

  test("q_trimmed_mean equals the naive sort-and-trim replay") {
    val row = StatsQueries.qTrimmedMean.run(spark, sf).head()
    val vs = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted
    val lo = vs.length / 10
    val kept = vs.slice(lo, vs.length - lo)
    assert(row.getLong(0) === vs.length.toLong)
    assert(row.getLong(1) === kept.length.toLong)
    assert(row.getDouble(2) ===
      r6(kept.map(BigInt(_)).sum.toDouble / kept.length / 100))
  }

  test("q_join_size_estimate reports the exact self-join cardinality per key") {
    val rows = StatsSpecHelpers.joinSize(spark, sf)
    val naive = Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
      val counts = Tables.lineitem(spark, sf).groupBy(col(k)).count()
        .collect().map(_.getLong(1))
      k -> (counts.length.toLong, counts.sum,
        counts.map(c => BigInt(c) * c).sum.toDouble, counts.max)
    }.toMap
    rows.foreach { r =>
      val (nk, nr, sj, mx) = naive(r.getString(0))
      assert(r.getLong(1) === nk)
      assert(r.getLong(2) === nr)
      assert(r.getDouble(3) === sj)
      assert(r.getLong(4) === mx)
    }
  }

  test("dedup_prf rates are consistent with their exact counts") {
    val r = DedupQueries.dedupPrf.run(spark, sf).head()
    val (np, nt, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(tp <= np && tp <= nt && tp > 0)
    assert(r.getDouble(3) === r6(tp.toDouble / np))
    assert(r.getDouble(4) === r6(tp.toDouble / nt))
  }

  test("q_auc_by_segment matches Eval.auc run on each segment slice") {
    val rows = StatsQueries.qAucBySegment.run(spark, sf).collect()
    val seg = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("score"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .select(col("user_id"), col("score"),
        when(col("np") >= 14, 1L).otherwise(0L).as("y"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("user_id") === col("c_custkey"))
    rows.foreach { r =>
      val slice = seg.where(col("segment") === r.getString(0))
      val (np, nn, auc) = operators.Eval.auc(slice, "score", "y")
      assert(r.getLong(1) === np)
      assert(r.getLong(2) === nn)
      if (np > 0 && nn > 0) assert(math.abs(r.getDouble(3) - auc) < 1e-6)
    }
  }

  test("q_markov_entropy sits inside [0, ln k] with a sane ratio") {
    val r = StatsQueries.qMarkovEntropy.run(spark, sf).head()
    val k = r.getLong(1)
    assert(r.getDouble(2) >= 0.0)
    assert(r.getDouble(2) <= math.log(k.toDouble) + 1e-9)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("text_kneser_ney probabilities discount below MLE and stay in (0, 1]") {
    val rows = TextQueries.textKneserNey.run(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (mle, kn) = (r.getDouble(3), r.getDouble(4))
      assert(mle > 0.0 && mle <= 1.0)
      assert(kn > 0.0 && kn <= 1.0 + 1e-9)
    }
  }

  test("q_logreg_train's loss curve descends monotonically (the loop actually trains)") {
    val rows = queries.StatsQueries.qLogregTrain.run(spark, sf)
      .orderBy("iter").collect()
    assert(rows.length === 4)
    val losses = rows.map(_.getDouble(6))
    losses.zip(losses.tail).foreach { case (prev, next) =>
      assert(next < prev, s"loss rose: ${losses.mkString(", ")}")
    }
    // weights move every iteration (no silent fixed point at this lr)
    val ws = rows.map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(ws.distinct.length === 4)
  }
}

/** q_join_size_estimate's Q.run via a helper so the spec reads clean. */
private object StatsSpecHelpers {
  def joinSize(s: org.apache.spark.sql.SparkSession, dir: String) =
    queries.RelationalQueries.qJoinSizeEstimate.run(s, dir).collect()
}
