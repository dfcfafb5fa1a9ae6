package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Round-10 evaluation/agreement/effect-size battery — the model-QA
  * report cards a training platform runs next to the round-9
  * inference tests: confusion-matrix classification report,
  * MCC/Cohen's-kappa agreement, Welch's unequal-variance t,
  * Cohen's-d effect size, Jensen–Shannon drift, Kendall's τ-b over a
  * bounded contingency grid, Cronbach's-α item reliability, and the
  * Hosmer–Lemeshow calibration χ².
  *
  * Shared discipline (SURVEY §6): the only data-scale passes are
  * bounded exact rollups (map-side combined); scalar statistics are
  * pure functions of exact int64/decimal(38,0) sums in a fixed op
  * order, with transcendental terms micro-quantized (×1e6) so
  * cross-term totals are order-free integer sums that replay
  * bit-for-bit in DuckDB. Reference scope: the 100 TB operational
  * layer around preprocessor.py (which has no evaluation battery).
  */
object MetricsQueries {

  // the single repo-wide rounding convention (StatsQueries owns it)
  private def r6(x: Double): Double = StatsQueries.r6(x)
  private def rL(x: Double): Long = StatsQueries.rL(x)

  /** Cross-engine scalar constants for the Gumbel fit, interpolated
    * into the oracle so both engines use the identical doubles.
    */
  private[graft] val Sqrt6OverPi: Double = math.sqrt(6.0) / math.Pi
  private[graft] val EulerGamma: Double = 0.5772156649015329
  private[graft] val LnLn99: Double =
    java.lang.StrictMath.log(-java.lang.StrictMath.log(0.99))


  // ---------------------------------------------------------------
  // Confusion-matrix family: q_auc's deterministic label (md5 16-bit
  // bucket vs value·2 — the synthetic "truth" whose base rate tracks
  // purchase size) against the fixed-threshold prediction ŷ = value
  // ≥ 34 (the corpus median, a calibrated-ish rule so every cell of
  // the matrix is populated). ONE data-scale pass: the 4-cell exact
  // rollup.
  // ---------------------------------------------------------------

  /** (tp, fp, fn, tn) exact counts; shared with the streaming twin. */
  private[graft] def confusionCounts(events: DataFrame): DataFrame = {
    val y = (graft.operators.Sampling.hashBucket(col("event_id")) % 1000 <
      col("value") * 2).cast("long")
    val yhat = (round(col("value") * 100).cast("long") >= 3400L).cast("long")
    events
      .select(y.as("y"), yhat.as("p"))
      .agg(sum(when(col("y") === 1 && col("p") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0 && col("p") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1 && col("p") === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("y") === 0 && col("p") === 0, 1L).otherwise(0L)).as("tn"))
  }

  private val confusionSql: String =
    s"""cm AS (
      SELECT
        sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
        sum(CASE WHEN y = 0 AND p = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
        sum(CASE WHEN y = 1 AND p = 0 THEN 1 ELSE 0 END)::BIGINT AS fn,
        sum(CASE WHEN y = 0 AND p = 0 THEN 1 ELSE 0 END)::BIGINT AS tn
      FROM (SELECT
              (${OracleExact.h16Sql("md5(event_id::VARCHAR)")} % 1000 < value * 2)::BIGINT AS y,
              (round(value * 100)::BIGINT >= 3400)::BIGINT AS p
            FROM events))"""

  /** Classification report tail shared with the streaming twin:
    * the 1-row (tp, fp, fn, tn) frame → metrics row. All four rates
    * are pure double functions of the exact counts in a fixed op
    * order (identical to the oracle's expression text).
    */
  private[graft] def confusionReport(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val r = counts.head()
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val acc = (tp + tn).toDouble / (tp + fp + fn + tn)
    val prec = tp.toDouble / (tp + fp)
    val rec = tp.toDouble / (tp + fn)
    val f1 = 2.0 * prec * rec / (prec + rec)
    Seq((tp, fp, fn, tn, r6(acc), r6(prec), r6(rec), r6(f1)))
      .toDF("tp", "fp", "fn", "tn", "accuracy", "precision", "recall", "f1")
  }

  /** Confusion matrix + accuracy/precision/recall/F1 — the basic
    * classifier report card over the deterministic synthetic truth.
    */
  val qConfusionMatrix: Q = Q(
    "q_confusion_matrix",
    (s, dir) => confusionReport(confusionCounts(Tables.events(s, dir))),
    Some(s"""
      WITH $confusionSql
      SELECT tp, fp, fn, tn,
             round((tp + tn)::DOUBLE / (tp + fp + fn + tn), 6) AS accuracy,
             round(tp::DOUBLE / (tp + fp), 6) AS precision,
             round(tp::DOUBLE / (tp + fn), 6) AS recall,
             round(2.0 * (tp::DOUBLE / (tp + fp)) * (tp::DOUBLE / (tp + fn)) /
                   ((tp::DOUBLE / (tp + fp)) + (tp::DOUBLE / (tp + fn))), 6) AS f1
      FROM cm
    """),
  )

  /** Matthews correlation + Cohen's κ from the same confusion rollup
    * — the two chance-corrected agreement coefficients (MCC for the
    * skew-robust single number, κ for rater-agreement reporting).
    * Numerators/marginals are exact int64; the final ratios are
    * fixed-op-order doubles of those ints (counts enter the MCC
    * denominator product as doubles — at 10¹² rows each marginal
    * still converts exactly below 2⁵³, and both engines share the
    * identical rounding when not).
    */
  /** MCC/κ tail shared with the streaming twin. */
  private[graft] def mccFromCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    {
      val r = counts.head()
      val (tp, fp, fn, tn) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val n = tp + fp + fn + tn
      val mcc = (tp.toDouble * tn - fp.toDouble * fn) /
        math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
      val po = (tp + tn).toDouble / n
      val pe = ((tp + fp).toDouble * (tp + fn) + (tn + fn).toDouble * (tn + fp)) /
        (n.toDouble * n)
      val kappa = (po - pe) / (1.0 - pe)
      Seq((n, r6(mcc), r6(po), r6(pe), r6(kappa)))
        .toDF("n", "mcc", "po", "pe", "kappa")
    }
  }

  val qMccKappa: Q = Q(
    "q_mcc_kappa",
    (s, dir) => mccFromCounts(confusionCounts(Tables.events(s, dir))),
    Some(s"""
      WITH $confusionSql
      SELECT (tp + fp + fn + tn)::BIGINT AS n,
             round((tp::DOUBLE * tn - fp::DOUBLE * fn) /
                   sqrt((tp + fp)::DOUBLE * (tp + fn) * (tn + fp) * (tn + fn)), 6) AS mcc,
             round((tp + tn)::DOUBLE / (tp + fp + fn + tn), 6) AS po,
             round(((tp + fp)::DOUBLE * (tp + fn) + (tn + fn)::DOUBLE * (tn + fp)) /
                   ((tp + fp + fn + tn)::DOUBLE * (tp + fp + fn + tn)), 6) AS pe,
             round(((tp + tn)::DOUBLE / (tp + fp + fn + tn) -
                    ((tp + fp)::DOUBLE * (tp + fn) + (tn + fn)::DOUBLE * (tn + fp)) /
                    ((tp + fp + fn + tn)::DOUBLE * (tp + fp + fn + tn))) /
                   (1.0 - ((tp + fp)::DOUBLE * (tp + fn) + (tn + fn)::DOUBLE * (tn + fp)) /
                    ((tp + fp + fn + tn)::DOUBLE * (tp + fp + fn + tn))), 6) AS kappa
      FROM cm
    """),
  )

  // ---------------------------------------------------------------
  // Two-sample moment family: purchase value by md5 arm. ONE
  // data-scale pass: the 2-row (n, Σm, Σm²) exact rollup (m =
  // micro-quantized value), the q_anova moment discipline.
  // ---------------------------------------------------------------

  /** Per-arm exact moments; shared with Welch/Cohen's-d and their
    * streaming twins.
    */
  private[graft] def armMoments(events: DataFrame): DataFrame =
    events
      .where(col("event_type") === "purchase")
      .select(StatsQueries.arm(col("user_id")).as("g"),
        round(col("value") * lit(1e6)).cast("long").as("m"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("m").cast("decimal(38,0)")).as("sm"),
        sum(col("m").cast("decimal(38,0)") * col("m")).as("qm"))

  private val armMomentsSql: String =
    s"""g AS (SELECT ${StatsQueries.armSql} AS g,
               round(value * 1000000)::BIGINT AS m
             FROM events WHERE event_type = 'purchase'),
      mo AS (SELECT g, count(*)::BIGINT AS n, sum(m)::HUGEINT AS sm,
               sum(m::HUGEINT * m) AS qm
             FROM g GROUP BY g),
      ab AS (SELECT
          max(CASE WHEN g = 0 THEN n END) AS na,
          max(CASE WHEN g = 1 THEN n END) AS nb,
          max(CASE WHEN g = 0 THEN sm END) AS sma,
          max(CASE WHEN g = 1 THEN sm END) AS smb,
          max(CASE WHEN g = 0 THEN qm END) AS qma,
          max(CASE WHEN g = 1 THEN qm END) AS qmb
        FROM mo)"""

  /** (n, mean, var) per arm from the collected 2-row moments — the
    * shared fixed-op-order scalar tail (op order mirrored in
    * [[meanVarSqlA]]/[[meanVarSqlB]]).
    */
  private[graft] def armMeanVar(moments: DataFrame)
      : (Long, Long, Double, Double, Double, Double) = {
    val rows = moments.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2)),
        BigDecimal(r.getDecimal(3))))
    }.toMap
    // a missing arm degrades to (0, 0, 0) — downstream ratios go
    // NaN/Inf and r6 passes them through, mirroring the oracle's
    // NULL-on-degenerate rather than crashing the dump
    val zero = (0L, BigDecimal(0), BigDecimal(0))
    val (na, sma, qma) = rows.getOrElse(0L, zero)
    val (nb, smb, qmb) = rows.getOrElse(1L, zero)
    def mean(sm: BigDecimal, n: Long) = sm.toDouble / n / 1e6
    def vr(qm: BigDecimal, sm: BigDecimal, n: Long) =
      (qm.toDouble - sm.toDouble * sm.toDouble / n) / (n - 1) / 1e12
    (na, nb, mean(sma, na), mean(smb, nb), vr(qma, sma, na), vr(qmb, smb, nb))
  }

  private val meanVarSql: String =
    """mv AS (SELECT na, nb,
          sma::DOUBLE / na / 1000000.0 AS ma,
          smb::DOUBLE / nb / 1000000.0 AS mb,
          (qma::DOUBLE - sma::DOUBLE * sma::DOUBLE / na) / (na - 1) / 1000000000000.0 AS va,
          (qmb::DOUBLE - smb::DOUBLE * smb::DOUBLE / nb) / (nb - 1) / 1000000000000.0 AS vb
        FROM ab)"""

  /** Welch's unequal-variance t-test of mean purchase value across
    * the md5 A/B arms — the experimentation-platform default for
    * continuous metrics (the z-proportion test `q_ab_lift` can't
    * serve). t and the Welch–Satterthwaite df are fixed-op-order
    * doubles of the exact per-arm moments; p is the asymptotic
    * normal tail through the shared A&S mirror (`normTwoSidedP` ↔
    * `phiTailSql` — df > 1000 here, where t ≈ z far beyond the
    * report precision).
    */
  /** Welch tail shared with the streaming twin: the 2-row per-arm
    * moment frame → the 1-row report.
    */
  private[graft] def welchFromMoments(moments: DataFrame): DataFrame = {
    val s = moments.sparkSession
    import s.implicits._
    val (na, nb, ma, mb, va, vb) = armMeanVar(moments)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    val df = (va / na + vb / nb) * (va / na + vb / nb) /
      ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
    val p = graft.operators.TsFeatures.normTwoSidedP(math.abs(t))
    Seq((na, nb, r6(ma), r6(mb), r6(t), r6(df), r6(p)))
      .toDF("n_a", "n_b", "mean_a", "mean_b", "t", "df", "p")
  }

  val qWelchTtest: Q = Q(
    "q_welch_ttest",
    (s, dir) => welchFromMoments(armMoments(Tables.events(s, dir))),
    Some(s"""
      WITH $armMomentsSql, $meanVarSql
      SELECT na AS n_a, nb AS n_b,
             round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
             round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t,
             round((va / na + vb / nb) * (va / na + vb / nb) /
                   ((va / na) * (va / na) / (na - 1) +
                    (vb / nb) * (vb / nb) / (nb - 1)), 6) AS df,
             round(${OracleExact.phiTailSql(
               "abs((ma - mb) / sqrt(va / na + vb / nb))")}, 6) AS p
      FROM mv
    """),
  )

  /** Cohen's d standardized effect size between the arms (pooled-SD
    * flavor) — the "is the lift big enough to matter" companion to
    * [[qWelchTtest]]'s "is it real". Same 2-row moment rollup.
    */
  val qCohensD: Q = Q(
    "q_cohens_d",
    (s, dir) => {
      import s.implicits._
      val (na, nb, ma, mb, va, vb) = armMeanVar(armMoments(Tables.events(s, dir)))
      val sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
      val d = (ma - mb) / sp
      Seq((na, nb, r6(ma), r6(mb), r6(sp), r6(d)))
        .toDF("n_a", "n_b", "mean_a", "mean_b", "sd_pooled", "d")
    },
    Some(s"""
      WITH $armMomentsSql, $meanVarSql
      SELECT na AS n_a, nb AS n_b,
             round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
             round(sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)), 6) AS sd_pooled,
             round((ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)), 6) AS d
      FROM mv
    """),
  )

  /** One-sided upper normal tail P(Z ≥ t) via the shared A&S mirror
    * (`normTwoSidedP` is 2·P(Z ≥ |t|)); SQL mirror in [[upperPSql]].
    */
  private def upperP(t: Double): Double =
    if (t >= 0) graft.operators.TsFeatures.normTwoSidedP(t) / 2.0
    else 1.0 - graft.operators.TsFeatures.normTwoSidedP(-t) / 2.0

  private def upperPSql(t: String): String =
    s"CASE WHEN $t >= 0 THEN ${OracleExact.phiTailSql(t)} / 2.0 " +
      s"ELSE 1.0 - ${OracleExact.phiTailSql(s"-($t)")} / 2.0 END"

  /** TOST equivalence test (two one-sided tests, margin δ = 0.5) of
    * mean purchase value across the arms — the "are they the SAME"
    * companion to `q_welch_ttest`'s "are they different" (the
    * launch-safety / non-inferiority readout an experimentation
    * platform reports before shipping a neutral change). Same 2-row
    * exact moment rollup; t_lower/t_upper and both one-sided ps are
    * fixed-op-order doubles of the moments, equivalent ⇔
    * max(p) ≤ 0.05 (a double compare both engines share).
    */
  /** TOST tail shared with the streaming twin. */
  private[graft] def tostFromMoments(moments: DataFrame): DataFrame = {
    val s = moments.sparkSession
    import s.implicits._
    val (na, nb, ma, mb, va, vb) = armMeanVar(moments)
      val se = math.sqrt(va / na + vb / nb)
      val delta = 0.5
      val tLo = ((ma - mb) + delta) / se
      val tUp = ((ma - mb) - delta) / se
      val pLo = upperP(tLo)        // H0: diff <= -δ
      val pUp = upperP(-tUp)       // H0: diff >= +δ  (lower tail of tUp)
      val pTost = math.max(pLo, pUp)
      Seq((na, nb, r6(ma - mb), r6(se), r6(tLo), r6(tUp), r6(pLo), r6(pUp),
        r6(pTost), pTost <= 0.05))
        .toDF("n_a", "n_b", "diff", "se", "t_lower", "t_upper",
          "p_lower", "p_upper", "p_tost", "equivalent")
  }

  val qTost: Q = Q(
    "q_tost",
    (s, dir) => tostFromMoments(armMoments(Tables.events(s, dir))),
    Some(s"""
      WITH $armMomentsSql, $meanVarSql,
      tt AS (SELECT na, nb, ma - mb AS d, sqrt(va / na + vb / nb) AS se
             FROM mv),
      ts AS (SELECT na, nb, d, se,
               (d + 0.5) / se AS tlo, (d - 0.5) / se AS tup
             FROM tt),
      ps AS (SELECT na, nb, d, se, tlo, tup,
               ${upperPSql("tlo")} AS plo,
               ${upperPSql("-tup")} AS pup
             FROM ts)
      SELECT na AS n_a, nb AS n_b, round(d, 6) AS diff, round(se, 6) AS se,
             round(tlo, 6) AS t_lower, round(tup, 6) AS t_upper,
             round(plo, 6) AS p_lower, round(pup, 6) AS p_upper,
             round(greatest(plo, pup), 6) AS p_tost,
             greatest(plo, pup) <= 0.05 AS equivalent
      FROM ps
    """),
  )

  /** Wald SPRT (sequential probability ratio test) of the daily
    * purchase rate against a 20% uplift alternative — the
    * early-stopping monitor an always-on experimentation platform
    * runs instead of a fixed-horizon test: after each day, the
    * cumulative log-likelihood ratio either crosses ln((1−β)/α)
    * (accept H1), ln(β/(1−α)) (accept H0), or continues. ONE day-grain
    * rollup (bounded, map-side combined); p0 is the corpus rate (fit
    * scalar from exact counts), per-day LLR terms micro-quantize so
    * the running sum is an exact integer prefix over the bounded day
    * grain (unpartitioned window over the day-grain Aggregate — the
    * §14 bounded-grain shape).
    */
  /** SPRT tail shared with the streaming twin: the (day, n, x)
    * day-grain rollup frame → per-day cumulative LLR + decision. The
    * caller keeps an Aggregate visible beneath the window (the
    * bounded-grain guard contract); totals re-run the cheap rollup.
    */
  private[graft] def sprtReport(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = d.agg(sum(col("x")), sum(col("n"))).head()
    val (xs, ns) = (t.getLong(0), t.getLong(1))
    val p0 = xs.toDouble / ns
    val p1 = math.min(1.2 * p0, 0.999)
    val c1 = java.lang.StrictMath.log(p1 / p0)
    val c2 = java.lang.StrictMath.log((1 - p1) / (1 - p0))
    // alpha = 0.05, beta = 0.2: constants interpolated into the
    // oracle so both engines compare against the identical double
    val a = java.lang.StrictMath.log((1 - 0.2) / 0.05)
    val b = java.lang.StrictMath.log(0.2 / (1 - 0.05))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("micro",
      round((col("x") * lit(c1) + (col("n") - col("x")) * lit(c2)) * lit(1e6))
        .cast("long"))
      .withColumn("cum", sum(col("micro")).over(w))
      .select(col("day"), col("n"), col("x"),
        (col("cum") / 1e6).as("llr_cum"),
        when(col("cum") / 1e6 >= lit(a), "accept_h1")
          .when(col("cum") / 1e6 <= lit(b), "accept_h0")
          .otherwise("continue").as("decision"))
  }

  /** The (day, n, x) rollup; shared with the streaming twin. */
  private[graft] def sprtDays(events: DataFrame): DataFrame =
    events
      .groupBy(expr("cast(ts as long) div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))

  val qSprt: Q = Q(
    "q_sprt",
    // NOT checkpointed: the day-grain Aggregate must stay visible
    // beneath the window so the bounded-grain plan guard can prove
    // the window's input is O(days)
    (s, dir) => sprtReport(sprtDays(Tables.events(s, dir))),
    Some {
      val a = java.lang.StrictMath.log((1 - 0.2) / 0.05)
      val b = java.lang.StrictMath.log(0.2 / (1 - 0.05))
      s"""
      WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
               count(*)::BIGINT AS n,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS x
             FROM events GROUP BY 1),
      t AS (SELECT sum(x)::BIGINT AS xs, sum(n)::BIGINT AS ns FROM d),
      c AS (SELECT xs::DOUBLE / ns AS p0,
              least(1.2 * (xs::DOUBLE / ns), 0.999) AS p1 FROM t),
      k AS (SELECT ln(p1 / p0) AS c1, ln((1 - p1) / (1 - p0)) AS c2 FROM c),
      l AS (SELECT day, n, x,
              round((x * c1 + (n - x) * c2) * 1e6)::BIGINT AS micro
            FROM d, k),
      w AS (SELECT day, n, x,
              sum(micro) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM l)
      SELECT day, n, x, cum / 1e6 AS llr_cum,
             CASE WHEN cum / 1e6 >= $a THEN 'accept_h1'
                  WHEN cum / 1e6 <= $b THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM w
    """
    },
  )

  /** Hill tail-index estimator over the top-k order statistics of
    * purchase value (k = 200) — the heavy-tail diagnosis a platform
    * runs before trusting means/variances at 100 TB (α ≤ 2 means the
    * variance the other reports assume doesn't exist). The top-k is a
    * TakeOrdered (bounded, no global sort); boundary ties are
    * value-equal so the value MULTISET is deterministic regardless of
    * tie split; the k ln-ratio terms micro-quantize into an
    * order-free integer sum both engines replay.
    */
  val qHillEstimator: Q = Q(
    "q_hill_estimator",
    (s, dir) => {
      import s.implicits._
      val k = 200
      val top = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("value"))
        .orderBy(col("value").desc).limit(k)
        .collect().map(_.getDouble(0)) // k-bounded
      val thr = top.min
      val sumMicro = top.map(v => rL(java.lang.StrictMath.log(v / thr) * 1e6)).sum
      val h = sumMicro.toDouble / k / 1e6
      Seq((k.toLong, r6(thr), r6(h), r6(1.0 / h)))
        .toDF("k", "threshold", "hill_h", "alpha")
    },
    Some("""
      WITH top AS (SELECT value FROM events WHERE event_type = 'purchase'
                   ORDER BY value DESC LIMIT 200),
      thr AS (SELECT min(value) AS t FROM top),
      terms AS (SELECT round(ln(value / thr.t) * 1e6)::BIGINT AS micro
                FROM top, thr),
      sm AS (SELECT sum(micro)::BIGINT AS s FROM terms)
      SELECT 200::BIGINT AS k, round(thr.t, 6) AS threshold,
             round(sm.s::DOUBLE / 200 / 1e6, 6) AS hill_h,
             round(1.0 / (sm.s::DOUBLE / 200 / 1e6), 6) AS alpha
      FROM thr, sm
    """),
  )

  /** Gumbel fit of daily purchase-value maxima by the method of
    * moments — extreme-value theory's block-maxima readout ("what
    * does a 1-in-100-day peak look like"), the capacity-planning
    * companion to [[qHillEstimator]]'s tail exponent. ONE day-grain
    * rollup of exact max-cents, exact (Σx, Σx²) moments over the
    * bounded day grain, then σ̂ = s·√6/π, μ̂ = m − γ·σ̂ and the 99%
    * quantile μ̂ − σ̂·ln(−ln 0.99) as fixed-op-order doubles (the
    * √6/π, Euler–Mascheroni, and −ln(−ln p) constants are Scala
    * doubles interpolated into the oracle text).
    */
  val qGumbelMaxima: Q = Q(
    "q_gumbel_maxima",
    (s, dir) => {
      import s.implicits._
      val m = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(expr("cast(ts as long) div 86400000000000").as("day"))
        .agg(max(round(col("value") * 100).cast("long")).as("mx"))
        .agg(count(lit(1)).as("n"),
          sum(col("mx").cast("decimal(38,0)")).as("sm"),
          sum(col("mx").cast("decimal(38,0)") * col("mx")).as("qm")).head()
      val n = m.getLong(0)
      val (sm, qm) = (BigDecimal(m.getDecimal(1)), BigDecimal(m.getDecimal(2)))
      val mean = sm.toDouble / n / 100.0
      val sd = math.sqrt(
        (qm.toDouble - sm.toDouble * sm.toDouble / n) / (n - 1)) / 100.0
      val sigma = sd * MetricsQueries.Sqrt6OverPi
      val mu = mean - MetricsQueries.EulerGamma * sigma
      val q99 = mu - sigma * MetricsQueries.LnLn99
      Seq((n, r6(mean), r6(sd), r6(sigma), r6(mu), r6(q99)))
        .toDF("n_days", "mean_max", "sd_max", "sigma", "mu", "q99")
    },
    Some(s"""
      WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
               max(round(value * 100)::BIGINT)::BIGINT AS mx
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
      m AS (SELECT count(*)::BIGINT AS n, sum(mx)::HUGEINT AS sm,
              sum(mx::HUGEINT * mx) AS qm FROM d),
      v AS (SELECT n,
              sm::DOUBLE / n / 100.0 AS mean,
              sqrt((qm::DOUBLE - sm::DOUBLE * sm::DOUBLE / n) / (n - 1)) / 100.0 AS sd
            FROM m)
      SELECT n AS n_days, round(mean, 6) AS mean_max, round(sd, 6) AS sd_max,
             round(sd * ${MetricsQueries.Sqrt6OverPi}, 6) AS sigma,
             round(mean - ${MetricsQueries.EulerGamma} * (sd * ${MetricsQueries.Sqrt6OverPi}), 6) AS mu,
             round((mean - ${MetricsQueries.EulerGamma} * (sd * ${MetricsQueries.Sqrt6OverPi})) -
                   (sd * ${MetricsQueries.Sqrt6OverPi}) * ${MetricsQueries.LnLn99}, 6) AS q99
      FROM v
    """),
  )

  /** Delete-one jackknife variance of the mean daily purchase value —
    * the classic "how stable is this daily KPI" uncertainty readout
    * (the resampling sibling of the Poisson bootstrap, exact instead
    * of replicated): per-day micro-quantized means off the bounded
    * day-grain rollup, leave-one-day-out deviations as fixed-op-order
    * doubles of those exact ints, squared terms re-quantized so the
    * cross-day total is an order-free integer sum.
    */
  val qJackknifeVariance: Q = Q(
    "q_jackknife_variance",
    (s, dir) => {
      import s.implicits._
      val days = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(expr("cast(ts as long) div 86400000000000").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n"))
        .collect() // bounded day grain
        .map(r => rL(r.getLong(1).toDouble * 1e4 / r.getLong(2))) // micro-$ day mean
      val d = days.length
      val sMicro = days.sum
      val theta = sMicro.toDouble / d
      val terms = days.map { mi =>
        val dev = (sMicro - mi).toDouble / (d - 1) - theta
        rL(dev * dev)
      }
      val varJack = (d - 1).toDouble / d * terms.sum / 1e12
      Seq((d.toLong, r6(theta / 1e6), r6(varJack), r6(math.sqrt(varJack))))
        .toDF("n_days", "theta", "var_jack", "se_jack")
    },
    Some("""
      WITH dd AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
               sum(round(value * 100)::BIGINT)::BIGINT AS cents,
               count(*)::BIGINT AS n
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
      m AS (SELECT round(cents::DOUBLE * 1e4 / n)::BIGINT AS micro FROM dd),
      t AS (SELECT count(*)::BIGINT AS d, sum(micro)::BIGINT AS s FROM m),
      terms AS (SELECT round(((t.s - micro)::DOUBLE / (t.d - 1) - t.s::DOUBLE / t.d) *
                            ((t.s - micro)::DOUBLE / (t.d - 1) - t.s::DOUBLE / t.d))::BIGINT AS term
                FROM m, t)
      SELECT t.d AS n_days,
             round(t.s::DOUBLE / t.d / 1e6, 6) AS theta,
             round((t.d - 1)::DOUBLE / t.d * (SELECT sum(term) FROM terms) / 1e12, 6) AS var_jack,
             round(sqrt((t.d - 1)::DOUBLE / t.d * (SELECT sum(term) FROM terms) / 1e12), 6) AS se_jack
      FROM t
    """),
  )

  // ---------------------------------------------------------------
  // Jensen–Shannon drift
  // ---------------------------------------------------------------

  /** The (bin, n_a, n_b) 10-equi-width-bin rollup of purchase value
    * by arm (bin edges fit on the global min/max — fit-offline
    * scalars); shared with the streaming twin.
    */
  private[graft] def jsBins(events: DataFrame): DataFrame = {
    val ev = events.where(col("event_type") === "purchase")
      .select(col("value"), StatsQueries.arm(col("user_id")).as("g"))
      .localCheckpoint()
    val mm = ev.agg(min(col("value")), max(col("value"))).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / 10.0
    val bin = least(greatest(floor((col("value") - lit(lo)) / lit(width)),
      lit(0.0)), lit(9.0)).cast("long")
    ev.select(bin.as("bin"), col("g"))
      .groupBy(col("bin"))
      .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_b"))
  }

  private val jsBinsSql: String =
    s"""ev AS (SELECT value, ${StatsQueries.armSql} AS g
             FROM events WHERE event_type = 'purchase'),
      ft AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
      bb AS (SELECT least(greatest(floor((value - ft.lo) / ((ft.hi - ft.lo) / 10.0)), 0.0), 9.0)::BIGINT AS bin,
                    g
             FROM ev, ft),
      bins AS (SELECT bin,
                 sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
                 sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b
               FROM bb GROUP BY 1)"""

  /** JS tail shared with the streaming twin: the k-bounded (bin,
    * n_a, n_b) rollup → per-bin JS terms + total. Laplace-smoothed
    * shares ((n+½)/(N+k/2), the PSI discipline) so an empty bin
    * cannot produce log 0; each bin's ½(p·ln(p/m) + q·ln(q/m)) term
    * is micro-quantized before the cross-bin total (order-free int
    * sum).
    */
  private[graft] def jsFromBins(binsDf: DataFrame): DataFrame = {
    val s = binsDf.sparkSession
    import s.implicits._
    val rows = binsDf.orderBy(col("bin")).collect() // k-bounded (k <= 10)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = rows.length
    val (ta, tb) = (rows.map(_._2).sum, rows.map(_._3).sum)
    val terms = rows.map { case (b, na2, nb2) =>
      val p = (na2 + 0.5) / (ta + k / 2.0)
      val q = (nb2 + 0.5) / (tb + k / 2.0)
      val m = (p + q) / 2.0
      (b, na2, nb2,
        rL((0.5 * (p * math.log(p / m)) + 0.5 * (q * math.log(q / m))) * 1e6))
    }
    val total = terms.map(_._4).sum
    terms.map { case (b, na2, nb2, micro) =>
      (b, na2, nb2, micro / 1e6, total / 1e6)
    }.toSeq.toDF("bin", "n_a", "n_b", "js_term", "js_total")
  }

  /** Jensen–Shannon divergence between the arms' purchase-value
    * distributions — the bounded (≤ ln 2), symmetric drift measure
    * used where PSI's unbounded terms misbehave. Same 10-bin rollup
    * discipline as `q_psi`.
    */
  val qJsDivergence: Q = Q(
    "q_js_divergence",
    (s, dir) => jsFromBins(jsBins(Tables.events(s, dir))),
    Some(s"""
      WITH $jsBinsSql,
      tt AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb,
               count(*)::BIGINT AS k FROM bins),
      t AS (SELECT bin, n_a, n_b,
              round((0.5 * (((n_a + 0.5) / (ta + k / 2.0)) *
                      ln(((n_a + 0.5) / (ta + k / 2.0)) /
                         ((((n_a + 0.5) / (ta + k / 2.0)) + ((n_b + 0.5) / (tb + k / 2.0))) / 2.0))) +
                     0.5 * (((n_b + 0.5) / (tb + k / 2.0)) *
                      ln(((n_b + 0.5) / (tb + k / 2.0)) /
                         ((((n_a + 0.5) / (ta + k / 2.0)) + ((n_b + 0.5) / (tb + k / 2.0))) / 2.0)))) * 1e6)::BIGINT AS micro
            FROM bins, tt)
      SELECT bin, n_a, n_b, micro / 1e6 AS js_term,
             (SELECT sum(micro) FROM t) / 1e6 AS js_total
      FROM t
    """),
  )

  // ---------------------------------------------------------------
  // Kendall's τ-b
  // ---------------------------------------------------------------

  /** Kendall's τ-b rank correlation between l_quantity and
    * l_discount — the ordinal-association companion to `q_spearman`,
    * computed WITHOUT any pairwise pass: both columns are bounded
    * grains (50 quantities × 11 discount cents), so concordant/
    * discordant/tie counts are exact integer functions of the ≤550-
    * cell contingency rollup (the `q_cramers_v` shape). The O(cells²)
    * pair scan runs on the collected grid, never on rows; at any
    * corpus size the data-scale cost stays the one map-side-combined
    * rollup.
    */
  /** τ-b tail shared with the streaming twin: the collected bounded
    * contingency grid → the 1-row report.
    */
  private[graft] def tauFromCells(cellsDf: DataFrame): DataFrame = {
    val s = cellsDf.sparkSession
    import s.implicits._
    val cells = cellsDf.collect() // bounded: <= 50 x 11 cells
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = cells.map(_._3).sum
    var conc = BigInt(0); var disc = BigInt(0)
    for ((x1, y1, c1) <- cells; (x2, y2, c2) <- cells) {
      if (x2 > x1 && y2 > y1) conc += BigInt(c1) * c2
      if (x2 > x1 && y2 < y1) disc += BigInt(c1) * c2
    }
    val n0 = BigInt(n) * (n - 1) / 2
    val n1 = cells.groupBy(_._1).values
      .map(g => { val t = g.map(_._3).sum; BigInt(t) * (t - 1) / 2 }).sum
    val n2 = cells.groupBy(_._2).values
      .map(g => { val t = g.map(_._3).sum; BigInt(t) * (t - 1) / 2 }).sum
    val tau = (conc - disc).toDouble /
      math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
    // pair counts published as BIGINT: beyond int64 (n ≳ 6·10⁹ rows)
    // the oracle's ::BIGINT cast of the HUGEINT raises — fail loudly
    // here too instead of BigInt.toLong's silent wrap
    require(conc.isValidLong && disc.isValidLong,
      s"kendall pair counts exceed int64 (conc=$conc disc=$disc); " +
        "widen the report columns to decimal before running at this scale")
    Seq((n, conc.toLong, disc.toLong, r6(tau)))
      .toDF("n", "concordant", "discordant", "tau_b")
  }

  val qKendallTau: Q = Q(
    "q_kendall_tau",
    (s, dir) => tauFromCells(Tables.lineitem(s, dir)
      .groupBy(col("l_quantity").cast("long").as("x"),
        round(col("l_discount") * 100).cast("long").as("y"))
      .agg(count(lit(1)).as("c"))),
    Some("""
      WITH cells AS (
        SELECT l_quantity::BIGINT AS x, round(l_discount * 100)::BIGINT AS y,
               count(*)::BIGINT AS c
        FROM lineitem GROUP BY 1, 2),
      pairs AS (SELECT
          sum(CASE WHEN c2.x > c1.x AND c2.y > c1.y THEN c1.c::HUGEINT * c2.c ELSE 0 END) AS conc,
          sum(CASE WHEN c2.x > c1.x AND c2.y < c1.y THEN c1.c::HUGEINT * c2.c ELSE 0 END) AS disc
        FROM cells c1, cells c2),
      tots AS (SELECT sum(c)::BIGINT AS n FROM cells),
      tx AS (SELECT sum(t::HUGEINT * (t - 1) / 2) AS n1
             FROM (SELECT sum(c)::BIGINT AS t FROM cells GROUP BY x)),
      ty AS (SELECT sum(t::HUGEINT * (t - 1) / 2) AS n2
             FROM (SELECT sum(c)::BIGINT AS t FROM cells GROUP BY y)),
      n0 AS (SELECT n::HUGEINT * (n - 1) / 2 AS n0 FROM tots)
      SELECT tots.n AS n, conc::BIGINT AS concordant, disc::BIGINT AS discordant,
             round((conc - disc)::DOUBLE /
                   sqrt((n0.n0 - tx.n1)::DOUBLE * (n0.n0 - ty.n2)::DOUBLE), 6) AS tau_b
      FROM pairs, tots, tx, ty, n0
    """),
  )

  // ---------------------------------------------------------------
  // Cronbach's α
  // ---------------------------------------------------------------

  /** Cronbach's-α internal-consistency coefficient over three
    * per-order "item scores" (line count, total quantity, total
    * cents/100 — the do-these-measure-one-construct reliability
    * check a metrics platform runs on composite KPIs). Two passes:
    * the order-grain item rollup (exact ints), then ONE global
    * aggregate of the six Σx/Σx² moment pairs plus the composite's
    * (decimal(38,0), map-side combined). α = k/(k−1)·(1 − Σσ²ᵢ/σ²ₜ)
    * with every variance the same fixed-op-order function of exact
    * sums as `q_welch_ttest`.
    */
  val qCronbachAlpha: Q = Q(
    "q_cronbach_alpha",
    (s, dir) => {
      import s.implicits._
      val items = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("x1"),
          sum(col("l_quantity").cast("long")).as("x2"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("c100"))
        .select(col("x1"), col("x2"), expr("c100 div 100").as("x3"))
        .select(col("x1"), col("x2"), col("x3"),
          (col("x1") + col("x2") + col("x3")).as("tot"))
      val m = items.agg(count(lit(1)).as("n"),
        sum(col("x1").cast("decimal(38,0)")).as("s1"),
        sum(col("x1").cast("decimal(38,0)") * col("x1")).as("q1"),
        sum(col("x2").cast("decimal(38,0)")).as("s2"),
        sum(col("x2").cast("decimal(38,0)") * col("x2")).as("q2"),
        sum(col("x3").cast("decimal(38,0)")).as("s3"),
        sum(col("x3").cast("decimal(38,0)") * col("x3")).as("q3"),
        sum(col("tot").cast("decimal(38,0)")).as("st"),
        sum(col("tot").cast("decimal(38,0)") * col("tot")).as("qt")).head()
      val n = m.getLong(0)
      // variances as exact half-up 6-dp micro units from the integer
      // moments — v = (q·n − s²)/(n(n−1)) published as decimal(38,6):
      // at sf1 v₃ ≈ 1.4e10, where round(double, 6) is engine-ambiguous
      // (1e-6 grid < one ulp — the r15 sf1 gate class)
      def vrMicro(qi: java.math.BigDecimal, si: java.math.BigDecimal): BigInt = {
        val q = BigInt(qi.toBigIntegerExact)
        val ss = BigInt(si.toBigIntegerExact)
        val num = (q * n - ss * ss) * 1000000
        val den = BigInt(n) * (BigInt(n) - 1)
        (num * 2 + den) / (den * 2) // half-up; variances are >= 0
      }
      val m1 = vrMicro(m.getDecimal(2), m.getDecimal(1))
      val m2 = vrMicro(m.getDecimal(4), m.getDecimal(3))
      val m3 = vrMicro(m.getDecimal(6), m.getDecimal(5))
      val mt = vrMicro(m.getDecimal(8), m.getDecimal(7))
      // alpha from the micro integers (the 1e6 cancels in the ratio);
      // the micros are < 2^63 so both engines' int→double is exact-
      // rounded and the double op sequence matches the oracle verbatim
      val alpha = 3.0 / 2.0 * (1.0 - (m1 + m2 + m3).toDouble / mt.toDouble)
      def dec6(x: BigInt) = new java.math.BigDecimal(x.bigInteger, 6)
      Seq((n, dec6(m1), dec6(m2), dec6(m3), dec6(mt), r6(alpha)))
        .toDF("n", "var_1", "var_2", "var_3", "var_total", "alpha")
        .select(col("n"),
          col("var_1").cast("decimal(38,6)"), col("var_2").cast("decimal(38,6)"),
          col("var_3").cast("decimal(38,6)"), col("var_total").cast("decimal(38,6)"),
          col("alpha"))
    },
    Some("""
      WITH it AS (SELECT l_orderkey, count(*)::BIGINT AS x1,
               sum(l_quantity::BIGINT)::BIGINT AS x2,
               (sum(round(l_extendedprice * 100)::BIGINT)::BIGINT // 100)::BIGINT AS x3
             FROM lineitem GROUP BY 1),
      it2 AS (SELECT x1, x2, x3, (x1 + x2 + x3)::BIGINT AS tot FROM it),
      m AS (SELECT count(*)::BIGINT AS n,
              sum(x1)::HUGEINT AS s1, sum(x1::HUGEINT * x1) AS q1,
              sum(x2)::HUGEINT AS s2, sum(x2::HUGEINT * x2) AS q2,
              sum(x3)::HUGEINT AS s3, sum(x3::HUGEINT * x3) AS q3,
              sum(tot)::HUGEINT AS st, sum(tot::HUGEINT * tot) AS qt
            FROM it2),
      mic AS (SELECT n,
              (2*((q1*n - s1*s1)*1000000) + (n::HUGEINT*(n-1))) // (2*(n::HUGEINT*(n-1))) AS m1,
              (2*((q2*n - s2*s2)*1000000) + (n::HUGEINT*(n-1))) // (2*(n::HUGEINT*(n-1))) AS m2,
              (2*((q3*n - s3*s3)*1000000) + (n::HUGEINT*(n-1))) // (2*(n::HUGEINT*(n-1))) AS m3,
              (2*((qt*n - st*st)*1000000) + (n::HUGEINT*(n-1))) // (2*(n::HUGEINT*(n-1))) AS mt
            FROM m)
      SELECT n,
             ((m1 // 1000000)::VARCHAR || '.' || lpad((m1 % 1000000)::VARCHAR, 6, '0'))::DECIMAL(38,6) AS var_1,
             ((m2 // 1000000)::VARCHAR || '.' || lpad((m2 % 1000000)::VARCHAR, 6, '0'))::DECIMAL(38,6) AS var_2,
             ((m3 // 1000000)::VARCHAR || '.' || lpad((m3 % 1000000)::VARCHAR, 6, '0'))::DECIMAL(38,6) AS var_3,
             ((mt // 1000000)::VARCHAR || '.' || lpad((mt % 1000000)::VARCHAR, 6, '0'))::DECIMAL(38,6) AS var_total,
             round(3.0 / 2.0 * (1.0 - (m1 + m2 + m3)::DOUBLE / mt::DOUBLE), 6) AS alpha
      FROM mic
    """),
  )

  // ---------------------------------------------------------------
  // Hosmer–Lemeshow calibration χ²
  // ---------------------------------------------------------------

  /** Hosmer–Lemeshow goodness-of-fit over 10 score deciles — the
    * calibration χ² for the deterministic synthetic model (predicted
    * p = min(value·2, 1000)/1000, the exact generating probability
    * of q_auc's label). Deciles assign by the §13 two-level exact
    * rank (cents-grain prefix + within-tie window partitioned BY
    * cents — no global row sort); observed positives are exact ints,
    * expected positives exact micro-int sums of p, and the 10 χ²
    * terms (O−E)²/(E(1−E/n)) micro-quantize into an order-free
    * total.
    */
  val qHosmerLemeshow: Q = Q(
    "q_hosmer_lemeshow",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("cents"),
          (graft.operators.Sampling.hashBucket(col("event_id")) % 1000 <
            col("value") * 2).cast("long").as("y"),
          least(round(col("value") * 2 * 1000), lit(1000000L)).cast("long")
            .as("pmicro")) // p in millionths: min(value*2,1000)/1000
        .localCheckpoint()
      val n = ev.count()
      val wv = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prefix = ev.groupBy(col("cents")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wv))
        .select(col("cents"), (col("cum") - col("c")).as("before"))
      val wTie = Window.partitionBy(col("cents")).orderBy(col("event_id"))
      val dec = ev.join(prefix, Seq("cents"))
        .withColumn("rk", col("before") + row_number().over(wTie))
        .select(expr(s"((rk - 1) * 10) div $n").as("decile"),
          col("y"), col("pmicro"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_d"), sum(col("y")).as("obs"),
          sum(col("pmicro")).as("expm"))
        .orderBy(col("decile")).collect() // k-bounded (k = 10)
      val terms = dec.map { r =>
        val (d, nd, obs, expm) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        val e = expm / 1e6
        val term = (obs - e) * (obs - e) / (e * (1.0 - e / nd))
        (d, nd, obs, r6(e), rL(term * 1e6))
      }
      val chi2 = terms.map(_._5).sum / 1e6
      terms.map { case (d, nd, obs, e, _) => (d, nd, obs, e, r6(chi2)) }
        .toSeq.toDF("decile", "n", "obs_pos", "exp_pos", "chi2_total")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, round(value * 100)::BIGINT AS cents,
               (${OracleExact.h16Sql("md5(event_id::VARCHAR)")} % 1000 < value * 2)::BIGINT AS y,
               least(round(value * 2 * 1000), 1000000)::BIGINT AS pmicro
        FROM events),
      t AS (SELECT count(*)::BIGINT AS n FROM ev),
      pre AS (SELECT cents,
                (sum(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) - c)::BIGINT AS before
              FROM (SELECT cents, count(*)::BIGINT AS c FROM ev GROUP BY 1)),
      rk AS (SELECT ev.y, ev.pmicro,
               pre.before + row_number() OVER (PARTITION BY ev.cents ORDER BY ev.event_id) AS rk
             FROM ev JOIN pre ON ev.cents = pre.cents),
      d AS (SELECT ((rk - 1) * 10) // (SELECT n FROM t) AS decile, y, pmicro FROM rk),
      g AS (SELECT decile, count(*)::BIGINT AS n_d, sum(y)::BIGINT AS obs,
              sum(pmicro)::BIGINT AS expm
            FROM d GROUP BY 1),
      tm AS (SELECT decile, n_d, obs, expm,
               round((obs - expm / 1e6) * (obs - expm / 1e6) /
                     ((expm / 1e6) * (1.0 - (expm / 1e6) / n_d)) * 1e6)::BIGINT AS micro
             FROM g)
      SELECT decile, n_d AS n, obs AS obs_pos,
             round(expm / 1e6, 6) AS exp_pos,
             round((SELECT sum(micro) FROM tm) / 1e6, 6) AS chi2_total
      FROM tm
    """),
  )

  val all: Seq[Q] = Seq(qConfusionMatrix, qMccKappa, qWelchTtest, qCohensD,
    qJsDivergence, qKendallTau, qCronbachAlpha, qHosmerLemeshow, qTost, qSprt,
    qHillEstimator, qGumbelMaxima, qJackknifeVariance)
}
