package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation / drift-monitoring statistics whose distributed
  * part is a bounded exact rollup and whose scalar part is a pure
  * function of exact int64 sums — so every value replays bit-for-bit
  * in an external engine (the ExactAgg discipline applied to eval
  * metrics). Reference scope: the training-data pipeline mandate
  * (model QC next to the prep/dedup/text operators).
  */
object Eval {

  /** Tie-corrected Mann–Whitney ROC AUC.
    *
    * Input: a frame with an integer-quantized score column (quantize
    * BEFORE calling — ties must be discrete to be tie-corrected
    * deterministically) and a 0/1 long label column. The only
    * data-scale pass is the distinct-score rollup (map-side combined,
    * bounded by score cardinality); the ordered prefix sum and the
    * final division ride that bounded table. Half-ranks stay integral
    * via 2·avgrank = 2·cum_before + n + 1, so
    * AUC = (S₂/2 − n⁺(n⁺+1)/2) / (n⁺·n⁻) is a pure function of three
    * exact sums. S₂ = Σ n⁺·rank₂ can reach ~2n², past int64 above
    * ~3×10⁹ rows, so it accumulates as decimal(38,0) (the decSum
    * pattern) — exact to 10³⁸, i.e. any feasible corpus.
    *
    * Returns (nPos, nNeg, auc).
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): (Long, Long, Double) = {
    val byScore = df
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).as("npos"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = byScore
      .withColumn("rank2", lit(2) * (sum(col("n")).over(w) - col("n")) + col("n") + 1)
      .agg(sum(col("npos")).as("np"),
        sum(col("n") - col("npos")).as("nn"),
        sum(col("npos").cast("decimal(38,0)") * col("rank2")).as("s2")).head()
    val (np, nn) = (r.getLong(0), r.getLong(1))
    val s2 = BigDecimal(r.getDecimal(2))
    val a = (s2.toDouble / 2.0 - np.toDouble * (np + 1).toDouble / 2.0) /
      (np.toDouble * nn.toDouble)
    (np, nn, a)
  }

  /** Population-stability-index terms from per-bin exact counts.
    *
    * Input: (bin, nBaseline, nCurrent) rows in bin order (k-bounded
    * fit state, like the scaler quantile grids). Shares are
    * Laplace-smoothed — (n + ½)/(N + k/2) — so an empty bin cannot
    * produce ±∞; each term (p_cur − p_base)·ln(p_cur/p_base) is a
    * pure double function of the exact counts in a fixed op order and
    * is micro-quantized (×1e6, half-even via math.round) so the
    * cross-bin total is an order-free integer sum.
    *
    * Returns per-bin (bin, nBaseline, nCurrent, microTerm) plus the
    * micro total.
    */
  def psiTerms(bins: Seq[(Long, Long, Long)]): (Seq[(Long, Long, Long, Long)], Long) = {
    val k = bins.size
    val totA = bins.map(_._2).sum
    val totB = bins.map(_._3).sum
    val terms = bins.map { case (bin, nA, nB) =>
      val pA = (nA + 0.5) / (totA + k / 2.0)
      val pB = (nB + 0.5) / (totB + k / 2.0)
      (bin, nA, nB, math.round((pB - pA) * math.log(pB / pA) * 1e6))
    }
    (terms, terms.map(_._4).sum)
  }

  /** Chi-squared + Cramér's V + Wilson–Hilferty p from exact
    * contingency cells (rowKey, colKey, count) — driver arithmetic on
    * the bounded r×c rollup. Per-cell (O−E)²/E terms micro-quantize
    * before the cross-cell sum so χ² is a pure function of exact
    * int64 counts; the WH cube-root z feeds the same A&S tail
    * (`TsFeatures.normTwoSidedP`) the relevance batteries mirror.
    *
    * Returns (n, r, c, dof, chi2, cramersV, pWH).
    */
  def cramersV(cells: Seq[(String, Long, Long)]): (Long, Long, Long, Long, Double, Double, Double) = {
    val n = cells.map(_._3).sum
    val rt = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val byKey = cells.map { case (rk, ck, o) => (rk, ck) -> o }.toMap
    // densify: a zero cell never comes back from a data rollup, but
    // still contributes (0−E)²/E — skipping it understates χ².
    // (.toSeq matters: Map.keys is a Set at runtime, and a Set-built
    // for-comprehension would DEDUPLICATE equal χ² terms)
    val micro = (for (rk <- rt.keys.toSeq; ck <- ct.keys.toSeq) yield {
      val o = byKey.getOrElse((rk, ck), 0L)
      val e = rt(rk).toDouble * ct(ck) / n
      math.round((o - e) * (o - e) / e * 1e6)
    }).sum
    val chi2 = micro / 1e6
    val (nr, nc) = (rt.size.toLong, ct.size.toLong)
    val dof = (nr - 1) * (nc - 1)
    val minrc = math.min(nr - 1, nc - 1)
    val v = math.sqrt(chi2 / (n.toDouble * minrc))
    val z = (math.cbrt(chi2 / dof) - (1.0 - 2.0 / (9.0 * dof))) /
      math.sqrt(2.0 / (9.0 * dof))
    val p = if (z >= 0) TsFeatures.normTwoSidedP(z) / 2
      else 1.0 - TsFeatures.normTwoSidedP(-z) / 2
    (n, nr, nc, dof, chi2, v, p)
  }

  /** Mutual information (nats) + normalized MI between two categorical
    * columns from the same exact contingency cells as [[cramersV]] —
    * the information-theoretic association measure (detects ANY
    * dependence, where χ² is a second-order test). Zero cells
    * contribute 0 (the p·ln p limit); every term is a fixed-op-order
    * double function of exact int64 counts, micro-quantized before its
    * order-free sum; NMI = MI/√(H_row·H_col) with both entropies on
    * the same discipline.
    *
    * Returns (n, miMicro, hRowMicro, hColMicro) — all int64 micro
    * sums so callers (and the oracle) derive MI/NMI identically.
    */
  def mutualInfo(cells: Seq[(String, Long, Long)]): (Long, Long, Long, Long) = {
    val n = cells.map(_._3).sum
    val rt = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val mi = cells.map { case (rk, ck, o) =>
      if (o == 0) 0L
      else {
        val pij = o.toDouble / n
        val pi = rt(rk).toDouble / n
        val pj = ct(ck).toDouble / n
        math.round(pij * math.log(pij / (pi * pj)) * 1e6)
      }
    }.sum
    def entropy(tot: Iterable[Long]): Long = tot.toSeq.map { c =>
      if (c == 0) 0L
      else {
        val p = c.toDouble / n
        math.round(-p * math.log(p) * 1e6)
      }
    }.sum
    (n, mi, entropy(rt.values), entropy(ct.values))
  }

  /** Two-feature OLS with intercept by Cramer's rule on the exact
    * normal-equation sums (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y,
    * Σx₂y, Σy²) — fixed-op-order double arithmetic an external engine
    * replays term for term. Returns (b0, b1, b2, r²); R² uses the
    * optimum identity SSE = Σy² − bᵀXᵀy.
    */
  def ols2(n: Double, s1: Double, s2: Double, sy: Double, s11: Double,
      s12: Double, s22: Double, s1y: Double, s2y: Double, syy: Double): (Double, Double, Double, Double) = {
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val sst = syy - sy * sy / n
    (b0, b1, b2, 1.0 - sse / sst)
  }
}
