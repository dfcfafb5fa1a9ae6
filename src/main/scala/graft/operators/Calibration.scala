package graft.operators

/** Isotonic (PAV) calibration over k-bounded bin statistics.
  *
  * The scale contract mirrors the scaler fits (reference
  * preprocessor.py:214-259 collects quantile grids the same way): the
  * ONLY data-scale pass is a map-side-combined groupBy producing k
  * (weight, positives) integer pairs; the pool-adjacent-violators
  * solve is O(k³) driver arithmetic on those exact longs — fit state,
  * not data — and the fitted curve is a k-row broadcastable table.
  * This is the standard shape for probability calibration at corpus
  * scale (bin the scores, PAV the bin rates): sklearn's
  * `IsotonicRegression` on raw points is a per-point fit that cannot
  * distribute, while binned PAV loses nothing when downstream
  * consumers bucket scores anyway.
  *
  * Exactness: every pooled mean is (Σy)/(Σw) of exact int64 sums; the
  * max-min solve compares the resulting doubles, which both engines
  * derive from the identical (num, den) integer pairs — so a DuckDB
  * replay of the same formula is bit-identical before the final 6-dp
  * round.
  */
object Calibration {

  /** Weighted PAV via the minimax identity
    * iso(i) = max_{j<=i} min_{k>=i} mean(y[j..k]) — O(k³) on k bins,
    * exact because every segment mean is a single division of two
    * int64 prefix-sum differences. Bins must be in ascending x order.
    */
  def pav(weights: IndexedSeq[Long], positives: IndexedSeq[Long]): IndexedSeq[Double] = {
    require(weights.length == positives.length, "weights/positives length mismatch")
    val n = weights.length
    val wPre = weights.scanLeft(0L)(_ + _) // wPre(i) = Σ w[0..i-1]
    val sPre = positives.scanLeft(0L)(_ + _)
    def seg(j: Int, k: Int): Double = // mean of bins j..k inclusive
      (sPre(k + 1) - sPre(j)).toDouble / (wPre(k + 1) - wPre(j)).toDouble
    (0 until n).map { i =>
      (0 to i).map { j =>
        (i until n).map(k => seg(j, k)).min
      }.max
    }
  }
}
