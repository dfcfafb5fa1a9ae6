package graft.queries

/** DuckDB-side mirrors of [[graft.operators.ExactAgg]] — the
  * engine-portable exact aggregation arithmetic. Every query whose
  * Spark plan uses ExactAgg must build its oracle from these so both
  * engines run the IDENTICAL formula.
  */
private[queries] object OracleExact {

  /** exact decimal(28,6) sum → double (mirror of ExactAgg.decSum). */
  def decSumSql(e: String): String = s"sum(($e)::DECIMAL(28,6))::DOUBLE"

  /** exact decimal sum kept decimal (mirror of ExactAgg.decSumExact —
    * the >9e9-magnitude-safe published form; both engines' sum of
    * DECIMAL(28,6) promotes to DECIMAL(38,6)).
    */
  def decSumExactSql(e: String): String = s"sum(($e)::DECIMAL(28,6))"

  /** half-up integer-microunit mean (mirror of ExactAgg.microAvg). */
  def microAvgSql(e: String): String =
    microQuotientSql(s"sum(round(($e) * 1000000)::BIGINT)::BIGINT", s"count($e)")

  /** half-up s/n in pure int64, returned as double units (mirror of
    * ExactAgg.microQuotient — for callers carrying a precomputed
    * micro-unit sum, e.g. the k-means training loop's fed-forward
    * centroid means). DuckDB `//` truncates toward zero, matching
    * Spark's integer `div`, so the CASE split makes the half-up
    * away-from-zero rule explicit on both engines.
    */
  def microQuotientSql(s: String, n: String): String =
    s"((CASE WHEN ($s) >= 0 THEN (2 * ($s) + ($n)) // (2 * ($n)) " +
      s"ELSE -((-2 * ($s) + ($n)) // (2 * ($n))) END) / 1000000.0)"

  /** First 16 bits of an md5 hex string as a 0..65535 integer —
    * DuckDB mirror of [[graft.operators.Sampling.hashBucket]]
    * (`conv(substring(md5(id), 1, 4), 16, 10)`). Single source of
    * truth for every md5-bucket oracle (hash split, class balance,
    * k-fold, …) so the nibble arithmetic cannot drift between them.
    * `hx` must be an expression yielding the md5 hex string.
    */
  def h16Sql(hx: String): String =
    s"((strpos('0123456789abcdef', substr($hx, 1, 1)) - 1) * 4096" +
      s" + (strpos('0123456789abcdef', substr($hx, 2, 1)) - 1) * 256" +
      s" + (strpos('0123456789abcdef', substr($hx, 3, 1)) - 1) * 16" +
      s" + (strpos('0123456789abcdef', substr($hx, 4, 1)) - 1))"

  /** First 32 bits of an md5 hex string as a 0..2^32−1 BIGINT — the
    * 8-nibble extension of [[h16Sql]], mirror of
    * [[graft.operators.HllSketch.h32]].
    */
  def h32Sql(hx: String): String =
    (1 to 8).map { i =>
      val p = 1L << (4 * (8 - i))
      s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1)::BIGINT * $p"
    }.mkString("(", " + ", ")")

  /** Two-sided normal tail 2·(1−Φ(at)) via the A&S 26.2.17 rational
    * approximation — the mirror of `TsFeatures.normTwoSidedP` (same
    * Horner order and constants). `at` must be a non-negative
    * expression; single source of truth so the relevance oracles'
    * p-values cannot drift from the Scala side or each other.
    */
  def phiTailSql(at: String): String =
    s"2.0 * (exp(-($at) * ($at) / 2) / sqrt(2 * pi())) * " +
      s"((1.0 / (1.0 + 0.2316419 * ($at))) * (0.319381530 + " +
      s"(1.0 / (1.0 + 0.2316419 * ($at))) * (-0.356563782 + " +
      s"(1.0 / (1.0 + 0.2316419 * ($at))) * (1.781477937 + " +
      s"(1.0 / (1.0 + 0.2316419 * ($at))) * (-1.821255978 + " +
      s"(1.0 / (1.0 + 0.2316419 * ($at))) * 1.330274429)))))"

  /** Benjamini–Hochberg rank CTEs over a (feature, p) relation `src`:
    * emits `ranked`/`mm`/`ks` so the final SELECT can apply the kept
    * rule `CASE WHEN (SELECT k FROM ks) = 0 THEN true ELSE rk <= k`
    * (keep-all fallback included). Mirror of `TsFeatures.bhKeep`.
    */
  def bhCtesSql(src: String, featCol: String, alpha: Double = 0.05): String =
    s"""ranked AS (
        SELECT $featCol AS feature, p, row_number() OVER (ORDER BY p, $featCol) AS rk
        FROM $src),
      mm AS (SELECT count(*) AS m FROM $src),
      ks AS (
        SELECT coalesce(max(CASE WHEN p <= rk * $alpha / mm.m THEN rk END), 0) AS k
        FROM ranked, mm)"""
}
