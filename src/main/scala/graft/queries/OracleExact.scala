package graft.queries

/** DuckDB-side mirrors of [[graft.operators.ExactAgg]] — the
  * engine-portable exact aggregation arithmetic. Every query whose
  * Spark plan uses ExactAgg must build its oracle from these so both
  * engines run the IDENTICAL formula.
  */
private[queries] object OracleExact {

  /** exact decimal(28,6) sum → double (mirror of ExactAgg.decSum). */
  def decSumSql(e: String): String = s"sum(($e)::DECIMAL(28,6))::DOUBLE"

  /** half-up integer-microunit mean (mirror of ExactAgg.microAvg). */
  def microAvgSql(e: String): String = {
    val s = s"sum(round(($e) * 1000000)::BIGINT)::BIGINT"
    val n = s"count($e)"
    s"((CASE WHEN $s >= 0 THEN (2 * $s + $n) // (2 * $n) " +
      s"ELSE -((-2 * $s + $n) // (2 * $n)) END) / 1000000.0)"
  }

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
}
