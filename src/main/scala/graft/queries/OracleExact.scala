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
}
