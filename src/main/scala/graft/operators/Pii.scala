package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass an LLM training-data
  * pipeline runs before anything leaves the curation boundary. Four
  * pattern classes (email, NANP-style phone, IPv4, SSN-shaped ids) as
  * pure regex column expressions: narrow, codegen, zero shuffle at
  * any scale, and every pattern stays inside the RE2 ∩ Java-regex
  * common subset (no lookaround, no backreferences) so the DuckDB
  * oracle replays detection and redaction verbatim.
  *
  * Redaction order is fixed (email → phone → IP → SSN); replacement
  * tokens contain no digits or '@'/'.', so later patterns can never
  * match inside an earlier replacement.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  private def nMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Per-row match counts for the four classes. */
  def counts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_email", nMatches(col(textCol), EmailRe))
      .withColumn("n_phone", nMatches(col(textCol), PhoneRe))
      .withColumn("n_ip", nMatches(col(textCol), Ipv4Re))
      .withColumn("n_ssn", nMatches(col(textCol), SsnRe))

  /** Redacted text: every match replaced with its class token. The
    * IP pass runs BEFORE the phone/SSN passes would matter for dotted
    * digit runs, but the classes are disjoint by construction
    * (hyphen-grouped vs dot-grouped), so order only matters for the
    * no-recursive-match property documented above.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "[EMAIL]")
    val p = regexp_replace(e, PhoneRe, "[PHONE]")
    val i = regexp_replace(p, Ipv4Re, "[IP]")
    regexp_replace(i, SsnRe, "[SSN]")
  }

  /** counts + redaction in one pass. */
  def scan(df: DataFrame, textCol: String): DataFrame =
    counts(df, textCol).withColumn("redacted", redact(col(textCol)))
}
