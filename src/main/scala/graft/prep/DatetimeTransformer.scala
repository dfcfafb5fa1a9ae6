package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Datetime feature handling (reference: utils/datetime_transformer.py).
  * Datetimes become epoch SECONDS as double (reference divides the
  * microsecond timestamp by 1e6, datetime_transformer.py:51), get
  * scaled like any numerical column, and invert back to timestamps /
  * the original string format.
  *
  * String-format inference samples `sampleRows` rows on the driver —
  * a metadata-sized probe (reference samples 100, :65) — after which
  * parsing is a pure `to_timestamp` expression at any scale.
  */
object DatetimeTransformer {

  /** Candidate formats, most-specific first (datetime_transformer.py:23-36),
    * in Spark's DateTimeFormatter syntax.
    */
  val Formats: Seq[String] = Seq(
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "yyyy-MM",
    "yyyy",
    "HH:mm:ss",
    "HH:mm",
  )

  /** Timestamp/date column -> epoch seconds (double). */
  def toEpochSeconds(c: Column): Column = c.cast(TimestampType).cast(DoubleType)

  /** Epoch seconds -> timestamp. */
  def fromEpochSeconds(c: Column): Column = timestamp_seconds(c)

  /** Epoch seconds -> the original string format. */
  def formatBack(c: Column, fmt: String): Column = date_format(timestamp_seconds(c), fmt)

  /** Pick the first format that parses every non-null sampled value
    * (datetime_transformer.py:37-55). Returns None when the column
    * does not look like datetimes.
    */
  def detectFormat(df: DataFrame, colName: String, sampleRows: Int = 100): Option[String] = {
    val sample = df.select(col(colName)).na.drop().limit(sampleRows)
    val parsed = sample.select(
      Formats.map(f => count(try_to_timestamp(col(colName), lit(f))).as(f)) :+
        count(lit(1)).as("__n"): _*,
    ).head()
    val n = parsed.getAs[Long]("__n")
    if (n == 0) None
    else Formats.find(f => parsed.getAs[Long](f) == n)
  }

  /** Parse a string column with a detected format into a timestamp. */
  def parse(c: Column, fmt: String): Column = try_to_timestamp(c, lit(fmt))
}
