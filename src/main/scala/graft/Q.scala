package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exercise: a Spark query over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names and float rounding must agree between the two — the
  * driver sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)
