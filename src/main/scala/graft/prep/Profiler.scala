package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column profiling — the pass every preprocessing run starts with:
  * per column, row/null/distinct counts and min/max (numeric and
  * string kept in SEPARATELY TYPED columns — double-to-string
  * formatting is engine-specific, so a profile that stringifies
  * numerics cannot be checked against a second engine).
  *
  * Scale shape: ONE aggregation over the frame computes every
  * column's stats; exact `count_distinct` plans an Expand (one
  * shuffle, fine up to tens of columns). At very large scale pass
  * `approxDistinct = true` to swap in the HLL++ sketch
  * (`approx_count_distinct`) — same single-pass plan, bounded
  * executor memory, no Expand multiplication.
  * Output: one row per column (column, n_rows, n_nulls, n_distinct,
  * min_num, max_num, min_str, max_str).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val schema = df.schema
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      val dist =
        if (approxDistinct) approx_count_distinct(col(c))
        else count_distinct(col(c))
      val (minN, maxN, minS, maxS) = schema(c).dataType match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case StringType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)), max(col(c)))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(col(c)).cast("string"), max(col(c)).cast("string"))
      }
      Seq(count(col(c)).as(s"${c}__n"), dist.as(s"${c}__d"),
        minN.as(s"${c}__minn"), maxN.as(s"${c}__maxn"),
        minS.as(s"${c}__mins"), maxS.as(s"${c}__maxs"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one summary row → long form, pure column expressions
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"${c}__n")).as("n_nulls"),
        col(s"${c}__d").as("n_distinct"),
        col(s"${c}__minn").as("min_num"), col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"), col(s"${c}__maxs").as("max_str"))
    }: _*)
    one.select(explode(rows).as("p")).select(col("p.*"))
  }
}
