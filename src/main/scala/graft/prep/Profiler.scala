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
  * `approxDistinct = true` to swap in the DETERMINISTIC HLL sketch
  * ([[graft.functions.HllAgg]], md5-register construction — the same
  * externally-replayable register file as `q_hll_distinct`'s oracle,
  * unlike `approx_count_distinct`'s xxhash64 HLL++ which no second
  * engine can replay) — same single-pass plan, one m-byte state per
  * column, no Expand multiplication.
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
        if (approxDistinct) {
          import org.apache.spark.sql.graft.ColumnBridge
          // hashing stays declarative (md5 of the string cast) so the
          // register file is replayable by the q_hll_distinct oracle SQL
          round(ColumnBridge.column(graft.functions.HllAgg(
            ColumnBridge.expression(md5(col(c).cast("string"))))
            .toAggregateExpression()), 0).cast("long")
        } else count_distinct(col(c))
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
