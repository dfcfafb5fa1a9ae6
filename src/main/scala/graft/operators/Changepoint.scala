package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline single-changepoint detection per series — the CUSUM /
  * binary-segmentation split statistic max_i |S_i − (i/n)·S_n| over
  * the order-sorted prefix sums (Page 1954; the split step of binary
  * segmentation, Scott & Knott 1974).
  *
  * Exactness: values micro-quantize to int64 (round(v·1e6), the
  * ExactAgg convention) and the argmax compares the INTEGER numerator
  * N_i = |n·S_i − i·S_n| (the ×n-scaled deviation), so the winning
  * split index is a pure integer computation no float tie can flip
  * between engines; ties resolve to the smallest i. The reported
  * magnitude N_max/(n·1e6) divides exact integers once, at emission.
  *
  * Scale: ONE hash Exchange on the series key — the prefix-sum
  * window, the whole-partition aggregates, and the rank all share the
  * partition key. int64 headroom: n·S_i ≤ len²·max|v|·1e6 (5.5e12 at
  * sf0.1); ≫1e6-point series would shift the same formula to
  * decimal(38). Series need n ≥ 2 (no interior split otherwise).
  */
object Changepoint {

  def cusum(df: DataFrame, keyCol: String, orderCol: String,
            valueCol: String): DataFrame = {
    val key: Column = col(keyCol)
    val e = df.select(key, col(orderCol).as("__ord"),
      round(col(valueCol) * 1e6, 0).cast("long").as("mu"))
    val wOrd = Window.partitionBy(key).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    val cum = e.select(key,
      row_number().over(Window.partitionBy(key).orderBy(col("__ord"))).as("i"),
      sum(col("mu")).over(wOrd).as("s_i"),
      count(lit(1)).over(wAll).as("n"),
      sum(col("mu")).over(wAll).as("s_n"))
    val d = cum.where(col("i") < col("n"))
      .withColumn("nd", abs(col("n") * col("s_i") - col("i") * col("s_n")))
    val wRank = Window.partitionBy(key).orderBy(col("nd").desc, col("i"))
    d.withColumn("rn", row_number().over(wRank)).where(col("rn") === 1)
      .select(key, col("n"), col("i").as("cp_index"),
        round(col("nd").cast("double") / (col("n") * lit(1000000L)), 6)
          .as("cusum"))
  }
}
