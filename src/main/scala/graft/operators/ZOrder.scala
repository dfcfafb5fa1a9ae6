package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key over two columns — the multi-
  * dimensional LAYOUT optimization (Delta/Iceberg `OPTIMIZE ZORDER`
  * class) that makes range predicates on EITHER column prune files at
  * 100 TB: rows sort by the bit-interleaved key, so a file's min/max
  * envelope is compact in both dimensions at once, where a
  * single-column sort leaves the second dimension unpruned.
  *
  * Everything is exact integer arithmetic (rank quantization by
  * integer division, bit spreading by shift/mask magic numbers), so
  * the key — and the per-bucket locality report — replays bit-for-bit
  * in the DuckDB oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of x to the even bit positions (0, 2, …,
    * 30) — the classic shift/mask ladder, exact on int64.
    */
  def spread16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton interleave of two 16-bit quantized ranks (a in the
    * even bits, b in the odd bits).
    */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Per-bucket locality report: quantize both (integer) columns to
    * 16-bit ranks (integer `div` — a double divide on 2^60-scale
    * nanos can mis-rank boundary values vs an exact-integer engine),
    * Morton-interleave, split the key space into `buckets` equal
    * ranges (the file boundaries a z-ordered write would produce),
    * and emit each bucket's row count + min/max rank envelope in BOTH
    * dimensions. Compact envelopes on both axes are the property that
    * makes two-sided pruning work; the oracle replays key and report
    * exactly.
    */
  def localityReport(df: DataFrame, colA: String, colB: String,
                     buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (mnA, mxA, mnB, mxB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val stepA = (mxA - mnA) / 65536L + 1L
    val stepB = (mxB - mnB) / 65536L + 1L
    val keyStep = (1L << 32) / buckets
    df.select(
        expr(s"(cast($colA as long) - ${mnA}L) div ${stepA}L").as("qa"),
        expr(s"(cast($colB as long) - ${mnB}L) div ${stepB}L").as("qb"))
      .withColumn("zkey", morton2(col("qa"), col("qb")))
      .withColumn("bucket", expr(s"zkey div ${keyStep}L"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("qa")).as("qa_min"), max(col("qa")).as("qa_max"),
        min(col("qb")).as("qb_min"), max(col("qb")).as("qb_max"))
  }
}
