package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality estimation with a DETERMINISTIC,
  * engine-portable hash — the bounded-state answer to "how many
  * distinct keys does this 100 TB column hold".
  *
  * Spark's own `approx_count_distinct` is HLL++ over xxhash64, which
  * no external engine replays; this sketch hashes with md5 (the
  * repo's replayable convention, [[Sampling.hashBucket]] /
  * `OracleExact.h32Sql`) so the register file — and therefore the
  * estimate — is reproduced bit-exactly by the DuckDB oracle.
  *
  * Scale design: values map to (register, rank) pairs and aggregate
  * DIRECTLY on the register id — the groupBy target has exactly `m`
  * keys, so map-side partial `max` collapses every partition to ≤ m
  * rows before a trivial shuffle; register files from disjoint shards
  * merge by pairwise max. No per-value state anywhere, and the input
  * is never shuffled on the value itself.
  *
  * Determinism of the estimate arithmetic: every `2^-M` term is a
  * dyadic rational on a 2^-24 grid and every partial sum stays below
  * 2^9, so the 512-term double sum needs ≤ 33 significand bits —
  * EXACT regardless of association order on both engines. The final
  * α·m²/S (and the small-range m·ln(m/V) branch) are single double
  * operations on identical inputs. 32-bit hash ⇒ the estimator is
  * specified for cardinalities ≪ 2^32 / 30; the large-range
  * correction branch is deliberately out of scope.
  */
object HllSketch {

  /** First 32 bits of md5(value) as a Long in [0, 2^32). */
  def h32(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 8), 16, 10).cast("long")

  /** Register file (j, mr): j = h32 mod m, mr = max over values of
    * rank(h32 div m), rank = 24 − bitlength (24 for a zero word —
    * the hash's remaining 23 bits are the rank word).
    */
  def registers(df: DataFrame, valueCol: String, m: Int = 512): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0 && m <= 65536,
      s"m must be a power of two <= 65536, got $m")
    val h = h32(col(valueCol))
    // h < 2^32 is double-exact and m is a power of two, so the
    // double divide is exact scaling and floor IS the integer div
    val w = floor(h / lit(m)).cast("long")
    val rank = when(w === 0, lit(24))
      .otherwise(lit(24) - length(bin(w)))
    df.where(col(valueCol).isNotNull)
      .select(pmod(h, lit(m)).as("j"), rank.as("r"))
      .groupBy("j").agg(max("r").as("mr"))
  }

  /** Estimate expression from (Σ 2^-mr over present registers, number
    * of empty registers): raw HLL with the standard small-range
    * linear-counting correction — shared by [[estimate]] and [[probe]]
    * so both paths compute the identical arithmetic.
    */
  private def estCol(sPresent: Column, nPresent: Column, m: Int): Column = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val s = sPresent + (lit(m) - nPresent).cast("double")
    val v = lit(m) - nPresent
    when(lit(alpha * m.toDouble * m) / s <= lit(2.5 * m) && v > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")))
      .otherwise(lit(alpha * m.toDouble * m) / s)
  }

  /** One-row estimate from a register file: raw HLL with the standard
    * small-range linear-counting correction (V = empty registers).
    */
  def estimate(reg: DataFrame, m: Int = 512): DataFrame =
    reg.agg(
        sum(pow(lit(2.0), -col("mr"))).as("s_present"),
        count(lit(1)).as("n_present"))
      .select(estCol(col("s_present"), col("n_present"), m).as("est"))

  /** (label, exact distinct, estimate) for one column in ONE table
    * scan and zero driver-side collects: the distinct values flow into
    * the m-key register groupBy carrying a per-register distinct-value
    * count nj, so Σnj IS the exact count and the same 512-row frame
    * yields the estimate — where the previous shape paid two scans per
    * probe (register build + countDistinct) and a fit-boundary collect
    * (r7 VERDICT #5: 8 scans for one 4-row result). The probe shuffles
    * distinct values once — exactly what its exact count already
    * required (countDistinct's partial-distinct shuffle); the pure
    * sketch path ([[registers]]/[[estimate]]) remains value-shuffle-free.
    */
  def probe(df: DataFrame, valueCol: String, label: String,
            m: Int = 512): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0 && m <= 65536,
      s"m must be a power of two <= 65536, got $m")
    val dv = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v")).distinct()
    val h = h32(col("__v"))
    val w = floor(h / lit(m)).cast("long")
    val rank = when(w === 0, lit(24)).otherwise(lit(24) - length(bin(w)))
    dv.select(pmod(h, lit(m)).as("j"), rank.as("r"))
      .groupBy("j")
      .agg(max("r").as("mr"), count(lit(1)).as("nj"))
      .agg(
        sum(pow(lit(2.0), -col("mr"))).as("s_present"),
        count(lit(1)).as("n_present"),
        sum(col("nj")).as("n_exact"))
      .select(lit(label).as("column_name"), col("n_exact"),
        round(estCol(col("s_present"), col("n_present"), m), 6).as("est"))
  }
}
