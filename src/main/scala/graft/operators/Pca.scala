package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gram-matrix accumulation and a PCA power-iteration step over an
  * embedding column — the dimensionality-reduction primitives a
  * training-data pipeline runs before whitening / projecting a 100 TB
  * vector corpus.
  *
  * Scale design: a [[graft.functions.GramAgg]] TypedImperativeAggregate
  * accumulates the whole gram IN ONE ≤ d² long-array buffer per
  * partition — each input row is d(d+1)/2 in-place adds, no generator
  * rows, no per-pair hash-aggregate probes (the previous double
  * posexplode plan paid d² = 4096 materialized rows + aggregate
  * updates PER INPUT ROW — ~4×10¹² updates at 10⁹ rows; this shape
  * pays ~2×10¹² in-place long adds and shuffles one ~33 KB buffer per
  * partition). Gram matrices from disjoint shards still merge by cell
  * addition, and nothing downstream of the scan ever shuffles
  * row-sized data. The matvec/normalize of a power step touch only
  * the d² cells and a d-vector — driver-free, all relational.
  *
  * Exactness (the repo's oracle protocol): coordinates quantize to
  * integer micro-units (the [[ExactAgg]] convention), so cell sums are
  * exact integers, the matvec against an integer seed vector is an
  * exact integer, and the only double arithmetic is the final
  * normalize — one correctly-rounded int→double conversion, one sqrt,
  * one divide on bit-identical inputs in both engines.
  */
object Pca {

  /** v → round(v·1e6) per coordinate (exact int64 micro-units). */
  private def microVec(v: Column): Column =
    transform(v, x => round(x * lit(1e6), 0).cast("long"))

  /** Exact gram cells (i, j, g): g = halfUp(Σ_rows mᵢ·mⱼ / 1e6), an
    * exact integer in 1e-6 units of Σ xᵢ·xⱼ. `upperOnly` emits the
    * i ≤ j triangle (the symmetric half); the full matrix feeds the
    * matvec. Products stay well inside int64 (|m| ≲ 1e6 ⇒ |mᵢ·mⱼ| ≲
    * 1e12); the cell sum rides decimal(38,0) so shard merges never
    * overflow.
    */
  def gramCells(df: DataFrame, vecCol: String,
                upperOnly: Boolean): DataFrame = {
    val m = df.select(microVec(col(vecCol).cast("array<double>")).as("mv"))
    // fit-boundary probe for the dimension (one 1-row job, like the
    // range-join min/max): the aggregate's buffer layout needs d
    val d = m.select(size(col("mv"))).first().getInt(0)
    import org.apache.spark.sql.graft.ColumnBridge
    val gram = ColumnBridge.column(
      graft.functions.GramAgg(ColumnBridge.expression(col("mv")), d, upperOnly)
        .toAggregateExpression())
    m.agg(gram.as("cells"))
      .select(inline(col("cells")))
      // half-up /1e6 in pure int64 (OracleExact.microAvgSql's
      // (2s + d) // 2d arithmetic) — the decimal cell total re-casts to
      // long first; 2·|raw| stays far inside int64 at any per-shard
      // size, and `div` (truncating integer division on the
      // non-negative branch operand) matches DuckDB's `//` exactly
      .withColumn("raw", col("rawd").cast("long"))
      .withColumn("g",
        when(col("raw") >= 0, expr("(2 * raw + 1000000) div 2000000"))
          .otherwise(-expr("(-2 * raw + 1000000) div 2000000")))
      .select("i", "j", "g")
  }

  /** One power-iteration step v₁ = normalize(G·v₀) from the full gram
    * cells, with the deterministic integer seed v₀(j) = 1 + (j mod 7).
    * y = G·v₀ is an exact int64; ‖y‖² rides decimal (y² overflows
    * int64) and comes back to the driver as ONE scalar (a bounded
    * fit-boundary collect — a crossJoin would plan the nested-loop
    * shape PlanGuardSpec forbids); the final divide is the only
    * double op.
    */
  def powerStep(gram: DataFrame): DataFrame = {
    val y = gram
      .withColumn("w", lit(1) + pmod(col("j"), lit(7)))
      .groupBy("i")
      .agg(sum(col("g") * col("w")).as("y"))
      .localCheckpoint(eager = false)
    val norm2 = y.agg(
      sum((col("y").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)"))
        .cast("double").as("n2"))
      .collect()(0).getDouble(0)
    require(norm2 > 0, "powerStep: zero gram matvec — degenerate input")
    y.select(col("i").as("dim"),
      round(col("y").cast("double") / lit(math.sqrt(norm2)), 6).as("v1"))
  }
}
