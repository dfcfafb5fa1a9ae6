package graft

import org.apache.spark.sql.functions._
import graft.functions.{GramAgg, GramBuffer}
import graft.operators.Pca

/** GramAgg (the d²-state gram aggregate replacing the posexplode plan)
  * and the Pca operators built on it.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def bruteGram(vecs: Seq[Seq[Double]], upperOnly: Boolean): Map[(Int, Int), Long] = {
    val micro = vecs.map(_.map(x => math.round(x * 1e6)))
    val d = vecs.head.size
    (for {
      i <- 0 until d
      j <- (if (upperOnly) i else 0) until d
    } yield {
      val raw = micro.map(m => m(i) * m(j)).sum
      val g = if (raw >= 0) (2 * raw + 1000000) / 2000000
      else -((-2 * raw + 1000000) / 2000000)
      (i, j) -> g
    }).toMap
  }

  private val vecs = Seq(
    Seq(1.5, -2.25, 0.000001, 3.0),
    Seq(-0.5, 0.75, 1.0, -1.0),
    Seq(2.0, 2.0, -3.5, 0.5),
    Seq(0.0, -1.25, 0.25, 4.75))

  test("gramCells (upper triangle) matches the brute-force exact gram") {
    val df = vecs.toDF("v")
    val got = Pca.gramCells(df, "v", upperOnly = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == bruteGram(vecs, upperOnly = true))
    assert(got.size == 4 * 5 / 2)
  }

  test("gramCells (full) matches brute force and is symmetric") {
    val df = vecs.toDF("v")
    val got = Pca.gramCells(df, "v", upperOnly = false)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == bruteGram(vecs, upperOnly = false))
    for (i <- 0 until 4; j <- 0 until 4) assert(got((i, j)) == got((j, i)))
  }

  test("gram aggregation is partitioning-independent (merge path exercised)") {
    val df = vecs.toDF("v")
    val one = Pca.gramCells(df.coalesce(1), "v", upperOnly = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val many = Pca.gramCells(df.repartition(7), "v", upperOnly = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(one == many)
  }

  test("null vector elements contribute nothing (explode-plan parity)") {
    val df = Seq(
      Seq[java.lang.Double](1.0, null, 2.0),
      Seq[java.lang.Double](3.0, 4.0, 5.0)).toDF("v")
    val got = Pca.gramCells(df, "v", upperOnly = true)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // g is in 1e-6 units of Σ xᵢxⱼ
    // cell (0,1): only row 2 contributes 3*4 = 12 (row 1's null kills it)
    assert(got((0, 1)) == 12000000L)
    // cell (0,0): 1*1 + 3*3 = 10
    assert(got((0, 0)) == 10000000L)
    // cell (1,1): only row 2: 16
    assert(got((1, 1)) == 16000000L)
  }

  test("GramBuffer spills to the BigInt tier past the int64 partial bound") {
    val buf = new GramBuffer(1)
    val big = Long.MaxValue / 2 - 5
    // two adds each below the spill threshold, sum far above it
    buf.add(0, big)
    buf.add(0, big)
    buf.add(0, big)
    assert(buf.cellTotal(0) == BigInt(big) * 3)
    // merge keeps exactness across the spill boundary
    val other = new GramBuffer(1)
    other.add(0, big)
    buf.mergeIn(other)
    assert(buf.cellTotal(0) == BigInt(big) * 4)
  }

  test("GramAgg serialize/deserialize roundtrips both tiers") {
    val agg = GramAgg(org.apache.spark.sql.graft.ColumnBridge
      .expression(col("x")), d = 2, upperOnly = true)
    val buf = new GramBuffer(3)
    buf.add(0, 42L)
    buf.add(1, Long.MaxValue / 2 - 1)
    buf.add(1, Long.MaxValue / 2 - 1) // forces the spill
    buf.add(2, -7L)
    val back = agg.deserialize(agg.serialize(buf))
    assert((0 until 3).forall(i => back.cellTotal(i) == buf.cellTotal(i)))
  }

  test("powerStep returns the normalized matvec on a hand-checked gram") {
    // 2x2 identity-ish gram: cells in micro units of Σxᵢxⱼ
    val gram = Seq((0, 0, 2000000L), (0, 1, 0L), (1, 0, 0L), (1, 1, 500000L))
      .toDF("i", "j", "g")
    // seed v0(j) = 1 + (j mod 7) = (1, 2); y = (2e6, 1e6); ‖y‖ = sqrt(5)*1e6
    val out = Pca.powerStep(gram).orderBy("dim").collect()
    // 2/sqrt(5) = 0.8944271909..., 1/sqrt(5) = 0.4472135954... at 6 dp
    assert(out(0).getDouble(1) == 0.894427)
    assert(out(1).getDouble(1) == 0.447214)
  }
}
