package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits exactly (hand-checked values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
    val out = df.select(ZOrder.morton2(col("a"), col("b"))).collect()
      .map(_.getLong(0))
    // (1,0) → bit 0; (0,1) → bit 1; (3,5) → a bits at 0,2; b bits at 1,5
    // a=3: 0b11 → even positions 0,2 → 0b101 = 5
    // b=5: 0b101 → odd positions 1,5 → 0b100010 = 34; 5|34 = 39
    assert(out(0) == 0L)
    assert(out(1) == 1L)
    assert(out(2) == 2L)
    assert(out(3) == 39L)
    assert(out(4) == (1L << 32) - 1) // all 32 bits set
  }

  test("locality report: z-order envelopes are compact on BOTH axes") {
    // uniform grid over two independent dimensions
    val df = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong * 1000, b.toLong * 7)).toDF("x", "y")
    val out = ZOrder.localityReport(df, "x", "y", buckets = 16).collect()
    val n = out.map(_.getLong(1)).sum
    assert(n == 64L * 64)
    // every bucket's rank envelope must span far less than the full
    // 16-bit range in BOTH dims — the property a single-column sort
    // cannot give (its second dimension spans the whole range)
    out.foreach { r =>
      val aSpan = r.getLong(3) - r.getLong(2)
      val bSpan = r.getLong(5) - r.getLong(4)
      assert(aSpan <= 65535 / 2, s"bucket ${r.getLong(0)}: a span $aSpan")
      assert(bSpan <= 65535 / 2, s"bucket ${r.getLong(0)}: b span $bSpan")
    }
  }

  test("locality report is partitioning-independent and covers all rows") {
    val df = (1 to 5000).map(i => (i.toLong * 31 % 997, i.toLong * 17 % 4999))
      .toDF("x", "y")
    val a = ZOrder.localityReport(df.coalesce(1), "x", "y")
      .orderBy("bucket").collect().map(_.toString)
    val b = ZOrder.localityReport(df.repartition(8), "x", "y")
      .orderBy("bucket").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
