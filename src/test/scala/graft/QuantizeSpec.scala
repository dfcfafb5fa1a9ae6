package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantize, Skew}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8Report matches hand-computed codes and errors") {
    // dim 0: [0, 10] → scale 10/255; dim 1 constant → code 0, err 0
    val df = Seq(Seq(0.0, 5.0), Seq(10.0, 5.0), Seq(2.5, 5.0)).toDF("v")
    val out = Quantize.int8Report(df, "v").orderBy("dim").collect()
    val scale = 10.0 / 255.0
    // x=2.5: code = round(2.5/scale) = round(63.75) = 64; recon = 64*scale
    val err25 = math.abs(2.5 - 64 * scale)
    assert(out(0).getInt(0) == 0)
    assert(out(0).getDouble(1) == 0.0 && out(0).getDouble(2) == 10.0)
    val meanWant = BigDecimal(math.floor(err25 * 1e6 + 0.5) / 1e6 / 3)
      .setScale(10, BigDecimal.RoundingMode.DOWN)
    assert(math.abs(out(0).getDouble(3) - err25 / 3) < 1e-6,
      s"mean ${out(0).getDouble(3)} vs ${err25 / 3}")
    assert(math.abs(out(0).getDouble(4) - err25) < 1e-6)
    assert(out(0).getLong(5) == 2L) // 0 and 10 sit on the rails
    // constant dim: everything zero except the rail count (all code 0)
    assert(out(1).getDouble(3) == 0.0 && out(1).getDouble(4) == 0.0)
    assert(out(1).getLong(5) == 3L)
  }

  test("int8Report max error is bounded by half a step") {
    val e = Tables.embeddings(spark, sf)
    val out = Quantize.int8Report(e, "embedding").collect()
    out.foreach { r =>
      val step = (r.getDouble(2) - r.getDouble(1)) / 255.0
      // + 5e-7: the report rounds errors to 6 dp, which can round UP
      // past the true half-step bound by at most half an ulp of 1e-6
      assert(r.getDouble(4) <= step / 2 + 5e-7,
        s"dim ${r.getInt(0)}: max err ${r.getDouble(4)} > half step ${step / 2}")
    }
    assert(out.length == 64)
  }

  test("skewReport surfaces the heavy key with the right factors") {
    val df = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"k$i")).toDF("k")
    val out = Skew.skewReport(df, "k", topK = 3).collect()
    assert(out(0).getString(0) == "hot")
    assert(out(0).getLong(1) == 60L)
    assert(out(0).getDouble(2) == 0.6) // share of 100 rows
    assert(out(0).getDouble(3) == 60.0 * 41 / 100) // skew vs mean, 41 keys
    // remaining rows are singleton keys in key order
    assert(out(1).getLong(1) == 1L && out(2).getLong(1) == 1L)
  }
}
