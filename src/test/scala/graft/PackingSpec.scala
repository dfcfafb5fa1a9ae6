package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {

  private def layout = Tables.documents(spark, sf).select(
    col("doc_id"),
    pmod(col("doc_id"), lit(32)).as("shard"),
    graft.operators.TextAnalysis.wsTokens(col("text")).cast("long").as("tokens"))

  test("FFD packs within capacity (overflow singletons excepted) and is deterministic") {
    val ffd = Packing.packFFD(layout, "doc_id", "tokens", "shard", capacity = 512L)
    val fills = ffd.groupBy("shard", "pack_id")
      .agg(sum("tokens").as("fill"), count(lit(1)).as("n")).collect()
    assert(fills.nonEmpty)
    fills.foreach { r =>
      assert(r.getLong(2) <= 512L || r.getLong(3) == 1L,
        s"overfull multi-doc bin: $r")
    }
    val again = Packing.packFFD(layout, "doc_id", "tokens", "shard", capacity = 512L)
    assert(ffd.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
  }

  test("FFD waste fraction never exceeds the running-sum packer's") {
    val cap = 512L
    val ffd = Packing.packFFD(layout, "doc_id", "tokens", "shard", cap)
    // the running-sum twin — identical to the registered text_pack plan
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val run = layout.withColumn("cum", sum(col("tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("tokens"),
        expr(s"(cum - tokens) div $cap").as("pack_id"))
    val ffdWaste = Packing.wasteFraction(ffd, "tokens", "shard", "pack_id", cap)
    val runWaste = Packing.wasteFraction(run, "tokens", "shard", "pack_id", cap)
    assert(ffdWaste <= runWaste, s"FFD $ffdWaste > running-sum $runWaste")
    info(f"waste: FFD $ffdWaste%.4f vs running-sum $runWaste%.4f")
  }
}
