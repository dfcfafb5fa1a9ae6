package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** A-ES weighted sampling: structural guarantees + determinism. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 200).map { i =>
    (if (i % 2 == 0) "a" else "b", i.toLong, if (i <= 20) 100.0 else 1.0)
  }.toDF("cls", "id", "w")

  test("exactly k rows per stratum, deterministic under repartitioning") {
    val a = Sampling.weightedSample(df, "cls", "id", "w", 7)
      .orderBy("cls", "rk").collect().toSeq
    val b = Sampling.weightedSample(df.repartition(13), "cls", "id", "w", 7)
      .orderBy("cls", "rk").collect().toSeq
    assert(a === b)
    assert(a.count(_.getString(0) == "a") === 7)
    assert(a.count(_.getString(0) == "b") === 7)
  }

  test("heavy weights dominate the draw (100x weight on ids 1-20)") {
    val out = Sampling.weightedSample(df, "cls", "id", "w", 5).collect()
    // 10 heavy rows per class vs 90 light at 100:1 odds — the top-5
    // should be mostly heavy ids; require a strict majority to keep
    // the assertion robust to the fixed md5 draw
    val heavy = out.count(_.getLong(1) <= 20)
    assert(heavy >= 7, s"expected most of 10 sampled rows heavy, got $heavy")
  }
}
