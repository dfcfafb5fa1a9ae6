package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Skew}

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right at-or-before, null when none") {
    val left = Seq(("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 5L, "c"), ("u2", 9L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(("u1", 7L, 1.0), ("u1", 10L, 2.0), ("u1", 15L, 3.0), ("u3", 1L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("tag"), Seq("v"))
      .orderBy("k", "ts").collect()
    // u1@5 -> none; u1@10 -> right@10 (inclusive); u1@20 -> right@15; u2@9 -> none
    assert(out(0).getString(2) == "c" && out(0).isNullAt(3))
    assert(out(1).getString(2) == "a" && out(1).getDouble(3) == 2.0)
    assert(out(2).getString(2) == "b" && out(2).getDouble(3) == 3.0)
    assert(out(3).getString(2) == "d" && out(3).isNullAt(3))
  }

  test("salted agg equals plain groupBy exactly") {
    val df = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity",
        ($"l_orderkey" * 8 + $"l_linenumber").as("uk"))
    val salted = Skew.saltedAgg(df, Seq("l_returnflag"), Seq("l_quantity"), "uk")
      .select($"l_returnflag", $"sum_l_quantity", $"cnt_l_quantity",
        $"min_l_quantity", $"max_l_quantity")
      .collect().map(_.toSeq).toSet
    val plain = df.groupBy($"l_returnflag")
      .agg(sum($"l_quantity"), count($"l_quantity"), min($"l_quantity"), max($"l_quantity"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salted partials spread each key over many salt buckets") {
    val df = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity",
        ($"l_orderkey" * 8 + $"l_linenumber").as("uk"))
      .withColumn("__salt", pmod(xxhash64($"uk"), lit(64)))
    val buckets = df.groupBy("l_returnflag").agg(countDistinct("__salt").as("n"))
      .agg(min("n")).head().getLong(0)
    assert(buckets > 32, s"expected keys spread over >32 salt buckets, got $buckets")
  }
}
