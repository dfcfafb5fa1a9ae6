package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Rank

class RankSpec extends SparkSpec {
  import spark.implicits._

  test("distributed percent_rank equals the window percent_rank, incl. ties") {
    val df = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 8.0, 3.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Rank.withPercentRank(df, "v", "pr")
      .select("id", "pr").as[(Long, Double)].collect().toMap
    val want = df.select($"id", percent_rank().over(Window.orderBy($"v")).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(got == want)
  }

  test("distributed row_number equals the window row_number over a total order") {
    val df = Seq((3L, 5.0), (1L, 1.0), (7L, 3.0), (4L, 3.0), (9L, 2.0),
      (2L, 8.0), (6L, 3.0), (8L, 1.0)).toDF("id", "v")
    val got = Rank.withRowNumber(df, Seq($"v".asc, $"id".asc), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df.select($"id",
      row_number().over(Window.orderBy($"v", $"id")).cast("long").as("rn"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // descending key direction flows through repartitionByRange too
    val gotD = Rank.withRowNumber(df, Seq($"v".desc, $"id".asc), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val wantD = df.select($"id",
      row_number().over(Window.orderBy($"v".desc, $"id")).cast("long").as("rn"))
      .as[(Long, Long)].collect().toMap
    assert(gotD == wantD)
  }

  test("single row ranks 0.0") {
    val df = Seq((1L, 42.0)).toDF("id", "v")
    val r = Rank.withPercentRank(df, "v", "pr").select("pr").as[Double].collect()
    assert(r.toSeq == Seq(0.0))
  }

  test("rank plan stays in Tungsten — no external-row RDD conversion") {
    val df = spark.range(2000).select($"id",
      (($"id" * 48271L) % 997).cast("double").as("v"))
    val ranked = Rank.withPercentRank(df, "v", "pr")
    ranked.collect() // finalize THIS adaptive plan so codegen spans print
    val plan = ranked.queryExecution.executedPlan.toString
    // the sequence/rank derivation is codegen projections + hash
    // aggregate/join ("*(n)" = a whole-stage-codegen stage in the
    // finalized adaptive plan); an external Row round-trip would show
    // the object-serialization operators
    assert(plan.contains("*("), plan)
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("SerializeFromObject"), plan)
  }

  test("rank is correct at 10k rows (AQE may coalesce small outputs)") {
    val df = spark.range(10000).select($"id",
      (($"id" * 2654435761L) % 10007).cast("double").as("v"))
    val ranked = Rank.withPercentRank(df, "v", "pr")
    val minMax = ranked.agg(min("pr"), max("pr")).head()
    assert(minMax.getDouble(0) == 0.0 && minMax.getDouble(1) == 1.0)
    // spot-check: pr of value v == (#smaller)/(n-1)
    val some = ranked.where($"v" === 5000.0).select("pr").as[Double].head()
    val smaller = df.where($"v" < 5000.0).count()
    assert(math.abs(some - smaller.toDouble / 9999) < 1e-12)
  }
}
