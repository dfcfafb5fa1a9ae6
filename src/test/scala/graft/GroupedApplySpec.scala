package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.GroupedApply

class GroupedApplySpec extends SparkSpec {
  import spark.implicits._

  private val outSchema = StructType(Seq(
    StructField("k", StringType), StructField("pos", LongType),
    StructField("v", DoubleType)))

  test("groups arrive sorted and keyed; output equals the window formulation") {
    val df = Seq(("b", 3L, 30.0), ("a", 2L, 2.0), ("a", 1L, 1.0), ("b", 1L, 10.0),
      ("b", 2L, 20.0)).toDF("k", "ts", "v")
    val out = GroupedApply(df, Seq("k"), Seq("ts"), outSchema) { (key, it) =>
      var pos = 0L
      it.map { r =>
        pos += 1
        Row(key.getString(0), pos, r.getDouble(2))
      }
    }
    val got = out.collect().map(_.toSeq).toSet
    val want = df.select($"k",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"ts")).cast("long").as("pos"), $"v")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("per-group state never leaks across groups") {
    val df = Seq(("a", 1L, 1.0), ("b", 1L, 5.0), ("a", 2L, 1.0), ("b", 2L, 5.0))
      .toDF("k", "ts", "v")
    val out = GroupedApply(df, Seq("k"), Seq("ts"), outSchema) { (key, it) =>
      var cum = 0.0
      it.map { r => cum += r.getDouble(2); Row(key.getString(0), 0L, cum) }
    }
    val sums = out.groupBy("k").agg(max("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums == Map("a" -> 2.0, "b" -> 10.0))
  }

  test("grouped apply plans one shuffle on the key") {
    val df = Seq(("a", 1L, 1.0)).toDF("k", "ts", "v")
    val out = GroupedApply(df, Seq("k"), Seq("ts"), outSchema) { (key, it) =>
      it.map(r => Row(key.getString(0), 0L, r.getDouble(2)))
    }
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
