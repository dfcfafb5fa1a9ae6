package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the fold-based dot and handles nulls") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
    ).toDF("a", "b")
    val r = df.select(GraftFunctions.dot($"a", $"b")).collect()
    assert(r(0).getDouble(0) == 32.0)
    assert(r(1).isNullAt(0))
    val fold = df.na.drop().select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .head().getDouble(0)
    assert(fold == 32.0)
  }

  test("MinHashSignature equals the per-permutation transform formula") {
    val (as, bs) = graft.functions.MinHash.coeffs(8, 42L)
    val df = Seq(Seq(17L, 985L, 12345L)).toDF("hs")
    val got = df.select(GraftFunctions.minhashSignature($"hs", 8, 42L))
      .head().getSeq[Long](0)
    val want = (0 until 8).map { j =>
      Seq(17L, 985L, 12345L)
        .map(h => (as(j) * h + bs(j)) % graft.functions.MinHash.MersennePrime).min
    }
    assert(got == want)
  }

  test("expressions survive whole-stage codegen on a real plan") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val r = e.select(GraftFunctions.dot($"v", $"v").as("sq")).agg(min("sq")).head()
    assert(r.getDouble(0) > 0.0)
  }

  test("SQL registration: graft_dot and graft_minhash callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
    val m = spark.sql("SELECT graft_minhash(array(17L, 985L), 8, 42L) AS s")
      .head().getSeq[Long](0)
    assert(m.size == 8)
  }
}
