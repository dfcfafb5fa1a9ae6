package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Asymmetric containment semantics: a full copy inside a wrapper
  * scores ~1.0 in the contained direction while Jaccard shrinks with
  * the size ratio.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val body = (1 to 30).map(i => s"w$i").mkString(" ")

  test("full copy inside a wrapper: containment ~1.0, asymmetric") {
    val docs = Seq(
      (1L, body, "en"),
      (2L, s"header alpha beta gamma $body footer delta epsilon", "en"),
      (3L, "totally unrelated content words here nothing shared at all", "en"),
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
      blockCols = Seq("lang"), shingleK = 3, threshold = 0.9)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    // every 3-gram of the body appears in the wrapper -> contain_a = 1.0
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    // the wrapper has extra shingles -> contain_b strictly below 1
    assert(r.getDouble(3) < 1.0)
  }

  test("containment pairs are partitioning-independent") {
    val docs = Seq(
      (1L, body, "en"),
      (2L, s"x y z $body p q r", "en"),
    ).toDF("doc_id", "text", "lang")
    val a = Dedup.ngramContainmentPairs(docs, "doc_id", "text", Seq("lang"), 3, 0.9)
      .collect().map(_.toSeq).toSet
    val b = Dedup.ngramContainmentPairs(docs.repartition(5), "doc_id", "text", Seq("lang"), 3, 0.9)
      .collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }
}
