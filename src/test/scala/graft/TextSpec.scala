package graft

import graft.operators.TextAnalysis

class TextSpec extends SparkSpec {

  test("class balancing equalizes every class at the minority size, deterministically") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val minN = docs.groupBy("lang").count()
      .agg(min("count")).head().getLong(0)
    val bal = graft.operators.Sampling.balanceClasses(docs, "lang", "doc_id")
    val sizes = bal.groupBy("lang").count().collect().map(_.getLong(1)).toSet
    assert(sizes == Set(minN))
    // deterministic: a second run selects the identical rows
    val again = graft.operators.Sampling.balanceClasses(docs, "lang", "doc_id")
    assert(bal.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
  }
  test("stratified k-fold deals every class evenly (±1) and is deterministic") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val k = 5
    val folds = graft.operators.Sampling.stratifiedKFold(docs, "lang", "doc_id", k)
    // every (class, fold) cell within 1 of the class's n/k
    val bad = folds.groupBy("lang", "fold").count()
      .groupBy("lang").agg(max("count").as("mx"), min("count").as("mn"))
      .filter(col("mx") - col("mn") > 1).count()
    assert(bad == 0L)
    assert(folds.select("fold").distinct().count() == k)
    // deterministic: identical assignment on a second run
    val again = graft.operators.Sampling.stratifiedKFold(docs, "lang", "doc_id", k)
    assert(folds.exceptAll(again).isEmpty && again.exceptAll(folds).isEmpty)
  }

  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("BPE training: hand-checked greedy merges and monotone compression") {
    // the classic fixture: low x5, lower x2, newest x6, widest x3.
    // Round-1 pair counts put (e,s) and (s,t) at 9 — the (count desc,
    // pair asc) tie-break picks (e,s); after (es,t) wins round 2, the
    // 7-count tie between (l,o) and (o,w) resolves to (l,o); round 4
    // merges (lo,w). All four verified by hand.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "c")
    val m = graft.queries.TextQueries.bpeTrain(spark, words, 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
    // merge counts never increase round over round (a new pair around
    // the merged symbol can match but not exceed the merged count)
    val real = graft.queries.TextQueries.textBpeTrain.run(spark, sf)
      .orderBy("step").collect().map(_.getLong(3))
    assert(real.length == 5 && real.forall(_ > 0))
    assert(real.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("token counts: whitespace, regex, char estimate") {
    val df = Seq("the quick brown fox", "hello, world! 42").toDF("t")
    val r = df.select(
      TextAnalysis.wsTokens($"t"),
      TextAnalysis.regexTokens($"t"),
      TextAnalysis.charEstimateTokens($"t")).collect()
    assert(r(0).getInt(0) == 4 && r(0).getInt(1) == 4)
    assert(r(1).getInt(0) == 3)
    assert(r(1).getInt(1) == 5) // hello , world ! 42
    assert(r(0).getLong(2) == math.ceil(19 / 4.0).toLong)
  }

  test("quality signals on a known sentence") {
    val df = Seq("the cat, the hat!").toDF("t")
    val r = df.select(
      TextAnalysis.punctRatio($"t"),
      TextAnalysis.stopwordRatio($"t"),
      TextAnalysis.meanWordLen($"t"),
      TextAnalysis.alphaRatio($"t")).collect()(0)
    assert(math.abs(r.getDouble(0) - 2.0 / 17) < 1e-9)   // , and !
    assert(math.abs(r.getDouble(1) - 2.0 / 4) < 1e-9)    // the, the
    assert(math.abs(r.getDouble(2) - 14.0 / 4) < 1e-9)   // chars in ws-words
    assert(math.abs(r.getDouble(3) - 12.0 / 17) < 1e-9)
  }

  test("langId picks the language with most markers; ties -> code order") {
    val df = Seq("der hund und die katze ist hier", "the dog and the cat is here")
      .toDF("t")
    val r = df.select(TextAnalysis.langId($"t")).collect()
    assert(r(0).getStruct(0).getString(0) == "de")
    assert(r(1).getStruct(0).getString(0) == "en")
  }

  test("winnowCount: deterministic, bounded by gram count, 0 for short text") {
    val df = Seq("abcdefghijklmnop", "abc").toDF("t")
    val r = df.select(TextAnalysis.winnowCount($"t", 5, 4)).collect()
    val n = r(0).getInt(0)
    assert(n >= 1 && n <= 12) // 12 5-grams
    assert(r(1).getInt(0) == 0)
    val r2 = df.select(TextAnalysis.winnowCount($"t", 5, 4)).collect()
    assert(r2(0).getInt(0) == n)
  }
}
