package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pii, Retrieval}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopK matches hand-computed smooth-idf scores and tie order") {
    val docs = Seq((1L, "b a b"), (2L, "b c"), (3L, "c c d")).toDF("id", "text")
    val out = Retrieval.tfidfTopK(docs, "id", "text", k = 2)
      .orderBy("id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    def idf(df: Long) = math.log(4.0 / (df + 1)) + 1.0
    // doc 1: b tf=2 df=2, a tf=1 df=1 → both kept (k=2)
    assert(out.contains((1L, "b", 2L, 2L, 2 * idf(2))))
    assert(out.contains((1L, "a", 1L, 1L, idf(1))))
    // doc 2: b and c (tf=1 each, df=2 each) tie → both kept, order by term
    assert(out.contains((2L, "b", 1L, 2L, idf(2))))
    assert(out.contains((2L, "c", 1L, 2L, idf(2))))
    // doc 3: c tf=2 beats d tf=1
    assert(out.contains((3L, "c", 2L, 2L, 2 * idf(2))))
    assert(out.contains((3L, "d", 1L, 1L, idf(1))))
    assert(out.length == 6)
  }

  test("tfidf top-k keeps exactly k with the (score desc, term) tie rule") {
    val docs = Seq((1L, "a b c d e")).toDF("id", "text")
    val out = Retrieval.tfidfTopK(docs, "id", "text", k = 3)
      .orderBy("term").collect().map(_.getString(1))
    // all scores tie (tf=1, df=1) → first 3 terms alphabetically
    assert(out.toSeq == Seq("a", "b", "c"))
  }

  test("bm25 matches a hand-computed score on a 3-doc corpus") {
    val docs = Seq((1L, "x x y"), (2L, "y z"), (3L, "z z z z")).toDF("id", "text")
    val out = Retrieval.bm25(docs, "id", "text", Seq("x"), k1 = 1.2, b = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // N=3 docs, avgdl = (3+2+4)/3 = 3; x: df=1, tf=2 in doc 1, dl=3
    val idf = math.log(1.0 + (3.0 - 1 + 0.5) / (1 + 0.5))
    val raw = idf * (2 * (1.2 + 1)) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))
    val want = BigDecimal(raw * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong / 1e6
    assert(out == Seq((1L, 1L, want)))
  }

  test("bm25 multi-term scores sum matched terms only") {
    val docs = Seq((1L, "x y q"), (2L, "q q")).toDF("id", "text")
    val out = Retrieval.bm25(docs, "id", "text", Seq("x", "y", "z"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L)) // doc 1 matches x and y; doc 2 nothing
  }

  test("Pii.scan counts and redacts all four classes without recursion") {
    val df = Seq(
      (1L, "reach me at jo.doe+x@mail.example.org or 555-123-4567 ok"),
      (2L, "server 192.168.1.17 ssn 123-45-6789"),
      (3L, "clean text, nothing here 12-34")).toDF("id", "t")
    val out = Pii.scan(df, "t").orderBy("id").collect()
    assert(out(0).getInt(2) == 1 && out(0).getInt(3) == 1) // email + phone
    assert(out(0).getString(6) == "reach me at [EMAIL] or [PHONE] ok")
    assert(out(1).getInt(4) == 1 && out(1).getInt(5) == 1) // ip + ssn
    assert(out(1).getString(6) == "server [IP] ssn [SSN]")
    assert(out(2).getInt(2) + out(2).getInt(3) + out(2).getInt(4) +
      out(2).getInt(5) == 0)
    assert(out(2).getString(6) == "clean text, nothing here 12-34")
  }

  test("Pii class patterns are mutually exclusive on each other's shapes") {
    val df = Seq(
      (1L, "phone 555-123-4567"), // 3-3-4: phone only
      (2L, "ssn 555-12-4567"),    // 3-2-4: ssn only
      (3L, "ip 10.42.0.7")).toDF("id", "t")
    val out = Pii.counts(df, "t").orderBy("id").collect()
    assert(out(0).getInt(3) == 1 && out(0).getInt(5) == 0)
    assert(out(1).getInt(3) == 0 && out(1).getInt(5) == 1)
    assert(out(2).getInt(4) == 1 && out(2).getInt(3) == 0)
  }
}
