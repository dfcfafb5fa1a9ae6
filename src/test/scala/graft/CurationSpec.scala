package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Urls}

/** The r12 curation-stage operators: URL canonicalization/dedup,
  * sentence dedup with reconstruction, and mixture sampling — hand
  * fixtures pinning semantics the DuckDB oracles replay at corpus
  * scale.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalUrl strips scheme, www, tracking tails, and trailing slash") {
    val cases = Seq(
      "https://Site3.Example.com/p/7?utm_source=x" -> "site3.example.com/p/7",
      "HTTP://www.site3.example.com/p/7/" -> "site3.example.com/p/7",
      "http://site3.example.com/p/7#frag" -> "site3.example.com/p/7",
      // www only strips as a LEADING label — a www-named host keeps it
      "https://wwwhost.example.com/a" -> "wwwhost.example.com/a",
      // canonicalization is idempotent
      "site3.example.com/p/7" -> "site3.example.com/p/7")
    val got = cases.map(_._1).toDF("u")
      .select(Urls.canonicalUrl(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("dedupByUrl keeps the first id per canonical key with variant counts") {
    val d = Seq(
      (1L, "https://a.example.com/x?utm=1"),
      (2L, "http://www.a.example.com/x/"),
      (3L, "https://b.example.com/y"),
      (4L, "HTTPS://A.example.com/x")).toDF("id", "url")
    val out = Urls.dedupByUrl(d, "id", "url").collect()
      .map(r => r.getString(1) -> ((r.getLong(0), r.getLong(2)))).toMap
    assert(out === Map(
      "a.example.com/x" -> ((1L, 3L)),
      "b.example.com/y" -> ((3L, 1L))))
  }

  test("sentenceDedup keeps first occurrences and reassembles in order") {
    val d = Seq(
      (1L, "alpha one. shared boilerplate. beta two"),
      (2L, "gamma three. shared boilerplate. delta four"),
      (3L, "shared boilerplate")).toDF("id", "text")
    val out = Dedup.sentenceDedup(d, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 1 keeps everything (first occurrence of the boilerplate);
    // docs 2 and 3 lose it; doc 3 cleans to empty
    assert(out(1L) === ((3L, 3L, "alpha one. shared boilerplate. beta two")))
    assert(out(2L) === ((3L, 2L, "gamma three. delta four")))
    assert(out(3L) === ((1L, 0L, "")))
  }

  test("sentenceDedup: a doc ingested twice under one id keeps each sentence once") {
    // identical duplicate rows must not double n_kept or duplicate
    // sentences in cleaned (the join-back is deduped before joining)
    val d = Seq((1L, "a one. b two"), (1L, "a one. b two"),
      (2L, "c three")).toDF("id", "text")
    val out = Dedup.sentenceDedup(d, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // n_sents counts raw exploded rows (4 for the doubled doc); kept
    // sentences appear once each in original order
    assert(out(1L) === ((4L, 2L, "a one. b two")))
    assert(out(2L) === ((1L, 1L, "c three")))
  }

  test("sentenceDedup winner selection is a window-free aggregate (boilerplate skew safe)") {
    // corpus-wide boilerplate makes a sentence-partitioned window
    // maximally hot; the operator must pick winners with a map-side
    // combinable min-struct aggregate instead — no Window node anywhere
    val d = Seq((1L, "a. shared. b"), (2L, "c. shared. d")).toDF("id", "text")
    val plan = Dedup.sentenceDedup(d, "id", "text")
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"sentenceDedup regressed to a window plan:\n$plan")
  }

  test("mixtureSample hits integer quotas, truncates, and is partition-stable") {
    val d = (0L until 200L).map(i =>
      (i, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c"))
      .toDF("id", "cls") // a: 50, b: 50, c: 100
    val out = Sampling.mixtureSample(d, "cls", "id",
      Seq("a" -> 6L, "c" -> 4L), den = 10L, total = 100L)
    val byCls = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quota a = 60 truncates at the class size 50; c = 40; b dropped
    assert(byCls === Map("a" -> 50L, "c" -> 40L))
    // membership is deterministic under any partitioning
    val again = Sampling.mixtureSample(d.repartition(7), "cls", "id",
      Seq("a" -> 6L, "c" -> 4L), den = 10L, total = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(again === out.collect().map(_.getLong(0)).toSet)
  }

  test("aspect buckets agree with a brute-force argmin and tie to the lower index") {
    import graft.operators.Multimodal
    val media = Seq((1L, "image", 100, 200), (2L, "image", 300, 300),
      (3L, "image", 400, 300), (4L, "image", 500, 250),
      (5L, "image", 424, 424), // exact tie candidates stay bucket-stable
      (6L, "video", 999, 1)) // non-image rows drop
      .toDF("media_id", "kind", "width", "height")
    val castD = (s: String) => s"cast($s as double)"
    var cur = media.where(col("kind") === "image")
      .select(col("media_id"), col("width"), col("height"))
    for (k <- Multimodal.AspectBuckets.indices)
      cur = cur.withColumn(s"s$k", expr(Multimodal.aspectScoreSql(k, castD)))
    val got = cur.withColumn("bucket", expr(Multimodal.aspectBucketSql))
      .select(col("media_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def brute(w: Int, h: Int): Int = {
      val scores = Multimodal.AspectBuckets
        .map(b => math.abs(math.log(w.toDouble / h) - math.log(b)))
      scores.indexOf(scores.min) // indexOf = first minimum = lower index
    }
    assert(got === Map(1L -> brute(100, 200), 2L -> brute(300, 300),
      3L -> brute(400, 300), 4L -> brute(500, 250), 5L -> brute(424, 424)))
    assert(got(2L) === 2) // square image -> the 1.0 bucket
  }

  test("dp counts: noise is deterministic, zero at no displacement, bounded by the tail") {
    val out = SparkEntry.queries("q_dp_counts")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length === 25)
    out.foreach { case (_, n, noise, noisy) =>
      // noisy = true + noise exactly, and the ε=1 Laplace tail bound:
      // |noise| = |ln(1 - 2|u - 1/2|)| <= ln(65537/2) for h16 uniforms
      assert(math.abs(noisy - (n + noise)) < 1e-12)
      assert(math.abs(noise) <= math.log(65537.0 / 2.0) + 1e-9)
    }
    // deterministic: a second run produces the identical release
    val again = SparkEntry.queries("q_dp_counts")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(2))).toMap
    out.foreach { case (k, _, noise, _) => assert(again(k) === noise) }
  }

  test("ivm delete state equals the recompute without the deleted rows") {
    // signed-multiplicity retraction on a hand corpus
    val ev = Seq((1L, "c", 1.25), (2L, "c", 2.5), (13L, "c", 4.0),
      (26L, "p", 8.0), (3L, "p", 0.5)).toDF("event_id", "event_type", "value")
      .select(col("event_type"), col("event_id"),
        round(col("value") * lit(1e6)).cast("long").as("vm"))
    def partial(df: org.apache.spark.sql.DataFrame, sign: Int) =
      df.groupBy(col("event_type"))
        .agg((count(lit(1)) * sign).as("n"), (sum(col("vm")) * sign).as("sv"))
    val got = partial(ev, 1)
      .unionAll(partial(ev.where(col("event_id") % 13 === 0), -1))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("c" -> ((2L, 3750000L)), "p" -> ((1L, 500000L))))
  }
}
