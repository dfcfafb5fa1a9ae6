package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch
import graft.streaming.StreamOps

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch quantiles stay within half a geometric bucket of the rank value") {
    val e = Tables.events(spark, sf).select($"user_id", $"value")
    val est = QuantileSketch.profile(e, "user_id", "value",
      Seq("p50" -> 0.5, "p95" -> 0.95))
      .select($"user_id", $"p50", $"p95")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the sketch's selection rule is ceil-rank (first cum >= q·n), so
    // the comparison target is the ceil-rank ORDER STATISTIC — an
    // interpolated percentile can sit a whole inter-sample gap away in
    // a sparse tail
    val byUser = e.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def rankStat(xs: Array[Double], q: Double): Double =
      xs(math.ceil(q * xs.length).toInt - 1)
    assert(est.nonEmpty && est.keySet == byUser.keySet)
    est.foreach { case (uid, (e50, e95)) =>
      val xs = byUser(uid)
      val (x50, x95) = (rankStat(xs, 0.5), rankStat(xs, 0.95))
      // mid-bucket representative of the bucket CONTAINING the rank
      // value: relative error ≤ half a γ=1.1 bucket (~5%)
      assert(math.abs(e50 - x50) <= 0.05 * math.abs(x50) + 1e-9,
        s"user $uid p50: sketch=$e50 rank-stat=$x50")
      assert(math.abs(e95 - x95) <= 0.05 * math.abs(x95) + 1e-9,
        s"user $uid p95: sketch=$e95 rank-stat=$x95")
    }
  }

  test("streaming quantile profile snapshot equals the batch sketch") {
    val snap = StreamOps.runToBatch(spark,
      StreamOps.quantileProfileUpdate(StreamOps.eventsStream(spark, sf)).toDF(),
      mode = "update")
    val streamed = snap.groupBy($"user_id")
      .agg(max_by(struct($"n", $"p50", $"p95"), $"n").as("s"))
      .select($"user_id", $"s.n", $"s.p50", $"s.p95")
      .collect().map(_.toSeq).toSet
    val batch = QuantileSketch.profile(
      Tables.events(spark, sf).select($"user_id", $"value"),
      "user_id", "value", Seq("p50" -> 0.5, "p95" -> 0.95))
      .select($"user_id", $"n", $"p50", $"p95")
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("negative, zero, and sub-unit values bucket on the signed grid") {
    val vals = Seq(-250.0, -0.04, 0.0, 0.03, 17.0)
    vals.foreach { v =>
      val r = QuantileSketch.repOf(v)
      if (v == 0) assert(r == 0.0)
      else {
        assert(math.signum(r) == math.signum(v))
        // representative within half a bucket: |ln(r/v)| <= ln(γ)/2... plus
        // the floor offset — bound by one full bucket
        assert(math.abs(math.log(math.abs(r) / math.abs(v))) <= QuantileSketch.LnGamma,
          s"v=$v rep=$r")
      }
    }
    // merge-order independence: fold in two different orders
    val xs = Seq(1.0, 2.0, -3.0, 0.5, 2.0, 8.0, 0.0)
    def sketch(vs: Seq[Double]): Map[Double, Long] =
      vs.groupBy(QuantileSketch.repOf).map { case (k, g) => k -> g.size.toLong }
    assert(sketch(xs) == sketch(xs.reverse))
    assert(QuantileSketch.select(sketch(xs), 0.5) ==
      QuantileSketch.select(sketch(xs.reverse), 0.5))
  }
}
