package graft

import org.apache.spark.sql.functions._
import graft.operators.Decompose

/** Seasonal decomposition and rolling-z anomaly scoring: planted
  * pattern recovery, edge behavior, and partitioning independence.
  */
class DecomposeSpec extends SparkSpec {
  import spark.implicits._

  private val dayNs = 86400000000000L

  /** One event per day per key so the daily total IS the value. */
  private def dailyDF(vals: Seq[Double], key: String = "u1") =
    vals.zipWithIndex.map { case (v, i) => (key, i.toLong * dayNs, v) }
      .toDF("user_id", "ts", "value")

  test("seasonal: pure period-7 pattern is recovered exactly") {
    // y = phase pattern (zero-mean) + constant level; 35 days = 5 cycles
    val pattern = Seq(3.0, -1.0, 0.5, -2.0, 1.0, -0.5, -1.0)
    val level = 10.0
    val vals = (0 until 35).map(i => level + pattern(i % 7))
    val out = Decompose.seasonal(dailyDF(vals), "user_id", "ts", "value")
      .orderBy("bucket").collect()
    assert(out.length === 35)
    // trend defined exactly where the centered 7-window fits
    assert(out.take(3).forall(_.isNullAt(3)) && out.takeRight(3).forall(_.isNullAt(3)))
    // on a pure periodic signal the trend is the level and the
    // seasonal component is the zero-mean pattern; resid ~ 0
    out.drop(3).dropRight(3).foreach { r =>
      assert(math.abs(r.getDouble(3) - level) < 1e-6)
      assert(math.abs(r.getDouble(5)) < 1e-6)
    }
    out.foreach { r =>
      val phase = (out.indexOf(r)) % 7
      assert(math.abs(r.getDouble(4) - pattern(phase)) < 1e-6)
    }
  }

  test("seasonal: decomposition is partitioning-independent") {
    val vals = (0 until 28).map(i => 5.0 + (i % 7) * 0.7 + i * 0.1)
    val df = dailyDF(vals)
    val a = Decompose.seasonal(df, "user_id", "ts", "value")
      .orderBy("bucket").collect().toSeq
    val b = Decompose.seasonal(df.repartition(7), "user_id", "ts", "value")
      .orderBy("bucket").collect().toSeq
    assert(a === b)
  }

  test("seasonal: short series (< period interior points) has null trend everywhere") {
    val out = Decompose.seasonal(dailyDF(Seq(1.0, 2.0, 3.0, 4.0)), "user_id", "ts", "value")
      .collect()
    assert(out.length === 4)
    assert(out.forall(_.isNullAt(3)))
  }

  test("rollingZ: planted outlier is flagged, calm history is not") {
    val calm = Seq.fill(20)(10.0)
    // history variance comes from a small alternating wiggle
    val hist = calm.zipWithIndex.map { case (v, i) => v + (if (i % 2 == 0) 0.5 else -0.5) }
    val vals = hist :+ 50.0 :+ 10.0
    val df = vals.zipWithIndex.map { case (v, i) => ("u1", i.toLong, v) }
      .toDF("user_id", "ts", "value")
    val out = Decompose.rollingZ(df, "user_id", "ts", "value").orderBy("ts").collect()
    // first minN-1 rows: no score
    assert(out.take(8).forall(_.isNullAt(3)))
    val spike = out(20)
    assert(spike.getInt(4) === 1, "planted 50.0 spike must be flagged")
    assert(spike.getDouble(3) > 10.0)
    // the row after the spike: history now contains the spike, and the
    // return to 10.0 is NOT anomalous at |z|>3 (spike inflates sigma)
    assert(out(21).getInt(4) === 0)
  }

  test("rollingZ: zero-variance history yields null z, not a crash") {
    val df = (0 until 12).map(i => ("u1", i.toLong, 7.0)).toDF("user_id", "ts", "value")
    val out = Decompose.rollingZ(df, "user_id", "ts", "value").collect()
    assert(out.forall(_.isNullAt(3)))
  }

  test("seasonalStrength: pure seasonal series ~1, aperiodic series low") {
    val pattern = Seq(3.0, -1.0, 0.5, -2.0, 1.0, -0.5, -1.0)
    val seasonal = (0 until 42).map(i => 10.0 + pattern(i % 7))
    val fSeasonal = Decompose.seasonalStrength(
      Decompose.seasonal(dailyDF(seasonal), "user_id", "ts", "value"), "user_id")
      .collect().head.getDouble(2)
    assert(fSeasonal > 0.99, s"pure period-7 signal must score ~1, got $fSeasonal")
    // alternating period-2 signal: period-7 phases see it as noise
    val aperiodic = (0 until 42).map(i => 10.0 + (if (i % 2 == 0) 1.0 else -1.0))
    val fNoise = Decompose.seasonalStrength(
      Decompose.seasonal(dailyDF(aperiodic), "user_id", "ts", "value"), "user_id")
      .collect().head.getDouble(2)
    assert(fNoise < 0.5, s"period-2 signal under period-7 phases must score low, got $fNoise")
  }

  test("rollingZ: one-step-ahead (current row excluded from its own window)") {
    // constant history then a jump: the jump's z uses only the calm
    // history, so it is large; with the row included it would shrink
    val vals = (0 until 15).map(i => 5.0 + (if (i % 2 == 0) 0.1 else -0.1)) :+ 100.0
    val df = vals.zipWithIndex.map { case (v, i) => ("u1", i.toLong, v) }
      .toDF("user_id", "ts", "value")
    val last = Decompose.rollingZ(df, "user_id", "ts", "value")
      .orderBy("ts").collect().last
    assert(last.getDouble(3) > 100.0)
  }
}
