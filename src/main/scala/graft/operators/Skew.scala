package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation. A groupBy on a low-cardinality or
  * skewed key concentrates each key's rows in one reduce task; with 6
  * distinct keys and 1000 executors, 994 sit idle. Salting splits each
  * key into `saltBuckets` deterministic sub-keys (hash of a unique
  * column — NOT rand(), which breaks retry determinism), partially
  * aggregates per (key, salt), then merges the partials in a second,
  * tiny shuffle of `keys x saltBuckets` rows.
  */
object Skew {

  /** sum/count/min/max/avg of `valueCols` grouped by `keyCols`,
    * two-stage salted. `uniqueCol` seeds the salt.
    */
  def saltedAgg(
      df: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
      uniqueCol: String, saltBuckets: Int = 64): DataFrame = {

    val salted = df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(saltBuckets)))
    val partialAggs = valueCols.flatMap { v =>
      Seq(sum(col(v)).as(s"__sum_$v"), count(col(v)).as(s"__cnt_$v"),
        min(col(v)).as(s"__min_$v"), max(col(v)).as(s"__max_$v"))
    }
    val partial = salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = valueCols.flatMap { v =>
      Seq(
        sum(col(s"__sum_$v")).as(s"sum_$v"),
        sum(col(s"__cnt_$v")).as(s"cnt_$v"),
        min(col(s"__min_$v")).as(s"min_$v"),
        max(col(s"__max_$v")).as(s"max_$v"),
        (sum(col(s"__sum_$v")) / sum(col(s"__cnt_$v"))).as(s"avg_$v"),
      )
    }
    partial.groupBy(keyCols.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-resistant equi-join: salt the (big, skewed) probe side with a
    * deterministic hash of `uniqueCol` and replicate the small build
    * side once per salt bucket, so one hot key's rows spread over
    * `saltBuckets` reduce tasks instead of piling onto one. The join on
    * (key, salt) returns exactly the plain-join result; build-side cost
    * is |small| × saltBuckets rows — use for genuinely small dims, or
    * AQE skew-join for fact-fact.
    */
  /** Key-skew diagnostic — the measurement that decides WHETHER to
    * reach for [[saltedAgg]]/[[saltedJoin]] before a 100 TB run: the
    * top-k heaviest keys with their corpus share and skew-vs-mean
    * factor (count · n_keys / total — 1.0 = perfectly uniform; the
    * salting guides in SURVEY §12 trigger at ~16×). One map-side-
    * combined groupBy on the key plus a TakeOrderedAndProject top-k —
    * never a global sort, never a second pass.
    */
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val t = counts.agg(sum(col("cnt")), count(lit(1))).head()
    val (total, nKeys) = (t.getLong(0), t.getLong(1))
    counts
      .withColumn("share", col("cnt").cast("double") / lit(total.toDouble))
      .withColumn("skew_vs_mean",
        col("cnt").cast("double") * lit(nKeys.toDouble) / lit(total.toDouble))
      .orderBy(col("cnt").desc, col(key))
      .limit(topK)
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, saltBuckets: Int = 64): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
