package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation. All
  * selection derives from md5 of the row id: no RNG state, stable
  * under any partitioning/re-run, and an external SQL engine replays
  * the exact selection (the property `sample()` can never give).
  */
object Sampling {

  /** First 16 bits of md5(id) as a 0..65535 bucket — the shared
    * deterministic "randomness" (same construction the IVF centroid
    * sampling and hash split use).
    */
  def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

  /** Class balancing: downsample every class to the MINORITY class
    * size, keeping each class's lowest-hash rows — a deterministic,
    * reproducible balanced corpus. One aggregation for the class
    * counts (bounded by class cardinality), one per-class window rank
    * on (hash, id). The per-class window shuffles on the class key; at
    * extreme per-class row counts swap the exact rank for a hash
    * THRESHOLD (keep iff bucket < 65536·m/n_class): same distribution,
    * approximate size, no rank sort.
    */
  /** Stratified k-fold assignment: within each class, rows ranked by
    * (hash bucket, id) deal round-robin into k folds, so every fold
    * carries an equal (±1) share of every class — deterministic
    * cross-validation splits with no RNG and no global shuffle beyond
    * the per-class window. Replayable by rank arithmetic in SQL.
    */
  def stratifiedKFold(df: DataFrame, classCol: String, idCol: String,
                      k: Int): DataFrame = {
    require(k > 1, s"k-fold needs k > 1, got $k")
    val w = Window.partitionBy(col(classCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("fold",
      pmod(row_number().over(w) - 1, lit(k)).cast("long"))
  }

  def balanceClasses(df: DataFrame, classCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.get(0) -> r.getLong(1))
    require(counts.nonEmpty, "no classes to balance")
    val m = counts.map(_._2).min
    val w = Window.partitionBy(col(classCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= m)
      .drop("__rk")
  }

  /** Deterministic MIXTURE sampling — the target-proportion curation
    * draw (the data-mixture/DoReMi shape: "40% en, 20% zh, …"): keep
    * the hash-rank top k_c = total·num_c div den rows of each class,
    * so the kept corpus approaches the target mixture exactly up to
    * class exhaustion (a class smaller than its quota contributes all
    * its rows — the rank cap is free). Weights are integer rationals
    * and k_c is pure int64 arithmetic, so an external engine replays
    * the exact draw; membership is md5-deterministic like
    * [[balanceClasses]]. Classes absent from `weights` drop (weight
    * 0). At extreme class cardinality swap the per-class rank for the
    * threshold filter ([[balanceClassesThreshold]]'s no-sort path).
    */
  def mixtureSample(df: DataFrame, classCol: String, idCol: String,
                    weights: Seq[(String, Long)], den: Long,
                    total: Long): DataFrame = {
    require(weights.nonEmpty && den > 0 && total >= 0,
      s"mixtureSample needs weights, den > 0, total >= 0")
    val kc = weights.foldLeft(lit(null).cast("long")) { case (acc, (cls, num)) =>
      when(col(classCol) <=> lit(cls), lit(total * num / den)).otherwise(acc)
    }
    val w = Window.partitionBy(col(classCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("__k", kc).where(col("__k").isNotNull)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= col("__k"))
      .drop("__k", "__rk")
  }

  /** Hash-THRESHOLD class balancing — the extreme-cardinality variant
    * [[balanceClasses]] documents: keep a row iff its 16-bit hash
    * bucket < ⌊65536·m/n_class⌋. No per-class rank/window at all —
    * one bounded class-count aggregation, a BROADCAST of #classes
    * thresholds, and a narrow filter, so a class with 10¹⁰ rows never
    * pays a per-class sort. Kept size is ≈ m per class (binomial
    * around the target) rather than exactly m; membership stays
    * deterministic and an external engine replays it exactly.
    */
  def balanceClassesThreshold(df: DataFrame, classCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.get(0) -> r.getLong(1))
    require(counts.nonEmpty, "no classes to balance")
    val m = counts.map(_._2).min
    // The per-class threshold as a TYPED literal when-chain compared
    // null-safely against the ORIGINAL column — never a join on a
    // toString rendering, whose formatting can differ from Spark's
    // string cast (timestamps, dates, some decimals) and would then
    // silently drop the whole class. `lit(cls)` rejects a label type
    // it cannot encode loudly at plan time; the chain length is the
    // (bounded, driver-collected) class cardinality, and the result is
    // a narrow whole-stage-codegen filter with no join at all.
    val thr = counts.foldLeft(lit(null).cast("long")) { case (acc, (cls, n)) =>
      when(col(classCol) <=> lit(cls), lit(65536L * m / n)).otherwise(acc)
    }
    df.where(hashBucket(col(idCol)) < thr)
  }

  /** Deterministic weighted sampling without replacement per stratum —
    * the Efraimidis–Spirakis A-ES scheme (exponential keys): each row
    * draws u = (md5-h16(id)+1)/65537 ∈ (0,1) and the k rows with the
    * SMALLEST −ln(u)/w win, which yields exactly the
    * probability-proportional-to-weight without-replacement draw.
    * md5 replaces the RNG, so the sample is stable under any
    * partitioning/re-run and an external engine replays the exact
    * selection. The key micro-quantizes to 6 dp with an id tie-break
    * before ranking — a 1-ulp ln() divergence between engines can
    * flip the winner only if a key lands within ~1e-10 of a rounding
    * midpoint AND at the rank-k boundary (vanishing; the documented
    * quantization contract, same as BM25's micro-quantized scores).
    *
    * Scale: ONE hash Exchange on the stratum key + a per-stratum
    * TOP-K rank. At extreme per-stratum row counts, swap the exact
    * rank for a key THRESHOLD (keep iff key < k'th-order-statistic
    * estimate) like [[balanceClassesThreshold]] does for class
    * balance — same distribution, approximate size, no sort.
    */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") + lit(1.0)) / lit(65537.0)
    val key = round(-log(u) / col(weightCol) * lit(1e6), 0).cast("long")
    val w = Window.partitionBy(col(strataCol)).orderBy(col("__key"), col(idCol))
    df.withColumn("__key", key)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .drop("__key")
  }
}
