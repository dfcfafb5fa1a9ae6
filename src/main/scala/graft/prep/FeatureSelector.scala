package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature selection (reference: preprocessor.py:260-339
  * `_feature_selection`):
  *   1. drop columns with a single distinct value (num + cat);
  *   2. drop categorical columns whose top label covers >= 98% of rows;
  *   3. rare labels (share < threshold) -> "other" (via
  *      [[CategoricalTransformer.shrink]]).
  *
  * Scale design: decisions come from ONE value-counts shuffle for all
  * categorical columns + the numerical stats pass (min==max test);
  * nothing unbounded is collected.
  */
final case class SelectionModel(
    dropped: Map[String, String],            // column -> reason
    catModels: Map[String, CatColModel],     // post-drop shrink models
) {
  def keptOf(cols: Seq[String]): Seq[String] = cols.filterNot(dropped.contains)
}

object FeatureSelector {
  val DominantShare = 0.98

  /** `knownNumStats` lets the orchestrator share its single stats pass
    * instead of re-aggregating; the categorical value counts are
    * computed once here and shared with the rare-label fit.
    */
  def fit(
      df: DataFrame,
      numericalCols: Seq[String],
      categoricalCols: Seq[String],
      catLabelsThreshold: Double,
      maxCategories: Int = 1024,
      knownNumStats: Option[Map[String, NumColStats]] = None,
      buildBloom: Boolean = false,
  ): SelectionModel = {
    val total = df.count().toDouble
    val dropped = scala.collection.mutable.LinkedHashMap[String, String]()

    val vcOpt =
      if (categoricalCols.isEmpty) None
      else Some(CategoricalTransformer.valueCounts(df, categoricalCols).cache())

    // categorical: distinct count + dominant share in one pass
    vcOpt.foreach { vc =>
      val stats = vc.groupBy("feature")
        .agg(count(lit(1)).as("n_distinct"), max(col("cnt")).as("max_cnt"))
        .collect()
      stats.foreach { r =>
        val (c, n, mx) = (r.getString(0), r.getLong(1), r.getLong(2))
        if (n <= 1) dropped(c) = "single value"
        else if (mx >= total * DominantShare) dropped(c) = "dominant label >= 98%"
      }
    }
    // numerical: single-value = min == max (or all null)
    if (numericalCols.nonEmpty) {
      val st = knownNumStats.getOrElse(NumericalTransformer.fit(df, numericalCols))
      numericalCols.foreach { c =>
        val s = st(c)
        if (s.min.isNaN || s.min == s.max) dropped(c) = "single value"
      }
    }
    val keptCats = categoricalCols.filterNot(dropped.contains)
    val catModels = CategoricalTransformer.fit(df, keptCats, catLabelsThreshold,
      maxCategories, knownTotal = Some(total), knownVc = vcOpt,
      buildBloom = buildBloom)
    vcOpt.foreach(_.unpersist())
    SelectionModel(dropped.toMap, catModels)
  }
}
