package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.prep._

/** Mirrors the reference's own test suite
  * (tests/test_preprocessor.py, tests/test_inverse_transform.py) on
  * the same fixtures, so a reference user sees the same behavior.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  /** test_preprocessor.py sample_pandas_df: 10 rows of datetime /
    * numeric / categorical (with rare D and empty string) / boolean.
    */
  private def sample = Seq(
    ("2021-01-01", 1.764, "A", true), ("2021-01-02", 0.400, "A", false),
    ("2021-01-03", 0.979, "B", true), ("2021-01-04", 2.241, "B", false),
    ("2021-01-05", 1.868, "C", true), ("2021-01-06", -0.977, "C", false),
    ("2021-01-07", 0.950, "C", true), ("2021-01-08", -0.151, "C", false),
    ("2021-01-09", -0.103, "D", true), ("2021-01-10", 0.411, "", false),
  ).map { case (d, n, c, b) => (Date.valueOf(d), n, c, b) }
    .toDF("time", "numeric_feature", "categorical_feature", "bool_feature")

  test("feature types are inferred as in the reference") {
    val m = Preprocessor.fit(sample, PrepConfig())
    assert(m.getNumericalFeatures == Seq("numeric_feature"))
    assert(m.getCategoricalFeatures == Seq("categorical_feature"))
    assert(m.booleanFeatures == Seq("bool_feature"))
    assert(m.datetimeFeatures == Seq("time"))
  }

  test("rare labels group to other; empty string becomes the None dummy " +
    "(test_transform_rare_labels / test_categorical_transformer)") {
    val m = Preprocessor.fit(sample, PrepConfig(catLabelsThreshold = 0.2))
    val out = m.transform(sample)
    val catCols = out.columns.filter(_.startsWith("categorical_feature_"))
    assert(catCols.contains("categorical_feature_C"))
    assert(catCols.contains("categorical_feature_other"))
    assert(catCols.contains("categorical_feature_None"))
    // every row one-hot encodes to exactly one dummy
    val sums = out.select(catCols.map(c => col(c).cast("long")).reduce(_ + _).as("s"))
      .as[Long].collect()
    assert(sums.forall(_ == 1L))
    assert(out.count() == 10)
  }

  test("kbins discretizes numeric features into at most n_bins values " +
    "(test_transform_with_bins)") {
    val m = Preprocessor.fit(sample, PrepConfig(scaling = Scaling.KBins(3)))
    val out = m.transform(sample)
    val uniq = out.select("numeric_feature").distinct().count()
    assert(uniq <= 3)
  }

  test("quantile scaling transforms without error (test_transform_quantile_scaling)") {
    val m = Preprocessor.fit(sample, PrepConfig(scaling = Scaling.Quantile(11)))
    val out = m.transform(sample)
    assert(out.columns.contains("numeric_feature"))
    assert(out.count() == 10)
  }

  test("invalid cat_labels_threshold raises (test_preprocessor_discarding_threshold_error)") {
    intercept[IllegalArgumentException] {
      Preprocessor.fit(sample, PrepConfig(catLabelsThreshold = 1.1))
    }
    intercept[IllegalArgumentException] {
      Preprocessor.fit(sample, PrepConfig(catLabelsThreshold = -0.1))
    }
  }

  /** test_inverse_transform.py fixtures. */
  private def basicDf = Seq(
    (1, 10, "A", "X"), (2, 20, "B", "Y"), (3, 30, "A", "X"),
    (4, 40, "C", "Z"), (5, 50, "B", "Y"),
  ).toDF("num1", "num2", "cat1", "cat2")

  test("inverse restores numerics and categoricals exactly (test_inverse_transform_basic)") {
    val m = Preprocessor.fit(basicDf, PrepConfig(catLabelsThreshold = 0.1))
    val rt = m.inverseTransform(m.transform(basicDf))
    assert(rt.columns.sorted.toSeq == basicDf.columns.sorted.toSeq)
    assert(rt.orderBy("num1").collect().map(_.toSeq).toSeq ==
      basicDf.orderBy("num1").collect().map(_.toSeq).toSeq)
  }

  test("inverse under each scaling is within 1e-3 (test_inverse_transform_with_scaling)") {
    val nums = basicDf.select("num1", "num2")
    for (sc <- Seq(Scaling.Normalize, Scaling.Standardize, Scaling.Quantile(11))) {
      val m = Preprocessor.fit(nums, PrepConfig(scaling = sc))
      val rt = m.inverseTransform(m.transform(nums)).orderBy("num1").collect()
      val orig = nums.orderBy("num1").collect()
      rt.zip(orig).foreach { case (a, b) =>
        (0 until 2).foreach { i =>
          assert(math.abs(a.getInt(i) - b.getInt(i)) <= 1,
            s"$sc col $i: ${a.getInt(i)} vs ${b.getInt(i)}")
        }
      }
    }
  }

  test("mean fill keeps non-null values through the round trip " +
    "(test_inverse_transform_with_missing_values)") {
    val df = Seq(
      (Some(1.0), Some("A")), (Some(2.0), Some("B")), (None, None),
      (Some(4.0), Some("C")), (Some(5.0), Some("B")),
    ).toDF("num1", "cat1")
    val m = Preprocessor.fit(df, PrepConfig(
      numFillNull = FillStrategy.Mean, catLabelsThreshold = 0.1))
    val rt = m.inverseTransform(m.transform(df)).orderBy("num1").collect()
    // non-null positions restore exactly; the null row comes back as
    // (mean, None-reconstructed) just like the reference
    val nonNull = rt.filter(r => !r.isNullAt(1) && r.getString(1) != "None")
      .map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(Set((1.0, "A"), (2.0, "B"), (4.0, "C"), (5.0, "B")).subsetOf(nonNull))
  }
}
