"""Python twin of the reference ``Preprocessor`` class, fitted on a
PySpark DataFrame by the graft Scala engine.

Mirrors the reference constructor knobs one-for-one
(reference preprocessor.py:109-122: cat_labels_threshold, excluded_col,
time_id, missing_values_threshold, n_bins, scaling, num_fill_null,
unseen_labels, ml_task, target_column) and its method surface
(transform, inverse_transform, extract_ts_features, get_features_sizes,
get_numerical_features, get_categorical_features), plus graft's
additive knobs: ``series_key`` (per-series window partitioning for the
ordered fills), ``scaling="quantile_uniform"``, ``max_categories``
(bounded category registries), and ``quantile_fit`` ("exact" |
"sketch" | "tdigest" — "sketch" is the mergeable bounded-state 100 TB
path).

The fitted state lives in the JVM as a ``graft.prep.PrepModel``;
transform/inverse_transform return real PySpark DataFrames whose plans
are the same one-select column expressions the Scala API emits.
"""

from pyspark.sql import DataFrame

from graft.session import bridge


class Preprocessor:
    """Fit at construction (like the reference, which fits in
    ``__init__`` on the provided frame)."""

    def __init__(self, data,
                 cat_labels_threshold=0.02,
                 excluded_col=None,
                 time_id=None,
                 missing_values_threshold=0.999,
                 n_bins=0,
                 scaling="none",
                 num_fill_null="none",
                 unseen_labels="ignore",
                 ml_task=None,
                 target_column=None,
                 series_key=None,
                 max_categories=1024,
                 quantile_fit="exact"):
        self._spark = data.sparkSession
        self._bridge = bridge(self._spark)
        # the reference accepts a numeric num_fill_null (fill value)
        fill = (repr(float(num_fill_null))
                if isinstance(num_fill_null, (int, float))
                and not isinstance(num_fill_null, bool)
                else num_fill_null)
        self._model = self._bridge.fit(
            data._jdf,
            float(cat_labels_threshold),
            list(excluded_col or []),
            time_id or "",
            series_key or "",
            float(missing_values_threshold),
            int(n_bins),
            scaling or "none",
            fill or "none",
            unseen_labels or "ignore",
            ml_task or "",
            target_column or "",
            int(max_categories),
            quantile_fit or "exact")

    # ------------------------------------------------------------ transform

    def transform(self, data):
        """Encode ``data`` with the fitted model (one narrow select)."""
        return DataFrame(self._bridge.transform(self._model, data._jdf),
                         self._spark)

    def inverse_transform(self, data):
        """Decode an encoded frame back to the original columns."""
        return DataFrame(
            self._bridge.inverseTransform(self._model, data._jdf),
            self._spark)

    # ------------------------------------------------------------ metadata

    def get_numerical_features(self):
        return tuple(self._bridge.numericalFeatures(self._model))

    def get_categorical_features(self):
        return tuple(self._bridge.categoricalFeatures(self._model))

    def get_datetime_features(self):
        return tuple(self._bridge.datetimeFeatures(self._model))

    def get_boolean_features(self):
        return tuple(self._bridge.booleanFeatures(self._model))

    def get_features_sizes(self):
        """(numerical sizes, per-categorical category counts) — the
        reference's embedding-layer sizing helper."""
        return (list(self._bridge.numericalFeatureSizes(self._model)),
                list(self._bridge.categoricalFeatureSizes(self._model)))

    def encoded_columns(self):
        """Output column order of ``transform`` (kept plain columns,
        then the one-hot columns per category registry)."""
        return list(self._bridge.encodedColumns(self._model))

    def discarded_columns(self):
        """column -> drop reason from fit-time feature selection."""
        return dict(self._bridge.droppedColumns(self._model))

    # ------------------------------------------------------ ts features

    @staticmethod
    def extract_ts_features(data, y, column_id, time,
                            value="value", label_col="y", alpha=0.05):
        """Reference ``extract_ts_features(data, y, time, column_id)``:
        the per-series tsfresh-style feature matrix, filtered to the
        features significantly associated with ``y`` (per-feature test
        + Benjamini-Hochberg), all features when none survive.

        ``y`` is a DataFrame carrying (column_id, label_col), one row
        per series. Static — needs no fitted state, exactly like the
        reference method which ignores the fitted model.
        """
        spark = data.sparkSession
        return DataFrame(
            bridge(spark).extractTsFeatures(
                data._jdf, y._jdf, column_id, time, value, label_col,
                float(alpha)),
            spark)
