"""graft — PySpark surface for the graft Spark-native preprocessing &
data-pipeline engine.

The engine is pure Scala (``src/main/scala/graft``); this package is a
thin py4j wrapper so the reference library's Python audience can call
the same code without writing Scala. Nothing is re-implemented here:
every call is one hop through ``graft.python.PyBridge`` into the exact
classes the Scala API, the driver's correctness protocol, and the
benchmark exercise.

Quick start::

    from graft import graft_builder, Preprocessor

    spark = graft_builder().master("local[4]").getOrCreate()
    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    prep = Preprocessor(df, scaling="standardize",
                        excluded_col=["c_custkey"])
    encoded = prep.transform(df)
    restored = prep.inverse_transform(encoded)

    # SQL functions (registered by the session extensions):
    spark.sql("SELECT graft_dot(array(1.0, 2.0), array(3.0, 4.0))")

    # the full query registry:
    from graft import queries
    queries.run(spark, "q_agg", "/root/testdata/sf0.001").show()
"""

from graft.session import GRAFT_EXTENSIONS_CLASS, graft_builder, activate
from graft.preprocessor import Preprocessor
from graft import operators, queries, versioned

__all__ = [
    "GRAFT_EXTENSIONS_CLASS",
    "graft_builder",
    "activate",
    "Preprocessor",
    "operators",
    "queries",
    "versioned",
]
