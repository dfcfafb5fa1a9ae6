"""The graft query registry from Python.

Every operator in SURVEY.md §2 registers a named query in the Scala
``SparkEntry``; this module exposes the same registry to PySpark, so a
Python caller can run any operator against a directory of the standard
parquet tables and fetch its DuckDB oracle SQL.
"""

from pyspark.sql import DataFrame

from graft.session import bridge


def names(spark):
    """Sorted oracled query names (the driver-correctness surface)."""
    return list(bridge(spark).queryNames())


def bench_names(spark):
    """Bench-only rows (sketch/sequential output — no oracle)."""
    return list(bridge(spark).benchQueryNames())


def run(spark, name, sf_dir):
    """Run registry query ``name`` on the parquet tables in ``sf_dir``
    and return its PySpark DataFrame."""
    return DataFrame(bridge(spark).runQuery(spark._jsparkSession, name,
                                            sf_dir), spark)


def oracle_sql(spark, name):
    """The DuckDB-runnable oracle SQL for ``name`` (None if the row is
    bench-only)."""
    sql = bridge(spark).oracleSql(name)
    return sql or None
