package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.sources.IO

/** Source/sink coverage: write-read round trips through CSV, JSON and
  * partitioned parquet must reproduce the original table exactly
  * (oracle = the original table in DuckDB).
  */
object SourceQueries {

  // pid-scoped scratch: two concurrent processes (python smoke pytest
  // alongside a Scala Verify/Bench run) must not overwrite each
  // other's round-trip files mid-read
  private def tmp(name: String) = IO.freshScratchDir(name)

  // CSV sink -> CSV source (explicit schema, header)
  val csvRoundtrip: Q = Q(
    "source_csv_roundtrip",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val path = tmp("docs_csv")
      IO.writeCsv(d, path)
      IO.readCsv(s, path, d.schema)
    },
    Some("SELECT doc_id, lang, source, n_chars FROM documents"),
  )

  // JSON sink -> JSON source
  val jsonRoundtrip: Q = Q(
    "source_json_roundtrip",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val path = tmp("docs_json")
      IO.writeJson(d, path)
      IO.readJson(s, path, d.schema)
    },
    Some("SELECT doc_id, lang, n_chars FROM documents"),
  )

  /** Partitioned parquet sink, read back with a partition filter —
    * the scan must prune to the lang=en directory (partition pruning,
    * not a full-table filter).
    */
  val sinkPartitioned: Q = Q(
    "sink_parquet_partitioned",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"), col("lang"))
      val path = tmp("docs_part")
      IO.writeParquet(d, path, partitionBy = Seq("lang"))
      IO.readParquet(s, path)
        .where(col("lang") === "en")
        .select(col("doc_id"), col("n_chars"))
    },
    Some("SELECT doc_id, n_chars FROM documents WHERE lang = 'en'"),
  )

  // ORC sink -> ORC source (DuckDB can't read ORC; the oracle is the
  // original table, which the round trip must reproduce)
  val orcRoundtrip: Q = Q(
    "source_orc_roundtrip",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val path = tmp("docs_orc")
      IO.writeOrc(d, path)
      IO.readOrc(s, path)
    },
    Some("SELECT doc_id, lang, n_chars FROM documents"),
  )

  // Avro sink -> Avro source (DuckDB reads avro only via an extension
  // that isn't loadable offline; like ORC, the oracle is the original
  // table, which the round trip must reproduce)
  val avroRoundtrip: Q = Q(
    "source_avro_roundtrip",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val path = tmp("docs_avro")
      IO.writeAvro(d, path)
      IO.readAvro(s, path)
    },
    Some("SELECT doc_id, lang, source, n_chars FROM documents"),
  )

  // line-oriented text sink -> text source (raw-corpus ingest shape);
  // row order is sink-arbitrary, the driver compare sorts rows
  val textRoundtrip: Q = Q(
    "source_text_roundtrip",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("text"))
      val path = tmp("docs_text")
      IO.writeText(d, path)
      IO.readText(s, path).select(col("value").as("text"))
    },
    Some("SELECT text FROM documents"),
  )

  /** `binaryFile` source — the multimodal ingestion path (image/audio
    * corpora arrive as object-store files, not table rows): one
    * opaque-bytes file per sampled doc (driver-written fixture; a real
    * pipeline reads pre-existing files), read back as
    * (path, length, content) rows, checksummed. The content column is
    * the same opaque `binary` the Multimodal operators consume, so
    * this closes the file → media-record ingestion loop; oracle
    * checks id/length/md5 against the source table.
    */
  val binaryRoundtrip: Q = Q(
    "source_binary_roundtrip",
    (s, dir) => {
      val path = tmp("docs_bin")
      val d = Tables.documents(s, dir)
        .where(col("doc_id") % 25 === 0).select(col("doc_id"), col("text"))
      val dirF = new java.io.File(path)
      org.apache.commons.io.FileUtils.deleteQuietly(dirF)
      dirF.mkdirs()
      d.collect().foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path, s"doc_${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      s.read.format("binaryFile").load(path)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_hash"))
    },
    Some("""
      SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_hash
      FROM documents WHERE doc_id % 25 = 0
    """),
  )

  /** Schema evolution on read — the lake-format capability every
    * long-lived 100 TB dataset needs (a pipeline adds a column; years
    * of old files do not get rewritten): v1 files carry (doc_id, lang),
    * v2 files add `quality`; `mergeSchema=true` reads both vintages as
    * ONE frame with nulls where the old files lack the column. The
    * oracle replays the same union semantics via DuckDB's
    * `union_by_name`. Column pruning and pushdown still apply per
    * file — evolution costs nothing at scan time.
    */
  val schemaEvolution: Q = Q(
    "source_schema_evolution",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = graft.Tables.documents(s, dir)
      val v1 = d.where(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
      val v2 = d.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), (col("n_chars") % 100).as("quality"))
      val base = tmp("docs_evolving")
      v1.write.mode("overwrite").parquet(s"$base/v=1")
      v2.write.mode("overwrite").parquet(s"$base/v=2")
      s.read.option("mergeSchema", "true").parquet(s"$base/v=1", s"$base/v=2")
        .select(col("doc_id"), col("lang"), col("quality"))
    },
    Some("""
      SELECT doc_id, lang, NULL::BIGINT AS quality FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, lang, n_chars % 100 FROM documents WHERE doc_id % 2 = 1
    """),
  )

  /** The custom DataSourceV2 ([[graft.sources.RangeV2]]) driven
    * end-to-end through a filtered aggregate: the id-range predicate
    * pushes INTO the connector (pruned splits never planned, no
    * residual Filter — RangeV2Spec pins the plan shape), and the
    * deterministic generator replays in DuckDB via generate_series,
    * so a from-scratch V2 source is oracle-checked like any table.
    */
  val rangeV2: Q = Q(
    "source_rangev2",
    (s, dir) => {
      import graft.operators.ExactAgg
      s.read.format("graft.sources.RangeV2")
        .option("start", "0").option("end", "100000").option("slices", "8")
        .load()
        .where(col("id") >= 25000 && col("id") < 75000)
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          round(ExactAgg.decSum(col("val")), 6).as("sum_val"))
    },
    Some(s"""
      SELECT count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             round(${OracleExact.decSumSql("((i * 2654435761) % 1000003) / 1000003.0")}, 6) AS sum_val
      FROM generate_series(25000, 74999) t(i)
    """),
  )

  /** AGGREGATE pushdown at the connector boundary (r10, the
    * engine-ladder rung above `source_rangev2`'s filter pushdown):
    * count/min/max/sum(id) over the filter-narrowed range collapse
    * into [[graft.sources.RangeV2]]'s closed forms — the plan's leaf
    * is a ONE-ROW `GraftRangeV2Agg` scan, no rows are generated at
    * all (the "answer count(*) from metadata" property a 100 TB table
    * format gets from file statistics). The oracle recomputes the
    * same aggregates from the replayed generator.
    */
  val rangeV2Agg: Q = Q(
    "source_rangev2_agg",
    (s, dir) =>
      s.read.format("graft.sources.RangeV2")
        .option("start", "0").option("end", "1000000").option("slices", "8")
        .load()
        .where(col("id") >= 12345 && col("id") < 678901)
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"), sum(col("id")).as("sum_id")),
    Some("""
      SELECT count(*)::BIGINT AS n, min(i)::BIGINT AS min_id,
             max(i)::BIGINT AS max_id, sum(i)::BIGINT AS sum_id
      FROM generate_series(12345, 678900) t(i)
    """),
  )

  /** The DSv2 WRITE rung driven end-to-end ([[graft.sources.VersionedV2]],
    * the transactional-sink twin of RangeV2's five read rungs): an
    * overwrite commit then an append commit onto the directory-
    * versioned table (two-phase staging, manifest-over-immutable-files,
    * atomic pointer publish — VersionedV2Spec pins the planted-failure
    * atomicity), then BOTH snapshots read back through time travel and
    * rolled up. The row data is the RangeV2 generator, so DuckDB
    * replays every committed version exactly; the bit-exact id,valBits
    * serialization makes the round trip hash-checkable.
    */
  val versionedWrite: Q = Q(
    "source_versioned_write",
    (s, dir) => {
      import graft.operators.ExactAgg
      val fmt = "graft.sources.VersionedV2"
      // fixed scratch, wiped per run (same rationale as the streaming
      // sink row: no /tmp accumulation, fresh version chain per run)
      val path = IO.freshScratchDir("versioned_batch") + "/t"
      def gen(lo: Int, hi: Int) = s.read.format("graft.sources.RangeV2")
        .option("start", lo.toString).option("end", hi.toString)
        .option("slices", "4").load()
      gen(0, 5000).write.format(fmt).option("path", path)
        .mode("overwrite").save()
      gen(5000, 6000).write.format(fmt).option("path", path)
        .mode("append").save()
      def snap(v: Int) = s.read.format(fmt).option("path", path)
        .option("version", v.toString).load()
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          round(ExactAgg.decSum(col("val")), 6).as("sum_val"))
        .select(lit(v).as("version"), col("n"), col("sum_id"), col("sum_val"))
      snap(1).unionAll(snap(2))
    },
    Some(s"""
      WITH g AS (
        SELECT i, ((i * 2654435761) % 1000003) / 1000003.0 AS v
        FROM generate_series(0, 5999) t(i))
      SELECT 1 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             round(${OracleExact.decSumSql("v")}, 6) AS sum_val
      FROM g WHERE i < 5000
      UNION ALL
      SELECT 2 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             round(${OracleExact.decSumSql("v")}, 6) AS sum_val
      FROM g
    """),
  )

  /** Row-level DELETE on the versioned table ([[graft.sources.
    * VersionedV2.delete]] — copy-on-write, the GDPR-erasure path at
    * the storage layer): two commits build v2 (so the table has
    * several immutable files), the predicate `id % 7 = 0 AND id <
    * 3000` touches only the FIRST commit's files (the second commit's
    * carry by reference — VersionedV2Spec pins the file accounting),
    * and the publish is the same claim→manifest→pointer sequence as a
    * write. Both the pre-delete and post-delete snapshots read back
    * through time travel — history is immutable until vacuum — and
    * DuckDB replays them from the RangeV2 closed form.
    */
  val versionedDelete: Q = Q(
    "source_versioned_delete",
    (s, dir) => {
      import graft.operators.ExactAgg
      val fmt = "graft.sources.VersionedV2"
      val path = IO.freshScratchDir("versioned_delete") + "/t"
      def gen(lo: Int, hi: Int) = s.read.format("graft.sources.RangeV2")
        .option("start", lo.toString).option("end", hi.toString)
        .option("slices", "4").load()
      gen(0, 3000).write.format(fmt).option("path", path)
        .mode("overwrite").save()
      gen(3000, 6000).write.format(fmt).option("path", path)
        .mode("append").save()
      graft.sources.VersionedV2.delete(path, id => id % 7 == 0 && id < 3000)
      def snap(v: Int) = s.read.format(fmt).option("path", path)
        .option("version", v.toString).load()
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          round(ExactAgg.decSum(col("val")), 6).as("sum_val"))
        .select(lit(v).as("version"), col("n"), col("sum_id"), col("sum_val"))
      snap(2).unionAll(snap(3))
    },
    Some(s"""
      WITH g AS (
        SELECT i, ((i * 2654435761) % 1000003) / 1000003.0 AS v
        FROM generate_series(0, 5999) t(i))
      SELECT 2 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             round(${OracleExact.decSumSql("v")}, 6) AS sum_val
      FROM g
      UNION ALL
      SELECT 3 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             round(${OracleExact.decSumSql("v")}, 6) AS sum_val
      FROM g WHERE NOT (i % 7 = 0 AND i < 3000)
    """),
  )

  /** ADD-COLUMN schema evolution on the versioned table
    * ([[graft.sources.VersionedV2.evolveSchema]] — the lake-format
    * twin of row 256's parquet mergeSchema): v1 commits under the base
    * (id, val) schema, the evolution publishes the METADATA-ONLY v2
    * (same data files, new nullable `tag` column effective from v2),
    * and v3 appends rows that carry the column. Reads across the
    * boundary: v1 presents the OLD schema (time travel is honest), v2
    * null-fills every pre-evolution row, v3 mixes null-filled old
    * files with tagged new ones — all replayed by DuckDB from the
    * RangeV2 closed form.
    */
  val versionedEvolve: Q = Q(
    "source_versioned_evolve",
    (s, dir) => {
      val fmt = "graft.sources.VersionedV2"
      val path = IO.freshScratchDir("versioned_evolve") + "/t"
      def gen(lo: Int, hi: Int) = s.read.format("graft.sources.RangeV2")
        .option("start", lo.toString).option("end", hi.toString)
        .option("slices", "4").load()
      gen(0, 3000).write.format(fmt).option("path", path)
        .mode("overwrite").save()
      graft.sources.VersionedV2.evolveSchema(path, "tag", "string")
      gen(3000, 4000)
        .withColumn("tag", concat(lit("t"), (col("id") % 3).cast("string")))
        .write.format(fmt).option("path", path).mode("append").save()
      def snap(v: Int) = {
        val d = s.read.format(fmt).option("path", path)
          .option("version", v.toString).load()
        val tagged = if (d.columns.contains("tag")) col("tag")
                     else lit(null).cast("string")
        d.select(col("id"), tagged.as("tag"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
            count(col("tag")).as("n_tagged"),
            coalesce(concat_ws("|", array_sort(collect_set(col("tag")))), lit(""))
              .as("tags"))
          .select(lit(v).as("version"), col("n"), col("sum_id"),
            col("n_tagged"), col("tags"))
      }
      snap(1).unionAll(snap(2)).unionAll(snap(3))
    },
    Some("""
      WITH g AS (SELECT i FROM generate_series(0, 3999) t(i))
      SELECT 1 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             0::BIGINT AS n_tagged, '' AS tags
      FROM g WHERE i < 3000
      UNION ALL
      SELECT 2 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             0::BIGINT AS n_tagged, '' AS tags
      FROM g WHERE i < 3000
      UNION ALL
      SELECT 3 AS version, count(*)::BIGINT AS n, sum(i)::BIGINT AS sum_id,
             count(*) FILTER (WHERE i >= 3000)::BIGINT AS n_tagged,
             't0|t1|t2' AS tags
      FROM g
    """),
  )

  val all: Seq[Q] = Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip, avroRoundtrip,
    sinkPartitioned, textRoundtrip, binaryRoundtrip, schemaEvolution, rangeV2,
    rangeV2Agg, versionedWrite, versionedDelete, versionedEvolve)
}
