package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.sources.IO

/** Source/sink coverage: write-read round trips through CSV, JSON and
  * partitioned parquet must reproduce the original table exactly
  * (oracle = the original table in DuckDB).
  */
object SourceQueries {

  private def tmp(name: String) = s"/tmp/graft_io/$name"

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

  val all: Seq[Q] = Seq(csvRoundtrip, jsonRoundtrip, orcRoundtrip, avroRoundtrip,
    sinkPartitioned, textRoundtrip, binaryRoundtrip)
}
