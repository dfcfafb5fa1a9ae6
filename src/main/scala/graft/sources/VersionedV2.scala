package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WRITE rung of the DSv2 engine ladder (`format("graft.sources.
  * VersionedV2")`) — the transactional-sink shape every lakehouse
  * writer needs, in miniature: a directory-versioned table with REAL
  * commit/abort semantics, manifest-over-immutable-files layout (the
  * Delta/Iceberg discipline), and snapshot reads.
  *
  * Write protocol (two-phase, all-or-nothing):
  *  1. each task streams rows into its OWN staging file
  *     (`_staging/<queryId>/part-<pid>-<tid>`); nothing a running or
  *     failed task writes is ever visible — task `abort()` deletes
  *     the partial file, and only task `commit()` names the file in a
  *     [[WriterCommitMessage]];
  *  2. driver `commit(messages)` moves the named files into the
  *     immutable `data/` pool, writes manifest `v<N+1>/manifest.txt`
  *     (append = previous manifest's lines + the new files — data is
  *     NEVER copied or rewritten, versions share immutable files),
  *     then publishes with ONE atomic move of the `_latest.txt`
  *     pointer. A crash anywhere before the pointer move leaves
  *     version N intact and visible — readers can never observe a
  *     half-commit;
  *  3. driver `abort(messages)` removes the staging directory.
  *
  * Read side resolves the pointer (or an explicit `version` option —
  * time travel for free, snapshots are immutable) to a manifest and
  * plans ONE InputPartition per data file, the split shape a real
  * table format scans with. Rows serialize as `id,valBits` text with
  * the double's raw long bits, so the write→read round trip is
  * BIT-exact and the `source_versioned_write` oracle can replay it.
  *
  * Toy-table boundaries, by design: fixed (id BIGINT, val DOUBLE)
  * schema, java.nio on a shared filesystem (a cluster deployment
  * swaps in the Hadoop FileSystem API — same two-phase protocol), and
  * single-writer (concurrent committers would race the version
  * counter; the version-dir create is the failure that surfaces it).
  */
class VersionedV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null && path.nonEmpty, "VersionedV2 requires a path option")
    VersionedV2.schemaAt(path,
      Option(options.get("version")).map(_.toInt)
        .getOrElse(VersionedV2.latestVersion(path)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "VersionedV2 requires a path option")
    new VersionedTable(path,
      Option(properties.get("version")).map(_.toInt))
  }
}

object VersionedV2 {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  // ------------------------------------------------------ schema evolution

  private[sources] val addedTypes: Map[String, DataType] =
    Map("long" -> LongType, "double" -> DoubleType, "string" -> StringType)

  /** Columns ADDED by [[evolveSchema]]: `(name, typeName, sinceVersion)`
    * lines in the table-root `_schema.txt` — table-level (not inside a
    * version dir) so retention vacuum can never delete the schema
    * history, with `sinceVersion` keeping time travel honest: a
    * snapshot BEFORE the evolution reads with the schema it was
    * written under.
    */
  private[sources] def addedColumns(path: String): Seq[(String, String, Int)] = {
    val p = Paths.get(path, "_schema.txt")
    if (!Files.exists(p)) Nil
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map { l =>
        val Array(n, t, v) = l.split(":")
        (n, t, v.toInt)
      }
  }

  /** The schema visible at `version`: the base (id, val) plus every
    * column whose evolution version is ≤ `version`, each nullable
    * (old files null-fill on read).
    */
  def schemaAt(path: String, version: Int): StructType =
    StructType(schema.fields ++ addedColumns(path)
      .filter(_._3 <= version)
      .map { case (n, t, _) => StructField(n, addedTypes(t), nullable = true) })

  /** ADD-COLUMN schema evolution — the lake-format shape: publish a
    * METADATA-ONLY version (manifest = previous files carried by
    * reference, no data touched) and record the new nullable column as
    * effective FROM that version. Reads at or after it null-fill the
    * column for files written earlier; time travel to versions before
    * it still presents the old schema; writes after it either supply
    * the column or omit it (Spark null-extends missing nullable
    * columns by name). Only nullable ADDs of long/double/string are supported —
    * every other change (drop, rename, retype) stays a loud rejection,
    * by design. Crash window: a crash after the pointer move but
    * before `_schema.txt` lands leaves a harmless data-identical
    * version with the OLD schema (the evolution simply did not
    * happen); a crash before the pointer move leaves a dead claim that
    * `vacuum(reclaimDeadClaims = true)` reclaims.
    */
  def evolveSchema(path: String, name: String, typeName: String): Int = {
    require(addedTypes.contains(typeName),
      s"VersionedV2 add-column supports ${addedTypes.keys.mkString("/")}, got $typeName")
    val current = latestVersion(path)
    require(current >= 1, s"VersionedV2: no committed table at $path to evolve")
    require(!schemaAt(path, current).fieldNames.contains(name),
      s"VersionedV2: column $name already exists")
    val next = current + 1
    val vdir = Paths.get(path, s"v$next")
    Files.createDirectory(vdir) // strict single-writer claim, as batch
    writeAtomically(vdir.resolve("manifest.txt"),
      manifest(path, current).mkString("\n"))
    writeAtomically(Paths.get(path, "_latest.txt"), next.toString)
    writeAtomically(Paths.get(path, "_schema.txt"),
      (addedColumns(path).map { case (n, t, v) => s"$n:$t:$v" } :+
        s"$name:$typeName:$next").mkString("\n"))
    next
  }

  // ------------------------------------------------------ row-level DELETE

  final case class DeleteReport(version: Int, rewrittenFiles: Int,
                                carriedFiles: Int, deletedRows: Long,
                                keptRows: Long)

  /** Row-level DELETE as COPY-ON-WRITE — the GDPR-erasure path at the
    * storage layer (`q_subject_access` locates; THIS erases): scan the
    * current snapshot's manifest, rewrite ONLY the files that hold a
    * matching row (survivor lines stream into a new immutable pool
    * file per affected file; a file whose every row matches simply
    * drops out), carry every untouched file BY REFERENCE, and publish
    * the new manifest through the same claim → pool → manifest →
    * pointer sequence as a write — a crash at any point leaves the old
    * snapshot intact (a dead claim reclaims via
    * `vacuum(reclaimDeadClaims = true)`). History is immutable: the
    * deleted rows remain visible via time travel to older versions
    * until retention vacuum drops them — true erasure is
    * `delete(...)` then `vacuum(keepVersions = 1)`, which also
    * collects the pre-rewrite files. Lines rewrite VERBATIM (only the
    * id field parses), so the rewrite is schema-era agnostic.
    *
    * Matching is by id predicate. Driver-side java.nio like every
    * other maintenance op on this toy FS layer (vacuum, publish); the
    * cluster shape is one rewrite TASK per affected file —
    * embarrassingly parallel, no shuffle — with the same single
    * driver-side manifest swap.
    */
  def delete(path: String, pred: Long => Boolean): DeleteReport = {
    val current = latestVersion(path)
    require(current >= 1, s"VersionedV2: no committed table at $path")
    val next = current + 1
    val vdir = Paths.get(path, s"v$next")
    Files.createDirectory(vdir) // strict single-writer claim
    val dataDir = Paths.get(path, "data")
    var rewritten = 0
    var carried = 0
    var deleted = 0L
    var kept = 0L
    val newManifest = manifest(path, current).flatMap { f =>
      val lines = Files.readAllLines(dataDir.resolve(f), StandardCharsets.UTF_8)
        .asScala.toSeq.filter(_.nonEmpty)
      val (drop, keep) =
        lines.partition(l => pred(l.substring(0, l.indexOf(',')).toLong))
      if (drop.isEmpty) { carried += 1; Some(f) }
      else {
        rewritten += 1
        deleted += drop.size
        kept += keep.size
        if (keep.isEmpty) None
        else {
          val nf = s"cow-v$next-$f"
          writeAtomically(dataDir.resolve(nf), keep.mkString("\n") + "\n")
          Some(nf)
        }
      }
    }
    writeAtomically(vdir.resolve("manifest.txt"), newManifest.mkString("\n"))
    writeAtomically(Paths.get(path, "_latest.txt"), next.toString)
    DeleteReport(next, rewritten, carried, deleted, kept)
  }

  /** Current committed version (0 = empty table, no pointer yet). */
  def latestVersion(path: String): Int = {
    val p = Paths.get(path, "_latest.txt")
    if (Files.exists(p)) new String(Files.readAllBytes(p),
      StandardCharsets.UTF_8).trim.toInt
    else 0
  }

  /** The data files (relative names) visible at `version`. */
  def manifest(path: String, version: Int): Seq[String] = {
    if (version == 0) return Nil
    val m = Paths.get(path, s"v$version", "manifest.txt")
    require(Files.exists(m), s"VersionedV2: no committed version $version at $path")
    new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  final case class VacuumReport(deletedVersions: Int, deletedFiles: Int,
                                reclaimedClaims: Int, retainedFiles: Int)

  /** Retention VACUUM — the maintenance half a manifest-over-
    * immutable-files table needs (the runtime twin of
    * `q_compaction_plan`'s planning): keep the newest `keepVersions`
    * snapshots (the pointer's version always included), drop older
    * version directories, and delete every data file no retained
    * manifest references — which also collects orphans from crashed
    * commits. Time travel to a vacuumed version fails loudly
    * afterwards, by design: that is what retention means.
    *
    * `reclaimDeadClaims = true` additionally removes version
    * directories ABOVE the pointer — the residue of a commit that
    * crashed after claiming its version, at ANY crash point: a
    * manifest-less claim, a marker-only claim, or a manifest-FULL dir
    * whose pointer move was lost (without this last case a batch crash
    * between manifest write and pointer move wedges the table
    * permanently: every later batch commit hits the existing claim and
    * every streaming commit trips the foreign-manifest guard). The
    * reclaimed dirs' epoch markers are deliberately NOT folded into
    * the ledger — the pointer never covered them, so the epoch never
    * became visible, and folding would make a replaying stream drop
    * the replay of data that was discarded. Off by default: under the
    * single-writer contract only the (sole) writer may assert that no
    * commit is in flight.
    */
  def vacuum(path: String, keepVersions: Int = 1,
             reclaimDeadClaims: Boolean = false): VacuumReport = {
    require(keepVersions >= 1, "vacuum must keep at least the current version")
    val latest = latestVersion(path)
    val keepFrom = math.max(1, latest - keepVersions + 1)
    val retained: Set[String] =
      (keepFrom to latest).flatMap(v => manifest(path, v)).toSet
    var deletedVersions = 0
    var reclaimed = 0
    // fold the doomed versions' epoch markers into the ledger FIRST:
    // retention must never delete the marker a streaming replay's
    // exactly-once check depends on
    val folded = (1 until keepFrom).flatMap(v =>
      VersionedCommit.markerAt(path, v))
    if (folded.nonEmpty) {
      val l = VersionedCommit.ledger(path)
      val merged = folded.foldLeft(l) { case (acc, (w, e)) =>
        acc.updated(w, math.max(e, acc.getOrElse(w, Long.MinValue)))
      }
      VersionedCommit.writeLedger(path, merged)
    }
    (1 until keepFrom).foreach { v =>
      val d = Paths.get(path, s"v$v")
      if (Files.exists(d)) {
        VersionedCommit.deleteDirContents(d) // manifest, epoch marker, all
        Files.deleteIfExists(d)
        deletedVersions += 1
      }
    }
    if (reclaimDeadClaims) {
      var v = latest + 1
      var stop = false
      while (!stop) {
        val d = Paths.get(path, s"v$v")
        if (Files.exists(d)) {
          // a dead claim may hold a marker and/or a full manifest (a
          // crash between manifest write and pointer move) — delete
          // both WITHOUT ledger folding: the epoch never became
          // visible, and its pool files are unreferenced orphans the
          // data sweep below collects
          VersionedCommit.deleteDirContents(d)
          Files.deleteIfExists(d)
          reclaimed += 1
          v += 1
        } else stop = true
      }
    }
    var deletedFiles = 0
    val dataDir = Paths.get(path, "data")
    if (Files.exists(dataDir)) {
      val s = Files.list(dataDir)
      val files = try s.iterator().asScala.toSeq finally s.close()
      files.foreach { f =>
        if (!retained.contains(f.getFileName.toString)) {
          Files.deleteIfExists(f)
          deletedFiles += 1
        }
      }
    }
    VacuumReport(deletedVersions, deletedFiles, reclaimed, retained.size)
  }

  private[sources] def writeAtomically(target: Path, content: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

private[sources] class VersionedTable(path: String, readVersion: Option[Int])
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_versioned[$path]"
  override def schema(): StructType = VersionedV2.schemaAt(path,
    readVersion.getOrElse(VersionedV2.latestVersion(path)))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val v = readVersion.getOrElse(VersionedV2.latestVersion(path))
        new VersionedScan(path, v,
          VersionedV2.addedColumns(path).filter(_._3 <= v).map(_._2))
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val want = VersionedV2.schemaAt(path, VersionedV2.latestVersion(path))
    require(info.schema().fields.map(f => (f.name, f.dataType)).sameElements(
      want.fields.map(f => (f.name, f.dataType))),
      s"VersionedV2 expects ${want.sql}, got ${info.schema().sql}")
    new VersionedWriteBuilder(path, info.queryId(),
      info.options().getOrDefault("writerId", "default"), truncate = false,
      extra = VersionedV2.addedColumns(path)
        .filter(_._3 <= VersionedV2.latestVersion(path)).map(_._2))
  }
}

private[sources] class VersionedWriteBuilder(
    path: String, queryId: String, writerId: String, truncate: Boolean,
    extra: Seq[String])
  extends WriteBuilder with SupportsTruncate {

  // SaveMode.Overwrite arrives as truncate(): the new version's
  // manifest starts empty instead of carrying the previous files
  override def truncate(): WriteBuilder =
    new VersionedWriteBuilder(path, queryId, writerId, truncate = true, extra)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new VersionedBatchWrite(path, queryId, truncate, extra)
    override def toStreaming: StreamingWrite =
      new VersionedStreamingWrite(path, queryId, writerId, truncate, extra)
  }
}

/** Task message: the staged file this task committed, for the driver
  * to publish. Only committed tasks contribute one.
  */
private[sources] case class StagedFile(name: String, rows: Long)
  extends WriterCommitMessage

private[sources] class VersionedBatchWrite(
    path: String, queryId: String, truncate: Boolean,
    extra: Seq[String]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(VersionedCommit.stagingDir(path, queryId))
    new VersionedWriterFactory(path, queryId, extra)
  }

  /** Publish: move staged files into the immutable pool, write the
    * new manifest, then ONE atomic pointer move. Nothing before the
    * pointer move is visible to readers.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    VersionedCommit.publish(path, queryId, truncate,
      messages.collect { case s: StagedFile => s }, epoch = None)

  /** A failed job publishes NOTHING: staged files (committed tasks
    * included) are deleted, the pointer never moves.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    VersionedCommit.cleanupStaging(path, queryId)
}

/** The shared two-phase publish both the batch and the streaming sink
  * ride: claim the version directory (the single-writer guard, BEFORE
  * the pool is touched), move staged files into the immutable pool,
  * write the manifest (append = previous lines + new files), record
  * the writer-scoped epoch marker for streaming replays, then ONE
  * atomic pointer move.
  */
private[sources] object VersionedCommit {

  def stagingDir(path: String, queryId: String): Path =
    Paths.get(path, "_staging", queryId)

  private def readIfExists(p: Path): Option[String] =
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p),
      StandardCharsets.UTF_8).trim)
    else None

  /** "writerId:epoch" — the marker is WRITER-scoped: two streaming
    * queries (fresh checkpoints restart epoch ids at 0) writing the
    * same table must not mistake each other's epochs for replays.
    */
  private def markerOf(writerId: String, epoch: Long) = s"$writerId:$epoch"

  private[sources] def markerAt(path: String, v: Int): Option[(String, Long)] =
    readIfExists(Paths.get(path, s"v$v", "epoch.txt")).flatMap { m =>
      val i = m.lastIndexOf(':')
      if (i < 0) None else Some((m.substring(0, i), m.substring(i + 1).toLong))
    }

  /** Per-writer max epochs whose version DIRS were vacuumed away —
    * vacuum folds the markers it deletes in here so retention can
    * never re-enable a duplicate replay.
    */
  private[sources] def ledger(path: String): Map[String, Long] =
    readIfExists(Paths.get(path, "_epochs.txt")).map(_.split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty).map { m =>
        val i = m.lastIndexOf(':')
        m.substring(0, i) -> m.substring(i + 1).toLong
      }.toMap).getOrElse(Map.empty)

  private[sources] def writeLedger(path: String, l: Map[String, Long]): Unit =
    VersionedV2.writeAtomically(Paths.get(path, "_epochs.txt"),
      l.toSeq.sortBy(_._1).map { case (w, e) => markerOf(w, e) }
        .mkString("\n"))

  /** Has `writerId` already published `epoch`? Per-writer epochs
    * commit in increasing order and a micro-batch replay can only be
    * the writer's LAST committed epoch, so the answer is the FIRST of
    * the writer's markers met scanning BACKWARD from the pointer —
    * O(distance to that version), O(1) for the steady single-writer
    * stream — with the vacuum ledger covering markers whose version
    * dirs were retained away.
    */
  def epochCommitted(path: String, writerId: String, epoch: Long): Boolean = {
    if (ledger(path).get(writerId).exists(_ >= epoch)) return true
    var v = VersionedV2.latestVersion(path)
    while (v >= 1) {
      markerAt(path, v) match {
        case Some((w, e)) if w == writerId => return e >= epoch
        case _ => v -= 1
      }
    }
    false
  }

  def publish(path: String, queryId: String, truncate: Boolean,
              staged: Seq[StagedFile], epoch: Option[(String, Long)]): Unit = {
    // exactly-once under epoch REPLAY: a restarted streaming query
    // re-runs its last micro-batch; if that epoch already published,
    // drop the replayed staging and keep the committed version
    if (epoch.exists { case (w, e) => epochCommitted(path, w, e) }) {
      cleanupStaging(path, queryId)
      return
    }
    val current = VersionedV2.latestVersion(path)
    val prev = if (truncate) Nil else VersionedV2.manifest(path, current)
    val next = current + 1
    val vdir = Paths.get(path, s"v$next")
    // CRASH RECOVERY for a replayed epoch when a previous attempt died
    // mid-publish (the pointer never moved, so epochCommitted said no):
    //  - our own marker + a complete manifest already at v<next> means
    //    only the pointer move was lost — finish it and drop the
    //    replayed staging (the batch is deterministic, the rows are
    //    already in the pool);
    //  - a manifest-LESS claim is a dead earlier attempt (single-writer
    //    contract: no live rival can exist on the replay path) —
    //    reclaim it and publish normally; the dead attempt's pool
    //    files are unreferenced orphans vacuum collects.
    // The batch path (epoch = None) keeps the strict guard: an existing
    // claim there IS a concurrent-writer conflict and must throw.
    val replayedClaim = epoch.isDefined && Files.exists(vdir)
    if (replayedClaim) {
      val ourMarker = epoch.exists { case (w, e) =>
        markerAt(path, next).contains((w, e)) }
      if (ourMarker && Files.exists(vdir.resolve("manifest.txt"))) {
        VersionedV2.writeAtomically(Paths.get(path, "_latest.txt"),
          next.toString)
        cleanupStaging(path, queryId)
        return
      }
      require(!Files.exists(vdir.resolve("manifest.txt")),
        s"VersionedV2: version $next already holds another writer's commit")
      deleteDirContents(vdir)
    } else {
      Files.createDirectory(vdir)
    }
    val dataDir = Paths.get(path, "data")
    Files.createDirectories(dataDir)
    val moved = staged.map { s =>
      val finalName = s"$queryId-${s.name}"
      Files.move(stagingDir(path, queryId).resolve(s.name),
        dataDir.resolve(finalName), StandardCopyOption.ATOMIC_MOVE)
      finalName
    }
    // the marker lands BEFORE the manifest/pointer: it only takes
    // effect through epochCommitted once the pointer covers it, and
    // the recovery above handles every crash point in between
    epoch.foreach { case (w, e) =>
      VersionedV2.writeAtomically(vdir.resolve("epoch.txt"), markerOf(w, e)) }
    VersionedV2.writeAtomically(vdir.resolve("manifest.txt"),
      (prev ++ moved).mkString("\n"))
    VersionedV2.writeAtomically(Paths.get(path, "_latest.txt"), next.toString)
    cleanupStaging(path, queryId)
  }

  private[sources] def deleteDirContents(dir: Path): Unit = {
    val s = Files.list(dir)
    val inside = try s.iterator().asScala.toSeq finally s.close()
    inside.foreach(Files.deleteIfExists(_))
  }

  def cleanupStaging(path: String, queryId: String): Unit = {
    val dir = stagingDir(path, queryId)
    if (Files.exists(dir)) {
      val s = Files.list(dir)
      val staged = try s.iterator().asScala.toSeq finally s.close()
      staged.foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(dir)
    }
  }
}

/** The STREAMING sink half (engine ladder: TableCapability.
  * STREAMING_WRITE): every micro-batch epoch publishes as ONE new
  * version through the same two-phase commit as the batch path, with
  * an epoch marker recorded in the version directory — so a restarted
  * query replaying its last epoch is EXACTLY-ONCE (the replay is
  * recognized and dropped; VersionedV2Spec pins the double-commit).
  * Complete-mode arrives as truncate: each epoch rewrites the
  * manifest, append mode extends it — versions stay immutable
  * snapshots either way, and readers time-travel across epochs.
  */
private[sources] class VersionedStreamingWrite(
    path: String, queryId: String, writerId: String, truncate: Boolean,
    extra: Seq[String])
  extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(VersionedCommit.stagingDir(path, queryId))
    new VersionedStreamingWriterFactory(path, queryId, extra)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit =
    VersionedCommit.publish(path, queryId, truncate,
      messages.collect { case s: StagedFile => s },
      epoch = Some((writerId, epochId)))

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    VersionedCommit.cleanupStaging(path, queryId)
}

private[sources] class VersionedStreamingWriterFactory(
    path: String, queryId: String, extra: Seq[String])
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new VersionedDataWriter(path, queryId, partitionId, taskId,
      suffix = s"-e$epochId", extra = extra)
}

private[sources] class VersionedWriterFactory(path: String, queryId: String,
                                              extra: Seq[String])
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new VersionedDataWriter(path, queryId, partitionId, taskId, extra = extra)
}

/** Streams rows to this task's OWN staging file; `commit` names it,
  * `abort` deletes it — a partial file from a failed attempt can
  * never be published.
  *
  * Line format: `id,rawLongBits(val)` plus one field per evolved
  * column in schema order — longs as decimal text, doubles as raw
  * bits (the same bit-exact trick as `val`), strings base64-encoded
  * (no comma/newline can escape into the framing), NULL as the
  * one-byte marker `-` (outside the base64 and decimal alphabets). A
  * file written before an evolution simply has fewer fields per line;
  * the reader null-fills the missing tail, which is what add-column
  * means.
  */
private[sources] class VersionedDataWriter(
    path: String, queryId: String, partitionId: Int, taskId: Long,
    suffix: String = "", extra: Seq[String] = Nil)
  extends DataWriter[InternalRow] {

  private val name = s"part-$partitionId-$taskId$suffix.txt"
  private val file = Paths.get(path, "_staging", queryId, name)
  private lazy val out = {
    Files.createDirectories(file.getParent)
    Files.newBufferedWriter(file, StandardCharsets.UTF_8)
  }
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    // id,rawLongBits(val): bit-exact double round trip
    out.write(record.getLong(0).toString)
    out.write(',')
    out.write(java.lang.Double.doubleToRawLongBits(record.getDouble(1)).toString)
    extra.zipWithIndex.foreach { case (t, j) =>
      val i = 2 + j
      out.write(',')
      if (record.isNullAt(i)) out.write("-")
      else t match {
        case "long" => out.write(record.getLong(i).toString)
        case "double" => out.write(
          java.lang.Double.doubleToRawLongBits(record.getDouble(i)).toString)
        case "string" => out.write(java.util.Base64.getEncoder.encodeToString(
          record.getUTF8String(i).toString.getBytes(StandardCharsets.UTF_8)))
      }
    }
    out.write('\n')
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    StagedFile(name, rows)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    Files.deleteIfExists(file)
  }

  override def close(): Unit = ()
}

// ---------------------------------------------------------------- read side

private[sources] class VersionedScan(path: String, version: Int,
                                     extra: Seq[String])
  extends Scan with Batch with Serializable {
  override def readSchema(): StructType = VersionedV2.schemaAt(path, version)
  override def toBatch: Batch = this
  override def description(): String = s"GraftVersionedV2[$path v$version]"

  override def planInputPartitions(): Array[InputPartition] =
    VersionedV2.manifest(path, version)
      .map(f => VersionedFilePartition(s"$path/data/$f")).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val extraTypes = extra // serializable capture, not the Scan itself
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val lines = Files.readAllLines(
          Paths.get(p.asInstanceOf[VersionedFilePartition].file),
          StandardCharsets.UTF_8)
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < lines.size }
          override def get(): InternalRow = {
            val parts = lines.get(i).split(",", -1)
            val vals = new Array[Any](2 + extraTypes.size)
            vals(0) = parts(0).toLong
            vals(1) = java.lang.Double.longBitsToDouble(parts(1).toLong)
            extraTypes.zipWithIndex.foreach { case (t, j) =>
              val k = 2 + j
              // a pre-evolution file has fewer fields: null-fill
              vals(k) =
                if (k >= parts.length || parts(k) == "-") null
                else t match {
                  case "long" => parts(k).toLong
                  case "double" => java.lang.Double.longBitsToDouble(parts(k).toLong)
                  case "string" => UTF8String.fromBytes(
                    java.util.Base64.getDecoder.decode(parts(k)))
                }
            }
            new GenericInternalRow(vals)
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}

private[graft] case class VersionedFilePartition(file: String)
  extends InputPartition
