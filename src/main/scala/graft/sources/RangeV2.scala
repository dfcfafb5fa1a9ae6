package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSourceV2 batch source (`format("graft.sources.RangeV2")`):
  * a deterministic keyed-row generator — (id BIGINT, val DOUBLE with
  * val = ((id·2654435761) mod 1000003) / 1000003) — that implements
  * REAL pushdown at the connector boundary:
  *
  *  - `SupportsPushDownFilters`: id-range predicates (>, >=, <, <=, =)
  *    NARROW THE SCAN ITSELF — pruned splits are never planned, the
  *    filter disappears from the query plan (no residual FilterExec),
  *    which is the property a 100 TB table source must have for
  *    partition elimination to mean anything.
  *  - `SupportsPushDownRequiredColumns`: a projection of `id` never
  *    materializes `val` (column pruning at the reader).
  *  - `planInputPartitions`: the surviving range splits into `slices`
  *    even partitions — parallelism is a first-class option, like the
  *    built-in `range` source.
  *
  * The generator arithmetic is pure int64 + one division, so a DuckDB
  * `generate_series` replays every row — the source is oracle-checkable
  * end to end (`source_rangev2` in SourceQueries).
  */
class RangeV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeV2Table(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object RangeV2 {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false)))

  def valOf(id: Long): Double = ((id * 2654435761L) % 1000003L) / 1000003.0

  /** Shared id-column matcher for the filter/aggregate/runtime
    * pushdown paths — one rule so the three boundaries cannot drift.
    */
  private[sources] def isId(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    }
}

private[sources] class RangeV2Table(start: Long, end: Long, slices: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_range[$start,$end)"
  override def schema(): StructType = RangeV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeV2ScanBuilder(start, end, slices)
}

private[sources] class RangeV2ScanBuilder(start: Long, end: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
  with SupportsPushDownLimit {

  private var lo = start
  private var hi = end // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = RangeV2.schema
  private var pushedAggs: Option[Seq[AggregateFunc]] = None
  private var limit: Option[Int] = None

  /** Engine-ladder rung 6: LIMIT pushdown. The generator truncates its
    * own range to the first `l` ids (any `l` rows satisfy a LIMIT, and
    * the pruned-range prefix is the cheapest deterministic choice), so
    * a `LIMIT 5` over a trillion-row range plans 5 rows of work — and
    * because the truncation is EXACT (≤ l rows leave the source,
    * across all slices), the push is total: `isPartiallyPushed =
    * false` lets Spark drop its own global Limit instead of keeping a
    * safety net.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = false

  /** COUNT(*) / COUNT(id) / MIN(id) / MAX(id) / SUM(id) over the
    * (filter-narrowed) range have CLOSED FORMS — n, lo, hi−1,
    * n·(lo+hi−1)/2 — so the whole aggregation COLLAPSES INTO THE
    * CONNECTOR: no rows are generated at all, the scan emits one
    * pre-aggregated row (the engine-ladder rung above filter
    * pushdown — at 100 TB this is "answer count(*) from metadata",
    * the property real table formats get from file statistics).
    * DISTINCT variants are accepted because id is unique by
    * construction. Anything over `val`, or any GROUP BY, declines
    * (returns false) and runs as a normal scan + Spark aggregate.
    */
  private def supported(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall {
      case _: CountStar => true
      case c: Count => RangeV2.isId(c.column())
      case m: Min => RangeV2.isId(m.column())
      case m: Max => RangeV2.isId(m.column())
      case s: Sum => RangeV2.isId(s.column())
      case _ => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean = supported(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (!supported(agg)) false
    else { pushedAggs = Some(agg.aggregateExpressions().toSeq); true }

  // v + 1 clamped at Long.MaxValue. Exact, not approximate: rows satisfy
  // id < hi <= Long.MaxValue (hi is an exclusive Long bound), so id ==
  // Long.MaxValue is unrepresentable in this source — `id <= MaxValue` is
  // vacuously true (clamp leaves hi alone) and `id = MaxValue` /
  // `id > MaxValue - 1` correctly yield an empty scan instead of a
  // wrapped-negative bound that would silently drop every row.
  private def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, succ(v)); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    accepted = handled
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = pushedAggs match {
    case Some(aggs) => new RangeV2AggScan(lo, math.max(lo, hi), aggs)
    case None =>
      val hiBound = math.max(lo, hi)
      // limit truncation AFTER filter narrowing: the first l surviving
      // ids. width wraps NEGATIVE when the range is wider than 2^63
      // (lo deeply negative, hi huge) — that case must still truncate:
      // Spark already dropped its global Limit on our total-push
      // promise, so skipping truncation here would return the whole
      // range, not l rows. lo + l cannot overflow on either branch
      // (width < 0 forces lo < 0; otherwise width > l bounds l's room).
      val hiLim = limit.fold(hiBound) { l =>
        val width = hiBound - lo
        if (width < 0 || width > l) lo + l else hiBound
      }
      new RangeV2Scan(lo, hiLim, slices, required, limit)
  }
}

/** One-row, one-partition scan carrying the closed-form aggregate
  * values for the pruned range [lo, hi): n rows exist, ids are the
  * integers lo..hi−1. Long-sum overflow wraps exactly like Spark's
  * own non-ANSI long sum (BigInt arithmetic truncated to int64).
  */
private[sources] class RangeV2AggScan(lo: Long, hi: Long,
                                      aggs: Seq[AggregateFunc])
  extends Scan with Batch with Serializable {

  private val n = math.max(0L, hi - lo)

  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (f, i) =>
      StructField(s"agg_$i", LongType, nullable = !f.isInstanceOf[CountStar] &&
        !f.isInstanceOf[Count])
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeV2Agg[$lo,$hi) ${aggs.map(_.toString).mkString(", ")}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeV2Partition(0, 1)) // one synthetic split for the one row

  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = aggs.map {
      case _: CountStar => java.lang.Long.valueOf(n)
      case _: Count => java.lang.Long.valueOf(n)
      case _: Min => if (n > 0) java.lang.Long.valueOf(lo) else null
      case _: Max => if (n > 0) java.lang.Long.valueOf(hi - 1) else null
      case _: Sum =>
        if (n == 0) null
        else {
          val s = (BigInt(lo) + BigInt(hi - 1)) * BigInt(n) / 2
          java.lang.Long.valueOf(s.longValue)
        }
    }.toArray
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = new GenericInternalRow(values)
          override def close(): Unit = ()
        }
    }
  }
}

private[graft] case class RangeV2Partition(lo: Long, hi: Long)
  extends InputPartition

private[sources] class RangeV2Scan(lo: Long, hi: Long, slices: Int,
                                   required: StructType,
                                   pushedLimit: Option[Int] = None)
  extends Scan with Batch with Serializable
  with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  /** Planning-time statistics from the STATIC pushdown envelope
    * (runtime filters narrow later, after join planning): exact row
    * count and 8 bytes per fixed-width projected column. This is the
    * CBO rung above pushdown — a filtered slice of the source under
    * the broadcast threshold broadcasts WITHOUT a hint, where the
    * DSv2 default (defaultSizeInBytes = huge) would have forced a
    * sort-merge join. `SupportsReportPartitioning` is deliberately
    * NOT implemented: DSv2 key-grouped partitioning describes
    * bucket/identity transforms, and this source's contiguous id
    * ranges are neither — reporting UnknownPartitioning would claim
    * nothing Spark can use.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    private val bytes = (BigInt(rows) * (8L * math.max(1, required.fields.length)))
      .min(BigInt(Long.MaxValue)).toLong
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  // runtime-narrowed bounds (RUNTIME filtering — the rung above static
  // pushdown): when this scan is the probe side of a join whose build
  // side is broadcastable, Spark's dynamic partition pruning delivers
  // the build side's join-key values as an IN predicate AT EXECUTION
  // TIME; narrowing [lo, hi) to the values' min/max envelope prunes
  // splits that static planning could not know to drop — the DSv2
  // equivalent of partition-level DPP on a 100 TB partitioned table.
  // Best-effort by contract: the join's own equality re-filters, so
  // envelope narrowing (not exact membership) is sufficient AND keeps
  // split planning O(1) regardless of the value-list size.
  private var rlo = lo
  private var rhi = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty &&
          RangeV2.isId(p.children().head)) {
        val given = p.children().drop(1).toSeq
        val vals = given.collect {
          case l: V2Literal[_] if l.value().isInstanceOf[java.lang.Long] =>
            l.value().asInstanceOf[java.lang.Long].longValue()
        }
        if (vals.nonEmpty && vals.length == given.length) {
          // narrow ONLY when EVERY value parsed as a Long literal: a
          // mixed list (some values in a representation this
          // best-effort filter doesn't know) must not shrink the
          // envelope to the parsed subset's min/max — that could prune
          // splits an unparsed value would have matched
          rlo = math.max(rlo, vals.min)
          rhi = math.min(rhi, if (vals.max == Long.MaxValue) Long.MaxValue
            else vals.max + 1)
        } else if (given.isEmpty) {
          rhi = rlo // GENUINELY empty build side: nothing can match
        }
        // any unparsed value present: NO-OP — an uninterpreted runtime
        // filter must widen to the full scan, never narrow or empty it
      }
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"GraftRangeV2[$lo,$hi) slices=$slices" +
    pushedLimit.fold("")(l => s" PushedLimit=$l")

  override def planInputPartitions(): Array[InputPartition] = {
    val n = rhi - rlo
    if (n <= 0) Array.empty
    else {
      val k = math.min(slices.toLong, n).toInt
      (0 until k).map { i =>
        RangeV2Partition(rlo + n * i / k, rlo + n * (i + 1) / k)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = required.fieldNames
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val part = p.asInstanceOf[RangeV2Partition]
        new PartitionReader[InternalRow] {
          private var cur = part.lo - 1
          override def next(): Boolean = { cur += 1; cur < part.hi }
          override def get(): InternalRow = {
            val vals = fields.map {
              case "id"  => java.lang.Long.valueOf(cur)
              case "val" => java.lang.Double.valueOf(RangeV2.valOf(cur))
            }
            new GenericInternalRow(vals.asInstanceOf[Array[Any]])
          }
          override def close(): Unit = ()
        }
      }
    }
  }
}
