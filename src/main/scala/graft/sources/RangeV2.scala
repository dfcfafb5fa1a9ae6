package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
  with SupportsPushDownRequiredColumns {

  private var lo = start
  private var hi = end // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = RangeV2.schema

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

  override def build(): Scan = new RangeV2Scan(lo, math.max(lo, hi), slices, required)
}

private[sources] case class RangeV2Partition(lo: Long, hi: Long)
  extends InputPartition

private[sources] class RangeV2Scan(lo: Long, hi: Long, slices: Int,
                                   required: StructType)
  extends Scan with Batch with Serializable {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"GraftRangeV2[$lo,$hi) slices=$slices"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val k = math.min(slices.toLong, n).toInt
      (0 until k).map { i =>
        RangeV2Partition(lo + n * i / k, lo + n * (i + 1) / k)
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
