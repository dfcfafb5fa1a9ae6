package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gram accumulation state: a fast int64 partial per cell plus an
  * overflow-safe arbitrary-precision total the partial spills into.
  * Per-row coordinate products are ≤ ~2^44 (micro-units ≤ ~4e6 for
  * |x| ≲ 4e3-magnitude embedding coordinates), so the int64 partial
  * absorbs millions of rows between spills; the BigInt tier makes the
  * TOTAL exact at any scale — 10⁹-row shards merged by addition can
  * exceed int64 (≈9.2e18) in micro² units, which is exactly where the
  * old decimal(38,0) shuffle sum lived.
  */
final class GramBuffer(val cells: Int) {
  val part = new Array[Long](cells)
  var total: Array[BigInt] = _

  private val spillAt = Long.MaxValue / 2

  def add(idx: Int, v: Long): Unit = {
    val p = part(idx) + v
    if (p > spillAt || p < -spillAt) {
      if (total == null) total = Array.fill(cells)(BigInt(0))
      total(idx) += BigInt(p)
      part(idx) = 0L
    } else part(idx) = p
  }

  def cellTotal(idx: Int): BigInt =
    (if (total == null) BigInt(0) else total(idx)) + BigInt(part(idx))

  def mergeIn(other: GramBuffer): Unit = {
    var i = 0
    while (i < cells) {
      add(i, other.part(i))
      i += 1
    }
    if (other.total != null) {
      if (total == null) total = Array.fill(cells)(BigInt(0))
      var j = 0
      while (j < cells) { total(j) += other.total(j); j += 1 }
    }
  }
}

/** Exact gram-matrix aggregate over a micro-quantized (int64)
  * embedding column: ONE buffer of d(d+1)/2 (upper triangle) or d²
  * cells per partition, updated IN PLACE — no row amplification.
  *
  * Why not the declarative double-posexplode + groupBy: that plan
  * materializes d² = 4096 generator rows per input row and pushes each
  * through a hash-aggregate probe — ~4×10¹² aggregate updates at 10⁹
  * input rows (r7 VERDICT). Here each input row is d(d+1)/2 in-place
  * long adds in one pass over the array, the shuffle carries one
  * ≤ ~33 KB buffer per partition, and buffers merge by cell addition —
  * the same mergeable-by-addition contract the gram cells themselves
  * expose to shard-level composition.
  *
  * Null semantics match the explode plan it replaces: a null element
  * mᵢ nullified every (i, ·) product there, i.e. contributed nothing —
  * here those pairs are skipped.
  */
case class GramAgg(
    child: Expression,
    d: Int,
    upperOnly: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer]
  with UnaryLike[Expression] {

  private val cells = if (upperOnly) d * (d + 1) / 2 else d * d

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"gram_agg expects array<bigint> (micro-quantized vector), got $other")
    }
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("rawd", DecimalType(38, 0), nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(cells)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_agg: expected $d-dim vector, got ${arr.numElements()}")
      var i = 0
      var idx = 0
      while (i < d) {
        if (arr.isNullAt(i)) {
          // skip this row of pairs, keeping idx aligned
          idx += (if (upperOnly) d - i else d)
        } else {
          val mi = arr.getLong(i)
          var j = if (upperOnly) i else 0
          while (j < d) {
            if (!arr.isNullAt(j)) buf.add(idx, mi * arr.getLong(j))
            idx += 1
            j += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: GramBuffer): Any = {
    val rows = new Array[Any](cells)
    var i = 0
    var idx = 0
    while (i < d) {
      var j = if (upperOnly) i else 0
      while (j < d) {
        rows(idx) = InternalRow(i, j,
          Decimal(BigDecimal(buf.cellTotal(idx)), 38, 0))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.cells)
    var i = 0
    while (i < buf.cells) { out.writeLong(buf.part(i)); i += 1 }
    out.writeBoolean(buf.total != null)
    if (buf.total != null) {
      var j = 0
      while (j < buf.cells) {
        val b = buf.total(j).toByteArray
        out.writeInt(b.length)
        out.write(b)
        j += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new GramBuffer(n)
    var i = 0
    while (i < n) { buf.part(i) = in.getLong; i += 1 }
    val hasTotal = in.get() != 0
    if (hasTotal) {
      buf.total = new Array[BigInt](n)
      var j = 0
      while (j < n) {
        val len = in.getInt
        val b = new Array[Byte](len)
        in.get(b)
        buf.total(j) = BigInt(new java.math.BigInteger(b))
        j += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}
