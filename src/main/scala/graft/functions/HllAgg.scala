package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HyperLogLog distinct-count AGGREGATE — the
  * [[graft.operators.HllSketch]] register construction packaged as a
  * single aggregate expression, so a multi-column single-pass
  * aggregation (e.g. [[graft.prep.Profiler]]) can carry one sketch per
  * column with no Expand multiplication and no extra shuffle.
  *
  * The child must be the md5 HEX STRING `md5(cast(col as string))` —
  * hashing stays in declarative Spark expressions so the register
  * file is bit-identical to [[graft.operators.HllSketch.registers]]
  * (and therefore to the DuckDB-replayed oracle): this aggregate only
  * parses the first 8 hex chars (h32), splits register/rank, and maxes.
  *
  * State: one m-byte rank array; merges by pairwise max — the
  * standard HLL shard-merge. Estimate arithmetic mirrors
  * `HllSketch.estCol` term for term (every 2^-r term is a dyadic
  * rational on a 2^-24 grid and partial sums stay < 2^9, so the sum
  * is EXACT in double regardless of order — the two paths agree
  * bit-for-bit, which PcaSpec-style agreement specs assert).
  */
case class HllAgg(
    child: Expression,
    m: Int = 512,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(m > 0 && (m & (m - 1)) == 0 && m <= 65536,
    s"m must be a power of two <= 65536, got $m")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case StringType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"hll_agg expects the md5 hex string (md5(cast(col as string))), got $other")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      // first 32 hash bits — identical to conv(substring(md5, 1, 8), 16, 10)
      val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val j = (h % m).toInt
      val w = h / m
      val r = (if (w == 0) 24
      else 24 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (r > buf(j)) buf(j) = r
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sPresent = 0.0
    var nPresent = 0
    var i = 0
    while (i < m) {
      if (buf(i) != 0) {
        sPresent += math.pow(2.0, -buf(i).toDouble)
        nPresent += 1
      }
      i += 1
    }
    val s = sPresent + (m - nPresent).toDouble
    val v = m - nPresent
    val raw = alpha * m.toDouble * m / s
    if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}
