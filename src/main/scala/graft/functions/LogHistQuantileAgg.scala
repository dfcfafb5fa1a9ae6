package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.operators.QuantileSketch

/** Deterministic log-histogram quantile AGGREGATE — the
  * [[graft.operators.QuantileSketch]] geometric-bucket construction
  * packaged as a single aggregate expression, so
  * [[graft.plans.ApproxPercentileRewrite]] can swap it in for exact
  * `percentile(x, p)` without touching the rest of the plan.
  *
  * Why this beats exact Percentile at 100 TB: Spark's exact
  * percentile buffers EVERY distinct value with its count per group
  * (an OpenHashMap that grows with the value domain — unbounded on
  * continuous columns and a notorious OOM source), while this buffer
  * is one count per OCCUPIED geometric bucket (~290 per decade-sign
  * range at γ=1.1, bounded regardless of rows) and merges by count
  * addition. Because the bucket of a value is a pure elementary
  * function (no merge-order dependence, unlike t-digest/GK), the
  * result is deterministic and externally replayable — the DuckDB
  * oracle runs the same bucket arithmetic in SQL.
  *
  * The value bucketing calls the StrictMath mirror
  * ([[QuantileSketch.repOf]]) so the aggregate is bit-identical to
  * the relational `repCol` path (Catalyst math expressions are
  * StrictMath-backed — SURVEY §12 learning).
  *
  * Selection rule: quantile q = the first representative (ascending)
  * whose cumulative count reaches q·n — identical to
  * [[QuantileSketch.select]] and its SQL mirror. Empty group → null
  * (matching exact percentile on all-null input).
  */
case class LogHistQuantileAgg(
    child: Expression,
    percentage: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Double, Long]]
  with UnaryLike[Expression] {

  require(percentage >= 0.0 && percentage <= 1.0,
    s"percentage must be in [0, 1], got $percentage")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case DoubleType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"log_hist_quantile expects a double child (cast upstream), got $other")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "log_hist_quantile"

  override def createAggregationBuffer(): mutable.HashMap[Double, Long] =
    mutable.HashMap.empty[Double, Long]

  override def update(
      buf: mutable.HashMap[Double, Long],
      input: InternalRow): mutable.HashMap[Double, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val rep = QuantileSketch.repOf(v.asInstanceOf[Double])
      if (!rep.isNaN) buf.update(rep, buf.getOrElse(rep, 0L) + 1L)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Double, Long],
      other: mutable.HashMap[Double, Long]): mutable.HashMap[Double, Long] = {
    other.foreach { case (rep, c) =>
      buf.update(rep, buf.getOrElse(rep, 0L) + c)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Double, Long]): Any =
    if (buf.isEmpty) null else QuantileSketch.select(buf.toMap, percentage)

  override def serialize(buf: mutable.HashMap[Double, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (rep, c) => bb.putDouble(rep); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Double, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[Double, Long]
    var i = 0
    while (i < n) { buf.update(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LogHistQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LogHistQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): LogHistQuantileAgg =
    copy(child = newChild)
}
