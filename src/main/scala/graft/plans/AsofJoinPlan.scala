package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Descending,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge

/** Native as-of join: the whole-operator Catalyst path (logical node +
  * planner strategy + physical operator) for the backward as-of join
  * that [[graft.operators.AsofJoin.asof]] expresses as union+window.
  *
  * Why a custom operator: the union+window formulation is one shuffle
  * of |L|+|R| rows into a WindowExec that maintains a running
  * `last(ignoreNulls)` over a tagged union row carrying BOTH sides'
  * payload structs — correct and scale-safe, but it widens every row
  * to the union schema and runs outside whole-stage codegen through a
  * window frame evaluator. The native operator instead asks Spark for
  * the two sides hash-clustered on the key and sorted by (key, ts) —
  * the SortMergeJoin contract — and streams the per-partition merge
  * with O(1) state: each left row holds the single most recent right
  * row at or before it. No union row, no window buffer, and the
  * output keeps the left side's partitioning and ordering for reuse
  * by downstream joins/aggregations on the same key.
  *
  * Semantics are IDENTICAL to `AsofJoin.asof` (same oracle replays):
  * each left row picks the most recent right row (by ts) at or before
  * its own timestamp within the same key; right rows sharing
  * (key, ts) resolve to the greatest payload (the exec sorts the
  * right side by the payload columns after ts, and the merge keeps
  * the LAST row advanced past). Null keys NEVER match (equi-join
  * semantics, same as the oracle's SQL join — a null-keyed left row
  * gets null payload). Keys and timestamps must be atomic orderable
  * types.
  *
  * At 100 TB: two hash shuffles (each side its own size — the same
  * total bytes as the union's single shuffle), per-partition sorted
  * merge with constant memory beyond the sort itself, and AQE still
  * owns partition sizing because the exchanges are planner-inserted
  * `ClusteredDistribution` requirements, not manual repartitions.
  *
  * Reference anchor: preprocessor.py has no join surface; this is the
  * engine-layer rung (custom LogicalPlan + Strategy + SparkPlan via
  * SparkSessionExtensions) of the scale mandate.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsofJoinNode]] → [[AsofJoinExec]]. Registered
  * per-session by [[AsofExec.ensureStrategy]] and cluster-wide via
  * `graft.functions.GraftExtensions` (injectPlannerStrategy).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(planLater(n.left), planLater(n.right), n.leftKey, n.leftTs,
        n.rightKey, n.rightTs, n.rightPayload, n.payloadOut, n.forward) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join. Requires both children clustered
  * on their key (EnsureRequirements co-partitions them exactly as it
  * does for SortMergeJoin) and sorted by (key, ts) — the right side
  * additionally by its payload columns so ties on (key, ts) resolve
  * deterministically to the greatest payload, matching the composed
  * operator's struct-ordering tie-break.
  *
  * The merge itself: advance the right iterator while its (key, ts)
  * prefix is lexicographically ≤ the left row's, holding a copy of
  * the last row passed; the hold matches iff its key equals the left
  * key (a hold left over from an earlier key group is stale and
  * yields nulls). O(|L|+|R|) per partition, one held row of state.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightPayload: Seq[Attribute],
    payloadOut: Seq[Attribute],
    forward: Boolean = false) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightPayload.map(SortOrder(_,
        if (forward) Descending else Ascending)))

  // the merge emits left rows in their incoming order — downstream
  // operators on the same key reuse both properties shuffle-free
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, lt, rk, rt) = (leftKey, leftTs, rightKey, rightTs)
    val payload = rightPayload
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lPrefix = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rPrefix = UnsafeProjection.create(Seq(rk, rt), rOut)
      val prefixOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType, lt.dataType))
      val lKeyP = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyP = UnsafeProjection.create(Seq(rk), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      // the right side binds nullable even when the child's attribute
      // is not: unmatched left rows read the all-null row, and a
      // non-nullable BoundReference would skip the null check
      // (BindReferences takes nullability from the INPUT schema)
      val outProj = UnsafeProjection.create(
        lOut ++ payload, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      if (forward) {
        // earliest right at or after: advance STRICTLY-before rows
        // (they can never match this or any later left row — left ts
        // is non-decreasing per key), then the head matches iff its
        // key equals; ties at (key, ts) sorted payload-DESC so the
        // head is the greatest payload, matching the composed operator
        lIter.map { lRow =>
          val lp = lPrefix(lRow)
          while (rNext != null && prefixOrd.compare(rPrefix(rNext), lp) < 0) {
            rNext = if (rIter.hasNext) rIter.next() else null
          }
          // null left keys never match (equi-join semantics — the
          // natural ordering would otherwise pair null with null)
          val lKeyRow = lKeyP(lRow)
          val matched = rNext != null && !lKeyRow.isNullAt(0) &&
            keyOrd.compare(rKeyP(rNext), lKeyRow) == 0
          outProj(joined(lRow, if (matched) rNext else nullRight))
        }
      } else {
        var held: InternalRow = null
        lIter.map { lRow =>
          val lp = lPrefix(lRow)
          // advance while (rKey, rTs) <= (lKey, lTs): rows passed are
          // either earlier keys (stale holds, filtered by the key check
          // below) or this key at ts <= lTs — the last one is the match
          while (rNext != null && prefixOrd.compare(rPrefix(rNext), lp) <= 0) {
            held = rNext.copy()
            rNext = if (rIter.hasNext) rIter.next() else null
          }
          // null left keys never match (equi-join semantics — the
          // natural ordering would otherwise pair null with null)
          val lKeyRow = lKeyP(lRow)
          val matched = held != null && !lKeyRow.isNullAt(0) &&
            keyOrd.compare(rKeyP(held), lKeyRow) == 0
          outProj(joined(lRow, if (matched) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the native operator — drop-in equivalent
  * of [[graft.operators.AsofJoin.asof]] (same argument shape, same
  * output schema, same oracle).
  */
object AsofExec {

  /** Register the strategy on a live session (idempotent). Deployed
    * clusters get it from `spark.sql.extensions=graft.functions
    * .GraftExtensions` instead.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
  }

  /** @param leftCols  left columns to carry through
    * @param rightCols right payload columns, emitted with `prefix`
    *                  (null when no right row precedes the left row)
    */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      leftCols: Seq[String], rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    build(left, right, keyCol, tsCol, leftCols, rightCols, prefix,
      forward = false)

  /** Forward direction: each left row picks the EARLIEST right row at
    * or after its timestamp — drop-in equivalent of
    * [[graft.operators.AsofJoin.asofForward]].
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      leftCols: Seq[String], rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    build(left, right, keyCol, tsCol, leftCols, rightCols, prefix,
      forward = true)

  private def build(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      leftCols: Seq[String], rightCols: Seq[String],
      prefix: String, forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val l = left.select(col(keyCol) +: col(tsCol) +: leftCols.map(col): _*)
    // payload columns aliased positionally — rightCols may repeat the
    // ts/key names (e.g. carrying the matched ts through)
    val r = right.select(col(keyCol).as("__asof_k") +:
      col(tsCol).as("__asof_t") +:
      rightCols.zipWithIndex.map { case (c, i) => col(c).as(s"__asof_p$i") }: _*)
    val lPlan = ColumnBridge.analyzed(l)
    val rPlan = ColumnBridge.analyzed(r)
    val (lOut, rOut) = (lPlan.output, rPlan.output)
    val payload = rOut.drop(2)
    val payloadOut = payload.zip(rightCols).map { case (a, c) =>
      AttributeReference(s"$prefix$c", a.dataType, nullable = true)()
    }
    val node = AsofJoinNode(lPlan, rPlan, lOut.head, lOut(1),
      rOut.head, rOut(1), payload, payloadOut, forward)
    // column order matches AsofJoin.asof: key, ts, leftCols, prefixed
    ColumnBridge.ofRows(spark, node)
  }
}
