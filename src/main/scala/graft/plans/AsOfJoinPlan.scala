package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkStrategy

/** Native keyed ASOF join operator — the full custom-operator tier
  * (LogicalPlan + Strategy + SparkPlan), SURVEY §4.2 "custom
  * SparkStrategy justified for keyed ASOF at scale".
  *
  * Physical shape: both children hash-clustered on the join key and
  * sorted by (key, ts); one streaming merge pass per partition holding
  * O(1) state (the latest slave row for the current key). Contrast with
  * the union-merge window lowering, which buffers a window frame; both
  * are single-shuffle, this one is allocation-free per row.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], strict: Boolean,
    toleranceMicros: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], strict: Boolean,
    toleranceMicros: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    // payload joins the slave sort so ties on (key, ts) resolve to the
    // greatest payload deterministically — the same contract as the
    // union-merge window lowering's struct ordering
    ((rightKeys :+ rightTs) ++
      payload.filter(a => RowOrdering.isOrderable(a.dataType)))
      .map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyIdx = leftKeys.map(a => leftOut.indexWhere(_.exprId == a.exprId))
    val rKeyIdx = rightKeys.map(a => rightOut.indexWhere(_.exprId == a.exprId))
    val lTsIdx = leftOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsIdx = rightOut.indexWhere(_.exprId == rightTs.exprId)
    val keyTypes = leftKeys.map(_.dataType)
    val payloadAttrs = payload
    val isStrict = strict
    val tolUs = toleranceMicros.getOrElse(Long.MaxValue)

    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (mIter, sIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      // downstream operators expect UnsafeRow; the payload side of the
      // joined row must be treated nullable (unmatched masters)
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ payloadAttrs.map(_.withNullability(true)))
      val joiner = new JoinedRow
      val nullPayload = InternalRow.fromSeq(Seq.fill(payloadAttrs.size)(null))
      val ord = keyTypes.map(
        org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering)

      def keyCmp(a: Array[Any], b: Array[Any]): Int = {
        var i = 0
        while (i < a.length) {
          val c = ord(i).asInstanceOf[Ordering[Any]].compare(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
      // Key values are held across slave-iterator advances, but
      // InternalRow.get returns *views* into the UnsafeRow buffer for
      // non-primitive types (UTF8String, struct/array/map), and the
      // sorter's spill reader reuses that buffer — so copy at extraction
      // or stored keys silently mutate under memory pressure.
      def copyVal(v: Any): Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case x => x
      }
      def keysOf(r: InternalRow, idx: Seq[Int], types: Seq[org.apache.spark.sql.types.DataType]): Array[Any] =
        idx.zip(types).map { case (i, t) => copyVal(r.get(i, t)) }.toArray

      new Iterator[InternalRow] {
        private var sNext: InternalRow = _
        private var sNextKey: Array[Any] = _
        private var sNextTs: Long = 0L
        private var have = advanceSlaveRaw()

        private var matchKey: Array[Any] = _
        private var matchPayload: InternalRow = _
        private var matchTs: Long = Long.MinValue

        private def advanceSlaveRaw(): Boolean = {
          if (sIter.hasNext) {
            val r = sIter.next()
            sNextKey = keysOf(r, rKeyIdx, keyTypes)
            sNextTs = r.getLong(rTsIdx)
            sNext = r
            true
          } else { sNext = null; false }
        }

        override def hasNext: Boolean = mIter.hasNext

        override def next(): InternalRow = {
          val m = mIter.next()
          val mKey = keysOf(m, lKeyIdx, keyTypes)
          val mTs = m.getLong(lTsIdx)
          // consume every slave row usable by this master
          var continue = have
          while (continue) {
            val c = keyCmp(sNextKey, mKey)
            val usable = c < 0 || (c == 0 &&
              (if (isStrict) sNextTs < mTs else sNextTs <= mTs))
            if (usable) {
              if (c == 0) {
                matchKey = sNextKey; matchPayload = payloadProj(sNext).copy()
                matchTs = sNextTs
              } else { matchKey = null; matchPayload = null } // stale key, drop state
              continue = advanceSlaveRaw()
              have = continue
            } else continue = false
          }
          val matched = matchKey != null && keyCmp(matchKey, mKey) == 0 && mTs - matchTs <= tolUs
          numOutputRows += 1
          if (matched) numMatched += 1
          outProj(joiner(m, if (matched) matchPayload else nullPayload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload, strict, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload, strict, tol) :: Nil
    case _ => Nil
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectResolutionRule(_ => ArrayBroadcastRule)
    e.injectResolutionRule(_ => TimestampArithRule)
    e.injectResolutionRule(_ => RefArrayCastRule)
    e.injectResolutionRule(_ => RefDoubleSortNullsRule)
    e.injectResolutionRule(_ => RefIntegerDivideRule)
    e.injectResolutionRule(_ => RefInListCoercionRule)
    e.injectResolutionRule(_ => RefTsNumberCompareRule)
    e.injectResolutionRule(_ => NsTimestampInputRule)
    e.injectResolutionRule(_ => NsMetaPropagationRule)
    e.injectResolutionRule(_ => NsSetOpCoercionRule)
    e.injectResolutionRule(_ => RefSetOpAllRule)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_promote"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PromoteIntToDouble].getName, "__graft_promote"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PromoteIntToDouble(children.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_flat"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FlattenDeep].getName, "__graft_flat"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FlattenDeep(children.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_dbl"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[UserDoubleCast].getName, "__graft_dbl"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UserDoubleCast(children.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_arrd"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WidenArrayToDouble].getName, "__graft_arrd"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WidenArrayToDouble(children.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_shift"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ArrayShiftExpr].getName, "__graft_shift"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayShiftExpr(children.head, children(1), children(2))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_mat2dl"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PromoteMat2D].getName, "__graft_mat2dl"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PromoteMat2D(children.head, rightSide = false)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__graft_mat2dr"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PromoteMat2D].getName, "__graft_mat2dr"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PromoteMat2D(children.head, rightSide = true)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__ref_sign"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.RefSignExpr].getName, "__ref_sign"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RefSignExpr(children.head)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__ref_round"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.RefRoundExpr].getName, "__ref_round"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RefRoundExpr(children.head, children(1), children(2))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("__dim_length"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DimLengthExpr].getName, "__dim_length"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DimLengthExpr(children.head, children(1))))
  }
}
