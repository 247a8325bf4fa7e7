package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Elementwise broadcast of scalar arithmetic over array columns
  * (reference `DoubleArrayOperatorFactory` family: `3.0 + arr`,
  * `arr * 2`, `arr1 + arr2`, unary minus — applied recursively through
  * any number of dims). Spark's binary arithmetic rejects
  * scalar ⊕ array, so this analyzer rule lowers the mixed forms to
  * `transform`/`zip_with` lambdas before type-checking fails — the
  * lambdas stay inside whole-stage codegen, no UDFs.
  */
object ArrayBroadcastRule extends Rule[LogicalPlan] {

  private def isNum(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private def isNumArray(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => isNum(et) || isNumArray(et)
    case _ => false
  }

  private var counter = 0L
  private def freshVar(): UnresolvedNamedLambdaVariable = synchronized {
    counter += 1
    UnresolvedNamedLambdaVariable(Seq(s"__abx$counter"))
  }

  private def rebuild(op: BinaryArithmetic, l: Expression, r: Expression): Expression =
    op.withNewChildren(Seq(l, r))

  private def depth(dt: DataType): Int = dt match {
    case ArrayType(et, _) => 1 + depth(et)
    case _ => 0
  }

  /** scalar ⊕ array / array ⊕ scalar / array ⊕ array. Rank-mismatched
    * operands broadcast numpy-style over TRAILING dims (reference
    * `cairo/arr/DerivedArrayView.broadcast`: the lower-rank operand is
    * repeated along the leading dims): a 4×3 matrix ⊕ a 3-vector
    * applies the vector to every ROW — so the deeper side is descended
    * with transform() until ranks match, then zip_with pairs elements.
    * Element types are threaded explicitly: a fresh lambda variable's
    * own dataType is unknown until ResolveLambdaVariables binds it. */
  private def broadcast(op: BinaryArithmetic, l: Expression, lt: DataType,
                        r: Expression, rt: DataType): Expression =
    (lt, rt) match {
      case (ArrayType(let, _), _) if isNumArray(lt) && isNum(rt) =>
        val x = freshVar()
        ArrayTransform(l, LambdaFunction(broadcast(op, x, let, r, rt), Seq(x)))
      case (_, ArrayType(ret, _)) if isNum(lt) && isNumArray(rt) =>
        val x = freshVar()
        ArrayTransform(r, LambdaFunction(broadcast(op, l, lt, x, ret), Seq(x)))
      case (ArrayType(let, _), _) if isNumArray(lt) && isNumArray(rt) &&
          depth(lt) > depth(rt) =>
        val x = freshVar()
        ArrayTransform(l, LambdaFunction(broadcast(op, x, let, r, rt), Seq(x)))
      case (_, ArrayType(ret, _)) if isNumArray(lt) && isNumArray(rt) &&
          depth(rt) > depth(lt) =>
        val x = freshVar()
        ArrayTransform(r, LambdaFunction(broadcast(op, l, lt, x, ret), Seq(x)))
      case (ArrayType(let, _), ArrayType(ret, _)) if isNumArray(lt) && isNumArray(rt) =>
        val x = freshVar(); val y = freshVar()
        ZipWith(l, r, LambdaFunction(broadcast(op, x, let, y, ret), Seq(x, y)))
      case _ => rebuild(op, l, r)
    }

  /** Same nesting with every numeric leaf widened to double. */
  private def doubled(dt: DataType): DataType = dt match {
    case ArrayType(et, n) => ArrayType(doubled(et), n)
    case _: NumericType => DoubleType
    case other => other
  }

  private def rewriteExpr(e: Expression): Expression = e match {
    case op: BinaryArithmetic if op.left.resolved && op.right.resolved &&
        (isNumArray(op.left.dataType) || isNumArray(op.right.dataType)) =>
      broadcast(op, op.left, op.left.dataType, op.right, op.right.dataType)
    case neg: UnaryMinus if neg.child.resolved && isNumArray(neg.child.dataType) =>
      val x = freshVar()
      ArrayTransform(neg.child, LambdaFunction(UnaryMinus(x), Seq(x)))
    // array comparison across numeric element types (a DOUBLE[] column
    // vs an ARRAY[...] literal that parsed as decimals): widen both
    // sides to double leaves
    case cmp: BinaryComparison if cmp.left.resolved && cmp.right.resolved &&
        isNumArray(cmp.left.dataType) && isNumArray(cmp.right.dataType) &&
        cmp.left.dataType != cmp.right.dataType =>
      def depth(dt: DataType): Int = dt match {
        case ArrayType(et, _) => 1 + depth(et); case _ => 0
      }
      if (depth(cmp.left.dataType) != depth(cmp.right.dataType))
        cmp match { // shape mismatch can never be equal (reference false)
          case (_: EqualTo | _: EqualNullSafe) => Literal(false)
          case _ => cmp
        }
      else cmp.withNewChildren(Seq(
        Cast(cmp.left, doubled(cmp.left.dataType)),
        Cast(cmp.right, doubled(cmp.right.dataType))))
    case other => other
  }

  private def integralLeaves(dt: DataType): Boolean = dt match {
    case ArrayType(et, _) => integralLeaves(et)
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ref = conf.getConfString("graft.dialect.refSemantics", "false").toBoolean
    val _ = ref // user-literal widening is textual (DialectRewrites)
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case e @ (_: BinaryArithmetic | _: UnaryMinus | _: BinaryComparison) => rewriteExpr(e)
      }
    }
  }
}

/** Timestamp ± integer arithmetic (reference semantics: a TIMESTAMP is
  * an epoch-micros long, so `ts - 80000` subtracts 80 ms and
  * `ts1 - ts2` is a micros delta). Spark rejects both; this rule
  * lowers them to unix_micros/timestamp_micros round-trips at
  * resolution time.
  */
object TimestampArithRule extends Rule[LogicalPlan] {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    // `ts + x/60*840000` — Spark's `/` promotes integers to DOUBLE where
    // the reference divides integrally; the micros delta truncates back
    // (reference timestamp arithmetic is long-valued)
    case DoubleType | FloatType => true
    case _ => false
  }
  private def isTs(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }
  private def isNarrow(dt: DataType): Boolean = dt match {
    case ByteType | ShortType => true
    case _ => false
  }
  private def micros(e: Expression): Expression = UnixMicros(Cast(e, TimestampType))
  private def fromMicros(e: Expression): Expression = MicrosToTimestamp(e)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        // ResolveBinaryArithmetic has already lowered `ts ± x` to the
        // datetime-specific forms by the time this rule runs — match
        // those, not Add/Subtract
        case SubtractTimestamps(l, r, _, _) if l.resolved && r.resolved &&
            isTs(l.dataType) && isIntegral(r.dataType) =>
          fromMicros(Subtract(micros(l), Cast(r, LongType)))
        // ts − ts is a LONG micros difference in the reference (no
        // interval type — `T3.created-T4.created = 0` joins on equality,
        // SqlCompilerImplTest:5037), not Spark's DAY-TO-SECOND interval
        case SubtractTimestamps(l, r, _, _) if l.resolved && r.resolved &&
            isTs(l.dataType) && isTs(r.dataType) =>
          Subtract(micros(l), micros(r))
        case a @ Add(l, r, _) if l.resolved && r.resolved &&
            isTs(l.dataType) && isIntegral(r.dataType) =>
          fromMicros(Add(micros(l), Cast(r, LongType)))
        case a @ Add(l, r, _) if l.resolved && r.resolved &&
            isIntegral(l.dataType) && isTs(r.dataType) =>
          fromMicros(Add(Cast(l, LongType), micros(r)))
        case s @ Subtract(l, r, _) if l.resolved && r.resolved &&
            isTs(l.dataType) && isIntegral(r.dataType) =>
          fromMicros(Subtract(micros(l), Cast(r, LongType)))
        // timestamps are long micros in the reference: they multiply
        // (`3600L*1000000::timestamp` = 01:00 — CountColumnTest inserts)
        case m @ Multiply(l, r, _) if l.resolved && r.resolved &&
            isTs(l.dataType) && isIntegral(r.dataType) =>
          fromMicros(Multiply(micros(l), Cast(r, LongType)))
        case m @ Multiply(l, r, _) if l.resolved && r.resolved &&
            isIntegral(l.dataType) && isTs(r.dataType) =>
          fromMicros(Multiply(Cast(l, LongType), micros(r)))
        // byte/short arithmetic widens to INT: the reference registers
        // NO byte/short add/sub/mul factories (AddIntFunctionFactory is
        // the narrowest), so `byte + byte` never wraps at 8 bits
        // (CastDecimalToByteFunctionFactoryTest:660 — 99 + 100 = 199)
        case a @ Add(l, r, f) if l.resolved && r.resolved &&
            isNarrow(l.dataType) && isNarrow(r.dataType) =>
          Add(Cast(l, IntegerType), Cast(r, IntegerType), f)
        case s @ Subtract(l, r, f) if l.resolved && r.resolved &&
            isNarrow(l.dataType) && isNarrow(r.dataType) =>
          Subtract(Cast(l, IntegerType), Cast(r, IntegerType), f)
        case m @ Multiply(l, r, f) if l.resolved && r.resolved &&
            isNarrow(l.dataType) && isNarrow(r.dataType) =>
          Multiply(Cast(l, IntegerType), Cast(r, IntegerType), f)
        // CASE branches mixing TIMESTAMP and integral unify on the
        // micros carrier (reference: a timestamp IS a long —
        // CaseFunctionFactoryTest mixed-branch selects)
        case cw @ CaseWhen(branches, elseV)
            if branches.forall(b => b._1.resolved && b._2.resolved) &&
              elseV.forall(_.resolved) && {
                val ts = (branches.map(_._2) ++ elseV).map(_.dataType)
                ts.exists(t => t == TimestampType) &&
                  ts.exists(t => t != TimestampType && t != NullType) &&
                  ts.forall(t => t == TimestampType || t == NullType ||
                    (t match {
                      case ByteType | ShortType | IntegerType | LongType => true
                      case _ => false
                    }))
              } =>
          def lift(e: Expression): Expression = e.dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              MicrosToTimestamp(Cast(e, LongType))
            case _ => e
          }
          CaseWhen(branches.map { case (c, v) => (c, lift(v)) }, elseV.map(lift))
      }
    }
}

/** `__graft_flat(a)` — recursively flatten an N-dim array to 1-D
  * (reference array functions iterate `calculateRecursive` over every
  * dim — `DoubleArrayCumSumFunctionFactory.java:147-162`). Resolves to
  * chained `Flatten`s once the child's depth is known.
  */
case class FlattenDeep(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = {
    def flat(e: Expression, dt: DataType): Expression = dt match {
      case ArrayType(inner @ ArrayType(_, _), _) => flat(Flatten(e), inner)
      case _ => e
    }
    flat(child, child.dataType)
  }
  override protected def withNewChildInternal(newChild: Expression): FlattenDeep =
    copy(child = newChild)
}

/** `__graft_dbl(x)` — a USER-written double cast (`x::double`). The
  * node shape differs from the analyzer's coercion Cast, which is how
  * RefIntegerDivideRule tells an explicit cast (double division
  * intended) from Spark's silent int→double promotion (reference
  * divides integrally there). */
case class UserDoubleCast(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = Cast(child, DoubleType)
  override protected def withNewChildInternal(newChild: Expression): UserDoubleCast =
    copy(child = newChild)
}

/** `__graft_arrd(x)` — widen every numeric leaf of an (arbitrarily
  * nested) array to DOUBLE (reference arrays are DOUBLE-element only).
  * Rank-agnostic, so `ARRAY[vec1, vec2]` built from 1-D array columns
  * widens to array<array<double>> without the textual pass having to
  * know the element rank. */
case class WidenArrayToDouble(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  private def doubled(dt: DataType): DataType = dt match {
    case ArrayType(et, n) => ArrayType(doubled(et), n)
    case _: NumericType => DoubleType
    case other => other
  }
  override lazy val replacement: Expression =
    if (doubled(child.dataType) == child.dataType) child
    else Cast(child, doubled(child.dataType))
  override protected def withNewChildInternal(newChild: Expression): WidenArrayToDouble =
    copy(child = newChild)
}

/** `__graft_shift(arr, n, fill)` — reference array shift
  * (`ShiftDoubleArrayFunctionFactory`): positive n shifts right filling
  * the head, negative left filling the tail; a 2-D argument shifts
  * within each row (last dim). Rank dispatch happens here on the
  * child's resolved type — the textual macro cannot see through
  * transpose()/slice() compositions. */
case class ArrayShiftExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = {
    val n = Cast(second, IntegerType)
    def shift1d(arr: Expression, et: DataType): Expression = {
      def fillArr(cnt: Expression) = ArrayRepeat(Cast(third, et), cnt)
      val sz = Size(arr, legacySizeOfNull = false)
      CaseWhen(Seq((
        GreaterThanOrEqual(n, Literal(0)),
        Concat(Seq(fillArr(Least(Seq(n, sz))),
          Slice(arr, Literal(1), Greatest(Seq(Subtract(sz, n), Literal(0)))))))),
        Some(Concat(Seq(
          Slice(arr, Subtract(Literal(1), n), Greatest(Seq(Add(sz, n), Literal(0)))),
          fillArr(Least(Seq(UnaryMinus(n), sz)))))))
    }
    // reference shift is double-array-only: widen numeric elements so a
    // FLOAT[] input yields exact double results
    first.dataType match {
      case ArrayType(ArrayType(et: NumericType, cn1), cn2) =>
        val inner = ArrayType(DoubleType, cn1)
        val v = NamedLambdaVariable("__shr", inner, cn2)
        ArrayTransform(Cast(first, ArrayType(inner, cn2)),
          LambdaFunction(shift1d(v, DoubleType), Seq(v)))
      case ArrayType(et: NumericType, cn) =>
        shift1d(Cast(first, ArrayType(DoubleType, cn)), DoubleType)
      case ArrayType(inner @ ArrayType(et, _), cn2) =>
        val v = NamedLambdaVariable("__shr", inner, cn2)
        ArrayTransform(first, LambdaFunction(shift1d(v, et), Seq(v)))
      case ArrayType(et, _) => shift1d(first, et)
      case _ => first
    }
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): ArrayShiftExpr =
    copy(first = f, second = s, third = t)
}

/** `__graft_mat2dl(x)` / `__graft_mat2dr(x)` — matmul operand rank
  * promotion (reference MatMulFunctionFactory accepts 1-D operands: a
  * 1-D LEFT is a 1×m row vector, a 1-D RIGHT a k×1 column vector, so
  * `matmul(mat(n×k), vec(k))` yields an n×1 column). 2-D operands pass
  * through; the promotion composes with the textual matmul macro. */
case class PromoteMat2D(child: Expression, rightSide: Boolean)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case ArrayType(_: ArrayType, _) => child
    case ArrayType(et, cn) =>
      if (rightSide) {
        val v = NamedLambdaVariable("__m2d", et, cn)
        ArrayTransform(child, LambdaFunction(CreateArray(Seq(v)), Seq(v)))
      } else CreateArray(Seq(child))
    case _ => child
  }
  override protected def withNewChildInternal(newChild: Expression): PromoteMat2D =
    copy(child = newChild)
}

/** `__dim_length(a, d)` — length of dim `d` (1-based) with a RUNTIME
  * dim value (reference `DimLengthFunctionFactory` takes any int
  * expression; `dim_length(a, n)` / `dim_length(a, NULL)` are legal and
  * yield null for null/out-of-range dims). The child's STATIC rank
  * bounds a CASE over the dim, so every branch type-checks; constant
  * dims are folded by the optimizer to a single size() call. */
case class DimLengthExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with RuntimeReplaceable {
  override lazy val replacement: Expression = {
    def rank(dt: DataType): Int = dt match {
      case ArrayType(et, _) => 1 + rank(et); case _ => 0
    }
    val r = rank(left.dataType)
    if (r == 0) Literal(null, IntegerType)
    else {
      val dimInt = Cast(right, IntegerType)
      def lenAt(k: Int): Expression = {
        val e = (2 to k).foldLeft(left)((acc, _) => GetArrayItem(acc, Literal(0), false))
        Size(e, legacySizeOfNull = false)
      }
      CaseWhen((1 to r).map(k => (EqualTo(dimInt, Literal(k)), lenAt(k))), None)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DimLengthExpr =
    copy(left = l, right = r)
}
