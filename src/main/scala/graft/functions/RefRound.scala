package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Reference-parity double rounding (reference `std/Numbers.java`
  * roundUp/roundDown/roundHalfUp/roundHalfEven;
  * `functions/math/Round*DoubleFunctionFactory.java`).
  *
  * The reference rounds doubles by scaling against power-of-ten lookup
  * tables and truncating with a 1e-15 tolerance — so results carry the
  * exact double artifacts its users observe (`round_up(100.1, 13)` =
  * `100.10000000000001`, not `100.1`). A scale outside the table range
  * (|scale| >= 18, or scale > 15 for the half modes) yields NaN, which
  * prints as null. Implemented here with the same scaling scheme so the
  * bit patterns agree.
  */
object RefRound {
  private final val Tol = 1e-15
  private final val P10Max = 18
  private val p10: Array[Double] = {
    val a = new Array[Double](19); a(0) = 1.0
    var i = 1; while (i < 19) { a(i) = a(i - 1) * 10.0; i += 1 } // exact to 1e18
    a
  }
  // negative powers are NOT iterated divisions (error compounds one ulp
  // per step) — each entry is the correctly-rounded literal
  private val n10: Array[Double] = Array(
    1.0, 1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6, 1e-7, 1e-8, 1e-9,
    1e-10, 1e-11, 1e-12, 1e-13, 1e-14, 1e-15, 1e-16, 1e-17, 1e-18)

  private def down00Neg(v: Double, s: Int): Double = ((v + Tol) * n10(s)).toLong.toDouble * p10(s)
  private def down00Pos(v: Double, s: Int): Double = ((v + Tol) * p10(s)).toLong.toDouble * n10(s)
  private def up00Neg(v: Double, s: Int): Double = (v * n10(s) + 1 - Tol).toLong.toDouble * p10(s)
  private def up00Pos(v: Double, s: Int): Double = (v * p10(s) + 1 - Tol).toLong.toDouble * n10(s)

  def roundUp(v: Double, s: Int): Double =
    if (v.isNaN) v
    else if (s < P10Max && s > -P10Max) {
      val a = math.abs(v)
      java.lang.Math.copySign(if (s < 0) up00Neg(a, -s) else up00Pos(a, s), v)
    } else Double.NaN

  def roundDown(v: Double, s: Int): Double =
    if (v.isNaN) v
    else if (s < P10Max && s > -P10Max) {
      val a = math.abs(v)
      java.lang.Math.copySign(if (s < 0) down00Neg(a, -s) else down00Pos(a, s), v)
    } else Double.NaN

  def roundHalfUp(v: Double, s: Int): Double =
    if (v.isNaN) v
    else if (s + 2 < P10Max && s > -P10Max) {
      val a = math.abs(v)
      val r =
        if (s < 0) {
          val ns = -s
          val x = (a * n10(ns) * 100.0 + Tol).toLong
          if (x % 100 < 50) down00Neg(a, ns) else up00Neg(a, ns)
        } else {
          val x = ((a + Tol) * p10(s + 2)).toLong
          if (x % 100 < 50) down00Pos(a, s) else up00Pos(a, s)
        }
      java.lang.Math.copySign(r, v)
    } else Double.NaN

  def roundHalfEven(v: Double, s: Int): Double =
    if (v.isNaN) v
    else if (s + 2 < P10Max && s > -P10Max) {
      if (v > 0) he0(v, s) else -he0(-v, s)
    } else Double.NaN

  private def he0(v: Double, s: Int): Double =
    if (s > 0) {
      val x = (v * p10(s) * 100.0 + Tol).toLong
      val rem = x % 100
      if (rem < 50 || (rem == 50 && ((v * p10(s)).toLong & 1L) == 0L)) down00Pos(v, s)
      else up00Pos(v, s)
    } else {
      val ns = -s
      val x = (v * n10(ns) * 100.0 + Tol).toLong
      val rem = x % 100
      if (rem < 50 || (rem == 50 && ((v * n10(ns)).toLong & 1L) == 0L)) down00Neg(v, ns)
      else up00Neg(v, ns)
    }

  /** 1-arg round: Math.round on finite input, NaN otherwise
    * (reference RoundDoubleZeroScaleFunctionFactory). */
  def roundZero(v: Double): Double =
    if (java.lang.Double.isFinite(v)) java.lang.Math.round(v).toDouble else Double.NaN

  // double: -0.0 maps to +0.0, otherwise Math.signum (NaN in, NaN out);
  // float keeps Math.signum exactly, -0.0f included (reference
  // SignDoubleFunctionFactory vs SignFloatFunctionFactory)
  def signD(v: Double): Double = if (v == 0.0) 0.0 else math.signum(v)
  def signF(v: Float): Float = math.signum(v)

  def dispatch(mode: Int, v: Double, s: Int): Double = mode match {
    case 1 => roundUp(v, s)
    case 2 => roundDown(v, s)
    case 3 => roundHalfEven(v, s)
    case 4 => roundHalfUp(v, s)
    case _ => roundZero(v)
  }
}

/** Reference `sign()` (functions/math/Sign*FunctionFactory): the result
  * keeps the operand's integer type (sign of an INT is an INT), doubles
  * return exactly -1.0/0.0/1.0 (both zeros map to +0.0, NaN stays NaN).
  * Spark's signum always widens to DOUBLE and keeps -0.0. */
case class RefSignExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = child.dataType match {
    case ByteType | ShortType | IntegerType => IntegerType
    case LongType => LongType
    case FloatType => FloatType
    case _ => DoubleType
  }
  override protected def nullSafeEval(v: Any): Any = v match {
    // value-based dispatch (interpreted eval may receive a narrower
    // boxed type than the declared child type), result in dataType
    case f: Float => RefRound.signF(f)
    case d: Double => RefRound.signD(d)
    case n: java.lang.Number =>
      val s = java.lang.Long.signum(n.longValue())
      if (dataType == LongType) s.toLong else s
    case other => other
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case ByteType | ShortType | IntegerType =>
        defineCodeGen(ctx, ev, c => s"java.lang.Integer.signum((int)($c))")
      case LongType => defineCodeGen(ctx, ev, c => s"java.lang.Long.signum($c)")
      case FloatType => defineCodeGen(ctx, ev, c => s"graft.functions.RefRound.signF($c)")
      case _ => defineCodeGen(ctx, ev, c => s"graft.functions.RefRound.signD($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `__ref_round(mode, value, scale)` — codegen-friendly scalar over the
  * RefRound table scheme; mode is a literal int. */
case class RefRoundExpr(modeE: Expression, value: Expression, scaleE: Expression)
    extends TernaryExpression {
  override def first: Expression = modeE
  override def second: Expression = value
  override def third: Expression = scaleE
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = value.nullable || scaleE.nullable || modeE.nullable

  override protected def nullSafeEval(m: Any, v: Any, s: Any): Any =
    RefRound.dispatch(m.asInstanceOf[Int], v.asInstanceOf[Double], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, v, s) => s"graft.functions.RefRound.dispatch($m, $v, $s)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(modeE = newFirst, value = newSecond, scaleE = newThird)
}
