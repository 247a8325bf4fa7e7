package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** DECIMAL256 arithmetic beyond Spark's DecimalType(38) cap.
  *
  * The reference carries 256-bit decimals as a first-class type with a
  * full arithmetic surface (`std/Decimal256.java`;
  * `functions/math/AddDecimalFunctionFactory.java`, Sub/Mul/Div/Rem/
  * Neg/Abs/Sign, Ceil/Floor/Round + half-even/up/down variants —
  * division via `DecimalKnuthDivider`, double conversion through
  * BigDecimal HALF_UP at `Decimal256.java:579`). Spark's native
  * DecimalType stops at 38 digits (128-bit), so values here ride as
  * canonical plain decimal strings and the operators are native
  * codegen expressions over `java.math.BigDecimal` — exact at any
  * precision, one static call per row inside whole-stage codegen.
  *
  * The reference's 256-bit coefficient bound is enforced with the
  * reference's semantics: any result whose unscaled value exceeds 255
  * bits (sign excluded) throws a numeric-overflow error, and division
  * by zero throws, exactly as `Decimal256` raises `NumericException`
  * (`std/Decimal256.java:280,410` — "@throws NumericException if
  * overflow occurs / if division by zero"). Unparseable input is null
  * (SQL cast semantics); only genuine arithmetic faults error.
  */
object Decimal256Ops {

  private val MaxCoefficientBits = 255 // sign bit excluded, as Decimal256

  private def parse(s: UTF8String): JBigDecimal =
    if (s == null) null
    else try new JBigDecimal(s.toString.trim) catch { case _: NumberFormatException => null }

  private def fit(b: JBigDecimal): UTF8String =
    if (b == null) null
    else if (b.unscaledValue().bitLength() > MaxCoefficientBits)
      throw new ArithmeticException(
        "decimal256 overflow: coefficient exceeds 255 bits") // reference NumericException parity
    else UTF8String.fromString(b.toPlainString)

  private def mode(m: String): RoundingMode = m match {
    case "half_up" => RoundingMode.HALF_UP
    case "half_even" => RoundingMode.HALF_EVEN
    case "up" => RoundingMode.UP
    case "down" => RoundingMode.DOWN
    case "ceiling" => RoundingMode.CEILING
    case "floor" => RoundingMode.FLOOR
    case other => throw new IllegalArgumentException(s"bad rounding mode '$other'")
  }

  /** Binary op kernel (called from generated code). `scale` applies to
    * division only (result scale, HALF_UP — the reference's default).
    */
  def binop(a: UTF8String, b: UTF8String, op: String, scale: Int): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return null
    if ((op == "div" || op == "rem") && y.signum() == 0)
      throw new ArithmeticException("decimal256 division by zero") // reference parity
    fit(op match {
      case "add" => x.add(y)
      case "sub" => x.subtract(y)
      case "mul" => x.multiply(y)
      case "div" => x.divide(y, scale, RoundingMode.HALF_UP)
      case "rem" => x.remainder(y)
      case other => throw new IllegalArgumentException(s"bad op '$other'")
    })
  }

  /** Unary op kernel. `scale` applies to the round/floor/ceil family. */
  def unop(a: UTF8String, op: String, scale: Int): UTF8String = {
    val x = parse(a)
    if (x == null) return null
    op match {
      case "neg" => fit(x.negate())
      case "abs" => fit(x.abs())
      case "sign" => UTF8String.fromString(String.valueOf(x.signum()))
      case "round" => fit(x.setScale(scale, mode("half_up")))
      case "round_half_even" => fit(x.setScale(scale, mode("half_even")))
      case "round_up" => fit(x.setScale(scale, mode("up")))
      case "round_down" => fit(x.setScale(scale, mode("down")))
      case "floor" => fit(x.setScale(scale, mode("floor")))
      case "ceil" => fit(x.setScale(scale, mode("ceiling")))
      case other => throw new IllegalArgumentException(s"bad op '$other'")
    }
  }

  // ---- Column API (via the registered functions) ----------------------

  def add(a: Column, b: Column): Column = call_function("decimal256_add", a, b)
  def sub(a: Column, b: Column): Column = call_function("decimal256_sub", a, b)
  def mul(a: Column, b: Column): Column = call_function("decimal256_mul", a, b)
  def div(a: Column, b: Column, scale: Column): Column =
    call_function("decimal256_div", a, b, scale)
  def rem(a: Column, b: Column): Column = call_function("decimal256_rem", a, b)
  def neg(a: Column): Column = call_function("decimal256_neg", a)
  def abs(a: Column): Column = call_function("decimal256_abs", a)
  def sign(a: Column): Column = call_function("decimal256_sign", a)
  def round(a: Column, scale: Column): Column = call_function("decimal256_round", a, scale)

  /** Register the decimal256_* SQL functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def litInt(e: Expression): Int = e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"scale must be a literal int, got $other")
    }
    Seq("add", "sub", "mul", "rem").foreach { op =>
      reg.createOrReplaceTempFunction(s"decimal256_$op",
        exprs => Decimal256BinExpr(exprs(0), exprs(1), op, 0), "built-in")
    }
    reg.createOrReplaceTempFunction("decimal256_div",
      exprs => Decimal256BinExpr(exprs(0), exprs(1), "div", litInt(exprs(2))), "built-in")
    Seq("neg", "abs", "sign").foreach { op =>
      reg.createOrReplaceTempFunction(s"decimal256_$op",
        exprs => Decimal256UnaryExpr(exprs(0), op, 0), "built-in")
    }
    Seq("round", "round_half_even", "round_up", "round_down", "floor", "ceil").foreach { op =>
      reg.createOrReplaceTempFunction(s"decimal256_$op",
        exprs => Decimal256UnaryExpr(exprs(0), op,
          if (exprs.length > 1) litInt(exprs(1)) else 0), "built-in")
    }
  }
}

case class Decimal256BinExpr(left: Expression, right: Expression, op: String, scale: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // overflow/parse failure → null

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Decimal256Ops.binop(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], op, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Decimal256Ops.getClass.getName.stripSuffix("$")
    val r = ctx.freshName("d256")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      org.apache.spark.unsafe.types.UTF8String $r = $cls.binop($a, $b, "$op", $scale);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class Decimal256UnaryExpr(child: Expression, op: String, scale: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    Decimal256Ops.unop(a.asInstanceOf[UTF8String], op, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Decimal256Ops.getClass.getName.stripSuffix("$")
    val r = ctx.freshName("d256")
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.unsafe.types.UTF8String $r = $cls.unop($a, "$op", $scale);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
