package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Typed LONG256 tier: 256-bit unsigned integers as fixed 32-byte
  * big-endian `BinaryType` values (the hex-string tier in
  * [[Long256Ops]] remains the display/interchange form).
  *
  * The reference stores LONG256 as four longs in native column memory
  * (`cairo/ColumnType.java:60`, `std/Long256Impl.java`); the Spark
  * analogue of "a first-class fixed-width column" is a 32-byte binary
  * value. Big-endian byte order makes Spark's lexicographic unsigned
  * binary comparison EQUAL to 256-bit unsigned numeric order, so
  * ORDER BY / min / max / range partitioning / sort-merge join on a
  * long256 column use the built-in binary comparators directly — no
  * parsing, no custom ordering, and the row payload is 32 bytes
  * instead of a 66-char string (halves shuffle width at 100 TB).
  * Equality, GROUP BY, DISTINCT and hash joins likewise hash the raw
  * bytes.
  *
  * Operator surface mirrors the reference's LONG256 registry: add with
  * wrap-around carry (`math/AddLong256FunctionFactory.java:74`,
  * `std/Long256Util.add`), bitwise and/or/xor/not (the reference
  * routes these through the long256 constant/cast tier), casts
  * hex-string ↔ typed (`cast/CastStrToLong256FunctionFactory`), limb
  * construction `to_long256` (`long256/LongsToLong256FunctionFactory`),
  * and the group-by tier `sum` with the same carry chain
  * (`groupby/SumLong256GroupByFunction.java:78,115` — null inputs
  * skipped). count / count_distinct / min / max need no custom code on
  * a binary column.
  *
  * All scalar kernels are native codegen expressions — one static call
  * per row inside whole-stage codegen, no UDF boundary.
  */
object Long256Bin {

  final val Width = 32

  /** Parse `0x…` hex (1..64 digits, case-insensitive, reference
    * trimmed or canonical form) into 32 big-endian bytes; null for
    * malformed input (reference parse failure → NULL_LONG256).
    */
  def fromHex(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString
    val n = str.length
    if (n < 3 || n > 66) return null
    if (str.charAt(0) != '0' || (str.charAt(1) | 0x20) != 'x') return null
    val out = new Array[Byte](Width)
    var nibble = 0 // count from the least-significant end
    var i = n - 1
    while (i >= 2) {
      val c = str.charAt(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return null
      val byteIdx = Width - 1 - (nibble >> 1)
      out(byteIdx) = (out(byteIdx) | (d << ((nibble & 1) << 2))).toByte
      nibble += 1
      i -= 1
    }
    out
  }

  private final val HexDigits = "0123456789abcdef".toCharArray

  /** Canonical hex form `0x` + 64 lowercase digits (fixed width — the
    * sortable string encoding; [[Long256Ops.displayForm]] trims).
    */
  def toHex(b: Array[Byte]): UTF8String = {
    if (b == null || b.length != Width) return null
    val out = new Array[Char](2 + Width * 2)
    out(0) = '0'; out(1) = 'x'
    var i = 0
    while (i < Width) {
      out(2 + i * 2) = HexDigits((b(i) >> 4) & 0xf)
      out(3 + i * 2) = HexDigits(b(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** 256-bit wrap-around addition (byte-wise carry chain, reference
    * `std/Long256Util.add`). Wrong-width input → null.
    */
  def add(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null || b == null || a.length != Width || b.length != Width) return null
    val out = new Array[Byte](Width)
    var carry = 0
    var i = Width - 1
    while (i >= 0) {
      val s = (a(i) & 0xff) + (b(i) & 0xff) + carry
      out(i) = s.toByte
      carry = s >> 8
      i -= 1
    }
    out
  }

  def and(a: Array[Byte], b: Array[Byte]): Array[Byte] = zipWith(a, b, 0)
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = zipWith(a, b, 1)
  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = zipWith(a, b, 2)

  private def zipWith(a: Array[Byte], b: Array[Byte], op: Int): Array[Byte] = {
    if (a == null || b == null || a.length != Width || b.length != Width) return null
    val out = new Array[Byte](Width)
    var i = 0
    while (i < Width) {
      out(i) = (op match {
        case 0 => a(i) & b(i)
        case 1 => a(i) | b(i)
        case _ => a(i) ^ b(i)
      }).toByte
      i += 1
    }
    out
  }

  def not(a: Array[Byte]): Array[Byte] = {
    if (a == null || a.length != Width) return null
    val out = new Array[Byte](Width)
    var i = 0
    while (i < Width) { out(i) = (~a(i)).toByte; i += 1 }
    out
  }

  // ---- group-by tier: sum with the reference's carry-add ------------

  /** sum(long256) — wrap-around 256-bit accumulation, nulls skipped
    * (reference `groupby/SumLong256GroupByFunction`). Mergeable
    * Aggregator → Catalyst plans partial + final HashAggregate.
    */
  val Sum: Aggregator[Array[Byte], Array[Byte], Array[Byte]] =
    new Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
      def zero: Array[Byte] = null
      def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
        if (a == null || a.length != Width) b
        else if (b == null) a.clone()
        else add(b, a)
      def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
        if (b1 == null) b2 else if (b2 == null) b1 else add(b1, b2)
      def finish(r: Array[Byte]): Array[Byte] = r
      def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  // ---- Column API ----------------------------------------------------

  private def limbHex(c: Column): Column = lpad(hex(c.cast("long")), 16, "0")

  /** `to_long256(l0,l1,l2,l3)` typed form — limbs least-significant
    * first, composed from codegen'd builtins (hex/lpad/concat/unhex).
    */
  def toLong256Bin(l0: Column, l1: Column, l2: Column, l3: Column): Column =
    unhex(concat(limbHex(l3), limbHex(l2), limbHex(l1), limbHex(l0)))

  /** Integer → typed long256 (low limb, no sign extension — reference
    * `cast/CastLongToLong256FunctionFactory:69`).
    */
  def castToLong256Bin(c: Column): Column =
    toLong256Bin(c, lit(0L), lit(0L), lit(0L))

  def long256Bin(hexStr: Column): Column = call_function("long256_bin", hexStr)
  def long256BinHex(c: Column): Column = call_function("long256_bin_hex", c)
  def long256BinAdd(a: Column, b: Column): Column = call_function("long256_bin_add", a, b)
  def long256BinAnd(a: Column, b: Column): Column = call_function("long256_bin_and", a, b)
  def long256BinOr(a: Column, b: Column): Column = call_function("long256_bin_or", a, b)
  def long256BinXor(a: Column, b: Column): Column = call_function("long256_bin_xor", a, b)
  def long256BinNot(a: Column): Column = call_function("long256_bin_not", a)
  def long256BinSum(c: Column): Column = call_function("long256_bin_sum", c)

  /** Register the typed tier for SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "long256_bin", exprs => Long256BinUnaryExpr(exprs.head, "fromHex"), "built-in")
    reg.createOrReplaceTempFunction(
      "long256_bin_hex", exprs => Long256BinHexExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "long256_bin_not", exprs => Long256BinUnaryExpr(exprs.head, "not"), "built-in")
    for (op <- Seq("add", "and", "or", "xor"))
      reg.createOrReplaceTempFunction(
        s"long256_bin_$op", exprs => Long256BinBinExpr(exprs(0), exprs(1), op), "built-in")
    spark.udf.register("long256_bin_sum", udaf(Sum))
  }
}

/** Binary (two-input) typed-long256 kernel: add / and / or / xor. */
case class Long256BinBinExpr(left: Expression, right: Expression, op: String)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  // wrong-width input yields null from non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  private def kernel(a: Array[Byte], b: Array[Byte]): Array[Byte] = op match {
    case "add" => Long256Bin.add(a, b)
    case "and" => Long256Bin.and(a, b)
    case "or" => Long256Bin.or(a, b)
    case "xor" => Long256Bin.xor(a, b)
    case other => throw new IllegalArgumentException(s"bad op '$other'")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Long256Bin.getClass.getName.stripSuffix("$")
    val result = ctx.freshName("l256")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      byte[] $result = $cls.$op($a, $b);
      if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unary typed-long256 kernels with binary output: hex-string parse
  * (`fromHex`) and bitwise complement (`not`).
  */
case class Long256BinUnaryExpr(child: Expression, op: String) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = op match {
    case "fromHex" => Long256Bin.fromHex(a.asInstanceOf[UTF8String])
    case _ => Long256Bin.not(a.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Long256Bin.getClass.getName.stripSuffix("$")
    val result = ctx.freshName("l256")
    nullSafeCodeGen(ctx, ev, a => s"""
      byte[] $result = $cls.$op($a);
      if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Typed long256 → canonical `0x` + 64-digit hex string. */
case class Long256BinHexExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any =
    Long256Bin.toHex(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Long256Bin.getClass.getName.stripSuffix("$")
    val result = ctx.freshName("l256hex")
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.unsafe.types.UTF8String $result = $cls.toHex($a);
      if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
