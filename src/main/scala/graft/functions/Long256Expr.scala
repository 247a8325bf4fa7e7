package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** LONG256 arithmetic over the engine's canonical hex encoding.
  *
  * The reference stores 256-bit unsigned ints as a first-class column
  * type (`cairo/ColumnType.java:60` LONG256) with a bounded function
  * surface: construction `to_long256(l0,l1,l2,l3)`
  * (`long256/LongsToLong256FunctionFactory.java:52`), casts from the
  * integer types (`cast/CastLongToLong256FunctionFactory.java:69` —
  * low-limb set, no sign extension), wrap-around addition with null
  * propagation (`math/AddLong256FunctionFactory.java:74`,
  * `std/Long256Impl.add:41`, carry chain in `std/Long256Util.add`),
  * equality, and count aggregates.
  *
  * Here LONG256 values are canonical strings: `0x` + 64 lowercase hex
  * digits, always fully padded. The reference's display form trims
  * leading zeros (`std/Numbers.java:517 appendLong256`); we keep fixed
  * width so that LEXICOGRAPHIC order equals unsigned numeric order —
  * min/max/ORDER BY/range-partitioning on a long256 column then work
  * unchanged on any engine and any partitioning, which is worth more
  * at cluster scale than matching the trimmed display (a `long256_str`
  * helper produces the reference's trimmed form for display parity).
  *
  * Construction and casts are pure `concat/lpad/hex` compositions
  * (codegen'd by Catalyst); only addition needs a custom kernel — a
  * native [[Long256AddExpr]] with `doGenCode`, so the carry chain runs
  * as one static call inside whole-stage codegen rather than a UDF
  * boundary per row.
  */
object Long256Ops {

  /** Parse `0x…` hex (≤64 digits, case-insensitive) into 4 LE limbs;
    * returns null for malformed input (reference parse failure →
    * NULL_LONG256).
    */
  def parse(s: String): Array[Long] = {
    if (s == null || s.length < 3 || s.length > 66) return null
    if (s.charAt(0) != '0' || (s.charAt(1) | 0x20) != 'x') return null
    val limbs = new Array[Long](4)
    var i = s.length - 1
    var nibble = 0
    while (i >= 2) {
      val c = s.charAt(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return null
      limbs(nibble / 16) |= d.toLong << ((nibble % 16) * 4)
      nibble += 1
      i -= 1
    }
    limbs
  }

  /** Canonical fixed-width form: `0x` + 64 lowercase hex digits. */
  def format(limbs: Array[Long]): String = {
    val sb = new java.lang.StringBuilder(66)
    sb.append("0x")
    var i = 3
    while (i >= 0) {
      var n = 60
      while (n >= 0) {
        sb.append("0123456789abcdef".charAt(((limbs(i) >>> n) & 0xf).toInt))
        n -= 4
      }
      i -= 1
    }
    sb.toString
  }

  /** 256-bit wrap-around addition over canonical hex (called from
    * generated code). Malformed input → null, mirroring the
    * reference's null-propagating add.
    */
  def add(a: UTF8String, b: UTF8String): UTF8String = {
    val x = parse(a.toString)
    val y = parse(b.toString)
    if (x == null || y == null) return null
    val out = new Array[Long](4)
    var carry = 0L
    var i = 0
    while (i < 4) {
      val s = x(i) + y(i)
      val c1 = if (java.lang.Long.compareUnsigned(s, x(i)) < 0) 1L else 0L
      val s2 = s + carry
      val c2 = if (carry != 0 && s2 == 0 && s == -1L) 1L else 0L
      out(i) = s2
      carry = c1 | c2
      i += 1
    }
    UTF8String.fromString(format(out))
  }

  /** Reference display form: leading zeros trimmed, but never below
    * two digits (`Numbers.appendLong256` → `appendHex` pads to byte
    * pairs for the low limb).
    */
  def displayForm(s: UTF8String): UTF8String = {
    val limbs = parse(s.toString)
    if (limbs == null) return null
    val full = format(limbs).substring(2)
    var i = 0
    while (i < 62 && full.charAt(i) == '0') i += 1
    if ((full.length - i) % 2 == 1 && i > 0) i -= 1 // even digit count
    UTF8String.fromString("0x" + full.substring(i))
  }

  // ---- Column API (construction/casts compose codegen'd built-ins) ----

  private def limbHex(c: Column): Column = lower(lpad(hex(c.cast("long")), 16, "0"))

  /** `to_long256(l0, l1, l2, l3)` — limbs least-significant first. */
  def toLong256(l0: Column, l1: Column, l2: Column, l3: Column): Column =
    concat(lit("0x"), limbHex(l3), limbHex(l2), limbHex(l1), limbHex(l0))

  /** Integer-type → long256 cast: low limb only, no sign extension. */
  def castToLong256(c: Column): Column =
    toLong256(c, lit(0L), lit(0L), lit(0L))

  /** Via the registered SQL function (works across the classic/connect
    * Column split in Spark 4 — same pattern as [[GeoHashEncodeExpr]]).
    */
  def long256Add(a: Column, b: Column): Column =
    call_function("long256_add", a, b)

  def long256Str(c: Column): Column = call_function("long256_str", c)
}

/** Native codegen expression for 256-bit wrap-around add over the
  * canonical hex form — the one LONG256 op a concat/lpad composition
  * can't express (the inter-limb carry chain).
  */
case class Long256AddExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // malformed hex yields null even from non-null inputs, so the result
  // is always nullable — without this, codegen's isNull collapses to a
  // false literal and the null-producing branch fails to compile
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Long256Ops.add(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Long256Ops.getClass.getName.stripSuffix("$")
    val result = ctx.freshName("l256sum")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      org.apache.spark.unsafe.types.UTF8String $result = $cls.add($a, $b);
      if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Long256AddExpr {
  /** Register `long256_add(a, b)`, `to_long256(l0,l1,l2,l3)` and
    * `long256_str(x)` for SQL (reference FunctionFactory registry
    * analogue).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long256_add", exprs => Long256AddExpr(exprs(0), exprs(1)), "built-in")
    spark.udf.register("long256_str",
      (s: String) =>
        if (s == null) null
        else {
          val d = Long256Ops.displayForm(UTF8String.fromString(s))
          if (d == null) null else d.toString
        })
    // to_long256 / cast-to-long256 lower to built-in concat/lpad/hex —
    // the SQL spellings are dialect macros in QuestSql
  }
}
