package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for geohash encoding — the codegen'd
  * fast path behind [[GeoHash.encode]] (which builds a ~60-node
  * shift/mask expression tree; this emits one tight loop instead and
  * stays inside whole-stage codegen).
  *
  * Semantics identical to the closed form: quantize lat/lon to 30-bit
  * ints, interleave lon-first, base32 per 5 bits
  * (reference `functions/geohash/GeoHashNative` behavior, re-derived
  * from the public geohash algorithm).
  */
case class GeoHashEncodeExpr(left: Expression, right: Expression, chars: Int)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(lat: Any, lon: Any): Any =
    UTF8String.fromString(GeoHashEncodeExpr.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], chars))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GeoHashEncodeExpr.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (lat, lon) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($cls.encode($lat, $lon, $chars))")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GeoHashEncodeExpr {
  private val Base32 = GeoHash.Base32.toCharArray

  /** Static encode kernel (called from generated code). */
  def encode(lat: Double, lon: Double, chars: Int): String = {
    val lonI = math.min((((lon + 180.0) / 360.0) * 1073741824.0).toLong, 1073741823L)
    val latI = math.min((((lat + 90.0) / 180.0) * 1073741824.0).toLong, 1073741823L)
    val sb = new java.lang.StringBuilder(chars)
    var k = 0
    var digit = 0
    while (k < chars * 5) {
      val bit =
        if (k % 2 == 0) (lonI >> (29 - k / 2)) & 1L
        else (latI >> (29 - (k - 1) / 2)) & 1L
      digit = (digit << 1) | bit.toInt
      if (k % 5 == 4) { sb.append(Base32(digit)); digit = 0 }
      k += 1
    }
    sb.toString
  }

  /** Column API — via the registered SQL function so it works across
    * the classic/connect Column split in Spark 4.
    */
  def geohash(latCol: String, lonCol: String, chars: Int): Column =
    org.apache.spark.sql.functions.expr(s"geohash_encode($latCol, $lonCol, $chars)")

  /** Register `geohash_encode(lat, lon, chars)` for SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohash_encode",
      exprs => GeoHashEncodeExpr(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in")
}
