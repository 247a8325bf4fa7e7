package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `qdb_str(x)` — reference-format string cast. TIMESTAMP renders the
  * USEC UTC pattern (`yyyy-MM-ddTHH:mm:ss.SSSSSSZ`), the DATE carrier
  * (TIMESTAMP_NTZ, millisecond datetime) the MSEC one; every other type
  * falls through to a plain string cast. Reference
  * io/questdb/std/datetime/micros/TimestampFormatUtils USEC_UTC_PATTERN /
  * UTC_PATTERN.
  *
  * RuntimeReplaceable so the dispatch happens ONCE at plan time on the
  * child's resolved type — the replacement (date_format / cast) is
  * whole-stage-codegen'd; nothing here evaluates per row.
  */
case class QdbStrExpr(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case TimestampType =>
      DateFormatClass(child, Literal("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"), Some("UTC"))
    case TimestampNTZType =>
      DateFormatClass(Cast(child, TimestampType, Some("UTC")),
        Literal("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), Some("UTC"))
    case _: ArrayType =>
      // reference array rendering: no space after commas, empty N-dim
      // prints "[]" (ArrayTypeDriver.arrayToStr)
      graft.plans.RefArrayCastRule.arrayToRefString(child)
    case _ => Cast(child, StringType, Some("UTC"))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QdbStrExpr {
  /** Register `qdb_str(x)` for SQL (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qdb_str", exprs => QdbStrExpr(exprs.head), "built-in")
}
