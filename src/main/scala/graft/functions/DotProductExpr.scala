package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over embedding arrays.
  *
  * The composable spelling — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,v) -> acc+v)` — is correct but interpreted: Spark's
  * higher-order functions are `CodegenFallback`, so every pair
  * evaluated in a similarity join pays lambda dispatch + boxing per
  * element. This expression emits one tight fused multiply-add loop
  * over the unsafe array data instead, inside whole-stage codegen —
  * the difference between an ANN candidate join that is
  * expression-bound and one that is scan-bound at corpus scale.
  *
  * Arithmetic: elements cast to double, products summed
  * left-to-right. Null semantics follow the reference's
  * `Numbers.isFinite` guard: pairs with a null/NaN side are skipped;
  * mismatched lengths or a null array yield null.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null even from non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two array<float|double> args, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def get(a: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      // reference DoubleArrayDotProduct skips non-finite pairs
      // (Numbers.isFinite guard) rather than poisoning the sum
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = get(a, i, lt); val y = get(b, i, rt)
        // Numbers.isFinite excludes ±Inf as well as NaN
        if (java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y)) sum += x * y
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(dt: DataType, arr: String, i: String): String = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) { ${ev.isNull} = true; }
        else {
          double $sum = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
              double __x = ${getter(elemType(left), a, i)};
              double __y = ${getter(elemType(right), b, i)};
              if (Double.isFinite(__x) && Double.isFinite(__y)) $sum += __x * __y;
            }
          }
          if (!${ev.isNull}) { ${ev.value} = $sum; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  /** Column API via the registered SQL function (the classic/connect
    * Column split in Spark 4 hides direct Expression wrapping) —
    * callers register once per session with [[register]].
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  /** Register `vec_dot(a, b)` for SQL (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
}
