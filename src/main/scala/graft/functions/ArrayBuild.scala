package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `array_build(nArrays, size, filler1 … fillerN)` — the reference's
  * fill-shape constructor (`functions/array/BuildArrayFunctionFactory
  * .java`, signature `array_build(lV)`): nArrays is a CONSTANT ≥ 1;
  * size is an integer (bucket length) or an array (its cardinality);
  * each filler is either a scalar (repeated `size` times) or a DOUBLE[]
  * (copied, truncated-or-null-padded to `size`). nArrays == 1 yields a
  * 1-D DOUBLE[size]; otherwise a 2-D DOUBLE[nArrays][size] with row i
  * from filler i. NULL size → NULL array; a NULL array filler yields a
  * row of nulls (the reference writes Double.NaN, rendered null).
  *
  * Native Catalyst expression (not a text macro): the size argument's
  * scalar-vs-array dispatch needs resolved types, which only exist at
  * analysis time.
  */
case class ArrayBuild(children: Seq[Expression])
  extends Expression with CodegenFallback {

  private lazy val nArrays: Int =
    children.head.eval(null).asInstanceOf[Number].intValue()

  override def nullable: Boolean = true
  override def dataType: DataType =
    if (nArrays == 1) ArrayType(DoubleType, containsNull = true)
    else ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 3)
      return TypeCheckResult.TypeCheckFailure(
        "array_build requires at least 3 arguments: nArrays, size, filler(s)")
    val integral = children.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!children.head.foldable || !integral)
      return TypeCheckResult.TypeCheckFailure("nArrays must be a constant integer")
    val n = children.head.eval(null) match {
      case null => return TypeCheckResult.TypeCheckFailure("nArrays must not be null")
      case v: Number => v.intValue()
    }
    if (n < 1)
      return TypeCheckResult.TypeCheckFailure(s"nArrays out of range [nArrays=$n]")
    if (children.size != n + 2)
      return TypeCheckResult.TypeCheckFailure(
        s"array_build with nArrays=$n requires ${n + 2} arguments, got ${children.size}")
    TypeCheckResult.TypeCheckSuccess
  }

  private def toDouble(v: Any): Any = v match {
    case null => null
    case d: java.lang.Double => d
    case f: java.lang.Float => java.lang.Double.valueOf(f.doubleValue())
    case n: Number => java.lang.Double.valueOf(n.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => java.lang.Double.valueOf(d.toDouble)
    case other => java.lang.Double.valueOf(other.toString.toDouble)
  }

  override def eval(input: InternalRow): Any = {
    val sizeV = children(1).eval(input)
    if (sizeV == null) return null
    val size = (children(1).dataType, sizeV) match {
      case (_: ArrayType, a: ArrayData) => a.numElements()
      case (_, n: Number) => n.intValue()
      case (_, other) => other.toString.toDouble.toInt
    }
    if (size < 0)
      throw new IllegalArgumentException(s"size must not be negative [size=$size]")
    def row(filler: Expression): Array[Any] = {
      val out = new Array[Any](size)
      (filler.dataType, filler.eval(input)) match {
        case (_: ArrayType, null) => // stays all-null (reference NaN fill)
        case (at: ArrayType, a: ArrayData) =>
          val src = a.toObjectArray(at.elementType)
          val copy = math.min(src.length, size)
          var j = 0
          while (j < copy) { out(j) = toDouble(src(j)); j += 1 }
        case (_, v) =>
          val d = toDouble(v)
          java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], d.asInstanceOf[AnyRef])
      }
      out
    }
    if (nArrays == 1) new GenericArrayData(row(children(2)))
    else new GenericArrayData(
      (0 until nArrays).map(i => new GenericArrayData(row(children(2 + i)))).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ArrayBuild {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_build", exprs => ArrayBuild(exprs.toSeq), "built-in")
}
