package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Reference window-function result-type convention: the reference
  * registers window `sum` only as SumDouble / SumDecimal
  * (`functions/window/SumDoubleWindowFunctionFactory.java`, signature
  * `sum(D)`), so an INT/LONG argument widens to DOUBLE and
  * `sum(x) OVER (...)` over an int column prints `1.0`. Spark's window
  * sum keeps LONG for integral inputs.
  *
  * The dialect rewrites `sum(X) OVER` to `sum(__graft_promote(X)) OVER`
  * (QuestSql.rewriteWindowSum); this expression resolves to
  * `CAST(X AS DOUBLE)` for integral X and to X unchanged otherwise
  * (DECIMAL stays decimal — SumDecimal — doubles stay double). Promoting
  * inside the argument keeps the analyzer's type derivation consistent —
  * a post-analysis type change would leave upstream attribute
  * references stale.
  */
case class PromoteIntToDouble(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => Cast(child, DoubleType)
    case _ => child
  }
  override protected def withNewChildInternal(newChild: Expression): PromoteIntToDouble =
    copy(child = newChild)
}
