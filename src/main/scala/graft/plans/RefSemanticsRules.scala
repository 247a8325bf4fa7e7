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

/** Reference array→VARCHAR rendering: `[[1.0,2.0],[3.0,4.0]]` — no
  * spaces after commas (reference ArrayTypeDriver.arrayToStr), where
  * Spark's cast produces `[1.0, 2.0]`. Applied only to dialect
  * statements (gated on `graft.dialect.refSemantics`); output type is
  * unchanged (string), so the post-resolution rewrite is safe. */
object RefArrayCastRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private var counter = 0L
  private def freshVar(): UnresolvedNamedLambdaVariable = synchronized {
    counter += 1
    UnresolvedNamedLambdaVariable(Seq(s"__acx$counter"))
  }

  private def fmt(e: Expression, dt: DataType): Expression = dt match {
    case ArrayType(et, _) =>
      val x = freshVar()
      Concat(Seq(Literal("["),
        ArrayJoin(ArrayTransform(e, LambdaFunction(fmt(x, et), Seq(x))),
          Literal(","), Some(Literal("null"))),
        Literal("]")))
    case _ => Cast(e, StringType)
  }

  /** Reference-format rendering of a resolved array expression — shared
    * with [[graft.functions.QdbStrExpr]], which hosts the `::string` /
    * `::varchar` cast macro path. Lambda variables are built RESOLVED
    * (typed NamedLambdaVariable) so the result is usable inside a
    * RuntimeReplaceable's `replacement`, where the analyzer consults
    * `nullable` before lambda resolution would run. */
  def arrayToRefString(e: Expression): Expression = {
    def fmtR(e0: Expression, dt: DataType): Expression = dt match {
      case ArrayType(et, cn) =>
        val x = NamedLambdaVariable("__acr", et, cn)
        Concat(Seq(Literal("["),
          ArrayJoin(ArrayTransform(e0, LambdaFunction(fmtR(x, et), Seq(x))),
            Literal(","), Some(Literal("null"))),
          Literal("]")))
      case _ => Cast(e0, StringType)
    }
    e.dataType match {
      case at @ ArrayType(_: ArrayType, _) =>
        // a 2-D array with zero total elements prints "[]" (reference
        // arrayToStr over an empty view)
        If(EqualTo(Size(Flatten(e)), Literal(0)), Literal("[]"), fmtR(e, at))
      case at: ArrayType => fmtR(e, at)
      case _ => Cast(e, StringType)
    }
  }

  private def rank(dt: DataType): Int = dt match {
    case ArrayType(et, _) => 1 + rank(et)
    case _ => 0
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        // reference TIMESTAMP→LONG is epoch MICROS (ColumnType cast
        // matrix), DATE(ntz carrier)→LONG is epoch millis — Spark casts
        // to seconds
        case c: Cast if c.dataType == LongType && c.child.resolved &&
            c.child.dataType == TimestampType =>
          UnixMicros(c.child)
        case c: Cast if c.dataType == LongType && c.child.resolved &&
            c.child.dataType == TimestampNTZType =>
          IntegralDivide(UnixMicros(Cast(c.child, TimestampType)), Literal(1000L))
        // TIMESTAMP→DOUBLE/FLOAT is the micros value too (same cast
        // matrix; Spark would give epoch seconds)
        case c: Cast if (c.dataType == DoubleType || c.dataType == FloatType) &&
            c.child.resolved && c.child.dataType == TimestampType =>
          Cast(UnixMicros(c.child), c.dataType)
        case c: Cast if c.dataType == StringType && c.child.resolved &&
            c.child.dataType.isInstanceOf[ArrayType] =>
          arrayToRefString(c.child)
        // string → array parses the reference/PG brace literal
        // (`'{"1","2"}'::double[]` → [1.0,2.0], unparseable → null);
        // braces/quotes map onto JSON and ride the codegen'd JSON reader
        case c: Cast if c.dataType.isInstanceOf[ArrayType] && c.child.resolved &&
            c.child.dataType == StringType =>
          JsonToStructs(c.dataType, Map.empty[String, String],
            StringTranslate(c.child, Literal("{}\""), Literal("[]")), Some("UTC"))
        // scalar / lower-rank array → array promotes by wrapping
        // (reference scalar→array broadcast: 1.0::double[][] = [[1.0]],
        // ARRAY[1.0,2.0]::double[][] = [[1.0,2.0]]); one wrap per
        // analyzer pass until ranks meet, then Spark's array cast takes
        // over element conversion
        case c: Cast if c.dataType.isInstanceOf[ArrayType] && c.child.resolved &&
            c.child.dataType != NullType && c.child.dataType != StringType &&
            rank(c.child.dataType) < rank(c.dataType) =>
          c.withNewChildren(Seq(CreateArray(Seq(c.child))))
      }
    }
  }
}

/** Reference integer division: `/` over two INTEGRAL operands divides
  * integrally (Java semantics — UnnestTest `(ord - 1) / 2` buckets,
  * SampleByTest `x / 60`); Spark promotes to DOUBLE. Matched on the
  * POST-coercion shape (both sides coerced Cast(_, DOUBLE) of integral
  * children). An explicit user cast to double is indistinguishable here
  * and loses its fractional quotient — the reference's own surface has
  * the same property (it floors `cast(x as double)/y`? no — but its
  * tests never spell that; the corpus arbitrates). Dialect-gated. */
object RefIntegerDivideRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case Divide(Cast(l, DoubleType, _, _), Cast(r, DoubleType, _, _), _)
            if l.resolved && r.resolved &&
              isIntegral(l.dataType) && isIntegral(r.dataType) =>
          IntegralDivide(l, r)
      }
    }
  }
}

/** Reference timestamp↔number comparisons are value-based: a TIMESTAMP
  * compares as its epoch micros (`ts at time zone 'EST' > 0`,
  * TimestampAtTimeZoneTest:115). Spark rejects the type pair outright,
  * so rewriting only the mismatched shape rescues exactly the queries
  * that would otherwise fail analysis. Dialect-gated. */
object RefTsNumberCompareRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isNum(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }
  private def micros(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.UnixMicros(e)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        // a LongType side whose attribute carries the graft.ns metadata
        // is a NANOS carrier (declared TIMESTAMP_NS column): the µs side
        // scales ×1000 (exact), never the reverse (truncates)
        case c: BinaryComparison
            if c.left.resolved && c.right.resolved &&
              c.left.dataType == TimestampType && NsCarrier.isNs(c.right) =>
          c.withNewChildren(Seq(Multiply(micros(c.left), Literal(1000L)), c.right))
        case c: BinaryComparison
            if c.left.resolved && c.right.resolved &&
              NsCarrier.isNs(c.left) && c.right.dataType == TimestampType =>
          c.withNewChildren(Seq(c.left, Multiply(micros(c.right), Literal(1000L))))
        case c: BinaryComparison
            if c.left.resolved && c.right.resolved &&
              c.left.dataType == TimestampType && isNum(c.right.dataType) =>
          c.withNewChildren(Seq(micros(c.left), Cast(c.right, LongType)))
        case c: BinaryComparison
            if c.left.resolved && c.right.resolved &&
              isNum(c.left.dataType) && c.right.dataType == TimestampType =>
          c.withNewChildren(Seq(Cast(c.left, LongType), micros(c.right)))
        // DATE (NTZ millis carrier) compares numerically against numbers
        // too (reference DATE is a long — SqlCodeGeneratorTest:2082
        // `c1 < c2` over date/double)
        case c: BinaryComparison
            if c.left.resolved && c.right.resolved &&
              c.left.dataType == TimestampNTZType && isNum(c.right.dataType) =>
          c.withNewChildren(Seq(
            IntegralDivide(UnixMicros(Cast(c.left, TimestampType)), Literal(1000L)),
            Cast(c.right, LongType)))
        case c: BinaryComparison
            if c.left.resolved && c.right.resolved &&
              isNum(c.left.dataType) && c.right.dataType == TimestampNTZType =>
          c.withNewChildren(Seq(Cast(c.left, LongType),
            IntegralDivide(UnixMicros(Cast(c.right, TimestampType)), Literal(1000L))))
      }
    }
  }
}

/** Reference IN-list coercion: every list item converts to the tested
  * expression's type (value-based membership — InTest
  * `d in (1::byte, '7'::string, …)` over a DOUBLE matches 1.0 and 7.0).
  * Spark's coercion finds a common type (often STRING) and compares in
  * it instead. Dialect-gated; fires only on heterogeneous lists over a
  * primitive test expression. */
object RefInListCoercionRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def primitive(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | TimestampType | TimestampNTZType | BooleanType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case in @ In(v, list)
            if v.resolved && list.forall(_.resolved) && primitive(v.dataType) &&
              list.exists(e => e.dataType != v.dataType && e.dataType != NullType) =>
          In(v, list.map {
            case e if e.dataType == v.dataType || e.dataType == NullType => e
            // timestamp items against an integral column compare in
            // MICROS (reference epoch-micros longs), not Spark's seconds
            case e if e.dataType == TimestampType &&
                (v.dataType == LongType || v.dataType == IntegerType) =>
              Cast(UnixMicros(e), v.dataType)
            // and integral items against a TIMESTAMP column are
            // epoch-micros too (`c in (1, null)` matches 1970-…000001Z —
            // SqlCompilerImplTest:7929)
            case e if v.dataType == TimestampType &&
                (e.dataType == LongType || e.dataType == IntegerType ||
                  e.dataType == ShortType || e.dataType == ByteType) =>
              MicrosToTimestamp(Cast(e, LongType))
            case e => Cast(e, v.dataType)
          })
        // Spark's coercion may get there first and wrap the TESTED side
        // instead (In(cast(d AS string), strings…)) — unwrap and convert
        // the list to the column's native type. Only ANALYZER-inserted
        // casts unwrap: a user-written `x::int IN (1,2)` carries the
        // parser's USER_SPECIFIED_CAST tag and must keep cast-then-
        // compare semantics (the reference applies the explicit cast
        // before membership).
        case in @ In(c @ Cast(v, _, _, _), list)
            if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty &&
              v.resolved && list.forall(_.resolved) && primitive(v.dataType) &&
              !v.dataType.isInstanceOf[StringType] =>
          In(v, list.map { e0 =>
            // the coercion also string-wrapped the items — unwrap to
            // recover their native types before converting (user casts
            // on items stay applied)
            val e = e0 match {
              case ci @ Cast(i, st, _, _)
                  if st.isInstanceOf[StringType] && i.resolved &&
                    ci.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty => i
              case x => x
            }
            e match {
              case x if x.dataType == v.dataType || x.dataType == NullType => x
              // timestamp items against an integral column compare in
              // MICROS (reference epoch-micros longs), not Spark's seconds
              case x if x.dataType == TimestampType &&
                  (v.dataType == LongType || v.dataType == IntegerType) =>
                Cast(UnixMicros(x), v.dataType)
              case x if v.dataType == TimestampType &&
                  (x.dataType == LongType || x.dataType == IntegerType ||
                    x.dataType == ShortType || x.dataType == ByteType) =>
                MicrosToTimestamp(Cast(x, LongType))
              case x => Cast(x, v.dataType)
            }
          })
      }
    }
  }
}

/** Reference double/float sort placement: null doubles ride as NaN in
  * the reference's sort (NaN compares greater than every value —
  * OrderByEncodeSortTest), so ASC puts nulls LAST and DESC puts them
  * FIRST. Spark's default is the opposite (nulls first on ASC). The
  * reference grammar has no NULLS FIRST/LAST spelling, so overriding
  * the default never fights an explicit request. Dialect queries only. */
object RefDoubleSortNullsRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp {
      case s: Sort =>
        val fixed = s.order.flatMap { so =>
          val alreadyWrapped = so.child match {
            case If(Or(_: IsNaN, _), Literal(null, _), _) => true
            case _ => false
          }
          if (!alreadyWrapped && so.child.resolved &&
              (so.child.dataType == DoubleType || so.child.dataType == FloatType)) {
            // non-finite values are the null carrier in the reference
            // (NaN/±Infinity print as null and sort with the nulls) —
            // fold them into the null key
            val c = so.child
            val nonFinite = Or(IsNaN(c),
              Or(EqualTo(c, Cast(Literal(Double.PositiveInfinity), c.dataType)),
                EqualTo(c, Cast(Literal(Double.NegativeInfinity), c.dataType))))
            val key = If(nonFinite, Literal(null, c.dataType), c)
            val nullOrd = so.direction match {
              case Ascending => NullsLast
              case Descending => NullsFirst
            }
            // IEEE total order puts -0.0 before 0.0 (the reference's
            // bit-pattern sort); Spark's comparator treats them equal —
            // break the tie on the rendered sign (SQL Divide nulls on
            // zero, so 1/x can't serve as the key)
            val tie = If(nonFinite, Literal(null, IntegerType),
              If(StartsWith(Cast(c, StringType), Literal("-")),
                Literal(0), Literal(1)))
            Seq(so.copy(child = key, nullOrdering = nullOrd),
              so.copy(child = tie, nullOrdering = nullOrd))
          } else Seq(so)
        }
        if (fixed == s.order) s else s.copy(order = fixed)
    }
  }
}

/** Reference EXCEPT ALL / INTERSECT ALL semantics: the reference hashes
  * side B once and streams side A, emitting each A row whose
  * full-record key is ABSENT (`union/ExceptAllRecordCursor.java:82`) or
  * PRESENT (`union/IntersectAllRecordCursor.java:81`) in B — a
  * value-based anti/semi join that keeps side A's duplicates, NOT SQL's
  * multiset difference (A={10,10,10,20}, B={10}: reference EXCEPT ALL
  * yields {20}, SQL yields {10,10,20} — LateralJoinTest.java:8392).
  * Lower the resolved set-op to the equivalent left anti/semi join with
  * null-safe equality over the paired outputs. Gated to dialect
  * statements; the DataFrame API keeps Spark's standard semantics. */
object RefSetOpAllRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}

  private def asJoin(left: LogicalPlan, right: LogicalPlan,
                     jt: org.apache.spark.sql.catalyst.plans.JoinType): LogicalPlan = {
    // a self-set-op shares attribute ids across sides — re-alias B
    val rightSafe =
      if (left.outputSet.intersect(right.outputSet).nonEmpty)
        Project(right.output.map(a => Alias(a, a.name)()), right)
      else right
    val cond = left.output.zip(rightSafe.output)
      .map { case (l, r) => EqualNullSafe(l, r): Expression }
      .reduceOption(And.apply)
    Join(left, rightSafe, jt, cond, JoinHint.NONE)
  }

  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case e @ Except(left, right, true) if e.resolved =>
        asJoin(left, right, LeftAnti)
      case i @ Intersect(left, right, true) if i.resolved =>
        asJoin(left, right, LeftSemi)
    }
  }
}

/** Shared recognition of the TIMESTAMP_NS BIGINT nanos carrier: a
  * LongType expression whose underlying attribute carries the graft.ns
  * schema metadata (set at CREATE TABLE for declared TIMESTAMP_NS
  * columns — reference ColumnType.TIMESTAMP_NS dispatches per-unit via
  * TimestampDriver the same way). */
object NsCarrier {
  val Key = "graft.ns"
  def isNs(e: Expression): Boolean = e.dataType == LongType && (e match {
    case a: AttributeReference => a.metadata.contains(Key) && a.metadata.getBoolean(Key)
    case Alias(c, _) => isNs(c)
    case _ => false
  })
  def nsMeta: Metadata =
    new MetadataBuilder().putBoolean(Key, true).build()
}

/** Datetime functions receive the ns carrier where they expect a
  * TIMESTAMP/DATE: convert ns→µs at the argument (year(ts_ns),
  * date_trunc('day', ts_ns) — MonotonicTimestampPruningTest nanos
  * partitions). Generic over ImplicitCastInputTypes: any argument
  * position whose expected type admits a timestamp gets the bridge, so
  * each datetime expression class needn't be enumerated. */
object NsTimestampInputRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.analysis.TypeCoercion

  private def toMicrosTs(e: Expression): Expression =
    MicrosToTimestamp(Cast(IntegralDivide(e, Literal(1000L)), LongType))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case e: ImplicitCastInputTypes
            if e.children.nonEmpty && e.childrenResolved && {
              val mask = org.apache.spark.sql.classic.GraftBridge.timestampInputMask(e)
              mask.size == e.children.size &&
                e.children.zip(mask).exists { case (c, m) => m && NsCarrier.isNs(c) }
            } =>
          val mask = org.apache.spark.sql.classic.GraftBridge.timestampInputMask(e)
          e.withNewChildren(e.children.zip(mask).map {
            case (c, m) if m && NsCarrier.isNs(c) => toMicrosTs(c)
            case (c, _) => c
          })
      }
    }
  }
}

/** Unit-preserving aggregates/window functions over the ns carrier keep
  * ns-ness on their OUTPUT alias (reference window factories return the
  * argument's type — max(ts_ns) is still a TIMESTAMP_NS): stamp the
  * graft.ns metadata on the alias so RefText renders the 9-digit
  * pattern (WindowFunctionTest custom-aliased max/nth_value over ns). */
object NsMetaPropagationRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.expressions.aggregate._

  private def unitPreservingNs(e: Expression): Boolean = e match {
    case ae: AggregateExpression => ae.aggregateFunction match {
      case Max(c) => NsCarrier.isNs(c)
      case Min(c) => NsCarrier.isNs(c)
      case First(c, _) => NsCarrier.isNs(c)
      case Last(c, _) => NsCarrier.isNs(c)
      // the O(n) sliding-frame tier returns its value argument's type
      // (min/max/first/last over a time-RANGE frame) — ns-ness follows
      // the value exactly like the native aggregates above
      case s: graft.functions.SlidingRangeAgg => NsCarrier.isNs(s.value)
      case _ => false
    }
    case we: WindowExpression => unitPreservingNs(we.windowFunction)
    case Lead(c, _, _, _) => NsCarrier.isNs(c)
    case Lag(c, _, _, _) => NsCarrier.isNs(c)
    case NthValue(c, _, _) => NsCarrier.isNs(c)
    case Coalesce(cs) => cs.nonEmpty && cs.forall(NsCarrier.isNs)
    case Greatest(cs) => cs.forall(NsCarrier.isNs)
    case Least(cs) => cs.forall(NsCarrier.isNs)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    val stamped = scala.collection.mutable.Set[ExprId]()
    val p1 = plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case a @ Alias(child, name)
            if a.resolved && a.dataType == LongType &&
              !a.metadata.contains(NsCarrier.Key) && unitPreservingNs(child) =>
          stamped += a.exprId
          Alias(child, name)(a.exprId, a.qualifier, Some(
            new MetadataBuilder().withMetadata(a.metadata)
              .putBoolean(NsCarrier.Key, true).build()),
            a.nonInheritableMetadataKeys)
        case a: Alias
            if a.resolved && a.dataType == LongType &&
              a.metadata.contains(NsCarrier.Key) =>
          stamped += a.exprId; a
      }
    }
    // outer operators may hold AttributeReferences to the stamped alias
    // that were resolved BEFORE the stamp (textual wrapping projections)
    // — refresh their metadata so the final output schema carries ns
    if (stamped.isEmpty) p1
    else p1.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case ar: AttributeReference
            if stamped(ar.exprId) && !ar.metadata.contains(NsCarrier.Key) =>
          ar.withMetadata(new MetadataBuilder().withMetadata(ar.metadata)
            .putBoolean(NsCarrier.Key, true).build())
      }
    }
  }
}

/** Set operations mixing a µs TIMESTAMP column with a TIMESTAMP_NS
  * carrier (IntersectTest micro_events ∩ nano_events): the reference
  * widens to ns (exact); Spark rejects the column-type pair. Bridge the
  * µs side to the ns carrier with the graft.ns metadata so downstream
  * rendering keeps the 9-digit pattern. */
object NsSetOpCoercionRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical._

  private def bridge(children: Seq[LogicalPlan]): Option[Seq[LogicalPlan]] = {
    val outs = children.map(_.output)
    val n = outs.head.size
    if (outs.exists(_.size != n)) return None
    val nsPos = (0 until n).filter { i =>
      outs.exists(o => NsCarrier.isNs(o(i))) &&
        outs.exists(o => o(i).dataType == TimestampType)
    }
    if (nsPos.isEmpty) None
    else Some(children.map { ch =>
      val out = ch.output
      val needs = nsPos.filter(i => out(i).dataType == TimestampType)
      if (needs.isEmpty) ch
      else Project(out.zipWithIndex.map { case (a, i) =>
        if (needs.contains(i))
          Alias(Multiply(UnixMicros(a), Literal(1000L)), a.name)(
            explicitMetadata = Some(NsCarrier.nsMeta))
        else a
      }, ch)
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.dialect.refSemantics", "false").toBoolean) return plan
    plan.resolveOperatorsUp {
      case u: Union if u.childrenResolved =>
        bridge(u.children).map(cs => u.copy(children = cs)).getOrElse(u)
      case i @ Intersect(l, r, _) if i.childrenResolved =>
        bridge(Seq(l, r)).map(cs => i.copy(left = cs(0), right = cs(1))).getOrElse(i)
      case e @ Except(l, r, _) if e.childrenResolved =>
        bridge(Seq(l, r)).map(cs => e.copy(left = cs(0), right = cs(1))).getOrElse(e)
    }
  }
}
