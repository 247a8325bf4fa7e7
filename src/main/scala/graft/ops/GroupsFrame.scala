package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GROUPS window framing + EXCLUDE clauses — present in the reference's
  * window model (`griffin/model/WindowExpression.java:47-55`) but absent
  * from Spark's ROWS/RANGE-only frames.
  *
  * Lowering: a GROUPS frame is a RANGE frame over the peer-group index
  * (`dense_rank`), and the EXCLUDE variants of decomposable aggregates
  * (sum/count/avg) are frame-minus-contribution arithmetic:
  *
  *   EXCLUDE CURRENT ROW = frame − row
  *   EXCLUDE GROUP       = frame − peer-group total
  *   EXCLUDE TIES        = frame − peer-group total + row
  *
  * Two key-partitioned windows and one extra rank pass — no custom
  * physical operator needed for the decomposable cases (min/max with
  * EXCLUDE would need one; still open).
  */
object GroupsFrame {
  sealed trait Exclude
  case object NoOthers extends Exclude
  case object CurrentRow extends Exclude
  case object Group extends Exclude
  case object Ties extends Exclude

  /** Sum of `value` over `GROUPS BETWEEN nPreceding PRECEDING AND
    * CURRENT ROW [EXCLUDE ...]`, appended as column `out`.
    * `value` should be an exact (integral/decimal) expression when
    * cross-engine determinism matters.
    */
  def groupsSum(df: DataFrame, keys: Seq[String], orderCol: String,
                value: Column, nPreceding: Int, exclude: Exclude,
                out: String): DataFrame = {
    val wOrder = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    val wPeers = Window.partitionBy((keys :+ orderCol).map(col): _*)
    val withG = df.withColumn("__g", dense_rank().over(wOrder))
    val wFrame = Window.partitionBy(keys.map(col): _*).orderBy(col("__g").asc)
      .rangeBetween(-nPreceding.toLong, 0)
    val frame = sum(value).over(wFrame)
    val peerTotal = sum(value).over(wPeers)
    val nFrame = count(lit(1)).over(wFrame)
    val nPeers = count(lit(1)).over(wPeers)
    // an emptied frame aggregates to NULL, not 0 (SQL standard)
    val expr = exclude match {
      case NoOthers => frame
      case CurrentRow => when(nFrame - 1 > 0, frame - value)
      case Group => when(nFrame - nPeers > 0, frame - peerTotal)
      case Ties => frame - peerTotal + value // current row always remains
    }
    withG.withColumn(out, expr).drop("__g")
  }

  /** Min/max over `GROUPS BETWEEN nPreceding PRECEDING AND CURRENT ROW
    * [EXCLUDE ...]` — the non-decomposable cases (closing the gap noted
    * in the class doc). Frame-minus-contribution arithmetic doesn't
    * apply to min/max, but the excluded variants are all unions of
    * contiguous sub-frames, each expressible as its own window:
    *
    *   EXCLUDE GROUP       = agg over groups [g−n, g−1]
    *   EXCLUDE TIES        = least/greatest(groups [g−n, g−1], own row)
    *   EXCLUDE CURRENT ROW = least/greatest(groups [g−n, g−1],
    *                           peers before row, peers after row)
    *
    * (`least`/`greatest` skip NULLs, so empty sub-frames drop out; an
    * entirely empty frame is NULL, per the SQL standard.) Three
    * key-partitioned window passes, no custom physical operator.
    */
  def groupsMinMax(df: DataFrame, keys: Seq[String], orderCol: String,
                   value: Column, nPreceding: Int, exclude: Exclude,
                   isMin: Boolean, out: String): DataFrame = {
    def agg(c: Column): Column = if (isMin) min(c) else max(c)
    def best(cs: Column*): Column = if (isMin) least(cs: _*) else greatest(cs: _*)
    val wOrder = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    val withG = df.withColumn("__g", dense_rank().over(wOrder))
    def gFrame(lo: Long, hi: Long) =
      Window.partitionBy(keys.map(col): _*).orderBy(col("__g").asc).rangeBetween(lo, hi)
    val prev = agg(value).over(gFrame(-nPreceding.toLong, -1L))
    val expr = exclude match {
      case NoOthers => agg(value).over(gFrame(-nPreceding.toLong, 0L))
      case Group => prev
      case Ties => best(prev, value)
      case CurrentRow =>
        val peers = Window.partitionBy((keys :+ orderCol).map(col): _*)
          .orderBy(value.asc)
        val before = agg(value).over(peers.rowsBetween(Window.unboundedPreceding, -1))
        val after = agg(value).over(peers.rowsBetween(1, Window.unboundedFollowing))
        best(prev, before, after)
    }
    withG.withColumn(out, expr).drop("__g")
  }

  // ---- fused multi-aggregate lowering --------------------------------------

  sealed trait GAgg { def exclude: Exclude; def out: String }
  final case class GSum(value: Column, exclude: Exclude, out: String) extends GAgg
  final case class GCount(exclude: Exclude, out: String) extends GAgg
  final case class GMin(value: Column, exclude: Exclude, out: String) extends GAgg
  final case class GMax(value: Column, exclude: Exclude, out: String) extends GAgg

  /** Every requested GROUPS-frame aggregate in ONE pass: the peer-group
    * rank is computed once and all window expressions land in a single
    * projection, so Spark fuses them into one Window operator per
    * distinct (partition, order, frame) spec — a handful of passes over
    * one sort, instead of a stacked tower of re-ranking windows when
    * the single-aggregate helpers are chained.
    */
  def groupsAggs(df: DataFrame, keys: Seq[String], orderCol: String,
                 nPreceding: Int, aggs: Seq[GAgg]): DataFrame =
    groupsAggsFrame(df, keys, orderCol, -nPreceding.toLong, 0L, aggs)

  /** General GROUPS frame `BETWEEN lo AND hi` (group offsets: negative =
    * PRECEDING, positive = FOLLOWING, `Window.unboundedPreceding`/
    * `unboundedFollowing` sentinels accepted) with every EXCLUDE mode.
    *
    * When the frame does not contain the current peer group
    * (`lo > 0 || hi < 0`), the EXCLUDE clauses remove nothing (they only
    * exclude rows *in* the frame — SQL:2011 7.11), so all modes collapse
    * to the plain frame aggregate. Otherwise sums/counts use
    * frame-minus-contribution arithmetic and min/max compose the
    * contiguous sub-frames around the current group.
    */
  def groupsAggsFrame(df: DataFrame, keys: Seq[String], orderCol: String,
                      lo: Long, hi: Long, aggs: Seq[GAgg]): DataFrame = {
    val wOrder = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    val withG = df.withColumn("__g", dense_rank().over(wOrder))
    def gFrame(l: Long, h: Long) =
      Window.partitionBy(keys.map(col): _*).orderBy(col("__g").asc).rangeBetween(l, h)
    val wFrame = gFrame(lo, hi)
    val wPeers = Window.partitionBy((keys :+ orderCol).map(col): _*)
    val containsCurrent = lo <= 0L && hi >= 0L

    val outCols = aggs.map {
      case GSum(v, ex, out) =>
        val frame = sum(v).over(wFrame)
        val peers = sum(v).over(wPeers)
        val nF = count(lit(1)).over(wFrame)
        val nP = count(lit(1)).over(wPeers)
        (ex match {
          case _ if !containsCurrent => frame
          case NoOthers => frame
          case CurrentRow => when(nF - 1 > 0, frame - v)
          case Group => when(nF - nP > 0, frame - peers)
          case Ties => frame - peers + v
        }).as(out)
      case GCount(ex, out) =>
        val frame = count(lit(1)).over(wFrame)
        val peers = count(lit(1)).over(wPeers)
        (ex match {
          case _ if !containsCurrent => frame
          case NoOthers => frame
          case CurrentRow => frame - 1
          case Group => frame - peers
          case Ties => frame - peers + 1
        }).as(out)
      case mm: GAgg => // GMin / GMax
        val (v, isMin) = mm match {
          case GMin(v, _, _) => (v, true)
          case GMax(v, _, _) => (v, false)
          case _ => throw new MatchError(mm)
        }
        def agg(c: Column) = if (isMin) min(c) else max(c)
        def best(cs: Column*) = if (isMin) least(cs: _*) else greatest(cs: _*)
        // sub-frames strictly before / after the current peer group
        // (least/greatest skip NULLs, so an empty side drops out)
        val prev = if (lo <= -1L) Some(agg(v).over(gFrame(lo, -1L))) else None
        val next = if (hi >= 1L) Some(agg(v).over(gFrame(1L, hi))) else None
        val sides = prev.toSeq ++ next.toSeq
        (mm.exclude match {
          case _ if !containsCurrent => agg(v).over(wFrame)
          case NoOthers => agg(v).over(wFrame)
          case Group => sides match {
            case Seq() => lit(null).cast("double")
            case Seq(one) => one
            case many => best(many: _*)
          }
          case Ties => best(sides :+ v: _*)
          case CurrentRow =>
            val peersOrd = Window.partitionBy((keys :+ orderCol).map(col): _*).orderBy(v.asc)
            best(sides ++ Seq(
              agg(v).over(peersOrd.rowsBetween(Window.unboundedPreceding, -1)),
              agg(v).over(peersOrd.rowsBetween(1, Window.unboundedFollowing))): _*)
        }).as(mm.out)
    }
    withG.select(df.columns.map(col) ++ outCols: _*)
  }

  /** Count over the same frame semantics. */
  def groupsCount(df: DataFrame, keys: Seq[String], orderCol: String,
                  nPreceding: Int, exclude: Exclude, out: String): DataFrame = {
    val wOrder = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    val wPeers = Window.partitionBy((keys :+ orderCol).map(col): _*)
    val withG = df.withColumn("__g", dense_rank().over(wOrder))
    val wFrame = Window.partitionBy(keys.map(col): _*).orderBy(col("__g").asc)
      .rangeBetween(-nPreceding.toLong, 0)
    val frame = count(lit(1)).over(wFrame)
    val peers = count(lit(1)).over(wPeers)
    val expr = exclude match {
      case NoOthers => frame
      case CurrentRow => frame - 1
      case Group => frame - peers
      case Ties => frame - peers + 1
    }
    withG.withColumn(out, expr).drop("__g")
  }
}
