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
