package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Finance functions (reference `functions/finance/` — mid, spread,
  * spread_bps, wmid, l2price).
  */
object Finance {
  def mid(bid: Column, ask: Column): Column = (bid + ask) / 2.0

  def spread(bid: Column, ask: Column): Column = ask - bid

  def spreadBps(bid: Column, ask: Column): Column =
    (ask - bid) / ((bid + ask) / 2.0) * 10000.0

  /** Size-weighted mid. */
  def wmid(bidSz: Column, bid: Column, ask: Column, askSz: Column): Column =
    (bid * askSz + ask * bidSz) / (bidSz + askSz)

  /** l2price: order-book sweep — average fill price for `target` units
    * walking levels in book order (reference `L2PriceFunctionFactory`:
    * null when the book can't fill the target).
    *
    * Relational lowering over a (bookKey, levelNo, size, price) table:
    * running pre-fill via a window cumsum, per-level fill =
    * clamp(target - cumBefore, 0, size), exact decimal cost sum.
    * One shuffle on the book key; scales with the level table.
    */
  def l2price(levels: DataFrame, bookKeys: Seq[String], levelOrder: Seq[String],
              sizeCol: String, priceCol: String, target: Double): DataFrame = {
    val w = Window.partitionBy(bookKeys.map(col): _*)
      .orderBy(levelOrder.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    levels
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("__fill",
        greatest(least(col(sizeCol), lit(target) - (col("__cum") - col(sizeCol))), lit(0.0)))
      .groupBy(bookKeys.map(col): _*)
      .agg(
        // exact 6-dp sums via scaled longs (per-row decimal Cast costs a
        // Double.toString — see Aggregators.scaledLong)
        Aggregators.descale(sum(Aggregators.scaledLong(col("__fill"), 1000000L)), 1000000L)
          .as("filled"),
        Aggregators.descale(
          sum(Aggregators.scaledLong(col("__fill") * col(priceCol), 1000000L)), 1000000L)
          .as("cost"))
      .withColumn("l2price",
        when(col("filled") >= target, col("cost") / target))
      .drop("cost")
  }
}
