package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregates the reference ships that Spark lacks as built-ins
  * (SURVEY §2.4; reference contract `functions/GroupByFunction.java:41`
  * — init/computeFirst/computeNext/merge maps directly onto
  * `Aggregator[IN, BUF, OUT]`'s zero/reduce/merge/finish).
  *
  * All are algebraic (mergeable partial states), so Spark plans them
  * with map-side partial aggregation — the property that matters at
  * 100 TB: shuffle carries one small buffer per key per partition.
  */
object Aggregators {

  /** Kahan compensated summation (reference `KSumDoubleGroupByFunction`).
    * Buffer = (sum, compensation); merge folds one compensated pair into
    * the other.
    */
  object KSum extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), x: Double): (Double, Double) = add(b, x)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      add(add(a, b._1), b._2)
    def finish(b: (Double, Double)): Double = b._1 + b._2
    private def add(b: (Double, Double), x: Double): (Double, Double) = {
      val y = x - b._2
      val t = b._1 + y
      (t, (t - b._1) - y)
    }
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Neumaier summation (reference `NSumDoubleGroupByFunction`) —
    * Kahan variant that stays accurate when the addend exceeds the sum.
    */
  object NSum extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), x: Double): (Double, Double) = add(b, x)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      add(add(a, b._1), b._2)
    def finish(b: (Double, Double)): Double = b._1 + b._2
    private def add(b: (Double, Double), x: Double): (Double, Double) = {
      val t = b._1 + x
      val c =
        if (math.abs(b._1) >= math.abs(x)) (b._1 - t) + x
        else (x - t) + b._1
      (t, b._2 + c)
    }
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def ksum(c: Column): Column = udaf(KSum).apply(c)
  def nsum(c: Column): Column = udaf(NSum).apply(c)

  /** VWAP = Σ(price·qty)/Σ(qty) (reference `VwapGroupByFunction`).
    * Composed from exact decimal sums so it is order-independent and
    * partial-aggregating for free.
    */
  /** Exactness note: the multiply happens in decimal (2-decimal money
    * inputs cast losslessly), so partial sums are order-independent and
    * engine-independent; only the final division is floating point —
    * on identical operands.
    */
  def vwap(price: Column, qty: Column): Column =
    sum(price.cast("decimal(18,2)") * qty.cast("decimal(18,2)")).cast("double") /
      sum(qty.cast("decimal(18,2)")).cast("double")

  /** TWAP over the designated ts: time-weighted mean where each value
    * holds until the next observation (reference `TwapGroupByFunction`).
    * Needs the per-row holding interval, so it is lowered at call sites
    * via lead(ts) windows; helper here does the weighted mean.
    */
  /** `weightMicros` must be an integral column (exact decimal cast). */
  def timeWeightedAvg(value: Column, weightMicros: Column): Column =
    sum(value.cast("decimal(12,2)") * weightMicros.cast("decimal(20,0)")).cast("double") /
      sum(weightMicros.cast("decimal(20,0)")).cast("double")
}
