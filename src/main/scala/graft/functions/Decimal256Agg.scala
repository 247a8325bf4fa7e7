package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** DECIMAL256 group-by tier (reference `groupby/SumDecimal*`,
  * `AvgDecimal256GroupByFunction.java`, Min/Max/First/Last/Count
  * decimal factories): mergeable `Aggregator`s over the canonical
  * decimal-string encoding, so Catalyst plans them with a map-side
  * partial phase like any built-in — exact BigDecimal accumulation,
  * null inputs skipped (SQL semantics), 255-bit coefficient overflow
  * throws a numeric-overflow error exactly as the reference's
  * `NumericException` does (`std/Decimal256.java:280`).
  */
object Decimal256Agg {

  private val MaxCoefficientBits = 255

  private def parse(s: String): JBigDecimal =
    if (s == null) null
    else try new JBigDecimal(s.trim) catch { case _: NumberFormatException => null }

  private def addStr(acc: String, v: String): String = {
    val x = parse(v)
    if (x == null) return acc // null/garbage input: skipped
    if (acc == null) return x.toPlainString
    val sum = parse(acc).add(x)
    if (sum.unscaledValue().bitLength() > MaxCoefficientBits)
      throw new ArithmeticException(
        "decimal256 overflow: coefficient exceeds 255 bits") // reference parity
    sum.toPlainString
  }

  /** sum(decimal256) — exact at any precision. */
  val Sum: Aggregator[String, String, String] =
    new Aggregator[String, String, String] {
      def zero: String = null
      def reduce(b: String, a: String): String = addStr(b, a)
      def merge(b1: String, b2: String): String = addStr(b1, b2)
      def finish(r: String): String = r
      def bufferEncoder: Encoder[String] = Encoders.STRING
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** avg(decimal256) at fixed scale 6, HALF_UP (reference
    * AvgDecimal256 divides the exact sum by the non-null count).
    */
  val Avg: Aggregator[String, (String, Long), String] =
    new Aggregator[String, (String, Long), String] {
      def zero: (String, Long) = (null, 0L)
      def reduce(b: (String, Long), a: String): (String, Long) =
        if (parse(a) == null) b else (addStr(b._1, a), b._2 + 1)
      def merge(b1: (String, Long), b2: (String, Long)): (String, Long) =
        (addStr(b1._1, b2._1), b1._2 + b2._2)
      def finish(r: (String, Long)): String = {
        val s = r._1
        if (s == null || r._2 == 0) null
        else parse(s).divide(JBigDecimal.valueOf(r._2), 6, RoundingMode.HALF_UP).toPlainString
      }
      def bufferEncoder: Encoder[(String, Long)] = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** avg at an ASKED scale beyond Spark's 38-digit decimals (reference
    * AvgDecimalRescale / the 128/256 window tiers): exact BigDecimal
    * accumulation, one division at the asked scale, HALF_EVEN like
    * the reference's Decimals.round.
    */
  val AvgAt: Aggregator[(String, Int), (String, Long, Int), String] =
    new Aggregator[(String, Int), (String, Long, Int), String] {
      def zero: (String, Long, Int) = (null, 0L, -1)
      def reduce(b: (String, Long, Int), a: (String, Int)): (String, Long, Int) =
        if (parse(a._1) == null) (b._1, b._2, a._2)
        else (addStr(b._1, a._1), b._2 + 1, a._2)
      def merge(b1: (String, Long, Int), b2: (String, Long, Int)): (String, Long, Int) =
        (addStr(b1._1, b2._1), b1._2 + b2._2, math.max(b1._3, b2._3))
      def finish(r: (String, Long, Int)): String =
        if (r._1 == null || r._2 == 0) null
        else parse(r._1)
          .divide(JBigDecimal.valueOf(r._2), math.max(r._3, 0), RoundingMode.HALF_EVEN)
          .toPlainString
      def bufferEncoder: Encoder[(String, Long, Int)] =
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaInt)
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  private def extreme(takeMax: Boolean): Aggregator[String, String, String] =
    new Aggregator[String, String, String] {
      def pick(b: String, a: String): String = {
        val x = parse(a)
        if (x == null) return b
        if (b == null) return x.toPlainString
        val cmp = x.compareTo(parse(b))
        if ((takeMax && cmp > 0) || (!takeMax && cmp < 0)) x.toPlainString else b
      }
      def zero: String = null
      def reduce(b: String, a: String): String = pick(b, a)
      def merge(b1: String, b2: String): String = pick(b1, b2)
      def finish(r: String): String = r
      def bufferEncoder: Encoder[String] = Encoders.STRING
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** min/max(decimal256) — numeric order, not the string order a plain
    * min(string) would give.
    */
  val Min: Aggregator[String, String, String] = extreme(takeMax = false)
  val Max: Aggregator[String, String, String] = extreme(takeMax = true)

  /** Register decimal256_sum/avg/min/max (first/last/count need no
    * decimal awareness — Spark's generic versions apply).
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("decimal256_sum", udaf(Sum))
    spark.udf.register("decimal256_avg", udaf(Avg))
    spark.udf.register("decimal256_avg_at", udaf(AvgAt))
    spark.udf.register("decimal256_min", udaf(Min))
    spark.udf.register("decimal256_max", udaf(Max))
  }
}
