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

  /** Dense HyperLogLog cardinality sketch (reference
    * `groupby/hyperloglog/HyperLogLogDenseRepresentation.java`):
    * 2^p byte registers, register = max leading-zero rank of the hashed
    * value's suffix; estimate = bias-corrected harmonic mean with
    * linear-counting small-range correction (Flajolet et al., HLL 2007).
    *
    * Merge is element-wise register max, so partials combine associatively
    * on any shuffle topology — the sketch that makes COUNT(DISTINCT) a
    * single map-side-combined aggregation over 100 TB instead of an
    * Expand + two-phase exact distinct.
    *
    * Input is a pre-hashed 64-bit value: call through [[approxCountDistinct]],
    * which applies Spark's codegen'd `xxhash64` and skips NULLs (QuestDB
    * `count_distinct` semantics).
    */
  class HyperLogLog(p: Int) extends Aggregator[java.lang.Long, Array[Byte], Long]
      with Serializable {
    require(p >= 4 && p <= 18, s"HLL precision $p outside [4, 18]")
    private val m = 1 << p
    private val alphaMM: Double = (p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }) * m * m

    def zero: Array[Byte] = new Array[Byte](m)

    def reduce(regs: Array[Byte], hashed: java.lang.Long): Array[Byte] = {
      if (hashed != null) {
        val h = hashed.longValue()
        val idx = (h >>> (64 - p)).toInt
        // rank of the first 1-bit in the remaining 64-p bits (1-based)
        val w = h << p
        val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
        if (rank > regs(idx)) regs(idx) = rank.toByte
      }
      regs
    }

    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    def finish(regs: Array[Byte]): Long = {
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += java.lang.Double.longBitsToDouble((1023L - regs(i)) << 52) // 2^-reg
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alphaMM / invSum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
        else raw
      math.round(est)
    }

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** `approx_count_distinct(c)` over graft's own HLL sketch. Default
    * p=14 → 16384 registers ≈ 0.81 % standard error (the reference's
    * default precision, `CountDistinctFunctionFactory`).
    */
  def approxCountDistinct(c: Column, precision: Int = 14): Column =
    udaf(new HyperLogLog(precision)).apply(when(c.isNotNull, xxhash64(c)))

  /** HDR-histogram-style approximate percentile (reference
    * `approx_percentile(value, pct, precision)` over an HdrHistogram,
    * `functions/groupby/ApproxPercentileDoubleGroupByFunction.java`):
    * positive values are bucketed by (IEEE exponent, top sub-bucket bits)
    * giving relative error ≤ 2^-bits; the percentile is answered from the
    * sparse bucket→count map. Mergeable by count addition (same property
    * HdrHistogram.add gives the reference).
    */
  class ApproxPercentile(pct: Double, bits: Int)
      extends Aggregator[java.lang.Double, Map[Long, Long], Double] with Serializable {
    require(pct >= 0.0 && pct <= 1.0, s"percentile $pct outside [0, 1]")
    require(bits >= 1 && bits <= 20, s"sub-bucket bits $bits outside [1, 20]")

    private def bucketOf(v: Double): Long = {
      // key = sign-preserved (exponent ∥ top mantissa bits); order-isomorphic
      // to v for positive values, so sorted keys answer quantiles
      val raw = java.lang.Double.doubleToLongBits(v)
      val magnitude = raw & 0x7fffffffffffffffL
      val key = magnitude >>> (52 - bits)
      if (raw < 0) -key else key
    }

    private def midOf(bucket: Long): Double = {
      val key = math.abs(bucket)
      val lo = java.lang.Double.longBitsToDouble(key << (52 - bits))
      val hi = java.lang.Double.longBitsToDouble((key + 1) << (52 - bits))
      val mid = (lo + hi) / 2.0
      if (bucket < 0) -mid else mid
    }

    def zero: Map[Long, Long] = Map.empty
    def reduce(b: Map[Long, Long], v: java.lang.Double): Map[Long, Long] =
      if (v == null || v.isNaN) b
      else { val k = bucketOf(v); b.updated(k, b.getOrElse(k, 0L) + 1L) }
    def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      b.foldLeft(a) { case (acc, (k, n)) => acc.updated(k, acc.getOrElse(k, 0L) + n) }
    def finish(b: Map[Long, Long]): Double = {
      if (b.isEmpty) return Double.NaN
      val total = b.valuesIterator.sum
      val target = math.max(1L, math.ceil(pct * total).toLong)
      var seen = 0L
      for ((k, n) <- b.toSeq.sortBy(_._1)) {
        seen += n
        if (seen >= target) return midOf(k)
      }
      midOf(b.keysIterator.max)
    }

    def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `approx_percentile(c, pct)` with ~0.1 % relative error (10 sub-bucket
    * bits ≈ HdrHistogram precision 3).
    */
  def approxPercentile(c: Column, pct: Double, bits: Int = 10): Column =
    udaf(new ApproxPercentile(pct, bits)).apply(c.cast("double"))

  /** Exact ×`scale` integer scaling of a value whose decimal expansion
    * the scale covers, in pure double codegen: x·s is within ~1e-9 of an
    * integer, so half-away-from-zero via floor(|x·s|+0.5) recovers it
    * exactly — without the per-row BigDecimal.valueOf (a Double.toString)
    * that a double→decimal Cast or Round costs.
    */
  private[graft] def scaledLong(c: Column, scale: Long): Column =
    when(c >= 0, floor(c * scale + 0.5))
      .otherwise(-floor(-c * scale + 0.5)).cast("long")

  /** One exact decimal→double rounding of `sumOfScaled / scale` (runs per
    * OUTPUT row — the per-input-row path above stays in long codegen).
    */
  private[graft] def descale(sumOfScaled: Column, scale: Long): Column =
    (sumOfScaled.cast("decimal(30,0)") / lit(scale)).cast("double")

  /** VWAP = Σ(price·qty)/Σ(qty) (reference `VwapGroupByFunction`).
    * Composed from exact scaled-long sums (2-dp money inputs → ×100 is
    * lossless; the product carries scale 10⁴), so partials are
    * order-independent and partial-aggregating for free; only the final
    * division is floating point — on engine-identical operands.
    */
  def vwap(price: Column, qty: Column): Column = {
    val p = scaledLong(price, 100L)
    val q = scaledLong(qty, 100L)
    descale(sum(p * q), 10000L) / descale(sum(q), 100L)
  }

  /** TWAP over the designated ts: time-weighted mean where each value
    * holds until the next observation (reference `TwapGroupByFunction`).
    * Needs the per-row holding interval, so it is lowered at call sites
    * via lead(ts) windows; helper here does the weighted mean.
    */
  /** `weightMicros` must be an integral column (exact long cast). */
  def timeWeightedAvg(value: Column, weightMicros: Column): Column = {
    val w = weightMicros.cast("long")
    descale(sum(scaledLong(value, 100L) * w), 100L) / descale(sum(w), 1L)
  }
  /** `corr(y, x)` with the reference's exact numerics (reference
    * `groupby/CorrGroupByFunctionFactory.java` Welford update order +
    * Chan et al. merge, final via `Numbers.corrFromSums`: split-sqrt
    * fallback when the sum-product overflows/underflows, clamp to
    * [-1, 1], NaN below 2 points). Spark's corr differs at the ULP
    * level and returns 0/null on the overflow/underflow edges. */
  case class CorrBuf(meanY: Double, sumY: Double, meanX: Double,
                     sumX: Double, sumXY: Double, n: Long)
  object CorrRef extends Aggregator[(java.lang.Double, java.lang.Double),
      CorrBuf, java.lang.Double] {
    def zero = CorrBuf(0.0, 0.0, 0.0, 0.0, 0.0, 0L)
    def reduce(b: CorrBuf, in: (java.lang.Double, java.lang.Double)) = {
      val (y0, x0) = in
      if (y0 == null || x0 == null || y0.isNaN || x0.isNaN ||
          y0.isInfinite || x0.isInfinite) b
      else {
        val (y, x) = (y0.doubleValue, x0.doubleValue)
        val n = b.n + 1
        val oldMeanY = b.meanY
        val meanY = oldMeanY + (y - oldMeanY) / n
        val sumY = b.sumY + (y - meanY) * (y - oldMeanY)
        val oldMeanX = b.meanX
        val meanX = oldMeanX + (x - oldMeanX) / n
        val sumX = b.sumX + (x - meanX) * (x - oldMeanX)
        val sumXY = b.sumXY + (y - oldMeanY) * (x - meanX)
        CorrBuf(meanY, sumY, meanX, sumX, sumXY, n)
      }
    }
    def merge(a: CorrBuf, c: CorrBuf) = {
      if (c.n == 0) a
      else if (a.n == 0) c
      else {
        val CorrBuf(srcMeanY, srcSumY, srcMeanX, srcSumX, srcSumXY, srcN) = a
        val CorrBuf(dstMeanY, dstSumY, dstMeanX, dstSumX, dstSumXY, dstN) = c
        val n = srcN + dstN
        val deltaY = dstMeanY - srcMeanY
        val deltaX = dstMeanX - srcMeanX
        val w = (srcN * dstN).toDouble / n
        CorrBuf((srcN * srcMeanY + dstN * dstMeanY) / n,
          srcSumY + dstSumY + (deltaY * deltaY) * w,
          (srcN * srcMeanX + dstN * dstMeanX) / n,
          srcSumX + dstSumX + (deltaX * deltaX) * w,
          srcSumXY + dstSumXY + (deltaX * deltaY) * w,
          n)
      }
    }
    def finish(b: CorrBuf): java.lang.Double = {
      val CorrBuf(_, sumY, _, sumX, sumXY, n) = b
      if (n <= 1) return null
      val prod = sumY * sumX
      val splitDenom = !java.lang.Double.isFinite(prod) ||
        (prod == 0.0 && sumY != 0.0 && sumX != 0.0)
      val denom = if (splitDenom) math.sqrt(sumY) * math.sqrt(sumX) else math.sqrt(prod)
      if (denom == 0.0) return null
      val r = sumXY / denom
      if (r > 1.0) 1.0 else if (r < -1.0) -1.0 else r
    }
    def bufferEncoder: Encoder[CorrBuf] = Encoders.product[CorrBuf]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** weighted_stddev_{rel,freq}(x, w) with the reference's West-style
    * incremental accumulation and merge (reference
    * `groupby/AbstractWeightedStdDevGroupByFunction.java`): numerically
    * stable at 1e13 magnitudes where the textual sum-of-squares form
    * cancels, NaN (→ null) when the divisor is non-positive (negative
    * weight sums), non-finite samples/weights and zero weights skipped. */
  class WeightedStdDev(freq: Boolean)
      extends Aggregator[(java.lang.Double, java.lang.Double),
        (Double, Double, Double, Double), java.lang.Double] with Serializable {
    def zero = (0.0, 0.0, 0.0, 0.0)
    def reduce(b: (Double, Double, Double, Double),
               in: (java.lang.Double, java.lang.Double)) = {
      val (x0, w0) = in
      val bad = x0 == null || w0 == null ||
        !java.lang.Double.isFinite(x0.doubleValue) ||
        !java.lang.Double.isFinite(w0.doubleValue) || w0.doubleValue == 0.0
      if (bad) b
      else {
        val (sample, weight) = (x0.doubleValue, w0.doubleValue)
        val wSum = b._1 + weight
        val wSum2 = b._2 + weight * weight
        val meanOld = b._3
        val mean = meanOld + (weight / wSum) * (sample - meanOld)
        val sAcc = b._4 + weight * (sample - meanOld) * (sample - mean)
        (wSum, wSum2, mean, sAcc)
      }
    }
    def merge(dst: (Double, Double, Double, Double),
              src: (Double, Double, Double, Double)) = {
      if (src._1 == 0.0) dst
      else if (dst._1 == 0.0) src
      else {
        val meanDelta = src._3 - dst._3
        val wSum = src._1 + dst._1
        (wSum, src._2 + dst._2,
          (src._1 * src._3 + dst._1 * dst._3) / wSum,
          src._4 + dst._4 + (src._1 * meanDelta) / wSum * (dst._1 * meanDelta))
      }
    }
    def finish(b: (Double, Double, Double, Double)): java.lang.Double = {
      val divisor = if (freq) b._1 - 1.0 else b._1 - b._2 / b._1
      if (!(divisor > 0.0)) null else {
        val v = math.sqrt(b._4 / divisor)
        if (v.isNaN) null else v
      }
    }
    def bufferEncoder: Encoder[(Double, Double, Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
        Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }
}
