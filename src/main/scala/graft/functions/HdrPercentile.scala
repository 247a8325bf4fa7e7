package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bit-compatible reimplementation of the reference's
  * `approx_percentile` (reference
  * `functions/groupby/ApproxPercentileLong|DoubleGroupByFunction.java`
  * over `std/histogram/org/HdrHistogram`): an HdrHistogram with
  * power-of-two sub-bucketing — `subBucketCount = 2^ceil(log2(2·10^p))`
  * for precision `p` (default 1) — answering
  * `getValueAtPercentile(pct·100)` as the highest equivalent value of
  * the bucket at `ceil(nextDown(pct·100)·n/100)` cumulative count.
  *
  * LONG inputs record directly. DOUBLE inputs reproduce
  * `DoubleHistogram(1000, p)` auto-ranging: the first non-zero value v
  * pins `lowest = 2^floor(log2 v)` and the integer conversion ratio
  * `lowest / subBucketHalfCount`; values below the range scale the
  * histogram up by the power-of-two gap (bucket lows shift left, the
  * same transform the reference's physical shift performs), values at
  * or above `lowest · 2048` scale it down.
  *
  * Buffer state is a sparse bucket-low → count map, mergeable by count
  * addition after ratio alignment — the distributed analogue of
  * `Histogram.add`.
  */
object HdrPercentile {

  case class Buf(counts: Map[Long, Long], zero: Long, lowest: Double,
                 pct: Double, digits: Int, isLong: Boolean, seen: Boolean)

  private def magnitudeOf(digits: Int): Int = {
    val largest = 2L * math.pow(10, digits).toLong
    64 - java.lang.Long.numberOfLeadingZeros(largest - 1)
  }

  /** Bucket low bound containing integer value v (v ≥ 1). */
  private def bucketLow(v: Long, magnitude: Int): Long = {
    val subBucketCount = 1L << magnitude
    if (v < subBucketCount) v
    else {
      val k = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val shift = k - (magnitude - 1)
      v & ~((1L << shift) - 1)
    }
  }

  /** Width of the bucket whose low bound is `low`. */
  private def bucketWidth(low: Long, magnitude: Int): Long = {
    val subBucketCount = 1L << magnitude
    if (low < subBucketCount) 1L
    else {
      val k = 63 - java.lang.Long.numberOfLeadingZeros(low)
      1L << (k - (magnitude - 1))
    }
  }

  class Agg extends Aggregator[(java.lang.Double, java.lang.Double,
      java.lang.Integer, String), Buf, java.lang.Double] with Serializable {

    def zero: Buf = Buf(Map.empty, 0L, 0.0, 0.5, 1, isLong = true, seen = false)

    private def record(b0: Buf, v: Double): Buf = {
      // negative inputs are SKIPPED, not errors (reference
      // ApproxMedianLongGroupByFunctionFactoryTest: median of (1, -1)
      // is 1 — the HDR histogram records the non-negative domain)
      if (v < 0) return b0
      val mag = magnitudeOf(b0.digits)
      val half = 1L << (mag - 1)
      if (b0.isLong) {
        val iv = v.toLong
        if (iv == 0L) return b0.copy(zero = b0.zero + 1, seen = true)
        val low = bucketLow(iv, mag)
        return b0.copy(counts = b0.counts.updated(low, b0.counts.getOrElse(low, 0L) + 1L), seen = true)
      }
      // double mode: auto-ranged conversion (reference DoubleHistogram(1000, p))
      if (v == 0.0) return b0.copy(zero = b0.zero + 1, seen = true)
      var b = b0
      if (!b.seen || b.lowest == 0.0) {
        val l = math.pow(2.0, math.floor(math.log(v) / math.log(2.0)))
        b = b.copy(lowest = l, seen = true)
      }
      // below range: shift histogram up by the power-of-two gap
      while (v < b.lowest) {
        val newLowest = math.pow(2.0, math.floor(math.log(v) / math.log(2.0)))
        val k = math.round(math.log(b.lowest / newLowest) / math.log(2.0)).toInt
        val scaled = b.counts.groupBy { case (low, _) => low << k }
          .map { case (nl, m) => nl -> m.values.sum }
        b = b.copy(counts = scaled, lowest = newLowest)
      }
      // at/above range limit (lowest * 2048): shift histogram down
      while (v >= b.lowest * 2048.0) {
        val newLowest = b.lowest * 2.0
        val scaled = b.counts.groupBy { case (low, _) =>
          bucketLow(math.max(low >> 1, 1L), mag)
        }.map { case (nl, m) => nl -> m.values.sum }
        b = b.copy(counts = scaled, lowest = newLowest)
      }
      val ratioInv = half / b.lowest
      val iv = (v * ratioInv).toLong
      val low = bucketLow(math.max(iv, 1L), mag)
      b.copy(counts = b.counts.updated(low, b.counts.getOrElse(low, 0L) + 1L))
    }

    def reduce(b: Buf, in: (java.lang.Double, java.lang.Double,
        java.lang.Integer, String)): Buf = {
      val (v, pct, prec, tpe) = in
      var nb = b
      if (!b.seen) {
        val isLong = tpe != null &&
          Set("tinyint", "smallint", "int", "bigint")(tpe.toLowerCase)
        nb = b.copy(
          pct = if (pct == null) 0.5 else pct.doubleValue(),
          digits = if (prec == null) 1 else prec.intValue(),
          isLong = isLong)
      }
      if (v == null || v.isNaN) nb else record(nb, v.doubleValue())
    }

    def merge(a: Buf, b: Buf): Buf = {
      if (!a.seen) return b
      if (!b.seen) return a
      if (a.isLong) {
        val merged = b.counts.foldLeft(a.counts) { case (acc, (k, n)) =>
          acc.updated(k, acc.getOrElse(k, 0L) + n)
        }
        a.copy(counts = merged, zero = a.zero + b.zero)
      } else {
        // align to the smaller lowest (finer ratio)
        val (fine, coarse) = if (a.lowest <= b.lowest) (a, b) else (b, a)
        val mag = magnitudeOf(fine.digits)
        val k = math.round(math.log(coarse.lowest / fine.lowest) / math.log(2.0)).toInt
        val scaled = coarse.counts.groupBy { case (low, _) =>
          bucketLow(math.max(low << k, 1L), mag)
        }.map { case (nl, m) => nl -> m.values.sum }
        val merged = scaled.foldLeft(fine.counts) { case (acc, (kk, n)) =>
          acc.updated(kk, acc.getOrElse(kk, 0L) + n)
        }
        fine.copy(counts = merged, zero = fine.zero + coarse.zero,
          pct = a.pct, digits = a.digits)
      }
    }

    def finish(b: Buf): java.lang.Double = {
      val total = b.zero + b.counts.valuesIterator.sum
      if (!b.seen || total == 0) return Double.NaN
      val mag = magnitudeOf(b.digits)
      val half = 1L << (mag - 1)
      val requested = math.min(math.max(
        Math.nextAfter(b.pct * 100.0, Double.NegativeInfinity), 0.0), 100.0)
      val countAt = math.max(math.ceil(requested * total / 100.0).toLong, 1L)
      val ratio = if (b.isLong) 1.0 else b.lowest / half
      var seen = 0L
      if (b.zero > 0) {
        seen += b.zero
        if (seen >= countAt) return 0.0
      }
      for ((low, n) <- b.counts.toSeq.sortBy(_._1)) {
        seen += n
        if (seen >= countAt) {
          val high = low + bucketWidth(low, mag) - 1
          return (if (b.pct == 0.0) low else high) * ratio
        }
      }
      val maxLow = b.counts.keysIterator.max
      (maxLow + bucketWidth(maxLow, mag) - 1) * ratio
    }

    def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("hdr_approx_percentile",
      org.apache.spark.sql.functions.udaf(new Agg))
}
