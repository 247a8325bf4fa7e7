package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table generators (reference `long_sequence`, `timestamp_sequence`,
  * `generate_series`, `rnd_*` — SURVEY §2.1). `spark.range` under the
  * hood: distributed, no driver materialization.
  *
  * The rnd_* family is DETERMINISTIC-seeded (md5-of-counter uniform
  * bits) rather than PRNG-stateful — reproducible across engines,
  * partitionings and retries, which is what a distributed fixture
  * generator actually needs.
  */
object Generators {

  /** long_sequence(n): x = 1..n. */
  def longSequence(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).toDF("x")

  /** timestamp_sequence(start, step): first n values. */
  def timestampSequence(spark: SparkSession, startMicros: Long, stepMicros: Long, n: Long): DataFrame =
    spark.range(0, n)
      .select((col("id") + 1).as("x"),
        timestamp_micros(lit(startMicros) + col("id") * lit(stepMicros)).as("ts"))

  /** generate_series(lo, hi[, step]) — inclusive numeric series
    * (reference `functions/date/GenerateSeries*`). Distributed range,
    * empty when the step walks away from `hi`.
    */
  def generateSeries(spark: SparkSession, lo: Long, hi: Long, step: Long = 1): DataFrame = {
    require(step != 0, "generate_series step must be non-zero")
    // bounds are an unordered range: the step's sign picks the
    // direction (reference GenerateSeriesFunctionFactory bound swap)
    val base = if (step >= 0) math.min(lo, hi) else math.max(lo, hi)
    val bound = if (step >= 0) math.max(lo, hi) else math.min(lo, hi)
    val n = math.max((bound - base) / step + 1, 0)
    spark.range(0, n).select((lit(base) + col("id") * lit(step)).as("generate_series"))
  }

  /** generate_series over timestamps (µs epoch + stride). */
  def generateSeriesTs(spark: SparkSession, loMicros: Long, hiMicros: Long,
                       stepMicros: Long): DataFrame = {
    require(stepMicros != 0, "generate_series step must be non-zero")
    val base = if (stepMicros >= 0) math.min(loMicros, hiMicros) else math.max(loMicros, hiMicros)
    val bound = if (stepMicros >= 0) math.max(loMicros, hiMicros) else math.min(loMicros, hiMicros)
    val n = math.max((bound - base) / stepMicros + 1, 0)
    spark.range(0, n)
      .select(timestamp_micros(lit(base) + col("id") * lit(stepMicros)).as("generate_series"))
  }

  /** Uniform [0,1) from the first 8 hex digits of md5(seed ‖ counter) —
    * portable to any engine with md5.
    */
  def rndDouble(counterCol: String, seed: String): Column = {
    val digits = (1 to 8).map(i =>
      (expr(s"locate(substring(md5(concat('$seed', cast($counterCol as string))), $i, 1), '0123456789abcdef')") - 1)
        * lit(math.pow(16.0, 8 - i)))
    digits.reduce(_ + _) / lit(math.pow(16.0, 8))
  }

  /** Uniform integer in [lo, hi] — floor of scaled rndDouble. */
  def rndInt(counterCol: String, seed: String, lo: Int, hi: Int): Column =
    (floor(rndDouble(counterCol, seed) * (hi - lo + 1)) + lo).cast("int")

  /** Pick from a symbol list. */
  def rndSymbol(counterCol: String, seed: String, values: Seq[String]): Column = {
    val arr = array(values.map(lit): _*)
    element_at(arr, rndInt(counterCol, seed, 1, values.size))
  }

  def rndBoolean(counterCol: String, seed: String): Column =
    rndDouble(counterCol, seed) < 0.5

  /** Uniform date in [start, start + spanDays). */
  def rndDate(counterCol: String, seed: String, start: String, spanDays: Int): Column =
    date_add(lit(java.sql.Date.valueOf(start)), rndInt(counterCol, seed, 0, spanDays - 1))

  /** uuid4-shaped deterministic id (reference rnd_uuid4). */
  def rndUuid4(counterCol: String, seed: String): Column = {
    val h = md5(concat(lit(seed), expr(s"cast($counterCol as string)")))
    concat(
      substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-4"),
      substring(h, 14, 3), lit("-8"), substring(h, 18, 3), lit("-"),
      substring(h, 21, 12))
  }

  /** Deterministic hex string with pseudo-random length in [lo, hi]. */
  def rndStr(counterCol: String, seed: String, lo: Int, hi: Int): Column =
    substr(
      md5(concat(lit(seed + "_s"), expr(s"cast($counterCol as string)"))),
      lit(1), rndInt(counterCol, seed + "_len", lo, hi))

  // ---- rnd_* long tail (reference functions/rnd: RndLong256, RndByte,
  // RndShort, RndChar, RndFloat, RndBin, RndTimestamp, RndGeoHash,
  // RndSymbolWeighted, RndSymbolZipf, RndDoubleArray) -----------------------

  /** Uniform [0,1) from an arbitrary counter expression (column form of
    * [[rndDouble]]): first 8 hex digits of md5 → exact k/2^32.
    */
  def uniform(counter: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed), counter.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  def rndByte(counterCol: String, seed: String): Column =
    rndInt(counterCol, seed, -128, 127).cast("byte")

  def rndShort(counterCol: String, seed: String): Column =
    rndInt(counterCol, seed, -32768, 32767).cast("short")

  /** Uniform long in [lo, hi]. Spacing granularity is span/2^32 (one
    * md5 word of entropy) — ample for fixtures, documented for honesty.
    */
  def rndLong(counterCol: String, seed: String, lo: Long, hi: Long): Column =
    (floor(rndDouble(counterCol, seed) * ((hi - lo).toDouble + 1)) + lit(lo)).cast("long")

  /** Uniform A-Z char (reference RndChar). */
  def rndChar(counterCol: String, seed: String): Column =
    substr(lit("ABCDEFGHIJKLMNOPQRSTUVWXYZ"), rndInt(counterCol, seed, 1, 26), lit(1))

  def rndFloat(counterCol: String, seed: String): Column =
    rndDouble(counterCol, seed).cast("float")

  /** 256-bit hex literal `0x…` (reference RndLong256): two md5 words. */
  def rndLong256(counterCol: String, seed: String): Column =
    concat(lit("0x"),
      md5(concat(lit(seed + "_a"), expr(s"cast($counterCol as string)"))),
      md5(concat(lit(seed + "_b"), expr(s"cast($counterCol as string)"))))

  /** Deterministic binary blob with pseudo-random length in [lo, hi]
    * bytes (reference RndBin) — unhex of the md5 stream.
    */
  def rndBin(counterCol: String, seed: String, lo: Int, hi: Int): Column =
    unhex(substr(
      concat(md5(concat(lit(seed + "_p"), expr(s"cast($counterCol as string)"))),
        md5(concat(lit(seed + "_q"), expr(s"cast($counterCol as string)")))),
      lit(1), rndInt(counterCol, seed + "_n", lo, hi) * 2))

  /** Uniform timestamp in [loMicros, hiMicros). */
  def rndTimestamp(counterCol: String, seed: String, loMicros: Long, hiMicros: Long): Column =
    timestamp_micros((floor(rndDouble(counterCol, seed) *
      ((hiMicros - loMicros).toDouble)) + lit(loMicros)).cast("long"))

  /** Dotted-quad IPv4 from one uniform word (reference RndIPv4). */
  def rndIpv4(counterCol: String, seed: String): Column = {
    val ip = (floor(rndDouble(counterCol, seed) * lit(4294967296.0))).cast("long")
    concat_ws(".",
      shiftright(ip, 24) % 256, shiftright(ip, 16) % 256,
      shiftright(ip, 8) % 256, ip % 256)
  }

  /** Weighted symbol pick (reference RndSymbolWeighted): cumulative
    * thresholds over the normalized weights.
    */
  def rndSymbolWeighted(counterCol: String, seed: String,
                        values: Seq[String], weights: Seq[Double]): Column = {
    require(values.size == weights.size && values.nonEmpty)
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = rndDouble(counterCol, seed)
    values.zip(cum).init.foldRight(lit(values.last): Column) {
      case ((v, threshold), rest) => when(u < threshold, v).otherwise(rest)
    }
  }

  /** Zipf-distributed symbol pick (reference RndSymbolZipf):
    * p(i) ∝ 1/i^exponent over the list order.
    */
  def rndSymbolZipf(counterCol: String, seed: String,
                    values: Seq[String], exponent: Double): Column =
    rndSymbolWeighted(counterCol, seed, values,
      values.indices.map(i => 1.0 / math.pow((i + 1).toDouble, exponent)))

  /** Array of n deterministic uniforms (reference RndDoubleArray):
    * element i seeds on `counter‖'_'‖i`.
    */
  def rndDoubleArray(counterCol: String, seed: String, n: Int): Column =
    transform(sequence(lit(1), lit(n)),
      i => uniform(concat(col(counterCol).cast("string"), lit("_"), i.cast("string")), seed))
}
