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

}
