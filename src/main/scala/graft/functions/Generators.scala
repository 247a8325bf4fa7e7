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
}
