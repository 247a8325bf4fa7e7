package graft.functions

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sparkline(value, ts) — per-series unicode trend glyph (reference
  * `SparklineGroupByFunction`): bucket the series into `nBuckets` time
  * slots, average each, quantize to 8 block levels.
  *
  * Determinism note: bucket averages are rounded before quantization so
  * the level floor sees identical doubles on any engine/partitioning.
  */
object Sparkline {
  private val Blocks = "▁▂▃▄▅▆▇█"

  def sparkline(df: DataFrame, keys: Seq[String], tsCol: String,
                valueCol: String, nBuckets: Int, out: String = "sparkline"): DataFrame = {
    val wKey = Window.partitionBy(keys.map(col): _*)
    val us = unix_micros(col(tsCol))
    val bucketed = df
      .withColumn("__lo", min(us).over(wKey))
      .withColumn("__hi", max(us).over(wKey))
      .withColumn("__b",
        floor((us - col("__lo")).cast("double") /
          (col("__hi") - col("__lo") + 1).cast("double") * nBuckets).cast("int"))
      .groupBy((keys :+ "__b").map(col): _*)
      .agg(round(avg(col(valueCol)), 6).as("__v"))
    val scaled = bucketed
      .withColumn("__vmin", min(col("__v")).over(wKey))
      .withColumn("__vmax", max(col("__v")).over(wKey))
      .withColumn("__lvl",
        when(col("__vmax") === col("__vmin"), lit(3))
          .otherwise(least(
            floor((col("__v") - col("__vmin")) / (col("__vmax") - col("__vmin")) * 8.0).cast("int"),
            lit(7))))
      .withColumn("__ch", expr(s"substring('$Blocks', __lvl + 1, 1)"))
    scaled
      .groupBy(keys.map(col): _*)
      .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(__b, __ch))), x -> x.__ch))").as(out))
  }
}
