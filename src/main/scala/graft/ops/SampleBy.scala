package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAMPLE BY — time-bucketed aggregation with fills
  * (reference: `SqlOptimiser.java:9019 rewriteSampleBy` lowers SAMPLE BY
  * to GROUP BY timestamp_floor; fill cursors under
  * `groupby/SampleByFill{None,Null,Prev,Value}...`, linear interpolation
  * `SampleByInterpolateRecordCursorFactory.java:67`).
  *
  * Same strategy here, Spark-first: `groupBy(window(ts, bucket))` — a
  * partial-aggregating hash aggregate, one shuffle on (keys, bucket).
  * Fills join the aggregated (already small) result against a generated
  * bucket spine, then carry values with key-partitioned windows. Nothing
  * in the fill path touches the raw fact table, so the fill cost scales
  * with |keys| × |buckets|, not with input rows.
  */
object SampleBy {
  sealed trait Fill
  /** FILL(NONE) — empty buckets absent. */
  case object NoFill extends Fill
  /** FILL(NULL) — spine present, aggregates null. */
  case object FillNull extends Fill
  /** FILL(x[, y...]) — constant per aggregate column. */
  final case class FillConst(values: Map[String, Any]) extends Fill
  /** FILL(PREV) — carry the previous bucket's value forward. */
  case object FillPrev extends Fill
  /** FILL(LINEAR) — interpolate between neighbouring present buckets. */
  case object FillLinear extends Fill

  private val PRESENT = "__graft_present"

  /** @param bucket  Spark interval string, e.g. "1 hour", "5 minutes"
    * @param aggs    output name -> aggregate expression
    * @param range   optional (from, toInclusive) spine bounds (QuestDB
    *                FROM/TO); default = min/max observed bucket
    * @param offset  ALIGN TO CALENDAR WITH OFFSET — shifts bucket origin
    * @param tsOut   name of the bucket column in the output
    */
  def sampleBy(df: DataFrame, ts: String, bucket: String,
               keys: Seq[String], aggs: Seq[(String, Column)],
               fill: Fill = NoFill,
               range: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None,
               offset: String = "0 seconds",
               tsOut: String = "ts"): DataFrame = {
    val spark = df.sparkSession
    val bucketCol = window(col(ts), bucket, bucket, offset).getField("start").as(tsOut)
    val base = df.groupBy((bucketCol +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)

    fill match {
      case NoFill => base.orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
      case f =>
        val bounds = range.orElse {
          val r = base.agg(min(col(tsOut)), max(col(tsOut))).head()
          if (r.isNullAt(0)) None else Some((r.getTimestamp(0), r.getTimestamp(1)))
        }
        if (bounds.isEmpty) // empty input → empty (correctly-shaped) result
          return base.orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
        val (from, to) = bounds.get
        // distributed spine: range + offset arithmetic, not a single
        // exploded array — a years×minutes spine stays partitioned
        val stepUs = spark.range(1)
          .select(unix_micros(lit(to)) - unix_micros(lit(to) - expr(s"interval $bucket")))
          .head().getLong(0)
        val fromUs = from.getTime * 1000L + from.getNanos / 1000 % 1000
        val toUs = to.getTime * 1000L + to.getNanos / 1000 % 1000
        val n = (toUs - fromUs) / stepUs + 1
        val spine = spark.range(0, n)
          .select(timestamp_micros(lit(fromUs) + col("id") * lit(stepUs)).as(tsOut))
        val grid =
          if (keys.isEmpty) spine
          else base.select(keys.map(col): _*).distinct().crossJoin(broadcast(spine))
        val joined = grid.join(
          base.withColumn(PRESENT, lit(1)),
          (keys :+ tsOut).toSeq, "left")

        val aggNames = aggs.map(_._1)
        val filled = f match {
          case FillNull => joined
          case FillConst(values) =>
            aggNames.foldLeft(joined) { (d, n) =>
              values.get(n) match {
                case Some(v) => d.withColumn(n,
                  when(col(PRESENT).isNotNull, col(n)).otherwise(lit(v)))
                case None => d
              }
            }
          case FillPrev =>
            val w = keyWindow(keys, tsOut).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            aggNames.foldLeft(joined) { (d, n) =>
              // struct-wrap so a legitimately-null present value is carried, not skipped
              d.withColumn(n,
                last(when(col(PRESENT).isNotNull, struct(col(n).as("v"))), ignoreNulls = true)
                  .over(w).getField("v"))
            }
          case FillLinear =>
            val wPrev = keyWindow(keys, tsOut).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            val wNext = keyWindow(keys, tsOut).rowsBetween(Window.currentRow, Window.unboundedFollowing)
            val t = unix_micros(col(tsOut))
            aggNames.foldLeft(joined) { (d, n) =>
              val known = when(col(PRESENT).isNotNull, struct(unix_micros(col(tsOut)).as("t"), col(n).as("v")))
              val p = last(known, ignoreNulls = true).over(wPrev)
              val x = first(known, ignoreNulls = true).over(wNext)
              d.withColumn(n,
                when(col(PRESENT).isNotNull, col(n)).otherwise(
                  p.getField("v") + (x.getField("v") - p.getField("v")) *
                    (t - p.getField("t")).cast("double") /
                    (x.getField("t") - p.getField("t")).cast("double")))
            }
          case NoFill => joined // unreachable
        }
        filled.drop(PRESENT)
          .orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
    }
  }

  /** SAMPLE BY <calendar unit> ALIGN TO CALENDAR TIME ZONE 'tz'
    * (reference `TimezoneFloorTimestampSampler` — DST-aware bucket
    * boundaries): truncate in the target zone's local calendar, key the
    * group on the UTC instant of the local bucket start. DST-variable
    * bucket widths fall out of the local-calendar truncation.
    */
  def sampleByCalendarTz(df: DataFrame, ts: String, unit: String, tz: String,
                         keys: Seq[String], aggs: Seq[(String, Column)],
                         tsOut: String = "ts"): DataFrame = {
    val bucket = to_utc_timestamp(
      date_trunc(unit, from_utc_timestamp(col(ts), tz)), tz).as(tsOut)
    df.groupBy((bucket +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
  }

  private def keyWindow(keys: Seq[String], tsOut: String) =
    if (keys.isEmpty) Window.partitionBy().orderBy(col(tsOut).asc)
    else Window.partitionBy(keys.map(col): _*).orderBy(col(tsOut).asc)
}
