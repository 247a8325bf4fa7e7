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
  /** Gap rows take the previous value of ANOTHER aggregate column
    * (reference FILL(PREV(src)) cross-column dispatch,
    * FillRecordDispatchTest.java:138-149). */
  final case class FillPrevOf(src: String) extends Fill
  /** FILL(LINEAR) — interpolate between neighbouring present buckets. */
  case object FillLinear extends Fill
  /** FILL(v1, v2, ...) — one strategy per aggregate column, positional
    * (reference `SqlParser` fill lists). A NONE element behaves as NULL
    * on spine rows (the spine exists because a sibling column needs it).
    */
  final case class FillPerColumn(fills: Seq[Fill]) extends Fill

  private val PRESENT = "__graft_present"

  /** @param bucket  Spark interval string, e.g. "1 hour", "5 minutes"
    * @param aggs    output name -> aggregate expression
    * @param range   optional (from, toInclusive) spine bounds (QuestDB
    *                FROM/TO); default = min/max observed bucket
    * @param offset  ALIGN TO CALENDAR WITH OFFSET — shifts bucket origin
    * @param tz      ALIGN TO CALENDAR TIME ZONE — buckets fall on the
    *                zone's local wall clock (combinable with fills; the
    *                fill spine steps by the fixed stride, so a DST-
    *                crossing day-grained spine is approximate there)
    * @param tsOut   name of the bucket column in the output
    */
  /** "N months" strides (SAMPLE BY nM / ny) have no fixed micro width, so
    * they bypass window(): bucket = epoch-month floor-div the stride. */
  private val MonthsRe = """^(\d+) months$""".r
  private def monthsOf(bucket: String): Option[Int] =
    MonthsRe.findFirstMatchIn(bucket).map(_.group(1).toInt)
  private def monthBucket(t: Column, n: Int): Column = {
    val mse = (year(t) - 1970) * 12 + month(t) - 1 // months since epoch
    val floored = mse - pmod(mse, lit(n))
    to_timestamp(add_months(to_date(lit("1970-01-01")), floored))
  }

  def sampleBy(df: DataFrame, ts: String, bucket: String,
               keys: Seq[String], aggs: Seq[(String, Column)],
               fill: Fill = NoFill,
               range: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None,
               offset: String = "0 seconds",
               tz: Option[String] = None,
               tsOut: String = "ts",
               rangeLo: Option[java.sql.Timestamp] = None,
               rangeHi: Option[java.sql.Timestamp] = None): DataFrame = {
    val spark = df.sparkSession
    val bucketCol = ((tz, monthsOf(bucket)) match {
      case (Some(zone), Some(n)) =>
        to_utc_timestamp(monthBucket(from_utc_timestamp(col(ts), zone), n), zone)
      case (None, Some(n)) => monthBucket(col(ts), n)
      case (Some(zone), None) =>
        // truncate on the zone's wall clock, key the group on the UTC
        // instant of the local bucket start (reference
        // TimezoneFloorTimestampSampler)
        to_utc_timestamp(
          window(from_utc_timestamp(col(ts), zone), bucket, bucket, offset)
            .getField("start"), zone)
      case (None, None) =>
        window(col(ts), bucket, bucket, offset).getField("start")
    }).as(tsOut)
    val base = df.groupBy((bucketCol +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)

    val aggNames = aggs.map(_._1)
    // normalize to one strategy per aggregate column
    val perCol: Seq[(String, Fill)] = fill match {
      case FillPerColumn(fs) =>
        require(fs.size == aggNames.size,
          s"FILL list has ${fs.size} entries for ${aggNames.size} aggregates")
        aggNames.zip(fs)
      case f => aggNames.map(_ -> f)
    }

    if (perCol.forall(_._2 == NoFill) && range.isEmpty &&
        rangeLo.isEmpty && rangeHi.isEmpty)
      base.orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
    else {
      val bounds = range.orElse {
        val lo0 = range.map(_._1).orElse(rangeLo)
        val hi0 = range.map(_._2).orElse(rangeHi)
        if (lo0.isDefined && hi0.isDefined) Some((lo0.get, hi0.get))
        else {
          val r = base.agg(min(col(tsOut)), max(col(tsOut))).head()
          if (r.isNullAt(0)) None
          else Some((lo0.getOrElse(r.getTimestamp(0)), hi0.getOrElse(r.getTimestamp(1))))
        }
      }
      if (bounds.isEmpty) // empty input → empty (correctly-shaped) result
        return base.orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
      val (from, to) = bounds.get
      // distributed spine: range + offset arithmetic, not a single
      // exploded array — a years×minutes spine stays partitioned
      val (n, spine) = monthsOf(bucket) match {
        case Some(stride) =>
          val fm = from.toLocalDateTime; val tm = to.toLocalDateTime
          val mse0 = (fm.getYear - 1970) * 12 + fm.getMonthValue - 1
          val mse1 = (tm.getYear - 1970) * 12 + tm.getMonthValue - 1
          val cnt = (mse1 - mse0) / stride + 1L
          (cnt, spark.range(0, cnt).select(to_timestamp(add_months(
            to_date(lit("1970-01-01")),
            lit(mse0) + col("id").cast("int") * lit(stride))).as(tsOut)))
        case None =>
          val stepUs = spark.range(1)
            .select(unix_micros(lit(to)) - unix_micros(lit(to) - expr(s"interval $bucket")))
            .head().getLong(0)
          val fromUs = from.getTime * 1000L + from.getNanos / 1000 % 1000
          val toUs = to.getTime * 1000L + to.getNanos / 1000 % 1000
          val cnt = (toUs - fromUs) / stepUs + 1
          (cnt, spark.range(0, cnt)
            .select(timestamp_micros(lit(fromUs) + col("id") * lit(stepUs)).as(tsOut)))
      }
      // broadcast is right for typical spines; a fine-grained spine over
      // a long range (1s × a year) must stay distributed
      val spineSide = if (n <= 1000000L) broadcast(spine) else spine
      val grid =
        if (keys.isEmpty) spine
        else base.select(keys.map(col): _*).distinct().crossJoin(spineSide)
      val joined = grid.join(
        base.withColumn(PRESENT, lit(1)),
        (keys :+ tsOut).toSeq, "left")

      val wPrev = keyWindow(keys, tsOut).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = keyWindow(keys, tsOut).rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val filled = perCol.foldLeft(joined) { case (d, (name, f)) =>
        f match {
          case NoFill | FillNull | FillPerColumn(_) => d
          case FillConst(values) =>
            values.get(name) match {
              // cast the fill constant to the aggregate's own type so a
              // FILL(0) on a count column stays long, not double
              case Some(v) => d.withColumn(name,
                when(col(PRESENT).isNotNull, col(name))
                  .otherwise(lit(v).cast(d.schema(name).dataType)))
              case None => d
            }
          case FillPrev =>
            // struct-wrap so a legitimately-null present value is carried, not skipped
            d.withColumn(name,
              last(when(col(PRESENT).isNotNull, struct(col(name).as("v"))), ignoreNulls = true)
                .over(wPrev).getField("v"))
          case FillPrevOf(src) =>
            d.withColumn(name,
              when(col(PRESENT).isNotNull, col(name)).otherwise(
                last(when(col(PRESENT).isNotNull, struct(col(src).as("v"))), ignoreNulls = true)
                  .over(wPrev).getField("v").cast(d.schema(name).dataType)))
          case FillLinear =>
            val t = unix_micros(col(tsOut))
            val known = when(col(PRESENT).isNotNull, struct(unix_micros(col(tsOut)).as("t"), col(name).as("v")))
            val p = last(known, ignoreNulls = true).over(wPrev)
            val x = first(known, ignoreNulls = true).over(wNext)
            d.withColumn(name,
              when(col(PRESENT).isNotNull, col(name)).otherwise(
                p.getField("v") + (x.getField("v") - p.getField("v")) *
                  (t - p.getField("t")).cast("double") /
                  (x.getField("t") - p.getField("t")).cast("double")))
        }
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

  /** SAMPLE BY ... ALIGN TO FIRST OBSERVATION (reference
    * `SqlOptimiser.java:9019` exception path): buckets are anchored at
    * each key group's first observed timestamp instead of the calendar —
    * bucket(ts) = first_ts + floor((ts − first_ts) / stride) · stride.
    *
    * Plan: one keyed aggregate for the anchors (tiny), joined back
    * (auto-broadcast when small), then the usual bucket group-by — the
    * raw table is touched twice but shuffled on the keys only once per
    * pass; no window over the fact table.
    */
  def sampleByFirstObs(df: DataFrame, ts: String, strideMicros: Long,
                       keys: Seq[String], aggs: Seq[(String, Column)],
                       tsOut: String = "ts"): DataFrame = {
    val anchorUs = "__graft_anchor_us"
    val withAnchor =
      if (keys.isEmpty) {
        val a = df.agg(min(unix_micros(col(ts))).as(anchorUs))
        df.crossJoin(broadcast(a))
      } else {
        val a = df.groupBy(keys.map(col): _*).agg(min(unix_micros(col(ts))).as(anchorUs))
        df.join(a, keys)
      }
    val off = unix_micros(col(ts)) - col(anchorUs)
    val bucketCol = timestamp_micros(col(anchorUs) + (off - off % lit(strideMicros))).as(tsOut)
    withAnchor.groupBy((bucketCol +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .orderBy((keys.map(col) :+ col(tsOut)).map(_.asc): _*)
  }

  private def keyWindow(keys: Seq[String], tsOut: String) =
    if (keys.isEmpty) Window.partitionBy().orderBy(col(tsOut).asc)
    else Window.partitionBy(keys.map(col): _*).orderBy(col(tsOut).asc)
}
