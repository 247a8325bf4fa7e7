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
  private val IDX = "__graft_idx"
  private val SEG = "__graft_seg"

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
    * they bypass window(): bucket = anchored-month floor-div the stride. */
  private val MonthsRe = """^(\d+) months$""".r
  private def monthsOf(bucket: String): Option[Int] =
    MonthsRe.findFirstMatchIn(bucket).map(_.group(1).toInt)

  /** Month-grid floor anchored at `anchor` (the FROM point, or epoch):
    * bucket(t) = anchor + stride·⌊monthdiff(t, anchor)/stride⌋, where
    * monthdiff counts whole months with day/time adjustment (reference
    * MonthTimestampSampler with a FROM anchor: buckets carry the
    * anchor's day-of-month and time-of-day). */
  private def monthBucketAnchored(t: Column, n: Int,
                                  anchor: java.time.LocalDateTime): Column = {
    val aMse = (anchor.getYear - 1970) * 12 + anchor.getMonthValue - 1
    val aDateStr = anchor.toLocalDate.toString
    val todUs = anchor.toLocalTime.toNanoOfDay / 1000L
    def monthAdd(q: Column): Column =
      timestamp_micros(unix_micros(to_timestamp(add_months(
        to_date(lit(aDateStr)), q))) + lit(todUs))
    val md0 = (year(t) - 1970) * 12 + month(t) - 1 - lit(aMse)
    val md = md0 - when(monthAdd(md0) > t, 1).otherwise(0)
    monthAdd(md - pmod(md, lit(n)))
  }

  /** Fixed-width interval string → micros, parsed without a Spark job
    * (each `spark.range(1)...head()` evaluation was a full driver job —
    * measurable per-statement overhead on the interactive path). */
  private val IntervalRe =
    """(?i)^\s*(-?\d+)\s*(microsecond|millisecond|second|minute|hour|day|week)s?\s*$""".r
  private def intervalUs(s: String): Long = s.trim match {
    case IntervalRe(n, u) => n.toLong * (u.toLowerCase match {
      case "microsecond" => 1L
      case "millisecond" => 1000L
      case "second" => 1000000L
      case "minute" => 60000000L
      case "hour" => 3600000000L
      case "day" => 86400000000L
      case "week" => 7L * 86400000000L
    })
    case other => throw new IllegalArgumentException(s"unsupported interval '$other'")
  }

  /** The zone's standard (non-DST) offset in micros — the reference's
    * TimeZoneRules.getStandardOffset (last standard offset in the
    * rules, AbstractTimeZoneRules.java:70). */
  private def standardOffsetUs(zone: String): Long =
    java.time.ZoneId.of(zone).getRules
      .getStandardOffset(java.time.Instant.ofEpochSecond(4102444800L))
      .getTotalSeconds * 1000000L

  /** Zone offset (micros) at the UTC instant `tUs` — an expression, so
    * DST-varying offsets stay inside codegen. */
  private def offAtUs(tUs: Column, zone: String): Column =
    unix_micros(from_utc_timestamp(timestamp_micros(tUs), zone)) - tUs

  /** Local wall-clock → UTC instant with real zone rules (driver side). */
  private[graft] def localToUtc(t: java.sql.Timestamp, zone: String): java.sql.Timestamp =
    java.sql.Timestamp.from(
      t.toLocalDateTime.atZone(java.time.ZoneId.of(zone)).toInstant)

  /** UTC instant → local wall clock (driver side). */
  private def utcToLocalTs(t: java.sql.Timestamp, zone: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(java.time.LocalDateTime.ofInstant(
      t.toInstant, java.time.ZoneId.of(zone)))

  /** @param unit the reference stride unit char (d/w vs sub-day vs M/y)
    *              when lowered from dialect SQL — drives the reference's
    *              tz bucketing split (CommonUtils.isSubDayUnit): sub-day
    *              strides use the STANDARD offset (uniform UTC grid),
    *              day-and-up floor in the local calendar with real DST
    *              offsets. Omitted (DataFrame API): inferred from the
    *              stride width. */
  def sampleBy(df: DataFrame, ts: String, bucket: String,
               keys: Seq[String], aggs: Seq[(String, Column)],
               fill: Fill = NoFill,
               range: Option[(java.sql.Timestamp, java.sql.Timestamp)] = None,
               offset: String = "0 seconds",
               tz: Option[String] = None,
               tsOut: String = "ts",
               rangeLo: Option[java.sql.Timestamp] = None,
               rangeHi: Option[java.sql.Timestamp] = None,
               unit: Option[Char] = None,
               anchor: Option[java.sql.Timestamp] = None,
               gridAnchorUs: Option[Long] = None,
               clampUs: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    val strideMonthsOpt = monthsOf(bucket)
    lazy val strideUs: Long = intervalUs(bucket)
    lazy val offsetUs: Long = intervalUs(offset)
    // 'M' month-grained, 'd' day/week, 's' sub-day
    val unitKind: Char =
      if (strideMonthsOpt.isDefined) 'M'
      else unit match {
        case Some('d') | Some('w') => 'd'
        case Some(_) => 's'
        case None => if (strideUs % 86400000000L == 0) 'd' else 's'
      }
    // the FROM point anchors the grid (month grids carry its day+time);
    // an explicit `anchor` also covers FROM-without-FILL, where no spine
    // bounds are passed (FROM only filters + anchors there)
    val explicitFrom = anchor.orElse(range.map(_._1)).orElse(rangeLo)
    val monthAnchor: java.time.LocalDateTime =
      explicitFrom.map(_.toLocalDateTime)
        .getOrElse(java.time.LocalDateTime.of(1970, 1, 1, 0, 0))

    val bucketCol = ((tz, unitKind) match {
      case (None, 'M') =>
        // WITH OFFSET on a month grid: floor in the shifted frame and
        // shift back (reference SampleByTest 1M OFFSET '-00:05' →
        // buckets at 2023-12-31T23:55, …)
        if (offsetUs == 0L) monthBucketAnchored(col(ts), strideMonthsOpt.get, monthAnchor)
        else timestamp_micros(unix_micros(monthBucketAnchored(
          timestamp_micros(unix_micros(col(ts)) - lit(offsetUs)),
          strideMonthsOpt.get, monthAnchor)) + lit(offsetUs))
      case (None, _) if gridAnchorUs.isDefined =>
        // explicit FROM + WITH OFFSET: the grid anchors at
        // floor-to-day(FROM) + offset, and rows before the first grid
        // point at/after FROM fold into that first bucket (reference
        // SampleByTest FROM + ALIGN TO CALENDAR WITH OFFSET: first
        // bucket 2021-03-01T00:15 absorbs the 00:00 row)
        val us = unix_micros(col(ts))
        val fl = us - pmod(us - lit(gridAnchorUs.get), lit(strideUs))
        timestamp_micros(clampUs.map(c => greatest(fl, lit(c))).getOrElse(fl))
      case (None, _) => window(col(ts), bucket, bucket, offset).getField("start")
      case (Some(zone), 's') =>
        // reference sub-day tz floor (CommonUtils.getFloorUtcTzOffset):
        // the STANDARD offset — a uniform UTC grid, no DST collapse. An
        // explicit FROM pre-shifts the anchor via to_utc(FROM, tz).
        val anchorUtcUs = explicitFrom match {
          case Some(f) => localToUtc(f, zone).getTime * 1000L
          case None => offsetUs - standardOffsetUs(zone)
        }
        val us = unix_micros(col(ts))
        timestamp_micros(us - pmod(us - lit(anchorUtcUs), lit(strideUs)))
      case (Some(zone), 'd') =>
        // reference super-day tz floor (TimezoneFloorTimestampSampler /
        // offsetFlooredUtcResult): floor in the local frame with the
        // offset AT THE ROW, convert back with the offset at the bucket
        // start — DST-exact (23/25-hour days fall out naturally)
        val anchorLocalUs = explicitFrom match {
          case Some(f) => f.getTime * 1000L // local wall-clock literal
          case None => offsetUs
        }
        val us = unix_micros(col(ts))
        val off1 = offAtUs(us, zone)
        val local = us + off1
        val fl = local - pmod(local - lit(anchorLocalUs), lit(strideUs))
        timestamp_micros(fl - offAtUs(fl - off1, zone))
      case (Some(zone), 'M') =>
        // WITH OFFSET under a TZ: floor the LOCAL value in the
        // offset-shifted frame and shift back, as in the no-tz month
        // grid (SampleByFillNullValueTest 1M TZ Berlin OFFSET '06:00')
        val us = unix_micros(col(ts))
        val off1 = offAtUs(us, zone)
        val lts0 = us + off1 // local naive micros
        val flLocal =
          if (offsetUs == 0L)
            unix_micros(monthBucketAnchored(timestamp_micros(lts0), strideMonthsOpt.get, monthAnchor))
          else
            unix_micros(monthBucketAnchored(timestamp_micros(lts0 - lit(offsetUs)),
              strideMonthsOpt.get, monthAnchor)) + lit(offsetUs)
        timestamp_micros(flLocal - offAtUs(flLocal - off1, zone))
    }).as(tsOut)
    // per-(bucket,key) first scan position rides through the aggregate:
    // the reference cursor emits each bucket's PRESENT rows in scan
    // order, then the gap-filled keys — __graft_app reproduces that
    val APP = "__graft_app"
    // scan position = (designated-ts micros, partition-local id): the
    // PRIMARY component is the deterministic ts (a reference table is
    // ts-ordered, so scan order IS ts order); the id only breaks
    // SAME-ts ties in insertion order (SampleByFillNullValueTest keyed
    // fill emits London,Paris,Berlin — their shared bucket ts cannot).
    // The tie-break is exact on a single-partition scan and best-effort
    // across shuffles, where the primary ts keeps the order stable.
    val dfM =
      if (keys.isEmpty) df
      else df.withColumn("__graft_mono",
        struct(unix_micros(col(ts)).as("t"),
          org.apache.spark.sql.functions.monotonically_increasing_id().as("m")))
    val aggsApp =
      if (keys.isEmpty) aggs
      else aggs :+ (APP -> min(col("__graft_mono")))
    val base = dfM.groupBy((bucketCol +: keys.map(col)): _*)
      .agg(aggsApp.head._2.as(aggsApp.head._1),
        aggsApp.tail.map { case (n, c) => c.as(n) }: _*)

    val aggNames = aggs.map(_._1)
    // normalize to one strategy per aggregate column
    val perCol: Seq[(String, Fill)] = fill match {
      case FillPerColumn(fs) =>
        require(fs.size == aggNames.size,
          s"FILL list has ${fs.size} entries for ${aggNames.size} aggregates")
        aggNames.zip(fs)
      case f => aggNames.map(_ -> f)
    }

    // reference cursors stream buckets in time order; keys within a
    // bucket follow GLOBAL first-appearance order (the scan order of a
    // ts-ordered table), not key collation
    def refOrder(result: DataFrame): DataFrame =
      if (keys.isEmpty) result.orderBy(col(tsOut).asc)
      else {
        // present rows first (per-bucket scan order via APP), filled
        // rows after in global first-appearance order
        val fs = dfM.select((keys.map(col) :+ col("__graft_mono")): _*)
          .groupBy(keys.map(col): _*)
          .agg(min(col("__graft_mono")).as("__graft_fs"))
        val withApp =
          if (result.columns.contains(APP)) result
          else result.withColumn(APP, org.apache.spark.sql.functions.lit(null).cast("long"))
        withApp.join(broadcast(fs), keys, "left")
          .orderBy((col(tsOut).asc +: col(APP).isNull.asc +:
            coalesce(col(APP), col("__graft_fs")).asc +: keys.map(col(_).asc)): _*)
          .drop("__graft_fs", APP)
      }

    if (perCol.forall(_._2 == NoFill) && range.isEmpty &&
        rangeLo.isEmpty && rangeHi.isEmpty)
      refOrder(base)
    else {
      // Bound frames: explicit FROM/TO literals arrive as local
      // wall-clock; under a TIME ZONE the super-day grid lives in the
      // local frame (data-derived UTC bucket values convert to their
      // local labels), while the sub-day grid is uniform in UTC
      // (explicit local bounds convert once via real zone rules — the
      // reference's to_utc(FROM, tz) anchor pre-shift).
      def deriveFrame(t: java.sql.Timestamp): java.sql.Timestamp = (tz, unitKind) match {
        case (Some(zone), k) if k != 's' => utcToLocalTs(t, zone)
        case _ => t
      }
      def explicitFrame(t: java.sql.Timestamp): java.sql.Timestamp = (tz, unitKind) match {
        case (Some(zone), 's') => localToUtc(t, zone)
        case _ => t
      }
      val bounds = {
        val lo0 = range.map(_._1).orElse(rangeLo).map(explicitFrame)
        val hi0 = range.map(_._2).orElse(rangeHi).map(explicitFrame)
        if (lo0.isDefined && hi0.isDefined) Some((lo0.get, hi0.get))
        else {
          val r = base.agg(min(col(tsOut)), max(col(tsOut))).head()
          if (r.isNullAt(0)) None
          else Some((lo0.getOrElse(deriveFrame(r.getTimestamp(0))),
            hi0.getOrElse(deriveFrame(r.getTimestamp(1)))))
        }
      }
      if (bounds.isEmpty) // empty input -> empty (correctly-shaped) result
        return refOrder(base)
      val (from, to) = bounds.get
      // distributed spine: range + offset arithmetic, not a single
      // exploded array. The bucket index rides along so the un-keyed
      // fill can segment. Under tz the super-day spine steps the LOCAL
      // grid and converts each bucket start to its UTC instant
      // (reference TimezoneFloorTimestampSampler.localAnchorAsUtc:
      // approximate the offset by reading the local value as UTC, then
      // resolve the real offset at that instant).
      def localGridToUtc(lUs: Column, zone: String): Column = {
        val approx = offAtUs(lUs, zone)
        lUs - offAtUs(lUs - approx, zone)
      }
      def spineTs(localTsCol: Column): Column = (tz, unitKind) match {
        case (Some(zone), k) if k != 's' =>
          timestamp_micros(localGridToUtc(unix_micros(localTsCol), zone))
        case _ => localTsCol
      }
      val (n, spine0) = strideMonthsOpt match {
        case Some(stride) =>
          // step whole months from the `from` bucket (grid-anchored by
          // construction), carrying its day-of-month and time-of-day
          val fm = from.toLocalDateTime; val tm = to.toLocalDateTime
          var md = (tm.getYear * 12 + tm.getMonthValue) -
            (fm.getYear * 12 + fm.getMonthValue)
          if (md > 0 && fm.plusMonths(md).isAfter(tm)) md -= 1
          val cnt = math.max(md, 0).toLong / stride + 1
          val todUs = fm.toLocalTime.toNanoOfDay / 1000L
          (cnt, spark.range(0, cnt).select(col("id").as(IDX),
            spineTs(timestamp_micros(unix_micros(to_timestamp(add_months(
              to_date(lit(fm.toLocalDate.toString)),
              col("id").cast("int") * lit(stride)))) + lit(todUs))).as(tsOut)))
        case None =>
          val fromUs = from.getTime * 1000L + from.getNanos / 1000 % 1000
          val toUs = to.getTime * 1000L + to.getNanos / 1000 % 1000
          val cnt = math.max((toUs - fromUs) / strideUs + 1, 0L)
          (cnt, spark.range(0, cnt).select(col("id").as(IDX),
            spineTs(timestamp_micros(lit(fromUs) + col("id") * lit(strideUs))).as(tsOut)))
      }
      // a DST spring-forward gap can map two local starts to one UTC
      // instant -- dedupe so the spine join does not double rows
      val spine = if (tz.isDefined && unitKind != 's') spine0.dropDuplicates(tsOut) else spine0
      // broadcast is right for typical spines; a fine-grained spine over
      // a long range (1s × a year) must stay distributed
      val spineSide = if (n <= 1000000L) broadcast(spine.drop(IDX)) else spine.drop(IDX)
      val grid =
        if (keys.isEmpty) spine
        else base.select(keys.map(col): _*).distinct().crossJoin(spineSide)
      // null-SAFE key equality: a NULL series key is a legitimate group
      // (SampleByFillNullValueTest null city) and plain equi-join keys
      // would drop its present rows onto the fill path
      val joined = {
        val b = base.withColumn(PRESENT, lit(1)).as("__b")
        val g = grid.as("__g")
        val cond = (keys :+ tsOut)
          .map(k => col(s"__g.$k") <=> col(s"__b.$k")).reduce(_ && _)
        val bRest = base.columns.filterNot(c => keys.contains(c) || c == tsOut)
        g.join(b, cond, "left").select(
          (grid.columns.map(k => col(s"__g.$k").as(k)) ++
            bRest.map(c => col(s"__b.$c").as(c)) :+
            col(s"__b.$PRESENT").as(PRESENT)): _*)
      }

      def needsWindow(f: Fill): Boolean = f match {
        case FillPrev | FillLinear | FillPrevOf(_) => true
        case _ => false
      }
      val filled =
        if (keys.isEmpty && perCol.exists(pc => needsWindow(pc._2)))
          fillNoKeySegmented(spark, joined, perCol, n, tsOut)
        else {
          val wPrev = keyWindow(keys, tsOut).rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val wNext = keyWindow(keys, tsOut).rowsBetween(Window.currentRow, Window.unboundedFollowing)
          perCol.foldLeft(joined) { case (d, (name, f)) =>
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
                // interpolation computes in double but the column keeps
                // its own type (reference LongInterpolator stays LONG)
                d.withColumn(name,
                  when(col(PRESENT).isNotNull, col(name)).otherwise(
                    (p.getField("v") + (x.getField("v") - p.getField("v")) *
                      (t - p.getField("t")).cast("double") /
                      (x.getField("t") - p.getField("t")).cast("double"))
                      .cast(d.schema(name).dataType)))
            }
          }
        }
      // FILL(LINEAR) never extrapolates: spine buckets outside the data
      // range interpolate to null and are DROPPED, not emitted
      // (reference SampleByTest FROM..TO FILL(LINEAR) stops at the last
      // data bucket)
      val clipped =
        if (perCol.nonEmpty && perCol.forall(_._2 == FillLinear))
          filled.filter(col(PRESENT).isNotNull ||
            perCol.map(pc => col(pc._1).isNotNull).reduce(_ || _))
        else filled
      // reference fill cursors emit bucket-major order: every key's row
      // for bucket t before any row of bucket t+1
      refOrder(clipped.drop(PRESENT, IDX))
    }
  }

  /** Un-keyed FILL(PREV/LINEAR/PREV(src)) without the single-partition
    * global window: the bucket spine is cut into ≤1024 index segments,
    * carries run per-segment in parallel, and only the per-segment
    * boundary values (≤ segments+1 rows) pass through one tiny global
    * window — the asofRangeNoKey two-pass carry shape. At 1 s buckets
    * over years this turns a ~30 M-row single task into 1024 parallel
    * ones.
    */
  private def fillNoKeySegmented(spark: org.apache.spark.sql.SparkSession,
                                 joined: DataFrame,
                                 perCol: Seq[(String, Fill)],
                                 n: Long, tsOut: String): DataFrame = {
    val prevSrcs = perCol.flatMap {
      case (name, FillPrev) => Some(name)
      case (_, FillPrevOf(src)) => Some(src)
      case (name, FillLinear) => Some(name)
      case _ => None
    }.distinct
    val nextSrcs = perCol.collect { case (name, FillLinear) => name }.distinct

    val segLen = math.max(4096L, n / 1024L + 1)
    val nSegs = n / segLen + 1
    val seg = joined.withColumn(SEG, (col(IDX) / lit(segLen)).cast("long"))

    def tv(c: String) = struct(unix_micros(col(tsOut)).as("t"), col(c).as("v"))
    // per-segment boundary values from present rows only (index-ordered)
    val boundaryAggs =
      prevSrcs.map(c => max_by(tv(c), col(IDX)).as(s"__last_$c")) ++
        nextSrcs.map(c => min_by(tv(c), col(IDX)).as(s"__first_$c"))
    val segStats = seg.filter(col(PRESENT).isNotNull).groupBy(col(SEG))
      .agg(boundaryAggs.head, boundaryAggs.tail: _*)
    // dense segment spine so empty segments still forward the carry;
    // ≤ nSegs+1 rows through the one global window — bounded spine, not
    // data (same pattern as AsofJoin.asofRangeNoKey)
    val wCarryPrev = Window.orderBy(col(SEG).asc).rowsBetween(Window.unboundedPreceding, -1)
    val wCarryNext = Window.orderBy(col(SEG).asc).rowsBetween(1, Window.unboundedFollowing)
    var carry = spark.range(0, nSegs).select(col("id").as(SEG))
      .join(segStats, Seq(SEG), "left")
    prevSrcs.foreach { c =>
      carry = carry.withColumn(s"__carryp_$c",
        last(col(s"__last_$c"), ignoreNulls = true).over(wCarryPrev))
    }
    nextSrcs.foreach { c =>
      carry = carry.withColumn(s"__carryn_$c",
        first(col(s"__first_$c"), ignoreNulls = true).over(wCarryNext))
    }
    carry = carry.select(col(SEG) +:
      (prevSrcs.map(c => col(s"__carryp_$c")) ++
        nextSrcs.map(c => col(s"__carryn_$c"))): _*)

    val j2 = seg.join(broadcast(carry), Seq(SEG), "left")
    val wSegPrev = Window.partitionBy(col(SEG)).orderBy(col(tsOut).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSegNext = Window.partitionBy(col(SEG)).orderBy(col(tsOut).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def known(c: String) = when(col(PRESENT).isNotNull, tv(c))
    def effPrev(c: String) =
      coalesce(last(known(c), ignoreNulls = true).over(wSegPrev), col(s"__carryp_$c"))
    def effNext(c: String) =
      coalesce(first(known(c), ignoreNulls = true).over(wSegNext), col(s"__carryn_$c"))

    val filled = perCol.foldLeft(j2) { case (d, (name, f)) =>
      f match {
        case NoFill | FillNull | FillPerColumn(_) => d
        case FillConst(values) =>
          values.get(name) match {
            case Some(v) => d.withColumn(name,
              when(col(PRESENT).isNotNull, col(name))
                .otherwise(lit(v).cast(d.schema(name).dataType)))
            case None => d
          }
        case FillPrev =>
          d.withColumn(name, effPrev(name).getField("v"))
        case FillPrevOf(src) =>
          d.withColumn(name,
            when(col(PRESENT).isNotNull, col(name)).otherwise(
              effPrev(src).getField("v").cast(d.schema(name).dataType)))
        case FillLinear =>
          val t = unix_micros(col(tsOut))
          val p = effPrev(name); val x = effNext(name)
          d.withColumn(name,
            when(col(PRESENT).isNotNull, col(name)).otherwise(
              (p.getField("v") + (x.getField("v") - p.getField("v")) *
                (t - p.getField("t")).cast("double") /
                (x.getField("t") - p.getField("t")).cast("double"))
                .cast(d.schema(name).dataType)))
      }
    }
    filled.drop(SEG +: (prevSrcs.map(c => s"__carryp_$c") ++
      nextSrcs.map(c => s"__carryn_$c")): _*)
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
    refOrderOf(df, df.groupBy((bucket +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*),
      keys, tsOut)
  }

  /** SAMPLE BY ... ALIGN TO FIRST OBSERVATION (reference
    * `SqlOptimiser.java:9019` exception path): buckets are anchored at
    * the table's GLOBAL first observed timestamp (the first row of the
    * ts-ordered scan — SampleByNanoTimestampTest asserts a filtered key
    * still buckets on the other key's earlier anchor), not per key —
    * bucket(ts) = first_ts + floor((ts − first_ts) / stride) · stride.
    *
    * Plan: one global min (tiny, broadcast), then the usual bucket
    * group-by; no window over the fact table.
    */
  def sampleByFirstObs(df: DataFrame, ts: String, strideMicros: Long,
                       keys: Seq[String], aggs: Seq[(String, Column)],
                       tsOut: String = "ts"): DataFrame = {
    val anchorUs = "__graft_anchor_us"
    val withAnchor = {
      val a = df.agg(min(unix_micros(col(ts))).as(anchorUs))
      df.crossJoin(broadcast(a))
    }
    val off = unix_micros(col(ts)) - col(anchorUs)
    val bucketCol = timestamp_micros(col(anchorUs) + (off - off % lit(strideMicros))).as(tsOut)
    refOrderOf(df, withAnchor.groupBy((bucketCol +: keys.map(col)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*),
      keys, tsOut)
  }

  /** bucket-major, keys by global first appearance — see refOrder in
    * [[sampleBy]]. */
  private def refOrderOf(src: DataFrame, result: DataFrame,
                         keys: Seq[String], tsOut: String): DataFrame =
    if (keys.isEmpty) result.orderBy(col(tsOut).asc)
    else {
      val fs = src.select((keys.map(col) :+
          org.apache.spark.sql.functions.monotonically_increasing_id().as("__graft_mono")): _*)
        .groupBy(keys.map(col): _*)
        .agg(min(col("__graft_mono")).as("__graft_fs"))
      result.join(broadcast(fs), keys, "left")
        .orderBy((col(tsOut).asc +: col("__graft_fs").asc +: keys.map(col(_).asc)): _*)
        .drop("__graft_fs")
    }

  private def keyWindow(keys: Seq[String], tsOut: String) =
    if (keys.isEmpty) Window.partitionBy().orderBy(col(tsOut).asc)
    else Window.partitionBy(keys.map(col): _*).orderBy(col(tsOut).asc)
}
