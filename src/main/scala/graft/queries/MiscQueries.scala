package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Odds and ends from the SURVEY §2 inventory: deterministic mode,
  * multiset set-ops (INTERSECT/EXCEPT ALL), the `bar` unicode chart
  * function, deterministic uuid formatting, string_agg over groups.
  */
object MiscQueries extends QueryPack {

  def queries: Map[String, Fn] = Map(
    "q_mode" -> ((s, dir) => {
      // mode(user_id) per event_type, ties broken to the smallest value
      val counts = Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("c").desc, col("user_id").asc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("user_id").as("mode_user"), col("c").as("n"))
        .orderBy(col("event_type"))
    }),

    "q_intersect_all" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("k"))
      val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.intersectAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n")).orderBy(col("k"))
    }),

    "q_except_all" -> ((s, dir) => {
      val sup = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("k"))
      val c = Tables.load(s, dir, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_nationkey").as("k"))
      sup.exceptAll(c).groupBy(col("k")).agg(count(lit(1)).as("n")).orderBy(col("k"))
    }),

    "q_haversine_track" -> ((s, dir) => {
      // haversine_dist_deg aggregate: total great-circle distance along
      // each user's event track in ts order (reference
      // HaversineDistDegreeGroupByFunction). Per-step distances are
      // rounded (identical IEEE shapes both engines), then summed
      // exactly in decimal.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir).filter(col("user_id") < 40)
        .withColumn("lat", col("value") / 490.0 * 170.0 - 85.0)
        .withColumn("lon", (col("event_id") % 360).cast("double") - 179.5)
        .withColumn("plat", lag(col("lat"), 1).over(w))
        .withColumn("plon", lag(col("lon"), 1).over(w))
        .withColumn("step",
          round(graft.functions.GeoHash.distanceMeters(col("plat"), col("plon"), col("lat"), col("lon")), 4))
        .groupBy(col("user_id"))
        .agg(round(sum(col("step").cast("decimal(24,4)")).cast("double"), 4).as("dist_m"),
          count(col("step")).as("n_steps"))
        .orderBy(col("user_id"))
    }),

    "q_regr" -> ((s, dir) => {
      // regr_slope / regr_intercept / regr_r2 of value on user_id
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(covar_pop(col("value"), col("user_id").cast("double")) /
            var_pop(col("user_id").cast("double")), 6).as("slope"),
          round(avg(col("value")) -
            covar_pop(col("value"), col("user_id").cast("double")) /
              var_pop(col("user_id").cast("double")) * avg(col("user_id").cast("double")), 6).as("intercept"),
          round(pow(corr(col("value"), col("user_id").cast("double")), 2), 6).as("r2"))
        .orderBy(col("event_type"))
    }),

    "q_bar" -> ((s, dir) => {
      // reference str/bar: unicode bar chart of a value
      Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          expr("repeat('#', CAST(floor(value / 50.0) AS INT))").as("bar"),
          expr("repeat('█', CAST(floor(value / 100.0) AS INT))").as("ubar"))
        .orderBy(col("event_id"))
    }),

    "q_first_last_not_null" -> ((s, dir) => {
      // first_not_null/last_not_null (ts-ordered) via min/max over a
      // (ts, id, v) struct restricted to non-null v
      val v = when(col("value") >= 100.0, col("value"))
      val nn = when(v.isNotNull, struct(col("ts"), col("event_id"), v.as("v")))
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          min(nn).getField("v").as("first_nn"),
          max(nn).getField("v").as("last_nn"),
          count(v).as("n_nn"))
        .orderBy(col("event_type"))
    }),

    "q_weighted_avg" -> ((s, dir) => {
      // weighted_avg(value, w) with exact decimal partial sums + geomean
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          (sum(col("value").cast("decimal(18,2)") * (col("user_id") + 1).cast("decimal(20,0)")).cast("double") /
            sum((col("user_id") + 1).cast("decimal(20,0)")).cast("double")).as("wavg"),
          // geomean over the strictly-positive subset (ln(0) is an error
          // in some engines, null in Spark — the guard makes it portable)
          round(exp(avg(when(col("value") > 0.0, log(col("value"))))), 6).as("gmean"))
        .orderBy(col("event_type"))
    }),

    "q_weighted_stddev" -> ((s, dir) => {
      // weighted_stddev pop/freq variants (reference
      // functions/groupby/WeightedStddev*): exact decimal moments, double
      // only at the final quotient (rounded — order-independent)
      val w = (col("user_id") + 1).cast("decimal(10,0)")
      val x = col("value").cast("decimal(8,2)")
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(
          sum(w).cast("double").as("sw"),
          sum(x * w).cast("double").as("swx"),
          sum(x * x * w).cast("double").as("swx2"))
        .select(col("event_type"),
          round(sqrt((col("swx2") - col("swx") * col("swx") / col("sw")) / col("sw")), 6).as("wstd_pop"),
          round(sqrt((col("swx2") - col("swx") * col("swx") / col("sw")) / (col("sw") - 1)), 6).as("wstd_freq"))
        .orderBy(col("event_type"))
    }),

    "q_cube" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q_fn_datetime2" -> ((s, dir) => {
      // days_in_month, is_leap_year, quarter, last_day, months_between,
      // interval_start/end (QuestDB interval values → lo/hi columns)
      Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          dayofmonth(last_day(col("ts"))).as("days_in_month"),
          (((year(col("ts")) % 4 === 0) && (year(col("ts")) % 100 =!= 0)) ||
            (year(col("ts")) % 400 === 0)).as("is_leap"),
          quarter(col("ts")).as("q"),
          last_day(col("ts")).cast("timestamp").as("month_end"),
          ((year(col("ts")) - 2023) * 12 + month(col("ts")) - lit(6)).as("months_since"),
          date_trunc("day", col("ts")).as("interval_lo"),
          (date_trunc("day", col("ts")) + expr("INTERVAL 1 DAY")).as("interval_hi"))
        .orderBy(col("event_id"))
    }),

    "q_fn_datetime3" -> ((s, dir) => {
      // timestamp_floor/ceil at arbitrary strides, dateadd/datediff,
      // week_of_year, round_half_even / round_up / round_down modes
      import graft.functions.TimeFns
      Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          TimeFns.timestampFloor(300000000L, col("ts")).as("floor_5m"),
          TimeFns.timestampCeil(300000000L, col("ts")).as("ceil_5m"),
          TimeFns.timestampFloor(3600000000L, col("ts")).as("floor_1h"),
          TimeFns.dateAdd("h", 3, col("ts")).as("plus_3h"),
          TimeFns.dateAdd("M", 1, col("ts")).as("plus_1mo"),
          TimeFns.dateDiff("m", lit("2024-01-01 00:00:00").cast("timestamp"), col("ts")).as("mins_since"),
          weekofyear(col("ts")).as("woy"),
          bround(col("value") / 3.0, 2).as("r_even"),
          (signum(col("value")) * ceil(abs(col("value")) * 10) / 10).as("r_up"),
          (signum(col("value")) * floor(abs(col("value")) * 10) / 10).as("r_down"))
        .orderBy(col("event_id"))
    }),

    "q_fn_timezone" -> ((s, dir) => {
      // to_timezone / to_utc (reference date fns): UTC-naive ↔ zone-local
      Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          from_utc_timestamp(col("ts"), "Asia/Tokyo").as("tokyo_local"),
          to_utc_timestamp(from_utc_timestamp(col("ts"), "Asia/Tokyo"), "Asia/Tokyo").as("roundtrip"),
          hour(from_utc_timestamp(col("ts"), "America/Chicago")).as("chi_hour"))
        .orderBy(col("event_id"))
    }),

    "q_is_ordered" -> ((s, dir) => {
      // isOrdered: is `value` monotone non-decreasing in ts order per user
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir).filter(col("user_id") < 40)
        .withColumn("ok", coalesce(col("value") >= lag(col("value"), 1).over(w), lit(true)))
        .groupBy(col("user_id"))
        .agg(bool_and(col("ok")).as("is_ordered"), count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    "q_sparkline" -> ((s, dir) => {
      graft.functions.Sparkline.sparkline(
        Tables.events(s, dir).filter(col("user_id") < 30),
        Seq("user_id"), "ts", "value", 12)
        .orderBy(col("user_id"))
    }),

    "q_uuid" -> ((s, dir) => {
      // deterministic uuid4-shaped id from md5 (rnd_uuid4 analogue with
      // a portable seed)
      val h = md5(concat(lit("uuid"), col("event_id").cast("string")))
      Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          concat(
            substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-4"),
            substring(h, 14, 3), lit("-8"), substring(h, 18, 3), lit("-"),
            substring(h, 21, 12)).as("uuid"))
        .orderBy(col("event_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_mode" ->
      """WITH counts AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY c DESC, user_id ASC) AS rn
        |  FROM counts)
        |SELECT event_type, user_id AS mode_user, c AS n
        |FROM ranked WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_intersect_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS k FROM supplier
        |) GROUP BY k ORDER BY k""".stripMargin,

    "q_except_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT s_nationkey AS k FROM supplier
        |  EXCEPT ALL
        |  SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 200
        |) GROUP BY k ORDER BY k""".stripMargin,

    "q_haversine_track" ->
      """WITH pts AS (
        |  SELECT user_id, ts, event_id,
        |    value / 490.0 * 170.0 - 85.0 AS lat,
        |    CAST(event_id % 360 AS DOUBLE) - 179.5 AS lon
        |  FROM events WHERE user_id < 40),
        |steps AS (
        |  SELECT user_id,
        |    round(2 * 6371008.8 * asin(sqrt(
        |      pow(sin(radians(lat - lag(lat) OVER w) / 2), 2)
        |      + cos(radians(lag(lat) OVER w)) * cos(radians(lat))
        |        * pow(sin(radians(lon - lag(lon) OVER w) / 2), 2))), 4) AS step
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT user_id,
        |  round(CAST(sum(CAST(step AS DECIMAL(24,4))) AS DOUBLE), 4) AS dist_m,
        |  count(step) AS n_steps
        |FROM steps GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_regr" ->
      """SELECT event_type,
        |  round(covar_pop(value, CAST(user_id AS DOUBLE)) / var_pop(CAST(user_id AS DOUBLE)), 6) AS slope,
        |  round(avg(value) - covar_pop(value, CAST(user_id AS DOUBLE)) / var_pop(CAST(user_id AS DOUBLE))
        |        * avg(CAST(user_id AS DOUBLE)), 6) AS intercept,
        |  round(pow(corr(value, CAST(user_id AS DOUBLE)), 2), 6) AS r2
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_bar" ->
      """SELECT event_id,
        |  repeat('#', CAST(floor(value / 50.0) AS INT)) AS bar,
        |  repeat('█', CAST(floor(value / 100.0) AS INT)) AS ubar
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "q_first_last_not_null" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id,
        |    CASE WHEN value >= 100.0 THEN value END AS v
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM e WHERE v IS NOT NULL)
        |SELECT event_type,
        |  max(CASE WHEN rf = 1 THEN v END) AS first_nn,
        |  max(CASE WHEN rl = 1 THEN v END) AS last_nn,
        |  count(*) AS n_nn
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_weighted_avg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(user_id + 1 AS DECIMAL(20,0))) AS DOUBLE)
        |    / CAST(sum(CAST(user_id + 1 AS DECIMAL(20,0))) AS DOUBLE) AS wavg,
        |  round(exp(avg(CASE WHEN value > 0.0 THEN ln(value) END)), 6) AS gmean
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_weighted_stddev" ->
      """SELECT event_type,
        |  round(sqrt((swx2 - swx * swx / sw) / sw), 6) AS wstd_pop,
        |  round(sqrt((swx2 - swx * swx / sw) / (sw - 1)), 6) AS wstd_freq
        |FROM (
        |  SELECT event_type,
        |    CAST(sum(CAST(user_id + 1 AS DECIMAL(10,0))) AS DOUBLE) AS sw,
        |    CAST(sum(CAST(value AS DECIMAL(8,2)) * CAST(user_id + 1 AS DECIMAL(10,0))) AS DOUBLE) AS swx,
        |    CAST(sum(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2)) * CAST(user_id + 1 AS DECIMAL(10,0))) AS DOUBLE) AS swx2
        |  FROM events GROUP BY event_type)
        |ORDER BY event_type""".stripMargin,

    "q_fn_datetime2" ->
      """SELECT event_id,
        |  CAST(day(last_day(ts)) AS INT) AS days_in_month,
        |  (year(ts) % 4 = 0 AND year(ts) % 100 <> 0) OR year(ts) % 400 = 0 AS is_leap,
        |  CAST(quarter(ts) AS INT) AS q,
        |  CAST(last_day(ts) AS TIMESTAMP) AS month_end,
        |  CAST((year(ts) - 2023) * 12 + month(ts) - 6 AS INT) AS months_since,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS interval_lo,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS interval_hi
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "q_fn_datetime3" ->
      """SELECT event_id,
        |  make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000) AS floor_5m,
        |  make_timestamp(CASE WHEN epoch_us(ts) % 300000000 = 0 THEN epoch_us(ts)
        |    ELSE epoch_us(ts) - epoch_us(ts) % 300000000 + 300000000 END) AS ceil_5m,
        |  make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS floor_1h,
        |  ts + INTERVAL 3 HOUR AS plus_3h,
        |  ts + INTERVAL 1 MONTH AS plus_1mo,
        |  CAST(floor(epoch_us(ts) / 60000000) - floor(epoch_us(TIMESTAMP '2024-01-01') / 60000000) AS BIGINT) AS mins_since,
        |  CAST(weekofyear(ts) AS INT) AS woy,
        |  round_even(value / 3.0, 2) AS r_even,
        |  sign(value) * ceil(abs(value) * 10) / 10 AS r_up,
        |  sign(value) * floor(abs(value) * 10) / 10 AS r_down
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "q_fn_timezone" ->
      """SELECT event_id,
        |  CAST(timezone('Asia/Tokyo', ts::TIMESTAMPTZ) AS TIMESTAMP) AS tokyo_local,
        |  CAST(timezone('Asia/Tokyo', timezone('Asia/Tokyo', ts::TIMESTAMPTZ)::TIMESTAMP) AS TIMESTAMP) AS roundtrip,
        |  CAST(hour(timezone('America/Chicago', ts::TIMESTAMPTZ)) AS INT) AS chi_hour
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "q_is_ordered" ->
      """SELECT user_id, bool_and(ok) AS is_ordered, count(*) AS n FROM (
        |  SELECT user_id,
        |    coalesce(value >= lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), true) AS ok
        |  FROM events WHERE user_id < 40
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sparkline" ->
      """WITH bounds AS (
        |  SELECT user_id, ts, value,
        |    min(epoch_us(ts)) OVER (PARTITION BY user_id) AS lo,
        |    max(epoch_us(ts)) OVER (PARTITION BY user_id) AS hi
        |  FROM events WHERE user_id < 30),
        |bucketed AS (
        |  SELECT user_id,
        |    CAST(floor(CAST(epoch_us(ts) - lo AS DOUBLE) / CAST(hi - lo + 1 AS DOUBLE) * 12) AS INT) AS b,
        |    round(avg(value), 6) AS v
        |  FROM bounds GROUP BY 1, 2),
        |scaled AS (
        |  SELECT user_id, b, v,
        |    min(v) OVER (PARTITION BY user_id) AS vmin,
        |    max(v) OVER (PARTITION BY user_id) AS vmax
        |  FROM bucketed),
        |chars AS (
        |  SELECT user_id, b,
        |    substring('▁▂▃▄▅▆▇█',
        |      (CASE WHEN vmax = vmin THEN 3
        |            ELSE least(CAST(floor((v - vmin) / (vmax - vmin) * 8.0) AS INT), 7) END) + 1, 1) AS ch
        |  FROM scaled)
        |SELECT user_id, string_agg(ch, '' ORDER BY b) AS sparkline
        |FROM chars GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_uuid" ->
      """SELECT event_id,
        |  substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-4' || substring(h, 14, 3)
        |    || '-8' || substring(h, 18, 3) || '-' || substring(h, 21, 12) AS uuid
        |FROM (SELECT event_id, md5('uuid' || CAST(event_id AS VARCHAR)) AS h
        |      FROM events WHERE event_id < 200)
        |ORDER BY event_id""".stripMargin
  )
}
