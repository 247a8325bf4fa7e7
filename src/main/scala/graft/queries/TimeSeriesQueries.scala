package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Time-series operators — the reference's signature surface:
  * ASOF/LT/SPLICE/WINDOW/HORIZON joins, LATEST ON, SAMPLE BY with every
  * FILL mode (SURVEY §2.3, §2.4). Oracles use DuckDB's native ASOF JOIN
  * and window/spine SQL.
  */
object TimeSeriesQueries extends QueryPack {

  private def purchases(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "purchase")

  private def clicks(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("ts").as("click_ts"), col("value").as("click_value"))

  def queries: Map[String, Fn] = Map(
    "q_asof_join" -> ((s, dir) => {
      AsofJoin.asofKeyed(
        purchases(s, dir).select("event_id", "ts", "user_id", "value"),
        clicks(s, dir), "ts", "ts", Seq("user_id"), Seq("click_ts", "click_value"))
        .orderBy(col("event_id"))
    }),

    "q_asof_native" -> ((s, dir) => {
      // same semantics as q_asof_join, through the native sorted-merge
      // physical operator (AsOfJoinExec)
      AsofJoin.asofKeyedNative(
        purchases(s, dir).select("event_id", "ts", "user_id", "value"),
        clicks(s, dir), "ts", "ts", Seq("user_id"), Seq("click_ts", "click_value"))
        .orderBy(col("event_id"))
    }),

    "q_lt_join" -> ((s, dir) => {
      AsofJoin.asofKeyed(
        purchases(s, dir).select("event_id", "ts", "user_id", "value"),
        clicks(s, dir), "ts", "ts", Seq("user_id"), Seq("click_ts", "click_value"),
        strict = true)
        .orderBy(col("event_id"))
    }),

    "q_asof_tolerance" -> ((s, dir) => {
      AsofJoin.asofKeyed(
        purchases(s, dir).select("event_id", "ts", "user_id", "value"),
        clicks(s, dir), "ts", "ts", Seq("user_id"), Seq("click_ts", "click_value"),
        toleranceMicros = Some(3600L * 1000000L))
        .orderBy(col("event_id"))
    }),

    "q_asof_nokey" -> ((s, dir) => {
      val signups = Tables.events(s, dir).filter(col("event_type") === "signup")
        .select(col("ts"), col("ts").as("signup_ts"), col("value").as("signup_value"))
      AsofJoin.asofNoKey(
        purchases(s, dir).select("event_id", "ts", "user_id", "value"),
        signups, "ts", "ts", Seq("signup_ts", "signup_value"))
        .orderBy(col("event_id"))
    }),

    "q_asof_nokey_range" -> ((s, dir) => {
      // same semantics as q_asof_nokey, pinned to the distributed
      // range-bucketed path (the large-slave plan: no driver collect)
      val signups = Tables.events(s, dir).filter(col("event_type") === "signup")
        .select(col("ts"), col("ts").as("signup_ts"), col("value").as("signup_value"))
      AsofJoin.asofRangeNoKey(
        purchases(s, dir).select("event_id", "ts", "user_id", "value"),
        signups, "ts", "ts", Seq("signup_ts", "signup_value"))
        .orderBy(col("event_id"))
    }),

    "q_splice_join" -> ((s, dir) => {
      val p = purchases(s, dir).select(col("user_id"), col("ts"), col("value").as("p_value"))
      val c = clicks(s, dir).select(col("user_id"), col("ts"), col("click_value"))
      AsofJoin.splice(p, c, "ts", "ts", Seq("user_id"), Seq("p_value"), Seq("click_value"))
        .orderBy(col("user_id"), col("ts"), col("side"))
    }),

    "q_window_join" -> ((s, dir) => {
      WindowJoin.windowJoin(
        purchases(s, dir).select("event_id", "ts", "user_id"),
        clicks(s, dir).select("user_id", "ts", "click_value"),
        "ts", "ts", Seq("user_id"),
        -600L * 1000000L, 600L * 1000000L,
        Seq(
          "n_nearby" -> count(col("click_value")),
          "sum_nearby" -> round(sum(col("click_value").cast("decimal(24,6)")).cast("double"), 6)))
        .orderBy(col("event_id"))
    }),

    "q_window_join_prevailing" -> ((s, dir) => {
      WindowJoin.windowJoinPrevailing(
        purchases(s, dir).select("event_id", "ts", "user_id"),
        clicks(s, dir),
        "ts", "ts", Seq("user_id"), Seq("click_ts", "click_value"),
        -600L * 1000000L, 600L * 1000000L,
        Seq(
          "n_contrib" -> count(col("click_value")),
          "sum_contrib" -> round(sum(col("click_value").cast("decimal(24,6)")).cast("double"), 6)))
        .orderBy(col("event_id"))
    }),

    "q_horizon_join" -> ((s, dir) => {
      HorizonJoin.horizonJoin(
        purchases(s, dir).select("event_id", "ts", "user_id"),
        clicks(s, dir), "ts", "ts", Seq("user_id"), Seq("click_ts", "click_value"),
        Seq(0L, 300L * 1000000L, 900L * 1000000L))
        .select("event_id", "user_id", "off_us", "click_ts", "click_value")
        .orderBy(col("event_id"), col("off_us"))
    }),

    "q_latest_on" -> ((s, dir) => {
      LatestOn.latestOn(Tables.events(s, dir), "ts", Seq("user_id"), Seq("event_id"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy(col("user_id"))
    }),

    "q_latest_on_filtered" -> ((s, dir) => {
      // WHERE applies BEFORE the latest-by (reference semantics)
      LatestOn.latestOn(
        Tables.events(s, dir).filter(col("value") > 400.0),
        "ts", Seq("user_id", "event_type"), Seq("event_id"))
        .select("user_id", "event_type", "ts", "event_id", "value")
        .orderBy(col("user_id"), col("event_type"))
    }),

    "q_sample_by_1h" -> ((s, dir) => {
      SampleBy.sampleBy(Tables.events(s, dir), "ts", "1 hour", Seq("event_type"),
        Seq(
          "n" -> count(lit(1)),
          "sum_v" -> sumDec(col("value")),
          "max_v" -> max(col("value"))))
        .orderBy(col("event_type"), col("ts"))
    }),

    "q_sample_by_fill_null" -> ((s, dir) => {
      SampleBy.sampleBy(
        Tables.events(s, dir).filter(col("value") > 470.0),
        "ts", "6 hours", Seq("event_type"),
        Seq("n" -> count(lit(1)), "max_v" -> max(col("value"))),
        fill = SampleBy.FillNull)
    }),

    "q_sample_by_fill_prev" -> ((s, dir) => {
      SampleBy.sampleBy(
        Tables.events(s, dir).filter(col("value") > 470.0),
        "ts", "6 hours", Seq("event_type"),
        Seq("max_v" -> max(col("value"))),
        fill = SampleBy.FillPrev)
    }),

    "q_sample_by_fill_const" -> ((s, dir) => {
      SampleBy.sampleBy(
        Tables.events(s, dir).filter(col("value") > 470.0),
        "ts", "6 hours", Seq("event_type"),
        Seq("n" -> count(lit(1))),
        fill = SampleBy.FillConst(Map("n" -> 0L)))
    }),

    "q_sample_by_fill_linear" -> ((s, dir) => {
      SampleBy.sampleBy(
        Tables.events(s, dir).filter(col("value") > 470.0),
        "ts", "6 hours", Seq("event_type"),
        Seq("avg_v" -> round(avg(col("value")), 4)),
        fill = SampleBy.FillLinear)
    }),

    "q_sample_by_offset" -> ((s, dir) => {
      // SAMPLE BY 1d ALIGN TO CALENDAR WITH OFFSET '02:00'
      SampleBy.sampleBy(Tables.events(s, dir), "ts", "1 day", Seq("event_type"),
        Seq("n" -> count(lit(1)), "sum_v" -> sumDec(col("value"))),
        offset = "2 hours")
        .orderBy(col("event_type"), col("ts"))
    }),

    "q_sample_by_tz" -> ((s, dir) => {
      // SAMPLE BY 1d ALIGN TO CALENDAR TIME ZONE 'America/New_York'
      SampleBy.sampleByCalendarTz(Tables.events(s, dir), "ts", "day",
        "America/New_York", Seq("event_type"),
        Seq("n" -> count(lit(1)), "sum_v" -> sumDec(col("value"))))
        .orderBy(col("event_type"), col("ts"))
    }),

    "q_ema" -> ((s, dir) => {
      Ema.ema(
        Tables.events(s, dir).filter(col("user_id") < 30)
          .select("user_id", "ts", "value"),
        "ts", Seq("user_id"), "value", 0.2, "ema")
        .orderBy(col("user_id"), col("ts"))
    }),

    "q_vwema" -> ((s, dir) => {
      Ema.vwema(
        Tables.events(s, dir).filter(col("user_id") < 30)
          .select(col("user_id"), col("ts"), col("value"),
            (col("event_id") % 5 + 1).cast("double").as("vol")),
        "ts", Seq("user_id"), "value", "vol", 0.25, "vwema")
        .orderBy(col("user_id"), col("ts"))
    })
  )

  private val P = "SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'"
  private val C = "SELECT user_id, ts, ts AS click_ts, value AS click_value FROM events WHERE event_type = 'click'"

  def oracles: Map[String, String] = Map(
    "q_asof_join" ->
      s"""SELECT p.event_id, p.ts, p.user_id, p.value, c.click_ts, c.click_value
         |FROM ($P) p ASOF LEFT JOIN ($C) c
         |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
         |ORDER BY p.event_id""".stripMargin,

    "q_asof_native" ->
      s"""SELECT p.event_id, p.ts, p.user_id, p.value, c.click_ts, c.click_value
         |FROM ($P) p ASOF LEFT JOIN ($C) c
         |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
         |ORDER BY p.event_id""".stripMargin,

    "q_lt_join" ->
      s"""SELECT p.event_id, p.ts, p.user_id, p.value, c.click_ts, c.click_value
         |FROM ($P) p ASOF LEFT JOIN ($C) c
         |  ON p.user_id = c.user_id AND p.ts > c.click_ts
         |ORDER BY p.event_id""".stripMargin,

    "q_asof_tolerance" ->
      s"""SELECT event_id, ts, user_id, value,
         |  CASE WHEN click_ts >= ts - INTERVAL 1 HOUR THEN click_ts END AS click_ts,
         |  CASE WHEN click_ts >= ts - INTERVAL 1 HOUR THEN click_value END AS click_value
         |FROM (
         |  SELECT p.event_id, p.ts, p.user_id, p.value, c.click_ts, c.click_value
         |  FROM ($P) p ASOF LEFT JOIN ($C) c
         |    ON p.user_id = c.user_id AND p.ts >= c.click_ts
         |) ORDER BY event_id""".stripMargin,

    "q_asof_nokey" ->
      s"""SELECT p.event_id, p.ts, p.user_id, p.value, s.signup_ts, s.signup_value
         |FROM ($P) p ASOF LEFT JOIN
         |  (SELECT ts, ts AS signup_ts, value AS signup_value FROM events WHERE event_type = 'signup') s
         |  ON p.ts >= s.signup_ts
         |ORDER BY p.event_id""".stripMargin,

    "q_asof_nokey_range" ->
      s"""SELECT p.event_id, p.ts, p.user_id, p.value, s.signup_ts, s.signup_value
         |FROM ($P) p ASOF LEFT JOIN
         |  (SELECT ts, ts AS signup_ts, value AS signup_value FROM events WHERE event_type = 'signup') s
         |  ON p.ts >= s.signup_ts
         |ORDER BY p.event_id""".stripMargin,

    "q_splice_join" ->
      """WITH p AS (SELECT user_id, ts, value AS p_value FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value AS click_value FROM events WHERE event_type = 'click')
        |SELECT * FROM (
        |  SELECT p.user_id, p.ts AS ts, 1 AS side, p.ts AS master_ts, p.p_value,
        |         c.ts AS slave_ts, c.click_value
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |  UNION ALL
        |  SELECT c.user_id, c.ts AS ts, 0 AS side, p2.ts AS master_ts, p2.p_value,
        |         c.ts AS slave_ts, c.click_value
        |  FROM c ASOF LEFT JOIN p p2 ON c.user_id = p2.user_id AND c.ts >= p2.ts
        |) ORDER BY user_id, ts, side""".stripMargin,

    "q_window_join" ->
      s"""SELECT p.event_id, p.ts, p.user_id, count(c.click_value) AS n_nearby,
         |  round(CAST(sum(CAST(c.click_value AS DECIMAL(24,6))) AS DOUBLE), 6) AS sum_nearby
         |FROM ($P) p LEFT JOIN ($C) c
         |  ON p.user_id = c.user_id
         |  AND c.ts >= p.ts - INTERVAL 10 MINUTES AND c.ts <= p.ts + INTERVAL 10 MINUTES
         |GROUP BY p.event_id, p.ts, p.user_id
         |ORDER BY p.event_id""".stripMargin,

    "q_window_join_prevailing" ->
      s"""WITH contrib AS (
         |  SELECT p.event_id, p.ts, p.user_id, c.click_value
         |  FROM ($P) p LEFT JOIN ($C) c
         |    ON p.user_id = c.user_id
         |    AND c.ts >= p.ts - INTERVAL 10 MINUTES AND c.ts <= p.ts + INTERVAL 10 MINUTES
         |  UNION ALL
         |  SELECT p.event_id, p.ts, p.user_id, c.click_value
         |  FROM ($P) p ASOF LEFT JOIN ($C) c
         |    ON p.user_id = c.user_id AND p.ts - INTERVAL 10 MINUTES > c.click_ts)
         |SELECT event_id, ts, user_id, count(click_value) AS n_contrib,
         |  round(CAST(sum(CAST(click_value AS DECIMAL(24,6))) AS DOUBLE), 6) AS sum_contrib
         |FROM contrib GROUP BY event_id, ts, user_id
         |ORDER BY event_id""".stripMargin,

    "q_horizon_join" ->
      s"""WITH offs(off_us) AS (SELECT CAST(x AS BIGINT) FROM (VALUES (0), (300000000), (900000000)) v(x)),
         |m AS (SELECT e.event_id, e.user_id, e.off_us, e.h_ts FROM (
         |   SELECT p.event_id, p.user_id, o.off_us, p.ts + to_microseconds(o.off_us) AS h_ts
         |   FROM ($P) p CROSS JOIN offs o) e)
         |SELECT m.event_id, m.user_id, m.off_us, c.click_ts, c.click_value
         |FROM m ASOF LEFT JOIN ($C) c
         |  ON m.user_id = c.user_id AND m.h_ts >= c.click_ts
         |ORDER BY m.event_id, m.off_us""".stripMargin,

    "q_latest_on" ->
      """SELECT user_id, ts, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_latest_on_filtered" ->
      """SELECT user_id, event_type, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE value > 400.0
        |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_sample_by_1h" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS ts, count(*) AS n,
         |  ${sumDecSql("value")} AS sum_v, max(value) AS max_v
         |FROM events GROUP BY 1, 2 ORDER BY event_type, ts""".stripMargin,

    "q_sample_by_fill_null" ->
      """WITH base AS (
        |  SELECT event_type, time_bucket(INTERVAL 6 HOURS, ts, TIMESTAMP '1970-01-01') AS ts,
        |         count(*) AS n, max(value) AS max_v
        |  FROM events WHERE value > 470.0 GROUP BY 1, 2),
        |bounds AS (SELECT min(ts) AS mn, max(ts) AS mx FROM base),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 6 HOURS)) AS ts FROM bounds),
        |keys AS (SELECT DISTINCT event_type FROM base)
        |SELECT k.event_type, s.ts, b.n, b.max_v
        |FROM keys k CROSS JOIN spine s LEFT JOIN base b USING (event_type, ts)
        |ORDER BY k.event_type, s.ts""".stripMargin,

    "q_sample_by_fill_prev" ->
      """WITH base AS (
        |  SELECT event_type, time_bucket(INTERVAL 6 HOURS, ts, TIMESTAMP '1970-01-01') AS ts,
        |         max(value) AS max_v
        |  FROM events WHERE value > 470.0 GROUP BY 1, 2),
        |bounds AS (SELECT min(ts) AS mn, max(ts) AS mx FROM base),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 6 HOURS)) AS ts FROM bounds),
        |keys AS (SELECT DISTINCT event_type FROM base)
        |SELECT event_type, ts,
        |  last_value(max_v IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_v
        |FROM (SELECT k.event_type, s.ts, b.max_v
        |      FROM keys k CROSS JOIN spine s LEFT JOIN base b USING (event_type, ts))
        |ORDER BY event_type, ts""".stripMargin,

    "q_sample_by_fill_const" ->
      """WITH base AS (
        |  SELECT event_type, time_bucket(INTERVAL 6 HOURS, ts, TIMESTAMP '1970-01-01') AS ts,
        |         count(*) AS n
        |  FROM events WHERE value > 470.0 GROUP BY 1, 2),
        |bounds AS (SELECT min(ts) AS mn, max(ts) AS mx FROM base),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 6 HOURS)) AS ts FROM bounds),
        |keys AS (SELECT DISTINCT event_type FROM base)
        |SELECT k.event_type, s.ts, coalesce(b.n, 0) AS n
        |FROM keys k CROSS JOIN spine s LEFT JOIN base b USING (event_type, ts)
        |ORDER BY k.event_type, s.ts""".stripMargin,

    "q_sample_by_fill_linear" ->
      """WITH base AS (
        |  SELECT event_type, time_bucket(INTERVAL 6 HOURS, ts, TIMESTAMP '1970-01-01') AS ts,
        |         round(avg(value), 4) AS avg_v
        |  FROM events WHERE value > 470.0 GROUP BY 1, 2),
        |bounds AS (SELECT min(ts) AS mn, max(ts) AS mx FROM base),
        |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 6 HOURS)) AS ts FROM bounds),
        |keys AS (SELECT DISTINCT event_type FROM base),
        |grid AS (SELECT k.event_type, s.ts, b.avg_v, b.avg_v IS NOT NULL AS present,
        |                epoch_us(s.ts) AS t
        |         FROM keys k CROSS JOIN spine s LEFT JOIN base b USING (event_type, ts)),
        |carr AS (SELECT *,
        |  last_value(CASE WHEN present THEN t END IGNORE NULLS) OVER wp AS pt,
        |  last_value(CASE WHEN present THEN avg_v END IGNORE NULLS) OVER wp AS pv,
        |  first_value(CASE WHEN present THEN t END IGNORE NULLS) OVER wn AS nt,
        |  first_value(CASE WHEN present THEN avg_v END IGNORE NULLS) OVER wn AS nv
        |  FROM grid
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, ts,
        |  CASE WHEN present THEN avg_v
        |       ELSE pv + (nv - pv) * CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE) END AS avg_v
        |FROM carr ORDER BY event_type, ts""".stripMargin,

    "q_sample_by_offset" ->
      s"""SELECT event_type, time_bucket(INTERVAL 1 DAY, ts, TIMESTAMP '1970-01-01 02:00:00') AS ts,
         |  count(*) AS n, ${sumDecSql("value")} AS sum_v
         |FROM events GROUP BY 1, 2 ORDER BY event_type, ts""".stripMargin,

    "q_sample_by_tz" ->
      s"""SELECT event_type,
         |  CAST(timezone('America/New_York',
         |         date_trunc('day', timezone('America/New_York', ts::TIMESTAMPTZ))) AS TIMESTAMP) AS ts,
         |  count(*) AS n, ${sumDecSql("value")} AS sum_v
         |FROM events GROUP BY 1, 2 ORDER BY event_type, ts""".stripMargin,

    "q_ema" ->
      """SELECT user_id, ts, value,
        |  list_reduce(list(value) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    (acc, x) -> 0.2 * x + (1.0 - 0.2) * acc) AS ema
        |FROM events WHERE user_id < 30
        |ORDER BY user_id, ts""".stripMargin,

    "q_vwema" ->
      """SELECT user_id, ts, value, vol,
        |  list_reduce(list(value * vol) OVER w, (acc, x) -> 0.25 * x + (1.0 - 0.25) * acc)
        |  / list_reduce(list(vol) OVER w, (acc, x) -> 0.25 * x + (1.0 - 0.25) * acc) AS vwema
        |FROM (SELECT user_id, ts, event_id, value,
        |        CAST(event_id % 5 + 1 AS DOUBLE) AS vol
        |      FROM events WHERE user_id < 30)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts""".stripMargin
  )
}
