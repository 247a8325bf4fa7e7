package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions (SURVEY §2.5): ranking, lead/lag, running frames,
  * time-RANGE frames, IGNORE NULLS first/last/nth, ntile/percent_rank/
  * cume_dist, and the recursive EMA (in TimeSeriesQueries.q_ema).
  * All lower to `Window.partitionBy(...).orderBy(...)` — per-key sort
  * within shuffle partitions, no global sort.
  */
object WindowFnQueries extends QueryPack {

  def queries: Map[String, Fn] = Map(
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id").asc)
      Tables.events(s, dir)
        .select("event_id", "event_type", "value")
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 5)
        .orderBy(col("event_type"), col("rn"))
    }),

    "q_window_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
      Tables.events(s, dir).filter(col("user_id") < 10)
        .select("user_id", "ts", "value")
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .withColumn("next_v", lead(col("value"), 1).over(w))
        .withColumn("prev2_v", lag(col("value"), 2, -1.0).over(w))
        .orderBy(col("user_id"), col("ts"))
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"),
          count(lit(1)).over(w).as("run_n"),
          round(sum(col("value").cast("decimal(24,6)")).over(w).cast("double"), 6).as("run_sum"),
          max(col("value")).over(w).as("run_max"))
        .orderBy(col("user_id"), col("ts"))
    }),

    "q_window_stats" -> ((s, dir) => {
      // running stddev / corr over a window (reference StdDevDouble/
      // CorrDouble window factories) — computed from exact decimal
      // moments so the values are order- and engine-independent (native
      // Welford accumulators differ in ulps). Both outputs pass through
      // sqrt, so they are irrational and never land on a rounding tie —
      // a plain covar quotient does (rational with small denominators)
      // and is gate-covered at the aggregate level (q_agg_stats) instead.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val x = col("value").cast("decimal(8,2)")
      val y = (col("value") * (col("user_id") % 7 + 1).cast("double") + col("user_id"))
        .cast("decimal(16,2)")
      // all six moments in one projection → a single Window operator
      // (chained withColumn would stack six window passes)
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"),
          count(lit(1)).over(w).as("n"),
          sum(x).over(w).cast("double").as("sx"),
          sum(y).over(w).cast("double").as("sy"),
          sum(x * x).over(w).cast("double").as("sxx"),
          sum(y * y).over(w).cast("double").as("syy"),
          sum(x * y).over(w).cast("double").as("sxy"))
        .select(col("user_id"), col("ts"), col("value"),
          when(col("n") > 1, round(
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6))
            .as("run_stddev"),
          when(col("n") > 1, round(
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6))
            .as("run_corr"))
        .orderBy(col("user_id"), col("ts"))
    }),

    "q_window_range_time" -> ((s, dir) => {
      // RANGE '10m' PRECEDING over the designated ts (time-interval frame)
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
        .rangeBetween(-600L * 1000000L, 0)
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"), unix_micros(col("ts")).as("us"))
        .select(col("user_id"), col("ts"), col("value"),
          count(lit(1)).over(w).as("n_10m"),
          min(col("value")).over(w).as("min_10m"),
          round(sum(col("value").cast("decimal(24,6)")).over(w).cast("double"), 6).as("sum_10m"))
        .orderBy(col("user_id"), col("ts"))
    }),

    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").asc, col("event_id").asc)
      Tables.events(s, dir).filter(col("user_id") < 30)
        .select("event_id", "event_type", "value")
        .withColumn("nt", ntile(7).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .orderBy(col("event_type"), col("value"), col("event_id"))
    }),

    "q_window_groups_frame" -> ((s, dir) => {
      // GROUPS 2 PRECEDING..CURRENT ROW with every EXCLUDE variant,
      // over a coarse (tie-heavy) ordering column
      import graft.ops.GroupsFrame._
      val base = graft.Tables.events(s, dir).filter(col("user_id") < 40)
        .select(col("event_id"), col("event_type"), col("user_id"),
          floor(col("value") / 100.0).cast("long").as("vb"))
      graft.ops.GroupsFrame.groupsAggs(base, Seq("event_type"), "vb", 2, Seq(
        GSum(col("user_id"), NoOthers, "g_sum"),
        GSum(col("user_id"), CurrentRow, "g_sum_xrow"),
        GSum(col("user_id"), Group, "g_sum_xgroup"),
        GSum(col("user_id"), Ties, "g_sum_xties"),
        GCount(NoOthers, "g_cnt")))
        .orderBy(col("event_id"))
    }),

    "q_window_groups_minmax" -> ((s, dir) => {
      // non-decomposable min/max with every EXCLUDE variant (sub-frame
      // composition — GroupsFrame.groupsMinMax)
      import graft.ops.GroupsFrame._
      val base = graft.Tables.events(s, dir).filter(col("user_id") < 40)
        .select(col("event_id"), col("event_type"), col("user_id"),
          floor(col("value") / 100.0).cast("long").as("vb"))
      graft.ops.GroupsFrame.groupsAggs(base, Seq("event_type"), "vb", 2, Seq(
        GMin(col("user_id"), NoOthers, "mn"),
        GMin(col("user_id"), CurrentRow, "mn_xrow"),
        GMin(col("user_id"), Group, "mn_xgroup"),
        GMin(col("user_id"), Ties, "mn_xties"),
        GMax(col("user_id"), CurrentRow, "mx_xrow")))
        .orderBy(col("event_id"))
    }),

    "q_window_groups_general" -> ((s, dir) => {
      // general GROUPS frames (round-3): 1 PRECEDING..1 FOLLOWING with
      // every EXCLUDE mode, plus a 3..1 PRECEDING frame that does not
      // contain the current group (EXCLUDE removes nothing there)
      import graft.ops.GroupsFrame._
      val base = graft.Tables.events(s, dir).filter(col("user_id") < 40)
        .select(col("event_id"), col("event_type"), col("user_id"),
          floor(col("value") / 100.0).cast("long").as("vb"))
      val around = graft.ops.GroupsFrame.groupsAggsFrame(
        base, Seq("event_type"), "vb", -1L, 1L, Seq(
          GSum(col("user_id"), NoOthers, "s_all"),
          GSum(col("user_id"), Group, "s_xgrp"),
          GSum(col("user_id"), Ties, "s_xties"),
          GCount(CurrentRow, "c_xrow"),
          GMin(col("user_id"), Group, "mn_xgrp"),
          GMax(col("user_id"), Ties, "mx_xties"),
          GMin(col("user_id"), CurrentRow, "mn_xrow")))
      graft.ops.GroupsFrame.groupsAggsFrame(
        around, Seq("event_type"), "vb", -3L, -1L, Seq(
          GSum(col("user_id"), Group, "s_prec")))
        .orderBy(col("event_id"))
    }),

    "q_window_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"))
        .withColumn("v300", when(col("value") > 300.0, col("value")))
        .withColumn("first_v", first(col("value")).over(w))
        .withColumn("last_big", last(col("v300"), ignoreNulls = true).over(w))
        .withColumn("third_v", nth_value(col("value"), 3).over(w))
        .orderBy(col("user_id"), col("ts"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT event_id, event_type, value,
        |  CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk
        |FROM (
        |  SELECT event_id, event_type, value,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
        |) WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin,

    "q_window_lead_lag" ->
      """SELECT user_id, ts, value,
        |  lag(value, 1) OVER w AS prev_v,
        |  lead(value, 1) OVER w AS next_v,
        |  lag(value, 2, -1.0) OVER w AS prev2_v
        |FROM events WHERE user_id < 10
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        |ORDER BY user_id, ts""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, ts, value,
        |  count(*) OVER w AS run_n,
        |  round(CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE), 6) AS run_sum,
        |  max(value) OVER w AS run_max
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts""".stripMargin,

    "q_window_stats" ->
      """SELECT user_id, ts, value,
        |  CASE WHEN n > 1 THEN round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) END AS run_stddev,
        |  CASE WHEN n > 1 THEN round((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) END AS run_corr
        |FROM (
        |  SELECT user_id, ts, value,
        |    count(*) OVER w AS n,
        |    CAST(sum(x) OVER w AS DOUBLE) AS sx,
        |    CAST(sum(y) OVER w AS DOUBLE) AS sy,
        |    CAST(sum(x * x) OVER w AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) OVER w AS DOUBLE) AS syy,
        |    CAST(sum(x * y) OVER w AS DOUBLE) AS sxy
        |  FROM (
        |    SELECT user_id, ts, value,
        |      CAST(value AS DECIMAL(8,2)) AS x,
        |      CAST(value * CAST(user_id % 7 + 1 AS DOUBLE) + user_id AS DECIMAL(16,2)) AS y
        |    FROM events WHERE user_id < 20)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |ORDER BY user_id, ts""".stripMargin,

    "q_window_range_time" ->
      """SELECT user_id, ts, value,
        |  count(*) OVER w AS n_10m,
        |  min(value) OVER w AS min_10m,
        |  round(CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE), 6) AS sum_10m
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
        |             RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts""".stripMargin,

    "q_window_ntile" ->
      """SELECT event_id, event_type, value,
        |  CAST(ntile(7) OVER w AS INT) AS nt,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        |ORDER BY event_type, value, event_id""".stripMargin,

    // NOTE: DuckDB has no GROUPS frame mode either, so the oracle is the
    // first-principles construction (dense_rank peer index + integer
    // RANGE frame + exclusion arithmetic); hand-computed semantics are
    // pinned separately in OpsSpec.
    "q_window_groups_frame" ->
      """WITH base AS (
        |  SELECT event_id, event_type, user_id,
        |    CAST(floor(value / 100.0) AS BIGINT) AS vb
        |  FROM events WHERE user_id < 40),
        |g AS (SELECT *, dense_rank() OVER (PARTITION BY event_type ORDER BY vb) AS grp FROM base),
        |f AS (SELECT *,
        |    CAST(sum(user_id) OVER wf AS BIGINT) AS fsum,
        |    count(*) OVER wf AS fcnt,
        |    CAST(sum(user_id) OVER wp AS BIGINT) AS psum,
        |    count(*) OVER wp AS pcnt
        |  FROM g
        |  WINDOW wf AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 2 PRECEDING AND CURRENT ROW),
        |         wp AS (PARTITION BY event_type, vb))
        |SELECT event_id, event_type, user_id, vb,
        |  fsum AS g_sum,
        |  CASE WHEN fcnt - 1 > 0 THEN fsum - user_id END AS g_sum_xrow,
        |  CASE WHEN fcnt - pcnt > 0 THEN fsum - psum END AS g_sum_xgroup,
        |  fsum - psum + user_id AS g_sum_xties,
        |  fcnt AS g_cnt
        |FROM f ORDER BY event_id""".stripMargin,

    "q_window_groups_minmax" ->
      """WITH base AS (
        |  SELECT event_id, event_type, user_id,
        |    CAST(floor(value / 100.0) AS BIGINT) AS vb
        |  FROM events WHERE user_id < 40),
        |g AS (SELECT *, dense_rank() OVER (PARTITION BY event_type ORDER BY vb) AS grp FROM base),
        |f AS (SELECT *,
        |    min(user_id) OVER wf AS fmn,
        |    min(user_id) OVER wprev AS pmn,
        |    max(user_id) OVER wprev AS pmx,
        |    min(user_id) OVER wb AS bmn,
        |    min(user_id) OVER wa AS amn,
        |    max(user_id) OVER wb AS bmx,
        |    max(user_id) OVER wa AS amx
        |  FROM g
        |  WINDOW wf AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 2 PRECEDING AND CURRENT ROW),
        |         wprev AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING),
        |         wb AS (PARTITION BY event_type, vb ORDER BY user_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wa AS (PARTITION BY event_type, vb ORDER BY user_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, event_type, user_id, vb,
        |  fmn AS mn,
        |  least(pmn, bmn, amn) AS mn_xrow,
        |  pmn AS mn_xgroup,
        |  least(pmn, user_id) AS mn_xties,
        |  greatest(pmx, bmx, amx) AS mx_xrow
        |FROM f ORDER BY event_id""".stripMargin,

    "q_window_groups_general" ->
      """WITH base AS (
        |  SELECT event_id, event_type, user_id,
        |    CAST(floor(value / 100.0) AS BIGINT) AS vb
        |  FROM events WHERE user_id < 40),
        |g AS (SELECT *, dense_rank() OVER (PARTITION BY event_type ORDER BY vb) AS grp FROM base),
        |f AS (SELECT *,
        |    CAST(sum(user_id) OVER wf AS BIGINT) AS fsum,
        |    count(*) OVER wf AS fcnt,
        |    CAST(sum(user_id) OVER wp AS BIGINT) AS psum,
        |    count(*) OVER wp AS pcnt,
        |    min(user_id) OVER wprev AS pmn,
        |    min(user_id) OVER wnext AS nmn,
        |    max(user_id) OVER wprev AS pmx,
        |    max(user_id) OVER wnext AS nmx,
        |    min(user_id) OVER wb AS bmn,
        |    min(user_id) OVER wa AS amn,
        |    CAST(sum(user_id) OVER wpre3 AS BIGINT) AS prec_sum
        |  FROM g
        |  WINDOW wf AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING),
        |         wprev AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING),
        |         wnext AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING),
        |         wpre3 AS (PARTITION BY event_type ORDER BY grp RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING),
        |         wp AS (PARTITION BY event_type, vb),
        |         wb AS (PARTITION BY event_type, vb ORDER BY user_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wa AS (PARTITION BY event_type, vb ORDER BY user_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |SELECT event_id, event_type, user_id, vb,
        |  fsum AS s_all,
        |  CASE WHEN fcnt - pcnt > 0 THEN fsum - psum END AS s_xgrp,
        |  fsum - psum + user_id AS s_xties,
        |  fcnt - 1 AS c_xrow,
        |  least(pmn, nmn) AS mn_xgrp,
        |  greatest(pmx, nmx, user_id) AS mx_xties,
        |  least(pmn, nmn, bmn, amn) AS mn_xrow,
        |  prec_sum AS s_prec
        |FROM f ORDER BY event_id""".stripMargin,

    "q_window_first_last" ->
      """SELECT user_id, ts, value,
        |  CASE WHEN value > 300.0 THEN value END AS v300,
        |  first_value(value) OVER w AS first_v,
        |  last_value(CASE WHEN value > 300.0 THEN value END IGNORE NULLS) OVER w AS last_big,
        |  nth_value(value, 3) OVER w AS third_v
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts""".stripMargin
  )
}
