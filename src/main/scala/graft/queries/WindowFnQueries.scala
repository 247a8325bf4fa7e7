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
        .select("user_id", "ts", "value")
        .withColumn("run_n", count(lit(1)).over(w))
        .withColumn("run_sum", sum(col("value").cast("decimal(24,6)")).over(w).cast("decimal(38,6)"))
        .withColumn("run_max", max(col("value")).over(w))
        .orderBy(col("user_id"), col("ts"))
    }),

    "q_window_range_time" -> ((s, dir) => {
      // RANGE '10m' PRECEDING over the designated ts (time-interval frame)
      val w = Window.partitionBy(col("user_id")).orderBy(col("us").asc)
        .rangeBetween(-600L * 1000000L, 0)
      Tables.events(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("n_10m", count(lit(1)).over(w))
        .withColumn("min_10m", min(col("value")).over(w))
        .withColumn("sum_10m", sum(col("value").cast("decimal(24,6)")).over(w).cast("decimal(38,6)"))
        .drop("us")
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
        |  CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DECIMAL(38,6)) AS run_sum,
        |  max(value) OVER w AS run_max
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts""".stripMargin,

    "q_window_range_time" ->
      """SELECT user_id, ts, value,
        |  count(*) OVER w AS n_10m,
        |  min(value) OVER w AS min_10m,
        |  CAST(sum(CAST(value AS DECIMAL(24,6))) OVER w AS DECIMAL(38,6)) AS sum_10m
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
