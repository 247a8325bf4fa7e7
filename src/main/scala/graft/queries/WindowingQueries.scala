package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Tumbling is SAMPLE BY's domain (TimeSeriesQueries); these cover the
  * windowing superset the reference lacks natively (SURVEY §2.9 —
  * "sliding/session windows absent; Spark superset"): session windows
  * via `session_window`, sliding via overlapping `window()` buckets.
  * Oracles rebuild both from first principles (gap-detection cumsum /
  * bucket explosion).
  */
object WindowingQueries extends QueryPack {

  def queries: Map[String, Fn] = Map(
    "q_session_window" -> ((s, dir) => {
      // sessions per user with a 30-minute inactivity gap
      Tables.events(s, dir).filter(col("user_id") < 40)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), sumDec(col("value")).as("sum_v"))
        .select(col("user_id"),
          col("session_window.start").as("s_start"),
          col("n"), col("sum_v"))
        .orderBy(col("user_id"), col("s_start"))
    }),

    "q_sliding_window" -> ((s, dir) => {
      // 1h windows sliding every 30m: each row lands in 2 buckets
      Tables.events(s, dir).filter(col("user_id") < 40)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").getField("start").as("w_start"))
        .agg(count(lit(1)).as("n"), max(col("value")).as("max_v"))
        .orderBy(col("w_start"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_session_window" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events WHERE user_id < 40
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (
         |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT user_id, min(ts) AS s_start, count(*) AS n,
         |  ${sumDecSql("value")} AS sum_v
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, s_start""".stripMargin,

    "q_sliding_window" ->
      """WITH b AS (
        |  SELECT value, unnest([
        |    time_bucket(INTERVAL 30 MINUTES, ts, TIMESTAMP '1970-01-01'),
        |    time_bucket(INTERVAL 30 MINUTES, ts, TIMESTAMP '1970-01-01') - INTERVAL 30 MINUTES
        |  ]) AS w_start
        |  FROM events WHERE user_id < 40)
        |SELECT w_start, count(*) AS n, max(value) AS max_v
        |FROM b GROUP BY w_start ORDER BY w_start""".stripMargin
  )
}
