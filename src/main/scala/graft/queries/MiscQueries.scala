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

    "q_bar" -> ((s, dir) => {
      // reference str/bar: unicode bar chart of a value
      Tables.events(s, dir).filter(col("event_id") < 200)
        .select(col("event_id"),
          expr("repeat('#', CAST(floor(value / 50.0) AS INT))").as("bar"),
          expr("repeat('█', CAST(floor(value / 100.0) AS INT))").as("ubar"))
        .orderBy(col("event_id"))
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

    "q_bar" ->
      """SELECT event_id,
        |  repeat('#', CAST(floor(value / 50.0) AS INT)) AS bar,
        |  repeat('█', CAST(floor(value / 100.0) AS INT)) AS ubar
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    "q_uuid" ->
      """SELECT event_id,
        |  substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-4' || substring(h, 14, 3)
        |    || '-8' || substring(h, 18, 3) || '-' || substring(h, 21, 12) AS uuid
        |FROM (SELECT event_id, md5('uuid' || CAST(event_id AS VARCHAR)) AS h
        |      FROM events WHERE event_id < 200)
        |ORDER BY event_id""".stripMargin
  )
}
