package graft

import graft.sql.QuestSql
import org.apache.spark.sql.functions._

class QuestSqlSpec extends SparkSpec {
  lazy val engine: Engine = Engine(spark, sfDir)

  test("interval literal IN 'yyyy-MM' becomes a half-open range") {
    val n = engine.sql("SELECT count(*) AS n FROM events WHERE ts IN '2024-01'").head().getLong(0)
    val exact = Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-02-01").cast("timestamp")).count()
    assert(n == exact && n > 0)
  }

  test("interval literal precisions: year / day / hour") {
    assert(QuestSql.intervalBounds("2024") == ("2024-01-01 00:00:00", "2025-01-01 00:00:00"))
    assert(QuestSql.intervalBounds("2024-02-29") == ("2024-02-29 00:00:00", "2024-03-01 00:00:00"))
    assert(QuestSql.intervalBounds("2024-01-15T09") == ("2024-01-15 09:00:00", "2024-01-15 10:00:00"))
  }

  test("LATEST ON PARTITION BY matches the LatestOn op") {
    val viaSql = engine.sql(
      "SELECT user_id, ts, event_type FROM events LATEST ON ts PARTITION BY user_id ORDER BY user_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val viaOp = ops.LatestOn.latestOn(Tables.events(spark, sfDir), "ts", Seq("user_id"))
      .orderBy(col("user_id")).select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSql.toSeq == viaOp.toSeq)
  }

  test("LATEST ON applies WHERE before the latest-by") {
    val viaSql = engine.sql(
      "SELECT user_id, value FROM events WHERE value > 400.0 LATEST ON ts PARTITION BY user_id ORDER BY user_id")
      .collect().map(_.getDouble(1))
    assert(viaSql.forall(_ > 400.0))
  }

  test("SAMPLE BY rewrites to a window group-by") {
    val out = engine.sql(
      "SELECT event_type, ts, count(*) AS n FROM events SAMPLE BY 1d ORDER BY event_type, ts")
    val rows = out.collect()
    assert(rows.length > 100) // ~30 days x 5 types
    assert(out.columns.toSeq == Seq("event_type", "ts", "n"))
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("SAMPLE BY FILL(PREV) delegates to the SampleBy op and fills gaps") {
    val out = engine.sql(
      "SELECT event_type, ts, max(value) AS mx FROM events WHERE value > 150.0 SAMPLE BY 6h FILL(PREV)")
    val perType = out.filter(col("event_type") === "click").orderBy(col("ts")).collect()
    // spine is dense: consecutive buckets are exactly 6h apart
    val gaps = perType.sliding(2).forall { w =>
      w(1).getTimestamp(1).getTime - w(0).getTimestamp(1).getTime == 6L * 3600 * 1000
    }
    assert(gaps)
    // PREV fill: no nulls after the first present bucket
    assert(perType.dropWhile(_.isNullAt(2)).forall(!_.isNullAt(2)))
  }

  test("ASOF JOIN ON key delegates to AsofJoin and suffixes clashes") {
    val out = engine.sql("SELECT * FROM p_v ASOF JOIN c_v ON user_id")
    assert(out.columns.contains("ts1") && out.columns.contains("value1"))
    assert(out.count() == spark.table("p_v").count())
    // matched click ts never exceeds the purchase ts
    val bad = out.filter(col("ts1").isNotNull && col("ts1") > col("ts")).count()
    assert(bad == 0)
  }

  test("LT JOIN is strict") {
    val out = engine.sql("SELECT * FROM p_v LT JOIN p_v2 ON user_id")
    assert(out.count() > 0)
  }

  test("WINDOW JOIN dialect form aggregates the slave inside the range") {
    val out = engine.sql(
      "SELECT event_id, count(value1) AS n, max(value1) AS mx FROM p_v WINDOW JOIN c_v2 ON user_id RANGE BETWEEN 10m PRECEDING AND 10m FOLLOWING")
    assert(out.columns.toSeq.sorted == Seq("event_id", "mx", "n", "ts", "user_id", "value").sorted)
    assert(out.count() == spark.table("p_v").count())
  }

  test("HORIZON JOIN dialect form emits one row per offset") {
    val out = engine.sql(
      "SELECT * FROM p_v HORIZON JOIN c_v2 ON user_id LIST (0, 300000000)")
    assert(out.count() == 2 * spark.table("p_v").count())
    assert(out.columns.contains("off_us"))
  }

  test("HORIZON JOIN RANGE FROM/TO/STEP builds the offset grid") {
    val out = engine.sql(
      "SELECT * FROM p_v HORIZON JOIN c_v2 ON user_id RANGE FROM 0s TO 10m STEP 5m")
    assert(out.count() == 3 * spark.table("p_v").count()) // 0, 5m, 10m
    val offs = out.select(col("off_us")).distinct().collect().map(_.getLong(0)).sorted
    assert(offs.toSeq == Seq(0L, 300000000L, 600000000L))
  }

  test("SPLICE JOIN dialect form emits both sides") {
    val out = engine.sql("SELECT * FROM p_v2 SPLICE JOIN c_v2 ON user_id")
    assert(out.count() == spark.table("p_v2").count() + spark.table("c_v2").count())
    assert(out.columns.contains("side"))
  }

  test("negative LIMIT returns the tail in forward order") {
    val rows = engine.sql(
      "SELECT event_id, ts FROM events ORDER BY ts, event_id LIMIT -5").collect()
    assert(rows.length == 5)
    val all = Tables.events(spark, sfDir).orderBy(col("ts").desc, col("event_id").desc)
      .limit(5).orderBy(col("ts"), col("event_id")).collect()
    assert(rows.map(_.getLong(0)).toSeq == all.map(_.getLong(0)).toSeq)
  }

  override def withFixture(test: NoArgTest) = {
    Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value", "event_id").createOrReplaceTempView("p_v")
    Tables.events(spark, sfDir).filter(col("event_type") === "click")
      .select("user_id", "ts", "value").createOrReplaceTempView("c_v")
    Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value").createOrReplaceTempView("p_v2")
    Tables.events(spark, sfDir).filter(col("event_type") === "click")
      .select("user_id", "ts", "value").createOrReplaceTempView("c_v2")
    super.withFixture(test)
  }
}
