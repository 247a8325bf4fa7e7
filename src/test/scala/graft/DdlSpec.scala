package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DDL/DML statement surface of the dialect: CREATE TABLE AS, INSERT
  * INTO SELECT/VALUES, DROP/RENAME/TRUNCATE TABLE, COPY FROM/TO
  * (reference SqlCompilerImpl statements + cutlass text import).
  */
class DdlSpec extends SparkSpec {
  lazy val engine: Engine = Engine(spark, sfDir)

  test("CREATE TABLE AS with TIMESTAMP() registers view and designated ts") {
    engine.sql("CREATE TABLE big_events AS (SELECT * FROM events WHERE value > 100.0) TIMESTAMP(ts) PARTITION BY DAY")
    val n = spark.table("big_events").count()
    assert(n > 0 && n < Tables.events(spark, sfDir).count())
    // the designated ts reached the registry → ASOF resolves it
    val out = engine.sql("SELECT * FROM big_events ASOF JOIN big_events ON user_id")
    assert(out.count() == n)
  }

  test("CREATE TABLE AS bare SELECT") {
    engine.sql("CREATE TABLE ev_copy AS SELECT event_id, value FROM events LIMIT 10")
    assert(spark.table("ev_copy").count() == 10)
  }

  test("INSERT INTO SELECT and VALUES append; counts returned") {
    engine.sql("CREATE TABLE ins_t AS SELECT event_id, value FROM events LIMIT 5")
    val n1 = engine.sql("INSERT INTO ins_t SELECT event_id, value FROM events LIMIT 3")
      .head().getLong(0)
    assert(n1 == 3 && spark.table("ins_t").count() == 8)
    val n2 = engine.sql("INSERT INTO ins_t VALUES (9999, 1.5), (10000, 2.5)").head().getLong(0)
    assert(n2 == 2 && spark.table("ins_t").count() == 10)
    assert(spark.table("ins_t").filter(col("event_id") === 9999).head().getDouble(1) == 1.5)
  }

  test("RENAME moves the designated-ts registration; DROP removes; TRUNCATE empties") {
    engine.sql("CREATE TABLE r1_t AS (SELECT * FROM events LIMIT 20) TIMESTAMP(ts)")
    engine.sql("RENAME TABLE r1_t TO r2_t")
    assert(spark.table("r2_t").count() == 20)
    assert(intercept[Exception](spark.table("r1_t")) != null)
    assert(engine.sql("SELECT * FROM r2_t ASOF JOIN r2_t ON user_id").count() == 20)
    engine.sql("TRUNCATE TABLE r2_t")
    assert(spark.table("r2_t").count() == 0)
    engine.sql("DROP TABLE r2_t")
    assert(intercept[Exception](spark.table("r2_t")) != null)
  }

  test("COPY TO csv then COPY FROM round-trips") {
    val dir = Files.createTempDirectory("ddl_copy").toString + "/out"
    val exported = engine.sql(
      s"COPY (SELECT event_id, ts, value FROM events WHERE event_id < 100) TO '$dir' WITH FORMAT csv")
      .head().getLong(0)
    assert(exported > 0)
    val imported = engine.sql(s"COPY ev_csv FROM '$dir'").head().getLong(0)
    assert(imported == exported)
    assert(spark.table("ev_csv").schema("value").dataType.typeName == "double")
  }

  test("EXPLAIN returns one PLAN row per line, dialect forms included") {
    val rows = engine.sql("EXPLAIN SELECT * FROM events ASOF JOIN events ON user_id")
      .collect().map(_.getString(0))
    assert(rows.exists(_.contains("AsOfJoin")))
    val simple = engine.sql("EXPLAIN SELECT count(*) FROM events WHERE value > 100.0")
      .collect().map(_.getString(0))
    assert(simple.exists(_.contains("HashAggregate")))
  }

  test("COPY table TO parquet") {
    val dir = Files.createTempDirectory("ddl_copy_p").toString + "/out"
    engine.sql("CREATE TABLE pq_t AS SELECT event_id, value FROM events LIMIT 50")
    val n = engine.sql(s"COPY pq_t TO '$dir'").head().getLong(0)
    assert(n == 50 && spark.read.parquet(dir).count() == 50)
  }

  test("CHECKPOINT CREATE/RELEASE snapshots registered tables; restore recovers state") {
    val ckptRoot = Files.createTempDirectory("graft_ckpt_spec").toString
    spark.conf.set("graft.checkpoint.dir", ckptRoot)
    try {
      engine.sql("SELECT 1") // force table registration
      // nothing in progress initially
      val st0 = engine.sql("SELECT * FROM checkpoint_status()").head()
      assert(!st0.getBoolean(0) && st0.isNullAt(1))
      val dir = engine.sql("CHECKPOINT CREATE").head().getString(0)
      assert(dir.startsWith(ckptRoot))
      // snapshot contains the events table's parquet, hard-linked
      assert(new java.io.File(s"$dir/events").exists() ||
        new java.io.File(s"$dir/events").isFile)
      assert(new java.io.File(s"$dir/manifest.json").isFile)
      // in-progress gate: second CREATE errors, status reports it
      val st1 = engine.sql("SELECT * FROM checkpoint_status()").head()
      assert(st1.getBoolean(0) && !st1.isNullAt(1))
      intercept[Exception](engine.sql("CHECKPOINT CREATE"))
      engine.sql("CHECKPOINT RELEASE")
      assert(!engine.sql("SELECT * FROM checkpoint_status()").head().getBoolean(0))
      // legacy grammar
      engine.sql("SNAPSHOT PREPARE")
      engine.sql("SNAPSHOT COMPLETE")
      // restore: snapshot survives a destructive change to the live view
      val before = spark.table("events").count()
      engine.sql("CREATE TABLE events AS SELECT * FROM events LIMIT 1")
      val restored = graft.ops.Checkpoint.restore(spark, dir)
      assert(restored.contains("events"))
      assert(spark.table("events").count() == before)
      Tables.forgetRegistration(spark)
      Tables.registerAll(spark, sfDir) // put the real views back for later suites
    } finally spark.conf.unset("graft.checkpoint.dir")
  }
}
