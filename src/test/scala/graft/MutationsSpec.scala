package graft

import graft.ops.Mutations
import graft.streaming.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("mut").toString + "/t"
    Seq(
      ("A", 10.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("B", 20.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      ("C", 30.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
    ).toDF("sym", "price", "ts").write.parquet(dir)
    dir
  }

  test("UPDATE ... WHERE rewrites matching rows only") {
    val dir = freshTable()
    val n = Mutations.updateWhere(spark, dir, col("sym") === "B",
      Map("price" -> (col("price") * 2)))
    assert(n == 1)
    val out = spark.read.parquet(dir).orderBy($"sym")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("A", 10.0), ("B", 40.0), ("C", 30.0)))
  }

  test("UPDATE ... FROM join-update: matched rows take source values, others untouched") {
    val dir = freshTable()
    // duplicate source row for A exercises the dedup-on-keys contract
    val src = Seq(("A", 5.0), ("A", 5.0), ("B", 7.0), ("Z", 9.9)).toDF("sym", "adj")
    val n = Mutations.updateFrom(spark, dir, src, Seq("sym"),
      Map("price" -> (col("price") + col("adj"))))
    assert(n == 2) // A and B matched; Z has no target row
    val out = spark.read.parquet(dir).orderBy($"sym")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("A", 15.0), ("B", 27.0), ("C", 30.0)))
  }

  test("UPDATE ... FROM suffixes clashing source columns and honours the extra predicate") {
    val dir = freshTable()
    val src = Seq(("A", 100.0), ("C", 300.0)).toDF("sym", "price")
    val n = Mutations.updateFrom(spark, dir, src, Seq("sym"),
      Map("price" -> col("price_src")), where = col("price") < 25.0)
    assert(n == 1) // only A passes the predicate (10 < 25); C's 30 does not
    val out = spark.read.parquet(dir).orderBy($"sym")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("A", 100.0), ("B", 20.0), ("C", 30.0)))
  }

  test("DELETE ... WHERE removes matching rows; TRUNCATE empties but keeps schema") {
    val dir = freshTable()
    assert(Mutations.deleteWhere(spark, dir, col("price") >= 20.0) == 2)
    assert(spark.read.parquet(dir).count() == 1)
    Mutations.truncate(spark, dir)
    val t = spark.read.parquet(dir)
    assert(t.count() == 0 && t.columns.toSeq == Seq("sym", "price", "ts"))
  }

  test("ALTER: add / rename / drop / retype columns") {
    val dir = freshTable()
    Mutations.addColumn(spark, dir, "fee", col("price") * 0.01)
    Mutations.renameColumn(spark, dir, "sym", "symbol")
    Mutations.alterColumnType(spark, dir, "price", "decimal(10,2)")
    val df = spark.read.parquet(dir)
    assert(df.columns.toSeq == Seq("symbol", "price", "ts", "fee"))
    assert(df.schema("price").dataType.typeName.startsWith("decimal"))
    Mutations.dropColumn(spark, dir, "fee")
    assert(spark.read.parquet(dir).columns.toSeq == Seq("symbol", "price", "ts"))
  }

  test("partition lifecycle: DROP / DETACH / ATTACH at partition granularity, no rewrite") {
    val dir = Files.createTempDirectory("part").toString + "/t"
    Ingest.applyBatch(
      (1 to 4).map(d => (s"S$d", java.sql.Timestamp.valueOf(f"2024-01-0$d%d 05:00:00")))
        .toDF("sym", "ts"),
      0L, dir, "ts", Nil)
    assert(Mutations.listPartitions(dir) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))

    // detach hides from scans but keeps bytes on disk
    assert(Mutations.detachPartitions(dir, Seq("2024-01-02")) == 1)
    assert(Mutations.listPartitions(dir) == Seq("2024-01-01", "2024-01-03", "2024-01-04"))
    assert(spark.read.parquet(dir).count() == 3)
    // catalog lists the detached partition, flagged (reference SHOW PARTITIONS)
    val parts = Catalog.tablePartitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(parts("2024-01-02") == false && parts("2024-01-01") == true)

    // re-attach restores the rows exactly
    assert(Mutations.attachPartitions(dir, Seq("2024-01-02")) == 1)
    assert(spark.read.parquet(dir).select("sym").as[String].collect().sorted.toSeq ==
      Seq("S1", "S2", "S3", "S4"))

    // boundary drop (retention): everything strictly before the 3rd
    assert(Mutations.dropPartitionsWhere(dir, "<", "2024-01-03") == 2)
    assert(Mutations.listPartitions(dir) == Seq("2024-01-03", "2024-01-04"))
    assert(spark.read.parquet(dir).count() == 2)

    // LIST drop + idempotence (missing partitions count 0)
    assert(Mutations.dropPartitions(dir, Seq("2024-01-04", "2024-01-09")) == 1)
    assert(Mutations.listPartitions(dir) == Seq("2024-01-03"))

    // VACUUM: first pass reclaims the ingest staging dir; detached
    // partitions survive unless explicitly purged
    assert(Mutations.vacuum(dir) == 1) // _graft_staging leftover
    assert(Mutations.vacuum(dir) == 0) // idempotent
    assert(Mutations.detachPartitions(dir, Seq("2024-01-03")) == 1)
    assert(Mutations.vacuum(dir) == 0) // detached kept by default
    assert(Mutations.vacuum(dir, purgeDetached = true) == 1)
    assert(Mutations.attachPartitions(dir, Seq("2024-01-03")) == 0) // gone

    // partition names are path segments built from user SQL — anything
    // that isn't a literal ISO day is rejected before touching the fs
    for (evil <- Seq("2024-01-01/../..", "../../etc", "2024-01-01x", ""))
      intercept[IllegalArgumentException](Mutations.dropPartitions(dir, Seq(evil)))
    intercept[IllegalArgumentException](Mutations.detachPartitions(dir, Seq("a/b")))
    intercept[IllegalArgumentException](Mutations.attachPartitions(dir, Seq("a/b")))
  }

  test("catalog functions: tables / table_columns / table_partitions") {
    Tables.registerAll(spark, sfDir)
    val ts = Catalog.tables(spark)
    assert(ts.filter($"table_name" === "events").count() == 1)
    val cols = Catalog.tableColumns(spark, "events").collect()
    assert(cols.exists(r => r.getString(0) == "ts" && r.getAs[Boolean]("designated")))
    // partition listing over an ingest table
    val dir = Files.createTempDirectory("cat").toString + "/t"
    Ingest.applyBatch(
      Seq(("A", java.sql.Timestamp.valueOf("2024-01-01 05:00:00")),
        ("B", java.sql.Timestamp.valueOf("2024-01-02 05:00:00"))).toDF("sym", "ts"),
      0L, dir, "ts", Nil)
    val parts = Catalog.tablePartitions(spark, dir).collect()
    assert(parts.length == 2 && parts.forall(_.getLong(1) >= 1))
  }
}
