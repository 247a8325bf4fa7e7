package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** COPY import/export (reference `cutlass/text/` CSV pipeline +
  * `CopyExportFactory`): Spark's csv source with schema inference plays
  * the importer; csv/parquet writers play `/exp` and `COPY TO`.
  */
class CopySpec extends SparkSpec {
  import spark.implicits._

  test("CSV export → import round-trip with type inference") {
    val dir = Files.createTempDirectory("copy_csv").toString
    val src = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    src.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(dir)

    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(dir)
    assert(back.count() == src.count())
    assert(back.schema("event_id").dataType.typeName == "integer" ||
      back.schema("event_id").dataType.typeName == "long")
    assert(back.schema("value").dataType.typeName == "double")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    // values survive: compare summed cents
    val a = src.agg(sum(($"value" * 100).cast("long"))).head().getLong(0)
    val b = back.agg(sum((col("value") * 100).cast("long"))).head().getLong(0)
    assert(a == b)
  }

  test("parquet export preserves exact values (COPY TO parquet)") {
    val dir = Files.createTempDirectory("copy_parq").toString
    val src = Tables.load(spark, sfDir, "lineitem").limit(1000)
    src.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }
}
