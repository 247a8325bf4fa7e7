package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata/catalog table functions (reference `tables()`,
  * `table_columns()`, `table_partitions()`, `table_storage()` —
  * SURVEY §2.1): small DataFrames over `spark.catalog` and the
  * warehouse directory layout.
  */
object Catalog {
  import scala.jdk.CollectionConverters._

  /** tables() — registered tables/views. */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq
      .map(t => (t.name, t.tableType, t.isTemporary))
      .toDF("table_name", "table_type", "is_temporary")
  }

  /** table_columns(t) — name/type/nullability + designated-ts flag. */
  def tableColumns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val designated = Tables.designatedTs.get(table)
    spark.table(table).schema.fields.toSeq.map { f =>
      (f.name, f.dataType.simpleString, f.nullable, designated.contains(f.name))
    }.toDF("column", "type", "nullable", "designated")
  }

  /** table_partitions(dir) — day partitions of an ingest table with
    * file counts and sizes.
    */
  def tablePartitions(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val dirs = Option(new java.io.File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.contains("="))
    dirs.toSeq.map { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      (d.getName.split("=").last, files.length.toLong, files.map(_.length()).sum)
    }.toDF("partition", "num_files", "bytes")
      .orderBy(col("partition"))
  }
}
