package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DML over plain-parquet tables (reference UPDATE / DELETE / TRUNCATE,
  * `griffin/UpdateOperatorImpl.java`): copy-on-write partition rewrite —
  * the same mechanism Delta's UPDATE/DELETE uses, minus the txn log.
  * With day-partitioned tables the rewrite touches only partitions that
  * contain matching rows (partition pruning applies to the read side).
  */
object Mutations {

  /** UPDATE tableDir SET assignments WHERE cond. Rewrites in place;
    * returns the number of updated rows.
    */
  def updateWhere(spark: SparkSession, tableDir: String,
                  cond: Column, assignments: Map[String, Column]): Long = {
    val df = spark.read.parquet(tableDir)
    val nUpdated = df.filter(cond).count()
    if (nUpdated == 0) return 0
    // write straight to the __tmp sibling — the read side stays the
    // live directory, so no persist/materialize pass is needed before
    // the copy-on-write swap (one table pass instead of two)
    val updated = assignments.foldLeft(df) { case (d, (c, e)) =>
      d.withColumn(c, when(cond, e).otherwise(col(c)))
    }
    updated.write.mode("overwrite").parquet(tableDir + "__tmp")
    swap(tableDir)
    nUpdated
  }

  /** UPDATE t SET ... FROM source — join-update (reference
    * `griffin/UpdateOperatorImpl.java` with a joined virtual record):
    * table rows matching a source row on `joinKeys` (and the optional
    * extra predicate) get `assignments` evaluated in the joined scope,
    * where source columns are visible under their own names — suffixed
    * `_src` when they clash with table columns. Source rows are
    * de-duplicated on the join keys first so an update target matches at
    * most one source row. Returns the updated-row count.
    *
    * Plan shape: one left join (broadcast when the source is small —
    * the optimizer's stats decide), then the same copy-on-write swap as
    * [[updateWhere]]; only one pass over the table.
    */
  def updateFrom(spark: SparkSession, tableDir: String,
                 source: DataFrame, joinKeys: Seq[String],
                 assignments: Map[String, Column],
                 where: Column = lit(true)): Long = {
    val df = spark.read.parquet(tableDir)
    val MATCHED = "__graft_matched"
    val src = source.dropDuplicates(joinKeys)
    val renamed = src.columns.filterNot(joinKeys.contains).foldLeft(src) { (d, c) =>
      if (df.columns.contains(c)) d.withColumnRenamed(c, c + "_src") else d
    }.withColumn(MATCHED, lit(true))
    val joined = df.join(renamed, joinKeys, "left")
    val hit = col(MATCHED) && where
    val nUpdated = joined.filter(hit).count()
    if (nUpdated == 0) return 0
    val updated = assignments.foldLeft(joined) { case (d, (c, e)) =>
      d.withColumn(c, when(hit, e).otherwise(col(c)))
    }.select(df.columns.map(col): _*)
    // see updateWhere: __tmp write needs no pre-materialization
    updated.write.mode("overwrite").parquet(tableDir + "__tmp")
    swap(tableDir)
    nUpdated
  }

  /** DELETE FROM tableDir WHERE cond; returns deleted count. */
  def deleteWhere(spark: SparkSession, tableDir: String, cond: Column): Long = {
    val df = spark.read.parquet(tableDir)
    val n = df.filter(cond).count()
    if (n == 0) return 0
    val kept = df.filter(!cond)
    kept.write.mode("overwrite").parquet(tableDir + "__tmp")
    swap(tableDir)
    n
  }

  /** ALTER TABLE ADD COLUMN (with a default/derived expression). */
  def addColumn(spark: SparkSession, tableDir: String, name: String, value: Column): Unit =
    rewrite(spark, tableDir)(_.withColumn(name, value))

  /** ALTER TABLE RENAME COLUMN. */
  def renameColumn(spark: SparkSession, tableDir: String, from: String, to: String): Unit =
    rewrite(spark, tableDir)(_.withColumnRenamed(from, to))

  /** ALTER TABLE DROP COLUMN. */
  def dropColumn(spark: SparkSession, tableDir: String, name: String): Unit =
    rewrite(spark, tableDir)(_.drop(name))

  /** ALTER ... ALTER COLUMN TYPE (reference ConvertOperatorImpl). A
    * value outside the narrower type's range converts to NULL (the
    * reference's overflow behavior), not Spark's saturating cast. */
  def alterColumnType(spark: SparkSession, tableDir: String, name: String, newType: String): Unit =
    rewrite(spark, tableDir) { df =>
      val c = col(name)
      def ranged(lo: Double, hi: Double) =
        when(c.cast("double").between(lo, hi), c.cast(newType))
      val casted = newType.toLowerCase match {
        case "int" | "integer" => ranged(Int.MinValue.toDouble, Int.MaxValue.toDouble)
        case "smallint" => ranged(Short.MinValue.toDouble, Short.MaxValue.toDouble)
        case "tinyint" => ranged(Byte.MinValue.toDouble, Byte.MaxValue.toDouble)
        case "bigint" => ranged(Long.MinValue.toDouble, Long.MaxValue.toDouble)
        case _ => c.cast(newType)
      }
      df.withColumn(name, casted)
    }

  private def rewrite(spark: SparkSession, tableDir: String)(f: DataFrame => DataFrame): Unit = {
    f(spark.read.parquet(tableDir))
      .write.mode("overwrite").parquet(tableDir + "__tmp")
    swap(tableDir)
  }

  /** TRUNCATE. */
  def truncate(spark: SparkSession, tableDir: String): Unit = {
    val df = spark.read.parquet(tableDir)
    df.limit(0).write.mode("overwrite").parquet(tableDir + "__tmp")
    swap(tableDir)
  }

  // ---- partition lifecycle (reference ALTER TABLE ... DROP/DETACH/
  // ATTACH PARTITION — `AlterOperation.java`, TableWriter detach:
  // partition-granular directory moves, never a data rewrite; the 100 TB
  // retention/archival path where O(partition) beats O(table)) ----------

  private val DetachedPrefix = "_detached_" // '_' prefix hides it from readers

  // day names come from user SQL and become path segments — reject
  // anything but a literal ISO day so '2024-01-01/../..' can't escape
  // the table directory
  private val DayName = "\\d{4}-\\d{2}-\\d{2}".r
  private def requireDay(day: String): Unit =
    if (!DayName.matches(day))
      throw new IllegalArgumentException(s"bad partition name '$day' (expected yyyy-MM-dd)")

  // recursive delete; listFiles() can return null if the directory
  // vanishes mid-walk (concurrent vacuum/drop) — treat as already gone
  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
  }

  /** Day partitions currently attached (visible to scans). */
  def listPartitions(tableDir: String): Seq[String] =
    Option(new java.io.File(tableDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("__day="))
      .map(_.getName.stripPrefix("__day=")).sorted.toSeq

  /** ALTER TABLE ... DROP PARTITION LIST 'day', ... — deletes the
    * partition directories outright. Returns partitions dropped.
    */
  def dropPartitions(tableDir: String, days: Seq[String]): Int =
    days.count { day =>
      requireDay(day)
      val dir = new java.io.File(tableDir, s"__day=$day")
      dir.isDirectory && { rmTree(dir); true }
    }

  /** DROP PARTITION WHERE <day op bound> — boundary form over the day
    * key (reference `WHERE timestamp < ...`); ISO day names compare
    * lexicographically = chronologically.
    */
  def dropPartitionsWhere(tableDir: String, op: String, day: String): Int = {
    val hit: String => Boolean = op match {
      case "<" => _ < day
      case "<=" => _ <= day
      case ">" => _ > day
      case ">=" => _ >= day
      case "=" => _ == day
      case other => throw new IllegalArgumentException(s"bad partition predicate '$other'")
    }
    dropPartitions(tableDir, listPartitions(tableDir).filter(hit))
  }

  /** DETACH PARTITION LIST — move the directory behind a reader-hidden
    * prefix; data stays on disk for re-attach or archival. O(1) per
    * partition (a rename), no scan.
    */
  def detachPartitions(tableDir: String, days: Seq[String]): Int =
    days.count { day =>
      requireDay(day)
      val from = new java.io.File(tableDir, s"__day=$day")
      from.isDirectory &&
        from.renameTo(new java.io.File(tableDir, s"$DetachedPrefix$day"))
    }

  /** ATTACH PARTITION LIST — restore previously detached partitions. */
  def attachPartitions(tableDir: String, days: Seq[String]): Int =
    days.count { day =>
      requireDay(day)
      val from = new java.io.File(tableDir, s"$DetachedPrefix$day")
      from.isDirectory &&
        from.renameTo(new java.io.File(tableDir, s"__day=$day"))
    }

  /** VACUUM TABLE (reference `VacuumOperation` — reclaim space held by
    * superseded files): removes crashed-rewrite `__tmp` siblings, stale
    * ingest staging directories, and (opt-in) detached partitions.
    * Returns the number of directories reclaimed. Never touches live
    * partitions — safe to run concurrently with readers.
    */
  def vacuum(tableDir: String, purgeDetached: Boolean = false): Int = {
    var n = 0
    val tmp = new java.io.File(tableDir + "__tmp")
    if (tmp.exists()) { rmTree(tmp); n += 1 }
    val table = new java.io.File(tableDir)
    Option(table.listFiles()).getOrElse(Array.empty).foreach { f =>
      val stale = f.getName == "_graft_staging" ||
        (purgeDetached && f.getName.startsWith(DetachedPrefix))
      if (stale && f.isDirectory) { rmTree(f); n += 1 }
    }
    n
  }

  private def swap(tableDir: String): Unit = {
    val dir = new java.io.File(tableDir)
    val tmp = new java.io.File(tableDir + "__tmp")
    rmTree(dir)
    tmp.renameTo(dir)
  }
}
