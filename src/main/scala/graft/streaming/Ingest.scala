package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming ingest pipeline — the Spark re-expression of the
  * reference's WAL write path (`WalWriter` → sequencer →
  * `ApplyWal2TableJob`: O3 merge, dedup, partition roll — SURVEY §3.3):
  * the micro-batch IS the WAL transaction; `applyBatch` is the apply
  * job. Durable format: time-partitioned Parquet, rows sorted by the
  * designated ts within each written file (the reference's storage
  * invariant, which keeps asof/sample-by scans merge-friendly).
  */
object Ingest {

  /** ILP lines → semi-structured DataFrame (schema-evolving: field maps
    * per type, so new fields never break the stream — projection to a
    * typed table happens per measurement downstream).
    */
  def parseIlp(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap { l =>
      IlpParser.parse(l).map { p =>
        (
          p.measurement,
          p.tags,
          p.fields.collect { case (k, IlpParser.F64(v)) => k -> v },
          p.fields.collect { case (k, IlpParser.I64(v)) => k -> v },
          p.fields.collect { case (k, IlpParser.Str(v)) => k -> v },
          p.fields.collect { case (k, IlpParser.Bool(v)) => k -> v },
          p.tsNanos.getOrElse(-1L))
      }
    }.toDF("measurement", "tags", "f_double", "f_long", "f_string", "f_bool", "ts_nanos")
      .withColumn("ts",
        when(col("ts_nanos") >= 0, timestamp_micros(expr("ts_nanos div 1000"))))
      // full wire precision survives as BIGINT nanos (reference keeps a
      // TIMESTAMP_NS designated column; Spark's TimestampType is micros)
      .withColumn("ts_ns", when(col("ts_nanos") >= 0, col("ts_nanos")))
      .drop("ts_nanos")
  }

  private def batchMarker(tableDir: String, batchId: Long): java.io.File = {
    val fs = new java.io.File(s"$tableDir/_graft_batches")
    fs.mkdirs()
    new java.io.File(fs, s"batch-$batchId")
  }

  private def stagingDir(tableDir: String, batchId: Long): java.io.File =
    new java.io.File(s"$tableDir/_graft_staging/batch-$batchId")

  private def deleteRecursive(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursive)
    f.delete()
  }

  /** Move staged `__day=*` partition files into the table under
    * batch-stamped deterministic names. Idempotent: leftovers of an
    * earlier crashed publish of the same batch are removed first, so
    * re-running after any crash converges to exactly one copy.
    */
  private def publishStaged(staging: java.io.File, tableDir: String, batchId: Long): Unit = {
    val parts = Option(staging.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("__day="))
    parts.foreach { p =>
      val target = new java.io.File(tableDir, p.getName)
      target.mkdirs()
      Option(target.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(s"graft-b$batchId-")).foreach(_.delete())
      p.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            new java.io.File(target, s"graft-b$batchId-$i.parquet").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
    }
  }

  // ---- dirty-range tracking (consumed by MatView.refresh) -----------
  // The reference's mat-view refresh walks WAL txn ranges to find which
  // time buckets a transaction touched (`WalTxnRangeLoader.java`); the
  // parquet-table analogue is a marker file per day partition touched
  // since the last refresh. O(partitions-touched), no data scan.

  private def dirtyDir(tableDir: String): java.io.File =
    new java.io.File(s"$tableDir/_graft_dirty")

  private[streaming] def markDirty(tableDir: String, days: Iterable[String]): Unit = {
    val d = dirtyDir(tableDir); d.mkdirs()
    days.foreach(day => new java.io.File(d, day).createNewFile())
  }

  /** Days with unconsumed changes, as `yyyy-MM-dd` strings. */
  def dirtyDays(tableDir: String): Seq[String] =
    Option(dirtyDir(tableDir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).sorted.toSeq

  /** Consume markers once a refresh has incorporated them. */
  def clearDirty(tableDir: String, days: Seq[String]): Unit =
    days.foreach(day => new java.io.File(dirtyDir(tableDir), day).delete())

  /** Apply one micro-batch to a table directory:
    *  1. idempotency guard (batch marker),
    *  2. DEDUP UPSERT KEYS(ts, keys...) within the batch,
    *  3. sort by ts within day partitions (O3 merge-on-write analogue),
    *  4. stage to `_graft_staging/batch-<id>`, then publish with
    *     batch-stamped file names (exactly-once under retries: a crash
    *     anywhere — mid-stage, mid-publish, or between publish and
    *     marker — converges on replay because staging is overwritten and
    *     the publish step first removes this batch's earlier files).
    * Late (out-of-order) rows land in their own (older) day partition —
    * nothing is dropped, matching the reference's O3 semantics.
    */
  def applyBatch(batch: DataFrame, batchId: Long, tableDir: String,
                 tsCol: String, dedupKeys: Seq[String]): Unit = {
    val marker = batchMarker(tableDir, batchId)
    if (marker.exists()) return // retried batch — already applied

    val deduped =
      if (dedupKeys.isEmpty) batch
      else batch.dropDuplicates(tsCol +: dedupKeys)
    val staging = stagingDir(tableDir, batchId)
    deduped
      .withColumn("__day", to_date(col(tsCol)))
      .repartition(col("__day"))
      .sortWithinPartitions(col("__day"), col(tsCol))
      .write.mode("overwrite").partitionBy("__day").parquet(staging.getPath)
    val touched = Option(staging.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("__day="))
      .map(_.getName.stripPrefix("__day="))
    publishStaged(staging, tableDir, batchId)
    markDirty(tableDir, touched)
    marker.createNewFile()
    deleteRecursive(staging)
  }

  /** Cross-batch DEDUP UPSERT KEYS(ts, keys...): the reference dedups an
    * incoming txn against rows already IN the table
    * (`cairo/TableWriter.java:342`, `dedup.cpp`). Spark analogue of a
    * Delta MERGE on plain parquet: read only the day partitions the
    * batch touches, anti-join out clashing old rows, rewrite those
    * partitions with old+new merged and re-sorted. Cost is bounded by
    * the touched partitions, not the table.
    *
    * Crash safety: the merged partitions are checkpointed to
    * `_graft_staging/batch-<id>` (with Spark's `_SUCCESS` marker)
    * BEFORE the dynamic partition overwrite, so the overwrite never
    * recomputes from inputs it is deleting; a retry after a crash
    * mid-overwrite re-publishes the durable staged copy rather than
    * re-merging partially-replaced partitions. (Atomicity across the
    * overwrite's own commit is the file committer's; a transactional
    * table format would close that last window.)
    */
  def upsertBatch(batch: DataFrame, batchId: Long, tableDir: String,
                  tsCol: String, dedupKeys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val marker = batchMarker(tableDir, batchId)
    if (marker.exists()) return

    val incoming = batch.dropDuplicates(tsCol +: dedupKeys)
      .withColumn("__day", to_date(col(tsCol)))
    val days = incoming.select(col("__day")).distinct()
      .collect().map(_.get(0).toString) // bounded: distinct days in one batch
    val existingDirs = days.map(d => s"$tableDir/__day=$d")
      .filter(p => new java.io.File(p).exists())

    if (existingDirs.isEmpty) {
      val staging = stagingDir(tableDir, batchId)
      incoming.repartition(col("__day"))
        .sortWithinPartitions(col("__day"), col(tsCol))
        .write.mode("overwrite").partitionBy("__day").parquet(staging.getPath)
      publishStaged(staging, tableDir, batchId)
      markDirty(tableDir, days)
      marker.createNewFile()
      deleteRecursive(staging)
    } else {
      val staging = stagingDir(tableDir, batchId)
      val staged = new java.io.File(staging, "_SUCCESS").exists()
      if (!staged) {
        val existing = spark.read
          .option("basePath", tableDir).parquet(existingDirs: _*)
        // new rows win: drop old rows whose (ts, keys) clash
        val kept = existing.join(incoming.select((tsCol +: dedupKeys).map(col): _*),
          tsCol +: dedupKeys, "left_anti")
        kept.unionByName(incoming)
          .write.mode("overwrite").parquet(staging.getPath)
      }
      spark.read.parquet(staging.getPath)
        .repartition(col("__day"))
        .sortWithinPartitions(col("__day"), col(tsCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__day").parquet(tableDir)
      markDirty(tableDir, days)
      marker.createNewFile()
      deleteRecursive(staging)
    }
  }

  /** Wire a parsed+projected stream into a table with WAL semantics. */
  def writeStreamTo(df: DataFrame, tableDir: String, checkpoint: String,
                    tsCol: String, dedupKeys: Seq[String]) =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, tableDir, tsCol, dedupKeys)
      }

  /** TTL retention (reference `TTL n HOURS/DAYS` partition eviction,
    * `TableWriter.java:3589`): drop day partitions strictly older than
    * the horizon. Directory-level deletes — O(partitions), no data scan.
    */
  def applyTtl(tableDir: String, keepDays: Int, today: java.time.LocalDate): Int = {
    val cutoff = today.minusDays(keepDays.toLong)
    val dirs = Option(new java.io.File(tableDir).listFiles()).getOrElse(Array.empty)
    val victims = dirs.filter { d =>
      d.isDirectory && d.getName.startsWith("__day=") &&
        java.time.LocalDate.parse(d.getName.stripPrefix("__day=")).isBefore(cutoff)
    }
    victims.foreach { d =>
      d.listFiles().foreach(_.delete()); d.delete()
    }
    victims.length
  }

  /** Incrementally-refreshed materialized view (reference
    * `MatViewRefreshJob`): a streaming SAMPLE BY — watermarked window
    * aggregation. Late rows inside the watermark update their bucket;
    * `outputMode("update")`/foreachBatch-merge on the sink side.
    */
  def sampleByMatView(stream: DataFrame, tsCol: String, bucket: String,
                      keys: Seq[String], aggs: Seq[(String, org.apache.spark.sql.Column)],
                      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), bucket).getField("start").as("ts") +: keys.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
}
