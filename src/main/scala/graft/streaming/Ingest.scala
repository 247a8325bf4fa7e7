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
      .drop("ts_nanos")
  }

  /** Apply one micro-batch to a table directory:
    *  1. idempotency guard (batch marker — exactly-once under retries),
    *  2. DEDUP UPSERT KEYS(ts, keys...) within the batch,
    *  3. sort by ts within day partitions (O3 merge-on-write analogue),
    *  4. append into `partition by DAY` parquet layout.
    * Late (out-of-order) rows land in their own (older) day partition —
    * nothing is dropped, matching the reference's O3 semantics.
    */
  def applyBatch(batch: DataFrame, batchId: Long, tableDir: String,
                 tsCol: String, dedupKeys: Seq[String]): Unit = {
    val fs = new java.io.File(s"$tableDir/_graft_batches")
    fs.mkdirs()
    val marker = new java.io.File(fs, s"batch-$batchId")
    if (marker.exists()) return // retried batch — already applied

    val deduped =
      if (dedupKeys.isEmpty) batch
      else batch.dropDuplicates(tsCol +: dedupKeys)
    deduped
      .withColumn("__day", to_date(col(tsCol)))
      .repartition(col("__day"))
      .sortWithinPartitions(col("__day"), col(tsCol))
      .write.mode("append").partitionBy("__day").parquet(tableDir)
    marker.createNewFile()
  }

  /** Cross-batch DEDUP UPSERT KEYS(ts, keys...): the reference dedups an
    * incoming txn against rows already IN the table
    * (`cairo/TableWriter.java:342`, `dedup.cpp`). Spark analogue of a
    * Delta MERGE on plain parquet: read only the day partitions the
    * batch touches, anti-join out clashing old rows, rewrite those
    * partitions with old+new merged and re-sorted. Cost is bounded by
    * the touched partitions, not the table.
    */
  def upsertBatch(batch: DataFrame, batchId: Long, tableDir: String,
                  tsCol: String, dedupKeys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val fsDir = new java.io.File(s"$tableDir/_graft_batches")
    fsDir.mkdirs()
    val marker = new java.io.File(fsDir, s"batch-$batchId")
    if (marker.exists()) return

    val incoming = batch.dropDuplicates(tsCol +: dedupKeys)
      .withColumn("__day", to_date(col(tsCol)))
    val days = incoming.select(col("__day")).distinct()
      .collect().map(_.get(0).toString) // bounded: distinct days in one batch
    val existingDirs = days.map(d => s"$tableDir/__day=$d")
      .filter(p => new java.io.File(p).exists())

    if (existingDirs.isEmpty) {
      incoming.repartition(col("__day"))
        .sortWithinPartitions(col("__day"), col(tsCol))
        .write.mode("append").partitionBy("__day").parquet(tableDir)
    } else {
      val existing = spark.read
        .option("basePath", tableDir).parquet(existingDirs: _*)
      // new rows win: drop old rows whose (ts, keys) clash
      val kept = existing.join(incoming.select((tsCol +: dedupKeys).map(col): _*),
        tsCol +: dedupKeys, "left_anti")
      val merged = kept.unionByName(incoming).persist()
      merged.count() // materialize before overwriting the inputs
      merged.repartition(col("__day"))
        .sortWithinPartitions(col("__day"), col(tsCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__day").parquet(tableDir)
      merged.unpersist()
    }
    marker.createNewFile()
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
