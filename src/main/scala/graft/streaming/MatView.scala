package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch materialized views with dirty-range incremental refresh —
  * the Spark re-expression of the reference's mat-view machinery
  * (`cairo/mv/MatViewRefreshJob.java:77`: walk the WAL txn ranges since
  * the last refresh, recompute only the SAMPLE BY buckets those txns
  * touched; `MatViewDefinition.java:59-64`: IMMEDIATE / TIMER / MANUAL
  * refresh triggers).
  *
  * Here the change log is the per-day dirty markers [[Ingest.markDirty]]
  * drops on every batch apply. A refresh:
  *
  *   1. reads the dirty day set (no data scan),
  *   2. expands each day to a bucket- AND day-aligned time range
  *      (fixpoint, so buckets that straddle midnight never see partial
  *      input and every view partition it rewrites is rewritten whole),
  *   3. re-aggregates ONLY the source partitions in those ranges
  *      (partition-pruned scan), and
  *   4. dynamic-partition-overwrites only the affected view days, then
  *      consumes the markers.
  *
  * Cost scales with data touched since the last refresh, not with the
  * table — on a 100 TB source a late batch into one day reads one day.
  *
  * Triggers: [[refresh]] is MANUAL; [[immediate]] wires refresh into the
  * stream's own foreachBatch (the streaming IMMEDIATE analogue
  * [[Ingest.sampleByMatView]] remains for watermark-window pipelines);
  * [[timer]] schedules periodic refresh.
  */
object MatView {

  /** SAMPLE BY view over a day-partitioned source table. */
  final case class Definition(
      sourceDir: String,
      viewDir: String,
      tsCol: String,
      bucket: String, // Spark interval string, e.g. "1 hour"
      keys: Seq[String],
      aggs: Seq[(String, Column)])

  private val DayUs = 86400000000L

  private[graft] def bucketMicros(bucket: String): Long = {
    val m = """\s*(\d+)\s*(\w+?)s?\s*""".r
    bucket.trim match {
      case m(n, unit) =>
        val u = unit.toLowerCase match {
          case "microsecond" => 1L
          case "millisecond" => 1000L
          case "second" => 1000000L
          case "minute" => 60000000L
          case "hour" => 3600000000L
          case "day" => DayUs
          case "week" => 7 * DayUs
          case other => throw new IllegalArgumentException(s"bad bucket unit: $other")
        }
        n.toLong * u
      case other => throw new IllegalArgumentException(s"bad bucket: $other")
    }
  }

  private def floorTo(t: Long, step: Long): Long = math.floorDiv(t, step) * step
  private def ceilTo(t: Long, step: Long): Long = -math.floorDiv(-t, step) * step

  private def dayStartUs(day: String): Long =
    java.time.LocalDate.parse(day).toEpochDay * DayUs

  /** Bucket- and day-aligned closure of one dirty day. Alternates the
    * two alignments to a fixpoint: stable means every bucket inside is
    * whole (no partial aggregation input) and every day inside is whole
    * (partition overwrite rewrites complete view partitions). For
    * buckets that divide or are multiples of a day this converges in
    * one step.
    */
  private[graft] def alignedRange(day: String, bucketUs: Long): (Long, Long) = {
    var lo = dayStartUs(day)
    var hi = lo + DayUs
    var changed = true
    while (changed) {
      val blo = floorTo(lo, bucketUs); val bhi = ceilTo(hi, bucketUs)
      val dlo = floorTo(blo, DayUs); val dhi = ceilTo(bhi, DayUs)
      changed = dlo != lo || dhi != hi
      lo = dlo; hi = dhi
    }
    (lo, hi)
  }

  private[graft] def mergeRanges(rs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    rs.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, (l, h)) if l <= hi => (lo, math.max(hi, h)) :: tail
      case (acc, r) => r :: acc
    }.reverse

  private def daysOf(r: (Long, Long)): Seq[String] =
    (r._1 until r._2 by DayUs).map(us =>
      java.time.LocalDate.ofEpochDay(us / DayUs).toString)

  /** MANUAL refresh: recompute only the buckets whose days changed since
    * the last refresh. Returns the view days rewritten (empty = clean).
    * A full rebuild is just `refresh` on a fully-dirty table — or
    * [[rebuild]] below.
    */
  def refresh(spark: SparkSession, d: Definition): Seq[String] = {
    val dirty = Ingest.dirtyDays(d.sourceDir)
    if (dirty.isEmpty) return Nil
    val bucketUs = bucketMicros(d.bucket)
    val ranges = mergeRanges(dirty.map(alignedRange(_, bucketUs)))
    val srcDays = ranges.flatMap(daysOf).distinct.sorted
      .filter(day => new java.io.File(s"${d.sourceDir}/__day=$day").exists())
    if (srcDays.nonEmpty) {
      val slice = spark.read.parquet(d.sourceDir)
        .filter(col("__day").isin(srcDays: _*)) // partition-pruned
      aggregate(slice, d)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__day").parquet(d.viewDir)
    }
    Ingest.clearDirty(d.sourceDir, dirty)
    srcDays
  }

  /** Full recompute (initial build, or schema/definition change). */
  def rebuild(spark: SparkSession, d: Definition): Unit = {
    aggregate(spark.read.parquet(d.sourceDir), d)
      .write.mode("overwrite").partitionBy("__day").parquet(d.viewDir)
    Ingest.clearDirty(d.sourceDir, Ingest.dirtyDays(d.sourceDir))
  }

  private[streaming] def aggregate(src: DataFrame, d: Definition): DataFrame =
    src.groupBy(window(col(d.tsCol), d.bucket).getField("start").as("ts") +:
        d.keys.map(col): _*)
      .agg(d.aggs.head._2.as(d.aggs.head._1),
        d.aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .withColumn("__day", to_date(col("ts")))

  /** IMMEDIATE trigger: apply each micro-batch to the source table, then
    * refresh the view from exactly the partitions that batch dirtied —
    * the batch analogue of the reference's immediate WAL-driven refresh.
    */
  def immediate(stream: DataFrame, d: Definition, checkpoint: String,
                dedupKeys: Seq[String]) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        Ingest.applyBatch(b, id, d.sourceDir, d.tsCol, dedupKeys)
        refresh(b.sparkSession, d)
        ()
      }

  /** TIMER trigger: periodic refresh on a daemon scheduler; `cancel()`
    * the returned handle to stop. Refreshes are no-ops while the dirty
    * set is empty.
    */
  def timer(spark: SparkSession, d: Definition,
            period: java.time.Duration): java.util.concurrent.ScheduledFuture[_] = {
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, s"graft-matview-timer"); t.setDaemon(true); t
    })
    exec.scheduleAtFixedRate(() => {
      try refresh(spark, d)
      catch { case e: Exception => System.err.println(s"[matview] refresh failed: $e") }
    }, period.toMillis, period.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
  }
}
