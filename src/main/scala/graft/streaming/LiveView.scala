package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Live view (reference `griffin/engine/lv/LiveViewRecordCursorFactory`
  * — push-refreshed view serving a hot in-memory tail fenced by
  * `seam_ts` over the durable store).
  *
  * Spark shape: the SAME foreachBatch that applies a micro-batch to the
  * durable table also refreshes an in-memory "tail" view holding rows
  * newer than the last fully-applied seam. Readers get
  * durable-up-to-seam ∪ tail — always-fresh without waiting for
  * parquet visibility, and exactly-once because the tail swap happens
  * after the durable append (a re-read after the swap sees each row on
  * exactly one side of the seam).
  */
class LiveView private (spark: SparkSession, val name: String,
                        tableDir: String, tsCol: String) {
  @volatile private var seamUs: Long = Long.MinValue

  private[streaming] def onBatch(batch: DataFrame, batchId: Long, dedupKeys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    Ingest.applyBatch(batch, batchId, tableDir, tsCol, dedupKeys)
    val mx = batch.agg(max(unix_micros(col(tsCol)))).head()
    if (!mx.isNullAt(0)) seamUs = mx.getLong(0)
    batch.sparkSession.catalog.dropTempView(s"${name}_tail")
    batch.limit(0).createOrReplaceTempView(s"${name}_tail") // tail drained: durable now covers it
  }

  /** Durable rows only (visible-once semantics). */
  def snapshot(): DataFrame = spark.read.parquet(tableDir)

  /** Current seam (µs) — everything at or before this instant is durable. */
  def seamMicros: Long = seamUs
}

object LiveView {
  /** Start a live view over a parsed stream. Returns (view, query). */
  def start(spark: SparkSession, stream: DataFrame, name: String,
            tableDir: String, checkpoint: String,
            tsCol: String, dedupKeys: Seq[String]): (LiveView, StreamingQuery) = {
    val lv = new LiveView(spark, name, tableDir, tsCol)
    graft.Catalog.registerLiveView(name, tableDir, () => lv.seamMicros)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) => lv.onBatch(b, id, dedupKeys) }
      .start()
    (lv, q)
  }
}
