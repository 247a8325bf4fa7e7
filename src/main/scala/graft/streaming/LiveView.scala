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
  @volatile private var txn: Long = -1L

  private[graft] def onBatch(batch: DataFrame, batchId: Long, dedupKeys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val rows = batch.persist()
    try {
      // 1. publish the hot tail FIRST: while the parquet apply is in
      // flight, a concurrent reader sees durable-up-to-the-OLD-seam ∪
      // this tail — the reference's hot-tail-over-durable serve shape
      // (griffin/engine/lv/, seam_ts as the fence), instead of waiting
      // out parquet visibility
      rows.filter(col(tsCol).isNotNull)
        .filter(unix_micros(col(tsCol)) > seamUs)
        .createOrReplaceTempView(s"${name}_tail")
      // 2. durable apply — the WAL-transaction analogue (batchId is the
      // seqTxn; Ingest.applyBatch is idempotent per batch id)
      Ingest.applyBatch(rows, batchId, tableDir, tsCol, dedupKeys)
      // 3. advance the fence, then drain the tail: at every instant a
      // reader sees each row on exactly one side of the seam
      val mx = rows.agg(max(unix_micros(col(tsCol)))).head()
      if (!mx.isNullAt(0)) seamUs = mx.getLong(0)
      txn = batchId
      rows.limit(0).createOrReplaceTempView(s"${name}_tail")
    } finally { rows.unpersist(); () }
  }

  /** Durable rows only (visible-once semantics). */
  def snapshot(): DataFrame = spark.read.parquet(tableDir)

  /** Seam-fenced live read: durable rows at-or-before the seam ∪
    * hot-tail rows after it — always-fresh and exactly-once, whichever
    * side of an in-flight apply the call lands on.
    */
  def read(): DataFrame = {
    import org.apache.spark.sql.functions._
    val seam = seamUs
    val durable0 = snapshot()
    val durable = (if (durable0.columns.contains("__day")) durable0.drop("__day") else durable0)
      .filter(unix_micros(col(tsCol)) <= seam)
    scala.util.Try(spark.table(s"${name}_tail")) match {
      case scala.util.Success(tail) =>
        durable.unionByName(tail.filter(unix_micros(col(tsCol)) > seam),
          allowMissingColumns = true)
      case _ => durable // no batch yet: durable only
    }
  }

  /** Current seam (µs) — everything at or before this instant is durable. */
  def seamMicros: Long = seamUs

  /** Last fully-applied transaction (micro-batch id) — the seqTxn fence:
    * readers holding a txn watermark can wait on it for read-your-writes.
    */
  def appliedTxn: Long = txn
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
