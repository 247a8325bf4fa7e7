package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** ILP over TCP (reference `cutlass/line/tcp/LineTcpReceiver.java` →
  * `LineTcpMeasurementScheduler.java:70` → WAL append).
  *
  * Spark-first shape: the socket text source streams protocol lines,
  * [[Ingest.parseIlp]] is the line parser, and [[Ingest.writeStreamTo]]
  * supplies the WAL-transaction apply (idempotent staged micro-batches).
  * One topology note: the reference's receiver *accepts* connections,
  * while Spark's socket source *connects out* — deployments put a
  * fan-in endpoint (load balancer, relay, or the emitting process
  * itself listening) in front; everything protocol-level is identical.
  * For accept-style or at-scale ingest, point the same pipeline at a
  * Kafka source instead — the parse/apply stages are source-agnostic.
  */
object IlpTcp {

  /** Parsed ILP stream from a TCP text endpoint. */
  def stream(spark: SparkSession, host: String, port: Int): DataFrame = {
    import spark.implicits._
    Ingest.parseIlp(
      spark.readStream.format("socket")
        .option("host", host).option("port", port)
        .load().as[String])
  }

  /** Full pipeline: TCP lines → parse → project → day-partitioned
    * idempotent parquet table.
    *
    * @param project shape the semi-structured parse into the table's
    *                typed columns (measurement filter + field extraction)
    */
  def start(spark: SparkSession, host: String, port: Int,
            tableDir: String, checkpoint: String,
            tsCol: String, dedupKeys: Seq[String])(
            project: DataFrame => DataFrame): StreamingQuery =
    Ingest.writeStreamTo(project(stream(spark, host, port)),
      tableDir, checkpoint, tsCol, dedupKeys).start()
}
