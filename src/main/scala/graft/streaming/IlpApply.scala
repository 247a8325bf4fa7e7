package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transport-agnostic ILP batch apply: protocol lines → distributed
  * parse → per-measurement dynamic-schema flatten → staged WAL-style
  * batch apply into `ilpDir/<measurement>` → queryable view refresh.
  *
  * The reference funnels all three line-protocol transports into one
  * writer path (`cutlass/line/tcp/LineTcpMeasurementScheduler.java:70` →
  * WAL append); this object is that shared tail, used by the HTTP
  * `/write` endpoint ([[graft.http.RestServer]]) and the UDP receiver
  * ([[IlpUdp]]).
  */
object IlpApply {

  /** Micros multiplier for an influx `precision=` value ("ns" default —
    * trailing ILP timestamps are nanos on the wire).
    */
  def precisionMult(p: String): Long = p match {
    case "ns" => 1L
    case "us" => 1000L
    case "ms" => 1000000L
    case "s"  => 1000000000L
    case other => throw new IllegalArgumentException(s"bad precision: $other")
  }

  /** Parse + apply one batch of ILP lines. Returns rows ingested.
    *
    * @param microsMult rescale factor for the trailing timestamp
    * @param dedupKeys  non-empty → cross-batch DEDUP UPSERT KEYS apply
    * @param seq        per-endpoint monotonic batch counter (idempotence id)
    */
  def applyLines(spark: SparkSession, lines: Seq[String], ilpDir: String,
                 microsMult: Long, dedupKeys: Seq[String],
                 seq: AtomicLong): Long = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val clean = lines.filter(_.trim.nonEmpty)
    if (clean.isEmpty) return 0L
    val parsed0 = Ingest.parseIlp(spark.createDataset(clean))
    // the wire number is in `precision` units: micros scale by div-1000
    // then microsMult; nanos scale by microsMult directly (ns-per-unit)
    val parsed = (if (microsMult == 1L) parsed0
      else parsed0
        .withColumn("ts", timestamp_micros(unix_micros(col("ts")) * microsMult))
        .withColumn("ts_ns", col("ts_ns") * microsMult))
      .withColumn("ts", coalesce(col("ts"), current_timestamp())) // server-time rows
      .withColumn("ts_ns", coalesce(col("ts_ns"), unix_micros(col("ts")) * 1000L))
      .persist()
    try {
      val measurements = parsed.select("measurement").distinct()
        .collect().map(_.getString(0)).sorted // bounded: tables touched by one batch
      var total = 0L
      measurements.foreach { m =>
        val rows = flattenIlp(parsed.filter(col("measurement") === m))
        total += rows.count()
        val tableDir = s"$ilpDir/$m"
        val batchId = seq.incrementAndGet() * 1000000L + System.nanoTime() % 1000000L
        if (dedupKeys.nonEmpty)
          Ingest.upsertBatch(rows, batchId, tableDir, "ts", dedupKeys)
        else
          Ingest.applyBatch(rows, batchId, tableDir, "ts", Nil)
        spark.read.parquet(tableDir).drop("__day").createOrReplaceTempView(m)
      }
      total
    } finally { parsed.unpersist(); () }
  }

  /** Dynamic-schema projection: every tag and field key observed in the
    * batch becomes a column (the reference adds table columns the same
    * lazily-on-ingest way).
    */
  def flattenIlp(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def keys(c: String) = df.select(explode(map_keys(col(c)))).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val cols =
      keys("tags").map(k => col("tags")(k).as(k)) ++
        keys("f_double").map(k => col("f_double")(k).as(k)) ++
        keys("f_long").map(k => col("f_long")(k).as(k)) ++
        keys("f_string").map(k => col("f_string")(k).as(k)) ++
        keys("f_bool").map(k => col("f_bool")(k).as(k)) :+
        col("ts") :+ col("ts_ns")
    df.select(cols: _*)
  }
}
