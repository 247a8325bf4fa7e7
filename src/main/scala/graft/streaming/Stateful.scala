package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Keyed stateful streaming operators via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` -- the live versions of
  * graft's batch time-series ops, with O(1) managed state per key:
  *
  *  - [[latestOn]]: streaming LATEST ON (reference live `LATEST BY` over
  *    an ILP-ingested table -- `LatestByAllIndexedRecordCursorFactory`
  *    semantics, continuously maintained instead of re-scanned)
  *  - [[dedup]]: streaming DEDUP UPSERT KEYS with event-time TTL state
  *    eviction (reference WAL dedup `DEDUP upsert keys(ts, sym)` on the
  *    hot path; watermark bounds the state like the reference's O3
  *    commit-lag bounds its uncommitted window)
  *  - [[ema]]: cross-micro-batch recursive EMA (reference
  *    `EmaDoubleWindowFunctionFactory` as a live window over the stream;
  *    same recurrence as the batch [[graft.ops.Ema]])
  *
  * All three carry state per group key, not per partition: Spark
  * re-shuffles each micro-batch to the state store's key partitioning,
  * so a 1000-executor cluster splits the key space 1000 ways and each
  * key's state lives on exactly one executor (HDFS/RocksDB state store
  * at scale; the in-memory store on local runs).
  */
object Stateful {

  private def keyOf(idx: Seq[Int])(r: Row): String =
    idx.map(i => if (r.isNullAt(i)) "\u0001" else String.valueOf(r.get(i)))
      .mkString("\u0000")

  private def tsMicros(r: Row, i: Int): Long = {
    val t = r.getAs[java.sql.Timestamp](i)
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  }

  /** Latest row per key, continuously maintained. Emits (in UPDATE
    * output mode) a key's current latest row whenever a micro-batch
    * advances it; state is exactly one row per key.
    */
  def latestOn(df: DataFrame, tsCol: String, keys: Seq[String]): DataFrame = {
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val rowEnc = Encoders.row(schema)
    df.groupByKey(keyOf(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          val latestIn = rows.maxBy(tsMicros(_, tsIdx))
          val cur = state.getOption
          if (cur.isEmpty || tsMicros(latestIn, tsIdx) >= tsMicros(cur.get, tsIdx)) {
            state.update(latestIn)
            Iterator.single(latestIn)
          } else Iterator.empty
      }(rowEnc, rowEnc)
  }

  /** First row per key wins; duplicates are dropped for `ttl` of event
    * time after the key's first appearance, then the state is evicted
    * (event-time timeout against the stream's watermark -- callers set
    * `withWatermark` upstream). Append output mode.
    */
  def dedup(df: DataFrame, tsCol: String, keys: Seq[String],
            ttl: java.time.Duration): DataFrame = {
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val rowEnc = Encoders.row(schema)
    df.groupByKey(keyOf(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(tsMicros(_, tsIdx))
            val out =
              if (state.exists || sorted.isEmpty) Iterator.empty
              else Iterator.single(sorted.head)
            sorted.headOption.foreach { h =>
              if (!state.exists) state.update(tsMicros(h, tsIdx))
              state.setTimeoutTimestamp(
                tsMicros(h, tsIdx) / 1000L + ttl.toMillis)
            }
            out
          }
      }(Encoders.scalaLong, rowEnc)
  }

  /** Per-key EMA whose state (the running average) carries across
    * micro-batches: `y = alpha*x + (1-alpha)*y_prev`, seeded with the key's
    * first value ever seen on the stream. Rows within a batch are folded
    * in event-time order; the output appends an `out` column.
    */
  def ema(df: DataFrame, tsCol: String, keys: Seq[String],
          valueCol: String, alpha: Double, out: String): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(schema.fields :+ StructField(out, DoubleType, nullable = true))
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    val valIdx = schema.fieldIndex(valueCol)
    df.groupByKey(keyOf(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[(Double, Boolean), Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[(Double, Boolean)]) =>
          var (s, has) = state.getOption.getOrElse((0.0, false))
          val folded = rows.toSeq.sortBy(tsMicros(_, tsIdx)).map { r =>
            val y: Any =
              if (r.isNullAt(valIdx)) { if (has) s else null }
              else {
                val x = r.getDouble(valIdx)
                s = if (has) alpha * x + (1 - alpha) * s else x
                has = true
                s
              }
            Row.fromSeq(r.toSeq :+ y)
          }
          state.update((s, has))
          folded.iterator
      }(Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean), Encoders.row(outSchema))
  }

  /** Continuously-maintained per-key top-k (smallest `(ord, id)` long
    * pairs first — negate a score for top-by-largest). State is the same
    * O(k) bounded buffer the batch `topk_pairs` aggregate uses
    * ([[graft.functions.TopKPairsBuf]]), serialized per key; whenever a
    * micro-batch changes a key's top-k, the key's full current ranking
    * re-emits (UPDATE mode): (keys..., rank, ord, id).
    */
  def topK(df: DataFrame, keys: Seq[String], ordCol: String, idCol: String,
           k: Int): DataFrame = {
    import graft.functions.TopKPairsBuf
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(ordCol)
    val idIdx = schema.fieldIndex(idCol)
    val outSchema = StructType(
      keys.map(schema(_)) ++ Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField(ordCol, LongType, nullable = false),
        StructField(idCol, LongType, nullable = false)))
    df.groupByKey(keyOf(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState[Array[Byte], Row](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], state: GroupState[Array[Byte]]) =>
          val buf = state.getOption.map(TopKPairsBuf.deserialize)
            .getOrElse(new TopKPairsBuf(k))
          val before = buf.result().toSeq
          var keyRow: Row = null
          rows.foreach { r =>
            keyRow = r
            if (!r.isNullAt(ordIdx) && !r.isNullAt(idIdx))
              buf.add(r.getLong(ordIdx), r.getLong(idIdx))
          }
          val after = buf.result().toSeq
          state.update(buf.serialize())
          if (after == before || keyRow == null) Iterator.empty
          else {
            val keyVals = keyIdx.map(keyRow.get)
            after.iterator.zipWithIndex.map { case ((o, i), rk) =>
              Row.fromSeq(keyVals ++ Seq[Any](rk + 1, o, i))
            }
          }
      }(Encoders.BINARY, Encoders.row(outSchema))
  }
}
