package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ASOF / LT / SPLICE joins — the reference's time-series joins
  * (`io/questdb/griffin/engine/join/AsOfJoin*`, `LtJoin*`,
  * `SpliceJoinLightRecordCursorFactory.java`): for each master row, the
  * latest slave row with `slave.ts <= master.ts` (ASOF) or `< master.ts`
  * (LT), optionally per join key and within a `TOLERANCE` interval.
  *
  * Spark-first lowerings, chosen by shape:
  *
  *  - **Keyed** ([[asofKeyed]]): tag + `unionByName` both sides, one
  *    window per key ordered by (ts, side) carrying
  *    `last(slave_struct, ignoreNulls)`. One shuffle on the join key —
  *    the same partitioning discipline a regular hash join would need —
  *    no per-row range explosion, no skew beyond the key's own skew.
  *    This is the 100 TB path: state per partition is a single struct.
  *  - **No-key, small slave** ([[asofBroadcastNoKey]]): broadcast the
  *    sorted slave and binary-search per master row (mirrors the
  *    reference's no-key fast path,
  *    `join/AsOfJoinFastRecordCursorFactory.java:50`). Zero shuffle of
  *    the master side.
  *
  * Slave payload travels as a single struct so a slave row whose payload
  * column is legitimately NULL is still "the matched row" (last-ignoreNulls
  * skips missing structs, not null fields).
  */
object AsofJoin {
  private val SIDE = "__graft_side"
  private val SLAVE = "__graft_slave"
  private val MASTER = "__graft_master"

  /** Keyed ASOF/LT join — dispatching entry point.
    *
    * Lowers through the native sorted-merge operator
    * ([[graft.plans.AsOfJoinExec]], O(1) state per partition, no window
    * buffering) whenever the session has the strategy injected and the
    * timestamps are merge-compatible; falls back to the union-merge
    * window lowering ([[asofKeyedWindow]]) otherwise. Both are
    * single-shuffle-per-side plans with identical semantics (gate-checked
    * against the same oracle).
    *
    * @param master        left side; all its columns pass through
    * @param slave         right side
    * @param masterTs      designated ts column name on master
    * @param slaveTs       designated ts column name on slave
    * @param keys          equi-join key column names (same names both sides)
    * @param payload       slave columns to project (must not clash with master)
    * @param strict        true = LT join (`slave.ts < master.ts`)
    * @param toleranceMicros max master.ts - slave.ts distance
    */
  def asofKeyed(master: DataFrame, slave: DataFrame,
                masterTs: String, slaveTs: String,
                keys: Seq[String], payload: Seq[String],
                strict: Boolean = false,
                toleranceMicros: Option[Long] = None): DataFrame = {
    def mergeTs(dt: DataType) = dt match {
      case TimestampType | TimestampNTZType | LongType => true
      case _ => false
    }
    val nativeOk = keys.nonEmpty &&
      mergeTs(master.schema(masterTs).dataType) &&
      mergeTs(slave.schema(slaveTs).dataType) &&
      master.sparkSession.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy)
    if (nativeOk)
      asofKeyedNative(master, slave, masterTs, slaveTs, keys, payload, strict, toleranceMicros)
    else
      asofKeyedWindow(master, slave, masterTs, slaveTs, keys, payload, strict, toleranceMicros)
  }

  /** Keyed ASOF/LT join via the union-merge window lowering (fallback
    * path; see [[asofKeyed]] for the parameter contract).
    */
  def asofKeyedWindow(master: DataFrame, slave: DataFrame,
                      masterTs: String, slaveTs: String,
                      keys: Seq[String], payload: Seq[String],
                      strict: Boolean = false,
                      toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = master.sparkSession
    val ts = "__graft_ts"

    val m = master.withColumn(ts, col(masterTs))
      .withColumn(SIDE, lit(1))
      .withColumn(SLAVE, lit(null).cast(slaveStruct(slave, slaveTs, payload)))
    val s0 = slave.select(
      (keys.map(col) :+ col(slaveTs).as(ts)) ++
        Seq(lit(0).as(SIDE),
          struct(col(slaveTs).as("__slave_ts") +: payload.map(col): _*).as(SLAVE)): _*)
    // pad slave with master's other columns as nulls so unionByName aligns
    val s = master.columns.filterNot(c => keys.contains(c)).foldLeft(s0) {
      (df, c) => df.withColumn(c, lit(null).cast(master.schema(c).dataType))
    }

    // ASOF (<=): slave sorts before master at equal ts so the master row
    // sees it; LT (<): slave sorts after, so it doesn't. Slave rows that
    // tie on (ts, side) are ordered by their payload struct so the match
    // is deterministic across partitionings (the greatest struct wins);
    // master rows all carry a null struct, where relative order is
    // irrelevant (they contribute nothing to the carry).
    val sideOrder = if (strict) -col(SIDE) else col(SIDE)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, sideOrder.asc, col(SLAVE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = m.unionByName(s.withColumn(ts, col(ts)))
      .withColumn(SLAVE, last(col(SLAVE), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)

    val tolFiltered = toleranceMicros match {
      case Some(tol) =>
        filled.withColumn(SLAVE,
          when(col(s"$SLAVE.__slave_ts") >= col(ts) - expr(s"interval $tol microseconds"),
            col(SLAVE)))
      case None => filled
    }
    tolFiltered
      .select(master.columns.map(col) ++
        payload.map(p => col(s"$SLAVE.$p").as(p)): _*)
  }

  /** No-key ASOF/LT via broadcast binary search. `slave` must fit in
    * driver/executor memory (reference data — same constraint as any
    * broadcast join side).
    */
  def asofBroadcastNoKey(master: DataFrame, slave: DataFrame,
                         masterTs: String, slaveTs: String,
                         payload: Seq[String],
                         strict: Boolean = false,
                         toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = master.sparkSession
    // unmatched masters carry null payload → force nullable
    val payloadSchema = StructType(payload.map(p => slave.schema(p).copy(nullable = true)))
    val outSchema = StructType(master.schema.fields ++ payloadSchema.fields)

    // slave → (tsMicros, payload values) sorted ascending
    val slaveRows: Array[(Long, Seq[Any])] = slave
      .select((col(slaveTs).cast("timestamp") +: payload.map(col)): _*)
      .withColumn("__us", unix_micros(col(slaveTs)))
      .select((col("__us") +: payload.map(col)): _*)
      .collect()
      .map(r => (r.getLong(0), r.toSeq.drop(1)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(slaveRows)
    val nulls: Seq[Any] = Seq.fill(payload.size)(null)

    val mWithUs = master.withColumn("__us", unix_micros(col(masterTs)))
    val usIdx = mWithUs.columns.length - 1
    val res = mWithUs.mapPartitions { it =>
      val arr = bc.value
      it.map { r =>
        val t = r.getLong(usIdx)
        // rightmost slave with ts <= t (or < t when strict)
        var lo = 0; var hi = arr.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val ok = if (strict) arr(mid)._1 < t else arr(mid)._1 <= t
          if (ok) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        val within = ans >= 0 && toleranceMicros.forall(tol => t - arr(ans)._1 <= tol)
        val p = if (within) arr(ans)._2 else nulls
        Row.fromSeq(r.toSeq.dropRight(1) ++ p)
      }
    }(Encoders.row(outSchema))
    res
  }

  /** No-key ASOF/LT dispatcher: broadcast binary search when the slave's
    * optimizer size estimate fits the session's broadcast threshold
    * (reference no-key fast path), otherwise the fully distributed
    * range-bucketed merge ([[asofRangeNoKey]]) — no driver collect, no
    * single-partition window, safe for a 100 TB slave.
    */
  def asofNoKey(master: DataFrame, slave: DataFrame,
                masterTs: String, slaveTs: String,
                payload: Seq[String],
                strict: Boolean = false,
                toleranceMicros: Option[Long] = None): DataFrame = {
    val threshold = master.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val slaveBytes = slave.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && slaveBytes <= threshold)
      asofBroadcastNoKey(master, slave, masterTs, slaveTs, payload, strict, toleranceMicros)
    else
      asofRangeNoKey(master, slave, masterTs, slaveTs, payload, strict, toleranceMicros)
  }

  /** No-key ASOF/LT for large slaves: time-range-bucketed union merge
    * with per-bucket boundary carries, all distributed.
    *
    * Plan: tag + union both sides, bucket rows on fixed time strides
    * spanning [min ts, max ts], run the usual carry-forward window
    * *inside each bucket* (parallel across buckets — this is the big
    * shuffle and it scales with the bucket count), then close the
    * cross-bucket seam with a tiny per-bucket "last slave" table:
    * aggregate one struct per bucket, prefix-carry over that table
    * (a window over ≤`buckets` rows — single partition, trivially
    * small), broadcast-join it back, and take the in-bucket carry when
    * present else the previous buckets' carry. Equal timestamps land in
    * the same bucket, so a carry row's ts is strictly below every later
    * bucket — correct for both ASOF and strict LT.
    *
    * Time-clustered data skews individual buckets; `buckets` defaults to
    * 4× the shuffle parallelism so AQE's skew handling has room to split.
    */
  def asofRangeNoKey(master: DataFrame, slave: DataFrame,
                     masterTs: String, slaveTs: String,
                     payload: Seq[String],
                     strict: Boolean = false,
                     toleranceMicros: Option[Long] = None,
                     buckets: Int = 0): DataFrame = {
    val spark = master.sparkSession
    val nBuckets = math.max(if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions * 4, 1)
    val ts = "__graft_ts"
    val BUCKET = "__graft_bucket"

    val m = master.withColumn(ts, col(masterTs))
      .withColumn(SIDE, lit(1))
      .withColumn(SLAVE, lit(null).cast(slaveStruct(slave, slaveTs, payload)))
    val s0 = slave.select(
      col(slaveTs).as(ts) +: Seq(lit(0).as(SIDE),
        struct(col(slaveTs).as("__slave_ts") +: payload.map(col): _*).as(SLAVE)): _*)
    val s = master.columns.foldLeft(s0) {
      (df, c) => df.withColumn(c, lit(null).cast(master.schema(c).dataType))
    }
    val u = m.unionByName(s)

    // fixed-stride buckets over the observed range: one 2-value aggregate,
    // no data collected
    val r = u.agg(min(unix_micros(col(ts))), max(unix_micros(col(ts)))).head()
    if (r.isNullAt(0))
      return m.filter(col(SIDE) === 1).select(master.columns.map(col) ++
        payload.map(p => col(s"$SLAVE.$p").as(p)): _*)
    val (minUs, maxUs) = (r.getLong(0), r.getLong(1))
    val strideUs = math.max((maxUs - minUs) / nBuckets + 1, 1L)
    val bucketed = u.withColumn(BUCKET, ((unix_micros(col(ts)) - lit(minUs)) / lit(strideUs)).cast("long"))

    val sideOrder = if (strict) -col(SIDE) else col(SIDE)
    val wIn = Window.partitionBy(col(BUCKET))
      .orderBy(col(ts).asc, sideOrder.asc, col(SLAVE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = bucketed.withColumn("__graft_local",
      last(col(SLAVE), ignoreNulls = true).over(wIn))

    // per-bucket final slave row: greatest (ts, payload struct) among slaves
    val perBucket = bucketed.filter(col(SIDE) === 0)
      .groupBy(col(BUCKET))
      .agg(max(struct(col(ts), col(SLAVE))).as("__last"))
      .select(col(BUCKET), col("__last").getField(SLAVE).as("__bucket_last"))
    // prefix carry across ALL buckets (a slave-empty bucket still forwards
    // the previous buckets' carry to the masters inside it): dense bucket
    // spine left-joined with the slave maxima, then the prefix window —
    // ≤`buckets`+1 rows, single tiny partition
    val spine = spark.range(0, nBuckets + 1L).select(col("id").as(BUCKET))
    val wCarry = Window.orderBy(col(BUCKET).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = spine.join(perBucket, Seq(BUCKET), "left")
      .withColumn("__graft_carry", last(col("__bucket_last"), ignoreNulls = true).over(wCarry))
      .select(col(BUCKET), col("__graft_carry"))

    val joined = withLocal.join(broadcast(carries), Seq(BUCKET), "left")
      .withColumn(SLAVE, coalesce(col("__graft_local"), col("__graft_carry")))
      .filter(col(SIDE) === 1)
    val tolFiltered = toleranceMicros match {
      case Some(tol) =>
        joined.withColumn(SLAVE,
          when(col(s"$SLAVE.__slave_ts") >= col(ts) - expr(s"interval $tol microseconds"),
            col(SLAVE)))
      case None => joined
    }
    tolFiltered.select(master.columns.map(col) ++
      payload.map(p => col(s"$SLAVE.$p").as(p)): _*)
  }

  /** Keyed ASOF via the native sorted-merge physical operator
    * (`graft.plans.AsOfJoinExec` — LogicalPlan + Strategy + SparkPlan).
    * Same semantics as [[asofKeyed]]; requires a session built with
    * [[graft.plans.GraftExtensions]] (Sessions does this). The merge
    * holds O(1) state per partition instead of a window frame.
    */
  def asofKeyedNative(master: DataFrame, slave: DataFrame,
                      masterTs: String, slaveTs: String,
                      keys: Seq[String], payload: Seq[String],
                      strict: Boolean = false,
                      toleranceMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val mPlan = master.queryExecution.analyzed
    // fresh exprIds on the slave side so self-joins don't alias
    val sPlan0 = slave.queryExecution.analyzed
    val sAliases = sPlan0.output.map(a => Alias(a, a.name)())
    val sPlan = Project(sAliases, sPlan0)
    val sOut = sPlan.output
    def mAttr(n: String) = mPlan.output.find(_.name == n).get
    def sAttr(n: String) = sOut.find(_.name == n).get
    val node = graft.plans.AsOfJoinNode(
      mPlan, sPlan,
      keys.map(mAttr), keys.map(sAttr),
      mAttr(masterTs), sAttr(slaveTs),
      payload.map(sAttr), strict, toleranceMicros)
    org.apache.spark.sql.classic.GraftBridge.ofRows(master.sparkSession, node)
  }

  /** SPLICE join: keyed full-outer time merge — every row of both tables,
    * each paired with the latest counterpart row at or before its ts
    * (reference `join/SpliceJoinLightRecordCursorFactory.java:62`).
    * Same single-shuffle union-merge as [[asofKeyed]] but with two
    * carry-forward windows (one per direction) and no side filter.
    */
  def splice(master: DataFrame, slave: DataFrame,
             masterTs: String, slaveTs: String,
             keys: Seq[String],
             masterPayload: Seq[String], slavePayload: Seq[String]): DataFrame = {
    val ts = "__graft_ts"
    val m = master.select(
      (keys.map(col) :+ col(masterTs).as(ts)) ++ Seq(
        lit(1).as(SIDE),
        struct(col(masterTs).as("__m_ts") +: masterPayload.map(col): _*).as(MASTER),
        lit(null).cast(slaveStruct(slave, slaveTs, slavePayload)).as(SLAVE)): _*)
    val s = slave.select(
      (keys.map(col) :+ col(slaveTs).as(ts)) ++ Seq(
        lit(0).as(SIDE),
        lit(null).cast(masterStructType(master, masterTs, masterPayload)).as(MASTER),
        struct(col(slaveTs).as("__slave_ts") +: slavePayload.map(col): _*).as(SLAVE)): _*)

    // For a master row: latest slave with slave.ts <= ts  (slave first at
    // ties); same-side ties resolve deterministically by payload struct.
    val wSlave = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(SIDE).asc,
        col(SLAVE).asc_nulls_first, col(MASTER).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // For a slave row: latest master with master.ts <= ts (master first at ties)
    val wMaster = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(SIDE).desc,
        col(MASTER).asc_nulls_first, col(SLAVE).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    m.unionByName(s)
      .withColumn(SLAVE, last(col(SLAVE), ignoreNulls = true).over(wSlave))
      .withColumn(MASTER, last(col(MASTER), ignoreNulls = true).over(wMaster))
      .select(keys.map(col) ++ Seq(col(ts).as("ts"), col(SIDE).as("side")) ++
        Seq(col(s"$MASTER.__m_ts").as("master_ts")) ++
        masterPayload.map(p => col(s"$MASTER.$p").as(p)) ++
        Seq(col(s"$SLAVE.__slave_ts").as("slave_ts")) ++
        slavePayload.map(p => col(s"$SLAVE.$p").as(p)): _*)
  }

  private def slaveStruct(slave: DataFrame, slaveTs: String, payload: Seq[String]): StructType =
    StructType(StructField("__slave_ts", slave.schema(slaveTs).dataType) +:
      payload.map(p => slave.schema(p)))

  private def masterStructType(master: DataFrame, masterTs: String, payload: Seq[String]): StructType =
    StructType(StructField("__m_ts", master.schema(masterTs).dataType) +:
      payload.map(p => master.schema(p)))
}
