package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WINDOW JOIN — per master row, aggregate slave rows with the same key
  * whose ts lies in `[master.ts + lo, master.ts + hi]`
  * (reference `join/WindowJoinRecordCursorFactory.java`, RANGE BETWEEN
  * x PRECEDING AND y FOLLOWING).
  *
  * Lowering: equi-join on the key (hash join — the range condition rides
  * along as a join filter) followed by a re-group on the master row.
  * Shuffle count: one for the join, one for the group-by; both keyed, so
  * skew/AQE handling applies. For very wide time windows at scale the
  * bucketized variant (join on (key, ts_bucket) with ±1 bucket
  * explosion) bounds the fan-out; not needed at these window widths.
  */
object WindowJoin {
  /** Multiplicity column: the reference emits one aggregated row per
    * master row, *including* fully-identical duplicates. Re-grouping on
    * master columns alone would merge those (double-counting the
    * aggregates), so masters are first deduplicated with a count; each
    * distinct master joins and aggregates once (identical masters have
    * identical windows) and is re-expanded afterwards. This is also the
    * cheaper plan: duplicate masters don't re-join.
    */
  private val N = "__wj_n"

  private def distinctMasters(master: DataFrame): DataFrame =
    master.groupBy(master.columns.map(col): _*).agg(count(lit(1)).as(N))

  private def reExpand(df: DataFrame): DataFrame =
    df.withColumn("__wj_dup", explode(sequence(lit(1L), col(N))))
      .drop(N, "__wj_dup")

  /** @param loMicros window start offset (negative = preceding)
    * @param hiMicros window end offset
    * @param aggs     output name -> aggregate over slave columns
    */
  def windowJoin(master: DataFrame, slave: DataFrame,
                 masterTs: String, slaveTs: String,
                 keys: Seq[String],
                 loMicros: Long, hiMicros: Long,
                 aggs: Seq[(String, Column)]): DataFrame = {
    val gCols = master.columns :+ N
    val m = gCols.foldLeft(distinctMasters(master))((d, c) => d.withColumnRenamed(c, s"__m_$c"))
    // no-key window join matches on the time range alone
    val cond = keys.map(k => m(s"__m_$k") === slave(k))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col(slaveTs) >= col(s"__m_$masterTs") + expr(s"interval $loMicros microseconds") &&
      col(slaveTs) <= col(s"__m_$masterTs") + expr(s"interval $hiMicros microseconds")
    reExpand(
      m.join(slave, cond, "left")
        .groupBy(gCols.map(c => col(s"__m_$c").as(c)): _*)
        .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*))
  }

  /** WINDOW JOIN ... INCLUDE PREVAILING (reference parse
    * `SqlParser.java:4960-4977`): the latest slave row strictly before
    * the window start also contributes to each master's aggregate.
    * Lowering: union the range-join contributions with a strict ASOF at
    * `ts+lo`, then aggregate once — both branches are single-key-shuffle
    * plans.
    *
    * @param payload slave columns the aggregates consume (must not clash
    *                with master column names)
    */
  def windowJoinPrevailing(master: DataFrame, slave: DataFrame,
                           masterTs: String, slaveTs: String,
                           keys: Seq[String], payload: Seq[String],
                           loMicros: Long, hiMicros: Long,
                           aggs: Seq[(String, Column)]): DataFrame = {
    val dm = distinctMasters(master)
    val gCols = master.columns.toSeq :+ N
    val m = gCols.foldLeft(dm)((d, c) => d.withColumnRenamed(c, s"__m_$c"))
    // no-key window join matches on the time range alone
    val cond = keys.map(k => m(s"__m_$k") === slave(k))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col(slaveTs) >= col(s"__m_$masterTs") + expr(s"interval $loMicros microseconds") &&
      col(slaveTs) <= col(s"__m_$masterTs") + expr(s"interval $hiMicros microseconds")
    val inWindow = m.join(slave, cond, "left")
      .select(gCols.map(c => col(s"__m_$c")) ++ payload.map(col): _*)

    // distinct masters are unique rows, so both branches key the same row.
    // Prevailing = the value IN EFFECT at the window start (at-or-before
    // asof); a slave row exactly AT the start is already an in-window
    // contribution, so only rows strictly before the start are ADDED —
    // an at-start pick must not double (LateralJoinTest:2549 lo=0)
    val probe = dm.withColumn("__wj_probe",
      col(masterTs) + expr(s"interval $loMicros microseconds"))
    val slaveP = slave.withColumn("__wj_sts", col(slaveTs))
    val prevailing = AsofJoin.asofKeyed(probe, slaveP, "__wj_probe", slaveTs,
      keys, payload :+ "__wj_sts", strict = false)
      .filter(col("__wj_sts").isNull || col("__wj_sts") < col("__wj_probe"))
      .select(gCols.map(c => col(c).as(s"__m_$c")) ++ payload.map(col): _*)

    reExpand(
      inWindow.unionByName(prevailing)
        .groupBy(gCols.map(c => col(s"__m_$c").as(c)): _*)
        .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*))
  }
}
