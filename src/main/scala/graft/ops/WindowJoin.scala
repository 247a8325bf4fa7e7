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
  /** @param loMicros window start offset (negative = preceding)
    * @param hiMicros window end offset
    * @param aggs     output name -> aggregate over slave columns
    */
  def windowJoin(master: DataFrame, slave: DataFrame,
                 masterTs: String, slaveTs: String,
                 keys: Seq[String],
                 loMicros: Long, hiMicros: Long,
                 aggs: Seq[(String, Column)]): DataFrame = {
    val m = master.columns.foldLeft(master)((d, c) => d.withColumnRenamed(c, s"__m_$c"))
    val cond = keys.map(k => m(s"__m_$k") === slave(k)).reduce(_ && _) &&
      col(slaveTs) >= col(s"__m_$masterTs") + expr(s"interval $loMicros microseconds") &&
      col(slaveTs) <= col(s"__m_$masterTs") + expr(s"interval $hiMicros microseconds")
    m.join(slave, cond, "left")
      .groupBy(master.columns.map(c => col(s"__m_$c").as(c)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
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
    val mCols = master.columns.toSeq
    val m = mCols.foldLeft(master)((d, c) => d.withColumnRenamed(c, s"__m_$c"))
    val cond = keys.map(k => m(s"__m_$k") === slave(k)).reduce(_ && _) &&
      col(slaveTs) >= col(s"__m_$masterTs") + expr(s"interval $loMicros microseconds") &&
      col(slaveTs) <= col(s"__m_$masterTs") + expr(s"interval $hiMicros microseconds")
    val inWindow = m.join(slave, cond, "left")
      .select(mCols.map(c => col(s"__m_$c")) ++ payload.map(col): _*)

    val probe = master.withColumn("__wj_probe",
      col(masterTs) + expr(s"interval $loMicros microseconds"))
    val prevailing = AsofJoin.asofKeyed(probe, slave, "__wj_probe", slaveTs,
      keys, payload, strict = true)
      .select(mCols.map(c => col(c).as(s"__m_$c")) ++ payload.map(col): _*)

    inWindow.unionByName(prevailing)
      .groupBy(mCols.map(c => col(s"__m_$c").as(c)): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
  }
}
