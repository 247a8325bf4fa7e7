package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HORIZON JOIN (markout analysis) — for each master row and each offset
  * in a list/range, ASOF-join the slave at `master.ts + offset`
  * (reference `table/HorizonJoinRecordCursorFactory.java`, parse
  * `SqlParser.java:4980-5070`).
  *
  * Lowering: explode the offset grid onto the master (row count ×
  * |offsets| — exactly the output cardinality, nothing wasted), shift the
  * probe ts, then reuse the keyed ASOF union-merge. Inherits its
  * single-shuffle-on-key scaling.
  */
object HorizonJoin {
  /** @param offsetsMicros markout offsets; emitted as column `off_us` */
  def horizonJoin(master: DataFrame, slave: DataFrame,
                  masterTs: String, slaveTs: String,
                  keys: Seq[String], payload: Seq[String],
                  offsetsMicros: Seq[Long]): DataFrame = {
    val grid = master
      .withColumn("off_us", explode(array(offsetsMicros.map(lit): _*)))
      .withColumn("__h_ts", timestamp_micros(unix_micros(col(masterTs)) + col("off_us")))
    AsofJoin.asofKeyed(grid, slave, "__h_ts", slaveTs, keys, payload)
      .drop("__h_ts")
  }
}
