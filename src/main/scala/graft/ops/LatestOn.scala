package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LATEST ON <ts> PARTITION BY <keys> — last row per series key as of the
  * designated timestamp, with any WHERE applied *before* the latest-by
  * (reference dispatch `griffin/SqlCodeGenerator.java:6712`,
  * ~20 specializations under `table/LatestBy*`).
  *
  * Lowering: `groupBy(keys).agg(max_by(struct(all columns), orderKey))`.
  * A hash aggregate with partial (map-side) combine — one shuffle of one
  * struct per key per partition, no global sort, no window buffering.
  * That is the plan that survives 100 TB: state is O(distinct keys).
  * (`row_number` over a key-window would sort every partition instead.)
  *
  * @param tiebreak extra column(s) appended to the ts for a total order,
  *                 so ties resolve deterministically.
  */
object LatestOn {
  def latestOn(df: DataFrame, ts: String, keys: Seq[String],
               tiebreak: Seq[String] = Nil): DataFrame = {
    val all = df.columns.toSeq
    val ord = struct((ts +: tiebreak).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(all.map(col): _*), ord).as("__row"))
      .select(all.map(c => col(s"__row.$c").as(c)): _*)
  }
}
