package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual complement to AQE's
  * skew-join splitting (enabled session-wide in [[graft.Sessions]]).
  *
  * AQE splits oversized *partitions* after the fact; salting prevents
  * the pile-up by construction, which matters when one join key holds
  * a double-digit percentage of a 100 TB fact table (AQE can split a
  * partition's files, but a single hot KEY still lands every row in
  * one reducer's hash bucket). The trade: the other side is replicated
  * `salts`× through the shuffle, so salt the side that's big-and-skewed
  * and keep `salts` small (8-32).
  */
object Salting {

  /** Equi-join with the left (skewed, large) side scattered across
    * `salts` sub-keys and the right side replicated once per salt.
    * Produces exactly the plain join's rows — only the shuffle layout
    * changes: the hot key's rows spread over `salts` reducers.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String], salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // deterministic scatter: hash every left column so duplicate rows
    // still spread; any even-ish distribution preserves correctness
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
