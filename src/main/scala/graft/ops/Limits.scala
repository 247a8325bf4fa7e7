package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** QuestDB LIMIT semantics beyond ANSI:
  * `LIMIT -n` returns the *last* n rows in the given (designated-ts)
  * order; `LIMIT lo, hi` slices, with negative bounds counted from the
  * end (reference `engine/LimitRecordCursorFactory.java:336-377`).
  *
  * Lowering: a tail is a reverse-order top-k (Spark plans
  * `TakeOrderedAndProject` — per-partition heap + single merge, no full
  * sort, no count pre-pass) re-sorted forward. Scales: k rows hit the
  * driver-side merge only at the final `limit`, identical to any top-k.
  */
object Limits {
  /** Last `n` rows of `df` under ascending `order` (LIMIT -n). */
  def tail(df: DataFrame, n: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order.map(_.desc): _*).limit(n).orderBy(order.map(_.asc): _*)

  /** First `n` rows (plain LIMIT n) — for symmetry. */
  def head(df: DataFrame, n: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order.map(_.asc): _*).limit(n)

  /** LIMIT lo, hi with either bound negative (offsets from the end).
    * Both engines resolve the slice [lo, hi) over the totally-ordered
    * result; implemented with a window-free two-sided trim so no global
    * row-numbering shuffle is needed for the common (positive, negative)
    * case.
    */
  def range(df: DataFrame, lo: Long, hi: Long, order: Seq[Column]): DataFrame = {
    val asc = order.map(_.asc)
    // offset-then-limit (not limit-then-offset): the planner fuses
    // Limit(Offset(Sort)) into TakeOrderedAndProject — per-partition
    // heaps + one driver merge. The reversed nesting plans a
    // single-partition global limit, which serializes the whole table
    // through one task.
    if (lo >= 0 && hi >= 0) {
      df.orderBy(asc: _*).offset(lo.toInt).limit(math.max(0L, hi - lo).toInt)
    } else {
      // A negative bound needs the total count (parquet-stats-cheap).
      val n = df.count()
      val start = math.min(n, if (lo >= 0) lo else math.max(0L, n + lo))
      val end = if (hi >= 0) math.min(hi, n) else math.max(0L, n + hi)
      df.orderBy(asc: _*).offset(start.toInt).limit(math.max(0L, end - start).toInt)
    }
  }
}
