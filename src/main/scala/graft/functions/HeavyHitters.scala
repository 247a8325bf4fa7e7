package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Heavy hitters via a mergeable Misra–Gries (space-saving family)
  * summary — the corpus-scale answer to "which templates/boilerplate
  * strings dominate this table" without a full GROUP BY of unbounded
  * cardinality. The reference has no sketch like this (its `mode()` is
  * exact); a 100 TB training-data pipeline needs the bounded-memory
  * form: the summary holds at most `capacity` counters regardless of
  * input cardinality, partial-aggregates map-side, and merges
  * associatively across partitions (Agarwal et al., "Mergeable Summaries",
  * PODS'12: pointwise sum then subtract the (capacity+1)-th largest
  * weight).
  *
  * Guarantees: for every item, `cnt_lo ≤ true_count ≤ cnt_lo + err`,
  * with `err ≤ N / (capacity + 1)` over N rows. When `capacity ≥`
  * the true distinct count nothing is ever evicted, `err = 0`, and
  * counts are exact — the oracle-checkable regime.
  */
object HeavyHitters {

  /** One reported item: `cnt` is a lower bound on the true count; the
    * true count is at most `cnt + err`, where `err` is the summary's
    * total decremented weight (shared by every item, including absent
    * ones — an unreported item's true count is ≤ `err`).
    */
  final case class Counter(item: String, cnt: Long, err: Long)

  /** Buffer = (counters, total decremented weight D). Invariant after
    * any reduce/merge sequence: for every item, `c ≤ true ≤ c + D`
    * (absent ⇒ `true ≤ D`), and each unit of D accounts for ≥ `capacity`
    * units of dropped weight, so `D ≤ N / capacity`.
    */
  final class MisraGries(capacity: Int, k: Int)
    extends Aggregator[String, (Map[String, Long], Long), Seq[Counter]] {

    def zero: (Map[String, Long], Long) = (Map.empty, 0L)

    def reduce(b: (Map[String, Long], Long), item: String): (Map[String, Long], Long) = {
      if (item == null) return b
      val (m, d) = b
      m.get(item) match {
        case Some(c) => (m.updated(item, c + 1), d)
        case None if m.size < capacity => (m.updated(item, 1L), d)
        case None =>
          // batched decrement: drop the floor (min count) from every
          // counter — at least one hits zero, freeing a slot
          val floor = m.valuesIterator.min
          val kept = m.iterator.collect { case (i, c) if c > floor => i -> (c - floor) }.toMap
          (kept.updated(item, 1L), d + floor)
      }
    }

    def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)):
        (Map[String, Long], Long) = {
      val (ma, da) = a
      val (mb, db) = b
      if (ma.isEmpty) return (mb, da + db)
      if (mb.isEmpty) return (ma, da + db)
      // pointwise sum, then subtract the (capacity+1)-th largest weight
      // (Mergeable Summaries, PODS'12) — both bounds survive because the
      // subtracted cut moves from the counts into D
      val sum = (ma.keySet ++ mb.keySet).iterator
        .map(i => i -> (ma.getOrElse(i, 0L) + mb.getOrElse(i, 0L))).toMap
      if (sum.size <= capacity) (sum, da + db)
      else {
        val sorted = sum.toSeq.sortBy { case (i, c) => (-c, i) }
        val cut = sorted(capacity)._2
        (sorted.take(capacity).iterator.collect {
          case (i, c) if c > cut => i -> (c - cut)
        }.toMap, da + db + cut)
      }
    }

    def finish(b: (Map[String, Long], Long)): Seq[Counter] =
      b._1.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
        .map { case (i, c) => Counter(i, c, b._2) }

    def bufferEncoder: Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Counter]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-`k` heavy hitters of a string column with at most `capacity`
    * counters held per partial aggregate.
    */
  def heavyHitters(c: Column, k: Int, capacity: Int = 256): Column =
    udaf(new MisraGries(capacity, k)).apply(c)
}
