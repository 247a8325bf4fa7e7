package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def counters(rows: Seq[Row]): Seq[(String, Long, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: capacity >= NDV reproduces GROUP BY counts, zero err") {
    val df = (1 to 1000).map(i => s"k${i % 7}").toDF("s")
    val hh = counters(df.agg(HeavyHitters.heavyHitters($"s", 7, 16).as("hh"))
      .select(explode($"hh")).select("col.*").collect().toSeq
      .map(r => Row(r.getString(0), r.getLong(1), r.getLong(2))))
    val exact = df.groupBy($"s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh.size == 7)
    assert(hh.forall { case (i, c, e) => e == 0L && exact(i) == c })
  }

  test("approximate regime: bounds contain truth, top-1 found, partition-invariant") {
    // 50% one hot template + a 97-item tail — the boilerplate-detection shape
    val rows = (0 until 20000).map(i => if (i % 2 == 0) "hot" else s"t${i % 97}")
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 16)) {
      val df = rows.toDF("s").repartition(parts)
      val hh = df.agg(HeavyHitters.heavyHitters($"s", 5, 16).as("hh"))
        .select(explode($"hh")).select("col.*").collect().toSeq
      val cs = counters(hh.map(r => Row(r.getString(0), r.getLong(1), r.getLong(2))))
      assert(cs.head._1 == "hot", s"parts=$parts top-1 was ${cs.head}")
      // every reported item's true count sits in [cnt, cnt + err]
      assert(cs.forall { case (i, c, e) =>
        val t = truth.getOrElse(i, 0L); c <= t && t <= c + e
      }, s"parts=$parts bounds violated: $cs")
      // summary error stays within the advertised N/capacity envelope
      assert(cs.forall { case (_, _, e) => e <= 20000 / 16 * 2 }, s"parts=$parts err blew up: $cs")
    }
  }

  test("null inputs are ignored; empty input yields empty summary") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("s")
    val hh = df.agg(HeavyHitters.heavyHitters($"s", 3, 8).as("hh"))
      .select(explode($"hh")).select("col.*").collect().toSeq
    assert(counters(hh.map(r => Row(r.getString(0), r.getLong(1), r.getLong(2)))) ==
      Seq(("a", 2L, 0L), ("b", 1L, 0L)))
    val empty = Seq.empty[String].toDF("s")
      .agg(HeavyHitters.heavyHitters($"s", 3, 8).as("hh")).head().getSeq[Row](0)
    assert(empty.isEmpty)
  }
}
