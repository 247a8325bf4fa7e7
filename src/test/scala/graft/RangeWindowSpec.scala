package graft

import org.apache.spark.sql.Row

/** Sliding time-RANGE window frames (`RANGE BETWEEN K PRECEDING AND
  * CURRENT ROW`) for first_value/last_value/min/max are lowered to the
  * O(n) deque aggregate [[graft.functions.SlidingRangeAgg]] — Spark's
  * own sliding frame re-aggregates per row (O(rows × frame)) and times
  * out on dense series (reference WindowFunctionTest.java:2622 at 400k
  * rows). These tests pin (a) value parity against a brute-force
  * correlated-subquery oracle, and (b) the linear-time behavior.
  */
class RangeWindowSpec extends SparkSpec {

  private lazy val engine = Engine(spark, sfDir)

  private def setup(): Unit = {
    engine.sql("create table rw_tab (ts timestamp, i long, d double) timestamp(ts)")
    // every 3rd d NULL, two keys, 1µs spacing
    engine.sql(
      "insert into rw_tab select x::timestamp, x%2, " +
        "case when x % 3 = 0 then null else (x*2)::double end from long_sequence(500)")
  }

  private def brute(fn: String, ignoreNulls: Boolean): Array[Row] = {
    val filt = if (ignoreNulls) "and b.d is not null" else ""
    val pick = fn match {
      case "first_value" => "order by b.ts asc limit 1"
      case "last_value"  => "order by b.ts desc limit 1"
      case _             => "" // min/max use aggregate
    }
    val sel = fn match {
      case "min" => s"(select min(b.d) from rw_tab b where b.i = a.i and b.ts between a.ts - interval 50 microsecond and a.ts $filt)"
      case "max" => s"(select max(b.d) from rw_tab b where b.i = a.i and b.ts between a.ts - interval 50 microsecond and a.ts $filt)"
      case _ => s"(select b.d from rw_tab b where b.i = a.i and b.ts between a.ts - interval 50 microsecond and a.ts $filt $pick)"
    }
    spark.sql(s"select a.i, a.ts, $sel as v from rw_tab a order by a.i, a.ts").collect()
  }

  test("sliding RANGE first/last/min/max match the brute-force oracle") {
    setup()
    try {
      for ((fn, ig) <- Seq(("first_value", true), ("first_value", false),
                           ("last_value", true), ("last_value", false),
                           ("min", false), ("max", false))) {
        val nulls = if (fn.endsWith("_value")) { if (ig) "ignore nulls" else "respect nulls" } else ""
        val got = engine.sql(
          s"select i, ts, $fn(d) $nulls over (partition by i order by ts " +
            "range between 50 preceding and current row) as v " +
            "from rw_tab order by i, ts").collect()
        val want = brute(fn, ig || !fn.endsWith("_value"))
        assert(got.length == want.length, s"$fn ig=$ig row count")
        got.zip(want).zipWithIndex.foreach { case ((g, w), idx) =>
          assert(g.getAs[Any]("v") == w.getAs[Any]("v"),
            s"$fn ig=$ig row $idx: got ${g} want ${w}")
        }
      }
    } finally spark.sql("drop table if exists rw_tab")
  }

  test("sliding RANGE frame is linear-time (plan uses __w_slide, not Spark's sliding frame)") {
    setup()
    try {
      val df = engine.sql(
        "select max(ts) over (partition by i order by ts " +
          "range between 80000 preceding and current row) as m from rw_tab")
      val plan = df.queryExecution.analyzed.toString
      assert(plan.contains("__w_slide"), s"expected __w_slide lowering in:\n$plan")
      assert(plan.toLowerCase.contains("unboundedpreceding"),
        "expected running frame (incremental evaluation) in plan")
      // type preservation: max over a timestamp stays a timestamp
      assert(df.schema("m").dataType.typeName == "timestamp")
    } finally spark.sql("drop table if exists rw_tab")
  }
}
