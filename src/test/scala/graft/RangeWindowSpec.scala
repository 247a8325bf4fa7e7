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

  test("SlidingRangeAgg.merge: random shards, random merge order, all six modes") {
    // __w_slide is session-registered, so grouped/partial-aggregate use
    // reaches merge() with Spark's ARBITRARY partition merge order —
    // the sorted two-pointer merge + dominance re-application must
    // match a brute-force oracle for every mode
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import graft.functions.{SlidingRangeAgg, SlideBuf}
    val rnd = new scala.util.Random(20260815L)
    val bound = 50L
    for (trial <- 1 to 60; mode <- Seq("first", "first_in", "last", "last_in", "min", "max")) {
      val n = 1 + rnd.nextInt(150)
      // strictly increasing keys so shard key-ranges are disjoint
      val keys = Array.iterate(100L, n)(_ + 1 + rnd.nextInt(5))
      val vals: Array[Any] = Array.fill(n)(
        if (rnd.nextDouble() < 0.25) null else rnd.nextInt(40).toDouble)
      val agg = SlidingRangeAgg(
        BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = false), bound, mode)
      // split into 1..6 contiguous shards, update each into its own buffer
      val cuts = (0 +: Seq.fill(rnd.nextInt(5))(rnd.nextInt(n)) :+ n).distinct.sorted
      val bufs: Seq[SlideBuf] = cuts.zip(cuts.tail).map { case (a, b) =>
        val buf = agg.createAggregationBuffer()
        (a until b).foreach(i => agg.update(buf, InternalRow(vals(i), keys(i))))
        buf
      }
      // merge in a random order
      val merged = rnd.shuffle(bufs).reduce((x, y) => agg.merge(x, y))
      val got = agg.eval(merged)
      // brute force over the frame ending at the max key
      val curKey = keys.last
      val inFrame = (0 until n).filter(i => keys(i) >= curKey - bound)
      val want: Any = mode match {
        case "first"    => inFrame.headOption.map(vals).orNull
        case "first_in" => inFrame.find(vals(_) != null).map(vals).orNull
        case "last"     => inFrame.lastOption.map(vals).orNull
        case "last_in"  => inFrame.reverse.find(vals(_) != null).map(vals).orNull
        case "min"      => val xs = inFrame.map(vals).filter(_ != null); if (xs.isEmpty) null else xs.map(_.asInstanceOf[Double]).min
        case "max"      => val xs = inFrame.map(vals).filter(_ != null); if (xs.isEmpty) null else xs.map(_.asInstanceOf[Double]).max
      }
      assert(got == want, s"trial=$trial mode=$mode shards=${cuts.size - 1}: got $got want $want " +
        s"keys=${keys.mkString(",")} vals=${vals.mkString(",")}")
    }
  }
}
