package graft

import graft.ops._
import graft.functions.Aggregators
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("SampleBy FILL(LINEAR) interpolates gaps, leaves edges null") {
    // buckets: 0h present(10.0), 1h gap, 2h gap, 3h present(40.0)
    val df = Seq(
      (ts(600), 10.0), (ts(3600 * 3 + 60), 40.0)
    ).toDF("t", "v")
    val out = SampleBy.sampleBy(df, "t", "1 hour", Nil,
      Seq("avg_v" -> avg($"v")), fill = SampleBy.FillLinear, tsOut = "b")
      .orderBy($"b").collect()
    assert(out.length == 4)
    assert(out(0).getDouble(1) == 10.0)
    assert(out(1).getDouble(1) == 20.0)
    assert(out(2).getDouble(1) == 30.0)
    assert(out(3).getDouble(1) == 40.0)
  }

  test("SampleBy FILL(PREV) carries values; FILL(const) substitutes") {
    val df = Seq((ts(60), 5.0), (ts(3600 * 2 + 60), 7.0)).toDF("t", "v")
    val prev = SampleBy.sampleBy(df, "t", "1 hour", Nil,
      Seq("m" -> max($"v")), fill = SampleBy.FillPrev, tsOut = "b").orderBy($"b").collect()
    assert(prev.map(_.getDouble(1)).toSeq == Seq(5.0, 5.0, 7.0))
    val const = SampleBy.sampleBy(df, "t", "1 hour", Nil,
      Seq("n" -> count(lit(1))), fill = SampleBy.FillConst(Map("n" -> 0L)), tsOut = "b")
      .orderBy($"b").collect()
    assert(const.map(_.getLong(1)).toSeq == Seq(1L, 0L, 1L))
  }

  test("SampleBy ALIGN TO CALENDAR TIME ZONE: DST-crossing day buckets land on local midnight") {
    // America/New_York spring-forward: 2024-03-10 02:00 EST → 03:00 EDT.
    // Day buckets must anchor at local midnight (05:00 UTC before the
    // switch, 04:00 UTC after) and the DST day spans only 23 hours.
    val rows = (0 until 72).map { h =>
      (java.sql.Timestamp.from(java.time.Instant.parse("2024-03-09T00:00:00Z")
        .plusSeconds(h * 3600L)), 1.0)
    }
    val out = SampleBy.sampleByCalendarTz(rows.toDF("t", "v"), "t", "day",
      "America/New_York", Nil, Seq("n" -> count(lit(1))), tsOut = "b")
      .orderBy($"b").collect()
    val buckets = out.map(r => r.getTimestamp(0).toInstant.toString -> r.getLong(1))
    // 2024-03-09 local midnight = 05:00Z (EST); 03-10 local midnight = 05:00Z;
    // 03-11 local midnight = 04:00Z (EDT) — the 03-10 bucket holds 23 rows
    assert(buckets.toMap.apply("2024-03-10T05:00:00Z") == 23L)
    assert(buckets.exists(_._1 == "2024-03-11T04:00:00Z"))
  }

  test("SampleBy explicit FROM/TO range extends the spine") {
    val df = Seq((ts(3600), 1.0)).toDF("t", "v")
    val out = SampleBy.sampleBy(df, "t", "1 hour", Nil,
      Seq("n" -> count(lit(1))),
      fill = SampleBy.FillConst(Map("n" -> 0L)),
      range = Some((ts(0), ts(3600 * 3))), tsOut = "b").orderBy($"b").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 0L, 0L))
  }

  test("LatestOn picks the last row per key with WHERE-before semantics") {
    val df = Seq(
      (1L, ts(10), "a", 1.0), (1L, ts(20), "b", 2.0), (1L, ts(30), "c", 0.5),
      (2L, ts(5), "d", 9.0)
    ).toDF("k", "t", "tag", "v")
    val latest = LatestOn.latestOn(df, "t", Seq("k")).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(latest == Seq((1L, "c"), (2L, "d")))
    // filter first, then latest
    val filtered = LatestOn.latestOn(df.filter($"v" >= 1.0), "t", Seq("k")).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(filtered == Seq((1L, "b"), (2L, "d")))
  }

  test("Limits.tail returns last n in order; range handles negative bounds") {
    val df = (1 to 100).map(i => (i.toLong, i * 2)).toDF("id", "v")
    assert(Limits.tail(df, 3, Seq($"id")).collect().map(_.getLong(0)).toSeq == Seq(98L, 99L, 100L))
    assert(Limits.range(df, 0, 5, Seq($"id")).collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(Limits.range(df, -5, -2, Seq($"id")).collect().map(_.getLong(0)).toSeq == (96L to 98L))
    assert(Limits.range(df, 95, -2, Seq($"id")).collect().map(_.getLong(0)).toSeq == (96L to 98L))
  }

  test("Ema matches the recursive definition per key") {
    val df = Seq((1L, ts(1), 10.0), (1L, ts(2), 20.0), (1L, ts(3), 40.0),
      (2L, ts(1), 100.0), (2L, ts(2), 0.0)).toDF("k", "t", "v")
    val out = Ema.ema(df, "t", Seq("k"), "v", 0.5, "e")
      .orderBy($"k", $"t").collect().map(_.getDouble(3)).toSeq
    assert(out == Seq(10.0, 15.0, 27.5, 100.0, 50.0))
  }

  test("GROUPS frame + EXCLUDE variants match hand-computed values") {
    // one partition; peer groups by o: [a(1), b(2)] o=1 | [c(4)] o=2 | [d(8), e(16)] o=3
    val df = Seq(("a", 1, 1), ("b", 1, 2), ("c", 2, 4), ("d", 3, 8), ("e", 3, 16))
      .toDF("id", "o", "v").withColumn("k", lit("p"))
    val out = GroupsFrame.groupsSum(df, Seq("k"), "o", $"v", 1,
      GroupsFrame.NoOthers, "s")
    val s = out.orderBy($"id").collect().map(_.getAs[Long]("s")).toSeq
    // GROUPS 1 PRECEDING..CURRENT: a,b → 3; c → 3+4=7; d,e → 4+24=28
    assert(s == Seq(3L, 3L, 7L, 28L, 28L))
    val xg = GroupsFrame.groupsSum(df, Seq("k"), "o", $"v", 1,
      GroupsFrame.Group, "s").orderBy($"id").collect()
      .map(r => Option(r.getAs[Any]("s"))).toSeq
    // exclude own group: a,b → NULL (frame was only their group); c → 3; d,e → 4
    assert(xg == Seq(None, None, Some(3L), Some(4L), Some(4L)))
    val xt = GroupsFrame.groupsSum(df, Seq("k"), "o", $"v", 1,
      GroupsFrame.Ties, "s").orderBy($"id").collect().map(_.getAs[Long]("s")).toSeq
    // exclude ties: frame minus peers plus self: a→1, b→2, c→7, d→12, e→20
    assert(xt == Seq(1L, 2L, 7L, 12L, 20L))
  }

  test("ksum/nsum are within 1e-6 of the exact decimal sum") {
    val vals = Tables.events(spark, sfDir).select($"value")
    val exact = vals.agg(sum($"value".cast("decimal(24,6)"))).head().getDecimal(0).doubleValue()
    val k = vals.agg(Aggregators.ksum($"value")).head().getDouble(0)
    val n = vals.agg(Aggregators.nsum($"value")).head().getDouble(0)
    assert(math.abs(k - exact) < 1e-6 && math.abs(n - exact) < 1e-6)
  }

  test("WindowJoin counts slaves inside the time window only") {
    val m = Seq((1L, ts(100), 1L)).toDF("mid", "t", "k")
    val s = Seq((ts(96), 1L, 1.0), (ts(100), 1L, 2.0), (ts(106), 1L, 3.0), (ts(200), 1L, 9.0))
      .toDF("t", "k", "sv")
    val out = WindowJoin.windowJoin(m, s, "t", "t", Seq("k"), -5000000L, 5000000L,
      Seq("n" -> count($"sv"), "s" -> sum($"sv"))).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n") == 2L && out(0).getAs[Double]("s") == 3.0)
  }

  test("WindowJoin emits one row per master row, including exact duplicates") {
    // reference WindowJoinRecordCursorFactory: duplicated masters each
    // get their own aggregated output row (not collapsed)
    val m = Seq((1L, ts(100), 1L), (1L, ts(100), 1L), (2L, ts(100), 1L))
      .toDF("mid", "t", "k")
    val s = Seq((ts(99), 1L, 2.0), (ts(101), 1L, 3.0)).toDF("t", "k", "sv")
    val out = WindowJoin.windowJoin(m, s, "t", "t", Seq("k"), -5000000L, 5000000L,
      Seq("n" -> count($"sv"), "s" -> sum($"sv")))
    assert(out.count() == 3)
    val dups = out.filter($"mid" === 1L).collect()
    assert(dups.length == 2 &&
      dups.forall(r => r.getAs[Long]("n") == 2L && r.getAs[Double]("s") == 5.0))

    val prev = WindowJoin.windowJoinPrevailing(m, s, "t", "t", Seq("k"), Seq("sv"),
      -1000000L, 5000000L, Seq("n" -> count($"sv"), "s" -> sum($"sv")))
    assert(prev.count() == 3)
    // window starts at t-1s=99 → in-window {2.0 (t=99), 3.0 (t=101)}; no
    // strictly-prevailing row before 99 → n=2, s=5 per master duplicate
    val pd = prev.filter($"mid" === 1L).collect()
    assert(pd.length == 2 &&
      pd.forall(r => r.getAs[Long]("n") == 2L && r.getAs[Double]("s") == 5.0))
  }

  test("WindowJoin INCLUDE PREVAILING adds the latest pre-window slave") {
    val m = Seq((1L, ts(100), 1L)).toDF("mid", "t", "k")
    val s = Seq((ts(90), 1L, 7.0), (ts(95), 1L, 2.0), (ts(101), 1L, 3.0))
      .toDF("t", "k", "sv")
    // window [99, 105]: in-window {3.0}; prevailing (latest < 99) = 2.0
    val out = WindowJoin.windowJoinPrevailing(m, s, "t", "t", Seq("k"), Seq("sv"),
      -1000000L, 5000000L, Seq("n" -> count($"sv"), "s" -> sum($"sv"))).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n") == 2L && out(0).getAs[Double]("s") == 5.0)
  }

  test("saltedJoin: exact plain-join results under skew, salt reaches the join keys") {
    // 90% of rows share one hot key — the shape salting exists for
    val fact = (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot", i * 1.5))
      .toDF("id", "k", "v")
    val dim = Seq(("hot", 1), ("k0", 2), ("k3", 3), ("zz", 9)).toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, Seq("k"), jt).select($"id", $"k", $"v", $"w")
        .collect().map(_.toString).sorted
      val salted = graft.ops.Salting.saltedJoin(fact, dim, Seq("k"), 8, jt)
        .select($"id", $"k", $"v", $"w").collect().map(_.toString).sorted
      assert(salted.sameElements(plain), s"joinType=$jt diverged")
    }
    val p = graft.ops.Salting.saltedJoin(fact, dim, Seq("k"), 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p) // the scatter key actually participates
  }
}
