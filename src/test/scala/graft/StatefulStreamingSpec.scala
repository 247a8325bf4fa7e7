package graft

import graft.streaming.Stateful
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Live (stateful) streaming operators: LATEST ON, DEDUP, EMA with
  * cross-micro-batch managed state.
  */
class StatefulStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming LATEST ON keeps one row per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val df = in.toDF().toDF("sym", "ts", "price")
    val q = Stateful.latestOn(df, "ts", Seq("sym")).writeStream
      .format("memory").queryName("latest_t").outputMode("update").start()
    try {
      in.addData(("A", ts("2024-01-01 10:00:00"), 10.0),
                 ("A", ts("2024-01-01 11:00:00"), 11.0),
                 ("B", ts("2024-01-01 10:30:00"), 99.0))
      q.processAllAvailable()
      // batch 2: stale A row (must NOT displace 11:00), fresh B row
      in.addData(("A", ts("2024-01-01 09:00:00"), 9.0),
                 ("B", ts("2024-01-01 12:00:00"), 98.0))
      q.processAllAvailable()
      val latest = spark.table("latest_t")
        .groupBy($"sym").agg(max_by(struct($"ts", $"price"), $"ts").as("r"))
        .select($"sym", $"r.ts", $"r.price").collect()
        .map(r => r.getString(0) -> (r.getTimestamp(1), r.getDouble(2))).toMap
      assert(latest("A") == ((ts("2024-01-01 11:00:00"), 11.0)))
      assert(latest("B") == ((ts("2024-01-01 12:00:00"), 98.0)))
      // the stale batch-2 A row emitted nothing: only 1 update row for A at 11:00
      val aRows = spark.table("latest_t").filter($"sym" === "A").collect()
      assert(aRows.forall(_.getDouble(2) >= 10.0))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within TTL, first row wins") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val df = in.toDF().toDF("sym", "ts", "price")
      .withWatermark("ts", "1 hour")
    val q = Stateful.dedup(df, "ts", Seq("sym"), java.time.Duration.ofDays(365))
      .writeStream.format("memory").queryName("dedup_t").outputMode("append").start()
    try {
      in.addData(("A", ts("2024-01-01 10:00:00"), 10.0),
                 ("A", ts("2024-01-01 10:05:00"), 10.5), // same-batch dup
                 ("B", ts("2024-01-01 10:00:00"), 99.0))
      q.processAllAvailable()
      in.addData(("A", ts("2024-01-01 10:10:00"), 11.0), // cross-batch dup
                 ("C", ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_t").collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(rows == Map("A" -> 10.0, "B" -> 99.0, "C" -> 1.0))
    } finally q.stop()
  }

  test("streaming EMA state carries across micro-batches (matches batch Ema)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val df = in.toDF().toDF("sym", "ts", "price")
    val alpha = 0.5
    val q = Stateful.ema(df, "ts", Seq("sym"), "price", alpha, "ema")
      .writeStream.format("memory").queryName("ema_t").outputMode("append").start()
    try {
      in.addData(("A", ts("2024-01-01 10:00:00"), 10.0),
                 ("A", ts("2024-01-01 10:01:00"), 20.0))
      q.processAllAvailable()
      in.addData(("A", ts("2024-01-01 10:02:00"), 30.0))
      q.processAllAvailable()
      val got = spark.table("ema_t").orderBy($"ts")
        .select($"ema").as[Double].collect().toSeq
      // batch fold: 10 → .5·20+.5·10=15 → .5·30+.5·15=22.5 (state crossed batches)
      assert(got == Seq(10.0, 15.0, 22.5))
      // must equal the batch operator on the union of the inputs
      val batch = graft.ops.Ema.ema(
        Seq(("A", ts("2024-01-01 10:00:00"), 10.0),
            ("A", ts("2024-01-01 10:01:00"), 20.0),
            ("A", ts("2024-01-01 10:02:00"), 30.0)).toDF("sym", "ts", "price"),
        "ts", Seq("sym"), "price", alpha, "ema")
        .orderBy($"ts").select($"ema").as[Double].collect().toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming topK maintains a bounded per-key ranking across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val df = in.toDF().toDF("sym", "ord", "id")
    val q = Stateful.topK(df, Seq("sym"), "ord", "id", 2).writeStream
      .format("memory").queryName("topk_t").outputMode("update").start()
    try {
      in.addData(("A", 30L, 3L), ("A", 10L, 1L), ("B", 5L, 9L))
      q.processAllAvailable()
      // batch 2: 20 displaces 30 for A; a worse row (50) changes nothing
      in.addData(("A", 20L, 2L), ("A", 50L, 5L))
      q.processAllAvailable()
      // memory sink appends updates in order, so the last rows per key
      // are the current ranking
      val aRows = spark.table("topk_t").filter($"sym" === "A")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      // final ranking for A must be [(1,10,1),(2,20,2)] — present as the
      // last two emitted rows
      assert(aRows.takeRight(2).toSeq == Seq((1, 10L, 1L), (2, 20L, 2L)))
      val bRows = spark.table("topk_t").filter($"sym" === "B")
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      assert(bRows.toSeq == Seq((1, 5L, 9L))) // untouched by batch 2
      // batch 3: no change for A → nothing re-emitted
      val aCount = aRows.length
      in.addData(("A", 99L, 7L))
      q.processAllAvailable()
      val aCount2 = spark.table("topk_t").filter($"sym" === "A").count()
      assert(aCount2 == aCount)
    } finally q.stop()
  }
}
