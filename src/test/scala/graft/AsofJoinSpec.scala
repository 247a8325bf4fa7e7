package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._
import scala.util.Random

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0, us * 1000))

  // deterministic random fixture; slave ts unique (j*4997 mod 1e6 is a
  // permutation) so the asof match is well-defined under ties
  private val rnd = new Random(42)
  private lazy val master = (1 to 300).map { i =>
    (i.toLong, ts(rnd.nextInt(1000000).toLong * 1000), (rnd.nextInt(3) + 1).toLong)
  }.toDF("mid", "ts", "k")
  private lazy val slaveRows = (1 to 200).map { j =>
    (j.toLong, ts((j.toLong * 4997 % 1000000) * 1000), (rnd.nextInt(3) + 1).toLong, rnd.nextDouble())
  }
  private lazy val slave = slaveRows
    .toDF("sid", "ts", "k", "sv")
    .select($"k", $"ts", $"ts".as("s_ts"), $"sid", $"sv")

  /** O(n·m) reference implementation. */
  private def naive(strict: Boolean, tolUs: Option[Long]): Map[Long, Option[Long]] = {
    val ms = master.collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
      r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)))
    val ss = slaveRows.map(s => (s._1, s._2.getTime * 1000 + s._2.getNanos / 1000 % 1000, s._3))
    ms.map { case (mid, mts, mk) =>
      val cands = ss.filter { case (_, sts, sk) =>
        sk == mk && (if (strict) sts < mts else sts <= mts) &&
          tolUs.forall(t => mts - sts <= t)
      }
      // latest ts, then greatest sid as tiebreak is NOT defined — fixture has unique ts per key
      mid -> (if (cands.isEmpty) None else Some(cands.maxBy(c => (c._2, c._1))._1))
    }.toMap
  }

  private def run(strict: Boolean, tolUs: Option[Long]): Map[Long, Option[Long]] =
    AsofJoin.asofKeyed(master, slave, "ts", "ts", Seq("k"), Seq("s_ts", "sid", "sv"),
      strict = strict, toleranceMicros = tolUs)
      .select($"mid", $"sid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("keyed asof matches naive oracle") { assert(run(strict = false, None) == naive(strict = false, None)) }
  test("keyed lt (strict) matches naive oracle") { assert(run(strict = true, None) == naive(strict = true, None)) }
  test("tolerance nulls out stale matches") {
    assert(run(strict = false, Some(50000L * 1000)) == naive(strict = false, Some(50000L * 1000)))
  }

  test("broadcast no-key variant agrees with keyed on single-key data") {
    val m1 = master.filter($"k" === 1L)
    val s1 = slave.filter($"k" === 1L)
    val keyed = AsofJoin.asofKeyed(m1, s1, "ts", "ts", Seq("k"), Seq("sid"))
      .select($"mid", $"sid").collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val bcast = AsofJoin.asofBroadcastNoKey(m1, s1.drop("k"), "ts", "ts", Seq("sid"))
      .select($"mid", $"sid").collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(keyed == bcast)
  }

  test("native sorted-merge exec agrees with the window lowering") {
    for (strict <- Seq(false, true)) {
      val native = AsofJoin.asofKeyedNative(master, slave, "ts", "ts",
        Seq("k"), Seq("s_ts", "sid", "sv"), strict = strict)
        .select($"mid", $"sid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(native == naive(strict, None), s"strict=$strict")
    }
  }

  test("native exec honours TOLERANCE") {
    val tol = Some(50000L * 1000)
    val native = AsofJoin.asofKeyedNative(master, slave, "ts", "ts",
      Seq("k"), Seq("s_ts", "sid", "sv"), toleranceMicros = tol)
      .select($"mid", $"sid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(native == naive(strict = false, tol))
  }

  test("native exec self-join (shared exprIds) resolves cleanly") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "value")
    val m = ev.filter($"value" > 100.0)
    val s = ev.select($"user_id", $"ts", $"ts".as("s_ts"), $"value".as("sv"))
    val out = AsofJoin.asofKeyedNative(m, s, "ts", "ts", Seq("user_id"), Seq("s_ts", "sv"))
    assert(out.count() == m.count())
    assert(out.filter($"s_ts" > $"ts").count() == 0)
  }

  test("native exec with string keys survives sorter spill (keys copied out of reused buffers)") {
    // Force UnsafeExternalSorter to spill every 64 rows: the spill
    // reader reuses one row buffer, so un-copied UTF8String keys held
    // across advances would silently mutate. Conf is read from
    // SparkEnv.conf at sorter creation — mutable in local mode.
    val conf = org.apache.spark.SparkEnv.get.conf
    val key = "spark.shuffle.spill.numElementsForceSpillThreshold"
    val prev = conf.getOption(key)
    conf.set(key, "64")
    try {
      val m2 = master.withColumn("ks", concat(lit("key_"), $"k".cast("string"))).drop("k")
      val s2 = slave.withColumn("ks", concat(lit("key_"), $"k".cast("string"))).drop("k")
      val native = AsofJoin.asofKeyedNative(m2, s2, "ts", "ts", Seq("ks"), Seq("s_ts", "sid", "sv"))
        .select($"mid", $"sid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(native == naive(strict = false, None))
    } finally {
      prev match { case Some(v) => conf.set(key, v); case None => conf.remove(key) }
    }
  }

  test("slave ties on (key, ts) resolve deterministically to the greatest payload struct") {
    val m = Seq((1L, ts(100L * 1000000), 1L)).toDF("mid", "ts", "k")
    val dup = (1 to 40).map(j => (j.toLong, ts(50L * 1000000), 1L, j.toDouble))
    val s = dup.toDF("sid", "ts", "k", "sv")
      .select($"k", $"ts", $"ts".as("s_ts"), $"sid", $"sv")
      .repartition(8) // scramble partition order; result must not depend on it
    val picked = (1 to 5).map { _ =>
      AsofJoin.asofKeyed(m, s, "ts", "ts", Seq("k"), Seq("s_ts", "sid", "sv"))
        .select($"sid").head().getLong(0)
    }
    // greatest struct = (max s_ts, then max sid) → sid 40, stable across runs
    assert(picked.toSet == Set(40L))
  }

  test("splice emits every row from both sides") {
    val p = master.select($"k", $"ts", $"mid")
    val c = slave.select($"k", $"ts", $"sid")
    val out = AsofJoin.splice(p, c, "ts", "ts", Seq("k"), Seq("mid"), Seq("sid"))
    assert(out.count() == master.count() + slaveRows.size)
    // every master row carries the same slave match as asof
    val fromSplice = out.filter($"side" === 1).select($"mid", $"sid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(fromSplice == naive(strict = false, None))
  }
}
