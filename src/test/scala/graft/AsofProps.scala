package graft

import graft.ops.AsofJoin
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

/** Property test: keyed ASOF/LT joins match a naive O(n·m) oracle on
  * arbitrary (small) inputs — empty sides, key misses, equal-timestamp
  * boundaries (strict vs non-strict) included.
  */
object AsofProps extends Properties("asofKeyed") {
  private lazy val spark = Sessions.local(4)

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // master ticks land on multiples of 100; slave ticks are t*100+i+1 —
  // unique, and equal-tick collisions with masters are impossible except
  // when i+1 ≡ 0 (mod 100), exercising both < and <= paths cleanly.
  private val genRows: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] = for {
    nm <- Gen.chooseNum(0, 25)
    ns <- Gen.chooseNum(0, 25)
    m <- Gen.listOfN(nm, Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(1L, 3L)))
    s <- Gen.listOfN(ns, Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(1L, 3L)))
  } yield (
    m.zipWithIndex.map { case ((t, k), i) => (i.toLong, t * 100, k) },
    s.zipWithIndex.map { case ((t, k), i) => (i.toLong + 1000, t * 100 + i + 1, k) })

  property("matches naive oracle (strict and non-strict)") =
    Prop.forAll(genRows) { case (mRows, sRows) =>
      import spark.implicits._
      val master = mRows.toDF("mid", "tick", "k")
        .select($"mid", $"k", expr("timestamp_micros(tick * 1000)").as("ts"))
      val slave = sRows.toDF("sid", "tick", "k")
        .select($"sid", $"k", expr("timestamp_micros(tick * 1000)").as("ts"),
          expr("timestamp_micros(tick * 1000)").as("s_ts"))

      def naive(strict: Boolean): Map[Long, Option[Long]] =
        mRows.map { case (mid, mt, mk) =>
          val cands = sRows.filter { case (_, st, sk) =>
            sk == mk && (if (strict) st < mt else st <= mt)
          }
          mid -> (if (cands.isEmpty) None else Some(cands.maxBy(c => (c._2, c._1))._1))
        }.toMap

      def run(strict: Boolean,
              lower: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                      String, String, Seq[String], Seq[String], Boolean,
                      Option[Long]) => org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        lower(master, slave, "ts", "ts", Seq("k"), Seq("s_ts", "sid"), strict, None)
          .select($"mid", $"sid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      // both lowerings must satisfy the contract
      Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
           String, String, Seq[String], Seq[String], Boolean,
           Option[Long]) => org.apache.spark.sql.DataFrame](
        AsofJoin.asofKeyedWindow, AsofJoin.asofKeyedNative).forall { lower =>
        run(strict = false, lower) == naive(strict = false) &&
          run(strict = true, lower) == naive(strict = true)
      }
    }

  property("no-key range-bucketed merge matches naive oracle") =
    Prop.forAll(genRows) { case (mRows, sRows) =>
      import spark.implicits._
      val master = mRows.toDF("mid", "tick", "k")
        .select($"mid", $"k", expr("timestamp_micros(tick * 1000)").as("ts"))
      val slave = sRows.toDF("sid", "tick", "k")
        .select(expr("timestamp_micros(tick * 1000)").as("ts"),
          expr("timestamp_micros(tick * 1000)").as("s_ts"), $"sid")

      def naive(strict: Boolean): Map[Long, Option[Long]] =
        mRows.map { case (mid, mt, _) =>
          val cands = sRows.filter { case (_, st, _) => if (strict) st < mt else st <= mt }
          mid -> (if (cands.isEmpty) None else Some(cands.maxBy(c => (c._2, c._1))._1))
        }.toMap

      Seq(false, true).forall { strict =>
        // few buckets force cross-bucket carry seams
        val got = AsofJoin.asofRangeNoKey(master, slave, "ts", "ts",
          Seq("s_ts", "sid"), strict = strict, buckets = 3)
          .select($"mid", $"sid").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        got == naive(strict)
      }
    }
}
