package graft

import graft.functions.Long256Ops
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property test: the native 256-bit add kernel matches a BigInteger
  * oracle (mod 2^256) on arbitrary operands — carry chains, wraparound
  * and short-form inputs included — and parse/format round-trips.
  */
object Long256Props extends Properties("long256") {

  private val TwoTo256 = java.math.BigInteger.ONE.shiftLeft(256)

  // arbitrary 256-bit values, biased toward carry-heavy shapes
  private val genValue: Gen[java.math.BigInteger] = Gen.frequency(
    4 -> Gen.listOfN(64, Gen.hexChar).map(ds => new java.math.BigInteger(ds.mkString, 16)),
    2 -> Gen.chooseNum(0L, Long.MaxValue).map(java.math.BigInteger.valueOf),
    // all-ones tails: the inputs that ripple carries across limbs
    2 -> Gen.chooseNum(1, 64).map(k => java.math.BigInteger.ONE.shiftLeft(4 * k)
      .subtract(java.math.BigInteger.ONE)),
    1 -> Gen.const(TwoTo256.subtract(java.math.BigInteger.ONE)),
    1 -> Gen.const(java.math.BigInteger.ZERO))

  private def canonical(v: java.math.BigInteger): String =
    "0x" + ("0" * 64 + v.toString(16)).takeRight(64)

  property("add matches BigInteger mod 2^256") =
    Prop.forAll(genValue, genValue) { (a, b) =>
      val expect = canonical(a.add(b).mod(TwoTo256))
      val got = Long256Ops.add(
        UTF8String.fromString(canonical(a)), UTF8String.fromString(canonical(b)))
      got != null && got.toString == expect
    }

  property("short-form (untrimmed) inputs parse to the same sum") =
    Prop.forAll(genValue, genValue) { (a, b) =>
      val short = (v: java.math.BigInteger) => "0x" + v.toString(16)
      val got = Long256Ops.add(
        UTF8String.fromString(short(a)), UTF8String.fromString(short(b)))
      got != null && got.toString == canonical(a.add(b).mod(TwoTo256))
    }

  property("parse/format round-trip") =
    Prop.forAll(genValue) { v =>
      Long256Ops.format(Long256Ops.parse(canonical(v))) == canonical(v)
    }

  property("display form strips to even length and re-parses to the same value") =
    Prop.forAll(genValue) { v =>
      val d = Long256Ops.displayForm(UTF8String.fromString(canonical(v))).toString
      d.length % 2 == 0 && // "0x" + even digit count
        new java.math.BigInteger(d.substring(2), 16) == v
    }
}
