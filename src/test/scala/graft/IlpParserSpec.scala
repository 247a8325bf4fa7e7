package graft

import graft.streaming.IlpParser
import graft.streaming.IlpParser._
import org.scalatest.funsuite.AnyFunSuite

class IlpParserSpec extends AnyFunSuite {
  test("full line with tags, typed fields, timestamp") {
    val p = IlpParser.parse(
      """trades,sym=BTC-USD,side=buy price=66500.5,qty=0.25,lots=3i,ok=t,note="hi there" 1465839830100400200""").get
    assert(p.measurement == "trades")
    assert(p.tags == Map("sym" -> "BTC-USD", "side" -> "buy"))
    assert(p.fields("price") == F64(66500.5))
    assert(p.fields("qty") == F64(0.25))
    assert(p.fields("lots") == I64(3))
    assert(p.fields("ok") == Bool(true))
    assert(p.fields("note") == Str("hi there"))
    assert(p.tsNanos.contains(1465839830100400200L))
  }

  test("no tags, no timestamp") {
    val p = IlpParser.parse("cpu usage=0.93").get
    assert(p.measurement == "cpu" && p.tags.isEmpty && p.tsNanos.isEmpty)
    assert(p.fields("usage") == F64(0.93))
  }

  test("escaped separators in measurement/tags") {
    val p = IlpParser.parse("""my\,m,ta\ g=v\=1 f=1 100""").get
    assert(p.measurement == "my,m")
    assert(p.tags == Map("ta g" -> "v=1"))
  }

  test("escaped quote inside string field") {
    val p = IlpParser.parse("""m f="say \"hi\"" 5""").get
    assert(p.fields("f") == Str("""say "hi""""))
  }

  test("malformed lines return None, never throw") {
    for (bad <- Seq("", "  ", "# comment", "nofields", "m ", "m f=notanumber", "m f=1 notatime"))
      assert(IlpParser.parse(bad).isEmpty, s"expected None for: '$bad'")
  }

  test("negative and boolean variants") {
    val p = IlpParser.parse("m a=-4.5,b=-7i,c=false,d=T").get
    assert(p.fields("a") == F64(-4.5) && p.fields("b") == I64(-7))
    assert(p.fields("c") == Bool(false) && p.fields("d") == Bool(true))
  }
}
