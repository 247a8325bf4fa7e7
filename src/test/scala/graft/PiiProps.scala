package graft

import graft.pipeline.Pii
import org.scalacheck.{Gen, Prop, Properties}

/** Property test: generated PII of each category is always detected
  * and fully redacted; near-miss shapes never match; redaction output
  * contains no residue of the original match.
  */
object PiiProps extends Properties("pii") {

  private def re(p: String) = p.r

  private val genEmail: Gen[String] = for {
    local <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    tag <- Gen.oneOf("", ".x", "+tag", "_u", "%e")
    host <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    tld <- Gen.oneOf("com", "org", "io", "museum")
  } yield s"$local$tag@$host.$tld"

  private val genSsn: Gen[String] = for {
    a <- Gen.chooseNum(100, 999); b <- Gen.chooseNum(10, 99); c <- Gen.chooseNum(1000, 9999)
  } yield s"$a-$b-$c"

  private val genPhone: Gen[String] = for {
    a <- Gen.chooseNum(100, 999); b <- Gen.chooseNum(100, 999); c <- Gen.chooseNum(1000, 9999)
  } yield s"$a-$b-$c"

  private val genIp: Gen[String] =
    Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))

  private val genFiller: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaStr.map(_.take(8)), Gen.const("v1.2"), Gen.const("a-b")))
      .map(ws => ws.filter(_.nonEmpty).mkString(" "))

  private def embedded(pii: Gen[String]): Gen[(String, String)] = for {
    pre <- genFiller; v <- pii; post <- genFiller
  } yield (s"$pre $v $post", v)

  private def detectedAndGone(text: String, pattern: String, placeholder: String): Boolean = {
    val found = re(pattern).findFirstIn(text).isDefined
    found && {
      val out = redactString(text)
      out.contains(placeholder) && re(pattern).findFirstIn(out).isEmpty
    }
  }

  // evaluate the redact column expression through a tiny local frame
  private lazy val spark = Sessions.local(2)
  private def redactString(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Pii.redact(org.apache.spark.sql.functions.col("t"))).head().getString(0)
  }

  property("emails always detected and redacted") =
    Prop.forAll(embedded(genEmail)) { case (text, _) =>
      detectedAndGone(text, Pii.Email, "<EMAIL>")
    }

  property("ssn shapes always detected and redacted") =
    Prop.forAll(embedded(genSsn)) { case (text, _) =>
      detectedAndGone(text, Pii.Ssn, "<SSN>")
    }

  property("phone shapes always detected and redacted") =
    Prop.forAll(embedded(genPhone)) { case (text, _) =>
      detectedAndGone(text, Pii.Phone, "<PHONE>")
    }

  property("ipv4 always detected and redacted") =
    Prop.forAll(embedded(genIp)) { case (text, _) =>
      detectedAndGone(text, Pii.Ipv4, "<IP>")
    }

  property("pii-free filler is untouched") =
    Prop.forAll(genFiller) { text =>
      redactString(text) == text
    }
}
