package graft

import graft.pipeline.TextAnalysis
import org.scalacheck.{Gen, Prop, Properties}

/** Property test for URL canonicalization: tracking parameters never
  * survive, non-tracking parameters always do, scheme/host fold to
  * lowercase with default ports gone, and the transform is idempotent
  * (a canonical URL canonicalizes to itself).
  */
object UrlProps extends Properties("url") {

  private lazy val spark = Sessions.local(2)
  private def canon(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("u")
      .select(TextAnalysis.canonicalUrl(org.apache.spark.sql.functions.col("u")))
      .head().getString(0)
  }

  private val genHost: Gen[String] = for {
    name <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(10).mkString)
    cased <- Gen.oneOf(name, name.toUpperCase, name.capitalize)
    tld <- Gen.oneOf("com", "org", "net")
  } yield s"$cased.$tld"

  private val genTracking: Gen[String] = for {
    k <- Gen.oneOf("utm_source", "utm_medium", "utm_campaign", "fbclid", "gclid", "ref")
    v <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(8).mkString)
  } yield s"$k=$v"

  private val genKeep: Gen[String] = for {
    k <- Gen.oneOf("id", "page", "q", "size")
    v <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(8).mkString)
  } yield s"$k=$v"

  private case class Url(scheme: String, host: String, port: String,
                         path: String, params: List[String], frag: String) {
    def render: String = {
      val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
      s"$scheme://$host$port$path$q$frag"
    }
  }

  private val genUrl: Gen[Url] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
    host <- genHost
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    depth <- Gen.chooseNum(0, 3)
    segs <- Gen.listOfN(depth, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(6).mkString))
    slash <- Gen.oneOf("", "/")
    params <- Gen.listOf(Gen.frequency(1 -> genTracking, 1 -> genKeep)).map(_.take(5))
    frag <- Gen.oneOf("", "#top", "#sec-2")
  } yield Url(scheme, host, port, segs.map("/" + _).mkString + slash, params, frag)

  property("tracking params and fragments never survive") =
    Prop.forAll(genUrl) { u =>
      val c = canon(u.render)
      !c.contains("utm_") && !c.contains("fbclid") && !c.contains("gclid=") &&
        !c.contains("#")
    }

  property("non-tracking params always survive") =
    Prop.forAll(genUrl) { u =>
      val c = canon(u.render)
      u.params.filter(p => !p.takeWhile(_ != '=').matches("utm_[a-z]+|fbclid|gclid|ref"))
        .forall(c.contains)
    }

  property("scheme+host lowercase, only the scheme's default port stripped") =
    Prop.forAll(genUrl) { u =>
      val c = canon(u.render)
      val scheme = u.scheme.toLowerCase
      c.startsWith(s"$scheme://${u.host.toLowerCase}") &&
        ((u.port, scheme) match {
          // default port for the scheme → gone
          case ((":80", "http") | (":443", "https") | ("", _)) =>
            !c.contains(":80") && !c.contains(":443")
          // non-default (incl. http:443 / https:80) → kept verbatim
          case (p, _) => c.contains(p)
        })
    }

  property("idempotent: canonical of canonical is itself") =
    Prop.forAll(genUrl) { u =>
      val c = canon(u.render)
      canon(c) == c
    }
}
