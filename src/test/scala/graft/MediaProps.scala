package graft

import graft.pipeline.{Dsp, Multimodal}
import org.scalacheck.{Gen, Prop, Properties}

/** Fuzz the binary-media walkers with hostile bytes: at corpus scale a
  * binary column holds arbitrary junk, and every decoder must be total
  * (return None/fake/zero rows — never throw, never hang). Covers the
  * round-7 additions: the ISO-BMFF sample-table parser, the feature
  * encoder dispatch, and the FFT/DCT kernels' input edges.
  */
object MediaProps extends Properties("media") {

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray))

  // random bytes wearing an ftyp header — reaches deeper into the walker
  private val genFtypish: Gen[Array[Byte]] = genBytes.map { b =>
    val out = new Array[Byte](8 + b.length)
    out(0) = 0; out(1) = 0; out(2) = 0; out(3) = (8 + b.length).toByte
    System.arraycopy("ftyp".getBytes("US-ASCII"), 0, out, 4, 4)
    System.arraycopy(b, 0, out, 8, b.length)
    out
  }

  // random box soup: valid sizes/fourccs, garbage bodies
  private val genBoxSoup: Gen[Array[Byte]] = {
    val genBox = for {
      typ <- Gen.oneOf("moov", "trak", "mdia", "mdhd", "hdlr", "minf", "stbl",
        "stsd", "stts", "stsc", "stsz", "stco", "co64", "free", "mdat")
      body <- Gen.chooseNum(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127)).map(_.map(_.toByte).toArray))
    } yield {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length); bb.put(typ.getBytes("US-ASCII")); bb.put(body)
      bb.array()
    }
    for {
      ftyp <- Gen.const({
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putInt(16); bb.put("ftyp".getBytes); bb.put("isom".getBytes); bb.putInt(0)
        bb.array()
      })
      boxes <- Gen.listOf(genBox)
    } yield boxes.foldLeft(ftyp)(_ ++ _)
  }

  property("mp4VideoTrack is total on junk, ftyp-ish junk, and box soup") =
    Prop.forAll(Gen.oneOf(genBytes, genFtypish, genBoxSoup)) { b =>
      Multimodal.mp4VideoTrack(b) // Option either way — must not throw
      true
    }

  property("decodeSamplesAny is total on junk") = Prop.forAll(genBytes) { b =>
    Multimodal.decodeSamplesAny(b); true
  }

  property("spectralEmbed: unit norm (or zero vector), any dim, any length") =
    Prop.forAll(
      Gen.chooseNum(0, 700).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-32768, 32767))),
      Gen.chooseNum(1, 300)) { (xs, dim) =>
      val f = Dsp.spectralEmbed(xs.toArray, dim)
      val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
      f.length == dim && (math.abs(norm - 1.0) < 1e-4 || norm == 0.0)
    }

  property("fft matches the O(n^2) DFT on small inputs") =
    Prop.forAll(Gen.listOfN(64, Gen.chooseNum(-1000.0, 1000.0))) { xs =>
      val re = xs.toArray; val im = new Array[Double](64)
      Dsp.fft(re, im)
      val ok = (0 until 64).forall { k =>
        val er = xs.zipWithIndex.map { case (x, n) =>
          x * math.cos(-2 * math.Pi * k * n / 64) }.sum
        val ei = xs.zipWithIndex.map { case (x, n) =>
          x * math.sin(-2 * math.Pi * k * n / 64) }.sum
        math.abs(re(k) - er) < 1e-6 && math.abs(im(k) - ei) < 1e-6
      }
      ok
    }
}
