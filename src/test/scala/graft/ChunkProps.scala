package graft

import graft.pipeline.TextAnalysis
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property test: token-window chunking covers every token exactly once
  * at its stride offset, never exceeds the window, keeps the partial
  * tail, and packing conserves chunk tokens across bins.
  */
object ChunkProps extends Properties("chunking") {
  private lazy val spark = Sessions.local(4)

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val genCase = for {
    nDocs <- Gen.chooseNum(1, 5)
    docs <- Gen.listOfN(nDocs, Gen.chooseNum(1, 120))
    stride <- Gen.chooseNum(1, 40)
    extra <- Gen.chooseNum(0, 20)
  } yield (docs, stride + extra, stride) // window >= stride

  property("chunks tile the token stream; packing conserves tokens") =
    Prop.forAll(genCase) { case (docLens, window, stride) =>
      import spark.implicits._
      val docs = docLens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(k => s"t${i}_$k").mkString(" "), s"s${i % 2}")
      }.toDF("doc_id", "text", "source")
      val chunks = TextAnalysis.chunkTokens(docs, "doc_id", "text", window, stride,
        carry = Seq("source"))
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3), r.getInt(4)))

      val byDoc = chunks.groupBy(_._1)
      val tiles = docLens.zipWithIndex.forall { case (n, i) =>
        val cs = byDoc(i.toLong).sortBy(_._2)
        val starts = cs.indices.map(_ * stride)
        cs.zip(starts).forall { case ((_, _, chunk, ct), start) =>
          val toks = chunk.split(" ")
          ct == toks.length && ct == math.min(window, n - start) &&
            toks.head == s"t${i}_${start + 1}" // chunk begins at its stride offset
        } && cs.size == Math.floorDiv(n - 1, stride) + 1
      }

      val packed = TextAnalysis.packChunks(
        TextAnalysis.chunkTokens(docs, "doc_id", "text", window, stride,
          carry = Seq("source")), "source", "doc_id", budget = 64)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
      val conserved = packed.map(_._3).sum == chunks.map(_._4.toLong).sum
      val binsContiguous = packed.groupBy(_._1).forall { case (_, bs) =>
        bs.map(_._2).sorted.toSeq == (0 until bs.length)
      }
      tiles && conserved && binsContiguous
    }
}
