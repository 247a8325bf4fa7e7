package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("jaccardPairs computes exact set jaccard") {
    val df = Seq(
      (1L, "abcdefghij", "x"),   // shingles(4): abcd bcde cdef defg efgh fghi ghij (7)
      (2L, "abcdefghzz", "x"),   // shares abcd bcde cdef defg efgh (5 of its 7)
      (3L, "zzzzzzzzzz", "x")    // 1 distinct shingle, no overlap
    ).toDF("doc_id", "text", "lang")
    val out = Dedup.jaccardPairs(df, "doc_id", "text", 4, Seq("lang"), 0.0)
      .orderBy($"a", $"b").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 5L) // shared: abcd bcde cdef defg efgh
    assert(math.abs(r.getDouble(3) - 5.0 / 9.0) < 1e-15)
  }

  test("minhash candidates include near-duplicates") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base), (2L, base + " x"), (3L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text", 8, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
  }

  test("bm25TopK ranks tf/length-normalized matches, excludes non-matches") {
    val df = Seq(
      (1L, "a b a"),   // tf(a)=2, dl=3 — best
      (2L, "a c"),     // tf(a)=1, dl=2
      (3L, "d d d")    // no hit
    ).toDF("doc_id", "text")
    val out = Search.bm25TopK(df, "doc_id", "text", Seq("a"), 5).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 absent
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    assert(out.forall(_.getInt(1) == 1)) // one matching term each
    // idf = ln((N - df + .5)/(df + .5) + 1) with N=3, df=2 → ln(1.6)
    val idf = math.log(1.6)
    val c1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / (8.0 / 3)))
    assert(math.abs(out(0).getDouble(2) - math.floor(c1 * 1048576) / 1048576) < 1e-9)
  }

  test("dsir importance model upweights target-like documents") {
    val target = Seq((100L, "x x y")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "x x x x"),  // target-like
      (2L, "z z z z"),  // alien
      (100L, "x x y")
    ).toDF("doc_id", "text")
    val model = Dsir.train(target, raw, "text", 64)
    val sc = Dsir.score(raw, "doc_id", "text", model).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("logw")).toMap
    assert(sc(1L) > sc(2L)) // x-heavy doc imports more than z-heavy
    // resample is a deterministic top-k on logw + md5-Gumbel
    val r1 = Dsir.resample(Dsir.score(raw, "doc_id", "text", model), "doc_id", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val r2 = Dsir.resample(Dsir.score(raw, "doc_id", "text", model), "doc_id", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(r1 == r2 && r1.size == 2)
  }

  test("duplicateWindowStats counts corpus-wide window occurrences") {
    val df = Seq(
      (1L, "a b c d e f"),  // windows(3): "a b c" "b c d" "c d e" "d e f"
      (2L, "x a b c d y"),  // shares "a b c" and "b c d"
      (3L, "p q r s t u")   // unique
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateWindowStats(df, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(out == List((1L, 4L, 2L), (2L, 4L, 2L), (3L, 4L, 0L)))
  }

  test("removeDuplicateSpans keeps the canonical occurrence, deletes the rest") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),            // marks pos2+pos3 → tokens 2-5 go
      (3L, "p q r s t u"),
      (4L, "m n o m n o m n o")       // self-repeats: spans 4..9 removed
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", 3)
      .orderBy($"doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c d e f")  // canonical doc untouched
    assert(out(2L) == "x y")
    assert(out(3L) == "p q r s t u")
    assert(out(4L) == "m n o")
  }

  test("dedupLines drops lines in >= minDocs distinct docs, keeps order") {
    val df = Seq(
      (1L, "hello\nworld\nfoo"),
      (2L, "hello\nbar"),
      (3L, "baz\nworld"),
      (4L, "dup\ndup\nsolo")          // same-doc repeat ≠ cross-doc boilerplate
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, "doc_id", "text", 2)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_kept"), r.getAs[String]("clean"))).toList
    assert(out == List(
      (1L, 3L, 1L, "foo"), (2L, 2L, 1L, "bar"),
      (3L, 2L, 1L, "baz"), (4L, 3L, 3L, "dup\ndup\nsolo")))
  }

  test("contaminationBloom: identical answer to the exact tier, bloom really prunes") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter($"source" =!= "src0")
    val bench = docs.filter($"source" === "src0")
    val exact = Dedup.contamination(corpus, bench, "doc_id", "text", 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Dedup.contaminationBloom(corpus, bench, "doc_id", "text", 5, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty) // fixture really contains contaminated docs
  }

  test("clusters: hash-min label propagation finds connected components") {
    // chain 1-2-3 plus isolated pair 10-11; transitivity must label 3 with 1
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val cl = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: distinctPairs=true skips the dedup shuffle, same labels") {
    // same chain+pair graph; the a<b distinct input must produce the
    // identical fixpoint through the no-distinct edge path
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val cl = Dedup.clusters(pairs, distinctPairs = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // and a dup-carrying input still converges to the same labels (dups
    // cannot change a min — the flag is purely a cost choice)
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val cl2 = Dedup.clusters(dup, distinctPairs = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clusters: string node ids converge to correct components") {
    // Non-numeric labels can't ride the Σ-lbl decimal metric (the cast
    // yields null per row, and a null sum reads as "empty ⇒ fixpoint"),
    // so they must route to the explicit-diff convergence check —
    // transitivity across the a-b-c chain proves more than one round ran.
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("a", "b")
    val cl = Dedup.clusters(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cl == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("clusters: long path needs multiple propagation rounds") {
    // 0-1-2-...-9 path: min label must travel 9 hops
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val cl = Dedup.clusters(pairs).collect().map(_.getLong(1)).distinct
    assert(cl.sameElements(Array(0L)))
  }

  test("keepOnePerCluster keeps cluster minima and untouched rows") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (42L, "e"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = Dedup.keepOnePerCluster(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 10L, 42L)))
  }

  test("simhash: near-identical docs have small hamming distance") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val m = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
    assert(ham(m(1L), m(2L)) <= 12)
  }

  test("cosineTopK: identical vector ranks first") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f)), // near-identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.1f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(df, df.filter($"vec_id" === 0L), "vec_id", "embedding", 3)
      .orderBy($"rn").collect().map(_.getLong(1)).toSeq
    assert(top.head == 1L)      // closest
    assert(top.last == 2L)      // orthogonal ranks last
  }

  test("ivfTopK: near-identical vector is found via its probed list") {
    // two tight groups; a near-copy of vector 0 must surface as its top hit
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f)),
      (2L, Array(0.98f, 0.02f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)),
      (11L, Array(0.0f, 0.99f, 0.01f)),
      (12L, Array(0.0f, 0.98f, 0.02f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding",
      k = 2, nlist = 2, nprobe = 1).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L))) // same-group only
    assert(out.head.getLong(1) == 1L && out.head.getInt(3) == 1)
  }

  test("k-means IVF centroids: deterministic, recall@k >= hash-seeded baseline") {
    // 4 tight direction clusters in 8 dims, deterministic perturbation
    val dirs = Seq(
      Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 1f))
    val vecs = (for { c <- 0 until 4; j <- 0 until 15 } yield {
      val id = (c * 15 + j).toLong
      val v = dirs(c).zipWithIndex.map { case (x, i) =>
        x + (((id * 37 + i * 13) % 7).toInt - 3) * 0.05f
      }
      (id, v)
    }).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 15 === 0)

    def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (q, xs) => q -> xs.map(_._2).toSet }

    val exact = topkSet(Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", 5)
      .select($"qid", $"cid"))
    def recall(cent: Option[org.apache.spark.sql.DataFrame]): Double = {
      val got = topkSet(Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
        5, 4, 1, cent).select($"qid", $"cid"))
      exact.map { case (q, want) => got.getOrElse(q, Set.empty).count(want).toDouble / want.size }
        .sum / exact.size
    }
    val km = Similarity.ivfCentroidsKMeans(vecs, "vec_id", "embedding", 4, iters = 3)
    val km2 = Similarity.ivfCentroidsKMeans(vecs, "vec_id", "embedding", 4, iters = 3)
    // deterministic training: identical centroids across runs
    assert(km.orderBy($"cid").collect().map(_.getSeq[Float](1)).toSeq ==
      km2.orderBy($"cid").collect().map(_.getSeq[Float](1)).toSeq)
    val rHash = recall(None)
    val rKm = recall(Some(km))
    assert(rKm >= rHash)
    assert(rKm >= 0.9) // trained centroids must actually separate the clusters
  }

  test("pq: codes bounded+deterministic; ADC distances match a driver-side rederivation") {
    // same 4-cluster fixture shape as the k-means test
    val dirs = Seq(
      Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 1f))
    val vecs = (for { c <- 0 until 4; j <- 0 until 15 } yield {
      val id = (c * 15 + j).toLong
      val v = dirs(c).zipWithIndex.map { case (x, i) =>
        x + (((id * 37 + i * 13) % 7).toInt - 3) * 0.05f
      }
      (id, v)
    }).toDF("vec_id", "embedding")
    val (m, kc) = (2, 4)
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m, kc)
    assert(cb.length == m && cb.forall(_.length == kc) && cb(0)(0).length == 4)

    val enc1 = Similarity.pqEncode(vecs, "vec_id", "embedding", m, kc, Some(cb))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val enc2 = Similarity.pqEncode(vecs, "vec_id", "embedding", m, kc, Some(cb))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(enc1.size == 60 && enc1 == enc2)
    assert(enc1.values.forall(code => code.size == m && code.forall(c => c >= 0 && c < kc)))

    // independent rederivation: codes = argmin_j ⟨x,x⟩−2⟨x,w⟩+⟨w,w⟩ in
    // µ-units, ADC = Σ_s lutµ[s][code_s] — plain Scala, no Spark
    val raw = vecs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def duOf(sub: Array[Double], w: Array[Double]): Long = {
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      BigDecimal(1e6 * (dot(sub, sub) - 2 * dot(sub, w) + dot(w, w)))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    def subOf(v: Array[Double], s: Int) = v.slice(s * 4, s * 4 + 4)
    for ((id, v) <- raw) {
      val expect = (0 until m).map { s =>
        val ds = cb(s).map(w => duOf(subOf(v, s), w))
        ds.indexOf(ds.min)
      }.toList
      assert(enc1(id) == expect, s"code mismatch for $id")
    }
    val queries = vecs.filter($"vec_id" % 15 === 0)
    val got = Similarity.pqTopK(vecs, queries, "vec_id", "embedding", 5, m, kc, Some(cb))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((qid, cid), du) <- got) {
      val expect = (0 until m).map(s => duOf(subOf(raw(qid), s), cb(s)(enc1(cid)(s)))).sum
      assert(du == expect, s"ADC mismatch for ($qid,$cid)")
    }
  }

  test("ivfPq: candidates come only from probed lists; ADC agrees with pqTopK") {
    val dirs = Seq(
      Array(10f, 0f, 0f, 0f, 1f, 0f, 0f, 0f), Array(0f, 10f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 10f, 0f, 0f, 0f, 1f))
    val vecs = (for { c <- 0 until 4; j <- 0 until 15 } yield {
      val id = (c * 15 + j).toLong
      val v = dirs(c).zipWithIndex.map { case (x, i) =>
        x + (((id * 37 + i * 13) % 7).toInt - 3) * 0.05f
      }
      (id, v)
    }).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 15 === 0)
    val (m, kc, nlist, nprobe) = (2, 4, 4, 2)

    val out = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding",
      5, nlist, nprobe, m, kc).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)

    // every candidate's list must be one of its query's probed lists —
    // rederive both sides from the same deterministic centroids
    val cent = Similarity.ivfCentroids(vecs, "vec_id", "embedding", nlist)
    val listOf = Similarity.ivfAssign(vecs, cent, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // probed lists per query = lists its ivfTopK candidates land in is
    // not directly exposed; assert the weaker invariant that a candidate
    // never comes from a list no query member probes: every returned cid
    // shares a list with at least one of the query's nprobe nearest
    // centroid ids, which ivfTopK (same probe code path) must also reach
    val ivfCands = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
      60, nlist, nprobe, Some(cent)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet.subsetOf(ivfCands),
      "ivfPq returned a candidate outside the probed lists")

    // ADC distances must equal the unrestricted pqTopK's for the same
    // (query, doc) pairs — same codebooks seam, no IVF interference
    val cb = Similarity.pqCodebooks(vecs, "vec_id", "embedding", m, kc)
    val pq = Similarity.pqTopK(vecs, queries, "vec_id", "embedding",
      60, m, kc, Some(cb)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((pair, du) <- out)
      assert(pq(pair) == du, s"ADC mismatch for $pair")
  }

  test("ivf assignment is exhaustive and deterministic") {
    val vecs = (0L until 20L).map(i =>
      (i, Array((i % 5).toFloat + 1f, (i % 3).toFloat, 1.0f))).toDF("vec_id", "embedding")
    val cent = Similarity.ivfCentroids(vecs, "vec_id", "embedding", 4)
    assert(cent.count() == 4)
    val a1 = Similarity.ivfAssign(vecs, cent, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Similarity.ivfAssign(vecs, cent, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1.size == 20 && a1 == a2)
  }

  test("lsh buckets group similar vectors, split dissimilar ones") {
    val df = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(0.9f)),          // same direction as 0
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(df, "vec_id", "embedding", 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L))
  }

  test("multimodal decode stub: deterministic metadata, null passthrough, frame sampling") {
    val df = Seq((1L, "hello"), (2L, "world"), (3L, null.asInstanceOf[String])).toDF("id", "src")
    val withPayload = Multimodal.asPayload(df, "src")
    val decoded = Multimodal.decodeStub(withPayload, "payload").orderBy($"id").collect()
    assert(!decoded(0).isNullAt(3)) // cols: id, src, payload, meta
    val w = decoded(0).getStruct(3).getInt(0)
    assert(w >= 16 && w <= 16 + 255 * 4)
    assert(decoded(2).isNullAt(3)) // null payload → null meta
    val frames = Multimodal.frameSample(withPayload.filter($"id" === 1L), "payload", 4, 2)
    assert(frames.count() == 4)
    assert(frames.select(countDistinct($"frame_key")).head().getLong(0) == 4L)
  }

  test("multimodal decode + resize handle real PNG/JPEG payloads via ImageIO") {
    // render small real images in-memory: a 40×24 PNG and a 17×11 JPEG
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) * 1024)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, imageBytes(40, 24, "png")),
      (2L, imageBytes(17, 11, "jpg")),
      (3L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))). // not an image → fallback
      toDF("id", "payload")
    val meta = Multimodal.decode(df, "payload").orderBy($"id").collect()
      .map(r => r.getStruct(r.fieldIndex("meta")))
    assert(meta(0).getInt(0) == 40 && meta(0).getInt(1) == 24 && meta(0).getString(3) == "png")
    assert(meta(1).getInt(0) == 17 && meta(1).getInt(1) == 11
      && meta(1).getString(3).startsWith("jp"))
    assert(meta(2).getInt(0) == 16 + 1 * 4) // deterministic fallback formula

    // resize really rescales: the output re-decodes to the target dims
    val resized = Multimodal.resize(df.filter($"id" === 1L), "payload", 8, 6).head()
    val outBytes = resized.getAs[Array[Byte]]("resized")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(back != null && back.getWidth == 8 && back.getHeight == 6)
  }

  test("multimodal audio: real WAV parse (metadata + RMS/ZCR), non-WAV falls back") {
    // synthesize a real RIFF/WAV: 0.1 s of a 440 Hz sine, PCM16 mono 8 kHz
    def wavBytes(rate: Int, freq: Double, seconds: Double, amp: Double): Array[Byte] = {
      val n = (rate * seconds).toInt
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (amp * 32767 * math.sin(2 * math.Pi * freq * i / rate)).toInt
        data(2 * i) = (s & 0xff).toByte; data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + data.length); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1); bb.putShort(1)
      bb.putInt(rate); bb.putInt(rate * 2); bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(data.length); bb.put(data)
      bb.array()
    }
    val df = Seq(
      (1L, wavBytes(8000, 440.0, 0.1, 0.5)),
      (2L, Array[Byte](9, 9, 9, 9, 9, 9, 9, 9))).toDF("id", "payload")
    val m = Multimodal.decodeAudio(df, "payload").orderBy($"id").collect()
      .map(r => r.getStruct(r.fieldIndex("audio_meta")))
    assert(m(0).getInt(0) == 8000 && m(0).getInt(1) == 1 && m(0).getInt(2) == 16)
    assert(m(0).getLong(3) == 800L && math.abs(m(0).getDouble(4) - 100.0) < 1e-9)
    assert(m(0).getString(5) == "wav")
    assert(m(1).getString(5) == "stub") // fallback seam for non-WAV codecs

    val f = Multimodal.audioFeatures(df.filter($"id" === 1L), "payload").head()
      .getStruct(2)
    // sine RMS = amp/sqrt(2); ZCR = 2 crossings per cycle = 2f/rate; peak ≈ amp
    assert(math.abs(f.getDouble(0) - 0.5 / math.sqrt(2)) < 0.01)
    assert(math.abs(f.getDouble(1) - 2.0 * 440 / 8000) < 0.01)
    assert(f.getDouble(2) > 0.47 && f.getDouble(2) <= 0.5)

    // hostile payload: RIFF/WAVE magic with a huge bogus chunk size must
    // fall back (and terminate), not walk the buffer backwards
    val evil = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](-1, -1, -1, -1) ++ new Array[Byte](32)
    val em = Multimodal.decodeAudioOne(evil)
    assert(em.getString(5) == "stub")
    assert(Multimodal.audioFeaturesOne(evil) != null)
  }

  test("G.711 and IMA ADPCM WAV payloads really decode (codec, not stub)") {
    val src = Seq((1L, 8000, 4000, 5000)).toDF("id", "rate", "frames", "amp")
    // µ-law: constant signal decodes to exactly the companded level
    val u = Multimodal.audioFeatures(Multimodal.decodeAudio(
      Multimodal.synthWavCodec(src, "rate", "frames", "amp", "ulaw"), "payload"), "payload").head()
    val um = u.getStruct(u.fieldIndex("audio_meta"))
    val uf = u.getStruct(u.fieldIndex("audio_feat"))
    assert(um.getString(5) == "wav_ulaw" && um.getLong(3) == 4000L)
    assert(math.round(uf.getDouble(0) * 32768) == 5116L) // nearest µ-law level to 5000
    assert(uf.getDouble(1) == 0.0)
    // A-law
    val a = Multimodal.audioFeatures(Multimodal.decodeAudio(
      Multimodal.synthWavCodec(src, "rate", "frames", "amp", "alaw"), "payload"), "payload").head()
    val af = a.getStruct(a.fieldIndex("audio_feat"))
    assert(a.getStruct(a.fieldIndex("audio_meta")).getString(5) == "wav_alaw")
    assert(math.round(af.getDouble(0) * 32768) == 4992L) // nearest A-law level
    // ADPCM: predictor seeds on the first true sample, so a constant
    // signal round-trips almost exactly; block padding adds trailing
    // zero-diff samples that stay at the amplitude
    val d = Multimodal.audioFeatures(Multimodal.decodeAudio(
      Multimodal.synthWavCodec(src, "rate", "frames", "amp", "adpcm"), "payload"), "payload").head()
    val dm = d.getStruct(d.fieldIndex("audio_meta"))
    val df2 = d.getStruct(d.fieldIndex("audio_feat"))
    assert(dm.getString(5) == "wav_adpcm")
    assert(dm.getLong(3) >= 4000L) // frames rounded up to whole blocks
    assert(math.abs(df2.getDouble(0) - 5000.0 / 32768) < 0.01)
    assert(math.abs(df2.getDouble(2) - 5000.0 / 32768) < 0.01)
    // nibble-level sanity: encode→decode round-trips a varying signal
    val sine = Array.tabulate(2000)(i => (8000 * math.sin(i * 0.05)).toInt.toShort)
    val enc = Multimodal.adpcmEncode(sine, 256)
    val dec = Multimodal.adpcmDecode(enc, 0, enc.length, 256)
    val err = sine.indices.map(i => math.abs(dec(i) - sine(i))).sum.toDouble / sine.length
    assert(err < 200.0, s"mean ADPCM round-trip error $err") // ~2% of peak
  }

  test("FLAC frames really decode: lossless round-trip, CRC gates, hostile input") {
    // lossless: arbitrary waveform through encode → decode is bit-exact
    val wave = Array.tabulate(10000) { i =>
      ((6000 * math.sin(i * 0.013) + 2500 * math.sin(i * 0.071) + (i % 97) - 48).toInt.toShort)
    }
    val stream = Flac.encode(44100, wave, blockSize = 4096)
    val decoded = Flac.decodeSamples(stream).get
    assert(decoded.length == wave.length)
    assert(decoded.indices.forall(i => decoded(i) == wave(i).toInt), "FLAC round-trip not lossless")
    // constant block → CONSTANT subframe path
    val const = Flac.encode(8000, Array.fill(5000)(1234.toShort))
    assert(Flac.decodeSamples(const).get.forall(_ == 1234))
    // a flipped bit in a frame body must fail that frame's CRC-16, not
    // produce silently-wrong samples (header+streaminfo left intact)
    val damaged = stream.clone()
    damaged(damaged.length - 40) = (damaged(damaged.length - 40) ^ 0x10).toByte
    val partial = Flac.decodeSamples(damaged)
    assert(partial.isEmpty || partial.get.length < wave.length)
    // hostile garbage: magic + junk never throws
    assert(Flac.decodeSamples("fLaC".getBytes ++ Array.fill(100)(0x5a.toByte)).isEmpty)
    assert(Flac.decodeSamples(Array[Byte]()).isEmpty)
    // feature integration: square wave has closed-form features
    val src = Seq((1L, 8000, 4096, 9000, 32)).toDF("id", "rate", "frames", "amp", "period")
    val f = Multimodal.audioFeatures(Multimodal.decodeAudio(
      Multimodal.synthFlacFrames(src, "rate", "frames", "amp", "period"), "payload"), "payload").head()
    val fm = f.getStruct(f.fieldIndex("audio_meta"))
    val ff = f.getStruct(f.fieldIndex("audio_feat"))
    assert(fm.getString(5) == "flac" && fm.getLong(3) == 4096L)
    assert(math.abs(ff.getDouble(0) - 9000.0 / 32768) < 1e-12) // RMS exact
    assert(math.abs(ff.getDouble(2) - 9000.0 / 32768) < 1e-12) // peak exact
    assert(math.abs(ff.getDouble(1) - 127.0 / 4096) < 1e-12)   // (4096/32 - 1) flips
  }

  test("multimodal video: real MP4 box walk (brand, duration, tracks), non-MP4 falls back") {
    // build a minimal ISO-BMFF file: ftyp + moov(mvhd v0 + 2×trak)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length); bb.put(typ.getBytes); bb.put(payload)
      bb.array()
    }
    val mvhdBody = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd is 100 bytes
      bb.putInt(0)          // version+flags
      bb.putInt(0); bb.putInt(0) // creation/modification
      bb.putInt(600)        // timescale
      bb.putInt(1500)       // duration → 2500 ms
      bb.array()
    }
    val moov = box("moov", box("mvhd", mvhdBody) ++ box("trak", Array[Byte](0, 0)) ++
      box("trak", Array[Byte](0, 0)))
    val mp4 = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 1)) ++ moov
    val df = Seq((1L, mp4), (2L, Array[Byte](7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7)))
      .toDF("id", "payload")
    val m = Multimodal.decodeVideo(df, "payload").orderBy($"id").collect()
      .map(r => r.getStruct(r.fieldIndex("video_meta")))
    assert(m(0).getString(0) == "isom")
    assert(math.abs(m(0).getDouble(1) - 2500.0) < 1e-9)
    assert(m(0).getInt(2) == 2 && m(0).getString(3) == "mp4")
    assert(m(1).getString(3) == "stub") // fallback seam

    // corrupt box size: must terminate and fall back, not loop
    val evil = mp4.clone(); evil(mp4.length - moov.length) = -1 // moov size → huge
    assert(Multimodal.decodeVideoOne(evil).getString(3) == "stub")

    // size==1 largesize moov (64-bit size after the fourcc) parses
    def bigBox(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(1); bb.put(typ.getBytes); bb.putLong(16L + payload.length); bb.put(payload)
      bb.array()
    }
    val mp4Big = box("ftyp", "isom".getBytes ++ Array[Byte](0, 0, 0, 1)) ++
      bigBox("moov", box("mvhd", mvhdBody) ++ box("trak", Array[Byte](0, 0)))
    val mBig = Multimodal.decodeVideoOne(mp4Big)
    assert(math.abs(mBig.getDouble(1) - 2500.0) < 1e-9 && mBig.getInt(2) == 1)
    // size==0 trailing box (extends to EOF) doesn't derail the walk
    val mp4Eof = mp4 ++ (Array[Byte](0, 0, 0, 0) ++ "free".getBytes)
    assert(Multimodal.decodeVideoOne(mp4Eof).getString(3) == "mp4")

    // empty (non-null) payloads fall back deterministically, never throw
    val empty = Array.empty[Byte]
    assert(Multimodal.decodeVideoOne(empty).getString(3) == "stub")
    assert(Multimodal.decodeAudioOne(empty).getString(5) == "stub")
    assert(Multimodal.audioFeaturesOne(empty) != null)
  }

  test("multimodal audio: mp3/flac header walks survive hostile input") {
    // ID3v2 size pointing past the buffer: fall back, don't throw
    val evilId3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f) ++
      new Array[Byte](20)
    assert(Multimodal.decodeMp3One(evilId3).getString(5) == "stub")
    // valid sync but free-format bitrate (idx 0) everywhere: no frame parses
    val evilSync = Array[Byte](0xff.toByte, 0xfb.toByte, 0x00, 0xc0.toByte) ++
      new Array[Byte](40)
    assert(Multimodal.decodeAudioOne(evilSync).getString(5) == "stub")
    // one valid frame then garbage: the parsed prefix still counts
    val oneFrame = {
      val flen = 144 * 128000 / 44100
      val b = new Array[Byte](flen + 8)
      b(0) = 0xff.toByte; b(1) = 0xfb.toByte
      b(2) = ((9 << 4) | (0 << 2)).toByte; b(3) = 0xc0.toByte
      b(flen) = 0x12 // not a sync word
      b
    }
    val m = Multimodal.decodeMp3One(oneFrame)
    assert(m.getString(5) == "mp3" && m.getLong(3) == 1152L && m.getInt(0) == 44100)
    // flac: truncated STREAMINFO falls back
    val shortFlac = "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ new Array[Byte](30)
    assert(Multimodal.decodeAudioOne(shortFlac).getString(5) == "stub")
    // side-info parse falls back to nulls on garbage, never throws
    val side = Multimodal.mp3SideInfoOne(evilId3)
    assert(side.isNullAt(0) && side.getLong(3) == 0L)
  }

  test("mp3 side-information round-trips through the bit fields") {
    val src = Seq((1L, 9, 0, 3, 210, 123), (2L, 10, 1, 5, 255, 287), (3L, 11, 2, 2, 0, 0))
      .toDF("event_id", "br_idx", "sr_idx", "frames", "gain", "bv")
    val out = Multimodal.mp3SideInfo(
      Multimodal.synthMp3Side(src, "br_idx", "sr_idx", "frames", "gain", "bv"),
      "payload")
      .select($"event_id", $"mp3_side.*").orderBy($"event_id").collect()
    assert(out(0).getInt(2) == 123 && out(0).getInt(3) == 210 && out(0).getLong(4) == 3L)
    assert(out(1).getInt(2) == 287 && out(1).getInt(3) == 255 && out(1).getInt(5) == 48000)
    assert(out(2).getInt(2) == 0 && out(2).getInt(3) == 0)
  }

  test("multimodal resize + feature-extract feed the ANN pipeline end-to-end") {
    val df = Seq((1L, "hello"), (2L, "hello"), (3L, "different"), (4L, null.asInstanceOf[String]))
      .toDF("id", "src")
    val withPayload = Multimodal.asPayload(df, "src")
    val resized = Multimodal.resizeStub(withPayload, "payload", 64, 64)
    val r = resized.orderBy($"id").collect()
    assert(r(0).getAs[Array[Byte]]("resized").nonEmpty)
    assert(r(0).getStruct(r(0).fieldIndex("meta")).getInt(0) == 64)
    assert(r(3).isNullAt(r(3).fieldIndex("resized"))) // null passthrough

    val feats = Multimodal.featuresStub(withPayload, "payload", 16)
    val fr = feats.filter($"id" =!= 4L)
    // unit-norm vectors, identical payloads → identical embeddings
    val norms = fr.select(sqrt(aggregate(transform(col("features"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, v) => a + v)))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // same payload lands in the same LSH bucket; ANN path accepts the output
    val buckets = Similarity.lshBuckets(fr.select($"id", $"features"), "id", "features", 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(1L) == buckets(2L))
  }

  test("spectral embed is a real FFT: square-wave harmonics at sampled-sinc ratios") {
    // ±8000 square wave, period 32 → fundamental bin 16 (band 1 of 16),
    // odd harmonics at bins 48 (band 3), 80 (band 5); sampled-square
    // amplitudes go as 1/sin(pi*m/32), so ratios ~1/3 and ~1/5
    val samples = Array.tabulate(2048)(i => if (i % 32 < 16) 8000 else -8000)
    val f = Dsp.spectralEmbed(samples, 16)
    assert(f(1) > 0.85, s"fundamental band should dominate: ${f.mkString(",")}")
    assert(math.abs(f(3) / f(1) - 1.0 / (math.sin(3 * math.Pi / 32) / math.sin(math.Pi / 32))) < 0.02)
    assert(math.abs(f(5) / f(1) - 1.0 / (math.sin(5 * math.Pi / 32) / math.sin(math.Pi / 32))) < 0.02)
    assert(f(0) < 1e-4 && f(2) < 1e-4 && f(4) < 1e-4) // even bands empty
    // bin-aligned sine through the full public path: one-hot band vector
    val src = Seq((1L, 32000, 2048, 12000, 16)).toDF("id", "rate", "frames", "amp", "period")
    val emb = Multimodal.features(Multimodal.synthWavTone(src, "rate", "frames", "amp", "period"),
      "payload", 16).select($"features").head.getSeq[Float](0)
    assert(math.abs(emb(2) - 1.0f) < 1e-4) // bin 32 → band 2
    assert(emb.zipWithIndex.filter(_._2 != 2).forall(x => math.abs(x._1) < 1e-4))
  }

  test("image embed is a real DCT: solid → brightness one-hot, split → horizontal AC") {
    val src = Seq((1L, 100, 0, 0), (2L, 40, 200, 1)).toDF("id", "shade", "shade2", "split")
    val out = Multimodal.features(Multimodal.synthPng(src, "shade", "shade2", "split"),
      "payload", 16).select($"id", $"features").orderBy($"id").collect()
    val solid = out(0).getSeq[Float](1)
    assert(math.abs(solid(0) - 1.0f) < 1e-6 && solid.drop(1).forall(x => math.abs(x) < 1e-6))
    val split = out(1).getSeq[Float](1)
    // closed form: D(0,0)=512*(c1+c2), D(u,0)=32*(c1-c2)*sum cos; v>0 zero
    def S(u: Int) = (0 until 16).map(x => math.cos(math.Pi * (2 * x + 1) * u / 64.0)).sum
    val d = Array(512.0 * 240, 32.0 * -160 * S(1), 32.0 * -160 * S(2), 32.0 * -160 * S(3))
    val nrm = math.sqrt(d.map(x => x * x).sum)
    for (u <- 0 until 4)
      assert(math.abs(split(u * 4) - d(u) / nrm) < 1e-5, s"u=$u got ${split(u * 4)}")
    assert(Seq(1, 2, 3, 5, 6, 7).forall(i => math.abs(split(i)) < 1e-6))
  }

  test("videoFrames really decodes MJPEG samples; hostile payloads yield zero rows") {
    val src = Seq((1L, 4, 25, 50)).toDF("id", "frames", "fps", "base")
    val vid = Multimodal.synthMjpeg(src, "frames", "fps", "base", 64, 48)
    val frames = Multimodal.videoFrames(vid, "payload").orderBy($"frame.frame_no").collect()
    assert(frames.length == 4)
    frames.zipWithIndex.foreach { case (r, i) =>
      val fr = r.getStruct(r.fieldIndex("frame"))
      assert(fr.getInt(0) == i)
      assert(fr.getDouble(1) == i * 40.0) // 25 fps → 40 ms/frame
      assert(fr.getInt(2) == 64 && fr.getInt(3) == 48)
      assert(fr.getDouble(4) == (50 + 11 * i) % 240) // quality-1.0 JPEG is DC-exact
    }
    // the container metadata walk agrees with the sample tables
    val meta = Multimodal.decodeVideo(vid, "payload").select($"video_meta").head.getStruct(0)
    assert(meta.getString(0) == "isom" && meta.getDouble(1) == 160.0 && meta.getString(3) == "mp4")
    // hostile: truncated container, garbage, truncated mdat — no throw
    val full = vid.select($"payload").head.getAs[Array[Byte]](0)
    val hostile = Seq(full.take(40), Array.fill[Byte](64)(0x41), full.take(full.length / 3),
      Array.emptyByteArray)
    val hdf = hostile.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "payload")
    assert(Multimodal.videoFrames(hdf, "payload").count() == 0)
  }

  test("mp4 sample tables: multi-chunk stsc run mapping, mixed stts deltas") {
    def be(i: Int) = java.nio.ByteBuffer.allocate(4).putInt(i).array()
    def be2(i: Int) = java.nio.ByteBuffer.allocate(2).putShort(i.toShort).array()
    def box(t: String, body: Array[Byte]) = be(8 + body.length) ++ t.getBytes("US-ASCII") ++ body
    def full(t: String, body: Array[Byte]) = box(t, Array[Byte](0, 0, 0, 0) ++ body)
    val entry = be(86) ++ "jpeg".getBytes ++ Array.fill[Byte](6)(0) ++ be2(1) ++
      be2(0) ++ be2(0) ++ Array.fill[Byte](12)(0) ++ be2(32) ++ be2(24) ++
      be(0x480000) ++ be(0x480000) ++ be(0) ++ be2(1) ++ Array.fill[Byte](32)(0) ++
      be2(24) ++ be2(0xffff)
    val stbl = box("stbl",
      full("stsd", be(1) ++ entry) ++
        full("stts", be(2) ++ be(2) ++ be(5) ++ be(2) ++ be(10)) ++ // 2×Δ5 then 2×Δ10
        full("stsc", be(1) ++ be(1) ++ be(2) ++ be(1)) ++ // every chunk: 2 samples
        full("stsz", be(0) ++ be(4) ++ be(10) ++ be(20) ++ be(30) ++ be(40)) ++
        full("stco", be(2) ++ be(100) ++ be(300)))
    val mdia = box("mdia",
      full("mdhd", be(0) ++ be(0) ++ be(1000) ++ be(30) ++ be2(0x55c4) ++ be2(0)) ++
        // body: creation, modification, timescale=1000, duration=30
        full("hdlr", be(0) ++ "vide".getBytes ++ Array.fill[Byte](13)(0)) ++
        box("minf", full("vmhd", Array.fill[Byte](8)(0)) ++ stbl))
    val moov = box("moov",
      full("mvhd", be(0) ++ be(0) ++ be(1000) ++ be(30) ++ Array.fill[Byte](80)(0)) ++
        box("trak", full("tkhd", Array.fill[Byte](80)(0)) ++ mdia))
    val bytes = box("ftyp", "isom".getBytes ++ be(0) ++ "isom".getBytes) ++ moov
    val t = Multimodal.mp4VideoTrack(bytes).get
    assert(t.codec == "jpeg" && t.width == 32 && t.height == 24 && t.timescale == 1000)
    assert(t.samples.map(_.offset).toSeq == Seq(100L, 110L, 300L, 330L))
    assert(t.samples.map(_.size).toSeq == Seq(10, 20, 30, 40))
    assert(t.samples.map(_.pts).toSeq == Seq(0L, 5L, 10L, 20L))
  }

  test("int8 quantization: per-dim error bound holds, quantized ANN agrees on top-1") {
    val df = Tables.load(spark, sfDir, "embeddings").filter(col("vec_id") < 300)
    val params = Quantize.fit(df, "embedding")
    assert(params.forall { case (lo, hi) => lo <= hi })
    val qd = Quantize.dequantize(Quantize.quantize(df, "embedding", params), "qembed", params)
    // |x - deq(q(x))| <= (hi-lo)/255/2 + eps on every dimension
    val rows = qd.select(col("embedding"), col("deq"), col("qembed")).collect()
    rows.foreach { r =>
      val e = r.getSeq[Float](0); val d = r.getSeq[Double](1); val q = r.getSeq[Byte](2)
      assert(q.length == e.length)
      e.indices.foreach { i =>
        val (lo, hi) = params(i)
        assert(math.abs(e(i) - d(i)) <= (hi - lo) / 255 / 2 + 1e-9,
          s"dim $i: ${e(i)} vs ${d(i)}")
      }
    }
    // ANN over the dequantized corpus keeps the exact top-1 in its top-5
    val probe = df.filter(col("vec_id") === 7).select(col("vec_id"), col("embedding"))
    val exactTop = Similarity.cosineTopK(df.select(col("vec_id"), col("embedding")), probe,
      "vec_id", "embedding", k = 1).head().getLong(1)
    val deqCorpus = qd.select(col("vec_id"),
      transform(col("deq"), x => x.cast("float")).as("embedding"))
    val viaQ = Similarity.cosineTopK(deqCorpus, probe, "vec_id", "embedding", k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(viaQ.contains(exactTop), s"exact top-1 $exactTop not in quantized top-5 $viaQ")
  }

  test("BPE: trained merges match the hand-computed classic example; greedy encode") {
    // Sennrich-style corpus: low x5, lower x2, newest x6, widest x3
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = Bpe.train(df, "text", 5)
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 → lexicographic tie-break picks
    // (e,s), then the chain, then (l,o)=7, (lo,w)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow), ("l", "o"), ("lo", "w")),
      merges.toString)
    val out = Bpe.encode(Seq((1L, "lowest low")).toDF("id", "text"), "text", merges)
      .head()
    assert(out.getSeq[String](out.fieldIndex("bpe_pieces")) ==
      Seq("low", "est" + Bpe.Eow, "low", Bpe.Eow))
    assert(out.getInt(out.fieldIndex("bpe_count")) == 4)
    // null text passes through
    val n = Bpe.encode(Seq((1L, null.asInstanceOf[String])).toDF("id", "text"), "text", merges)
      .head()
    assert(n.isNullAt(n.fieldIndex("bpe_pieces")) && n.isNullAt(n.fieldIndex("bpe_count")))
    // maxWords truncation keeps the head of the dictionary
    val truncated = Bpe.train(df, "text", 3, maxWords = 2) // newest(6) + low(5) only
    assert(truncated.nonEmpty && truncated.forall { case (a, b) => (a + b).nonEmpty })
  }

  test("langId and quality run over the documents table") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    val out = docs.select(TextAnalysis.langId("__toks").as("l"),
      TextAnalysis.qualityScore("text", "__toks").as("q"))
    val rows = out.collect()
    assert(rows.forall(r => Set("en", "es", "de", "fr", "und").contains(r.getString(0))))
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("pii: counts and redaction per category, clean text untouched") {
    val df = Seq(
      (1L, "reach me at jo.doe+x@corp.example.org or 555-123-4567 thanks"),
      (2L, "ssn 914-77-1234 from host 192.168.0.17 twice 10.0.0.1"),
      (3L, "no pii here, just 12-34 and v1.2.3 and a@b")
    ).toDF("id", "t")
    val out = df.select($"id",
      Pii.emailCount($"t").as("e"), Pii.ssnCount($"t").as("s"),
      Pii.phoneCount($"t").as("p"), Pii.ipv4Count($"t").as("i"),
      Pii.redact($"t").as("r")).orderBy($"id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(3) == 1)
    assert(out(0).getString(5) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(1).getInt(2) == 1 && out(1).getInt(4) == 2)
    assert(out(1).getString(5) == "ssn <SSN> from host <IP> twice <IP>")
    // 12-34 (not 3-2-4), v1.2.3 (3 octets), a@b (no dotted TLD) must not match
    assert(out(2).getInt(1) + out(2).getInt(2) + out(2).getInt(3) + out(2).getInt(4) == 0)
    assert(out(2).getString(5) == "no pii here, just 12-34 and v1.2.3 and a@b")
  }

  test("chunkTokens: stride windows cover every token, final partial kept") {
    val text = (1 to 75).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, "doc_id", "text", 32, 24)
      .orderBy($"doc_id", $"chunk_id").collect()
    // doc 1: starts 0,24,48,72 → sizes 32,32,27,3 ; doc 2: one chunk of 3
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(d1.map(_.getInt(3)).toSeq == Seq(32, 32, 27, 3))
    assert(d1(0).getString(2).startsWith("w1 w2 ") && d1(3).getString(2) == "w73 w74 w75")
    // overlap: chunk 1 starts at token 25
    assert(d1(1).getString(2).startsWith("w25 "))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(2) == "a b c" && d2(0).getInt(3) == 3)
  }

  test("packChunks: sequential fill per shard, bins near budget, all tokens packed") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"a$i").mkString(" "), "s1"), // starts 0,24,48,72,96 → 32,32,32,28,4
      (2L, (1 to 40).map(i => s"b$i").mkString(" "), "s1"),  // starts 0,24 → 32,16
      (3L, (1 to 30).map(i => s"c$i").mkString(" "), "s2")   // starts 0,24 → 30,6
    ).toDF("doc_id", "text", "source")
    val chunks = TextAnalysis.chunkTokens(docs, "doc_id", "text", 32, 24, carry = Seq("source"))
    val out = TextAnalysis.packChunks(chunks, "source", "doc_id", 64)
      .orderBy($"source", $"bin").collect()
    // s1 chunk_tokens in order: 32,32,32,28,4,32,16 (cum-before 0,32,64,96,124,128,160)
    //   → bins 0,0,1,1,1,2,2
    val s1 = out.filter(_.getString(0) == "s1")
    assert(s1.map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0, 2L, 64L, 1L), (1, 3L, 64L, 1L), (2, 2L, 48L, 1L)))
    val s2 = out.filter(_.getString(0) == "s2")
    assert(s2.map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0, 2L, 36L, 1L)))
    // no tokens lost in packing (chunk totals incl. overlap re-reads)
    assert(out.map(_.getLong(3)).sum == 128 + 48 + 36)
  }

  test("contamination: flags docs overlapping the benchmark set, plan broadcasts bench side") {
    val mk = (id: Long, words: Seq[String]) => (id, words.mkString(" "))
    val common = (1 to 8).map(i => s"c$i") // 8-token shared run → 4 distinct 5-grams
    val corpus = Seq(
      mk(10L, common ++ Seq("x1", "x2")),        // 4 shared 5-grams → flagged
      mk(11L, Seq("a", "b", "c", "d", "e", "f")) // nothing shared
    ).toDF("doc_id", "text")
    val bench = Seq(mk(100L, "y0" +: common)).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, "doc_id", "text", 5, 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bench side should broadcast:\n$plan")
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 10L && rows(0).getLong(1) == 1L && rows(0).getLong(2) == 4L)
  }

  test("classifier: fast tier deterministic, uniform weights recover sigmoid closed form") {
    import spark.implicits._
    val docs = Seq((1L, "hello world foo"), (2L, "the quick brown fox jumps"),
      (3L, ""), (4L, "Mixed CASE text!!! with... punctuation"))
      .toDF("doc_id", "text")
    // uniform weights 1.0 → wsum = n_toks → mean logit 1 → sigmoid(1);
    // empty doc → 0 tokens → sigmoid(0) = 0.5. Hash-independent check
    val s1 = docs.select(col("doc_id"),
      Classifier.scoreWith(col("text"), Array.fill(8)(1.0)).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sig1 = 1.0 / (1.0 + math.exp(-1.0))
    assert(math.abs(s1(1L) - sig1) < 1e-12 && math.abs(s1(2L) - sig1) < 1e-12)
    assert(s1(3L) == 0.5)
    // fast tier: in (0,1), deterministic across evaluations
    val f = () => docs.select(col("doc_id"),
      Classifier.score(col("text"), dim = 256).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (a, b) = (f(), f())
    assert(a == b)
    assert(a.values.forall(v => v > 0.0 && v < 1.0))
    // portable and fast tiers disagree on values (different hash) but
    // agree on the empty-doc fixpoint
    val p = docs.select(col("doc_id"),
      Classifier.score(col("text"), dim = 256, portable = true).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(p(3L) == 0.5 && a(3L) == 0.5)
  }

  test("ngram LM: hand-computed Laplace ppl, OOV floor on held-out docs, broadcast plan") {
    import spark.implicits._
    val train = Seq((1L, "the cat sat on the mat"), (2L, "the cat ran")).toDF("doc_id", "text")
    val lm = NgramLm.train(train, "text")
    assert(lm.vocab == 6) // the cat sat on mat ran
    val test = Seq((10L, "the cat sat"), (11L, "zebra quux flarp")).toDF("doc_id", "text")
    val scored = NgramLm.perplexity(test, "doc_id", "text", lm)
    val out = scored.collect().map(r => r.getLong(0) -> r).toMap
    // doc 10: "the cat" c12=2 c1(the)=3 → 3/9; "cat sat" c12=1 c1(cat)=2 → 2/8
    val lp1 = math.floor(math.log(3.0 / 9.0) * 1048576) / 1048576
    val lp2 = math.floor(math.log(2.0 / 8.0) * 1048576) / 1048576
    val expected = math.exp(-((lp1 + lp2) / 2))
    assert(math.abs(out(10L).getAs[Double]("ppl") - expected) < 1e-9)
    // OOV gibberish: no bigram evidence, strictly more surprising
    assert(out(11L).getAs[Long]("sum_c12") == 0L)
    assert(out(10L).getAs[Double]("ppl") < out(11L).getAs[Double]("ppl"))
    // scale shape: LM sides broadcast by default
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast LM joins:\n$plan")
  }

  test("minhash signatures identical on raw vs distinct shingles (min is duplicate-insensitive)") {
    import spark.implicits._
    val df = Seq(
      (1L, "aa aa bb aa bb cc aa"), // heavy duplicate shingles
      (2L, "dd ee ff gg dd ee")
    ).toDF("doc_id", "text")
    val raw = Dedup.minhashSignatures(df, "doc_id", "text", 2, 4, words = true)
      .orderBy($"doc_id").collect().map(_.toSeq)
    // the distinct-shingle spelling minhashSignatures used before the
    // distinct-skip optimization — outputs must be bit-identical
    val sh = Dedup.wordShingleTable(df, "doc_id", "text", 2)
    val aggs = (0 until 4).map(i =>
      min(md5(concat(lit(i.toString), col("sh")))).as(s"h$i"))
    val dedup = sh.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .orderBy($"doc_id").collect().map(_.toSeq)
    assert(raw.toSeq == dedup.toSeq)
  }

  test("contamination: post-join countDistinct matches pre-join distinct spelling") {
    import spark.implicits._
    // corpus doc 1 repeats the contaminated shingle in-text: the raw
    // shingle table carries duplicates and only countDistinct dedup
    // keeps max_shared exact
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta gamma alpha beta"),
      (2L, "totally unrelated words here nothing shared at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, "doc_id", "text", 3, 1)
      .orderBy($"doc_id").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getLong(1) == 1L) // n_bench_docs
    // doc 1 contains "alpha beta gamma" TWICE; the only shared shingle
    // with the bench doc is that one, so max_shared must be the
    // DISTINCT count 1 — a raw count(1) over the joined duplicates
    // would wrongly report 2
    assert(out(0).getLong(2) == 1L)
  }

  test("Tables.spread floors parallelism on small scans, no-ops on large estimated splits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    spark.range(100).selectExpr("id", "cast(id as string) AS s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
    val df = spark.read.parquet(s"$dir/t.parquet")
    val par = spark.sparkContext.defaultParallelism
    val small = graft.Tables.spread(spark, df)
    assert(small.rdd.getNumPartitions == par, "small scan must spread to defaultParallelism")
    assert(small.orderBy("id").collect().map(_.getLong(0)).toSeq == (0L until 100L).toSeq)
    // force the estimated split count above parallelism → must be a no-op
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16")
      val big = graft.Tables.spread(spark, df)
      assert(big eq df, "large estimated scans must pass through untouched")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("Tables.spread sizes directory-layout tables by their data files, not the dir entry") {
    // A multi-file directory table whose DATA is large relative to the
    // split size: the old java.io.File.length() gate saw the ~4 KB
    // directory entry (or 0 on a remote FS) and fired an unconditional
    // reshuffle on exactly the inputs that must pass through untouched.
    val dir = java.nio.file.Files.createTempDirectory("graft-spread-dir").toString
    spark.range(200000).selectExpr("id", "repeat(cast(id as string), 8) AS s")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/big.parquet")
    val df = spark.read.parquet(s"$dir/big.parquet")
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // data files are ~1 MB; 16 KB splits → far more estimated splits
      // than any local parallelism → the gate must NOT add an exchange
      spark.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024).toString)
      val out = graft.Tables.spread(spark, df)
      assert(out eq df,
        "directory-layout table with many estimated splits must pass through untouched")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    // and a genuinely tiny directory table still gets the floor
    spark.range(100).selectExpr("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/small.parquet")
    val tiny = spark.read.parquet(s"$dir/small.parquet")
    val spreadTiny = graft.Tables.spread(spark, tiny)
    assert(spreadTiny.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // non-file-scan leaves (local relations) report unknown size → no-op
    import spark.implicits._
    val local = Seq((1L, "x")).toDF("id", "s")
    assert(graft.Tables.spread(spark, local) eq local,
      "non-file-scan inputs must pass through untouched")
  }
}
