package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer: real merge training and a real greedy
  * encoder (not the regex token-count estimate in [[TextAnalysis]]).
  *
  * Scale design mirrors production tokenizer trainers (word-frequency
  * dictionary first): the corpus pass is ONE distributed word count —
  * at 100 TB that's a single shuffle on word — optionally truncated to
  * the `maxWords` most frequent words (the tail's influence on merge
  * ranks is bounded by its mass), and merge training then runs on the
  * bounded driver-side dictionary exactly like the reference
  * implementations of the algorithm (Sennrich et al., ACL'16). Encoding
  * is a pure per-partition map with the merge ranks broadcast — no
  * shuffle, codegen-adjacent hot loop.
  */
object Bpe {

  /** End-of-word marker, kept distinct from any char symbol so merges
    * can't cross word boundaries (standard BPE practice).
    */
  val Eow = "</w>"

  /** Train `numMerges` merges. Deterministic: ties on pair frequency
    * break lexicographically.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 100000): Seq[(String, String)] = {
    val freqs: Seq[(String, Long)] = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    var words: Seq[(Array[String], Long)] =
      freqs.map { case (w, n) => (w.map(_.toString).toArray :+ Eow, n) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges) {
      val pairCounts = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      if (best._2 < 2) return merges.result() // singleton pairs: stop
      val (ba, bb) = best._1
      merges += ((ba, bb))
      words = words.map { case (syms, n) =>
        val out = new collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == ba && syms(i + 1) == bb) {
            out += ba + bb; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toArray, n)
      }
      m += 1
    }
    merges.result()
  }

  /** Encode: per word, repeatedly apply the lowest-rank applicable merge
    * (the standard greedy BPE segmenter). Appends `bpe_pieces`
    * (array of piece strings, `</w>`-terminated words) and `bpe_count`.
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val bc = spark.sparkContext.broadcast(rank)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("bpe_pieces", ArrayType(StringType)),
      StructField("bpe_count", IntegerType)))
    val idx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      val r = bc.value
      it.map { row =>
        if (row.isNullAt(idx)) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val pieces = Seq.newBuilder[String]
          var count = 0
          row.getString(idx).toLowerCase.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
            val segs = segment(w, r)
            pieces ++= segs
            count += segs.length
          }
          val p = pieces.result()
          Row.fromSeq(row.toSeq ++ Seq(p, count))
        }
      }
    }(Encoders.row(outSchema))
  }

  private[graft] def segment(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ Eow
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++ syms.drop(bestAt + 2)
    }
    syms
  }
}
