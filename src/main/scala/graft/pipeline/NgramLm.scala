package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet-style quality
  * filter: train n-gram counts on a (reference) corpus, score every
  * document by how surprising it is under that model, drop the tails.
  *
  * 100 TB shape:
  *  - train = two count shuffles (bigram key, unigram key) — pure
  *    groupBy aggregations, no driver state beyond one scalar (vocab);
  *  - score = map-side broadcast joins of the exploded bigram stream
  *    against the count tables, then one groupBy(doc) whose partial
  *    aggregation collapses the stream to ≤|docs| rows BEFORE the
  *    shuffle — wire volume is documents, not bigrams. For an LM too
  *    big to broadcast, pass broadcastLm = false and the joins shuffle
  *    on the bigram key instead.
  *
  * Laplace smoothing: P(w2|w1) = (c12 + 1) / (c1 + V). Log-probs are
  * QUANTIZED to 2^-20 dyadics before summing, so the distributed sum is
  * exact and order-independent — the per-doc average is reproducible
  * across partitionings, retries, and engines (the DuckDB oracle
  * matches it term for term).
  */
object NgramLm {

  /** Adjacent-pair bigram keys ("w1 w2") from the token array. */
  def bigrams(toks: Column): Column =
    zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b))

  /** Trained model: bigram counts (bg, c12), unigram counts (w, c1),
    * vocabulary size.
    */
  final case class BigramLm(bigramCounts: DataFrame, unigramCounts: DataFrame, vocab: Long)

  def train(docs: DataFrame, textCol: String): BigramLm = {
    val toks = Classifier.tokens(col(textCol))
    val bg = docs.select(explode(bigrams(toks)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    // the unigram table has two consumers (the vocab count here and the
    // scoring broadcast) — without materialization each re-runs the full
    // tokenize+explode+aggregate corpus pass; the lazy local checkpoint
    // computes it once and the second consumer reads blocks (same
    // pattern as Dedup.jaccardPairs)
    val ug = docs.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false)
    BigramLm(bg, ug, ug.count())
  }

  /** 2^-20 dyadic quantization — sums of quantized terms are exact. */
  private def q20(c: Column): Column = floor(c * lit(1048576.0)) / lit(1048576.0)

  /** Fused train + score over one corpus: the tokenized-document table is
    * materialized ONCE and feeds all three consumers (bigram counts,
    * unigram counts, scoring) — [[train]] + [[perplexity]] each tokenize
    * the corpus from scratch, so the unfused path pays three full
    * regex-tokenize scans where this pays one scan plus two block reads.
    * Row-for-row identical output to `perplexity(docs, …, train(docs, …))`
    * (same expressions over the same token arrays).
    */
  def trainScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol), Classifier.tokens(col(textCol)).as("__toks"))
      .localCheckpoint(false)
    val bg = tok.select(explode(bigrams(col("__toks"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val ug = tok.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false)
    val lm = BigramLm(bg, ug, ug.count())
    val bgDf = tok.filter(size(col("__toks")) >= 2)
      .select(col(idCol), explode(bigrams(col("__toks"))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val joined = bgDf.join(broadcast(lm.bigramCounts), Seq("bg"), "left")
      .join(broadcast(lm.unigramCounts).withColumnRenamed("w", "w1"), Seq("w1"), "left")
    val lp = q20(log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + lit(lm.vocab.toDouble))))
    joined.groupBy(col(idCol)).agg(
      count(lit(1)).cast("int").as("n_bigrams"),
      sum(coalesce(col("c12"), lit(0L))).as("sum_c12"),
      (sum(lp) / count(lit(1))).as("avg_lp"))
      .withColumn("ppl", exp(-col("avg_lp")))
  }

  /** Per-document perplexity under the model: doc id, n_bigrams,
    * sum_c12 (exact integer evidence), avg_lp, ppl = exp(-avg_lp).
    * Unseen bigrams/heads degrade smoothly via the Laplace floor
    * (left joins + coalesce 0), so held-out corpora score fine.
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String, lm: BigramLm,
                 broadcastLm: Boolean = true): DataFrame = {
    val toks = Classifier.tokens(col(textCol))
    val bgDf = docs.filter(size(toks) >= 2)
      .select(col(idCol), explode(bigrams(toks)).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val (b, u) =
      if (broadcastLm) (broadcast(lm.bigramCounts), broadcast(lm.unigramCounts))
      else (lm.bigramCounts, lm.unigramCounts)
    val joined = bgDf.join(b, Seq("bg"), "left")
      .join(u.withColumnRenamed("w", "w1"), Seq("w1"), "left")
    val lp = q20(log((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + lit(lm.vocab.toDouble))))
    joined.groupBy(col(idCol)).agg(
      count(lit(1)).cast("int").as("n_bigrams"),
      sum(coalesce(col("c12"), lit(0L))).as("sum_c12"),
      (sum(lp) / count(lit(1))).as("avg_lp"))
      .withColumn("ppl", exp(-col("avg_lp")))
  }
}
