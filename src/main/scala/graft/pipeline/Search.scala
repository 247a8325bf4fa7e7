package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus — the search-side
  * operator data pipelines use for contamination probes, targeted
  * quality audits, and eval-set mining (Robertson/Spärck Jones BM25 in
  * the Lucene form: idf = ln(1 + (N - df + 0.5)/(df + 0.5))).
  *
  * 100 TB shape:
  *  - doc lengths are a MAP-ONLY projection (`size(split(...))`) — no
  *    token explosion for the normalization factor;
  *  - the token stream is filtered to the QUERY's terms BEFORE any
  *    aggregation or join, so the postings pass shuffles only rows for
  *    matching terms (≤ |docs|·|queryTerms|), never the full index;
  *  - per-term document frequencies come off that filtered postings
  *    table and broadcast (|queryTerms| rows);
  *  - corpus stats (N, avgdl) are a 1-row aggregate, broadcast via
  *    cross join — nothing collects on the driver;
  *  - the per-doc rollup partial-aggregates before its shuffle, and the
  *    top-k is a TakeOrderedAndProject (no global sort materialized).
  *
  * Per-term contributions are QUANTIZED to 2^-20 dyadics (floor) before
  * summing — the same trick as [[Classifier]]/[[NgramLm]] — so the
  * distributed sum is exact and order-independent: scores, and
  * therefore the top-k cutoff, are reproducible bit-for-bit across
  * partitionings, retries, and engines.
  */
object Search {

  /** 2^-20 dyadic quantization — sums of quantized terms are exact. */
  private def q20(c: Column): Column = floor(c * lit(1048576.0)) / lit(1048576.0)

  /** Top-k BM25 retrieval: (idCol, n_terms, score) for the k best
    * documents; ties break on id. k1/b are the standard defaults.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = split(trim(col(textCol)), " ")
    val doclen = docs.select(col(idCol), size(words).as("dl"))
    val stats = doclen.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val hits = docs.select(col(idCol), explode(words).as("term"))
      .filter(col("term").isin(terms: _*)) // prune BEFORE the shuffle
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // two consumers: df counts + scoring
    val dft = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = q20(
      log((col("n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    hits.join(broadcast(dft), Seq("term"))
      .join(doclen, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", contrib)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_terms"), sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
