package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristics, document
  * fingerprinting. All pure column expressions (codegen'd, no UDFs) —
  * they run inside the scan's WholeStageCodegen span, so cost is one
  * pass over the text bytes regardless of table size.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: a word of length L costs
    * ceil(L/4) tokens — a cheap upper bound used for corpus budgeting.
    * `toksCol` names a pre-split token array column: tokenize once,
    * derive everything from it (the splits dominate otherwise).
    */
  def bpeTokenEstimate(toksCol: String): Column =
    expr(s"aggregate($toksCol, 0, (acc, w) -> acc + int(ceil(length(w) / 4.0)))")

  /** Stopword-list hit count over a token array column. */
  def hitCount(toksCol: String, words: Seq[String]): Column = {
    val list = words.map(w => s"'$w'").mkString(", ")
    size(expr(s"filter($toksCol, w -> w IN ($list))"))
  }

  private val EN = Seq("the", "of", "and", "to", "in", "for", "on", "with")
  private val ES = Seq("el", "la", "de", "que", "los", "por", "con")
  private val DE = Seq("der", "die", "das", "und", "ist", "von", "mit")
  private val FR = Seq("le", "la", "les", "des", "est", "dans", "pour")

  /** Language-ID heuristic: argmax of per-language stopword densities
    * with a deterministic priority tiebreak.
    */
  def langId(toksCol: String): Column = {
    val en = hitCount(toksCol, EN); val es = hitCount(toksCol, ES)
    val de = hitCount(toksCol, DE); val fr = hitCount(toksCol, FR)
    val m = greatest(en, es, de, fr)
    when(m === 0, "und")
      .when(en === m, "en").when(es === m, "es")
      .when(de === m, "de").otherwise("fr")
  }

  /** Quality score in [0,1]: mean-word-length band, stopword presence.
    * Deterministic rational arithmetic.
    */
  def qualityScore(textCol: String, toksCol: String): Column = {
    val text = col(textCol)
    val nTok = size(col(toksCol)).cast("double")
    val meanWord = (length(text) - nTok + 1.0) / nTok // chars per token
    val stopRatio = hitCount(toksCol, EN).cast("double") / nTok
    val lenOk = when(nTok.between(5, 100000), 0.4).otherwise(0.0)
    val wordOk = when(meanWord.between(2.0, 12.0), 0.3).otherwise(0.0)
    val stopOk = when(stopRatio > 0.02, 0.3).otherwise(0.0)
    round(lenOk + wordOk + stopOk, 2)
  }

  /** Gopher-style quality-rule bundle (Rae et al. 2021 §A1.1, plus the
    * repetition filter from its Table A1): per-document measures and
    * the composite keep flag, every rule a pure column expression —
    * the 100 TB pass is map-only, zero shuffles, and the measures are
    * exact integer/IEEE arithmetic so any engine reproduces them
    * bit-for-bit. Thresholds are the published ones except the word
    * count bounds, which are parameters (corpora differ).
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [3, 10]; ≥ 80% of words contain an alphabetic character; ≤ 10% of
    * words are symbol-ish (# or ellipsis); at least 2 distinct
    * stopwords present; duplicate-unigram fraction ≤ 0.3.
    */
  def gopherRules(toksCol: String, minWords: Int = 50, maxWords: Int = 100000): Seq[Column] = {
    val t = col(toksCol)
    val n = size(t).cast("double")
    val meanLen = expr(s"aggregate($toksCol, CAST(0 AS BIGINT), (a, x) -> a + length(x))")
      .cast("double") / n
    val alphaFrac = size(expr(s"filter($toksCol, x -> x rlike '[A-Za-z]')")).cast("double") / n
    val symbolFrac = size(expr(s"filter($toksCol, x -> x rlike '#|\\\\.\\\\.\\\\.')")).cast("double") / n
    val stopPresent = size(array_intersect(array_distinct(t),
      array(STOPS.map(lit): _*)))
    val dupFrac = lit(1.0) - size(array_distinct(t)).cast("double") / n
    Seq(
      size(t).as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_frac"),
      round(symbolFrac, 6).as("symbol_frac"),
      stopPresent.as("stop_present"),
      round(dupFrac, 6).as("dup_unigram_frac"),
      (size(t) >= minWords && size(t) <= maxWords &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        alphaFrac >= 0.8 && symbolFrac <= 0.1 &&
        stopPresent >= 2 && dupFrac <= 0.3).as("gopher_keep"))
  }

  private val STOPS = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Canonical URL for web-corpus dedup: lowercase scheme+host, strip
    * default ports, drop the fragment and the standard tracking
    * parameters (utm_*, fbclid, gclid, ref), trim a trailing slash.
    * Pure regex/string column expressions (codegen'd, map-only;
    * RE2-safe patterns — no backreferences or lookarounds, so the same
    * rules run verbatim on any engine). URLs differing only in tracking
    * noise collapse to one key — the first step of URL-level dedup
    * before any content pass.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val headRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val head = lower(regexp_extract(noFrag, headRe, 0))
    val tail = regexp_replace(noFrag, headRe, "")
    // strip only the scheme's own default port: http://host:443 and
    // https://host:80 are non-default origins and must stay distinct
    val h1 = regexp_replace(head, "^(http://[^:/?#]*):80$", "$1")
    val h2 = regexp_replace(h1, "^(https://[^:/?#]*):443$", "$1")
    val joined = concat(h2, tail)
    val track = "(?:utm_[a-z]+|fbclid|gclid|ref)"
    val t1 = regexp_replace(joined, s"&$track=[^&#]*", "")  // &-separated params
    val t2 = regexp_replace(t1, s"\\?$track=[^&#]*&", "?")  // leading ?param&more
    val t3 = regexp_replace(t2, s"\\?$track=[^&#]*$$", "")  // ?param alone
    when(t3.endsWith("/") && !t3.endsWith("://"),
      t3.substr(lit(1), length(t3) - 1)).otherwise(t3)
  }

  /** Content fingerprint: md5 of case/space-normalized text (exact-dup
    * key), plus a locality-sensitive "min-shingle" fingerprint.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Token-window chunking: split each document's token stream into
    * windows of `window` tokens advancing by `stride` (overlap =
    * window - stride), keeping the final partial window — the standard
    * context-length packing step before tokenization. One generate +
    * explode per document, no shuffle: chunk rows stay co-partitioned
    * with their source docs, so at 100 TB this is a map-side fan-out
    * whose output feeds straight into a partitioned write.
    *
    * Output: one row per chunk with (chunk_id, chunk, chunk_tokens).
    */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int, carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    require(stride > 0 && window >= stride, "need 0 < stride <= window")
    df.withColumn("__w", tokens(col(textCol)))
      .withColumn("__n", size(col("__w")))
      .withColumn("__start",
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride))))
      .select((idCol +: carry).map(col) ++ Seq(
        (col("__start") / stride).cast("int").as("chunk_id"),
        array_join(slice(col("__w"), col("__start") + 1, lit(window)), " ").as("chunk"),
        least(lit(window), col("__n") - col("__start")).cast("int").as("chunk_tokens")): _*)
  }

  /** Token-budget packing: assign chunk rows to training batches
    * ("bins") of ~`budget` tokens by start-offset on the running token
    * total — bin = floor(tokens-before-this-chunk / budget), the
    * sequential-fill packing every pretraining loader does before
    * writing shards.
    *
    * The running total is windowed PER `shardCol` (source / date /
    * bucket), not globally: a global ordered cumsum is a one-partition
    * bottleneck at 100 TB, while per-shard packing runs one window
    * partition per shard — embarrassingly parallel, and shard-local
    * bins are what the loader wants anyway.
    *
    * Output: per (shard, bin) — chunk count, packed token total,
    * distinct source docs.
    */
  def packChunks(chunks: org.apache.spark.sql.DataFrame, shardCol: String,
                 idCol: String, budget: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col(idCol), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("__before",
        sum(col("chunk_tokens")).over(w) - col("chunk_tokens"))
      .withColumn("bin", floor(col("__before") / budget).cast("int"))
      .groupBy(col(shardCol), col("bin"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("n_tokens"),
        countDistinct(col(idCol)).as("n_docs"))
  }
}
