package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents that look like a target
  * corpus by importance weighting in a hashed n-gram feature space,
  * then Gumbel-top-k resampling.
  *
  * 100 TB shape (mirrors [[NgramLm]]):
  *  - feature-bucket counts for target and raw are two count shuffles
  *    bounded by `dim` buckets (the explode collapses map-side);
  *  - the log-ratio table is ≤ `dim` rows → broadcast for scoring;
  *  - scoring is explode → broadcast join → per-doc rollup whose
  *    partial aggregation collapses the token stream to ≤|docs| rows
  *    before the shuffle;
  *  - resampling is a TakeOrderedAndProject over exact keys.
  *
  * Log-ratios and Gumbel draws are QUANTIZED to 2^-20 dyadics, so the
  * per-doc sums and the top-k cutoff are exact, order-free, and
  * engine-reproducible; the Gumbel uniform comes from md5 (portable),
  * making the "randomized" resample fully deterministic per seed.
  */
object Dsir {

  /** Trained importance model: per-bucket quantized log(p_target/p_raw)
    * plus the Laplace default for buckets unseen in both corpora.
    */
  final case class ImportanceModel(logRatio: DataFrame, dim: Int, defaultLr: Double)

  private def q20(c: Column): Column = floor(c * lit(1048576.0)) / lit(1048576.0)

  /** Hashed-unigram bucket counts: ≤ dim rows. */
  def bucketCounts(docs: DataFrame, textCol: String, dim: Int): DataFrame =
    docs.select(explode(Classifier.tokens(col(textCol))).as("w"))
      .select(Classifier.bucketPortable(col("w"), dim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** Laplace-smoothed log importance ratios:
    * lr(b) = ln((ct+1)/(Nt+dim)) − ln((cr+1)/(Nr+dim)), quantized.
    * Nt/Nr are two bounded driver scalars (as [[NgramLm.train]]'s vocab).
    */
  def train(target: DataFrame, raw: DataFrame, textCol: String, dim: Int): ImportanceModel = {
    // Each count table has two consumers (the Nt/Nr totals below and the
    // log-ratio join) — materialize once, read blocks twice. Nt/Nr are
    // the corpora's total token counts, which equal the sum of the
    // per-bucket counts (every token lands in exactly one bucket), so
    // they fold from the ≤dim-row count tables instead of two extra
    // full tokenize scans of the corpora.
    val t = bucketCounts(target, textCol, dim).withColumnRenamed("c", "ct")
      .localCheckpoint(false)
    val r = bucketCounts(raw, textCol, dim).withColumnRenamed("c", "cr")
      .localCheckpoint(false)
    def total(df: DataFrame, c: String): Long =
      df.agg(sum(col(c))).head() match {
        case row if row.isNullAt(0) => 0L
        case row => row.getLong(0)
      }
    val nt = total(t, "ct"); val nr = total(r, "cr")
    val lr = t.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"), q20(
        log((coalesce(col("ct"), lit(0L)) + lit(1L)) / lit(nt + dim.toDouble)) -
          log((coalesce(col("cr"), lit(0L)) + lit(1L)) / lit(nr + dim.toDouble))).as("lr"))
    val default = math.floor(
      (math.log(1.0 / (nt + dim.toDouble)) - math.log(1.0 / (nr + dim.toDouble))) * 1048576.0
    ) / 1048576.0
    ImportanceModel(lr, dim, default)
  }

  /** Per-document importance: (idCol, n_feats, logw). */
  def score(docs: DataFrame, idCol: String, textCol: String, model: ImportanceModel,
            broadcastModel: Boolean = true): DataFrame = {
    val lrDf = if (broadcastModel) broadcast(model.logRatio) else model.logRatio
    docs.select(col(idCol), explode(Classifier.tokens(col(textCol))).as("w"))
      .select(col(idCol), Classifier.bucketPortable(col("w"), model.dim).as("bucket"))
      .join(lrDf, Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_feats"),
        sum(coalesce(col("lr"), lit(model.defaultLr))).as("logw"))
  }

  /** Fused DSIR for the common shape where the target corpus is a SLICE
    * of the scored corpus (target = docs WHERE pred): the tokenized
    * bucket stream is materialized ONCE and feeds target counts, raw
    * counts and per-doc scoring — `train` + `score` tokenize the corpus
    * three separate times for the same result. Counts are identical
    * because filtering docs before exploding tokens equals filtering the
    * exploded stream on the same per-doc predicate. Output is
    * row-identical to `score(docs, …, train(docs.filter(pred), docs, …))`.
    */
  def scoreSelf(docs: DataFrame, idCol: String, textCol: String,
                targetPred: Column, dim: Int): DataFrame = {
    val b = docs
      .select(col(idCol), targetPred.as("__tgt"),
        explode(Classifier.tokens(col(textCol))).as("w"))
      .select(col(idCol), col("__tgt"),
        Classifier.bucketPortable(col("w"), dim).as("bucket"))
      .localCheckpoint(false)
    val t = b.filter(col("__tgt")).groupBy(col("bucket"))
      .agg(count(lit(1)).as("ct")).localCheckpoint(false)
    val r = b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr")).localCheckpoint(false)
    def total(df: DataFrame, c: String): Long =
      df.agg(sum(col(c))).head() match {
        case row if row.isNullAt(0) => 0L
        case row => row.getLong(0)
      }
    val nt = total(t, "ct"); val nr = total(r, "cr")
    val lr = t.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"), q20(
        log((coalesce(col("ct"), lit(0L)) + lit(1L)) / lit(nt + dim.toDouble)) -
          log((coalesce(col("cr"), lit(0L)) + lit(1L)) / lit(nr + dim.toDouble))).as("lr"))
    val default = math.floor(
      (math.log(1.0 / (nt + dim.toDouble)) - math.log(1.0 / (nr + dim.toDouble))) * 1048576.0
    ) / 1048576.0
    b.select(col(idCol), col("bucket"))
      .join(broadcast(lr), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_feats"),
        sum(coalesce(col("lr"), lit(default))).as("logw"))
  }

  /** Gumbel-top-k resample without replacement, P(doc) ∝ exp(logw):
    * skey = logw + Gumbel(md5-uniform). Deterministic per seed.
    */
  def resample(scored: DataFrame, idCol: String, k: Int, seed: String = "dsir"): DataFrame = {
    val u = (expr(s"cast(conv(substring(md5(concat('$seed', cast($idCol as string))), 1, 13), 16, 10) as bigint)")
      .cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val g = q20(-log(-log(u)))
    scored
      .withColumn("skey", col("logw") + g)
      .orderBy(col("skey").desc, col(idCol))
      .limit(k)
  }
}
