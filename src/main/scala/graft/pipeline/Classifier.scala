package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashed-feature linear text classifier inference — the fastText-style
  * quality/domain filter every large-scale training-data pipeline runs
  * over its corpus (score → threshold → keep/drop).
  *
  * Spark-first shape: pure column expressions, map-only, no shuffle —
  * the scan streams through once and the filter predicate pushes down
  * with the rest of the plan, which is exactly what a 100 TB scoring
  * pass needs. Weights are a hash-indexed table:
  *
  *   bucket(token) = H(token) mod dim
  *   logit         = Σ w[bucket(t)] / max(|tokens|, 1)
  *   score         = sigmoid(4·logit)
  *
  * Two hash tiers:
  *  - fast (default): `xxhash64` — codegen'd, the production path;
  *  - portable: md5-word arithmetic, bit-identical in any engine with
  *    md5 — the oracle-gated path.
  *
  * Default weights are md5-seeded pseudo-weights QUANTIZED to 2^-20
  * dyadics: every partial sum of ≤2^32 terms is exactly representable
  * in a double, so the fold is order-independent — a distributed sum
  * can't drift. `scoreWith` takes real trained weights (broadcast as a
  * literal array) for users with an actual model; the inference
  * plumbing is identical.
  */
object Classifier {

  /** Lowercased alnum tokens, empties dropped — mirrors the oracle's
    * `string_split_regex(lower(text), '[^a-z0-9]+')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Portable bucket: first md5 word mod dim. */
  def bucketPortable(tok: Column, dim: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(dim.toLong))

  /** Fast bucket: xxhash64 mod dim (codegen, no string hashing in
    * interpreted code).
    */
  def bucketFast(tok: Column, dim: Int): Column =
    pmod(xxhash64(tok), lit(dim.toLong))

  /** Deterministic pseudo-weight for a bucket, quantized to 2^-20 so
    * sums are exact: floor(md5word/2^12)/2^20 - 0.5 ∈ [-0.5, 0.5).
    */
  def pseudoWeight(bucket: Column, seed: String): Column =
    floor(conv(substring(md5(concat(lit(seed), bucket.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4096.0)) / lit(1048576.0) - lit(0.5)

  /** [[pseudoWeight]] evaluated driver-side for a known bucket id —
    * bit-identical arithmetic (md5 over UTF-8, first 8 hex chars as an
    * exact ≤2^32 long, the same double divisions/floors). The weight
    * table depends only on (seed, dim), so folding all `dim` values into
    * one literal array swaps a second per-token md5 chain for an array
    * lookup — model metadata, not data (8 KB at dim=1024).
    */
  def pseudoWeightValue(bucket: Long, seed: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((seed + bucket.toString).getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString // first 8 hex chars = 4 bytes
    math.floor(java.lang.Long.parseLong(hex, 16) / 4096.0) / 1048576.0 - 0.5
  }

  /** Literal weight-table column for [[pseudoWeight]] over buckets
    * 0..dim-1 (1-indexed for `element_at`).
    */
  def pseudoWeightTable(dim: Int, seed: String): Column =
    array((0L until dim.toLong).map(b => lit(pseudoWeightValue(b, seed))): _*)

  /** Mean-pooled logit over the token stream (exact dyadic sum). */
  def logit(text: Column, dim: Int = 4096, seed: String = "w",
            portable: Boolean = false): Column = {
    val toks = tokens(text)
    val b: Column => Column =
      if (portable) bucketPortable(_, dim) else bucketFast(_, dim)
    val wsum = aggregate(toks, lit(0.0), (acc, t) => acc + pseudoWeight(b(t), seed))
    wsum / greatest(size(toks), lit(1)).cast("double")
  }

  /** sigmoid(4·logit) ∈ (0,1) — the keep/drop score. */
  def score(text: Column, dim: Int = 4096, seed: String = "w",
            portable: Boolean = false): Column =
    sigmoid(lit(4.0) * logit(text, dim, seed, portable))

  private def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** Inference with REAL weights: `weights(j)` is the coefficient for
    * bucket j (dense array, broadcast as a literal — at fastText's
    * 2M-bucket default that is a 16 MB plan constant, fine to ship to
    * every executor once).
    */
  def scoreWith(text: Column, weights: Array[Double], bias: Double = 0.0): Column = {
    val dim = weights.length
    val arr = array(weights.toSeq.map(lit): _*)
    val toks = tokens(text)
    val wsum = aggregate(toks, lit(0.0),
      (acc, t) => acc + element_at(arr, bucketFast(t, dim).cast("int") + 1))
    sigmoid(wsum / greatest(size(toks), lit(1)).cast("double") + lit(bias))
  }
}
