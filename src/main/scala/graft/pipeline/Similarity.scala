package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  *  - [[cosineTopK]]: brute-force exact top-k — the correctness
  *    baseline. The (small) query set is broadcast; the corpus streams
  *    through once; per-query top-k via a key-partitioned window.
  *  - [[lshBuckets]]: sign-of-hyperplane LSH bucketing — the 100 TB
  *    path: bucket assignment is a per-row expression (no joins), and
  *    candidate generation joins only within buckets. Hyperplane
  *    weights are a deterministic integer formula, so results are
  *    engine-portable and seed-stable.
  *
  * Dot products run in double precision via `zip_with`/`aggregate`
  * lambda expressions — codegen'd, no UDF.
  */
object Similarity {
  private val dot = (a: String, b: String) =>
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")

  /** Exact cosine top-k of `corpus` rows for each query row.
    * Similarities are rounded (1e-6) with an id tiebreak so ranking is
    * reproducible across engines/partitionings. Norms are computed once
    * per row before the pair join (same arithmetic, factored out of the
    * O(|q|·|c|) hot loop — one dot product per pair instead of three).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qe"))
      .withColumn("qn", sqrt(dot("qe", "qe")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("ce"))
      .withColumn("cn", sqrt(dot("ce", "ce")))
    val sim = round(dot("qe", "ce") / (col("qn") * col("cn")), 6)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", sim)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", "cid", "sim", "rn")
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs within a
    * blocking key whose cosine similarity clears the threshold. The
    * block join bounds the pair explosion (at corpus scale the block is
    * an LSH bucket from [[lshBuckets]] instead of a label).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, threshold: Double): DataFrame = {
    // norms once per row, not per pair — identical arithmetic to the
    // inline form, one dot product per pair instead of three
    val a = df.select(col(blockCol), col(idCol).as("a"), col(vecCol).as("va"))
      .withColumn("na", sqrt(dot("va", "va")))
    val b = df.select(col(blockCol), col(idCol).as("b"), col(vecCol).as("vb"))
      .withColumn("nb", sqrt(dot("vb", "vb")))
    val sim = round(dot("va", "vb") / (col("na") * col("nb")), 6)
    a.join(b, Seq(blockCol)).filter(col("a") < col("b"))
      .withColumn("sim", sim)
      .filter(col("sim") >= threshold)
      .select(col(blockCol), col("a"), col("b"), col("sim"))
  }

  /** Sign-LSH bucket id per vector: bit h = sign(v · w_h) where
    * w_h[i] = ((i*73 + h*37) mod 19) - 9 — integer pseudo-weights.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 numPlanes: Int): DataFrame = {
    val planes = (0 until numPlanes).map { h =>
      val d = expr(
        s"""aggregate(
           |  zip_with($vecCol, sequence(0, size($vecCol) - 1),
           |    (x, i) -> CAST(x AS DOUBLE) * (((i * 73 + $h * 37) % 19) - 9)),
           |  0D, (acc, v) -> acc + v)""".stripMargin)
      when(d > 0.0, 1L << h).otherwise(0L)
    }
    df.select(col(idCol), planes.reduce(_ + _).as("bucket"))
  }

  /** Bucketed approximate near-neighbour candidate pairs. */
  def lshCandidates(df: DataFrame, idCol: String, vecCol: String,
                    numPlanes: Int): DataFrame = {
    val b = lshBuckets(df, idCol, vecCol, numPlanes)
    val a = b.select(col("bucket"), col(idCol).as("a"))
    val bb = b.select(col("bucket"), col(idCol).as("b"))
    a.join(bb, Seq("bucket")).filter(col("a") < col("b"))
      .select("bucket", "a", "b")
  }
}
