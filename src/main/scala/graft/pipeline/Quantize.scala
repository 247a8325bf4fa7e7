package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the standard
  * memory/shuffle lever for ANN at corpus scale: a 100 TB float32
  * embedding store drops to ~25 TB as int8 with a per-dimension affine
  * map, and every shuffle/broadcast in the candidate-generation stage
  * shrinks 4× with it. Rerank stages dequantize on the fly (error is
  * bounded by scale/2 per dimension, see the spec's bound check).
  *
  * `fit` is ONE aggregate pass collecting 2·dim doubles — trivially
  * broadcastable; `quantize`/`dequantize` are pure per-row lambda
  * transforms (no UDF, no shuffle).
  */
object Quantize {

  /** Per-dimension [lo, hi] over the corpus: one posexplode + group. */
  def fit(df: DataFrame, embCol: String): Seq[(Double, Double)] =
    df.select(posexplode(col(embCol)).as(Seq("pos", "e")))
      .groupBy(col("pos"))
      .agg(min(col("e").cast("double")).as("lo"), max(col("e").cast("double")).as("hi"))
      .orderBy(col("pos"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

  private def litArr(xs: Seq[Double]): Column = array(xs.map(lit): _*)

  /** Affine int8 code per element: round((x-lo)·255/(hi-lo)) - 128,
    * clipped for out-of-fit-domain inputs; constant dims code to 0.
    */
  def quantize(df: DataFrame, embCol: String, params: Seq[(Double, Double)],
               out: String = "qembed"): DataFrame = {
    val los = litArr(params.map(_._1))
    val his = litArr(params.map(_._2))
    df.withColumn(out, transform(col(embCol), (x, i) => {
      val lo = element_at(los, i + 1)
      val hi = element_at(his, i + 1)
      val code = round((x.cast("double") - lo) * 255 / (hi - lo)) - 128
      when(hi === lo, lit(0))
        .otherwise(greatest(lit(-128), least(lit(127), code)))
        .cast("tinyint")
    }))
  }

  /** Inverse affine map: lo + (q+128)·(hi-lo)/255 (doubles). */
  def dequantize(df: DataFrame, qCol: String, params: Seq[(Double, Double)],
                 out: String = "deq"): DataFrame = {
    val los = litArr(params.map(_._1))
    val his = litArr(params.map(_._2))
    df.withColumn(out, transform(col(qCol), (q, i) => {
      val lo = element_at(los, i + 1)
      val hi = element_at(his, i + 1)
      when(hi === lo, lo)
        .otherwise(lo + (q.cast("double") + 128) * (hi - lo) / 255)
    }))
  }
}
