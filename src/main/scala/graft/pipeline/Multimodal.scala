package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extraction runs batched per partition (the Scala analogue of
  * `mapInPandas` — one iterator pass, no per-row driver involvement).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] derives deterministic fake dimensions
  * from the payload bytes. Everything around it — schema, batch
  * iteration, partition-parallel execution, null passthrough — is the
  * real pipeline shape a codec would drop into.
  */
object Multimodal {
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** Wrap any string column as a fake binary payload (test fixture). */
  def asPayload(df: DataFrame, srcCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, to_binary(md5(col(srcCol)), lit("hex")))

  /** Batched "decode": per-partition iterator, one output row per input
    * row, metadata struct appended. Replace the body of `decodeOne`
    * with a real codec (JPEG header parse, ffprobe, ...) — the Spark
    * plumbing does not change.
    */
  def decodeStub(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val idx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val meta: Row = if (r.isNullAt(idx)) null else decodeOne(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(Encoders.row(outSchema))
  }

  private def decodeOne(bytes: Array[Byte]): Row = {
    // ??? real codec goes here; deterministic fake below
    val b0 = java.lang.Byte.toUnsignedInt(bytes(0))
    val b1 = java.lang.Byte.toUnsignedInt(bytes(1))
    val fmt = if (b0 % 2 == 0) "png" else "jpg"
    Row(16 + b0 * 4, 16 + b1 * 4, 3, fmt)
  }

  /** Frame sampling for (fake) video payloads: emit every `stride`-th
    * "frame" as its own row — the explode-side of a multimodal
    * pipeline, partition-parallel.
    */
  def frameSample(df: DataFrame, payloadCol: String, frames: Int, stride: Int): DataFrame =
    df.withColumn("frame_no",
      explode(sequence(lit(0), lit((frames - 1) * stride), lit(stride))))
      .withColumn("frame_key", sha2(concat(col(payloadCol), col("frame_no").cast("string")), 256))

  /** Batched "resize": binary → binary with refreshed metadata — the
    * shape of an image-resize stage (payload transform, meta rewrite,
    * per-partition batching). The stub derives the output payload
    * deterministically; a real resampler drops into `resizeOne`.
    */
  def resizeStub(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("resized", BinaryType))
    val idx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val out = if (r.isNullAt(idx)) null else resizeOne(r.getAs[Array[Byte]](idx), w, h)
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
      .withColumn("meta",
        when(col("resized").isNotNull,
          struct(lit(w).as("width"), lit(h).as("height"),
            lit(3).as("channels"), lit("png").as("format"))))
  }

  private def resizeOne(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? real resampler goes here; deterministic fake below
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(bytes); d.update(s"${w}x$h".getBytes)
    d.digest()
  }

  /** Batched "feature extraction": binary → unit-norm Array[Float]
    * embedding — the drop-in shape for a vision/audio encoder. The
    * deterministic fake hashes byte windows; the output feeds straight
    * into [[Similarity.lshBuckets]] / [[Similarity.cosineTopK]], which
    * is the point: multimodal payloads join the same ANN pipeline as
    * text embeddings.
    */
  def featuresStub(df: DataFrame, payloadCol: String, dim: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val idx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val f = if (r.isNullAt(idx)) null else featuresOne(r.getAs[Array[Byte]](idx), dim)
        Row.fromSeq(r.toSeq :+ f)
      }
    }(Encoders.row(outSchema))
  }

  private def featuresOne(bytes: Array[Byte], dim: Int): Seq[Float] = {
    // ??? real encoder goes here; deterministic hashed-window fake below
    val raw = (0 until dim).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
      d.update(bytes); d.update(i.toByte)
      val h = d.digest()
      (java.lang.Byte.toUnsignedInt(h(0)) * 256 + java.lang.Byte.toUnsignedInt(h(1))) / 65536.0f - 0.5f
    }
    val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
    raw.map(x => if (norm == 0) 0.0f else x / norm)
  }
}
