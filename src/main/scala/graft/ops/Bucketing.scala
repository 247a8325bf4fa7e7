package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, co-located) tables — the shuffle-elision
  * lever for repeated big joins and aggregations.
  *
  * The reference co-locates via its storage engine (symbol-indexed,
  * time-partitioned columns read in order); the Spark-native analogue
  * is hash-bucketed persistent tables: both join sides written with
  * `bucketBy(n, keys)` + `sortBy(keys)` hash-place every key into the
  * same bucket file on both sides, so a later equi-join plans as a
  * sort-merge join over matching buckets with NO Exchange on either
  * side — at 100 TB that removes the dominant cost of a fact-to-fact
  * join (re-shuffling both inputs every query). The write pays one
  * shuffle once; every subsequent join/aggregation on the bucket keys
  * rides for free, which is exactly the right trade for dimension
  * conformance joins and repeated dedup/self-join pipelines.
  *
  * Bucket count guidance at scale: pick `buckets` so one bucket of the
  * larger table is ~100-500 MB (e.g. 100 TB fact / 256 MB target →
  * ~400k buckets is too many files; bucket the *join working set*, or
  * combine with day partitioning so each partition holds `buckets`
  * files). Local tests use small counts; the plan shape is identical.
  */
object Bucketing {

  /** Persist `df` as a bucketed + in-bucket-sorted parquet table in the
    * session catalog (external when `path` is given). Overwrites any
    * previous table of the same name.
    */
  def writeBucketed(df: DataFrame, name: String, keys: Seq[String], buckets: Int,
                    path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val w = df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  /** Equi-join two tables previously written with [[writeBucketed]] on
    * the same keys and bucket count: Catalyst's bucketing rule aligns
    * the two bucket layouts, so the plan is a zip of per-bucket
    * sort-merge joins — no Exchange (verified in PlanSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), keys, joinType)
}
