package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Registration shim for Spark's native, codegen'd Bloom-filter probe
  * expression (the one the optimizer's runtime-filter injection plants,
  * SPARK-32268). A Scala-closure UDF probe is interpreted per row —
  * boxing + lambda dispatch in the hottest map-side filter of the
  * contamination pipeline; `BloomFilterMightContain` emits a direct
  * `mightContainLong` call inside whole-stage codegen and deserializes
  * the filter once per task. The filter bytes travel as a plan literal —
  * exactly how Spark's own injection ships them (its scalar subquery
  * folds to a literal before tasks launch).
  */
object BloomProbe {
  /** Register `bloom_might_contain(filterBinary, xxhash64Value)` for the
    * Column API (idempotent) — same seam as [[DotProductExpr.register]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
}
