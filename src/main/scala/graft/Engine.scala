package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade: `Engine(spark, dataDir).sql("...")` accepts the
  * reference's SQL dialect (time-series extensions included) over the
  * registered tables; `ts()` exposes the typed Scala DSL for the same
  * operators (sampleBy / latestOn / asofJoin / ...).
  */
class Engine(val spark: SparkSession, dataDir: String) {
  Tables.registerAll(spark, dataDir)
  Engine.registerFunctions(spark)

  def sql(query: String): DataFrame = graft.sql.QuestSql.sql(spark, query)

  /** Positional bind variables (`$1`, `$2`, ... — reference
    * `bind/BindVariableServiceImpl.java`).
    */
  def sql(query: String, args: Any*): DataFrame =
    graft.sql.QuestSql.sql(spark, query, args.toSeq)

  /** Named bind variables (`:name`). */
  def sqlNamed(query: String, args: Map[String, Any]): DataFrame =
    graft.sql.QuestSql.sql(spark, query, args)

  def table(name: String): DataFrame = spark.table(name)

  /** EXPLAIN passthrough — formatted physical plan of a dialect query. */
  def explain(query: String): String =
    sql(query).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
}

object Engine {
  def apply(spark: SparkSession, dataDir: String): Engine = new Engine(spark, dataDir)

  /** Expose the custom function library to SQL (reference
    * FunctionFactory registry analogue — SURVEY §2.10).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    graft.functions.GeoHashEncodeExpr.register(spark)
    graft.functions.Long256AddExpr.register(spark)
    graft.functions.DotProductExpr.register(spark)
    graft.functions.Decimal256Ops.register(spark)
    graft.functions.Decimal256Agg.register(spark)
    spark.udf.register("ksum",
      org.apache.spark.sql.functions.udaf(graft.functions.Aggregators.KSum))
    spark.udf.register("nsum",
      org.apache.spark.sql.functions.udaf(graft.functions.Aggregators.NSum))
    // default-shaped heavy-hitters sketch (top 10, 256 counters); the
    // parameterized form is graft.functions.HeavyHitters.heavyHitters
    spark.udf.register("heavy_hitters",
      org.apache.spark.sql.functions.udaf(new graft.functions.HeavyHitters.MisraGries(256, 10)))
    // operational helper (reference functions/test/SleepFunctionFactory
    // contract: block ms, return true) — a UDF is correct here, the
    // side effect IS the function
    spark.udf.register("sleep", (ms: Long) => { Thread.sleep(ms); true })
  }
}
