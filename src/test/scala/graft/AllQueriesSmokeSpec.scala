package graft

/** Gate-integrity guard: EVERY `SparkEntry.queries` entry must execute
  * without throwing at sf0.001. The driver's Verify main swallows
  * per-query exceptions and the correctness gate omits missing outputs,
  * so a rewrite that breaks one query can silently SHRINK the gate
  * (r12: q_sql_pg_compat dropped 190→189 with nothing red). This spec
  * makes that failure mode impossible to ship: a broken query fails
  * `sbt test` the moment it breaks.
  *
  * Also asserts the queries/oracleSql contract: every oracle key has a
  * query, so the driver never compares against a missing result.
  */
class AllQueriesSmokeSpec extends SparkSpec {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without a query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes without throwing") {
      val df = fn(spark, sfDir)
      // force full execution, not just analysis — rewrites can fail at
      // runtime (codegen, UDF resolution, shuffle planning). A count()
      // would prune the projection and skip expression evaluation, so
      // collect the real rows (sf0.001 results are small).
      df.collect()
    }
  }
}
