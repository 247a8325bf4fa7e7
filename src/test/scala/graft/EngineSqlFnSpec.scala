package graft

class EngineSqlFnSpec extends SparkSpec {
  test("registered custom functions are callable from SQL") {
    val e = Engine(spark, sfDir)
    val r = e.sql(
      """SELECT ksum(value) AS k, nsum(value) AS n,
        |  geohash_encode(48.669D, -4.329D, 8) AS gh
        |FROM events""".stripMargin).head()
    val exact = Tables.events(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("value").cast("decimal(24,6)")))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(r.getDouble(0) - exact) < 1e-6)
    assert(math.abs(r.getDouble(1) - exact) < 1e-6)
    assert(r.getString(2) == "gbsuv7zt")
  }
}
