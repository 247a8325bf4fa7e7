package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // warm the session (codegen, classloading, parquet footer cache) so
    // the first timed query isn't charged JVM start-up costs
    try {
      SparkEntry.queries.get("q1_agg").foreach(
        _(spark, sfDir).write.format("noop").mode("overwrite").save())
      spark.range(1000000).selectExpr("sum(id)").collect()
    } catch { case _: Throwable => }

    // optional filter for profiling single queries: SPARK_GRAFT_ONLY="q1_agg q_x"
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split("\\s+").toSet)
    // Per-query MEDIAN over `repeat` full passes: single-shot timings at
    // this scale are dominated by GC/session noise (a 1.7 s query can
    // read 27 s if it lands after a heavy neighbor), medians are stable.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n)) }
    // Each pass runs in its own SEEDED shuffle of the query order: with a
    // fixed alphabetical order, a query that always follows a heavy
    // neighbor inherits its GC/cache pressure in every pass, and the
    // median keeps the bias. Distinct per-pass orders decorrelate
    // neighbors, so the median isolates the query's own cost; the seed
    // keeps runs reproducible.
    val passes: Seq[Map[String, Double]] = (1 to repeat).map { pass =>
      val order = new scala.util.Random(42L + pass).shuffle(queries)
      order.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces every column/operator to evaluate (a count()
        // would let Catalyst prune the projections away)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results: Seq[(String, Double)] =
      queries.map { case (name, _) => name -> median(passes.map(_(name))) }
    def fmt(v: Double): String = f"$v%.3f"
    def line(rs: Seq[(String, Double)], metric: String): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val total = results.map(_._2).sum // total is always over ALL queries
      s"""{"metric":"$metric","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // Full per-query detail first, then a compact summary (slowest 20) as
    // the final line: the bench harness captures only the last ~2000 chars
    // of output and parses the last JSON line it finds there — the full
    // 120-query map overflows that window, the compact line fits.
    println(line(results, s"median_of_${repeat}_wall_all_${results.size}_queries"))
    println(line(results.sortBy(-_._2).take(20).sortBy(_._1),
      s"median_of_${repeat}_wall_${results.size}_queries_top20_shown"))
    spark.stop()
  }
}
