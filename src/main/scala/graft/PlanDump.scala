package graft

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifacts (plans/r14/<q>_before|after.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query...>
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val qs = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$q$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/$q$suffix.txt")
    }
    spark.stop()
  }
}
