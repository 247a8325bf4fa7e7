package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q1_agg", "q_join_inner", "q_asof_join", "q_latest_on")) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
