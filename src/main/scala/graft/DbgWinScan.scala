package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Scan every declared query's optimized plan for Window nodes with an
  * EMPTY partitionSpec — the "No Partition Defined … single partition"
  * shape that cannot scale. Prints each hit with the window expressions
  * so bounded-by-construction inputs can be allowlisted deliberately.
  */
object DbgWinScan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, dir)
        val hits = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString("; ").take(120)
        }
        if (hits.nonEmpty) println(s"$name :: ${hits.mkString(" | ")}")
      } catch { case e: Throwable => println(s"$name :: ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
