package graft

/** Micro-dissection of per-query fixed costs: for a few queries, time
  * (a) DataFrame construction (rewrite+analysis), (b) first noop run,
  * (c) steady-state reruns of the SAME DataFrame (no re-plan, codegen
  * cache warm), (d) rerun of a REBUILT DataFrame. Separates plan-build
  * cost from execution cost from codegen-compile cost.
  */
object DbgMicro {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val names = if (args.nonEmpty) args.toSeq else Seq("q_uuid", "q1_agg", "q_window_rank")
    try SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      val (tb, df) = t(fn(spark, dir))
      val (ta, _) = t(df.queryExecution.executedPlan) // analysis+optimization+planning
      val (t1, _) = t(df.write.format("noop").mode("overwrite").save())
      val reruns = (1 to 3).map(_ => t(df.write.format("noop").mode("overwrite").save())._1)
      val (tr, df2) = t(fn(spark, dir))
      val (t2, _) = t(df2.write.format("noop").mode("overwrite").save())
      println(f"$q%-24s build=$tb%6.3f plan=$ta%6.3f run1=$t1%6.3f rerunSame=${reruns.min}%6.3f rebuild=$tr%6.3f rerunRebuilt=$t2%6.3f")
    }
    spark.stop()
  }
}
