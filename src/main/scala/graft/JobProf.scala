package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query orchestration profile: wall seconds, Spark job count, stage
  * count, task count for each named query (noop sink, one untimed warm
  * pass first). At bench scale (sf0.1, KB-range inputs) wall time is
  * dominated by serial jobs/stages, so this is the measurement that says
  * WHERE the fixed overhead is (guide §1.1: decide what the time is
  * going to before optimizing).
  *
  * Usage: runMain graft.JobProf <query...>  (empty = all, sorted)
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // warm: classloading/codegen off the first measured query
    try SparkEntry.queries("q1_agg")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%7s")
    for (q <- names) {
      val fn = SparkEntry.queries(q)
      try { // one warm pass so codegen/IO caches don't skew job counts
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => }
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[jobprof] $q: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading counters — a fixed
      // sleep races late StageCompleted events into the next query's row
      // under load (listenerBus is private[spark]; public at bytecode)
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(50) }
      println(f"$q%-28s $sec%7.3f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%7d")
    }
    spark.stop()
  }
}
