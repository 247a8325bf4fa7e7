package graft
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
object DbgMv {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet() })
    Tables.registerAll(spark, dir)
    // warm pass
    graft.sql.QuestSql.sql(spark, "CREATE MATERIALIZED VIEW mv_w REFRESH IMMEDIATE AS (SELECT ts, event_type, count(*) AS n FROM events SAMPLE BY 1d)")
    graft.sql.QuestSql.sql(spark, "DROP MATERIALIZED VIEW mv_w")
    def t(label: String)(f: => Any): Unit = {
      val j0 = jobs.get; val t0 = System.nanoTime(); f
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      println(f"$label%-22s ${(System.nanoTime()-t0)/1e9}%7.3f s  jobs=${jobs.get - j0}")
    }
    for (i <- 1 to 2) {
      println(s"== round $i")
      t("CREATE MV IMMEDIATE")(graft.sql.QuestSql.sql(spark, "CREATE MATERIALIZED VIEW mv_q_daily REFRESH IMMEDIATE AS (SELECT ts, event_type, count(*) AS n, min(value) AS mn, max(value) AS mx FROM events SAMPLE BY 1d)"))
      t("REFRESH FULL")(graft.sql.QuestSql.sql(spark, "REFRESH MATERIALIZED VIEW mv_q_daily FULL"))
      t("SELECT read")(graft.sql.QuestSql.sql(spark, "SELECT ts, event_type, n, mn, mx FROM mv_q_daily ORDER BY ts, event_type").write.format("noop").mode("overwrite").save())
      t("DROP")(graft.sql.QuestSql.sql(spark, "DROP MATERIALIZED VIEW mv_q_daily"))
    }
    spark.stop()
  }
}
