package graft
/** Scratch: time one bench query's phases at a given SF. */
object DbgBenchOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e6}%.1f ms  $l"); r
    }
    (1 to 3).foreach { i =>
      t(s"registerAll #$i")(Tables.registerAll(spark, dir))
      val df = t(s"QuestSql.sql #$i")(graft.sql.QuestSql.sql(spark,
        "SELECT event_type, ts, count(*) AS n FROM events SAMPLE BY 1d ORDER BY event_type, ts"))
      t(s"execute #$i")(df.collect().length)
    }
  }
}
