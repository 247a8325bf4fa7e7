package graft
/** Scratch debug entry (builder tooling): prints the result or error for
  * each SQL arg through Engine.sql. */
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val eng = Engine(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    args.foreach { q =>
      println("== " + q)
      try {
        val df = eng.sql(q)
        if (sys.env.contains("DBG_PLAN")) println(df.queryExecution.analyzed.toString)
        if (sys.env.contains("DBG_SCHEMA"))
          df.schema.fields.foreach(f => println(s"  ${f.name}: ${f.dataType} meta=${f.metadata}"))
        df.show(10, false)
      }
      catch { case e: Throwable =>
        println("ERR: " + e.toString.replace('\n',' ').take(600))
        if (sys.env.contains("DBG_TRACE"))
          e.getStackTrace.filterNot(_.getClassName.startsWith("java.util.regex"))
            .take(25).foreach(f => println("  at " + f))
      }
    }
  }
}
