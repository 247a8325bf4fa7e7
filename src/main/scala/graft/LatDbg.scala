package graft
object LatDbg {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val eng = Engine(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    args.sliding(2, 2).foreach { case Array(kind, q) =>
      if (kind == "ddl") { try eng.sql(q).collect() catch { case e: Throwable => println("DDLERR " + e) } }
      else {
        val out = graft.sql.LateralRewrites(q,
          sub => try {
            val v = "__dbg_lat_" + System.nanoTime()
            eng.sql(sub).createOrReplaceTempView(v); Some(v)
          } catch { case _: Exception => None },
          t => try Some(spark.table(t).columns.toSeq) catch { case _: Exception => None })
        println("REWRITTEN: [" + out + "]")
      }
    }
  }
}
