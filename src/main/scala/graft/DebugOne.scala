package graft

/** Dev utility: replay one refparity corpus case (selected by
  * `<file-substring>:<line>`) with full stack traces and the printed
  * result next to the expected text. Not part of the shipped surface.
  *
  * Usage: DebugOne <corpus.jsonl> <file-substring:line> [altQuery]
  */
object DebugOne {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val Array(fsub, lineS) = args(1).split(":")
    val line = lineS.toInt
    RefParity.setupGlobFixture()
    val spark = Sessions.local()
    val engine = Engine(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    spark.conf.set("graft.catalog.hideBaseline", "true")
    val c = scala.io.Source.fromFile(corpus).getLines()
      .map(RefParity.parseCase)
      .find(c => c.file.contains(fsub) && c.line == line)
      .getOrElse(sys.error(s"no case $fsub:$line"))
    println(s"== ${c.file}:${c.line} tier=${c.tier}")
    (c.ddls ++ c.mutate).foreach { d =>
      println(s"-- ddl: ${d.take(200)}")
      try engine.sql(d) catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
    }
    val q = if (args.length > 2) args(2) else c.query
    println(s"-- query: $q")
    try {
      val df = engine.sql(q)
      val got = graft.sql.RefText.print(df)
      println("-- got:\n" + got)
      println("-- expected:\n" + c.expected)
      println(if (got == c.expected) "== MATCH" else "== MISMATCH")
    } catch { case e: Throwable => e.printStackTrace() }
  }
}
