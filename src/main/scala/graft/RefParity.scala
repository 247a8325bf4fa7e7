package graft

import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Reference-parity sweep: replay (setup DDL, query, expected output)
  * triples harvested from the reference's own JUnit suite (see
  * tools/refparity_extract.py) through [[Engine.sql]] and compare the
  * [[graft.sql.RefText]]-printed result with the reference's expected
  * text, byte for byte.
  *
  * Usage: RefParity <corpus.jsonl> <report.jsonl> [shard i/n] [filter]
  *
  * Per-case outcome categories:
  *   pass            — full text match (header + values)
  *   pass_values     — data rows match, header names differ
  *   mismatch        — executed, values differ
  *   setup_error     — a DDL/setup statement failed
  *   error           — the query itself failed to parse/execute
  *   skip_missing    — query references a table the harvested setup never
  *                     created (the JUnit body built it dynamically)
  *   run_pass/run_error — "run" tier (reference-PRNG-dependent values):
  *                     execute-only check
  */
object RefParity {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  case class Case(file: String, line: Int, query: String, ddls: Seq[String],
                  mutate: Seq[String], expected: String, expected2: String,
                  tier: String)

  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val report = args(1)
    val (shardIdx, shardCnt) = if (args.length > 2 && args(2).contains("/")) {
      val Array(i, n) = args(2).split("/"); (i.toInt, n.toInt)
    } else (0, 1)
    val filter = if (args.length > 3) Some(args(3)) else None

    val spark = Sessions.local()
    val engine = Engine(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val baseline = spark.catalog.listTables().collect().map(_.name.toLowerCase).toSet

    val cases = scala.io.Source.fromFile(corpus).getLines().zipWithIndex
      .filter { case (_, i) => i % shardCnt == shardIdx }
      .map { case (l, _) => parseCase(l) }
      .filter(c => filter.forall(f => c.file.contains(f)))
      .toVector

    val out = new java.io.PrintWriter(report)
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var done = 0
    cases.foreach { c =>
      val (cat, detail) = runCase(engine, c)
      counts(cat) += 1
      out.println(mapper.writeValueAsString(Map(
        "file" -> c.file, "line" -> c.line, "cat" -> cat,
        "detail" -> detail.take(2000)).asJava))
      done += 1
      if (done % 200 == 0) {
        System.err.println(s"[refparity] $done/${cases.size} " +
          counts.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
        out.flush()
      }
      cleanup(spark, baseline)
    }
    out.close()
    System.err.println(s"[refparity] TOTAL ${cases.size}: " +
      counts.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" "))
  }

  def parseCase(line: String): Case = {
    val n = mapper.readTree(line)
    def arr(f: String): Seq[String] = {
      val a = n.get(f)
      if (a == null || a.isNull) Nil
      else a.elements().asScala.map(_.asText()).toVector
    }
    def str(f: String): String = {
      val v = n.get(f); if (v == null || v.isNull) null else v.asText()
    }
    Case(str("file"), n.get("line").asInt(), str("query"), arr("ddls"),
      arr("mutate"), str("expected"), str("expected2"), str("tier"))
  }

  def runCase(engine: Engine, c: Case): (String, String) = {
    // setup
    for (ddl <- c.ddls) {
      try { val df = engine.sql(ddl); if (!df.isEmpty) () }
      catch {
        case e: Throwable =>
          return (if (c.tier == "run") "run_error" else "setup_error",
            s"ddl: ${ddl.take(200)} -> ${msg(e)}")
      }
    }
    def exec(): Either[(String, String), String] =
      try Right(graft.sql.RefText.print(engine.sql(c.query)))
      catch {
        case e: Throwable =>
          val m = msg(e)
          if (m.contains("TABLE_OR_VIEW_NOT_FOUND") || m.contains("Table or view not found"))
            Left(("skip_missing", m))
          else Left(("error", m))
      }
    exec() match {
      case Left((cat, m)) =>
        (if (c.tier == "run") (if (cat == "error") "run_error" else cat) else cat,
          s"q: ${c.query.take(200)} -> $m")
      case Right(text) =>
        if (c.tier == "run") ("run_pass", "")
        else compare(text, c.expected) match {
          case None =>
            // optional second phase: mutate + re-check
            if (c.expected2 == null || c.mutate.isEmpty) ("pass", "")
            else {
              for (m <- c.mutate) {
                try { val df = engine.sql(m); if (!df.isEmpty) () }
                catch { case e: Throwable => return ("setup_error", s"mutate -> ${msg(e)}") }
              }
              exec() match {
                case Left((cat, mg)) => (cat, mg)
                case Right(t2) => compare(t2, c.expected2) match {
                  case None => ("pass", "")
                  case Some(d) if d.startsWith("HEADER_ONLY") => ("pass_values", d)
                  case Some(d) => ("mismatch", d)
                }
              }
            }
          case Some(diff) if diff.startsWith("HEADER_ONLY") => ("pass_values", diff)
          case Some(diff) => ("mismatch", diff)
        }
    }
  }

  /** None = match; Some(diff) = first difference. Accepts a values-only
    * match (headers differ) as the "pass_values" half-state encoded in
    * the diff text. */
  def compare(actual: String, expected: String): Option[String] = {
    if (actual == expected) return None
    val a = actual.split("\n", -1)
    val e = expected.split("\n", -1)
    if (a.length == e.length && a.drop(1).sameElements(e.drop(1)))
      return Some(s"HEADER_ONLY a='${a.head}' e='${e.head}'")
    val i = a.zip(e).indexWhere { case (x, y) => x != y }
    val (la, le) = if (i >= 0) (a(i), e(i))
      else if (a.length > e.length) (a(e.length), "<eof>")
      else ("<eof>", e(a.length))
    Some(s"row${i}: a='${la.take(300)}' e='${le.take(300)}' (${a.length - 1} vs ${e.length - 1} rows)")
  }

  private def msg(e: Throwable): String = {
    val m = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    m.split("\n").take(2).mkString(" ").take(400)
  }

  private def cleanup(spark: org.apache.spark.sql.SparkSession, baseline: Set[String]): Unit = {
    spark.catalog.listTables().collect().foreach { t =>
      if (!baseline(t.name.toLowerCase)) {
        try spark.catalog.dropTempView(t.name)
        catch { case _: Throwable => try spark.catalog.dropGlobalTempView(t.name) catch { case _: Throwable => () } }
      }
    }
    graft.sql.QuestSql.retainDesignatedTs(baseline)
    try graft.ops.Checkpoint.release() catch { case _: Throwable => () }
  }
}
