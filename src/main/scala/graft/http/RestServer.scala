package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame

/** Minimal REST surface mirroring the reference's HTTP endpoints
  * (`cutlass/http/processors/JsonQueryProcessor` `/exec`,
  * `TextImportProcessor` `/imp`, `ExportQueryProcessor` `/exp`) on the
  * JDK's built-in HTTP server — no extra dependencies, enough for the
  * query/import/export loop a dashboard or script drives:
  *
  *   GET /exec?query=SELECT...&limit=N → JSON {query, columns, dataset, count}
  *   GET /exp?query=SELECT...          → CSV attachment
  *   POST /imp?name=t                  → CSV body registered as table t
  *
  * The full PGWire binary protocol stays out of scope (SURVEY §6) — this
  * covers the HTTP side of the reference's client surface.
  */
class RestServer(engine: graft.Engine, port: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/exec", handler(execHandler))
  server.createContext("/exp", handler(expHandler))
  server.createContext("/imp", handler(impHandler))
  server.setExecutor(null) // serial — matches a single SparkSession driver

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort

  private def handler(f: HttpExchange => (Int, String, String)): HttpHandler =
    (ex: HttpExchange) => {
      val (code, contentType, body) = try f(ex) catch {
        case e: Exception =>
          (400, "application/json", s"""{"error":${jsonStr(e.getMessage)}}""")
      }
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.add("Content-Type", contentType)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def execHandler(ex: HttpExchange): (Int, String, String) = {
    val p = params(ex)
    val query = p.getOrElse("query", throw new IllegalArgumentException("missing query"))
    val limit = p.get("limit").map(_.toInt).getOrElse(1000)
    val df = engine.sql(query)
    (200, "application/json", renderJson(query, df, limit))
  }

  private def expHandler(ex: HttpExchange): (Int, String, String) = {
    val p = params(ex)
    val query = p.getOrElse("query", throw new IllegalArgumentException("missing query"))
    val limit = p.get("limit").map(_.toInt).getOrElse(1000000)
    val df = engine.sql(query)
    (200, "text/csv", renderCsv(df, limit))
  }

  private def impHandler(ex: HttpExchange): (Int, String, String) = {
    val p = params(ex)
    val name = p.getOrElse("name", throw new IllegalArgumentException("missing name"))
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val tmp = java.nio.file.Files.createTempDirectory("graft_imp")
    java.nio.file.Files.writeString(tmp.resolve("data.csv"), body)
    val df = engine.spark.read
      .option("header", "true").option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(tmp.toString)
    df.createOrReplaceTempView(name)
    (200, "application/json",
      s"""{"status":"OK","location":${jsonStr(name)},"rowsImported":${df.count()}}""")
  }

  private def jsonStr(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => if (f.isNaN || f.isInfinite) "null" else f.toString
    case d: java.math.BigDecimal => d.toPlainString
    case other => jsonStr(other.toString)
  }

  private def renderJson(query: String, df: DataFrame, limit: Int): String = {
    val cols = df.schema.fields.map(f =>
      s"""{"name":${jsonStr(f.name)},"type":${jsonStr(graft.Catalog.sqlTypeName(f.dataType))}}""")
    val rows = df.limit(limit).collect().map(r =>
      r.toSeq.map(jsonVal).mkString("[", ",", "]"))
    s"""{"query":${jsonStr(query)},"columns":[${cols.mkString(",")}],""" +
      s""""dataset":[${rows.mkString(",")}],"count":${rows.length}}"""
  }

  private def csvCell(v: Any): String = v match {
    case null => ""
    case s: String if s.contains(",") || s.contains("\"") || s.contains("\n") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  private def renderCsv(df: DataFrame, limit: Int): String = {
    val header = df.columns.map(csvCell(_)).mkString(",")
    val rows = df.limit(limit).collect().map(_.toSeq.map(csvCell).mkString(","))
    (header +: rows).mkString("", "\r\n", "\r\n")
  }
}
