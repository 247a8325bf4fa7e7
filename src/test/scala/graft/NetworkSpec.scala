package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Network surfaces: ILP over TCP (socket source pipeline) and the
  * REST /exec /imp /exp endpoints.
  */
class NetworkSpec extends SparkSpec {
  import spark.implicits._

  test("ILP over TCP: lines stream through parse into the partitioned table") {
    val tableDir = Files.createTempDirectory("ilptcp_t").toString
    val ckpt = Files.createTempDirectory("ilptcp_c").toString
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    // emitter thread: accept Spark's socket-source connection, push lines
    val emitter = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("trades,sym=A price=10.0 1704067200000000000")
      out.println("trades,sym=B price=20.0 1704070800000000000")
      out.println("trades,sym=A price=10.0 1704067200000000000") // dup
      out.flush()
      Thread.sleep(3000) // let the source drain before the socket closes
      sock.close(); server.close()
    })
    emitter.start()
    val q = graft.streaming.IlpTcp.start(spark, "127.0.0.1", port,
      tableDir, ckpt, "ts", Seq("sym")) { parsed =>
      parsed.filter($"measurement" === "trades")
        .select($"tags"("sym").as("sym"), element_at($"f_double", "price").as("price"), $"ts")
    }
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = scala.util.Try(spark.read.parquet(tableDir).count()).getOrElse(0L)
        if (n < 2) Thread.sleep(250)
      }
      assert(n == 2) // dup dropped by DEDUP UPSERT KEYS(ts, sym)
    } finally {
      q.stop(); emitter.join(10000)
    }
  }

  test("REST /exec returns QuestDB-shaped JSON") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.RestServer(engine)
    val port = srv.start()
    try {
      val q = java.net.URLEncoder.encode(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type", "UTF-8")
      val body = new String(
        new java.net.URI(s"http://127.0.0.1:$port/exec?query=$q").toURL.openStream().readAllBytes())
      assert(body.contains(""""columns":[{"name":"event_type","type":"VARCHAR"},{"name":"n","type":"LONG"}]"""))
      assert(body.contains(""""dataset":[["""))
      assert(body.contains(""""count":"""))
      // dialect forms ride the same endpoint
      val q2 = java.net.URLEncoder.encode("SHOW TABLES", "UTF-8")
      val body2 = new String(
        new java.net.URI(s"http://127.0.0.1:$port/exec?query=$q2").toURL.openStream().readAllBytes())
      assert(body2.contains("\"events\""))
    } finally srv.stop()
  }

  test("REST /imp imports CSV and /exp exports it back") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.RestServer(engine)
    val port = srv.start()
    try {
      val conn = new java.net.URI(s"http://127.0.0.1:$port/imp?name=imp_t").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("sym,price\nA,1.5\nB,2.5\n".getBytes)
      val resp = new String(conn.getInputStream.readAllBytes())
      assert(resp.contains("\"rowsImported\":2"))
      val q = java.net.URLEncoder.encode("SELECT * FROM imp_t ORDER BY sym", "UTF-8")
      val csv = new String(
        new java.net.URI(s"http://127.0.0.1:$port/exp?query=$q").toURL.openStream().readAllBytes())
      assert(csv.startsWith("sym,price"))
      assert(csv.contains("A,1.5") && csv.contains("B,2.5"))
    } finally srv.stop()
  }
}
