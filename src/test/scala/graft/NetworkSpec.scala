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

      // reference URL params: limit=lo,hi pagination (1-based inclusive),
      // nm (no metadata), count (full count), timings
      val q3 = java.net.URLEncoder.encode(
        "SELECT event_id FROM events WHERE event_id < 10 ORDER BY event_id", "UTF-8")
      val page = new String(new java.net.URI(
        s"http://127.0.0.1:$port/exec?query=$q3&limit=3,5&nm=true&count=true&timings=true")
        .toURL.openStream().readAllBytes())
      assert(page.contains("""dataset":[[2],[3],[4]]"""), page)
      assert(page.contains(""""count":10"""), page) // full count, not the page
      assert(!page.contains("columns"), page)       // nm=true
      assert(page.contains(""""timings":{"compiler":"""), page)

      // limit clamping: negative → empty set (reference stop<0 → 0),
      // values past Int.MaxValue don't overflow
      val neg = new String(new java.net.URI(
        s"http://127.0.0.1:$port/exec?query=$q3&limit=-5&nm=true")
        .toURL.openStream().readAllBytes())
      assert(neg.contains(""""dataset":[]"""), neg)
      val huge = new String(new java.net.URI(
        s"http://127.0.0.1:$port/exec?query=$q3&limit=9999999999999&nm=true")
        .toURL.openStream().readAllBytes())
      assert(huge.contains("[9]"), huge)
      val negRange = new String(new java.net.URI(
        s"http://127.0.0.1:$port/exec?query=$q3&limit=-3,-1&nm=true")
        .toURL.openStream().readAllBytes())
      assert(negRange.contains(""""dataset":[]"""), negRange)
    } finally srv.stop()
  }

  test("ILP over HTTP: /write ingests lines, registers views, upserts on dedup keys") {
    val engine = Engine(spark, sfDir)
    val ilpDir = Files.createTempDirectory("ilphttp").toString
    val srv = new graft.http.RestServer(engine, ilpDir = ilpDir)
    val port = srv.start()
    try {
      def post(path: String, body: String): Int = {
        val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes)
        conn.getResponseCode
      }
      assert(post("/write?dedup=sym",
        "mtrades,sym=A price=10.0,qty=5i 1704067200000000000\n" +
          "mtrades,sym=B price=20.0,qty=7i 1704070800000000000\n") == 204)
      // second request: same (ts, sym=A) upserts, sym=C is new; the
      // influx-compat alias and ms precision ride the same handler
      assert(post("/api/v2/write?dedup=sym&precision=ms",
        "mtrades,sym=A price=11.5,qty=6i 1704067200000\n" +
          "mtrades,sym=C price=30.0,qty=9i 1704070800000\n") == 204)
      val rows = spark.sql("SELECT sym, price, qty FROM mtrades ORDER BY sym").collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
        Seq(("A", 11.5, 6L), ("B", 20.0, 7L), ("C", 30.0, 9L)))
      // timestamps survived the precision rescale
      val ts = spark.sql("SELECT CAST(ts AS STRING) FROM mtrades WHERE sym = 'B'").head().getString(0)
      assert(ts.startsWith("2024-01-01"))
    } finally srv.stop()
  }

  test("PGWire: startup handshake, SELECT 1, dialect query, error recovery") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      def readMsg(): (Char, Array[Byte]) = {
        val t = in.readByte().toChar
        val p = new Array[Byte](in.readInt() - 4)
        in.readFully(p); (t, p)
      }
      def readUntilReady(): Seq[(Char, Array[Byte])] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Char, Array[Byte])]
        var m = readMsg()
        while (m._1 != 'Z') { buf += m; m = readMsg() }
        buf.toSeq
      }
      def query(sql: String): Seq[(Char, Array[Byte])] = {
        val b = sql.getBytes("UTF-8")
        out.writeByte('Q'); out.writeInt(4 + b.length + 1); out.write(b); out.writeByte(0)
        out.flush(); readUntilReady()
      }
      def dataRows(ms: Seq[(Char, Array[Byte])]): Seq[Seq[String]] =
        ms.filter(_._1 == 'D').map { case (_, p) =>
          val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(p))
          (0 until d.readShort().toInt).map { _ =>
            val len = d.readInt()
            if (len < 0) null
            else { val b = new Array[Byte](len); d.readFully(b); new String(b, "UTF-8") }
          }
        }

      // SSLRequest → 'N', then cleartext startup + trust auth
      out.writeInt(8); out.writeInt(80877103); out.flush()
      assert(in.readByte().toChar == 'N')
      val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000".getBytes("UTF-8")
      out.writeInt(8 + params.length); out.writeInt(196608); out.write(params); out.flush()
      val hello = readUntilReady()
      assert(hello.head._1 == 'R') // AuthenticationOk
      assert(hello.exists(_._1 == 'S') && hello.exists(_._1 == 'K'))

      val r1 = query("SELECT 1 AS one")
      assert(r1.map(_._1).toSeq == Seq('T', 'D', 'C'))
      assert(dataRows(r1) == Seq(Seq("1")))

      // the dialect rides the wire: SAMPLE BY through Engine.sql
      val r2 = query("SELECT ts, count(*) AS n FROM events WHERE event_type = 'click' SAMPLE BY 1d ORDER BY ts")
      assert(dataRows(r2).nonEmpty)
      assert(r2.exists(_._1 == 'C'))

      // bad SQL → ErrorResponse, session survives
      val r3 = query("SELECT FROM nowhere ,,,")
      assert(r3.exists(_._1 == 'E'))
      assert(dataRows(query("SELECT 2 AS two")) == Seq(Seq("2")))

      // terminate
      out.writeByte('X'); out.writeInt(4); out.flush()
    } finally { sock.close(); srv.stop() }
  }

  test("ILP over UDP: datagrams buffer, flush commits, dedup keys upsert") {
    val engine = Engine(spark, sfDir)
    val ilpDir = Files.createTempDirectory("ilpudp").toString
    val rcv = new graft.streaming.IlpUdp(engine, ilpDir = ilpDir, dedupKeys = Seq("sym"))
    val port = rcv.start()
    val sock = new java.net.DatagramSocket()
    try {
      def send(lines: String): Unit = {
        val b = lines.getBytes("UTF-8")
        sock.send(new java.net.DatagramPacket(b, b.length,
          java.net.InetAddress.getLoopbackAddress, port))
      }
      def awaitLines(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 15000
        while (rcv.linesReceived < n && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(rcv.linesReceived == n)
      }
      // first commit: one multi-line datagram
      send("utrades,sym=A price=10.0 1704067200000000000\n" +
        "utrades,sym=B price=20.0 1704070800000000000")
      awaitLines(2)
      rcv.flush()
      // second commit: same (ts, sym) → cross-batch upsert wins
      send("utrades,sym=A price=11.0 1704067200000000000")
      awaitLines(3)
      rcv.flush()
      val rows = spark.sql("SELECT sym, price FROM utrades ORDER BY sym").collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
        Seq(("A", 11.0), ("B", 20.0)))
    } finally { sock.close(); rcv.stop() }
  }

  test("PGWire extended protocol: Parse/Bind/Describe/Execute with params and resume") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      def readMsg(): (Char, Array[Byte]) = {
        val t = in.readByte().toChar
        val p = new Array[Byte](in.readInt() - 4)
        in.readFully(p); (t, p)
      }
      def readUntilReady(): Seq[(Char, Array[Byte])] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Char, Array[Byte])]
        var m = readMsg()
        while (m._1 != 'Z') { buf += m; m = readMsg() }
        buf.toSeq
      }
      def msg(tpe: Char)(body: java.io.DataOutputStream => Unit): Unit = {
        val buf = new java.io.ByteArrayOutputStream()
        val b = new java.io.DataOutputStream(buf)
        body(b); b.flush()
        out.writeByte(tpe); out.writeInt(4 + buf.size()); buf.writeTo(out)
      }
      def cstr(b: java.io.DataOutputStream, s: String): Unit = {
        b.write(s.getBytes("UTF-8")); b.writeByte(0)
      }
      def decode(p: Array[Byte]): Seq[String] = {
        val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(p))
        (0 until d.readShort().toInt).map { _ =>
          val len = d.readInt()
          if (len < 0) null
          else { val b = new Array[Byte](len); d.readFully(b); new String(b, "UTF-8") }
        }
      }

      // startup (no SSL probe this time)
      val params = "user\u0000graft\u0000\u0000".getBytes("UTF-8")
      out.writeInt(8 + params.length); out.writeInt(196608); out.write(params); out.flush()
      readUntilReady()

      // Parse a parameterized statement, declared OIDs int8, text
      msg('P') { b => cstr(b, "s1"); cstr(b, "SELECT $1 + 1 AS x, upper($2) AS u"); b.writeShort(2); b.writeInt(20); b.writeInt(25) }
      msg('D') { b => b.writeByte('S'); cstr(b, "s1") }
      msg('B') { b =>
        cstr(b, ""); cstr(b, "s1")
        b.writeShort(0)      // param formats: all text
        b.writeShort(2)      // two params
        b.writeInt(2); b.write("41".getBytes)
        b.writeInt(2); b.write("ab".getBytes)
        b.writeShort(0)      // result formats
      }
      msg('E') { b => cstr(b, ""); b.writeInt(0) }
      msg('S') { _ => }
      out.flush()
      val ms = readUntilReady()
      assert(ms.map(_._1) == Seq('1', 't', 'T', '2', 'D', 'C'))
      assert(decode(ms.find(_._1 == 'D').get._2) == Seq("42", "AB"))

      // portal row-limit + PortalSuspended resume across Executes
      msg('P') { b => cstr(b, ""); cstr(b, "SELECT id FROM (VALUES (1),(2),(3)) v(id) ORDER BY id"); b.writeShort(0) }
      msg('B') { b => cstr(b, "c1"); cstr(b, ""); b.writeShort(0); b.writeShort(0); b.writeShort(0) }
      msg('E') { b => cstr(b, "c1"); b.writeInt(2) }
      msg('H') { _ => }
      out.flush()
      // expect ParseComplete, BindComplete, 2 DataRows, PortalSuspended
      assert(readMsg()._1 == '1')
      assert(readMsg()._1 == '2')
      assert(decode(readMsg()._2) == Seq("1"))
      assert(decode(readMsg()._2) == Seq("2"))
      assert(readMsg()._1 == 's')
      msg('E') { b => cstr(b, "c1"); b.writeInt(2) }
      msg('S') { _ => }
      out.flush()
      val ms2 = readUntilReady()
      assert(ms2.map(_._1) == Seq('D', 'C')) // last row, then complete
      assert(decode(ms2.head._2) == Seq("3"))

      // error discipline: bad Bind → ErrorResponse, discard until Sync
      msg('B') { b => cstr(b, ""); cstr(b, "missing_stmt"); b.writeShort(0); b.writeShort(0); b.writeShort(0) }
      msg('E') { b => cstr(b, ""); b.writeInt(0) }
      msg('S') { _ => }
      out.flush()
      val ms3 = readUntilReady()
      assert(ms3.map(_._1) == Seq('E')) // one error, Execute discarded

      // the dialect through the extended path: LATEST ON with a bind param
      msg('P') { b => cstr(b, ""); cstr(b, "SELECT user_id, value FROM events WHERE event_type = $1 LATEST ON ts PARTITION BY user_id"); b.writeShort(1); b.writeInt(25) }
      msg('B') { b =>
        cstr(b, ""); cstr(b, "")
        b.writeShort(0); b.writeShort(1)
        b.writeInt(5); b.write("click".getBytes)
        b.writeShort(0)
      }
      msg('D') { b => b.writeByte('P'); cstr(b, "") }
      msg('E') { b => cstr(b, ""); b.writeInt(0) }
      msg('S') { _ => }
      out.flush()
      val ms4 = readUntilReady()
      assert(ms4.take(3).map(_._1) == Seq('1', '2', 'T'))
      assert(ms4.count(_._1 == 'D') > 0)
      assert(ms4.last._1 == 'C')

      out.writeByte('X'); out.writeInt(4); out.flush()
    } finally { sock.close(); srv.stop() }
  }

  /** Minimal PG protocol client for the new-surface tests. */
  private final class PgClient(port: Int) {
    val sock = new java.net.Socket("127.0.0.1", port)
    sock.setSoTimeout(120000) // a hung read fails the test, not the suite
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(sock.getOutputStream)
    def readMsg(): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val p = new Array[Byte](in.readInt() - 4)
      in.readFully(p); (t, p)
    }
    def readUntilReady(): Seq[(Char, Array[Byte])] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Char, Array[Byte])]
      var m = readMsg()
      while (m._1 != 'Z') { buf += m; m = readMsg() }
      buf.toSeq
    }
    def msg(tpe: Char)(body: java.io.DataOutputStream => Unit): Unit = {
      val buf = new java.io.ByteArrayOutputStream()
      val b = new java.io.DataOutputStream(buf)
      body(b); b.flush()
      out.writeByte(tpe); out.writeInt(4 + buf.size()); buf.writeTo(out)
    }
    def cstr(b: java.io.DataOutputStream, s: String): Unit = {
      b.write(s.getBytes("UTF-8")); b.writeByte(0)
    }
    def sendQuery(sql: String): Unit = {
      val b = sql.getBytes("UTF-8")
      out.writeByte('Q'); out.writeInt(4 + b.length + 1); out.write(b); out.writeByte(0)
      out.flush()
    }
    /** Startup; returns the BackendKeyData (pid, secret). */
    def startup(): (Int, Int) = {
      val params = "user\u0000graft\u0000\u0000".getBytes("UTF-8")
      out.writeInt(8 + params.length); out.writeInt(196608); out.write(params); out.flush()
      val hello = readUntilReady()
      val k = hello.find(_._1 == 'K').get._2
      val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(k))
      (d.readInt(), d.readInt())
    }
    def decodeText(p: Array[Byte]): Seq[String] = {
      val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(p))
      (0 until d.readShort().toInt).map { _ =>
        val len = d.readInt()
        if (len < 0) null
        else { val b = new Array[Byte](len); d.readFully(b); new String(b, "UTF-8") }
      }
    }
    def close(): Unit = sock.close()
  }

  test("TLS: PGWire SSLRequest upgrade + HTTPS /exec round-trip") {
    // throwaway self-signed PKCS12 minted by the JDK's own keytool —
    // the library takes a keystore path (standard server contract), it
    // never generates certificates itself
    val dir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ksPath = dir.resolve("server.p12").toString
    val rc = new ProcessBuilder("keytool", "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ksPath, "-storepass", "changeit",
      "-dname", "CN=localhost", "-validity", "2").start().waitFor()
    assert(rc == 0, "keytool keystore generation failed")

    val trustAll = javax.net.ssl.SSLContext.getInstance("TLS")
    trustAll.init(null, Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
      }), null)

    val engine = Engine(spark, sfDir)
    val pg = new graft.http.PgWireServer(engine, tls = Some(ksPath -> "changeit"))
    val port = pg.start()
    val raw = new java.net.Socket("127.0.0.1", port)
    try {
      raw.setSoTimeout(120000)
      val rawOut = new java.io.DataOutputStream(raw.getOutputStream)
      rawOut.writeInt(8); rawOut.writeInt(80877103); rawOut.flush() // SSLRequest
      assert(raw.getInputStream.read() == 'S'.toInt, "server must accept SSLRequest")
      val ssl = trustAll.getSocketFactory
        .createSocket(raw, "127.0.0.1", port, true)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(true)
      ssl.startHandshake()
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(ssl.getInputStream))
      val out = new java.io.DataOutputStream(ssl.getOutputStream)
      val params = "user\u0000graft\u0000\u0000".getBytes("UTF-8")
      out.writeInt(8 + params.length); out.writeInt(196608); out.write(params); out.flush()
      def readMsg(): (Char, Array[Byte]) = {
        val t = in.readByte().toChar
        val p = new Array[Byte](in.readInt() - 4)
        in.readFully(p); (t, p)
      }
      def readUntilReady(): Seq[(Char, Array[Byte])] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Char, Array[Byte])]
        var m = readMsg()
        while (m._1 != 'Z') { buf += m; m = readMsg() }
        buf.toSeq
      }
      assert(readUntilReady().exists(_._1 == 'K')) // startup completed over TLS
      val q = "SELECT 41 + 1 AS x".getBytes("UTF-8")
      out.writeByte('Q'); out.writeInt(4 + q.length + 1); out.write(q); out.writeByte(0)
      out.flush()
      val ms = readUntilReady()
      val row = ms.find(_._1 == 'D').get._2
      val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(row))
      assert(d.readShort() == 1)
      val len = d.readInt(); val v = new Array[Byte](len); d.readFully(v)
      assert(new String(v, "UTF-8") == "42")
    } finally { raw.close(); pg.stop() }

    val rest = new graft.http.RestServer(engine, tls = Some(ksPath -> "changeit"))
    val rport = rest.start()
    try {
      val url = java.net.URI.create(
        s"https://127.0.0.1:$rport/exec?query=SELECT%2042%20AS%20x").toURL
      val conn = url.openConnection().asInstanceOf[javax.net.ssl.HttpsURLConnection]
      conn.setSSLSocketFactory(trustAll.getSocketFactory)
      conn.setHostnameVerifier((_, _) => true)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(conn.getResponseCode == 200 && body.contains("\"dataset\":[[42]]"), body)
    } finally rest.stop()
  }

  test("PGWire: binary result formats — int8/float8/timestamp/bool/date via Bind result-format=1") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      c.msg('P') { b =>
        c.cstr(b, "")
        c.cstr(b, "SELECT CAST(42 AS BIGINT) AS l, CAST(1.5 AS DOUBLE) AS d, " +
          "TIMESTAMP '2024-01-01 00:00:00' AS ts, true AS b, DATE '2024-01-02' AS dt")
        b.writeShort(0)
      }
      c.msg('B') { b =>
        c.cstr(b, ""); c.cstr(b, "")
        b.writeShort(0) // no params
        b.writeShort(0)
        b.writeShort(1); b.writeShort(1) // ONE result-format code: all binary
      }
      c.msg('D') { b => b.writeByte('P'); c.cstr(b, "") }
      c.msg('E') { b => c.cstr(b, ""); b.writeInt(0) }
      c.msg('S') { _ => }
      c.out.flush()
      val ms = c.readUntilReady()
      assert(ms.map(_._1) == Seq('1', '2', 'T', 'D', 'C'))
      // RowDescription reports format=1 per column (last int16 of each field)
      val t = ms.find(_._1 == 'T').get._2
      assert(t.takeRight(2).toSeq == Seq(0, 1).map(_.toByte))
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(ms.find(_._1 == 'D').get._2))
      assert(d.readShort() == 5)
      assert(d.readInt() == 8 && d.readLong() == 42L)                // int8
      assert(d.readInt() == 8 && d.readDouble() == 1.5)              // float8
      val pgEpochMicros = 946684800000000L
      val expTs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L - pgEpochMicros
      assert(d.readInt() == 8 && d.readLong() == expTs)              // timestamp µs/2000
      assert(d.readInt() == 1 && d.readByte() == 1)                  // bool
      val expDays = java.time.LocalDate.parse("2024-01-02").toEpochDay - 10957
      assert(d.readInt() == 4 && d.readInt() == expDays)             // date days/2000
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: binary parameter formats — int8/float8/timestamp/text mixed per-param") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      c.msg('P') { b =>
        c.cstr(b, "")
        c.cstr(b, "SELECT $1 + 1 AS x, $2 * 2.0 AS d, $3 AS ts, upper($4) AS u")
        b.writeShort(4); b.writeInt(20); b.writeInt(701); b.writeInt(1114); b.writeInt(25)
      }
      c.msg('B') { b =>
        c.cstr(b, ""); c.cstr(b, "")
        b.writeShort(4) // per-parameter formats: binary, binary, binary, text
        b.writeShort(1); b.writeShort(1); b.writeShort(1); b.writeShort(0)
        b.writeShort(4)
        b.writeInt(8); b.writeLong(41L)                           // int8
        b.writeInt(8); b.writeDouble(2.25)                        // float8
        val micros = java.sql.Timestamp.valueOf("2024-01-01 00:00:00.123456").getTime * 1000L +
          456L - 946684800000000L
        b.writeInt(8); b.writeLong(micros)                        // timestamp
        b.writeInt(2); b.write("ab".getBytes)                     // text
        b.writeShort(0) // result formats: text
      }
      c.msg('E') { b => c.cstr(b, ""); b.writeInt(0) }
      c.msg('S') { _ => }
      c.out.flush()
      val ms = c.readUntilReady()
      val row = c.decodeText(ms.find(_._1 == 'D').get._2)
      assert(row == Seq("42", "4.5", "2024-01-01 00:00:00.123456", "AB"))
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: portal streams a multi-partition result across Executes (toLocalIterator)") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      // range() plans one partition per core — far more than one partition
      c.msg('P') { b => c.cstr(b, ""); c.cstr(b, "SELECT id FROM range(0, 10000) ORDER BY id"); b.writeShort(0) }
      c.msg('B') { b => c.cstr(b, "big"); c.cstr(b, ""); b.writeShort(0); b.writeShort(0); b.writeShort(0) }
      c.msg('E') { b => c.cstr(b, "big"); b.writeInt(6000) }
      c.msg('H') { _ => }
      c.out.flush()
      assert(c.readMsg()._1 == '1')
      assert(c.readMsg()._1 == '2')
      var got = 0
      var next = c.readMsg()
      while (next._1 == 'D') { got += 1; next = c.readMsg() }
      assert(got == 6000 && next._1 == 's') // PortalSuspended mid-stream
      // resume to exhaustion on the SAME iterator
      c.msg('E') { b => c.cstr(b, "big"); b.writeInt(0) }
      c.msg('S') { _ => }
      c.out.flush()
      val rest = c.readUntilReady()
      assert(rest.count(_._1 == 'D') == 4000)
      val tag = new String(rest.last._2, 0, rest.last._2.length - 1, "UTF-8")
      assert(rest.last._1 == 'C' && tag == "SELECT 4000")
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: CancelRequest with BackendKeyData interrupts the running query") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      val (pid, secret) = c.startup()
      // a query that cannot finish in test time without the cancel;
      // Range codegen polls killTaskIfInterrupted, so the cancelled
      // tasks actually stop burning CPU (a cross join would zombie on)
      c.sendQuery("SELECT count(*) AS n FROM range(0, 2000000000000)")
      Thread.sleep(1500) // let the stages start
      val killer = new java.net.Socket("127.0.0.1", port)
      try {
        val ko = new java.io.DataOutputStream(killer.getOutputStream)
        ko.writeInt(16); ko.writeInt(80877102); ko.writeInt(pid); ko.writeInt(secret)
        ko.flush()
      } finally killer.close()
      val ms = c.readUntilReady() // ErrorResponse then ReadyForQuery
      val err = ms.find(_._1 == 'E')
      assert(err.isDefined)
      assert(new String(err.get._2, "UTF-8").contains("57014"))
      // the session survives the cancel
      c.sendQuery("SELECT 7 AS x")
      val after = c.readUntilReady()
      assert(c.decodeText(after.find(_._1 == 'D').get._2) == Seq("7"))
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: cleartext and md5 password auth") {
    val engine = Engine(spark, sfDir)
    def startupWithPassword(port: Int, user: String, password: String,
                            md5Salt: Option[Array[Byte]] => Option[Array[Byte]] = identity)
    : (PgClient, Seq[(Char, Array[Byte])]) = {
      val c = new PgClient(port)
      val params = s"user\u0000$user\u0000\u0000".getBytes("UTF-8")
      c.out.writeInt(8 + params.length); c.out.writeInt(196608); c.out.write(params)
      c.out.flush()
      val (t, p) = c.readMsg() // AuthenticationRequest
      assert(t == 'R')
      val code = java.nio.ByteBuffer.wrap(p).getInt
      val cred =
        if (code == 5) { // md5: "md5" + md5hex(md5hex(pw+user) ++ salt)
          val salt = p.drop(4)
          def hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
            .digest(b).map(x => f"${x & 0xff}%02x").mkString
          "md5" + hex(hex((password + user).getBytes("UTF-8")).getBytes("UTF-8") ++ salt)
        } else password // cleartext (code 3)
      val cb = cred.getBytes("UTF-8")
      c.out.writeByte('p'); c.out.writeInt(4 + cb.length + 1); c.out.write(cb); c.out.writeByte(0)
      c.out.flush()
      val first = c.readMsg()
      if (first._1 == 'E') (c, Seq(first))
      else {
        var ms = Seq(first)
        while (ms.last._1 != 'Z') ms = ms :+ c.readMsg()
        (c, ms)
      }
    }
    // cleartext: good + bad
    val srv1 = new graft.http.PgWireServer(engine, auth = Some("graft" -> "sekret"))
    val p1 = srv1.start()
    try {
      val (c1, ok) = startupWithPassword(p1, "graft", "sekret")
      assert(ok.exists(_._1 == 'R') && ok.exists(_._1 == 'K'))
      c1.sendQuery("SELECT 5 AS v")
      assert(c1.decodeText(c1.readUntilReady().find(_._1 == 'D').get._2) == Seq("5"))
      c1.close()
      val (c2, bad) = startupWithPassword(p1, "graft", "wrong")
      assert(bad.head._1 == 'E' && new String(bad.head._2, "UTF-8").contains("28P01"))
      c2.close()
    } finally srv1.stop()
    // md5
    val srv2 = new graft.http.PgWireServer(engine, auth = Some("graft" -> "sekret"), authMd5 = true)
    val p2 = srv2.start()
    try {
      val (c3, ok) = startupWithPassword(p2, "graft", "sekret")
      assert(ok.exists(_._1 == 'K'))
      c3.close()
      val (c4, bad) = startupWithPassword(p2, "graft", "wrong")
      assert(bad.head._1 == 'E')
      c4.close()
    } finally srv2.stop()
  }

  test("PGWire: COPY FROM STDIN loads CSV, then appends to the existing table") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      c.sendQuery("COPY cp_t FROM STDIN (FORMAT csv, HEADER true)")
      val (g, _) = c.readMsg()
      assert(g == 'G') // CopyInResponse
      val data = "sym,price\nA,1.5\nB,2.5\n".getBytes("UTF-8")
      c.out.writeByte('d'); c.out.writeInt(4 + data.length); c.out.write(data)
      c.out.writeByte('c'); c.out.writeInt(4)
      c.out.flush()
      val done = c.readUntilReady()
      val tag = done.find(_._1 == 'C').get._2
      assert(new String(tag, 0, tag.length - 1, "UTF-8") == "COPY 2")

      // second COPY appends (positional cast against the existing schema)
      c.sendQuery("COPY cp_t FROM STDIN (FORMAT csv, HEADER true)")
      assert(c.readMsg()._1 == 'G')
      val more = "sym,price\nC,3.5\n".getBytes("UTF-8")
      c.out.writeByte('d'); c.out.writeInt(4 + more.length); c.out.write(more)
      c.out.writeByte('c'); c.out.writeInt(4)
      c.out.flush()
      val done2 = c.readUntilReady()
      val tag2 = done2.find(_._1 == 'C').get._2
      assert(new String(tag2, 0, tag2.length - 1, "UTF-8") == "COPY 1")

      c.sendQuery("SELECT sym, price FROM cp_t ORDER BY sym")
      val rows = c.readUntilReady().filter(_._1 == 'D').map(m => c.decodeText(m._2))
      assert(rows == Seq(Seq("A", "1.5"), Seq("B", "2.5"), Seq("C", "3.5")))

      // CopyFail: server reports the error and the session survives
      c.sendQuery("COPY cp_t2 FROM STDIN (FORMAT csv)")
      assert(c.readMsg()._1 == 'G')
      val reason = "client bailed\u0000".getBytes("UTF-8")
      c.out.writeByte('f'); c.out.writeInt(4 + reason.length); c.out.write(reason)
      c.out.flush()
      assert(c.readUntilReady().exists(_._1 == 'E'))
      c.sendQuery("SELECT 1 AS ok")
      assert(c.readUntilReady().exists(_._1 == 'D'))
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: COPY HEADER off/0 are false — first row is data, not a header") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      def copyRows(sql: String, payload: String): String = {
        c.sendQuery(sql)
        assert(c.readMsg()._1 == 'G')
        val data = payload.getBytes("UTF-8")
        c.out.writeByte('d'); c.out.writeInt(4 + data.length); c.out.write(data)
        c.out.writeByte('c'); c.out.writeInt(4)
        c.out.flush()
        val done = c.readUntilReady()
        val tag = done.find(_._1 == 'C').get._2
        new String(tag, 0, tag.length - 1, "UTF-8")
      }
      // both PG boolean spellings of false keep every row
      assert(copyRows("COPY cp_hoff FROM STDIN (FORMAT csv, HEADER off)", "X,1.5\nY,2.5\n") == "COPY 2")
      assert(copyRows("COPY cp_hzero FROM STDIN (FORMAT csv, HEADER 0)", "X,1.5\nY,2.5\n") == "COPY 2")
      // and bare HEADER / HEADER on still consume the first row
      assert(copyRows("COPY cp_hon FROM STDIN (FORMAT csv, HEADER on)", "sym,price\nZ,3.5\n") == "COPY 1")
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: all-binary result format demotes non-encodable columns to text") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      c.msg('P') { b =>
        c.cstr(b, "")
        // arrays have no binOf encoding; int8 does (numeric grew a real
        // binary encoding — see the numeric round-trip test)
        c.cstr(b, "SELECT array(1, 2) AS a, CAST(7 AS BIGINT) AS l")
        b.writeShort(0)
      }
      c.msg('B') { b =>
        c.cstr(b, ""); c.cstr(b, "")
        b.writeShort(0); b.writeShort(0)
        b.writeShort(1); b.writeShort(1) // ONE result-format code: all binary
      }
      c.msg('D') { b => b.writeByte('P'); c.cstr(b, "") }
      c.msg('E') { b => c.cstr(b, ""); b.writeInt(0) }
      c.msg('S') { _ => }
      c.out.flush()
      val ms = c.readUntilReady()
      // RowDescription: array advertises format 0, bigint format 1
      val t = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(ms.find(_._1 == 'T').get._2))
      assert(t.readShort() == 2)
      def fieldFmt(): Int = {
        while (t.readByte() != 0) {} // name
        t.readInt(); t.readShort(); t.readInt(); t.readShort(); t.readInt()
        t.readShort().toInt
      }
      assert(fieldFmt() == 0 && fieldFmt() == 1)
      // DataRow: text bytes for the array, 8-byte binary for the int8
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(ms.find(_._1 == 'D').get._2))
      assert(d.readShort() == 2)
      val dl = d.readInt(); val db = new Array[Byte](dl); d.readFully(db)
      assert(dl > 0)
      assert(d.readInt() == 8 && d.readLong() == 7L)
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: numeric binary encoding round-trips exact BigDecimals") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      c.msg('P') { b =>
        c.cstr(b, "")
        c.cstr(b, "SELECT CAST('12345.6789' AS DECIMAL(18,4)) AS a, " +
          "CAST('-0.001' AS DECIMAL(10,3)) AS b, " +
          "CAST(0 AS DECIMAL(8,2)) AS z, " +
          "CAST('98765432109876543210.12345' AS DECIMAL(38,5)) AS big")
        b.writeShort(0)
      }
      c.msg('B') { b =>
        c.cstr(b, ""); c.cstr(b, "")
        b.writeShort(0); b.writeShort(0)
        b.writeShort(1); b.writeShort(1) // all binary
      }
      c.msg('D') { b => b.writeByte('P'); c.cstr(b, "") }
      c.msg('E') { b => c.cstr(b, ""); b.writeInt(0) }
      c.msg('S') { _ => }
      c.out.flush()
      val ms = c.readUntilReady()
      // numeric now advertises binary in RowDescription
      val t = ms.find(_._1 == 'T').get._2
      assert(t.takeRight(2).toSeq == Seq(0, 1).map(_.toByte))
      // decode the PG numeric wire format back into BigDecimals
      def decodeNumeric(d: java.io.DataInputStream): java.math.BigDecimal = {
        val len = d.readInt(); assert(len >= 8)
        val nd = d.readShort(); val weight = d.readShort()
        val sign = d.readShort() & 0xFFFF; val dscale = d.readShort()
        var acc = java.math.BigDecimal.ZERO
        var i = 0
        while (i < nd) {
          val dig = java.math.BigDecimal.valueOf(d.readShort().toLong)
          acc = acc.add(dig.movePointRight(4 * (weight - i)))
          i += 1
        }
        if (sign == 0x4000) acc = acc.negate()
        acc.setScale(dscale)
      }
      val d = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(ms.find(_._1 == 'D').get._2))
      assert(d.readShort() == 4)
      assert(decodeNumeric(d) == new java.math.BigDecimal("12345.6789"))
      assert(decodeNumeric(d) == new java.math.BigDecimal("-0.001"))
      assert(decodeNumeric(d) == new java.math.BigDecimal("0.00"))
      assert(decodeNumeric(d) == new java.math.BigDecimal("98765432109876543210.12345"))
    } finally { c.close(); srv.stop() }
  }

  test("PGWire: an error merely mentioning 'cancelled' is not SQLSTATE 57014") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.PgWireServer(engine)
    val port = srv.start()
    val c = new PgClient(port)
    try {
      c.startup()
      // analysis error whose message contains the substring "cancel"
      c.sendQuery("SELECT * FROM orders_cancelled_view")
      val ms = c.readUntilReady()
      val err = ms.find(_._1 == 'E')
      assert(err.isDefined)
      val body = new String(err.get._2, "UTF-8")
      assert(body.toLowerCase.contains("cancelled"))
      assert(!body.contains("57014") && body.contains("42601"))
    } finally { c.close(); srv.stop() }
  }

  test("REST /imp imports CSV and /exp exports it back") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.RestServer(engine)
    val port = srv.start()
    try {
      val conn = new java.net.URI(s"http://127.0.0.1:$port/imp?name=imp_t&fmt=json").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("sym,price\nA,1.5\nB,2.5\n".getBytes)
      val resp = new String(conn.getInputStream.readAllBytes())
      assert(resp.contains("\"rowsImported\":2"))
      assert(resp.contains("\"rowsRejected\":0"))
      val q = java.net.URLEncoder.encode("SELECT * FROM imp_t ORDER BY sym", "UTF-8")
      val csv = new String(
        new java.net.URI(s"http://127.0.0.1:$port/exp?query=$q").toURL.openStream().readAllBytes())
      assert(csv.startsWith("sym,price"))
      assert(csv.contains("A,1.5") && csv.contains("B,2.5"))
    } finally srv.stop()
  }

  test("REST /imp multipart upload, text-table response, append/overwrite, day partitioning") {
    val engine = Engine(spark, sfDir)
    val ilpDir = Files.createTempDirectory("graft_imp_part").toString
    val srv = new graft.http.RestServer(engine, ilpDir = ilpDir)
    val port = srv.start()
    try {
      def impMultipart(params: String, csv: String): String = {
        val boundary = "----graftBoundary42"
        val conn = new java.net.URI(s"http://127.0.0.1:$port/imp$params").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", s"multipart/form-data; boundary=$boundary")
        val body = s"--$boundary\r\n" +
          "Content-Disposition: form-data; name=\"data\"; filename=\"trades.csv\"\r\n" +
          "Content-Type: text/csv\r\n\r\n" + csv + s"\r\n--$boundary--\r\n"
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        new String(conn.getInputStream.readAllBytes(), "UTF-8")
      }
      // name from the filename; reference-style padded text table response
      val t1 = impMultipart("?timestamp=ts&partitionBy=DAY",
        "sym,price,ts\nA,1.5,2024-01-01 10:00:00.000000\nB,2.5,2024-01-02 11:00:00.000000\n")
      assert(t1.contains("Location:") && t1.contains("trades"))
      assert(t1.contains("Rows imported") && t1.contains("2"))
      assert(t1.contains("Partition by") && t1.contains("DAY"))
      // day-partitioned parquet landed under ilpDir
      val dirs = new java.io.File(s"$ilpDir/trades").listFiles()
      assert(dirs != null && dirs.exists(_.getName.startsWith("__day=2024-01-01")))
      // append (default when table exists)
      impMultipart("?name=trades&timestamp=ts&partitionBy=DAY",
        "sym,price,ts\nC,3.5,2024-01-03 12:00:00.000000\n")
      assert(spark.sql("SELECT count(*) FROM trades").head().getLong(0) == 3L)
      // overwrite replaces
      impMultipart("?name=trades&timestamp=ts&partitionBy=DAY&overwrite=true",
        "sym,price,ts\nD,4.5,2024-01-04 12:00:00.000000\n")
      assert(spark.sql("SELECT count(*) FROM trades").head().getLong(0) == 1L)
    } finally srv.stop()
  }

  test("REST /status and /metrics monitoring surface") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.RestServer(engine)
    val port = srv.start()
    try {
      def get(path: String): String = new String(
        new java.net.URI(s"http://127.0.0.1:$port$path").toURL.openStream().readAllBytes(), "UTF-8")
      assert(get("/status") == "Status: Healthy")
      val q = java.net.URLEncoder.encode("SELECT 1 AS one", "UTF-8")
      get(s"/exec?query=$q")
      val m = get("/metrics")
      assert(m.contains("questdb_json_queries_total 1"))
      assert(m.contains("# TYPE questdb_imported_rows_total counter"))
    } finally srv.stop()
  }

  test("REST /chk table probe, /ping ILP handshake, /settings bootstrap JSON") {
    val engine = Engine(spark, sfDir)
    val srv = new graft.http.RestServer(engine)
    val port = srv.start()
    try {
      def get(path: String): String = new String(
        new java.net.URI(s"http://127.0.0.1:$port$path").toURL.openStream().readAllBytes(), "UTF-8")
      Tables.registerAll(spark, sfDir)
      assert(get("/chk?j=events") == "Exists")
      assert(get("/chk?j=no_such_tbl") == "Does not exist")
      assert(get("/chk?j=events&f=json") == """{"status":"Exists"}""")
      assert(get("/chk") == "table name missing")
      val conn = new java.net.URI(s"http://127.0.0.1:$port/ping").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 204)
      assert(conn.getHeaderField("X-Influxdb-Version") != null)
      val settings = get("/settings")
      assert(settings.contains("\"release.type\":\"OSS\"") && settings.contains("\"preferences\""))
    } finally srv.stop()
  }
}
