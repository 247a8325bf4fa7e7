package graft.http

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types._

/** PostgreSQL wire-protocol (v3) server — the simple-query subset every
  * psql / JDBC / psycopg client needs for plain `SELECT`s, which is the
  * reference's primary client entry point
  * (`cutlass/pgwire/PGConnectionContext.java:98` — behavior only; this
  * is a clean-room implementation of the published protocol:
  * https://www.postgresql.org/docs/current/protocol.html).
  *
  * Supported: SSLRequest (refused with 'N', clients fall back to
  * cleartext), GSSENCRequest (refused), StartupMessage with trust auth,
  * `Q` simple query (results in text format), `X` terminate, multiple
  * `;`-separated statements per `Q`, the empty query, and error
  * recovery (ErrorResponse + ReadyForQuery so the session survives bad
  * SQL). Queries run through [[graft.Engine.sql]], so the whole dialect
  * (SAMPLE BY, LATEST ON, ASOF JOIN, ...) rides the wire unchanged.
  *
  * Also supported: the extended-query protocol JDBC/psycopg drive by
  * default — Parse ('P') with `$n` parameter placeholders, Bind ('B')
  * with text-format parameters (typed by the declared OID), Describe
  * ('D') for statements and portals, Execute ('E') with a row limit and
  * PortalSuspended resume, Close ('C'), Flush ('H'), Sync ('S') — and
  * the protocol's error discipline (after an error, messages are
  * discarded until Sync).
  *
  * Also: binary parameter AND result formats (Bind format=1 —
  * int2/int4/int8, float4/float8, bool, date, timestamp as the
  * int8-microseconds integer_datetimes encoding, bytea raw; JDBC
  * `binaryTransfer`), CancelRequest keyed on the BackendKeyData issued
  * at startup (cancels the connection's Spark job group), and
  * `COPY ... FROM STDIN` (text/CSV CopyData stream into a new or
  * existing table — the psql `\copy` bulk-load path, reference
  * `CopyImportFactory`).
  *
  * Results stream to the socket via `toLocalIterator` — one partition
  * resident on the driver at a time — so a full-table SELECT over the
  * wire never materializes on the driver.
  *
  * Authentication: trust by default; pass `auth = Some(user -> password)`
  * for cleartext-password auth (`authMd5 = true` upgrades the exchange
  * to the salted MD5 scheme — what the reference ships, psql/JDBC both
  * speak it).
  *
  * TLS: pass `tls = Some(pkcs12Path -> password)` and the protocol's
  * SSLRequest upgrade is honored — server answers 'S' and the socket
  * wraps into a server-mode SSLSocket before the StartupMessage
  * (`sslmode=require` clients). Without `tls` the request is refused
  * ('N') and the client continues in cleartext on the same connection,
  * as before.
  */
class PgWireServer(engine: graft.Engine, port: Int = 0,
                   auth: Option[(String, String)] = None,
                   authMd5: Boolean = false,
                   tls: Option[(String, String)] = None) {
  private lazy val tlsContext = tls.map { case (p, pw) => Tls.context(p, pw) }
  private val server = new ServerSocket(port)
  @volatile private var running = false

  // CancelRequest routing: pid -> (secret, spark job group). Entries
  // live for the connection's lifetime.
  private val pidSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val sessions = new java.util.concurrent.ConcurrentHashMap[Int, (Int, String)]()
  // job groups with an in-flight CancelRequest; consumed when the
  // cancellation surfaces as a query error
  private val cancelRequested = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** SQLSTATE for a failed query: 57014 (query_canceled) only when this
    * connection's job group had a CancelRequest AND the failure chain is
    * Spark's job-cancellation exception — never by sniffing message text
    * (an analysis error mentioning a column named "cancelled" must not
    * be reported as a cancel).
    */
  private def errState(e: Throwable, group: String, dflt: String): String = {
    @annotation.tailrec
    def sparkChained(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[org.apache.spark.SparkException] || sparkChained(t.getCause))
    if (cancelRequested.remove(group) && sparkChained(e)) "57014" else dflt
  }

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => /* socket closed on stop() */ }
    }
  })
  acceptor.setDaemon(true)

  def start(): Int = { running = true; acceptor.start(); server.getLocalPort }
  def stop(): Unit = { running = false; server.close() }
  def boundPort: Int = server.getLocalPort

  // ---- connection loop ----------------------------------------------

  /** A named prepared statement: SQL with `$n` markers + declared
    * parameter OIDs (0 = unspecified, value type inferred at Bind).
    */
  private case class Prepared(sql: String, paramOids: Seq[Int])

  /** A bound portal. Execution is lazy (first Describe-portal derives
    * the schema without collecting; first Execute opens the iterator)
    * and the row iterator persists across Executes for
    * maxRows/PortalSuspended. Rows come from `toLocalIterator` — one
    * partition resident at a time, never the whole result.
    */
  private final class Portal(val stmt: Prepared, val args: Seq[Any],
                             val resultFormats: Seq[Int]) {
    private var dfOpt: Option[org.apache.spark.sql.DataFrame] = None
    private var rowsOpt: Option[Iterator[org.apache.spark.sql.Row]] = None
    private def df = dfOpt.getOrElse {
      val d = if (args.isEmpty) engine.sql(stmt.sql) else engine.sql(stmt.sql, args: _*)
      dfOpt = Some(d); d
    }
    def schema: StructType = df.schema
    def rows: Iterator[org.apache.spark.sql.Row] = rowsOpt.getOrElse {
      val it = {
        import scala.jdk.CollectionConverters._
        df.toLocalIterator().asScala
      }
      rowsOpt = Some(it); it
    }
    /** Result format for column i: 0 text, 1 binary (protocol rules —
      * zero codes = all text, one code = all columns, else per-column).
      * A requested binary format is demoted to text for types binOf has
      * no real binary encoding for (e.g. numeric/arrays), so the format
      * code advertised in RowDescription always matches the bytes sent.
      */
    def fmt(i: Int): Int = {
      val requested =
        if (resultFormats.isEmpty) 0
        else if (resultFormats.length == 1) resultFormats.head
        else resultFormats(i)
      if (requested == 1 && !hasBinaryEncoding(schema(i).dataType)) 0 else requested
    }
  }

  private def serve(sock0: Socket): Unit = {
    var sock = sock0
    var in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    var out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    // pre-startup negotiation: SSLRequest (80877103) upgrades the socket
    // when TLS is configured; refused requests ('N') fall through to a
    // cleartext retry on the same connection. GSSENC (80877104) is
    // always refused. The first non-negotiation message's length/code
    // are handed to startup().
    var firstLen = 0
    var firstCode = 0
    try {
      firstLen = in.readInt()
      firstCode = in.readInt()
      while (firstCode == 80877103 || firstCode == 80877104) {
        tlsContext match {
          case Some(ctx) if firstCode == 80877103 =>
            out.writeByte('S'); out.flush()
            val s = ctx.getSocketFactory
              .createSocket(sock, null, sock.getPort, false)
              .asInstanceOf[javax.net.ssl.SSLSocket]
            s.setUseClientMode(false)
            s.startHandshake()
            sock = s
            in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
            out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
          case _ =>
            out.writeByte('N'); out.flush()
        }
        firstLen = in.readInt(); firstCode = in.readInt()
      }
    } catch {
      case _: Exception => sock.close(); return // scan/handshake failure
    }
    val prepared = scala.collection.mutable.Map.empty[String, Prepared]
    val portals = scala.collection.mutable.Map.empty[String, Portal]
    // extended-protocol error discipline: after a failure, discard
    // everything until Sync
    var skipToSync = false
    val pid = pidSeq.incrementAndGet()
    val secret = java.util.concurrent.ThreadLocalRandom.current().nextInt()
    val group = s"pgwire-$pid"
    sessions.put(pid, (secret, group))
    // all jobs this connection submits carry its group, so CancelRequest
    // can interrupt the running stages
    engine.spark.sparkContext.setJobGroup(group, s"pgwire connection $pid",
      interruptOnCancel = true)
    try {
      if (!startup(in, out, pid, secret, firstLen, firstCode)) return
      var open = true
      while (open) {
        val tpe = try in.readByte() catch { case _: EOFException => 'X'.toByte }
        val len = if (tpe == 'X'.toByte && in.available() == 0) 4 else in.readInt()
        val payload = new Array[Byte](len - 4)
        in.readFully(payload)
        val kind = tpe.toChar
        if (skipToSync && kind != 'S' && kind != 'X') {
          // discard
        } else kind match {
          case 'Q' =>
            val sql = new String(payload, 0, payload.length - 1, UTF_8) // NUL-terminated
            runSimpleQuery(sql, in, out, group)
            readyForQuery(out)
          case 'P' | 'B' | 'D' | 'E' | 'C' =>
            try extendedMessage(kind, new Reader(payload), out, prepared, portals)
            catch {
              case e: Exception =>
                errorResponse(out, errState(e, group, "42601"),
                  Option(e.getMessage).getOrElse(e.toString))
                skipToSync = true
            }
          case 'S' =>
            skipToSync = false
            portals.clear() // Sync closes the implicit transaction's portals
            readyForQuery(out)
          case 'H' => // Flush
          case 'X' => open = false
          case _ =>
            errorResponse(out, "0A000", s"unsupported message type '$kind'")
            readyForQuery(out)
        }
        out.flush()
      }
    } catch { case _: Exception => /* client went away */ }
    finally { sessions.remove(pid); sock.close() }
  }

  private def extendedMessage(kind: Char, r: Reader, out: DataOutputStream,
                              prepared: scala.collection.mutable.Map[String, Prepared],
                              portals: scala.collection.mutable.Map[String, Portal]): Unit =
    kind match {
      case 'P' => // Parse: name, query, declared param OIDs
        val name = r.cstr()
        val sql = r.cstr()
        val oids = Seq.fill(r.int16())(r.int32())
        prepared(name) = Prepared(sql, oids)
        msg(out, '1') { _ => } // ParseComplete
      case 'B' => // Bind: portal, statement, formats, params
        val portal = r.cstr()
        val stmtName = r.cstr()
        val stmt = prepared.getOrElse(stmtName,
          throw new IllegalArgumentException(s"unknown prepared statement '$stmtName'"))
        val paramFmts = Seq.fill(r.int16())(r.int16())
        val nParams = r.int16()
        val args = (0 until nParams).map { i =>
          val fmt = if (paramFmts.isEmpty) 0
            else if (paramFmts.length == 1) paramFmts.head else paramFmts(i)
          r.bytes() match {
            case null => null
            case b if fmt == 1 => binParamValue(stmt.paramOids.lift(i).getOrElse(0), b)
            case b => paramValue(stmt.paramOids.lift(i).getOrElse(0), new String(b, UTF_8))
          }
        }
        val resultFmts = Seq.fill(r.int16())(r.int16())
        portals(portal) = new Portal(stmt, args, resultFmts)
        msg(out, '2') { _ => } // BindComplete
      case 'D' => // Describe statement ('S') or portal ('P')
        val target = r.byte().toChar
        val name = r.cstr()
        target match {
          case 'S' =>
            val stmt = prepared.getOrElse(name,
              throw new IllegalArgumentException(s"unknown prepared statement '$name'"))
            msg(out, 't') { b => // ParameterDescription: echo declared OIDs
              b.writeShort(stmt.paramOids.length)
              stmt.paramOids.foreach(b.writeInt)
            }
            // schema without executing: bind nulls for any parameters
            try {
              val nArgs = maxParamIndex(stmt.sql)
              val d = if (nArgs == 0) engine.sql(stmt.sql)
                else engine.sql(stmt.sql, Seq.fill[Any](nArgs)(null): _*)
              rowDescription(out, d.schema)
            } catch { case _: Exception => msg(out, 'n') { _ => } } // NoData
          case _ =>
            val p = portals.getOrElse(name,
              throw new IllegalArgumentException(s"unknown portal '$name'"))
            rowDescription(out, p.schema, p.fmt)
        }
      case 'E' => // Execute: portal, maxRows (0 = all)
        val name = r.cstr()
        val maxRows = r.int32()
        val p = portals.getOrElse(name,
          throw new IllegalArgumentException(s"unknown portal '$name'"))
        val schema = p.schema
        val it = p.rows
        var sent = 0
        while (it.hasNext && (maxRows == 0 || sent < maxRows)) {
          dataRow(out, schema, it.next(), p.fmt); sent += 1
        }
        if (it.hasNext) msg(out, 's') { _ => } // PortalSuspended
        else msg(out, 'C') { b => cstr(b, s"SELECT $sent") }
      case 'C' => // Close statement or portal
        val target = r.byte().toChar
        val name = r.cstr()
        if (target == 'S') prepared.remove(name) else portals.remove(name)
        msg(out, '3') { _ => } // CloseComplete
    }

  /** Highest `$n` marker in the SQL (for Describe-statement null binds). */
  private def maxParamIndex(sql: String): Int =
    """\$(\d+)""".r.findAllMatchIn(sql).map(_.group(1).toInt).foldLeft(0)(math.max)

  /** Text-format parameter → JVM value, guided by the declared OID
    * (pg_type.dat public numbers); OID 0/unknown infers numerics so
    * `$1 + 1` style expressions type-check.
    */
  private def paramValue(oid: Int, text: String): Any = oid match {
    case 16 => text == "t" || text == "true" || text == "1"
    case 20 | 21 | 23 => text.toLong
    case 700 | 701 => text.toDouble
    case 1700 => new java.math.BigDecimal(text)
    case 1114 | 1184 => java.sql.Timestamp.valueOf(text.replace('T', ' ').stripSuffix("Z"))
    case 25 | 1043 => text
    case _ =>
      if (text.matches("[+-]?\\d+")) text.toLong
      else if (text.matches("[+-]?\\d*\\.\\d+([eE][+-]?\\d+)?")) text.toDouble
      else text
  }

  /** Binary-format parameter → JVM value (the inverse of [[binOf]];
    * JDBC `binaryTransfer` sends these for bound prepared statements).
    */
  private def binParamValue(oid: Int, b: Array[Byte]): Any = {
    val bb = java.nio.ByteBuffer.wrap(b) // big-endian default
    oid match {
      case 16 => b.nonEmpty && b(0) != 0
      case 21 => bb.getShort
      case 23 => bb.getInt
      case 20 => bb.getLong
      case 700 => bb.getFloat
      case 701 => bb.getDouble
      case 1114 | 1184 =>
        val micros = bb.getLong + PgEpochMicros
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case 1082 =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(bb.getInt.toLong + PgEpochDays))
      case 17 => b
      case 25 | 1043 => new String(b, UTF_8)
      case _ => b.length match { // undeclared OID: size-guess the integer widths
        case 2 => bb.getShort
        case 4 => bb.getInt
        case 8 => bb.getLong
        case _ => new String(b, UTF_8)
      }
    }
  }

  /** Cursor over an extended-protocol message payload. */
  private final class Reader(payload: Array[Byte]) {
    private var pos = 0
    def byte(): Byte = { val b = payload(pos); pos += 1; b }
    def int16(): Int = { val v = ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff); pos += 2; v }
    def int32(): Int = {
      val v = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
        ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
      pos += 4; v
    }
    def cstr(): String = {
      val end = payload.indexOf(0.toByte, pos)
      val s = new String(payload, pos, end - pos, UTF_8)
      pos = end + 1; s
    }
    /** Length-prefixed byte string; -1 length → null. */
    def bytes(): Array[Byte] = {
      val n = int32()
      if (n < 0) null
      else { val b = java.util.Arrays.copyOfRange(payload, pos, pos + n); pos += n; b }
    }
  }

  /** Negotiation + startup + trust auth. Returns false if the client
    * never sent a startup message.
    */
  private def startup(in: DataInputStream, out: DataOutputStream,
                      pid: Int, secret: Int, len: Int, code: Int): Boolean = {
    // SSL/GSSENC negotiation already happened in serve(); len/code here
    // are the first real message (StartupMessage or CancelRequest)
    if (code == 80877102) { // CancelRequest: pid + secret, then hang up
      val targetPid = in.readInt()
      val targetSecret = in.readInt()
      sessions.get(targetPid) match {
        case (s, g) if s == targetSecret =>
          cancelRequested.add(g)
          engine.spark.sparkContext.cancelJobGroup(g)
        case _ => // unknown pid or bad secret: ignore, per protocol
      }
      return false
    }
    // StartupMessage: protocol 3.0, then NUL-separated key/value params
    val rest = new Array[Byte](len - 8)
    in.readFully(rest)
    val startupParams = new String(rest, UTF_8).split("\u0000")
      .grouped(2).collect { case Array(k, v) => k -> v }.toMap
    auth match {
      case Some((expectUser, expectPass)) =>
        val user = startupParams.getOrElse("user", "")
        val salt = new Array[Byte](4)
        java.util.concurrent.ThreadLocalRandom.current().nextBytes(salt)
        if (authMd5) msg(out, 'R') { b => b.writeInt(5); b.write(salt) }
        else msg(out, 'R') { b => b.writeInt(3) } // CleartextPassword
        out.flush()
        // PasswordMessage: 'p' + NUL-terminated credential
        val tpe = in.readByte().toChar
        val plen = in.readInt()
        val payload = new Array[Byte](plen - 4)
        in.readFully(payload)
        val given = new String(payload, 0, math.max(0, payload.length - 1), UTF_8)
        def md5hex(b: Array[Byte]): String = java.security.MessageDigest.getInstance("MD5")
          .digest(b).map(x => f"${x & 0xff}%02x").mkString
        // PG scheme: "md5" + md5hex(md5hex(password+user).bytes ++ salt)
        val expected =
          if (authMd5) "md5" + md5hex(
            md5hex((expectPass + expectUser).getBytes(UTF_8)).getBytes(UTF_8) ++ salt)
          else expectPass
        val ok = tpe == 'p' && user == expectUser && given == expected
        if (!ok) {
          errorResponse(out, "28P01", s"password authentication failed for user \"$user\"")
          out.flush()
          return false
        }
      case None => // trust
    }
    // AuthenticationOk
    msg(out, 'R') { b => b.writeInt(0) }
    Seq("server_version" -> "15.0 (graft)", "client_encoding" -> "UTF8",
      "DateStyle" -> "ISO, MDY", "integer_datetimes" -> "on",
      "standard_conforming_strings" -> "on").foreach { case (k, v) =>
      msg(out, 'S') { b => cstr(b, k); cstr(b, v) }
    }
    msg(out, 'K') { b => b.writeInt(pid); b.writeInt(secret) } // BackendKeyData
    readyForQuery(out)
    out.flush()
    true
  }

  // ---- query execution ----------------------------------------------

  private val CopyStdinRe =
    """(?is)^COPY\s+([\w.]+)\s+FROM\s+STDIN\s*(.*)$""".r

  private def runSimpleQuery(sql: String, in: DataInputStream,
                             out: DataOutputStream, group: String): Unit = {
    val statements = splitStatements(sql)
    if (statements.isEmpty) { msg(out, 'I') { _ => } ; return } // EmptyQueryResponse
    statements.foreach {
      case CopyStdinRe(table, opts) =>
        try copyInStdin(table, opts, in, out)
        catch {
          case e: Exception =>
            errorResponse(out, "22P04", Option(e.getMessage).getOrElse(e.toString))
        }
      case stmt =>
        try {
          val df = engine.sql(stmt)
          val schema = df.schema
          rowDescription(out, schema)
          // stream — one partition on the driver at a time, so SELECT *
          // over a huge table doesn't materialize driver-side
          val it = { import scala.jdk.CollectionConverters._; df.toLocalIterator().asScala }
          var n = 0L
          while (it.hasNext) { dataRow(out, schema, it.next(), _ => 0); n += 1 }
          msg(out, 'C') { b => cstr(b, s"SELECT $n") }
        } catch {
          case e: Exception =>
            val m = Option(e.getMessage).getOrElse(e.toString)
            errorResponse(out, errState(e, group, "42601"), m)
        }
    }
  }

  /** COPY <table> FROM STDIN [(FORMAT csv|text, HEADER, DELIMITER 'c')]:
    * reply CopyInResponse, drain CopyData until CopyDone/CopyFail, parse
    * the accumulated text (CSV or pg tab-text with \N nulls) and land it
    * — appended to the table if it exists (positional cast, like
    * INSERT), else registered as a new view.
    */
  private def copyInStdin(table: String, opts: String, in: DataInputStream,
                          out: DataOutputStream): Unit = {
    val o = Option(opts).getOrElse("").toLowerCase
    val isCsv = o.contains("csv")
    // HEADER is a PG boolean: bare HEADER, or any of true/on/1 enable it;
    // false/off/0 disable (all valid spellings, not just "false")
    val header = """header(\s+(\w+))?""".r.findFirstMatchIn(o) match {
      case Some(m) => !Set("false", "off", "0")(Option(m.group(2)).getOrElse("true"))
      case None => false
    }
    val delim = """delimiter\s+'(.)'""".r.findFirstMatchIn(o).map(_.group(1))
      .getOrElse(if (isCsv) "," else "\t")
    val existing = try Some(engine.spark.table(table)) catch { case _: Exception => None }

    // CopyInResponse: overall text format + per-column text formats
    val ncols = existing.map(_.schema.length).getOrElse(0)
    msg(out, 'G') { b =>
      b.writeByte(0); b.writeShort(ncols)
      (0 until ncols).foreach(_ => b.writeShort(0))
    }
    out.flush()

    val buf = new java.io.ByteArrayOutputStream()
    var done = false
    var failed: Option[String] = None
    while (!done) {
      val tpe = in.readByte().toChar
      val len = in.readInt()
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      tpe match {
        case 'd' => buf.write(payload) // CopyData
        case 'c' => done = true        // CopyDone
        case 'f' =>                    // CopyFail
          failed = Some(new String(payload, 0, math.max(0, payload.length - 1), UTF_8))
          done = true
        case _ => // Flush/Sync mid-copy: ignore
      }
    }
    failed.foreach(m => throw new IllegalArgumentException(s"COPY failed: $m"))

    val tmp = java.nio.file.Files.createTempDirectory("graft_copyin")
    java.nio.file.Files.write(tmp.resolve("data.csv"), buf.toByteArray)
    val reader = engine.spark.read
      .option("header", header.toString)
      .option("sep", delim)
      .option("nullValue", if (isCsv) "" else "\\N")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    val n = existing match {
      case Some(target) =>
        // append with positional cast to the target schema (same
        // discipline as INSERT INTO ... VALUES)
        import org.apache.spark.sql.functions.col
        val raw =
          if (header) reader.option("inferSchema", "true").csv(tmp.toString)
          else reader.schema(StructType(target.schema.fields.map(f =>
            StructField(f.name, StringType, nullable = true)))).csv(tmp.toString)
        require(raw.columns.length == target.columns.length,
          s"COPY column count ${raw.columns.length} != table ${target.columns.length}")
        val incoming = raw.toDF(target.columns: _*)
          .select(target.schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
        val rows = incoming.count()
        target.unionByName(incoming).createOrReplaceTempView(table)
        rows
      case None =>
        val df = reader.option("inferSchema", "true").csv(tmp.toString)
        df.createOrReplaceTempView(table)
        df.count()
    }
    graft.Catalog.invalidateMetaViews(engine.spark)
    graft.Tables.forgetRegistration(engine.spark)
    msg(out, 'C') { b => cstr(b, s"COPY $n") }
  }

  private def splitStatements(sql: String): Seq[String] = {
    // split on ';' outside single-quoted literals
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    sql.foreach {
      case '\'' => inQuote = !inQuote; cur.append('\'')
      case ';' if !inQuote => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    parts += cur.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def dataRow(out: DataOutputStream, schema: StructType,
                      r: org.apache.spark.sql.Row, fmt: Int => Int): Unit =
    msg(out, 'D') { b =>
      b.writeShort(schema.length)
      (0 until schema.length).foreach { i =>
        if (r.isNullAt(i)) b.writeInt(-1)
        else {
          val bytes =
            if (fmt(i) == 1) binOf(r.get(i), schema(i).dataType)
            else textOf(r.get(i), schema(i).dataType).getBytes(UTF_8)
          b.writeInt(bytes.length); b.write(bytes)
        }
      }
    }

  private def rowDescription(out: DataOutputStream, schema: StructType,
                             fmt: Int => Int = _ => 0): Unit =
    msg(out, 'T') { b =>
      b.writeShort(schema.length)
      schema.zipWithIndex.foreach { case (f, i) =>
        cstr(b, f.name)
        b.writeInt(0)            // table OID
        b.writeShort(0)          // column attribute number
        b.writeInt(pgOid(f.dataType))
        b.writeShort(pgLen(f.dataType))
        b.writeInt(-1)           // type modifier
        b.writeShort(fmt(i))     // 0 text / 1 binary
      }
    }

  /** Unix micros at the Postgres binary epoch 2000-01-01T00:00:00Z. */
  private val PgEpochMicros = 946684800000000L
  private val PgEpochDays = 10957 // days 1970-01-01 → 2000-01-01

  /** Types with a real binary wire encoding in binOf. Everything else
    * (numeric/1700, arrays, structs) is demoted to text format in
    * Portal.fmt — a client asking for all-binary must never receive
    * text bytes under a binary format code.
    */
  private def hasBinaryEncoding(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | TimestampType |
         TimestampNTZType | BinaryType | StringType => true
    case _: DecimalType => true
    case _ => false
  }

  /** PostgreSQL `numeric` binary wire format (utils/adt/numeric.c
    * NumericVar send/recv; reference cutlass/pgwire PGResponseSink
    * numeric branch): int16 ndigits, int16 weight (base-10000 exponent
    * of the first digit), int16 sign (0x0000/0x4000), int16 dscale,
    * then ndigits base-10000 digits, big-endian.
    */
  private def numericBin(bd: java.math.BigDecimal): Array[Byte] = {
    val sign = if (bd.signum() < 0) 0x4000 else 0x0000
    val dscale = math.max(bd.scale(), 0)
    val abs = bd.abs()
    if (abs.unscaledValue().signum() == 0) {
      val b = java.nio.ByteBuffer.allocate(8)
      b.putShort(0); b.putShort(0); b.putShort(sign.toShort); b.putShort(dscale.toShort)
      return b.array()
    }
    // integer = |value| · 10^(dscale + pad) with the fraction padded to
    // whole base-10000 groups
    val fracPad = (4 - dscale % 4) % 4
    var x = abs.movePointRight(dscale).toBigIntegerExact
      .multiply(java.math.BigInteger.TEN.pow(fracPad))
    val fracGroups = (dscale + fracPad) / 4
    val B10000 = java.math.BigInteger.valueOf(10000)
    var digits = List.empty[Short]
    while (x.signum() != 0) {
      val qr = x.divideAndRemainder(B10000)
      digits ::= qr(1).shortValueExact()
      x = qr(0)
    }
    val weight = digits.length - fracGroups - 1
    // trailing zero groups are implied
    val trimmed = digits.reverse.dropWhile(_ == 0).reverse
    val b = java.nio.ByteBuffer.allocate(8 + 2 * trimmed.length)
    b.putShort(trimmed.length.toShort); b.putShort(weight.toShort)
    b.putShort(sign.toShort); b.putShort(dscale.toShort)
    trimmed.foreach(d => b.putShort(d))
    b.array()
  }

  /** Binary result encodings (protocol `integer_datetimes=on` wire
    * formats). For text/varchar the binary representation IS the text
    * bytes (per the protocol doc); other types must be demoted via
    * hasBinaryEncoding before reaching here with format=1.
    */
  private def binOf(v: Any, dt: DataType): Array[Byte] = {
    def alloc(n: Int) = java.nio.ByteBuffer.allocate(n) // big-endian default
    (v, dt) match {
      case (b: Boolean, _) => Array[Byte](if (b) 1 else 0)
      case (n: Byte, _) => alloc(2).putShort(n.toShort).array()
      case (n: Short, _) => alloc(2).putShort(n).array()
      case (n: Int, _) => alloc(4).putInt(n).array()
      case (n: Long, _) => alloc(8).putLong(n).array()
      case (f: Float, _) => alloc(4).putFloat(f).array()
      case (d: Double, _) => alloc(8).putDouble(d).array()
      case (t: java.sql.Timestamp, _) =>
        val micros = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        alloc(8).putLong(micros - PgEpochMicros).array()
      case (t: java.time.LocalDateTime, _) =>
        val micros = t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
        alloc(8).putLong(micros - PgEpochMicros).array()
      case (d: java.sql.Date, _) =>
        alloc(4).putInt((d.toLocalDate.toEpochDay - PgEpochDays).toInt).array()
      case (d: java.time.LocalDate, _) =>
        alloc(4).putInt((d.toEpochDay - PgEpochDays).toInt).array()
      case (bytes: Array[Byte], BinaryType) => bytes
      case (d: java.math.BigDecimal, _) => numericBin(d)
      case (d: scala.math.BigDecimal, _) => numericBin(d.bigDecimal)
      case (other, dtt) => textOf(other, dtt).getBytes(UTF_8)
    }
  }

  /** Postgres type OIDs (pg_type.dat, public catalog numbers). */
  private def pgOid(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ByteType | ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case _: DecimalType => 1700
    case DateType => 1082
    case TimestampType | TimestampNTZType => 1114
    case BinaryType => 17
    case _ => 25 // text
  }

  private def pgLen(dt: DataType): Int = dt match {
    case BooleanType => 1
    case ByteType | ShortType => 2
    case IntegerType | FloatType | DateType => 4
    case LongType | DoubleType | TimestampType | TimestampNTZType => 8
    case _ => -1
  }

  private def textOf(v: Any, dt: DataType): String = (v, dt) match {
    case (b: Boolean, _) => if (b) "t" else "f"
    case (t: java.sql.Timestamp, _) =>
      t.toLocalDateTime.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case (t: java.time.LocalDateTime, _) =>
      t.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    case (d: java.math.BigDecimal, _) => d.toPlainString
    case (bytes: Array[Byte], BinaryType) =>
      "\\x" + bytes.map(b => f"${b & 0xff}%02x").mkString
    case (s: scala.collection.Seq[_], _) => s.mkString("{", ",", "}")
    case (other, _) => String.valueOf(other)
  }

  // ---- low-level framing --------------------------------------------

  private def msg(out: DataOutputStream, tpe: Char)(body: DataOutputStream => Unit): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(buf)
    body(b); b.flush()
    out.writeByte(tpe)
    out.writeInt(4 + buf.size())
    buf.writeTo(out)
  }

  private def cstr(b: DataOutputStream, s: String): Unit = {
    b.write(s.getBytes(UTF_8)); b.writeByte(0)
  }

  private def readyForQuery(out: DataOutputStream): Unit =
    msg(out, 'Z') { b => b.writeByte('I') }

  private def errorResponse(out: DataOutputStream, sqlState: String, message: String): Unit =
    msg(out, 'E') { b =>
      b.writeByte('S'); cstr(b, "ERROR")
      b.writeByte('C'); cstr(b, sqlState)
      b.writeByte('M'); cstr(b, message)
      b.writeByte(0)
    }
}
