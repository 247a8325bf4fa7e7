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
  * Out of scope (documented): binary result/parameter formats, the
  * COPY sub-protocol, cancellation, TLS.
  */
class PgWireServer(engine: graft.Engine, port: Int = 0) {
  private val server = new ServerSocket(port)
  @volatile private var running = false

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
    * the schema without collecting; first Execute collects) and the row
    * iterator persists across Executes for maxRows/PortalSuspended.
    */
  private final class Portal(val stmt: Prepared, val args: Seq[Any]) {
    private var dfOpt: Option[org.apache.spark.sql.DataFrame] = None
    private var rowsOpt: Option[Iterator[org.apache.spark.sql.Row]] = None
    private def df = dfOpt.getOrElse {
      val d = if (args.isEmpty) engine.sql(stmt.sql) else engine.sql(stmt.sql, args: _*)
      dfOpt = Some(d); d
    }
    def schema: StructType = df.schema
    def rows: Iterator[org.apache.spark.sql.Row] = rowsOpt.getOrElse {
      val it = df.collect().iterator
      rowsOpt = Some(it); it
    }
  }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    val prepared = scala.collection.mutable.Map.empty[String, Prepared]
    val portals = scala.collection.mutable.Map.empty[String, Portal]
    // extended-protocol error discipline: after a failure, discard
    // everything until Sync
    var skipToSync = false
    try {
      if (!startup(in, out)) return
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
            runSimpleQuery(sql, out)
            readyForQuery(out)
          case 'P' | 'B' | 'D' | 'E' | 'C' =>
            try extendedMessage(kind, new Reader(payload), out, prepared, portals)
            catch {
              case e: Exception =>
                errorResponse(out, "42601", Option(e.getMessage).getOrElse(e.toString))
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
    finally sock.close()
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
          if (fmt != 0) throw new IllegalArgumentException("binary parameters not supported")
          r.bytes() match {
            case null => null
            case b => paramValue(stmt.paramOids.lift(i).getOrElse(0), new String(b, UTF_8))
          }
        }
        portals(portal) = new Portal(stmt, args)
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
            rowDescription(out, p.schema)
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
          dataRow(out, schema, it.next()); sent += 1
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
  private def startup(in: DataInputStream, out: DataOutputStream): Boolean = {
    var len = in.readInt()
    var code = in.readInt()
    // SSLRequest (80877103) / GSSENCRequest (80877104): refuse, client
    // retries in cleartext on the same connection
    while (code == 80877103 || code == 80877104) {
      out.writeByte('N'); out.flush()
      len = in.readInt(); code = in.readInt()
    }
    if (code == 80877102) { // CancelRequest: nothing to cancel, drop
      return false
    }
    // StartupMessage: protocol 3.0, then NUL-separated key/value params
    val rest = new Array[Byte](len - 8)
    in.readFully(rest)
    // AuthenticationOk (trust)
    msg(out, 'R') { b => b.writeInt(0) }
    Seq("server_version" -> "15.0 (graft)", "client_encoding" -> "UTF8",
      "DateStyle" -> "ISO, MDY", "integer_datetimes" -> "on",
      "standard_conforming_strings" -> "on").foreach { case (k, v) =>
      msg(out, 'S') { b => cstr(b, k); cstr(b, v) }
    }
    msg(out, 'K') { b => b.writeInt(0); b.writeInt(0) } // BackendKeyData
    readyForQuery(out)
    out.flush()
    true
  }

  // ---- query execution ----------------------------------------------

  private def runSimpleQuery(sql: String, out: DataOutputStream): Unit = {
    val statements = splitStatements(sql)
    if (statements.isEmpty) { msg(out, 'I') { _ => } ; return } // EmptyQueryResponse
    statements.foreach { stmt =>
      try {
        val df = engine.sql(stmt)
        val schema = df.schema
        val rows = df.collect()
        rowDescription(out, schema)
        rows.foreach(dataRow(out, schema, _))
        msg(out, 'C') { b => cstr(b, s"SELECT ${rows.length}") }
      } catch {
        case e: Exception =>
          errorResponse(out, "42601", Option(e.getMessage).getOrElse(e.toString))
      }
    }
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
                      r: org.apache.spark.sql.Row): Unit =
    msg(out, 'D') { b =>
      b.writeShort(schema.length)
      (0 until schema.length).foreach { i =>
        if (r.isNullAt(i)) b.writeInt(-1)
        else {
          val bytes = textOf(r.get(i), schema(i).dataType).getBytes(UTF_8)
          b.writeInt(bytes.length); b.write(bytes)
        }
      }
    }

  private def rowDescription(out: DataOutputStream, schema: StructType): Unit =
    msg(out, 'T') { b =>
      b.writeShort(schema.length)
      schema.foreach { f =>
        cstr(b, f.name)
        b.writeInt(0)            // table OID
        b.writeShort(0)          // column attribute number
        b.writeInt(pgOid(f.dataType))
        b.writeShort(pgLen(f.dataType))
        b.writeInt(-1)           // type modifier
        b.writeShort(0)          // text format
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
