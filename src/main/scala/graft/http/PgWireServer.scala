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
  * Out of scope (documented): the extended protocol (Parse/Bind/
  * Execute), COPY sub-protocol, cancellation, TLS.
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

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
    try {
      if (!startup(in, out)) return
      var open = true
      while (open) {
        val tpe = try in.readByte() catch { case _: EOFException => 'X'.toByte }
        val len = if (tpe == 'X'.toByte && in.available() == 0) 4 else in.readInt()
        val payload = new Array[Byte](len - 4)
        in.readFully(payload)
        tpe.toChar match {
          case 'Q' =>
            val sql = new String(payload, 0, payload.length - 1, UTF_8) // NUL-terminated
            runSimpleQuery(sql, out)
            readyForQuery(out)
          case 'X' => open = false
          case _ => // Parse/Bind/etc: report cleanly, stay alive
            errorResponse(out, "0A000", s"unsupported message type '${tpe.toChar}'")
            readyForQuery(out)
        }
        out.flush()
      }
    } catch { case _: Exception => /* client went away */ }
    finally sock.close()
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
        rows.foreach { r =>
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
        }
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
