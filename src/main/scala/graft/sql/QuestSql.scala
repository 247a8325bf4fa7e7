package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QuestDB-flavored SQL front end: a pre-rewrite layer that translates
  * the reference's time-series SQL extensions (SURVEY §1.2 "API
  * surface", §7.0) onto Spark SQL / graft ops:
  *
  *  - interval literals: `ts IN '2024'`, `'2024-01'`, `'2024-01-15'`,
  *    `'2024-01-15T10'` → half-open range predicates
  *    (reference `WhereClauseParser.extract` → `IntrinsicModel`)
  *  - `LATEST ON <ts> PARTITION BY <keys>` → ranked-subquery rewrite
  *  - `SAMPLE BY <n><unit> [FILL(...)]` → `GROUP BY window(...)`, FILL
  *    delegating to [[graft.ops.SampleBy]]
  *  - `ASOF/LT/SPLICE JOIN [ON keys]` → [[graft.ops.AsofJoin]]
  *  - `LIMIT -n` (tail) → reversed top-k re-sorted
  *
  * Grammar coverage is the documented subset below — a fast, testable
  * translator rather than a full parser; everything else passes through
  * to Spark SQL untouched (which already covers the reference's ANSI
  * surface: joins, aggs, windows, set ops, CTEs, subqueries).
  */
object QuestSql {

  /** Rewrite + run against tables registered as temp views. */
  def sql(spark: SparkSession, query: String): DataFrame = {
    val q = query.trim.stripSuffix(";")
    asofForm(spark, q)
      .orElse(windowJoinForm(spark, q))
      .orElse(horizonJoinForm(spark, q))
      .orElse(sampleByFillForm(spark, q))
      .getOrElse(spark.sql(rewrite(q)))
  }

  /** Pure string-level rewrites (interval literals, LATEST ON,
    * SAMPLE BY without FILL, negative LIMIT).
    */
  def rewrite(query: String): String = {
    var q = rewriteIntervalLiterals(query.trim.stripSuffix(";"))
    q = rewriteLatestOn(q)
    q = rewriteSampleBy(q)
    q = rewriteNegativeLimit(q)
    q
  }

  // ---- interval literals -------------------------------------------------

  private val IntervalLit =
    """(?i)([\w.]+)\s+IN\s+'(\d{4}(?:-\d{2})?(?:-\d{2})?(?:T\d{2})?)'""".r

  def intervalBounds(lit: String): (String, String) = {
    def ts(t: java.time.LocalDateTime) =
      t.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    val (lo, hi) = lit.length match {
      case 4 => // year
        val y = lit.toInt
        (java.time.LocalDateTime.of(y, 1, 1, 0, 0), java.time.LocalDateTime.of(y + 1, 1, 1, 0, 0))
      case 7 => // month
        val d = java.time.YearMonth.parse(lit)
        (d.atDay(1).atStartOfDay(), d.plusMonths(1).atDay(1).atStartOfDay())
      case 10 => // day
        val d = java.time.LocalDate.parse(lit)
        (d.atStartOfDay(), d.plusDays(1).atStartOfDay())
      case 13 => // hour: yyyy-MM-ddTHH
        val d = java.time.LocalDateTime.parse(lit + ":00:00",
          java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
        (d, d.plusHours(1))
      case _ => throw new IllegalArgumentException(s"unsupported interval literal '$lit'")
    }
    (ts(lo), ts(hi))
  }

  private def rewriteIntervalLiterals(q: String): String =
    IntervalLit.replaceAllIn(q, m => {
      val (lo, hi) = intervalBounds(m.group(2))
      s"(${m.group(1)} >= TIMESTAMP '$lo' AND ${m.group(1)} < TIMESTAMP '$hi')"
    })

  // ---- LATEST ON ---------------------------------------------------------

  private val LatestOnRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s+LATEST\s+ON\s+([\w.]+)\s+PARTITION\s+BY\s+([\w.,\s]+?)\s*(ORDER\s+BY\s+.*|LIMIT\s+.*)?$""".r

  private def rewriteLatestOn(q: String): String = q match {
    case LatestOnRe(sel, table, where, ts, keys, tail) =>
      val whereSql = Option(where).map(w => s" WHERE $w").getOrElse("")
      val keyList = keys.split(",").map(_.trim).mkString(", ")
      val tailSql = Option(tail).map(" " + _).getOrElse("")
      s"""SELECT $sel FROM (
         |  SELECT *, row_number() OVER (PARTITION BY $keyList ORDER BY $ts DESC) AS __rn
         |  FROM $table$whereSql
         |) WHERE __rn = 1$tailSql""".stripMargin
    case _ => q
  }

  // ---- SAMPLE BY (no FILL: pure SQL rewrite) -------------------------------

  private val SampleByRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s+SAMPLE\s+BY\s+(\d+)([smhd])\s*(?:ALIGN\s+TO\s+CALENDAR)?\s*(ORDER\s+BY\s+.*|LIMIT\s+.*)?$""".r

  private[sql] def strideOf(n: String, unit: String): String = unit match {
    case "s" => s"$n seconds"
    case "m" => s"$n minutes"
    case "h" => s"$n hours"
    case "d" => s"$n days"
  }

  /** Split a select list on top-level commas. */
  private[sql] def splitSelect(sel: String): Seq[String] = {
    val out = collection.mutable.Buffer[String]()
    var depth = 0; val cur = new StringBuilder
    sel.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  private def rewriteSampleBy(q: String): String = q match {
    case SampleByRe(sel, table, where, n, unit, tail) =>
      val stride = strideOf(n, unit)
      val items = splitSelect(sel)
      // bare identifiers = group keys; the designated ts item becomes the bucket
      val isBare = (s: String) => s.matches("""[\w.]+""")
      val tsItem = items.find(i => isBare(i) && (i == "ts" || i.endsWith(".ts")))
      val keys = items.filter(i => isBare(i) && !tsItem.contains(i))
      val outItems = items.map {
        case i if tsItem.contains(i) => s"window.start AS ${i.split('.').last}"
        case i => i
      }
      val whereSql = Option(where).map(w => s" WHERE $w").getOrElse("")
      val groupKeys = (s"window(${tsItem.getOrElse("ts")}, '$stride')" +: keys).mkString(", ")
      val tailSql = Option(tail).map(" " + _).getOrElse("")
      s"SELECT ${outItems.mkString(", ")} FROM $table$whereSql GROUP BY $groupKeys$tailSql"
    case _ => q
  }

  // ---- SAMPLE BY ... FILL(...): delegates to the SampleBy op ---------------

  private val SampleByFillRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*?))?\s+SAMPLE\s+BY\s+(\d+)([smhd])\s+FILL\s*\(\s*(\w+(?:\.\d+)?)\s*\)\s*$""".r

  private def sampleByFillForm(spark: SparkSession, q0: String): Option[DataFrame] = {
    val q = rewriteIntervalLiterals(q0)
    q match {
      case SampleByFillRe(sel, table, where, n, unit, fillSpec) =>
        val items = splitSelect(sel)
        val isBare = (s: String) => s.matches("""[\w.]+""")
        val tsItem = items.find(i => isBare(i) && (i == "ts" || i.endsWith(".ts"))).getOrElse("ts")
        val keys = items.filter(i => isBare(i) && i != tsItem)
        val AggAs = """(?is)^(.*?)\s+AS\s+(\w+)$""".r
        val aggs = items.filterNot(i => isBare(i)).map {
          case AggAs(e, name) => name -> expr(e)
          case e => e.replaceAll("\\W", "_") -> expr(e)
        }
        val fill = fillSpec.toUpperCase match {
          case "NONE" => graft.ops.SampleBy.NoFill
          case "NULL" => graft.ops.SampleBy.FillNull
          case "PREV" => graft.ops.SampleBy.FillPrev
          case "LINEAR" => graft.ops.SampleBy.FillLinear
          case v => graft.ops.SampleBy.FillConst(aggs.map(_._1 -> (v.toDouble: Any)).toMap)
        }
        val base = Option(where).map(w => spark.table(table).where(w)).getOrElse(spark.table(table))
        Some(graft.ops.SampleBy.sampleBy(base, tsItem.split('.').last,
          strideOf(n, unit), keys, aggs, fill, tsOut = tsItem.split('.').last))
      case _ => None
    }
  }

  // ---- ASOF / LT / SPLICE JOIN ---------------------------------------------

  private val AsofRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s+(ASOF|LT|SPLICE)\s+JOIN\s+([\w.]+)(?:\s+ON\s+\(?([\w.,\s]+?)\)?)?\s*(?:TOLERANCE\s+(\d+)([smhd]))?\s*$""".r

  private def asofForm(spark: SparkSession, q0: String): Option[DataFrame] = {
    val q = rewriteIntervalLiterals(q0)
    q match {
      case AsofRe(sel, master, kind, slave, onKeys, tolN, tolUnit) =>
        val m = spark.table(master)
        val s = spark.table(slave)
        val keys = Option(onKeys).map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
        val ts = "ts" // designated-ts convention
        val tol = Option(tolN).map { nn =>
          val mult = tolUnit match {
            case "s" => 1000000L; case "m" => 60000000L
            case "h" => 3600000000L; case "d" => 86400000000L
          }
          nn.toLong * mult
        }
        val out = kind.toUpperCase match {
          case "SPLICE" =>
            val mPay = m.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
            // clash-suffix slave payload so output columns stay unique
            val sRenamed = s.columns.filterNot(c => keys.contains(c) || c == ts).foldLeft(s) {
              (df, c) => if (m.columns.contains(c)) df.withColumnRenamed(c, c + "1") else df
            }
            val sPay = sRenamed.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
            graft.ops.AsofJoin.splice(m, sRenamed, ts, ts, keys, mPay, sPay)
          case k =>
            // clash-rename slave payload (reference suffixes duplicates with '1')
            val sPay0 = s.columns.filterNot(c => keys.contains(c)).toSeq
            val renamed = sPay0.foldLeft(s) { (df, c) =>
              if (m.columns.contains(c)) df.withColumnRenamed(c, c + "1") else df
            }
            val sPay = renamed.columns.filterNot(c => keys.contains(c) || c == ts).toSeq
            graft.ops.AsofJoin.asofKeyed(m, renamed.withColumn(ts, col(ts + "1")),
              ts, ts, keys, sPay, strict = k == "LT", toleranceMicros = tol)
        }
        Some(if (sel.trim == "*") out else out.selectExpr(splitSelect(sel): _*))
      case _ => None
    }
  }

  // ---- WINDOW JOIN -----------------------------------------------------------
  // SELECT m1, m2, agg AS name, ... FROM master WINDOW JOIN slave ON k
  //   RANGE BETWEEN <n><u> PRECEDING AND <n><u> FOLLOWING
  private val WindowJoinRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s+WINDOW\s+JOIN\s+([\w.]+)\s+ON\s+\(?([\w.,\s]+?)\)?\s+RANGE\s+BETWEEN\s+(\d+)([smhd])\s+PRECEDING\s+AND\s+(\d+)([smhd])\s+FOLLOWING\s*$""".r

  private def unitMicros(u: String): Long = u match {
    case "s" => 1000000L; case "m" => 60000000L
    case "h" => 3600000000L; case "d" => 86400000000L
  }

  private def windowJoinForm(spark: SparkSession, q0: String): Option[DataFrame] =
    rewriteIntervalLiterals(q0) match {
      case WindowJoinRe(sel, master, slave, onKeys, loN, loU, hiN, hiU) =>
        val keys = onKeys.split(",").map(_.trim).toSeq
        val items = splitSelect(sel)
        val AggAs = """(?is)^(.*?)\s+AS\s+(\w+)$""".r
        val aggs = items.filterNot(_.matches("""[\w.]+""")).map {
          case AggAs(e, name) => name -> expr(e)
          case e => e.replaceAll("\\W", "_") -> expr(e)
        }
        val m = spark.table(master)
        val s = spark.table(slave)
        // clash-suffix slave columns (except keys and its ts) so agg
        // expressions can address them as <col>1
        val renamed = s.columns.filterNot(c => keys.contains(c) || c == "ts").foldLeft(s) {
          (df, c) => if (m.columns.contains(c)) df.withColumnRenamed(c, c + "1") else df
        }
        val out = graft.ops.WindowJoin.windowJoin(
          m, renamed, "ts", "ts", keys,
          -loN.toLong * unitMicros(loU), hiN.toLong * unitMicros(hiU), aggs)
        Some(out)
      case _ => None
    }

  // ---- HORIZON JOIN ----------------------------------------------------------
  // SELECT ... FROM master HORIZON JOIN slave ON k LIST (o1, o2, ...)
  //   or ... ON k RANGE FROM a TO b STEP s   (offsets in <n><unit>)
  private val HorizonJoinRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s+HORIZON\s+JOIN\s+([\w.]+)\s+ON\s+\(?([\w.,\s]+?)\)?\s+LIST\s*\(([\d,\s]+)\)\s*$""".r
  private val HorizonRangeRe =
    """(?is)^SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s+HORIZON\s+JOIN\s+([\w.]+)\s+ON\s+\(?([\w.,\s]+?)\)?\s+RANGE\s+FROM\s+(-?\d+)([smhd])\s+TO\s+(-?\d+)([smhd])\s+STEP\s+(\d+)([smhd])\s*$""".r

  private def horizonJoinForm(spark: SparkSession, q0: String): Option[DataFrame] =
    rewriteIntervalLiterals(q0) match {
      case HorizonRangeRe(sel, master, slave, onKeys, aN, aU, bN, bU, sN, sU) =>
        val lo = aN.toLong * unitMicros(aU)
        val hi = bN.toLong * unitMicros(bU)
        val step = sN.toLong * unitMicros(sU)
        require(step > 0 && hi >= lo, "invalid HORIZON RANGE")
        runHorizon(spark, sel, master, slave, onKeys, (lo to hi by step).toSeq)
      case HorizonJoinRe(sel, master, slave, onKeys, list) =>
        runHorizon(spark, sel, master, slave, onKeys,
          list.split(",").map(_.trim.toLong).toSeq)
      case _ => None
    }

  private def runHorizon(spark: SparkSession, sel: String, master: String,
                         slave: String, onKeys: String,
                         offsets: Seq[Long]): Option[DataFrame] = {
    val keys = onKeys.split(",").map(_.trim).toSeq
        val m = spark.table(master)
        val s = spark.table(slave)
        // clash-rename slave payload as in asofForm
        val renamed = s.columns.filterNot(keys.contains).foldLeft(s) { (df, c) =>
          if (m.columns.contains(c)) df.withColumnRenamed(c, c + "1") else df
        }
        val withTs =
          if (renamed.columns.contains("ts")) renamed
          else renamed.withColumn("ts", col("ts1"))
        val payload = withTs.columns.filterNot(c => keys.contains(c) || c == "ts").toSeq
        val out = graft.ops.HorizonJoin.horizonJoin(
          m, withTs, "ts", "ts", keys, payload, offsets)
        Some(if (sel.trim == "*") out else out.selectExpr(splitSelect(sel): _*))
  }

  // ---- negative LIMIT -------------------------------------------------------

  private val NegLimitRe = """(?is)^(.*\bORDER\s+BY\s+)([\w.,\s]+?)\s+LIMIT\s+-(\d+)\s*$""".r

  private def rewriteNegativeLimit(q: String): String = q match {
    case NegLimitRe(prefix, orderCols, n) =>
      val cols = orderCols.split(",").map(_.trim)
      val flipped = cols.map { c =>
        if (c.toUpperCase.endsWith(" DESC")) c.dropRight(5) + " ASC"
        else if (c.toUpperCase.endsWith(" ASC")) c.dropRight(4) + " DESC"
        else c + " DESC"
      }.mkString(", ")
      val orderedNames = cols.mkString(", ")
      s"SELECT * FROM ($prefix$flipped LIMIT $n) ORDER BY $orderedNames"
    case _ => q
  }
}
