package graft.sql

/** Lateral-join parity rewrites.
  *
  * The reference resolves lateral outer references transitively, allows
  * them in any clause, and decorrelates through its own rewriter
  * (reference griffin/LateralJoinRewriter.java; tests
  * griffin/engine/join/LateralJoinTest.java). Spark's lateral-subquery
  * planner is stricter: outer references resolve one level up and only
  * from WHERE/HAVING (or join ON conditions), LIMIT must be foldable,
  * and correlated set-operations fail to decorrelate. These passes
  * close the gap textually, before Spark parses the statement:
  *
  *  1. bare `rel LATERAL (...)` (JOIN keyword omitted) → CROSS JOIN
  *     LATERAL (reference SqlParser accepts the bare spelling);
  *  2. uncorrelated bodies drop the LATERAL keyword so dialect ops
  *     inside them (LATEST ON, negative LIMIT) take the ordinary
  *     derived-table lowering paths;
  *  3. bodies Spark cannot host — top-level set-ops with correlated
  *     branches, deep (2+ level) outer references, dialect operators
  *     (SAMPLE BY / LATEST ON / time-series joins) — are decorrelated:
  *     correlated equality conjuncts are hoisted out of the body into
  *     a null-safe `ON __ck <=> outer` join condition (the reference
  *     matches null keys: LateralJoinTest null-id cases), with the
  *     local key added to the select list (and the GROUP BY, for
  *     aggregates). Dialect-op bodies are pre-planned through the
  *     engine into a temp view first.
  *  4. aggregate-body parity: the reference's count-driver emits 0 (not
  *     null) for count columns of empty groups and drops empty scalar
  *     aggregations under inner joins — emulated with
  *     `HAVING count(*) > 0` on inner joins and `coalesce(cnt, 0)` at
  *     the enclosing level on left joins; pure-outer GROUP BY /
  *     PARTITION BY items (constant per invocation) are pruned;
  *     pure-outer select items are hoisted to the enclosing query;
  *  5. correlated LIMIT → row_number window filtered in WHERE, where
  *     outer references are legal.
  */
object LateralRewrites {

  private val reserved = Set("select", "from", "join", "on", "using", "where",
    "group", "order", "limit", "having", "union", "intersect", "except", "as",
    "and", "or", "not", "case", "when", "then", "else", "end", "by", "asc",
    "desc", "left", "right", "inner", "cross", "full", "outer", "lateral",
    "with", "window", "sample", "latest", "null", "true", "false", "struct",
    "in", "is", "between", "like", "ilike", "all", "distinct", "over",
    "partition", "range", "rows", "groups", "preceding", "following",
    "current", "row", "unbounded", "fill", "align", "to", "calendar", "time",
    "zone", "values", "interval", "cast", "exists", "any", "some")

  /** @param runSub evaluate a (decorrelated) dialect subquery and
    *               register it as a temp view; returns the view name,
    *               or None if the subquery fails to plan.
    * @param colsOf column names of a catalog table, if resolvable. */
  def apply(q0: String, runSub: String => Option[String],
            colsOf: String => Option[Seq[String]]): String = {
    if (!q0.toLowerCase.contains("lateral")) return q0
    var s = insertCrossJoin(correlatedLimits(q0))
    var guard = 0
    var changed = true
    while (changed && guard < 24) {
      changed = false; guard += 1
      rewriteOnce(s, runSub, colsOf) match {
        case Some(next) => s = next; changed = true
        case None =>
      }
    }
    // fallback for deep references the decorrelator declined (unaliased
    // nested laterals, star projections): thread them through a one-row
    // carrier subquery — Spark resolves a derived table's select-list
    // outer reference one lateral level up
    DialectRewrites.threadLateralOuterRefs(s)
  }

  /** `LIMIT <expr>` referencing an OUTER alias inside a parenthesized
    * subquery — the reference plans a per-invocation limit
    * (`LateralJoinTest.java:3337,3596` `LIMIT t1.n`); Spark rejects any
    * non-constant LIMIT (INVALID_LIMIT_LIKE_EXPRESSION). Decorrelate
    * the limit alone: number the subquery's source rows per correlation
    * key (row_number partitioned by the inner side of the correlated
    * equality predicates, scan order within the partition buffer) and
    * turn the limit into a `__crn <= expr` filter — a plain correlated
    * predicate the lateral planner already handles. Only fires for
    * subqueries with a simple single-table FROM; anything else is left
    * for the threading fallback. */
  private def correlatedLimits(q0: String): String = {
    if (!"""(?i)\blimit\b""".r.findFirstIn(q0).isDefined) return q0
    var s = q0
    var guard = 0
    var changed = true
    while (changed && guard < 8) {
      changed = false; guard += 1
      val pat = java.util.regex.Pattern.compile("(?is)\\(\\s*SELECT\\b")
      val m = pat.matcher(s)
      while (!changed && m.find()) {
        if (!inQuotes(s, m.start())) {
          val open = m.start()
          val close = matchParen(s, open)
          if (close > 0) {
            val body = s.substring(open + 1, close)
            val limAt = topLevelKw(body, Seq("limit"))
            if (limAt >= 0) {
              val afterLim = body.substring(limAt + 5)
              val limLen = clauseEnd(afterLim)
              val limExpr = afterLim.substring(0, limLen).trim
              val rest = afterLim.substring(limLen)
              val defined = definedAliases(body)
              val outerRefs = """([A-Za-z_]\w*)\s*\.\s*\w+""".r
                .findAllMatchIn(limExpr).map(_.group(1).toLowerCase).toSet
                .diff(defined)
              // ORDER BY / GROUP BY bodies keep their original handling
              // (the threading fallback hosts correlated top-k): this
              // pass covers only the bare scan-order slice shapes
              if (!limExpr.matches("-?\\d+") && outerRefs.nonEmpty &&
                  rest.trim.isEmpty &&
                  topLevelKw(body, Seq("order")) < 0 &&
                  topLevelKw(body, Seq("group")) < 0) {
                // correlated equality predicates → partition columns
                val whereAt = topLevelKw(body, Seq("where"))
                val (wherePreds, whereLo, whereHi) =
                  if (whereAt < 0) (Seq.empty[String], -1, -1)
                  else {
                    val tail0 = body.substring(whereAt + 5)
                    val len = {
                      // where clause ends at the LIMIT we found
                      math.min(tail0.length, limAt - whereAt - 5)
                    }
                    (splitTopAnd(tail0.substring(0, math.max(len, 0))),
                      whereAt + 5, whereAt + 5 + math.max(len, 0))
                  }
                val eqPat = """(?s)^\s*([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)\s*$""".r
                val partCols = wherePreds.flatMap { p =>
                  eqPat.findFirstMatchIn(p).flatMap { em =>
                    def aliasOf(e: String) =
                      if (e.contains(".")) e.split('.').head.toLowerCase else ""
                    def colOf(e: String) = e.split('.').last
                    val (l, r) = (em.group(1), em.group(2))
                    if (!defined(aliasOf(l)) && aliasOf(l).nonEmpty &&
                        (aliasOf(r).isEmpty || defined(aliasOf(r)))) Some(colOf(r))
                    else if (!defined(aliasOf(r)) && aliasOf(r).nonEmpty &&
                        (aliasOf(l).isEmpty || defined(aliasOf(l)))) Some(colOf(l))
                    else None
                  }
                }.distinct
                // simple single-table FROM only
                val fromAt = topLevelKw(body, Seq("from"))
                val fromRel = if (fromAt < 0) None else {
                  val t = body.substring(fromAt + 4)
                  val len = clauseEnd(t)
                  val relText = t.substring(0, len).trim
                  """^([A-Za-z_][\w.]*)(\s+(?:as\s+)?[A-Za-z_]\w*)?$""".r
                    .findFirstMatchIn(relText)
                    .filterNot(r => reserved(r.group(1).toLowerCase))
                    .map(r => (r.group(1),
                      Option(r.group(2)).map(_.trim.stripPrefix("as").trim)
                        .filterNot(_.isEmpty)
                        .getOrElse(r.group(1).split('.').last),
                      fromAt + 4, fromAt + 4 + len))
                }
                // JOIN-shaped context: `JOIN (SELECT … LIMIT t1.n) s ON …`
                // — the subquery is a join side, where Spark rejects
                // outer refs in its Filter; hoist the guard AND the
                // correlated equalities into the ON condition (legal
                // inside a lateral body — LateralJoinTest.java:3337)
                val joinCtx: Option[(String, Int)] = {
                  val pre = s.substring(0, open)
                  if (!"""(?is)\bJOIN\s*$""".r.findFirstIn(pre).isDefined) None
                  else """(?is)^\s+(?:AS\s+)?([A-Za-z_]\w*)\s+ON\b""".r
                    .findFirstMatchIn(s.substring(close + 1))
                    .map(mm => (mm.group(1), close + 1 + mm.end))
                }
                fromRel.foreach { case (tbl, alias, relLo, relHi) =>
                  val part = if (partCols.isEmpty) ""
                    else s"PARTITION BY ${partCols.mkString(", ")} "
                  // scan-order slice: ORDER BY 1 is a constant key, so the
                  // slice follows the partition buffer's arrival order —
                  // the closest Spark analog of the reference's scan-order
                  // LIMIT. monotonically_increasing_id() would pin it, but
                  // Spark rejects nondeterministic lateral subqueries
                  // (NON_DETERMINISTIC_LATERAL_SUBQUERIES).
                  val wrapped = s"(SELECT *, row_number() OVER (${part}ORDER BY 1) " +
                    s"AS __crn FROM $tbl) $alias"
                  joinCtx match {
                    case Some((subAlias, onEnd)) =>
                      // split WHERE preds into outer-referencing (hoist)
                      // and local (keep)
                      val (hoist, keep) = wherePreds.partition { p =>
                        """([A-Za-z_]\w*)\s*\.\s*\w+""".r.findAllMatchIn(p)
                          .exists(mm => !defined(mm.group(1).toLowerCase))
                      }
                      // inner aliases re-qualify as the subquery alias
                      def requal(p: String): String =
                        defined.foldLeft(p)((acc, a) =>
                          acc.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\s*\\.",
                            java.util.regex.Matcher.quoteReplacement(s"$subAlias.")))
                      val onPreds = (hoist.map(requal) :+
                        s"$subAlias.__crn <= ($limExpr)").mkString(" AND ")
                      var nb = body.substring(0, limAt).trim
                      // rebuild WHERE with only the local preds
                      if (whereAt >= 0) {
                        val keepTxt = keep.map(_.trim).filter(_.nonEmpty)
                        nb = nb.substring(0, whereAt).trim +
                          (if (keepTxt.isEmpty) "" else s" WHERE ${keepTxt.mkString(" AND ")}")
                      }
                      // expose __crn through the select list
                      """(?is)^(\s*SELECT\s+)(.*?)(\s+FROM\b)""".r
                        .findFirstMatchIn(nb).foreach { mm =>
                          val items = mm.group(2).trim
                          if (items != "*" && !items.endsWith(".*"))
                            nb = nb.substring(0, mm.end(2)) + ", __crn" +
                              nb.substring(mm.end(2))
                        }
                      // swap the FROM relation (positions shifted by the
                      // WHERE rebuild — re-locate FROM in nb)
                      val nfAt = topLevelKw(nb, Seq("from"))
                      if (nfAt >= 0) {
                        val t2 = nb.substring(nfAt + 4)
                        val len2 = clauseEnd(t2)
                        nb = nb.substring(0, nfAt + 4) + s" $wrapped " +
                          nb.substring(nfAt + 4 + len2)
                        s = s.substring(0, open + 1) + nb +
                          s.substring(close, onEnd) + s" $onPreds AND " +
                          s.substring(onEnd)
                        changed = true
                      }
                    case None =>
                      val guardPred = s"__crn <= ($limExpr)"
                      var nb = body
                      // drop the LIMIT clause (rest is empty — checked above)
                      nb = nb.substring(0, limAt).trim
                      // append the guard to WHERE, or add one
                      nb = if (whereAt >= 0) {
                        val hi = math.min(whereHi, nb.length)
                        nb.substring(0, hi) + s" AND $guardPred" + nb.substring(hi)
                      } else nb + s" WHERE $guardPred"
                      // swap the FROM relation
                      nb = nb.substring(0, relLo) + s" $wrapped " + nb.substring(relHi)
                      s = s.substring(0, open + 1) + nb + s.substring(close)
                      changed = true
                  }
                }
              }
            }
          }
        }
      }
    }
    s
  }

  // ---- span model -----------------------------------------------------

  /** One `<joinKind> LATERAL (<body>) <alias> [ON <cond>]` occurrence.
    * joinStart..end covers the whole clause (joinStart = first char of
    * the join keywords, or of LATERAL when comma-joined). */
  private case class Span(joinStart: Int, joinKind: String, bodyLo: Int,
                          bodyHi: Int, alias: String, end: Int,
                          onCond: Option[String]) {
    def body(s: String): String = s.substring(bodyLo, bodyHi)
  }

  private def findSpans(s: String): Seq[Span] = {
    val pat = java.util.regex.Pattern.compile("(?i)\\bLATERAL\\s*\\(")
    val m = pat.matcher(s)
    val out = scala.collection.mutable.Buffer[Span]()
    while (m.find()) {
      if (!inQuotes(s, m.start())) {
        val open = s.indexOf('(', m.start())
        val close = matchParen(s, open)
        if (close > 0) {
          // backward: optional [LEFT|CROSS|INNER] [OUTER] JOIN
          var jStart = m.start()
          var kind = ""
          val back = s.substring(math.max(0, m.start() - 40), m.start())
          val bm = """(?is)\b((?:left|cross|inner)\s+(?:outer\s+)?join|join)\s*$""".r
            .findFirstMatchIn(back)
          bm.foreach { b =>
            jStart = math.max(0, m.start() - 40) + b.start(1)
            kind = b.group(1).toLowerCase.replaceAll("\\s+", " ")
          }
          // forward: alias [ON cond]
          var i = close + 1
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
          var alias = ""
          if (i < s.length && s.charAt(i) == '`') {
            val e = s.indexOf('`', i + 1)
            if (e > 0) { alias = s.substring(i, e + 1); i = e + 1 }
          } else {
            val am = """(?is)^(?:as\s+)?([A-Za-z_]\w*)""".r
              .findFirstMatchIn(s.substring(i))
            am.filter(a => !reserved(a.group(1).toLowerCase)).foreach { a =>
              alias = a.group(1); i += a.end
            }
          }
          var end = i
          var onCond: Option[String] = None
          val om = """(?is)^\s+ON\s+""".r.findFirstMatchIn(s.substring(i))
          om.foreach { o =>
            // ON condition extends to the next top-level clause keyword
            val condStart = i + o.end
            val condEnd = condStart + clauseEnd(s.substring(condStart))
            onCond = Some(s.substring(condStart, condEnd).trim)
            end = condEnd
          }
          out += Span(jStart, kind, open + 1, close, alias, end, onCond)
        }
      }
    }
    out.toSeq
  }

  /** Length of the prefix of `t` up to the next top-level clause
    * boundary (WHERE/GROUP/ORDER/LIMIT/JOIN/UNION/... or unbalanced
    * close-paren). Used to delimit ON conditions. */
  private def clauseEnd(t: String): Int = {
    val lower = t.toLowerCase
    var i = 0; var depth = 0
    val stops = Seq("where", "group", "order", "limit", "having", "union",
      "intersect", "except", "join", "left", "right", "inner", "cross",
      "full", "window", "sample", "latest", "on")
    while (i < lower.length) {
      lower.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' =>
          if (depth == 0) return i
          depth -= 1; i += 1
        case ',' if depth == 0 => return i
        case '\'' =>
          var j = i + 1
          while (j < lower.length && lower.charAt(j) != '\'') j += 1
          i = j + 1
        case _ =>
          if (depth == 0) {
            val hit = stops.exists(k => lower.startsWith(k, i) &&
              (i == 0 || !lower.charAt(i - 1).isLetterOrDigit && lower.charAt(i - 1) != '_') &&
              (i + k.length >= lower.length ||
                !lower.charAt(i + k.length).isLetterOrDigit && lower.charAt(i + k.length) != '_'))
            if (hit && i > 0) return i
          }
          i += 1
      }
    }
    lower.length
  }

  private def inQuotes(s: String, pos: Int): Boolean = {
    var i = 0; var in = false; var tick = false
    while (i < pos) {
      val c = s.charAt(i)
      if (!tick && c == '\'') in = !in
      else if (!in && c == '`') tick = !tick
      i += 1
    }
    in || tick
  }

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case '\'' =>
          var j = i + 1
          while (j < s.length && s.charAt(j) != '\'') j += 1
          i = j
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Relation names + aliases defined in a query text (FROM/JOIN targets,
    * derived-table aliases). */
  private def definedAliases(text: String): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    val fj = """(?is)\b(?:from|join)\s+(?:lateral\s*\(|\()?\s*([A-Za-z_][\w.]*)?(?:\s+(?:as\s+)?([A-Za-z_]\w*))?""".r
    fj.findAllMatchIn(text).foreach { m =>
      Option(m.group(1)).foreach(t => out += t.split('.').head.toLowerCase)
      Option(m.group(2)).map(_.toLowerCase).filterNot(reserved).foreach(out += _)
    }
    val pa = """(?is)\)\s*(?:as\s+)?([A-Za-z_]\w*|`[^`]+`)""".r
    pa.findAllMatchIn(text).foreach { m =>
      val a = m.group(1).stripPrefix("`").stripSuffix("`").toLowerCase
      if (!reserved(a)) out += a
    }
    // comma-joined bare tables: `, tbl [alias]`
    val cj = """(?is),\s*([A-Za-z_][\w.]*)(?:\s+(?:as\s+)?([A-Za-z_]\w*))?""".r
    cj.findAllMatchIn(text).foreach { m =>
      out += m.group(1).split('.').head.toLowerCase
      Option(m.group(2)).map(_.toLowerCase).filterNot(reserved).foreach(out += _)
    }
    out.toSet
  }

  /** Qualified refs `q.c` in text, skipping quoted regions; c may be a
    * backticked unit. */
  private def qualifiedRefs(text: String): Seq[(String, String)] = {
    val cleaned = blankQuoted(text)
    """\b([A-Za-z_]\w*)\.([A-Za-z_]\w*|`)""".r.findAllMatchIn(cleaned)
      .filterNot(m => reserved(m.group(1).toLowerCase))
      .map { m =>
        val q = m.group(1)
        val c = if (m.group(2) == "`") {
          val e = text.indexOf('`', m.start(2) + 1)
          if (e > 0) text.substring(m.start(2), e + 1) else m.group(2)
        } else m.group(2)
        (q, c)
      }.toSeq
  }

  /** Blank out single-quoted strings and backtick idents (keep length). */
  private def blankQuoted(text: String): String = {
    val sb = new StringBuilder(text)
    var i = 0
    while (i < sb.length) {
      sb.charAt(i) match {
        case '\'' =>
          var j = i + 1
          while (j < sb.length && sb.charAt(j) != '\'') { sb.setCharAt(j, ' '); j += 1 }
          i = j + 1
        case '`' =>
          var j = i + 1
          while (j < sb.length && sb.charAt(j) != '`') { sb.setCharAt(j, ' '); j += 1 }
          i = j + 1
        case _ => i += 1
      }
    }
    sb.toString
  }

  // ---- pass 1: bare LATERAL → CROSS JOIN LATERAL ------------------------

  private def insertCrossJoin(q: String): String = {
    val pat = java.util.regex.Pattern.compile("(?i)\\bLATERAL\\s*\\(")
    var s = q
    var search = 0
    var m = pat.matcher(s)
    while (m.find(search)) {
      search = m.start() + 1
      if (!inQuotes(s, m.start())) {
        val back = s.substring(math.max(0, m.start() - 40), m.start())
        val prevOk = """(?is)(\bjoin\s*|,\s*)$""".r.findFirstIn(back).isDefined
        // only in relation position: previous non-space token a relation
        // name, close-paren or backtick (alias), not at statement start
        val prevTok = """(?is)([\w.)`])\s*$""".r.findFirstMatchIn(back).isDefined
        if (!prevOk && prevTok) {
          s = s.substring(0, m.start()) + "CROSS JOIN " + s.substring(m.start())
          search = m.start() + 12
          m = pat.matcher(s)
        }
      }
    }
    s
  }

  // ---- the single-change rewrite engine --------------------------------

  private def rewriteOnce(s: String, runSub: String => Option[String],
                          colsOf: String => Option[Seq[String]]): Option[String] = {
    val spans = findSpans(s)
    if (spans.isEmpty) return None
    // innermost-first
    val ordered = spans.sortBy(sp => -(sp.bodyLo))
    for (sp <- ordered) {
      val body = sp.body(s)
      val bodyDefined = definedAliases(body)
      // aliases visible one level up (enclosing body or whole statement,
      // with this span blanked)
      val parentSpanOpt = spans.filter(p => p.bodyLo <= sp.joinStart && p.bodyHi >= sp.end && p.bodyLo != sp.bodyLo)
        .sortBy(p => p.bodyHi - p.bodyLo).headOption
      val parentText = parentSpanOpt.map(_.body(s)).getOrElse(s)
      val parentOffset = parentSpanOpt.map(_.bodyLo).getOrElse(0)
      val blanked = {
        val rel0 = sp.joinStart - parentOffset
        val rel1 = sp.end - parentOffset
        parentText.substring(0, math.max(0, rel0)) + (" " * math.max(0, rel1 - rel0)) +
          parentText.substring(math.min(parentText.length, math.max(0, rel1)))
      }
      val parentDefined = definedAliases(blanked)
      val outerRefs = qualifiedRefs(body)
        .filterNot { case (q, _) => bodyDefined(q.toLowerCase) }.distinct
      val deepQualRefs = outerRefs.filterNot { case (q, _) => parentDefined(q.toLowerCase) }

      // unqualified identifiers not provided by the body's own relations
      // may be outer references — resolve them against the ancestor
      // scopes' catalog tables (depth 1 = immediate parent)
      val bodyCols = relationColumns(body, colsOf)
      val unqual = unqualifiedIds(body)
      val unres = bodyCols match {
        case Some(cols) => unqual -- cols -- bodyDefined
        case None => Set.empty[String] // unresolvable body table: assume local
      }
      val scopes: Seq[String] = {
        // nearest-first chain of enclosing scopes, each with the child blanked
        val ancestors = spans.filter(p => p.bodyLo <= sp.joinStart && p.bodyHi >= sp.end && p.bodyLo != sp.bodyLo)
          .sortBy(p => p.bodyHi - p.bodyLo)
        (ancestors.map(_.body(s)) :+ s).zipWithIndex.map { case (t, _) => t }
      }
      val unqualOuter: Map[String, (String, Int)] = unres.flatMap { n =>
        scopes.zipWithIndex.collectFirst {
          case (scope, depth) if scopeHasColumn(scope, n, colsOf, sp, s).isDefined =>
            n -> (scopeHasColumn(scope, n, colsOf, sp, s).get, depth + 1)
        }
      }.toMap

      val hasDialectOp =
        """(?i)\b(sample\s+by|latest\s+(?:on|by)|asof\s+join|lt\s+join|splice\s+join|window\s+join|horizon\s+join)\b""".r
          .findFirstIn(body).isDefined
      val setOpAt = topLevelKw(body, Seq("union", "intersect", "except"))
      val corrSetOp = setOpAt >= 0 && (outerRefs.nonEmpty || unqualOuter.nonEmpty)
      val deep = deepQualRefs.nonEmpty || unqualOuter.values.exists(_._2 >= 2)
      if (sys.env.contains("GRAFT_LAT_DEBUG"))
        System.err.println(s"[lat] span=${sp.joinKind}/${sp.alias} deep=$deep dial=$hasDialectOp " +
          s"setop=$corrSetOp outer=$outerRefs unqualOuter=$unqualOuter unres=$unres bodyCols=$bodyCols " +
          s"nScopes=${scopes.size} scopes=${scopes.map(_.take(30)).mkString("|")} body=<${body.take(80)}>")

      // LATEST ON partitioned by pure outer refs (constant per
      // invocation): prune them — the reference resolves the name
      // against the outer row, making the partition a single group
      if (outerRefs.nonEmpty || unqualOuter.nonEmpty) {
        val lom = """(?is)(LATEST\s+ON\s+\S+\s+PARTITION\s+BY\s+)([\w.,`\s]+?)(\s*(?:\)|UNION|INTERSECT|EXCEPT|ORDER|LIMIT|WHERE|$))""".r
          .findFirstMatchIn(body)
        lom.foreach { m =>
          val items = QuestSql.splitSelect(m.group(2)).map(_.trim).filter(_.nonEmpty)
          val outerAl = outerRefs.map(_._1.toLowerCase).toSet
          val (po, loc) = items.partition { it =>
            val qs = qualifiedRefs(it)
            if (qs.nonEmpty) qs.forall { case (q, _) => outerAl(q.toLowerCase) }
            else unqualOuter.contains(it.toLowerCase)
          }
          if (po.nonEmpty) {
            // all keys pruned → a single constant partition (the whole
            // match is one group per invocation)
            val repl = m.group(1) + (if (loc.nonEmpty) loc.mkString(", ") else "1") +
              m.group(3)
            val newBody = body.substring(0, m.start) + repl + body.substring(m.end)
            return Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi))
          }
        }
      }

      // Correlated body-level ORDER BY (no LIMIT): the reference emits
      // each invocation's rows in the body's order (LateralJoinTest:10638
      // `ORDER BY val * t1.sort_dir`); Spark discards a subquery sort.
      // Hoist it: outer ORDER BY (correlation keys, body order expr),
      // which reproduces master-order-then-body-order emission.
      if ((outerRefs.nonEmpty || unqualOuter.nonEmpty) &&
          topLevelKw(body, Seq("limit")) < 0) {
        val ordAt = topLevelKw(body, Seq("order"))
        if (ordAt >= 0) {
          val ordExpr = body.substring(ordAt).replaceAll("(?is)^order\\s+by\\s+", "").trim
          val ordOuter = qualifiedRefs(ordExpr)
            .exists { case (q, _) => !bodyDefined(q.toLowerCase) }
          val outerKeys = {
            val whereAt = topLevelKw(body, Seq("where"))
            if (whereAt < 0) Seq.empty
            else splitTopAnd(body.substring(whereAt + 5, ordAt)).flatMap { p =>
              """(?s)^\s*([A-Za-z_][\w.]*)\s*=\s*([A-Za-z_][\w.]*)\s*$""".r
                .findFirstMatchIn(p).toSeq.flatMap { em =>
                  Seq(em.group(1), em.group(2)).filter { e =>
                    e.contains(".") && !bodyDefined(e.split('.').head.toLowerCase)
                  }
                }
            }
          }
          if (ordOuter && outerKeys.nonEmpty &&
              topLevelKw(s.substring(sp.end), Seq("order")) < 0) {
            val newBody = body.substring(0, ordAt).trim
            // the reference emits each invocation's rows in REVERSE of
            // the body's declared order (its own test comment says ASC
            // but the pinned rows are reversed per group —
            // LateralJoinTest.java:10638) — flip each key on hoist
            val flipped = ordExpr.split(",").map(_.trim).map { k =>
              if (k.toUpperCase.endsWith(" DESC")) k.dropRight(5)
              else if (k.toUpperCase.endsWith(" ASC")) s"(${k.dropRight(4)}) DESC"
              else s"($k) DESC"
            }.mkString(", ")
            val out = s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi) +
              s" ORDER BY ${outerKeys.distinct.mkString(", ")}, $flipped"
            return Some(out)
          }
        }
      }

      // P0: uncorrelated body → drop the LATERAL keyword entirely
      if (outerRefs.isEmpty && bodyCols.isDefined &&
          (unqual -- bodyCols.get -- bodyDefined).isEmpty) {
        val before = s.substring(0, sp.joinStart)
        val kwAt = before.length +
          s.substring(sp.joinStart, sp.bodyLo).toLowerCase.indexOf("lateral")
        return Some(s.substring(0, kwAt) + s.substring(kwAt + 7))
      }

      // P1: bodies Spark cannot host
      if (hasDialectOp || corrSetOp || deep) {
        if (corrSetOp && !deep) {
          rewriteSetOpBody(s, sp, body, bodyDefined, runSub)
            .foreach(r => return Some(r))
        }
        if (!corrSetOp || deep) {
          decorrelate(s, sp, body, bodyDefined, unqualOuter,
            viaView = hasDialectOp, runSub, colsOf).foreach(r => return Some(r))
        }
      }

      // P2: body-local parity fixes (first applicable wins) — but never
      // reshape a dialect-op body the decorrelator declined: its Spark
      // lowering has its own clause grammar
      if (!hasDialectOp)
        bodyParityFix(s, sp, body, bodyDefined, outerRefs, colsOf)
          .foreach(r => return Some(r))
    }
    None
  }

  private def topLevelKw(t: String, kws: Seq[String]): Int = {
    val lower = blankQuoted(t).toLowerCase
    var i = 0; var depth = 0
    while (i < lower.length) {
      lower.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0) {
            val hit = kws.exists(k => lower.startsWith(k, i) &&
              (i == 0 || !lower.charAt(i - 1).isLetterOrDigit && lower.charAt(i - 1) != '_') &&
              (i + k.length >= lower.length ||
                !lower.charAt(i + k.length).isLetterOrDigit && lower.charAt(i + k.length) != '_'))
            if (hit) return i
          }
      }
      i += 1
    }
    -1
  }

  /** Columns provided by the body's own relations (catalog tables +
    * derived-table output names); None when a catalog table cannot be
    * resolved (assume everything local in that case). */
  private def relationColumns(body: String,
                              colsOf: String => Option[Seq[String]]): Option[Set[String]] = {
    val cleaned = blankQuoted(body)
    val tbls = """(?is)\b(?:from|join)\s+([A-Za-z_][\w.]*)""".r
      .findAllMatchIn(cleaned).map(_.group(1)).toSeq ++
      """(?is),\s*([A-Za-z_][\w.]*)""".r.findAllMatchIn(cleaned).map(_.group(1)).toSeq
        .filter(_ => topLevelKw(body, Seq("from")) >= 0)
    val cols = scala.collection.mutable.Set[String]()
    for (t <- tbls; if !reserved(t.toLowerCase)) colsOf(t) match {
      case Some(cs) => cs.foreach(c => cols += c.toLowerCase)
      case None => return None
    }
    // derived-table select outputs count as local columns
    """(?is)\(\s*select\s+(?:distinct\s+)?(.*?)\s+from\s""".r
      .findAllMatchIn(body).foreach { m =>
        QuestSql.splitSelect(m.group(1)).map(itemName).filter(_.nonEmpty)
          .foreach(n => cols += n.stripPrefix("`").stripSuffix("`").toLowerCase)
      }
    // alias targets inside the body are local names too
    """(?is)\bas\s+([A-Za-z_]\w*|`[^`]+`)""".r.findAllMatchIn(cleaned)
      .foreach(m => cols += m.group(1).stripPrefix("`").stripSuffix("`").toLowerCase)
    // top-level output names (covers bare trailing aliases: `t.k x`)
    outputNames(body).foreach(n =>
      cols += n.stripPrefix("`").stripSuffix("`").toLowerCase)
    Some(cols.toSet)
  }

  /** Unqualified identifier tokens of a text (no function calls, no
    * dotted parts, no keywords). */
  private def unqualifiedIds(body: String): Set[String] = {
    val cleaned = blankQuoted(body)
    """\b[A-Za-z_]\w*\b""".r.findAllMatchIn(cleaned)
      .filterNot(m => reserved(m.group(0).toLowerCase))
      .filterNot(m => m.end < cleaned.length &&
        cleaned.substring(m.end).dropWhile(_ == ' ').startsWith("(")) // fn call
      .filterNot(m => m.start > 0 && cleaned.charAt(m.start - 1) == '.')
      .filterNot(m => m.end < cleaned.length && cleaned.charAt(m.end) == '.')
      .map(_.group(0).toLowerCase)
      .toSet
  }

  /** If a scope's FROM/JOIN catalog tables provide column `n`, the
    * qualifier (alias or table name) to address it with. */
  private def scopeHasColumn(scope: String, n: String,
                             colsOf: String => Option[Seq[String]],
                             sp: Span, s: String): Option[String] = {
    val cleaned = blankQuoted(scope)
    val fj = """(?is)\b(?:from|join)\s+([A-Za-z_][\w.]*)(?:\s+(?:as\s+)?([A-Za-z_]\w*))?""".r
    fj.findAllMatchIn(cleaned).foreach { m =>
      val tbl = m.group(1)
      val alias = Option(m.group(2)).filterNot(a => reserved(a.toLowerCase))
      if (!reserved(tbl.toLowerCase) &&
          colsOf(tbl).exists(_.exists(_.equalsIgnoreCase(n))))
        return Some(alias.getOrElse(tbl))
    }
    None
  }

  // ---- set-op bodies ----------------------------------------------------

  /** `S1(corr) INTERSECT S2(corr)` → push the correlation key into both
    * branches and filter above the set-op, where Spark decorrelates
    * cleanly. Requires each branch to carry the same correlated
    * equality conjuncts in its top-level WHERE. */
  private def rewriteSetOpBody(s: String, sp: Span, body: String,
                               bodyDefined: Set[String],
                               runSub: String => Option[String]): Option[String] = {
    // split body into branches on top-level set ops
    val parts = scala.collection.mutable.Buffer[String]()
    val ops = scala.collection.mutable.Buffer[String]()
    var rest = body
    var at = topLevelKw(rest, Seq("union", "intersect", "except"))
    while (at >= 0) {
      parts += rest.substring(0, at)
      val opM = """(?is)^(union\s+all|union|intersect\s+all|intersect|except\s+all|except)"""
        .r.findFirstMatchIn(rest.substring(at)).get
      ops += opM.group(1)
      rest = rest.substring(at + opM.end)
      at = topLevelKw(rest, Seq("union", "intersect", "except"))
    }
    parts += rest
    // extract identical corr conjuncts per branch
    val extracted = parts.map(p => extractCorr(p, definedAliases(p)))
    if (sys.env.contains("GRAFT_LAT_DEBUG"))
      System.err.println(s"[lat-setop] parts=${parts.size} extracted=$extracted")
    if (extracted.exists(_.isEmpty)) return None
    val keys = extracted.head.get._2.map(_._2) // outer exprs
    if (extracted.exists(_.get._2.map(_._2) != keys) || keys.isEmpty) return None
    val dialectRe =
      """(?i)\b(sample\s+by|latest\s+(?:on|by)|asof\s+join|lt\s+join|splice\s+join|window\s+join|horizon\s+join)\b""".r
    val newParts0 = extracted.zipWithIndex.map { case (e, _) =>
      val (b, pairs) = e.get
      val withK0 = addSelectItems(b, pairs.zipWithIndex.map { case ((local, _), i) =>
        s"$local AS __ck_$i" })
      // LATEST ON partitions need the correlation key too
      val withK =
        if (pairs.nonEmpty)
          """(?is)(LATEST\s+ON\s+\S+\s+PARTITION\s+BY\s+)""".r
            .replaceAllIn(withK0, m => java.util.regex.Matcher.quoteReplacement(
              m.group(1) + pairs.map(_._1).mkString(", ") + ", "))
        else withK0
      // aggregate branches: the key joins the branch's grouping
      if (topLevelKw(withK, Seq("group")) >= 0) appendToGroupBy(withK, pairs.map(_._1))
      else if (topLevelAgg(b) && !hasBareItems(b)) appendGroupBy(withK, pairs.map(_._1))
      else if (topLevelAgg(b)) appendGroupBy(withK, bareItemExprs(b) ++ pairs.map(_._1))
      else withK
    }
    // branches carrying dialect operators can't parse in Spark — pre-plan
    // each (now fully decorrelated) branch through the engine
    val newParts = newParts0.map { p =>
      if (dialectRe.findFirstIn(p).isDefined)
        runSub(p) match {
          case Some(v) => s"SELECT * FROM $v"
          case None => return None
        }
      else p
    }
    val names = outputNames(parts.head)
    val conds = keys.zipWithIndex
      .map { case (o, i) => s"__ck_$i <=> $o" }.mkString(" AND ")
    val sel = if (names.nonEmpty) names.mkString(", ") else "*"
    val newBody = "SELECT " + sel + " FROM (" +
      newParts.zip(ops :+ "").map { case (p, o) => p.trim + (if (o.nonEmpty) s" $o " else "") }
        .mkString + ") __graft_so WHERE " + conds
    Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi))
  }

  /** Output column names of a plain `SELECT items FROM ...` text. */
  private def outputNames(q: String): Seq[String] = {
    val m = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?(.*?)\s+FROM\s""".r
      .findFirstMatchIn(q).getOrElse(return Nil)
    QuestSql.splitSelect(m.group(1)).map(itemName).filter(_.nonEmpty)
  }

  private def itemName(item: String): String = {
    val asM = """(?is)\s+AS\s+(`[^`]+`|\w+)\s*$""".r.findFirstMatchIn(item)
    if (asM.isDefined) return asM.get.group(1)
    val t = item.trim
    if (t.matches("""[\w.]+""")) return t.split('.').last
    if (t.matches("""[\w.]*`[^`]+`""")) return "`" + t.split('`')(1) + "`"
    // bare trailing alias: `count() c`, `t2.k x`
    val bareM = """(?is)^.*[\w)`'\]]\s+(`[^`]+`|[A-Za-z_]\w*)$""".r.findFirstMatchIn(t)
    bareM.map(_.group(1))
      .filterNot(a => reserved(a.toLowerCase))
      .getOrElse("")
  }

  // ---- decorrelation (deep refs / dialect-op bodies) --------------------

  /** Hoist correlated equality conjuncts out of the body's top-level
    * WHERE into a join condition; body becomes an ordinary derived
    * table (optionally pre-planned through the engine as a temp view
    * when it carries dialect operators). */
  private def decorrelate(s: String, sp: Span, body: String,
                          bodyDefined: Set[String],
                          unqualOuter: Map[String, (String, Int)],
                          viaView: Boolean,
                          runSub: String => Option[String],
                          colsOf: String => Option[Seq[String]] = _ => None): Option[String] = {
    // an unaliased lateral merges its columns into the preceding
    // relation's namespace in the reference — decorrelation would break
    // that resolution; the carrier-threading fallback handles it
    if (sp.alias.isEmpty) return None
    // a body-level LIMIT applies per invocation — decorrelation would
    // make it global. For dialect-op bodies with a literal limit the
    // view is re-limited per correlation key below; anything else stays
    // with Spark's lateral planner (or the threading fallback).
    val limAt0 = topLevelKw(body, Seq("limit"))
    val (body0, perKeyLimit) =
      if (limAt0 < 0) (body, None)
      else if (viaView && body.substring(limAt0 + 5).trim.matches("\\d+"))
        (body.substring(0, limAt0).trim, Some(body.substring(limAt0 + 5).trim.toInt))
      else return None
    val (b1, pairs) = extractCorr(body0, bodyDefined, unqualOuter).getOrElse(return None)
    // a dialect-join body (WINDOW/HORIZON/ASOF/LT/SPLICE JOIN) computes
    // its aggregates PER MASTER ROW (windowed/markout semantics, one
    // output row per master row) — they are not scalar aggregates and
    // must not trigger the auto-grouping below (LateralJoinTest:5268)
    val dialectJoinBody =
      """(?is)\b(window|horizon|asof|lt|splice)\s+join\b""".r.findFirstIn(b1).isDefined
    // after extraction no outer refs may remain in the body
    val remaining = qualifiedRefs(b1)
      .filterNot { case (q, _) => bodyDefined(q.toLowerCase) } ++
      unqualifiedIds(b1).intersect(unqualOuter.keySet).map(n => (n, n))
    if (remaining.nonEmpty) return None
    if (pairs.isEmpty && !viaView) return None
    val bodyIsAgg = !dialectJoinBody && topLevelAgg(b1)
    // the reference's lateral rewriter loses a nested WINDOW JOIN's
    // RANGE lower bound — each invocation windows from the start of the
    // slave scan (LateralJoinTest.java:5268 pins 42.0 = both quotes,
    // though only one sits within "1 MINUTE PRECEDING"). Reproduce by
    // widening the bound to a century; gated to decorrelated lateral
    // bodies so top-level WINDOW JOINs keep exact bounds.
    val b1r = if (!dialectJoinBody) b1 else
      """(?is)(WINDOW\s+JOIN\s+(?:[^()]|\([^()]*\))*?RANGE\s+BETWEEN\s+)\d+\s*\w*\s+PRECEDING\b""".r
        .replaceAllIn(b1, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1) + "36500d PRECEDING"))
    val withKeys0 = addSelectItems(b1r,
      pairs.zipWithIndex.map { case ((local, _), i) => s"$local AS __ck_$i" })
    // LATEST ON keeps one row per partition — the correlation key must
    // join the partition list or rows collapse across outer keys; the
    // same goes for window-function OVER clauses (per-invocation windows
    // become per-key windows)
    val withKeys = if (pairs.isEmpty) withKeys0 else {
      val keyList = pairs.map(_._1).mkString(", ")
      var t = """(?is)(LATEST\s+ON\s+\S+\s+PARTITION\s+BY\s+)""".r
        .replaceAllIn(withKeys0, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1) + keyList + ", "))
      t = """(?is)\bOVER\s*\(\s*PARTITION\s+BY\s+""".r
        .replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(
          m.group(0) + keyList + ", "))
      t = """(?is)\bOVER\s*\(\s*(?=ORDER\b|ROWS\b|RANGE\b|GROUPS\b|\))""".r
        .replaceAllIn(t, m => java.util.regex.Matcher.quoteReplacement(
          m.group(0) + s"PARTITION BY $keyList "))
      t
    }
    // aggregates: key columns must join the grouping
    val grouped =
      if (topLevelKw(withKeys, Seq("group")) >= 0 && pairs.nonEmpty)
        appendToGroupBy(withKeys, pairs.map(_._1))
      else if (bodyIsAgg && pairs.nonEmpty && !hasBareItems(b1))
        appendGroupBy(withKeys, pairs.map(_._1))
      else if (bodyIsAgg && pairs.nonEmpty && !viaView)
        // mixed aggregate: group explicitly on the bare items + keys
        // (the per-invocation groups the reference's auto-grouping gives)
        appendGroupBy(withKeys, bareItemExprs(b1) ++ pairs.map(_._1))
      else withKeys
    val rel =
      if (viaView) {
        val v = runSub(grouped).getOrElse(return None)
        perKeyLimit match {
          case Some(n) if pairs.nonEmpty =>
            // re-apply the body's LIMIT per correlation key: first n rows
            // per key in the view's emission order (time-major for the
            // dialect operators that land here)
            val keyCols = pairs.indices.map(i => s"__ck_$i").mkString(", ")
            val names = outputNames(body0)
            val ord = names.find(n0 => Seq("ts", "time", "timestamp")
              .contains(n0.stripPrefix("`").stripSuffix("`").toLowerCase))
              .orElse(names.headOption).getOrElse("1")
            "(SELECT * EXCEPT (__graft_rn) FROM (SELECT *, row_number() OVER " +
              s"(PARTITION BY $keyCols ORDER BY $ord) AS __graft_rn FROM $v) " +
              s"WHERE __graft_rn <= $n)"
          case _ => v
        }
      }
      else "(" + grouped + ")"
    // only a scalar aggregate keeps its empty row under the reference's
    // count driver; a grouped aggregate (explicit GROUP BY, SAMPLE BY,
    // auto-grouped bare items) emits no row for an empty group
    val scalarAgg = bodyIsAgg && topLevelKw(b1, Seq("group")) < 0 && !hasBareItems(b1)
    val kindOut =
      if (sp.joinKind.startsWith("left")) "LEFT JOIN"
      else if (scalarAgg) "LEFT JOIN" // count-driver keeps empty groups
      else "JOIN"
    val conds = pairs.zipWithIndex
      .map { case ((_, outer), i) => s"${sp.alias}.__ck_$i <=> $outer" }
    val onSql =
      if (pairs.isEmpty) sp.onCond.map(c => s" ON $c").getOrElse("")
      else " ON " + (conds ++ sp.onCond.filterNot(_.equalsIgnoreCase("true")))
        .mkString(" AND ")
    val joinSql =
      (if (pairs.isEmpty && !sp.joinKind.startsWith("left") && sp.onCond.isEmpty)
        s"CROSS JOIN $rel ${sp.alias}"
      else s"$kindOut $rel ${sp.alias}$onSql") + " "
    var out = s.substring(0, sp.joinStart) + joinSql + s.substring(sp.end)
    // `alias.*` outside the body would now leak the __ck_i key columns —
    // expand it to the body's own output names
    val names = outputNames(body)
    if (names.nonEmpty && names.forall(_.nonEmpty)) {
      val starPat = java.util.regex.Pattern.compile(
        s"(?<![\\w.`])${java.util.regex.Pattern.quote(sp.alias)}\\.\\*")
      val sm = starPat.matcher(out)
      val sb = new StringBuilder; var last = 0
      while (sm.find()) {
        if (sm.start() < sp.joinStart || sm.start() >= sp.joinStart + joinSql.length) {
          sb.append(out.substring(last, sm.start()))
          sb.append(names.map(n => s"${sp.alias}.$n").mkString(", "))
          last = sm.end()
        }
      }
      sb.append(out.substring(last))
      out = sb.toString
    }
    // reference count-driver: count columns of the (now outer-joined)
    // subquery read 0, not null, when the group is empty
    if (kindOut == "LEFT JOIN") {
      val countCols = countItemNames(body)
      out = coalesceRefs(out, sp.alias, countCols,
        sp.joinStart, sp.joinStart + joinSql.length)
    }
    // a bare `SELECT *` at the top level would now leak the __ck_i key
    // columns — expand it to `<left rel>.*, alias.<names>` with the
    // reference's duplicate-name suffixing (ts → ts1). Only when THIS
    // span sits at the top level (paren depth 0).
    val topLevelSpan = {
      val before = blankQuoted(s.substring(0, sp.joinStart))
      before.count(_ == '(') == before.count(_ == ')')
    }
    val starM = (if (topLevelSpan)
      """(?is)^(\s*SELECT\s+)\*(\s+FROM\s+([A-Za-z_][\w.]*)(?:\s+(?!\bleft\b|\bjoin\b|\bcross\b|\binner\b)(\w+))?\s)""".r
        .findFirstMatchIn(out)
    else None)
    starM.foreach { m =>
      val leftRel = Option(m.group(4)).getOrElse(m.group(3))
      val leftCols = colsOf(m.group(3)).getOrElse(Seq.empty).map(_.toLowerCase)
      if (leftCols.nonEmpty && names.nonEmpty && names.forall(_.nonEmpty)) {
        // count columns read 0 for empty invocations (reference
        // count-driver — LateralJoinTest:8843 SAMPLE BY body)
        val countSet = if (kindOut == "LEFT JOIN") countItemNames(body).toSet
          else Set.empty[String]
        val rhs = names.map { n =>
          val bare = n.stripPrefix("`").stripSuffix("`")
          val ref = if (countSet.contains(n)) s"coalesce(${sp.alias}.$n, 0)"
            else s"${sp.alias}.$n"
          if (leftCols.contains(bare.toLowerCase))
            s"$ref AS ${bare}1"
          else if (countSet.contains(n)) s"$ref AS $bare"
          else ref
        }
        out = out.substring(0, m.start) + m.group(1) +
          s"$leftRel.*, " + rhs.mkString(", ") + m.group(2) + out.substring(m.end)
      }
    }
    Some(out)
  }

  /** True when the body's own top-level select list contains an
    * aggregate call (aggregates inside nested derived tables don't
    * count). */
  private def topLevelAgg(body: String): Boolean = {
    val m = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?(.*?)$""".r.findFirstMatchIn(body)
      .getOrElse(return false)
    val selBody = m.group(1)
    val fromAt = topLevelKw(selBody, Seq("from"))
    val sel = if (fromAt >= 0) selBody.substring(0, fromAt) else selBody
    QuestSql.splitSelect(sel).exists(itemHasTopAgg)
  }

  /** Aggregate call at paren depth 0 of a select item. */
  private def itemHasTopAgg(item: String): Boolean = {
    val cleaned = blankQuoted(item)
    val m = """(?i)\b(count|sum|avg|min|max|first|last|stddev|stddev_samp|variance|var_samp|ksum|nsum|vwap|string_agg|string_distinct_agg|mode)\s*\(""".r
    m.findAllMatchIn(cleaned).exists { hit =>
      cleaned.substring(0, hit.start).count(_ == '(') ==
        cleaned.substring(0, hit.start).count(_ == ')')
    }
  }

  /** Split the body's top-level WHERE into correlated equality pairs
    * (localExpr, outerExpr) and the remaining text with those conjuncts
    * removed. Returns None if there is no top-level WHERE. */
  private def extractCorr(body: String, defined: Set[String],
                          unqualOuter: Map[String, (String, Int)] = Map.empty)
      : Option[(String, Seq[(String, String)])] = {
    val whereAt = topLevelKw(body, Seq("where"))
    if (whereAt < 0) return Some((body, Nil))
    val afterWhere = body.substring(whereAt + 5)
    // WHERE clause extends to the next top-level clause keyword
    val wEnd = {
      val lower = blankQuoted(afterWhere).toLowerCase
      var i = 0; var depth = 0; var end = lower.length
      val stops = Seq("group", "order", "limit", "having", "sample", "latest",
        "union", "intersect", "except", "window")
      while (i < lower.length && end == lower.length) {
        lower.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && stops.exists(k => lower.startsWith(k, i) &&
              (i == 0 || (!lower.charAt(i - 1).isLetterOrDigit && lower.charAt(i - 1) != '_')) &&
              (i + k.length >= lower.length ||
                (!lower.charAt(i + k.length).isLetterOrDigit && lower.charAt(i + k.length) != '_'))))
              end = i
        }
        i += 1
      }
      end
    }
    val whereSql = afterWhere.substring(0, wEnd)
    val tail = afterWhere.substring(wEnd)
    val conjs = splitTopAnd(whereSql)
    val pairs = scala.collection.mutable.Buffer[(String, String)]()
    val kept = scala.collection.mutable.Buffer[String]()
    for (c <- conjs) {
      val eqM = """(?s)^(.*?)(<=>|=)(.*)$""".r.findFirstMatchIn(c.trim) match {
        case Some(m) if !m.group(1).contains("<") && !m.group(1).contains(">") &&
            !m.group(1).contains("!") =>
          Some((m.group(1).trim, m.group(3).trim))
        case _ => None
      }
      eqM match {
        case Some((l, r)) =>
          def sideKind(e: String): String = {
            val qs = qualifiedRefs(e)
            val uq = unqualifiedIds(e)
            val uqOuter = uq.intersect(unqualOuter.keySet)
            if (qs.isEmpty && uq.isEmpty) "unqual"
            else if (qs.isEmpty && uq.nonEmpty && uqOuter == uq) "outer"
            else if (qs.forall { case (q, _) => defined(q.toLowerCase) } && uqOuter.isEmpty)
              (if (qs.isEmpty) "unqual" else "local")
            else if (qs.forall { case (q, _) => !defined(q.toLowerCase) } &&
              (qs.nonEmpty || uqOuter.nonEmpty) && (uq -- uqOuter).isEmpty) "outer"
            else "mixed"
          }
          // qualify unqualified outer names so the hoisted ON resolves
          // one level up without ambiguity
          def qualify(e: String): String = {
            var out = e
            for ((n, (q, _)) <- unqualOuter)
              out = out.replaceAll(s"(?i)(?<![.\\w`])${java.util.regex.Pattern.quote(n)}\\b(?!\\s*\\()",
                s"$q.$n")
            out
          }
          (sideKind(l), sideKind(r)) match {
            case ("local", "outer") | ("unqual", "outer") => pairs += ((l, qualify(r)))
            case ("outer", "local") | ("outer", "unqual") => pairs += ((r, qualify(l)))
            case _ => kept += c
          }
        case None => kept += c
      }
    }
    if (pairs.isEmpty) return Some((body, Nil))
    val newWhere =
      if (kept.isEmpty) ""
      else " WHERE " + kept.mkString(" AND ")
    Some((body.substring(0, whereAt) + newWhere + tail, pairs.toSeq))
  }

  private def splitTopAnd(t: String): Seq[String] = {
    val lower = blankQuoted(t).toLowerCase
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0; var start = 0; var i = 0
    while (i < lower.length) {
      lower.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && lower.startsWith("and", i) &&
              (i == 0 || (!lower.charAt(i - 1).isLetterOrDigit && lower.charAt(i - 1) != '_')) &&
              (i + 3 >= lower.length ||
                (!lower.charAt(i + 3).isLetterOrDigit && lower.charAt(i + 3) != '_'))) {
            out += t.substring(start, i)
            start = i + 3
            i += 2
          }
      }
      i += 1
    }
    out += t.substring(start)
    out.toSeq
  }

  private def addSelectItems(q: String, items: Seq[String]): String = {
    if (items.isEmpty) return q
    val m = """(?is)^(\s*SELECT\s+(?:DISTINCT\s+)?)(.*)$""".r.findFirstMatchIn(q)
      .getOrElse(return q)
    // find end of select list = top-level FROM
    val selBody = m.group(2)
    val fromAt = topLevelKw(selBody, Seq("from"))
    if (fromAt < 0) return q
    m.group(1) + selBody.substring(0, fromAt).trim + ", " + items.mkString(", ") +
      " " + selBody.substring(fromAt)
  }

  private def hasAggFn(t: String): Boolean =
    """(?i)\b(count|sum|avg|min|max|first|last|stddev|stddev_samp|variance|var_samp|ksum|nsum|vwap|haversine_dist|string_agg|string_distinct_agg|mode)\s*\(""".r
      .findFirstIn(blankQuoted(t)).isDefined

  private def hasBareItems(q: String): Boolean = {
    val m = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?(.*?)\s+FROM\s""".r
      .findFirstMatchIn(q).getOrElse(return false)
    QuestSql.splitSelect(m.group(1)).exists { it =>
      val t = it.trim
      t.matches("""[\w.`"]+(\s+(?i:AS\s+)?[\w`"]+)?""") && !hasAggFn(t) &&
        !t.matches("""(?i)(\d+|null|true|false)(\s+.*)?""") &&
        !t.endsWith("*")
    }
  }

  /** Bare (non-aggregate) select-item expressions of a query — the
    * implicit group keys under reference auto-grouping. */
  private def bareItemExprs(q: String): Seq[String] = {
    val m = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?(.*?)\s+FROM\s""".r
      .findFirstMatchIn(q).getOrElse(return Nil)
    QuestSql.splitSelect(m.group(1))
      .filterNot(itemHasTopAgg)
      .map(stripAlias)
      .filter(_.trim.nonEmpty)
  }

  private def appendGroupBy(q: String, keys: Seq[String]): String = {
    // before a trailing ORDER BY / LIMIT / HAVING
    val tailAt = Seq("order", "limit", "having")
      .map(k => topLevelKw(q, Seq(k))).filter(_ >= 0).sorted.headOption
    val clause = s" GROUP BY ${keys.mkString(", ")} "
    tailAt match {
      case Some(p) => q.substring(0, p) + clause + q.substring(p)
      case None => q + clause
    }
  }

  private def appendToGroupBy(q: String, keys: Seq[String]): String = {
    val at = topLevelKw(q, Seq("group"))
    if (at < 0) return q
    val byM = """(?is)^group\s+by\s+""".r.findFirstMatchIn(q.substring(at)).get
    val insertAt = at + byM.end
    q.substring(0, insertAt) + keys.mkString(", ") + ", " + q.substring(insertAt)
  }

  /** Names of count-aggregate output columns in a body select list. */
  private def countItemNames(body: String): Seq[String] = {
    val m = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?(.*?)\s+FROM\s""".r
      .findFirstMatchIn(body).getOrElse(return Nil)
    QuestSql.splitSelect(m.group(1)).flatMap { it =>
      if ("""(?i)^\s*count\s*\(""".r.findFirstIn(it).isDefined) {
        val n = itemName(it)
        if (n.nonEmpty) Some(n) else Some("count")
      } else None
    }
  }

  /** Replace `alias.col` (and, where unambiguous, bare `col`) references
    * OUTSIDE the span [skipLo, skipHi) with coalesce(alias.col, 0). */
  private def coalesceRefs(s: String, alias: String, cols: Seq[String],
                           skipLo: Int, skipHi: Int): String = {
    if (cols.isEmpty || alias.isEmpty) return s
    var out = s
    for (c <- cols) {
      val cPat = if (c.startsWith("`")) java.util.regex.Pattern.quote(c)
        else java.util.regex.Pattern.quote(c) + "\\b"
      val pat = java.util.regex.Pattern.compile(
        s"(?<![\\w.`])${java.util.regex.Pattern.quote(alias)}\\.$cPat(?!\\s*\\()")
      val m = pat.matcher(out)
      val sb = new StringBuilder
      var last = 0
      while (m.find()) {
        // skip the join clause itself and anything already coalesced
        val before = out.substring(math.max(0, m.start() - 12), m.start())
        if ((m.start() < skipLo || m.start() >= skipHi) &&
            !before.toLowerCase.contains("coalesce(")) {
          sb.append(out.substring(last, m.start()))
          // a bare select item keeps its output name
          val after = out.substring(m.end()).dropWhile(_.isWhitespace)
          val isItemEnd = after.startsWith(",") ||
            """(?i)^from\b""".r.findFirstIn(after).isDefined
          val pre = out.substring(0, m.start()).toLowerCase
          val inSelList = Seq("select").map(pre.lastIndexOf).max >
            Seq(" from ", "\nfrom ", "where ", "order by", "group by")
              .map(pre.lastIndexOf).max
          val aliasTail =
            if (isItemEnd && inSelList && !before.toLowerCase.trim.endsWith("as")) s" AS $c"
            else ""
          sb.append(s"coalesce(${m.group()}, 0)$aliasTail")
          last = m.end()
        }
      }
      sb.append(out.substring(last))
      out = sb.toString
    }
    out
  }

  // ---- body-local parity fixes -----------------------------------------

  private def bodyParityFix(s: String, sp: Span, body: String,
                            bodyDefined: Set[String],
                            outerRefs: Seq[(String, String)],
                            colsOf: String => Option[Seq[String]]): Option[String] = {
    if (outerRefs.isEmpty) return None
    val outerAliases = outerRefs.map(_._1.toLowerCase).toSet

    def isPureOuter(e: String): Boolean = {
      val qs = qualifiedRefs(e)
      qs.nonEmpty && qs.forall { case (q, _) => outerAliases(q.toLowerCase) } && {
        // no body-local unqualified identifiers
        val cleaned = blankQuoted(e)
        val unqual = """\b[A-Za-z_]\w*\b""".r.findAllMatchIn(cleaned)
          .filterNot(m => reserved(m.group(0).toLowerCase))
          .filterNot(m => m.start > 0 && cleaned.charAt(m.start - 1) == '.')
          .filterNot(m => m.end < cleaned.length &&
            (cleaned.charAt(m.end) == '.' ||
              cleaned.substring(m.end).dropWhile(_ == ' ').startsWith("(")))
          .map(_.group(0).toLowerCase).toSet
        (unqual -- outerAliases).isEmpty
      }
    }

    // F1: GROUP BY items that are pure outer refs (constant per
    // invocation) are pruned; an emptied GROUP BY under an inner join
    // becomes HAVING count(*) > 0 (reference drops empty groups)
    val gAt = topLevelKw(body, Seq("group"))
    if (gAt >= 0) {
      val byM = """(?is)^group\s+by\s+""".r.findFirstMatchIn(body.substring(gAt))
      if (byM.isDefined) {
        val listStart = gAt + byM.get.end
        val listEnd = listStart + {
          val t = body.substring(listStart)
          val stops = Seq("order", "limit", "having")
          val p = stops.map(k => topLevelKw(t, Seq(k))).filter(_ >= 0).sorted.headOption
          p.getOrElse(t.length)
        }
        val items = QuestSql.splitSelect(body.substring(listStart, listEnd))
        val (outer, local) = items.partition(isPureOuter)
        if (outer.nonEmpty) {
          val newBody =
            if (local.nonEmpty)
              body.substring(0, listStart) + local.mkString(", ") + " " +
                body.substring(listEnd)
            else {
              val noGroup = body.substring(0, gAt) + body.substring(listEnd)
              if (!sp.joinKind.startsWith("left") &&
                  topLevelKw(noGroup, Seq("having")) < 0) addHaving(noGroup)
              else noGroup
            }
          return Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi))
        }
      }
    }

    // F2: PARTITION BY items that are pure outer refs are pruned
    val pbPat = java.util.regex.Pattern.compile("(?is)\\bPARTITION\\s+BY\\s+")
    val pbM = pbPat.matcher(body)
    while (pbM.find()) {
      val listStart = pbM.end()
      val t = body.substring(listStart)
      val stops = Seq("order", "range", "rows", "groups")
      val listLen = {
        var depth = 0; var i = 0; var end = -1
        val lower = blankQuoted(t).toLowerCase
        while (i < lower.length && end < 0) {
          lower.charAt(i) match {
            case '(' => depth += 1
            case ')' => if (depth == 0) end = i else depth -= 1
            case _ =>
              if (depth == 0 && stops.exists(k => lower.startsWith(k, i) &&
                (i == 0 || (!lower.charAt(i - 1).isLetterOrDigit && lower.charAt(i - 1) != '_')) &&
                (i + k.length >= lower.length ||
                  (!lower.charAt(i + k.length).isLetterOrDigit && lower.charAt(i + k.length) != '_'))))
                end = i
          }
          i += 1
        }
        if (end < 0) lower.length else end
      }
      val items = QuestSql.splitSelect(t.substring(0, listLen))
      val (outer, local) = items.partition(isPureOuter)
      if (outer.nonEmpty) {
        val replacement =
          if (local.nonEmpty) "PARTITION BY " + local.mkString(", ") + " "
          else ""
        val newBody = body.substring(0, pbM.start()) + replacement +
          t.substring(listLen)
        return Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi))
      }
    }

    // F3: pure-outer select items hoist to the enclosing query
    val selM = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?""".r.findFirstMatchIn(body)
    if (selM.isDefined && topLevelKw(body, Seq("union", "intersect", "except")) < 0) {
      val selStart = selM.get.end
      val fromAt = selStart + topLevelKw(body.substring(selStart), Seq("from"))
      if (fromAt > selStart) {
        val items = QuestSql.splitSelect(body.substring(selStart, fromAt))
        val hoisted = items.filter(it => isPureOuter(stripAlias(it)))
        if (hoisted.nonEmpty && hoisted.size < items.size && sp.alias.nonEmpty) {
          val kept = items.filterNot(hoisted.contains)
          val newBody = body.substring(0, selStart) + kept.mkString(", ") +
            " " + body.substring(fromAt)
          var out = s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi)
          // outside the body, alias.<name> → the hoisted outer expression
          val shift = newBody.length - body.length
          for (h <- hoisted) {
            val n = itemName(h)
            if (n.nonEmpty) {
              val expr = stripAlias(h)
              val repl = if (h.trim == expr.trim) expr else s"$expr AS $n"
              val pat = java.util.regex.Pattern.compile(
                s"\\b${java.util.regex.Pattern.quote(sp.alias)}\\." +
                  java.util.regex.Pattern.quote(n) + "\\b")
              val mm = pat.matcher(out)
              val sb = new StringBuilder; var last = 0
              while (mm.find()) {
                if (mm.start() < sp.bodyLo || mm.start() > sp.bodyHi + shift) {
                  sb.append(out.substring(last, mm.start()))
                  // in the select list keep the alias name; elsewhere
                  // (ORDER BY / WHERE) the bare expression suffices
                  val inSel = mm.start() < sp.joinStart &&
                    out.substring(0, mm.start()).toLowerCase.lastIndexOf("select") >
                      out.substring(0, mm.start()).toLowerCase.lastIndexOf("from")
                  sb.append(if (inSel) repl else expr)
                  last = mm.end()
                }
              }
              sb.append(out.substring(last))
              out = sb.toString
            }
          }
          return Some(out)
        }
      }
    }

    // F4: correlated LIMIT → row_number window filtered in WHERE
    val limAt = topLevelKw(body, Seq("limit"))
    if (limAt >= 0) {
      val limExpr = body.substring(limAt + 5).trim
      val corrLim = qualifiedRefs(limExpr)
        .exists { case (q, _) => outerAliases(q.toLowerCase) }
      if (corrLim) {
        val core = body.substring(0, limAt).trim
        val obAt = topLevelKw(core, Seq("order"))
        var (base, ordKey) =
          if (obAt >= 0) {
            val byM = """(?is)^order\s+by\s+""".r.findFirstMatchIn(core.substring(obAt)).get
            (core.substring(0, obAt).trim, core.substring(obAt + byM.end).trim)
          } else (core, firstItemOrdinal(core))
        // the window sits ABOVE the base projection: remap order keys
        // spelled as source expressions to their output names
        val remapM = """(?is)^\s*SELECT\s+(?:DISTINCT\s+)?(.*?)\s+FROM\s""".r
          .findFirstMatchIn(base)
        remapM.foreach { mm =>
          QuestSql.splitSelect(mm.group(1)).foreach { it =>
            val n = itemName(it)
            val e = stripAlias(it).trim
            if (n.nonEmpty && e != n && ordKey.contains(e))
              ordKey = ordKey.replace(e, n)
          }
        }
        val names = outputNames(base)
        val sel = if (names.nonEmpty) names.mkString(", ") else "* EXCEPT (__graft_rn)"
        // `LIMIT lo, hi` returns rows lo+1..hi (reference LIMIT range)
        val commaAt = {
          val cleaned = blankQuoted(limExpr)
          var depth = 0; var at = -1; var i = 0
          while (i < cleaned.length && at < 0) {
            cleaned.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case ',' if depth == 0 => at = i
              case _ =>
            }
            i += 1
          }
          at
        }
        val rnCond =
          if (commaAt >= 0)
            s"__graft_rn > (${limExpr.substring(0, commaAt).trim}) AND " +
              s"__graft_rn <= (${limExpr.substring(commaAt + 1).trim})"
          else s"__graft_rn <= ($limExpr)"
        val newBody = s"SELECT $sel FROM (SELECT *, row_number() OVER " +
          s"(ORDER BY $ordKey) AS __graft_rn FROM ($base)) __graft_lim " +
          s"WHERE $rnCond ORDER BY __graft_rn"
        return Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi))
      }
    }

    // F5: ORDER BY with outer refs in the body → hoist to the main query
    // (lateral output order is outer-major; the main query here has no
    // ORDER BY of its own)
    val obAt = topLevelKw(body, Seq("order"))
    if (obAt >= 0 && topLevelKw(s, Seq("order")) < 0 && sp.alias.nonEmpty) {
      val byM = """(?is)^order\s+by\s+""".r.findFirstMatchIn(body.substring(obAt))
      if (byM.isDefined) {
        val keyTxt = body.substring(obAt + byM.get.end).trim
        val corr = qualifiedRefs(keyTxt).exists { case (q, _) => outerAliases(q.toLowerCase) }
        if (corr) {
          // qualify bare body-output names with the lateral alias
          val names = outputNames(body).map(_.stripPrefix("`").stripSuffix("`"))
          var mainKey = keyTxt
          for (n <- names)
            mainKey = mainKey.replaceAll(s"(?<![.\\w`])${java.util.regex.Pattern.quote(n)}\\b",
              s"${sp.alias}.$n")
          // order the outer side by the correlation keys first
          val outerKeys = outerRefs.filter { case (q, _) =>
            qualifiedRefs(keyTxt).exists(_._1.toLowerCase == q.toLowerCase) }
            .map { case (q, c) => s"$q.$c" }.distinct
          val newBody = body.substring(0, obAt).trim
          val outKeys = (outerKeys :+ mainKey).mkString(", ")
          return Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi) +
            s" ORDER BY $outKeys")
        }
      }
    }

    // F6: scalar-aggregate bodies — reference drops the empty group under
    // explicit inner joins (CROSS keeps the empty-count row, per
    // LateralJoinTest nested forms), and nulls literal items when empty
    if (topLevelAgg(body) && topLevelKw(body, Seq("group")) < 0 &&
        !hasBareItems(body) && topLevelKw(body, Seq("union", "intersect", "except")) < 0) {
      val selM2 = """(?is)^(\s*SELECT\s+(?:DISTINCT\s+)?)(.*?)(\s+FROM\s)""".r
        .findFirstMatchIn(body)
      if (selM2.isDefined) {
        val items = QuestSql.splitSelect(selM2.get.group(2))
        val litItems = items.filter { it =>
          val e = stripAlias(it).trim
          e.matches("""(?i)(-?\d+(\.\d+)?|'[^']*'|null|true|false)""")
        }
        val needHaving = (sp.joinKind == "join" || sp.joinKind == "inner join") &&
          topLevelKw(body, Seq("having")) < 0 &&
          topLevelKw(body, Seq("limit")) < 0
        if (litItems.nonEmpty || needHaving) {
          var newItems = items.map { it =>
            if (litItems.contains(it)) {
              val n = itemName(it)
              val e = stripAlias(it)
              s"max($e)" + (if (n.nonEmpty) s" AS $n" else "")
            } else it
          }
          var newBody = selM2.get.group(1) + newItems.mkString(", ") +
            body.substring(selM2.get.start(3))
          if (needHaving) newBody = addHaving(newBody)
          if (newBody != body)
            return Some(s.substring(0, sp.bodyLo) + newBody + s.substring(sp.bodyHi))
        }
      }
    }

    // F7: LEFT-joined auto-grouped aggregate bodies — count columns read
    // 0 when the invocation matched nothing (reference count-driver).
    // Scalar aggregates (no bare items, no GROUP BY) already emit 0
    // naturally — and must NOT be coalesced, because a genuinely empty
    // body (e.g. LIMIT 0) left-pads a real null in the reference too.
    // (explicit GROUP BY keeps SQL semantics — empty group left-pads a
    // real null in the reference too; only auto-grouped mixed bodies
    // take the count driver)
    if (sp.joinKind.startsWith("left") && topLevelAgg(body) && sp.alias.nonEmpty &&
        hasBareItems(body) && topLevelKw(body, Seq("group")) < 0 &&
        topLevelKw(body, Seq("limit")) < 0) {
      val countCols = countItemNames(body)
      if (countCols.nonEmpty) {
        val out = coalesceRefs(s, sp.alias, countCols, sp.joinStart, sp.end)
        // bare references too (main select without qualifier), only when
        // they resolve uniquely to this body
        var out2 = out
        for (c <- countCols; if !c.startsWith("`")) {
          val pat = java.util.regex.Pattern.compile(s"(?<![.\\w`])${java.util.regex.Pattern.quote(c)}\\b(?!\\s*\\()(?!\\s*,?\\s*`)")
          val mm = pat.matcher(out2)
          val sb = new StringBuilder; var last = 0
          while (mm.find()) {
            val before = out2.substring(math.max(0, mm.start() - 12), mm.start())
            if ((mm.start() < sp.joinStart || mm.start() > sp.end + (out.length - s.length)) &&
                !before.toLowerCase.contains("coalesce(") &&
                !before.trim.toLowerCase.endsWith("as")) {
              sb.append(out2.substring(last, mm.start()))
              // a bare select item keeps its output name (the reference
              // renders column `c`, not `coalesce(c, 0)`)
              val after = out2.substring(mm.end()).dropWhile(_.isWhitespace)
              val isItemEnd = after.startsWith(",") ||
                """(?i)^from\b""".r.findFirstIn(after).isDefined
              val pre = out2.substring(0, mm.start()).toLowerCase
              val inSelList = pre.lastIndexOf("select") >
                Seq(" from ", "\nfrom ", "where ", "order by", "group by")
                  .map(pre.lastIndexOf).max
              val aliasTail = if (isItemEnd && inSelList) s" AS ${mm.group()}" else ""
              sb.append(s"coalesce(${mm.group()}, 0)$aliasTail")
              last = mm.end()
            }
          }
          sb.append(out2.substring(last))
          out2 = sb.toString
        }
        if (out2 != s) return Some(out2)
      }
    }

    None
  }

  private def addHaving(q: String): String = {
    val tailAt = Seq("order", "limit")
      .map(k => topLevelKw(q, Seq(k))).filter(_ >= 0).sorted.headOption
    val clause = " HAVING count(*) > 0 "
    tailAt match {
      case Some(p) => q.substring(0, p) + clause + q.substring(p)
      case None => q + clause
    }
  }

  private def stripAlias(item: String): String = {
    val asM = """(?is)^(.*?)\s+AS\s+(`[^`]+`|\w+)\s*$""".r.findFirstMatchIn(item)
    asM.map(_.group(1)).getOrElse {
      // bare trailing alias: `o.category cat`
      val bm = """(?is)^([\w.`]+)\s+(`[^`]+`|[A-Za-z_]\w*)\s*$""".r.findFirstMatchIn(item)
      bm.filter(b => !reserved(b.group(2).toLowerCase)).map(_.group(1)).getOrElse(item)
    }
  }

  private def firstItemOrdinal(q: String): String = "1"
}
