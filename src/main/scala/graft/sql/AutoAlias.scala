package graft.sql

/** Reference-style auto-naming of unaliased select items (reference
  * `griffin/SqlUtil.java createColumnAlias` + `SqlParser`): an unaliased
  * expression column is named after the root token of its expression —
  * the function name for a call (`abs(x)` → `abs`, `count()` → `count`),
  * `cast` for CAST/`::`, `case` for CASE, the literal itself for an
  * integer constant or identifier-clean string constant — and any
  * expression whose root is an operator (`a+b`, `x = y`, unary minus,
  * subscripts) is named `column`. Duplicate base names get a numeric
  * suffix starting at 1 (`column`, `column1`, …; `key`, `key1`), with
  * explicitly aliased columns pre-claiming their names.
  *
  * Spark would otherwise name these columns by their full expression
  * text (`(6 & 4)`), so the pass rewrites every select list to append
  * explicit `AS` aliases that reproduce the reference result-set
  * metadata byte for byte.
  */
object AutoAlias {

  /** Keywords after which a trailing identifier is NOT an implicit alias
    * (the expression is incomplete without more tokens). */
  private val ContinuationKw = Set(
    "and", "or", "not", "in", "is", "like", "ilike", "between", "within",
    "escape", "select", "distinct", "case", "when", "then", "else", "as",
    "all", "any", "some", "by", "from", "where", "over", "exists")

  /** Tokens that can legitimately end an expression but are never an
    * implicit alias themselves. */
  private val NotAliasTokens = Set(
    "end", "null", "true", "false", "preceding", "following", "nulls",
    "unbounded")
  // alias-legal words that only act as syntax after a specific
  // predecessor (`nulls FIRST/LAST`, `current ROW`) — `arr[1] first`
  // is a valid implicit alias (reference ArrayTest)
  private val ContextualNotAlias = Map(
    "first" -> "nulls", "last" -> "nulls", "row" -> "current")

  private val StatementStart = Set(
    "create", "insert", "update", "alter", "drop", "rename", "truncate",
    "copy", "show", "declare", "explain", "vacuum", "begin", "commit",
    "rollback", "set", "grant", "revoke", "backup", "checkpoint", "deallocate")

  def rewriteQuery(q: String): String = {
    // DDL wrapping a select still benefits (CTAS column naming), but
    // UPDATE/SET lists must not be touched; only process regions that
    // follow a SELECT keyword, which the scanner guarantees.
    var out = q
    var pass = 0
    var idx = processOne(out, 0)
    while (idx._1 != null && pass < 64) {
      out = idx._1
      pass += 1
      idx = processOne(out, idx._2)
    }
    out
  }

  /** Find the next select list at or after `fromPos`, rewrite it, and
    * return (newQuery or null when none, resumePos). Processing resumes
    * AFTER the rewritten list so nested selects inside item expressions
    * are handled on later iterations (they start after the outer list's
    * start, and item rewriting only appends aliases, never reorders). */
  private def processOne(q: String, fromPos: Int): (String, Int) = {
    val span = nextSelectSpan(q, fromPos)
    span match {
      case None => (null, q.length)
      case Some((lo, hi)) =>
        val (newList, changed) = rewriteList(q.substring(lo, hi))
        if (!changed) (q, hi)
        else {
          val nq = q.substring(0, lo) + newList + q.substring(hi)
          (nq, lo + newList.length)
        }
    }
  }

  /** Span (start, end) of the select list following the next `select`
    * keyword at or after `from`, or None. */
  private def nextSelectSpan(q: String, from: Int): Option[(Int, Int)] = {
    val lower = q.toLowerCase
    var i = from
    while (i < lower.length) {
      i = indexOfToken(lower, "select", i)
      if (i < 0) return None
      var lo = i + 6
      // skip DISTINCT / ALL qualifier tokens
      var m = skipWs(q, lo)
      val afterKw = matchWord(lower, m)
      if (afterKw == "distinct" || afterKw == "all") {
        val nx = skipWs(q, m + afterKw.length)
        // `distinct(x)` keeps the paren expr as the item
        m = m + afterKw.length
      }
      lo = m
      // find end: depth-0 terminator keyword or unbalanced ')'
      var j = lo
      var depth = 0
      var end = -1
      while (j < q.length && end < 0) {
        q.charAt(j) match {
          case '\'' => j = skipString(q, j)
          case '"' => j = skipQuoted(q, j, '"')
          case '`' => j = skipQuoted(q, j, '`')
          case '(' => depth += 1; j += 1
          case ')' => if (depth == 0) end = j else { depth -= 1; j += 1 }
          case '[' => depth += 1; j += 1
          case ']' => if (depth == 0) end = j else { depth -= 1; j += 1 }
          case c if depth == 0 && Character.isLetter(c) &&
              (j == 0 || !isIdentChar(q.charAt(j - 1))) =>
            val w = matchWord(lower, j)
            if (Terminators(w)) end = j else j += w.length.max(1)
          case _ => j += 1
        }
      }
      if (end < 0) end = q.length
      if (end > lo) return Some((lo, end))
      i = i + 6
    }
    None
  }

  private val Terminators = Set(
    "from", "where", "group", "order", "limit", "union", "except",
    "intersect", "sample", "latest", "having", "window", "qualify")

  /** Rewrite one select list; returns (text, changed). */
  private def rewriteList(list: String): (String, Boolean) = {
    val items = splitTopLevel(list)
    if (items.isEmpty) return (list, false)
    case class Item(text: String, explicitAlias: Option[String],
                    bareRef: Option[String], autoBase: Option[String])
    val parsed = items.map { raw =>
      val t = raw.trim
      // generator functions emit multiple columns — a single AS alias
      // would be an arity mismatch (UDTF_ALIAS_NUMBER_MISMATCH)
      val generator = """(?is)^(inline|inline_outer|posexplode|posexplode_outer|stack|json_tuple)\s*\(""".r
        .findFirstIn(t).isDefined
      if (t.isEmpty || t == "*" || t.endsWith(".*") || generator)
        Item(raw, None, None, None)
      else explicitAliasOf(t) match {
        case Some(a) => Item(raw, Some(a), None, None)
        case None =>
          bareRefName(unwrapParens(t)) match {
            case Some(n) => Item(raw, None, Some(n), None)
            case None => Item(raw, None, None, Some(baseNameOf(t)))
          }
      }
    }
    val claimed = scala.collection.mutable.Set[String]()
    parsed.foreach(_.explicitAlias.foreach(a => claimed += a.toLowerCase))
    val seq = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    var changed = false
    def withAlias(raw: String, alias: String): String = {
      val tail = raw.length - raw.reverseIterator.takeWhile(_.isWhitespace).length
      raw.substring(0, tail) + " AS " + quoteIfNeeded(alias) + raw.substring(tail)
    }
    val outItems = parsed.map { it =>
      (it.bareRef, it.autoBase) match {
        case (Some(n), _) =>
          if (!claimed.contains(n.toLowerCase)) { claimed += n.toLowerCase; it.text }
          else {
            changed = true
            withAlias(it.text, nextFree(n, claimed, seq))
          }
        case (_, Some(base)) =>
          changed = true
          withAlias(it.text, nextFree(base, claimed, seq))
        case _ => it.text
      }
    }
    (outItems.mkString(","), changed)
  }

  private def nextFree(base: String, claimed: scala.collection.mutable.Set[String],
                       seq: scala.collection.mutable.Map[String, Int]): String = {
    val key = base.toLowerCase
    var n = seq(key)
    var cand = if (n == 0) base else base + n
    while (claimed.contains(cand.toLowerCase)) {
      n += 1
      cand = base + n
    }
    seq(key) = n + 1
    claimed += cand.toLowerCase
    cand
  }

  private def quoteIfNeeded(name: String): String =
    "`" + name.replace("`", "") + "`" // always quote: names like `case` or `1` must survive Spark's parser

  // ---- item classification --------------------------------------------------

  /** Explicit `AS alias`, or implicit trailing-identifier alias. */
  private[sql] def explicitAliasOf(item: String): Option[String] = {
    val toks = tokenize(item)
    if (toks.length < 2) return None
    val last = toks.last
    if (!isIdentTok(last) && !isQuotedIdent(last)) return None
    val lastLower = last.toLowerCase
    if (NotAliasTokens(lastLower) || ContinuationKw(lastLower)) return None
    val prev = toks(toks.length - 2)
    val prevLower = prev.toLowerCase
    if (ContextualNotAlias.get(lastLower).contains(prevLower)) return None
    // `expr AS alias`
    if (prevLower == "as") return Some(stripIdentQuotes(last))
    // implicit alias: the expression before it must be complete
    val complete =
      prev == ")" || prev == "]" || prev.startsWith("'") ||
        prev.head.isDigit ||
        (isIdentTok(prev) && !ContinuationKw(prevLower)) ||
        isQuotedIdent(prev)
    if (complete) Some(stripIdentQuotes(last)) else None
  }

  /** A bare (possibly dotted / quoted) column reference → its display
    * name; None when the item is an expression. */
  private def bareRefName(item: String): Option[String] = {
    val t = item.trim
    if (t.matches("[A-Za-z_][\\w$]*(\\.[A-Za-z_][\\w$]*)*")) {
      val name = t.substring(t.lastIndexOf('.') + 1)
      if (ContinuationKw(name.toLowerCase) || NotAliasTokens(name.toLowerCase)) None
      else Some(name)
    } else if (t.matches("\"[^\"]+\"") || t.matches("`[^`]+`")) {
      Some(t.substring(1, t.length - 1))
    } else if (t.matches("(?:[A-Za-z_][\\w$]*|`[^`]+`)(?:\\.(?:[A-Za-z_][\\w$]*|`[^`]+`))+")) {
      // dotted ref with backtick-quoted segments (u.`select`, u.`a.b`) —
      // split on the last dot OUTSIDE backticks
      var i = 0; var lastDot = -1
      while (i < t.length) t.charAt(i) match {
        case '`' => i = t.indexOf('`', i + 1) + 1
        case '.' => lastDot = i; i += 1
        case _ => i += 1
      }
      Some(t.substring(lastDot + 1).stripPrefix("`").stripSuffix("`"))
    } else None
  }

  private def unwrapParens(t0: String): String = {
    var e = t0.trim
    while (e.startsWith("(") && balancedToEnd(e) &&
        !e.substring(1, e.length - 1).trim.toLowerCase.startsWith("select"))
      e = e.substring(1, e.length - 1).trim
    e
  }

  /** Reference base name of an expression item (operators → column,
    * function → its name, cast/:: → cast, case → case, int literal →
    * itself, clean string literal → its content). */
  private[sql] def baseNameOf(item0: String): String = {
    var e = item0.trim
    if (e.startsWith("(") && balancedToEnd(e) &&
        e.substring(1, e.length - 1).trim.toLowerCase.startsWith("select"))
      return "column"
    e = unwrapParens(e)
    // IGNORE NULLS joins the default name (reference SqlParser:
    // `first_value(x) ignore nulls` → first_value_ignore_nulls)
    val ignoreNulls = """(?i)\bignore\s+nulls\b""".r.findFirstIn(e).isDefined
    // strip window / nulls-mode postfixes
    e = stripPostfix(e)
    if (ignoreNulls) {
      val fnHead = """(?s)^([A-Za-z_][\w$]*)\s*\(.*\)""".r
      stripPostfix(e) match {
        case s if fnHead.findPrefixMatchOf(s).isDefined =>
          return fnHead.findPrefixMatchOf(s).get.group(1) + "_ignore_nulls"
        case _ =>
      }
    }
    // mask generic type args (ARRAY<double>) so '<'/'>' don't read as ops
    e = e.replaceAll("(?i)\\bARRAY\\s*<[^<>]*(?:<[^<>]*>)?[^<>]*>", "ARRAYT")
    val lower = e.toLowerCase
    if (lower.startsWith("case") && (e.length == 4 || !isIdentChar(e.charAt(4)))) {
      // the reference rewrites CASE whose WHEN branches are equality
      // tests over one common expression into its switch() function
      // (SqlOptimiser rewriteCase) — the unaliased column is then named
      // 'switch'; a general CASE stays 'case'
      val whens = """(?is)\bWHEN\s+(.+?)\s+THEN\b""".r
        .findAllMatchIn(e).map(_.group(1).trim).toList
      val eqLhs = whens.flatMap { w =>
        """(?s)^([\w.]+)\s*=\s*[^=<>].*$""".r.findFirstMatchIn(w).map(_.group(1))
      }
      return if (whens.nonEmpty && eqLhs.size == whens.size && eqLhs.distinct.size == 1)
        "switch" else "case"
    }
    val (hasOp, hasCastOp) = topLevelOps(e)
    if (hasOp) return "column"
    if (hasCastOp) return "cast"
    // function call covering the whole item
    val fn = """(?s)^([A-Za-z_][\w$]*)\s*\(.*\)$""".r
    e match {
      case fn(name) if balancedFromFirstParen(e) =>
        return if (name.equalsIgnoreCase("cast") || name == "__ts_us_cast" ||
            name == "__ns_at_tz" || name == "__ns_cast") "cast"
          // subscripts/slices were already lowered — the reference names
          // the `a[i]` AST node "[]"
          else if (name.equalsIgnoreCase("slice") || name.equalsIgnoreCase("try_element_at")) "[]"
          // sentinel for rewritten operator expressions (ipv4 arithmetic)
          else if (name == "__graft_col") "column"
          // sentinels from the array lowering: ARRAY[..] literals keep
          // the reference's 'ARRAY' node name, multi-dim slices '[]'
          else if (name == "__graft_arr") "ARRAY"
          else if (name == "__graft_slice") "[]"
          else name
      case _ =>
    }
    if (e.matches("\\d+")) return e
    if (e.matches("'(?:[^']|'')*'")) {
      val content = e.substring(1, e.length - 1).replace("''", "'")
      return if (content.matches("[A-Za-z_][A-Za-z0-9_]*")) content else "column"
    }
    if (lower == "true" || lower == "false" || lower == "null") return lower
    "column"
  }

  /** (hasNonCastOperator, hasCastOperator) at paren depth 0. */
  private def topLevelOps(e: String): (Boolean, Boolean) = {
    var i = 0
    var depth = 0
    var hasOp = false
    var hasCast = false
    var prevSig = ' ' // last significant char seen at any depth
    while (i < e.length && !hasOp) {
      val c = e.charAt(i)
      if (c == '\'') { i = skipString(e, i); prevSig = '\'' }
      else if (c == '"') { i = skipQuoted(e, i, '"'); prevSig = '"' }
      else if (c == '`') { i = skipQuoted(e, i, '`'); prevSig = '`' }
      else if (c == '(') { depth += 1; i += 1; prevSig = '(' }
      else if (c == ')') { depth -= 1; i += 1; prevSig = ')' }
      else if (c == '[') {
        // subscript only when attached to a value (ident, ')' or ']')
        if (depth == 0 && (isIdentChar(prevSig) || prevSig == ')' || prevSig == ']' || prevSig == '\''))
          hasOp = true
        depth += 1; i += 1; prevSig = '['
      }
      else if (c == ']') { depth -= 1; i += 1; prevSig = ']' }
      else if (depth > 0) { if (!c.isWhitespace) prevSig = c; i += 1 }
      else if (c == ':' && i + 1 < e.length && e.charAt(i + 1) == ':') {
        hasCast = true; i += 2; prevSig = ':'
      }
      else if ("+-*/%&|^~=<>!".indexOf(c) >= 0) {
        // '-' / '+' inside a scientific-notation literal is not an operator
        val sci = (c == '-' || c == '+') && i > 0 &&
          (e.charAt(i - 1) == 'e' || e.charAt(i - 1) == 'E') &&
          i >= 2 && e.charAt(i - 2).isDigit
        if (!sci) hasOp = true else { i += 1; prevSig = c }
      }
      else if (Character.isLetter(c) && (i == 0 || !isIdentChar(e.charAt(i - 1)))) {
        val w = matchWord(e.toLowerCase, i)
        if (WordOps(w)) hasOp = true
        else { i += w.length.max(1); prevSig = e.charAt(i - 1) }
      }
      else { if (!c.isWhitespace) prevSig = c; i += 1 }
    }
    (hasOp, hasCast)
  }

  private val WordOps = Set("and", "or", "not", "in", "is", "like", "ilike",
    "between", "within")

  // ---- low-level text utilities --------------------------------------------

  private def firstWord(q: String): String = {
    val t = q.trim
    val i = t.indexWhere(!isIdentChar(_))
    (if (i < 0) t else t.substring(0, i)).toLowerCase
  }

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || c == '$'

  private def isIdentTok(t: String): Boolean =
    t.nonEmpty && t.matches("[A-Za-z_][\\w$]*")

  private def isQuotedIdent(t: String): Boolean =
    (t.startsWith("\"") && t.endsWith("\"") && t.length > 1) ||
      (t.startsWith("`") && t.endsWith("`") && t.length > 1)

  private def stripIdentQuotes(t: String): String =
    if (isQuotedIdent(t)) t.substring(1, t.length - 1) else t

  private def skipWs(q: String, i0: Int): Int = {
    var i = i0
    while (i < q.length && q.charAt(i).isWhitespace) i += 1
    i
  }

  private def matchWord(lower: String, i: Int): String = {
    var j = i
    while (j < lower.length && isIdentChar(lower.charAt(j))) j += 1
    lower.substring(i, j)
  }

  /** Index of keyword `kw` as a whole word outside strings, or -1. */
  private def indexOfToken(lower: String, kw: String, from: Int): Int = {
    var i = from
    while (i < lower.length) {
      lower.charAt(i) match {
        case '\'' => i = skipString(lower, i)
        case '"' => i = skipQuoted(lower, i, '"')
        case '`' => i = skipQuoted(lower, i, '`')
        case _ =>
          if (lower.startsWith(kw, i) &&
              (i == 0 || !isIdentChar(lower.charAt(i - 1))) &&
              (i + kw.length >= lower.length || !isIdentChar(lower.charAt(i + kw.length))))
            return i
          i += 1
      }
    }
    -1
  }

  private def skipString(q: String, i: Int): Int = {
    var j = i + 1
    while (j < q.length) {
      if (q.charAt(j) == '\'') {
        if (j + 1 < q.length && q.charAt(j + 1) == '\'') j += 2 else return j + 1
      } else j += 1
    }
    q.length
  }

  private def skipQuoted(q: String, i: Int, quote: Char): Int = {
    var j = i + 1
    while (j < q.length && q.charAt(j) != quote) j += 1
    math.min(j + 1, q.length)
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = skipString(s, i)
        case '"' => i = skipQuoted(s, i, '"')
        case '`' => i = skipQuoted(s, i, '`')
        case '(' | '[' => depth += 1; i += 1
        case ')' | ']' => depth -= 1; i += 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1; i += 1
        case _ => i += 1
      }
    }
    out += s.substring(start)
    out.toSeq
  }

  private def balancedToEnd(e: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < e.length) {
      e.charAt(i) match {
        case '\'' => i = skipString(e, i)
        case '"' => i = skipQuoted(e, i, '"')
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1
          if (depth == 0 && i != e.length - 1) return false
          i += 1
        case _ => i += 1
      }
    }
    depth == 0
  }

  private def balancedFromFirstParen(e: String): Boolean = {
    val p = e.indexOf('(')
    if (p < 0) return false
    var depth = 0
    var i = p
    while (i < e.length) {
      e.charAt(i) match {
        case '\'' => i = skipString(e, i)
        case '"' => i = skipQuoted(e, i, '"')
        case '(' => depth += 1; i += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i == e.length - 1
          i += 1
        case _ => i += 1
      }
    }
    false
  }

  /** Strip trailing `over (...)` and IGNORE/RESPECT NULLS postfixes so
    * the base name comes from the underlying call. */
  private def stripPostfix(e0: String): String = {
    var e = e0.trim
    var changed = true
    while (changed) {
      changed = false
      val lower = e.toLowerCase
      if (lower.endsWith(")")) {
        // trailing OVER ( ... )
        val overIdx = lastTopLevelWord(e, "over")
        if (overIdx >= 0) {
          val after = e.substring(overIdx + 4).trim
          if (after.startsWith("(") && balancedToEnd(after)) {
            e = e.substring(0, overIdx).trim
            changed = true
          }
        }
      } else {
        // trailing OVER <named-window> (bare or double-quoted ident) —
        // reference names `sum(x) OVER w` after the function too
        val overIdx = lastTopLevelWord(e, "over")
        if (overIdx >= 0) {
          val after = e.substring(overIdx + 4).trim
          if (after.matches("[A-Za-z_]\\w*|\"[^\"]+\"|`[^`]+`")) {
            e = e.substring(0, overIdx).trim
            changed = true
          }
        }
      }
      val l2 = e.toLowerCase
      for (suffix <- Seq("ignore nulls", "respect nulls"))
        if (l2.endsWith(suffix)) {
          e = e.substring(0, e.length - suffix.length).trim
          changed = true
        }
    }
    e
  }

  private def lastTopLevelWord(e: String, word: String): Int = {
    val lower = e.toLowerCase
    var i = 0
    var depth = 0
    var found = -1
    while (i < lower.length) {
      lower.charAt(i) match {
        case '\'' => i = skipString(lower, i)
        case '"' => i = skipQuoted(lower, i, '"')
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && lower.startsWith(word, i) &&
              (i == 0 || !isIdentChar(lower.charAt(i - 1))) &&
              (i + word.length >= lower.length || !isIdentChar(lower.charAt(i + word.length))))
            found = i
          i += 1
      }
    }
    found
  }

  private def tokenize(s: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') { val j = skipString(s, i); out += s.substring(i, j); i = j }
      else if (c == '"') { val j = skipQuoted(s, i, '"'); out += s.substring(i, j); i = j }
      else if (c == '`') { val j = skipQuoted(s, i, '`'); out += s.substring(i, j); i = j }
      else if (Character.isLetter(c) || c == '_') {
        var j = i
        while (j < s.length && isIdentChar(s.charAt(j))) j += 1
        out += s.substring(i, j); i = j
      } else if (c.isDigit) {
        var j = i
        while (j < s.length && (isIdentChar(s.charAt(j)) || s.charAt(j) == '.')) j += 1
        out += s.substring(i, j); i = j
      } else if (c == '(' || c == ')' || c == '[' || c == ']' || c == ',') {
        out += c.toString; i += 1
      } else {
        var j = i
        while (j < s.length && "+-*/%&|^~=<>!:.".indexOf(s.charAt(j)) >= 0) j += 1
        if (j == i) j = i + 1
        out += s.substring(i, j); i = j
      }
    }
    out.toVector
  }
}
