#!/usr/bin/env python3
"""Extract (ddl*, query, expected) triples from the reference's JUnit suite.

Builder tooling only (the engine itself is pure Scala/Spark): walks the
reference test tree for fluent `assertQuery("q").ddl("...").returns("...")`
chains whose arguments are compile-time string literals, unescapes them, and
classifies each case:

  tier "exact"  — fully deterministic (no rnd_* / now() / etc.): the Scala
                  runner executes ddls + query through graft.Engine and
                  compares the reference-format printed output exactly.
  tier "run"    — depends on the reference's PRNG or clock: the runner only
                  requires parse + execute (shape checks, no value compare).

Output: one JSON object per line on stdout or the path in argv[1].
Fields: file, line, query, ddls (list), mutate (list), expected,
expected2 (for returns(before, after)), tier.
"""
import json, os, re, sys

ROOT = "/root/reference/core/src/test/java/io/questdb/test"

NONDET = re.compile(r"\brnd_|\bnow\s*\(|\bsystimestamp|\bsysdate|\btoday\s*\(|"
                    r"\byesterday\s*\(|\btomorrow\s*\(|\bsleep\s*\(|"
                    r"\bmemory_metrics|\breader_pool|\bwriter_pool|\bbuild\s*\(\s*\)")

# chain steps whose presence doesn't change what we can check
IGNORABLE = {
    "timestamp", "expectSize", "noLeakCheck", "noRandomAccess",
    "supportsRandomAccess", "inferTimestamp", "inferRandomAccess",
    "noCircuitBreakerCheck", "expectCircuitBreakerChecks", "fullFatJoins",
    "noMemoryUsageCheck", "sizeMayVary", "timestampDesc", "withContext",
    "withEngine", "columnType",
}
TERMINALS = {"returns", "returnsOnce"}
DDLISH = {"ddl"}
MUTATEISH = {"mutateWith"}
# steps that make the case unusable for us
DISQUALIFY = {"plan", "planFragment", "planFragmentAbsent", "fails",
              "failsWith", "returnsRecords", "mutateStepwise", "baseFactory"}


def java_unescape(s):
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "n": out.append("\n"); i += 2
            elif n == "t": out.append("\t"); i += 2
            elif n == "r": out.append("\r"); i += 2
            elif n == "b": out.append("\b"); i += 2
            elif n == "f": out.append("\f"); i += 2
            elif n == "0": out.append("\0"); i += 2
            elif n == "\\": out.append("\\"); i += 2
            elif n == '"': out.append('"'); i += 2
            elif n == "'": out.append("'"); i += 2
            elif n == "u":
                out.append(chr(int(s[i + 2:i + 6], 16))); i += 6
            else:
                out.append(n); i += 2
        else:
            out.append(c); i += 1
    return "".join(out)


def skip_ws_comments(src, i):
    n = len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
        elif src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            break
    return i


def read_text_block(src, i):
    """src[i:i+3] == '\"\"\"'; JLS 3.10.6 text block. Returns (value, next)."""
    j = i + 3
    # content begins after optional ws + the first newline
    while j < len(src) and src[j] in " \t":
        j += 1
    if j < len(src) and src[j] == "\r":
        j += 1
    if j < len(src) and src[j] == "\n":
        j += 1
    # find the closing delimiter, honoring escapes
    k = j
    while k < len(src):
        if src[k] == "\\":
            k += 2
        elif src.startswith('"""', k):
            break
        else:
            k += 1
    else:
        raise ValueError("unterminated text block")
    raw = src[j:k].replace("\r\n", "\n").replace("\r", "\n")
    lines = raw.split("\n")
    # incidental indentation: min indent of non-blank lines and the line
    # holding the closing delimiter
    close_line_start = src.rfind("\n", 0, k) + 1
    close_indent = 0
    while close_line_start + close_indent < k and \
            src[close_line_start + close_indent] in " \t":
        close_indent += 1
    indents = [close_indent]
    for idx, ln in enumerate(lines):
        if ln.strip() == "" and idx == len(lines) - 1:
            continue
        if ln.strip() == "":
            continue
        indents.append(len(ln) - len(ln.lstrip(" \t")))
    strip = min(indents) if indents else 0
    # delimiter on its own line: the final split element is the delimiter
    # line's indent — it contributes no content line, and every real content
    # line keeps its newline
    delim_own_line = bool(lines) and lines[-1].strip() == ""
    content = lines[:-1] if delim_own_line else lines
    out_lines = [ln[strip:].rstrip() if ln.strip() else "" for ln in content]
    body = "\n".join(out_lines) + ("\n" if delim_own_line and out_lines else "")
    # process escapes, incl. \s and line-continuation
    body = body.replace("\\\n", "")
    body = body.replace("\\s", " ")
    return java_unescape(body), k + 3


def read_string_lit(src, i):
    """src[i] == '"'; return (value, next_index)."""
    assert src[i] == '"'
    if src.startswith('"""', i):
        return read_text_block(src, i)
    j = i + 1
    buf = []
    while j < len(src):
        c = src[j]
        if c == "\\":
            buf.append(src[j:j + 2]); j += 2
        elif c == '"':
            return java_unescape("".join(buf)), j + 1
        else:
            buf.append(c); j += 1
    raise ValueError("unterminated string")


IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def parse_args(src, i, consts=None):
    """src[i] == '('. Parse a balanced arg list; each arg is either a pure
    string-literal concatenation -> str (identifier references that name a
    resolved `static final String` constant count as literals), or None
    (dynamic). Returns (args, index_after_close_paren)."""
    assert src[i] == "("
    consts = consts or {}
    i += 1
    args, cur_parts, cur_dynamic, cur_any = [], [], False, False
    depth = 0
    while i < len(src):
        i = skip_ws_comments(src, i)
        if i >= len(src):
            break
        c = src[i]
        if c == '"':
            val, i = read_string_lit(src, i)
            cur_parts.append(val); cur_any = True
            continue
        if c == "+":
            i += 1
            continue
        if c == "(":
            depth += 1; cur_dynamic = True; cur_any = True; i += 1
            continue
        if c == ")":
            if depth == 0:
                if cur_any:
                    args.append(None if cur_dynamic else "".join(cur_parts))
                return args, i + 1
            depth -= 1; i += 1
            continue
        if c == "," and depth == 0:
            args.append(None if cur_dynamic else "".join(cur_parts))
            cur_parts, cur_dynamic, cur_any = [], False, False
            i += 1
            continue
        im = IDENT_RE.match(src, i)
        if im:
            name = im.group(0)
            nxt = skip_ws_comments(src, im.end())
            # a bare constant reference (not a call / field access)
            if name in consts and (nxt >= len(src) or src[nxt] not in "(.["):
                cur_parts.append(consts[name]); cur_any = True
                i = im.end()
                continue
            cur_dynamic = True; cur_any = True
            i = im.end()
            continue
        # any other token (number, dot, etc.) makes the arg dynamic
        cur_dynamic = True; cur_any = True
        i += 1
    raise ValueError("unterminated args")


CONST_DECL_RE = re.compile(
    r"(?:private|protected|public)\s+(?:static\s+final|final\s+static|static|final)[\s\w]*?"
    r"String\s+([A-Za-z_][A-Za-z0-9_]*)\s*=")


def collect_constants(src):
    """name -> value for String fields initialized from pure literal
    concatenations (two passes so constants can reference earlier ones)."""
    consts = {}
    for _ in range(2):
        for m in CONST_DECL_RE.finditer(src):
            name = m.group(1)
            i = m.end()
            parts, ok = [], True
            while i < len(src):
                i = skip_ws_comments(src, i)
                if i >= len(src):
                    ok = False; break
                c = src[i]
                if c == '"':
                    try:
                        val, i = read_string_lit(src, i)
                    except ValueError:
                        ok = False; break
                    parts.append(val)
                elif c == "+":
                    i += 1
                elif c == ";":
                    break
                else:
                    im = IDENT_RE.match(src, i)
                    if im and im.group(0) in consts:
                        nxt = skip_ws_comments(src, im.end())
                        if nxt < len(src) and src[nxt] in "(.[":
                            ok = False; break
                        parts.append(consts[im.group(0)])
                        i = im.end()
                    else:
                        ok = False; break
            if ok and parts:
                consts[name] = "".join(parts)
    return consts


def brace_span(src, open_pos):
    """src[open_pos] == '{'; return index of the matching '}' (or None),
    skipping string literals and comments."""
    d = 0
    i = open_pos
    while i < len(src):
        c = src[i]
        if c == '"':
            try:
                _, i = read_string_lit(src, i)
            except ValueError:
                return None
            continue
        if c == "'":
            j = i + 1
            if j < len(src) and src[j] == "\\":
                j += 1
            i = j + 2
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = len(src) if j < 0 else j + 1
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = len(src) if j < 0 else j + 2
            continue
        if c == "{":
            d += 1
        elif c == "}":
            d -= 1
            if d == 0:
                return i
        i += 1
    return None


def timestamp_variant_spans(src):
    """Spans of `if (timestampType == TestTimestampType.X) {...} else {...}`
    blocks, tagged with the variant each branch runs under. Executes and
    assertQueries inside one branch belong to ONE parameterized variant —
    attaching the other branch's setup, or reading a NANO-branch expected
    under a MICRO DDL, makes the harvested case internally inconsistent
    (WindowFunctionTest testNthValueTimestampSubtypePropagation)."""
    spans = []
    for bm in re.finditer(
            r"if\s*\(\s*timestampType\s*==\s*TestTimestampType\."
            r"(NANO|MICRO)\s*\)\s*\{", src):
        var = bm.group(1)
        close = brace_span(src, bm.end() - 1)
        if close is None:
            continue
        spans.append((bm.end(), close, var))
        j = skip_ws_comments(src, close + 1)
        if src.startswith("else", j):
            j2 = skip_ws_comments(src, j + 4)
            if j2 < len(src) and src[j2] == "{":
                close2 = brace_span(src, j2)
                if close2 is not None:
                    spans.append(
                        (j2 + 1, close2, "MICRO" if var == "NANO" else "NANO"))
    return spans


def extract_file(path):
    src = open(path, encoding="utf-8", errors="replace").read()
    out = []
    consts = collect_constants(src)
    # setup statements: literal execute("...") calls, attached to the case
    # when they appear in the same @Test method before the assertQuery.
    # executeWithRewriteTimestamp(sql, type) is the reference's
    # micro/nano-parameterized runner — #TIMESTAMP resolves to the variant
    # the enclosing timestampType branch runs under (MICRO outside any
    # branch: literal expected outputs there are the micro-run's).
    test_marks = [t.start() for t in re.finditer(r"@Test\b", src)]
    spans = timestamp_variant_spans(src)

    def variant_at(pos):
        best = None
        for s, e, v in spans:
            if s <= pos < e and (best is None or s > best[0]):
                best = (s, v)
        return best[1] if best else None

    # setup statements inside for/while loops execute N times with
    # loop-dependent values — a single harvested literal misrepresents
    # the data (DoubleArrayElemSum testKahanCompensation inserts one row
    # 1000x); cases depending on such setups are dynamic
    loop_spans = []
    for lm in re.finditer(r"\b(?:for|while)\s*\(", src):
        close_par = lm.end() - 1
        d = 1
        i2 = close_par + 1
        while i2 < len(src) and d:
            if src[i2] == "(":
                d += 1
            elif src[i2] == ")":
                d -= 1
            i2 += 1
        j2 = skip_ws_comments(src, i2)
        if j2 < len(src) and src[j2] == "{":
            close = brace_span(src, j2)
            if close is not None:
                loop_spans.append((j2, close))

    def in_loop(pos):
        return any(s <= pos < e for s, e in loop_spans)

    executes = []
    # `update("update t set ...")` is the JUnit helper for UPDATE
    # statements (UuidTest update-by-uuid family) — same setup role as
    # execute(); only literal-string calls are harvestable
    for em in re.finditer(
            r"(?<![A-Za-z0-9_.])(execute(?:WithRewriteTimestamp)?|update)\s*\(", src):
        try:
            eargs, _ = parse_args(src, em.end() - 1, consts)
        except (ValueError, AssertionError):
            continue
        if eargs and eargs[0] is not None:
            # the update() helper: only harvest literal UPDATE statements,
            # and never in tests that flip partitions read-only through
            # the writer API first (the harvested UPDATE would then apply
            # where the reference suspends and rolls back)
            if em.group(1) == "update":
                if not re.match(r"(?is)\s*update\b", str(eargs[0])):
                    continue
                ro = src.rfind("setPartitionReadOnly", 0, em.start())
                tm = max((t for t in test_marks if t < em.start()), default=0)
                if ro > tm:
                    continue
            executes.append((em.start(), eargs[0], variant_at(em.start()),
                             in_loop(em.start())))
    for m in re.finditer(r"\bassertQuery(?:NoLeakCheck)?\s*\(", src):
        start = m.start()
        line = src.count("\n", 0, start) + 1
        prev_test = max((t for t in test_marks if t < start), default=0)
        qvariant = variant_at(start) or "MICRO"
        tsname = "TIMESTAMP_NS" if qvariant == "NANO" else "TIMESTAMP"
        attached = [e for e in executes if prev_test < e[0] < start and
                    e[2] in (None, qvariant)]
        if any(looped for _, _, _, looped in attached):
            continue  # loop-built setup: the harvested literal lies
        setup = [sql.replace("#TIMESTAMP", tsname)
                 for pos, sql, ev, _ in attached]
        try:
            args, i = parse_args(src, m.end() - 1, consts)
        except (ValueError, AssertionError):
            continue
        if len(args) != 1 or args[0] is None:
            continue
        query = args[0].replace("#TIMESTAMP", tsname)
        case = {"file": os.path.relpath(path, ROOT), "line": line,
                "query": query, "ddls": list(setup), "mutate": [],
                "expected": None, "expected2": None}
        ok, dynamic = True, False
        # walk the chain
        while True:
            i = skip_ws_comments(src, i)
            if i >= len(src) or src[i] != ".":
                ok = False; break
            i += 1
            i = skip_ws_comments(src, i)
            mm = re.match(r"[A-Za-z_][A-Za-z0-9_]*", src[i:])
            if not mm:
                ok = False; break
            name = mm.group(0)
            i += len(name)
            i = skip_ws_comments(src, i)
            if i >= len(src) or src[i] != "(":
                ok = False; break
            try:
                cargs, i = parse_args(src, i, consts)
            except (ValueError, AssertionError):
                ok = False; break
            if name in DISQUALIFY:
                ok = False; break
            if name in DDLISH:
                if any(a is None for a in cargs): dynamic = True
                case["ddls"].extend(a.replace("#TIMESTAMP", tsname)
                                    for a in cargs if a is not None)
            elif name in MUTATEISH:
                if any(a is None for a in cargs): dynamic = True
                case["mutate"].extend(a.replace("#TIMESTAMP", tsname)
                                      for a in cargs if a is not None)
            elif name in TERMINALS:
                if not cargs or cargs[0] is None:
                    dynamic = True
                else:
                    case["expected"] = cargs[0]
                    if len(cargs) > 1 and cargs[1] is not None:
                        case["expected2"] = cargs[1]
                break
            elif name in IGNORABLE:
                pass
            else:
                ok = False; break
        if not ok or dynamic or case["expected"] is None:
            continue
        text = " ".join([query] + case["ddls"] + case["mutate"])
        case["tier"] = "run" if NONDET.search(text) else "exact"
        out.append(case)
    return out


def main():
    cases = []
    for dirpath, _, files in os.walk(ROOT):
        for f in files:
            if f.endswith(".java"):
                cases.extend(extract_file(os.path.join(dirpath, f)))
    dst = sys.stdout if len(sys.argv) < 2 else open(sys.argv[1], "w")
    for c in cases:
        dst.write(json.dumps(c, ensure_ascii=True) + "\n")
    print(f"extracted {len(cases)} cases "
          f"({sum(1 for c in cases if c['tier'] == 'exact')} exact, "
          f"{sum(1 for c in cases if c['tier'] == 'run')} run)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
