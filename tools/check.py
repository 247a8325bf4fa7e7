#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: tools/check.py [sfdir] [outdir] [only_query ...]

Assumes `sbt compile` has already produced classes; runs graft.Verify via
java (no sbt startup cost), then compares every parquet result against
the DuckDB oracle in oracle_sql.json: columns sorted by name, rows in
file order vs oracle ORDER BY, exact value equality (NaN==NULL
canonicalized, decimals compared numerically).

This is builder tooling only — the engine itself is pure Scala/Spark.
"""
import duckdb, sys, glob, os, json, math, subprocess, decimal

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    jars = sorted(glob.glob("/opt/spark/jars/*.jar"))
    cp = "/root/repo/target/scala-2.13/classes:" + ":".join(jars)
    opens = ["java.base/java.lang", "java.base/java.lang.invoke",
             "java.base/java.lang.reflect", "java.base/java.io",
             "java.base/java.net", "java.base/java.nio",
             "java.base/java.util", "java.base/java.util.concurrent",
             "java.base/java.util.concurrent.atomic",
             "java.base/sun.nio.ch", "java.base/sun.nio.cs",
             "java.base/sun.security.action", "java.base/sun.util.calendar"]
    cmd = ["java"] + [f"--add-opens={p}=ALL-UNNAMED" for p in opens] + [
        "-Xmx8g", "-Dspark.ui.enabled=false",
        "-cp", cp, "graft.Verify", SFDIR, OUTDIR] + sorted(ONLY)
    r = subprocess.run(cmd, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  ", line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)


def canon(v):
    if v is None:
        return None
    if hasattr(v, "tzinfo") and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, decimal.Decimal):
        # The driver hashes the textual repr — scale differences between
        # Spark and DuckDB decimals fail there even when values match, so
        # compare the exact string form (no normalize).
        return str(v)
    return v


def compare(name, sql, con):
    src = f"read_parquet('{OUTDIR}/{name}/*.parquet')"
    gcols = sorted(con.sql(f"SELECT * FROM {src}").columns)
    grows = con.sql(
        f"SELECT {', '.join(chr(34)+c+chr(34) for c in gcols)} FROM {src}").fetchall()
    ecols = sorted(con.sql(sql).columns)
    erows = con.sql(
        f"SELECT {', '.join(chr(34)+c+chr(34) for c in ecols)} FROM ({sql})").fetchall()
    if gcols != ecols:
        return f"SCHEMA cols differ: spark={gcols} oracle={ecols}"
    if len(grows) != len(erows):
        return f"ROWS {len(grows)} vs {len(erows)}"
    for i, (g, e) in enumerate(zip(grows, erows)):
        cg = tuple(canon(x) for x in g)
        ce = tuple(canon(x) for x in e)
        if cg != ce:
            return f"VALUE row {i}: spark={cg} oracle={ce}"
    return None


def main():
    run_verify()
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if ONLY and name not in ONLY:
            continue
        if not glob.glob(f"{OUTDIR}/{name}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            err = compare(name, oracle[name], con)
        except Exception as ex:
            err = f"EXC {ex}"
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok   {name}")
            n_ok += 1
    # queries without oracle: rows-only check
    all_q = {os.path.basename(d) for d in glob.glob(f"{OUTDIR}/*") if os.path.isdir(d)}
    for name in sorted(all_q - set(oracle)):
        if ONLY and name not in ONLY:
            continue
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUTDIR}/{name}/*.parquet')").fetchone()[0]
        print(f"rows {name}: {n}")
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
