#!/usr/bin/env python3
"""Driver-faithful comparator: reads the Spark result via pyarrow
(pandas.read_parquet) and the oracle via duckdb fetchdf — the asymmetric
pair the driver uses — then compares str() renderings after sorting
columns by name and rows by all columns. Catches dtype/repr drift that
tools/check.py's exact-value compare misses (Decimal vs float64, HUGEINT
sums → float64, bytes vs bytearray, tz-aware stamps).

Usage: tools/check2.py [sfdir] [outdir] [only_query ...]
Assumes outdir already holds a Verify dump (run tools/check.py first, or
anything that invoked graft.Verify).
"""
import duckdb, sys, glob, os, json
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    df = df[sorted(df.columns)]
    # naive-ify tz-aware stamps (spark parquet reads as UTC-aware)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64") and getattr(
                df[c].dt, "tz", None) is not None:
            df[c] = df[c].dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
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
        files = glob.glob(f"{OUTDIR}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            g = canon_df(pd.concat([pd.read_parquet(f) for f in files]))
            e = canon_df(con.sql(oracle[name]).fetchdf())
            err = None
            if list(g.columns) != list(e.columns):
                err = f"SCHEMA {list(g.columns)} vs {list(e.columns)}"
            elif len(g) != len(e):
                err = f"ROWS {len(g)} vs {len(e)}"
            else:
                for c in g.columns:
                    a = g[c].astype(str).tolist()
                    b = e[c].astype(str).tolist()
                    if a != b:
                        i = next(i for i, (x, y) in enumerate(zip(a, b))
                                 if x != y)
                        err = (f"col {c} row {i}: spark={a[i]!r} "
                               f"oracle={b[i]!r} (dtypes {g[c].dtype} "
                               f"vs {e[c].dtype})")
                        break
        except Exception as ex:
            err = f"EXC {type(ex).__name__}: {ex}"
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
