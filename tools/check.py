#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>
Reads each <out>/<name> parquet dir (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables,
sorts columns by name and rows by all columns, and compares values
(float tolerance 1e-9 relative / 1e-9 absolute).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def _sort_cell(v):
    # Canonical cell repr for ROW ORDERING only: floats rounded to the compare
    # tolerance's magnitude so pandas vs DuckDB double formatting differences
    # (0.123456 vs 0.12345600000000001) cannot reorder rows.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(round(v, 7), ".7f")
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return "[" + ",".join(_sort_cell(x) for x in list(v)) + "]"
    return str(v)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    key = df.apply(lambda r: "\x00".join(_sort_cell(x) for x in r), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)

def _is_float(v):
    return isinstance(v, float) or str(type(v)).find("float") >= 0

def _is_int(v):
    return (isinstance(v, int) and not isinstance(v, bool)) \
        or str(type(v)).find("int") >= 0

def eq(a, b):
    if a is None and b is None: return True
    # TYPE-STRICT across the int/float divide: the driver hashes canonical
    # value reprs, so an oracle column that comes back float64 (e.g. DuckDB
    # HUGEINT from an uncast integer sum(), via the pandas bridge) hashes as
    # "0.0" against Spark's int64 "0" and FAILS even though 0 == 0.0. A
    # tolerant `a == b` here is exactly how the r5/r6
    # profile_lineitem_numeric / report_source_quality hash-only fails
    # stayed invisible locally for two rounds.
    if _is_float(a) != _is_float(b) and (_is_int(a) or _is_int(b)):
        return False
    if _is_float(a) and _is_float(b):
        a, b = float(a), float(b)
        if math.isnan(a) and math.isnan(b): return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(eq(x, y) for x, y in zip(la, lb))
    return a == b

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            n_fail += 1; continue
        s, d = canon(sdf), canon(ddf)
        bad = 0
        for col in s.columns:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if not eq(x, y):
                    if bad == 0:
                        print(f"FAIL {name}: col={col} row={i}: spark={x!r} duck={y!r}")
                    bad += 1
        if bad:
            print(f"     {name}: {bad} mismatched cells"); n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
