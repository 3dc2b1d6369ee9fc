#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sf_dir> <verify_out_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over views named after the
test tables, canonicalizes both sides (columns sorted by name, rows
sorted by all columns, values rendered to strings), and reports
match/mismatch per query.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(render(v) for v in t))
    rows.sort()
    return rows


def render(v):
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        cg, cw = canon(got), canon(want)
        if cg == cw:
            print(f"✓ {name}: rows={len(cg)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"✗ {name}: spark {len(cg)} rows vs oracle {len(cw)} rows")
            if sorted(got.columns) != sorted(want.columns):
                print(f"    cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")
            else:
                diffs = [(a, b) for a, b in zip(cg, cw) if a != b]
                for a, b in diffs[:3]:
                    print(f"    spark : {a}\n    oracle: {b}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
