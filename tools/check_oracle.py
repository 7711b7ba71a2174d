#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json against the same testdata in DuckDB, and
compares schemas + values (columns sorted by name, rows sorted by all
columns) — approximating the driver's hash-match check.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            want_rel = con.sql(sql)
            want_cols, want = canon(want_rel.fetchall(), want_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        got_types = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
        want_types = dict(zip(want_rel.columns, [str(t) for t in want_rel.types]))
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            failures += 1
        elif got_types != want_types:
            diff = {c: (got_types[c], want_types[c]) for c in got_types
                    if got_types[c] != want_types.get(c)}
            print(f"FAIL {name}: dtype mismatch {diff}")
            failures += 1
        elif got != want:
            diffs = [(g, w) for g, w in zip(got, want) if g != w]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows, "
                  f"first diffs: {diffs[:3]} "
                  f"extra_got={[r for r in got if r not in set(want)][:2]} "
                  f"extra_want={[r for r in want if r not in set(got)][:2]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
