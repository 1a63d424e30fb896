#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
fixture parquet tables, loads the corresponding Spark result parquet, and
compares: column-name set, row count, and exact values after sorting
columns by name and rows by all columns (the driver's canonicalization per
SURVEY.md §5.1). Usage:

    python3 tools/check.py <sfdir> <outdir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = []
    skipped = []
    for name in sorted(oracles):
        # skip oracles whose Spark dump wasn't selected (SPARK_GRAFT_ONLY
        # local iteration) BEFORE running the oracle SQL — the Lloyd /
        # recursive-closure replays are the expensive side at sf0.1
        import os
        if not os.path.isdir(f"{outdir}/{name}"):
            skipped.append(name)
            continue
        sql = oracles[name]
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle sql failed: {e}"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            failures.append((name, f"spark result missing: {e}"))
            continue
        if sorted(want.columns) != sorted(got.columns):
            failures.append(
                (name, f"columns differ: oracle={sorted(want.columns)} spark={sorted(got.columns)}"))
            continue
        # dtype-strict: the driver hashes typed values, so an int64/float64
        # mismatch (e.g. DuckDB HUGEINT->float64 vs Spark int64) is a FAIL
        # even when Python == would call the cells equal
        dtw = {c: str(want[c].dtype) for c in want.columns}
        dtg = {c: str(got[c].dtype) for c in got.columns}
        dtbad = [c for c in want.columns if dtw[c] != dtg[c]]
        if dtbad:
            failures.append((name, "dtypes differ: " + ", ".join(
                f"{c}: oracle={dtw[c]} spark={dtg[c]}" for c in dtbad)))
            continue
        if len(want) != len(got):
            failures.append((name, f"row count: oracle={len(want)} spark={len(got)}"))
            continue
        w, g = canon(want), canon(got)
        mismatch = None
        for ci, c in enumerate(w.columns):
            wv, gv = w[c].tolist(), g[c].tolist()
            for ri, (a, b) in enumerate(zip(wv, gv)):
                if not cells_equal(a, b):
                    mismatch = f"first diff col={c} row={ri}: oracle={a!r} spark={b!r}"
                    break
            if mismatch:
                break
        if mismatch:
            failures.append((name, mismatch))
        else:
            print(f"  OK   {name}  ({len(want)} rows)")

    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    compared = len(oracles) - len(skipped)
    if skipped:
        # a query that FAILED to dump (crash in Verify) also lands here —
        # never read "N/N" without checking the skip list
        print(f"  SKIP (no spark dump): {', '.join(skipped)}")
    print(f"\n{compared - len(failures)}/{compared} compared oracle queries match"
          f" ({len(skipped)} of {len(oracles)} skipped)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
