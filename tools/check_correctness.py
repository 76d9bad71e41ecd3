#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for every query result parquet in <outDir>, executes the corresponding
oracle SQL from oracle_sql.json in DuckDB (tables registered from the
sfDir parquet files), and compares schema-insensitively: columns sorted
by name, rows sorted, values compared exactly (strict mode) to guarantee
any driver-side normalization also passes.

Usage: check_correctness.py <sfDir> <outDir>
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
        if str(df[c].dtype).startswith("datetime64[us"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            got = pd.read_parquet(qdir)
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL: {e}"
            continue
        if name not in oracle:
            results[name] = f"ROWS-ONLY ({len(got)} rows)" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL: {str(e).splitlines()[0][:160]}"
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"COLS-MISMATCH: spark={list(g.columns)} oracle={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"NROWS-MISMATCH: spark={len(g)} oracle={len(e)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
                results[name] = f"MATCH ({len(g)} rows)"
            except AssertionError as ex:
                results[name] = "VALUES-MISMATCH: " + str(ex).splitlines()[-1][:200]

    ok = True
    for name, res in sorted(results.items()):
        status = "OK " if res.startswith(("MATCH", "ROWS-ONLY (")) else "BAD"
        if status == "BAD":
            ok = False
        print(f"[{status}] {name}: {res}")
    print(f"\n{sum(1 for r in results.values() if r.startswith('MATCH'))} matched, "
          f"{sum(1 for r in results.values() if r.startswith('ROWS-ONLY ('))} rows-only, "
          f"{len(results)} total")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
