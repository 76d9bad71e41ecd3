#!/usr/bin/env python3
"""Scale-proof variant of the correctness gate: per-query subprocess with a
hard timeout, run in parallel.

At large scale factors the DuckDB re-derivation — not the Spark side — can
become the bottleneck (DEVNOTES r11: "ORACLE scalability is its own axis").
check_correctness.py runs every oracle sequentially in one process, so one
pathological oracle stalls the whole gate. This tool runs each query's
oracle+compare in its own subprocess (parallel, default 8 workers) with a
per-query wall timeout (default 900 s); a timeout reports ORACLE-TIMEOUT for
that query only and the gate keeps going.

Usage:
  check_scale.py <sfDir> <outDir> [--timeout SEC] [--workers N] [--only name[,name...]]

Internal single-query mode (what the subprocesses run):
  check_scale.py <sfDir> <outDir> --one <name>
"""
import argparse
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def check_one(sf_dir: str, out_dir: str, name: str) -> str:
    import json
    import duckdb
    import pandas as pd
    from check_correctness import TABLES, normalize

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    qdir = Path(out_dir) / name
    try:
        got = pd.read_parquet(qdir)
    except Exception as e:
        return f"SPARK-READ-FAIL: {e}"
    if name not in oracle:
        return f"ROWS-ONLY ({len(got)} rows)" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        return f"ORACLE-FAIL: {str(e).splitlines()[0][:160]}"
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        return f"COLS-MISMATCH: spark={list(g.columns)} oracle={list(e.columns)}"
    if len(g) != len(e):
        return f"NROWS-MISMATCH: spark={len(g)} oracle={len(e)}"
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        return f"MATCH ({len(g)} rows)"
    except AssertionError as ex:
        return "VALUES-MISMATCH: " + str(ex).splitlines()[-1][:200]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        print(check_one(args.sf_dir, args.out_dir, args.one))
        return 0

    names = sorted(d.name for d in Path(args.out_dir).iterdir() if d.is_dir())
    if args.only:
        only = set(args.only.split(","))
        missing = only - set(names)
        if missing:
            print(f"unknown queries: {sorted(missing)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in only]

    def run(name: str) -> tuple:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, __file__, args.sf_dir, args.out_dir, "--one", name],
                capture_output=True, text=True, timeout=args.timeout)
            out = r.stdout.strip()
            if not out:
                err = r.stderr.strip().splitlines()
                out = "CHECK-CRASH: " + (err[-1][:160] if err else "no output")
            return name, out, time.time() - t0
        except subprocess.TimeoutExpired:
            return name, f"ORACLE-TIMEOUT (>{args.timeout:.0f}s)", time.time() - t0

    ok = True
    results = []
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        for name, res, secs in ex.map(run, names):
            status = "OK " if res.startswith(("MATCH", "ROWS-ONLY (")) else "BAD"
            if status == "BAD":
                ok = False
            print(f"[{status}] {name}: {res} [{secs:.1f}s]", flush=True)
            results.append(res)
    print(f"\n{sum(1 for r in results if r.startswith('MATCH'))} matched, "
          f"{sum(1 for r in results if r.startswith('ROWS-ONLY ('))} rows-only, "
          f"{sum(1 for r in results if r.startswith('ORACLE-TIMEOUT'))} timeout, "
          f"{len(results)} total")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
