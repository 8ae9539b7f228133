#!/usr/bin/env python3
"""Dev-only paired comparator (round-16 verdict item 5, NOT part of the
library): the engine quiet suite and warm DuckDB over the SAME oracle
SQLs, measured back-to-back in ONE session, emitted as ONE JSON — so
the engine/comparator ratio can never mix measurement windows (the d16
round quoted 1.16x and 1.29x for identical code purely because the two
sides were measured hours apart).

Usage: python3 tools/paired_bench.py <sfDir> [outJson]
  GRAFT_DUCKDB_THREADS (default 32) sizes the comparator;
  SPARK_GRAFT_ONLY narrows both sides for iteration.

Method: oracles dumped without executing anything (graft.DumpOracles),
engine suite via `sbt runMain graft.Bench` (its own warmup +
median-of-3 discipline, per-query medians read from
BENCH_last_full.json), then DuckDB runs every oracle once untimed
(warm) and once timed. The headline ratio compares the COMMON subset:
oracle-backed queries only (bench-only fast-path twins are reported in
the engine total but excluded from the ratio)."""
import json
import os
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "PAIRED_BENCH.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = os.environ.get("SPARK_GRAFT_ONLY")

    opath = "/tmp/graft_oracles.json"
    subprocess.run(["sbt", f"runMain graft.DumpOracles {opath}"],
                   cwd=repo, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    oracles = json.load(open(opath))
    if only:
        toks = {t.strip() for t in only.split(",") if t.strip()}
        oracles = {k: v for k, v in oracles.items()
                   if any(k == t or k.startswith(t + "_") for t in toks)}

    t0 = time.time()
    subprocess.run(["sbt", "runMain graft.Bench"], cwd=repo,
                   env=dict(os.environ, SPARK_GRAFT_SF_DIR=sf), check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    engine_wall = round(time.time() - t0, 1)
    bench_path = os.path.join(repo, "BENCH_last_full.json")
    # freshness gate: Bench swallows the IOException on a read-only cwd,
    # so a stale committed BENCH_last_full.json would silently pair LAST
    # round's engine medians with today's DuckDB — the exact window
    # mixing this tool exists to prevent
    if not os.path.exists(bench_path) or os.path.getmtime(bench_path) < t0:
        sys.exit("paired_bench: BENCH_last_full.json was not refreshed by "
                 "this Bench run (read-only cwd or failed write) — refusing "
                 "to pair stale engine medians with fresh DuckDB timings")
    bench = json.load(open(bench_path))
    equeries = bench["queries"]  # short name -> median sec

    con = duckdb.connect()
    threads = os.environ.get("GRAFT_DUCKDB_THREADS", "32")
    con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(oracles)
    for n in names:  # warmup (I/O cache + duckdb internal state)
        try:
            con.execute(oracles[n]).fetchall()
        except Exception:
            pass
    dq, failed = {}, []
    for n in names:
        t1 = time.time()
        try:
            con.execute(oracles[n]).fetchall()
            dq[n] = round(time.time() - t1, 4)
        except Exception:
            failed.append(n)
    duck_total = round(sum(dq.values()), 2)

    def short(n):
        return n.split("_")[0]

    # queries the engine recorded as CRASHED carry elapsed-to-crash
    # medians — exclude them from the pairing entirely
    engine_failed = set(bench.get("failed", []))
    common = [n for n in dq
              if short(n) in equeries and short(n) not in engine_failed]
    engine_common = round(sum(equeries[short(n)] for n in common), 2)
    # the ratio must divide like by like: engine seconds over the common
    # subset vs DuckDB seconds over the SAME subset (not duck_total over
    # all succeeded oracles — a name absent from the bench dict would
    # otherwise deflate the ratio). Flag any asymmetry loudly.
    duck_common = round(sum(dq[n] for n in common), 2)
    # every succeeded oracle should pair with an engine median (the engine
    # dict may hold EXTRA bench-only entries — that's fine); any oracle
    # left unpaired, or a failure on either side, is loud
    unpaired = [n for n in dq if short(n) not in equeries]
    if unpaired or failed or engine_failed:
        print(f"WARNING: asymmetric pairing — common={len(common)} "
              f"unpaired_oracles={unpaired} duckdb_failed={failed} "
              f"engine_failed={sorted(engine_failed)}", file=sys.stderr)
    result = {
        "sf": sf,
        "engine_total_sec": bench["value"],
        "engine_common_sec": engine_common,
        "duckdb_total_sec": duck_total,
        "duckdb_common_sec": duck_common,
        "ratio_common": round(engine_common / duck_common, 3)
            if duck_common else None,
        "n_common": len(common),
        "n_engine": len(equeries),
        "n_duckdb_failed": len(failed),
        "duckdb_threads": int(threads),
        "engine_wall_sec": engine_wall,
        "engine_stage_sec": bench.get("stage"),
        "method": ("one window: engine quiet suite (warmup + median-of-3"
                   " per query) then warm DuckDB (one untimed + one timed"
                   " pass per oracle); ratio over the oracle-backed common"
                   " subset"),
        "duckdb_queries": dq,
    }
    with open(out, "w") as f:
        json.dump(result, f)
    headline = {k: v for k, v in result.items() if k != "duckdb_queries"}
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
