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

# FROZEN DuckDB-side drift control (round-19 verdict item 1) — DO NOT
# EDIT. The duck twin of the engine's qc1 control (BenchControls
# .controlPairs): the same pair-mass shape (distinct basket sets, ordered
# pair explode via self-join, symmetric counts, per-source top-3 window),
# self-contained SQL sharing no text with any registered oracle. Timed
# once at the start and once at the end of every window (after its own
# warm pass); its cross-round movement is pure environment drift on the
# comparator side, so the excl-q197 gate can be normalized for
# ASYMMETRIC VM drift (d18: engine controls +9.5% while DuckDB ran ~8%
# faster in the same windows — the raw cut moved 1.9x -> 2.2x with zero
# engine regression).
DUCK_CONTROL_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
half AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
pairs AS (SELECT part_a, part_b, n_orders FROM half
          UNION ALL SELECT part_b, part_a, n_orders FROM half)
SELECT part_a, part_b, n_orders, rn FROM (
  SELECT part_a, part_b, n_orders,
         ROW_NUMBER() OVER (PARTITION BY part_a
                            ORDER BY n_orders DESC, part_b) AS rn
  FROM pairs) t
WHERE rn <= 3 ORDER BY part_a, rn"""

# Reference control values, pinned from the d19 anchor window at sf0.1
# (the window that re-pins the 2x gate). The normalized excl-q197 ratio
# corrects EACH side's common-subset seconds by its own frozen control's
# drift against these anchors:
#   norm = (engine_excl * REF_ENGINE_QC1 / qc1_now)
#        / (duck_excl   * REF_DUCK_CONTROL / dc_now)
# None -> anchors not yet pinned; the tool then reports norm == raw and
# records the control values so the anchor can be pinned from the run.
REF_ENGINE_QC1 = 2.468     # qc1 median sec, d19 anchor window (w1), sf0.1
REF_DUCK_CONTROL = 0.5147  # duck control mean-of-(first,last) sec, same window


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

    def time_control():
        t1 = time.time()
        con.execute(DUCK_CONTROL_SQL).fetchall()
        return round(time.time() - t1, 4)

    con.execute(DUCK_CONTROL_SQL).fetchall()  # control warm pass
    dc_first = time_control()
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
    dc_last = time_control()
    dc_now = round((dc_first + dc_last) / 2, 4)
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

    # the standing judging rule: quote the ratio both WITH and WITHOUT
    # q197_kcore_peeling (DuckDB's recursive-CTE pathology — ~half its
    # suite total where the engine takes ~2 s); the excl cut is the
    # demanding reading of the 2x gate
    common_excl = [n for n in common if not n.startswith("q197")]
    engine_excl = round(sum(equeries[short(n)] for n in common_excl), 2)
    duck_excl = round(sum(dq[n] for n in common_excl), 2)
    ratio_excl = (round(engine_excl / duck_excl, 3) if duck_excl else None)
    # drift-normalized excl cut: correct each side by its own frozen
    # control's movement against the pinned d19 anchors (see header)
    qc1_now = equeries.get("qc1")
    if (REF_ENGINE_QC1 and REF_DUCK_CONTROL and qc1_now and dc_now
            and ratio_excl is not None):
        ratio_excl_norm = round(
            (engine_excl * REF_ENGINE_QC1 / qc1_now)
            / (duck_excl * REF_DUCK_CONTROL / dc_now), 3)
    else:
        ratio_excl_norm = ratio_excl  # anchors not pinned yet: norm == raw
    result = {
        "sf": sf,
        "engine_total_sec": bench["value"],
        "engine_common_sec": engine_common,
        "duckdb_total_sec": duck_total,
        "duckdb_common_sec": duck_common,
        "ratio_common": round(engine_common / duck_common, 3)
            if duck_common else None,
        "engine_excl_q197_sec": engine_excl,
        "duckdb_excl_q197_sec": duck_excl,
        "ratio_excl_q197": ratio_excl,
        "ratio_excl_q197_norm": ratio_excl_norm,
        "engine_qc1_sec": qc1_now,
        "duck_control_first_sec": dc_first,
        "duck_control_last_sec": dc_last,
        "duck_control_sec": dc_now,
        "ref_engine_qc1": REF_ENGINE_QC1,
        "ref_duck_control": REF_DUCK_CONTROL,
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
