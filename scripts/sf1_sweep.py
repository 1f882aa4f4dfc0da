#!/usr/bin/env python3
"""10x scale sweep: time the most expensive ops at sf0.1 and at a 10x
amplified copy (scripts/make_sfx.py -> /tmp/sf1), report per-op ratios,
flag super-linear drift. Writes BENCH_SF1.json.

Usage: python3 scripts/sf1_sweep.py [op ...]   (default: the top list below)

A linear-scaling op should land near 10x (less when fixed overhead
dominates, e.g. commit machinery); anything well past LINEAR_FLAG x is
flagged for a plan audit — that is the quadratic-drift detector this
sweep exists for.
"""
import json
import re
import subprocess
import sys

# top-10 most expensive ops of the round-6 driver bench + the two
# windows reworked this round
DEFAULT_OPS = [
    "d_minhash_lsh", "t_sql_pipeline", "t_incr_join_view", "d_lsh_tuning",
    "t_repartition_evolve", "t_record_index", "t_multiformat_ingest",
    "d_minhash_est", "t_cdc", "t_consistent_hash",
    "q_decile_report", "c_token_budget",
]
LINEAR_FLAG = 13.0  # 10x data + 30% slack for shuffle constants

ops = sys.argv[1:] or DEFAULT_OPS


def bench(sfdir):
    env = {"SPARK_GRAFT_SF_DIR": sfdir, "SPARK_GRAFT_CPUS": "16"}
    import os
    out = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.BenchSome {' '.join(ops)}"],
        capture_output=True, text=True, env={**os.environ, **env},
        cwd="/root/repo", timeout=7200)
    times = {}
    for line in out.stdout.splitlines() + out.stderr.splitlines():
        m = re.search(r"\[benchsome\] (\S+) run(\d) +([0-9.]+) s", line)
        if m and m.group(2) == "2":  # warm run
            times[m.group(1)] = float(m.group(3))
    missing = [o for o in ops if o not in times]
    if missing:
        sys.exit(f"no timing for {missing} at {sfdir}:\n{out.stdout[-3000:]}\n{out.stderr[-2000:]}")
    return times


t01 = bench("/root/testdata/sf0.1")
t1 = bench("/tmp/sf1")

rows = {}
for op in ops:
    ratio = round(t1[op] / t01[op], 2)
    rows[op] = {"sf0.1_s": round(t01[op], 3), "sf1_s": round(t1[op], 3),
                "ratio": ratio, "super_linear": ratio > LINEAR_FLAG}
    print(f"{op:24s} {t01[op]:8.2f}s -> {t1[op]:8.2f}s  x{ratio}"
          + ("  <-- SUPER-LINEAR" if ratio > LINEAR_FLAG else ""))

result = {"factor": 10, "linear_flag": LINEAR_FLAG, "ops": rows,
          "flagged": [o for o, r in rows.items() if r["super_linear"]]}
with open("/root/repo/BENCH_SF1.json", "w") as f:
    json.dump(result, f, indent=2)
print("wrote BENCH_SF1.json; flagged:", result["flagged"])
