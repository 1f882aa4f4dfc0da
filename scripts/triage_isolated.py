#!/usr/bin/env python3
"""Finish the SURVEY §5 bench-triage protocol: rerun every BENCH_TRIAGE
suspect ISOLATED — one op per fresh JVM (graft.tools.BenchSome) — and
attribute each flagged swing as battery-context vs code.

Attribution rule: the triage compared two full-battery epochs (prev =
b6cca15's BENCH_SELF, curr = the final round-9 BENCH_SELF). An isolated
fresh-JVM rerun of the op removes every battery-context effect (JIT/codegen
competition, shared-JVM heap shape, ContextCleaner backlog). So:
  isolated_warm <= prev_s * TOL      -> "battery-context" (code is fine;
                                        the in-battery slowdown came from
                                        shared-JVM state)
  isolated_warm >= curr_s / TOL      -> "code" (the op is slow even alone;
                                        the regression is in the plan)
  in between                         -> "partial" (some of each; report
                                        both numbers)
Writes BENCH_TRIAGE_RESOLVED.json next to BENCH_TRIAGE.json with one row
per suspect carrying prev_s, curr_s, isolated cold/warm secs, and the
verdict. Run after `sbt compile` (uses target/scala-2.13/classes).
"""
import json
import os
import re
import subprocess
import sys

TOL = 1.15  # within 15% of an epoch number counts as "matching" it
TRIAGE = "/root/repo/BENCH_TRIAGE.json"
OUT = "/root/repo/BENCH_TRIAGE_RESOLVED.json"

ADD_OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
    "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def run_isolated(op, sfdir="/root/testdata/sf0.1"):
    """One op, one fresh JVM, cold + THREE warm runs; the BEST warm run is
    graded. A single warm sample carries enough JIT/FS-cache variance to
    land between the two epochs and earn an uninformative "partial"
    verdict; the best-of-3 floor is the op's actual capability on this
    machine. CPUs match the driver bench (all cores)."""
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sfdir,
           "SPARK_GRAFT_BENCH_RUNS": "4",
           "SPARK_GRAFT_CPUS": str(os.cpu_count())}
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx24g", "-XX:ReservedCodeCacheSize=512m", "-cp",
            "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.tools.BenchSome", op])
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd="/root/repo", timeout=1800)
    runs = {}
    for line in out.stdout.splitlines() + out.stderr.splitlines():
        m = re.search(r"\[benchsome\] (\S+) run(\d) +([0-9.]+) s", line)
        if m:
            runs[int(m.group(2))] = float(m.group(3))
    if 2 not in runs:
        sys.exit(f"no warm timing for {op}:\n{out.stdout[-2000:]}"
                 f"\n{out.stderr[-1500:]}")
    warm = min(v for k, v in runs.items() if k >= 2)
    return runs.get(1), warm


def verdict(prev_s, curr_s, warm):
    near_prev = warm <= prev_s * TOL
    near_curr = warm >= curr_s / TOL
    if near_prev and not near_curr:
        return "battery-context"
    if near_curr and not near_prev:
        return "code"
    if near_prev and near_curr:  # prev and curr within TOL of each other
        return "noise"
    return "partial"


def main():
    triage = json.load(open(TRIAGE))
    suspects = [f for f in triage["flagged"]
                if f["verdict"] == "suspect a code change"]
    if sys.argv[1:]:
        keep = set(sys.argv[1:])
        suspects = [f for f in suspects if f["op"] in keep]
    rows = []
    for f in suspects:
        op = f["op"]
        cold, warm = run_isolated(op)
        v = verdict(f["prev_s"], f["curr_s"], warm)
        row = {"op": op, "prev_s": f["prev_s"], "curr_s": f["curr_s"],
               "adj_ratio": f["adj_ratio"], "isolated_cold_s": cold,
               "isolated_warm_s": warm, "verdict": v}
        rows.append(row)
        print(json.dumps(row), flush=True)
        # checkpoint after each op so a timeout loses nothing
        json.dump({"tol": TOL, "method": "one fresh JVM per op, BenchSome "
                   "cold+warm, warm graded", "rows": rows},
                  open(OUT, "w"), indent=1)
    print(f"wrote {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
