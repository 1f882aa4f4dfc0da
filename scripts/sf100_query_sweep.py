#!/usr/bin/env python3
"""100x spot-evidence for the query battery (VERDICT r10 #6): the three
most expensive query ops — q_pagerank, q_bucketed_join, q_copurchase —
are the shapes whose skew/shuffle behavior changes most with scale, and
the 10x sweep (BENCH_SF1.json) was their only scale evidence. This
script times them at sf0.1, at the 10x dir (/tmp/sf1) and at a 100x dir
(/tmp/sf100q, scripts/make_sfx.py factor 100), and records the
step ratios. A linearly-scaling op should land near 10x per step
(LINEAR_FLAG slack matches sf1_sweep.py); anything past that at the
100x step is exactly the skew/shuffle drift this sweep exists to catch.

Usage: python3 scripts/sf100_query_sweep.py [op ...]
(defaults to the three headline ops; dirs must exist — make_sfx first.)
Writes BENCH_SF100_QUERY.json. Compile first (reads target/classes).
"""
import json
import os
import re
import subprocess
import sys

LINEAR_FLAG = 13.0  # 10x data per step + 30% slack for shuffle constants
OUT = "/root/repo/BENCH_SF100_QUERY.json"
DIRS = [("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", "/tmp/sf1"),
        ("sf10", "/tmp/sf100q")]  # 100x of sf0.1 == sf10-equivalent volume

ADD_OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
    "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def bench(ops, sfdir, timeout=7200):
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sfdir,
           "SPARK_GRAFT_CPUS": str(os.cpu_count())}
    cmd = (["java"] + ADD_OPENS +
           ["-Xmx48g", "-XX:ReservedCodeCacheSize=512m", "-cp",
            "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.tools.BenchSome"] + list(ops))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd="/root/repo", timeout=timeout)
    times = {}
    for line in out.stdout.splitlines() + out.stderr.splitlines():
        m = re.search(r"\[benchsome\] (\S+) run(\d) +([0-9.]+) s", line)
        if m and m.group(2) == "2":  # warm run
            times[m.group(1)] = float(m.group(3))
    missing = [o for o in ops if o not in times]
    if missing:
        sys.exit(f"no timing for {missing} at {sfdir}:"
                 f"\n{out.stdout[-3000:]}\n{out.stderr[-2000:]}")
    return times


def main():
    ops = sys.argv[1:] or ["q_pagerank", "q_bucketed_join", "q_copurchase"]
    for _, d in DIRS:
        if not os.path.isdir(d):
            sys.exit(f"{d} missing — run scripts/make_sfx.py first")
    per_dir = {}
    for tag, d in DIRS:
        per_dir[tag] = bench(ops, d)
        for op in ops:
            print(f"{tag:6s} {op:20s} {per_dir[tag][op]:8.2f}s", flush=True)
    rows = {}
    for op in ops:
        s01, s1, s10 = (per_dir[t][op] for t, _ in DIRS)
        r1 = round(s1 / max(s01, 0.005), 2)
        r2 = round(s10 / max(s1, 0.005), 2)
        rows[op] = {"sf0.1_s": round(s01, 3), "sf1_s": round(s1, 3),
                    "sf10_s": round(s10, 3), "ratio_10x": r1,
                    "ratio_100x_step": r2,
                    "super_linear": r2 > LINEAR_FLAG}
    result = {"factor_per_step": 10, "linear_flag": LINEAR_FLAG,
              "ops": rows,
              "flagged": sorted(o for o, r in rows.items() if r["super_linear"])}
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {OUT}; flagged: {result['flagged']}")


if __name__ == "__main__":
    main()
