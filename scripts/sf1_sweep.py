#!/usr/bin/env python3
"""10x scale sweep: time operators at sf0.1 and at a 10x amplified copy
(scripts/make_sfx.py -> /tmp/sf1), report per-op ratios, flag super-linear
drift. Writes BENCH_SF1.json.

Usage:
  python3 scripts/sf1_sweep.py all [oracle_sql.json]  # full battery (default
                                                      # json: a Verify dump)
  python3 scripts/sf1_sweep.py <op> [op ...]          # named subset
  python3 scripts/sf1_sweep.py --merge <op> [op ...]  # time the named ops at
                                                      # the CURRENT epoch and
                                                      # merge them into the
                                                      # committed final file

--merge exists for the incremental case (a new op, or one op's fix) where
re-sweeping the whole battery would cost hours for information that did
not change: the merged entries carry their own epoch in `merged_epochs`
so the artifact never silently blends measurement epochs, and
flagged/explained are recomputed over the union.

A linear-scaling op should land near 10x (less when fixed overhead
dominates, e.g. commit machinery); anything well past LINEAR_FLAG x is
flagged for a plan audit — that is the quadratic-drift detector this
sweep exists for. The full battery runs in BATCH-sized JVMs (fresh JVM
per batch bounds heap fragmentation and gives resumability: results are
flushed to BENCH_SF1.partial.json after every batch, and already-timed
ops are skipped on rerun). The JVM is invoked directly (not via sbt) so
the sweep can run alongside an sbt session without fighting its lock —
compile FIRST, the sweep reads target/scala-2.13/classes.
"""
import json
import os
import re
import subprocess
import sys

LINEAR_FLAG = 13.0  # 10x data + 30% slack for shuffle constants
BATCH = 24
PARTIAL = "/root/repo/BENCH_SF1.partial.json"
FINAL = "/root/repo/BENCH_SF1.json"

# Ops whose >LINEAR_FLAG ratio is the documented CONTRACT, not drift —
# each carries the justification into the artifact so "flagged" stays the
# actionable list. Add entries only with a reason a plan audit would accept.
EXPLAINED = {
    "d_embed_cosine":
        "deliberately EXACT all-pairs diagnostic (block nested-loop, "
        "Dedup.scala header): 10x vectors = 100x pairs by contract; the "
        "production path is d_embed_lsh/d_semdedup",
    "s_knn_graph":
        "blocked kNN-graph construction is Theta(n^1.5) at the optimal "
        "single-level block count k=sqrt(n) (Ann.scala header): 10x "
        "vectors = ~31x pair work by the standard bound. The round-9 fix "
        "removed the QUADRATIC fixed-k variant (was x34 and worsening); "
        "s_nn_descent is the LINEAR tier past this bound (deterministic "
        "NN-descent, fully oracled) with the crossover near 1M vectors",
    "d_substring":
        "exact shared-substring detection is linear in TOTAL CHARS "
        "(Dedup.scala header, the Lee-et-al suffix-array analogue); "
        "round 10 halved the dominant probe shuffle (stride-2 probe + "
        "paired stride-10 grid, 8 B/char) and dropped shingle strings "
        "from the grid shuffle, buying margin under the 13.0 flag - no "
        "quadratic term exists (candidates are hash-verified grid "
        "matches, O(matches))",
}

ADD_OPENS = [f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
    "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def op_list(argv):
    if argv and argv[0] != "all":
        return argv
    src = argv[1] if len(argv) > 1 else "/tmp/graft_verify/oracle_sql.json"
    if not os.path.exists(src):
        sys.exit(f"op list source {src} missing — run graft.Verify first "
                 "or pass explicit op names")
    return sorted(json.load(open(src)).keys())


def bench(ops, sfdir):
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sfdir, "SPARK_GRAFT_CPUS": "16"}
    cmd = (["java"] + ADD_OPENS +
           # match build.sbt: BATCH-sized op runs won't normally fill the
           # default 240m code cache, but keep measurement JVMs identical
           ["-Xmx24g", "-XX:ReservedCodeCacheSize=512m", "-cp",
            "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.tools.BenchSome"] + list(ops))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd="/root/repo", timeout=7200)
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


def code_epoch():
    """Identity of the code under measurement: the src/main tree hash plus
    a src/main-scoped dirty marker. A partial from a DIFFERENT epoch must
    not be resumed — mixing measurement epochs in one artifact silently
    blends old and new code. Scoped to src/main (what target/classes is
    built from) so doc/script commits and this sweep's own untracked
    partial file do not spuriously invalidate a resumable run (HEAD rev +
    whole-tree porcelain did both: the partial itself made the tree
    "dirty", so no partial could ever be resumed)."""
    tree = subprocess.run(["git", "rev-parse", "HEAD:src/main"],
                          capture_output=True, text=True,
                          cwd="/root/repo").stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain", "--", "src/main"],
                           capture_output=True, text=True,
                           cwd="/root/repo").stdout.strip() != ""
    return tree + ("+dirty" if dirty else "")


def merge_main(ops):
    if not os.path.exists(FINAL):
        sys.exit(f"--merge needs an existing {FINAL}")
    epoch = code_epoch()
    result = json.load(open(FINAL))
    t01 = bench(ops, "/root/testdata/sf0.1")
    t1 = bench(ops, "/tmp/sf1")
    merged = result.setdefault("merged_epochs", {})
    for op in ops:
        ratio = round(t1[op] / max(t01[op], 0.005), 2)
        result["ops"][op] = {"sf0.1_s": round(t01[op], 3),
                             "sf1_s": round(t1[op], 3), "ratio": ratio,
                             "super_linear": ratio > LINEAR_FLAG}
        merged[op] = epoch
        print(f"{op:24s} {t01[op]:8.2f}s -> {t1[op]:8.2f}s  x{ratio}"
              + ("  <-- SUPER-LINEAR" if ratio > LINEAR_FLAG else ""),
              flush=True)
    result["n_ops"] = len(result["ops"])
    over = [o for o, r in sorted(result["ops"].items()) if r["super_linear"]]
    result["flagged"] = [o for o in over if o not in EXPLAINED]
    result["explained"] = {o: EXPLAINED[o] for o in over if o in EXPLAINED}
    with open(FINAL, "w") as f:
        json.dump(result, f, indent=2)
    print(f"merged {len(ops)} ops into {FINAL} "
          f"({result['n_ops']} total); flagged:", result["flagged"])


def main():
    if sys.argv[1:2] == ["--merge"]:
        if len(sys.argv) < 3:
            sys.exit("--merge needs op names")
        merge_main(sys.argv[2:])
        return
    ops = op_list(sys.argv[1:])
    epoch = code_epoch()
    done = {}
    if os.path.exists(PARTIAL):
        partial = json.load(open(PARTIAL))
        if partial.get("epoch") == epoch:
            done = partial.get("ops", {})
            print(f"resuming: {len(done)} ops already timed in {PARTIAL}")
        else:
            print(f"discarding stale partial (epoch {partial.get('epoch')} "
                  f"!= {epoch})")
    todo = [o for o in ops if o not in done]
    for i in range(0, len(todo), BATCH):
        batch = todo[i:i + BATCH]
        print(f"batch {i // BATCH + 1}: {batch[0]}..{batch[-1]} "
              f"({len(batch)} ops)", flush=True)
        t01 = bench(batch, "/root/testdata/sf0.1")
        t1 = bench(batch, "/tmp/sf1")
        for op in batch:
            # an op printing "0.00 s" at sf0.1 would divide by zero; clamp
            # to the print resolution (ratio stays meaningful: "at most")
            ratio = round(t1[op] / max(t01[op], 0.005), 2)
            done[op] = {"sf0.1_s": round(t01[op], 3),
                        "sf1_s": round(t1[op], 3), "ratio": ratio,
                        "super_linear": ratio > LINEAR_FLAG}
            print(f"{op:24s} {t01[op]:8.2f}s -> {t1[op]:8.2f}s  x{ratio}"
                  + ("  <-- SUPER-LINEAR" if ratio > LINEAR_FLAG else ""),
                  flush=True)
        with open(PARTIAL, "w") as f:
            json.dump({"epoch": epoch, "ops": done}, f, indent=2)
    rows = {o: done[o] for o in ops}
    over = [o for o, r in rows.items() if r["super_linear"]]
    result = {"factor": 10, "linear_flag": LINEAR_FLAG, "epoch": epoch,
              "n_ops": len(rows), "ops": rows,
              "flagged": [o for o in over if o not in EXPLAINED],
              "explained": {o: EXPLAINED[o] for o in over if o in EXPLAINED}}
    with open(FINAL, "w") as f:
        json.dump(result, f, indent=2)
    # the partial is consumed — leaving it would let a future rerun resume
    # stale timings into a fresh artifact
    if os.path.exists(PARTIAL):
        os.remove(PARTIAL)
    print(f"wrote {FINAL} ({len(rows)} ops); flagged:", result["flagged"])


if __name__ == "__main__":
    main()
