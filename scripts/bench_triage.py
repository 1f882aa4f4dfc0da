#!/usr/bin/env python3
"""Attribution-driven bench triage: compare two BENCH_SELF-shaped files
(each op carries {sec, gc_ms, lease_retries}) and flag every op whose
wall-time swing is NOT explained by the load signals — the automated
form of SURVEY §5's "suspect a code change" rule, so per-op regressions
stop being re-derived by hand each judge round.

Method:
  1. global factor = median(curr/prev) over all shared ops — the
     machine/load normalization (r7->r8 this was ~0.74);
  2. adjusted ratio = (curr/prev) / global factor;
  3. an op is FLAGGED when adjusted ratio > THRESH and the absolute
     delta > MIN_DELTA_S and neither a GC swing (gc_ms delta covering
     most of the extra seconds) nor lease retries account for it.

Usage:
  python3 scripts/bench_triage.py PREV.json CURR.json
  python3 scripts/bench_triage.py --git HEAD~1 [CURR.json]
    (PREV read as `git show <rev>:BENCH_SELF.json`; CURR defaults to the
    working-copy BENCH_SELF.json)

Writes BENCH_TRIAGE.json beside BENCH_SELF.json.
"""
import json
import statistics
import subprocess
import sys

THRESH = 1.25       # adjusted slowdown that earns a look
MIN_DELTA_S = 0.5   # ignore sub-noise absolute swings
GC_COVER = 0.5      # GC delta covering >= this share of the extra secs
OUT = "/root/repo/BENCH_TRIAGE.json"


def load(src):
    doc = json.loads(src)
    qs = doc["queries"]
    # pre-r8 files carry plain seconds, not {sec, gc_ms, lease_retries}
    ops = {o: (v if isinstance(v, dict) else {"sec": float(v)})
           for o, v in qs.items()}
    # r11+ files carry a start/mid/end machine-load sentinel
    return ops, doc.get("sentinel")


def sentinel_factors(prev_s, curr_s):
    """Median curr/prev ratio of the fixed sentinel micro-ops across the
    start/mid/end samples — the machine-load swing measured by identical
    code on both epochs. None when either epoch predates the sentinel."""
    if not prev_s or not curr_s:
        return None
    tags = sorted(set(prev_s) & set(curr_s))
    if not tags:
        return None
    return {
        "cpu": round(statistics.median(
            curr_s[t]["cpu_sec"] / max(prev_s[t]["cpu_sec"], 1e-3) for t in tags), 3),
        "fs": round(statistics.median(
            curr_s[t]["fs_sec"] / max(prev_s[t]["fs_sec"], 1e-3) for t in tags), 3),
        "prev_loadavg": [prev_s[t].get("loadavg", "") for t in tags],
        "curr_loadavg": [curr_s[t].get("loadavg", "") for t in tags],
    }


def main():
    args = sys.argv[1:]
    note = None
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        args = args[:i] + args[i + 2:]
    prev_id = None
    if args and args[0] == "--git":
        rev = args[1]
        prev_id = rev
        prev, prev_sent = load(subprocess.run(
            ["git", "show", f"{rev}:BENCH_SELF.json"], capture_output=True,
            text=True, cwd="/root/repo", check=True).stdout)
        curr_path = args[2] if len(args) > 2 else "/root/repo/BENCH_SELF.json"
    elif len(args) == 2:
        prev_id = args[0]
        prev, prev_sent = load(open(args[0]).read())
        curr_path = args[1]
    else:
        sys.exit(__doc__)
    curr, curr_sent = load(open(curr_path).read())
    sent = sentinel_factors(prev_sent, curr_sent)

    shared = sorted(set(prev) & set(curr))
    if not shared:
        sys.exit("no shared ops between the two files")
    ratios = [curr[o]["sec"] / max(prev[o]["sec"], 1e-3) for o in shared]
    factor = statistics.median(ratios)

    flagged, explained = [], []
    for o in shared:
        p, c = prev[o], curr[o]
        adj = (c["sec"] / max(p["sec"], 1e-3)) / factor
        delta_s = c["sec"] - p["sec"] * factor  # vs load-normalized prev
        if adj <= THRESH or delta_s <= MIN_DELTA_S:
            continue
        gc_delta_s = (c.get("gc_ms", 0) - p.get("gc_ms", 0)) / 1000.0
        lease_delta = c.get("lease_retries", 0) - p.get("lease_retries", 0)
        row = {"op": o, "prev_s": p["sec"], "curr_s": c["sec"],
               "adj_ratio": round(adj, 2), "extra_s": round(delta_s, 2),
               "gc_delta_s": round(gc_delta_s, 2),
               "lease_retry_delta": lease_delta}
        if gc_delta_s >= GC_COVER * delta_s:
            row["verdict"] = "explained: gc"
            explained.append(row)
        elif lease_delta > 0:
            row["verdict"] = "explained: lease retries"
            explained.append(row)
        elif sent is not None and adj <= 1.15 * max(sent["cpu"], sent["fs"]) / factor:
            # the sentinel (identical code both epochs) swelled at least as
            # much as this op did beyond the global factor: machine load,
            # not code — the artifact-only attribution the sentinel exists for
            row["verdict"] = "explained: machine load (sentinel)"
            explained.append(row)
        else:
            row["verdict"] = "suspect a code change"
            flagged.append(row)

    result = {"global_factor": round(factor, 3), "thresh": THRESH,
              "n_shared": len(shared), "prev": prev_id,
              **({"sentinel": sent} if sent else {}),
              **({"note": note} if note else {}),
              "flagged": sorted(flagged, key=lambda r: -r["adj_ratio"]),
              "explained_by_load": explained}
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {OUT}: factor x{factor:.3f} over {len(shared)} ops; "
          f"{len(flagged)} suspect, {len(explained)} load-explained")
    for r in flagged:
        print(f"  SUSPECT {r['op']:24s} {r['prev_s']:.2f}s -> "
              f"{r['curr_s']:.2f}s (adj x{r['adj_ratio']})")


if __name__ == "__main__":
    main()
