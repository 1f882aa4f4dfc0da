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
     most of the extra seconds) nor lease retries nor the machine-load
     sentinel account for it. Sentinel attribution is FAMILY-LOCAL when
     both epochs carry the r12+ `fam_*` boundary samples: an op is read
     against the sentinel pair bracketing ITS OWN family (minutes away),
     falling back to the global start/mid/end median otherwise — the r11
     epoch's six open suspects were exactly a family-local load spike the
     global sentinel bracketing could not see.

Usage:
  python3 scripts/bench_triage.py PREV.json CURR.json
  python3 scripts/bench_triage.py --git HEAD~1 [CURR.json] [--embed]
    (PREV read as `git show <rev>:BENCH_SELF.json`; CURR defaults to the
    working-copy BENCH_SELF.json). With --embed the triage result is also
    written INTO CURR under a "triage" key — Bench calls this at battery
    end so every epoch artifact arrives pre-attributed.
  [--floors floors.json]: op -> isolated fresh-JVM floor seconds. Bench
    runs a first pass, measures a BenchSome floor for each flagged op in
    a fresh child JVM, then re-runs with --floors: a floor within
    prev x1.15 downgrades the row to "resolved: battery-context"; when
    prev is the SAME src/main tree (--git + no diff), an unresolved row
    reads "same-tree: context by construction", never "suspect a code
    change" — which is impossible by construction there.

Writes BENCH_TRIAGE.json beside CURR.
"""
import json
import os
import statistics
import subprocess
import sys

THRESH = 1.25       # adjusted slowdown that earns a look
MIN_DELTA_S = 0.5   # ignore sub-noise absolute swings
GC_COVER = 0.5      # GC delta covering >= this share of the extra secs
SENT_TOL = 1.15     # sentinel ratio covering the op's adjusted ratio
FLOOR_TOL = 1.15    # isolated fresh-JVM floor within prev x this = context

# keep in sync with Bench.scala's `families` (longest prefix wins)
FAMILIES = [("tables", "t_"), ("query", "q"), ("dedup", "d_"),
            ("text", "x_"), ("ann", "s_"), ("stream", "st_"),
            ("media", "m_"), ("curation", "c_")]


def family(op):
    hits = [(name, p) for name, p in FAMILIES if op.startswith(p)]
    return max(hits, key=lambda t: len(t[1]))[0] if hits else "other"


def load(src):
    doc = json.loads(src)
    qs = doc["queries"]
    # pre-r8 files carry plain seconds, not {sec, gc_ms, lease_retries}
    ops = {o: (v if isinstance(v, dict) else {"sec": float(v)})
           for o, v in qs.items()}
    # r11+ files carry a machine-load sentinel (r12+: per-family samples)
    return ops, doc.get("sentinel")


def tag_ratio(prev_s, curr_s, tag):
    """max(cpu, fs) curr/prev ratio of one sentinel sample shared by both
    epochs — identical code, so the ratio is pure machine state."""
    p, c = prev_s[tag], curr_s[tag]
    return max(c["cpu_sec"] / max(p["cpu_sec"], 1e-3),
               c["fs_sec"] / max(p["fs_sec"], 1e-3))


def sentinel_model(prev_s, curr_s):
    """Global medians + a family -> local-max-ratio map. Family-local
    ratios use the two samples bracketing the family in battery order
    (the tag dict preserves insertion = battery order); available only
    when BOTH epochs carry the fam_* tags."""
    if not prev_s or not curr_s:
        return None
    shared = [t for t in curr_s if t in prev_s]  # battery order
    if not shared:
        return None
    model = {
        "cpu": round(statistics.median(
            curr_s[t]["cpu_sec"] / max(prev_s[t]["cpu_sec"], 1e-3)
            for t in shared), 3),
        "fs": round(statistics.median(
            curr_s[t]["fs_sec"] / max(prev_s[t]["fs_sec"], 1e-3)
            for t in shared), 3),
        "prev_loadavg": {t: prev_s[t].get("loadavg", "") for t in shared},
        "curr_loadavg": {t: curr_s[t].get("loadavg", "") for t in shared},
    }
    fam_local = {}
    order = shared  # battery order (dict insertion order, both epochs)
    if any(t.startswith("fam_") for t in order):
        # brackets: family F spans from its boundary tag through EVERY
        # shared sample up to and including the next fam_*/end tag — not
        # just the single next sample, which missed load swings between a
        # mid-family "mid" snap and the family's closing boundary. The
        # battery runs families in sorted-key order (c_ < d_ < m_ < q <
        # s_ < st_ < t_ < x_), so the first family — curation — has no
        # fam_ boundary tag; its span starts at the "start" sample. A
        # family whose tag is missing from either epoch gets no local
        # entry and falls back to the global median.
        for name, _p in FAMILIES:
            tag = "start" if name == "curation" else f"fam_{name}"
            if tag not in order:
                continue
            i = order.index(tag)
            bracket = [tag]
            for t in order[i + 1:]:
                bracket.append(t)
                if t.startswith("fam_") or t == "end":
                    break
            fam_local[name] = round(
                max(tag_ratio(prev_s, curr_s, t) for t in bracket), 3)
    if fam_local:
        model["family_local"] = fam_local
    return model


def main():
    args = sys.argv[1:]
    note, embed, floors = None, False, {}
    if "--embed" in args:
        embed = True
        args.remove("--embed")
    if "--note" in args:
        i = args.index("--note")
        note = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--floors" in args:
        # op -> isolated fresh-JVM floor seconds (best warm of N runs),
        # measured by Bench for rows a first triage pass flagged — the
        # judge's manual protocol, automated
        i = args.index("--floors")
        floors = {k: float(v) for k, v in json.load(open(args[i + 1])).items()}
        args = args[:i] + args[i + 2:]
    prev_id = None
    same_tree = False
    if args and args[0] == "--git":
        rev = args[1]
        prev_id = rev
        curr_path = args[2] if len(args) > 2 else "BENCH_SELF.json"
        repo_dir = os.path.dirname(os.path.abspath(curr_path)) or "."
        prev, prev_sent = load(subprocess.run(
            ["git", "show", f"{rev}:BENCH_SELF.json"], capture_output=True,
            text=True, cwd=repo_dir, check=True).stdout)
        # "suspect a code change" is impossible by construction when the
        # working tree's op code equals the code the committed epoch RAN ON
        # — which is the newest commit (at or before rev) that touched
        # BENCH_SELF.json, not rev itself: the artifact may predate later
        # code commits, and diffing against rev would mislabel a regression
        # introduced by them as context
        epoch_commit = subprocess.run(
            ["git", "log", "-1", "--format=%H", rev, "--", "BENCH_SELF.json"],
            capture_output=True, text=True, cwd=repo_dir).stdout.strip()
        # build config changes (scala flags, JVM options) are as
        # perf-relevant as source — include them in the "same tree" test
        same_tree = bool(epoch_commit) and subprocess.run(
            ["git", "diff", "--quiet", epoch_commit, "--",
             "src/main", "build.sbt", "project"],
            cwd=repo_dir).returncode == 0
    elif len(args) == 2:
        prev_id = args[0]
        prev, prev_sent = load(open(args[0]).read())
        curr_path = args[1]
    else:
        sys.exit(__doc__)
    curr, curr_sent = load(open(curr_path).read())
    sent = sentinel_model(prev_sent, curr_sent)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(curr_path)), "BENCH_TRIAGE.json")

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
        local = (sent or {}).get("family_local", {}).get(family(o))
        sent_ratio = local if local is not None else (
            max(sent["cpu"], sent["fs"]) if sent else None)
        if gc_delta_s >= GC_COVER * delta_s:
            row["verdict"] = "explained: gc"
            explained.append(row)
        elif lease_delta > 0:
            row["verdict"] = "explained: lease retries"
            explained.append(row)
        elif sent_ratio is not None and adj <= SENT_TOL * sent_ratio / factor:
            # the sentinel (identical code both epochs) swelled at least as
            # much as this op did beyond the global factor: machine load,
            # not code — family-local sample when available, global median
            # otherwise
            row["verdict"] = ("explained: machine load (family sentinel)"
                              if local is not None
                              else "explained: machine load (sentinel)")
            if local is not None:
                row["family_sentinel_ratio"] = local
            explained.append(row)
        else:
            floor = floors.get(o)
            if floor is not None:
                row["isolated_floor_s"] = floor
            if floor is not None and floor <= p["sec"] * FLOOR_TOL:
                # the judge's isolated-rerun protocol, automated: a fresh
                # JVM floors the op at (or under) the committed epoch's
                # time — the battery-context reading, final
                row["verdict"] = ("resolved: battery-context (isolated "
                                  "floor within prev x%.2f)" % FLOOR_TOL)
                explained.append(row)
            elif same_tree:
                # prev IS the committed epoch of this exact src/main tree:
                # a code change is impossible by construction
                row["verdict"] = ("same-tree: context by construction"
                                  + (", isolated floor pending"
                                     if floor is None else
                                     " (floor above tolerance - environment)"))
                explained.append(row)
            elif floor is not None:
                row["verdict"] = "suspect a code change (isolated floor confirms)"
                flagged.append(row)
            else:
                row["verdict"] = "suspect a code change, isolated floor pending"
                flagged.append(row)

    result = {"global_factor": round(factor, 3), "thresh": THRESH,
              "n_shared": len(shared), "prev": prev_id,
              "same_tree": same_tree,
              **({"sentinel": sent} if sent else {}),
              **({"note": note} if note else {}),
              "flagged": sorted(flagged, key=lambda r: -r["adj_ratio"]),
              "explained_by_load": explained}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    if embed:
        doc = json.load(open(curr_path))
        doc["triage"] = result
        with open(curr_path, "w") as f:
            json.dump(doc, f)
    print(f"wrote {out_path}: factor x{factor:.3f} over {len(shared)} ops; "
          f"{len(flagged)} suspect, {len(explained)} load-explained"
          + ("; embedded into " + curr_path if embed else ""))
    for r in flagged:
        print(f"  SUSPECT {r['op']:24s} {r['prev_s']:.2f}s -> "
              f"{r['curr_s']:.2f}s (adj x{r['adj_ratio']})")


if __name__ == "__main__":
    main()
