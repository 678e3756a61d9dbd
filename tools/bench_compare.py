#!/usr/bin/env python3
"""Compare two graft.Bench samples and separate BOX NOISE from real
regressions (driver-side tool, NOT part of the library).

Usage: python3 tools/bench_compare.py OLD.json NEW.json [git-ref:path ok]

Reading rules (BASELINE.md "noise band"): this shared box swings
individual queries 3-4x run-to-run with no code change, and load spikes
inflate RANDOM queries 10-30x. A real regression looks different: the
SAME query is slower by a consistent factor across samples, usually
after a plan change. So the report shows
  - the median ratio (a uniform shift = box speed, not code),
  - queries beyond the noise gate (ratio > 3x AND delta > 1s) — check
    these against a THIRD sample or a plan diff before believing them,
  - queries present in only one sample (added/removed).
"""
import json, subprocess, sys


def load(spec):
    import os
    if not os.path.exists(spec) and ":" in spec:
        out = subprocess.run(["git", "show", spec],
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out)
    return json.load(open(spec))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    import statistics
    ratios = [nq[k] / oq[k] for k in common if oq[k] > 0.05]
    median = statistics.median(ratios) if ratios else float("nan")
    print(f"old: {old['value']:.1f}s/{len(oq)}q   new: {new['value']:.1f}s/{len(nq)}q   "
          f"median ratio on common {len(common)}: {median:.2f}")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({sum(nq[k] for k in added):.1f}s): " +
              " ".join(f"{k}={nq[k]:.2f}" for k in added))
    if removed:
        print("removed: " + " ".join(removed))
    flagged = [(k, oq[k], nq[k]) for k in common
               if nq[k] > 3 * max(oq[k], 0.02) and nq[k] - oq[k] > 1.0]
    if flagged:
        print("beyond the noise gate (>3x and >1s — verify with a third "
              "sample / plan diff):")
        for k, o, n in sorted(flagged, key=lambda x: -(x[2] - x[1])):
            print(f"  {k:24s} {o:6.2f} -> {n:6.2f}  ({n / o:.1f}x)")
    else:
        print("no query beyond the noise gate (>3x and >1s)")


if __name__ == "__main__":
    main()
