#!/usr/bin/env python3
"""Compare two bench_history.jsonl entries and flag per-query regressions.

Usage: python3 scripts/benchdiff.py [sfDir-substring] [ratio-threshold]

Picks the two most recent entries whose "sf" contains the substring
(default "sf0.1"), normalizes by the fixed-work CPU canary so machine
drift doesn't read as a code regression, and prints queries whose
normalized time grew by more than the threshold (default 1.5x).
New/removed keys are listed separately. Exit 1 if regressions found.
"""
import json
import sys


def main():
    want = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    entries = [json.loads(l)
               for l in open("/root/repo/bench_history.jsonl")]
    entries = [e for e in entries if want in e.get("sf", "")]
    if len(entries) < 2:
        print(f"need >=2 entries matching {want!r}, have {len(entries)}")
        sys.exit(0)
    old, new = entries[-2], entries[-1]
    # canary normalization: a query 2x slower at a 2x-slower canary is
    # machine drift, not code. If EITHER side lacks a canary, disable
    # normalization entirely — substituting 1.0s for a ~0.2s canary
    # would skew every ratio ~5x in one direction.
    oc, nc = old.get("canary_sec"), new.get("canary_sec")
    if oc and nc:
        scale = oc / nc
    else:
        scale = 1.0
        print("warning: canary_sec missing on one side - "
              "comparing RAW times (machine drift not corrected)")
    oq, nq = old["queries"], new["queries"]
    print(f"old: total={old['value']:.1f}s load={old.get('load_avg_start')} "
          f"canary={old.get('canary_sec')}")
    print(f"new: total={new['value']:.1f}s load={new.get('load_avg_start')} "
          f"canary={new.get('canary_sec')}  (canary scale {scale:.2f})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    regressions = []
    for k in sorted(set(oq) & set(nq)):
        o, n = oq[k], nq[k] * scale
        if o > 0 and n > o * thresh and n - o > 0.2:  # skip sub-noise keys
            regressions.append((k, o, n, nq[k], n / o))
    for k, o, n, raw, r in sorted(regressions, key=lambda x: -x[4]):
        print(f"REGRESSION {k}: {o:.2f}s -> {n:.2f}s normalized "
              f"(raw {raw:.2f}s, {r:.1f}x)")
    if not regressions:
        print("no regressions above "
              f"{thresh}x (common keys: {len(set(oq) & set(nq))})")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
