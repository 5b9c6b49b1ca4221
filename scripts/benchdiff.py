#!/usr/bin/env python3
"""Compare two bench runs and flag per-query regressions.

Usage:
  python3 scripts/benchdiff.py                     # last two sf0.1 history runs
  python3 scripts/benchdiff.py sf1                 # last two sf1 history runs
  python3 scripts/benchdiff.py r5 r6               # BENCH_r05.json vs BENCH_r06.json
  python3 scripts/benchdiff.py -3 -1               # history entries by index
  python3 scripts/benchdiff.py a.json b.json       # explicit artifact paths
  ... [--thresh 1.5] [--sf sf0.1] [--allow-contended]

Normalizes by the fixed-work CPU canary so machine drift doesn't read as
a code regression, and prints queries whose normalized time grew by more
than the threshold (default 1.5x). New/removed keys are listed
separately. Exit 1 if regressions found.

A run stamped "contended": true by Bench's self-gate is NOT comparable
(its timings measure the neighbor's workload, not this code); the tool
refuses such inputs with exit 2 unless --allow-contended is passed
(r6 verdict task #6).
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_history(sf_substr):
    hist = REPO / "bench_history.jsonl"
    if not hist.exists():
        return []
    entries = [json.loads(l) for l in hist.open() if l.strip()]
    return [e for e in entries if sf_substr in e.get("sf", "")]


# Everything Bench prints besides per-query timings; used to split a
# salvaged key:number soup into metadata vs queries.
META_KEYS = {"value", "first_stream_init", "passes", "load_avg_start",
             "load_avg_end", "cpus", "canary_sec", "canary_par_sec",
             "steal_pct", "boot_epoch", "cpu_mhz",
             "settled_sec", "contended", "n", "rc", "sf"}


def unwrap(entry, label):
    """Driver-written BENCH_rN.json wraps a (front-truncated) stdout tail:
    {"n": N, "rc": 0, ..., "tail": "<maybe-partial bench line>"}.
    Recover the bench line — fully if `{"metric":"total"` survived the
    truncation, else by salvaging every "key":number pair and splitting
    off known metadata keys (total then recomputed from the recovered
    queries and flagged partial)."""
    if "queries" in entry:
        return entry
    tail = entry.get("tail", "")
    start = tail.find('{"metric":"total"')
    if start >= 0:
        try:
            return json.loads(tail[start:].splitlines()[0])
        except json.JSONDecodeError:
            pass
    pairs = re.findall(r'"([A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)',
                       tail)
    queries = {k: float(v) for k, v in pairs if k not in META_KEYS}
    meta = {k: float(v) for k, v in pairs if k in META_KEYS}
    if not queries:
        sys.exit(f"{label}: no bench line recoverable from its tail")
    out = dict(entry)
    out["queries"] = queries
    out["value"] = meta.get("value", sum(queries.values()))
    for k in ("canary_sec", "load_avg_start", "contended"):
        if k in meta:
            out[k] = bool(meta[k]) if k == "contended" else meta[k]
    print(f"warning: {label} stdout tail was front-truncated - "
          f"recovered {len(queries)} queries (earlier keys lost); "
          f"canary {'present' if 'canary_sec' in out else 'MISSING'}")
    return out


def resolve(sel, sf_substr):
    """Resolve one selector to (label, entry-dict)."""
    m = re.fullmatch(r"r(\d+)", sel)
    if m:
        n = int(m.group(1))
        for cand in (REPO / f"BENCH_r{n:02d}.json", REPO / f"BENCH_r{n}.json"):
            if cand.exists():
                return cand.name, unwrap(json.loads(cand.read_text()),
                                         cand.name)
        sys.exit(f"no BENCH_r{n:02d}.json / BENCH_r{n}.json in {REPO}")
    if re.fullmatch(r"-?\d+", sel):
        entries = load_history(sf_substr)
        idx = int(sel)
        try:
            return f"history[{idx}]", entries[idx]
        except IndexError:
            sys.exit(f"history index {idx} out of range "
                     f"({len(entries)} entries matching {sf_substr!r})")
    p = Path(sel)
    if p.exists():
        return p.name, unwrap(json.loads(p.read_text()), p.name)
    sys.exit(f"selector {sel!r} is neither rN, a history index, nor a file")


def main():
    args = sys.argv[1:]
    thresh, sf_substr, allow_contended = 1.5, "sf0.1", False
    positional = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--thresh":
            thresh = float(args[i + 1]); i += 2
        elif a == "--sf":
            sf_substr = args[i + 1]; i += 2
        elif a == "--allow-contended":
            allow_contended = True; i += 1
        else:
            positional.append(a); i += 1

    # Legacy positional form: [sf-substring] [ratio-threshold].
    if len(positional) == 2 and re.fullmatch(r"\d+(\.\d+)?", positional[1]) \
            and positional[0].startswith("sf"):
        sf_substr, thresh = positional[0], float(positional[1])
        positional = []
    elif len(positional) == 1 and positional[0].startswith("sf"):
        sf_substr = positional[0]
        positional = []

    if len(positional) == 2:
        (olabel, old), (nlabel, new) = (resolve(positional[0], sf_substr),
                                        resolve(positional[1], sf_substr))
    elif not positional:
        entries = load_history(sf_substr)
        if len(entries) < 2:
            print(f"need >=2 history entries matching {sf_substr!r}, "
                  f"have {len(entries)}")
            sys.exit(0)
        (olabel, old), (nlabel, new) = \
            (f"history[-2]", entries[-2]), (f"history[-1]", entries[-1])
    else:
        sys.exit("give zero or two selectors (rN / index / path); see --help")

    for label, e in ((olabel, old), (nlabel, new)):
        if e.get("contended") is True:
            msg = (f"{label} is stamped contended:true by the bench "
                   f"self-gate - not comparable")
            if allow_contended:
                print(f"warning: {msg} (proceeding: --allow-contended)")
            else:
                print(f"REFUSED: {msg} (override with --allow-contended)")
                sys.exit(2)

    # Host identity: two artifacts with different boot epochs are
    # different VM instances. Measured (r7): same-spec instances with
    # indistinguishable solo canaries differ ~1.5x on Spark throughput,
    # so a cross-instance comparison is advisory at best — say so.
    ob, nb = old.get("boot_epoch"), new.get("boot_epoch")
    if ob is not None and nb is not None and ob > 0 and nb > 0 and ob != nb:
        print("warning: runs are from DIFFERENT VM instances "
              f"(boot epochs {int(ob)} vs {int(nb)}) - same-spec instances "
              "have measured ~1.5x apart at identical canaries; treat "
              "ratios as advisory")
    for label, e in ((olabel, old), (nlabel, new)):
        sp = e.get("steal_pct")
        if sp is not None and sp > 2:
            print(f"warning: {label} ran at {sp:.1f}% hypervisor steal")
    ocpu, ncpu = old.get("cpus"), new.get("cpus")
    if ocpu is not None and ncpu is not None and ocpu != ncpu:
        print(f"warning: CPU-count mismatch ({olabel} local[{ocpu}] vs "
              f"{nlabel} local[{ncpu}]) - thread count changes shuffle "
              "partitioning and scheduling overhead; ratios are advisory")

    # canary normalization: a query 2x slower at a 2x-slower canary is
    # machine drift, not code. Prefer the PARALLEL canary when both
    # runs carry it — Spark queries run cpus-wide, and host effects
    # that only bind under concurrency are invisible to the solo
    # canary. If EITHER side lacks a canary, disable normalization
    # entirely — substituting 1.0s for a ~0.2s canary would skew every
    # ratio ~5x in one direction. `is not None`, not truthiness: a
    # (theoretical) 0.0 canary must not silently fall back to raw
    # comparison.
    oc, nc = old.get("canary_par_sec"), new.get("canary_par_sec")
    which = "par"
    if oc is None or nc is None:
        oc, nc = old.get("canary_sec"), new.get("canary_sec")
        which = "solo"
    else:
        # the par canary is only a fair yardstick when its dilation
        # over the solo canary (par/solo, ~1.2x on a quiet host) is
        # comparable on BOTH sides: a reference run whose par canary
        # was itself contended scales every new-run query UP and
        # manufactures raw-faster "regressions" (observed: par 0.31 on
        # a 0.17-solo host flagged 12 queries that were all raw-faster)
        osolo, nsolo = old.get("canary_sec"), new.get("canary_sec")
        if osolo and nsolo:
            odil, ndil = oc / osolo, nc / nsolo
            if max(odil, ndil) / min(odil, ndil) > 1.3:
                print(f"warning: par-canary dilation differs "
                      f"({olabel} {odil:.2f}x vs {nlabel} {ndil:.2f}x) - "
                      "one run's parallel canary was itself contended; "
                      "falling back to SOLO-canary normalization")
                oc, nc = osolo, nsolo
                which = "solo"
    if oc is not None and nc is not None and nc > 0:
        scale = oc / nc
    else:
        scale = 1.0
        print("warning: canary_sec missing on one side - "
              "comparing RAW times (machine drift not corrected)")
    oq, nq = old["queries"], new["queries"]
    print(f"old {olabel}: total={old['value']:.1f}s "
          f"load={old.get('load_avg_start')} canary={old.get('canary_sec')}")
    print(f"new {nlabel}: total={new['value']:.1f}s "
          f"load={new.get('load_avg_start')} canary={new.get('canary_sec')}"
          f"  ({which}-canary scale {scale:.2f})")
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
