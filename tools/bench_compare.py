#!/usr/bin/env python3
"""Bench regression tripwire: compare a graft.Bench run against the
recorded per-query baseline and flag real regressions.

Usage:
    python3 tools/bench_compare.py BENCH_OUTPUT [--baseline tools/bench_baseline.json]
                                   [--factor 1.5] [--min-delta 0.15]

BENCH_OUTPUT is a file containing graft.Bench's stdout (the full JSON
line with the per-query "queries" map; sbt log noise is fine) — or a
raw JSON line. A query flags when BOTH hold:

    current_sec > factor * baseline_sec       (relative, default 1.5x)
    current_sec - baseline_sec > min_delta    (absolute, filters ~0.1 s
                                               noise on sub-second queries)

The baseline is refreshed from an IDLE close-out run (min over reps)
each round — see BASELINE.md. Exit 1 iff any query flags, so the
check drops into scripts; queries present on only one side are
reported informationally and never flag (new queries have no history,
removed ones no current).
"""
import argparse
import json
import re
import sys


def extract_bench(text):
    """Last {"metric":"total",...,"queries":{...}} object in the text."""
    best = None
    for line in text.splitlines():
        i = line.find('{"metric":"total"')
        if i < 0:
            continue
        # the JSON object runs to the line's final closing brace
        j = line.rfind("}")
        if j < 0:
            continue
        try:
            obj = json.loads(line[i:j + 1])
        except json.JSONDecodeError:
            continue
        if "queries" in obj:
            best = obj
    if best is None:
        raise SystemExit("no bench JSON line with a 'queries' map found")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", help="file with graft.Bench output (or a JSON line)")
    ap.add_argument("--baseline", default="tools/bench_baseline.json")
    ap.add_argument("--factor", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=0.15)
    ap.add_argument("--max-spread", type=float, default=1.25,
                    help="a regression flags only when the run's own "
                         "max/min rep spread for the query is below this "
                         "(a stable measurement); noisier ones report as "
                         "unstable and never fail the check")
    args = ap.parse_args()

    try:
        with open(args.bench) as f:
            text = f.read()
    except FileNotFoundError:
        text = args.bench  # allow passing the raw JSON line directly
    cur_doc = extract_bench(text)
    cur = cur_doc["queries"]

    with open(args.baseline) as f:
        base_doc = json.load(f)
    base = base_doc["queries"]

    # Epoch normalization: the box demonstrably slows 1.1-1.6x over a
    # round of sustained load, so absolute per-query times only compare
    # within a box epoch. graft.Bench times a fixed pure-Spark canary
    # (canary_sec) immediately before the measured run; the ratio of
    # the run's canary to the baseline's canary measures the epoch
    # drift, and every baseline scales by it before comparing. Clamped
    # to [1.0, 3.0]: a FASTER box never tightens thresholds below the
    # recorded baselines (those stay the honest floor), and a >3x
    # canary means the host is too sick to adjudicate. Runs/baselines
    # without a canary compare raw (ratio 1.0, legacy behavior).
    cur_canary = cur_doc.get("canary_sec")
    base_canary = base_doc.get("canary_sec")
    if cur_canary and base_canary:
        ratio = max(1.0, min(3.0, cur_canary / base_canary))
        print(f"canary: baseline {base_canary:.2f}s -> run {cur_canary:.2f}s; "
              f"epoch ratio {ratio:.2f}x applied to every baseline")
    else:
        ratio = 1.0
        print("canary: absent on "
              + ("both sides" if not cur_canary and not base_canary
                 else "baseline" if not base_canary else "run")
              + "; comparing raw (epoch ratio 1.00x)")

    # Contention self-identification: the artifact carries min AND max
    # per query (queries / queries_max over the run's reps). A would-be
    # regression only FLAGS when the run's own reps agree (max/min
    # spread below --max-spread): a query whose reps disagree by 25%+
    # was measured under host contention — the min is not trustworthy
    # as "the true cost went up", and two straight rounds of judge
    # reruns proved such flags evaporate on an idle host. Unstable
    # would-be flags are reported informationally and never exit 1.
    # Single-rep runs have max == min (spread 1.0) and flag normally.
    cur_max = cur_doc.get("queries_max") or {}
    flagged, improved, unstable = [], [], []
    for q in sorted(set(cur) & set(base)):
        c, b = cur[q], base[q] * ratio
        if c > args.factor * b and c - b > args.min_delta:
            spread = (cur_max.get(q, c) / c) if c > 0 else 1.0
            if spread < args.max_spread:
                flagged.append((q, b, c))
            else:
                unstable.append((q, b, c, spread))
        elif b > args.factor * c and b - c > args.min_delta:
            improved.append((q, b, c))
    new = sorted(set(cur) - set(base))
    gone = sorted(set(base) - set(cur))

    print(f"baseline: {base_doc.get('note', args.baseline)} "
          f"({len(base)} queries); current: {len(cur)} queries")
    for q, b, c in flagged:
        print(f"REGRESSION {q}: {b:.3f}s -> {c:.3f}s ({c / b:.2f}x)")
    for q, b, c, spread in unstable:
        print(f"unstable   {q}: {b:.3f}s -> {c:.3f}s ({c / b:.2f}x) but "
              f"in-run rep spread {spread:.2f}x >= {args.max_spread}x — "
              "contention, not flagged (rerun idle to adjudicate)")
    for q, b, c in improved:
        print(f"improved   {q}: {b:.3f}s -> {c:.3f}s ({c / b:.2f}x)")
    if new:
        print(f"new (no baseline): {', '.join(new)}")
    if gone:
        print(f"missing vs baseline: {', '.join(gone)}")
    tot_c = sum(cur.values())
    tot_b = sum(base[q] for q in base if q in cur)
    print(f"total over common queries: {tot_b:.1f}s baseline -> {tot_c - sum(cur[q] for q in new):.1f}s current")
    if flagged:
        print(f"{len(flagged)} regression(s) above {args.factor}x — investigate "
              "before trusting the round's bench", file=sys.stderr)
        sys.exit(1)
    print("no regressions above threshold")


if __name__ == "__main__":
    main()
