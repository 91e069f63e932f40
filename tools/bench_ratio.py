#!/usr/bin/env python3
"""Cross-SF bench ratio gate: catches a super-linear operator mechanically.

Usage: bench_ratio.py <small_bench.json> <big_bench.json> [--sf-step N]
       [--max-ratio 15] [--out ratio.md]

Reads two graft.Bench artifacts (the big one-line JSON with a "queries"
map) taken at two scale factors, computes per-query time ratios for the
step, and fails (exit 1) when any query grows faster than --max-ratio.
The data step is DERIVED from the artifacts' own "sf" stamps (the
trailing sf<N> of each dir path) unless --sf-step overrides it, so the
header can never mislabel the comparison (the r16 artifact said "10x
data step" over a sf0.001 -> sf0.1 = 100x comparison; the gate was
therefore stricter than labeled). Linear scaling predicts ~step x; the
default max-ratio of 15 over the round-driver's 100x step demands
STRONG sub-linearity (worst observed r16: 8.5x), which the engine's
floor-dominated small-SF timings actually deliver — anything
quadratic-ish shows ~10,000x on a 100x step and cannot hide.

Small-side floor: sub-0.15 s timings at the small SF are dominated by
fixed per-query overhead (job scheduling, parquet footers), so the
denominator is floored at 0.15 s -- otherwise a 0.04 s -> 0.8 s query
reads as "20x, super-linear!" when it is actually constant-overhead both
times. The floor makes the gate conservative in exactly the regime where
the signal is noise.

Queries present in only one artifact are listed (loudly) but not gated --
a registry change between the two runs must not silently hide a new
query's scaling, so they fail the run unless --allow-missing.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        rep = json.load(f)
    if "queries" not in rep:
        sys.exit(f"{path}: not a graft.Bench big-line artifact (no 'queries')")
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--sf-step", type=float, default=None,
                    help="data-size multiple between the two runs "
                         "(default: derived from the artifacts' sf stamps)")
    ap.add_argument("--max-ratio", type=float, default=15.0,
                    help="fail when t_big/max(t_small, floor) exceeds this")
    ap.add_argument("--floor", type=float, default=0.15,
                    help="small-side denominator floor in seconds")
    ap.add_argument("--out", default=None, help="write a markdown table here")
    ap.add_argument("--allow-missing", action="store_true",
                    help="tolerate queries present in only one artifact")
    args = ap.parse_args()

    small, big = load(args.small), load(args.big)
    if args.sf_step is None:
        import re
        def sf_of(rep, path):
            m = re.search(r"sf([0-9.]+)/?$", str(rep.get("sf", "")))
            if not m:
                sys.exit(f"{path}: cannot derive sf from stamp "
                         f"{rep.get('sf')!r}; pass --sf-step explicitly")
            return float(m.group(1))
        args.sf_step = sf_of(big, args.big) / sf_of(small, args.small)
    sq = {k: v for k, v in small["queries"].items() if v >= 0}
    bq = {k: v for k, v in big["queries"].items() if v >= 0}
    only_small = sorted(set(sq) - set(bq))
    only_big = sorted(set(bq) - set(sq))

    rows = []
    for name in sorted(set(sq) & set(bq)):
        denom = max(sq[name], args.floor)
        ratio = bq[name] / denom
        rows.append((ratio, name, sq[name], bq[name],
                     "floored" if sq[name] < args.floor else ""))
    rows.sort(reverse=True)
    outliers = [r for r in rows if r[0] > args.max_ratio]

    hdr = (f"| query | t(sf {small.get('sf', '?')}) | t(sf {big.get('sf', '?')}) "
           f"| ratio | note |")
    lines = [
        f"Cross-SF ratio gate: {len(rows)} queries, {args.sf_step:g}x data step, "
        f"fail above {args.max_ratio:g}x (small side floored at {args.floor:g}s).",
        "",
        hdr,
        "|---|---|---|---|---|",
    ]
    for ratio, name, ts, tb, note in rows:
        flag = " **OUTLIER**" if ratio > args.max_ratio else ""
        lines.append(f"| {name} | {ts:.3f}s | {tb:.3f}s | {ratio:.1f}x{flag} | {note} |")
    if only_small or only_big:
        lines += ["", f"Ungated (present in one artifact only): "
                      f"small-only={only_small} big-only={only_big}"]
    report = "\n".join(lines) + "\n"

    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
    # stdout: the summary + every outlier named, never just a count
    print(f"{len(rows)} queries compared; {len(outliers)} above "
          f"{args.max_ratio:g}x; loads: small={small.get('load_avg_1m')} "
          f"big={big.get('load_avg_1m')} contended: "
          f"small={small.get('contended')} big={big.get('contended')}")
    for ratio, name, ts, tb, _ in outliers:
        print(f"OUTLIER {name}: {ts:.3f}s -> {tb:.3f}s = {ratio:.1f}x")
    if (only_small or only_big) and not args.allow_missing:
        print(f"MISSING queries (run both SFs on the same build): "
              f"small-only={only_small} big-only={only_big}")
        sys.exit(1)
    sys.exit(1 if outliers else 0)


if __name__ == "__main__":
    main()
