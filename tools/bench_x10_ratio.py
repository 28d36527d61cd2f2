#!/usr/bin/env python3
"""Wall-time band at scale (r15 VERDICT ask #4): compare per-entry bench
times at ×10 (the inflated dup-mode workdir) against ×1 (sf0.1) and flag
any entry whose ×10/×1 ratio exceeds the band — a correct-but-superlinear
entry passes every correctness gate and, until now, only surfaced when an
oracle replay happened to blow up.

Band default 12×: linear-in-data at FIXED parallelism is ≤10×, and most
sf0.1 entries underutilize 32 cores so added rows first fill idle
parallelism (historical ScaleProbe ratios-vs-linear 0.04–0.5); 12 gives
~3× headroom over the typical measured growth while sitting far below
a quadratic blowup (100×). Entries faster than --min-sec at ×1 are
ratio-exempt (sub-100ms timings are JIT noise) but still capped
absolutely at --max-sec at ×10.

Usage: bench_x10_ratio.py <x1_bench_stdout> <x10_bench_stdout>...
       [--max-ratio 12] [--min-sec 0.1] [--max-sec 60] [--out OUT.json]
Multiple ×10 files = a triple; the per-entry MIN across runs is compared
(same discipline as Bench's own min-of-2). Exit 1 on any flagged entry.
"""
import argparse
import json
import sys


def summaries(path):
    out = []
    for line in open(path):
        line = line.strip()
        if line.startswith('{"metric":"total"') and '"queries"' in line:
            out.append(json.loads(line))
    if not out:
        sys.exit(f"no parseable full summary line in {path}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("x1")
    ap.add_argument("x10", nargs="+")
    ap.add_argument("--max-ratio", type=float, default=12.0)
    ap.add_argument("--min-sec", type=float, default=0.1)
    ap.add_argument("--max-sec", type=float, default=60.0)
    ap.add_argument("--out")
    args = ap.parse_args()

    q1 = summaries(args.x1)[-1]["queries"]
    runs = [summaries(p)[-1]["queries"] for p in args.x10]
    q10 = {k: min(r[k] for r in runs if k in r)
           for k in runs[0] if all(k in r for r in runs)}

    entries, flagged = {}, []
    for name in sorted(q1):
        if name not in q10:
            continue
        t1, t10 = q1[name], q10[name]
        ratio = t10 / t1 if t1 > 0 else None
        exempt = t1 < args.min_sec
        bad = (not exempt and ratio is not None and ratio > args.max_ratio) or \
            t10 > args.max_sec
        entries[name] = {"x1_sec": t1, "x10_sec": t10,
                         "ratio": None if ratio is None else round(ratio, 2),
                         "ratio_exempt_small_x1": exempt, "flagged": bad}
        if bad:
            flagged.append(name)
            print(f"FLAG {name}: x1 {t1:.2f}s -> x10 {t10:.2f}s "
                  f"(ratio {ratio:.1f}, band {args.max_ratio}, abs cap {args.max_sec}s)")
    tot1 = sum(q1[k] for k in entries)
    tot10 = sum(q10[k] for k in entries)
    print(f"== x10 band: {len(entries)} entries, total x1 {tot1:.1f}s -> x10 {tot10:.1f}s "
          f"(aggregate ratio {tot10 / tot1:.2f}), {len(flagged)} flagged")
    doc = {"max_ratio": args.max_ratio, "min_sec": args.min_sec,
           "max_sec": args.max_sec, "n": len(entries),
           "total_x1_sec": round(tot1, 1), "total_x10_sec": round(tot10, 1),
           "aggregate_ratio": round(tot10 / tot1, 3),
           "flagged": flagged, "entries": entries}
    if args.out:
        json.dump(doc, open(args.out, "w"), indent=1, sort_keys=True)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
