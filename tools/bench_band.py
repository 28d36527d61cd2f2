#!/usr/bin/env python3
"""Healthy-band check for Bench output (round-4 verdict ask #7).

Reads a file (or stdin) containing Bench stdout, finds the final summary
JSON line(s), and fails loudly unless ALL of:
  - at least one parseable summary line exists (tail-truncation guard);
  - "failed" is empty (a broken query must fail the round, not deflate it);
  - total is within the healthy band: max(160, 0.8 s x benched entries)
    at sf0.1 by default; an EXPLICIT --max-total is honored verbatim
    (tighten or loosen). The historical fixed 160 s encoded ~0.8 s/query at
    the round-4 registry size (~200 benched); scaling the cap with the
    benched count keeps that per-query allowance as the registry grows
    (r10: 239 benched -> 191 s cap) while the per-query cap below still
    catches individual regressions. The documented JIT-state variance
    band for the full battery is ~104-129 s at 200 entries; the margin
    absorbs attempt-2 reruns without masking a regression;
  - no single query exceeds the per-query cap (default 6 s — above every
    healthy steady state; the heaviest plans measure ~2.4-3 s at sf0.1).

Usage: bench_band.py <bench_stdout_file|-> [--max-total 160] [--max-query 6]
Exit 0 = in band; 1 = out of band / failed queries; 2 = no summary found.
"""
import argparse
import json
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    # None = not passed: the registry-scaled default applies. An EXPLICIT
    # --max-total is honored verbatim (never silently loosened) so an
    # operator can tighten the gate while bisecting a regression.
    ap.add_argument("--max-total", type=float, default=None)
    ap.add_argument("--max-query", type=float, default=6.0)
    args = ap.parse_args()

    text = sys.stdin.read() if args.file == "-" else open(args.file).read()
    rc = None
    # driver artifact form: {"n":…,"rc":…,"tail":"<stdout tail>"} — unwrap
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            rc = doc.get("rc")
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    summaries = []
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith('{"metric":"total"'):
            continue
        try:
            summaries.append(json.loads(line))
        except json.JSONDecodeError:
            pass  # e.g. the full per-query line sheared by a tail window

    if not summaries:
        print("BAND FAIL: no parseable summary line (tail truncation or crash)")
        sys.exit(2)

    # Judge the MOST RECENT run only. A run emits its full per-query line
    # then a compact duplicate (the compact exists to survive tail
    # shearing), so the latest run's full line — if it survived — is the
    # last or second-to-last summary. An older run's full line must NOT
    # stand in for a newer run whose full line was damaged: totals/failed
    # always come from the newest summary, per-query detail only from a
    # full line belonging to that same newest run.
    compact = summaries[-1]
    full = None
    if "queries" in compact:
        full = compact
    elif len(summaries) >= 2 and "queries" in summaries[-2]:
        # Guard (round-6 ADVICE): only trust summaries[-2] as this run's
        # full line if it AGREES with the compact line — same query count
        # and same total within epsilon. If the newest run's full line was
        # sheared by the tail window, summaries[-2] is an OLDER run's line
        # and must not supply per-query detail; fall through to the
        # compact line's worst_q/worst_sec path instead.
        cand = summaries[-2]
        if (len(cand["queries"]) == compact.get("n")
                and abs(cand.get("value", -1) - compact.get("value", -2)) < 1e-6):
            full = cand
    total = compact["value"]
    failed = compact.get("failed", [])
    bad = []

    # The fixed 160 s default encoded ~0.8 s/query of allowance when the
    # benched registry was ~200 entries (round 4); a fixed total over a
    # GROWING registry would penalize adding operators, while a pure
    # per-query mean would let one 100x regression hide in the average.
    # So the effective cap is the larger of the explicit --max-total and
    # 0.8 s x benched-entry count — the same per-query allowance at any
    # registry size — and the --max-query per-query cap still catches
    # individual regressions.
    n_benched = compact.get("n") or len(compact.get("queries", {}))
    if args.max_total is not None:
        max_total, cap_src = args.max_total, "explicit --max-total"
    elif n_benched:
        max_total, cap_src = max(160.0, 0.8 * n_benched), f"max(160, 0.8 x {n_benched} benched)"
    else:
        max_total, cap_src = 160.0, "default 160"

    if rc not in (None, 0):
        bad.append(f"bench rc={rc}")
    if failed:
        bad.append(f"failed queries: {failed}")
    if total > max_total:
        bad.append(f"total {total:.1f} s > band max {max_total:.1f} s ({cap_src})")
    if full:
        slow = {q: s for q, s in full["queries"].items() if s > args.max_query}
        if slow:
            bad.append(f"queries over {args.max_query:.1f} s: " +
                       ", ".join(f"{q}={s:.2f}" for q, s in sorted(slow.items())))
    elif compact.get("worst_sec", 0) > args.max_query:
        bad.append(f"worst query {compact['worst_q']} = "
                   f"{compact['worst_sec']:.2f} s > {args.max_query:.1f} s")

    n = (full or compact).get("n") or len((full or {}).get("queries", {}))
    if bad:
        print(f"BAND FAIL ({n} queries, total {total:.1f} s):")
        for b in bad:
            print(f"  - {b}")
        sys.exit(1)
    print(f"BAND OK: {n} queries, total {total:.1f} s, "
          f"worst {compact.get('worst_q', '?')} = {compact.get('worst_sec', 0):.2f} s")


if __name__ == "__main__":
    main()
