#!/usr/bin/env python3
"""Per-query bench medians + noise-band regression flags (VERDICT r14 #6).

BENCH_HISTORY.jsonl accumulates every full-precision bench run (one JSON
line per run, {"queries": {name: sec, ...}, ...}). Same-code quiet runs
measured a worst per-query spread of 1.81x on this box, so a single
run-over-run comparison is noise below that floor. This tool computes
per-query MEDIANS across the recorded runs and flags only queries whose
LATEST run exceeds median * threshold — signal, not noise.

Usage: python3 tools/bench_medians.py [history.jsonl] [threshold]
  history.jsonl  default BENCH_HISTORY.jsonl
  threshold      default 1.81 (the measured same-code spread floor)

Exit code 0 always (informational — regressions need a human read);
prints a summary table sorted by latest/median ratio.
"""
import json, statistics, sys


def main(path="BENCH_HISTORY.jsonl", threshold=1.81):
    runs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "queries" in d:
                runs.append(d)
    if len(runs) < 2:
        print(f"only {len(runs)} run(s) in {path} — medians need >= 2")
        return
    latest = runs[-1]["queries"]
    hist = {}
    for r in runs:
        for q, s in r["queries"].items():
            hist.setdefault(q, []).append(s)
    rows = []
    for q, secs in sorted(hist.items()):
        med = statistics.median(secs)
        cur = latest.get(q)
        ratio = (cur / med) if (cur is not None and med > 0) else None
        rows.append((q, med, cur, ratio, len(secs)))
    totals = [r["value"] for r in runs if r.get("metric") == "total"]
    print(f"{len(runs)} runs; total median {statistics.median(totals):.2f} s, "
          f"latest {totals[-1]:.2f} s; flag threshold {threshold}x over median")
    flagged = [r for r in rows if r[3] is not None and r[3] > threshold]
    missing = [r for r in rows if r[2] is None]
    print(f"\n== flagged (> {threshold}x median): {len(flagged)} ==")
    for q, med, cur, ratio, n in sorted(flagged, key=lambda r: -r[3]):
        print(f"  {q:32s} median {med:7.3f}  latest {cur:7.3f}  {ratio:5.2f}x  (n={n})")
    if missing:
        print(f"\n== in history but not in latest run: "
              f"{', '.join(q for q, *_ in missing)} ==")
    top = sorted((r for r in rows if r[3] is not None), key=lambda r: -r[1])[:10]
    print("\n== slowest by median ==")
    for q, med, cur, ratio, n in top:
        print(f"  {q:32s} median {med:7.3f}  latest {cur:7.3f}  {ratio:5.2f}x  (n={n})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_HISTORY.jsonl",
         float(sys.argv[2]) if len(sys.argv) > 2 else 1.81)
