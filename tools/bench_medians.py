#!/usr/bin/env python3
"""Per-query bench medians + noise-band regression flags (VERDICT r14 #6).

BENCH_HISTORY.jsonl accumulates every full-precision bench run (one JSON
line per run, {"queries": {name: sec, ...}, ...}). Same-code quiet runs
measured a worst per-query spread of 1.81x on this box, so a single
run-over-run comparison is noise below that floor. This tool computes
per-query MEDIANS across the recorded runs and flags only queries whose
LATEST run exceeds median * threshold — signal, not noise.

r17 (VERDICT r16 #4): flags are REGIME-NORMALIZED, twice over — by the
run's GLOBAL regime (median over all queries of time/cross-run-median:
a slow box inflates everything together) AND by each query's ROLLING
local regime (median relative speed of its ±12 alphabetical run-order
neighbors: a busy window covering part of the run inflates a contiguous
cluster the whole-run median cannot see — observed twice in live
history). A flag must survive both. A genuine single-query regression
moves against both regimes and still fires; a regression broad enough
to slow 25 adjacent queries uniformly reads as regime — the recorded
trivial-scan sentinel + load average per history line adjudicate that
class. Raw-flagged-but-regime-explained queries print separately (the
recurring "quiet-box letter" class, closed).

r19 (VERDICT r18 #3): runs whose history line carries per-query
run-order "offsets" (Bench emits them since r19) get a THIRD
normalization — a +-45 s run-position window regime — which localizes
mid-run busy windows directly instead of inferring them from
alphabetical adjacency, and the detected spans are printed so the
letter-cluster class self-adjudicates (the r18 driver line's 9 s-t
flags needed a judge with four same-code runs for exactly this).

Usage: python3 tools/bench_medians.py [history.jsonl] [threshold]
       python3 tools/bench_medians.py --table [N] [history.jsonl]
  history.jsonl  default BENCH_HISTORY.jsonl
  threshold      default 1.81 (the measured same-code spread floor)
  --table N      emit a markdown medians table (top-N by median,
                 default 15) for pasting into round logs (§7.9 #7)

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
    med_of = {q: statistics.median(s) for q, s in hist.items()}
    # regime factor per run (VERDICT r16 #4): the box regime moves EVERY
    # query together (112–167 s same-code totals), so a run's median
    # relative speed — median over queries of time/median-across-runs —
    # estimates its regime, and dividing it out leaves only per-query
    # code movement (median polish). Runs that recorded the Bench
    # sentinel scan also report it (and load avg) for adjudication, but
    # the factor uses all queries: it exists for every historical line
    # and has ~200x the sample size of one sentinel.
    def regime(r):
        rel = [t / med_of[q] for q, t in r["queries"].items()
               if med_of.get(q, 0) > 0]
        return statistics.median(rel) if rel else 1.0
    reg_latest = regime(runs[-1])
    # ROLLING regime (r17 second adjudication round): Bench runs queries
    # in ALPHABETICAL order, so a busy window that covers part of the
    # run inflates an alphabetically CONTIGUOUS cluster (observed twice:
    # a q_tpch_* cluster, then a j–p cluster of sub-second queries) that
    # a whole-run median cannot see. Each query's local regime is the
    # median relative speed of its ±12 run-order neighbors in the latest
    # run; a flag must survive BOTH normalizations. Self-inclusion
    # dilutes a genuine single-query regression by <1/25th (the median
    # barely moves), while a window burst IS its neighbors' regime and
    # divides out. Caveat (inherent): a real regression broad enough to
    # slow 25 adjacent queries uniformly reads as regime — that class is
    # what the recorded trivial-scan sentinel adjudicates.
    order = [q for q in sorted(latest.keys()) if med_of.get(q, 0) > 0]
    rel_latest = {q: latest[q] / med_of[q] for q in order}
    local_reg = {}
    for i, q in enumerate(order):
        lo, hi = max(0, i - 12), min(len(order), i + 13)
        local_reg[q] = statistics.median(rel_latest[w] for w in order[lo:hi])
    # RUN-ORDER window regime (r19, VERDICT r18 #3): runs that recorded
    # per-query elapsed offsets (Bench emits "offsets" since r19) get a
    # third normalization computed against run POSITION, not alphabet: a
    # query's window regime is the median relative speed of every query
    # whose measurement STARTED within +-45 s of its own. A mid-run busy
    # window inflates a time-contiguous span — exactly the class the r18
    # driver line needed a judge for (its 9 flags were the s-t cluster,
    # all at median in four same-code runs) — and divides out here; a
    # genuine single-query regression barely moves a 45-s window median.
    offsets = runs[-1].get("offsets") or {}
    window_reg, windows = {}, []
    if offsets:
        timed = sorted((offsets[q], q) for q in order if q in offsets)
        for t, q in timed:
            near = [rel_latest[w] for (tw, w) in timed if abs(tw - t) <= 45]
            if len(near) >= 5:
                window_reg[q] = statistics.median(near)
        # surface the detected busy spans so the adjudication is
        # self-explaining (contiguous offsets whose window regime > 1.3)
        span = None
        for t, q in timed:
            if window_reg.get(q, 1.0) > 1.3:
                span = [t, t] if span is None else [span[0], t]
            elif span is not None:
                windows.append(tuple(span)); span = None
        if span is not None:
            windows.append(tuple(span))
    rows = []
    for q, secs in sorted(hist.items()):
        med = statistics.median(secs)
        cur = latest.get(q)
        ratio = (cur / med) if (cur is not None and med > 0) else None
        if ratio is None:
            norm = None
        else:
            norm = ratio / max(reg_latest, local_reg.get(q, 1.0),
                               window_reg.get(q, 1.0))
        rows.append((q, med, cur, ratio, len(secs), norm))
    totals = [r["value"] for r in runs if r.get("metric") == "total"]
    sent = runs[-1].get("sentinel")
    load = runs[-1].get("load")
    extra = ""
    if sent is not None:
        extra += f"; sentinel {sent:.2f} s"
    if load is not None:
        extra += f", load {load:.1f}"
    print(f"{len(runs)} runs; total median {statistics.median(totals):.2f} s, "
          f"latest {totals[-1]:.2f} s; latest regime {reg_latest:.2f}x"
          f"{extra}; flag threshold {threshold}x over median "
          f"(regime-normalized)")
    if offsets and windows:
        spans = ", ".join(f"~[{a:.0f}-{b:.0f}] s" for a, b in windows)
        print(f"busy run-order window(s) detected (window regime > 1.3x, "
              f"adjudicated as REGIME not regression): {spans}")
    elif not offsets:
        print("latest run carries no run-order offsets (pre-r19 line) — "
              "window adjudication unavailable, alphabetical rolling only")
    flagged = [r for r in rows if r[5] is not None and r[5] > threshold]
    raw_only = [r for r in rows
                if r[3] is not None and r[3] > threshold and r[5] <= threshold]
    missing = [r for r in rows if r[2] is None]
    print(f"\n== flagged (> {threshold}x median after regime "
          f"normalization): {len(flagged)} ==")
    for q, med, cur, ratio, n, norm in sorted(flagged, key=lambda r: -r[5]):
        print(f"  {q:32s} median {med:7.3f}  latest {cur:7.3f}  "
              f"raw {ratio:5.2f}x  norm {norm:5.2f}x  (n={n})")
    if raw_only:
        print(f"\n== raw-flagged but regime-explained (the quiet-box "
              f"letter class): {len(raw_only)} ==")
        for q, med, cur, ratio, n, norm in sorted(raw_only, key=lambda r: -r[3]):
            print(f"  {q:32s} median {med:7.3f}  latest {cur:7.3f}  "
                  f"raw {ratio:5.2f}x  norm {norm:5.2f}x  (n={n})")
    if missing:
        print(f"\n== in history but not in latest run: "
              f"{', '.join(q for q, *_ in missing)} ==")
    top = sorted((r for r in rows if r[3] is not None), key=lambda r: -r[1])[:10]
    print("\n== slowest by median ==")
    for q, med, cur, ratio, n, norm in top:
        print(f"  {q:32s} median {med:7.3f}  latest {cur:7.3f}  "
              f"raw {ratio:5.2f}x  norm {norm:5.2f}x  (n={n})")


def table(n=15, path="BENCH_HISTORY.jsonl"):
    """Markdown medians table for round logs — top-n queries by median,
    plus the totals row, computed over every recorded run."""
    runs = [json.loads(l) for l in open(path) if l.strip()]
    runs = [r for r in runs if "queries" in r]
    hist = {}
    for r in runs:
        for q, s in r["queries"].items():
            hist.setdefault(q, []).append(s)
    latest = runs[-1]["queries"]
    totals = [r["value"] for r in runs if r.get("metric") == "total"]
    print(f"| query | median s (n={len(runs)} runs) | latest s | ratio |")
    print("|---|---|---|---|")
    print(f"| TOTAL ({len(latest)} queries) | "
          f"{statistics.median(totals):.2f} | {totals[-1]:.2f} | "
          f"{totals[-1] / statistics.median(totals):.2f}x |")
    rows = sorted(((q, statistics.median(s)) for q, s in hist.items()),
                  key=lambda r: -r[1])[:n]
    for q, med in rows:
        cur = latest.get(q)
        cell = f"{cur:.2f}" if cur is not None else "—"
        ratio = f"{cur / med:.2f}x" if cur is not None and med > 0 else "—"
        print(f"| {q} | {med:.2f} | {cell} | {ratio} |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--table":
        table(int(sys.argv[2]) if len(sys.argv) > 2 else 15,
              sys.argv[3] if len(sys.argv) > 3 else "BENCH_HISTORY.jsonl")
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "BENCH_HISTORY.jsonl",
             float(sys.argv[2]) if len(sys.argv) > 2 else 1.81)
