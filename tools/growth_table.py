#!/usr/bin/env python3
"""Emit the per-query sf0.1 -> sf1 growth-factor table (markdown).

Usage: python3 tools/growth_table.py SF01.json[,SF01b.json] SF1.json[,...] [flag=15]

Inputs are bench recordings in either shape bench_diff accepts (a raw
Bench stdout capture wrapped as {"tail": ...} or the payload line itself);
comma-separate multiple recordings per side to use per-query MEDIANS (the
r11 find: a single recording on a shared box can inflate individual heavy
ops several-fold — bench_diff's median contract applies here too).
Ratio = sf1 wall / sf0.1 wall per query (cpu_ms ratio shown beside it when
both sides carry the map — cpu is the less scheduler-noisy signal).
Every op whose WALL ratio exceeds the flag threshold (default 15x for 10x
data) is listed separately for adjudication; sub-second sf0.1 walls are
annotated since a ratio over a tiny base is mostly overhead noise.

Dev-only tool -- NOT part of the shipped Scala library.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from bench_diff import payload, median_map  # same parsing + median contract


def main(argv):
    if len(argv) < 3:
        raise SystemExit(__doc__)
    smalls = [payload(p) for p in argv[1].split(",")]
    bigs = [payload(p) for p in argv[2].split(",")]
    flag = float(argv[3]) if len(argv) > 3 else 15.0
    sq, bq = median_map(smalls, "queries"), median_map(bigs, "queries")
    if not sq or not bq:
        raise SystemExit("both recordings need the full 'queries' map")
    scpu = median_map(smalls, "cpu_ms") or {}
    bcpu = median_map(bigs, "cpu_ms") or {}
    rows = []
    for q in sorted(sq):
        if q not in bq or sq[q] <= 0 or bq[q] <= 0:
            continue
        r = bq[q] / sq[q]
        rc = (bcpu[q] / scpu[q]) if q in scpu and q in bcpu and scpu[q] > 0 else None
        rows.append((q, sq[q], bq[q], r, rc))
    rows.sort(key=lambda t: -t[3])
    print(f"| query | sf0.1 s | sf1 s | wall ratio | cpu ratio |")
    print(f"|---|---|---|---|---|")
    for q, s, b, r, rc in rows:
        rcs = f"{rc:.1f}" if rc is not None else "-"
        print(f"| {q} | {s:.2f} | {b:.2f} | {r:.1f} | {rcs} |")
    flagged = [t for t in rows if t[3] > flag]
    print()
    print(f"FLAGGED (> {flag}x wall for 10x data): {len(flagged)}")
    for q, s, b, r, rc in flagged:
        note = " [sub-second sf0.1 base]" if s < 1.0 else ""
        print(f"  {q}: {s:.2f} -> {b:.2f} s ({r:.1f}x){note}")
    n = len(rows)
    med = sorted(t[3] for t in rows)[n // 2]
    print(f"\nqueries compared: {n}; median wall ratio {med:.2f}; "
          f"totals {sum(t[1] for t in rows):.1f} -> {sum(t[2] for t in rows):.1f} s")


if __name__ == "__main__":
    main(sys.argv)
