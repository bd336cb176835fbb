#!/usr/bin/env python3
"""Emit the per-query sf0.1 -> sf1 growth-factor table (markdown).

Usage: python3 tools/growth_table.py SF01.json[,SF01b.json] SF1.json[,...] [flag=15]
       python3 tools/growth_table.py --selftest

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
from statistics import median

sys.path.insert(0, str(Path(__file__).parent))
from bench_diff import payload, median_map  # same parsing + median contract


def selftest():
    import tempfile
    # two recordings per side: the median must damp the planted outlier
    # (q_noisy spikes 10x in ONE small recording; median keeps ratio ~2)
    small1 = {"queries": {"q_lin": 1.0, "q_noisy": 1.0}, "cpu_ms": {"q_lin": 100, "q_noisy": 100}}
    small2 = {"queries": {"q_lin": 1.2, "q_noisy": 10.0}, "cpu_ms": {"q_lin": 120, "q_noisy": 1000}}
    big = {"queries": {"q_lin": 10.0, "q_noisy": 11.0}, "cpu_ms": {"q_lin": 1000, "q_noisy": 1100}}
    def dump(d):
        f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(dict(d, top20_s=d["queries"]), f)
        f.close()
        return f.name
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["growth_table", ",".join([dump(small1), dump(small2)]), dump(big), "8"])
    out = buf.getvalue()
    # median small wall for q_noisy = 5.5 -> ratio 2.0: must NOT be flagged;
    # q_lin median 1.1 -> ratio 9.1: flagged over the planted 8x threshold
    assert "FLAGGED (> 8.0x wall for 10x data): 1" in out, out
    assert "q_lin:" in out.split("FLAGGED")[1], out
    assert "| q_noisy | 5.50 | 11.00 | 2.0 |" in out, out
    print("selftest ok")
    return 0


def main(argv):
    if "--selftest" in argv:
        return selftest()
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
    if not rows:
        raise SystemExit("no comparable queries between the two sides")
    n = len(rows)
    med = median(t[3] for t in rows)
    print(f"\nqueries compared: {n}; median wall ratio {med:.2f}; "
          f"totals {sum(t[1] for t in rows):.1f} -> {sum(t[2] for t in rows):.1f} s")


if __name__ == "__main__":
    main(sys.argv)
