#!/usr/bin/env python3
"""Round-over-round per-query bench regression gate.

Usage:
  python3 tools/bench_diff.py                    # two newest BENCH_r*.json
  python3 tools/bench_diff.py OLD.json NEW.json  # explicit pair
  python3 tools/bench_diff.py --selftest         # planted-regression check

Compares the `top20_s` maps of consecutive driver bench artifacts and
prints one line per query that got >25% slower round-over-round (absolute
slowdown must also exceed 0.25 s, so sub-second noise-band wobble never
flags), plus any new top-20 entrant whose cost exceeds the old round's
median — the two shapes that slipped through in r8 (the funnel entered at
bench rank 1 unflagged). Exit code 1 when anything flags.

Dev-only tool — NOT part of the shipped Scala library.
"""
import json
import re
import sys
from pathlib import Path

REL_THRESHOLD = 0.25   # >25% slower flags...
ABS_FLOOR_S = 0.25     # ...but only if also >0.25s slower in absolute terms


def payload(path):
    """The bench JSON line with top20_s — direct, or inside a driver
    wrapper whose `tail` field holds the run's captured output lines."""
    d = json.loads(Path(path).read_text())
    if "top20_s" in d:
        return d
    best = None
    for line in str(d.get("tail", "")).splitlines():
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            j = json.loads(line[i:])
        except json.JSONDecodeError:
            continue
        if "top20_s" in j:
            best = j  # last payload line wins (the compact headline)
    if best is None:
        raise SystemExit(f"{path}: no top20_s payload found")
    return best


def diff(old, new):
    """Regression lines for new-vs-old top20 maps. Pure function — the
    selftest runs it on planted data."""
    o, n = old["top20_s"], new["top20_s"]
    med_old = sorted(o.values())[len(o) // 2] if o else 0.0
    lines = []
    for q, t in sorted(n.items(), key=lambda kv: -kv[1]):
        if q in o:
            dt = t - o[q]
            if dt > ABS_FLOOR_S and dt / o[q] > REL_THRESHOLD:
                lines.append(f"REGRESSION {q}: {o[q]:.2f}s -> {t:.2f}s "
                             f"(+{100 * dt / o[q]:.0f}%)")
        elif t > med_old:
            lines.append(f"NEW-HEAVY  {q}: {t:.2f}s entered the top-20 "
                         f"above the prior round's median ({med_old:.2f}s)")
    return lines


def selftest():
    old = {"top20_s": {"a": 4.0, "b": 2.0, "c": 1.0, "d": 0.4}}
    new = {"top20_s": {"a": 5.5, "b": 2.1, "c": 1.2, "d": 0.6, "e": 3.0}}
    got = diff(old, new)
    assert any(l.startswith("REGRESSION a:") for l in got), got   # +37%, +1.5s
    assert any(l.startswith("NEW-HEAVY  e:") for l in got), got   # new, > median
    assert not any(" b:" in l for l in got), got                  # +5%: noise
    assert not any(" d:" in l for l in got), got                  # +50% but +0.2s
    assert not any(" c:" in l for l in got), got                  # +20%: under rel
    assert len(got) == 2, got
    print("selftest ok")


def main(argv):
    if argv[1:2] == ["--selftest"]:
        return selftest()
    if len(argv) == 3:
        paths = [argv[1], argv[2]]
    else:
        benches = sorted(Path(__file__).resolve().parent.parent
                         .glob("BENCH_r*.json"),
                         key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
        if len(benches) < 2:
            raise SystemExit("need two BENCH_r*.json artifacts to diff")
        paths = [str(benches[-2]), str(benches[-1])]
    old, new = payload(paths[0]), payload(paths[1])
    lines = diff(old, new)
    print(f"bench diff {Path(paths[0]).name} -> {Path(paths[1]).name}: "
          f"{len(lines)} flag(s)")
    for l in lines:
        print(l)
    return 1 if lines else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
