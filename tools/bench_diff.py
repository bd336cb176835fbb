#!/usr/bin/env python3
"""Round-over-round per-query bench regression gate.

Usage:
  python3 tools/bench_diff.py                        # two newest BENCH_r*.json
  python3 tools/bench_diff.py OLD.json NEW.json      # explicit pair
  python3 tools/bench_diff.py OLD1,OLD2 NEW1,NEW2,NEW3   # median-of-N per side
  python3 tools/bench_diff.py --selftest             # planted-regression check

Adjudication hardening (r9 verdict #1): wall clock at 32 threads is noisy —
identical-code back-to-back runs flag non-overlapping 2-3 s queries. So when
every recording on both sides carries the full `cpu_ms` map, the gate flags
on per-query executor CPU (the stable signal) and reports the wall delta as
context; wall is the fallback for old artifacts that only carry `top20_s`.
Each side may be a comma-separated list of recordings — per-query medians
(true median: mean of the middle two for even counts) absorb single-run
noise, so a median-of-3 recording is one command, not a by-hand ritual.

Flags:
  REGRESSION — primary metric >25% AND above the absolute floor
               (0.25 s wall / 1000 ms cpu) slower than the old median.
  NEW-HEAVY  — a query absent from the old round's FULL map whose cost
               exceeds the old top-20 median (a genuinely new op entering
               heavy). When the old artifact carries the full queries map,
               a returning query is diffed against its real old time instead
               of being mislabeled an entrant (r9 ADVICE).

Exit code 1 when anything flags. Dev-only tool — NOT part of the shipped
Scala library.
"""
import json
import re
import sys
from pathlib import Path
from statistics import median

REL_THRESHOLD = 0.25      # >25% slower flags...
ABS_FLOOR_WALL_S = 0.25   # ...but only past the absolute floor (wall metric)
ABS_FLOOR_CPU_MS = 1000   # absolute floor when CPU is the primary metric


def payload(path):
    """The bench JSON line with top20_s — direct, or inside a driver
    wrapper whose `tail` field holds the run's captured output lines.

    r12: a driver wrapper's 2000-char tail can never carry the full
    per-query maps, so the headline now points at a full sidecar artifact
    (`full_artifact` + `run_id`). When the pointer resolves — same run_id
    in the "last" file, else a run_id scan of the append-only history
    jsonl beside it — the full recording (per-query wall AND cpu medians)
    replaces the top-20-wall headline; otherwise the headline is the
    honest fallback, as before.
    """
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
    if "queries" not in best and best.get("full_artifact") and best.get("run_id"):
        full = _resolve_full(Path(path).resolve().parent,
                             best["full_artifact"], best["run_id"])
        if full is not None:
            return full
        print(f"[bench_diff] {path}: full_artifact pointer "
              f"{best['full_artifact']} (run_id {best['run_id']}) did not "
              f"resolve; falling back to the top-20 wall headline",
              file=sys.stderr)
    return best


def _resolve_full(root, rel, run_id):
    """The full sidecar recording matching run_id: the `last` file if its id
    matches, else the matching line of the history jsonl derived from the
    same name (`bench_full_last_X.json` -> `bench_history_X.jsonl`). The
    pointer is repo-relative — try the wrapper's own directory first (the
    committed BENCH_r{N}.json sits at the repo root), then this script's
    repo as the fallback for wrappers read from elsewhere."""
    for base in (root, Path(__file__).resolve().parent.parent):
        last = base / rel
        try:
            j = json.loads(last.read_text())
            if j.get("run_id") == run_id and "queries" in j:
                return j
        except (OSError, json.JSONDecodeError):
            pass
        hist = last.parent / last.name.replace("bench_full_last_",
                                                "bench_history_")
        hist = hist.with_suffix(".jsonl")
        try:
            for line in hist.read_text().splitlines():
                try:
                    j = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if j.get("run_id") == run_id and "queries" in j:
                    return j
        except OSError:
            pass
    return None


def median_map(payloads, key):
    """Per-query median of `key` maps across recordings; None unless EVERY
    recording carries the map (a median over a partial set would silently
    change what the number means)."""
    maps = [p.get(key) for p in payloads]
    if not maps or any(m is None for m in maps):
        return None
    out = {}
    for q in set().union(*maps):
        vals = [m[q] for m in maps if q in m and m[q] >= 0]
        if vals:
            out[q] = median(vals)
    return out


def diff(olds, news):
    """Regression lines for new-vs-old recording lists. Pure function —
    the selftest runs it on planted data."""
    old_wall = median_map(olds, "queries") or median_map(olds, "top20_s")
    new_wall = median_map(news, "queries") or median_map(news, "top20_s")
    old_cpu = median_map(olds, "cpu_ms")
    new_cpu = median_map(news, "cpu_ms")
    use_cpu = old_cpu is not None and new_cpu is not None
    o, n = (old_cpu, new_cpu) if use_cpu else (old_wall, new_wall)
    floor = ABS_FLOOR_CPU_MS if use_cpu else ABS_FLOOR_WALL_S
    unit = "ms cpu" if use_cpu else "s"
    old_full = median_map(olds, "queries")  # full map when available
    # old top-20 median for the entrant test (true median)
    old_top = median_map(olds, "top20_s") or {}
    med_old_top = median(old_top.values()) if old_top else 0.0
    # scope: with full maps, every query; top-20 only otherwise
    scope = sorted(n, key=lambda q: -n[q])
    lines = []
    for q in scope:
        t = n[q]
        if q in o:
            dt = t - o[q]
            if dt > floor and dt / o[q] > REL_THRESHOLD:
                ctx = ""
                if use_cpu and old_wall and new_wall \
                        and q in old_wall and q in new_wall:
                    ctx = (f" [wall {old_wall[q]:.2f}s -> "
                           f"{new_wall[q]:.2f}s]")
                lines.append(
                    f"REGRESSION {q}: {o[q]:.2f} -> {t:.2f} {unit} "
                    f"(+{100 * dt / o[q]:.0f}%){ctx}")
        elif old_full is not None and q in old_full:
            pass  # wall-only info for a cpu-scoped query set; not an entrant
        elif (old_full is None or q not in old_full) \
                and new_wall and new_wall.get(q, 0.0) > med_old_top > 0.0:
            lines.append(
                f"NEW-HEAVY  {q}: {new_wall[q]:.2f}s entered above the "
                f"prior round's top-20 median ({med_old_top:.2f}s)")
    return lines


def selftest():
    # wall-only artifacts (legacy shape): regression + entrant
    old = [{"top20_s": {"a": 4.0, "b": 2.0, "c": 1.0, "d": 0.4}}]
    new = [{"top20_s": {"a": 5.5, "b": 2.1, "c": 1.2, "d": 0.6, "e": 3.0}}]
    got = diff(old, new)
    assert any(l.startswith("REGRESSION a:") for l in got), got   # +37%, +1.5s
    assert any(l.startswith("NEW-HEAVY  e:") for l in got), got   # new, > median
    assert not any(" b:" in l for l in got), got                  # +5%: noise
    assert not any(" d:" in l for l in got), got                  # +50% but +0.2s
    assert not any(" c:" in l for l in got), got                  # +20%: under rel
    assert len(got) == 2, got
    # true median: even-sized top20 must average the middle two (the old
    # upper-middle bug made 2.0 the median of [0.4, 1.0, 2.0, 4.0])
    assert median([0.4, 1.0, 2.0, 4.0]) == 1.5
    # cpu-primary: wall noise alone must NOT flag when cpu is flat...
    oldc = [{"top20_s": {"a": 2.0}, "queries": {"a": 2.0, "z": 0.1},
             "cpu_ms": {"a": 8000, "z": 100}}]
    newc = [{"top20_s": {"a": 3.0}, "queries": {"a": 3.0, "z": 0.1},
             "cpu_ms": {"a": 8200, "z": 100}}]
    assert diff(oldc, newc) == [], diff(oldc, newc)
    # ...and a real cpu regression flags with wall context
    newc2 = [{"top20_s": {"a": 3.0}, "queries": {"a": 3.0, "z": 0.1},
              "cpu_ms": {"a": 12000, "z": 100}}]
    got2 = diff(oldc, newc2)
    assert len(got2) == 1 and "REGRESSION a:" in got2[0] and "wall" in got2[0], got2
    # a query hovering below the old top-20 that re-enters is NOT an entrant
    # when the old full map knows its real time (r9 ADVICE: bench_diff.py)
    oldf = [{"top20_s": {"a": 4.0}, "queries": {"a": 4.0, "hover": 1.0}}]
    newf = [{"top20_s": {"a": 4.0, "hover": 1.1},
             "queries": {"a": 4.0, "hover": 1.1}}]
    assert diff(oldf, newf) == [], diff(oldf, newf)
    # median-of-3: one noisy recording must not flag
    old3 = [{"top20_s": {"a": 2.0}, "queries": {"a": 2.0}}]
    new3 = [{"top20_s": {"a": t}, "queries": {"a": t}} for t in (2.1, 6.0, 2.0)]
    assert diff(old3, new3) == [], diff(old3, new3)
    # pointer-following (r12): a driver wrapper whose tail headline points
    # at a full sidecar must resolve BY run_id — a stale "last" file from a
    # later run is skipped in favor of the history-jsonl line that matches
    import tempfile
    tmp = Path(tempfile.mkdtemp())
    (tmp / "calib").mkdir()
    head = {"metric": "total", "top20_s": {"a": 2.0},
            "full_artifact": "calib/bench_full_last_sfX.json",
            "run_id": "beef"}
    stale = {"run_id": "dead", "queries": {"a": 9.0},
             "cpu_ms": {"a": 1}, "top20_s": {"a": 9.0}}
    good = {"run_id": "beef", "queries": {"a": 2.0, "b": 1.0},
            "cpu_ms": {"a": 5000, "b": 100}, "top20_s": {"a": 2.0}}
    (tmp / "calib/bench_full_last_sfX.json").write_text(json.dumps(stale))
    (tmp / "calib/bench_history_sfX.jsonl").write_text(
        json.dumps(stale) + "\n" + json.dumps(good) + "\n")
    wrapper = tmp / "BENCH_rX.json"
    wrapper.write_text(json.dumps({"tail": "[info] " + json.dumps(head)}))
    got3 = payload(wrapper)
    assert got3["queries"] == good["queries"], got3  # history beat stale last
    (tmp / "calib/bench_full_last_sfX.json").write_text(json.dumps(good))
    assert payload(wrapper)["cpu_ms"]["a"] == 5000   # matching last wins
    # unresolvable pointer falls back to the headline, not an error
    wrapper2 = tmp / "BENCH_rY.json"
    head2 = dict(head, run_id="cafe")
    (tmp / "calib/bench_history_sfX.jsonl").write_text("")
    (tmp / "calib/bench_full_last_sfX.json").write_text(json.dumps(stale))
    wrapper2.write_text(json.dumps({"tail": "[info] " + json.dumps(head2)}))
    assert "queries" not in payload(wrapper2)
    print("selftest ok")


def main(argv):
    if argv[1:2] == ["--selftest"]:
        return selftest()
    if len(argv) == 3:
        sides = [argv[1].split(","), argv[2].split(",")]
    else:
        benches = sorted(Path(__file__).resolve().parent.parent
                         .glob("BENCH_r*.json"),
                         key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
        if len(benches) < 2:
            raise SystemExit("need two BENCH_r*.json artifacts to diff")
        sides = [[str(benches[-2])], [str(benches[-1])]]
    olds = [payload(p) for p in sides[0]]
    news = [payload(p) for p in sides[1]]
    lines = diff(olds, news)
    metric = ("cpu_ms" if median_map(olds, "cpu_ms") is not None
              and median_map(news, "cpu_ms") is not None else "wall")
    print(f"bench diff {[Path(p).name for p in sides[0]]} -> "
          f"{[Path(p).name for p in sides[1]]} "
          f"(metric={metric}, {len(olds)}v{len(news)} recordings): "
          f"{len(lines)} flag(s)")
    # estimator-semantics caveat (r12): pre-r12 artifacts are the CHOSEN
    # (better) of two suite passes — a minimum statistic; r12+ artifacts are
    # per-query medians. min-vs-median comparisons carry a built-in upward
    # bias on the new side, so single-old-recording flags against a median
    # artifact need the code-A/B adjudication, not a rerun shrug.
    def kind(ps):
        return {("recording" in p and "median" in str(p.get("recording")))
                for p in ps}
    if kind(olds) != kind(news):
        print("NOTE: recording semantics differ between sides "
              "(best-of-N chosen attempt vs per-query median) — expect an "
              "upward bias on the median side; adjudicate flags by code A/B")
    for l in lines:
        print(l)
    return 1 if lines else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
