#!/usr/bin/env python3
"""One-command round-close gate: oracle correctness + bench regression +
per-stage pipeline SLA, exit nonzero when ANY check fails (r9 verdict #7 —
the r9 close ran all three by hand).

Usage:
  python3 tools/close_gate.py --new-bench NEW.json[,NEW2.json,...]
      [--sf-dir /root/testdata/sf0.01] [--verify-out /tmp/verify_out]
      [--old-bench OLD.json[,...]]      # default: newest BENCH_r*.json
      [--skip-oracle]                   # when Verify hasn't been re-run
      [--skip-sbt-test]                 # when the suite just ran green
  python3 tools/close_gate.py --selftest

Checks:
  0. sbtTest  — `sbt test` must exit 0 (r10 verdict #1: the r10 snapshot
                shipped a red suite; a close can never do that again).
  1. oracle   — tools/oracle_check.py over --verify-out (the Verify dump):
                every oracle-backed query must PASS.
  2. bench    — tools/bench_diff.py old -> new: no REGRESSION/NEW-HEAVY
                flags (median-of-N + cpu_ms adjudication per that tool).
  3. stageSLA — the new bench payload's pipeline_stages_s against the
                reference Step Function TimeoutSeconds (validate 120 s,
                transform 300 s), plus pipeline_wall_s <= 420 s and
                invalid_recording must be false.

Dev-only tool — NOT part of the shipped Scala library.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import bench_diff       # noqa: E402
import oracle_check     # noqa: E402

STAGE_SLA_S = {"validate": 120.0, "transform": 300.0}
TOTAL_SLA_S = 420.0


def check_stage_sla(payload):
    """Failure lines for the per-stage SLA check. Pure — selftested."""
    fails = []
    if payload.get("invalid_recording") is True:
        fails.append("stageSLA: recording is flagged invalid_recording "
                     "(thrashed machine) — re-record before closing")
    wall = payload.get("pipeline_wall_s")
    if wall is None or wall < 0:
        fails.append("stageSLA: pipeline_wall_s missing or failed run")
    elif wall > TOTAL_SLA_S:
        fails.append(f"stageSLA: pipeline_wall_s {wall:.1f}s > "
                     f"{TOTAL_SLA_S:.0f}s reference SLA")
    stages = payload.get("pipeline_stages_s") or {}
    for name, budget in sorted(STAGE_SLA_S.items()):
        w = stages.get(name)
        if w is None:
            fails.append(f"stageSLA: stage '{name}' missing from "
                         "pipeline_stages_s")
        elif float(w) > budget:
            fails.append(f"stageSLA: stage '{name}' {float(w):.1f}s > "
                         f"{budget:.0f}s reference TimeoutSeconds")
    return fails


def selftest():
    ok = {"invalid_recording": False, "pipeline_wall_s": 57.1,
          "pipeline_stages_s": {"validate": 1.1, "transform": 55.9,
                                "promote": 0.2, "archive": 0.06}}
    assert check_stage_sla(ok) == [], check_stage_sla(ok)
    # planted stage-SLA breach: transform one second over its budget must
    # fail even though the total wall is comfortably under 420 s
    breach = {"invalid_recording": False, "pipeline_wall_s": 310.0,
              "pipeline_stages_s": {"validate": 1.0, "transform": 301.0}}
    got = check_stage_sla(breach)
    assert any("'transform' 301.0s > 300s" in l for l in got), got
    # a thrashed recording can't close a round
    bad = dict(ok, invalid_recording=True)
    assert any("invalid_recording" in l for l in check_stage_sla(bad))
    # a failed pipeline run (wall -1) can't close a round
    failed = dict(ok, pipeline_wall_s=-1.0)
    assert any("missing or failed" in l for l in check_stage_sla(failed))
    print("selftest ok")
    return 0


def main(argv):
    if "--selftest" in argv:
        return selftest()
    # argparse, not positional zip-pairing: the valueless --skip-* flags
    # would shift a dict(zip(argv[1::2], argv[2::2])) and silently drop the
    # flag after them (r10 advice).
    import argparse
    ap = argparse.ArgumentParser(prog="close_gate")
    ap.add_argument("--new-bench", required=True)
    ap.add_argument("--old-bench", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--verify-out", default="/tmp/verify_out")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--skip-sbt-test", action="store_true")
    a = ap.parse_args(argv[1:])
    sf_dir, verify_out, new = a.sf_dir, a.verify_out, a.new_bench
    fails = []

    # 0. the ScalaTest suite — a close can never ship a red suite (r10 #1)
    if a.skip_sbt_test:
        print("close_gate: sbt test SKIPPED by flag")
    else:
        import subprocess
        print("close_gate: running `sbt test` (a few minutes) ...")
        repo = Path(__file__).resolve().parent.parent
        r = subprocess.run(["sbt", "-batch", "test"], cwd=repo,
                           stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        tail = r.stdout.decode(errors="replace").splitlines()[-25:]
        if r.returncode != 0:
            for l in tail:
                print("  sbt| " + l)
            fails.append("sbtTest: `sbt test` exited "
                         f"{r.returncode} — suite is red")
        else:
            summary = [l for l in tail if "Tests:" in l or "All tests" in l]
            print("close_gate: sbt test PASS "
                  + ("(" + summary[-1].strip() + ")" if summary else ""))

    # 1. oracle correctness over the Verify dump
    if a.skip_oracle:
        print("close_gate: oracle check SKIPPED by flag")
    else:
        print(f"close_gate: oracle check {sf_dir} vs {verify_out}")
        if oracle_check.main(sf_dir, verify_out) != 0:
            fails.append("oracle: correctness gate failed (see FAIL lines)")

    # 2. bench regression old -> new. Numeric round key, not lexicographic:
    # sorted() on names puts r10 < r9 and would baseline round 11 against
    # the wrong artifact (r10 advice, medium).
    old = a.old_bench
    if not old:
        import re
        benches = sorted(
            Path(__file__).resolve().parent.parent.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
        if benches:
            old = str(benches[-1])
    if old:
        olds = [bench_diff.payload(p) for p in old.split(",")]
        news = [bench_diff.payload(p) for p in new.split(",")]
        flags = bench_diff.diff(olds, news)
        for l in flags:
            print(l)
        if flags:
            fails.append(f"bench: {len(flags)} regression flag(s) — "
                         "adjudicate (median-of-3 / cpu_ms) or fix")
    else:
        print("close_gate: no old bench artifact — regression diff skipped")

    # 3. per-stage pipeline SLA on the new recording (first of the list)
    payload = bench_diff.payload(new.split(",")[0])
    fails.extend(check_stage_sla(payload))

    print("== close_gate:", "FAIL" if fails else "PASS",
          f"({len(fails)} failure(s)) ==")
    for f in fails:
        print("  " + f)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
