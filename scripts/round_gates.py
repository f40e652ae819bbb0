#!/usr/bin/env python
"""Standing per-round artifact runner (round 11, r10 verdict item 4).

One command produces the round's scale-gate artifacts in the shape the
judge audits, SEQUENTIALLY (this machine tolerates exactly one Spark
JVM at a time — a second contaminates durations and can flake tests):

  1. ``CORRECTNESS_sf0.1_r{N}.json`` — driver_sim at the bench scale.
  2. ``CORRECTNESS_sf1_r{N}.json``   — driver_sim at 100x the driver's
     correctness scale (sf1 tables are generated into --sf1-dir first
     if absent; /tmp does not survive restarts). The sf1 JVM needs the
     64g heap (the 1g/8g defaults OOM — BASELINE.md, round 10).
  3. ``BENCH_sf1_r{N}.json``        — the 12-query headline bench on
     the sf1 tables. bench.py overwrites BENCH_DETAIL.json next to
     itself for EVERY run, so after an off-default-scale run the
     committed sf0.1 detail record is restored via git.

After each bench step the plan digests are diffed against the newest
prior-round record of the same scale: digest equality is the
machine-noise-free regression signal (same digest -> any wall delta is
machine state; new digest -> a real plan change to inspect). The run
FAILS (exit 1) on any correctness mismatch; digest flips are reported
loudly but do not fail the run — a flip is a finding to explain in the
round notes, not necessarily a defect.

Usage: python scripts/round_gates.py <round-number>
           [--sf1-dir=/tmp/testdata_sf1] [--skip=sf01,sf1,bench]

The default-scale bench (BENCH_r{N}) is the driver's own artifact and
is deliberately NOT produced here; run ``python bench.py`` manually on
an idle machine when iterating (memory: bench is LOAD-SENSITIVE — the
calibration sentinel in the record proves idleness).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env: dict | None = None, log: str | None = None) -> str:
    """Run one child to completion, tee-ing output to a log file.
    Children never overlap — see the module docstring."""
    print(f"+ {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, env=e, capture_output=True, text=True
    )
    out = proc.stdout + proc.stderr
    if log:
        with open(log, "w") as f:
            f.write(out)
    dt = time.time() - t0
    if proc.returncode != 0:
        tail = "\n".join(out.splitlines()[-25:])
        raise SystemExit(
            f"FAILED ({proc.returncode}) after {dt:.0f}s: {' '.join(cmd)}\n"
            f"--- tail ---\n{tail}"
        )
    print(f"  ok in {dt:.0f}s" + (f" (log: {log})" if log else ""), flush=True)
    return proc.stdout


def _correctness_tally(path: str) -> tuple[int, int, list[str]]:
    d = json.load(open(path))
    # the artifact must reflect THIS tree's registry — a run from a
    # stale checkout (or an artifact kept across a rotation) would
    # otherwise pass 50/50 while the new driver surface goes ungated
    sys.path.insert(0, REPO)
    from twitter_social_triangle_mapreduce_spark import registry

    want = set(registry.all_queries())
    if set(d) != want:
        missing = sorted(want - set(d))
        extra = sorted(set(d) - want)
        return 0, len(d), [f"stale artifact: missing={missing} extra={extra}"]
    green = sum(
        1
        for v in d.values()
        if isinstance(v, dict)
        and v.get("rows_match")
        and v.get("schema_match")
        and v.get("hash_match") in (True, None)
        and not v.get("err")
    )
    bad = [
        k
        for k, v in d.items()
        if isinstance(v, dict)
        and (
            v.get("err")
            or not v.get("rows_match")
            or not v.get("schema_match")
            or v.get("hash_match") is False
        )
    ]
    return green, len(d), bad


def _prior_record(pattern: str, current_round: int) -> str | None:
    """Newest committed record of the same scale from an earlier round."""
    best: tuple[int, str] | None = None
    for name in os.listdir(REPO):
        m = re.fullmatch(pattern, name)
        if m and int(m.group(1)) < current_round:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, name)
    return os.path.join(REPO, best[1]) if best else None


def _digest_diff(new_path: str, old_path: str | None) -> list[str]:
    if old_path is None:
        return ["(no prior record of this scale — first round, nothing to diff)"]
    new, old = json.load(open(new_path)), json.load(open(old_path))
    lines = []
    for section in ("plans", "plans_ext"):
        a, b = new.get(section, {}), old.get(section, {})
        for q in sorted(set(a) | set(b)):
            if a.get(q) != b.get(q):
                lines.append(
                    f"DIGEST FLIP [{section}] {q}: "
                    f"{b.get(q, '<absent>')} -> {a.get(q, '<absent>')}"
                )
    return lines or [f"all plan digests identical to {os.path.basename(old_path)}"]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        raise SystemExit(__doc__)
    rnd = int(args[0])
    sf1_dir = "/tmp/testdata_sf1"
    skip: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--sf1-dir="):
            sf1_dir = a.split("=", 1)[1]
        elif a.startswith("--skip="):
            skip = set(a.split("=", 1)[1].split(","))

    failures: list[str] = []
    notes: list[str] = []

    if not skip >= {"sf1", "bench"} and not os.path.exists(
        os.path.join(sf1_dir, "lineitem.parquet")
    ):
        _run(
            [sys.executable, "scripts/make_sf_testdata.py", "1", sf1_dir],
            log="/tmp/round_gates_mkdata.log",
        )

    if "sf01" not in skip:
        out = os.path.join(REPO, f"CORRECTNESS_sf0.1_r{rnd}.json")
        _run(
            [
                sys.executable,
                "scripts/driver_sim.py",
                "/root/testdata/sf0.1",
                f"--json-out={out}",
            ],
            log="/tmp/round_gates_sf01.log",
        )
        g, n, bad = _correctness_tally(out)
        notes.append(f"CORRECTNESS_sf0.1_r{rnd}: {g}/{n} green")
        if bad:
            failures.append(f"sf0.1 mismatches: {bad}")

    if "sf1" not in skip:
        out = os.path.join(REPO, f"CORRECTNESS_sf1_r{rnd}.json")
        _run(
            [
                sys.executable,
                "scripts/driver_sim.py",
                sf1_dir,
                f"--json-out={out}",
            ],
            env={"DRIVER_SIM_MEMORY": "64g"},
            log="/tmp/round_gates_sf1.log",
        )
        g, n, bad = _correctness_tally(out)
        notes.append(f"CORRECTNESS_sf1_r{rnd}: {g}/{n} green")
        if bad:
            failures.append(f"sf1 mismatches: {bad}")

    if "bench" not in skip:
        out = os.path.join(REPO, f"BENCH_sf1_r{rnd}.json")
        # bench.py overwrites BENCH_DETAIL.json on EVERY run, so the
        # committed sf0.1 record must be git-restored no matter how the
        # bench block exits — a bench failure that skipped the restore
        # would leave sf1 detail to be silently committed as sf0.1's
        try:
            stdout = _run(
                [sys.executable, "bench.py"],
                env={"SPARK_GRAFT_SF_DIR": sf1_dir},
                log="/tmp/round_gates_bench_sf1.log",
            )
            record = None
            for line in stdout.splitlines():
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    record = json.loads(line)
            if record is None:
                failures.append("bench.py produced no JSON record")
            else:
                # the sf1 record keeps the full detail inline (there is
                # no per-scale BENCH_DETAIL file; the committed one is
                # sf0.1's)
                detail = json.load(
                    open(os.path.join(REPO, "BENCH_DETAIL.json"))
                )
                record["plans_ext"] = detail.get("plans_ext", {})
                record["shuffle_headline"] = detail.get(
                    "shuffle_headline", {}
                )
                record["shuffle_ext"] = detail.get("shuffle_ext", {})
                with open(out, "w") as f:
                    json.dump(record, f, indent=1)
                    f.write("\n")
                notes.append(
                    f"BENCH_sf1_r{rnd}: headline {record.get('value')} s, "
                    f"ext {record.get('ext_total')} s, "
                    f"sentinel {record.get('calibration', {}).get('start')}/"
                    f"{record.get('calibration', {}).get('end')}"
                )
                notes.extend(
                    _digest_diff(
                        out, _prior_record(r"BENCH_sf1_r(\d+)\.json", rnd)
                    )
                )
        finally:
            _run(["git", "checkout", "--", "BENCH_DETAIL.json"])

    print("\n=== round_gates summary ===")
    for n_ in notes:
        print(" ", n_)
    if failures:
        for f_ in failures:
            print("  FAIL:", f_)
        return 1
    print("  all gates green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
