#!/usr/bin/env python3
"""Bench-metrics TREND gate (dev tooling, not part of the library).

Usage: python3 tools/trendcheck.py <bench_metrics_A.jsonl> <bench_metrics_B.jsonl>

The wall-clock canary catches load; cpu_sec catches plan-cost shifts;
what neither catches is a STRUCTURAL plan change that stays cheap at
the bench SF but explodes at 100x — an extra shuffle, a spill that
wasn't there, an input-volume jump from a lost pushdown. This diffs
two runs' per-query task-metric rows (graft.Metrics via Bench's
bench_metrics.jsonl) and flags:

  - shuffle read/write bytes changed > RATIO x (and > MIN_BYTES abs)
  - spill appearing where there was none (any -> nonzero)
  - input rows or bytes changed > RATIO x (pushdown / pruning lost)
  - task count changed > RATIO x (partitioning shape shift)

Convention: after the round's double bench, copy run 1's
bench_metrics.jsonl aside (bench_metrics_run1.jsonl) the same way
bench_out.json is copied, then diff the two runs — same code, same
data, so EVERY structural metric should agree run-to-run (wall and
cpu may wiggle; bytes and counts must not). Cross-round, diff the
new run against the previous round's file to catch regressions.

Exit code: number of flagged queries (0 = clean).
"""
import json
import sys

RATIO = 1.5
MIN_BYTES = 1 << 20  # ignore sub-MiB wiggle: tiny queries round-trip
                     # through compressed shuffle files whose size is
                     # not perfectly deterministic

STRUCTURAL = [
    ("shuffleReadBytes", True),
    ("shuffleWriteBytes", True),
    ("inputBytes", True),
    ("inputRows", False),
    ("tasks", False),
]


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rows[r["name"]] = r
    return rows


def ratio_flag(a, b, min_abs):
    hi, lo = max(a, b), min(a, b)
    if hi <= min_abs:
        return False
    if lo == 0:
        return True
    return hi / lo > RATIO


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a, b = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(a) & set(b))
    missing = sorted(set(a) ^ set(b))
    flagged = 0
    for name in common:
        ra, rb = a[name], b[name]
        problems = []
        for key, is_bytes in STRUCTURAL:
            va, vb = ra.get(key, 0), rb.get(key, 0)
            if ratio_flag(va, vb, MIN_BYTES if is_bytes else 0):
                problems.append(f"{key} {va} -> {vb}")
        sa, sb = ra.get("spillBytes", 0), rb.get("spillBytes", 0)
        if (sa == 0) != (sb == 0):
            problems.append(f"spillBytes {sa} -> {sb} (spill appeared/vanished)")
        if problems:
            flagged += 1
            print(f"  [SHIFT] {name}: " + "; ".join(problems))
        else:
            print(f"  [OK]    {name}")
    for name in missing:
        print(f"  [ONLY-ONE-RUN] {name}")
    print(f"== {len(common) - flagged} stable / {flagged} shifted / "
          f"{len(missing)} unmatched ==")
    return flagged


if __name__ == "__main__":
    sys.exit(main())
