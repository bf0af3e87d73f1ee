"""Scaling-curve report (VERDICT r7 #4): compare per-query wall time at
sf1.0 (tools/gen_sf1.py fixture, 10× data) against sf0.1 and flag any
query whose ratio exceeds the superlinearity threshold.

Threshold: 10× data × 1.5 noise/accounting headroom = 15×, with a
0.5 s floor on the sf1 time (sub-second queries are all fixed-cost —
plan/codegen dominates and ratios there are meaningless).

    python tools/sf1_ratio_report.py BENCH_LOCAL_r8.json BENCH_SF1_r8.json
    python tools/sf1_ratio_report.py --threshold 22 SF1.json SF10.json

``--threshold`` overrides the default 15×: the sf10 subset fixture's
token remap grows text BYTES 1.47× per decade by construction
(measured 395→580 avg chars), so byte-linear text queries legitimately
run up to ~14.7× on "10×" data — threshold 22 = 14.7 × 1.5 headroom.

Exit 1 if any query is flagged.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 15.0
FLOOR_S = 0.5


def main() -> int:
    global THRESHOLD
    args = list(sys.argv[1:])
    if args and args[0] == "--threshold":
        THRESHOLD = float(args[1])
        args = args[2:]
    base_path, sf1_path = args[0], args[1]
    base = json.load(open(base_path))["queries"]
    sf1 = json.load(open(sf1_path))["queries"]
    rows = []
    for q, t1 in sf1.items():
        t0 = base.get(q)
        if t0 is None or t1 is None or t0 <= 0:
            continue
        rows.append((t1 / t0, t0, t1, q))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > THRESHOLD and r[2] > FLOOR_S]
    print(f"{len(rows)} queries compared; top ratios:")
    for ratio, t0, t1, q in rows[:15]:
        mark = "FLAG" if (ratio > THRESHOLD and t1 > FLOOR_S) else "    "
        print(f"{mark} {ratio:7.2f}x  {t0:7.2f}s -> {t1:8.2f}s  {q}")
    tot0 = sum(r[1] for r in rows)
    tot1 = sum(r[2] for r in rows)
    print(f"\ntotals: sf0.1 {tot0:.1f}s -> sf1 {tot1:.1f}s "
          f"({tot1 / tot0:.2f}x on 10x data)")
    print(f"flagged (> {THRESHOLD}x and > {FLOOR_S}s): "
          f"{[r[3] for r in flagged] or 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
