#!/usr/bin/env python
"""Per-query bench regression tripwire (VERDICT r6 #1).

Flags any query whose current cost exceeds 1.5× its trailing
cross-round median — the alarm threshold sized ABOVE the measured
±10% host-noise band so it fires only on genuine plan regressions:

    python tools/bench_tripwire.py BENCH_SPREAD_r7.json
    python tools/bench_tripwire.py BENCH_LOCAL_r7.json

History = every committed full-map artifact (`BENCH_LOCAL_r*.json`
and the `min` series of `BENCH_SPREAD_r*.json`), excluding the
artifact under test.  For a spread artifact the per-query MIN across
runs is used as the current cost (host steal only ever adds time, so
min is the robust estimator; a single-run artifact has no such
filter, which is why the spread is the preferred close artifact).

An absolute floor (default 0.3 s over the median) suppresses flags on
sub-second queries where 1.5× is inside scheduling jitter.

Exit code 1 when anything flags — wire into the round-close checklist.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_query_map(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if d.get("metric") == "bench_spread":
        return {q: v["min"] for q, v in d["queries"].items()}
    q = d.get("queries")
    if isinstance(q, dict) and q:
        return {k: float(v) for k, v in q.items()}
    raise SystemExit(f"{path}: no per-query map")


def history_maps(exclude: str) -> dict[str, dict[str, float]]:
    out = {}
    for pat in ("BENCH_LOCAL_r*.json", "BENCH_SPREAD_r*.json"):
        for p in sorted(glob.glob(os.path.join(REPO, pat))):
            if os.path.abspath(p) == os.path.abspath(exclude):
                continue
            try:
                out[os.path.basename(p)] = load_query_map(p)
            except (SystemExit, KeyError, json.JSONDecodeError):
                continue
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.3,
                    help="absolute seconds over the median also required")
    args = ap.parse_args()

    current = load_query_map(args.artifact)
    hist = history_maps(args.artifact)
    if not hist:
        raise SystemExit("no history artifacts found")
    print(f"history: {', '.join(hist)}")

    flags, new_queries = [], []
    for q, cur in sorted(current.items()):
        past = [m[q] for m in hist.values() if q in m]
        if not past:
            new_queries.append(q)
            continue
        med = statistics.median(past)
        if cur > args.ratio * med and cur > med + args.floor:
            flags.append((q, cur, med))
    for q, cur, med in flags:
        print(f"FLAG  {q}: {cur:.2f}s vs trailing median {med:.2f}s "
              f"({cur / med:.2f}x)")
    if new_queries:
        print(f"(no history yet for {len(new_queries)} new queries: "
              f"{', '.join(new_queries[:8])}{'…' if len(new_queries) > 8 else ''})")
    print(f"{len(flags)} flagged of {len(current)} queries")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
