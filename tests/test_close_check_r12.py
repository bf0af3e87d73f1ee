"""Round-12 close-gate hardening (ADVICE r11 medium): the contention
budget must be derivable from EVERY committed bench artifact shape, and
a current-round artifact with no derivable metric is a gate failure,
not a silent skip.

Shapes covered:
- driver wrapper (BENCH_r{N}.json): fields nested under ``parsed``;
- per-run probe records (tools/query_spread.py): ``runs`` list —
  gated on the QUIETEST run (a probe may deliberately record
  contaminated runs as forensics);
- bench_spread: parallel ``totals`` / ``run_foreign_cpu_total_s``
  lists — also min-run, matching the tripwire's per-query-MIN
  estimator.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import close_check  # noqa: E402


def test_parsed_wrapper_unwrapped():
    # the BENCH_r11.json shape: driver wrapper with cpus at top level
    art = {
        "n": 353,
        "cpus": 32,
        "parsed": {"value": 100.0, "foreign_cpu_total_s": 320.0},
    }
    assert close_check.foreign_cpu_pct(art) == 10.0
    # cpus inside parsed wins when present at both levels
    art2 = {
        "cpus": 16,
        "parsed": {"value": 100.0, "cpus": 32, "foreign_cpu_total_s": 160.0},
    }
    assert close_check.foreign_cpu_pct(art2) == 5.0


def test_per_run_records_gated_on_quietest_run():
    # the BENCH_MINHASH_SPREAD shape: wall tracks foreign across runs;
    # the artifact's conclusion rests on its quiet floor
    art = {
        "cpus": 32,
        "runs": [
            {"wall_s": 27.5, "foreign_cpu_s": 1.4},  # 0.16% — quiet floor
            {"wall_s": 91.2, "foreign_cpu_s": 207.0},  # deliberate forensics
        ],
    }
    pct = close_check.foreign_cpu_pct(art)
    assert pct is not None and pct < 1.0


def test_spread_run_lists_gated_on_quietest_run():
    art = {
        "cpus": "32",
        "totals": [250.0, 260.0, 900.0],
        "run_foreign_cpu_total_s": [80.0, 90.0, 9000.0],
    }
    pct = close_check.foreign_cpu_pct(art)
    assert pct is not None and abs(pct - 1.0) < 0.01  # 80/(250*32)
    # all runs contaminated → the min itself blows the budget
    loud = {
        "cpus": "32",
        "totals": [250.0, 260.0],
        "run_foreign_cpu_total_s": [800.0, 900.0],
    }
    assert close_check.foreign_cpu_pct(loud) > 5.0


def test_spread_with_none_foreign_entries_tolerated():
    art = {
        "cpus": "32",
        "totals": [250.0, 260.0],
        "run_foreign_cpu_total_s": [None, 80.0],
    }
    pct = close_check.foreign_cpu_pct(art)
    assert pct is not None and pct < 5.0
    all_none = {
        "cpus": "32",
        "totals": [250.0],
        "run_foreign_cpu_total_s": [None],
    }
    assert close_check.foreign_cpu_pct(all_none) is None


def test_metricless_current_round_artifact_is_a_failure(tmp_path):
    p = tmp_path / "BENCH_SPREAD_r99.json"
    p.write_text(json.dumps({"metric": "bench_spread", "totals": [1.0]}))
    problems = close_check.contention_problems([str(p)])
    assert len(problems) == 1 and "UNGATEABLE" in problems[0]
    # historic rounds: skip-only, as before
    assert close_check.contention_problems([str(p)], require_metric=False) == []


def test_contaminated_parsed_wrapper_rejected(tmp_path):
    p = tmp_path / "BENCH_r99.json"
    p.write_text(
        json.dumps(
            {"cpus": 32, "parsed": {"value": 100.0, "foreign_cpu_total_s": 320.0}}
        )
    )
    problems = close_check.contention_problems([str(p)])
    assert len(problems) == 1 and "CONTAMINATED" in problems[0]


def test_current_round_spread_tool_emits_gateable_fields():
    """tools/bench_spread.py must write run_foreign_cpu_total_s (and
    the retry disclosure) so its artifacts stop bypassing the budget."""
    src = open(os.path.join(REPO, "tools", "bench_spread.py")).read()
    assert "run_foreign_cpu_total_s" in src
    assert "run_retried" in src
