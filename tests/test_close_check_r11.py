"""Round-11 close-gate hardening (VERDICT r10 #2 + wrong #4):

- committed bench artifacts are gated on their OWN contention metric
  (foreign_cpu_total_s as a % of wall × cpus) — a contaminated number
  can no longer slip into a round close by accident;
- a bare ``close_check`` invocation grades the NEWEST round present
  instead of a hardcoded previous round.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import close_check  # noqa: E402


def _art(tmp_path, name, wall, cpus, foreign):
    p = tmp_path / name
    p.write_text(
        json.dumps(
            {
                "metric": "t",
                "value": wall,
                "cpus": cpus,
                "foreign_cpu_total_s": foreign,
            }
        )
    )
    return str(p)


def test_foreign_cpu_pct_math():
    assert close_check.foreign_cpu_pct(
        {"value": 100.0, "cpus": 32, "foreign_cpu_total_s": 160.0}
    ) == 5.0
    # artifacts predating the instrument are skipped, not failed
    assert close_check.foreign_cpu_pct({"value": 100.0, "cpus": 32}) is None
    assert close_check.foreign_cpu_pct({}) is None


def test_quiet_artifact_passes(tmp_path):
    p = _art(tmp_path, "BENCH_LOCAL_r99.json", 300.0, 32, 96.0)  # 1%
    assert close_check.contention_problems([p]) == []


def test_contaminated_artifact_rejected(tmp_path):
    # 657 s foreign over a 300 s × 32-cpu run = 6.8% — the r9-incident
    # shape the gate exists for
    p = _art(tmp_path, "BENCH_LOCAL_r99.json", 300.0, 32, 657.0)
    problems = close_check.contention_problems([p])
    assert len(problems) == 1 and "CONTAMINATED" in problems[0]
    assert "6.8%" in problems[0]


def test_subset_pair_same_class_enforced(tmp_path):
    quiet = _art(tmp_path, "BENCH_SF1_SUBSET_r99.json", 100.0, 32, 30.0)  # 0.9%
    loud = _art(tmp_path, "BENCH_SF10_SUBSET_r99.json", 700.0, 32, 2000.0)  # 8.9%
    problems = close_check.contention_problems([quiet, loud])
    # the loud half fails its own budget, so the pair cannot close in
    # mixed contention classes
    assert len(problems) == 1 and "SF10_SUBSET" in problems[0]


def test_non_bench_and_missing_paths_skipped(tmp_path):
    other = tmp_path / "GATE_r99_sf001.json"
    other.write_text("{}")
    assert close_check.contention_problems(
        [str(other), str(tmp_path / "BENCH_MISSING_r99.json")]
    ) == []


def test_r10_committed_artifacts_all_pass_the_budget():
    """The gate must not retroactively fail the round-10 close — every
    committed r10 bench artifact measured ≤2.8% foreign CPU."""
    import glob

    arts = sorted(glob.glob(os.path.join(REPO, "BENCH_*_r10.json")))
    assert arts, "r10 artifacts missing from the repo"
    # r10 predates the instrumented bench_spread: metric-less artifacts
    # are skipped for historic rounds (require_metric engages at r12)
    assert close_check.contention_problems(arts, require_metric=False) == []


def test_newest_round_default():
    rnd = close_check.newest_round()
    assert rnd is not None and int(rnd) >= 10
