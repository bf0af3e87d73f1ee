"""Bounded CI slice of the migration-runner orchestration fuzz
(tools/runner_fuzz.py — VERDICT r9 #5).  Each scenario grows a random
migration directory over 4 epochs with random faults (mid-script
failure, copy-on-write crash + recover, duplicate version,
edit/delete-after-commit) and asserts the five orchestration
invariants against a statement-replay model after every epoch.
Longer sweeps: ``python tools/runner_fuzz.py 50``."""

from __future__ import annotations

import pytest

from tools.runner_fuzz import run_scenario


@pytest.mark.parametrize("seed", [901, 902, 903, 904, 905, 906])
def test_runner_orchestration_fuzz(spark, seed):
    run_scenario(spark, seed)
