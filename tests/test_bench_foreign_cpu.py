"""Pins for bench.py's foreign-CPU attribution instrument (VERDICT r9
#2 root-cause work): per-query /proc/stat + process-subtree snapshots
that make host/neighbor contention visible in the bench artifact.

The r9 driver-session variance (3.3-7.4x inflation confined to
execution positions 84-95) was external CPU contention; this
instrument is how any future inflated window gets attributed from the
committed artifact alone (inflated wall + inflated foreign = machine;
inflated wall + quiet foreign = regression).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_cpu_snapshot_shape_and_monotonicity():
    busy0, mine0 = bench._cpu_snapshot()
    assert busy0 > 0 and mine0 > 0
    t0 = time.process_time()
    while time.process_time() - t0 < 0.3:  # burn ~0.3s in OUR process
        sum(i * i for i in range(10_000))
    busy1, mine1 = bench._cpu_snapshot()
    assert busy1 >= busy0 and mine1 >= mine0


def test_own_burn_attributed_to_subtree_not_foreign():
    hz = os.sysconf("SC_CLK_TCK")
    busy0, mine0 = bench._cpu_snapshot()
    t0 = time.process_time()
    while time.process_time() - t0 < 0.6:
        sum(i * i for i in range(10_000))
    busy1, mine1 = bench._cpu_snapshot()
    mine_s = (mine1 - mine0) / hz
    # our own 0.6s burn lands in OUR subtree (generous lower bound for
    # sampling granularity) — it must never read as foreign load
    assert mine_s >= 0.4, mine_s


def test_live_child_process_burn_attributed_to_subtree():
    """A LIVE child process (the Spark JVM / reused pandas workers —
    the processes that exist while a query runs) counts as ours, not
    foreign.  Known edge, deliberately out of scope: a child that
    burns CPU and EXITS between two snapshots rolls its jiffies into
    the parent's cutime/cstime, which the subtree walk does not read —
    such a burn reads as foreign.  Irrelevant for the bench (the JVM
    and workers outlive every query) and fail-safe in direction (it
    can only OVERSTATE contention, never hide it)."""
    hz = os.sysconf("SC_CLK_TCK")
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0 = time.process_time()\n"
            "while time.process_time() - t0 < 5:\n"
            "    sum(i * i for i in range(10000))\n",
        ]
    )
    try:
        busy0, mine0 = bench._cpu_snapshot()
        time.sleep(1.2)  # child burns ~1.2s of CPU while LIVE
        busy1, mine1 = bench._cpu_snapshot()
    finally:
        child.kill()
        child.wait()
    mine_s = (mine1 - mine0) / hz
    assert mine_s >= 0.7, mine_s
