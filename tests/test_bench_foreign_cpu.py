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


# ── per-query contention self-healing (VERDICT r11 #3) ──────────────────────


def test_contaminated_budget_shape():
    # under both thresholds → clean
    assert not bench._contaminated(0.5, 0.9, 32)
    assert not bench._contaminated(10.0, bench.RETRY_FOREIGN_PCT * 10 * 32, 32)
    # > max(1s, 25% of wall×cpus) → contaminated (the r11 incident
    # shape: 42.4 s of foreign CPU inside a 0.64 s query)
    assert bench._contaminated(0.64, 42.4, 32)
    assert bench._contaminated(10.0, bench.RETRY_FOREIGN_PCT * 10 * 32 + 1, 32)
    # instrument unavailable / errored run → never triggers
    assert not bench._contaminated(10.0, None, 32)
    assert not bench._contaminated(-1.0, 99.0, 32)


def _fake_runner(script):
    """run_once stub fed from a {name: [(wall, fg, err), ...]} script —
    each call pops the next synthetic measurement for that query."""
    calls = {"n": 0}

    def run_once(name, spec):
        calls["n"] += 1
        return script[name].pop(0)

    return run_once, calls


def test_retry_engages_and_keeps_quieter_measurement():
    script = {
        "q_noisy": [(3.2, 42.4, False), (0.7, 0.2, False)],  # burst → quiet
        "q_clean": [(2.0, 0.1, False)],
    }
    run_once, calls = _fake_runner(script)
    resets = {"n": 0}
    timings, foreign, retries = bench._measure_all(
        {"q_noisy": None, "q_clean": None},
        run_once,
        cpus=32,
        reset_caches=lambda name: resets.__setitem__("n", resets["n"] + 1),
    )
    assert calls["n"] == 3 and resets["n"] == 1
    assert timings == {"q_noisy": 0.7, "q_clean": 2.0}
    assert foreign == {"q_noisy": 0.2, "q_clean": 0.1}
    assert len(retries) == 1
    rec = retries["q_noisy"]
    assert rec["kept"] == "retry"
    assert rec["first_wall"] == 3.2 and rec["first_foreign_cpu_s"] == 42.4
    assert rec["retry_wall"] == 0.7 and rec["retry_foreign_cpu_s"] == 0.2


def test_retry_still_noisy_keeps_first_and_discloses():
    script = {"q": [(0.8, 20.0, False), (1.0, 25.0, False)]}
    run_once, _ = _fake_runner(script)
    timings, foreign, retries = bench._measure_all(
        {"q": None}, run_once, cpus=32
    )
    # both noisy: keep the first (quieter) — never ping-pong
    assert timings == {"q": 0.8} and foreign == {"q": 20.0}
    assert retries["q"]["kept"] == "first"


def test_retry_error_keeps_first_measurement():
    script = {"q": [(0.8, 20.0, False), (-1.0, None, True)]}
    run_once, _ = _fake_runner(script)
    timings, foreign, retries = bench._measure_all(
        {"q": None}, run_once, cpus=32
    )
    assert timings == {"q": 0.8}
    assert retries["q"]["kept"] == "first"
    assert retries["q"]["retry_wall"] is None


def test_clean_run_never_retries():
    script = {"a": [(1.0, 0.0, False)], "b": [(2.0, 0.5, False)]}
    run_once, calls = _fake_runner(script)
    timings, foreign, retries = bench._measure_all(
        {"a": None, "b": None}, run_once, cpus=32
    )
    assert calls["n"] == 2 and retries == {}


def test_errored_first_run_not_retried():
    script = {"q": [(-1.0, None, True)]}
    run_once, calls = _fake_runner(script)
    timings, foreign, retries = bench._measure_all(
        {"q": None}, run_once, cpus=32
    )
    assert timings == {"q": -1.0} and calls["n"] == 1 and retries == {}


def test_reset_receives_retried_query_name():
    script = {"dedup_x": [(3.0, 50.0, False), (0.5, 0.0, False)]}
    run_once, _ = _fake_runner(script)
    seen = []
    bench._measure_all(
        {"dedup_x": None}, run_once, cpus=32, reset_caches=seen.append
    )
    assert seen == ["dedup_x"]


def test_memo_families_cleared_only_for_their_consumers():
    """r12 measurement-bug fix + r13 per-memo granularity (ADVICE r12
    #1): an unrelated query's contention retry must NOT drop the
    dedup/IVF memos — doing so shifted the whole pair-substrate fill
    onto the next dedup/graph consumer in bench order
    (graph_degree_distribution 0.47 -> 6.3 s at sf1, a spurious 17x
    scale ratio that failed the sf1 ratio gate) — and a retry of a
    pipeline GRAM consumer must drop the gram/token caches it reads
    without dumping the pair-table fill on the dedup family."""
    clear = bench._memo_families_to_clear
    assert clear("dedup_simhash_hamming") == {"pairs"}
    assert clear("graph_degree_distribution") == {"pairs"}
    # sim_*: the typed-vector memo (every sim query reads it) plus the
    # IVF centroids (r13: the vec memo made the family's duplicate
    # embeddings scans memory reads)
    assert clear("sim_ivf_kmeans_topk") == {"ivf", "vecs"}
    # shingle consumer outside dedup_*/graph_*: grams (shingle+token),
    # never the pair table
    assert clear("pipeline_decontaminate_ngrams") == {"grams"}
    # token-substrate-only consumers: tokens, never shingles or pairs
    assert clear("pipeline_span_dedup_c4") == {"tokens"}
    assert clear("pipeline_split_leakage_audit") == {"tokens"}
    for innocent in (
        "events_attribution_linear",
        "agg_skew_kurt",
        "streaming_tumbling_hourly",
        "tpch_q1_pricing_summary",
        "pipeline_curriculum_phases",
    ):
        assert clear(innocent) == frozenset()


def test_memo_consumer_lists_match_call_graph():
    """The family map's explicit name lists must track the operators'
    actual substrate reads: every registered query whose function body
    (source) reaches shingles()/token_arrays() outside the dedup_* /
    graph_* prefixes must be listed, and nothing else may be."""
    import inspect

    from clickhouse_migrator_spark.registry import all_specs
    from clickhouse_migrator_spark.operators import dedup, graph  # noqa: F401

    shingle_users, token_users = set(), set()
    for name, spec in all_specs().items():
        if name.startswith(("dedup_", "graph_")):
            continue
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):  # pragma: no cover
            continue
        if "shingles(" in src:
            shingle_users.add(name)
        elif "token_arrays(" in src:
            token_users.add(name)
    assert shingle_users == bench._SHINGLE_CONSUMER_NAMES
    assert token_users == bench._TOKEN_CONSUMER_NAMES


def test_memo_fill_events_record_and_drain():
    """VERDICT r12 #1: substrate fills are disclosed per query.  The
    event buffer is the seam — operators record, bench drains after
    each measurement, so a fill (or a retry-induced refill) lands on
    the exact query that paid it."""
    from clickhouse_migrator_spark import memo_events

    memo_events.drain_fills()  # isolate from any prior state
    memo_events.record_fill("near_dup_pairs", 1.23456)
    memo_events.record_fill("token_arrays", 0.5)
    got = memo_events.drain_fills()
    assert got == [
        {"memo": "near_dup_pairs", "s": 1.235},
        {"memo": "token_arrays", "s": 0.5},
    ]
    # drained: a second drain (the next query's) sees nothing
    assert memo_events.drain_fills() == []
