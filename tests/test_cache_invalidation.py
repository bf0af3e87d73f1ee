"""End-to-end substrate-cache invalidation (VERDICT r5 next-round #5,
ADVICE r5 #2/#3).

Three session-scoped memo layers key on a corpus fingerprint
(path + mtime_ns + size per data file):

* the dedup substrate (`_SHINGLE_CACHE`, `_NEAR_DUP_CACHE`,
  `_COMPONENT_CACHE`) plus its executor-storage scratch entries,
* the streaming events schema cache (`_EVENTS_SCHEMA_CACHE`).

These tests rewrite fixture copies IN PLACE and assert every layer
rebuilds from the new bytes rather than serving stale results, and that
scratch release is scoped per corpus (an interleaved build for another
sf_dir keeps its cache).
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"


def _write_docs(dest_dir, limit, tag=""):
    """A documents.parquet with the first ``limit`` fixture docs (text
    optionally tagged so contents, size and mtime all change)."""
    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT doc_id, text || '{tag}' AS text, lang, source, n_chars "
        f"      FROM '{SRC}/documents.parquet' ORDER BY doc_id LIMIT {limit}) "
        f"TO '{dest_dir}/documents.parquet' (FORMAT PARQUET)"
    )


def test_dedup_substrate_rebuilds_on_corpus_rewrite(spark, tmp_path):
    """Mutating documents.parquet in place must invalidate EVERY dedup
    memo layer — shingle stream, verified pairs, component labels — via
    the fingerprint key alone (no explicit invalidation call)."""
    from clickhouse_migrator_spark.operators.dedup import (
        _COMPONENT_CACHE,
        _NEAR_DUP_CACHE,
        _SHINGLE_CACHE,
        component_labels,
        near_dup_pairs,
        shingles,
    )

    d = str(tmp_path / "corpus_a")
    (tmp_path / "corpus_a").mkdir()
    _write_docs(d, 60)

    sh1 = shingles(spark, d)
    docs1 = sh1.select("doc_id").distinct().count()
    pairs1 = near_dup_pairs(spark, d)
    labels1 = component_labels(spark, d)
    keys1 = {
        "sh": [k for k in _SHINGLE_CACHE if k[1] == d],
        "nd": [k for k in _NEAR_DUP_CACHE if k[1] == d],
        "cc": [k for k in _COMPONENT_CACHE if k[1] == d],
    }
    assert keys1["sh"] and keys1["nd"] and keys1["cc"]

    # rewrite the corpus in place: fewer docs, different bytes
    _write_docs(d, 25, tag=" rewritten")

    sh2 = shingles(spark, d)
    assert sh2 is not sh1
    docs2 = sh2.select("doc_id").distinct().count()
    assert docs2 < docs1  # rebuilt from the NEW bytes, not stale
    assert near_dup_pairs(spark, d) is not pairs1
    assert component_labels(spark, d) is not labels1
    # superseded-fingerprint keys coexist until explicit invalidation;
    # the NEW fingerprint must be present alongside
    for cache, old in (
        (_SHINGLE_CACHE, keys1["sh"]),
        (_NEAR_DUP_CACHE, keys1["nd"]),
        (_COMPONENT_CACHE, keys1["cc"]),
    ):
        fresh = [k for k in cache if k[1] == d and k not in old]
        assert fresh, "no new-fingerprint cache entry after rewrite"


def test_scratch_release_scoped_per_corpus(spark, tmp_path):
    """ADVICE r5 #3: finalizing/invalidating corpus A must not unpersist
    corpus B's in-flight per_doc scratch cache."""
    from clickhouse_migrator_spark.operators.dedup import (
        _NEAR_DUP_SCRATCH,
        _near_dup_pairs_impl,
        invalidate_near_dup_cache,
        near_dup_pairs,
    )

    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    (tmp_path / "a").mkdir(), (tmp_path / "b").mkdir()
    _write_docs(da, 30)
    _write_docs(db, 30, tag=" corpus b")

    invalidate_near_dup_cache()  # clean slate
    # direct impl call for B leaves its scratch registered (plan-test path)
    _near_dup_pairs_impl(spark, db)
    b_scratch = [(o, s) for o, s in _NEAR_DUP_SCRATCH if o == db]
    assert b_scratch
    assert all(s.storageLevel.useMemory for _, s in b_scratch)

    # wrapper build for A releases only A's scratch
    near_dup_pairs(spark, da)
    assert [(o, s) for o, s in _NEAR_DUP_SCRATCH if o == da] == []
    assert [(o, s) for o, s in _NEAR_DUP_SCRATCH if o == db] == b_scratch

    # scoped invalidation of A still leaves B; invalidating B drops it
    invalidate_near_dup_cache(da)
    assert [(o, s) for o, s in _NEAR_DUP_SCRATCH if o == db] == b_scratch
    invalidate_near_dup_cache(db)
    assert not any(o == db for o, _ in _NEAR_DUP_SCRATCH)


def test_events_schema_cache_rebuilds_on_rewrite(spark, tmp_path):
    """ADVICE r5 #2: the streaming schema cache must key on the events
    fingerprint — rewriting events.parquet with a DIFFERENT schema in
    the same session must be observed, and superseded fingerprints for
    the same path must be evicted (no unbounded growth)."""
    from clickhouse_migrator_spark.streaming.events_stream import (
        _EVENTS_SCHEMA_CACHE,
        events_schema,
    )

    d = str(tmp_path / "ev")
    (tmp_path / "ev").mkdir()
    shutil.copy(f"{SRC}/events.parquet", f"{d}/events.parquet")

    s1 = events_schema(spark, d)
    assert events_schema(spark, d) is s1  # memo hit on unchanged bytes
    assert "extra_col" not in s1.fieldNames()

    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT *, 1 AS extra_col FROM '{SRC}/events.parquet' LIMIT 10) "
        f"TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    s2 = events_schema(spark, d)
    assert "extra_col" in s2.fieldNames()
    # one live entry per (app, path): the stale fingerprint was evicted
    assert len([k for k in _EVENTS_SCHEMA_CACHE if k[1] == d]) == 1
