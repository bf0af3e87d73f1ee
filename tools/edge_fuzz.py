"""Data-edge fuzzing of the oracle pack (VERDICT r7 #3).

The 352 Spark-vs-DuckDB oracle pairs are normally exercised only on
the three fixed driver fixtures.  This harness derives EDGE-CASE
variants of the sf0.001 fixture — the classic residual surface for
handwritten oracle pairs is null-handling and empty-input divergence —
and re-runs a deterministic sample of ``queries()`` vs ``oracle_sql()``
on each variant, in fetchall and (optionally) driver-faithful pandas
collection modes.

Variants (each a full parquet fixture dir):

- ``empty``    — every table truncated to 0 rows (schema preserved)
- ``single``   — every table truncated to 1 row (single-row groups,
                 keyless joins, degenerate stats)
- ``nulls``    — every double / string / list column all-NULL (int
                 keys and timestamps kept so joins/windows still key)
- ``unicode``  — every string column rewritten with deterministic
                 unicode/whitespace garbage (emoji, NBSP, zero-width,
                 RTL, CJK space, embedded newlines/tabs, quotes)
- ``dupkeys``  — first third of each table appended again (duplicate
                 join keys / exact-dup rows)
- ``skew``     — grouping keys collapsed to one value (o_custkey,
                 user_id, nation/region keys, lang/source, label) —
                 the one-partition-skew shape

Both engines read the SAME perturbed data, so any mismatch is a real
oracle divergence, not a data artifact.  On the ``empty``/``single``
variants a query may legitimately raise (e.g. a trained-model operator
with nothing to train on); the harness treats BOTH-sides-error as a
pass and flags one-sided errors.

Usage:
    python tools/edge_fuzz.py [--sample N] [--variants a,b,c]
                              [--pandas] [--json OUT.json] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_correctness import _norm, _norm_pandas, _pandas_rows, _rowset  # noqa: E402

from clickhouse_migrator_spark.session import get_spark  # noqa: E402
from clickhouse_migrator_spark.tables import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_EDGE_BASE", "/root/testdata/sf0.001")

VARIANTS = ("empty", "single", "nulls", "unicode", "dupkeys", "skew")

# Documented expected divergences: (variant, query) → reason.  A
# mismatch here is recorded as ``known_divergence`` (non-failure); a
# PASS still records pass, so fixes surface.  Every entry names an
# engine-level or contract-level cause, verified in round 8:
_R_ROLLUP = (
    "Spark's GROUP BY ROLLUP/CUBE/GROUPING SETS yields NO rows on an "
    "empty grouped input while ANSI/DuckDB emit the () grand-total row "
    "(probed: spark.range(0).rollup('a').count() == 0) — engine-level"
)
_R_DUPKEY = (
    "operator contract requires unique primary/sort keys (doc_id / "
    "vec_id / event_id / window sort keys): duplicated keys collapse "
    "in the oracle's GROUP BY-on-key model, square pair substrates, "
    "or make window tie order engine-arbitrary"
)
_R_COLLATION = (
    "JVM vs utf8proc unicode depth: reverse/upper/levenshtein operate "
    "on UTF-16 code units in Spark but grapheme/codepoint sequences "
    "in DuckDB — engine-level string semantics"
)
_R_SKETCH = (
    "sketch/interpolation tolerance calibrated for fixture group "
    "density; adversarial grouping (70 tiny groups of ~86 rows, "
    "neighbor gaps > 1% of the value) exceeds it on one engine"
)
KNOWN_DIVERGENCES: dict[tuple[str, str], str] = {}
for _q in (
    "agg_cube_status_priority",
    "agg_grouping_sets",
    "agg_rollup_region_nation",
    "dialect_with_rollup_hierarchy",
    "dialect_with_totals_status",
):
    KNOWN_DIVERGENCES[("empty", _q)] = _R_ROLLUP
    KNOWN_DIVERGENCES[("single", _q)] = _R_ROLLUP  # joins empty out
for _q in (
    "agg_group_array_moving_sum",
    "dedup_components_clusters",
    "dedup_containment_pairs",
    "dedup_keep_best_quality",
    "dedup_minhash_estimator_audit",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_shingle_cap_audit",
    "dedup_threshold_sweep",
    "graph_degree_distribution",
    "graph_density_summary",
    "graph_pagerank_dupgraph",
    "graph_triangles_clustering",
    "join_asof_last_purchase_before_error",
    "scalar_array_cumsum_diff",
    "scalar_point_in_polygon",
    "text_stopword_discovery",
    "window_exp_decayed_avg",
):
    KNOWN_DIVERGENCES[("dupkeys", _q)] = _R_DUPKEY
for _q in (
    "scalar_string_funcs",
    "text_edit_distance_pairs",
    "multimodal_payload_byte_histogram",
):
    KNOWN_DIVERGENCES[("unicode", _q)] = _R_COLLATION
for _q in ("agg_tdigest_percentile_audit", "agg_tukey_fences"):
    KNOWN_DIVERGENCES[("unicode", _q)] = _R_SKETCH

# grouping keys collapsed by the `skew` variant (never join-identity
# keys like o_orderkey — that would square the join output, which is a
# data explosion, not an oracle edge)
_SKEW_KEYS = {
    "o_custkey": 1,
    "user_id": 1,
    "c_nationkey": 0,
    "s_nationkey": 0,
    "n_regionkey": 0,
    "c_custkey": None,  # left alone (join identity)
}
_SKEW_STR = {"lang": "xx", "source": "s0", "event_type": "click"}


def _garbage(i: int) -> str:
    pieces = [
        "​",  # zero-width space
        "   ",  # NBSP
        "Ωé",
        "🚀",
        "　",  # CJK space
        "‮RTL",
        "it's \"q\"",
        "line\nbreak\t",
        "",
        "café́",  # combining accent
    ]
    return pieces[i % len(pieces)] + f"x{i % 7}" + pieces[(i * 3 + 1) % len(pieces)]


def _perturb(table: pa.Table, variant: str) -> pa.Table:
    n = table.num_rows
    if variant == "empty":
        return table.slice(0, 0)
    if variant == "single":
        return table.slice(0, 1)
    if variant == "dupkeys":
        return pa.concat_tables([table, table.slice(0, max(1, n // 3))])
    cols = {}
    for field in table.schema:
        col = table.column(field.name)
        if variant == "nulls" and (
            pa.types.is_floating(field.type)
            or pa.types.is_string(field.type)
            or pa.types.is_list(field.type)
        ):
            col = pa.nulls(n, type=field.type)
        elif variant == "unicode" and pa.types.is_string(field.type):
            col = pa.array([_garbage(i) for i in range(n)], pa.string())
        elif variant == "skew":
            if field.name in _SKEW_KEYS and _SKEW_KEYS[field.name] is not None:
                col = pa.array([_SKEW_KEYS[field.name]] * n).cast(field.type)
            elif field.name in _SKEW_STR:
                col = pa.array([_SKEW_STR[field.name]] * n, pa.string())
            elif field.name == "label":
                col = pa.array([0] * n).cast(field.type)
        cols[field.name] = col
    return pa.table(cols)


def build_variant(base_dir: str, out_dir: str, variant: str) -> str:
    vdir = os.path.join(out_dir, variant)
    os.makedirs(vdir, exist_ok=True)
    for t in TABLES:
        src = pq.read_table(os.path.join(base_dir, f"{t}.parquet"))
        pq.write_table(_perturb(src, variant), os.path.join(vdir, f"{t}.parquet"))
    return vdir


def sample_queries(n: int, explicit: set[str]) -> list[str]:
    """Deterministic sample: streaming mirrors excluded (micro-batch
    machinery, already restart/late-data tested), every k-th name of
    the sorted registry, plus a hand-picked null-sensitive core."""
    core = [
        "agg_approx_count_distinct",
        "agg_argmax_argmin",
        "asof_tolerance_last_purchase",
        "dedup_exact_summary",
        "window_cumulative_vwap",
        "setop_intersect_all_flag_bags",
        "scalar_url_funcs",
        "tpch_q1_pricing_summary",
        "join_null_safe_status",
        "join_anti_customers_without_orders",
    ]
    names = [n_ for n_ in entrymod.queries() if not n_.startswith("streaming_")]
    if explicit:
        return [n_ for n_ in names if n_ in explicit]
    names_sorted = sorted(names)
    step = max(1, len(names_sorted) // max(1, n))
    picked = names_sorted[::step][:n]
    for c in core:
        if c in names and c not in picked:
            picked.append(c)
    return picked


def run(
    variants: list[str],
    sample_n: int,
    pandas_mode: bool,
    explicit: set[str],
    json_out: str | None,
) -> int:
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    picked = sample_queries(sample_n, explicit)
    spark = get_spark(cpus=8, shuffle_partitions=8)
    out_root = tempfile.mkdtemp(prefix="edge_fuzz_")
    results: dict[str, dict] = {}
    failures: list[str] = []
    for variant in variants:
        vdir = build_variant(BASE_SF, out_root, variant)
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{vdir}/{t}.parquet'")
        for name in picked:
            key = f"{variant}/{name}"
            if name not in qs:
                continue
            serr = derr = None
            srows = scols = None
            try:
                sdf = qs[name](spark, vdir)
                if pandas_mode:
                    scols, srows = _pandas_rows(sdf.toPandas())
                else:
                    scols = sdf.columns
                    srows = [tuple(r) for r in sdf.collect()]
            except Exception as e:
                serr = f"{type(e).__name__}: {e}"[:200]
            if name not in oracles:
                results[key] = {"status": "rows_only", "spark_err": serr}
                continue
            drows = dcols = None
            try:
                rel = con.sql(oracles[name])
                if pandas_mode:
                    dcols, drows = _pandas_rows(rel.df())
                else:
                    dcols = list(rel.columns)
                    drows = rel.fetchall()
            except Exception as e:
                derr = f"{type(e).__name__}: {e}"[:200]
            if serr and derr:
                # degenerate input broke both engines the same way —
                # that IS agreement for edge purposes
                results[key] = {"status": "both_error",
                                "spark_err": serr, "duck_err": derr}
                continue
            if derr and not serr:
                # the ENGINE handled the degenerate input; DuckDB's own
                # evaluation of the oracle SQL did not (e.g. list ops on
                # NULL embeddings, CAST of invalid text) — an oracle
                # limitation, recorded but not an engine failure
                results[key] = {"status": "oracle_error", "duck_err": derr}
                print(f"note  {key}: oracle-side error {derr[:120]}")
                continue
            if serr:
                results[key] = {"status": "one_sided_error",
                                "spark_err": serr, "duck_err": derr}
                failures.append(key)
                print(f"FAIL  {key}: one-sided error "
                      f"spark={serr} duckdb={derr}")
                continue
            problems = []
            if len(srows) != len(drows):
                problems.append(f"rowcount {len(srows)} vs {len(drows)}")
            if sorted(scols) != sorted(dcols):
                problems.append("cols differ")
            if not problems:
                normf = _norm_pandas if pandas_mode else _norm
                s = _rowset(scols, srows, normf)
                d = _rowset(dcols, drows, normf)
                if s != d:
                    diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
                    problems.append(f"values: {diff}")
            if problems:
                reason = KNOWN_DIVERGENCES.get((variant, name))
                if reason:
                    results[key] = {"status": "known_divergence",
                                    "reason": reason,
                                    "detail": "; ".join(problems)[:200]}
                    print(f"known {key}: {reason[:90]}")
                else:
                    results[key] = {"status": "mismatch",
                                    "detail": "; ".join(problems)[:400]}
                    failures.append(key)
                    print(f"FAIL  {key}: " + "; ".join(problems)[:300])
            else:
                results[key] = {"status": "pass", "rows": len(srows)}
        con.close()
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    n_both = sum(1 for r in results.values() if r["status"] == "both_error")
    n_known = sum(
        1 for r in results.values() if r["status"] == "known_divergence"
    )
    n_oerr = sum(1 for r in results.values() if r["status"] == "oracle_error")
    print(f"\nedge_fuzz: {n_pass} pass, {n_both} both-error, "
          f"{n_known} known-divergence, {n_oerr} oracle-error, "
          f"{len(failures)} failures over {len(variants)} variants × "
          f"{len(picked)} queries"
          + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if failures else 0


def main() -> int:
    argv = sys.argv[1:]
    sample_n, variants, pandas_mode, json_out = 40, list(VARIANTS), False, None
    rest: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sample":
            sample_n = int(argv[i + 1]); i += 2
        elif a == "--variants":
            variants = argv[i + 1].split(","); i += 2
        elif a == "--pandas":
            pandas_mode = True; i += 1
        elif a == "--json":
            json_out = argv[i + 1]; i += 2
        else:
            rest.append(a); i += 1
    return run(variants, sample_n, pandas_mode, set(rest), json_out)


if __name__ == "__main__":
    raise SystemExit(main())
