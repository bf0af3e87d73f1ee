"""Registry of every constant that shapes CANDIDATE GENERATION or
bounded work in the pack — the fixed-entropy audit (VERDICT r8 → r9 #2).

The round-8 sf1 scaling bench proved the failure mode: a constant
blocking key (`join_fuzzy_entity_match`'s last-2 chars) kept per-block
pair counts quadratic in the corpus, invisible at sf0.1 and 63× at sf1.
Any constant that caps, buckets, bands, or blocks candidate work is the
same trap waiting for its decade.  This registry forces each one into a
named class with an explicit scale argument; ``tools/plan_audit.py``
prints the table every round and FAILS if an entry rots (the attribute
disappears from its module), exactly like the bounded-single-partition
registry.

Classes:

- ``scaling-law`` — the constant only POSITIONS a curve whose entropy
  term is computed from the data inside the plan (and mirrored in the
  DuckDB oracle).  Candidate work stays ~linear at every decade.
- ``bounded-cap`` — a hard ceiling with a documented audit-sample or
  drop-observability contract; work is O(cap·n) or O(cap²) by
  construction, never O(n²).
- ``structural`` — forced by the algorithm's exactness/semantics; the
  residual growth law and its safe range are stated honestly.
- ``quality-knob`` — affects recall/precision or output shape, NOT
  candidate boundedness; boundedness comes from elsewhere (stated).
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass

_OPS = "clickhouse_migrator_spark.operators"


@dataclass(frozen=True)
class EntropyConstant:
    module: str  # import path
    attr: str  # module attribute (anti-rot anchor)
    kind: str  # scaling-law | bounded-cap | structural | quality-knob
    note: str  # the scale argument, one paragraph


ENTROPY_CONSTANTS: dict[str, EntropyConstant] = {
    "joins.FUZZY_BLOCK_TARGET": EntropyConstant(
        f"{_OPS}.joins",
        "FUZZY_BLOCK_TARGET",
        "scaling-law",
        "Average customers-per-block target for the fuzzy entity join. "
        "The block-key LENGTH is computed inside the plan as "
        "digits(ceil(n/B)) (Python mirror: joins.fuzzy_block_len), so "
        "block count grows with the corpus and per-block pairs stay "
        "~B-bounded at every decade; the DuckDB oracle computes the "
        "identical arithmetic.  Pinned decade-over-decade in "
        "tests/test_entropy_scaling.py.",
    ),
    "dedup.SIGN_BUCKET_TARGET": EntropyConstant(
        f"{_OPS}.dedup",
        "SIGN_BUCKET_TARGET",
        "scaling-law",
        "Average vectors-per-bucket target for embedding sign-LSH.  Band "
        "WIDTH is computed inside the plan as bits(ceil(n/B)) (mirror: "
        "dedup.sign_band_dims), capped at dim/N_SIGN_BANDS, so bucket "
        "count tracks the corpus and the bucket self-join stays ~B-"
        "bounded; oracle computes the identical arithmetic.  Pinned in "
        "tests/test_entropy_scaling.py.  Residual: past n ≈ 2^(dim/2)·B "
        "axis-sign entropy is exhausted — switch to random hyperplanes "
        "(more independent bits than dims) at that scale.",
    ),
    "dedup.N_HASHES": EntropyConstant(
        f"{_OPS}.dedup",
        "N_HASHES",
        "quality-knob",
        "MinHash signature length (32 = 16 bands × 2 rows) sets the "
        "Jaccard S-curve threshold (collision prob = 1-(1-j^2)^16), NOT "
        "candidate boundedness.  LSH buckets are keyed by 64-bit minhash "
        "values: non-dup bucket collisions are ~n²/2^64 (negligible below "
        "~10^9 docs) and true-dup bucket sizes are proportional to real "
        "duplicate clusters — inherent output size, not a planning "
        "artifact.  SHINGLE_DF_CAP separately kills boilerplate "
        "mega-buckets.",
    ),
    "dedup.SHINGLE_DF_CAP": EntropyConstant(
        f"{_OPS}.dedup",
        "SHINGLE_DF_CAP",
        "bounded-cap",
        "Shingles appearing in more than 64 docs are dropped as "
        "boilerplate before minhashing: posting-list work per surviving "
        "shingle is ≤ cap², total O(cap²·n_shingles) = linear in corpus. "
        "Drops are observable via the registered stop-shingle "
        "observability query (dedup_stop_shingle_report); recall loss is "
        "the documented trade (boilerplate shingles carry no dedup "
        "signal).",
    ),
    "dedup.SIMHASH_BITS": EntropyConstant(
        f"{_OPS}.dedup",
        "SIMHASH_BITS",
        "structural",
        "60-bit simhash with HAMMING_T=2 forces exactly 3 pigeonhole "
        "bands of 20 bits — band width is NOT free: widening bands "
        "breaks the ≥1-exact-band guarantee, narrowing them explodes "
        "candidates.  Non-dup band collisions grow ~n²/2^20: fine to "
        "~10^7 docs, after which the documented production move is a "
        "wider signature (128-bit, 4×32 bands for ham≤3) or prefix-"
        "extended multi-table blocking — same algorithm, more entropy "
        "per band.",
    ),
    "dedup.EXACT_COSINE_CAP": EntropyConstant(
        f"{_OPS}.dedup",
        "EXACT_COSINE_CAP",
        "bounded-cap",
        "The exact all-pairs GEMM baseline runs on a deterministic "
        "≤10k-vector hash sample (audit-sample contract in its "
        "docstring); O(cap²·dim) regardless of corpus.  The production "
        "path is the bucketed sign-LSH twin.",
    ),
    "dedup.LOCAL_CC_EDGE_CAP": EntropyConstant(
        f"{_OPS}.dedup",
        "LOCAL_CC_EDGE_CAP",
        "bounded-cap",
        "Path SELECTOR, not a coverage bound: ≤100k edges solve as one "
        "driver union-find (~50 MB heap, sized in the constant's "
        "comment); ABOVE the cap the distributed log-diameter "
        "propagation loop takes over — nothing is dropped at any scale "
        "(9M-edge smoke in SCALE.md).",
    ),
    "pipeline.LEAK_DF_CAP": EntropyConstant(
        f"{_OPS}.pipeline",
        "LEAK_DF_CAP",
        "bounded-cap",
        "Split-leakage audit drops grams shared by >64 docs "
        "(boilerplate) before the posting join: per-gram work ≤ cap², "
        "total linear in gram count.  Same df-cap argument as "
        "SHINGLE_DF_CAP; boilerplate grams are noise for leakage "
        "detection by construction.",
    ),
    "similarity.CAND_CAP": EntropyConstant(
        f"{_OPS}.similarity",
        "CAND_CAP",
        "bounded-cap",
        "Brute-force top-k cosine candidates come from a deterministic "
        "~10k-row hash sample with the query side broadcast — an audit-"
        "sample contract (docstring); the scale paths are the LSH / IVF "
        "twins.",
    ),
    "similarity.KMEANS_TRAIN_CAP": EntropyConstant(
        f"{_OPS}.similarity",
        "KMEANS_TRAIN_CAP",
        "bounded-cap",
        "IVF k-means trains on a ≤4096-vector deterministic sample "
        "(FAISS train-on-sample posture); assignment still covers every "
        "vector via broadcast centroids.  Driver memory O(cap·dim).",
    ),
    "similarity.KMEANS_K": EntropyConstant(
        f"{_OPS}.similarity",
        "KMEANS_K",
        "quality-knob",
        "IVF list count: per-query probe cost is ~nprobe·n/K, so at "
        "scale K should grow ~√n (FAISS guidance) — here K=8 is pinned "
        "by the rows-only golden-hash contract (sim_ivf_kmeans_topk has "
        "no SQL oracle; tri-SF golden hashes + recall pins certify it) "
        "and is the documented production tuning knob.  Boundedness is "
        "unaffected: assignment is broadcast-centroid, never a shuffle "
        "of the corpus.",
    ),
    "stats.PREFIX_BUCKETS": EntropyConstant(
        f"{_OPS}.stats",
        "PREFIX_BUCKETS",
        "structural",
        "Global-rank substrate: 64 value buckets whose per-bucket "
        "aggregation is fully distributed; only the 64-row bucket-prefix "
        "step is serial.  Per-bucket row counts grow n/64 but the work "
        "on them is a partitioned aggregate — no quadratic term at any "
        "n (200M-row median smoke in SCALE.md).",
    ),
    "events.INTERVAL_BUCKET (1 hour)": EntropyConstant(
        f"{_OPS}.events",
        "join_interval_overlap_bucketed",
        "structural",
        "The interval-overlap join's hour buckets are fixed by the "
        "query's 30-minute overlap SEMANTICS (each interval spans ≤2 "
        "buckets), not by corpus size: join-group fan-out is bounded by "
        "per-(user, hour) activity — data DENSITY, which does not grow "
        "with corpus cardinality; the residual predicate + dedup keep "
        "exactness.",
    ),
}


def check() -> list[str]:
    """Anti-rot: every registered constant must still exist in its
    module.  Returns a list of problems (empty = healthy)."""
    problems = []
    for name, ec in ENTROPY_CONSTANTS.items():
        try:
            mod = importlib.import_module(ec.module)
        except Exception as e:  # pragma: no cover
            problems.append(f"{name}: module import failed: {e}")
            continue
        if not hasattr(mod, ec.attr):
            problems.append(f"{name}: attribute {ec.attr} gone from {ec.module}")
    return problems
