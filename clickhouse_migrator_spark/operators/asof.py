"""As-of join as a reusable custom operator (SURVEY.md §2.D).

Spark has no native ASOF JOIN.  Two implementations:

1. :func:`clickhouse_migrator_spark.operators.joins.join_asof` —
   declarative composition (range join + per-row max): best when the
   right side per key is small.
2. :func:`asof_join` here — co-partition both sides on the `by` key
   and run a linear `pandas.merge_asof` per group via
   ``applyInPandas``: best when histories are long (O(n log n) sort +
   linear merge per key instead of an O(n·m) fan-out join).  Arrow
   batches keep the Python boundary cheap.

The registered query is the same semantics as
``join_asof_last_purchase_before_error`` so the DuckDB ASOF JOIN
oracle certifies BOTH implementations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from ..registry import register
from ..tables import table


# Bucketing floor and sizing target.  The bucket count is derived per
# call from the optimizer's input-size estimate (VERDICT r4 perf item:
# a hard-coded 64 caps parallelism at 64 tasks and puts corpus/64 bytes
# in one pandas frame — an OOM at the 100 TB design point).  The floor
# keeps tiny inputs from collapsing to a handful of Arrow round-trips
# with no parallelism.
ASOF_MIN_BUCKETS = 64
# ~64 MiB of estimated input per bucket: with Arrow/pandas inflation of
# 3-5x the per-task working set stays well inside a normal executor.
ASOF_TARGET_BUCKET_BYTES = 64 << 20
# the optimizer returns Long.MaxValue-ish sizes when it has no stats —
# treat anything past 2^60 as "unknown"
_UNKNOWN_SIZE = 1 << 60


def _asof_bucket_count(left: DataFrame, right: DataFrame) -> int:
    """Bucket count for the union shuffle: estimated input bytes over
    the per-bucket target, floored at ASOF_MIN_BUCKETS.

    One ``by`` key's full history must still fit a single task (hash
    bucketing cannot split a key), so extremely skewed keys need a
    pre-aggregation or key-salting upstream — documented contract, same
    as pandas ``merge_asof`` itself."""
    try:
        est = sum(
            int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            for df in (left, right)
        )
    except Exception:  # noqa: BLE001 — stats unavailable (e.g. connect)
        est = -1
    if est <= 0 or est >= _UNKNOWN_SIZE:
        sc = left.sparkSession.sparkContext
        return max(ASOF_MIN_BUCKETS, 8 * int(sc.defaultParallelism))
    return max(ASOF_MIN_BUCKETS, -(-est // ASOF_TARGET_BUCKET_BYTES))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """Distributed merge_asof: for each left row, the nearest right row
    with ``right.on <= left.on`` (backward) within the same ``by`` group.

    Both sides are unioned with a side tag and shuffled ONCE on
    ``hash(by) % n_buckets`` — bucketing (instead of one Python group
    per key) keeps the number of Arrow round-trips constant as key
    cardinality grows; within a bucket one ``pd.merge_asof(..., by=)``
    handles every key linearly.  The bucket count scales with the
    optimizer's input-size estimate (:func:`_asof_bucket_count`), so
    per-task memory is bounded by ASOF_TARGET_BUCKET_BYTES rather than
    corpus/64, and parallelism grows with the data instead of capping
    at a constant.  This is the scalable as-of plan: no fan-out join,
    per-task memory bounded by its bucket."""
    lcols = left.columns
    rcols = [c for c in right.columns if c != by]
    out_schema = StructType(
        left.schema.fields
        + [
            type(f)(f.name + suffix if f.name in lcols else f.name, f.dataType, True)
            for f in right.schema.fields
            if f.name != by
        ]
    )
    out_names = [f.name for f in out_schema.fields]
    r_on = on + suffix if on in lcols else on
    n_buckets = _asof_bucket_count(left, right)
    tagged = (
        left.withColumn("__side", F.lit(0))
        .unionByName(right.withColumn("__side", F.lit(1)), allowMissingColumns=True)
        .withColumn("__bucket", F.pmod(F.hash(F.col(by)), F.lit(n_buckets)))
    )

    def merge(key, pdf: pd.DataFrame):
        l = pdf[pdf["__side"] == 0][lcols].sort_values(on)
        r = (
            pdf[pdf["__side"] == 1][[by, *rcols]]
            .rename(columns={c: (c + suffix if c in lcols else c) for c in rcols})
            .sort_values(r_on)
        )
        if l.empty:
            return pd.DataFrame(columns=out_names)
        merged = pd.merge_asof(
            l,
            r,
            left_on=on,
            right_on=r_on,
            by=by,
            direction=direction,
            tolerance=tolerance,
        )
        return merged[out_names]

    return tagged.groupBy("__bucket").applyInPandas(merge, out_schema)


@register(
    "asof_pandas_last_purchase",
    oracle="""
    SELECT e.event_id, e.ts, p.ts AS ts_right
    FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    """,
)
def asof_pandas_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    pur = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(err, pur, on="ts", by="user_id")
    return out.select("event_id", "ts", "ts_right")


@register(
    "asof_forward_next_purchase",
    oracle="""
    SELECT e.event_id, e.ts, p.ts AS ts_right
    FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts >= e.ts
    """,
)
def asof_forward_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each error, the user's NEXT purchase at
    or after it — the "did the incident block conversion" probe (the
    backward variant answers "what preceded it").  Same grouped
    Arrow-batched merge_asof substrate, direction flipped; DuckDB's
    native ASOF JOIN with a ``>=`` condition is the oracle."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    pur = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(err, pur, on="ts", by="user_id", direction="forward")
    return out.select("event_id", "ts", "ts_right")


@register(
    "asof_tolerance_last_purchase",
    oracle="""
    WITH j AS (
      SELECT e.event_id, e.ts, p.ts AS matched
      FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error') e
      ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id AND p.ts <= e.ts)
    SELECT event_id, ts,
           CASE WHEN ts - matched <= INTERVAL '1 day' THEN matched END AS ts_right
    FROM j
    """,
)
def asof_tolerance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE: the last purchase before each
    error, but only if it happened within 24 hours — stale context is
    worse than none (feature-store point-in-time joins all carry this
    bound).  `pd.merge_asof(tolerance=...)` inside the same bucketed
    Arrow substrate; the oracle post-filters DuckDB's unbounded ASOF
    match to the window."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    pur = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(
        err, pur, on="ts", by="user_id", tolerance=pd.Timedelta(days=1)
    )
    return out.select("event_id", "ts", "ts_right")


@register(
    "asof_nearest_purchase",
    oracle="""
    WITH e AS (SELECT event_id, ts, user_id FROM events
               WHERE event_type = 'error'),
    p AS (SELECT DISTINCT user_id, ts FROM events
          WHERE event_type = 'purchase'),
    ranked AS (
      SELECT e.event_id, e.ts, p.ts AS p_ts,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP))
                            - epoch_us(CAST(p.ts AS TIMESTAMP))),
                        p.ts) AS rk
      FROM e JOIN p ON e.user_id = p.user_id)
    SELECT e.event_id, e.ts, r.p_ts AS ts_right
    FROM e LEFT JOIN (SELECT event_id, p_ts FROM ranked WHERE rk = 1) r
      ON e.event_id = r.event_id
    """,
)
def asof_nearest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join: each error matched to the closest
    purchase in EITHER direction — the "what was the user doing around
    the incident" probe (backward = cause context, forward = effect,
    nearest = whichever is tighter; pandas `merge_asof
    direction='nearest'` breaks exact-distance ties toward the EARLIER
    right row, verified empirically, and the oracle's
    (abs-gap, purchase-ts) ranking mirrors that).  The purchase side is
    deduplicated per (user, ts) so equal-timestamp rows cannot make the
    match order-dependent.  DuckDB has no nearest ASOF, so the oracle
    ranks the per-user join — quadratic per user, fine as an oracle;
    the engine path stays the linear bucketed merge_asof substrate."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts", "user_id")
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
    )
    out = asof_join(err, pur, on="ts", by="user_id", direction="nearest")
    return out.select("event_id", "ts", "ts_right")
