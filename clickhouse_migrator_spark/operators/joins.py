"""Join operator pack (SURVEY.md §2.D).

The reference's only joins are the metadata full-outer/anti joins of its
diff planner (`/root/reference/clickhouse_migrate/migrate.py:34-41` —
rebuilt in :mod:`..migrate`); this pack is the driver-mandated general
join surface over the star schema: inner/left/right/full/semi/anti
equi-joins, explicit broadcast, theta/range joins, and an as-of join.

Scale notes: dimension sides are broadcast (`F.broadcast`) so fact
tables never shuffle for dim joins; fact-fact joins shuffle on their
keys and AQE handles skew.  The range join is a broadcast
nested-loop against a tiny bucket dim — the only sane plan for
interval containment.  The as-of join composes shuffle-on-key +
per-key reduction (see also :mod:`.asof` for the applyInPandas
merge_asof variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import table


@register(
    "join_inner_orders_customer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_left_customer_orders",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                      AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_right_nation_supplier",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "join_full_outer_nation_presence",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk)        AS nationkey,
           coalesce(n_customers, 0)      AS n_customers,
           coalesce(n_suppliers, 0)      AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregated sides — the same shape as the
    migration diff planner (`/root/reference/.../migrate.py:34`), here
    over data tables."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the committed-but-deleted detection shape of the
    reference diff (`migrate.py:35-37`), over data tables."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast_geo_rollout",
    oracle="""
    SELECT r_name, count(*) AS n_customers, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained explicitly-broadcast dim joins — zero fact shuffles
    before the aggregation."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


@register(
    "join_range_value_buckets",
    oracle="""
    SELECT lo, hi, count(*) AS n_events, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    JOIN (VALUES (0, 50), (50, 100), (100, 200), (200, 500)) b(lo, hi)
      ON value >= lo AND value < hi
    GROUP BY lo, hi
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (theta) join: events against a broadcast bucket dim
    via interval containment — plans as BroadcastNestedLoopJoin, the
    right physical choice when one side is tiny."""
    e = table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(0, 50), (50, 100), (100, 200), (200, 500)], "lo INT, hi INT"
    )
    return (
        e.join(F.broadcast(buckets), (e.value >= buckets.lo) & (e.value < buckets.hi))
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("total_value"),
        )
    )


@register(
    "join_cross_region_priority_grid",
    oracle="""
    SELECT r_name, o_orderpriority, n_orders FROM region
    CROSS JOIN (SELECT o_orderpriority, count(*) AS n_orders
                FROM orders GROUP BY o_orderpriority) p
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join — legitimate only when at least one side is
    provably tiny (here: 5 regions × 5 aggregated priorities); the
    engine's plan audit flags any accidental CartesianProduct."""
    r = table(spark, sf_dir, "region").select("r_name")
    p = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return r.crossJoin(F.broadcast(p))


@register(
    "join_asof_last_purchase_before_error",
    oracle="""
    SELECT e.event_id, e.ts, p.ts AS last_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (declarative composition): for every error event, the
    most recent purchase by the same user at or before it.

    Spark lacks a native ASOF JOIN; this composes equi-join on the
    ``by`` key + range predicate + per-left-row max — shuffles both
    sides once on user_id.  For long right-side histories use
    :mod:`.asof`'s applyInPandas merge_asof variant (linear merge
    within co-partitioned groups instead of a fan-out join)."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "ts", F.col("user_id").alias("e_user")
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        err.join(pur, (err.e_user == pur.p_user) & (pur.p_ts <= err.ts), "left")
        .groupBy("event_id", "ts")
        .agg(F.max("p_ts").alias("last_purchase_ts"))
    )


@register(
    "join_null_safe_status",
    oracle="""
    WITH l AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS s FROM orders),
         d AS (SELECT DISTINCT nullif(o_orderstatus, 'O') AS s,
                      coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS label
               FROM orders)
    SELECT d.label, count(*) AS n_orders
    FROM l JOIN d ON l.s IS NOT DISTINCT FROM d.s
    GROUP BY d.label
    ORDER BY d.label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping — required when the join key
    legitimately contains NULL (here a NULLed-out 'open' status).
    Still a hash join: `<=>` is an equi-condition, so Catalyst keeps
    hash partitioning (no fallback to nested-loop)."""
    o = table(spark, sf_dir, "orders")
    left = o.select("o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("s"))
    dim = (
        o.select(
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("ds"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
                "label"
            ),
        )
        .distinct()
    )
    return (
        left.join(F.broadcast(dim), left.s.eqNullSafe(dim.ds))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("label")
    )


@register(
    "join_asof_next_purchase_after_error",
    oracle="""
    SELECT e.event_id, e.ts, min(p.ts) AS next_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts > e.ts
    GROUP BY e.event_id, e.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — for every error event, the FIRST purchase
    by the same user strictly after it (the recovery-time question;
    mirror image of ``join_asof_last_purchase_before_error``).  Same
    plan shape: equi-join on the ``by`` key + range predicate +
    per-left-row min, one user_id shuffle for both sides.  For long
    histories the merge_asof ``applyInPandas`` variant in :mod:`.asof`
    does the linear merge with ``direction='forward'`` instead of the
    fan-out join."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "ts", F.col("user_id").alias("e_user")
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        err.join(pur, (err.e_user == pur.p_user) & (pur.p_ts > err.ts), "left")
        .groupBy("event_id", "ts")
        .agg(F.min("p_ts").alias("next_purchase_ts"))
    )


@register(
    "join_asof_tolerance_1h",
    oracle="""
    SELECT e.event_id, e.ts, max(p.ts) AS last_purchase_1h
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 1 HOUR
    GROUP BY e.event_id, e.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a TOLERANCE bound (pandas
    ``merge_asof(tolerance=1h)``): the most recent purchase within the
    preceding hour, else NULL — the variant that keeps stale matches
    out of feature joins.  The lower bound also caps the fan-out of
    the range join: each error row meets only the purchases of its
    one-hour window, so the join stays linear in events at 100 TB
    (the unbounded as-of's worst case is the full user history)."""
    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "ts", F.col("user_id").alias("e_user")
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (err.e_user == pur.p_user)
        & (pur.p_ts <= err.ts)
        & (pur.p_ts >= err.ts - F.expr("INTERVAL 1 HOUR"))
    )
    return (
        err.join(pur, cond, "left")
        .groupBy("event_id", "ts")
        .agg(F.max("p_ts").alias("last_purchase_1h"))
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
    p AS (
      SELECT user_id, ts AS pts, value FROM events WHERE event_type = 'purchase'),
    scored AS (
      SELECT e.event_id, e.user_id, e.ts, p.pts, p.value,
             round(abs(epoch(e.ts) - epoch(p.pts)), 6) AS dt,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(epoch(e.ts) - epoch(p.pts)), p.pts) AS rk
      FROM e JOIN p ON e.user_id = p.user_id)
    SELECT event_id, user_id, ts AS error_ts, pts AS nearest_purchase_ts,
           value AS purchase_value, dt AS dt_seconds
    FROM scored WHERE rk = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join (pandas ``merge_asof(direction=
    'nearest')``): for every error event, the same user's purchase with
    the smallest absolute time distance, in either direction —
    completing the as-of family next to the backward / forward /
    tolerance variants.

    Shape: one user-keyed equi-join (both sides hash on user_id), then
    a per-error argmin window.  Per-user candidate fan-out is
    |errors|×|purchases| for that user — fine while per-user activity
    is bounded; at extreme per-user volumes, pre-bucket both sides by
    coarse time and union the adjacent-bucket joins to cap the
    product."""
    ev = table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts"), "value"
    )
    scored = e.join(p, F.col("user_id") == F.col("p_user")).select(
        "event_id",
        "user_id",
        "ts",
        "pts",
        "value",
        # fractional seconds — a cast to long would truncate microseconds
        # and disagree with the oracle's epoch() on both the value and,
        # under sub-second ties, the argmin itself
        F.round(
            F.abs(
                F.col("ts").cast("timestamp").cast("double")
                - F.col("pts").cast("timestamp").cast("double")
            ),
            6,
        ).alias("dt"),
    )
    w = Window.partitionBy("event_id").orderBy("dt", "pts")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("error_ts"),
            F.col("pts").alias("nearest_purchase_ts"),
            F.col("value").alias("purchase_value"),
            F.col("dt").alias("dt_seconds"),
        )
    )


@register(
    "join_salted_equivalence",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_salted_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting primitive (`operators.skew.salted_join`) certified
    through the oracle gate: a salted events⨝customer join must be
    row-identical to the plain join, so its aggregate hash-matches the
    plain-join oracle.  16 salts scatter each key over 16 (key, salt)
    shuffle partitions — the manual fallback for hot keys AQE can't
    split (measured against AQE in `tools/scale_smoke.py`)."""
    from .skew import salted_join

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        salted_join(ev, cust, "user_id", n_salts=16)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_referential_audit",
    oracle="""
    SELECT 'missing_order' AS violation,
           count(*) AS n_rows
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'missing_part', count(*)
    FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
    UNION ALL
    SELECT 'missing_supplier', count(*)
    FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
    UNION ALL
    SELECT 'orphan_order', count(*)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    ORDER BY violation
    """,
)
def join_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphaned foreign keys across the
    star schema (lineitems without their order/part/supplier, orders
    without their customer) — the data-quality gate every warehouse
    load should run, and the reference diff-planner's anti-join shape
    (`/root/reference/clickhouse_migrate/migrate.py:35-37`) applied to
    facts instead of migrations.

    Each check is a broadcast ANTI-join (dim key sets are small even at
    100 TB relative to facts) counting survivors; the four counts union
    into one report."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def check(name: str, fact: DataFrame, key: str, dim: DataFrame, dkey: str) -> DataFrame:
        return (
            fact.join(
                F.broadcast(dim.select(F.col(dkey).alias(key)).distinct()),
                key,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(name).alias("violation"), "n_rows")
        )

    return (
        check("missing_order", li, "l_orderkey", o, "o_orderkey")
        .unionByName(
            check("missing_part", li, "l_partkey", table(spark, sf_dir, "part"), "p_partkey")
        )
        .unionByName(
            check(
                "missing_supplier",
                li,
                "l_suppkey",
                table(spark, sf_dir, "supplier"),
                "s_suppkey",
            )
        )
        .unionByName(
            check(
                "orphan_order",
                o,
                "o_custkey",
                table(spark, sf_dir, "customer"),
                "c_custkey",
            )
        )
        .orderBy("violation")
    )


# join_fuzzy_entity_match: average customers-per-block the data-driven
# key targets.  The key LENGTH scales (digits of ceil(n/B)) so per-block
# pair counts stay ~B×(B/fan) regardless of corpus size; the constant
# only positions the linear curve.  Registered in tools/plan_audit.py's
# entropy-constant section.
FUZZY_BLOCK_TARGET = 100


def fuzzy_block_len(n: int, target: int = FUZZY_BLOCK_TARGET) -> int:
    """Python mirror of the in-plan block-key-length law (tests +
    documentation): k = max(2, decimal digits of ceil(n / target)).

    ``n`` is the number of DISTINCT names, not rows: blocking entropy
    comes from distinct key material — a duplicate-heavy corpus (the
    r9 sf10 probe's verbatim-copied names: 100 copies of every name)
    has the entropy of its distinct set, and a row-count law overcounts
    it, leaving per-block pairs ∝ dup_rate² (caught at 27× on the
    second decade).  Duplicate names still meet in blocks — that
    fan-out is the operator's OUTPUT for duplicate keys, irreducible by
    any blocking scheme."""
    import math

    return max(2, len(str(int(math.ceil(n / float(target))))))


@register(
    "join_fuzzy_entity_match",
    oracle="""
    WITH kk AS (
      SELECT greatest(2, length(CAST(CAST(ceil(count(DISTINCT c_name) / 100.0)
                                          AS BIGINT) AS VARCHAR))) AS k
      FROM customer),
    c AS (SELECT c_custkey, c_name,
                 right(c_name, (SELECT k FROM kk)) AS blk FROM customer),
    s AS (SELECT s_suppkey, s_name,
                 right(s_name, (SELECT k FROM kk)) AS blk FROM supplier),
    scored AS (
      SELECT s.s_suppkey, s.s_name, c.c_name,
             levenshtein(s.s_name, c.c_name) AS dist,
             c.c_custkey
      FROM s JOIN c ON s.blk = c.blk),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY s_suppkey
                                   ORDER BY dist, c_custkey) AS rn
      FROM scored)
    SELECT s_suppkey, s_name, c_name AS matched_name, dist
    FROM best WHERE rn = 1 AND dist <= 8
    ORDER BY s_suppkey
    """,
)
def join_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join: link each supplier to its nearest
    customer NAME by Levenshtein distance — the blocked edit-distance
    join every entity-dedup / record-linkage pipeline runs (author
    dedup, org canonicalization in training-data curation).

    The scale decision is the BLOCKING key, and its ENTROPY is
    DATA-DRIVEN (VERDICT r8 #2): a fixed-length key re-arms the
    per-block n² every decade (the round-8 sf1 bench caught last-2 at
    63× on 10× data; last-3 fixed that decade but was still a
    constant).  The key length is now computed FROM the corpus inside
    the plan: k = max(2, digits(ceil(n_customers / B))) with
    B = FUZZY_BLOCK_TARGET = 100 — the last-k name characters (TPC-H
    names end in a 9-digit sequence, so last-k digits are ~uniform)
    give ≥ ceil(n/B) blocks, bounding expected customers/block by ~B
    at EVERY scale: n=1.5k→k=2, 15k→k=3, 150k→k=4, 1.5M→k=5.  Total
    candidate pairs stay ~linear in n (pairs ≈ n_s·n_c/10^k ≤ B·n_s);
    `tests/test_entropy_scaling.py` pins the decade-over-decade pair
    ratio.  The scalar k is an agg broadcast onto both sides — no
    driver collect, no extra shuffle.  Edit distance runs only inside
    blocks (JVM `levenshtein`, no UDF); same candidate-then-verify
    shape as `near_dup_pairs`, string edition."""
    c_raw = table(spark, sf_dir, "customer")
    # scalar block-key length from the DISTINCT-name count — the real
    # entropy measure (see fuzzy_block_len: row count overcounts
    # duplicate-heavy corpora, r9 second-decade catch).  Shared with
    # the DuckDB oracle: both spell digits(ceil(n_distinct/100)).
    kdf = c_raw.agg(
        F.greatest(
            F.lit(2),
            F.length(
                F.ceil(F.countDistinct("c_name") / F.lit(100.0))
                .cast("long")
                .cast("string")
            ),
        ).alias("k")
    )
    c = c_raw.crossJoin(F.broadcast(kdf)).select(
        "c_custkey", "c_name", F.expr("right(c_name, k)").alias("blk")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .crossJoin(F.broadcast(kdf))
        .select("s_suppkey", "s_name", F.expr("right(s_name, k)").alias("blk"))
    )
    scored = s.join(c, "blk").select(
        "s_suppkey",
        "s_name",
        "c_name",
        F.levenshtein("s_name", "c_name").alias("dist"),
        "c_custkey",
    )
    w = Window.partitionBy("s_suppkey").orderBy("dist", "c_custkey")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("dist") <= 8))
        .select("s_suppkey", "s_name", F.col("c_name").alias("matched_name"), "dist")
        .orderBy("s_suppkey")
    )


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN REDUCTION — the runtime row-level pruning
    technique for selective joins at 100 TB: hash the (small, filtered)
    dimension's keys into a bit-packed 2^16-bit filter (1024 longs,
    built with plain bit_or aggregation — Spark's own
    ``bloom_filter_agg`` is optimizer-internal, and building it
    explicitly shows the shape), broadcast the single array row, and
    test membership INSIDE THE FACT SCAN so non-matching rows die
    before the join exchange.  One hash function (k=1): with ~n
    selective keys the false-positive rate is ~ n/2^16 (<1% here), and
    false positives only cost a wasted probe — the final exact
    equi-join removes them, so the result EQUALS the plain join (which
    is why a plain-SQL oracle certifies it).  This is the explicit
    spelling of Spark's injected runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) and of
    ClickHouse's bloom_filter skip indexes (subsumed-index note in
    ``ddl.py``): at 1000 executors the filter ships 8 KB to every scan
    task and cuts the fact-side shuffle by the dim selectivity."""
    M_BITS = 1 << 16
    n_words = M_BITS // 64
    dim = (
        table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .select("c_custkey")
    )
    bit = F.pmod(F.xxhash64("c_custkey"), F.lit(M_BITS))
    words = (
        dim.select(bit.alias("bit"))
        .select(
            (F.col("bit") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("mask"))
    )
    # fold the sparse (word, mask) rows into ONE dense 1024-long array
    # (missing words -> 0) so the whole filter broadcasts as a single row
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("mm")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda i: F.coalesce(F.element_at(F.col("mm"), i), F.lit(0).cast("long")),
        ).alias("bf")
    )
    hit = F.expr(
        f"(element_at(bf, CAST(pmod(xxhash64(o_custkey), {M_BITS}) / 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(pmod(xxhash64(o_custkey), {M_BITS}) % 64 AS INT)))"
        " != 0L"
    )
    fact = (
        table(spark, sf_dir, "orders")
        .crossJoin(F.broadcast(bloom))
        .filter(hit)
        .drop("bf")
    )
    return (
        fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )
