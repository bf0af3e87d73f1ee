"""Window-function operator pack (SURVEY.md §2.D).

Not present anywhere in the reference (its exhaustiveness statement,
SURVEY.md §2 — "no window functions"); driver-mandated surface.

Scale notes: every window here partitions by a key (custkey/status) so
the sort is per-partition after one shuffle — never a global
single-partition window (the classic scale killer: `Window.orderBy`
with no partitionBy).  The one global top-k uses orderBy().limit()
instead, which Spark plans as TakeOrderedAndProject (per-partition
heaps + driver merge, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..hashsafe import oracle_round_quotient, round_quotient
from ..registry import register
from ..tables import table


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense_by_date",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           rank()       OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS rk,
           dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS drk
    FROM orders
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with genuine ties (orderdate has day granularity)
    — tie groups share ranks, so the output is deterministic."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate")
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@register(
    "window_lag_lead_order_values",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 2) + 0.0 AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = table(spark, sf_dir, "orders")
    lag = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(lag, 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.col("o_totalprice") - F.coalesce(lag, F.col("o_totalprice")), 2).alias(
            "delta"
        ),
    )


@register(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"), 2).alias("running_spend"),
    )


@register(
    "window_moving_avg_3",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / 100.0
                 / count(*) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg
    FROM orders
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        # cents grid: the 3-row frame bounds the bigint sum, so the fast
        # integer path is overflow-safe here (unlike unbounded sums)
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .over(w)
            .cast("double")
            / 100.0
            / F.count(F.lit(1)).over(w),
            4,
        ).alias("moving_avg"),
    )


@register(
    "window_range_30d_order_density",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_day
                          RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING) AS n_orders_60d
    FROM (SELECT o_custkey, o_orderkey,
                 datediff('day', DATE '1995-01-01', o_orderdate) AS epoch_day
          FROM orders) t
    """,
)
def window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over an integer day offset (Spark range frames need a
    numeric order column; the explicit epoch-day integer keeps both
    engines on identical frame semantics)."""
    o = table(spark, sf_dir, "orders").withColumn(
        "epoch_day", F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    )
    w = Window.partitionBy("o_custkey").orderBy("epoch_day").rangeBetween(-30, 30)
    return o.select(
        "o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_orders_60d")
    )


@register(
    "window_ntile_percentiles",
    oracle=f"""
    WITH r AS (
      SELECT c_custkey,
             ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
             row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn,
             count(*) OVER () AS n
      FROM customer WHERE c_acctbal IS NOT NULL)
    SELECT c_custkey, quartile,
           {oracle_round_quotient("rn - 1", "n - 1", 6)} AS pct_rank,
           {oracle_round_quotient("rn", "n", 6)} AS cume
    FROM r
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile/percent_rank/cume_dist WITHOUT the single-partition
    sort: the distributed row-number substrate
    (:func:`..stats.with_global_row_number` — quantile-bucketed
    parallel windows + a 64-row offset pass) gives each customer its
    exact global rank; since the (c_acctbal, c_custkey) order is
    tie-free, ntile/percent_rank/cume_dist are row-local arithmetic on
    (rn, n) — bit-identical to the window functions, but the serial
    work is 64 rows at any table size."""
    from .stats import exact_ntile, with_global_row_number

    # rank contract: only non-null balances rank (both sides)
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .select("c_custkey", "c_acctbal")
    )
    # the divisor comes from the substrate's own 64-row bucket frame
    # (with_totals): no separate customer-scan count, no cross join
    ranked = with_global_row_number(
        c, ["c_acctbal", "c_custkey"], rn_col="rn", with_totals=True
    )
    rn = F.col("rn")
    n = F.col("n_total")
    return ranked.select(
        "c_custkey",
        exact_ntile(rn, n, 4).alias("quartile"),
        round_quotient(rn - 1, n - 1, 6).alias("pct_rank"),
        round_quotient(rn, n, 6).alias("cume"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value — note last_value needs the full-partition
    frame (the default frame stops at CURRENT ROW in both engines)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@register(
    "topk_global_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY round(l_extendedprice, 2) DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy().limit(k) → TakeOrderedAndProject
    (distributed heaps, no global sort) — THE top-k pattern at scale."""
    li = table(spark, sf_dir, "lineitem").withColumn(
        "price", F.round("l_extendedprice", 2)
    )
    return (
        li.orderBy(F.desc("price"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "price")
        .limit(15)
    )


@register(
    "window_running_difference",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta,
           lead(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)     AS next_type
    FROM events
    """,
)
def window_running_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``runningDifference(value)`` / ``neighbor(col, ±1)``
    done right: those functions compute within a *block* (explicitly
    order-dependent and deprecated for exactly that reason); the
    well-defined equivalent is lag/lead over an explicit
    (ts, event_id)-ordered window per user.  One shuffle on user_id,
    sort within partitions — block-local semantics at any partition
    count, which the ClickHouse originals cannot guarantee."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_cume_dist_prices",
    oracle="""
    SELECT o_orderkey,
           round(cume_dist() OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice), 6)
             AS price_cume,
           round(percent_rank() OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice), 6)
             AS price_pct_rank
    FROM orders
    """,
)
def window_cume_dist_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist / percent_rank per status partition — both are
    rank-derived (no frame scan), identical definitions in Spark and
    DuckDB, and deterministic under ties because tied prices share the
    same cumulative value.  Partitioned by status, so no
    single-partition window at any scale."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.cume_dist().over(w), 6).alias("price_cume"),
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
    )


@register(
    "window_exp_decayed_avg",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id,
           round(sum(b.value * exp(-(a.s - b.s) / 3600000000.0))
                 / sum(exp(-(a.s - b.s) / 3600000000.0)), 4) AS ema
    FROM r a JOIN r b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 4 AND a.rn
    GROUP BY a.user_id, a.event_id
    """,
)
def window_exp_decayed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedAvg(3600)(value, ts)`` over a
    trailing 5-event frame: each event's smoothed value is the
    exp(-age/1h)-weighted mean of its user's last 5 readings — the
    standard irregular-time-series smoother for metric streams.

    The decay math runs on exact integer microseconds (``unix_micros``
    here, ``epoch_us`` in the oracle) so both engines feed identical
    doubles to ``exp``.  Plan shape: one user_id shuffle; the frame is
    collected per row (5 structs) and folded with a higher-order
    ``aggregate`` — all codegen'd, no Python.  At 100 TB the frame
    bound keeps window state constant; contrast with the oracle's
    self-join formulation, which fans out 5× before re-aggregating."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    framed = e.select(
        "user_id",
        "event_id",
        "s",
        F.collect_list(F.struct("s", "value")).over(w).alias("frame"),
    )
    cur = F.col("s")
    num = F.aggregate(
        F.col("frame"),
        F.lit(0.0),
        lambda a, it: a + it.value * F.exp(-(cur - it.s) / 3.6e9),
    )
    den = F.aggregate(
        F.col("frame"),
        F.lit(0.0),
        lambda a, it: a + F.exp(-(cur - it.s) / 3.6e9),
    )
    return framed.select(
        # round-ok: EMA weights are exp() — float-stat provenance
        "user_id", "event_id", F.round(num / den, 4).alias("ema")
    )


@register(
    "window_ntile_per_priority",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def window_ntile_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned ntile — the scale-correct sibling of the global
    ``window_ntile_percentiles``: quartiles computed WITHIN each
    priority class, so the sort is per-partition after one shuffle and
    no single-partition exchange exists.  This is the shape to reach
    for first at 100 TB; the global variant stays for semantic parity
    and documents its approximate replacement."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_percent_of_parent",
    oracle=f"""
    WITH nat AS (
      SELECT r_name, n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT r_name, n_name, round(CAST(rev AS DOUBLE), 2) AS revenue,
           {oracle_round_quotient("rev * 100",
               "sum(rev) OVER (PARTITION BY r_name)", 4, den_scale=2)}
             AS pct_of_region,
           {oracle_round_quotient("rev * 100", "sum(rev) OVER ()", 4, den_scale=2)}
             AS pct_of_total
    FROM nat ORDER BY r_name, n_name
    """,
)
def window_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels (nation within region,
    region within world) — the BI drill-down staple.  Both ratio
    windows run over the AGGREGATED (region, nation) frame (25 rows),
    so the unpartitioned total window is constant-size; the fact table
    pays exactly one aggregation after broadcast dim joins."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return nat.select(
        "r_name",
        "n_name",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        round_quotient(
            F.col("rev") * 100, F.sum("rev").over(w_region), 4, den_scale=2
        ).alias("pct_of_region"),
        round_quotient(
            F.col("rev") * 100, F.sum("rev").over(w_all), 4, den_scale=2
        ).alias("pct_of_total"),
    ).orderBy("r_name", "n_name")


@register(
    "window_rolling_correlation",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS buy_v,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
      FROM events GROUP BY 1)
    SELECT day, round(buy_v, 2) AS buy_v, clicks,
           round(corr(buy_v, clicks) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS corr_7d
    FROM daily ORDER BY day
    """,
)
def window_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day correlation between two daily series (purchase
    value vs click volume) — the co-movement monitor behind "did the
    metric coupling break this week".  corr() runs as a WINDOW
    aggregate over the daily frame (tens of rows after the one real
    aggregation), so the trailing frame is a constant-size state
    machine, never a re-scan of events."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("buy_v"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    # Pearson from windowed moments with try_divide, NOT F.corr: under
    # ANSI, corr() THROWS on a zero-variance frame (constant series)
    # while DuckDB's corr yields NULL (round-8 edge fuzz catch).  Same
    # accumulators (Welford covar/stddev), same value, crash-free.
    rolling_r = F.try_divide(
        F.covar_samp("buy_v", "clicks").over(w),
        F.stddev_samp("buy_v").over(w) * F.stddev_samp("clicks").over(w),
    )
    return daily.select(
        "day",
        F.round("buy_v", 2).alias("buy_v"),
        "clicks",
        F.round(rolling_r, 6).alias("corr_7d"),
    ).orderBy("day")


@register(
    "window_moving_median",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT day, rev,
           round(quantile_cont(rev, 0.5) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med_7d
    FROM daily ORDER BY day
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 7-day MEDIAN of daily revenue — the robust trend line
    (a moving average follows one spiky day; the median doesn't).
    percentile() runs as a window aggregate over the daily frame, so
    the trailing frame holds ≤7 values; at raw-stream scale an exact
    windowed median would need an order-statistics tree, which is why
    the aggregate-then-window layering matters."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "rev",
        F.round(F.percentile("rev", 0.5).over(w), 4).alias("med_7d"),
    ).orderBy("day")


@register(
    "window_order_backlog",
    oracle="""
    WITH opened AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
             count(*) AS delta
      FROM orders GROUP BY 1),
    closed AS (
      SELECT CAST(date_trunc('month', mx) AS TIMESTAMP) AS m, -count(*) AS delta
      FROM (SELECT l_orderkey, max(l_shipdate) AS mx
            FROM lineitem GROUP BY l_orderkey)
      GROUP BY 1),
    deltas AS (
      SELECT m, sum(delta) AS d
      FROM (SELECT * FROM opened UNION ALL SELECT * FROM closed)
      GROUP BY m)
    SELECT m AS month, CAST(d AS BIGINT) AS net_change,
           CAST(sum(d) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_backlog
    FROM deltas ORDER BY month
    """,
)
def window_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: +1 when an order is placed, −1
    when its last line ships, cumulated monthly — the WIP/inventory
    curve, and the event-delta formulation that makes interval
    COUNTING linear (the same trick as `events_max_intersections`,
    here as a time series instead of a peak).

    Shape: per-order close date is one orderkey aggregate; open/close
    deltas union into a month-keyed frame; the running sum is a window
    over months (tiny).  No interval join anywhere."""
    opened = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("m"))
        .agg(F.count(F.lit(1)).alias("delta"))
    )
    closed = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("mx"))
        .groupBy(F.date_trunc("month", "mx").cast("timestamp_ntz").alias("m"))
        .agg((-F.count(F.lit(1))).alias("delta"))
    )
    deltas = (
        opened.unionByName(closed)
        .groupBy("m")
        .agg(F.sum("delta").alias("d"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.select(
        F.col("m").alias("month"),
        F.col("d").cast("bigint").alias("net_change"),
        F.sum("d").over(w).cast("bigint").alias("open_backlog"),
    ).orderBy("month")


@register(
    "window_cumulative_vwap",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
             sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS pv,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS v
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1995-02-01 00:00:00'
      GROUP BY 1)
    SELECT day,
           {oracle_round_quotient("pv", "v", 4, den_scale=2)} AS day_vwap,
           {oracle_round_quotient("sum(pv) OVER w", "sum(v) OVER w", 4, den_scale=2)}
             AS cum_vwap
    FROM daily
    WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ORDER BY day
    """,
)
def window_cumulative_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price, daily and cumulative (the
    financial VWAP shape applied to shipments): ratio of RUNNING SUMS,
    never an average of daily ratios — low-volume days must not steer
    the cumulative line.  One month's scan aggregates to a daily frame;
    both windows run over those ~31 rows."""
    daily = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-02-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.date_trunc("day", "l_shipdate").cast("timestamp_ntz").alias("day"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)")
            ).alias("pv"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("v"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        round_quotient(F.col("pv"), F.col("v"), 4, den_scale=2).alias("day_vwap"),
        round_quotient(
            F.sum("pv").over(w), F.sum("v").over(w), 4, den_scale=2
        ).alias("cum_vwap"),
    ).orderBy("day")


@register(
    "window_max_drawdown",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    series AS (
      SELECT day, sum(rev_c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum
      FROM daily),
    dd AS (
      SELECT cum,
             max(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS peak
      FROM series)
    SELECT CAST(max(peak - cum) AS DOUBLE) / 100.0 AS max_drawdown,
           max({oracle_round_quotient("(peak - cum) * 100", "peak", 6)})
             AS max_drawdown_pct
    FROM dd
    """,
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of cumulative daily revenue (the finance
    risk classic applied to a business series — here the cumulative
    line only rises, so drawdown measures the LONGEST FLAT STRETCH
    cost; on net-value series it measures real peak-to-trough loss).
    Two stacked running windows — cumulative sum, then running max of
    it — over the daily frame; a 1-row reduce finishes."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        # exact cents grid: the cumulative/peak arithmetic below stays
        # integer-exact, so neither engine version nor partial-agg
        # order can move the rounded outputs
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_c"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    series = daily.select("day", F.sum("rev_c").over(w).alias("cum"))
    series = series.select("cum", F.max("cum").over(w).alias("peak"))
    # rounding is monotone in the rational value, so max(round(r)) ==
    # round(max(r)) — each row is rounded exactly, then reduced
    return series.agg(
        (F.max(F.col("peak") - F.col("cum")) / F.lit(100.0)).alias("max_drawdown"),
        F.max(
            round_quotient((F.col("peak") - F.col("cum")) * 100, F.col("peak"), 6)
        ).alias("max_drawdown_pct"),
    )


@register(
    "window_bollinger_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT day,
           round(rev_c / 100.0, 2) AS revenue,
           round(CAST(avg(rev_c) OVER w AS DOUBLE) / 100.0, 4)    AS ma7,
           round(stddev_samp(rev_c / 100.0) OVER w, 4)            AS sd7,
           round(CAST(avg(rev_c) OVER w AS DOUBLE) / 100.0
                 + 2 * stddev_samp(rev_c / 100.0) OVER w, 4)      AS upper_band,
           round(CAST(avg(rev_c) OVER w AS DOUBLE) / 100.0
                 - 2 * stddev_samp(rev_c / 100.0) OVER w, 4)      AS lower_band,
           CASE WHEN rev_c / 100.0 > CAST(avg(rev_c) OVER w AS DOUBLE) / 100.0
                       + 2 * stddev_samp(rev_c / 100.0) OVER w THEN 1 ELSE 0 END
             AS above_upper
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
)
def window_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily purchase revenue: 7-day moving average
    ± 2σ with breakout flags — the mean-reversion / volatility envelope
    (revenue spikes breaking the upper band are launch days or
    incidents, not noise).  The stream reduces to a DAILY grid first
    (bounded by the calendar), so the global window is small by
    construction; revenue rides the exact cents grid and the 7-row
    frame keeps every sum overflow-safe and engine-identical."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_c"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    rev = F.col("rev_c") / 100.0
    ma = F.avg("rev_c").over(w).cast("double") / 100.0
    sd = F.stddev_samp(rev).over(w)
    return daily.select(
        "day",
        F.round(rev, 2).alias("revenue"),
        F.round(ma, 4).alias("ma7"),
        F.round(sd, 4).alias("sd7"),
        F.round(ma + 2 * sd, 4).alias("upper_band"),
        F.round(ma - 2 * sd, 4).alias("lower_band"),
        F.when(rev > ma + 2 * sd, 1).otherwise(0).alias("above_upper"),
    ).orderBy("day")


@register(
    "window_rsi_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    d AS (
      SELECT day, rev_c,
             rev_c - lag(rev_c) OVER (ORDER BY day) AS delta
      FROM daily),
    g AS (
      SELECT day,
             sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
               OVER w AS gain_c,
             sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
               OVER w AS loss_c,
             count(delta) OVER w AS n_deltas
      FROM d
      WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT day,
           {oracle_round_quotient("gain_c", "1400", 4)} AS avg_gain,
           {oracle_round_quotient("loss_c", "1400", 4)} AS avg_loss,
           CASE WHEN loss_c = 0 THEN 100.0
                ELSE {oracle_round_quotient("gain_c * 100", "gain_c + loss_c", 4)} END
             AS rsi14
    FROM g WHERE n_deltas >= 14 ORDER BY day
    """,
)
def window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI-14 (relative strength index) on daily purchase revenue:
    average gain vs average loss over a trailing 14-change window,
    folded into the 0–100 oscillator — the momentum gauge that flags
    overheated (>70) or washed-out (<30) revenue runs (simple-average
    variant; Wilder's smoothing is an EWMA refinement of the same
    state).  Same bounded daily-grid posture as the Bollinger query:
    the stream reduces to #days rows before any window; deltas ride
    the exact cents grid so every average is a ratio of exact
    integers; warm-up rows (<14 observed changes) are suppressed."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_c"))
    )
    wl = Window.orderBy("day")
    w = wl.rowsBetween(-13, 0)
    d = daily.select(
        "day", (F.col("rev_c") - F.lag("rev_c").over(wl)).alias("delta")
    )
    gain = F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0)).over(w)
    loss = F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0)).over(w)
    g = d.select(
        "day",
        gain.alias("gain_c"),
        loss.alias("loss_c"),
        F.count("delta").over(w).alias("n_deltas"),
    ).filter(F.col("n_deltas") >= 14)
    return g.select(
        "day",
        round_quotient(F.col("gain_c"), F.lit(1400), 4).alias("avg_gain"),
        round_quotient(F.col("loss_c"), F.lit(1400), 4).alias("avg_loss"),
        F.round(
            F.when(F.col("loss_c") == 0, 100.0).otherwise(
                round_quotient(
                    F.col("gain_c") * 100, F.col("gain_c") + F.col("loss_c"), 4
                )
            ),
            4,
        ).alias("rsi14"),
    ).orderBy("day")


@register(
    "window_obv_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev_c,
             count(*) AS vol
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    sgn AS (
      SELECT day, rev_c, vol,
             CASE WHEN lag(rev_c) OVER (ORDER BY day) IS NULL THEN 0
                  WHEN rev_c > lag(rev_c) OVER (ORDER BY day) THEN vol
                  WHEN rev_c < lag(rev_c) OVER (ORDER BY day) THEN -vol
                  ELSE 0 END AS signed_vol
      FROM daily)
    SELECT day,
           round(rev_c / 100.0, 2) AS revenue,
           vol AS n_purchases,
           CAST(sum(signed_vol) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
    FROM sgn ORDER BY day
    """,
)
def window_obv_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume on the daily purchase series: volume (purchase
    count) added on up-days, subtracted on down-days, cumulated — the
    classic volume-confirms-price divergence indicator, completing the
    finance set next to Bollinger, RSI-14, VWAP and max-drawdown.

    Same scale shape as its siblings: the stream reduces to the
    calendar-bounded daily grid first (exact cents for the up/down
    comparison — no float ties), so both global windows run over grid
    rows only; the signed volume is integer arithmetic end to end."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_c"),
            F.count(F.lit(1)).alias("vol"),
        )
    )
    w = Window.orderBy("day")
    prev = F.lag("rev_c").over(w)
    signed = (
        F.when(prev.isNull(), 0)
        .when(F.col("rev_c") > prev, F.col("vol"))
        .when(F.col("rev_c") < prev, -F.col("vol"))
        .otherwise(0)
    )
    sgn = daily.select("day", "rev_c", "vol", signed.alias("signed_vol"))
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return sgn.select(
        "day",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.col("vol").alias("n_purchases"),
        F.sum("signed_vol").over(wrun).alias("obv"),
    ).orderBy("day")


@register(
    "window_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    f AS (
      SELECT day, rev_c,
             lag(rev_c, 7) OVER (ORDER BY day) AS forecast_c
      FROM daily)
    SELECT count(*) AS n_days_scored,
           {oracle_round_quotient("sum(abs(rev_c - forecast_c))", "count(*) * 100", 2)} AS mae,
           round(avg(abs(rev_c - forecast_c) / CAST(rev_c AS DOUBLE)), 6) AS mape,
           round(CAST(max(abs(rev_c - forecast_c)) AS DOUBLE) / 100.0, 2) AS worst_abs_error
    FROM f WHERE forecast_c IS NOT NULL AND rev_c > 0
    """,
)
def window_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's purchase
    revenue with the value from 7 days earlier and score MAE / MAPE —
    THE baseline every real forecasting model must beat (if your model
    loses to lag-7, ship lag-7).  Pairs with `ts_decompose_additive`
    and `agg_seasonal_index` as the forecasting-evaluation leg.

    Integer-cents day grid (exact, calendar-bounded), one lag window
    over grid rows, one reduce — forecast evaluation at any corpus
    scale costs one aggregate pass."""
    daily = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_c"))
    )
    w = Window.orderBy("day")
    f = daily.select(
        "rev_c", F.lag("rev_c", 7).over(w).alias("forecast_c")
    ).filter(F.col("forecast_c").isNotNull() & (F.col("rev_c") > 0))
    err = F.abs(F.col("rev_c") - F.col("forecast_c"))
    return f.agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        round_quotient(F.sum(err), F.count(F.lit(1)) * 100, 2).alias("mae"),
        F.round(F.avg(err / F.col("rev_c").cast("double")), 6).alias("mape"),
        F.round(F.max(err).cast("double") / 100.0, 2).alias("worst_abs_error"),
    )
