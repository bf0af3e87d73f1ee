"""Graph-analytics pack (SURVEY.md §2.D extension surface).

The near-dup pair graph built by :mod:`.dedup` is a real graph the
engine already materializes; this module runs graph algorithms over it
with plain DataFrame joins — the "graph = edge table + iterated
join/aggregate" formulation that scales on Spark without any graph
library (GraphX/GraphFrames are thin sugar over exactly these plans).

NOT-IN-REFERENCE: driver-mandated extension surface; the reference has
no graphs ("no streams, graphs, time-series" — SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..hashsafe import oracle_round_quotient, round_quotient
from ..registry import register
from ..tables import table
from .dedup import _SHINGLE_SQL, JACCARD_T, near_dup_pairs

PR_ALPHA = 0.85
PR_ITERS = 5


@register(
    "graph_pagerank_dupgraph",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    edges AS (SELECT doc_a, doc_b FROM pair_jaccard WHERE jaccard >= {JACCARD_T}),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
    n AS (SELECT count(*) AS n FROM nodes),
    pr(k, node, r) AS (
      SELECT 0, node, 1.0 / n.n FROM nodes CROSS JOIN n
      UNION ALL
      SELECT pr.k + 1, s.dst,
             (1 - {PR_ALPHA}) / any_value(n.n) + {PR_ALPHA} * sum(pr.r / deg.d)
      FROM pr
      JOIN sym s ON s.src = pr.node
      JOIN deg ON deg.src = pr.node
      CROSS JOIN n
      WHERE pr.k < {PR_ITERS}
      GROUP BY pr.k + 1, s.dst)
    SELECT node, round(r, 6) AS pagerank
    FROM pr WHERE k = {PR_ITERS}
    ORDER BY pagerank DESC, node
    """,
)
def graph_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup graph ({PR_ITERS} power iterations,
    damping {PR_ALPHA}) — ranks the "hub" documents of duplicate
    clusters (useful as an alternative representative-selection
    criterion to `dedup_keep_best_quality`).  The symmetric graph has
    no dangling nodes, so the update is exactly
    r' = (1−α)/N + α·Σ_in r/d.

    Spark-first formulation: the graph is an edge DataFrame; each
    iteration is one join (ranks ⨝ edges) + one aggregate on dst —
    the same shuffle shape as the label-propagation components.  With
    a FIXED iteration count the loop stays lazy: all five updates fold
    into one job (each eager localCheckpoint was a full job barrier —
    ~0.3 s × 5 of pure scheduling at sf-scale).  An open-ended
    convergence loop (see dedup components) is where checkpoint
    truncation earns its cost.  The DuckDB oracle runs the identical
    five iterations as a recursive CTE — feasible only because
    sf-scale graphs are tiny; the Spark path is the one that scales."""
    # LSH-bounded pair substrate (provably coincides with exact pairs
    # at tau=0.8; see near_dup_pairs) -- no all-pairs stage anywhere
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()
    deg = sym.groupBy(F.col("doc_a").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    nodes = deg.select("node")
    n = nodes.count()
    if n == 0:
        # empty graph: the recursive-CTE oracle also yields 0 rows; the
        # uniform prior 1/n is undefined (round-8 edge fuzz crash)
        return spark.createDataFrame([], "node bigint, pagerank double")
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(deg, "node")
            .join(sym, F.col("node") == F.col("doc_a"))
            .groupBy(F.col("doc_b").alias("node"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("in_sum"))
        )
        ranks = contrib.select(
            "node",
            (F.lit((1 - PR_ALPHA) / n) + PR_ALPHA * F.col("in_sum")).alias("r"),
        )
    return ranks.select("node", F.round("r", 6).alias("pagerank")).orderBy(
        F.col("pagerank").desc(), "node"
    )


@register(
    "graph_triangles_clustering",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    edges AS (SELECT doc_a, doc_b FROM pair_jaccard WHERE jaccard >= {JACCARD_T}),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    ordered AS (SELECT src, dst FROM sym WHERE src < dst),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM ordered e1
      JOIN ordered e2 ON e2.src = e1.dst
      JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src),
    wedge AS (SELECT sum(d * (d - 1) / 2) AS n_wedges FROM deg)
    SELECT n_triangles, CAST(n_wedges AS BIGINT) AS n_wedges,
           {oracle_round_quotient("3 * n_triangles", "n_wedges", 6)} AS global_clustering
    FROM tri CROSS JOIN wedge
    """,
)
def graph_triangles_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the near-dup
    graph (3·triangles / wedges) — the structure diagnostic that
    separates tight duplicate CLIQUES (transitive copies, high
    clustering) from chain-like near-dup drift (low clustering), which
    changes how aggressively a cluster can be collapsed.

    The classic distributed formulation: orient each edge low→high id,
    then triangles = edges joined twice (wedge + closing edge) — two
    equi-join shuffles on node keys, no per-node neighborhood
    materialization beyond the join state.  Wedges come from the degree
    aggregate.  At 100 TB-scale graphs this is THE shape (degree-skew
    handled by AQE or high-degree-vertex splitting)."""
    # LSH-bounded pair substrate (provably coincides with exact pairs
    # at tau=0.8; see near_dup_pairs) -- no all-pairs stage anywhere
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    ordered = sym.filter(F.col("doc_a") < F.col("doc_b")).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    e1 = ordered.alias("e1")
    e2 = ordered.select(F.col("src").alias("m"), F.col("dst").alias("end")).alias("e2")
    e3 = ordered.select(F.col("src").alias("a3"), F.col("dst").alias("b3")).alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("m"))
        .join(e3, (F.col("a3") == F.col("e1.src")) & (F.col("b3") == F.col("end")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = sym.groupBy("doc_a").agg(F.count(F.lit(1)).alias("d"))
    wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges")
    )
    return tri.crossJoin(F.broadcast(wedge)).select(
        "n_triangles",
        "n_wedges",
        round_quotient(3 * F.col("n_triangles"), F.col("n_wedges"), 6).alias(
            "global_clustering"
        ),
    )


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    edges AS (SELECT doc_a, doc_b FROM pair_jaccard WHERE jaccard >= {JACCARD_T}),
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION SELECT doc_b, doc_a FROM edges),
    deg AS (SELECT src, count(*) AS d FROM sym GROUP BY src)
    SELECT d AS degree, count(*) AS n_nodes,
           round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS p
    FROM deg GROUP BY d ORDER BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph — the first question
    about any graph's shape: a heavy tail means hub documents
    (templates duplicated everywhere → salt or split them before the
    triangle/PageRank joins); a flat head means isolated pairs.
    One degree aggregate + a histogram of it; the share window runs
    over the distinct-degree rows."""
    # LSH-bounded pair substrate (provably coincides with exact pairs
    # at tau=0.8; see near_dup_pairs) -- no all-pairs stage anywhere
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    deg = sym.groupBy("doc_a").agg(F.count(F.lit(1)).alias("d"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    return (
        deg.groupBy(F.col("d").alias("degree"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(
            "degree",
            "n_nodes",
            F.round(
                F.col("n_nodes") / F.sum("n_nodes").over(w).cast("double"), 6
            ).alias("p"),
        )
        .orderBy("degree")
    )


@register(
    "graph_density_summary",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    edges AS (SELECT doc_a, doc_b FROM pair_jaccard WHERE jaccard >= {JACCARD_T}),
    nodes AS (SELECT doc_a AS n FROM edges UNION SELECT doc_b FROM edges),
    deg AS (
      SELECT n, count(*) AS d FROM (
        SELECT doc_a AS n FROM edges UNION ALL SELECT doc_b FROM edges) t
      GROUP BY n)
    SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM edges) AS n_edges,
           round(2.0 * (SELECT count(*) FROM edges)
                 / ((SELECT count(*) FROM nodes)
                    * ((SELECT count(*) FROM nodes) - 1)), 6) AS density,
           (SELECT max(d) FROM deg) AS max_degree,
           round((SELECT avg(d) FROM deg), 4) AS avg_degree
    """,
)
def graph_density_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-graph summary statistics: node/edge counts, graph density
    (2E / N(N−1)) and the degree extremes — the one-row health check
    read BEFORE running PageRank or clustering on the near-dup graph
    (density near 1 means the threshold is too loose and components
    will collapse into one blob; a high max degree flags a template
    page that will dominate every walk).

    Rides the memoized verified-pair table; everything after is
    aggregates over the (tiny relative to corpus) edge list."""
    edges = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    both = edges.select(F.col("doc_a").alias("n")).unionAll(
        edges.select(F.col("doc_b").alias("n"))
    )
    deg = both.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    nn = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("d").alias("max_degree"),
        F.round(F.avg("d"), 4).alias("avg_degree"),
    )
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nn.crossJoin(F.broadcast(ne)).select(
        "n_nodes",
        "n_edges",
        # try_divide: a 0/1-node graph has no pair denominator —
        # NULL like DuckDB's /0, not an ANSI crash (round-8 edge fuzz)
        F.round(
            F.try_divide(
                2.0 * F.col("n_edges"),
                (F.col("n_nodes") * (F.col("n_nodes") - 1)).cast("double"),
            ),
            6,
        ).alias("density"),
        "max_degree",
        "avg_degree",
    )
