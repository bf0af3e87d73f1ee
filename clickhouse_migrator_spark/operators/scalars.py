"""Scalar-function pack: string / date / math / JSON / conditional /
cast / array / null-handling (SURVEY.md §2.D).

The reference's scalar vocabulary is exactly ``now()``, ``lower()``,
``md5`` and ``tuple()`` (SURVEY.md §2.C C10); this pack provides the
full driver-mandated surface.  Everything is built-in
`pyspark.sql.functions` — JVM-side, whole-stage-codegen'd, no Python in
the hot path.

Cross-engine determinism rules (vs the DuckDB oracle):
- day-of-week: DuckDB ``dow`` is 0=Sunday, Spark ``dayofweek`` is
  1=Sunday → oracle adds 1;
- timestamp→string goes through explicit format functions
  (``date_format`` / ``strftime``), never bare casts;
- double→int conversions use explicit ``floor``/``ceil`` (bare casts
  truncate in Spark but round in DuckDB);
- transcendental results are rounded (libm vs JVM ulp differences).
"""

from __future__ import annotations

from ..hashsafe import utrim
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                          AS name_lower,
           upper(p_brand)                         AS brand_upper,
           length(p_name)                         AS name_len,
           substr(p_name, 1, 5)                   AS name_head,
           concat_ws(':', p_brand, p_type)        AS brand_type,
           replace(p_type, ' ', '_')              AS type_snake,
           trim(p_name)                           AS name_trim,
           reverse(p_brand)                       AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
           strpos(p_type, 'ED')                   AS ed_pos,
           regexp_extract(p_name, '^(\\w+)', 1)   AS first_word,
           -- DuckDB split_part(NULL)='' but Spark's is NULL-preserving
           CASE WHEN p_type IS NULL THEN NULL
                ELSE split_part(p_type, ' ', 1) END   AS type_first_token
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        utrim(F.col("p_name")).alias("name_trim"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_type", "ED").alias("ed_pos"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_token"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                          AS yr,
           month(o_orderdate)                         AS mon,
           day(o_orderdate)                           AS dom,
           quarter(o_orderdate)                       AS qtr,
           dayofweek(o_orderdate) + 1                 AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch,
           strftime(o_orderdate, '%Y-%m-%d')          AS iso_date,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias(
            "month_start"
        ),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.add_months("o_orderdate", 3).cast("timestamp_ntz").alias("plus3m"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 50000), 2)  AS abs_centered,
           CAST(ceil(l_quantity / 7) AS BIGINT)    AS qty_bucket,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_extendedprice), 4)         AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)       AS price_ln,
           round(log10(l_extendedprice + 1), 6)    AS price_log10,
           round(pow(1 + l_discount, 2), 6)        AS disc_sq,
           CAST(l_orderkey % 10 AS BIGINT)         AS key_mod,
           CAST(sign(l_extendedprice - 50000) AS BIGINT) AS centered_sign,
           round(greatest(l_discount, l_tax), 2)   AS max_rate,
           round(least(l_discount, l_tax), 2)      AS min_rate
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_centered"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 10).cast("bigint").alias("key_mod"),
        F.signum(F.col("l_extendedprice") - 50000).cast("bigint").alias("centered_sign"),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("min_rate"),
    )


@register(
    "scalar_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column — the
    "opaque typed metadata" pattern for multimodal/semi-structured
    columns.  At scale prefer `from_json` with an explicit schema once
    per pipeline over repeated `get_json_object` calls."""
    e = table(spark, sf_dir, "events")
    # one from_json parse for all paths (get_json_object would re-parse
    # the document per extraction — 2× the CPU here, worse with more keys)
    p = F.from_json("props", "k BIGINT, missing BIGINT")
    return e.select(
        "event_id",
        "event_type",
        p.getField("k").alias("k_val"),
        p.getField("missing").alias("missing_val"),
    )


@register(
    "scalar_json_schema_agg",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k
    FROM events GROUP BY event_type
    """,
)
def scalar_json_schema_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`from_json` with an explicit schema (single parse, pruned,
    vectorized) then plain aggregation — the scalable JSON pattern."""
    e = table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.round(F.avg(F.col("p.k")), 4).alias("avg_k"),
        F.max(F.col("p.k")).alias("max_k"),
    )


@register(
    "scalar_case_when_tiers",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 7500 THEN 'platinum'
                WHEN c_acctbal >= 5000 THEN 'gold'
                WHEN c_acctbal >= 2000 THEN 'silver'
                ELSE 'bronze' END AS tier,
           CASE c_mktsegment WHEN 'BUILDING' THEN 'b2b' ELSE 'b2c' END AS channel
    FROM customer
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2000, "silver")
        .otherwise("bronze")
        .alias("tier"),
        F.when(F.col("c_mktsegment") == "BUILDING", "b2b").otherwise("b2c").alias("channel"),
    )


@register(
    "scalar_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)        AS key_str,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_orderstatus = 'F' AS BOOLEAN) AS is_final,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           round(CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE), 2) AS price_roundtrip
    FROM orders
    """,
)
def scalar_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        (F.col("o_orderstatus") == "F").alias("is_final"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
        F.round(F.col("o_totalprice").cast("string").cast("double"), 2).alias(
            "price_roundtrip"
        ),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS n_dims,
           round(CAST(embedding[1] AS DOUBLE), 6)           AS first_val,
           round(list_sum(CAST(embedding[1:8] AS DOUBLE[])), 6) AS head8_sum,
           round(list_max(CAST(embedding AS DOUBLE[])), 6)  AS max_val,
           round(list_min(CAST(embedding AS DOUBLE[])), 6)  AS min_val
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array primitives over the embedding column (`F.aggregate` /
    higher-order functions — JVM-side, no UDFs)."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
        F.round(F.array_max(dbl), 6).alias("max_val"),
        F.round(F.array_min(dbl), 6).alias("min_val"),
    )


@register(
    "scalar_map_funcs",
    oracle="""
    WITH m AS (
      SELECT o_orderkey,
             map(['status', 'priority'], [o_orderstatus, o_orderpriority]) AS props
      FROM orders
    )
    SELECT o_orderkey,
           props['status'][1]                       AS status_val,
           array_to_string(map_keys(props), ',')    AS key_list,
           -- coalesce: both map values NULL renders '' like concat_ws
           coalesce(array_to_string(map_values(props), ','), '')  AS val_list,
           CAST(cardinality(props) AS INT)          AS n_entries
    FROM m
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column construction + extraction (typed key-value metadata —
    the shape `events.props`-style columns take once parsed)."""
    o = table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.concat_ws(",", F.map_keys(m)).alias("key_list"),
        F.concat_ws(",", F.map_values(m)).alias("val_list"),
        F.size(m).alias("n_entries"),
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           coalesce(nullif(l_discount, 0.0), -1.0)      AS disc_or_flag,
           (l_tax IS NULL)                              AS tax_missing,
           ifnull(nullif(l_returnflag, 'N'), 'none')    AS flag_or_none
    FROM lineitem
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_flag"
        ),
        F.isnull("l_tax").alias("tax_missing"),
        F.ifnull(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@register(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & l_linenumber                    AS b_and,
           l_orderkey | l_linenumber                    AS b_or,
           xor(l_orderkey, l_linenumber)                AS b_xor,
           l_linenumber << 3                            AS b_shl,
           l_orderkey >> 2                              AS b_shr,
           bit_count(l_orderkey)                        AS b_popcnt,
           ~l_linenumber                                AS b_not
    FROM lineitem
    """,
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse bitAnd/bitOr/bitXor/bitShiftLeft/bitShiftRight/
    bitCount/bitNot — all JVM-side integer expressions (whole-stage
    codegen; identical two's-complement semantics in the oracle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & l_linenumber").alias("b_and"),
        F.expr("l_orderkey | l_linenumber").alias("b_or"),
        F.expr("l_orderkey ^ l_linenumber").alias("b_xor"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("b_shl"),
        F.shiftright(F.col("l_orderkey"), 2).alias("b_shr"),
        F.bit_count("l_orderkey").alias("b_popcnt"),
        F.expr("~l_linenumber").alias("b_not"),
    )


@register(
    "scalar_hash_digests",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                 AS name_md5,
           sha256(c_name)              AS name_sha256,
           length(md5(c_name))         AS md5_len
    FROM customer
    """,
)
def scalar_hash_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse MD5/SHA256 hex digests (the reference's only hash use
    is md5 over migration-file bytes, `migrate.py:86`) — built-in JVM
    digest functions, lowercase hex in both engines."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
        F.length(F.md5(F.col("c_name").cast("binary"))).alias("md5_len"),
    )


@register(
    "scalar_ipv4_funcs",
    oracle="""
    SELECT c_custkey,
           concat(CAST((c_custkey >> 24) % 256 AS VARCHAR), '.',
                  CAST((c_custkey >> 16) % 256 AS VARCHAR), '.',
                  CAST((c_custkey >> 8) % 256 AS VARCHAR), '.',
                  CAST(c_custkey % 256 AS VARCHAR))        AS ip_str,
           c_custkey                                        AS ip_roundtrip
    FROM customer
    """,
)
def scalar_ipv4_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse IPv4NumToString / IPv4StringToNum over synthetic
    uint32 values (the fixtures carry no IP column); the roundtrip
    pins string→num as the exact inverse."""
    from ..functions.clickhouse import ipv4_num_to_string, ipv4_string_to_num

    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        ipv4_num_to_string("c_custkey").alias("ip_str"),
        ipv4_string_to_num(ipv4_num_to_string("c_custkey")).alias("ip_roundtrip"),
    )


@register(
    "scalar_url_funcs",
    oracle="""
    WITH u AS (
      SELECT p_partkey,
             -- || not concat(): DuckDB's concat() SKIPS nulls while
             -- Spark's propagates them; with an all-NULL p_brand the
             -- two built different urls (round-8 data-edge fuzz catch)
             -- brand sanitized to [A-Za-z0-9] on BOTH sides: arbitrary
             -- text (unicode fuzz) made an invalid URL that Spark's
             -- parse_url rejects while regexes happily chew it
             'https://shop' || CAST(p_partkey % 10 AS VARCHAR)
                || '.example.com/parts/' || CAST(p_partkey AS VARCHAR)
                || '?brand=' || regexp_replace(p_brand, '[^A-Za-z0-9]', '', 'g')
                AS url
      FROM part)
    SELECT p_partkey, url,
           regexp_extract(url, '^https?://([^/?#]+)', 1)  AS host,
           regexp_extract(url, '^https?://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)             AS query_string,
           regexp_extract(url, '[?&]brand=([^&#]*)', 1)   AS brand_param,
           regexp_extract(url, '^(https?)', 1)            AS protocol
    FROM u
    """,
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse URL vocabulary — domain() / path() / queryString() /
    extractURLParameter() / protocol() — over URLs synthesized from the
    part table (fixtures carry no URL column).  Spark's `parse_url` is
    a built-in JVM expression; the oracle mirrors with regexes."""
    p = table(spark, sf_dir, "part")
    u = p.select(
        "p_partkey",
        F.concat(
            F.lit("https://shop"),
            (F.col("p_partkey") % 10).cast("string"),
            F.lit(".example.com/parts/"),
            F.col("p_partkey").cast("string"),
            F.lit("?brand="),
            F.regexp_replace(F.col("p_brand"), "[^A-Za-z0-9]", ""),
        ).alias("url"),
    )
    return u.select(
        "p_partkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
        F.parse_url("url", F.lit("QUERY"), F.lit("brand")).alias("brand_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


EARTH_RADIUS_KM = 6371.0088


@register(
    "scalar_geo_haversine",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST((c_custkey % 180) - 90 + 0.5 AS DOUBLE)        AS lat,
             CAST(((c_custkey * 7) % 360) - 180 + 0.5 AS DOUBLE) AS lon
      FROM customer)
    SELECT c_custkey, lat, lon,
           round(2 * 6371.0088 * asin(sqrt(
             pow(sin(radians(lat) / 2), 2) +
             cos(radians(lat)) * cos(radians(0.0)) *
             pow(sin(radians(lon) / 2), 2))), 3) AS dist_origin_km
    FROM pts
    """,
)
def scalar_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``greatCircleDistance`` (haversine, km) from synthetic
    coordinates to the origin — pure trigonometry, identical formula in
    the oracle, rounded to mm-in-km precision to absorb libm-vs-JVM
    ulps.  All codegen'd JVM math, no UDF."""
    c = table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180) - 90 + 0.5).alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).alias("lon"),
    )
    half = lambda col: F.pow(F.sin(F.radians(col) / 2), 2)  # noqa: E731
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.round(
            2
            * EARTH_RADIUS_KM
            * F.asin(
                F.sqrt(
                    half(F.col("lat"))
                    + F.cos(F.radians("lat")) * F.cos(F.radians(F.lit(0.0))) * half(F.col("lon"))
                )
            ),
            3,
        ).alias("dist_origin_km"),
    )


@register(
    "scalar_array_funcs2",
    oracle="""
    WITH a AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           len(words)                                   AS n_words,
           list_contains(words, 'green')                AS has_green,
           list_position(words, 'green')                AS green_pos,
           coalesce(array_to_string(list_sort(list_distinct(words)), ','), '') AS uniq_sorted,
           coalesce(array_to_string(list_slice(words, 2, 3), ','), '')         AS mid_slice,
           array_to_string(flatten([words, ['#']]), ',')         AS with_sentinel
    FROM a
    """,
)
def scalar_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse array vocabulary round 2 — has / indexOf /
    arrayDistinct / arraySlice / arrayConcat (flatten) — all JVM
    higher-order/array builtins.  arrayDistinct order differs between
    engines, so the comparable form is sorted; indexOf is 1-based in
    both (0 = absent, matching ClickHouse)."""
    p = table(spark, sf_dir, "part")
    a = p.select("p_partkey", F.split("p_name", " ").alias("words"))
    return a.select(
        "p_partkey",
        F.size("words").alias("n_words"),
        F.array_contains("words", "green").alias("has_green"),
        F.array_position(F.col("words"), "green").alias("green_pos"),
        F.concat_ws(",", F.array_sort(F.array_distinct("words"))).alias(
            "uniq_sorted"
        ),
        F.concat_ws(",", F.slice(F.col("words"), 2, 2)).alias("mid_slice"),
        # null-safe sentinel append: DuckDB's flatten skips a NULL
        # inner list (yields ['#']) while Spark's flatten nulls out
        F.concat_ws(
            ",",
            F.flatten(
                F.array(
                    F.coalesce(
                        F.col("words"), F.array().cast("array<string>")
                    ),
                    F.array(F.lit("#")),
                )
            ),
        ).alias("with_sentinel"),
    )


@register(
    "scalar_string_predicates",
    oracle="""
    SELECT p_partkey,
           (p_name LIKE 'a%')                      AS starts_a,
           (p_type LIKE '%STEEL')                  AS ends_steel,
           (p_name LIKE '%gre%')                   AS contains_gre,
           (p_name SIMILAR TO '[a-f].*')           AS first_a_to_f,
           CASE WHEN p_name LIKE '%o%' THEN 'o' ELSE '' END AS has_o_tag
    FROM part
    """,
)
def scalar_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse startsWith / endsWith / position>0 / match — string
    predicates as codegen'd expressions (LIKE/RLIKE compile to
    specialized operators, no regex engine for the prefix/suffix
    forms)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").startswith("a").alias("starts_a"),
        F.col("p_type").endswith("STEEL").alias("ends_steel"),
        F.col("p_name").contains("gre").alias("contains_gre"),
        F.col("p_name").rlike("^[a-f]").alias("first_a_to_f"),
        F.when(F.col("p_name").contains("o"), F.lit("o"))
        .otherwise(F.lit(""))
        .alias("has_o_tag"),
    )


@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP)  AS plus_30d,
           CAST(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus_2mo,
           strftime(o_orderdate, '%Y-%m')               AS year_month,
           dayofweek(o_orderdate) + 1                   AS dow,
           CAST(last_day(o_orderdate) AS TIMESTAMP)     AS month_end,
           weekofyear(o_orderdate)                      AS iso_week,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_1995
    FROM orders
    """,
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse date-arithmetic vocabulary round 2 — ``addDays`` /
    ``addMonths`` / ``formatDateTime`` / ``toDayOfWeek`` /
    ``toLastDayOfMonth`` / ``toISOWeek`` / ``dateDiff`` — all JVM
    codegen expressions, fully pushdown/prune-friendly.  Engine deltas
    pinned by the oracle: DuckDB's dayofweek is 0-based (Sunday=0) vs
    Spark's 1-based, and both add_months implementations clamp to
    month-end identically."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add("o_orderdate", 30).cast("timestamp_ntz").alias("plus_30d"),
        F.add_months("o_orderdate", 2).cast("timestamp_ntz").alias("plus_2mo"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_1995"
        ),
    )


@register(
    "scalar_encoding_funcs",
    oracle="""
    SELECT d.doc_id,
           hex(d.source)                               AS source_hex,
           to_base64(encode(d.source))                 AS source_b64,
           decode(from_base64(to_base64(encode(d.source)))) AS roundtrip,
           hex(d.n_chars)                              AS n_chars_hex
    FROM documents d
    """,
)
def scalar_encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``hex`` / ``base64Encode`` / ``base64Decode`` /
    ``unhex`` over the documents table — pure codegen string
    transcoding (the wire-format vocabulary for opaque binary
    columns).  Spark's hex(bigint) and DuckDB's hex(int) both emit
    minimal-width uppercase hex, and base64 round-trips byte-exactly
    through unbase64 → string."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.hex("source").alias("source_hex"),
        F.base64(F.col("source").cast("binary")).alias("source_b64"),
        F.unbase64(F.base64(F.col("source").cast("binary")))
        .cast("string")
        .alias("roundtrip"),
        F.hex("n_chars").alias("n_chars_hex"),
    )


@register(
    "scalar_trig_funcs",
    oracle="""
    SELECT o_orderkey,
           round(sin(o_totalprice / 100000), 6) + 0.0 AS sin_v,
           round(cos(o_totalprice / 100000), 6) + 0.0 AS cos_v,
           round(atan2(o_totalprice, 100000.0), 6)   AS angle,
           round(degrees(atan2(o_totalprice, 100000.0)), 4) AS angle_deg,
           round(exp(-o_totalprice / 500000), 6)     AS decay,
           round(ln(o_totalprice), 6)                AS log_price,
           round(cbrt(o_totalprice), 6)              AS cbrt_price
    FROM orders
    """,
)
def scalar_trig_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse trig/exponential vocabulary — sin/cos/atan2/degrees/
    exp/ln(log)/cbrt — pure JVM codegen math over scan output (the
    feature-engineering shapes: cyclical encodings, decay weights,
    log/cube-root transforms).  IEEE-754 doubles evaluate identically
    in both engines at these magnitudes; rounding pins the repr."""
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.sin(p / 100000), 6).alias("sin_v"),
        F.round(F.cos(p / 100000), 6).alias("cos_v"),
        F.round(F.atan2(p, F.lit(100000.0)), 6).alias("angle"),
        F.round(F.degrees(F.atan2(p, F.lit(100000.0))), 4).alias("angle_deg"),
        F.round(F.exp(-p / 500000), 6).alias("decay"),
        F.round(F.log(p), 6).alias("log_price"),
        F.round(F.cbrt(p), 6).alias("cbrt_price"),
    )


@register(
    "scalar_array_cumsum_diff",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT)                    AS val_e6,
             generate_subscripts(embedding, 1)  AS pos
      FROM embeddings
    ), c AS (
      SELECT vec_id, pos,
             CAST(CAST(sum(val_e6) OVER (PARTITION BY vec_id ORDER BY pos)
                       / 1000000.0 AS DECIMAL(18,6)) AS VARCHAR) AS cs,
             CAST(CAST((val_e6 - coalesce(lag(val_e6) OVER (PARTITION BY vec_id
                                                            ORDER BY pos), val_e6))
                       / 1000000.0 AS DECIMAL(18,6)) AS VARCHAR) AS d
      FROM x
    )
    SELECT vec_id,
           array_to_string((list(cs ORDER BY pos))[1:8], ',') AS cumsum8,
           array_to_string((list(d  ORDER BY pos))[1:8], ',') AS diff8
    FROM c GROUP BY vec_id
    """,
)
def scalar_array_cumsum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayCumSum`` / ``arrayDifference`` — running sum
    and first-difference of an array, element-wise (first 8 elements
    shown).  Expressed as the distributed shape that survives 100 TB:
    ``posexplode`` → per-vector window (one shuffle on vec_id, frame
    state is a single accumulator) → ordered re-collect.  For short
    fixed-length arrays a pure ``transform``+``slice`` formulation
    avoids the explode entirely, but it is O(n²) per row; the
    explode+window form is O(n) and AQE-balanced across executors."""
    from pyspark.sql import Window

    # exact 1e-6 integer grid (same device as agg_sum_foreach): the
    # engines' windowed-sum internals agree bit-for-bit on integers,
    # and the grid also normalizes IEEE -0.0 away
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos0", "valf"))
        .withColumn(
            "val_e6",
            F.floor(F.col("valf").cast("double") * 1000000 + 0.5).cast("long"),
        )
    )
    wsum = Window.partitionBy("vec_id").orderBy("pos0")

    def _dec6(c):
        return (c / F.lit(1000000.0)).cast("decimal(18,6)").cast("string")

    c = e.select(
        "vec_id",
        "pos0",
        _dec6(F.sum("val_e6").over(wsum)).alias("cs"),
        _dec6(
            F.col("val_e6")
            - F.coalesce(F.lag("val_e6").over(wsum), F.col("val_e6"))
        ).alias("d"),
    )
    entries = F.array_sort(F.collect_list(F.struct("pos0", "cs", "d")))
    return c.groupBy("vec_id").agg(
        F.concat_ws(",", F.slice(F.transform(entries, lambda s: s.cs), 1, 8)).alias(
            "cumsum8"
        ),
        F.concat_ws(",", F.slice(F.transform(entries, lambda s: s.d), 1, 8)).alias(
            "diff8"
        ),
    )


@register(
    "scalar_array_fill_compact",
    oracle="""
    WITH base AS (
      SELECT l_orderkey AS o_orderkey, l_linenumber AS pos, l_quantity AS v,
             l_discount AS dsc,
             CASE WHEN l_discount < 0.02 THEN NULL ELSE l_quantity END AS v_n
      FROM lineitem
    ), w AS (
      SELECT o_orderkey, pos, v, dsc,
             last_value(v_n IGNORE NULLS) OVER (
               PARTITION BY o_orderkey ORDER BY pos, v, dsc
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
             lag(v) OVER (PARTITION BY o_orderkey ORDER BY pos, v, dsc) AS prev
      FROM base
    )
    SELECT o_orderkey,
           -- coalesce: DuckDB's array_to_string is NULL for an
           -- all-NULL list where Spark's concat_ws is ''
           coalesce(array_to_string(list(CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR)
                                ORDER BY pos, v, dsc), ','), '')      AS arr_raw,
           coalesce(array_to_string(list(CAST(CAST(filled AS DECIMAL(18,2)) AS VARCHAR)
                                ORDER BY pos, v, dsc), ','), '')      AS arr_filled,
           coalesce(array_to_string(list(CAST(CAST(v AS DECIMAL(18,2)) AS VARCHAR)
                                ORDER BY pos, v, dsc)
                           FILTER (prev IS NULL OR prev <> v), ','), '') AS arr_compact,
           CAST(sum(CASE WHEN prev IS NULL OR prev <> v THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM w GROUP BY o_orderkey
    """,
)
def scalar_array_fill_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayFill`` (forward-fill nulls), ``arrayCompact``
    (collapse consecutive duplicates) and ``arraySplit``-style run
    counting over each order's quantity sequence (line-number order;
    quantities at discount < 2% masked to NULL to exercise the fill).

    Spark-first shape: instead of per-array lambda recursion these are
    *row* windows (`last ignore nulls`, `lag`) computed before the
    rows are folded back into arrays — the same two-shuffle plan at
    any array width, with the window state a single value.  Nulls
    survive collection because elements ride inside structs
    (collect_list drops bare nulls, one of the engine's documented
    hazards)."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_linenumber").alias("pos"),
        F.col("l_quantity").alias("v"),
        F.col("l_discount").alias("dsc"),
        F.when(F.col("l_discount") < 0.02, F.lit(None))
        .otherwise(F.col("l_quantity"))
        .alias("v_n"),
    )
    # (pos, v, dsc) is the deterministic order: l_linenumber alone is
    # NOT unique within an order in the fixtures
    w = Window.partitionBy("o_orderkey").orderBy("pos", "v", "dsc")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    rows = base.select(
        "o_orderkey",
        "pos",
        "v",
        "dsc",
        F.last("v_n", ignorenulls=True).over(wf).alias("filled"),
        F.lag("v").over(w).alias("prev"),
    ).withColumn(
        "is_new_run", F.col("prev").isNull() | (F.col("prev") != F.col("v"))
    )
    raw_entries = F.array_sort(F.collect_list(F.struct("pos", "v", "dsc")))
    filled_entries = F.array_sort(
        F.collect_list(F.struct("pos", "v", "dsc", "filled"))
    )
    compact_entries = F.array_sort(
        F.collect_list(F.when(F.col("is_new_run"), F.struct("pos", "v", "dsc")))
    )

    def _dec2(c):
        return c.cast("decimal(18,2)").cast("string")

    return rows.groupBy("o_orderkey").agg(
        F.concat_ws(",", F.transform(raw_entries, lambda s: _dec2(s.v))).alias(
            "arr_raw"
        ),
        F.concat_ws(
            ",", F.transform(filled_entries, lambda s: _dec2(s["filled"]))
        ).alias("arr_filled"),
        F.concat_ws(
            ",", F.transform(compact_entries, lambda s: _dec2(s.v))
        ).alias("arr_compact"),
        F.sum(F.col("is_new_run").cast("long")).alias("n_runs"),
    )


@register(
    "scalar_array_set_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' ')[1:12],
                                       x -> x <> '')) AS head,
             list_distinct(list_filter(string_split(text, ' ')[13:24],
                                       x -> x <> '')) AS tail
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_intersect(head, tail)), ','),
                    '')                                                AS both_str,
           CAST(len(list_intersect(head, tail)) AS INT)                AS n_both,
           CAST(len(list_distinct(list_concat(head, tail))) AS INT)    AS n_union,
           CAST(len(list_filter(head, x -> NOT list_contains(tail, x)))
                AS INT)                                                AS n_only_head
    FROM t
    """,
)
def scalar_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayIntersect`` / union / ``arrayExcept`` over
    per-document token windows (first 12 vs next 12 words).  All four
    set operations are Spark JVM built-ins (array_intersect /
    array_union / array_except) running inside whole-stage codegen —
    narrow per-row work, no shuffle, no UDF.  Outputs are sorted
    inside each array so the result is order-stable regardless of the
    engines' internal set layouts."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    t = d.select(
        "doc_id",
        F.array_distinct(F.slice(F.split(F.col("text"), " "), 1, 12)).alias("_h"),
        F.array_distinct(F.slice(F.split(F.col("text"), " "), 13, 12)).alias("_t"),
    ).select(
        "doc_id",
        F.filter(F.col("_h"), lambda x: x != "").alias("head"),
        F.filter(F.col("_t"), lambda x: x != "").alias("tail"),
    )
    both = F.array_intersect(F.col("head"), F.col("tail"))
    return t.select(
        "doc_id",
        # concat_ws, not array_join: a NULL intersect (NULL inputs)
        # renders '' like the oracle's coalesce (round-8 edge fuzz)
        F.concat_ws(",", F.array_sort(both)).alias("both_str"),
        F.size(both).alias("n_both"),
        F.size(F.array_union(F.col("head"), F.col("tail"))).alias("n_union"),
        F.size(F.array_except(F.col("head"), F.col("tail"))).alias("n_only_head"),
    )


@register(
    "scalar_array_enumerate_uniq",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' ')[1:20],
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             list_transform(toks,
               (x, i) -> CAST(len(list_filter(toks[1:i], y -> y = x)) AS VARCHAR)),
             ',') AS occ_idx,
           CAST(len(toks) AS INT)                AS n_toks,
           CAST(len(list_distinct(toks)) AS INT) AS n_uniq
    FROM t
    """,
)
def scalar_array_enumerate_uniq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayEnumerateUniq(arr)`` — each element labeled
    with its occurrence ordinal (1 for the first time a value appears,
    2 for its second appearance, ...).  Implemented with indexed
    higher-order functions: transform((x, i) -> count of equal values
    in the prefix).  Quadratic in the ARRAY length (capped at 20
    tokens here), constant per row, embarrassingly parallel — exactly
    the shape that survives a 100 TB scan untouched."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.filter(
            F.slice(F.split(F.lower(F.col("text")), " "), 1, 20), lambda x: x != ""
        ).alias("toks"),
    )
    toks = F.col("toks")
    occ = F.transform(
        toks,
        lambda x, i: F.size(
            F.filter(F.slice(toks, 1, i + 1), lambda y: y == x)
        ).cast("string"),
    )
    return t.select(
        "doc_id",
        F.array_join(occ, ",").alias("occ_idx"),
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )


# a fixed convex test polygon (pentagon) over the synthetic coordinate
# space used by scalar_geo_haversine — literal on both engines
_POLY = [(0.0, 0.0), (40.0, 5.0), (50.0, 40.0), (20.0, 55.0), (-10.0, 30.0)]


@register(
    "scalar_point_in_polygon",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             (CAST(event_id % 120 AS DOUBLE) - 30) AS px,
             (CAST((event_id * 7) % 90 AS DOUBLE) - 20) AS py
      FROM events),
    edges(x1, y1, x2, y2) AS (VALUES (0.0, 0.0, 40.0, 5.0), (40.0, 5.0, 50.0, 40.0), (50.0, 40.0, 20.0, 55.0), (20.0, 55.0, -10.0, 30.0), (-10.0, 30.0, 0.0, 0.0)),
    crossings AS (
      SELECT p.event_id,
             count(*) FILTER (
               WHERE ((e.y1 > py) != (e.y2 > py))
                 AND px < (e.x2 - e.x1) * (py - e.y1) / (e.y2 - e.y1) + e.x1
             ) AS n_cross
      FROM pts p CROSS JOIN edges e
      GROUP BY p.event_id)
    SELECT count(*) FILTER (WHERE n_cross % 2 = 1) AS n_inside,
           count(*) FILTER (WHERE n_cross % 2 = 0) AS n_outside
    FROM crossings
    """,
)
def scalar_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``pointInPolygon((x, y), [(x1, y1), …])`` — ray-casting
    point-in-polygon, computed entirely as array expressions: the
    polygon is a broadcast literal array of edges; each point counts
    edges its rightward ray crosses (odd → inside).  No UDF, no join —
    per-row O(#edges) arithmetic inside codegen, the shape that holds
    at any scale.  Points are synthesized from event_id (the fixtures
    carry no coordinates), aggregated to inside/outside totals."""
    ev = table(spark, sf_dir, "events")
    px = (F.col("event_id") % 120).cast("double") - 30
    py = ((F.col("event_id") * 7) % 90).cast("double") - 20
    edges = F.array(
        *[
            F.struct(
                F.lit(float(x1)).alias("x1"),
                F.lit(float(y1)).alias("y1"),
                F.lit(float(x2)).alias("x2"),
                F.lit(float(y2)).alias("y2"),
            )
            for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1])
        ]
    )
    pts = ev.select(px.alias("px"), py.alias("py"), edges.alias("edges"))
    n_cross = F.size(
        F.filter(
            F.col("edges"),
            lambda e: ((e.y1 > F.col("py")) != (e.y2 > F.col("py")))
            & (
                F.col("px")
                < (e.x2 - e.x1) * (F.col("py") - e.y1) / (e.y2 - e.y1) + e.x1
            ),
        )
    )
    flagged = pts.select((n_cross % 2 == 1).alias("inside"))
    return flagged.agg(
        F.count(F.when(F.col("inside"), 1)).alias("n_inside"),
        F.count(F.when(~F.col("inside"), 1)).alias("n_outside"),
    )
