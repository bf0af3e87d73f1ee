"""Text-analysis pack over the documents table (SURVEY.md §2.D M4;
driver north star: language-ID, quality scoring, token counting,
fingerprinting for LLM-training-data pipelines).

Everything is built-in string/array/higher-order functions — JVM-side,
no Python UDFs, so the ops vectorize and scale linearly with a single
scan of the corpus.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type-hint resolution (rolling hash)
from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..hashsafe import oracle_round_quotient, round_quotient, utrim
from ..registry import register
from ..tables import table
from .dedup import kgrams

# deliberately tiny stopword sets — enough for a deterministic n-gram/
# stopword language heuristic on the synthetic corpus
STOP_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
STOP_ES = ("el", "la", "de", "y", "en", "es", "un", "una")
STOP_DE = ("der", "die", "das", "und", "zu", "ist", "ein", "eine")


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(utrim(F.col(col))), r"\s+")


def _stop_hits(tokens: Column, stops: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _sql_stop_hits(stops: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{s}'" for s in stops) + "]"
    return f"len(list_filter(toks, t -> list_contains({lst}, t)))"


def _docs_cpu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan widened to executor parallelism for CPU-heavy
    row-local stages: one small parquet file arrives as a single split
    (near-serial map work), while at production scale many files /
    row-groups give the same width for free — the repartition restores
    the scale-representative shape (SCALE.md lesson)."""
    return table(spark, sf_dir, "documents").repartition(
        int(spark.sparkContext.defaultParallelism)
    )



_N_TOK_SQL = r"len(string_split_regex(lower(trim(text)), '\s+'))"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split_regex(lower(trim(text)), '\\s+'))  AS n_tokens,
           len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))     AS n_bpe_pieces,
           length(text)                                        AS n_chars_computed,
           {oracle_round_quotient("length(text)", _N_TOK_SQL, 4)}
               AS chars_per_token
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex piece count
    (word-or-punctuation chunks — the standard pre-tokenizer shape)."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias(
            "n_bpe_pieces"
        ),
        F.length("text").alias("n_chars_computed"),
        round_quotient(F.length("text"), n_tok, 4).alias("chars_per_token"),
    )


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           {oracle_round_quotient(_sql_stop_hits(STOP_EN), "len(toks)", 6)} AS stopword_ratio,
           {oracle_round_quotient("len(regexp_extract_all(text, '[[:punct:]]'))",
               "length(text)", 6)}
               AS punct_ratio,
           {oracle_round_quotient("length(text)", "len(toks)", 4)} AS avg_token_len,
           (len(toks) >= 20 AND length(text) / CAST(len(toks) AS DOUBLE) BETWEEN 3 AND 12)
               AS passes_quality
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, stopword ratio, punctuation
    density, average token length + a pass/fail gate — the standard
    cheap pre-filter before expensive dedup/model scoring."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    avg_len = F.length("text") / n_tok.cast("double")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        round_quotient(_stop_hits(toks, STOP_EN), n_tok, 6).alias(
            "stopword_ratio"
        ),
        round_quotient(
            # explicit group 0: the default idx=1 errors at the FIRST
            # match because the pattern has no capture group — latent
            # until a text actually contained punctuation (round-8
            # edge fuzz, unicode variant)
            F.size(F.regexp_extract_all("text", F.lit(r"[\p{Punct}]"), 0)),
            F.length("text"),
            6,
        ).alias("punct_ratio"),
        round_quotient(F.length("text"), n_tok, 4).alias("avg_token_len"),
        ((n_tok >= 20) & avg_len.between(3, 12)).alias("passes_quality"),
    )


@register(
    "text_langid_heuristic",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             {_sql_stop_hits(STOP_EN)} AS s_en,
             {_sql_stop_hits(STOP_ES)} AS s_es,
             {_sql_stop_hits(STOP_DE)} AS s_de
      FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
                WHEN s_es >= s_de AND s_es > 0 THEN 'es'
                WHEN s_de > 0 THEN 'de'
                ELSE 'unknown' END AS predicted_lang
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (deterministic n-gram-style
    heuristic; argmax with a fixed precedence order en > es > de)."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    s_en, s_es, s_de = (
        _stop_hits(toks, STOP_EN),
        _stop_hits(toks, STOP_ES),
        _stop_hits(toks, STOP_DE),
    )
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_de) & (s_en > 0), "en")
        .when((s_es >= s_de) & (s_es > 0), "es")
        .when(s_de > 0, "de")
        .otherwise("unknown")
    )
    return d.select("doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang"))


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           -- coalesce: NULL text fingerprints as md5('') like the
           -- Spark side's concat_ws-of-NULL rendering
           md5(coalesce(array_to_string(list_sort(list_distinct(
               string_split_regex(lower(trim(text)), '\\s+'))), ' '), ''))
             AS fingerprint,
           md5(lower(trim(text))) AS exact_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive bag-of-words hash
    (sorted distinct tokens → md5) + an exact normalized hash — the
    keys exact/near dedup pipelines cluster on."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))).alias("fingerprint"),
        F.md5(F.lower(utrim(F.col("text")))).alias("exact_hash"),
    )


@register(
    "text_tfidf_top20",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    ORDER BY tfidf DESC, doc_id, term
    LIMIT 20
    """,
)
def text_tfidf_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring (tokenize → term frequencies → document
    frequencies → join).  Scale: tf and df are two aggregations over
    one exploded scan; df is tiny (vocabulary-sized) → broadcast back;
    ln-idf computed JVM-side."""
    # tf and df consumed separate copies of the scan+tokenize subtree
    # (2 regex tokenize passes per query); tokenization is expression-
    # identical to the shared token substrate, so both aggregations now
    # explode the one session-cached (doc_id, toks) frame (r13, same
    # rewire as text_keywords_per_doc).  The count stays on the raw
    # table — parquet count(*) is metadata-fast.
    from .dedup import token_arrays

    n_docs = table(spark, sf_dir, "documents").count()
    toks = token_arrays(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("doc_id"), F.asc("term"))
        .limit(20)
    )


@register(
    "text_ngram_top20",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w), 1)),
                                   i -> array_to_string(w[i:i+1], ' '))) AS gram
      FROM toks WHERE len(w) >= 2
    )
    SELECT gram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
    FROM grams
    GROUP BY gram
    ORDER BY n_occurrences DESC, gram
    LIMIT 20
    """,
)
def text_ngram_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level word-bigram frequencies (explode → count → top-k).
    Scale: partial aggregation absorbs the explode fan-out before the
    shuffle; top-k via TakeOrderedAndProject."""
    d = _docs_cpu(spark, sf_dir)
    toks = _tokens()
    grams = kgrams(toks, 2)  # shifted-slice zip build, see dedup.kgrams
    # two-level aggregation: per-(doc,gram) counts first, then per-gram
    # sum + count — replaces COUNT(DISTINCT doc_id)'s expand with two
    # cheap hash aggregates (the distinct-agg rewrite that matters when
    # the exploded gram stream is billions of rows)
    return (
        d.where(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("gram")
        .agg(
            F.sum("cnt").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(20)
    )


def jvm_rolling_hash(col) -> Column:
    """The rolling hash as a pure-JVM fold — the SPEC implementation
    (split to a per-char array, aggregate Horner).  O(len) but
    constant-factor heavy: every character becomes a 1-char UTF8String
    object, and the fold is an interpreted HOF — the r9 sf10 probe
    measured it 1.65× above byte-linear (GC pressure) at 500k docs.
    Kept for the equivalence test; the registered query uses the
    Arrow-vectorized twin below."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(7).cast("bigint"),
        lambda acc, c: (acc * 131 + F.ascii(c).cast("bigint")) % 1_000_000_007,
    )


#: grow-on-demand table of 131^j mod p, shared across batches
_ROLL_PW: "np.ndarray | None" = None


def _roll_powers(n: int):
    import numpy as np

    global _ROLL_PW
    if _ROLL_PW is None or len(_ROLL_PW) <= n:
        size = max(n + 1, 4096)
        pw = np.empty(size, dtype=np.int64)
        pw[0] = 1
        for j in range(1, size):
            pw[j] = (pw[j - 1] * 131) % 1_000_000_007
        _ROLL_PW = pw
    return _ROLL_PW


def rolling_hash_batch(texts) -> "pd.Series":
    """Vectorized twin of :func:`jvm_rolling_hash` over one Arrow batch
    (character-for-character equal, pinned by
    tests/test_rolling_hash_parity.py):

    hash(s) = (7·131^n + Σ cp_i·131^(n-1-i)) mod p over the UNICODE
    CODE POINTS of s (numpy view of the UTF-32 encoding — Java's
    empty-regex split is code-point aware, so the models agree on
    astral chars), with the JVM's empty-string artifact mirrored
    (split("","") yields [""], ascii("") = 0 → one zero term).
    Products cp·131^k mod p stay < 2^51 and the elementwise-mod terms
    < 2^30, so a single int64 reduceat per doc is exact for any
    realistic length (< 2^33 chars)."""
    import numpy as np
    import pandas as pd

    P = 1_000_000_007
    empty_code = np.zeros(1, dtype=np.uint32)
    codes: list = []
    lens = np.empty(len(texts), dtype=np.int64)
    null = np.zeros(len(texts), dtype=bool)
    for i, v in enumerate(texts):
        if v is None:
            null[i] = True
            lens[i] = 0
        elif len(v) == 0:
            codes.append(empty_code)
            lens[i] = 1
        else:
            codes.append(np.frombuffer(v.encode("utf-32-le"), dtype=np.uint32))
            lens[i] = len(codes[-1])
    if codes:
        nz = lens[~null]
        allc = np.concatenate(codes).astype(np.int64)
        pw = _roll_powers(int(nz.max()))
        mult = np.concatenate([pw[n - 1 :: -1] for n in nz])
        terms = (allc * mult) % P
        offsets = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(nz[:-1], out=offsets[1:])
        sums = np.add.reduceat(terms, offsets)
        hashes = (7 * pw[nz] % P + sums) % P
    else:
        hashes = np.array([], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    out[~null] = hashes
    return pd.Series(out).mask(null, None).astype("Int64")



@register(
    "text_rolling_hash",
    oracle="""
    SELECT doc_id,
           -- NULL text hashes to NULL (Spark's fold of a NULL array),
           -- not the bare seed 7 DuckDB's NULL-skipping prepend yields
           CASE WHEN text IS NULL THEN NULL
                ELSE list_reduce(list_prepend(CAST(7 AS BIGINT),
                    list_transform(string_split(lower(trim(text)), ''),
                                   c -> CAST(ord(c) AS BIGINT))),
                    (acc, code) -> (acc * 131 + code) % 1000000007)
           END AS roll_hash,
           length(text) AS n_chars_hashed
    FROM documents
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial (Rabin-Karp) rolling hash over the normalized char
    stream — the incremental-fingerprint primitive behind shingle
    hashing and content-defined chunking.  Base 131 mod 1e9+7 keeps
    every intermediate < 2^57, exact in int64 in both engines.

    Computed by an ARROW-VECTORIZED pandas UDF (`rolling_hash_batch`):
    the pure-JVM fold (`jvm_rolling_hash`, kept as the spec) allocates
    a 1-char UTF8String per character and runs an interpreted HOF —
    the r9 sf10 probe measured it 1.65× above byte-linear from GC
    pressure alone.  The numpy twin views each string's UTF-32
    encoding (C-speed code-point extraction), multiplies against a
    shared power table and reduces per-doc in one `np.add.reduceat` —
    this is exactly the "Arrow-batched Pandas UDF when the JVM
    expression can't be made cheap" posture, and the equivalence is
    pinned character-for-character in tests/test_rolling_hash_parity.py
    (incl. astral, empty, NULL)."""

    @F.pandas_udf("bigint")
    def roll_udf(s: pd.Series) -> pd.Series:
        return rolling_hash_batch(s)

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        roll_udf(F.lower(utrim(F.col("text")))).alias("roll_hash"),
        F.length("text").alias("n_chars_hashed"),
    )


@register(
    "text_edit_distance_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
)
def text_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: near-identical name pairs by
    Levenshtein distance — the string-similarity primitive behind
    catalog/entity dedup.

    Scale: all-pairs edit distance is quadratic, so the correct shape
    is DISTINCT first (64 names here, versus 2000 part rows), then a
    broadcast self-join of the *reduced* set; at real scale the
    reduction step is the same and the pair space is cut further by
    blocking (length/prefix buckets) before the quadratic join."""
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.p_name") < F.col("b.p_name"))
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 3)
        .orderBy("name_a", "name_b")
    )


@register(
    "text_hashing_trick_features",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(w) AS token FROM toks
    ), b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 15))::UBIGINT % 64 AS BIGINT)
               AS bucket
      FROM tok
    ), per AS (
      SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           array_to_string(list(bucket ORDER BY bucket), ',') AS feat_idx,
           array_to_string(list(n      ORDER BY bucket), ',') AS feat_cnt
    FROM per GROUP BY doc_id
    """,
)
def text_hashing_trick_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the "hashing trick"): bag-of-words folded into
    a fixed 64-dim sparse count vector per document via an
    engine-portable token hash (md5-derived, so the oracle buckets
    identically) — the classic no-vocabulary featurizer for training
    pipelines (no global dictionary build, no OOV, fixed width).

    Plan: explode → two-level aggregate ((doc, bucket) counts, then
    per-doc sparse assembly) — both partial-agg'd on the same doc_id
    key; no vocabulary broadcast, no driver state, dimensionality
    fixed regardless of corpus size."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    bucket = (
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
        .cast("bigint") % 64
    )
    per = (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    entries = F.array_sort(F.collect_list(F.struct("bucket", "n")))
    return per.groupBy("doc_id").agg(
        F.concat_ws(
            ",", F.transform(entries, lambda s: s.bucket.cast("string"))
        ).alias("feat_idx"),
        F.concat_ws(",", F.transform(entries, lambda s: s.n.cast("string"))).alias(
            "feat_cnt"
        ),
    )


@register(
    "text_pii_redaction",
    oracle="""
    WITH synth AS (
      SELECT doc_id,
             'reach user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' re: '
               || substr(text, 1, 40) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[a-z0-9._]+@[a-z0-9]+\\.[a-z]+', '<EMAIL>', 'g'),
             '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')            AS redacted,
           CAST(len(regexp_extract_all(raw,
                '[a-z0-9._]+@[a-z0-9]+\\.[a-z]+')) AS INT)        AS n_emails,
           CAST(len(regexp_extract_all(raw,
                '\\+1-[0-9]{3}-[0-9]{4}')) AS INT)                AS n_phones
    FROM synth
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training-data curation: e-mail and phone
    patterns replaced with typed placeholder tokens, plus per-document
    match counts for audit.  (The synthetic corpus carries no real
    PII, so the query plants deterministic addresses derived from
    doc_id into each document before scrubbing — the regex path under
    test is the real one.)

    Scale shape: pure per-row regexp_replace / regexp_count inside
    whole-stage codegen — narrow, no shuffle, no UDF; the same two
    passes a 100 TB curation sweep would run.  Patterns stay in the
    RE2-compatible subset so Spark (Java regex) and the oracle (RE2)
    agree byte-for-byte."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.substring("text", 1, 40),
    )
    email = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]+"
    phone = r"\+1-[0-9]{3}-[0-9]{4}"
    s = d.select("doc_id", raw.alias("raw"))
    return s.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
        F.regexp_count(F.col("raw"), F.lit(email)).alias("n_emails"),
        F.regexp_count(F.col("raw"), F.lit(phone)).alias("n_phones"),
    )


@register(
    "ml_naive_bayes_langid",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    cls AS (SELECT lang AS c, count(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT count(*) AS n FROM documents),
    ctok AS (SELECT lang AS c, count(*) AS n_tok FROM tok GROUP BY lang),
    voc AS (SELECT count(DISTINCT token) AS v FROM tok),
    tc AS (SELECT lang AS c, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
    scored AS (
      SELECT t.doc_id, t.lang AS actual, cls.c,
             ln(cls.n_docs) - ln(tot.n)
               - count(*) * ln(ctok.n_tok + voc.v)
               + sum(ln(coalesce(tc.cnt, 0) + 1)) AS score
      FROM tok t
      CROSS JOIN tot CROSS JOIN voc CROSS JOIN cls
      JOIN ctok ON ctok.c = cls.c
      LEFT JOIN tc ON tc.c = cls.c AND tc.token = t.token
      GROUP BY t.doc_id, t.lang, cls.c, cls.n_docs, ctok.n_tok, tot.n, voc.v),
    pred AS (
      SELECT doc_id, actual, c AS predicted,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, c) AS rk
      FROM scored)
    SELECT actual, predicted, count(*) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY actual, predicted
    ORDER BY actual, predicted
    """,
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID, trained AND scored
    in-engine (the classic distributed text classifier — training is
    pure counting, so it is one aggregation pass, not an iterative
    solver).  Laplace-smoothed token likelihoods per class, log-score
    every document against every class, argmax, and emit the confusion
    matrix against the labeled ``lang`` column.

    Scale shape: the model (class priors + per-class token counts) is
    a dimension table — broadcast into the scoring join; the corpus
    side is scanned once, exploded, and aggregated per (doc, class).
    With C classes the fan-out is C× the token stream, all map-side;
    the only wide exchanges are keyed on token / (doc, class).  At
    100 TB the model tables stay MBs and the plan is unchanged."""
    d = _docs_cpu(spark, sf_dir)
    # four consumers (ctok, voc, tc, scoring) read the token stream —
    # cache it so the regex tokenization pass runs once, not four times.
    # r12 (guide §1/§2.4): .cache() alone did NOT deliver that — all
    # four subtrees ran concurrently inside one job and raced the cache
    # fill, so the tokenize+explode stage executed 4× side by side
    # (4 × ~1.5 s × 32-task stages in the event log).  The count() pins
    # the fill into its own job first; the scoring job then reads the
    # populated cache (stage-profile: 4 duplicate stages → 1).
    tok = d.select(
        "doc_id", F.col("lang").alias("actual"), F.explode(_tokens()).alias("token")
    ).cache()
    tok.count()
    cls = d.groupBy(F.col("lang").alias("c")).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    ctok = tok.groupBy(F.col("actual").alias("c")).agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    voc = tok.agg(F.countDistinct("token").alias("v"))
    tc = tok.groupBy(F.col("actual").alias("c"), "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    model = (
        cls.join(ctok, "c")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(voc))
    )
    scored = (
        tok.crossJoin(F.broadcast(model))
        .join(F.broadcast(tc), ["c", "token"], "left")
        .groupBy("doc_id", "actual", "c", "n_docs", "n_tok", "n", "v")
        .agg(
            F.count(F.lit(1)).alias("len_doc"),
            F.sum(F.log(F.coalesce(F.col("cnt"), F.lit(0)) + 1)).alias("sum_ln"),
        )
        .select(
            "doc_id",
            "actual",
            "c",
            (
                F.log("n_docs")
                - F.log("n")
                - F.col("len_doc") * F.log(F.col("n_tok") + F.col("v"))
                + F.col("sum_ln")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("c"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("actual", F.col("c").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@register(
    "text_keywords_per_doc",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * ln(n.n_docs / CAST(df.df AS DOUBLE))
                                         DESC, tf.term) AS rk
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, rk AS keyword_rank, term, tfidf
    FROM scored WHERE rk <= 3 AND tfidf > 0
    ORDER BY doc_id, keyword_rank
    """,
)
def text_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms PER DOCUMENT (the
    per-item sibling of the corpus-level `text_tfidf_top20`) — the
    tagging/indexing primitive of a curation pipeline.

    Scale: same two aggregations as tfidf (tf keyed on (doc, term),
    vocabulary-sized df broadcast back); the per-doc top-3 is a window
    over the doc_id key — millions of small partitions, no global
    sort.  Zero-idf terms (present in every doc) are excluded so the
    keywords are discriminative."""
    # the only document column this query needs beyond the count is the
    # token stream, and its tokenization is expression-identical to the
    # shared token substrate — ride it (r13): tf and df consumed
    # separate copies of the scan+tokenize subtree, so the regex
    # tokenize pass ran TWICE per query; both now explode the one
    # session-cached (doc_id, toks) frame (at 100 TB: two corpus
    # scan+tokenize passes → zero beyond the session's single fill).
    from .dedup import token_arrays

    d = _docs_cpu(spark, sf_dir)
    n_docs = d.count()
    toks = token_arrays(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("raw"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("raw").desc(), "term")
    return (
        scored.select(
            "doc_id",
            F.row_number().over(w).alias("keyword_rank"),
            "term",
            F.round("raw", 6).alias("tfidf"),
        )
        .filter((F.col("keyword_rank") <= 3) & (F.col("tfidf") > 0))
        .orderBy("doc_id", "keyword_rank")
    )


@register(
    "text_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    firsts AS (
      SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY token),
    mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
    entering AS (
      SELECT least(10, 1 + CAST(floor(first_doc * 10.0 / n) AS BIGINT)) AS decile,
             count(*) AS new_tokens
      FROM firsts CROSS JOIN mx GROUP BY 1)
    SELECT decile, new_tokens,
           CAST(sum(new_tokens) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
    FROM entering ORDER BY decile
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law, the companion diagnostic to
    `text_zipf_slope`): distinct-token count after each decile of the
    corpus.  Computed WITHOUT ten passes: each token reduces to its
    FIRST document (one aggregate), tokens bucket by the decile that
    first doc falls in, and the curve is a cumulative sum over ten
    rows.  Sublinear growth is healthy natural text; near-linear means
    unbounded junk vocabulary (serial numbers, hashes) — a curation
    red flag."""
    # NOT rewired onto the shared token substrate: this query makes
    # only ONE tokenize pass, and cache-decoding full array<string>
    # rows measured consistently slower than the codegen'd
    # scan+regex-split (paired minima 0.47 s own-tokenize vs 0.62 s
    # substrate, r13).
    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    firsts = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    mx = table(spark, sf_dir, "documents").agg(
        (F.max("doc_id") + 1).alias("n")
    )
    entering = (
        firsts.crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.lit(10),
                1 + F.floor(F.col("first_doc") * 10.0 / F.col("n")),
            )
            .cast("bigint")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return entering.select(
        "decile",
        "new_tokens",
        F.sum("new_tokens").over(w).alias("vocab_size"),
    ).orderBy("decile")


@register(
    "text_redundancy_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    b AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             CASE WHEN toks IS NULL THEN NULL
                  ELSE len(list_distinct(list_transform(
                      range(1, greatest(len(toks), 2)),
                      i -> toks[i] || ' ' || toks[i + 1]))) END
               AS n_distinct_bigrams
      FROM t)
    SELECT doc_id, n_tokens,
           round(n_distinct / CAST(n_tokens AS DOUBLE), 6) AS ttr,
           round(1 - n_distinct_bigrams
                     / CAST(greatest(n_tokens - 1, 1) AS DOUBLE), 6)
             AS bigram_redundancy
    FROM b
    """,
)
def text_redundancy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redundancy scoring — the cheap SQL proxy for compressibility
    (the gzip-ratio quality filter of training pipelines, without a
    UDF): type-token ratio (distinct/total tokens) and repeated-bigram
    rate (1 − distinct bigrams / bigrams).  Highly repetitive documents
    (boilerplate, keyword stuffing, generated spam) score low TTR and
    high bigram redundancy.  Pure row-local array expressions — one
    scan, no shuffle, no Python."""
    toks = _tokens()
    # one-token documents have NO bigrams: kgrams' clamped window count
    # yields [] for them, matching the oracle's `||`-of-NULL that
    # list_distinct drops (bigram_redundancy stays 0, not 1)
    bigrams = kgrams(toks, 2)
    return _docs_cpu(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks).cast("double"), 6
        ).alias("ttr"),
        F.round(
            1
            - F.size(F.array_distinct(bigrams))
            / F.greatest(F.size(toks) - 1, F.lit(1)).cast("double"),
            6,
        ).alias("bigram_redundancy"),
    )


@register(
    "text_js_divergence_sources",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE source IN ('src0', 'src1')),
    counts AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY source, token),
    tots AS (
      SELECT source, sum(c) AS t FROM counts GROUP BY source),
    p AS (
      SELECT c.token,
             max(CASE WHEN c.source = 'src0' THEN c.c / CAST(t.t AS DOUBLE) END) AS p0,
             max(CASE WHEN c.source = 'src1' THEN c.c / CAST(t.t AS DOUBLE) END) AS p1
      FROM counts c JOIN tots t ON c.source = t.source
      GROUP BY c.token),
    filled AS (
      SELECT coalesce(p0, 0) AS p0, coalesce(p1, 0) AS p1,
             (coalesce(p0, 0) + coalesce(p1, 0)) / 2 AS m
      FROM p)
    SELECT round(0.5 * sum(CASE WHEN p0 > 0 THEN p0 * ln(p0 / m) ELSE 0 END)
                 + 0.5 * sum(CASE WHEN p1 > 0 THEN p1 * ln(p1 / m) ELSE 0 END), 6)
             AS js_divergence_nats,
           count(*) AS vocab_union
    FROM filled
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' token
    distributions — the corpus-drift detector (is src1 the same KIND of
    text as src0? did this week's crawl shift?).  Symmetric, bounded by
    ln 2, and defined even where supports differ — exactly why it beats
    raw KL for drift monitoring.

    Per-source distributions are one token aggregate each; the
    divergence is a vocabulary-keyed full merge (pivoted here) plus a
    1-row reduce.  At 100 TB the state is vocabulary-sized, not
    corpus-sized (Heaps' law — see `text_vocab_growth`)."""
    tok = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", F.explode(_tokens()).alias("token"))
    )
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    tots = counts.groupBy("source").agg(F.sum("c").alias("t"))
    p = (
        counts.join(tots, "source")
        .groupBy("token")
        .agg(
            F.max(
                F.when(F.col("source") == "src0", F.col("c") / F.col("t").cast("double"))
            ).alias("p0"),
            F.max(
                F.when(F.col("source") == "src1", F.col("c") / F.col("t").cast("double"))
            ).alias("p1"),
        )
    )
    filled = p.select(
        F.coalesce("p0", F.lit(0.0)).alias("p0"),
        F.coalesce("p1", F.lit(0.0)).alias("p1"),
        ((F.coalesce("p0", F.lit(0.0)) + F.coalesce("p1", F.lit(0.0))) / 2).alias("m"),
    )
    kl = lambda x: F.when(F.col(x) > 0, F.col(x) * F.log(F.col(x) / F.col("m"))).otherwise(0.0)  # noqa: E731
    return filled.agg(
        F.round(0.5 * F.sum(kl("p0")) + 0.5 * F.sum(kl("p1")), 6).alias(
            "js_divergence_nats"
        ),
        F.count(F.lit(1)).alias("vocab_union"),
    )


@register(
    "text_length_profile_by_source",
    oracle="""
    WITH t AS (
      SELECT source,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents)
    SELECT source, count(*) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           round(quantile_cont(n_tokens, 0.25), 2) AS p25,
           round(quantile_cont(n_tokens, 0.50), 2) AS p50,
           round(quantile_cont(n_tokens, 0.75), 2) AS p75,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM t GROUP BY source ORDER BY source
    """,
)
def text_length_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length profile (min/quartiles/max) — the shape
    diagnostic behind chunking and packing decisions: a source whose
    p75 fits one context window packs differently from one that
    doesn't.  One scan, one per-source aggregate; quartile state is the
    per-group value buffer (swap to approx_percentile at extreme group
    sizes — same columns)."""
    t = table(spark, sf_dir, "documents").select(
        "source", F.size(_tokens()).alias("n_tokens")
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.round(F.percentile("n_tokens", 0.25), 2).alias("p25"),
            F.round(F.percentile("n_tokens", 0.50), 2).alias("p50"),
            F.round(F.percentile("n_tokens", 0.75), 2).alias("p75"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .orderBy("source")
    )


@register(
    "text_lexical_diversity_by_source",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    counts AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY source, token),
    tots AS (SELECT source, sum(c) AS n, count(*) AS v FROM counts GROUP BY source)
    SELECT t.source,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(t.v AS BIGINT) AS vocab,
           round(sum(c.c * (c.c - 1))
                 / CAST(t.n * (t.n - 1) AS DOUBLE), 6)           AS simpson_index,
           round((-sum((c.c / CAST(t.n AS DOUBLE))
                       * ln(c.c / CAST(t.n AS DOUBLE)))) / ln(t.v), 6)
             AS shannon_evenness
    FROM counts c JOIN tots t USING (source)
    GROUP BY t.source, t.n, t.v ORDER BY t.source
    """,
)
def text_lexical_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: Simpson's index (probability two
    random tokens coincide — high = repetitive vocabulary) and Shannon
    evenness (entropy / ln V ∈ [0,1] — low = a few tokens dominate).
    The corpus-mix diagnostic that separates boilerplate-heavy sources
    from natural text before they enter a training blend (complements
    `text_zipf_slope`'s single global exponent with per-source scores).

    One explode → (source, token) count (partial-agg'd, the only
    full-data shuffle) → per-source totals joined back on the source
    key → a per-source reduce.  Integer numerators (Σc·(c−1)) keep
    Simpson exact; only the final divisions are float."""
    tok = table(spark, sf_dir, "documents").select(
        "source", F.explode(_tokens()).alias("token")
    )
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    tots = counts.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    p = F.col("c") / F.col("n").cast("double")
    return (
        counts.join(tots, "source")
        .groupBy("source", "n", "v")
        .agg(
            F.round(
                F.sum(F.col("c") * (F.col("c") - 1))
                / (F.col("n") * (F.col("n") - 1)).cast("double"),
                6,
            ).alias("simpson_index"),
            # try_divide: a 1-type vocabulary zeroes log(v)
            F.round(
                F.try_divide(
                    -F.sum(p * F.log(p)), F.log(F.col("v").cast("double"))
                ),
                6,
            ).alias("shannon_evenness"),
        )
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.col("v").cast("bigint").alias("vocab"),
            "simpson_index",
            "shannon_evenness",
        )
        .orderBy("source")
    )


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1) — the
# canonical cheap pre-filter battery for web-scale training corpora.
STOP_GOPHER = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "text_gopher_quality_flags",
    oracle=f"""
    WITH t AS (
      SELECT source, text,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    d AS (
      SELECT source,
             len(toks) AS n_words,
             list_sum(list_transform(toks, t -> length(t)))
                 / CAST(len(toks) AS DOUBLE) AS mean_word_len,
             len(regexp_extract_all(text, '#|\\.\\.\\.'))
                 / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
             len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                 / CAST(len(toks) AS DOUBLE) AS alpha_frac,
             {_sql_stop_hits(STOP_GOPHER)} AS stop_hits
      FROM t),
    f AS (
      SELECT source,
             (n_words < 50 OR n_words > 100000)            AS fail_word_count,
             (mean_word_len < 3 OR mean_word_len > 10)     AS fail_mean_word_len,
             (symbol_ratio > 0.1)                          AS fail_symbol_ratio,
             (alpha_frac < 0.8)                            AS fail_alpha_words,
             (stop_hits < 2)                               AS fail_stopwords
      FROM d)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN fail_word_count THEN 1 ELSE 0 END) AS BIGINT)    AS n_fail_word_count,
           CAST(sum(CASE WHEN fail_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_mean_word_len,
           CAST(sum(CASE WHEN fail_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT)  AS n_fail_symbol_ratio,
           CAST(sum(CASE WHEN fail_alpha_words THEN 1 ELSE 0 END) AS BIGINT)   AS n_fail_alpha_words,
           CAST(sum(CASE WHEN fail_stopwords THEN 1 ELSE 0 END) AS BIGINT)     AS n_fail_stopwords,
           round(sum(CASE WHEN NOT (fail_word_count OR fail_mean_word_len
                                    OR fail_symbol_ratio OR fail_alpha_words
                                    OR fail_stopwords) THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS pass_rate
    FROM f
    GROUP BY source
    ORDER BY source
    """,
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality battery (Rae et al. 2021 §A1.1) rolled up per
    source: word-count bounds [50, 100k], mean word length in [3, 10],
    symbol-to-word ratio ('#'/'...') <= 0.1, >= 80% of words containing
    an alphabetic character, and >= 2 canonical English stopwords.

    Every rule is a row-local string/array expression — one corpus scan,
    a single hash aggregate on `source`; no Python, no extra shuffle, so
    it runs at parquet-scan speed at 100 TB.  The per-source fail counts
    are the drill-down a curation pipeline needs before deciding which
    crawl snapshot to drop."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_words = F.size(toks)
    mean_word_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
    ) / n_words.cast("double")
    symbol_ratio = F.size(
        F.regexp_extract_all("text", F.lit(r"#|\.\.\."), 0)
    ) / n_words.cast("double")
    alpha_frac = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ) / n_words.cast("double")
    stop_hits = _stop_hits(toks, STOP_GOPHER)
    flags = d.select(
        "source",
        ((n_words < 50) | (n_words > 100000)).alias("fail_word_count"),
        ((mean_word_len < 3) | (mean_word_len > 10)).alias("fail_mean_word_len"),
        (symbol_ratio > 0.1).alias("fail_symbol_ratio"),
        (alpha_frac < 0.8).alias("fail_alpha_words"),
        (stop_hits < 2).alias("fail_stopwords"),
    )
    fail_any = (
        F.col("fail_word_count")
        | F.col("fail_mean_word_len")
        | F.col("fail_symbol_ratio")
        | F.col("fail_alpha_words")
        | F.col("fail_stopwords")
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).alias("n_" + c)  # noqa: E731
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("fail_word_count"),
            cnt("fail_mean_word_len"),
            cnt("fail_symbol_ratio"),
            cnt("fail_alpha_words"),
            cnt("fail_stopwords"),
            F.round(
                F.sum(F.when(~fail_any, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("pass_rate"),
        )
        .orderBy("source")
    )


@register(
    "text_flesch_reading_ease",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    d AS (
      SELECT doc_id,
             len(toks) AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
             CAST(list_sum(list_transform(toks,
                 w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+')))))
               AS BIGINT) AS n_syllables
      FROM t)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                        - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 4)
             AS flesch_score,
           CASE
             WHEN 206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                          - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)) >= 90
               THEN 'very_easy'
             WHEN 206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                          - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)) >= 60
               THEN 'plain'
             WHEN 206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                          - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)) >= 30
               THEN 'difficult'
             ELSE 'very_confusing'
           END AS band
    FROM d
    """,
)
def text_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability score
    (206.835 − 1.015·words/sentences − 84.6·syllables/word) with the
    standard vowel-group syllable approximation (>= 1 per word).

    Readability is a stock quality signal in training-data curation
    (filtering OCR noise and keyword spam, steering educational-value
    mixes).  Row-local: sentence splitting, the per-word syllable fold
    and the score are all array expressions inside one projection — the
    plan is a bare scan + project, nothing to shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    n_words = F.size(toks)
    n_sentences = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0))
    )
    n_syllables = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))
            ),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    score = (
        F.lit(206.835)
        - 1.015 * (n_words / n_sentences.cast("double"))
        - 84.6 * (n_syllables / n_words.cast("double"))
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.cast("bigint").alias("n_syllables"),
        F.round(score, 4).alias("flesch_score"),
        F.when(score >= 90, "very_easy")
        .when(score >= 60, "plain")
        .when(score >= 30, "difficult")
        .otherwise("very_confusing")
        .alias("band"),
    )


@register(
    "text_char_trigram_entropy",
    oracle="""
    WITH t AS (
      SELECT doc_id, lower(trim(text)) AS s FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN length(s) >= 3
                  THEN list_transform(range(1, length(s) - 1),
                                      i -> substr(s, i, 3))
                  ELSE [] END AS grams
      FROM t),
    s AS (
      SELECT doc_id, len(grams) AS n, list_sort(grams) AS sg FROM g),
    r AS (
      SELECT doc_id, n,
             list_filter(range(1, n + 1),
                 i -> i = 1 OR sg[i] != sg[i - 1]) AS starts
      FROM s),
    l AS (
      SELECT doc_id, n, len(starts) AS n_distinct,
             list_transform(range(1, len(starts) + 1),
                 j -> coalesce(starts[j + 1], n + 1) - starts[j]) AS runs
      FROM r),
    c AS (
      SELECT doc_id, n, n_distinct,
             coalesce(list_sum(list_transform(runs,
                 c -> c * log2(CAST(c AS DOUBLE)))), 0.0) AS sum_clogc
      FROM l)
    SELECT doc_id,
           n AS n_trigrams,
           n_distinct,
           round(CASE WHEN n > 0
                      THEN log2(n) - sum_clogc / n
                      ELSE 0 END, 4) AS entropy_bits,
           round(CASE WHEN n_distinct > 1
                      THEN (log2(n) - sum_clogc / n)
                           / log2(CAST(n_distinct AS DOUBLE))
                      ELSE 0 END, 4) AS norm_entropy
    FROM c
    """,
)
def text_char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Shannon entropy per document — the
    perplexity-proxy quality signal (low entropy = repetitive/generated
    boilerplate, high = diverse natural text), used alongside TTR and
    bigram redundancy in curation gates.

    H = log2(n) − (1/n)·Σ_g c_g·log2(c_g), computed from RUN LENGTHS of
    the per-document SORTED gram array: sort once (O(n log n) row-local),
    run starts = positions where the gram changes, run lengths =
    consecutive-start differences.  The sorted order is identical in
    Spark and DuckDB (binary string compare), so the float fold order —
    and hence the rounded hash — matches across engines; and unlike a
    per-position count scan (O(n²) — measured 80 s at sf0.1) or an
    explode+groupBy (a corpus-sized shuffle), this stays one scan, zero
    shuffles, linearithmic per row — trivially data-parallel at 100 TB."""
    d = _docs_cpu(spark, sf_dir)
    s = F.lower(utrim(F.col("text")))
    # trigrams from a one-time char split + the shifted-slice zip build
    # (see dedup.kgrams): the previous per-position s.substr inside the
    # HOF lambda allocated one interpreted substring PER WINDOW —
    # measured 3.2 s cold / 0.6 s warm vs 1.0 / 0.4 s for this shape at
    # sf0.1, outputs verified identical.  split('') on '' yields ['']
    # (size 1 → 0 windows), so short docs get [] like before.
    chars = F.split(s, "")
    nw = F.greatest(F.size(chars) - F.lit(2), F.lit(0))
    z = F.arrays_zip(
        F.slice(chars, 1, nw), F.slice(chars, 2, nw), F.slice(chars, 3, nw)
    )
    grams = F.transform(z, lambda t: F.concat(t["0"], t["1"], t["2"]))
    g = d.select("doc_id", grams.alias("grams"))
    # size(NULL grams) is NULL; a NULL text has 0 trigrams like the
    # oracle's CASE ... ELSE [] (round-8 edge fuzz)
    n = F.coalesce(F.size("grams"), F.lit(0))
    sg = F.array_sort("grams")
    gcol = g.select("doc_id", n.alias("n"), sg.alias("sg"))
    nn = F.col("n")
    # 1-based positions where a new run (distinct gram) begins.
    # (Spark's sequence(1, 0) counts DOWN — guard the empty case.)
    starts = F.when(
        nn >= 1,
        F.filter(
            F.sequence(F.lit(1), nn),
            lambda i: (i == 1)
            | (F.get(F.col("sg"), i - 1) != F.get(F.col("sg"), i - 2)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    r = gcol.select("doc_id", "n", starts.alias("starts"))
    runs = F.when(
        F.size("starts") >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size("starts")),
            lambda j: F.coalesce(F.get(F.col("starts"), j), nn + 1)
            - F.get(F.col("starts"), j - 1),
        ),
    ).otherwise(F.array().cast("array<int>"))
    l = r.select(
        "doc_id",
        "n",
        F.size("starts").alias("n_distinct"),
        F.coalesce(
            F.aggregate(
                runs,
                F.lit(0.0),
                lambda a, c: a + c.cast("double") * F.log2(c.cast("double")),
            ),
            F.lit(0.0),
        ).alias("sum_clogc"),
    )
    n = F.col("n")
    entropy = F.log2(n.cast("double")) - F.col("sum_clogc") / n.cast("double")
    n_distinct = F.col("n_distinct")
    return l.select(
        "doc_id",
        n.alias("n_trigrams"),
        n_distinct.alias("n_distinct"),
        F.round(F.when(n > 0, entropy).otherwise(0.0), 4).alias("entropy_bits"),
        F.round(
            F.when(n_distinct > 1, entropy / F.log2(n_distinct.cast("double"))).otherwise(
                0.0
            ),
            4,
        ).alias("norm_entropy"),
    )


@register(
    "text_stopword_discovery",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    n AS (SELECT count(*) AS n_docs FROM documents),
    df AS (
      SELECT token, count(*) AS doc_freq FROM tok GROUP BY token)
    SELECT token, doc_freq,
           {oracle_round_quotient("doc_freq", "n_docs", 6)} AS df_ratio
    FROM df CROSS JOIN n
    WHERE doc_freq >= 0.6 * n_docs
    ORDER BY doc_freq DESC, token
    """,
)
def text_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic stopword discovery: tokens whose DOCUMENT frequency
    exceeds 60% of the corpus — the corpus-driven complement to a fixed
    stopword list (and the same df-threshold idea the dedup pack uses
    for stop-SHINGLES).  TF-IDF weighting handles such terms softly;
    an explicit list is what tokenizer training, index pruning and the
    langid heuristics consume.

    One distinct-(doc, token) aggregate — vocabulary-sized state
    (Heaps-bounded), partial-agg'd before the shuffle; the threshold
    filter runs on the aggregated frame."""
    # NOT rewired onto the shared token substrate: this query makes
    # only ONE tokenize pass, and cache-decoding full array<string>
    # rows measured slower than the codegen'd scan+regex-split (paired
    # minima 0.69 s own-tokenize vs 0.77 s substrate, r13).
    d = _docs_cpu(spark, sf_dir)
    tok = d.select("doc_id", F.explode(F.array_distinct(_tokens())).alias("token"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    df = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        df.crossJoin(F.broadcast(n))
        .filter(F.col("doc_freq") >= 0.6 * F.col("n_docs"))
        .select(
            "token",
            "doc_freq",
            round_quotient(F.col("doc_freq"), F.col("n_docs"), 6).alias(
                "df_ratio"
            ),
        )
        .orderBy(F.desc("doc_freq"), "token")
    )


@register(
    "text_word_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    per_doc AS (
      SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY token, doc_id),
    stats AS (
      SELECT token,
             count(*) AS df,
             sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS df2,
             sum(tf) AS cf
      FROM per_doc GROUP BY token)
    SELECT token, df, CAST(cf AS BIGINT) AS cf,
           {oracle_round_quotient("df2", "df", 6)} AS burstiness,
           {oracle_round_quotient("cf", "df", 6)} AS mean_tf
    FROM stats
    ORDER BY df DESC, token
    LIMIT 20
    """,
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church & Gale): for the top-20 terms by
    document frequency, P(term occurs AGAIN | it occurred once) and the
    mean within-document term frequency.  Function words repeat at
    chance; content words are BURSTY (one mention begets more) — the
    collection statistic behind DFR/Poisson-mixture term weighting and
    a cheap topicality signal for keyword extraction
    (`text_keywords_per_doc`'s corpus-level justification).

    One (token, doc) aggregate (vocabulary×doc-bounded, partial-agg'd)
    → one vocabulary-sized rollup → distributed top-k
    (TakeOrderedAndProject, never a global vocabulary sort)."""
    tok = _docs_cpu(spark, sf_dir).select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    per_doc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.when(F.col("tf") >= 2, 1).otherwise(0)).alias("df2"),
        F.sum("tf").alias("cf"),
    )
    return (
        stats.select(
            "token",
            "df",
            "cf",
            round_quotient(F.col("df2"), F.col("df"), 6).alias("burstiness"),
            round_quotient(F.col("cf"), F.col("df"), 6).alias("mean_tf"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(20)
    )
