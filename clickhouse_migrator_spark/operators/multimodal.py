"""Multimodal-column plumbing (driver north star; SURVEY.md §2.D M4).

Pattern: media (image/audio/video) lives in opaque ``binary`` columns
with typed metadata alongside; decode / feature-extract / frame-sample
run as Arrow-batched ``mapInPandas`` stages.  The container has no
image/audio libraries, so the *decoder* comes in three tiers:

- :func:`decode_bmp` — a REAL pure-Python decoder for 24-bit
  uncompressed BMP (header parse, bottom-up padded rows, BGR), used by
  the registered ``multimodal_bmp_decode`` query and certified by an
  arithmetic oracle — no external library needed;
- :func:`decode_image_real` — the compressed-format path, gated behind
  an import-try and raising ``NotImplementedError`` without Pillow; and
- :func:`fake_decode` — a deterministic arithmetic "decoder" used by the
  stub queries so the Spark-side plumbing (binary payloads, schema,
  partitioning, Arrow batch shape) is real and oracle-checked.

The payloads here are the documents' text bytes standing in for media
blobs; at 100 TB the same plan applies with parquet binary columns
(keep `spark.sql.files.maxPartitionBytes` low enough that a batch of
blobs fits executor memory; never collect blobs to the driver).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, width INT, height INT, n_frames INT, fmt STRING"
)


def decode_image_real(payload: bytes):  # pragma: no cover - no media libs in env
    """Real decode path, import-gated.  Cited pattern: reference has no
    media handling (SURVEY.md §1.1 — tables+SQL only); this is
    driver-mandated new surface."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in this "
            "environment; use fake_decode for plumbing tests"
        ) from e


def fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in decoder: metadata derived arithmetically
    from the payload length (so oracles can replicate it)."""
    n = len(payload)
    return n % 640, (n * 31) % 480, (n % 16) + 1, "fake"


def binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with the text re-encoded as an opaque binary payload —
    the multimodal column shape."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS payload_md5,
           substr(md5(text), 1, 8)    AS payload_md5_prefix
    FROM documents
    """,
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — computed JVM-side
    (no decode needed): size, checksum."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("payload_md5"),
        F.substring(F.md5(F.encode("text", "UTF-8")), 1, 8).alias("payload_md5_prefix"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))                    AS n_bytes,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST((octet_length(encode(text)) * 31) % 480 AS INT) AS height,
           CAST(octet_length(encode(text)) % 16 + 1 AS INT)     AS n_frames,
           'fake'                                        AS fmt
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal decode pipeline over ``mapInPandas``: binary
    payloads stream through Arrow batches into a Python decoder that
    emits typed metadata rows.  The decoder is the deterministic stub;
    swap :func:`fake_decode` for :func:`decode_image_real` when media
    libs exist — the Spark plan is identical."""
    docs = binary_docs(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (null source text) decode to NULL metadata,
            # matching the oracle's NULL propagation — len(None) crashed
            # the worker (round-8 edge fuzz); fmt stays the constant
            meta = [
                fake_decode(p) if p is not None else (None, None, None, "fake")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [
                        len(p) if p is not None else None for p in pdf["payload"]
                    ],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "fmt": [m[3] for m in meta],
                }
            )

    return docs.mapInPandas(decode_batches, DECODE_SCHEMA)


def encode_bmp(doc_id: int) -> bytes:
    """Synthesize a REAL 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding) whose dimensions and pixel
    values are arithmetic in doc_id — so a SQL oracle can state the
    expected decode output without parsing bytes."""
    import struct

    w = doc_id % 5 + 2
    h = doc_id % 7 + 1
    row_size = (3 * w + 3) // 4 * 4
    px = bytearray()
    for y in range(h - 1, -1, -1):  # BMP stores rows bottom-up
        for x in range(w):
            i = (y * w + x) * 3
            r = (doc_id * 31 + i) % 256
            g = (doc_id * 31 + i + 1) % 256
            b = (doc_id * 31 + i + 2) % 256
            px += bytes((b, g, r))  # BGR on disk
        px += b"\x00" * (row_size - 3 * w)
    size = 14 + 40 + len(px)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return bytes(header + px)


def decode_bmp(payload: bytes):
    """Pure-Python BMP decoder (no media libs): parses the little-endian
    headers, walks the padded bottom-up pixel rows, and returns
    (width, height, first_pixel_r, last_pixel_b, px_sum) where first =
    image top-left, last = image bottom-right — the two values that
    break if row order, padding, or BGR channel order is mishandled."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or h <= 0:
        raise ValueError("decoder handles 24-bit bottom-up BMPs")
    row_size = (3 * w + 3) // 4 * 4
    rows = [
        payload[offset + yy * row_size : offset + yy * row_size + 3 * w]
        for yy in range(h)
    ]
    top, bottom = rows[h - 1], rows[0]  # file order is bottom-up
    first_r = top[2]  # (0,0) R sits third in BGR
    last_b = bottom[3 * (w - 1)]  # (w-1,h-1) B leads its triple
    px_sum = sum(sum(r) for r in rows)
    return w, h, first_r, last_b, px_sum


@register(
    "multimodal_bmp_decode",
    oracle="""
    SELECT doc_id, 'bmp' AS fmt,
           CAST(doc_id % 5 + 2 AS INT)  AS width,
           CAST(doc_id % 7 + 1 AS INT)  AS height,
           CAST(54 + (doc_id % 7 + 1)
                     * (((doc_id % 5 + 2) * 3 + 3) // 4 * 4) AS BIGINT)
             AS n_payload_bytes,
           CAST((doc_id * 31) % 256 AS INT) AS first_pixel_r,
           CAST((doc_id * 31 + 3 * (doc_id % 5 + 2) * (doc_id % 7 + 1) - 1)
                % 256 AS INT) AS last_pixel_b,
           CAST(list_sum(list_transform(
                    generate_series(0, 3 * (doc_id % 5 + 2) * (doc_id % 7 + 1) - 1),
                    i -> (doc_id * 31 + i) % 256)) AS BIGINT) AS px_sum
    FROM documents
    """,
)
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL decode path with no external library (VERDICT r2
    next-round #6): each document synthesizes a genuine 24-bit BMP
    payload (headers, bottom-up rows, padding) inside the Arrow batch,
    and an independent byte-level parser decodes it back.  The oracle
    states the expected output purely arithmetically from doc_id, so
    any header/stride/channel-order bug in the decoder — not just the
    plumbing — fails the hash.  Same mapInPandas shape as the stub
    pipeline; at 100 TB the payloads would arrive in a parquet binary
    column instead of being synthesized."""
    docs = table(spark, sf_dir, "documents").select("doc_id")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "fmt": [], "width": [], "height": [],
                "n_payload_bytes": [], "first_pixel_r": [],
                "last_pixel_b": [], "px_sum": [],
            }
            for doc_id in pdf["doc_id"]:
                payload = encode_bmp(int(doc_id))
                w, h, first_r, last_b, px_sum = decode_bmp(payload)
                out["doc_id"].append(int(doc_id))
                out["fmt"].append("bmp")
                out["width"].append(w)
                out["height"].append(h)
                out["n_payload_bytes"].append(len(payload))
                out["first_pixel_r"].append(first_r)
                out["last_pixel_b"].append(last_b)
                out["px_sum"].append(px_sum)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        decode_batches,
        "doc_id BIGINT, fmt STRING, width INT, height INT, "
        "n_payload_bytes BIGINT, first_pixel_r INT, last_pixel_b INT, "
        "px_sum BIGINT",
    )


@register(
    "multimodal_resize_stub",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) % 640 AS INT)        AS width,
             CAST((octet_length(encode(text)) * 31) % 480 AS INT) AS height
      FROM documents
    )
    SELECT doc_id, width, height,
           CAST(least(width, 224) AS INT) AS resized_w,
           CAST(CASE WHEN width > 224
                     THEN greatest(CAST(floor(height * 224.0 / width) AS INT), 1)
                     ELSE height END AS INT) AS resized_h
    FROM meta
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage of the media pipeline: cap width at 224 preserving
    aspect ratio — arithmetic on the fake-decoded dimensions (the real
    path would do the same math then hand pixels to a Pandas-UDF
    resizer)."""
    meta = multimodal_decode_stub(spark, sf_dir)
    resized_w = F.least(F.col("width"), F.lit(224))
    # explicit floor: bare double→int casts truncate in Spark but ROUND
    # in DuckDB — never rely on implicit conversion for shared semantics
    resized_h = F.when(
        F.col("width") > 224,
        F.greatest(F.floor(F.col("height") * 224.0 / F.col("width")).cast("int"), F.lit(1)),
    ).otherwise(F.col("height"))
    return meta.select(
        "doc_id",
        "width",
        "height",
        resized_w.cast("int").alias("resized_w"),
        resized_h.cast("int").alias("resized_h"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id, CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
      FROM documents
    )
    SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_idx
    FROM meta
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 4th frame index from the decoded stream —
    explode over a generated sequence (video frame-sample plumbing
    without the codec)."""
    meta = multimodal_decode_stub(spark, sf_dir)
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))
        ).alias("frame_idx"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_transform(generate_series(1, 8),
                            i -> CAST(CAST(round(ascii(substr(md5(text), i, 1))
                                                 / 255.0, 6)
                                           AS DECIMAL(10,6)) AS VARCHAR)), ',')
             AS embedding
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads: Arrow batches of blobs
    stream into a Python featurizer that emits a fixed-dim embedding
    per payload — the media-to-vector stage of a multimodal pipeline
    (swap the digest-based stand-in for a real vision/audio encoder;
    plan, schema and batch shape are identical).  The stand-in hashes
    the *actual payload bytes* (hashlib over the Arrow buffer), so the
    plumbing is genuinely content-dependent; the oracle reproduces it
    through SQL md5 over the same bytes."""
    import hashlib

    docs = binary_docs(spark, sf_dir)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                if payload is None:
                    # NULL payload → NULL embedding (oracle: md5(NULL)
                    # is NULL); bytes(None) crashed the worker
                    embs.append(None)
                    continue
                h = hashlib.md5(bytes(payload)).hexdigest()
                # fixed-point rendering matches DuckDB DECIMAL(10,6)::VARCHAR
                embs.append(
                    ",".join(f"{round(ord(h[i]) / 255.0, 6):.6f}" for i in range(8))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "embedding": embs})

    return docs.mapInPandas(featurize, "doc_id BIGINT, embedding STRING")


@register(
    "multimodal_dedup_payloads",
    oracle="""
    WITH h AS (
      -- md5 over the UTF-8 bytes: DuckDB's md5 takes VARCHAR and hashes
      -- its UTF-8 encoding, which IS the payload here
      SELECT doc_id, md5(text) AS digest,
             octet_length(encode(text)) AS n_bytes
      FROM documents),
    g AS (
      SELECT digest, min(n_bytes) AS n_bytes, count(*) AS n_copies,
             min(doc_id) AS keeper
      FROM h GROUP BY digest)
    SELECT count(*)                                   AS n_unique_payloads,
           CAST(sum(n_copies) AS BIGINT)              AS n_payloads,
           CAST(sum(n_copies) - count(*) AS BIGINT)   AS n_dropped,
           CAST(sum(CASE WHEN n_copies > 1 THEN 1 END) AS BIGINT) AS n_dup_groups,
           CAST(sum(n_bytes * (n_copies - 1)) AS BIGINT) AS bytes_reclaimed
    FROM g
    """,
)
def multimodal_dedup_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY dedup — content-addressed storage for media blobs:
    hash each payload (md5 over raw bytes, JVM-side), keep one copy per
    digest, report the reclaimable bytes.  This is the first pass of
    every multimodal ingestion pipeline (identical files re-crawled
    under different URLs), and it never decodes anything.

    One scan computing (digest, length) per blob — the blobs themselves
    never shuffle, only the 16-byte digests — then a digest-keyed
    aggregate and a 5-number summary.  At 100 TB the digests-only
    shuffle is what makes this tractable."""
    p = binary_docs(spark, sf_dir)
    h = p.select(
        "doc_id",
        F.md5("payload").alias("digest"),
        F.length("payload").alias("n_bytes"),
    )
    g = h.groupBy("digest").agg(
        F.min("n_bytes").alias("n_bytes"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper"),
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_unique_payloads"),
        F.sum("n_copies").alias("n_payloads"),
        (F.sum("n_copies") - F.count(F.lit(1))).alias("n_dropped"),
        F.sum(F.when(F.col("n_copies") > 1, 1)).alias("n_dup_groups"),
        F.sum(F.col("n_bytes") * (F.col("n_copies") - 1)).alias("bytes_reclaimed"),
    )


@register(
    "multimodal_payload_byte_histogram",
    oracle="""
    WITH b AS (
      SELECT doc_id, text, length(text) AS n FROM documents),
    pos AS (
      SELECT doc_id, unnest(range(1, n + 1)) AS i, text FROM b),
    vals AS (
      SELECT doc_id, ascii(substr(text, i, 1)) AS v FROM pos)
    SELECT CAST(v // 32 AS BIGINT) AS bucket,
           count(*) AS n_bytes,
           CAST(min(v) AS BIGINT) AS lo,
           CAST(max(v) AS BIGINT) AS hi,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_vals
    FROM vals GROUP BY 1 ORDER BY bucket
    """,
)
def multimodal_payload_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-value histogram over opaque binary payloads (32-wide
    buckets) — the content-type/corruption screen that needs NO
    decoder: text-like payloads concentrate in the printable-ASCII
    buckets, compressed/encrypted blobs spread flat, a spike at 0 is
    padding.  Byte extraction is pure JVM expressions (posexplode over
    the payload string's code units — the fixture payloads are UTF-8
    text so code unit = byte), one explode → one hash aggregate on the
    8-bucket key; no Python, no collect."""
    d = table(spark, sf_dir, "documents")
    # Spark's split keeps a TRAILING empty element for a between-every-
    # char pattern (limit −1 semantics); drop it or ascii('') = 0 forges
    # a phantom zero-bucket the oracle doesn't have
    vals = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "(?!^)")).alias("i", "ch"),
        )
        .filter(F.col("ch") != "")
        .select(F.ascii("ch").alias("v"))
    )
    return (
        vals.groupBy(F.floor(F.col("v") / 32).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_bytes"),
            F.min("v").cast("bigint").alias("lo"),
            F.max("v").cast("bigint").alias("hi"),
            F.countDistinct("v").cast("bigint").alias("n_distinct_vals"),
        )
        .orderBy("bucket")
    )


_MAGIC = {
    0: (b"\x89PNG\r\n\x1a\n", "png"),
    1: (b"\xff\xd8\xff\xe0", "jpeg"),
    2: (b"RIFF\x00\x00\x00\x00WAVE", "wav"),
    3: (b"", "unknown"),
}


@register(
    "multimodal_magic_byte_sniffing",
    oracle="""
    SELECT CASE CAST(doc_id % 4 AS INTEGER)
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             WHEN 2 THEN 'wav' ELSE 'unknown' END AS sniffed_type,
           count(*) AS n_payloads,
           CAST(sum(octet_length(CAST(text AS BLOB))
               + CASE CAST(doc_id % 4 AS INTEGER)
                   WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 12 ELSE 0 END)
             AS BIGINT) AS total_bytes
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY 1
    ORDER BY sniffed_type
    """,
)
def multimodal_magic_byte_sniffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing on opaque binary payloads by MAGIC BYTES —
    the first gate of any multimodal ingest (extensions lie; upstream
    metadata lies; the header bytes don't).  The fixture synthesizes
    typed payloads by prepending real PNG/JPEG/RIFF-WAVE signatures
    (keyed on doc_id, so the oracle knows the ground truth in closed
    form), and the sniffer must round-trip them from the BYTES alone.

    Detection is `hex(substring(payload, 1, 4))` prefix matching —
    row-local JVM expressions over the binary column, no decode, no
    Python; the rollup is one hash aggregate.  This is the cheap
    first-pass that routes blobs to the right decoder pool at 100 TB."""
    # sniffing contract: a NULL payload has no bytes to sniff
    # (both sides; round-8 edge fuzz)
    d = binary_docs(spark, sf_dir).filter(F.col("payload").isNotNull())
    payload = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.lit(_MAGIC[0][0]))
        .when(F.col("doc_id") % 4 == 1, F.lit(_MAGIC[1][0]))
        .when(F.col("doc_id") % 4 == 2, F.lit(_MAGIC[2][0]))
        .otherwise(F.lit(b"")),
        F.col("payload"),
    )
    typed = d.select("doc_id", payload.alias("payload"))
    head = F.hex(F.substring(F.col("payload"), 1, 4))
    # RIFF is a CONTAINER signature (avi/webp/wav all start 'RIFF');
    # wav requires the 'WAVE' form tag at bytes 9-12 — checking only
    # the prefix would misclassify any payload whose text happens to
    # begin with 'RIFF' (ADVICE r2)
    wave_tag = F.hex(F.substring(F.col("payload"), 9, 4))
    sniffed = (
        F.when(head == "89504E47", "png")
        .when(F.substring(head, 1, 6) == "FFD8FF", "jpeg")
        .when((head == "52494646") & (wave_tag == "57415645"), "wav")
        .otherwise("unknown")
    )
    return (
        typed.select(sniffed.alias("sniffed_type"), F.length("payload").alias("nb"))
        .groupBy("sniffed_type")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("nb").alias("total_bytes"),
        )
        .orderBy("sniffed_type")
    )


CHUNK_BYTES = 64  # content-addressable-storage chunk size (fixture-scaled)


@register(
    "multimodal_chunk_dedup_rate",
    oracle=f"""
    WITH p AS (
      -- fixture payloads are the ASCII text's UTF-8 bytes, so
      -- character slicing on the text equals byte slicing on the blob
      SELECT doc_id, text AS payload, length(text) AS nb
      FROM documents),
    chunks AS (
      SELECT doc_id,
             md5(substring(payload,
                           1 + (k - 1) * {CHUNK_BYTES}, {CHUNK_BYTES})) AS chash
      FROM p, LATERAL (
        SELECT unnest(generate_series(1,
            CAST(ceil(nb / CAST({CHUNK_BYTES} AS DOUBLE)) AS BIGINT))) AS k))
    SELECT count(*) AS n_chunks,
           count(DISTINCT chash) AS n_unique_chunks,
           round(1 - count(DISTINCT chash) / CAST(count(*) AS DOUBLE), 6)
             AS chunk_dedup_rate
    FROM chunks
    """,
)
def multimodal_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable chunk storage audit: binary payloads split
    into fixed 64-byte chunks, each addressed by its hash; the
    chunk-level dedup rate = the storage a CAS backend (every blob
    store / artifact cache / dataset-versioning tool) would save by
    storing each distinct chunk once.  Fixed-size chunking is the
    deterministic, oracle-checkable baseline; content-defined chunking
    (FastCDC) improves shift-resistance with the same pipeline shape.

    Chunking is a row-local explode over byte ranges (`substring` on
    the binary column — no decode, no Python); the distinct-hash count
    is one hash aggregate on the chunk key.  Linear in total bytes."""
    p = binary_docs(spark, sf_dir).select(
        "doc_id", "payload", F.length("payload").alias("nb")
    )
    k = F.explode(
        F.sequence(
            F.lit(1),
            F.ceil(F.col("nb") / float(CHUNK_BYTES)).cast("bigint"),
        )
    )
    chunks = p.select("doc_id", k.alias("k"), "payload").select(
        F.md5(
            F.expr(f"substring(payload, 1 + (k - 1) * {CHUNK_BYTES}, {CHUNK_BYTES})")
        ).alias("chash")
    )
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chash").alias("n_unique_chunks"),
        F.round(
            1
            - F.try_divide(
                F.countDistinct("chash"), F.count(F.lit(1)).cast("double")
            ),
            6,
        ).alias("chunk_dedup_rate"),
    )
