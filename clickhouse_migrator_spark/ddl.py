"""ClickHouse-dialect DDL/DML → Spark translation.

The reference passes user migration SQL verbatim to a ClickHouse server
(`/root/reference/clickhouse_migrate/migrate.py:52,59`); Catalyst cannot
parse ClickHouse DDL, so this module is the one string-level dialect
shim the engine needs (SURVEY.md §2.C C1–C3, §4).  It is deliberately
tiny and test-pinned:

- ``CREATE TABLE``: map ClickHouse types → Spark types, strip/record
  ``ENGINE``/``PARTITION BY``/``ORDER BY`` clauses, strip/record column
  ``DEFAULT``s (Spark parquet tables don't support them natively; the
  runner injects defaults at ADD COLUMN time instead).
- ``ALTER TABLE … ADD COLUMN c T DEFAULT v``: copy-on-write
  ``withColumn(lit(v).cast(T))`` + atomic table swap.
- ``ALTER TABLE … UPDATE c=e WHERE p`` / ``… DELETE WHERE p``
  (ClickHouse's asynchronous "mutations"): copy-on-write rewrite.
  Spark execution is synchronous, which subsumes the reference's
  ``pipelined`` mutation barrier (`migrate.py:56-71`) — statement N+1
  can never observe statement N half-applied.

Unsigned integers: Spark has no unsigned types; ``UInt8/16/32 → INT/
BIGINT`` map to the next WIDER signed type, and a negative integer
``DEFAULT`` on an unsigned column wraps modulo 2^bits at translation
time (``UInt32 DEFAULT -1`` → 4294967295 — matching ClickHouse's
two's-complement reinterpretation, relied on by the reference's
``V1_sequential_dmls.json``).  ``UInt64`` keeps signed semantics (the
wrapped value would overflow BIGINT; documented divergence — SURVEY.md
§1.2 — no reference test depends on it).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

TYPE_MAP = {
    "UInt8": "SMALLINT",
    "UInt16": "INT",
    "UInt32": "BIGINT",
    "UInt64": "BIGINT",
    "Int8": "TINYINT",
    "Int16": "SMALLINT",
    "Int32": "INT",
    "Int64": "BIGINT",
    "Float32": "FLOAT",
    "Float64": "DOUBLE",
    "String": "STRING",
    "FixedString": "STRING",
    "Date": "DATE",
    "DateTime64": "TIMESTAMP",
    "DateTime": "TIMESTAMP",
    "Bool": "BOOLEAN",
    "UUID": "STRING",
}

_TYPE_RE = re.compile(
    r"\b(" + "|".join(sorted(TYPE_MAP, key=len, reverse=True)) + r")\b(\(\d+\))?"
)
# One level of nested parens inside a container's type argument —
# `Nullable(DateTime64(3))`, `Array(Decimal(10, 2))`, `Map(String,
# FixedString(16))` are everyday ClickHouse DDL; the old paren-free
# `[^()]*?` inner silently left the wrapper in place and emitted
# invalid Spark DDL like `Nullable(TIMESTAMP)` (round-6 coverage-audit
# catch).  Deeper nesting resolves through the fixpoint loop in
# :func:`map_types` (innermost container matches first, then its
# parent sees one level again).
_INNER = r"[^()]*(?:\([^()]*\)[^()]*)*?"
# wrapper types: Nullable(T) → T (Spark columns are nullable by default),
# LowCardinality(T) → T (a ClickHouse storage hint; Spark's parquet
# dictionary encoding is the equivalent and automatic)
_WRAPPER_RE = re.compile(rf"\b(?:Nullable|LowCardinality)\(\s*({_INNER})\s*\)")
_ENUM_RE = re.compile(r"\bEnum(?:8|16)?\s*\([^)]*\)")
_DECIMAL_RE = re.compile(r"\bDecimal(?:32|64|128)?\s*\(")
_ARRAY_RE = re.compile(rf"\bArray\(\s*({_INNER})\s*\)")
_MAP_RE = re.compile(rf"\bMap\(\s*([^(),]*?)\s*,\s*({_INNER})\s*\)")
# unnamed Tuple(T1, T2) → STRUCT<_1: T1, _2: T2>; named
# Tuple(a T1, b T2) → STRUCT<a: T1, b: T2>
_TUPLE_RE = re.compile(rf"\bTuple\(\s*({_INNER})\s*\)")
# column/statement decorations with no Spark equivalent:
# CODEC(...) — parquet has its own codecs (possibly nested: ZSTD(3))
_CODEC_RE = re.compile(r"\s*CODEC\([^()]*(?:\([^()]*\)[^()]*)*\)", re.I)
# inline data-skipping index definitions — parquet min/max + optional
# bloom filters subsume them
_INLINE_INDEX_RE = re.compile(
    r",\s*INDEX\s+[^,()]+?(?:\([^)]*\))?[^,()]*?GRANULARITY\s+\d+", re.I
)
_ALTER_INDEX_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+"
    r"(?:ADD|DROP|CLEAR|MATERIALIZE)\s+INDEX\b",
    re.I,
)
_PROJECTION_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+"
    r"(?:ADD|DROP|CLEAR|MATERIALIZE)\s+PROJECTION\b",
    re.I,
)
_SETTING_OP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+(?:MODIFY|RESET)\s+SETTING\b",
    re.I,
)
_MODIFY_ORDER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+MODIFY\s+ORDER\s+BY\s+"
    r"(?P<e>.+?)\s*;?\s*$",
    re.I | re.S,
)
_MODIFY_SAMPLE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+MODIFY\s+SAMPLE\s+BY\s+"
    r"(?P<e>.+?)\s*;?\s*$",
    re.I | re.S,
)
_MODIFY_COMMENT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+MODIFY\s+COMMENT\s+"
    r"(?P<c>'(?:[^']|'')*')\s*;?\s*$",
    re.I,
)
_REMOVE_DEFAULT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+MODIFY\s+COLUMN\s+"
    r"(?:IF\s+EXISTS\s+)?(?P<col>[\w`]+)\s+REMOVE\s+DEFAULT\s*;?\s*$",
    re.I,
)


def _tuple_to_struct(m: "re.Match[str]") -> str:
    parts, depth, cur = [], 0, []
    for ch in m.group(1):
        # the fixpoint loop may already have mapped an inner container
        # to Spark's angle-bracket form (MAP<K, V>, ARRAY<T>,
        # STRUCT<…>) — its commas are nested too (hypothesis catch:
        # Tuple(Map(String, UInt8)) split inside the rewritten MAP<…>)
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    fields = []
    for i, p in enumerate(parts, 1):
        bits = p.split(None, 1)
        if len(bits) == 2 and re.match(r"^[a-z_]\w*$", bits[0]):  # named field
            fields.append(f"{bits[0]}: {bits[1]}")
        else:
            fields.append(f"_{i}: {p}")
    return "STRUCT<" + ", ".join(fields) + ">"


_LITERAL_RE = re.compile(r"'(?:\\.|''|[^'\\])*'")
_LIT_SLOT_RE = re.compile("\x00(\\d+)\x00")


def _mask_literal_contents(sql: str) -> tuple[str, list[str]]:
    """Replace every string-literal's CONTENT with a ``\\x00i\\x00``
    slot (quotes stay, so quote-expecting grammar still matches).  Type
    tokens, ENGINE/ORDER BY/PARTITION BY keywords, commas, or parens
    inside a literal are DATA — the quote-blind scans rewrote
    ``DEFAULT 'a UInt32 b'`` and captured layout clauses out of
    ``DEFAULT 'ORDER BY x'`` (round-7 probe battery)."""
    lits: list[str] = []

    def _slot(m: "re.Match[str]") -> str:
        lits.append(m.group(0)[1:-1])
        return f"'\x00{len(lits) - 1}\x00'"

    return _LITERAL_RE.sub(_slot, sql), lits


def _unmask_literal_contents(sql: str | None, lits: list[str]) -> str | None:
    if sql is None or not lits:
        return sql
    return _LIT_SLOT_RE.sub(lambda m: lits[int(m.group(1))], sql)


def map_types(sql: str) -> str:
    """Rewrite ClickHouse type tokens to Spark DDL types (including the
    wrapper types real-world DDL uses: Nullable / LowCardinality /
    Enum / Decimal / Array).  String-literal contents are never
    touched."""
    sql, lits = _mask_literal_contents(sql)
    prev = None
    while prev != sql:  # unwrap nested wrappers/containers to fixpoint
        prev = sql
        sql = _WRAPPER_RE.sub(lambda m: m.group(1), sql)
        sql = _ARRAY_RE.sub(lambda m: f"ARRAY<{m.group(1)}>", sql)
        sql = _MAP_RE.sub(lambda m: f"MAP<{m.group(1)}, {m.group(2)}>", sql)
        sql = _TUPLE_RE.sub(_tuple_to_struct, sql)
    sql = _ENUM_RE.sub("STRING", sql)  # enums → their string labels
    sql = _DECIMAL_RE.sub("DECIMAL(", sql)
    return _unmask_literal_contents(
        _TYPE_RE.sub(lambda m: TYPE_MAP[m.group(1)], sql), lits
    )


@dataclass
class Statement:
    """A classified, translated statement ready for the runner."""

    kind: str  # passthrough | create_table | add_column | cow_update | cow_delete
    sql: str  # translated SQL (passthrough/create_table) or original text
    table: str | None = None
    column: str | None = None
    col_type: str | None = None
    default: str | None = None
    assignments: list[tuple[str, str]] = field(default_factory=list)
    predicate: str | None = None
    order_by: str | None = None
    partition_by: str | None = None
    engine: str | None = None
    deduplicate: bool = False
    ttl: str | None = None
    rename_to: str | None = None
    if_exists: bool = False
    sample_by: str | None = None


_UINT_RE = re.compile(r"^\s*UInt(8|16|32)\s*$")


def _wrap_unsigned_default(ch_type: str, default: str | None) -> str | None:
    """ClickHouse reinterprets a negative integer DEFAULT on an
    unsigned column as its two's-complement value (UInt32 DEFAULT -1 →
    4294967295).  The mapped Spark type is the next WIDER signed type,
    so the wrapped constant always fits; UInt64 is excluded (wrap would
    overflow BIGINT — documented signed divergence)."""
    if default is None:
        return None
    m = _UINT_RE.match(ch_type)
    lit = default.strip()
    if m and re.fullmatch(r"-\d+", lit):
        bits = int(m.group(1))
        return str(int(lit) % (1 << bits))
    return default


_CREATE_RE = re.compile(r"^\s*CREATE\s+TABLE\s", re.I)
_RENAME_RE = re.compile(
    r"^\s*RENAME\s+TABLE\s+(?P<src>[\w.`]+)\s+TO\s+(?P<dst>[\w.`]+)\s*;?\s*$", re.I
)
_OPTIMIZE_RE = re.compile(r"^\s*OPTIMIZE\s+TABLE\s+(?P<table>[\w.`]+)", re.I)
_ADD_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+ADD\s+COLUMN\s+"
    r"(?:(?P<ifnex>IF\s+NOT\s+EXISTS)\s+)?(?P<col>[\w`]+)\s+(?P<type>\w+(?:\([^)]*\))?)"
    r"(?:\s+DEFAULT\s+(?P<default>.+?))?\s*;?\s*$",
    re.I | re.S,
)
_UPDATE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+UPDATE\s+(?P<assign>.+?)\s+"
    r"WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.I | re.S,
)
_DELETE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+DELETE\s+WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.I | re.S,
)
_ENGINE_RE = re.compile(r"\bENGINE\s*=?\s*\w+(\(.*?\))?", re.I)
# physical-layout clauses can appear in any order after the column list;
# each capture stops at the next clause keyword so none bleeds into the
# recorded property value (TTL/SETTINGS once did — see test_ddl_dialect)
_CLAUSE_STOP = r"(?=\bORDER\s+BY|\bPARTITION\s+BY|\bPRIMARY\s+KEY|\bSAMPLE\s+BY|\bTTL\b|\bSETTINGS\b|\bENGINE\b|;|$)"
_PARTITION_RE = re.compile(r"\bPARTITION\s+BY\s+(?P<e>[^;]*?)" + _CLAUSE_STOP, re.I)
_ORDER_RE = re.compile(r"\bORDER\s+BY\s+(?P<e>[^;]*?)" + _CLAUSE_STOP, re.I)
_TTL_RE = re.compile(r"\bTTL\s+(?P<e>[^;]*?)" + _CLAUSE_STOP, re.I)
_SETTINGS_RE = re.compile(r"\bSETTINGS\s+[^;]*", re.I)
_SAMPLE_BY_RE = re.compile(r"\bSAMPLE\s+BY\s+(?P<e>[^;]*?)" + _CLAUSE_STOP, re.I)
_PRIMARY_KEY_RE = re.compile(r"\bPRIMARY\s+KEY\s+(?P<e>[^;]*?)" + _CLAUSE_STOP, re.I)
_MODIFY_TTL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+MODIFY\s+TTL\s+(?P<e>.+?)\s*;?\s*$",
    re.I | re.S,
)
_DROP_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+DROP\s+COLUMN\s+"
    r"(?:(?P<ifex>IF\s+EXISTS)\s+)?(?P<col>[\w`]+)\s*;?\s*$",
    re.I,
)
_MODIFY_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+MODIFY\s+COLUMN\s+"
    r"(?P<col>[\w`]+)\s+(?P<type>\w+(?:\([^)]*\))?)\s*;?\s*$",
    re.I,
)
_RENAME_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+RENAME\s+COLUMN\s+"
    r"(?:(?P<ifex>IF\s+EXISTS)\s+)?(?P<src>[\w`]+)\s+TO\s+(?P<dst>[\w`]+)\s*;?\s*$",
    re.I,
)
# distributed-DDL decoration; meaningless off-cluster and rejected by
# Spark's parser — stripped from every statement before classification
_ON_CLUSTER_RE = re.compile(r"\bON\s+CLUSTER\s+[`'\"]?[\w-]+[`'\"]?", re.I)
_NOOP_OPS_RE = re.compile(
    r"^\s*(?:KILL\s+(?:MUTATION|QUERY)\b|SYSTEM\s+(?:STOP|START|FLUSH|RELOAD)\s+\w+)",
    re.I,
)
_EXCHANGE_RE = re.compile(
    r"^\s*EXCHANGE\s+TABLES\s+(?P<a>[\w.`]+)\s+AND\s+(?P<b>[\w.`]+)\s*;?\s*$", re.I
)
_CREATE_DICT_RE = re.compile(
    r"^\s*CREATE\s+DICTIONARY\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.`]+)\s*"
    r"\((?P<cols>.*?)\)\s*"
    r"PRIMARY\s+KEY\s+(?P<key>[\w`]+)\s*"
    r".*?SOURCE\s*\(\s*CLICKHOUSE\s*\((?P<src>[^)]*)\)\s*\)",
    re.I | re.S,
)
_DICT_SRC_TABLE_RE = re.compile(r"TABLE\s+'(?P<t>[\w.]+)'", re.I)
_MOVE_PART_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<src>[\w.`]+)\s+MOVE\s+PARTITION\s+"
    r"(?P<val>.+?)\s+TO\s+TABLE\s+(?P<dst>[\w.`]+)\s*;?\s*$",
    re.I | re.S,
)
_REPLACE_PART_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<dst>[\w.`]+)\s+REPLACE\s+PARTITION\s+"
    r"(?P<val>.+?)\s+FROM\s+(?P<src>[\w.`]+)\s*;?\s*$",
    re.I | re.S,
)
_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+TABLE\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<table>[\w.`]+)\s*;?\s*$",
    re.I,
)
_PART_OP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+(?P<op>DROP|DETACH|ATTACH)\s+"
    r"PARTITION\s+(?P<val>.+?)\s*;?\s*$",
    re.I | re.S,
)
_CLEAR_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+CLEAR\s+COLUMN\s+"
    r"(?:(?P<ifex>IF\s+EXISTS)\s+)?(?P<col>[\w`]+)\s+IN\s+PARTITION\s+(?P<val>.+?)\s*;?\s*$",
    re.I | re.S,
)
_FREEZE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+(?:(?:UN)?FREEZE|FETCH)\b", re.I
)
_DETACH_TABLE_RE = re.compile(
    r"^\s*DETACH\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<table>[\w.`]+)"
    r"(?:\s+PERMANENTLY)?\s*;?\s*$",
    re.I,
)
_ATTACH_TABLE_RE = re.compile(
    r"^\s*ATTACH\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<table>[\w.`]+)\s*;?\s*$",
    re.I,
)
_COMMENT_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<table>[\w.`]+)\s+COMMENT\s+COLUMN\s+"
    r"(?:IF\s+EXISTS\s+)?(?P<col>[\w`]+)\s+(?P<txt>'[^']*')\s*;?\s*$",
    re.I,
)
_DEFAULT_COL_RE = re.compile(r"\s+DEFAULT\s+[^,)]+", re.I)


def _split_top(s: str) -> list[str]:
    """Split on top-level commas only (paren-depth AND quote aware: a
    comma or paren inside a string literal — ``SET s = 'a,b', v = 2``
    — is data; ``''`` is the escaped quote)."""
    parts, depth, cur = [], 0, []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if s[j] == "\\" and j + 1 < n:
                    # backslash-escaped char (ClickHouse default style)
                    j += 2
                    continue
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur.append(s[i : min(j + 1, n)])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return parts


def _split_assignments(assign: str) -> list[tuple[str, str]]:
    """Split ``a = e1, b = e2`` on top-level commas only."""
    parts = _split_top(assign)
    out = []
    for p in parts:
        col, expr = p.split("=", 1)
        out.append((col.strip().strip("`"), expr.strip()))
    return out


def translate(sql: str) -> Statement:
    """Classify + translate one ClickHouse-dialect statement."""
    sql = _ON_CLUSTER_RE.sub(" ", sql)
    sql = re.sub(r"\bSYNC\s*;?\s*$", "", sql, flags=re.I)  # synchronous-drop modifier
    # MATERIALIZED VIEW → a real table built by CTAS (POPULATE is then
    # implicit — Spark has no deferred-fill concept); *continuous*
    # maintenance is the operators/rollup.py refresh pattern, not DDL
    sql = re.sub(
        r"^(\s*CREATE\s+)MATERIALIZED\s+VIEW\b", r"\1TABLE", sql, flags=re.I
    )
    sql = re.sub(r"\bPOPULATE\s+(?=AS\b)", "", sql, flags=re.I)
    sql = _CODEC_RE.sub("", sql)
    sql = _INLINE_INDEX_RE.sub("", sql)
    m = _ALTER_INDEX_RE.match(sql)
    if m:  # data-skipping index maintenance: parquet footer min/max and
        # bloom-filter write options subsume it — documented no-op
        return Statement(kind="passthrough", sql="SELECT 1", table=m.group("table"))
    m = _PROJECTION_RE.match(sql)
    if m:  # ClickHouse projections are materialized alternative sort/agg
        # layouts — the same query-acceleration class as data-skipping
        # indexes; Catalyst chooses plans from the single layout here —
        # documented no-op (raw passthrough errored in Spark's parser)
        return Statement(kind="passthrough", sql="SELECT 1", table=m.group("table"))
    m = _SETTING_OP_RE.match(sql)
    if m:  # MODIFY/RESET SETTING: CREATE-time SETTINGS are stripped (no
        # Spark analog for MergeTree knobs), so their mutation is the
        # same documented no-op
        return Statement(kind="passthrough", sql="SELECT 1", table=m.group("table"))
    m = _MODIFY_ORDER_RE.match(sql)
    if m:  # the recorded ORDER BY drives OPTIMIZE …  DEDUPLICATE — a
        # MODIFY must update the stored property, not error out
        return Statement(
            kind="set_order_by",
            sql=sql,
            table=m.group("table").strip("`"),
            order_by=m.group("e").strip(),
        )
    m = _MODIFY_SAMPLE_RE.match(sql)
    if m:  # recorded SAMPLE BY backs `FROM t SAMPLE k`
        return Statement(
            kind="set_sample_by",
            sql=sql,
            table=m.group("table").strip("`"),
            sample_by=m.group("e").strip(),
        )
    m = _MODIFY_COMMENT_RE.match(sql)
    if m:  # table comment — Spark spells it COMMENT ON TABLE … IS …
        return Statement(
            kind="passthrough",
            sql=f"COMMENT ON TABLE {m.group('table')} IS {m.group('c')}",
            table=m.group("table").strip("`"),
        )
    m = _REMOVE_DEFAULT_RE.match(sql)
    if m:  # column default removal — Spark: ALTER COLUMN … DROP DEFAULT
        return Statement(
            kind="passthrough",
            sql=(
                f"ALTER TABLE {m.group('table')} ALTER COLUMN "
                f"{m.group('col')} DROP DEFAULT"
            ),
            table=m.group("table").strip("`"),
            column=m.group("col").strip("`"),
        )
    if _NOOP_OPS_RE.match(sql):
        # operational statements with no referent here: mutations are
        # synchronous (KILL MUTATION targets an empty set by
        # construction — see migrate.pipelined) and there are no
        # background merges/replication queues/mark caches to
        # STOP/START/FLUSH/RELOAD — documented no-ops
        return Statement(kind="passthrough", sql="SELECT 1")
    m = _RENAME_RE.match(sql)
    if m:  # ClickHouse RENAME TABLE → Spark ALTER TABLE … RENAME TO
        return Statement(
            kind="passthrough",
            sql=f"ALTER TABLE {m.group('src')} RENAME TO {m.group('dst')}",
        )
    m = _OPTIMIZE_RE.match(sql)
    if m:  # MergeTree part merge → real work (migrate._exec_translated):
        # Replacing engines / DEDUPLICATE → key-dedupe rewrite using the
        # recorded ORDER BY; otherwise small-file compaction
        return Statement(
            kind="optimize",
            sql=sql,
            table=m.group("table").strip("`"),
            deduplicate=bool(re.search(r"\bDEDUPLICATE\b", sql, re.I)),
        )
    m = _EXCHANGE_RE.match(sql)
    if m:  # atomic table swap (blue/green deploys) → three-rename cycle,
        # executed by the runner so the intermediate name stays internal
        return Statement(
            kind="exchange_tables",
            sql=sql,
            table=m.group("a").strip("`"),
            rename_to=m.group("b").strip("`"),
        )
    m = _CREATE_DICT_RE.match(sql)
    if m:  # dictionary = keyed broadcast lookup over a source table →
        # a VIEW projecting the declared columns (LAYOUT/LIFETIME are
        # in-memory-refresh knobs with no Spark meaning: a view always
        # reflects the source, which subsumes LIFETIME-based reload);
        # the PRIMARY KEY is recorded for dictGet() rewriting
        sm = _DICT_SRC_TABLE_RE.search(m.group("src"))
        if not sm:
            raise ValueError(f"CREATE DICTIONARY without TABLE source: {sql!r}")
        cols = ", ".join(
            c.strip().split()[0] for c in _split_top(m.group("cols")) if c.strip()
        )
        return Statement(
            kind="create_dictionary",
            sql=f"SELECT {cols} FROM {sm.group('t')}",
            table=m.group("name").strip("`"),
            column=m.group("key").strip("`"),
            rename_to=sm.group("t"),
        )
    m = _MOVE_PART_RE.match(sql)
    if m:  # partition migration between tables (append + cow-delete)
        return Statement(
            kind="move_partition",
            sql=sql,
            table=m.group("src").strip("`"),
            rename_to=m.group("dst").strip("`"),
            predicate=m.group("val").strip(),
        )
    m = _REPLACE_PART_RE.match(sql)
    if m:  # overwrite dst's partition with src's copy (src unchanged)
        return Statement(
            kind="replace_partition",
            sql=sql,
            table=m.group("dst").strip("`"),
            rename_to=m.group("src").strip("`"),
            predicate=m.group("val").strip(),
        )
    m = _TRUNCATE_RE.match(sql)
    if m:  # delete all rows, keep schema — executed by the runner so
        # ClickHouse's IF EXISTS (Spark TRUNCATE lacks it) still works
        return Statement(
            kind="truncate",
            sql=sql,
            table=m.group("table").strip("`"),
            if_exists=bool(m.group("ifex")),
        )
    m = _FREEZE_RE.match(sql)
    if m:  # FREEZE = local filesystem snapshot for backup; FETCH
        # PARTITION = pull a part from another replica.  No Spark analog
        # for either (object-store versioning subsumes snapshots; there
        # are no replicas in a single-warehouse engine) — documented
        # no-ops.  Previously FETCH fell through to a raw passthrough
        # that errored in Spark's parser at apply time.
        return Statement(kind="passthrough", sql="SELECT 1", table=m.group("table"))
    m = _PART_OP_RE.match(sql)
    if m:  # partition lifecycle against the recorded PARTITION BY
        # expression: DROP deletes, DETACH parks rows in a side table,
        # ATTACH restores them (ClickHouse's detached/ directory)
        return Statement(
            kind=m.group("op").lower() + "_partition",
            sql=sql,
            table=m.group("table").strip("`"),
            predicate=m.group("val").strip(),
        )
    m = _CLEAR_COL_RE.match(sql)
    if m:  # ClickHouse resets the column to its default inside the
        # partition; defaults are stripped at CREATE (module docstring)
        # so the reset value is NULL — documented divergence
        return Statement(
            kind="clear_column_in_partition",
            sql=sql,
            table=m.group("table").strip("`"),
            column=m.group("col").strip("`"),
            predicate=m.group("val").strip(),
            if_exists=bool(m.group("ifex")),
        )
    m = _DETACH_TABLE_RE.match(sql)
    if m:  # hide the table (rename to an internal name) until ATTACH
        return Statement(
            kind="detach_table", sql=sql, table=m.group("table").strip("`")
        )
    m = _ATTACH_TABLE_RE.match(sql)
    if m:
        return Statement(
            kind="attach_table", sql=sql, table=m.group("table").strip("`")
        )
    m = _COMMENT_COL_RE.match(sql)
    if m:  # ClickHouse COMMENT COLUMN → Spark ALTER COLUMN ... COMMENT
        return Statement(
            kind="passthrough",
            sql=(
                f"ALTER TABLE {m.group('table')} ALTER COLUMN "
                f"{m.group('col')} COMMENT {m.group('txt')}"
            ),
        )
    m = _DROP_COL_RE.match(sql)
    if m:  # Spark parquet tables reject DROP COLUMN → copy-on-write
        return Statement(
            kind="drop_column",
            sql=sql,
            table=m.group("table").strip("`"),
            column=m.group("col").strip("`"),
            if_exists=bool(m.group("ifex")),
        )
    m = _MODIFY_COL_RE.match(sql)
    if m:  # type change → copy-on-write cast
        return Statement(
            kind="modify_column",
            sql=sql,
            table=m.group("table").strip("`"),
            column=m.group("col").strip("`"),
            col_type=map_types(m.group("type")),
        )
    m = _RENAME_COL_RE.match(sql)
    if m:  # Spark parquet tables reject RENAME COLUMN → copy-on-write
        return Statement(
            kind="rename_column",
            sql=sql,
            table=m.group("table").strip("`"),
            column=m.group("src").strip("`"),
            rename_to=m.group("dst").strip("`"),
            if_exists=bool(m.group("ifex")),
        )
    m = _ADD_COL_RE.match(sql)
    if m:
        return Statement(
            kind="add_column",
            sql=sql,
            table=m.group("table").strip("`"),
            column=m.group("col").strip("`"),
            col_type=map_types(m.group("type")),
            default=_wrap_unsigned_default(m.group("type"), m.group("default")),
            if_exists=bool(m.group("ifnex")),  # IF NOT EXISTS tolerance
        )
    m = _UPDATE_RE.match(sql)
    if m:
        return Statement(
            kind="cow_update",
            sql=sql,
            table=m.group("table").strip("`"),
            assignments=_split_assignments(m.group("assign")),
            predicate=m.group("pred"),
        )
    m = _DELETE_RE.match(sql)
    if m:
        return Statement(
            kind="cow_delete",
            sql=sql,
            table=m.group("table").strip("`"),
            predicate=m.group("pred"),
        )
    m = _MODIFY_TTL_RE.match(sql)
    if m:  # retention-policy metadata update; no Spark-side DDL exists
        return Statement(
            kind="set_ttl",
            sql=sql,
            table=m.group("table").strip("`"),
            ttl=m.group("e").strip(),
        )
    if _CREATE_RE.match(sql):
        # mask literal contents for the whole clause-scan phase: a
        # column DEFAULT/COMMENT literal may contain ENGINE/ORDER BY/
        # PARTITION BY/AS SELECT spellings, commas, or parens that the
        # scans below must not see (round-7 probe battery)
        out, _lits = _mask_literal_contents(map_types(sql).strip().rstrip(";"))
        # CTAS: split off the SELECT before clause-stripping, or the
        # layout-clause regexes would eat the query (ORDER BY inside the
        # SELECT is *its* order, and `AS SELECT ...` after ORDER BY (k)
        # would be captured into the recorded key — data-losing bugs)
        ctas_tail = ""
        cm = re.search(r"\bAS\s+\(?\s*SELECT\b", out, re.I)
        if cm:
            ctas_tail = " " + re.sub(r"\s+", " ", out[cm.start():]).strip()
            out = out[: cm.start()]
        order_by = partition_by = ttl = None
        em = re.search(r"\bENGINE\s*=?\s*(?P<name>\w+)", out, re.I)
        engine = em.group("name") if em else None
        pm = _PARTITION_RE.search(out)
        if pm:
            partition_by = pm.group("e").strip()
            out = _PARTITION_RE.sub(" ", out)
        om = _ORDER_RE.search(out)
        if om:
            order_by = om.group("e").strip()
            out = _ORDER_RE.sub(" ", out)
        tm = _TTL_RE.search(out)
        if tm:
            ttl = tm.group("e").strip()
            out = _TTL_RE.sub(" ", out)
        sample_by = None
        sm = _SAMPLE_BY_RE.search(out)
        if sm:  # recorded so SELECT ... SAMPLE k can hash the right key
            sample_by = sm.group("e").strip()
        out = _SETTINGS_RE.sub(" ", out)
        out = _SAMPLE_BY_RE.sub(" ", out)
        out = _PRIMARY_KEY_RE.sub(" ", out)
        out = _ENGINE_RE.sub(" ", out)
        out = _DEFAULT_COL_RE.sub(" ", out)
        out = re.sub(r"\s+", " ", out).strip().rstrip(";")
        if not re.search(r"\bUSING\s+\w+\s*$", out, re.I):
            out += " USING PARQUET"
        out += ctas_tail  # Spark syntax: USING comes before AS SELECT
        return Statement(
            kind="create_table",
            sql=_unmask_literal_contents(out, _lits),
            order_by=_unmask_literal_contents(order_by, _lits),
            partition_by=_unmask_literal_contents(partition_by, _lits),
            engine=engine,
            ttl=_unmask_literal_contents(ttl, _lits),
            sample_by=_unmask_literal_contents(sample_by, _lits),
        )
    return Statement(kind="passthrough", sql=map_types(sql).strip().rstrip(";"))
