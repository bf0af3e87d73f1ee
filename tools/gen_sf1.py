"""Synthesize an sf1.0 fixture (10× sf0.1) for the scaling-curve bench
(VERDICT r7 #4).

The driver ships sf ≤ 0.1; the 100×-design claims need at least one
empirical decade.  Each table is 10 shifted copies of sf0.1:

- every PRIMARY/FOREIGN key is offset per copy by (max_key + 1), so
  key uniqueness and referential joins hold at the new scale
  (lineitem→orders/part/supplier, orders→customer all stay valid);
- region/nation stay single copies (TPC-H scaling semantics);
- document TEXT is token-remapped per copy (`tok` → `k<copy>tok`), so
  cross-copy Jaccard is ~0 and the dedup/minhash workload scales as
  10× honest data rather than densifying into a 45×-pairs adversarial
  corpus (the round-5 synthetic-data-trap lesson);
- embeddings get a per-copy deterministic SIGN-FLIP pattern — norms
  and within-copy similarity structure are preserved exactly while
  cross-copy cosines decorrelate, so ANN candidate counts scale ~10×.

Pure pyarrow — no Spark session, so it can run alongside other work.

Usage: python tools/gen_sf1.py [src_dir] [dst_dir] [tables_csv] [copies]

``tables_csv`` (default: all) restricts generation to a subset — the
round-9 second-decade probe builds sf10 for only the risk-subset
tables (documents/events/customer/supplier/embeddings) by running this
tool FROM the sf1 fixture with copies=10 again; the token remap and
sign-flip compose (copy tags nest: ``k<outer>k<inner>tok``), so
cross-copy decorrelation holds at the second decade too.
"""

from __future__ import annotations

import os
import re
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10

KEY_SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")

# key bases must be CONSISTENT across tables (l_orderkey and o_orderkey
# shift by the same base), so bases are computed per key FAMILY
_FAMILY = {
    "l_orderkey": "orderkey", "o_orderkey": "orderkey",
    "l_partkey": "partkey", "p_partkey": "partkey",
    "l_suppkey": "suppkey", "s_suppkey": "suppkey",
    "o_custkey": "custkey", "c_custkey": "custkey",
    "event_id": "eventid", "user_id": "userid",
    "doc_id": "docid", "vec_id": "vecid",
}


def _remap_text(arr: pa.ChunkedArray, k: int) -> pa.Array:
    pat = re.compile(r"[A-Za-z]+")
    out = []
    for v in arr.to_pylist():
        out.append(None if v is None else pat.sub(lambda m: f"k{k}{m.group(0)}", v))
    return pa.array(out, pa.string())


def _flip_embedding(arr: pa.ChunkedArray, k: int) -> pa.Array:
    out = []
    for vec in arr.to_pylist():
        if vec is None:
            out.append(None)
            continue
        out.append(
            [
                -x if ((i * k + k * k) % 7) < 3 else x
                for i, x in enumerate(vec)
            ]
        )
    return pa.array(out, pa.list_(pa.float32()))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] != "all" else None
    global COPIES
    if len(sys.argv) > 4:
        COPIES = int(sys.argv[4])
    os.makedirs(dst, exist_ok=True)

    key_shifts = {
        n: k for n, k in KEY_SHIFTS.items() if only is None or n in only
    }
    single_copy = [n for n in SINGLE_COPY if only is None or n in only]
    bases: dict[str, int] = {}
    tables = {}
    for name in list(key_shifts) + list(single_copy):
        tables[name] = pq.read_table(os.path.join(src, f"{name}.parquet"))
    for name, keys in key_shifts.items():
        for key in keys:
            fam = _FAMILY[key]
            mx = pc.max(tables[name].column(key)).as_py() or 0
            bases[fam] = max(bases.get(fam, 0), int(mx) + 1)

    for name in single_copy:
        pq.write_table(tables[name], os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied")

    for name, keys in key_shifts.items():
        t = tables[name]
        parts = []
        for k in range(COPIES):
            c = t
            for key in keys:
                fam = _FAMILY[key]
                col = pc.add(c.column(key), k * bases[fam]).cast(
                    t.schema.field(key).type
                )
                c = c.set_column(c.schema.get_field_index(key), key, col)
            if name in ("customer", "supplier") and k > 0:
                # keep the TPC-H name↔key invariant (Customer#%09d of
                # the SHIFTED key): verbatim-copied names collapse name
                # entropy to the sf0.1 distinct set — 100 duplicate
                # copies of every name at the second decade — which is
                # the densification trap (round-5 lesson) in string
                # form; the r9 sf10 probe caught the fuzzy join at 27×
                # on exactly this
                key_col = "c_custkey" if name == "customer" else "s_suppkey"
                prefix = "Customer#" if name == "customer" else "Supplier#"
                name_col = "c_name" if name == "customer" else "s_name"
                new_names = pa.array(
                    [
                        None if v is None else f"{prefix}{v:09d}"
                        for v in c.column(key_col).to_pylist()
                    ],
                    pa.string(),
                )
                c = c.set_column(
                    c.schema.get_field_index(name_col), name_col, new_names
                )
            if name == "documents" and k > 0:
                c = c.set_column(
                    c.schema.get_field_index("text"),
                    "text",
                    _remap_text(c.column("text"), k),
                )
            if name == "embeddings" and k > 0:
                c = c.set_column(
                    c.schema.get_field_index("embedding"),
                    pa.field(
                        "embedding", pa.list_(pa.float32())
                    ),
                    _flip_embedding(c.column("embedding"), k),
                )
            parts.append(c)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
