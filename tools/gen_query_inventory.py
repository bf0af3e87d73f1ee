"""Generate QUERIES.md: the full registered-query inventory grouped by
module, with first-docstring-line summaries and oracle status.

    python tools/gen_query_inventory.py > QUERIES.md
"""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, ".")

from clickhouse_migrator_spark.registry import all_specs  # noqa: E402


def main() -> None:
    specs = all_specs()
    by_mod: dict[str, list] = defaultdict(list)
    for name, spec in sorted(specs.items()):
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        doc = (spec.fn.__doc__ or "").strip()
        para = " ".join(doc.split("\n\n")[0].split()) if doc else ""
        summary = para if len(para) <= 110 else para[:107] + "..."
        by_mod[mod].append((name, summary, spec.oracle is not None))

    print("# QUERIES — registered operator inventory")
    print()
    print(f"{len(specs)} queries; every one is run by the driver against the")
    print("DuckDB oracle at sf0.01 (`oracle` column: `sql` = full value-hash")
    print("comparison, `rows` = rows-only check for estimate-valued or")
    print("streaming-machinery outputs). Regenerate with")
    print("`python tools/gen_query_inventory.py > QUERIES.md`.")
    for mod in sorted(by_mod):
        rows = by_mod[mod]
        print(f"\n## {mod} ({len(rows)})\n")
        print("| query | oracle | summary |")
        print("|---|---|---|")
        for name, summary, has_oracle in rows:
            print(f"| `{name}` | {'sql' if has_oracle else 'rows'} | {summary} |")


if __name__ == "__main__":
    main()
