"""Regenerate CATALOG.md from the live registry: `python scripts/gen_catalog.py`."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_programming_spark.registry import catalog

HEADER = """# CATALOG — all registered queries

Generated from `big_data_programming_spark/registry.py` (do not edit by hand;
regenerate with `python scripts/gen_catalog.py`). One row per
`queries()` entry: SURVEY.md §2 operator tags, oracle status, and the
module the implementation lives in.

| # | Query | §2 tags | Oracle | Module |
|---|---|---|---|---|
"""


def main() -> None:
    rows = []
    for i, (name, q) in enumerate(catalog().items(), 1):
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        if q.oracle is not None:
            oracle = "✅"
        else:
            oracle = f"➖ rows-only: {q.rows_only_reason}"
        rows.append(f"| {i} | `{name}` | {' '.join(q.tags)} | {oracle} | {mod} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main()
