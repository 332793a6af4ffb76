#!/usr/bin/env python
"""Regenerate OPERATORS.md from the catalog registry (run from repo root)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tigate_spark.catalog import get_catalog  # noqa: E402


def main() -> None:
    cat = get_catalog()
    lines = [
        "# Operator catalog",
        "",
        f"{len(cat)} queries, each a (Spark builder, DuckDB oracle) pair consumed by",
        "`__spark_entry__.py` (`queries()` / `oracle_sql()`). `bench` marks the",
        "headline set `bench.py` times. Entries without an oracle carry a rows-only",
        "check (noted).",
        "",
        "| query | oracle | bench | what it covers |",
        "|---|---|---|---|",
    ]
    for name in sorted(cat):
        spec = cat[name]
        doc = " ".join(spec.doc.split())
        lines.append(
            f"| `{name}` | {'✓' if spec.oracle else 'rows-only'} | "
            f"{'✓' if spec.bench else ''} | {doc} |"
        )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote OPERATORS.md: {len(cat)} entries")


if __name__ == "__main__":
    main()
