#!/usr/bin/env python
"""Print the live dialect-surface counts (round-8, r7 verdict wrong #8:
hand-maintained totals in COVERAGE.md drifted from the tables — generate
them instead).

Usage: python scripts/count_dialect.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mcp_clickhouse_spark.dialect import NAME_MAP, PARAMETRIC, TEMPLATES, TYPE_MAP


def query_totals() -> dict[str, int]:
    """Registered / oracle-backed / rows-only triple, straight from the
    live registry (round 9, r8 verdict next #3: the hand counts in
    COVERAGE.md/TODO.md drifted two rounds running — generate them, and
    tests/test_doc_counts.py asserts the docs match)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return {
        "registered": len(qs),
        "oracle_backed": len(oracles),
        "rows_only": len(qs) - len(oracles),
    }


def main() -> None:
    # DISTINCT names: a name can live in two maps (e.g. a TEMPLATES
    # functional form shadowing a NAME_MAP rename) — summing the lens
    # double-counted those (round-8 review finding)
    distinct = set(NAME_MAP) | set(TEMPLATES) | set(PARAMETRIC)
    print(f"renames (NAME_MAP):        {len(NAME_MAP)}")
    print(f"templates (TEMPLATES):     {len(TEMPLATES)}")
    print(f"parametric (PARAMETRIC):   {len(PARAMETRIC)}")
    print(f"mapped function names:     {len(distinct)} (distinct)")
    print(f"type names (TYPE_MAP):     {len(TYPE_MAP)}")
    t = query_totals()
    print(f"registered queries:        {t['registered']}")
    print(f"oracle-backed:             {t['oracle_backed']}")
    print(f"rows-only by design:       {t['rows_only']}")


if __name__ == "__main__":
    main()
