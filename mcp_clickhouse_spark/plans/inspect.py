"""Helpers for asserting plan SHAPES — the properties that make queries
scale (pushdown, pruning, broadcast, bounded exchanges) rather than just
produce correct rows. tests/test_plans.py builds its gates on these."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _node_offset(ln: str) -> int:
    """Effective tree depth: width of the glyph prefix (spaces + ':+-').
    A marker-position regex fails here — a materialized cache's stored
    plan prints WITHOUT '+-' markers under its '== Final Plan ==' header,
    only deeper plain indentation."""
    if not ln.strip():
        return -1
    return len(ln) - len(ln.lstrip(" :+-"))


def count_nodes(plan: str, node: str) -> int:
    """Operator occurrences in the plan TREE only (formatted mode repeats
    every node in the details section).

    A MATERIALIZED cache inlines its stored plan under every
    InMemoryRelation occurrence, so a frame read twice would double-count
    the exchanges that executed exactly once to fill the cache (round 9 —
    jaccard_verify's auto-mode count() materializes the candidates cache
    at construction time and inflated pipe_minhash_lsh from 5 to 8).
    Cold-run-faithful counting: main-tree nodes outside cached subtrees,
    plus each DISTINCT cached plan's nodes ONCE (dedup by id-stripped
    subtree text)."""
    tree = plan.split("\n\n(")[0]
    lines = tree.splitlines()
    main_count = 0
    blocks: list[tuple[str, ...]] = []
    i = 0
    while i < len(lines):
        ln = lines[i]
        if "InMemoryRelation" in ln:
            if node in ln:
                main_count += 1
            off = _node_offset(ln)
            j = i + 1
            block = []
            while j < len(lines) and _node_offset(lines[j]) > off:
                # the stored plan repeats itself after an AQE
                # "== Initial Plan ==" marker — keep the final plan only
                if "== Initial Plan ==" in lines[j]:
                    while j < len(lines) and _node_offset(lines[j]) > off:
                        j += 1
                    break
                block.append(lines[j])
                j += 1
            blocks.append(tuple(
                re.sub(r"\(\d+\)", "", b).strip(" :+-") for b in block
            ))
            i = j
            continue
        if node in ln:
            main_count += 1
        i += 1
    cached = sum(
        sum(1 for b in blk if node in b) for blk in set(blocks)
    )
    return main_count + cached


def pushed_filters(plan: str) -> list[str]:
    """All PushedFilters entries, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out += [p.strip() for p in m.group(1).split(",") if p.strip()]
    return out


def read_schema_columns(plan: str) -> list[str]:
    """Column names from the first ReadSchema entry (scan projection)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
