"""Query registry backing the driver contract (``__spark_entry__``).

Every operator from SURVEY.md §2 that we claim as done registers here with a
Spark callable and (when SQL-expressible) a DuckDB oracle. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive value
hash, so:

  - column names must match exactly on both sides (alias everything);
  - float results must be bit-deterministic: money/quantity aggregates go
    through exact DECIMAL arithmetic on BOTH sides before a final cast to
    double (fp summation order differs between engines otherwise);
  - anything order-sensitive inside a value (e.g. arrays from collect_list)
    must be canonically sorted on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None → driver does rows-only check
    category: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, category: str = "core"):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from mcp_clickhouse_spark.session import read_table

    return read_table(spark, sf_dir, name)
