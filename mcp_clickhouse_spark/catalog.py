"""Catalog metadata: the reference's Table/Column dataclasses realized over
spark.catalog (SURVEY.md §1.1-1.2, §2.1 A5-A7).

Field mapping (reference mcp_clickhouse/mcp_server.py:26-55):
  engine                → table provider/type (e.g. 'parquet', 'VIEW')
  create_table_query    → SHOW CREATE TABLE output (views/tables) or ''
  sorting_key/primary_key → '' (no MergeTree equivalent; bucket/sort spec
                            would go here for bucketed tables)
  total_rows/total_bytes → catalog stats when computed, else None
  parts/active_parts     → backing file count for external tables, else None
  total_marks            → None (no mark index in Spark)

The reference's N+1 per-table column query loop (:246-258) is collapsed:
one listColumns call per table on the page only (§4.1 'improve').
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Any, List, Optional

from pyspark.sql import SparkSession


@dataclass
class Column:
    database: str
    table: str
    name: str
    column_type: str
    default_kind: Optional[str] = None
    default_expression: Optional[str] = None
    comment: Optional[str] = None

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class Table:
    database: str
    name: str
    engine: str = ""
    create_table_query: str = ""
    dependencies_database: str = ""
    dependencies_table: str = ""
    engine_full: str = ""
    sorting_key: str = ""
    primary_key: str = ""
    total_rows: Optional[int] = None
    total_bytes: Optional[int] = None
    total_bytes_uncompressed: Optional[int] = None
    parts: Optional[int] = None
    active_parts: Optional[int] = None
    total_marks: Optional[int] = None
    comment: Optional[str] = None
    columns: List[Column] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d["columns"] = [asdict(c) if not isinstance(c, dict) else c for c in self.columns]
        return d


def list_database_names(spark: SparkSession) -> list[str]:
    return [db.name for db in spark.catalog.listDatabases()]


def list_table_names(spark: SparkSession, database: str) -> list[str]:
    # Temp views live in the session namespace; global catalog tables under
    # their database. The reference's system.tables scan (:188) maps to both.
    tables = spark.catalog.listTables(database)
    return sorted(tb.name for tb in tables)


def _show_create(spark: SparkSession, database: str, name: str) -> str:
    for qualified in (f"{database}.{name}", name):
        try:
            return spark.sql(f"SHOW CREATE TABLE {qualified}").collect()[0][0]
        except Exception:
            continue
    return ""


def _attach_stats(
    spark: SparkSession,
    database: str,
    name: str,
    table: Table,
    is_temp: bool = False,
) -> None:
    """Fill the MergeTree-analog physical metadata: total_rows/total_bytes
    from catalog statistics (populated by ANALYZE TABLE … COMPUTE
    STATISTICS), parts/active_parts = backing file count. Best-effort —
    temp views over in-memory frames have none of these.  ``is_temp``
    skips the db-qualified attempts that are GUARANTEED to throw for a
    temp view (each thrown Spark exception is a full analysis + Py4J
    round-trip — the system.tables sweep over a long session's hundreds
    of views paid ~6 of them per view, round 17)."""
    import re as _re

    provider = num_buckets = None
    for qualified in ((name,) if is_temp else (f"{database}.{name}", name)):
        try:
            rows = spark.sql(f"DESCRIBE EXTENDED {qualified}").collect()
        except Exception:
            continue
        for r in rows:
            if r[0] == "Statistics":
                m = _re.search(r"(\d+)\s+bytes(?:,\s*(\d+)\s+rows)?", r[1] or "")
                if m:
                    table.total_bytes = int(m.group(1))
                    if m.group(2):
                        table.total_rows = int(m.group(2))
            elif r[0] == "Sort Columns":
                # bucketed-table sort spec — the closest Spark analog of
                # MergeTree's sorting_key (reference Table.sorting_key,
                # mcp_server.py:46-48)
                table.sorting_key = (r[1] or "").strip("[]").replace("`", "")
            elif r[0] == "Bucket Columns":
                table.primary_key = (r[1] or "").strip("[]").replace("`", "")
            elif r[0] == "Provider":
                provider = (r[1] or "").strip()
            elif r[0] == "Num Buckets":
                num_buckets = (r[1] or "").strip()
        break
    if provider:
        # engine = the storage provider (the MergeTree-analog slot:
        # reference Table.engine, mcp_server.py:30); engine_full adds the
        # managed/external type and the bucket-sort layout the way CH's
        # engine_full carries the ORDER BY/SETTINGS tail.
        ttype = table.engine  # tableType set by describe_table before this
        table.engine = provider
        full = f"{provider} {ttype}".strip()
        if table.primary_key:
            full += f" CLUSTERED BY ({table.primary_key})"
            if table.sorting_key:
                full += f" SORTED BY ({table.sorting_key})"
            if num_buckets:
                full += f" INTO {num_buckets} BUCKETS"
        table.engine_full = full
    try:
        files = spark.table(
            name if is_temp else f"{database}.{name}"
        ).inputFiles()
        table.parts = len(files)
        table.active_parts = len(files)
    except Exception:
        pass


def describe_table(spark: SparkSession, database: str, name: str) -> Table:
    meta = None
    for qualified in (f"{database}.{name}", name):
        try:
            meta = spark.catalog.getTable(qualified)
            break
        except Exception:
            continue
    table = Table(database=database, name=name)
    is_temp = False
    if meta is not None:
        table.engine = meta.tableType or ""
        table.engine_full = meta.tableType or ""
        table.comment = meta.description
        is_temp = (meta.tableType or "").upper() == "TEMPORARY"
    # SHOW CREATE TABLE cannot render a temp view (Spark
    # EXPECT_PERMANENT_VIEW_NOT_TEMP) — skip the two guaranteed-throw
    # attempts; the value was '' for temp views before too
    table.create_table_query = (
        "" if is_temp else _show_create(spark, database, name)
    )
    _attach_stats(spark, database, name, table, is_temp=is_temp)
    cols = []
    for qualified in ((name,) if is_temp else (f"{database}.{name}", name)):
        try:
            cols = spark.catalog.listColumns(qualified)
            break
        except Exception:
            continue
    try:
        table.columns = [
            Column(
                database=database,
                table=name,
                name=c.name,
                column_type=c.dataType,
                comment=c.description,
            )
            for c in cols
        ]
    except Exception:
        table.columns = []
    return table
