"""SQLite as an official PySpark Python Data Source (Spark 4.1 API).

`sqlite_native.read_sqlite` gives the imperative entry point; this module
wires the same rowid-range parallel read into ``spark.read.format(...)``
with REAL predicate pushdown: Catalyst hands the reader its filters via
``DataSourceReader.pushFilters`` (Spark 4.1), the translatable subset
(comparisons, IN, IS NULL, prefix/suffix/contains, NOT) becomes a SQL
WHERE clause evaluated inside SQLite — index-backed when the column is
indexed — and only the untranslatable remainder is re-checked by Spark.

Usage:
    spark.dataSource.register(SqliteDataSource)
    df = (spark.read.format("sqlite")
          .option("path", "/data/app.db").option("table", "events").load())
    df.where("user_id = 7")   # WHERE user_id = 7 runs inside SQLite

Column pruning: Spark 4.1's PythonScanBuilder implements only
SupportsPushDownFilters (verified via javap — no
SupportsPushDownRequiredColumns), so Catalyst always hands ``reader()`` the
full table schema and automatic pruning is impossible at this API level.
The reader therefore (a) SELECTs exactly the schema it is given — if a
future Spark prunes, the SQL narrows for free — and (b) honors an explicit
``columns`` option ("a,b") so callers can bound SQLite→Arrow transfer today.
A ``traceFile`` option appends each executor-side SELECT for test assertions.

Scale notes: identical to sqlite_native — the file is a single-host
artifact; ranges bound per-task work, pushdown bounds per-task I/O.
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from mcp_clickhouse_spark.sources.sqlite_native import _quote, _spark_type


@dataclass
class _RowidRange(InputPartition):
    lo: int
    hi: int  # half-open


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _like_escape(s: str) -> str:
    # Two escaping layers, both required: LIKE-metachar escaping (backslash,
    # declared via ESCAPE '\') and SQL string-literal quote doubling — without
    # the latter, startswith("O'Brien") generated `LIKE 'O'Brien%'` (malformed
    # SQL / literal injection).
    return (
        str(s)
        .replace("\\", "\\\\")
        .replace("%", r"\%")
        .replace("_", r"\_")
        .replace("'", "''")
    )


def _translate(f: Filter) -> str | None:
    """One filter → SQLite WHERE fragment, or None if not translatable."""
    if isinstance(f, Not):
        inner = _translate(f.child)
        return f"NOT ({inner})" if inner else None
    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:  # nested columns can't exist in SQLite
        return None
    col = _quote(attr[0])
    if isinstance(f, EqualTo):
        return f"{col} = {_sql_literal(f.value)}"
    if isinstance(f, GreaterThan):
        return f"{col} > {_sql_literal(f.value)}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{col} >= {_sql_literal(f.value)}"
    if isinstance(f, LessThan):
        return f"{col} < {_sql_literal(f.value)}"
    if isinstance(f, LessThanOrEqual):
        return f"{col} <= {_sql_literal(f.value)}"
    if isinstance(f, In):
        return f"{col} IN ({', '.join(_sql_literal(v) for v in f.values)})"
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, StringStartsWith):
        return f"{col} LIKE '{_like_escape(f.value)}%' ESCAPE '\\'"
    if isinstance(f, StringEndsWith):
        return f"{col} LIKE '%{_like_escape(f.value)}' ESCAPE '\\'"
    if isinstance(f, StringContains):
        return f"{col} LIKE '%{_like_escape(f.value)}%' ESCAPE '\\'"
    return None


class SqliteDataSource(DataSource):
    """format name: ``sqlite`` — options: path, table, numPartitions."""

    @classmethod
    def name(cls) -> str:
        return "sqlite"

    def schema(self) -> StructType:
        from pyspark.sql import types as T

        path, table = self.options["path"], self.options["table"]
        with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as con:
            cols = con.execute(f"PRAGMA table_info({_quote(table)})").fetchall()
        if not cols:
            raise ValueError(f"sqlite table {table!r} not found in {path}")
        want = [c.strip() for c in str(self.options.get("columns", "")).split(",") if c.strip()]
        if want:
            by_name = {c[1]: c for c in cols}
            missing = [c for c in want if c not in by_name]
            if missing:
                raise ValueError(f"sqlite columns {missing} not in table {table!r}")
            cols = [by_name[c] for c in want]
        return T.StructType([T.StructField(c[1], _spark_type(c[2]), True) for c in cols])

    def reader(self, schema: StructType) -> "SqliteReader":
        return SqliteReader(self.options, schema)


class SqliteReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self.path = options["path"]
        self.table = options["table"]
        self.n_parts = int(options.get("numPartitions", 8) or 8)
        # `schema` is whatever Spark asks this reader to produce; read() SELECTs
        # exactly these columns, so a pruned ask never transfers extra columns
        # out of SQLite. A `columns` option narrows it further explicitly.
        want = [c.strip() for c in str(options.get("columns", "")).split(",") if c.strip()]
        names = [f.name for f in schema.fields]
        self.columns = [c for c in names if c in want] if want else names
        # Debug/test hook: append every executor-side SELECT to this file so
        # tests can assert what actually ran inside SQLite (pushdown, pruning).
        self.trace_file = options.get("traceFile") or None
        self.where: list[str] = []

    def _trace(self, sql: str) -> None:
        if self.trace_file:
            with open(self.trace_file, "a") as fh:
                fh.write(sql + "\n")

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            frag = _translate(f)
            if frag is None:
                yield f  # Spark re-evaluates what SQLite can't
            else:
                self.where.append(frag)

    def partitions(self) -> list[_RowidRange]:
        qtable = _quote(self.table)
        cond = (" AND " + " AND ".join(self.where)) if self.where else ""
        with sqlite3.connect(f"file:{self.path}?mode=ro", uri=True) as con:
            lo, hi = con.execute(
                f"SELECT min(rowid), max(rowid) FROM {qtable} WHERE 1=1{cond}"
            ).fetchone()
        if lo is None:
            return [_RowidRange(0, 0)]
        step = max(1, (hi - lo + 1) // self.n_parts)
        out, start = [], lo
        while start <= hi:
            end = hi + 1 if start + step > hi else start + step
            out.append(_RowidRange(start, end))
            start = end
        return out

    def read(self, partition: _RowidRange):
        if partition.hi <= partition.lo:
            return
        sel = ", ".join(_quote(c) for c in self.columns) if self.columns else "1"
        cond = (" AND " + " AND ".join(self.where)) if self.where else ""
        sql = (
            f"SELECT {sel} FROM {_quote(self.table)}"
            f" WHERE rowid >= ? AND rowid < ?{cond}"
        )
        self._trace(sql)
        with sqlite3.connect(f"file:{self.path}?mode=ro", uri=True) as con:
            yield from con.execute(sql, (partition.lo, partition.hi))
