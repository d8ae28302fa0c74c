"""Oracle output-type hygiene gate.

Three consecutive rounds lost a driver correctness row to the DuckDB oracle
emitting a result *type* (not a wrong value) that the driver's Arrow/pandas
canonicalizer renders differently than Spark: r1 arrays, r2 DECIMAL, r3
HUGEINT (int128 from un-cast integer SUMs).  This test closes the class:
every oracle in ``__spark_entry__.oracle_sql()`` is DESCRIBE'd against
DuckDB at sf0.001 and fails if any result column's type falls outside the
driver-safe allowlist in scripts/check_parity.py.  No Spark session needed —
DESCRIBE only plans the query.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from check_parity import ORACLE_TYPE_ALLOWLIST, oracle_type_violations  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


def test_all_oracles_emit_driver_safe_types(con):
    import __spark_entry__ as entrymod

    violations = {}
    for name, sql in entrymod.oracle_sql().items():
        bad = oracle_type_violations(con, sql)
        if bad:
            violations[name] = bad
    assert not violations, (
        f"oracles with driver-unsafe result types (CAST them): {violations}"
    )


def test_guard_rejects_uncast_integer_sum(con):
    # The exact shape that burned r3: SUM over a plain integer expression
    # returns HUGEINT in DuckDB.  The guard must flag it.
    bad = oracle_type_violations(
        con, "SELECT SUM(CASE WHEN n_nationkey > 2 THEN 1 ELSE 0 END) AS c FROM nation"
    )
    assert bad == ["c:HUGEINT"]


def test_guard_rejects_decimal_and_list(con):
    assert oracle_type_violations(con, "SELECT CAST(1.5 AS DECIMAL(4,1)) AS d")
    assert oracle_type_violations(con, "SELECT [1, 2, 3] AS arr")
    # and passes the cast-clean twin
    assert not oracle_type_violations(
        con, "SELECT CAST(1.5 AS DOUBLE) AS d, CAST(1 AS BIGINT) AS b"
    )


def test_allowlist_is_the_expected_closed_set():
    assert "HUGEINT" not in ORACLE_TYPE_ALLOWLIST
    assert "UBIGINT" not in ORACLE_TYPE_ALLOWLIST
    assert {"BIGINT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN"} <= (
        ORACLE_TYPE_ALLOWLIST
    )
