"""Page-token lifecycle (A9/A10) — the reference's test_pagination.py is the
spec: page walk with disjoint pages, single-use tokens, invalid token →
page 1, parameter mismatch → page 1, expiry via cache eviction."""

from __future__ import annotations

import pytest

from mcp_clickhouse_spark import pagination
from mcp_clickhouse_spark.pagination import PageState, TTLCache, consume_token, mint_token
from mcp_clickhouse_spark.tools import list_tables

N_TABLES = 10


@pytest.fixture()
def pagination_tables(spark):
    """FIXTURES.md §1.4 — ten tables test_table_1..test_table_10."""
    made = []
    for i in range(1, N_TABLES + 1):
        name = f"test_table_{i}"
        spark.createDataFrame([(i, f"Test {i}")], "id long, name string").createOrReplaceTempView(
            name
        )
        made.append(name)
    yield made
    for name in made:
        spark.catalog.dropTempView(name)


def _names(resp):
    return [t["name"] for t in resp["tables"]]


def test_page_walk_disjoint(spark, pagination_tables):
    """3+3+3+1 walk with disjoint pages (reference test_pagination.py:48-76)."""
    seen: list[str] = []
    token = None
    pages = 0
    while True:
        resp = list_tables(
            spark, "default", like="test_table_%", page_token=token, page_size=3
        )
        page = _names(resp)
        assert len(set(page) & set(seen)) == 0, "pages must be disjoint"
        seen += page
        pages += 1
        assert resp["total_tables"] == N_TABLES
        token = resp["next_page_token"]
        if token is None:
            break
    assert pages == 4
    assert len(page) == 1  # last page
    assert sorted(seen) == sorted(pagination_tables)


def test_invalid_token_restarts(spark, pagination_tables):
    resp = list_tables(spark, "default", like="test_table_%", page_token="bogus", page_size=3)
    assert resp["total_tables"] == N_TABLES
    assert len(resp["tables"]) == 3  # page 1 again


def test_token_single_use(spark, pagination_tables):
    r1 = list_tables(spark, "default", like="test_table_%", page_size=3)
    tok = r1["next_page_token"]
    r2 = list_tables(spark, "default", like="test_table_%", page_token=tok, page_size=3)
    assert _names(r2) != _names(r1)
    # Reusing the consumed token falls back to page 1 (it was deleted).
    r3 = list_tables(spark, "default", like="test_table_%", page_token=tok, page_size=3)
    assert _names(r3) == _names(r1)


def test_token_mismatch_resets(spark, pagination_tables):
    r1 = list_tables(spark, "default", like="test_table_%", page_size=3)
    tok = r1["next_page_token"]
    # Same token, different filters → reset to page 1 of the new query.
    r2 = list_tables(spark, "default", like="test_table_1%", page_token=tok, page_size=3)
    assert r2["total_tables"] == 2  # test_table_1, test_table_10
    assert _names(r2)[0] == "test_table_1"


def test_token_expiry_falls_back(spark, pagination_tables, monkeypatch):
    clock = [0.0]
    cache = TTLCache(maxsize=100, ttl=3600, timer=lambda: clock[0])
    monkeypatch.setattr(pagination, "PAGINATION_CACHE", cache)
    r1 = list_tables(spark, "default", like="test_table_%", page_size=3)
    tok = r1["next_page_token"]
    clock[0] = 3601.0  # expire everything
    r2 = list_tables(spark, "default", like="test_table_%", page_token=tok, page_size=3)
    assert _names(r2) == _names(r1)  # page 1 fallback


def test_metadata_trimming(spark, pagination_tables):
    """include_detailed_columns=False → columns=[] but DDL kept (A8)."""
    resp = list_tables(
        spark, "default", like="test_table_1", include_detailed_columns=False
    )
    assert resp["tables"][0]["columns"] == []
    resp2 = list_tables(spark, "default", like="test_table_1")
    assert [c["name"] for c in resp2["tables"][0]["columns"]] == ["id", "name"]


def test_trimming_consistent_across_pages(spark, pagination_tables):
    """Reference test_pagination.py:185-254: the trimming flag holds across
    a token walk, and flipping it mid-walk resets to page 1."""
    token = None
    while True:
        resp = list_tables(
            spark, "default", like="test_table_%", page_token=token, page_size=4,
            include_detailed_columns=False,
        )
        assert all(t["columns"] == [] for t in resp["tables"])
        assert all(t["create_table_query"] is not None for t in resp["tables"])
        token = resp["next_page_token"]
        if token is None:
            break
    # flag mismatch on a minted token → page 1 of the new parameterization
    r1 = list_tables(spark, "default", like="test_table_%", page_size=4,
                     include_detailed_columns=False)
    tok = r1["next_page_token"]
    r2 = list_tables(spark, "default", like="test_table_%", page_token=tok,
                     page_size=4, include_detailed_columns=True)
    assert _names(r2) == _names(r1)  # restarted at page 1
    assert all(t["columns"] for t in r2["tables"])


def test_ttl_cache_maxsize():
    cache = TTLCache(maxsize=3, ttl=3600)
    for i in range(5):
        cache[f"k{i}"] = i
    assert len(cache) == 3


def test_consume_token_direct():
    st = PageState(database="d", table_names=["a", "b"], start_idx=1, like="x%")
    tok = mint_token(st)
    out = consume_token(tok, "d", "x%", None, True)
    assert out is not None and out.start_idx == 1
    assert consume_token(tok, "d", "x%", None, True) is None  # single-use


def test_consume_token_mismatch_preserves_token():
    # Advisor finding: a parameter mismatch must NOT burn the token — the
    # reference deletes only after serving a matching page, so retrying
    # with the original parameters still works.
    st = PageState(database="d", table_names=["a", "b"], start_idx=1, like="x%")
    tok = mint_token(st)
    assert consume_token(tok, "other_db", "x%", None, True) is None
    out = consume_token(tok, "d", "x%", None, True)
    assert out is not None and out.start_idx == 1
    assert consume_token(tok, "d", "x%", None, True) is None  # now consumed
