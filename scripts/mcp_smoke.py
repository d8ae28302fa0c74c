#!/usr/bin/env python
"""End-to-end MCP smoke: the full reference user journey over the REAL
HTTP transport (round 9, r8 verdict next #7 — the tool layer was
pytest-green but only as plain function calls; this drives the wire).

The reference CI drives its four tools through an in-memory fastmcp
Client (/root/reference/tests/test_mcp_server.py:91-377 is the response-
shape spec).  No MCP SDK ships in this container, so the smoke speaks the
same JSON-RPC 2.0 the client would, over a real ephemeral-port HTTP
server: initialize → tools/list → list_databases → list_tables paginated
in TWO pages with a page-token walk → run_select_query (Spark dialect,
ClickHouse dialect, embedded-error contract, readonly rejection) →
GET /health.  Each step asserts the reference's exact response shape
(tables/next_page_token/total_tables; database/name/columns/total_rows/
engine per table; status/rows/columns embedded payloads; isError only on
the engine path).

Usage:  python scripts/mcp_smoke.py          (standalone, ~25 s)
        pytest tests/test_mcp_smoke.py        (CI-style wrapper)
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_NEXT_ID = iter(range(1, 10_000))


def _post(base: str, method: str, params: dict | None = None) -> dict:
    msg = {"jsonrpc": "2.0", "id": next(_NEXT_ID), "method": method}
    if params is not None:
        msg["params"] = params
    req = urllib.request.Request(
        f"{base}/mcp",
        data=json.dumps(msg).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def _call(base: str, tool: str, arguments: dict) -> dict:
    resp = _post(base, "tools/call", {"name": tool, "arguments": arguments})
    assert "result" in resp, resp
    return resp["result"]


def _payload(result: dict):
    assert result["isError"] is False, result
    return json.loads(result["content"][0]["text"])


def run_smoke(spark) -> None:
    """Drive the journey against a throwaway HTTP server bound to an
    ephemeral port; raises AssertionError on any shape mismatch."""
    import threading

    from mcp_clickhouse_spark.mcp_server import MCPSparkServer, make_http_server

    # three tables so page_size=2 forces a 2-page token walk
    spark.sql("SELECT 1 AS a").createOrReplaceTempView("smoke_t1")
    spark.sql("SELECT 2 AS b, 'x' AS c").createOrReplaceTempView("smoke_t2")
    spark.sql("SELECT 3.5 AS d").createOrReplaceTempView("smoke_t3")

    server = MCPSparkServer(spark=spark)
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        # 1. initialize handshake
        init = _post(base, "initialize", {
            "protocolVersion": "2024-11-05",
            "capabilities": {},
            "clientInfo": {"name": "smoke", "version": "0"},
        })
        assert "serverInfo" in init["result"], init

        # 2. tools/list carries the reference's four tools
        tools = {
            t["name"]
            for t in _post(base, "tools/list")["result"]["tools"]
        }
        assert {"list_databases", "list_tables", "run_select_query",
                "run_embedded_select_query"} <= tools, tools

        # 3. list_databases → JSON list of names
        #    (reference test_list_databases: a JSON array in content[0])
        dbs = _payload(_call(base, "list_databases", {}))
        assert isinstance(dbs, list) and "default" in dbs, dbs

        # 4. list_tables page 1 of 2 (reference test_list_tables_basic +
        #    pagination: dict with tables / next_page_token / total_tables;
        #    each table carries database/name/columns/total_rows/engine)
        p1 = _payload(_call(base, "list_tables", {
            "database": "default", "like": "smoke_t%", "page_size": 2,
        }))
        assert set(p1) >= {"tables", "next_page_token", "total_tables"}, p1
        assert p1["total_tables"] == 3 and len(p1["tables"]) == 2
        for tbl in p1["tables"]:
            assert tbl["database"] == "default"
            assert {"name", "columns", "total_rows", "engine"} <= set(tbl)
        assert p1["next_page_token"], "expected a second page"

        # 5. page 2 via the token; token is single-use
        p2 = _payload(_call(base, "list_tables", {
            "database": "default", "like": "smoke_t%", "page_size": 2,
            "page_token": p1["next_page_token"],
        }))
        assert len(p2["tables"]) == 1 and p2["next_page_token"] is None
        names = [t["name"] for t in p1["tables"] + p2["tables"]]
        assert sorted(names) == ["smoke_t1", "smoke_t2", "smoke_t3"], names

        # 6. run_select_query (engine path) — columns + exact rows
        q = _payload(_call(base, "run_select_query", {
            "query": "SELECT a, a * 2 AS a2 FROM smoke_t1",
        }))
        assert q["columns"] == ["a", "a2"] and q["rows"] == [[1, 2]], q

        # 7. ClickHouse dialect through the same tool
        q = _payload(_call(base, "run_select_query", {
            "query": "SELECT toInt64(a) + 1 AS n, multiIf(a = 1, 'one',"
                     " 'other') AS w FROM smoke_t1",
            "dialect": "clickhouse",
        }))
        assert q["rows"] == [[2, "one"]], q

        # 8. the ASYMMETRIC error contracts (reference design): engine
        #    path raises → isError content; embedded path returns a
        #    {"status": "error"} payload with isError=False
        res = _call(base, "run_select_query", {
            "query": "SELECT * FROM no_such_table_xyz",
        })
        assert res["isError"] is True, res
        assert "Query execution failed" in res["content"][0]["text"]
        q = _payload(_call(base, "run_embedded_select_query", {
            "query": "SELECT * FROM no_such_table_xyz",
        }))
        assert q["status"] == "error" and q["message"], q

        # 9. readonly enforcement through the wire, both paths
        res = _call(base, "run_select_query", {
            "query": "DROP TABLE smoke_t1",
        })
        assert res["isError"] is True, res
        q = _payload(_call(base, "run_embedded_select_query", {
            "query": "DROP TABLE smoke_t1",
        }))
        assert q["status"] == "error", q

        # 10. GET /health (reference health_check contract)
        with urllib.request.urlopen(f"{base}/health", timeout=60) as resp:
            assert resp.status == 200
            assert "Connected to Spark" in resp.read().decode()
    finally:
        httpd.shutdown()
        for v in ("smoke_t1", "smoke_t2", "smoke_t3"):
            spark.catalog.dropTempView(v)
    print("mcp_smoke: 10/10 steps green")


def main() -> None:
    from mcp_clickhouse_spark.session import get_spark

    run_smoke(get_spark(app_name="mcp-smoke"))


if __name__ == "__main__":
    main()
