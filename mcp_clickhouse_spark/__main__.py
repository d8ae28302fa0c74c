"""Console entry point — transport dispatch from env config.

Analog of the reference's ``mcp_clickhouse/main.py:10-17``: read the
configured transport and start the matching server loop.  ``stdio`` serves
newline-delimited JSON-RPC on stdin/stdout; ``http`` and ``sse`` share one
ThreadingHTTPServer (POST /mcp, GET /health, GET /sse + POST /messages).

Run with ``python -m mcp_clickhouse_spark``.
"""

from __future__ import annotations

import logging

from mcp_clickhouse_spark.config import TransportType, get_mcp_config
from mcp_clickhouse_spark.mcp_server import MCPSparkServer, run_http, run_stdio

logger = logging.getLogger("mcp-clickhouse-spark")


def main() -> None:
    cfg = get_mcp_config()
    transport = cfg.server_transport  # validates against TransportType
    server = MCPSparkServer()
    logger.info("starting MCP server with transport=%s", transport)
    if transport == TransportType.STDIO.value:
        run_stdio(server)
    else:  # http and sse share the HTTP server (sse endpoints live on it)
        run_http(server, cfg.bind_host, cfg.bind_port)


if __name__ == "__main__":
    main()
