"""mcp_clickhouse_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``stiproot/mcp-clickhouse``.

The reference (see SURVEY.md) is an MCP server exposing two ClickHouse
backends behind four tools: catalog listing with LIKE/NOT-LIKE filtering and
pagination, and read-only SQL execution with a timeout, over either a remote
ClickHouse server or the embedded chDB engine
(reference: mcp_clickhouse/mcp_server.py:596-616).

Here the role ClickHouse plays in the reference is played by Spark SQL +
Catalyst: one long-lived local SparkSession is the analog of the reference's
global chDB session (mcp_server.py:578-605), parquet-backed tables/views are
the catalog, and the ClickHouse SELECT dialect is realized with the
DataFrame/SQL API.

Layout:
    session.py      SparkSession factory + testdata registration
    readonly.py     read-only statement classifier (mcp_server.py:424-425 analog)
    executor.py     bounded query executor with real cancellation (:437-454 analog)
    tools.py        the four public tools (list_databases/list_tables/run_*_query)
    pagination.py   TTL page-token cache (:266-296 analog)
    catalog.py      Table/Column metadata introspection (:26-55 analog)
    dialect.py      ClickHouse→Spark function/dialect translation layer
    sources/        file/url/s3/hdfs/jdbc table-function analogs
    operators/      semantic shims Spark lacks (ASOF/ANY join, LIMIT BY, WITH FILL…)
    pipeline/       LLM-data-pipeline extensions (dedup, similarity, text, multimodal)
    streaming/      Structured Streaming extensions (no streaming in the reference)
    inventory/      the SURVEY.md §2 query inventory wired to the driver contract
"""

__version__ = "0.1.0"
