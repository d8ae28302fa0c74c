"""Source connectors — the chDB table-function analogs (SURVEY.md B19-B26)."""

from mcp_clickhouse_spark.sources.table_functions import (  # noqa: F401
    FORMAT_ALIASES,
    detect_format,
    file,
    hdfs,
    jdbc,
    mysql,
    postgresql,
    s3,
    source_df,
    sqlite,
    url,
)
