"""Source connectors — the chDB table-function analogs (SURVEY.md B19-B26)."""

from mcp_clickhouse_spark.sources.avro_lite import read_avro, write_avro  # noqa: F401
from mcp_clickhouse_spark.sources.sqlite_native import read_sqlite  # noqa: F401
from mcp_clickhouse_spark.sources.table_functions import (  # noqa: F401
    FORMAT_ALIASES,
    bind_sql_table_functions,
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
