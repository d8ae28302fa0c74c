"""Config matrix tests — mirrors reference tests/test_config_interface.py:6-96
(env-var permutations through the typed accessors) against the Spark-engine
env surface documented in config.py."""

from __future__ import annotations

import pytest

from mcp_clickhouse_spark.config import (
    MCPServerConfig,
    SparkEngineConfig,
    TransportType,
    get_engine_config,
    get_mcp_config,
    reset_config_singletons,
)


@pytest.fixture(autouse=True)
def clean_singletons():
    """Every test sees fresh singletons; env changes take effect."""
    reset_config_singletons()
    yield
    reset_config_singletons()


# --- engine config -----------------------------------------------------------


def test_engine_defaults(monkeypatch):
    for var in (
        "MCP_SPARK_ENABLED",
        "MCP_SPARK_WAREHOUSE",
        "MCP_SPARK_MASTER",
        "MCP_SPARK_SHUFFLE_PARTITIONS",
        "SPARK_GRAFT_SF_DIR",
        "SPARK_GRAFT_CPUS",
        "SPARK_GRAFT_DRIVER_MEM",
    ):
        monkeypatch.delenv(var, raising=False)
    cfg = SparkEngineConfig()
    assert cfg.enabled is True
    assert cfg.warehouse == "/root/testdata/sf0.1"
    assert cfg.master.startswith("local[")
    assert cfg.shuffle_partitions is None
    assert cfg.driver_memory == "8g"


def test_engine_env_overrides(monkeypatch, tmp_path):
    monkeypatch.setenv("MCP_SPARK_WAREHOUSE", str(tmp_path))
    monkeypatch.setenv("MCP_SPARK_MASTER", "local[2]")
    monkeypatch.setenv("MCP_SPARK_SHUFFLE_PARTITIONS", "8")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "2g")
    cfg = SparkEngineConfig()
    sess = cfg.get_session_config()
    assert sess["master"] == "local[2]"
    assert sess["shuffle_partitions"] == 8
    assert sess["extra_conf"]["spark.driver.memory"] == "2g"


def test_engine_warehouse_fallback_to_sf_dir(monkeypatch, tmp_path):
    """SPARK_GRAFT_SF_DIR is the fallback when MCP_SPARK_WAREHOUSE unset."""
    monkeypatch.delenv("MCP_SPARK_WAREHOUSE", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path))
    assert SparkEngineConfig().warehouse == str(tmp_path)


def test_engine_missing_warehouse_raises(monkeypatch):
    """Validation-on-construction: missing warehouse dir = missing required
    env (reference mcp_env.py:167-180 analog)."""
    monkeypatch.setenv("MCP_SPARK_WAREHOUSE", "/no/such/dir/at/all")
    with pytest.raises(ValueError, match="MCP_SPARK_WAREHOUSE"):
        SparkEngineConfig()


def test_engine_disabled_skips_validation(monkeypatch):
    """Disabled engine must not validate the warehouse (the
    CLICKHOUSE_ENABLED=false analog)."""
    monkeypatch.setenv("MCP_SPARK_ENABLED", "false")
    monkeypatch.setenv("MCP_SPARK_WAREHOUSE", "/no/such/dir/at/all")
    cfg = SparkEngineConfig()
    assert cfg.enabled is False


def test_engine_disabled_server_registers_no_tools(monkeypatch):
    monkeypatch.setenv("MCP_SPARK_ENABLED", "false")
    from mcp_clickhouse_spark.mcp_server import MCPSparkServer

    server = MCPSparkServer()
    assert server.tools == {}
    listing = server.handle_message(
        {"jsonrpc": "2.0", "id": 1, "method": "tools/list"}
    )
    assert listing["result"]["tools"] == []


# --- server config -----------------------------------------------------------


def test_server_defaults(monkeypatch):
    for var in (
        "MCP_SPARK_SERVER_TRANSPORT",
        "MCP_SPARK_BIND_HOST",
        "MCP_SPARK_BIND_PORT",
        "MCP_SPARK_QUERY_TIMEOUT",
    ):
        monkeypatch.delenv(var, raising=False)
    cfg = MCPServerConfig()
    assert cfg.server_transport == "stdio"
    assert cfg.bind_host == "127.0.0.1"
    assert cfg.bind_port == 8000
    assert cfg.query_timeout == 30


@pytest.mark.parametrize("transport", ["stdio", "http", "sse", "HTTP", "Stdio"])
def test_server_transport_accepts_case_insensitive(monkeypatch, transport):
    monkeypatch.setenv("MCP_SPARK_SERVER_TRANSPORT", transport)
    assert MCPServerConfig().server_transport == transport.lower()
    assert MCPServerConfig().server_transport in TransportType.values()


def test_server_transport_invalid_raises(monkeypatch):
    monkeypatch.setenv("MCP_SPARK_SERVER_TRANSPORT", "websocket")
    with pytest.raises(ValueError, match="Invalid transport"):
        MCPServerConfig().server_transport


def test_server_env_overrides(monkeypatch):
    monkeypatch.setenv("MCP_SPARK_BIND_HOST", "0.0.0.0")
    monkeypatch.setenv("MCP_SPARK_BIND_PORT", "9123")
    monkeypatch.setenv("MCP_SPARK_QUERY_TIMEOUT", "5")
    cfg = MCPServerConfig()
    assert (cfg.bind_host, cfg.bind_port, cfg.query_timeout) == ("0.0.0.0", 9123, 5)


# --- singletons --------------------------------------------------------------


def test_singletons_cached_until_reset(monkeypatch):
    a = get_engine_config()
    assert get_engine_config() is a
    m = get_mcp_config()
    assert get_mcp_config() is m
    reset_config_singletons()
    assert get_engine_config() is not a
    assert get_mcp_config() is not m
