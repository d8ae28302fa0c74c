"""CI wrapper for scripts/mcp_smoke.py (round 9, r8 verdict next #7):
the full reference user journey — initialize → tools/list →
list_databases → list_tables (2-page token walk) → run_select_query
(both dialects + both error contracts) → /health — over the real HTTP
transport, asserting the reference's exact response shapes
(/root/reference/tests/test_mcp_server.py:91-377)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))


def test_mcp_smoke_journey(spark):
    from mcp_smoke import run_smoke

    run_smoke(spark)
