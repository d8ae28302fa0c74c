"""Page-token machinery for list_tables (SURVEY.md §2.1 A9/A10).

Mirrors the reference exactly (mcp_clickhouse/mcp_server.py:164-166,
:266-296, :340-387):
  - UUID4 tokens minted per page, state in an in-process TTL cache
    (100 entries, 3600 s — :166);
  - tokens are SINGLE-USE (deleted when consumed — :375);
  - a token presented with mismatched database/filters/flags resets to
    page 1 with a warning (:344-355);
  - an expired/unknown token falls back to page 1 (tested by the
    reference's test_pagination.py:122-138).

cachetools isn't available in this environment, so TTLCache here is a
minimal dict-based equivalent with the same maxsize/ttl semantics.
"""

from __future__ import annotations

import logging
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Hashable

logger = logging.getLogger(__name__)


class TTLCache:
    """Minimal TTLCache: per-entry expiry + LRU-ish maxsize eviction."""

    def __init__(self, maxsize: int = 100, ttl: float = 3600.0, timer=time.monotonic):
        self.maxsize = maxsize
        self.ttl = ttl
        self._timer = timer
        self._data: dict[Hashable, tuple[float, Any]] = {}

    def _purge(self) -> None:
        now = self._timer()
        dead = [k for k, (exp, _) in self._data.items() if exp <= now]
        for k in dead:
            del self._data[k]

    def __setitem__(self, key: Hashable, value: Any) -> None:
        self._purge()
        if key not in self._data and len(self._data) >= self.maxsize:
            oldest = min(self._data, key=lambda k: self._data[k][0])
            del self._data[oldest]
        self._data[key] = (self._timer() + self.ttl, value)

    def __getitem__(self, key: Hashable) -> Any:
        self._purge()
        return self._data[key][1]

    def __contains__(self, key: Hashable) -> bool:
        self._purge()
        return key in self._data

    def __delitem__(self, key: Hashable) -> None:
        del self._data[key]

    def get(self, key: Hashable, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def __len__(self) -> int:
        self._purge()
        return len(self._data)


@dataclass
class PageState:
    """What a page token points at (reference :266-284)."""

    database: str
    table_names: list[str]
    start_idx: int
    like: str | list[str] | None = None
    not_like: str | list[str] | None = None
    include_detailed_columns: bool = True
    extra: dict = field(default_factory=dict)


# Module-level cache, like the reference's PAGINATION_CACHE (:164-166).
PAGINATION_CACHE: TTLCache = TTLCache(maxsize=100, ttl=3600)


def mint_token(state: PageState) -> str:
    token = str(uuid.uuid4())
    PAGINATION_CACHE[token] = state
    return token


def consume_token(
    token: str,
    database: str,
    like,
    not_like,
    include_detailed_columns: bool,
) -> PageState | None:
    """Fetch+delete the token (single-use). None → caller restarts at page 1.

    Mismatched parameters reset to page 1 WITHOUT consuming the token, per
    the reference (:344-355, :375): the reference only deletes a token after
    serving a matching page, so a client that retries the same token with
    the original parameters still gets its page (round-1 advisor finding —
    deleting before the mismatch check silently burned the token).
    """
    state = PAGINATION_CACHE.get(token)
    if state is None:
        logger.warning("page token %s unknown or expired; restarting at page 1", token)
        return None
    if (
        state.database != database
        or state.like != like
        or state.not_like != not_like
        or state.include_detailed_columns != include_detailed_columns
    ):
        logger.warning("page token %s parameter mismatch; restarting at page 1", token)
        return None
    del PAGINATION_CACHE[token]  # single-use, deleted only when served (:375)
    return state
