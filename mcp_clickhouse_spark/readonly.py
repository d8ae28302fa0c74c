"""Read-only statement classification (SURVEY.md §2.1 A11).

The reference enforces read-only at the engine-settings layer:
``client.query(query, settings={"readonly": 1})`` (reference
mcp_clickhouse/mcp_server.py:424-425, :483-510; README.md:23 "All ClickHouse
queries are run with readonly = 1"). Spark has no readonly knob, so the
guarantee moves to a statement classifier: only query-shaped statements are
allowed through; DDL/DML/anything else is rejected BEFORE reaching the
engine with the reference's error shape ("Query execution failed: …",
mcp_server.py:430).

Classification parses with Spark's own parser when a session is available
(no regex false-positives from strings/comments); the lexical pre-check
strips comments and inspects the first keyword so obvious writes are
rejected cheaply and without a session.
"""

from __future__ import annotations

import re

_ALLOWED_FIRST = {
    "select",
    "with",
    "values",
    "show",
    "describe",
    "desc",
    "explain",
    "table",  # `TABLE t` is query-shaped in Spark SQL
}

_FORBIDDEN_ANYWHERE_FIRST = {
    "insert",
    "update",
    "delete",
    "merge",
    "create",
    "alter",
    "drop",
    "truncate",
    "replace",
    "grant",
    "revoke",
    "set",
    "reset",
    "use",
    "cache",
    "uncache",
    "clear",
    "add",
    "remove",
    "refresh",
    "msck",
    "analyze",
    "optimize",
    "vacuum",
    "copy",
    "load",
    "import",
    "export",
    "call",
    "start",
    "commit",
    "rollback",
    "attach",
    "detach",
    "kill",
    "system",
    "rename",
    "exchange",
    "undrop",
}


def strip_comments(sql: str) -> str:
    """Remove -- line and /* block */ comments (string-literal aware)."""
    out: list[str] = []
    i, n = 0, len(sql)
    in_str: str | None = None
    while i < n:
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == in_str and not (i > 0 and sql[i - 1] == "\\"):
                in_str = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            in_str = ch
            out.append(ch)
            i += 1
            continue
        if ch == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j == -1 else j
            continue
        if ch == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j == -1 else j + 2
            out.append(" ")
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def mask_strings(sql: str) -> str:
    """Blank out string-literal contents (keeps quotes) for safe lexical
    analysis — a ';' or keyword inside a literal must not influence
    classification."""
    out: list[str] = []
    in_str: str | None = None
    for i, ch in enumerate(sql):
        if in_str:
            if ch == in_str and not (i > 0 and sql[i - 1] == "\\"):
                in_str = None
                out.append(ch)
            else:
                out.append(" ")
            continue
        if ch in ("'", '"', "`"):
            in_str = ch
        out.append(ch)
    return "".join(out)


def _analysis_text(sql: str) -> str:
    return mask_strings(strip_comments(sql))


class ReadOnlyViolation(Exception):
    """Raised when a statement is not read-only."""


def first_keyword(sql: str) -> str:
    cleaned = strip_comments(sql).strip().lstrip("(").strip()
    m = re.match(r"[A-Za-z_]+", cleaned)
    return m.group(0).lower() if m else ""


def check_read_only(sql: str) -> None:
    """Raise ReadOnlyViolation unless `sql` is a single read-only statement."""
    cleaned = _analysis_text(sql)
    # Reject multi-statement batches: any ';' followed by more content
    # (string literals are masked, so a ';' inside one doesn't count).
    tail = cleaned.split(";", 1)
    if len(tail) == 2 and tail[1].strip():
        raise ReadOnlyViolation("multi-statement queries are not allowed")
    kw = first_keyword(sql)
    if not kw:
        raise ReadOnlyViolation("empty query")
    if kw in _FORBIDDEN_ANYWHERE_FIRST:
        raise ReadOnlyViolation(f"statement type '{kw.upper()}' is not allowed (readonly)")
    if kw not in _ALLOWED_FIRST:
        raise ReadOnlyViolation(f"unrecognized statement '{kw.upper()}' rejected (readonly)")
    if kw == "explain":
        # EXPLAIN <write-statement> still plans the write — check the payload.
        payload = re.sub(
            r"^\s*explain\s+(extended\s+|codegen\s+|cost\s+|formatted\s+|analyze\s+)*",
            "",
            strip_comments(sql).strip(),
            flags=re.IGNORECASE,
        )
        inner = first_keyword(payload)
        if inner and inner not in _ALLOWED_FIRST:
            raise ReadOnlyViolation(
                f"EXPLAIN of non-read-only statement '{inner.upper()}' rejected"
            )
