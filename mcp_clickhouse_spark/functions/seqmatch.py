"""Time-constrained sequence matching for sequenceMatch/sequenceCount.

The unconstrained pattern forms translate to a JVM-side regex over the
bitmask event encoding (dialect._sequence_pattern_regex) — that stays the
fast path.  Patterns with ``(?t op N)`` time constraints need timestamp
arithmetic a regex cannot express; CH implements them with a backtracking
matcher (reference: ClickHouse docs, sql-reference/aggregate-functions/
parametric-functions → sequenceMatch: "events that occur more than 1800
seconds from each other — an arbitrary number of any events can lay
between these events").  This module is the faithful equivalent: a
per-GROUP Python backtracking matcher, invoked once per group over the
time-sorted (timestamp, condition-bitmask) event list — the same
one-Python-call-per-group cost class as the hypothesis-test p-value UDFs.

Semantics (pinned by the docs sentence above and by the docs'
irrelevant-condition example):

- consecutive event atoms ``(?N)(?M)`` must match ADJACENT kept events
  (events matching no condition are dropped before matching);
- ``.`` matches one kept event, ``.*`` any run of kept events;
- ``(?t op N)(?M)`` matches an event satisfying condition M whose gap to
  the event matched by the NEAREST PRECEDING event atom satisfies
  ``gap op N`` — any number of kept events may lie between (the implicit
  skip the docs describe); ``N`` is in the time column's seconds unit.

``sequenceCount`` counts non-overlapping chains scanning left to right,
each match consuming through its last event (leftmost-shortest ends, so
the count is maximal under the left-to-right scan — CH's convention).
"""

from __future__ import annotations

import re

_TIME_RE = re.compile(r"\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)")
_COND_RE = re.compile(r"\(\?(\d+)\)")

# token forms: ("star",) | ("ev", cond_or_None, op_or_None, value_or_None)


def parse_pattern(pattern: str, k: int, unit_scale: int = 1_000_000):
    """Parse a CH sequence pattern into matcher tokens.

    ``k`` is the number of conditions supplied; ``unit_scale`` converts
    the pattern's seconds into the event-timestamp unit (micros).
    Raises ValueError with a guided message on malformed patterns — the
    dialect layer surfaces these at translate time.
    """
    tokens: list[tuple] = []
    pending: tuple[str, int] | None = None  # (op, scaled value)
    seen_event = False
    i = 0
    while i < len(pattern):
        if pattern[i] == "(":
            m = _COND_RE.match(pattern, i)
            if m:
                n = int(m.group(1))
                if not 1 <= n <= k:
                    raise ValueError(
                        f"sequenceMatch pattern references condition {n} "
                        f"but only {k} conditions were given"
                    )
                tokens.append(
                    ("ev", n, pending[0] if pending else None,
                     pending[1] if pending else None)
                )
                pending, seen_event = None, True
                i = m.end()
                continue
            m = _TIME_RE.match(pattern, i)
            if m:
                if pending is not None:
                    raise ValueError(
                        "sequenceMatch: consecutive time constraints"
                    )
                if not seen_event:
                    raise ValueError(
                        "sequenceMatch: a time constraint needs a "
                        "preceding event atom"
                    )
                pending = (m.group(1), int(m.group(2)) * unit_scale)
                i = m.end()
                continue
            raise ValueError(
                f"sequenceMatch: unsupported pattern atom at {pattern[i:]!r}"
            )
        if pattern[i : i + 2] == ".*":
            if pending is not None:
                raise ValueError(
                    "sequenceMatch: a time constraint must be followed "
                    "by an event atom, not .*"
                )
            tokens.append(("star",))
            i += 2
            continue
        if pattern[i] == ".":
            tokens.append(
                ("ev", None, pending[0] if pending else None,
                 pending[1] if pending else None)
            )
            pending, seen_event = None, True
            i += 1
            continue
        raise ValueError(
            f"sequenceMatch: unsupported pattern character {pattern[i]!r}"
        )
    if pending is not None:
        raise ValueError(
            "sequenceMatch: a time constraint must be followed by an "
            "event atom"
        )
    return tokens


def _cmp(gap: int, op: str, val: int) -> bool:
    if op == "<":
        return gap < val
    if op == "<=":
        return gap <= val
    if op == ">":
        return gap > val
    if op == ">=":
        return gap >= val
    return gap == val


def _min_end(events, tokens, ti, ei, base_t, memo):
    """Minimal end index (exclusive) of a match of tokens[ti:] starting
    at event ei with the previous atom's timestamp base_t, else None."""
    key = (ti, ei, base_t)
    if key in memo:
        return memo[key]
    if ti == len(tokens):
        memo[key] = ei
        return ei
    tok = tokens[ti]
    out = None
    if tok[0] == "star":
        for j in range(ei, len(events) + 1):
            out = _min_end(events, tokens, ti + 1, j, base_t, memo)
            if out is not None:
                break
    else:
        _, n, op, val = tok
        if op is None:
            if ei < len(events):
                t, m = events[ei]
                if n is None or (m >> (n - 1)) & 1:
                    out = _min_end(
                        events, tokens, ti + 1, ei + 1, t, memo
                    )
        else:
            # time-constrained atom: kept events may lie in between
            for j in range(ei, len(events)):
                t, m = events[j]
                if n is not None and not (m >> (n - 1)) & 1:
                    continue
                if not _cmp(t - base_t, op, val):
                    continue
                out = _min_end(events, tokens, ti + 1, j + 1, t, memo)
                if out is not None:
                    break
    memo[key] = out
    return out


def _coerce(events) -> list[tuple[int, int]]:
    # rows arrive as pyspark Rows or plain tuples; NULL-safe
    return [(int(e[0]), int(e[1])) for e in (events or ())]


def seq_match(events, pattern: str) -> int:
    evs = _coerce(events)
    tokens = [("star",)] + parse_pattern(pattern, 64)
    return 1 if _min_end(evs, tokens, 0, 0, None, {}) is not None else 0


def seq_count(events, pattern: str) -> int:
    evs = _coerce(events)
    tokens = [("star",)] + parse_pattern(pattern, 64)
    pos, count = 0, 0
    while pos < len(evs):
        end = _min_end(evs[pos:], tokens, 0, 0, None, {})
        if end is None or end == 0:
            break
        count += 1
        pos += end
    return count


def ensure_registered(spark) -> None:
    """Register ch_seq_match / ch_seq_count (idempotent per session)."""
    spark.udf.register("ch_seq_match", seq_match, "int")
    spark.udf.register("ch_seq_count", seq_count, "int")
