"""sequenceMatch/sequenceCount with (?t op N) time constraints.

Semantics pinned by the CH docs (parametric-functions → sequenceMatch):
plain adjacent atoms require adjacent kept events (the docs'
irrelevant-condition example), while a time-constrained transition allows
"an arbitrary number of any events" between the two matched events.
"""

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate
from mcp_clickhouse_spark.functions.seqmatch import (
    parse_pattern,
    seq_count,
    seq_match,
)
from mcp_clickhouse_spark.tools import run_select_query


# ---------- pure matcher ----------------------------------------------------


def test_parse_pattern_guided_errors():
    with pytest.raises(ValueError, match="preceding event"):
        parse_pattern("(?t>10)(?1)", 2)
    with pytest.raises(ValueError, match="followed by an event"):
        parse_pattern("(?1)(?t>10)", 2)
    with pytest.raises(ValueError, match="followed by an event"):
        parse_pattern("(?1)(?t>10).*(?2)", 2)
    with pytest.raises(ValueError, match="consecutive time"):
        parse_pattern("(?1)(?t>10)(?t<20)(?2)", 2)
    with pytest.raises(ValueError, match="only 2 conditions"):
        parse_pattern("(?1)(?t>10)(?3)", 2)


def _m(events_s, pattern):
    # events as (seconds, mask); matcher works in micros
    evs = [(t * 1_000_000, m) for t, m in events_s]
    return seq_match(evs, pattern)


def _c(events_s, pattern):
    evs = [(t * 1_000_000, m) for t, m in events_s]
    return seq_count(evs, pattern)


def test_matcher_adjacency_vs_time_skip():
    # kept events: c1@1, c3@2, c2@3  (the docs' three-condition example)
    evs = [(1, 0b001), (2, 0b100), (3, 0b010)]
    assert _m(evs, "(?1)(?2)") == 0  # c3 breaks adjacency
    assert _m(evs, "(?1).*(?2)") == 1
    assert _m(evs, "(?1)(?t>1)(?2)") == 1  # skip allowed, gap 2 > 1
    assert _m(evs, "(?1)(?t>5)(?2)") == 0  # gap too small


def test_matcher_operators():
    evs = [(0, 0b01), (100, 0b10)]
    assert _m(evs, "(?1)(?t>=100)(?2)") == 1
    assert _m(evs, "(?1)(?t>100)(?2)") == 0
    assert _m(evs, "(?1)(?t<100)(?2)") == 0
    assert _m(evs, "(?1)(?t<=100)(?2)") == 1
    assert _m(evs, "(?1)(?t==100)(?2)") == 1


def test_matcher_base_is_previous_atom():
    # c1@0, c2@50, c2@200: (?1)(?2) matches @50; a following constraint
    # measures from the (?2) match, not from (?1)
    evs = [(0, 0b01), (50, 0b10), (200, 0b10)]
    assert _m(evs, "(?1)(?2)(?t>=150)(?2)") == 1  # 200-50 = 150
    assert _m(evs, "(?1)(?2)(?t>150)(?2)") == 0


def test_matcher_skip_searches_forward():
    # gap must be > 100: the first c2 (gap 50) fails, the later one works
    evs = [(0, 0b01), (50, 0b10), (200, 0b10)]
    assert _m(evs, "(?1)(?t>100)(?2)") == 1
    # upper bound: only the near one qualifies
    assert _m(evs, "(?1)(?t<100)(?2)") == 1
    assert _m(evs, "(?1)(?t<40)(?2)") == 0


def test_counter_non_overlapping():
    evs = [(0, 0b01), (10, 0b10), (20, 0b01), (30, 0b10)]
    assert _c(evs, "(?1)(?t<=10)(?2)") == 2
    assert _c(evs, "(?1)(?t<=100)(?2)") == 2
    assert _c(evs, "(?1)(?t<5)(?2)") == 0
    # one c1 shared by two c2s still counts once
    evs2 = [(0, 0b01), (10, 0b10), (20, 0b10)]
    assert _c(evs2, "(?1)(?t<=30)(?2)") == 1


# ---------- live Spark path -------------------------------------------------


def test_sequence_time_constraints_live(spark):
    rows = [(1, 1), (2, 3), (3, 2), (100, 1), (130, 2)]
    spark.createDataFrame(
        [(float(t), n) for t, n in rows], "t double, number int"
    ).createOrReplaceTempView("seq_tc")

    def q(sql):
        return run_select_query(spark, sql, dialect="clickhouse")["rows"][0][0]

    base = (
        "(CAST(t AS TIMESTAMP), number = 1, number = 2, number = 3)"
        " FROM seq_tc"
    )
    assert q(f"SELECT sequenceMatch('(?1)(?t>1)(?2)'){base}") == 1
    assert q(f"SELECT sequenceMatch('(?1)(?t>500)(?2)'){base}") == 0
    # the unconstrained form still uses the regex path: c1@100,c2@130
    # are adjacent kept events, so this matches
    assert q(f"SELECT sequenceMatch('(?1)(?2)'){base}") == 1
    # ... but a time-constrained transition can still fail where an
    # unconstrained .* would pass
    assert q(f"SELECT sequenceMatch('(?3)(?t<20)(?1)'){base}") == 0
    assert q(f"SELECT sequenceMatch('(?3)(?t>=98)(?1)'){base}") == 1
    # seconds unit: 130-100 = 30
    assert q(f"SELECT sequenceMatch('(?1)(?t==30)(?2)'){base}") == 1
    # two disjoint chains: c1@1→c2@3 (gap 2) and c1@100→c2@130 (gap 30)
    assert q(f"SELECT sequenceCount('(?1)(?t<=30)(?2)'){base}") == 2
    assert q(f"SELECT sequenceCount('(?1)(?t<=10)(?2)'){base}") == 1
    assert q(f"SELECT sequenceCount('(?1)(?t<2)(?2)'){base}") == 0

    with pytest.raises(DialectError, match="followed by an event"):
        translate(
            "SELECT sequenceMatch('(?1)(?t>10)')(t, number = 1) FROM seq_tc"
        )
    spark.catalog.dropTempView("seq_tc")
