"""Round 9 (r8 verdict next #4): the sorted-fold aggregate family
(windowFunnel, sequenceMatch/Count, the hypothesis tests, EMA, LTTB)
buffers one group's kept rows in a single aggregate buffer — correct, and
exactly ClickHouse's own memory model, but a group with unbounded event
counts will not fit at 100× scale.  translate() must surface that as a
PerGroupBufferWarning with concrete guidance (pre-filter / pre-window),
and plain aggregates must NOT warn."""

from __future__ import annotations

import warnings

import pytest

from mcp_clickhouse_spark.dialect import PerGroupBufferWarning, translate


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT windowFunnel(60)(ts, a, b) FROM t GROUP BY u",
        "SELECT sequenceMatch('(?1)(?2)')(ts, a, b) FROM t GROUP BY u",
        "SELECT sequenceCount('(?1)(?2)')(ts, a, b) FROM t GROUP BY u",
        "SELECT mannWhitneyUTest(v, g) FROM t",
        "SELECT welchTTest(v, g) FROM t",
        "SELECT kolmogorovSmirnovTest(v, g) FROM t",
        "SELECT exponentialMovingAverage(10)(v, ts) FROM t GROUP BY u",
        "SELECT largestTriangleThreeBuckets(7)(x, y) FROM t",
    ],
)
def test_sorted_fold_aggregates_warn(sql):
    with pytest.warns(PerGroupBufferWarning, match="pre-window"):
        translate(sql)


def test_plain_aggregates_do_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error", PerGroupBufferWarning)
        translate("SELECT count(), sum(x), quantile(0.9)(x) FROM t GROUP BY u")
        translate("SELECT groupArray(x), uniqExact(x) FROM t GROUP BY u")
