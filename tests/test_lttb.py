"""largestTriangleThreeBuckets — cross-checked against a pure-Python
reference implementing the identical convention (Steinarsson's thesis
algorithm: first/last kept, floor bucket boundaries with the last bucket
pinned to N−1, next-bucket centroid, first maximal area wins ties).

The SQL expression and this reference share IEEE-double arithmetic and
evaluation order (sequential centroid sums, identical area formula), so
comparison is exact — no tolerance needed.
"""

import math
import random

import pytest

from mcp_clickhouse_spark.dialect import translate


def lttb_ref(points, n):
    pts = sorted(points)
    big_n = len(pts)
    if n <= 0:
        return []
    if n == 1:
        return pts[:1]
    if n == 2:
        return pts if big_n <= 2 else [pts[0], pts[-1]]
    if big_n <= n:
        return pts
    nb = n - 2
    sz = (big_n - 2) / nb
    sel = [pts[0]]
    px, py = pts[0]
    for bi in range(1, nb + 1):
        lo = 2 + math.floor((bi - 1) * sz)  # 1-based
        hi = (big_n - 1) if bi == nb else 1 + math.floor(bi * sz)
        if bi == nb:
            ax, ay = pts[-1]
        else:
            hi2 = (
                (big_n - 1)
                if bi == nb - 1
                else 1 + math.floor((bi + 1) * sz)
            )
            nxt = pts[hi:hi2]  # 0-based slice == 1-based (hi+1 .. hi2)
            sx = sy = 0.0
            for q in nxt:
                sx += q[0]
                sy += q[1]
            ax, ay = sx / len(nxt), sy / len(nxt)
        best, ba = None, -1.0
        for q in pts[lo - 1 : hi]:
            area = abs((px - ax) * (q[1] - py) - (px - q[0]) * (ay - py))
            if area > ba:
                best, ba = q, area
        sel.append(best)
        px, py = best
    sel.append(pts[-1])
    return sel


def _spark_lttb(spark, points, n):
    rows = [(float(x), float(y)) for x, y in points]
    spark.createDataFrame(rows, "x double, y double").createOrReplaceTempView(
        "lttb_t"
    )
    sql = translate(
        f"SELECT largestTriangleThreeBuckets({n})(x, y) AS pts FROM lttb_t"
    )
    out = spark.sql(sql).collect()[0].pts
    return [(p._1, p._2) for p in out]


def test_lttb_vs_reference_random(spark):
    rng = random.Random(42)
    for case in range(6):
        big_n = rng.choice([9, 25, 61, 100])
        pts = [
            (rng.uniform(0, 1000), rng.uniform(-50, 50)) for _ in range(big_n)
        ]
        n = rng.choice([3, 4, 7, 12])
        assert _spark_lttb(spark, pts, n) == lttb_ref(pts, n), (case, n)


def test_lttb_tied_x_and_edges(spark):
    rng = random.Random(7)
    # duplicate x values: the (x, y) struct sort breaks ties identically
    pts = [(float(i % 10), float(rng.randint(-5, 5))) for i in range(40)]
    assert _spark_lttb(spark, pts, 5) == lttb_ref(pts, 5)
    # N <= n returns every point, sorted
    small = [(3.0, 1.0), (1.0, 2.0), (2.0, 0.0)]
    assert _spark_lttb(spark, small, 8) == sorted(small)
    # n edge values
    assert _spark_lttb(spark, small, 2) == [(1.0, 2.0), (3.0, 1.0)]
    assert _spark_lttb(spark, small, 1) == [(1.0, 2.0)]
    assert _spark_lttb(spark, small, 0) == []


def test_lttb_keeps_extremes_shape(spark):
    # a spike must survive aggressive downsampling — the point of LTTB
    pts = [(float(i), 0.0) for i in range(100)]
    pts[57] = (57.0, 1000.0)
    out = _spark_lttb(spark, pts, 10)
    assert len(out) == 10
    assert out[0] == (0.0, 0.0) and out[-1] == (99.0, 0.0)
    assert (57.0, 1000.0) in out


def test_lttb_param_required():
    with pytest.raises(ValueError, match="bucket-count"):
        translate("SELECT largestTriangleThreeBuckets(x, y) FROM t")
    with pytest.raises(ValueError, match="integer literal"):
        translate("SELECT largestTriangleThreeBuckets(k)(x, y) FROM t")
