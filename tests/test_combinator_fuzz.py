"""Round 11 (r10 verdict next #4): fuzz the GENERATED combinator stack.

Round 10 fuzzed string literals through the r9 rewriters; this file fuzzes
the combinator COMPOSITION surface (dialect.py's generic -If machinery and
the -OrNull/-OrDefault chain generator, both spelled in either order) that
is generated, not hand-written: random bases x chain-order x planted group
shapes, each compared against a hand-computed Python oracle implementing
ClickHouse's documented semantics:

- -If keeps exactly the rows where cond IS TRUE (false and NULL drop);
- aggregates skip NULL inputs (CH's Null adapter; for multi-argument
  aggregates a row is skipped when ANY argument is NULL — the argMax docs
  example pins this for the value argument too);
- -OrNull returns NULL when nothing was aggregated; for the count-like
  bases the repo pins the r7 contract: NULL only when zero ROWS reach the
  aggregate (rows-but-all-NULL stays the count-like 0);
- -OrDefault coalesces the numeric type default 0.

The fuzz already earned its keep while being written: it found countIf's
2-argument combinator form mis-arity'd to count_if(x, cond) (analysis
error), count's never-registered -OrNull/-OrDefault If-chains, and
argMax/argMin returning NULL where ClickHouse skips NULL values — all
fixed in the same commit.
"""

from __future__ import annotations

import math
import random
import statistics

import pytest

from mcp_clickhouse_spark.dialect import DialectError, translate

SEED = 1100


# ---------------------------------------------------------------- data ------
def _rows():
    """(g, x, y, w, b, c) rows: planted shapes + seeded random groups.

    y is unique-per-group where non-NULL (argMax/argMin determinism);
    w is positive where non-NULL; b is a small int for the bit aggregates;
    c is the -If condition with a true/false/NULL mix.
    """
    rng = random.Random(SEED)
    rows = []
    # g=1 "nomatch": cond never true (false / NULL only)
    for i in range(6):
        rows.append((1, float(i), 10.0 + i, 1.0, i % 8,
                     False if i % 2 else None))
    # g=2 "allnullx": cond true but x always NULL
    for i in range(5):
        rows.append((2, None, 20.0 + i, 2.0, i % 4, True))
    # g=3 "single": one matching row
    rows.append((3, 7.5, 1.0, 3.0, 5, True))
    # g=4 "uniform": every matching non-NULL x equals 7.0 (pins any/anyLast
    # NULL handling: order-free expected value), with NULL-x matching rows
    # and non-7 rows hidden behind cond=false
    rows += [
        (4, 7.0, 40.0, 1.0, 7, True),
        (4, None, 41.0, 1.0, 7, True),
        (4, 7.0, 42.0, 2.0, 7, True),
        (4, 99.0, 43.0, 9.0, 1, False),
        (4, None, 44.0, 1.0, 7, True),
        (4, 7.0, 45.0, None, 7, True),
    ]
    # g=5..10: seeded random groups with varying NULL density
    for g in range(5, 11):
        n = rng.randint(4, 24)
        null_x = rng.uniform(0.0, 0.5)
        null_w = rng.uniform(0.0, 0.3)
        null_y = rng.uniform(0.0, 0.3)
        for i in range(n):
            x = None if rng.random() < null_x else float(rng.randint(-6, 9))
            y = None if rng.random() < null_y else (g * 100.0 + i * 1.5)
            w = None if rng.random() < null_w else float(rng.randint(1, 5))
            b = rng.randint(0, 15)
            c = rng.choice([True, True, True, False, None])
            rows.append((g, x, y, w, b, c))
    return rows


ROWS = _rows()
GROUPS = sorted({r[0] for r in ROWS})


def _kept(g):
    """Rows of group g where cond IS TRUE (the -If row filter)."""
    return [r for r in ROWS if r[0] == g and r[5] is True]


def _all(g):
    return [r for r in ROWS if r[0] == g]


# ------------------------------------------------------------- oracles ------
def _m(vals, k):
    """k-th central moment (/n, per CH Moments.h)."""
    mu = statistics.fmean(vals)
    return sum((v - mu) ** k for v in vals) / len(vals)


def _quantile_exact(vals, level):
    s = sorted(vals)
    return s[min(int(math.floor(len(s) * level)), len(s) - 1)]


def _percentile(vals, level):
    """Spark percentile / numpy linear interpolation (CH quantile's exact
    small-data behavior)."""
    s = sorted(vals)
    if len(s) == 1:
        return s[0]
    pos = (len(s) - 1) * level
    lo = int(math.floor(pos))
    frac = pos - lo
    return s[lo] + (s[min(lo + 1, len(s) - 1)] - s[lo]) * frac


def _corr(pairs):
    if not pairs:
        return None
    if len(pairs) < 2:
        return float("nan")
    xs, ys = [p[0] for p in pairs], [p[1] for p in pairs]
    vx = _m(xs, 2) * len(xs)
    vy = _m(ys, 2) * len(ys)
    if vx == 0 or vy == 0:
        return float("nan")
    mx, my = statistics.fmean(xs), statistics.fmean(ys)
    cov = sum((a - mx) * (b - my) for a, b in pairs)
    return cov / math.sqrt(vx * vy)


# one-argument bases over the non-NULL x of the kept rows; None = NULL
ONE_ARG = {
    "sum": lambda v: sum(v) if v else None,
    "sumKahan": lambda v: sum(v) if v else None,
    "avg": lambda v: statistics.fmean(v) if v else None,
    "min": lambda v: min(v) if v else None,
    "max": lambda v: max(v) if v else None,
    "median": lambda v: _percentile(v, 0.5) if v else None,
    # fed-but-degenerate sample statistics (n = 1, or zero variance for
    # the moment ratios) are 0/0 = nan in CH's Float64 arithmetic — the
    # round-17 wave-H contract; only a zero-row input keeps NULL
    "stddevSamp": lambda v: (
        statistics.stdev(v) if len(v) >= 2
        else (float("nan") if v else None)
    ),
    "varSamp": lambda v: (
        statistics.variance(v) if len(v) >= 2
        else (float("nan") if v else None)
    ),
    "stddevPop": lambda v: statistics.pstdev(v) if v else None,
    "varPop": lambda v: statistics.pvariance(v) if v else None,
    "uniqExact": lambda v: len(set(v)),
    "count": lambda v: len(v),
    # CH Moments.h: skewSamp = m3 / s^3, kurtSamp = m4 / s^4 with the
    # CENTRAL moments /n and s^2 the SAMPLE variance (r10-pinned)
    "skewPop": lambda v: (
        None if not v
        else _m(v, 3) / _m(v, 2) ** 1.5 if _m(v, 2) > 0
        else float("nan")
    ),
    "kurtPop": lambda v: (
        None if not v
        else _m(v, 4) / _m(v, 2) ** 2 if _m(v, 2) > 0
        else float("nan")
    ),
    "skewSamp": lambda v: (
        None if not v
        else _m(v, 3) / statistics.variance(v) ** 1.5
        if len(v) >= 2 and _m(v, 2) > 0
        else float("nan")
    ),
    "kurtSamp": lambda v: (
        None if not v
        else _m(v, 4) / statistics.variance(v) ** 2
        if len(v) >= 2 and _m(v, 2) > 0
        else float("nan")
    ),
    # empty input folds to a genuine 0.0 (the engine's pinned choice —
    # CH's nan there is not docs-pinned); -OrNull restores NULL via the
    # count-like zero-rows guard
    "entropy": lambda v: (
        -sum(
            (v.count(d) / len(v)) * math.log2(v.count(d) / len(v))
            for d in set(v)
        )
        if v else 0.0
    ),
    "groupArray": lambda v: sorted(v) if v else [],
    "groupUniqArray": lambda v: sorted(set(v)) if v else [],
}
# count-like bases: -OrNull keys on zero ROWS reaching the aggregate, not
# zero non-NULL values (the r7-pinned contract); entropy joins them since
# its fold genuinely returns 0.0 over an empty input
COUNT_LIKE = {"uniqExact", "count", "entropy"}
# array-returning bases: compared as sorted multiset, no -OrNull/-OrDefault
ARRAY_BASES = {"groupArray", "groupUniqArray"}
# n>=2 bases where Spark emits NULL (never 0/NaN) on degenerate input
NO_ORDEFAULT = ARRAY_BASES

BIT_BASES = {
    "groupBitAnd": lambda v: (
        None if not v else math.prod([1]) and _fold(v, lambda a, b: a & b)
    ),
    "groupBitOr": lambda v: None if not v else _fold(v, lambda a, b: a | b),
    "groupBitXor": lambda v: None if not v else _fold(v, lambda a, b: a ^ b),
}


def _fold(vals, fn):
    acc = vals[0]
    for v in vals[1:]:
        acc = fn(acc, v)
    return acc


# two-argument bases over (x, y) / (x, w) pairs where BOTH are non-NULL
TWO_ARG = {
    "corr": ("y", _corr),
    "covarSamp": ("y", lambda p: (
        statistics.covariance([a for a, _ in p], [b for _, b in p])
        if len(p) >= 2 else (float("nan") if p else None)
    )),
    "covarPop": ("y", lambda p: (
        sum(
            (a - statistics.fmean([q[0] for q in p]))
            * (b - statistics.fmean([q[1] for q in p]))
            for a, b in p
        ) / len(p)
        if p else None
    )),
    # zero total weight over a fed input is CH's 0/0 = nan (r16 pin)
    "avgWeighted": ("w", lambda p: (
        None if not p
        else sum(a * b for a, b in p) / sum(b for _, b in p)
        if sum(b for _, b in p) != 0 else float("nan")
    )),
    "argMax": ("y", lambda p: max(p, key=lambda q: q[1])[0] if p else None),
    "argMin": ("y", lambda p: min(p, key=lambda q: q[1])[0] if p else None),
}


def _expected(base, chain, g):
    """Hand-computed oracle for base+chain over group g."""
    kept = _kept(g) if "If" in chain else _all(g)
    rows_reached = len(kept)
    if base in TWO_ARG:
        other_col, fn = TWO_ARG[base]
        idx = {"y": 2, "w": 3}[other_col]
        pairs = [
            (r[1], r[idx]) for r in kept
            if r[1] is not None and r[idx] is not None
        ]
        val = fn(pairs)
    elif base in BIT_BASES:
        v = [r[4] for r in kept if r[4] is not None]
        val = BIT_BASES[base](v)
    else:
        v = [r[1] for r in kept if r[1] is not None]
        val = ONE_ARG[base](v)
    if base in COUNT_LIKE and "OrNull" in chain and rows_reached == 0:
        val = None
    if "OrDefault" in chain and val is None:
        val = 0
    return val


# ---------------------------------------------------------------- fuzz ------
def _spellings(base):
    """Candidate chain spellings for a base, in both stack orders."""
    out = [("", base)]
    for chain in ("If", "OrNull", "OrDefault", "OrNullIf", "IfOrNull",
                  "OrDefaultIf", "IfOrDefault"):
        out.append((chain, base + chain))
    return out


def _sql_for(base, name, chain):
    if base in TWO_ARG:
        other = "y" if TWO_ARG[base][0] == "y" else "w"
        args = f"x, {other}"
    elif base in BIT_BASES:
        args = "b"
    else:
        args = "x"
    if "If" in chain:
        args += ", c"
    return f"{name}({args})"


def _build_cases():
    """Every (base, chain) whose spelling translates — plus a floor
    assertion so silent de-registration can't hollow the fuzz out."""
    cases = []
    for base in list(ONE_ARG) + list(BIT_BASES) + list(TWO_ARG):
        for chain, name in _spellings(base):
            expr = _sql_for(base, name, chain)
            from mcp_clickhouse_spark.dialect import (
                NAME_MAP, PARAMETRIC, TEMPLATES,
            )

            n = name.lower()
            identity = {"min", "max", "sum", "avg", "count"}
            if not (n in NAME_MAP or n in TEMPLATES or n in PARAMETRIC
                    or n in identity):
                # unmapped spelling passes through verbatim and fails
                # analysis loudly (UNRESOLVED_ROUTINE) — the documented
                # contract for unregistered chain orders
                continue
            try:
                translate(f"SELECT {expr} FROM t")
            except DialectError:
                continue
            cases.append((base, chain, expr))
    return cases


CASES = _build_cases()


def test_fuzz_surface_is_wide():
    # every base must resolve bare and with -If; the chain generator must
    # cover most of the rest (a few excluded forms are by design:
    # -OrDefault over array/any-typed bases)
    bases = set(ONE_ARG) | set(BIT_BASES) | set(TWO_ARG)
    have = {(b, c) for b, c, _ in CASES}
    for b in bases:
        assert (b, "") in have, f"{b} does not translate bare"
        assert (b, "If") in have, f"{b}If does not translate"
    assert len(CASES) >= 120, f"only {len(CASES)} combinator spellings resolve"


@pytest.fixture(scope="module")
def fuzz_table(spark):
    df = spark.createDataFrame(
        ROWS, "g int, x double, y double, w double, b int, c boolean"
    )
    df.createOrReplaceTempView("comb_fuzz")
    return df


def _run_batch(spark, exprs):
    sel = ", ".join(
        f"{e} AS r{i}" for i, e in enumerate(exprs)
    )
    ch = f"SELECT g, {sel} FROM comb_fuzz GROUP BY g ORDER BY g"
    return {row["g"]: row for row in spark.sql(translate(ch)).collect()}


def _check(got, want, label):
    if want is None:
        assert got is None, f"{label}: got {got!r}, want NULL"
        return
    if isinstance(want, float) and math.isnan(want):
        # fed-but-degenerate statistic: CH's 0/0 — must be nan, not NULL
        # (and must survive -OrDefault, which only replaces NULL)
        assert isinstance(got, float) and math.isnan(got), (
            f"{label}: got {got!r}, want nan"
        )
        return
    if isinstance(want, list):
        assert got is not None and sorted(got) == want, (
            f"{label}: got {got!r}, want multiset {want!r}"
        )
        return
    assert got is not None and not (
        isinstance(got, float) and math.isnan(got)
    ), f"{label}: got NULL/NaN, want {want!r}"
    assert got == pytest.approx(want, rel=1e-6, abs=1e-9), (
        f"{label}: got {got!r}, want {want!r}"
    )


BATCH = 18


@pytest.mark.parametrize("lo", range(0, len(CASES), BATCH))
def test_combinator_chains_match_python_oracle(spark, fuzz_table, lo):
    batch = CASES[lo : lo + BATCH]
    rows = _run_batch(spark, [e for _, _, e in batch])
    for i, (base, chain, expr) in enumerate(batch):
        for g in GROUPS:
            want = _expected(base, chain, g)
            # degenerate-moment groups: the oracle distinguishes CH's
            # fed-but-degenerate nan from the empty-input NULL (wave H)
            got = rows[g][f"r{i}"]
            _check(got, want, f"{expr} g={g}")


def test_any_anylast_uniform_group(spark, fuzz_table):
    """any/anyLast fuzz on the uniform group (g=4): every matching
    non-NULL x is 7.0, so ANY order-dependence vanishes and the expected
    value is exactly 7.0 — a NULL here is the r11 advisor's HIGH bug
    (last() without ignoreNulls) resurfacing."""
    exprs = [
        "anyIf(x, c)", "anyLastIf(x, c)", "anyOrNullIf(x, c)",
        "anyLastOrNullIf(x, c)", "anyIfOrNull(x, c)", "anyLastIfOrNull(x, c)",
    ]
    rows = _run_batch(spark, exprs)
    for i in range(len(exprs)):
        assert rows[4][f"r{i}"] == 7.0, f"{exprs[i]}: {rows[4][f'r{i}']!r}"
        # nomatch group: all forms NULL
        assert rows[1][f"r{i}"] is None, f"{exprs[i]} g=1"


def test_parametric_if_quantiles(spark, fuzz_table):
    """quantileExactIf / quantileIf(level) against the selection and
    interpolation oracles, across every planted group shape."""
    exprs = [
        "quantileExactIf(0.25)(x, c)", "quantileExactIf(0.75)(x, c)",
        "quantileIf(0.5)(x, c)", "medianIf(x, c)",
    ]
    rows = _run_batch(spark, exprs)
    for g in GROUPS:
        v = [r[1] for r in _kept(g) if r[1] is not None]
        want = [
            _quantile_exact(v, 0.25) if v else None,
            _quantile_exact(v, 0.75) if v else None,
            _percentile(v, 0.5) if v else None,
            _percentile(v, 0.5) if v else None,
        ]
        for i, e in enumerate(exprs):
            _check(rows[g][f"r{i}"], want[i], f"{e} g={g}")


def test_countif_both_arities(spark, fuzz_table):
    """countIf(cond) counts matching rows; countIf(x, cond) counts
    non-NULL x among them (the round-11 arity fix)."""
    rows = _run_batch(spark, ["countIf(c)", "countIf(x, c)"])
    for g in GROUPS:
        kept = _kept(g)
        assert rows[g]["r0"] == len(kept), f"countIf(c) g={g}"
        want = len([r for r in kept if r[1] is not None])
        assert rows[g]["r1"] == want, f"countIf(x, c) g={g}"


# ------------------------- -ForEach / -Map / -Distinct stacks ---------------
def _cf_rows():
    """(g, xs, m, x, c) rows with NULL arrays/maps, ragged lengths, and a
    true/false/NULL condition mix — seeded, covering empty-after-filter
    and all-NULL group shapes."""
    rng = random.Random(1101)
    rows = []
    for g in range(1, 7):
        n = rng.randint(3, 12)
        for i in range(n):
            if rng.random() < 0.2:
                xs = None
            else:
                xs = [rng.randint(-4, 9) for _ in range(rng.randint(0, 5))]
            if rng.random() < 0.2:
                m = None
            else:
                m = {
                    k: rng.randint(1, 9)
                    for k in rng.sample(["a", "b", "c", "d"], rng.randint(0, 3))
                }
            x = None if rng.random() < 0.3 else float(rng.randint(0, 5))
            c = rng.choice([True, True, False, None])
            rows.append((g, xs, m, x, c))
    # planted: group with zero matching rows
    rows += [(7, [1, 2], {"a": 1}, 1.0, False), (7, [3], {"b": 2}, 2.0, None)]
    return rows


CF_ROWS = _cf_rows()


@pytest.fixture(scope="module")
def stack_table(spark):
    df = spark.createDataFrame(
        CF_ROWS,
        "g int, xs array<int>, m map<string,int>, x double, c boolean",
    )
    df.createOrReplaceTempView("comb_fuzz_stacks")
    return df


def _foreach_oracle(arrays, fn, count=False):
    """CH -ForEach: element i aggregated over the arrays that HAVE an
    element i; result length = max input length.  A group with NO arrays
    returns NULL (the engine's documented delta — CH gives [])."""
    arrays = [a for a in arrays if a is not None]
    if not arrays:
        return None
    width = max(len(a) for a in arrays)
    out = []
    for i in range(width):
        vals = [a[i] for a in arrays if len(a) > i]
        out.append(len(vals) if count else fn(vals))
    return out


def _map_oracle(maps, fn, count=False):
    maps = [m for m in maps if m is not None]
    keys = sorted({k for m in maps for k in m})
    return {
        k: (
            len([m[k] for m in maps if k in m])
            if count
            else fn([m[k] for m in maps if k in m])
        )
        for k in keys
    }


def test_foreach_map_distinct_if_stacks(spark, stack_table):
    """sumForEachIf / sumMapIf / sumDistinctIf and friends (round 11 —
    previously unmapped passthroughs) against Python oracles over the
    kept (cond IS TRUE) rows."""
    exprs = [
        "sumForEachIf(xs, c)", "minForEachIf(xs, c)", "maxForEachIf(xs, c)",
        "countForEachIf(xs, c)",
        "sumMapIf(m, c)", "minMapIf(m, c)", "maxMapIf(m, c)",
        "countMapIf(m, c)", "uniqExactMapIf(m, c)",
        "sumDistinctIf(x, c)", "avgDistinctIf(x, c)",
        "groupArrayDistinctIf(x, c)",
    ]
    sel = ", ".join(f"{e} AS r{i}" for i, e in enumerate(exprs))
    ch = f"SELECT g, {sel} FROM comb_fuzz_stacks GROUP BY g ORDER BY g"
    rows = {r["g"]: r for r in spark.sql(translate(ch)).collect()}
    by_g = {}
    for g, xs, m, x, c in CF_ROWS:
        if c is True:
            by_g.setdefault(g, []).append((xs, m, x))
    for g in sorted({r[0] for r in CF_ROWS}):
        kept = by_g.get(g, [])
        arrays = [t[0] for t in kept]
        maps = [t[1] for t in kept]
        vals = sorted({t[2] for t in kept if t[2] is not None})
        got = rows[g]
        assert got["r0"] == _foreach_oracle(arrays, sum), f"sumForEachIf g={g}"
        assert got["r1"] == _foreach_oracle(arrays, min), f"minForEachIf g={g}"
        assert got["r2"] == _foreach_oracle(arrays, max), f"maxForEachIf g={g}"
        assert got["r3"] == _foreach_oracle(arrays, sum, count=True), (
            f"countForEachIf g={g}"
        )
        assert got["r4"] == _map_oracle(maps, sum), f"sumMapIf g={g}"
        assert got["r5"] == _map_oracle(maps, min), f"minMapIf g={g}"
        assert got["r6"] == _map_oracle(maps, max), f"maxMapIf g={g}"
        assert got["r7"] == _map_oracle(maps, sum, count=True), (
            f"countMapIf g={g}"
        )
        assert got["r8"] == _map_oracle(
            maps, lambda v: len(set(v))
        ), f"uniqExactMapIf g={g}"
        want_sd = sum(vals) if vals else None
        _check(got["r9"], want_sd, f"sumDistinctIf g={g}")
        want_ad = statistics.fmean(vals) if vals else None
        _check(got["r10"], want_ad, f"avgDistinctIf g={g}")
        assert sorted(got["r11"] or []) == vals, f"groupArrayDistinctIf g={g}"


def test_distinct_bare_matches_oracle(spark, stack_table):
    rows = {
        r["g"]: r
        for r in spark.sql(
            translate(
                "SELECT g, sumDistinct(x) AS sd, countDistinct(x) AS cd"
                " FROM comb_fuzz_stacks GROUP BY g ORDER BY g"
            )
        ).collect()
    }
    for g in sorted({r[0] for r in CF_ROWS}):
        vals = {t[3] for t in CF_ROWS if t[0] == g and t[3] is not None}
        _check(rows[g]["sd"], sum(vals) if vals else None, f"sumDistinct g={g}")
        assert rows[g]["cd"] == len(vals), f"countDistinct g={g}"


def test_parametric_quantile_ornull_chains(spark, fuzz_table):
    """quantileOrNull / quantileExactOrNull(p) / both If-chain orders
    (round 11 — previously unmapped passthroughs): identity over the
    already-NULL-on-empty quantile translations."""
    exprs = [
        "quantileOrNull(x)", "quantileExactOrNull(0.25)(x)",
        "quantileIfOrNull(0.5)(x, c)", "quantileOrNullIf(0.5)(x, c)",
        "quantileExactOrNullIf(0.75)(x, c)",
        "quantileExactIfOrNull(0.75)(x, c)",
    ]
    rows = _run_batch(spark, exprs)
    for g in GROUPS:
        allv = [r[1] for r in _all(g) if r[1] is not None]
        kept = [r[1] for r in _kept(g) if r[1] is not None]
        want = [
            _percentile(allv, 0.5) if allv else None,
            _quantile_exact(allv, 0.25) if allv else None,
            _percentile(kept, 0.5) if kept else None,
            _percentile(kept, 0.5) if kept else None,
            _quantile_exact(kept, 0.75) if kept else None,
            _quantile_exact(kept, 0.75) if kept else None,
        ]
        for i, e in enumerate(exprs):
            _check(rows[g][f"r{i}"], want[i], f"{e} g={g}")


def test_topk_if_raises_the_guided_error():
    # the -If chain composes into topK's guided error instead of the old
    # raw unmapped passthrough
    with pytest.raises(DialectError, match="operators.topk"):
        translate("SELECT topKIf(2)(x, c) FROM t")


def test_parametric_quantile_ordefault_and_quantiles_ornull(spark, fuzz_table):
    """round 11: quantileOrDefault coalesces the numeric default 0; the
    ARRAY-returning quantilesOrNull yields a NULL array (not an array of
    NULLs) when nothing was aggregated."""
    exprs = [
        "quantileOrDefault(x)", "quantileOrDefaultIf(0.5)(x, c)",
        "quantilesOrNull(0.25, 0.75)(x)", "quantilesIfOrNull(0.5)(x, c)",
    ]
    rows = _run_batch(spark, exprs)
    for g in GROUPS:
        allv = [r[1] for r in _all(g) if r[1] is not None]
        kept = [r[1] for r in _kept(g) if r[1] is not None]
        _check(rows[g]["r0"], _percentile(allv, 0.5) if allv else 0,
               f"quantileOrDefault g={g}")
        _check(rows[g]["r1"], _percentile(kept, 0.5) if kept else 0,
               f"quantileOrDefaultIf g={g}")
        if allv:
            want = [_percentile(allv, 0.25), _percentile(allv, 0.75)]
            got = rows[g]["r2"]
            assert got is not None and [
                pytest.approx(w, rel=1e-9) for w in want
            ] == got, f"quantilesOrNull g={g}"
        else:
            assert rows[g]["r2"] is None, f"quantilesOrNull g={g}"
        if kept:
            assert rows[g]["r3"] == [
                pytest.approx(_percentile(kept, 0.5), rel=1e-9)
            ], f"quantilesIfOrNull g={g}"
        else:
            assert rows[g]["r3"] is None, f"quantilesIfOrNull g={g}"


def test_array_combinator_and_interval_tuple_closures(spark):
    rows = spark.sql(translate(
        "SELECT groupArrayArray(xs) AS gaa, groupUniqArrayArray(xs) AS gua,"
        " firstLine(concat('ab', char(10), 'cd')) AS fl,"
        " subtractTupleOfIntervals(toDate('2024-03-31'),"
        "   (INTERVAL 1 MONTH, INTERVAL 1 DAY)) AS sub"
        " FROM (SELECT array(1, 2, 2) AS xs UNION ALL SELECT array(2, 3))"
    )).collect()[0]
    assert sorted(rows.gaa) == [1, 2, 2, 2, 3]
    assert sorted(rows.gua) == [1, 2, 3]
    assert rows.fl == "ab"
    assert str(rows.sub) == "2024-02-28"


def test_nanoseconds_guided():
    with pytest.raises(DialectError, match="addMicroseconds"):
        translate("SELECT addNanoseconds(t, 5) FROM x")
