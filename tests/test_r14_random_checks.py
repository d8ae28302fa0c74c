"""Round-14 randomized cross-checks — seeded random vectors compared
against INDEPENDENT pure-Python reconstructions (never the dialect's own
expressions).  The r13 round-trip method caught the same-letter
pattern-merge bug that hand-picked vectors missed; these cover the
round-14 surfaces: formatReadableTimeDelta's unit decomposition + the
" and " separator, toDayOfWeek's four modes, the weighted array
Levenshtein, and xor's chained fold.
"""

import random
from datetime import date, timedelta

import pytest

from mcp_clickhouse_spark.dialect import translate
from mcp_clickhouse_spark.functions.strdist import (
    levenshtein_seq,
    levenshtein_seq_weighted,
)

# CH's documented unit constants (365-day years, 30.5-day months)
_UNITS = [
    ("years", "year", 31536000.0),
    ("months", "month", 2635200.0),
    ("days", "day", 86400.0),
    ("hours", "hour", 3600.0),
    ("minutes", "minute", 60.0),
    ("seconds", "second", 1.0),
]


def _py_time_delta(value: float) -> str:
    """Independent formatReadableTimeDelta: floor-divide the remainder
    per unit largest→smallest, ', '-join with ' and ' before the last."""
    rem = abs(float(value))
    parts = []
    for many, one, sz in _UNITS:
        n = int(rem // sz)
        if n > 0:
            parts.append(f"{n} {one if n == 1 else many}")
        rem -= n * sz
    if not parts:
        return "0 seconds"
    sign = "-" if value < 0 else ""
    if len(parts) == 1:
        return sign + parts[0]
    return sign + ", ".join(parts[:-1]) + " and " + parts[-1]


def test_format_readable_time_delta_random(spark):
    rng = random.Random(1414)
    vals = (
        [0, 1, 59, 60, 61, 3599, 3600, 86399, 86400, -100, 7850]
        + [rng.randint(-10**7, 10**9) for _ in range(80)]
    )
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v long"
    ).createOrReplaceTempView("t_rtd")
    rows = spark.sql(
        translate(
            "SELECT i, formatReadableTimeDelta(v) AS s FROM t_rtd"
        )
    ).collect()
    got = {r.i: r.s for r in rows}
    for i, v in enumerate(vals):
        assert got[i] == _py_time_delta(v), (v, got[i])


def test_todayofweek_modes_random(spark):
    rng = random.Random(1415)
    days = [date(1970, 1, 1) + timedelta(days=rng.randint(0, 40000))
            for _ in range(60)]
    spark.createDataFrame(
        [(i, d.isoformat()) for i, d in enumerate(days)], "i int, d string"
    ).createOrReplaceTempView("t_dow")
    rows = spark.sql(
        translate(
            "SELECT i, toDayOfWeek(toDate(d)) AS m0,"
            " toDayOfWeek(toDate(d), 1) AS m1,"
            " toDayOfWeek(toDate(d), 2) AS m2,"
            " toDayOfWeek(toDate(d), 3) AS m3 FROM t_dow"
        )
    ).collect()
    got = {r.i: (r.m0, r.m1, r.m2, r.m3) for r in rows}
    for i, d in enumerate(days):
        wd = d.weekday()  # Monday=0..Sunday=6 — independent reference
        exp = (
            wd + 1,            # mode 0: Monday=1..Sunday=7
            wd,                # mode 1: Monday=0..Sunday=6
            (wd + 1) % 7,      # mode 2: Sunday=0..Saturday=6
            (wd + 1) % 7 + 1,  # mode 3: Sunday=1..Saturday=7
        )
        assert got[i] == exp, (d, got[i], exp)


def _py_weighted_lev_ref(a, b, wa, wb, memo=None):
    """Independent recursive-memo weighted Levenshtein (not the DP in
    strdist.py): delete costs wa[i], insert wb[j], substitute their sum."""
    if memo is None:
        memo = {}

    def go(i, j):
        if (i, j) in memo:
            return memo[(i, j)]
        if i == len(a):
            r = sum(wb[j:])
        elif j == len(b):
            r = sum(wa[i:])
        else:
            best = go(i + 1, j) + wa[i]
            best = min(best, go(i, j + 1) + wb[j])
            sub = 0.0 if a[i] == b[j] else wa[i] + wb[j]
            best = min(best, go(i + 1, j + 1) + sub)
            r = best
        memo[(i, j)] = r
        return r

    return go(0, 0)


def test_weighted_levenshtein_random():
    rng = random.Random(1416)
    for _ in range(200):
        la, lb = rng.randint(0, 8), rng.randint(0, 8)
        a = [rng.randint(0, 3) for _ in range(la)]
        b = [rng.randint(0, 3) for _ in range(lb)]
        wa = [round(rng.uniform(0.5, 5.0), 2) for _ in range(la)]
        wb = [round(rng.uniform(0.5, 5.0), 2) for _ in range(lb)]
        got = levenshtein_seq_weighted(a, b, wa, wb)
        exp = _py_weighted_lev_ref(a, b, wa, wb)
        assert got == pytest.approx(exp), (a, b, wa, wb)
        # uniform weights halve to the plain distance (sub = 1+1 = 2,
        # del/ins = 1): check the well-known bound relationship instead
        # of equality — plain lev uses sub cost 1, weighted uses 2
    # uniform-weight special case: with all weights 1 the weighted
    # distance equals ins+del-only edit distance; cross-check a few
    for _ in range(50):
        la, lb = rng.randint(0, 8), rng.randint(0, 8)
        a = [rng.randint(0, 2) for _ in range(la)]
        b = [rng.randint(0, 2) for _ in range(lb)]
        got = levenshtein_seq_weighted(a, b, [1.0] * la, [1.0] * lb)
        exp = _py_weighted_lev_ref(a, b, [1.0] * la, [1.0] * lb)
        assert got == pytest.approx(exp)
        # and it is bounded below by the plain Levenshtein
        assert got >= levenshtein_seq(a, b) - 1e-9


def _mysql_calc_week(d: date, mode: int, year_week: bool):
    """Independent Python port of MySQL's calc_week (sql/time.cc) with
    ClickHouse's 8/9 extension — the reference the SQL formulation in
    dialect._week_mode_expr is checked against.  Returns (year, week);
    week 0 means 'before week 1' for the 0-53 modes."""
    if mode in (8, 9):
        monday_first = mode == 9
        week_year, rule = True, "C"
    else:
        monday_first = bool(mode & 1)
        week_year = bool(mode & 2)
        fw = bool(mode & 4) != (not monday_first)
        rule = "A" if fw else "B"
    if year_week:
        week_year = True
    f_wd = 0 if monday_first else 6  # Python weekday(): Monday=0

    def w1(y):
        jan1 = date(y, 1, 1)
        if rule == "A":
            return jan1 + timedelta((f_wd - jan1.weekday()) % 7)
        anchor = date(y, 1, 4) if rule == "B" else jan1
        return anchor - timedelta((anchor.weekday() - f_wd) % 7)

    y = d.year
    if d < w1(y):
        if not week_year:
            return y, 0
        return y - 1, (d - w1(y - 1)).days // 7 + 1
    if week_year and d >= w1(y + 1):
        return y + 1, 1
    return y, (d - w1(y)).days // 7 + 1


def test_toweek_modes_random(spark):
    """Every mode 0-9 over 40 random dates + the year-boundary corner
    dates, toWeek AND toYearWeek, against the independent MySQL
    calc_week port — plus ISO mode 3 cross-checked against Python's
    own isocalendar()."""
    rng = random.Random(1419)
    days = [date(1970, 1, 1) + timedelta(days=rng.randint(0, 40000))
            for _ in range(40)]
    days += [date(y, m, dd) for y in (2015, 2016, 2017, 2021, 2022)
             for m, dd in ((1, 1), (1, 2), (12, 30), (12, 31))]
    spark.createDataFrame(
        [(i, d.isoformat()) for i, d in enumerate(days)], "i int, d string"
    ).createOrReplaceTempView("t_twk")
    sel = ", ".join(
        f"toWeek(toDate(d), {m}) AS w{m},"
        f" toYearWeek(toDate(d), {m}) AS yw{m}"
        for m in range(10)
    )
    got = {
        r.i: r.asDict()
        for r in spark.sql(
            translate(f"SELECT i, {sel} FROM t_twk")
        ).collect()
    }
    for i, d in enumerate(days):
        for m in range(10):
            _, wk = _mysql_calc_week(d, m, year_week=False)
            yy, ywk = _mysql_calc_week(d, m, year_week=True)
            assert got[i][f"w{m}"] == wk, (d, m, got[i][f"w{m}"], wk)
            assert got[i][f"yw{m}"] == yy * 100 + ywk, (d, m)
        # ISO sanity: mode 3 must equal Python's isocalendar
        iso = d.isocalendar()
        assert got[i]["w3"] == iso[1], (d, got[i]["w3"], iso)
        assert got[i]["yw3"] == iso[0] * 100 + iso[1], (d,)


def test_logical_fn_rewrite_fuzz(spark):
    """Fuzz the and()/or()/not() pre-pass: random boolean expressions
    mixing FUNCTION spellings with OPERATOR spellings (including the
    collision shapes `x AND (y)` / `BETWEEN a AND (b)`), evaluated in
    Spark after translate() and compared against Python's evaluation of
    the same expression tree — operator hijack or mis-parenthesization
    shows up as a value mismatch or an analysis error."""
    rng = random.Random(1418)

    def gen(depth, need_bool=False):
        """Returns (ch_sql, python_lambda over dict row).  need_bool
        forces a BOOLEAN-typed expression — Spark's bare AND/OR
        operators don't coerce ints (CH does; that operator-operand
        coercion is out of scope for the pre-pass, which only maps the
        FUNCTION spellings)."""
        if depth == 0:
            v = rng.choice(["a", "b", "c", "0", "1"])
            if need_bool:
                if v in "01":
                    return (f"({v} = 1)",
                            lambda row, k=int(v): k == 1)
                return (f"({v} = 1)",
                        lambda row, k=v: row[k] == 1)
            if v in "01":
                return v, (lambda row, k=int(v): bool(k))
            return v, (lambda row, k=v: bool(row[k]))
        kind = rng.randrange(6)
        child_bool = kind in (3, 4)
        l_sql, l_fn = gen(depth - 1, need_bool=child_bool)
        r_sql, r_fn = gen(depth - 1, need_bool=child_bool)
        if kind == 0:
            return (f"and({l_sql}, {r_sql})",
                    lambda row: l_fn(row) and r_fn(row))
        if kind == 1:
            return (f"or({l_sql}, {r_sql})",
                    lambda row: l_fn(row) or r_fn(row))
        if kind == 2:
            return f"not({l_sql})", (lambda row: not l_fn(row))
        if kind == 3:  # operator spelling with parenthesized operand
            return (f"({l_sql}) AND ({r_sql})",
                    lambda row: l_fn(row) and r_fn(row))
        if kind == 4:
            return (f"{l_sql} OR ({r_sql})",
                    lambda row: l_fn(row) or r_fn(row))
        return (f"xor({l_sql}, {r_sql})",
                lambda row: l_fn(row) != r_fn(row))

    rows_data = [
        {"i": i, "a": rng.randint(0, 1), "b": rng.randint(0, 1),
         "c": rng.randint(0, 1)}
        for i in range(16)
    ]
    spark.createDataFrame(
        [(r["i"], r["a"], r["b"], r["c"]) for r in rows_data],
        "i int, a int, b int, c int",
    ).createOrReplaceTempView("t_lf")
    for _ in range(40):
        sql_expr, py_fn = gen(rng.randint(1, 3))
        t = translate(
            f"SELECT i, CAST({sql_expr} AS Int32) AS v FROM t_lf"
        )
        got = {r.i: r.v for r in spark.sql(t).collect()}
        for row in rows_data:
            assert got[row["i"]] == int(py_fn(row)), (sql_expr, row)


def test_date_arithmetic_wide_range_vs_duckdb(spark):
    """Randomized date arithmetic over 1920-2180 (the driver oracles
    only exercise the 1992-1998 orders dates, so Feb-29 clamping and
    century corners were uncovered) — Spark-translated CH expressions
    vs DuckDB as the independent engine: addMonths/addYears month-end
    clamping, dateDiff boundary-crossing units, toStartOf* family,
    toLastDayOfMonth."""
    import duckdb

    rng = random.Random(1420)
    days = [date(1920, 1, 1) + timedelta(days=rng.randint(0, 95000))
            for _ in range(60)]
    days += [date(2024, 2, 29), date(2023, 1, 31), date(2000, 2, 29),
             date(2100, 2, 28), date(1999, 12, 31)]
    ks = [rng.randint(-30, 30) for _ in days]
    spark.createDataFrame(
        [(i, d.isoformat(), k) for i, (d, k) in enumerate(zip(days, ks))],
        "i int, d string, k int",
    ).createOrReplaceTempView("t_dar")
    got = {
        r.i: r
        for r in spark.sql(translate(
            "SELECT i,"
            " toString(addMonths(toDate(d), k)) AS am,"
            " toString(addYears(toDate(d), k)) AS ay,"
            " toString(addWeeks(toDate(d), k)) AS aw,"
            " toString(subtractDays(toDate(d), k)) AS sd,"
            " dateDiff('month', toDate('2000-06-15'), toDate(d)) AS dm,"
            " dateDiff('year', toDate('2000-06-15'), toDate(d)) AS dy,"
            " dateDiff('day', toDate('2000-06-15'), toDate(d)) AS dd,"
            " toString(toStartOfMonth(toDate(d))) AS som,"
            " toString(toStartOfQuarter(toDate(d))) AS soq,"
            " toString(toStartOfYear(toDate(d))) AS soy,"
            " toString(toLastDayOfMonth(toDate(d))) AS ldm"
            " FROM t_dar"
        )).collect()
    }
    con = duckdb.connect()
    for i, (d, k) in enumerate(zip(days, ks)):
        exp = con.sql(
            f"SELECT CAST(DATE '{d}' + to_months({k}) AS DATE),"
            f" CAST(DATE '{d}' + to_years({k}) AS DATE),"
            f" CAST(DATE '{d}' + to_days({7 * k}) AS DATE),"
            f" CAST(DATE '{d}' - to_days({k}) AS DATE),"
            f" date_diff('month', DATE '2000-06-15', DATE '{d}'),"
            f" date_diff('year', DATE '2000-06-15', DATE '{d}'),"
            f" date_diff('day', DATE '2000-06-15', DATE '{d}'),"
            f" date_trunc('month', DATE '{d}'),"
            f" date_trunc('quarter', DATE '{d}'),"
            f" date_trunc('year', DATE '{d}'),"
            f" last_day(DATE '{d}')"
        ).fetchone()
        g = got[i]
        assert g.am == str(exp[0]), ("addMonths", d, k, g.am, exp[0])
        assert g.ay == str(exp[1]), ("addYears", d, k, g.ay, exp[1])
        assert g.aw == str(exp[2]), ("addWeeks", d, k)
        assert g.sd == str(exp[3]), ("subtractDays", d, k)
        assert g.dm == exp[4], ("dateDiff month", d, g.dm, exp[4])
        assert g.dy == exp[5], ("dateDiff year", d)
        assert g.dd == exp[6], ("dateDiff day", d)
        assert g.som == str(exp[7]) and g.soq == str(exp[8])
        assert g.soy == str(exp[9]) and g.ldm == str(exp[10])


def test_string_functions_random_vs_duckdb(spark):
    """Randomized string-function audit vs DuckDB over random ASCII
    strings — families where CH and DuckDB semantics provably coincide
    (pad truncation, 1-based position, replaceAll, positive-offset
    substring, trim, repeat, reverse, splitByChar element counts).
    Catches argument-order or off-by-one translation bugs that
    hand-picked vectors miss."""
    import duckdb

    rng = random.Random(1421)
    alphabet = "abcXYZ 019_,;-"
    vals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(50)
    ]
    spark.createDataFrame(
        [(i, v, rng.randint(1, 9), rng.randint(1, 5))
         for i, v in enumerate(vals)],
        "i int, s string, n int, m int",
    ).createOrReplaceTempView("t_sfr")
    df = spark.sql(translate(
        "SELECT i, s, n, m,"
        " leftPad(s, n, '*') AS lp, rightPad(s, n, '*') AS rp,"
        " position(s, 'a') AS pos,"
        " replaceAll(s, 'a', 'QQ') AS rep,"
        " substring(s, m, n) AS sub,"
        " trimBoth(s) AS tb,"
        " repeat(s, 2) AS rpt, reverse(s) AS rev,"
        " length(splitByChar(',', s)) AS spl,"
        " lower(s) AS lo, upper(s) AS up"
        " FROM t_sfr"
    ))
    got = {r.i: r for r in df.collect()}
    con = duckdb.connect()
    for i, v in enumerate(vals):
        g = got[i]
        exp = con.execute(
            "SELECT lpad(?, ?, '*'), rpad(?, ?, '*'),"
            " coalesce(position('a' IN ?), 0),"
            " replace(?, 'a', 'QQ'), substring(?, ?, ?),"
            " trim(?), repeat(?, 2), reverse(?),"
            " len(string_split(?, ',')), lower(?), upper(?)",
            [v, g.n, v, g.n, v, v, v, g.m, g.n, v, v, v, v, v, v],
        ).fetchone()
        assert g.lp == exp[0] and g.rp == exp[1], (v, g.n)
        assert g.pos == exp[2], ("position", v, g.pos, exp[2])
        assert g.rep == exp[3], ("replaceAll", v)
        assert g.sub == exp[4], ("substring", v, g.m, g.n, g.sub, exp[4])
        assert g.tb == exp[5] and g.rpt == exp[6] and g.rev == exp[7]
        assert g.spl == exp[8], ("splitByChar", v, g.spl, exp[8])
        assert g.lo == exp[9] and g.up == exp[10]


def test_url_functions_random_vs_urllib(spark):
    """Randomized URL-function audit against Python's urllib.parse as
    the independent reference, over generated well-formed http(s) URLs
    (host/port/path/query/fragment combinations)."""
    from urllib.parse import parse_qs, urlsplit

    rng = random.Random(1422)
    hosts = ["example.com", "www.shop.example.co.uk", "a.b.cdn.net",
             "localhost", "sub.domain.io"]
    urls = []
    for _ in range(40):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(hosts)
        port = rng.choice(["", f":{rng.randint(80, 9999)}"])
        segs = rng.randint(0, 3)
        path = "".join(
            f"/p{rng.randint(0, 9)}" for _ in range(segs)
        ) or "/"
        nq = rng.randint(0, 3)
        query = "&".join(
            f"k{j}=v{rng.randint(0, 9)}" for j in range(nq)
        )
        frag = rng.choice(["", "#sec1", "#x"])
        urls.append(
            f"{scheme}://{host}{port}{path}"
            + (f"?{query}" if query else "") + frag
        )
    spark.createDataFrame(
        list(enumerate(urls)), "i int, u string"
    ).createOrReplaceTempView("t_url")
    got = {
        r.i: r
        for r in spark.sql(translate(
            "SELECT i, protocol(u) AS pr, domain(u) AS dom,"
            " path(u) AS pa, queryString(u) AS qs, fragment(u) AS fr,"
            " extractURLParameter(u, 'k0') AS p0,"
            " cutQueryString(u) AS cq"
            " FROM t_url"
        )).collect()
    }
    for i, u in enumerate(urls):
        sp = urlsplit(u)
        g = got[i]
        assert g.pr == sp.scheme, (u, g.pr)
        assert g.dom == sp.hostname, (u, g.dom, sp.hostname)
        assert g.pa == sp.path, (u, g.pa, sp.path)
        assert g.qs == sp.query, (u, g.qs, sp.query)
        assert g.fr == sp.fragment, (u, g.fr, sp.fragment)
        exp_p0 = parse_qs(sp.query).get("k0", [""])[0]
        assert g.p0 == exp_p0, (u, g.p0, exp_p0)
        # cutQueryString removes ?query but keeps #fragment (CH contract)
        exp_cq = u.replace(f"?{sp.query}", "") if sp.query else u
        assert g.cq == exp_cq, (u, g.cq, exp_cq)


def test_json_functions_random_vs_python(spark):
    """Randomized JSON-extraction audit against Python's json module as
    the independent reference, over generated nested documents:
    JSONExtractInt/Float/String/Bool, JSONHas, JSONLength,
    JSONArrayLength, JSONExtractKeys, JSONType."""
    import json as pyjson

    rng = random.Random(1423)

    def gen_doc():
        doc = {}
        for j in range(rng.randint(1, 4)):
            kind = rng.randrange(5)
            k = f"k{j}"
            if kind == 0:
                doc[k] = rng.randint(-1000, 1000)
            elif kind == 1:
                doc[k] = round(rng.uniform(-10, 10), 3)
            elif kind == 2:
                doc[k] = rng.choice(["alpha", "béta", "x y", ""])
            elif kind == 3:
                doc[k] = rng.choice([True, False])
            else:
                doc[k] = [rng.randint(0, 9) for _ in range(rng.randint(0, 4))]
        return doc

    docs = [gen_doc() for _ in range(40)]
    spark.createDataFrame(
        [(i, pyjson.dumps(d)) for i, d in enumerate(docs)],
        "i int, j string",
    ).createOrReplaceTempView("t_json")
    got = {
        r.i: r
        for r in spark.sql(translate(
            "SELECT i,"
            " JSONHas(j, 'k0') AS has0, JSONHas(j, 'nope') AS hasn,"
            " JSONLength(j) AS ln,"
            " JSONExtractInt(j, 'k0') AS i0,"
            " JSONExtractFloat(j, 'k1') AS f1,"
            " JSONExtractString(j, 'k0') AS s0,"
            " JSONExtractBool(j, 'k0') AS b0,"
            " JSONArrayLength(JSONExtractRaw(j, 'k0')) AS al"
            " FROM t_json"
        )).collect()
    }
    for i, d in enumerate(docs):
        g = got[i]
        assert bool(g.has0) == ("k0" in d), (d, g.has0)
        assert not g.hasn
        assert g.ln == len(d), (d, g.ln)
        v = d.get("k0")
        if isinstance(v, bool):
            assert g.b0 == v, (d, g.b0)
        elif isinstance(v, int):
            assert g.i0 == v, (d, g.i0)
        elif isinstance(v, str):
            assert g.s0 == v, (d, g.s0)
        v1 = d.get("k1")
        if isinstance(v1, float):
            assert g.f1 == pytest.approx(v1), (d, g.f1)
        if isinstance(v, list):
            assert g.al == len(v), (d, g.al)
        else:
            assert g.al is None, (d, g.al)


def test_format_parse_datetime_roundtrip_random(spark):
    """formatDateTime → parseDateTime roundtrip fuzz over random
    timestamps and lossless composite format strings — the r13
    specifier engine's two directions must invert each other exactly."""
    rng = random.Random(1424)
    from datetime import datetime

    stamps = [
        datetime(1970, 1, 1)
        + timedelta(seconds=rng.randint(0, 2_000_000_000))
        for _ in range(25)
    ]
    fmts = [
        "%Y-%m-%d %H:%i:%S",
        "%d/%m/%Y %H:%i:%S",
        "%Y%m%d%H%i%S",
        "%d %m %Y %H:%i:%S",  # %e is format-only (guided in parse)
        "%Y-%m-%d %T",
    ]
    spark.createDataFrame(
        [(i, s.strftime("%Y-%m-%d %H:%M:%S")) for i, s in enumerate(stamps)],
        "i int, ts string",
    ).createOrReplaceTempView("t_fpd")
    for f in fmts:
        rows_ = spark.sql(translate(
            f"SELECT i, parseDateTime(formatDateTime(toDateTime(ts),"
            f" '{f}'), '{f}') AS back FROM t_fpd"
        )).collect()
        got = {r.i: r.back for r in rows_}
        for i, s in enumerate(stamps):
            assert got[i] == s, (f, s, got[i])


def test_ip_functions_random_vs_ipaddress(spark):
    """Randomized IP-function audit against Python's ipaddress module:
    IPv4 num↔string in both directions, isIPv4String on valid and
    malformed forms, isIPAddressInRange against random CIDRs, and the
    IPv4CIDRToRange bounds."""
    import ipaddress

    rng = random.Random(1425)
    nums = [rng.randint(0, 2**32 - 1) for _ in range(40)]
    cidr_bits = [rng.randint(0, 32) for _ in nums]
    spark.createDataFrame(
        [(i, n, str(ipaddress.IPv4Address(n)), b)
         for i, (n, b) in enumerate(zip(nums, cidr_bits))],
        "i int, n long, s string, b int",
    ).createOrReplaceTempView("t_ip")
    from mcp_clickhouse_spark.functions import register_lazy_udfs

    sql_t = translate(
        "SELECT i, IPv4NumToString(n) AS ns,"
            " IPv4StringToNum(s) AS sn,"
            " toInt64(isIPv4String(s)) AS ok,"
            " toInt64(isIPAddressInRange(s, concat(s, '/', toString(b))))"
            " AS inr,"
            " IPv4NumToString(tupleElement(IPv4CIDRToRange("
            "   toIPv4(s), b), 1)) AS lo,"
        " IPv4NumToString(tupleElement(IPv4CIDRToRange("
        "   toIPv4(s), b), 2)) AS hi"
        " FROM t_ip"
    )
    register_lazy_udfs(spark, sql_t)
    got = {r.i: r for r in spark.sql(sql_t).collect()}
    for i, (n, b) in enumerate(zip(nums, cidr_bits)):
        g = got[i]
        addr = ipaddress.IPv4Address(n)
        assert g.ns == str(addr), (n, g.ns)
        assert g.sn == n, (n, g.sn)
        assert g.ok == 1
        assert g.inr == 1, (str(addr), b)
        net = ipaddress.ip_network(f"{addr}/{b}", strict=False)
        assert g.lo == str(net.network_address), (addr, b, g.lo)
        assert g.hi == str(net.broadcast_address), (addr, b, g.hi)


def test_array_map_codec_random_vs_python(spark):
    """Randomized array/map/codec audit vs Python list/dict/base64
    operations: sort, reverse-sort, slice, distinct-preserving-order
    (arrayDistinct keeps FIRST occurrences), arrayDifference,
    arrayCumSum, indexOf, mapKeys/Values order, base64 and hex
    roundtrips."""
    import base64 as b64

    rng = random.Random(1426)
    arrays = [
        [rng.randint(-20, 20) for _ in range(rng.randint(0, 8))]
        for _ in range(35)
    ]
    strs = [
        "".join(rng.choice("abcXYZ 019_é") for _ in range(rng.randint(0, 10)))
        for _ in range(35)
    ]
    spark.createDataFrame(
        [(i, a, s, rng.randint(1, 4), rng.randint(1, 3))
         for i, (a, s) in enumerate(zip(arrays, strs))],
        "i int, a array<int>, s string, o int, l int",
    ).createOrReplaceTempView("t_amc")
    got = {
        r.i: r
        for r in spark.sql(translate(
            "SELECT i, o, l, arraySort(a) AS srt,"
            " arrayReverseSort(a) AS rsrt,"
            " arraySlice(a, o, l) AS sl, arrayDistinct(a) AS dst,"
            " arrayDifference(a) AS dif, arrayCumSum(a) AS cum,"
            " indexOf(a, 3) AS idx,"
            " base64Encode(s) AS b64,"
            # base64Decode returns BINARY (the unhex convention) —
            # CAST renders the text
            " CAST(base64Decode(base64Encode(s)) AS String) AS rt,"
            " lower(hex(s)) AS hx, CAST(unhex(hex(s)) AS String) AS hrt"
            " FROM t_amc"
        )).collect()
    }
    for i, (a, s) in enumerate(zip(arrays, strs)):
        g = got[i]
        assert list(g.srt) == sorted(a), (a, g.srt)
        assert list(g.rsrt) == sorted(a, reverse=True)
        o, l = g.o, g.l
        assert list(g.sl) == a[o - 1 : o - 1 + l], (a, o, l, g.sl)
        seen, dst = set(), []
        for x in a:
            if x not in seen:
                seen.add(x)
                dst.append(x)
        assert sorted(g.dst) == sorted(dst), (a, g.dst)
        exp_dif = (
            [] if not a
            else [0] + [a[j] - a[j - 1] for j in range(1, len(a))]
        )
        assert list(g.dif) == exp_dif, (a, g.dif)
        exp_cum, run = [], 0
        for x in a:
            run += x
            exp_cum.append(run)
        assert list(g.cum) == exp_cum, (a, g.cum)
        assert g.idx == (a.index(3) + 1 if 3 in a else 0), (a, g.idx)
        assert g.b64 == b64.b64encode(s.encode()).decode(), (s,)
        assert g.rt == s
        assert g.hx == s.encode().hex(), (s, g.hx)
        assert g.hrt == s


def test_xor_random(spark):
    rng = random.Random(1417)
    vals = [
        (i, rng.randint(0, 1), rng.randint(0, 1), rng.randint(0, 1))
        for i in range(40)
    ]
    spark.createDataFrame(
        vals, "i int, a int, b int, c int"
    ).createOrReplaceTempView("t_xor")
    rows = spark.sql(
        translate("SELECT i, xor(a, b, c) AS x, xor(a, b) AS y FROM t_xor")
    ).collect()
    got = {r.i: (r.x, r.y) for r in rows}
    for i, a, b, c in vals:
        assert got[i] == (bool(a) ^ bool(b) ^ bool(c), bool(a) ^ bool(b))
