"""Non-closed-form random distributions (round 11 — were guided).

ClickHouse's randPoisson / randBinomial / randNegativeBinomial /
randChiSquared / randStudentT / randFisherF (reference Tier C delegation,
`/root/reference/mcp_server.py:425`) sample distributions with no
uniform-transform closed form that Spark SQL can express (the
rand()/randn() transforms cover uniform, normal, lognormal, Bernoulli and
exponential in dialect.py).  These six are Arrow pandas UDFs over
numpy.random.Generator — vectorized per batch, parameters may be per-row
columns (numpy broadcasts parameter arrays natively).

Determinism: the UDFs are registered ``asNondeterministic()`` so Catalyst
neither collapses common subexpressions nor reorders them past filters —
the same contract as Spark's own rand().  Like every CH rand* mapping
here, the VALUES are engine-local randomness (rows-only by design); the
DISTRIBUTIONS are pinned by moment-accuracy tests
(tests/test_r11_wave.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


def _rng():
    import numpy as np

    # fresh OS-entropy generator per executor/batch — engine-local
    # randomness, matching CH's per-call thread-local PRNG contract
    return np.random.default_rng()


def ensure_registered(spark) -> None:
    if getattr(spark, "_ch_randdist_registered", False):
        return

    @pandas_udf("bigint")
    def ch_rand_poisson(lam: pd.Series) -> pd.Series:
        import numpy as np

        out = _rng().poisson(lam=np.clip(lam.astype("float64"), 0.0, None))
        return pd.Series(out.astype("int64"))

    @pandas_udf("bigint")
    def ch_rand_binomial(n: pd.Series, p: pd.Series) -> pd.Series:
        import numpy as np

        out = _rng().binomial(
            n=n.astype("int64"),
            p=np.clip(p.astype("float64"), 0.0, 1.0),
        )
        return pd.Series(out.astype("int64"))

    @pandas_udf("bigint")
    def ch_rand_negbinomial(r: pd.Series, p: pd.Series) -> pd.Series:
        import numpy as np

        out = _rng().negative_binomial(
            n=r.astype("int64"),
            p=np.clip(p.astype("float64"), 1e-12, 1.0),
        )
        return pd.Series(out.astype("int64"))

    @pandas_udf("double")
    def ch_rand_chisq(k: pd.Series) -> pd.Series:
        return pd.Series(_rng().chisquare(df=k.astype("float64")))

    @pandas_udf("double")
    def ch_rand_student_t(k: pd.Series) -> pd.Series:
        return pd.Series(_rng().standard_t(df=k.astype("float64")))

    @pandas_udf("double")
    def ch_rand_fisher_f(d1: pd.Series, d2: pd.Series) -> pd.Series:
        return pd.Series(
            _rng().f(dfnum=d1.astype("float64"), dfden=d2.astype("float64"))
        )

    for name, f in (
        ("ch_rand_poisson", ch_rand_poisson),
        ("ch_rand_binomial", ch_rand_binomial),
        ("ch_rand_negbinomial", ch_rand_negbinomial),
        ("ch_rand_chisq", ch_rand_chisq),
        ("ch_rand_student_t", ch_rand_student_t),
        ("ch_rand_fisher_f", ch_rand_fisher_f),
    ):
        spark.udf.register(name, f.asNondeterministic())
    spark._ch_randdist_registered = True
