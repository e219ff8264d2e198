"""Hand-computable formula pins for statistical operators that until
now had ONLY oracle coverage — the same agenda as
test_planted_signals.py (the DuckDB oracle proves cross-engine
agreement, not that the formula is right; both engines could share one
wrong expression tree). Each test builds a fixture whose statistic is
known in closed form (Gini of a point mass, entropy of a uniform mix,
lag-1 autocorrelation of an alternating series, a drawdown path traced
by hand, …) and asserts the operator lands on it.

Fixture pattern: copy the sf0.001 tables, overwrite the one table the
operator reads (test_planted_signals.py's discipline)."""

from __future__ import annotations

import math
import shutil

import pandas as pd

from agri_market_data_pipeline_spark.registry import all_queries

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _q(name):
    return all_queries()[name]


def _copy_tables(tmp_path, name: str):
    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    return alt


def _orders(alt, prios, prices, dates=None):
    n = len(prios)
    pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": [1] * n,
            "o_orderstatus": ["O"] * n,
            "o_totalprice": [float(p) for p in prices],
            "o_orderdate": dates
            if dates is not None
            else [pd.Timestamp("2024-01-01")] * n,
            "o_orderpriority": prios,
        }
    ).to_parquet(alt / "orders.parquet", coerce_timestamps="us")


def _lineitem(alt, flags, qtys, prices):
    n = len(flags)
    pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_linenumber": [1] * n,
            "l_partkey": [1] * n,
            "l_suppkey": [1] * n,
            "l_quantity": [float(q) for q in qtys],
            "l_extendedprice": [float(p) for p in prices],
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": flags,
            "l_shipdate": [pd.Timestamp("2024-01-01")] * n,
            "l_shipmode": ["AIR"] * n,
        }
    ).to_parquet(alt / "lineitem.parquet", coerce_timestamps="us")


def test_gini_equal_is_zero_and_point_mass_is_extreme(spark, tmp_path):
    """Gini's two anchor points: 50 equal orders → G = 0 exactly by
    the rank identity; one order holding ALL the value among 50 →
    G = (n-1)/n = 0.98 exactly."""
    alt = _copy_tables(tmp_path, "gini")
    prios = ["EQ"] * 50 + ["MAX"] * 50
    prices = [100.0] * 50 + [0.0] * 49 + [1000.0]
    _orders(alt, prios, prices)
    got = {r.prio: r for r in _q("agg_gini")(spark, str(alt)).collect()}
    assert got["EQ"].n == 50 and got["EQ"].gini == 0.0
    assert got["MAX"].gini == 0.98  # 2·(50·1000)/(50·1000) − 51/50


def test_entropy_uniform_is_ln_k_and_point_mass_zero(spark, tmp_path):
    """Shannon entropy anchors: 4 types × 25 parts → H = ln 4 nats;
    a single-type brand → H = 0."""
    alt = _copy_tables(tmp_path, "ent")
    brands = ["U"] * 100 + ["P"] * 100
    types = [f"t{i % 4}" for i in range(100)] + ["only"] * 100
    n = len(brands)
    pd.DataFrame(
        {
            "p_partkey": range(n),
            "p_name": ["x"] * n,
            "p_brand": brands,
            "p_type": types,
            "p_size": [1] * n,
            "p_retailprice": [9.99] * n,
        }
    ).to_parquet(alt / "part.parquet")
    got = {r.p_brand: r for r in _q("agg_entropy")(spark, str(alt)).collect()}
    assert got["U"].n_parts == 100 and got["U"].n_types == 4
    assert got["U"].entropy_nats == round(math.log(4), 4)
    assert got["P"].n_types == 1 and got["P"].entropy_nats == 0.0


def test_higher_moments_match_numpy_population_moments(spark, tmp_path):
    """Skewness / excess kurtosis vs numpy population moments on an
    asymmetric planted distribution, plus the constant-group NULL
    contract (m2 = 0 must yield NULL, not a divide-by-zero)."""
    import numpy as np

    alt = _copy_tables(tmp_path, "mom")
    vals = [1.0] * 50 + [2.0] * 30 + [10.0] * 20
    flags = ["S"] * len(vals) + ["C"] * 10
    prices = vals + [7.0] * 10
    _lineitem(alt, flags, [1.0] * len(flags), prices)
    got = {
        r.l_returnflag: r
        for r in _q("agg_moments_higher")(spark, str(alt)).collect()
    }
    x = np.array(vals)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert abs(got["S"].skewness - m3 / m2**1.5) < 1e-3
    assert abs(got["S"].excess_kurtosis - (m4 / m2**2 - 3.0)) < 1e-3
    assert got["C"].skewness is None and got["C"].excess_kurtosis is None


def test_autocorr_alternating_negative_one_trend_positive_one(
    spark, tmp_path
):
    """Lag-1 autocorrelation anchors: a perfectly alternating daily
    series → −1 (each value is the other's lag, perfectly
    anti-correlated); a pure linear ramp → +1 (the lag is an exact
    affine function of the series)."""
    alt = _copy_tables(tmp_path, "ac")
    prios, prices, dates = [], [], []
    for d in range(40):
        prios.append("ALT")
        prices.append(100.0 if d % 2 == 0 else 200.0)
        dates.append(pd.Timestamp("2024-01-01") + pd.Timedelta(days=d))
        prios.append("TRD")
        prices.append(100.0 + 10.0 * d)
        dates.append(pd.Timestamp("2024-01-01") + pd.Timedelta(days=d))
    _orders(alt, prios, prices, dates)
    got = {
        r.prio: r.autocorr_lag1
        for r in _q("ts_autocorr")(spark, str(alt)).collect()
    }
    assert got["ALT"] == -1.0
    assert got["TRD"] == 1.0


def test_max_drawdown_traced_path(spark, tmp_path):
    """A hand-traced path 100 → 120 → 80 → 110 → 60: running peaks
    100,120,120,120,120; the deepest fall is 1 − 60/120 = 0.5 at the
    last day — max_drawdown and the trough date are both pinned."""
    alt = _copy_tables(tmp_path, "dd")
    path = [100.0, 120.0, 80.0, 110.0, 60.0]
    dates = [
        pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
        for d in range(len(path))
    ]
    _orders(alt, ["DD"] * len(path), path, dates)
    r = _q("ts_max_drawdown")(spark, str(alt)).collect()
    r = [x for x in r if x.prio == "DD"][0]
    assert r.max_drawdown == 0.5
    assert r.n_days == 5
    assert pd.Timestamp(r.trough_d) == dates[-1]


def test_corr_covar_exact_linear_relations(spark, tmp_path):
    """Pearson correlation anchors: price = 3·qty → corr exactly +1
    and covar = 3·var_samp(qty); price = −2·qty → corr exactly −1."""
    import numpy as np

    alt = _copy_tables(tmp_path, "cc")
    q = [float(i) for i in range(1, 21)]
    flags = ["P"] * 20 + ["N"] * 20
    qtys = q + q
    prices = [3.0 * v for v in q] + [-2.0 * v for v in q]
    _lineitem(alt, flags, qtys, prices)
    got = {
        r.l_returnflag: r
        for r in _q("agg_corr_covar")(spark, str(alt)).collect()
    }
    assert got["P"].qty_price_corr == 1.0
    assert got["N"].qty_price_corr == -1.0
    want = 3.0 * np.var(q, ddof=1)
    assert abs(got["P"].qty_price_covar - want) < 1e-3


def test_ewma_constant_series_and_step_response(spark, tmp_path):
    """EWMA anchors: a constant series must smooth to itself exactly
    on every day (the adaptive normalizer contract — no zero-bias at
    the head); after a step 100 → 200 the smoothed value must match
    the hand-evaluated truncated FIR with r = 0.75 over 8 taps."""
    from agri_market_data_pipeline_spark.operators.timeseries import (
        _EWMA_R,
        _EWMA_TAPS,
    )

    alt = _copy_tables(tmp_path, "ew")
    prios, prices, dates = [], [], []
    series = [100.0] * 10 + [200.0]
    for d in range(11):
        prios.append("CONST")
        prices.append(100.0)
        dates.append(pd.Timestamp("2024-01-01") + pd.Timedelta(days=d))
        prios.append("STEP")
        prices.append(series[d])
        dates.append(pd.Timestamp("2024-01-01") + pd.Timedelta(days=d))
    _orders(alt, prios, prices, dates)
    rows = _q("ts_ewma")(spark, str(alt)).collect()
    const = [r for r in rows if r.prio == "CONST"]
    assert len(const) == 11 and all(r.ewma == 100.0 for r in const)
    step = sorted(
        (r for r in rows if r.prio == "STEP"), key=lambda r: r.d
    )[-1]
    num = 200.0 + sum(_EWMA_R**k * 100.0 for k in range(1, _EWMA_TAPS))
    den = sum(_EWMA_R**k for k in range(_EWMA_TAPS))
    assert abs(step.ewma - num / den) < 1e-9
