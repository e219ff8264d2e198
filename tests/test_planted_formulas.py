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

from agri_market_data_pipeline_spark.operators.reshape import (
    _NEYMAN_BUDGET,
)
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


def test_ttest_fires_on_planted_shift_with_correct_sign(spark, tmp_path):
    """Welch t-test: users hash-split A/B with the operator's own md5
    assignment (recomputed here); equal distributions must stay inside
    |t| < 3 while a +5 shift on B must drive t far negative
    (mean_a − mean_b < 0 — sign pinned, not just magnitude) with a
    plausible Welch df."""
    import hashlib

    def variant(uid: int) -> str:
        h = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16)
        return "A" if h % 2 == 0 else "B"

    import tests.test_planted_signals as ps

    for name, shift, check in (
        ("null", 0.0, lambda r: abs(r.t_stat) < 3),
        ("shift", 5.0, lambda r: r.t_stat < -10),
    ):
        types, values, days = [], [], []
        i = 0
        for uid in range(1, 201):
            for k in range(10):
                base = 50.0 + ps._noise("tt", i)
                if variant(uid) == "B":
                    base += shift
                types.append("m")
                values.append(base)
                days.append(i % 30)
                i += 1
        alt = ps._planted(tmp_path, f"tt_{name}", types, values, days)
        # _planted fixes user_id=1; rewrite with the real uid spread
        ev = pd.read_parquet(f"{alt}/events.parquet")
        ev["user_id"] = [1 + (j // 10) for j in range(len(ev))]
        ev.to_parquet(f"{alt}/events.parquet", coerce_timestamps="us")
        r = _q("agg_ttest_ab")(spark, alt).collect()[0]
        assert r.n_a + r.n_b == 2000 and min(r.n_a, r.n_b) > 500
        assert check(r), (name, r.t_stat)
        assert r.df_welch > 100
        if shift:
            assert abs((r.mean_b - r.mean_a) - 5.0) < 0.2


def _rebuild_edges(spark, sf_dir):
    """Independent pandas rebuild of the nation trade edge list
    (supplier nation → customer nation, line counts)."""
    from agri_market_data_pipeline_spark.tables import load

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).toPandas()
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).toPandas()
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    ).toPandas()
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).toPandas()
    e = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .groupby(["s_nationkey", "c_nationkey"])
        .size()
        .reset_index(name="w")
    )
    names = dict(zip(nat.n_nationkey, nat.n_name))
    return e, names


def test_triangle_count_matches_pure_python(spark, sf_dir):
    """graph_triangle_count vs a brute-force pure-Python triangle
    enumeration over the independently rebuilt undirected edge set —
    per-nation participation counts must match exactly (the oriented
    edge-join must neither drop nor double-count any triangle)."""
    import itertools

    e, names = _rebuild_edges(spark, sf_dir)
    und = set()
    for src, dst in zip(e.s_nationkey, e.c_nationkey):
        if src != dst:
            und.add((min(int(src), int(dst)), max(int(src), int(dst))))
    nodes = sorted({x for p in und for x in p})
    part = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in und and (y, z) in und and (x, z) in und:
            part[x] += 1
            part[y] += 1
            part[z] += 1
    want = {names[n]: c for n, c in part.items() if c > 0}
    got = {
        r.nation: r.n_triangles
        for r in _q("graph_triangle_count")(spark, sf_dir).collect()
    }
    assert got == want


def test_degree_stats_match_pure_python(spark, sf_dir):
    """graph_degree_stats vs the pandas rebuild: in/out degree and
    weighted degree per nation, exact, including zero rows for
    isolated nations."""
    e, names = _rebuild_edges(spark, sf_dir)
    out_d = e.groupby("s_nationkey").agg(deg=("w", "size"), w=("w", "sum"))
    in_d = e.groupby("c_nationkey").agg(deg=("w", "size"), w=("w", "sum"))
    got = {
        r.nation: (r.deg_out, r.deg_in, r.w_out, r.w_in)
        for r in _q("graph_degree_stats")(spark, sf_dir).collect()
    }
    assert set(got) == set(names.values())
    for nk, nm in names.items():
        wo = (
            (int(out_d.loc[nk].deg), int(out_d.loc[nk].w))
            if nk in out_d.index
            else (0, 0)
        )
        wi = (
            (int(in_d.loc[nk].deg), int(in_d.loc[nk].w))
            if nk in in_d.index
            else (0, 0)
        )
        assert got[nm] == (wo[0], wi[0], wo[1], wi[1]), (nm, got[nm], wo, wi)


def test_rolling_slope_exact_on_planted_line(spark, tmp_path):
    """win_rolling_slope on v = 5 + 2·d: every window spanning ≥ 2
    days lies exactly on the line, so the OLS slope is exactly 2.0
    (the integer-lattice sums make this bitwise, not approximate);
    the first window (single point, zero x-variance) emits the
    literal 0.0."""
    import tests.test_planted_signals as ps

    vals = [5.0 + 2.0 * d for d in range(30)]
    alt = ps._planted(
        tmp_path, "rsl", ["lin"] * 30, vals, list(range(30))
    )
    rows = sorted(
        (r for r in _q("win_rolling_slope")(spark, alt).collect()
         if r.event_type == "lin"),
        key=lambda r: r.day_no,
    )
    assert len(rows) == 30
    assert rows[0].slope == 0.0 and rows[0].n == 1
    for r in rows[1:]:
        assert r.slope == 2.0, (r.day_no, r.slope)


def test_forecast_eval_seasonal_naive_hand_computed(spark, tmp_path):
    """ts_forecast_eval's seasonal-naive WAPE/bias on a hand-built
    two-year monthly series (year 1 all 100, year 2 all 110): exactly
    12 scored months, WAPE = 120/1320 = 1/11, mean bias = +10."""
    alt = _copy_tables(tmp_path, "fe")
    prios, prices, dates = [], [], []
    for m in range(24):
        prios.append("FE")
        prices.append(100.0 if m < 12 else 110.0)
        dates.append(pd.Timestamp(f"{2023 + m // 12}-{m % 12 + 1:02d}-15"))
    _orders(alt, prios, prices, dates)
    r = [
        x
        for x in _q("ts_forecast_eval")(spark, str(alt)).collect()
        if x.prio == "FE"
    ][0]
    assert r.n_scored == 12
    assert r.wape == round(120.0 / 1320.0, 6)
    assert r.mean_bias == 10.0


def test_bootstrap_se_zero_on_constant_and_near_theory_on_uniform(
    spark, tmp_path
):
    """Poisson-bootstrap anchors: a CONSTANT metric has zero resampling
    variance (every replicate's weighted mean is the constant itself)
    — se_cents must be exactly 0.0; on 2000 iid uniform[0,1] values
    the SE of the mean is σ/√n ≈ 0.646 cents, and a B=20 bootstrap
    estimate must land within its own sampling band of that truth."""
    import tests.test_planted_signals as ps

    n = 2000
    const = ps._planted(
        tmp_path, "bs_const", ["m"] * n, [2.0] * n, [i % 30 for i in range(n)]
    )
    r = _q("agg_bootstrap_se")(spark, const).collect()[0]
    assert r.n == n and r.mean_cents == 200.0 and r.n_replicates == 20
    assert r.se_cents == 0.0
    uni = ps._planted(
        tmp_path,
        "bs_uni",
        ["m"] * n,
        [ps._noise("bs", i) for i in range(n)],
        [i % 30 for i in range(n)],
    )
    r = _q("agg_bootstrap_se")(spark, uni).collect()[0]
    theory = (1.0 / 12.0) ** 0.5 * 100.0 / n**0.5  # σ_cents/√n ≈ 0.6455
    assert 0.4 * theory < r.se_cents < 1.8 * theory, (r.se_cents, theory)


def test_jackknife_zero_se_on_homogeneous_buckets(spark, tmp_path):
    """Delete-one-bucket jackknife anchors: if EVERY user has the
    identical 3-in-10 purchase mix, every leave-one-out rate equals
    0.3 and the jackknife SE is exactly 0; making half the users
    5-in-10 must push the SE strictly positive while the overall rate
    stays the exact pooled fraction."""
    import tests.test_planted_signals as ps

    for name, hetero in (("homo", False), ("het", True)):
        types, values, days, users = [], [], [], []
        n_users, per = 200, 10
        total_p = 0
        for uid in range(1, n_users + 1):
            k = 5 if (hetero and uid % 2 == 0) else 3
            total_p += k
            for j in range(per):
                types.append("purchase" if j < k else "click")
                values.append(1.0)
                days.append((uid * per + j) % 30)
                users.append(uid)
        alt = ps._planted(tmp_path, f"jk_{name}", types, values, days)
        ev = pd.read_parquet(f"{alt}/events.parquet")
        ev["user_id"] = users
        ev.to_parquet(f"{alt}/events.parquet", coerce_timestamps="us")
        r = _q("agg_jackknife_ci")(spark, alt).collect()[0]
        assert r.rate == total_p / (n_users * per)
        if hetero:
            assert r.se_jackknife > 0.0
        else:
            assert r.se_jackknife == 0.0


def _docs(alt, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(alt / "documents.parquet")


def test_simhash_identity_locality_and_separation(spark, tmp_path):
    """SimHash contracts: identical documents hash identically; a
    one-token edit in a 40-token document moves few of the 16 bits;
    an unrelated document sits at a much larger Hamming distance than
    the near-duplicate (locality is the operator's entire point)."""
    alt = _copy_tables(tmp_path, "sh")
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(
        ("CHANGED" if i == 17 else f"tok{i}") for i in range(40)
    )
    far = " ".join(f"other{i}" for i in range(40))
    _docs(alt, [base, base, near, far])
    got = {
        r.doc_id: r.simhash16
        for r in _q("dedup_simhash")(spark, str(alt)).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert got[0] == got[1]  # identical text, identical hash
    d_near = ham(got[0], got[2])
    d_far = ham(got[0], got[3])
    assert d_near <= 5, d_near
    assert d_far > d_near, (d_far, d_near)


def test_zipf_fit_recovers_planted_exponent(spark, tmp_path):
    """text_zipf_fit on a corpus built to count(rank) = floor(1000 /
    rank) for ranks 1..50 — an exact s = 1 Zipf law up to floor error
    — must fit an exponent within a few percent of 1; a planted FLAT
    distribution (every token 20×) must fit ≈ 0."""
    for name, counts, lo, hi in (
        ("zipf", [1000 // r for r in range(1, 51)], 0.93, 1.07),
        ("flat", [20] * 50, -0.05, 0.05),
    ):
        alt = _copy_tables(tmp_path, f"zf_{name}")
        words = []
        for r, c in enumerate(counts, start=1):
            words += [f"w{r:03d}"] * c
        # spread across a few documents; tokenization is whitespace
        texts = [
            " ".join(words[i::7]) for i in range(7)
        ]
        _docs(alt, texts)
        r = _q("text_zipf_fit")(spark, str(alt)).collect()[0]
        assert r.n_types == 50
        assert lo <= r.zipf_exponent <= hi, (name, r.zipf_exponent)


def test_twap_hand_computed_irregular_intervals(spark, tmp_path):
    """ts_twap on one hand-built day: 100 held 10 s, then 200 held
    30 s, then a terminal quote that drops (left-closed convention) —
    TWAP = (100·10 + 200·30)/40 = 175 exactly, n_intervals = 2."""
    alt = _copy_tables(tmp_path, "twap")
    t0 = pd.Timestamp("2024-01-05 10:00:00")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [t0, t0 + pd.Timedelta(seconds=10),
                   t0 + pd.Timedelta(seconds=40)],
            "user_id": [1, 1, 1],
            "event_type": ["q", "q", "q"],
            "value": [100.0, 200.0, 999.0],
            "props": ["{}"] * 3,
        }
    )
    ev.to_parquet(alt / "events.parquet", coerce_timestamps="us")
    r = _q("ts_twap")(spark, str(alt)).collect()
    assert len(r) == 1
    assert r[0].n_intervals == 2
    assert r[0].twap == 175.0


def test_percentiles_exact_on_integer_ladder(spark, tmp_path):
    """Interpolated percentiles on values 1..101: rank p·(n−1) is an
    exact integer for p ∈ {0.5, 0.9, 0.99}, so p50/p90/p99 must be
    exactly 51/91/100 with zero interpolation residue."""
    alt = _copy_tables(tmp_path, "pct")
    vals = [float(v) for v in range(1, 102)]
    _lineitem(alt, ["Q"] * len(vals), [1.0] * len(vals), vals)
    r = [
        x
        for x in _q("agg_percentiles")(spark, str(alt)).collect()
        if x.l_returnflag == "Q"
    ][0]
    assert (r.p50, r.p90, r.p99) == (51.0, 91.0, 100.0)


def test_moving_median_hand_traced(spark, tmp_path):
    """7-day moving median over the hand path 5,1,9,3,7 — the five
    expanding frames have medians 5, 3, 5, 4, 5 (even frames average
    the two middles; odd frames pick the exact element)."""
    alt = _copy_tables(tmp_path, "mm")
    path = [5.0, 1.0, 9.0, 3.0, 7.0]
    dates = [
        pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
        for d in range(len(path))
    ]
    _orders(alt, ["MM"] * len(path), path, dates)
    rows = sorted(
        (r for r in _q("win_moving_median")(spark, str(alt)).collect()
         if r.o_orderpriority == "MM"),
        key=lambda r: r.d,
    )
    assert [r.med7 for r in rows] == [5.0, 3.0, 5.0, 4.0, 5.0]


def test_classical_decompose_attributes_line_to_trend(spark, tmp_path):
    """Classical decomposition on a pure linear monthly series
    (actual = 100·k, 36 months): a centered symmetric moving average
    of a line IS the line, so trend == actual, seasonal == 0, and
    residual == 0 on every interior month — the decomposition must
    attribute everything to trend and nothing to seasonality."""
    alt = _copy_tables(tmp_path, "dec")
    prios, prices, dates = [], [], []
    for k in range(36):
        prios.append("LIN")
        prices.append(100.0 * (k + 1))
        dates.append(pd.Timestamp(f"{2021 + k // 12}-{k % 12 + 1:02d}-15"))
    _orders(alt, prios, prices, dates)
    rows = [
        r
        for r in _q("ts_classical_decompose")(spark, str(alt)).collect()
        if r.prio == "LIN"
    ]
    assert len(rows) == 36 - 12  # 6 trimmed each end by the ±6 window
    for r in rows:
        assert r.trend == r.actual, (r.m, r.trend, r.actual)
        assert r.seasonal == 0.0 and r.residual == 0.0, r


def test_l_diversity_homogeneity_attack_and_diverse_class(spark, tmp_path):
    """dq_l_diversity's core contract: a class whose members ALL share
    one sensitive value (the homogeneity attack k-anonymity misses)
    must report l=1, H=0, violated; a uniformly 5-diverse class must
    report l=5, H=ln 5, clean; a 2-value class sits at l=2 (still
    violated at L=3) with the exact binary entropy."""
    import math

    alt = _copy_tables(tmp_path, "ldiv")
    rows = []
    # class (nation 1, band 0): 40 members, all segment 'AUTOMOBILE'
    rows += [(1, 100.0, "AUTOMOBILE")] * 40
    # class (nation 2, band 0): 50 members, 5 segments × 10
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    for i in range(50):
        rows.append((2, 100.0, segs[i % 5]))
    # class (nation 3, band 0): 30 members, 20/10 two-segment split
    rows += [(3, 100.0, "BUILDING")] * 20 + [(3, 100.0, "FURNITURE")] * 10
    pd.DataFrame(
        {
            "c_custkey": range(len(rows)),
            "c_name": ["c"] * len(rows),
            "c_nationkey": [r[0] for r in rows],
            "c_acctbal": [r[1] for r in rows],
            "c_mktsegment": [r[2] for r in rows],
        }
    ).to_parquet(alt / "customer.parquet")
    got = {
        (r.nation, r.bal_band): r
        for r in _q("dq_l_diversity")(spark, str(alt)).collect()
    }
    homo = got[(1, 0)]
    assert (homo.class_size, homo.l_distinct, homo.h_nats, homo.violates_l) \
        == (40, 1, 0.0, 1)
    div = got[(2, 0)]
    assert (div.l_distinct, div.violates_l) == (5, 0)
    assert div.h_nats == round(math.log(5), 6)
    two = got[(3, 0)]
    assert (two.l_distinct, two.violates_l) == (2, 1)
    h = math.log(30) - (20 * math.log(20) + 10 * math.log(10)) / 30
    assert abs(two.h_nats - h) < 2e-6


def test_silhouette_separated_vs_overlapping_clusters(spark, tmp_path):
    """ml_kmeans_silhouette direction pin: 8 planted orthogonal-axis
    clusters (seeds vec_id 0..7 land one per cluster) must score mean
    silhouette near 1 with zero boundary points; a single isotropic
    blob forced into 8 cells must score near 0 with many boundary
    points — the eval must actually distinguish good from meaningless
    clusterings."""
    import hashlib as _h
    import numpy as np

    def nz(tag, i):
        return int(_h.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16) / 2**32

    n, d = 800, 64
    for name, separated, check in (
        ("sep", True, lambda r: r.mean_silhouette > 0.85 and r.n_boundary == 0),
        ("blob", False, lambda r: r.mean_silhouette < 0.3),
    ):
        alt = _copy_tables(tmp_path, f"sil_{name}")
        vecs = []
        for i in range(n):
            v = np.array([0.01 * nz(f"s{name}", i * d + j) for j in range(d)])
            if separated:
                v[i % 8] = 1.0  # vec_id 0..7 seed one cluster each
            else:
                v[0] = 1.0  # everyone on one axis: clusters meaningless
            vecs.append(v.astype(np.float32).tolist())
        pd.DataFrame(
            {"vec_id": range(n), "embedding": vecs, "label": [0] * n}
        ).to_parquet(alt / "embeddings.parquet")
        rows = _q("ml_kmeans_silhouette")(spark, str(alt)).collect()
        assert sum(r.n_members for r in rows) == n
        if separated:
            assert len(rows) == 8
        for r in rows:
            assert check(r), (name, r.cell_id, r.mean_silhouette, r.n_boundary)


def test_haversine_and_bearing_match_independent_formula(spark, sf_dir):
    """fn_geo_haversine vs an independent Python great-circle
    implementation evaluated on the operator's OWN emitted (lat, lon):
    distance within 1e-3 km and bearing within 1e-3°, plus the two
    textbook anchors — one degree of latitude ≈ 111.2 km and the
    bearing from due south of Delhi is exactly 0° (north)."""
    import math

    from agri_market_data_pipeline_spark.operators.geo import (
        _DELHI_LAT,
        _DELHI_LON,
        _EARTH_2R,
    )

    R = _EARTH_2R / 2.0
    rows = _q("fn_geo_haversine")(spark, sf_dir).collect()
    assert len(rows) > 0

    def hav(lat, lon):
        p1, p2 = math.radians(lat), math.radians(_DELHI_LAT)
        dp = math.radians(_DELHI_LAT - lat)
        dl = math.radians(_DELHI_LON - lon)
        a = (
            math.sin(dp / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        )
        return 2 * R * math.asin(min(1.0, math.sqrt(a)))

    def bearing(lat, lon):
        p1, p2 = math.radians(lat), math.radians(_DELHI_LAT)
        dl = math.radians(_DELHI_LON - lon)
        th = math.degrees(
            math.atan2(
                math.sin(dl) * math.cos(p2),
                math.cos(p1) * math.sin(p2)
                - math.sin(p1) * math.cos(p2) * math.cos(dl),
            )
        )
        return th + 360.0 if th < 0 else th

    for r in rows:
        assert abs(r.dist_delhi_km - hav(r.lat, r.lon)) < 1e-3, r
        assert abs(r.bearing_deg - bearing(r.lat, r.lon)) < 1e-3, r
    # anchors: 1° of latitude ≈ πR/180 km; due south → bearing 0
    assert abs(hav(_DELHI_LAT - 1.0, _DELHI_LON) - math.pi * R / 180) < 0.01
    assert bearing(_DELHI_LAT - 1.0, _DELHI_LON) == 0.0


def test_k_anonymity_planted_class_sizes(spark, tmp_path):
    """dq_k_anonymity: a 3-member (nation, segment) class must be
    flagged at k=8, a 20-member class must not, and both sizes are
    exact — the QI grouping neither merges nor splits classes."""
    alt = _copy_tables(tmp_path, "kanon")
    rows = [(1, "AUTOMOBILE")] * 3 + [(2, "BUILDING")] * 20 + [(3, "FURNITURE")] * 8
    pd.DataFrame(
        {
            "c_custkey": range(len(rows)),
            "c_name": ["c"] * len(rows),
            "c_nationkey": [r[0] for r in rows],
            "c_acctbal": [0.0] * len(rows),
            "c_mktsegment": [r[1] for r in rows],
        }
    ).to_parquet(alt / "customer.parquet")
    got = {
        (r.nation, r.segment): (r.class_size, r.violates_k)
        for r in _q("dq_k_anonymity")(spark, str(alt)).collect()
    }
    assert got == {
        (1, "AUTOMOBILE"): (3, 1),
        (2, "BUILDING"): (20, 0),
        (3, "FURNITURE"): (8, 0),  # exactly k is compliant
    }


def test_assortativity_matches_pure_python(spark, sf_dir):
    """graph_assortativity vs an independent Python Pearson over the
    degree pairs of the independently rebuilt kNN backbone — edge
    count exact, coefficient within the ROUND(6) grain; and the
    coefficient must be a genuine correlation (inside [-1, 1])."""
    import math

    import tests.test_planted_formulas as _self

    e, names = _rebuild_edges(spark, sf_dir)
    e = e[e.s_nationkey != e.c_nationkey]
    knn = set()
    for src, g in e.groupby("s_nationkey"):
        g = g.assign(key=g.w * 32 + (31 - g.c_nationkey)).sort_values(
            "key", ascending=False
        )
        for dst in g.c_nationkey.head(3):
            knn.add((int(src), int(dst)))
    und = {(min(a, b), max(a, b)) for a, b in knn}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ends = [(deg[a], deg[b]) for a, b in und] + [
        (deg[b], deg[a]) for a, b in und
    ]
    m = len(ends)
    sj = sum(j for j, _ in ends)
    sk = sum(k for _, k in ends)
    sjk = sum(j * k for j, k in ends)
    sjj = sum(j * j for j, _ in ends)
    skk = sum(k * k for _, k in ends)
    want = (m * sjk - sj * sk) / (
        math.sqrt(m * sjj - sj * sj) * math.sqrt(m * skk - sk * sk)
    )
    r = _q("graph_assortativity")(spark, sf_dir).collect()[0]
    assert r.n_edges == len(und)
    assert abs(r.assortativity - want) < 2e-6, (r.assortativity, want)
    assert -1.0 <= r.assortativity <= 1.0


def test_levenshtein_pairs_planted_distances_and_blocking(spark, tmp_path):
    """dedup_levenshtein: a pair sharing the (lang, first-token,
    length-bucket) block with exactly 2 substitutions in the 60-char
    prefix must surface with lev = 2; a doc differing only in its
    FIRST token must not pair at all (the blocking contract), however
    similar the rest is."""
    alt = _copy_tables(tmp_path, "lev")
    base = "alpha " + "x" * 54 + " tail common words here"
    two_subs = "alpha " + "x" * 20 + "YZ" + "x" * 32 + " tail common words here"
    other_block = "beta " + "x" * 55 + " tail common words here"
    _docs(alt, [base, two_subs, other_block])
    got = {
        (r.doc_a, r.doc_b): r.lev
        for r in _q("dedup_levenshtein")(spark, str(alt)).collect()
    }
    assert got.get((0, 1)) == 2, got
    assert not any(2 in k for k in got), got


def test_ngram_jaccard_exact_planted_overlap(spark, tmp_path):
    """dedup_ngram_jaccard: docs 'a b c d e f' and 'a b c d x y'
    share exactly the shingles {a b c, b c d} of each side's 4 — the
    emitted Jaccard must be exactly round(2/6, 6); a disjoint doc
    must produce no pair."""
    alt = _copy_tables(tmp_path, "jac")
    _docs(alt, ["a b c d e f", "a b c d x y", "p q r s t u"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _q("dedup_ngram_jaccard")(spark, str(alt)).collect()
    }
    assert got == {(0, 1): round(2 / 6, 6)}, got


def test_containment_detects_quote_inclusion(spark, tmp_path):
    """dedup_containment's reason to exist: a short document fully
    quoted inside a long one must score containment(short→long) = 1.0
    exactly while the symmetric Jaccard stays small — and the reverse
    direction carries the long doc's own (smaller) denominator ratio."""
    alt = _copy_tables(tmp_path, "cont")
    short = "the quick brown fox jumps over"
    long = short + " " + " ".join(f"filler{i}" for i in range(20))
    _docs(alt, [short, long])
    got = {
        (r.doc_src, r.doc_dst): r.containment
        for r in _q("dedup_containment")(spark, str(alt)).collect()
    }
    # short has 4 shingles, all inside long (26 tokens -> 24 shingles);
    # the quote boundary adds 2 bridging shingles NOT in short
    assert got[(0, 1)] == 1.0
    assert abs(got.get((1, 0), 0.0) - 4 / 24) < 1e-12 or (1, 0) not in got


def test_keyword_extract_tfidf_ranks_planted_rare_term(spark, tmp_path):
    """text_keyword_extract: a term appearing 3× in ONE of five docs
    (idf = ln 5) must top that doc's keywords with score exactly
    3·round(ln 5, 6) on the micro lattice, while words common to ALL
    docs score 0 (idf = ln 1) and can never outrank it."""
    import math

    alt = _copy_tables(tmp_path, "kw")
    common = "the market price report today"
    texts = [common + " zebra zebra zebra"] + [common] * 4
    _docs(alt, texts)
    rows = {
        r.doc_id: r for r in _q("text_keyword_extract")(spark, str(alt)).collect()
    }
    kw = rows[0].keywords.split("|")
    sc = [int(x) for x in rows[0].scores_micro.split("|")]
    assert kw[0] == "zebra"
    assert sc[0] == round(3 * round(math.log(5), 6) * 1e6)
    assert all(s == 0 for s in sc[1:])  # everything else is corpus-wide


def test_quantile_loss_asymmetry_and_median_anchor(spark, tmp_path):
    """ts_quantile_loss on hand-built steps: an UNDER-forecast year
    (actuals +10 above the seasonal-naive fc) must cost 1/5/9 at
    q = .1/.5/.9 — the high quantile punishes under-forecasting —
    while an OVER-forecast year reverses to 9/5/1; q = 0.5 equals
    half the MAE (= 5) in both, the textbook consistency anchor."""
    for name, year2, want in (
        ("under", 110.0, {1: 1.0, 5: 5.0, 9: 9.0}),
        ("over", 90.0, {1: 9.0, 5: 5.0, 9: 1.0}),
    ):
        alt = _copy_tables(tmp_path, f"ql_{name}")
        prios, prices, dates = [], [], []
        for m in range(24):
            prios.append("QL")
            prices.append(100.0 if m < 12 else year2)
            dates.append(pd.Timestamp(f"{2023 + m // 12}-{m % 12 + 1:02d}-15"))
        _orders(alt, prios, prices, dates)
        got = {
            r.k: r
            for r in _q("ts_quantile_loss")(spark, str(alt)).collect()
            if r.prio == "QL"
        }
        assert all(got[k].n_scored == 12 for k in (1, 5, 9))
        for k, v in want.items():
            assert got[k].pinball == v, (name, k, got[k].pinball, v)


def test_funnel_latency_hand_built_cohort(spark, tmp_path):
    """win_funnel_latency on a hand-built cohort: three converters at
    10/20/30 s first-view→first-purchase (lower median 20 s, sum 60 s);
    a purchase BEFORE the first view must not count as conversion (the
    ordering contract), and a viewer who never purchases must not
    appear among converters."""
    alt = _copy_tables(tmp_path, "flat")
    t0 = pd.Timestamp("2024-02-01 09:00:00")
    s = pd.Timedelta(seconds=1)
    rows = [
        # (user, type, t)
        (1, "view", t0), (1, "purchase", t0 + 10 * s),
        (2, "view", t0), (2, "purchase", t0 + 30 * s),
        # user 3: a purchase BEFORE the view (excluded), real one at +20s
        (3, "purchase", t0 - 100 * s), (3, "view", t0),
        (3, "purchase", t0 + 20 * s),
        (4, "view", t0),  # never converts
    ]
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[2] for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    out = _q("win_funnel_latency")(spark, str(alt)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_converters == 3
    assert r.p50_delta_us == 20_000_000
    assert r.sum_delta_us == 60_000_000


def test_ate_stratified_removes_planted_confound(spark, tmp_path):
    """ml_ate_stratified: activity determines BOTH the outcome base
    (105 low / 135 high) and — via the operator's own rising md5
    rate — the treatment probability; the true effect is exactly +10.
    The naive pooled treated-minus-control difference must OVERSTATE
    it (treated pool skews to the high-outcome stratum), while each
    stratum's mean_treat − mean_ctrl equals exactly 10.0 — the
    adjustment does its one job."""
    import hashlib

    def treated(uid: int, stratum: int) -> bool:
        d = int(hashlib.md5(f"ate:{uid}".encode()).hexdigest()[:8], 16) % 1000
        return d * 14 < (3 + stratum) * 1000

    alt = _copy_tables(tmp_path, "ate")
    rows = []
    eid = 0
    for uid in range(1, 201):
        lo = uid <= 100
        n_ev, stratum, base = (50, 1, 105.0) if lo else (80, 7, 135.0)
        y = base + (10.0 if treated(uid, stratum) else 0.0)
        for j in range(n_ev):
            rows.append((eid, uid, y))
            eid += 1
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp("2024-01-01")] * len(rows),
            "user_id": [r[1] for r in rows],
            "event_type": ["m"] * len(rows),
            "value": [r[2] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    out = {r.stratum: r for r in _q("ml_ate_stratified")(spark, str(alt)).collect()}
    assert set(out) == {1, 7}
    for s in (1, 7):
        r = out[s]
        assert r.n_users == 100
        assert r.mean_treat - r.mean_ctrl == 10.0, (s, r)
    # naive event-weighted pooled difference, from the same long form
    t_sum = sum(out[s].mean_treat * out[s].n_ev_t for s in (1, 7))
    c_sum = sum(out[s].mean_ctrl * out[s].n_ev_c for s in (1, 7))
    naive = t_sum / sum(out[s].n_ev_t for s in (1, 7)) - c_sum / sum(
        out[s].n_ev_c for s in (1, 7)
    )
    assert naive > 13.0, naive  # confounding inflates the naive readout


def test_lag_pct_change_hand_path(spark, tmp_path):
    """Day-over-day percent change on 100 → 150 → 120: NULL, +0.5,
    −0.2 exactly (integer-exact ratios of identical doubles)."""
    alt = _copy_tables(tmp_path, "pct")
    path = [100.0, 150.0, 120.0]
    dates = [
        pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
        for d in range(len(path))
    ]
    _orders(alt, ["PC"] * 3, path, dates)
    rows = sorted(
        (r for r in _q("win_lag_pct_change")(spark, str(alt)).collect()
         if r.o_orderpriority == "PC"),
        key=lambda r: r.d,
    )
    assert rows[0].pct_change is None
    assert rows[1].pct_change == 0.5
    assert rows[2].pct_change == -0.2


def test_weighted_sample_always_keeps_dominant_weight(spark, tmp_path):
    """Efraimidis–Spirakis contract: a document whose weight (token
    count) dwarfs the rest has key ln(u)/w ≈ 0 — the maximum — and
    must appear in EVERY draw; the sample is exactly k rows."""
    alt = _copy_tables(tmp_path, "wk")
    texts = ["w " * 5 for _ in range(100)] + ["w " * 2000]
    _docs(alt, [t.strip() for t in texts])
    rows = _q("sample_weighted_k")(spark, str(alt)).collect()
    ids = {r.doc_id for r in rows}
    assert 100 in ids  # the heavy doc
    assert len(rows) == len(ids)


def test_balanced_sample_equalizes_to_minority(spark, tmp_path):
    """sample_balanced: langs with 30/10/5 docs all downsample to
    exactly the minority count 5 — 15 rows, 5 per class."""
    import collections

    alt = _copy_tables(tmp_path, "bal")
    langs = ["en"] * 30 + ["fr"] * 10 + ["de"] * 5
    pd.DataFrame(
        {
            "doc_id": range(len(langs)),
            "text": ["hello world"] * len(langs),
            "lang": langs,
            "source": ["web"] * len(langs),
            "n_chars": [11] * len(langs),
        }
    ).to_parquet(alt / "documents.parquet")
    rows = _q("sample_balanced")(spark, str(alt)).collect()
    by = collections.Counter(r.lang for r in rows)
    assert by == {"en": 5, "fr": 5, "de": 5}


def test_scd2_build_hand_traced_versions(spark, tmp_path):
    """dim_scd2_build on the journey A,A,B,A: repeated states collapse
    (3 versions, not 4), each version's [valid_from, valid_to) chains
    exactly to the next change, and only the last is current."""
    alt = _copy_tables(tmp_path, "scd2")
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    h = pd.Timedelta(hours=1)
    rows = [("A", t0), ("A", t0 + h), ("B", t0 + 2 * h), ("A", t0 + 3 * h)]
    pd.DataFrame(
        {
            "event_id": range(4),
            "ts": [r[1] for r in rows],
            "user_id": [7] * 4,
            "event_type": [r[0] for r in rows],
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    out = sorted(
        (r for r in _q("dim_scd2_build")(spark, str(alt)).collect()
         if r.user_id == 7),
        key=lambda r: r.valid_from,
    )
    assert [r.event_type for r in out] == ["A", "B", "A"]
    assert pd.Timestamp(out[0].valid_from) == t0
    assert pd.Timestamp(out[0].valid_to) == t0 + 2 * h  # A spans both rows
    assert pd.Timestamp(out[1].valid_to) == t0 + 3 * h
    assert out[2].valid_to is None
    assert [r.is_current for r in out] == [0, 0, 1]


def test_freshness_planted_staleness(spark, tmp_path):
    """dq_freshness: a group whose newest order is exactly 9 days
    behind the table tip reports stale_days = 9; the tip group
    reports 0."""
    alt = _copy_tables(tmp_path, "fresh")
    tip = pd.Timestamp("2024-06-10")
    _orders(
        alt,
        ["LIVE", "LIVE", "STALE", "STALE"],
        [100.0] * 4,
        [tip, tip - pd.Timedelta(days=3), tip - pd.Timedelta(days=9),
         tip - pd.Timedelta(days=30)],
    )
    got = {r.prio: r for r in _q("dq_freshness")(spark, str(alt)).collect()}
    assert got["LIVE"].stale_days == 0 and got["LIVE"].n_orders == 2
    assert got["STALE"].stale_days == 9
    assert pd.Timestamp(got["STALE"].latest) == tip - pd.Timedelta(days=9)


def test_mode_tiebreak_and_topk_freq_order(spark, tmp_path):
    """agg_mode: on a planted tie (qty 3 and qty 7 both ×5) the
    documented deterministic tiebreak picks the SMALLER quantity; a
    clear winner elsewhere is returned with its exact count.
    agg_topk_freq on the same fixture must rank by count descending
    with value-ascending ties, pipe-serialized in exactly that
    order."""
    alt = _copy_tables(tmp_path, "mode")
    # brand/part plumbing: all lineitems hit one part of each brand
    pd.DataFrame(
        {
            "p_partkey": [1, 2],
            "p_name": ["a", "b"],
            "p_brand": ["TIE", "CLEAR"],
            "p_type": ["T", "T"],
            "p_size": [1, 1],
            "p_retailprice": [1.0, 1.0],
        }
    ).to_parquet(alt / "part.parquet")
    qt = [3.0] * 5 + [7.0] * 5 + [1.0] * 2      # TIE part: 3 and 7 tied
    qc = [4.0] * 6 + [9.0] * 3                   # CLEAR part: 4 wins
    flags = ["T"] * len(qt) + ["C"] * len(qc)
    pd.DataFrame(
        {
            "l_orderkey": range(len(flags)),
            "l_linenumber": [1] * len(flags),
            "l_partkey": [1] * len(qt) + [2] * len(qc),
            "l_suppkey": [1] * len(flags),
            "l_quantity": qt + qc,
            "l_extendedprice": [10.0] * len(flags),
            "l_discount": [0.0] * len(flags),
            "l_tax": [0.0] * len(flags),
            "l_returnflag": flags,
            "l_shipdate": [pd.Timestamp("2024-01-01")] * len(flags),
            "l_shipmode": ["AIR"] * len(flags),
        }
    ).to_parquet(alt / "lineitem.parquet", coerce_timestamps="us")
    mode = {r.p_brand: r for r in _q("agg_mode")(spark, str(alt)).collect()}
    assert (mode["TIE"].modal_qty, mode["TIE"].modal_n) == (3, 5)
    assert (mode["CLEAR"].modal_qty, mode["CLEAR"].modal_n) == (4, 6)
    tf = {
        r.l_returnflag: r for r in _q("agg_topk_freq")(spark, str(alt)).collect()
    }
    assert tf["T"].top_values.split("|")[:3] == ["3", "7", "1"]
    assert tf["T"].top_counts.split("|")[:3] == ["5", "5", "2"]
    assert tf["C"].top_values.split("|")[:2] == ["4", "9"]


def _asof_fixture(tmp_path):
    """Two index days (Jan 1 = 100, Jan 10 = 200, priority P) and four
    probes: Jan 5 (between), Jan 10 (exact), Jan 15 (after last,
    staleness 5), Dec 20 (before first)."""
    alt = _copy_tables(tmp_path, "asof")
    pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [100.0, 200.0],
            "o_orderdate": [pd.Timestamp("2024-01-01"),
                            pd.Timestamp("2024-01-10")],
            "o_orderpriority": ["P", "P"],
        }
    ).to_parquet(alt / "orders.parquet", coerce_timestamps="us")
    ships = [
        (1, 1, "2024-01-05"),
        (2, 1, "2024-01-10"),
        (2, 2, "2024-01-15"),
        (1, 2, "2023-12-20"),
    ]
    pd.DataFrame(
        {
            "l_orderkey": [s[0] for s in ships],
            "l_linenumber": [s[1] for s in ships],
            "l_partkey": [1] * 4,
            "l_suppkey": [1] * 4,
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["A"] * 4,
            "l_shipdate": [pd.Timestamp(s[2]) for s in ships],
            "l_shipmode": ["AIR"] * 4,
        }
    ).to_parquet(alt / "lineitem.parquet", coerce_timestamps="us")
    return str(alt)


def test_asof_family_hand_traced(spark, tmp_path):
    """The four as-of semantics on ONE hand-built timeline (index
    Jan 1 = 100, Jan 10 = 200): backward picks the latest ≤ sd and
    drops pre-range probes; nearest is bidirectional with
    earlier-wins ties and a ±7d band; tolerance NULLs a match staler
    than 7 days but keeps the row (LEFT); forward picks the earliest
    ≥ sd and drops probes past the last index day."""
    fx = _asof_fixture(tmp_path)
    key = lambda r: (r.l_orderkey, r.l_linenumber)

    back = {key(r): r for r in _q("join_asof_prices")(spark, fx).collect()}
    assert pd.Timestamp(back[(1, 1)].idx_date) == pd.Timestamp("2024-01-01")
    assert back[(1, 1)].idx_val == 100.0
    assert pd.Timestamp(back[(2, 1)].idx_date) == pd.Timestamp("2024-01-10")
    assert back[(2, 1)].idx_val == 200.0
    assert pd.Timestamp(back[(2, 2)].idx_date) == pd.Timestamp("2024-01-10")
    assert (1, 2) not in back  # before the first index day: inner as-of

    near = {key(r): r for r in _q("join_asof_nearest")(spark, fx).collect()}
    n11 = near[(1, 1)]  # 4 days back beats 5 days forward
    assert pd.Timestamp(n11.idx_date) == pd.Timestamp("2024-01-01")
    assert n11.day_dist == 4
    assert near[(2, 1)].day_dist == 0
    assert near[(2, 2)].day_dist == 5  # Jan 10, within the ±7 band
    assert (1, 2) not in near  # Dec 20 is 12 days from Jan 1: outside band

    tol = {key(r): r for r in _q("join_asof_tolerance")(spark, fx).collect()}
    assert tol[(1, 1)].idx_val == 100.0  # 4 days old: fresh enough
    assert tol[(2, 2)].idx_val == 200.0  # 5 days old: fresh enough
    assert (1, 2) in tol and tol[(1, 2)].idx_val is None  # LEFT keeps it

    fwd = {key(r): r for r in _q("join_asof_forward")(spark, fx).collect()}
    assert pd.Timestamp(fwd[(1, 1)].idx_date) == pd.Timestamp("2024-01-10")
    assert fwd[(1, 1)].idx_val == 200.0
    assert fwd[(2, 1)].idx_val == 200.0  # exact day counts as at-or-after
    assert pd.Timestamp(fwd[(1, 2)].idx_date) == pd.Timestamp("2024-01-01")
    assert (2, 2) not in fwd  # past the last index day


def test_interval_events_boundary_semantics(spark, tmp_path):
    """join_interval_events' window bounds, pinned at the edges: a
    purchase exactly AT the click instant is excluded (strict >), one
    exactly at +5:00 is included (inclusive <=), one at +5:00.000001
    is out; other users' purchases never count; a purchase-less click
    still emits its zero row (LEFT)."""
    alt = _copy_tables(tmp_path, "ivev")
    t0 = pd.Timestamp("2024-04-01 12:00:00")
    rows = [
        (1, 1, "click", t0),
        (2, 1, "purchase", t0),                               # excluded: ==
        (3, 1, "purchase", t0 + pd.Timedelta(minutes=5)),     # included
        (4, 1, "purchase",
         t0 + pd.Timedelta(minutes=5, microseconds=1)),       # excluded
        (5, 2, "purchase", t0 + pd.Timedelta(minutes=1)),     # other user
        (6, 3, "click", t0),                                  # never buys
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[3] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    got = {
        r.event_id: r.n_purchases_5m
        for r in _q("join_interval_events")(spark, str(alt)).collect()
    }
    assert got == {1: 1, 6: 0}


def test_contamination_exact_hit_accounting(spark, tmp_path):
    """dedup_contamination: benchmark doc 0 ('alpha beta gamma delta',
    two 3-gram shingles) is quoted partially by one training doc and
    fully by another — n_hit_shingles = 2 distinct, n_contaminating
    = 2; benchmark doc 97 with unique text emits NO row (clean means
    absent, not zero)."""
    alt = _copy_tables(tmp_path, "contam")
    texts = {}
    texts[0] = "alpha beta gamma delta"                      # bench (0 % 97)
    texts[97] = "unique benchmark content nothing shares"    # bench, clean
    texts[1] = "intro words alpha beta gamma closing words"  # partial quote
    texts[2] = "alpha beta gamma delta verbatim copy here"   # full quote
    texts[3] = "completely unrelated training document text"
    ids = sorted(texts)
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": [texts[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["web"] * len(ids),
            "n_chars": [len(texts[i]) for i in ids],
        }
    ).to_parquet(alt / "documents.parquet")
    got = {
        r.bench_id: (r.n_hit_shingles, r.n_contaminating_docs)
        for r in _q("dedup_contamination")(spark, str(alt)).collect()
    }
    assert got == {0: (2, 2)}


def test_padding_waste_exact_ledger_and_boundary(spark, tmp_path):
    """pack_padding_waste: token counts 10 and 16 land in the 16-cap
    bucket (an EXACT power of two stays in its own bucket — the <=
    rule), 17 spills to 32, 100 to 128; padding sums and waste ratios
    are exact integer arithmetic."""
    alt = _copy_tables(tmp_path, "pw")
    texts = [
        " ".join(["w"] * 10),
        " ".join(["w"] * 16),
        " ".join(["w"] * 17),
        " ".join(["w"] * 100),
    ]
    _docs(alt, texts)
    got = {
        r.bucket_cap: r
        for r in _q("pack_padding_waste")(spark, str(alt)).collect()
    }
    assert set(got) == {16, 32, 128}
    b16 = got[16]
    assert (b16.n_docs, b16.sum_tokens, b16.sum_padding) == (2, 26, 6)
    assert b16.waste_ratio == 6 / 32
    assert (got[32].sum_padding, got[32].waste_ratio) == (15, 15 / 32)
    assert (got[128].sum_padding, got[128].waste_ratio) == (28, 28 / 128)


def test_normalized_dedup_collapses_case_and_whitespace(spark, tmp_path):
    """dedup_exact_normalized: 'Hello  World', 'hello world', and
    '  HELLO\\tWORLD ' are one normalized group (3 members, 3 raw
    variants, keeper = min doc_id) that byte-exact hashing would treat
    as three; an unrelated doc stays its own singleton."""
    alt = _copy_tables(tmp_path, "norm")
    _docs(alt, ["Hello  World", "hello world", "  HELLO\tWORLD ", "other"])
    rows = _q("dedup_exact_normalized")(spark, str(alt)).collect()
    groups = {r.keep_doc_id: (r.n_members, r.n_raw_variants) for r in rows}
    assert groups == {0: (3, 3), 3: (1, 1)}


def test_cume_dist_and_ntile_hand_traced(spark, tmp_path):
    """win_cume_dist on 4 distinct prices (> the 400k filter):
    percent_rank = (rank−1)/(n−1) and cume_dist = rank/n land on the
    exact quarter lattice. win_ntile_buckets on 23 customers in one
    segment: NTILE(10) gives three 3-member deciles then seven of 2
    (the remainder-first rule), with bucket min/max respecting the
    descending balance order."""
    alt = _copy_tables(tmp_path, "rankwin")
    prices = [500000.0, 600000.0, 700000.0, 800000.0]
    _orders(alt, ["R"] * 4, prices)
    cd = {
        r.o_orderkey: r for r in _q("win_cume_dist")(spark, str(alt)).collect()
    }
    assert [cd[k].pct_rank for k in sorted(cd)] == [0.0, 1 / 3, 2 / 3, 1.0]
    assert [cd[k].cum_dist for k in sorted(cd)] == [0.25, 0.5, 0.75, 1.0]

    n = 23
    pd.DataFrame(
        {
            "c_custkey": range(n),
            "c_name": ["c"] * n,
            "c_nationkey": [1] * n,
            "c_acctbal": [float(1000 - i) for i in range(n)],
            "c_mktsegment": ["SEG"] * n,
        }
    ).to_parquet(alt / "customer.parquet")
    rows = sorted(
        _q("win_ntile_buckets")(spark, str(alt)).collect(),
        key=lambda r: r.decile,
    )
    assert [r.n_customers for r in rows] == [3, 3, 3] + [2] * 7
    assert rows[0].max_bal == 1000.0 and rows[0].min_bal == 998.0
    assert rows[-1].min_bal == 978.0  # the smallest balance, last decile


def test_ngram_novelty_exact_fractions(spark, tmp_path):
    """text_ngram_novelty: batch doc 7 shares exactly one of its three
    3-grams with the corpus (novelty 2/3), doc 17 is fully novel
    (1.0), doc 27 is a verbatim corpus copy (0.0) — the data-valuation
    fractions are exact integer ratios."""
    alt = _copy_tables(tmp_path, "nov")
    texts = {
        7: "a b c d e",                       # batch: abc shared
        17: "p q r s t u",                    # batch: fully novel
        27: "x y z w v",                      # batch: verbatim of doc 2
        1: "a b c filler words here",         # corpus
        2: "x y z w v",                       # corpus
        3: "unrelated corpus content row",    # corpus
    }
    ids = sorted(texts)
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": [texts[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["web"] * len(ids),
            "n_chars": [len(texts[i]) for i in ids],
        }
    ).to_parquet(alt / "documents.parquet")
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in _q("text_ngram_novelty")(spark, str(alt)).collect()
    }
    assert got[7] == (3, 2, 2 / 3)
    assert got[17] == (4, 4, 1.0)
    assert got[27] == (3, 0, 0.0)


def test_exact_substring_shared_span_accounting(spark, tmp_path):
    """dedup_exact_substring: doc B copies a 9-token span of doc A —
    exactly the two 8-token grams inside that span are shared on BOTH
    sides (2/5 each with 12-token docs); an untouched doc reports
    zero duplication."""
    alt = _copy_tables(tmp_path, "sub")
    a_toks = [f"w{i}" for i in range(1, 13)]
    b_toks = a_toks[:9] + ["b10", "b11", "b12"]
    c_toks = [f"c{i}" for i in range(1, 13)]
    _docs(alt, [" ".join(a_toks), " ".join(b_toks), " ".join(c_toks)])
    got = {
        r.doc_id: (r.n_grams, r.n_shared, r.dup_fraction)
        for r in _q("dedup_exact_substring")(spark, str(alt)).collect()
    }
    assert got[0] == (5, 2, 2 / 5)
    assert got[1] == (5, 2, 2 / 5)
    assert got[2] == (5, 0, 0.0)


def test_rank_topk_dense_tie_window(spark, tmp_path):
    """win_rank_topk with a planted three-way balance tie straddling
    the k=5 boundary: the custkey tiebreaker in the ORDER makes ranks
    unique and total, so exactly the 5 highest balances survive with
    ties broken toward the smaller key — the cut is deterministic,
    never a 6-or-7-row RANK spill."""
    alt = _copy_tables(tmp_path, "topk")
    bals = [900.0, 800.0, 700.0, 700.0, 700.0, 600.0, 500.0]
    n = len(bals)
    pd.DataFrame(
        {
            "c_custkey": range(n),
            "c_name": ["c"] * n,
            "c_nationkey": [1] * n,
            "c_acctbal": bals,
            "c_mktsegment": ["S"] * n,
        }
    ).to_parquet(alt / "customer.parquet")
    rows = sorted(
        _q("win_rank_topk")(spark, str(alt)).collect(), key=lambda r: r.rnk
    )
    assert [r.c_custkey for r in rows] == [0, 1, 2, 3, 4]
    assert [r.rnk for r in rows] == [1, 2, 3, 4, 5]
    assert rows[-1].c_acctbal == 700.0  # the 600/500 rows are out


def test_fingerprint_min_shingle_collision_property(spark, tmp_path):
    """text_fingerprint's pre-cluster contract: two docs sharing their
    minimum-hash 3-gram collide on min_shingle_hash even when their
    full hashes differ; the min is verified against a direct Python
    md5 over every shingle; a short (<3 token) doc falls back to its
    full hash."""
    import hashlib

    alt = _copy_tables(tmp_path, "fp")
    a = "alpha beta gamma delta epsilon"
    b = "zzz alpha beta gamma yyy"  # shares shingle 'alpha beta gamma'
    short = "two tokens"
    _docs(alt, [a, b, short])
    got = {
        r.doc_id: r for r in _q("text_fingerprint")(spark, str(alt)).collect()
    }

    def min_shingle(text):
        toks = text.split(" ")
        sh = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        return min(hashlib.md5(s.encode()).hexdigest() for s in sh)

    assert got[0].min_shingle_hash == min_shingle(a)
    assert got[1].min_shingle_hash == min_shingle(b)
    assert got[0].full_hash != got[1].full_hash
    if min_shingle(a) == min_shingle(b):  # data-dependent, verify both ways
        assert got[0].min_shingle_hash == got[1].min_shingle_hash
    assert got[2].min_shingle_hash == hashlib.md5(short.encode()).hexdigest()


def test_first_last_unbounded_frame_trap(spark, tmp_path):
    """win_first_last's explicit unbounded frame, pinned on a 3-day
    path: EVERY row reports the chronologically first (100) and last
    (300) price — last_value's default up-to-current-row frame (the
    classic wrong answer) would instead return each row's own price."""
    alt = _copy_tables(tmp_path, "fl")
    dates = [pd.Timestamp("2024-01-01") + pd.Timedelta(days=d) for d in (0, 1, 2)]
    _orders(alt, ["FL"] * 3, [100.0, 200.0, 300.0], dates)
    rows = [
        r for r in _q("win_first_last")(spark, str(alt)).collect()
        if r.o_orderpriority == "FL"
    ]
    assert len(rows) == 3
    for r in rows:
        assert r.first_price == 100.0 and r.last_price == 300.0


def test_profile_exact_null_and_distinct_counts(spark, tmp_path):
    """dq_profile on a hand-built lineitem: 2 planted nulls in
    l_quantity and exactly 3 distinct return flags are counted
    precisely; n_rows is constant across columns; min/max string
    representations match the planted extremes."""
    alt = _copy_tables(tmp_path, "prof")
    n = 10
    pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_linenumber": [1] * n,
            "l_partkey": [1] * n,
            "l_suppkey": [1] * n,
            "l_quantity": [float(i) for i in range(8)] + [None, None],
            "l_extendedprice": [100.0 + i for i in range(n)],
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": ["A", "B", "C", "A", "B", "C", "A", "B", "C", "A"],
            "l_shipdate": [pd.Timestamp("2024-01-01")] * n,
            "l_shipmode": ["AIR"] * n,
        }
    ).to_parquet(alt / "lineitem.parquet", coerce_timestamps="us")
    got = {r.col_name: r for r in _q("dq_profile")(spark, str(alt)).collect()}
    assert all(got[c].n_rows == n for c in got)
    q = got["l_quantity"]
    assert (q.n_nulls, q.n_distinct) == (2, 8)
    assert (q.min_repr, q.max_repr) == ("0.0", "7.0")
    assert (got["l_returnflag"].n_distinct, got["l_returnflag"].n_nulls) \
        == (3, 0)
    assert got["l_orderkey"].n_distinct == n


def test_mix_domains_exact_language_quotas(spark, tmp_path):
    """mix_domains' quota contract on an abundant planted corpus:
    exactly floor(w·200) documents per language — en 80, the rest 30
    — totaling the 200-doc slice, whatever the per-language surplus."""
    import collections

    base_rows = []
    did = 0
    for lang in ("en", "de", "es", "fr", "zh"):
        for _ in range(120):
            base_rows.append((did, lang))
            did += 1
    alt = _copy_tables(tmp_path, "mix")
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in base_rows],
            "text": ["hello world"] * len(base_rows),
            "lang": [r[1] for r in base_rows],
            "source": ["web"] * len(base_rows),
            "n_chars": [11] * len(base_rows),
        }
    ).to_parquet(alt / "documents.parquet")
    rows = _q("mix_domains")(spark, str(alt)).collect()
    by = collections.Counter(r.lang for r in rows)
    assert by == {"en": 80, "de": 30, "es": 30, "fr": 30, "zh": 30}
    assert sum(by.values()) == 200


def test_pit_features_never_leak_same_instant_or_future(spark, tmp_path):
    """Formula pin for ml_pit_features' leakage contract: a purchase
    label must see ONLY strictly-before history. Planted traps: a
    same-instant sibling event (must be excluded — 'ts < label.ts',
    not '<='), a future high-value event (must be invisible), and a
    first-ever-event purchase (all-zero features, not a peek at
    itself)."""
    alt = _copy_tables(tmp_path, "pitleak")
    base = pd.Timestamp("2024-03-01")
    rows = [
        # user 1: view day0 (v=10), PURCHASE day1 (label), view day2
        # (v=10000 — future, must not leak)
        (100, base, 1, "view", 10.0),
        (101, base + pd.Timedelta(days=1), 1, "purchase", 999.0),
        (102, base + pd.Timedelta(days=2), 1, "view", 10000.0),
        # user 2: PURCHASE and a sibling view at the SAME microsecond —
        # both are same-instant, so features must be all zero
        (200, base, 2, "purchase", 5.0),
        (201, base, 2, "view", 7.0),
        # user 3: purchase 10 days after a view — outside the 7d window
        # but inside lifetime
        (300, base, 3, "view", 50.0),
        (301, base + pd.Timedelta(days=10), 3, "purchase", 1.0),
    ]
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(f"{alt}/events.parquet", coerce_timestamps="us")
    out = {
        r.event_id: r for r in _q("ml_pit_features")(spark, alt).collect()
    }
    assert set(out) == {101, 200, 301}
    r1 = out[101]  # sees ONLY the day-0 view
    assert (r1.n_prior, r1.sum_prior, r1.n_7d) == (1, 10.0, 1)
    assert r1.day_idx == 1
    r2 = out[200]  # same-instant sibling excluded -> all zeros
    assert (r2.n_prior, r2.sum_prior, r2.n_7d) == (0, 0.0, 0)
    assert r2.day_idx == 0
    r3 = out[301]  # lifetime sees the view, the 7d window does not
    assert (r3.n_prior, r3.sum_prior, r3.n_7d) == (1, 50.0, 0)
    assert r3.day_idx == 10


def test_ridge_closed_form_matches_numpy_solver(spark, sf_dir):
    """Formula pin for ml_ridge_closed_form: both engines share the
    centered-normal-equations algebra, so a shared derivation error
    would pass the oracle. numpy solves the same ridge problem
    ((Xc'Xc + lambda I) beta = Xc'y on centered features) from the raw
    rows; coefficients and intercept must agree to the operator's
    ROUND(6)."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
        )
        .collect()
    )
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.l_returnflag, []).append(
            (float(r.l_quantity), float(r.l_discount),
             float(r.l_extendedprice))
        )
    out = {r.grp: r for r in _q("ml_ridge_closed_form")(spark, sf_dir).collect()}
    assert set(out) == set(by_grp)
    for grp, data in by_grp.items():
        a = np.array(data, dtype=np.float64)
        X, y = a[:, :2], a[:, 2]
        Xc = X - X.mean(axis=0)
        yc = y - y.mean()
        beta = np.linalg.solve(Xc.T @ Xc + 10.0 * np.eye(2), Xc.T @ yc)
        intercept = (y.sum() - beta[0] * X[:, 0].sum()
                     - beta[1] * X[:, 1].sum()) / len(y)
        r = out[grp]
        assert abs(r.beta1 - beta[0]) < 1e-4, (grp, r.beta1, beta[0])
        assert abs(r.beta2 - beta[1]) < 1e-4, (grp, r.beta2, beta[1])
        assert abs(r.intercept - intercept) < 1e-4


def test_neyman_allocation_proportional_to_nh_sigma(spark, sf_dir):
    """Formula pin for sample_neyman: the allocation must be the
    Neyman optimum n_h = round(B * N_h*sd_h / sum(N*sd)) with the
    TEXTBOOK sample sd (ddof=1), replayed in numpy from the raw rows;
    realized counts must equal the allocation exactly."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.l_returnflag, []).append(
            float(r.l_extendedprice)
        )
    out = {r.grp: r for r in _q("sample_neyman")(spark, sf_dir).collect()}
    w = {
        g: len(v) * round(float(np.std(v, ddof=1)), 6)
        for g, v in by_grp.items()
    }
    tot = sum(w.values())
    for g, r in out.items():
        assert r.n_pop == len(by_grp[g])
        assert abs(r.sd - round(float(np.std(by_grp[g], ddof=1)), 6)) < 2e-6
        expect = int(np.floor(
            _NEYMAN_BUDGET * (w[g] / tot) + 0.5
        ))
        assert r.alloc_n == expect, (g, r.alloc_n, expect)
        assert r.n_sampled == r.alloc_n


def test_kfold_cv_matches_numpy_per_fold_fit_and_heldout_rmse(
    spark, sf_dir
):
    """Formula pin for ml_kfold_cv: the leave-fold-out sufficient-
    statistics subtraction must yield EXACTLY the model a direct
    train-rows-only numpy fit produces, and the held-out RMSE must
    match numpy's on the same fold — proving no row leaks between
    train and test and the DECIMAL complement algebra is lossless."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_returnflag", "l_orderkey", "l_quantity", "l_discount",
            "l_extendedprice",
        )
        .collect()
    )
    data = {}
    for r in rows:
        data.setdefault((r.l_returnflag, r.l_orderkey % 5), []).append(
            (float(r.l_quantity), float(r.l_discount),
             float(r.l_extendedprice))
        )
    out = {
        (r.grp, r.fold): r for r in _q("ml_kfold_cv")(spark, sf_dir).collect()
    }
    grps = {g for g, _ in data}
    for g in grps:
        for f in range(5):
            if (g, f) not in out:
                continue
            train = np.array(
                [x for (gg, ff), v in data.items()
                 if gg == g and ff != f for x in v]
            )
            test = np.array(data[(g, f)])
            X, yv = train[:, :2], train[:, 2]
            Xc = X - X.mean(axis=0)
            beta = np.linalg.solve(
                Xc.T @ Xc + 10.0 * np.eye(2), Xc.T @ (yv - yv.mean())
            )
            icept = (
                yv.sum() - beta[0] * X[:, 0].sum() - beta[1] * X[:, 1].sum()
            ) / len(yv)
            r = out[(g, f)]
            assert r.n_train == len(train) and r.n_test == len(test)
            assert abs(r.beta1 - beta[0]) < 1e-4
            assert abs(r.beta2 - beta[1]) < 1e-4
            assert abs(r.intercept - icept) < 1e-4
            # held-out RMSE with the op's ROUNDED betas (its contract)
            pred = r.intercept + r.beta1 * test[:, 0] + r.beta2 * test[:, 1]
            sse = sum(
                int(np.floor(e * e * 100 + 0.5))
                for e in (test[:, 2] - pred)
            )
            assert abs(r.rmse - ((sse / 100.0) / len(test)) ** 0.5) < 1e-9
