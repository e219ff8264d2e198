"""Planted-signal property tests for the r8 statistical operators
(VERDICT r8 item 1). The DuckDB oracle proves CROSS-ENGINE agreement,
not statistical correctness — both engines could share one wrong
formula. Each test here plants a known signal in a synthetic events
table and asserts the detector fires on it (and does NOT fire on the
matched null): Granger's F on a lag-1 x→y dependence and not the
reverse; Hurst ≈ 0.5 on md5-noise and high on a trending series;
Mann-Kendall on a monotone drift and not on trendless jitter; the SPC
runs rules on a sustained ~2σ shift that the 3σ R1 rule never sees.

Fixture pattern: tests/test_new_ops.py's ts_theil_sen planted-outlier
test (copy the sf0.001 tables, overwrite events.parquet)."""

from __future__ import annotations

import hashlib
import shutil

import pandas as pd

from agri_market_data_pipeline_spark.registry import all_queries

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _q(name):
    return all_queries()[name]


def _noise(tag: str, i: int) -> float:
    """Deterministic uniform[0,1) — md5 of a tagged index, so the
    fixture is bit-identical on every run (no RNG seeds to drift)."""
    return int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16) / 2**32


def _planted(tmp_path, name: str, types, values, days) -> str:
    """Copy the sf0.001 tables into tmp and overwrite events with one
    row per (type, day): day d gets ts = 2024-01-01 + d days."""
    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    n = len(values)
    ev = pd.DataFrame(
        {
            "event_id": list(range(n)),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([d * 24 for d in days], unit="h"),
            "user_id": [1] * n,
            "event_type": types,
            "value": [float(v) for v in values],
            "props": ["{}"] * n,
        }
    )
    ev.to_parquet(alt / "events.parquet", coerce_timestamps="us")
    return str(alt)


def _interleave(series: dict[str, list[float]]):
    """(types, values, days) with one row per type per day, day-major —
    every type shares the same day axis so the pair joins align."""
    keys = sorted(series)
    n = len(series[keys[0]])
    types, values, days = [], [], []
    for i in range(n):
        for k in keys:
            types.append(k)
            values.append(series[k][i])
            days.append(i)
    return types, values, days


def test_granger_fires_on_planted_lag_and_not_reverse(spark, tmp_path):
    """y_t = 0.8·x_{t-1} + ε with x iid noise: the (cause=xs,
    effect=ys) F statistic must be far beyond the F(1, n-3) 1%
    critical value (~6.8) while the reverse direction — which has no
    predictive content by construction — stays below it."""
    n = 200
    x = [_noise("gx", i) for i in range(n)]
    y = [0.0] + [0.8 * x[i - 1] + 0.05 * _noise("gy", i) for i in range(1, n)]
    types, values, days = _interleave({"xs": x, "ys": y})
    alt = _planted(tmp_path, "granger", types, values, days)
    rows = {
        (r.cause, r.effect): r.f_stat
        for r in _q("ts_granger_causality")(spark, alt).collect()
    }
    assert set(rows) == {("xs", "ys"), ("ys", "xs")}
    assert rows[("xs", "ys")] > 30, rows
    assert rows[("ys", "xs")] < 6.8, rows


def test_hurst_noise_half_and_trend_high(spark, tmp_path):
    """R/S analysis: iid md5-noise must sit near H = 0.5 (classical
    small-sample R/S bias runs slightly high, hence the 0.3–0.75
    band), while a deterministic trend + small noise — maximal
    persistence — must land far above it."""
    n = 256
    noise = [_noise("hn", i) for i in range(n)]
    trend = [0.1 * i + 0.2 * _noise("ht", i) for i in range(n)]
    types, values, days = _interleave({"noisy": noise, "trendy": trend})
    alt = _planted(tmp_path, "hurst", types, values, days)
    got = {
        r.event_type: (r.hurst, r.n_scales)
        for r in _q("ts_hurst_exponent")(spark, alt).collect()
    }
    assert set(got) == {"noisy", "trendy"}
    h_noise, k_noise = got["noisy"]
    h_trend, k_trend = got["trendy"]
    assert k_noise == 4 and k_trend == 4  # all of n in {8,16,32,64} fit
    assert 0.3 < h_noise < 0.75, h_noise
    assert h_trend > 0.85, h_trend
    assert h_trend > h_noise + 0.15


def test_mann_kendall_fires_on_drift_not_on_jitter(spark, tmp_path):
    """A monotone drift must push |z_mk| far beyond the 99.9% normal
    quantile while trendless alternating jitter stays inside ±2. The
    drift series is strictly increasing, so S = n(n-1)/2 exactly."""
    n = 100
    drift = [i + 0.1 * _noise("mkd", i) for i in range(n)]
    jitter = [
        (1 if i % 2 == 0 else -1) * (1 + 0.01 * _noise("mkj", i))
        for i in range(n)
    ]
    types, values, days = _interleave({"drift": drift, "jitter": jitter})
    alt = _planted(tmp_path, "mk", types, values, days)
    got = {
        r.event_type: r
        for r in _q("ts_mann_kendall")(spark, alt).collect()
    }
    assert set(got) == {"drift", "jitter"}
    assert got["drift"].s_stat == n * (n - 1) // 2  # strictly monotone
    assert got["drift"].z_mk > 10, got["drift"]
    assert abs(got["jitter"].z_mk) < 2, got["jitter"]


def test_spc_runs_rules_catch_sustained_shift_r1_misses(spark, tmp_path):
    """The Western-Electric escalation: 100 baseline days alternating
    ±0.5 then 12 days at ~2σ. The shift never crosses 3σ — R1 (the
    memoryless anomaly_zscore rule) is silent everywhere — but the
    runs rules fire inside the shift window (R4: 8 consecutive on one
    side; R2: 2-of-3 beyond 2σ), and nothing fires in the pure
    baseline region."""
    base_n, shift_n = 100, 12
    vals = [
        (0.5 if i % 2 == 0 else -0.5) + 0.01 * _noise("spc", i)
        for i in range(base_n)
    ] + [2.0 + 0.01 * _noise("spc", base_n + j) for j in range(shift_n)]
    types = ["shifted"] * len(vals)
    alt = _planted(tmp_path, "spc", types, vals, list(range(len(vals))))
    rows = sorted(
        _q("win_spc_runs_rules")(spark, alt).collect(),
        key=lambda r: r.day_no,
    )
    assert len(rows) == base_n + shift_n
    day0 = rows[0].day_no
    # R1 (|z| > 3) never fires: the shift is sustained-but-small
    assert all(r.r1 == 0 for r in rows)
    # pure-baseline region (frames end before the shift): no signal
    for r in rows:
        if r.day_no - day0 < base_n:
            assert r.any_signal == 0, (r.day_no - day0, r)
    # the shift window fires R4 (8 consecutive one side) and R2
    shift_rows = [r for r in rows if r.day_no - day0 >= base_n]
    assert any(r.r4 == 1 for r in shift_rows)
    assert any(r.r2 == 1 for r in shift_rows)
    assert any(r.any_signal == 1 for r in shift_rows)


def test_lttb_parallel_tracks_sequential_steinarsson(spark, tmp_path):
    """Pins ts_downsample_lttb's bucket-average-anchor approximation
    against the TRUE sequential LTTB (Steinarsson 2013: the previous
    anchor is the previously SELECTED point, not the previous bucket's
    average) on the same rank buckets — the 'accepted parallel form'
    claim becomes a measured selection-overlap bound (VERDICT r8 item
    8). On a 480-day fixture the measured overlap is 17/24 (smooth
    sine) and 15/24 (noise with planted spikes); the pin is >= 12/24
    per series, plus exact first/last endpoint agreement. The real
    testdata spans only 30 days (1-2 points per bucket, overlap
    trivially 1.0), hence the planted long series."""
    import numpy as np

    n = 480
    series = {
        "wiggly": [
            _noise("lt", i) + (3.0 if i % 37 == 0 else 0.0)
            for i in range(n)
        ],
        "smooth": [
            float(np.sin(i / 20)) + 0.05 * _noise("ls", i)
            for i in range(n)
        ],
    }
    types, values, days = _interleave(series)
    alt = _planted(tmp_path, "lttb", types, values, days)
    ops_sel: dict[str, set] = {}
    for r in _q("ts_downsample_lttb")(spark, alt).collect():
        ops_sel.setdefault(r.event_type, set()).add(r.day_no)

    ev = pd.read_parquet(f"{alt}/events.parquet")
    ev["day"] = (
        ev.ts.values.astype("datetime64[us]").astype("int64") // 86400000000
    )
    daily = ev.groupby(["event_type", "day"]).value.mean().reset_index()
    B = 24
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        m = len(g)
        rn = np.arange(1, m + 1)
        g["bkt"] = (rn - 1) * B // m
        maxb = int(g.bkt.max())
        first = g[g.bkt == 0].iloc[0]
        seq = [first.day]
        prev = (float(first.day), float(first.value))
        for k in range(1, maxb):
            cur = g[g.bkt == k]
            nxt = g[g.bkt == k + 1]
            nx, ny = float(nxt.day.mean()), float(nxt.value.mean())
            px, py = prev
            a = abs(
                (px - nx) * (cur.value - py) - (px - cur.day) * (ny - py)
            )
            pick = (
                cur.assign(a=a)
                .sort_values(["a", "day"], ascending=[False, True])
                .iloc[0]
            )
            seq.append(pick.day)
            prev = (float(pick.day), float(pick.value))
        last = g[g.bkt == maxb].iloc[-1]
        seq.append(last.day)
        got = ops_sel[et]
        assert len(got) == len(seq) == B  # one pick per bucket, both
        assert first.day in got and last.day in got  # endpoints verbatim
        overlap = len(set(seq) & got) / len(seq)
        assert overlap >= 0.5, (et, overlap)


def test_var_cvar_captures_planted_crashes(spark, tmp_path):
    """ts_var_cvar must identify a planted tail: 200 days of small
    md5-noise drift with 10 planted one-day crashes of about -5. With
    n = 199 returns, k = ceil(0.05·199) = 10, so the tail is exactly
    the 10 crash days: VaR sits at the shallowest crash (~ -5 ± the
    rebound noise) and CVaR at the tail mean, with CVaR <= VaR by
    construction (the coherence property)."""
    n = 200
    vals, level = [], 100.0
    for i in range(n):
        if i > 0 and i % 20 == 10:
            level -= 5.0  # planted crash
        else:
            level += 0.2 * (_noise("vc", i) - 0.5)
        vals.append(level)
    alt = _planted(
        tmp_path, "vc", ["asset"] * n, vals, list(range(n))
    )
    rows = _q("ts_var_cvar")(spark, alt).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_ret == n - 1 and r.k_tail == 10
    assert -5.2 < r.var_95 < -4.8, r.var_95
    assert r.cvar_95 <= r.var_95
    assert -5.2 < r.cvar_95 < -4.8, r.cvar_95


def test_permutation_test_fires_on_planted_effect(spark, tmp_path):
    """A planted treatment effect (value = 10 + 5·variant + noise,
    where variant is the SAME md5 user assignment the operator uses)
    must yield p_value = 0 — no random relabeling reaches the real
    5-unit gap — while a null fixture (value independent of the
    assignment) must not be called significant (p well above 0.05).
    Both fixtures are md5-deterministic, so the pins are exact."""
    import hashlib as _h

    def variant(uid: int) -> int:
        return int(_h.md5(f"ab:{uid}".encode()).hexdigest()[:8], 16) % 2

    n = 2000
    rows_eff, rows_null = [], []
    for i in range(n):
        uid = i % 97
        base = 10.0 + 2.0 * _noise("pt", i)
        rows_eff.append((uid, base + (5.0 if variant(uid) == 0 else 0.0)))
        rows_null.append((uid, base))
    for name, rows, in (("eff", rows_eff), ("null", rows_null)):
        alt = tmp_path / name
        alt.mkdir()
        for t in _TABLES:
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
            )
        ev = pd.DataFrame(
            {
                "event_id": list(range(n)),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(list(range(n)), unit="m"),
                "user_id": [r[0] for r in rows],
                "event_type": ["m"] * n,
                "value": [r[1] for r in rows],
                "props": ["{}"] * n,
            }
        )
        ev.to_parquet(alt / "events.parquet", coerce_timestamps="us")
        r = _q("agg_permutation_test")(spark, str(alt)).collect()[0]
        if name == "eff":
            assert r.n_extreme == 0 and r.p_value == 0.0, r
            assert abs(r.diff_obs) > 4.5, r
        else:
            assert r.p_value > 0.05, r


def _planted_orders(tmp_path, name: str, rows) -> str:
    """Copy the sf0.001 tables and overwrite orders with the given
    (orderdate, priority, totalprice) rows."""
    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    od = pd.DataFrame(
        {
            "o_orderkey": list(range(len(rows))),
            "o_custkey": [1] * len(rows),
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": [float(r[2]) for r in rows],
            "o_orderdate": pd.to_datetime([r[0] for r in rows]),
            "o_orderpriority": [r[1] for r in rows],
        }
    )
    od.to_parquet(alt / "orders.parquet", coerce_timestamps="us")
    return str(alt)


def test_cusum_locates_planted_level_shift(spark, tmp_path):
    """The CUSUM |argmax| must land at the planted regime change: 120
    daily totals at ~1000 with a +500 shift from day 60 on — the peak
    of the cumulative deviation from the global mean sits at the shift
    boundary (within the 2-day noise tolerance)."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(120):
        level = 1000.0 if i < 60 else 1500.0
        rows.append(
            (base + pd.Timedelta(days=i), "1-URGENT",
             level + 10 * _noise("cu", i))
        )
    alt = _planted_orders(tmp_path, "cusum", rows)
    got = {r.prio: r for r in _q("ts_cusum_changepoint")(spark, alt).collect()}
    r = got["1-URGENT"]
    assert r.n_days == 120
    shift = (base + pd.Timedelta(days=60)).date()
    assert abs((r.changepoint_d - shift).days) <= 2, r.changepoint_d


def test_ks_and_mannwhitney_fire_on_planted_shift(spark, tmp_path):
    """On two independent same-distribution cohorts the KS D and the
    Mann-Whitney |z| must stay small; plant a +0.5 location shift in
    the purchase cohort and D must approach the theoretical 0.5 while
    |z| blows past any critical value. (Both operators read raw click
    vs purchase values — the fixture plants 1000 of each.)"""
    n = 1000
    for name, shift, d_lo, d_hi, z_bound in (
        ("null", 0.0, 0.0, 0.1, 3.0),
        ("shift", 0.5, 0.4, 1.0, 10.0),
    ):
        types, values, days = [], [], []
        for i in range(n):
            types.append("click")
            values.append(_noise("ksa", i))
            days.append(i)
            types.append("purchase")
            values.append(shift + _noise("ksb", i))
            days.append(i)
        alt = _planted(tmp_path, f"ks_{name}", types, values, days)
        ks = _q("agg_ks_test")(spark, alt).collect()[0]
        mw = _q("agg_mannwhitney_u")(spark, alt).collect()[0]
        assert ks.n_a == n and ks.n_b == n
        assert d_lo <= ks.ks_d <= d_hi, (name, ks.ks_d)
        if name == "null":
            assert abs(mw.z_score) < z_bound, (name, mw.z_score)
        else:
            assert abs(mw.z_score) > z_bound, (name, mw.z_score)


def test_benford_passes_loguniform_flags_uniform(spark, tmp_path):
    """dq_benford's deviation table must be near zero on log-uniform
    amounts (10^(3u) spans three decades — exactly Benford) and flag a
    uniform[100,999) feed, whose first digits are equidistributed:
    digit 1 deviates by |1/9 - 0.301| ~ 0.19."""
    base = pd.Timestamp("2024-01-01")
    n = 5000
    lu = [
        (base, "1-URGENT", 10 ** (3 * _noise("bfl", i))) for i in range(n)
    ]
    un = [
        (base, "1-URGENT", 100 + 899 * _noise("bfu", i)) for i in range(n)
    ]
    alt = _planted_orders(tmp_path, "benford_lu", lu)
    devs = {r.digit: r.abs_dev for r in _q("dq_benford")(spark, alt).collect()}
    assert len(devs) == 9
    assert max(devs.values()) < 0.02, devs
    alt2 = _planted_orders(tmp_path, "benford_un", un)
    devs2 = {
        r.digit: r.abs_dev for r in _q("dq_benford")(spark, alt2).collect()
    }
    assert devs2[1] > 0.15, devs2
    assert max(devs2.values()) > 0.15


def test_holt_tracks_planted_linear_ramp(spark, tmp_path):
    """On a 200-day linear ramp (slope 2.5/day + small noise) Holt's
    trend state must converge to the true slope and the 7-day-ahead
    forecast must extrapolate it; a flat series must keep trend ~ 0
    and forecast ~ its level. (The level-only EWMA systematically lags
    a ramp — the trend state is the operator's whole point.)"""
    n = 200
    ramp = [10.0 + 2.5 * i + 0.2 * _noise("hf", i) for i in range(n)]
    flat = [50.0 + 0.2 * _noise("hg", i) for i in range(n)]
    types, values, days = _interleave({"ramp": ramp, "flat": flat})
    alt = _planted(tmp_path, "holt", types, values, days)
    got = {r.event_type: r for r in _q("ts_holt_forecast")(spark, alt).collect()}
    r, f = got["ramp"], got["flat"]
    assert r.n_days == n and f.n_days == n
    assert abs(r.trend - 2.5) < 0.2, r.trend
    true_last = 10.0 + 2.5 * (n - 1)
    assert abs(r.level - true_last) < 5, r.level
    assert abs(r.fc7 - (true_last + 7 * 2.5)) < 6, r.fc7
    assert abs(f.trend) < 0.1, f.trend
    assert abs(f.fc7 - 50.0) < 1, f.fc7


def test_ljung_box_fires_on_planted_weekly_cycle(spark, tmp_path):
    """Q(7) on a planted weekly square wave must dwarf the white-noise
    fixture's (whose Q(7) hovers near the chi-square(7) mean ~7), and
    the lag-7 ACF must carry the cycle. The operator pools ALL event
    types into one daily-total series, so each fixture plants a single
    type."""
    n = 140
    for name, series, fires in (
        ("noise", [100 * _noise("lbn", i) for i in range(n)], False),
        (
            "cycle",
            [100.0 if i % 7 < 2 else 10.0 + _noise("lbc", i) for i in range(n)],
            True,
        ),
    ):
        alt = _planted(
            tmp_path, f"lb_{name}", ["m"] * n, series, list(range(n))
        )
        rows = sorted(
            _q("ts_ljung_box")(spark, alt).collect(), key=lambda r: r.lag
        )
        q7 = rows[-1].q_stat
        acf7 = rows[-1].acf
        if fires:
            assert q7 > 100, (name, q7)
            assert acf7 > 0.5, (name, acf7)
        else:
            assert q7 < 20, (name, q7)


def test_psi_drift_fires_on_planted_shift(spark, tmp_path):
    """The PSI alarm (sum of per-bucket terms; >=0.2 is the retrain
    trigger) must stay near zero when baseline (pre-1998) and current
    (>=1998) windows share a distribution, and blow past 0.2 on a
    planted +60% location shift."""
    for name, shift, lo, hi in (("same", 0.0, 0.0, 0.05), ("drift", 600.0, 0.2, 99.0)):
        rows = []
        for i in range(3000):
            v = 1000 + 500 * _noise("psib", i)
            rows.append((pd.Timestamp("1996-03-01"), "1-URGENT", v))
        for i in range(3000):
            v = 1000 + shift + 500 * _noise("psic", i)
            rows.append((pd.Timestamp("1998-06-01"), "1-URGENT", v))
        alt = _planted_orders(tmp_path, f"psi_{name}", rows)
        psi = sum(
            r.psi_term for r in _q("dq_distribution_drift")(spark, alt).collect()
        )
        assert lo <= psi <= hi, (name, psi)


def test_xcorr_finds_planted_lead_lag(spark, tmp_path):
    """ts_cross_correlation must put the argmax correlation at the
    planted lag: y_t = x_{t-2} + tiny noise, so (type_a=xs, type_b=ys)
    peaks at lag +2 with r near 1, and the lag-0 correlation of two
    independent noise series stays small."""
    n = 120
    x = [10 * _noise("xc", i) for i in range(n)]
    y = [0.0, 0.0] + [x[i - 2] + 0.01 * _noise("yc", i) for i in range(2, n)]
    types, values, days = _interleave({"xs": x, "ys": y})
    alt = _planted(tmp_path, "xcorr", types, values, days)
    rows = {
        (r.type_a, r.type_b, r.lag): r.xcorr
        for r in _q("ts_cross_correlation")(spark, alt).collect()
    }
    fwd = {
        lag: v for (a, b, lag), v in rows.items() if a == "xs" and b == "ys"
    }
    best = max(fwd, key=lambda k: fwd[k])
    assert best == 2 and fwd[2] > 0.95, fwd
    assert abs(fwd[0]) < 0.5, fwd


def test_chi2_fires_on_planted_mix_dependence(spark, tmp_path):
    """chi2 must stay around its df (=4) when the event-type mix is
    independent of the md5 variant and blow up when variant-1 users'
    mix is skewed hard toward 'purchase'."""
    import hashlib as _h

    def variant(uid: int) -> int:
        return int(_h.md5(f"chi:{uid}".encode()).hexdigest()[:8], 16) % 2

    typs = ("click", "error", "purchase", "signup", "view")
    n = 5000
    for name, skew, bound_lo, bound_hi in (
        ("indep", False, 0.0, 16.0),
        ("dep", True, 100.0, 1e12),
    ):
        types, values, days, users = [], [], [], []
        for i in range(n):
            uid = i % 211
            if skew and variant(uid) == 1:
                t = "purchase" if _noise("c2", i) < 0.6 else typs[i % 5]
            else:
                t = typs[i % 5]
            types.append(t)
            values.append(1.0)
            days.append(i)
            users.append(uid)
        alt = tmp_path / f"chi_{name}"
        alt.mkdir()
        for tb in _TABLES:
            shutil.copy(
                f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
            )
        ev = pd.DataFrame(
            {
                "event_id": list(range(n)),
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(days, unit="m"),
                "user_id": users,
                "event_type": types,
                "value": values,
                "props": ["{}"] * n,
            }
        )
        ev.to_parquet(alt / "events.parquet", coerce_timestamps="us")
        r = _q("agg_chi2_independence")(spark, str(alt)).collect()[0]
        assert r.df == 4 and r.n == n
        assert bound_lo <= r.chi2 <= bound_hi, (name, r.chi2)


def test_calibration_ece_separates_calibrated_from_inverted(spark, tmp_path):
    """ml_calibration_ece on a planted CALIBRATED fixture (labels drawn
    with P(y=1) exactly equal to the probe's sigmoid score) must report
    a small weighted ECE, and on an INVERTED fixture (P(y=1) =
    sigmoid(-z)) a large one — the reliability machinery measures what
    it claims. Embeddings are constructed so z = t exactly: x =
    t·w/Σw², with the same md5 probe weights the operator derives."""
    import numpy as np

    w = np.array(
        [
            (int(hashlib.md5(f"probe:{i}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000) / 1000.0
            for i in range(1, 65)
        ]
    )
    sw2 = float(w @ w)
    n = 4000
    for name, invert, bound, op in (
        ("cal", False, 0.07, "lt"),
        ("inv", True, 0.2, "gt"),
    ):
        alt = tmp_path / name
        alt.mkdir()
        for t in _TABLES:
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
            )
        vecs, labels = [], []
        for vid in range(n):
            t = -4.0 + 8.0 * _noise("ece_t", vid)
            x = (t / sw2) * w
            vecs.append(x.astype(np.float32).tolist())
            p = 1.0 / (1.0 + np.exp(t if invert else -t))
            labels.append(1 if _noise("ece_y", vid) < p else 0)
        pd.DataFrame(
            {"vec_id": range(n), "embedding": vecs, "label": labels}
        ).to_parquet(alt / "embeddings.parquet")
        rows = _q("ml_calibration_ece")(spark, str(alt)).collect()
        total = sum(r.n_rows for r in rows)
        assert total == n
        ece = sum(r.n_rows / total * r.abs_gap for r in rows)
        if op == "lt":
            assert ece < bound, (name, ece)
        else:
            assert ece > bound, (name, ece)


def test_iqr_fences_catch_planted_outliers_exactly(spark, tmp_path):
    """dq_anomaly_iqr must count exactly the planted outliers: 200
    inliers uniform on [100, 200] put the Tukey fences near [50, 250],
    so the 5 planted highs at 10000 and 3 lows at -5000 are the whole
    tail — n_high = 5, n_low = 3, and a clean group reports zero."""
    alt = tmp_path / "iqr"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    rows = []
    for i in range(200):
        rows.append(("N", 100.0 + 100.0 * _noise("iqr", i)))
        rows.append(("A", 100.0 + 100.0 * _noise("iqr2", i)))
    rows += [("N", 10000.0 + i) for i in range(5)]
    rows += [("N", -5000.0 - i) for i in range(3)]
    pd.DataFrame(
        {
            "l_returnflag": [r[0] for r in rows],
            "l_extendedprice": [r[1] for r in rows],
        }
    ).to_parquet(alt / "lineitem.parquet")
    got = {
        r.l_returnflag: r
        for r in _q("dq_anomaly_iqr")(spark, str(alt)).collect()
    }
    assert got["N"].n_high == 5 and got["N"].n_low == 3
    assert got["N"].n_rows == 208
    assert got["A"].n_high == 0 and got["A"].n_low == 0


def test_event_pattern_counts_planted_adjacent_click_buys(spark, tmp_path):
    """win_event_pattern's /c+p/ adjacency semantics, pinned: a user
    whose journey is click,click,purchase,view,click,purchase has
    exactly 2 click→purchase adjacencies; a user whose clicks are
    always separated from the purchase by a view has ZERO (order alone
    would count it — adjacency is the operator's point vs
    win_funnel_steps)."""
    seqs = {
        1: ["click", "click", "purchase", "view", "click", "purchase"],
        2: ["click", "view", "purchase", "click", "view", "purchase"],
        3: ["view", "signup", "view"],
    }
    types, users, days = [], [], []
    i = 0
    for uid, evs in seqs.items():
        for t in evs:
            types.append(t)
            users.append(uid)
            days.append(i)
            i += 1
    alt = tmp_path / "pat"
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    n = len(types)
    pd.DataFrame(
        {
            "event_id": list(range(n)),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(days, unit="m"),
            "user_id": users,
            "event_type": types,
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    got = {
        r.user_id: (r.n_events, r.n_click_buys, r.has_pattern)
        for r in _q("win_event_pattern")(spark, str(alt)).collect()
    }
    assert got[1] == (6, 2, 1)
    assert got[2] == (6, 0, 0)  # order yes, adjacency no
    assert got[3] == (3, 0, 0)


def test_attribution_credits_planted_touches(spark, tmp_path):
    """win_attribution's bookend models, pinned: a signup→view→purchase
    journey credits first_touch=signup / last_touch=view; a cold
    purchase (no prior event) lands in the explicit 'none' bucket."""
    rows = [
        (1, "signup"), (1, "view"), (1, "purchase"),
        (2, "purchase"),
        (3, "click"), (3, "purchase"), (3, "view"), (3, "purchase"),
    ]
    alt = tmp_path / "attr"
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    n = len(rows)
    pd.DataFrame(
        {
            "event_id": list(range(n)),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(list(range(n)), unit="m"),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    got = {
        (r.first_touch, r.last_touch): r.n_purchases
        for r in _q("win_attribution")(spark, str(alt)).collect()
    }
    # user1: signup/view; user2: none/none; user3 purchase1: click/click,
    # user3 purchase2: click/view (the view between the purchases)
    assert got == {
        ("signup", "view"): 1,
        ("none", "none"): 1,
        ("click", "click"): 1,
        ("click", "view"): 1,
    }, got


def test_seasonal_profile_finds_planted_monsoon_spike(spark, tmp_path):
    """ts_seasonal_profile on planted orders where June prices run 3x
    the rest of the year: the June index must sit near 3/(mean) and
    every other month below 1 — the 'onion prices spike before
    monsoon' fingerprint the operator exists for."""
    rows = []
    i = 0
    for month in range(1, 13):
        for d in (3, 12, 21):
            base = 3000.0 if month == 6 else 1000.0
            rows.append(
                (pd.Timestamp(2024, month, d), "1-URGENT",
                 base + _noise("sp", i))
            )
            i += 1
    alt = _planted_orders(tmp_path, "seas", rows)
    got = {
        r.moy: r.seasonal_idx
        for r in _q("ts_seasonal_profile")(spark, str(alt)).collect()
    }
    assert len(got) == 12
    # overall mean ~ (11*1000 + 3000)/12 ~ 1166.7
    assert 2.4 < got[6] < 2.8, got[6]
    assert all(0.8 < v < 0.9 for m, v in got.items() if m != 6), got


def _planted_events_rows(tmp_path, name: str, rows):
    """rows = [(user_id, event_type), ...] one minute apart."""
    alt = tmp_path / name
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    n = len(rows)
    pd.DataFrame(
        {
            "event_id": list(range(n)),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(list(range(n)), unit="m"),
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    ).to_parquet(alt / "events.parquet", coerce_timestamps="us")
    return str(alt)


def test_funnel_steps_enforce_order_with_gaps(spark, tmp_path):
    """win_funnel_steps' view→click→purchase ORDER semantics, pinned:
    user 1 completes in order (counts at every step), user 2 clicks
    BEFORE viewing (counts only at step 1 — the click must follow the
    first view), user 3 views and clicks but never purchases (steps
    1-2). Arbitrary gaps are fine — the adjacency-free complement of
    win_event_pattern."""
    rows = [
        (1, "view"), (1, "signup"), (1, "click"), (1, "error"),
        (1, "purchase"),
        (2, "click"), (2, "view"), (2, "purchase"),
        # user 2: purchase AFTER view but no click after the view
        (3, "view"), (3, "click"),
    ]
    alt = _planted_events_rows(tmp_path, "funnel", rows)
    got = {
        r.step: r.n_users
        for r in _q("win_funnel_steps")(spark, alt).collect()
    }
    assert got == {
        "step1_view": 3,
        "step2_click": 2,
        "step3_purchase": 1,
    }, got


def test_quality_score_gates_planted_junk(spark, tmp_path):
    """text_quality_score's Gopher-style gate, pinned on planted docs:
    a normal English doc with stopwords keeps; a stopword-free
    keyword-stuffed doc fails the stop-ratio band; a too-short doc
    fails the length floors."""
    alt = tmp_path / "tq"
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    good = (
        "the market opened early and the traders were busy with a "
        "steady flow of onions and tomatoes that kept the yard full "
        "for most of the morning session in the district"
    )
    stuffed = " ".join(f"keyword{i % 9} price market onion" for i in range(20))
    short = "tiny doc"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [good, stuffed, short],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(good), len(stuffed), len(short)],
        }
    ).to_parquet(alt / "documents.parquet")
    got = {
        r.doc_id: r for r in _q("text_quality_score")(spark, alt).collect()
    }
    assert got[1].keep == 1, got[1]
    assert got[2].keep == 0 and got[2].stop_ratio < 0.01, got[2]
    assert got[3].keep == 0 and got[3].n_tokens < 20, got[3]


def test_runs_test_separates_oscillation_clustering_noise(spark, tmp_path):
    """Wald–Wolfowitz directions, pinned: a strictly alternating series
    has the maximum number of runs (z strongly POSITIVE), a two-regime
    series has 2 runs (z strongly NEGATIVE), and md5-noise stays inside
    |z| < 2.5."""
    n = 100
    series = {
        "osc": [(1.0 if i % 2 == 0 else -1.0) + 0.01 * _noise("rt", i)
                for i in range(n)],
        "regime": [(-1.0 if i < n // 2 else 1.0) + 0.01 * _noise("rg", i)
                   for i in range(n)],
        "noise": [_noise("rn", i) for i in range(n)],
    }
    types, values, days = _interleave(series)
    alt = _planted(tmp_path, "runs", types, values, days)
    got = {
        r.event_type: r for r in _q("ts_runs_test")(spark, alt).collect()
    }
    assert got["osc"].n_runs == n  # every step flips side
    assert got["osc"].z_runs > 8, got["osc"]
    assert got["regime"].n_runs == 2
    assert got["regime"].z_runs < -8, got["regime"]
    assert abs(got["noise"].z_runs) < 2.5, got["noise"]


def test_lang_id_identifies_planted_languages(spark, tmp_path):
    """text_lang_id on planted stopword-bearing texts: each language's
    closed-class words dominate their doc; a symbols-only doc is
    'unknown'. (The REAL documents table has lang independent of text
    — the memory-pinned driver gotcha — so only a planted fixture can
    test the identifier.)"""
    alt = tmp_path / "lid"
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    docs = {
        1: ("en", "the market and the price of a crop to watch in season"),
        2: ("es", "el mercado y la cebolla de la tarde que sube en precio"),
        3: ("de", "der markt und die zwiebel das ist ein guter preis"),
        4: ("fr", "le marche et les oignons des agriculteurs un bon prix"),
        5: ("unknown", "zzz qqq 12345 !!! ??? xyzzy plugh"),
    }
    pd.DataFrame(
        {
            "doc_id": list(docs),
            "text": [t for _, t in docs.values()],
            "lang": ["xx"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs.values()],
        }
    ).to_parquet(alt / "documents.parquet")
    got = {
        r.doc_id: r.lang_pred
        for r in _q("text_lang_id")(spark, str(alt)).collect()
    }
    assert got == {i: lang for i, (lang, _) in docs.items()}, got


def test_key_skew_flags_planted_hot_supplier(spark, tmp_path):
    """dq_key_skew must put a planted hot key (one supplier owning half
    the rows) at the top with skew_factor ~ n_keys/2, while uniform
    keys sit near 1."""
    alt = tmp_path / "skew"
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    rows = [7] * 1000 + [100 + (i % 100) for i in range(1000)]
    pd.DataFrame({"l_suppkey": rows}).to_parquet(alt / "lineitem.parquet")
    got = _q("dq_key_skew")(spark, str(alt)).collect()
    top = got[0]
    assert top.l_suppkey == 7 and top.n == 1000
    # 101 distinct keys, 2000 rows: hot factor = 1000*101/2000 = 50.5
    assert abs(top.skew_factor - 50.5) < 1e-9
    assert all(abs(r.skew_factor - 0.505) < 1e-9 for r in got[1:])


def _planted_docs(tmp_path, name: str, texts: dict) -> str:
    alt = tmp_path / name
    alt.mkdir()
    for tb in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{tb}.parquet", alt / f"{tb}.parquet"
        )
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(alt / "documents.parquet")
    return str(alt)


def test_sentiment_lexicon_scores_planted_polarity(spark, tmp_path):
    """text_sentiment_lexicon on planted docs: fast/merge are +1,
    slow/small are -1 — a doc with two positives scores +2, two
    negatives -2, mixed 0, and lexicon-free text 0 with zero hits."""
    texts = {
        1: "the fast merge made the build pleasant",
        2: "a slow and small harvest this week",
        3: "fast but small results today",
        4: "nothing from the lexicon appears here",
    }
    alt = _planted_docs(tmp_path, "sent", texts)
    rows = {r.doc_id: r for r in _q("text_sentiment_lexicon")(spark, alt).collect()}
    scores = {i: rows[i].sentiment for i in texts} if hasattr(
        rows.get(1), "sentiment"
    ) else {i: rows[i].score for i in texts}
    assert scores[1] == 2 and scores[2] == -2
    assert scores[3] == 0 and scores[4] == 0


def test_boilerplate_share_flags_planted_template(spark, tmp_path):
    """text_boilerplate_share: a 10-word template chunk planted
    verbatim at the head of 3 docs is boilerplate (df >= 3) — those
    docs report a positive share with n_boiler = 1 — while a doc of
    unique words shares nothing."""
    template = "this report is generated automatically please do not reply now"
    uniq = lambda tag, k: " ".join(f"{tag}{i}" for i in range(k))
    texts = {
        1: template + " " + uniq("a", 10),
        2: template + " " + uniq("b", 10),
        3: template + " " + uniq("c", 10),
        4: uniq("d", 20),
    }
    alt = _planted_docs(tmp_path, "bp", texts)
    rows = {
        r.doc_id: r
        for r in _q("text_boilerplate_share")(spark, alt).collect()
    }
    for d in (1, 2, 3):
        assert rows[d].n_chunks == 2 and rows[d].n_boiler == 1, rows[d]
        assert rows[d].boiler_share == 0.5
    assert rows[4].n_boiler == 0 and rows[4].boiler_share == 0.0


def test_repetition_score_gates_planted_stutter(spark, tmp_path):
    """text_repetition_score: a doc that repeats one 3-gram dominates
    both the duplicated-occurrence ratio and the top-gram share and is
    dropped; normal prose keeps."""
    texts = {
        1: " ".join(["buy cheap pills"] * 12),
        2: (
            "the morning auction moved briskly through onion lots while "
            "buyers compared moisture and size before the final gavel"
        ),
    }
    alt = _planted_docs(tmp_path, "rep", texts)
    rows = {
        r.doc_id: r
        for r in _q("text_repetition_score")(spark, alt).collect()
    }
    assert rows[1].keep == 0 and rows[1].top_frac > 0.3, rows[1]
    assert rows[2].keep == 1, rows[2]


def test_adf_separates_random_walk_from_mean_reversion(spark, tmp_path):
    """Dickey-Fuller directions, pinned: a deterministic random walk
    (cumsum of md5-noise steps) must NOT reject the unit root (tau
    above the ~-2.9 critical value), while a strongly mean-reverting
    AR process (y_t = 0.3*y_{t-1} + noise) must reject decisively."""
    n = 200
    walk, level = [], 0.0
    for i in range(n):
        level += _noise("adfw", i) - 0.5
        walk.append(level)
    ar, y = [], 0.0
    for i in range(n):
        y = 0.3 * y + (_noise("adfa", i) - 0.5)
        ar.append(y)
    types, values, days = _interleave({"walk": walk, "revert": ar})
    alt = _planted(tmp_path, "adf", types, values, days)
    got = {
        r.event_type: r for r in _q("ts_adf_unit_root")(spark, alt).collect()
    }
    assert got["walk"].tau > -2.9, got["walk"]
    assert got["revert"].tau < -6, got["revert"]
    # rho ~ rho_true - 1: near 0 for the walk, near -0.7 for AR(0.3)
    assert abs(got["walk"].rho) < 0.2, got["walk"]
    assert -0.9 < got["revert"].rho < -0.5, got["revert"]


def test_auc_roc_separation_random_and_inverted(spark, tmp_path):
    """ml_auc_roc's Mann-Whitney machinery, pinned on three planted
    label regimes over the SAME score construction the operator
    derives (x = t·w/Σw² so z = t exactly): perfectly separated
    labels (y = [t > 0]) must score AUC ≈ 1 in every fold, labels
    independent of t must sit at chance (≈ 0.5), and inverted labels
    (y = [t < 0]) must collapse to ≈ 0 — direction, not just
    magnitude, so a flipped inequality in the rank identity fails."""
    import numpy as np

    w = np.array(
        [
            (int(hashlib.md5(f"probe:{i}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000) / 1000.0
            for i in range(1, 65)
        ]
    )
    sw2 = float(w @ w)
    n = 3000
    for name, lab, lo, hi in (
        ("sep", lambda t, vid: 1 if t > 0 else 0, 0.999, 1.0),
        ("rand", lambda t, vid: 1 if _noise("auc_y", vid) < 0.5 else 0,
         0.45, 0.55),
        ("inv", lambda t, vid: 1 if t < 0 else 0, 0.0, 0.001),
    ):
        alt = tmp_path / f"auc_{name}"
        alt.mkdir()
        for t in _TABLES:
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
            )
        vecs, labels = [], []
        for vid in range(n):
            t = -4.0 + 8.0 * _noise("auc_t", vid)
            if abs(t) < 0.01:
                t = 0.01  # keep the separated fixtures tie-free
            vecs.append(((t / sw2) * w).astype(np.float32).tolist())
            labels.append(lab(t, vid))
        pd.DataFrame(
            {"vec_id": range(n), "embedding": vecs, "label": labels}
        ).to_parquet(alt / "embeddings.parquet")
        rows = _q("ml_auc_roc")(spark, str(alt)).collect()
        assert len(rows) == 4 and sum(r.n_pos + r.n_neg for r in rows) == n
        for r in rows:
            assert lo <= r.auc <= hi, (name, r.fold, r.auc)


def _te_orders_fixture(tmp_path, name: str, flip_a_fold0: bool) -> str:
    """Orders fixture for ml_target_encoding: 900 filler orders set the
    prior (~30% urgent), key A (ck=1) has 10 orders per fold — fold 1/2
    all urgent, fold 0 per the flip flag — and key B (ck=2) has one
    order in fold 0 (urgent) and one in fold 1 (not)."""
    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    keys, cks, pris = [], [], []
    for i in range(900):
        keys.append(3000 + i)
        cks.append(1000 + i % 300)
        pris.append("1-URGENT" if _noise("te", i) < 0.3 else "5-LOW")
    for i in range(30):
        keys.append(30000 + i)  # fold = (30000+i) % 3 = i % 3
        cks.append(1)
        fold = (30000 + i) % 3
        if fold == 0:
            pris.append("1-URGENT" if flip_a_fold0 else "5-LOW")
        else:
            pris.append("1-URGENT")
    keys += [60000, 60001]
    cks += [2, 2]
    pris += ["1-URGENT", "5-LOW"]
    n = len(keys)
    pd.DataFrame(
        {
            "o_orderkey": keys,
            "o_custkey": cks,
            "o_orderstatus": ["O"] * n,
            "o_totalprice": [100.0] * n,
            "o_orderdate": [pd.Timestamp("2024-01-01")] * n,
            "o_orderpriority": pris,
        }
    ).to_parquet(alt / "orders.parquet", coerce_timestamps="us")
    return str(alt)


def test_target_encoding_no_leakage_signal_and_shrinkage(spark, tmp_path):
    """ml_target_encoding's three contracts, planted: (1) NO LEAKAGE —
    flipping every fold-0 label of key A leaves enc(A, fold 0) bitwise
    unchanged (a row's own fold can never reach its own feature) while
    enc(A, fold 1) DOES move (the flipped labels are in ITS
    out-of-fold set); (2) signal — key A's out-of-fold all-urgent
    folds encode far above the prior; (3) shrinkage — key B with one
    out-of-fold order sits within (1-p)/21 of the prior (m=20
    dominates n_out=1)."""
    base = _te_orders_fixture(tmp_path, "te_base", flip_a_fold0=False)
    flip = _te_orders_fixture(tmp_path, "te_flip", flip_a_fold0=True)
    rb = {
        (r.custkey, r.fold): r
        for r in _q("ml_target_encoding")(spark, base).collect()
    }
    rf = {
        (r.custkey, r.fold): r
        for r in _q("ml_target_encoding")(spark, flip).collect()
    }
    assert rb[(1, 0)].enc == rf[(1, 0)].enc  # bitwise: own fold flipped
    assert rb[(1, 0)].prior_out == rf[(1, 0)].prior_out
    assert rb[(1, 1)].enc != rf[(1, 1)].enc  # out-of-fold labels moved
    a0 = rb[(1, 0)]
    assert a0.n_out == 20 and a0.sy_out == 20
    assert a0.enc > a0.prior_out + 0.2 and a0.enc < 1.0
    b1 = rb[(2, 1)]
    assert b1.n_out == 1 and b1.sy_out == 1
    assert abs(b1.enc - b1.prior_out) < 0.05


def test_fd_violations_g3_by_construction(spark, tmp_path):
    """dq_fd_violations' g3 arithmetic, pinned on a hand-built part
    table: group 'alpha' (brands X,X,X,Y) needs 1 removal, 'gamma'
    (P,P,Q,Q,R — plurality 2) needs 3, 'beta' is clean — so
    p_name->p_brand must report exactly n_violating=2,
    rows_to_remove=4, g3=4/12; and the key-determined FDs (c_custkey,
    n_nationkey) must report zero on the stock tables."""
    alt = tmp_path / "fd"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    names = ["alpha"] * 4 + ["beta"] * 3 + ["gamma"] * 5
    brands = ["X", "X", "X", "Y", "Z", "Z", "Z", "P", "P", "Q", "Q", "R"]
    n = len(names)
    pd.DataFrame(
        {
            "p_partkey": range(n),
            "p_name": names,
            "p_brand": brands,
            "p_type": ["T"] * n,
            "p_size": [1] * n,
            "p_retailprice": [9.99] * n,
        }
    ).to_parquet(alt / "part.parquet")
    rows = {r.fd: r for r in _q("dq_fd_violations")(spark, str(alt)).collect()}
    p = rows["part.p_name->p_brand"]
    assert p.n_rows == 12 and p.n_groups == 3
    assert p.n_violating == 2 and p.rows_to_remove == 4
    assert p.g3 == 4.0 / 12.0
    for held in (
        "customer.c_custkey->c_nationkey",
        "nation.n_nationkey->n_regionkey",
    ):
        r = rows[held]
        assert r.n_violating == 0 and r.rows_to_remove == 0 and r.g3 == 0.0


def test_time_decay_half_life_ladder(spark, tmp_path):
    """agg_time_decay on a hand-built ladder: type 'm' has value 100
    at ages 0, 7, 14 days (k = 0, 1, 2 → contributions 100, 50, 25);
    type 'f' at ages 0 and 3 (both k=0, full weight). The tip is
    GLOBAL (day 14), so both types decay against the same clock —
    sums, weights, and the exact-ratio average are all pinned."""
    d = _planted(
        tmp_path,
        "decay",
        ["m", "m", "m", "f", "f"],
        [100.0, 100.0, 100.0, 100.0, 100.0],
        [14, 7, 0, 14, 11],
    )
    rows = {r.event_type: r for r in _q("agg_time_decay")(spark, d).collect()}
    m = rows["m"]
    assert m.n == 3
    assert m.decayed_sum == 175.0
    assert m.decayed_weight == 1.75  # 1 + 0.5 + 0.25
    assert m.decayed_avg == 100.0  # 175 / 1.75: decay-weighted mean of 100s
    f = rows["f"]
    assert f.n == 2 and f.decayed_sum == 200.0 and f.decayed_weight == 2.0
    assert f.decayed_avg == 200000000 / 2000000


def test_holt_winters_learns_planted_weekly_profile_and_trend(spark, tmp_path):
    """ts_holt_winters on two planted series: 'seas' = 100 + 10 on one
    fixed weekday (no trend) must forecast a fan whose spread is ~10
    with the peak at exactly the horizon h landing on that weekday and
    near-zero trend; 'lin' = 10 + 2·d (no seasonality) must report
    trend ≈ 2 and forecasts tracking the line — the seasonal slots
    must NOT steal the trend, nor vice versa."""
    day0 = (pd.Timestamp("2024-01-01") - pd.Timestamp("1970-01-01")).days
    peak_ph = (day0 + 3) % 7  # the planted peak weekday
    types, values, days = [], [], []
    for d in range(91):
        types.append("seas")
        values.append(100.0 + (10.0 if (day0 + d) % 7 == peak_ph else 0.0))
        days.append(d)
        types.append("lin")
        values.append(10.0 + 2.0 * d)
        days.append(d)
    fx = _planted(tmp_path, "hw", types, values, days)
    rows = _q("ts_holt_winters")(spark, fx).collect()
    seas = {r.h: r for r in rows if r.event_type == "seas"}
    lin = {r.h: r for r in rows if r.event_type == "lin"}
    assert len(seas) == 7 and len(lin) == 7
    fcs = {h: r.fc for h, r in seas.items()}
    spread = max(fcs.values()) - min(fcs.values())
    assert 8.0 < spread < 12.0, fcs
    peak_h = max(fcs, key=fcs.get)
    max_day = day0 + 90
    assert (max_day + peak_h) % 7 == peak_ph, (peak_h, fcs)
    assert abs(seas[1].trend) < 0.5
    assert abs(lin[1].trend - 2.0) < 0.2
    for h, r in lin.items():
        truth = 10.0 + 2.0 * (90 + h)
        assert abs(r.fc - truth) < 3.0, (h, r.fc, truth)


def _woe_orders_fixture(tmp_path, name: str, separating: bool) -> str:
    """Orders fixture for ml_woe_iv: 2000 orders with x uniform on
    [0, 1000]; labels either independent of x (30% urgent everywhere)
    or strongly separated (10% urgent below the midpoint, 90% above)."""
    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet")
    n = 2000
    xs = [1000.0 * _noise("woe_x", i) for i in range(n)]
    pris = []
    for i, x in enumerate(xs):
        p = (0.1 if x < 500 else 0.9) if separating else 0.3
        pris.append("1-URGENT" if _noise("woe_y", i) < p else "5-LOW")
    pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_custkey": [1] * n,
            "o_orderstatus": ["O"] * n,
            "o_totalprice": xs,
            "o_orderdate": [pd.Timestamp("2024-01-01")] * n,
            "o_orderpriority": pris,
        }
    ).to_parquet(alt / "orders.parquet", coerce_timestamps="us")
    return str(alt)


def test_woe_iv_separates_informative_from_flat(spark, tmp_path):
    """ml_woe_iv: a feature whose label rate jumps 0.1→0.9 at the
    midpoint must report IV >> the classic 0.3 'strong' threshold with
    negative WoE below and positive above; a label independent of the
    feature must report IV near zero. Each bin's WoE is also
    recomputed from its own emitted counts — the formula is pinned,
    not just the direction."""
    import math

    for name, sep, lo_iv, hi_iv in (
        ("flat", False, 0.0, 0.05),
        ("sep", True, 1.0, 100.0),
    ):
        fx = _woe_orders_fixture(tmp_path, f"woe_{name}", sep)
        rows = _q("ml_woe_iv")(spark, fx).collect()
        assert sum(r.n_rows for r in rows) == 2000
        tp = sum(r.pos for r in rows)
        tn = sum(r.neg for r in rows)
        iv = sum(r.iv_term for r in rows)
        assert lo_iv <= iv <= hi_iv, (name, iv)
        for r in rows:
            want = math.log((r.pos + 1) * (tn + 10) / ((r.neg + 1) * (tp + 10)))
            assert abs(r.woe - want) < 2e-6, (name, r.bin, r.woe, want)
            if sep and r.bin <= 3:
                assert r.woe < -0.5, (r.bin, r.woe)
            if sep and r.bin >= 6:
                assert r.woe > 0.5, (r.bin, r.woe)


def test_lift_gains_separation_and_chance(spark, tmp_path):
    """ml_lift_gains on the AUC fixtures' two regimes: perfectly
    separated labels (~50% positive) must show top-decile lift near
    the theoretical maximum N/TP ≈ 2 with capture saturating at 1.0
    by mid-table and bottom deciles at zero lift; labels independent
    of the score must hold lift ≈ 1 in every decile."""
    import numpy as np

    w = np.array(
        [
            (int(hashlib.md5(f"probe:{i}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000) / 1000.0
            for i in range(1, 65)
        ]
    )
    sw2 = float(w @ w)
    n = 3000
    for name, sep in (("sep", True), ("rand", False)):
        alt = tmp_path / f"lift_{name}"
        alt.mkdir()
        for t in _TABLES:
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
            )
        vecs, labels = [], []
        for vid in range(n):
            t = -4.0 + 8.0 * _noise("auc_t", vid)
            if abs(t) < 0.01:
                t = 0.01
            vecs.append(((t / sw2) * w).astype(np.float32).tolist())
            if sep:
                labels.append(1 if t > 0 else 0)
            else:
                labels.append(1 if _noise("lift_y", vid) < 0.5 else 0)
        pd.DataFrame(
            {"vec_id": range(n), "embedding": vecs, "label": labels}
        ).to_parquet(alt / "embeddings.parquet")
        rows = sorted(
            _q("ml_lift_gains")(spark, str(alt)).collect(),
            key=lambda r: r.decile,
        )
        assert len(rows) == 10
        assert sum(r.n_rows for r in rows) == n
        tp = sum(r.n_pos for r in rows)
        if sep:
            assert rows[0].lift > 1.8 * tp / n * 2  # ≈ N/TP, tp/n ≈ 0.5
            assert rows[0].capture_rate > 0.18
            assert rows[5].capture_rate == 1.0  # all pos in top half
            assert rows[9].n_pos == 0 and rows[9].lift == 0.0
            assert rows[9].cum_lift == 1.0  # full table = base rate
        else:
            for r in rows:
                assert 0.7 <= r.lift <= 1.3, (r.decile, r.lift)
            assert abs(rows[9].capture_rate - 1.0) < 1e-12


def test_cointegration_fires_on_shared_trend_not_independent_walks(
    spark, tmp_path
):
    """ts_cointegration: y = 2x + small noise over a 250-day random
    walk x shares x's stochastic trend — the Engle-Granger residual is
    stationary and τ_EG must fall far below the ~-3.4 critical value
    with β ≈ 2; an INDEPENDENT random walk regressed on x is the
    spurious-regression case — the residual keeps a unit root and
    τ_EG must stay above it."""
    n = 250
    x, yc, yi = [], [], []
    ax = ai = 0.0
    for i in range(n):
        ax += _noise("cx", i) - 0.5
        ai += _noise("ci", i) - 0.5
        x.append(ax)
        yc.append(2.0 * ax + 0.1 * (_noise("cy", i) - 0.5))
        yi.append(ai)
    types, values, days = _interleave({"walkx": x, "cox": yc, "indep": yi})
    alt = _planted(tmp_path, "coint", types, values, days)
    got = {
        (r.y_series, r.x_series): r
        for r in _q("ts_cointegration")(spark, alt).collect()
    }
    co = got[("cox", "walkx")]
    assert abs(co.beta - 2.0) < 0.05, co.beta
    assert co.tau_eg < -5.0, co.tau_eg
    sp = got[("indep", "walkx")]
    # spurious pairs spread left of plain-DF tails but must stay above
    # the EG 5% critical value (~-3.9 at this n, coefficients estimated)
    assert sp.tau_eg > -3.9, sp.tau_eg
    assert co.tau_eg < sp.tau_eg - 5.0  # decisive separation


def _planted_embeddings(tmp_path, name: str, n: int = 512, dim: int = 64):
    """Copy the sf0.001 tables and overwrite embeddings with 16 planted
    orthogonal clusters: vec c < 16 is the one-hot direction e_{4c}
    (centroid AND, for c=0, the query); member v (16 <= v < n) sits on
    direction v % 16 plus +-0.05 deterministic md5 noise. The exact
    top-k of the query is therefore entirely inside cluster 0, the
    coarse layer must route it to cell 0, and any probe/shortlist
    tuning error that drops cluster-0 members shows up as recall < 1."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    vecs = []
    for v in range(n):
        c = v % 16
        x = np.zeros(dim, dtype=np.float64)
        x[4 * c] = 1.0
        if v >= 16:
            for d in range(dim):
                x[d] += (_noise(f"ann{v}", d) - 0.5) * 0.1
        vecs.append(np.asarray(x, dtype=np.float32))
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([v % 7 for v in range(n)], pa.int32()),
        }
    )
    papq.write_table(t, alt / "embeddings.parquet")
    return str(alt), vecs


def _exact_topk(vecs, k=20):
    import numpy as np

    q = np.asarray(vecs[0], dtype=np.float64)
    sims = []
    for v in range(1, len(vecs)):
        x = np.asarray(vecs[v], dtype=np.float64)
        c = float(x @ q / (np.linalg.norm(x) * np.linalg.norm(q)))
        sims.append((round(c, 6), -v))
    sims.sort(reverse=True)
    return {-nv for _, nv in sims[:k]}


def test_ann_recall_floor_on_planted_clusters(spark, tmp_path):
    """VERDICT r9 item 5: the recall twins REPORT recall but nothing
    asserted it — a probe/shortlist tuning error would pass the oracle
    (both engines agree on the wrong recall). On planted well-separated
    clusters the true neighbors all live in the query's own cell, so
    the train-free IVF layer must be exact and the PQ-compressed layer
    must clear a hard floor."""
    alt, vecs = _planted_embeddings(tmp_path, "annrecall")
    ivf = _q("sim_search_ivf_recall")(spark, alt).collect()[0]
    assert ivf.recall == 1.0, f"IVF recall {ivf.recall} on planted clusters"
    pq_r = _q("sim_search_ivfpq_recall")(spark, alt).collect()[0]
    assert pq_r.recall >= 0.9, (
        f"IVF-PQ recall {pq_r.recall} below floor on planted clusters"
    )


def test_trained_ivf_recall_floor_on_planted_clusters(spark, tmp_path):
    """The TRAINED coarse layer (ml_kmeans_train_ivf: k-means-refined
    centroids, then the same serve stage) must also clear a recall
    floor on the planted clusters — computed here against the numpy
    exact top-k since that query returns the search result itself."""
    alt, vecs = _planted_embeddings(tmp_path, "annrecalltr")
    exact = _exact_topk(vecs)
    got = {
        r.vec_id for r in _q("ml_kmeans_train_ivf")(spark, alt).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"trained-IVF recall {recall} on planted clusters"


def _textbook_modularity(und_rows, label_of) -> float:
    """Independent Newman modularity: Q = Σ_c [win_c/W − (deg_c/W)²]
    summed with exact integer win/deg/W over the doubled undirected
    edge list — the definition, not the operator's (W·Σwin − Σdeg²)/W²
    rearrangement, so an algebra or join bug in the operator cannot
    also live here."""
    from collections import defaultdict

    deg = defaultdict(int)
    win = defaultdict(int)
    W = 0
    for u, v, w in und_rows:
        cu, cv = label_of[u], label_of[v]
        deg[cu] += w
        W += w
        if cu == cv:
            win[cu] += w
    return sum(
        win[c] / W - (deg[c] / W) ** 2 for c in deg
    )


def test_textbook_modularity_on_two_cliques():
    """Self-check of the reference implementation: two disconnected
    equal cliques labeled by clique id have Q = 1/2 exactly."""
    und = []
    for base in (0, 10):
        for a in range(base, base + 4):
            for b in range(base, base + 4):
                if a != b:
                    und.append((a, b, 1))
    labels = {n: n // 10 for n in range(20)}
    assert abs(_textbook_modularity(und, labels) - 0.5) < 1e-12


def test_community_modularity_matches_textbook_definition(spark, sf_dir):
    """VERDICT r9 item 8: graph_community_modularity relied on
    oracle-agreement alone — both engines share the rearranged
    Q = (W·Σwin − Σdeg²)/W² formula, so a shared algebra error would
    pass the hash gate. Replay Q from the textbook definition over the
    operator's own doubled edge list and both label maps; the LPA
    partition's documented collapse (every nation one community →
    Q = 0 exactly) is asserted as the fires/abstains half."""
    from pyspark.sql import functions as F

    from agri_market_data_pipeline_spark.operators.graph import (
        _edges,
        graph_community_modularity,
        graph_label_propagation,
    )

    out = {
        r.partitioning: r
        for r in graph_community_modularity(spark, sf_dir).collect()
    }
    edges = _edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    und = [
        (r.u, r.v, r.w)
        for r in (
            edges.select(
                F.col("src").alias("u"), F.col("dst").alias("v"), "w"
            )
            .unionAll(
                edges.select(
                    F.col("dst").alias("u"), F.col("src").alias("v"), "w"
                )
            )
            .groupBy("u", "v")
            .agg(F.sum("w").cast("bigint").alias("w"))
            .collect()
        )
    ]
    nat = {
        r.n_name: (r.n_nationkey, int(r.n_regionkey))
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    lpa_lbl = {
        nat[r.nation][0]: r.community
        for r in graph_label_propagation(spark, sf_dir).collect()
    }
    region_lbl = {k: reg for k, reg in nat.values()}
    for part, labels in (("lpa", lpa_lbl), ("region", region_lbl)):
        expect = _textbook_modularity(und, labels)
        got = out[part].q_modularity
        assert abs(got - expect) < 1e-12, (part, got, expect)
    assert out["lpa"].q_modularity == 0.0  # the documented collapse


def test_kalman_filter_constant_series_and_steady_state_gain(
    spark, tmp_path
):
    """ts_kalman_filter pins: (1) on a constant series the filtered
    level IS the constant (any smoother must be exact there); (2) the
    terminal adaptive gain has converged to the analytic Riccati
    fixed point K_inf = P'/(P'+R), P' = (Q+sqrt(Q^2+4QR))/2, within
    one 1e-9 lattice step after 60 days (geometric convergence); (3) a
    step change moves the level strictly toward, but not onto, the new
    value (gain < 1 — the filter SMOOTHS, never copies)."""
    days = list(range(60))
    types = (["flat"] * 60) + (["step"] * 60)
    values = [100.0] * 60 + [100.0] * 30 + [200.0] * 30
    alt = _planted(
        tmp_path, "kalman", types, values, days + days
    )
    out = {r.event_type: r for r in _q("ts_kalman_filter")(spark, alt).collect()}
    q_, r_ = 1.0, 4.0
    pp = (q_ + (q_ * q_ + 4 * q_ * r_) ** 0.5) / 2
    k_inf = pp / (pp + r_)
    flat = out["flat"]
    assert flat.level_lat == 100_000_000  # exactly the constant
    assert abs(flat.gain_lat - round(k_inf * 1e9)) <= 1
    assert flat.gain_steady_lat == int((k_inf * 1e9) + 0.5)
    step = out["step"]
    lvl = step.level_lat / 1e6
    assert 100.0 < lvl < 200.0  # moved toward the step...
    assert lvl > 199.0  # ...and nearly converged after 30 post-step days


def test_wavelet_haar_localizes_planted_frequencies(spark, tmp_path):
    """ts_wavelet_haar pins: a ±1 alternating series (period 2) puts
    its energy at level 1 and ZERO at every coarser level (each pair
    of adjacent block sums cancels exactly); a period-32 square wave
    (16 high then 16 low) cancels at every level whose blocks sit
    inside a constant run and concentrates its share at level 5 (the
    only scale whose half-blocks straddle a transition); and every
    level's energy matches a pure-Python Haar replay exactly."""
    n = 128
    types = ["fast"] * n + ["slow"] * n
    fast = [100.0 + (1.0 if i % 2 == 0 else -1.0) for i in range(n)]
    slow = [100.0 + (10.0 if (i // 16) % 2 == 0 else -10.0) for i in range(n)]
    alt = _planted(
        tmp_path, "haar", types, fast + slow, list(range(n)) * 2
    )
    rows = _q("ts_wavelet_haar")(spark, alt).collect()
    out = {(r.event_type, r.level): r for r in rows}

    def replay(vals):
        s = [int(v * 1000 + 0.5) for v in vals]
        energies = {}
        for lv in range(1, 6):
            d = [s[2 * i] - s[2 * i + 1] for i in range(len(s) // 2)]
            s = [s[2 * i] + s[2 * i + 1] for i in range(len(s) // 2)]
            energies[lv] = sum(x * x for x in d)
        return energies

    for et, vals in (("fast", fast), ("slow", slow)):
        exp = replay(vals)
        for lv in range(1, 6):
            got = out[(et, lv)]
            assert got.energy * 1e6 == exp[lv], (et, lv, got.energy, exp[lv])
    # localization: the alternating series is PURE level-1 detail
    assert out[("fast", 1)].energy_share == 1.0
    for lv in range(2, 6):
        assert out[("fast", lv)].energy == 0.0
    # the period-64 square wave's dominant band is level 5
    shares = {lv: out[("slow", lv)].energy_share for lv in range(1, 6)}
    assert max(shares, key=shares.get) == 5
    assert shares[5] > 0.9


def test_louvain_move_reunites_planted_two_clique(spark, tmp_path):
    """graph_louvain_move on a planted two-clique trade graph with one
    misassigned node: nations {0,1,2} trade only among themselves, as
    do {3,4,5}, but the REGION start partition puts node 2 with the
    wrong clique. Exactly node 2 must move home, with the hand-computed
    textbook gain DQ*W^2 = 2*(k_b - k_a)*W + 2*d*(deg_a - deg_b - d)
    = 2*(20-0)*120 + 2*20*(80-40-20) = 5600, and Q must go from
    1600/14400 to exactly 0.5 (one move, so DQ = 5600/14400 closes the
    books)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    alt = tmp_path / "louvain"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    papq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(6), pa.int32()),
                "n_name": [f"N{i}" for i in range(6)],
                "n_regionkey": pa.array([0, 0, 1, 1, 1, 1], pa.int32()),
            }
        ),
        alt / "nation.parquet",
    )
    papq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([100 + i for i in range(6)], pa.int64()),
                "c_name": [f"C{i}" for i in range(6)],
                "c_nationkey": pa.array(range(6), pa.int32()),
                "c_acctbal": pa.array([0.0] * 6),
                "c_mktsegment": ["BUILDING"] * 6,
            }
        ),
        alt / "customer.parquet",
    )
    papq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([200 + i for i in range(6)], pa.int64()),
                "s_name": [f"S{i}" for i in range(6)],
                "s_nationkey": pa.array(range(6), pa.int32()),
                "s_acctbal": pa.array([0.0] * 6),
            }
        ),
        alt / "supplier.parquet",
    )
    papq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([300 + i for i in range(6)], pa.int64()),
                "o_custkey": pa.array([100 + i for i in range(6)], pa.int64()),
                "o_orderstatus": ["F"] * 6,
                "o_totalprice": pa.array([1.0] * 6),
                "o_orderdate": pa.array(
                    [pd.Timestamp("2024-01-01")] * 6,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": ["1-URGENT"] * 6,
            }
        ),
        alt / "orders.parquet",
    )
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    rows = []
    ln = 0
    for s, c in edges:
        for _ in range(10):
            ln += 1
            rows.append((300 + c, 1, 200 + s, ln))
    papq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([1.0] * len(rows)),
                "l_extendedprice": pa.array([1.0] * len(rows)),
                "l_discount": pa.array([0.0] * len(rows)),
                "l_tax": pa.array([0.0] * len(rows)),
                "l_returnflag": ["N"] * len(rows),
                "l_linestatus": ["O"] * len(rows),
                "l_shipdate": pa.array(
                    [pd.Timestamp("2024-01-02")] * len(rows),
                    pa.timestamp("us"),
                ),
            }
        ),
        alt / "lineitem.parquet",
    )
    out = {
        r.nation: r
        for r in _q("graph_louvain_move")(spark, str(alt)).collect()
    }
    assert set(out) == {f"N{i}" for i in range(6)}
    mover = out["N2"]
    assert (mover.moved, mover.community_before, mover.community_after) == (
        1, 1, 0,
    )
    assert mover.gain_lat == 5600
    for n in ("N0", "N1", "N3", "N4", "N5"):
        assert out[n].moved == 0 and out[n].gain_lat == 0
        assert out[n].community_after == out[n].community_before
    r = mover
    assert r.q_before == 1600 / 14400
    assert r.q_after == 0.5
    assert r.q_after - r.q_before == r.gain_lat / 14400


def test_ann_upsert_routes_planted_batch_to_its_cells(spark, tmp_path):
    """incr_ann_upsert on the planted 16-cluster fixture: the audit
    must hold on every cell (delta-maintained == rebuilt), the batch
    split must land vec_id % 10 == 7 rows as upserts, and each cell's
    membership must be exactly its planted cluster (vectors sit on
    orthogonal directions, so any misrouting breaks the counts)."""
    alt, vecs = _planted_embeddings(tmp_path, "annups")
    rows = _q("incr_ann_upsert")(spark, alt).collect()
    assert len(rows) == 16
    n = len(vecs)
    for r in rows:
        assert r.index_equal == 1, r
        assert r.n_total == r.n_rebuilt == r.n_stored + r.n_upserts
        members = [v for v in range(n) if v % 16 == r.cell_id]
        assert r.n_total == len(members), (r.cell_id, r.n_total)
        assert r.n_upserts == sum(1 for v in members if v % 10 == 7)


def test_threshold_tuning_finds_perfect_cut_on_separable_scores(
    spark, tmp_path
):
    """ml_threshold_tuning on planted perfectly-separable data: every
    positive's probe score is pushed to ~1 and every negative's to ~0
    (one-hot embeddings aligned with a known probe weight), so the
    argmax-F1 sweep must return F1 = 1.0 with zero FP/FN in every fold
    and tp = the fold's positive count — any off-by-one in the
    cumulative TP/FP window or the argmax tie-break breaks it."""
    import hashlib as _hl

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    # the operator's probe weight for dimension i
    def w_of(i):
        h = int(_hl.md5(f"probe:{i}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 1000.0

    k = next(i for i in range(1, 65) if abs(w_of(i)) >= 0.1)
    wk = w_of(k)
    alt = tmp_path / "thr"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    n = 200
    vecs, labels = [], []
    for v in range(n):
        x = np.zeros(64, dtype=np.float32)
        mag = np.float32(8.0 / wk)
        y = (v // 4) % 2  # alternates WITHIN each vec_id%4 fold
        x[k - 1] = mag if y == 1 else -mag
        vecs.append(x)
        labels.append(y)
    papq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        alt / "embeddings.parquet",
    )
    rows = _q("ml_threshold_tuning")(spark, str(alt)).collect()
    assert len(rows) == 4
    for r in rows:
        n_pos_fold = sum(
            1 for v in range(n) if v % 4 == r.fold and (v // 4) % 2 == 1
        )
        assert r.f1 == 1.0, r
        assert r.fp == 0 and r.fn == 0
        assert r.tp == n_pos_fold
        assert r.precision_at == 1.0 and r.recall_at == 1.0
        assert r.threshold > 0.9  # the cut sits at the positive cluster


def test_embedding_cosine_dedup_finds_exactly_the_planted_clusters(
    spark, tmp_path
):
    """dedup_embedding_cosine on the planted orthogonal clusters: the
    emitted pair set must be EXACTLY the numpy-computed ground truth —
    same label block AND rounded cosine > 0.3, which by construction
    means same planted cluster (intra-cluster cosine ~0.99,
    cross-cluster bounded by the ±0.05 noise, far below the
    threshold). Any blocking bug, threshold drift, or pair-order slip
    changes the set."""
    import numpy as np

    alt, vecs = _planted_embeddings(tmp_path, "embdedup")
    n = len(vecs)
    X = np.array([np.asarray(v, np.float64) for v in vecs])
    norms = np.linalg.norm(X, axis=1)
    expected = set()
    for a in range(n):
        for b in range(a + 1, n):
            if a % 7 != b % 7:  # label block
                continue
            c = round(float(X[a] @ X[b] / (norms[a] * norms[b])), 6)
            if c > 0.3:
                expected.add((a, b))
    got = {
        (r.vec_a, r.vec_b)
        for r in _q("dedup_embedding_cosine")(spark, alt).collect()
    }
    assert got == expected
    # sanity on the fixture itself: every expected pair is same-cluster
    assert all(a % 16 == b % 16 for a, b in expected) and expected


def test_similarity_text_join_blocks_and_verifies_planted_variants(
    spark, tmp_path
):
    """join_similarity_text on planted name variants: a pair sharing
    its blocking token (2nd word) within edit distance 4 must join
    with the exact levenshtein; a same-block pair beyond 4 must be
    VERIFIED away; a near-identical pair whose 2nd token differs must
    be BLOCKED away (the documented prefilter recall tradeoff — it
    never reaches the verifier)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    alt = tmp_path / "simjoin"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    names = [
        "fresh tomato hybrid",      # joins with the next (lev 2)
        "freshh tomato hybridd",
        "dried tomato powder",      # same block, lev to others > 4
        "fresh tomatoo hybrid",     # lev 1 to [0] but 2nd token differs
        "green chilli",             # <2 tokens after split? 2 tokens
    ]
    papq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(len(names)), pa.int64()),
                "p_name": names,
                "p_brand": ["B"] * len(names),
                "p_type": ["T"] * len(names),
                "p_size": pa.array([1] * len(names), pa.int32()),
                "p_retailprice": pa.array([1.0] * len(names)),
            }
        ),
        alt / "part.parquet",
    )
    got = {
        (r.name_a, r.name_b): r.lev
        for r in _q("join_similarity_text")(spark, str(alt)).collect()
    }
    assert got == {
        ("fresh tomato hybrid", "freshh tomato hybridd"): 2
    }, got


def test_semantic_cluster_components_equal_planted_crt_classes(
    spark, tmp_path
):
    """dedup_semantic_cluster on the planted fixture has a fully
    predictable component structure: edges exist iff same planted
    cluster (v mod 16) AND same label block (v mod 7), i.e. iff
    v mod 112 matches (CRT). With n = 512 every residue class has 4 or
    5 members, so the output must be exactly 112 components labeled by
    their residue, sizes 5 (r < 64) or 4, keeper = the residue itself
    — any transitive-closure or min-label bug reshapes this."""
    alt, _ = _planted_embeddings(tmp_path, "semclu")
    rows = _q("dedup_semantic_cluster")(spark, alt).collect()
    got = {r.cluster_id: (r.cluster_size, r.keep_vec_id) for r in rows}
    expect = {
        r: ((5 if r < 64 else 4), r) for r in range(112)
    }
    assert got == expect


def test_garch_separates_planted_burst_and_matches_exact_recursion(
    spark, tmp_path
):
    """ts_garch_volatility on two planted 120-day series: 'calm' =
    50 +/- 0.1 jitter throughout; 'burst' = the same calm first half,
    then +/-12 uniform swings. The burst's conditional variance must
    land near its steady state 2*omega + E[r^2]/2 (diff of two
    uniform(-12,12) draws has variance 2*48 = 96, so sigma2 ~ 48)
    while the calm twin stays under 0.1; and because the whole filter
    is an exact BIGINT recursion, h_last/h_next must equal a pure-
    Python replay of it bit-for-bit (any drift in the lattice, the
    alpha/beta shifts, or the init breaks equality, not a tolerance)."""
    from agri_market_data_pipeline_spark.operators.timeseries import (
        _GARCH_W,
    )

    n = 120
    calm = [50.0 + 0.2 * _noise("gc", i) for i in range(n)]
    burst = [
        50.0 + 0.2 * _noise("gb", i)
        if i < n // 2
        else 50.0 + 24.0 * (_noise("gb", i) - 0.5)
        for i in range(n)
    ]
    types, values, days = _interleave({"burst": burst, "calm": calm})
    alt = _planted(tmp_path, "garch", types, values, days)
    got = {
        r.event_type: r
        for r in _q("ts_garch_volatility")(spark, alt).collect()
    }
    assert set(got) == {"burst", "calm"}
    b, c = got["burst"], got["calm"]
    assert b.n_ret == n - 1 and c.n_ret == n - 1
    assert c.sigma2 < 0.1, c.sigma2
    assert 10.0 < b.sigma2 < 200.0, b.sigma2
    assert b.sigma2 > 100 * c.sigma2
    for name, series in (("burst", burst), ("calm", calm)):
        lvs = [int((v * 1e6 + 0.5) // 1)for v in series]
        rs = [y - x for x, y in zip(lvs, lvs[1:])]
        h = rs[0] * rs[0]
        for r_prev in rs[:-1]:
            h = _GARCH_W + (r_prev * r_prev) // 4 + h // 2
        r = got[name]
        assert r.h_last == h, name
        assert r.h_next == _GARCH_W + (rs[-1] * rs[-1]) // 4 + h // 2
        assert r.sigma2 == h / 1e12


def _planted_trade_graph(tmp_path, name: str, n_nodes: int, edges):
    """Planted trade-graph fixture (the louvain-test recipe, factored):
    nation/customer/supplier/orders rebuilt so nation i trades exactly
    the given directed (src, dst, weight) edges — weight = lineitem
    multiplicity."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    papq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(n_nodes), pa.int32()),
                "n_name": [f"N{i}" for i in range(n_nodes)],
                "n_regionkey": pa.array([0] * n_nodes, pa.int32()),
            }
        ),
        alt / "nation.parquet",
    )
    papq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    [100 + i for i in range(n_nodes)], pa.int64()
                ),
                "c_name": [f"C{i}" for i in range(n_nodes)],
                "c_nationkey": pa.array(range(n_nodes), pa.int32()),
                "c_acctbal": pa.array([0.0] * n_nodes),
                "c_mktsegment": ["BUILDING"] * n_nodes,
            }
        ),
        alt / "customer.parquet",
    )
    papq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(
                    [200 + i for i in range(n_nodes)], pa.int64()
                ),
                "s_name": [f"S{i}" for i in range(n_nodes)],
                "s_nationkey": pa.array(range(n_nodes), pa.int32()),
                "s_acctbal": pa.array([0.0] * n_nodes),
            }
        ),
        alt / "supplier.parquet",
    )
    papq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    [300 + i for i in range(n_nodes)], pa.int64()
                ),
                "o_custkey": pa.array(
                    [100 + i for i in range(n_nodes)], pa.int64()
                ),
                "o_orderstatus": ["F"] * n_nodes,
                "o_totalprice": pa.array([1.0] * n_nodes),
                "o_orderdate": pa.array(
                    [pd.Timestamp("2024-01-01")] * n_nodes,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": ["1-URGENT"] * n_nodes,
            }
        ),
        alt / "orders.parquet",
    )
    rows = []
    ln = 0
    for s, c, w in edges:
        for _ in range(w):
            ln += 1
            rows.append((300 + c, 1, 200 + s, ln))
    papq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([1.0] * len(rows)),
                "l_extendedprice": pa.array([1.0] * len(rows)),
                "l_discount": pa.array([0.0] * len(rows)),
                "l_tax": pa.array([0.0] * len(rows)),
                "l_returnflag": ["N"] * len(rows),
                "l_linestatus": ["O"] * len(rows),
                "l_shipdate": pa.array(
                    [pd.Timestamp("2024-01-02")] * len(rows),
                    pa.timestamp("us"),
                ),
            }
        ),
        alt / "lineitem.parquet",
    )
    return alt


def test_hits_ranks_planted_hub_authority_structure(spark, tmp_path):
    """graph_hits on a planted 4-nation graph: N0 supplies BOTH
    consumers (the super-hub), N1 supplies one; N2 is consumed-from by
    both hubs (the super-authority), N3 by one. The operator must (a)
    rank hub N0 > N1 > N2 = N3 = 0 and auth N2 > N3 > N0 = 0 — the
    two-sided structure pagerank's single score cannot express — and
    (b) match a pure-Python replay of the exact integer recursion
    bit-for-bit (normalization floors included)."""
    from agri_market_data_pipeline_spark.operators.graph import (
        _HITS_ROUNDS,
        _HITS_UNIT,
    )

    edges = [(0, 2, 10), (0, 3, 10), (1, 2, 10)]
    alt = _planted_trade_graph(tmp_path, "hits", 4, edges)
    out = {
        r.nation: r for r in _q("graph_hits")(spark, str(alt)).collect()
    }
    assert set(out) == {"N0", "N1", "N2", "N3"}

    ew = {(s, d): w for s, d, w in edges}
    hub = {n: _HITS_UNIT for n in range(4)}
    auth = {}
    for _ in range(_HITS_ROUNDS):
        raw = {
            n: sum(w * hub[s] for (s, d), w in ew.items() if d == n)
            for n in range(4)
        }
        mx = max(raw.values())
        auth = {
            n: (raw[n] * _HITS_UNIT) // mx if mx > 0 else 0 for n in range(4)
        }
        raw = {
            n: sum(w * auth[d] for (s, d), w in ew.items() if s == n)
            for n in range(4)
        }
        mx = max(raw.values())
        hub = {
            n: (raw[n] * _HITS_UNIT) // mx if mx > 0 else 0 for n in range(4)
        }
    for i in range(4):
        r = out[f"N{i}"]
        assert r.hub_u == hub[i], (i, r.hub_u, hub[i])
        assert r.auth_u == auth[i], (i, r.auth_u, auth[i])
        assert r.hub == hub[i] / _HITS_UNIT
        assert r.auth == auth[i] / _HITS_UNIT
    assert out["N0"].hub_u == _HITS_UNIT
    assert 0 < out["N1"].hub_u < _HITS_UNIT
    assert out["N2"].hub_u == 0 and out["N3"].hub_u == 0
    assert out["N2"].auth_u == _HITS_UNIT
    assert 0 < out["N3"].auth_u < _HITS_UNIT
    assert out["N0"].auth_u == 0 and out["N1"].auth_u == 0


def test_sax_word_encodes_planted_step_constant_and_ramp(spark, tmp_path):
    """ts_sax_symbolic pins: a 60-day step series (30 days at 10, 30 at
    20) has mu = 15, sigma = 5 exactly, so every low PAA segment is
    z = -1 -> 'a' and every high one z = +1 -> 'd': the word must be
    exactly 'a'*6 + 'd'*6. A constant series takes the zero-variance
    z = 0 -> all-'c' contract. A linear ramp must produce a
    non-decreasing word using both tails of the alphabet."""
    n = 60
    step = [10.0] * (n // 2) + [20.0] * (n // 2)
    const = [42.0] * n
    ramp = [float(i) for i in range(n)]
    types, values, days = _interleave(
        {"step": step, "const": const, "ramp": ramp}
    )
    alt = _planted(tmp_path, "sax", types, values, days)
    out = {
        r.event_type: r
        for r in _q("ts_sax_symbolic")(spark, alt).collect()
    }
    assert set(out) == {"step", "const", "ramp"}
    s = out["step"]
    assert (s.n_days, s.n_segments) == (60, 12)
    assert s.sax_word == "a" * 6 + "d" * 6
    assert (s.n_a, s.n_b, s.n_c, s.n_d) == (6, 0, 0, 6)
    c = out["const"]
    assert c.sax_word == "c" * 12 and c.n_c == 12
    r = out["ramp"]
    assert list(r.sax_word) == sorted(r.sax_word)  # monotone symbols
    assert r.sax_word[0] == "a" and r.sax_word[-1] == "d"
    assert r.n_a > 0 and r.n_b > 0 and r.n_c > 0 and r.n_d > 0


def test_markov_chain_learns_planted_aab_cycle(spark, tmp_path):
    """ml_markov_chain on one user's planted 'A A B' cycle: the only
    transitions are A->A, A->B (equal halves of A's exits) and B->A
    (probability exactly 1), the true stationary split is 2/3 A, 1/3
    B, and the lattice power iteration must match a pure-Python replay
    of the exact integer recursion bit-for-bit."""
    from agri_market_data_pipeline_spark.operators.analytics import (
        _MKV_ROUNDS,
        _MKV_UNIT,
    )

    n_blocks = 67
    seq = ["A", "A", "B"] * n_blocks
    n = len(seq)
    alt = _planted(
        tmp_path, "markov", seq, [1.0] * n, list(range(n))
    )
    rows = _q("ml_markov_chain")(spark, alt).collect()
    got = {(r.from_type, r.to_type): r for r in rows}
    assert set(got) == {("A", "A"), ("A", "B"), ("B", "A")}

    counts = {}
    for a, b in zip(seq, seq[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    outs = {}
    for (a, _), c in counts.items():
        outs[a] = outs.get(a, 0) + c
    pu = {"A": _MKV_UNIT, "B": _MKV_UNIT}
    for _ in range(_MKV_ROUNDS):
        nxt = {"A": 0, "B": 0}
        for (a, b), c in counts.items():
            nxt[b] += (pu[a] * c) // outs[a]
        pu = nxt
    for (a, b), r in got.items():
        assert r.n_trans == counts[(a, b)]
        assert r.prob == counts[(a, b)] / outs[a]
        assert r.stat_from_u == pu[a], (a, r.stat_from_u, pu[a])
        assert r.stat_from == pu[a] / _MKV_UNIT
    assert got[("B", "A")].prob == 1.0
    mass = pu["A"] + pu["B"]
    assert abs(pu["A"] / mass - 2 / 3) < 0.02


def test_als_fits_planted_rank1_matrix_and_matches_replay(spark, tmp_path):
    """ml_als_factorize on a planted DENSE rank-1 matrix r[u][p] =
    c_u * d_p (6 users x 4 parts): because every user rates every
    part, the user half-step makes each user factor exactly
    proportional to c_u, so the item re-solve can nearly fit the
    matrix in ONE round — per-item RMSE must be tiny against the
    rating scale (lambda shrinkage + lattice floors are the only
    residual). And the whole integer/IEEE pipeline must match a
    pure-Python replay: init factors, Gram sums, 2x2 solves,
    re-quantization, residuals — lq bit-for-bit, rmse to 1e-9."""
    import hashlib
    import math

    import pyarrow as pa
    import pyarrow.parquet as papq

    from agri_market_data_pipeline_spark.operators.similarity import (
        _ALS_QLAT,
        _ALS_ULAT,
    )

    cs = [1, 2, 3, 4, 5, 6]
    ds = [2, 3, 4, 5]
    alt = tmp_path / "als"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    part = pd.read_parquet("/root/testdata/sf0.001/part.parquet").head(
        len(ds)
    )
    part = part.assign(p_partkey=[1 + i for i in range(len(ds))])
    part.to_parquet(alt / "part.parquet")
    papq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    [300 + u for u in range(len(cs))], pa.int64()
                ),
                "o_custkey": pa.array(
                    [100 + u for u in range(len(cs))], pa.int64()
                ),
                "o_orderstatus": ["F"] * len(cs),
                "o_totalprice": pa.array([1.0] * len(cs)),
                "o_orderdate": pa.array(
                    [pd.Timestamp("2024-01-01")] * len(cs),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": ["1-URGENT"] * len(cs),
            }
        ),
        alt / "orders.parquet",
    )
    rows = []
    ln = 0
    for u, c in enumerate(cs):
        for p, d in enumerate(ds):
            ln += 1
            rows.append((300 + u, 1 + p, 200, ln, float(c * d)))
    papq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([r[4] for r in rows]),
                "l_extendedprice": pa.array([1.0] * len(rows)),
                "l_discount": pa.array([0.0] * len(rows)),
                "l_tax": pa.array([0.0] * len(rows)),
                "l_returnflag": ["N"] * len(rows),
                "l_linestatus": ["O"] * len(rows),
                "l_shipdate": pa.array(
                    [pd.Timestamp("2024-01-02")] * len(rows),
                    pa.timestamp("us"),
                ),
            }
        ),
        alt / "lineitem.parquet",
    )

    def h(p, tag):
        return (
            int(hashlib.md5(f"{p}:{tag}".encode()).hexdigest()[:6], 16)
            % _ALS_QLAT
        )

    lam = 1.0
    q0 = {1 + p: (h(1 + p, "q1"), h(1 + p, "q2")) for p in range(len(ds))}
    ratings = {
        (100 + u, 1 + p): cs[u] * ds[p]
        for u in range(len(cs))
        for p in range(len(ds))
    }

    def solve(s11, s22, s12, sb1, sb2, sa, sb):
        a11 = s11 / sa + lam
        a22 = s22 / sa + lam
        a12 = s12 / sa
        b1 = sb1 / sb
        b2 = sb2 / sb
        det = a11 * a22 - a12 * a12
        x1 = (a22 * b1 - a12 * b2) / det
        x2 = (a11 * b2 - a12 * b1) / det
        return (
            math.floor(x1 * _ALS_ULAT + 0.5),
            math.floor(x2 * _ALS_ULAT + 0.5),
        )

    uf = {}
    for u in [100 + i for i in range(len(cs))]:
        s = [0] * 5
        for (uu, p), r in ratings.items():
            if uu == u:
                n1, n2 = q0[p]
                s[0] += n1 * n1
                s[1] += n2 * n2
                s[2] += n1 * n2
                s[3] += r * n1
                s[4] += r * n2
        uf[u] = solve(*s, 1e6, 1e3)
    qf = {}
    for p in [1 + i for i in range(len(ds))]:
        s = [0] * 5
        nr = 0
        for (u, pp), r in ratings.items():
            if pp == p:
                lu1, lu2 = uf[u]
                s[0] += lu1 * lu1
                s[1] += lu2 * lu2
                s[2] += lu1 * lu2
                s[3] += r * lu1
                s[4] += r * lu2
                nr += 1
        qf[p] = (nr,) + solve(*s, 1e8, 1e4)
    out = {
        r.partkey: r
        for r in _q("ml_als_factorize")(spark, str(alt)).collect()
    }
    assert set(out) == set(qf)
    for p, (nr, lq1, lq2) in qf.items():
        r = out[p]
        assert (r.n_raters, r.lq1, r.lq2) == (nr, lq1, lq2), (p, r)
        assert r.q1 == lq1 / _ALS_ULAT and r.q2 == lq2 / _ALS_ULAT
        e2 = 0
        for (u, pp), rv in ratings.items():
            if pp == p:
                lu1, lu2 = uf[u]
                e = rv * 10**8 - lu1 * lq1 - lu2 * lq2
                e2 += e * e
        rmse = math.sqrt(e2 / nr) / 1e8
        # the operator emits ROUND(rmse, 6)
        assert abs(r.rmse - rmse) < 1e-6, (p, r.rmse, rmse)
        # rank-1 data, dense: one round must nearly fit the scale
        mean_r = sum(
            rv for (u, pp), rv in ratings.items() if pp == p
        ) / nr
        assert r.rmse < 0.1 * mean_r, (p, r.rmse, mean_r)


def test_viterbi_segments_planted_regimes_and_resists_jitter(
    spark, tmp_path
):
    """ts_regime_viterbi pins: (a) a 40-day ramp-up then 40-day
    ramp-down with one contrarian jitter day inside each half decodes
    to exactly H*40 then L*39 — the switching cost must smooth the
    planted one-day sign flips away (a raw sign copy would show 4
    extra regime flips); (b) a strictly alternating up/down series
    must decode to ONE constant regime end-to-end (per-day matching
    gains 3 but every switch forfeits the 2-point stay bonus twice —
    staying wins); (c) up_day must equal the exact return sign."""
    n = 80
    vals = []
    v = 100.0
    for i in range(n):
        if i < n // 2:
            v += 5.0 if i not in (13,) else -3.0  # one contrarian day
        else:
            v -= 5.0 if i not in (57,) else -3.0
        vals.append(v)
    alt_vals = [100.0 + (3.0 if i % 2 == 0 else -3.0) for i in range(n)]
    types, values, days = _interleave({"trend": vals, "alt": alt_vals})
    alt = _planted(tmp_path, "viterbi", types, values, days)
    rows = _q("ts_regime_viterbi")(spark, alt).collect()
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(r)
    for k in by:
        by[k].sort(key=lambda r: r.day_no)
    tr = by["trend"]
    assert len(tr) == n - 1
    assert [r.regime for r in tr] == ["H"] * 39 + ["L"] * 40
    # the two planted contrarian days ARE down/up sign days —
    # the decoder smoothed them, the observation column did not
    assert tr[12].up_day == 0 and tr[12].regime == "H"
    assert tr[56].up_day == 1 and tr[56].regime == "L"
    al = by["alt"]
    assert len(set(r.regime for r in al)) == 1
    assert [r.up_day for r in al] == [
        1 if i % 2 == 0 else 0 for i in range(1, n)
    ]


def test_cuped_removes_planted_covariate_variance(spark, tmp_path):
    """agg_cuped_adjust on 200 planted customers whose post-period
    spend is exactly 2x their pre-period spend plus small noise: theta
    must land at ~2, the adjusted variance must shed >90% of the raw
    between-user variance (the whole point of CUPED), and the raw arm
    means must match an exact cent-lattice replay (md5 arms included)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as papq

    alt = tmp_path / "cuped"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    n_cust = 200
    rows = []
    for u in range(1, n_cust + 1):
        x = round(100.0 + 400.0 * _noise("cupx", u), 2)
        y = round(2.0 * x + 5.0 * _noise("cupy", u), 2)
        rows.append((u * 10, u, x, pd.Timestamp("1996-06-01")))
        rows.append((u * 10 + 1, u, y, pd.Timestamp("1999-06-01")))
    papq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": ["F"] * len(rows),
                "o_totalprice": pa.array([r[2] for r in rows]),
                "o_orderdate": pa.array(
                    [r[3] for r in rows], pa.timestamp("us")
                ),
                "o_orderpriority": ["1-URGENT"] * len(rows),
            }
        ),
        alt / "orders.parquet",
    )
    out = {
        r.arm: r for r in _q("agg_cuped_adjust")(spark, str(alt)).collect()
    }
    assert set(out) == {0, 1}
    got_theta = out[0].theta
    assert got_theta == out[1].theta
    assert 1.9 < got_theta < 2.1, got_theta
    arms = {0: [], 1: []}
    for u in range(1, n_cust + 1):
        arm = (
            int(
                hashlib.md5(f"{u}:arm".encode()).hexdigest()[:6], 16
            )
            % 2
        )
        y = round(2.0 * round(100.0 + 400.0 * _noise("cupx", u), 2)
                  + 5.0 * _noise("cupy", u), 2)
        arms[arm].append(round(y * 100))
    for a in (0, 1):
        r = out[a]
        assert r.n_units == len(arms[a])
        assert r.mean_y == sum(arms[a]) / len(arms[a]) / 100
        assert r.var_y > 0
        assert r.var_y_adj < 0.1 * r.var_y, (r.var_y, r.var_y_adj)
        # adjustment keeps the metric on the same scale
        assert abs(r.mean_y_adj - r.mean_y) < r.var_y ** 0.5


def test_kcenter_coreset_spreads_over_planted_clusters(spark, tmp_path):
    """sample_kcenter_coreset on the 16-orthogonal-cluster embedding
    fixture: greedy farthest-point with K=8 must land every center in
    a DISTINCT cluster (an uncovered cluster is always ~sqrt(2) away
    while covered points sit at noise scale), the coverage radius
    must be non-increasing in selection order and stay ~sqrt(2) at
    the end (8 of 16 clusters remain uncovered), and the full
    selection (ids AND lattice radii) must match a pure-Python replay
    of the exact integer greedy bit-for-bit."""
    from agri_market_data_pipeline_spark.operators.reshape import (
        _KC_K,
        _KC_LAT,
    )

    alt, vecs = _planted_embeddings(tmp_path, "kcenter")
    rows = _q("sample_kcenter_coreset")(spark, alt).collect()
    assert len(rows) == _KC_K
    rows.sort(key=lambda r: r.sel_order)

    lat = [
        [int((float(x) * _KC_LAT) // 1) for x in v] for v in vecs
    ]

    def d2(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    seed = 0  # MIN(vec_id)
    mind = [d2(v, lat[seed]) for v in lat]
    expect = [(0, seed, max(mind))]
    for i in range(1, _KC_K):
        mx = max(mind)
        cid = min(j for j, d in enumerate(mind) if d == mx)
        mind = [min(d, d2(v, lat[cid])) for v, d in zip(lat, mind)]
        expect.append((i, cid, max(mind)))
    for r, (so, cid, rad) in zip(rows, expect):
        assert (r.sel_order, r.vec_id, r.radius_lat) == (so, cid, rad)
        assert r.radius == (rad ** 0.5) / _KC_LAT
    radii = [r.radius_lat for r in rows]
    assert radii == sorted(radii, reverse=True)
    clusters = [r.vec_id % 16 for r in rows]
    assert len(set(clusters)) == _KC_K, clusters
    # 8 clusters still uncovered: objective stays at the ~sqrt(2)
    # inter-cluster scale, far above the 0.05-noise intra scale
    assert 1.2 < rows[-1].radius < 1.7, rows[-1].radius


def test_permutation_entropy_noise_monotone_period2(spark, tmp_path):
    """ts_permutation_entropy pins: md5-noise uses all 6 ordinal
    patterns nearly uniformly (H > 0.9); a strictly increasing ramp
    is the single pattern pid=5 (ranks 012) with H = 0 and share 1;
    an exact period-2 alternation splits evenly between its two tied
    patterns (pids 7 and 11 under the stable tie rule) giving
    H = ln2/ln6 exactly and the count tie broken to pid 7."""
    import math

    n = 60
    noise = [100.0 + _noise("pe", i) for i in range(n)]
    ramp = [float(i) for i in range(n)]
    alt2 = [10.0 if i % 2 == 0 else 20.0 for i in range(n)]
    types, values, days = _interleave(
        {"noise": noise, "ramp": ramp, "alt": alt2}
    )
    alt = _planted(tmp_path, "permentropy", types, values, days)
    out = {
        r.event_type: r
        for r in _q("ts_permutation_entropy")(spark, alt).collect()
    }
    assert set(out) == {"noise", "ramp", "alt"}
    nz = out["noise"]
    assert nz.n_triples == n - 2
    assert nz.n_patterns == 6
    assert nz.perm_entropy > 0.9
    rp = out["ramp"]
    assert (rp.n_patterns, rp.top_pattern, rp.top_share) == (1, 5, 1.0)
    assert rp.perm_entropy == 0.0
    al = out["alt"]
    assert al.n_patterns == 2
    assert al.perm_entropy == round(math.log(2) / math.log(6), 6)
    assert al.top_pattern == 7
    assert al.top_share == 0.5


def test_cox_score_step_detects_planted_hazard_split(spark, tmp_path):
    """ml_cox_score_step on a planted cohort where HIGH-ACTIVITY users
    (many events) all churn after a 5-day lifetime while low-activity
    users live 50 days: the score step must report a clearly positive
    beta (higher hazard for x=1) and match a pure-Python replay of the
    exact lattice score/information sums."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as papq

    from agri_market_data_pipeline_spark.operators.analytics import (
        _COX_CENSOR_DAYS,
        _COX_LAT,
    )

    alt = tmp_path / "cox"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    base = pd.Timestamp("2024-01-01")
    rows = []  # (event_id, ts, user_id)
    eid = 0
    users = {}
    for u in range(1, 51):  # high activity, short life: 20 ev / 5 days
        for k in range(20):
            rows.append((eid, base + pd.Timedelta(days=(k % 6)), u))
            eid += 1
        users[u] = (5, 20)
    for u in range(51, 101):  # low activity, long life: 5 ev / 50 days
        for k in range(5):
            rows.append(
                (eid, base + pd.Timedelta(days=k * 12), u)
            )  # days 0..48
            eid += 1
        users[u] = (48, 5)
    # sentinel keeps gmax far out so nobody above is censored
    for k in (0, 60):
        rows.append((eid, base + pd.Timedelta(days=k), 999))
        eid += 1
    users[999] = (60, 2)
    papq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": ["view"] * len(rows),
                "value": pa.array([1.0] * len(rows)),
                "props": ["{}"] * len(rows),
            }
        ),
        alt / "events.parquet",
    )
    out = _q("ml_cox_score_step")(spark, str(alt)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_users == 101
    # replay
    gmax = 60
    cmean = sum(c for _, c in users.values()) / len(users)
    lt = [
        (life, 0 if gmax - life <= _COX_CENSOR_DAYS else 1,
         1 if c > cmean else 0)
        for life, c in users.values()
    ]
    grp = {}
    for life, dead, x in lt:
        g = grp.setdefault(life, [0, 0, 0, 0])
        g[0] += 1
        g[1] += x
        g[2] += dead
        g[3] += dead * x
    su, si, nd = 0, 0, 0
    tot_n = sum(g[0] for g in grp.values())
    tot_x = sum(g[1] for g in grp.values())
    pre_n, pre_x = 0, 0
    for life in sorted(grp):
        n_at, x_at, d, s = grp[life]
        s0 = tot_n - pre_n
        s1 = tot_x - pre_x
        pre_n += n_at
        pre_x += x_at
        if d > 0:
            xb = s1 / s0
            su += math.floor((s - d * xb) * _COX_LAT + 0.5)
            si += math.floor(d * xb * (1.0 - xb) * _COX_LAT + 0.5)
            nd += d
    assert r.n_deaths == nd
    assert r.u_score == su / _COX_LAT
    assert r.fisher_info == si / _COX_LAT
    assert r.beta1 == round(su / si, 6) or abs(r.beta1 - su / si) < 1e-6
    assert r.beta1 > 0.5, r.beta1
    assert abs(r.hazard_ratio - math.exp(su / si)) < 1e-4


def _planted_cohort_orders(tmp_path, name, a_keys, b_keys):
    """Orders fixture: one pre-1998 order per key in a_keys, one
    post-1998 order per key in b_keys."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    alt = tmp_path / name
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    rows = [(u, pd.Timestamp("1996-06-01")) for u in a_keys] + [
        (u, pd.Timestamp("1999-06-01")) for u in b_keys
    ]
    papq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_orderstatus": ["F"] * len(rows),
                "o_totalprice": pa.array([1.0] * len(rows)),
                "o_orderdate": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "o_orderpriority": ["1-URGENT"] * len(rows),
            }
        ),
        alt / "orders.parquet",
    )
    return str(alt)


def test_theta_kmv_estimates_planted_set_algebra(spark, tmp_path):
    """agg_theta_kmv pins: (a) on planted cohorts |A|=2000, |B|=2000,
    |A∩B|=1000 the exact audit columns are exactly right and every
    estimate lands within 25% (K=256 → ~3/sqrt(K) ≈ 19% at 3 sigma) —
    including the DIFFERENCE estimate HLL cannot express; (b) sub-K
    cohorts (100/50, overlap 25) take the exact path: estimates EQUAL
    the truth with no estimator error at all."""
    alt = _planted_cohort_orders(
        tmp_path, "kmv_big", range(1, 2001), range(1001, 3001)
    )
    r = _q("agg_theta_kmv")(spark, alt).collect()[0]
    assert (r.n_a_exact, r.n_b_exact) == (2000, 2000)
    assert (r.inter_exact, r.diff_exact, r.union_exact) == (
        1000, 1000, 3000,
    )
    for est, exact in (
        (r.n_a_est, 2000), (r.n_b_est, 2000), (r.union_est, 3000),
        (r.inter_est, 1000), (r.diff_est, 1000),
    ):
        assert abs(est - exact) / exact < 0.25, (est, exact)
    alt2 = _planted_cohort_orders(
        tmp_path, "kmv_small", range(1, 101), range(76, 126)
    )
    r2 = _q("agg_theta_kmv")(spark, alt2).collect()[0]
    assert (r2.n_a_exact, r2.n_b_exact, r2.inter_exact) == (100, 50, 25)
    assert r2.n_a_est == 100.0 and r2.n_b_est == 50.0
    assert r2.union_est == 125.0
    assert r2.inter_est == 25.0 and r2.diff_est == 75.0


def test_croston_separates_planted_intermittent_demand(spark, tmp_path):
    """ts_croston_forecast on two planted parts shipping over ~60
    weeks: part 1 demands exactly 12 units every 4th week (steady
    intermittent: smoothed size → 12, interval → 4, forecast → 3
    units/week); part 2 demands 3 units EVERY week (dense: interval →
    1, forecast → 3). Both must match a pure-Python replay of the
    exact lattice recursions bit-for-bit — and the two very different
    demand shapes must converge to the SAME per-period rate, which is
    precisely the property a raw EWMA of the zero-filled series
    destroys."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from agri_market_data_pipeline_spark.operators.timeseries import (
        _CRO_LAT,
    )

    alt = tmp_path / "croston"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    base = pd.Timestamp("2024-01-06")  # anchor inside one epoch week
    rows = []
    ln = 0
    series = {1: [], 2: []}
    for wkno in range(60):
        if wkno % 4 == 0:
            series[1].append((wkno, 12))
        series[2].append((wkno, 3))
    for p, dem in series.items():
        for wkno, qty in dem:
            ln += 1
            rows.append(
                (300, p, 200, ln, float(qty),
                 base + pd.Timedelta(weeks=wkno))
            )
    papq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
                "l_quantity": pa.array([r[4] for r in rows]),
                "l_extendedprice": pa.array([1.0] * len(rows)),
                "l_discount": pa.array([0.0] * len(rows)),
                "l_tax": pa.array([0.0] * len(rows)),
                "l_returnflag": ["N"] * len(rows),
                "l_linestatus": ["O"] * len(rows),
                "l_shipdate": pa.array(
                    [r[5] for r in rows], pa.timestamp("us")
                ),
            }
        ),
        alt / "lineitem.parquet",
    )
    out = {
        r.partkey: r
        for r in _q("ts_croston_forecast")(spark, str(alt)).collect()
    }
    assert set(out) == {1, 2}
    for p, dem in series.items():
        # replay on epoch-week numbers (same div both engines)
        weeks = [
            (base + pd.Timedelta(weeks=w)).value // 1000 // 604800000000
            for w, _ in dem
        ]
        zs = [q for _, q in dem]
        qs = [1] + [b - a for a, b in zip(weeks, weeks[1:])]
        s, v = zs[0] * _CRO_LAT, qs[0] * _CRO_LAT
        for z, q in zip(zs[1:], qs[1:]):
            s = (s + z * _CRO_LAT) // 2
            v = (v + q * _CRO_LAT) // 2
        r = out[p]
        assert r.n_demand_periods == len(zs)
        assert (r.size_lat, r.interval_lat) == (s, v), (p, r)
        assert r.croston_fc == s / v
    assert abs(out[1].smoothed_size - 12.0) < 0.1
    assert abs(out[1].smoothed_interval - 4.0) < 0.2
    assert abs(out[2].smoothed_interval - 1.0) < 0.01
    assert abs(out[1].croston_fc - 3.0) < 0.2
    assert abs(out[2].croston_fc - 3.0) < 0.01
    assert abs(out[1].croston_fc - out[2].croston_fc) < 0.25


def test_plsa_em_step_matches_exact_replay(spark, tmp_path):
    """text_plsa_em_step on a 12-doc planted corpus: the whole one-step
    EM (md5 init weights, exact-rational responsibilities, FLOOR-1e6
    M-step terms, tie-broken top words, share ratios) must match a
    pure-Python replay bit-for-bit, and the M-step must conserve mass:
    sum of all topic-word weights within nnz*K lattice floors of
    total_tokens * 1e6."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as papq

    from agri_market_data_pipeline_spark.operators.textstats import (
        _PLSA_K,
        _PLSA_LAT,
        _PLSA_TOP,
    )

    docs = []
    for i in range(12):
        ws = (
            ["apple", "banana", "cherry", "apple"]
            if i % 2 == 0
            else ["xray", "yankee", "zulu", "zulu", "xray"]
        )
        docs.append((i, " ".join(ws + [f"shared{i % 3}"])))
    alt = tmp_path / "plsa"
    alt.mkdir()
    for t in _TABLES:
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", alt / f"{t}.parquet"
        )
    papq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": [d[1] for d in docs],
                "lang": ["en"] * len(docs),
                "source": ["planted"] * len(docs),
                "n_chars": pa.array(
                    [len(d[1]) for d in docs], pa.int64()
                ),
            }
        ),
        alt / "documents.parquet",
    )
    rows = _q("text_plsa_em_step")(spark, str(alt)).collect()

    def h6(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    tok = {}
    for d, text in docs:
        for w in text.split(" "):
            tok[(d, w)] = tok.get((d, w), 0) + 1
    S = {}
    total_c = sum(tok.values())
    for (d, w), c in tok.items():
        nums = {
            t: (1 + h6(f"{w}:w{t}") % 999) * (1 + h6(f"{d}:d{t}") % 999)
            for t in range(_PLSA_K)
        }
        den = sum(nums.values())
        for t, num in nums.items():
            term = int((c * num) / den * _PLSA_LAT // 1)
            S[(w, t)] = S.get((w, t), 0) + term
    # mass conservation within floor slack
    assert 0 <= total_c * _PLSA_LAT - sum(S.values()) <= len(tok) * _PLSA_K
    expect = {}
    for t in range(_PLSA_K):
        ws = sorted(
            ((w2, s) for (w2, t2), s in S.items() if t2 == t),
            key=lambda x: (-x[1], x[0]),
        )[:_PLSA_TOP]
        st = sum(s for (w2, t2), s in S.items() if t2 == t)
        for rnk, (w2, s) in enumerate(ws, 1):
            expect[(t, rnk)] = (w2, s, s / st if st > 0 else None)
    got = {(r.topic, r.rnk): (r.token, r.weight_lat, r.p_w_given_t)
           for r in rows}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], (k, got[k], expect[k])
