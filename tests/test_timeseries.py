"""Fixture tests for the time-series trio (round-5 batch 6).

Each operator is cross-checked against an independent numpy
computation over the same synthetic per-day series, plus the
structural invariants (exact integer CUSUM, proper split, tie rules).
"""

import datetime

import numpy as np
import pytest

from online_centrality_spark.operators import (
    activity_autocorr,
    activity_changepoint,
    daily_anomalies,
)

D0 = datetime.datetime(2020, 1, 1, 12, 0, 0)


def _events(spark, series, event_type="click"):
    """One row per event: day i gets series[i] events of the type."""
    rows = []
    eid = 0
    for i, n in enumerate(series):
        for _ in range(int(n)):
            rows.append((eid, D0 + datetime.timedelta(days=i), eid % 5, event_type))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_daily_anomalies_flags_the_spike(spark):
    series = [10, 10, 10, 50, 10, 10, 10, 10]  # day 3 is the spike
    out = daily_anomalies(_events(spark, series), z_threshold=2.0).collect()
    assert len(out) == 1
    row = out[0]
    assert row["day"] == "2020-01-04"
    assert row["n_events"] == 50
    x = np.array(series, dtype=float)
    z_exp = (50 - x.mean()) / x.std(ddof=1)
    assert row["z"] == pytest.approx(z_exp, abs=1e-6)


def test_daily_anomalies_zero_variance_type_emits_nothing(spark):
    flat = _events(spark, [7, 7, 7, 7], event_type="flat")
    assert daily_anomalies(flat).count() == 0


def test_autocorr_matches_numpy_pearson(spark):
    rng = np.random.default_rng(7)
    series = (rng.integers(5, 40, size=20)).tolist()
    out = {
        r["lag"]: (r["n_pairs"], r["autocorr"])
        for r in activity_autocorr(_events(spark, series), max_lag=3).collect()
    }
    x = np.array(series, dtype=float)
    for lag in (1, 2, 3):
        a, b = x[:-lag], x[lag:]
        r_exp = np.corrcoef(a, b)[0, 1]
        n, r_got = out[lag]
        assert n == len(series) - lag
        assert r_got == pytest.approx(r_exp, abs=1e-6)


def test_autocorr_period_two_signature(spark):
    series = [5, 30] * 8  # period-2 alternation
    out = {
        r["lag"]: r["autocorr"]
        for r in activity_autocorr(_events(spark, series), max_lag=2).collect()
    }
    assert out[1] < -0.9
    assert out[2] > 0.9


def test_changepoint_finds_the_level_shift(spark):
    series = [10] * 6 + [40] * 6  # shift after day 5
    row = activity_changepoint(_events(spark, series)).collect()[0]
    assert row["day"] == "2020-01-06"  # last day of the low regime
    assert row["n_days"] == 12
    # exact integer numerator: N*T_d - r*S at the argmax
    assert row["cusum_num"] == 12 * 60 - 6 * 300
    assert row["mean_before"] == pytest.approx(10.0)
    assert row["mean_after"] == pytest.approx(40.0)


def test_changepoint_tie_breaks_to_earliest_day(spark):
    # symmetric bump: |cusum| ties on both shoulders -> earliest wins
    series = [10, 30, 10]
    row = activity_changepoint(_events(spark, series)).collect()[0]
    # C_1 = 3*10 - 1*50 = -20; C_2 = 3*40 - 2*50 = 20 -> tie on |.|
    assert row["cusum_num"] == -20
    assert row["day"] == "2020-01-01"
