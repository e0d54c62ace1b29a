"""Property tests for the daily-grid recurrence ops against brute-force
per-key oracles: random sparse (key, day, count) streams — gaps, single
days, constant runs, hot keys — checking dominant_period's moments-only
lag algebra against a literal zero-filled-grid computation and
holt_forecast against the literal per-step shift recurrence."""

import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from htrc_feature_reader_ray.stages.temporal import (
    dominant_period,
    holt_forecast,
)

DAY = 86_400_000_000

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),      # key
        st.integers(min_value=0, max_value=40),     # day
        st.integers(min_value=1, max_value=5),      # count that day
    ),
    min_size=1,
    max_size=40,
)


def _to_frame(rows):
    expanded = [(k, d) for k, d, c in rows for _ in range(c)]
    return pd.DataFrame({
        "user_id": [k for k, _ in expanded],
        "ts": pd.to_datetime([d * DAY for _, d in expanded], unit="us"),
    })


def _grids(rows):
    per = {}
    for k, d, c in rows:
        per.setdefault(k, {})
        per[k][d] = per[k].get(d, 0) + c
    out = {}
    for k, days in per.items():
        mn, mx = min(days), max(days)
        g = np.zeros(mx - mn + 1, dtype=np.int64)
        for d, c in days.items():
            g[d - mn] += c
        out[k] = g
    return out


@settings(max_examples=20, deadline=None)
@given(events_strategy)
def test_dominant_period_matches_zero_filled_grid(rows):
    out = (dominant_period(
        ray.data.from_pandas(_to_frame(rows)).repartition(3),
        key="user_id", ts="ts")
        .to_pandas().set_index("user_id").sort_index())

    for k, grid in _grids(rows).items():
        n, s = len(grid), int(grid.sum())
        sq = int((grid.astype(object) ** 2).sum())
        den = n * n * sq - n * s * s
        best_r, best_l = None, 0
        for lag in range(2, 15):
            if n <= lag or den <= 0:
                continue
            p = int((grid[:-lag].astype(object) * grid[lag:]).sum())
            head = int(grid[:lag].sum())
            tail = int(grid[-lag:].sum())
            num = (n * n * p - n * s * (2 * s - head - tail)
                   + (n - lag) * s * s) * 10**6
            r = -((-num) // den) if num < 0 else num // den
            if best_r is None or r > best_r:
                best_r, best_l = r, lag
        row = out.loc[k]
        assert int(row["n_days"]) == n
        assert int(row["n_events"]) == s
        assert int(row["best_lag"]) == best_l
        assert int(row["autocorr_ppm"]) == (best_r or 0)


@settings(max_examples=20, deadline=None)
@given(events_strategy, st.integers(min_value=0, max_value=10))
def test_holt_forecast_matches_step_replay(rows, horizon):
    out = (holt_forecast(
        ray.data.from_pandas(_to_frame(rows)).repartition(3),
        key="user_id", ts="ts", horizon=horizon)
        .to_pandas().set_index("user_id").sort_index())

    S = 4096
    for k, grid in _grids(rows).items():
        xs = [int(x) for x in grid]
        lv = S * xs[0]
        b = S * (xs[1] - xs[0]) if len(xs) > 1 else 0
        for x in xs[1:]:
            lnew = (S * x + lv + b) >> 1
            b = (lnew - lv + 3 * b) >> 2
            lv = lnew
        row = out.loc[k]
        assert int(row["level_x4096"]) == lv
        assert int(row["trend_x4096"]) == b
        assert int(row["forecast_x4096"]) == lv + horizon * b
        assert int(row["n_days"]) == len(xs)
