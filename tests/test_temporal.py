import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.stages.temporal import (
    audit_no_leakage,
    backfill,
    broadcast_asof_join,
    lag_lead,
    latest_per_key_ts,
    make_time_grid,
    partitioned_asof_join,
    sessionize,
    tumbling_window,
)
from tests.util import assert_frames_match

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _clicks():
    return ray.data.read_parquet(
        EVENTS, columns=["event_id", "user_id", "ts", "value", "event_type"]
    ).map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("event_type"), "click")).drop(
            ["event_type"]
        ),
        batch_format="pyarrow",
    )


def _purchases_df():
    df = pd.read_parquet(EVENTS, columns=["event_id", "user_id", "ts", "value", "event_type"])
    df = df[df.event_type == "purchase"].rename(columns={"value": "purchase_value"})
    df = latest_per_key_ts(df, on="user_id", ts="ts", tiebreak="event_id")
    return df[["user_id", "ts", "purchase_value"]]


ASOF_ORACLE = """
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
), r0 AS (
  SELECT user_id, ts, value AS purchase_value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), r AS (SELECT user_id, ts, purchase_value FROM r0 WHERE rn = 1)
"""


def test_partitioned_asof_backward_parity(duck):
    left = _clicks()
    right = ray.data.from_pandas(_purchases_df())
    got = partitioned_asof_join(
        left, right, on="user_id", ts="ts", direction="backward", num_buckets=8
    )
    oracle = duck.execute(
        ASOF_ORACLE
        + """
        SELECT l.event_id, l.user_id, l.ts, l.value, r.purchase_value,
               r.ts AS matched_ts
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).df()
    got_df = got.to_pandas()
    audit_no_leakage(got_df, ts="ts", direction="backward")
    assert_frames_match(got_df, oracle)


def test_broadcast_asof_forward_parity(duck):
    got = broadcast_asof_join(
        _clicks(), _purchases_df(), on="user_id", ts="ts", direction="forward"
    )
    oracle = duck.execute(
        ASOF_ORACLE
        + """
        SELECT l.event_id, l.user_id, l.ts, l.value, r.purchase_value,
               r.ts AS matched_ts
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
        """
    ).df()
    got_df = got.to_pandas()
    audit_no_leakage(got_df, ts="ts", direction="forward")
    assert_frames_match(got_df, oracle)


def test_broadcast_asof_tolerance_parity(duck):
    got = broadcast_asof_join(
        _clicks(), _purchases_df(), on="user_id", ts="ts",
        direction="backward", tolerance="30m",
    )
    oracle = duck.execute(
        ASOF_ORACLE
        + """
        SELECT l.event_id, l.user_id, l.ts, l.value,
               CASE WHEN l.ts - r.ts <= INTERVAL 30 MINUTE THEN r.purchase_value END
                   AS purchase_value,
               CASE WHEN l.ts - r.ts <= INTERVAL 30 MINUTE THEN r.ts END AS matched_ts
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).df()
    assert_frames_match(got, oracle)


def test_lag_lead_parity(duck):
    ds = ray.data.read_parquet(EVENTS, columns=["event_id", "user_id", "ts", "value"])
    got = lag_lead(ds, key="user_id", ts="ts", cols=["value"], tiebreak="event_id",
                   num_buckets=8)
    oracle = duck.execute(
        """
        SELECT event_id, user_id, ts, value,
               lag(value) OVER w AS lag_value,
               lead(value) OVER w AS lead_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    ).df()
    assert_frames_match(got, oracle)


def test_sessionize_parity(duck):
    ds = ray.data.read_parquet(EVENTS, columns=["event_id", "user_id", "ts"])
    got = sessionize(ds, key="user_id", ts="ts", gap="30m", tiebreak="event_id",
                     num_buckets=8, aggregate=True)
    oracle = duck.execute(
        """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id::BIGINT AS session_id,
               count(*)::BIGINT AS n_events,
               min(ts) AS ts_start, max(ts) AS ts_end
        FROM sess GROUP BY user_id, session_id
        """
    ).df()
    assert_frames_match(got, oracle)


def test_tumbling_window_parity(duck):
    ds = ray.data.read_parquet(EVENTS, columns=["user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.round(t.column("value").to_numpy() * 100).astype(np.int64)
        return t.drop(["value"]).append_column(
            "value_cents", pa.array(v, type=pa.int64())
        )

    got = tumbling_window(
        ds.map_batches(cents, batch_format="pyarrow"),
        key="user_id", ts="ts", width="1h", sum_cols=["value_cents"],
    )
    oracle = duck.execute(
        """
        SELECT user_id,
               make_timestamp(epoch_us(ts) // 3600000000 * 3600000000) AS window_start,
               count(*)::BIGINT AS n_events,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_cents
        FROM events GROUP BY 1, 2
        """
    ).df()
    assert_frames_match(got, oracle)


def test_backfill_parity(duck):
    users = sorted(
        pd.read_parquet(EVENTS, columns=["user_id"])["user_id"].unique()
    )
    grid = make_time_grid(users, start="2024-01-01", end="2024-01-08", step="1D")
    got = backfill(
        ray.data.from_pandas(grid),
        _purchases_df(),
        on="user_id", ts="ts", tolerance="2D",
    )
    oracle = duck.execute(
        ASOF_ORACLE
        + """
        , users AS (SELECT DISTINCT user_id FROM events),
        grid AS (
          SELECT user_id, g.ts FROM users,
                 unnest(generate_series(TIMESTAMP '2024-01-01',
                                        TIMESTAMP '2024-01-08',
                                        INTERVAL 1 DAY)) AS g(ts)
        )
        SELECT grid.user_id, grid.ts,
               CASE WHEN grid.ts - r.ts <= INTERVAL 2 DAY THEN r.purchase_value END
                   AS purchase_value,
               CASE WHEN grid.ts - r.ts <= INTERVAL 2 DAY THEN r.ts END AS matched_ts
        FROM grid ASOF LEFT JOIN r ON grid.user_id = r.user_id AND grid.ts >= r.ts
        """
    ).df()
    got_df = got.to_pandas()
    audit_no_leakage(got_df, ts="ts", direction="backward")
    assert_frames_match(got_df, oracle)


def test_leakage_audit_catches_violation():
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-02"]),
            "matched_ts": pd.to_datetime(["2024-01-03"]),
        }
    )
    try:
        audit_no_leakage(df, ts="ts", direction="backward")
    except AssertionError:
        return
    raise AssertionError("leakage not detected")


def test_rolling_key_features_vs_pandas():
    from htrc_feature_reader_ray.stages.temporal import rolling_key_features

    rng = np.random.RandomState(6)
    n = 1000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 20, n).astype(np.int64),
            "ts": pd.to_datetime(
                np.sort(rng.randint(0, 10**6, n)), unit="s"
            ).astype("datetime64[us]"),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    got = (
        rolling_key_features(
            ray.data.from_pandas(df).repartition(9), key="user_id", ts="ts",
            value_col="v", window=4, tiebreak="event_id", num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g = ref.groupby("user_id", sort=False)
    ref["cum_v"] = g["v"].cumsum()
    ref["roll_v"] = (
        g["v"].rolling(4, min_periods=1).sum().reset_index(drop=True).to_numpy()
    )
    ref["rn"] = g.cumcount() + 1
    rank = g["v"].rank(method="min")
    nn = g["v"].transform("size")
    ref["pct_rank"] = np.where(
        nn > 1, (rank - 1) / (nn - 1).replace(0, 1), 0.0
    )
    ref = ref.sort_values("event_id").reset_index(drop=True)
    for c in ("cum_v", "roll_v", "rn"):
        assert got[c].astype("int64").tolist() == ref[c].astype("int64").tolist(), c
    assert np.allclose(got["pct_rank"], ref["pct_rank"])


def test_hopping_equals_tumbling_when_slide_is_width():
    from htrc_feature_reader_ray.stages.temporal import hopping_window

    ds = ray.data.read_parquet(EVENTS, columns=["user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.round(t.column("value").to_numpy() * 100).astype(np.int64)
        return t.drop(["value"]).append_column(
            "value_cents", pa.array(v, type=pa.int64())
        )

    src = ds.map_batches(cents, batch_format="pyarrow")
    hop = (
        hopping_window(src, key="user_id", ts="ts", width="1h", slide="1h",
                       sum_cols=["value_cents"])
        .to_pandas().sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    tum = (
        tumbling_window(src, key="user_id", ts="ts", width="1h",
                        sum_cols=["value_cents"])
        .to_pandas().sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    assert hop.equals(tum)


def test_mark_late_events_watermark_semantics():
    import numpy as np
    import pandas as pd
    import ray.data
    from htrc_feature_reader_ray.stages.temporal import mark_late_events

    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime(
                [
                    "2024-01-10 12:00",  # u1: 2d before max -> late
                    "2024-01-12 11:00",  # u1: 1h inside delay -> on time
                    "2024-01-12 12:00",  # u1: the watermark row itself
                    "2024-01-05 00:00",  # u2: exactly delay before max -> NOT late (<, not <=)
                    "2024-01-06 00:00",  # u2 max
                    "2024-03-01 00:00",  # u3 single event -> never late
                ]
            ).astype("datetime64[us]"),
        }
    )
    out = (
        mark_late_events(
            ray.data.from_pandas(df).repartition(3), key="user_id",
            ts="ts", delay="1D",
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert list(out.is_late) == [1, 0, 0, 0, 0, 0]


def test_rolling_time_aggregate_vs_sql_with_ties():
    import duckdb

    from htrc_feature_reader_ray.stages.temporal import rolling_time_aggregate

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 12, n),
        # coarse grid forces duplicate ts within keys (RANGE peer semantics)
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 50, n) * 3600, unit="s"),
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = (
        rolling_time_aggregate(ds, key="k", ts="ts", value_col="v",
                               window="5 hours", num_buckets=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("e", df)
    exp = con.execute("""
        SELECT event_id, k, ts, v,
               (sum(v) OVER w)::BIGINT AS rsum_v,
               (count(*) OVER w)::BIGINT AS rcnt_v,
               (sum(v) OVER w)::DOUBLE / (count(*) OVER w) AS rmean_v
        FROM e
        WINDOW w AS (PARTITION BY k ORDER BY ts
                     RANGE BETWEEN INTERVAL '5 hours' PRECEDING
                           AND CURRENT ROW)
    """).df().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["event_id", "k", "ts", "v", "rsum_v", "rcnt_v", "rmean_v"]],
        exp, check_dtype=True,
    )


def test_rolling_time_aggregate_overflow_fallback_path():
    from htrc_feature_reader_ray.stages.temporal import rolling_time_aggregate

    # 600 keys × ~500-year span in µs exceeds the 9e18 disjoint-axis budget,
    # forcing the per-group searchsorted fallback; answers must be identical
    rows = []
    for k in range(600):
        rows.append({"event_id": 2 * k, "k": k,
                     "ts": pd.Timestamp("1700-01-01"), "v": 1})
        rows.append({"event_id": 2 * k + 1, "k": k,
                     "ts": pd.Timestamp("2200-01-01"), "v": 10})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    out = (
        rolling_time_aggregate(ds, key="k", ts="ts", value_col="v",
                               window="1 hour", num_buckets=1)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # each event only sees itself (gap >> window)
    assert out.rsum_v.tolist() == [1, 10] * 600
    assert (out.rcnt_v == 1).all()


def test_snapshot_change_exact_cases():
    from htrc_feature_reader_ray.stages.temporal import snapshot_change

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # url A: identical re-fetch -> jaccard 1.0, 0 added/removed
        {"url": "A", "warc_ts": t0, "text": "x y z"},
        {"url": "A", "warc_ts": t0 + pd.Timedelta("1h"), "text": "z y x x"},
        # url B: full replacement -> jaccard 0.0
        {"url": "B", "warc_ts": t0, "text": "a b"},
        {"url": "B", "warc_ts": t0 + pd.Timedelta("1h"), "text": "c d e"},
        # url C: partial drift
        {"url": "C", "warc_ts": t0, "text": "p q r"},
        {"url": "C", "warc_ts": t0 + pd.Timedelta("1h"), "text": "q r s t"},
        # url D: empty -> empty (0 union -> NaN)
        {"url": "D", "warc_ts": t0, "text": ""},
        {"url": "D", "warc_ts": t0 + pd.Timedelta("1h"), "text": ""},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = (
        snapshot_change(ds, num_buckets=4)
        .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    # first snapshots all NaN
    firsts = out.groupby("url").head(1)
    assert firsts.jaccard.isna().all() and firsts.n_added.isna().all()
    second = out.groupby("url").tail(1).set_index("url")
    assert second.loc["A"].jaccard == 1.0
    assert second.loc["A"].n_added == 0 and second.loc["A"].n_removed == 0
    assert second.loc["B"].jaccard == 0.0
    assert second.loc["B"].n_added == 3 and second.loc["B"].n_removed == 2
    # C: inter {q,r}=2, union {p,q,r,s,t}=5
    assert second.loc["C"].jaccard == 2 / 5
    assert second.loc["C"].n_added == 2 and second.loc["C"].n_removed == 1
    # D: 0-union pair stays NaN
    assert np.isnan(second.loc["D"].jaccard)


def test_cohort_retention_exact():
    from htrc_feature_reader_ray.stages.temporal import cohort_retention

    # u1 first event Wed 1970-01-07 (week of Mon 1/5); active again the
    # following week (Mon 1/12) and 3 weeks later.  u2 first event Mon
    # 1/12 exactly at the week boundary.
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([
            "1970-01-07 12:00", "1970-01-08 01:00",  # same week, 1 cell
            "1970-01-13 00:00", "1970-01-26 23:59",
            "1970-01-12 00:00", "1970-01-18 23:59",  # sun = same week
        ]).astype("datetime64[us]"),
    })
    out = (
        cohort_retention(ray.data.from_pandas(df), num_buckets=4)
        .to_pandas().sort_values(["cohort_week", "weeks_since"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame({
        "cohort_week": pd.to_datetime(
            ["1970-01-05", "1970-01-05", "1970-01-05", "1970-01-12"]
        ).astype("datetime64[us]"),
        "weeks_since": np.array([0, 1, 3, 0], dtype=np.int64),
        "n_users": np.array([1, 1, 1, 1], dtype=np.int64),
    })
    assert_frames_match(out, expect)


def test_rfm_features_exact():
    from htrc_feature_reader_ray.stages.profile import rfm_features

    df = pd.DataFrame({
        "k": [1, 1, 2],
        "t": pd.to_datetime(
            ["1970-01-01 00:00", "1970-01-10 06:00", "1970-01-11 00:00"]
        ).astype("datetime64[us]"),
        "amt": [1.005, 2.0, 0.994],  # 1.005*100 rounds half-even? np.round(100.5)=100
    })
    out = (
        rfm_features(ray.data.from_pandas(df), key="k", ts="t",
                     amount_col="amt", num_buckets=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out.n_orders.tolist() == [2, 1]
    # np.round is banker's rounding: 100.5 -> 100
    assert out.total_cents.tolist() == [100 + 200, 99]
    # global max = 1/11; k=1 last = 1/10 06:00 -> 0 whole days (18h)
    assert out.recency_days.tolist() == [0, 0]
    assert out.last_order.astype(str).tolist() == [
        "1970-01-10 06:00:00", "1970-01-11 00:00:00"]


def test_rolling_active_users_exact():
    from htrc_feature_reader_ray.stages.temporal import rolling_active_users

    # u1 active day 0 and day 2; u2 active day 0 only; 3-day windows
    df = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime([
            "1970-01-01 05:00", "1970-01-03 01:00", "1970-01-01 23:00",
        ]).astype("datetime64[us]"),
    })
    out = (rolling_active_users(ray.data.from_pandas(df), window_days=3,
                                num_buckets=4, out_col="active_3d")
           .to_pandas().sort_values("day").reset_index(drop=True))
    # windows: day0 {u1,u2}=2, day1 {u1,u2}=2, day2 {u1,u2}=2 (u1 via d0
    # AND d2 — distinct!), day3 {u1}=1 (d2 window), day4 {u1}=1
    assert out.day.astype(str).tolist() == [
        "1970-01-01", "1970-01-02", "1970-01-03",
        "1970-01-04", "1970-01-05"]
    assert out.active_3d.tolist() == [2, 2, 2, 1, 1]


def test_snapshot_intervals_versions_and_open_end():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.temporal import snapshot_intervals

    t = pd.to_datetime(["2026-01-01", "2026-01-05", "2026-02-01",
                        "2026-01-03"])
    df = pd.DataFrame({
        "url": ["u1", "u1", "u1", "u2"],
        "ts": t,
    })
    out = snapshot_intervals(
        ray.data.from_pandas(df).repartition(3), key="url", ts="ts"
    ).to_pandas().sort_values(["url", "version"]).reset_index(drop=True)
    u1 = out[out["url"] == "u1"]
    assert u1["version"].tolist() == [1, 2, 3]
    assert u1["valid_to"].iloc[0] == t[1]
    assert u1["valid_to"].iloc[1] == t[2]
    assert pd.isna(u1["valid_to"].iloc[2])  # current version open-ended
    u2 = out[out["url"] == "u2"]
    assert u2["version"].tolist() == [1]
    assert pd.isna(u2["valid_to"].iloc[0])


def test_interpolate_daily_exact_lerp_and_trunc_division():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.temporal import interpolate_daily

    df = pd.DataFrame({
        "u": [1, 1, 1, 2],
        "ts": pd.to_datetime(
            ["2026-01-01", "2026-01-04", "2026-01-05", "2026-01-02"]),
        "v": [10, 3, 100, 7],
    })
    out = interpolate_daily(
        ray.data.from_pandas(df).repartition(2), key="u", ts="ts",
        value_col="v",
    ).to_pandas().sort_values(["u", "day"]).reset_index(drop=True)
    u1 = out[out["u"] == 1]
    # days 1..4 with dv=-7 over 3 days, TRUNCATING division (DuckDB //):
    # 10, 10+trunc(-7/3)=8, 10+trunc(-14/3)=6, 3, then 100
    # (floor semantics would give 7 and 5 — this pins the trunc contract)
    assert u1["value"].tolist() == [10, 8, 6, 3, 100]
    assert u1["observed"].tolist() == [True, False, False, True, True]
    u2 = out[out["u"] == 2]
    assert u2["value"].tolist() == [7]  # single observation: no extrapolation


def test_interpolate_daily_rejects_duplicate_day():
    import pandas as pd
    import pytest
    import ray.data

    from htrc_feature_reader_ray.stages.temporal import interpolate_daily

    df = pd.DataFrame({
        "u": [1, 1],
        "ts": pd.to_datetime(["2026-01-01 03:00", "2026-01-01 09:00"]),
        "v": [1, 2],
    })
    with pytest.raises(Exception, match="duplicate"):
        interpolate_daily(ray.data.from_pandas(df), key="u", ts="ts",
                          value_col="v").materialize()


def test_cusum_flags_recursion_identity():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.temporal import cusum_flags

    ts = pd.date_range("2026-01-01", periods=6, freq="1h")
    df = pd.DataFrame({
        "u": [1] * 6,
        "ts": ts,
        "v": [5, 20, 1, 1, 30, 30],
    })
    out = cusum_flags(
        ray.data.from_pandas(df).repartition(2),
        key="u", ts="ts", value_col="v", drift=10, threshold=25,
    ).to_pandas().sort_values("ts")
    # reference recursion s = max(0, s + x - k)
    s, expect = 0, []
    for x in df["v"]:
        s = max(0, s + x - 10)
        expect.append(s)
    assert out["cusum"].tolist() == expect
    assert out["flag"].tolist() == [e > 25 for e in expect]


def test_touch_attribution_window_edges_and_ties():
    import ray.data

    from htrc_feature_reader_ray.stages.temporal import touch_attribution

    T = pd.Timestamp("2024-03-10 12:00:00")
    D = pd.Timedelta
    rows = [
        # user 1: edge-inclusive window start, tie at one ts, same-ts excl
        (1, 1, T - D("7D"), "click"),      # exactly lookback edge: IN
        (2, 1, T - D("3D"), "view"),       # tie pair (same ts) ...
        (3, 1, T - D("3D"), "click"),      # ... id asc decides first/last
        (4, 1, T, "view"),                 # same ts as conversion: OUT
        (5, 1, T, "purchase"),
        (6, 1, T + D("1D"), "click"),      # after: OUT
        # user 2: conversion with no touches in window
        (7, 2, T - D("30D"), "click"),
        (8, 2, T, "purchase"),
        # user 3: only an error event (not a touch type)
        (9, 3, T - D("1D"), "error"),
        (10, 3, T, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    got = (
        touch_attribution(ray.data.from_pandas(df).repartition(3))
        .to_pandas().set_index("event_id").sort_index()
    )
    r1 = got.loc[5]
    assert r1["n_touches"] == 3
    assert r1["first_touch"] == "click"      # the 7D-edge click
    assert r1["last_touch"] == "click"       # (T-3D, id 3) beats id 2
    r2 = got.loc[8]
    assert r2["n_touches"] == 0 and r2["first_touch"] is None
    r3 = got.loc[10]
    assert r3["n_touches"] == 0 and r3["last_touch"] is None


def test_change_point_localizes_level_shift():
    from htrc_feature_reader_ray.stages.temporal import change_point

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: 1 event/day for 10 days, then 5/day for 10 days -> break at
    # day index 9 (last quiet day)
    for d in range(20):
        for _ in range(1 if d < 10 else 5):
            rows.append((1, t0 + pd.Timedelta(days=d, hours=1)))
    # user 2: constant 2/day -> dev small, but still emits a row
    for d in range(15):
        for _ in range(2):
            rows.append((2, t0 + pd.Timedelta(days=d)))
    # user 3: single day -> excluded (no valid split)
    rows.append((3, t0))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = change_point(
        ray.data.from_pandas(df).repartition(7), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    day0 = (t0.value // 1000) // 86_400_000_000
    assert 3 not in out.index
    assert out.loc[1, "break_day"] == day0 + 9
    assert out.loc[1, "n_days"] == 20 and out.loc[1, "n_events"] == 60
    # exact dev at k=10: |20*10 - 10*60| = 400 -> ppm = 400e6 // 1200
    assert out.loc[1, "dev_ppm"] == 400 * 1_000_000 // (20 * 60)
    # constant-rate user: perfectly uniform -> dev 0 at every split
    assert out.loc[2, "dev_ppm"] == 0


def test_change_point_zero_filled_gap_is_a_break():
    from htrc_feature_reader_ray.stages.temporal import change_point

    t0 = pd.Timestamp("2024-03-01")
    # active 5 days, silent 5 days: the shift to silence must localize
    # at the last active day
    rows = [(7, t0 + pd.Timedelta(days=d)) for d in range(5)]
    rows.append((7, t0 + pd.Timedelta(days=9)))  # one late event fixes mx
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = change_point(ray.data.from_pandas(df), key="user_id",
                       ts="ts").to_pandas()
    day0 = (t0.value // 1000) // 86_400_000_000
    assert out.iloc[0]["n_days"] == 10
    assert out.iloc[0]["break_day"] == day0 + 4


def test_fano_factor_exact_regimes():
    from htrc_feature_reader_ray.stages.temporal import fano_factor

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: metronomic 3/day for 10 days -> Var=0 -> F=0
    for d in range(10):
        rows += [(1, t0 + pd.Timedelta(days=d))] * 3
    # user 2: bursty — all 30 events on one day of a 10-day span
    rows += [(2, t0)] * 30
    rows += [(2, t0 + pd.Timedelta(days=9))] * 0  # span via a marker below
    rows.append((2, t0 + pd.Timedelta(days=9)))
    # user 3: single day -> F=0 by contract
    rows += [(3, t0)] * 7
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = fano_factor(
        ray.data.from_pandas(df).repartition(6), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert out.loc[1, "fano_ppm"] == 0
    assert out.loc[3, "fano_ppm"] == 0
    # user 2 exact: days [30,0,...,0,1], n=10, S=31, sumsq=901
    n, s, sq = 10, 31, 901
    assert out.loc[2, "fano_ppm"] == (n * sq - s * s) * 1_000_000 // (n * s)
    assert out.loc[2, "fano_ppm"] > 1_000_000  # bursty >> Poisson
    assert out.loc[2, "n_days"] == 10 and out.loc[2, "n_events"] == 31


def test_daily_autocorr_exact_regimes():
    from htrc_feature_reader_ray.stages.temporal import daily_autocorr

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: day-on/day-off — 2 events on days 0,2,4 (grid 2,0,2,0,2)
    for d in (0, 2, 4):
        rows += [(1, t0 + pd.Timedelta(days=d))] * 2
    # user 2: increasing run 1,2,3,4 on consecutive days
    for d in range(4):
        rows += [(2, t0 + pd.Timedelta(days=d))] * (d + 1)
    # user 3: constant 2/day for 5 days -> den = 0 -> 0 by contract
    for d in range(5):
        rows += [(3, t0 + pd.Timedelta(days=d))] * 2
    # user 4: single day -> stays in output with 0
    rows += [(4, t0)] * 7
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = daily_autocorr(
        ray.data.from_pandas(df).repartition(6), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    # user 1 by hand: mean 1.2, r1 = -3.84/4.8 = -0.8 exactly
    assert out.loc[1, "autocorr_ppm"] == -800_000
    assert out.loc[1, "n_days"] == 5 and out.loc[1, "n_events"] == 6
    # user 2 by hand: num/den = 20/80 = 0.25 exactly
    assert out.loc[2, "autocorr_ppm"] == 250_000
    assert out.loc[2, "n_days"] == 4 and out.loc[2, "n_events"] == 10
    assert out.loc[3, "autocorr_ppm"] == 0
    assert out.loc[4, "autocorr_ppm"] == 0
    assert out.loc[4, "n_days"] == 1 and out.loc[4, "n_events"] == 7


def test_daily_autocorr_truncates_toward_zero():
    from htrc_feature_reader_ray.stages.temporal import daily_autocorr

    t0 = pd.Timestamp("2024-06-01")
    # grid 1,0,2 over days 0..2: num/den = -9/18 = -0.5 -> -500000;
    # and a key whose ratio is NOT exact to force the trunc branch:
    # grid 3,0,1 -> n=3 S=4 SQ=10 P=0 cf=3 cl=1:
    #   num = 0 - 3*4*(8-3-1) + 2*16 = -48+32 = -16; den = 90-48 = 42
    #   -16e6 trunc/ 42 = -380952 (floor would give -380953)
    rows = [(1, t0), (1, t0 + pd.Timedelta(days=2)),
            (1, t0 + pd.Timedelta(days=2))]
    rows += [(2, t0)] * 3 + [(2, t0 + pd.Timedelta(days=2))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = daily_autocorr(ray.data.from_pandas(df), key="user_id",
                         ts="ts").to_pandas().set_index("user_id")
    assert out.loc[1, "autocorr_ppm"] == -500_000
    assert out.loc[2, "autocorr_ppm"] == -(16_000_000 // 42)
    assert (16_000_000 // 42) == 380_952


def test_growth_accounting_identity_and_classes():
    from htrc_feature_reader_ray.stages.temporal import growth_accounting

    t0 = pd.Timestamp("2024-01-01")

    def on(u, days):
        return [(u, t0 + pd.Timedelta(days=d)) for d in days]

    # u1 active days 0,1,3; u2 active days 1,2; u3 active day 3 only
    rows = on(1, [0, 1, 3]) + on(2, [1, 2]) + on(3, [3])
    # duplicate events within a day must not double-count
    rows += on(1, [0])
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = growth_accounting(
        ray.data.from_pandas(df).repartition(4)
    ).to_pandas().set_index("day").sort_index()

    d = {i: t0 + pd.Timedelta(days=i) for i in range(5)}
    # day0: u1 new. day1: u1 retained, u2 new. day2: u2 retained,
    #   u1 churned (active 1, not 2). day3: u1 resurrected, u3 new,
    #   u2 churned. day4: u1,u3 churn (closed rule past corpus end).
    assert out.loc[d[0], "n_new"] == 1 and out.loc[d[0], "n_churned"] == 0
    assert out.loc[d[1], "n_new"] == 1
    assert out.loc[d[1], "n_retained"] == 1
    assert out.loc[d[2], "n_retained"] == 1
    assert out.loc[d[2], "n_churned"] == 1
    assert out.loc[d[3], "n_resurrected"] == 1
    assert out.loc[d[3], "n_new"] == 1
    assert out.loc[d[3], "n_churned"] == 1
    assert out.loc[d[4], "n_churned"] == 2
    # exact identity: net telescopes active counts
    active = {0: 1, 1: 2, 2: 1, 3: 2, 4: 0}
    for i in range(5):
        prev = active[i - 1] if i else 0
        assert out.loc[d[i], "net"] == active[i] - prev


def test_max_silence_longest_and_ties():
    from htrc_feature_reader_ray.stages.temporal import max_silence

    t0 = pd.Timestamp("2024-01-01")

    def on(u, days):
        return [(u, t0 + pd.Timedelta(days=d)) for d in days]

    rows = []
    # user 1: silences of 7 (days 3..9) and 8 (days 12..19) -> 8 wins
    rows += on(1, [0, 1, 2, 10, 11, 20])
    # user 2: two silences of 4 -> earliest (start day 1) wins
    rows += on(2, [0, 5, 10])
    # user 3: fully consecutive -> excluded
    rows += on(3, [0, 1, 2])
    # user 4: single day -> excluded
    rows += on(4, [0])
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = max_silence(
        ray.data.from_pandas(df).repartition(5), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert 3 not in out.index and 4 not in out.index
    assert out.loc[1, "max_silence_days"] == 8
    assert out.loc[1, "silence_start"] == t0 + pd.Timedelta(days=12)
    assert out.loc[1, "n_active_days"] == 6
    assert out.loc[2, "max_silence_days"] == 4
    assert out.loc[2, "silence_start"] == t0 + pd.Timedelta(days=1)


def test_seasonal_strength_regimes():
    from htrc_feature_reader_ray.stages.temporal import seasonal_strength

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: perfectly weekly (2 events every 7th day) -> s7=0, ratio 0
    for w in range(4):
        rows += [(1, t0 + pd.Timedelta(days=7 * w))] * 2
    # user 2: constant 3/day for 9 days -> s1=0 -> neutral 1e6
    for d in range(9):
        rows += [(2, t0 + pd.Timedelta(days=d))] * 3
    # user 3: 1/day days 0..10 with a burst of 10 on day 9
    #   s1 = 9+9 = 18; s7 = |10-1| at t=9 -> 9; ratio 500000
    for d in range(11):
        rows += [(3, t0 + pd.Timedelta(days=d))] * (10 if d == 9 else 1)
    # user 4: zeros dominate — 2 events day 0, 3 events day 10
    #   grid s1 = 2+3 = 5; s7 = |x7-x0| + |x10-x3| = 2+3 = 5 -> 1e6
    rows += [(4, t0)] * 2 + [(4, t0 + pd.Timedelta(days=10))] * 3
    # user 5: span 7 (< lag+1) -> excluded
    rows += [(5, t0), (5, t0 + pd.Timedelta(days=6))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = seasonal_strength(
        ray.data.from_pandas(df).repartition(6), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert 5 not in out.index
    assert out.loc[1, "seasonal_ratio_ppm"] == 0
    assert out.loc[1, "naive_abs"] == 12 and out.loc[1, "seasonal_abs"] == 0
    assert out.loc[2, "seasonal_ratio_ppm"] == 1_000_000  # neutral s1=0
    assert out.loc[3, "naive_abs"] == 18
    assert out.loc[3, "seasonal_abs"] == 9
    assert out.loc[3, "seasonal_ratio_ppm"] == 500_000
    assert out.loc[4, "naive_abs"] == 5 and out.loc[4, "seasonal_abs"] == 5
    assert out.loc[4, "seasonal_ratio_ppm"] == 1_000_000


def test_activity_half_life_regimes():
    from htrc_feature_reader_ray.stages.temporal import activity_half_life

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1 front-loaded: 8 events day 0, 1 event/day days 1..8
    #   S=16, cum day0=8 -> 2*8 >= 16 -> h=0, share 0
    rows += [(1, t0)] * 8
    for d in range(1, 9):
        rows.append((1, t0 + pd.Timedelta(days=d)))
    # user 2 steady: 1/day for 10 days -> S=10, first 2*cum>=10 at
    #   day 4 (cum 5) -> h=4, share = 4e6 // 9 = 444444
    for d in range(10):
        rows.append((2, t0 + pd.Timedelta(days=d)))
    # user 3 late bloom: 1 event day 0, 9 events day 6 -> cum day0=1
    #   (2<10), day6 cum=10 -> h=6, share 1e6
    rows.append((3, t0))
    rows += [(3, t0 + pd.Timedelta(days=6))] * 9
    # user 4 single day -> h=0, share 0, stays in output
    rows += [(4, t0)] * 3
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = activity_half_life(
        ray.data.from_pandas(df).repartition(6), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert out.loc[1, "half_life_days"] == 0
    assert out.loc[1, "half_share_ppm"] == 0
    assert out.loc[2, "half_life_days"] == 4
    assert out.loc[2, "half_share_ppm"] == 4_000_000 // 9
    assert out.loc[3, "half_life_days"] == 6
    assert out.loc[3, "half_share_ppm"] == 1_000_000
    assert out.loc[4, "half_life_days"] == 0
    assert out.loc[4, "n_days"] == 1 and out.loc[4, "n_events"] == 3


def test_gap_stats_exact_regimes():
    from htrc_feature_reader_ray.stages.temporal import gap_stats

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: metronomic every 60s x 5 events -> 4 equal gaps, CV2=0
    for i in range(5):
        rows.append((1, t0 + pd.Timedelta(seconds=60 * i)))
    # user 2: gaps 1s,1s,10s (bursty) -> m=3 G=12 SQ=102
    #   cv2 = (3*102-144)*1e6 // 144 = 162e6//144 = 1125000
    #   sorted gaps (1,1,10): lower median (m-1)//2=1 -> 1s
    for off in (0, 1, 2, 12):
        rows.append((2, t0 + pd.Timedelta(seconds=off)))
    # user 3: single event -> excluded (no gaps)
    rows.append((3, t0))
    # user 4: two simultaneous events -> G=0 -> cv2 0 by contract
    rows += [(4, t0), (4, t0)]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = gap_stats(
        ray.data.from_pandas(df).repartition(5), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert 3 not in out.index
    assert out.loc[1, "cv2_ppm"] == 0
    assert out.loc[1, "n_gaps"] == 4
    assert out.loc[1, "median_gap_us"] == 60_000_000
    assert out.loc[2, "cv2_ppm"] == 1_125_000
    assert out.loc[2, "median_gap_us"] == 1_000_000
    assert out.loc[2, "gap_sum_us"] == 12_000_000
    assert out.loc[4, "cv2_ppm"] == 0 and out.loc[4, "gap_sum_us"] == 0


def test_gap_stats_even_count_lower_median():
    from htrc_feature_reader_ray.stages.temporal import gap_stats

    t0 = pd.Timestamp("2024-02-01")
    # gaps 2s,8s (even count): lower median = 2s, not 5s
    rows = [(9, t0), (9, t0 + pd.Timedelta(seconds=2)),
            (9, t0 + pd.Timedelta(seconds=10))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = gap_stats(ray.data.from_pandas(df), key="user_id",
                    ts="ts").to_pandas()
    assert out.iloc[0]["median_gap_us"] == 2_000_000


def test_markov_stationary_two_state_exact():
    from htrc_feature_reader_ray.stages.temporal import (
        _MARKOV_SCALE,
        markov_stationary,
    )

    t0 = pd.Timestamp("2024-01-01")
    # one user alternating a,b,a,b,... -> chain a<->b deterministic,
    # stationary = 50/50
    seq = ["a", "b"] * 20
    df = pd.DataFrame({
        "event_id": np.arange(40, dtype=np.int64),
        "user_id": np.ones(40, dtype=np.int64),
        "ts": [t0 + pd.Timedelta(minutes=i) for i in range(40)],
        "event_type": seq,
    })
    out = markov_stationary(
        ray.data.from_pandas(df).repartition(4), tiebreak="event_id"
    ).to_pandas().set_index("event_type")
    assert abs(out.loc["a", "pi_ppm"] - 500_000) <= 1
    assert abs(out.loc["b", "pi_ppm"] - 500_000) <= 1


def test_markov_stationary_dangling_absorbs():
    from htrc_feature_reader_ray.stages.temporal import markov_stationary

    t0 = pd.Timestamp("2024-01-01")
    # a -> b always, b has no outgoing (dangling self-loop): b absorbs
    df = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [1, 1],
        "ts": [t0, t0 + pd.Timedelta(minutes=1)],
        "event_type": ["a", "b"],
    })
    out = markov_stationary(ray.data.from_pandas(df),
                            tiebreak="event_id").to_pandas(
    ).set_index("event_type")
    assert out.loc["a", "pi_ppm"] == 0
    assert out.loc["b", "pi_ppm"] >= 999_999


def test_duplicate_events_chain_semantics():
    from htrc_feature_reader_ray.stages.temporal import duplicate_events

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": np.arange(6, dtype=np.int64),
        "user_id": [1, 1, 1, 1, 2, 1],
        "event_type": ["click", "click", "click", "view", "click",
                       "click"],
        "cents": np.array([100, 100, 100, 100, 100, 200],
                          dtype=np.int64),
        "ts": [t0,
               t0 + pd.Timedelta(seconds=3),    # dup (same tuple, 3s)
               t0 + pd.Timedelta(seconds=6),    # dup of the 3s copy
               t0 + pd.Timedelta(seconds=1),    # different type
               t0 + pd.Timedelta(seconds=2),    # different user
               t0 + pd.Timedelta(seconds=4)],   # different cents
    })
    out = duplicate_events(
        ray.data.from_pandas(df).repartition(3), key="user_id", ts="ts",
        match_cols=["event_type", "cents"], within_us=5_000_000,
        tiebreak="event_id").to_pandas().set_index("event_id")
    assert list(out.loc[[0, 1, 2, 3, 4, 5], "is_dup"]) == [
        False, True, True, False, False, False]
    # outside the window at every chain step: not a dup
    df2 = df.copy()
    df2.loc[1, "ts"] = t0 + pd.Timedelta(seconds=10)
    df2.loc[2, "ts"] = t0 + pd.Timedelta(seconds=20)
    out2 = duplicate_events(
        ray.data.from_pandas(df2), key="user_id", ts="ts",
        match_cols=["event_type", "cents"], within_us=5_000_000,
        tiebreak="event_id").to_pandas().set_index("event_id")
    assert not out2.loc[1, "is_dup"] and not out2.loc[2, "is_dup"]


def test_event_trigrams_path_vs_pingpong():
    from htrc_feature_reader_ray.stages.temporal import event_trigrams

    t0 = pd.Timestamp("2024-01-01")
    # user 1: a b a b a (ping-pong) -> trigrams aba, bab, aba
    # user 2: a b c (progression)   -> abc
    seqs = {1: ["a", "b", "a", "b", "a"], 2: ["a", "b", "c"]}
    rows = []
    eid = 0
    for u, seq in seqs.items():
        for i, t in enumerate(seq):
            rows.append((eid, u, t0 + pd.Timedelta(minutes=i), t))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type"])
    out = event_trigrams(ray.data.from_pandas(df).repartition(3),
                         tiebreak="event_id", top_k=10).to_pandas()
    got = {(a, b, c): n for a, b, c, n in
           zip(out["t1"], out["t2"], out["t3"], out["n"])}
    assert got == {("a", "b", "a"): 2, ("b", "a", "b"): 1,
                   ("a", "b", "c"): 1}
    # top-1 ordering: count desc
    assert (out.iloc[0][["t1", "t2", "t3"]] == ["a", "b", "a"]).all()
    # no cross-user trigrams: total = 4
    assert out["n"].sum() == 4


def test_daily_trend_exact_ols():
    from htrc_feature_reader_ray.stages.temporal import daily_trend

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: counts 1,2,3,4,5 per day -> slope exactly +1 event/day
    for d in range(5):
        rows += [(1, t0 + pd.Timedelta(days=d))] * (d + 1)
    # user 2: counts 5,4,3,2,1 -> slope exactly -1
    for d in range(5):
        rows += [(2, t0 + pd.Timedelta(days=d))] * (5 - d)
    # user 3: constant -> slope 0; user 4: single day -> excluded
    for d in range(4):
        rows += [(3, t0 + pd.Timedelta(days=d))] * 2
    rows.append((4, t0))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = daily_trend(
        ray.data.from_pandas(df).repartition(6), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert out.loc[1, "slope_ppm"] == 1_000_000
    assert out.loc[2, "slope_ppm"] == -1_000_000
    assert out.loc[3, "slope_ppm"] == 0
    assert 4 not in out.index
    # zero-fill matters: activity on days {0, 4} only, 2 events each ->
    # slope 0 over the 5-day grid (symmetric), NOT over 2 points
    df2 = pd.DataFrame(
        [(7, t0)] * 2 + [(7, t0 + pd.Timedelta(days=4))] * 2,
        columns=["user_id", "ts"])
    o2 = daily_trend(ray.data.from_pandas(df2), key="user_id",
                     ts="ts").to_pandas()
    assert o2.iloc[0]["slope_ppm"] == 0 and o2.iloc[0]["n_days"] == 5


def test_theil_sen_robust_to_outlier_day():
    from htrc_feature_reader_ray.stages.temporal import (
        daily_trend,
        theil_sen_trend,
    )

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: flat 2/day for 11 days, but day 10 is a 100-event spike.
    for d in range(11):
        rows += [(1, t0 + pd.Timedelta(days=d))] * (100 if d == 10 else 2)
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    ts_out = theil_sen_trend(
        ray.data.from_pandas(df).repartition(4), key="user_id", ts="ts"
    ).to_pandas()
    ols = daily_trend(ray.data.from_pandas(df), key="user_id",
                      ts="ts").to_pandas()
    # OLS dragged hard positive by the spike; Theil-Sen stays at 0
    assert ols.iloc[0]["slope_ppm"] > 2_000_000
    assert ts_out.iloc[0]["ts_slope_ppm"] == 0
    assert ts_out.iloc[0]["n_pairs"] == 11 * 10 // 2
    # exact clean trend: counts 1..5 -> every pair slope is 1e6
    rows2 = []
    for d in range(5):
        rows2 += [(2, t0 + pd.Timedelta(days=d))] * (d + 1)
    o2 = theil_sen_trend(
        ray.data.from_pandas(pd.DataFrame(
            rows2, columns=["user_id", "ts"])),
        key="user_id", ts="ts").to_pandas()
    assert o2.iloc[0]["ts_slope_ppm"] == 1_000_000


def test_survival_curve_km_with_censoring():
    from htrc_feature_reader_ray.stages.temporal import survival_curve

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # global window will end at day 20 (user 99 keeps gmax at 20)
    rows += [(99, t0), (99, t0 + pd.Timedelta(days=20))]  # dur 20, censored
    # 4 users churn at duration 2 (last day 2, far from day 20)
    for u in range(1, 5):
        rows += [(u, t0), (u, t0 + pd.Timedelta(days=2))]
    # 2 users churn at duration 5
    for u in range(5, 7):
        rows += [(u, t0), (u, t0 + pd.Timedelta(days=5))]
    # 1 user censored: active through day 19 (within 3 of gmax)
    rows += [(7, t0), (7, t0 + pd.Timedelta(days=19))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = survival_curve(
        ray.data.from_pandas(df).repartition(4), key="user_id", ts="ts",
        censor_gap_days=3).set_index("duration_days")
    # KM by hand: n=8 subjects. d=2: r=8, e=4 -> S = 1e6*4//8 = 500000
    assert out.loc[2, "n_at_risk"] == 8 and out.loc[2, "n_churned"] == 4
    assert out.loc[2, "survival_ppm"] == 500_000
    # d=5: r=4, e=2 -> S = 500000*2//4 = 250000
    assert out.loc[5, "n_at_risk"] == 4
    assert out.loc[5, "survival_ppm"] == 250_000
    # censored durations (19, 20) emit no churn rows
    assert 19 not in out.index and 20 not in out.index


def test_activity_streaks_islands_and_tiebreak():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.temporal import activity_streaks

    day = 86_400_000_000
    rows = []
    # user 1: days 1,2,3, 10,11  -> longest 3 starting day 1, 2 streaks
    for d in [1, 2, 3, 10, 11]:
        rows.append((1, d * day + 5))
    # user 2: days 5,6, 20,21    -> tie (2,2) -> earliest start day 5
    for d in [5, 6, 20, 21]:
        rows.append((2, d * day))
    # user 3: single day, two events same day -> streak 1, 1 active day
    rows += [(3, 7 * day), (3, 7 * day + 999)]
    df = pd.DataFrame(rows, columns=["user_id", "us"])
    df["ts"] = df["us"].astype("datetime64[us]")
    ds = ray.data.from_pandas(df[["user_id", "ts"]])

    out = (activity_streaks(ds, key="user_id", ts="ts")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["n_active_days"].tolist() == [5, 4, 1]
    assert out["n_streaks"].tolist() == [2, 2, 1]
    assert out["longest_streak"].tolist() == [3, 2, 1]
    assert out["streak_start"].astype("int64").tolist() == [
        1 * day, 5 * day, 7 * day]
    assert str(out["streak_start"].dtype) == "datetime64[us]"


def test_burst_detection_kleinberg_fixture():
    from htrc_feature_reader_ray.stages.temporal import burst_detection

    t0 = pd.Timestamp("2024-03-01")
    rows = []
    # user 1: hourly x 10, then a burst of 12 events 1s apart, then
    # hourly x 10 — expect exactly one burst run over the 1s gaps
    cur = t0
    for _ in range(10):
        rows.append((1, cur)); cur += pd.Timedelta(hours=1)
    for _ in range(12):
        rows.append((1, cur)); cur += pd.Timedelta(seconds=1)
    for _ in range(10):
        rows.append((1, cur)); cur += pd.Timedelta(hours=1)
    # user 2: metronomic hourly x 20 -> no bursts
    for i in range(20):
        rows.append((2, t0 + pd.Timedelta(hours=i)))
    # user 3: single event -> excluded
    rows.append((3, t0))
    # user 4: all simultaneous (T=0) -> zero bursts by contract
    rows += [(4, t0)] * 5
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = burst_detection(
        ray.data.from_pandas(df).repartition(7), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert 3 not in out.index
    assert out.loc[1, "n_bursts"] == 1
    # entry inertia: the transition cost Γ = γ·ln n must be amortized
    # before d crosses 0, so the first few 1s gaps are NOT labeled —
    # the burst run is a strict suffix of the 11-gap 1s stretch
    assert 6 <= out.loc[1, "max_burst_gaps"] <= 11
    assert out.loc[1, "max_burst_gaps"] == out.loc[1, "n_burst_gaps"]
    assert out.loc[1, "n_gaps"] == 31
    assert out.loc[2, "n_bursts"] == 0
    assert out.loc[2, "burst_share_ppm"] == 0
    assert out.loc[4, "n_bursts"] == 0 and out.loc[4, "n_gaps"] == 4


def test_burst_detection_scalar_replay():
    """Engine output == a pure-Python replay of the documented
    convention (clamp recursion, multiply-through-by-T, floor-log2
    transition cost) on an adversarial mixed-gap sequence."""
    from htrc_feature_reader_ray.stages.temporal import burst_detection

    gaps_s = ([3600] * 3 + [1] * 10 + [3600] * 3 + [2, 1, 1, 2, 1, 1,
               1, 2, 1, 1] + [3600, 60, 7200])
    t0 = pd.Timestamp("2024-04-01")
    ts = [t0]
    for g in gaps_s:
        ts.append(ts[-1] + pd.Timedelta(seconds=g))
    df = pd.DataFrame({"user_id": [7] * len(ts), "ts": ts})
    out = burst_detection(
        ray.data.from_pandas(df).repartition(3), key="user_id", ts="ts"
    ).to_pandas().iloc[0]

    gaps = [g * 1_000_000 for g in gaps_s]
    n, T = len(gaps), sum(gaps)
    gam = (1000 * (n.bit_length() - 1) * 693_147 // 1000) * T
    d, state = gam, []
    for x in gaps:
        d = min(max(d, 0), gam) + (n * x * 1_000_000 - 693_147 * T)
        state.append(d < 0)
    n_burst = sum(state)
    runs, prev = 0, False
    longest = cur = 0
    for s in state:
        if s and not prev:
            runs += 1
        cur = cur + 1 if s else 0
        longest = max(longest, cur)
        prev = s
    assert out["n_gaps"] == n
    assert out["n_burst_gaps"] == n_burst
    assert out["n_bursts"] == runs
    assert out["max_burst_gaps"] == longest
    assert out["burst_share_ppm"] == n_burst * 1_000_000 // n
    assert runs >= 2  # the fixture genuinely has multiple bursts


def test_transition_entropy_exact_bits():
    from htrc_feature_reader_ray.stages.temporal import transition_entropy

    t0 = pd.Timestamp("2024-05-01")
    rows = []
    # user 1: strict a-b alternation -> H(next|cur) = 0 exactly
    for i, s in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((1, t0 + pd.Timedelta(seconds=i), s, i))
    # user 2: [a,a,b] -> from 'a': {a:1, b:1} -> exactly 1 bit
    #   h2 = 1*(ilog2(4)-ilog2(1)) + 1*(ilog2(4)-ilog2(1)) = 4; n=2
    #   h_millibits = 4*1000 // 4 = 1000
    for i, s in enumerate(["a", "a", "b"]):
        rows.append((2, t0 + pd.Timedelta(seconds=i), s, 10 + i))
    # user 3: single event -> excluded
    rows.append((3, t0, "a", 20))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type",
                                     "event_id"])
    out = transition_entropy(
        ray.data.from_pandas(df).repartition(4), key="user_id", ts="ts",
        state_col="event_type", tiebreak="event_id",
    ).to_pandas().set_index("user_id")
    assert 3 not in out.index
    assert out.loc[1, "h_millibits"] == 0
    assert out.loc[1, "n_trans"] == 4 and out.loc[1, "n_states"] == 2
    assert out.loc[2, "h_millibits"] == 1000
    assert out.loc[2, "n_trans"] == 2 and out.loc[2, "n_states"] == 1


def test_transition_entropy_tiebreak_pins_sequence():
    from htrc_feature_reader_ray.stages.temporal import transition_entropy

    t0 = pd.Timestamp("2024-05-02")
    # three events at the SAME ts: order comes from event_id, giving the
    # sequence a,b,c (ids 1,2,3) -> transitions ab, bc -> each cur state
    # has a single deterministic successor -> H = 0
    df = pd.DataFrame({
        "user_id": [7, 7, 7],
        "ts": [t0, t0, t0],
        "event_type": ["b", "a", "c"],
        "event_id": [2, 1, 3],
    })
    out = transition_entropy(
        ray.data.from_pandas(df), key="user_id", ts="ts",
        state_col="event_type", tiebreak="event_id",
    ).to_pandas().iloc[0]
    assert out["n_trans"] == 2 and out["h_millibits"] == 0


def test_logrank_scalar_replay_and_contracts():
    """Engine == a pure-Python replay of the documented nano-floor
    convention on a fixture with churn, censoring, and both arms; an
    all-censored input reports 0 by contract."""
    import hashlib

    from htrc_feature_reader_ray.stages.temporal import logrank_test

    t0 = pd.Timestamp("2024-06-01")

    def arm_of(uid):
        h = int.from_bytes(
            hashlib.md5(str(uid).encode()).digest()[:8], "little")
        return h % 2

    # users 1..12: user u active day 0 .. day L(u); corpus max day set
    # by user 99 active through day 20 (so earlier-ending users churn)
    rows = []
    lifetimes = {1: 2, 2: 5, 3: 8, 4: 11, 5: 2, 6: 5, 7: 8, 8: 14,
                 9: 3, 10: 6, 11: 9, 12: 12}
    for u, L in lifetimes.items():
        rows.append((u, t0))
        rows.append((u, t0 + pd.Timedelta(days=L)))
    rows += [(99, t0), (99, t0 + pd.Timedelta(days=20))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = logrank_test(
        ray.data.from_pandas(df).repartition(5),
        key="user_id", ts="ts", censor_gap_days=3,
    ).iloc[0]

    # scalar replay of the documented convention
    subs = [(arm_of(u), L, (20 - L) < 3) for u, L in lifetimes.items()]
    subs.append((arm_of(99), 20, True))
    durs = sorted({d for _, d, _ in subs})
    u_acc = v_acc = 0
    for d in durs:
        r = sum(1 for _, dd, _ in subs if dd >= d)
        r1 = sum(1 for a, dd, _ in subs if dd >= d and a == 0)
        e = sum(1 for _, dd, c in subs if dd == d and not c)
        e1 = sum(1 for a, dd, c in subs if dd == d and not c and a == 0)
        if e and r:
            u_acc += e1 * 10**9 - (e * r1 * 10**9 // r)
            if r >= 2:
                v_acc += (e * r1 * (r - r1) * (r - e) * 10**9
                          // (r * r * (r - 1)))
    expect = (u_acc * u_acc * 10**6 // (v_acc * 10**9)
              if v_acc else 0)
    assert out["chi2_ppm"] == expect
    assert out["n_a"] + out["n_b"] == 13
    assert out["churn_a"] + out["churn_b"] == sum(
        1 for _, _, c in subs if not c)
    assert out["churn_a"] + out["churn_b"] > 0  # fixture genuinely churns

    # all users active to the window edge -> all censored -> 0
    df2 = pd.DataFrame([(u, t0 + pd.Timedelta(days=k))
                        for u in (1, 2, 3) for k in (0, 10)],
                       columns=["user_id", "ts"])
    out2 = logrank_test(ray.data.from_pandas(df2), key="user_id",
                        ts="ts").iloc[0]
    assert out2["chi2_ppm"] == 0
    assert out2["churn_a"] + out2["churn_b"] == 0


def test_transition_entropy_marginal_square_no_int64_wrap():
    """Pin the overflow-proof ilog2(c²) path: a synthetic count table
    whose marginal square would wrap int64 must still produce the
    exact bit_length-based term (unit-level check of the kernel used
    by transition_entropy)."""
    big = 4_000_000_000  # big² = 1.6e19 > int64 max 9.22e18
    cv = np.array([1, big], dtype=np.int64)
    cxv = np.array([big, big], dtype=np.int64)
    got = np.fromiter(
        (((int(a) * int(a)).bit_length() - 1)
         - ((int(b) * int(b)).bit_length() - 1)
         for a, b in zip(cxv, cv)),
        dtype=np.int64, count=len(cv))
    import math
    want = [math.floor(math.log2(big * big)) - 0, 0]
    assert list(got) == want
    # and the wrapped int64 square really is wrong (guards the reason)
    wrapped = (cxv * cxv)[0]
    assert int(wrapped) != big * big


def test_holt_forecast_replay_and_gaps():
    from htrc_feature_reader_ray.stages.temporal import holt_forecast

    day = 86_400_000_000
    # user 1: rising 5 days; user 2: burst then silence (gap days are
    # zeros on the grid); user 3: single day (trend 0 by contract)
    rows = []
    for d, c in enumerate([1, 2, 3, 4, 5]):
        rows += [(1, d, k) for k in range(c)]
    for d, c in [(0, 6), (1, 4), (4, 1)]:   # days 2,3 silent
        rows += [(2, d, k) for k in range(c)]
    rows += [(3, 2, 0)]
    df = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([(r[1] * day + r[2]) for r in rows],
                             unit="us"),
    })
    out = (holt_forecast(ray.data.from_pandas(df).repartition(3),
                         key="user_id", ts="ts", horizon=7)
           .to_pandas().set_index("user_id").sort_index())

    def replay(xs, h=7):
        S = 4096
        lv = S * xs[0]
        b = S * (xs[1] - xs[0]) if len(xs) > 1 else 0
        for x in xs[1:]:
            lnew = (S * x + lv + b) >> 1
            b = (lnew - lv + 3 * b) >> 2
            lv = lnew
        return lv, b, lv + h * b

    for uid, xs in ((1, [1, 2, 3, 4, 5]), (2, [6, 4, 0, 0, 1]),
                    (3, [1])):
        lv, b, f = replay(xs)
        assert int(out.loc[uid, "level_x4096"]) == lv
        assert int(out.loc[uid, "trend_x4096"]) == b
        assert int(out.loc[uid, "forecast_x4096"]) == f
        assert int(out.loc[uid, "n_days"]) == len(xs)

    # rising series forecasts above its level; the burst-then-silent
    # series carries a NEGATIVE trend (floors on negatives exercised)
    assert int(out.loc[1, "forecast_x4096"]) > int(out.loc[1, "level_x4096"])
    assert int(out.loc[2, "trend_x4096"]) < 0
    assert int(out.loc[3, "trend_x4096"]) == 0


def test_dominant_period_cadences_and_replay():
    from htrc_feature_reader_ray.stages.temporal import dominant_period

    day = 86_400_000_000
    rows = []
    # user 1: perfect 3-day cron over 30 days -> fundamental lag 3 wins
    # the tie against its multiples (6, 9, 12) by strict-first
    for d in range(0, 31, 3):
        rows.append((1, d))
    # user 2: weekly cadence, two events each hit day
    for d in range(0, 29, 7):
        rows += [(2, d), (2, d)]
    # user 3: every day exactly once -> zero variance -> (0, 0)
    for d in range(10):
        rows.append((3, d))
    # user 4: two days only -> no valid lag in [2, 14] -> (0, 0)
    rows += [(4, 0), (4, 1)]
    df = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] * day for r in rows], unit="us"),
    })
    out = (dominant_period(ray.data.from_pandas(df).repartition(3),
                           key="user_id", ts="ts")
           .to_pandas().set_index("user_id").sort_index())

    assert int(out.loc[1, "best_lag"]) == 3
    assert int(out.loc[2, "best_lag"]) == 7
    assert int(out.loc[3, "best_lag"]) == 0
    assert int(out.loc[3, "autocorr_ppm"]) == 0
    assert int(out.loc[4, "best_lag"]) == 0

    # exact replay of r_L for user 1 from the zero-filled grid
    grid = np.zeros(31, dtype=np.int64)
    grid[::3] = 1
    n, S = 31, int(grid.sum())
    sq = int((grid ** 2).sum())
    den = n * n * sq - n * S * S

    def r(lag):
        p = int((grid[:-lag] * grid[lag:]).sum())
        head = int(grid[:lag].sum())
        tail = int(grid[-lag:].sum())
        num = (n * n * p - n * S * (2 * S - head - tail)
               + (n - lag) * S * S) * 10**6
        return -((-num) // den) if num < 0 else num // den

    best = max(range(2, 15), key=lambda L: (r(L), -L))
    assert best == 3
    assert int(out.loc[1, "autocorr_ppm"]) == r(3)
    # the fundamental beats its multiples on a finite grid (fewer
    # overlapping pairs at 2L) and its off-phase neighbors
    assert r(3) > r(6) > r(9)
    assert r(3) > r(2) and r(3) > r(4)


def test_asof_staleness_buckets_exact():
    from htrc_feature_reader_ray.stages.temporal import asof_staleness

    base = 1_700_000_000_000_000  # epoch us
    rows = [
        (base, base),                      # 0 s        -> bucket 0
        (base + 1_500_000, base),          # 1 s (floor) -> bitlen(1)=1
        (base + 3_000_000, base),          # 3 s        -> bitlen(3)=2
        (base + 1024 * 1_000_000, base),   # 1024 s     -> bitlen=11
        (base, None),                      # unmatched  -> -1
        (base + 999_999, base),            # sub-second floor -> 0
    ]
    df = pd.DataFrame({
        "ts": pd.to_datetime([r[0] for r in rows], unit="us"),
        "matched_ts": pd.to_datetime(
            [r[1] for r in rows], unit="us", errors="coerce"),
    })
    out = (asof_staleness(ray.data.from_pandas(df).repartition(2))
           .to_pandas().set_index("staleness_bucket")["n_events"]
           .sort_index())
    assert out.to_dict() == {-1: 1, 0: 2, 1: 1, 2: 1, 11: 1}


def test_return_label_censoring_and_gaps():
    from htrc_feature_reader_ray.stages.temporal import return_label

    day = 86_400_000_000
    # corpus horizon = day 20 (user 9's last activity)
    rows = [(1, 0), (1, 3), (1, 15),          # gaps 3 (label), 12 (no)
            (2, 18),                            # near-horizon, no return
            (9, 5), (9, 20)]                    # sets max day; gap 15
    df = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] * day for r in rows], unit="us"),
    })
    out = (return_label(ray.data.from_pandas(df).repartition(3),
                        key="user_id", ts="ts", horizon_days=7)
           .to_pandas().set_index(["user_id", "day"]).sort_index())

    # user 1 day 0: returns on day 3 -> label 1, not censored
    assert out.loc[(1, 0)].tolist() == [3, 1, 0]
    # user 1 day 3: next is day 15, gap 12 > 7 — and the full window
    # WAS observed (3+7 <= 20) -> honest negative, not censored
    assert out.loc[(1, 3)].tolist() == [12, 0, 0]
    # user 1 day 15: no return, window 15+7 > 20 -> CENSORED
    assert out.loc[(1, 15)].tolist() == [0, 0, 1]
    # user 2 day 18: same
    assert out.loc[(2, 18)].tolist() == [0, 0, 1]
    # user 9 day 5: gap 15 > 7, window fully observed -> negative
    assert out.loc[(9, 5)].tolist() == [15, 0, 0]
    # user 9 day 20: the horizon itself -> censored
    assert out.loc[(9, 20)].tolist() == [0, 0, 1]


def test_gap_entropy_cron_bot_human():
    from htrc_feature_reader_ray.stages.temporal import gap_entropy

    S = 1_000_000  # one second in us
    rows = []
    # user 1: perfect 60-second cron (every gap in one bucket) -> 0
    rows += [(1, i * 60 * S) for i in range(11)]
    # user 2: alternating 60s / 3600s timers, 5 gaps each ->
    # exactly 1 bit/gap = 2 half-bits * 10 gaps = 20
    t = 0
    for i in range(10):
        t += 60 * S if i % 2 == 0 else 3600 * S
        rows.append((2, t))
    rows.append((2, 0))
    # user 3: single event -> (0, 0, 0) by contract
    rows.append((3, 5 * S))
    df = pd.DataFrame({
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
    })
    out = (gap_entropy(ray.data.from_pandas(df).repartition(3),
                       key="user_id", ts="ts")
           .to_pandas().set_index("user_id").sort_index())

    assert out.loc[1].tolist() == [10, 1, 0]
    # 2 buckets, 5 gaps each, n=10: per gap bitlen(100)-bitlen(25)=2
    assert out.loc[2].tolist() == [10, 2, 20]
    assert out.loc[3].tolist() == [0, 0, 0]
