"""Split-merge sessionization over sorted blocks must equal the bucketed
sessionizer — including when one hot key spans many blocks."""

import numpy as np
import pandas as pd
import ray.data

from htrc_feature_reader_ray.stages.temporal import sessionize, sessionize_sorted

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _compare(ds, *, gap, tiebreak):
    a = (
        sessionize(ds, key="user_id", ts="ts", gap=gap, tiebreak=tiebreak,
                   num_buckets=8, aggregate=False)
        .to_pandas()
        .sort_values(["user_id", "ts"] + ([tiebreak] if tiebreak else []))
        .reset_index(drop=True)
    )
    b = (
        sessionize_sorted(ds, key="user_id", ts="ts", gap=gap,
                          tiebreak=tiebreak)
        .to_pandas()
        .sort_values(["user_id", "ts"] + ([tiebreak] if tiebreak else []))
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    assert a["session_id"].tolist() == b["session_id"].tolist()


def test_sorted_equals_bucketed_on_events():
    ds = ray.data.read_parquet(EVENTS, columns=["event_id", "user_id", "ts"])
    _compare(ds, gap="30m", tiebreak="event_id")


def test_lag_lead_sorted_equals_bucketed():
    from htrc_feature_reader_ray.stages.temporal import lag_lead, lag_lead_sorted

    rng = np.random.RandomState(9)
    n = 3000
    user = np.where(rng.rand(n) < 0.7, 3, rng.randint(0, 10, n))
    ts = pd.to_datetime(
        np.sort(rng.randint(0, 10**6, n)), unit="s"
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {"event_id": np.arange(n), "user_id": user, "ts": ts,
         "value": rng.standard_normal(n)}
    )
    ds = ray.data.from_pandas(df).repartition(25)
    key_cols = ["user_id", "ts", "event_id"]
    a = (
        lag_lead(ds, key="user_id", ts="ts", cols=["value"],
                 tiebreak="event_id", num_buckets=8)
        .to_pandas().sort_values(key_cols).reset_index(drop=True)
    )
    b = (
        lag_lead_sorted(ds, key="user_id", ts="ts", cols=["value"],
                        tiebreak="event_id")
        .to_pandas().sort_values(key_cols).reset_index(drop=True)
    )
    for c in ("lag_value", "lead_value"):
        assert np.allclose(a[c].fillna(-9e9), b[c].fillna(-9e9))


def test_sorted_handles_hot_key_spanning_blocks():
    rng = np.random.RandomState(3)
    n = 5000
    # one user owns 80% of events; many tiny blocks force the hot key to
    # span block boundaries repeatedly
    user = np.where(rng.rand(n) < 0.8, 7, rng.randint(0, 20, n))
    ts = pd.to_datetime(
        np.sort(rng.randint(0, 10**6, n)), unit="s"
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {"event_id": np.arange(n), "user_id": user, "ts": ts}
    )
    ds = ray.data.from_pandas(df).repartition(40)
    _compare(ds, gap="5m", tiebreak="event_id")


def test_lag_lead_sorted_n_greater_than_one():
    """n=3 over many tiny blocks with a dominant key: sorted split-merge must
    equal the bucketed shift even when the lag window spans several blocks."""
    from htrc_feature_reader_ray.stages.temporal import lag_lead, lag_lead_sorted

    rng = np.random.RandomState(17)
    n = 2000
    user = np.where(rng.rand(n) < 0.6, 5, rng.randint(0, 8, n))
    ts = pd.to_datetime(
        np.sort(rng.randint(0, 10**6, n)), unit="s"
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {"event_id": np.arange(n), "user_id": user, "ts": ts,
         "value": rng.standard_normal(n)}
    )
    # 100 blocks of ~20 rows: with n=3 a lag window regularly crosses 1-2
    # block boundaries
    ds = ray.data.from_pandas(df).repartition(100)
    key_cols = ["user_id", "ts", "event_id"]
    a = (
        lag_lead(ds, key="user_id", ts="ts", cols=["value"], n=3,
                 tiebreak="event_id", num_buckets=8)
        .to_pandas().sort_values(key_cols).reset_index(drop=True)
    )
    b = (
        lag_lead_sorted(ds, key="user_id", ts="ts", cols=["value"], n=3,
                        tiebreak="event_id")
        .to_pandas().sort_values(key_cols).reset_index(drop=True)
    )
    for c in ("lag_value", "lead_value"):
        assert np.allclose(a[c].fillna(-9e9), b[c].fillna(-9e9)), c
