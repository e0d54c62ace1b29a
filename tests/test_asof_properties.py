"""Property tests for the as-of join against a brute-force per-row oracle
(FIXTURES.md F8): random interleaved timestamps, duplicates at equal
timestamps, out-of-tolerance gaps — plus the zero-leakage invariant."""

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from htrc_feature_reader_ray.stages.temporal import (
    audit_no_leakage,
    broadcast_asof_join,
    latest_per_key_ts,
    partitioned_asof_join,
)

BASE = pd.Timestamp("2024-01-01")


def brute_force(left: pd.DataFrame, right: pd.DataFrame, *, direction,
                tolerance) -> pd.DataFrame:
    tol = pd.Timedelta(tolerance) if tolerance else None
    vals, m_ts = [], []
    for _, row in left.iterrows():
        cand = right[right["k"] == row["k"]]
        if direction == "backward":
            cand = cand[cand["ts"] <= row["ts"]]
            cand = cand.sort_values("ts").tail(1)
        elif direction == "nearest":
            if len(cand):
                order = pd.DataFrame(
                    {
                        "diff": (cand["ts"] - row["ts"]).abs(),
                        # equidistant ties prefer the backward candidate
                        "fwd": cand["ts"] > row["ts"],
                    },
                    index=cand.index,
                ).sort_values(["diff", "fwd"])
                cand = cand.loc[[order.index[0]]]
        else:
            cand = cand[cand["ts"] >= row["ts"]]
            cand = cand.sort_values("ts").head(1)
        if len(cand) and (
            tol is None or abs(cand.iloc[0]["ts"] - row["ts"]) <= tol
        ):
            vals.append(cand.iloc[0]["v"])
            m_ts.append(cand.iloc[0]["ts"])
        else:
            vals.append(np.nan)
            m_ts.append(pd.NaT)
    out = left.copy()
    out["v"] = vals
    out["matched_ts"] = m_ts
    return out


ts_strategy = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=40
)


@settings(max_examples=15, deadline=None)
@given(
    left_ts=ts_strategy,
    right_ts=ts_strategy,
    keys=st.lists(st.integers(0, 3), min_size=1, max_size=40),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol_minutes=st.sampled_from([None, 30, 120]),
)
def test_asof_matches_bruteforce(left_ts, right_ts, keys, direction,
                                 tol_minutes):
    left = pd.DataFrame(
        {
            "lid": np.arange(len(left_ts)),
            "k": [keys[i % len(keys)] for i in range(len(left_ts))],
            "ts": [BASE + pd.Timedelta(minutes=m) for m in left_ts],
        }
    )
    left["ts"] = left["ts"].astype("datetime64[us]")
    right = pd.DataFrame(
        {
            "rid": np.arange(len(right_ts)),
            "k": [keys[(i * 7) % len(keys)] for i in range(len(right_ts))],
            "ts": [BASE + pd.Timedelta(minutes=m) for m in right_ts],
        }
    )
    right["ts"] = right["ts"].astype("datetime64[us]")
    right["v"] = right["rid"] * 1.5
    right = latest_per_key_ts(right, on="k", ts="ts", tiebreak="rid")[
        ["k", "ts", "v"]
    ]

    tolerance = f"{tol_minutes}m" if tol_minutes else None
    got = (
        broadcast_asof_join(
            ray.data.from_pandas(left), right, on="k", ts="ts",
            direction=direction, tolerance=tolerance,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expect = brute_force(left, right, direction=direction,
                         tolerance=tolerance).sort_values("lid").reset_index(
        drop=True
    )
    assert got["v"].equals(expect["v"]) or np.allclose(
        got["v"].fillna(-1), expect["v"].fillna(-1)
    )
    g_ts = pd.to_datetime(got["matched_ts"]).astype("datetime64[ns]")
    e_ts = pd.to_datetime(expect["matched_ts"]).astype("datetime64[ns]")
    assert g_ts.equals(e_ts)
    if direction != "nearest":  # nearest reads both sides by design
        audit_no_leakage(got, ts="ts", direction=direction)


def test_partitioned_equals_broadcast_random():
    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "lid": np.arange(500),
            "k": rng.randint(0, 20, 500),
            "ts": pd.to_datetime(
                rng.randint(0, 10**6, 500), unit="s"
            ).astype("datetime64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(300),
            "k": rng.randint(0, 20, 300),
            "ts": pd.to_datetime(
                rng.randint(0, 10**6, 300), unit="s"
            ).astype("datetime64[us]"),
            "v": rng.standard_normal(300),
        }
    )
    right = latest_per_key_ts(right, on="k", ts="ts", tiebreak="rid")[
        ["k", "ts", "v"]
    ]
    a = (
        broadcast_asof_join(ray.data.from_pandas(left), right, on="k",
                            ts="ts", direction="backward", tolerance="1D")
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    b = (
        partitioned_asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", ts="ts", direction="backward", tolerance="1D",
            num_buckets=7,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert np.allclose(a["v"].fillna(-9), b["v"].fillna(-9))
    assert a["matched_ts"].equals(b["matched_ts"])


def test_asof_composite_keys():
    """Composite (user_id, event_type) as-of keys on both physical paths."""
    import numpy as np
    import pandas as pd
    import ray.data
    from htrc_feature_reader_ray.stages.temporal import (
        broadcast_asof_join,
        partitioned_asof_join,
    )

    rng = np.random.RandomState(21)
    n = 600
    left = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 5, n).astype(np.int64),
            "kind": rng.choice(["a", "b"], n),
            "ts": pd.to_datetime(
                np.sort(rng.randint(0, 10**6, n)), unit="s"
            ).astype("datetime64[us]"),
        }
    )
    right = (
        left.sample(frac=0.3, random_state=3)[["user_id", "kind", "ts"]]
        .drop_duplicates(["user_id", "kind", "ts"])
        .assign(feat=lambda d: np.arange(len(d), dtype=np.int64))
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").assign(matched_ts=lambda d: d["ts"]),
        on="ts", by=["user_id", "kind"], direction="backward",
    ).sort_values("event_id").reset_index(drop=True)

    b = (
        broadcast_asof_join(
            ray.data.from_pandas(left), right, on=["user_id", "kind"],
            ts="ts", direction="backward",
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    p = (
        partitioned_asof_join(
            ray.data.from_pandas(left).repartition(7),
            ray.data.from_pandas(right), on=["user_id", "kind"], ts="ts",
            direction="backward", num_buckets=4,
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    for got in (b, p):
        assert got["feat"].fillna(-1).tolist() == expect["feat"].fillna(-1).tolist()
