import pandas as pd

from htrc_feature_reader_ray.pipelines.flagship import (
    flagship,
    snapshot_features,
    windowed_features,
)


def test_snapshot_features_counts(sf_dir):
    out = snapshot_features(sf_dir, via_html=False).to_pandas()
    # 500 docs -> 1 + doc_id % 3 snapshots
    assert len(out) == sum(1 + d % 3 for d in range(500))
    assert (out["n_tokens"] > 0).all()
    assert (out["distinct_tokens"] <= out["n_tokens"]).all()


def test_windowed_features_no_leakage(sf_dir):
    snap = snapshot_features(sf_dir, via_html=False)
    out = windowed_features(snap, num_buckets=8).to_pandas()
    out = out.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    g = out.groupby("url")
    # lag equals previous row's value within each url: strictly earlier data
    expect_lag = g["n_tokens"].shift(1)
    assert out["lag_n_tokens"].equals(expect_lag)
    # sessions: snapshots at +0h,+1h,+4h with 90m gap -> 3-snap urls split 2/1
    three = out[g["warc_ts"].transform("count") == 3]
    if len(three):
        sess_counts = three.groupby("url")["session_id"].nunique()
        assert (sess_counts == 2).all()


def test_flagship_end_to_end(sf_dir):
    out = flagship(sf_dir, via_html=True, num_buckets=8).to_pandas()
    assert {"url", "warc_ts", "n_tokens", "distinct_tokens", "lag_n_tokens",
            "lead_n_tokens", "session_id", "src_avg_chars"} <= set(out.columns)
    assert out["src_avg_chars"].notna().all()
    assert len(out) == sum(1 + d % 3 for d in range(500))
