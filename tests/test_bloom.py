"""Bloom-prefiltered semi/anti join: exact equality with the plain
bucketed join, plus filter-level guarantees."""

import numpy as np
import pandas as pd
import ray.data

from htrc_feature_reader_ray.stages.partition import (
    BloomFilter,
    bloom_join,
    bucket_join,
)


def test_bloom_filter_no_false_negatives_and_low_fp():
    rng = np.random.RandomState(3)
    members = [f"key-{i}" for i in range(5000)]
    others = [f"other-{i}" for i in range(20000)]
    bf = BloomFilter(capacity=5000, fp_rate=0.01)
    bf.add_batch(np.asarray(members, dtype=object))
    assert bf.contains_batch(np.asarray(members, dtype=object)).all()
    fp = bf.contains_batch(np.asarray(others, dtype=object)).mean()
    assert fp < 0.03  # ~1% target, 3x headroom
    _ = rng


def _sides(n_left=3000, n_right=400):
    rng = np.random.RandomState(17)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 2000, n_left).astype(np.int64),
            "lid": np.arange(n_left, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {"rk": rng.randint(0, 2000, n_right).astype(np.int64)}
    )
    return left, right


def test_bloom_join_equals_bucket_join_semi_and_anti():
    left, right = _sides()
    for how in ("semi", "anti"):
        a = (
            bloom_join(
                ray.data.from_pandas(left).repartition(7),
                ray.data.from_pandas(right), left_key="k", right_key="rk",
                how=how, right_capacity=len(right), num_buckets=5,
            )
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        b = (
            bucket_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right[["rk"]]), left_key="k",
                right_key="rk", how=how, num_buckets=5,
            )
            .to_pandas().sort_values("lid").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[["k", "lid"]], b[["k", "lid"]])


def test_bloom_join_anti_disjoint_right_is_shuffle_free_passthrough():
    # when no left key is in the right side, anti keeps everything
    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(1000, 1050, dtype=np.int64)})
    out = bloom_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        left_key="k", right_key="rk", how="anti", right_capacity=50,
    ).to_pandas()
    assert sorted(out.k) == list(range(100))
