"""Tests: grouped_profile, mixture_sample, and the shared-mutable-index
incremental dedup (raw-actor stage)."""

import numpy as np
import pandas as pd
import ray
import ray.data

from htrc_feature_reader_ray.stages.profile import (
    grouped_profile,
    numeric_profile,
)
from htrc_feature_reader_ray.stages.sample import (
    mixture_sample,
    stratified_sample,
)
from htrc_feature_reader_ray.state.dedup_index import (
    create_dedup_index,
    incremental_dedup,
    index_size,
)


def test_grouped_profile_matches_pandas():
    rng = np.random.RandomState(4)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 5000),
            "v": rng.randint(0, 300, 5000).astype(np.int64),
        }
    )
    out = (
        grouped_profile(
            ray.data.from_pandas(df).repartition(9), group_cols=["g"],
            col="v", num_buckets=4,
        )
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        row = out.loc[g]
        assert row["n"] == len(v)
        assert row["min"] == v[0] and row["max"] == v[-1]
        assert row["sum"] == v.sum()
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            assert row[col] == v[max(1, int(np.ceil(q * len(v)))) - 1]


def test_grouped_profile_single_group_equals_global():
    rng = np.random.RandomState(8)
    df = pd.DataFrame({"g": "only", "v": rng.randint(0, 50, 1000)})
    g = grouped_profile(
        ray.data.from_pandas(df), group_cols=["g"], col="v"
    ).to_pandas()
    glob = numeric_profile(
        ray.data.from_pandas(df[["v"]]), "v"
    )
    for c in ("n", "min", "max", "sum", "p50", "p90", "p99"):
        assert g.iloc[0][c] == glob.iloc[0][c]


def test_mixture_sample_exact_quotas_and_determinism():
    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(900, dtype=np.int64),
            "lang": rng.choice(["en", "de", "zh"], 900),
        }
    )
    fr = {"en": 0.1, "de": 0.5}  # zh dropped
    outs = []
    for parts, buckets in ((1, 4), (13, 7)):
        outs.append(
            mixture_sample(
                ray.data.from_pandas(df).repartition(parts),
                stratum_col="lang", id_col="doc_id", fractions=fr,
                num_buckets=buckets,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])  # cluster-shape free
    got = outs[0]
    assert set(got.lang) <= {"en", "de"}
    sizes = df.groupby("lang").size()
    counts = got.groupby("lang").size()
    assert counts["en"] == -(-sizes["en"] // 10)  # ceil(0.1 n)
    assert counts["de"] == -(-sizes["de"] * 1 // 2)


def test_mixture_sample_uniform_fractions_equals_stratified():
    rng = np.random.RandomState(6)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "lang": rng.choice(["en", "de"], 400),
        }
    )
    a = (
        mixture_sample(
            ray.data.from_pandas(df), stratum_col="lang", id_col="doc_id",
            fractions={"en": 0.2, "de": 0.2},
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        stratified_sample(
            ray.data.from_pandas(df), stratum_col="lang", id_col="doc_id",
            fraction=0.2,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# incremental dedup (shared mutable index)


def _dup_docs(n_docs, n_distinct):
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": [f"text number {i % n_distinct}" for i in range(n_docs)],
        }
    )


def test_incremental_dedup_one_survivor_per_fingerprint():
    idx = create_dedup_index(num_shards=4)
    df = _dup_docs(2000, 150)
    kept = incremental_dedup(
        ray.data.from_pandas(df).repartition(16), idx
    ).to_pandas()
    assert len(kept) == 150
    assert kept["text"].nunique() == 150
    assert index_size(idx) == 150


def test_incremental_dedup_is_incremental_across_datasets():
    idx = create_dedup_index(num_shards=2)
    first = incremental_dedup(
        ray.data.from_pandas(_dup_docs(300, 50)), idx
    ).to_pandas()
    assert len(first) == 50
    # second corpus: 30 known fingerprints + 20 new ones
    df2 = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "text": [f"text number {i % 30}" for i in range(60)]
            + [f"fresh {i % 20}" for i in range(40)],
        }
    )
    second = incremental_dedup(ray.data.from_pandas(df2), idx).to_pandas()
    assert set(second["text"]) == {f"fresh {i}" for i in range(20)}
    assert index_size(idx) == 70


def test_incremental_dedup_normalizes_like_exact_dedup():
    idx = create_dedup_index(num_shards=2)
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["Hello   World", "hello world"],  # same normalized form
        }
    )
    kept = incremental_dedup(ray.data.from_pandas(df), idx).to_pandas()
    assert len(kept) == 1


def test_index_snapshot_restore_roundtrip():
    idx = create_dedup_index(num_shards=3)
    incremental_dedup(
        ray.data.from_pandas(_dup_docs(200, 40)), idx
    ).materialize()
    snaps = ray.get([s.snapshot.remote() for s in idx])
    fresh = create_dedup_index(num_shards=3)
    for shard, snap in zip(fresh, snaps):
        ray.get(shard.restore.remote(snap))
    out = incremental_dedup(
        ray.data.from_pandas(_dup_docs(200, 40)), fresh
    ).to_pandas()
    assert len(out) == 0  # restored index already knows every fingerprint


def test_write_training_shards_roundtrip(tmp_path):
    from htrc_feature_reader_ray.pipelines.export import write_training_shards

    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        "/root/testdata/sf0.001/documents.parquet", out, budget=2048,
        num_buckets=8,
    )
    assert manifest["row_count"] == 500
    assert manifest["partition_col"] == "shard_id"

    back = ray.data.read_parquet(out).to_pandas()
    # hive partition values come back as strings
    back["shard_id"] = back["shard_id"].astype(np.int64)
    assert len(back) == 500 and back["doc_id"].nunique() == 500
    assert set(back.columns) >= {"doc_id", "n_tokens", "global_offset",
                                 "shard_id", "offset_in_shard", "text"}
    # shard assignment is exactly the serial prefix-sum contract
    serial = back.sort_values("doc_id").reset_index(drop=True)
    expect_off = serial["n_tokens"].cumsum() - serial["n_tokens"]
    assert list(serial["global_offset"]) == list(expect_off)
    assert (serial["shard_id"] == serial["global_offset"] // 2048).all()
    # text round-trips: offset_in_shard within budget; dirs match shard ids
    assert (serial["offset_in_shard"] < 2048).all()
    import os

    dirs = {d for d in os.listdir(out) if d.startswith("shard_id=")}
    assert len(dirs) == len(manifest["buckets"])
    # manifest-match skip: rerun is a no-op with identical manifest
    again = write_training_shards(
        "/root/testdata/sf0.001/documents.parquet", out, budget=2048,
        num_buckets=8,
    )
    assert again["row_count"] == 500


def test_write_training_shards_manifest_skip_is_a_noop(tmp_path):
    from htrc_feature_reader_ray.pipelines.export import write_training_shards

    out = str(tmp_path / "shards2")
    m1 = write_training_shards(
        "/root/testdata/sf0.001/documents.parquet", out, budget=4096,
        num_buckets=4,
    )
    m2 = write_training_shards(
        "/root/testdata/sf0.001/documents.parquet", out, budget=4096,
        num_buckets=4,
    )
    assert m2["completed_at"] == m1["completed_at"]  # skipped, not rewritten
    # changed params -> recompute
    m3 = write_training_shards(
        "/root/testdata/sf0.001/documents.parquet", out, budget=1024,
        num_buckets=4,
    )
    assert m3["completed_at"] != m1["completed_at"]


def test_resume_missing_buckets_refuses_shard_lakes(tmp_path):
    import pytest
    from htrc_feature_reader_ray.pipelines.export import write_training_shards
    from htrc_feature_reader_ray.state.lineage import resume_missing_buckets

    out = str(tmp_path / "shards3")
    write_training_shards(
        "/root/testdata/sf0.001/documents.parquet", out, budget=4096,
        num_buckets=4,
    )
    with pytest.raises(ValueError, match="hash-bucket"):
        resume_missing_buckets(None, out, key="doc_id", num_buckets=4)
