"""Streaming MinHash-LSH band index (state/dedup_index.py): two-batch
stream equals the batch candidate result on the union; restore-then-add
equals straight-through; exactly-once pair emission."""

import numpy as np
import pandas as pd
import pytest
import ray

from htrc_feature_reader_ray.state.dedup_index import (
    create_lsh_index,
    incremental_minhash_pairs,
    lsh_index_size,
)

PARAMS = dict(k_shingle=2, num_perm=16, bands=8)


def _docs(ids_texts):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [i for i, _ in ids_texts],
         "text": [t for _, t in ids_texts]}))


def _corpus():
    rng = np.random.RandomState(5)
    base = ["the quick brown fox jumps over the lazy dog again and again",
            "colorless green ideas sleep furiously in the corpus tonight",
            "pack my box with five dozen liquor jugs for the road trip"]
    rows = []
    for i in range(30):
        words = base[i % 3].split()
        if i % 5 == 0 and i > 0:
            # a near dup: perturb one word of an earlier doc
            j = rng.randint(len(words))
            words = words[:j] + ["zzz"] + words[j + 1:]
        rng.shuffle(words) if i % 7 == 6 else None
        rows.append((i, " ".join(words)))
    return rows


def _pairs_df(res):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64"),
                             "n_bands": pd.Series(dtype="int64")})
    return (df.astype({"doc_a": "int64", "doc_b": "int64",
                       "n_bands": "int64"})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def _batch_candidates(rows):
    from htrc_feature_reader_ray.stages.dedup import minhash_candidate_pairs

    return _pairs_df(minhash_candidate_pairs(
        _docs(rows), concurrency=2, **PARAMS))


def test_two_batch_stream_equals_batch_union():
    rows = _corpus()
    half1, half2 = rows[:17], rows[17:]

    idx = create_lsh_index(num_shards=4)
    p1 = _pairs_df(incremental_minhash_pairs(
        _docs(half1), idx, concurrency=2, **PARAMS))
    p2 = _pairs_df(incremental_minhash_pairs(
        _docs(half2), idx, concurrency=2, **PARAMS))

    # each pair reported once, on the stream batch that completed it
    seen = set(map(tuple, p1[["doc_a", "doc_b"]].values))
    seen2 = set(map(tuple, p2[["doc_a", "doc_b"]].values))
    assert not (seen & seen2)

    union = _pairs_df(pd.concat([p1, p2], ignore_index=True))
    want = _batch_candidates(rows)
    assert len(want) > 0  # the fixture must actually produce collisions
    pd.testing.assert_frame_equal(union, want)


def test_restore_then_add_equals_straight_through():
    rows = _corpus()
    half1, half2 = rows[:17], rows[17:]

    # straight-through reference
    idx_ref = create_lsh_index(num_shards=4)
    _pairs_df(incremental_minhash_pairs(
        _docs(half1), idx_ref, concurrency=2, **PARAMS))
    ref_p2 = _pairs_df(incremental_minhash_pairs(
        _docs(half2), idx_ref, concurrency=2, **PARAMS))

    # snapshot after half1, restore into FRESH shards, then add half2
    idx_a = create_lsh_index(num_shards=4)
    _pairs_df(incremental_minhash_pairs(
        _docs(half1), idx_a, concurrency=2, **PARAMS))
    snaps = ray.get([s.snapshot.remote() for s in idx_a])

    idx_b = create_lsh_index(num_shards=4)
    ray.get([s.restore.remote(sn) for s, sn in zip(idx_b, snaps)])
    assert lsh_index_size(idx_b) == lsh_index_size(idx_a)
    got_p2 = _pairs_df(incremental_minhash_pairs(
        _docs(half2), idx_b, concurrency=2, **PARAMS))
    pd.testing.assert_frame_equal(got_p2, ref_p2)

    # final index states agree bucket-for-bucket (as member SETS)
    def bucket_map(index):
        out = {}
        for sn in ray.get([s.snapshot.remote() for s in index]):
            for b, h, members in sn:
                out[(b, h)] = frozenset(members)
        return out

    assert bucket_map(idx_b) == bucket_map(idx_ref)


def test_readd_same_doc_is_noop():
    rows = _corpus()[:10]
    idx = create_lsh_index(num_shards=2)
    _pairs_df(incremental_minhash_pairs(_docs(rows), idx, **PARAMS))
    size1 = lsh_index_size(idx)
    again = _pairs_df(incremental_minhash_pairs(_docs(rows), idx, **PARAMS))
    assert again.empty  # no self-pairs, no re-emission
    assert lsh_index_size(idx) == size1


def test_empty_stream_and_no_collisions():
    idx = create_lsh_index(num_shards=2)
    out = _pairs_df(incremental_minhash_pairs(
        _docs([(1, "utterly unique words here"),
               (2, "completely different vocabulary there")]),
        idx, **PARAMS))
    # disjoint shingle sets: collisions possible only by band-hash luck
    want = _batch_candidates([(1, "utterly unique words here"),
                              (2, "completely different vocabulary there")])
    pd.testing.assert_frame_equal(out, want)
