import numpy as np
import pandas as pd
import ray.data

from htrc_feature_reader_ray.stages.dedup import (
    MinHasher,
    exact_dedup,
    jaccard,
    minhash_dedup_pairs,
    simhash,
    simhash_batch,
    word_shingles,
)
from tests.util import assert_frames_match

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_exact_dedup_parity(duck):
    got = exact_dedup(ray.data.read_parquet(DOCS, columns=["doc_id", "text"]))
    oracle = duck.execute(
        r"""
        SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS text_md5,
               min(doc_id) AS doc_id, count(*)::BIGINT AS n_dups
        FROM documents GROUP BY 1
        """
    ).df()
    assert_frames_match(got, oracle)


def test_jaccard_exact():
    a = "the quick brown fox jumps".split()
    b = "the quick brown fox leaps".split()
    sa, sb = set(word_shingles(a, 3)), set(word_shingles(b, 3))
    expect = len(sa & sb) / len(sa | sb)
    assert jaccard(a, b, 3) == expect
    assert jaccard(a, a, 3) == 1.0


def test_minhash_signature_similarity_tracks_jaccard():
    mh = MinHasher(num_perm=128, bands=32)
    t1 = "a b c d e f g h i j k l m n o p"
    t2 = "a b c d e f g h i j k l m n o q"  # high overlap
    t3 = "z y x w v u t s r q p o n m l k"
    s1, s2, s3 = mh.signature(t1), mh.signature(t2), mh.signature(t3)
    sim12 = (s1 == s2).mean()
    sim13 = (s1 == s3).mean()
    assert sim12 > 0.5
    assert sim13 < sim12


def test_minhash_dedup_pairs_finds_near_dups():
    docs = []
    base = " ".join(f"w{i}" for i in range(60))
    docs.append({"doc_id": 1, "text": base})
    docs.append({"doc_id": 2, "text": base})  # exact dup
    docs.append({"doc_id": 3, "text": base.replace("w10", "xx")})  # near dup
    docs.append({"doc_id": 4, "text": " ".join(f"z{i}" for i in range(60))})
    ds = ray.data.from_items(docs)
    pairs = minhash_dedup_pairs(ds, threshold=0.5, concurrency=2).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs.doc_a, pairs.doc_b)}
    assert (1, 2) in got
    assert (1, 3) in got
    assert not any(4 in p for p in got)
    assert (pairs["jaccard"] >= 0.5).all()


def test_minhash_join_verify_matches_broadcast():
    """The 100TB verify path (bucket joins) equals the broadcast path."""
    base = " ".join(f"w{i}" for i in range(60))
    docs = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},
        {"doc_id": 3, "text": base.replace("w10", "xx")},
        {"doc_id": 4, "text": " ".join(f"z{i}" for i in range(60))},
    ]
    ds = ray.data.from_items(docs)
    out = {}
    for mode in ("broadcast", "join"):
        p = minhash_dedup_pairs(ds, threshold=0.5, concurrency=2,
                                verify=mode).to_pandas()
        out[mode] = sorted(
            (int(a), int(b), round(j, 9))
            for a, b, j in zip(p.doc_a, p.doc_b, p.jaccard)
        )
    assert out["broadcast"] == out["join"]


def test_bucket_join_matches_pandas_merge():
    from htrc_feature_reader_ray.stages.partition import bucket_join

    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.randint(0, 40, 300), "x": np.arange(300)})
    right = pd.DataFrame({"rk": np.arange(40), "y": np.arange(40) * 2})
    got = (
        bucket_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            left_key="k", right_key="rk", num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    expect = (
        left.merge(right, left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    assert got[["k", "x", "y"]].astype("int64").equals(
        expect[["k", "x", "y"]].astype("int64")
    )


def test_embedding_dedup_pairs_exact():
    from htrc_feature_reader_ray.stages.dedup import embedding_dedup_pairs
    import pyarrow as pa

    v = np.array([1.0, 0.0, 0.0])
    vecs = [v, v * 3.0, np.array([0.0, 1.0, 0.0]),
            np.array([0.9, 0.1, 0.0])]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "embedding": pa.array([list(x) for x in vecs],
                                  type=pa.list_(pa.float64())),
        }
    )
    out = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.95
    ).to_pandas()
    got = sorted(map(tuple, out[["id_a", "id_b"]].values))
    # cos(1,2)=1; cos(1,4)=0.9939 >= .95; cos(2,4) same; others below
    assert got == [(1, 2), (1, 4), (2, 4)]


def test_simhash_properties():
    base = " ".join(f"w{i}" for i in range(100))
    near = base.replace("w5", "aa").replace("w50", "bb")
    far = " ".join(f"q{i}" for i in range(100))
    h = simhash_batch([base, base, near, far])
    assert h[0] == h[1]
    ham_near = bin(int(h[0]) ^ int(h[2])).count("1")
    ham_far = bin(int(h[0]) ^ int(h[3])).count("1")
    assert ham_near < ham_far
    assert ham_near <= 12


def test_simhash_dataset_bands():
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "a b c d"}, {"doc_id": 2, "text": "a b c d"}]
    )
    out = simhash(ds).to_pandas()
    assert out.loc[0, "simhash"] == out.loc[1, "simhash"]
    for b in range(4):
        assert out.loc[0, f"band{b}"] == out.loc[1, f"band{b}"]


def _random_embeddings(n=400, d=16, seed=7, planted=40):
    """n random vectors + `planted` near-duplicates of the first rows."""
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, d))
    dup = base[:planted] + 0.02 * rng.standard_normal((planted, d))
    mat = np.vstack([base, dup])
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array([list(r) for r in mat],
                                  type=pa.list_(pa.float64())),
        }
    )


def test_embedding_dedup_triangle_equals_broadcast():
    from htrc_feature_reader_ray.stages.dedup import embedding_dedup_pairs

    tbl = _random_embeddings()
    exact = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.6, method="broadcast"
    ).to_pandas()
    tri = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.6, method="triangle",
        num_groups=5,
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values))
    assert key(tri) == key(exact)
    assert len(exact) >= 40  # the planted dups are found


def test_embedding_dedup_lsh_recall():
    from htrc_feature_reader_ray.stages.dedup import embedding_dedup_pairs

    tbl = _random_embeddings()
    exact = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.95, method="broadcast"
    ).to_pandas()
    lsh = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.95, method="lsh"
    ).to_pandas()
    exact_pairs = set(map(tuple, exact[["id_a", "id_b"]].values))
    lsh_pairs = set(map(tuple, lsh[["id_a", "id_b"]].values))
    assert lsh_pairs <= exact_pairs  # exact verification: no false positives
    assert len(exact_pairs) >= 40
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.98, recall


def test_embedding_dedup_auto_threshold_switch():
    from htrc_feature_reader_ray.stages.dedup import embedding_dedup_pairs

    tbl = _random_embeddings(n=50, planted=5)
    # auto with a tiny broadcast_limit must route to triangle and stay exact
    small = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.9, method="auto",
        broadcast_limit=10, corpus_rows=55, num_groups=3,
    ).to_pandas()
    exact = embedding_dedup_pairs(
        ray.data.from_arrow(tbl), threshold=0.9, method="broadcast"
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b"]].values))
    assert key(small) == key(exact)


def test_simhash_batch_equals_scalar():
    from htrc_feature_reader_ray.stages.dedup import simhash_scalar

    texts = [
        "a b c d e f",
        "",
        "the the the and of",
        " ".join(f"w{i % 7}" for i in range(100)),
        "unicode töken ünïts · and 中文 words",
        "x",
    ]
    batched = simhash_batch(texts)
    for i, t in enumerate(texts):
        assert batched[i] == simhash_scalar(t), i


def _cc_pairs():
    import pyarrow as pa

    # components: {1,2,3,9} (chain 9-3, 3-2, 2-1), {5,6}, {10,11,12}
    return pa.table(
        {
            "doc_a": pa.array([2, 1, 3, 5, 10, 11], type=pa.int64()),
            "doc_b": pa.array([3, 2, 9, 6, 11, 12], type=pa.int64()),
        }
    )


CC_EXPECT = {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


def test_dedup_clusters_driver_path():
    from htrc_feature_reader_ray.stages.dedup import dedup_clusters

    out = dedup_clusters(
        ray.data.from_arrow(_cc_pairs()), num_buckets=4, method="driver"
    ).to_pandas()
    assert dict(zip(out["doc_id"], out["cluster_id"])) == CC_EXPECT


def test_dedup_clusters_distributed_equals_driver():
    """Pointer-doubled label propagation (the huge-edge-list path) must give
    the same components as union-find."""
    from htrc_feature_reader_ray.stages.dedup import dedup_clusters

    out = dedup_clusters(
        ray.data.from_arrow(_cc_pairs()), num_buckets=4, method="distributed"
    ).to_pandas()
    assert dict(zip(out["doc_id"], out["cluster_id"])) == CC_EXPECT


def test_dedup_clusters_long_chain_driver():
    """A 4000-node path graph: one union-find pass, exact."""
    from htrc_feature_reader_ray.stages.dedup import dedup_clusters
    import pyarrow as pa

    n = 4000
    pairs = pa.table(
        {
            "doc_a": pa.array(list(range(n - 1)), type=pa.int64()),
            "doc_b": pa.array(list(range(1, n)), type=pa.int64()),
        }
    )
    out = dedup_clusters(ray.data.from_arrow(pairs), num_buckets=4).to_pandas()
    assert (out["cluster_id"] == 0).all()
    assert len(out) == n
