import numpy as np
import pytest
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from htrc_feature_reader_ray.stages.similarity import (
    cosine_topk,
    lsh_topk,
)
from tests.util import assert_frames_match

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _query_matrix(n=5):
    t = pq.read_table(EMB)
    df = t.to_pandas().sort_values("vec_id").head(n)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return q, df["vec_id"].to_numpy()


def test_cosine_topk_vs_bruteforce():
    q, qids = _query_matrix(5)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    got = cosine_topk(ds, q, k=10, query_ids=qids).to_pandas()

    t = pq.read_table(EMB).to_pandas().sort_values("vec_id")
    m = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    for j, qid in enumerate(qids):
        order = np.lexsort((ids, -sims[:, j]))[:10]
        expect = ids[order]
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == expect.tolist()


def test_cosine_topk_vs_duckdb(duck):
    q, qids = _query_matrix(3)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    got = cosine_topk(ds, q, k=5, query_ids=qids)
    oracle = duck.execute(
        """
        WITH q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id < 3
        ), s AS (
          SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sim
          FROM q, embeddings e
        )
        SELECT query_id, vec_id, rank FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id) AS rank
          FROM s
        ) WHERE rank <= 5
        """
    ).df()
    assert_frames_match(got, oracle)


def test_ivf_topk_recall_grows_with_nprobe():
    from htrc_feature_reader_ray.stages.similarity import ivf_topk

    q, qids = _query_matrix(5)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    exact = cosine_topk(ds, q, k=10, query_ids=qids).to_pandas()
    e = set(map(tuple, exact[["query_id", "vec_id"]].values))

    def recall(nprobe):
        approx = ivf_topk(ds, q, k=10, n_lists=8, nprobe=nprobe,
                          query_ids=qids).to_pandas()
        a = set(map(tuple, approx[["query_id", "vec_id"]].values))
        return len(a & e) / len(e)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1
    assert r8 == 1.0  # probing every list == exact
    # deterministic across runs
    a1 = ivf_topk(ds, q, k=5, n_lists=8, nprobe=2, query_ids=qids).to_pandas()
    a2 = ivf_topk(ds, q, k=5, n_lists=8, nprobe=2, query_ids=qids).to_pandas()
    key = ["query_id", "rank"]
    assert a1.sort_values(key).reset_index(drop=True).equals(
        a2.sort_values(key).reset_index(drop=True)
    )


def test_ivf_topk_empty_dataset():
    import pyarrow as pa
    from htrc_feature_reader_ray.stages.similarity import ivf_topk

    empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float64())),
            }
        )
    )
    out = ivf_topk(empty, np.ones((2, 4)))
    assert out.count() == 0
    assert out.schema().names == ["query_id", "vec_id", "rank"]


def test_lsh_topk_sane_and_partial_recall():
    q, qids = _query_matrix(5)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    approx = lsh_topk(ds, q, k=10, nbits=4, query_ids=qids).to_pandas()
    exact = cosine_topk(ds, q, k=10, query_ids=qids).to_pandas()
    assert len(approx) > 0
    # each query's rank sequence is 1..n
    for qid, grp in approx.groupby("query_id"):
        assert grp.sort_values("rank")["rank"].tolist() == list(
            range(1, len(grp) + 1)
        )
    # the query vector itself shares its own bucket -> rank 1 is itself
    self_hits = approx[approx["rank"] == 1]
    assert (self_hits["query_id"] == self_hits["vec_id"]).all()
    # recall vs exact is nonzero
    a = set(map(tuple, approx[["query_id", "vec_id"]].values))
    e = set(map(tuple, exact[["query_id", "vec_id"]].values))
    assert len(a & e) > 0


def test_label_centroid_sums_exact():
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        label_centroid_sums,
    )

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((20, 4)).astype(np.float32)
    labels = (np.arange(20) % 3).astype(np.int32)
    tbl = pa.table({
        "label": pa.array(labels, type=pa.int32()),
        "embedding": pa.array([row.tolist() for row in mat],
                              type=pa.list_(pa.float32())),
    })
    out = (label_centroid_sums(ray.data.from_arrow(tbl))
           .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
    q = np.floor(mat.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    for lab in range(3):
        sel = out[out.label == lab]
        expect = q[labels == lab].sum(axis=0)
        assert sel.sum_q.tolist() == expect.tolist()
        assert (sel.n == (labels == lab).sum()).all()


# ---------------------------------------------------------------------------
# edit-distance near-dup pairs


def _scalar_lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_levenshtein_kernel_matches_scalar_reference():
    import random

    import numpy as np

    from htrc_feature_reader_ray.stages.similarity import _levenshtein_pairs

    random.seed(11)
    pairs = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting"),
             ("flaw", "lawn"), ("a" * 30, "a" * 29 + "b")]
    for _ in range(400):
        a = "".join(random.choice("abcd") for _ in range(random.randint(0, 14)))
        b = "".join(random.choice("abcd") for _ in range(random.randint(0, 14)))
        pairs.append((a, b))
    got = _levenshtein_pairs(
        np.array([p[0] for p in pairs], dtype=str),
        np.array([p[1] for p in pairs], dtype=str))
    assert got.tolist() == [_scalar_lev(a, b) for a, b in pairs]


def test_edit_distance_pairs_blocking_and_threshold():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import edit_distance_pairs

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "name": ["alpha", "alphq", "alxhq", "alpha", "zzzzz"],
        "blk": [10, 10, 10, 20, 10],
    })
    out = (
        edit_distance_pairs(
            ray.data.from_pandas(df).repartition(3),
            id_col="id", text_col="name", block_col="blk", max_dist=2)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    # (1,2) dist1, (1,3) dist2, (2,3) dist1; id 4 is an exact copy of id 1
    # but in another block; id 5 too far
    assert out[["id_a", "id_b", "dist"]].values.tolist() == [
        [1, 2, 1], [1, 3, 2], [2, 3, 1]]


# ---------------------------------------------------------------------------
# integer-exact k-means


def test_knn_label_propagation_wave_and_accuracy():
    import numpy as np
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        knn_label_propagation,
    )

    def at(deg):
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r))]

    # seeds (id%5==0): id0 label 0 @0deg, id5 label 1 @90deg.
    # k=1 chain: id1@10 -> id0 (round 1); id2@80 -> id5 (round 1);
    # id3@50 -> nearest is id2@80 (30deg) -> labeled only in round 2.
    df = pd.DataFrame({
        "vec_id": np.array([0, 1, 2, 3, 5], dtype=np.int64),
        "embedding": [at(0), at(10), at(80), at(50), at(90)],
        "label": np.array([0, 0, 0, 1, 1], dtype=np.int64),
        "cluster": np.zeros(5, dtype=np.int64),
    })
    out = knn_label_propagation(
        ray.data.from_pandas(df).repartition(2),
        k=1, seed_mod=5, rounds=2
    ).to_pandas().set_index("vec_id")
    assert set(out.index) == {1, 2, 3}  # seeds excluded
    assert out.loc[1, "prop_label"] == 0 and out.loc[1, "correct"] == 1
    assert out.loc[2, "prop_label"] == 1 and out.loc[2, "correct"] == 0
    assert out.loc[3, "prop_label"] == 1 and out.loc[3, "correct"] == 1
    # with rounds=1 the wave hasn't reached id3 yet
    out1 = knn_label_propagation(
        ray.data.from_pandas(df), k=1, seed_mod=5, rounds=1
    ).to_pandas()
    assert set(out1["vec_id"]) == {1, 2}


def test_kmeans_silhouette_crisp_and_boundary():
    import numpy as np
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        kmeans_silhouette,
    )

    S = CENTROID_SCALE
    # rounds=0: centroids are the k=2 seeds [0,0] and [1,0].
    # ids 0..3 sit exactly on a centroid -> silhouette 1e6;
    # id 4 = [0.5, 0] is equidistant -> b = a -> silhouette 0,
    # cluster ties to the LOWER centroid id (0).
    df = pd.DataFrame({
        "vec_id": np.arange(5, dtype=np.int64),
        "embedding": [[0.0, 0.0], [1.0, 0.0], [0.0, 0.0],
                      [1.0, 0.0], [0.5, 0.0]],
    })
    out = kmeans_silhouette(
        ray.data.from_pandas(df).repartition(3), k=2, rounds=0
    ).to_pandas().set_index("vec_id").sort_index()
    assert (out.loc[[0, 1, 2, 3], "silhouette_ppm"] == 1_000_000).all()
    assert out.loc[0, "dist_own"] == 0
    assert out.loc[0, "dist_next"] == S * S
    assert out.loc[4, "silhouette_ppm"] == 0
    assert out.loc[4, "cluster"] == 0  # tie -> lowest centroid id
    assert out.loc[4, "dist_own"] == out.loc[4, "dist_next"] == (S // 2) ** 2
    assert out.loc[1, "cluster"] == 1


def test_kmeans_fixed_matches_scalar_lloyd_and_parallelism_independent():
    import numpy as np
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        kmeans_fixed,
    )

    rng = np.random.RandomState(3)
    # 3 separated blobs in 4d + an outlier
    pts = np.concatenate([
        rng.normal(0.0, 0.02, (10, 4)),
        rng.normal(0.3, 0.02, (10, 4)),
        rng.normal(-0.3, 0.02, (10, 4)),
    ]).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(len(pts)),
        "embedding": [list(map(float, p)) for p in pts],
    })

    # scalar reference with identical integer kernel
    q = np.floor(pts.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    k, rounds = 3, 3
    cent = q[:k].copy()
    for _ in range(rounds):
        dist = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = dist.argmin(axis=1)
        new = cent.copy()
        for j in range(k):
            m = q[a == j]
            if len(m):
                new[j] = m.sum(axis=0) // len(m)
        cent = new
    dist = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    expect = dist.argmin(axis=1)

    for parts in (1, 7):
        out = kmeans_fixed(
            ray.data.from_pandas(df).repartition(parts),
            k=k, rounds=rounds,
        ).to_pandas().sort_values("vec_id")
        assert out["cluster"].tolist() == expect.tolist(), parts


def test_random_projection_exactness_and_geometry():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        random_projection,
    )

    rng = np.random.RandomState(7)
    n, d_in, d_out = 200, 32, 16
    vecs = rng.randn(n, d_in).astype(np.float32)
    import pyarrow as pa

    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })

    out = {}
    for parts in (1, 6):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out[parts] = (
            random_projection(ds, d_out=d_out).to_pandas()
            .sort_values(["vec_id", "dim"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(out[1], out[6])  # parallelism-proof

    # scalar reference for one vector/dim
    q = np.floor(vecs.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    h = md5_hash64([f"3:{i}" for i in range(d_in)])
    signs = 1 - 2 * (h >> np.uint64(63)).astype(np.int64)
    want = int((q[5] * signs).sum())
    got = out[1][(out[1].vec_id == 5) & (out[1].dim == 3)]["value"].iloc[0]
    assert int(got) == want

    # JL property: projected squared distances track original ones
    proj = (
        out[1].pivot(index="vec_id", columns="dim", values="value")
        .to_numpy().astype(np.float64) / CENTROID_SCALE
    )
    a, b = rng.randint(0, n, 60), rng.randint(0, n, 60)
    d_orig = ((vecs[a] - vecs[b]) ** 2).sum(1)
    d_proj = ((proj[a] - proj[b]) ** 2).sum(1) / d_out
    mask = d_orig > 0
    ratio = d_proj[mask] / d_orig[mask]
    assert 0.4 < np.median(ratio) < 1.8  # distances preserved in band


def test_hard_negative_topk_excludes_own_label():
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import hard_negative_topk

    rng = np.random.RandomState(5)
    n, d = 120, 8
    vecs = rng.randn(n, d).astype(np.float32)
    labels = (np.arange(n) % 3).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = hard_negative_topk(
        ds, vecs[:5], labels[:5], k=4,
        query_ids=np.arange(5)).to_pandas()
    assert set(got["query_id"]) == set(range(5))
    for qid, g in got.groupby("query_id"):
        assert len(g) == 4
        assert (labels[g["vec_id"].to_numpy()] != labels[qid]).all()
        # brute-force reference
        qn = vecs[qid] / np.linalg.norm(vecs[qid])
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vn.astype(np.float64) @ qn.astype(np.float64)
        sims[labels == labels[qid]] = -np.inf
        want = np.lexsort((np.arange(n), -sims))[:4]
        assert g.sort_values("rank")["vec_id"].tolist() == list(want)


def test_embedding_minmax_scale_bounds_and_constant_dim():
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        embedding_minmax_scale,
    )

    vecs = np.array([
        [0.0, 5.0, -1.0],
        [1.0, 5.0, 0.5],
        [2.0, 5.0, 3.0],
    ], dtype=np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(3, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    got = (
        embedding_minmax_scale(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas().set_index(["vec_id", "dim"]).sort_index()
    )
    assert got.loc[(0, 0), "value_ppm"] == 0
    assert got.loc[(2, 0), "value_ppm"] == 1_000_000
    assert got.loc[(1, 0), "value_ppm"] == 500_000
    # constant dim scales to 0 by contract
    assert (got.xs(1, level="dim")["value_ppm"] == 0).all()
    assert got.loc[(0, 2), "value_ppm"] == 0
    assert got.loc[(2, 2), "value_ppm"] == 1_000_000


def test_pq_codes_shape_independence_and_reconstruction_monotone():
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import pq_codes

    rng = np.random.RandomState(13)
    n = 160
    # two well-separated blobs per subspace -> codes must separate them
    half = np.concatenate([np.zeros(n // 2), np.ones(n // 2) * 10.0])
    vecs = (rng.randn(n, 8) * 0.1 + half[:, None]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    out = {}
    for parts in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out[parts] = (
            pq_codes(ds, subspaces=2, k=2, rounds=3)
            .to_pandas().sort_values(["vec_id", "subspace"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(out[1], out[5])  # bit-identical
    got = out[1]
    assert len(got) == n * 2
    for s in (0, 1):
        g = got[got.subspace == s]
        lo = set(g[g.vec_id < n // 2]["code"])
        hi = set(g[g.vec_id >= n // 2]["code"])
        assert lo.isdisjoint(hi)  # blobs get distinct codes


def test_mmr_rerank_diversity_and_sql_parity():
    import duckdb

    from htrc_feature_reader_ray.stages.similarity import (
        mmr_rerank,
        mmr_rerank_sql,
    )

    rng = np.random.default_rng(3)
    n, d = 40, 8
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb[1] = emb[0] * 0.98 + 0.01  # near-dups of the query doc
    emb[2] = emb[0] * 0.97 + 0.02
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(emb)})
    ds = ray.data.from_pandas(df).repartition(3)
    con = duckdb.connect()
    con.register("embeddings", df)
    for lam in ((7, 10), (1, 2)):
        out = mmr_rerank(ds, emb[0], k=5, n_candidates=12, lam=lam)
        sql = (con.execute(
            mmr_rerank_sql(k=5, n_candidates=12, dims=d, lam=lam)).df()
            .sort_values("mmr_rank").reset_index(drop=True))
        pd.testing.assert_frame_equal(out.reset_index(drop=True), sql)
    # rank 1 is pure relevance (the query doc itself)
    assert out.iloc[0]["vec_id"] == 0
    # diversity bites: at lambda=1/2 a redundant near-dup ranks strictly
    # worse than under pure relevance order (sim order would put 1,2 next)
    assert out["vec_id"].tolist()[:3] != [0, 1, 2]
    # scores are monotone nonincreasing in rank past round 1
    assert (np.diff(out["mmr_score"].to_numpy()[1:]) <= 0).all()


def test_knn_label_agreement_exact():
    import duckdb

    from htrc_feature_reader_ray.stages.similarity import (
        knn_label_agreement,
        knn_label_agreement_sql,
    )

    # one cell: 4 vectors on a line; one mislabeled point; one singleton
    # cell. Neighbor order by cosine desc is deterministic here.
    df = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 9],
        "embedding": [[1.0, 0.0], [0.9, 0.1], [0.8, 0.3], [0.0, 1.0],
                      [0.5, 0.5]],
        "label": [7, 7, 7, 8, 3],
        "cluster": [0, 0, 0, 0, 1],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = (knn_label_agreement(ds, k=2).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    # vec 0: nearest are 1, 2 (both label 7) -> 2/2 agree
    r0 = out[out.vec_id == 0].iloc[0]
    assert (r0["n_neighbors"], r0["n_agree"], r0["agree_ppm"]) == \
        (2, 2, 1_000_000)
    # vec 3 ([0,1], label 8): nearest two are 2 and 1 (label 7) -> 0 agree
    r3 = out[out.vec_id == 3].iloc[0]
    assert (r3["n_agree"], r3["agree_ppm"]) == (0, 0)
    # singleton cell -> -1 sentinel
    r9 = out[out.vec_id == 9].iloc[0]
    assert (r9["n_neighbors"], r9["agree_ppm"]) == (0, -1)

    con = duckdb.connect()
    con.register("t", df)
    sql = (con.execute(knn_label_agreement_sql(
        source_sql="SELECT * FROM t", k=2)).df()
        .sort_values("vec_id").reset_index(drop=True))
    lhs = out.astype({"label": "int64", "cluster": "int64"})
    rhs = sql.astype({"label": "int64", "cluster": "int64"})
    pd.testing.assert_frame_equal(lhs, rhs)


def test_knn_hubness_exact():
    import duckdb

    from htrc_feature_reader_ray.stages.similarity import (
        knn_hubness,
        knn_hubness_sql,
    )

    # hub construction: v0 at the centroid of a fan; with k=1 every other
    # vector's nearest is v0 (cos to v0 exceeds cos between fan arms)
    df = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.2], [1.0, 0.9], [1.0, -0.5], [0.8, 0.35]],
        "cluster": [0, 0, 0, 0],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = (knn_hubness(ds, k=1).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert int(out["n_k"].sum()) == 4  # k=1: exactly one vote per vector
    assert out.loc[0, "n_k"] >= 2      # v0 is the hub

    con = duckdb.connect()
    con.register("t", df)
    sql = (con.execute(knn_hubness_sql(
        source_sql="SELECT * FROM t", k=1)).df()
        .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"cluster": "int64"}), sql.astype({"cluster": "int64"}))


def test_embedding_covariance_exact_and_partition_invariant():
    import duckdb

    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        embedding_covariance,
        embedding_covariance_sql,
    )

    rng = np.random.default_rng(11)
    m = rng.normal(0, 0.3, size=(40, 3)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(40), "embedding": list(m)})

    def run(parts):
        ds = ray.data.from_pandas(df).repartition(parts)
        return (embedding_covariance(ds).to_pandas()
                .sort_values(["i", "j"]).reset_index(drop=True))

    out = run(1)
    # scalar reference in the quantized domain (pure-python big ints)
    q = np.floor(m.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    n = len(q)
    for _, r in out.iterrows():
        i, j = int(r["i"]), int(r["j"])
        numer = (n * int(q[:, i].astype(object) @ q[:, j].astype(object))
                 - int(q[:, i].sum()) * int(q[:, j].sum()))
        expect = numer * 1_000_000 // (n * n * CENTROID_SCALE ** 2)
        assert r["cov_ppm"] == expect, (i, j)
    assert len(out) == 6  # upper triangle of d=3
    # diagonal = variance > 0; off-diagonals can be negative (floor exact)
    assert (out[out["i"] == out["j"]]["cov_ppm"] > 0).all()

    # bit-identical across parallelism
    pd.testing.assert_frame_equal(out, run(7))

    # SQL replay identical
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame({
        "vec_id": range(40), "embedding": [list(map(float, v)) for v in m]}))
    sql = (con.execute(embedding_covariance_sql()).df()
           .sort_values(["i", "j"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)


def test_topk_recall_exact_and_missing_query():
    import pandas as pd

    from htrc_feature_reader_ray.stages.similarity import topk_recall

    exact = pd.DataFrame({
        "query_id": [1, 1, 1, 1, 2, 2, 2, 2],
        "vec_id":   [10, 11, 12, 13, 20, 21, 22, 23],
    })
    # query 1: 3/4 hit; query 2: no approx rows at all -> 0
    approx = pd.DataFrame({
        "query_id": [1, 1, 1, 1],
        "vec_id":   [10, 11, 13, 99],
    })
    out = topk_recall(approx, exact, k=4).sort_values(
        "query_id").reset_index(drop=True)
    assert out["recall_ppm"].tolist() == [750000, 0]
    # identical tables -> exactly 1.0 for every query
    full = topk_recall(exact, exact, k=4)
    assert set(full["recall_ppm"]) == {1000000}


def test_mutual_nn_reciprocity_filters_hubs():
    from htrc_feature_reader_ray.stages.similarity import mutual_nn

    # 2-d toy: v0 and v1 nearly parallel (mutual), v2 closer to v1 than
    # to v0 but v1's top-1 is v0 -> v2 gets NO mutual partner with v3
    # pointing elsewhere
    vecs = {
        0: [1.0, 0.00],
        1: [1.0, 0.01],
        2: [0.9, 0.30],
        3: [0.0, 1.00],
    }
    df = pd.DataFrame({
        "vec_id": list(vecs),
        "embedding": [np.array(v) for v in vecs.values()],
        "cluster": [0, 0, 0, 0],
    })
    out = mutual_nn(ray.data.from_pandas(df).repartition(2)).to_pandas()
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    assert (0, 1) in pairs          # reciprocal top-1
    assert not any(2 in p or 3 in p for p in pairs)  # one-way matches die
    # cells bound the search: same vectors in different clusters -> no pair
    df2 = df.copy()
    df2["cluster"] = [0, 1, 0, 1]
    out2 = mutual_nn(ray.data.from_pandas(df2)).to_pandas()
    assert (0, 1) not in set(zip(out2["vec_a"], out2["vec_b"]))


def test_pca_power_dominant_axis_and_invariance():
    from htrc_feature_reader_ray.stages.similarity import (
        embedding_covariance,
        pca_power,
    )

    rng = np.random.default_rng(7)
    # dominant variance along axis 0, small isotropic noise elsewhere
    m = np.zeros((60, 4), dtype=np.float64)
    m[:, 0] = rng.normal(0, 1.0, 60)
    m[:, 1:] = rng.normal(0, 0.05, (60, 3))
    df = pd.DataFrame({"vec_id": range(60),
                       "embedding": list(m.astype(np.float32))})

    out = pca_power(ray.data.from_pandas(df).repartition(5), rounds=8)
    out = out.sort_values("dim").reset_index(drop=True)
    v = out["component_ppm"].to_numpy().astype(np.float64)
    # max-abs normalization contract: the peak component is +-1e6
    assert np.abs(v).max() == 1_000_000
    assert np.abs(v).argmax() == 0
    # direction matches numpy's top eigenvector of the engine's own
    # exact integer covariance (cosine ~ 1)
    cov = embedding_covariance(
        ray.data.from_pandas(df)).to_pandas()
    d = 4
    C = np.zeros((d, d))
    for i, j, c in zip(cov["i"], cov["j"], cov["cov_ppm"]):
        C[int(i), int(j)] = C[int(j), int(i)] = float(c)
    w, vec = np.linalg.eigh(C)
    top = vec[:, np.argmax(w)]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999
    # eig_ppm ~ top eigenvalue of the ppm covariance (within 1%)
    eig = float(out["eig_ppm"].iloc[0])
    assert abs(eig - w.max()) <= 0.01 * w.max()
    # bit-identical across parallelism
    o2 = pca_power(ray.data.from_pandas(df).repartition(1), rounds=8)
    pd.testing.assert_frame_equal(
        out, o2.sort_values("dim").reset_index(drop=True))
    # constant corpus: zero covariance has no principal axis
    dfc = pd.DataFrame({
        "vec_id": range(8),
        "embedding": [np.ones(3, dtype=np.float32)] * 8,
    })
    import pytest
    with pytest.raises(Exception):
        pca_power(ray.data.from_pandas(dfc), rounds=2)


def test_matryoshka_quality_exact():
    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        matryoshka_quality,
    )

    # vectors with known prefix energy: v1 = e0 (all energy in dim 0),
    # v2 = ones(4) (energy k/4 at budget k)
    m = np.array([[1.0, 0.0, 0.0, 0.0],
                  [1.0, 1.0, 1.0, 1.0]], dtype=np.float32)
    df = pd.DataFrame({"vec_id": [0, 1], "embedding": list(m)})
    out = matryoshka_quality(ray.data.from_pandas(df).repartition(2),
                             budgets=(1, 2, 4)).set_index("budget")
    # budget 1: v1 -> 1e6, v2 -> 250000; mean = (1e6+250000)//2
    assert out.loc[1, "mean_energy_ppm"] == 625_000
    assert out.loc[1, "min_energy_ppm"] == 250_000
    # budget 4: everything -> exactly 1e6
    assert out.loc[4, "mean_energy_ppm"] == 1_000_000
    assert out.loc[4, "min_energy_ppm"] == 1_000_000
    # zero vector excluded by contract (would otherwise divide by zero)
    df2 = pd.DataFrame({"vec_id": [0, 1],
                        "embedding": [np.zeros(4, dtype=np.float32),
                                      m[0]]})
    o2 = matryoshka_quality(ray.data.from_pandas(df2), budgets=(2,))
    assert int(o2["n"].iloc[0]) == 1
    # scalar replay: quantized big-int reference at budget 2 on v2
    q = np.floor(m.astype(np.float64) * CENTROID_SCALE).astype(np.int64)
    ref = (int(q[1, :2].astype(object) @ q[1, :2].astype(object))
           * 1_000_000
           // int(q[1].astype(object) @ q[1].astype(object)))
    full = matryoshka_quality(ray.data.from_pandas(df),
                              budgets=(2,)).set_index("budget")
    assert ref == 500_000  # 2·q² // 4·q² exactly
    assert full.loc[2, "min_energy_ppm"] == ref


def test_int8_quant_error_hand():
    from htrc_feature_reader_ray.stages.similarity import (
        CENTROID_SCALE,
        int8_quant_error,
    )

    # dim 0: values exactly on code points (k/127 of maxabs 1.0) ->
    # zero error at the grid; dim 1: constant zero -> lossless; dim 2:
    # a value at half-step distance -> error ~ step/2
    m = np.array([[1.0, 0.0, 1.0],
                  [-1.0, 0.0, 1.0 / 254.0]], dtype=np.float64)
    df = pd.DataFrame({"vec_id": [0, 1],
                       "embedding": [m[0].astype(np.float32),
                                     m[1].astype(np.float32)]})
    out = int8_quant_error(ray.data.from_pandas(df).repartition(2)
                           ).set_index("dim")
    # dim 1 constant-zero: lossless by contract
    assert out.loc[1, "max_err_ppm"] == 0
    assert out.loc[1, "mean_err_ppm"] == 0
    # dim 0: +-maxabs quantize exactly (code +-127, deq == maxabs)
    assert out.loc[0, "max_err_ppm"] == 0
    # dim 2: the half-step value's error is bounded by ~half a step of
    # maxabs/127 -> <= 1e6/254 + rounding slack
    assert 0 < out.loc[2, "max_err_ppm"] <= 1_000_000 // 254 + 40
    # scalar replay of the exact contract on dim 2's small value
    q = int(np.floor((1.0 / 254.0) * CENTROID_SCALE))
    mab = int(np.floor(1.0 * CENTROID_SCALE))
    code = (q * 127 + mab // 2) // mab
    deq = code * mab // 127
    assert out.loc[2, "max_err_ppm"] == abs(q - deq) * 1_000_000 // mab


def test_embedding_isotropy_exact():
    """Exact-integer contract: identical vectors read center_ppm =
    pair_ppm = 10^6; a symmetric +v/-v corpus reads center 0 and the
    most negative achievable pair ratio."""
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        embedding_isotropy,
    )

    same = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[0.5, 0.25]] * 3,
    }))
    out = embedding_isotropy(same, scale=4).to_pandas()
    assert out.iloc[0].to_dict() == {
        "n": 3, "center_ppm": 1_000_000, "pair_ppm": 1_000_000}

    # q = [2,1] and [-2,-1] at scale 4: S = 0 -> center 0;
    # pair = (0 - T)*1e6 // ((n-1)*T) = -1e6 exactly at n=2
    anti = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [[0.5, 0.25], [-0.5, -0.25]],
    }))
    out2 = embedding_isotropy(anti, scale=4).to_pandas()
    assert out2.iloc[0].to_dict() == {
        "n": 2, "center_ppm": 0, "pair_ppm": -1_000_000}


def test_embedding_isotropy_degenerate_raises():
    import ray.data

    from htrc_feature_reader_ray.stages.similarity import (
        embedding_isotropy,
    )

    zeros = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1], "embedding": [[0.0, 0.0], [0.0, 0.0]]}))
    with pytest.raises(ValueError):
        embedding_isotropy(zeros, scale=4).to_pandas()
