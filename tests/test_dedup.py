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


# ---------------------------------------------------------------------------
# duplicated_spans (exact substring-level dedup signal)


def _brute_spans(df: pd.DataFrame, width: int, min_docs: int = 2):
    def toks(t):
        return [x for x in (t or "").split(" ") if x]

    grams: dict[str, set] = {}
    for i, t in df.itertuples(index=False):
        tk = toks(t)
        for j in range(max(0, len(tk) - width + 1)):
            grams.setdefault(" ".join(tk[j:j + width]), set()).add(i)
    dup = {g for g, s in grams.items() if len(s) >= min_docs}
    rows = []
    for i, t in df.itertuples(index=False):
        tk = toks(t)
        n, nw = len(tk), max(0, len(tk) - width + 1)
        pos = [j for j in range(nw) if " ".join(tk[j:j + width]) in dup]
        cov: set = set()
        for p in pos:
            cov.update(range(p, p + width))
        rows.append((i, n, nw, len(pos), len(cov), len(cov) / max(n, 1)))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_tokens", "n_windows", "n_dup_windows",
        "dup_tokens", "dup_frac",
    ])


_SPAN_DOCS = pd.DataFrame({
    "doc_id": np.arange(10, dtype=np.int64),
    "text": [
        "a b c d e f g h",            # shares 'a b c d e' prefix with 1, 3, 8
        "x y a b c d e z",
        "q r s t u v w",              # unique
        "a b c d e f g h",            # exact dup of 0
        "one two three four five",    # unique
        "",                           # empty
        None,                         # null text (hashes as empty)
        "a b",                        # shorter than width: 0 windows
        "m n o p a b c d e q r s",
        "z z z z z",                  # self-repeating but single-doc
    ],
})


def test_duplicated_spans_broadcast_exact():
    from htrc_feature_reader_ray.stages.dedup import duplicated_spans

    ds = ray.data.from_pandas(_SPAN_DOCS).repartition(4)
    got = duplicated_spans(ds, width=5, distribute="broadcast") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _brute_spans(_SPAN_DOCS, 5))
    # overlapping windows merge: doc 0's dup windows [0..3] cover 8 tokens
    row0 = got[got.doc_id == 0].iloc[0]
    assert row0.n_dup_windows == 4 and row0.dup_tokens == 8
    assert row0.dup_frac == 1.0
    # short / empty / null docs emit zero windows, frac 0
    for d in (5, 6, 7):
        r = got[got.doc_id == d].iloc[0]
        assert r.n_windows == 0 and r.dup_frac == 0.0
    # within-doc repetition alone is NOT cross-doc duplication
    r9 = got[got.doc_id == 9].iloc[0]
    assert r9.n_dup_windows == 0


def test_duplicated_spans_join_equals_broadcast():
    from htrc_feature_reader_ray.stages.dedup import duplicated_spans

    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    b = duplicated_spans(ds, width=5, distribute="broadcast") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    j = duplicated_spans(ds, width=5, distribute="join", num_buckets=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)
    assert (b.n_dup_windows > 0).any()  # fixture has real duplication


def test_duplicated_spans_min_docs_threshold():
    from htrc_feature_reader_ray.stages.dedup import duplicated_spans

    ds = ray.data.from_pandas(_SPAN_DOCS).repartition(3)
    got = duplicated_spans(ds, width=5, min_docs=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _brute_spans(_SPAN_DOCS, 5, 4))
    # 'a b c d e' appears in docs {0,1,3,8} = 4 docs -> still duplicated
    assert got[got.doc_id == 1].iloc[0].n_dup_windows == 1
    # but 'b c d e f' ({0,3}) no longer qualifies
    assert got[got.doc_id == 0].iloc[0].n_dup_windows == 1


def test_duplicated_spans_no_dups_join_path():
    from htrc_feature_reader_ray.stages.dedup import duplicated_spans

    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c d e f", "g h i j k l", "m n o p q r"],
    })
    ds = ray.data.from_pandas(docs)
    got = duplicated_spans(ds, width=5, distribute="join") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (got.n_dup_windows == 0).all() and (got.dup_frac == 0.0).all()
    assert list(got.n_windows) == [2, 2, 2]


# ---------------------------------------------------------------------------
# line_dedup (C4-style corpus line dedup)
# ---------------------------------------------------------------------------

def _line_pages(rows):
    import pyarrow as pa

    return ray.data.from_arrow(pa.table({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
    }))


def test_line_dedup_keeps_first_occurrence():
    from htrc_feature_reader_ray.stages.dedup import line_dedup

    pages = _line_pages([
        ("a", 1, "shared\nunique-a\nshared"),   # 2nd 'shared' in-page dup
        ("b", 1, "shared\nunique-b"),
        ("b", 2, "unique-b\ntail"),             # dup of b@1's line
    ])
    out = (line_dedup(pages, method="broadcast", num_buckets=4)
           .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True))
    assert out["n_lines"].tolist() == [3, 2, 2]
    assert out["n_kept"].tolist() == [2, 1, 1]
    assert out["clean_text"].tolist() == [
        "shared\nunique-a", "unique-b", "tail"]


def test_line_dedup_paths_equal_and_null_text():
    from htrc_feature_reader_ray.stages.dedup import line_dedup

    rows = [("a", 1, "x\ny"), ("b", 1, None), ("c", 1, ""), ("d", 1, "")]
    a = (line_dedup(_line_pages(rows), method="broadcast", num_buckets=4)
         .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True))
    b = (line_dedup(_line_pages(rows), method="exchange", num_buckets=4)
         .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True))
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(a[cols], b[cols])
    # null text == '' (one empty line); the three empty lines dedup to one
    assert a["n_lines"].tolist() == [2, 1, 1, 1]
    assert a["n_kept"].tolist() == [2, 1, 0, 0]
    assert a["clean_text"].tolist() == ["x\ny", "", "", ""]


def test_line_dedup_no_duplicates_identity():
    from htrc_feature_reader_ray.stages.dedup import line_dedup

    rows = [("a", 1, "p\nq"), ("b", 1, "r\ns")]
    out = (line_dedup(_line_pages(rows), method="exchange", num_buckets=2)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert out["n_kept"].tolist() == [2, 2]
    assert out["clean_text"].tolist() == ["p\nq", "r\ns"]


def test_boilerplate_lines_host_scoped_strip():
    from htrc_feature_reader_ray.stages.dedup import boilerplate_lines

    # "nav" is on 2 distinct urls of host a -> stripped from BOTH (unlike
    # line_dedup, which would keep the first); host b also has "nav" but on
    # one url only -> kept (host-scoped counting); a1's two snapshots count
    # as ONE url
    rows = [
        ("http://a/1", 1, "nav\nbody1"),
        ("http://a/1", 2, "nav\nbody1b"),
        ("http://a/2", 1, "nav\nbody2"),
        ("http://b/9", 1, "nav\nbody9"),
    ]
    out = (
        boilerplate_lines(_line_pages(rows), min_pages=2, num_buckets=4)
        .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    assert out["n_lines"].tolist() == [2, 2, 2, 2]
    assert out["n_kept"].tolist() == [1, 1, 1, 2]
    assert out["clean_text"].tolist() == [
        "body1", "body1b", "body2", "nav\nbody9"]


def test_boilerplate_lines_paths_equal_and_all_dropped():
    from htrc_feature_reader_ray.stages.dedup import boilerplate_lines

    rows = [
        ("http://a/1", 1, "nav\nfoot"),
        ("http://a/2", 1, "nav\nfoot"),
        ("http://a/3", 1, None),
        ("http://a/4", 1, None),
    ]
    a = (boilerplate_lines(_line_pages(rows), method="broadcast",
                           num_buckets=4)
         .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True))
    b = (boilerplate_lines(_line_pages(rows), method="exchange",
                           num_buckets=4)
         .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True))
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(a[cols], b[cols])
    # every line is host-boilerplate (incl. the null->'' empty line pages)
    assert a["n_kept"].tolist() == [0, 0, 0, 0]
    assert a["clean_text"].tolist() == ["", "", "", ""]


def test_host_dup_rate_keep_first_and_cross_host():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import host_dup_rate

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "host":   ["a", "a", "a", "b", "b", "c"],
        # doc1 dups doc0 (same host); doc4 dups doc0 (CROSS host: the
        # loser lands on b, the winner stays on a); doc5 unique
        "text": ["t one", "T  ONE", "other", "unrelated", "t one", "zzz"],
    })
    out = (host_dup_rate(ray.data.from_pandas(df).repartition(4))
           .to_pandas().sort_values("host").reset_index(drop=True))
    assert out["host"].tolist() == ["a", "b", "c"]
    assert out["n_docs"].tolist() == [3, 2, 1]
    assert out["n_dup_losers"].tolist() == [1, 1, 0]
    assert out["dup_ppm"].tolist() == [1_000_000 // 3, 500_000, 0]


def test_containment_pairs_doc_inside_doc_and_path_equality():
    """A small doc fully quoted inside a big doc: Jaccard is low (would be
    missed by symmetric near-dup) but containment = 1. Broadcast and join
    size-attach paths must emit identical rows."""
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import containment_pairs

    small = "alpha beta gamma delta epsilon"
    big = ("zero one two three four five six seven eight nine ten "
           + small + " eleven twelve thirteen fourteen fifteen sixteen")
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [small, big, "totally different words here now ok"],
    })

    def run(path):
        return (containment_pairs(
                    ray.data.from_pandas(df).repartition(2),
                    min_containment=0.9, sizes_path=path)
                .to_pandas().sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))

    out = run("join")
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out.loc[0, "containment"] == 1.0     # all of doc1's shingles
    assert out.loc[0, "n_shared"] == 3          # 5 tokens -> 3 trigrams
    pd.testing.assert_frame_equal(out, run("broadcast"))


# ---------------------------------------------------------------------------
# exact prefix-filtered Jaccard join


def test_jaccard_join_exact_vs_bruteforce():
    import itertools

    import ray.data

    from htrc_feature_reader_ray.stages.dedup import jaccard_join, word_shingles

    docs = {
        1: "the quick brown fox jumps over the lazy dog tonight",
        2: "the quick brown fox jumps over the lazy cat tonight",   # near 1
        3: "the quick brown fox jumps over the lazy dog tonight",   # == 1
        4: "completely different text with no shared shingles at all",
        5: "one two",                                               # no 3-shingle
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = (
        jaccard_join(ray.data.from_pandas(df).repartition(3),
                     k_shingle=3, threshold_ppm=500_000)
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )

    # brute-force reference
    sets = {i: set(word_shingles(t.split(), 3)) for i, t in docs.items()}
    expect = []
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if inter * 1_000_000 >= 500_000 * union:
            expect.append((a, b, inter, union, inter * 1_000_000 // union))
    assert out[["id_a", "id_b", "inter", "union_n",
                "jaccard_ppm"]].values.tolist() == [list(e) for e in expect]
    # the identical pair is found at exactly 10^6 ppm
    ident = out[(out["id_a"] == 1) & (out["id_b"] == 3)]
    assert ident["jaccard_ppm"].tolist() == [1_000_000]
    # doc 5 (too short for a 3-shingle) and doc 4 (disjoint) never pair
    assert not set(out["id_a"]) & {4, 5}
    assert not set(out["id_b"]) & {4, 5}


def test_jaccard_join_broadcast_equals_join_path():
    """The broadcast-df fast path and the bucketed join path must emit the
    IDENTICAL verified pair set — prefix order differences only reshape the
    candidate superset, never the exact output."""
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import jaccard_join

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(120)]
    # inject exact + near duplicates
    texts[100] = texts[0]
    texts[101] = texts[1] + " extra"
    df = pd.DataFrame({"doc_id": range(120), "text": texts})
    ds = ray.data.from_pandas(df).repartition(5)

    def run(mode):
        return (jaccard_join(ds, k_shingle=3, threshold_ppm=400_000,
                             df_mode=mode)
                .to_pandas()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    a, b = run("broadcast"), run("join")
    pd.testing.assert_frame_equal(a, b)
    assert ((a["id_a"] == 0) & (a["id_b"] == 100)).any()


def test_split_leakage_hand_fixture():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import split_leakage

    df = pd.DataFrame({
        "text": ["shared  doc", "SHARED doc", "only train", "only test",
                 "tri", "tri", "tri"],
        "split": ["train", "test", "train", "test",
                  "train", "train", "test"],
    })
    got = (
        split_leakage(ray.data.from_pandas(df).repartition(3),
                      split_col="split")
        .to_pandas().sort_values("digest").reset_index(drop=True)
    )
    # 'shared  doc' vs 'SHARED doc' normalize to one digest -> leak;
    # 'tri' leaks with counts 2/1; singles don't
    assert len(got) == 2
    assert set(zip(got["n_train"], got["n_test"])) == {(1, 1), (2, 1)}


def test_simhash_drift_hamming_and_first_snapshot():
    from htrc_feature_reader_ray.stages.dedup import (
        simhash_batch,
        simhash_drift,
    )

    df = pd.DataFrame({
        "url": ["u1", "u1", "u1", "u2", "u2"],
        "warc_ts": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03",
             "2024-01-01", "2024-01-02"]).astype("datetime64[us]"),
        "text": ["alpha beta gamma", "alpha beta gamma",
                 "totally different words here",
                 "same same", "same same"],
    })
    out = (simhash_drift(ray.data.from_pandas(df).repartition(3),
                         num_buckets=4)
           .to_pandas().sort_values(["url", "warc_ts"])
           .reset_index(drop=True))
    # first snapshot per url marks -1
    assert out.groupby("url")["hamming"].first().tolist() == [-1, -1]
    h = out["hamming"].tolist()
    assert h[1] == 0          # identical content: zero drift
    assert h[2] > 10          # full rewrite: large Hamming distance
    assert h[4] == 0
    # simhash column equals the batched kernel's (signed int64 view)
    sh = simhash_batch(df.sort_values(["url", "warc_ts"])["text"].tolist())
    assert out["simhash"].tolist() == list(sh.view("int64"))


def test_cdc_chunks_contract():
    import duckdb

    from htrc_feature_reader_ray.stages.dedup import (
        cdc_chunks,
        cdc_chunks_sql,
        md5_hash64,
    )

    # find a token whose md5 gates at divisor=4 to build a known cut
    div = np.uint64(4)
    gated = next(t for t in (f"w{i}" for i in range(100))
                 if md5_hash64([t])[0] % div == 0)
    plain = [t for t in (f"p{i}" for i in range(100))
             if md5_hash64([t])[0] % div != 0][:6]
    texts = [
        " ".join(plain[:3] + [gated] + plain[3:5]),  # cut before gated
        gated + " " + plain[0],                       # gate at doc start
        " ".join(plain[:2]),                          # no cut: one chunk
        "",                                           # empty: no rows
    ]
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": texts})
    ds = ray.data.from_pandas(df).repartition(2)
    eng = (cdc_chunks(ds, divisor=4).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    d0 = eng[eng.doc_id == 0]
    assert d0["chunk_text"].tolist() == [
        " ".join(plain[:3]), gated + " " + " ".join(plain[3:5])]
    assert d0["chunk_idx"].tolist() == [0, 1]
    # gate on the very first token does not create an empty chunk
    d1 = eng[eng.doc_id == 1]
    assert d1["chunk_text"].tolist() == [gated + " " + plain[0]]
    assert len(eng[eng.doc_id == 3]) == 0
    # shift-robustness: prepending a paragraph leaves the gated-suffix
    # chunk identical (same digest)
    df2 = pd.DataFrame({"doc_id": [9], "text": [
        " ".join(plain[5:6] + plain[:3] + [gated] + plain[3:5])]})
    eng2 = cdc_chunks(ray.data.from_pandas(df2), divisor=4).to_pandas()
    assert d0["chunk_digest"].iloc[1] in set(eng2["chunk_digest"])

    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(cdc_chunks_sql(divisor=4)).df()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, sql)


def test_cdc_dup_rate():
    import duckdb

    from htrc_feature_reader_ray.stages.dedup import (
        cdc_dup_rate,
        cdc_dup_rate_sql,
        md5_hash64,
    )

    div = np.uint64(4)
    gated = [t for t in (f"w{i}" for i in range(200))
             if md5_hash64([t])[0] % div == 0][:2]
    plain = [t for t in (f"p{i}" for i in range(200))
             if md5_hash64([t])[0] % div != 0][:8]
    shared = " ".join(plain[:3])          # chunk shared by docs 0 and 1
    uniq_a = " ".join(plain[3:6])
    uniq_b = " ".join(plain[6:8])
    texts = [
        shared + " " + gated[0] + " " + uniq_a,   # chunks: shared | g+uniq_a
        shared + " " + gated[0] + " " + uniq_b,   # chunks: shared | g+uniq_b
        " ".join(plain[3:5]),                     # one unique chunk
    ]
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
    ds = ray.data.from_pandas(df).repartition(2)
    out = (cdc_dup_rate(ds, divisor=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_chunks"].tolist() == [2, 2, 1]
    assert out["n_dup_chunks"].tolist() == [1, 1, 0]
    assert out["dup_ppm"].tolist() == [500_000, 500_000, 0]

    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(cdc_dup_rate_sql(divisor=4)).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)


def test_jaccard_join_cross_col_incremental():
    """cross_col emits exactly the cross-side subset of the full join —
    on BOTH df paths — and never a same-side pair."""
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import jaccard_join

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(6, 24)))
             for _ in range(80)]
    texts[70] = texts[0]            # cross-side exact dup (sides 0/1 below)
    texts[71] = texts[1]            # same-side dup -> must NOT appear
    df = pd.DataFrame({"doc_id": range(80), "text": texts,
                       "side": [1 if i >= 70 else 0 for i in range(80)]})
    df.loc[71, "side"] = 0
    df.loc[1, "side"] = 0
    ds = ray.data.from_pandas(df).repartition(4)

    full = (jaccard_join(ds, threshold_ppm=400_000)
            .to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))
    side = df.set_index("doc_id")["side"]
    expect = full[
        side.loc[full["id_a"]].to_numpy()
        != side.loc[full["id_b"]].to_numpy()].reset_index(drop=True)

    for mode in ("broadcast", "join"):
        got = (jaccard_join(ds, threshold_ppm=400_000, cross_col="side",
                            df_mode=mode)
               .to_pandas().sort_values(["id_a", "id_b"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, expect)
        assert ((side.loc[got["id_a"]].to_numpy()
                 != side.loc[got["id_b"]].to_numpy()).all())
    assert ((expect["id_a"] == 0) & (expect["id_b"] == 70)).any()
    # the same-side dup exists in the FULL join but not in the cross set
    assert ((full["id_a"] == 1) & (full["id_b"] == 71)).any()
    assert not ((expect["id_a"] == 1) & (expect["id_b"] == 71)).any()


def test_dedup_loser_rate_hand_fixture():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import dedup_loser_rate

    clusters = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 7],
        "cluster_id": [1, 1, 1, 7],   # 2,3 lose to 1; 7 canonical alone
    }))
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 7, 8],
        "source": ["a", "a", "b", "b", "a", "b"],
    })).repartition(2)
    out = (dedup_loser_rate(clusters, docs).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert out["n_docs"].tolist() == [3, 3]
    assert out["n_dup_losers"].tolist() == [1, 1]   # a: doc 2; b: doc 3
    assert out["loser_ppm"].tolist() == [333_333, 333_333]


def test_doc_novelty():
    """Owner doc (min (md5_64(id), id)) keeps full credit for a shared
    shingle — including within-doc repeats — later copies lose it;
    zero-shingle docs report full novelty; SQL replay is identical."""
    import duckdb

    from htrc_feature_reader_ray.stages.dedup import (
        doc_novelty,
        doc_novelty_sql,
        md5_hash64,
    )

    shared = "a b c"           # the one 3-gram both twins contain
    texts = {
        0: shared + " x0 " + shared,    # shingles: 5, 'a b c' twice
        1: shared,                      # shingles: 1, the shared one
        2: "u v w t",                   # unique: 2 novel shingles
        3: "p q",                       # < n tokens: 0 shingles
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = ray.data.from_pandas(df).repartition(3)
    out = (doc_novelty(ds, n=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    h = md5_hash64(["0", "1"])
    owner = 0 if h[0] < h[1] else 1
    assert out["n_shingles"].tolist() == [5, 1, 2, 0]
    if owner == 0:
        # doc 0 owns 'a b c': both its occurrences novel + its 3 unique
        assert out["novel"].tolist() == [5, 0, 2, 0]
        assert out["novel_ppm"].tolist() == [1_000_000, 0,
                                             1_000_000, 1_000_000]
    else:
        assert out["novel"].tolist() == [3, 1, 2, 0]
        assert out["novel_ppm"].tolist() == [600_000, 1_000_000,
                                             1_000_000, 1_000_000]

    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(doc_novelty_sql(n=3)).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)


def test_source_overlap_exact_jaccard():
    from htrc_feature_reader_ray.stages.dedup import source_overlap

    # source A docs cover shingles {abc, bcd}, B = {abc, bcd} + {xyz},
    # C disjoint
    df = pd.DataFrame({
        "source": ["A", "A", "B", "B", "C"],
        "text": [
            "a b c d",          # A: shingles 'a b c','b c d'
            "a b c",            # A: 'a b c' (dup within source)
            "a b c d",          # B: same two
            "x y z",            # B: 'x y z'
            "q r s",            # C: 'q r s'
        ],
    })
    out = source_overlap(
        ray.data.from_pandas(df).repartition(3)).to_pandas()
    got = {(a, b): (n, j) for a, b, n, j in zip(
        out["source_a"], out["source_b"], out["n_shared"],
        out["jaccard_ppm"])}
    # |A|=2, |B|=3, inter=2 -> J = 2/3
    assert got[("A", "B")] == (2, 2 * 1_000_000 // 3)
    assert ("A", "C") not in got and ("B", "C") not in got


def test_source_overlap_short_doc_fallback_and_empty():
    from htrc_feature_reader_ray.stages.dedup import source_overlap

    df = pd.DataFrame({
        "source": ["A", "B"],
        "text": ["hi there", "hi there"],  # <3 tokens -> whole-text shingle
    })
    out = source_overlap(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["jaccard_ppm"] == 1_000_000
    # fully disjoint corpus -> typed empty result
    df2 = pd.DataFrame({"source": ["A", "B"], "text": ["a a a", "b b b"]})
    out2 = source_overlap(ray.data.from_pandas(df2)).to_pandas()
    assert len(out2) == 0


def test_dup_weights_multiplicity():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import dup_weights

    docs = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64)})
    # pairs: {0,1,2} one cluster, {3,4} another; 5 singleton
    pairs = pd.DataFrame({"doc_a": [0, 1, 3], "doc_b": [1, 2, 4]})
    out = dup_weights(ray.data.from_pandas(docs).repartition(3),
                      ray.data.from_pandas(pairs)).to_pandas(
    ).set_index("doc_id").sort_index()
    assert list(out["cluster_size"]) == [3, 3, 3, 2, 2, 1]
    assert list(out["weight_ppm"]) == [333333, 333333, 333333,
                                       500000, 500000, 1_000_000]


def test_daily_novelty_first_seen_semantics():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import daily_novelty

    d0 = pd.Timestamp("2024-01-01")
    rows = [
        ("aaa", d0), ("bbb", d0),                 # day0: 2 new
        ("aaa", d0 + pd.Timedelta(hours=3)),      # same digest same day
        ("aaa", d0 + pd.Timedelta(days=1)),       # day1: seen before
        ("ccc", d0 + pd.Timedelta(days=1)),       # day1: new
        ("bbb", d0 + pd.Timedelta(days=2)),       # day2: 0 new
    ]
    df = pd.DataFrame(rows, columns=["text", "warc_ts"])
    out = daily_novelty(
        ray.data.from_pandas(df).repartition(3)).to_pandas(
    ).set_index("day")
    day0 = (d0.value // 1000) // 86_400_000_000
    assert out.loc[day0, "n_digests"] == 2 and out.loc[day0, "n_new"] == 2
    assert out.loc[day0, "novelty_ppm"] == 1_000_000
    assert out.loc[day0 + 1, "n_digests"] == 2
    assert out.loc[day0 + 1, "n_new"] == 1
    assert out.loc[day0 + 1, "novelty_ppm"] == 500_000
    assert out.loc[day0 + 2, "n_new"] == 0


def test_dedup_cluster_sizes_hand():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import dedup_cluster_sizes

    # clusters: {1:3 members, 10:2, 20:2} -> sizes {3:1, 2:2}
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 10, 11, 20, 21], dtype=np.int64),
        "cluster_id": np.array([1, 1, 1, 10, 10, 20, 20],
                               dtype=np.int64),
    })
    out = (dedup_cluster_sizes(ray.data.from_pandas(df).repartition(4))
           .to_pandas().sort_values("size").reset_index(drop=True))
    assert list(out["size"]) == [2, 3]
    assert list(out["n_clusters"]) == [2, 1]


def test_remove_duplicated_spans_paths_and_semantics():
    """APPLY half of exact-substring dedup: broadcast == join,
    n_removed == duplicated_spans' dup_tokens, fully-duplicated docs
    empty out, no duplicated window survives in any clean_text."""
    from htrc_feature_reader_ray.stages.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    rng = np.random.RandomState(7)
    boiler = "the quick brown fox jumps over the lazy dog"
    texts = []
    for i in range(150):
        parts = [f"u{i}x{j}" for j in range(rng.randint(0, 15))]
        if i % 3 == 0:
            parts = parts[:3] + boiler.split() + parts[3:]
        texts.append(" ".join(parts))
    texts += ["", boiler]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df).repartition(5)

    spans = (duplicated_spans(ds, width=5, min_docs=2).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    b = (remove_duplicated_spans(ds, width=5, min_docs=2,
                                 distribute="broadcast").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    j = (remove_duplicated_spans(ds, width=5, min_docs=2,
                                 distribute="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert b.equals(j)
    assert (b["n_removed"].to_numpy()
            == spans["dup_tokens"].to_numpy()).all()
    assert int(b["n_removed"].sum()) > 0
    last = b[b["doc_id"] == len(texts) - 1].iloc[0]
    assert last["clean_text"] == ""  # entirely duplicated text
    assert int(last["n_removed"]) == len(boiler.split())
    assert not any(boiler in t for t in b["clean_text"])
    # survivors keep original relative order
    row = b[b["doc_id"] == 0].iloc[0]
    kept = row["clean_text"].split()
    orig = [t for t in texts[0].split() if t in set(kept)]
    assert kept == orig


def test_source_overlap_null_source_rows_excluded():
    """r5 regression (code-review find): NULL sources must not corrupt
    the overlap matrix — rows with no feed identity are excluded by
    contract (and the vectorized dedup no longer chokes on null
    dictionary codes becoming self-unequal NaNs)."""
    from htrc_feature_reader_ray.stages.dedup import source_overlap

    df = pd.DataFrame({
        "source": [None, None, "A", "B"],
        "text": ["a b c d", "a b c d", "a b c d", "a b c d"],
    })
    out = source_overlap(ray.data.from_pandas(df)).to_pandas()
    # only the (A, B) pair: identical shingle sets -> J = 1.0; the NULL
    # docs contribute nothing (no phantom group, no inflated counts)
    assert len(out) == 1
    assert out["source_a"].iloc[0] == "A" and out["source_b"].iloc[0] == "B"
    assert int(out["n_shared"].iloc[0]) == 2
    assert int(out["jaccard_ppm"].iloc[0]) == 1_000_000
