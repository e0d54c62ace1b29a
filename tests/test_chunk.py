import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.stages.chunk import (
    chunk_labels_ends,
    chunk_labels_even,
    chunk_labels_last,
    chunk_units,
    chunked_tokenlist,
)
from htrc_feature_reader_ray.stages.extract import tokens_from_pages


def sizes(labels, weights):
    return pd.Series(weights).groupby(pd.Series(labels)).sum()


def test_even_uniform_perfect_split():
    """F7: 1000 unit pages, target 100 -> every chunk exactly 100."""
    labels = chunk_labels_even(np.ones(1000), 100)
    s = sizes(labels, np.ones(1000))
    assert len(s) == 10
    assert (s == 100).all()
    assert (np.diff(labels) >= 0).all()  # monotone


def test_last_uniform_perfect_split():
    labels = chunk_labels_last(np.ones(1000), 100)
    s = sizes(labels, np.ones(1000))
    assert len(s) == 10
    assert (s == 100).all()


def test_ends_uniform_and_overflow():
    # perfect split: behaves like the other strategies
    labels = chunk_labels_ends(np.ones(1000), 100)
    s = sizes(labels, np.ones(1000))
    assert len(s) == 10 and (s == 100).all()
    # overflow of 40 splits between the first and last chunks (~20 each);
    # interior chunks stay exactly at target
    w = np.ones(1040)
    labels = chunk_labels_ends(w, 100)
    s = sizes(labels, w)
    assert len(s) == 10
    assert (s.iloc[1:-1] == 100).all()
    assert s.iloc[0] + s.iloc[-1] == 240
    assert abs(s.iloc[0] - s.iloc[-1]) <= 1


def test_even_giant_last_page_terminates_bounded():
    """F7: giant last page (reference infinite-loop regression shape)."""
    w = np.ones(1000)
    w[-1] = 500
    labels = chunk_labels_even(w, 100)
    s = sizes(labels, w)
    assert s.max() <= 600  # giant page dominates one chunk
    assert s.min() >= 50
    assert labels[-1] == labels.max()


def test_even_giant_middle_page():
    w = np.ones(1000)
    w[500] = 500
    labels = chunk_labels_even(w, 100)
    s = sizes(labels, w)
    assert s.max() <= 501 + 100


def test_pages_larger_than_target_each_own_chunk():
    """F7: [500]*10 with target 100 -> 10 chunks of 500."""
    w = np.full(10, 500)
    labels = chunk_labels_even(w, 100)
    assert labels.tolist() == list(range(1, 11))
    labels2 = chunk_labels_last(w, 100)
    assert labels2.tolist() == list(range(1, 11))


def test_statistical_bounds_random():
    rng = np.random.RandomState(7)
    w = rng.randint(50, 400, size=200)
    for fn in (chunk_labels_even, chunk_labels_last):
        labels = fn(w, 1000)
        s = sizes(labels, w)
        assert abs(s.mean() - 1000) < 1000 / 3
        assert s.iloc[1:-1].max() <= 1000 + w.max()
        assert s.iloc[1:-1].min() >= 1000 / 4


def test_chunk_units_dataset_parity_with_local():
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], 50),
            "ord": np.tile(np.arange(50), 2),
            "w": np.concatenate([np.ones(50), np.full(50, 3)]).astype(np.int64),
        }
    )
    out = (
        chunk_units(
            ray.data.from_pandas(df), key="k", order="ord", weight_col="w",
            target=10, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "ord"])
        .reset_index(drop=True)
    )
    for k, grp in df.groupby("k"):
        expect = chunk_labels_even(grp["w"].to_numpy(), 10)
        got = out[out["k"] == k].sort_values("ord")["chunk"].to_numpy()
        assert (got == expect).all()


def test_chunked_tokenlist_conserves_counts(sf_dir):
    tokens = tokens_from_pages(sf_dir, via_html=False).materialize()
    total = tokens.to_pandas()["count"].sum()
    out = chunked_tokenlist(
        tokens, target=40, page_ref=True, num_buckets=8
    ).to_pandas()
    assert out["count"].sum() == total
    assert {"url", "chunk", "token", "count", "ts_start", "ts_end"} <= set(out.columns)
    assert (out["ts_start"] <= out["ts_end"]).all()
    # chunk labels start at 1 per url
    assert out.groupby("url")["chunk"].min().eq(1).all()


def test_chunk_bounds_unique_under_tiny_blocks():
    """chunk_bounds must emit exactly one row per (url, chunk) even when the
    input arrives as many tiny blocks (the re-slicing that broke the old
    per-batch drop_duplicates derivation)."""
    import pandas as pd
    from htrc_feature_reader_ray.stages.chunk import chunk_bounds

    rows = []
    for u in range(6):
        for s in range(10):
            for t in range(5):
                rows.append(
                    {
                        "url": f"u{u}",
                        "warc_ts": pd.Timestamp(2024, 1, 1)
                        + pd.Timedelta(hours=s),
                        "section": "body",
                        "token": f"tok{t}",
                        "count": 3,
                    }
                )
    df = pd.DataFrame(rows)
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    ds = ray.data.from_pandas(df).repartition(40)  # tiny blocks
    out = chunk_bounds(ds, target=30, num_buckets=4).to_pandas()
    assert not out.duplicated(["url", "chunk"]).any()
    # pandas recompute: per-snapshot weight 15, n_chunks = round(150/30) = 5
    expect = (
        df.groupby(["url", "warc_ts"], as_index=False)["count"].sum()
    )
    assert len(out) == 6 * 5
    assert (out.groupby("url")["chunk"].max() == 5).all()
    # bounds are consistent: ts_start <= ts_end, contiguous per url
    assert (out["ts_start"] <= out["ts_end"]).all()


# ---- reference-exact conformance mode (transformations.py:57-156) ----
# adversarial cases ported from the reference's test_chunking.py:29-77

def _sizes(labels, counts):
    from collections import Counter

    c = Counter()
    for lab, cnt in zip(labels, counts):
        c[lab] += cnt
    return c


def test_reference_even_chunking_uniform():
    from collections import Counter
    from htrc_feature_reader_ray.stages.chunk import chunk_labels_reference

    counts = np.ones(1000)
    for variant in ("even", "last", "ends"):
        c = _sizes(chunk_labels_reference(counts, 100, variant), counts)
        assert Counter(c.values()) == Counter({100: 10}), variant


def test_reference_asymmetric_end():
    from htrc_feature_reader_ray.stages.chunk import chunk_labels_reference

    counts = np.ones(1000)
    counts[-1] = 500
    for variant in ("even", "last", "ends"):
        c = _sizes(chunk_labels_reference(counts, 100, variant), counts)
        assert max(c.values()) == 500, variant
        assert min(c.values()) == 99, variant


def test_reference_giant_middle_page():
    from htrc_feature_reader_ray.stages.chunk import chunk_labels_reference

    counts = np.ones(1000)
    counts[500] = 500
    for variant in ("even", "last", "ends"):
        c = _sizes(chunk_labels_reference(counts, 100, variant), counts)
        assert max(c.values()) <= 501, variant


def test_reference_tiny_target():
    from htrc_feature_reader_ray.stages.chunk import chunk_labels_reference

    counts = np.array([500.0] * 10)
    for variant in ("even", "last", "ends"):
        c = _sizes(chunk_labels_reference(counts, 100, variant), counts)
        assert max(c.values()) == 500, variant


def test_reference_labels_monotone_consecutive():
    from htrc_feature_reader_ray.stages.chunk import chunk_labels_reference

    rng = np.random.RandomState(5)
    for _ in range(20):
        counts = rng.randint(1, 200, size=rng.randint(1, 60)).astype(float)
        for variant in ("even", "last", "ends"):
            labs = chunk_labels_reference(counts, 75, variant)
            assert (np.diff(labs) >= 0).all()
            assert labs[0] == 1
            assert set(np.diff(labs)) <= {0, 1}


def test_reference_strategy_in_chunk_units():
    """strategy='reference_even' flows through the bucketed Dataset op and
    matches the scalar kernel per key."""
    import pandas as pd
    from htrc_feature_reader_ray.stages.chunk import (
        chunk_labels_reference,
        chunk_units,
    )

    rng = np.random.RandomState(11)
    rows = []
    for u in range(5):
        for s in range(30):
            rows.append(
                {
                    "user_id": u,
                    "ts": pd.Timestamp(2024, 1, 1) + pd.Timedelta(hours=s),
                    "wt": int(rng.randint(1, 120)),
                }
            )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    out = chunk_units(
        ray.data.from_pandas(df), key="user_id", order="ts", weight_col="wt",
        target=100, strategy="reference_even", num_buckets=3,
    ).to_pandas()
    for u, g in out.groupby("user_id"):
        g = g.sort_values("ts")
        expect = chunk_labels_reference(
            g["wt"].to_numpy(dtype=float), 100, "even"
        )
        assert g["chunk"].tolist() == expect.tolist(), u


def test_token_windows_vs_sql_mirror():
    import duckdb

    from htrc_feature_reader_ray.stages.chunk import (
        token_windows,
        token_windows_sql,
    )

    rows = []
    rng = np.random.default_rng(3)
    for i in range(60):
        n = int(rng.integers(0, 25))
        # irregular whitespace + empty docs exercise the filter convention
        toks = [f"w{int(rng.integers(0, 9))}" for _ in range(n)]
        rows.append({"doc_id": i, "text": "  ".join(toks) if i % 7 else ""})
    ds = ray.data.from_items(rows).repartition(5)
    out = (
        token_windows(ds, width=6, stride=4)
        .to_pandas()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_df", pd.DataFrame(rows))
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_df")
    exp = (
        con.execute(token_windows_sql(width=6, stride=4))
        .df()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)
    assert (out.n_tok > 0).all()
    assert (out.n_tok <= 6).all()


def test_token_windows_tiling_and_empty():
    from htrc_feature_reader_ray.stages.chunk import token_windows

    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a b c d e f g h"},  # 8 toks
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "x"},
        ]
    )
    # default stride == width: exact tiling, last window truncated
    out = (
        token_windows(ds, width=3)
        .to_pandas()
        .sort_values(["doc_id", "window_id"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert d1.window_text.tolist() == ["a b c", "d e f", "g h"]
    assert d1.start_tok.tolist() == [0, 3, 6]
    assert d1.n_tok.tolist() == [3, 3, 2]
    assert (out.doc_id == 2).sum() == 0  # empty doc emits nothing
    d3 = out[out.doc_id == 3]
    assert d3.window_text.tolist() == ["x"] and d3.n_tok.tolist() == [1]


def test_length_buckets_exact_powers_and_waste():
    from htrc_feature_reader_ray.stages.pack import length_buckets

    lens = np.array([0, 1, 2, 3, 4, 5, 8, 9, 1024, 1025], dtype=np.int64)
    df = pd.DataFrame({"n_tokens": lens})
    out = length_buckets(
        ray.data.from_pandas(df).repartition(4), weight_col="n_tokens"
    ).to_pandas().set_index("bucket")
    # power-of-2 boundary exactness: 4 -> 4 (not 8), 1024 -> 1024
    assert out.loc[4, "n_seqs"] == 2 and out.loc[4, "sum_tokens"] == 7
    assert out.loc[1024, "n_seqs"] == 1
    assert out.loc[2048, "n_seqs"] == 1  # 1025 spills up
    # lens 0 and 1 share bucket 1
    assert out.loc[1, "n_seqs"] == 2 and out.loc[1, "sum_tokens"] == 1
    # exact waste: bucket 4 pads 2 seqs to 8 slots holding 7 tokens
    assert out.loc[4, "waste_ppm"] == (8 - 7) * 1_000_000 // 8
    assert out.loc[1, "waste_ppm"] == (2 - 1) * 1_000_000 // 2
    # zero-waste bucket: exactly-full
    assert out.loc[1024, "waste_ppm"] == 0


def test_truncation_loss_exact():
    from htrc_feature_reader_ray.stages.pack import truncation_loss

    lens = np.array([10, 100, 300, 5], dtype=np.int64)  # total 415
    df = pd.DataFrame({"n_tokens": lens})
    out = truncation_loss(
        ray.data.from_pandas(df).repartition(3), weight_col="n_tokens",
        lengths=(64, 256)).to_pandas().set_index("max_len")
    # L=64: lose (100-64)+(300-64)=272 from 2 docs
    assert out.loc[64, "n_trunc"] == 2
    assert out.loc[64, "lost_tokens"] == 272
    assert out.loc[64, "loss_ppm"] == 272 * 1_000_000 // 415
    # L=256: lose 44 from 1 doc
    assert out.loc[256, "n_trunc"] == 1
    assert out.loc[256, "lost_tokens"] == 44
