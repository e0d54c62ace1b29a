"""Empty/degenerate-input robustness: every batch kernel must handle 0-row
tables (Ray delivers them after selective filters) and single-row groups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.pipelines.flagship import page_features_batch
from htrc_feature_reader_ray.stages.chunk import chunk_labels_even, chunk_labels_last
from htrc_feature_reader_ray.stages.dedup import MinHasher, simhash_batch
from htrc_feature_reader_ray.stages.extract import (
    HtmlExtractor,
    token_counts_batch,
)


def _empty_pages():
    return pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "warc_ts": pa.array([], type=pa.timestamp("us")),
            "lang": pa.array([], type=pa.string()),
            "header": pa.array([], type=pa.string()),
            "body": pa.array([], type=pa.string()),
            "footer": pa.array([], type=pa.string()),
        }
    )


def test_token_counts_empty_batch():
    out = token_counts_batch(_empty_pages())
    assert out.num_rows == 0
    assert out.column_names == ["url", "warc_ts", "section", "token", "pos", "count"]


def test_page_features_empty_batch():
    out = page_features_batch(_empty_pages())
    assert out.num_rows == 0


def test_extractor_empty_and_malformed():
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
            "lang": ["en", "en"],
            "html": pa.array([b"", b"<html>no zones</html>"], type=pa.binary()),
        }
    )
    out = HtmlExtractor()(batch)
    assert out.column("text").to_pylist() == ["", ""]


def test_chunk_labels_degenerate():
    assert chunk_labels_even(np.array([]), 100).tolist() == []
    assert chunk_labels_even(np.array([0, 0, 0]), 100).tolist() == [1, 1, 1]
    assert chunk_labels_last(np.array([5]), 100).tolist() == [1]


def test_minhash_empty_text():
    mh = MinHasher()
    sigs = mh.signatures_batch(["", "a b c d e"])
    assert sigs.shape == (2, 64)
    assert (sigs[0] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    out = mh(pa.table({"doc_id": pa.array([1, 2]), "text": ["", "a b c"]}))
    assert out.num_rows == 2 * mh.bands


def test_simhash_empty_text():
    h = simhash_batch(["", "x"])
    assert h[0] == 0


def test_sessionize_single_event_per_user():
    from htrc_feature_reader_ray.stages.temporal import sessionize

    df = pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
                "datetime64[us]"
            ),
        }
    )
    out = sessionize(
        ray.data.from_pandas(df), key="user_id", ts="ts", gap="30m",
        num_buckets=2, aggregate=True,
    ).to_pandas()
    assert len(out) == 2
    assert (out["session_id"] == 1).all()
    assert (out["n_events"] == 1).all()


def test_metadata_extract_empty_batch():
    from htrc_feature_reader_ray.stages.metadata import extract_metadata_batch

    batch = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "meta_json": pa.array([], type=pa.string()),
        }
    )
    out = extract_metadata_batch(batch)
    assert out.num_rows == 0
    assert "genre" in out.column_names


def test_profile_empty_dataset():
    from htrc_feature_reader_ray.stages.profile import (
        exact_quantiles,
        numeric_profile,
    )

    ds = ray.data.from_arrow(pa.table({"v": pa.array([], type=pa.int64())}))
    assert exact_quantiles(ds, "v").empty
    assert numeric_profile(ds, "v").empty


def test_chunk_labels_reference_degenerate():
    from htrc_feature_reader_ray.stages.chunk import chunk_labels_reference

    for variant in ("even", "last", "ends"):
        assert chunk_labels_reference(np.array([]), 100, variant).tolist() == []
        assert chunk_labels_reference(np.array([5.0]), 100, variant).tolist() == [1]


def test_simhash_and_md5_empty():
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    assert simhash_batch([]).tolist() == []
    assert md5_hash64([]).tolist() == []


def test_embedding_dedup_triangle_empty():
    from htrc_feature_reader_ray.stages.dedup import embedding_dedup_pairs

    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float64())),
            }
        )
    )
    out = embedding_dedup_pairs(ds, threshold=0.9, method="broadcast").to_pandas()
    assert out.empty


def _empty_docs():
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
        }
    )


def test_curate_kernels_empty_batch():
    """The curation batch kernels must pass 0-row tables through."""
    from htrc_feature_reader_ray.stages.curate import (
        contamination_flags,
        redact_pii,
        repetition_stats,
        term_frequencies,
    )

    ds = ray.data.from_arrow(_empty_docs())
    assert term_frequencies(ds).count() == 0
    assert redact_pii(ds).count() == 0
    assert repetition_stats(ds).count() == 0
    assert contamination_flags(ds, ["x"]).count() == 0


def test_tfidf_empty_corpus():
    from htrc_feature_reader_ray.stages.curate import tfidf

    ds = ray.data.from_arrow(_empty_docs())
    assert tfidf(ds, n_docs=0).count() == 0


def test_pack_sequences_empty():
    from htrc_feature_reader_ray.stages.pack import pack_sequences

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
    )
    out = pack_sequences(ds, weight_col="n_tokens", id_col="doc_id",
                         budget=128, id_bounds=(0, 0), num_buckets=4)
    assert out.count() == 0


def test_approx_distinct_empty():
    from htrc_feature_reader_ray.stages.sketch import approx_distinct

    ds = ray.data.from_arrow(
        pa.table({"g": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.int64())})
    )
    assert approx_distinct(ds, group_cols=["g"], value_col="v").count() == 0


def test_grouped_profile_empty():
    from htrc_feature_reader_ray.stages.profile import grouped_profile

    ds = ray.data.from_arrow(
        pa.table({"g": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.int64())})
    )
    assert grouped_profile(ds, group_cols=["g"], col="v").count() == 0


def test_interval_join_empty_sides():
    from htrc_feature_reader_ray.stages.temporal import interval_join

    pts = ray.data.from_arrow(
        pa.table({"k": pa.array([], type=pa.int64()),
                  "ts": pa.array([], type=pa.timestamp("us"))})
    )
    ivs = ray.data.from_arrow(
        pa.table({"k": pa.array([], type=pa.int64()),
                  "lo": pa.array([], type=pa.timestamp("us")),
                  "hi": pa.array([], type=pa.timestamp("us"))})
    )
    assert interval_join(pts, ivs, on="k", ts="ts", start="lo",
                         end="hi").count() == 0


def test_mixture_sample_empty_and_no_matching_strata():
    from htrc_feature_reader_ray.stages.sample import mixture_sample

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "lang": pa.array([], type=pa.string())})
    )
    assert mixture_sample(empty, stratum_col="lang", id_col="doc_id",
                          fractions={"en": 0.5}).count() == 0
    only_zh = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "lang": ["zh", "zh"]})
    )
    assert mixture_sample(only_zh, stratum_col="lang", id_col="doc_id",
                          fractions={"en": 0.5}).count() == 0


def test_null_text_never_aborts_text_ops():
    """Real corpora carry null text fields; every text op must either pass
    nulls through or treat them as empty text — never crash the pass."""
    from htrc_feature_reader_ray.stages.curate import (
        ngram_top,
        redact_pii,
        repetition_stats,
        term_frequencies,
        tfidf,
    )
    from htrc_feature_reader_ray.stages.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
        simhash,
    )
    from htrc_feature_reader_ray.stages.textstats import (
        fingerprint,
        langid,
        quality_score,
        token_count,
    )

    tbl = pa.table(
        {"doc_id": [0, 1, 2], "text": ["hello world", None, "a b c"]}
    )

    def ds():
        return ray.data.from_arrow(tbl)

    assert token_count(ds()).count() == 3
    assert quality_score(ds()).count() == 3
    assert langid(ds()).count() == 3
    fp = fingerprint(ds()).to_pandas().sort_values("doc_id")
    assert fp["fp"].notna().all()
    dd = exact_dedup(ds()).to_pandas()
    assert len(dd) == 3  # null text fingerprints like empty text
    assert simhash(ds()).count() == 3
    assert minhash_dedup_pairs(ds(), corpus_rows=3).count() == 0
    assert term_frequencies(ds()).count() == 5
    assert repetition_stats(ds()).count() == 3
    assert redact_pii(ds()).count() == 3
    assert ngram_top(ds()).count() == 3
    assert tfidf(ds(), n_docs=3).count() == 5


def test_null_and_empty_text_share_a_fingerprint():
    from htrc_feature_reader_ray.stages.dedup import exact_dedup

    tbl = pa.table({"doc_id": [0, 1], "text": [None, ""]})
    out = exact_dedup(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 1 and out.iloc[0].n_dups == 2


def test_round2_late_ops_empty_corpus():
    """The late-round operators over an empty documents table: no crashes,
    empty outputs with stable schemas."""
    from htrc_feature_reader_ray.stages.dedup import cdc_dup_rate, jaccard_join
    from htrc_feature_reader_ray.stages.extract import html_tables
    from htrc_feature_reader_ray.stages.textstats import mojibake_stats
    from htrc_feature_reader_ray.stages.urltools import parse_sitemaps
    from htrc_feature_reader_ray.stages.vocab import vocab_growth

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
    }))
    assert mojibake_stats(docs).to_pandas().empty
    assert vocab_growth(docs, checkpoint=10).to_pandas().empty
    assert cdc_dup_rate(docs).to_pandas().empty
    assert jaccard_join(docs).to_pandas().empty
    assert jaccard_join(docs, df_mode="join").to_pandas().empty

    pages = ray.data.from_arrow(pa.table({
        "url": pa.array([], type=pa.string()),
        "html": pa.array([], type=pa.string()),
    }))
    assert html_tables(pages).to_pandas().empty

    sm = ray.data.from_arrow(pa.table({
        "host": pa.array([], type=pa.string()),
        "sitemap_xml": pa.array([], type=pa.string()),
    }))
    assert parse_sitemaps(sm).to_pandas().empty


def test_round2_late_ops_empty_graph_and_vectors():
    from htrc_feature_reader_ray.stages.linkgraph import label_communities
    from htrc_feature_reader_ray.stages.similarity import embedding_covariance

    edges = ray.data.from_arrow(pa.table({
        "src_url": pa.array([], type=pa.string()),
        "dst_url": pa.array([], type=pa.string()),
    }))
    assert label_communities(edges).to_pandas().empty

    vecs = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    }))
    assert embedding_covariance(vecs).to_pandas().empty
