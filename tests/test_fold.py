import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from htrc_feature_reader_ray.errors import MissingFieldError
from htrc_feature_reader_ray.sources.pages import PAGES_SQL, SECTIONS_SQL
from htrc_feature_reader_ray.functions.tokenize import POS_SQL
from htrc_feature_reader_ray.stages.extract import tokens_from_pages
from htrc_feature_reader_ray.stages.fold import (
    distinct_tokens,
    fold_tokenlist,
    term_freqs_topk,
)
from tests.util import assert_frames_match

TOK_SQL = f"""
WITH {PAGES_SQL.strip()}, {SECTIONS_SQL.strip()},
tok AS (
    SELECT url, warc_ts, section, t.token
    FROM sections, unnest(string_split(sect_text, ' ')) AS t(token)
    WHERE t.token != ''
),
tokpos AS (
    SELECT url, warc_ts, section, token, {POS_SQL.format(tok='token')} AS pos
    FROM tok
)
"""


@pytest.fixture(scope="module")
def tokens_ds(sf_dir):
    return tokens_from_pages(sf_dir, via_html=False).materialize()


def _tiny_tokens():
    return ray.data.from_arrow(
        pa.table(
            {
                "url": ["u1", "u1", "u1", "u2"],
                "warc_ts": pa.array([1, 1, 2, 1], type=pa.timestamp("us")),
                "section": ["body", "body", "body", "header"],
                "token": ["Dog", "dog", "Dog", "cat"],
                "pos": ["NNP", "NN", "NNP", "NN"],
                "count": pa.array([2, 1, 3, 5], type=pa.int64()),
            }
        )
    )


def test_full_tokenlist_parity(tokens_ds, duck):
    got = fold_tokenlist(tokens_ds)
    oracle = duck.execute(
        TOK_SQL
        + """
        SELECT url, warc_ts, section, token, pos, count(*)::BIGINT AS count
        FROM tokpos GROUP BY ALL
        """
    ).df()
    assert_frames_match(got, oracle)


def test_case_fold_parity(tokens_ds, duck):
    got = fold_tokenlist(tokens_ds, case=False, pos=False)
    oracle = duck.execute(
        TOK_SQL
        + """
        SELECT url, warc_ts, section, lower(token) AS lowercase,
               count(*)::BIGINT AS count
        FROM tokpos GROUP BY ALL
        """
    ).df()
    assert_frames_match(got, oracle)


def test_section_group_and_body_filter(tokens_ds, duck):
    got = fold_tokenlist(tokens_ds, section="group", pos=False)
    oracle = duck.execute(
        TOK_SQL
        + "SELECT url, warc_ts, token, count(*)::BIGINT AS count FROM tokpos GROUP BY ALL"
    ).df()
    assert_frames_match(got, oracle)

    got_body = fold_tokenlist(
        tokens_ds, section="body", pos=False, drop_section=True
    )
    oracle_body = duck.execute(
        TOK_SQL
        + "SELECT url, warc_ts, token, count(*)::BIGINT AS count "
        "FROM tokpos WHERE section = 'body' GROUP BY ALL"
    ).df()
    assert_frames_match(got_body, oracle_body)


def test_snapshots_fold_corpus_parity(tokens_ds, duck):
    got = fold_tokenlist(
        tokens_ds, snapshots=False, section="group", pos=False
    )
    oracle = duck.execute(
        TOK_SQL + "SELECT url, token, count(*)::BIGINT AS count FROM tokpos GROUP BY ALL"
    ).df()
    assert_frames_match(got, oracle)


def test_page_freq_semantics():
    ds = _tiny_tokens()
    # presence per snapshot
    out = (
        fold_tokenlist(ds, section="group", pos=False, page_freq=True)
        .to_pandas()
    )
    assert set(out["count"]) == {1}
    # snapshot frequency when snapshots folded: Dog appears in 2 snapshots of u1
    out2 = (
        fold_tokenlist(
            ds, snapshots=False, section="group", pos=False, page_freq=True
        )
        .to_pandas()
        .set_index(["url", "token"])["count"]
        .to_dict()
    )
    assert out2[("u1", "Dog")] == 2
    assert out2[("u1", "dog")] == 1
    assert out2[("u2", "cat")] == 1


def test_missing_field_discipline():
    ds = _tiny_tokens().select_columns(["url", "warc_ts", "token", "count"])
    # section missing -> ignored (reference behavior)
    out = fold_tokenlist(ds, section="all", pos=False).to_pandas()
    assert "section" not in out.columns
    # pos missing -> MissingFieldError
    with pytest.raises(MissingFieldError):
        fold_tokenlist(ds, pos=True)
    # case missing is fine (derived); token missing with case=True raises
    ds2 = _tiny_tokens().select_columns(["url", "warc_ts", "pos", "count"])
    with pytest.raises(MissingFieldError):
        fold_tokenlist(ds2, pos=True)


def test_chunk_as_snapshot_col():
    """Chunked lakes are first-class: chunk replaces warc_ts
    (feature_reader.py:676-681 analog)."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": ["u1", "u1"],
                "chunk": pa.array([1, 1], type=pa.int64()),
                "token": ["a", "a"],
                "count": pa.array([1, 2], type=pa.int64()),
            }
        )
    )
    out = fold_tokenlist(
        ds, snapshot_col="chunk", pos=False
    ).to_pandas()
    assert out["count"].tolist() == [3]


def test_distinct_tokens_min_count(tokens_ds, duck):
    got = distinct_tokens(tokens_ds, min_count=100, case=False)
    oracle = duck.execute(
        TOK_SQL
        + """
        SELECT lowercase, count FROM (
          SELECT lower(token) AS lowercase, count(*)::BIGINT AS count
          FROM tokpos GROUP BY 1
        ) WHERE count >= 100
        """
    ).df()
    assert_frames_match(got, oracle)


def test_term_freqs_topk(tokens_ds, duck):
    got = term_freqs_topk(tokens_ds, k=10)
    oracle = duck.execute(
        TOK_SQL
        + """
        SELECT token, count(*)::BIGINT AS count FROM tokpos GROUP BY 1
        ORDER BY count DESC, token ASC LIMIT 10
        """
    ).df()
    assert_frames_match(got, oracle)


def test_top_k_per_group_vs_sql_ties_and_shape():
    import duckdb

    from htrc_feature_reader_ray.stages.fold import topk_per_group

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "g": rng.choice(["en", "de", "fr"], 300),
        "v": rng.integers(0, 20, 300).astype(np.int64),  # heavy ties
    })
    ds = ray.data.from_pandas(df).repartition(7)
    out = (
        topk_per_group(ds, group_cols=["g"], sort_col="v", k=4,
                       tie_cols=["doc_id"], rank_col="rank_in_group",
                       num_buckets=4)
        .to_pandas().sort_values(["g", "rank_in_group"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH r AS (
          SELECT doc_id, g, v,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY v DESC, doc_id)::BIGINT
                   AS rank_in_group
          FROM t)
        SELECT * FROM r WHERE rank_in_group <= 4
        ORDER BY g, rank_in_group
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "g", "v", "rank_in_group"]], exp, check_dtype=True)
    # ascending variant returns the k smallest
    asc = (
        topk_per_group(ds, group_cols=["g"], sort_col="v", k=1,
                       descending=False, tie_cols=["doc_id"],
                       rank_col="rank_in_group", num_buckets=4)
        .to_pandas()
    )
    assert (asc.groupby("g").v.max() == df.groupby("g").v.min()).all()


def test_collect_sorted_order_and_tie_rejection():
    import pandas as pd
    import pytest
    import ray.data

    from htrc_feature_reader_ray.stages.fold import collect_sorted

    df = pd.DataFrame({
        "k": ["a", "a", "b", "a"],
        "o": [3, 1, 5, 2],
        "v": ["x", "y", "z", "w"],
    })
    out = collect_sorted(
        ray.data.from_pandas(df).repartition(3),
        key="k", order_col="o", value_col="v",
    ).to_pandas().set_index("k")["collected"]
    assert out.loc["a"] == "y|w|x"   # ordered by o, not input order
    assert out.loc["b"] == "z"

    dup = pd.DataFrame({"k": ["a", "a"], "o": [1, 1], "v": ["p", "q"]})
    with pytest.raises(Exception, match="ties"):
        collect_sorted(ray.data.from_pandas(dup), key="k", order_col="o",
                       value_col="v").materialize()
