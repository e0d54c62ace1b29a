import pandas as pd
import ray.data

from htrc_feature_reader_ray.stages.textstats import (
    FINGERPRINT_SQL,
    TOKEN_COUNT_SQL,
    fingerprint,
    langid,
    langid_sql,
    quality_score,
    quality_score_sql,
    token_count,
)
from tests.util import assert_frames_match

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs():
    return ray.data.read_parquet(DOCS, columns=["doc_id", "text"])


def test_token_count_parity(duck):
    got = token_count(_docs())
    oracle = duck.execute(
        f"SELECT doc_id, {TOKEN_COUNT_SQL.format(text='text')} AS n_tokens "
        "FROM documents"
    ).df()
    assert_frames_match(got, oracle)


def test_quality_score_parity(duck):
    got = quality_score(_docs())
    oracle = duck.execute(
        f"SELECT doc_id, {quality_score_sql('text')} FROM documents"
    ).df()
    assert_frames_match(got, oracle)


def test_langid_parity(duck):
    got = langid(_docs())
    oracle = duck.execute(
        f"SELECT doc_id, {langid_sql('text')} AS pred_lang FROM documents"
    ).df()
    assert_frames_match(got, oracle)


def test_fingerprint_parity(duck):
    got = fingerprint(_docs())
    oracle = duck.execute(
        f"SELECT doc_id, {FINGERPRINT_SQL.format(text='text')} AS fp FROM documents"
    ).df()
    assert_frames_match(got, oracle)


def test_sentence_stats_edges():
    """Adversarial shapes: punct-only, empty, whitespace-between-breaks,
    no-punct (whole text = 1 sentence), unicode lengths."""
    import ray.data

    from htrc_feature_reader_ray.stages.textstats import sentence_stats

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "one two. three four!  five? ",
            " .!?.. ",                 # only delimiters/whitespace
            "",
            "no punct at all",
            "é中文. ab",
        ],
    })
    out = (sentence_stats(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_sentences"].tolist() == [3, 0, 0, 1, 2]
    assert out["max_sentence_chars"].tolist() == [10, 0, 0, 15, 3]
    assert out["mean_sentence_chars"].tolist() == [
        (7 + 10 + 4) / 3, 0.0, 0.0, 15.0, (3 + 2) / 2
    ]
