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
