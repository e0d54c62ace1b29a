import numpy as np

from htrc_feature_reader_ray.stages.extract import tokens_from_pages
from htrc_feature_reader_ray.stages.fold import term_snapshot_matrix


def test_term_snapshot_matrix(sf_dir):
    tokens = tokens_from_pages(sf_dir, via_html=False)
    url = "https://src2.example.com/doc/2"  # doc_id=2 -> 3 snapshots
    wide = term_snapshot_matrix(tokens, url)
    assert wide.shape[0] == 3  # one row per snapshot
    assert (wide.dtypes == np.int64).all()
    long_sum = (
        tokens.to_pandas().query("url == @url")["count"].sum()
    )
    assert wide.to_numpy().sum() == long_sum
    # presence variant binarizes
    pres = term_snapshot_matrix(tokens, url, page_freq=True)
    assert set(np.unique(pres.to_numpy())) <= {0, 1}


def test_docs_join_embeddings_parity(duck, sf_dir):
    import __ray_entry__ as m
    from tests.util import assert_frames_match, to_pandas

    got = to_pandas(m.queries()["docs_join_embeddings"](sf_dir))
    oracle = duck.execute(m.oracle_sql()["docs_join_embeddings"]).df()
    assert_frames_match(got, oracle)
