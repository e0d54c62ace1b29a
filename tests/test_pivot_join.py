import numpy as np
import ray.data

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


def test_bucket_join_semi_anti():
    import pandas as pd
    import pyarrow as pa
    from htrc_feature_reader_ray.stages.partition import bucket_join

    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "name": ["a", "b", "c", "d", "e"],
        }
    )
    right = pa.table({"rk": pa.array([2, 4, 4, 9], type=pa.int64())})
    l_ds = ray.data.from_arrow(left)
    r_ds = ray.data.from_arrow(right)
    semi = bucket_join(l_ds, r_ds, left_key="k", right_key="rk",
                       how="semi", num_buckets=4).to_pandas()
    anti = bucket_join(l_ds, r_ds, left_key="k", right_key="rk",
                       how="anti", num_buckets=4).to_pandas()
    assert sorted(semi["k"]) == [2, 4]          # no duplication from dup rk
    assert sorted(anti["k"]) == [1, 3, 5]
    assert list(semi.columns) == ["k", "name"]  # left columns only


def test_topk_per_group_lossless_combiner():
    import numpy as np
    import pandas as pd
    from htrc_feature_reader_ray.stages.fold import topk_per_group

    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abcd"), 3000),
            "item": rng.randint(0, 500, 3000),
            "score": rng.randint(0, 10_000, 3000).astype("int64"),
        }
    ).drop_duplicates(["g", "item"])
    ds = ray.data.from_pandas(df).repartition(17)  # split groups over blocks
    got = topk_per_group(
        ds, group_cols=["g"], sort_col="score", k=5, tie_cols=["item"],
        num_buckets=3,
    ).to_pandas()
    expect = (
        df.sort_values(["g", "score", "item"], ascending=[True, False, True])
        .groupby("g").head(5)
    )
    key = lambda d: sorted(map(tuple, d[["g", "item", "score"]].values))
    assert key(got) == key(expect)


def test_hopping_window_membership():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from htrc_feature_reader_ray.stages.temporal import hopping_window

    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:20"]
    ).astype("datetime64[us]")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1], type=pa.int64()),
                "ts": pa.array(ts),
                "v": pa.array([10, 20, 30], type=pa.int64()),
            }
        )
    )
    out = (
        hopping_window(ds, key="user_id", ts="ts", width="2h", slide="1h",
                       sum_cols=["v"])
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # windows: 23:00 (events 1,2), 00:00 (all 3), 01:00 (event 3)
    assert out["v"].tolist() == [30, 60, 30]
    assert out["n_events"].tolist() == [2, 3, 1]


def test_term_matrix_dense_matches_per_url_pivot(sf_dir):
    import pandas as pd
    import pytest

    from htrc_feature_reader_ray.stages.fold import term_matrix_dense

    tokens = tokens_from_pages(sf_dir, via_html=False)
    long = (term_matrix_dense(tokens, page_freq=False).to_pandas()
            .sort_values(["url", "warc_ts", "token"])
            .reset_index(drop=True))
    # dense-long serialization == every per-url term_snapshot_matrix cell
    urls = sorted(long["url"].unique())
    assert len(urls) > 1  # multi-entity, not a one-url special case
    for url in urls[:3]:
        wide = term_snapshot_matrix(tokens, url)
        got = (long[long["url"] == url]
               .pivot(index="warc_ts", columns="token", values="count"))
        got.index = pd.to_datetime(got.index)
        pd.testing.assert_frame_equal(
            got.sort_index(), wide.sort_index(), check_names=False)
    # zeros are real (fillna cells present), and page_freq binarizes
    pres = term_matrix_dense(tokens, page_freq=True).to_pandas()
    assert set(pres["count"].unique()) <= {0, 1}
    assert len(pres) == len(long)  # same dense cross product

    # wide-row hazard: a vocab cap below any entity's width raises
    with pytest.raises(ValueError, match="max_terms"):
        term_matrix_dense(tokens, max_terms=2).to_pandas()


def test_term_matrix_dense_parity(duck, sf_dir):
    import __ray_entry__ as m
    from tests.util import assert_frames_match, to_pandas

    got = to_pandas(m.queries()["term_matrix_dense"](sf_dir))
    oracle = duck.execute(m.oracle_sql()["term_matrix_dense"]).df()
    assert_frames_match(got, oracle)
