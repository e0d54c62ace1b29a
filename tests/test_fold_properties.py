"""Property tests: fold_tokenlist vs an independent pandas model of the
reference's group_tokenlist semantics (feature_reader.py:25-112), over
randomized token tables — every folding combination, including page_freq."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from htrc_feature_reader_ray.stages.fold import fold_tokenlist

SECTIONS = ["header", "body", "footer"]
TOKENS = ["Dog", "dog", "Cat", "runs", "the"]
POS = {"Dog": "NNP", "dog": "NN", "Cat": "NNP", "runs": "NNS", "the": "NN"}


def pandas_model(df, *, entity, snapshots, section, case, pos, page_freq):
    """Independent implementation of the folding semantics in plain pandas."""
    keys = []
    if entity:
        keys.append("url")
    if snapshots:
        keys.append("warc_ts")
    work = df.copy()
    if section in SECTIONS:
        work = work[work["section"] == section]
        keys.append("section")
    elif section == "all":
        keys.append("section")
    tok_col = "token" if case else "lowercase"
    if not case:
        work["lowercase"] = work["token"].str.lower()
    keys.append(tok_col)
    if pos:
        keys.append("pos")
    if not page_freq:
        return work.groupby(keys, as_index=False)["count"].sum()
    pres_keys = ["url", "warc_ts"] + [k for k in keys if k not in ("url", "warc_ts")]
    pres = work.groupby(pres_keys, as_index=False)["count"].sum()
    pres["count"] = 1
    return pres.groupby(keys, as_index=False)["count"].sum()


rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),                      # url idx
        st.integers(0, 2),                      # snapshot idx
        st.integers(0, 2),                      # section idx
        st.integers(0, len(TOKENS) - 1),        # token idx
        st.integers(1, 5),                      # count
    ),
    min_size=1,
    max_size=60,
)

fold_params = st.tuples(
    st.booleans(),                               # entity
    st.booleans(),                               # snapshots
    st.sampled_from(["all", "group", "body", "header"]),
    st.booleans(),                               # case
    st.booleans(),                               # pos
    st.booleans(),                               # page_freq
)


@settings(max_examples=20, deadline=None)
@given(rows=rows_strategy, params=fold_params)
def test_fold_matches_pandas_model(rows, params):
    # entity=False + page_freq is the ADVICE-flagged combo: urls in the
    # fixture share warc_ts values, so binarizing per (warc_ts, token) alone
    # would wrongly collapse distinct pages
    entity, snapshots, section, case, pos, page_freq = params
    df = pd.DataFrame(
        {
            "url": [f"u{r[0]}" for r in rows],
            "warc_ts": pd.to_datetime(
                [1_700_000_000 + r[1] * 3600 for r in rows], unit="s"
            ).astype("datetime64[us]"),
            "section": [SECTIONS[r[2]] for r in rows],
            "token": [TOKENS[r[3]] for r in rows],
            "pos": [POS[TOKENS[r[3]]] for r in rows],
            "count": np.array([r[4] for r in rows], dtype=np.int64),
        }
    )
    expect = pandas_model(
        df, entity=entity, snapshots=snapshots, section=section, case=case,
        pos=pos, page_freq=page_freq,
    )
    if expect.empty:
        return  # section filter removed everything; Ray side returns 0 rows
    got = fold_tokenlist(
        ray.data.from_pandas(df), entity=entity, snapshots=snapshots,
        section=section, case=case, pos=pos, page_freq=page_freq,
    ).to_pandas()
    keys = [c for c in expect.columns if c != "count"]
    g = got.sort_values(keys).reset_index(drop=True)
    e = expect.sort_values(keys).reset_index(drop=True)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e)
    for c in keys:
        if c == "warc_ts":
            assert (
                pd.to_datetime(g[c]).astype("datetime64[ns]")
                .equals(pd.to_datetime(e[c]).astype("datetime64[ns]"))
            )
        else:
            assert g[c].tolist() == e[c].tolist()
    assert g["count"].astype("int64").tolist() == e["count"].astype(
        "int64"
    ).tolist()
