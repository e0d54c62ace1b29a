"""Big-volume shape test — the reference pins a 56,397-row tokencount table
for a many-tokens volume (test_volume.py:236-242). Here: a giant synthetic
page exercises the explode at single-document scale."""

import numpy as np
import pyarrow as pa

from htrc_feature_reader_ray.stages.extract import (
    HtmlExtractor,
    token_counts_batch,
)
from htrc_feature_reader_ray.sources.pages import synth_pages_batch


def test_giant_page_exact_counts():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(5000)]
    toks = [vocab[i] for i in rng.randint(0, 5000, 60_000)]
    text = " ".join(toks)
    docs = pa.table(
        {
            "doc_id": pa.array([9], type=pa.int64()),  # 9 % 3 = 0 -> 1 snap
            "source": ["giant"],
            "text": [text],
            "lang": ["en"],
        }
    )
    pages = synth_pages_batch(docs)
    assert len(pages) == 1
    extracted = HtmlExtractor()(pages)
    assert extracted.column("text").to_pylist()[0] == pages.column(
        "text"
    ).to_pylist()[0]
    tc = token_counts_batch(extracted)
    body = tc.filter(pa.compute.equal(tc.column("section"), "body"))
    # exact totals and distincts vs python ground truth
    assert pa.compute.sum(body.column("count")).as_py() == 60_000
    import collections

    truth = collections.Counter(toks)
    assert body.num_rows == len(truth)
    got = dict(
        zip(body.column("token").to_pylist(), body.column("count").to_pylist())
    )
    assert got == dict(truth)
