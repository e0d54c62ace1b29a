"""Vocabulary build + token-id encoding."""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from htrc_feature_reader_ray.stages.vocab import (
    build_vocab,
    corpus_token_counts,
    encode_tokens,
)


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _serial_vocab(texts, min_count=1):
    from collections import Counter

    c = Counter(t for x in texts for t in x.split(" ") if t)
    items = [(tok, n) for tok, n in c.items() if n >= min_count]
    items.sort(key=lambda kv: (-kv[1], _h64(kv[0]), kv[0]))
    return {tok: (i, n) for i, (tok, n) in enumerate(items)}


def test_corpus_token_counts_exact():
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "a b a"},
        {"doc_id": 2, "text": "b  c"},
    ])
    out = corpus_token_counts(ds).to_pandas().sort_values("token")
    assert out.token.tolist() == ["a", "b", "c"]
    assert out["count"].tolist() == [2, 2, 1]


def test_build_vocab_rank_order_and_shape_independence():
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(words, rng.integers(3, 30)))
        for _ in range(150)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    expect = _serial_vocab(texts, min_count=2)

    v1 = (
        build_vocab(ray.data.from_items(rows), min_count=2)
        .to_pandas().sort_values("token_id").reset_index(drop=True)
    )
    assert len(v1) == len(expect)
    # contiguous 0-based ids, serial-reference order
    assert v1.token_id.tolist() == list(range(len(expect)))
    for _, r in v1.iterrows():
        assert expect[r.token] == (r.token_id, r["count"])
    # counts are non-increasing along id order
    assert (np.diff(v1["count"].to_numpy()) <= 0).all()
    # different block shape AND bucket counts -> identical ids
    v2 = (
        build_vocab(
            ray.data.from_items(rows).repartition(7), min_count=2,
            num_buckets=16, hash_buckets=8,
        )
        .to_pandas().sort_values("token_id").reset_index(drop=True)
    )
    assert v2.equals(v1)


def test_encode_tokens_positions_and_oov():
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "a b rare a"},
        {"doc_id": 2, "text": "b  a"},
        {"doc_id": 3, "text": ""},
    ])
    vocab = pd.DataFrame(
        {"token": ["a", "b"], "count": [3, 2], "token_id": [0, 1]}
    )
    out = (
        encode_tokens(docs, vocab)
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [1, 1, 1, 1, 2, 2]
    assert out.pos.tolist() == [0, 1, 2, 3, 0, 1]  # double-space collapsed
    assert out.token.tolist() == ["a", "b", "rare", "a", "b", "a"]
    assert out.token_id.tolist() == [0, 1, -1, 0, 1, 0]
