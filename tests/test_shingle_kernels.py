"""Conformance pins for the r5 vectorized tokenize/shingle/window
kernels against their per-doc scalar references — pure numpy/Arrow, no
Ray session needed.

The batch kernels (`_tokenize_batch`, `_shingle_batch`,
`_flatten_windows`) replaced per-doc Python split/join/set/md5 loops;
these tests pin that the vectorized identities and counts match the
scalar semantics exactly, including the edge cases that broke naive
versions (empty docs, None, multi-space runs, short-doc fallback,
fallback docs interleaved with window docs).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from htrc_feature_reader_ray.stages.dedup import (
    _flatten_windows,
    _shingle_batch,
    _tokenize_batch,
    word_shingles,
)

# texts over a tiny vocab so cross-doc gram collisions actually happen,
# plus whitespace pathologies
_token = st.sampled_from(["a", "bb", "ccc", "dd", "e", "éé"])
_text = st.one_of(
    st.none(),
    st.just(""),
    st.lists(_token, min_size=0, max_size=12).map(" ".join),
    st.lists(_token, min_size=1, max_size=6).map("  ".join),  # runs
)
_texts = st.lists(_text, min_size=0, max_size=25)


def _ref_tokens(x):
    return [t for t in (x or "").split(" ") if t]


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_tokenize_batch_matches_scalar(texts):
    flat, tcounts = _tokenize_batch(texts)
    assert len(tcounts) == len(texts)
    got = []
    pos = 0
    toks = flat.to_pylist()
    for n in tcounts:
        got.append(toks[pos:pos + n])
        pos += int(n)
    assert pos == len(toks)
    assert got == [_ref_tokens(x) for x in texts]


@settings(max_examples=60, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=5))
def test_shingle_batch_matches_scalar_set(texts, k):
    grams, didx = _shingle_batch(texts, k)
    got: dict = {}
    for g, d in zip(grams.to_pylist(), didx.tolist()):
        got.setdefault(d, set()).add(g)
    want = {i: set(word_shingles(_ref_tokens(x), k))
            for i, x in enumerate(texts)
            if word_shingles(_ref_tokens(x), k)}
    assert got == want
    # rows are doc-grouped ascending and distinct within doc
    assert (np.diff(didx) >= 0).all()
    assert len(grams) == sum(len(v) for v in want.values())


@settings(max_examples=60, deadline=None)
@given(_texts, st.integers(min_value=1, max_value=5))
def test_flatten_windows_counts_and_equality(texts, k):
    h, gcounts, tcounts = _flatten_windows(texts, k)
    assert list(tcounts) == [len(_ref_tokens(x)) for x in texts]
    assert list(gcounts) == [max(len(_ref_tokens(x)) - k + 1, 0)
                             for x in texts]
    assert h.shape == (int(gcounts.sum()),)
    # hash equality iff gram-string equality (no collisions expected at
    # this vocab scale; position-sensitive identity)
    grams = []
    for x in texts:
        toks = _ref_tokens(x)
        grams += [" ".join(toks[j:j + k])
                  for j in range(max(len(toks) - k + 1, 0))]
    by_hash: dict = {}
    for hh, g in zip(h.tolist(), grams):
        by_hash.setdefault(hh, set()).add(g)
    assert all(len(v) == 1 for v in by_hash.values())
    by_gram: dict = {}
    for hh, g in zip(h.tolist(), grams):
        by_gram.setdefault(g, set()).add(hh)
    assert all(len(v) == 1 for v in by_gram.values())


def test_flatten_windows_cross_batch_identity():
    """The identity is a pure function of the token sequence — the same
    gram hashed in two separate batch calls (different vocabularies)
    must collide, or cross-batch dup detection breaks."""
    h1, _, _ = _flatten_windows(["x a bb ccc y"], 3)
    h2, _, _ = _flatten_windows(["zz a bb ccc", "unrelated text here"], 3)
    assert h1[1] == h2[1]  # "a bb ccc" in both
    assert h1[0] != h2[0]
