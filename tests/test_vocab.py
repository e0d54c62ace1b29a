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


def test_unigram_stats_vs_sql_and_edges():
    import duckdb

    from htrc_feature_reader_ray.stages.vocab import (
        unigram_stats,
        unigram_stats_sql,
    )

    rows = [
        {"doc_id": 0, "text": "a a b rare1"},
        {"doc_id": 1, "text": "b b c  c a"},
        {"doc_id": 2, "text": ""},             # zero-token doc
        {"doc_id": 3, "text": "rare2 rare3"},  # all-OOV doc
    ]
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(3)
    # vocab = counts with min_count=2 (rare* drop out -> OOV)
    vocab = (
        df.text.str.split().explode().dropna().value_counts()
        .rename_axis("token").rename("count").reset_index()
    )
    vocab = vocab[vocab["count"] >= 2]
    out = (
        unigram_stats(ds, vocab)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    exp = (
        con.execute(unigram_stats_sql(min_count=2))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)
    # spot values: doc0 = a(3) a(3) b(3) oov -> sum 9, n_in 3
    r0 = out.iloc[0]
    assert (r0.n_tokens, r0.n_oov, r0.sum_count) == (4, 1, 9)
    assert r0.mean_count == 3.0 and r0.oov_ratio == 0.25
    r2 = out.iloc[2]
    assert (r2.n_tokens, r2.n_oov, r2.sum_count) == (0, 0, 0)
    assert r2.oov_ratio == 0.0 and r2.mean_count == 0.0
    r3 = out.iloc[3]
    assert r3.oov_ratio == 1.0 and r3.sum_count == 0


def test_char_coverage_exact_and_block_independent():
    import numpy as np
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import char_coverage

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["aab\nb", "b中中é", None, ""],  # null -> '' convention
    })
    out = char_coverage(ray.data.from_pandas(df).repartition(3), k=3)
    # counts: b=3, a=2, 中=2, \n=1, é=1 -> top3 by (n desc, codepoint asc)
    assert out["ch"].tolist() == ["b", "a", "中"]
    assert out["n"].tolist() == [3, 2, 2]
    total = 9
    assert out["ppm"].tolist() == [
        3 * 1_000_000 // total, 2 * 1_000_000 // total,
        2 * 1_000_000 // total]
    assert out["cov_rank"].tolist() == [1, 2, 3]
    single = char_coverage(ray.data.from_pandas(df).repartition(1), k=3)
    pd.testing.assert_frame_equal(out, single)


# ---------------------------------------------------------------------------
# BPE merge training


def _ref_bpe(word_counts, rounds):
    """Reference scalar BPE trainer (greedy left-to-right apply)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rnd, l, r, l + r, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_matches_reference_incl_runs():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import bpe_train

    # 'aaaaaaa' exercises the even/odd-run fixpoint-replace path
    docs = ["low low low lower lowest", "aaaaaaa aaaaaaa aaa",
            "new newer newest low"]
    counts = {}
    for d in docs:
        for w in d.split():
            counts[w] = counts.get(w, 0) + 1
    expect = _ref_bpe(counts, 4)

    out = bpe_train(
        ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(2),
        rounds=4)
    got = [tuple(r) for r in out[["round", "left", "right", "merged",
                                  "count"]].itertuples(index=False)]
    assert got == expect


def test_bpe_encode_segments_match_reference():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import bpe_encode

    docs = ["low low lower", "aaaa aa"]
    counts = {}
    for d in docs:
        for w in d.split():
            counts[w] = counts.get(w, 0) + 1
    merges = _ref_bpe(counts, 3)
    # reference segmentation: re-apply merges in order
    seqs = {w: list(w) for w in counts}
    for _, l, r, _, _ in merges:
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out

    got = bpe_encode(
        ray.data.from_pandas(
            pd.DataFrame({"doc_id": [0, 1], "text": docs})),
        rounds=3,
    ).to_pandas().sort_values(["doc_id", "pos", "sym_pos"])
    for (doc_id, pos), g in got.groupby(["doc_id", "pos"]):
        word = docs[doc_id].split()[pos]
        assert g["symbol"].tolist() == seqs[word], (doc_id, pos, word)


def test_bpe_train_paths_equal():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import bpe_train

    docs = ["low low low lower lowest", "aaaaaaa aaaaaaa aaa",
            "new newer newest low", "wide wider widest new"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(3)
    fast = bpe_train(ds, rounds=4)
    dist = bpe_train(ds, rounds=4, driver_limit=0)
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  dist.reset_index(drop=True))

    f_m, f_seg = bpe_train(ds, rounds=3, return_segmented=True)
    d_m, d_seg = bpe_train(ds, rounds=3, return_segmented=True,
                           driver_limit=0)
    a = f_seg.to_pandas().sort_values("token").reset_index(drop=True)
    b = d_seg.to_pandas().sort_values("token").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["token", "c", "s"]],
                                  b[["token", "c", "s"]])


def test_bigram_lm_hand_counts():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import bigram_lm

    docs = ["a b a b c", "b c"]
    # pairs: (a,b):2 (b,a):1 (b,c):2  ctx: a->2, b->3 ; V = 3
    got = (
        bigram_lm(ray.data.from_pandas(pd.DataFrame({"text": docs}))
                  .repartition(2))
        .to_pandas().set_index(["w1", "w2"]).sort_index()
    )
    assert got.loc[("a", "b"), "c_pair"] == 2
    assert got.loc[("a", "b"), "c_ctx"] == 2
    assert got.loc[("a", "b"), "p_ppm"] == (2 + 1) * 1_000_000 // (2 + 3)
    assert got.loc[("b", "a"), "p_ppm"] == (1 + 1) * 1_000_000 // (3 + 3)
    assert got.loc[("b", "c"), "c_pair"] == 2
    assert len(got) == 3  # no cross-document pair (c,b)


def test_vocab_coverage_curve_hand_check():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import vocab_coverage

    # counts: a:6 b:3 c:2 d:1  (total 12, V=4)
    docs = ["a a a b b c", "a a a b c d"]
    got = vocab_coverage(
        ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(2))
    want_k = [1, 2, 4]  # powers of two capped at V=4
    assert got["k"].tolist() == want_k
    assert got["cum_count"].tolist() == [6, 9, 12]
    assert got["coverage_ppm"].tolist() == [
        6 * 10**6 // 12, 9 * 10**6 // 12, 10**6]


def _ref_wordpiece(counts, rounds):
    """Scalar reference: likelihood-scored merges with the integer-floor
    score contract."""
    seqs = {w: list(w) for w in counts}
    merges = []
    for rnd in range(1, rounds + 1):
        pc, sc = {}, {}
        for w, syms in seqs.items():
            c = counts[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        best = min(
            (-(cnt * 10**12 // (sc[l] * sc[r])), -cnt, l, r)
            for (l, r), cnt in pc.items()
        )
        score, cnt, l, r = -best[0], -best[1], best[2], best[3]
        merges.append((rnd, l, r, l + r, cnt, score))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_wordpiece_train_matches_reference_and_differs_from_bpe():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.vocab import bpe_train, wordpiece_train

    # 'th' is the most FREQUENT pair but both symbols are common;
    # 'qu' is rarer but q occurs only before u -> likelihood favors it
    docs = ["the then they there them " * 3, "queen quick quote",
            "tin ten ton tan"]
    counts = {}
    for d in docs:
        for w in d.split():
            counts[w] = counts.get(w, 0) + 1
    expect = _ref_wordpiece(counts, 4)

    ds = ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(2)
    out = wordpiece_train(ds, rounds=4)
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == expect
    # likelihood picks the cohesive rare pair ('c','k': both symbols occur
    # ONLY together -> score 10^12), not BPE's most-frequent pair
    assert got[0][1:3] == ("c", "k")
    assert got[0][5] == 10**12

    bpe = bpe_train(ds, rounds=1)
    assert (bpe["left"].iloc[0], bpe["right"].iloc[0]) != ("c", "k")

    # distributed loop path pins equal
    dist = wordpiece_train(ds, rounds=4, driver_limit=0)
    pd.testing.assert_frame_equal(out, dist)


# ---------------------------------------------------------------------------
# unigram-LM tokenizer training


def test_unigram_train_hand_worked():
    """Corpus 'ab ab ab c': round 1 scores [ab]=3 half-bits vs [a,b]=6,
    so 'ab' wins; round 2 keeps it; final usage ab:3, c:1, a/b unused."""
    from htrc_feature_reader_ray.stages.vocab import unigram_train

    ds = ray.data.from_pandas(
        pd.DataFrame({"text": ["ab ab ab c"]})).repartition(1)
    out = unigram_train(ds).set_index("piece")
    assert set(out.index) == {"a", "b", "c", "ab"}
    assert out.loc["ab", "usage"] == 3
    assert out.loc["c", "usage"] == 1
    assert out.loc["a", "usage"] == 0 and out.loc["b", "usage"] == 0
    assert out.loc["ab", "piece_len"] == 2


def test_unigram_train_prunes_unused_seeds_keeps_chars():
    from htrc_feature_reader_ray.stages.vocab import unigram_train

    # 'xy' dominates; the seed also contains 'xyz'/'yz'/'zq' etc. from the
    # rare word, but unused multi-char pieces must be pruned while every
    # single char survives with usage >= 0.
    ds = ray.data.from_pandas(pd.DataFrame(
        {"text": ["xy xy xy xy xy xy zq"]})).repartition(1)
    out = unigram_train(ds).set_index("piece")
    assert "xy" in out.index
    chars = {p for p in out.index if len(p) == 1}
    assert chars == {"x", "y", "z", "q"}
    multis = {p for p in out.index if len(p) > 1}
    assert all(out.loc[p, "usage"] > 0 for p in multis)


def test_unigram_train_partitioning_invariant_and_long_word_guard():
    import pytest

    from htrc_feature_reader_ray.stages.vocab import unigram_train

    texts = [f"tok{i % 5} abcd{i % 3} xx" for i in range(60)]
    a = unigram_train(
        ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(1))
    b = unigram_train(
        ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(13))
    pd.testing.assert_frame_equal(a, b)

    with pytest.raises(ValueError, match="max_word_len"):
        unigram_train(
            ray.data.from_pandas(
                pd.DataFrame({"text": ["supercalifragilistic"]})),
            max_word_len=8)


def test_unigram_encode_reapplies_training_segmentation():
    from htrc_feature_reader_ray.stages.vocab import (
        unigram_encode,
        unigram_train,
    )

    texts = ["ab ab ab c", "c ab"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": texts})).repartition(2)
    _, seg = unigram_train(ds, return_segmented=True)
    seg_map = dict(zip(seg["token"], [tuple(s) for s in seg["syms"]]))
    out = unigram_encode(ds).to_pandas()
    # every (doc, pos) group re-assembles its word, in training's pieces
    for (doc, pos), grp in out.groupby(["doc_id", "pos"]):
        word = texts[doc].split()[pos]
        got = tuple(grp.sort_values("sym_pos")["piece"])
        assert got == seg_map[word], (doc, pos)
    # 'ab' is one piece -> occurrences of 'ab' emit a single row
    ab_rows = out[(out.doc_id == 0) & (out.pos == 0)]
    assert list(ab_rows["piece"]) == ["ab"]


def test_greedy_wordpiece_diverges_from_merge_replay():
    from htrc_feature_reader_ray.stages.vocab import _greedy_wordpiece

    # vocab from merges [(b,c), (a,b)]: replaying them on "abc" gives
    # ["a","bc"] (b consumed by the earlier bc merge), but greedy
    # longest-match-first takes "ab" at position 0 -> ["ab","c"]
    pieces = {"a", "b", "c", "bc", "ab"}
    assert _greedy_wordpiece("abc", pieces, 2) == ["ab", "c"]
    # longest match wins over a shorter one starting at the same spot
    pieces2 = {"a", "b", "c", "ab", "abc"}
    assert _greedy_wordpiece("abcab", pieces2, 3) == ["abc", "ab"]
    # alphabet fallback: unseen bigrams split to chars
    assert _greedy_wordpiece("ca", pieces, 2) == ["c", "a"]


def test_wordpiece_encode_greedy_and_unk():
    from htrc_feature_reader_ray.stages.vocab import (
        wordpiece_encode,
        wordpiece_train,
    )

    texts = ["abab ab cd abcd", "ab abab abab cd"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": texts})).repartition(2)
    merges = wordpiece_train(ds, rounds=3)
    pieces = set("abcd") | set(merges["merged"])
    out = wordpiece_encode(ds, rounds=3).to_pandas()
    # every (doc, pos) group re-assembles its word from vocab pieces via
    # greedy longest-match-first
    from htrc_feature_reader_ray.stages.vocab import _greedy_wordpiece

    maxlen = max(len(p) for p in pieces)
    for (doc, pos), grp in out.groupby(["doc_id", "pos"]):
        word = texts[doc].split()[pos]
        got = grp.sort_values("sym_pos")["piece"].tolist()
        assert got == _greedy_wordpiece(word, pieces, maxlen), (doc, pos)
    assert "[UNK]" not in set(out["piece"])

    # the BERT max_input_chars_per_word rule: long words -> single [UNK]
    long_ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["ab waytoolongforapiece"]}))
    out2 = wordpiece_encode(long_ds, rounds=1, max_word_len=12).to_pandas()
    unk = out2[out2["pos"] == 1]
    assert unk["piece"].tolist() == ["[UNK]"]
    assert unk["sym_pos"].tolist() == [0]


def test_tokenizer_fertility_exact():
    from htrc_feature_reader_ray.stages.vocab import (
        tokenizer_fertility,
        wordpiece_encode,
    )

    texts = ["abab ab cd", "ab ab"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": texts})).repartition(2)
    enc = wordpiece_encode(ds, rounds=2)
    out = (tokenizer_fertility(enc).to_pandas()
           .set_index("doc_id").sort_index())
    # n_words counts sym_pos==0 groups; fertility = pieces*1e6//words
    assert out.loc[0, "n_words"] == 3 and out.loc[1, "n_words"] == 2
    assert (out["fertility_ppm"]
            == out["n_pieces"] * 1_000_000 // out["n_words"]).all()
    # with merges 'ab' (and maybe 'abab') trained, fertility < chars/word
    assert out.loc[1, "n_pieces"] <= 2  # 'ab' is one piece


def test_oov_rate_exact_ppm():
    import duckdb

    from htrc_feature_reader_ray.stages.vocab import oov_rate, oov_rate_sql

    df = pd.DataFrame({
        "lang": ["en", "en", "fr", "fr"],
        "text": ["the cat sat", "the dog ran",
                 "le chat the", "le chien dort"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    vocab = ["the", "cat", "sat", "dog", "ran"]  # en vocabulary
    out = (oov_rate(ds, vocab).to_pandas()
           .set_index("lang").sort_index())
    assert out.loc["en", "n_oov"] == 0
    # fr: 6 tokens, 'the' is the only in-vocab one -> 5 OOV
    assert out.loc["fr", "n_tokens"] == 6
    assert out.loc["fr", "n_oov"] == 5
    assert out.loc["fr", "oov_ppm"] == 5 * 1_000_000 // 6
    # SQL replay (vocabulary = the en slice's distinct tokens) matches
    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(oov_rate_sql()).df()
           .set_index("lang").sort_index())
    pd.testing.assert_frame_equal(out, sql)


def test_neg_sampling_weights_exact():
    import math

    import duckdb

    from htrc_feature_reader_ray.stages.vocab import (
        neg_sampling_weights,
        neg_sampling_weights_sql,
    )

    # skewed counts: "a" x 16 (r = 8), "b" x 4 (r = 2), "c" x 1 (r = 1)
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a a a a a a a a b b", "a a a a a a a a b b", "c"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = (neg_sampling_weights(ds).to_pandas()
           .set_index("token").sort_index())
    assert out.loc["a", "count"] == 16 and out.loc["a", "weight_ppb"] == \
        8 * 1_000_000_000 // 11
    assert out.loc["b", "weight_ppb"] == 2 * 1_000_000_000 // 11
    assert out.loc["c", "weight_ppb"] == 1_000_000_000 // 11
    # r is the exact floored 3/4 power (nested isqrt identity)
    for n in [1, 2, 3, 15, 16, 17, 255, 256, 257, 10**6, 2**40]:
        assert math.isqrt(math.isqrt(n**3)) == int(n ** 0.75) or \
            abs(math.isqrt(math.isqrt(n**3)) - n ** 0.75) < 1

    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(neg_sampling_weights_sql()).df()
           .set_index("token").sort_index())
    pd.testing.assert_frame_equal(out, sql)


def test_vocab_growth_hand_fixture():
    import duckdb

    from htrc_feature_reader_ray.stages.vocab import (
        vocab_growth,
        vocab_growth_sql,
    )

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c a", "b c d", "", "d e e e"],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = (vocab_growth(ds, checkpoint=4).to_pandas()
           .sort_values("tokens_seen").reset_index(drop=True))
    # 11 tokens total -> checkpoints at 4, 8, 11; 5 types overall
    assert out["tokens_seen"].tolist() == [4, 8, 11]
    assert out["n_types"].iloc[-1] == 5
    assert (out["n_types"].diff().dropna() >= 0).all()

    # SQL replay identical (same md5 order, same grid)
    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(vocab_growth_sql(checkpoint=4)).df()
           .sort_values("tokens_seen").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)

    # parallelism invariance
    out1 = (vocab_growth(ray.data.from_pandas(df).repartition(1),
                         checkpoint=4).to_pandas()
            .sort_values("tokens_seen").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out1)

    # empty corpus -> empty curve
    e = vocab_growth(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [9], "text": [""]})),
        checkpoint=4).to_pandas()
    assert len(e) == 0


def test_kneser_ney_lm_exact_and_sums_to_one():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.vocab import kneser_ney_lm

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["san francisco is big",
                 "san francisco san diego",
                 "the francisco myth is not the truth"],
    })
    out = (kneser_ney_lm(ray.data.from_pandas(docs).repartition(3))
           .to_pandas())

    # independent replay in exact fractions
    pairs = {}
    for t in docs["text"]:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    T = len(pairs)
    C = {}
    N1 = {}
    NC = {}
    for (a, b), c in pairs.items():
        C[a] = C.get(a, 0) + c
        N1[a] = N1.get(a, 0) + 1
        NC[b] = NC.get(b, 0) + 1

    def p_frac(a, b):
        c = pairs[(a, b)]
        return (Fraction(max(4 * c - 3, 0), 4 * C[a])
                + Fraction(3 * N1[a], 4 * C[a]) * Fraction(NC[b], T))

    assert len(out) == T
    for _, r in out.iterrows():
        f = p_frac(r["w1"], r["w2"])
        assert int(r["p_ppm"]) == (f.numerator * 10**6) // f.denominator
        assert int(r["c_ctx"]) == C[r["w1"]]
        assert int(r["n1_w1"]) == N1[r["w1"]]
        assert int(r["n_cont"]) == NC[r["w2"]]

    # interpolated KN is a proper conditional: sums to exactly 1 over
    # the SEEN successors plus the backoff mass spread over unseen w2 —
    # over all w2 types: sum_seen (4c-3)/4C + lambda * sum_all NC/T = 1
    for a in C:
        seen = sum(Fraction(max(4 * pairs[(x, y)] - 3, 0), 4 * C[a])
                   for (x, y) in pairs if x == a)
        lam = Fraction(3 * N1[a], 4 * C[a])
        # continuation distribution sums to 1 over the full type set
        total = seen + lam * sum(Fraction(NC[b], T) for b in NC)
        assert total == 1

    # "francisco" follows 2 distinct contexts but "the" is frequent:
    # continuation backoff must rank francisco's UNSEEN-context mass by
    # context diversity, not raw frequency — NC pins that directly
    assert NC["francisco"] == 2
