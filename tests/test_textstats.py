import numpy as np
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


def test_dup_line_stats_exact():
    from htrc_feature_reader_ray.stages.textstats import dup_line_stats

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "a\nb\na\n\n\nc",      # 'a' x2 + '' x2 dup, b/c unique -> 6 lines
            "x",                    # single line, no dups
            "same\nsame\nsame",     # all dup
        ],
    })
    out = (dup_line_stats(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_lines"].tolist() == [6, 1, 3]
    assert out["n_dup_lines"].tolist() == [4, 0, 3]
    # doc0 chars: a,b,a,'','',c = 4; dup chars: a+a = 2
    assert out["dup_line_ppm"].tolist() == [
        4 * 1_000_000 // 6, 0, 1_000_000]
    assert out["dup_char_ppm"].tolist() == [
        2 * 1_000_000 // 4, 0, 1_000_000]


def test_gopher_quality_exact():
    from htrc_feature_reader_ray.stages.textstats import gopher_quality

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "abc 42 #x ....",   # 4 words: alpha=2; sym: 1x'#' + 1x'...'
            "",
            "a bb ccc",
        ],
    })
    out = (gopher_quality(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [4, 0, 3]
    assert out["alpha_word_ppm"].tolist() == [500000, 0, 1_000_000]
    assert out["symbol_ppm"].tolist() == [2 * 1_000_000 // 4, 0, 0]
    assert out["min_word_len"].tolist() == [2, 0, 1]
    assert out["max_word_len"].tolist() == [4, 0, 3]


def test_charclass_mix_exact():
    from htrc_feature_reader_ray.stages.textstats import charclass_mix

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["ab1 2\tc!", "中 文9"],
    })
    out = (charclass_mix(ray.data.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_chars"].tolist() == [8, 4]
    assert out["latin_ppm"].tolist() == [3 * 1_000_000 // 8, 0]
    assert out["digit_ppm"].tolist() == [2 * 1_000_000 // 8,
                                         1 * 1_000_000 // 4]
    assert out["space_ppm"].tolist() == [2 * 1_000_000 // 8,
                                         1 * 1_000_000 // 4]
    assert out["other_ppm"].tolist() == [1 * 1_000_000 // 8,
                                         2 * 1_000_000 // 4]


def test_readability_hand_values():
    import ray.data

    from htrc_feature_reader_ray.stages.textstats import readability

    import numpy as np

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["the cat sat. it ran!", "", "zzz zzz"],
    })
    got = (
        readability(ray.data.from_pandas(df).repartition(2))
        .to_pandas().set_index("doc_id").sort_index()
    )
    r0 = got.loc[0]
    # words: the cat sat. it ran! -> 5; sentences 2; vowel groups:
    # e,a,a,i,a -> 5
    assert (r0["n_words"], r0["n_sentences"], r0["n_vowel_groups"]) \
        == (5, 2, 5)
    assert r0["flesch_milli"] == 206835 - (1015 * 5) // 2 - (84600 * 5) // 5
    r1 = got.loc[1]  # empty doc: floors kick in
    assert (r1["n_words"], r1["n_sentences"]) == (0, 0)
    assert r1["flesch_milli"] == 206835 - 1015 - 0
    r2 = got.loc[2]  # vowel-free
    assert r2["n_vowel_groups"] == 0
    assert r2["flesch_milli"] == 206835 - (1015 * 2) // 1


def test_quality_langid_fusion_equals_separate_ops():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.textstats import (
        langid,
        quality_langid,
        quality_score,
    )

    texts = ["the of and is here", "der die und das", "el la de los",
             "zz qq xx", ""]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(range(len(texts))), "text": texts})).repartition(3)
    fused = (quality_langid(ds).to_pandas()
             .sort_values("doc_id", ignore_index=True))
    q = (quality_score(ds).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    l = (langid(ds).to_pandas()
         .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        fused.drop(columns=["pred_lang"]), q)
    pd.testing.assert_series_equal(fused["pred_lang"], l["pred_lang"])


def test_token_entropy_exact_half_bits():
    import duckdb

    from htrc_feature_reader_ray.stages.textstats import (
        token_entropy,
        token_entropy_sql,
    )

    df = pd.DataFrame({"doc_id": range(4),
                       "text": ["aaa aaa aaa", "a b c d", "a a b b", ""]})
    ds = ray.data.from_pandas(df).repartition(2)
    eng = (token_entropy(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(token_entropy_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, sql)
    e = eng.set_index("doc_id")["entropy_half_bits"]
    assert e[0] == 0          # single repeated type: zero entropy
    assert e[1] == 16         # uniform over 4 types: 4·(2·2 half-bits)
    assert e[3] == 0          # empty doc
    assert e[1] > e[2] > e[0]  # diversity ordering


def test_mojibake_stats_hand_values():
    import duckdb

    from htrc_feature_reader_ray.stages.textstats import (
        mojibake_stats,
        mojibake_stats_sql,
    )

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "clean ascii text",
            "brokÃ©n cafÃ© â€œquotedâ€“",   # 2×Ã©, â€œ, â€“
            "lost � bytes ��",  # 3 replacement chars
            "",
        ],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = (mojibake_stats(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_fffd"].tolist() == [0, 0, 3, 0]
    assert out["n_mojibake"].tolist() == [0, 4, 0, 0]
    assert out["damage_ppm"].tolist() == [
        0, 4 * 1_000_000 // out.loc[1, "n_chars"],
        3 * 1_000_000 // out.loc[2, "n_chars"], 0]

    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(mojibake_stats_sql()).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)


def test_hapax_rate_exact():
    from htrc_feature_reader_ray.stages.textstats import hapax_rate

    df = pd.DataFrame({
        "lang": ["en", "en", "de"],
        "text": ["a b b c  c c", "d a", "x x y"],
    })
    out = hapax_rate(
        ray.data.from_pandas(df).repartition(3), group_col="lang"
    ).to_pandas().set_index("lang")
    # en vocab: a(2) b(2) c(3) d(1) -> 4 types, 1 hapax, 8 tokens
    assert out.loc["en", "vocab_size"] == 4
    assert out.loc["en", "n_hapax"] == 1
    assert out.loc["en", "n_tokens"] == 8
    assert out.loc["en", "hapax_ppm"] == 1_000_000 // 4
    # de vocab: x(2) y(1)
    assert out.loc["de", "vocab_size"] == 2
    assert out.loc["de", "hapax_ppm"] == 500_000


def test_zipf_deviation_exact_and_perfect_curve():
    from htrc_feature_reader_ray.stages.textstats import zipf_deviation

    # construct a corpus whose counts are EXACTLY c1//r: c1=12 ->
    # counts 12,6,4,3 for tokens t1..t4 -> deviation 0
    words = (["t1"] * 12 + ["t2"] * 6 + ["t3"] * 4 + ["t4"] * 3)
    df = pd.DataFrame({"lang": ["zz"], "text": [" ".join(words)]})
    out = zipf_deviation(ray.data.from_pandas(df), group_col="lang",
                         top_k=4).to_pandas()
    assert out.iloc[0]["zipf_dev_ppm"] == 0
    assert out.iloc[0]["c1"] == 12 and out.iloc[0]["n_top"] == 4
    # flat distribution (all counts equal) deviates hard: obs_r = c1,
    # exp_r = c1//r -> dev = sum(c1 - c1//r)
    words2 = [f"w{i}" for i in range(4) for _ in range(10)]
    df2 = pd.DataFrame({"lang": ["ff"], "text": [" ".join(words2)]})
    out2 = zipf_deviation(ray.data.from_pandas(df2).repartition(2),
                          group_col="lang", top_k=4).to_pandas()
    dev = sum(10 - 10 // r for r in range(1, 5))
    assert out2.iloc[0]["zipf_dev_ppm"] == dev * 1_000_000 // 40


def test_langid_margin_abstain_semantics():
    from htrc_feature_reader_ray.stages.textstats import (
        LANG_MARKERS,
        langid_margin,
    )

    en = sorted(dict(LANG_MARKERS)["en"])
    de = sorted(dict(LANG_MARKERS)["de"])
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [
            " ".join(en[:4]),                 # clear en -> margin 1e6
            " ".join(en[:2] + de[:2]),        # 2-2 tie -> margin 0, abstain
            "zzz qqq xxx",                    # no markers -> abstain
        ],
    })
    out = langid_margin(
        ray.data.from_pandas(df).repartition(2)).to_pandas(
    ).set_index("doc_id")
    assert out.loc[0, "pred_lang"] == "en"
    assert out.loc[0, "margin_ppm"] == 1_000_000
    assert not out.loc[0, "abstain"]
    assert out.loc[1, "margin_ppm"] == 0 and out.loc[1, "abstain"]
    assert out.loc[2, "abstain"] and out.loc[2, "margin_ppm"] == 0


def test_lang_mismatch_by_source_localizes_bad_feed():
    from htrc_feature_reader_ray.stages.textstats import (
        LANG_MARKERS,
        lang_mismatch_by_source,
    )

    en = sorted(dict(LANG_MARKERS)["en"])
    de = sorted(dict(LANG_MARKERS)["de"])
    df = pd.DataFrame({
        "source": ["good"] * 4 + ["bad"] * 4,
        "lang": ["en"] * 4 + ["en"] * 4,       # 'bad' feed labels en...
        "text": [" ".join(en[:3])] * 4          # good: truly en
        + [" ".join(de[:3])] * 4,               # ...but content is de
    })
    out = lang_mismatch_by_source(
        ray.data.from_pandas(df).repartition(3)).to_pandas(
    ).set_index("source")
    assert out.loc["good", "mismatch_ppm"] == 0
    assert out.loc["bad", "mismatch_ppm"] == 1_000_000
    assert out.loc["bad", "n_mismatch"] == 4


def test_vocab_richness_chao1_exact():
    from htrc_feature_reader_ray.stages.textstats import vocab_richness

    # lang g1: tokens a a b c c d -> vocab 4, f1 (b,d) = 2, f2 (a,c) = 2
    #   chao1 = 4 + 2*1 // (2*3) = 4; unseen = 2e6 // 6 = 333333
    # lang g2: all distinct -> f1 = 3, f2 = 0
    #   chao1 = 3 + 3*2 // 2 = 6; unseen = 1e6
    df = pd.DataFrame({
        "lang": ["g1", "g1", "g2"],
        "text": ["a a b c", "c d", "x y z"],
    })
    out = vocab_richness(
        ray.data.from_pandas(df).repartition(2), group_col="lang",
    ).to_pandas().set_index("lang")
    assert out.loc["g1", "vocab_size"] == 4
    assert out.loc["g1", "f1"] == 2 and out.loc["g1", "f2"] == 2
    assert out.loc["g1", "chao1"] == 4
    assert out.loc["g1", "unseen_mass_ppm"] == 333_333
    assert out.loc["g2", "chao1"] == 3 + 3 * 2 // 2
    assert out.loc["g2", "unseen_mass_ppm"] == 1_000_000


def test_vocab_richness_bigrams_do_not_span_docs():
    from htrc_feature_reader_ray.stages.textstats import vocab_richness

    # two docs "a b" and "b a": bigram types {a b, b a} (one each);
    # the cross-doc pair "b b" must NOT appear
    df = pd.DataFrame({"lang": ["g", "g"], "text": ["a b", "b a"]})
    out = vocab_richness(ray.data.from_pandas(df), group_col="lang",
                         ngram=2).to_pandas().iloc[0]
    assert out["vocab_size"] == 2 and out["n_tokens"] == 2
    assert out["f1"] == 2
    # chao1 = 2 + 2*1 // (2*1) = 3
    assert out["chao1"] == 3


def test_naive_bayes_confusion_discriminative_and_ties():
    from htrc_feature_reader_ray.stages.textstats import (
        naive_bayes_confusion,
    )

    def run(df):
        return (naive_bayes_confusion(
            ray.data.from_pandas(df).repartition(3), label_col="lang")
            .to_pandas().sort_values(["lang", "pred_label"])
            .reset_index(drop=True))

    # disjoint vocabularies -> the model recovers its own labels
    df = pd.DataFrame({
        "doc_id": range(8),
        "lang": ["en"] * 4 + ["fr"] * 4,
        "text": ["the cat sat on the mat", "the dog ate the bone",
                 "a cat and a dog", "the mat was flat"]
                + ["le chat est noir", "le chien mange l os",
                   "un chat et un chien", "le tapis est plat"],
    })
    out = run(df)
    diag = out[out["lang"] == out["pred_label"]]["n_docs"].sum()
    assert int(diag) == 8
    assert set(out["pred_label"]) <= {"en", "fr"}

    # identical corpora under two labels: every score ties exactly ->
    # every doc predicts the lexicographically smaller class
    same = pd.DataFrame({
        "doc_id": range(6),
        "lang": ["aa", "zz"] * 3,
        "text": ["x y z"] * 6,
    })
    outs = run(same)
    assert set(outs["pred_label"]) == {"aa"}
    assert int(outs["n_docs"].sum()) == 6

    # replay the half-bit score for one doc by hand: 2 classes,
    # doc "w w q" under en-model vs fr-model
    tiny = pd.DataFrame({
        "doc_id": [0, 1],
        "lang": ["en", "fr"],
        "text": ["w w q", "r r r"],
    })
    outt = run(tiny)

    def hb(x, den):
        return (x * x).bit_length() - (den * den).bit_length()

    V = 3  # tokens {w, q, r}
    # en: tokens w:2 q:1 (n=3); fr: r:3 (n=3); priors d=1, D=2
    s_en = hb(1, 2) + 2 * hb(3, 3 + V) + hb(2, 3 + V)
    s_fr = hb(1, 2) + 2 * hb(1, 3 + V) + hb(1, 3 + V)
    assert s_en > s_fr  # doc 0 stays en
    row0 = outt[(outt["lang"] == "en")].iloc[0]
    assert row0["pred_label"] == "en"


def test_best_window_contracts():
    from htrc_feature_reader_ray.stages.curate import best_window

    def run(texts, terms, width):
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        return (best_window(ray.data.from_pandas(df).repartition(2),
                            terms, width=width)
                .to_pandas().set_index("doc_id").sort_index())

    # doc 0: hits cluster at the tail -> window must slide there;
    # doc 1: shorter than width -> whole-span contract;
    # doc 2: no hits -> dropped;
    # doc 3: two equally dense windows -> earliest offset wins
    texts = [
        "x x x x x q x x q q q x",        # 12 tokens, dense at 8..10
        "q x q",                           # 3 tokens < width
        "x y z",
        "q q x x x x q q x x x x",        # ties: pos 0 and pos 6
    ]
    out = run(texts, ["q"], 4)
    assert list(out.index) == [0, 1, 3]
    # doc 0: windows of width 4; best covers q q q at 8..10 ->
    # starts 7 or 8 give 3 hits; earliest = 7
    assert int(out.loc[0, "win_hits"]) == 3
    assert int(out.loc[0, "win_pos"]) == 7
    assert int(out.loc[0, "n_hits"]) == 4
    # doc 1 shorter than width: pos 0, hits = total
    assert int(out.loc[1, "win_pos"]) == 0
    assert int(out.loc[1, "win_hits"]) == 2
    # doc 3 tie -> earliest
    assert int(out.loc[3, "win_pos"]) == 0
    assert int(out.loc[3, "win_hits"]) == 2


def test_jain_fairness_extremes_and_exact():
    from htrc_feature_reader_ray.stages.urltools import jain_fairness

    def run(hosts):
        df = pd.DataFrame({"host": hosts})
        return (jain_fairness(ray.data.from_pandas(df).repartition(3),
                              key_col="host").to_pandas().iloc[0])

    # perfectly equal shares -> J exactly 1, effective = n
    eq = run(["a"] * 5 + ["b"] * 5 + ["c"] * 5)
    assert int(eq["jain_ppm"]) == 1_000_000
    assert int(eq["effective_keys"]) == 3

    # one-host monopoly among n keys -> J -> ~1/n, effective ~ 1
    mono = run(["big"] * 97 + ["s1", "s2", "s3"])
    # S=100, Q=97^2+3=9412, J = 10000/ (4*9412)
    assert int(mono["jain_ppm"]) == 10_000 * 1_000_000 // (4 * 9412)
    assert int(mono["effective_keys"]) == 1

    # hand case: counts (1,2,3): J = 36/(3*14) = 6/7
    h = run(["a", "b", "b", "c", "c", "c"])
    assert int(h["jain_ppm"]) == 36 * 1_000_000 // (3 * 14)
    assert int(h["n_rows"]) == 6 and int(h["n_keys"]) == 3


def test_retrieval_bpref_interleaved_and_contracts():
    from htrc_feature_reader_ray.stages.curate import retrieval_bpref

    # doc 0: 'a'/'b' rich but NEVER adjacent -> top-ranked nonrelevant;
    # docs 1, 2: one adjacent 'a b' each -> relevant, rank below doc 0
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a x a x b x a x b x a b".replace("a b", "a x b"),
                 "a b y y y y y y y y",
                 "a b z z z z z z z z",
                 "w w w w"],
    })
    ds = ray.data.from_pandas(docs).repartition(2)
    out = (retrieval_bpref(ds, {"q": "a b"}, k=20)
           .to_pandas().iloc[0])
    # R=2, one nonrelevant above each -> acc = (2-1)+(2-1) = 2 -> 1/2
    assert int(out["n_relevant"]) == 2
    assert int(out["n_rel_ret"]) == 2
    assert int(out["bpref_ppm"]) == 500_000

    # all relevant retrieved, nothing above -> exactly 1e6
    docs2 = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c", "a b d"],
    })
    out2 = (retrieval_bpref(ray.data.from_pandas(docs2), {"q": "a b"},
                            k=20).to_pandas().iloc[0])
    assert int(out2["bpref_ppm"]) == 1_000_000

    # no relevant docs anywhere -> 0 by contract
    out3 = (retrieval_bpref(ray.data.from_pandas(docs2),
                            {"q": "zz qq"}, k=20).to_pandas().iloc[0])
    assert int(out3["n_relevant"]) == 0
    assert int(out3["bpref_ppm"]) == 0


def test_retrieval_ap_hand_case_and_contracts():
    from htrc_feature_reader_ray.stages.curate import retrieval_ap

    # decoy at rank 1 (nonadjacent a/b rich), relevant at ranks 2 and 3:
    # AP = ((1e6*1//2) + (1e6*2//3)) // 2 with R = 2
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a x a x b x a x b x a x b",
                 "a b y y y y y y y y",
                 "a b z z z z z z z z",
                 "w w w w"],
    })
    out = (retrieval_ap(ray.data.from_pandas(docs).repartition(2),
                        {"q": "a b"}, k=20).to_pandas().iloc[0])
    want = ((1 * 1_000_000 // 2) + (2 * 1_000_000 // 3)) // 2
    assert int(out["ap_ppm"]) == want
    assert int(out["n_rel_ret"]) == 2

    # perfect ranking: all relevant at the top -> exactly 1e6
    docs2 = pd.DataFrame({"doc_id": [0, 1],
                          "text": ["a b c", "a b d"]})
    out2 = (retrieval_ap(ray.data.from_pandas(docs2), {"q": "a b"},
                         k=20).to_pandas().iloc[0])
    assert int(out2["ap_ppm"]) == 1_000_000

    # no relevant -> 0 by contract
    out3 = (retrieval_ap(ray.data.from_pandas(docs2), {"q": "zz qq"},
                         k=20).to_pandas().iloc[0])
    assert int(out3["ap_ppm"]) == 0


def test_naive_bayes_min_count_pruning():
    from htrc_feature_reader_ray.stages.textstats import (
        naive_bayes_confusion,
    )

    # every token is a hapax: min_count=2 prunes the ENTIRE model, so
    # every doc scores prior-only and ties to the smallest class —
    # the adversarial all-unique-vocabulary fixture the broadcast
    # would otherwise have to carry in full
    df = pd.DataFrame({
        "doc_id": range(4),
        "lang": ["aa", "aa", "zz", "zz"],
        "text": ["u1 u2", "u3 u4", "v1 v2", "v3 v4"],
    })
    ds = ray.data.from_pandas(df).repartition(2)

    full = (naive_bayes_confusion(ds, label_col="lang")
            .to_pandas())
    assert int(full[full["lang"] == full["pred_label"]]
               ["n_docs"].sum()) == 4  # disjoint vocab -> recovered

    pruned = (naive_bayes_confusion(ds, label_col="lang", min_count=2)
              .to_pandas())
    assert set(pruned["pred_label"]) == {"aa"}  # prior tie -> smallest
    assert int(pruned["n_docs"].sum()) == 4


def test_naive_bayes_empty_model_class_sql_parity():
    import duckdb

    from htrc_feature_reader_ray.stages.textstats import (
        naive_bayes_confusion,
        naive_bayes_confusion_sql,
    )

    # min_count=2 prunes class "zz"'s ENTIRE vocabulary (all hapaxes)
    # while "aa" keeps tokens: the SQL mirror must LEFT JOIN nl so the
    # empty-model class still pays the per-token unseen default
    # hb(1, V) like the engine, not a prior-only score (ADVICE r3)
    df = pd.DataFrame({
        "doc_id": range(4),
        "lang": ["aa", "aa", "zz", "zz"],
        "text": ["kept kept kept", "kept kept other other",
                 "h1 h2 h3 h4 h5 h6 h7 h8", "h9 h10"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    eng = (naive_bayes_confusion(ds, label_col="lang", min_count=2)
           .to_pandas().sort_values(["lang", "pred_label"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(naive_bayes_confusion_sql(min_count=2)).df()
           .sort_values(["lang", "pred_label"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, sql, check_dtype=False)
    # the zz doc with 8 unseen tokens pays 8 defaults under zz's empty
    # model vs 8 misses under aa's populated one — argmax must agree
    # between engine and SQL, whatever it is
