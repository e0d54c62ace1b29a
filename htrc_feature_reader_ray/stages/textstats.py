"""Per-document text analysis: token counting, quality scoring, language-ID,
fingerprinting — the training-data-pipeline operators layered on the same
vectorized token explode as the folding engine (SURVEY: 'Beyond the
reference').

Every op is a stateless ``map_batches`` (pure projection per row — no
shuffle); all arithmetic is defined to be bit-identical to the DuckDB oracle
(integer counts, IEEE double ratios computed in the same order).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from htrc_feature_reader_ray.functions.tokenize import STOPWORDS_EN, sql_in_list

# language marker-word lists for the n-gram/stopword langid heuristic.
# Priority order is the tie-break (first max wins) — mirrored in LANGID SQL.
LANG_MARKERS = (
    ("en", ("the", "a", "and", "of")),
    ("de", ("der", "die", "und", "das")),
    ("fr", ("le", "la", "et", "les")),
    ("es", ("el", "los", "y", "de")),
)

_WS_RE = re.compile(r"\s+")


def _tok_stats(batch: pa.Table, text_col: str):
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parent = parent.filter(mask).to_numpy()
    return flat, parent, len(batch)


def token_count(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """(ids..., n_tokens) — whitespace token count per document."""

    def fn(batch: pa.Table) -> pa.Table:
        _, parent, n = _tok_stats(batch, text_col)
        counts = np.bincount(parent, minlength=n).astype(np.int64)
        out = batch.select(list(id_cols))
        return out.append_column("n_tokens", pa.array(counts, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


TOKEN_COUNT_SQL = (
    "len(list_filter(string_split({text}, ' '), t -> t != ''))::BIGINT"
)


def quality_score(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Per-doc quality features: n_chars, n_tokens, mean_token_len,
    stopword_ratio (exact-integer numerators; double division mirrors SQL)."""
    stop = set(STOPWORDS_EN)

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, text_col)
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        tok_len = pc.utf8_length(flat).to_numpy()
        sum_len = np.bincount(parent, weights=tok_len, minlength=n).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=pa.array(sorted(stop))).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(parent, weights=is_stop, minlength=n).astype(np.int64)
        denom = np.maximum(n_tokens, 1).astype(np.float64)
        out = batch.select(list(id_cols))
        out = out.append_column(
            "n_chars", pc.utf8_length(batch.column(text_col)).cast(pa.int64())
        )
        out = out.append_column("n_tokens", pa.array(n_tokens, type=pa.int64()))
        out = out.append_column(
            "mean_token_len", pa.array(sum_len / denom, type=pa.float64())
        )
        out = out.append_column(
            "stopword_ratio", pa.array(n_stop / denom, type=pa.float64())
        )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score_sql(text: str = "text") -> str:
    toks = f"list_filter(string_split({text}, ' '), t -> t != '')"
    stop = sql_in_list(sorted(set(STOPWORDS_EN)))
    return f"""
        length({text})::BIGINT AS n_chars,
        len({toks})::BIGINT AS n_tokens,
        (SELECT coalesce(sum(length(t)), 0) FROM unnest({toks}) AS u(t))::BIGINT
            / greatest(len({toks}), 1)::DOUBLE AS mean_token_len,
        (SELECT count(*) FILTER (WHERE t IN {stop}) FROM unnest({toks}) AS u(t))::BIGINT
            / greatest(len({toks}), 1)::DOUBLE AS stopword_ratio
    """


def langid(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Marker-word language ID: count hits per language list, predict the
    first language (in LANG_MARKERS order) achieving the max hit count."""
    markers = [(lang, pa.array(sorted(words))) for lang, words in LANG_MARKERS]

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, text_col)
        hits = []
        for _, words in markers:
            h = pc.is_in(flat, value_set=words).to_numpy(zero_copy_only=False)
            hits.append(np.bincount(parent, weights=h, minlength=n).astype(np.int64))
        hits = np.stack(hits)  # (L, n)
        best = hits.argmax(axis=0)  # first max wins (argmax tie: lowest index)
        langs = np.array([lang for lang, _ in markers], dtype=object)
        out = batch.select(list(id_cols))
        return out.append_column(
            "pred_lang", pa.array(langs[best], type=pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def langid_sql(text: str = "text") -> str:
    toks = f"list_filter(string_split({text}, ' '), t -> t != '')"
    hit_exprs = {
        lang: (
            f"(SELECT count(*) FILTER (WHERE t IN {sql_in_list(sorted(words))}) "
            f"FROM unnest({toks}) AS u(t))"
        )
        for lang, words in LANG_MARKERS
    }
    langs = [lang for lang, _ in LANG_MARKERS]
    cases = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"{hit_exprs[lang]} >= {hit_exprs[other]}"
            for other in langs[i + 1 :]
        )
        prior = " AND ".join(
            f"{hit_exprs[lang]} > {hit_exprs[other]}" for other in langs[:i]
        )
        all_conds = " AND ".join(c for c in (prior, conds) if c) or "TRUE"
        cases.append(f"WHEN {all_conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


def fingerprint(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text (SQL mirror: md5(lower(regexp_replace(...)))) — the
    content-address used by exact dedup."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fps = [
            hashlib.md5(
                _WS_RE.sub(" ", t or "").lower().encode("utf-8")
            ).hexdigest()
            for t in texts
        ]
        out = batch.select(list(id_cols))
        return out.append_column("fp", pa.array(fps, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


FINGERPRINT_SQL = "md5(lower(regexp_replace({text}, '\\s+', ' ', 'g')))"


def winnow_fingerprints(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4, w: int = 4):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS sketch): hash every word ``k``-gram, slide a ``w``-gram window,
    keep each window's minimum hash (rightmost on ties) — guaranteed to
    share a fingerprint with any copy of ≥ ``k+w−1`` contiguous tokens,
    at ~``2/(w+1)`` the density of the full gram set.  The positional
    local-dedup sketch used for code/corpus decontamination where
    doc-level ``fingerprint`` and set-level ``jaccard_join`` are too
    coarse.

    Zero exchange: grams never leave their batch (docs are batch-local);
    output (doc_id, pos, fp) rows — pos is the chosen gram's 0-based
    token offset.  Hashes are md5-64 masked to 63 bits so the SQL mirror
    (md5_number_upper & 2⁶³−1) compares in BIGINT.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    mask63 = np.uint64((1 << 63) - 1)

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
            "fp": pa.array([], type=pa.int64()),
        })
        flat, parent, nrows = _tok_stats(batch, text_col)
        n = len(flat)
        if n < k:
            return empty
        toks = flat.to_numpy(zero_copy_only=False)
        parent = parent.astype(np.int64)
        ok = parent[: n - k + 1] == parent[k - 1:]
        if not ok.any():
            return empty
        gidx = np.flatnonzero(ok)           # gram start token index
        grams = toks[gidx].astype(object)
        for j in range(1, k):
            grams = grams + " "
            grams = grams + toks[gidx + j]
        uniq, inv = np.unique(grams, return_inverse=True)
        h = (md5_hash64(uniq) & mask63).astype(np.int64)[inv]
        gpar = parent[gidx]                 # doc of each gram
        m = len(gidx)
        if m < w:
            return empty
        # windows live in gram space; a doc's grams are one contiguous
        # run, so window-fits-doc is just an endpoint parent check
        wok = gpar[: m - w + 1] == gpar[w - 1:]
        if not wok.any():
            return empty
        nw = m - w + 1
        wmin = h[:nw].copy()
        for j in range(1, w):
            np.minimum(wmin, h[j:j + nw], out=wmin)
        # rightmost argmin: ascending-j writes, last win
        sel = np.zeros(nw, dtype=np.int64)
        for j in range(w):
            hit = h[j:j + nw] == wmin
            sel[hit] = j
        widx = np.flatnonzero(wok)
        pick = widx + sel[widx]             # chosen gram index per window
        # token offset within the doc
        doc_vals, doc_first = np.unique(parent, return_index=True)
        start_of = np.zeros(int(parent.max()) + 1, dtype=np.int64)
        start_of[doc_vals] = doc_first
        pos = gidx[pick] - start_of[gpar[pick]]
        out = np.unique(
            np.stack([gpar[pick], pos, h[pick]], axis=1), axis=0)
        ids = batch.column(id_col).to_numpy()[out[:, 0]]
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "pos": pa.array(out[:, 1], type=pa.int64()),
            "fp": pa.array(out[:, 2], type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def winnow_fingerprints_sql(*, table: str = "documents",
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            k: int = 4, w: int = 4) -> str:
    """SQL mirror: O(n·w) window self-join; min hash per window, rightmost
    position on ties, DISTINCT picks.  ``HAVING count(*) = w`` is the
    window-fits-document test (gram positions are contiguous per doc)."""
    gram = " || ' ' || ".join(f"arr[i + {j}]" for j in range(k))
    return f"""
        WITH base AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS arr
          FROM {table}
        ), g AS (
          SELECT {id_col}, (i - 1)::BIGINT AS p,
                 (md5_number_upper({gram})
                  & 9223372036854775807)::BIGINT AS h
          FROM base,
               unnest(generate_series(1, len(arr) - {k - 1})) AS u(i)
        ), wmin AS (
          SELECT a.{id_col}, a.p AS s, min(b.h) AS m
          FROM g a JOIN g b
            ON b.{id_col} = a.{id_col}
           AND b.p BETWEEN a.p AND a.p + {w - 1}
          GROUP BY 1, 2 HAVING count(*) = {w}
        ), pick AS (
          SELECT w.{id_col}, max(b.p)::BIGINT AS pos, w.m
          FROM wmin w JOIN g b
            ON b.{id_col} = w.{id_col}
           AND b.p BETWEEN w.s AND w.s + {w - 1} AND b.h = w.m
          GROUP BY 1, w.s, w.m
        )
        SELECT DISTINCT {id_col}, pos, m AS fp FROM pick"""


def sentence_stats(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Per-doc sentence segmentation features (quality-filter staples:
    C4 drops pages with too few sentences / sentence-final punctuation):
    ``n_sentences``, ``max_sentence_chars``, ``mean_sentence_chars``.

    A sentence is a ``[.!?]+``-delimited segment that is non-empty after
    whitespace trim. Stateless vectorized ``map_batches`` — RE2 split +
    one ``bincount``/``maximum.at`` pass per batch; integer numerators with
    a single IEEE division, mirrored term-for-term by
    ``sentence_stats_sql``."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sents = pc.split_pattern_regex(
            batch.column(text_col), pattern="[.!?]+"
        )
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        parent = pc.list_parent_indices(sents)
        flat = pc.utf8_trim(pc.list_flatten(sents), characters=" \t\r\n")
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        parent = parent.filter(mask).to_numpy()
        counts = np.bincount(parent, minlength=n).astype(np.int64)
        slen = pc.utf8_length(flat).to_numpy()
        sum_len = np.bincount(parent, weights=slen, minlength=n).astype(
            np.int64
        )
        mx = np.zeros(n, dtype=np.int64)
        np.maximum.at(mx, parent, slen)
        out = batch.select(list(id_cols))
        out = out.append_column(
            "n_sentences", pa.array(counts, type=pa.int64())
        )
        out = out.append_column(
            "max_sentence_chars", pa.array(mx, type=pa.int64())
        )
        out = out.append_column(
            "mean_sentence_chars",
            pa.array(
                sum_len / np.maximum(counts, 1).astype(np.float64),
                type=pa.float64(),
            ),
        )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def sentence_stats_sql(text: str = "text") -> str:
    """Column expressions mirroring :func:`sentence_stats` (same trim
    charset, same greatest(n,1) guard, same single division)."""
    ws = "' ' || chr(9) || chr(10) || chr(13)"
    sents = (
        f"list_filter(list_transform(regexp_split_to_array({text},"
        f" '[.!?]+'), s -> trim(s, {ws})), s -> s != '')"
    )
    return f"""
        len({sents})::BIGINT AS n_sentences,
        coalesce(list_max(list_transform({sents}, s -> length(s))),
                 0)::BIGINT AS max_sentence_chars,
        (SELECT coalesce(sum(length(s)), 0)
         FROM unnest({sents}) AS u(s))::BIGINT
            / greatest(len({sents}), 1)::DOUBLE AS mean_sentence_chars
    """


def dup_line_stats(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Per-doc duplicate-line signals (the Gopher repetition filters
    'duplicate line fraction' / 'duplicate line character fraction'):
    ``n_lines``, ``n_dup_lines`` (every member of a line-value group with
    count > 1), ``dup_line_ppm`` and ``dup_char_ppm`` — exact integers,
    ppm = x·10⁶ // total.

    Lines are ``\\n``-delimited (empty lines count: a run of blank lines is
    itself boilerplate repetition). Per-doc work never leaves the batch —
    zero shuffle; the group-count is one C-level hash groupby per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        lines = pc.split_pattern(batch.column(text_col), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        parent = pc.list_parent_indices(lines).to_numpy()
        flat = pc.list_flatten(lines)
        lens = pc.utf8_length(flat).to_numpy()
        df = pd.DataFrame({"p": parent, "l": flat.to_pandas(), "len": lens})
        grp = df.groupby(["p", "l"], sort=False).agg(
            c=("len", "size"), len=("len", "first")
        ).reset_index()
        p = grp["p"].to_numpy()
        c = grp["c"].to_numpy(dtype=np.int64)
        ln = grp["len"].to_numpy(dtype=np.int64)
        dup = c > 1
        n_lines = np.bincount(p, weights=c, minlength=n).astype(np.int64)
        n_dup = np.bincount(p, weights=c * dup, minlength=n).astype(np.int64)
        chars = np.bincount(p, weights=c * ln, minlength=n).astype(np.int64)
        dchars = np.bincount(
            p, weights=c * ln * dup, minlength=n).astype(np.int64)
        out = batch.select(list(id_cols))
        out = out.append_column("n_lines", pa.array(n_lines, pa.int64()))
        out = out.append_column("n_dup_lines", pa.array(n_dup, pa.int64()))
        out = out.append_column(
            "dup_line_ppm",
            pa.array(n_dup * 1_000_000 // np.maximum(n_lines, 1), pa.int64()),
        )
        out = out.append_column(
            "dup_char_ppm",
            pa.array(dchars * 1_000_000 // np.maximum(chars, 1), pa.int64()),
        )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def dup_line_stats_sql(text: str = "text", *, table: str = "documents",
                       id_col: str = "doc_id") -> str:
    """Self-contained SQL mirror of :func:`dup_line_stats`."""
    return f"""
        WITH lines AS (
          SELECT {id_col}, unnest(string_split({text}, chr(10))) AS l
          FROM {table}
        ), lc AS (
          SELECT {id_col}, l, count(*)::BIGINT AS c,
                 length(l)::BIGINT AS len
          FROM lines GROUP BY {id_col}, l
        )
        SELECT {id_col},
               sum(c)::BIGINT AS n_lines,
               coalesce(sum(c) FILTER (WHERE c > 1), 0)::BIGINT
                   AS n_dup_lines,
               (coalesce(sum(c) FILTER (WHERE c > 1), 0) * 1000000
                   // greatest(sum(c), 1))::BIGINT AS dup_line_ppm,
               (coalesce(sum(c * len) FILTER (WHERE c > 1), 0) * 1000000
                   // greatest(sum(c * len), 1))::BIGINT AS dup_char_ppm
        FROM lc GROUP BY {id_col}"""


def gopher_quality(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Per-doc Gopher-style quality ratios (the rule battery Gopher/Dolma
    apply before model-based filtering): ``n_words``, ``alpha_word_ppm``
    (words containing an ASCII letter), ``symbol_ppm`` (``#`` and ``...``
    occurrences per word), ``min_word_len`` / ``max_word_len``.

    Exact integers throughout (ppm = x·10⁶ // max(n,1)); substring counts
    are non-overlapping on both engines (Arrow ``count_substring`` ==
    SQL replace-length counting). Stateless vectorized map — zero
    shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, text_col)
        n_words = np.bincount(parent, minlength=n).astype(np.int64)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False)
        n_alpha = np.bincount(
            parent, weights=alpha, minlength=n).astype(np.int64)
        text = batch.column(text_col)
        n_sym = (
            pc.count_substring(text, pattern="#").to_numpy(
                zero_copy_only=False).astype(np.int64)
            + pc.count_substring(text, pattern="...").to_numpy(
                zero_copy_only=False).astype(np.int64)
        )
        wl = pc.utf8_length(flat).to_numpy()
        mn = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, parent, wl)
        mn[n_words == 0] = 0
        mx = np.zeros(n, dtype=np.int64)
        np.maximum.at(mx, parent, wl)
        denom = np.maximum(n_words, 1)
        out = batch.select(list(id_cols))
        out = out.append_column("n_words", pa.array(n_words, pa.int64()))
        out = out.append_column(
            "alpha_word_ppm",
            pa.array(n_alpha * 1_000_000 // denom, pa.int64()))
        out = out.append_column(
            "symbol_ppm", pa.array(n_sym * 1_000_000 // denom, pa.int64()))
        out = out.append_column("min_word_len", pa.array(mn, pa.int64()))
        out = out.append_column("max_word_len", pa.array(mx, pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def gopher_quality_sql(text: str = "text") -> str:
    """Column expressions mirroring :func:`gopher_quality`."""
    toks = f"list_filter(string_split({text}, ' '), t -> t != '')"
    n = f"len({toks})"
    nsym = (
        f"((length({text}) - length(replace({text}, '#', '')))::BIGINT"
        f" + (length({text}) - length(replace({text}, '...', '')))::BIGINT"
        " // 3)"
    )
    return f"""
        {n}::BIGINT AS n_words,
        ((SELECT count(*) FILTER (WHERE regexp_matches(t, '[A-Za-z]'))
          FROM unnest({toks}) AS u(t)) * 1000000
            // greatest({n}, 1))::BIGINT AS alpha_word_ppm,
        ({nsym} * 1000000 // greatest({n}, 1))::BIGINT AS symbol_ppm,
        coalesce(list_min(list_transform({toks}, t -> length(t))),
                 0)::BIGINT AS min_word_len,
        coalesce(list_max(list_transform({toks}, t -> length(t))),
                 0)::BIGINT AS max_word_len
    """


def charclass_mix(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Per-doc character-class mix — the cheap script/charset signal
    (CCNet's pre-langid gate; also catches binary-junk pages): ``n_chars``
    plus integer ppm shares of ASCII letters, digits, whitespace, and
    everything else. One RE2 count per class per batch — zero shuffle."""

    classes = (("latin", "[A-Za-z]"), ("digit", "[0-9]"),
               ("space", "[ \t\n\r]"))

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        n = pc.utf8_length(text).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        denom = np.maximum(n, 1)
        out = batch.select(list(id_cols))
        out = out.append_column("n_chars", pa.array(n, pa.int64()))
        rest = n.copy()
        for name, pat in classes:
            c = pc.count_substring_regex(text, pattern=pat).cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            rest = rest - c
            out = out.append_column(
                f"{name}_ppm", pa.array(c * 1_000_000 // denom, pa.int64()))
        out = out.append_column(
            "other_ppm", pa.array(rest * 1_000_000 // denom, pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def charclass_mix_sql(text: str = "text") -> str:
    """Column expressions mirroring :func:`charclass_mix` (ASCII classes
    only, so RE2 and DuckDB regex semantics cannot diverge)."""
    n = f"length({text})"
    latin = f"length(regexp_replace({text}, '[^A-Za-z]', '', 'g'))"
    digit = f"length(regexp_replace({text}, '[^0-9]', '', 'g'))"
    space = (f"({n} - length(regexp_replace({text},"
             f" '[ ' || chr(9) || chr(10) || chr(13) || ']', '', 'g')))")
    return f"""
        {n}::BIGINT AS n_chars,
        ({latin} * 1000000 // greatest({n}, 1))::BIGINT AS latin_ppm,
        ({digit} * 1000000 // greatest({n}, 1))::BIGINT AS digit_ppm,
        ({space} * 1000000 // greatest({n}, 1))::BIGINT AS space_ppm,
        (({n} - {latin} - {digit} - {space}) * 1000000
            // greatest({n}, 1))::BIGINT AS other_ppm
    """


def quality_rule_flags(ds, *, text_col: str = "text", id_cols=("doc_id",),
                       min_words: int = 50, max_words: int = 100_000,
                       min_alpha_ppm: int = 800_000,
                       max_symbol_ppm: int = 100_000,
                       max_word_len_cap: int = 25):
    """The Gopher/C4 rule battery applied as a KEEP/DROP decision with an
    auditable reason bitmask: bit 0 = word count outside
    [min_words, max_words], bit 1 = alpha-word share below threshold,
    bit 2 = symbol share above threshold, bit 3 = a degenerate over-long
    token. ``keep`` = no bit set. Composes :func:`gopher_quality`'s
    vectorized signal kernel — still one stateless map, zero shuffle."""

    def flags(t: pa.Table) -> pa.Table:
        nw = t.column("n_words").to_numpy()
        f = ((nw < min_words) | (nw > max_words)).astype(np.int64)
        f |= (t.column("alpha_word_ppm").to_numpy()
              < min_alpha_ppm).astype(np.int64) << 1
        f |= (t.column("symbol_ppm").to_numpy()
              > max_symbol_ppm).astype(np.int64) << 2
        f |= (t.column("max_word_len").to_numpy()
              > max_word_len_cap).astype(np.int64) << 3
        out = t.select(list(id_cols))
        out = out.append_column("quality_flags", pa.array(f, pa.int64()))
        return out.append_column("keep", pa.array(f == 0, pa.bool_()))

    return gopher_quality(ds, text_col=text_col, id_cols=id_cols).map_batches(
        flags, batch_format="pyarrow")


def quality_rule_flags_sql(*, text: str = "text", id_cols: str = "doc_id",
                           table: str = "documents",
                           min_words: int = 50, max_words: int = 100_000,
                           min_alpha_ppm: int = 800_000,
                           max_symbol_ppm: int = 100_000,
                           max_word_len_cap: int = 25) -> str:
    """SQL mirror: the same bit arithmetic over the gopher signal CTE."""
    bits = (
        f"(CASE WHEN n_words < {min_words} OR n_words > {max_words}"
        f" THEN 1 ELSE 0 END"
        f" + CASE WHEN alpha_word_ppm < {min_alpha_ppm} THEN 2 ELSE 0 END"
        f" + CASE WHEN symbol_ppm > {max_symbol_ppm} THEN 4 ELSE 0 END"
        f" + CASE WHEN max_word_len > {max_word_len_cap} THEN 8 ELSE 0 END)"
    )
    return f"""
        WITH g AS (SELECT {id_cols}, {gopher_quality_sql(text)} FROM {table})
        SELECT {id_cols}, {bits}::BIGINT AS quality_flags,
               ({bits} = 0) AS keep
        FROM g"""


def readability(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Flesch-style reading-ease in exact integer milli-points:

        flesch_milli = 206835 − (1015·W) // S − (84600·Y) // W

    with W = word count, S = sentence count ([.!?]+ runs, floor 1), and
    Y = vowel-group runs ([aeiou]+, the standard cheap syllable proxy) —
    each division floored SEPARATELY as the reproducibility contract
    (float Flesch differs in the last bits across platforms). A classic
    curation feature next to gopher_quality. Zero exchange; all three
    counts come from vectorized RE2 kernels (Arrow and DuckDB embed the
    same regex engine)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(text_col), pa.string())
        text = pc.coalesce(text, pa.scalar("", type=pa.string()))
        flat, parent, nrows = _tok_stats(batch, text_col)
        w = np.bincount(parent, minlength=nrows).astype(np.int64)
        s = pc.count_substring_regex(
            text, "[.!?]+").to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.count_substring_regex(
            text, "[aeiou]+").to_numpy(zero_copy_only=False).astype(
            np.int64)
        w1 = np.maximum(w, 1)
        s1 = np.maximum(s, 1)
        flesch = 206835 - (1015 * w1) // s1 - (84600 * y) // w1
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(w),
            "n_sentences": pa.array(s),
            "n_vowel_groups": pa.array(y),
            "flesch_milli": pa.array(flesch.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def readability_sql(*, table: str = "documents", text: str = "text",
                    id_col: str = "doc_id") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH b AS (
          SELECT {id_col},
                 len({toks})::BIGINT AS w,
                 len(regexp_extract_all({text}, '[.!?]+'))::BIGINT AS s,
                 len(regexp_extract_all({text}, '[aeiou]+'))::BIGINT AS y
          FROM {table}
        )
        SELECT {id_col}, w AS n_words, s AS n_sentences,
               y AS n_vowel_groups,
               (206835 - (1015 * greatest(w, 1)) // greatest(s, 1)
                - (84600 * y) // greatest(w, 1))::BIGINT AS flesch_milli
        FROM b"""


def quality_langid(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """Fused :func:`quality_score` + :func:`langid` — ONE pass, ONE
    tokenization, no join: the curation gate needs both per-doc feature
    sets, and computing them as separate ops costs a second full corpus
    scan plus a doc-keyed bucket join that this fusion deletes outright.
    Emits the quality columns plus ``pred_lang``."""
    stop = set(STOPWORDS_EN)
    markers = [(lang, pa.array(sorted(words)))
               for lang, words in LANG_MARKERS]

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, text_col)
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        tok_len = pc.utf8_length(flat).to_numpy()
        sum_len = np.bincount(
            parent, weights=tok_len, minlength=n).astype(np.int64)
        is_stop = pc.is_in(
            flat, value_set=pa.array(sorted(stop))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parent, weights=is_stop, minlength=n).astype(np.int64)
        denom = np.maximum(n_tokens, 1).astype(np.float64)
        hits = []
        for _, words in markers:
            h = pc.is_in(flat, value_set=words).to_numpy(
                zero_copy_only=False)
            hits.append(np.bincount(
                parent, weights=h, minlength=n).astype(np.int64))
        best = np.stack(hits).argmax(axis=0)
        langs = np.array([lang for lang, _ in markers], dtype=object)
        out = batch.select(list(id_cols))
        out = out.append_column(
            "n_chars",
            pc.utf8_length(batch.column(text_col)).cast(pa.int64()))
        out = out.append_column(
            "n_tokens", pa.array(n_tokens, type=pa.int64()))
        out = out.append_column(
            "mean_token_len", pa.array(sum_len / denom, type=pa.float64()))
        out = out.append_column(
            "stopword_ratio", pa.array(n_stop / denom, type=pa.float64()))
        return out.append_column(
            "pred_lang", pa.array(langs[best], type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def token_entropy(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Shannon entropy of the doc's OWN token distribution,
    in exact occurrence-weighted half-bits — the low-entropy gibberish
    gate ("aaa aaa aaa" scores 0; keyword-stuffed / template pages score
    far below prose of the same length). The module's log-free contract:

        entropy_half_bits = Σ_types c · (bitlen(n²) − bitlen(c²))

    with ``n`` the doc's token count — each term is the half-bit cost of
    the type under the doc's empirical distribution (cf. unigram_train),
    so the sum ≈ 2·n·H(doc) exactly in integers. Zero exchange: types
    are counted within the doc's own batch row. Output
    ``(id_col, n_tokens, entropy_half_bits)``; empty docs score (0, 0).
    """
    from htrc_feature_reader_ray.stages.profile import _ilog2

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        n = np.bincount(parent, minlength=nrows).astype(np.int64)
        ent = np.zeros(nrows, dtype=np.int64)
        if len(flat):
            t = pa.table({"d": pa.array(parent.astype(np.int64)),
                          "tok": flat})
            g = t.group_by(["d", "tok"]).aggregate([([], "count_all")])
            d = g.column("d").to_numpy().astype(np.int64)
            c = g.column("count_all").to_numpy().astype(np.int64)
            nd = n[d]
            term = c * ((_ilog2(nd * nd) + 1) - (_ilog2(c * c) + 1))
            np.add.at(ent, d, term)
        out = batch.select([id_col])
        out = out.append_column("n_tokens", pa.array(n, type=pa.int64()))
        return out.append_column("entropy_half_bits",
                                 pa.array(ent, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def token_entropy_sql(*, table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """SQL replay: per-(doc, type) counts, the identical bit-length
    difference, LEFT-JOIN finish so empty docs keep (0, 0). BIGINT
    domain: docs under 2³¹·⁵ tokens (any real document)."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        tc AS (
          SELECT {id_col}, t.tok, count(*)::BIGINT AS c,
                 max(len(arr))::BIGINT AS n
          FROM base, unnest(arr) AS t(tok) GROUP BY 1, 2
        ),
        scored AS (
          SELECT {id_col}, max(n)::BIGINT AS n_tokens,
                 sum(c * (length(format('{{:b}}', n * n))
                          - length(format('{{:b}}', c * c))))::BIGINT
                     AS entropy_half_bits
          FROM tc GROUP BY 1
        )
        SELECT b.{id_col},
               coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(s.entropy_half_bits, 0)::BIGINT
                   AS entropy_half_bits
        FROM {table} b LEFT JOIN scored s USING ({id_col})"""


# classic UTF-8-decoded-as-Latin-1/cp1252 two-step damage digraphs: the
# high-frequency western accents (Ã + second byte) and the cp1252 punct
# family (â€¦).  A fixed, documented list — both engine and SQL count the
# SAME literals, so the contract is exact by construction.
MOJIBAKE_PATTERNS = (
    "Ã©",  # Ã© = é
    "Ã¨",  # Ã¨ = è
    "Ã¡",  # Ã¡ = á
    "Ã³",  # Ã³ = ó
    "Ã¼",  # Ã¼ = ü
    "Ã±",  # Ã± = ñ
    "â€™",  # â€™ = ’
    "â€œ",  # â€œ = “
    "â€“",  # â€“ = –
    "â€”",  # â€” = —
    "Â»",  # Â» = »
    "Â«",  # Â« = «
)


def mojibake_stats(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Encoding-damage detection — the web-corpus gate next to langid and
    quality scoring: per doc the count of U+FFFD replacement characters
    (a decoder already gave up) and of the classic UTF-8-read-as-
    Latin-1/cp1252 mojibake digraphs (``MOJIBAKE_PATTERNS``: Ã©-family
    accents + the â€¦ punctuation family), plus a damage rate in exact
    ppm of the doc's character count.  Re-encode repair is out of scope
    by contract — this is the *detector* that routes a shard to one.

    Scale shape: stateless vectorized pass (one ``pc.count_substring``
    per pattern — non-overlapping left-to-right counts, matching SQL's
    replace()-difference arithmetic), zero exchange.  Output
    ``(id, n_fffd, n_mojibake, n_chars, damage_ppm)``; empty docs score
    0 by contract.
    """
    import pyarrow.compute as pc

    def stats(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(text_col), pa.large_string())
        n = len(batch)
        fffd = pc.count_substring(txt, "�").to_numpy(
            zero_copy_only=False).astype(np.int64)
        moji = np.zeros(n, dtype=np.int64)
        for pat in MOJIBAKE_PATTERNS:
            moji += pc.count_substring(txt, pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
        chars = pc.utf8_length(txt).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dmg = np.zeros(n, dtype=np.int64)
        nz = chars > 0
        dmg[nz] = (fffd[nz] + moji[nz]) * 1_000_000 // chars[nz]
        return pa.table({
            id_col: batch.column(id_col),
            "n_fffd": pa.array(fffd),
            "n_mojibake": pa.array(moji),
            "n_chars": pa.array(chars),
            "damage_ppm": pa.array(dmg),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def mojibake_stats_sql(*, table: str = "documents", text: str = "text",
                       id_col: str = "doc_id") -> str:
    def cnt(pat: str) -> str:
        lit = pat.replace("'", "''")
        return (f"(length({text}) - length(replace({text}, '{lit}', '')))"
                f" // {len(pat)}")

    moji = " + ".join(cnt(p) for p in MOJIBAKE_PATTERNS)
    # subquery (not a WITH) so callers can prepend their own CTE preamble
    return f"""
        SELECT {id_col}, n_fffd, n_mojibake, n_chars,
               (CASE WHEN n_chars > 0
                     THEN (n_fffd + n_mojibake) * 1000000 // n_chars
                     ELSE 0 END)::BIGINT AS damage_ppm
        FROM (
          SELECT {id_col},
                 ({cnt(chr(0xFFFD))})::BIGINT AS n_fffd,
                 ({moji})::BIGINT AS n_mojibake,
                 length({text})::BIGINT AS n_chars
          FROM {table}
        ) b"""


# ---------------------------------------------------------------------------
# hapax legomena rate per group (vocabulary-shape / tokenizer-health)


def hapax_rate(ds, *, group_col: str = "lang", text_col: str = "text",
               num_buckets: int = 32):
    """Per-group hapax legomena rate: the fraction of a group's VOCABULARY
    (distinct whitespace tokens, the engine-wide tokenizer contract) that
    occurs exactly once, in exact integer ppm — the corpus-level
    vocabulary-shape diagnostic next to the per-doc TTR of
    ``lexical_diversity``: a high hapax share means a long tail the
    tokenizer will shatter into bytes (vocab sizing input), and a hapax
    share that is too LOW for natural text is the fingerprint of
    templated/machine-generated content (natural language runs ~40-60%
    hapax by Zipf; boilerplate collapses it). Emits ``(group, vocab_size,
    n_hapax, n_tokens, hapax_ppm)`` with ``hapax_ppm = n_hapax·10⁶ //
    vocab_size``.

    Scale shape: per-batch (group, token, count) Arrow partials collapse
    each batch's text map-side, ONE token-bucketed exchange of partial
    rows (token strings cross once, counted — never per-occurrence), the
    exact per-(group,token) fold finishes in-bucket, and a second
    audit-sized fold reduces to one row per group. Python-int ppm on the
    bounded group table."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        grp = batch.column(group_col).take(pa.array(parent))
        tb = pa.table({group_col: grp, "token": flat})
        g = tb.group_by([group_col, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "token", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="token",
    )

    def per_group_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False).agg(
            vocab=("c", "size"),
            hapax=("c", lambda s: int((s == 1).sum())),
            toks=("c", "sum"))
        return g

    small = (folded.map_batches(per_group_partial, batch_format="pandas")
             .to_pandas()
             .groupby(group_col, as_index=False)
             .agg(vocab=("vocab", "sum"), hapax=("hapax", "sum"),
                  toks=("toks", "sum"))
             .sort_values(group_col))
    out = pd.DataFrame({
        group_col: small[group_col].to_numpy(),
        "vocab_size": small["vocab"].to_numpy().astype(np.int64),
        "n_hapax": small["hapax"].to_numpy().astype(np.int64),
        "n_tokens": small["toks"].to_numpy().astype(np.int64),
        "hapax_ppm": np.array(
            [int(h) * 1_000_000 // max(int(v), 1)
             for h, v in zip(small["hapax"], small["vocab"])],
            dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def hapax_rate_sql(*, table: str = "documents", group: str = "lang",
                   text: str = "text") -> str:
    """SQL mirror: unnest the identical tokenizer, (group, token) fold,
    hapax filter, greatest-guarded ppm."""
    return f"""
        WITH tok AS (
          SELECT {group} AS g, t.tok
          FROM {table},
               unnest(list_filter(string_split({text}, ' '),
                                  x -> x != '')) AS t(tok)
        ),
        vt AS (SELECT g, tok, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2)
        SELECT g AS {group}, count(*)::BIGINT AS vocab_size,
               count(*) FILTER (WHERE c = 1)::BIGINT AS n_hapax,
               sum(c)::BIGINT AS n_tokens,
               (count(*) FILTER (WHERE c = 1)::HUGEINT * 1000000
                // greatest(count(*), 1))::BIGINT AS hapax_ppm
        FROM vt GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# Zipf-law conformance per group (token-distribution health)


def zipf_deviation(ds, *, group_col: str = "lang", text_col: str = "text",
                   top_k: int = 20, num_buckets: int = 32):
    """Per-group Zipf-law conformance over the top-K token ranks, in exact
    integer ppm — the distribution-health sibling of
    :func:`~htrc_feature_reader_ray.stages.profile.benford_audit` for
    TEXT: natural language's rank-frequency curve tracks ``c_r ≈ c_1/r``
    (Zipf 1949, s=1), so a head that is too FLAT fingerprints
    templated/keyword-stuffed content while one too STEEP means a few
    boilerplate tokens own the corpus — either way the group deserves a
    curation look before training. Integer-exact contract (no float fits,
    no logs): expected count at rank r is ``c_1 // r`` (c_1 = the
    observed top count), ranks by count desc with token-ascending ties,
    ``zipf_dev_ppm = Σ_{r≤K} |obs_r − c_1//r| · 10⁶ // Σ_{r≤K} obs_r``.
    Groups with fewer than K types use their available ranks (``n_top``
    reports how many).

    Scale shape: the (group, token, count) fold with token-bucketed
    exchange (hapax_rate's posture — token strings cross once, counted),
    then the lossless local-top-k combiner shrinks per-batch output to
    ≤ groups·K rows before one group fold; the ≤ groups·K table finishes
    on the driver in Python ints."""
    from htrc_feature_reader_ray.stages.fold import topk_per_group
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        grp = batch.column(group_col).take(pa.array(parent))
        tb = pa.table({group_col: grp, "token": flat})
        g = tb.group_by([group_col, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "token", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="token",
    )
    top = topk_per_group(
        folded, group_cols=[group_col], sort_col="c", k=top_k,
        tie_cols=("token",), descending=True, rank_col="r",
    ).to_pandas()

    rows = []
    for grp, sub in top.groupby(group_col, sort=True):
        sub = sub.sort_values("r")
        obs = [int(x) for x in sub["c"]]
        c1 = obs[0]
        dev = sum(abs(o - c1 // r) for r, o in enumerate(obs, start=1))
        tot = sum(obs)
        rows.append((grp, len(obs), c1,
                     dev * 1_000_000 // max(tot, 1)))
    out = pd.DataFrame(rows, columns=[group_col, "n_top", "c1",
                                      "zipf_dev_ppm"])
    for col in ("n_top", "c1", "zipf_dev_ppm"):
        out[col] = out[col].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def zipf_deviation_sql(*, table: str = "documents", group: str = "lang",
                       text: str = "text", top_k: int = 20) -> str:
    """SQL mirror: token fold, (count DESC, token ASC) row_number ≤ K,
    first_value head count, HUGEINT deviation sum."""
    return f"""
        WITH tok AS (
          SELECT {group} AS g, t.tok
          FROM {table},
               unnest(list_filter(string_split({text}, ' '),
                                  x -> x != '')) AS t(tok)
        ),
        vt AS (SELECT g, tok, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
        ranked AS (
          SELECT g, c,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY c DESC, tok ASC) AS r,
                 first_value(c) OVER (PARTITION BY g
                                      ORDER BY c DESC, tok ASC) AS c1
          FROM vt QUALIFY r <= {top_k}
        )
        SELECT g AS {group}, count(*)::BIGINT AS n_top,
               max(c1)::BIGINT AS c1,
               (sum(abs(c - c1 // r))::HUGEINT * 1000000
                // greatest(sum(c), 1))::BIGINT AS zipf_dev_ppm
        FROM ranked GROUP BY 1 ORDER BY 1"""


def langid_margin(ds, *, text_col: str = "text", id_cols=("doc_id",),
                  abstain_below_ppm: int = 300_000):
    """Language-ID with a CONFIDENCE MARGIN and an abstain flag — the
    router's version of :func:`langid`: argmax alone silently routes
    mixed-language and marker-free docs to whatever wins a 1-vs-1 hit
    tie, while every production language-ID (CLD2/CLD3, fastText's
    threshold idiom) exposes a reliability bit instead. Margin =
    ``(top − second)·10⁶ // max(top, 1)`` over the same marker-hit
    counts as langid (0 when the top two tie; 0 when no marker hits at
    all — both abstain); ``abstain = margin < abstain_below_ppm OR top
    == 0``. Routing contract: abstained docs go to the und/human-review
    queue rather than polluting a language bucket.

    Same zero-exchange stateless kernel as langid (one is_in pass per
    language, bincount fold per batch)."""
    markers = [(lang, pa.array(sorted(words))) for lang, words in LANG_MARKERS]

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, text_col)
        hits = []
        for _, words in markers:
            h = pc.is_in(flat, value_set=words).to_numpy(
                zero_copy_only=False)
            hits.append(np.bincount(parent, weights=h,
                                    minlength=n).astype(np.int64))
        hits = np.stack(hits)  # (L, n)
        best = hits.argmax(axis=0)
        srt = np.sort(hits, axis=0)
        top = srt[-1]
        second = srt[-2] if hits.shape[0] >= 2 else np.zeros_like(top)
        margin = (top - second) * 1_000_000 // np.maximum(top, 1)
        abstain = (margin < abstain_below_ppm) | (top == 0)
        langs = np.array([lang for lang, _ in markers], dtype=object)
        out = batch.select(list(id_cols))
        out = out.append_column(
            "pred_lang", pa.array(langs[best], type=pa.string()))
        out = out.append_column(
            "margin_ppm", pa.array(margin, type=pa.int64()))
        return out.append_column("abstain", pa.array(abstain))

    return ds.map_batches(fn, batch_format="pyarrow")


def langid_margin_sql(text: str = "text",
                      abstain_below_ppm: int = 300_000) -> str:
    """Column expressions mirroring :func:`langid_margin`: the hit-count
    subqueries sorted as a list literal for top/second."""
    toks = f"list_filter(string_split({text}, ' '), t -> t != '')"
    hit_exprs = [
        (f"(SELECT count(*) FILTER (WHERE t IN {sql_in_list(sorted(words))})"
         f" FROM unnest({toks}) AS u(t))")
        for _, words in LANG_MARKERS
    ]
    arr = "list_sort([" + ", ".join(hit_exprs) + "], 'DESC')"
    top = f"({arr}[1])"
    second = f"({arr}[2])"
    margin = f"(({top} - {second}) * 1000000 // greatest({top}, 1))"
    return (f"{langid_sql(text)} AS pred_lang, "
            f"{margin}::BIGINT AS margin_ppm, "
            f"({margin} < {abstain_below_ppm} OR {top} = 0) AS abstain")


def lang_mismatch_by_source(ds, *, source_col: str = "source",
                            lang_col: str = "lang",
                            text_col: str = "text"):
    """Per-source disagreement rate between the STORED language label and
    the marker-word language-ID — the feed-level QA rollup over the
    per-doc signal (:func:`~htrc_feature_reader_ray.stages.profile.
    cohens_kappa` scores the labeler corpus-wide; this localizes WHICH
    ingest feed mislabels, which is the actionable unit — you fix or
    re-tag a feed, not a kappa). ``mismatch_ppm = n_mismatch·10⁶ //
    n_docs`` exact, prediction by the langid argmax contract.

    Zero exchange: label and text ride the same row, so the compare is
    map-side and only (source, n, n_mismatch) partials cross — one
    audit-sized fold."""
    markers = [(lang, pa.array(sorted(words)))
               for lang, words in LANG_MARKERS]

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, text_col)
        hits = []
        for _, words in markers:
            h = pc.is_in(flat, value_set=words).to_numpy(
                zero_copy_only=False)
            hits.append(np.bincount(parent, weights=h,
                                    minlength=n).astype(np.int64))
        best = np.stack(hits).argmax(axis=0)
        langs = np.array([lang for lang, _ in markers], dtype=object)
        pred = langs[best]
        stored = batch.column(lang_col).to_numpy(zero_copy_only=False)
        mism = (pred != stored).astype(np.int64)
        df = pd.DataFrame({
            "source": batch.column(source_col).to_numpy(
                zero_copy_only=False),
            "m": mism,
        })
        g = df.groupby("source", as_index=False).agg(
            n=("m", "size"), nm=("m", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    small = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby("source", as_index=False)
             .agg(n=("n", "sum"), nm=("nm", "sum"))
             .sort_values("source"))
    out = pd.DataFrame({
        source_col: small["source"].to_numpy(),
        "n_docs": small["n"].to_numpy().astype(np.int64),
        "n_mismatch": small["nm"].to_numpy().astype(np.int64),
        "mismatch_ppm": np.array(
            [int(m) * 1_000_000 // max(int(n), 1)
             for m, n in zip(small["nm"], small["n"])], dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def lang_mismatch_by_source_sql(*, table: str = "documents",
                                source: str = "source",
                                lang: str = "lang",
                                text: str = "text") -> str:
    """SQL mirror: the langid CASE per row, FILTER-counted per source."""
    pred = langid_sql(text)
    return f"""
        SELECT {source}, count(*)::BIGINT AS n_docs,
               count(*) FILTER (WHERE {pred} <> {lang})::BIGINT
                   AS n_mismatch,
               (count(*) FILTER (WHERE {pred} <> {lang})::HUGEINT
                * 1000000 // greatest(count(*), 1))::BIGINT
                   AS mismatch_ppm
        FROM {table} GROUP BY 1 ORDER BY 1"""


def vocab_richness(ds, *, group_col: str = "lang", text_col: str = "text",
                   ngram: int = 1, num_buckets: int = 32):
    """Per-group vocabulary-richness ESTIMATORS — what :func:`hapax_rate`
    describes, this PREDICTS: how many distinct tokens exist beyond the
    sample (the vocab-sizing question a tokenizer-training pass asks
    before committing to a vocab budget), and how much probability mass
    the next batch will spend on unseen types.

    - ``chao1`` (Chao 1984, the abundance-based richness floor):
      ``D + f1·(f1−1) // (2·(f2+1))`` — the bias-corrected form, defined
      even when no doubletons exist; D = observed distinct, f1/f2 =
      singleton/doubleton type counts. A lower bound on the true
      vocabulary size, exact integers with ONE floor.
    - ``unseen_mass_ppm`` (Good–Turing missing mass, Good 1953):
      ``f1·10⁶ // N`` — the probability the NEXT token is a new type;
      the number that prices OOV risk for a frozen vocab.

    Output per group: ``(group, vocab_size, f1, f2, n_tokens, chao1,
    unseen_mass_ppm)``.

    ``ngram=2`` estimates over BIGRAM types instead — the n-gram-LM
    coverage question (a closed unigram vocabulary can still have a
    long open bigram tail, which is exactly what prices an n-gram
    model's backoff mass).

    Scale shape: hapax_rate's verbatim — per-batch (group, type, count)
    map-side collapse, ONE type-bucketed exchange (type strings cross
    once, counted), in-bucket exact fold + per-group f1/f2 partials,
    audit-sized finish in Python ints."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    if ngram not in (1, 2):
        raise ValueError("ngram must be 1 or 2")

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        if ngram == 2:
            same = parent[1:] == parent[:-1]
            a = pa.compute.binary_join_element_wise(
                flat.slice(0, max(len(flat) - 1, 0)),
                flat.slice(1), " ")
            flat = a.filter(pa.array(same))
            parent = parent[:-1][same] if len(parent) else parent
        grp = batch.column(group_col).take(pa.array(parent))
        tb = pa.table({group_col: grp, "token": flat})
        g = tb.group_by([group_col, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "token", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="token",
    )

    def per_group_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_col, as_index=False).agg(
            vocab=("c", "size"),
            f1=("c", lambda s: int((s == 1).sum())),
            f2=("c", lambda s: int((s == 2).sum())),
            toks=("c", "sum"))

    small = (folded.map_batches(per_group_partial, batch_format="pandas")
             .to_pandas()
             .groupby(group_col, as_index=False)
             .agg(vocab=("vocab", "sum"), f1=("f1", "sum"),
                  f2=("f2", "sum"), toks=("toks", "sum"))
             .sort_values(group_col))
    chao1 = [int(d) + int(f1) * (int(f1) - 1) // (2 * (int(f2) + 1))
             for d, f1, f2 in zip(small["vocab"], small["f1"],
                                  small["f2"])]
    unseen = [int(f1) * 1_000_000 // max(int(n), 1)
              for f1, n in zip(small["f1"], small["toks"])]
    out = pd.DataFrame({
        group_col: small[group_col].to_numpy(),
        "vocab_size": small["vocab"].to_numpy().astype(np.int64),
        "f1": small["f1"].to_numpy().astype(np.int64),
        "f2": small["f2"].to_numpy().astype(np.int64),
        "n_tokens": small["toks"].to_numpy().astype(np.int64),
        "chao1": np.array(chao1, dtype=np.int64),
        "unseen_mass_ppm": np.array(unseen, dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def vocab_richness_sql(*, table: str = "documents", group: str = "lang",
                       text: str = "text", ngram: int = 1) -> str:
    """SQL mirror: the hapax_rate fold (adjacent-pair join for
    ngram=2) + bias-corrected Chao1 and Good–Turing missing mass,
    HUGEINT floors."""
    if ngram == 2:
        tok_cte = f"""
        base AS (SELECT {group} AS g,
                        list_filter(string_split({text}, ' '),
                                    x -> x != '') AS arr
                 FROM {table}),
        tok AS (
          SELECT g, arr[i.i] || ' ' || arr[i.i + 1] AS tok
          FROM base, unnest(generate_series(1, len(arr) - 1)) AS i(i)
        )"""
    else:
        tok_cte = f"""
        tok AS (
          SELECT {group} AS g, t.tok
          FROM {table},
               unnest(list_filter(string_split({text}, ' '),
                                  x -> x != '')) AS t(tok)
        )"""
    return f"""
        WITH {tok_cte},
        vt AS (SELECT g, tok, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2)
        SELECT g AS {group}, count(*)::BIGINT AS vocab_size,
               count(*) FILTER (WHERE c = 1)::BIGINT AS f1,
               count(*) FILTER (WHERE c = 2)::BIGINT AS f2,
               sum(c)::BIGINT AS n_tokens,
               (count(*)
                + count(*) FILTER (WHERE c = 1)::HUGEINT
                  * (count(*) FILTER (WHERE c = 1) - 1)
                  // (2 * (count(*) FILTER (WHERE c = 2) + 1)))::BIGINT
                   AS chao1,
               (count(*) FILTER (WHERE c = 1)::HUGEINT * 1000000
                // greatest(sum(c), 1))::BIGINT AS unseen_mass_ppm
        FROM vt GROUP BY 1 ORDER BY 1"""


def naive_bayes_confusion(ds, *, text_col: str = "text",
                          label_col: str = "lang",
                          min_count: int = 1,
                          num_buckets: int = 32):
    """Self-supervised multinomial Naive Bayes: TRAIN a bag-of-words
    classifier on the corpus's own (label, token) counts and score
    every document back, reporting the label×prediction CONFUSION
    matrix — the label-hygiene audit one step past :func:`langid`'s
    fixed marker lists (NB learns the discriminative vocabulary from
    the data itself; a label whose own NB model can't recover it is
    either noisy or lexically indistinct from a sibling — exactly
    what a mixture-weights or filter-threshold pass wants to know
    before trusting the label column), and the repo's classifier
    analog of the tokenizer TRAINERS (build_vocab/bpe/unigram): a
    trained model as a broadcast table.

    Exact integer contract — Laplace α = 1 likelihoods and document
    priors in the module's log-free HALF-BIT identity
    (:func:`token_entropy`): per token w and class l

        hb(w|l)  = bitlen((c_{l,w}+1)²) − bitlen((n_l+V)²)
        prior(l) = bitlen(d_l²) − bitlen(D²)
        score(doc, l) = prior(l) + Σ_w hb(w|l)      (multiplicity)

    with n_l = class token mass, V = corpus vocab size, d_l/D doc
    counts. Prediction = argmax, ties to the LEXICOGRAPHICALLY
    smallest class (argmax-first over the sorted class order ==
    the mirror's ``ORDER BY score DESC, cl ASC``). Empty documents
    score prior-only (kept, both sides).

    Scale shape: ONE token-bucketed (label, token) count fold builds
    the model; the model table is the module's canonical worker-fit
    small side (the encode_tokens vocabulary contract), broadcast
    once; scoring is one stateless map_batches gather (tokens →
    vocab rows → (docs × classes) np.add.at) and the confusion fold
    is ≤ L² rows. ``min_count`` is the raw-web pruning floor: a token
    whose CORPUS-WIDE count (summed over classes) is below it is
    dropped from the model — it scores through the unseen default and
    leaves V — bounding the broadcast on a heavy-tailed vocab
    (semantically a vocabulary choice, not an approximation; the
    mirror applies the identical floor). Output ``(label_col,
    pred_label, n_docs)``."""
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def count_partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        labs = batch.column(label_col).to_numpy(zero_copy_only=False)
        t = pa.table({"cl": pa.array(labs[parent]), "tok": flat})
        g = t.group_by(["cl", "tok"]).aggregate([([], "count_all")])
        return g.rename_columns(["cl", "tok", "c"])

    model_pd = bucketed_aggregate(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["cl", "tok"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="tok",
    ).to_pandas()
    if min_count > 1:
        keep = (model_pd.groupby("tok")["c"].transform("sum")
                >= min_count)
        model_pd = model_pd[keep].reset_index(drop=True)

    def doc_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([label_col]).group_by([label_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["cl", "d"])

    docs_pd = (ds.map_batches(doc_partial, batch_format="pyarrow")
               .groupby("cl").sum("d").to_pandas()
               .rename(columns={"sum(d)": "d"}))

    classes = sorted(docs_pd["cl"].astype(str))
    lidx = {c: i for i, c in enumerate(classes)}
    d_tot = int(docs_pd["d"].sum())
    d_by = {str(r["cl"]): int(r["d"]) for _, r in docs_pd.iterrows()}
    n_l = model_pd.groupby("cl")["c"].sum()
    vocab = pd.Index(model_pd["tok"].unique())
    V = len(vocab)

    def hb(x: int, den: int) -> int:
        return (x * x).bit_length() - (den * den).bit_length()

    den_l = [int(n_l.get(c, 0)) + V for c in classes]
    # (V x L) half-bit matrix + the unseen-token column, Python ints
    # (c+1)^2 passes any magnitude) cast down to int64 scores
    mat = np.zeros((V + 1, len(classes)), dtype=np.int64)
    for ci, c in enumerate(classes):
        mat[:, ci] = hb(1, den_l[ci])        # unseen default
    rows = vocab.get_indexer(model_pd["tok"])
    for r, c, cnt in zip(rows, model_pd["cl"], model_pd["c"]):
        mat[r, lidx[str(c)]] = hb(int(cnt) + 1, den_l[lidx[str(c)]])
    prior = np.array([hb(d_by.get(c, 0), d_tot) for c in classes],
                     dtype=np.int64)
    model_ref = ray.put((vocab, mat, prior, np.array(classes,
                                                     dtype=object)))

    def score(batch: pa.Table) -> pa.Table:
        vocab_, mat_, prior_, classes_ = ray.get(model_ref)
        flat, parent, n = _tok_stats(batch, text_col)
        scores = np.tile(prior_, (n, 1)).astype(np.int64)
        if len(parent):
            idx = vocab_.get_indexer(flat.to_numpy(zero_copy_only=False))
            idx = np.where(idx < 0, len(vocab_), idx)
            np.add.at(scores, parent, mat_[idx])
        best = scores.argmax(axis=1)   # first max == smallest class
        t = pa.table({
            label_col: batch.column(label_col),
            "pred_label": pa.array(classes_[best], type=pa.string()),
        })
        g = t.group_by([label_col, "pred_label"]).aggregate(
            [([], "count_all")])
        return g.rename_columns([label_col, "pred_label", "n_docs"])

    return bucketed_aggregate(
        ds.map_batches(score, batch_format="pyarrow"),
        [label_col, "pred_label"], {"n_docs": ("n_docs", "sum")},
        num_buckets=1,
    )


def naive_bayes_confusion_sql(*, table: str = "documents",
                              text: str = "text",
                              label: str = "lang",
                              min_count: int = 1) -> str:
    """SQL replay: (label, token) count model, per-(doc, class) summed
    half-bit scores over a doc×class cross join with the unseen-token
    default, prior added once, row_number argmax (score desc, class
    asc), confusion GROUP BY. DuckDB ``format('{:b}')`` takes BIGINT,
    so the mirror bounds counts at ~3·10⁹ (squares must fit 2⁶³);
    the engine itself squares in Python ints — unbounded."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"

    def blen(x):
        return "length(format('{:b}', " + x + "))"

    return f"""
        WITH base AS (
          SELECT row_number() OVER () AS rid, {label} AS lab,
                 {toks} AS arr
          FROM {table}
        ),
        tok AS (
          SELECT rid, lab, t.tok FROM base, unnest(arr) AS t(tok)
        ),
        model0 AS (
          SELECT lab AS cl, tok, count(*)::BIGINT AS c
          FROM tok GROUP BY 1, 2
        ),
        model AS (
          SELECT * FROM model0
          WHERE tok IN (SELECT tok FROM model0
                        GROUP BY tok HAVING sum(c) >= {min_count})
        ),
        cls AS (SELECT lab AS cl, count(*)::BIGINT AS d
                FROM base GROUP BY 1),
        tot AS (SELECT count(*)::BIGINT AS dd FROM base),
        nl AS (SELECT cl, sum(c)::BIGINT AS n FROM model GROUP BY 1),
        v AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM model),
        ts AS (
          SELECT t.rid, c.cl,
                 sum({blen("(coalesce(m.c, 0) + 1)::BIGINT"
                           " * (coalesce(m.c, 0) + 1)")}
                     - {blen("(coalesce(nl.n, 0) + v.v)::BIGINT"
                             " * (coalesce(nl.n, 0) + v.v)")})
                     ::BIGINT AS s
          FROM tok t CROSS JOIN cls c
               LEFT JOIN model m ON m.cl = c.cl AND m.tok = t.tok
               LEFT JOIN nl ON nl.cl = c.cl, v
          GROUP BY 1, 2
        ),
        sc AS (
          SELECT b.rid, b.lab, c.cl,
                 coalesce(ts.s, 0)
                 + ({blen("c.d::BIGINT * c.d")}
                    - {blen("tot.dd::BIGINT * tot.dd")}) AS score
          FROM base b CROSS JOIN cls c
               LEFT JOIN ts ON ts.rid = b.rid AND ts.cl = c.cl, tot
        ),
        pred AS (
          SELECT rid, lab, cl,
                 row_number() OVER (PARTITION BY rid
                                    ORDER BY score DESC, cl ASC) AS rn
          FROM sc
        )
        SELECT lab AS {label}, cl AS pred_label,
               count(*)::BIGINT AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2"""
