"""Corpus-curation operators for LLM training-data pipelines: TF-IDF,
PII redaction, repetition (Gopher-style) quality signals, broadcast
blocklist/decontamination filters, and corpus n-gram statistics.

These extend the reference's per-document folding vocabulary
(feature_reader.py:25-112) with the document-scoring ops a 100 TB curation
run needs. Every op is either a stateless vectorized ``map_batches`` or a
partial-combine + small ``groupby`` — no op materializes the corpus, and the
only shuffles are vocabulary-sized (token/df) or output-sized.

Parity contract: each op has a DuckDB SQL mirror built from the exact same
arithmetic (integer counts; IEEE double division/multiplication in the same
order). Transcendental functions are avoided on purpose — ``ln`` is NOT
bit-identical between numpy and DuckDB — so TF-IDF uses the BM25-style
*rational* idf ``(N - df + 0.5) / (df + 0.5)``, a monotone transform of the
classic ``ln(N/df)`` (identical rankings, bit-exact parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from htrc_feature_reader_ray.stages.textstats import _tok_stats

# ---------------------------------------------------------------------------
# TF-IDF (rational idf)


def term_frequencies(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(id, token, tf) — per-document term frequencies, one vectorized
    explode + Arrow group_by per batch (each document row lives in exactly
    one batch, so the per-batch fold is already complete — no shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        ids = batch.column(id_col).take(pa.array(parent))
        t = pa.table({id_col: ids, "token": flat})
        g = t.group_by([id_col, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "token", "tf"])

    return ds.map_batches(fn, batch_format="pyarrow")


def doc_frequency(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(token, df) — number of documents containing each token.

    Partial-combine shape: per-batch distinct (doc, token) collapses to a
    per-batch (token, partial_df) table (vocabulary-sized, tiny vs the
    text), then one bucketed sum finishes (vocabulary cardinality is
    corpus-scale — millions of tokens — so the finish is a
    ``bucketed_aggregate``, not a native per-group-Python sort-aggregate).
    Correct because a document row never splits across batches."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        t = pa.table(
            {"d": pa.array(parent, type=pa.int64()), "token": flat}
        )
        distinct = t.group_by(["d", "token"]).aggregate([])
        g = distinct.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "df"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_aggregate(partials, "token", {"df": ("df", "sum")},
                              num_buckets=16)


def tfidf(ds, *, n_docs: int, text_col: str = "text",
          id_col: str = "doc_id", method: str = "broadcast",
          num_buckets: int = 16):
    """(id, token, tf, df, tfidf) with the rational BM25 idf
    ``tfidf = tf * ((N - df + 0.5) / (df + 0.5))``.

    The tf table is computed ONCE (materialized — it is also the output
    skeleton) and df is folded from it, so the document explode never runs
    twice. Two physical paths for attaching df, mirroring minhash's
    ``verify`` switch:

    * ``'broadcast'`` (default) — per-batch (token, partial_df) partials
      (vocabulary-sized, tiny vs the text) are folded on the driver and the
      df lookup is ``ray.put`` once; scoring is one 1:1 ``map_batches``
      with a vectorized map — NO shuffle. Right while the vocabulary fits
      the object store (natural-language vocabularies do).
    * ``'join'`` — the unbounded-vocab path: df via a distributed
      groupby-sum, then tf bucket-joins it on ``token``.

    ``n_docs`` comes from lake metadata / parquet footers, never a
    ``ds.count()`` re-execution."""
    import pandas as pd
    import ray

    tf = term_frequencies(ds, text_col=text_col, id_col=id_col).materialize()

    def score_with_ratio(batch: pa.Table) -> pa.Table:
        df = batch.column("df").to_numpy()
        ratio = ((n_docs - df).astype(np.float64) + 0.5) / (
            df.astype(np.float64) + 0.5
        )
        val = batch.column("tf").to_numpy().astype(np.float64) * ratio
        return batch.append_column(
            "tfidf", pa.array(val, type=pa.float64())
        )

    def df_partials(t: pa.Table) -> pa.Table:
        g = t.select(["token"]).group_by("token").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["token", "df"])

    if method == "broadcast":
        raw = tf.map_batches(df_partials, batch_format="pyarrow").to_pandas()
        if "token" not in raw.columns:  # Ray drops columns on 0 rows
            raw = pd.DataFrame({"token": pd.Series(dtype=object),
                                "df": pd.Series(dtype="int64")})
        folded = raw.groupby("token", as_index=False)["df"].sum()
        lookup_ref = ray.put(dict(zip(folded["token"], folded["df"])))

        def attach(pdf: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(lookup_ref)
            pdf = pdf.copy()
            pdf["df"] = pdf["token"].map(lookup).astype(np.int64)
            return pdf

        joined = tf.map_batches(attach, batch_format="pandas")
    elif method == "join":
        from htrc_feature_reader_ray.stages.partition import (
            bucket_join, bucketed_aggregate,
        )

        dfs = bucketed_aggregate(
            tf.map_batches(df_partials, batch_format="pyarrow"),
            "token", {"df": ("df", "sum")}, num_buckets=num_buckets,
        )
        joined = bucket_join(tf, dfs, left_key="token", right_key="token",
                             num_buckets=num_buckets)
    else:
        raise ValueError(f"unknown tfidf method {method!r}")

    return joined.map_batches(score_with_ratio, batch_format="pyarrow")


def tfidf_sql(*, table: str = "documents", text: str = "text",
              id_col: str = "doc_id") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH tok AS (
          SELECT {id_col}, t.token
          FROM {table}, unnest({toks}) AS t(token)
        ), tf AS (
          SELECT {id_col}, token, count(*)::BIGINT AS tf
          FROM tok GROUP BY 1, 2
        ), dfs AS (
          SELECT token, count(DISTINCT {id_col})::BIGINT AS df
          FROM tok GROUP BY 1
        ), n AS (SELECT count(*)::BIGINT AS n_docs FROM {table})
        SELECT tf.{id_col}, tf.token, tf.tf, dfs.df,
               tf.tf * (((n.n_docs - dfs.df) + 0.5) / (dfs.df + 0.5))
                   AS tfidf
        FROM tf JOIN dfs USING (token), n"""


# ---------------------------------------------------------------------------
# PII redaction

# (name, RE2 pattern, replacement) — applied in order; counts are taken on
# the ORIGINAL text, replacements chain. Patterns are RE2 on both sides
# (Arrow and DuckDB both embed RE2), so behavior is identical by
# construction.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(ds, *, text_col: str = "text", id_cols=("doc_id",)):
    """(ids..., n_email, n_phone, n_ip, clean_text) — vectorized RE2
    scrub of emails / phone fragments / IPv4 literals. One C pass per
    pattern per batch; no Python row loop."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        out = batch.select(list(id_cols))
        clean = text
        for name, pat, repl in PII_PATTERNS:
            out = out.append_column(
                f"n_{name}",
                pc.count_substring_regex(text, pattern=pat).cast(pa.int64()),
            )
            clean = pc.replace_substring_regex(
                clean, pattern=pat, replacement=repl
            )
        return out.append_column("clean_text", clean)

    return ds.map_batches(fn, batch_format="pyarrow")


def redact_pii_sql(text: str = "text") -> str:
    """SELECT-list fragment mirroring :func:`redact_pii` exactly."""
    counts = ",\n".join(
        f"len(regexp_extract_all({text}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = text
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"{counts}, {clean} AS clean_text"


# ---------------------------------------------------------------------------
# repetition / duplication quality signals (Gopher-style)


def _adjacent_ngrams(flat: pa.Array, parent: np.ndarray, n: int):
    """(ngram_strings, parent_ids) for order-n adjacent token n-grams that
    stay within one document (tokens of a doc are contiguous in flat)."""
    m = len(parent)
    if m < n:
        return pa.array([], type=pa.string()), np.array([], dtype=np.int64)
    same = parent[: m - n + 1] == parent[n - 1 :]
    slices = [flat.slice(i, m - n + 1) for i in range(n)]
    joined = pc.binary_join_element_wise(*slices, " ")
    mask = pa.array(same)
    return joined.filter(mask), parent[: m - n + 1][same]


def repetition_stats(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document repetition signals (the Gopher/C4-style filters):

    * ``n_tokens``
    * ``distinct_frac``     = distinct tokens / n_tokens
    * ``top_bigram_frac``   = count of the most frequent bigram / (n_tokens-1)
    * ``dup_trigram_frac``  = (trigrams - distinct trigrams) / trigrams

    All fractions are 0.0 on degenerate lengths (``greatest(x, 1)``
    denominators). Vectorized: one token explode + three Arrow group_bys per
    batch; no shuffle (per-doc stats complete within the batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        parent = parent.astype(np.int64)
        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)

        t = pa.table({"d": pa.array(parent), "tok": flat})
        dd = t.group_by(["d", "tok"]).aggregate([])
        distinct = np.bincount(
            dd.column("d").to_numpy(), minlength=nrows
        ).astype(np.int64)

        def top_count(n: int) -> np.ndarray:
            grams, gparent = _adjacent_ngrams(flat, parent, n)
            top = np.zeros(nrows, dtype=np.int64)
            if len(gparent):
                tg = pa.table({"d": pa.array(gparent), "g": grams})
                cnt = tg.group_by(["d", "g"]).aggregate([([], "count_all")])
                mx = cnt.group_by("d").aggregate([("count_all", "max")])
                top[mx.column("d").to_numpy()] = mx.column(
                    "count_all_max"
                ).to_numpy()
            return top

        def distinct_count(n: int) -> np.ndarray:
            grams, gparent = _adjacent_ngrams(flat, parent, n)
            out = np.zeros(nrows, dtype=np.int64)
            if len(gparent):
                tg = pa.table({"d": pa.array(gparent), "g": grams})
                dg = tg.group_by(["d", "g"]).aggregate([])
                out = np.bincount(
                    dg.column("d").to_numpy(), minlength=nrows
                ).astype(np.int64)
            return out

        top_big = top_count(2)
        n_tri = np.maximum(n_tok - 2, 0)
        d_tri = distinct_count(3)

        out = batch.select([id_col])
        out = out.append_column("n_tokens", pa.array(n_tok))
        out = out.append_column(
            "distinct_frac",
            pa.array(distinct / np.maximum(n_tok, 1).astype(np.float64)),
        )
        out = out.append_column(
            "top_bigram_frac",
            pa.array(top_big / np.maximum(n_tok - 1, 1).astype(np.float64)),
        )
        out = out.append_column(
            "dup_trigram_frac",
            pa.array(
                (n_tri - d_tri) / np.maximum(n_tri, 1).astype(np.float64)
            ),
        )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats_sql(*, table: str = "documents", text: str = "text",
                         id_col: str = "doc_id") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (
          SELECT {id_col}, {toks} AS arr, len({toks})::BIGINT AS n
          FROM {table}
        ), dtok AS (
          SELECT {id_col}, count(DISTINCT t.tok)::BIGINT AS d1
          FROM base, LATERAL unnest(arr) AS t(tok) GROUP BY 1
        ), big AS (
          SELECT {id_col}, arr[i] || ' ' || arr[i+1] AS bg
          FROM base, LATERAL unnest(range(1, n)) AS t(i)
        ), bgtop AS (
          SELECT {id_col}, max(c)::BIGINT AS top_bg FROM (
            SELECT {id_col}, bg, count(*) AS c FROM big GROUP BY 1, 2
          ) GROUP BY 1
        ), tri AS (
          SELECT {id_col}, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS tg
          FROM base, LATERAL unnest(range(1, n - 1)) AS t(i)
        ), dtri AS (
          SELECT {id_col}, count(DISTINCT tg)::BIGINT AS d3,
                 count(*)::BIGINT AS n3
          FROM tri GROUP BY 1
        )
        SELECT b.{id_col}, b.n AS n_tokens,
               coalesce(d1, 0) / greatest(b.n, 1)::DOUBLE AS distinct_frac,
               coalesce(top_bg, 0) / greatest(b.n - 1, 1)::DOUBLE
                   AS top_bigram_frac,
               (greatest(b.n - 2, 0) - coalesce(d3, 0))
                   / greatest(b.n - 2, 1)::DOUBLE AS dup_trigram_frac
        FROM base b
        LEFT JOIN dtok USING ({id_col})
        LEFT JOIN bgtop USING ({id_col})
        LEFT JOIN dtri USING ({id_col})"""


# ---------------------------------------------------------------------------
# text normalization


def normalize_text(ds, *, text_col: str = "text", id_cols=("doc_id",),
                   out_col: str = "norm_text"):
    """Canonical text form: Unicode NFC → lowercase → whitespace runs
    collapsed to one space → trimmed; plus the normalized code-point
    length. All four steps are single Arrow C kernels per batch, each
    mirrored 1:1 by a DuckDB function (``nfc_normalize``/``lower``/
    ``regexp_replace``/``trim``) — the canonicalization contract upstream
    of fingerprinting and exact dedup."""

    import unicodedata

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        null_mask = pc.is_null(col)
        filled = pc.fill_null(col, "")
        # NFC composition. NOT pc.utf8_normalize: this pyarrow's
        # form="NFC" DECOMPOSES composed characters (observed: 'É' ->
        # 'E'+U+0301), diverging from DuckDB's nfc_normalize. ASCII rows
        # (the bulk of web text after extraction) are NFC-invariant and
        # skip Python entirely; only non-ASCII rows pay the per-row call.
        ascii_mask = pc.string_is_ascii(filled)
        has_non_ascii = len(col) > 0 and not pc.min(ascii_mask).as_py()
        if has_non_ascii:
            flags = ascii_mask.to_numpy(zero_copy_only=False)
            vals = filled.to_pylist()
            t = pa.array(
                [
                    v if a else unicodedata.normalize("NFC", v)
                    for v, a in zip(vals, flags)
                ],
                type=pa.string(),
            )
        else:
            t = filled
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        # null text stays null (the engine-wide null pass-through contract)
        t = pc.if_else(null_mask, pa.nulls(len(col), type=pa.string()), t)
        out = batch.select(list(id_cols))
        out = out.append_column(out_col, t)
        return out.append_column(
            "n_chars_norm", pc.utf8_length(t).cast(pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text_sql(text: str = "text", out_col: str = "norm_text") -> str:
    expr = (
        f"trim(regexp_replace(lower(nfc_normalize({text})), "
        f"'\\s+', ' ', 'g'))"
    )
    return f"{expr} AS {out_col}, length({expr})::BIGINT AS n_chars_norm"


# ---------------------------------------------------------------------------
# corpus n-gram statistics


def ngram_top(ds, *, n: int = 2, k: int = 40, text_col: str = "text"):
    """Corpus-wide top-k adjacent n-grams: per-batch explode + Arrow
    group_by (partial combine — only (ngram, count) partials cross the
    exchange), vocabulary-sized groupby-sum, desc sort with deterministic
    ngram tie-break, limit k."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        grams, _gp = _adjacent_ngrams(flat, parent.astype(np.int64), n)
        if len(grams) == 0:
            return pa.table(
                {"ngram": pa.array([], type=pa.string()),
                 "count": pa.array([], type=pa.int64())}
            )
        t = pa.table({"ngram": grams})
        g = t.group_by("ngram").aggregate([([], "count_all")])
        return g.rename_columns(["ngram", "count"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # n-gram vocabulary is corpus-scale: bucketed vectorized sum, then the
    # tiny global top-k sort
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    summed = bucketed_aggregate(partials, "ngram",
                                {"count": ("count", "sum")}, num_buckets=16)
    return summed.sort(["count", "ngram"], descending=[True, False]).limit(k)


def ngram_top_sql(*, k: int = 40, table: str = "documents",
                  text: str = "text") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (SELECT {toks} AS arr FROM {table}),
        big AS (
          SELECT arr[i] || ' ' || arr[i+1] AS ngram
          FROM base, LATERAL unnest(range(1, len(arr))) AS t(i)
        )
        SELECT ngram, count(*)::BIGINT AS count FROM big GROUP BY 1
        ORDER BY count DESC, ngram ASC LIMIT {k}"""


# ---------------------------------------------------------------------------
# broadcast membership filters (blocklist, decontamination)


def broadcast_membership_filter(ds, *, col: str, values, keep: bool = False):
    """Filter rows whose ``col`` is (keep=True) / is not (keep=False) in a
    small value set. The set rides along in the task closure — the
    broadcast-small-side pattern (a shuffle anti-join would move the whole
    corpus to drop a handful of domains)."""
    vset = pa.array(sorted(set(values)))

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(col), value_set=vset)
        return batch.filter(m if keep else pc.invert(m))

    return ds.map_batches(fn, batch_format="pyarrow")


def contamination_flags(ds, needles, *, text_col: str = "text",
                        id_cols=("doc_id",)):
    """(ids..., n_hits) — how many benchmark strings (needles) each document
    contains, via vectorized substring search (one C pass per needle per
    batch; the needle list is the small broadcast side). The
    train/test-decontamination primitive: filter ``n_hits == 0`` to keep."""
    needles = list(needles)

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        hits = np.zeros(len(batch), dtype=np.int64)
        for nd in needles:
            m = pc.fill_null(pc.match_substring(text, pattern=nd), False)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        out = batch.select(list(id_cols))
        return out.append_column("n_hits", pa.array(hits, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def contamination_sql(needles, text: str = "text") -> str:
    """SQL mirror of n_hits (needles must be SQL-literal-safe)."""
    terms = " + ".join(
        f"(CASE WHEN contains({text}, '{nd}') THEN 1 ELSE 0 END)"
        for nd in needles
    )
    return f"({terms})::BIGINT"


# ---------------------------------------------------------------------------
# n-gram decontamination (window-level benchmark overlap)


def benchmark_gram_hashes(benchmark, *, width: int,
                          text_col: str = "text") -> "np.ndarray":
    """Sorted unique 64-bit md5 gram hashes of every ``width``-token window
    in the benchmark texts. ``benchmark`` is a list of strings or a (small)
    ``ray.data.Dataset`` — benchmark suites are the canonical small
    broadcast side (thousands of prompts, not a corpus), so a Dataset is
    materialized driver-side by contract."""
    from htrc_feature_reader_ray.stages.dedup import _flatten_windows

    if hasattr(benchmark, "map_batches"):  # ray.data.Dataset
        texts: list = []
        for batch in benchmark.select_columns([text_col]).iter_batches(
            batch_format="pyarrow"
        ):
            texts.extend(batch.column(text_col).to_pylist())
    else:
        texts = list(benchmark)
    h, _, _ = _flatten_windows(texts, width)
    return np.unique(h)


def ngram_contamination(ds, benchmark, *, text_col: str = "text",
                        id_col: str = "doc_id", width: int = 8):
    """Per-document overlap with a benchmark's ``width``-token windows —
    the n-gram-level train/test decontamination signal (the 13-gram
    convention of GPT-3 appendix C / PaLM, generalized): a window is
    contaminated iff its exact token sequence occurs anywhere in the
    benchmark. Returns ``(id_col, n_tokens, n_windows, n_dup_windows,
    dup_tokens, dup_frac)`` — same span-coverage fold as
    ``dedup.duplicated_spans`` (dup_tokens = merged equal-width window
    union), against a *fixed external* gram set instead of corpus-internal
    duplicates.

    Scale shape: the benchmark gram set is hashed once and broadcast via
    ``ray.put``; marking is a single stateless ``map_batches`` pass — no
    shuffle, no join, streams at any corpus size.
    """
    import ray

    from htrc_feature_reader_ray.stages.dedup import mark_windows_against

    hashes = benchmark_gram_hashes(benchmark, width=width,
                                   text_col=text_col)
    ref = ray.put(hashes)

    def mark(batch: pa.Table) -> pa.Table:
        return mark_windows_against(
            batch, ray.get(ref), text_col=text_col, id_col=id_col,
            width=width,
        )

    return ds.map_batches(mark, batch_format="pyarrow")


def ngram_decontaminate(ds, benchmark, *, text_col: str = "text",
                        id_col: str = "doc_id", width: int = 8,
                        max_frac: float = 0.0):
    """Drop documents whose benchmark-overlap token fraction exceeds
    ``max_frac`` (default: any full-window overlap removes the doc). The
    contamination mark and the filter run in ONE broadcast ``map_batches``
    pass over the corpus — no flag/corpus join — because window marking
    needs only the broadcast benchmark hash set and the batch itself. All
    input columns pass through unchanged."""
    import ray

    from htrc_feature_reader_ray.stages.dedup import mark_windows_against

    hashes = benchmark_gram_hashes(benchmark, width=width,
                                   text_col=text_col)
    ref = ray.put(hashes)

    def keep(batch: pa.Table) -> pa.Table:
        flags = mark_windows_against(
            batch, ray.get(ref), text_col=text_col, id_col=id_col,
            width=width,
        )
        frac = flags.column("dup_frac").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(frac <= max_frac))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Inverted index (posting lists)
# ---------------------------------------------------------------------------

def build_postings(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   max_postings: int = 16, num_buckets: int = 64):
    """Search-engine posting-list build: (token, df, postings) where ``df``
    is the EXACT document frequency and ``postings`` the first
    ``max_postings`` doc ids ascending, comma-joined (the capped head of the
    posting list an index shard would store; VARCHAR so the result is
    hash-comparable).

    Shape: per-batch distinct (doc, token) pairs (a document row never
    splits across batches), ONE token-bucketed exchange carrying exactly the
    distinct-pair volume — the irreducible payload of index construction —
    then a vectorized per-bucket fold. Vocabulary cardinality is
    corpus-scale, so the fold is a bucketed pass, never a native per-group
    sort-aggregate.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy()[parent]
        t = pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "token": flat,
        })
        return t.group_by(["doc_id", "token"]).aggregate([])

    def finish(df):
        import pandas as pd  # noqa: F401  (frame ops only)

        df = df.sort_values(["token", "doc_id"], kind="mergesort")
        stats = (
            df.groupby("token", sort=False, as_index=False)
            .agg(df_=("doc_id", "size"))
            .rename(columns={"df_": "df"})
        )
        head = df.groupby("token", sort=False).head(max_postings)
        joined = (
            head.assign(s=head["doc_id"].astype(str))
            .groupby("token", sort=False)["s"]
            .agg(",".join)
            .rename("postings")
            .reset_index()
        )
        out = stats.merge(joined, on="token", how="left")
        out["df"] = out["df"].astype("int64")
        return out

    pairs_ds = ds.map_batches(pairs, batch_format="pyarrow")
    return bucketed_map_groups(pairs_ds, "token", finish,
                               num_buckets=num_buckets)


def build_postings_sql(*, table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id", max_postings: int = 16) -> str:
    """DuckDB mirror of ``build_postings`` (same tokenizer contract as
    ``_tok_stats``: split on single spaces, drop empties)."""
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {id_col} AS doc_id, t.token
          FROM {table}, unnest(string_split({text_col}, ' ')) AS t(token)
          WHERE t.token != ''
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                      PARTITION BY token ORDER BY doc_id) AS rn
          FROM pairs
        )
        SELECT token, count(*)::BIGINT AS df,
               string_agg(CASE WHEN rn <= {max_postings}
                               THEN doc_id::VARCHAR END,
                          ',' ORDER BY doc_id) AS postings
        FROM ranked GROUP BY token"""


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

def phrase_search(ds, phrase, *, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Exact positional phrase match — the query-side consumer the
    reference's per-page token tables serve (a user greps HTRC volumes for
    a multi-word phrase the way ``Volume.tokenlist`` users post-filter;
    feature_reader.py:25-112's folding never keeps adjacency, so this is
    the op that *does*). Emits one row per document containing the phrase:
    ``(doc_id, n_matches, first_pos)`` with ``first_pos`` the 0-based token
    offset of the earliest occurrence. Overlapping occurrences all count
    (``a a a`` matches ``a a`` twice).

    Scale shape: ZERO exchange. Adjacency is a within-document property and
    a document row never splits across batches, so the whole match is one
    vectorized pass per batch: one ``pc.equal`` per phrase word against the
    flat token array, numpy shift-AND across the ``m`` lanes, a same-parent
    guard so matches never straddle documents, then a ``bincount`` fold to
    per-doc counts and a ``minimum.at`` fold to first positions. Phrase
    text never leaves the driver closure; the output is match-sized.
    """
    words = [w for w in phrase.split(" ") if w]
    if not words:
        raise ValueError("phrase must contain at least one token")
    m = len(words)

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        empty = pa.table({
            id_col: batch.column(id_col).slice(0, 0),
            "n_matches": pa.array([], type=pa.int64()),
            "first_pos": pa.array([], type=pa.int64()),
        })
        n = len(parent)
        if n < m:
            return empty
        parent = parent.astype(np.int64)
        # lane k: token at offset k equals phrase word k
        match = pc.equal(flat, words[0]).to_numpy(
            zero_copy_only=False)[:n - m + 1].copy()
        for k in range(1, m):
            lane = pc.equal(flat, words[k]).to_numpy(zero_copy_only=False)
            match &= lane[k:n - m + 1 + k]
        # a match must live entirely inside one document
        match &= parent[:n - m + 1] == parent[m - 1:]
        hit = np.flatnonzero(match)
        if len(hit) == 0:
            return empty
        doc = parent[hit]
        counts = np.bincount(doc, minlength=nrows)
        # token position within the owning document
        starts = np.concatenate(
            ([0], np.cumsum(np.bincount(parent, minlength=nrows))[:-1]))
        pos = hit - starts[doc]
        first = np.full(nrows, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, doc, pos)
        keep = np.flatnonzero(counts > 0)
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(keep)),
            "n_matches": pa.array(counts[keep].astype(np.int64)),
            "first_pos": pa.array(first[keep]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def phrase_search_sql(phrase, *, table: str = "documents",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`phrase_search` (same tokenizer contract as
    ``_tok_stats``: split on single spaces, drop empties; positions are
    0-based over the kept tokens)."""
    words = [w for w in phrase.split(" ") if w]
    m = len(words)
    conds = " AND ".join(
        f"arr[i.i + {k}] = '{w}'" for k, w in enumerate(words))
    return f"""
        WITH d AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS arr
          FROM {table}
        ),
        hits AS (
          SELECT {id_col}, i.i - 1 AS pos
          FROM d, unnest(generate_series(1, len(arr) - {m - 1})) AS i(i)
          WHERE {conds}
        )
        SELECT {id_col}, count(*)::BIGINT AS n_matches,
               min(pos)::BIGINT AS first_pos
        FROM hits GROUP BY 1"""


# ---------------------------------------------------------------------------
# integer unigram-surprisal quality score
# ---------------------------------------------------------------------------

def surprisal_score(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int = 64, keep_cols=(),
                    min_count: int = 1, method: str = "auto",
                    broadcast_limit: int = 5_000_000):
    """Per-document unigram surprisal in EXACT bits — the reproducible
    stand-in for the LM-perplexity quality filter (CCNet/Gopher style):
    ``surprisal_bits(doc) = Σ_tokens (⌊log2 N⌋ − ⌊log2 cnt(tok)⌋)``
    with ``cnt`` the corpus occurrence count and ``N`` the corpus token
    total — ⌊log2⌋ of the inverse unigram probability, so rare-token-heavy
    (high-perplexity) docs score high and boilerplate scores low, with no
    IEEE ``ln`` anywhere (not correctly rounded ⇒ not cross-engine
    reproducible; the engine-wide exactness discipline).

    Scale shape: ONE vocabulary-bucketed count fold (``corpus_token_
    counts``), then either a BROADCAST of the (token, ⌊log2 cnt⌋) table
    via ``ray.put`` + one stateless scoring pass (the worker-fit
    vocabulary contract, same as ``encode_tokens``), or — when the
    distinct-token table is NOT worker-fit (raw web text's
    URL/hash/typo tail) — a token-bucketed JOIN path that never pulls
    the vocabulary to the driver: per-(doc, token) occurrence partials
    ⋈ the counts table co-bucketed on token, then one doc-bucketed
    fold. ``method='auto'`` (the ``line_dedup`` convention) picks by
    pruned-vocabulary row count against ``broadcast_limit``.

    ``min_count`` prunes tokens below the floor from the table; a
    pruned/unseen token scores the closed-form default ``l_total −
    ⌊log2(max(min_count−1, 1))⌋`` (max surprisal). For ``min_count=2``
    this is EXACT — every pruned token is a hapax with ⌊log2 1⌋ = 0 —
    and it removes the hapax tail, typically ~half the distinct types
    of web text; above 2 it is a documented score floor. Output
    (doc_id, n_tokens, surprisal_bits)."""
    import ray

    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )
    from htrc_feature_reader_ray.stages.profile import _ilog2
    from htrc_feature_reader_ray.stages.vocab import corpus_token_counts

    counts_ds = corpus_token_counts(
        ds, text_col=text_col, num_buckets=num_buckets,
    ).materialize()
    tot = counts_ds.sum("count")
    n_total = int(tot) if tot is not None else 0
    l_total = int(_ilog2(np.array([max(n_total, 1)], dtype=np.int64))[0])
    default_bits = l_total - int(_ilog2(np.array(
        [max(min_count - 1, 1)], dtype=np.int64))[0])
    if min_count > 1:
        counts_ds = counts_ds.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("count"), min_count)),
            batch_format="pyarrow")
    if method == "auto":
        method = ("broadcast" if counts_ds.count() <= broadcast_limit
                  else "join")

    if method == "broadcast":
        counts = counts_ds.to_pandas().sort_values("token")
        ref = ray.put((counts["token"].to_numpy(),
                       _ilog2(counts["count"].to_numpy()
                              .astype(np.int64))))

        def score(batch: pa.Table) -> pa.Table:
            toks_arr, lbits = ray.get(ref)
            flat, parent, nrows = _tok_stats(batch, text_col)
            n_tok = np.bincount(
                parent.astype(np.int64), minlength=nrows).astype(np.int64)
            bits = np.zeros(nrows, dtype=np.int64)
            if len(flat):
                flat_np = flat.to_numpy(zero_copy_only=False)
                if len(toks_arr):
                    pos = np.searchsorted(toks_arr, flat_np)
                    pos_c = np.minimum(pos, len(toks_arr) - 1)
                    hit = toks_arr[pos_c] == flat_np
                    per_tok = np.where(hit, l_total - lbits[pos_c],
                                       default_bits)
                else:
                    per_tok = np.full(len(flat_np), default_bits,
                                      dtype=np.int64)
                np.add.at(bits, parent.astype(np.int64), per_tok)
            out = batch.select([id_col, *keep_cols])
            out = out.append_column(
                "n_tokens", pa.array(n_tok, type=pa.int64()))
            return out.append_column(
                "surprisal_bits", pa.array(bits, type=pa.int64()))

        return ds.map_batches(score, batch_format="pyarrow")

    if method != "join":
        raise ValueError(f"unknown method {method!r}")

    # join path: vocabulary never reaches the driver
    def base(batch: pa.Table) -> pa.Table:
        _, parent, nrows = _tok_stats(batch, text_col)
        n_tok = np.bincount(
            parent.astype(np.int64), minlength=nrows).astype(np.int64)
        out = batch.select([id_col, *keep_cols])
        return out.append_column(
            "n_tokens", pa.array(n_tok, type=pa.int64()))

    base_ds = ds.map_batches(base, batch_format="pyarrow")

    def occ(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        d = batch.column(id_col).take(
            pa.array(parent.astype(np.int64)))
        g = pa.table({"__d": d, "token": flat}).group_by(
            ["__d", "token"]).aggregate([([], "count_all")])
        return g.rename_columns(["__d", "token", "n_occ"])

    occ_ds = ds.map_batches(occ, batch_format="pyarrow")

    def with_bits(t: pa.Table) -> pa.Table:
        lb = _ilog2(t.column("count").to_numpy(
            zero_copy_only=False).astype(np.int64))
        return pa.table({"token": t.column("token"),
                         "lbits": pa.array(lb, type=pa.int64())})

    joined = bucket_join(
        occ_ds, counts_ds.map_batches(with_bits, batch_format="pyarrow"),
        left_key="token", right_key="token",
        num_buckets=num_buckets, how="left")

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        lb = df["lbits"].fillna(l_total - default_bits).astype("int64")
        return pd.DataFrame({
            "__d": df["__d"],
            "bits": (df["n_occ"].astype("int64")
                     * (l_total - lb)).astype("int64"),
        })

    bits_agg = bucketed_aggregate(
        joined.map_batches(contrib, batch_format="pandas"),
        ["__d"], {"surprisal_bits": ("bits", "sum")},
        num_buckets=num_buckets)

    final = bucket_join(base_ds, bits_agg, left_key=id_col,
                        right_key="__d", num_buckets=num_buckets,
                        how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["surprisal_bits"] = df["surprisal_bits"].fillna(0).astype(
            "int64")
        return df[[id_col, *keep_cols, "n_tokens", "surprisal_bits"]]

    return final.map_batches(finish, batch_format="pandas")


def surprisal_score_sql(*, table: str = "documents",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    toks = f"""
          SELECT {id_col}, u.t AS tok
          FROM {table},
               unnest(string_split({text_col}, ' ')) AS u(t)
          WHERE u.t <> ''"""
    return f"""
        WITH tok AS ({toks}),
        cnt AS (SELECT tok, count(*)::BIGINT AS k FROM tok GROUP BY 1),
        tot AS (
          SELECT (length(format('{{:b}}', count(*))) - 1)::BIGINT AS l
          FROM tok
        ), scored AS (
          SELECT t.{id_col}, count(*)::BIGINT AS n_tokens,
                 sum(tot.l - (length(format('{{:b}}', c.k)) - 1))::BIGINT
                     AS surprisal_bits
          FROM tok t JOIN cnt c USING (tok), tot
          GROUP BY 1
        )
        SELECT d.{id_col},
               coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(s.surprisal_bits, 0)::BIGINT AS surprisal_bits
        FROM {table} d LEFT JOIN scored s USING ({id_col})"""


# ---------------------------------------------------------------------------
# conjunctive boolean retrieval
# ---------------------------------------------------------------------------

def boolean_retrieval(ds, terms, *, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Conjunctive (AND) boolean retrieval: doc ids containing EVERY term
    of the query set — the filter-side consumer of ``build_postings`` run
    directly over the corpus (scan-side retrieval is the right plan when
    the query set is broadcast-small and the corpus pass is already paid,
    e.g. inside a curation pipeline; the postings path is for repeated
    queries).

    Zero exchange: the term list ships in the task closure, per-doc
    distinct-match counting completes inside the batch (docs never split
    across batches); output is (doc_id, n_terms_matched) for matching
    docs only.
    """
    terms = sorted(set(terms))
    n_terms = len(terms)

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "n_terms": pa.array([], type=pa.int64()),
        })
        if n_terms == 0 or len(batch) == 0:
            return empty
        flat, parent, nrows = _tok_stats(batch, text_col)
        if len(flat) == 0:
            return empty
        hit = pc.is_in(flat, value_set=pa.array(terms)).to_numpy(
            zero_copy_only=False)
        if not hit.any():
            return empty
        toks = flat.to_numpy(zero_copy_only=False)[hit]
        par = parent[hit].astype(np.int64)
        # distinct (doc, term) matches, then per-doc distinct count;
        # the query set is tiny, so term index = searchsorted rank
        tidx = np.searchsorted(np.array(terms, dtype=object), toks)
        uniq_pairs = np.unique(par * n_terms + tidx)
        cnt = np.bincount(uniq_pairs // n_terms, minlength=nrows)
        keep = cnt == n_terms
        ids = batch.column(id_col).to_numpy()[keep]
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "n_terms": pa.array(
                np.full(len(ids), n_terms, dtype=np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def boolean_retrieval_sql(terms, *, table: str = "documents",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    terms = sorted(set(terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
        SELECT {id_col}, count(*)::BIGINT AS n_terms
        FROM (
          SELECT DISTINCT {id_col}, u.t
          FROM {table},
               unnest(string_split({text_col}, ' ')) AS u(t)
          WHERE u.t IN ({in_list})
        ) GROUP BY 1 HAVING count(*) = {len(terms)}"""


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def pmi_collocations(ds, *, text_col: str = "text", min_count: int = 5,
                     num_buckets: int = 16, method: str = "auto",
                     broadcast_limit: int = 2_000_000):
    """Collocation mining: adjacent bigrams occurring ``min_count``+ times,
    with their exact corpus counts and an exact-integer association score
    ``lift_ppm = floor(1e6 * P(x,y) / (P(x)·P(y)))`` (the PMI argument in
    parts-per-million — monotone in PMI, but hash-comparable because it
    never touches floating point; consumers wanting log-PMI take
    ``log(lift_ppm) - log(1e6)``).

    Scale shape: bigram and unigram count tables are both vocabulary-scale
    → ``bucketed_aggregate`` folds (per-batch Arrow partials first, so the
    exchanges carry (gram, count) partials, not token streams). The two
    probability denominators attach by BROADCAST of the unigram count
    table when it fits a worker (``broadcast_limit`` rows — real-text
    unigram vocabularies almost always do; the lookup is one vectorized
    merge per batch, zero extra exchange) and by token-bucketed joins
    otherwise (``method='join'``). The exact-rational score runs only over
    the min_count-filtered collocation table; corpus totals are two scalar
    aggregates over the already materialized count tables.
    """
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    def bi_partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        grams, _gp = _adjacent_ngrams(flat, parent.astype(np.int64), 2)
        if len(grams) == 0:
            return pa.table({"ngram": pa.array([], type=pa.string()),
                             "n_xy": pa.array([], type=pa.int64())})
        g = pa.table({"ngram": grams}).group_by("ngram").aggregate(
            [([], "count_all")])
        return g.rename_columns(["ngram", "n_xy"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _parent, _ = _tok_stats(batch, text_col)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])
        return g.rename_columns(["token", "n"])

    # batch_size coalesces tiny source blocks (the explode dominates
    # per-task cost, so fewer bigger tasks win). The two folds re-scan the
    # input rather than pinning it: at corpus scale a parquet re-read is
    # cheaper than full-text object-store residency
    bi = bucketed_aggregate(
        ds.map_batches(bi_partial, batch_format="pyarrow", batch_size=1024),
        "ngram", {"n_xy": ("n_xy", "sum")}, num_buckets=num_buckets,
    ).materialize()
    uni = bucketed_aggregate(
        ds.map_batches(uni_partial, batch_format="pyarrow",
                       batch_size=1024),
        "token", {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).materialize()

    n_big = int(bi.sum("n_xy") or 0)
    n_uni = int(uni.sum("n") or 0)

    def split_xy(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(
            pc.greater_equal(batch.column("n_xy"), min_count))
        parts = pc.split_pattern(keep.column("ngram"), " ")
        return pa.table({
            "x": pc.list_element(parts, 0),
            "y": pc.list_element(parts, 1),
            "n_xy": keep.column("n_xy"),
        })

    def uni_as(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                f"_k_{name}": batch.column("token"),
                f"n_{name}": batch.column("n"),
            })
        return fn

    filtered = bi.map_batches(split_xy, batch_format="pyarrow")

    if method == "auto":
        method = ("broadcast" if uni.count() <= broadcast_limit
                  else "join")

    if method == "broadcast":
        import ray as _ray

        ref = _ray.put(uni.to_pandas())

        def attach(df):
            u = _ray.get(ref)
            out = df.merge(
                u.rename(columns={"token": "x", "n": "n_x"}),
                on="x", how="left",
            ).merge(
                u.rename(columns={"token": "y", "n": "n_y"}),
                on="y", how="left",
            )
            return out

        with_xy = filtered.map_batches(attach, batch_format="pandas")
    else:
        with_x = bucket_join(
            filtered, uni.map_batches(uni_as("x"), batch_format="pyarrow"),
            left_key="x", right_key="_k_x", num_buckets=num_buckets,
        )
        with_xy = bucket_join(
            with_x, uni.map_batches(uni_as("y"), batch_format="pyarrow"),
            left_key="y", right_key="_k_y", num_buckets=num_buckets,
        )

    def score(df):
        import pandas as pd
        # exact rational: python-int arithmetic, but only over the
        # min_count-filtered collocation rows (tiny vs the corpus)
        lift = [
            (int(nxy) * n_uni * n_uni * 1_000_000)
            // (n_big * int(nx) * int(ny))
            for nxy, nx, ny in zip(df["n_xy"], df["n_x"], df["n_y"])
        ]
        out = df[["x", "y"]].copy()
        out["n_xy"] = df["n_xy"].astype("int64")
        out["n_x"] = df["n_x"].astype("int64")
        out["n_y"] = df["n_y"].astype("int64")
        out["lift_ppm"] = pd.Series(lift, index=df.index, dtype="int64")
        return out

    return with_xy.map_batches(score, batch_format="pandas")


def pmi_collocations_sql(*, table: str = "documents", text: str = "text",
                         min_count: int = 5) -> str:
    """DuckDB mirror of ``pmi_collocations`` (HUGEINT exact division)."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (SELECT {toks} AS arr FROM {table}),
        u AS (
          SELECT t.token, count(*)::BIGINT AS n
          FROM base, unnest(arr) AS t(token) GROUP BY 1
        ),
        bc AS (
          SELECT arr[i] AS x, arr[i+1] AS y, count(*)::BIGINT AS n_xy
          FROM base, LATERAL unnest(range(1, len(arr))) AS t(i)
          GROUP BY 1, 2
        ),
        tot AS (
          SELECT (SELECT sum(n) FROM u) AS nu,
                 (SELECT sum(n_xy) FROM bc) AS nb
        )
        SELECT bc.x, bc.y, bc.n_xy, ux.n AS n_x, uy.n AS n_y,
               ((bc.n_xy::HUGEINT * nu * nu * 1000000)
                 // (nb * ux.n * uy.n))::BIGINT AS lift_ppm
        FROM bc
        JOIN u ux ON ux.token = bc.x
        JOIN u uy ON uy.token = bc.y, tot
        WHERE bc.n_xy >= {min_count}"""


def trending_terms(folded, *, mid_us: int, k: int = 40,
                   ts_col: str = "warc_ts", token_col: str = "token",
                   count_col: str = "count", num_buckets: int = 32):
    """Corpus drift mining: tokens whose frequency GROWS between the early
    and late halves of the crawl window (split at ``mid_us`` epoch-µs).
    Exact integer growth: ``growth_ppm = n_late * 1e6 // (n_early + 1)``
    (add-one so newborn terms rank highest but stay totally ordered).

    Input is the already-folded ``(ts, token, count)`` table, so the hot
    explode never re-runs here; per-batch (token, early, late) partials
    collapse before the one token-bucketed fold, and only the ≤k winners
    leave the final sort."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def halves(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
        cnt = pc.cast(t.column(count_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        late = ts_us > mid_us
        part = pa.table({
            token_col: t.column(token_col),
            "n_early": pa.array(np.where(late, 0, cnt), type=pa.int64()),
            "n_late": pa.array(np.where(late, cnt, 0), type=pa.int64()),
        })
        g = part.group_by([token_col]).aggregate(
            [("n_early", "sum"), ("n_late", "sum")])
        return g.rename_columns([token_col, "n_early", "n_late"])

    agg = bucketed_aggregate(
        folded.map_batches(halves, batch_format="pyarrow"),
        [token_col], {"n_early": ("n_early", "sum"),
                      "n_late": ("n_late", "sum")},
        num_buckets=num_buckets,
    )

    def growth(t: pa.Table) -> pa.Table:
        ne = pc.cast(t.column("n_early"), pa.int64())
        nl = pc.cast(t.column("n_late"), pa.int64())
        g = pc.divide(pc.multiply(nl, pa.scalar(1_000_000, type=pa.int64())),
                      pc.add(ne, pa.scalar(1, type=pa.int64())))
        return pa.table({token_col: t.column(token_col), "n_early": ne,
                         "n_late": nl, "growth_ppm": g})

    return (agg.map_batches(growth, batch_format="pyarrow")
            .sort(["growth_ppm", token_col], descending=[True, False])
            .limit(k))


def trending_terms_sql(*, k: int = 40, tok_cte: str = "tok",
                       pages_cte: str = "pages",
                       ts: str = "warc_ts", token: str = "token") -> str:
    """SQL mirror (composes after TOK_PRE): identical midpoint floor
    division, add-one growth and (growth DESC, token) total order."""
    return f"""
        , b AS (SELECT (min(epoch_us({ts})) + max(epoch_us({ts}))) // 2
                       AS mid FROM {pages_cte})
        , c AS (
            SELECT {token},
                   sum(CASE WHEN epoch_us({ts}) <= b.mid
                            THEN 1 ELSE 0 END)::BIGINT AS n_early,
                   sum(CASE WHEN epoch_us({ts}) > b.mid
                            THEN 1 ELSE 0 END)::BIGINT AS n_late
            FROM {tok_cte} CROSS JOIN b GROUP BY 1
        )
        SELECT {token}, n_early, n_late,
               ((n_late * 1000000) // (n_early + 1))::BIGINT AS growth_ppm
        FROM c
        ORDER BY growth_ppm DESC, {token} LIMIT {k}"""


def lexical_diversity(ds, *, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Per-document lexical-diversity signals as EXACT integers — the
    log-free cousins of token entropy (IEEE ``ln`` is not correctly
    rounded, so entropy is not reproducible cross-engine; these rationals
    are):

    * ``n_tokens``, ``n_distinct``
    * ``ttr_ppm``      = type-token ratio, ``distinct·10⁶ // n``
    * ``simpson_ppm``  = repeat probability ``Σnᵢ(nᵢ−1)·10⁶ // (n(n−1))``
      — the Simpson/Herfindahl concentration of the doc's unigram
      distribution (0 = all tokens distinct, 10⁶ = one token repeated).

    Zero shuffle: per-doc stats complete inside the batch (one explode +
    one Arrow group_by), like the sibling ``repetition_stats``."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        parent = parent.astype(np.int64)
        n_tok = np.bincount(parent, minlength=nrows).astype(np.int64)

        t = pa.table({"d": pa.array(parent), "tok": flat})
        g = t.group_by(["d", "tok"]).aggregate([([], "count_all")])
        d_idx = g.column("d").to_numpy()
        cnt = g.column("count_all").to_numpy().astype(np.int64)
        distinct = np.bincount(d_idx, minlength=nrows).astype(np.int64)
        rep = np.zeros(nrows, dtype=np.int64)
        np.add.at(rep, d_idx, cnt * (cnt - 1))  # int64 path: exact

        ttr = distinct * 1_000_000 // np.maximum(n_tok, 1)
        den = n_tok * (n_tok - 1)
        simpson = rep * 1_000_000 // np.maximum(den, 1)
        out = batch.select([id_col])
        for name, arr in (("n_tokens", n_tok), ("n_distinct", distinct),
                          ("ttr_ppm", ttr), ("simpson_ppm", simpson)):
            out = out.append_column(name, pa.array(arr, type=pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def lexical_diversity_sql(*, table: str = "documents", text: str = "text",
                          id_col: str = "doc_id") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (
          SELECT {id_col}, {toks} AS arr, len({toks})::BIGINT AS n
          FROM {table}
        ), tok AS (
          SELECT {id_col}, n, u.t AS tok, count(*)::BIGINT AS c
          FROM base, unnest(arr) AS u(t)
          GROUP BY 1, 2, 3
        ), agg AS (
          SELECT {id_col}, any_value(n) AS n,
                 count(*)::BIGINT AS n_distinct,
                 sum(c * (c - 1))::BIGINT AS rep
          FROM tok GROUP BY 1
        )
        SELECT b.{id_col}, b.n AS n_tokens,
               coalesce(a.n_distinct, 0)::BIGINT AS n_distinct,
               (coalesce(a.n_distinct, 0) * 1000000
                // greatest(b.n, 1))::BIGINT AS ttr_ppm,
               (coalesce(a.rep, 0) * 1000000
                // greatest(b.n * (b.n - 1), 1))::BIGINT AS simpson_ppm
        FROM base b LEFT JOIN agg a USING ({id_col})"""


# ---------------------------------------------------------------------------
# deterministic augmentation (hash-gated token dropout)
# ---------------------------------------------------------------------------

def token_dropout(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  mod: int = 8):
    """Rule-based augmentation: drop every token OCCURRENCE whose seeded
    hash ``md5(doc_id:pos:token) % mod == 0`` (expected dropout rate
    1/mod) — the reproducible counterpart of random word dropout, so an
    augmented corpus can be regenerated bit-identically (and audited in
    SQL) instead of stored. Position-seeded: repeated tokens drop
    independently.

    Zero exchange; the rebuild is fully vectorized — kept tokens re-list
    via offset arithmetic and join through ONE ``pc.binary_join`` per
    batch (no per-doc Python concat). Output: (id, text_aug, n_dropped);
    a fully-dropped or empty doc yields ''."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    def augment(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(parent) == 0:
            return pa.table({
                id_col: batch.column(id_col),
                "text_aug": pa.array([""] * nrows, type=pa.string()),
                "n_dropped": pa.array(np.zeros(nrows, dtype=np.int64)),
            })
        toks = flat.to_pylist()
        doc_ids = ids[parent]
        # per-doc position: global index minus the doc's start offset
        counts = np.bincount(parent, minlength=nrows)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
        h = md5_hash64([f"{d}:{p}:{t}" for d, p, t in
                        zip(doc_ids, pos, toks)])
        keep = (h % np.uint64(mod)) != 0
        kept_counts = np.bincount(parent[keep], minlength=nrows)
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            flat.take(pa.array(np.flatnonzero(keep))))
        joined = pc.binary_join(kept_list, " ")
        return pa.table({
            id_col: batch.column(id_col),
            "text_aug": joined,
            "n_dropped": pa.array(
                (counts - kept_counts).astype(np.int64)),
        })

    return ds.map_batches(augment, batch_format="pyarrow")


def token_dropout_sql(*, table: str = "documents", text: str = "text",
                      id_col: str = "doc_id", mod: int = 8) -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH d AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        tok AS (
          SELECT {id_col}, arr[i.i] AS token, i.i - 1 AS pos
          FROM d, unnest(generate_series(1, len(arr))) AS i(i)
        ),
        flagged AS (
          SELECT {id_col}, token, pos,
                 (md5_number_upper({id_col} || ':' || pos || ':' || token)
                  % {mod} = 0) AS dropped
          FROM tok
        ),
        agg AS (
          SELECT {id_col},
                 string_agg(token, ' ' ORDER BY pos)
                   FILTER (WHERE NOT dropped) AS text_aug,
                 count(*) FILTER (WHERE dropped)::BIGINT AS n_dropped
          FROM flagged GROUP BY 1
        )
        SELECT d.{id_col}, coalesce(agg.text_aug, '') AS text_aug,
               coalesce(agg.n_dropped, 0)::BIGINT AS n_dropped
        FROM d LEFT JOIN agg USING ({id_col})"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (rational-idf, integer-exact)
# ---------------------------------------------------------------------------

def bm25_topk(ds, query_terms, *, text_col: str = "text",
              id_col: str = "doc_id", k: int = 20):
    """BM25 top-k with Robertson parameters k1=1.2, b=0.75 and the
    RATIONAL idf ``(N − df + ½)/(df + ½)`` kept as an exact fraction —
    the engine's reproducibility contract deliberately drops the standard
    ``ln`` around that ratio (IEEE ln is not correctly rounded, so a
    float BM25 is neither parallelism-stable nor SQL-replayable; the
    rational variant is per-term monotone in the standard idf). Every
    per-(doc, term) score is the exact integer

        10⁶ · tf·44·Σdl·(2N − 2df + 1)
        ------------------------------------------  (floor)
        (2df + 1)·(20·tf·Σdl + 6·Σdl + 18·dl·N)

    (the k1/b fractions cleared to integers), summed per doc.

    Shape: pass 1 folds three TINY statistics — N, Σdl, and df per query
    term (per-batch partials; the query term set is broadcast) — pass 2
    scores each batch statelessly with arbitrary-precision ints
    (HUGEINT-mirrored) and only (doc, score) rows reach the global
    top-k sort. Docs matching no term are excluded."""
    import ray
    from ray.data.aggregate import Sum

    terms = sorted(set(query_terms))
    term_set = pa.array(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        dl_sum = int(len(parent))
        if len(flat):
            t = pa.table({"d": pa.array(parent.astype(np.int64)),
                          "tok": flat})
            m = pc.is_in(t.column("tok"), value_set=term_set)
            dd = t.filter(m).group_by(["d", "tok"]).aggregate([])
            dfp = dd.group_by("tok").aggregate([([], "count_all")])
            toks = dfp.column("tok").to_pylist()
            dfs = dfp.column("count_all").to_numpy().astype(np.int64)
        else:
            toks, dfs = [], np.array([], dtype=np.int64)
        return pa.table({
            "term": pa.array(["\x00N", "\x00DL"] + toks,
                             type=pa.string()),
            "v": pa.array(np.concatenate(
                [[nrows, dl_sum], dfs]).astype(np.int64)),
        })

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("v", alias_name="v"))
        .to_pandas()  # |terms| + 2 rows
    )
    sv = dict(zip(stats["term"], stats["v"].map(int)))
    N, SDL = sv.pop("\x00N"), sv.pop("\x00DL")
    ref = ray.put((N, SDL, sv))

    def score(batch: pa.Table) -> pa.Table:
        n_, sdl, dfm = ray.get(ref)
        flat, parent, nrows = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_scores = {}
        if len(flat):
            dl = np.bincount(parent, minlength=nrows)
            t = pa.table({"d": pa.array(parent.astype(np.int64)),
                          "tok": flat})
            m = pc.is_in(t.column("tok"), value_set=term_set)
            tf_tbl = t.filter(m).group_by(["d", "tok"]).aggregate(
                [([], "count_all")])
            for d, tok, tf in zip(
                    tf_tbl.column("d").to_pylist(),
                    tf_tbl.column("tok").to_pylist(),
                    tf_tbl.column("count_all").to_pylist()):
                df_ = dfm.get(tok, 0)
                num = (10**6 * tf * 44 * sdl * (2 * n_ - 2 * df_ + 1))
                den = ((2 * df_ + 1)
                       * (20 * tf * sdl + 6 * sdl + 18 * int(dl[d]) * n_))
                out_scores[d] = out_scores.get(d, 0) + num // den
        rows = sorted(out_scores)
        return pa.table({
            id_col: pa.array([int(ids[d]) for d in rows],
                             type=pa.int64()),
            "score_ppm": pa.array([out_scores[d] for d in rows],
                                  type=pa.int64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score_ppm", id_col],
                       descending=[True, False]).limit(k)


def bm25_topk_sql(*, query_terms, table: str = "documents",
                  text: str = "text", id_col: str = "doc_id",
                  k: int = 20) -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    tlist = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
        WITH d AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        tok AS (
          SELECT {id_col}, t.token, len(arr) AS dl
          FROM d, unnest(arr) AS t(token)
        ),
        st AS (SELECT count(*)::HUGEINT AS n, sum(len(arr))::HUGEINT AS sdl
               FROM d),
        dfv AS (
          SELECT token, count(DISTINCT {id_col})::HUGEINT AS df
          FROM tok WHERE token IN ({tlist}) GROUP BY 1
        ),
        tf AS (
          SELECT {id_col}, token, count(*)::HUGEINT AS tf, max(dl) AS dl
          FROM tok WHERE token IN ({tlist}) GROUP BY 1, 2
        ),
        term_scores AS (
          SELECT tf.{id_col},
                 (1000000::HUGEINT * tf.tf * 44 * st.sdl
                  * (2 * st.n - 2 * dfv.df + 1))
                 // ((2 * dfv.df + 1)
                     * (20 * tf.tf * st.sdl + 6 * st.sdl
                        + 18 * tf.dl::HUGEINT * st.n)) AS s
          FROM tf JOIN dfv USING (token), st
        )
        SELECT {id_col}, sum(s)::BIGINT AS score_ppm
        FROM term_scores GROUP BY 1
        ORDER BY score_ppm DESC, {id_col} LIMIT {k}"""


def bigram_surprisal(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     alpha: int = 1, num_buckets: int = 32):
    """Per-document BIGRAM surprisal in exact bits — the perplexity-style
    quality filter (CCNet's KenLM gate) at bigram order, with the module's
    log-free reproducibility contract: per adjacent pair occurrence

        bits(w1, w2) = ⌊log2(c_ctx(w1) + α·V)⌋ − ⌊log2(c_pair(w1,w2) + α)⌋

    — ⌊log2⌋ of the inverse Laplace-smoothed conditional probability
    ``(c_pair+α)/(c_ctx+α·V)`` (the same counts as :func:`vocab.bigram_lm`),
    summed over the doc.  High bits ⇒ improbable next-token sequence ⇒
    gibberish/shuffled text that UNIGRAM surprisal cannot see: a scrambled
    doc keeps its unigram score but its bigram score jumps.

    Scale shape: the smoothed pair table folds once (``bigram_lm``: pair
    partials → one w1-bucketed exchange) and broadcasts via ``ray.put`` —
    the observed-bigram table is the worker-fit contract here (same
    posture as ``encode_tokens``'s vocabulary; for an unbounded pair
    table, exchange per-doc pair partials through a w1-bucketed join
    instead); scoring is one stateless pass, every corpus pair is in the
    table by construction.  Output ``(id_col, n_pairs, bigram_bits)`` —
    docs with < 2 tokens score (0, 0).
    """
    import ray

    from htrc_feature_reader_ray.stages.profile import _ilog2
    from htrc_feature_reader_ray.stages.textstats import _tok_stats
    from htrc_feature_reader_ray.stages.vocab import (
        bigram_lm,
        corpus_token_counts,
    )

    V = corpus_token_counts(ds, text_col=text_col,
                            num_buckets=num_buckets).count()
    lm = bigram_lm(ds, text_col=text_col, alpha=alpha,
                   num_buckets=num_buckets).to_pandas()
    key = (lm["w1"].astype(str) + "\x1f" + lm["w2"].astype(str)).to_numpy()
    order = np.argsort(key)
    bits = (
        _ilog2((lm["c_ctx"].to_numpy() + alpha * V).astype(np.int64))
        - _ilog2((lm["c_pair"].to_numpy() + alpha).astype(np.int64))
    ).astype(np.int64)
    ref = ray.put((key[order], bits[order]))

    def score(batch: pa.Table) -> pa.Table:
        keys, pair_bits = ray.get(ref)
        flat, parent, nrows = _tok_stats(batch, text_col)
        parent = parent.astype(np.int64)
        toks = flat.to_numpy(zero_copy_only=False)
        n_pairs = np.zeros(nrows, dtype=np.int64)
        total = np.zeros(nrows, dtype=np.int64)
        if len(toks) >= 2:
            same = parent[:-1] == parent[1:]
            w1 = toks[:-1][same]
            w2 = toks[1:][same]
            owner = parent[:-1][same]
            if len(w1):
                pk = np.char.add(np.char.add(w1.astype(str), "\x1f"),
                                 w2.astype(str))
                pos = np.searchsorted(keys, pk)
                np.add.at(total, owner, pair_bits[pos])
                np.add.at(n_pairs, owner, 1)
        out = batch.select([id_col])
        out = out.append_column("n_pairs",
                                pa.array(n_pairs, type=pa.int64()))
        return out.append_column("bigram_bits",
                                 pa.array(total, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_surprisal_sql(*, table: str = "documents", text_col: str = "text",
                         id_col: str = "doc_id", alpha: int = 1) -> str:
    """SQL replay: rebuild the pair/context/vocab counts, join each doc's
    adjacent pairs, sum the identical bit-length difference
    (``⌊log2 x⌋ = length(format('{:b}', x)) − 1``; the −1s cancel)."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        dp AS (
          SELECT {id_col}, arr[i.i] AS w1, arr[i.i + 1] AS w2
          FROM base, unnest(generate_series(1, len(arr) - 1)) AS i(i)
        ),
        p AS (SELECT w1, w2, count(*)::BIGINT AS c_pair FROM dp GROUP BY 1, 2),
        v AS (
          SELECT count(DISTINCT t.tok)::BIGINT AS vocab
          FROM base, unnest(arr) AS t(tok)
        ),
        ctx AS (SELECT w1, sum(c_pair)::BIGINT AS c_ctx FROM p GROUP BY 1),
        scored AS (
          SELECT dp.{id_col}, count(*)::BIGINT AS n_pairs,
                 sum(length(format('{{:b}}', ctx.c_ctx + {alpha} * v.vocab))
                     - length(format('{{:b}}', p.c_pair + {alpha})))::BIGINT
                     AS bigram_bits
          FROM dp JOIN p USING (w1, w2) JOIN ctx USING (w1), v
          GROUP BY 1
        )
        SELECT d.{id_col},
               coalesce(s.n_pairs, 0)::BIGINT AS n_pairs,
               coalesce(s.bigram_bits, 0)::BIGINT AS bigram_bits
        FROM {table} d LEFT JOIN scored s USING ({id_col})"""


def postings_size(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int = 64):
    """Per-term inverted-index size estimate under delta + varint coding —
    ``(token, df, bytes_varint)`` — the index-capacity-planning pass run
    before building shards: posting lists store ascending doc-id GAPS,
    each gap in LEB128 (``⌈bitlen(gap)/7⌉`` bytes, 1 byte for gap 0), so
    total bytes is an exact integer any engine reproduces.

    Shape: the same distinct (doc, token) pair partials as
    :func:`build_postings`, one token-bucketed exchange, then one
    vectorized diff/bitlen pass per bucket (no per-term loop) — the
    estimate costs exactly one index-construction exchange, not an index
    build."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups
    from htrc_feature_reader_ray.stages.profile import _ilog2

    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy()[parent]
        t = pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "token": flat,
        })
        return t.group_by(["doc_id", "token"]).aggregate([])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop_duplicates(["token", "doc_id"])
                .sort_values(["token", "doc_id"], kind="mergesort",
                             ignore_index=True))
        ids = df["doc_id"].to_numpy()
        first = (df["token"].to_numpy()[1:] != df["token"].to_numpy()[:-1])
        first = np.concatenate(([True], first))
        gaps = np.where(first, ids, ids - np.concatenate(([0], ids[:-1])))
        nbytes = np.where(
            gaps == 0, 1,
            (_ilog2(np.maximum(gaps, 1)) + 7) // 7).astype(np.int64)
        df["_b"] = nbytes
        out = df.groupby("token", sort=False, as_index=False).agg(
            df_docs=("doc_id", "size"), bytes_varint=("_b", "sum"))
        out["df_docs"] = out["df_docs"].astype("int64")
        out["bytes_varint"] = out["bytes_varint"].astype("int64")
        return out

    folded = ds.map_batches(pairs, batch_format="pyarrow")
    return bucketed_map_groups(folded, "token", finish,
                               num_buckets=num_buckets)


def postings_size_sql(*, table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    """SQL mirror: lag() gaps, ``⌈bitlen/7⌉`` via format('{:b}')."""
    return f"""
        WITH pairs AS (
          SELECT DISTINCT t.token, {id_col} AS doc_id
          FROM {table}, unnest(string_split({text_col}, ' ')) AS t(token)
          WHERE t.token <> ''
        ),
        g AS (
          SELECT token,
                 doc_id - coalesce(lag(doc_id) OVER (
                     PARTITION BY token ORDER BY doc_id), 0) AS gap
          FROM pairs
        )
        SELECT token, count(*)::BIGINT AS df_docs,
               sum(CASE WHEN gap = 0 THEN 1
                        ELSE (length(format('{{:b}}', gap)) + 6) // 7
                   END)::BIGINT AS bytes_varint
        FROM g GROUP BY token"""


def freq_subsample(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   t_ppm: int = 1000, num_buckets: int = 64,
                   min_count: int = 1, method: str = "auto",
                   broadcast_limit: int = 5_000_000):
    """Frequent-word subsampling (word2vec's Mikolov rule: drop an
    occurrence of ``w`` with probability ``1 − √(t/f(w))``) made
    REPRODUCIBLE: the keep probability is the exact integer
    ``p_keep_ppm = min(10⁶, isqrt(t_ppm·10¹² // f_ppm))`` with
    ``f_ppm = cnt·10⁶ // N`` (tokens at or below the threshold frequency
    are always kept), and the coin is the corpus-seeded hash gate
    ``md5(doc:pos:token) % 10⁶ < p_keep_ppm`` — the same convention as
    :func:`token_dropout`, so the subsampled corpus regenerates
    bit-identically and audits in SQL instead of being stored.

    Scale shape: ONE vocabulary-bucketed count fold; then either the
    (token, p_keep_ppm) table BROADCASTS via ``ray.put`` (worker-fit
    vocabulary contract) and the gate + rebuild is one stateless
    vectorized pass (offset arithmetic + one ``pc.binary_join`` per
    batch), or — unbounded vocab — a token-bucketed JOIN path: the
    (doc, pos, token) stream ⋈ pkeep co-bucketed on token, then a
    doc-bucketed reassembly (text crosses twice, the vocabulary never
    reaches the driver). ``method='auto'`` picks by pruned-vocab row
    count against ``broadcast_limit`` (the ``line_dedup`` convention).

    ``min_count`` prunes tokens below the floor; a pruned/unseen token
    is ALWAYS KEPT (p_keep = 10⁶) — semantically EXACT whenever
    ``(min_count−1)·10⁶ // N ≤ t_ppm`` (a token that rare is at or
    under the threshold frequency, so the full table would keep it
    too; at the default t_ppm = 1000 that holds up to min_count ≈
    N/1000, far past any useful floor). Output
    ``(id, text_sub, n_dropped)``."""
    import math

    import ray

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_map_groups,
    )
    from htrc_feature_reader_ray.stages.vocab import corpus_token_counts

    counts_ds = corpus_token_counts(
        ds, text_col=text_col, num_buckets=num_buckets).materialize()
    tot = counts_ds.sum("count")
    N = int(tot) if tot is not None else 0

    def pkeep_of(cnt: int) -> int:
        f_ppm = cnt * 1_000_000 // max(N, 1)
        if f_ppm <= t_ppm:
            return 1_000_000
        return min(1_000_000, math.isqrt(t_ppm * 10**12 // f_ppm))

    if min_count > 1:
        counts_ds = counts_ds.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("count"), min_count)),
            batch_format="pyarrow")
    if method == "auto":
        method = ("broadcast" if counts_ds.count() <= broadcast_limit
                  else "join")

    if method == "broadcast":
        counts = counts_ds.to_pandas().sort_values(
            "token", ignore_index=True)
        pk = np.array([pkeep_of(int(c)) for c in counts["count"]],
                      dtype=np.int64)
        ref = ray.put((counts["token"].to_numpy(), pk))

        def subsample(batch: pa.Table) -> pa.Table:
            toks_arr, p_keep = ray.get(ref)
            flat, parent, nrows = _tok_stats(batch, text_col)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            if len(parent) == 0:
                return pa.table({
                    id_col: batch.column(id_col),
                    "text_sub": pa.array([""] * nrows, type=pa.string()),
                    "n_dropped": pa.array(np.zeros(nrows, dtype=np.int64)),
                })
            toks = flat.to_pylist()
            doc_ids = ids[parent]
            counts_b = np.bincount(parent, minlength=nrows)
            starts = np.concatenate(([0], np.cumsum(counts_b)[:-1]))
            pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
            h = md5_hash64([f"{d}:{p}:{t}" for d, p, t in
                            zip(doc_ids, pos, toks)])
            flat_np = flat.to_numpy(zero_copy_only=False)
            if len(toks_arr):
                loc = np.searchsorted(toks_arr, flat_np)
                loc_c = np.minimum(loc, len(toks_arr) - 1)
                hit = toks_arr[loc_c] == flat_np
                # pruned/unseen tokens: always kept (exact when rare
                # enough to sit under the threshold frequency)
                pk_tok = np.where(hit, p_keep[loc_c], 1_000_000)
            else:
                pk_tok = np.full(len(flat_np), 1_000_000, dtype=np.int64)
            keep = (h % np.uint64(1_000_000)).astype(np.int64) < pk_tok
            kept_counts = np.bincount(parent[keep], minlength=nrows)
            offsets = np.concatenate(([0], np.cumsum(kept_counts)))
            kept_list = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                flat.take(pa.array(np.flatnonzero(keep))))
            joined = pc.binary_join(kept_list, " ")
            return pa.table({
                id_col: batch.column(id_col),
                "text_sub": joined,
                "n_dropped": pa.array(
                    (counts_b - kept_counts).astype(np.int64)),
            })

        return ds.map_batches(subsample, batch_format="pyarrow")

    if method != "join":
        raise ValueError(f"unknown method {method!r}")

    # join path: (doc, pos, token) stream gated through a token-bucketed
    # join; text crosses the cluster twice, the vocab never leaves it
    def base(batch: pa.Table) -> pa.Table:
        _, parent, nrows = _tok_stats(batch, text_col)
        n_tok = np.bincount(
            parent.astype(np.int64), minlength=nrows).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
        })

    base_ds = ds.map_batches(base, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        parent = parent.astype(np.int64)
        counts_b = np.bincount(parent, minlength=nrows)
        starts = np.concatenate(([0], np.cumsum(counts_b)[:-1]))
        pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
        return pa.table({
            "__d": batch.column(id_col).take(pa.array(parent)),
            "pos": pa.array(pos, type=pa.int64()),
            "token": flat,
        })

    def with_pk(t: pa.Table) -> pa.Table:
        pk = np.array([pkeep_of(int(c)) for c in
                       t.column("count").to_pylist()], dtype=np.int64)
        return pa.table({"token": t.column("token"),
                         "p_keep": pa.array(pk, type=pa.int64())})

    gated = bucket_join(
        ds.map_batches(explode, batch_format="pyarrow"),
        counts_ds.map_batches(with_pk, batch_format="pyarrow"),
        left_key="token", right_key="token",
        num_buckets=num_buckets, how="left")

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"__d": df["__d"], "pos": df["pos"],
                                 "token": df["token"]})
        pk = df["p_keep"].fillna(1_000_000).astype("int64").to_numpy()
        h = md5_hash64([f"{d}:{p}:{t}" for d, p, t in
                        zip(df["__d"], df["pos"], df["token"])])
        keep = (h % np.uint64(1_000_000)).astype(np.int64) < pk
        out = df.loc[keep, ["__d", "pos", "token"]]
        return out.reset_index(drop=True)

    kept = gated.map_batches(gate, batch_format="pandas")

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "__d": pd.Series([], dtype=df["__d"].dtype),
                "text_sub": pd.Series([], dtype=object),
                "n_kept": pd.Series([], dtype="int64")})
        df = df.sort_values(["__d", "pos"], kind="mergesort")
        g = df.groupby("__d", sort=False)
        out = pd.DataFrame({
            "text_sub": g["token"].agg(" ".join),
            "n_kept": g["pos"].size().astype("int64"),
        }).reset_index().rename(columns={"__d": "__d"})
        return out

    joined_docs = bucket_join(
        base_ds,
        bucketed_map_groups(kept, "__d", reassemble,
                            num_buckets=num_buckets),
        left_key=id_col, right_key="__d",
        num_buckets=num_buckets, how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_sub"] = df["text_sub"].fillna("")
        n_kept = df["n_kept"].fillna(0).astype("int64")
        df["n_dropped"] = (df["n_tokens"].astype("int64")
                           - n_kept).astype("int64")
        return df[[id_col, "text_sub", "n_dropped"]]

    return joined_docs.map_batches(finish, batch_format="pandas")


def freq_subsample_sql(*, table: str = "documents", text: str = "text",
                       id_col: str = "doc_id", t_ppm: int = 1000) -> str:
    """SQL mirror: count fold + the ±1-corrected isqrt (exact floor
    square root) + the identical md5 gate and ordered rebuild."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"

    def isqrt(x: str) -> str:
        s = f"CAST(floor(sqrt(({x})::DOUBLE)) AS BIGINT)"
        return (f"({s} + (CASE WHEN ({s}+1)*({s}+1) <= ({x}) THEN 1 "
                f"ELSE 0 END) - (CASE WHEN {s}*{s} > ({x}) THEN 1 "
                f"ELSE 0 END))")

    return f"""
        WITH d AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        tok AS (
          SELECT {id_col}, arr[i.i] AS token, i.i - 1 AS pos
          FROM d, unnest(generate_series(1, len(arr))) AS i(i)
        ),
        voc AS (SELECT token, count(*)::BIGINT AS cnt FROM tok GROUP BY 1),
        tot AS (SELECT greatest(sum(cnt), 1)::BIGINT AS n FROM voc),
        pkeep AS (
          SELECT token,
                 CASE WHEN cnt * 1000000 // tot.n <= {t_ppm} THEN 1000000
                      ELSE least(1000000, {isqrt(
                          f"{t_ppm} * 1000000000000 // (cnt * 1000000 // tot.n)")})
                 END AS p_keep
          FROM voc, tot
        ),
        flagged AS (
          SELECT t.{id_col}, t.token, t.pos,
                 (md5_number_upper(
                      t.{id_col} || ':' || t.pos || ':' || t.token)
                  % 1000000 >= p.p_keep) AS dropped
          FROM tok t JOIN pkeep p USING (token)
        ),
        agg AS (
          SELECT {id_col},
                 string_agg(token, ' ' ORDER BY pos)
                   FILTER (WHERE NOT dropped) AS text_sub,
                 count(*) FILTER (WHERE dropped)::BIGINT AS n_dropped
          FROM flagged GROUP BY 1
        )
        SELECT doc.{id_col},
               coalesce(a.text_sub, '') AS text_sub,
               coalesce(a.n_dropped, 0)::BIGINT AS n_dropped
        FROM {table} doc LEFT JOIN agg a USING ({id_col})"""


# ---------------------------------------------------------------------------
# DSIR importance weights (hashed-n-gram data selection)


def dsir_weights(ds, target_ds, *, text_col: str = "text",
                 id_col: str = "doc_id", n_feat: int = 1024):
    """DSIR importance weights (Xie et al. NeurIPS'23, "Data Selection
    for Language Models via Importance Resampling"): per document, the
    log-likelihood ratio of a TARGET distribution vs the RAW corpus
    distribution over hashed n-gram features — the model-free
    data-selection score that upweights documents resembling a curated
    target (Wikipedia/books in the paper).

    Features are the paper's: unigrams + adjacent bigrams, hashed to
    ``n_feat`` buckets (md5 — the countmin cell convention, so SQL
    rebuilds identical buckets). The reproducibility contract replaces
    float log-probabilities with the module's exact HALF-BIT costs
    (cf. ``vocab.unigram_train``): with Laplace-smoothed bucket counts
    ``c+1`` and total ``T = Σ(c+1)``,

        cost(b) = bitlen(T²) − bitlen((c(b)+1)²)     ≈ 2·log2(T/(c+1))
        dsir_half_bits(doc) = Σ_grams cost_raw(b(g)) − cost_target(b(g))

    — positive ⇒ the doc's features are likelier under the target than
    under the raw corpus. Resample by thresholding, or pair the score
    with the deterministic hash gates (cf. ``freq_subsample`` /
    ``sample.hash_split``) for reproducible selection.

    Scale shape: each distribution folds to ≤ ``n_feat`` (bucket, count)
    rows — per-batch bincount partials then one FIXED-SIZE fold (n_feat
    is a constant, not vocabulary-sized), so the exchange volume is
    independent of corpus size; the cost-difference array broadcasts
    (8 KiB at the default) and scoring is one stateless zero-exchange
    pass. Output ``(id_col, n_grams, dsir_half_bits)``; docs with no
    tokens score (0, 0).
    """
    import ray
    from ray.data.aggregate import Sum

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.textstats import _tok_stats

    def gram_buckets(batch: pa.Table):
        flat, parent, nrows = _tok_stats(batch, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        parent = parent.astype(np.int64)
        grams = [toks.astype(str)]
        owners = [parent]
        if len(toks) >= 2:
            same = parent[:-1] == parent[1:]
            if same.any():
                grams.append(np.char.add(
                    np.char.add(grams[0][:-1][same], " "),
                    grams[0][1:][same]))
                owners.append(parent[:-1][same])
        g = np.concatenate(grams)
        own = np.concatenate(owners)
        if len(g) == 0:
            return np.zeros(0, dtype=np.int64), own, nrows
        b = (md5_hash64(list(g)) % np.uint64(n_feat)).astype(np.int64)
        return b, own, nrows

    def count_partial(batch: pa.Table) -> pa.Table:
        b, _, _ = gram_buckets(batch)
        folded = np.bincount(b, minlength=n_feat)
        nz = np.flatnonzero(folded)
        return pa.table({
            "bucket": pa.array(nz.astype(np.int64)),
            "cnt": pa.array(folded[nz].astype(np.int64)),
        })

    def fold_counts(d) -> np.ndarray:
        rows = (
            d.map_batches(count_partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
        ).to_pandas()
        c = np.zeros(n_feat, dtype=np.int64)
        if len(rows):
            c[rows["bucket"].to_numpy()] = rows["cnt"].to_numpy()
        return c

    def half_bit_costs(c: np.ndarray) -> np.ndarray:
        # arbitrary-precision per bucket — T² overflows int64 past ~3e9
        # grams; n_feat-sized loop on the driver is free
        T = int(c.sum()) + n_feat
        t2len = (T * T).bit_length()
        return np.array(
            [t2len - ((int(x) + 1) ** 2).bit_length() for x in c],
            dtype=np.int64)

    diff = half_bit_costs(fold_counts(ds)) - half_bit_costs(
        fold_counts(target_ds))
    ref = ray.put(diff)

    def score(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        b, own, nrows = gram_buckets(batch)
        n_grams = np.zeros(nrows, dtype=np.int64)
        total = np.zeros(nrows, dtype=np.int64)
        if len(b):
            np.add.at(n_grams, own, 1)
            np.add.at(total, own, d[b])
        out = batch.select([id_col])
        out = out.append_column("n_grams",
                                pa.array(n_grams, type=pa.int64()))
        return out.append_column("dsir_half_bits",
                                 pa.array(total, type=pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_weights_sql(*, table: str = "documents",
                     target_where: str = "lang = 'en'",
                     text_col: str = "text", id_col: str = "doc_id",
                     n_feat: int = 1024) -> str:
    """SQL replay: identical md5 buckets (``md5_number_upper % n_feat``),
    Laplace bucket counts per side over all ``n_feat`` buckets, the same
    bit-length half-bit costs. DuckDB's ``format('{:b}')`` is
    BIGINT-only, so the mirror squares in BIGINT — its documented domain
    is ``T < 2³¹·⁵`` grams per side (the same bound as
    ``unigram_train_sql``); the engine itself is arbitrary-precision.
    LEFT-JOIN finish so token-free docs keep (0, 0)."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    cost = ("length(format('{{:b}}', {t}.t * {t}.t)) - length(format("
            "'{{:b}}', (coalesce({c}.c, 0) + 1)"
            " * (coalesce({c}.c, 0) + 1)))")
    return f"""
        WITH base AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        grams AS (
          SELECT {id_col}, t.g FROM base, unnest(arr) AS t(g)
          UNION ALL
          SELECT {id_col}, arr[i.i] || ' ' || arr[i.i + 1] AS g
          FROM base, unnest(generate_series(1, len(arr) - 1)) AS i(i)
        ),
        gb AS MATERIALIZED (
          SELECT {id_col},
                 (md5_number_upper(g)::UBIGINT % {n_feat})::BIGINT AS bucket
          FROM grams
        ),
        tc AS (
          SELECT bucket, count(*)::BIGINT AS c FROM gb
          WHERE {id_col} IN (SELECT {id_col} FROM {table}
                             WHERE {target_where})
          GROUP BY 1
        ),
        rc AS (SELECT bucket, count(*)::BIGINT AS c FROM gb GROUP BY 1),
        tt AS (SELECT (coalesce(sum(c), 0) + {n_feat})::BIGINT AS t
               FROM tc),
        rt AS (SELECT (coalesce(sum(c), 0) + {n_feat})::BIGINT AS t
               FROM rc),
        allb AS (SELECT r.range::BIGINT AS bucket FROM range({n_feat}) r),
        costs AS (
          SELECT b.bucket,
                 {cost.format(t='rt', c='rc')} AS cost_raw,
                 {cost.format(t='tt', c='tc')} AS cost_tgt
          FROM allb b
          LEFT JOIN rc ON rc.bucket = b.bucket
          LEFT JOIN tc ON tc.bucket = b.bucket, rt, tt
        ),
        scored AS (
          SELECT gb.{id_col}, count(*)::BIGINT AS n_grams,
                 sum(costs.cost_raw - costs.cost_tgt)::BIGINT
                     AS dsir_half_bits
          FROM gb JOIN costs USING (bucket) GROUP BY 1
        )
        SELECT d.{id_col},
               coalesce(s.n_grams, 0)::BIGINT AS n_grams,
               coalesce(s.dsir_half_bits, 0)::BIGINT AS dsir_half_bits
        FROM {table} d LEFT JOIN scored s USING ({id_col})"""


# ---------------------------------------------------------------------------
# per-source distribution divergence (corpus-mixture health)


def source_divergence(ds, *, group_col: str = "source",
                      text_col: str = "text", num_buckets: int = 32):
    """Per-group KL-style divergence of the group's token distribution
    from the WHOLE corpus's — the mixture-health diagnostic behind
    DoReMi-style reweighting ("which source is most off-distribution").
    Both distributions are Laplace-smoothed over the global vocabulary
    (support V), and the divergence uses the module's exact HALF-BIT
    contract:

        cost_X(t) = bitlen((T_X + V)²) − bitlen((c_X(t)+1)²)
        kl_half_bits(s) = Σ_t c_s(t) · (cost_global(t) − cost_s(t))

    ≈ 2·n_s·KL(p̂_s ‖ p̂_corpus) in occurrence-weighted half-bits —
    integer-exact, so bit-identical across parallelism and SQL-
    replayable (per-token floors may leave tiny negative contributions;
    the sum tracks KL, it is not axiomatically ≥ 0). Output
    ``(group_col, n_tokens, n_types, kl_half_bits)``.

    Scale shape: ONE token-bucketed (group, token) fold (the pair table
    is ≤ S·V, never occurrence-sized); the global vocabulary costs and
    per-group totals derive from that fold — no second corpus scan; the
    finish is a tiny per-group sum over the folded table with the
    vocabulary cost map broadcast (the module's canonical worker-fit
    small side, same posture as ``encode_tokens``).
    """
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate
    from htrc_feature_reader_ray.stages.textstats import _tok_stats

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        grp = batch.column(group_col).take(
            pa.array(parent, type=pa.int64()))
        t = pa.table({group_col: grp, "token": flat})
        g = t.group_by([group_col, "token"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "token", "c"])

    pair = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="token",
    ).materialize()  # two folded consumers below — fold the corpus ONCE

    # global vocabulary costs + per-group totals: V- and S-sized tables
    # derived from the pair fold, both worker-fit by the vocab contract
    gcnt = bucketed_aggregate(
        pair, "token", {"c": ("c", "sum")}, num_buckets=8).to_pandas()
    totals = pair.to_pandas().groupby(group_col, as_index=False)["c"].sum()
    V = len(gcnt)
    Tg = int(gcnt["c"].sum()) + V
    tg2 = (Tg * Tg).bit_length()
    gcost = {
        t: tg2 - ((int(c) + 1) ** 2).bit_length()
        for t, c in zip(gcnt["token"], gcnt["c"])
    }
    ts2 = {
        s: ((int(n) + V) * (int(n) + V)).bit_length()
        for s, n in zip(totals[group_col], totals["c"])
    }
    ref = ray.put((gcost, ts2))

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        gc, t2 = ray.get(ref)
        c = df["c"].to_numpy(dtype=np.int64)
        cost_g = df["token"].map(gc).to_numpy(dtype=np.int64)
        cost_s = (
            df[group_col].map(t2).to_numpy(dtype=np.int64)
            - np.array([((int(x) + 1) ** 2).bit_length() for x in c],
                       dtype=np.int64)
        )
        out = pd.DataFrame({
            group_col: df[group_col],
            "n_tokens": c,
            "n_types": np.ones(len(df), dtype=np.int64),
            "kl_half_bits": c * (cost_g - cost_s),
        })
        return out.groupby(group_col, sort=False, as_index=False).sum()

    return (
        pair.map_batches(contrib, batch_format="pandas")
        .groupby(group_col)
        .sum(["n_tokens", "n_types", "kl_half_bits"])
        .map_batches(lambda t: t.rename_columns(
            [group_col, "n_tokens", "n_types", "kl_half_bits"]),
            batch_format="pyarrow")
    )


def source_divergence_sql(*, table: str = "documents",
                          group_col: str = "source",
                          text_col: str = "text") -> str:
    """SQL replay: the same (group, token) / global counts and
    bit-length half-bit costs (BIGINT domain: corpora under 2³¹·⁵
    tokens, cf. dsir_weights_sql)."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    return f"""
        WITH occ AS (
          SELECT {group_col}, u.t AS token
          FROM {table}, unnest({toks}) AS u(t)
        ),
        sc AS (SELECT {group_col}, token, count(*)::BIGINT AS c
               FROM occ GROUP BY 1, 2),
        gc AS (SELECT token, sum(c)::BIGINT AS c FROM sc GROUP BY 1),
        v AS (SELECT count(*)::BIGINT AS v, (sum(c) + count(*))::BIGINT
                     AS tg FROM gc),
        st AS (SELECT {group_col}, (sum(c) + (SELECT v FROM v))::BIGINT
                      AS ts FROM sc GROUP BY 1)
        SELECT sc.{group_col},
               sum(sc.c)::BIGINT AS n_tokens,
               count(*)::BIGINT AS n_types,
               sum(sc.c * (
                 (length(format('{{:b}}', v.tg * v.tg))
                  - length(format('{{:b}}', (gc.c + 1) * (gc.c + 1))))
                 - (length(format('{{:b}}', st.ts * st.ts))
                    - length(format('{{:b}}', (sc.c + 1) * (sc.c + 1))))
               ))::BIGINT AS kl_half_bits
        FROM sc JOIN gc USING (token) JOIN st USING ({group_col}), v
        GROUP BY 1"""


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (hybrid retrieval)


def rank_by(ds, *, id_col: str, sort_cols, ascending,
            out_id: str | None = None):
    """Turn a TOP-K result table into a 1-based ranked list
    ``(out_id, rank)`` under the given (sort_cols, ascending) order.
    Top-k lists are k-row by construction, so the table folds to one
    block for the row_number — this helper is for RANKED-LIST finishes,
    not corpus-sized tables."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(list(sort_cols), ascending=list(ascending),
                            kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            out_id or id_col: df[id_col],
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
        })

    return ds.repartition(1).map_batches(assign, batch_format="pandas")


def rrf_fuse(ranked, *, id_col: str = "doc_id", k_rrf: int = 60):
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    hybrid-retrieval combiner (lexical BM25 ⊕ dense cosine, or any set
    of ranked lists): per document

        rrf_ppb = Σ_lists 10⁹ // (k_rrf + rank)

    in exact integer parts-per-billion (the float 1/(k+r) made
    reproducible; k_rrf=60 is the paper's constant). Rank-based, so
    incomparable score scales fuse without normalization. Output
    ``(id_col, n_lists, rrf_ppb)``; docs appear once per list they rank
    in (n_lists tracks coverage).

    Inputs are ``(id_col, rank)`` tables (see :func:`rank_by`); the
    union + per-doc fold moves only ranked rows — Σk rows total, never
    the corpus."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        r = df["rank"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            id_col: df[id_col],
            "n_lists": np.ones(len(df), dtype=np.int64),
            "rrf_ppb": 1_000_000_000 // (k_rrf + r),
        })

    u = ranked[0]
    for d in ranked[1:]:
        u = u.union(d)
    return (
        u.map_batches(contrib, batch_format="pandas")
        .groupby(id_col)
        .sum(["n_lists", "rrf_ppb"])
        .map_batches(lambda t: t.rename_columns(
            [id_col, "n_lists", "rrf_ppb"]), batch_format="pyarrow")
    )


def rrf_fuse_sql(*, list_sqls, id_cols, k_rrf: int = 60,
                 id_col: str = "doc_id") -> str:
    """SQL replay: each list SQL must emit (its id col, rank); lists
    union and fold with the identical integer floor."""
    branches = "\n          UNION ALL ".join(
        f"SELECT {ic} AS {id_col}, rank FROM ({q})"
        for q, ic in zip(list_sqls, id_cols))
    return f"""
        WITH u AS (
          {branches}
        )
        SELECT {id_col}, count(*)::BIGINT AS n_lists,
               sum(1000000000 // ({k_rrf} + rank))::BIGINT AS rrf_ppb
        FROM u GROUP BY 1"""


# ---------------------------------------------------------------------------
# T5-style span corruption (denoising-pretraining prep)


def span_corruption(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    stride: int = 4, gate_mod: int = 4, max_span: int = 3):
    """Deterministic T5-style span corruption (Raffel et al., JMLR'20):
    mask contiguous token spans with ``<extra_id_k>`` sentinels, emitting
    ``(id, input_text, target_text, n_spans, n_masked)`` — the denoising
    pretraining pair, REGENERATED bit-identically instead of stored (the
    ``token_dropout`` posture at span granularity).

    The reproducibility contract that keeps it vectorized and
    SQL-replayable: span starts are STRIDE-ALIGNED (``pos % stride == 0``)
    and gated by ``md5(doc:pos:span) % gate_mod == 0``; span length is
    ``md5(doc:pos:len) % max_span + 1 ≤ stride``, so spans can never
    overlap and membership is pure block arithmetic (no sequential scan).
    Expected mask rate ≈ mean_len/(stride·gate_mod) (≈ 12.5% at the
    defaults, T5's ballpark). Sentinels number spans 0.. in document
    order; the target is each sentinel followed by its masked tokens
    (document order). Zero exchange; both texts rebuild through ONE
    ``pc.binary_join`` per batch."""
    if max_span > stride:
        raise ValueError("max_span must be <= stride (overlap-free "
                         "contract)")
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    def corrupt(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(parent) == 0:
            empty = pa.array([""] * nrows, type=pa.string())
            z = pa.array(np.zeros(nrows, dtype=np.int64))
            return pa.table({id_col: batch.column(id_col),
                             "input_text": empty, "target_text": empty,
                             "n_spans": z, "n_masked": z})
        toks = np.asarray(flat.to_pylist(), dtype=object)
        n = len(parent)
        counts = np.bincount(parent, minlength=nrows)
        doc_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(n, dtype=np.int64) - doc_start[parent]
        doc_ids = ids[parent]

        cand = np.flatnonzero(pos % stride == 0)
        hg = md5_hash64([f"{doc_ids[g]}:{pos[g]}:span" for g in cand])
        gated = cand[(hg % np.uint64(gate_mod)) == 0]
        span_len = np.zeros(n, dtype=np.int64)
        head = np.zeros(n, dtype=bool)
        if len(gated):
            hl = md5_hash64([f"{doc_ids[g]}:{pos[g]}:len" for g in gated])
            span_len[gated] = (hl % np.uint64(max_span)).astype(
                np.int64) + 1
            head[gated] = True
        gb = np.arange(n, dtype=np.int64) - (pos % stride)
        masked = head[gb] & ((pos % stride) < span_len[gb])

        c = np.cumsum(head.astype(np.int64))
        excl = c - head.astype(np.int64)
        k = excl - excl[doc_start[parent]]  # span ordinal within doc
        sent = np.array([f"<extra_id_{v}>" for v in k], dtype=object)

        # input: unmasked tokens verbatim, heads replaced by sentinels,
        # members dropped
        keep_in = ~masked | head
        tok_in = np.where(head, sent, toks)
        kept_counts = np.bincount(parent[keep_in], minlength=nrows)
        off_in = np.concatenate(([0], np.cumsum(kept_counts)))
        in_list = pa.ListArray.from_arrays(
            pa.array(off_in, type=pa.int32()),
            pa.array(tok_in[keep_in], type=pa.string()))

        # target: per span, sentinel then its tokens (doc order)
        e = np.where(masked & head, 2, np.where(masked, 1, 0))
        o = np.cumsum(e) - e
        total = int(e.sum())
        out = np.empty(total, dtype=object)
        hm = masked & head
        out[o[hm]] = sent[hm]
        out[o[hm] + 1] = toks[hm]
        mm = masked & ~head
        out[o[mm]] = toks[mm]
        tgt_counts = np.bincount(parent, weights=e,
                                 minlength=nrows).astype(np.int64)
        off_t = np.concatenate(([0], np.cumsum(tgt_counts)))
        tgt_list = pa.ListArray.from_arrays(
            pa.array(off_t, type=pa.int32()),
            pa.array(out, type=pa.string()))

        return pa.table({
            id_col: batch.column(id_col),
            "input_text": pc.binary_join(in_list, " "),
            "target_text": pc.binary_join(tgt_list, " "),
            "n_spans": pa.array(
                np.bincount(parent[hm], minlength=nrows).astype(np.int64)),
            "n_masked": pa.array(
                np.bincount(parent[masked],
                            minlength=nrows).astype(np.int64)),
        })

    return ds.map_batches(corrupt, batch_format="pyarrow")


def span_corruption_sql(*, table: str = "documents", text: str = "text",
                        id_col: str = "doc_id", stride: int = 4,
                        gate_mod: int = 4, max_span: int = 3) -> str:
    """SQL replay: block-head join for membership, window count for
    sentinel ordinals, two-slot sub-order for the target string_agg."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH d AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        tok AS (
          SELECT {id_col}, arr[i.i] AS token, (i.i - 1)::BIGINT AS pos
          FROM d, unnest(generate_series(1, len(arr))) AS i(i)
        ),
        heads AS (
          SELECT {id_col}, pos,
                 (md5_number_upper({id_col} || ':' || pos || ':span')
                  % {gate_mod} = 0) AS gated,
                 (md5_number_upper({id_col} || ':' || pos || ':len')
                  % {max_span} + 1)::BIGINT AS l
          FROM tok WHERE pos % {stride} = 0
        ),
        marks AS (
          SELECT t.{id_col}, t.pos, t.token,
                 coalesce(h.gated AND (t.pos % {stride}) < h.l, FALSE)
                     AS masked,
                 coalesce(h.gated, FALSE)
                     AND t.pos % {stride} = 0 AS is_head
          FROM tok t LEFT JOIN heads h
            ON h.{id_col} = t.{id_col}
           AND h.pos = t.pos - t.pos % {stride}
        ),
        ranked AS (
          SELECT *, (sum(CASE WHEN is_head THEN 1 ELSE 0 END)
                       OVER (PARTITION BY {id_col} ORDER BY pos)
                     - CASE WHEN is_head THEN 1 ELSE 0 END)::BIGINT AS k
          FROM marks
        ),
        input_agg AS (
          SELECT {id_col},
                 string_agg(CASE WHEN is_head
                                 THEN '<extra_id_' || k || '>'
                                 ELSE token END, ' ' ORDER BY pos)
                   FILTER (WHERE NOT masked OR is_head) AS input_text
          FROM ranked GROUP BY 1
        ),
        tgt_rows AS (
          SELECT {id_col}, pos, 0 AS sub,
                 '<extra_id_' || k || '>' AS piece
          FROM ranked WHERE is_head
          UNION ALL
          SELECT {id_col}, pos, 1 AS sub, token FROM ranked WHERE masked
        ),
        tgt_agg AS (
          SELECT {id_col},
                 string_agg(piece, ' ' ORDER BY pos, sub) AS target_text
          FROM tgt_rows GROUP BY 1
        ),
        stats AS (
          SELECT {id_col},
                 count(*) FILTER (is_head)::BIGINT AS n_spans,
                 count(*) FILTER (masked)::BIGINT AS n_masked
          FROM ranked GROUP BY 1
        )
        SELECT d.{id_col},
               coalesce(i.input_text, '') AS input_text,
               coalesce(t.target_text, '') AS target_text,
               coalesce(s.n_spans, 0)::BIGINT AS n_spans,
               coalesce(s.n_masked, 0)::BIGINT AS n_masked
        FROM d LEFT JOIN input_agg i USING ({id_col})
               LEFT JOIN tgt_agg t USING ({id_col})
               LEFT JOIN stats s USING ({id_col})"""


def prefix_lm_split(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    lo_ppm: int = 250_000, hi_ppm: int = 750_000):
    """Deterministic prefix-LM split (UL2's S-denoiser / PrefixLM prep,
    Tay et al. '23): each document splits into (prefix, continuation) at
    a pivot drawn REPRODUCIBLY in [lo_ppm, hi_ppm] of its length —
    ``frac_ppm = lo + md5(doc:pivot) % (hi − lo + 1)``,
    ``pivot = max(1, n·frac_ppm // 10⁶)`` tokens. Completes the UL2
    denoiser family next to :func:`span_corruption` (R) and plain LM.

    Zero exchange, fully vectorized (list-slice rebuild through two
    ``pc.binary_join`` calls). Docs with < 2 tokens emit
    ``(text, '')`` — nothing to continue. Output
    ``(id, prefix_text, target_text, pivot, n_tokens)``."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    width = hi_ppm - lo_ppm + 1

    def split(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = np.bincount(parent, minlength=nrows).astype(np.int64)
        h = md5_hash64([f"{v}:pivot" for v in ids])
        frac = lo_ppm + (h % np.uint64(width)).astype(np.int64)
        pivot = np.maximum(n * frac // 1_000_000, 1)
        pivot = np.where(n < 2, n, np.minimum(pivot, n - 1))
        doc_start = np.concatenate(([0], np.cumsum(n)[:-1]))
        cut = doc_start + pivot
        # interleaved offsets: [start_0, cut_0, end_0(=start_1), cut_1, ...]
        # give each doc two contiguous list slots (prefix, continuation)
        off = np.zeros(2 * nrows + 1, dtype=np.int64)
        off[1::2] = cut
        off[2::2] = doc_start + n
        lists = pa.ListArray.from_arrays(
            pa.array(off, type=pa.int32()), flat)
        joined = pc.binary_join(lists, " ")
        return pa.table({
            id_col: batch.column(id_col),
            "prefix_text": joined.take(
                pa.array(np.arange(0, 2 * nrows, 2))),
            "target_text": joined.take(
                pa.array(np.arange(1, 2 * nrows, 2))),
            "pivot": pa.array(np.where(n < 2, n, pivot), type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
        })

    return ds.map_batches(split, batch_format="pyarrow")


def prefix_lm_split_sql(*, table: str = "documents", text: str = "text",
                        id_col: str = "doc_id", lo_ppm: int = 250_000,
                        hi_ppm: int = 750_000) -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    width = hi_ppm - lo_ppm + 1
    return f"""
        WITH d AS (
          SELECT {id_col}, {toks} AS arr,
                 len({toks})::BIGINT AS n,
                 ({lo_ppm} + md5_number_upper({id_col} || ':pivot')
                  % {width})::BIGINT AS frac
          FROM {table}
        ),
        p AS (
          SELECT {id_col}, arr, n,
                 CASE WHEN n < 2 THEN n
                      ELSE least(greatest(n * frac // 1000000, 1), n - 1)
                 END AS piv
          FROM d
        )
        SELECT {id_col},
               coalesce(array_to_string(list_slice(arr, 1, piv), ' '), '')
                   AS prefix_text,
               coalesce(array_to_string(list_slice(arr, piv + 1, n), ' '),
                        '') AS target_text,
               piv::BIGINT AS "pivot", n AS n_tokens
        FROM p"""


def fim_split(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic fill-in-the-middle transform (Bavarian et al. '22,
    arXiv:2207.14255): split each document into (prefix, middle, suffix)
    at two reproducibly md5-drawn pivots and emit the PSM training string
    ``<PRE> prefix <SUF> suffix <MID> middle``. Completes the denoiser
    family next to :func:`span_corruption` (R) and
    :func:`prefix_lm_split` (S).

    Reproducibility contract (exact integers, SQL-replayable):
    ``f_k = md5(doc:fimk) % 10⁶``; for n ≥ 3 tokens
    ``p1 = 1 + (n−2)·f1 // 10⁶ ∈ [1, n−2]`` and
    ``p2 = p1 + 1 + (n−1−p1)·f2 // 10⁶ ∈ [p1+1, n−1]``, so all three
    parts are non-empty. Docs with < 3 tokens degenerate to
    ``(text, '', '')`` with ``p1 = p2 = n``. Zero exchange: each doc gets
    three contiguous list slots via one interleaved-offset ``ListArray``
    and all parts rebuild through ONE ``pc.binary_join``; the PSM string
    is a second 6-slot join (sentinels interleaved).

    Output ``(id, prefix_text, middle_text, suffix_text, psm_text,
    p1, p2, n_tokens)``."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    M = np.uint64(1_000_000)

    def split(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = np.bincount(parent, minlength=nrows).astype(np.int64)
        f1 = (md5_hash64([f"{v}:fim1" for v in ids]) % M).astype(np.int64)
        f2 = (md5_hash64([f"{v}:fim2" for v in ids]) % M).astype(np.int64)
        p1 = 1 + (n - 2) * f1 // 1_000_000
        p2 = p1 + 1 + (n - 1 - p1) * f2 // 1_000_000
        deg = n < 3
        p1 = np.where(deg, n, p1)
        p2 = np.where(deg, n, p2)
        doc_start = np.concatenate(([0], np.cumsum(n)[:-1]))
        off = np.zeros(3 * nrows + 1, dtype=np.int64)
        off[1::3] = doc_start + p1
        off[2::3] = doc_start + p2
        off[3::3] = doc_start + n
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off, type=pa.int32()), flat),
            " ")
        prefix = joined.take(pa.array(np.arange(0, 3 * nrows, 3)))
        middle = joined.take(pa.array(np.arange(1, 3 * nrows, 3)))
        suffix = joined.take(pa.array(np.arange(2, 3 * nrows, 3)))
        # PSM assembly: 6 slots per doc [<PRE>, prefix, <SUF>, suffix,
        # <MID>, middle], one more binary_join
        slot = np.empty(6 * nrows, dtype=object)
        slot[0::6] = "<PRE>"
        slot[1::6] = prefix.to_numpy(zero_copy_only=False)
        slot[2::6] = "<SUF>"
        slot[3::6] = suffix.to_numpy(zero_copy_only=False)
        slot[4::6] = "<MID>"
        slot[5::6] = middle.to_numpy(zero_copy_only=False)
        psm = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(np.arange(0, 6 * nrows + 1, 6), type=pa.int32()),
                pa.array(slot, type=pa.string())),
            " ")
        return pa.table({
            id_col: batch.column(id_col),
            "prefix_text": prefix, "middle_text": middle,
            "suffix_text": suffix, "psm_text": psm,
            "p1": pa.array(p1, type=pa.int64()),
            "p2": pa.array(p2, type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
        })

    return ds.map_batches(split, batch_format="pyarrow")


def fim_split_sql(*, table: str = "documents", text: str = "text",
                  id_col: str = "doc_id") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH d AS (
          SELECT {id_col}, {toks} AS arr, len({toks})::BIGINT AS n,
                 (md5_number_upper({id_col} || ':fim1')
                  % 1000000)::BIGINT AS f1,
                 (md5_number_upper({id_col} || ':fim2')
                  % 1000000)::BIGINT AS f2
          FROM {table}
        ),
        c1 AS (
          SELECT *, CASE WHEN n < 3 THEN n
                         ELSE 1 + (n - 2) * f1 // 1000000 END AS p1
          FROM d
        ),
        c2 AS (
          SELECT *, CASE WHEN n < 3 THEN n
                         ELSE p1 + 1 + (n - 1 - p1) * f2 // 1000000
                    END AS p2
          FROM c1
        ),
        parts AS (
          SELECT {id_col},
                 coalesce(array_to_string(
                     list_slice(arr, 1, p1), ' '), '') AS prefix_text,
                 coalesce(array_to_string(
                     list_slice(arr, p1 + 1, p2), ' '), '') AS middle_text,
                 coalesce(array_to_string(
                     list_slice(arr, p2 + 1, n), ' '), '') AS suffix_text,
                 p1::BIGINT AS p1, p2::BIGINT AS p2, n AS n_tokens
          FROM c2
        )
        SELECT {id_col}, prefix_text, middle_text, suffix_text,
               '<PRE> ' || prefix_text || ' <SUF> ' || suffix_text
                 || ' <MID> ' || middle_text AS psm_text,
               p1, p2, n_tokens
        FROM parts"""


def luhn_card_flags(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    min_len: int = 13, max_len: int = 19):
    """Checksum-validated payment-card detection (the PII-redaction
    refinement): per document, every MAXIMAL digit run of plausible card
    length is a candidate, and a candidate is flagged only when it passes
    the Luhn mod-10 check (ISO/IEC 7812) — cutting the false-positive
    redactions a bare ``\\d{13,19}`` rule makes on ids/timestamps (~10% of
    random digit runs pass Luhn).

    Vectorized, zero exchange: non-digits collapse to spaces in one RE2
    replace, runs split into one list array; candidates LEFT-zero-pad to
    ``max_len`` (leading zeros never change a Luhn sum — they contribute
    0 doubled or not) and the whole candidate set becomes one (k, max_len)
    codepoint matrix; the doubled-digit correction ``2d − 9·[2d>9]`` is a
    single mask, per-doc counts are two bincounts. Output
    ``(id, n_candidates, n_luhn_valid)``."""

    def flags(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        text = pc.cast(batch.column(text_col), pa.string())
        runs = pc.split_pattern(
            pc.replace_substring_regex(text, "[^0-9]", " "), " ")
        if isinstance(runs, pa.ChunkedArray):
            runs = runs.combine_chunks()
        off = runs.offsets.to_numpy()
        flat = runs.values
        parent = np.repeat(np.arange(nrows), np.diff(off))
        ln = pc.utf8_length(flat).to_numpy()
        keep = (ln >= min_len) & (ln <= max_len)
        cands = flat.filter(pa.array(keep))
        parent = parent[keep]
        n_cand = np.bincount(parent, minlength=nrows)
        if len(parent):
            padded = pc.utf8_lpad(cands, max_len, "0")
            m = np.array(padded.to_pylist(), dtype=f"<U{max_len}")
            d = m.view(np.uint32).reshape(len(parent), max_len) - 48
            # from the right: check digit r=0 undoubled, double odd r;
            # column c holds r = max_len-1-c, so double where (max_len-1-c)
            # is odd
            dbl = ((max_len - 1 - np.arange(max_len)) % 2) == 1
            contrib = np.where(dbl[None, :], 2 * d - 9 * (d >= 5), d)
            valid = contrib.sum(axis=1) % 10 == 0
            n_valid = np.bincount(parent[valid], minlength=nrows)
        else:
            n_valid = np.zeros(nrows, dtype=np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_candidates": pa.array(n_cand.astype(np.int64)),
            "n_luhn_valid": pa.array(n_valid.astype(np.int64)),
        })

    return ds.map_batches(flags, batch_format="pyarrow")


def luhn_card_flags_sql(*, table: str = "documents", text: str = "text",
                        id_col: str = "doc_id", min_len: int = 13,
                        max_len: int = 19) -> str:
    """SQL replay: maximal digit runs via regexp_extract_all, Luhn as a
    per-character unnest sum with the identical doubled-digit CASE."""
    return f"""
        WITH cand AS (
          SELECT {id_col}, arr[j.j] AS run, j.j AS ord
          FROM (SELECT {id_col},
                       regexp_extract_all({text}, '[0-9]+') AS arr
                FROM {table}),
               LATERAL unnest(generate_series(1, len(arr))) AS j(j)
          WHERE len(arr[j.j]) BETWEEN {min_len} AND {max_len}
        ),
        luhn AS (
          SELECT {id_col}, ord,
                 sum(CASE WHEN (len(run) - i) % 2 = 1
                          THEN 2 * dgt - 9 * (CASE WHEN dgt >= 5
                                                   THEN 1 ELSE 0 END)
                          ELSE dgt END) % 10 = 0 AS ok
          FROM (
            SELECT {id_col}, ord, run, i.i AS i,
                   substring(run, i.i, 1)::INT AS dgt
            FROM cand, LATERAL unnest(
              generate_series(1, len(run))) AS i(i)
          )
          GROUP BY 1, 2
        )
        SELECT d.{id_col},
               coalesce(c.n_candidates, 0)::BIGINT AS n_candidates,
               coalesce(v.n_valid, 0)::BIGINT AS n_luhn_valid
        FROM {table} d
        LEFT JOIN (SELECT {id_col}, count(*) AS n_candidates
                   FROM cand GROUP BY 1) c USING ({id_col})
        LEFT JOIN (SELECT {id_col}, count(*) AS n_valid
                   FROM luhn WHERE ok GROUP BY 1) v USING ({id_col})"""


# ---------------------------------------------------------------------------
# cross-document boilerplate-line removal (CCNet-style line dedup)


def line_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
               min_docs: int = 2, method: str = "auto",
               broadcast_limit: int = 2_000_000, num_buckets: int = 32):
    """CCNet-style boilerplate-line removal (Wenzek et al., LREC'20 §3.2;
    the same pre-dedup step RefinedWeb/Dolma run): a line whose exact text
    appears in at least ``min_docs`` DISTINCT documents is boilerplate
    (nav bars, cookie banners, footers) and is removed from every document;
    the survivors are re-joined in original order.  Output: one row per doc
    — (id, ``text_clean``, ``n_lines``, ``n_dropped``).

    Distinct-doc counting is exact under any batching because a document row
    never splits across batches: the per-batch partial drops within-batch
    (doc, line) repeats, so summing partials counts each (doc, line) pair
    once.  Lines are identified by 64-bit md5 (the simhash/winnow
    convention, :func:`..dedup.md5_hash64`) hashed once per batch line
    VOCABULARY; the SQL mirror groups by the raw line — identical output
    absent a 64-bit collision.

    Scale shape: line text NEVER crosses an exchange.  Phase 1 folds
    (digest, n_docs) partials through one digest-keyed
    ``bucketed_aggregate``; the boilerplate digest set then applies either

    * ``method='broadcast'`` — ship the int64 digest array once via
      ``ray.put`` behind a loud ``broadcast_limit`` guard and rebuild
      map-side (zero further exchange).  Boilerplate is by definition the
      high-df head of the line distribution, so this set is vocabulary-like
      small even when the corpus is not; or
    * ``method='join'`` — for unbounded dup sets: explode (id, pos, digest)
      24-byte rows, inner ``bucket_join`` against the dup digests, fold the
      dropped positions per doc (pair-output-sized), LEFT ``bucket_join``
      back onto the docs and rebuild — the one doc-text exchange.

    ``method='auto'`` picks 'broadcast' while the folded dup set is within
    ``broadcast_limit`` rows, else 'join'.  Both paths are pinned equal by
    test."""
    import ray

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    def _line_hashes(batch: pa.Table):
        """(parent int64[], digest int64[], flat lines) for one batch."""
        lines = pc.split_pattern(batch.column(text_col), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        parent = pc.list_parent_indices(lines).to_numpy()
        flat = pc.list_flatten(lines)
        vals = flat.to_pandas().to_numpy(dtype=object)
        uniq, inv = np.unique(vals, return_inverse=True)
        dig = md5_hash64(uniq).view(np.int64)[inv]
        return parent, dig, flat

    def partial(batch: pa.Table) -> pa.Table:
        parent, dig, _ = _line_hashes(batch)
        pairs = pd.DataFrame({"p": parent, "digest": dig}).drop_duplicates()
        g = pairs.groupby("digest", sort=False).size()
        return pa.table({
            "digest": pa.array(g.index.to_numpy(), pa.int64()),
            "n_docs": pa.array(g.to_numpy(dtype=np.int64), pa.int64()),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["digest"], {"n_docs": ("n_docs", "sum")}, num_buckets=num_buckets)
    dup = folded.filter(expr=f"n_docs >= {min_docs}").select_columns(
        ["digest"])

    if method == "auto":
        dup_pdf = dup.limit(broadcast_limit + 1).to_pandas()
        method = "broadcast" if len(dup_pdf) <= broadcast_limit else "join"
    elif method == "broadcast":
        dup_pdf = dup.to_pandas()
        if len(dup_pdf) > broadcast_limit:
            raise ValueError(
                f"dup-line set ({len(dup_pdf)}) exceeds broadcast_limit "
                f"({broadcast_limit}); use method='join'")

    def _rebuild(batch: pa.Table, keep: np.ndarray, parent: np.ndarray,
                 flat: pa.Array) -> pa.Table:
        n = len(batch)
        n_lines = np.bincount(parent, minlength=n).astype(np.int64)
        kept_per = np.bincount(parent[keep], minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(kept_per, out=offsets[1:])
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets), flat.filter(pa.array(keep)))
        out = batch.select([id_col])
        out = out.append_column(
            "text_clean", pc.binary_join(
                kept_list.cast(pa.list_(pa.string())), "\n"))
        out = out.append_column("n_lines", pa.array(n_lines, pa.int64()))
        out = out.append_column(
            "n_dropped", pa.array(n_lines - kept_per, pa.int64()))
        return out

    if method == "broadcast":
        arr = (dup_pdf["digest"].to_numpy(dtype=np.int64)
               if len(dup_pdf) else np.array([], dtype=np.int64))
        ref = ray.put(np.sort(arr))

        def apply_bcast(batch: pa.Table) -> pa.Table:
            parent, dig, flat = _line_hashes(batch)
            keep = ~np.isin(dig, ray.get(ref))
            return _rebuild(batch, keep, parent, flat)

        return ds.map_batches(apply_bcast, batch_format="pyarrow")

    if method != "join":
        raise ValueError(f"unknown method {method!r}")

    def explode(batch: pa.Table) -> pa.Table:
        parent, dig, _ = _line_hashes(batch)
        ids = batch.column(id_col).take(pa.array(parent))
        # parent is nondecreasing, so the first flat index of each doc is
        # searchsorted-left of the doc's own parent value
        pos = (np.arange(len(parent), dtype=np.int64)
               - np.searchsorted(parent, parent, side="left"))
        return pa.table({
            id_col: ids,
            "pos": pa.array(pos, pa.int64()),
            "digest": pa.array(dig, pa.int64()),
        })

    dropped = bucket_join(
        ds.map_batches(explode, batch_format="pyarrow"), dup,
        left_key="digest", right_key="digest", how="semi",
        num_buckets=num_buckets).select_columns([id_col, "pos"])
    # positions ride the exchange as a comma-joined string: pair-output
    # sized, and schema-stable through the tag+union join substrate (a
    # list<int64> column with nulls is not)
    drop_lists = bucketed_aggregate(
        dropped, [id_col],
        {"drop_pos": ("pos", lambda s: ",".join(map(str, sorted(s))))},
        num_buckets=num_buckets)
    joined = bucket_join(ds, drop_lists, left_key=id_col, right_key=id_col,
                         how="left", num_buckets=num_buckets)

    def apply_join(df: pd.DataFrame) -> pa.Table:
        batch = pa.Table.from_pandas(
            df[[id_col, text_col]].astype({text_col: str}),
            preserve_index=False)
        parent, _, flat = _line_hashes(batch)
        keep = np.ones(len(parent), dtype=bool)
        base = (np.searchsorted(parent, np.arange(len(df)), side="left")
                if len(parent) else np.zeros(len(df), dtype=np.int64))
        for i, s in enumerate(df["drop_pos"].tolist()):
            if isinstance(s, str) and s:
                keep[base[i] + np.array(s.split(","), dtype=np.int64)] \
                    = False
        return _rebuild(batch, keep, parent, flat)

    return joined.map_batches(apply_join, batch_format="pandas")


def line_dedup_sql(*, table: str = "documents", text: str = "text",
                   id_col: str = "doc_id", min_docs: int = 2) -> str:
    """Self-contained SQL mirror of :func:`line_dedup` (groups by the raw
    line where the engine groups by its 64-bit md5)."""
    return f"""
        WITH d AS (
          SELECT {id_col}, string_split({text}, chr(10)) AS arr
          FROM {table}
        ),
        lines AS (
          SELECT {id_col}, arr[i.i] AS l, i.i - 1 AS pos
          FROM d, LATERAL unnest(generate_series(1, len(arr))) AS i(i)
        ),
        dup AS (
          SELECT l FROM lines
          GROUP BY l HAVING count(DISTINCT {id_col}) >= {min_docs}
        )
        SELECT {id_col},
               coalesce(string_agg(l, chr(10) ORDER BY pos)
                   FILTER (WHERE l NOT IN (SELECT l FROM dup)), '')
                   AS text_clean,
               count(*)::BIGINT AS n_lines,
               count(*) FILTER (WHERE l IN (SELECT l FROM dup))::BIGINT
                   AS n_dropped
        FROM lines GROUP BY 1"""


# ---------------------------------------------------------------------------
# retrieval evaluation: MRR over phrase relevance
# ---------------------------------------------------------------------------

def _retrieval_sweep(ds, queries: dict, *, k: int, text_col: str,
                     id_col: str, num_buckets: int = 16):
    """Shared ONE-corpus-pass kernel under the retrieval-eval suite
    (:func:`retrieval_mrr` / :func:`retrieval_pr_at_k` /
    :func:`retrieval_ndcg_at_k`): the per-query loop those ops shipped
    with ran ``bm25_topk`` (2 corpus passes) + ``phrase_search`` (1
    pass) PER QUERY — 3·Q scans, unacceptable at an evaluation suite of
    Q = 1000. This sweep broadcasts the WHOLE query set and pays a
    Q-independent number of passes:

    - pass 1 folds N, Σdl and df over the UNION of all queries' terms
      (the bm25 stats partial, one fold for every query at once);
    - pass 2 scores each batch once: per-(doc, union-term) exact
      rational-BM25 term scores (computed ONCE — the score of a
      (doc, term) pair is query-independent, so each query's doc score
      is just a subset-sum), one ``pc.equal`` lane per DISTINCT union
      word shared across all phrase-adjacency checks, then per query a
      local top-k plus (n_rel2, n_rel1x) count partials;
    - ONE query-bucketed fold collapses local top-ks to the global
      top-k per query (k-sized tables in the exchange, rank contract
      (score desc, id asc)) and sums the relevance counts; the driver
      merge is Q×k rows.

    Relevance contract is verbatim from the per-query ops: rel2 = exact
    adjacent-phrase containment (``phrase_search`` shift-AND kernel),
    rel1x = conjunctive all-words containment (``boolean_retrieval``
    distinct-term count) minus rel2. Docs matching no union term never
    leave their batch.

    Returns ``(topk, counts)``: ``topk[qid]`` = rank-ordered list of
    ``(doc_id, score_ppm, rel2, rel1x)`` (≤ k rows), ``counts[qid]`` =
    ``(n_rel2, n_rel1x)``.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    qids = sorted(queries)
    qspec = []
    for qid in qids:
        words = [w for w in queries[qid].split(" ") if w]
        if not words:
            raise ValueError("phrase must contain at least one token")
        qspec.append((qid, words, frozenset(words)))
    union_terms = sorted({w for _, words, _ in qspec for w in words})
    term_set = pa.array(union_terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        dl_sum = int(len(parent))
        if len(flat):
            t = pa.table({"d": pa.array(parent.astype(np.int64)),
                          "tok": flat})
            m = pc.is_in(t.column("tok"), value_set=term_set)
            dd = t.filter(m).group_by(["d", "tok"]).aggregate([])
            dfp = dd.group_by("tok").aggregate([([], "count_all")])
            toks = dfp.column("tok").to_pylist()
            dfs = dfp.column("count_all").to_numpy().astype(np.int64)
        else:
            toks, dfs = [], np.array([], dtype=np.int64)
        return pa.table({
            "term": pa.array(["\x00N", "\x00DL"] + toks,
                             type=pa.string()),
            "v": pa.array(np.concatenate(
                [[nrows, dl_sum], dfs]).astype(np.int64)),
        })

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    sv = dict(zip(stats["term"], stats["v"].map(int)))
    n_corpus = sv.pop("\x00N", 0)
    sdl_corpus = sv.pop("\x00DL", 0)
    ref = ray.put((n_corpus, sdl_corpus, sv, qspec))

    def kernel(batch: pa.Table) -> pa.Table:
        n_, sdl, dfm, spec = ray.get(ref)
        flat, parent, nrows = _tok_stats(batch, text_col)
        parent = parent.astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ntok = len(parent)
        dl = np.bincount(parent, minlength=nrows) if nrows else \
            np.array([], dtype=np.int64)
        d_rows, t_rows, s_rows = [], [], []
        if ntok:
            t = pa.table({"d": pa.array(parent), "tok": flat})
            m_in = pc.is_in(t.column("tok"), value_set=term_set)
            tf_tbl = t.filter(m_in).group_by(["d", "tok"]).aggregate(
                [([], "count_all")])
            for d, tok, tf in zip(
                    tf_tbl.column("d").to_pylist(),
                    tf_tbl.column("tok").to_pylist(),
                    tf_tbl.column("count_all").to_pylist()):
                df_ = dfm.get(tok, 0)
                num = (10**6 * tf * 44 * sdl * (2 * n_ - 2 * df_ + 1))
                den = ((2 * df_ + 1)
                       * (20 * tf * sdl + 6 * sdl
                          + 18 * int(dl[d]) * n_))
                d_rows.append(d)
                t_rows.append(tok)
                s_rows.append(num // den)
        lanes: dict = {}

        def lane(w):
            if w not in lanes:
                lanes[w] = pc.equal(flat, w).to_numpy(
                    zero_copy_only=False)
            return lanes[w]

        o_qid, o_doc, o_score, o_r2, o_r1, o_cnt = [], [], [], [], [], []
        for qid, words, wset in spec:
            mq = len(words)
            rel2_docs: set = set()
            if ntok >= mq:
                match = lane(words[0])[:ntok - mq + 1].copy()
                for k2 in range(1, mq):
                    match &= lane(words[k2])[k2:ntok - mq + 1 + k2]
                match &= parent[:ntok - mq + 1] == parent[mq - 1:]
                rel2_docs = set(
                    np.unique(parent[np.flatnonzero(match)]).tolist())
            scores: dict = {}
            matched: dict = {}
            for d, tok, s in zip(d_rows, t_rows, s_rows):
                if tok in wset:
                    scores[d] = scores.get(d, 0) + s
                    matched[d] = matched.get(d, 0) + 1
            nw = len(wset)
            rel1x_docs = {d for d, c in matched.items()
                          if c == nw} - rel2_docs
            order = sorted(scores,
                           key=lambda d: (-scores[d], int(ids[d])))[:k]
            for d in order:
                o_qid.append(qid)
                o_doc.append(int(ids[d]))
                o_score.append(scores[d])
                o_r2.append(int(d in rel2_docs))
                o_r1.append(int(d in rel1x_docs))
                o_cnt.append(0)
            o_qid.append(qid)
            o_doc.append(-1)
            o_score.append(0)
            o_r2.append(len(rel2_docs))
            o_r1.append(len(rel1x_docs))
            o_cnt.append(1)
        return pa.table({
            "query_id": pa.array(o_qid, type=pa.string()),
            "doc_id_": pa.array(o_doc, type=pa.int64()),
            "score_ppm": pa.array(o_score, type=pa.int64()),
            "rel2": pa.array(o_r2, type=pa.int64()),
            "rel1x": pa.array(o_r1, type=pa.int64()),
            "is_cnt": pa.array(o_cnt, type=pa.int64()),
        })

    slim = ds.map_batches(kernel, batch_format="pyarrow").materialize()

    def only(flag):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("is_cnt"), flag))
        return f

    counts_df = bucketed_aggregate(
        slim.map_batches(only(1), batch_format="pyarrow"),
        ["query_id"],
        {"n_rel2": ("rel2", "sum"), "n_rel1x": ("rel1x", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(["query_id", "score_ppm", "doc_id_"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("query_id", sort=False).head(k)

    topk_df = bucketed_map_groups(
        slim.map_batches(only(0), batch_format="pyarrow"),
        "query_id", head_k, num_buckets=num_buckets,
    ).to_pandas()

    counts = {qid: (0, 0) for qid in qids}
    for r in counts_df.itertuples(index=False):
        counts[r.query_id] = (int(r.n_rel2), int(r.n_rel1x))
    topk = {qid: [] for qid in qids}
    if len(topk_df):
        for qid, grp in topk_df.groupby("query_id", sort=False):
            g = grp.sort_values(["score_ppm", "doc_id_"],
                                ascending=[False, True],
                                kind="mergesort").head(k)
            topk[qid] = [
                (int(r.doc_id_), int(r.score_ppm), int(r.rel2),
                 int(r.rel1x))
                for r in g.itertuples(index=False)]
    return topk, counts


def retrieval_mrr(ds, queries: dict, *, k: int = 20,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Mean-reciprocal-rank evaluation of the rational-BM25 ranker against
    exact positional-phrase relevance — the retrieval acceptance metric
    (the sparse sibling of :func:`similarity.ann_recall`): per query,
    rank the corpus by :func:`bm25_topk` over the phrase's WORDS
    (order-blind bag-of-words) and define relevance as
    :func:`phrase_search` containment of the exact ADJACENT phrase; the
    gap between the two is precisely what MRR measures. ``rr_ppm =
    10⁶ // rank`` of the first relevant doc in the top-k under the
    (score desc, id asc) rank contract, 0 when no relevant doc makes the
    cut. Output one row per query: ``(query_id, n_relevant, first_rank,
    rr_ppm)`` with first_rank = 0 for a miss.

    Posture: the WHOLE query set evaluates in the Q-independent
    :func:`_retrieval_sweep` (one stats fold + one scoring pass + one
    query-bucketed top-k fold); the driver merge is Q×k rows. Queries
    evaluate in sorted(qid) order for determinism.
    """
    import ray.data

    topk, counts = _retrieval_sweep(ds, queries, k=k, text_col=text_col,
                                    id_col=id_col)
    rows = []
    for qid in sorted(queries):
        rank = 0
        for i, (_, _, r2, _) in enumerate(topk[qid], 1):
            if r2:
                rank = i
                break
        rows.append((qid, counts[qid][0], rank,
                     1_000_000 // rank if rank else 0))
    out = pd.DataFrame(
        rows, columns=["query_id", "n_relevant", "first_rank", "rr_ppm"])
    for c in ("n_relevant", "first_rank", "rr_ppm"):
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def retrieval_pr_at_k(ds, queries: dict, *, k: int = 20,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Precision/recall/F1 @ k of the rational-BM25 ranker against exact
    positional-phrase relevance — the set-quality half of the retrieval
    acceptance suite (:func:`retrieval_mrr` scores the FIRST hit's rank;
    P/R@k score the whole cutoff, which is what matters when the
    retrieved set feeds RAG context or labeling): with ``h = |top-k ∩
    relevant|``,

        ``precision_ppm = h·10⁶ // k``
        ``recall_ppm    = h·10⁶ // n_relevant``  (0 when none relevant)
        ``f1_ppm        = 2·h·10⁶ // (k + n_relevant)``

    — the F1 identity 2PR/(P+R) = 2h/(k+n) keeps all three exact
    integers (no float harmonic mean). Same (score desc, id asc) rank
    contract as retrieval_mrr; the whole query set evaluates in the
    Q-independent :func:`_retrieval_sweep` (one stats fold + one
    scoring pass + one query-bucketed fold), driver merge of Q×k rows.

    Reference parity: evaluation-harness shape follows the reference's
    acceptance-test style (cf. test_feature_reader.py) re-expressed as
    a corpus-scale metric."""
    import ray.data

    topk, counts = _retrieval_sweep(ds, queries, k=k, text_col=text_col,
                                    id_col=id_col)
    rows = []
    for qid in sorted(queries):
        h = sum(r2 for _, _, r2, _ in topk[qid])
        n_rel = counts[qid][0]
        rows.append((qid, n_rel, h,
                     h * 1_000_000 // k,
                     h * 1_000_000 // n_rel if n_rel else 0,
                     2 * h * 1_000_000 // (k + n_rel)))
    out = pd.DataFrame(rows, columns=[
        "query_id", "n_relevant", "hits", "precision_ppm",
        "recall_ppm", "f1_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def retrieval_pr_at_k_sql(queries: dict, *, k: int = 20,
                          table: str = "documents", text: str = "text",
                          id_col: str = "doc_id") -> str:
    """SQL mirror: per query, bm25 top-k replay under the identical rank
    contract, hit count vs the phrase-relevant set, the same exact
    integer P/R/F1 forms."""
    parts = []
    for qid in sorted(queries):
        phrase = queries[qid]
        bm25 = bm25_topk_sql(query_terms=phrase.split(), table=table,
                             text=text, id_col=id_col, k=k)
        rel = phrase_search_sql(phrase, table=table, text_col=text,
                                id_col=id_col)
        parts.append(f"""
        SELECT '{qid}' AS query_id, nr AS n_relevant, h AS hits,
               (h * 1000000 // {k})::BIGINT AS precision_ppm,
               CASE WHEN nr > 0 THEN (h * 1000000 // nr)::BIGINT
                    ELSE 0 END AS recall_ppm,
               (2 * h * 1000000 // ({k} + nr))::BIGINT AS f1_ppm
        FROM (
          SELECT (SELECT count(*) FROM ({rel}))::BIGINT AS nr,
                 (SELECT count(*) FROM ({bm25}) t
                   WHERE t.{id_col} IN (SELECT {id_col} FROM ({rel}))
                 )::BIGINT AS h
        )""")
    return " UNION ALL ".join(parts)


def retrieval_mrr_sql(queries: dict, *, k: int = 20,
                      table: str = "documents", text: str = "text",
                      id_col: str = "doc_id") -> str:
    """SQL mirror: per query, row_number the bm25 top-k replay under the
    identical rank contract, min rank over the phrase-relevant set."""
    parts = []
    for qid in sorted(queries):
        phrase = queries[qid]
        bm25 = bm25_topk_sql(query_terms=phrase.split(), table=table,
                             text=text, id_col=id_col, k=k)
        rel = phrase_search_sql(phrase, table=table, text_col=text,
                                id_col=id_col)
        parts.append(f"""
        SELECT '{qid}' AS query_id,
               (SELECT count(*) FROM ({rel}))::BIGINT AS n_relevant,
               coalesce((
                 SELECT min(rk) FROM (
                   SELECT row_number() OVER (
                       ORDER BY score_ppm DESC, {id_col}) AS rk, {id_col}
                   FROM ({bm25})
                 ) r
                 WHERE {id_col} IN (SELECT {id_col} FROM ({rel}))
               ), 0)::BIGINT AS first_rank,
               coalesce((
                 SELECT 1000000 // min(rk) FROM (
                   SELECT row_number() OVER (
                       ORDER BY score_ppm DESC, {id_col}) AS rk, {id_col}
                   FROM ({bm25})
                 ) r
                 WHERE {id_col} IN (SELECT {id_col} FROM ({rel}))
               ), 0)::BIGINT AS rr_ppm""")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# graded retrieval quality: NDCG@k
# ---------------------------------------------------------------------------

#: Pinned DCG discount weights: ``_NDCG_W[i] = round(10**6 / log2(i+1))``
#: for rank i = 1..20, embedded as LITERALS (never recomputed at runtime)
#: so engine and SQL mirror share the exact same integers and no libm /
#: float-rounding question can enter the hash gate.  Index 0 is unused.
_NDCG_W = (0, 1000000, 630930, 500000, 430677, 386853, 356207, 333333,
           315465, 301030, 289065, 278943, 270238, 262650, 255958, 250000,
           244651, 239812, 235409, 231378, 227670)


def retrieval_ndcg_at_k(ds, queries: dict, *, k: int = 10,
                        text_col: str = "text", id_col: str = "doc_id"):
    """NDCG@k of the rational-BM25 ranker under GRADED relevance — the
    third leg of the retrieval acceptance suite (:func:`retrieval_mrr`
    scores the first hit's rank, :func:`retrieval_pr_at_k` the binary
    cutoff set; NDCG is the metric that rewards putting the MORE relevant
    docs higher, which is what matters when grades aren't binary —
    Järvelin & Kekäläinen's standard, the default leaderboard metric of
    BEIR/MTEB-style retrieval evals).

    Graded relevance is derived from the corpus itself, exactly: grade 2 =
    :func:`phrase_search` containment of the ADJACENT phrase, grade 1 =
    :func:`boolean_retrieval` conjunctive containment of all the phrase's
    words without adjacency, grade 0 otherwise — the natural two-level
    ladder for a phrase query (exact mention beats bag-of-words mention).

    Exact-integer contract: ``DCG = Σ_{i≤k} grade(rank i) · W[i]`` with
    ``W`` the PINNED literal table ``round(10⁶/log2(i+1))`` (both engines
    read the same integers — no runtime log); ``IDCG`` sorts the full
    relevance grade multiset desc and truncates at k; ``ndcg_ppm =
    DCG·10⁶ // IDCG`` (0 when nothing is relevant, by contract). Rank
    order is the engine-wide (score desc, id asc) contract.

    Posture: the whole query set evaluates in the Q-independent
    :func:`_retrieval_sweep` (one stats fold + one scoring/relevance
    pass + one query-bucketed fold — the graded flags ride the same
    rows); the Q×k merge is driver-side per the retrieval_mrr
    convention. Output one row per query: ``(query_id, n_rel2, n_rel1,
    dcg_fix, idcg_fix, ndcg_ppm)``.
    """
    if k >= len(_NDCG_W):
        raise ValueError(f"retrieval_ndcg_at_k: k <= {len(_NDCG_W) - 1}")
    topk, counts = _retrieval_sweep(ds, queries, k=k, text_col=text_col,
                                    id_col=id_col)
    rows = []
    for qid in sorted(queries):
        n2, n1 = counts[qid]
        dcg = sum(
            _NDCG_W[i] * (2 if r2 else 1 if r1 else 0)
            for i, (_, _, r2, r1) in enumerate(topk[qid], 1))
        grades = [2] * n2 + [1] * n1  # already desc
        idcg = sum(_NDCG_W[i] * g
                   for i, g in enumerate(grades[:k], 1))
        rows.append((qid, n2, n1, dcg, idcg,
                     dcg * 1_000_000 // idcg if idcg else 0))
    out = pd.DataFrame(rows, columns=[
        "query_id", "n_rel2", "n_rel1", "dcg_fix", "idcg_fix",
        "ndcg_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def retrieval_ndcg_at_k_sql(queries: dict, *, k: int = 10,
                            table: str = "documents", text: str = "text",
                            id_col: str = "doc_id") -> str:
    """SQL mirror: bm25 top-k replay row_number'd under the identical rank
    contract, grade CASE over the phrase/boolean relevance sets, the same
    literal W(i) VALUES table on both the DCG and the desc-sorted-grades
    IDCG sides."""
    wvals = ", ".join(f"({i}, {_NDCG_W[i]})" for i in range(1, k + 1))
    parts = []
    for qid in sorted(queries):
        phrase = queries[qid]
        bm25 = bm25_topk_sql(query_terms=phrase.split(), table=table,
                             text=text, id_col=id_col, k=k)
        rel2 = phrase_search_sql(phrase, table=table, text_col=text,
                                 id_col=id_col)
        rel1 = boolean_retrieval_sql(phrase.split(), table=table,
                                     text_col=text, id_col=id_col)
        parts.append(f"""
        SELECT '{qid}' AS query_id, n_rel2, n_rel1, dcg AS dcg_fix,
               idcg AS idcg_fix,
               CASE WHEN idcg > 0 THEN (dcg * 1000000 // idcg)::BIGINT
                    ELSE 0 END AS ndcg_ppm
        FROM (
          SELECT
            (SELECT count(*) FROM ({rel2}))::BIGINT AS n_rel2,
            (SELECT count(*) FROM ({rel1}) b
              WHERE b.{id_col} NOT IN (SELECT {id_col} FROM ({rel2}))
            )::BIGINT AS n_rel1,
            coalesce((
              SELECT sum(w.w * CASE
                  WHEN t.{id_col} IN (SELECT {id_col} FROM ({rel2}))
                      THEN 2
                  WHEN t.{id_col} IN (SELECT {id_col} FROM ({rel1}))
                      THEN 1
                  ELSE 0 END)
              FROM (SELECT {id_col}, row_number() OVER (
                        ORDER BY score_ppm DESC, {id_col}) AS rk
                    FROM ({bm25})) t
              JOIN (VALUES {wvals}) AS w(i, w) ON w.i = t.rk
            ), 0)::BIGINT AS dcg,
            coalesce((
              SELECT sum(w.w * g.g)
              FROM (SELECT g, row_number() OVER (ORDER BY g DESC) AS rk
                    FROM (
                      SELECT 2 AS g FROM ({rel2})
                      UNION ALL
                      SELECT 1 AS g FROM ({rel1}) b
                      WHERE b.{id_col} NOT IN
                            (SELECT {id_col} FROM ({rel2}))
                    )) g
              JOIN (VALUES {wvals}) AS w(i, w) ON w.i = g.rk
            ), 0)::BIGINT AS idcg
        )""")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets
# ---------------------------------------------------------------------------


def perplexity_buckets(ds, *, text_col: str = "text",
                       id_col: str = "doc_id", lang_col: str = "lang",
                       num_buckets: int = 64):
    """CCNet's head/middle/tail language-model-quality split (Wenzek et
    al., the partition behind CCNet/RedPajama corpus releases): per
    language, docs are ordered by per-token LM surprisal and cut into
    terciles — ``head`` = lowest-perplexity third (Wikipedia-like),
    ``tail`` = highest (noisy), the label downstream mixing policies
    consume directly.

    Exact contract: per-doc score = ``surprisal_bits·1000 //
    max(n_tokens, 1)`` (per-token MILLI-bits over
    :func:`surprisal_score`'s exact ⌊log2⌋ unigram surprisal — bounded
    support ≤ 64 000 since bits/token ≤ ⌊log2 N⌋ ≤ 63, the quantization
    that makes the tercile fold a bounded-support fold). Thresholds use
    the engine-wide ceil-rank ``quantile_disc`` convention per language:
    ``t1`` = value at ascending rank ``(n+2)//3``, ``t2`` at
    ``(2n+2)//3``; bucket = head iff score ≤ t1, middle iff ≤ t2, else
    tail (ties fall to the better bucket — tie-order-proof because the
    value AT a rank is invariant to tie permutation). Empty docs score 0
    → head, by contract.

    Scale shape: ONE vocabulary fold (inside surprisal_score) + one
    stateless scoring pass into a slim materialized (id, lang, score)
    table, ONE bounded-support (lang, score) count fold, per-lang
    threshold walk on the driver (audit-sized), thresholds broadcast
    into a stateless assignment map — no doc-keyed exchange anywhere.
    Output ``(doc_id, lang, score_mbits, bucket)``.
    """
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    scored = surprisal_score(ds, text_col=text_col, id_col=id_col,
                             num_buckets=num_buckets,
                             keep_cols=(lang_col,))

    def to_score(t: pa.Table) -> pa.Table:
        bits = t.column("surprisal_bits").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        s = bits * 1000 // np.maximum(n, 1)
        return pa.table({
            id_col: t.column(id_col),
            lang_col: t.column(lang_col),
            "score_mbits": pa.array(s.astype(np.int64)),
        })

    sds = scored.map_batches(to_score, batch_format="pyarrow").materialize()

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([lang_col, "score_mbits"]).group_by(
            [lang_col, "score_mbits"]).aggregate([([], "count_all")])
        cnt = [c for c in g.column_names if c.endswith("count_all")][0]
        return pa.table({
            lang_col: g.column(lang_col),
            "score_mbits": g.column("score_mbits"),
            "n": g.column(cnt).cast(pa.int64()),
        })

    folded = bucketed_aggregate(
        sds.map_batches(partial, batch_format="pyarrow"),
        [lang_col, "score_mbits"], {"n": ("n", "sum")},
        num_buckets=num_buckets, bucket_key="score_mbits",
    ).to_pandas().sort_values([lang_col, "score_mbits"])

    th = {}
    for lang, grp in folded.groupby(lang_col, sort=False):
        c = grp["n"].astype("int64").to_numpy()
        v = grp["score_mbits"].astype("int64").to_numpy()
        n = int(c.sum())
        cum = np.cumsum(c)
        r1, r2 = (n + 2) // 3, (2 * n + 2) // 3
        t1 = int(v[np.searchsorted(cum, r1)])
        t2 = int(v[np.searchsorted(cum, r2)])
        th[lang] = (t1, t2)
    ref = ray.put(th)

    def assign(t: pa.Table) -> pa.Table:
        thresholds = ray.get(ref)
        langs = t.column(lang_col).to_numpy(zero_copy_only=False)
        s = t.column("score_mbits").to_numpy(zero_copy_only=False)
        t1 = np.array([thresholds[x][0] for x in langs], dtype=np.int64)
        t2 = np.array([thresholds[x][1] for x in langs], dtype=np.int64)
        bucket = np.where(s <= t1, "head",
                          np.where(s <= t2, "middle", "tail"))
        return t.append_column(
            "bucket", pa.array(bucket, type=pa.string()))

    return sds.map_batches(assign, batch_format="pyarrow")


def perplexity_buckets_sql(*, table: str = "documents",
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           lang_col: str = "lang") -> str:
    """SQL mirror: the surprisal oracle joined back to lang, the same
    milli-bit floor quantization, ceil-rank tercile thresholds via
    row_number over (score, id) — the value at a rank is tie-order
    invariant — and the identical ≤-threshold CASE ladder."""
    surp = surprisal_score_sql(table=table, text_col=text_col,
                               id_col=id_col)
    return f"""
        WITH surp AS ({surp}),
        s AS (
          SELECT d.{id_col}, d.{lang_col},
                 (sp.surprisal_bits * 1000
                  // greatest(sp.n_tokens, 1))::BIGINT AS score_mbits
          FROM {table} d JOIN surp sp USING ({id_col})
        ),
        rk AS (
          SELECT {lang_col}, score_mbits,
                 row_number() OVER (PARTITION BY {lang_col}
                     ORDER BY score_mbits, {id_col}) AS r,
                 count(*) OVER (PARTITION BY {lang_col}) AS n
          FROM s
        ),
        th AS (
          SELECT {lang_col},
                 max(CASE WHEN r = (n + 2) // 3
                     THEN score_mbits END) AS t1,
                 max(CASE WHEN r = (2 * n + 2) // 3
                     THEN score_mbits END) AS t2
          FROM rk GROUP BY 1
        )
        SELECT s.{id_col}, s.{lang_col}, s.score_mbits,
               CASE WHEN s.score_mbits <= th.t1 THEN 'head'
                    WHEN s.score_mbits <= th.t2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM s JOIN th USING ({lang_col})"""


def best_window(ds, query_terms, *, width: int = 20,
                text_col: str = "text", id_col: str = "doc_id"):
    """Snippet locator: for every document containing at least one query
    term, the 0-based token offset of the DENSEST width-``width`` token
    window (most query-term hits; earliest such window on ties) — the
    serving-side step after :func:`bm25_topk` ranks and
    :func:`phrase_search` verifies: a result page shows a snippet, and
    the snippet worth showing is the window where the query's terms
    cluster. Output ``(id, n_hits, win_pos, win_hits)`` with ``n_hits``
    the doc's total hit count riding along.

    Exact contract: hits = token membership in the query set
    (multiplicity counts); windows are full-width and fully inside the
    document; documents SHORTER than ``width`` use their whole span
    (win_pos 0, win_hits = n_hits). Ties break to the smallest offset
    (mirror: ``ORDER BY wh DESC, pos ASC``).

    Scale shape: ZERO exchange (the :func:`phrase_search` posture) —
    membership is one ``pc.is_in`` over the flat token array, window
    sums are one cumsum difference, the per-doc argmax folds with
    ``np.maximum.at``/``minimum.at``; the query set ships in the task
    closure and the output is hit-doc-sized."""
    terms = sorted({t for t in query_terms if t})
    if not terms or width < 1:
        raise ValueError("need nonempty query_terms and width >= 1")
    vs = pa.array(terms)

    from htrc_feature_reader_ray.stages.textstats import _tok_stats

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, nrows = _tok_stats(batch, text_col)
        n = len(parent)
        parent = parent.astype(np.int64)
        ind = pc.is_in(flat, value_set=vs).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tot = np.bincount(parent, weights=ind,
                          minlength=nrows).astype(np.int64)
        nd = np.bincount(parent, minlength=nrows).astype(np.int64)
        starts = np.cumsum(nd) - nd
        wmax = np.where(nd < width, tot, -1)
        wpos = np.zeros(nrows, dtype=np.int64)
        if n >= width:
            cs = np.concatenate([[0], np.cumsum(ind)])
            wh = (cs[width:] - cs[:-width]).astype(np.int64)
            valid = parent[: n - width + 1] == parent[width - 1:]
            vi = np.flatnonzero(valid)
            if len(vi):
                np.maximum.at(wmax, parent[vi], wh[vi])
                best = wh[vi] == wmax[parent[vi]]
                bi = vi[best]
                pos_in_doc = bi - starts[parent[bi]]
                first = np.full(nrows, np.iinfo(np.int64).max)
                np.minimum.at(first, parent[bi], pos_in_doc)
                long_mask = nd >= width
                sent = np.iinfo(np.int64).max
                wpos = np.where(long_mask & (first < sent),
                                first, wpos).astype(np.int64)
        keep = tot > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            id_col: pa.array(ids),
            "n_hits": pa.array(tot[keep]),
            "win_pos": pa.array(wpos[keep]),
            "win_hits": pa.array(np.maximum(wmax[keep], 0)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def best_window_sql(*, query_terms, width: int = 20,
                    table: str = "documents", text: str = "text",
                    id_col: str = "doc_id") -> str:
    """SQL replay: per-token hit indicator, forward-frame window sums,
    row_number argmax (wh desc, pos asc), short docs from totals."""
    from htrc_feature_reader_ray.functions.tokenize import sql_in_list

    terms = sorted({t for t in query_terms if t})
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    inlist = sql_in_list(terms)
    return f"""
        WITH base AS (
          SELECT {id_col}, {toks} AS arr FROM {table}
        ),
        tokh AS (
          SELECT {id_col}, i.i - 1 AS pos,
                 CASE WHEN arr[i.i] IN {inlist} THEN 1 ELSE 0 END AS h,
                 len(arr)::BIGINT AS nd
          FROM base, unnest(generate_series(1, len(arr))) AS i(i)
        ),
        tot AS (
          SELECT {id_col}, sum(h)::BIGINT AS n_hits, max(nd) AS nd
          FROM tokh GROUP BY 1
        ),
        win AS (
          SELECT {id_col}, pos,
                 sum(h) OVER (PARTITION BY {id_col} ORDER BY pos
                              ROWS BETWEEN CURRENT ROW
                              AND {width - 1} FOLLOWING)::BIGINT AS wh,
                 nd
          FROM tokh
        ),
        best AS (
          SELECT {id_col}, pos, wh, row_number() OVER (
              PARTITION BY {id_col} ORDER BY wh DESC, pos ASC) AS rn
          FROM win WHERE pos <= nd - {width}
        )
        SELECT t.{id_col}, t.n_hits,
               CASE WHEN t.nd < {width} THEN 0 ELSE b.pos END AS win_pos,
               CASE WHEN t.nd < {width} THEN t.n_hits
                    ELSE b.wh END AS win_hits
        FROM tot t LEFT JOIN best b
          ON b.{id_col} = t.{id_col} AND b.rn = 1
        WHERE t.n_hits > 0"""


def retrieval_bpref(ds, queries: dict, *, k: int = 20,
                    text_col: str = "text", id_col: str = "doc_id"):
    """bpref@k of the rational-BM25 ranker — the INCOMPLETE-JUDGMENT
    member of the retrieval acceptance suite (Buckley & Voorhees,
    SIGIR 2004): MRR scores the first hit, P/R@k the cutoff set, NDCG
    the graded ordering — bpref scores how often relevant docs rank
    above JUDGED-NONRELEVANT ones and ignores unjudged mass, which is
    why TREC adopted it when pools stopped being exhaustive; here the
    phrase-relevance oracle judges every doc, so bpref's judged-
    nonrelevant set is "every retrieved nonrelevant":

        bpref = (1/R) Σ_{r ∈ rel∩topk} (1 − min(N_above(r), R)/R)

    with R = total relevant in the corpus and N_above(r) = retrieved
    nonrelevant docs ranked above r. Exact integer form, ONE floor:
    ``bpref_ppm = Σ (R − min(N_above, R)) · 10⁶ // R²``; R = 0 reports
    0 by contract. Same (score desc, id asc) rank contract as the rest
    of the suite.

    Posture: the whole query set evaluates in the Q-independent
    :func:`_retrieval_sweep` (one stats fold + one scoring pass + one
    query-bucketed top-k fold); the driver walk is Q×k rows. Output
    ``(query_id, n_relevant, n_rel_ret, bpref_ppm)``."""
    import ray.data

    topk, counts = _retrieval_sweep(ds, queries, k=k, text_col=text_col,
                                    id_col=id_col)
    rows = []
    for qid in sorted(queries):
        r_tot = counts[qid][0]
        nonrel_above = 0
        acc = 0
        n_rel_ret = 0
        for _, _, r2, _ in topk[qid]:
            if r2:
                acc += r_tot - min(nonrel_above, r_tot)
                n_rel_ret += 1
            else:
                nonrel_above += 1
        bp = acc * 1_000_000 // (r_tot * r_tot) if r_tot else 0
        rows.append((qid, r_tot, n_rel_ret, bp))
    out = pd.DataFrame(rows, columns=["query_id", "n_relevant",
                                      "n_rel_ret", "bpref_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def retrieval_bpref_sql(queries: dict, *, k: int = 20,
                        table: str = "documents", text: str = "text",
                        id_col: str = "doc_id") -> str:
    """SQL mirror: per query, bm25 top-k replay with a relevance flag,
    nonrel-above via rk − running-relevant-count, the identical
    min-clamped single-floor sum."""
    parts = []
    for qid in sorted(queries):
        phrase = queries[qid]
        bm25 = bm25_topk_sql(query_terms=phrase.split(), table=table,
                             text=text, id_col=id_col, k=k)
        rel = phrase_search_sql(phrase, table=table, text_col=text,
                                id_col=id_col)
        flagged = f"""
          SELECT t.score_ppm, t.{id_col},
                 t.{id_col} IN (SELECT {id_col} FROM ({rel})) AS is_rel
          FROM ({bm25}) t"""
        ranked = f"""
          SELECT row_number() OVER (
              ORDER BY score_ppm DESC, {id_col}) AS rk,
                 count(*) FILTER (WHERE is_rel) OVER (
                     ORDER BY score_ppm DESC, {id_col}
                     ROWS UNBOUNDED PRECEDING) AS rel_seq,
                 is_rel
          FROM ({flagged})"""
        parts.append(f"""
        SELECT '{qid}' AS query_id, q.nr::BIGINT AS n_relevant,
               q.nrr::BIGINT AS n_rel_ret,
               CASE WHEN q.nr > 0
                    THEN (q.acc * 1000000 // (q.nr * q.nr))::BIGINT
                    ELSE 0 END AS bpref_ppm
        FROM (
          SELECT
            (SELECT count(*) FROM ({rel})) AS nr,
            (SELECT count(*) FROM ({flagged}) WHERE is_rel) AS nrr,
            (SELECT coalesce(sum(
                 (SELECT count(*) FROM ({rel}))
                 - least(rk - rel_seq,
                         (SELECT count(*) FROM ({rel})))), 0)
             FROM ({ranked}) WHERE is_rel) AS acc
        ) q""")
    return " UNION ALL ".join(parts)


def retrieval_ap(ds, queries: dict, *, k: int = 20,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Average precision @ k — the MAP building block, the last classic
    of the retrieval acceptance suite (MRR = first hit only, P/R@k =
    the unordered cutoff, NDCG = graded positions, bpref = judged-only
    robustness; AP is the area-under-PR that rewards EVERY relevant
    doc being early, the TREC ad-hoc default for two decades):

        AP = (1/R) Σ_{i : rel_i} P@i,    P@i = rel_count(≤i) / i

    Exact integer form with TWO documented floors (each P@i floors to
    ppm, then the mean floors over R — both sides replay identically):
    ``acc = Σ_{rel i} (relcnt_i·10⁶ // i)``, ``ap_ppm = acc // R``;
    R = 0 reports 0 by contract. Recall-truncated at k like the rest
    of the suite (unretrieved relevant mass lowers AP through the 1/R
    normalizer). Output ``(query_id, n_relevant, n_rel_ret, ap_ppm)``.

    Posture: rides the Q-independent :func:`_retrieval_sweep`; driver
    walk is Q×k rows."""
    import ray.data

    topk, counts = _retrieval_sweep(ds, queries, k=k, text_col=text_col,
                                    id_col=id_col)
    rows = []
    for qid in sorted(queries):
        r_tot = counts[qid][0]
        relcnt = 0
        acc = 0
        for i, (_, _, r2, _) in enumerate(topk[qid], 1):
            if r2:
                relcnt += 1
                acc += relcnt * 1_000_000 // i
        ap = acc // r_tot if r_tot else 0
        rows.append((qid, r_tot, relcnt, ap))
    out = pd.DataFrame(rows, columns=["query_id", "n_relevant",
                                      "n_rel_ret", "ap_ppm"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def retrieval_ap_sql(queries: dict, *, k: int = 20,
                     table: str = "documents", text: str = "text",
                     id_col: str = "doc_id") -> str:
    """SQL mirror: flagged top-k replay, running relevant count over
    the rank window, the identical two-floor sum."""
    parts = []
    for qid in sorted(queries):
        phrase = queries[qid]
        bm25 = bm25_topk_sql(query_terms=phrase.split(), table=table,
                             text=text, id_col=id_col, k=k)
        rel = phrase_search_sql(phrase, table=table, text_col=text,
                                id_col=id_col)
        flagged = f"""
          SELECT t.score_ppm, t.{id_col},
                 t.{id_col} IN (SELECT {id_col} FROM ({rel})) AS is_rel
          FROM ({bm25}) t"""
        ranked = f"""
          SELECT row_number() OVER (
              ORDER BY score_ppm DESC, {id_col}) AS rk,
                 count(*) FILTER (WHERE is_rel) OVER (
                     ORDER BY score_ppm DESC, {id_col}
                     ROWS UNBOUNDED PRECEDING) AS relcnt,
                 is_rel
          FROM ({flagged})"""
        parts.append(f"""
        SELECT '{qid}' AS query_id, q.nr::BIGINT AS n_relevant,
               q.nrr::BIGINT AS n_rel_ret,
               CASE WHEN q.nr > 0 THEN (q.acc // q.nr)::BIGINT
                    ELSE 0 END AS ap_ppm
        FROM (
          SELECT
            (SELECT count(*) FROM ({rel})) AS nr,
            (SELECT count(*) FROM ({flagged}) WHERE is_rel) AS nrr,
            (SELECT coalesce(sum(relcnt * 1000000 // rk), 0)
             FROM ({ranked}) WHERE is_rel) AS acc
        ) q""")
    return " UNION ALL ".join(parts)
