"""Vocabulary building and token-id encoding — the tokenizer-prep stage of
a training-data pipeline: rank every corpus token into a contiguous id space
(frequency-ordered, like the classic word-embedding / subword-vocab
convention) and re-encode documents as integer id sequences.

Scale shape:

* token counts: per-batch ``value_counts`` partials (combiner) →
  ``bucketed_aggregate`` sum — vocabulary-cardinality exchange, raw text
  never crosses it twice;
* the global frequency rank is the two-pass distributed-rank shape
  (pack.py:10-16) generalized to a composite order ``(count DESC,
  md5_hash64(token) ASC, token ASC)``: the md5 tiebreak makes rank space
  uniformly splittable by hash range *within* each count tier, so the
  driver only ever sees the (count, hash-bucket) histogram — never tokens;
* encoding: the finished vocab is the canonical broadcast small side
  (``ray.put`` once, one hash-indexed ``pd.Index.get_indexer`` per batch).

The hash tiebreak is also what makes the op SQL-replayable:
``row_number() OVER (ORDER BY count DESC, md5_number_upper(token), token)``
is the exact same total order (md5_number_upper == little-endian first 8
md5 bytes == ``dedup.md5_hash64``).

Reference parity: the reference's ``Volume.tokens`` / ``term_volume_freqs``
(feature_reader.py:25-112) stop at counts; the id-assignment step is the
training-pipeline extension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from htrc_feature_reader_ray.stages.textstats import _tok_stats

_HB_COL = "_vocab_hb"


def corpus_token_counts(ds, *, text_col: str = "text",
                        num_buckets: int = 64):
    """(token, count) — total corpus occurrences. Per-batch value_counts
    partials, one vocabulary-bucketed sum."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tok_stats(batch, text_col)
        t = pa.table({"token": flat})
        g = t.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "count"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_aggregate(
        partials, "token", {"count": ("count", "sum")},
        num_buckets=num_buckets,
    )


def _hash_bucket(h: np.ndarray, nb: int) -> np.ndarray:
    """Monotone multiply-shift bucket over uint64 hash space (order by
    (bucket, h) == order by h)."""
    return (
        ((h >> np.uint64(32)) * np.uint64(nb)) >> np.uint64(32)
    ).astype(np.int64)


def build_vocab(ds, *, text_col: str = "text", min_count: int = 1,
                num_buckets: int = 64, hash_buckets: int = 64):
    """(token, count, token_id) with ``token_id`` = 0-based rank under
    ``(count DESC, md5_hash64(token) ASC, token ASC)`` — a total order, so
    ids are contiguous, deterministic, and identical on any cluster shape.

    Distributed rank: (1) hash-augment the counts table; (2) fold the
    (count, hash_bucket) histogram — ``distinct_counts × hash_buckets``
    tiny rows — and exclusive-scan it on the driver in rank order;
    (3) co-locate each hash bucket, sort locally, and add base + local
    rank. No token string ever reaches the driver."""
    import ray

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    counts = corpus_token_counts(
        ds, text_col=text_col, num_buckets=num_buckets
    )
    if min_count > 1:

        def keep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(
                pc.greater_equal(t.column("count"), min_count)
            )

        counts = counts.map_batches(keep, batch_format="pyarrow")

    def augment(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = md5_hash64(df["token"].to_numpy())
        df["_h"] = h
        df[_HB_COL] = _hash_bucket(h, hash_buckets)
        return df

    augmented = counts.map_batches(augment, batch_format="pandas")
    # counts is the vocab table (2 narrow columns); persist so the
    # histogram pass and the rank pass don't re-run the corpus fold twice
    augmented = augmented.materialize()

    hist = (
        augmented.map_batches(
            lambda df: df.groupby(
                ["count", _HB_COL], sort=False, observed=True
            ).size().rename("n").reset_index(),
            batch_format="pandas",
        )
        .groupby(["count", _HB_COL]).sum("n").to_pandas()
    )
    n_col = "sum(n)" if "sum(n)" in hist.columns else "n"
    hist = hist.sort_values(
        ["count", _HB_COL], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    n = hist[n_col].to_numpy(dtype=np.int64)
    hist["_base"] = np.concatenate([[0], np.cumsum(n)[:-1]])
    base = hist[["count", _HB_COL, "_base"]]
    ref = ray.put(base)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["count", _HB_COL, "_h", "token"],
            ascending=[False, True, True, True], kind="mergesort",
        ).reset_index(drop=True)
        local = df.groupby(
            ["count", _HB_COL], sort=False, observed=True
        ).cumcount().to_numpy()
        b = df.merge(ray.get(ref), on=["count", _HB_COL], how="left")
        df["token_id"] = b["_base"].to_numpy(dtype=np.int64) + local
        return df[["token", "count", "token_id"]]

    return bucketed_map_groups(
        augmented, _HB_COL, per_bucket, num_buckets=hash_buckets
    )


def encode_tokens(ds, vocab, *, text_col: str = "text",
                  id_col: str = "doc_id", keep_token: bool = True,
                  method: str = "auto",
                  broadcast_limit: int = 5_000_000,
                  num_buckets: int = 64):
    """Explode documents to ``(id, pos, [token,] token_id)`` — the integer
    id sequence a trainer consumes. ``vocab`` is the (token, count,
    token_id) table from :func:`build_vocab` (Dataset or DataFrame).
    Out-of-vocabulary tokens encode as -1 (the unk convention).

    Physical plan (``method``): ``'broadcast'`` ships the vocab once via
    ``ray.put`` and encodes in one stateless pass (the worker-fit
    vocabulary contract — right for any tokenizer-shaped vocab);
    ``'join'`` never pulls the vocab anywhere — the exploded (id, pos,
    token) stream co-buckets with the vocab table on token hash, one
    exchange, per-bucket merge with -1 fill (the scale path when the
    vocab is an unpruned raw-web distinct-token table). ``'auto'``
    (the ``line_dedup`` convention) picks by vocab row count against
    ``broadcast_limit``."""
    import ray

    vocab_is_ds = hasattr(vocab, "to_pandas") and hasattr(vocab, "count")
    if method == "auto":
        n_vocab = vocab.count() if vocab_is_ds else len(vocab)
        method = "broadcast" if n_vocab <= broadcast_limit else "join"

    def explode(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        parent = np.asarray(parent, dtype=np.int64)
        # position within each doc: run-relative arange over parent runs
        npos = len(parent)
        if npos:
            first = np.ones(npos, dtype=bool)
            first[1:] = parent[1:] != parent[:-1]
            starts = np.flatnonzero(first)
            pos = np.arange(npos, dtype=np.int64) - np.repeat(
                starts, np.diff(np.append(starts, npos))
            )
        else:
            pos = np.zeros(0, dtype=np.int64)
        return flat, parent, pos

    if method == "broadcast":
        vdf = vocab.to_pandas() if vocab_is_ds else vocab
        index = pd.Index(vdf["token"].to_numpy())
        ids = vdf["token_id"].to_numpy(dtype=np.int64)
        ref = ray.put((index, ids))

        def encode(batch: pa.Table) -> pa.Table:
            idx, vid = ray.get(ref)
            flat, parent, pos = explode(batch)
            loc = idx.get_indexer(flat.to_numpy(zero_copy_only=False))
            tid = np.where(loc >= 0, vid[np.maximum(loc, 0)], -1)
            cols = {
                id_col: batch.column(id_col).take(pa.array(parent)),
                "pos": pa.array(pos, type=pa.int64()),
            }
            if keep_token:
                cols["token"] = flat
            cols["token_id"] = pa.array(tid, type=pa.int64())
            return pa.table(cols)

        return ds.map_batches(encode, batch_format="pyarrow")

    if method != "join":
        raise ValueError(f"unknown method {method!r}")

    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucket_join

    vocab_ds = (vocab if vocab_is_ds
                else ray.data.from_pandas(pd.DataFrame(vocab)))
    vocab_slim = vocab_ds.map_batches(
        lambda t: t.select(["token", "token_id"]).rename_columns(
            ["token", "__tid"]),
        batch_format="pyarrow")

    def to_rows(batch: pa.Table) -> pa.Table:
        flat, parent, pos = explode(batch)
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(parent)),
            "pos": pa.array(pos, type=pa.int64()),
            "token": flat,
        })

    joined = bucket_join(
        ds.map_batches(to_rows, batch_format="pyarrow"),
        vocab_slim, left_key="token", right_key="token",
        num_buckets=num_buckets, how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["token_id"] = df["__tid"].fillna(-1).astype("int64")
        cols = [id_col, "pos"] + (["token"] if keep_token else [])
        return df[cols + ["token_id"]]

    return joined.map_batches(finish, batch_format="pandas")


def _vocab_cte(*, table: str, text_col: str, min_count: int) -> str:
    return f"""
        toks_v AS (
          SELECT unnest(list_filter(string_split({text_col}, ' '),
                                    x -> x <> '')) AS token
          FROM {table}
        ), counts_v AS (
          SELECT token, count(*)::BIGINT AS count FROM toks_v
          GROUP BY 1 HAVING count(*) >= {min_count}
        ), vocab AS (
          SELECT token, count,
                 (row_number() OVER (
                      ORDER BY count DESC, md5_number_upper(token), token
                  ) - 1)::BIGINT AS token_id
          FROM counts_v
        )"""


def build_vocab_sql(*, table: str = "documents", text_col: str = "text",
                    min_count: int = 1) -> str:
    return f"""
        WITH {_vocab_cte(table=table, text_col=text_col,
                         min_count=min_count)}
        SELECT token, count, token_id FROM vocab"""


def encode_tokens_sql(*, table: str = "documents",
                      text_col: str = "text", id_col: str = "doc_id",
                      min_count: int = 1) -> str:
    return f"""
        WITH {_vocab_cte(table=table, text_col=text_col,
                         min_count=min_count)},
        base AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS arr
          FROM {table}
        ), exploded AS (
          SELECT {id_col}, (i - 1)::BIGINT AS pos, arr[i] AS token
          FROM base, LATERAL unnest(range(1, len(arr) + 1)) AS t(i)
        )
        SELECT e.{id_col}, e.pos, e.token,
               coalesce(v.token_id, -1)::BIGINT AS token_id
        FROM exploded e LEFT JOIN vocab v USING (token)"""


# ---------------------------------------------------------------------------
# hashing-trick document vectorizer


def feature_hashing(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    dims: int = 64):
    """Hashing-trick document vectors (Weinberger et al., ICML'09 feature
    hashing): every token lands in ``dim = md5_hash64(token) % dims`` with
    a deterministic ±1 sign from the hash's top bit (the unbiasing sign
    hash of the paper), summed per (doc, dim).  The fixed-width,
    vocabulary-free alternative to ``build_vocab``+``encode_tokens`` —
    no global vocabulary pass, so NO exchange at all: per-doc rows
    complete inside their batch (docs never split across batches).

    Output is LONG format (doc_id, dim, value) — one row per touched dim,
    zero-sum collisions kept (the group exists in SQL's GROUP BY too).
    Long format keeps the op schema-stable for any ``dims`` and lets the
    consumer pivot only if its dims are small.

    SQL-replayable: md5_number_upper(token) == engine md5_hash64, dim is
    ``% dims``, sign is ``1 - 2·(h // 2⁶³)``.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        if len(flat) == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.int64()),
            })
        toks = flat.to_numpy(zero_copy_only=False)
        # hash the batch VOCABULARY once, not per occurrence
        uniq, inv = np.unique(toks, return_inverse=True)
        h = md5_hash64(uniq)
        dim = (h % np.uint64(dims)).astype(np.int64)[inv]
        sign = (1 - 2 * (h >> np.uint64(63)).astype(np.int64))[inv]
        ids = batch.column(id_col).to_numpy()[parent]
        t = pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "dim": pa.array(dim, type=pa.int64()),
            "value": pa.array(sign, type=pa.int64()),
        })
        g = t.group_by([id_col, "dim"]).aggregate([("value", "sum")])
        return pa.table({
            id_col: g.column(id_col),
            "dim": g.column("dim"),
            "value": g.column("value_sum").cast(pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def feature_hashing_sql(*, table: str = "documents", text_col: str = "text",
                        id_col: str = "doc_id", dims: int = 64) -> str:
    return f"""
        WITH tok AS (
          SELECT {id_col}, u.t AS token
          FROM {table},
               unnest(string_split({text_col}, ' ')) AS u(t)
          WHERE u.t <> ''
        ), h AS (
          SELECT {id_col}, md5_number_upper(token) AS h FROM tok
        )
        SELECT {id_col},
               (h % {dims})::BIGINT AS dim,
               sum(1 - 2 * (h >> 63)::BIGINT)::BIGINT AS value
        FROM h GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# per-document unigram-frequency quality signals (LM-score-filter analog)


def unigram_stats(ds, vocab_counts, *, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Per-document unigram corpus-frequency stats against a reference
    (token, count) vocabulary — the exact-integer analog of the classic
    "LM perplexity filter" quality signal (docs whose tokens are rare in
    the reference corpus score low; high OOV rate flags noise/boilerplate):

      * ``n_tokens``   — whitespace token count
      * ``n_oov``      — tokens absent from the vocabulary
      * ``oov_ratio``  — n_oov / max(n_tokens, 1)        (one IEEE division)
      * ``sum_count``  — Σ corpus-count of in-vocab tokens (int64, exact)
      * ``mean_count`` — sum_count / max(n_tokens − n_oov, 1)

    All numerators are integers, divisions single IEEE ops — bit-exact
    against the SQL mirror. ``vocab_counts`` (Dataset or DataFrame, e.g.
    :func:`corpus_token_counts` output filtered by min_count) is the
    bounded broadcast side — ``ray.put`` once, one hash-indexed lookup per
    batch; the corpus itself streams through one stateless ``map_batches``.
    Zero-token docs emit (0, 0, 0.0, 0, 0.0)."""
    import ray

    vdf = (vocab_counts.to_pandas()
           if hasattr(vocab_counts, "to_pandas") else vocab_counts)
    ref = ray.put((pd.Index(vdf["token"].to_numpy()),
                   vdf["count"].to_numpy(dtype=np.int64)))

    def stats(batch: pa.Table) -> pa.Table:
        idx, cnts = ray.get(ref)
        flat, parent, n = _tok_stats(batch, text_col)
        parent = np.asarray(parent, dtype=np.int64)
        pos = idx.get_indexer(flat.to_numpy(zero_copy_only=False))
        oov = pos < 0
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)
        n_oov = np.bincount(parent, weights=oov, minlength=n).astype(np.int64)
        sum_count = np.bincount(
            parent, weights=np.where(oov, 0, cnts[np.maximum(pos, 0)]),
            minlength=n,
        ).astype(np.int64)
        n_in = n_tokens - n_oov
        out = batch.select([id_col])
        out = out.append_column("n_tokens", pa.array(n_tokens))
        out = out.append_column("n_oov", pa.array(n_oov))
        out = out.append_column("oov_ratio", pa.array(
            n_oov.astype(np.float64) / np.maximum(n_tokens, 1)))
        out = out.append_column("sum_count", pa.array(sum_count))
        out = out.append_column("mean_count", pa.array(
            sum_count.astype(np.float64) / np.maximum(n_in, 1)))
        return out

    return ds.map_batches(stats, batch_format="pyarrow")


def unigram_stats_sql(*, table: str = "documents", text_col: str = "text",
                      id_col: str = "doc_id", min_count: int = 1) -> str:
    """SQL mirror: re-derives the corpus counts, left-joins per token,
    aggregates with the identical integer numerators and divisions."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    return f"""
        WITH toks AS (
          SELECT {id_col}, t.t AS token
          FROM {table}, LATERAL unnest({toks}) AS t(t)
        ), voc AS (
          SELECT token, count(*)::BIGINT AS cnt
          FROM toks GROUP BY token HAVING count(*) >= {min_count}
        ), j AS (
          SELECT toks.{id_col}, voc.cnt
          FROM toks LEFT JOIN voc USING (token)
        ), agg AS (
          SELECT {id_col},
                 count(*)::BIGINT AS n_tokens,
                 (count(*) FILTER (WHERE cnt IS NULL))::BIGINT AS n_oov,
                 coalesce(sum(cnt), 0)::BIGINT AS sum_count
          FROM j GROUP BY {id_col}
        )
        SELECT d.{id_col},
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_oov, 0) AS n_oov,
               coalesce(a.n_oov, 0)::DOUBLE
                   / greatest(coalesce(a.n_tokens, 0), 1) AS oov_ratio,
               coalesce(a.sum_count, 0) AS sum_count,
               coalesce(a.sum_count, 0)::DOUBLE
                   / greatest(coalesce(a.n_tokens, 0)
                              - coalesce(a.n_oov, 0), 1) AS mean_count
        FROM {table} d LEFT JOIN agg a USING ({id_col})"""


def char_coverage(ds, *, text_col: str = "text", k: int = 40):
    """Corpus character histogram — the sentencepiece ``character_coverage``
    input: top-``k`` codepoints by frequency with exact counts, integer
    coverage ``ppm`` (count·10⁶ // corpus_chars) and a dense rank
    (ties broken by codepoint, == UTF-8 binary collation, so the order is
    SQL-replayable).

    Scale shape: one ``np.unique`` over each batch's UTF-32 view (a partial
    histogram of ≤ alphabet-size rows per batch — the combiner), a native
    groupby-sum over the tiny alphabet-cardinality key space, and a
    driver-side finish on the full (tiny) histogram. Text crosses no
    exchange; only (char, count) partials do. Returns pandas (the result is
    an alphabet-sized lookup, the canonical broadcast small side)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        joined = "".join(x or "" for x in col.to_pylist())
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        uniq, counts = np.unique(cps, return_counts=True)
        return pa.table({
            "ch": pa.array([chr(c) for c in uniq], type=pa.string()),
            "n": pa.array(counts, type=pa.int64()),
        })

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ch").sum("n").to_pandas()
    )
    hist = hist.rename(columns={"sum(n)": "n"})
    total = int(hist["n"].sum())
    hist = hist.sort_values(["n", "ch"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    hist["ppm"] = (hist["n"] * 1_000_000) // max(total, 1)
    hist["cov_rank"] = np.arange(1, len(hist) + 1, dtype=np.int64)
    return hist.head(k).reset_index(drop=True)


def char_coverage_sql(*, text: str = "text", table: str = "documents",
                      k: int = 40) -> str:
    """SQL mirror ('(?s).' matches newlines too; // is exact BIGINT
    division; binary collation == codepoint order)."""
    return f"""
        WITH chars AS (
          SELECT unnest(regexp_extract_all({text}, '(?s).')) AS ch
          FROM {table}
        ), hist AS (
          SELECT ch, count(*)::BIGINT AS n FROM chars GROUP BY ch
        ), tot AS (SELECT sum(n)::BIGINT AS t FROM hist)
        SELECT ch, n, (n * 1000000 // t)::BIGINT AS ppm,
               row_number() OVER (ORDER BY n DESC, ch)::BIGINT AS cov_rank
        FROM hist, tot
        ORDER BY cov_rank
        LIMIT {k}"""


# ---------------------------------------------------------------------------
# BPE merge training (bounded rounds, oracle-replayable)


def bpe_train(ds, *, text_col: str = "text", rounds: int = 3,
              return_segmented: bool = False, num_buckets: int = 32,
              driver_limit: int = 5_000_000):
    """Byte-pair-encoding merge training (the sentencepiece/GPT-2 tokenizer
    prep) as a bounded-round Ray pipeline: per round, the corpus-wide most
    frequent ADJACENT symbol pair (weighted by word frequency, ties broken
    (count desc, left asc, right asc)) becomes a merge, and every word's
    symbol sequence applies it greedily left-to-right.

    The classic trick that makes this corpus-scale cheap: after the ONE
    token-count fold, everything runs on the WORD-TYPE vocabulary (weights
    carry the corpus multiplicity) — rounds never rescan the corpus.

    Exactness contract (what makes a trained tokenizer SQL-replayable):
    a sequence is a concatenation of ``\x1e<sym>\x1f`` units (the record/
    unit separator pair — chars that cannot appear in whitespace-split
    symbols), so ONE ``replace('\x1el\x1f\x1er\x1f', '\x1elr\x1f')``
    pass IS exactly greedy leftmost non-overlapping merge application:
    adjacent matches share no boundary characters (a space-joined
    encoding would let ``replace`` consume the next match's separator and
    mis-pair odd runs), and Python ``str.replace`` and SQL ``replace``
    share resume-after-replacement semantics.

    Per round: one (l, r)-bucketed pair-count fold (per-batch combiner),
    block-local top-1s → driver argmax over ≤ blocks rows (disjoint pairs
    per block post-fold ⇒ lossless), one vectorized replace map; the
    vocab-sized sequence table is the materialized iteration state.
    Returns a pandas DataFrame (round, left, right, merged, count).
    """
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    words = corpus_token_counts(ds, text_col=text_col,
                                num_buckets=num_buckets)

    SEP_L, SEP_R = "\x1e", "\x1f"

    def to_seq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "token": df["token"].astype(str),
            "c": df["count"].astype("int64"),
            "s": [SEP_L + (SEP_R + SEP_L).join(list(w)) + SEP_R
                  for w in df["token"].astype(str)],
        })

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["s"].str.slice(1, -1).str.split(SEP_R + SEP_L)
        lens = toks.str.len().to_numpy()
        c = df["c"].to_numpy()
        npairs = np.maximum(lens - 1, 0)
        if npairs.sum() == 0:
            return pd.DataFrame({
                "l": pd.Series(dtype=object),
                "r": pd.Series(dtype=object),
                "cnt": pd.Series(dtype="int64")})
        flat = np.concatenate(toks.to_list())
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(flat)) - np.repeat(starts, lens)
        first = pos < np.repeat(lens - 1, lens)
        l_arr = flat[first]
        # right neighbor = next flat element of the same word
        r_arr = flat[1:][first[:-1]] if len(flat) > 1 else flat[:0]
        w = np.repeat(c, lens)[first]
        g = pd.DataFrame({"l": l_arr, "r": r_arr, "cnt": w})
        return g.groupby(["l", "r"], sort=False,
                         as_index=False)["cnt"].sum()

    # ---- driver-resident rounds fast path ------------------------------
    # The word-TYPE table is the module's canonical worker-fit small side
    # (encode_tokens already broadcasts it whole); while it also fits the
    # driver, the bounded merge rounds run as plain pandas passes on the
    # collected frame — zero per-round exchanges, identical arithmetic
    # (same pair kernel, same (cnt desc, l, r) argmax, same one-pass
    # replace).  The distributed loop below stays the unbounded-vocabulary
    # plan.
    words = words.materialize()
    if words.count() <= driver_limit:
        seq_pd = to_seq(words.to_pandas())
        merges = []
        for rnd in range(1, rounds + 1):
            pc_df = pair_partial(seq_pd)
            if pc_df.empty:
                break
            pc_df = pc_df.groupby(["l", "r"], as_index=False)["cnt"].sum()
            best = pc_df.sort_values(
                ["cnt", "l", "r"], ascending=[False, True, True]).iloc[0]
            l, r, cnt = str(best["l"]), str(best["r"]), int(best["cnt"])
            merges.append((rnd, l, r, l + r, cnt))
            pat = f"{SEP_L}{l}{SEP_R}{SEP_L}{r}{SEP_R}"
            rep = f"{SEP_L}{l}{r}{SEP_R}"
            seq_pd = pd.DataFrame({
                "token": seq_pd["token"], "c": seq_pd["c"],
                "s": seq_pd["s"].str.replace(pat, rep, regex=False),
            })
        out = pd.DataFrame(
            merges, columns=["round", "left", "right", "merged", "count"]
        ).astype({"round": "int64", "count": "int64"})
        if return_segmented:
            import ray.data

            return out, ray.data.from_pandas(seq_pd)
        return out

    seqs = words.map_batches(to_seq, batch_format="pandas").materialize()
    merges = []

    for rnd in range(1, rounds + 1):
        folded = bucketed_aggregate(
            seqs.map_batches(pair_partial, batch_format="pandas"),
            ["l", "r"], {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)

        def local_top1(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            return df.sort_values(
                ["cnt", "l", "r"], ascending=[False, True, True]
            ).head(1)

        tops = folded.map_batches(
            local_top1, batch_format="pandas").to_pandas()
        if tops.empty:
            break
        best = tops.sort_values(
            ["cnt", "l", "r"], ascending=[False, True, True]).iloc[0]
        l, r, cnt = str(best["l"]), str(best["r"]), int(best["cnt"])
        merges.append((rnd, l, r, l + r, cnt))

        pat = f"{SEP_L}{l}{SEP_R}{SEP_L}{r}{SEP_R}"
        rep = f"{SEP_L}{l}{r}{SEP_R}"

        def apply(df: pd.DataFrame) -> pd.DataFrame:
            # ONE pass == greedy leftmost (boundary-disjoint matches)
            return pd.DataFrame({
                "token": df["token"],
                "c": df["c"],
                "s": df["s"].str.replace(pat, rep, regex=False),
            })

        seqs = seqs.map_batches(apply, batch_format="pandas").materialize()

    out = pd.DataFrame(
        merges, columns=["round", "left", "right", "merged", "count"]
    ).astype({"round": "int64", "count": "int64"})
    if return_segmented:
        return out, seqs
    return out


def bpe_train_sql(*, table: str = "documents", text: str = "text",
                  rounds: int = 3) -> str:
    """SQL mirror: unrolled per-round CTEs — adjacent-pair unnest count,
    (cnt desc, l, r) argmax, ONE boundary-disjoint replace application
    (chr(30)/chr(31) unit separators == the engine's \x1e/\x1f)."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    sql = f"""
        WITH words AS (
          SELECT u.t AS w, count(*)::BIGINT AS c
          FROM {table}, unnest({toks}) AS u(t) GROUP BY 1
        ),
        seq0 AS (
          SELECT c, chr(30) || array_to_string(
                   list_transform(range(1, length(w) + 1), i -> w[i]),
                   chr(31) || chr(30)) || chr(31) AS s
          FROM words
        ),"""
    prev = "seq0"
    for i in range(1, rounds + 1):
        sql += f"""
        p{i} AS (
          SELECT a[i.i] AS l, a[i.i + 1] AS r, sum(c)::BIGINT AS cnt
          FROM (SELECT string_split(
                    substr(s, 2, length(s) - 2), chr(31) || chr(30)
                ) AS a, c FROM {prev}),
               unnest(generate_series(1, len(a) - 1)) AS i(i)
          GROUP BY 1, 2
        ),
        m{i} AS (SELECT l, r, cnt FROM p{i}
                 ORDER BY cnt DESC, l, r LIMIT 1),
        seq{i} AS (SELECT c, replace(s,
                 chr(30) || l || chr(31) || chr(30) || r || chr(31),
                 chr(30) || l || r || chr(31)) AS s
                 FROM {prev} CROSS JOIN m{i}),"""
        prev = f"seq{i}"
    unions = "\n          UNION ALL ".join(
        f'SELECT {i}::BIGINT AS round, l AS "left", r AS "right",'
        f' l || r AS merged, cnt AS count FROM m{i}'
        for i in range(1, rounds + 1))
    return sql.rstrip(",") + f"\n        {unions}"


def bpe_encode(ds, *, text_col: str = "text", id_col: str = "doc_id",
               rounds: int = 3, num_buckets: int = 32):
    """Apply :func:`bpe_train`'s merges to the corpus: explode every
    document into ``(id, pos, sym_pos, symbol)`` subword rows.

    The efficient shape: segmentation depends only on the word TYPE, so
    the trained segmented vocabulary (token → symbol list, vocab-sized —
    the canonical broadcast small side) maps per-occurrence via one
    ``ray.put`` lookup; documents are never re-segmented row by row."""
    import ray

    merges, seqs = bpe_train(ds, text_col=text_col, rounds=rounds,
                             return_segmented=True,
                             num_buckets=num_buckets)
    seg = seqs.to_pandas()
    syms = [s[1:-1].split("\x1f\x1e") for s in seg["s"]]
    return _encode_with_segmentation(
        ds, seg["token"].to_numpy(), syms,
        text_col=text_col, id_col=id_col, symbol_col="symbol")


def _encode_with_segmentation(ds, words, syms, *, text_col: str,
                              id_col: str, symbol_col: str):
    """Expand every token occurrence into its word TYPE's subword rows:
    the segmented vocabulary broadcasts once (flat symbol pool +
    per-type offsets), expansion is pure index arithmetic per batch."""
    import ray

    idx = pd.Index(words)
    nsyms = np.fromiter((len(s) for s in syms), dtype=np.int64,
                        count=len(syms))
    flat_syms = (np.concatenate(syms) if syms
                 else np.array([], dtype=object))
    type_starts = np.concatenate(([0], np.cumsum(nsyms)[:-1]))
    ref = ray.put((idx, flat_syms, type_starts, nsyms))

    def encode(batch: pa.Table) -> pa.Table:
        index, pool, starts_pool, counts = ray.get(ref)
        flat, parent, _ = _tok_stats(batch, text_col)
        parent = np.asarray(parent, dtype=np.int64)
        npos = len(parent)
        if npos:
            first = np.ones(npos, dtype=bool)
            first[1:] = parent[1:] != parent[:-1]
            starts = np.flatnonzero(first)
            pos = np.arange(npos, dtype=np.int64) - np.repeat(
                starts, np.diff(np.append(starts, npos)))
        else:
            pos = np.zeros(0, dtype=np.int64)
        loc = index.get_indexer(flat.to_numpy(zero_copy_only=False))
        k = counts[loc]  # every corpus token is in the trained vocab
        total = int(k.sum())
        starts2 = np.concatenate(([0], np.cumsum(k)[:-1]))
        sym_pos = np.arange(total) - np.repeat(starts2, k)
        sym_flat = pool[np.repeat(starts_pool[loc], k) + sym_pos]
        return pa.table({
            id_col: batch.column(id_col).take(
                pa.array(np.repeat(parent, k))),
            "pos": pa.array(np.repeat(pos, k), type=pa.int64()),
            "sym_pos": pa.array(sym_pos, type=pa.int64()),
            symbol_col: pa.array(sym_flat.astype(str)),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def unigram_encode(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   rounds: int = 2, max_piece_len: int = 4,
                   seed_size: int = 200, prune_min: int = 1,
                   max_word_len: int = 12, num_buckets: int = 32):
    """Apply :func:`unigram_train`'s final Viterbi segmentation to the
    corpus: ``(id, pos, sym_pos, piece)`` subword rows. Same broadcast
    shape as :func:`bpe_encode` — segmentation is a function of the word
    TYPE, so the segmented vocabulary ships once via ``ray.put`` and
    occurrences expand by index arithmetic, never re-segmented per row."""
    _, seg = unigram_train(
        ds, text_col=text_col, rounds=rounds, max_piece_len=max_piece_len,
        seed_size=seed_size, prune_min=prune_min, max_word_len=max_word_len,
        num_buckets=num_buckets, return_segmented=True)
    return _encode_with_segmentation(
        ds, seg["token"].to_numpy(), seg["syms"].tolist(),
        text_col=text_col, id_col=id_col, symbol_col="piece")


def bpe_encode_sql(*, table: str = "documents", text: str = "text",
                   id_col: str = "doc_id", rounds: int = 3) -> str:
    """SQL mirror: the train CTEs carrying the word column, then the doc
    explode joined to its word's final segmentation."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    sql = f"""
        WITH words AS (
          SELECT u.t AS w, count(*)::BIGINT AS c
          FROM {table}, unnest({toks}) AS u(t) GROUP BY 1
        ),
        seq0 AS (
          SELECT w, c, chr(30) || array_to_string(
                   list_transform(range(1, length(w) + 1), i -> w[i]),
                   chr(31) || chr(30)) || chr(31) AS s
          FROM words
        ),"""
    prev = "seq0"
    for i in range(1, rounds + 1):
        sql += f"""
        p{i} AS (
          SELECT a[i.i] AS l, a[i.i + 1] AS r, sum(c)::BIGINT AS cnt
          FROM (SELECT string_split(
                    substr(s, 2, length(s) - 2), chr(31) || chr(30)
                ) AS a, c FROM {prev}),
               unnest(generate_series(1, len(a) - 1)) AS i(i)
          GROUP BY 1, 2
        ),
        m{i} AS (SELECT l, r, cnt FROM p{i}
                 ORDER BY cnt DESC, l, r LIMIT 1),
        seq{i} AS (SELECT w, c, replace(s,
                 chr(30) || l || chr(31) || chr(30) || r || chr(31),
                 chr(30) || l || r || chr(31)) AS s
                 FROM {prev} CROSS JOIN m{i}),"""
        prev = f"seq{i}"
    sql += f"""
        seg AS (
          SELECT w, string_split(
              substr(s, 2, length(s) - 2), chr(31) || chr(30)) AS syms
          FROM {prev}
        ),
        base AS (
          SELECT {id_col},
                 {toks} AS arr
          FROM {table}
        ),
        exploded AS (
          SELECT {id_col}, (i - 1)::BIGINT AS pos, arr[i] AS token
          FROM base, LATERAL unnest(range(1, len(arr) + 1)) AS t(i)
        )
        SELECT e.{id_col}, e.pos, (j.j - 1)::BIGINT AS sym_pos,
               seg.syms[j.j] AS symbol
        FROM exploded e JOIN seg ON e.token = seg.w,
             LATERAL unnest(range(1, len(seg.syms) + 1)) AS j(j)"""
    return sql


# ---------------------------------------------------------------------------
# bigram conditional-probability LM (Laplace smoothing, exact integer ppm)


def bigram_lm(ds, *, text_col: str = "text", alpha: int = 1,
              num_buckets: int = 32):
    """Smoothed bigram language model table — (w1, w2, c_pair, c_ctx,
    p_ppm) with ``p_ppm = (c_pair + α)·10⁶ // (c_ctx + α·V)`` — the
    next-token conditional-probability table behind perplexity filters and
    synthetic-data detectors, in exact integers (float division would make
    the table parallelism-dependent at the margins).

    * ``c_ctx`` = Σ_w2 c(w1, w2) — derived from the folded pair table
      itself (all rows of a w1 share its bucket), NOT a second corpus
      scan;
    * ``V`` = corpus unigram vocabulary size — one scalar from the
      token-count fold, broadcast into the finish (so the op reads the
      corpus twice: once for pairs, once for V; both are single
      exchanges).
    """
    from htrc_feature_reader_ray.stages.partition import (
        bucketed_map_groups,
    )

    V = corpus_token_counts(ds, text_col=text_col,
                            num_buckets=num_buckets).count()

    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        m = len(parent)
        if m < 2:
            return pa.table({
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c_pair": pa.array([], type=pa.int64()),
            })
        same = parent[:-1] == parent[1:]
        t = pa.table({
            "w1": flat.slice(0, m - 1).filter(pa.array(same)),
            "w2": flat.slice(1, m - 1).filter(pa.array(same)),
        })
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "c_pair"])

    partials = ds.map_batches(pairs, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["w1", "w2"], sort=False,
                       as_index=False)["c_pair"].sum()
        ctx = g.groupby("w1", sort=False)["c_pair"].transform("sum")
        g["c_ctx"] = ctx.astype("int64")
        g["p_ppm"] = (
            (g["c_pair"].astype(object) + alpha) * 1_000_000
            // (g["c_ctx"].astype(object) + alpha * V)
        ).astype("int64")
        g["c_pair"] = g["c_pair"].astype("int64")
        return g

    return bucketed_map_groups(partials, "w1", finish,
                               num_buckets=num_buckets)


def bigram_lm_sql(*, table: str = "documents", text: str = "text",
                  alpha: int = 1) -> str:
    """SQL replay: adjacent-pair unnest counts, per-w1 context sums, the
    same integer Laplace division."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (SELECT {toks} AS arr FROM {table}),
        p AS (
          SELECT arr[i.i] AS w1, arr[i.i + 1] AS w2,
                 count(*)::BIGINT AS c_pair
          FROM base, unnest(generate_series(1, len(arr) - 1)) AS i(i)
          GROUP BY 1, 2
        ),
        v AS (
          SELECT count(DISTINCT t.tok)::BIGINT AS vocab
          FROM base, unnest(arr) AS t(tok)
        ),
        ctx AS (SELECT w1, sum(c_pair)::BIGINT AS c_ctx FROM p GROUP BY 1)
        SELECT p.w1, p.w2, p.c_pair, ctx.c_ctx,
               ((p.c_pair + {alpha}) * 1000000
                // (ctx.c_ctx + {alpha} * v.vocab))::BIGINT AS p_ppm
        FROM p JOIN ctx USING (w1), v"""


def kneser_ney_lm(ds, *, text_col: str = "text",
                  num_buckets: int = 32):
    """Interpolated Kneser–Ney bigram table (Kneser & Ney, ICASSP 1995;
    the Chen–Goodman 1998 benchmark winner) — the smoothing
    :func:`bigram_lm`'s Laplace α can't match: absolute discounting
    moves a FIXED D = 3/4 of a count from every seen bigram to a
    CONTINUATION back-off, so the back-off probability of w₂ is "how
    many distinct contexts does w₂ follow" rather than its raw
    frequency — the classic fix for "San Francisco" making bare
    "Francisco" look probable.

    Exact integers in QUARTERS (D = 3/4 clears against ×4):

        p(w₂|w₁) = (4c − 3)⁺/(4C) + 3·N1(w₁)/(4C) · Ncont(w₂)/T
        p_ppm = ((4c−3)⁺·T + 3·N1(w₁)·Ncont(w₂)) · 10⁶ // (4·C·T)

    with c = c(w₁w₂), C = c(w₁·), N1(w₁) = distinct types after w₁,
    Ncont(w₂) = distinct types before w₂, T = total distinct bigram
    types. One floor; Σ_w₂ p(w₂|w₁) = 1 exactly in fractions (pytest
    replays it). The numerator product passes int64 only to ~10⁹
    tokens — the finish runs in object ints, the HUGEINT mirror
    bounds at ~10¹⁸ (documented).

    Scale shape: the :func:`bigram_lm` pair fold (w₁-bucketed, C and
    N1 derived IN the bucket — no second corpus scan), then the two
    continuation quantities live on the DISTINCT-PAIR-TYPE table, not
    the corpus: one w₂-keyed fold over it for Ncont, a count() for T,
    and one w₂-bucketed join re-attaching Ncont — every exchange past
    the first carries type rows only. Output ``(w1, w2, c_pair,
    c_ctx, n1_w1, n_cont, p_ppm)``."""
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        m = len(parent)
        if m < 2:
            return pa.table({
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c_pair": pa.array([], type=pa.int64()),
            })
        same = parent[:-1] == parent[1:]
        t = pa.table({
            "w1": flat.slice(0, m - 1).filter(pa.array(same)),
            "w2": flat.slice(1, m - 1).filter(pa.array(same)),
        })
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "c_pair"])

    partials = ds.map_batches(pairs, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["w1", "w2"], sort=False,
                       as_index=False)["c_pair"].sum()
        g["c_ctx"] = (g.groupby("w1", sort=False)["c_pair"]
                      .transform("sum").astype("int64"))
        g["n1_w1"] = (g.groupby("w1", sort=False)["c_pair"]
                      .transform("size").astype("int64"))
        g["c_pair"] = g["c_pair"].astype("int64")
        return g

    ptable = bucketed_map_groups(partials, "w1", fold,
                                 num_buckets=num_buckets).materialize()
    t_types = ptable.count()

    ncont = bucketed_aggregate(
        ptable, ["w2"], {"n_cont": ("w1", "size")},
        num_buckets=num_buckets)

    joined = bucket_join(ptable, ncont, left_key="w2", right_key="w2",
                         num_buckets=num_buckets)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c_pair"].astype(object)
        num = ((4 * c - 3).where(4 * c - 3 > 0, 0) * t_types
               + 3 * df["n1_w1"].astype(object)
               * df["n_cont"].astype(object))
        den = 4 * df["c_ctx"].astype(object) * t_types
        out = df[["w1", "w2", "c_pair", "c_ctx", "n1_w1",
                  "n_cont"]].copy()
        out["p_ppm"] = (num * 1_000_000 // den).astype("int64")
        return out

    return joined.map_batches(score, batch_format="pandas")


def kneser_ney_lm_sql(*, table: str = "documents",
                      text: str = "text") -> str:
    """SQL replay: pair-type counts, per-w1 context/type sums, per-w2
    continuation counts, the identical single-floor quarter algebra."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH base AS (SELECT {toks} AS arr FROM {table}),
        p AS (
          SELECT arr[i.i] AS w1, arr[i.i + 1] AS w2,
                 count(*)::BIGINT AS c_pair
          FROM base, unnest(generate_series(1, len(arr) - 1)) AS i(i)
          GROUP BY 1, 2
        ),
        ctx AS (
          SELECT w1, sum(c_pair)::BIGINT AS c_ctx,
                 count(*)::BIGINT AS n1 FROM p GROUP BY 1
        ),
        cont AS (SELECT w2, count(*)::BIGINT AS n_cont FROM p GROUP BY 1),
        t AS (SELECT count(*)::HUGEINT AS tt FROM p)
        SELECT p.w1, p.w2, p.c_pair, ctx.c_ctx, ctx.n1 AS n1_w1,
               cont.n_cont,
               ((greatest(4 * p.c_pair - 3, 0)::HUGEINT * t.tt
                 + 3::HUGEINT * ctx.n1 * cont.n_cont) * 1000000
                // (4::HUGEINT * ctx.c_ctx * t.tt))::BIGINT AS p_ppm
        FROM p JOIN ctx USING (w1) JOIN cont USING (w2), t"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve (tokenizer vocab-size selection)


def vocab_coverage(ds, *, text_col: str = "text", num_buckets: int = 32):
    """(k, cum_count, coverage_ppm) at log2-spaced ranks k = 1, 2, 4, ...
    capped at V — the cumulative corpus coverage of the top-k token TYPES
    (count desc, token asc ties = UTF-8 binary collation), i.e. the
    token-level sibling of ``char_coverage`` and the curve behind "how big
    must the tokenizer vocabulary be to cover 99% of running tokens".

    One token fold; the ranked cumulative sum runs over the collected
    vocabulary table (the module's canonical worker-fit small side) and
    the output is <= log2(V)+1 rows."""
    tc = corpus_token_counts(ds, text_col=text_col,
                             num_buckets=num_buckets).to_pandas()
    if tc.empty:
        return pd.DataFrame({"k": pd.Series(dtype="int64"),
                             "cum_count": pd.Series(dtype="int64"),
                             "coverage_ppm": pd.Series(dtype="int64")})
    tc = tc.sort_values(["count", "token"], ascending=[False, True],
                        kind="mergesort").reset_index(drop=True)
    total = int(tc["count"].sum())
    cum = tc["count"].to_numpy().cumsum()
    V = len(tc)
    ks = sorted({min(1 << e, V) for e in range(41)})
    return pd.DataFrame({
        "k": np.asarray(ks, dtype=np.int64),
        "cum_count": cum[np.asarray(ks) - 1].astype(np.int64),
        "coverage_ppm": (cum[np.asarray(ks) - 1] * 1_000_000
                         // total).astype(np.int64),
    })


def vocab_coverage_sql(*, table: str = "documents",
                       text: str = "text") -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH tc AS (
          SELECT t.token, count(*)::BIGINT AS n
          FROM {table}, unnest({toks}) AS t(token) GROUP BY 1
        ),
        rk AS (
          SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rn
          FROM tc
        ),
        cum AS (SELECT rn, sum(n) OVER (ORDER BY rn)::BIGINT AS c FROM rk),
        tot AS (SELECT sum(n)::BIGINT AS t, count(*)::BIGINT AS nv FROM tc),
        ks AS (
          SELECT DISTINCT least((1::BIGINT << e.e), tot.nv) AS k
          FROM unnest(range(41)) AS e(e), tot
        )
        SELECT ks.k, cum.c AS cum_count,
               (cum.c * 1000000 // tot.t)::BIGINT AS coverage_ppm
        FROM ks JOIN cum ON cum.rn = ks.k, tot"""


# ---------------------------------------------------------------------------
# WordPiece merge training (likelihood-scored; the BERT tokenizer prep)


def wordpiece_train(ds, *, text_col: str = "text", rounds: int = 3,
                    num_buckets: int = 32,
                    driver_limit: int = 5_000_000,
                    return_segmented: bool = False):
    """WordPiece tokenizer training (Schuster & Nakajima '12 / BERT): per
    round the merge maximizing the LIKELIHOOD score ``c(l,r)/(c(l)·c(r))``
    — not BPE's raw pair count — wins; frequent-but-uninformative pairs
    (both symbols already common) lose to genuinely cohesive ones.

    Exactness contract: the score is compared as the INTEGER
    ``c_pair·10¹² // (c_l·c_r)`` (HUGEINT-safe; floor ties then break
    (cnt desc, l asc, r asc) — the floor is part of the contract, so
    engine and SQL pick the same merge even when true ratios differ
    inside one floor bucket). Symbol counts are corpus occurrence counts
    under the CURRENT segmentation, weighted by word frequency — single-
    symbol words count too.

    Same shapes as :func:`bpe_train`: after one corpus token fold all
    rounds run on the word-TYPE vocabulary; driver-resident rounds when
    the vocabulary fits (identical arithmetic), else per round one
    (l,r)-bucketed pair fold + a symbol fold whose output is
    alphabet+merges-sized (broadcast back for scoring) + one vectorized
    replace. Returns (round, left, right, merged, count, score_scaled).
    """
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    words = corpus_token_counts(ds, text_col=text_col,
                                num_buckets=num_buckets)

    SEP_L, SEP_R = "\x1e", "\x1f"

    def to_seq(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "token": df["token"].astype(str),
            "c": df["count"].astype("int64"),
            "s": [SEP_L + (SEP_R + SEP_L).join(list(w)) + SEP_R
                  for w in df["token"].astype(str)],
        })

    def split_syms(df: pd.DataFrame):
        toks = df["s"].str.slice(1, -1).str.split(SEP_R + SEP_L)
        lens = toks.str.len().to_numpy()
        c = df["c"].to_numpy()
        flat = (np.concatenate(toks.to_list()) if len(toks)
                else np.array([], dtype=object))
        return flat, lens, c

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens, c = split_syms(df)
        if len(flat) == 0 or (lens - 1).clip(min=0).sum() == 0:
            return pd.DataFrame({"l": pd.Series(dtype=object),
                                 "r": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64")})
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(len(flat)) - np.repeat(starts, lens)
        first = pos < np.repeat(lens - 1, lens)
        g = pd.DataFrame({
            "l": flat[first],
            "r": flat[1:][first[:-1]] if len(flat) > 1 else flat[:0],
            "cnt": np.repeat(c, lens)[first],
        })
        return g.groupby(["l", "r"], sort=False, as_index=False)["cnt"].sum()

    def sym_partial(df: pd.DataFrame) -> pd.DataFrame:
        flat, lens, c = split_syms(df)
        if len(flat) == 0:
            return pd.DataFrame({"sym": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        g = pd.DataFrame({"sym": flat, "n": np.repeat(c, lens)})
        return g.groupby("sym", sort=False, as_index=False)["n"].sum()

    def pick(pc_df: pd.DataFrame, sc: dict):
        # arbitrary-precision score vectorized via object dtype (Python
        # ints) — the same exact arithmetic HUGEINT runs in SQL
        cl = pc_df["l"].map(sc).astype(object)
        cr = pc_df["r"].map(sc).astype(object)
        score = (pc_df["cnt"].astype(object) * 10**12) // (cl * cr)
        d = pc_df.assign(_score=score).sort_values(
            ["_score", "cnt", "l", "r"],
            ascending=[False, False, True, True], kind="mergesort")
        row = d.iloc[0]
        return (None, str(row["l"]), str(row["r"]), int(row["cnt"]),
                int(row["_score"]))

    merges = []
    words = words.materialize()
    if words.count() <= driver_limit:
        seq_pd = to_seq(words.to_pandas())
        for rnd in range(1, rounds + 1):
            pc_df = pair_partial(seq_pd)
            if pc_df.empty:
                break
            pc_df = pc_df.groupby(["l", "r"], as_index=False)["cnt"].sum()
            sc_df = sym_partial(seq_pd)
            sc = dict(zip(sc_df["sym"],
                          sc_df["n"].astype("int64").map(int)))
            _, l, r, cnt, score = pick(pc_df, sc)
            merges.append((rnd, l, r, l + r, cnt, score))
            pat = f"{SEP_L}{l}{SEP_R}{SEP_L}{r}{SEP_R}"
            rep = f"{SEP_L}{l}{r}{SEP_R}"
            seq_pd = pd.DataFrame({
                "token": seq_pd["token"], "c": seq_pd["c"],
                "s": seq_pd["s"].str.replace(pat, rep, regex=False),
            })
    else:
        seqs = words.map_batches(to_seq, batch_format="pandas").materialize()
        for rnd in range(1, rounds + 1):
            folded = bucketed_aggregate(
                seqs.map_batches(pair_partial, batch_format="pandas"),
                ["l", "r"], {"cnt": ("cnt", "sum")},
                num_buckets=num_buckets)
            # symbol table is alphabet+merges-sized: fold then broadcast
            sc_df = bucketed_aggregate(
                seqs.map_batches(sym_partial, batch_format="pandas"),
                "sym", {"n": ("n", "sum")}, num_buckets=8).to_pandas()
            sc = dict(zip(sc_df["sym"], sc_df["n"].map(int)))
            pc_df = folded.to_pandas()  # pair table of the shrinking vocab
            if pc_df.empty:
                break
            _, l, r, cnt, score = pick(pc_df, sc)
            merges.append((rnd, l, r, l + r, cnt, score))
            pat = f"{SEP_L}{l}{SEP_R}{SEP_L}{r}{SEP_R}"
            rep = f"{SEP_L}{l}{r}{SEP_R}"

            def apply(df: pd.DataFrame, *, _p=pat, _r=rep) -> pd.DataFrame:
                return pd.DataFrame({
                    "token": df["token"], "c": df["c"],
                    "s": df["s"].str.replace(_p, _r, regex=False),
                })

            seqs = seqs.map_batches(apply,
                                    batch_format="pandas").materialize()

    out = pd.DataFrame(
        merges,
        columns=["round", "left", "right", "merged", "count",
                 "score_scaled"],
    ).astype({"round": "int64", "count": "int64",
              "score_scaled": "int64"})
    if return_segmented:
        seg = (seq_pd if words.count() <= driver_limit
               else seqs.to_pandas())
        return out, seg
    return out


def wordpiece_train_sql(*, table: str = "documents", text: str = "text",
                        rounds: int = 3) -> str:
    """SQL mirror: the bpe_train CTE skeleton plus per-round symbol-count
    CTEs and the HUGEINT likelihood argmax."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    sql = f"""
        WITH words AS (
          SELECT u.t AS w, count(*)::BIGINT AS c
          FROM {table}, unnest({toks}) AS u(t) GROUP BY 1
        ),
        seq0 AS (
          SELECT c, chr(30) || array_to_string(
                   list_transform(range(1, length(w) + 1), i -> w[i]),
                   chr(31) || chr(30)) || chr(31) AS s
          FROM words
        ),"""
    prev = "seq0"
    for i in range(1, rounds + 1):
        sql += f"""
        a{i} AS (SELECT string_split(
                     substr(s, 2, length(s) - 2), chr(31) || chr(30)
                 ) AS arr, c FROM {prev}),
        p{i} AS (
          SELECT arr[j.j] AS l, arr[j.j + 1] AS r, sum(c)::BIGINT AS cnt
          FROM a{i}, unnest(generate_series(1, len(arr) - 1)) AS j(j)
          GROUP BY 1, 2
        ),
        sc{i} AS (
          SELECT t.sym, sum(c)::BIGINT AS n
          FROM a{i}, unnest(arr) AS t(sym) GROUP BY 1
        ),
        m{i} AS (
          SELECT p.l, p.r, p.cnt,
                 (p.cnt::HUGEINT * 1000000000000
                  // (sl.n::HUGEINT * sr.n::HUGEINT))::BIGINT AS score
          FROM p{i} p
          JOIN sc{i} sl ON sl.sym = p.l
          JOIN sc{i} sr ON sr.sym = p.r
          ORDER BY score DESC, p.cnt DESC, p.l, p.r LIMIT 1
        ),
        seq{i} AS (SELECT c, replace(s,
                 chr(30) || l || chr(31) || chr(30) || r || chr(31),
                 chr(30) || l || r || chr(31)) AS s
                 FROM {prev} CROSS JOIN m{i}),"""
        prev = f"seq{i}"
    unions = "\n          UNION ALL ".join(
        f'SELECT {i}::BIGINT AS round, l AS "left", r AS "right",'
        f' l || r AS merged, cnt AS count, score AS score_scaled FROM m{i}'
        for i in range(1, rounds + 1))
    return sql + f"""
        sink AS (SELECT 1)
        {unions}"""


def _greedy_wordpiece(word: str, pieces: set, maxlen: int) -> list:
    """Greedy longest-match-first segmentation (BERT's
    WordpieceTokenizer.tokenize): at each position take the LONGEST
    vocabulary piece. Always terminates because the alphabet (every
    single char of every word type) is in the vocabulary."""
    out = []
    p, n = 0, len(word)
    while p < n:
        k = min(maxlen, n - p)
        while k > 1 and word[p:p + k] not in pieces:
            k -= 1
        out.append(word[p:p + k])
        p += k
    return out


def wordpiece_encode(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     rounds: int = 3, max_word_len: int = 12,
                     num_buckets: int = 32):
    """Apply a trained WordPiece vocabulary to the corpus by GREEDY
    LONGEST-MATCH-FIRST (Devlin et al. '19, BERT's WordpieceTokenizer) —
    ``(id, pos, sym_pos, piece)`` subword rows, completing the
    BPE / Unigram / WordPiece encode trifecta.

    Deliberately NOT merge-order replay: WordPiece *encoding* matches the
    longest vocabulary piece at each position, so a late merge ``abc``
    beats replaying ``a+b`` then ``ab+c`` step by step, and the two
    segmentations genuinely diverge on real vocabularies (pinned by
    test). The vocabulary is alphabet ∪ merged symbols; words longer
    than ``max_word_len`` emit the single piece ``[UNK]`` (BERT's
    ``max_input_chars_per_word`` rule — the bound that also keeps the
    SQL replay's stage unroll finite).

    Scale shape (same as :func:`bpe_encode`): segmentation is a function
    of the word TYPE, so the segmented vocabulary — the module's
    canonical worker-fit small side — broadcasts once via ``ray.put``
    and occurrences expand by flat-pool index arithmetic; documents are
    never re-segmented row by row and nothing exchanges.
    """
    merges, seg = wordpiece_train(
        ds, text_col=text_col, rounds=rounds, num_buckets=num_buckets,
        return_segmented=True)
    words = seg["token"].astype(str).to_numpy()
    pieces = set(merges["merged"].astype(str))
    for w in words:
        pieces.update(w)
    maxlen = max((len(p) for p in pieces), default=1)
    syms = [["[UNK]"] if len(w) > max_word_len
            else _greedy_wordpiece(w, pieces, maxlen) for w in words]
    return _encode_with_segmentation(
        ds, words, syms, text_col=text_col, id_col=id_col,
        symbol_col="piece")


def wordpiece_encode_sql(*, table: str = "documents", text: str = "text",
                         id_col: str = "doc_id", rounds: int = 3,
                         max_word_len: int = 12) -> str:
    """SQL mirror: the wordpiece_train CTEs supply the merges, the
    vocabulary is chars ∪ merged, and the greedy scan unrolls to
    ``max_word_len`` stages (each stage consumes ≥ 1 char) — per stage
    the longest vocab piece at the cursor wins via a length-desc
    row_number over candidate substrings."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    sql = f"""
        WITH words AS MATERIALIZED (
          SELECT u.t AS w, count(*)::BIGINT AS c
          FROM {table}, unnest({toks}) AS u(t) GROUP BY 1
        ),
        seq0 AS (
          SELECT c, chr(30) || array_to_string(
                   list_transform(range(1, length(w) + 1), i -> w[i]),
                   chr(31) || chr(30)) || chr(31) AS s
          FROM words
        ),"""
    prev = "seq0"
    for i in range(1, rounds + 1):
        sql += f"""
        a{i} AS (SELECT string_split(
                     substr(s, 2, length(s) - 2), chr(31) || chr(30)
                 ) AS arr, c FROM {prev}),
        p{i} AS (
          SELECT arr[j.j] AS l, arr[j.j + 1] AS r, sum(c)::BIGINT AS cnt
          FROM a{i}, unnest(generate_series(1, len(arr) - 1)) AS j(j)
          GROUP BY 1, 2
        ),
        sc{i} AS (
          SELECT t.sym, sum(c)::BIGINT AS n
          FROM a{i}, unnest(arr) AS t(sym) GROUP BY 1
        ),
        m{i} AS MATERIALIZED (
          SELECT p.l, p.r, p.cnt,
                 (p.cnt::HUGEINT * 1000000000000
                  // (sl.n::HUGEINT * sr.n::HUGEINT))::BIGINT AS score
          FROM p{i} p
          JOIN sc{i} sl ON sl.sym = p.l
          JOIN sc{i} sr ON sr.sym = p.r
          ORDER BY score DESC, p.cnt DESC, p.l, p.r LIMIT 1
        ),
        seq{i} AS (SELECT c, replace(s,
                 chr(30) || l || chr(31) || chr(30) || r || chr(31),
                 chr(30) || l || r || chr(31)) AS s
                 FROM {prev} CROSS JOIN m{i}),"""
        prev = f"seq{i}"
    merged_union = "\n          UNION ".join(
        f"SELECT l || r AS piece FROM m{i}" for i in range(1, rounds + 1))
    sql += f"""
        vocab AS MATERIALIZED (
          SELECT DISTINCT w[i.i] AS piece
          FROM words, unnest(range(1, length(w) + 1)) AS i(i)
          UNION
          {merged_union}
        ),
        st0 AS (
          SELECT w, length(w) AS n, 1 AS p, 0 AS k
          FROM words WHERE length(w) <= {max_word_len}
        ),"""
    prev = "st0"
    for t in range(1, max_word_len + 1):
        sql += f"""
        mt{t} AS MATERIALIZED (
          SELECT w, n, p, k, piece FROM (
            SELECT s.w, s.n, s.p, s.k, substr(s.w, s.p, l.l) AS piece,
                   row_number() OVER (PARTITION BY s.w, s.p
                                      ORDER BY l.l DESC) AS rn
            FROM {prev} s,
                 unnest(range(1, s.n - s.p + 2)) AS l(l)
            JOIN vocab v ON substr(s.w, s.p, l.l) = v.piece
          ) WHERE rn = 1
        ),
        st{t} AS (
          SELECT w, n, p + length(piece) AS p, k + 1 AS k
          FROM mt{t} WHERE p + length(piece) <= n
        ),"""
        prev = f"st{t}"
    seg_union = "\n          UNION ALL ".join(
        f"SELECT w, k AS sym_pos, piece FROM mt{t}"
        for t in range(1, max_word_len + 1))
    return sql + f"""
        seg AS (
          {seg_union}
          UNION ALL
          SELECT w, 0 AS sym_pos, '[UNK]' AS piece
          FROM words WHERE length(w) > {max_word_len}
        ),
        base AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        exploded AS (
          SELECT {id_col}, (i - 1)::BIGINT AS pos, arr[i] AS token
          FROM base, LATERAL unnest(range(1, len(arr) + 1)) AS t(i)
        )
        SELECT e.{id_col}, e.pos, s.sym_pos::BIGINT AS sym_pos, s.piece
        FROM exploded e JOIN seg s ON e.token = s.w"""


# ---------------------------------------------------------------------------
# unigram-LM tokenizer training (SentencePiece's third trainer, after BPE
# and WordPiece)


def unigram_train(ds, *, text_col: str = "text", rounds: int = 2,
                  max_piece_len: int = 4, seed_size: int = 200,
                  prune_min: int = 1, max_word_len: int = 12,
                  num_buckets: int = 32, return_segmented: bool = False):
    """Unigram-LM tokenizer training (Kudo ACL'18 / SentencePiece) as a
    bounded-round hard-EM with the module's integer-exactness contract —
    completing the BPE / WordPiece / Unigram trainer trifecta.

    The reproducibility contract (what replaces SentencePiece's float
    forward-backward EM, which is summation-order-dependent and hence
    not cross-engine stable):

    * piece costs are HALF-BITS of inverse probability:
      ``cost(p) = bitlen(T²) − bitlen(cnt(p)²)`` with ``T = Σ cnt`` —
      ``⌊2·log2(T/cnt)⌋ ± 1`` computed exactly in integers on both
      engines (the SQL mirror squares in BIGINT, so its documented
      domain is ``T < 2³¹·⁵``; the engine itself uses arbitrary
      precision);
    * the E-step is VITERBI (hard-EM): each word type takes its single
      best segmentation under ``min Σ cost`` with ties broken by the
      smallest split point at every DP cell — a total order, so the
      segmentation is deterministic and SQL-unrollable;
    * the M-step recounts piece usage over best paths (weighted by word
      frequency), prunes multi-char pieces used fewer than ``prune_min``
      times (single chars are never pruned — feasibility), and
      re-smoothes ``cnt = usage + 1``.

    Seeding: all single chars plus the top ``seed_size`` multi-char
    substrings (length ≤ ``max_piece_len``) by positionally-exploded
    frequency-weighted count, ties (count desc, piece asc).

    Scale shape: ONE corpus token fold; every round runs on the folded
    word-TYPE vocabulary (the module's canonical worker-fit small side,
    same contract as ``bpe_train``'s driver-resident regime) — the
    corpus is never rescanned. Words longer than ``max_word_len`` are
    rejected loudly (the SQL unroll depth; raise it for long-token
    corpora). Returns a pandas DataFrame ``(piece, piece_len, usage)`` —
    the final vocabulary with its last-E-step usage.
    """
    words = corpus_token_counts(
        ds, text_col=text_col, num_buckets=num_buckets
    ).to_pandas()
    words = words.sort_values("token", ignore_index=True)
    wlist = words["token"].astype(str).tolist()
    freqs = words["count"].astype("int64").to_numpy()
    too_long = [w for w in wlist if len(w) > max_word_len]
    if too_long:
        raise ValueError(
            f"unigram_train: {len(too_long)} word types exceed "
            f"max_word_len={max_word_len} (e.g. {too_long[0]!r}); raise "
            "max_word_len (the SQL unroll depth) to cover them")

    # ---- seed vocabulary -------------------------------------------------
    from collections import Counter

    seed = Counter()
    for w, f in zip(wlist, freqs):
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                seed[w[i:i + ln]] += int(f)
    chars = sorted({p for p in seed if len(p) == 1})
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    vocab = {p: seed[p] for p in chars}
    vocab.update(dict(multi))

    def _viterbi_usage(cnt: dict):
        T = sum(cnt.values())
        lt = (T * T).bit_length()
        cost = {p: lt - (c * c).bit_length() for p, c in cnt.items()}
        usage = Counter()
        segs = []
        big = 1 << 60
        for w, f in zip(wlist, freqs):
            n = len(w)
            best = [0] + [big] * n
            prev = [-1] * (n + 1)
            for i in range(1, n + 1):
                for j in range(max(0, i - max_piece_len), i):
                    piece = w[j:i]
                    c = cost.get(piece)
                    if c is None or best[j] >= big:
                        continue
                    cand = best[j] + c
                    # strict < with ascending j == min by (cost, j)
                    if cand < best[i]:
                        best[i] = cand
                        prev[i] = j
            pos = n
            rev = []
            while pos > 0:
                j = prev[pos]
                piece = w[j:pos]
                usage[piece] += int(f)
                rev.append(piece)
                pos = j
            segs.append(rev[::-1])
        return usage, segs

    cnt = dict(vocab)
    usage = Counter()
    segs: list = []
    for _ in range(rounds):
        usage, segs = _viterbi_usage(cnt)
        cnt = {p: usage[p] + 1 for p in chars}
        cnt.update({p: u + 1 for p, u in usage.items()
                    if len(p) > 1 and u >= prune_min})

    pieces = sorted(set(chars) | {p for p in usage if len(p) > 1
                                  and usage[p] >= prune_min})
    out = pd.DataFrame({
        "piece": pieces,
        "piece_len": np.array([len(p) for p in pieces], dtype=np.int64),
        "usage": np.array([int(usage.get(p, 0)) for p in pieces],
                          dtype=np.int64),
    })
    if return_segmented:
        return out, pd.DataFrame({"token": wlist, "syms": segs})
    return out


def unigram_train_sql(*, table: str = "documents", text: str = "text",
                      rounds: int = 2, max_piece_len: int = 4,
                      seed_size: int = 200, prune_min: int = 1,
                      max_word_len: int = 12, emit: str = "pieces",
                      id_col: str = "doc_id") -> str:
    """SQL replay of :func:`unigram_train`: the Viterbi DP unrolls to
    ``max_word_len`` per-position argmin stages per round (min by
    ``(cost, split_point)`` via ``row_number``), the best path walks back
    through the same stages, and usage/prune/re-smooth are plain
    aggregates. Costs square in BIGINT, so the mirror's domain is
    ``Σcnt < 3·10⁹`` (the engine itself is arbitrary-precision)."""
    L, W, R = max_piece_len, max_word_len, rounds
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    parts = [f"""w AS MATERIALIZED (
          SELECT t.t AS word, count(*)::BIGINT AS freq
          FROM {table}, LATERAL unnest({toks}) AS t(t)
          GROUP BY 1
        )""", f"""sub AS MATERIALIZED (
          SELECT substring(word, i.i, l.l) AS piece, l.l::BIGINT AS plen,
                 sum(freq)::BIGINT AS cnt
          FROM w,
               unnest(generate_series(1, length(word))) i(i),
               unnest(generate_series(1, {L})) l(l)
          WHERE i.i + l.l - 1 <= length(word)
          GROUP BY 1, 2
        )""", """chars0 AS MATERIALIZED (SELECT piece, cnt FROM sub WHERE plen = 1)""",
        f"""multi0 AS MATERIALIZED (
          SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   row_number() OVER (ORDER BY cnt DESC, piece) AS rn
            FROM sub WHERE plen > 1)
          WHERE rn <= {seed_size}
        )""", """v0 AS MATERIALIZED (
          SELECT piece, cnt FROM chars0
          UNION ALL SELECT piece, cnt FROM multi0
        )"""]
    for r in range(1, R + 1):
        parts.append(f"t{r} AS MATERIALIZED (SELECT sum(cnt)::BIGINT AS t FROM v{r-1})")
        parts.append(f"""c{r} AS MATERIALIZED (
          SELECT piece,
                 (length(format('{{:b}}', t.t * t.t))
                  - length(format('{{:b}}', cnt * cnt)))::BIGINT AS cost
          FROM v{r-1}, t{r} t
        )""")
        parts.append(
            f"b{r}_0 AS MATERIALIZED (SELECT word, 0::BIGINT AS cost FROM w)")
        for i in range(1, W + 1):
            arms = []
            for j in range(max(0, i - L), i):
                arms.append(f"""
                SELECT b.word, b.cost + c.cost AS cost, {j} AS j
                FROM b{r}_{j} b JOIN c{r} c
                  ON c.piece = substring(b.word, {j + 1}, {i - j})
                WHERE length(b.word) >= {i}""")
            union = " UNION ALL ".join(arms)
            parts.append(f"""b{r}_{i} AS MATERIALIZED (
              SELECT word, cost, j FROM (
                SELECT word, cost, j, row_number() OVER (
                    PARTITION BY word ORDER BY cost, j) AS rn
                FROM ({union})
              ) WHERE rn = 1
            )""")
        bb = " UNION ALL ".join(
            f"SELECT word, {i}::BIGINT AS pos, j FROM b{r}_{i}"
            for i in range(1, W + 1))
        parts.append(f"bb{r} AS MATERIALIZED ({bb})")
        parts.append(
            f"p{r}_0 AS MATERIALIZED (SELECT word, length(word)::BIGINT AS pos FROM w)")
        for k in range(1, W + 1):
            parts.append(f"""p{r}_{k} AS MATERIALIZED (
              SELECT p.word, bb.j::BIGINT AS pos
              FROM p{r}_{k-1} p JOIN bb{r} bb
                ON bb.word = p.word AND bb.pos = p.pos
              WHERE p.pos > 0
            )""")
        segs = " UNION ALL ".join(f"""
            SELECT a.word, b.pos AS start,
                   substring(a.word, (b.pos + 1)::INT,
                             (a.pos - b.pos)::INT) AS piece
            FROM p{r}_{k} a JOIN p{r}_{k+1} b USING (word)
            WHERE a.pos > 0""" for k in range(0, W))
        parts.append(f"seg{r} AS MATERIALIZED ({segs})")
        parts.append(f"""u{r} AS MATERIALIZED (
          SELECT piece, sum(freq)::BIGINT AS usage
          FROM seg{r} JOIN w USING (word) GROUP BY 1
        )""")
        if r < R:
            parts.append(f"""v{r} AS MATERIALIZED (
              SELECT c.piece, coalesce(u.usage, 0) + 1 AS cnt
              FROM chars0 c LEFT JOIN u{r} u USING (piece)
              UNION ALL
              SELECT piece, usage + 1 AS cnt FROM u{r}
              WHERE length(piece) > 1 AND usage >= {prune_min}
            )""")
    body = ",\n        ".join(parts)
    if emit == "encode":
        return f"""
        WITH {body},
        ordseg AS (
          SELECT word, piece,
                 (row_number() OVER (
                      PARTITION BY word ORDER BY start) - 1)::BIGINT
                     AS sym_pos
          FROM seg{R}
        ),
        base AS (SELECT {id_col}, {toks} AS arr FROM {table}),
        exploded AS (
          SELECT {id_col}, (i - 1)::BIGINT AS pos, arr[i] AS token
          FROM base, LATERAL unnest(range(1, len(arr) + 1)) AS t(i)
        )
        SELECT e.{id_col}, e.pos, s.sym_pos, s.piece
        FROM exploded e JOIN ordseg s ON e.token = s.word"""
    return f"""
        WITH {body}
        SELECT p.piece, length(p.piece)::BIGINT AS piece_len,
               coalesce(u.usage, 0)::BIGINT AS usage
        FROM (SELECT piece FROM chars0
              UNION
              SELECT piece FROM u{R}
              WHERE length(piece) > 1 AND usage >= {prune_min}) p
        LEFT JOIN u{R} u USING (piece)"""


def tokenizer_fertility(encoded, *, id_col: str = "doc_id"):
    """Per-document tokenizer FERTILITY (pieces per word — the standard
    subword-tokenizer quality metric; ~1.0 = vocabulary fits the corpus,
    high = over-fragmentation): consumes any encode output
    (``bpe_encode`` / ``wordpiece_encode`` / ``unigram_encode``,
    ``(id, pos, sym_pos, piece)`` rows) and emits
    ``(id, n_words, n_pieces, fertility_ppm)`` with
    ``fertility_ppm = n_pieces·10⁶ // n_words`` (exact integer).

    Zero exchange: the encode kernels are batch-aligned (every row of a
    document stays in the batch that held the document), so the per-doc
    fold completes inside each batch."""

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: batch.column(id_col),
            "w": pa.array(
                (batch.column("sym_pos").to_numpy() == 0).astype(np.int64)),
        })
        g = t.group_by(id_col).aggregate([("w", "sum"), ([], "count_all")])
        nw = g.column("w_sum").to_numpy().astype(np.int64)
        np_ = g.column("count_all").to_numpy().astype(np.int64)
        return pa.table({
            id_col: g.column(id_col),
            "n_words": pa.array(nw, type=pa.int64()),
            "n_pieces": pa.array(np_, type=pa.int64()),
            "fertility_ppm": pa.array(np_ * 1_000_000 // nw,
                                      type=pa.int64()),
        })

    return encoded.map_batches(fold, batch_format="pyarrow")


def tokenizer_fertility_sql(encode_sql: str, *,
                            id_col: str = "doc_id") -> str:
    """SQL replay over any encode replay subquery."""
    return f"""
        SELECT {id_col},
               count(*) FILTER (sym_pos = 0)::BIGINT AS n_words,
               count(*)::BIGINT AS n_pieces,
               (count(*) * 1000000
                // count(*) FILTER (sym_pos = 0))::BIGINT
                   AS fertility_ppm
        FROM ({encode_sql}) GROUP BY 1"""


def oov_rate(ds, vocab_tokens, *, text_col: str = "text",
             group_col: str = "lang"):
    """Per-group out-of-vocabulary rate against a REFERENCE vocabulary —
    the domain-shift / tokenizer-coverage diagnostic ("how much of corpus
    B does corpus A's vocabulary miss"): occurrence-weighted
    ``oov_ppm = n_oov·10⁶ // n_tokens`` per group, exact integers.

    ``vocab_tokens`` is the reference vocabulary (any iterable — e.g.
    ``build_vocab``'s token column, or the distinct tokens of a trusted
    slice): the module's canonical worker-fit small side, broadcast once
    via ``ray.put`` as a pd.Index. Per-batch (group, n, oov) partials
    combine before ONE tiny G-row fold; groups appear iff they have at
    least one token occurrence (counts derive from occurrences)."""
    import ray
    from ray.data.aggregate import Sum

    idx = pd.Index(pd.unique(pd.Series(list(vocab_tokens), dtype=object)))
    ref = ray.put(idx)

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        if len(flat) == 0:
            return pa.table({
                group_col: pa.array([], type=batch.schema.field(
                    group_col).type),
                "n_tokens": pa.array([], type=pa.int64()),
                "n_oov": pa.array([], type=pa.int64()),
            })
        grp = batch.column(group_col).take(
            pa.array(parent, type=pa.int64()))
        oov = (~pd.Index(flat.to_numpy(zero_copy_only=False))
               .isin(ray.get(ref))).astype(np.int64)
        t = pa.table({group_col: grp,
                      "n_tokens": pa.array(np.ones(len(oov), np.int64)),
                      "n_oov": pa.array(oov)})
        g = t.group_by(group_col).aggregate(
            [("n_tokens", "sum"), ("n_oov", "sum")])
        return g.rename_columns([group_col, "n_tokens", "n_oov"])

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("n_oov", alias_name="n_oov"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy().astype(np.int64)
        o = batch.column("n_oov").to_numpy().astype(np.int64)
        return batch.append_column(
            "oov_ppm", pa.array(o * 1_000_000 // np.maximum(n, 1),
                                type=pa.int64()))

    return folded.map_batches(finish, batch_format="pyarrow")


def oov_rate_sql(*, table: str = "documents", text_col: str = "text",
                 group_col: str = "lang",
                 vocab_where: str = "lang = 'en'") -> str:
    """SQL replay: reference vocabulary = distinct tokens of the
    ``vocab_where`` slice of the same table."""
    toks = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    return f"""
        WITH v AS (
          SELECT DISTINCT t.tok FROM {table},
                 unnest({toks}) AS t(tok)
          WHERE {vocab_where}
        ),
        occ AS (
          SELECT {group_col}, t.tok FROM {table},
                 unnest({toks}) AS t(tok)
        )
        SELECT {group_col},
               count(*)::BIGINT AS n_tokens,
               count(*) FILTER (tok NOT IN (SELECT tok FROM v))::BIGINT
                   AS n_oov,
               (count(*) FILTER (tok NOT IN (SELECT tok FROM v))
                * 1000000 // count(*))::BIGINT AS oov_ppm
        FROM occ GROUP BY 1"""


# ---------------------------------------------------------------------------
# word2vec negative-sampling distribution (unigram^{3/4})


def neg_sampling_weights(ds, *, text_col: str = "text",
                         num_buckets: int = 64):
    """word2vec's noise distribution (Mikolov et al., NeurIPS'13): negative
    samples are drawn ∝ count(token)^{3/4} — the one smoothing exponent the
    paper found to beat both the raw unigram and the uniform. ¾ has an
    EXACT integer form (where float ``pow`` is neither correctly rounded
    nor cross-engine stable): ``r = ⌊n^{3/4}⌋ = isqrt(isqrt(n³))`` — the
    nested floored square roots ARE the floored fourth root of ``n³``.

    ``weight_ppb = r·10⁹ // Σ_tokens r`` (ppb not ppm: a 10⁶ grid rounds
    mid-tail tokens of a big vocabulary to 0).

    Scale shape: ONE vocabulary-bucketed count fold; ``r`` attaches
    vectorized on the folded (token, count) table (Python-int isqrt over
    TYPES, not occurrences — exact at any count, no int64 overflow on
    ``n³``); the fold is materialized for its two consumers (Σr scalar +
    the weight pass) so the corpus is never rescanned. Output
    ``(token, count, weight_ppb)``."""
    import math

    counts = corpus_token_counts(
        ds, text_col=text_col, num_buckets=num_buckets)

    def attach_r(batch: pa.Table) -> pa.Table:
        n = batch.column("count").to_pylist()
        r = [math.isqrt(math.isqrt(v * v * v)) for v in n]
        return batch.append_column("r", pa.array(r, type=pa.int64()))

    with_r = counts.map_batches(attach_r, batch_format="pyarrow")
    with_r = with_r.materialize()  # two consumers below
    denom = max(int(with_r.sum("r")), 1)

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy()
        w = r.astype(object) * 1_000_000_000 // denom  # HUGEINT-safe
        return pa.table({
            "token": batch.column("token"),
            "count": batch.column("count"),
            "weight_ppb": pa.array([int(x) for x in w], type=pa.int64()),
        })

    return with_r.map_batches(finish, batch_format="pyarrow")


def neg_sampling_weights_sql(*, table: str = "documents",
                             text_col: str = "text") -> str:
    """SQL mirror: nested ±1-corrected isqrt (float sqrt of a wide int can
    land one off near perfect squares; both directions repaired), n³ in
    HUGEINT."""

    def isqrt(x: str, wide: bool) -> str:
        s = f"CAST(floor(sqrt(({x})::DOUBLE)) AS {'HUGEINT' if wide else 'BIGINT'})"
        return (f"({s} + (CASE WHEN ({s}+1)*({s}+1) <= ({x}) THEN 1 ELSE 0 END)"
                f" - (CASE WHEN {s}*{s} > ({x}) THEN 1 ELSE 0 END))")

    return f"""
        WITH c AS (
          SELECT t.t AS token, count(*)::BIGINT AS count
          FROM {table}, LATERAL unnest(
            list_filter(string_split({text_col}, ' '), x -> x <> '')
          ) AS t(t)
          GROUP BY 1
        ),
        r1 AS (SELECT token, count,
                      {isqrt('count::HUGEINT * count * count', True)} AS s1
               FROM c),
        r2 AS (SELECT token, count, {isqrt('s1', False)}::BIGINT AS r
               FROM r1),
        d AS (SELECT greatest(sum(r), 1)::HUGEINT AS denom FROM r2)
        SELECT token, count,
               (r::HUGEINT * 1000000000 // d.denom)::BIGINT AS weight_ppb
        FROM r2, d"""


def vocab_growth(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 checkpoint: int = 10_000, salt: str = "",
                 num_buckets: int = 64, token_buckets: int = 32):
    """Heaps-law vocabulary-growth curve: distinct token TYPES seen after
    every ``checkpoint`` tokens of the corpus, read in the engine's
    canonical deterministic md5 order (``deterministic_shuffle``'s
    (md5(salt+id), id) permutation — the effectively-random order Heaps'
    law assumes; crawl/id order would confound the curve with topical
    drift).  The curve answers "how fast does this corpus stop paying
    vocabulary rent" — tokenizer sizing and dedup-health diagnostic
    (a duplicated corpus's curve flattens early).

    Exact contract: global token position = (doc offset under the md5
    permutation) + in-doc position; a type's first occurrence is
    ``min(gpos)``; the row for checkpoint b reports
    ``tokens_seen = min((b+1)·checkpoint, T)`` and the number of types
    first seen before ``tokens_seen``.  Pure function of the data —
    bit-identical across parallelism, replayed in SQL by a row_number
    window over the same md5 order.

    Scale shape: the deterministic_shuffle two-pass prefix scan lifted
    to TOKEN granularity (pass 1: per-hash-range-bucket token counts, a
    B-row fold; pass 2: per-bucket doc sort + offset-exploded (token,
    gpos) rows pre-folded to per-bucket min); then one token-bucketed
    min fold and a checkpoint-histogram fold; the cumulative finish
    walks the bounded T/checkpoint grid on the driver.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    K = int(checkpoint)
    if K <= 0:
        raise ValueError(f"checkpoint must be positive, got {checkpoint}")

    _B, _H = "_vg_bucket", "_vg_hash"

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        df[_H] = h
        df[_B] = (((h >> np.uint64(32)) * np.uint64(num_buckets))
                  >> np.uint64(32)).astype(np.int64)
        return df

    def _doc_lens(texts: pa.Array) -> np.ndarray:
        # vectorized (split + filter-empty) token counts, the _tok_stats
        # kernel shape
        import pyarrow.compute as pc

        toks = pc.split_pattern(texts, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        mask = pc.not_equal(flat, "")
        par = parent.filter(mask).to_numpy()
        return np.bincount(par, minlength=len(texts)).astype(np.int64)

    # pass 1: per-bucket TOKEN counts (B tiny rows) -> exclusive scan
    def tok_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = md5_hash64([f"{salt}{v}" for v in ids])
        bkt = (((h >> np.uint64(32)) * np.uint64(num_buckets))
               >> np.uint64(32)).astype(np.int64)
        lens = _doc_lens(batch.column(text_col))
        n = np.bincount(bkt, weights=lens,
                        minlength=num_buckets).astype(np.int64)
        nz = np.nonzero(n)[0]
        return pa.table({_B: pa.array(nz.astype(np.int64)),
                         "n": pa.array(n[nz])})

    counts = (
        ds.map_batches(tok_counts, batch_format="pyarrow")
        .groupby(_B).sum("n").to_pandas()
    )
    totals = np.zeros(num_buckets, dtype=np.int64)
    if len(counts):
        totals[counts[_B].to_numpy()] = counts["sum(n)"].to_numpy()
    base = np.concatenate([[0], np.cumsum(totals)[:-1]])
    T = int(totals.sum())

    # pass 2: per-bucket first-occurrence partials.  After the (hash, id)
    # doc sort the bucket's tokens are one contiguous global range
    # starting at base[bucket], so gpos is just base + flat index.
    def firsts_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        df = df.sort_values([_H, id_col], kind="mergesort")
        toks = pc.split_pattern(
            pa.array(df[text_col].to_numpy(), type=pa.large_string()),
            pattern=" ")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        if not len(flat):
            return pd.DataFrame({"tok": pd.Series(dtype=object),
                                 "fp": pd.Series(dtype="int64")})
        start = int(base[int(df[_B].iloc[0])])
        # vocabulary-level min: first occurrence of each distinct token
        # in the (already globally ordered) flat stream
        uniq, first_idx = np.unique(
            flat.to_numpy(zero_copy_only=False), return_index=True)
        # np.unique's return_index gives the FIRST index of each value
        return pd.DataFrame({"tok": uniq,
                             "fp": start + first_idx.astype(np.int64)})

    parts = (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby(_B)
        .map_groups(firsts_in_bucket, batch_format="pandas")
    )
    firsts = bucketed_aggregate(parts, ["tok"], {"fp": ("fp", "min")},
                                num_buckets=token_buckets)

    def to_hist(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": df["fp"].to_numpy() // K,
                             "one": np.ones(len(df), dtype=np.int64)})

    hist = bucketed_aggregate(
        firsts.map_batches(to_hist, batch_format="pandas"),
        ["b"], {"c": ("one", "sum")}, num_buckets=4,
    ).to_pandas()

    import ray.data

    n_cp = (T + K - 1) // K
    c = np.zeros(n_cp, dtype=np.int64)
    if len(hist) and n_cp:
        c[hist["b"].to_numpy(dtype=np.int64)] = hist["c"].to_numpy()
    return ray.data.from_arrow(pa.table({
        "tokens_seen": pa.array(
            np.minimum((np.arange(n_cp, dtype=np.int64) + 1) * K, T)),
        "n_types": pa.array(np.cumsum(c)),
    }))


def vocab_growth_sql(*, table: str = "documents", text: str = "text",
                     id_col: str = "doc_id", checkpoint: int = 10_000,
                     salt: str = "") -> str:
    K = int(checkpoint)
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH vg_d AS (
          SELECT {id_col} AS did, {toks} AS t FROM {table}
        ),
        vg_o AS (
          SELECT did, t,
                 coalesce(sum(len(t)) OVER (
                     ORDER BY md5_number_upper('{salt}' || did::VARCHAR),
                              did
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0)::BIGINT AS off
          FROM vg_d
        ),
        vg_toks AS (
          SELECT t[u.i] AS tok, off + u.i - 1 AS gpos
          FROM vg_o, unnest(generate_series(1, len(t))) AS u(i)
        ),
        vg_first AS (SELECT tok, min(gpos) AS fp FROM vg_toks GROUP BY 1),
        vg_hist AS (
          SELECT fp // {K} AS b, count(*)::BIGINT AS c
          FROM vg_first GROUP BY 1
        ),
        vg_total AS (
          SELECT coalesce(sum(len(t)), 0)::BIGINT AS tt FROM vg_d
        ),
        vg_grid AS (
          SELECT unnest(generate_series(
              0, (SELECT (tt + {K} - 1) // {K} FROM vg_total) - 1)) AS b
        )
        SELECT least((g.b + 1) * {K},
                     (SELECT tt FROM vg_total))::BIGINT AS tokens_seen,
               (sum(coalesce(h.c, 0)) OVER (
                   ORDER BY g.b ROWS UNBOUNDED PRECEDING))::BIGINT
                   AS n_types
        FROM vg_grid g LEFT JOIN vg_hist h ON h.b = g.b"""
