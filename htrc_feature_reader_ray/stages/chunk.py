"""Target-budget chunking — folding ordered units into ~equal-weight windows.

Reference analog: ``_chunking_algorithm`` + ``chunk_even``/``chunk_last``
(transformations.py:47-156) and ``Volume._chunked_tokenlist``
(feature_reader.py:735-770): consecutive ordered pages are folded into chunks
of roughly ``target`` words, the ``page`` level replaced by ``chunk``.

This engine uses a DIFFERENT, from-scratch algorithm designed for vectorized
execution and SQL checkability (the reference's two-pointer loop is inherently
sequential): chunk boundaries are the per-unit midpoints of the cumulative
weight mapped onto ``n = round(total/target)`` ideal equal cuts —

    n_chunks   = max(1, floor(total/target + 0.5))
    raw(i)     = min(n_chunks - 1, floor((cum_i - w_i/2) * n_chunks / total))
    chunk(i)   = dense_rank(raw(i))          (1-based, consecutive)

Preserved reference properties (tested, cf. test_chunking.py:29-77):
uniform units split perfectly; labels are monotone; every input terminates
(the assignment is closed-form — no loop); giant units get their own chunk; the
'last' greedy strategy fills each chunk to ``target`` before moving on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from htrc_feature_reader_ray.stages.partition import bucketed_map_groups


def chunk_labels_even(weights: np.ndarray, target: float) -> np.ndarray:
    """Balanced chunk labels (1-based) for one ordered weight array."""
    w = np.asarray(weights, dtype=np.float64)
    total = w.sum()
    if total <= 0:
        return np.ones(len(w), dtype=np.int64)
    n_chunks = max(1.0, np.floor(total / target + 0.5))
    cum = np.cumsum(w)
    raw = np.minimum(n_chunks - 1, np.floor((cum - w / 2.0) * n_chunks / total))
    return _dense_rank(raw)


def chunk_labels_last(weights: np.ndarray, target: float) -> np.ndarray:
    """Greedy chunk labels: fill to ``target``, overflow starts a new chunk
    (the reference's ``procrastinate`` strategy, transformations.py:47-48)."""
    w = np.asarray(weights, dtype=np.float64)
    cum_before = np.cumsum(w) - w
    raw = np.floor(cum_before / float(target))
    return _dense_rank(raw)


def chunk_labels_ends(weights: np.ndarray, target: float) -> np.ndarray:
    """Ends-absorb strategy (the reference's ``chunk_ends``,
    transformations.py:53-54): interior chunks are exactly ``target``-sized
    cuts; the total's overflow is split between the FIRST and LAST chunks by
    shifting the cut grid half the overflow inward."""
    w = np.asarray(weights, dtype=np.float64)
    total = w.sum()
    if total <= 0:
        return np.ones(len(w), dtype=np.int64)
    n_chunks = max(1.0, np.floor(total / target + 0.5))
    overflow = total - n_chunks * target
    shift = overflow / 2.0
    cum = np.cumsum(w)
    raw = np.floor((cum - w / 2.0 - shift) / float(target))
    raw = np.minimum(n_chunks - 1, np.maximum(0.0, raw))
    return _dense_rank(raw)


def _dense_rank(raw: np.ndarray) -> np.ndarray:
    _, inv = np.unique(raw, return_inverse=True)
    return (inv + 1).astype(np.int64)


def _reference_chunk_breaks(weights: np.ndarray, target: float, *,
                            even, two_sided: bool,
                            procrastinate: bool) -> np.ndarray:
    """Conformance mode: the reference's sequential two-pointer chunking
    (transformations.py:57-156), re-implemented from its documented
    semantics so migrating users get the reference's exact chunk boundaries.

    Loop invariant: the active window [lo, hi) of un-assigned units shrinks
    from both ends (or just the front when ``two_sided`` is False); each
    round cuts a chunk of ``target`` plus a share of the window's overflow
    (nearest-multiple signed remainder), with the even/'mids' variants
    spreading that overflow over the chunks still expected.

    Divergence from the reference (documented): where the reference would
    raise IndexError on a midpoint break landing past the array (a giant
    final page in the 1.5–2.5×target window), this guard simply stops.
    """
    w = np.asarray(weights, dtype=np.float64)
    n = len(w)
    breaks = np.zeros(n, dtype=np.int64)
    if n == 0:
        return breaks
    breaks[0] = 1
    lo, hi = 0, n
    loop = 0
    while True:
        loop += 1
        if loop > 10000:
            raise OverflowError("reference chunking failed to converge")
        if lo == hi:
            break
        seg = w[lo:hi]
        fwd = np.cumsum(seg)
        remaining = fwd[-1]
        if remaining < target * 1.5:
            break

        overflow = remaining % target
        if (target - overflow) < overflow:
            overflow = overflow - target
        if even is True or (even == "mids" and loop > 1):
            chunks_remaining = np.round(remaining / target)
            if two_sided and chunks_remaining > 2:
                overflow = overflow * 2 / chunks_remaining
            if not two_sided and chunks_remaining > 1:
                overflow = overflow / chunks_remaining
        loc_target = target + (overflow / 2 if two_sided else overflow)
        if procrastinate:
            loc_target = target

        if two_sided and remaining < target * 2.5:
            mid = int(np.argmin(np.abs(fwd - remaining / 2)))
            if lo + mid + 1 < n:
                breaks[lo + mid + 1] = 1
            break

        best_front = int(np.argmin(np.abs(fwd - loc_target)))
        lo = lo + best_front + 1
        if lo >= n:
            break
        breaks[lo] = 1
        if two_sided:
            bwd = np.cumsum(seg[::-1])
            best_back = int(np.argmin(np.abs(bwd - loc_target)))
            hi = hi - best_back - 1
            breaks[hi] = 1
            if lo > hi:
                # both ends claimed the same units (giant middle page);
                # collapse the window like the reference does
                hi = lo
    return np.cumsum(breaks)


def chunk_labels_reference(weights: np.ndarray, target: float,
                           variant: str = "even") -> np.ndarray:
    """Reference-exact labels, one ordered weight array. ``variant`` mirrors
    chunk_even / chunk_last / chunk_ends (transformations.py:47-54)."""
    params = {
        "even": dict(even=True, two_sided=True, procrastinate=False),
        "last": dict(even=False, two_sided=False, procrastinate=True),
        "ends": dict(even="mids", two_sided=True, procrastinate=False),
    }[variant]
    return _reference_chunk_breaks(weights, float(target), **params)


STRATEGIES = {
    "even": chunk_labels_even,
    "last": chunk_labels_last,
    "ends": chunk_labels_ends,
    "reference_even": lambda w, t: chunk_labels_reference(w, t, "even"),
    "reference_last": lambda w, t: chunk_labels_reference(w, t, "last"),
    "reference_ends": lambda w, t: chunk_labels_reference(w, t, "ends"),
}


def _labels_grouped(df: pd.DataFrame, key, weight_col, target, strategy) -> np.ndarray:
    """Vectorized chunk labels across ALL keys of a sorted frame at once
    (no per-key Python loop): per-key cumsum/total via groupby transforms."""
    w = df[weight_col].to_numpy(dtype=np.float64)
    g = df.groupby(key, sort=False)[weight_col]
    cum = g.cumsum().to_numpy(dtype=np.float64)
    total = g.transform("sum").to_numpy(dtype=np.float64)
    total = np.where(total <= 0, 1.0, total)
    if strategy == "even":
        n_chunks = np.maximum(1.0, np.floor(total / target + 0.5))
        raw = np.minimum(n_chunks - 1, np.floor((cum - w / 2.0) * n_chunks / total))
    elif strategy == "last":
        raw = np.floor((cum - w) / float(target))
    elif strategy == "ends":
        n_chunks = np.maximum(1.0, np.floor(total / target + 0.5))
        shift = (total - n_chunks * target) / 2.0
        raw = np.floor((cum - w / 2.0 - shift) / float(target))
        raw = np.minimum(n_chunks - 1, np.maximum(0.0, raw))
    elif strategy.startswith("reference"):
        # conformance mode (reference-exact boundaries): the two-pointer
        # algorithm is inherently sequential per entity, so fall back to a
        # per-key loop inside the bucket — use the closed-form strategies
        # for throughput at scale
        variant = strategy.split("_", 1)[1] if "_" in strategy else "even"
        labels = np.empty(len(df), dtype=np.int64)
        for _, idx in df.groupby(key, sort=False).indices.items():
            labels[idx] = chunk_labels_reference(w[idx], target, variant)
        return labels
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    # dense-rank raw within each key (raw is monotone within a key)
    chunk = (
        pd.Series(raw)
        .groupby(df[key].to_numpy(), sort=False)
        .rank(method="dense")
        .astype(np.int64)
        .to_numpy()
    )
    return chunk


def chunk_units(ds, *, key, order, weight_col, target, strategy: str = "even",
                tiebreak=None, num_buckets: int = 32, chunk_col: str = "chunk"):
    """Assign a ``chunk`` label to every row: per ``key``, rows ordered by
    ``order`` (+ ``tiebreak``) are folded into ~``target``-weight chunks.

    Order-sensitive per-entity op → runs on hash-bucketed sorted groups
    (partitioning assumption: all rows of a key share a bucket)."""
    sort_cols = [key, order] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        df[chunk_col] = _labels_grouped(df, key, weight_col, target, strategy)
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def chunked_tokenlist(tokens_ds, *, target, strategy: str = "even",
                      case: bool = True, pos: bool = False,
                      section: str = "group", page_ref: bool = False,
                      num_buckets: int = 32):
    """The reference's chunked tokenlist (feature_reader.py:735-770) at corpus
    scale: per url, snapshots (ordered by warc_ts) are folded into
    ~``target``-token chunks; the ``warc_ts`` level is replaced by ``chunk``.

    One co-partitioning shuffle (url buckets); inside each bucket everything
    is vectorized pandas: per-snapshot totals → chunk labels → label join →
    regroup on chunk. ``page_ref=True`` adds ``ts_start``/``ts_end`` per chunk
    (the pstart/pend analog, feature_reader.py:763-767).
    """
    token_col = "token" if case else "lowercase"

    def prefold(batch):
        """Map-side combiner BEFORE the bucket shuffle: filter/derive levels
        and partially fold the ones being dropped (section/pos/case), so the
        all-to-all exchange carries only the columns and cardinality the
        chunked output needs. Partial sums merge correctly in per_bucket."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if section in ("header", "body", "footer"):
            batch = batch.filter(pc.equal(batch.column("section"), section))
        if not case and "lowercase" not in batch.column_names:
            batch = batch.append_column(
                "lowercase", pc.utf8_lower(batch.column("token"))
            )
        keys = ["url", "warc_ts"]
        if section == "all" and "section" in batch.column_names:
            keys.append("section")
        keys.append(token_col)
        if pos:
            keys.append("pos")
        g = batch.group_by(keys).aggregate([("count", "sum")])
        return g.rename_columns(keys + ["count"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # per-snapshot weights, ordered
        wt = (
            df.groupby(["url", "warc_ts"], as_index=False)["count"]
            .sum()
            .sort_values(["url", "warc_ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        wt["chunk"] = _labels_grouped(wt, "url", "count", target, strategy)
        labels = wt[["url", "warc_ts", "chunk"]]
        joined = df.merge(labels, on=["url", "warc_ts"], how="left")
        keys = ["url", "chunk"]
        if section == "all" and "section" in joined.columns:
            keys.append("section")
        keys.append(token_col)
        if pos:
            keys.append("pos")
        out = joined.groupby(keys, as_index=False, sort=False)["count"].sum()
        if page_ref:
            bounds = wt.groupby(["url", "chunk"], as_index=False).agg(
                ts_start=("warc_ts", "min"), ts_end=("warc_ts", "max")
            )
            out = out.merge(bounds, on=["url", "chunk"], how="left")
        out["count"] = out["count"].astype(np.int64)
        return out

    prefolded = tokens_ds.map_batches(prefold, batch_format="pyarrow")
    return bucketed_map_groups(prefolded, "url", per_bucket, num_buckets=num_buckets)


def chunk_bounds(tokens_ds, *, target, strategy: str = "even",
                 section: str = "group", num_buckets: int = 32):
    """Per-chunk (url, chunk, ts_start, ts_end) — the pstart/pend table
    (feature_reader.py:763-767) WITHOUT the token columns.

    Emitted directly from the bucketed pass where each (url, chunk) group is
    complete by construction — never derived by per-batch dedup of the
    chunked tokenlist, whose blocks Ray may re-slice at larger scale
    (duplicate bounds rows). The shuffle carries only per-snapshot weight
    rows (map-side combined), not tokens."""

    def prefold(batch):
        import pyarrow.compute as pc

        if section in ("header", "body", "footer"):
            batch = batch.filter(pc.equal(batch.column("section"), section))
        g = batch.group_by(["url", "warc_ts"]).aggregate([("count", "sum")])
        return g.rename_columns(["url", "warc_ts", "count"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        wt = (
            df.groupby(["url", "warc_ts"], as_index=False)["count"]
            .sum()
            .sort_values(["url", "warc_ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        wt["chunk"] = _labels_grouped(wt, "url", "count", target, strategy)
        return wt.groupby(["url", "chunk"], as_index=False).agg(
            ts_start=("warc_ts", "min"), ts_end=("warc_ts", "max")
        )

    prefolded = tokens_ds.map_batches(prefold, batch_format="pyarrow")
    return bucketed_map_groups(prefolded, "url", per_bucket,
                               num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# sliding token-window text chunking (LLM context-window prep)


def token_windows(ds, *, width: int, stride: int | None = None,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Sliding token-window chunking: split each document into whitespace
    tokens (empties filtered, the engine-wide convention of
    textstats._tok_stats) and emit windows of ``width`` tokens every
    ``stride`` tokens — the standard LLM context-window prep. ``stride <
    width`` yields overlapping windows; default ``stride = width`` tiles.

    Window count per doc: ``(max(n - width, 0) + stride - 1) // stride + 1``
    for ``n > 0`` (the last window truncates at ``n``, so every token is
    covered and the final window starts before ``n``); empty docs emit
    nothing. Output: ``(id, window_id, start_tok, n_tok, window_text)``.

    Scale shape: one stateless ``map_batches`` — zero shuffle, each doc's
    windows are produced inside its own batch. The token split/offset math
    is vectorized Arrow/numpy; only the final per-window join is a
    C-level ``str.join`` over numpy slices (output-proportional work, same
    as any re-materialization of the window text).
    """
    if width <= 0 or (stride is not None and stride <= 0):
        raise ValueError(f"width/stride must be > 0, got {width}/{stride}")
    stride = width if stride is None else stride

    def fn(batch: pa.Table) -> pa.Table:
        from htrc_feature_reader_ray.stages.textstats import _tok_stats

        flat, parent, n = _tok_stats(batch, text_col)
        ntok = np.bincount(parent, minlength=n).astype(np.int64)
        nw = np.where(
            ntok > 0,
            (np.maximum(ntok - width, 0) + stride - 1) // stride + 1,
            0,
        ).astype(np.int64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), nw)
        total = int(nw.sum())
        offs = np.concatenate([[0], np.cumsum(nw)[:-1]]) if n else np.zeros(0, np.int64)
        win_id = (np.arange(total, dtype=np.int64)
                  - (offs[doc_idx] if total else np.zeros(0, np.int64)))
        start = win_id * stride
        end = np.minimum(start + width, ntok[doc_idx])
        tok_off = (np.concatenate([[0], np.cumsum(ntok)[:-1]])
                   if n else np.zeros(0, np.int64))
        a = tok_off[doc_idx] + start
        b = tok_off[doc_idx] + end
        toks = np.asarray(flat.to_pylist(), dtype=object)
        texts = [" ".join(toks[x:y]) for x, y in zip(a, b)]
        ids = batch.column(id_col).take(pa.array(doc_idx, type=pa.int64()))
        return pa.table({
            id_col: ids,
            "window_id": pa.array(win_id, type=pa.int64()),
            "start_tok": pa.array(start, type=pa.int64()),
            "n_tok": pa.array(end - start, type=pa.int64()),
            "window_text": pa.array(texts, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def token_windows_sql(*, width: int, stride: int | None = None,
                      text_col: str = "text", id_col: str = "doc_id",
                      table: str = "documents") -> str:
    """SQL mirror of :func:`token_windows` (1-based inclusive DuckDB list
    slices; identical integer window-count formula)."""
    stride = width if stride is None else stride
    return f"""
        WITH base AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '), x -> x <> '') AS arr
          FROM {table}
        ), s AS (
          SELECT {id_col}, arr, len(arr)::BIGINT AS n,
                 CASE WHEN len(arr) = 0 THEN 0
                      ELSE (greatest(len(arr) - {width}, 0) + {stride} - 1)
                           // {stride} + 1
                 END AS nw
          FROM base
        )
        SELECT {id_col}, w::BIGINT AS window_id,
               (w * {stride})::BIGINT AS start_tok,
               (least(w * {stride} + {width}, n) - w * {stride})::BIGINT
                   AS n_tok,
               array_to_string(
                   arr[(w * {stride} + 1)::INT
                       : least(w * {stride} + {width}, n)::INT], ' ')
                   AS window_text
        FROM s, LATERAL unnest(range(0, nw)) AS t(w)"""
