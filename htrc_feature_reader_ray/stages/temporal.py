"""Point-in-time operators: as-of join, lag/lead, sessionize, windows,
backfill — the north-rule generalization of the reference's ordered-page
machinery (chunk-label join feature_reader.py:755-756; page ordering
parsers.py:379-381).

Watermark invariant (structural, not by convention): a backward as-of join can
only consume right-side rows with ``ts_right <= ts_left`` because
``pd.merge_asof`` enforces it per row; every join emits a ``matched_ts``
column so zero-temporal-leakage is auditable (``audit_no_leakage``).

Two physical strategies per SURVEY §2.6:
  * broadcast (small right side): ``ray.put`` the sorted right table once; a
    stateless ``map_batches`` merges each left batch against it — NO shuffle
    on the big side.
  * partitioned (both sides large): tag + schema-align + union both sides,
    hash-bucket on the key, and sort-merge inside ``map_groups`` per bucket —
    ONE co-partitioning shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from htrc_feature_reader_ray.errors import require_columns
from htrc_feature_reader_ray.stages.partition import arrow_type, bucketed_map_groups

_SIDE = "_side"


def _to_timedelta(tolerance):
    if tolerance is None:
        return None
    return pd.Timedelta(tolerance)


def audit_no_leakage(df: pd.DataFrame, *, ts: str, matched_ts: str = "matched_ts",
                     direction: str = "backward") -> None:
    """Raise AssertionError if any joined feature violates the watermark:
    backward joins must never read a timestamp after the as-of point."""
    m = df[matched_ts].notna()
    if direction == "backward":
        bad = (df.loc[m, matched_ts] > df.loc[m, ts]).sum()
    else:
        bad = (df.loc[m, matched_ts] < df.loc[m, ts]).sum()
    if bad:
        raise AssertionError(f"temporal leakage: {bad} rows read across the as-of point")


def _key_list(on) -> list:
    return [on] if isinstance(on, str) else list(on)


def _merge_asof(left: pd.DataFrame, right: pd.DataFrame, *, on, ts,
                direction, tolerance) -> pd.DataFrame:
    left_sorted = left.sort_values(ts, kind="mergesort")
    out = pd.merge_asof(
        left_sorted,
        right,
        on=ts,
        by=_key_list(on),  # composite as-of keys supported
        direction=direction,
        tolerance=_to_timedelta(tolerance),
        allow_exact_matches=True,
    )
    return out


def broadcast_asof_join(left_ds, right_df: pd.DataFrame, *, on, ts,
                        direction: str = "backward", tolerance=None,
                        keep_matched_ts: bool = True):
    """As-of join with a SMALL right side (dimension/feature table).

    ``right_df`` must be unique per (on, ts) — dedupe upstream with
    :func:`latest_per_key_ts`. It is sorted once and placed in the object
    store (``ray.put``); every map task reads it zero-copy. The left Dataset
    streams through unshuffled.
    """
    right = right_df.sort_values(ts, kind="mergesort").reset_index(drop=True)
    if keep_matched_ts:
        right = right.assign(matched_ts=right[ts])
    right_ref = ray.put(right)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(right_ref)
        return _merge_asof(batch, r, on=on, ts=ts,
                           direction=direction, tolerance=tolerance)

    return left_ds.map_batches(join, batch_format="pandas")


def partitioned_asof_join(left_ds, right_ds, *, on, ts,
                          direction: str = "backward", tolerance=None,
                          num_buckets: int = 32,
                          keep_matched_ts: bool = True):
    """As-of join with BOTH sides large: tag + union + hash-bucket co-shuffle
    + per-bucket sort-merge (`pd.merge_asof` with ``by=on``).

    The streaming sort-merge as-of join of the north rule: within a bucket
    both sides are sorted by ts and merged in one pass; buckets co-locate all
    rows of each key.
    """
    keys = _key_list(on)
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_names = list(l_schema.names)
    r_value_cols = [c for c in r_schema.names if c not in (*keys, ts)]
    overlap = set(r_value_cols) & set(l_names)
    if overlap:
        raise ValueError(f"right-side columns clash with left: {sorted(overlap)}")

    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    all_types = {n: arrow_type(t) for n, t in {**r_types, **l_types}.items()}
    all_cols = l_names + r_value_cols  # unioned layout

    def align(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    cols[c] = batch.column(c)
                else:
                    typ = r_types.get(c) or l_types.get(c)
                    cols[c] = pa.nulls(n, type=typ)
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    unioned = left_ds.map_batches(align(0), batch_format="pyarrow").union(
        right_ds.map_batches(align(1), batch_format="pyarrow")
    )

    def _restore_ints(frame: pd.DataFrame, names) -> pd.DataFrame:
        # the tag+union null-pads each side's missing columns, turning pandas
        # int columns float64 (silently corrupting ids >= 2^53); once the
        # sides are split the pads are gone, so cast back (same pattern as
        # partition.bucket_join._restore_ints)
        for c in names:
            t = all_types.get(c)
            if (
                isinstance(t, pa.DataType)
                and pa.types.is_integer(t)
                and frame[c].notna().all()
            ):
                frame[c] = frame[c].astype("int64")
        return frame

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = _restore_ints(df[df[_SIDE] == 0][l_names].copy(), l_names)
        right = df[df[_SIDE] == 1][keys + [ts] + r_value_cols].sort_values(
            ts, kind="mergesort"
        )
        right = _restore_ints(right.copy(), keys + r_value_cols)
        if keep_matched_ts:
            right = right.assign(matched_ts=right[ts])
        return _merge_asof(left, right, on=on, ts=ts,
                           direction=direction, tolerance=tolerance)

    # co-partitioning on the FIRST key suffices: every row of a composite
    # key shares that key's bucket
    return bucketed_map_groups(unioned, keys[0], per_bucket,
                               num_buckets=num_buckets)


def interval_join(left_ds, right_ds, *, on, ts: str, start: str, end: str,
                  how: str = "inner", num_buckets: int = 32):
    """Equi-key RANGE join: each left point row (key, ts) matches every
    right interval row (key, start, end) with ``start <= ts <= end``
    (closed bounds). Output multiplicity = number of containing intervals;
    ``how='left'`` keeps unmatched points with null interval columns.

    Physical plan: tag + schema-align + union both sides, ONE hash-bucket
    co-partitioning shuffle on the key, then a vectorized key-equi merge +
    BETWEEN mask per bucket. Partitioning assumption (same contract as the
    other bucketed ops): all rows of one key fit a worker's heap — interval
    sides are typically few-per-key (session spans, campaign windows); a
    key × interval blow-up is the semantic output size, not a plan defect.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join how={how!r}")
    keys = _key_list(on)
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_names = list(l_schema.names)
    r_carry = [c for c in r_schema.names if c not in keys]
    overlap = set(r_carry) & set(l_names)
    if overlap:
        raise ValueError(f"right-side columns clash with left: {sorted(overlap)}")
    for c in (start, end):
        if c not in r_carry:
            raise ValueError(f"right side lacks interval column {c!r}")

    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    all_types = {n: arrow_type(t) for n, t in {**r_types, **l_types}.items()}
    all_cols = l_names + r_carry

    def align(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    cols[c] = batch.column(c)
                else:
                    cols[c] = pa.nulls(n, type=all_types[c])
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    unioned = left_ds.map_batches(align(0), batch_format="pyarrow").union(
        right_ds.map_batches(align(1), batch_format="pyarrow")
    )

    def _restore_ints(frame: pd.DataFrame, names) -> pd.DataFrame:
        for c in names:
            t = all_types.get(c)
            if (
                isinstance(t, pa.DataType)
                and pa.types.is_integer(t)
                and frame[c].notna().all()
            ):
                frame[c] = frame[c].astype("int64")
        return frame

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = _restore_ints(df[df[_SIDE] == 0][l_names].copy(), l_names)
        right = _restore_ints(
            df[df[_SIDE] == 1][keys + r_carry].copy(), keys + r_carry
        )
        merged = left.merge(right, on=keys, how="inner")
        mask = (merged[start] <= merged[ts]) & (merged[ts] <= merged[end])
        hits = merged[mask]
        if how == "left":
            l_index = pd.MultiIndex.from_frame(left[keys + [ts]])
            h_index = pd.MultiIndex.from_frame(hits[keys + [ts]])
            missed = left[~l_index.isin(h_index)]
            hits = pd.concat([hits, missed], ignore_index=True)
        return hits

    return bucketed_map_groups(unioned, keys[0], per_bucket,
                               num_buckets=num_buckets)


def mark_late_events(ds, *, key, ts: str, delay, flag_col: str = "is_late"):
    """Watermark-based late-event flagging (batch replay of the streaming
    semantics): an event is late iff ``ts < watermark(key) - delay`` where
    the watermark is the key's maximum observed event time.

    Two passes, no shuffle of the big side: per-batch (key, max ts)
    partials (key-space sized — tiny vs the events) fold on the driver and
    broadcast via ``ray.put``; the flag pass is a stateless 1:1
    ``map_batches``. ``flag_col`` is int64 0/1 (SQL-hashable). Downstream:
    filter on the flag to drop/divert late arrivals; the lineage manifests
    already persist per-partition watermark ranges (state/lineage.py)."""
    delay_td = pd.Timedelta(delay)

    def partial_max(batch: pa.Table) -> pa.Table:
        t = batch.select([key, ts])
        return t.group_by(key).aggregate([(ts, "max")])

    partials = ds.map_batches(partial_max, batch_format="pyarrow").to_pandas()
    if partials.empty:
        watermarks = {}
    else:
        watermarks = partials.groupby(key)[f"{ts}_max"].max().to_dict()
    wm_ref = ray.put(watermarks)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        wm = ray.get(wm_ref)
        if df.empty:
            df[flag_col] = pd.Series(dtype="int64")
            return df
        cutoff = df[key].map(wm) - delay_td
        df = df.copy()
        df[flag_col] = (df[ts] < cutoff).astype(np.int64)
        return df

    return ds.map_batches(flag, batch_format="pandas")


def latest_per_key_ts(df: pd.DataFrame, *, on, ts, tiebreak) -> pd.DataFrame:
    """Dedupe a feature table to one row per (key, ts), keeping the row with
    the greatest ``tiebreak`` — the deterministic contract required by as-of
    right sides."""
    keys = _key_list(on)
    return (
        df.sort_values(keys + [ts, tiebreak], kind="mergesort")
        .groupby(keys + [ts], as_index=False)
        .tail(1)
        .reset_index(drop=True)
    )


def lag_lead(ds, *, key, ts, cols, n: int = 1, tiebreak=None,
             num_buckets: int = 32):
    """Per-key lag/lead of ``cols`` by ``n`` rows in ts order (ties broken by
    ``tiebreak``) — per-partition ring-buffer semantics done as vectorized
    ``groupby(key).shift`` inside hash buckets. Adds ``lag_<col>``/
    ``lead_<col>`` columns."""
    require_columns(ds.schema().names, [key, ts] + list(cols), op="lag_lead")
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        g = df.groupby(key, sort=False)
        for c in cols:
            df[f"lag_{c}"] = g[c].shift(n)
            df[f"lead_{c}"] = g[c].shift(-n)
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def _block_key(row, key, ts, tiebreak):
    """Unique identity of a sorted block = its first row's full sort key."""
    return (row[key], row[ts], row[tiebreak] if tiebreak else 0)


def lag_lead_sorted(ds, *, key, ts, cols, n: int = 1, tiebreak=None):
    """Hot-key-safe lag/lead (any ``n``) over sorted range partitions — the
    split-merge sibling of :func:`sessionize_sorted`: per-block vectorized
    shifts, plus a boundary exchange of each block's first/last ``n`` rows so
    rows near block edges read across block boundaries.

    Soundness of the edge capture: a row NOT captured (the middle of a
    block longer than 2n) is followed by at least ``n`` same-block rows, so
    it can never be within ``n`` positions of another block's row — the
    captured edges are exactly the cross-block-visible rows."""
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])
    sorted_ds = ds.sort(sort_cols).materialize()
    edge_cols = [key] + [c for c in cols if c != key]

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        cols_out = ["bkey", "pos"] + edge_cols
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols_out})
        bkey = _block_key(df.iloc[0], key, ts, tiebreak)
        if len(df) <= 2 * n:
            part = df[edge_cols].copy()
            part["pos"] = np.arange(len(df))
        else:
            head = df[edge_cols].head(n).copy()
            head["pos"] = np.arange(n)
            tail = df[edge_cols].tail(n).copy()
            tail["pos"] = np.arange(len(df) - n, len(df))
            part = pd.concat([head, tail], ignore_index=True)
        part["bkey"] = [bkey] * len(part)
        part["bkey"] = part["bkey"].astype(object)
        return part[cols_out]

    summaries = sorted_ds.map_batches(
        edges, batch_format="pandas", batch_size=None
    ).to_pandas()
    block_keys = sorted(summaries["bkey"].unique())
    order_of = {b: i for i, b in enumerate(block_keys)}
    summaries["_ord"] = summaries["bkey"].map(order_of)
    summaries = summaries.sort_values(["_ord", "pos"], kind="mergesort")

    # per block: the n same-key rows immediately before its first row (lag
    # context) and after its last row (lead context), drawn from other
    # blocks' captured edges
    prev_ctx: dict = {}
    next_ctx: dict = {}
    for b in block_keys:
        i = order_of[b]
        mine = summaries[summaries["_ord"] == i]
        first_key = mine.iloc[0][key]
        last_key = mine.iloc[-1][key]
        before = summaries[
            (summaries["_ord"] < i) & (summaries[key] == first_key)
        ].tail(n)
        after = summaries[
            (summaries["_ord"] > i) & (summaries[key] == last_key)
        ].head(n)
        if len(before):
            prev_ctx[b] = before[edge_cols].to_dict("records")
        if len(after):
            next_ctx[b] = after[edge_cols].to_dict("records")
    ref = ray.put((prev_ctx, next_ctx))

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            for c in cols:
                df[f"lag_{c}"] = pd.Series(dtype="float64")
                df[f"lead_{c}"] = pd.Series(dtype="float64")
            return df
        pm, nm = ray.get(ref)
        bkey = _block_key(df.iloc[0], key, ts, tiebreak)
        prev_df = pd.DataFrame(pm.get(bkey, []), columns=edge_cols)
        next_df = pd.DataFrame(nm.get(bkey, []), columns=edge_cols)
        work = pd.concat(
            [prev_df, df[edge_cols], next_df], ignore_index=True
        )
        g = work.groupby(key, sort=False)
        lo, hi = len(prev_df), len(prev_df) + len(df)
        out = df.copy()
        for c in cols:
            out[f"lag_{c}"] = (
                g[c].shift(n).iloc[lo:hi].reset_index(drop=True).to_numpy()
            )
            out[f"lead_{c}"] = (
                g[c].shift(-n).iloc[lo:hi].reset_index(drop=True).to_numpy()
            )
        return out

    return sorted_ds.map_batches(apply, batch_format="pandas", batch_size=None)


def sessionize(ds, *, key, ts, gap, tiebreak=None, num_buckets: int = 32,
               aggregate: bool = False, count_col: str = "n_events"):
    """Gap-based sessionization: a new session starts when the time since the
    previous event of the same key exceeds ``gap``. The web-scale analog of
    the reference's page chunking (SURVEY §2.4): order-sensitive, per-entity,
    run inside hash-bucketed sorted groups.

    Adds ``session_id`` (1-based per key). With ``aggregate=True`` returns
    one row per session: key, session_id, n_events, ts_start, ts_end — the
    pstart/pend analog (feature_reader.py:763-767).
    """
    gap_td = pd.Timedelta(gap)
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        prev = df.groupby(key, sort=False)[ts].shift(1)
        new_sess = (df[ts] - prev > gap_td) | prev.isna()
        df["session_id"] = new_sess.groupby(df[key]).cumsum().astype(np.int64)
        if not aggregate:
            return df
        agg = df.groupby([key, "session_id"], sort=False).agg(
            **{
                count_col: (ts, "size"),
                "ts_start": (ts, "min"),
                "ts_end": (ts, "max"),
            }
        )
        agg[count_col] = agg[count_col].astype(np.int64)
        return agg.reset_index()

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def sessionize_sorted(ds, *, key, ts, gap, tiebreak=None):
    """Split-merge sessionization over a GLOBALLY SORTED dataset — the
    hot-key-safe variant (north rule: per-key split-merge): no key's rows
    ever need to be co-resident in one worker.

    Plan (sort → local pass → tiny driver merge → broadcast fix-up):
      1. ``ds.sort([key, ts])`` range-partitions the stream; each block is a
         contiguous (key, ts) run, so a key may SPAN blocks.
      2. Pass 1 (per block): local session labels + a boundary summary
         (first/last key+ts, local session count), keyed by the block's
         first row (unique given the sort).
      3. Driver: order the (tiny, one-per-block) summaries, decide for each
         block a session-id offset and whether its first local session
         continues the previous block's last session (same key and gap not
         exceeded across the boundary).
      4. Pass 2 (per block): relabel ``session_id`` with the broadcast
         offsets. Row order/partitioning untouched.

    Session ids are globally consecutive per key (1-based), identical to
    :func:`sessionize`.
    """
    gap_td = pd.Timedelta(gap)
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])
    sorted_ds = ds.sort(sort_cols).materialize()

    def local_pass(df: pd.DataFrame) -> pd.DataFrame:
        """Per-key 1-based local session ids within one sorted block."""
        prev_key = df[key].shift(1)
        prev_ts = df[ts].shift(1)
        new_sess = (df[key] != prev_key) | (df[ts] - prev_ts > gap_td)
        run = new_sess.cumsum()
        df = df.copy()
        base = run.groupby(df[key].to_numpy(), sort=False).transform("min")
        df["session_id"] = (run - base + 1).astype(np.int64)
        return df

    def summary_pass(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in (
                    ("first_key", object), ("first_ts", "datetime64[us]"),
                    ("first_tie", object),
                    ("last_key", object), ("last_ts", "datetime64[us]"),
                    ("first_key_sessions", "int64"),
                    ("last_key_sessions", "int64"),
                )}
            )
        d = local_pass(df)
        first, last = d.iloc[0], d.iloc[-1]
        return pd.DataFrame(
            {
                "first_key": [first[key]],
                "first_ts": [first[ts]],
                "first_tie": [first[tiebreak] if tiebreak else 0],
                "last_key": [last[key]],
                "last_ts": [last[ts]],
                "first_key_sessions": [
                    int(d.loc[d[key] == first[key], "session_id"].max())
                ],
                "last_key_sessions": [
                    int(d.loc[d[key] == last[key], "session_id"].max())
                ],
            }
        )

    summaries = (
        sorted_ds.map_batches(summary_pass, batch_format="pandas",
                              batch_size=None)
        .to_pandas()
        .sort_values(["first_key", "first_ts", "first_tie"], kind="mergesort")
        .reset_index(drop=True)
    )

    # Driver-side stitch over the tiny one-row-per-block summaries. Only the
    # boundary key can span adjacent blocks in a sorted dataset, so a single
    # (carry_key, carry_sessions, carry_last_ts) state suffices. off(block) is
    # added to the session ids of the block's FIRST key: previous blocks'
    # session count for that key, minus 1 when the boundary gap is within
    # ``gap`` (the two local sessions are one session).
    offsets: dict = {}
    carry_key = None
    carry_sessions = 0
    carry_last_ts = None
    for _, row in summaries.iterrows():
        bkey = (row["first_key"], row["first_ts"], row["first_tie"])
        if row["first_key"] == carry_key:
            cont = (row["first_ts"] - carry_last_ts) <= gap_td
            off = carry_sessions - (1 if cont else 0)
        else:
            off = 0
        offsets[bkey] = off
        if row["last_key"] == row["first_key"]:
            carry_sessions = off + int(row["first_key_sessions"])
        else:
            carry_sessions = int(row["last_key_sessions"])
        carry_key = row["last_key"]
        carry_last_ts = row["last_ts"]

    off_ref = ray.put(offsets)

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(session_id=pd.Series(dtype="int64"))
        offs = ray.get(off_ref)
        d = local_pass(df)
        off = offs.get(_block_key(d.iloc[0], key, ts, tiebreak), 0)
        if off:
            mask = d[key] == d.iloc[0][key]
            d.loc[mask, "session_id"] = d.loc[mask, "session_id"] + off
        return d

    return sorted_ds.map_batches(relabel, batch_format="pandas",
                                 batch_size=None)


def tumbling_window(ds, *, key, ts, width, sum_cols=(), count_col: str = "n_events"):
    """Fixed-width event-time windows with exact (integer) aggregates.

    window_start = floor(epoch_us(ts) / width) * width — pure integer
    arithmetic, so results are bit-exact and shuffle input is pre-aggregated
    per batch (partial combine) before the small global groupby.
    """
    width_us = int(pd.Timedelta(width).value // 1000)

    def partial(batch: pa.Table) -> pa.Table:
        epoch = batch.column(ts).cast(pa.int64()).to_numpy()
        w = (epoch // width_us) * width_us
        t = batch.append_column(
            "window_start", pa.array(w, type=pa.int64()).cast(pa.timestamp("us"))
        )
        aggs = [([], "count_all")] + [(c, "sum") for c in sum_cols]
        g = t.group_by([key, "window_start"]).aggregate(aggs)
        names = [key, "window_start", count_col] + [f"{c}" for c in sum_cols]
        return g.rename_columns(names)

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # (key, window) cardinality grows with keys x time — bucketed
    # vectorized merge, not the per-group-Python native aggregate
    spec = {count_col: (count_col, "sum")}
    spec.update({c: (c, "sum") for c in sum_cols})
    out = bucketed_aggregate(partials, [key, "window_start"], spec,
                             num_buckets=32)

    def fix_ts_unit(batch: pa.Table) -> pa.Table:
        # the int64->timestamp(us) cast round-trips to seconds precision
        # through the global groupby key; restore the engine-wide
        # timestamp[us] contract
        i = batch.schema.get_field_index("window_start")
        return batch.set_column(
            i, "window_start", batch.column(i).cast(pa.timestamp("us"))
        )

    return out.map_batches(fix_ts_unit, batch_format="pyarrow")


def rolling_key_features(ds, *, key, ts, value_col, window: int,
                         tiebreak=None, num_buckets: int = 32):
    """Per-key ordered feature battery in ONE bucketed pass — the windowed
    feature vectors of the north rule as row-window aggregates:

      * ``cum_<v>``  — running total (ROWS UNBOUNDED PRECEDING)
      * ``roll_<v>`` — rolling sum over the last ``window`` rows
      * ``rn``       — 1-based row number within the key
      * ``pct_rank`` — SQL ``percent_rank()`` over ``value_col`` within the
        key: (rank-1)/(n-1), 0.0 for single-row keys — exact (one IEEE
        division of integers, identical cross-engine)

    Integer inputs stay integer (cum/roll are int64) so every output is
    oracle-exact. Watermark-safe by construction: every feature reads only
    rows at or before its own position in ts order."""
    require_columns(ds.schema().names, [key, ts, value_col],
                    op="rolling_key_features")
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        g = df.groupby(key, sort=False)
        v = df[value_col]
        df[f"cum_{value_col}"] = g[value_col].cumsum().astype(np.int64)
        df[f"roll_{value_col}"] = (
            g[value_col]
            .rolling(window, min_periods=1)
            .sum()
            .reset_index(drop=True)
            .astype(np.int64)
        )
        df["rn"] = (g.cumcount() + 1).astype(np.int64)
        # percent_rank: (rank-1)/(n-1) with rank = COUNT of strictly smaller
        # values + 1 (ties share the min rank, like SQL RANK())
        rank = g[value_col].rank(method="min")
        n = g[value_col].transform("size")
        denom = (n - 1).to_numpy()
        pr = np.where(denom > 0, (rank.to_numpy() - 1) / denom, 0.0)
        df["pct_rank"] = pr
        _ = v
        return df

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def hopping_window(ds, *, key, ts, width, slide, sum_cols=(),
                   count_col: str = "n_events"):
    """Hopping (sliding) event-time windows: width ``width``, advancing by
    ``slide`` — each event lands in ``width/slide`` overlapping windows.

    Same exact-integer shape as :func:`tumbling_window`: the per-batch
    partial EXPLODES each row into its member windows and pre-aggregates
    (combiner), so the shuffle carries per-(key, window) partials — the
    explode factor never crosses the exchange unaggregated. window_start is
    the window's inclusive start; an event at t belongs to windows
    floor((t - width + slide) / slide) … floor(t / slide) (clamped)."""
    width_us = int(pd.Timedelta(width).value // 1000)
    slide_us = int(pd.Timedelta(slide).value // 1000)
    if width_us % slide_us != 0:
        raise ValueError("width must be a multiple of slide")
    k = width_us // slide_us  # windows per event

    def partial(batch: pa.Table) -> pa.Table:
        epoch = batch.column(ts).cast(pa.int64()).to_numpy()
        n = len(epoch)
        # member window starts: last is floor(t/slide)*slide; the k-1
        # earlier ones step back by slide. Membership is total by
        # construction: t >= last - j*slide for j >= 0, and
        # t < start_j + width iff (j+1)*slide <= width, true for every
        # j <= k-1 given width == k*slide — no mask needed.
        last = (epoch // slide_us) * slide_us
        starts = last[:, None] - np.arange(k)[None, :] * slide_us  # (n, k)
        take = np.repeat(np.arange(n), k)
        w = starts.reshape(-1)
        t = batch.take(pa.array(take)).append_column(
            "window_start",
            pa.array(w, type=pa.int64()).cast(pa.timestamp("us")),
        )
        aggs = [([], "count_all")] + [(c, "sum") for c in sum_cols]
        g = t.group_by([key, "window_start"]).aggregate(aggs)
        return g.rename_columns(
            [key, "window_start", count_col] + list(sum_cols)
        )

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    partials = ds.map_batches(partial, batch_format="pyarrow")
    spec = {count_col: (count_col, "sum")}
    spec.update({c: (c, "sum") for c in sum_cols})
    out = bucketed_aggregate(partials, [key, "window_start"], spec,
                             num_buckets=32)

    def fix_ts_unit(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("window_start")
        return batch.set_column(
            i, "window_start", batch.column(i).cast(pa.timestamp("us"))
        )

    return out.map_batches(fix_ts_unit, batch_format="pyarrow")


def make_time_grid(keys, *, start, end, step, key_col: str = "user_id",
                   ts_col: str = "ts") -> pd.DataFrame:
    """Deterministic (key × timestamp) grid for backfill: every key at every
    step in [start, end]. Column names follow ``key_col``/``ts_col`` so the
    grid composes with any as-of key."""
    ts = pd.date_range(start=start, end=end, freq=step).values.astype(
        "datetime64[us]"
    )  # µs — the engine-wide timestamp unit (matches parquet/DuckDB)
    keys = list(keys)
    return pd.DataFrame(
        {
            key_col: np.repeat(np.asarray(keys), len(ts)),
            ts_col: np.tile(ts, len(keys)),
        }
    )


def backfill(grid_ds, features_df: pd.DataFrame, *, on, ts,
             tolerance=None):
    """Point-in-time backfill: for every (key, grid ts) take the latest
    feature value with ``feature_ts <= grid_ts`` (within ``tolerance``), never
    a future value — strict watermark enforcement by construction
    (backward as-of)."""
    return broadcast_asof_join(
        grid_ds, features_df, on=on, ts=ts,
        direction="backward", tolerance=tolerance,
    )


def rolling_time_aggregate(ds, *, key, ts, value_col, window,
                           num_buckets: int = 32):
    """Per-key rolling TIME-RANGE aggregate: for every row, the exact
    sum/count/mean of ``value_col`` over the key's rows with
    ``ts ∈ [row.ts − window, row.ts]`` — SQL's
    ``RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT ROW`` (peer rows
    at the same ts are all included; the frame is a pure function of ts, so
    results are order-independent under ties). Complements the ROW-window
    battery of :func:`rolling_key_features`.

    One bucketed pass, fully vectorized ACROSS keys (no per-key Python
    loop): each key's epoch-µs axis is shifted onto a disjoint global axis
    (consecutive keys separated by > window), so frame bounds for every row
    of every key come from two global ``searchsorted`` calls and the sums
    from one prefix-sum difference. Integer sums stay int64 (exact);
    ``rmean`` is one IEEE division (sum→double / count), mirroring SQL.

    Output: all input columns + ``rsum_<v>``, ``rcnt_<v>``, ``rmean_<v>``.
    """
    require_columns(ds.schema().names, [key, ts, value_col],
                    op="rolling_time_aggregate")
    window_us = int(pd.Timedelta(window).value // 1000)
    rsum, rcnt, rmean = (f"{p}_{value_col}" for p in ("rsum", "rcnt", "rmean"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df[rsum] = np.zeros(0, np.int64)
            df[rcnt] = np.zeros(0, np.int64)
            df[rmean] = np.zeros(0, np.float64)
            return df
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes, _ = pd.factorize(df[key], sort=False)
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = codes[1:] != codes[:-1]
        gidx = np.cumsum(newg) - 1
        gs = np.flatnonzero(newg)          # group start indices
        ge = np.append(gs[1:], n)          # group end (exclusive)
        gmin = t[gs]
        step = (t[ge - 1] - gmin) + window_us + 1
        v = df[value_col].to_numpy(dtype=np.int64)
        cs = np.concatenate([[0], np.cumsum(v)])
        if float(step.sum(dtype=np.float64)) > 9e18:
            # pathological spans × groups would overflow the disjoint axis:
            # per-group searchsorted fallback (still vectorized per group)
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            for g0, g1 in zip(gs, ge):
                seg = t[g0:g1]
                lo[g0:g1] = g0 + np.searchsorted(seg, seg - window_us, "left")
                hi[g0:g1] = g0 + np.searchsorted(seg, seg, "right")
        else:
            base = np.concatenate([[0], np.cumsum(step)[:-1]])
            u = t - gmin[gidx] + base[gidx]
            lo = np.searchsorted(u, u - window_us, "left")
            hi = np.searchsorted(u, u, "right")
        df[rsum] = (cs[hi] - cs[lo]).astype(np.int64)
        df[rcnt] = (hi - lo).astype(np.int64)
        df[rmean] = (cs[hi] - cs[lo]).astype(np.float64) / (hi - lo)
        return df

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def snapshot_change(ds, *, key: str = "url", ts: str = "warc_ts",
                    text_col: str = "text", num_buckets: int = 32):
    """Re-crawl change detection: for every snapshot of a key, the distinct-
    token overlap against the key's PREVIOUS snapshot in ts order —

      * ``jaccard``   — |A∩B| / |A∪B| of the two distinct-token sets
      * ``n_added``   — tokens in this snapshot absent from the previous
      * ``n_removed`` — tokens of the previous snapshot now gone

    (NULL/NaN on each key's first snapshot, and on a 0∪0 pair.) The signal
    web pipelines use to decide whether a re-crawl is a near-identical
    re-fetch (keep latest only) or real content drift (keep both).

    One bucketed pass; inside a bucket everything is vectorized pandas —
    token sets via split+explode+drop_duplicates, the consecutive-snapshot
    intersection via ONE self-merge of the exploded table against itself
    shifted by one snapshot ordinal (no per-row Python set work). Integer
    numerators; jaccard is a single IEEE int/int division (SQL-mirrored).
    Snapshot timestamps must be unique per key (re-crawl semantics); ties
    would make the previous-snapshot ordering undefined.
    """
    require_columns(ds.schema().names, [key, ts, text_col],
                    op="snapshot_change")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts], kind="mergesort").reset_index(drop=True)
        df["_r"] = df.groupby(key, sort=False).cumcount()
        tok = df[[key, "_r", text_col]].copy()
        tok["token"] = tok[text_col].str.split(" ")
        tok = tok.drop(columns=[text_col]).explode("token")
        tok = tok[tok["token"].notna() & (tok["token"] != "")]
        tok = tok.drop_duplicates([key, "_r", "token"])
        sizes = tok.groupby([key, "_r"], sort=False).size()
        prev = tok.copy()
        prev["_r"] = prev["_r"] + 1
        inter = prev.merge(tok, on=[key, "_r", "token"]).groupby(
            [key, "_r"], sort=False
        ).size()
        idx = pd.MultiIndex.from_arrays([df[key], df["_r"]])
        pidx = pd.MultiIndex.from_arrays([df[key], df["_r"] - 1])
        nA = sizes.reindex(idx).fillna(0).to_numpy(dtype=np.int64)
        nB = sizes.reindex(pidx).fillna(0).to_numpy(dtype=np.int64)
        ni = inter.reindex(idx).fillna(0).to_numpy(dtype=np.int64)
        first = df["_r"].to_numpy() == 0
        union = nA + nB - ni
        invalid = first | (union == 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = np.where(invalid, np.nan,
                           ni / np.where(union > 0, union, 1))
        out = df[[key, ts]].copy()
        out["jaccard"] = jac
        out["n_added"] = np.where(first, np.nan, (nA - ni).astype(np.float64))
        out["n_removed"] = np.where(first, np.nan,
                                    (nB - ni).astype(np.float64))
        return out

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def funnel_steps(ds, *, key: str = "user_id", ts: str = "ts",
                 type_col: str = "event_type", steps=(),
                 within: str = "1 day", num_buckets: int = 32):
    """Ordered-funnel progression per entity (the product-analytics
    sequence query): for ``steps = (s1, s2, ...)``, the number of
    consecutive steps completed where step k+1 must occur STRICTLY after
    step k and within ``within`` of it. Matching is greedy-earliest, which
    is optimal for existence: taking the earliest feasible occurrence of a
    step can only widen the window for the next one.

    One user-bucketed exchange; inside each bucket every step is one
    vectorized filter + merge + groupby-min across ALL users at once (no
    per-user Python). Returns ``(key, funnel_steps)`` for every entity
    (0 = never did s1)."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be a non-empty sequence of types")
    w_us = int(pd.Timedelta(within).value // 1000)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        e = pd.DataFrame({
            key: df[key].to_numpy(),
            "_t": df[ts].astype("datetime64[us]").astype("int64").to_numpy(),
            "_y": df[type_col].to_numpy(),
        })
        users = pd.DataFrame({key: e[key].unique()})
        done = pd.Series(np.zeros(len(users), dtype=np.int64),
                         index=users[key])
        cur = None  # Series: user -> completion time of previous step
        for i, s in enumerate(steps):
            cand = e.loc[e["_y"] == s, [key, "_t"]]
            if i > 0:
                cand = cand.merge(cur.rename("_prev"), left_on=key,
                                  right_index=True)
                cand = cand.loc[(cand["_t"] > cand["_prev"])
                                & (cand["_t"] <= cand["_prev"] + w_us)]
            if not len(cand):
                break
            cur = cand.groupby(key)["_t"].min()
            done.loc[cur.index] = i + 1
        return pd.DataFrame({
            key: users[key],
            "funnel_steps": done.loc[users[key]].to_numpy(dtype=np.int64),
        })

    return bucketed_map_groups(ds, key, per_bucket, num_buckets=num_buckets)


def funnel_steps_sql(*, steps, within: str = "1 day",
                     key: str = "user_id", ts: str = "ts",
                     type_col: str = "event_type",
                     table: str = "events") -> str:
    """SQL mirror: chained greedy-earliest scalar minima (one CTE per
    step), identical strict-after + within-window rule."""
    w_us = int(pd.Timedelta(within).value // 1000)
    ctes = [f"u AS (SELECT DISTINCT {key} FROM {table})"]
    prev = None
    for i, s in enumerate(steps):
        name = f"s{i + 1}"
        if i == 0:
            ctes.append(
                f"{name} AS (SELECT {key}, min({ts}) AS t FROM {table}"
                f" WHERE {type_col} = '{s}' GROUP BY 1)")
        else:
            ctes.append(
                f"{name} AS (SELECT e.{key}, min(e.{ts}) AS t"
                f" FROM {table} e JOIN {prev} p USING ({key})"
                f" WHERE e.{type_col} = '{s}' AND e.{ts} > p.t"
                f" AND epoch_us(e.{ts}) <= epoch_us(p.t) + {w_us}"
                f" GROUP BY 1)")
        prev = name
    cases = " + ".join(
        f"CASE WHEN s{i + 1}.{key} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(len(steps)))
    joins = " ".join(
        f"LEFT JOIN s{i + 1} USING ({key})" for i in range(len(steps)))
    return (f"WITH {', '.join(ctes)} SELECT u.{key},"
            f" ({cases})::BIGINT AS funnel_steps FROM u {joins}")


_US_PER_DAY = 86_400_000_000


def _monday_week_days(t_us: np.ndarray) -> np.ndarray:
    """Days-since-epoch of the Monday starting each timestamp's ISO week —
    exact integer mirror of SQL ``date_trunc('week', ts)`` (epoch day 0 =
    Thursday, so Monday-alignment shifts by (d + 3) % 7)."""
    day = t_us // _US_PER_DAY
    return day - ((day + 3) % 7)


def cohort_retention(ds, *, key: str = "user_id", ts: str = "ts",
                     num_buckets: int = 32):
    """Weekly cohort-retention matrix (long form): entities are cohorted by
    the Monday week of their FIRST event; for every (cohort_week,
    weeks_since) cell, the number of distinct entities with any activity in
    that week. The classic product-analytics retention triangle.

    Scale shape: each entity's rows land in ONE key bucket, so per-bucket
    distinct (entity, cohort, weeks_since) counts are exact partials; the
    second exchange carries only (cohort_week, weeks_since, n) rows —
    O(weeks²) regardless of corpus size. Week truncation is pure int64
    arithmetic (no datetime objects in the hot path)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t_us = df[ts].astype("datetime64[us]").astype("int64").to_numpy()
        wk = _monday_week_days(t_us)
        e = pd.DataFrame({key: df[key].to_numpy(), "_wk": wk})
        cohort = e.groupby(key, sort=False)["_wk"].transform("min")
        e["_cw"] = cohort
        e["_ws"] = (e["_wk"] - cohort) // 7
        cells = e.drop_duplicates([key, "_cw", "_ws"])
        out = (cells.groupby(["_cw", "_ws"], sort=False)
               .size().reset_index(name="n_users"))
        return pd.DataFrame({
            "cohort_week": out["_cw"].to_numpy(dtype=np.int64),
            "weeks_since": out["_ws"].to_numpy(dtype=np.int64),
            "n_users": out["n_users"].to_numpy(dtype=np.int64),
        })

    partials = bucketed_map_groups(ds, key, per_bucket,
                                   num_buckets=num_buckets)
    folded = bucketed_aggregate(
        partials, ["cohort_week", "weeks_since"],
        {"n_users": ("n_users", "sum")},
        num_buckets=max(4, num_buckets // 4),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cw = pc.cast(
            pc.multiply(pc.cast(t.column("cohort_week"), pa.int64()),
                        pa.scalar(_US_PER_DAY, type=pa.int64())),
            pa.timestamp("us"))
        return pa.table({
            "cohort_week": cw,
            "weeks_since": pc.cast(t.column("weeks_since"), pa.int64()),
            "n_users": pc.cast(t.column("n_users"), pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def cohort_retention_sql(*, key: str = "user_id", ts: str = "ts",
                         table: str = "events") -> str:
    """SQL mirror: date_trunc('week') cohorts + week-boundary datediff
    (both sides are Monday-truncated, so datediff('week') is exact)."""
    return f"""
        WITH f AS (
            SELECT {key}, date_trunc('week', min({ts})) AS cohort_week
            FROM {table} GROUP BY 1
        ), act AS (
            SELECT DISTINCT e.{key}, f.cohort_week,
                   datediff('week', f.cohort_week,
                            date_trunc('week', e.{ts})) AS weeks_since
            FROM {table} e JOIN f USING ({key})
        )
        SELECT cohort_week::TIMESTAMP AS cohort_week,
               weeks_since::BIGINT AS weeks_since,
               count(*)::BIGINT AS n_users
        FROM act GROUP BY 1, 2"""


def rolling_active_users(ds, *, key: str = "user_id", ts: str = "ts",
                         window_days: int = 7, num_buckets: int = 32,
                         out_col: str = "active_7d"):
    """Trailing-window distinct-entity counts per day (the rolling-WAU
    metric): for every day ``d``, how many distinct entities had any event
    in ``[d - window_days + 1, d]``.

    Exact distinct over SLIDING windows without a window join: each
    entity's rows share one key bucket, so the bucket can produce the
    globally-distinct (entity, window_day) set — day truncation, unique
    days, a ×window_days vectorized offset explode, unique again — and
    emit only (window_day, n) partials. The final fold is a native groupby
    over day cardinality (tiny). One exchange, text/id-free."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t_us = df[ts].astype("datetime64[us]").astype("int64").to_numpy()
        day = t_us // _US_PER_DAY
        e = pd.DataFrame({key: df[key].to_numpy(), "_d": day})
        e = e.drop_duplicates()
        m = len(e)
        wd = (np.repeat(e["_d"].to_numpy(), window_days)
              + np.tile(np.arange(window_days, dtype=np.int64), m))
        w = pd.DataFrame({key: np.repeat(e[key].to_numpy(), window_days),
                          "_wd": wd}).drop_duplicates()
        out = w.groupby("_wd", sort=False).size().reset_index(name="n")
        return pd.DataFrame({
            "day": out["_wd"].to_numpy(dtype=np.int64),
            "n": out["n"].to_numpy(dtype=np.int64),
        })

    partials = bucketed_map_groups(ds, key, per_bucket,
                                   num_buckets=num_buckets)
    agg = partials.groupby("day").sum("n")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = pc.cast(
            pc.multiply(pc.cast(t.column("day"), pa.int64()),
                        pa.scalar(_US_PER_DAY, type=pa.int64())),
            pa.timestamp("us"))
        n = t.column("sum(n)") if "sum(n)" in t.column_names \
            else t.column("n")
        return pa.table({"day": d, out_col: pc.cast(n, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def rolling_active_users_sql(*, key: str = "user_id", ts: str = "ts",
                             window_days: int = 7,
                             table: str = "events",
                             out_col: str = "active_7d") -> str:
    """SQL mirror: the same (entity, window-day) distinct construction —
    a day `d` event makes the entity active for window days d..d+W-1
    (trailing windows whose anchor lies past the last event day are
    included by both sides, a definitional choice kept in lockstep)."""
    offs = ", ".join(str(i) for i in range(window_days))
    return f"""
        WITH ud AS (
            SELECT DISTINCT {key}, date_trunc('day', {ts}) AS d FROM {table}
        ), win AS (
            SELECT DISTINCT {key}, d + (o * INTERVAL 1 DAY) AS wd
            FROM ud, unnest([{offs}]) AS t(o)
        )
        SELECT wd::TIMESTAMP AS day, count(*)::BIGINT AS {out_col}
        FROM win GROUP BY 1"""


def growth_accounting(ds, *, key: str = "user_id", ts: str = "ts",
                      num_buckets: int = 32):
    """Daily growth accounting — the canonical product-analytics
    decomposition of active-entity change (the Duolingo/a16z "growth
    accounting" identity): every (entity, active day) is exactly one of
    **new** (first day ever), **retained** (also active the previous
    day) or **resurrected** (active before, but not yesterday); and an
    entity active on ``d`` but not ``d+1`` **churns on d+1**. The daily
    identity ``active(d) = new + retained + resurrected`` and
    ``net = new + resurrected − churned = active(d) − active(d−1)``
    holds exactly. Churn is attributed by the closed per-entity rule —
    including after an entity's last active day — so the day after the
    corpus's last day appears (everyone still active "churns" there);
    this keeps the op shuffle-local per entity (no global max-day
    scalar) and is documented contract on both sides.

    Output per day (timestamp[us]): ``n_new, n_retained, n_resurrected,
    n_churned, net`` — all exact int64.

    Scale shape: map-side distinct (key, day) would suffice, but each
    entity's full day set must co-locate (new/retained need the
    entity's history), so: ONE key-bucketed exchange of slim (key, day)
    pairs, vectorized per-bucket classification (sorted diffs), then
    only (day, 4 counters) partials — at most days×buckets rows — cross
    into the tiny native day fold."""
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        return (pa.table({key: batch.column(key), "day": day})
                .group_by([key, "day"]).aggregate([]))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "day": pd.Series([], dtype="int64"),
            "n_new": pd.Series([], dtype="int64"),
            "n_retained": pd.Series([], dtype="int64"),
            "n_resurrected": pd.Series([], dtype="int64"),
            "n_churned": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        df = (df.drop_duplicates([key, "day"])
              .sort_values([key, "day"], kind="mergesort",
                           ignore_index=True))
        k = df[key].to_numpy()
        day = df["day"].to_numpy()
        first = np.empty(len(k), dtype=bool)
        first[0] = True
        first[1:] = k[1:] != k[:-1]
        prev_gap = np.empty(len(k), dtype=np.int64)
        prev_gap[0] = 0
        prev_gap[1:] = day[1:] - day[:-1]
        retained = (~first) & (prev_gap == 1)
        resurrected = (~first) & (prev_gap > 1)
        # churn at d+1 for every active day not followed by d+1 activity
        last = np.append(first[1:], True)
        churn_gap = np.append(prev_gap[1:], 0)
        churns = day[last | (churn_gap > 1)] + 1
        frames = [
            pd.DataFrame({"day": day[first], "cls": 0}),
            pd.DataFrame({"day": day[retained], "cls": 1}),
            pd.DataFrame({"day": day[resurrected], "cls": 2}),
            pd.DataFrame({"day": churns, "cls": 3}),
        ]
        lng = pd.concat(frames, ignore_index=True)
        pv = (lng.groupby(["day", "cls"]).size().unstack(fill_value=0)
              .reindex(columns=[0, 1, 2, 3], fill_value=0).reset_index())
        pv.columns = ["day", "n_new", "n_retained", "n_resurrected",
                      "n_churned"]
        return pv.astype(np.int64)

    folded = bucketed_map_groups(partials, key, per_bucket,
                                 num_buckets=num_buckets)
    agg = folded.groupby("day").sum(
        ["n_new", "n_retained", "n_resurrected", "n_churned"])

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def col(name):
            c = (t.column(f"sum({name})")
                 if f"sum({name})" in t.column_names else t.column(name))
            return pc.cast(c, pa.int64())

        d = pc.cast(
            pc.multiply(pc.cast(t.column("day"), pa.int64()),
                        pa.scalar(day_us, type=pa.int64())),
            pa.timestamp("us"))
        new, ret = col("n_new"), col("n_retained")
        res, chu = col("n_resurrected"), col("n_churned")
        net = pc.subtract(pc.add(new, res), chu)
        return pa.table({"day": d, "n_new": new, "n_retained": ret,
                         "n_resurrected": res, "n_churned": chu,
                         "net": net})

    return agg.map_batches(finish, batch_format="pyarrow")


def growth_accounting_sql(*, table: str = "events",
                          key: str = "user_id", ts: str = "ts") -> str:
    """SQL mirror: distinct-day lag/lead classification + FILTER pivot,
    the same closed churn-at-d+1 rule."""
    return f"""
        WITH ud AS (
          SELECT DISTINCT {key} AS u,
                 epoch_us({ts}) // 86400000000 AS d
          FROM {table}
        ),
        l AS (
          SELECT u, d,
                 lag(d)  OVER (PARTITION BY u ORDER BY d) AS pd,
                 lead(d) OVER (PARTITION BY u ORDER BY d) AS nd
          FROM ud
        ),
        cls AS (
          SELECT d, CASE WHEN pd IS NULL THEN 0
                         WHEN pd = d - 1 THEN 1
                         ELSE 2 END AS c
          FROM l
          UNION ALL
          SELECT d + 1 AS d, 3 AS c
          FROM l WHERE nd IS NULL OR nd > d + 1
        ),
        p AS (
          SELECT d,
                 count(*) FILTER (c = 0)::BIGINT AS n_new,
                 count(*) FILTER (c = 1)::BIGINT AS n_retained,
                 count(*) FILTER (c = 2)::BIGINT AS n_resurrected,
                 count(*) FILTER (c = 3)::BIGINT AS n_churned
          FROM cls GROUP BY 1
        )
        SELECT make_timestamp(d * 86400000000) AS day,
               n_new, n_retained, n_resurrected, n_churned,
               (n_new + n_resurrected - n_churned)::BIGINT AS net
        FROM p"""


def event_transitions(ds, *, key: str = "user_id", ts: str = "ts",
                      type_col: str = "event_type", tiebreak=None,
                      num_buckets: int = 32):
    """First-order behavioral transition counts (the Markov-chain feature
    of product analytics): for every ordered within-entity event pair,
    ``(from_type, to_type, n)``. One key-bucketed exchange; inside each
    bucket the shift and pair count are fully vectorized; the final fold
    is a native groupby over ≤ |types|² partial rows."""
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        nxt = df.groupby(key, sort=False)[type_col].shift(-1)
        mask = nxt.notna()
        pairs = pd.DataFrame({
            "from_type": df.loc[mask, type_col].to_numpy(),
            "to_type": nxt[mask].to_numpy(),
        })
        out = (pairs.groupby(["from_type", "to_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = bucketed_map_groups(ds, key, per_bucket,
                                   num_buckets=num_buckets)
    agg = partials.groupby(["from_type", "to_type"]).sum("n")

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"sum(n)": "n"})

    return agg.map_batches(rename, batch_format="pandas")


def event_transitions_sql(*, key: str = "user_id", ts: str = "ts",
                          type_col: str = "event_type",
                          tiebreak: str = "event_id",
                          table: str = "events") -> str:
    """SQL mirror: lead() window with the identical order key."""
    return f"""
        WITH s AS (
            SELECT {type_col},
                   lead({type_col}) OVER (PARTITION BY {key}
                       ORDER BY {ts}, {tiebreak}) AS nxt
            FROM {table}
        )
        SELECT {type_col} AS from_type, nxt AS to_type,
               count(*)::BIGINT AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# time-decayed engagement score (exact power-of-two decay)


def decayed_score(ds, *, key: str, ts: str, amount_col: str,
                  halflife_days: int = 1, num_buckets: int = 32):
    """Per-entity time-decayed engagement score with an EXACT decay kernel:
    each event contributes ``cents >> (age_days // halflife_days)`` — the
    amount halves every ``halflife_days`` relative to the corpus-wide latest
    event.  Power-of-two decay keeps the whole computation in integers
    (arithmetic right shift == floor division by 2^k), so the score is
    bit-identical across parallelism levels and SQL-replayable — unlike
    ``exp(-λΔt)`` float decay, which is order-dependent under re-association.

    Scale shape: the corpus max timestamp is a single column-pruned scalar
    aggregate broadcast into a stateless per-batch map (decay + per-batch
    key collapse); ONE key-bucketed fold finishes.  Shift is capped at 62
    (contributions are exactly 0 beyond that horizon anyway).
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    gmax_us = int(pd.Timestamp(ds.max(ts)).value // 1000)
    day_us = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column(amount_col).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ts_us = pc.cast(
            pc.cast(t.column(ts), pa.timestamp("us")), pa.int64()
        ).to_numpy()
        shift = np.minimum(
            (gmax_us - ts_us) // day_us // halflife_days, 62)
        t2 = pa.table({
            key: t.column(key),
            "decayed_cents": pa.array(cents >> shift, type=pa.int64()),
        })
        g = t2.group_by([key]).aggregate(
            [("decayed_cents", "sum"), ([], "count_all")])
        return g.rename_columns([key, "decayed_cents", "n_events"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        {"decayed_cents": ("decayed_cents", "sum"),
         "n_events": ("n_events", "sum")},
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            "decayed_cents": pc.cast(t.column("decayed_cents"), pa.int64()),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def decayed_score_sql(*, key: str, ts: str, amount_col: str,
                      halflife_days: int = 1, table: str = "events") -> str:
    """SQL mirror: identical cents rounding, floor-division age, and
    power-of-two floor division (DuckDB ``//`` floors like ``>>``)."""
    return f"""
        WITH g AS (SELECT max({ts}) AS gmax FROM {table})
        SELECT {key},
               sum(CAST(round({amount_col} * 100) AS BIGINT)
                   // (1::BIGINT << least(
                        (epoch_us(gmax) - epoch_us({ts}))
                        // 86400000000 // {halflife_days}, 62))
               )::BIGINT AS decayed_cents,
               count(*)::BIGINT AS n_events
        FROM {table} CROSS JOIN g
        GROUP BY {key}"""


# ---------------------------------------------------------------------------
# SCD2 snapshot validity intervals


def snapshot_intervals(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Slowly-changing-dimension (SCD type 2) interval view of a snapshot
    stream: per entity, each snapshot becomes a validity window
    ``[valid_from, valid_to)`` with ``valid_to`` = the next snapshot's
    timestamp (NULL on the current version) and a 1-based ``version``
    counter — the standard re-crawl history layout for point-in-time joins
    (compose with ``asof_join`` to query "which version was live at T").

    ONE key-bucketed exchange; inside the bucket the shift/rank runs
    vectorized across ALL entities at once (single sort + groupby-cumcount
    + boundary-masked shift, no per-entity loop).  Output ``valid_from``
    / ``valid_to`` keep the engine-wide ``timestamp[us]`` contract."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts], kind="mergesort").reset_index(
            drop=True)
        nxt = df[ts].shift(-1)
        same = df[key].shift(-1) == df[key]
        return pd.DataFrame({
            key: df[key],
            "valid_from": df[ts],
            "valid_to": nxt.where(same),
            "version": (df.groupby(key, sort=False).cumcount() + 1
                        ).astype("int64"),
        })

    out = bucketed_map_groups(ds.select_columns([key, ts]), key,
                              per_bucket, num_buckets=num_buckets)

    def cast_us(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t.column(key),
            "valid_from": pc.cast(t.column("valid_from"),
                                  pa.timestamp("us")),
            "valid_to": pc.cast(t.column("valid_to"), pa.timestamp("us")),
            "version": t.column("version"),
        })

    return out.map_batches(cast_us, batch_format="pyarrow")


def snapshot_intervals_sql(*, key: str, ts: str, source_sql: str) -> str:
    """SQL mirror: lead() + row_number() over the identical order key
    (``ts`` is unique per entity in a snapshot stream)."""
    return f"""
        SELECT {key}, {ts} AS valid_from,
               lead({ts}) OVER (PARTITION BY {key} ORDER BY {ts})
                   AS valid_to,
               row_number() OVER (PARTITION BY {key} ORDER BY {ts})::BIGINT
                   AS version
        FROM ({source_sql})"""


# ---------------------------------------------------------------------------
# exact integer gap interpolation (daily grid)


def interpolate_daily(ds, *, key: str, ts: str, value_col: str,
                      num_buckets: int = 32):
    """Per-key DAILY gap interpolation with an exact integer kernel: the
    observation stream collapses to one value per (key, epoch-day), and
    every missing day between consecutive observations (d₀,v₀)→(d₁,v₁)
    emits

        v(d) = v₀ + (v₁−v₀)·(d−d₀) // (d₁−d₀)      (floor — exact, SQL `//`)

    — the linear-interpolation backfill for continuous features (float
    lerp would be order/rounding-dependent; the floor form is bit-exact).
    Days at/after each key's last observation are NOT extrapolated.

    ONE key-bucketed exchange; the expansion is vectorized across ALL keys
    (interval lengths → one repeat + offset arange, no per-key loop).
    Output: ``(key, day, value, observed)`` with ``day`` = epoch-day BIGINT.
    Duplicate observations per (key, day) must be pre-folded by the caller
    (the op asserts uniqueness — silent last-wins would be value-dependent).
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series(dtype=df[key].dtype if len(df) else "int64"),
            "day": pd.Series(dtype="int64"),
            "value": pd.Series(dtype="int64"),
            "observed": pd.Series(dtype="bool"),
        })
        if df.empty:
            return empty
        df = df.sort_values([key, ts], kind="mergesort")
        # epoch-day; normalize to ns first (pandas 2.x preserves the
        # source resolution, so a bare astype(int64) unit would vary)
        days = (pd.to_datetime(df[ts]).astype("datetime64[ns]")
                .astype("int64") // 86_400_000_000_000).to_numpy()
        keys_arr = df[key].to_numpy()
        vals = df[value_col].to_numpy().astype(np.int64)
        if pd.DataFrame({key: keys_arr, "_d": days}).duplicated().any():
            raise ValueError("duplicate (key, day) observation")
        same_next = np.zeros(len(df), dtype=bool)
        same_next[:-1] = keys_arr[1:] == keys_arr[:-1]
        span = np.where(same_next,
                        np.append(days[1:], 0) - days, 1).astype(np.int64)
        dv = np.where(same_next, np.append(vals[1:], 0) - vals, 0)
        total = int(span.sum())
        starts = np.concatenate(([0], np.cumsum(span)[:-1]))
        src = np.repeat(np.arange(len(df)), span)
        off = np.arange(total) - np.repeat(starts, span)
        # TRUNCATING division (toward zero): DuckDB's integer `//`
        # truncates for negative numerators (verified: (-5)//4 = -1),
        # unlike numpy's floor — negative slopes must match the mirror
        num = dv[src] * off
        den = np.maximum(span[src], 1)
        out_vals = vals[src] + np.sign(num) * (np.abs(num) // den)
        return pd.DataFrame({
            key: keys_arr[src],
            "day": days[src] + off,
            "value": out_vals.astype(np.int64),
            "observed": off == 0,
        })

    return bucketed_map_groups(ds, key, per_bucket,
                               num_buckets=num_buckets)


def interpolate_daily_sql(*, key: str, obs_sql: str) -> str:
    """SQL mirror over an ``obs(key, day, v)`` subquery: lead() window +
    generate_series expansion + the identical floor-division lerp."""
    return f"""
        WITH obs AS ({obs_sql}),
        nxt AS (
            SELECT {key}, day, v,
                   lead(day) OVER w AS nd, lead(v) OVER w AS nv
            FROM obs WINDOW w AS (PARTITION BY {key} ORDER BY day)
        )
        SELECT {key}, (day + u.i)::BIGINT AS day,
               (v + CASE WHEN nd IS NULL THEN 0
                         ELSE (nv - v) * u.i // (nd - day) END)::BIGINT
                   AS value,
               (u.i = 0) AS observed
        FROM nxt, unnest(generate_series(
            0, CASE WHEN nd IS NULL THEN 0 ELSE nd - day - 1 END)) AS u(i)"""


# ---------------------------------------------------------------------------
# CUSUM drift / change-point flags


def cusum_flags(ds, *, key: str, ts: str, value_col: str, drift: int,
                threshold: int, tiebreak: str | None = None,
                num_buckets: int = 32):
    """Per-key one-sided CUSUM drift detector over an integer metric: the
    classic recursive statistic

        s_i = max(0, s_{i-1} + (x_i − drift))

    flags ``s_i > threshold`` — upward level-shift detection (latency
    regressions, spend spikes) with exact integer state.  The recursion is
    closed-form SQL-expressible via the running-minimum identity

        s_i = P_i − min_{j ≤ i} P_j,   P_i = Σ_{k ≤ i} (x_k − drift)

    (P_0 = 0 included — min(…, 0) — so the statistic never goes negative),
    which both sides compute: engine = vectorized per-key cumsum/cummin in
    one bucketed pass, mirror = a window ``min() OVER (ROWS UNBOUNDED
    PRECEDING)``.  Output: input keys/ts + ``cusum`` + ``flag``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    order = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                key: pd.Series(dtype=object),
                ts: pd.Series(dtype="datetime64[us]"),
                "cusum": pd.Series(dtype="int64"),
                "flag": pd.Series(dtype="bool"),
            })
        df = df.sort_values(order, kind="mergesort").reset_index(drop=True)
        x = df[value_col].astype("int64").to_numpy() - drift
        p = pd.Series(x).groupby(df[key].to_numpy()).cumsum().to_numpy()
        running_min = np.minimum(
            pd.Series(p).groupby(df[key].to_numpy()).cummin().to_numpy(), 0)
        s = p - running_min
        return pd.DataFrame({
            key: df[key], ts: df[ts],
            "cusum": s.astype(np.int64),
            "flag": s > threshold,
        })

    return bucketed_map_groups(
        ds.select_columns(list(dict.fromkeys(order + [value_col]))),
        key, per_bucket, num_buckets=num_buckets)


def cusum_flags_sql(*, key: str, ts: str, value_expr: str, drift: int,
                    threshold: int, tiebreak: str | None = None,
                    table: str) -> str:
    """SQL mirror: prefix sum − min(prefix, 0) running minimum."""
    order = f"{ts}" + (f", {tiebreak}" if tiebreak else "")
    carry = f", {tiebreak}" if tiebreak else ""
    return f"""
        WITH p AS (
            SELECT {key}, {ts}{carry},
                   sum(({value_expr}) - {drift}) OVER (
                       PARTITION BY {key} ORDER BY {order}
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS pfx
            FROM {table}
        )
        SELECT {key}, {ts},
               (pfx - least(min(pfx) OVER w, 0))::BIGINT AS cusum,
               (pfx - least(min(pfx) OVER w, 0)) > {threshold} AS flag
        FROM p WINDOW w AS (PARTITION BY {key} ORDER BY {order}
                            ROWS UNBOUNDED PRECEDING)"""


# ---------------------------------------------------------------------------
# marketing-touch attribution (first-touch / last-touch)
# ---------------------------------------------------------------------------

def touch_attribution(ds, *, key: str = "user_id", ts: str = "ts",
                      id_col: str = "event_id",
                      type_col: str = "event_type",
                      conversion: str = "purchase",
                      touches=("click", "view"),
                      lookback: str = "7D", num_buckets: int = 32):
    """Per conversion event: the entity's FIRST and LAST touch (of the
    ``touches`` types) strictly before the conversion and within
    ``lookback``, plus the touch count — the multi-touch-attribution
    primitive (first-touch / last-touch models read their column; a
    position-weighted model needs only n_touches more).

    Output: (id_col, key, ts, n_touches, first_touch, last_touch);
    first/last_touch are NULL (and n_touches 0) when no touch is in the
    window. Ties at one timestamp break by ``id_col`` (asc for first,
    desc for last) — the deterministic contract the SQL mirror replays.

    Shape: ONE key-bucketed exchange; inside a bucket, both the touch and
    the conversion rows of all entities sort once by (key, ts, id) and
    every conversion's window resolves by TWO searchsorted calls on a
    composite (entity, ts) key — no per-entity or per-conversion loop.
    The composite key packs entity-rank x time-span into int64 and raises
    loudly if the product would overflow (split buckets further or
    shorten the span before that)."""
    lb_us = int(pd.Timedelta(lookback).value // 1000)
    touch_set = set(touches)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts, id_col], kind="mergesort")
        t_us = df[ts].astype("datetime64[us]").astype("int64").to_numpy()
        codes, _ = pd.factorize(df[key], sort=True)
        is_touch = df[type_col].isin(touch_set).to_numpy()
        is_conv = (df[type_col] == conversion).to_numpy()

        t0 = int(t_us.min()) if len(t_us) else 0
        span = (int(t_us.max()) - t0) + lb_us + 2
        if span and codes.size and (int(codes.max()) + 1) * span > 2**62:
            raise ValueError(
                "touch_attribution composite key would overflow int64; "
                "raise num_buckets or shorten the lookback")
        comp = codes.astype(np.int64) * span + (t_us - t0)

        tk = comp[is_touch]
        conv_comp = comp[is_conv]
        lo = np.searchsorted(tk, conv_comp - lb_us)
        hi = np.searchsorted(tk, conv_comp)  # strictly before: ts offset>0
        # clamp window starts that crossed into the previous entity's range
        ent_start = np.searchsorted(
            tk, codes[is_conv].astype(np.int64) * span)
        lo = np.maximum(lo, ent_start)
        n = (hi - lo).astype(np.int64)
        has = n > 0

        types_t = df[type_col].to_numpy()[is_touch]
        if len(tk):
            first = np.where(has, types_t[np.minimum(lo, len(tk) - 1)],
                             None)
            last = np.where(has, types_t[np.maximum(hi - 1, 0)], None)
        else:
            first = np.full(len(conv_comp), None, dtype=object)
            last = first.copy()
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy()[is_conv],
            key: df[key].to_numpy()[is_conv],
            ts: df[ts].to_numpy()[is_conv],
            "n_touches": n,
            "first_touch": first,
            "last_touch": last,
        })
        return out

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    return bucketed_map_groups(ds, key, per_bucket,
                               num_buckets=num_buckets)


def touch_attribution_sql(*, table: str = "events", key: str = "user_id",
                          ts: str = "ts", id_col: str = "event_id",
                          type_col: str = "event_type",
                          conversion: str = "purchase",
                          touches=("click", "view"),
                          lookback_days: int = 7) -> str:
    """Window-replay oracle: per conversion, row_number over the joined
    in-window touches ordered (ts, id) asc / desc."""
    tlist = ", ".join(f"'{t}'" for t in touches)
    return f"""
        WITH conv AS (
          SELECT {id_col}, {key}, {ts} FROM {table}
          WHERE {type_col} = '{conversion}'
        ), t AS (
          SELECT {key}, {ts} AS tts, {id_col} AS teid, {type_col} AS ttype
          FROM {table} WHERE {type_col} IN ({tlist})
        ), j AS (
          SELECT c.{id_col}, c.{key}, c.{ts}, t.tts, t.teid, t.ttype
          FROM conv c JOIN t
            ON t.{key} = c.{key}
           AND t.tts < c.{ts}
           AND t.tts >= c.{ts} - INTERVAL {lookback_days} DAY
        ), rk AS (
          SELECT *,
                 row_number() OVER (PARTITION BY {id_col}
                                    ORDER BY tts, teid) AS rf,
                 row_number() OVER (PARTITION BY {id_col}
                                    ORDER BY tts DESC, teid DESC) AS rl
          FROM j
        ), agg AS (
          SELECT {id_col}, count(*)::BIGINT AS n_touches,
                 max(CASE WHEN rf = 1 THEN ttype END) AS first_touch,
                 max(CASE WHEN rl = 1 THEN ttype END) AS last_touch
          FROM rk GROUP BY 1
        )
        SELECT c.{id_col}, c.{key}, c.{ts},
               coalesce(a.n_touches, 0)::BIGINT AS n_touches,
               a.first_touch, a.last_touch
        FROM conv c LEFT JOIN agg a USING ({id_col})"""


# ---------------------------------------------------------------------------
# retrospective change-point localization (AMOC over daily activity)


def change_point(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Single most-likely change point per key over its daily event-count
    series — the retrospective sibling of :func:`cusum_flags`: CUSUM flags
    answer "is this key drifting right now" while running forward; this op
    answers "WHERE did the level shift" after the fact (AMOC — at-most-one
    change — in its classic max-CUSUM form, Page 1954 / Hinkley 1970),
    which is what a crawl-scheduling or incident-forensics pass asks of a
    host's fetch series.

    Contract: per key, the day grid is the key's own closed span
    ``[min_day, max_day]`` ZERO-FILLED (a level shift to silence is a
    change; dropping empty days would hide exactly the breaks that
    matter). With prefix sums ``S_k`` over the grid of length ``n`` and
    total ``S``, the break maximizes the integer CUSUM deviation

        ``dev_k = | n·S_k − k·S |``,  k = 1..n−1

    (the max gap between observed cumulative activity share and the
    uniform clock — dev/(n·S) is exactly a KS distance against uniform
    time). First k wins ties; ``break_day`` = last day of the left
    segment = ``min_day + k − 1``; ``dev_ppm = dev·10⁶ // (n·S)`` done in
    Python ints on the one winning row per key (n·S·10⁶ can pass int64 at
    hot-key scale; the in-grid dev fits int64 for any key with fewer than
    ~10¹⁵ events across a bounded day span — documented bound). Keys
    observed on a single day have no valid split and are EXCLUDED
    (documented; no null-break rows).

    Scale shape: per-batch (key, day, count) Arrow partials collapse the
    event stream map-side, ONE key-bucketed exchange of partial rows, then
    an all-keys vectorized flat-grid pass per bucket (np.repeat segment
    layout, one cumsum, segment-rebased prefix sums — no per-key Python
    loop); output is one row per key."""
    import pyarrow.compute as pc  # noqa: F401

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "n_days": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "break_day": pd.Series([], dtype="int64"),
                                 "dev_ppm": pd.Series([], dtype="int64")})
        df = (df.groupby([key, "day"], as_index=False, sort=False)["c"]
              .sum().sort_values([key, "day"], kind="mergesort"))
        g = df.groupby(key, sort=False)
        bounds = g.agg(mn=("day", "min"), mx=("day", "max"),
                       s=("c", "sum")).reset_index()
        bounds["n"] = bounds["mx"] - bounds["mn"] + 1
        bounds = bounds[bounds["n"] >= 2].reset_index(drop=True)
        if not len(bounds):
            return per_bucket(df.iloc[0:0])
        n = bounds["n"].to_numpy()
        off = np.concatenate([[0], np.cumsum(n)])
        flat = np.zeros(off[-1], dtype=np.int64)
        keep = df[key].isin(set(bounds[key]))
        dfk = df[keep]
        kidx = pd.Series(np.arange(len(bounds)),
                         index=bounds[key]).reindex(dfk[key]).to_numpy()
        pos = off[kidx] + (dfk["day"].to_numpy()
                           - bounds["mn"].to_numpy()[kidx])
        np.add.at(flat, pos, dfk["c"].to_numpy())
        cs = np.cumsum(flat)
        base = np.concatenate([[0], cs[off[1:-1] - 1]])
        seg = np.repeat(np.arange(len(bounds)), n)
        cum = cs - base[seg]                      # per-segment prefix sums
        k = np.arange(off[-1]) - off[seg] + 1     # 1..n within each segment
        S = bounds["s"].to_numpy()[seg]
        nn = n[seg]
        dev = np.abs(nn * cum - k * S)
        valid = k < nn                            # k = 1..n-1 only
        frame = pd.DataFrame({"seg": seg[valid], "k": k[valid],
                              "dev": dev[valid]})
        win = frame.loc[frame.groupby("seg", sort=False)["dev"].idxmax()]
        # object-int ppm on the one winning row per key (no per-key Python
        # loop; dev*1e6 may pass int64 for hot keys)
        segw = win["seg"].to_numpy().astype(np.int64)
        nw = n[segw].astype(object)
        sw = bounds["s"].to_numpy()[segw].astype(object)
        ppm = (win["dev"].to_numpy().astype(object) * 1_000_000
               // (nw * sw))
        out = pd.DataFrame({
            key: bounds[key].to_numpy()[segw],
            "n_days": n[segw],
            "n_events": bounds["s"].to_numpy()[segw],
            "break_day": (bounds["mn"].to_numpy()[segw]
                          + win["k"].to_numpy() - 1),
            "dev_ppm": ppm.astype(np.int64),
        })
        return out.astype({key: "int64", "n_days": "int64",
                           "n_events": "int64", "break_day": "int64",
                           "dev_ppm": "int64"})

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def change_point_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: day-count fold, lateral zero-filled grid, window prefix
    sum, HUGEINT CUSUM deviation, first-max via (dev DESC, k ASC) rank."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        b AS (
          SELECT kk, min(day) AS mn, max(day) AS mx, sum(c)::BIGINT AS s,
                 (max(day) - min(day) + 1)::BIGINT AS n
          FROM d GROUP BY 1 HAVING max(day) > min(day)
        ),
        g0 AS (
          SELECT b.kk, b.mn, b.n, b.s, u.day
          FROM b, unnest(generate_series(b.mn, b.mx)) AS u(day)
        ),
        grid AS (
          SELECT g0.kk, g0.mn, g0.n, g0.s, g0.day,
                 coalesce(d.c, 0)::BIGINT AS c
          FROM g0 LEFT JOIN d ON d.kk = g0.kk AND d.day = g0.day
        ),
        cum AS (
          SELECT kk, mn, n, s, day,
                 (day - mn + 1)::BIGINT AS k,
                 sum(c) OVER (PARTITION BY kk ORDER BY day)::BIGINT AS sk
          FROM grid
        ),
        dev AS (
          SELECT kk, mn, n, s, k,
                 abs(n::HUGEINT * sk - k::HUGEINT * s) AS dv,
                 row_number() OVER (
                   PARTITION BY kk
                   ORDER BY abs(n::HUGEINT * sk - k::HUGEINT * s) DESC,
                            k ASC) AS rnk
          FROM cum WHERE k < n
        )
        SELECT kk AS {key}, n AS n_days, s AS n_events,
               (mn + k - 1)::BIGINT AS break_day,
               (dv * 1000000 // (n::HUGEINT * s))::BIGINT AS dev_ppm
        FROM dev WHERE rnk = 1"""


# ---------------------------------------------------------------------------
# Fano-factor burstiness per key (overdispersion of the daily rate)


def fano_factor(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key Fano factor of the zero-filled daily event-count series, in
    exact integer ppm — the overdispersion check behind every
    Poisson-rate assumption: recrawl schedulers (Cho & Garcia-Molina's
    change-rate estimators) and rate-limit budgeting both model a key's
    daily activity as Poisson, and the Fano factor ``F = Var/Mean`` is
    the test of that assumption — ``F ≈ 1`` Poisson-like, ``F > 1``
    bursty (visits clump; schedule adaptively), ``F < 1`` regular
    (metronomic bots). Sits beside :func:`change_point` (same zero-filled
    ``[min_day, max_day]`` grid contract — silent days carry exactly the
    dispersion signal) but answers "is the rate STABLE" rather than
    "where did it shift".

    Population-variance form over grid length n and daily counts x:
    ``F = Var/Mean = (n·Σx² − S²) / (n·S)``, so
    ``fano_ppm = (n·Σx² − S²)·10⁶ // (n·S)`` — numerator ≥ 0 by
    Cauchy-Schwarz, so Python floor == DuckDB truncation; single-day
    keys (n == 1) report 0 by the same documented no-dispersion contract
    as change_point's exclusion, but stay in the output (their mean IS
    defined). HUGEINT carries the mirror; the engine finishes the ppm in
    object ints since n·Σx²·10⁶ passes int64 for hot keys.

    Scale shape: per-batch (key, day, count) Arrow partials, ONE
    key-bucketed exchange, vectorized per-bucket finish — Σx² needs only
    the OBSERVED days (zero days add nothing to Σx² and S; the grid
    length enters as the closed-form n) so no grid materialization at
    all, unlike change_point's prefix walk."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "n_days": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "fano_ppm": pd.Series([], dtype="int64")})
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        df["c2"] = df["c"] * df["c"]
        g = df.groupby(key, sort=False).agg(
            mn=("day", "min"), mx=("day", "max"),
            s=("c", "sum"), sq=("c2", "sum")).reset_index()
        n = (g["mx"] - g["mn"] + 1).to_numpy().astype(object)
        s = g["s"].to_numpy().astype(object)
        sq = g["sq"].to_numpy().astype(object)
        num = (n * sq - s * s) * 1_000_000
        den = n * s
        ppm = np.where(n > 1, num // den, 0)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "n_days": n.astype(np.int64),
            "n_events": s.astype(np.int64),
            "fano_ppm": ppm.astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def fano_factor_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: observed-day fold + closed-form grid length, HUGEINT
    moments."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        g AS (
          SELECT kk, (max(day) - min(day) + 1)::HUGEINT AS n,
                 sum(c)::HUGEINT AS s, sum(c::HUGEINT * c) AS sq
          FROM d GROUP BY 1
        )
        SELECT kk AS {key}, n::BIGINT AS n_days, s::BIGINT AS n_events,
               CASE WHEN n > 1
                    THEN ((n * sq - s * s) * 1000000 // (n * s))::BIGINT
                    ELSE 0 END AS fano_ppm
        FROM g"""


# ---------------------------------------------------------------------------
# Longest silence (the churn complement of activity_streaks)


def max_silence(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key LONGEST silent stretch — the maximal run of consecutive
    zero days strictly inside the key's [min_day, max_day] span — the
    churn-risk complement of :func:`activity_streaks`: a streak measures
    sustained presence, this measures the worst ABSENCE that ended (the
    key came back), the "dormancy depth" survival/winback models key on
    and recrawl schedulers read as the observed tolerance before a
    source resumes. Keys with no interior silence (every active pair
    consecutive, or a single active day) are EXCLUDED — the output is an
    audit of keys that went dark and returned, kept audit-sized the
    k_anonymity way.

    Output per key: ``n_active_days`` (distinct), ``max_silence_days``
    (zero-day run length ≥ 1), and ``silence_start`` — the first silent
    day of that longest run as ``timestamp[us]`` (engine-wide timestamp
    contract), ties broken to the EARLIEST run (the activity_streaks
    contract).

    Scale shape: identical exchange to activity_streaks — map-side
    distinct (key, day), ONE key-bucketed exchange, sorted consecutive
    diff per bucket; a silence is just an observed-day gap d ≥ 2 seen
    as (d − 1) zeros starting at prev_day + 1."""
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        return (pa.table({key: batch.column(key), "day": day})
                .group_by([key, "day"]).aggregate([]))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="int64"),
            "n_active_days": pd.Series([], dtype="int64"),
            "max_silence_days": pd.Series([], dtype="int64"),
            "silence_start": pd.Series([], dtype="datetime64[us]"),
        })
        if not len(df):
            return empty
        df = (df.drop_duplicates([key, "day"])
              .sort_values([key, "day"], kind="mergesort",
                           ignore_index=True))
        k = df[key].to_numpy()
        day = df["day"].to_numpy()
        same = k[1:] == k[:-1]
        gap = (day[1:] - day[:-1] - 1)
        sil = same & (gap >= 1)
        if not sil.any():
            return empty
        sk = k[:-1][sil]
        slen = gap[sil]
        sstart = day[:-1][sil] + 1
        new = np.empty(len(sk), dtype=bool)
        new[0] = True
        new[1:] = sk[1:] != sk[:-1]
        seg = np.cumsum(new) - 1
        # longest run, earliest start on ties: lexsort (start asc,
        # -len asc, seg asc) -> first row per segment wins
        order = np.lexsort((sstart, -slen, seg))
        sseg = seg[order]
        first = np.empty(len(sseg), dtype=bool)
        first[0] = True
        first[1:] = sseg[1:] != sseg[:-1]
        win = order[first]
        active = (pd.Series(1, index=pd.Index(k, name=key))
                  .groupby(level=0, sort=False).sum())
        wk = sk[win]
        return pd.DataFrame({
            key: wk,
            "n_active_days": active.reindex(wk).to_numpy(
                dtype=np.int64),
            "max_silence_days": slen[win].astype(np.int64),
            "silence_start": pd.to_datetime(
                sstart[win] * day_us, unit="us").astype("datetime64[us]"),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def max_silence_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: distinct-day lag gaps, (len DESC, start ASC) rank,
    epoch-day → timestamp[us]."""
    return f"""
        WITH d AS (
          SELECT DISTINCT {key} AS kk,
                 epoch_us({ts}) // 86400000000 AS day
          FROM {table}
        ),
        g AS (
          SELECT kk, day,
                 day - lag(day) OVER (PARTITION BY kk ORDER BY day) - 1
                   AS sil,
                 lag(day) OVER (PARTITION BY kk ORDER BY day) + 1
                   AS sstart,
                 count(*) OVER (PARTITION BY kk)::BIGINT AS nact
          FROM d
        ),
        s AS (
          SELECT kk, sil, sstart, nact,
                 row_number() OVER (PARTITION BY kk
                                    ORDER BY sil DESC, sstart ASC) AS rn
          FROM g WHERE sil >= 1
        )
        SELECT kk AS {key}, nact AS n_active_days,
               sil::BIGINT AS max_silence_days,
               make_timestamp(sstart * 86400000000) AS silence_start
        FROM s WHERE rn = 1"""


# ---------------------------------------------------------------------------
# Weekly seasonal strength (lag-7 vs lag-1 naive forecast error)


def seasonal_strength(ds, *, key: str, ts: str, lag: int = 7,
                      num_buckets: int = 32):
    """Per-key weekly-seasonality STRENGTH of the zero-filled daily
    count grid, as the exact integer ratio of the seasonal-naive to the
    naive forecast error (the M-competition / MASE denominator idea,
    Hyndman & Koehler 2006, made integer-exact): with
    ``s1 = Σ|xₜ − xₜ₋₁|`` and ``s7 = Σ|xₜ − xₜ₋₇|`` over the grid,

        ``seasonal_ratio_ppm = s7 · 10⁶ // s1``

    — ratio ≪ 10⁶ means last week predicts today better than yesterday
    does (strong weekly structure: schedule crawls a week apart), ≈ 10⁶
    no weekly memory, > 10⁶ anti-seasonal. Complements
    :func:`~htrc_feature_reader_ray.stages.profile.dow_chi2`: χ² tests
    the marginal weekday PROFILE, this tests lag-7 PREDICTABILITY (a
    growing series can have a flat weekday profile yet strong lag-7
    structure, and vice versa). Keys with span < lag+1 days are
    excluded (no lag-7 term exists); s1 = 0 (constant grid) reports the
    neutral 10⁶ by documented contract (s7 is then also 0 — seasonal
    naive is exactly as good as naive).

    Both sums close over OBSERVED days only — zero days contribute |0−0|
    except at run boundaries, so: a consecutive observed pair (gap 1)
    adds |a−b| to s1, a gap ≥ 2 adds a+b (drop to zero, rise from zero);
    for s7, an observed day t adds |cₜ − cₜ₋₇| if t−7 observed, cₜ if
    t−7 is an in-span zero day, and cₜ again if t+7 is an in-span zero
    day (the x_{t+7}=0 term). No grid materialization; membership via
    one searchsorted per bucket."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="int64"),
            "n_days": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "naive_abs": pd.Series([], dtype="int64"),
            "seasonal_abs": pd.Series([], dtype="int64"),
            "seasonal_ratio_ppm": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        df = df.sort_values([key, "day"], kind="mergesort",
                            ignore_index=True)
        k = df[key].to_numpy()
        day = df["day"].to_numpy()
        c = df["c"].to_numpy()
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k)) - 1
        seg = np.cumsum(new) - 1
        mn = day[starts][seg]
        mx = day[ends][seg]
        # s1: consecutive observed pairs
        same = ~new[1:]
        d1 = day[1:] - day[:-1]
        a, b = c[:-1], c[1:]
        t1 = np.where(d1 == 1, np.abs(a - b), a + b)
        s1 = np.zeros(len(starts), dtype=np.int64)
        np.add.at(s1, seg[1:][same], t1[same])
        # s7 membership: is (key, day-lag) / (key, day+lag) observed?
        # keys are contiguous and day sorted within key, so a composite
        # sortable code gives one searchsorted for each direction
        code = seg * (np.int64(1) << 42) + (day - day.min())
        prev_obs = np.isin(code - lag, code, assume_unique=True)
        next_obs = np.isin(code + lag, code, assume_unique=True)
        pc_ = np.zeros(len(k), dtype=np.int64)
        idx_prev = np.searchsorted(code, code - lag)
        has_prev = prev_obs
        pc_[has_prev] = c[np.clip(idx_prev[has_prev], 0, len(k) - 1)]
        in_span_prev = day - lag >= mn
        in_span_next = day + lag <= mx
        t7 = (np.where(has_prev, np.abs(c - pc_), c) * in_span_prev
              + c * (in_span_next & ~next_obs))
        s7 = np.zeros(len(starts), dtype=np.int64)
        np.add.at(s7, seg, t7)
        n = day[ends] - day[starts] + 1
        s = np.zeros(len(starts), dtype=np.int64)
        np.add.at(s, seg, c)
        keep = n >= lag + 1
        if not keep.any():
            return empty
        s1k, s7k = s1[keep], s7[keep]
        ratio = np.where(s1k > 0,
                         s7k.astype(object) * 1_000_000
                         // np.where(s1k > 0, s1k, 1).astype(object),
                         1_000_000)
        return pd.DataFrame({
            key: k[starts][keep],
            "n_days": n[keep].astype(np.int64),
            "n_events": s[keep].astype(np.int64),
            "naive_abs": s1k.astype(np.int64),
            "seasonal_abs": s7k.astype(np.int64),
            "seasonal_ratio_ppm": ratio.astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def seasonal_strength_sql(*, table: str, key: str, ts: str,
                          lag: int = 7) -> str:
    """SQL mirror: lag() pairs for s1, self-joins at ±lag for s7's
    three observed-day term classes, neutral-10⁶ constant-grid CASE."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        b AS (
          SELECT kk, min(day) AS mn, max(day) AS mx,
                 (max(day) - min(day) + 1)::BIGINT AS n,
                 sum(c)::BIGINT AS s
          FROM d GROUP BY 1
        ),
        p1 AS (
          SELECT kk, day, c,
                 lag(day) OVER (PARTITION BY kk ORDER BY day) AS pd,
                 lag(c)   OVER (PARTITION BY kk ORDER BY day) AS pc
          FROM d
        ),
        s1 AS (
          SELECT kk, sum(CASE WHEN day - pd = 1 THEN abs(c - pc)
                              ELSE c + pc END)::BIGINT AS v
          FROM p1 WHERE pd IS NOT NULL GROUP BY 1
        ),
        t7 AS (
          SELECT d.kk,
                 (CASE WHEN d.day - {lag} >= b.mn THEN
                    CASE WHEN q.c IS NULL THEN d.c
                         ELSE abs(d.c - q.c) END
                  ELSE 0 END
                + CASE WHEN d.day + {lag} <= b.mx AND r.c IS NULL
                       THEN d.c ELSE 0 END) AS v
          FROM d
          JOIN b ON b.kk = d.kk
          LEFT JOIN d q ON q.kk = d.kk AND q.day = d.day - {lag}
          LEFT JOIN d r ON r.kk = d.kk AND r.day = d.day + {lag}
        ),
        s7 AS (SELECT kk, sum(v)::BIGINT AS v FROM t7 GROUP BY 1)
        SELECT b.kk AS {key}, b.n AS n_days, b.s AS n_events,
               coalesce(s1.v, 0) AS naive_abs,
               coalesce(s7.v, 0) AS seasonal_abs,
               CASE WHEN coalesce(s1.v, 0) > 0
                    THEN (s7.v::HUGEINT * 1000000 // s1.v)::BIGINT
                    ELSE 1000000 END AS seasonal_ratio_ppm
        FROM b
        LEFT JOIN s1 ON s1.kk = b.kk
        LEFT JOIN s7 ON s7.kk = b.kk
        WHERE b.n >= {lag} + 1"""


# ---------------------------------------------------------------------------
# Activity half-life (time to half of lifetime engagement)


def activity_half_life(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key activity half-life over the zero-filled daily grid: the
    smallest day offset h (0-based from the key's first active day)
    such that events through day h reach HALF the key's lifetime total
    — ``2·cum(h) ≥ S`` — plus ``half_share_ppm = h·10⁶ // (n−1)``, the
    half-life as a share of the span. The content-decay scalar crawl
    and freshness models key on (Cho & Garcia-Molina's recrawl work
    models decay; this measures it non-parametrically): front-loaded
    keys (viral page: one hot week, long tail) have half_share → 0,
    steady keys sit near 500000, late bloomers → 10⁶. Single-day keys
    report h = 0 and share 0 by the documented span-free contract
    (they stay in the output — their half-life IS day one).

    The threshold day is always an OBSERVED day (zero days never move
    the cumulative), so the op needs only observed (key, day, count)
    partials — the change_point exchange — and the per-bucket finish is
    a sort + segmented cumsum + first-hit pick; no grid materialization.
    Ceiling-half contract: ``2·cum ≥ S`` (for S odd, the day crossing
    ⌈S/2⌉), matching the SQL mirror's integer test verbatim."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series([], dtype="int64"),
                "n_days": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "half_life_days": pd.Series([], dtype="int64"),
                "half_share_ppm": pd.Series([], dtype="int64")})
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        df = df.sort_values([key, "day"], kind="mergesort",
                            ignore_index=True)
        k = df[key].to_numpy()
        day = df["day"].to_numpy()
        c = df["c"].to_numpy()
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        cum = np.cumsum(c)
        base = np.zeros(len(k), dtype=np.int64)
        base[starts[1:]] = cum[starts[1:] - 1]
        cum = cum - np.maximum.accumulate(np.where(new, base, 0))
        ends = np.append(starts[1:], len(k)) - 1
        s = cum[ends]
        hit = 2 * cum >= s[seg]
        # hits are a suffix of each segment (cum is nondecreasing; the
        # segment end always hits), so first hit = min position per seg
        hit_pos = np.flatnonzero(hit)
        first_hit = np.full(len(starts), len(k), dtype=np.int64)
        np.minimum.at(first_hit, seg[hit_pos], hit_pos)
        mn = day[starts]
        mx = day[ends]
        h = day[first_hit] - mn
        n = mx - mn + 1
        span = n - 1
        share = np.where(span > 0, h * 1_000_000 // np.maximum(span, 1), 0)
        return pd.DataFrame({
            key: k[starts],
            "n_days": n.astype(np.int64),
            "n_events": s.astype(np.int64),
            "half_life_days": h.astype(np.int64),
            "half_share_ppm": share.astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def activity_half_life_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: windowed cumulative + first 2·cum ≥ S day, span via
    min/max windows."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        c AS (
          SELECT kk, day,
                 sum(c) OVER (PARTITION BY kk ORDER BY day)::BIGINT AS cum,
                 sum(c) OVER (PARTITION BY kk)::BIGINT AS s,
                 min(day) OVER (PARTITION BY kk) AS mn,
                 max(day) OVER (PARTITION BY kk) AS mx
          FROM d
        )
        SELECT kk AS {key},
               (max(mx) - max(mn) + 1)::BIGINT AS n_days,
               max(s) AS n_events,
               min(day - mn)::BIGINT AS half_life_days,
               CASE WHEN max(mx) > max(mn)
                    THEN (min(day - mn) * 1000000
                          // (max(mx) - max(mn)))::BIGINT
                    ELSE 0 END AS half_share_ppm
        FROM c WHERE 2 * cum >= s GROUP BY kk"""


# ---------------------------------------------------------------------------
# Inter-event gap statistics (event-time cadence, not the daily grid)


def gap_stats(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key inter-event gap statistics in EVENT time — the cadence
    fingerprint the daily-grid family is blind to: :func:`fano_factor`
    bins to days first, so a bot firing every 61 minutes and a human
    browsing in bursts can show the same daily counts while their GAP
    distributions are nothing alike. Emits, per key with ≥ 2 events,
    over the consecutive gaps ``g`` of the time-sorted event sequence:

    - ``n_gaps`` = m, ``gap_sum_us`` = Σg (== max ts − min ts),
    - ``median_gap_us`` — the LOWER median (0-based position
      ``(m−1)//2`` of the sorted gap multiset; quantile_disc's
      convention, the theil_sen tie rule) — the robust cadence period,
    - ``cv2_ppm`` = squared coefficient of variation
      ``(m·Σg² − G²)·10⁶ // G²`` — the Cox–Lewis dispersion test in
      exact integers: ≈10⁶ Poisson, ≪10⁶ metronomic (cron), ≫10⁶
      bursty; CV² avoids the sqrt the Goh–Barabási B would need, so
      the mirror stays integer-exact. G = 0 (all events simultaneous)
      reports 0 by the fano no-dispersion contract.

    Deterministic under ts ties: the gap MULTISET of a sorted sequence
    doesn't depend on tie order (ties contribute 0-gaps either way).

    Scale shape: gaps need the key's full time order, so (key, ts)
    rows ship through ONE key-bucketed exchange (the sessionize
    shape — no map-side reduction exists for consecutive differences);
    per-bucket finish is one lexsort + vectorized diff + segmented
    median pick. Σg² runs in object ints (a year-long gap squares past
    int64)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({key: batch.column(key), "t": t})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: pd.Series([], dtype="int64"),
                              "n_gaps": pd.Series([], dtype="int64"),
                              "gap_sum_us": pd.Series([], dtype="int64"),
                              "median_gap_us": pd.Series([], dtype="int64"),
                              "cv2_ppm": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        df = df.sort_values([key, "t"], kind="mergesort",
                            ignore_index=True)
        k = df[key].to_numpy()
        t = df["t"].to_numpy()
        same = k[1:] == k[:-1]
        gaps = (t[1:] - t[:-1])[same]
        gk = k[:-1][same]
        if not len(gaps):
            return empty
        # segment boundaries over the gap array (keys are contiguous)
        new = np.empty(len(gk), dtype=bool)
        new[0] = True
        new[1:] = gk[1:] != gk[:-1]
        starts = np.flatnonzero(new)
        m = np.diff(np.append(starts, len(gk)))
        # per-key sorted gaps -> lower median at start + (m-1)//2
        order = np.lexsort((gaps, np.cumsum(new) - 1))
        med = gaps[order][starts + (m - 1) // 2]
        go = gaps.astype(object)
        s = np.add.reduceat(go, starts)
        sq = np.add.reduceat(go * go, starts)
        mo = m.astype(object)
        den = s * s
        den_safe = np.where(den > 0, den, 1)
        cv2 = np.where(den > 0,
                       (mo * sq - den) * 1_000_000 // den_safe, 0)
        return pd.DataFrame({
            key: gk[starts],
            "n_gaps": m.astype(np.int64),
            "gap_sum_us": s.astype(np.int64),
            "median_gap_us": med.astype(np.int64),
            "cv2_ppm": cv2.astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def gap_stats_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: lag() gaps, HUGEINT moments, quantile_disc lower
    median, DuckDB ``//`` truncation (numerator ≥ 0 by Cauchy–Schwarz)."""
    return f"""
        WITH e AS (
          SELECT {key} AS kk, epoch_us({ts}) AS t FROM {table}
        ),
        g AS (
          SELECT kk, t - lag(t) OVER (PARTITION BY kk ORDER BY t) AS gap
          FROM e
        ),
        a AS (
          SELECT kk, count(gap)::HUGEINT AS m, sum(gap)::HUGEINT AS s,
                 sum(gap::HUGEINT * gap) AS sq,
                 quantile_disc(gap, 0.5) AS med
          FROM g WHERE gap IS NOT NULL GROUP BY 1
        )
        SELECT kk AS {key}, m::BIGINT AS n_gaps, s::BIGINT AS gap_sum_us,
               med::BIGINT AS median_gap_us,
               CASE WHEN s > 0
                    THEN ((m * sq - s * s) * 1000000 // (s * s))::BIGINT
                    ELSE 0 END AS cv2_ppm
        FROM a"""


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the zero-filled daily grid (rhythm/memory)


def daily_autocorr(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key lag-1 autocorrelation of the zero-filled daily event-count
    series, in exact integer ppm — the MEMORY metric completing the
    daily-grid family: :func:`change_point` localizes a shift,
    :func:`fano_factor` measures dispersion, :func:`daily_trend` measures
    direction, and this measures persistence — does a busy day predict a
    busy tomorrow (r₁ > 0: sessions/campaigns span days; recrawl sooner
    after a hit) or alternate (r₁ < 0: day-on/day-off cadence — the
    classic cron fingerprint) or carry no memory (r₁ ≈ 0: Poisson-like,
    matching fano ≈ 1e6)?

    Box–Jenkins sample form over the n-day grid x with mean m = S/n,
    cleared of the fraction by multiplying num and den by n²:

        ``r₁ = Σₜ(xₜ−m)(xₜ₊₁−m) / Σₜ(xₜ−m)²``
        ``num = n²·P − n·S·(2S − x₁ − xₙ) + (n−1)·S²``
        ``den = n²·Σx² − n·S²``
        ``autocorr_ppm = sign·(|num|·10⁶ // den)``

    where ``P = Σₜ xₜ·xₜ₊₁`` over the grid. Division TRUNCATES toward
    zero (the daily_trend convention — DuckDB ``//`` truncates, so the
    engine sign-splits explicitly). den ≥ 0 by Cauchy–Schwarz with
    equality iff the grid is constant (includes n = 1); those keys stay
    in the output with autocorr_ppm = 0 by the fano no-dispersion
    contract.

    Scale shape: moments only, NO grid materialization — zero days
    contribute nothing to P (any product touching a silent day is 0), so
    P needs only CONSECUTIVE observed days (dayⱼ = dayᵢ + 1), and
    x₁/xₙ are the counts at the observed min/max day. Per-batch
    (key, day, count) Arrow partials, ONE key-bucketed exchange,
    object-int finish (n²·Σx²·10⁶ can pass int64 for hot keys)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "n_days": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "autocorr_ppm": pd.Series([], dtype="int64")})
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        df = df.sort_values([key, "day"], kind="mergesort",
                            ignore_index=True)
        k = df[key].to_numpy()
        day = df["day"].to_numpy()
        c = df["c"].to_numpy().astype(object)
        # P: products across consecutive observed days only.
        adj = (k[1:] == k[:-1]) & (day[1:] == day[:-1] + 1)
        pser = pd.Series(c[:-1][adj] * c[1:][adj],
                         index=pd.Index(k[:-1][adj], name=key), dtype=object)
        df["c2"] = df["c"] * df["c"]
        g = df.groupby(key, sort=False)
        agg = g.agg(mn=("day", "min"), mx=("day", "max"),
                    s=("c", "sum"), sq=("c2", "sum"), cf=("c", "first"),
                    cl=("c", "last")).reset_index()
        p = (pser.groupby(level=0, sort=False).sum()
             .reindex(agg[key], fill_value=0).to_numpy(dtype=object))
        n = (agg["mx"] - agg["mn"] + 1).to_numpy().astype(object)
        s = agg["s"].to_numpy().astype(object)
        sq = agg["sq"].to_numpy().astype(object)
        cf = agg["cf"].to_numpy().astype(object)
        cl = agg["cl"].to_numpy().astype(object)
        num = (n * n * p - n * s * (2 * s - cf - cl)
               + (n - 1) * s * s) * 1_000_000
        den = n * n * sq - n * s * s
        den_safe = np.where(den > 0, den, 1)
        ppm = np.where(den > 0,
                       np.where(num < 0, -((-num) // den_safe),
                                num // den_safe),
                       0)
        return pd.DataFrame({
            key: agg[key].to_numpy(),
            "n_days": n.astype(np.int64),
            "n_events": s.astype(np.int64),
            "autocorr_ppm": ppm.astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def daily_autocorr_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: lead() pairs consecutive observed days for P,
    arg_min/arg_max pick the grid-edge counts, HUGEINT moments, DuckDB
    ``//`` truncation == the engine's sign-split."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        adj AS (
          SELECT kk, day, c,
                 lead(day) OVER (PARTITION BY kk ORDER BY day) AS nday,
                 lead(c)   OVER (PARTITION BY kk ORDER BY day) AS nc
          FROM d
        ),
        g AS (
          SELECT kk,
                 (max(day) - min(day) + 1)::HUGEINT AS n,
                 sum(c)::HUGEINT AS s,
                 sum(c::HUGEINT * c) AS sq,
                 coalesce(sum(CASE WHEN nday = day + 1
                                   THEN c::HUGEINT * nc END), 0) AS p,
                 arg_min(c, day)::HUGEINT AS cf,
                 arg_max(c, day)::HUGEINT AS cl
          FROM adj GROUP BY 1
        ),
        f AS (
          SELECT kk, n, s,
                 n * n * p - n * s * (2 * s - cf - cl)
                   + (n - 1) * s * s AS num,
                 n * n * sq - n * s * s AS den
          FROM g
        )
        SELECT kk AS {key}, n::BIGINT AS n_days, s::BIGINT AS n_events,
               CASE WHEN den > 0 THEN (num * 1000000 // den)::BIGINT
                    ELSE 0 END AS autocorr_ppm
        FROM f"""


# ---------------------------------------------------------------------------
# Markov stationary distribution over the behavioral transition chain


_MARKOV_SCALE = 10**12


def markov_stationary(ds, *, key: str = "user_id", ts: str = "ts",
                      type_col: str = "event_type", tiebreak=None,
                      iterations: int = 12, num_buckets: int = 32):
    """Stationary distribution of the first-order behavioral Markov chain
    — the long-run occupancy the transition COUNTS only hint at:
    :func:`event_transitions` says "click→purchase happens 3× more than
    view→purchase", the stationary vector says "in steady state, X ppm
    of a user's time is spent in `purchase`" — the summary a
    session-simulation, cache-sizing or funnel-health pass consumes
    (and the event-type analog of pagerank, which is exactly this
    computation on the link graph).

    Exact-integer contract (the pagerank recurrence convention): states
    = the distinct types on either side of the transition table;
    DANGLING states (no outgoing transitions) get a synthetic self-loop
    ``c=r=1`` so mass is conserved without a redistribution term;
    ``pi_0 = SCALE // L`` and
    ``pi_{t+1}[j] = Σ_i pi_t[i]·c_ij // r_i`` with the floor applied PER
    TERM (that is what the SQL mirror replays); after ``iterations``
    fixed steps, ``pi_ppm = pi·10⁶ // SCALE``. Deterministic,
    partitioning-independent, replayable.

    Scale shape: all the distributed work lives in
    :func:`event_transitions` (one key-bucketed exchange, ≤ |types|²
    partials); the chain itself is a bounded ≤ L² matrix, so the power
    iteration is a driver finish in Python ints — the grouped_emd
    posture."""
    trans = event_transitions(ds, key=key, ts=ts, type_col=type_col,
                              tiebreak=tiebreak,
                              num_buckets=num_buckets).to_pandas()
    states = sorted(set(trans["from_type"]) | set(trans["to_type"]))
    if not states:
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            type_col: pd.Series([], dtype=object),
            "pi_ppm": pd.Series([], dtype="int64")}))
    outd = trans.groupby("from_type")["n"].sum().to_dict()
    edges = [(f, t, int(c), int(outd[f]))
             for f, t, c in zip(trans["from_type"], trans["to_type"],
                                trans["n"])]
    edges += [(s, s, 1, 1) for s in states if s not in outd]
    L = len(states)
    pi = {s: _MARKOV_SCALE // L for s in states}
    for _ in range(iterations):
        nxt = {s: 0 for s in states}
        for f, t, c, r in edges:
            nxt[t] += pi[f] * c // r
        pi = nxt
    out = pd.DataFrame({
        type_col: states,
        "pi_ppm": [pi[s] * 1_000_000 // _MARKOV_SCALE for s in states],
    })
    out["pi_ppm"] = out["pi_ppm"].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def markov_stationary_sql(*, key: str = "user_id", ts: str = "ts",
                          type_col: str = "event_type",
                          tiebreak: str = "event_id",
                          table: str = "events",
                          iterations: int = 12) -> str:
    """SQL mirror: transition CTE + dangling self-loops, then the power
    iteration UNROLLED one CTE per step with the identical per-term
    HUGEINT floor."""
    steps = []
    prev = "p0"
    for i in range(1, iterations + 1):
        steps.append(f"""
        p{i} AS (
          SELECT m.dst AS st, sum({prev}.pi * m.c // m.r) AS pi
          FROM {prev} JOIN m ON m.src = {prev}.st GROUP BY 1
        )""")
        prev = f"p{i}"
    return f"""
        WITH trans AS (
          SELECT from_type, to_type, count(*)::BIGINT AS n FROM (
            SELECT {type_col} AS from_type,
                   lead({type_col}) OVER (PARTITION BY {key}
                       ORDER BY {ts}, {tiebreak}) AS to_type
            FROM {table}
          ) WHERE to_type IS NOT NULL GROUP BY 1, 2
        ),
        states AS (
          SELECT DISTINCT t FROM (
            SELECT from_type AS t FROM trans
            UNION SELECT to_type FROM trans)
        ),
        outd AS (SELECT from_type, sum(n)::HUGEINT AS r FROM trans
                 GROUP BY 1),
        m AS (
          SELECT from_type AS src, to_type AS dst, n::HUGEINT AS c,
                 outd.r AS r
          FROM trans JOIN outd USING (from_type)
          UNION ALL
          SELECT s.t, s.t, 1::HUGEINT, 1::HUGEINT
          FROM states s LEFT JOIN outd ON outd.from_type = s.t
          WHERE outd.from_type IS NULL
        ),
        nstates AS (SELECT count(*)::HUGEINT AS l FROM states),
        p0 AS (SELECT t AS st, {_MARKOV_SCALE}::HUGEINT // nstates.l AS pi
               FROM states, nstates),{",".join(steps)}
        SELECT states.t AS {type_col},
               (coalesce({prev}.pi, 0) * 1000000
                // {_MARKOV_SCALE})::BIGINT AS pi_ppm
        FROM states LEFT JOIN {prev} ON {prev}.st = states.t
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# double-fire event detection (telemetry-quality dedup)


def duplicate_events(ds, *, key: str, ts: str, match_cols,
                     within_us: int = 5_000_000, tiebreak=None,
                     num_buckets: int = 32):
    """Double-fire detection over an event stream: flag every event whose
    identical ``(key, match_cols...)`` tuple already fired within
    ``within_us`` BEFORE it — the telemetry-quality dedup every
    analytics ingest runs (client retries, at-least-once queues and
    double-clicks all stamp near-identical events seconds apart; exact
    dedup misses them because the timestamp differs, session logic
    mustn't see them at all). Emits the full stream with ``is_dup`` so
    the fix is auditable (``filter`` downstream to drop).

    Chain semantics: each event compares to the PREVIOUS event of the
    same (key, match) tuple, so a burst of N copies flags N−1 (every
    copy after the first in each ≤-window step) — the lag-window
    contract, mirrored exactly by SQL.

    Scale shape: ONE key-bucketed exchange; inside each bucket one
    mergesort by (key, match..., ts, tiebreak) and a vectorized
    shifted-comparison — same posture as :func:`lag_lead`."""
    match_cols = list(match_cols)
    sort_cols = [key] + match_cols + [ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(is_dup=pd.Series([], dtype=bool))
        df = df.sort_values(sort_cols, kind="mergesort")
        t = df[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.ones(len(df), dtype=bool)
        for c in [key] + match_cols:
            v = df[c].to_numpy()
            same &= np.concatenate([[False], v[1:] == v[:-1]])
        gap = np.concatenate([[np.iinfo(np.int64).max],
                              t[1:] - t[:-1]])
        df = df.assign(is_dup=same & (gap <= within_us))
        return df

    return bucketed_map_groups(ds, key, per_bucket,
                               num_buckets=num_buckets)


def duplicate_events_sql(*, table: str, key: str, ts: str, match_cols,
                         within_us: int = 5_000_000,
                         tiebreak: str = "event_id",
                         columns: str = "*") -> str:
    """SQL mirror: lag window over the identical partition + order."""
    match_cols = list(match_cols)
    part = ", ".join([key] + match_cols)
    return f"""
        SELECT {columns},
               coalesce(
                 epoch_us({ts}) - lag(epoch_us({ts})) OVER (
                   PARTITION BY {part} ORDER BY {ts}, {tiebreak})
                 <= {int(within_us)}, FALSE) AS is_dup
        FROM {table}"""


def event_trigrams(ds, *, key: str = "user_id", ts: str = "ts",
                   type_col: str = "event_type", tiebreak=None,
                   top_k: int = 25, num_buckets: int = 32):
    """Top-k ordered event TRIGRAMS (within-entity paths of length 3) —
    the path-mining step up from :func:`event_transitions`' first-order
    pairs: funnels and UX loops are ≥3 steps (view→click→purchase,
    error→retry→error), and a first-order chain provably cannot
    distinguish A→B→A ping-pong from A→B→C progression — the trigram
    table can, which is why product-analytics path reports are built on
    it. Emits ``(t1, t2, t3, n)`` for the k most frequent trigrams,
    ``(n DESC, t1, t2, t3)`` order contract.

    Scale shape: ONE key-bucketed exchange (event_transitions' posture);
    inside each bucket one mergesort and two vectorized shifts build all
    trigrams, per-bucket partials collapse to ≤ |types|³ rows, and the
    lossless local-top-k argument bounds the final fold (a trigram
    outside every bucket's local table can't reach the global top-k only
    if counted per-bucket-complete — which it is NOT across buckets, so
    the fold keeps ALL ≤ |types|³ partials, an audit-sized table by the
    bounded-type contract, then ranks)."""
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="mergesort")
        g = df.groupby(key, sort=False)[type_col]
        t2 = g.shift(-1)
        t3 = g.shift(-2)
        mask = t3.notna()
        tri = pd.DataFrame({
            "t1": df.loc[mask, type_col].to_numpy(),
            "t2": t2[mask].to_numpy(),
            "t3": t3[mask].to_numpy(),
        })
        out = (tri.groupby(["t1", "t2", "t3"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = bucketed_map_groups(ds, key, per_bucket,
                                   num_buckets=num_buckets)
    folded = (partials.to_pandas()
              .groupby(["t1", "t2", "t3"], as_index=False)["n"].sum()
              .sort_values(["n", "t1", "t2", "t3"],
                           ascending=[False, True, True, True],
                           kind="mergesort")
              .head(top_k).reset_index(drop=True))
    import ray.data

    return ray.data.from_pandas(folded)


def event_trigrams_sql(*, key: str = "user_id", ts: str = "ts",
                       type_col: str = "event_type",
                       tiebreak: str = "event_id",
                       table: str = "events", top_k: int = 25) -> str:
    """SQL mirror: double lead() window + (n DESC, t1, t2, t3) rank."""
    return f"""
        WITH s AS (
          SELECT {type_col} AS t1,
                 lead({type_col}, 1) OVER w AS t2,
                 lead({type_col}, 2) OVER w AS t3
          FROM {table}
          WINDOW w AS (PARTITION BY {key} ORDER BY {ts}, {tiebreak})
        ),
        c AS (
          SELECT t1, t2, t3, count(*)::BIGINT AS n
          FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
        )
        SELECT t1, t2, t3, n FROM c
        ORDER BY n DESC, t1, t2, t3 LIMIT {top_k}"""


def daily_trend(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key least-squares trend of the zero-filled daily count series,
    in exact integer ppm-per-day — the DIRECTION metric completing the
    daily-grid triptych: :func:`change_point` localizes a shift,
    :func:`fano_factor` measures dispersion, this measures sustained
    growth or decay — the "is this source dying" input to crawl-budget
    reallocation. With day index x = 0..n−1 and counts y (zeros
    included via closed-form Σx, Σx² over the span):

        ``slope_ppm = (n·Σxy − Σx·Σy) · 10⁶ // (n·Σx² − (Σx)²)``

    — the OLS slope in events/day scaled by 10⁶, exact, with the
    division TRUNCATING toward zero by documented contract (the
    interpolate_daily convention: DuckDB ``//`` truncates, so the engine
    computes ``sign·(|num| // den)`` explicitly — a floor here would
    drift one ulp on negative slopes). Single-day keys are excluded
    (den = 0, no trend exists — the change_point convention).

    Scale shape: moments only — zero days contribute nothing to Σxy and
    Σy, and Σx/Σx² close over the span — so per-batch (key, day, count)
    Arrow partials, ONE key-bucketed exchange, object-int finish (n·Σxy
    passes int64 for hot keys)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "n_days": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "slope_ppm": pd.Series([], dtype="int64")})
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        g = df.groupby(key, sort=False)
        mn = g["day"].transform("min")
        df = df.assign(x=(df["day"] - mn), xy=(df["day"] - mn) * df["c"])
        agg = g.agg(mn=("day", "min"), mx=("day", "max"),
                    s=("c", "sum")).reset_index()
        sxy = df.groupby(key, sort=False)["xy"].sum().to_numpy()
        n = (agg["mx"] - agg["mn"] + 1).to_numpy().astype(object)
        sy = agg["s"].to_numpy().astype(object)
        sxy = sxy.astype(object)
        keep = n > 1
        agg, n, sy, sxy = agg[keep], n[keep], sy[keep], sxy[keep]
        if not len(agg):
            return per_bucket(df.iloc[0:0][[key, "day", "c"]])
        sx = n * (n - 1) // 2
        sx2 = (n - 1) * n * (2 * n - 1) // 6
        num = (n * sxy - sx * sy) * 1_000_000
        den = n * sx2 - sx * sx
        neg = num < 0
        slope = np.where(neg, -((-num) // den), num // den)
        return pd.DataFrame({
            key: agg[key].to_numpy(),
            "n_days": n.astype(np.int64),
            "n_events": sy.astype(np.int64),
            "slope_ppm": slope.astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def daily_trend_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: observed-day moments + closed-form Σx/Σx², the
    shifted HUGEINT division for negative-slope agreement."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        b AS (SELECT kk, min(day) AS mn FROM d GROUP BY 1),
        g AS (
          SELECT d.kk, (max(d.day) - min(d.day) + 1)::HUGEINT AS n,
                 sum(d.c)::HUGEINT AS sy,
                 sum((d.day - b.mn)::HUGEINT * d.c) AS sxy
          FROM d JOIN b ON b.kk = d.kk GROUP BY 1
        )
        SELECT kk AS {key}, n::BIGINT AS n_days, sy::BIGINT AS n_events,
               (((n * sxy - (n * (n - 1) // 2) * sy) * 1000000)
                // (n * ((n - 1) * n * (2 * n - 1) // 6)
                    - (n * (n - 1) // 2) * (n * (n - 1) // 2))
               )::BIGINT AS slope_ppm
        FROM g WHERE n > 1"""


def theil_sen_trend(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key Theil–Sen robust trend of the zero-filled daily count
    series — the outlier-proof sibling of :func:`daily_trend`'s OLS
    slope (Theil 1950 / Sen 1968: the median of all pairwise slopes has
    a 29.3% breakdown point, so one viral day or one outage day cannot
    flip the verdict the way it can swing least squares; when the two
    ops disagree, the OUTLIER is the story). Contract: slopes are
    computed per day pair (i < j over the closed zero-filled grid) as
    ``(y_j − y_i)·10⁶ // (j − i)`` with the TRUNCATING per-pair
    division of the daily_trend convention, and the reported value is
    the LOWER median (0-based position ``(m−1)//2`` of the sorted slope
    multiset — quantile_disc's convention). Single-day keys are
    excluded.

    Scale shape: the change_point partials (per-batch (key, day, count)
    Arrow fold, ONE key-bucketed exchange), then a per-bucket vectorized
    pair kernel — np.triu indices over each key's grid, O(span²) pairs
    bounded by the day-span contract, one sort per key."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if len(df):
            df = (df.groupby([key, "day"], as_index=False,
                             sort=False)["c"].sum())
            for kk, sub in df.groupby(key, sort=False):
                mn, mx = int(sub["day"].min()), int(sub["day"].max())
                n = mx - mn + 1
                if n < 2:
                    continue
                y = np.zeros(n, dtype=np.int64)
                y[sub["day"].to_numpy() - mn] = sub["c"].to_numpy()
                i, j = np.triu_indices(n, k=1)
                dy = (y[j] - y[i]) * 1_000_000
                dx = (j - i).astype(np.int64)
                neg = dy < 0
                sl = np.where(neg, -((-dy) // dx), dy // dx)
                sl.sort()
                m = len(sl)
                rows.append((kk, n, m, int(sl[(m - 1) // 2])))
        out = pd.DataFrame(rows, columns=[key, "n_days", "n_pairs",
                                          "ts_slope_ppm"])
        for c in (key, "n_days", "n_pairs", "ts_slope_ppm"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def theil_sen_trend_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: zero-filled lateral grid, i<j self-join, truncating
    per-pair slope, lower-median row_number pick."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        b AS (
          SELECT kk, min(day) AS mn, max(day) AS mx,
                 (max(day) - min(day) + 1)::BIGINT AS n
          FROM d GROUP BY 1 HAVING max(day) > min(day)
        ),
        g0 AS (
          SELECT b.kk, b.n, b.mn, u.x
          FROM b, unnest(generate_series(0, (b.mx - b.mn)::BIGINT)) AS u(x)
        ),
        grid AS (
          SELECT g0.kk, g0.n, g0.x, coalesce(d.c, 0)::BIGINT AS y
          FROM g0 LEFT JOIN d
            ON d.kk = g0.kk AND d.day = g0.x + g0.mn
        ),
        slopes AS (
          SELECT a.kk, a.n, (b2.y - a.y) * 1000000 // (b2.x - a.x)
                     AS sl
          FROM grid a JOIN grid b2
            ON a.kk = b2.kk AND a.x < b2.x
        ),
        ranked AS (
          SELECT kk, n, sl,
                 row_number() OVER (PARTITION BY kk ORDER BY sl) AS rn,
                 count(*) OVER (PARTITION BY kk) AS m
          FROM slopes
        )
        SELECT kk AS {key}, n AS n_days, m::BIGINT AS n_pairs,
               sl::BIGINT AS ts_slope_ppm
        FROM ranked WHERE rn = (m - 1) // 2 + 1"""


def survival_curve(ds, *, key: str, ts: str, censor_gap_days: int = 3,
                   num_buckets: int = 32):
    """Discrete Kaplan–Meier retention curve over entity lifetimes — the
    censoring-correct answer to "how long do users stay" that a naive
    lifetime histogram gets wrong: users still active near the end of
    the observation window haven't churned, they're CENSORED, and
    counting them as short lifetimes biases retention down exactly where
    the product-limit estimator (Kaplan & Meier, JASA 1958) doesn't.
    Lifetime = last_active_day − first_active_day; a subject whose last
    activity lies within ``censor_gap_days`` of the corpus's max day is
    censored at its observed lifetime (at risk through it, no churn
    event). One row per CHURN duration d: ``n_at_risk`` (lifetime ≥ d,
    censored included), ``n_churned`` (churn events at d), and
    ``survival_ppm`` — the product limit staged with a PER-STEP floor
    (``S_i = S_{i−1}·(r_i − e_i) // r_i`` at scale 10⁶, the
    markov/pagerank per-term-floor convention) so both engines replay it
    bit-exactly.

    Scale shape: per-batch (key, min, max) Arrow partials, ONE
    key-bucketed exchange for exact per-subject bounds, a map-side
    collapse to the bounded (duration, churn/censor) count table, and
    the KM walk on the driver in Python ints; recursive-CTE mirror walks
    the identical ordered durations carrying S."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by(key).aggregate([("day", "min"), ("day", "max")])
        return g.rename_columns([key, "mn", "mx"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"mn": pd.Series([], dtype="int64"),
                                 "mx": pd.Series([], dtype="int64"),
                                 key: pd.Series([], dtype="int64")})
        g = df.groupby(key, as_index=False).agg(mn=("mn", "min"),
                                                mx=("mx", "max"))
        return g[[key, "mn", "mx"]]

    subjects = (bucketed_map_groups(partials, key, per_bucket,
                                    num_buckets=num_buckets)
                .to_pandas())
    empty = pd.DataFrame({
        "duration_days": pd.Series([], dtype="int64"),
        "n_at_risk": pd.Series([], dtype="int64"),
        "n_churned": pd.Series([], dtype="int64"),
        "survival_ppm": pd.Series([], dtype="int64")})
    if not len(subjects):
        return empty
    gmax = int(subjects["mx"].max())
    dur = (subjects["mx"] - subjects["mn"]).to_numpy()
    censored = (gmax - subjects["mx"].to_numpy()) < censor_gap_days
    tbl = pd.DataFrame({"d": dur, "cen": censored}).groupby(
        ["d", "cen"]).size().reset_index(name="n")
    n_total = int(tbl["n"].sum())
    # at-risk at d = subjects with duration >= d
    by_d = tbl.groupby("d").agg(
        e=("n", lambda s: 0), n_all=("n", "sum")).reset_index()
    churn = tbl[~tbl["cen"]].set_index("d")["n"]
    by_d["e"] = by_d["d"].map(churn).fillna(0).astype(int)
    by_d = by_d.sort_values("d")
    cum_before = np.concatenate(
        [[0], np.cumsum(by_d["n_all"].to_numpy())[:-1]])
    rows = []
    s = 1_000_000
    for d, e, cb in zip(by_d["d"], by_d["e"], cum_before):
        r = n_total - int(cb)
        if e:
            s = s * (r - int(e)) // r
            rows.append((int(d), r, int(e), s))
    out = pd.DataFrame(rows, columns=["duration_days", "n_at_risk",
                                      "n_churned", "survival_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    # the curve is an audit-sized driver artifact; returned as pandas so a
    # zero-churn corpus keeps its typed schema (an empty Ray Dataset
    # reports no columns)
    return out


def survival_curve_sql(*, table: str, key: str, ts: str,
                       censor_gap_days: int = 3) -> str:
    """SQL mirror: per-subject bounds, censor flag vs the global max day,
    duration fold, recursive product-limit walk with the identical
    per-step floor."""
    return f"""
        WITH RECURSIVE s0 AS (
          SELECT {key} AS kk,
                 min(epoch_us({ts}) // 86400000000) AS mn,
                 max(epoch_us({ts}) // 86400000000) AS mx
          FROM {table} GROUP BY 1
        ),
        gm AS (SELECT max(mx) AS gmax FROM s0),
        subj AS (
          SELECT (mx - mn)::BIGINT AS d,
                 (gm.gmax - mx) < {censor_gap_days} AS cen
          FROM s0, gm
        ),
        tot AS (SELECT count(*)::BIGINT AS n FROM subj),
        byd AS (
          SELECT d, count(*)::BIGINT AS n_all,
                 count(*) FILTER (WHERE NOT cen)::BIGINT AS e
          FROM subj GROUP BY 1
        ),
        ranked AS (
          SELECT d, n_all, e,
                 row_number() OVER (ORDER BY d) AS rk,
                 (sum(n_all) OVER (ORDER BY d) - n_all)::BIGINT
                     AS cum_before
          FROM byd
        ),
        walk AS (
          SELECT rk, d, e,
                 (tot.n - cum_before)::BIGINT AS r,
                 CASE WHEN e > 0 THEN
                   1000000::HUGEINT * (tot.n - cum_before - e)
                       // (tot.n - cum_before)
                 ELSE 1000000::HUGEINT END AS s
          FROM ranked, tot WHERE rk = 1
          UNION ALL
          SELECT x.rk, x.d, x.e,
                 (tot.n - x.cum_before)::BIGINT,
                 CASE WHEN x.e > 0 THEN
                   w.s * (tot.n - x.cum_before - x.e)
                       // (tot.n - x.cum_before)
                 ELSE w.s END
          FROM ranked x JOIN walk w ON x.rk = w.rk + 1, tot
        )
        SELECT d AS duration_days, r AS n_at_risk, e AS n_churned,
               s::BIGINT AS survival_ppm
        FROM walk WHERE e > 0 ORDER BY 1"""


def activity_streaks(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key longest run of CONSECUTIVE active days (gaps-and-islands)
    — the engagement-persistence scalar the daily-grid family lacks:
    :func:`fano_factor` sees dispersion and :func:`daily_trend` sees
    direction, but neither distinguishes "active 30 days in a row then
    gone" from "active every other day for 60 days" — the distinction
    retention models and crawl-freshness schedulers key on (reference
    orders pages the same way before chunking, parsers.py:379-381; a
    streak is the temporal analog of a maximal contiguous page run).

    Output per key: ``n_active_days`` (distinct days), ``n_streaks``
    (maximal runs), ``longest_streak`` (days, ties broken to the
    EARLIEST run by documented contract), and ``streak_start`` — the
    start of that longest run as ``timestamp[us]`` (the engine-wide
    timestamp contract).

    Scale shape: map-side distinct on (key, day) collapses each batch to
    at most one row per active day BEFORE the exchange, so only slim
    (key, day) pairs cross — ONE key-bucketed exchange, then a sorted
    vectorized islands pass per bucket (run id = day − rank, a constant
    within a consecutive run)."""
    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        return (pa.table({key: batch.column(key), "day": day})
                .group_by([key, "day"]).aggregate([]))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    key_dtype = "int64"

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype=key_dtype),
            "n_active_days": pd.Series([], dtype="int64"),
            "n_streaks": pd.Series([], dtype="int64"),
            "longest_streak": pd.Series([], dtype="int64"),
            "streak_start": pd.Series([], dtype="datetime64[us]"),
        })
        if not len(df):
            return empty
        df = (df.drop_duplicates([key, "day"])
                .sort_values([key, "day"], kind="mergesort"))
        g = df.groupby(key, sort=False)
        df = df.assign(run=df["day"] - g.cumcount())
        runs = (df.groupby([key, "run"], as_index=False, sort=False)
                  .agg(length=("day", "size"), start=("day", "min")))
        per_key = (runs.groupby(key, as_index=False, sort=False)
                       .agg(n_streaks=("length", "size"),
                            n_active_days=("length", "sum")))
        top = (runs.sort_values([key, "length", "start"],
                                ascending=[True, False, True],
                                kind="mergesort")
                   .groupby(key, as_index=False, sort=False).first())
        out = per_key.merge(top[[key, "length", "start"]], on=key)
        return pd.DataFrame({
            key: out[key].to_numpy(),
            "n_active_days": out["n_active_days"].to_numpy().astype(np.int64),
            "n_streaks": out["n_streaks"].to_numpy().astype(np.int64),
            "longest_streak": out["length"].to_numpy().astype(np.int64),
            "streak_start": (out["start"].to_numpy().astype(np.int64)
                             * day_us).astype("datetime64[us]"),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def activity_streaks_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: distinct-day islands via day − row_number (constant
    within a consecutive run), longest run per key with earliest-start
    tie-break, start day rebuilt as make_timestamp(µs)."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day
          FROM {table} GROUP BY 1, 2
        ),
        r AS (
          SELECT kk, day,
                 day - row_number() OVER (
                     PARTITION BY kk ORDER BY day) AS run
          FROM d
        ),
        s AS (
          SELECT kk, run, count(*)::BIGINT AS len, min(day) AS start
          FROM r GROUP BY 1, 2
        ),
        agg AS (
          SELECT kk, count(*)::BIGINT AS n_streaks,
                 sum(len)::BIGINT AS n_active_days
          FROM s GROUP BY 1
        ),
        best AS (
          SELECT kk, len, start, row_number() OVER (
              PARTITION BY kk ORDER BY len DESC, start ASC) AS rn
          FROM s
        )
        SELECT agg.kk AS {key}, agg.n_active_days, agg.n_streaks,
               best.len AS longest_streak,
               make_timestamp(best.start * 86400000000) AS streak_start
        FROM agg JOIN best ON best.kk = agg.kk AND best.rn = 1"""


# ---------------------------------------------------------------------------
# Kleinberg burst detection (forward-filter form of the 2-state automaton)


def burst_detection(ds, *, key: str, ts: str, s: int = 2,
                    gamma_milli: int = 1000, num_buckets: int = 32):
    """Per-key burst detection over the inter-event gap sequence —
    Kleinberg's 2-state infinite automaton (KDD'02) in its FORWARD
    (filtering) form, made a pure integer function of the data so any
    cluster shape and the SQL mirror replay bit-for-bit.

    Model: a key with n gaps over total span T emits gaps from state 0
    (base rate ``a0 = n/T``) or state 1 (burst rate ``a1 = s·a0``,
    default s = 2); entering a burst costs ``γ·ln n``. Where
    :func:`gap_stats`' CV² says "this key is bursty overall", this op
    says WHEN — which stretches of the event stream are the burst —
    the input a recrawl scheduler, a bot-mitigation rule, or a
    trending-window picker actually consumes.

    The engine evaluates the Viterbi forward COST DIFFERENCE
    ``d(j) = c1(j) − c0(j)``, which for the 2-state chain collapses to
    one scalar recursion (derivation: split on the sign of d(j−1)):

        ``d(j) = min(max(d(j−1), 0), Γ) + Δ(x_j)``,  ``d(0) = Γ``

    with Δ(x) = (s−1)·a0·x − ln s the per-gap emission-cost difference
    and Γ = γ·ln n the transition cost; gap j is IN a burst iff
    d(j) < 0 (the filtering state: the cheaper state given the prefix
    — the backward smoothing pass of Kleinberg's batch algorithm is
    deliberately dropped: at stream scale there is no "end of
    sequence" to backtrack from, and the filtered labeling is the one
    an online scheduler can act on; documented divergence).

    Exact-integer convention: everything is multiplied through by
    ``T`` (the recursion is positively homogeneous), which removes
    EVERY division from the hot recursion:

        ``Δ'(x) = (s−1)·n·x·10⁶ − LN_S·T``
        ``Γ'    = (gamma_milli · ilog2(n) · LN2 // 1000) · T``

    in nat-micro units with pinned literals ``LN2 = 693147`` =
    floor(ln 2 ·10⁶) and ``LN_S = floor(ln s ·10⁶)`` (s = 2 → 693147;
    the only supported s values are the pinned ones: 2, 3, 4), and the
    engine-wide floor-log2 bits convention ``ln n ≈ ilog2(n)·ln 2``
    (the psi/woe/theils_u trade: bit-replayability over the exact
    libm log). The s = 2 crossover sits at x = ln 2 · mean-gap,
    exactly Kleinberg's equal-emission-cost point.

    Output per key with ≥ 1 gap: ``n_gaps``, ``n_burst_gaps``
    (gaps labeled burst), ``n_bursts`` (maximal burst runs),
    ``max_burst_gaps`` (longest run, 0 if none), ``burst_share_ppm``
    = n_burst_gaps·10⁶ // n_gaps. All-simultaneous keys (T = 0) fall
    out naturally: every Δ' and Γ' is 0, so d ≡ 0 and no gap is a
    burst (d < 0 strictly). Single-event keys are excluded (no gap
    sequence exists). Deterministic under ts ties: the gap SEQUENCE
    of a sorted multiset of timestamps is unique.

    Scale shape: the recursion needs each key's full time order, so
    (key, ts) rows ship through ONE key-bucketed exchange (the
    sessionize/gap_stats shape). The per-bucket finish vectorizes
    ACROSS keys: one object-int numpy step per global gap index j
    updates every key whose sequence is still live (the random_walks
    step-loop discipline), so the Python-level loop count is
    max-gaps-per-key, not total gaps. Object ints because
    n·x·10⁶ (n rows × µs gaps × 10⁶) passes int64 long before
    web-scale does.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    LN = {2: 693_147, 3: 1_098_612, 4: 1_386_294}
    if s not in LN:
        raise ValueError(f"pinned s values are {sorted(LN)}; got {s}")
    ln_s = LN[s]
    ln2 = LN[2]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({key: batch.column(key), "t": t})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: pd.Series([], dtype="int64"),
                              "n_gaps": pd.Series([], dtype="int64"),
                              "n_burst_gaps": pd.Series([], dtype="int64"),
                              "n_bursts": pd.Series([], dtype="int64"),
                              "max_burst_gaps": pd.Series([], dtype="int64"),
                              "burst_share_ppm": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        df = df.sort_values([key, "t"], kind="mergesort", ignore_index=True)
        k = df[key].to_numpy()
        t = df["t"].to_numpy()
        same = k[1:] == k[:-1]
        gaps = (t[1:] - t[:-1])[same]
        gk = k[:-1][same]
        if not len(gaps):
            return empty
        new = np.empty(len(gk), dtype=bool)
        new[0] = True
        new[1:] = gk[1:] != gk[:-1]
        starts = np.flatnonzero(new)
        m = np.diff(np.append(starts, len(gk)))
        # per-key integer constants (object ints: n*x*1e6 passes int64)
        go = gaps.astype(object)
        n_o = m.astype(object)
        T = np.add.reduceat(go, starts)
        ilog = _seg_ilog2(m)
        gam = (gamma_milli * ilog * ln2 // 1000).astype(object) * T
        # vectorized-across-keys forward recursion
        d = gam.copy()                      # d(0) = Γ'
        state = np.zeros(len(gaps), dtype=bool)
        max_m = int(m.max())
        zero = np.zeros(len(m), dtype=object)
        for j in range(max_m):
            live = m > j
            idx = starts[live] + j
            delta = (s - 1) * n_o[live] * go[idx] * 1_000_000 \
                - ln_s * T[live]
            d[live] = np.minimum(np.maximum(d[live], zero[live]),
                                 gam[live]) + delta
            state[idx] = np.less(d[live], 0)
        # run-length stats per key over the state array
        st = state.astype(np.int64)
        n_burst = np.add.reduceat(st, starts)
        rise = state & ~np.concatenate(([False], state[:-1]))
        rise[starts] = state[starts]        # run starting at a key boundary
        n_runs = np.add.reduceat(rise.astype(np.int64), starts)
        # longest run: positions of burst gaps minus their run rank
        max_run = np.zeros(len(m), dtype=np.int64)
        if state.any():
            seg = np.cumsum(new) - 1        # key index per gap
            pos = np.arange(len(gaps))
            bpos = pos[state]
            bseg = seg[state]
            # island id = position - rank within (key, consecutive run)
            brank = np.arange(len(bpos))
            island = bpos - brank
            # run lengths via change points of (bseg, island)
            chg = np.empty(len(bpos), dtype=bool)
            chg[0] = True
            chg[1:] = (bseg[1:] != bseg[:-1]) | (island[1:] != island[:-1])
            rstarts = np.flatnonzero(chg)
            rlen = np.diff(np.append(rstarts, len(bpos)))
            rkey = bseg[rstarts]
            np.maximum.at(max_run, rkey, rlen)
        share = (n_burst.astype(object) * 1_000_000 // n_o).astype(np.int64)
        return pd.DataFrame({
            key: gk[starts],
            "n_gaps": m.astype(np.int64),
            "n_burst_gaps": n_burst.astype(np.int64),
            "n_bursts": n_runs.astype(np.int64),
            "max_burst_gaps": max_run,
            "burst_share_ppm": share,
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def _seg_ilog2(v: np.ndarray) -> np.ndarray:
    """floor(log2) for int64 v >= 1 (object-int safe wrapper around the
    profile module's exact shift ladder)."""
    from htrc_feature_reader_ray.stages.profile import _ilog2
    return _ilog2(np.asarray(v, dtype=np.int64))


def burst_detection_sql(*, table: str, key: str, ts: str, s: int = 2,
                        gamma_milli: int = 1000) -> str:
    """SQL mirror: lag() gap sequence, per-key HUGEINT constants with
    the length(format('{:b}', n))−1 ilog2, the clamp recursion as a
    recursive CTE stepping j → j+1 across all keys at once, then
    gaps-and-islands run stats over the d < 0 labels."""
    ln = {2: 693_147, 3: 1_098_612, 4: 1_386_294}[s]
    return f"""
        WITH RECURSIVE e AS (
          SELECT {key} AS kk, epoch_us({ts}) AS t FROM {table}
        ),
        o AS (
          SELECT kk, t, row_number() OVER (
              PARTITION BY kk ORDER BY t) AS rn
          FROM e
        ),
        g AS (
          SELECT kk, rn - 1 AS j,
                 (t - lag(t) OVER (PARTITION BY kk ORDER BY rn))::HUGEINT
                     AS gap
          FROM o
          QUALIFY gap IS NOT NULL
        ),
        c AS (
          SELECT kk, count(*)::HUGEINT AS n, sum(gap) AS tt,
                 ({gamma_milli}::HUGEINT
                  * (length(format('{{:b}}', count(*))) - 1)
                  * 693147 // 1000) * sum(gap) AS gam
          FROM g GROUP BY 1
        ),
        d AS (
          SELECT kk, 0::BIGINT AS j, gam AS dv FROM c
          UNION ALL
          SELECT g.kk, g.j,
                 least(greatest(d.dv, 0), c.gam)
                 + ({s - 1}::HUGEINT * c.n * g.gap * 1000000
                    - {ln}::HUGEINT * c.tt)
          FROM d
          JOIN g ON g.kk = d.kk AND g.j = d.j + 1
          JOIN c ON c.kk = d.kk
        ),
        st AS (
          SELECT kk, j, CASE WHEN dv < 0 THEN 1 ELSE 0 END AS b
          FROM d WHERE j >= 1
        ),
        runs AS (
          SELECT kk, j - row_number() OVER (
              PARTITION BY kk ORDER BY j) AS island
          FROM st WHERE b = 1
        ),
        rl AS (
          SELECT kk, count(*)::BIGINT AS len
          FROM runs GROUP BY kk, island
        ),
        ra AS (
          SELECT kk, count(*)::BIGINT AS n_bursts,
                 max(len) AS max_burst_gaps
          FROM rl GROUP BY 1
        ),
        agg AS (
          SELECT kk, count(*)::BIGINT AS n_gaps,
                 sum(b)::BIGINT AS n_burst_gaps,
                 (sum(b)::HUGEINT * 1000000 // count(*))::BIGINT
                     AS burst_share_ppm
          FROM st GROUP BY 1
        )
        SELECT agg.kk AS {key}, agg.n_gaps, agg.n_burst_gaps,
               coalesce(ra.n_bursts, 0)::BIGINT AS n_bursts,
               coalesce(ra.max_burst_gaps, 0)::BIGINT AS max_burst_gaps,
               agg.burst_share_ppm
        FROM agg LEFT JOIN ra ON ra.kk = agg.kk"""


# ---------------------------------------------------------------------------
# Per-key next-state conditional entropy (behavioral predictability)


def transition_entropy(ds, *, key: str, ts: str, state_col: str,
                       tiebreak: str | None = None,
                       num_buckets: int = 32):
    """Per-key conditional entropy of the NEXT state given the current
    one, over the ts-ordered state sequence — the behavioral
    PREDICTABILITY scalar (the Song/Barabási limit-of-predictability
    read, and the per-entity refinement of :func:`event_transitions`'
    corpus-wide matrix): ``H(next|cur) ≈ 0`` bits means the key's next
    action is a deterministic function of its last one (cron, scripted
    bot, strict funnel), ``≈ log2(#states)`` means maximal surprise —
    exactly the signal a bot-mitigation rule or a prefetch scheduler
    ranks keys by, and a dimension :func:`gap_stats` (timing) and
    :func:`fano_factor` (volume) cannot see (STATE order).

    Exact-integer convention (the psi/woe/theils_u floor-log2 bits
    family, at DOUBLED precision via squares):

        ``h2 = Σ_{x,y} c_xy · (ilog2(c_x²) − ilog2(c_xy²))``
        ``h_millibits = h2 · 1000 // (2 · n)``

    with c_xy the key's (cur, next) transition counts, c_x = Σ_y c_xy
    its row marginals and n = Σ c_xy; every term ≥ 0 (c_x ≥ c_xy and
    ilog2 is monotone), so the documented floor trade never produces a
    negative entropy. Squaring doubles the bit resolution of each
    floored log for free (ilog2(v²) ∈ {2·ilog2(v), 2·ilog2(v)+1}).
    Keys with < 2 events (no transition) are excluded.

    Determinism under ts ties: the transition SEQUENCE depends on tie
    order, so ties are broken by ``tiebreak`` (pass the row id column;
    REQUIRED to be total for bit-replayability — the lag_lead
    contract).

    Scale shape: state order needs each key's full sequence, so
    (key, ts, state) rows ship through ONE key-bucketed exchange (the
    sessionize/gap_stats shape); the per-bucket finish is one lexsort
    + shift + a vectorized (key, cur, next) count fold entirely inside
    the bucket (the key's whole sequence is local by construction),
    with ilog2 evaluated array-wise. Output
    ``(key, n_trans, n_states, h_millibits)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups
    from htrc_feature_reader_ray.stages.profile import _ilog2

    cols = [key, ts, state_col] + ([tiebreak] if tiebreak else [])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        out = {key: batch.column(key), "t": t,
               "s": batch.column(state_col)}
        if tiebreak:
            out["tb"] = batch.column(tiebreak)
        return pa.table(out)

    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: pd.Series([], dtype="int64"),
                              "n_trans": pd.Series([], dtype="int64"),
                              "n_states": pd.Series([], dtype="int64"),
                              "h_millibits": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        sort_cols = [key, "t"] + (["tb"] if tiebreak else [])
        df = df.sort_values(sort_cols, kind="mergesort",
                            ignore_index=True)
        k = df[key].to_numpy()
        s = df["s"].to_numpy()
        same = k[1:] == k[:-1]
        if not same.any():
            return empty
        pairs = pd.DataFrame({key: k[:-1][same], "x": s[:-1][same],
                              "y": s[1:][same]})
        c = (pairs.groupby([key, "x", "y"], sort=False)
             .size().rename("c").reset_index())
        cx = (c.groupby([key, "x"], sort=False)["c"].sum()
              .rename("cx").reset_index())
        c = c.merge(cx, on=[key, "x"])
        cv = c["c"].to_numpy().astype(np.int64)
        cxv = c["cx"].to_numpy().astype(np.int64)
        # Square in Python ints: cxv*cxv silently wraps int64 once a
        # per-(key, cur-state) marginal passes ~3.04e9 transitions.
        # These arrays are distinct-transition-table sized (post
        # groupby), so the elementwise bit_length walk is audit-cost.
        bits2 = np.fromiter(
            (((int(a) * int(a)).bit_length() - 1)
             - ((int(b) * int(b)).bit_length() - 1)
             for a, b in zip(cxv, cv)),
            dtype=np.int64, count=len(cv))
        c["term"] = cv * bits2
        g = c.groupby(key, sort=False).agg(
            h2=("term", "sum"), n=("c", "sum"))
        nst = (pairs.drop_duplicates([key, "x"])
               .groupby(key, sort=False).size())
        out = pd.DataFrame({
            key: g.index.to_numpy(),
            "n_trans": g["n"].to_numpy().astype(np.int64),
            "n_states": nst.reindex(g.index).to_numpy().astype(np.int64),
            "h_millibits": (g["h2"].to_numpy().astype(object) * 1000
                            // (2 * g["n"].to_numpy().astype(object))
                            ).astype(np.int64),
        })
        return out.reset_index(drop=True)

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def transition_entropy_sql(*, table: str, key: str, ts: str,
                           state: str, tiebreak: str) -> str:
    """SQL mirror: lead() pairs under the (ts, tiebreak) total order,
    (key, cur, next) counts + row-marginal join, squared-argument
    format('{:b}') floor-log2 terms, one outer floor."""
    return f"""
        WITH o AS (
          SELECT {key} AS kk, {state} AS x,
                 lead({state}) OVER (
                   PARTITION BY {key}
                   ORDER BY {ts}, {tiebreak}) AS y
          FROM {table}
        ),
        c AS (
          SELECT kk, x, y, count(*)::BIGINT AS c
          FROM o WHERE y IS NOT NULL GROUP BY 1, 2, 3
        ),
        m AS (
          SELECT kk, x, sum(c)::BIGINT AS cx FROM c GROUP BY 1, 2
        ),
        t AS (
          SELECT c.kk,
                 sum(c.c * ((length(format('{{:b}}', m.cx * m.cx)) - 1)
                            - (length(format('{{:b}}', c.c * c.c)) - 1))
                     )::HUGEINT AS h2,
                 sum(c.c)::HUGEINT AS n
          FROM c JOIN m ON m.kk = c.kk AND m.x = c.x
          GROUP BY 1
        ),
        ns AS (
          SELECT kk, count(*)::BIGINT AS n_states FROM m GROUP BY 1
        )
        SELECT t.kk AS {key}, t.n::BIGINT AS n_trans, ns.n_states,
               (t.h2 * 1000 // (2 * t.n))::BIGINT AS h_millibits
        FROM t JOIN ns ON ns.kk = t.kk"""


# ---------------------------------------------------------------------------
# Log-rank test (two-group survival comparison over entity lifetimes)


def logrank_test(ds, *, key: str, ts: str, censor_gap_days: int = 3,
                 salt: str = "", num_buckets: int = 32):
    """Log-rank (Mantel–Cox) test over entity lifetimes — the
    censoring-correct answer to "does group A churn faster than group
    B" that completes :func:`survival_curve`'s single-population
    Kaplan–Meier: comparing raw lifetime means double-counts the
    still-active (censored) users; the log-rank statistic compares, at
    every distinct churn time, the observed group-A churn count
    against its hypergeometric expectation among those still AT RISK,
    which is exactly how an experiment readout over retention must be
    scored. Groups come from the engine's deterministic hash split
    (``md5_hash64(salt‖key) % 2``, the ab_lift arm convention), so the
    op is self-contained and A/A-testable — with real assignments,
    hash the experiment arm into the salt upstream.

    Lifetime/censoring contract is :func:`survival_curve`'s verbatim:
    lifetime = last − first active day; a subject whose last activity
    lies within ``censor_gap_days`` of the corpus max day is censored
    (at risk through its lifetime, no churn event).

    Exact-integer convention (nano-unit per-term floors — the
    theils_u order-free sum-of-floors trade, documented slack ≤ 1 nano
    per distinct time): at each distinct duration d with r at risk
    (r1 in arm a), e churn events (e1 in arm a),

        ``u += e1·10⁹ − (e·r1·10⁹ // r)``
        ``v += e·r1·(r−r1)·(r−e)·10⁹ // (r²·(r−1))``   (r ≥ 2)
        ``chi2_ppm = u²·10⁶ // (v·10⁹)``                (v > 0 else 0)

    df = 1: ≥ ~3.84·10⁶ ⇒ p < .05. Output one row:
    ``(n_a, n_b, churn_a, churn_b, chi2_ppm)``.

    Scale shape: per-batch (key, min-day, max-day) partials, the ONE
    key-bucketed exchange for exact per-subject bounds (the
    survival_curve shape) with the corpus max day folded separately
    (max is associative — exact from partials) and broadcast; each
    bucket classifies + collapses to (arm, duration, censored) COUNTS,
    so only a bounded table reaches the driver walk."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by(key).aggregate([("day", "min"), ("day", "max")])
        return g.rename_columns([key, "mn", "mx"])

    partials = ds.map_batches(partial, batch_format="pyarrow"
                              ).materialize()
    gmax = int(partials.max("mx"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"arm": pd.Series([], dtype="int64"),
                              "d": pd.Series([], dtype="int64"),
                              "cen": pd.Series([], dtype="bool"),
                              "n": pd.Series([], dtype="int64")})
        if not len(df):
            return empty
        g = df.groupby(key, as_index=False).agg(mn=("mn", "min"),
                                                mx=("mx", "max"))
        arm = (md5_hash64([f"{salt}{v}" for v in g[key]])
               % np.uint64(2)).astype(np.int64)
        d = (g["mx"] - g["mn"]).to_numpy()
        cen = (gmax - g["mx"].to_numpy()) < censor_gap_days
        out = (pd.DataFrame({"arm": arm, "d": d, "cen": cen})
               .groupby(["arm", "d", "cen"]).size().reset_index(name="n"))
        return out

    tbl = (bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)
           .to_pandas())
    if not len(tbl):
        return pd.DataFrame({c: pd.Series([0], dtype="int64")
                             for c in ("n_a", "n_b", "churn_a",
                                       "churn_b", "chi2_ppm")})
    tbl = tbl.groupby(["arm", "d", "cen"], as_index=False)["n"].sum()
    n_a = int(tbl.loc[tbl["arm"] == 0, "n"].sum())
    n_b = int(tbl.loc[tbl["arm"] == 1, "n"].sum())
    ch = tbl[~tbl["cen"]]
    churn_a = int(ch.loc[ch["arm"] == 0, "n"].sum())
    churn_b = int(ch.loc[ch["arm"] == 1, "n"].sum())
    durs = np.sort(tbl["d"].unique())
    # suffix sums: at risk (all subjects with duration >= d)
    def at_risk(mask):
        per_d = (tbl[mask].groupby("d")["n"].sum()
                 .reindex(durs, fill_value=0).to_numpy())
        return np.cumsum(per_d[::-1])[::-1]
    r_all = at_risk(np.ones(len(tbl), dtype=bool))
    r_a = at_risk((tbl["arm"] == 0).to_numpy())
    e_all = (ch.groupby("d")["n"].sum()
             .reindex(durs, fill_value=0).to_numpy())
    e_a = (ch[ch["arm"] == 0].groupby("d")["n"].sum()
           .reindex(durs, fill_value=0).to_numpy())
    u = v = 0
    for i in range(len(durs)):
        e, e1 = int(e_all[i]), int(e_a[i])
        r, r1 = int(r_all[i]), int(r_a[i])
        if e and r:
            u += e1 * 1_000_000_000 - (e * r1 * 1_000_000_000 // r)
            if r >= 2:
                v += (e * r1 * (r - r1) * (r - e) * 1_000_000_000
                      // (r * r * (r - 1)))
    chi2 = u * u * 1_000_000 // (v * 1_000_000_000) if v > 0 else 0
    return pd.DataFrame({
        "n_a": pd.Series([n_a], dtype="int64"),
        "n_b": pd.Series([n_b], dtype="int64"),
        "churn_a": pd.Series([churn_a], dtype="int64"),
        "churn_b": pd.Series([churn_b], dtype="int64"),
        "chi2_ppm": pd.Series([chi2], dtype="int64")})


def logrank_test_sql(*, table: str, key: str, ts: str,
                     censor_gap_days: int = 3, salt: str = "") -> str:
    """SQL mirror: per-subject bounds + md5 arm, global-max censoring,
    non-equi at-risk counts per distinct duration, identical nano-floor
    u/v accumulation, one outer floor."""
    return f"""
        WITH e AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day
          FROM {table}
        ),
        s AS (
          SELECT kk, min(day) AS mn, max(day) AS mx,
                 (md5_number_upper('{salt}' || kk::VARCHAR)::UBIGINT
                  % 2)::BIGINT AS arm
          FROM e GROUP BY kk
        ),
        g AS (SELECT max(mx) AS gmax FROM s),
        subj AS (
          SELECT arm, mx - mn AS d,
                 ((SELECT gmax FROM g) - mx) < {censor_gap_days} AS cen
          FROM s
        ),
        durs AS (SELECT DISTINCT d FROM subj),
        terms AS (
          SELECT durs.d,
                 count(*) FILTER (WHERE s2.d >= durs.d)::HUGEINT AS r,
                 count(*) FILTER (WHERE s2.d >= durs.d
                                  AND s2.arm = 0)::HUGEINT AS r1,
                 count(*) FILTER (WHERE s2.d = durs.d
                                  AND NOT s2.cen)::HUGEINT AS ev,
                 count(*) FILTER (WHERE s2.d = durs.d AND NOT s2.cen
                                  AND s2.arm = 0)::HUGEINT AS e1
          FROM durs, subj s2 GROUP BY durs.d
        ),
        acc AS (
          SELECT sum(CASE WHEN ev > 0 AND r > 0
                          THEN e1 * 1000000000
                               - (ev * r1 * 1000000000 // r)
                          ELSE 0 END)::HUGEINT AS u,
                 sum(CASE WHEN ev > 0 AND r >= 2
                          THEN (ev * r1 * (r - r1) * (r - ev)
                                * 1000000000) // (r * r * (r - 1))
                          ELSE 0 END)::HUGEINT AS v
          FROM terms
        ),
        counts AS (
          SELECT count(*) FILTER (WHERE arm = 0)::BIGINT AS n_a,
                 count(*) FILTER (WHERE arm = 1)::BIGINT AS n_b,
                 count(*) FILTER (WHERE arm = 0 AND NOT cen)::BIGINT
                     AS churn_a,
                 count(*) FILTER (WHERE arm = 1 AND NOT cen)::BIGINT
                     AS churn_b
          FROM subj
        )
        SELECT counts.n_a, counts.n_b, counts.churn_a, counts.churn_b,
               CASE WHEN acc.v > 0
                    THEN (acc.u * acc.u * 1000000)
                         // (acc.v * 1000000000)
                    ELSE 0 END::BIGINT AS chi2_ppm
        FROM counts, acc"""


def holt_forecast(ds, *, key: str, ts: str, horizon: int = 7,
                  num_buckets: int = 32):
    """Per-key Holt double-exponential smoothing over the zero-filled
    daily event-count grid — the short-horizon activity FORECASTER
    completing the daily-grid family: :func:`daily_trend` fits one
    global slope to the whole history, while Holt tracks a local level
    AND a local trend that exponentially forget the past, which is
    what a recrawl scheduler actually wants ("how active will this
    site be next week", weighting last week far above last quarter).

    The smoothing constants are DYADIC — α = 1/2, β = 1/4 — so the
    recurrence is exact integer arithmetic at fixed-point scale
    S = 4096 (= 2¹²) with ONE floor per update, and the floor is a
    true floor on both sides (numpy ``>>``/``floor_divide`` here; the
    mirror clears DuckDB's truncating ``//`` with the nonnegative-
    remainder identity ``(x − ((x%d)+d)%d) // d``):

        L₀ = S·x₀          B₀ = S·(x₁ − x₀)   (0 when n = 1)
        Lₜ = ⌊(S·xₜ + Lₜ₋₁ + Bₜ₋₁) / 2⌋
        Bₜ = ⌊(Lₜ − Lₜ₋₁ + 3·Bₜ₋₁) / 4⌋
        forecast = L_T + horizon·B_T

    Output per key: ``(key, n_days, level_x4096, trend_x4096,
    forecast_x4096)`` — fixed-point ×4096, negative forecasts are
    real readouts (decaying sites), n over the key's OWN min..max
    day span.

    Scale shape: per-batch (key, day, count) Arrow partials, ONE
    key-bucketed exchange; inside the bucket the recurrence runs
    VECTORIZED ACROSS KEYS (one numpy step per grid day, not per
    (key, day)) over a keys×span matrix — memory is 8·|bucket keys|·
    span bytes, so ``num_buckets`` bounds it (documented; a 365-day
    window at 1M keys/bucket is ~3 GB — size buckets to the worker).
    int64 holds to daily counts ~2⁵⁰; the mirror is HUGEINT."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000
    S = 4096

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    empty = {key: pd.Series([], dtype="int64"),
             "n_days": pd.Series([], dtype="int64"),
             "level_x4096": pd.Series([], dtype="int64"),
             "trend_x4096": pd.Series([], dtype="int64"),
             "forecast_x4096": pd.Series([], dtype="int64")}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        mn = df.groupby(key, sort=False)["day"].transform("min")
        df["j"] = (df["day"] - mn).astype("int64")
        keys_idx, keys = pd.factorize(df[key], sort=True)
        span = np.zeros(len(keys), dtype=np.int64)
        np.maximum.at(span, keys_idx, df["j"].to_numpy())
        t_max = int(span.max())
        x = np.zeros((len(keys), t_max + 1), dtype=np.int64)
        x[keys_idx, df["j"].to_numpy()] = df["c"].to_numpy()

        lv = S * x[:, 0]
        b = np.where(span >= 1,
                     S * (x[:, 1] if t_max >= 1 else 0) - S * x[:, 0], 0)
        for t in range(1, t_max + 1):
            active = span >= t
            lnew = (S * x[:, t] + lv + b) >> 1
            bnew = np.floor_divide(lnew - lv + 3 * b, 4)
            lv = np.where(active, lnew, lv)
            b = np.where(active, bnew, b)
        return pd.DataFrame({
            key: keys,
            "n_days": (span + 1).astype("int64"),
            "level_x4096": lv.astype("int64"),
            "trend_x4096": b.astype("int64"),
            "forecast_x4096": (lv + horizon * b).astype("int64"),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def holt_forecast_sql(*, table: str, key: str, ts: str,
                      horizon: int = 7) -> str:
    """SQL mirror: zero-filled grid via generate_series over each key's
    span, the identical dyadic recurrence as a recursive CTE stepping
    j → j+1 across all keys at once (the burst_detection idiom), floors
    cleared of DuckDB truncation with the nonnegative-remainder
    identity."""

    def fdiv(x: str, d: int) -> str:
        return f"(({x}) - (((({x}) % {d}) + {d}) % {d})) // {d}"

    lnew = fdiv("4096 * g.x + r.l + r.b", 2)
    bnew = fdiv("s.lnew - s.l + 3 * s.b", 4)
    return f"""
        WITH RECURSIVE obs AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::HUGEINT AS x
          FROM {table} GROUP BY 1, 2
        ),
        ext AS (
          SELECT kk, min(day) AS mn,
                 (max(day) - min(day))::BIGINT AS span
          FROM obs GROUP BY 1
        ),
        grid AS MATERIALIZED (
          SELECT e.kk, e.j::BIGINT AS j, coalesce(o.x, 0)::HUGEINT AS x,
                 e.span
          FROM (SELECT ext.kk, ext.mn, ext.span, u.j
                FROM ext, unnest(generate_series(0, ext.span)) AS u(j)) e
          LEFT JOIN obs o ON o.kk = e.kk AND o.day = e.mn + e.j
        ),
        r AS (
          SELECT g0.kk, 0::BIGINT AS j,
                 (4096 * g0.x)::HUGEINT AS l,
                 (CASE WHEN g0.span >= 1
                       THEN 4096 * (g1.x - g0.x) ELSE 0 END)::HUGEINT AS b
          FROM (SELECT * FROM grid WHERE j = 0) g0
          LEFT JOIN (SELECT * FROM grid WHERE j = 1) g1
            ON g1.kk = g0.kk
          UNION ALL
          SELECT s.kk, s.j, s.lnew, ({bnew})::HUGEINT
          FROM (
            SELECT r.kk, r.j + 1 AS j, r.l, r.b,
                   ({lnew})::HUGEINT AS lnew
            FROM r JOIN grid g ON g.kk = r.kk AND g.j = r.j + 1
          ) s
        )
        SELECT r.kk AS {key}, (ext.span + 1)::BIGINT AS n_days,
               r.l::BIGINT AS level_x4096, r.b::BIGINT AS trend_x4096,
               (r.l + {horizon} * r.b)::BIGINT AS forecast_x4096
        FROM r JOIN ext ON ext.kk = r.kk AND r.j = ext.span"""


def dominant_period(ds, *, key: str, ts: str, min_lag: int = 2,
                    max_lag: int = 14, num_buckets: int = 32):
    """Per-key dominant activity cadence: the lag L ∈ [min_lag,
    max_lag] maximizing the exact lag-L autocorrelation of the
    zero-filled daily count grid — the GENERAL periodicity detector
    beside :func:`seasonal_strength` (which tests the weekly=7
    hypothesis specifically) and :func:`daily_autocorr` (lag-1
    memory): a 3-day cron, a biweekly publishing schedule, or a
    weekday-only crawler all surface as their own best lag. Ties
    break to the SMALLEST lag (a 7-day cycle also scores at 14; the
    fundamental wins).

    Exact integer algebra — :func:`daily_autocorr`'s moments-only
    derivation generalized to lag L over the n-day grid (×n²):

        num_L = n²·P_L − n·S·(2S − head_L − tail_L) + (n−L)·S²
        den   = n²·Σx² − n·S²
        r_L   = trunc(num_L·10⁶ / den)        (DuckDB ``//`` ==
                                               the engine sign-split)

    with P_L = Σ xₜ·xₜ₊L (only OBSERVED day pairs L apart contribute —
    no grid materialization), head_L/tail_L the observed mass in the
    first/last L grid days. Lags with n ≤ L are invalid; keys with no
    valid lag (short span or zero variance) report (0, 0) by the
    daily_autocorr zero-dispersion contract.

    Scale shape: the daily_autocorr posture — per-batch (key, day,
    count) Arrow partials, ONE key-bucketed exchange; inside the
    bucket P_L for all lags comes from searchsorted probes on a
    composite (key, day) int key (13 vectorized probes, no per-key
    loop), head/tail from masked np.add.at folds. Object-int finish
    (n²·Σx²·10⁶ passes int64 only to ~10⁵ daily events/key). Output
    ``(key, n_days, n_events, best_lag, autocorr_ppm)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000
    lags = list(range(min_lag, max_lag + 1))

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        g = tb.group_by([key, "day"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "day", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    empty = {key: pd.Series([], dtype="int64"),
             "n_days": pd.Series([], dtype="int64"),
             "n_events": pd.Series([], dtype="int64"),
             "best_lag": pd.Series([], dtype="int64"),
             "autocorr_ppm": pd.Series([], dtype="int64")}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        df = df.groupby([key, "day"], as_index=False, sort=False)["c"].sum()
        df = df.sort_values([key, "day"], kind="mergesort",
                            ignore_index=True)
        kf, keys = pd.factorize(df[key], sort=True)
        day = df["day"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        nk = len(keys)
        mn = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(nk, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, kf, day)
        np.maximum.at(mx, kf, day)
        s = np.zeros(nk, dtype=object)
        sq = np.zeros(nk, dtype=object)
        np.add.at(s, kf, c.astype(object))
        np.add.at(sq, kf, (c.astype(object) * c))
        n = (mx - mn + 1).astype(object)
        den = n * n * sq - n * s * s
        j = day - mn[kf]          # grid offset within the key's span
        rev = mx[kf] - day        # offset from the key's last day
        comb = kf.astype(np.int64) * (1 << 32) + j

        best_r = np.zeros(nk, dtype=object)
        best_l = np.zeros(nk, dtype=np.int64)
        has_best = np.zeros(nk, dtype=bool)
        for lag in lags:
            # P_L via one searchsorted probe on the composite key
            idx = np.searchsorted(comb, comb + lag)
            idx = np.minimum(idx, len(comb) - 1)
            hit = comb[idx] == comb + lag
            p = np.zeros(nk, dtype=object)
            if hit.any():
                np.add.at(p, kf[hit],
                          c[hit].astype(object) * c[idx[hit]])
            head = np.zeros(nk, dtype=object)
            tail = np.zeros(nk, dtype=object)
            hm = j < lag
            tm = rev < lag
            np.add.at(head, kf[hm], c[hm].astype(object))
            np.add.at(tail, kf[tm], c[tm].astype(object))
            num = (n * n * p - n * s * (2 * s - head - tail)
                   + (n - lag) * s * s) * 1_000_000
            zeros = np.zeros(nk, dtype=object)
            valid = (n > lag) & (den > zeros)
            den_safe = np.where(valid, den, np.ones(nk, dtype=object))
            rv = np.where(num < zeros,
                          -((-num) // den_safe), num // den_safe)
            # strict > keeps the SMALLEST lag on ties (lags ascend)
            take = valid & (rv > np.where(has_best, best_r, rv - 1))
            best_r = np.where(take, rv, best_r)
            best_l = np.where(take, lag, best_l)
            has_best |= take
        out_r = np.where(has_best, best_r, 0).astype(np.int64)
        out_l = np.where(has_best, best_l, 0)
        return pd.DataFrame({
            key: keys,
            "n_days": n.astype(np.int64),
            "n_events": s.astype(np.int64),
            "best_lag": out_l.astype(np.int64),
            "autocorr_ppm": out_r,
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def dominant_period_sql(*, table: str, key: str, ts: str,
                        min_lag: int = 2, max_lag: int = 14) -> str:
    """SQL mirror: observed-pair self-joins per lag (one lag CROSS
    JOIN), per-key head/tail conditional mass, the identical ×n²
    moments formula, argmax via row_number (r desc, lag asc)."""
    klist = ", ".join(str(x) for x in range(min_lag, max_lag + 1))
    return f"""
        WITH d AS (
          SELECT {key} AS kk, epoch_us({ts}) // 86400000000 AS day,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        ext AS (
          SELECT kk, min(day) AS mn, max(day) AS mx,
                 (max(day) - min(day) + 1)::HUGEINT AS n,
                 sum(c)::HUGEINT AS s, sum(c::HUGEINT * c) AS sq
          FROM d GROUP BY 1
        ),
        lg AS (SELECT unnest([{klist}])::HUGEINT AS l),
        p AS (
          SELECT d1.kk, lg.l,
                 sum(d1.c::HUGEINT * d2.c)::HUGEINT AS p
          FROM d d1 CROSS JOIN lg
               JOIN d d2 ON d2.kk = d1.kk AND d2.day = d1.day + lg.l
          GROUP BY 1, 2
        ),
        ht AS (
          SELECT d.kk, lg.l,
                 sum(CASE WHEN d.day < ext.mn + lg.l
                          THEN d.c ELSE 0 END)::HUGEINT AS head,
                 sum(CASE WHEN d.day > ext.mx - lg.l
                          THEN d.c ELSE 0 END)::HUGEINT AS tail
          FROM d JOIN ext USING (kk) CROSS JOIN lg
          GROUP BY 1, 2
        ),
        sc AS (
          SELECT ht.kk, ht.l,
                 ((ext.n * ext.n * coalesce(p.p, 0)
                   - ext.n * ext.s * (2 * ext.s - ht.head - ht.tail)
                   + (ext.n - ht.l) * ext.s * ext.s) * 1000000
                  // (ext.n * ext.n * ext.sq - ext.n * ext.s * ext.s))
                     AS r
          FROM ht JOIN ext USING (kk)
               LEFT JOIN p ON p.kk = ht.kk AND p.l = ht.l
          WHERE ext.n > ht.l
            AND ext.n * ext.n * ext.sq - ext.n * ext.s * ext.s > 0
        ),
        rk AS (
          SELECT kk, l, r, row_number() OVER (
              PARTITION BY kk ORDER BY r DESC, l ASC) AS rn
          FROM sc
        )
        SELECT ext.kk AS {key}, ext.n::BIGINT AS n_days,
               ext.s::BIGINT AS n_events,
               coalesce(rk.l, 0)::BIGINT AS best_lag,
               coalesce(rk.r, 0)::BIGINT AS autocorr_ppm
        FROM ext LEFT JOIN rk ON rk.kk = ext.kk AND rk.rn = 1"""


def asof_staleness(joined, *, ts: str = "ts",
                   matched_ts: str = "matched_ts"):
    """Staleness histogram of an as-of join — the QUALITY AUDIT for the
    engine's north-star op: a point-in-time feature join can be 100%
    "correct" (no leakage, every match ≤ its as-of point) and still be
    operationally rotten because the matches are WEEKS old; this reports
    how stale the matched features actually are, plus the unmatched
    mass, in one audit-sized histogram a freshness SLO can gate on.

    Exact integer bucketing (the :func:`degree_histogram` convention):
    per row, ``staleness_s = (ts − matched_ts)`` in whole seconds
    (floor; both sides nonnegative by the backward-join contract),
    bucket = −1 for UNMATCHED rows, 0 for sub-second, else
    bitlen(staleness_s) — power-of-two second tiers (1–2 s, …,
    ~18 min–36 min, …). Output ``(staleness_bucket, n_events)``,
    ≤ ~40 rows.

    Scale shape: one stateless per-batch bucketing pass over the join
    output + a ≤40-key native fold — the audit adds NOTHING to the
    join's own exchange plan."""
    us_per_s = 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        m = batch.column(matched_ts).cast(pa.timestamp("us"))
        missing = pa.compute.is_null(m).to_numpy(zero_copy_only=False)
        mv = pa.compute.fill_null(m.cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tv = t.to_numpy(zero_copy_only=False)
        stale_s = np.where(missing, 0,
                           (tv - mv) // us_per_s).astype(np.int64)
        blen = np.frexp(np.maximum(stale_s, 1).astype(np.float64))[1]
        b = np.where(missing, -1,
                     np.where(stale_s == 0, 0, blen)).astype(np.int64)
        tb = pa.table({"staleness_bucket": pa.array(b)})
        g = tb.group_by(["staleness_bucket"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["staleness_bucket", "n_events"])

    return (joined.map_batches(bucket, batch_format="pyarrow")
            .groupby("staleness_bucket").sum("n_events")
            .map_batches(lambda t: t.rename_columns(
                ["staleness_bucket", "n_events"]),
                batch_format="pyarrow"))


def asof_staleness_sql(*, joined_select: str, ts: str = "ts",
                       matched_ts: str = "matched_ts") -> str:
    """SQL mirror: wrap any as-of join SELECT, the identical
    −1/0/bitlen(seconds) bucketing."""
    diff = (f"(epoch_us({ts}) - epoch_us({matched_ts})) // 1000000")
    return f"""
        SELECT CASE WHEN {matched_ts} IS NULL THEN -1
                    WHEN {diff} = 0 THEN 0
                    ELSE length(bin({diff}))
               END::BIGINT AS staleness_bucket,
               count(*)::BIGINT AS n_events
        FROM ({joined_select})
        GROUP BY 1"""


def return_label(ds, *, key: str, ts: str, horizon_days: int = 7,
                 num_buckets: int = 32):
    """Leakage-honest churn/return LABEL builder: for every (key,
    active day), will the key be active again within ``horizon_days``
    — the supervised target a retention model trains on, built with
    the same watermark discipline as the feature side (the engine's
    north-star theme applied to the LABEL, where leakage does the most
    damage): a day too close to the corpus horizon cannot honestly be
    labeled negative (the return may simply not have been observed
    yet), so it is CENSORED, not defaulted — the silent mistake that
    teaches models "recent users all churn".

        gap_days = next active day − day      (0 when none observed)
        label    = 1  iff 0 < gap ≤ horizon
        censored = 1  iff label = 0 AND day + horizon > max observed
                   day across the corpus (the return window is not
                   fully observed)

    Exact integers; the corpus horizon is ONE global max fold (two
    scalars reach the driver, broadcast into the labeling pass).

    Scale shape: per-batch (key, day) distinct partials, ONE
    key-bucketed exchange, a vectorized shift inside the bucket.
    Output ``(key, day, gap_days, label, censored)`` — one row per
    active (key, day)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        tb = pa.table({key: batch.column(key), "day": day})
        return tb.group_by([key, "day"]).aggregate([]).rename_columns(
            [key, "day"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    max_day = int(pd.Timestamp(ds.max(ts)).value // 1000) // day_us

    empty = {key: pd.Series([], dtype="int64"),
             "day": pd.Series([], dtype="int64"),
             "gap_days": pd.Series([], dtype="int64"),
             "label": pd.Series([], dtype="int64"),
             "censored": pd.Series([], dtype="int64")}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        df = df.drop_duplicates([key, "day"]).sort_values(
            [key, "day"], kind="mergesort", ignore_index=True)
        k = df[key].to_numpy()
        day = df["day"].to_numpy()
        nxt = np.roll(day, -1)
        same = np.concatenate([k[1:] == k[:-1], [False]])
        gap = np.where(same, nxt - day, 0).astype(np.int64)
        label = ((gap > 0) & (gap <= horizon_days)).astype(np.int64)
        censored = ((label == 0)
                    & (day + horizon_days > max_day)).astype(np.int64)
        return pd.DataFrame({
            key: df[key], "day": day,
            "gap_days": gap, "label": label, "censored": censored,
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def return_label_sql(*, table: str, key: str, ts: str,
                     horizon_days: int = 7) -> str:
    """SQL mirror: distinct (key, day), lead() gap per key, the same
    label/censoring algebra against the global max day."""
    return f"""
        WITH d AS (
          SELECT DISTINCT {key} AS kk,
                 epoch_us({ts}) // 86400000000 AS day
          FROM {table}
        ),
        mx AS (SELECT max(day) AS m FROM d),
        g AS (
          SELECT kk, day,
                 coalesce(lead(day) OVER (
                     PARTITION BY kk ORDER BY day) - day, 0) AS gap
          FROM d
        )
        SELECT kk AS {key}, day::BIGINT AS day,
               gap::BIGINT AS gap_days,
               (CASE WHEN gap > 0 AND gap <= {horizon_days}
                     THEN 1 ELSE 0 END)::BIGINT AS label,
               (CASE WHEN NOT (gap > 0 AND gap <= {horizon_days})
                          AND day + {horizon_days} > mx.m
                     THEN 1 ELSE 0 END)::BIGINT AS censored
        FROM g, mx"""


def gap_entropy(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key entropy of the inter-event-gap DISTRIBUTION — the
    regularity fingerprint completing the cadence family:
    :func:`gap_stats` gives gap moments, :func:`burst_detection` finds
    WHEN the rate shifts, :func:`dominant_period` the daily cadence —
    this asks "how many distinct rhythms does the key run on": a cron
    fires at one gap (entropy ~0), a human mixes seconds-to-days
    (high), and a bot alternating two timers sits at exactly 1 bit —
    the bot-vs-human discriminator :func:`hour_concentration`
    approaches from the clock side.

    Exact integer contract: gaps bucket to power-of-two second tiers
    (``bitlen(gap_s)``, 0 for sub-second — the :func:`asof_staleness`
    convention), then the module's log-free half-bit identity
    (:func:`token_entropy`) scores the bucket distribution:

        entropy_half_bits = Σ_buckets c·(bitlen(n²) − bitlen(c²))

    ≈ 2·n·H in half-bits, exactly replayable. Keys with < 2 events
    (no gaps) keep a row with (0, 0, 0) by contract.

    Scale shape: ONE key-bucketed exchange; inside the bucket gaps,
    buckets and the entropy fold are all vectorized (sort + diff +
    double bincount). Output ``(key, n_gaps, n_buckets,
    entropy_half_bits)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups
    from htrc_feature_reader_ray.stages.profile import _ilog2

    empty = {key: pd.Series([], dtype="int64"),
             "n_gaps": pd.Series([], dtype="int64"),
             "n_buckets": pd.Series([], dtype="int64"),
             "entropy_half_bits": pd.Series([], dtype="int64")}

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({key: batch.column(key), "t": t})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        df = df.sort_values([key, "t"], kind="mergesort",
                            ignore_index=True)
        k = df[key].to_numpy()
        t = df["t"].to_numpy()
        same = k[1:] == k[:-1]
        gap_s = (t[1:] - t[:-1]) // 1_000_000
        kf, keys = pd.factorize(df[key], sort=True)
        gk = kf[1:][same]
        g = gap_s[same]
        blen = np.frexp(np.maximum(g, 1).astype(np.float64))[1]
        b = np.where(g == 0, 0, blen).astype(np.int64)
        nk = len(keys)
        # per-(key, bucket) counts via one composite bincount
        comb = gk * 64 + b
        cc = np.bincount(comb, minlength=nk * 64)
        cc = cc.reshape(nk, 64)
        n = cc.sum(axis=1).astype(np.int64)
        ent = np.zeros(nk, dtype=np.int64)
        nz_k, nz_b = np.nonzero(cc)
        c = cc[nz_k, nz_b].astype(np.int64)
        term = c * ((_ilog2(n[nz_k] * n[nz_k]) + 1)
                    - (_ilog2(c * c) + 1))
        np.add.at(ent, nz_k, term)
        return pd.DataFrame({
            key: keys,
            "n_gaps": n,
            "n_buckets": (cc > 0).sum(axis=1).astype(np.int64),
            "entropy_half_bits": ent,
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def gap_entropy_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: lag() gaps, the −/0/bitlen(seconds) bucketing,
    per-(key, bucket) counts, the token_entropy bit-length identity."""
    return f"""
        WITH e AS (
          SELECT {key} AS kk, epoch_us({ts}) AS t FROM {table}
        ),
        g AS (
          SELECT kk,
                 (t - lag(t) OVER (PARTITION BY kk ORDER BY t))
                     // 1000000 AS gap_s
          FROM e QUALIFY gap_s IS NOT NULL
        ),
        b AS (
          SELECT kk, CASE WHEN gap_s = 0 THEN 0
                          ELSE length(bin(gap_s)) END AS bk,
                 count(*)::BIGINT AS c
          FROM g GROUP BY 1, 2
        ),
        n AS (SELECT kk, sum(c)::BIGINT AS n,
                     count(*)::BIGINT AS nb FROM b GROUP BY 1),
        scored AS (
          SELECT b.kk,
                 sum(b.c * (length(format('{{:b}}', n.n * n.n))
                            - length(format('{{:b}}', b.c * b.c))))
                     ::BIGINT AS ent
          FROM b JOIN n USING (kk) GROUP BY 1
        ),
        keys AS (SELECT DISTINCT kk FROM e)
        SELECT keys.kk AS {key},
               coalesce(n.n, 0)::BIGINT AS n_gaps,
               coalesce(n.nb, 0)::BIGINT AS n_buckets,
               coalesce(scored.ent, 0)::BIGINT AS entropy_half_bits
        FROM keys LEFT JOIN n ON n.kk = keys.kk
                  LEFT JOIN scored ON scored.kk = keys.kk"""
