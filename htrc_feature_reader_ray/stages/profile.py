"""Numeric column profiling — distributed EXACT quantiles + summary stats.

The reference ships per-section scalar summaries (``_make_section_feature_df``,
parsers.py:315-330); a web-scale training-data pipeline additionally needs
corpus-level numeric profiles (length/score distributions) to pick filter
thresholds. Exact — not sketched — via the distributed-histogram shape:

  per-batch ``np.unique`` value counts (the map-side combiner) → one small
  ``groupby(value).sum`` shuffle → driver cumsum over the DISTINCT-value
  histogram → rank lookup.

Scale assumption (documented contract): the profiled column has bounded
cardinality (integer cents, token counts, quality buckets — value space ≪
row count), so the folded histogram is tiny even at 10^12 rows. For
unbounded doubles, quantize first (e.g. cents) — which is also what makes
the result exactly reproducible cross-engine.

Quantile convention: value at 1-based rank ``ceil(q * n)`` — chosen to match
DuckDB's ``quantile_disc`` exactly so results are oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa



def value_histogram(ds, col: str):
    """(value, cnt) Dataset: per-batch unique-counts combiner + global fold."""

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {col: pa.array(u), "cnt": pa.array(c.astype(np.int64))}
        )

    partial = ds.map_batches(hist, batch_format="pyarrow")
    # distinct-value cardinality is unbounded at corpus scale: bucketed
    # vectorized fold, not the per-group-Python native aggregate
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    return bucketed_aggregate(partial, col, {"cnt": ("cnt", "sum")},
                              num_buckets=16)


def _hist_df(ds, col: str) -> pd.DataFrame:
    hdf = value_histogram(ds, col).to_pandas()
    if col not in hdf.columns:  # Ray's to_pandas drops columns on 0 rows
        return pd.DataFrame({col: pd.Series(dtype="int64"),
                             "cnt": pd.Series(dtype="int64")})
    return hdf.sort_values(col)


def exact_quantiles(ds, col: str, qs=(0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Exact discrete quantiles of ``col``: DataFrame (q, value) with value
    at 1-based rank ceil(q*n) of the sorted column (== quantile_disc)."""
    hdf = _hist_df(ds, col)
    if hdf.empty:
        return pd.DataFrame({"q": pd.Series(dtype="float64"),
                             "value": pd.Series(dtype="int64")})
    cum = hdf["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = hdf[col].to_numpy()
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        out_q.append(float(q))
        out_v.append(vals[int(np.searchsorted(cum, rank))])
    return pd.DataFrame({"q": out_q, "value": np.asarray(out_v)})


def grouped_profile(ds, *, group_cols, col: str, qs=(0.5, 0.9, 0.99),
                    num_buckets: int = 16):
    """Per-GROUP exact profile (n, min, max, sum, quantiles) — the grouped
    sibling of :func:`numeric_profile`, fully distributed: per-batch
    (group, value) count combiner, then ONE bucketed pass that folds the
    per-group histograms and evaluates ranks (histograms are value-space
    sized per group; nothing reaches the driver)."""
    group_cols = list(group_cols)

    def hist(batch: pa.Table) -> pa.Table:
        t = batch.select(group_cols + [col])
        g = t.group_by(group_cols + [col]).aggregate([([], "count_all")])
        return g.rename_columns(group_cols + [col, "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow")
    qcols = [f"p{int(q * 100)}" for q in qs]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby(group_cols + [col], as_index=False)["cnt"].sum()
        rows = []
        for key, g in merged.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            g = g.sort_values(col)
            cnt = g["cnt"].to_numpy()
            vals = g[col].to_numpy()
            cum = cnt.cumsum()
            n = int(cum[-1])
            ranks = tuple(
                int(vals[int(np.searchsorted(
                    cum, max(1, int(np.ceil(q * n)))
                ))])
                for q in qs
            )
            rows.append(
                (*key, n, int(vals[0]), int(vals[-1]),
                 int((vals * cnt).sum()), *ranks)
            )
        return pd.DataFrame(
            rows, columns=group_cols + ["n", "min", "max", "sum"] + qcols
        )

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    return bucketed_map_groups(
        partial, group_cols[0], finish, num_buckets=num_buckets
    )


def numeric_profile(ds, col: str, qs=(0.5, 0.9, 0.99)) -> pd.DataFrame:
    """One-row exact profile: n, min, max, sum (int64) + the quantiles as
    columns ``p50``-style. Integer-exact end to end (the column must be an
    integer quantization, per the module contract)."""
    hdf = _hist_df(ds, col)
    if hdf.empty:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64")
             for c in ["n", "min", "max", "sum"]
             + [f"p{int(q * 100)}" for q in qs]}
        )
    cnt = hdf["cnt"].to_numpy()
    vals = hdf[col].to_numpy()
    cum = cnt.cumsum()
    n = int(cum[-1])
    row = {
        "n": n,
        "min": int(vals[0]),
        "max": int(vals[-1]),
        "sum": int((vals * cnt).sum()),
    }
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        row[f"p{int(q * 100)}"] = int(vals[int(np.searchsorted(cum, rank))])
    return pd.DataFrame([row]).astype("int64")


# ---------------------------------------------------------------------------
# grouped feature normalization (z-score / min-max scaling)


def group_stats(ds, *, key, value_col):
    """Small per-key moment table ``(key, n, sum, sumsq, min, max)`` via the
    partial-combine shape: per-batch pandas groupby partials (combiner), one
    tiny groupby over #keys × B partial rows — raw rows never cross the
    exchange. Integer input stays integer (exact moments); the int64 sumsq
    accumulator bounds the contract to ``max(v)^2 × rows < 2^63`` — pre-scale
    wider values."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy()
        g = pd.DataFrame({
            key: df[key], "_v": v, "_v2": v.astype(np.int64) ** 2,
        }).groupby(key, sort=False, observed=True)
        out = g.agg(
            n=("_v", "size"), s=("_v", "sum"), ss=("_v2", "sum"),
            mn=("_v", "min"), mx=("_v", "max"),
        ).reset_index()
        return out

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .map_groups(
            lambda df: pd.DataFrame({
                key: [df[key].iloc[0]],
                "n": [int(df["n"].sum())],
                "s": [int(df["s"].sum())],
                "ss": [int(df["ss"].sum())],
                "mn": [int(df["mn"].min())],
                "mx": [int(df["mx"].max())],
            }),
            batch_format="pandas",
        )
    )
    return merged


def normalize_features(ds, *, key, value_col):
    """Per-group feature scaling: appends ``z_<v>`` (population z-score) and
    ``minmax_<v>`` to every row, all input columns passing through.

    Exact-parity arithmetic (one defined IEEE-double expression order,
    mirrored verbatim in the SQL oracle):

      mean = s / n;  var = max((ss - s·s/n) / n, 0);  std = sqrt(var)
      z = (v - mean) / std   (0.0 when std == 0)
      minmax = (v - mn) / (mx - mn)   (0.0 when mx == mn)

    Scale shape: the moment table from :func:`group_stats` is #keys rows
    (feature-normalization keys — language, source, domain bucket — are
    bounded vocabularies); it is broadcast once via ``ray.put`` and each
    batch maps keys with one vectorized reindex — no second shuffle of the
    corpus."""
    import ray

    stats = group_stats(ds, key=key, value_col=value_col).to_pandas()
    stats = stats.set_index(key)
    ref = ray.put(stats)

    zc, mc = f"z_{value_col}", f"minmax_{value_col}"

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        sub = st.reindex(df[key])
        n = sub["n"].to_numpy(dtype=np.float64)
        s = sub["s"].to_numpy(dtype=np.float64)
        ss = sub["ss"].to_numpy(dtype=np.float64)
        mn = sub["mn"].to_numpy(dtype=np.int64)
        mx = sub["mx"].to_numpy(dtype=np.int64)
        v = df[value_col].to_numpy(dtype=np.int64)
        mean = s / n
        var = np.maximum((ss - s * s / n) / n, 0.0)
        std = np.sqrt(var)
        df = df.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            df[zc] = np.where(std > 0, (v - mean) / std, 0.0)
            df[mc] = np.where(mx > mn, (v - mn) / (mx - mn), 0.0)
        return df

    return ds.map_batches(scale, batch_format="pandas")


def normalize_features_sql(*, key: str, value_col: str,
                           table: str) -> str:
    """SQL mirror — the identical expression order, so doubles are
    bit-equal."""
    v = value_col
    return f"""
        WITH st AS (
          SELECT {key}, count(*)::BIGINT AS n,
                 sum({v})::BIGINT AS s,
                 sum({v}::BIGINT * {v}::BIGINT)::BIGINT AS ss,
                 min({v})::BIGINT AS mn, max({v})::BIGINT AS mx
          FROM {table} GROUP BY 1
        ), d AS (
          SELECT t.*, st.n, st.s, st.ss, st.mn, st.mx,
                 st.s::DOUBLE / st.n AS mean,
                 greatest((st.ss::DOUBLE - (st.s::DOUBLE * st.s::DOUBLE)
                           / st.n) / st.n, 0.0) AS var
          FROM {table} t JOIN st USING ({key})
        )
        SELECT * EXCLUDE (n, s, ss, mn, mx, mean, var),
               CASE WHEN sqrt(var) > 0
                    THEN ({v} - mean) / sqrt(var) ELSE 0.0
               END AS z_{v},
               CASE WHEN mx > mn
                    THEN ({v} - mn) / (mx - mn) ELSE 0.0
               END AS minmax_{v}
        FROM d"""


# ---------------------------------------------------------------------------
# quantile bucketize (corpus-relative binning for filtering / stratification)


def quantile_bucketize(ds, col: str, *, num_buckets: int = 4,
                       out_col: str = "bucket"):
    """Assign each row its corpus-relative quantile bucket of ``col``
    (0-based, ``num_buckets`` bins): bucket = count of quantile thresholds
    strictly below the row's value, thresholds being the values at 1-based
    ranks ``ceil(k·n / num_buckets)`` (exact integer arithmetic) for
    k = 1..num_buckets-1 — a pure function of the data, SQL-replayable.

    Two passes: (1) the tiny distinct-value histogram fold of
    :func:`value_histogram` (projected to ``col``, so the read pushes down
    and the payload never flows through pass 1) → thresholds on the driver;
    (2) one stateless ``map_batches`` with the K-1 thresholds captured in
    the closure (no shuffle, no broadcast table needed). Pass 1 re-executes
    the upstream pipeline — materialize upstream first if it is expensive.
    Module contract applies: ``col`` is an integer quantization."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    hdf = _hist_df(ds.select_columns([col]), col)
    if hdf.empty:
        thresholds = np.zeros(0, dtype=np.int64)
    else:
        cum = hdf["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = hdf[col].to_numpy()
        K = num_buckets
        ranks = [max(1, (k * n + K - 1) // K) for k in range(1, K)]
        thresholds = np.array(
            [vals[int(np.searchsorted(cum, r))] for r in ranks]
        )  # nondecreasing by construction (ranks ascending, vals sorted)

    def assign(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        # count of thresholds < v (left insertion point), duplicates counted
        b = np.searchsorted(thresholds, v, side="left").astype(np.int64)
        return batch.append_column(out_col, pa.array(b, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def quantile_bucketize_sql(col: str, *, num_buckets: int = 4,
                           out_col: str = "bucket",
                           table: str = "documents",
                           columns: str = "*") -> str:
    """SQL mirror: identical integer rank formula, duplicate thresholds
    preserved (one row per k), strict `<` comparison."""
    K = num_buckets
    return f"""
        WITH c AS (SELECT count(*)::BIGINT AS n FROM {table}),
        r AS (SELECT {col} AS v, row_number() OVER (ORDER BY {col}) AS rn
              FROM {table}),
        th AS (
          SELECT r.v AS t
          FROM (SELECT greatest(1, (s.k * c.n + {K} - 1) // {K}) AS rk
                FROM c, LATERAL unnest(range(1, {K})) AS s(k)) ranks
          JOIN r ON r.rn = ranks.rk
        )
        SELECT {columns},
               (SELECT count(*) FROM th WHERE th.t < d.{col})::BIGINT
                   AS {out_col}
        FROM {table} d"""


def ecdf(ds, col: str, *, out_col: str = "cume_dist"):
    """Corpus-relative empirical CDF column: for every row,
    ``count(v' <= v) / n`` over the whole corpus — SQL ``cume_dist() OVER
    (ORDER BY col)``. The rank-normalized feature used for threshold-free
    filtering (drop the bottom X% by quality, cap the top Y% by length).

    Same two-pass shape as :func:`quantile_bucketize`: distinct-value
    histogram fold (tiny, module contract: integer quantization) → the
    (values, cumulative-count) arrays broadcast once via ``ray.put`` → one
    stateless vectorized lookup per batch. One IEEE int/int division,
    mirroring SQL."""
    import ray

    hdf = _hist_df(ds.select_columns([col]), col)
    vals = hdf[col].to_numpy()
    cum = np.concatenate([[0], hdf["cnt"].cumsum().to_numpy()])
    n = int(cum[-1]) if len(cum) > 1 else 0
    ref = ray.put((vals, cum))

    def assign(batch: pa.Table) -> pa.Table:
        tv, tc = ray.get(ref)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        le = tc[np.searchsorted(tv, v, side="right")]
        pct = le.astype(np.float64) / n if n else np.zeros(len(v))
        return batch.append_column(out_col, pa.array(pct, type=pa.float64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def ecdf_sql(col: str, *, out_col: str = "cume_dist",
             table: str = "documents", columns: str = "*") -> str:
    """SQL mirror: ``cume_dist()`` == count(<=v)/n, identical operands."""
    return f"""
        SELECT {columns},
               cume_dist() OVER (ORDER BY {col}) AS {out_col}
        FROM {table}"""


def rfm_features(ds, *, key: str, ts: str, amount_col: str,
                 num_buckets: int = 32):
    """Per-entity RFM (recency / frequency / monetary) features — the
    classic customer-value triple, in exact integers: ``n_orders``,
    ``total_cents`` (sum of round(amount*100)), ``last_order`` and
    ``recency_days`` (whole days between the entity's last transaction and
    the corpus-wide latest one).

    Scale shape: per-batch partial (key, n, cents, last) collapse inside
    ``map_batches`` — the exchange carries ≤ one row per key per batch —
    then one key-bucketed fold.  The corpus max timestamp is a separate
    single-column aggregate (column-pruned read, scalar result) broadcast
    into the finishing cast, not a second shuffle."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t.column(amount_col).to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        t2 = pa.table({
            key: t.column(key),
            "_cents": pa.array(cents, type=pa.int64()),
            "_ts": pc.cast(t.column(ts), pa.int64()),
        })
        g = t2.group_by([key]).aggregate(
            [("_cents", "sum"), ("_ts", "max"), ([], "count_all")])
        return g.rename_columns([key, "total_cents", "_last_us", "n_orders"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    folded = bucketed_aggregate(
        partials, [key],
        {"n_orders": ("n_orders", "sum"),
         "total_cents": ("total_cents", "sum"),
         "_last_us": ("_last_us", "max")},
        num_buckets=num_buckets,
    )
    # tiny scalar pass: global latest transaction (column-pruned aggregate)
    gmax_us = int(pd.Timestamp(ds.max(ts)).value // 1000)

    def finish(t: pa.Table) -> pa.Table:
        last_us = pc.cast(t.column("_last_us"), pa.int64())
        rec = pc.divide(
            pc.subtract(pa.scalar(gmax_us, type=pa.int64()), last_us),
            pa.scalar(86_400_000_000, type=pa.int64()))
        return pa.table({
            key: t.column(key),
            "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
            "total_cents": pc.cast(t.column("total_cents"), pa.int64()),
            "last_order": pc.cast(last_us, pa.timestamp("us")),
            "recency_days": pc.cast(rec, pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def rfm_features_sql(*, key: str, ts: str, amount_col: str,
                     table: str) -> str:
    """SQL mirror: identical rounding (round→BIGINT cents) and identical
    floor-division day arithmetic on epoch microseconds."""
    return f"""
        WITH g AS (SELECT max({ts}) AS gmax FROM {table}),
        r AS (
            SELECT {key}, count(*)::BIGINT AS n_orders,
                   sum(CAST(round({amount_col} * 100) AS BIGINT))::BIGINT
                       AS total_cents,
                   max({ts}) AS last_order
            FROM {table} GROUP BY 1
        )
        SELECT {key}, n_orders, total_cents, last_order,
               ((epoch_us(gmax) - epoch_us(last_order))
                // 86400000000)::BIGINT AS recency_days
        FROM r CROSS JOIN g"""
