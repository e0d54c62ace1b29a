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


def robust_scale(ds, *, value_col: str, out_col: str = "robust_ppm"):
    """Median/IQR feature scaling (sklearn's RobustScaler) in exact
    integer ppm — the outlier-proof member completing the scaler family
    (:func:`normalize_features` z-score follows one adversarial row
    arbitrarily far; the median and quartiles have positive breakdown,
    exactly the property a scraped numeric field needs):

        scaled = (v − median) · 10⁶ / (p75 − p25)

    with the division TRUNCATING toward zero (DuckDB ``//`` semantics —
    the interpolate_daily convention; floor would drift one ulp on the
    below-median half). Degenerate spread (IQR = 0) scales to 0 by
    documented contract. Quantiles use the engine-wide ceil-rank
    ``quantile_disc`` convention; the column must be an integer
    quantization (cents — the module contract).

    Scale shape: pass 1 is :func:`exact_quantiles`' bounded-support
    histogram fold (three scalars leave it); pass 2 is a stateless
    vectorized map — no broadcast table, no second exchange. All input
    columns pass through with ``out_col`` appended.
    """
    q = exact_quantiles(ds, value_col, qs=(0.25, 0.5, 0.75))
    byq = dict(zip(q["q"], q["value"]))
    q1, med, q3 = int(byq[0.25]), int(byq[0.5]), int(byq[0.75])
    iqr = q3 - q1

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if iqr == 0:
            df[out_col] = np.zeros(len(df), dtype=np.int64)
            return df
        num = (df[value_col].to_numpy().astype(np.int64) - med) * 1_000_000
        df[out_col] = (np.sign(num) * (np.abs(num) // iqr)).astype(np.int64)
        return df

    return ds.map_batches(scale, batch_format="pandas")


def robust_scale_sql(*, table_expr: str, value: str, columns: str = "*",
                     out_col: str = "robust_ppm") -> str:
    """SQL mirror: quantile_disc == the engine's ceil-rank convention;
    DuckDB integer // truncates toward zero like the engine's
    sign-split."""
    return f"""
        WITH q AS (
          SELECT quantile_disc({value}, 0.25)::BIGINT AS q1,
                 quantile_disc({value}, 0.50)::BIGINT AS med,
                 quantile_disc({value}, 0.75)::BIGINT AS q3
          FROM {table_expr}
        )
        SELECT {columns},
               CASE WHEN q3 - q1 = 0 THEN 0
                    ELSE (({value} - med) * 1000000) // (q3 - q1)
               END::BIGINT AS {out_col}
        FROM {table_expr} CROSS JOIN q"""


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


# ---------------------------------------------------------------------------
# categorical pivot (behavioral feature vectors)


def pivot_counts(ds, *, key, cat_col: str, categories,
                 value_col: str | None = None,
                 prefix: str = "n_", num_buckets: int = 32):
    """Wide per-entity categorical count features — the classic behavioral
    feature vector (one ``n_<category>`` column per category, zero-filled).

    The category set is an EXPLICIT argument, not discovered from data:
    Ray Data needs a stable schema per block, and at web scale you want the
    feature layout pinned by config, not by whichever categories a shard
    happened to contain.  (The reference's ``term_page_freqs`` pivot has the
    same contract: columns fixed up front — feature_reader.py:467-519.)

    Scale shape: per-batch Arrow ``(key, cat)`` count collapse (the map-side
    combiner — exchange carries ≤ |batch keys|×|categories| rows, never raw
    events), then ONE key-bucketed pass that pivots each bucket with a
    vectorized pandas ``pivot_table`` reindexed to the fixed column list.
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    keys = [key] if isinstance(key, str) else list(key)
    categories = list(categories)
    out_cols = [f"{prefix}{c}" for c in categories]
    agg = ([([], "count_all")] if value_col is None
           else [(value_col, "sum")])

    def partial(t: pa.Table) -> pa.Table:
        sel = keys + [cat_col] + ([value_col] if value_col else [])
        g = t.select(sel).group_by(keys + [cat_col]).aggregate(agg)
        g = g.rename_columns(keys + [cat_col, "n"])
        # unknown categories are dropped HERE (cheap, before the exchange)
        mask = pc.is_in(g.column(cat_col), value_set=pa.array(categories))
        return g.filter(mask)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(index=keys, columns=cat_col, values="n",
                              aggfunc="sum", fill_value=0)
        wide = wide.reindex(columns=categories, fill_value=0).astype("int64")
        wide.columns = out_cols
        return wide.reset_index()

    # co-partition on the first key: composite-key tuples share its bucket
    return bucketed_map_groups(partials, keys[0], pivot,
                               num_buckets=num_buckets)


def pivot_counts_sql(*, key, cat_col: str, categories,
                     value_col: str | None = None,
                     prefix: str = "n_", table: str) -> str:
    """SQL mirror: conditional aggregation with the same fixed columns."""
    keys = key if isinstance(key, str) else ", ".join(key)
    expr = "count(*)" if value_col is None else f"sum({value_col})"
    # sum() FILTER over an empty cell is NULL; the engine zero-fills
    cols = ",\n                   ".join(
        f"coalesce({expr} FILTER (WHERE {cat_col} = '{c}'), 0)::BIGINT"
        f" AS {prefix}{c}" for c in categories
    )
    return f"""
        SELECT {keys}, {cols}
        FROM {table}
        WHERE {cat_col} IN ({", ".join(f"'{c}'" for c in categories)})
        GROUP BY {keys}"""


# ---------------------------------------------------------------------------
# hierarchical ROLLUP aggregation


def rollup_counts(ds, *, keys, sum_col: str | None = None,
                  num_buckets: int = 32):
    """``GROUP BY ROLLUP(k1, k2)`` as a Ray pipeline: count (+ optional
    integer sum) at every prefix level — ``(k1, k2)``, ``(k1)``, and the
    grand total — with folded-out key columns emitted as NULL, exactly like
    the SQL ROLLUP row format.

    Scale shape: the INPUT is scanned ONCE (per-batch Arrow combiner +
    one bucketed fold to the finest level); every coarser level re-folds
    the previous level's RESULT, whose cardinality is the finest group
    count — by the time data reaches level 1 it is |k1×k2| rows, not the
    corpus.  No rollup level re-reads the input.
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    k1, k2 = keys
    n_col, s_col = "n", "total"
    aggs = [([], "count_all")] if sum_col is None else [
        (sum_col, "sum"), ([], "count_all")]

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([k1, k2]).aggregate(aggs)
        names = [k1, k2] + ([s_col, n_col] if sum_col else [n_col])
        return g.rename_columns(names)

    spec_fine = {n_col: (n_col, "sum")}
    spec_1 = {n_col: (n_col, "sum")}
    if sum_col is not None:
        spec_fine[s_col] = (s_col, "sum")
        spec_1[s_col] = (s_col, "sum")

    # materialize: the finest cuboid is |k1×k2| rows and has TWO lazy
    # consumers (level-1 refold + the union branch) — without pinning,
    # each consumer re-executes the full input scan
    finest = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [k1, k2], spec_fine, num_buckets=num_buckets).materialize()

    val_cols = [n_col] + ([s_col] if sum_col is not None else [])

    def cast_vals(df: pd.DataFrame) -> pd.DataFrame:
        for c in val_cols:
            df[c] = df[c].astype("int64")
        return df

    # coarser levels re-aggregate the |k1×k2|-row base ON THE DRIVER —
    # rollup dims are categorical by construction (the cube_rollup
    # argument), so this deletes two all-to-all exchanges outright
    import ray.data as rd

    base = cast_vals(finest.to_pandas())
    l1 = base.groupby(k1, sort=False, as_index=False)[val_cols].sum()
    l1[k2] = pd.Series([None] * len(l1), dtype=object)
    l1 = cast_vals(l1)[[k1, k2] + val_cols]
    l0 = pd.DataFrame({k1: [None], k2: [None],
                       **{c: [int(base[c].sum())] for c in val_cols}})

    finest_cast = finest.map_batches(
        lambda df: cast_vals(df)[[k1, k2] + val_cols],
        batch_format="pandas")
    return finest_cast.union(rd.from_pandas(pd.concat(
        [l1, l0], ignore_index=True)))


def rollup_counts_sql(*, keys, sum_col: str | None = None,
                      table: str) -> str:
    k1, k2 = keys
    s = (f", sum({sum_col})::BIGINT AS total" if sum_col else "")
    return f"""
        SELECT {k1}, {k2}, count(*)::BIGINT AS n{s}
        FROM {table} GROUP BY ROLLUP({k1}, {k2})"""


# ---------------------------------------------------------------------------
# exact grouped moments + Pearson correlation


def grouped_moments(ds, *, key: str, x_col: str, y_col: str,
                    num_buckets: int = 32):
    """Per-group EXACT second-order moments of two pre-quantized integer
    columns — ``n, sum_x, sum_y, sum_xx, sum_yy, sum_xy`` (BIGINT) — plus
    Pearson ``corr`` as DOUBLE, computed by an expression both the engine
    and the SQL mirror evaluate identically:

        num  = n·Σxy − Σx·Σy          (exact integer)
        den² = (n·Σxx − Σx²)(n·Σyy − Σy²)   (exact integer)
        corr = double(num) / sqrt(double(den²))

    Each side performs exactly ONE int→double rounding per operand and the
    IEEE-correctly-rounded sqrt/divide, so the doubles are bit-identical.
    Zero-variance groups yield NULL.

    Scale shape: per-batch Arrow sum/count collapse (moments are
    commutative — the exchange carries one row per (batch, key)), one
    key-bucketed fold, then a driver-free finishing map over the tiny
    grouped table.  The finish uses Python arbitrary-precision ints per
    group row, mirroring SQL HUGEINT; at 10^12-row groups the BIGINT
    output columns themselves are the overflow boundary (documented).
    """
    import math

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = pa.table({
            key: t.column(key),
            "sum_x": pa.array(x), "sum_y": pa.array(y),
            "sum_xx": pa.array(x * x), "sum_yy": pa.array(y * y),
            "sum_xy": pa.array(x * y),
        })
        g = t2.group_by([key]).aggregate(
            [("sum_x", "sum"), ("sum_y", "sum"), ("sum_xx", "sum"),
             ("sum_yy", "sum"), ("sum_xy", "sum"), ([], "count_all")])
        return g.rename_columns(
            [key, "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        {c: (c, "sum")
         for c in ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]},
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized int64 fast path with a magnitude guard; rows whose
        # intermediates could leave the exact window drop to the
        # Python-int (HUGEINT-equivalent) loop. Bit-exact vs the old
        # all-rows loop: int64->float64 conversion is correctly rounded,
        # and with |vx|,|vy| < 2^53 exactly representable the IEEE
        # product equals float(vx*vy)'s single rounding.
        n = df["n"].to_numpy(dtype=np.int64)
        sx = df["sum_x"].to_numpy(dtype=np.int64)
        sy = df["sum_y"].to_numpy(dtype=np.int64)
        sxx = df["sum_xx"].to_numpy(dtype=np.int64)
        syy = df["sum_yy"].to_numpy(dtype=np.int64)
        sxy = df["sum_xy"].to_numpy(dtype=np.int64)
        nf, sxf, syf = (a.astype(np.float64) for a in (n, sx, sy))
        sxxf, syyf, sxyf = (a.astype(np.float64) for a in (sxx, syy, sxy))
        LIM, FLIM = 2.0 ** 61, 2.0 ** 53
        prods = np.maximum.reduce([
            np.abs(nf * sxxf), sxf * sxf, np.abs(nf * syyf), syf * syf,
            np.abs(nf * sxyf), np.abs(sxf * syf)])
        okp = prods < LIM  # int64 arithmetic below is exact where okp
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        num = n * sxy - sx * sy
        # the 2^53 window must be tested on the EXACT int64 vx/vy (valid
        # wherever okp): the float-approximated variances can undershoot
        # by a few hundred near a binade boundary, admitting a slop
        # window where float(vx) rounds and the product diverges from
        # the HUGEINT oracle by 1 ulp
        ok = (okp & (np.abs(vx) < np.int64(FLIM))
              & (np.abs(vy) < np.int64(FLIM)))
        corr = np.full(len(n), np.nan)
        pos = ok & (vx > 0) & (vy > 0)
        corr[pos] = (num[pos].astype(np.float64)
                     / np.sqrt(vx[pos].astype(np.float64)
                               * vy[pos].astype(np.float64)))
        for i in np.flatnonzero(~ok):
            ni, sxi, syi = int(n[i]), int(sx[i]), int(sy[i])
            vxi = ni * int(sxx[i]) - sxi * sxi
            vyi = ni * int(syy[i]) - syi * syi
            if vxi > 0 and vyi > 0:
                corr[i] = (float(ni * int(sxy[i]) - sxi * syi)
                           / math.sqrt(float(vxi * vyi)))
        out = df.copy()
        for c in ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]:
            out[c] = out[c].astype("int64")
        out["corr"] = pd.Series(corr, index=df.index, dtype="float64")
        return out[[key, "n", "sum_x", "sum_y", "sum_xx", "sum_yy",
                    "sum_xy", "corr"]]

    return folded.map_batches(finish, batch_format="pandas")


def grouped_moments_sql(*, key: str, x_expr: str, y_expr: str,
                        table: str, where: str = "") -> str:
    """SQL mirror: HUGEINT sums (DuckDB sum(BIGINT) widens), the identical
    single int→double rounding, correctly-rounded sqrt/divide."""
    return f"""
        WITH m AS (
            SELECT {key}, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy,
                   sum(x * y) AS sxy
            FROM (SELECT {key}, ({x_expr})::BIGINT AS x,
                         ({y_expr})::BIGINT AS y FROM {table} {where})
            GROUP BY {key}
        )
        SELECT {key}, n::BIGINT AS n,
               sx::BIGINT AS sum_x, sy::BIGINT AS sum_y,
               sxx::BIGINT AS sum_xx, syy::BIGINT AS sum_yy,
               sxy::BIGINT AS sum_xy,
               CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                    THEN (n*sxy - sx*sy)::DOUBLE
                         / sqrt(((n*sxx - sx*sx) * (n*syy - sy*sy))::DOUBLE)
               END AS corr
        FROM m"""


# ---------------------------------------------------------------------------
# robust grouped outlier stats (median / MAD) in one histogram pass


def grouped_mad(ds, *, key: str, col: str, k: int = 3,
                num_buckets: int = 16):
    """Per-group robust outlier statistics: discrete median, MAD (median
    absolute deviation), and the count of rows with ``|v - med| > k·MAD``
    — the standard robust alternative to z-score outlier flags (median/MAD
    have a 50% breakdown point; mean/std are dragged by the very outliers
    being hunted).

    Scale shape: ONE distributed histogram pass — per-batch ``(key, v)``
    count combiner, one key-bucketed fold — and the finish derives all
    three statistics from the same per-group DISTINCT-VALUE histogram
    (median by rank lookup, the deviation histogram by re-weighting the
    value histogram, outliers by masked count-sum).  No second scan of the
    input, unlike the textbook two-pass median-then-MAD formulation.
    Quantile convention: 1-based rank ``ceil(n/2)`` == ``quantile_disc``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def hist(batch: pa.Table) -> pa.Table:
        g = batch.select([key, col]).group_by([key, col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([key, col, "cnt"])

    partial = ds.map_batches(hist, batch_format="pyarrow")

    def rank_value(vals, cum, q_rank):
        return int(vals[int(np.searchsorted(cum, q_rank))])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([key, col], as_index=False)["cnt"].sum()
        rows = []
        for gkey, g in merged.groupby(key, sort=False):
            g = g.sort_values(col)
            cnt = g["cnt"].to_numpy()
            vals = g[col].to_numpy()
            cum = cnt.cumsum()
            n = int(cum[-1])
            med = rank_value(vals, cum, -(-n // 2))  # 1-based ceil(n/2)
            dev = np.abs(vals - med)
            order = np.argsort(dev, kind="stable")
            dcum = cnt[order].cumsum()
            mad = int(dev[order][int(np.searchsorted(dcum, -(-n // 2)))])
            n_out = int(cnt[dev > k * mad].sum())
            rows.append((gkey, n, med, mad, n_out))
        return pd.DataFrame(
            rows, columns=[key, "n", "median", "mad", "n_outliers"]
        ).astype({c: "int64" for c in ["n", "median", "mad", "n_outliers"]})

    return bucketed_map_groups(partial, key, finish,
                               num_buckets=num_buckets)


def grouped_mad_sql(*, key: str, value_expr: str, k: int = 3,
                    table: str) -> str:
    """SQL mirror: two quantile_disc levels + the identical strict-``>``
    outlier rule."""
    return f"""
        WITH v AS (
            SELECT {key}, ({value_expr})::BIGINT AS c FROM {table}
        ), m AS (
            SELECT {key}, quantile_disc(c, 0.5)::BIGINT AS med
            FROM v GROUP BY 1
        ), d AS (
            SELECT v.{key}, v.c, m.med, abs(v.c - m.med) AS dev
            FROM v JOIN m USING ({key})
        ), a AS (
            SELECT {key}, quantile_disc(dev, 0.5)::BIGINT AS mad
            FROM d GROUP BY 1
        )
        SELECT d.{key}, count(*)::BIGINT AS n,
               any_value(d.med) AS median, any_value(a.mad) AS mad,
               sum(CASE WHEN d.dev > {k} * a.mad THEN 1 ELSE 0 END)::BIGINT
                   AS n_outliers
        FROM d JOIN a USING ({key})
        GROUP BY d.{key}"""


# ---------------------------------------------------------------------------
# contingency table + per-cell chi-square terms


def contingency_chi2(ds, *, k1: str, k2: str, num_buckets: int = 32):
    """Categorical-association table for feature selection: observed cell
    counts of ``(k1, k2)`` plus each cell's chi-square contribution

        chi2_term = (n·o − rt·ct)² / (n·rt·ct)

    (the classic (o−e)²/e with e = rt·ct/n, cleared of the inner division
    so both numerator and denominator are EXACT integers — one int→double
    rounding each plus a correctly-rounded divide makes the doubles
    bit-identical to the SQL mirror; the total χ² is then a sum the READER
    performs, cell order being their choice — the engine never emits an
    order-dependent float sum).

    Scale shape: per-batch Arrow cell-count combiner → one bucketed fold.
    Cell cardinality |k1|×|k2| is small by the nature of a contingency
    table (it is read by humans / a feature selector), so the marginal
    totals are a driver-side finish over the folded cells — the INPUT is
    never materialized."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([k1, k2]).group_by([k1, k2]).aggregate(
            [([], "count_all")])
        return g.rename_columns([k1, k2, "o"])

    cells = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [k1, k2], {"o": ("o", "sum")}, num_buckets=num_buckets,
    ).to_pandas()

    rt = cells.groupby(k1)["o"].transform("sum").astype("int64")
    ct = cells.groupby(k2)["o"].transform("sum").astype("int64")
    n = int(cells["o"].sum())
    terms = []
    for o, r, c in zip(cells["o"].astype("int64"), rt, ct):
        num = (n * int(o) - int(r) * int(c)) ** 2
        den = n * int(r) * int(c)
        terms.append(float(num) / float(den))
    out = cells.copy()
    out["observed"] = out.pop("o").astype("int64")
    out["chi2_term"] = pd.Series(terms, index=cells.index, dtype="float64")
    return out[[k1, k2, "observed", "chi2_term"]]


def contingency_chi2_sql(*, k1: str, k2: str, table: str) -> str:
    """SQL mirror: HUGEINT-exact numerator/denominator, one rounding each."""
    return f"""
        WITH c AS (
            SELECT {k1}, {k2}, count(*) AS o FROM {table} GROUP BY 1, 2
        ), r AS (SELECT {k1}, sum(o) AS rt FROM c GROUP BY 1),
        cc AS (SELECT {k2}, sum(o) AS ct FROM c GROUP BY 1),
        g AS (SELECT sum(o) AS n FROM c)
        SELECT c.{k1}, c.{k2}, o::BIGINT AS observed,
               ((n*o - rt*ct) * (n*o - rt*ct))::DOUBLE
               / (n * rt * ct)::DOUBLE AS chi2_term
        FROM c JOIN r USING ({k1}) JOIN cc USING ({k2}) CROSS JOIN g"""


def cramers_v(ds, *, k1: str, k2: str, num_buckets: int = 32):
    """Cramér's V association strength between two categoricals, as ONE
    comparable scalar in exact integer ppm — the normalization that makes
    :func:`contingency_chi2` usable as a feature-selection RANKING
    (χ² grows with n and table size, so raw χ² can't compare a 2×2 against
    a 20×5 or a 10⁶-row feed against a 10⁹-row one; V ∈ [0,1] can —
    Cramér 1946, the standard bias-unaware form).

    Exactness contract (the per-term-floor convention shared with
    markov/pagerank): each cell of the FULL r×c marginal grid —
    including never-observed combinations, whose ``o = 0`` term
    ``(rt·ct)²·10⁶ // (n·rt·ct)`` is exactly the textbook ``e`` the
    observed-cells-only view of :func:`contingency_chi2` leaves to the
    reader, and without which a perfectly-associated table (all mass on
    the diagonal = maximal missing cells) would read far below V = 1 —
    contributes

        term = (n·o − rt·ct)² · 10⁶ // (n·rt·ct)

    — an exact nonneg integer — and ``chi2_ppm = Σ terms`` is an
    order-free integer sum (the reason :func:`contingency_chi2` leaves its
    float total to the reader disappears here). Then

        v2_ppm = chi2_ppm // (n · (min(r,c) − 1))

    i.e. V² in ppm (V² rather than V: no integer sqrt convention needed,
    and V² is monotone in V so the ranking is identical). A single-category
    axis (min(r,c) = 1) has no association dimension → ``v2_ppm = 0`` by
    documented contract.

    Scale shape: identical to :func:`contingency_chi2` — per-batch Arrow
    cell-count partials, ONE bucketed fold, driver finish over the bounded
    cell table in Python ints (n⁴·10⁶ passes int64 — the HUGEINT-mirror
    posture). Output: one row ``(n, k1_card, k2_card, chi2_ppm, v2_ppm)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([k1, k2]).group_by([k1, k2]).aggregate(
            [([], "count_all")])
        return g.rename_columns([k1, k2, "o"])

    cells = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [k1, k2], {"o": ("o", "sum")}, num_buckets=num_buckets,
    ).to_pandas()

    rt = cells.groupby(k1)["o"].sum().astype("int64")
    ct = cells.groupby(k2)["o"].sum().astype("int64")
    n = int(cells["o"].sum())
    observed = {(a, b): int(o) for a, b, o in
                zip(cells[k1], cells[k2], cells["o"])}
    chi2_ppm = 0
    for a, r in rt.items():
        for b, c in ct.items():
            o = observed.get((a, b), 0)
            chi2_ppm += ((n * o - int(r) * int(c)) ** 2 * 1_000_000
                         // (n * int(r) * int(c)))
    r_card = len(rt)
    c_card = len(ct)
    mindim = min(r_card, c_card) - 1
    v2_ppm = chi2_ppm // (n * mindim) if mindim > 0 else 0
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "k1_card": pd.Series([r_card], dtype="int64"),
        "k2_card": pd.Series([c_card], dtype="int64"),
        "chi2_ppm": pd.Series([chi2_ppm], dtype="int64"),
        "v2_ppm": pd.Series([v2_ppm], dtype="int64"),
    })


def cramers_v_sql(*, k1: str, k2: str, table: str) -> str:
    """SQL mirror: HUGEINT per-cell floor terms over the FULL marginal
    grid (CROSS JOIN of the marginals, unobserved cells at o = 0),
    integer sum, same single-axis-⇒-0 contract (all terms nonneg so
    DuckDB's truncating // equals floor)."""
    return f"""
        WITH c AS (
            SELECT {k1}, {k2}, count(*)::HUGEINT AS o FROM {table}
            GROUP BY 1, 2
        ), r AS (SELECT {k1}, sum(o) AS rt FROM c GROUP BY 1),
        cc AS (SELECT {k2}, sum(o) AS ct FROM c GROUP BY 1),
        g AS (SELECT sum(o) AS n,
                     count(DISTINCT {k1}) AS rcard,
                     count(DISTINCT {k2}) AS ccard FROM c),
        grid AS (
          SELECT r.{k1}, cc.{k2}, r.rt, cc.ct,
                 coalesce(c.o, 0::HUGEINT) AS o
          FROM r CROSS JOIN cc
          LEFT JOIN c ON c.{k1} = r.{k1} AND c.{k2} = cc.{k2}
        ),
        t AS (
          SELECT ((n*o - rt*ct) * (n*o - rt*ct) * 1000000)
                 // (n * rt * ct) AS term, n, rcard, ccard
          FROM grid CROSS JOIN g
        )
        SELECT n::BIGINT AS n, rcard::BIGINT AS k1_card,
               ccard::BIGINT AS k2_card,
               sum(term)::BIGINT AS chi2_ppm,
               CASE WHEN least(rcard, ccard) > 1
                    THEN (sum(term) // (n * (least(rcard, ccard) - 1)))::BIGINT
                    ELSE 0 END AS v2_ppm
        FROM t GROUP BY n, rcard, ccard"""


def calibration_bins(ds, *, score_col: str, label_col: str,
                     num_bins: int = 10, scale: int = 1_000_000,
                     num_buckets: int = 8):
    """Reliability diagram over a scored corpus — the calibration audit
    (Guo et al. ICML'17 posture, equal-width binning) every
    quality-classifier gate runs before its scores are trusted as keep
    probabilities: bin the integer score ``∈ [0, scale]`` into
    ``num_bins`` equal-width bins and report, per bin, how the score
    PROMISES (mean score) vs what the labels DELIVER (positive rate).
    A calibrated scorer tracks the diagonal; a bin whose
    ``pos_rate_ppm`` sits far under its ``mean_score_ppm`` is
    over-confident exactly there — the threshold region to distrust.

    Contract: ``bin = min(score·num_bins // scale, num_bins−1)`` (the
    top edge closes the last bin); ``mean_score_ppm = Σscore // n`` (the
    engine-wide floor convention — exact because scores are already ppm
    integers); ``pos_rate_ppm = n_pos·10⁶ // n``. Labels are 0/1 int64;
    negative scores violate the contract and raise. Empty bins are
    omitted (no rows → no evidence, and the output stays audit-sized).

    Scale shape: per-batch ``np.add.at`` histogram partials — each batch
    collapses to ≤ num_bins rows of exact int64 (n, n_pos, sum_score)
    before the ONE tiny bin-keyed fold; the ppm finish walks ≤ num_bins
    rows on the driver.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(s) and s.min() < 0:
            raise ValueError("calibration_bins: negative score "
                             "(contract: score in [0, scale])")
        b = np.minimum(s * num_bins // scale, num_bins - 1)
        n = np.bincount(b, minlength=num_bins)
        npos = np.zeros(num_bins, dtype=np.int64)
        np.add.at(npos, b, y)
        ssum = np.zeros(num_bins, dtype=np.int64)
        np.add.at(ssum, b, s)
        keep = n > 0
        return pa.table({
            "bin": pa.array(np.arange(num_bins, dtype=np.int64)[keep]),
            "n": pa.array(n[keep].astype(np.int64)),
            "n_pos": pa.array(npos[keep]),
            "sum_score": pa.array(ssum[keep]),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum"),
                  "sum_score": ("sum_score", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    folded = folded.sort_values("bin").reset_index(drop=True)
    n = folded["n"].astype("int64")
    return pd.DataFrame({
        "bin": folded["bin"].astype("int64"),
        "n": n,
        "n_pos": folded["n_pos"].astype("int64"),
        "mean_score_ppm": (folded["sum_score"].astype("int64")
                           // n).astype("int64"),
        "pos_rate_ppm": (folded["n_pos"].astype("int64") * 1_000_000
                         // n).astype("int64"),
    })


def calibration_bins_sql(*, table_expr: str, score: str, label: str,
                         num_bins: int = 10,
                         scale: int = 1_000_000) -> str:
    """SQL mirror over a ``(score, label)`` table expression: identical
    bin edge and floor-division conventions (all quantities nonneg)."""
    return f"""
        WITH b AS (
          SELECT least({score} * {num_bins} // {scale}, {num_bins} - 1)
                     AS bin,
                 {score} AS s, {label} AS y
          FROM {table_expr}
        )
        SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n,
               sum(y)::BIGINT AS n_pos,
               (sum(s)::HUGEINT // count(*))::BIGINT AS mean_score_ppm,
               (sum(y)::HUGEINT * 1000000 // count(*))::BIGINT
                   AS pos_rate_ppm
        FROM b GROUP BY 1"""


def psi_drift(ds, *, value_col: str, side_col: str, left: str, right: str,
              num_buckets: int = 8):
    """Population Stability Index between two slices of a nonnegative
    integer feature, in the engine's floor-log2 BITS convention — the
    industry-standard feature-drift monitor (the credit-scoring PSI,
    Σ (p−q)·ln(p/q), with the natural log replaced by exact ⌊log2⌋ so
    every term is an integer both engines reproduce bit-for-bit; the
    grouped_ks/EMD drift duo says whether and where a distribution
    moved — PSI is the one-number per-feature dashboard row that says
    HOW MUCH, comparable across features and days).

    Binning: ``bin = ⌊log2(v+1)⌋`` (the :func:`log2_bucketize` scheme —
    ≤ 64 bins for any int64, no quantile pass needed). Per bin:
    ``p_ppm = n_left·10⁶ // N_left`` (and q for the right side), and

        psi_term = (p_ppm − q_ppm) · (⌊log2(p_ppm+1)⌋ − ⌊log2(q_ppm+1)⌋)

    — both factors share sign by ⌊log2⌋ monotonicity, so every term is
    ≥ 0 like true PSI and the total is an order-free integer sum the
    reader performs. Rows whose side is neither ``left`` nor ``right``
    are ignored; values must be ≥ 0 (quantize to cents first — the
    engine-wide convention; negatives raise).

    Scale shape: per-batch (bin, side) count partials via one
    ``np.add.at`` histogram each — ≤ 128 rows cross per batch — one tiny
    bin-keyed fold, driver ppm/log finish over ≤ 64 bins.
    Output: ``(bin, n_left, n_right, p_ppm, q_ppm, psi_term)`` for bins
    observed on either side.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        side = t.column(side_col)
        is_l = pc.equal(side, left).to_numpy(zero_copy_only=False)
        is_r = pc.equal(side, right).to_numpy(zero_copy_only=False)
        if len(v) and v[is_l | is_r].size and v[is_l | is_r].min() < 0:
            raise ValueError("psi_drift: negative value "
                             "(contract: value >= 0)")
        b = _ilog2(v + 1)
        nl = np.zeros(64, dtype=np.int64)
        nr = np.zeros(64, dtype=np.int64)
        np.add.at(nl, b[is_l], 1)
        np.add.at(nr, b[is_r], 1)
        keep = (nl > 0) | (nr > 0)
        return pa.table({
            "bin": pa.array(np.arange(64, dtype=np.int64)[keep]),
            "n_left": pa.array(nl[keep]),
            "n_right": pa.array(nr[keep]),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], {"n_left": ("n_left", "sum"),
                  "n_right": ("n_right", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("bin").reset_index(drop=True)

    tl = int(folded["n_left"].sum())
    tr = int(folded["n_right"].sum())
    nl = folded["n_left"].astype("int64").to_numpy()
    nr = folded["n_right"].astype("int64").to_numpy()
    p = nl * 1_000_000 // max(tl, 1)
    q = nr * 1_000_000 // max(tr, 1)
    term = (p - q) * (_ilog2(p + 1) - _ilog2(q + 1))
    return pd.DataFrame({
        "bin": folded["bin"].astype("int64"),
        "n_left": pd.Series(nl, dtype="int64"),
        "n_right": pd.Series(nr, dtype="int64"),
        "p_ppm": pd.Series(p, dtype="int64"),
        "q_ppm": pd.Series(q, dtype="int64"),
        "psi_term": pd.Series(term, dtype="int64"),
    })


def woe_iv(ds, *, value_col: str, label_col: str, num_buckets: int = 8):
    """Weight of Evidence + Information Value per feature bin — the
    credit-scoring feature-strength screen (Siddiqi's standard tables),
    in the engine's floor-log2 bits convention. IV is literally
    :func:`psi_drift` between the label-conditional distributions of the
    feature (goods vs bads) — the identity this implementation leans on —
    but the per-bin WoE DIRECTION is the part a modeler reads (which bins
    vote good, which bad), so it's surfaced as its own column rather than
    folded into the product.

    Bins: ``⌊log2(v+1)⌋`` over nonneg int64 values (negatives raise).
    Per bin, with ``g_ppm = n_good·10⁶ // N_good`` (label 0) and
    ``b_ppm = n_bad·10⁶ // N_bad`` (label 1):

        woe_bits = ⌊log2(g_ppm+1)⌋ − ⌊log2(b_ppm+1)⌋
        iv_term  = (g_ppm − b_ppm) · woe_bits        (≥ 0, weak-sign)

    Total IV = Σ iv_term — an order-free integer the reader sums
    (>~0.3·10⁶·bits ⇒ strong predictor, the usual reading rescaled).
    Labels are 0/1 int64.

    Scale shape: per-batch double ``np.add.at`` histograms — ≤ 128 rows
    per batch cross the ONE bin-keyed fold; ≤ 64-bin driver finish.
    Output ``(bin, n_good, n_bad, g_ppm, b_ppm, woe_bits, iv_term)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(v) and v.min() < 0:
            raise ValueError("woe_iv: negative value (contract: v >= 0)")
        b = _ilog2(v + 1)
        ng = np.zeros(64, dtype=np.int64)
        nb = np.zeros(64, dtype=np.int64)
        np.add.at(ng, b, 1 - y)
        np.add.at(nb, b, y)
        keep = (ng > 0) | (nb > 0)
        return pa.table({
            "bin": pa.array(np.arange(64, dtype=np.int64)[keep]),
            "n_good": pa.array(ng[keep]),
            "n_bad": pa.array(nb[keep]),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], {"n_good": ("n_good", "sum"), "n_bad": ("n_bad", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("bin").reset_index(drop=True)

    tg = int(folded["n_good"].sum())
    tb = int(folded["n_bad"].sum())
    ng = folded["n_good"].astype("int64").to_numpy()
    nb = folded["n_bad"].astype("int64").to_numpy()
    g = ng * 1_000_000 // max(tg, 1)
    b = nb * 1_000_000 // max(tb, 1)
    woe = _ilog2(g + 1) - _ilog2(b + 1)
    return pd.DataFrame({
        "bin": folded["bin"].astype("int64"),
        "n_good": pd.Series(ng, dtype="int64"),
        "n_bad": pd.Series(nb, dtype="int64"),
        "g_ppm": pd.Series(g, dtype="int64"),
        "b_ppm": pd.Series(b, dtype="int64"),
        "woe_bits": pd.Series(woe, dtype="int64"),
        "iv_term": pd.Series((g - b) * woe, dtype="int64"),
    })


def woe_iv_sql(*, table_expr: str, value: str, label: str) -> str:
    """SQL mirror over a ``(value, label)`` expression: the psi_drift
    format('{{:b}}') ⌊log2⌋ identity with label-conditional totals."""
    def ilog2(x: str) -> str:
        return f"(length(format('{{:b}}', {x})) - 1)"

    return f"""
        WITH base AS (
          SELECT {ilog2(f"({value}) + 1")} AS bin, {label} AS y
          FROM {table_expr}
        ), c AS (
          SELECT bin,
                 count(*) FILTER (WHERE y = 0)::BIGINT AS n_good,
                 count(*) FILTER (WHERE y = 1)::BIGINT AS n_bad
          FROM base GROUP BY 1
        ), g AS (
          SELECT greatest(sum(n_good), 1) AS tg,
                 greatest(sum(n_bad), 1) AS tb FROM c
        ), pq AS (
          SELECT bin, n_good, n_bad,
                 (n_good::HUGEINT * 1000000 // tg)::BIGINT AS g_ppm,
                 (n_bad::HUGEINT * 1000000 // tb)::BIGINT AS b_ppm
          FROM c CROSS JOIN g
        )
        SELECT bin, n_good, n_bad, g_ppm, b_ppm,
               ({ilog2("g_ppm + 1")} - {ilog2("b_ppm + 1")})::BIGINT
                   AS woe_bits,
               ((g_ppm - b_ppm)
                * ({ilog2("g_ppm + 1")} - {ilog2("b_ppm + 1")}))::BIGINT
                   AS iv_term
        FROM pq"""


def pr_curve(ds, *, score_col: str, label_col: str, num_buckets: int = 8):
    """Exact precision/recall curve over every distinct score threshold —
    the table behind threshold picking ("smallest keep-score giving
    ≥95% precision"), computed distributed under the bounded-support
    contract of :func:`numeric_profile` (distinct score values ≪ rows:
    ppm scores, quantized features — quantize first otherwise, the
    engine-wide convention).

    Decision rule at threshold t: predict positive iff ``score ≥ t``;
    thresholds are the observed distinct scores (every achievable
    operating point, nothing else). Per threshold, in exact floor ppm:

        precision_ppm = tp·10⁶ // n_ge       recall_ppm = tp·10⁶ // P

    where ``n_ge``/``tp`` are rows/positives at score ≥ t and P is the
    corpus positive count. A corpus with NO positives has no defined
    recall — empty result by documented contract.

    Scale shape: per-batch (score, n, n_pos) partials via Arrow group_by,
    ONE score-keyed fold, driver desc-sort + cumsum over the bounded
    support. Output ``(threshold, n_ge, tp, precision_ppm,
    recall_ppm)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([score_col, label_col]).group_by(
            [score_col]).aggregate([([], "count_all"),
                                    (label_col, "sum")])
        names = g.column_names
        # group_by output order: key, count, sum — normalize names
        out = {"s": g.column(score_col)}
        for nm in names:
            if nm.endswith("count_all"):
                out["n"] = g.column(nm).cast(pa.int64())
            elif nm.endswith("sum"):
                out["n_pos"] = g.column(nm).cast(pa.int64())
        return pa.table(out)

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["s"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("s", ascending=False).reset_index(drop=True)

    total_pos = int(folded["n_pos"].sum())
    if total_pos == 0:
        return pd.DataFrame({
            "threshold": pd.Series([], dtype="int64"),
            "n_ge": pd.Series([], dtype="int64"),
            "tp": pd.Series([], dtype="int64"),
            "precision_ppm": pd.Series([], dtype="int64"),
            "recall_ppm": pd.Series([], dtype="int64"),
        })
    n_ge = folded["n"].astype("int64").cumsum()
    tp = folded["n_pos"].astype("int64").cumsum()
    return pd.DataFrame({
        "threshold": folded["s"].astype("int64"),
        "n_ge": n_ge.astype("int64"),
        "tp": tp.astype("int64"),
        "precision_ppm": (tp * 1_000_000 // n_ge).astype("int64"),
        "recall_ppm": (tp * 1_000_000 // total_pos).astype("int64"),
    })


def pr_curve_sql(*, table_expr: str, score: str, label: str) -> str:
    """SQL mirror: desc-ordered window cumulatives over the distinct
    score support; empty when the corpus has no positives."""
    return f"""
        WITH base AS (
          SELECT {score} AS s, {label} AS y FROM {table_expr}
        ), c AS (
          SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
          FROM base GROUP BY 1
        ), w AS (
          SELECT s,
                 sum(n) OVER (ORDER BY s DESC) AS n_ge,
                 sum(n_pos) OVER (ORDER BY s DESC) AS tp,
                 (SELECT sum(n_pos) FROM c) AS p
          FROM c
        )
        SELECT s::BIGINT AS threshold, n_ge::BIGINT AS n_ge,
               tp::BIGINT AS tp,
               (tp::HUGEINT * 1000000 // n_ge)::BIGINT AS precision_ppm,
               (tp::HUGEINT * 1000000 // p)::BIGINT AS recall_ppm
        FROM w WHERE p > 0"""


def psi_drift_sql(*, table_expr: str, value: str, side: str,
                  left: str, right: str) -> str:
    """SQL mirror: ⌊log2 x⌋ = length(format('{{:b}}', x)) − 1 (the
    surprisal-oracle identity); floor divisions are of nonnegatives so
    DuckDB's truncating // agrees."""
    def ilog2(x: str) -> str:
        return f"(length(format('{{:b}}', {x})) - 1)"

    return f"""
        WITH base AS (
          SELECT {ilog2(f"({value}) + 1")} AS bin, {side} AS sd
          FROM {table_expr}
          WHERE {side} IN ('{left}', '{right}')
        ), c AS (
          SELECT bin,
                 count(*) FILTER (WHERE sd = '{left}')::BIGINT AS n_left,
                 count(*) FILTER (WHERE sd = '{right}')::BIGINT AS n_right
          FROM base GROUP BY 1
        ), g AS (
          SELECT greatest(sum(n_left), 1) AS tl,
                 greatest(sum(n_right), 1) AS tr FROM c
        ), pq AS (
          SELECT bin, n_left, n_right,
                 (n_left::HUGEINT * 1000000 // tl)::BIGINT AS p_ppm,
                 (n_right::HUGEINT * 1000000 // tr)::BIGINT AS q_ppm
          FROM c CROSS JOIN g
        )
        SELECT bin, n_left, n_right, p_ppm, q_ppm,
               ((p_ppm - q_ppm)
                * ({ilog2("p_ppm + 1")} - {ilog2("q_ppm + 1")}))::BIGINT
                   AS psi_term
        FROM pq"""


# ---------------------------------------------------------------------------
# table-level data-quality audit


def table_audit(ds, *, columns, p: int = 6, num_buckets: int = 16):
    """Per-column data-quality profile of a table: ``(col_name, n,
    n_null, approx_distinct, registers_used)`` — the first look any
    ingestion pipeline takes at a new feed (null health + cardinality
    class per column) without paying an exact per-column distinct.

    Composition: a long-format projection (column label, value string,
    nulls dropped) feeds the existing HyperLogLog fold
    (:func:`~htrc_feature_reader_ray.stages.sketch.approx_distinct`,
    registers — not values — cross the exchange, bit-exact md5 SQL
    replay), while null/row counts fold as per-batch integer partials.
    Values hash via ``str(v)``; the audit contract is int/string columns
    (the SQL mirror casts ``::VARCHAR`` — float formatting differs
    between engines, quantize floats first as everywhere else).
    Both folded tables are |columns| rows; the driver merge is trivial.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate
    from htrc_feature_reader_ray.stages.sketch import approx_distinct

    columns = list(columns)

    def count_partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        for c in columns:
            col = t.column(c)
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
        return pa.table({
            "col_name": pa.array(names, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "n_null": pa.array(nulls, type=pa.int64()),
        })

    counts = bucketed_aggregate(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["col_name"], {"n": ("n", "sum"), "n_null": ("n_null", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    def long_rows(t: pa.Table) -> pa.Table:
        labels, vals = [], []
        for c in columns:
            arr = t.column(c).drop_null()
            s = [str(v) for v in arr.to_pylist()]
            labels.extend([c] * len(s))
            vals.extend(s)
        return pa.table({
            "col_name": pa.array(labels, type=pa.string()),
            "v": pa.array(vals, type=pa.string()),
        })

    distincts = approx_distinct(
        ds.map_batches(long_rows, batch_format="pyarrow"),
        group_cols=["col_name"], value_col="v", p=p,
        num_buckets=num_buckets,
    ).to_pandas()

    out = counts.merge(distincts, on="col_name")
    out["n"] = out["n"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return out[["col_name", "n", "n_null", "approx_distinct",
                "registers_used"]].sort_values("col_name").reset_index(
        drop=True)


def table_audit_sql(*, columns, table: str, p: int = 6) -> str:
    """SQL mirror: per-column UNION ALL of null counts + the bit-exact
    HLL re-derivation (same estimator constants as sketch.approx_distinct)."""
    from htrc_feature_reader_ray.stages.sketch import _alpha

    m = 1 << p
    K = 64 - p
    C = _alpha(m) * (m * m) * 2.0**64
    parts = []
    for c in columns:
        parts.append(f"""
        SELECT '{c}' AS col_name,
               (SELECT count(*) FROM {table})::BIGINT AS n,
               (SELECT count(*) FILTER (WHERE {c} IS NULL)
                FROM {table})::BIGINT AS n_null,
               est.approx_distinct, est.registers_used
        FROM (
            WITH vals AS (
              SELECT DISTINCT ({c})::VARCHAR AS v FROM {table}
              WHERE {c} IS NOT NULL
            ), h AS (
              SELECT md5_number_upper(v)::UBIGINT AS h FROM vals
            ), reg AS (
              SELECT (h & {m - 1})::BIGINT AS reg,
                     (CASE WHEN (h >> {p}) = 0 THEN {K + 1}
                           ELSE {K} - length(bin(h >> {p})) + 1
                      END)::BIGINT AS rho
              FROM h
            ), mx AS (
              SELECT reg, max(rho) AS rho FROM reg GROUP BY reg
            )
            SELECT {C!r} / (({m} - count(*))::HUGEINT * 18446744073709551616
                   + sum((1::UBIGINT << (64 - rho))::HUGEINT))::DOUBLE
                       AS approx_distinct,
                   count(*)::BIGINT AS registers_used
            FROM mx
        ) est""")
    return " UNION ALL ".join(parts)


def grouped_trend(ds, *, key: str, x_col: str, y_col: str,
                  num_buckets: int = 32):
    """Per-group least-squares TREND (slope + intercept) of a quantized
    integer pair — the "is this user's spend rising" feature — from the
    same exact-moment fold as :func:`grouped_moments`:

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
        intercept = (Σy − slope·Σx) / n

    Numerator/denominator are exact integers (Python arbitrary precision
    == SQL HUGEINT); slope is ONE correctly-rounded divide on each side,
    intercept one fused expression evaluated identically.  Zero-x-variance
    groups yield NULL slope/intercept."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = pa.table({
            key: t.column(key),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxx": pa.array(x * x), "sxy": pa.array(x * y),
        })
        g = t2.group_by([key]).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxx", "sum"),
             ("sxy", "sum"), ([], "count_all")])
        return g.rename_columns([key, "sx", "sy", "sxx", "sxy", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        {c: (c, "sum") for c in ["n", "sx", "sy", "sxx", "sxy"]},
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized fast path (no-int64-overflow guard only: int64 ->
        # float64 conversion is correctly rounded for ALL int64, so the
        # divides match the Python-int path bit for bit); guarded rows
        # drop to the exact loop
        n = df["n"].to_numpy(dtype=np.int64)
        sx = df["sx"].to_numpy(dtype=np.int64)
        sy = df["sy"].to_numpy(dtype=np.int64)
        sxx = df["sxx"].to_numpy(dtype=np.int64)
        sxy = df["sxy"].to_numpy(dtype=np.int64)
        nf, sxf, syf = (a.astype(np.float64) for a in (n, sx, sy))
        sxxf, sxyf = (a.astype(np.float64) for a in (sxx, sxy))
        LIM = 2.0 ** 61
        ok = (np.maximum.reduce([
            np.abs(nf * sxxf), sxf * sxf,
            np.abs(nf * sxyf), np.abs(sxf * syf)]) < LIM)
        den = n * sxx - sx * sx
        num = n * sxy - sx * sy
        slope = np.full(len(n), np.nan)
        inter = np.full(len(n), np.nan)
        pos = ok & (den > 0)
        s = num[pos].astype(np.float64) / den[pos].astype(np.float64)
        slope[pos] = s
        inter[pos] = (syf[pos] - s * sxf[pos]) / nf[pos]
        for i in np.flatnonzero(~ok):
            ni, sxi, syi = int(n[i]), int(sx[i]), int(sy[i])
            d = ni * int(sxx[i]) - sxi * sxi
            if d > 0:
                si = float(ni * int(sxy[i]) - sxi * syi) / float(d)
                slope[i] = si
                inter[i] = (float(syi) - si * float(sxi)) / float(ni)
        return pd.DataFrame({
            key: df[key],
            "n": df["n"].astype("int64"),
            "slope": pd.Series(slope, index=df.index, dtype="float64"),
            "intercept": pd.Series(inter, index=df.index,
                                   dtype="float64"),
        })

    return folded.map_batches(finish, batch_format="pandas")


def impute_group_median(ds, *, key: str, col: str, num_buckets: int = 16,
                        flag_col: str = "was_null"):
    """Group-median NULL imputation — the standard feature-store fill for
    a numeric column with missing values: every NULL in ``col`` is
    replaced by its group's discrete median (1-based rank ``ceil(n/2)``
    over the NON-NULL rows == DuckDB ``quantile_disc(col, 0.5)``), and a
    boolean ``flag_col`` records which rows were imputed.  Groups whose
    values are ALL NULL have no median and stay NULL (flag still set).

    Scale shape: phase 1 folds a per-group DISTINCT-VALUE histogram of
    the non-null rows (per-batch ``group_by(key, col).count`` combiner →
    one key-bucketed fold → rank lookup), so only ``(key, value, cnt)``
    partials cross the exchange; the resulting one-row-per-group median
    table is broadcast once via ``ray.put`` (sorted arrays + searchsorted,
    the same small-side pattern as ``assoc.attach``) and the fill is a
    single stateless vectorized ``map_batches`` over the streaming input.
    Documented contract: the (key, median) table fits a worker — one int
    per group; for 10^9-key domains use a ``bucket_join`` attach instead.

    ``col`` must be integer-typed (quantize doubles to cents first) so the
    median is exact and order-independent."""
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def hist(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select([key, col]).filter(
            pc.is_valid(batch.column(col)))
        g = t.group_by([key, col]).aggregate([([], "count_all")])
        return g.rename_columns([key, col, "cnt"])

    def medians(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([key, col], as_index=False)["cnt"].sum()
        rows = []
        for gkey, g in merged.groupby(key, sort=False):
            g = g.sort_values(col)
            cum = g["cnt"].to_numpy().cumsum()
            n = int(cum[-1])
            med = int(g[col].to_numpy()[
                int(np.searchsorted(cum, -(-n // 2)))])
            rows.append((gkey, med))
        return pd.DataFrame(rows, columns=[key, "median"]).astype(
            {"median": "int64"})

    med_df = bucketed_map_groups(
        ds.map_batches(hist, batch_format="pyarrow"), key, medians,
        num_buckets=num_buckets,
    ).to_pandas().sort_values(key)
    med_ref = ray.put((med_df[key].to_numpy(),
                       med_df["median"].to_numpy().astype(np.int64)))

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        keys_arr, meds = ray.get(med_ref)
        out = df.copy()
        isnull = out[col].isna().to_numpy()
        out[flag_col] = isnull
        kv = out[key].to_numpy()
        pos = np.searchsorted(keys_arr, kv)
        # groups absent from the median table (all-NULL) keep NULL
        pos_ok = pos < len(keys_arr)
        has_med = np.zeros(len(out), dtype=bool)
        has_med[pos_ok] = keys_arr[pos[pos_ok]] == kv[pos_ok]
        take = isnull & has_med
        vals = out[col].to_numpy(dtype="float64", na_value=np.nan)
        vals[take] = meds[pos[take]]
        mask = np.isnan(vals)
        out[col] = pd.arrays.IntegerArray(
            np.where(mask, 0, vals).astype(np.int64), mask=mask)
        return out

    return ds.map_batches(fill, batch_format="pandas")


def impute_group_median_sql(*, key: str, value_expr: str, table: str,
                            select_cols: str, col_name: str,
                            flag_col: str = "was_null") -> str:
    """SQL mirror: quantile_disc(0.5) over non-null rows per group,
    LEFT JOIN + coalesce fill, IS NULL flag."""
    return f"""
        WITH v AS (
            SELECT {select_cols}, {key}, ({value_expr})::BIGINT AS c
            FROM {table}
        ), m AS (
            SELECT {key}, quantile_disc(c, 0.5)::BIGINT AS med
            FROM v WHERE c IS NOT NULL GROUP BY 1
        )
        SELECT {select_cols}, v.{key},
               coalesce(v.c, m.med) AS {col_name},
               (v.c IS NULL) AS {flag_col}
        FROM v LEFT JOIN m USING ({key})"""


def winsorize_group(ds, *, key: str, col: str, q_lo: float = 0.05,
                    q_hi: float = 0.95, num_buckets: int = 16,
                    out_col: str | None = None):
    """Per-group winsorization — clip ``col`` to its group's exact
    discrete [q_lo, q_hi] quantiles (the standard heavy-tail taming pass
    before scaling/encoding a feature).  Adds ``out_col`` (default
    ``{col}_winsor``); original rows/columns pass through untouched.

    Scale shape: the per-group thresholds come from ONE distinct-value
    histogram fold (identical machinery and rank convention —
    1-based ``ceil(q·n)`` == DuckDB ``quantile_disc`` — as
    :func:`grouped_profile`); the two-int-per-group threshold table
    broadcasts via ``ray.put`` (documented worker-fit contract, same as
    :func:`impute_group_median`) and the clip is one stateless
    vectorized pass — no second shuffle.  ``col`` must be integer-typed
    (quantize doubles first)."""
    import ray

    out_col = out_col or f"{col}_winsor"
    prof = grouped_profile(
        ds, group_cols=[key], col=col, qs=(q_lo, q_hi),
        num_buckets=num_buckets,
    ).to_pandas().sort_values(key)
    lo_col, hi_col = f"p{int(q_lo * 100)}", f"p{int(q_hi * 100)}"
    ref = ray.put((prof[key].to_numpy(),
                   prof[lo_col].to_numpy().astype(np.int64),
                   prof[hi_col].to_numpy().astype(np.int64)))

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        keys_arr, lo, hi = ray.get(ref)
        out = df.copy()
        pos = np.searchsorted(keys_arr, out[key].to_numpy())
        v = out[col].to_numpy().astype(np.int64)
        out[out_col] = np.minimum(np.maximum(v, lo[pos]), hi[pos])
        return out

    return ds.map_batches(clip, batch_format="pandas")


def winsorize_group_sql(*, key: str, value_expr: str, table: str,
                        select_cols: str, col_name: str,
                        q_lo: float = 0.05, q_hi: float = 0.95,
                        out_col: str | None = None) -> str:
    """SQL mirror: per-group quantile_disc thresholds + least/greatest."""
    out_col = out_col or f"{col_name}_winsor"
    return f"""
        WITH v AS (
            SELECT {select_cols}, {key}, ({value_expr})::BIGINT AS c
            FROM {table}
        ), th AS (
            SELECT {key}, quantile_disc(c, {q_lo})::BIGINT AS lo,
                   quantile_disc(c, {q_hi})::BIGINT AS hi
            FROM v GROUP BY 1
        )
        SELECT {select_cols}, v.{key}, v.c AS {col_name},
               least(greatest(v.c, th.lo), th.hi)::BIGINT AS {out_col}
        FROM v JOIN th USING ({key})"""


def quantile_transform_group(ds, *, key: str, col: str,
                             num_buckets: int = 16,
                             out_col: str = "q_ppm"):
    """Per-group quantile (rank) transform — map each value to its
    group-relative rank position ``(rank−1)·10⁶ // (n−1)`` with rank the
    MIN rank of equal values (ties share a rank, SQL ``rank()``): the
    exact-integer cousin of sklearn's QuantileTransformer, immune to the
    outliers that break min-max scaling.  Single-value groups map to 0.

    One key-bucketed exchange; inside each bucket ranks are computed for
    ALL groups in one lexsort pass (no per-group Python loop)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            out[out_col] = pd.Series(dtype="int64")
            return out
        order = np.lexsort((df[col].to_numpy(), df[key].to_numpy()))
        k = df[key].to_numpy()[order]
        v = df[col].to_numpy()[order]
        idx = np.arange(len(df), dtype=np.int64)
        new_grp = np.ones(len(df), dtype=bool)
        new_grp[1:] = k[1:] != k[:-1]
        grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        # min rank of equal values: index of the run's first occurrence
        new_val = new_grp.copy()
        new_val[1:] |= v[1:] != v[:-1]
        val_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        rank = val_start - grp_start + 1
        # group sizes by scatter of (next_start - start)
        starts = idx[new_grp]
        sizes = np.diff(np.append(starts, len(df)))
        n = np.repeat(sizes, sizes)
        q = (rank - 1) * 1_000_000 // np.maximum(n - 1, 1)
        out = df.iloc[order].copy()
        out[out_col] = q.astype(np.int64)
        return out

    return bucketed_map_groups(ds, key, ranks, num_buckets=num_buckets)


def quantile_transform_group_sql(*, key: str, value_expr: str, table: str,
                                 select_cols: str, col_name: str,
                                 out_col: str = "q_ppm") -> str:
    """SQL mirror: rank() window over the identical (key, value) order."""
    return f"""
        WITH v AS (
            SELECT {select_cols}, {key}, ({value_expr})::BIGINT AS c
            FROM {table}
        )
        SELECT {select_cols}, {key}, c AS {col_name},
               ((rank() OVER (PARTITION BY {key} ORDER BY c) - 1)
                * 1000000
                // greatest(count(*) OVER (PARTITION BY {key}) - 1, 1)
               )::BIGINT AS {out_col}
        FROM v"""


def datetime_features(ds, *, id_col: str, ts: str):
    """Row-level calendar feature extraction — the most basic
    feature-engineering map there is (every tabular-ML pipeline's first
    derived columns), made contract-exact so the mirror replays it:
    per row, ``year, month, dom, hour`` (proleptic-Gregorian calendar —
    pandas datetime64 and SQL date_part agree by construction),
    ``isodow`` (ISO: Monday=1 … Sunday=7 — the convention both pandas
    ``dayofweek+1`` and DuckDB ``isodow`` share, chosen over the
    ambiguous 0-based forms), and ``is_weekend`` (isodow ≥ 6, int64
    0/1). Cyclic sin/cos encodings are deliberately omitted: libm trig
    is not bit-stable across engines; downstream one-hots or the
    integer fields themselves carry the signal exactly.

    Scale shape: stateless zero-exchange ``map_batches``; vectorized
    pandas ``.dt`` accessors (the calendar kernel Arrow lacks)."""

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts].astype("datetime64[us]")
        isodow = (t.dt.dayofweek + 1).astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "year": t.dt.year.astype(np.int64),
            "month": t.dt.month.astype(np.int64),
            "dom": t.dt.day.astype(np.int64),
            "hour": t.dt.hour.astype(np.int64),
            "isodow": isodow,
            "is_weekend": (isodow >= 6).astype(np.int64),
        })

    return ds.map_batches(feats, batch_format="pandas")


def datetime_features_sql(*, table: str, id_col: str, ts: str) -> str:
    """SQL mirror: date_part fields, isodow, the same is_weekend int."""
    return f"""
        SELECT {id_col},
               date_part('year', {ts})::BIGINT AS year,
               date_part('month', {ts})::BIGINT AS month,
               date_part('day', {ts})::BIGINT AS dom,
               date_part('hour', {ts})::BIGINT AS hour,
               date_part('isodow', {ts})::BIGINT AS isodow,
               (date_part('isodow', {ts}) >= 6)::BIGINT AS is_weekend
        FROM {table}"""


def count_encoding(ds, *, cat_col: str, num_buckets: int = 16):
    """Frequency (count) encoding of a categorical column — the
    unsupervised sibling of :func:`target_encoding` (no label leakage
    risk, so no smoothing needed; gradient-boosting pipelines reach for
    it first): one row per category with its exact support ``n`` and
    ``freq_ppm = n·10⁶ // N`` against the global row count. Consumers
    broadcast-join the (small) category table back onto rows — the
    engine-wide dim-lookup discipline.

    Scale shape: per-batch Arrow count partials (combiner) → ONE
    cat-bucketed fold; the global N folds distributively off the
    category table (no second data pass); stateless ppm finish."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([cat_col]).group_by(cat_col)
             .aggregate([([], "count_all")]))
        return g.rename_columns([cat_col, "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        cat_col, {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).materialize()
    big_n = int(folded.sum("n") or 0)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            cat_col: df[cat_col],
            "n": n,
            "freq_ppm": (n * 1_000_000) // max(big_n, 1),
        })

    return folded.map_batches(finish, batch_format="pandas")


def count_encoding_sql(*, table: str, cat: str) -> str:
    """SQL mirror: plain count fold + cross-joined global N."""
    return f"""
        WITH c AS (
          SELECT {cat}, count(*)::BIGINT AS n FROM {table} GROUP BY 1
        ),
        g AS (SELECT sum(n)::BIGINT AS big_n FROM c)
        SELECT {cat}, n,
               (n::HUGEINT * 1000000 // big_n)::BIGINT AS freq_ppm
        FROM c, g"""


def target_encoding(ds, *, cat_col: str, label_expr, m: int = 10,
                    num_buckets: int = 16):
    """Smoothed target encoding of a categorical column — the classic
    supervised category feature ``enc = (Σ_cat label + m·μ) // (n_cat+m)``
    with ``μ = Σlabel // N`` the global floor-mean (all exact integers,
    order-independent; ``m`` is the pseudo-count pull toward the prior
    that keeps rare categories from memorizing their few labels).

    Scale shape: per-batch (cat, n, sum) partials (combiner) → one
    cat-bucketed fold; the two global scalars fold distributively off the
    category table; the finish map is stateless.  Output one row per
    category: (cat, n, enc).  ``label_expr`` is a callable
    ``pa.Table -> np.int64 array`` (quantize doubles to cents there)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        lab = label_expr(batch)
        t = pa.table({
            cat_col: batch.column(cat_col),
            "_s": pa.array(lab, type=pa.int64()),
        })
        g = t.group_by(cat_col).aggregate([("_s", "sum"), ([], "count_all")])
        return g.rename_columns([cat_col, "s", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        cat_col, {"s": ("s", "sum"), "n": ("n", "sum")},
        num_buckets=num_buckets,
    ).materialize()
    big_g = int(folded.sum("s") or 0)
    big_n = int(folded.sum("n") or 0)
    mu = big_g // big_n if big_n else 0

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy().astype(np.int64)
        n = batch.column("n").to_numpy().astype(np.int64)
        return pa.table({
            cat_col: batch.column(cat_col),
            "n": pa.array(n, type=pa.int64()),
            "enc": pa.array((s + m * mu) // (n + m), type=pa.int64()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def target_encoding_sql(*, cat_col: str, value_expr: str, table: str,
                        m: int = 10) -> str:
    """SQL mirror: identical integer smoothing, global floor-mean CTE."""
    return f"""
        WITH v AS (
            SELECT {cat_col}, ({value_expr})::BIGINT AS c FROM {table}
        ), agg AS (
            SELECT {cat_col}, count(*)::BIGINT AS n, sum(c)::BIGINT AS s
            FROM v GROUP BY 1
        ), g AS (
            SELECT sum(s) // sum(n) AS mu FROM agg
        )
        SELECT {cat_col}, n,
               ((s + {m} * mu) // (n + {m}))::BIGINT AS enc
        FROM agg, g"""


def target_encoding_loo(ds, *, cat_col: str, label_expr, m: int = 10,
                        num_buckets: int = 16, out_col: str = "enc_loo"):
    """Leave-one-out target encoding — the leak-resistant per-ROW variant
    of :func:`target_encoding`: each row's own label is excluded from its
    category's statistic, ``enc_i = (Σ_cat − label_i + m·μ) //
    (n_cat − 1 + m)`` (μ the fixed global floor-mean, all exact ints).

    Scale shape: the per-category (n, Σ) table folds once and broadcasts
    (``ray.put``; categories are the worker-fit small side by the same
    contract as :func:`collapse_rare`), then one stateless row pass —
    input rows stream through untouched plus the new column."""
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        lab = label_expr(batch)
        t = pa.table({
            cat_col: batch.column(cat_col),
            "_s": pa.array(lab, type=pa.int64()),
        })
        g = t.group_by(cat_col).aggregate([("_s", "sum"), ([], "count_all")])
        return g.rename_columns([cat_col, "s", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        cat_col, {"s": ("s", "sum"), "n": ("n", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values(cat_col)
    big_g = int(folded["s"].sum())
    big_n = int(folded["n"].sum())
    mu = big_g // big_n if big_n else 0
    ref = ray.put((folded[cat_col].to_numpy(),
                   folded["s"].to_numpy().astype(np.int64),
                   folded["n"].to_numpy().astype(np.int64)))

    def encode(batch: pa.Table) -> pa.Table:
        cats_arr, s, n = ray.get(ref)
        lab = label_expr(batch)
        pos = np.searchsorted(
            cats_arr, batch.column(cat_col).to_numpy(zero_copy_only=False))
        enc = (s[pos] - lab + m * mu) // (n[pos] - 1 + m)
        return batch.append_column(
            out_col, pa.array(enc.astype(np.int64), type=pa.int64()))

    return ds.map_batches(encode, batch_format="pyarrow")


def target_encoding_loo_sql(*, cat_col: str, value_expr: str, table: str,
                            select_cols: str, m: int = 10,
                            out_col: str = "enc_loo") -> str:
    """SQL mirror: window sums per category, identical LOO arithmetic."""
    return f"""
        WITH v AS (
            SELECT {select_cols}, {cat_col},
                   ({value_expr})::BIGINT AS c
            FROM {table}
        ), g AS (
            SELECT sum(c) // count(*) AS mu FROM v
        )
        SELECT {select_cols}, {cat_col},
               ((sum(c) OVER (PARTITION BY {cat_col}) - c + {m} * mu)
                // (count(*) OVER (PARTITION BY {cat_col}) - 1 + {m})
               )::BIGINT AS {out_col}
        FROM v, g"""


def _ilog2(v: np.ndarray) -> np.ndarray:
    """Exact floor(log2(v)) for int64 v >= 1 (binary-search shifts — no
    float log, which misplaces near power-of-two boundaries past 2^53);
    v <= 0 maps to -1."""
    b = np.full(len(v), -1, dtype=np.int64)
    pos = v > 0
    x = v[pos].astype(np.uint64)
    bb = np.zeros(len(x), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= np.uint64(1 << shift)
        bb[m] += shift
        x[m] >>= np.uint64(shift)
    b[pos] = bb
    return b


def log2_bucketize(ds, *, col: str, out_col: str = "log2_bucket"):
    """Log-scale feature binning without a float log: bucket =
    EXACT floor(log2(v)) (the bit length minus one) for v ≥ 1, −1 for
    v ≤ 0 — the order-independent, cross-engine-reproducible way to bin
    heavy-tailed counts/amounts (IEEE ``log2`` is not correctly rounded,
    so float binning can flip a value across a power-of-two boundary).
    Stateless vectorized map, zero exchange.

    SQL mirror: ``length(format('{:b}', v)) - 1``."""

    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy().astype(np.int64)
        return batch.append_column(
            out_col, pa.array(_ilog2(v), type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def log2_bucketize_sql(*, value_expr: str, table: str, select_cols: str,
                       col_name: str,
                       out_col: str = "log2_bucket") -> str:
    return f"""
        WITH v AS (
            SELECT {select_cols}, ({value_expr})::BIGINT AS c FROM {table}
        )
        SELECT {select_cols}, c AS {col_name},
               (CASE WHEN c <= 0 THEN -1
                     ELSE length(format('{{:b}}', c)) - 1
                END)::BIGINT AS {out_col}
        FROM v"""


def collapse_rare(ds, *, cat_col: str, min_count: int,
                  other: str = "__other__", num_buckets: int = 16,
                  out_col: str | None = None):
    """Rare-category collapse — categories seen fewer than ``min_count``
    times fold into one ``other`` bucket (the standard cardinality-taming
    pass before one-hot/target encoding; keeps the encoder's key space
    bounded by the head of the distribution).

    Scale shape: per-batch category-count partials → one cat-bucketed
    fold; the KEEP set (head categories only — bounded by
    corpus_size/min_count, so worker-fit by construction) broadcasts via
    ``ray.put``; the rewrite is one stateless vectorized pass."""
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    out_col = out_col or f"{cat_col}_c"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([cat_col]).group_by(cat_col).aggregate(
            [([], "count_all")])
        return g.rename_columns([cat_col, "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        cat_col, {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    keep = np.sort(
        folded.loc[folded["n"] >= min_count, cat_col].to_numpy())
    ref = ray.put(keep)

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        k = ray.get(ref)
        out = df.copy()
        v = out[cat_col].to_numpy()
        pos = np.searchsorted(k, v)
        ok = pos < len(k)
        hit = np.zeros(len(v), dtype=bool)
        hit[ok] = k[pos[ok]] == v[ok]
        out[out_col] = np.where(hit, v, other)
        return out

    return ds.map_batches(rewrite, batch_format="pandas")


def collapse_rare_sql(*, cat_col: str, table: str, select_cols: str,
                      min_count: int, other: str = "__other__",
                      out_col: str | None = None) -> str:
    out_col = out_col or f"{cat_col}_c"
    return f"""
        SELECT {select_cols}, {cat_col},
               CASE WHEN count(*) OVER (PARTITION BY {cat_col})
                         >= {min_count}
                    THEN {cat_col} ELSE '{other}' END AS {out_col}
        FROM {table}"""


def grouped_trend_sql(*, key: str, x_expr: str, y_expr: str,
                      table: str) -> str:
    """SQL mirror: HUGEINT moments, the identical divide/FMA-free
    intercept expression."""
    return f"""
        WITH m AS (
            SELECT {key}, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy
            FROM (SELECT {key}, ({x_expr})::BIGINT AS x,
                         ({y_expr})::BIGINT AS y FROM {table})
            GROUP BY {key}
        )
        SELECT {key}, n::BIGINT AS n,
               CASE WHEN (n*sxx - sx*sx) > 0
                    THEN (n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE
               END AS slope,
               CASE WHEN (n*sxx - sx*sx) > 0
                    THEN (sy::DOUBLE
                          - ((n*sxy - sx*sy)::DOUBLE
                             / (n*sxx - sx*sx)::DOUBLE) * sx::DOUBLE)
                         / n::DOUBLE
               END AS intercept
        FROM m"""


def cube_rollup(ds, *, dims, aggs, num_buckets: int = 16):
    """GROUP BY CUBE(dims...) — all 2^D grouping sets, with NULL marking
    the rolled-up dimensions (the OLAP cube materialization for dashboard
    fan-out). ``aggs``: ``{out_col: (in_col, 'sum'|'count')}``.

    Shape: the corpus folds ONCE to the finest cuboid (one bucketed
    exchange of per-batch partials); every coarser cuboid is re-aggregated
    from that base table, which is |dim1|x...x|dimD| rows — the lattice
    expansion is a driver pass over the base cuboid only, justified
    because cube dims are categorical by construction (a high-cardinality
    cube is a query bug, not an engine case). Additive aggregates only
    (sum/count compose through the lattice; min/max would too, avg would
    not)."""
    import itertools

    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    dims = list(dims)

    def partial(batch: pa.Table) -> pa.Table:
        spec = []
        names = list(dims)
        for out, (col, fn) in aggs.items():
            if fn == "count":
                spec.append(([], "count_all"))
            else:
                spec.append((col, "sum"))
            names.append(out)
        g = batch.group_by(dims).aggregate(spec)
        return g.rename_columns(names)

    base = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        dims, {out: (out, "sum") for out in aggs},
        num_buckets=num_buckets,
    ).to_pandas()  # finest cuboid: categorical-product-sized by contract

    out_cols = list(aggs)
    frames = []
    for r in range(len(dims) + 1):
        for keep in itertools.combinations(dims, r):
            if keep:
                f = base.groupby(list(keep), sort=False,
                                 as_index=False)[out_cols].sum()
            else:
                f = base[out_cols].sum().to_frame().T
            for d in dims:
                if d not in keep:
                    f[d] = None
            frames.append(f[dims + out_cols])
    out = pd.concat(frames, ignore_index=True)
    for c in out_cols:
        out[c] = out[c].astype("int64")
    return out


def cube_rollup_sql(*, table: str, dims, agg_exprs) -> str:
    """``agg_exprs``: list of full SQL aggregate expressions with aliases,
    e.g. ``["count(*)::BIGINT AS n", "sum(x)::BIGINT AS sx"]``."""
    d = ", ".join(dims)
    a = ", ".join(agg_exprs)
    return f"SELECT {d}, {a} FROM {table} GROUP BY CUBE ({d})"


def grouped_gini(ds, *, group_cols, value_col: str,
                 num_buckets: int = 16):
    """Exact integer Gini coefficient per group, in ppm:
    ``G = Σ_i (2i − n − 1)·x_(i) / (n·Σx)`` over the ascending-sorted
    values (1-based i) — the inequality/concentration feature (traffic
    skew per host, spend skew per cohort). Tie order among equal values
    provably cancels (equal x share the weight sum of their rank block),
    so the statistic is deterministic under any sort of ties.

    One group-bucketed exchange; rank/weight math vectorized across ALL
    groups per bucket; the final multiply runs in arbitrary-precision ints
    (mirrored by HUGEINT) so n²·x·10⁶ cannot silently wrap. Zero-sum
    groups report 0 by contract. Output: (group..., n, sum_value,
    gini_ppm)."""
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    group_cols = list(group_cols)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group_cols + [value_col], kind="mergesort")
        g = df.groupby(group_cols, sort=False)
        i = g.cumcount().to_numpy() + 1
        n = g[value_col].transform("size").to_numpy()
        x = df[value_col].astype("int64").to_numpy()
        term = (2 * i - n - 1).astype(object) * x.astype(object)
        agg = pd.DataFrame({
            **{c: df[c].to_numpy() for c in group_cols},
            "_term": term, "_x": x,
        }).groupby(group_cols, sort=False, as_index=False).agg(
            num=("_term", "sum"), s=("_x", "sum"), n=("_x", "size"))
        gini = [
            0 if int(s) == 0
            else int(int(num) * 1_000_000 // (int(n_) * int(s)))
            for num, s, n_ in zip(agg["num"], agg["s"], agg["n"])
        ]
        out = agg[group_cols].copy()
        out["n"] = agg["n"].astype("int64")
        out["sum_value"] = agg["s"].astype("int64")
        out["gini_ppm"] = np.asarray(gini, dtype=np.int64)
        return out

    return bucketed_map_groups(ds, group_cols[0], per_bucket,
                               num_buckets=num_buckets)


def grouped_gini_sql(*, table: str, group: str, value_expr: str) -> str:
    return f"""
        WITH c AS (SELECT {group} AS g, ({value_expr})::BIGINT AS v
                   FROM {table}),
        r AS (
          SELECT g, v,
                 row_number() OVER (PARTITION BY g ORDER BY v) AS i,
                 count(*) OVER (PARTITION BY g) AS n,
                 sum(v) OVER (PARTITION BY g) AS s
          FROM c
        ),
        t AS (
          SELECT g, sum((2 * i - n - 1)::HUGEINT * v) AS num,
                 max(n)::BIGINT AS n, max(s)::BIGINT AS s
          FROM r GROUP BY 1
        )
        SELECT g AS {group}, n, s AS sum_value,
               (CASE WHEN s = 0 THEN 0
                     ELSE num * 1000000 // (n::HUGEINT * s::HUGEINT)
                END)::BIGINT AS gini_ppm
        FROM t"""


def pareto_rank(ds, *, key_col: str, weight_col: str,
                threshold_ppm: int = 800_000, num_buckets: int = 16):
    """Pareto/80-20 concentration table: keys ranked by summed weight
    desc (key asc ties), with exact cumulative share in ppm and an
    ``in_head`` flag marking the minimal prefix reaching
    ``threshold_ppm`` of the total — "which hosts are 80% of the crawl".

    One bucketed weight fold; the ranked cumulative pass runs on the
    collected key table (bounded by key cardinality — hosts/sources, the
    op's contract; don't point it at raw urls). Output: (key, weight,
    cum_ppm, in_head)."""
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col, weight_col]).group_by(
            key_col).aggregate([(weight_col, "sum")])
        return g.rename_columns([key_col, "weight"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_col, {"weight": ("weight", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    folded = folded.sort_values(["weight", key_col],
                                ascending=[False, True],
                                kind="mergesort").reset_index(drop=True)
    total = int(folded["weight"].sum())
    cum = folded["weight"].astype("int64").cumsum()
    cum_ppm = (cum * 1_000_000 // max(total, 1)).astype("int64")
    # head = ranks up to and including the first row reaching threshold
    reached = (cum_ppm >= threshold_ppm).to_numpy()
    first = int(np.argmax(reached)) if reached.any() else len(folded)
    in_head = (np.arange(len(folded)) <= first).astype(np.int64)
    out = folded.copy()
    out["weight"] = out["weight"].astype("int64")
    out["cum_ppm"] = cum_ppm
    out["in_head"] = in_head
    return out


def pareto_rank_sql(*, table_expr: str, key: str, weight_expr: str,
                    threshold_ppm: int = 800_000) -> str:
    """``table_expr`` supplies rows; identical rank/cum/first-reach
    contract."""
    return f"""
        WITH w AS (
          SELECT {key} AS k, sum({weight_expr})::BIGINT AS weight
          FROM {table_expr} GROUP BY 1
        ),
        r AS (
          SELECT k, weight,
                 row_number() OVER (ORDER BY weight DESC, k) AS rn,
                 (sum(weight) OVER (ORDER BY weight DESC, k)
                  * 1000000 // greatest(sum(weight) OVER (), 1))::BIGINT
                   AS cum_ppm
          FROM w
        ),
        f AS (SELECT coalesce(min(rn), 9223372036854775807) AS first_rn
              FROM r WHERE cum_ppm >= {threshold_ppm})
        SELECT k AS {key}, weight, cum_ppm,
               (rn <= f.first_rn)::BIGINT AS in_head
        FROM r, f"""


def fk_violations(child, parent, *, child_key: str, parent_key: str,
                  num_buckets: int = 16, method: str = "auto",
                  parent_rows: int | None = None,
                  broadcast_limit: int = 2_000_000):
    """Referential-integrity audit: child keys with NO matching parent
    row, with their row counts — the ingestion-QA join-health check run
    BEFORE a big pipeline trusts a join. Child keys fold to (key, n)
    partials first (per-batch combine), so the anti-join moves distinct
    keys, never child rows. Output: (child_key, n_rows).

    The parent side of an FK audit is usually a DIMENSION table, so when
    its key set fits a worker (``method='broadcast'``, picked by 'auto'
    when ``parent_rows`` ≤ ``broadcast_limit`` — pass the count, e.g.
    from parquet metadata) the distinct parent keys ship once via
    ``ray.put`` and the anti-join becomes a stateless map-side
    ``isin`` filter over the folded counts — ONE exchange total instead
    of two. Unbounded parents keep the co-partitioned ``bucket_join``
    path ('auto' without ``parent_rows`` stays on it)."""
    import ray

    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([child_key]).group_by(child_key).aggregate(
            [([], "count_all")])
        return g.rename_columns([child_key, "n_rows"])

    counts = bucketed_aggregate(
        child.map_batches(partial, batch_format="pyarrow"),
        child_key, {"n_rows": ("n_rows", "sum")}, num_buckets=num_buckets)

    def keys_only(batch: pa.Table) -> pa.Table:
        return batch.select([parent_key]).group_by(parent_key).aggregate([])

    pkeys = parent.map_batches(keys_only, batch_format="pyarrow")
    if method == "auto":
        method = ("broadcast" if parent_rows is not None
                  and parent_rows <= broadcast_limit else "join")
    if method == "broadcast":
        # per-batch distinct -> driver set union (≤ parent_rows keys)
        idx = pd.Index(pkeys.to_pandas()[parent_key].unique())
        if len(idx) > broadcast_limit:
            raise ValueError(
                f"parent key set ({len(idx)}) exceeds broadcast_limit "
                f"({broadcast_limit}) — use method='join'")
        ref = ray.put(idx)

        def anti(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df[child_key].isin(ray.get(ref))]

        return counts.map_batches(anti, batch_format="pandas")
    return bucket_join(counts, pkeys, left_key=child_key,
                       right_key=parent_key, how="anti",
                       num_buckets=num_buckets)


def fk_violations_sql(*, child_table: str, parent_table: str,
                      child_key: str, parent_key: str) -> str:
    return f"""
        SELECT {child_key}, count(*)::BIGINT AS n_rows
        FROM {child_table}
        WHERE {child_key} NOT IN
              (SELECT {parent_key} FROM {parent_table})
        GROUP BY 1"""


def topn_collapse(ds, *, group_cols, key_col: str, n: int = 2,
                  other: str = "__other__", num_buckets: int = 16):
    """Per group: the top-``n`` keys by row count (count desc, key asc
    ties) kept verbatim, the tail collapsed into ONE ``other`` row — the
    long-tail dashboard collapse (every per-group breakdown wants it).
    One (group,key)-folded exchange bucketed on the group, rank +
    collapse vectorized inside the bucket. Output: (group..., key_col,
    n_rows)."""
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    group_cols = list(group_cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(group_cols + [key_col]).group_by(
            group_cols + [key_col]).aggregate([([], "count_all")])
        return g.rename_columns(group_cols + [key_col, "n_rows"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_cols + [key_col], {"n_rows": ("n_rows", "sum")},
        num_buckets=num_buckets, bucket_key=group_cols[0])

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group_cols + ["n_rows", key_col],
                            ascending=[True] * len(group_cols)
                            + [False, True], kind="mergesort")
        rank = df.groupby(group_cols, sort=False).cumcount()
        head = df[rank < n][group_cols + [key_col, "n_rows"]]
        tail = df[rank >= n]
        if len(tail):
            t = tail.groupby(group_cols, sort=False,
                             as_index=False)["n_rows"].sum()
            t[key_col] = other
            head = pd.concat([head, t[group_cols + [key_col, "n_rows"]]],
                             ignore_index=True)
        head["n_rows"] = head["n_rows"].astype("int64")
        return head

    return bucketed_map_groups(folded, group_cols[0], collapse,
                               num_buckets=num_buckets)


def topn_collapse_sql(*, table: str, group: str, key: str, n: int = 2,
                      other: str = "__other__") -> str:
    return f"""
        WITH c AS (
          SELECT {group}, {key}, count(*)::BIGINT AS n_rows
          FROM {table} GROUP BY 1, 2
        ),
        r AS (
          SELECT *, row_number() OVER (
              PARTITION BY {group} ORDER BY n_rows DESC, {key}) AS rn
          FROM c
        )
        SELECT {group},
               CASE WHEN rn <= {n} THEN {key} ELSE '{other}' END AS {key},
               sum(n_rows)::BIGINT AS n_rows
        FROM r GROUP BY 1, 2"""


def heavy_hitters(ds, *, col: str, k: int, num_buckets: int = 16,
                  materialize: bool = True):
    """EXACT φ=1/k heavy hitters — every value with global frequency
    strictly above ``N/k`` and its exact count — in two passes with
    bounded state; the full value vocabulary is NEVER folded (the win
    over a plain GROUP BY at 100 TB, where the distinct-value table
    itself can be petabyte-class while the answer is ≤ k-1 rows).

    Pass 1 (candidates): each batch keeps values with
    ``batch_count·k > batch_rows``. Any value with ``global_count·k > N``
    must clear that bar in at least one batch (if it missed in every
    batch, summing gives ``global·k ≤ N`` — the Misra-Gries union
    bound), so the batch-candidate union is a lossless superset. Each
    batch emits < k keys; the distinct fold is worker-fit for any
    realistic skew (bounded by ``k·n_blocks`` even adversarially).

    Pass 2 (verify): the sorted candidate array broadcasts via
    ``ray.put``; per-batch counts of candidate values only fold once,
    and the ``n·k > N`` filter finishes on the candidate-sized table.

    ``materialize=True`` (default) pins the input so the two passes and
    the row-count read execute upstream once; pass ``False`` to keep the
    input fully lazy at the price of re-executing it per pass.
    Output: ``(col, n)`` — exact counts, only true heavy hitters.
    """
    import pyarrow.compute as pc
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    if materialize:
        ds = ds.materialize()
    n_total = ds.count()

    def cands(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by(col).aggregate([([], "count_all")])
        keep = pc.greater(
            pc.multiply(g.column("count_all"), pa.scalar(k, type=pa.int64())),
            pa.scalar(len(batch), type=pa.int64()))
        return g.filter(keep).select([col])

    cand_tbl = bucketed_aggregate(
        ds.map_batches(cands, batch_format="pyarrow"),
        col, {"n_batches": (col, "size")}, num_buckets=num_buckets,
    ).to_pandas()
    cand = np.sort(cand_tbl[col].to_numpy())
    ref = ray.put(cand)

    def verify_partial(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        v = batch.column(col)
        sel = batch.filter(pc.is_in(v, value_set=pa.array(c, type=v.type)))
        g = sel.select([col]).group_by(col).aggregate([([], "count_all")])
        return g.rename_columns([col, "n"])

    folded = bucketed_aggregate(
        ds.map_batches(verify_partial, batch_format="pyarrow"),
        col, {"n": ("n", "sum")}, num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(t.column("n"), pa.scalar(k, type=pa.int64())),
            pa.scalar(n_total, type=pa.int64()))
        return t.filter(keep)

    return folded.map_batches(finish, batch_format="pyarrow")


def heavy_hitters_sql(*, table_expr: str, col: str, k: int) -> str:
    """SQL mirror: the plain full-vocabulary GROUP BY the engine avoids."""
    return f"""
        SELECT {col}, count(*)::BIGINT AS n
        FROM {table_expr} GROUP BY {col}
        HAVING count(*) * {k} > (SELECT count(*) FROM {table_expr})"""


def grouped_auc(ds, *, group_col: str, label_col: str, score_col: str,
                num_buckets: int = 16):
    """Exact ROC-AUC per group via the Mann-Whitney rank-sum identity —
    the supervised-eval primitive ("does this quality score actually
    separate the positives?") with the module's no-IEEE contract: with
    midranks doubled everything stays in integers,

        auc_ppm = (Σ_pos 2·midrank − n₁(n₁+1)) · 10⁶ // (2·n₁·n₀)

    (2·midrank of a tie block = first_rank + last_rank, so ties
    contribute the exact ½ the float formulation hand-waves). Groups
    missing either class are dropped by contract (AUC undefined).

    Scale shape: ranks are global per group, so this is ONE
    group-bucketed exchange; inside a bucket one lexsort ranks ALL
    groups at once (no per-group loop). Output
    ``(group_col, n_pos, n_neg, auc_ppm)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, score_col],
                            kind="mergesort", ignore_index=True)
        g = df.groupby(group_col, sort=False)
        pos_in_group = g.cumcount().to_numpy() + 1
        df["_r"] = pos_in_group
        tie = df.groupby([group_col, score_col], sort=False)["_r"]
        tworank = (tie.transform("min") + tie.transform("max")).to_numpy()
        lab = df[label_col].to_numpy().astype(np.int64)
        out = pd.DataFrame({
            group_col: df[group_col],
            "n_pos": lab,
            "n_neg": 1 - lab,
            "_s2": np.where(lab == 1, tworank, 0),
        }).groupby(group_col, sort=False, as_index=False).sum()
        out = out[(out["n_pos"] > 0) & (out["n_neg"] > 0)]
        n1 = out["n_pos"].astype(object)
        num = (out["_s2"].astype(object) - n1 * (n1 + 1)) * 1_000_000
        out["auc_ppm"] = (
            num // (2 * n1 * out["n_neg"].astype(object))
        ).astype("int64")
        out["n_pos"] = out["n_pos"].astype("int64")
        out["n_neg"] = out["n_neg"].astype("int64")
        return out.drop(columns=["_s2"])

    return bucketed_map_groups(ds, group_col, per_bucket,
                               num_buckets=num_buckets)


def grouped_auc_sql(*, table_expr: str, group: str, label: str,
                    score: str) -> str:
    """SQL mirror: ``2·midrank = 2·rank() + tie_count − 1`` (rank() is
    the tie block's min rank), HUGEINT finish."""
    return f"""
        WITH r AS (
          SELECT {group} AS g, {label} AS lab,
                 2 * rank() OVER (PARTITION BY {group} ORDER BY {score})
                   + count(*) OVER (PARTITION BY {group}, {score}) - 1
                   AS tworank
          FROM {table_expr}
        ),
        a AS (
          SELECT g, count(*) FILTER (WHERE lab = 1)::BIGINT AS n_pos,
                 count(*) FILTER (WHERE lab = 0)::BIGINT AS n_neg,
                 coalesce(sum(tworank) FILTER (WHERE lab = 1), 0)::HUGEINT
                     AS s2
          FROM r GROUP BY g
          HAVING n_pos > 0 AND n_neg > 0
        )
        SELECT g AS {group}, n_pos, n_neg,
               ((s2 - n_pos::HUGEINT * (n_pos + 1)) * 1000000
                // (2::HUGEINT * n_pos * n_neg))::BIGINT AS auc_ppm
        FROM a"""


# ---------------------------------------------------------------------------
# hashed categorical feature crosses (the tabular hashing trick)


def hash_cross(ds, *, id_col: str, cols, quadratic=(), dims: int = 256):
    """Hashed categorical features + interaction crosses (Vowpal Wabbit's
    ``-q`` / Weinberger et al. ICML'09 for TABULAR columns — the sibling
    of ``vocab.feature_hashing``): every column value hashes as the
    namespaced feature ``col=value`` and every requested pair ``(a, b)``
    as the cross ``a^b=va\\x1fvb``, each landing in
    ``dim = md5 % dims`` with the paper's unbiasing ±1 top-bit sign,
    summed per (id, dim).

    Fixed-width and vocabulary-free: no category table, no exchange at
    all — per-row features complete inside their batch (long output
    ``(id_col, dim, value)``, zero-sum collisions kept, same contract as
    ``feature_hashing``). ``id_col`` must be row-unique (one feature
    vector per row); repeated ids would emit per-batch partial sums. The namespace prefix keeps equal values in
    different columns distinct; the ``\\x1f`` separator keeps cross
    values unambiguous (a value containing ``=`` cannot forge another
    column's feature).
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    cols = list(cols)
    quadratic = [tuple(q) for q in quadratic]
    for a, b in quadratic:
        if a not in cols or b not in cols:
            raise ValueError(f"quadratic pair ({a}, {b}) not in cols")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for c in cols:
            feats.append(c + "=" + df[c].astype(str))
        for a, b in quadratic:
            feats.append(a + "^" + b + "=" + df[a].astype(str) + "\x1f"
                         + df[b].astype(str))
        ids = np.tile(df[id_col].to_numpy(), len(feats))
        flat = pd.concat(feats, ignore_index=True).to_numpy()
        uniq, inv = np.unique(flat, return_inverse=True)
        h = md5_hash64(uniq)
        dim = (h % np.uint64(dims)).astype(np.int64)[inv]
        sign = (1 - 2 * (h >> np.uint64(63)).astype(np.int64))[inv]
        out = pd.DataFrame({id_col: ids, "dim": dim, "value": sign})
        return (out.groupby([id_col, "dim"], sort=False, as_index=False)
                ["value"].sum())

    return ds.map_batches(fn, batch_format="pandas")


def hash_cross_sql(*, table: str, id_col: str, cols, quadratic=(),
                   dims: int = 256) -> str:
    """SQL replay: the identical namespaced feature strings through
    ``md5_number_upper``; one UNION ALL branch per feature."""
    branches = [
        f"SELECT {id_col}, md5_number_upper('{c}=' || {c}::VARCHAR) AS h"
        f" FROM {table}" for c in cols
    ] + [
        f"SELECT {id_col}, md5_number_upper('{a}^{b}=' || {a}::VARCHAR"
        f" || chr(31) || {b}::VARCHAR) AS h FROM {table}"
        for a, b in quadratic
    ]
    un = "\n          UNION ALL ".join(branches)
    return f"""
        WITH h AS (
          {un}
        )
        SELECT {id_col},
               (h % {dims})::BIGINT AS dim,
               sum(1 - 2 * (h >> 63)::BIGINT)::BIGINT AS value
        FROM h GROUP BY 1, 2"""


def grouped_emd(ds, *, group_col: str, value_col: str,
                num_buckets: int = 16):
    """Per-group 1-D earth-mover (Wasserstein-1) distance from the CORPUS
    distribution of an integer-valued column, in exact integer value·ppm —
    the distribution-drift diagnostic that complements the KL of
    ``source_divergence``: W1 is in the VALUE's own units (chars, tokens),
    is finite on disjoint supports, and weights drift by how FAR mass
    moved, not just that it moved.

    Closed form on ordered discrete support: ``W1 = Σ_i |F_g(v_i) −
    F(v_i)| · (v_{i+1} − v_i)``. Exactness contract: the CDF difference is
    kept as the integer ``|cum_g·N − cum_all·n_g|`` over the common
    denominator ``n_g·N``, so ``emd_ppm = (Σ terms · 10⁶) // (n_g · N)``
    is a single floor division in arbitrary precision (HUGEINT mirror).

    Scale shape: ONE (group, value) count fold — support is bounded like
    any distinct-value histogram — then the CDF walk runs on the driver
    over those |groups|·|support| rows only (Python ints: no overflow at
    any corpus size). Output ``(group_col, n_rows, emd_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key=value_col,
    ).to_pandas()

    support = np.sort(folded[value_col].unique())
    gap = np.diff(support.astype(np.int64))
    corpus = (folded.groupby(value_col)["c"].sum()
              .reindex(support, fill_value=0).to_numpy())
    cum_all = np.cumsum(corpus.astype(object))  # Python ints
    N = int(cum_all[-1]) if len(cum_all) else 0
    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        cg = (sub.set_index(value_col)["c"]
              .reindex(support, fill_value=0).to_numpy())
        cum_g = np.cumsum(cg.astype(object))
        n_g = int(cum_g[-1])
        terms = sum(
            abs(int(cum_g[i]) * N - int(cum_all[i]) * n_g) * int(gap[i])
            for i in range(len(gap)))
        emd = terms * 1_000_000 // max(n_g * N, 1)
        rows.append((grp, n_g, int(emd)))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "emd_ppm"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["emd_ppm"] = out["emd_ppm"].astype("int64")
    return ray.data.from_pandas(out)


def grouped_emd_sql(*, table: str, group: str, value_expr: str) -> str:
    """SQL mirror: grid = groups × support, window cumsums, the identical
    cross-multiplied integer terms in HUGEINT."""
    return f"""
        WITH g AS (
          SELECT {group} AS grp, {value_expr} AS v, count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        support AS (
          SELECT v, lead(v) OVER (ORDER BY v) AS nxt
          FROM (SELECT DISTINCT v FROM g)
        ),
        tot AS (SELECT grp, sum(c)::BIGINT AS n_g FROM g GROUP BY 1),
        big AS (SELECT sum(c)::BIGINT AS n FROM g),
        ca AS (
          SELECT s.v, s.nxt,
                 sum(coalesce(cc.c, 0)) OVER (ORDER BY s.v)::BIGINT
                     AS cum_all
          FROM support s LEFT JOIN (
            SELECT v, sum(c)::BIGINT AS c FROM g GROUP BY 1) cc
          USING (v)
        ),
        cg AS (
          SELECT t.grp, s.v,
                 sum(coalesce(g.c, 0)) OVER (
                   PARTITION BY t.grp ORDER BY s.v)::BIGINT AS cum_g
          FROM tot t CROSS JOIN support s
          LEFT JOIN g ON g.grp = t.grp AND g.v = s.v
        )
        SELECT cg.grp AS {group}, t.n_g AS n_rows,
               (sum(abs(cg.cum_g::HUGEINT * big.n
                        - ca.cum_all::HUGEINT * t.n_g)
                    * coalesce(ca.nxt - ca.v, 0)) * 1000000
                // greatest(t.n_g::HUGEINT * big.n, 1))::BIGINT AS emd_ppm
        FROM cg
        JOIN ca USING (v) JOIN tot t ON t.grp = cg.grp, big
        GROUP BY cg.grp, t.n_g, big.n
        ORDER BY 1"""


def k_anonymity(ds, *, qi_cols, sensitive_col: str, k: int = 5,
                l_div: int = 2, num_buckets: int = 32):
    """Privacy audit: quasi-identifier groups violating k-anonymity
    (Sweeney, IJUFKS 2002) or distinct-l-diversity (Machanavajjhala et
    al., ICDE 2006) — the release gate a training corpus runs before
    shipping event/interaction data, because a (type, day, amount-band)
    tuple with <k rows re-identifies its subject and a group whose rows
    all belong to ONE subject leaks the sensitive attribute even when
    the group is large.

    Output: one row per VIOLATING group — ``qi_cols + (group_size,
    n_sensitive)`` where ``group_size < k OR n_sensitive < l_div``
    (``n_sensitive`` = exact distinct count of ``sensitive_col``).
    Violations-only keeps the result audit-sized at corpus scale; the
    compliant mass never leaves the fold.

    Scale shape: per-batch Arrow ``group_by(qi+sensitive).count`` collapses
    the event stream to distinct (QI, subject) partials before the ONE
    exchange, which is keyed on a composite QI string (hash spread comes
    from the full tuple — bucketing on a low-cardinality component like
    event_type alone would skew). Both folds (finish the distinct, then
    count subjects per group) run co-partitioned inside the same bucket
    pass, so distinctness is exact with a single shuffle.
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    qi = list(qi_cols)
    key_col = "_qi"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(qi + [sensitive_col]).group_by(
            qi + [sensitive_col]).aggregate([([], "count_all")])
        g = g.rename_columns(qi + [sensitive_col, "n"])
        key = pc.cast(g.column(qi[0]), pa.string())
        for c in qi[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(g.column(c), pa.string()), "\x1f")
        return g.append_column(key_col, key)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.groupby([key_col] + qi + [sensitive_col], sort=False,
                        as_index=False, observed=True)["n"].sum())
        g = (d.groupby([key_col] + qi, sort=False, as_index=False,
                       observed=True)
             .agg(group_size=("n", "sum"), n_sensitive=("n", "size")))
        bad = g[(g["group_size"] < k) | (g["n_sensitive"] < l_div)]
        return bad.drop(columns=[key_col]).reset_index(drop=True)

    return bucketed_map_groups(partials, key_col, fold,
                               num_buckets=num_buckets)


def k_anonymity_sql(*, table_expr: str, qi_exprs, sensitive: str,
                    k: int = 5, l_div: int = 2) -> str:
    """SQL mirror: plain GROUP BY over the same derived QI expressions with
    count(*) / count(DISTINCT sensitive), filtered to violations."""
    sel = ", ".join(f"{e} AS {n}" for n, e in qi_exprs)
    names = ", ".join(n for n, _ in qi_exprs)
    return f"""
        WITH base AS (
          SELECT {sel}, {sensitive} AS s FROM {table_expr}
        )
        SELECT {names}, count(*)::BIGINT AS group_size,
               count(DISTINCT s)::BIGINT AS n_sensitive
        FROM base GROUP BY {names}
        HAVING count(*) < {k} OR count(DISTINCT s) < {l_div}"""


def l_diversity(ds, *, qi_cols, sensitive_col: str, l: int = 4,
                num_buckets: int = 32):
    """Entropy l-diversity audit (Machanavajjhala et al., ICDE 2006
    §3.2) — the third leg of the privacy trio: :func:`k_anonymity`
    catches SMALL groups and one-subject groups, :func:`t_closeness`
    catches groups whose sensitive DISTRIBUTION drifts from the
    corpus, and entropy-l catches the case both miss — a LARGE group
    with several distinct subjects where one subject still dominates
    the mass (20 rows, 3 users, but 18 rows belong to one user: a
    90% re-identification guess passes distinct-l yet fails
    entropy-l).

    Condition: H(S | group) ≥ log₂(l), evaluated in the module's
    log-free half-bit identity (the :func:`token_entropy` contract):

        entropy_half_bits = Σ_s c_s · (bitlen(n²) − bitlen(c_s²))
        violation  ⇔  entropy_half_bits < n · (bitlen(l²) − 1)

    ``l`` must be a POWER OF TWO so the threshold 2·log₂(l) half-bits
    is exact in integers (asserted); n² bounds group size at ~3·10⁹
    rows (documented, both sides).

    Output: one row per VIOLATING group — ``qi_cols + (group_size,
    n_sensitive, entropy_half_bits)`` — violations-only keeps the
    result audit-sized (the k_anonymity posture).

    Scale shape (k_anonymity's): per-batch Arrow distinct
    (QI, subject) count partials, ONE exchange keyed on the composite
    QI string, entropy + filter inside the bucket pass."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    if l < 2 or (l & (l - 1)) != 0:
        raise ValueError("l must be a power of two >= 2 (exact "
                         "half-bit threshold contract)")
    thr_hb = 2 * (l.bit_length() - 1)  # = bitlen(l^2) - 1
    qi = list(qi_cols)
    key_col = "_qi"

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(qi + [sensitive_col]).group_by(
            qi + [sensitive_col]).aggregate([([], "count_all")])
        g = g.rename_columns(qi + [sensitive_col, "n"])
        key = pc.cast(g.column(qi[0]), pa.string())
        for c in qi[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(g.column(c), pa.string()), "\x1f")
        return g.append_column(key_col, key)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = (df.groupby([key_col] + qi + [sensitive_col], sort=False,
                        as_index=False, observed=True)["n"].sum())
        sizes = (d.groupby(key_col, sort=False, observed=True)["n"]
                 .transform("sum").to_numpy().astype(np.int64))
        c = d["n"].to_numpy().astype(np.int64)
        term = c * ((_ilog2(sizes * sizes) + 1) - (_ilog2(c * c) + 1))
        d = d.assign(_term=term)
        g = (d.groupby([key_col] + qi, sort=False, as_index=False,
                       observed=True)
             .agg(group_size=("n", "sum"), n_sensitive=("n", "size"),
                  entropy_half_bits=("_term", "sum")))
        bad = g[g["entropy_half_bits"] < g["group_size"] * thr_hb]
        return bad.drop(columns=[key_col]).reset_index(drop=True)

    return bucketed_map_groups(partials, key_col, fold,
                               num_buckets=num_buckets)


def l_diversity_sql(*, table_expr: str, qi_exprs, sensitive: str,
                    l: int = 4) -> str:
    """SQL mirror: (QI, subject) counts, the identical bit-length
    half-bit entropy, HAVING on the exact threshold."""
    assert l >= 2 and (l & (l - 1)) == 0
    thr_hb = 2 * (l.bit_length() - 1)
    sel = ", ".join(f"{e} AS {n}" for n, e in qi_exprs)
    names = ", ".join(n for n, _ in qi_exprs)
    return f"""
        WITH base AS (
          SELECT {sel}, {sensitive} AS s FROM {table_expr}
        ),
        sc AS (
          SELECT {names}, s, count(*)::BIGINT AS c
          FROM base GROUP BY {names}, s
        ),
        gs AS (
          SELECT {names}, sum(c)::BIGINT AS n
          FROM sc GROUP BY {names}
        )
        SELECT sc.{names.replace(", ", ", sc.")},
               max(gs.n)::BIGINT AS group_size,
               count(*)::BIGINT AS n_sensitive,
               sum(sc.c * (length(format('{{:b}}', gs.n * gs.n))
                           - length(format('{{:b}}', sc.c * sc.c))))
                   ::BIGINT AS entropy_half_bits
        FROM sc JOIN gs USING ({names})
        GROUP BY sc.{names.replace(", ", ", sc.")}
        HAVING sum(sc.c * (length(format('{{:b}}', gs.n * gs.n))
                           - length(format('{{:b}}', sc.c * sc.c))))
               < max(gs.n) * {thr_hb}"""


# first-significant-digit probabilities log10(1 + 1/d) in floor ppm —
# LITERAL on both engine and SQL sides (libm log10 may differ by an ulp
# across engines, so the contract is this table, not a runtime log)
BENFORD_PPM = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}


def benford_audit(ds, *, group_col: str, value_col: str,
                  num_buckets: int = 16):
    """Benford first-digit conformance per group (Benford 1938; Nigrini's
    forensic-accounting screen): naturally-occurring multiplicative
    quantities put digit d first with probability log10(1+1/d), so a
    group whose leading-digit histogram deviates hard is machine-generated,
    capped, or tampered — the cheap authenticity screen a pipeline runs
    over transaction values and scraped numeric fields before trusting
    them as training signal.

    Input contract: ``value_col`` is a positive int64 (quantize floats to
    cents first — engine-wide convention); zero/negative rows are excluded
    (they have no leading significant digit). Output: the full 9-digit
    grid per group — ``(group, digit, n, obs_ppm, benford_ppm)`` with
    ``obs_ppm = n·10⁶ // n_group`` exact and absent digits present with
    n=0 (an auditor needs the zero rows; silently missing digits ARE the
    signal). Deviation is left to the consumer (obs−benford is a derived
    column) to keep the relation minimal.

    Scale shape: the first digit is integer-exact via ≤19 vectorized
    ``//=10`` halvings (no float log10 — exact at every power-of-10
    boundary), per-batch (group, digit) counts collapse the stream
    map-side, one tiny fold of ≤ |groups|·9 rows, and the zero-fill grid
    finish runs on the driver over that audit-sized table only
    (``grouped_emd`` posture: group_col is a bounded audit dimension).
    """
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        g = batch.column(group_col)
        pos = v > 0
        d = v[pos].copy()
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        t = pa.table({group_col: g.filter(pa.array(pos)),
                      "digit": pa.array(d)})
        c = t.group_by([group_col, "digit"]).aggregate([([], "count_all")])
        return c.rename_columns([group_col, "digit", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "digit"], {"n": ("n", "sum")},
        num_buckets=num_buckets, bucket_key="digit",
    ).to_pandas()

    grid = []
    for grp, sub in folded.groupby(group_col, sort=True):
        total = int(sub["n"].sum())
        by_d = sub.set_index("digit")["n"]
        for digit in range(1, 10):
            n = int(by_d.get(digit, 0))
            grid.append((grp, digit, n, n * 1_000_000 // total,
                         BENFORD_PPM[digit]))
    out = pd.DataFrame(
        grid, columns=[group_col, "digit", "n", "obs_ppm", "benford_ppm"])
    for c in ("digit", "n", "obs_ppm", "benford_ppm"):
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def benford_audit_sql(*, table_expr: str, group: str,
                      value_expr: str) -> str:
    """SQL mirror: leading digit via VARCHAR substr (exact for positive
    BIGINT), the identical literal ppm table, LEFT-JOINed 9-digit grid."""
    bf = ", ".join(f"({d}, {p})" for d, p in BENFORD_PPM.items())
    return f"""
        WITH v AS (
          SELECT {group} AS g, {value_expr} AS n
          FROM {table_expr} WHERE {value_expr} > 0
        ),
        d AS (
          SELECT g, CAST(substr(CAST(n AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit,
                 count(*)::BIGINT AS n
          FROM v GROUP BY 1, 2
        ),
        tot AS (SELECT g, sum(n)::BIGINT AS t FROM d GROUP BY 1),
        bf(digit, benford_ppm) AS (VALUES {bf})
        SELECT tot.g AS {group}, bf.digit::BIGINT AS digit,
               coalesce(d.n, 0)::BIGINT AS n,
               (coalesce(d.n, 0) * 1000000 // tot.t)::BIGINT AS obs_ppm,
               bf.benford_ppm::BIGINT AS benford_ppm
        FROM tot CROSS JOIN bf
        LEFT JOIN d ON d.g = tot.g AND d.digit = bf.digit"""


def cohens_kappa(ds, *, pred_col: str, true_col: str,
                 num_buckets: int = 8):
    """Chance-corrected agreement between two categorical columns —
    Cohen's kappa (Cohen 1960) in exact integer ppm: the label-QA metric
    for silver-vs-gold comparisons (a heuristic language-ID against the
    stored label, two annotation runs, a classifier against ground
    truth), where raw accuracy flatters any skewed label distribution
    and kappa subtracts the agreement chance would produce.

    ``κ = (po − pe)/(1 − pe)`` over common denominator N²:
    ``kappa_ppm = (N·A − S)·10⁶ / (N² − S)`` with ``A`` the agreeing
    rows and ``S = Σ_k rowmarg_k·colmarg_k``. Exactness contract: the
    division is evaluated as ``(num + D)·10⁶ // D − 10⁶`` after clamping
    ``num`` at ``−D`` — the shift makes the dividend nonnegative so
    Python floor and DuckDB's truncating ``//`` agree (similarity.py
    SHIFT convention), and the clamp bounds the fixed-point domain at
    κ = −1 (κ < −1 exists only in the pe > ½ adversarial regime and
    reads "total disagreement" either way). Degenerate D = 0 (both
    marginals a point mass on the same label) reports 0 via the
    max(D, 1) guard, documented rather than NULL.

    Scale shape: per-batch (pred, true) confusion counts collapse the
    stream map-side, one fold of ≤ L² rows, exact Python-int kappa on
    the driver (N² overflows int64 at 10¹⁰ rows — driver ints and the
    SQL mirror's HUGEINT both carry it). Output one row:
    ``(n, n_agree, kappa_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.select([pred_col, true_col]).group_by(
            [pred_col, true_col]).aggregate([([], "count_all")])
        return c.rename_columns([pred_col, true_col, "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [pred_col, true_col], {"n": ("n", "sum")},
        num_buckets=num_buckets, bucket_key=pred_col,
    ).to_pandas()

    n_total = int(folded["n"].sum())
    agree = int(folded.loc[folded[pred_col] == folded[true_col], "n"].sum())
    rowm = folded.groupby(pred_col)["n"].sum()
    colm = folded.groupby(true_col)["n"].sum()
    s = sum(int(rowm[k]) * int(colm[k]) for k in rowm.index
            if k in colm.index)
    d = max(n_total * n_total - s, 1)
    num = max(n_total * agree - s, -d)
    kappa = (num + d) * 1_000_000 // d - 1_000_000
    out = pd.DataFrame({"n": [n_total], "n_agree": [agree],
                        "kappa_ppm": [kappa]})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def cohens_kappa_sql(*, table_expr: str, pred: str, true: str) -> str:
    """SQL mirror: confusion CTE, HUGEINT marginal product, identical
    shift-clamp fixed-point division."""
    return f"""
        WITH c AS (
          SELECT {pred} AS p, {true} AS t, count(*)::BIGINT AS n
          FROM {table_expr} GROUP BY 1, 2
        ),
        tot AS (SELECT sum(n)::HUGEINT AS n FROM c),
        ag AS (
          SELECT coalesce(sum(n), 0)::HUGEINT AS a FROM c WHERE p = t
        ),
        marg AS (
          SELECT coalesce(sum(pm.r * tm.cc), 0)::HUGEINT AS s
          FROM (SELECT p AS k, sum(n)::HUGEINT AS r FROM c GROUP BY 1) pm
          JOIN (SELECT t AS k, sum(n)::HUGEINT AS cc FROM c GROUP BY 1) tm
          USING (k)
        ),
        dd AS (
          SELECT greatest(tot.n * tot.n - marg.s, 1) AS d,
                 greatest(tot.n * ag.a - marg.s,
                          -(tot.n * tot.n - marg.s)) AS num,
                 tot.n AS n, ag.a AS a
          FROM tot, ag, marg
        )
        SELECT n::BIGINT AS n, a::BIGINT AS n_agree,
               ((num + d) * 1000000 // d - 1000000)::BIGINT AS kappa_ppm
        FROM dd"""


def fleiss_kappa(ds, *, cols, num_buckets: int = 8):
    """Multi-rater chance-corrected agreement — Fleiss' kappa (Fleiss
    1971) over k categorical RATER COLUMNS on the same rows, in exact
    integer ppm: the k-annotator generalization of :func:`cohens_kappa`
    (k = 2 is equivalent up to Fleiss' marginal convention), and the
    labeled-data-QA omnibus next to :func:`cochrans_q` (Q asks "do the
    raters differ in marginal rate"; kappa asks "do they agree per
    item beyond chance").

    Integer form over cleared denominators: with n = k raters, N rows,
    ``pairs = Σ_i Σ_j n_ij²`` (ordered agreeing rater pairs incl. self —
    computed VECTORIZED as Σ over the k² column-pair equality masks, no
    per-row category counting), ``c_j`` the per-category totals:

        A = pairs − N·n          B = N·n·(n−1)
        C = Σ_j c_j²             D = (N·n)²
        κ = (A·D − C·B) / (B·(D − C))

    ``kappa_ppm`` uses the SHIFT convention ((num+den)·10⁶ // den −10⁶
    after clamping num ≥ −den) so Python floor and DuckDB's truncating
    ``//`` agree on negative κ; D = C (every assignment one category)
    reports 0 by contract. ``pbar_ppm = A·10⁶ // B`` and ``pe_ppm =
    C·10⁶ // D`` ride along (both nonnegative). A·D overflows HUGEINT
    past ~10¹² rows — the documented mirror bound.

    Categories are tracked by ``str(value)`` identity — rater columns
    must share a type whose string form is canonical (ints/strings).

    Scale shape: stateless per-batch partials (one scalar pair-count +
    per-category counts), ONE tiny fold keyed on the sentinel/category
    term, Python-int finish. Output one row: ``(n_rows, n_raters,
    n_categories, pbar_ppm, pe_ppm, kappa_ppm)``."""
    import ray.data
    from ray.data.aggregate import Sum

    cols = list(cols)
    k = len(cols)
    if k < 2:
        raise ValueError("fleiss_kappa needs >= 2 rater columns")

    def partial(batch: pa.Table) -> pa.Table:
        mats = [batch.column(c).to_numpy(zero_copy_only=False)
                for c in cols]
        pairs = 0
        for a in range(k):
            for b in range(k):
                pairs += int((mats[a] == mats[b]).sum())
        terms = ["\x00P", "\x00N"]
        vals = [pairs, len(batch)]
        for m in mats:
            u, c = np.unique(m.astype(str), return_counts=True)
            for uv, cv in zip(u, c):
                terms.append(f"c|{uv}")
                vals.append(int(cv))
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "v": pa.array(vals, type=pa.int64()),
        })

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    sv = dict(zip(stats["term"], stats["v"].map(int)))
    pairs = sv.pop("\x00P", 0)
    n_rows = sv.pop("\x00N", 0)
    cj = list(sv.values())  # per-category totals
    a_ = pairs - n_rows * k
    b_ = n_rows * k * (k - 1)
    c_ = sum(x * x for x in cj)
    d_ = (n_rows * k) ** 2
    pbar = a_ * 1_000_000 // b_ if b_ else 0
    pe = c_ * 1_000_000 // d_ if d_ else 0
    den = b_ * (d_ - c_)
    num = a_ * d_ - c_ * b_
    if den > 0:
        num = max(num, -den)
        kappa = (num + den) * 1_000_000 // den - 1_000_000
    else:
        kappa = 0
    out = pd.DataFrame({
        "n_rows": [n_rows], "n_raters": [k],
        "n_categories": [len(cj)],
        "pbar_ppm": [pbar], "pe_ppm": [pe], "kappa_ppm": [kappa],
    }).astype("int64")
    return ray.data.from_pandas(out)


def fleiss_kappa_sql(*, rows_expr: str, cols) -> str:
    """SQL mirror: unpivot the k rater columns over a row_number rid,
    per-(rid, category) counts, the identical cleared-denominator
    HUGEINT algebra with the shift-clamp fixed-point division."""
    cols = list(cols)
    k = len(cols)
    long = " UNION ALL ".join(
        f"SELECT rid, {c}::VARCHAR AS v FROM r" for c in cols)
    return f"""
        WITH p AS ({rows_expr}),
        r AS (SELECT row_number() OVER () AS rid, * FROM p),
        long AS ({long}),
        cnt AS (
          SELECT rid, v, count(*)::HUGEINT AS c
          FROM long GROUP BY 1, 2
        ),
        sc AS (
          SELECT coalesce(sum(c * c), 0)::HUGEINT AS pairs FROM cnt
        ),
        nn AS (SELECT count(*)::HUGEINT AS n FROM p),
        cj AS (SELECT v, sum(c)::HUGEINT AS cj FROM cnt GROUP BY 1),
        cs AS (
          SELECT coalesce(sum(cj * cj), 0)::HUGEINT AS c2,
                 count(*)::BIGINT AS ncat
          FROM cj
        ),
        alg AS (
          SELECT nn.n AS n, cs.ncat,
                 (sc.pairs - nn.n * {k}) AS a,
                 (nn.n * {k} * {k - 1}) AS b,
                 cs.c2 AS c,
                 (nn.n * {k}) * (nn.n * {k}) AS d
          FROM nn, sc, cs
        )
        SELECT n::BIGINT AS n_rows, {k}::BIGINT AS n_raters,
               ncat AS n_categories,
               CASE WHEN b > 0 THEN (a * 1000000 // b)::BIGINT
                    ELSE 0 END AS pbar_ppm,
               CASE WHEN d > 0 THEN (c * 1000000 // d)::BIGINT
                    ELSE 0 END AS pe_ppm,
               CASE WHEN b * (d - c) > 0 THEN
                 ((greatest(a * d - c * b, -(b * (d - c)))
                   + b * (d - c)) * 1000000
                  // (b * (d - c)) - 1000000)::BIGINT
               ELSE 0 END AS kappa_ppm
        FROM alg"""


def grouped_ks(ds, *, group_col: str, value_col: str,
               num_buckets: int = 16):
    """Per-group two-sample Kolmogorov–Smirnov statistic against the REST
    of the corpus, in exact integer ppm — the sup-norm drift metric next
    to :func:`grouped_emd`'s W1: KS answers "is there ANY threshold at
    which this group's value distribution separates from everyone
    else's" (it IS the optimal single-threshold separability), which is
    the question a filter-tuning pass actually asks, while W1 weighs how
    far mass moved. Group-vs-REST (not group-vs-corpus) because the
    corpus contains the group: a dominant group compared against a
    mixture of itself reads artificially calm.

    ``KS = max_v |F_g(v) − F_rest(v)|`` evaluated exactly over the
    common denominator ``n_g·(N−n_g)``:
    ``ks_ppm = max_v |cum_g·(N−n_g) − (cum_all−cum_g)·n_g| · 10⁶
    // (n_g·(N−n_g))``, one floor division after the integer max.
    A group that IS the whole corpus reports 0 via the max(·,1)
    denominator guard (documented; there is no "rest" to drift from).

    Scale shape (grouped_emd posture): ONE (group, value) count fold —
    bounded-cardinality support contract — then the CDF walk on the
    driver over |groups|·|support| rows in Python ints (cum·N overflows
    int64 at 10¹⁰ rows; HUGEINT mirror). Output
    ``(group_col, n_rows, ks_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key=value_col,
    ).to_pandas()

    support = np.sort(folded[value_col].unique())
    corpus = (folded.groupby(value_col)["c"].sum()
              .reindex(support, fill_value=0).to_numpy())
    cum_all = np.cumsum(corpus.astype(object))
    n_total = int(cum_all[-1]) if len(cum_all) else 0
    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        cg = (sub.set_index(value_col)["c"]
              .reindex(support, fill_value=0).to_numpy())
        cum_g = np.cumsum(cg.astype(object))
        n_g = int(cum_g[-1])
        n_rest = n_total - n_g
        num = max(
            (abs(int(cum_g[i]) * n_rest
                 - (int(cum_all[i]) - int(cum_g[i])) * n_g)
             for i in range(len(support))),
            default=0,
        )
        ks = num * 1_000_000 // max(n_g * n_rest, 1)
        rows.append((grp, n_g, int(ks)))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "ks_ppm"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["ks_ppm"] = out["ks_ppm"].astype("int64")
    return ray.data.from_pandas(out)


def grouped_ks_sql(*, table: str, group: str, value_expr: str) -> str:
    """SQL mirror: groups × support grid, window cumsums, HUGEINT
    cross-multiplied sup."""
    return f"""
        WITH g AS (
          SELECT {group} AS grp, {value_expr} AS v, count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        support AS (SELECT DISTINCT v FROM g),
        tot AS (SELECT grp, sum(c)::BIGINT AS n_g FROM g GROUP BY 1),
        big AS (SELECT sum(c)::BIGINT AS n FROM g),
        ca AS (
          SELECT s.v,
                 sum(coalesce(cc.c, 0)) OVER (ORDER BY s.v)::HUGEINT
                     AS cum_all
          FROM support s LEFT JOIN (
            SELECT v, sum(c)::BIGINT AS c FROM g GROUP BY 1) cc
          USING (v)
        ),
        cg AS (
          SELECT t.grp, s.v, t.n_g,
                 sum(coalesce(g.c, 0)) OVER (
                   PARTITION BY t.grp ORDER BY s.v)::HUGEINT AS cum_g
          FROM tot t CROSS JOIN support s
          LEFT JOIN g ON g.grp = t.grp AND g.v = s.v
        )
        SELECT cg.grp AS {group}, cg.n_g AS n_rows,
               (max(abs(cg.cum_g * (big.n - cg.n_g)
                        - (ca.cum_all - cg.cum_g) * cg.n_g)) * 1000000
                // greatest(cg.n_g::HUGEINT * (big.n - cg.n_g), 1)
               )::BIGINT AS ks_ppm
        FROM cg JOIN ca USING (v), big
        GROUP BY cg.grp, cg.n_g, big.n
        ORDER BY 1"""


def kendall_tau(ds, *, group_col: str, x_col: str, y_col: str,
                qx: int = 1, qy: int = 1, num_buckets: int = 16):
    """Per-group Kendall rank agreement between two integer features, in
    exact integer ppm — the ORDER-based dependence check next to the
    moment-based correlation ops: Pearson-style products answer "do x and
    y move together linearly", Kendall answers "does ranking by x agree
    with ranking by y at all", which is the question a feature-selection
    or proxy-metric pass actually asks (is cheap feature x a usable stand-
    in for expensive feature y), and it is immune to outliers and any
    monotone rescaling of either axis.

    Contract: computed on the QUANTIZED pair ``(x//qx, y//qy)`` — the
    quantizers are part of the metric (they bound the support like
    grouped_emd's value grid) — in the tau-a form over all ``n0 =
    m(m−1)/2`` pairs, ties counting against agreement (a tie is "no
    evidence of agreement", the conservative read for a proxy check):
    ``tau_ppm = (C − D)·10⁶ / n0`` with C/D the concordant/discordant
    pair mass. Division follows the engine-wide signed-floor convention
    (shift by +n0 then subtract 10⁶ — numerator ≥ 0, so Python floor ==
    DuckDB truncation). Groups with m < 2 report 0 by contract.

    Scale shape (grouped_emd posture): per-batch (group, xq, yq) Arrow
    count partials, ONE bounded-grid fold, then the exact pair count on
    the driver — dominance sums via one int64 mask-matmul per group
    (dom_j ≤ m), and the final Σ c_j·dom_j in Python ints since pair
    counts pass int64 at 10¹⁰ rows; HUGEINT carries the SQL mirror's
    cells×cells self-join."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.int64())
        y = batch.column(y_col).cast(pa.int64())
        tb = pa.table({
            group_col: batch.column(group_col),
            "xq": pa.compute.divide(x, qx).cast(pa.int64()),
            "yq": pa.compute.divide(y, qy).cast(pa.int64()),
        })
        g = tb.group_by([group_col, "xq", "yq"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "xq", "yq", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "xq", "yq"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="xq",
    ).to_pandas()

    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        x = sub["xq"].to_numpy()
        y = sub["yq"].to_numpy()
        c = sub["c"].to_numpy()
        m = int(c.sum())
        n0 = m * (m - 1) // 2
        if n0 == 0:
            rows.append((grp, m, 0))
            continue
        gt_x = x[None, :] > x[:, None]
        dom_c = (gt_x & (y[None, :] > y[:, None]))
        dom_d = (gt_x & (y[None, :] < y[:, None]))
        # dom vectors stay in int64 (each entry <= m); the quadratic form
        # finishes in Python ints
        cc = sum(int(a) * int(b)
                 for a, b in zip(c, dom_c.astype(np.int64).T @ c))
        dd = sum(int(a) * int(b)
                 for a, b in zip(c, dom_d.astype(np.int64).T @ c))
        tau = (cc - dd + n0) * 1_000_000 // n0 - 1_000_000
        rows.append((grp, m, int(tau)))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "tau_ppm"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["tau_ppm"] = out["tau_ppm"].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def kendall_tau_sql(*, src_sql: str, group: str, x_expr: str, y_expr: str,
                    qx: int = 1, qy: int = 1) -> str:
    """SQL mirror: quantized cell fold, cells×cells self-join with strict
    dominance filters (each unordered pair counted once — only one
    ordering has x strictly increasing), HUGEINT shift-division."""
    return f"""
        WITH src AS ({src_sql}),
        cells AS (
          SELECT {group} AS grp, ({x_expr}) // {qx} AS xq,
                 ({y_expr}) // {qy} AS yq, count(*)::BIGINT AS c
          FROM src GROUP BY 1, 2, 3
        ),
        mm AS (SELECT grp, sum(c)::BIGINT AS m FROM cells GROUP BY 1),
        pairs AS (
          SELECT a.grp,
                 coalesce(sum(a.c::HUGEINT * b.c) FILTER (
                   WHERE b.xq > a.xq AND b.yq > a.yq), 0) AS cc,
                 coalesce(sum(a.c::HUGEINT * b.c) FILTER (
                   WHERE b.xq > a.xq AND b.yq < a.yq), 0) AS dd
          FROM cells a JOIN cells b ON a.grp = b.grp
          GROUP BY 1
        )
        SELECT mm.grp AS {group}, mm.m AS n_rows,
               CASE WHEN mm.m < 2 THEN 0 ELSE (
                 (pairs.cc - pairs.dd
                  + mm.m::HUGEINT * (mm.m - 1) // 2) * 1000000
                 // (mm.m::HUGEINT * (mm.m - 1) // 2) - 1000000
               )::BIGINT END AS tau_ppm
        FROM mm JOIN pairs USING (grp)
        ORDER BY 1"""


def spearman_rho(ds, *, group_col: str, x_col: str, y_col: str,
                 qx: int = 1, qy: int = 1, num_buckets: int = 16):
    """Per-group Spearman rank correlation between two integer features,
    as SIGNED rho² in exact integer ppm — the rank-based L2 companion to
    :func:`kendall_tau`: tau counts pair-order agreements (robust,
    O(cells²) to evaluate), Spearman is Pearson on the rank transform —
    it weights HOW FAR apart the disagreeing ranks are, so a feature
    that is monotone except for a few far-flung outlier rows scores
    visibly lower than one with many tiny local swaps, which is the
    distinction a proxy-metric audit wants when choosing between two
    cheap stand-ins with similar tau. Spearman's exact value needs a
    square root (the variance product), so the engine reports the
    square with the sign re-attached — the :func:`cramers_v` precedent
    (V² ppm), losslessly invertible for ranking/thresholding:

        rho2_ppm = sign(Sc) · Sc²·10⁶ // (Vx · Vy)   ∈ [−10⁶, 10⁶]

    with ``Sc = m·Σrₓr_y − Σrₓ·Σr_y`` and ``Vx, Vy`` the same-form rank
    variances, over ties-averaged ranks kept integer by DOUBLING
    (``r = 2·(#strictly smaller) + (#equal) + 1`` — twice the textbook
    average rank; rho is affine-invariant so the doubling cancels).
    Truncation toward zero on a nonnegative quotient, so Python ``//``
    of the squared terms == the mirror's CASE-signed HUGEINT division.
    Computed on the QUANTIZED pair ``(x//qx, y//qy)`` (the kendall_tau
    grid contract). Groups with zero rank variance on either axis (all
    x tied, or m < 2) report 0 by contract.

    Scale shape (kendall_tau posture): per-batch (group, xq, yq) Arrow
    count partials, ONE bounded-grid fold, exact rank math per group on
    the driver in Python ints (rank sums pass int64 at m⁴; the mirror's
    HUGEINT bounds per-group rows at ~3·10⁴ — the engine itself is
    unbounded). Output ``(group, n_rows, rho2_ppm)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).cast(pa.int64())
        y = batch.column(y_col).cast(pa.int64())
        tb = pa.table({
            group_col: batch.column(group_col),
            "xq": pa.compute.divide(x, qx).cast(pa.int64()),
            "yq": pa.compute.divide(y, qy).cast(pa.int64()),
        })
        g = tb.group_by([group_col, "xq", "yq"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "xq", "yq", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "xq", "yq"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="xq",
    ).to_pandas()

    def ranks2(vals: np.ndarray, cnts: np.ndarray) -> dict[int, int]:
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], cnts[order]
        before = np.concatenate(([0], np.cumsum(c)[:-1]))
        return {int(vv): int(2 * b + cc + 1)
                for vv, b, cc in zip(v, before, c)}

    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        xs = sub["xq"].to_numpy()
        ys = sub["yq"].to_numpy()
        cs = sub["c"].to_numpy()
        m = int(cs.sum())
        # per-axis doubled average ranks over the group's distinct values
        xd = pd.DataFrame({"v": xs, "c": cs}).groupby("v")["c"].sum()
        yd = pd.DataFrame({"v": ys, "c": cs}).groupby("v")["c"].sum()
        rx_map = ranks2(xd.index.to_numpy(), xd.to_numpy())
        ry_map = ranks2(yd.index.to_numpy(), yd.to_numpy())
        sx = sy = sxx = syy = sxy = 0
        for xv, yv, cc in zip(xs, ys, cs):
            rx, ry, cc = rx_map[int(xv)], ry_map[int(yv)], int(cc)
            sx += cc * rx
            sy += cc * ry
            sxx += cc * rx * rx
            syy += cc * ry * ry
            sxy += cc * rx * ry
        sc = m * sxy - sx * sy
        vx = m * sxx - sx * sx
        vy = m * syy - sy * sy
        if m < 2 or vx == 0 or vy == 0:
            rows.append((grp, m, 0))
            continue
        mag = sc * sc * 1_000_000 // (vx * vy)
        rows.append((grp, m, mag if sc >= 0 else -mag))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "rho2_ppm"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["rho2_ppm"] = out["rho2_ppm"].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def spearman_rho_sql(*, src_sql: str, group: str, x_expr: str, y_expr: str,
                     qx: int = 1, qy: int = 1) -> str:
    """SQL mirror: quantized cell fold, per-axis doubled-rank windows
    (2·running-before + count + 1), HUGEINT moment sums, CASE-signed
    truncating division of the squared terms."""
    return f"""
        WITH src AS ({src_sql}),
        cells AS (
          SELECT {group} AS grp, ({x_expr}) // {qx} AS xq,
                 ({y_expr}) // {qy} AS yq, count(*)::BIGINT AS c
          FROM src GROUP BY 1, 2, 3
        ),
        xr AS (
          SELECT grp, xq,
                 2 * (sum(cx) OVER (PARTITION BY grp ORDER BY xq) - cx)
                   + cx + 1 AS rx
          FROM (SELECT grp, xq, sum(c)::BIGINT AS cx
                FROM cells GROUP BY 1, 2)
        ),
        yr AS (
          SELECT grp, yq,
                 2 * (sum(cy) OVER (PARTITION BY grp ORDER BY yq) - cy)
                   + cy + 1 AS ry
          FROM (SELECT grp, yq, sum(c)::BIGINT AS cy
                FROM cells GROUP BY 1, 2)
        ),
        mom AS (
          SELECT c.grp, sum(c.c)::HUGEINT AS m,
                 sum(c.c::HUGEINT * xr.rx) AS sx,
                 sum(c.c::HUGEINT * yr.ry) AS sy,
                 sum(c.c::HUGEINT * xr.rx * xr.rx) AS sxx,
                 sum(c.c::HUGEINT * yr.ry * yr.ry) AS syy,
                 sum(c.c::HUGEINT * xr.rx * yr.ry) AS sxy
          FROM cells c
          JOIN xr ON xr.grp = c.grp AND xr.xq = c.xq
          JOIN yr ON yr.grp = c.grp AND yr.yq = c.yq
          GROUP BY 1
        )
        SELECT grp AS {group}, m::BIGINT AS n_rows,
               CASE
                 WHEN m < 2 OR (m * sxx - sx * sx) = 0
                   OR (m * syy - sy * sy) = 0 THEN 0
                 ELSE (CASE WHEN (m * sxy - sx * sy) >= 0 THEN 1
                            ELSE -1 END
                       * ((m * sxy - sx * sy) * (m * sxy - sx * sy)
                          * 1000000
                          // ((m * sxx - sx * sx)
                              * (m * syy - sy * sy))))
               END::BIGINT AS rho2_ppm
        FROM mom ORDER BY 1"""


def isotonic_calibration(ds, *, score_col: str, label_col: str,
                         qs: int = 1, num_buckets: int = 8):
    """Isotonic (PAV) calibration of a score against a binary label —
    the NONPARAMETRIC calibrator next to :func:`calibration_bins`:
    equal-width bins report how mis-calibrated a scorer is; isotonic
    regression produces the best monotone recalibration map itself (the
    classic Zadrozny–Elkan treatment), the thing you actually apply
    before thresholding a quality or langid score corpus-wide.

    Exactness device: instead of the sequential pool-adjacent-violators
    stack (order-dependent, not SQL-replayable), the engine evaluates
    the closed minimax identity of the isotonic fit

        fitted(i) = max_{j ≤ i} min_{k ≥ i} avg(pos) over bins j..k

    which is order-free and exact — and because floor-to-ppm is
    monotone non-decreasing, taking each range's ``ppm = pos·10⁶ //
    n`` FIRST and then max-min over the ppms equals the ppm of the
    true rational fit (g nondecreasing ⇒ g(min S) = min g(S)), so
    engine and mirror replay bit-for-bit with no fraction comparisons.
    Scores are quantized to ``score // qs`` bins — the quantizer bounds
    the support at B bins (the kendall_tau grid contract) and bounds
    the mirror's O(B³) range enumeration.

    Scale shape (pr_curve posture): per-batch (bin, n, pos) Arrow count
    partials, ONE bounded fold, O(B²) suffix-min / prefix-max driver
    finish in Python ints. Output ``(bin, n, n_pos, fitted_ppm)`` over
    the observed bins, fitted_ppm non-decreasing in bin by
    construction."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).cast(pa.int64())
        tb = pa.table({
            "bin": pa.compute.divide(s, qs).cast(pa.int64()),
            "y": batch.column(label_col).cast(pa.int64()),
        })
        g = tb.group_by("bin").aggregate(
            [([], "count_all"), ("y", "sum")])
        return g.rename_columns(["bin", "n", "pos"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        num_buckets=num_buckets, bucket_key="bin",
    ).to_pandas().sort_values("bin", kind="stable")

    import ray.data

    if folded.empty:
        return ray.data.from_pandas(pd.DataFrame({
            "bin": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "n_pos": pd.Series([], dtype="int64"),
            "fitted_ppm": pd.Series([], dtype="int64")}))

    n = folded["n"].to_numpy(dtype=np.int64)
    pos = folded["pos"].to_numpy(dtype=np.int64)
    B = len(n)
    # prefix sums (Python ints: counts can pass int64 at corpus scale
    # only via the ppm products; the sums themselves are int64-safe,
    # the ppm products are done in object ints)
    cn = np.concatenate(([0], np.cumsum(n)))
    cp = np.concatenate(([0], np.cumsum(pos)))
    # r[j,k] = floor ppm of range j..k (0-based, inclusive)
    r = np.empty((B, B), dtype=np.int64)
    for j in range(B):
        for k in range(j, B):
            r[j, k] = (int(cp[k + 1]) - int(cp[j])) * 1_000_000 \
                // (int(cn[k + 1]) - int(cn[j]))
    # m[j, i] = min_{k >= i} r[j, k] via suffix min per row
    suf = np.empty((B, B), dtype=np.int64)
    for j in range(B):
        suf[j, B - 1] = r[j, B - 1]
        for k in range(B - 2, j - 1, -1):
            suf[j, k] = min(r[j, k], suf[j, k + 1])
    fitted = np.empty(B, dtype=np.int64)
    for i in range(B):
        fitted[i] = max(int(suf[j, i]) for j in range(i + 1))
    out = pd.DataFrame({
        "bin": folded["bin"].to_numpy(dtype=np.int64),
        "n": n, "n_pos": pos, "fitted_ppm": fitted})
    return ray.data.from_pandas(out)


def isotonic_calibration_sql(*, table_expr: str, score: str,
                             label: str, qs: int = 1) -> str:
    """SQL mirror: bin fold + window prefix sums, j≤k range ppm via a
    rank self-join, then min-per-(i,j) / max-per-i over a bounded
    j≤i≤k join — the same minimax identity on the same floored ppms."""
    return f"""
        WITH src AS (SELECT * FROM {table_expr} AS _t),
        bins AS (
          SELECT ({score}) // {qs} AS bin,
                 count(*)::BIGINT AS n, sum({label})::BIGINT AS pos
          FROM src GROUP BY 1
        ),
        ranked AS (
          SELECT bin, n, pos,
                 row_number() OVER (ORDER BY bin) AS rn,
                 sum(n) OVER (ORDER BY bin) AS cn,
                 sum(pos) OVER (ORDER BY bin) AS cp
          FROM bins
        ),
        ranges AS (
          SELECT a.rn AS j, b.rn AS k,
                 ((b.cp - a.cp + a.pos)::HUGEINT * 1000000
                  // (b.cn - a.cn + a.n))::BIGINT AS ppm
          FROM ranked a JOIN ranked b ON a.rn <= b.rn
        ),
        inner_min AS (
          SELECT i.rn, r.j, min(r.ppm) AS m
          FROM ranked i JOIN ranges r
            ON r.j <= i.rn AND r.k >= i.rn
          GROUP BY 1, 2
        )
        SELECT ranked.bin, ranked.n, ranked.pos AS n_pos,
               mm.fitted_ppm
        FROM ranked JOIN (
          SELECT rn, max(m)::BIGINT AS fitted_ppm
          FROM inner_min GROUP BY 1
        ) mm ON mm.rn = ranked.rn
        ORDER BY 1"""


def conformal_threshold(ds, *, group_col: str, id_col: str,
                        score_col: str, alpha_ppm: int = 100_000,
                        cal_mod: int = 2, salt: str = "",
                        num_buckets: int = 16):
    """Mondrian split-conformal calibration of a per-row score, with its
    own held-out coverage audit — the finite-sample-guaranteed way to
    turn ANY scalar signal (doc length, quality score, perplexity proxy,
    nonconformity of a model) into a cut-off: the split-conformal
    threshold at miscoverage α is the ``⌈(n_cal+1)(1−α)⌉``-th smallest
    calibration score, and scores ≤ it cover fresh draws with
    probability ≥ 1−α regardless of the score's distribution (Vovk et
    al.; Angelopoulos & Bates 2022 tutorial) — the guarantee a naive
    empirical quantile does NOT have at small n. Computed PER GROUP
    (Mondrian conformal), because corpus-wide thresholds silently
    under-cover minority groups — exactly the failure mode of pooled
    curation cut-offs that :func:`quantile_normalize` fights from the
    other direction.

    Contract (everything exact-integer and hash-deterministic):

    * calibration membership is ``md5(salt‖id) % cal_mod == 0`` (the
      group_kfold purity convention — same rows on any cluster shape),
      every other row is the held-out audit set;
    * ``k = ⌈(n_cal+1)·(10⁶−alpha_ppm)/10⁶⌉`` via integer ceiling;
      ``threshold`` = the k-th smallest calibration score;
    * ``coverage_ppm = #(test score ≤ threshold)·10⁶ // n_test`` — the
      delivered coverage next to the promised ``10⁶ − alpha_ppm``;
    * groups with ``k > n_cal`` (too few calibration rows for the
      requested α — the conformal threshold would be +∞) or with an
      empty audit side are EXCLUDED (documented; the output is the
      audit-sized table of groups the guarantee can actually be stated
      for).

    Scale shape (grouped_ks posture): per-batch ``(group, is_cal,
    score)`` Arrow count partials over the bounded score support, ONE
    bucketed fold, per-group sorted-cumsum walk on the driver in Python
    ints. Output ``(group, n_cal, n_test, threshold, coverage_ppm)``."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        out = pd.DataFrame({
            group_col: df[group_col],
            "is_cal": (h % np.uint64(cal_mod) == 0).astype(np.int64),
            "score": df[score_col].astype(np.int64),
        })
        g = out.groupby([group_col, "is_cal", "score"], as_index=False)
        return g.size().rename(columns={"size": "c"})

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, "is_cal", "score"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="score",
    ).to_pandas()

    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        sub = sub.sort_values("score", kind="stable")
        cal = sub[sub["is_cal"] == 1]
        tst = sub[sub["is_cal"] == 0]
        n_cal = int(cal["c"].sum())
        n_test = int(tst["c"].sum())
        k = ((n_cal + 1) * (1_000_000 - alpha_ppm)
             + 999_999) // 1_000_000
        if n_test == 0 or k > n_cal:
            continue
        cum = cal["c"].cumsum().to_numpy()
        thr = int(cal["score"].to_numpy()[np.searchsorted(cum, k)])
        covered = int(tst.loc[tst["score"] <= thr, "c"].sum())
        rows.append((grp, n_cal, n_test, thr,
                     covered * 1_000_000 // n_test))
    out = pd.DataFrame(
        rows, columns=[group_col, "n_cal", "n_test", "threshold",
                       "coverage_ppm"])
    for c in ("n_cal", "n_test", "threshold", "coverage_ppm"):
        out[c] = out[c].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def conformal_threshold_sql(*, src_sql: str, group: str, id_expr: str,
                            score_expr: str, alpha_ppm: int = 100_000,
                            cal_mod: int = 2, salt: str = "") -> str:
    """SQL mirror: md5 split predicate, integer-ceiling rank k, k-th
    smallest via row_number, FILTER-counted held-out coverage."""
    return f"""
        WITH src AS ({src_sql}),
        tagged AS (
          SELECT {group} AS grp, ({score_expr})::BIGINT AS score,
                 CASE WHEN md5_number_upper('{salt}' ||
                        ({id_expr})::VARCHAR) % {cal_mod} = 0
                      THEN 1 ELSE 0 END AS is_cal
          FROM src
        ),
        sizes AS (
          SELECT grp,
                 count(*) FILTER (WHERE is_cal = 1)::BIGINT AS n_cal,
                 count(*) FILTER (WHERE is_cal = 0)::BIGINT AS n_test
          FROM tagged GROUP BY 1
        ),
        kk AS (
          SELECT grp, n_cal, n_test,
                 ((n_cal + 1) * ({1_000_000} - {alpha_ppm})
                  + 999999) // 1000000 AS k
          FROM sizes WHERE n_test > 0
        ),
        ranked AS (
          SELECT grp, score,
                 row_number() OVER (PARTITION BY grp ORDER BY score) AS rn
          FROM tagged WHERE is_cal = 1
        ),
        thr AS (
          SELECT kk.grp, kk.n_cal, kk.n_test, ranked.score AS threshold
          FROM kk JOIN ranked
            ON ranked.grp = kk.grp AND ranked.rn = kk.k
          WHERE kk.k <= kk.n_cal
        )
        SELECT t.grp AS {group}, t.n_cal, t.n_test, t.threshold,
               (count(*) FILTER (WHERE g.score <= t.threshold)
                * 1000000 // t.n_test)::BIGINT AS coverage_ppm
        FROM thr t JOIN tagged g ON g.grp = t.grp AND g.is_cal = 0
        GROUP BY 1, 2, 3, 4
        ORDER BY 1"""


def quantile_normalize(ds, *, group_col: str, id_col: str, value_col: str,
                       num_buckets: int = 16):
    """Cross-group quantile normalization: replace each row's value with
    the POOLED corpus value at the same within-group quantile — the
    batch-effect removal step (Bolstad et al., Bioinformatics 2003,
    lifted from microarray practice to corpus QA) for scores that are
    comparable WITHIN a source but mis-calibrated ACROSS sources: a
    quality score of 0.8 from a lenient crawler and 0.5 from a strict one
    may denote the same percentile, and ranking-based ops downstream
    (host_cap, curation thresholds) silently favor the lenient source
    unless the distributions are aligned first. :func:`quantile_transform`
    emits the within-group RANK; this emits the pooled VALUE at that
    rank, so downstream thresholds keep their original units.

    Exact-integer contract: within-group ordinal rank ``r`` (1-based,
    ties by ``id_col`` ascending) among ``m_g`` rows maps to pooled
    0-based position ``p = (r−1)·N // m_g`` and the normalized value is
    the pooled sorted multiset's element at index ``p`` (floor indexing;
    both ``//`` operands non-negative so Python floor == DuckDB
    truncation). Deterministic on any partitioning.

    Scale shape: ONE bounded-support pooled value-histogram fold
    (grouped_emd's support contract) broadcast to every bucket as a
    (value, cumulative-count) table, plus ONE group-bucketed exchange of
    slim (group, id, value) rows ranked vectorized across all groups per
    bucket; position lookup is a searchsorted against the broadcast CDF.
    The rank·N product is finished in object ints (N² passes int64 at
    10¹⁰ rows)."""
    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    hist = bucketed_aggregate(
        ds.map_batches(
            lambda t: t.group_by(value_col).aggregate([([], "count_all")])
            .rename_columns([value_col, "c"]),
            batch_format="pyarrow"),
        [value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values(value_col)
    hv = hist[value_col].to_numpy()
    cum = np.cumsum(hist["c"].to_numpy()).astype(np.int64)
    n_total = int(cum[-1]) if len(cum) else 0

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[[id_col, group_col, value_col]].assign(
                **{"norm_" + value_col: pd.Series([], dtype=hv.dtype)})
        df = df.sort_values([group_col, value_col, id_col],
                            kind="mergesort")
        r = df.groupby(group_col, sort=False).cumcount().to_numpy()
        m = df.groupby(group_col, sort=False)[value_col].transform(
            "size").to_numpy()
        # r·N passes int64 only past ~2^31 rows; the POSITION p < N always
        # fits int64 again, so the object path is a fallback, not the norm
        if n_total < 2**31:
            p = (r * np.int64(n_total)) // m
        else:
            po = (r.astype(object) * n_total) // m.astype(object)
            p = np.fromiter((int(x) for x in po), dtype=np.int64,
                            count=len(po))
        idx = np.searchsorted(cum, p, side="right")
        out = df[[id_col, group_col, value_col]].copy()
        out["norm_" + value_col] = hv[idx.astype(np.int64)]
        return out

    return bucketed_map_groups(
        ds.select_columns([id_col, group_col, value_col]),
        group_col, per_bucket, num_buckets=num_buckets)


def quantile_normalize_sql(*, table: str, group: str, id_col: str,
                           value_expr: str, value_alias: str) -> str:
    """SQL mirror: pooled cumulative histogram, per-group (value, id)
    row_number, floor position, half-open CDF interval join."""
    return f"""
        WITH src AS (
          SELECT {group} AS g, {id_col} AS id, ({value_expr}) AS v
          FROM {table}
        ),
        hist AS (
          SELECT v AS hv, count(*)::BIGINT AS c FROM src GROUP BY 1
        ),
        cdf AS (
          SELECT hv, sum(c) OVER (ORDER BY hv)::HUGEINT AS cum,
                 (sum(c) OVER (ORDER BY hv) - c)::HUGEINT AS cum_lo
          FROM hist
        ),
        tot AS (SELECT count(*)::HUGEINT AS n FROM src),
        ranked AS (
          SELECT g, id, v,
                 (row_number() OVER (
                    PARTITION BY g ORDER BY v, id) - 1)::HUGEINT AS r,
                 count(*) OVER (PARTITION BY g)::HUGEINT AS m
          FROM src
        ),
        pos AS (
          SELECT g, id, v, ranked.r * tot.n // ranked.m AS p
          FROM ranked, tot
        )
        SELECT pos.id AS {id_col}, pos.g AS {group},
               pos.v AS {value_alias},
               cdf.hv AS norm_{value_alias}
        FROM pos JOIN cdf ON pos.p >= cdf.cum_lo AND pos.p < cdf.cum"""


def peak_hour_share(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key circadian concentration: the hour-of-day holding the key's
    largest event share, and that share in exact integer ppm — the
    cheap bot-vs-human cadence fingerprint (humans spread activity over
    a waking day, cron jobs and scrapers stack one hour bucket;
    > ~500000 ppm in one of 24 buckets is machine cadence) used by
    abuse triage before any model runs. Ties break to the SMALLEST
    hour (documented; mirrors the SQL rank order).

    Scale shape: per-batch (key, hour, n) Arrow partials — at most
    24 rows per key per batch cross the exchange — then ONE key-bucketed
    fold and a vectorized per-bucket argmax; ``share_ppm = n_peak·10⁶ //
    n_events`` in int64 (n·10⁶ is the engine-wide safe product)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    hour_us = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        hours = pa.compute.divide(t, hour_us).cast(pa.int64())
        hr = pa.compute.subtract(
            hours, pa.compute.multiply(
                pa.compute.divide(hours, 24).cast(pa.int64()), 24))
        tb = pa.table({key: batch.column(key),
                       "hour": hr.cast(pa.int64())})
        g = tb.group_by([key, "hour"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "hour", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "peak_hour": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "share_ppm": pd.Series([], dtype="int64")})
        df = (df.groupby([key, "hour"], as_index=False, sort=False)["c"]
              .sum().sort_values([key, "hour"], kind="mergesort"))
        g = df.groupby(key, sort=False)
        tot = g["c"].transform("sum")
        # first max by hour order: idxmax on the hour-sorted frame
        win = df.loc[g["c"].idxmax()]
        wtot = tot.loc[win.index]
        return pd.DataFrame({
            key: win[key].to_numpy(),
            "peak_hour": win["hour"].to_numpy().astype(np.int64),
            "n_events": wtot.to_numpy().astype(np.int64),
            "share_ppm": (win["c"].to_numpy() * 1_000_000
                          // wtot.to_numpy()).astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def peak_hour_share_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: hour fold + (n DESC, hour ASC) rank."""
    return f"""
        WITH h AS (
          SELECT {key} AS kk, (epoch_us({ts}) // 3600000000) % 24 AS hour,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        r AS (
          SELECT kk, hour, c, sum(c) OVER (PARTITION BY kk)::BIGINT AS n,
                 row_number() OVER (PARTITION BY kk
                                    ORDER BY c DESC, hour ASC) AS rn
          FROM h
        )
        SELECT kk AS {key}, hour::BIGINT AS peak_hour, n AS n_events,
               (c::HUGEINT * 1000000 // n)::BIGINT AS share_ppm
        FROM r WHERE rn = 1"""


def hour_concentration(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key Herfindahl–Hirschman concentration of activity across the
    24 hour-of-day bins, in exact integer ppm — the full-distribution
    evenness index completing :func:`peak_hour_share`'s argmax: peak
    share only sees the TALLEST bin, HHI = Σpᵢ² sees the whole shape
    (two half-size bins and one full bin have the same peak share but
    different HHI). Range [10⁶/24 ≈ 41667, 10⁶]: uniform-over-24 floors
    it, single-hour cadence (cron) pins it at 10⁶.

    ``hhi_ppm = Σc² · 10⁶ // S²`` over the observed hour counts c with
    S = Σc (empty bins add nothing to either side). ``active_hours``
    (distinct hours touched, 1–24) rides along as the support size.

    Scale shape: identical to peak_hour_share — per-batch (key, hour,
    count) Arrow partials, ≤ 24 rows per key per batch cross the ONE
    key-bucketed exchange; object-int finish (S² can pass int64 for
    corpus-scale hot keys)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    hour_us = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        hours = pa.compute.divide(t, hour_us).cast(pa.int64())
        hr = pa.compute.subtract(
            hours, pa.compute.multiply(
                pa.compute.divide(hours, 24).cast(pa.int64()), 24))
        tb = pa.table({key: batch.column(key),
                       "hour": hr.cast(pa.int64())})
        g = tb.group_by([key, "hour"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "hour", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "active_hours": pd.Series([], dtype="int64"),
                                 "hhi_ppm": pd.Series([], dtype="int64")})
        df = df.groupby([key, "hour"], as_index=False, sort=False)["c"].sum()
        g = df.groupby(key, sort=False)
        agg = g.agg(s=("c", "sum"), nh=("hour", "count")).reset_index()
        c = df["c"].to_numpy().astype(object)
        sq = (pd.Series(c * c, index=df[key]).groupby(level=0, sort=False)
              .sum().reindex(agg[key]).to_numpy(dtype=object))
        s = agg["s"].to_numpy().astype(object)
        return pd.DataFrame({
            key: agg[key].to_numpy(),
            "n_events": s.astype(np.int64),
            "active_hours": agg["nh"].to_numpy().astype(np.int64),
            "hhi_ppm": (sq * 1_000_000 // (s * s)).astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def hour_concentration_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: hour fold + HUGEINT Σc²/S²."""
    return f"""
        WITH h AS (
          SELECT {key} AS kk, (epoch_us({ts}) // 3600000000) % 24 AS hour,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        g AS (
          SELECT kk, sum(c)::HUGEINT AS s, count(*)::BIGINT AS nh,
                 sum(c::HUGEINT * c) AS sq
          FROM h GROUP BY 1
        )
        SELECT kk AS {key}, s::BIGINT AS n_events, nh AS active_hours,
               (sq * 1000000 // (s * s))::BIGINT AS hhi_ppm
        FROM g"""


def dow_chi2(ds, *, key: str, ts: str, num_buckets: int = 32):
    """Per-key chi-squared statistic of the day-of-week activity profile
    against the uniform-week null, in exact integer ppm of the χ²
    value — the WEEKLY-seasonality test beside the hour-of-day ops:
    human/office traffic is strongly weekly (χ² ≫ critical), uniform
    scraper cadence is not. With c_d the count in weekday bin d and
    S = Σc, the 7-bin Pearson statistic closes over observed bins only:

        ``χ² = Σ_d (c_d − S/7)² / (S/7) = (7·Σc² − S²) / S``
        ``chi2_ppm = (7·Σc² − S²)·10⁶ // S``

    (zero bins are handled by the closed form — they add nothing to
    Σc²). Numerator ≥ 0 by Cauchy–Schwarz over 7 bins, so Python floor
    == DuckDB truncation. df = 6: χ² > 12.59 rejects uniformity at
    α = 0.05, i.e. chi2_ppm > 12_590_000. Weekday convention is pure
    epoch arithmetic, timezone-free: ``dow = (epoch_us // 86400e6) % 7``
    with 0 = Thursday (1970-01-01), documented so the mirror is exact.

    Scale shape: per-batch (key, dow, count) partials — ≤ 7 rows per
    key per batch — ONE key-bucketed exchange, object-int finish."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        dow = pa.compute.subtract(
            day, pa.compute.multiply(
                pa.compute.divide(day, 7).cast(pa.int64()), 7))
        tb = pa.table({key: batch.column(key),
                       "dow": dow.cast(pa.int64())})
        g = tb.group_by([key, "dow"]).aggregate([([], "count_all")])
        return g.rename_columns([key, "dow", "c"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "active_days": pd.Series([], dtype="int64"),
                                 "chi2_ppm": pd.Series([], dtype="int64")})
        df = df.groupby([key, "dow"], as_index=False, sort=False)["c"].sum()
        g = df.groupby(key, sort=False)
        agg = g.agg(s=("c", "sum"), nd=("dow", "count")).reset_index()
        c = df["c"].to_numpy().astype(object)
        sq = (pd.Series(c * c, index=df[key]).groupby(level=0, sort=False)
              .sum().reindex(agg[key]).to_numpy(dtype=object))
        s = agg["s"].to_numpy().astype(object)
        return pd.DataFrame({
            key: agg[key].to_numpy(),
            "n_events": s.astype(np.int64),
            "active_days": agg["nd"].to_numpy().astype(np.int64),
            "chi2_ppm": ((7 * sq - s * s) * 1_000_000
                         // s).astype(np.int64),
        })

    return bucketed_map_groups(partials, key, per_bucket,
                               num_buckets=num_buckets)


def dow_chi2_sql(*, table: str, key: str, ts: str) -> str:
    """SQL mirror: epoch-arithmetic weekday fold (0 = Thursday) +
    HUGEINT closed-form χ²."""
    return f"""
        WITH d AS (
          SELECT {key} AS kk, (epoch_us({ts}) // 86400000000) % 7 AS dow,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        g AS (
          SELECT kk, sum(c)::HUGEINT AS s, count(*)::BIGINT AS nd,
                 sum(c::HUGEINT * c) AS sq
          FROM d GROUP BY 1
        )
        SELECT kk AS {key}, s::BIGINT AS n_events, nd AS active_days,
               ((7 * sq - s * s) * 1000000 // s)::BIGINT AS chi2_ppm
        FROM g"""


def weighted_median(ds, *, group_col: str, value_col: str,
                    weight_col: str, num_buckets: int = 32):
    """Per-group LOWER weighted median: the smallest value v whose
    cumulative weight (over values ≤ v) reaches half the group's total
    — ``2·cumw(v) ≥ W`` — the robust "typical value per unit of
    weight" aggregation plain median gets wrong whenever rows carry
    unequal mass (a part's typical unit price should weight each line
    by its quantity; a host's typical page quality by page bytes).
    Deterministic under duplicate values by construction: equal values
    pre-fold into one (group, value, Σweight) row before the threshold
    walk, so row tie-order can't move the answer — the quantile_disc
    lower-median convention generalized to weights (weight ≡ 1 reduces
    to it exactly).

    Output: ``(group, n_rows, total_weight, wmedian)`` — all int64
    (engine-wide cents/integer-weight contract; zero/negative weights
    are the caller's bug and are not defended).

    Scale shape: per-batch Arrow ``group_by(group, value)`` partials
    (sum weight + row count) collapse duplicate values map-side, ONE
    group-bucketed exchange, per-bucket sort + segmented cumsum +
    first-hit pick — the activity_half_life kernel on the VALUE axis
    instead of the time axis."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([group_col, value_col, weight_col])
             .group_by([group_col, value_col])
             .aggregate([(weight_col, "sum"), ([], "count_all")]))
        return g.rename_columns([group_col, value_col, "w", "nr"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                group_col: pd.Series([], dtype="int64"),
                "n_rows": pd.Series([], dtype="int64"),
                "total_weight": pd.Series([], dtype="int64"),
                "wmedian": pd.Series([], dtype="int64")})
        df = (df.groupby([group_col, value_col], as_index=False,
                         sort=False).agg(w=("w", "sum"), nr=("nr", "sum")))
        df = df.sort_values([group_col, value_col], kind="mergesort",
                            ignore_index=True)
        k = df[group_col].to_numpy()
        v = df[value_col].to_numpy()
        w = df["w"].to_numpy()
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        cum = np.cumsum(w)
        base = np.zeros(len(k), dtype=cum.dtype)
        base[starts[1:]] = cum[starts[1:] - 1]
        cum = cum - np.maximum.accumulate(np.where(new, base, 0))
        ends = np.append(starts[1:], len(k)) - 1
        tot = cum[ends]
        hit = 2 * cum >= tot[seg]
        hit_pos = np.flatnonzero(hit)
        first_hit = np.full(len(starts), len(k), dtype=np.int64)
        np.minimum.at(first_hit, seg[hit_pos], hit_pos)
        nr = np.cumsum(df["nr"].to_numpy())
        nr_base = np.append(0, nr[ends[:-1]])
        return pd.DataFrame({
            group_col: k[starts],
            "n_rows": (nr[ends] - nr_base).astype(np.int64),
            "total_weight": tot.astype(np.int64),
            "wmedian": v[first_hit].astype(np.int64),
        })

    return bucketed_map_groups(partials, group_col, per_bucket,
                               num_buckets=num_buckets)


def weighted_median_sql(*, table_expr: str, group: str, value: str,
                        weight: str) -> str:
    """SQL mirror: duplicate-value pre-fold, windowed cumulative weight,
    first 2·cumw ≥ W value."""
    return f"""
        WITH v AS (
          SELECT {group} AS kk, {value} AS val,
                 sum({weight})::BIGINT AS w, count(*)::BIGINT AS nr
          FROM {table_expr} GROUP BY 1, 2
        ),
        c AS (
          SELECT kk, val, nr,
                 sum(w) OVER (PARTITION BY kk ORDER BY val)::BIGINT AS cumw,
                 sum(w) OVER (PARTITION BY kk)::BIGINT AS tot,
                 sum(nr) OVER (PARTITION BY kk)::BIGINT AS n
          FROM v
        )
        SELECT kk AS {group}, max(n) AS n_rows,
               max(tot) AS total_weight,
               min(val)::BIGINT AS wmedian
        FROM c WHERE 2 * cumw >= tot GROUP BY kk"""


def hdr_quantiles(ds, *, group_col: str, value_col: str,
                  quantiles=((1, 2), (19, 20), (99, 100)),
                  sig_bits: int = 5, num_buckets: int = 16):
    """Per-group quantile estimates from a FIXED-STATE log-linear
    histogram (the HdrHistogram idea, Gil Tene's public design): each
    non-negative value is quantized to its top ``sig_bits+1``
    significant bits — ``lb(v) = (v >> s) << s`` with
    ``s = max(floor(log2 v) − sig_bits, 0)`` — so the histogram has at
    most ``~64·2^sig_bits`` cells for ARBITRARY int64 values and every
    estimate is a true data lower bound within relative error
    ``2^-sig_bits``. This is the scale path the exact quantile ops can't
    take: ``numeric_profile``'s exact fold needs bounded VALUE support,
    this bounds the STATE instead — the latency-dashboard trade, made
    deterministic and SQL-replayable (floor-log2 via the literal powers
    table, no float log).

    Rank convention: estimate for q = num/den is the smallest bucket
    lower bound whose cumulative count exceeds the 0-based position
    ``(n−1)·num // den`` (the quantile_normalize floor-position
    convention). Negative values raise (quantize magnitudes upstream).

    Scale shape: per-batch (group, lb, count) Arrow partials, one
    bounded fold (cells ≤ 64·2^sig_bits per group by construction),
    driver cum-walk per (group, quantile) in Python ints."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    powers = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))

    def lb_of(v: np.ndarray) -> np.ndarray:
        if (v < 0).any():
            raise ValueError("hdr_quantiles requires non-negative values")
        bl = np.searchsorted(powers, v, side="right")  # floor(log2 v)+1
        s = np.maximum(bl - 1 - sig_bits, 0)
        return (v >> s) << s

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        tb = pa.table({
            group_col: batch.column(group_col),
            "lb": pa.array(lb_of(v), type=pa.int64()),
        })
        g = tb.group_by([group_col, "lb"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "lb", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "lb"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="lb",
    ).to_pandas().sort_values([group_col, "lb"])

    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        cum = np.cumsum(sub["c"].to_numpy().astype(object))
        n = int(cum[-1])
        lbs = sub["lb"].to_numpy()
        for qn, qd in quantiles:
            p = (n - 1) * qn // qd
            idx = int(np.searchsorted(cum, p, side="right"))
            rows.append((grp, qn * 1_000_000 // qd, n, int(lbs[idx])))
    out = pd.DataFrame(rows, columns=[group_col, "q_ppm", "n_rows",
                                      "estimate"])
    for c in ("q_ppm", "n_rows", "estimate"):
        out[c] = out[c].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def hdr_quantiles_sql(*, table: str, group: str, value_expr: str,
                      quantiles=((1, 2), (19, 20), (99, 100)),
                      sig_bits: int = 5) -> str:
    """SQL mirror: floor-log2 via the literal powers join, identical
    shift quantization, window-cum rank walk."""
    qrows = ", ".join(f"({qn}, {qd})" for qn, qd in quantiles)
    return f"""
        WITH src AS (
          SELECT {group} AS g, ({value_expr})::BIGINT AS v FROM {table}
        ),
        powers AS (
          SELECT k, (1::BIGINT << k)::BIGINT AS p
          FROM unnest(generate_series(0, 62)) AS t(k)
        ),
        ql AS (
          SELECT greatest(k - {sig_bits}, 0) AS s, v, g
          FROM src JOIN powers
            ON powers.p <= greatest(v, 1)
           AND (greatest(v, 1) >> 1) < powers.p  -- v < 2p, overflow-free
        ),
        cells AS (
          SELECT g, ((v >> s) << s)::BIGINT AS lb, count(*)::BIGINT AS c
          FROM ql GROUP BY 1, 2
        ),
        cdf AS (
          SELECT g, lb,
                 sum(c) OVER (PARTITION BY g ORDER BY lb)::HUGEINT AS cum,
                 (sum(c) OVER (PARTITION BY g ORDER BY lb) - c)::HUGEINT
                     AS cum_lo,
                 sum(c) OVER (PARTITION BY g)::HUGEINT AS n
          FROM cells
        ),
        qs AS (SELECT * FROM (VALUES {qrows}) AS t(qn, qd))
        SELECT cdf.g AS {group},
               (qs.qn::BIGINT * 1000000 // qs.qd)::BIGINT AS q_ppm,
               cdf.n::BIGINT AS n_rows, cdf.lb AS estimate
        FROM cdf JOIN qs
          ON (cdf.n - 1) * qs.qn // qs.qd >= cdf.cum_lo
         AND (cdf.n - 1) * qs.qn // qs.qd < cdf.cum
        ORDER BY 1, 2"""


def grouped_mannwhitney(ds, *, group_col: str, value_col: str,
                        num_buckets: int = 16):
    """Per-group Mann-Whitney common-language effect size vs the REST of
    the corpus, in exact integer ppm — the DIRECTION-aware companion to
    :func:`grouped_ks`: KS says "these distributions differ somewhere",
    the Mann-Whitney statistic says "a random draw from this group
    exceeds a random draw from the rest this often" — the
    stochastic-dominance read a curation pass wants before it trusts a
    threshold tuned on the pooled corpus (u_ppm ≫ 500000: the group
    runs systematically HIGH; ≪: systematically low; ≈ 500000 with a
    big KS: a shape change, not a shift).

    Exact over ties by the standard half-credit convention, kept in
    integers by counting in HALVES: ``U₂ = 2·#{a > b} + #{a = b}``
    over all cross pairs, ``u_ppm = U₂·10⁶ // (2·n_g·n_rest)``. A group
    that IS the whole corpus reports 500000 (no rest — the neutral
    element, documented).

    Scale shape (grouped_ks posture): the same ONE bounded-support
    (group, value) count fold, then a driver walk per group — wins
    via the rest's prefix-cums, ties via the rest's own bucket — in
    Python ints (pair counts pass int64 at 10¹⁰ rows); HUGEINT grid
    mirror."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key=value_col,
    ).to_pandas()

    support = np.sort(folded[value_col].unique())
    corpus = (folded.groupby(value_col)["c"].sum()
              .reindex(support, fill_value=0).to_numpy())
    n_total = int(corpus.sum())
    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        cg = (sub.set_index(value_col)["c"]
              .reindex(support, fill_value=0).to_numpy())
        rest = corpus - cg
        n_g = int(cg.sum())
        n_rest = n_total - n_g
        if n_rest == 0:
            rows.append((grp, n_g, 500_000))
            continue
        # rest prefix-cum strictly below each support value
        cum_rest_below = np.concatenate(
            [[0], np.cumsum(rest.astype(object))[:-1]])
        u2 = 0
        for i in range(len(support)):
            if cg[i]:
                u2 += 2 * int(cg[i]) * int(cum_rest_below[i])
                u2 += int(cg[i]) * int(rest[i])
        ppm = u2 * 1_000_000 // (2 * n_g * n_rest)
        rows.append((grp, n_g, int(ppm)))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "u_ppm"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["u_ppm"] = out["u_ppm"].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def grouped_mannwhitney_sql(*, table: str, group: str,
                            value_expr: str) -> str:
    """SQL mirror: groups × support grid, window prefix of the REST,
    HUGEINT half-credit sum."""
    return f"""
        WITH g AS (
          SELECT {group} AS grp, {value_expr} AS v, count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        support AS (SELECT DISTINCT v FROM g),
        tot AS (SELECT grp, sum(c)::BIGINT AS n_g FROM g GROUP BY 1),
        big AS (SELECT sum(c)::BIGINT AS n FROM g),
        corp AS (
          SELECT s.v, coalesce(cc.c, 0)::BIGINT AS c
          FROM support s LEFT JOIN (
            SELECT v, sum(c)::BIGINT AS c FROM g GROUP BY 1) cc USING (v)
        ),
        grid AS (
          SELECT t.grp, t.n_g, s.v,
                 coalesce(gg.c, 0)::BIGINT AS cg,
                 corp.c - coalesce(gg.c, 0) AS rest
          FROM tot t CROSS JOIN support s
          JOIN corp ON corp.v = s.v
          LEFT JOIN g gg ON gg.grp = t.grp AND gg.v = s.v
        ),
        walk AS (
          SELECT grp, n_g, v, cg, rest,
                 (sum(rest) OVER (PARTITION BY grp ORDER BY v)
                  - rest)::HUGEINT AS rest_below
          FROM grid
        )
        SELECT walk.grp AS {group}, walk.n_g AS n_rows,
               CASE WHEN big.n - walk.n_g = 0 THEN 500000 ELSE (
                 sum(2 * walk.cg::HUGEINT * walk.rest_below
                     + walk.cg::HUGEINT * walk.rest) * 1000000
                 // (2 * walk.n_g::HUGEINT * (big.n - walk.n_g))
               )::BIGINT END AS u_ppm
        FROM walk, big
        GROUP BY walk.grp, walk.n_g, big.n
        ORDER BY 1"""


def trimmed_mean(ds, *, group_col: str, value_col: str,
                 trim_ppm: int = 100_000, num_buckets: int = 16):
    """Per-group trimmed mean in exact integer ppm of the value unit —
    the robust LOCATION statistic completing the winsorize family:
    :func:`winsorize_value` CLIPS tails for downstream consumers, the
    trimmed mean DROPS them and reports where the bulk actually sits
    (the Olympic-scoring estimator; with trim 10% it tolerates up to
    10% garbage rows per side — exactly the contamination a scraped
    numeric field carries — while the plain mean follows a single
    adversarial row arbitrarily far).

    Contract: ``k = n·trim_ppm // 10⁶`` rows are dropped from EACH side
    of the sorted multiset (value order with duplicate rows interchange-
    able — partial histogram buckets contribute ``value × remaining``
    exactly), and ``tmean_ppm = middle_sum·10⁶ // (n − 2k)``. Groups
    with ``n − 2k ≤ 0`` are excluded (over-trimmed; documented).

    Scale shape (grouped_emd posture): ONE bounded-support
    (group, value) count fold, then an exact two-sided histogram walk
    per group on the driver in Python ints (sum·10⁶ passes int64 at
    web scale); HUGEINT mirror via window cums and partial-bucket
    arithmetic."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key=value_col,
    ).to_pandas()

    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        sub = sub.sort_values(value_col)
        v = [int(x) for x in sub[value_col]]
        c = [int(x) for x in sub["c"]]
        n = sum(c)
        k = n * trim_ppm // 1_000_000
        m = n - 2 * k
        if m <= 0:
            continue
        total = sum(a * b for a, b in zip(v, c))
        # drop k from the low side
        low_drop = 0
        rem = k
        for a, b in zip(v, c):
            take = min(rem, b)
            low_drop += a * take
            rem -= take
            if not rem:
                break
        hi_drop = 0
        rem = k
        for a, b in zip(reversed(v), reversed(c)):
            take = min(rem, b)
            hi_drop += a * take
            rem -= take
            if not rem:
                break
        mid = total - low_drop - hi_drop
        rows.append((grp, n, mid * 1_000_000 // m))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "tmean_ppm"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["tmean_ppm"] = out["tmean_ppm"].astype("int64")
    import ray.data

    return ray.data.from_pandas(out)


def trimmed_mean_sql(*, table: str, group: str, value_expr: str,
                     trim_ppm: int = 100_000) -> str:
    """SQL mirror: window cums over the value-sorted histogram, partial
    buckets via greatest/least clamps, HUGEINT arithmetic."""
    return f"""
        WITH g AS (
          SELECT {group} AS grp, ({value_expr})::BIGINT AS v,
                 count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        t AS (
          SELECT grp, sum(c)::BIGINT AS n,
                 (sum(c) * {trim_ppm} // 1000000)::BIGINT AS k
          FROM g GROUP BY 1
        ),
        w AS (
          SELECT g.grp, g.v, g.c, t.n, t.k,
                 (sum(g.c) OVER (PARTITION BY g.grp ORDER BY g.v)
                  - g.c)::BIGINT AS below
          FROM g JOIN t USING (grp)
        ),
        kept AS (
          -- rows kept from this bucket: overlap of [below, below+c) with
          -- [k, n-k)
          SELECT grp, n, k, v,
                 greatest(least(below + c, n - k) - greatest(below, k),
                          0)::HUGEINT AS keepc
          FROM w
        )
        SELECT grp AS {group}, max(n)::BIGINT AS n_rows,
               (sum(v::HUGEINT * keepc) * 1000000
                // (max(n) - 2 * max(k)))::BIGINT AS tmean_ppm
        FROM kept
        WHERE n - 2 * k > 0
        GROUP BY grp ORDER BY 1"""


# ---------------------------------------------------------------------------
# Bradley-Terry pairwise-preference ranking
# ---------------------------------------------------------------------------


def bradley_terry(ds, *, winner_col: str = "winner",
                  loser_col: str = "loser", rounds: int = 6,
                  num_buckets: int = 8):
    """Bradley-Terry strength ranking from pairwise comparisons — the
    arena-eval primitive (Chatbot-Arena-style model rating, Elo's batch
    MLE sibling): given (winner, loser) outcome rows, fit per-item
    strengths p with P(i beats j) = p_i/(p_i+p_j) via Hunter's (2004) MM
    iteration, made bit-replayable by the engine's fixed-point
    convention — FIXED round count, all-integer arithmetic, truncating
    division — so the SQL mirror unrolls the identical rounds and agrees
    exactly (the kmeans_fixed / coreness / pca_power posture).

    Per round, with strengths in ppm (start: 10⁶ each) over the bounded
    item support:

        denom_i = Σ_{pairs (i,j)}  n_ij·10¹² // max(p_i + p_j, 1)
        q_i     = W_i·10¹² // max(denom_i, 1)
        p_i     = q_i·m·10⁶ // max(Σq, 1)        (scale renorm, m items)

    where n_ij = games between i and j (either direction), W_i = total
    wins of i. The renorm pins the mean strength at 10⁶ (BT is
    scale-invariant; truncation would otherwise drift the scale).
    Never-winning items go to 0 — the MLE boundary, kept by contract.
    Self-comparisons (winner == loser) carry no information and are
    DROPPED by contract.

    Scale shape: per-batch canonical-pair count partials (lo, hi, n,
    lo_wins) via one pandas groupby — the only thing that crosses is the
    bounded pair support — ONE pair-keyed fold, then the iteration walks
    the tiny pair table in exact Python ints on the driver (items are an
    audit-sized set: models, event types, variants — never corpus-sized).
    Output ``(item, games, wins, strength_ppm)`` sorted by item.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        w = t.column(winner_col).to_numpy(zero_copy_only=False)
        lo_ = t.column(loser_col).to_numpy(zero_copy_only=False)
        keep = w != lo_
        w, lo_ = w[keep], lo_[keep]
        lo = np.minimum(w, lo_)
        hi = np.maximum(w, lo_)
        df = pd.DataFrame({"lo": lo, "hi": hi,
                           "lw": (w == lo).astype(np.int64)})
        g = (df.groupby(["lo", "hi"], sort=False)
             .agg(n=("lw", "size"), lo_wins=("lw", "sum"))
             .reset_index())
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lo", "hi"], {"n": ("n", "sum"), "lo_wins": ("lo_wins", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    if len(folded) == 0:
        return pd.DataFrame({
            "item": pd.Series([], dtype=object),
            "games": pd.Series([], dtype="int64"),
            "wins": pd.Series([], dtype="int64"),
            "strength_ppm": pd.Series([], dtype="int64"),
        })

    def _native(v):
        # Keep the item column's NATIVE type (ints stay ints) so the
        # output sorts numerically exactly like the SQL mirror; str()
        # coercion here would sort integer items lexicographically.
        return v.item() if isinstance(v, np.generic) else v

    prs = [(_native(r.lo), _native(r.hi), int(r.n), int(r.lo_wins))
           for r in folded.itertuples(index=False)]
    items = sorted({x for lo, hi, _, _ in prs for x in (lo, hi)})
    idx = {it: i for i, it in enumerate(items)}
    m = len(items)
    wins = [0] * m
    games = [0] * m
    for lo, hi, n, lw in prs:
        wins[idx[lo]] += lw
        wins[idx[hi]] += n - lw
        games[idx[lo]] += n
        games[idx[hi]] += n
    p = [1_000_000] * m
    for _ in range(rounds):
        denom = [0] * m
        for lo, hi, n, _ in prs:
            d = (n * 10**12) // max(p[idx[lo]] + p[idx[hi]], 1)
            denom[idx[lo]] += d
            denom[idx[hi]] += d
        q = [(wins[i] * 10**12) // max(denom[i], 1) for i in range(m)]
        s = sum(q)
        p = [(q[i] * m * 1_000_000) // max(s, 1) for i in range(m)]
    item_dtype = ("int64" if items and all(
        isinstance(x, int) and not isinstance(x, bool) for x in items)
        else object)
    return pd.DataFrame({
        "item": pd.Series(items, dtype=item_dtype),
        "games": pd.Series(games, dtype="int64"),
        "wins": pd.Series(wins, dtype="int64"),
        "strength_ppm": pd.Series(p, dtype="int64"),
    })


def bradley_terry_sql(*, comparisons_sql: str, winner: str = "winner",
                      loser: str = "loser", rounds: int = 6) -> str:
    """SQL mirror: canonical-pair counts, then the MM rounds unrolled as
    CTE triples (denom join through both endpoints' previous strengths,
    q, renorm) — exact by the shared all-integer truncating-division
    convention; HUGEINT throughout the products."""
    ctes = [f"""comp AS MATERIALIZED ({comparisons_sql}),
        pairs AS (
          SELECT least({winner}, {loser}) AS lo,
                 greatest({winner}, {loser}) AS hi,
                 count(*)::BIGINT AS n,
                 count(*) FILTER (WHERE {winner} < {loser})::BIGINT
                     AS lo_wins
          FROM comp WHERE {winner} != {loser} GROUP BY 1, 2
        ),
        sides AS MATERIALIZED (
          SELECT lo AS item, lo, hi, n FROM pairs
          UNION ALL
          SELECT hi, lo, hi, n FROM pairs
        ),
        items AS MATERIALIZED (
          SELECT item, sum(wins)::BIGINT AS wins,
                 sum(games)::BIGINT AS games
          FROM (
            SELECT lo AS item, lo_wins AS wins, n AS games FROM pairs
            UNION ALL
            SELECT hi, n - lo_wins, n FROM pairs
          ) GROUP BY 1
        ),
        mm AS MATERIALIZED (SELECT count(*)::HUGEINT AS m FROM items),
        p0 AS MATERIALIZED (SELECT item, 1000000::HUGEINT AS p FROM items)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""
        d{r} AS MATERIALIZED (
          SELECT t.item,
                 sum((t.n::HUGEINT * 1000000000000)
                     // greatest(pa.p + pb.p, 1)) AS denom
          FROM sides t
          JOIN p{r - 1} pa ON pa.item = t.lo
          JOIN p{r - 1} pb ON pb.item = t.hi
          GROUP BY 1
        ),
        q{r} AS MATERIALIZED (
          SELECT i.item,
                 (i.wins::HUGEINT * 1000000000000)
                     // greatest(coalesce(d.denom, 0), 1) AS q
          FROM items i LEFT JOIN d{r} d ON d.item = i.item
        ),
        p{r} AS MATERIALIZED (
          SELECT item,
                 (q * (SELECT m FROM mm) * 1000000)
                     // greatest((SELECT sum(q) FROM q{r}), 1) AS p
          FROM q{r}
        )""")
    return f"""
        WITH {", ".join(ctes)}
        SELECT i.item, i.games, i.wins, p.p::BIGINT AS strength_ppm
        FROM items i JOIN p{rounds} p ON p.item = i.item
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals
# ---------------------------------------------------------------------------

#: Pinned Poisson(1) CDF thresholds on the 2^64 hash scale:
#: ``_POIS_C[j] = floor(P(X <= j) * 2^64)`` for j = 0..8, embedded as
#: LITERALS (float provenance is irrelevant — both engines compare the
#: same integers).  A draw u ~ U[0, 2^64) maps to weight
#: ``k = #{j : u >= _POIS_C[j]}`` ∈ 0..9; the truncated tail
#: P(X > 9) ≈ 1.1e-7 is part of the pinned contract.
_POIS_C = (6786177901268885504, 13572355802537771008,
           16965444753172213760, 18096474403383695360,
           18379231815936565248, 18435783298447138816,
           18445208545532233728, 18446555009401532416,
           18446723317385195520)


def bootstrap_ci(ds, *, group_col: str, value_col: str, id_col: str,
                 n_reps: int = 20, alpha_ppm: int = 200_000,
                 salt: str = "", num_buckets: int = 16):
    """Per-group bootstrap confidence interval of the mean via the
    POISSON bootstrap — the resampling scheme that actually runs at
    cluster scale (Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams": classical resampling needs the whole sample in one
    place; giving every row an independent Poisson(1) multiplicity per
    replicate is embarrassingly parallel and equals the multinomial
    bootstrap as n grows). The error bar belongs next to every mean this
    toolkit reports — a curation decision made on a group mean without
    one reads noise as signal.

    Determinism contract: replicate r's weight for a row is ``k = #{j :
    md5_hash64(salt|r|id) >= _POIS_C[j]}`` — a pure function of the data
    (any cluster shape, any partitioning) that SQL replays exactly via
    ``md5_number_upper`` and the same literal thresholds. Replicate
    mean = ``Σ(k·v) // max(Σk, 1)`` in exact floor division (an all-zero
    replicate contributes 0 — vanishing probability beyond toy groups,
    pinned by contract). With the B replicate means ascending,

        ci_lo = value at rank  B·alpha_ppm // 2·10⁶ + 1   (1-indexed)
        ci_hi = value at rank  B − B·alpha_ppm // 2·10⁶

    — the percentile bootstrap at confidence 1−alpha (default 80%:
    ranks 3 and 18 of 20). Point estimate = plain floor mean.

    Scale shape: per-batch, per-replicate vectorized weight draw (B md5
    passes over the batch's ids) folded map-side to (group, rep) moment
    partials — B×G rows cross per batch, nothing row-sized — ONE
    (group, rep)-keyed fold, driver rank walk over B values per group.
    Output ``(group, n, mean, ci_lo, ci_hi)`` sorted by group; values
    must already be integers (quantize to cents first — the engine-wide
    convention).
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    thresholds = np.array(_POIS_C, dtype=np.uint64)

    def partial(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(v) and v.min() < 0:
            raise ValueError("bootstrap_ci: negative value (contract: "
                             "v >= 0 — floor/trunc division parity)")
        codes, uniq = pd.factorize(g)
        m = len(uniq)
        out_g, out_r, out_k, out_kv = [], [], [], []
        # rep -1 carries the plain moments for the point estimate
        nn = np.bincount(codes, minlength=m).astype(np.int64)
        sv = np.zeros(m, dtype=np.int64)
        np.add.at(sv, codes, v)
        out_g.append(uniq)
        out_r.append(np.full(m, -1, dtype=np.int64))
        out_k.append(nn)
        out_kv.append(sv)
        for r in range(n_reps):
            u = md5_hash64([f"{salt}|{r}|{i}" for i in ids])
            k = (u[:, None] >= thresholds[None, :]).sum(
                axis=1).astype(np.int64)
            sk = np.zeros(m, dtype=np.int64)
            skv = np.zeros(m, dtype=np.int64)
            np.add.at(sk, codes, k)
            np.add.at(skv, codes, k * v)
            out_g.append(uniq)
            out_r.append(np.full(m, r, dtype=np.int64))
            out_k.append(sk)
            out_kv.append(skv)
        return pa.table({
            "grp": pa.array(np.concatenate(out_g)),
            "rep": pa.array(np.concatenate(out_r)),
            "sk": pa.array(np.concatenate(out_k)),
            "skv": pa.array(np.concatenate(out_kv)),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["grp", "rep"], {"sk": ("sk", "sum"), "skv": ("skv", "sum")},
        num_buckets=num_buckets, bucket_key="grp",
    ).to_pandas()

    lo_rank = n_reps * alpha_ppm // 2_000_000 + 1
    hi_rank = n_reps - n_reps * alpha_ppm // 2_000_000
    rows = []
    for grp, sub in folded.groupby("grp", sort=True):
        by_rep = {int(r.rep): (int(r.sk), int(r.skv))
                  for r in sub.itertuples(index=False)}
        n, sv = by_rep.get(-1, (0, 0))
        means = sorted(
            by_rep.get(r, (0, 0))[1] // max(by_rep.get(r, (0, 0))[0], 1)
            for r in range(n_reps))
        rows.append((grp, n, sv // max(n, 1),
                     means[lo_rank - 1], means[hi_rank - 1]))
    out = pd.DataFrame(
        rows, columns=[group_col, "n", "mean", "ci_lo", "ci_hi"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def bootstrap_ci_sql(*, table_expr: str, group: str, value: str,
                     id_col: str, n_reps: int = 20,
                     alpha_ppm: int = 200_000, salt: str = "") -> str:
    """SQL mirror: generate_series replicate cross join,
    md5_number_upper draw vs the same literal thresholds, (group, rep)
    moment fold, row_number rank pick at the identical 1-indexed
    ranks."""
    lo_rank = n_reps * alpha_ppm // 2_000_000 + 1
    hi_rank = n_reps - n_reps * alpha_ppm // 2_000_000
    ksum = " + ".join(
        f"CASE WHEN u >= {c}::UBIGINT THEN 1 ELSE 0 END"
        for c in _POIS_C)
    return f"""
        WITH base AS MATERIALIZED (
          SELECT {group} AS grp, {value} AS v, {id_col} AS id
          FROM {table_expr}
        ),
        w AS (
          SELECT grp, v, r, ({ksum})::BIGINT AS k
          FROM (
            SELECT b.grp, b.v, t.r,
                   md5_number_upper(
                       '{salt}|' || t.r::VARCHAR || '|'
                       || b.id::VARCHAR) AS u
            FROM base b
            CROSS JOIN generate_series(0, {n_reps - 1}) t(r)
          )
        ),
        rm AS (
          SELECT grp, r,
                 (sum(k * v)::HUGEINT
                  // greatest(sum(k), 1))::BIGINT AS mu
          FROM w GROUP BY 1, 2
        ),
        ranked AS (
          SELECT grp, mu,
                 row_number() OVER (PARTITION BY grp ORDER BY mu) AS rk
          FROM rm
        ),
        pt AS (
          SELECT grp, count(*)::BIGINT AS n,
                 (sum(v)::HUGEINT // count(*))::BIGINT AS mean
          FROM base GROUP BY 1
        )
        SELECT p.grp AS {group}, p.n, p.mean,
               lo.mu AS ci_lo, hi.mu AS ci_hi
        FROM pt p
        JOIN ranked lo ON lo.grp = p.grp AND lo.rk = {lo_rank}
        JOIN ranked hi ON hi.grp = p.grp AND hi.rk = {hi_rank}
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# Theil's U (uncertainty coefficient)
# ---------------------------------------------------------------------------


def theils_u(ds, *, x_col: str, y_col: str, num_buckets: int = 32):
    """Theil's uncertainty coefficient U(Y|X) — the ASYMMETRIC
    categorical-association screen beside :func:`cramers_v`'s symmetric
    one (Theil 1970; the 'categorical correlation' of EDA dashboards):
    what fraction of Y's entropy does knowing X remove, U = I(X;Y)/H(Y)
    ∈ [0,1] — direction-aware, so U(source|lang) and U(lang|source) can
    legitimately differ, which is exactly what a feed-vs-language audit
    wants to see.

    Exactness contract (the floor-log2 BITS convention of psi_drift /
    woe_iv): over the observed cell counts o with marginals cx, cy and
    total n,

        mi_fix = Σ_cells o · (⌊log2(o·n)⌋ − ⌊log2(cx·cy)⌋)
        hy_fix = Σ_y    cy · (⌊log2 n⌋ − ⌊log2 cy⌋)          (≥ 0)
        u_ppm  = sign(mi_fix) · (|mi_fix|·10⁶ // hy_fix)

    — every term an exact integer both engines reproduce (unobserved
    cells contribute 0 exactly, as in true MI; individual floored terms
    may be negative though true MI is ≥ 0 — the convention trades the
    sign guarantee for bit-replayability, same as psi's weak-sign trade
    in reverse). Constant Y (hy_fix = 0) → u_ppm = 0 by contract.

    Scale shape: identical to cramers_v — per-batch Arrow cell-count
    partials, ONE bounded-cell fold, driver finish in Python ints.
    Output one row ``(n, x_card, y_card, mi_fix, hy_fix, u_ppm)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([x_col, y_col]).group_by([x_col, y_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([x_col, y_col, "o"])

    cells = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [x_col, y_col], {"o": ("o", "sum")}, num_buckets=num_buckets,
    ).to_pandas()

    def il2(v: int) -> int:
        return v.bit_length() - 1

    cx = cells.groupby(x_col)["o"].sum().astype("int64")
    cy = cells.groupby(y_col)["o"].sum().astype("int64")
    n = int(cells["o"].sum())
    mi_fix = sum(
        int(o) * (il2(int(o) * n) - il2(int(cx[a]) * int(cy[b])))
        for a, b, o in zip(cells[x_col], cells[y_col], cells["o"]))
    hy_fix = sum(int(c) * (il2(n) - il2(int(c))) for c in cy)
    mag = abs(mi_fix) * 1_000_000 // hy_fix if hy_fix > 0 else 0
    u_ppm = mag if mi_fix >= 0 else -mag
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "x_card": pd.Series([len(cx)], dtype="int64"),
        "y_card": pd.Series([len(cy)], dtype="int64"),
        "mi_fix": pd.Series([mi_fix], dtype="int64"),
        "hy_fix": pd.Series([hy_fix], dtype="int64"),
        "u_ppm": pd.Series([u_ppm], dtype="int64"),
    })


def theils_u_sql(*, x: str, y: str, table: str) -> str:
    """SQL mirror: observed-cell fold + marginal joins, ⌊log2⌋ via the
    format('{{:b}}') length identity (BIGINT products — the mirror's
    test-scale contract; the engine side uses unbounded Python ints),
    CASE-signed truncating division == the engine's sign-split."""
    def il2(expr: str) -> str:
        return f"(length(format('{{:b}}', {expr})) - 1)"

    return f"""
        WITH c AS (
          SELECT {x} AS xk, {y} AS yk, count(*)::BIGINT AS o
          FROM {table} GROUP BY 1, 2
        ),
        mx AS (SELECT xk, sum(o)::BIGINT AS cx FROM c GROUP BY 1),
        my AS (SELECT yk, sum(o)::BIGINT AS cy FROM c GROUP BY 1),
        g AS (SELECT sum(o)::BIGINT AS n FROM c),
        mi AS (
          SELECT sum(c.o * ({il2("c.o * g.n")}
                            - {il2("mx.cx * my.cy")}))::BIGINT AS mi_fix
          FROM c JOIN mx USING (xk) JOIN my USING (yk) CROSS JOIN g
        ),
        hy AS (
          SELECT sum(cy * ({il2("g.n")} - {il2("cy")}))::BIGINT AS hy_fix
          FROM my CROSS JOIN g
        )
        SELECT g.n,
               (SELECT count(*) FROM mx)::BIGINT AS x_card,
               (SELECT count(*) FROM my)::BIGINT AS y_card,
               mi.mi_fix, hy.hy_fix,
               CASE WHEN hy.hy_fix = 0 THEN 0
                    WHEN mi.mi_fix >= 0
                        THEN (mi.mi_fix::HUGEINT * 1000000
                              // hy.hy_fix)::BIGINT
                    ELSE -((-mi.mi_fix::HUGEINT) * 1000000
                           // hy.hy_fix)::BIGINT
               END AS u_ppm
        FROM g, mi, hy"""


# ---------------------------------------------------------------------------
# CART decision-stump split curve (Gini)
# ---------------------------------------------------------------------------


def gini_split(ds, *, value_col: str, label_col: str,
               num_buckets: int = 8):
    """Exact Gini-impurity split curve of a bounded-support integer
    feature against a 0/1 label — the CART decision stump (Breiman et
    al.), the supervised companion to :func:`pr_curve`: pr_curve scores
    a feature USED AS the classifier, the stump curve scores every
    binary split ``v ≤ t`` by how much class impurity it removes, which
    is the number a feature-selection pass or a shallow-tree curation
    rule actually consumes.

    Exact contract, per distinct threshold t (left = v ≤ t, nR > 0 —
    the proper splits only), from cumulative counts nL, pL and
    complements nR, pR over total n, P:

        child_ppm  = (2·pL·(nL−pL)·nR + 2·pR·(nR−pR)·nL)·10⁶
                         // (n·nL·nR)
        parent_ppm = 2·P·(n−P)·10⁶ // n²
        gain_ppm   = parent_ppm − child_ppm        (≥ 0: Gini concavity
                     survives the shared one-floor-each convention)

    — the two-class Gini 2p(1−p) over the common denominator n·nL·nR,
    ONE floor per threshold, so argmax-by-gain with a smallest-t
    tie-break is engine-independent. Bounded-support contract of
    :func:`numeric_profile` (quantize first — the engine-wide
    convention).

    Scale shape: per-batch (value, n, n_pos) Arrow partials, ONE
    value-keyed fold, driver cumsum walk in Python ints. Output
    ``(threshold, n_le, pos_le, child_gini_ppm, gain_ppm)`` ascending;
    empty / single-value inputs → typed empty (no proper split).
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([value_col, label_col]).group_by(
            [value_col]).aggregate([([], "count_all"),
                                    (label_col, "sum")])
        out = {"v": g.column(value_col)}
        for nm in g.column_names:
            if nm.endswith("count_all"):
                out["n"] = g.column(nm).cast(pa.int64())
            elif nm.endswith("sum"):
                out["pos"] = g.column(nm).cast(pa.int64())
        return pa.table(out)

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["v"], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("v").reset_index(drop=True)

    empty = pd.DataFrame({
        "threshold": pd.Series([], dtype="int64"),
        "n_le": pd.Series([], dtype="int64"),
        "pos_le": pd.Series([], dtype="int64"),
        "child_gini_ppm": pd.Series([], dtype="int64"),
        "gain_ppm": pd.Series([], dtype="int64"),
    })
    if len(folded) < 2:
        return empty
    n = int(folded["n"].sum())
    p = int(folded["pos"].sum())
    parent = 2 * p * (n - p) * 1_000_000 // (n * n)
    rows = []
    nl = pl = 0
    for r in folded.itertuples(index=False):
        nl += int(r.n)
        pl += int(r.pos)
        nr = n - nl
        if nr == 0:
            break
        pr = p - pl
        child = ((2 * pl * (nl - pl) * nr + 2 * pr * (nr - pr) * nl)
                 * 1_000_000 // (n * nl * nr))
        rows.append((int(r.v), nl, pl, child, parent - child))
    out = pd.DataFrame(rows, columns=[
        "threshold", "n_le", "pos_le", "child_gini_ppm", "gain_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def gini_split_sql(*, table_expr: str, value: str, label: str) -> str:
    """SQL mirror: value-keyed count fold, ascending window cumsums,
    the identical common-denominator one-floor-per-threshold forms in
    HUGEINT."""
    return f"""
        WITH base AS (
          SELECT {value} AS v, {label} AS y FROM {table_expr}
        ),
        c AS (
          SELECT v, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
          FROM base GROUP BY 1
        ),
        g AS (SELECT sum(cnt)::HUGEINT AS n, sum(pos)::HUGEINT AS p
              FROM c),
        w AS (
          SELECT v,
                 sum(cnt) OVER (ORDER BY v)::HUGEINT AS nl,
                 sum(pos) OVER (ORDER BY v)::HUGEINT AS pl
          FROM c
        )
        SELECT v::BIGINT AS threshold, nl::BIGINT AS n_le,
               pl::BIGINT AS pos_le,
               ((2*pl*(nl-pl)*(n-nl) + 2*(p-pl)*((n-nl)-(p-pl))*nl)
                * 1000000 // (n * nl * (n-nl)))::BIGINT
                   AS child_gini_ppm,
               ((2*p*(n-p) * 1000000 // (n*n))
                - ((2*pl*(nl-pl)*(n-nl) + 2*(p-pl)*((n-nl)-(p-pl))*nl)
                   * 1000000 // (n * nl * (n-nl))))::BIGINT AS gain_ppm
        FROM w CROSS JOIN g
        WHERE nl < n AND (SELECT count(*) FROM c) >= 2
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# A/B experiment readout (two-proportion z / 2x2 chi-square)
# ---------------------------------------------------------------------------


def ab_lift(ds, *, unit_col: str, convert_col: str, salt: str = "",
            num_buckets: int = 32):
    """A/B experiment readout over a hash-randomized unit split — the
    two-proportion conversion comparison every growth/quality experiment
    reduces to, with the deterministic assignment the engine's
    hash_split convention provides: arm = ``md5_hash64(salt‖unit) % 2``
    ('a' on 0), a pure function of the data on any cluster shape (and
    of course the real use: the unit column IS the experiment
    assignment your logging wrote; the hash arm makes the op
    self-contained and A/A-testable).

    A unit converts if ANY of its rows has ``convert_col`` = 1 (the
    standard user-level conversion collapse). In exact integers:

        rate_ppm  = conv·10⁶ // n              (per arm)
        lift_ppm  = rate_b − rate_a            (signed)
        chi2_ppm  = n·(ad−bc)²·10⁶ // (n_a·n_b·C·NC)   (ONE floor;
                    a,b,c,d the 2×2 cells, C/NC the conversion
                    marginals; any zero marginal → 0 by contract —
                    the 2×2 closed form of cramers_v's statistic,
                    df = 1: ≥ 3.84·10⁶ ⇒ p < .05)

    Scale shape: per-batch (unit, any-convert) collapse partials, ONE
    unit-keyed max fold (the only exchange), arm assignment map-side
    from the hash, tiny 2-row arm fold, driver closed form in Python
    ints. Output one row ``(n_a, conv_a, rate_a_ppm, n_b, conv_b,
    rate_b_ppm, lift_ppm, chi2_ppm)``.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def collapse(t: pa.Table) -> pa.Table:
        g = t.select([unit_col, convert_col]).group_by(
            [unit_col]).aggregate([(convert_col, "max")])
        return g.rename_columns([unit_col, "conv"])

    units = bucketed_aggregate(
        ds.map_batches(collapse, batch_format="pyarrow"),
        [unit_col], {"conv": ("conv", "max")}, num_buckets=num_buckets,
    )

    def arm_partial(t: pa.Table) -> pa.Table:
        u = t.column(unit_col).to_numpy(zero_copy_only=False)
        conv = t.column("conv").to_numpy(zero_copy_only=False).astype(
            np.int64)
        arm = (md5_hash64([f"{salt}{v}" for v in u])
               % np.uint64(2)).astype(np.int64)
        n = np.bincount(arm, minlength=2)
        c = np.zeros(2, dtype=np.int64)
        np.add.at(c, arm, conv)
        return pa.table({"arm": pa.array(np.array([0, 1], dtype=np.int64)),
                         "n": pa.array(n.astype(np.int64)),
                         "conv": pa.array(c)})

    folded = bucketed_aggregate(
        units.map_batches(arm_partial, batch_format="pyarrow"),
        ["arm"], {"n": ("n", "sum"), "conv": ("conv", "sum")},
        num_buckets=2,
    ).to_pandas().set_index("arm")

    def get(arm):
        if arm in folded.index:
            return int(folded.loc[arm, "n"]), int(folded.loc[arm, "conv"])
        return 0, 0

    n_a, conv_a = get(0)
    n_b, conv_b = get(1)
    rate_a = conv_a * 1_000_000 // max(n_a, 1)
    rate_b = conv_b * 1_000_000 // max(n_b, 1)
    n = n_a + n_b
    c_tot = conv_a + conv_b
    nc_tot = n - c_tot
    det = conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b
    denom = n_a * n_b * c_tot * nc_tot
    chi2 = n * det * det * 1_000_000 // denom if denom > 0 else 0
    return pd.DataFrame({
        "n_a": pd.Series([n_a], dtype="int64"),
        "conv_a": pd.Series([conv_a], dtype="int64"),
        "rate_a_ppm": pd.Series([rate_a], dtype="int64"),
        "n_b": pd.Series([n_b], dtype="int64"),
        "conv_b": pd.Series([conv_b], dtype="int64"),
        "rate_b_ppm": pd.Series([rate_b], dtype="int64"),
        "lift_ppm": pd.Series([rate_b - rate_a], dtype="int64"),
        "chi2_ppm": pd.Series([chi2], dtype="int64"),
    })


def ab_lift_sql(*, table_expr: str, unit: str, convert: str,
                salt: str = "") -> str:
    """SQL mirror: unit-level max collapse, md5_number_upper % 2 arm,
    FILTER-counted 2×2, the identical one-floor HUGEINT closed form."""
    return f"""
        WITH u AS (
          SELECT {unit} AS unit, max({convert})::BIGINT AS conv
          FROM {table_expr} GROUP BY 1
        ),
        arms AS (
          SELECT CASE WHEN md5_number_upper(
                     '{salt}' || unit::VARCHAR) % 2 = 0
                 THEN 0 ELSE 1 END AS arm, conv
          FROM u
        ),
        c AS (
          SELECT count(*) FILTER (WHERE arm = 0)::BIGINT AS n_a,
                 sum(conv) FILTER (WHERE arm = 0)::BIGINT AS conv_a,
                 count(*) FILTER (WHERE arm = 1)::BIGINT AS n_b,
                 sum(conv) FILTER (WHERE arm = 1)::BIGINT AS conv_b
          FROM arms
        )
        SELECT coalesce(n_a, 0) AS n_a, coalesce(conv_a, 0) AS conv_a,
               (coalesce(conv_a, 0) * 1000000
                // greatest(coalesce(n_a, 0), 1))::BIGINT AS rate_a_ppm,
               coalesce(n_b, 0) AS n_b, coalesce(conv_b, 0) AS conv_b,
               (coalesce(conv_b, 0) * 1000000
                // greatest(coalesce(n_b, 0), 1))::BIGINT AS rate_b_ppm,
               ((coalesce(conv_b, 0) * 1000000
                 // greatest(coalesce(n_b, 0), 1))
                - (coalesce(conv_a, 0) * 1000000
                   // greatest(coalesce(n_a, 0), 1)))::BIGINT AS lift_ppm,
               CASE WHEN coalesce(n_a, 0) * coalesce(n_b, 0)
                         * (coalesce(conv_a, 0) + coalesce(conv_b, 0))
                         * (coalesce(n_a, 0) + coalesce(n_b, 0)
                            - coalesce(conv_a, 0) - coalesce(conv_b, 0))
                         > 0
                 THEN ((coalesce(n_a, 0) + coalesce(n_b, 0))::HUGEINT
                       * (coalesce(conv_a, 0)
                          * (coalesce(n_b, 0) - coalesce(conv_b, 0))
                          - (coalesce(n_a, 0) - coalesce(conv_a, 0))
                            * coalesce(conv_b, 0))
                       * (coalesce(conv_a, 0)
                          * (coalesce(n_b, 0) - coalesce(conv_b, 0))
                          - (coalesce(n_a, 0) - coalesce(conv_a, 0))
                            * coalesce(conv_b, 0))
                       * 1000000
                       // (coalesce(n_a, 0)::HUGEINT * coalesce(n_b, 0)
                           * (coalesce(conv_a, 0) + coalesce(conv_b, 0))
                           * (coalesce(n_a, 0) + coalesce(n_b, 0)
                              - coalesce(conv_a, 0)
                              - coalesce(conv_b, 0))))::BIGINT
                 ELSE 0 END AS chi2_ppm
        FROM c"""


# ---------------------------------------------------------------------------
# cumulative gains table (model-targeting deciles)
# ---------------------------------------------------------------------------


def gains_table(ds, *, score_col: str, label_col: str,
                num_buckets: int = 8):
    """Cumulative gains / lift table at score-desc deciles — the
    model-targeting readout ("contacting the top 20% by score reaches
    X% of all converters at Y× random"), the marketing-science sibling
    of :func:`pr_curve`. Tie-order-proof by construction: deciles are
    realized at DISTINCT-SCORE boundaries — for decile d with nominal
    cutoff ``c_d = d·n // 10``, the reported row is the smallest
    desc-cumulative count ``n_ge ≥ c_d`` (ties inflate the realized
    bucket rather than splitting a score value across deciles, so no
    per-row tie-break leaks in). In exact integers:

        gain_ppm = tp·10⁶ // P            (share of all positives)
        lift_ppm = tp·n·10⁶ // (P·n_ge)   (vs random targeting; 10⁶ =
                                           exactly random)

    Bounded-support contract of :func:`pr_curve` (quantize scores
    first). No positives → typed empty, by the pr_curve contract.

    Scale shape: the pr_curve fold verbatim — per-batch (score, n,
    n_pos) partials, ONE score-keyed fold — then a 10-row driver walk.
    Output ``(decile, cutoff_rank, n_ge, tp, gain_ppm, lift_ppm)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([score_col, label_col]).group_by(
            [score_col]).aggregate([([], "count_all"),
                                    (label_col, "sum")])
        out = {"s": g.column(score_col)}
        for nm in g.column_names:
            if nm.endswith("count_all"):
                out["n"] = g.column(nm).cast(pa.int64())
            elif nm.endswith("sum"):
                out["n_pos"] = g.column(nm).cast(pa.int64())
        return pa.table(out)

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["s"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("s", ascending=False).reset_index(drop=True)

    empty = pd.DataFrame({c: pd.Series([], dtype="int64") for c in [
        "decile", "cutoff_rank", "n_ge", "tp", "gain_ppm", "lift_ppm"]})
    p = int(folded["n_pos"].sum()) if len(folded) else 0
    if p == 0:
        return empty
    n = int(folded["n"].sum())
    n_ge = folded["n"].astype("int64").cumsum().to_numpy()
    tp = folded["n_pos"].astype("int64").cumsum().to_numpy()
    rows = []
    for d in range(1, 11):
        cd = d * n // 10
        i = int(np.searchsorted(n_ge, cd))
        g, t_ = int(n_ge[i]), int(tp[i])
        rows.append((d, cd, g, t_, t_ * 1_000_000 // p,
                     t_ * n * 1_000_000 // (p * g)))
    out = pd.DataFrame(rows, columns=[
        "decile", "cutoff_rank", "n_ge", "tp", "gain_ppm", "lift_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def gains_table_sql(*, table_expr: str, score: str, label: str) -> str:
    """SQL mirror: desc window cumsums over the distinct-score support,
    generate_series decile cutoffs joined to the smallest n_ge ≥ c_d,
    identical exact-integer gain/lift forms; empty when no positives."""
    return f"""
        WITH base AS (
          SELECT {score} AS s, {label} AS y FROM {table_expr}
        ),
        c AS (
          SELECT s, count(*)::BIGINT AS cnt, sum(y)::BIGINT AS pos
          FROM base GROUP BY 1
        ),
        g AS (SELECT sum(cnt)::BIGINT AS n, sum(pos)::BIGINT AS p
              FROM c),
        w AS (
          SELECT s,
                 sum(cnt) OVER (ORDER BY s DESC)::BIGINT AS n_ge,
                 sum(pos) OVER (ORDER BY s DESC)::BIGINT AS tp
          FROM c
        ),
        d AS (
          SELECT t.d, (t.d * g.n) // 10 AS cd
          FROM generate_series(1, 10) t(d) CROSS JOIN g
        ),
        pick AS (
          SELECT d.d, d.cd, min(w.n_ge) AS n_ge
          FROM d JOIN w ON w.n_ge >= d.cd
          GROUP BY 1, 2
        )
        SELECT pick.d::BIGINT AS decile, pick.cd::BIGINT AS cutoff_rank,
               pick.n_ge::BIGINT AS n_ge, w.tp,
               (w.tp::HUGEINT * 1000000 // g.p)::BIGINT AS gain_ppm,
               (w.tp::HUGEINT * g.n * 1000000
                // (g.p * pick.n_ge))::BIGINT AS lift_ppm
        FROM pick JOIN w ON w.n_ge = pick.n_ge CROSS JOIN g
        WHERE g.p > 0
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# Brier score + Murphy decomposition
# ---------------------------------------------------------------------------


def brier_decomposition(ds, *, score_col: str, label_col: str,
                        num_bins: int = 10, scale: int = 1_000_000,
                        num_buckets: int = 8):
    """Brier score with the Murphy (1973) reliability / resolution /
    uncertainty decomposition — the one-row scorecard completing
    :func:`calibration_bins`' per-bin diagram: the Brier score says how
    good the probabilistic scorer is overall, REL says how much is lost
    to MIScalibration (fixable by recalibrating — exactly what
    :func:`isotonic_calibration` then repairs), RES says how much the
    scorer actually discriminates, UNC is the label base-rate floor no
    scorer can beat.

    Exact contract, all in per-mille² units ∈ [0, 10⁶]: scores quantize
    ONCE to ``s_m = s·1000 // scale`` ∈ [0, 1000] (the bound that keeps
    the distributed square-sum fold inside int64 out to ~9·10¹² rows —
    a raw-ppm square sum would overflow at 9·10⁶), bins by the
    calibration_bins edge rule on the milli score. With per-bin moments
    (n_k, P_k, S_k = Σs_m) and totals n, P:

        brier_pm2 = Σ (s_m − 1000·y)²              // n
        rel_pm2   = (Σ_k (S_k − 1000·P_k)² // n_k)  // n
        res_pm2   = (Σ_k 10⁶·(P_k·n − P·n_k)² // (n_k·n²)) // n
        unc_pm2   = 10⁶·P·(n−P) // n²

    — one floor per term plus one outer floor, order-free integer sums
    both engines replay (the true-rational identity brier = rel − res +
    unc holds up to the documented floor slack and the within-bin
    forecast spread). Negative scores raise; labels are 0/1.

    Scale shape: the calibration_bins histogram partials plus a
    square-sum lane — ≤ num_bins rows per batch, ONE tiny bin fold,
    Python-int driver finish. Output one row ``(n, n_pos, brier_pm2,
    rel_pm2, res_pm2, unc_pm2)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        if len(s) and s.min() < 0:
            raise ValueError("brier_decomposition: negative score "
                             "(contract: score in [0, scale])")
        sm = s * 1000 // scale
        b = np.minimum(sm * num_bins // 1000, num_bins - 1)
        n = np.bincount(b, minlength=num_bins)
        npos = np.zeros(num_bins, dtype=np.int64)
        np.add.at(npos, b, y)
        ssum = np.zeros(num_bins, dtype=np.int64)
        np.add.at(ssum, b, sm)
        sq = np.zeros(num_bins, dtype=np.int64)
        np.add.at(sq, b, (sm - 1000 * y) ** 2)
        keep = n > 0
        return pa.table({
            "bin": pa.array(np.arange(num_bins, dtype=np.int64)[keep]),
            "n": pa.array(n[keep].astype(np.int64)),
            "n_pos": pa.array(npos[keep]),
            "s_sum": pa.array(ssum[keep]),
            "sq_sum": pa.array(sq[keep]),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum"), "n_pos": ("n_pos", "sum"),
                  "s_sum": ("s_sum", "sum"), "sq_sum": ("sq_sum", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    n = int(folded["n"].sum())
    p = int(folded["n_pos"].sum())
    if n == 0:
        raise ValueError("brier_decomposition: empty input")
    brier = int(folded["sq_sum"].sum()) // n
    rel = sum((int(r.s_sum) - 1000 * int(r.n_pos)) ** 2 // int(r.n)
              for r in folded.itertuples(index=False)) // n
    res = sum(1_000_000 * (int(r.n_pos) * n - p * int(r.n)) ** 2
              // (int(r.n) * n * n)
              for r in folded.itertuples(index=False)) // n
    unc = 1_000_000 * p * (n - p) // (n * n)
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "n_pos": pd.Series([p], dtype="int64"),
        "brier_pm2": pd.Series([brier], dtype="int64"),
        "rel_pm2": pd.Series([rel], dtype="int64"),
        "res_pm2": pd.Series([res], dtype="int64"),
        "unc_pm2": pd.Series([unc], dtype="int64"),
    })


def brier_decomposition_sql(*, table_expr: str, score: str, label: str,
                            num_bins: int = 10,
                            scale: int = 1_000_000) -> str:
    """SQL mirror: the identical milli quantization, bin-edge rule, and
    one-floor-per-term HUGEINT sums."""
    return f"""
        WITH b AS (
          SELECT ({score}) * 1000 // {scale} AS sm,
                 least((({score}) * 1000 // {scale}) * {num_bins} // 1000,
                       {num_bins} - 1) AS bin,
                 {label} AS y
          FROM {table_expr}
        ),
        c AS (
          SELECT bin, count(*)::HUGEINT AS nk, sum(y)::HUGEINT AS pk,
                 sum(sm)::HUGEINT AS sk,
                 sum((sm - 1000 * y) * (sm - 1000 * y))::HUGEINT AS sqk
          FROM b GROUP BY 1
        ),
        g AS (SELECT sum(nk) AS n, sum(pk) AS p FROM c)
        SELECT n::BIGINT AS n, p::BIGINT AS n_pos,
               ((SELECT sum(sqk) FROM c) // n)::BIGINT AS brier_pm2,
               ((SELECT sum((sk - 1000 * pk) * (sk - 1000 * pk) // nk)
                 FROM c) // n)::BIGINT AS rel_pm2,
               ((SELECT sum(1000000 * (pk * g.n - g.p * nk)
                            * (pk * g.n - g.p * nk)
                            // (nk * g.n * g.n))
                 FROM c, g) // n)::BIGINT AS res_pm2,
               (1000000 * p * (n - p) // (n * n))::BIGINT AS unc_pm2
        FROM g"""


# ---------------------------------------------------------------------------
# disparate impact (four-fifths rule)
# ---------------------------------------------------------------------------


def disparate_impact(ds, *, group_col: str, flag_col: str,
                     num_buckets: int = 8):
    """Disparate-impact audit of a binary pass/keep decision across
    groups — the EEOC four-fifths rule applied to corpus curation
    (a quality gate whose keep-rate for one language or feed is under
    80% of the most-kept group's rate is materially reshaping the
    mixture toward that group; the number to read BEFORE shipping a
    rule battery corpus-wide, beside :func:`theils_u`'s association
    view).

    Exact contract: per group ``rate_ppm = pos·10⁶ // n``; the
    reference rate is the MAX group rate (a value, so no tie-break
    needed); ``di_ppm = rate·10⁶ // ref_rate`` (all groups 0 when the
    reference is 0), ``below_80pct = 1`` iff di_ppm < 800 000.

    Scale shape: per-batch Arrow (group, n, pos) partials, ONE
    audit-sized group fold, driver ratio walk. Output ``(group, n,
    n_pos, rate_ppm, di_ppm, below_80pct)`` sorted by group.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, flag_col]).group_by(
            [group_col]).aggregate([([], "count_all"),
                                    (flag_col, "sum")])
        out = {group_col: g.column(group_col)}
        for nm in g.column_names:
            if nm.endswith("count_all"):
                out["n"] = g.column(nm).cast(pa.int64())
            elif nm.endswith("sum"):
                out["pos"] = g.column(nm).cast(pa.int64())
        return pa.table(out)

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], {"n": ("n", "sum"), "pos": ("pos", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values(group_col).reset_index(drop=True)

    nn = folded["n"].astype("int64").to_numpy()
    pos = folded["pos"].astype("int64").to_numpy()
    rate = pos * 1_000_000 // np.maximum(nn, 1)
    ref = int(rate.max()) if len(rate) else 0
    di = (rate * 1_000_000 // ref if ref > 0
          else np.zeros(len(rate), dtype=np.int64))
    return pd.DataFrame({
        group_col: folded[group_col],
        "n": pd.Series(nn, dtype="int64"),
        "n_pos": pd.Series(pos, dtype="int64"),
        "rate_ppm": pd.Series(rate, dtype="int64"),
        "di_ppm": pd.Series(di, dtype="int64"),
        "below_80pct": pd.Series(
            (di < 800_000).astype(np.int64), dtype="int64"),
    })


def disparate_impact_sql(*, table_expr: str, group: str,
                         flag: str) -> str:
    """SQL mirror: group fold + cross-joined max rate, identical floor
    ratios and the 800 000 ppm threshold."""
    return f"""
        WITH c AS (
          SELECT {group} AS grp, count(*)::BIGINT AS n,
                 sum({flag})::BIGINT AS pos
          FROM {table_expr} GROUP BY 1
        ),
        r AS (
          SELECT grp, n, pos,
                 (pos::HUGEINT * 1000000 // greatest(n, 1))::BIGINT
                     AS rate_ppm
          FROM c
        ),
        m AS (SELECT max(rate_ppm) AS ref FROM r)
        SELECT r.grp AS {group}, r.n, r.pos AS n_pos, r.rate_ppm,
               CASE WHEN m.ref > 0
                    THEN (r.rate_ppm::HUGEINT * 1000000
                          // m.ref)::BIGINT
                    ELSE 0 END AS di_ppm,
               CASE WHEN (CASE WHEN m.ref > 0
                          THEN (r.rate_ppm::HUGEINT * 1000000
                                // m.ref)::BIGINT
                          ELSE 0 END) < 800000
                    THEN 1 ELSE 0 END::BIGINT AS below_80pct
        FROM r CROSS JOIN m
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# Mann–Whitney U rank-sum test (group vs rest, tie-corrected, exact ppm)


def mann_whitney(ds, *, group_col: str, value_col: str,
                 num_buckets: int = 16):
    """Per-group Mann–Whitney U rank-sum test against the REST of the
    corpus, in exact integers — the RANK companion to
    :func:`grouped_ks`'s sup-norm and :func:`grouped_emd`'s W1: KS asks
    "is there a separating threshold", W1 asks "how far did mass move",
    MWU asks the stochastic-dominance question "does a random doc from
    this group tend to have a LARGER value than a random doc from
    everywhere else" — the test a length/quality slice audit reaches
    for when the distributions are skewed and a t-test's mean is the
    wrong summary. Group-vs-rest (not vs corpus) for the same reason as
    grouped_ks: a dominant group vs a mixture of itself reads calm.

    Exact-integer convention (no halves, no sqrt): the DOUBLED
    U statistic ``u2 = 2·#(g > rest pairs) + #(ties)`` — so tie halves
    stay integral — then

    - ``rank_biserial_ppm`` = (u2 − n_g·n_r)·10⁶ / (n_g·n_r), the
      signed effect size in [−10⁶, 10⁶] (sign-split truncating
      division, the engine-wide toward-zero convention): +10⁶ = every
      group value beats every rest value.
    - ``z2_ppm`` = the SQUARED tie-corrected normal deviate, kept
      rational by clearing the classical variance of its fractions:

        ``z² = 3·n·(n−1)·(u2 − n_g·n_r)²
               / (n_g·n_r·((n³−n) − Σ_v(t_v³−t_v)))``

      with t_v the combined tie counts (the combined sample of group
      ∪ rest IS the corpus, so t_v is the corpus support histogram);
      one floor to ppm. ≥ ~3.84e6 ⇒ significant at 5% under the
      normal approximation. All-tied support (denominator 0) and a
      group that is the whole corpus report 0 by contract.

    Scale shape (grouped_ks posture): ONE (group, value) count fold
    under the bounded-support contract, then a driver walk over
    |groups|·|support| rows in Python ints (u2 ~ n_g·n_r passes int64
    at ~4·10⁹ rows; the mirror runs HUGEINT). Output
    ``(group_col, n_rows, u2, rank_biserial_ppm, z2_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key=value_col,
    ).to_pandas()

    support = np.sort(folded[value_col].unique())
    corpus = (folded.groupby(value_col)["c"].sum()
              .reindex(support, fill_value=0).to_numpy())
    n = int(corpus.sum()) if len(corpus) else 0
    cum_all = np.cumsum(corpus.astype(object))
    tie_term = sum(int(t) ** 3 - int(t) for t in corpus)
    rows = []
    for grp, sub in folded.groupby(group_col, sort=True):
        cg = (sub.set_index(value_col)["c"]
              .reindex(support, fill_value=0).to_numpy())
        cum_g = np.cumsum(cg.astype(object))
        n_g = int(cum_g[-1])
        n_r = n - n_g
        u2 = 0
        for i in range(len(support)):
            cgi = int(cg[i])
            if not cgi:
                continue
            cri = int(corpus[i]) - cgi
            cum_r_lt = (int(cum_all[i]) - int(corpus[i])) \
                - (int(cum_g[i]) - cgi)
            u2 += cgi * (2 * cum_r_lt + cri)
        den = n_g * n_r
        diff = u2 - den
        if den:
            rb = (-((-diff) * 1_000_000 // den) if diff < 0
                  else diff * 1_000_000 // den)
        else:
            rb = 0
        vden = den * ((n ** 3 - n) - tie_term)
        z2 = (3 * n * (n - 1) * diff * diff * 1_000_000 // vden
              if vden else 0)
        rows.append((grp, n_g, u2, rb, z2))
    out = pd.DataFrame(rows, columns=[group_col, "n_rows", "u2",
                                      "rank_biserial_ppm", "z2_ppm"])
    for c in ("n_rows", "u2", "rank_biserial_ppm", "z2_ppm"):
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def mann_whitney_sql(*, table: str, group: str, value_expr: str) -> str:
    """SQL mirror: groups × support grid, window cumsums, HUGEINT u2
    fold, CASE-signed effect division, one-floor z²."""
    return f"""
        WITH g AS (
          SELECT {group} AS grp, {value_expr} AS v, count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        support AS (SELECT DISTINCT v FROM g),
        tot AS (SELECT grp, sum(c)::BIGINT AS n_g FROM g GROUP BY 1),
        big AS (SELECT sum(c)::HUGEINT AS n FROM g),
        allv AS (SELECT v, sum(c)::HUGEINT AS ca FROM g GROUP BY 1),
        ca AS (
          SELECT v, ca, sum(ca) OVER (ORDER BY v)::HUGEINT AS cum_all
          FROM allv
        ),
        tie AS (SELECT sum(ca * ca * ca - ca)::HUGEINT AS tt FROM allv),
        grid AS (
          SELECT t.grp, t.n_g, s.v, coalesce(g.c, 0)::HUGEINT AS cgv,
                 sum(coalesce(g.c, 0)) OVER (
                   PARTITION BY t.grp ORDER BY s.v)::HUGEINT AS cum_g
          FROM tot t CROSS JOIN support s
          LEFT JOIN g ON g.grp = t.grp AND g.v = s.v
        ),
        u AS (
          SELECT grid.grp, grid.n_g,
                 sum(grid.cgv
                     * (2 * ((ca.cum_all - ca.ca)
                             - (grid.cum_g - grid.cgv))
                        + (ca.ca - grid.cgv)))::HUGEINT AS u2
          FROM grid JOIN ca USING (v)
          GROUP BY 1, 2
        )
        SELECT u.grp AS {group}, u.n_g AS n_rows, u.u2::BIGINT AS u2,
               CASE WHEN u.n_g * (big.n - u.n_g) = 0 THEN 0
                    WHEN u.u2 < u.n_g * (big.n - u.n_g)
                    THEN -(((u.n_g * (big.n - u.n_g) - u.u2) * 1000000)
                           // (u.n_g * (big.n - u.n_g)))
                    ELSE ((u.u2 - u.n_g * (big.n - u.n_g)) * 1000000)
                         // (u.n_g * (big.n - u.n_g))
               END::BIGINT AS rank_biserial_ppm,
               CASE WHEN u.n_g * (big.n - u.n_g)
                         * ((big.n * big.n * big.n - big.n) - tie.tt) = 0
                    THEN 0
                    ELSE (3 * big.n * (big.n - 1)
                          * (u.u2 - u.n_g * (big.n - u.n_g))
                          * (u.u2 - u.n_g * (big.n - u.n_g)) * 1000000)
                         // (u.n_g * (big.n - u.n_g)
                             * ((big.n * big.n * big.n - big.n) - tie.tt))
               END::BIGINT AS z2_ppm
        FROM u, big, tie
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# McNemar's paired-classifier test


def mcnemar(ds, *, a_col: str, b_col: str):
    """McNemar's test over two PAIRED binary correctness indicators —
    the eval-suite primitive for "is classifier A actually better than
    classifier B on the SAME documents": marginal accuracies can differ
    by luck on the agree cells; only the DISAGREE cells carry evidence,
    and McNemar reads exactly those. b = #(A right, B wrong),
    c = #(A wrong, B right); ``chi2_ppm = (b−c)²·10⁶ // (b+c)``
    (df = 1, no continuity correction — documented; ≥ ~3.84e6 ⇒ 5%
    significance), 0 when b + c = 0 (the classifiers never disagree —
    no evidence either way). Marginal accuracies ride along in exact
    ppm so the direction of a significant result is readable in place.

    Scale shape: a stateless per-batch 2×2 collapse (four int64
    counters per batch), ONE tiny 1-row fold, Python-int finish —
    nothing row-sized crosses the cluster. Output one row:
    ``(n_pairs, n_a_only, n_b_only, acc_a_ppm, acc_b_ppm, chi2_ppm)``."""
    import ray.data

    def partial(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = batch.column(b_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(a)], type=pa.int64()),
            "na": pa.array([int(a.sum())], type=pa.int64()),
            "nb": pa.array([int(b.sum())], type=pa.int64()),
            "n_a_only": pa.array([int((a * (1 - b)).sum())],
                                 type=pa.int64()),
            "n_b_only": pa.array([int(((1 - a) * b).sum())],
                                 type=pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n", "na", "nb", "n_a_only", "n_b_only"])
    if agg is None or agg.get("sum(n)") is None:
        # Zero-block input: Ray's sum() yields None; match the SQL
        # mirror's typed zero row instead of raising TypeError.
        agg = {k: 0 for k in ("sum(n)", "sum(na)", "sum(nb)",
                              "sum(n_a_only)", "sum(n_b_only)")}
    n = int(agg["sum(n)"]); na = int(agg["sum(na)"])
    nb = int(agg["sum(nb)"])
    b_ = int(agg["sum(n_a_only)"]); c_ = int(agg["sum(n_b_only)"])
    chi2 = ((b_ - c_) * (b_ - c_) * 1_000_000 // (b_ + c_)
            if b_ + c_ else 0)
    out = pd.DataFrame({
        "n_pairs": [n],
        "n_a_only": [b_],
        "n_b_only": [c_],
        "acc_a_ppm": [na * 1_000_000 // n if n else 0],
        "acc_b_ppm": [nb * 1_000_000 // n if n else 0],
        "chi2_ppm": [chi2],
    }).astype("int64")
    return ray.data.from_pandas(out)


def mcnemar_sql(*, pairs_expr: str) -> str:
    """SQL mirror over a derived table exposing int columns a, b
    (the paired correctness indicators)."""
    return f"""
        WITH p AS ({pairs_expr}),
        t AS (
          SELECT count(*)::BIGINT AS n,
                 sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb,
                 sum(a * (1 - b))::BIGINT AS n_a_only,
                 sum((1 - a) * b)::BIGINT AS n_b_only
          FROM p
        )
        SELECT n AS n_pairs, n_a_only, n_b_only,
               CASE WHEN n = 0 THEN 0
                    ELSE na * 1000000 // n END::BIGINT AS acc_a_ppm,
               CASE WHEN n = 0 THEN 0
                    ELSE nb * 1000000 // n END::BIGINT AS acc_b_ppm,
               CASE WHEN n_a_only + n_b_only = 0 THEN 0
                    ELSE ((n_a_only - n_b_only)::HUGEINT
                          * (n_a_only - n_b_only) * 1000000)
                         // (n_a_only + n_b_only)
               END::BIGINT AS chi2_ppm
        FROM t"""


# ---------------------------------------------------------------------------
# Kruskal–Wallis k-group rank test


def kruskal_wallis(ds, *, group_col: str, value_col: str,
                   num_buckets: int = 16):
    """Kruskal–Wallis H over ALL groups at once — the k-group
    generalization of :func:`mann_whitney`: one scalar answering "does
    ANY group's value distribution sit higher or lower than the
    others" before k per-group tests are read (the omnibus gate that
    controls the multiple-comparison temptation). Significant at 5%
    when ``h_ppm`` exceeds the χ²(k−1) critical value ·10⁶ (5.99e6 at
    k = 3, 9.49e6 at k = 5).

    Exact-integer convention: DOUBLED mid-ranks (ties averaged —
    doubling keeps the half-integers integral, the spearman_rho trick):
    a value v with t_v ties starting after cum(<v) prior rows has
    doubled rank ``2·cum(<v) + t_v + 1``, so the per-group doubled rank
    sum is ``DR_g = Σ_v c_g(v)·(2·cum_all(v) − t_v + 1)`` and
    ``Σ_g DR_g = n(n+1)`` exactly (pinned in tests). The tie-corrected
    statistic, cleared of fractions:

        ``H = 3(n−1)·(Σ_g DR_g²/n_g − n(n+1)²) / ((n³−n) − Σ(t³−t))``

    with ONE floor per group (``DR_g² // n_g`` — the theils_u/psi
    sum-of-floored-terms trade: order-free and engine-independent, at
    the cost of ≤ (k−1) absolute slack in the numerator, negligible at
    ppm scale) and one outer floor to ppm. A floored numerator that
    dips ≤ 0 (possible only via that slack on near-constant data) and
    an all-tied support (denominator 0) both report 0 — true H ≥ 0.

    Scale shape: the mann_whitney fold verbatim — ONE bounded
    (group, value) count fold, driver walk in Python ints. Output one
    row ``(n_rows, n_groups, h_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, value_col], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key=value_col,
    ).to_pandas()

    support = np.sort(folded[value_col].unique())
    corpus = (folded.groupby(value_col)["c"].sum()
              .reindex(support, fill_value=0).to_numpy())
    n = int(corpus.sum()) if len(corpus) else 0
    cum_all = np.cumsum(corpus.astype(object))
    tie_term = sum(int(t) ** 3 - int(t) for t in corpus)
    qsum = 0
    n_groups = 0
    for grp, sub in folded.groupby(group_col, sort=True):
        cg = (sub.set_index(value_col)["c"]
              .reindex(support, fill_value=0).to_numpy())
        n_g = int(cg.sum())
        dr = sum(int(cg[i]) * (2 * int(cum_all[i]) - int(corpus[i]) + 1)
                 for i in range(len(support)) if cg[i])
        qsum += dr * dr // n_g
        n_groups += 1
    den = (n ** 3 - n) - tie_term
    num = qsum - n * (n + 1) ** 2
    h = (3 * (n - 1) * num * 1_000_000 // den
         if den > 0 and num > 0 else 0)
    out = pd.DataFrame({"n_rows": [n], "n_groups": [n_groups],
                        "h_ppm": [h]}).astype("int64")
    return ray.data.from_pandas(out)


def kruskal_wallis_sql(*, table: str, group: str, value_expr: str) -> str:
    """SQL mirror: the mann_whitney grid with doubled mid-ranks, one
    HUGEINT floor per group, one outer floor."""
    return f"""
        WITH g AS (
          SELECT {group} AS grp, {value_expr} AS v, count(*)::BIGINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        allv AS (SELECT v, sum(c)::HUGEINT AS ca FROM g GROUP BY 1),
        ca AS (
          SELECT v, ca, sum(ca) OVER (ORDER BY v)::HUGEINT AS cum_all
          FROM allv
        ),
        big AS (
          SELECT sum(ca)::HUGEINT AS n,
                 sum(ca * ca * ca - ca)::HUGEINT AS tt
          FROM allv
        ),
        dr AS (
          SELECT g.grp, sum(g.c)::HUGEINT AS n_g,
                 sum(g.c * (2 * ca.cum_all - ca.ca + 1))::HUGEINT AS d
          FROM g JOIN ca USING (v) GROUP BY 1
        ),
        q AS (
          SELECT count(*)::BIGINT AS n_groups,
                 sum(d * d // n_g)::HUGEINT AS qsum
          FROM dr
        )
        SELECT big.n::BIGINT AS n_rows, q.n_groups,
               CASE WHEN (big.n * big.n * big.n - big.n) - big.tt > 0
                     AND q.qsum - big.n * (big.n + 1) * (big.n + 1) > 0
                    THEN (3 * (big.n - 1)
                          * (q.qsum - big.n * (big.n + 1) * (big.n + 1))
                          * 1000000)
                         // ((big.n * big.n * big.n - big.n) - big.tt)
                    ELSE 0 END::BIGINT AS h_ppm
        FROM q, big"""


# ---------------------------------------------------------------------------
# Cochran's Q (k paired binary treatments)


def cochrans_q(ds, *, cols):
    """Cochran's Q over k PAIRED binary columns — the k-treatment
    generalization of :func:`mcnemar` (k = 2 reduces to McNemar's
    χ² without continuity correction): do k keep-rules / classifiers
    applied to the SAME rows differ in pass rate, read only from the
    rows where they disagree? The omnibus gate before k·(k−1)/2
    pairwise McNemars. Significant at 5% when ``q_ppm`` exceeds
    χ²(k−1)·10⁶.

    Fully integer closed form (cleared of the mean fractions):

        ``Q = (k−1)·(k·ΣC_j² − S²)·10⁶ // (k·S − ΣR_i²)``

    with C_j the per-column success totals, S = ΣC_j, R_i the per-row
    success counts. Numerator ≥ 0 by Cauchy–Schwarz; denominator = 0
    exactly when every row is unanimous (all k agree) — no disagree
    evidence — reported 0 by the mcnemar contract. ONE floor.

    Scale shape: stateless per-batch fold to k+2 scalars (column sums,
    Σrow², n), ONE 1-row fold, Python-int finish. Output one row:
    ``n_rows``, one ``n_<col>`` total per input column, ``q_ppm``."""
    import ray.data

    cols = list(cols)
    k = len(cols)

    def partial(batch: pa.Table) -> pa.Table:
        mats = [batch.column(c).cast(pa.int64()).to_numpy(
            zero_copy_only=False) for c in cols]
        r = np.zeros(len(batch), dtype=np.int64)
        out = {"n": pa.array([len(batch)], type=pa.int64())}
        for c, v in zip(cols, mats):
            out[f"n_{c}"] = pa.array([int(v.sum())], type=pa.int64())
            r += v
        out["r2"] = pa.array([int((r * r).sum())], type=pa.int64())
        return pa.table(out)

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n"] + [f"n_{c}" for c in cols] + ["r2"])
    if agg is None or agg.get("sum(n)") is None:
        # Zero-block input (mcnemar's guard): typed zero row, no crash.
        agg = {f"sum({k_})": 0
               for k_ in ["n"] + [f"n_{c}" for c in cols] + ["r2"]}
    n = int(agg["sum(n)"])
    cj = [int(agg[f"sum(n_{c})"]) for c in cols]
    r2 = int(agg["sum(r2)"])
    s = sum(cj)
    den = k * s - r2
    num = k * sum(c * c for c in cj) - s * s
    q = (k - 1) * num * 1_000_000 // den if den else 0
    out = pd.DataFrame(
        {"n_rows": [n], **{f"n_{c}": [v] for c, v in zip(cols, cj)},
         "q_ppm": [q]}).astype("int64")
    return ray.data.from_pandas(out)


def cochrans_q_sql(*, rows_expr: str, cols) -> str:
    """SQL mirror over a derived table exposing the k int indicator
    columns named in ``cols``."""
    cols = list(cols)
    k = len(cols)
    csum = " + ".join(cols)
    totals = ", ".join(f"sum({c})::HUGEINT AS n_{c}" for c in cols)
    sq = " + ".join(f"n_{c} * n_{c}" for c in cols)
    stot = " + ".join(f"n_{c}" for c in cols)
    return f"""
        WITH p AS ({rows_expr}),
        t AS (
          SELECT count(*)::BIGINT AS n, {totals},
                 sum(({csum})::HUGEINT * ({csum}))::HUGEINT AS r2
          FROM p
        )
        SELECT n AS n_rows,
               {", ".join(f"n_{c}::BIGINT AS n_{c}" for c in cols)},
               CASE WHEN {k} * ({stot}) - r2 = 0 THEN 0
                    ELSE ({k - 1} * ({k} * ({sq}) - ({stot}) * ({stot}))
                          * 1000000) // ({k} * ({stot}) - r2)
               END::BIGINT AS q_ppm
        FROM t"""


# ---------------------------------------------------------------------------
# t-closeness (Li–Li–Venkatasubramanian, ICDE 2007)


def t_closeness(ds, *, qi_cols, sensitive_col: str, t_ppm: int = 200_000,
                num_buckets: int = 32):
    """Privacy audit, third leg after :func:`k_anonymity`'s k and
    distinct-l checks: t-CLOSENESS (Li et al., ICDE 2007) — a QI group
    can be large (k-safe) and diverse (l-safe) and still leak, when its
    SENSITIVE-value distribution sits far from the corpus's (the
    classic example: a group whose salaries are all in the bottom
    band). Flags every QI group whose ordered earth-mover's distance
    to the corpus distribution exceeds ``t``.

    Distance is Li et al.'s ordered-attribute EMD (equal-step ground
    distance over the corpus support of m distinct sensitive values),
    exact in integers over the common denominator:

        ``emd_ppm = Σ_{i<m} |cum_g(i)·N − cum_c(i)·n_g| · 10⁶
                    // (n_g · N · (m−1))``

    — ONE floor per group; m = 1 (constant sensitive column) reports 0.
    Output: violating groups only (``qi_cols + (group_size, emd_ppm)``
    with ``emd_ppm > t_ppm``) — the compliant mass never leaves the
    fold, keeping the result audit-sized at corpus scale.

    Scale shape: pass 1 folds the corpus sensitive histogram (bounded
    support — the grouped_ks contract) to a driver-side array; pass 2
    is the k_anonymity exchange — per-batch (QI, sensitive) count
    partials, ONE composite-QI-keyed bucket pass — with the corpus
    cumulative BROADCAST into the fold closure (shipped once per
    actor, never per row), where each group's support-aligned cumsum
    and |diff| fold run vectorized; only violating rows leave."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    qi = list(qi_cols)
    key_col = "_qi"

    def s_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([sensitive_col]).group_by(
            [sensitive_col]).aggregate([([], "count_all")])
        return g.rename_columns([sensitive_col, "n"])

    corpus = bucketed_aggregate(
        ds.map_batches(s_partial, batch_format="pyarrow"),
        [sensitive_col], {"n": ("n", "sum")},
        num_buckets=num_buckets, bucket_key=sensitive_col,
    ).to_pandas().sort_values(sensitive_col, ignore_index=True)
    support = corpus[sensitive_col].to_numpy()
    cum_c = np.cumsum(corpus["n"].to_numpy().astype(object))
    n_total = int(cum_c[-1]) if len(cum_c) else 0
    m = len(support)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(qi + [sensitive_col]).group_by(
            qi + [sensitive_col]).aggregate([([], "count_all")])
        g = g.rename_columns(qi + [sensitive_col, "n"])
        key = pc.cast(g.column(qi[0]), pa.string())
        for c in qi[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(g.column(c), pa.string()), "\x1f")
        return g.append_column(key_col, key)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {**{c: pd.Series([], dtype=df[c].dtype) for c in qi},
             "group_size": pd.Series([], dtype="int64"),
             "emd_ppm": pd.Series([], dtype="int64")})
        if not len(df) or m <= 1:
            return empty
        d = (df.groupby([key_col] + qi + [sensitive_col], sort=False,
                        as_index=False, observed=True)["n"].sum())
        rows = []
        for gkey, sub in d.groupby(key_col, sort=False):
            cg = np.zeros(m, dtype=object)
            idx = np.searchsorted(support,
                                  sub[sensitive_col].to_numpy())
            cg[idx] = sub["n"].to_numpy().astype(object)
            cum_g = np.cumsum(cg)
            n_g = int(cum_g[-1])
            num = int(np.abs(cum_g[:-1] * n_total
                             - cum_c[:-1] * n_g).sum())
            emd = num * 1_000_000 // (n_g * n_total * (m - 1))
            if emd > t_ppm:
                first = sub.iloc[0]
                rows.append(tuple(first[c] for c in qi) + (n_g, emd))
        if not rows:
            return empty
        out = pd.DataFrame(rows, columns=qi + ["group_size", "emd_ppm"])
        out["group_size"] = out["group_size"].astype("int64")
        out["emd_ppm"] = out["emd_ppm"].astype("int64")
        return out

    out = bucketed_map_groups(partials, key_col, fold,
                              num_buckets=num_buckets).to_pandas()
    if not len(out) or not len(out.columns):
        # typed-empty contract: an all-compliant corpus must still carry
        # the schema (an all-empty bucketed pass comes back schemaless);
        # qi dtypes come from the partials schema itself
        sch = partials.schema()
        types = dict(zip(sch.names, sch.types))
        qi_empty = pa.table(
            {c: pa.array([], type=types[c]) for c in qi}).to_pandas()
        out = qi_empty.assign(
            group_size=pd.Series([], dtype="int64"),
            emd_ppm=pd.Series([], dtype="int64"))
    # audit-sized result (violations only): returned as pandas — the
    # pr_curve posture — so the typed-empty schema survives (Ray drops
    # the schema of an all-empty block set on the pandas round trip)
    return out


def t_closeness_sql(*, table_expr: str, qi_exprs, sensitive: str,
                    t_ppm: int = 200_000) -> str:
    """SQL mirror: corpus support + cum, groups × support grid with
    window cumsums, HUGEINT |diff| fold, HAVING over the one floor."""
    sel = ", ".join(f"{e} AS {n}" for n, e in qi_exprs)
    names = ", ".join(n for n, _ in qi_exprs)
    gnames = ", ".join(f"g.{n}" for n, _ in qi_exprs)
    return f"""
        WITH base AS (
          SELECT {sel}, {sensitive} AS s FROM {table_expr}
        ),
        sup AS (
          SELECT s, count(*)::BIGINT AS c FROM base GROUP BY 1
        ),
        big AS (
          SELECT sum(c)::HUGEINT AS n, count(*)::BIGINT AS m FROM sup
        ),
        cc AS (
          SELECT s, sum(c) OVER (ORDER BY s)::HUGEINT AS cum_c,
                 row_number() OVER (ORDER BY s) AS i
          FROM sup
        ),
        gc AS (
          SELECT {names}, s, count(*)::BIGINT AS c
          FROM base GROUP BY ALL
        ),
        tot AS (
          SELECT {names}, sum(c)::HUGEINT AS n_g FROM gc GROUP BY ALL
        ),
        grid AS (
          SELECT t.*, cc.s, cc.cum_c, cc.i,
                 sum(coalesce(gc.c, 0)) OVER (
                   PARTITION BY {", ".join(f"t.{n}" for n, _ in qi_exprs)}
                   ORDER BY cc.s)::HUGEINT AS cum_g
          FROM tot t CROSS JOIN cc
          LEFT JOIN gc ON {" AND ".join(f"gc.{n} = t.{n}" for n, _ in qi_exprs)}
                       AND gc.s = cc.s
        )
        SELECT {names}, max(n_g)::BIGINT AS group_size,
               (sum(CASE WHEN i < big.m
                         THEN abs(cum_g * big.n - cum_c * n_g)
                         ELSE 0 END) * 1000000
                // (max(n_g) * big.n * (big.m - 1)))::BIGINT AS emd_ppm
        FROM grid, big
        GROUP BY {names}, big.n, big.m
        HAVING (sum(CASE WHEN i < big.m
                         THEN abs(cum_g * big.n - cum_c * n_g)
                         ELSE 0 END) * 1000000
                // (max(n_g) * big.n * (big.m - 1))) > {t_ppm}"""


# ---------------------------------------------------------------------------
# Friedman test (k treatments ranked within n blocks)


def friedman_test(ds, *, block_col: str, treatment_col: str,
                  value_col: str, num_buckets: int = 16):
    """Friedman's rank test over k treatments × n blocks — the ORDINAL
    member completing the engine's nonparametric family:
    :func:`cochrans_q` compares k paired BINARY rules,
    :func:`kruskal_wallis` compares k INDEPENDENT groups, Friedman
    compares k treatments measured on the SAME blocks (days, users,
    shards) by ranking within each block — the right test for "does
    the event-type mix keep the same ordering day after day" or "does
    scorer A consistently out-rank scorer B per document", where
    block-level magnitudes (busy vs quiet days) must cancel out.
    Significant at 5% when ``chi2_ppm`` exceeds χ²(k−1)·10⁶.

    Input: rows (block, treatment, value); values are summed per cell
    and MISSING cells are zero-filled against the global treatment set
    (a treatment unobserved in a block genuinely ranked last — the
    daily-count semantics), so every block is complete by construction.

    Exact-integer convention: DOUBLED mid-ranks within each block
    (``dr = 2·#smaller + #equal + 1``, the kruskal/spearman trick) and
    the tie-general statistic cleared of fractions:

        ``χ² = (k−1) · Σ_j (DR_j − n(k+1))²
               / (Σ_{ij} DR_ij² − n·k·(k+1)²)``

    with DR_j the per-treatment doubled rank sum — ONE floor to ppm.
    All-tied blocks everywhere (denominator 0) report 0; the identity
    ``Σ_j DR_j = n·k·(k+1)`` is pinned in tests.

    Scale shape: per-batch (block, treatment) sum partials, ONE
    block-keyed bucket exchange (a block's ranks need all its cells)
    with the global treatment list — a bounded audit dimension folded
    in a tiny first pass — broadcast into the fold closure; per bucket
    the rank pass is a vectorized lexsort + segment walk emitting k+2
    scalars per bucket; driver finishes in Python ints. Output one row
    ``(n_blocks, k, chi2_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([block_col, treatment_col, value_col]).group_by(
            [block_col, treatment_col]).aggregate([(value_col, "sum")])
        return g.rename_columns([block_col, treatment_col, "v"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    cells = bucketed_aggregate(
        partials, [block_col, treatment_col], {"v": ("v", "sum")},
        num_buckets=num_buckets, bucket_key=block_col,
    ).materialize()

    treatments = sorted(
        cells.groupby(treatment_col).count().to_pandas()[
            treatment_col].tolist())
    k = len(treatments)
    t_index = {t: i for i, t in enumerate(treatments)}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_blocks": pd.Series([], dtype="int64"),
            "dr2_sum": pd.Series([], dtype="int64"),
            **{f"dr_{i}": pd.Series([], dtype="int64")
               for i in range(k)}})
        if not len(df):
            return empty
        # zero-fill: (blocks in bucket) × (global treatments) grid
        blocks = df[block_col].unique()
        nb = len(blocks)
        b_index = {b: i for i, b in enumerate(blocks)}
        grid = np.zeros((nb, k), dtype=np.int64)
        bi = df[block_col].map(b_index).to_numpy()
        ti = df[treatment_col].map(t_index).to_numpy()
        np.add.at(grid, (bi, ti), df["v"].to_numpy().astype(np.int64))
        # doubled mid-ranks row-wise: dr = 2*#smaller + #equal + 1
        order = np.argsort(grid, axis=1, kind="stable")
        sorted_v = np.take_along_axis(grid, order, axis=1)
        lt = np.zeros((nb, k), dtype=np.int64)
        eq = np.zeros((nb, k), dtype=np.int64)
        for j in range(k):
            v = grid[:, j][:, None]
            lt[:, j] = (sorted_v < v).sum(axis=1)
            eq[:, j] = (sorted_v == v).sum(axis=1)
        dr = 2 * lt + eq + 1
        out = {"n_blocks": [nb],
               "dr2_sum": [int((dr.astype(object) ** 2).sum())]}
        for i in range(k):
            out[f"dr_{i}"] = [int(dr[:, i].sum())]
        return pd.DataFrame(out).astype("int64")

    folded = bucketed_map_groups(partials, block_col, per_bucket,
                                 num_buckets=num_buckets).to_pandas()
    n = int(folded["n_blocks"].sum()) if len(folded) else 0
    if not n or k < 2:
        return pd.DataFrame({"n_blocks": pd.Series([n], dtype="int64"),
                             "k": pd.Series([k], dtype="int64"),
                             "chi2_ppm": pd.Series([0], dtype="int64")})
    dr2 = int(folded["dr2_sum"].sum())
    drj = [int(folded[f"dr_{i}"].sum()) for i in range(k)]
    assert sum(drj) == n * k * (k + 1)
    den = dr2 - n * k * (k + 1) ** 2
    num = sum((d - n * (k + 1)) ** 2 for d in drj)
    chi2 = (k - 1) * num * 1_000_000 // den if den > 0 else 0
    return pd.DataFrame({"n_blocks": pd.Series([n], dtype="int64"),
                         "k": pd.Series([k], dtype="int64"),
                         "chi2_ppm": pd.Series([chi2], dtype="int64")})


def friedman_test_sql(*, table_expr: str, block: str, treatment: str,
                      value_expr: str) -> str:
    """SQL mirror: (block × global-treatment) zero-filled grid, doubled
    mid-ranks via rank() + in-block tie counts, one-floor statistic."""
    return f"""
        WITH base AS (
          SELECT {block} AS b, {treatment} AS t,
                 sum({value_expr})::BIGINT AS v
          FROM {table_expr} GROUP BY 1, 2
        ),
        blocks AS (SELECT DISTINCT b FROM base),
        treats AS (SELECT DISTINCT t FROM base),
        grid AS (
          SELECT blocks.b, treats.t, coalesce(base.v, 0) AS v
          FROM blocks CROSS JOIN treats
          LEFT JOIN base ON base.b = blocks.b AND base.t = treats.t
        ),
        ranked AS (
          SELECT b, t,
                 (2 * rank() OVER (PARTITION BY b ORDER BY v)
                  + count(*) OVER (PARTITION BY b, v) - 1)::HUGEINT
                     AS dr
          FROM grid
        ),
        agg AS (
          SELECT (SELECT count(*) FROM blocks)::HUGEINT AS n,
                 (SELECT count(*) FROM treats)::HUGEINT AS k,
                 sum(dr * dr)::HUGEINT AS dr2
          FROM ranked
        ),
        tr AS (
          SELECT sum(dr)::HUGEINT AS drj FROM ranked GROUP BY t
        ),
        num AS (
          SELECT sum((tr.drj - agg.n * (agg.k + 1))
                     * (tr.drj - agg.n * (agg.k + 1)))::HUGEINT AS s
          FROM tr, agg
        )
        SELECT agg.n::BIGINT AS n_blocks, agg.k::BIGINT AS k,
               CASE WHEN agg.dr2 - agg.n * agg.k * (agg.k + 1)
                         * (agg.k + 1) > 0
                    THEN ((agg.k - 1) * num.s * 1000000)
                         // (agg.dr2 - agg.n * agg.k * (agg.k + 1)
                             * (agg.k + 1))
                    ELSE 0 END::BIGINT AS chi2_ppm
        FROM agg, num"""


def anova_eta(ds, *, group_col: str, value_col: str,
              num_buckets: int = 8):
    """One-way ANOVA omnibus over an integer value column — the
    parametric mean-difference companion to :func:`kruskal_wallis`
    (KW asks "does any group stochastically dominate on RANKS";
    ANOVA asks "do the group MEANS differ relative to within-group
    spread", which is the right readout when the value is a real
    magnitude — latency, spend, length — and the analyst wants the
    variance decomposition, not just dominance), plus eta-squared,
    the effect-size share of variance the grouping explains.

    Exact integer form over cleared denominators, with ONE documented
    floor: with per-group ``(n_j, T_j = Σx, S_j = Σx²)`` and totals
    ``n, T, S, k``:

        sst_n = n·S − T²                       (= n·SST, exact ≥ 0)
        ssb_n = max(0, Σ_j (n·T_j²)//n_j − T²) (= n·SSB, per-group
                                                floor — Python // and
                                                DuckDB // agree; the
                                                clamp covers the
                                                all-means-equal case
                                                where the k floors
                                                push the sum below T²)
        ssw_n = sst_n − ssb_n
        eta2_ppm = ssb_n·10⁶ // sst_n          (0 when sst_n = 0)
        f_ppm    = ssb_n·(n−k)·10⁶ // (ssw_n·(k−1))
                                               (0 when ssw_n = 0 or
                                                k < 2 — an infinite F
                                                reports 0 by contract
                                                with eta2_ppm = 10⁶
                                                carrying the signal)

    All arithmetic past the fold is Python ints (n·S overflows int64
    near 10⁹ rows of 4-digit values; the HUGEINT mirror bounds at
    ~10¹⁸ — the documented mirror bound).

    Scale shape: per-batch Arrow group_by partials of (count, Σx, Σx²)
    — three int64s per group per batch — ONE tiny group-keyed fold,
    driver finish over k rows. Zero shuffles of row data. Output one
    row ``(n_rows, k_groups, eta2_ppm, f_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).cast(pa.int64())
        tb = pa.table({
            group_col: batch.column(group_col),
            "x": x,
            "x2": pa.compute.multiply_checked(x, x),
        })
        g = tb.group_by([group_col]).aggregate(
            [("x", "sum"), ("x2", "sum"), ([], "count_all")])
        return g.rename_columns([group_col, "t", "s", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col], {"t": ("t", "sum"), "s": ("s", "sum"),
                      "c": ("c", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    if folded.empty or "c" not in folded.columns:
        # zero-block input loses the fold schema entirely: the typed
        # all-zero contract row, matching the coalesced SQL mirror
        folded = pd.DataFrame({group_col: [], "t": [], "s": [], "c": []})
    k = len(folded)
    n = int(folded["c"].sum())
    t_ = sum(int(v) for v in folded["t"])
    s_ = sum(int(v) for v in folded["s"])
    sst_n = n * s_ - t_ * t_
    ssb_n = max(0, sum((n * int(tj) * int(tj)) // int(cj)
                       for tj, cj in zip(folded["t"], folded["c"]))
                - t_ * t_)
    ssw_n = sst_n - ssb_n
    eta2 = ssb_n * 1_000_000 // sst_n if sst_n > 0 else 0
    f = (ssb_n * (n - k) * 1_000_000 // (ssw_n * (k - 1))
         if ssw_n > 0 and k >= 2 and n > k else 0)
    out = pd.DataFrame({
        "n_rows": [n], "k_groups": [k],
        "eta2_ppm": [eta2], "f_ppm": [f],
    }).astype("int64")
    return ray.data.from_pandas(out)


def anova_eta_sql(*, src_sql: str, group: str, value_expr: str) -> str:
    """SQL mirror: per-group HUGEINT (n_j, T_j, S_j) fold, the same
    single-floor cleared-denominator algebra."""
    return f"""
        WITH src AS ({src_sql}),
        pg AS (
          SELECT {group} AS g, count(*)::HUGEINT AS c,
                 sum(v)::HUGEINT AS t, sum(v * v)::HUGEINT AS s
          FROM (SELECT {group}, ({value_expr})::HUGEINT AS v FROM src)
               q({group}, v)
          GROUP BY 1
        ),
        tot AS (
          SELECT coalesce(sum(c), 0)::HUGEINT AS n,
                 coalesce(sum(t), 0)::HUGEINT AS t,
                 coalesce(sum(s), 0)::HUGEINT AS s,
                 count(*)::HUGEINT AS k
          FROM pg
        ),
        alg AS (
          SELECT tot.n, tot.k,
                 tot.n * tot.s - tot.t * tot.t AS sst_n,
                 greatest(
                   coalesce((SELECT sum((tot.n * pg.t * pg.t) // pg.c)
                             FROM pg), 0) - tot.t * tot.t,
                   0) AS ssb_n
          FROM tot
        )
        SELECT n::BIGINT AS n_rows, k::BIGINT AS k_groups,
               CASE WHEN sst_n > 0
                    THEN (ssb_n * 1000000 // sst_n)::BIGINT
                    ELSE 0 END AS eta2_ppm,
               CASE WHEN (sst_n - ssb_n) > 0 AND k >= 2 AND n > k
                    THEN (ssb_n * (n - k) * 1000000
                          // ((sst_n - ssb_n) * (k - 1)))::BIGINT
                    ELSE 0 END AS f_ppm
        FROM alg"""


def levene_bf(ds, *, group_col: str, value_col: str, quantize: int = 1,
              num_buckets: int = 16):
    """Brown–Forsythe robust spread test (Levene's test with the median
    center, the variant Brown & Forsythe 1974 showed keeps its size
    under heavy tails): do the GROUPS DIFFER IN SPREAD — the
    variance-homogeneity audit that decides whether :func:`anova_eta`'s
    pooled-variance F is even trustworthy, and on its own the readout
    a mixing-weight tuner wants when two sources have equal means but
    one is far noisier.

    Deviations are taken from the per-group DISCRETE LOWER MEDIAN
    (the element at 0-based index (n_j−1)//2 of the sorted group —
    an actual attained value, integer-exact; ties with DuckDB's
    cumulative-count formulation below, not ``quantile_disc``, so the
    engine and mirror pin the same element), then the statistic is
    exactly :func:`anova_eta`'s cleared-denominator algebra applied to
    ``d = |x − med_g|`` — W = F(d), reported as ``w_ppm`` with
    ``eta2_ppm`` (share of deviation variance between groups) riding
    along.

    Scale shape: ONE bounded-support ``(group, x//quantize)`` count
    fold (the :func:`grouped_ks` support contract — quantize bounds
    the grid for continuous values); medians AND the deviation ANOVA
    both finish on the driver from that same folded table, so the
    corpus is touched exactly once. Output one row
    ``(n_rows, k_groups, eta2_ppm, w_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).cast(pa.int64())
        tb = pa.table({
            group_col: batch.column(group_col),
            "v": pa.compute.divide(x, quantize).cast(pa.int64()),
        })
        g = tb.group_by([group_col, "v"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "v", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "v"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="v",
    ).to_pandas()

    if folded.empty or group_col not in folded.columns:
        # zero-block input loses the fold schema: typed all-zero row
        folded = pd.DataFrame({group_col: [], "v": [], "c": []})
    n = k = t_ = s_ = 0
    ssb_terms = []
    per_group = []
    for grp, sub in folded.groupby(group_col, sort=True):
        sub = sub.sort_values("v")
        vs = sub["v"].to_numpy()
        cs = sub["c"].to_numpy()
        nj = int(cs.sum())
        cum = np.cumsum(cs)
        med = int(vs[int(np.searchsorted(cum, (nj - 1) // 2 + 1))])
        d = np.abs(vs - med).astype(object)
        tj = int((d * cs).sum())
        sj = int((d * d * cs).sum())
        per_group.append((nj, tj, sj))
        n += nj
        k += 1
        t_ += tj
        s_ += sj
    ssb_n = max(0, sum((n * tj * tj) // nj
                       for nj, tj, _ in per_group) - t_ * t_) if n else 0
    sst_n = n * s_ - t_ * t_
    ssw_n = sst_n - ssb_n
    eta2 = ssb_n * 1_000_000 // sst_n if sst_n > 0 else 0
    w = (ssb_n * (n - k) * 1_000_000 // (ssw_n * (k - 1))
         if ssw_n > 0 and k >= 2 and n > k else 0)
    out = pd.DataFrame({
        "n_rows": [n], "k_groups": [k],
        "eta2_ppm": [eta2], "w_ppm": [w],
    }).astype("int64")
    return ray.data.from_pandas(out)


def levene_bf_sql(*, src_sql: str, group: str, value_expr: str,
                  quantize: int = 1) -> str:
    """SQL mirror: the same single (group, v) count fold, lower median
    via the cumulative-count window (min v with cum ≥ (n_j−1)//2 + 1),
    deviation sums per group, anova_eta's algebra in HUGEINT."""
    return f"""
        WITH src AS ({src_sql}),
        cnt AS (
          SELECT {group} AS g, ({value_expr})::BIGINT // {quantize} AS v,
                 count(*)::HUGEINT AS c
          FROM src GROUP BY 1, 2
        ),
        cum AS (
          SELECT g, v, c,
                 sum(c) OVER (PARTITION BY g ORDER BY v) AS cm,
                 sum(c) OVER (PARTITION BY g) AS nj
          FROM cnt
        ),
        med AS (
          SELECT g, min(v) AS med
          FROM cum WHERE cm >= (nj - 1) // 2 + 1
          GROUP BY g
        ),
        pg AS (
          SELECT cnt.g, sum(cnt.c)::HUGEINT AS nj,
                 sum(abs(cnt.v - med.med)::HUGEINT * cnt.c)
                     ::HUGEINT AS t,
                 sum(abs(cnt.v - med.med)::HUGEINT
                     * abs(cnt.v - med.med) * cnt.c)::HUGEINT AS s
          FROM cnt JOIN med ON cnt.g = med.g
          GROUP BY 1
        ),
        tot AS (
          SELECT coalesce(sum(nj), 0)::HUGEINT AS n,
                 coalesce(sum(t), 0)::HUGEINT AS t,
                 coalesce(sum(s), 0)::HUGEINT AS s,
                 count(*)::HUGEINT AS k
          FROM pg
        ),
        alg AS (
          SELECT tot.n, tot.k,
                 tot.n * tot.s - tot.t * tot.t AS sst_n,
                 greatest(
                   coalesce((SELECT sum((tot.n * pg.t * pg.t) // pg.nj)
                             FROM pg), 0) - tot.t * tot.t,
                   0) AS ssb_n
          FROM tot
        )
        SELECT n::BIGINT AS n_rows, k::BIGINT AS k_groups,
               CASE WHEN sst_n > 0
                    THEN (ssb_n * 1000000 // sst_n)::BIGINT
                    ELSE 0 END AS eta2_ppm,
               CASE WHEN (sst_n - ssb_n) > 0 AND k >= 2 AND n > k
                    THEN (ssb_n * (n - k) * 1000000
                          // ((sst_n - ssb_n) * (k - 1)))::BIGINT
                    ELSE 0 END AS w_ppm
        FROM alg"""


def grouped_ols(ds, *, key: str, x_col: str, y_col: str,
                num_buckets: int = 32):
    """Per-group simple OLS fit in exact integer ppm — the
    FEATURE-VALUED companion to :func:`grouped_moments` (corr says how
    tightly x and y move; the slope and intercept are the numbers a
    downstream model or dashboard actually consumes: cents-per-hour,
    tokens-per-day) and the least-squares sibling of
    :func:`theil_sen_trend`'s median slope (OLS is the efficient
    estimator when outliers are already handled; Theil–Sen is the
    robust one):

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
        intercept = (Σy·Dx − N·Σx) / (n·Dx)      with N, Dx the slope's
                                                  num/den
        *_ppm     — ×10⁶, truncation toward zero (engine sign-split ==
                    DuckDB ``//``)

    Zero-x-variance groups (incl. n = 1) report slope 0 and intercept
    = mean y by contract. Inputs are pre-quantized integers (the
    grouped_moments contract).

    Scale shape: grouped_moments' — per-batch Arrow moment collapse
    (one row per (batch, key) crosses), ONE key-bucketed fold, a
    driver-free Python-int finishing map over the tiny grouped table
    (HUGEINT-mirror bound documented there). Output
    ``(key, n, slope_ppm, intercept_ppm)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = pa.table({
            key: t.column(key),
            "sum_x": pa.array(x), "sum_y": pa.array(y),
            "sum_xx": pa.array(x * x), "sum_xy": pa.array(x * y),
        })
        g = t2.group_by([key]).aggregate(
            [("sum_x", "sum"), ("sum_y", "sum"), ("sum_xx", "sum"),
             ("sum_xy", "sum"), ([], "count_all")])
        return g.rename_columns(
            [key, "sum_x", "sum_y", "sum_xx", "sum_xy", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key],
        {c: (c, "sum")
         for c in ["n", "sum_x", "sum_y", "sum_xx", "sum_xy"]},
        num_buckets=num_buckets,
    )

    def trunc(num: int, den: int) -> int:
        return -((-num) // den) if num < 0 else num // den

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized int64 fast path: every intermediate (incl. the ×10⁶
        # clearing and sy·dx − num·sx) must fit int64, checked with a
        # float magnitude guard; guarded rows use the exact Python-int
        # loop (HUGEINT mirror). Integer results, so fast path == loop.
        M = 1_000_000
        n = df["n"].to_numpy(dtype=np.int64)
        sx = df["sum_x"].to_numpy(dtype=np.int64)
        sy = df["sum_y"].to_numpy(dtype=np.int64)
        sxx = df["sum_xx"].to_numpy(dtype=np.int64)
        sxy = df["sum_xy"].to_numpy(dtype=np.int64)
        nf, sxf, syf = (a.astype(np.float64) for a in (n, sx, sy))
        sxxf, sxyf = (a.astype(np.float64) for a in (sxx, sxy))
        dxf = nf * sxxf - sxf * sxf
        numf = nf * sxyf - sxf * syf
        LIM = 2.0 ** 61
        ok = (np.maximum.reduce([
            np.abs(nf * sxxf), sxf * sxf, np.abs(nf * sxyf),
            np.abs(sxf * syf), np.abs(numf) * M, np.abs(nf * dxf),
            np.abs(syf * dxf) * M, np.abs(numf * sxf) * M,
            np.abs(syf) * M]) < LIM)

        def vtrunc(num_arr, den_arr):
            q = np.abs(num_arr) // den_arr
            return np.where(num_arr < 0, -q, q)

        slope = np.zeros(len(n), dtype=np.int64)
        inter = np.zeros(len(n), dtype=np.int64)
        dx = n * sxx - sx * sx
        num = n * sxy - sx * sy
        flat = ok & (dx <= 0)
        inter[flat] = vtrunc(sy[flat] * M, n[flat])
        pos = ok & (dx > 0)
        slope[pos] = vtrunc(num[pos] * M, dx[pos])
        inter[pos] = vtrunc((sy[pos] * dx[pos] - num[pos] * sx[pos]) * M,
                            n[pos] * dx[pos])
        for i in np.flatnonzero(~ok):
            ni, sxi, syi = int(n[i]), int(sx[i]), int(sy[i])
            dxi = ni * int(sxx[i]) - sxi * sxi
            if dxi <= 0:
                inter[i] = trunc(syi * M, ni)
                continue
            numi = ni * int(sxy[i]) - sxi * syi
            slope[i] = trunc(numi * M, dxi)
            inter[i] = trunc((syi * dxi - numi * sxi) * M, ni * dxi)
        return pd.DataFrame({
            key: df[key],
            "n": df["n"].astype("int64"),
            "slope_ppm": pd.Series(slope, dtype="int64",
                                   index=df.index),
            "intercept_ppm": pd.Series(inter, dtype="int64",
                                       index=df.index),
        })

    return folded.map_batches(finish, batch_format="pandas")


def grouped_ols_sql(*, table: str, key: str, x_expr: str,
                    y_expr: str) -> str:
    """SQL mirror: HUGEINT moment fold + the identical cleared-
    denominator slope/intercept with DuckDB's truncating ``//``."""
    return f"""
        WITH m AS (
          SELECT {key} AS k, count(*)::HUGEINT AS n,
                 sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                 sum(x * x)::HUGEINT AS sxx, sum(x * y)::HUGEINT AS sxy
          FROM (SELECT {key}, ({x_expr})::HUGEINT AS x,
                       ({y_expr})::HUGEINT AS y FROM {table}) q
          GROUP BY 1
        )
        SELECT k AS {key}, n::BIGINT AS n,
               CASE WHEN n * sxx - sx * sx > 0 THEN
                 ((n * sxy - sx * sy) * 1000000
                  // (n * sxx - sx * sx))::BIGINT
               ELSE 0 END AS slope_ppm,
               CASE WHEN n * sxx - sx * sx > 0 THEN
                 ((sy * (n * sxx - sx * sx)
                   - (n * sxy - sx * sy) * sx) * 1000000
                  // (n * (n * sxx - sx * sx)))::BIGINT
               ELSE (sy * 1000000 // n)::BIGINT
               END AS intercept_ppm
        FROM m"""


def daily_ks_series(ds, *, ts_col: str, value_col: str,
                    quantize: int = 1, num_buckets: int = 16):
    """Day-over-day distribution drift: the exact two-sample KS
    statistic between EACH calendar day's value distribution and the
    PREVIOUS day's — the time-SERIES member of the drift family
    (:func:`psi_drift` scores one static split, :func:`grouped_ks`
    scores each group against the rest; a monitoring dashboard wants
    the daily line so a regression shows up the morning it happens).
    Only strictly adjacent calendar days compare (a gap day has no
    yesterday and contributes no row — the readout must not blame a
    weekend gap on drift).

    Exact integers over the common denominator (the grouped_ks
    convention): ``ks_ppm = max_v |F_prev(v)·n_cur − F_cur(v)·n_prev|
    ·10⁶ // (n_prev·n_cur)`` — cumulative counts on the union support
    of the two days, ONE floor after the integer max. Values are
    compared on the quantized grid ``v // quantize`` (the bounded-
    support contract).

    Scale shape: ONE bounded (day, v) count fold; the CDF walks run on
    the driver over the audit-sized day×support table in Python ints.
    Output ``(day, n_prev, n_cur, ks_ppm)`` per day with a previous
    day."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    day_us = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        v = pa.compute.divide(
            batch.column(value_col).cast(pa.int64()), quantize
        ).cast(pa.int64())
        tb = pa.table({"day": day, "v": v})
        g = tb.group_by(["day", "v"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "v", "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "v"], {"c": ("c", "sum")},
        num_buckets=num_buckets, bucket_key="v",
    ).to_pandas()

    per_day = {
        int(d): sub.set_index("v")["c"].astype("int64")
        for d, sub in folded.groupby("day", sort=True)
    }
    rows = []
    for d in sorted(per_day):
        if d - 1 not in per_day:
            continue
        prev, cur = per_day[d - 1], per_day[d]
        support = prev.index.union(cur.index).sort_values()
        cp = prev.reindex(support, fill_value=0).to_numpy(
            dtype=object).cumsum()
        cc = cur.reindex(support, fill_value=0).to_numpy(
            dtype=object).cumsum()
        n_p, n_c = int(cp[-1]), int(cc[-1])
        best = max(abs(int(a) * n_c - int(b) * n_p)
                   for a, b in zip(cp, cc))
        rows.append((d, n_p, n_c, best * 1_000_000 // (n_p * n_c)))
    out = pd.DataFrame(rows, columns=["day", "n_prev", "n_cur",
                                      "ks_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def daily_ks_series_sql(*, table: str, ts: str, value_expr: str,
                        quantize: int = 1) -> str:
    """SQL mirror: (day, v) counts, union-support CDFs via a
    day-pair × support join, the identical cross-multiplied max +
    one floor."""
    return f"""
        WITH cnt AS (
          SELECT epoch_us({ts}) // 86400000000 AS day,
                 ({value_expr})::BIGINT // {quantize} AS v,
                 count(*)::HUGEINT AS c
          FROM {table} GROUP BY 1, 2
        ),
        days AS (SELECT DISTINCT day FROM cnt),
        pairs AS (
          SELECT d.day FROM days d
          JOIN days p ON p.day = d.day - 1
        ),
        sup AS (
          SELECT pairs.day, s.v
          FROM pairs JOIN (
            SELECT DISTINCT day, v FROM cnt
          ) s ON s.day IN (pairs.day, pairs.day - 1)
          GROUP BY 1, 2
        ),
        cdf AS (
          -- two correlated cumulative sums: a single two-way LEFT JOIN
          -- would cross-multiply the cp and cc match sets (fan-out)
          SELECT sup.day, sup.v,
                 (SELECT coalesce(sum(c), 0) FROM cnt
                  WHERE cnt.day = sup.day - 1 AND cnt.v <= sup.v
                 )::HUGEINT AS fp,
                 (SELECT coalesce(sum(c), 0) FROM cnt
                  WHERE cnt.day = sup.day AND cnt.v <= sup.v
                 )::HUGEINT AS fc
          FROM sup
        ),
        nn AS (
          SELECT pairs.day,
                 (SELECT sum(c) FROM cnt WHERE cnt.day = pairs.day - 1)
                     ::HUGEINT AS n_prev,
                 (SELECT sum(c) FROM cnt WHERE cnt.day = pairs.day)
                     ::HUGEINT AS n_cur
          FROM pairs
        )
        SELECT nn.day::BIGINT AS day, nn.n_prev::BIGINT AS n_prev,
               nn.n_cur::BIGINT AS n_cur,
               (max(abs(cdf.fp * nn.n_cur - cdf.fc * nn.n_prev))
                * 1000000 // (nn.n_prev * nn.n_cur))::BIGINT AS ks_ppm
        FROM cdf JOIN nn USING (day)
        GROUP BY nn.day, nn.n_prev, nn.n_cur"""


def krippendorff_alpha(ds, *, cols, num_buckets: int = 8):
    """Krippendorff's alpha (nominal data) over k rater columns WITH
    MISSING RATINGS — the capability :func:`fleiss_kappa` lacks: Fleiss
    requires every item rated by all k raters, while real annotation
    runs have skips; alpha's coincidence algebra pairs only the
    ratings that exist (Krippendorff, *Content Analysis* §12), so a
    batch where annotator 3 skipped 20% of items still scores without
    dropping rows or imputing.

    Exact integer form: items with m_i ≥ 2 non-null ratings are
    pairable; with L = lcm(1..k−1) (so L/(m_i−1) is always exact),
    Σ_c n_ic² computed per row as the null-guarded pair-equality sum
    (the fleiss_kappa k²-mask trick):

        A     = Σ_i (m_i² − Σ_c n_ic²) · L // (m_i − 1)   (exact ÷)
        n_tot = Σ_i m_i        n_c = pooled category margins
        C     = Σ_c n_c·(n_tot − n_c)
        α     = 1 − A·(n_tot − 1) / (L·C)

    ``alpha_ppm`` via the engine-wide shift-clamp division (negative α
    replays exactly); C = 0 (one pooled category) reports 0 by the
    fleiss point-mass contract; fully-rated input reproduces the
    no-missing special case. Output one row: ``(n_items, n_pairable,
    n_categories, alpha_ppm)``.

    Scale shape (fleiss_kappa's): stateless per-batch partials — one
    scalar A/n_tot/item-count triple plus per-category margin counts —
    ONE tiny sentinel/category-keyed fold, Python-int finish."""
    import math

    import ray.data
    from ray.data.aggregate import Sum

    cols = list(cols)
    k = len(cols)
    if k < 2:
        raise ValueError("krippendorff_alpha needs >= 2 rater columns")
    L = math.lcm(*range(1, k)) if k > 1 else 1

    def partial(batch: pa.Table) -> pa.Table:
        # category identity = the value's STRING form (int 1 -> "1"),
        # matching the mirror's ::VARCHAR — and immune to numpy's
        # int->float promotion on nullable columns
        mats = []
        valids = []
        for c in cols:
            col = batch.column(c)
            valid = pa.compute.is_valid(col).to_numpy(
                zero_copy_only=False)
            vals = pa.compute.cast(col, pa.string()).to_numpy(
                zero_copy_only=False)
            mats.append(vals)
            valids.append(valid)
        n = batch.num_rows
        m = np.zeros(n, dtype=np.int64)
        for v in valids:
            m += v
        pairs = np.zeros(n, dtype=np.int64)  # Σ_c n_ic² incl. self
        for a in range(k):
            for b in range(k):
                both = valids[a] & valids[b]
                eq = np.zeros(n, dtype=bool)
                if both.any():
                    eq[both] = (np.asarray(mats[a])[both]
                                == np.asarray(mats[b])[both])
                pairs += eq
        ok = m >= 2
        a_terms = ((m[ok] * m[ok] - pairs[ok]) * L
                   // (m[ok] - 1)).sum()
        terms = ["\x00A", "\x00N", "\x00I"]
        vals_out = [int(a_terms), int(m[ok].sum()), int(ok.sum())]
        for vv, valid in zip(mats, valids):
            sel = valid & ok
            if sel.any():
                u, c = np.unique(np.asarray(vv)[sel], return_counts=True)
                for uv, cv in zip(u, c):
                    terms.append(f"c|{uv}")
                    vals_out.append(int(cv))
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "v": pa.array(vals_out, type=pa.int64()),
        })

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    sv = dict(zip(stats["term"], stats["v"].map(int)))
    a_ = sv.pop("\x00A", 0)
    n_tot = sv.pop("\x00N", 0)
    n_items = sv.pop("\x00I", 0)
    margins = list(sv.values())
    c_ = sum(x * (n_tot - x) for x in margins)
    den = L * c_
    if den > 0:
        num = den - a_ * (n_tot - 1)
        num = max(num, -den)
        alpha = (num + den) * 1_000_000 // den - 1_000_000
    else:
        alpha = 0
    out = pd.DataFrame({
        "n_items": [n_items], "n_pairable": [n_tot],
        "n_categories": [len(margins)], "alpha_ppm": [alpha],
    }).astype("int64")
    return ray.data.from_pandas(out)


def krippendorff_alpha_sql(*, rows_expr: str, cols) -> str:
    """SQL mirror: NULL-filtered unpivot over a row_number rid,
    per-(rid, category) counts, the identical LCM-cleared HUGEINT
    algebra with the shift-clamp division."""
    import math

    cols = list(cols)
    k = len(cols)
    L = math.lcm(*range(1, k)) if k > 1 else 1
    long = " UNION ALL ".join(
        f"SELECT rid, {c}::VARCHAR AS v FROM r WHERE {c} IS NOT NULL"
        for c in cols)
    return f"""
        WITH p AS ({rows_expr}),
        r AS (SELECT row_number() OVER () AS rid, * FROM p),
        long AS ({long}),
        cnt AS (
          SELECT rid, v, count(*)::HUGEINT AS c
          FROM long GROUP BY 1, 2
        ),
        item AS (
          SELECT rid, sum(c)::HUGEINT AS m,
                 sum(c * c)::HUGEINT AS s2
          FROM cnt GROUP BY 1 HAVING sum(c) >= 2
        ),
        aa AS (
          SELECT coalesce(sum((m * m - s2) * {L} // (m - 1)), 0)
                     ::HUGEINT AS a,
                 coalesce(sum(m), 0)::HUGEINT AS n_tot,
                 count(*)::BIGINT AS n_items
          FROM item
        ),
        mg AS (
          SELECT long.v, count(*)::HUGEINT AS nc
          FROM long JOIN item USING (rid) GROUP BY 1
        ),
        cc AS (
          SELECT coalesce(sum(nc * ((SELECT n_tot FROM aa) - nc)), 0)
                     ::HUGEINT AS c,
                 count(*)::BIGINT AS ncat
          FROM mg
        )
        SELECT aa.n_items, aa.n_tot::BIGINT AS n_pairable,
               cc.ncat AS n_categories,
               CASE WHEN {L}::HUGEINT * cc.c > 0 THEN
                 ((greatest({L}::HUGEINT * cc.c
                            - aa.a * (aa.n_tot - 1),
                            -({L}::HUGEINT * cc.c))
                   + {L}::HUGEINT * cc.c) * 1000000
                  // ({L}::HUGEINT * cc.c) - 1000000)::BIGINT
               ELSE 0 END AS alpha_ppm
        FROM aa, cc"""
