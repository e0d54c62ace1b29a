"""Token-budget sequence packing — assign every document a position in a
stream of fixed-budget training shards, distributed.

``shard_id = global_token_offset // budget`` where ``global_token_offset``
is the exclusive prefix sum of per-document token counts in ``id`` order
(boundary-straddling documents belong to the shard their first token lands
in — the streaming-packing-with-split convention, so shard boundaries are a
pure function of the offset and need no sequential scan).

The prefix sum is the classic two-pass distributed algorithm:

1. range-partition rows by contiguous id range (ORDER-PRESERVING, unlike
   hash buckets) and fold per-partition weight sums — B tiny rows;
2. exclusive-scan those B sums on the driver (B ≈ num_buckets, bytes);
3. broadcast the per-partition base offsets and finish with a local sorted
   cumsum inside each partition.

At lake scale the id bounds come from partition metadata / parquet column
statistics — never a data scan. Nothing here materializes the corpus; the
only driver-side data is the B partial sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

RANGE_COL = "_range_bucket"


def parquet_column_bounds(path: str, col: str) -> tuple[int, int]:
    """(min, max) of a column from parquet row-group statistics — a footer
    read, no data scan (the partitioned-lake analog reads the lineage
    manifest's per-partition key ranges instead)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    los, his = [], []
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            c = group.column(ci)
            if c.path_in_schema == col and c.statistics is not None:
                los.append(c.statistics.min)
                his.append(c.statistics.max)
    if not los:
        raise ValueError(f"no statistics for column {col!r} in {path}")
    return min(los), max(his)


def _range_bucket(ids: np.ndarray, lo: int, hi: int, num_buckets: int):
    span = max(hi - lo + 1, 1)
    b = (ids.astype(np.int64) - lo) * num_buckets // span
    return np.clip(b, 0, num_buckets - 1)


def pack_sequences(ds, *, weight_col: str, id_col: str, budget: int,
                   id_bounds: tuple[int, int], num_buckets: int = 32):
    """Input: one row per document with an integer ``weight_col`` (token
    count) and a unique orderable ``id_col``. Output adds:

    * ``global_offset``    exclusive prefix sum of weights in id order
    * ``shard_id``         global_offset // budget
    * ``offset_in_shard``  global_offset % budget

    ``id_bounds`` = (min_id, max_id) from lake/parquet metadata.
    """
    lo, hi = id_bounds

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        b = _range_bucket(ids, lo, hi, num_buckets)
        return batch.append_column(RANGE_COL, pa.array(b, type=pa.int64()))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    # the weight table is O(rows × 2 ints); persist it so the two passes
    # below don't re-execute the upstream pipeline twice
    bucketed = bucketed.materialize()

    def partial_sums(t: pa.Table) -> pa.Table:
        return t.select([RANGE_COL, weight_col]).group_by(
            RANGE_COL
        ).aggregate([(weight_col, "sum")])

    sums = (
        bucketed.map_batches(partial_sums, batch_format="pyarrow")
        .groupby(RANGE_COL)
        .sum(f"{weight_col}_sum")
        .to_pandas()
    )  # ≤ num_buckets rows
    totals = np.zeros(num_buckets, dtype=np.int64)
    if RANGE_COL in sums.columns:  # Ray drops columns on 0 rows
        totals[sums[RANGE_COL].to_numpy()] = sums[
            f"sum({weight_col}_sum)"
        ].to_numpy()
    base = np.concatenate([[0], np.cumsum(totals)[:-1]])  # exclusive scan

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        w = df[weight_col].to_numpy(dtype=np.int64)
        start = int(base[int(df[RANGE_COL].iloc[0])])
        offs = start + np.cumsum(w) - w
        df = df.drop(columns=[RANGE_COL])
        df["global_offset"] = offs
        df["shard_id"] = offs // budget
        df["offset_in_shard"] = offs % budget
        return df

    return bucketed.groupby(RANGE_COL).map_groups(
        finish, batch_format="pandas"
    )


def pack_sequences_sql(*, weight_expr: str, id_col: str, budget: int,
                       table: str) -> str:
    return f"""
        WITH tc AS (
          SELECT {id_col}, {weight_expr} AS n_tokens FROM {table}
        ), o AS (
          SELECT {id_col}, n_tokens,
                 coalesce(sum(n_tokens) OVER (
                     ORDER BY {id_col}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0)::BIGINT AS global_offset
          FROM tc
        )
        SELECT {id_col}, n_tokens, global_offset,
               (global_offset // {budget})::BIGINT AS shard_id,
               (global_offset % {budget})::BIGINT AS offset_in_shard
        FROM o"""


# ---------------------------------------------------------------------------
# power-of-2 length-bucket histogram + padding waste (batch-shape planner)


def length_buckets(ds, *, weight_col: str):
    """Power-of-2 sequence-length bucket histogram with exact padding
    waste — the batch-shape planning artifact for padded/bucketed
    batching (the TF bucket_by_sequence_length / fairseq
    ``--required-batch-size-multiple`` planning step): before a training
    run fixes its bucket boundaries, this answers "how many sequences
    land in each 2^k ceiling bucket, and what fraction of the padded
    token grid would be pad" — high waste in a fat bucket is the signal
    to split it or to route those docs through :func:`pack_sequences`
    instead of padding.

    Bucket = smallest power of two ≥ length (lengths ≤ 1 → bucket 1),
    computed by ``searchsorted`` against the literal 2^0..2^40 table —
    no float log2, exact at every power-of-2 boundary, and the SQL
    mirror joins the SAME literal table (``p.v >= L AND p.v // 2 < L``
    picks the unique ceiling power). Per bucket: ``n_seqs``,
    ``sum_tokens``, and ``waste_ppm = (n·bucket − Σlen)·10⁶ //
    (n·bucket)`` — exact, with the padded grid ``n·bucket`` the
    denominator.

    Scale shape: per-batch (bucket, n, sum) partials collapse the stream
    map-side; the fold is ≤ 41 rows (one per power) so the driver finish
    is audit-sized; Python-int ppm since n·bucket·10⁶ passes int64 at
    web scale."""
    powers = np.left_shift(np.int64(1), np.arange(41, dtype=np.int64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ln = df[weight_col].to_numpy().astype(np.int64)
        b = powers[np.searchsorted(powers, np.maximum(ln, 1), side="left")]
        g = pd.DataFrame({"bucket": b, "n": 1, "s": ln}).groupby(
            "bucket", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
        return g

    folded = (ds.map_batches(partial, batch_format="pandas")
              .to_pandas())
    if not len(folded):
        return _empty_length_buckets()
    g = folded.groupby("bucket", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum")).sort_values("bucket")
    waste = [
        (int(n) * int(b) - int(s)) * 1_000_000 // (int(n) * int(b))
        for b, n, s in zip(g["bucket"], g["n"], g["s"])
    ]
    out = pd.DataFrame({
        "bucket": g["bucket"].to_numpy().astype(np.int64),
        "n_seqs": g["n"].to_numpy().astype(np.int64),
        "sum_tokens": g["s"].to_numpy().astype(np.int64),
        "waste_ppm": np.array(waste, dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def _empty_length_buckets():
    import ray.data

    return ray.data.from_pandas(pd.DataFrame({
        "bucket": pd.Series([], dtype="int64"),
        "n_seqs": pd.Series([], dtype="int64"),
        "sum_tokens": pd.Series([], dtype="int64"),
        "waste_ppm": pd.Series([], dtype="int64"),
    }))


def length_buckets_sql(*, src_sql: str, len_expr: str) -> str:
    """SQL mirror: literal powers table join (unique ceiling power via
    ``v >= L AND v // 2 < L``), HUGEINT ppm."""
    return f"""
        WITH src AS ({src_sql}),
        lens AS (SELECT greatest(({len_expr})::BIGINT, 1) AS gl,
                        ({len_expr})::BIGINT AS l FROM src),
        powers AS (
          SELECT (1::BIGINT << k)::BIGINT AS v
          FROM unnest(generate_series(0, 40)) AS t(k)
        ),
        bucketed AS (
          SELECT p.v AS bucket, l
          FROM lens JOIN powers p ON p.v >= lens.gl AND p.v // 2 < lens.gl
        )
        SELECT bucket, count(*)::BIGINT AS n_seqs,
               sum(l)::BIGINT AS sum_tokens,
               ((count(*)::HUGEINT * bucket - sum(l)) * 1000000
                // (count(*)::HUGEINT * bucket))::BIGINT AS waste_ppm
        FROM bucketed GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# truncation-loss curve (max_seq_len policy audit)


def truncation_loss(ds, *, weight_col: str, lengths=(64, 256, 1024)):
    """Truncation-loss curve: for each candidate ``max_seq_len`` L, the
    exact fraction of corpus tokens LOST if every sequence is cut at L —
    the policy audit run before fixing a context length
    (:func:`length_buckets` prices the PADDING side of the trade;
    this prices the CUTTING side; together they bracket the choice
    between padding, packing and truncation). Per L:
    ``n_truncated`` (sequences longer than L), ``lost_tokens =
    Σ max(0, len−L)`` and ``loss_ppm = lost·10⁶ // total`` — exact.

    Scale shape: one stateless pass computes per-batch (L, n_trunc,
    lost, total) partials against the broadcast length list — the fold
    is ≤ |lengths| rows; Python-int ppm finish. Zero exchange beyond the
    audit-sized partials."""
    ls = sorted(int(x) for x in lengths)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ln = df[weight_col].to_numpy().astype(np.int64)
        rows = []
        for L in ls:
            over = np.maximum(ln - L, 0)
            rows.append((L, int((ln > L).sum()), int(over.sum()),
                         int(ln.sum())))
        return pd.DataFrame(rows, columns=["max_len", "n_trunc", "lost",
                                           "total"])

    folded = (ds.map_batches(partial, batch_format="pandas")
              .to_pandas()
              .groupby("max_len", as_index=False).sum()
              .sort_values("max_len"))
    out = pd.DataFrame({
        "max_len": folded["max_len"].to_numpy().astype(np.int64),
        "n_trunc": folded["n_trunc"].to_numpy().astype(np.int64),
        "lost_tokens": folded["lost"].to_numpy().astype(np.int64),
        "loss_ppm": np.array(
            [int(lo) * 1_000_000 // max(int(t), 1)
             for lo, t in zip(folded["lost"], folded["total"])],
            dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def truncation_loss_sql(*, src_sql: str, len_expr: str,
                        lengths=(64, 256, 1024)) -> str:
    """SQL mirror: lateral length-list explode, HUGEINT ppm."""
    vals = ", ".join(str(int(x)) for x in sorted(lengths))
    return f"""
        WITH src AS ({src_sql}),
        l AS (SELECT unnest([{vals}]) AS max_len)
        SELECT l.max_len::BIGINT AS max_len,
               count(*) FILTER (WHERE ({len_expr}) > l.max_len)::BIGINT
                   AS n_trunc,
               sum(greatest(({len_expr}) - l.max_len, 0))::BIGINT
                   AS lost_tokens,
               (sum(greatest(({len_expr}) - l.max_len, 0))::HUGEINT
                * 1000000 // greatest(sum({len_expr}), 1))::BIGINT
                   AS loss_ppm
        FROM src, l GROUP BY 1 ORDER BY 1"""
