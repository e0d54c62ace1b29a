"""Mergeable sketches — approximate distinct counting (HyperLogLog).

The reference's only distinct op is exact (``Volume.tokens``,
feature_reader.py:559-568); at 100 TB an exact per-group distinct over a
high-cardinality value column is a full shuffle of every (group, value)
pair. A HyperLogLog register table is the scale path: per-batch partials
are ``m`` small integers per group, registers merge with ``max`` (fully
commutative — safe under any batch/bucket shape), and only registers cross
the exchange.

Everything is deterministic and SQL-replayable (the driver-oracle
contract): the value hash is the same little-endian-md5 uint64 used by
simhash (``dedup.md5_hash64``, DuckDB ``md5_number_upper``), the register
math is integer-exact (rho via binary length, no floating log), and the
final estimate is ONE double division of integer-derived quantities:

    Z^-1 = S / 2^64  where  S = Σ_j 2^(64 - M[j])   (integer, M[j]=0 if unused)
    estimate = alpha_m · m² · 2^64 / S

Raw HLL estimator only — no small/large-range corrections (document the
±1.04/√m relative error instead; corrections branch on the estimate and
would complicate the parity contract for no structural gain).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from htrc_feature_reader_ray.stages.dedup import md5_hash64
from htrc_feature_reader_ray.stages.partition import bucketed_map_groups


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def hll_registers_batch(values, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register_index, rho) per value — vectorized, integer-exact.

    register = low ``p`` hash bits; rho = 1 + leading zeros of the
    remaining ``K = 64 - p`` bits (binary length via exact uint64
    searchsorted against powers of two — no floating log)."""
    m = 1 << p
    K = 64 - p
    h = md5_hash64(values)
    j = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    powers = np.uint64(1) << np.arange(K, dtype=np.uint64)
    bitlen = np.searchsorted(powers, w, side="right")
    rho = np.where(w == 0, K + 1, K - bitlen + 1).astype(np.int64)
    return j, rho


def approx_distinct(ds, *, group_cols, value_col: str, p: int = 6,
                    num_buckets: int = 16):
    """(group_cols..., approx_distinct:double, registers_used:int64) —
    HyperLogLog distinct count of ``value_col`` per group.

    Phase 1 (``map_batches``): per-batch distinct (group, value), hash the
    batch VOCABULARY once, fold to (group, register, max rho) — ≤ m rows
    per group per batch cross the exchange regardless of input size.
    Phase 2: one bucketed pass re-maxes registers per group and evaluates
    the estimator. Values are hashed via their string form (SQL mirror:
    ``value::VARCHAR``)."""
    group_cols = list(group_cols)
    m = 1 << p
    # single shared constant so engine and SQL divide the same double
    C = _alpha(m) * (m * m) * 2.0**64

    def partials(batch: pa.Table) -> pa.Table:
        t = batch.select(group_cols + [value_col])
        distinct = t.group_by(group_cols + [value_col]).aggregate([])
        vals = [str(v) for v in distinct.column(value_col).to_pylist()]
        if not vals:
            return pa.table(
                {
                    **{c: distinct.column(c) for c in group_cols},
                    "reg": pa.array([], type=pa.int64()),
                    "rho": pa.array([], type=pa.int64()),
                }
            )
        j, rho = hll_registers_batch(vals, p)
        reg = pa.table(
            {
                **{c: distinct.column(c) for c in group_cols},
                "reg": pa.array(j),
                "rho": pa.array(rho),
            }
        )
        folded = reg.group_by(group_cols + ["reg"]).aggregate([("rho", "max")])
        return folded.rename_columns(group_cols + ["reg", "rho"])

    reg_partials = ds.map_batches(partials, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby(group_cols + ["reg"], as_index=False)["rho"].max()
        rows = []
        for key, g in merged.groupby(group_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            s_present = sum(2 ** (64 - int(r)) for r in g["rho"])
            n_used = len(g)
            S = (m - n_used) * 2**64 + s_present
            rows.append(
                (*key, C / float(S), np.int64(n_used))
            )
        return pd.DataFrame(
            rows, columns=group_cols + ["approx_distinct", "registers_used"]
        )

    return bucketed_map_groups(
        reg_partials, group_cols[0], finish, num_buckets=num_buckets
    )


def countmin_build(ds, *, text_col: str = "text", depth: int = 4,
                   width: int = 1024):
    """Count-Min sketch of corpus token frequencies: a Dataset of
    ``(row, cell, cnt)`` with ``depth × width`` cells.

    The bounded-memory sibling of the exact ``corpus_term_freqs`` fold:
    per-batch partials are ≤ depth×width cells regardless of vocabulary
    size, cells SUM-merge (fully commutative), and estimates overestimate
    only (min over rows). Cell hash = md5 of ``"<row>:<token>"`` — the same
    SQL-replayable convention as simhash/HLL (``md5_number_upper``)."""
    from ray.data.aggregate import Sum

    from htrc_feature_reader_ray.stages.textstats import _tok_stats

    def partials(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _tok_stats(batch, text_col)
        t = pa.table({"token": flat})
        g = t.group_by("token").aggregate([([], "count_all")])
        toks = g.column("token").to_pylist()
        cnts = g.column("count_all").to_numpy()
        rows_out, cells_out, cnt_out = [], [], []
        for j in range(depth):
            if toks:
                cells = (
                    md5_hash64([f"{j}:{t}" for t in toks])
                    % np.uint64(width)
                ).astype(np.int64)
                folded = np.bincount(cells, weights=cnts, minlength=width)
            else:
                folded = np.zeros(width)
            nz = np.flatnonzero(folded)
            rows_out.append(np.full(len(nz), j, dtype=np.int64))
            cells_out.append(nz.astype(np.int64))
            cnt_out.append(folded[nz].astype(np.int64))
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows_out)),
                "cell": pa.array(np.concatenate(cells_out)),
                "cnt": pa.array(np.concatenate(cnt_out)),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["row", "cell"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def countmin_estimate(cms_df, tokens, *, depth: int = 4, width: int = 1024):
    """Point-query the folded sketch: est(token) = min over rows of the
    token's cell — never underestimates. ``cms_df`` is the pandas form of
    :func:`countmin_build` (depth×width rows, tiny)."""
    import pandas as pd

    table = np.zeros((depth, width), dtype=np.int64)
    if len(cms_df):
        table[cms_df["row"].to_numpy(), cms_df["cell"].to_numpy()] = (
            cms_df["cnt"].to_numpy()
        )
    tokens = list(tokens)
    ests = np.full(len(tokens), np.iinfo(np.int64).max)
    for j in range(depth):
        cells = (
            md5_hash64([f"{j}:{t}" for t in tokens]) % np.uint64(width)
        ).astype(np.int64)
        ests = np.minimum(ests, table[j, cells])
    return pd.DataFrame({"token": tokens, "cms_est": ests})


def countmin_sql(*, table: str = "documents", text: str = "text",
                 depth: int = 4, width: int = 1024) -> str:
    """(token, exact_count, cms_est) re-derivation: DuckDB rebuilds the
    exact same cells and takes the same min."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH tok AS (
          SELECT t.token FROM {table}, unnest({toks}) AS t(token)
        ), tc AS (
          SELECT token, count(*)::BIGINT AS exact_count FROM tok GROUP BY 1
        ), j AS (SELECT unnest(range({depth})) AS row),
        cells AS (
          SELECT j.row,
                 (md5_number_upper(j.row || ':' || tc.token)::UBIGINT
                  % {width})::BIGINT AS cell,
                 sum(exact_count)::BIGINT AS cnt
          FROM tc, j GROUP BY 1, 2
        )
        SELECT tc.token, tc.exact_count, min(cells.cnt)::BIGINT AS cms_est
        FROM tc, j
        JOIN cells
          ON cells.row = j.row
         AND cells.cell = (md5_number_upper(j.row || ':' || tc.token)::UBIGINT
                           % {width})::BIGINT
        GROUP BY 1, 2"""


def approx_distinct_sql(*, group_cols, value_expr: str, table: str,
                        p: int = 6) -> str:
    """DuckDB re-derivation of :func:`approx_distinct` (bit-exact)."""
    m = 1 << p
    K = 64 - p
    C = _alpha(m) * (m * m) * 2.0**64
    groups = ", ".join(group_cols)
    return f"""
        WITH vals AS (
          SELECT DISTINCT {groups}, ({value_expr})::VARCHAR AS v FROM {table}
        ), h AS (
          SELECT {groups}, md5_number_upper(v)::UBIGINT AS h FROM vals
        ), reg AS (
          SELECT {groups}, (h & {m - 1})::BIGINT AS reg,
                 (CASE WHEN (h >> {p}) = 0 THEN {K + 1}
                       ELSE {K} - length(bin(h >> {p})) + 1
                  END)::BIGINT AS rho
          FROM h
        ), mx AS (
          SELECT {groups}, reg, max(rho) AS rho FROM reg GROUP BY ALL
        ), agg AS (
          SELECT {groups}, count(*) AS n_used,
                 sum((1::UBIGINT << (64 - rho))::HUGEINT) AS s_present
          FROM mx GROUP BY ALL
        )
        SELECT {groups},
               {C!r} / (({m} - n_used)::HUGEINT
                        * 18446744073709551616::HUGEINT
                        + s_present)::DOUBLE AS approx_distinct,
               n_used::BIGINT AS registers_used
        FROM agg"""
