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


# ---------------------------------------------------------------------------
# Bloom filter (broadcastable membership summary)
# ---------------------------------------------------------------------------
#
# The production shape of benchmark decontamination at corpus scale: the
# benchmark's n-gram set is summarized into a FIXED-SIZE bit array (16 KiB at
# m_bits=17) that ships to every worker once, instead of broadcasting the
# exact hash set (``curate.ngram_decontaminate``) whose size grows with the
# benchmark. Build exchanges only distinct bit POSITIONS (<= m ints total,
# regardless of input size); probe is a zero-exchange broadcast map. False
# positives are inherent — the audit query carries the exact-membership
# column next to the bloom flag so the measured FP rate is part of the gate.
#
# Determinism/SQL-replay contract: position j of value v is
# ``md5_number_upper(j || ':' || v) % m`` — the same seeded-md5 cell
# convention as the Count-Min sketch above, so DuckDB rebuilds the identical
# bit set and probes it with the identical k positions.


def bloom_positions(values, *, m_bits: int, k: int) -> np.ndarray:
    """Distinct sorted bit positions (int64) for an iterable of values."""
    vals = [str(v) for v in values]
    if not vals:
        return np.array([], dtype=np.int64)
    m = np.uint64(1 << m_bits)
    pos = [
        (md5_hash64([f"{j}:{v}" for v in vals]) % m).astype(np.int64)
        for j in range(k)
    ]
    return np.unique(np.concatenate(pos))


def bloom_build(ds, *, value_col: str, m_bits: int = 12,
                k: int = 4) -> np.ndarray:
    """Fold a Dataset column into a bloom bitmap (bool array of 2**m_bits).

    Per-batch: distinct values -> their distinct positions (each batch
    contributes <= m ints however large it is); one global distinct over
    positions. The returned bitmap is the broadcast artifact (``ray.put`` it
    once; at m_bits=17 it packs to 16 KiB)."""

    def partial(batch: pa.Table) -> pa.Table:
        distinct = batch.select([value_col]).group_by(
            [value_col]).aggregate([])
        pos = bloom_positions(
            distinct.column(value_col).to_pylist(), m_bits=m_bits, k=k)
        return pa.table({"pos": pa.array(pos, type=pa.int64())})

    pos = ds.map_batches(partial, batch_format="pyarrow").unique("pos")
    bitmap = np.zeros(1 << m_bits, dtype=bool)
    if len(pos):
        bitmap[np.asarray(pos, dtype=np.int64)] = True
    return bitmap


def bloom_flag(ds, bitmap: np.ndarray, *, value_col: str, m_bits: int = 12,
               k: int = 4, out_col: str = "bloom_hit"):
    """Append ``out_col`` (int64 0/1): 1 iff ALL k positions of the row's
    value are set. Zero exchange — the packed bitmap rides the object store
    once; each batch hashes its value VOCABULARY (np.unique), not every
    occurrence."""
    import ray

    ref = ray.put(np.packbits(bitmap))
    m = np.uint64(1 << m_bits)

    def probe(batch: pa.Table) -> pa.Table:
        col = [str(v) for v in batch.column(value_col).to_pylist()]
        if not col:
            return batch.append_column(
                out_col, pa.array([], type=pa.int64()))
        uniq, inv = np.unique(np.asarray(col, dtype=object),
                              return_inverse=True)
        bm = np.unpackbits(ray.get(ref)).astype(bool)
        hit = np.ones(len(uniq), dtype=bool)
        for j in range(k):
            p = (md5_hash64([f"{j}:{v}" for v in uniq]) % m).astype(np.int64)
            hit &= bm[p]
        return batch.append_column(
            out_col, pa.array(hit[inv].astype(np.int64)))

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_decontaminate_sql(*, table: str = "documents", text: str = "text",
                            bench_pred: str = "doc_id % 97 = 3",
                            width: int = 4, m_bits: int = 12,
                            k: int = 4) -> str:
    """(ngram, count, bloom_hit, exact_member) re-derivation: DuckDB rebuilds
    the identical bit set from the benchmark's grams and probes the corpus
    gram vocabulary with the identical k positions."""
    m = 1 << m_bits
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH d AS (SELECT doc_id, {toks} AS arr FROM {table}),
        g AS (
          SELECT doc_id,
                 array_to_string(arr[i.i:i.i + {width - 1}], ' ') AS ngram
          FROM d, unnest(generate_series(1, len(arr) - {width - 1})) AS i(i)
        ),
        vocab AS (SELECT ngram, count(*)::BIGINT AS count FROM g GROUP BY 1),
        bench AS (SELECT DISTINCT ngram FROM g WHERE {bench_pred}),
        js AS (SELECT unnest(range({k}))::BIGINT AS j),
        bits AS (
          SELECT DISTINCT (md5_number_upper(js.j || ':' || ngram)::UBIGINT
                           % {m})::BIGINT AS pos
          FROM bench, js
        ),
        probe AS (
          SELECT v.ngram, v.count,
                 (count(b.pos) = {k})::BIGINT AS bloom_hit
          FROM vocab v
          CROSS JOIN js
          LEFT JOIN bits b
            ON b.pos = (md5_number_upper(js.j || ':' || v.ngram)::UBIGINT
                        % {m})::BIGINT
          GROUP BY 1, 2
        )
        SELECT p.ngram, p.count, p.bloom_hit,
               (p.ngram IN (SELECT ngram FROM bench))::BIGINT AS exact_member
        FROM probe p"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch + sketch-space Jaccard
# ---------------------------------------------------------------------------
#
# The third sketch family: where HLL answers only |A|, a KMV sketch (the k
# smallest value hashes) additionally composes across groups — union sketches
# merge by re-taking the k smallest, and the inclusion estimator gives the
# JACCARD between two groups' value sets without ever co-shuffling the
# values (Beyer et al. SIGMOD'07 / the "bottom-k sketch"). This is the
# cheap cross-partition similarity screen: per-group payload is k int64s.
#
# Exactness contract: hashes are 63-bit-masked little-endian md5 (the
# winnow_fingerprints convention — masking keeps the BIGINT SQL compare),
# the estimator is one HUGEINT floor division, and Jaccard is reported in
# exact integer ppm of the merged-sketch inclusion ratio.

_MASK63 = np.uint64((1 << 63) - 1)


def kmv_sketch(ds, *, group_cols, value_col: str, k: int = 64,
               num_buckets: int = 16):
    """(group_cols..., h:int64) — per group, the k smallest 63-bit md5
    hashes of its DISTINCT values (< k rows iff the group has < k distinct
    values, in which case the sketch is exact).

    Per-batch partial: distinct (group, value) -> hash the batch vocabulary
    -> keep k per group (<= k rows per group per batch cross the exchange);
    one group-bucketed fold re-takes the k smallest."""
    group_cols = list(group_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[group_cols + [value_col]].drop_duplicates()
        h = (md5_hash64([str(v) for v in d[value_col]])
             & _MASK63).astype(np.int64)
        out = pd.DataFrame({
            **{c: d[c].to_numpy() for c in group_cols}, "h": h,
        }).drop_duplicates()
        out = out.sort_values(group_cols + ["h"], kind="mergesort")
        return out.groupby(group_cols, sort=False).head(k)

    partials = ds.map_batches(partial, batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(group_cols + ["h"]).sort_values(
            group_cols + ["h"], kind="mergesort")
        return d.groupby(group_cols, sort=False).head(k)

    return bucketed_map_groups(partials, group_cols[0], finish,
                               num_buckets=num_buckets)


def kmv_distinct(sketch_df: pd.DataFrame, *, group_cols, k: int = 64
                 ) -> pd.DataFrame:
    """(group..., sketch_size, kth_hash, distinct_est) from the collected
    sketch table (tiny by construction: <= k rows per group). Estimator:
    exact count below k, else ``(k-1) * 2^63 // kth_hash`` — integer floor,
    mirrored by HUGEINT division in SQL."""
    group_cols = list(group_cols)
    rows = []
    for key, g in sketch_df.groupby(group_cols, sort=False):
        key = key if isinstance(key, tuple) else (key,)
        n = len(g)
        kth = int(g["h"].max())
        est = n if n < k else (k - 1) * (1 << 63) // kth
        rows.append((*key, np.int64(n), np.int64(kth), np.int64(est)))
    return pd.DataFrame(
        rows, columns=group_cols + ["sketch_size", "kth_hash",
                                    "distinct_est"]
    ).sort_values(group_cols).reset_index(drop=True)


def kmv_jaccard(sketch_df: pd.DataFrame, *, group_col: str, k: int = 64
                ) -> pd.DataFrame:
    """All group pairs (a < b): merged-sketch inclusion Jaccard.

    merged = k smallest of the two sketches' union; ``inter_k`` = merged
    hashes present in BOTH sketches; ``jaccard_ppm = inter_k * 10^6 //
    union_k``. Driver finish over the k x |groups| sketch table only."""
    by = {key: set(g["h"].astype("int64"))
          for key, g in sketch_df.groupby(group_col, sort=False)}
    names = sorted(by)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            merged = sorted(by[a] | by[b])[:k]
            union_k = len(merged)
            inter_k = sum(1 for h in merged if h in by[a] and h in by[b])
            rows.append((a, b, np.int64(union_k), np.int64(inter_k),
                         np.int64(inter_k * 1_000_000 // union_k)))
    return pd.DataFrame(
        rows, columns=[f"{group_col}_a", f"{group_col}_b", "union_k",
                       "inter_k", "jaccard_ppm"])


def _kmv_gram_sketch_cte(*, table: str, text: str, group: str, width: int,
                         k: int) -> str:
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH d AS (SELECT {group}, {toks} AS arr FROM {table}),
        g AS (
          SELECT {group},
                 array_to_string(arr[i.i:i.i + {width - 1}], ' ') AS ngram
          FROM d, unnest(generate_series(1, len(arr) - {width - 1})) AS i(i)
        ),
        h AS (
          SELECT DISTINCT {group},
                 (md5_number_upper(ngram)::UBIGINT
                  & 9223372036854775807)::BIGINT AS h
          FROM g
        ),
        rk AS (
          SELECT {group}, h,
                 row_number() OVER (PARTITION BY {group} ORDER BY h) AS rn
          FROM h
        ),
        sk AS (SELECT {group}, h FROM rk WHERE rn <= {k})"""


def kmv_distinct_sql(*, table: str = "documents", text: str = "text",
                     group: str = "lang", width: int = 4,
                     k: int = 64) -> str:
    """DuckDB re-derivation of kmv_sketch + kmv_distinct over per-group
    word n-grams (bit-exact)."""
    cte = _kmv_gram_sketch_cte(table=table, text=text, group=group,
                               width=width, k=k)
    return f"""{cte}
        SELECT {group}, count(*)::BIGINT AS sketch_size,
               max(h)::BIGINT AS kth_hash,
               CASE WHEN count(*) < {k} THEN count(*)::BIGINT
                    ELSE (({k - 1}::HUGEINT
                           * (9223372036854775807::HUGEINT + 1))
                          // max(h))::BIGINT
               END AS distinct_est
        FROM sk GROUP BY 1"""


def kmv_jaccard_sql(*, table: str = "documents", text: str = "text",
                    group: str = "lang", width: int = 4,
                    k: int = 64) -> str:
    """DuckDB re-derivation of kmv_jaccard (bit-exact)."""
    cte = _kmv_gram_sketch_cte(table=table, text=text, group=group,
                               width=width, k=k)
    return f"""{cte},
        pairs AS (
          SELECT a.{group} AS ga, b.{group} AS gb
          FROM (SELECT DISTINCT {group} FROM sk) a
          JOIN (SELECT DISTINCT {group} FROM sk) b ON a.{group} < b.{group}
        ),
        uh AS (
          SELECT p.ga, p.gb, s.h
          FROM pairs p JOIN sk s ON s.{group} IN (p.ga, p.gb)
          GROUP BY 1, 2, 3
        ),
        urk AS (
          SELECT ga, gb, h,
                 row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
          FROM uh
        ),
        merged AS (SELECT ga, gb, h FROM urk WHERE rn <= {k})
        SELECT m.ga AS {group}_a, m.gb AS {group}_b,
               count(*)::BIGINT AS union_k,
               count(*) FILTER (WHERE sa.h IS NOT NULL
                                  AND sb.h IS NOT NULL)::BIGINT AS inter_k,
               (count(*) FILTER (WHERE sa.h IS NOT NULL
                                   AND sb.h IS NOT NULL)::BIGINT
                * 1000000 // count(*)::BIGINT) AS jaccard_ppm
        FROM merged m
        LEFT JOIN sk sa ON sa.{group} = m.ga AND sa.h = m.h
        LEFT JOIN sk sb ON sb.{group} = m.gb AND sb.h = m.h
        GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# rolling-window approximate uniques (HLL register MERGEABILITY)
# ---------------------------------------------------------------------------


def rolling_approx_distinct(ds, *, ts_col: str, value_col: str,
                            window_days: int = 7, p: int = 6,
                            num_buckets: int = 8):
    """(day, approx_distinct, registers_used) — approximate distinct
    ``value_col`` over a trailing ``window_days`` CALENDAR window per day:
    the rolling-uniques dashboard metric that exact distinct cannot serve
    at scale (every day would re-shuffle the whole window's raw values).

    This is the op that cashes in HLL's mergeability: values fold ONCE to
    per-day registers (<= days x m rows total), and every day's window
    estimate is a register-wise max over its window days — computed on
    the collected register table (sketch-sized by construction), never
    touching raw values again. Same estimator constant as
    :func:`approx_distinct` (bit-exact vs the SQL replay)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    m = 1 << p
    C = _alpha(m) * (m * m) * 2.0**64

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.floor_temporal(batch.column(ts_col), unit="day")
        t = pa.table({"day": day, "v": batch.column(value_col)})
        distinct = t.group_by(["day", "v"]).aggregate([])
        vals = [str(v) for v in distinct.column("v").to_pylist()]
        if not vals:
            return pa.table({
                "day": distinct.column("day"),
                "reg": pa.array([], type=pa.int64()),
                "rho": pa.array([], type=pa.int64()),
            })
        j, rho = hll_registers_batch(vals, p)
        reg = pa.table({
            "day": distinct.column("day"),
            "reg": pa.array(j),
            "rho": pa.array(rho),
        })
        return reg.group_by(["day", "reg"]).aggregate(
            [("rho", "max")]).rename_columns(["day", "reg", "rho"])

    regs = bucketed_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["day", "reg"], {"rho": ("rho", "max")}, num_buckets=num_buckets,
    ).to_pandas()  # sketch table: <= |days| x m rows

    day_us = regs["day"].astype("datetime64[us]").astype("int64")
    days = np.sort(day_us.unique())
    day_idx = {d: i for i, d in enumerate(days)}
    mat = np.zeros((len(days), m), dtype=np.int64)
    mat[day_us.map(day_idx).to_numpy(),
        regs["reg"].to_numpy()] = regs["rho"].to_numpy()

    win_us = (window_days - 1) * 86_400_000_000
    rows = []
    for i, d in enumerate(days):  # driver pass over the SKETCH table only
        lo = np.searchsorted(days, d - win_us)
        merged = mat[lo:i + 1].max(axis=0)
        used = merged > 0
        n_used = int(used.sum())
        s = (m - n_used) * 2**64 + sum(
            2 ** (64 - int(r)) for r in merged[used])
        rows.append((d, C / float(s), np.int64(n_used)))
    out = pd.DataFrame(
        rows, columns=["day", "approx_distinct", "registers_used"])
    # keep the engine-wide timestamp[us] contract through the pandas pass
    out["day"] = out["day"].astype("datetime64[us]")
    return out


def rolling_approx_distinct_sql(*, table: str = "events",
                                ts: str = "ts", value_expr: str = "user_id",
                                window_days: int = 7, p: int = 6) -> str:
    """DuckDB re-derivation: same registers, same calendar-window
    register-wise max, same single-division estimator."""
    m = 1 << p
    K = 64 - p
    C = _alpha(m) * (m * m) * 2.0**64
    return f"""
        WITH vals AS (
          SELECT DISTINCT date_trunc('day', {ts}) AS day,
                 ({value_expr})::VARCHAR AS v
          FROM {table}
        ), h AS (
          SELECT day, md5_number_upper(v)::UBIGINT AS h FROM vals
        ), reg AS (
          SELECT day, (h & {m - 1})::BIGINT AS reg,
                 max(CASE WHEN (h >> {p}) = 0 THEN {K + 1}
                          ELSE {K} - length(bin(h >> {p})) + 1
                     END)::BIGINT AS rho
          FROM h GROUP BY 1, 2
        ), days AS (SELECT DISTINCT day FROM reg),
        win AS (
          SELECT d.day, r.reg, max(r.rho) AS rho
          FROM days d JOIN reg r
            ON r.day >= d.day - INTERVAL {window_days - 1} DAY
           AND r.day <= d.day
          GROUP BY 1, 2
        ), agg AS (
          SELECT day, count(*) AS n_used,
                 sum((1::UBIGINT << (64 - rho))::HUGEINT) AS s_present
          FROM win GROUP BY 1
        )
        SELECT day,
               {C!r} / (({m} - n_used)::HUGEINT
                        * 18446744073709551616::HUGEINT
                        + s_present)::DOUBLE AS approx_distinct,
               n_used::BIGINT AS registers_used
        FROM agg"""
