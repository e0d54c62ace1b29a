"""Deterministic sampling operators.

``Dataset.random_sample`` is seed- and shape-dependent (different cluster
sizes draw different rows), which breaks reproducibility contracts and
oracle checks. These samplers are pure functions of the DATA:

  * hash-predicate sampling (1-in-k by stable id hash) lives in the query
    layer (see ``deterministic_sample`` in __ray_entry__.py);
  * :func:`stratified_sample` draws an exact per-stratum fraction, picking
    each stratum's lowest-md5 ids — the same rows on any cluster shape, and
    replayable in SQL (``row_number() OVER (PARTITION BY stratum ORDER BY
    md5(id))``).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from htrc_feature_reader_ray.stages.partition import bucketed_map_groups


def _md5_hex(values) -> np.ndarray:
    return np.fromiter(
        (hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values),
        dtype=object,
        count=len(values),
    )


def stratified_sample(ds, *, stratum_col: str, id_col: str, fraction: float,
                      num_buckets: int = 32):
    """ceil(fraction × n_s) rows from every stratum s, deterministically:
    the stratum's lowest md5(id) rows win. One bucketed exchange on the
    stratum column (all rows of a stratum co-located); everything inside is
    vectorized pandas. Skewed strata are bounded by the per-bucket memory of
    the largest stratum — for web-scale strata (language, domain bucket)
    prefer more buckets over salting, since rank selection is order-exact,
    not commutative."""
    if not 0 < fraction <= 1:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    # exact-rational ceil: float ceil(0.07 * 300) gives 22 (0.07*300 =
    # 21.000000000000004) while SQL DECIMAL arithmetic gives 21 — mirror the
    # SQL replay exactly by taking ceil over the fraction's decimal literal
    from fractions import Fraction

    frac = Fraction(str(fraction))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = _md5_hex(df[id_col].to_numpy())
        df = df.sort_values(["_h", id_col], kind="mergesort")
        g = df.groupby(stratum_col, sort=False)
        sizes = g[id_col].transform("size").to_numpy()
        quota = -(-sizes * frac.numerator // frac.denominator)  # exact ceil
        keep = g.cumcount().to_numpy() < quota
        return df[keep].drop(columns=["_h"])

    return bucketed_map_groups(ds, stratum_col, per_bucket,
                               num_buckets=num_buckets)


def mixture_sample(ds, *, stratum_col: str, id_col: str,
                   fractions: dict, num_buckets: int = 32):
    """Weighted multi-source mixture: an exact per-stratum fraction PER
    STRATUM (``fractions = {stratum: fraction}``; strata absent from the
    map are dropped) — the training-mixture composition op (e.g. 20% of
    web, 50% of books). Same deterministic lowest-md5 selection and
    exact-rational quotas as :func:`stratified_sample`, so the drawn set is
    identical on any cluster shape and SQL-replayable."""
    from fractions import Fraction

    fracs = {k: Fraction(str(v)) for k, v in fractions.items()}
    for k, f in fracs.items():
        if not 0 < f <= 1:
            raise ValueError(f"fraction for {k!r} must be in (0, 1]")
    nums = {k: f.numerator for k, f in fracs.items()}
    dens = {k: f.denominator for k, f in fracs.items()}

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[stratum_col].isin(fracs.keys())]
        if df.empty:
            return df
        df = df.copy()
        df["_h"] = _md5_hex(df[id_col].to_numpy())
        df = df.sort_values(["_h", id_col], kind="mergesort")
        g = df.groupby(stratum_col, sort=False)
        sizes = g[id_col].transform("size").to_numpy()
        num = df[stratum_col].map(nums).to_numpy()
        den = df[stratum_col].map(dens).to_numpy()
        quota = -(-sizes * num // den)  # exact per-stratum ceil
        keep = g.cumcount().to_numpy() < quota
        return df[keep].drop(columns=["_h"])

    return bucketed_map_groups(ds, stratum_col, per_bucket,
                               num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# deterministic global shuffle (training-data ordering)


_SHUF_BUCKET = "_shuf_bucket"
_SHUF_HASH = "_shuf_hash"


def deterministic_shuffle(ds, *, id_col: str, salt: str = "",
                          num_buckets: int = 64):
    """Reproducible global training order: adds ``shuffle_pos`` = the row's
    0-based rank under ``(md5_hash64(salt + id), id)`` order — a pure
    function of the data, so the SAME permutation on any cluster shape
    (``Dataset.random_shuffle`` is neither reproducible nor rank-emitting),
    and SQL-replayable (``row_number() OVER (ORDER BY
    md5_number_upper(...), id)``). Changing ``salt`` draws an independent
    permutation per epoch.

    Distributed rank via the two-pass prefix-scan shape (pack.py:10-16),
    with HASH-RANGE buckets instead of id-range: the multiply-shift bucket
    ``(h >> 32) * B >> 32`` is monotone nondecreasing in ``h`` over the full
    uint64 space, so bucket order == hash order and the per-bucket base
    offsets come from one exclusive scan of B counts on the driver. The
    hash is a pure function of ``id`` and is recomputed per pass — the two
    passes re-execute the upstream pipeline rather than materializing the
    (payload-bearing) corpus; materialize upstream first if it is expensive.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    if not 0 < num_buckets <= 1 << 32:
        raise ValueError(f"num_buckets must be in (0, 2^32], {num_buckets}")

    def hash_ids(ids) -> np.ndarray:
        return md5_hash64([f"{salt}{v}" for v in ids])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = hash_ids(df[id_col].to_numpy())
        df[_SHUF_HASH] = h
        df[_SHUF_BUCKET] = (
            ((h >> np.uint64(32)) * np.uint64(num_buckets))
            >> np.uint64(32)
        ).astype(np.int64)
        return df

    # pass 1: per-bucket row counts (B tiny rows) -> exclusive scan
    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = bucketize(df[[id_col]])
        vc = b[_SHUF_BUCKET].value_counts()
        return pd.DataFrame({
            _SHUF_BUCKET: vc.index.to_numpy(dtype=np.int64),
            "n": vc.to_numpy(dtype=np.int64),
        })

    counts = (
        # project to the id column BEFORE the counting pass so the payload
        # never flows through pass 1 (pushes down to the parquet read)
        ds.select_columns([id_col])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby(_SHUF_BUCKET).sum("n").to_pandas()
    )
    totals = np.zeros(num_buckets, dtype=np.int64)
    if _SHUF_BUCKET in counts.columns:
        totals[counts[_SHUF_BUCKET].to_numpy()] = counts["sum(n)"].to_numpy()
    base = np.concatenate([[0], np.cumsum(totals)[:-1]])

    # pass 2: co-locate each hash-range bucket, sort, assign base + rank
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([_SHUF_HASH, id_col],
                            kind="mergesort").reset_index(drop=True)
        start = int(base[int(df[_SHUF_BUCKET].iloc[0])])
        df["shuffle_pos"] = start + np.arange(len(df), dtype=np.int64)
        return df.drop(columns=[_SHUF_BUCKET, _SHUF_HASH])

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby(_SHUF_BUCKET)
        .map_groups(finish, batch_format="pandas")
    )


def deterministic_shuffle_sql(*, id_col: str, salt: str = "",
                              table: str = "documents",
                              columns: str = "*") -> str:
    """SQL mirror: md5_number_upper == little-endian first 8 md5 bytes ==
    engine md5_hash64 (same identity the simhash/countmin oracles rely
    on)."""
    return f"""
        SELECT {columns},
               (row_number() OVER (
                    ORDER BY md5_number_upper('{salt}' || {id_col}::VARCHAR),
                             {id_col}
                ) - 1)::BIGINT AS shuffle_pos
        FROM {table}"""


# ---------------------------------------------------------------------------
# deterministic train/val/test split


def _split_thresholds(fractions: dict) -> tuple[list, list]:
    """Cumulative exact-rational thresholds over the uint64 hash space.
    ``floor(cum_frac × 2^64)`` — the same integer literals the SQL mirror
    compares against, so assignment is bit-identical."""
    from fractions import Fraction

    names = list(fractions)
    fracs = [Fraction(str(fractions[k])) for k in names]
    if any(f < 0 for f in fracs) or sum(fracs) != 1:
        raise ValueError(
            f"fractions must be >= 0 and sum to exactly 1, got {fractions}"
        )
    cum = []
    acc = Fraction(0)
    for f in fracs[:-1]:  # last split takes the remainder of the space
        acc += f
        cum.append((acc.numerator << 64) // acc.denominator)
    return names, cum


def hash_split(ds, *, fractions: dict, by: str, salt: str = "",
               out_col: str = "split"):
    """Deterministic dataset split (train/val/test): assigns each row a
    split label by the md5 hash of ``by`` — a pure function of the data
    (same assignment on any cluster shape, zero shuffle, one stateless
    ``map_batches``), disjoint and exhaustive by construction.

    Leakage control is the ``by`` column: split on ``doc_id`` for a plain
    row split, or on an ENTITY key (domain, source, author) so all of an
    entity's documents land in the same split and near-duplicates within an
    entity can never straddle the train/eval boundary.

    ``salt`` re-draws an independent assignment. Fractions must sum to
    exactly 1 (exact-rational thresholds over the uint64 hash space — the
    same integer literals as the SQL mirror, so parity is bit-exact).
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    names, cum = _split_thresholds(fractions)
    thresholds = np.array(cum, dtype=np.uint64)
    labels = np.array(names, dtype=object)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64([f"{salt}{v}" for v in df[by].to_numpy()])
        idx = np.searchsorted(thresholds, h, side="right")
        df = df.copy()
        df[out_col] = labels[idx]
        return df

    return ds.map_batches(assign, batch_format="pandas")


def hash_split_sql(*, fractions: dict, by: str, salt: str = "",
                   table: str = "documents", columns: str = "*",
                   out_col: str = "split") -> str:
    """SQL mirror: the identical integer thresholds compared against
    ``md5_number_upper`` (== engine ``md5_hash64``)."""
    names, cum = _split_thresholds(fractions)
    h = f"md5_number_upper('{salt}' || {by}::VARCHAR)"
    branches = "".join(
        f"WHEN {h} < {t}::UBIGINT THEN '{n}' "
        for n, t in zip(names[:-1], cum)
    )
    return f"""
        SELECT {columns},
               CASE {branches}ELSE '{names[-1]}' END AS {out_col}
        FROM {table}"""


def group_kfold(ds, *, by: str, k: int, salt: str = "",
                out_col: str = "fold"):
    """Group-aware k-fold cross-validation assignment: every row gets
    ``fold = md5(salt‖by) mod k`` — so ALL rows sharing the group key land
    in the same fold, the property that makes CV honest when rows within a
    group are correlated (a user's events, a domain's documents, an
    author's posts: scikit-learn's GroupKFold contract, realized as a pure
    function of the data instead of an index-ordered partition, so the
    assignment is identical on any cluster shape and any row order,
    zero-shuffle, one stateless ``map_batches``).

    :func:`hash_split` is the same idea for ONE named split; k-fold is the
    rotation form (evaluate k times, each fold held out once). Folds are
    hash-balanced, not exactly equal-sized — the price of purity, and what
    every production hash-splitter accepts. ``salt`` re-draws an
    independent fold structure.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64([f"{salt}{v}" for v in df[by].to_numpy()])
        df = df.copy()
        df[out_col] = (h % np.uint64(k)).astype(np.int64)
        return df

    return ds.map_batches(assign, batch_format="pandas")


def group_kfold_sql(*, by: str, k: int, salt: str = "",
                    table: str = "documents", columns: str = "*",
                    out_col: str = "fold") -> str:
    """SQL mirror: ``md5_number_upper`` == engine ``md5_hash64`` (the
    deterministic_shuffle identity); UBIGINT mod matches uint64 mod."""
    return f"""
        SELECT {columns},
               (md5_number_upper('{salt}' || {by}::VARCHAR)
                % {k}::UBIGINT)::BIGINT AS {out_col}
        FROM {table}"""


# ---------------------------------------------------------------------------
# per-host document cap (anti-domination quota)


_CAP_HASH = "_cap_hash"


def host_cap(ds, *, host_col: str, id_col: str, k: int, salt: str = "",
             num_buckets: int = 32, rank_col: str = "cap_rank"):
    """C4/CCNet-style anti-domination quota: keep at most ``k`` documents
    per host, chosen by deterministic hash order over ``id_col`` — a
    reproducible uniform subsample WITHIN each host, independent of input
    order and partitioning (head-of-scan caps keep whatever the crawler
    happened to fetch first; a hash-order cap is an unbiased draw).

    Composition, not new machinery: one stateless hash projection, then the
    lossless local-top-k combiner (``fold.topk_per_group`` ascending) — the
    exchange carries ≤ hosts×k rows per input batch, so a 10⁹-doc corpus
    with a 10⁴-doc megasite costs the same shuffle as a balanced one.
    ``rank_col`` emits the 1-based within-host rank (< k means the host is
    under quota; SQL: ``row_number() OVER (PARTITION BY host ORDER BY
    md5_number_upper(salt||id), id)``).
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.fold import topk_per_group

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[_CAP_HASH] = md5_hash64(
            [f"{salt}{v}" for v in df[id_col].to_numpy()]
        )
        return df

    capped = topk_per_group(
        ds.map_batches(add_hash, batch_format="pandas"),
        group_cols=[host_col], sort_col=_CAP_HASH, k=k,
        tie_cols=[id_col], descending=False, num_buckets=num_buckets,
        rank_col=rank_col,
    )
    return capped.drop_columns([_CAP_HASH])


def host_cap_sql(*, host_expr: str, id_col: str, k: int, salt: str = "",
                 table: str = "documents", columns: str = "*",
                 rank_col: str = "cap_rank") -> str:
    """SQL mirror (same md5_number_upper == md5_hash64 identity as the
    shuffle/split oracles; HUGEINT order == uint64 order)."""
    h = f"md5_number_upper('{salt}' || {id_col}::VARCHAR)"
    return f"""
        SELECT * FROM (
          SELECT {columns},
                 row_number() OVER (
                     PARTITION BY {host_expr}
                     ORDER BY {h}, {id_col}
                 )::BIGINT AS {rank_col}
          FROM {table}
        ) WHERE {rank_col} <= {k}"""


def temperature_weights(ds, *, stratum_col: str, num_buckets: int = 16):
    """α=½ temperature-rebalanced mixture weights per stratum — the
    multilingual corpus-sampling recipe (mC4 / XLM-R style): sampling
    probability ∝ p_stratum^α flattens the head so low-resource strata
    are not drowned, and α=½ is the one temperature with an EXACT integer
    form — ``r = isqrt(n)`` (⌊√n⌋, correct for all int64 where float
    ``pow(p, α)`` is neither correctly rounded nor cross-engine stable).

    ``weight_ppm = isqrt(n_stratum)·10⁶ // Σ_s isqrt(n_s)`` — feed it to
    :func:`mixture_sample` as the fraction map (scaled by the desired
    corpus size) to draw the rebalanced mixture.

    Scale shape: ONE count fold to the stratum table (bounded: languages
    / sources), finish on the driver over those rows only.  Output
    ``(stratum_col, n_rows, weight_ppm)``.
    """
    import math

    import pyarrow as pa

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([stratum_col]).group_by(stratum_col).aggregate(
            [([], "count_all")])
        return g.rename_columns([stratum_col, "n_rows"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        stratum_col, {"n_rows": ("n_rows", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    r = folded["n_rows"].map(lambda n: math.isqrt(int(n)))
    denom = int(r.sum())
    folded["weight_ppm"] = (
        (r.astype(object) * 1_000_000) // max(denom, 1)
    ).astype("int64")
    folded["n_rows"] = folded["n_rows"].astype("int64")
    import ray.data

    return ray.data.from_pandas(
        folded[[stratum_col, "n_rows", "weight_ppm"]])


def temperature_weights_sql(*, stratum_col: str, table: str) -> str:
    """SQL mirror. ``isqrt`` is rebuilt exactly from the float sqrt with a
    ±1 correction (float sqrt of a BIGINT can land one off around perfect
    squares; the two CASE terms repair both directions)."""

    def isqrt(x: str) -> str:
        s = f"CAST(floor(sqrt(({x})::DOUBLE)) AS BIGINT)"
        return (f"({s} + (CASE WHEN ({s}+1)*({s}+1) <= ({x}) THEN 1 ELSE 0 END)"
                f" - (CASE WHEN {s}*{s} > ({x}) THEN 1 ELSE 0 END))")

    return f"""
        WITH c AS (
          SELECT {stratum_col}, count(*)::BIGINT AS n_rows FROM {table}
          GROUP BY 1
        ),
        r AS (SELECT {stratum_col}, n_rows, {isqrt('n_rows')} AS rt FROM c),
        d AS (SELECT greatest(sum(rt), 1)::HUGEINT AS denom FROM r)
        SELECT {stratum_col}, n_rows,
               (rt::HUGEINT * 1000000 // d.denom)::BIGINT AS weight_ppm
        FROM r, d"""


# ---------------------------------------------------------------------------
# deterministic mixture interleave (stride-scheduled data mixing)


def mixture_interleave(ds, *, source_col: str, id_col: str, weights: dict,
                       salt: str = "", num_buckets: int = 64):
    """Deterministic weighted interleave of sources into one training
    order — the data-mixing schedule (GLaM / DoReMi-style source
    weighting) made reproducible. Each source's stream is deterministically
    shuffled (md5 order, cf. :func:`deterministic_shuffle`), then streams
    merge by STRIDE SCHEDULING (Waldspurger & Weihl, OSDI '95): item
    ``r`` of source ``s`` gets

        mix_key = ((2·r + 1) · 10⁶) // (2 · w_s)

    — the exact-integer pass value whose ascending order interleaves
    sources proportionally to their weights with low discrepancy (any
    prefix of the order holds ≈ P·w_s/W items of source ``s``, error
    bounded by the number of sources). The training order is
    ``ORDER BY (mix_key, source, src_rank)`` — a pure function of the
    data, identical on any cluster shape, replayable in SQL.

    Unknown sources fail loudly (weights is the complete contract);
    weights are positive ints. Output adds ``src_rank`` (0-based rank
    within the source under (md5(salt+id), id)) and ``mix_key``.

    Scale shape: the per-source dense rank uses the two-pass
    prefix-scan (pass 1: (hash-range bucket × source) counts — a
    B×S-row fold; pass 2: one bucketed exchange co-locates each
    hash-range bucket, ranks all its sources in one lexsort). The
    final total order is the CONSUMER's sort (or a range-partitioned
    write keyed on mix_key) — the op itself never global-sorts.
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    for s, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weights must be positive ints, got {s}={w}")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        df[_SHUF_HASH] = h
        df[_SHUF_BUCKET] = (
            ((h >> np.uint64(32)) * np.uint64(num_buckets))
            >> np.uint64(32)
        ).astype(np.int64)
        return df

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = bucketize(df[[id_col, source_col]])
        g = b.groupby([_SHUF_BUCKET, source_col], sort=False,
                      as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = (
        ds.select_columns([id_col, source_col])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby([_SHUF_BUCKET, source_col]).sum("n").to_pandas()
    )
    # exclusive per-source prefix over hash-range buckets (driver, B×S rows)
    base: dict = {}
    if len(counts):
        counts = counts.sort_values([source_col, _SHUF_BUCKET])
        for src, grp in counts.groupby(source_col, sort=False):
            if src not in weights:
                raise KeyError(
                    f"source {src!r} has no weight — weights must cover "
                    f"every source value")
            n = grp["sum(n)"].to_numpy(dtype=np.int64)
            offs = np.concatenate([[0], np.cumsum(n)[:-1]])
            base[src] = dict(zip(grp[_SHUF_BUCKET].to_numpy(), offs))

    wmap = dict(weights)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([_SHUF_HASH, id_col],
                            kind="mergesort").reset_index(drop=True)
        bkt = int(df[_SHUF_BUCKET].iloc[0])
        rank = df.groupby(source_col, sort=False).cumcount().to_numpy()
        offs = np.fromiter(
            (base[s][bkt] for s in df[source_col]),
            dtype=np.int64, count=len(df))
        r = rank + offs
        w = np.fromiter((wmap[s] for s in df[source_col]),
                        dtype=np.int64, count=len(df))
        df["src_rank"] = r
        df["mix_key"] = ((2 * r + 1) * 1_000_000) // (2 * w)
        return df.drop(columns=[_SHUF_BUCKET, _SHUF_HASH])

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby(_SHUF_BUCKET)
        .map_groups(finish, batch_format="pandas")
    )


def mixture_interleave_sql(*, source_col: str, id_col: str, weights: dict,
                           salt: str = "", table: str = "documents",
                           columns: str = "*") -> str:
    """SQL mirror: per-source row_number under the identical md5 order,
    the same stride formula; weights render as a CASE over the dict."""
    case = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(weights.items()))
    return f"""
        SELECT {columns},
               (row_number() OVER (
                    PARTITION BY {source_col}
                    ORDER BY md5_number_upper('{salt}' || {id_col}::VARCHAR),
                             {id_col}
                ) - 1)::BIGINT AS src_rank,
               ((2 * (row_number() OVER (
                    PARTITION BY {source_col}
                    ORDER BY md5_number_upper('{salt}' || {id_col}::VARCHAR),
                             {id_col}
                ) - 1) + 1) * 1000000
                // (2 * (CASE {source_col} {case} END)))::BIGINT AS mix_key
        FROM {table}"""


# ---------------------------------------------------------------------------
# deterministic weight-proportional bottom-k sampling

_WS_PRI = "__ws_priority"
_WS_ONE = "__ws_const"


def weighted_sample(ds, *, id_col: str, weight_col: str, k: int,
                    salt: str = "", num_buckets: int = 8):
    """Deterministic weight-proportional sample WITHOUT replacement — the
    integer-exact cousin of Efraimidis–Spirakis A-ES priority sampling
    (IPL'06): each row draws priority ``md5_64(salt||id) // weight`` and
    the k SMALLEST priorities win.  For a uniform 64-bit hash, ``h/w`` is
    an exponentially-distributed order key with rate ``w``, so heavier
    rows win proportionally more often; the floor-division form keeps the
    whole order integer-exact, input-order/partitioning-independent, and
    SQL-replayable (``md5_number_upper // w`` — HUGEINT order equals
    uint64 order).  Rows with ``weight <= 0`` are excluded by contract.

    Composition, not new machinery: one stateless hash projection, then
    the lossless local-bottom-k combiner (:func:`..fold.topk_per_group`
    ascending over a constant group) — the exchange carries ≤ k rows per
    input batch regardless of corpus size.  Output: the sampled rows plus
    a 1-based ``sample_rank`` by (priority, id)."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.fold import topk_per_group

    def add_priority(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[weight_col] > 0].copy()
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        df[_WS_PRI] = h // df[weight_col].to_numpy().astype(np.uint64)
        df[_WS_ONE] = np.int64(0)
        return df

    out = topk_per_group(
        ds.map_batches(add_priority, batch_format="pandas"),
        group_cols=[_WS_ONE], sort_col=_WS_PRI, k=k,
        tie_cols=[id_col], descending=False, num_buckets=num_buckets,
        rank_col="sample_rank",
    )
    return out.drop_columns([_WS_PRI, _WS_ONE])


def weighted_sample_sql(*, table: str, id_col: str, weight_expr: str,
                        k: int, salt: str = "", columns: str = "*") -> str:
    """SQL mirror of :func:`weighted_sample`."""
    h = f"md5_number_upper('{salt}' || {id_col}::VARCHAR)"
    return f"""
        SELECT * FROM (
          SELECT {columns},
                 row_number() OVER (
                     ORDER BY {h} // ({weight_expr})::UBIGINT, {id_col}
                 )::BIGINT AS sample_rank
          FROM {table} WHERE ({weight_expr}) > 0
        ) WHERE sample_rank <= {k}"""


def shuffle_audit(ds, *, id_col: str, cat_col: str, salt: str = "",
                  num_buckets: int = 64):
    """Shuffle-quality audit: does the canonical training order actually
    interleave ``cat_col`` (source / language / shard-of-origin)? A bad
    shuffle — or ingestion that was never shuffled — leaves long
    same-source runs, and same-source runs are what produce the loss
    spikes and forgetting curves a training run debugs far too late
    (this is the pre-flight check, run BEFORE tokens ship). Measures,
    under the engine-wide ``(md5_64(salt||id), id)`` order
    (:func:`deterministic_shuffle`'s permutation), each category's
    adjacent same-pair count against the exchangeability expectation:

      ``obs_ppm = n_adj_same·10⁶ // (N−1)``
      ``exp_ppm = n_s·(n_s−1)·10⁶ // (N·(N−1))``

    (each adjacent pair attributed to its LATER row's category; the
    expectation is exact under permutation exchangeability, not an
    approximation). obs ≫ exp for any category means clumping.

    Scale shape: ONE hash-range-bucketed exchange of (id, cat) rows only
    (payload pruned before the pass); the multiply-shift bucket is
    monotone in the hash, so buckets tile the global order and each
    bucket's adjacency is computed vectorized in-bucket; the B
    cross-bucket boundary pairs plus the per-(bucket, cat) partials —
    an audit-sized table — finish on the driver with Python-int
    arithmetic (N² overflows int64 at 10¹⁰ rows; the SQL mirror carries
    HUGEINT)."""
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, cat_col]].copy()
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        df["_h"] = h
        df["_b"] = (
            ((h >> np.uint64(32)) * np.uint64(num_buckets))
            >> np.uint64(32)
        ).astype(np.int64)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", id_col],
                            kind="mergesort").reset_index(drop=True)
        cats = df[cat_col].to_numpy()
        n = pd.Series(cats).value_counts()
        same = cats[1:] == cats[:-1]
        adj = pd.Series(cats[1:][same]).value_counts()
        out = pd.DataFrame({
            "b": int(df["_b"].iloc[0]),
            cat_col: n.index,
            "n": n.to_numpy(dtype=np.int64),
            "adj": adj.reindex(n.index, fill_value=0)
                      .to_numpy(dtype=np.int64),
        })
        out["first_cat"] = (out[cat_col] == cats[0]).astype(np.int64)
        out["last_cat"] = (out[cat_col] == cats[-1]).astype(np.int64)
        return out

    partials = (
        ds.select_columns([id_col, cat_col])
        .map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )

    # stitch the B−1 cross-bucket boundary pairs in global bucket order
    adj_tot = partials.groupby(cat_col)["adj"].sum().astype(object)
    prev_last = None
    for b in sorted(partials["b"].unique()):
        sub = partials[partials["b"] == b]
        first = sub.loc[sub["first_cat"] == 1, cat_col].iloc[0]
        if prev_last is not None and prev_last == first:
            adj_tot[first] += 1
        prev_last = sub.loc[sub["last_cat"] == 1, cat_col].iloc[0]

    n_tot = partials.groupby(cat_col)["n"].sum().astype(object)
    n = int(n_tot.sum())
    rows = []
    for cat in sorted(n_tot.index):
        ns, a = int(n_tot[cat]), int(adj_tot[cat])
        rows.append((
            cat, ns, a,
            a * 1_000_000 // max(n - 1, 1),
            ns * (ns - 1) * 1_000_000 // max(n * (n - 1), 1),
        ))
    out = pd.DataFrame(rows, columns=[cat_col, "n_rows", "n_adj_same",
                                      "obs_ppm", "exp_ppm"])
    for c in ("n_rows", "n_adj_same", "obs_ppm", "exp_ppm"):
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def shuffle_audit_sql(*, id_col: str, cat_col: str, salt: str = "",
                      table: str = "documents") -> str:
    """SQL mirror: window lag over the identical md5 order, HUGEINT
    expectation."""
    return f"""
        WITH ord AS (
          SELECT {cat_col} AS cat,
                 row_number() OVER (
                   ORDER BY md5_number_upper('{salt}' || {id_col}::VARCHAR),
                            {id_col}) AS pos
          FROM {table}
        ),
        adj AS (
          SELECT cat,
                 CASE WHEN lag(cat) OVER (ORDER BY pos) = cat
                      THEN 1 ELSE 0 END AS same
          FROM ord
        ),
        s AS (
          SELECT cat, count(*)::BIGINT AS n_rows,
                 sum(same)::BIGINT AS n_adj_same
          FROM adj GROUP BY 1
        ),
        tot AS (SELECT sum(n_rows)::HUGEINT AS n FROM s)
        SELECT cat AS {cat_col}, n_rows, n_adj_same,
               (n_adj_same::HUGEINT * 1000000
                // greatest(tot.n - 1, 1))::BIGINT AS obs_ppm,
               (n_rows::HUGEINT * (n_rows - 1) * 1000000
                // greatest(tot.n * (tot.n - 1), 1))::BIGINT AS exp_ppm
        FROM s, tot"""


def unimax_epochs(ds, *, group_col: str, weight_col: str, budget: int,
                  max_epochs: int = 4, num_buckets: int = 16):
    """UniMax token-budget allocation (Chung et al., ICLR 2023): given a
    total training budget and a per-source repeat cap, water-fill the
    budget across sources — visit sources by ASCENDING size; each gets
    ``min(max_epochs·n_s, remaining // sources_left)``; whatever a small
    source cannot absorb flows to the larger ones. This is the
    principled replacement for temperature sampling when repeats are
    what you actually control: no source exceeds ``max_epochs`` passes
    (the overfitting guard temperature mixing cannot express) and the
    budget is used exactly up to cap-induced slack.

    Exactness contract: the greedy loop is pure integer arithmetic over
    the sorted ``(n_s, group)`` order — deterministic, partitioning-
    independent, and replayed by a recursive CTE in the SQL mirror.
    Output per source: ``(group_col, n_tokens, alloc_tokens,
    epochs_ppm)`` with ``epochs_ppm = alloc·10⁶ // max(n_s, 1)`` (a
    zero-token source reports 0 by contract).

    Scale shape: ONE weight-sum fold to the bounded source table, then
    the S-step greedy on the driver in Python ints (budget·10⁶ can
    exceed int64 at web scale; HUGEINT mirrors it).
    """
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, weight_col]).group_by(
            group_col).aggregate([(weight_col, "sum")])
        return g.rename_columns([group_col, "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, {"n": ("n", "sum")}, num_buckets=num_buckets,
    ).to_pandas()

    folded = folded.sort_values(
        ["n", group_col]).reset_index(drop=True)
    remaining = int(budget)
    rows = []
    s_left = len(folded)
    for _, r in folded.iterrows():
        n_s = int(r["n"])
        alloc = min(max_epochs * n_s, remaining // s_left)
        remaining -= alloc
        s_left -= 1
        rows.append((r[group_col], n_s, alloc,
                     alloc * 1_000_000 // max(n_s, 1)))
    out = pd.DataFrame(rows, columns=[group_col, "n_tokens",
                                      "alloc_tokens", "epochs_ppm"])
    for c in ("n_tokens", "alloc_tokens", "epochs_ppm"):
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def unimax_epochs_sql(*, group_expr: str, group_alias: str,
                      weight_expr: str, table: str, budget: int,
                      max_epochs: int = 4) -> str:
    """SQL mirror: recursive CTE walks the identical ascending-(n, group)
    order carrying the remaining budget."""
    return f"""
        WITH RECURSIVE src AS (
          SELECT {group_expr} AS g, sum({weight_expr})::BIGINT AS n
          FROM {table} GROUP BY 1
        ),
        ranked AS (
          SELECT g, n,
                 row_number() OVER (ORDER BY n, g) AS rk,
                 count(*) OVER () AS s_total
          FROM src
        ),
        alloc AS (
          SELECT rk, g, n, s_total,
                 least({max_epochs} * n,
                       {budget} // s_total) AS a,
                 {budget}::HUGEINT
                   - least({max_epochs} * n, {budget} // s_total) AS rem
          FROM ranked WHERE rk = 1
          UNION ALL
          SELECT s.rk, s.g, s.n, s.s_total,
                 least({max_epochs} * s.n,
                       (a.rem // (s.s_total - s.rk + 1))::BIGINT),
                 a.rem - least({max_epochs} * s.n,
                               (a.rem // (s.s_total - s.rk + 1))::BIGINT)
          FROM ranked s JOIN alloc a ON s.rk = a.rk + 1
        )
        SELECT g AS {group_alias}, n AS n_tokens, a::BIGINT AS alloc_tokens,
               (a::HUGEINT * 1000000 // greatest(n, 1))::BIGINT
                   AS epochs_ppm
        FROM alloc"""


# ---------------------------------------------------------------------------
# purged temporal train/test split with embargo (leakage-safe eval split)


def temporal_split(ds, *, ts_col: str, test_num: int = 1, test_den: int = 5,
                   embargo_us: int = 86_400_000_000, out_col: str = "split"):
    """Leakage-safe time-based train/test split with an embargo gap — the
    eval split a point-in-time feature pipeline actually needs (de Prado,
    *Advances in Financial Machine Learning* ch.7 "purged" splits, single
    boundary form). :func:`hash_split` guarantees entity disjointness but
    is blind to TIME: features built with lookback windows (lag/lead,
    rolling, as-of) let a train row within one window-length of the test
    boundary see test-period information. The fix is structural — cut at
    a time boundary ``T`` and PURGE the embargo band before it:

      * ``ts >= T``                  → ``'test'``
      * ``ts <  T - embargo_us``     → ``'train'``
      * otherwise                    → ``'embargo'`` (excluded from both)

    so no train row lies within ``embargo_us`` of any test row, by
    construction. Rows are labeled, not dropped — the embargo band stays
    auditable (and countable) downstream.

    ``T`` is derived deterministically from the data's own time range by
    exact integer lerp: ``T = mn + (mx - mn) * (test_den - test_num) //
    test_den`` over epoch-µs bounds, i.e. the last ``test_num/test_den``
    of the observed span is the test period. Both ``//`` operands are
    non-negative so Python floor and DuckDB's truncating ``//`` agree.

    Scale shape: two tiny global folds (min/max of the timestamp column —
    Ray pre-aggregates per block, only two scalars reach the driver),
    then ONE stateless vectorized labeling pass against two broadcast
    int literals. Zero exchange; assignment is a pure function of the
    row's timestamp and the corpus bounds, identical on any cluster
    shape. Generalizes the reference's strict watermark discipline
    (see SURVEY §2.4; feature_reader parity: no analog — the reference
    has no train/eval machinery) to the train/eval boundary itself."""
    mn_us = int(pd.Timestamp(ds.min(ts_col)).value // 1000)
    mx_us = int(pd.Timestamp(ds.max(ts_col)).value // 1000)
    if test_num <= 0 or test_den <= test_num:
        raise ValueError("need 0 < test_num < test_den")
    cut_us = mn_us + (mx_us - mn_us) * (test_den - test_num) // test_den
    lo_us = cut_us - int(embargo_us)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        lab = np.where(t >= cut_us, "test",
                       np.where(t < lo_us, "train", "embargo"))
        df = df.copy()
        df[out_col] = lab
        return df

    return ds.map_batches(assign, batch_format="pandas")


def temporal_split_sql(*, table: str, ts_col: str, id_cols: str,
                       test_num: int = 1, test_den: int = 5,
                       embargo_us: int = 86_400_000_000,
                       out_col: str = "split") -> str:
    """SQL mirror: identical integer lerp over the min/max epoch-µs CTE."""
    return f"""
        WITH b AS (
          SELECT epoch_us(min({ts_col})) AS mn, epoch_us(max({ts_col})) AS mx
          FROM {table}
        ),
        c AS (
          SELECT mn + (mx - mn) * {test_den - test_num} // {test_den} AS cut
          FROM b
        )
        SELECT {id_cols},
               CASE WHEN epoch_us({ts_col}) >= c.cut THEN 'test'
                    WHEN epoch_us({ts_col}) < c.cut - {int(embargo_us)}
                        THEN 'train'
                    ELSE 'embargo' END AS {out_col}
        FROM {table}, c"""


# ---------------------------------------------------------------------------
# fixed-size eval-set construction: Hamilton apportionment + hash selection


def eval_quota(ds, *, stratum_col: str, id_col: str, k: int,
               salt: str = "", num_buckets: int = 16):
    """Fixed-size stratified eval-set selection: apportion EXACTLY ``k``
    slots across strata proportional to their counts by the
    largest-remainder (Hamilton) method, then fill each stratum's quota
    with its deterministically-lowest-hash members. The gap this closes:
    :func:`stratified_sample` keeps a FRACTION per stratum (output size
    floats with the corpus), while an eval suite needs an exact budget —
    "give me 10,000 docs, proportionally by language, same set on any
    cluster shape, every run".

    Hamilton apportionment (the unique quota-monotone divisor-free
    method; used by most national censuses): ``q_s = k·n_s // N``, the
    ``k − Σq_s`` leftover slots go to the largest remainders
    ``k·n_s % N`` (stratum ascending on ties). Exact-integer — no float
    shares — and for ``k ≤ N`` no stratum is ever over-allocated
    (``floor(k·n_s/N) < n_s`` when k < N, so +1 stays ≤ n_s). ``k > N``
    raises. Selection per stratum = the ``q_s`` smallest
    ``md5_64(salt||id)`` (id ascending on hash ties) — a pure function
    of the data, so the suite is reproducible across runs, partitions
    and cluster sizes, and re-salting draws an independent suite.

    Scale shape: ONE bounded stratum-count fold → the Hamilton greedy on
    the driver over |strata| rows in Python ints (k·n_s passes int64 at
    web scale) → broadcast quota table; selection reuses the lossless
    local-bottom-q combiner (any row outside its batch's per-stratum
    bottom-q cannot be in the global bottom-q) so the exchange carries
    ≤ strata·q rows per batch into one stratum-bucketed finish."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    counts = (
        ds.map_batches(
            lambda t: t.group_by(stratum_col).aggregate([([], "count_all")])
            .rename_columns([stratum_col, "n"]),
            batch_format="pyarrow")
        .to_pandas()
        .groupby(stratum_col, as_index=False)["n"].sum()
        .sort_values(stratum_col)
    )
    n_total = int(counts["n"].sum())
    if k > n_total:
        raise ValueError(f"k={k} exceeds corpus size {n_total}")
    base = {s: int(k) * int(n) // n_total
            for s, n in zip(counts[stratum_col], counts["n"])}
    rem = sorted(
        ((int(k) * int(n) % n_total, s)
         for s, n in zip(counts[stratum_col], counts["n"])),
        key=lambda t: (-t[0], t[1]),
    )
    leftover = int(k) - sum(base.values())
    for _, s in rem[:leftover]:
        base[s] += 1
    quota = base  # stratum -> exact slot count, sums to k

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        out = df[[stratum_col, id_col]].copy()
        out["_h"] = h
        out["_q"] = out[stratum_col].map(quota).fillna(0).astype(np.int64)
        out = out.sort_values(["_h", id_col])
        keep = out.groupby(stratum_col, sort=False).cumcount() < out["_q"]
        return out.loc[keep, [stratum_col, id_col, "_h"]]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[[stratum_col, id_col]]
        df = df.sort_values(["_h", id_col])
        q = df[stratum_col].map(quota).fillna(0).astype(np.int64)
        keep = df.groupby(stratum_col, sort=False).cumcount() < q
        return df.loc[keep, [stratum_col, id_col]]

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    return bucketed_map_groups(pruned, stratum_col, finish,
                               num_buckets=num_buckets)


def eval_quota_sql(*, table: str, stratum: str, id_col: str, k: int,
                   salt: str = "") -> str:
    """SQL mirror: Hamilton quota CTE (identical integer arithmetic and
    (remainder DESC, stratum ASC) leftover rank), then per-stratum
    row_number over (md5_number_upper, id)."""
    h = f"md5_number_upper('{salt}' || {id_col}::VARCHAR)"
    return f"""
        WITH c AS (
          SELECT {stratum} AS s, count(*)::BIGINT AS n FROM {table}
          GROUP BY 1
        ),
        tot AS (SELECT sum(n)::BIGINT AS nt FROM c),
        q AS (
          SELECT s, {k}::HUGEINT * n // tot.nt AS base,
                 row_number() OVER (
                   ORDER BY {k}::HUGEINT * n % tot.nt DESC, s ASC) AS r
          FROM c, tot
        ),
        lo AS (SELECT ({k} - sum(base))::BIGINT AS l FROM q),
        quota AS (
          SELECT s, (base + CASE WHEN r <= lo.l THEN 1 ELSE 0 END)::BIGINT
                     AS qq
          FROM q, lo
        ),
        ranked AS (
          SELECT {stratum} AS s, {id_col} AS id,
                 row_number() OVER (
                   PARTITION BY {stratum} ORDER BY {h}, {id_col}) AS rn
          FROM {table}
        )
        SELECT ranked.s AS {stratum}, ranked.id AS {id_col}
        FROM ranked JOIN quota USING (s)
        WHERE ranked.rn <= quota.qq"""


# ---------------------------------------------------------------------------
# effective sample size under importance weights (Kish ESS)


def effective_sample_size(ds, *, group_col: str, weight_col: str,
                          num_buckets: int = 16):
    """Per-group Kish effective sample size under a weight column, in
    exact integer ppm of the group's row count — the diagnostic every
    importance-weighted pass (DSIR selection scores, temperature
    weights, dedup-survivor weights) owes its consumer: ``ESS =
    (Σw)² / Σw²`` is how many UNWEIGHTED samples the weighted group is
    statistically worth, so ``ess_ppm = (Σw)²·10⁶ // (n·Σw²)`` near 10⁶
    means the weights are nearly uniform (reweighting is a no-op) and a
    small value means a few heavy rows dominate — the signal to clip or
    resample before training variance explodes (Kish 1965; the standard
    particle-filter degeneracy check).

    Weights must be non-negative integers (the engine-wide cents/ppm
    quantization); rows with w = 0 count in ``n_rows`` but contribute
    nothing (documented). Groups with Σw = 0 report 0.

    Scale shape: per-batch (group, Σw, Σw², n) Arrow partials collapse
    the stream map-side, one audit-sized group fold, Python-int finish —
    (Σw)² passes int64 at web scale, HUGEINT carries the mirror."""

    def partial(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).cast(pa.int64())
        tb = pa.table({
            group_col: batch.column(group_col),
            "s": w,
            "q": pa.compute.multiply_checked(w, w),
        })
        g = tb.group_by(group_col).aggregate(
            [("s", "sum"), ("q", "sum"), ([], "count_all")])
        return g.rename_columns([group_col, "s", "q", "n"])

    small = (ds.map_batches(partial, batch_format="pyarrow")
             .to_pandas()
             .groupby(group_col, as_index=False)
             .agg(s=("s", "sum"), q=("q", "sum"), n=("n", "sum"))
             .sort_values(group_col))
    ess = [
        (int(s) * int(s) * 1_000_000 // (int(n) * int(q))
         if int(q) > 0 else 0)
        for s, q, n in zip(small["s"], small["q"], small["n"])
    ]
    out = pd.DataFrame({
        group_col: small[group_col].to_numpy(),
        "n_rows": small["n"].to_numpy().astype(np.int64),
        "sum_w": small["s"].to_numpy().astype(np.int64),
        "ess_ppm": np.array(ess, dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def effective_sample_size_sql(*, table: str, group: str,
                              weight_expr: str) -> str:
    """SQL mirror: HUGEINT moment fold."""
    return f"""
        WITH w AS (
          SELECT {group} AS g, ({weight_expr})::BIGINT AS w FROM {table}
        )
        SELECT g AS {group}, count(*)::BIGINT AS n_rows,
               sum(w)::BIGINT AS sum_w,
               CASE WHEN sum(w * w::HUGEINT) > 0 THEN
                 (sum(w)::HUGEINT * sum(w) * 1000000
                  // (count(*)::HUGEINT * sum(w * w::HUGEINT)))::BIGINT
               ELSE 0 END AS ess_ppm
        FROM w GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# curriculum ordering (phase-staged deterministic training order)


def curriculum_order(ds, *, phase_col: str, id_col: str, salt: str = "",
                     num_buckets: int = 64):
    """Curriculum training order: global 0-based ``curriculum_pos`` under
    ``(phase ASC, md5_hash64(salt||id), id)`` — all of phase 0 (easy)
    before any of phase 1, SHUFFLED within each phase (Bengio et al.
    ICML'09: curriculum gains come from the stage ordering, while
    in-phase shuffling keeps gradients i.i.d. inside a stage; a sort by
    raw difficulty would re-introduce length/quality autocorrelation in
    the batch stream, which is exactly what :func:`shuffle_audit`
    flags). Same purity contract as :func:`deterministic_shuffle`: a
    pure function of the data, identical on any cluster shape,
    re-salting redraws the in-phase order without touching the stages.

    Phase cardinality is bounded by contract (quartile/decile-style
    difficulty buckets — the caller derives them with
    ``quantile_bucketize`` or a cheap heuristic).

    Scale shape: deterministic_shuffle's two-pass prefix-scan lifted to
    the composite key — pass 1 folds (phase, hash-range-bucket) counts
    (≤ P·B tiny rows) for one driver exclusive scan in (phase, bucket)
    lexicographic order; pass 2 co-locates each composite bucket (the
    multiply-shift bucket is monotone in the hash, so composite-bucket
    order == global key order), sorts in-bucket and assigns
    ``base + arange``. Payload-free pass 1 (projects to the id/phase
    columns, pushed to the read)."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    if not 0 < num_buckets <= 1 << 32:
        raise ValueError(f"num_buckets must be in (0, 2^32], {num_buckets}")

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = md5_hash64([f"{salt}{v}" for v in df[id_col].to_numpy()])
        df["_h"] = h
        df["_hb"] = (
            ((h >> np.uint64(32)) * np.uint64(num_buckets))
            >> np.uint64(32)
        ).astype(np.int64)
        return df

    counts = (
        ds.select_columns([id_col, phase_col])
        .map_batches(
            lambda df: hashed(df).groupby(
                [phase_col, "_hb"], as_index=False).agg(
                    n=(id_col, "size")),
            batch_format="pandas")
        .to_pandas()
        .groupby([phase_col, "_hb"], as_index=False)["n"].sum()
        .sort_values([phase_col, "_hb"], kind="mergesort")
    )
    phases = sorted(counts[phase_col].unique())
    pidx = {p: i for i, p in enumerate(phases)}
    combo_of = {(p, b): pidx[p] * num_buckets + b
                for p, b in zip(counts[phase_col], counts["_hb"])}
    base_arr = np.zeros(len(phases) * num_buckets + 1, dtype=np.int64)
    cum = 0
    for p, b, n in zip(counts[phase_col], counts["_hb"], counts["n"]):
        base_arr[combo_of[(p, b)]] = cum
        cum += int(n)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = hashed(df)
        pc_idx = df[phase_col].map(pidx)
        if pc_idx.isna().any():
            raise ValueError("phase appeared in pass 2 but not pass 1")
        df["_combo"] = (pc_idx.astype(np.int64) * num_buckets
                        + df["_hb"]).astype(np.int64)
        return df.drop(columns=["_hb"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", id_col],
                            kind="mergesort").reset_index(drop=True)
        start = int(base_arr[int(df["_combo"].iloc[0])])
        df["curriculum_pos"] = start + np.arange(len(df), dtype=np.int64)
        return df.drop(columns=["_combo", "_h"])

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("_combo").map_groups(finish, batch_format="pandas"))


def curriculum_order_sql(*, table: str, phase_expr: str, id_col: str,
                         salt: str = "", columns: str = "*") -> str:
    """SQL mirror: row_number over (phase, md5_number_upper, id)."""
    return f"""
        SELECT {columns},
               (row_number() OVER (
                    ORDER BY {phase_expr},
                             md5_number_upper('{salt}' || {id_col}::VARCHAR),
                             {id_col}
                ) - 1)::BIGINT AS curriculum_pos
        FROM {table}"""


# ---------------------------------------------------------------------------
# epoch assignment: materialize the UniMax schedule into per-doc epochs


def epoch_assignment(ds, *, group_col: str, weight_col: str, id_col: str,
                     budget: int, max_epochs: int = 4, salt: str = "",
                     num_buckets: int = 16):
    """Materialize the UniMax allocation into the artifact a training
    loop actually consumes: one ``(id, group, epoch)`` row per pass each
    document makes over the run — :func:`unimax_epochs` SAYS "source s
    gets 2.4 epochs", this op DECIDES which docs make the fractional
    0.4th pass, deterministically. Every doc of a source appears in
    epochs ``0..floor(e_s)−1``; for the fractional epoch each doc enters
    iff ``md5_64(salt||E||':'||id) < frac·2⁶⁴ // 10⁶`` — an exact-rational
    Bernoulli(frac) gate, salted with the epoch index so the draw is
    independent of the shuffle/split hashes. Selection is by DOC (not an
    exact token quota — documented; compose :func:`weighted_sample`
    when the fractional pass must hit a token budget exactly).

    Scale shape: the bounded source fold + driver greedy live inside
    unimax_epochs; this adds ONE broadcast (source → (full, frac)) map
    and a stateless vectorized np.repeat explode — zero exchange, output
    ≤ (max_epochs+1)× input rows."""
    alloc = unimax_epochs(ds, group_col=group_col, weight_col=weight_col,
                          budget=budget, max_epochs=max_epochs,
                          num_buckets=num_buckets).to_pandas()
    full = {g: int(p) // 1_000_000
            for g, p in zip(alloc[group_col], alloc["epochs_ppm"])}
    thresh = {g: (int(p) % 1_000_000) * (1 << 64) // 1_000_000
              for g, p in zip(alloc[group_col], alloc["epochs_ppm"])}
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col].to_numpy()
        ids = df[id_col].to_numpy()
        nf = np.array([full.get(x, 0) for x in g], dtype=np.int64)
        th = np.array([thresh.get(x, 0) for x in g], dtype=np.uint64)
        h = md5_hash64([f"{salt}{f}:{i}"
                        for f, i in zip(nf, ids)])
        extra = h < th
        total = nf + extra.astype(np.int64)
        rep_ids = np.repeat(ids, total)
        rep_g = np.repeat(g, total)
        # epoch index within each row's run: flat arange rebased per row
        off = np.concatenate([[0], np.cumsum(total)[:-1]])
        epoch = (np.arange(int(total.sum()), dtype=np.int64)
                 - np.repeat(off, total))
        return pd.DataFrame({id_col: rep_ids, group_col: rep_g,
                             "epoch": epoch})

    return ds.select_columns([id_col, group_col]).map_batches(
        explode, batch_format="pandas")


def epoch_assignment_sql(*, unimax_sql: str, table: str, group: str,
                         id_col: str, salt: str = "") -> str:
    """SQL mirror: the unimax replay as a derived table, a
    generate_series explode for the full epochs, plus the hash-gated
    fractional-epoch branch."""
    return f"""
        WITH um AS ({unimax_sql}),
        fe AS (
          SELECT {group} AS g, (epochs_ppm // 1000000)::BIGINT AS nf,
                 ((epochs_ppm % 1000000)::HUGEINT
                  * 18446744073709551616 // 1000000) AS th
          FROM um
        ),
        fullrows AS (
          SELECT d.{id_col}, d.{group}, t.e AS epoch
          FROM {table} d
          JOIN fe ON fe.g = d.{group},
          LATERAL unnest(generate_series(0, fe.nf - 1)) AS t(e)
        ),
        fracrows AS (
          SELECT d.{id_col}, d.{group}, fe.nf AS epoch
          FROM {table} d JOIN fe ON fe.g = d.{group}
          WHERE md5_number_upper(
                  '{salt}' || fe.nf::VARCHAR || ':'
                  || d.{id_col}::VARCHAR)::HUGEINT < fe.th
        )
        SELECT * FROM fullrows
        UNION ALL
        SELECT * FROM fracrows"""
