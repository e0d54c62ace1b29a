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
