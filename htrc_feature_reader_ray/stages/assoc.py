"""Association-rule mining over (basket, item) co-occurrence — the
support / confidence / lift layer on top of the shared-key pair kernel
(stages/partition.py::shared_key_pair_counts), kept EXACT in integer ppm so
every metric is SQL-replayable.

Metric definitions (N = distinct baskets, n_a = baskets containing a,
n_joint = baskets containing both):

    support_ppm   = n_joint·10⁶ // N
    conf_a_to_b   = n_joint·10⁶ // n_a      (and symmetrically b→a)
    lift_ppm      = n_joint·N·10⁶ // (n_a·n_b)

Scale shape: pair counts come from the capped pair kernel (ONE
basket-bucketed exchange, quadratic term bounded by basket size); item
supports are a per-batch distinct (basket, item) collapse + one
item-bucketed fold; each side attaches to the pair table by a
co-partitioning ``bucket_join`` on the item — no broadcast of the
(potentially huge) item-support table.  The lift numerator can exceed
int64 at extreme corpus sizes, so the finish is overflow-guarded: the
vectorized int64 path runs when ``max(n_joint)·N·10⁶`` provably fits,
else the (tiny, human-read) rule table falls back to Python
arbitrary-precision ints — bit-equal results either way.

Contract mirrored by any oracle: the pair kernel's ``max_members_per_key``
hub-basket cap applies to PAIR mining only; item supports count ALL
baskets (standard a-priori semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def association_rules(ds, *, key_col: str, member_col: str,
                      min_shared: int = 2, max_members_per_key: int = 64,
                      counts_path: str = "auto",
                      broadcast_limit: int = 4_000_000,
                      num_buckets: int = 32):
    """(item_a, item_b, n_joint, n_a, n_b, support_ppm, conf_a_to_b_ppm,
    conf_b_to_a_ppm, lift_ppm) for every pair sharing ≥ ``min_shared``
    baskets.  ``item_a < item_b`` canonical order from the pair kernel.

    ``counts_path``: how item supports reach the pair table —
    ``'broadcast'`` (ray.put the (item, n) arrays once, searchsorted lookup
    inside the finish map — ZERO extra exchanges; right whenever the item
    vocabulary fits a worker, same rationale as pmi_collocations'
    denominator lookup), ``'join'`` (two co-partitioning bucket joins, for
    unbounded vocabularies), or ``'auto'`` (broadcast below
    ``broadcast_limit`` items).  Both paths are pinned equal in tests."""
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        shared_key_pair_counts,
    )

    pairs = shared_key_pair_counts(
        ds, key_col=key_col, member_col=member_col,
        min_shared=min_shared, max_members_per_key=max_members_per_key,
        num_buckets=num_buckets,
        out_a="item_a", out_b="item_b", out_n="n_joint",
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.select([key_col, member_col]).group_by(
            [key_col, member_col]).aggregate([])

    km = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    # per-batch distinct rows can repeat ACROSS batches: the member-bucketed
    # pass co-locates all rows of an item, so global dedup + count share one
    # exchange
    def count_items(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([key_col, member_col])
        out = d.groupby(member_col, sort=False, as_index=False,
                        observed=True).agg(n_item=(key_col, "size"))
        out["n_item"] = out["n_item"].astype("int64")
        return out

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    item_counts = bucketed_map_groups(
        km, member_col, count_items, num_buckets=num_buckets)

    # distinct basket count: fold distinct keys per batch, count the fold
    def distinct_keys(t: pa.Table) -> pa.Table:
        return t.select([key_col]).group_by([key_col]).aggregate([])

    n_baskets = int(
        bucketed_aggregate(
            ds.map_batches(distinct_keys, batch_format="pyarrow"),
            [key_col], {"_one": (key_col, "size")},
            num_buckets=num_buckets,
        ).count()
    )

    if counts_path == "auto":
        item_counts = item_counts.materialize()
        counts_path = (
            "broadcast" if item_counts.count() <= broadcast_limit
            else "join")

    if counts_path == "broadcast":
        import ray

        icdf = item_counts.to_pandas().sort_values(member_col)
        lookup_ref = ray.put((
            icdf[member_col].to_numpy(),
            icdf["n_item"].to_numpy().astype(np.int64),
        ))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            items, counts = ray.get(lookup_ref)
            df = df.copy()
            df["n_a"] = counts[
                np.searchsorted(items, df["item_a"].to_numpy())]
            df["n_b"] = counts[
                np.searchsorted(items, df["item_b"].to_numpy())]
            return df

        with_ab = pairs.map_batches(attach, batch_format="pandas")
    else:
        def a_side(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"item_a": df[member_col],
                                 "n_a": df["n_item"].astype("int64")})

        def b_side(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"item_b": df[member_col],
                                 "n_b": df["n_item"].astype("int64")})

        with_a = bucket_join(
            pairs, item_counts.map_batches(a_side, batch_format="pandas"),
            left_key="item_a", right_key="item_a", num_buckets=num_buckets)
        with_ab = bucket_join(
            with_a, item_counts.map_batches(b_side, batch_format="pandas"),
            left_key="item_b", right_key="item_b", num_buckets=num_buckets)

    M = 1_000_000
    N = n_baskets

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        j = df["n_joint"].astype("int64").to_numpy()
        na = df["n_a"].astype("int64").to_numpy()
        nb = df["n_b"].astype("int64").to_numpy()
        if len(j) and int(j.max()) * N * M < 2**62:
            support = j * M // N if N else np.zeros_like(j)
            cab = j * M // na
            cba = j * M // nb
            lift = j * N * M // (na * nb)
        else:  # arbitrary-precision fallback, bit-equal semantics
            support = np.fromiter(
                (int(x) * M // N for x in j), dtype=np.int64, count=len(j))
            cab = np.fromiter(
                (int(x) * M // int(a) for x, a in zip(j, na)),
                dtype=np.int64, count=len(j))
            cba = np.fromiter(
                (int(x) * M // int(b) for x, b in zip(j, nb)),
                dtype=np.int64, count=len(j))
            lift = np.fromiter(
                (int(x) * N * M // (int(a) * int(b))
                 for x, a, b in zip(j, na, nb)),
                dtype=np.int64, count=len(j))
        return pd.DataFrame({
            "item_a": df["item_a"], "item_b": df["item_b"],
            "n_joint": j, "n_a": na, "n_b": nb,
            "support_ppm": support,
            "conf_a_to_b_ppm": cab, "conf_b_to_a_ppm": cba,
            "lift_ppm": lift,
        })

    return with_ab.map_batches(finish, batch_format="pandas")


def association_rules_sql(*, key_col: str, member_col: str,
                          min_shared: int = 2,
                          max_members_per_key: int = 64,
                          table: str) -> str:
    """SQL mirror: HUGEINT-exact ppm floor divisions, identical hub cap on
    the pair side only."""
    return f"""
        WITH km AS (
            SELECT DISTINCT {key_col} AS k, {member_col} AS m FROM {table}
        ), keep AS (
            SELECT k FROM km GROUP BY k
            HAVING count(*) <= {max_members_per_key}
        ), p AS (
            SELECT a.m AS item_a, b.m AS item_b, count(*)::BIGINT AS n_joint
            FROM km a JOIN km b ON a.k = b.k AND a.m < b.m
            WHERE a.k IN (SELECT k FROM keep)
            GROUP BY 1, 2 HAVING count(*) >= {min_shared}
        ), ic AS (
            SELECT m, count(*)::BIGINT AS n_item FROM km GROUP BY m
        ), nb AS (SELECT count(DISTINCT k) AS n FROM km)
        SELECT p.item_a, p.item_b, p.n_joint,
               ia.n_item AS n_a, ib.n_item AS n_b,
               (p.n_joint * 1000000 // nb.n)::BIGINT AS support_ppm,
               (p.n_joint * 1000000 // ia.n_item)::BIGINT
                   AS conf_a_to_b_ppm,
               (p.n_joint * 1000000 // ib.n_item)::BIGINT
                   AS conf_b_to_a_ppm,
               (p.n_joint * nb.n * 1000000
                // (ia.n_item * ib.n_item))::BIGINT AS lift_ppm
        FROM p JOIN ic ia ON p.item_a = ia.m
               JOIN ic ib ON p.item_b = ib.m
               CROSS JOIN nb"""
