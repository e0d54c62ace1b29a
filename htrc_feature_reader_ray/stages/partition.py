"""Key-space partitioning helpers — the engine's one shuffle vocabulary.

Reference analog: ziptree sha1-prefix sharding (resolvers.py:257-318) =
hash-partitioning the entity key space. Here: a stable hash-bucket column
(``hash(key) % B``) added in a vectorized ``map_batches``, reused by every
co-partitioned op (as-of join, lag/lead, sessionize) and by the partitioned
parquet lake — ONE partitioning key across stages (SURVEY §4).

Skew note: bucketed ``map_groups`` ops handle hot keys by (a) vectorized
per-group pandas (a single hot key is one big vectorized frame, not a Python
loop) and (b) ``num_buckets`` large enough that each bucket ≪ worker heap.
Salting (``salt_column``) is provided for commutative folds only — never for
order-sensitive ops (SURVEY §7.5.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from htrc_feature_reader_ray.functions.ids import stable_hash64

BUCKET_COL = "_bucket"


def add_bucket_column(ds, key: str, num_buckets: int, *, name: str = BUCKET_COL):
    """Add ``hash(key) % num_buckets`` as an int64 column (vectorized)."""

    def bucketize(batch: pa.Table) -> pa.Table:
        vals = batch.column(key).to_numpy(zero_copy_only=False)
        b = (stable_hash64(vals) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column(name, pa.array(b, type=pa.int64()))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def salt_column(ds, *, num_salts: int, name: str = "_salt"):
    """Deterministic per-row salt (row-position based, batch-local) for
    two-stage commutative aggregation over hot keys: first fold on
    (key, salt), then on (key). Only safe for commutative folds."""

    def add(batch: pa.Table) -> pa.Table:
        s = (np.arange(len(batch)) % num_salts).astype(np.int64)
        return batch.append_column(name, pa.array(s, type=pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def bucketed_map_groups(ds, key, fn, *, num_buckets: int, drop_bucket: bool = True):
    """Co-partition ``ds`` on ``hash(key)`` buckets and run ``fn`` (pandas
    DataFrame -> DataFrame) once per bucket. This is the engine's substrate
    for order-sensitive per-entity ops: ``fn`` sees every row of each entity
    (all rows of a key share a bucket), sorts within the bucket, and applies
    vectorized per-entity logic."""
    bucketed = add_bucket_column(ds, key, num_buckets)

    if drop_bucket:
        inner = fn

        def fn_wrapped(df):
            out = inner(df)
            return out.drop(columns=[BUCKET_COL], errors="ignore")

        return bucketed.groupby(BUCKET_COL).map_groups(
            fn_wrapped, batch_format="pandas"
        )
    return bucketed.groupby(BUCKET_COL).map_groups(fn, batch_format="pandas")
