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


def arrow_type(t) -> pa.DataType:
    """Normalize a Dataset.schema() type to a pyarrow DataType (Ray reports
    pandas-block schemas with numpy/python types)."""
    if isinstance(t, pa.DataType):
        return t
    if t in (str, object) or str(t) == "object":
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


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


def bucket_join(left_ds, right_ds, *, left_key: str, right_key: str,
                num_buckets: int = 32, how: str = "inner"):
    """Explicit partitioned hash join: tag + schema-align + union both sides,
    hash-bucket on the join key, pandas-merge inside each bucket.

    This is the portable join pattern (one co-partitioning exchange) used
    where Ray's native ``Dataset.join`` can't be (its hash-shuffle
    aggregator rejects the schemaless empty blocks Ray groupbys may emit in
    this version). Right-side columns keep their names; the right key column
    is dropped from the output.

    ``how``: 'inner' | 'left' | 'semi' (left rows WITH a right match, left
    columns only) | 'anti' (left rows WITHOUT a right match). For semi/anti
    the right side should be pre-projected to its key column — only key
    presence matters and anything else is wasted exchange volume.
    """
    import pandas as pd

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    # a side whose pipeline produced ZERO blocks reports schema None (the
    # streaming executor drops empty bundles): the join result is then
    # provably row-free (inner/semi: no matches possible; left/anti with an
    # empty RIGHT side: the left rows pass through unchanged)
    if l_schema is None:
        return left_ds.limit(0)
    if r_schema is None:
        return left_ds if how in ("left", "anti") else left_ds.limit(0)
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    r_carry = [c for c in r_names if c != right_key]
    overlap = set(r_carry) & set(l_names)
    if overlap:
        raise ValueError(f"right columns clash with left: {sorted(overlap)}")
    types = {n: arrow_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    types.update(
        {n: arrow_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    )
    all_cols = l_names + r_carry

    def align(side: int, key_src: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for c in all_cols:
                if c in batch.column_names:
                    cols[c] = batch.column(c)
                elif c == key_src and right_key in batch.column_names:
                    cols[c] = batch.column(right_key)
                else:
                    cols[c] = pa.nulls(n, type=types[c])
            # right rows carry their key in the LEFT key column for bucketing
            if side == 1:
                cols[left_key] = batch.column(right_key).cast(types[left_key])
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    unioned = left_ds.map_batches(align(0, left_key), batch_format="pyarrow").union(
        right_ds.map_batches(align(1, left_key), batch_format="pyarrow")
    )

    def _restore_ints(frame: pd.DataFrame, cols) -> pd.DataFrame:
        # the union pads each side's missing columns with nulls, which turns
        # pandas int columns float; cast back once the sides are split
        for c in cols:
            if pa.types.is_integer(types[c]) and frame[c].notna().all():
                frame[c] = frame[c].astype("int64")
        return frame

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = _restore_ints(df[df["_side"] == 0][l_names].copy(), l_names)
        if how in ("semi", "anti"):
            rkeys = df.loc[df["_side"] == 1, left_key].unique()
            mask = left[left_key].isin(rkeys)
            return left[mask] if how == "semi" else left[~mask]
        right = df[df["_side"] == 1][[left_key] + r_carry].rename(
            columns={left_key: right_key}
        )
        right = _restore_ints(
            right.copy(), [right_key] + [c for c in r_carry]
        )
        return left.merge(
            right, how=how, left_on=left_key, right_on=right_key
        ).drop(columns=[right_key] if right_key != left_key else [])

    return bucketed_map_groups(unioned, left_key, per_bucket,
                               num_buckets=num_buckets)


class BloomFilter:
    """Deterministic Bloom filter over string/int keys — ``k`` independent
    bit positions per key from the engine's ONE stable hash (seed-salted),
    so membership tests are reproducible cross-process. OR-mergeable.

    Sized for ``capacity`` keys at ``fp_rate`` false positives:
    m = -n·ln(p)/ln(2)², k = m/n·ln(2).
    """

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(capacity, 1)
        m = int(np.ceil(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = max(m, 64)
        self.k = max(1, int(round(self.m / capacity * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        """(k, n) bit positions."""
        from htrc_feature_reader_ray.functions.ids import stable_hash64

        return np.stack(
            [
                stable_hash64(values, seed=f"bloom{i}") % np.uint64(self.m)
                for i in range(self.k)
            ]
        )

    def add_batch(self, values) -> None:
        pos = self._positions(values).reshape(-1)
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_batch(self, values) -> np.ndarray:
        """Vectorized membership mask (no false negatives)."""
        pos = self._positions(values)  # (k, n)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit = (self.bits[word] & bit) != 0
        return hit.all(axis=0)


def bloom_join(left_ds, right_ds, *, left_key: str, right_key: str,
               how: str = "semi", right_capacity: int,
               fp_rate: float = 0.01, num_buckets: int = 32):
    """Semi/anti join with a Bloom PREFILTER: exact results, tiny exchange.

    The right side's keys stream to the driver once (``iter_batches`` —
    driver memory = the bloom bitmap only, ~1.2 GB per 10^9 keys at 1%),
    the filter broadcasts via ``ray.put``, and the big left side is
    pre-screened in a stateless ``map_batches``:

      * anti: bloom-negative rows are DEFINITE non-members → emitted
        immediately with no shuffle; only bloom-positive rows (matches +
        fp_rate of the rest) go through the exact bucketed anti join;
      * semi: bloom-negative rows are definite non-members → dropped;
        positives go through the exact bucketed semi join.

    Equality with the plain ``bucket_join`` semi/anti is exact (Bloom has
    no false negatives; the residual join removes false positives). Use
    when right keys are too many for a broadcast hash set but the bloom
    bits fit; for small right sides use ``bucket_join`` directly.

    Cost contract: the right side's KEY COLUMN is materialized once and
    reused (bloom build + exact join). The left side is scanned twice for
    ``anti`` (positive and negative screens are independent plans) — two
    columnar scans are normally far cheaper than shuffling the negatives,
    but if the left has expensive upstream transforms, pass a
    materialized/persisted Dataset.
    """
    import ray

    if how not in ("semi", "anti"):
        raise ValueError(f"bloom_join how={how!r}")
    right_keys = right_ds.select_columns([right_key]).materialize()
    bloom = BloomFilter(right_capacity, fp_rate)
    for batch in right_keys.iter_batches(batch_format="pyarrow"):
        vals = batch.column(right_key).to_numpy(zero_copy_only=False)
        if len(vals):
            bloom.add_batch(vals)
    bloom_ref = ray.put(bloom)

    def screen(keep_positive: bool):
        def fn(batch: pa.Table) -> pa.Table:
            b = ray.get(bloom_ref)
            vals = batch.column(left_key).to_numpy(zero_copy_only=False)
            if not len(vals):
                return batch
            hit = b.contains_batch(vals)
            return batch.filter(pa.array(hit if keep_positive else ~hit))

        return fn

    positives = left_ds.map_batches(screen(True), batch_format="pyarrow")
    # semi/anti need only key PRESENCE on the right — the projected,
    # already-materialized key column is reused here (bucket_join contract)
    exact = bucket_join(positives, right_keys,
                        left_key=left_key, right_key=right_key, how=how,
                        num_buckets=num_buckets)
    if how == "semi":
        return exact
    negatives = left_ds.map_batches(screen(False), batch_format="pyarrow")
    return negatives.union(exact)


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


def bucketed_aggregate(ds, keys, agg_spec, *, num_buckets: int = 64,
                       bucket_key: str | None = None):
    """Grouped aggregation for HIGH-CARDINALITY keys: one exchange keyed on
    ``hash(bucket_key) % num_buckets`` (tiny cardinality), then a single
    vectorized pandas ``groupby().agg`` per bucket.

    Ray's native sort-aggregate accumulates each group in the interpreter —
    O(#groups) Python work (measured ~50-75us/group) — pathological when
    group cardinality approaches the row count: content digests, n-gram
    vocabularies, (entity, window) pairs. Bucketing makes the *exchange*
    cardinality ``num_buckets`` while the real aggregation stays in C.

    ``keys``: group column(s). All rows of a key tuple land in one bucket
    because only ``bucket_key`` (default ``keys[0]``) is hashed — tuple
    equality implies bucket equality. Pick a first key with enough spread,
    or pass ``bucket_key`` explicitly.
    ``agg_spec``: pandas named-agg dict ``{out_col: (in_col, fn)}``; output
    columns are ``keys + list(agg_spec)`` in that order.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    bucket_key = bucket_key or keys[0]

    def agg_bucket(df):
        # observed=True: categorical keys (arrow dictionary columns) must
        # not expand to the unobserved cross-product
        return (
            df.drop(columns=[BUCKET_COL], errors="ignore")
            .groupby(keys, sort=False, dropna=False, as_index=False,
                     observed=True)
            .agg(**agg_spec)
        )

    return bucketed_map_groups(ds, bucket_key, agg_bucket,
                               num_buckets=num_buckets)


def shared_key_pair_counts(ds, *, key_col: str, member_col: str,
                           min_shared: int = 1,
                           max_members_per_key: int = 64,
                           num_buckets: int = 32,
                           out_a: str = "a", out_b: str = "b",
                           out_n: str = "n_shared"):
    """Co-occurrence pair mining: count, for every member pair, how many
    keys they share — the kernel under mirror-host detection (members =
    hosts, keys = content fingerprints) and co-citation relatedness
    (members = linking pages, keys = shared link targets).

    Scale shape: per-batch distinct (key, member) pairs, ONE key-bucketed
    exchange (carrying exactly the distinct-pair volume), per-bucket
    vectorized pair emission via a self-merge on the key (members ordered,
    so pairs are canonically ``a < b``), then a tiny second bucketed fold
    on the pair. ``max_members_per_key`` drops degenerate hub keys (a key
    shared by thousands of members is boilerplate/hub structure, not a
    similarity signal, and emits O(m²) pairs); the cap is part of the
    contract and must be mirrored by any oracle.
    """
    import pandas as pd  # noqa: F401  (frame kernels below)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, member_col]).group_by(
            [key_col, member_col]).aggregate([])

    def emit_pairs(df):
        d = df.drop_duplicates([key_col, member_col])
        sizes = d.groupby(key_col, sort=False)[member_col].transform("size")
        d = d.loc[(sizes >= 2) & (sizes <= max_members_per_key)]
        if not len(d):
            import pandas as pd
            # empty frame must keep the member dtype: a str-typed empty
            # block next to int64 pair blocks breaks the downstream union
            mdt = df[member_col].dtype
            return pd.DataFrame({out_a: pd.Series([], dtype=mdt),
                                 out_b: pd.Series([], dtype=mdt)})
        m = d.merge(d, on=key_col, suffixes=("_a", "_b"))
        m = m.loc[m[f"{member_col}_a"] < m[f"{member_col}_b"]]
        return m[[f"{member_col}_a", f"{member_col}_b"]].rename(columns={
            f"{member_col}_a": out_a, f"{member_col}_b": out_b})

    pairs = bucketed_map_groups(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        key_col, emit_pairs, num_buckets=num_buckets,
    )
    counted = bucketed_aggregate(
        pairs, [out_a, out_b], {out_n: (out_b, "size")},
        num_buckets=max(4, num_buckets // 4),
    )
    if min_shared <= 1:
        return counted

    def threshold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column(out_n), min_shared))

    return counted.map_batches(threshold, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# snapshot reconciliation (table diff)


def table_diff(left_ds, right_ds, *, key: str, compare_cols,
               num_buckets: int = 32):
    """Key-level reconciliation of two table snapshots — the CDC/backfill
    audit op: for every key in either side emit ``status`` ∈
    ``added`` (right only) / ``removed`` (left only) / ``changed`` (both,
    ``compare_cols`` differ) / ``unchanged``.

    Scale shape: each side collapses its compare columns to a 128-bit md5
    row digest BEFORE the exchange (two uint64 columns — the row payload
    never crosses the network, the same text-free-exchange contract as
    line_dedup), then ONE key-bucketed co-partitioning pass does a
    vectorized outer merge per bucket.  Equality-by-digest is exact up to
    md5 collision (no adversarial inputs in a reconciliation audit).
    """
    import hashlib

    import pandas as pd

    compare_cols = list(compare_cols)

    def digest(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            s = df[compare_cols[0]].astype(str)
            for c in compare_cols[1:]:
                s = s + "\x1f" + df[c].astype(str)
            h1 = np.empty(len(df), dtype=np.uint64)
            h2 = np.empty(len(df), dtype=np.uint64)
            for i, v in enumerate(s.to_numpy()):
                d = hashlib.md5(v.encode("utf-8")).digest()
                h1[i] = int.from_bytes(d[:8], "little")
                h2[i] = int.from_bytes(d[8:], "little")
            return pd.DataFrame({
                key: df[key], "_h1": h1, "_h2": h2,
                "_side": np.full(len(df), side, dtype=np.int8),
            })
        return fn

    unioned = left_ds.map_batches(
        digest(0), batch_format="pandas"
    ).union(right_ds.map_batches(digest(1), batch_format="pandas"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0]
        r = df[df["_side"] == 1]
        m = l[[key, "_h1", "_h2"]].merge(
            r[[key, "_h1", "_h2"]], on=key, how="outer",
            suffixes=("_l", "_r"))
        in_l = m["_h1_l"].notna()
        in_r = m["_h1_r"].notna()
        same = in_l & in_r & (m["_h1_l"] == m["_h1_r"]) \
            & (m["_h2_l"] == m["_h2_r"])
        status = np.where(
            ~in_l, "added",
            np.where(~in_r, "removed",
                     np.where(same, "unchanged", "changed")))
        out = pd.DataFrame({key: m[key], "status": status})
        # outer-merge float-pads the int key when one side misses it
        if (df[key].dtype.kind in "iu") and out[key].notna().all():
            out[key] = out[key].astype("int64")
        return out

    return bucketed_map_groups(unioned, key, per_bucket,
                               num_buckets=num_buckets)


def skew_join(left_ds, right_ds, *, left_key: str, right_key: str,
              hot_threshold: int = 100_000, num_buckets: int = 32,
              how: str = "inner", max_hot_right_rows: int = 2_000_000):
    """Skew-aware equi-join: keys whose LEFT-side frequency exceeds
    ``hot_threshold`` take a BROADCAST path — their right rows ship once
    via ``ray.put`` and merge map-side inside the left scan, so a hot key
    never concentrates its whole row mass on one bucket worker — while cold
    keys take the ordinary :func:`bucket_join`. Output rows are exactly the
    bucket_join rows (pinned by test); only the physical plan differs.

    Contract: the right side is dimension-like on the hot keys (their
    matching right rows must fit a worker; a loud guard at
    ``max_hot_right_rows`` enforces it). ``how``: 'inner' | 'left'.

    Cost model: the hot-key count fold is one vocabulary-bucketed exchange
    of per-batch (key, count) partials — at 100 TB the partial combine
    keeps hub keys to one row per batch, and the fold output is filtered to
    the (tiny) hot set before it ever reaches the driver.
    """
    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'|'left'")
    import pandas as pd
    import ray

    def key_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([left_key]).group_by(left_key).aggregate(
            [([], "count_all")])
        return g.rename_columns([left_key, "cnt"])

    counts = bucketed_aggregate(
        left_ds.map_batches(key_partial, batch_format="pyarrow"),
        left_key, {"cnt": ("cnt", "sum")}, num_buckets=num_buckets)

    def only_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column("cnt"),
                                       hot_threshold))

    hot = counts.map_batches(only_hot, batch_format="pyarrow").to_pandas()
    if hot.empty:
        return bucket_join(left_ds, right_ds, left_key=left_key,
                           right_key=right_key, num_buckets=num_buckets,
                           how=how)

    hot_vals = pa.array(sorted(hot[left_key].tolist()))

    def side_filter(col: str, keep_hot: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.is_in(batch.column(col), value_set=hot_vals)
            return batch.filter(m if keep_hot else pc.invert(m))

        return fn

    right_hot = right_ds.map_batches(
        side_filter(right_key, True), batch_format="pyarrow").to_pandas()
    if len(right_hot) > max_hot_right_rows:
        raise ValueError(
            f"skew_join: hot keys match {len(right_hot)} right rows "
            f"(> {max_hot_right_rows}); right side is not dimension-like "
            "on the hot keys — raise hot_threshold or use bucket_join")
    ref = ray.put(right_hot)

    drop_rk = [right_key] if right_key != left_key else []

    def hot_merge(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        return df.merge(r, how=how, left_on=left_key,
                        right_on=right_key).drop(columns=drop_rk)

    hot_out = left_ds.map_batches(
        side_filter(left_key, True), batch_format="pyarrow"
    ).map_batches(hot_merge, batch_format="pandas")

    cold_out = bucket_join(
        left_ds.map_batches(side_filter(left_key, False),
                            batch_format="pyarrow"),
        right_ds.map_batches(side_filter(right_key, False),
                             batch_format="pyarrow"),
        left_key=left_key, right_key=right_key, num_buckets=num_buckets,
        how=how)

    return hot_out.union(cold_out)


def rendezvous_assign(ds, *, key_col: str, nodes, out_col: str = "node"):
    """Highest-random-weight (rendezvous) sharding: each key goes to
    ``argmax over nodes of md5(node || ':' || key)`` — the consistent
    assignment whose minimal-movement property (removing a node moves ONLY
    that node's keys; ``hash % n`` reshuffles almost everything) is what a
    cache/shard router wants. Zero exchange; ties (md5 collisions across
    nodes) break to the list-order-first node.

    SQL-replayable via the engine's md5_number_upper identity, so shard
    routing decisions are auditable outside the engine."""
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    nodes = list(nodes)

    def assign(batch: pa.Table) -> pa.Table:
        keys = [str(v) for v in batch.column(key_col).to_pylist()]
        if not keys:
            return batch.append_column(out_col,
                                       pa.array([], type=pa.string()))
        uniq, inv = np.unique(np.asarray(keys, dtype=object),
                              return_inverse=True)
        # (n_nodes, n_uniq) hash matrix; argmax rows, first-node ties
        hs = np.stack([md5_hash64([f"{nd}:{k}" for k in uniq])
                       for nd in nodes])
        best = np.asarray(nodes, dtype=object)[hs.argmax(axis=0)]
        return batch.append_column(out_col, pa.array(best[inv]))

    return ds.map_batches(assign, batch_format="pyarrow")


def rendezvous_assign_sql(*, table: str, key_expr: str, nodes,
                          key_alias: str = "key",
                          out_col: str = "node") -> str:
    """(key, node) re-derivation: per key, row_number over nodes ordered
    (hash desc, node list position) — identical argmax + tie rule."""
    vals = " UNION ALL ".join(
        f"SELECT '{n}' AS node, {i} AS pos" for i, n in enumerate(nodes))
    return f"""
        WITH nodes AS ({vals}),
        keys AS (SELECT DISTINCT {key_expr} AS k FROM {table}),
        h AS (
          SELECT keys.k, nodes.node, nodes.pos,
                 md5_number_upper(nodes.node || ':' || keys.k)
                   ::UBIGINT AS hv
          FROM keys, nodes
        )
        SELECT k AS {key_alias}, node AS {out_col} FROM (
          SELECT k, node, row_number() OVER (
              PARTITION BY k ORDER BY hv DESC, pos) AS rn
          FROM h) WHERE rn = 1"""
