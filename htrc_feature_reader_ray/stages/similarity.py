"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — one numpy matmul per Arrow batch against
a broadcast (``ray.put``) float64 query matrix; per-batch local top-k shrinks
the shuffle to (num_batches × Q × k) rows before the tiny global fold.

Scale path: LSH-bucketed (random-hyperplane) search — vectors and queries
hash to sign-pattern buckets; only same-bucket vectors are scored (approximate
but embarrassingly parallel; bucket key doubles as the partition key of an
embedding lake).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return m / norms



def _empty_topk(id_col: str) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64()),
        }
    )


def _global_topk_fn(k: int, id_col: str):
    """Deterministic global top-k per query: sim desc, id asc, stable sort —
    the single definition of the ranking tie-break contract."""

    def global_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["query_id", "sim", id_col], ascending=[True, False, True],
            kind="mergesort",
        ).groupby("query_id", sort=False).head(k)
        df["rank"] = df.groupby("query_id", sort=False).cumcount() + 1
        return df[["query_id", id_col, "rank"]]

    return global_topk


def cosine_topk(ds, query_matrix: np.ndarray, *, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_ids=None):
    """Exact top-k cosine neighbours of each query row: returns a Dataset of
    (query_id, vec_id, rank) — rank 1-based, ties broken by vec_id asc.

    All scoring in float64 (matches DuckDB ``list_cosine_similarity`` on
    DOUBLE lists for rank parity).
    """
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    q_ref = ray.put((q, qids))

    empty_out = _empty_topk(id_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        qm, qi = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy()
        sims = vecs @ qm.T  # (n, Q)
        kk = min(k, len(ids))
        # per query: local top-k by (sim desc, id asc)
        order = np.lexsort((ids[:, None].repeat(sims.shape[1], 1), -sims), axis=0)
        top = order[:kk]  # (kk, Q)
        out_q = np.repeat(qi, kk)
        out_id = ids[top].T.reshape(-1)
        out_sim = np.take_along_axis(sims, top, axis=0).T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id.astype(np.int64), type=pa.int64()),
                "sim": pa.array(out_sim, type=pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, id_col), batch_format="pandas"
    )


class IVFIndex:
    """Inverted-file coarse quantizer: k-means-lite centroids (seeded, fixed
    iteration count — deterministic) assign every vector to one list; a query
    probes the ``nprobe`` nearest lists and reranks exactly inside them.

    The centroid fit runs on a driver-side sample; assignment is one matmul
    per batch against the broadcast centroids — the same physical shape as a
    partitioned lake keyed by the list id."""

    def __init__(self, sample: np.ndarray, *, n_lists: int = 16,
                 iters: int = 10, seed: int = 42) -> None:
        x = _normalize(np.asarray(sample, dtype=np.float64))
        rng = np.random.RandomState(seed)
        n_lists = min(n_lists, len(x))
        centroids = x[rng.choice(len(x), size=n_lists, replace=False)]
        for _ in range(iters):
            assign = (x @ centroids.T).argmax(axis=1)
            for j in range(n_lists):
                members = x[assign == j]
                if len(members):
                    c = members.mean(axis=0)
                    norm = np.linalg.norm(c)
                    if norm > 0:
                        centroids[j] = c / norm
        self.centroids = centroids

    def assign(self, m: np.ndarray) -> np.ndarray:
        return (_normalize(m) @ self.centroids.T).argmax(axis=1)

    def probe(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        sims = _normalize(q) @ self.centroids.T  # (Q, L)
        return np.argsort(-sims, axis=1)[:, :nprobe]  # (Q, nprobe)


def ivf_topk(ds, query_matrix: np.ndarray, *, k: int = 10, n_lists: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", query_ids=None, seed: int = 42,
             fit_sample: int = 4096):
    """Approximate top-k via IVF: score only vectors whose coarse list is
    among each query's ``nprobe`` nearest lists. Same output schema as
    cosine_topk (query_id, vec_id, rank); recall grows with nprobe."""
    sample = ds.limit(fit_sample).to_pandas()
    if sample.empty:
        import ray.data as rd

        out = _empty_topk(id_col).drop(["sim"]).append_column(
            "rank", pa.array([], type=pa.int64())
        )
        return rd.from_arrow(out)
    smat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    index = IVFIndex(smat, n_lists=n_lists, seed=seed)

    q = np.asarray(query_matrix, dtype=np.float64)
    qn = _normalize(q)
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    q_probe = index.probe(q, nprobe)  # (Q, nprobe)
    ref = ray.put((qn, qids, q_probe, index))

    empty_out = _empty_topk(id_col)

    def local(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        qm, qi, probes, idx = ray.get(ref)
        vecs = _as_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy()
        lists = idx.assign(vecs)
        vn = _normalize(vecs)
        rows_q, rows_id, rows_sim = [], [], []
        for j in range(len(qi)):
            mask = np.isin(lists, probes[j])
            if not mask.any():
                continue
            sims = vn[mask] @ qm[j]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            order = np.lexsort((sub_ids, -sims))[:kk]
            rows_q.append(np.full(kk, qi[j]))
            rows_id.append(sub_ids[order])
            rows_sim.append(sims[order])
        if not rows_q:
            return empty_out
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q), type=pa.int64()),
                id_col: pa.array(
                    np.concatenate(rows_id).astype(np.int64), type=pa.int64()
                ),
                "sim": pa.array(np.concatenate(rows_sim), type=pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow")

    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, id_col), batch_format="pandas"
    )


class HyperplaneLSH:
    """Seeded random-hyperplane signer: vector -> int bucket (sign pattern)."""

    def __init__(self, dim: int, nbits: int = 8, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, nbits))

    def buckets(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes) > 0  # (n, nbits)
        weights = (1 << np.arange(signs.shape[1])).astype(np.int64)
        return (signs @ weights).astype(np.int64)


def lsh_topk(ds, query_matrix: np.ndarray, *, k: int = 10, nbits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_ids=None, seed: int = 42):
    """Approximate top-k: score only vectors sharing the query's LSH bucket.
    Same output schema as cosine_topk; recall < 1 by design (bench op)."""
    q = np.asarray(query_matrix, dtype=np.float64)
    lsh = HyperplaneLSH(q.shape[1], nbits=nbits, seed=seed)
    q_buckets = lsh.buckets(q)
    qn = _normalize(q)
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    ref = ray.put((qn, qids, q_buckets))

    empty_out = _empty_topk(id_col)

    def local(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        qm, qi, qb = ray.get(ref)
        vecs = _as_matrix(batch.column(vec_col))
        ids = batch.column(id_col).to_numpy()
        vb = lsh.buckets(vecs)
        vn = _normalize(vecs)
        rows_q, rows_id, rows_sim = [], [], []
        for j in range(len(qi)):
            mask = vb == qb[j]
            if not mask.any():
                continue
            sims = vn[mask] @ qm[j]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            order = np.lexsort((sub_ids, -sims))[:kk]
            rows_q.append(np.full(kk, qi[j]))
            rows_id.append(sub_ids[order])
            rows_sim.append(sims[order])
        if not rows_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q), type=pa.int64()),
                id_col: pa.array(
                    np.concatenate(rows_id).astype(np.int64), type=pa.int64()
                ),
                "sim": pa.array(np.concatenate(rows_sim), type=pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow")

    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, id_col), batch_format="pandas"
    )


CENTROID_SCALE = 1 << 20  # fixed-point scale for exact centroid sums


def label_centroid_sums(ds, *, label_col: str = "label",
                        vec_col: str = "embedding"):
    """Per-class embedding centroid accumulators in EXACT integers (long
    form ``(label, dim, sum_q, n)``): each float32 component is scaled by
    2^20 (a power of two — exact in float64) and floored to int64, so the
    distributed sum is order-independent and bit-identical to the SQL
    mirror — the same fixed-point discipline as pagerank/cent columns.
    The centroid is ``sum_q / (n * 2^20)`` at the consumer's precision.

    Scale shape: per-batch ``np.add.at`` collapse to (labels_in_batch ×
    dims) partials; the exchange carries only those; one native groupby
    finishes (labels × dims is tiny). Used for SemDeDup-style cluster
    profiling and class-prototype features."""

    def partial(t: pa.Table) -> pa.Table:
        mat = _as_matrix(t.column(vec_col))
        q = np.floor(mat * CENTROID_SCALE).astype(np.int64)
        labels = t.column(label_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        k, d = len(uniq), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq.astype(np.int64), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "sum_q": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(counts, d)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "dim"]).sum(["sum_q", "n"]))

    def rename(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "label": pc.cast(t.column("label"), pa.int64()),
            "dim": pc.cast(t.column("dim"), pa.int64()),
            "sum_q": pc.cast(t.column("sum(sum_q)"), pa.int64()),
            "n": pc.cast(t.column("sum(n)"), pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def label_centroid_sums_sql(*, table: str = "embeddings",
                            label: str = "label",
                            vec: str = "embedding") -> str:
    """SQL mirror: 1-based array indexing over a generated dim series,
    identical power-of-two scale + floor."""
    return f"""
        SELECT {label}::BIGINT AS label, (u.i - 1)::BIGINT AS dim,
               sum(floor({vec}[u.i]::DOUBLE * {CENTROID_SCALE}))::BIGINT
                   AS sum_q,
               count(*)::BIGINT AS n
        FROM {table},
             unnest(generate_series(1, len({vec}))) AS u(i)
        GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# edit-distance near-dup pairs (blocked, vectorized Levenshtein)


def _levenshtein_pairs(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
    """Exact unit-cost Levenshtein for N string pairs, VECTORIZED across the
    pair axis: the row recurrence runs once per character of the left
    string, with the insertion dependency resolved by a min-plus prefix
    scan —

        dp_i[j] = min_{k<=j} ( min(dp_{i-1}[k]+1, dp_{i-1}[k-1]+cost) + (j-k) )
                = ( accumulate-min over (tmp - j) ) + j

    so the inner column loop (the part that is sequential in the textbook
    DP) becomes one ``np.minimum.accumulate``.  Total work: ``L_a`` numpy
    passes over an (N, L_b) matrix — no Python per-pair loop."""
    n = len(a_strs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la = np.char.str_len(a_strs).astype(np.int64)
    lb = np.char.str_len(b_strs).astype(np.int64)
    lam, lbm = int(la.max()), int(lb.max())
    # fixed-width UTF-32 codepoint matrices; 0-padding never matches a char
    a = a_strs.astype(f"U{max(lam, 1)}").view(np.uint32).reshape(n, -1)
    b = b_strs.astype(f"U{max(lbm, 1)}").view(np.uint32).reshape(n, -1)
    cols = np.arange(lbm + 1, dtype=np.int64)
    dp = np.broadcast_to(cols, (n, lbm + 1)).copy()
    out = np.where(la == 0, lb, 0).astype(np.int64)
    tmp = np.empty_like(dp)
    for i in range(1, lam + 1):
        cost = (a[:, i - 1 : i] != b).astype(np.int64)
        tmp[:, 0] = i
        np.minimum(dp[:, :-1] + cost, dp[:, 1:] + 1, out=tmp[:, 1:])
        # min-plus prefix scan: dp_i[j] = min_k<=j (tmp[k] - k) + j
        dp = np.minimum.accumulate(tmp - cols, axis=1) + cols
        done = la == i
        if done.any():
            out[done] = dp[done, lb[done]]
    return out


def edit_distance_pairs(ds, *, id_col: str, text_col: str, block_col: str,
                        max_dist: int = 2, num_buckets: int = 32):
    """Near-duplicate record linkage by exact edit distance ≤ ``max_dist``
    within BLOCKS — the classic entity-resolution shape (Levenshtein is
    quadratic, so it is never run corpus×corpus; the blocking key bounds
    the candidate set, like ``semdedup_pairs``' cluster column).

    Scale shape: ONE exchange bucketed on ``block_col`` (all rows of a
    block co-locate); per block, candidate pairs are the upper triangle
    pre-filtered by the length band ``|len_a - len_b| <= max_dist`` (a
    sound Levenshtein lower bound), then scored by the vectorized DP
    kernel in one numpy pass over ALL candidates of the bucket.  The
    quadratic term is bounded by the largest block, a documented contract
    the caller controls by picking the blocking key.

    Output: ``(id_a, id_b, dist)``, ``id_a < id_b``, one row per pair with
    ``dist <= max_dist``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def empty() -> pd.DataFrame:
        return pd.DataFrame({
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "dist": pd.Series(dtype="int64"),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty()
        ia_all, ib_all = [], []
        base = 0
        df = df.sort_values([block_col, id_col]).reset_index(drop=True)
        texts = df[text_col].fillna("").to_numpy(dtype=object)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        for _, g in df.groupby(block_col, sort=False):
            m = len(g)
            if m > 1:
                iu, ju = np.triu_indices(m, k=1)
                keep = np.abs(
                    lens[base + iu] - lens[base + ju]) <= max_dist
                ia_all.append(base + iu[keep])
                ib_all.append(base + ju[keep])
            base += m
        if not ia_all:
            return empty()
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        # bag-distance prefilter (lossless: max(|A∖B|,|B∖A|) over char
        # MULTISETS lower-bounds edit distance — each edit op repairs at
        # most one element of each side's difference), so the quadratic
        # DP only runs on pairs that survive a cheap histogram compare
        strs = texts.astype(str)
        lmax = max(int(lens.max()), 1)
        mat = strs.astype(f"U{lmax}").view(np.uint32).reshape(len(strs), -1)
        alphabet = np.unique(mat)
        counts = np.zeros((len(strs), len(alphabet)), dtype=np.int16)
        np.add.at(
            counts,
            (np.repeat(np.arange(len(strs)), mat.shape[1]),
             np.searchsorted(alphabet, mat).ravel()),
            1,
        )
        if alphabet[0] == 0:  # drop the pad column
            counts = counts[:, 1:]
        diff = counts[ia].astype(np.int32) - counts[ib].astype(np.int32)
        bag = np.maximum(
            np.clip(diff, 0, None).sum(axis=1),
            np.clip(-diff, 0, None).sum(axis=1))
        cand = bag <= max_dist
        ia, ib = ia[cand], ib[cand]
        if not len(ia):
            return empty()
        # lossless affix strip: edit distance is invariant under removing a
        # shared prefix (and, when lengths are uniform, a shared suffix) —
        # id-style keys ("Customer#0000…") collapse to their differing tail,
        # shrinking the DP from O(L²) rows to the few variable positions
        same = np.cumprod((mat == mat[0:1]).all(axis=0))
        cp = int(same.sum())
        cs = 0
        if len(np.unique(lens)) == 1:
            rsame = np.cumprod((mat[:, ::-1] == mat[0:1, ::-1]).all(axis=0))
            cs = min(int(rsame.sum()), int(lens[0]) - cp)
        if cp or cs:
            end = None if cs == 0 else -cs
            strs_dp = np.frompyfunc(
                lambda s: s[cp:end], 1, 1)(strs).astype(str)
        else:
            strs_dp = strs
        d = _levenshtein_pairs(strs_dp[ia], strs_dp[ib])
        hit = d <= max_dist
        ids = df[id_col].to_numpy()
        return pd.DataFrame({
            "id_a": ids[ia[hit]].astype(np.int64),
            "id_b": ids[ib[hit]].astype(np.int64),
            "dist": d[hit],
        })

    return bucketed_map_groups(ds, block_col, per_bucket,
                               num_buckets=num_buckets)


def edit_distance_pairs_sql(*, id_col: str, text_col: str, block_col: str,
                            max_dist: int = 2, table: str) -> str:
    """SQL mirror: blocked self-join + DuckDB ``levenshtein`` (same
    unit-cost unicode edit distance as the DP kernel)."""
    return f"""
        SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
               levenshtein(a.{text_col}, b.{text_col})::BIGINT AS dist
        FROM {table} a JOIN {table} b
          ON a.{block_col} = b.{block_col}
         AND a.{id_col} < b.{id_col}
        WHERE levenshtein(a.{text_col}, b.{text_col}) <= {max_dist}"""


# ---------------------------------------------------------------------------
# integer-exact distributed k-means (Lloyd, bounded rounds)


def _fit_centroids(qds, *, id_col: str, k: int, rounds: int,
                   num_buckets: int) -> np.ndarray:
    """Shared Lloyd loop over a quantized ``(id, _q)`` dataset: seed =
    k smallest ids, per-round broadcast-assign with the ≤k×d per-batch
    partials folded ON THE DRIVER (iteration-state-sized — no exchange
    per round), FLOOR centroid means, empty-cluster carry-forward.
    ``num_buckets`` kept for callers' signature stability (the fold no
    longer shuffles). Returns the final k×d int64 centroid matrix."""
    import pyarrow.compute as pc

    import ray

    # deterministic init: the k smallest ids (tiny driver pull)
    seed = qds.map_batches(
        lambda t: t.filter(pc.less(t.column(id_col), k)),
        batch_format="pyarrow",
    ).to_pandas().sort_values(id_col)
    cent = np.stack([np.asarray(v, dtype=np.int64) for v in seed["_q"]])
    d = cent.shape[1]

    for _ in range(rounds):
        cref = ray.put(cent)

        def sums_partial(t: pa.Table) -> pa.Table:
            C = ray.get(cref)
            q = np.stack([np.asarray(v, dtype=np.int64)
                          for v in t.column("_q").to_pylist()])
            dist = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)  # ties -> lowest id
            sums = np.zeros((C.shape[0], q.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, q)
            n = np.bincount(assign, minlength=C.shape[0]).astype(np.int64)
            cl = np.repeat(np.arange(C.shape[0], dtype=np.int64),
                           q.shape[1])
            return pa.table({
                "cluster": pa.array(cl),
                "dim": pa.array(np.tile(
                    np.arange(q.shape[1], dtype=np.int64), C.shape[0])),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(n, q.shape[1])),
            })

        # per-batch partials are ≤ k×d rows each: fold them on the
        # driver (batches × k × d rows total — iteration-state-sized)
        # instead of paying a (cluster, dim) exchange per round
        parts = qds.map_batches(
            sums_partial, batch_format="pyarrow").to_pandas()
        folded = (parts.groupby(["cluster", "dim"], as_index=False)
                  [["s", "n"]].sum())
        folded = folded.sort_values(["cluster", "dim"])
        s = folded["s"].to_numpy().reshape(k, d)
        n = folded["n"].to_numpy().reshape(k, d)[:, 0]
        new = cent.copy()
        nz = n > 0
        # floor division (numpy semantics) — mirrored explicitly in SQL
        new[nz] = s[nz] // n[nz, None]
        cent = new

    return cent


def kmeans_fixed(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                 k: int = 8, rounds: int = 3, num_buckets: int = 32):
    """Lloyd's k-means with an INTEGER-EXACT kernel — the clustering stage
    a SemDeDup / IVF pipeline needs, made bit-identical across parallelism
    levels and SQL-replayable (float k-means is neither: distance sums and
    centroid means depend on summation order):

      * vectors quantize to ``floor(x · 2²⁰)`` int64 (the
        ``CENTROID_SCALE`` fixed-point contract of
        :func:`label_centroid_sums`);
      * assignment = exact integer squared-L2 argmin, ties to the lowest
        centroid id;
      * update = per-cluster per-dim FLOOR(sum/n) (floor, not truncation —
        the SQL mirror carries the explicit negative-remainder correction
        since DuckDB ``//`` truncates);
      * init = the ``k`` smallest ``id_col`` vectors (deterministic);
        clusters that lose all members keep their previous centroid.

    Scale shape per round: centroids are the k×d driver-side iteration
    state broadcast into one stateless assignment map (per-batch numpy
    (N,k,d) reduction); cluster sums collapse per batch via ``np.add.at``
    partials and fold through one (cluster,dim)-keyed exchange — the
    label_centroid_sums shape with labels = current assignment.  Returns
    the final assignment Dataset ``(id, cluster, dist)``.
    """
    scale = CENTROID_SCALE

    def quantize(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        q = np.floor(m * scale).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "_q": pa.array(list(q)),
        })

    qds = ds.map_batches(quantize, batch_format="pyarrow").materialize()
    cent = _fit_centroids(qds, id_col=id_col, k=k, rounds=rounds,
                          num_buckets=num_buckets)

    import ray

    cref = ray.put(cent)

    def assign_final(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        q = np.stack([np.asarray(v, dtype=np.int64)
                      for v in t.column("_q").to_pylist()])
        dist = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = dist.argmin(axis=1)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(a.astype(np.int64)),
            "dist": pa.array(dist[np.arange(len(a)), a].astype(np.int64)),
        })

    return qds.map_batches(assign_final, batch_format="pyarrow")


def _kmeans_cte(*, table: str, vec_col: str, id_col: str,
                k: int, rounds: int) -> str:
    """Shared unrolled-round CTE body ending with the final-centroid
    ``df`` CTE of per-(vid, cid) exact integer distances."""
    scale = CENTROID_SCALE
    sql = f"""
        WITH q AS (
          SELECT {id_col} AS vid, u.i - 1 AS dim,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS qd
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        ),
        c0 AS (SELECT vid::BIGINT AS cid, dim, qd AS cd FROM q
               WHERE vid < {k}),"""
    prev = "c0"
    for i in range(1, rounds + 1):
        sql += f"""
        d{i} AS (
          SELECT q.vid, c.cid,
                 sum((q.qd - c.cd) * (q.qd - c.cd)) AS dist
          FROM q JOIN {prev} c USING (dim) GROUP BY 1, 2
        ),
        a{i} AS (
          SELECT vid, cid FROM (
            SELECT vid, cid, row_number() OVER (
                PARTITION BY vid ORDER BY dist, cid) AS rn FROM d{i})
          WHERE rn = 1
        ),
        s{i} AS (
          SELECT a.cid, q.dim, sum(q.qd) AS s, count(*) AS n
          FROM q JOIN a{i} a USING (vid) GROUP BY 1, 2
        ),
        c{i} AS (
          SELECT p.cid, p.dim,
                 CASE WHEN s.n IS NULL THEN p.cd
                      ELSE (s.s // s.n
                            - CASE WHEN s.s % s.n <> 0 AND s.s < 0
                                   THEN 1 ELSE 0 END)::BIGINT
                 END AS cd
          FROM {prev} p LEFT JOIN s{i} s
               ON p.cid = s.cid AND p.dim = s.dim
        ),"""
        prev = f"c{i}"
    sql += f"""
        df AS (
          SELECT q.vid, c.cid,
                 sum((q.qd - c.cd) * (q.qd - c.cd))::BIGINT AS dist
          FROM q JOIN {prev} c USING (dim) GROUP BY 1, 2
        )"""
    return sql


def kmeans_fixed_sql(*, table: str = "embeddings",
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     k: int = 8, rounds: int = 3) -> str:
    """SQL mirror: unrolled per-round CTEs — dim-exploded exact integer
    distances, (dist, cid) argmin, floor-corrected centroid means,
    empty-cluster carry-forward."""
    return _kmeans_cte(table=table, vec_col=vec_col, id_col=id_col,
                       k=k, rounds=rounds) + f"""
        SELECT vid AS {id_col}, cid::BIGINT AS cluster, dist FROM (
          SELECT vid, cid, dist, row_number() OVER (
              PARTITION BY vid ORDER BY dist, cid) AS rn FROM df)
        WHERE rn = 1"""


def kmeans_silhouette(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", k: int = 8, rounds: int = 3,
                      num_buckets: int = 32):
    """Per-point SIMPLIFIED silhouette of the integer-exact k-means fit
    (Rousseeuw 1987's cluster-quality score in its centroid-based
    simplified form, Hruschka et al.'s variant — the O(N·k) scale path;
    the classic O(N²) pairwise form cannot stream): with exact integer
    SQUARED distances d(x, cᵢ) to the final centroids of
    :func:`kmeans_fixed` (same quantize/seed/floor-mean contract),

        ``a = d(x, nearest centroid)  — the assignment distance``
        ``b = second-smallest centroid distance``
        ``silhouette_ppm = (b − a)·10⁶ // b``   (0 when b = 0)

    in [0, 10⁶]: → 10⁶ means the point sits on its centroid relative to
    the runner-up (crisp cluster), → 0 means it lies on the decision
    boundary (the semdedup/IVF-routing ambiguity zone — exactly the
    points whose cluster routing is unstable under re-fit). Squared
    distances are the documented contract (no sqrt keeps the mirror
    integer-exact; the [0,1] simplified silhouette is monotone in this
    ratio). Ties: a takes the LOWEST centroid id (kmeans_fixed's rule);
    a tie for nearest makes b = a and the score 0, as it should.

    Scale shape: the Lloyd rounds are the kmeans_fixed iteration
    (broadcast k×d centroids, one (cluster, dim) exchange per round);
    the scoring pass is ONE stateless map with a per-batch (N, k)
    integer matmul and a partial sort — no exchange at all."""
    scale = CENTROID_SCALE

    def quantize(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        q = np.floor(m * scale).astype(np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "_q": pa.array(list(q)),
        })

    qds = ds.map_batches(quantize, batch_format="pyarrow").materialize()
    cent = _fit_centroids(qds, id_col=id_col, k=k, rounds=rounds,
                          num_buckets=num_buckets)

    import ray

    cref = ray.put(cent)

    def score(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        q = np.stack([np.asarray(v, dtype=np.int64)
                      for v in t.column("_q").to_pylist()])
        dist = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a_idx = dist.argmin(axis=1)  # ties -> lowest centroid id
        two = np.partition(dist, 1, axis=1)[:, :2]
        a, b = two[:, 0], two[:, 1]
        # object ints: (b-a)*1e6 can pass int64 at d*(2*scale)^2 scale
        sil = np.where(b > 0,
                       (b - a).astype(object) * 1_000_000
                       // np.maximum(b, 1).astype(object), 0)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(a_idx.astype(np.int64)),
            "dist_own": pa.array(a.astype(np.int64)),
            "dist_next": pa.array(b.astype(np.int64)),
            "silhouette_ppm": pa.array(sil.astype(np.int64)),
        })

    return qds.map_batches(score, batch_format="pyarrow")


def kmeans_silhouette_sql(*, table: str = "embeddings",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          k: int = 8, rounds: int = 3) -> str:
    """SQL mirror: the shared kmeans round CTEs + rn=1/rn=2 self-join
    on the final distance relation."""
    return _kmeans_cte(table=table, vec_col=vec_col, id_col=id_col,
                       k=k, rounds=rounds) + f""",
        r AS (
          SELECT vid, cid, dist, row_number() OVER (
              PARTITION BY vid ORDER BY dist, cid) AS rn FROM df
        )
        SELECT a.vid AS {id_col}, a.cid::BIGINT AS cluster,
               a.dist AS dist_own, b.dist AS dist_next,
               CASE WHEN b.dist > 0
                    THEN ((b.dist - a.dist)::HUGEINT * 1000000
                          // b.dist)::BIGINT
                    ELSE 0 END AS silhouette_ppm
        FROM r a JOIN r b ON a.vid = b.vid AND b.rn = 2
        WHERE a.rn = 1"""


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (integer-exact)
# ---------------------------------------------------------------------------

_SIGN_CACHE: dict = {}


def _jl_signs(d_in: int, d_out: int) -> np.ndarray:
    """(d_in, d_out) ±1 sign matrix: sign(i, j) = 1 - 2·topbit(md5("j:i"))
    — the feature_hashing sign over the countmin seeded-cell key. Cached
    per process (built once per worker, not per batch)."""
    key = (d_in, d_out)
    if key not in _SIGN_CACHE:
        from htrc_feature_reader_ray.stages.dedup import md5_hash64

        keys = [f"{j}:{i}" for i in range(d_in) for j in range(d_out)]
        h = md5_hash64(keys)
        signs = (1 - 2 * (h >> np.uint64(63)).astype(np.int64))
        _SIGN_CACHE[key] = signs.reshape(d_in, d_out)
    return _SIGN_CACHE[key]


def random_projection(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", d_out: int = 16):
    """JL/Achlioptas ±1 random projection of an embedding column to
    ``d_out`` dims — the dimensionality-reduction front of an ANN/dedup
    pipeline, made INTEGER-EXACT (float projections are summation-order-
    dependent; this one is bit-identical across any parallelism):

      * inputs quantize to ``floor(x · 2²⁰)`` int64 (the
        ``CENTROID_SCALE`` fixed-point contract of ``kmeans_fixed``);
      * the projection matrix is the deterministic ±1 sign hash
        ``1 - 2·topbit(md5(j || ':' || i))`` — no stored model, any worker
        reconstructs it from (d_in, d_out) alone;
      * output dim j of vector x is the exact int64 ``Σ_i sign(i,j)·q(x_i)``
        (one (B,d_in)·(d_in,d_out) integer matmul per batch).

    Zero exchange; LONG output (id, dim, value) — schema-stable for any
    d_out and directly hash-comparable."""
    scale = CENTROID_SCALE

    def project(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        if m.size == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.int64()),
            })
        q = np.floor(m * scale).astype(np.int64)
        out = q @ _jl_signs(m.shape[1], d_out)
        n = len(q)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d_out)),
            "dim": pa.array(np.tile(np.arange(d_out, dtype=np.int64), n)),
            "value": pa.array(out.reshape(-1)),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def random_projection_sql(*, table: str = "embeddings",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id", d_out: int = 16) -> str:
    """DuckDB re-derivation (bit-exact): same quantization, same sign hash,
    exact integer sum per (vector, output dim)."""
    scale = CENTROID_SCALE
    return f"""
        WITH q AS (
          SELECT {id_col}, u.i - 1 AS i,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS qd
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        ), js AS (SELECT unnest(range({d_out}))::BIGINT AS j)
        SELECT {id_col}, js.j AS dim,
               sum(qd * (1 - 2 * (md5_number_upper(js.j || ':' || q.i)
                                  ::UBIGINT >> 63)::BIGINT))::BIGINT AS value
        FROM q, js GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive-training prep)
# ---------------------------------------------------------------------------


def hard_negative_topk(ds, query_matrix: np.ndarray, query_labels,
                       *, k: int = 3, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label", query_ids=None):
    """Per query: the top-k most cosine-similar vectors whose ``label_col``
    DIFFERS from the query's — the hard-negative set contrastive training
    mines (same-label neighbours are positives, not negatives). Same
    scale shape as :func:`cosine_topk`: broadcast query matrix, per-batch
    matmul + label mask, local top-k partials, one tiny per-query fold.
    (query_id, vec_id, rank); float64 scoring for SQL rank parity."""
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)),
        dtype=np.int64)
    qlab = np.asarray(query_labels)
    q_ref = ray.put((q, qids, qlab))

    empty_out = _empty_topk(id_col)

    def local_topk(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out
        qm, qi, ql = ray.get(q_ref)
        vecs = _normalize(_as_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy()
        labs = batch.column(label_col).to_numpy(zero_copy_only=False)
        sims = vecs @ qm.T  # (n, Q)
        sims = np.where(labs[:, None] == ql[None, :], -np.inf, sims)
        kk = min(k, len(ids))
        order = np.lexsort(
            (ids[:, None].repeat(sims.shape[1], 1), -sims), axis=0)
        top = order[:kk]
        out_q = np.repeat(qi, kk)
        out_id = ids[top].T.reshape(-1)
        out_sim = np.take_along_axis(sims, top, axis=0).T.reshape(-1)
        keep = np.isfinite(out_sim)  # batches that are all-positive emit none
        return pa.table({
            "query_id": pa.array(out_q[keep], type=pa.int64()),
            id_col: pa.array(out_id[keep].astype(np.int64),
                             type=pa.int64()),
            "sim": pa.array(out_sim[keep], type=pa.float64()),
        })

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, id_col), batch_format="pandas")


def hard_negative_topk_sql(*, table: str = "embeddings",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           label_col: str = "label",
                           query_pred: str = "vec_id < 10",
                           k: int = 3) -> str:
    return f"""
        WITH q AS (
          SELECT {id_col} AS query_id, {label_col} AS qlabel,
                 {vec_col}::DOUBLE[] AS qe
          FROM {table} WHERE {query_pred}
        ), s AS (
          SELECT q.query_id, e.{id_col},
                 list_cosine_similarity(q.qe, e.{vec_col}::DOUBLE[]) AS sim
          FROM q JOIN {table} e ON e.{label_col} <> q.qlabel
        )
        SELECT query_id, {id_col}, rank FROM (
          SELECT query_id, {id_col},
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, {id_col}) AS rank
          FROM s
        ) WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# per-dim min-max scaling (integer-exact feature scaling)
# ---------------------------------------------------------------------------


def embedding_minmax_scale(ds, *, vec_col: str = "embedding",
                           id_col: str = "vec_id"):
    """Per-dimension min-max scaling of an embedding column to exact
    integer ppm of the dim's range — the quantization-prep scaling pass
    (float scalers drift with summation order; min/max are exact under any
    batching). Vectors quantize to the engine-wide ``floor(x · 2²⁰)``
    fixed point first, so the scaled values are pure-integer functions of
    the input.

    Shape: per-batch (dim, min, max) partials — d rows however large the
    batch — one tiny d-keyed fold, broadcast back into a stateless scale
    map. Long output (id, dim, value_ppm); a constant dim scales to 0 by
    contract."""
    scale = CENTROID_SCALE

    def partial(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        if m.size == 0:
            return pa.table({
                "dim": pa.array([], type=pa.int64()),
                "mn": pa.array([], type=pa.int64()),
                "mx": pa.array([], type=pa.int64()),
            })
        q = np.floor(m * scale).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
            "mn": pa.array(q.min(axis=0)),
            "mx": pa.array(q.max(axis=0)),
        })

    from ray.data.aggregate import Max, Min

    mm = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()  # d rows
    ).sort_values("dim")
    mn = mm["mn"].to_numpy()
    span = (mm["mx"] - mm["mn"]).to_numpy()
    b_ref = ray.put((mn, span))

    def scale_map(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column(vec_col))
        if m.size == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "value_ppm": pa.array([], type=pa.int64()),
            })
        lo, sp = ray.get(b_ref)
        q = np.floor(m * scale).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.where(sp > 0,
                         (q - lo) * 1_000_000 // np.maximum(sp, 1), 0)
        n, d = q.shape
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "value_ppm": pa.array(v.reshape(-1).astype(np.int64)),
        })

    return ds.map_batches(scale_map, batch_format="pyarrow")


def embedding_minmax_scale_sql(*, table: str = "embeddings",
                               vec_col: str = "embedding",
                               id_col: str = "vec_id") -> str:
    scale = CENTROID_SCALE
    return f"""
        WITH q AS (
          SELECT {id_col}, u.i - 1 AS dim,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS qd
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        ), mm AS (
          SELECT dim, min(qd) AS mn, max(qd) AS mx FROM q GROUP BY 1
        )
        SELECT {id_col}, q.dim,
               (CASE WHEN mm.mx = mm.mn THEN 0
                     ELSE (q.qd - mm.mn) * 1000000 // (mm.mx - mm.mn)
                END)::BIGINT AS value_ppm
        FROM q JOIN mm USING (dim)"""


# ---------------------------------------------------------------------------
# product quantization (PQ) codes
# ---------------------------------------------------------------------------


def pq_codes(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
             subspaces: int = 2, k: int = 4, rounds: int = 2,
             num_buckets: int = 32):
    """Product-quantization encoding (Jégou et al. TPAMI'11 — the memory
    layout behind FAISS IVF-PQ): dims split into ``subspaces`` contiguous
    blocks, each block clustered independently with the engine's
    INTEGER-EXACT :func:`kmeans_fixed`, and every vector is stored as one
    centroid id per subspace — d floats compress to ``subspaces`` small
    ints. Bit-identical across parallelism and SQL-replayable because the
    underlying k-means is.

    Output: (id, subspace, code, dist) — ``dist`` the exact integer
    squared-L2 to the chosen centroid in the fixed-point space (the
    per-subspace quantization error an IVF-PQ recall model needs).
    Subspace slicing is zero-copy column math; each subspace runs the
    full kmeans pipeline (k×(d/m) driver state, one (cluster,dim)
    exchange per round)."""
    import pyarrow.compute as pc  # noqa: F401

    def dim_count():
        # probe one row for dimensionality (schema-stable list width)
        first = ds.limit(1).to_pandas()
        return len(first[vec_col].iloc[0])

    d = dim_count()
    if d % subspaces:
        raise ValueError(f"dim {d} not divisible into {subspaces} subspaces")
    w = d // subspaces

    outs = []
    for s in range(subspaces):
        lo = s * w

        def slice_batch(t: pa.Table, *, _lo=lo) -> pa.Table:
            if len(t) == 0:
                return pa.table({
                    id_col: t.column(id_col),
                    vec_col: pa.array([], type=pa.list_(pa.float32())),
                })
            m = _as_matrix(t.column(vec_col))[:, _lo:_lo + w]
            return pa.table({
                id_col: t.column(id_col),
                vec_col: pa.array(list(m.astype(np.float32)),
                                  type=pa.list_(pa.float32())),
            })

        sub = ds.map_batches(slice_batch, batch_format="pyarrow")
        asg = kmeans_fixed(sub, vec_col=vec_col, id_col=id_col, k=k,
                           rounds=rounds, num_buckets=num_buckets)

        def tag(t: pa.Table, *, _s=s) -> pa.Table:
            return pa.table({
                id_col: t.column(id_col),
                "subspace": pa.array(
                    np.full(len(t), _s, dtype=np.int64)),
                "code": t.column("cluster"),
                "dist": t.column("dist"),
            })

        outs.append(asg.map_batches(tag, batch_format="pyarrow"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def pq_codes_sql(*, table: str = "embeddings", vec_col: str = "embedding",
                 id_col: str = "vec_id", subspaces: int = 2, k: int = 4,
                 rounds: int = 2, dim: int = 64) -> str:
    """SQL mirror: one kmeans_fixed_sql replay per subspace over the
    sliced list expression, unioned with the subspace tag."""
    w = dim // subspaces
    parts = []
    for s in range(subspaces):
        sliced = f"(list_slice({vec_col}, {s * w + 1}, {(s + 1) * w}))"
        inner = kmeans_fixed_sql(table=table, vec_col=sliced,
                                 id_col=id_col, k=k, rounds=rounds)
        parts.append(
            f"SELECT {id_col}, {s}::BIGINT AS subspace, "
            f"cluster AS code, dist FROM ({inner})")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# MMR diversified re-ranking


def _isqrt_vec(n2: np.ndarray) -> np.ndarray:
    """Exact elementwise isqrt for int64 inputs: float sqrt ±1-corrected
    (the temperature_weights convention, vectorized)."""
    r = np.sqrt(n2.astype(np.float64)).astype(np.int64)
    r += ((r + 1) * (r + 1) <= n2)
    r -= (r * r > n2)
    return r


def _sim_ppm(dot: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Exact integer cosine in ppm under the SHIFTED floor contract:
    ``((dot + 2D)·10⁶) // D − 2·10⁶`` with ``D = max(na·nb, 1)`` — the
    shift keeps the dividend nonnegative (|dot| ≤ |a||b| < 2D for any
    quantized norm ≥ 2), where numpy's floor division and DuckDB's
    truncating ``//`` agree. The ×1000-twice staging keeps every
    intermediate inside int64 (dot ≤ 2⁴⁶ at the 2²⁰ scale)."""
    num = (dot + 2 * d) * 1000
    if (num < 0).any():
        raise ValueError("sim contract violated: quantized norms too small")
    q1, r1 = np.divmod(num, d)
    return q1 * 1000 + (r1 * 1000) // d - 2_000_000


def mmr_rerank(ds, query_vec, *, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 5, n_candidates: int = 30,
               lam=(7, 10), scale: int = CENTROID_SCALE):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) — the diversity-aware finish of a retrieval stack: greedily
    pick ``k`` of the top ``n_candidates`` maximizing

        mmr = lam_num·sim(q, d) − (lam_den − lam_num)·max_{s∈selected} sim(d, s)

    (λ = lam_num/lam_den, paper's trade-off) so near-duplicates of an
    already-selected result lose to novel ones. Every similarity is the
    exact integer ppm cosine over 2²⁰ fixed-point vectors (shifted-floor
    contract, see ``_sim_ppm``) — bit-identical across parallelism and
    SQL-replayable; ties break (score desc, id asc).

    Scale shape: ONE stateless pass scores the whole embedding table
    against the broadcast query (per-batch local top-n, global top-n over
    candidate rows only); the greedy loop runs on the driver over the
    n-candidate table (n·d ints — the k×d centroid posture of
    ``kmeans_fixed``). Returns a k-row pandas DataFrame
    ``(mmr_rank, id, sim_ppm, mmr_score)``; round 1's max-sim term is 0
    by the empty-set convention.
    """
    import ray

    lam_num, lam_den = lam
    mu = lam_den - lam_num
    qq = np.floor(np.asarray(query_vec, dtype=np.float64)
                  * scale).astype(np.int64)
    nq = max(int(_isqrt_vec(np.array([qq @ qq]))[0]), 1)
    ref = ray.put(qq)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        m = np.stack(batch.column(vec_col).to_numpy(
            zero_copy_only=False)).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        dot = q @ qv
        d = np.maximum(_isqrt_vec((q * q).sum(axis=1)) * nq, 1)
        sim = _sim_ppm(dot, d)
        order = np.lexsort((batch.column(id_col).to_numpy(), -sim))
        keep = order[:n_candidates]
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(keep)),
            "sim_ppm": pa.array(sim[keep], type=pa.int64()),
            vec_col: batch.column(vec_col).take(pa.array(keep)),
        })

    cand = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["sim_ppm", id_col], descending=[True, False])
        .limit(n_candidates)
        .to_pandas()
    )
    ids = cand[id_col].to_numpy()
    simq = cand["sim_ppm"].to_numpy(dtype=np.int64)
    q = np.floor(np.stack(cand[vec_col].to_numpy())
                 .astype(np.float64) * scale).astype(np.int64)
    nr = np.maximum(_isqrt_vec((q * q).sum(axis=1)), 1)
    dots = q @ q.T
    dmat = np.maximum(np.outer(nr, nr), 1)
    psim = _sim_ppm(dots.ravel(), dmat.ravel()).reshape(dots.shape)

    taken: list[int] = []
    rows = []
    avail = np.ones(len(ids), dtype=bool)
    for rnd in range(1, min(k, len(ids)) + 1):
        maxsim = (psim[:, taken].max(axis=1) if taken
                  else np.zeros(len(ids), dtype=np.int64))
        mmr = lam_num * simq - mu * maxsim
        idx = np.flatnonzero(avail)
        best = int(idx[np.lexsort((ids[idx], -mmr[idx]))[0]])
        rows.append((rnd, int(ids[best]), int(simq[best]),
                     int(mmr[best])))
        taken.append(best)
        avail[best] = False
    return pd.DataFrame(
        rows, columns=["mmr_rank", id_col, "sim_ppm", "mmr_score"]
    ).astype("int64")


def mmr_rerank_sql(*, table: str = "embeddings", vec_col: str = "embedding",
                   id_col: str = "vec_id", query_where: str = "vec_id = 0",
                   k: int = 5, n_candidates: int = 30, lam=(7, 10),
                   dims: int = 64, scale: int = CENTROID_SCALE) -> str:
    """SQL replay: 2²⁰-quantized lists, exact double dot products (every
    product ≤ 2⁴⁰, sums ≤ 2⁴⁶ < 2⁵³ — double-exact), the shifted-floor
    ppm cosine in HUGEINT, and the greedy loop unrolled to ``k``
    argmax-over-remaining stages."""
    lam_num, lam_den = lam
    mu = lam_den - lam_num

    def isqrt(x: str) -> str:
        s = f"CAST(floor(sqrt(({x})::DOUBLE)) AS BIGINT)"
        return (f"({s} + (CASE WHEN ({s}+1)*({s}+1) <= ({x}) THEN 1 ELSE 0"
                f" END) - (CASE WHEN {s}*{s} > ({x}) THEN 1 ELSE 0 END))")

    def sim(dot: str, d: str) -> str:
        return (f"(((({dot})::HUGEINT + 2 * ({d})::HUGEINT) * 1000000)"
                f" // ({d})::HUGEINT - 2000000)")

    sql = f"""
        WITH ev AS MATERIALIZED (
          SELECT {id_col},
                 list_transform({vec_col}::DOUBLE[],
                                x -> floor(x * {scale})) AS qd
          FROM {table}
        ),
        qv AS (SELECT qd FROM ev
               JOIN {table} USING ({id_col}) WHERE {query_where}),
        nrm AS (
          SELECT {id_col},
                 greatest({isqrt(
                     'CAST(list_dot_product(qd, qd) AS BIGINT)')}, 1)
                     AS nr
          FROM ev
        ),
        nq AS (SELECT greatest({isqrt(
            'CAST(list_dot_product(qd, qd) AS BIGINT)')}, 1) AS n
               FROM qv),
        simq AS (
          SELECT ev.{id_col},
                 {sim('CAST(list_dot_product(ev.qd, qv.qd) AS BIGINT)',
                      'greatest(nrm.nr * nq.n, 1)')} AS sim_ppm
          FROM ev JOIN nrm USING ({id_col}), qv, nq
        ),
        cand AS MATERIALIZED (
          SELECT {id_col}, sim_ppm::BIGINT AS sim_ppm
          FROM simq ORDER BY sim_ppm DESC, {id_col}
          LIMIT {n_candidates}
        ),
        pair AS MATERIALIZED (
          SELECT a.{id_col} AS ia, b.{id_col} AS ib,
                 {sim('CAST(list_dot_product(ea.qd, eb.qd) AS BIGINT)',
                      'greatest(na.nr * nb.nr, 1)')}::BIGINT AS sim
          FROM cand a JOIN ev ea ON ea.{id_col} = a.{id_col}
               JOIN nrm na ON na.{id_col} = a.{id_col},
               cand b JOIN ev eb ON eb.{id_col} = b.{id_col}
               JOIN nrm nb ON nb.{id_col} = b.{id_col}
        ),
        pick1 AS MATERIALIZED (
          SELECT 1::BIGINT AS mmr_rank, {id_col}, sim_ppm,
                 ({lam_num} * sim_ppm)::BIGINT AS mmr_score
          FROM cand ORDER BY sim_ppm DESC, {id_col} LIMIT 1
        ),
        sel1 AS (SELECT {id_col} FROM pick1)"""
    for t in range(2, k + 1):
        sql += f""",
        pick{t} AS MATERIALIZED (
          SELECT {t}::BIGINT AS mmr_rank, {id_col}, sim_ppm,
                 mmr_score::BIGINT AS mmr_score FROM (
            SELECT c.{id_col}, c.sim_ppm,
                   {lam_num} * c.sim_ppm - {mu} * max(p.sim) AS mmr_score
            FROM cand c
            JOIN pair p ON p.ia = c.{id_col}
            JOIN sel{t - 1} s ON p.ib = s.{id_col}
            WHERE c.{id_col} NOT IN (SELECT {id_col} FROM sel{t - 1})
            GROUP BY c.{id_col}, c.sim_ppm
          ) ORDER BY mmr_score DESC, {id_col} LIMIT 1
        ),
        sel{t} AS (SELECT {id_col} FROM sel{t - 1}
                   UNION ALL SELECT {id_col} FROM pick{t})"""
    unions = "\n        UNION ALL ".join(
        f"SELECT * FROM pick{t}" for t in range(1, k + 1))
    return sql + f"""
        {unions}"""


# ---------------------------------------------------------------------------
# kNN label agreement (label-error detection within cells)


def knn_label_agreement(ds, *, cluster_col: str = "cluster",
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label", k: int = 5,
                        num_buckets: int = 16):
    """Per-vector label QA: the fraction of a vector's k nearest cosine
    neighbors (WITHIN its cell) that share its label — the
    Confident-Learning-flavored mislabeled-sample signal (a clean example
    agrees with its neighborhood; a label error sits in a neighborhood
    that votes against it).

    Runs in the SemDeDup posture (:func:`~htrc_feature_reader_ray.stages.
    dedup.semdedup_pairs`): the quadratic kNN kernel runs per CELL (k-means
    cluster / LSH bucket), never per corpus — cell sizes bound the
    all-pairs term, one cluster-bucketed exchange total. Neighbor order is
    ``(cosine DESC, id ASC)`` with float64 cosine on both engines (the
    module's established rank-parity contract). Cells smaller than ``k+1``
    use every available neighbor; singletons emit ``agree_ppm = -1``.

    Output ``(id, label, cluster, n_neighbors, n_agree, agree_ppm)`` with
    ``agree_ppm = n_agree·10⁶ // n_neighbors``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cell, g in df.groupby(cluster_col, sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            lb = g[label_col].to_numpy()
            sz = len(g)
            if sz == 1:
                out.append(pd.DataFrame({
                    id_col: ids, label_col: lb,
                    cluster_col: np.repeat(cell, 1),
                    "n_neighbors": np.zeros(1, dtype=np.int64),
                    "n_agree": np.zeros(1, dtype=np.int64),
                    "agree_ppm": np.full(1, -1, dtype=np.int64),
                }))
                continue
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            n = np.sqrt((m * m).sum(axis=1))
            n[n == 0] = 1.0
            cos = (m @ m.T) / np.outer(n, n)
            np.fill_diagonal(cos, -np.inf)
            # stable argsort of -cos: ties broken by position == id asc
            order = np.argsort(-cos, axis=1, kind="stable")
            nn = min(k, sz - 1)
            nbr = order[:, :nn]
            agree = (lb[nbr] == lb[:, None]).sum(axis=1).astype(np.int64)
            out.append(pd.DataFrame({
                id_col: ids, label_col: lb,
                cluster_col: np.repeat(cell, sz),
                "n_neighbors": np.full(sz, nn, dtype=np.int64),
                "n_agree": agree,
                "agree_ppm": agree * 1_000_000 // nn,
            }))
        if not out:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=df[id_col].dtype),
                label_col: pd.Series([], dtype=df[label_col].dtype),
                cluster_col: pd.Series([], dtype=df[cluster_col].dtype),
                "n_neighbors": pd.Series([], dtype="int64"),
                "n_agree": pd.Series([], dtype="int64"),
                "agree_ppm": pd.Series([], dtype="int64"),
            })
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(ds, cluster_col, per_bucket,
                               num_buckets=num_buckets)


def knn_label_agreement_sql(*, source_sql: str, cluster_col: str = "cluster",
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            label_col: str = "label", k: int = 5) -> str:
    """SQL mirror over any (id, vec, label, cluster) relation: cell
    equi-join + row_number kNN + agreement fold, LEFT JOIN keeps
    singleton cells at -1."""
    return f"""
        WITH e AS ({source_sql}),
        pairs AS (
          SELECT a.{id_col}, a.{label_col}, a.{cluster_col},
                 b.{label_col} AS nb_label,
                 row_number() OVER (
                   PARTITION BY a.{id_col}
                   ORDER BY list_cosine_similarity(
                              a.{vec_col}::DOUBLE[],
                              b.{vec_col}::DOUBLE[]) DESC,
                            b.{id_col}) AS rn
          FROM e a JOIN e b
            ON a.{cluster_col} = b.{cluster_col}
           AND a.{id_col} <> b.{id_col}
        ),
        agg AS (
          SELECT {id_col},
                 count(*)::BIGINT AS n_neighbors,
                 sum(CASE WHEN nb_label = {label_col}
                          THEN 1 ELSE 0 END)::BIGINT AS n_agree
          FROM pairs WHERE rn <= {k}
          GROUP BY 1
        )
        SELECT e.{id_col}, e.{label_col}, e.{cluster_col},
               coalesce(a.n_neighbors, 0)::BIGINT AS n_neighbors,
               coalesce(a.n_agree, 0)::BIGINT AS n_agree,
               CASE WHEN a.n_neighbors IS NULL THEN -1
                    ELSE a.n_agree * 1000000 // a.n_neighbors
               END::BIGINT AS agree_ppm
        FROM e LEFT JOIN agg a USING ({id_col})"""


def knn_label_propagation(ds, *, cluster_col: str = "cluster",
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          label_col: str = "label", k: int = 5,
                          seed_mod: int = 5, rounds: int = 4,
                          num_buckets: int = 16):
    """Semi-supervised kNN label propagation (Zhu & Ghahramani's label
    spreading in its hard-label majority form, the workhorse for
    stretching a small labeled set across an embedding corpus): reveal
    labels only on the deterministic seed set (``id % seed_mod == 0``),
    then run ``rounds`` SYNCHRONOUS updates where every non-seed vector
    takes the majority label among its k nearest cosine neighbors'
    current labels (unlabeled neighbors abstain; zero labeled neighbors
    → stay unlabeled; ties count-desc then label-asc). Because the
    held-out truth is known, the output doubles as the accuracy audit
    of the propagation: ``(id, cluster, label, prop_label, correct)``
    for every NON-SEED vector that received a label. Seeds are input,
    not output.

    Runs in the SemDeDup posture of :func:`knn_label_agreement`: kNN
    edges live within a coarse cell (k-means cluster / LSH bucket), so
    the quadratic kernel AND every propagation round are bucket-local —
    ONE cluster-bucketed exchange total, rounds are in-memory numpy
    (one-hot bincount majority, no per-row loop). Neighbor order is the
    module's (cosine DESC, id ASC) float64 rank-parity contract.
    Bounded ``rounds`` == the mirror's unroll (converged early: extra
    rounds are no-ops since majorities over unchanged labels repeat)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cell, g in df.groupby(cluster_col, sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            lab = g[label_col].to_numpy().astype(np.int64)
            sz = len(g)
            seed = (ids % seed_mod) == 0
            if sz == 1:
                continue
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            n = np.sqrt((m * m).sum(axis=1))
            n[n == 0] = 1.0
            cos = (m @ m.T) / np.outer(n, n)
            np.fill_diagonal(cos, -np.inf)
            order = np.argsort(-cos, axis=1, kind="stable")
            nn = min(k, sz - 1)
            nbr = order[:, :nn]
            L = int(lab.max()) + 1
            cur = np.where(seed, lab, -1)
            rows = np.repeat(np.arange(sz, dtype=np.int64), nn)
            for _ in range(rounds):
                nb = cur[nbr].ravel()
                mask = nb >= 0
                cnt = np.zeros((sz, L), dtype=np.int64)
                np.add.at(cnt, (rows[mask], nb[mask]), 1)
                mx = cnt.max(axis=1)
                best = cnt.argmax(axis=1)  # ties -> smallest label
                cur = np.where(seed, lab, np.where(mx > 0, best, -1))
            got = (~seed) & (cur >= 0)
            if not got.any():
                continue
            out.append(pd.DataFrame({
                id_col: ids[got],
                cluster_col: np.repeat(cell, int(got.sum())),
                label_col: lab[got],
                "prop_label": cur[got].astype(np.int64),
                "correct": (cur[got] == lab[got]).astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                cluster_col: pd.Series([], dtype="int64"),
                label_col: pd.Series([], dtype="int64"),
                "prop_label": pd.Series([], dtype="int64"),
                "correct": pd.Series([], dtype="int64"),
            })
        return pd.concat(out, ignore_index=True)

    def cast_lab(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index(label_col), label_col,
            t.column(label_col).cast(pa.int64()))

    return bucketed_map_groups(
        ds.map_batches(cast_lab, batch_format="pyarrow"),
        cluster_col, per_bucket, num_buckets=num_buckets)


def knn_label_propagation_sql(*, source_sql: str,
                              cluster_col: str = "cluster",
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              label_col: str = "label", k: int = 5,
                              seed_mod: int = 5,
                              rounds: int = 4) -> str:
    """SQL mirror: materialized in-cell kNN edges, seeds CTE, unrolled
    synchronous majority rounds ((count DESC, label ASC) rank), final
    non-seed accuracy join."""
    sql = f"""
        WITH e AS ({source_sql}),
        knn AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT a.{id_col} AS src, b.{id_col} AS dst,
                   row_number() OVER (
                     PARTITION BY a.{id_col}
                     ORDER BY list_cosine_similarity(
                                a.{vec_col}::DOUBLE[],
                                b.{vec_col}::DOUBLE[]) DESC,
                              b.{id_col}) AS rn
            FROM e a JOIN e b
              ON a.{cluster_col} = b.{cluster_col}
             AND a.{id_col} <> b.{id_col}
          ) WHERE rn <= {k}
        ),
        seeds AS MATERIALIZED (
          SELECT {id_col} AS node, {label_col}::BIGINT AS lab
          FROM e WHERE {id_col} % {seed_mod} = 0
        ),
        l0 AS (SELECT node, lab FROM seeds)"""
    prev = "l0"
    for r in range(1, rounds + 1):
        sql += f"""
        , m{r} AS (
          SELECT node, lab FROM (
            SELECT kk.src AS node, p.lab, count(*) AS c,
                   row_number() OVER (
                     PARTITION BY kk.src
                     ORDER BY count(*) DESC, p.lab) AS rn
            FROM knn kk JOIN {prev} p ON p.node = kk.dst
            WHERE kk.src NOT IN (SELECT node FROM seeds)
            GROUP BY 1, 2
          ) WHERE rn = 1
        ),
        l{r} AS (SELECT * FROM seeds UNION ALL SELECT * FROM m{r})"""
        prev = f"l{r}"
    return sql + f"""
        SELECT e.{id_col}, e.{cluster_col},
               e.{label_col}::BIGINT AS {label_col},
               m.lab AS prop_label,
               (m.lab = e.{label_col})::BIGINT AS correct
        FROM m{rounds} m JOIN e ON e.{id_col} = m.node"""


def knn_hubness(ds, *, cluster_col: str = "cluster", id_col: str = "vec_id",
                vec_col: str = "embedding", k: int = 5,
                num_buckets: int = 16):
    """k-occurrence hubness: how many OTHER vectors (within the cell) list
    this vector among their k nearest cosine neighbors. The classic
    high-dimensional retrieval pathology metric (Radovanović et al.,
    JMLR'10): hubs (n_k ≫ k) dominate nearest-neighbor lists and distort
    retrieval/contrastive sampling; antihubs (n_k = 0) are never
    retrieved. Same cell-bounded quadratic posture and (cos DESC, id ASC)
    rank contract as :func:`knn_label_agreement`; one cluster-bucketed
    exchange. Output ``(id, cluster, n_k)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cell, g in df.groupby(cluster_col, sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            sz = len(g)
            if sz == 1:
                out.append(pd.DataFrame({
                    id_col: ids, cluster_col: np.repeat(cell, 1),
                    "n_k": np.zeros(1, dtype=np.int64)}))
                continue
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            n = np.sqrt((m * m).sum(axis=1))
            n[n == 0] = 1.0
            cos = (m @ m.T) / np.outer(n, n)
            np.fill_diagonal(cos, -np.inf)
            nbr = np.argsort(-cos, axis=1, kind="stable")[:, :min(k, sz - 1)]
            n_k = np.bincount(nbr.ravel(), minlength=sz).astype(np.int64)
            out.append(pd.DataFrame({
                id_col: ids, cluster_col: np.repeat(cell, sz), "n_k": n_k}))
        if not out:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=df[id_col].dtype),
                cluster_col: pd.Series([], dtype=df[cluster_col].dtype),
                "n_k": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(ds, cluster_col, per_bucket,
                               num_buckets=num_buckets)


def knn_hubness_sql(*, source_sql: str, cluster_col: str = "cluster",
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    k: int = 5) -> str:
    """SQL mirror: the kNN pairs CTE grouped by the NEIGHBOR side."""
    return f"""
        WITH e AS ({source_sql}),
        pairs AS (
          SELECT a.{id_col}, b.{id_col} AS nb,
                 row_number() OVER (
                   PARTITION BY a.{id_col}
                   ORDER BY list_cosine_similarity(
                              a.{vec_col}::DOUBLE[],
                              b.{vec_col}::DOUBLE[]) DESC,
                            b.{id_col}) AS rn
          FROM e a JOIN e b
            ON a.{cluster_col} = b.{cluster_col}
           AND a.{id_col} <> b.{id_col}
        )
        SELECT e.{id_col}, e.{cluster_col},
               coalesce(h.n_k, 0)::BIGINT AS n_k
        FROM e LEFT JOIN (
          SELECT nb AS {id_col}, count(*) AS n_k
          FROM pairs WHERE rn <= {k} GROUP BY 1) h
        USING ({id_col})"""


def embedding_covariance(ds, *, vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         scale: int = CENTROID_SCALE,
                         num_buckets: int = 8):
    """Exact d×d covariance of the quantized embedding table — the
    whitening / PCA-prep moment matrix (ZCA whitening, embedding-drift
    monitoring, and the input every random-projection sanity check
    wants).  Upper triangle ``(i ≤ j)`` with

        cov_ppm = (n·Σ v_i v_j − Σ v_i · Σ v_j) · 10⁶ // (n² · scale²)

    over the 2²⁰ fixed-point values ``v = floor(x·scale)`` — i.e. the
    float-domain covariance in exact ppm, bit-identical across runs and
    parallelism (no float mean is ever subtracted; the cross-multiplied
    numerator is the textbook n²-denominator identity).

    Scale shape: each batch contributes ONE exact int64 Gram partial
    (``Qᵀ@Q`` — integer matmul, products ≤ 2⁴⁰·B < 2⁶³ for any sane
    batch) plus the d column sums, emitted as d(d+1)/2 upper-triangle
    rows; one tiny (i,j)-keyed fold; the ppm finish walks the bounded
    d² table on the driver in arbitrary-precision Python ints (the
    grouped_emd HUGEINT-mirror posture).  Output ``(i, j, n, cov_ppm)``.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(vec_col).to_numpy(
            zero_copy_only=False)).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        n, d = q.shape
        s = q.T @ q
        col = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "n": pa.array(np.full(len(iu), n, dtype=np.int64)),
            "si": pa.array(col[iu]),
            "sj": pa.array(col[ju]),
            "sij": pa.array(s[iu, ju]),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], {"n": ("n", "sum"), "si": ("si", "sum"),
                     "sj": ("sj", "sum"), "sij": ("sij", "sum")},
        num_buckets=num_buckets, bucket_key="i")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # bounded d² rows: exact big-int finish (int64 would overflow on
        # n·sij), mirroring the oracle's HUGEINT arithmetic
        den_unit = scale * scale
        cov = [
            (int(n) * int(sij) - int(si) * int(sj)) * 1_000_000
            // (int(n) * int(n) * den_unit)
            for n, si, sj, sij in zip(df["n"], df["si"], df["sj"],
                                      df["sij"])
        ]
        return pd.DataFrame({
            "i": df["i"].astype("int64"),
            "j": df["j"].astype("int64"),
            "n": df["n"].astype("int64"),
            "cov_ppm": pd.Series(cov, dtype="int64"),
        })

    return folded.map_batches(finish, batch_format="pandas")


def embedding_covariance_sql(*, table: str = "embeddings",
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             scale: int = CENTROID_SCALE) -> str:
    # SHIFT makes the HUGEINT dividend nonnegative so DuckDB's truncating
    # // equals Python's floor // (the _sim_ppm shifted-floor contract):
    # |cov·10⁶/scale²| is bounded by 10⁶·max|x|² ≪ 10¹³.
    shift = 10 ** 13
    den = f"(count(*)::HUGEINT * count(*)::HUGEINT * {scale}::HUGEINT * {scale}::HUGEINT)"
    num = (f"((count(*)::HUGEINT * sum(a.v::HUGEINT * b.v::HUGEINT)"
           f" - sum(a.v)::HUGEINT * sum(b.v)::HUGEINT) * 1000000)")
    return f"""
        WITH q AS (
          SELECT {id_col}, u.i - 1 AS dim,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS v
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        )
        SELECT a.dim AS i, b.dim AS j, count(*)::BIGINT AS n,
               (({num} + {shift}::HUGEINT * {den}) // {den}
                - {shift})::BIGINT AS cov_ppm
        FROM q a JOIN q b ON a.{id_col} = b.{id_col} AND a.dim <= b.dim
        GROUP BY 1, 2"""


def pca_power(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
              rounds: int = 8, scale: int = CENTROID_SCALE,
              num_buckets: int = 8):
    """Top principal component of the embedding corpus via fixed-point
    power iteration on the exact integer covariance — the first PCA axis
    (dominant drift/variance direction: the de-biasing vector of
    all-but-the-top-component postprocessing, Mu & Viswanath ICLR'18, and
    the first thing an embedding-drift monitor plots). The deflation-free
    single-component form is deliberately chosen: it is the piece that
    streams (everything after the d×d moment fold is driver math on a
    BOUNDED table), and it is SQL-replayable round by round.

    Iteration contract (bit-exact across parallelism and vs the mirror):
    ``C`` = the symmetrized ``cov_ppm`` matrix from
    :func:`embedding_covariance` (exact ints); ``v₀ = 10⁶·𝟙``; per round

        raw = C @ v;   v ← sign(raw)·(|raw|·10⁶ // max|raw|)

    — max-abs normalization instead of the L2 norm, because max is exact
    and integer where a sqrt is neither (any norm works for power
    iteration); division truncates toward zero (DuckDB ``//`` semantics,
    the interpolate_daily convention). Fixed ``rounds`` (no convergence
    test — the unrolled mirror must replay the same count; covariance is
    PSD so iterates don't oscillate). ``eig_ppm`` is the final Rayleigh
    quotient ``Σv·raw // Σv²`` (≈ 10⁶·λ in the float-covariance domain),
    constant across rows. An all-zero covariance (constant corpus) has no
    principal direction and raises.

    Scale shape: ALL distributed work is :func:`embedding_covariance`'s
    one Gram-partial fold; the iteration itself touches only the d²
    table in Python ints (Σv·raw ≈ d·10⁶·d·10¹² passes int64 — the
    HUGEINT-mirror posture). Output: ``(dim, component_ppm, eig_ppm)``.
    """
    cov = embedding_covariance(
        ds, vec_col=vec_col, id_col=id_col, scale=scale,
        num_buckets=num_buckets).to_pandas()

    d = int(cov["j"].max()) + 1
    C = [[0] * d for _ in range(d)]
    for i, j, c in zip(cov["i"], cov["j"], cov["cov_ppm"]):
        C[int(i)][int(j)] = int(c)
        C[int(j)][int(i)] = int(c)

    def trunc_div(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    v = [1_000_000] * d
    eig = 0
    for _ in range(rounds):
        raw = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in raw)
        if m == 0:
            raise ValueError("pca_power: zero covariance matrix "
                             "(constant corpus has no principal axis)")
        svr = sum(a * b for a, b in zip(v, raw))
        svv = sum(a * a for a in v)
        eig = trunc_div(svr, svv)
        v = [trunc_div(x * 1_000_000, m) for x in raw]

    return pd.DataFrame({
        "dim": pd.Series(range(d), dtype="int64"),
        "component_ppm": pd.Series(v, dtype="int64"),
        "eig_ppm": pd.Series([eig] * d, dtype="int64"),
    })


def pca_power_sql(*, table: str = "embeddings",
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  rounds: int = 8, scale: int = CENTROID_SCALE) -> str:
    """SQL mirror: the covariance oracle as a derived table, symmetrized,
    then ``rounds`` unrolled (join → max-abs → sign-split truncating
    division) CTE rounds; the final Rayleigh quotient uses the last
    round's pre-normalization ``raw`` exactly like the engine."""
    cov_inner = embedding_covariance_sql(
        table=table, vec_col=vec_col, id_col=id_col, scale=scale)
    parts = [f"""
        WITH cov AS MATERIALIZED ({cov_inner}),
        sym AS (
          SELECT i, j, cov_ppm FROM cov
          UNION ALL
          SELECT j AS i, i AS j, cov_ppm FROM cov WHERE i < j
        ),
        v0 AS (SELECT DISTINCT i AS dim, 1000000::HUGEINT AS val
               FROM sym)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
        r{r} AS (
          SELECT s.i AS dim, sum(s.cov_ppm::HUGEINT * v.val) AS raw
          FROM sym s JOIN v{r - 1} v ON s.j = v.dim GROUP BY 1
        ),
        m{r} AS (SELECT max(abs(raw)) AS m FROM r{r}),
        v{r} AS (
          SELECT dim,
                 CASE WHEN raw < 0 THEN -((-raw) * 1000000 // m)
                      ELSE raw * 1000000 // m END AS val
          FROM r{r} CROSS JOIN m{r}
        )""")
    parts.append(f""",
        e AS (
          SELECT CASE WHEN svr < 0 THEN -((-svr) // svv)
                      ELSE svr // svv END AS eig_ppm
          FROM (SELECT sum(v.val * r.raw) AS svr,
                       sum(v.val * v.val) AS svv
                FROM v{rounds - 1} v JOIN r{rounds} r ON v.dim = r.dim)
        )
        SELECT v.dim::BIGINT AS dim, v.val::BIGINT AS component_ppm,
               e.eig_ppm::BIGINT AS eig_ppm
        FROM v{rounds} v CROSS JOIN e""")
    return "".join(parts)


def matryoshka_quality(ds, *, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       budgets=(8, 16, 32, 64),
                       scale: int = CENTROID_SCALE,
                       num_buckets: int = 8):
    """Truncation-quality curve for Matryoshka-style embedding serving
    (Kusupati et al., NeurIPS'22): before storing only the first d′ of d
    dims (the standard latency/footprint trade of MRL-trained and
    API-served embeddings), measure how much of each vector actually
    lives in the prefix. The metric is exactly computable with NO square
    root: the padded prefix's dot with the full vector IS the prefix sum
    of squares, so

        cos²(v[:d′]‖0, v) = Σ_{i<d′} v_i² / Σ v_i²   (exactly)

    and per vector ``energy_ppm(d′) = prefix_ss·10⁶ // total_ss`` over
    the 2²⁰ fixed-point quantization — bit-identical across parallelism
    and SQL-replayable. Per budget the corpus rolls up to ``(budget, n,
    mean_energy_ppm, min_energy_ppm)`` — the mean says what truncation
    costs on average, the MIN is the worst vector, the number that
    decides whether truncation is safe. Zero vectors have no direction
    and are excluded by contract.

    Scale shape: per-batch integer cumulative squares at the budget cuts
    (object-int ppm division — prefix_ss·10⁶ can pass int64), partials
    collapse to |budgets| rows per batch, ONE tiny budget-keyed fold,
    driver finish (mean = Σ energies // n, the engine-wide floor).
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    budgets = tuple(int(b) for b in budgets)

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(vec_col).to_numpy(
            zero_copy_only=False)).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        sq = q * q
        cum = np.cumsum(sq, axis=1)
        tot = cum[:, -1]
        keep = tot > 0
        cum, tot = cum[keep], tot[keep].astype(object)
        if not len(cum):  # all-zero batch: emit nothing (a 0-row min
            # partial would wrongly pull the folded min to 0)
            return pa.table({
                "budget": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "sum_energy": pa.array([], type=pa.int64()),
                "min_energy": pa.array([], type=pa.int64()),
            })
        rows = {"budget": [], "n": [], "sum_energy": [], "min_energy": []}
        for b in budgets:
            pre = cum[:, min(b, cum.shape[1]) - 1].astype(object)
            e = pre * 1_000_000 // tot  # object ints: exact past int64
            rows["budget"].append(b)
            rows["n"].append(len(e))
            rows["sum_energy"].append(int(sum(e)))
            rows["min_energy"].append(int(min(e)) if len(e) else 0)
        return pa.table({
            "budget": pa.array(rows["budget"], type=pa.int64()),
            "n": pa.array(rows["n"], type=pa.int64()),
            "sum_energy": pa.array(rows["sum_energy"], type=pa.int64()),
            "min_energy": pa.array(rows["min_energy"], type=pa.int64()),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["budget"], {"n": ("n", "sum"), "sum_energy": ("sum_energy", "sum"),
                     "min_energy": ("min_energy", "min")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("budget").reset_index(drop=True)

    n = folded["n"].astype("int64")
    return pd.DataFrame({
        "budget": folded["budget"].astype("int64"),
        "n": n,
        "mean_energy_ppm": (folded["sum_energy"].astype("int64")
                            // n).astype("int64"),
        "min_energy_ppm": folded["min_energy"].astype("int64"),
    })


def int8_quant_error(ds, *, vec_col: str = "embedding",
                     id_col: str = "vec_id", scale: int = CENTROID_SCALE,
                     num_buckets: int = 8):
    """Per-dimension int8 symmetric-quantization error audit — the check
    an embedding-serving stack runs before switching storage from fp32
    to int8 (4× footprint cut, the standard vector-DB trade): with the
    per-dim symmetric scale ``maxabs_d / 127``, how much does each
    dimension actually lose?

    Exact integer contract (both engines replay it bit-for-bit): over
    the 2²⁰ fixed-point values ``q = floor(x·scale)``,

        code = sign(q) · ((|q|·127 + maxabs_d // 2) // maxabs_d)   [round-half-away]
        deq  = sign(code) · (|code|·maxabs_d // 127)               [truncating]
        err  = |q − deq|

    Per dim: ``(dim, maxabs, max_err_ppm, mean_err_ppm)`` with errors in
    ppm OF that dim's maxabs (the scale-free number you compare across
    dims): ``max_err_ppm = max(err)·10⁶ // maxabs``, ``mean_err_ppm =
    Σerr·10⁶ // (n·maxabs)``. A constant-zero dim quantizes losslessly →
    both 0 by contract. The theoretical bound for this quantizer is
    ≈ ½ step = 10⁶/254 ≈ 3937 ppm — a dim far above it signals outliers
    (the LLM.int8() emergent-feature story) and wants a per-dim fp16
    escape hatch.

    Scale shape: pass 1 = per-batch |q| max partials into one d-row fold
    (the minmax posture); the d-sized scale table broadcasts via
    ``ray.put``; pass 2 = stateless vectorized quant/dequant error
    partials ``(dim, n, sum_err, max_err)`` into one d-row fold; the ppm
    finish walks d rows in Python ints (Σerr·10⁶ passes int64 at corpus
    scale — the HUGEINT-mirror posture).
    """
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def maxabs_partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(vec_col).to_numpy(
            zero_copy_only=False)).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        a = np.abs(q).max(axis=0)
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "maxabs": pa.array(a),
        })

    ma = bucketed_aggregate(
        ds.map_batches(maxabs_partial, batch_format="pyarrow"),
        ["dim"], {"maxabs": ("maxabs", "max")}, num_buckets=num_buckets,
    ).to_pandas().sort_values("dim")
    maxabs = ma["maxabs"].to_numpy().astype(np.int64)
    ma_ref = ray.put(maxabs)

    def err_partial(batch: pa.Table) -> pa.Table:
        mv = ray.get(ma_ref)
        m = np.stack(batch.column(vec_col).to_numpy(
            zero_copy_only=False)).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        safe = np.maximum(mv, 1)[None, :]
        aq = np.abs(q)
        code = np.sign(q) * ((aq * 127 + safe // 2) // safe)
        deq = np.sign(code) * (np.abs(code) * mv[None, :] // 127)
        err = np.abs(q - deq)
        err[:, mv == 0] = 0
        d = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array(np.full(d, q.shape[0], dtype=np.int64)),
            "sum_err": pa.array(err.sum(axis=0).astype(np.int64)),
            "max_err": pa.array(err.max(axis=0).astype(np.int64)),
        })

    folded = bucketed_aggregate(
        ds.map_batches(err_partial, batch_format="pyarrow"),
        ["dim"], {"n": ("n", "sum"), "sum_err": ("sum_err", "sum"),
                  "max_err": ("max_err", "max")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("dim").reset_index(drop=True)

    out_max, out_mean = [], []
    for dim, n, se, me in zip(folded["dim"], folded["n"],
                              folded["sum_err"], folded["max_err"]):
        mab = int(maxabs[int(dim)])
        if mab == 0:
            out_max.append(0)
            out_mean.append(0)
        else:
            out_max.append(int(me) * 1_000_000 // mab)
            out_mean.append(int(se) * 1_000_000 // (int(n) * mab))
    return pd.DataFrame({
        "dim": folded["dim"].astype("int64"),
        "maxabs": pd.Series(maxabs[folded["dim"].to_numpy()],
                            dtype="int64"),
        "max_err_ppm": pd.Series(out_max, dtype="int64"),
        "mean_err_ppm": pd.Series(out_mean, dtype="int64"),
    })


def int8_quant_error_sql(*, table: str = "embeddings",
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         scale: int = CENTROID_SCALE) -> str:
    """SQL mirror: per-dim maxabs join, the identical round-half-away /
    truncating pair (DuckDB // truncates toward zero, matching the
    engine's sign-split), HUGEINT ppm finish."""
    return f"""
        WITH q AS (
          SELECT {id_col}, u.i - 1 AS dim,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS v
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        ), ma AS (
          SELECT dim, max(abs(v))::BIGINT AS maxabs FROM q GROUP BY 1
        ), e AS (
          SELECT q.dim, ma.maxabs,
                 abs(q.v - CASE WHEN ma.maxabs = 0 THEN q.v ELSE
                   (CASE WHEN q.v < 0 THEN -1 ELSE 1 END)
                   * ((abs(q.v) * 127 + ma.maxabs // 2) // ma.maxabs)
                   * ma.maxabs // 127 END) AS err
          FROM q JOIN ma USING (dim)
        )
        SELECT dim::BIGINT AS dim, maxabs::BIGINT AS maxabs,
               CASE WHEN maxabs = 0 THEN 0 ELSE
                 (max(err)::HUGEINT * 1000000 // maxabs) END::BIGINT
                   AS max_err_ppm,
               CASE WHEN maxabs = 0 THEN 0 ELSE
                 (sum(err)::HUGEINT * 1000000
                  // (count(*)::HUGEINT * maxabs)) END::BIGINT
                   AS mean_err_ppm
        FROM e GROUP BY e.dim, e.maxabs"""


def matryoshka_quality_sql(*, table: str = "embeddings",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           budgets=(8, 16, 32, 64),
                           scale: int = CENTROID_SCALE) -> str:
    """SQL mirror: unnest-with-index squares, per-(vector, budget)
    HUGEINT prefix/total sums, identical floor divisions (all nonneg)."""
    vals = ", ".join(f"({int(b)})" for b in budgets)
    return f"""
        WITH q AS (
          SELECT {id_col}, u.i - 1 AS dim,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS v
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        ), b(budget) AS (VALUES {vals}),
        e AS (
          SELECT q.{id_col}, b.budget,
                 coalesce(sum(q.v::HUGEINT * q.v)
                          FILTER (WHERE q.dim < b.budget), 0) AS pre,
                 sum(q.v::HUGEINT * q.v) AS tot
          FROM q CROSS JOIN b
          GROUP BY 1, 2
        ), en AS (
          SELECT budget, (pre * 1000000 // tot) AS energy
          FROM e WHERE tot > 0
        )
        SELECT budget::BIGINT AS budget, count(*)::BIGINT AS n,
               (sum(energy) // count(*))::BIGINT AS mean_energy_ppm,
               min(energy)::BIGINT AS min_energy_ppm
        FROM en GROUP BY 1"""


# ---------------------------------------------------------------------------
# retrieval-quality evaluation: recall@k of an ANN path vs the exact top-k


def topk_recall(approx, exact, *, k: int, query_col: str = "query_id",
                id_col: str = "vec_id"):
    """Recall@k of an approximate top-k table against the exact one — THE
    acceptance metric for every ANN trade-off (LSH nbits, IVF nprobe): per
    query, ``recall_ppm = |approx ∩ exact| · 10⁶ // k`` in exact integer
    ppm.  Queries with no approx rows (e.g. an empty LSH bucket) score 0 —
    the query domain is the EXACT side's, so a silent ANN miss cannot
    silently drop its row.

    Both inputs are (query, id[, rank]) top-k tables — Q×k rows, bounded by
    the query count, so this merges on the driver per the kmeans-centroid
    posture; the distributed work already happened inside the two top-k
    ops."""
    a = approx.to_pandas() if hasattr(approx, "to_pandas") else approx
    e = exact.to_pandas() if hasattr(exact, "to_pandas") else exact
    hits = e[[query_col, id_col]].merge(
        a[[query_col, id_col]], on=[query_col, id_col], how="inner")
    n_hit = hits.groupby(query_col, sort=False).size().rename("n_hit")
    out = (
        e[[query_col]].drop_duplicates()
        .merge(n_hit, left_on=query_col, right_index=True, how="left")
    )
    out["n_hit"] = out["n_hit"].fillna(0).astype("int64")
    out["recall_ppm"] = out["n_hit"] * 1_000_000 // k
    return out[[query_col, "recall_ppm"]].reset_index(drop=True)


def topk_recall_sql(exact_sql: str, approx_sql: str, *, k: int,
                    query_col: str = "query_id",
                    id_col: str = "vec_id") -> str:
    """SQL mirror of :func:`topk_recall` over two top-k replay queries."""
    return f"""
        SELECT e.{query_col},
               (count(a.{id_col}) * 1000000 // {k})::BIGINT AS recall_ppm
        FROM ({exact_sql}) e LEFT JOIN ({approx_sql}) a
          USING ({query_col}, {id_col})
        GROUP BY 1"""


# ---------------------------------------------------------------------------
# mutual nearest-neighbor pairs (reciprocal top-1 cosine)


def mutual_nn(ds, *, cluster_col: str = "cluster", id_col: str = "vec_id",
              vec_col: str = "embedding", num_buckets: int = 16):
    """Mutual nearest-neighbor pairs: ``(a, b)`` where b is a's cosine
    top-1 AND a is b's — the high-precision alignment/matching primitive
    (de-facto standard for unsupervised bitext mining, Artetxe & Schwenk
    ACL'19 margin-scoring lineage, and the pairing step of
    entity-matching pipelines): reciprocity filters out hub-induced
    one-way matches, which is why mutual-NN precision beats plain top-1
    wherever :func:`knn_hubness` reports hubs. Same cell-bounded
    quadratic posture and ``(cos DESC, id ASC)`` rank contract as
    knn_hubness — exact within the kmeans cell, cells keep the quadratic
    bounded, ONE cluster-bucketed exchange; singleton cells emit nothing
    (no neighbor exists). Output ``(vec_a, vec_b)`` with a < b."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby(cluster_col, sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            sz = len(g)
            if sz < 2:
                continue
            ids = g[id_col].to_numpy()
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            n = np.sqrt((m * m).sum(axis=1))
            n[n == 0] = 1.0
            cos = (m @ m.T) / np.outer(n, n)
            np.fill_diagonal(cos, -np.inf)
            nn = np.argsort(-cos, axis=1, kind="stable")[:, 0]
            i = np.arange(sz)
            mutual = (nn[nn[i]] == i) & (i < nn[i])
            out.append(pd.DataFrame({
                "vec_a": ids[i[mutual]],
                "vec_b": ids[nn[i[mutual]]],
            }))
        if not out:
            return pd.DataFrame({
                "vec_a": pd.Series([], dtype=df[id_col].dtype),
                "vec_b": pd.Series([], dtype=df[id_col].dtype)})
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(ds, cluster_col, per_bucket,
                               num_buckets=num_buckets)


def mutual_nn_sql(*, source_sql: str, cluster_col: str = "cluster",
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """SQL mirror: the top-1 rank CTE self-joined on reciprocity."""
    return f"""
        WITH e AS ({source_sql}),
        nn AS (
          SELECT a.{id_col} AS id, b.{id_col} AS nb,
                 row_number() OVER (
                   PARTITION BY a.{id_col}
                   ORDER BY list_cosine_similarity(
                              a.{vec_col}::DOUBLE[],
                              b.{vec_col}::DOUBLE[]) DESC,
                            b.{id_col}) AS rn
          FROM e a JOIN e b
            ON a.{cluster_col} = b.{cluster_col}
           AND a.{id_col} <> b.{id_col}
        ),
        top AS (SELECT id, nb FROM nn WHERE rn = 1)
        SELECT t1.id AS vec_a, t1.nb AS vec_b
        FROM top t1 JOIN top t2 ON t1.nb = t2.id AND t2.nb = t1.id
        WHERE t1.id < t1.nb
        ORDER BY 1"""


def embedding_isotropy(ds, *, vec_col: str = "embedding",
                       scale: int = CENTROID_SCALE,
                       num_buckets: int = 4):
    """Corpus-level isotropy / anisotropy audit of the embedding table —
    the one-row health check run before trusting cosine geometry at all:
    contextual and contrastively-trained embedding spaces are famously
    ANISOTROPIC (Ethayarajh, EMNLP 2019 — mean pairwise cosine of BERT
    layers approaches 1; Mu & Viswanath, ICLR 2018 prescribe removing
    the common mean direction), and an anisotropic space silently
    inflates every cosine downstream (semdedup thresholds, ANN recall,
    kNN label agreement all calibrate against it).

    Exact-integer form (no sqrt, no float mean): over the 2²⁰
    fixed-point vectors ``q = floor(x·scale)`` with ``S = Σᵢ qᵢ`` and
    ``T = Σᵢ‖qᵢ‖²``, the algebraic identities

        Σ_{i≠j} qᵢ·qⱼ = ‖S‖² − T          (sum of all cross dots)
        0 ≤ ‖S‖² ≤ n·T                      (Cauchy–Schwarz)

    give two scale-free ratios, both exactly replayable in SQL:

    * ``center_ppm = ‖S‖²·10⁶ // (n·T)`` — the mass-concentration ratio
      ``‖mean vector‖² / mean ‖v‖²`` in [0, 10⁶]: 0 = perfectly
      centered, 10⁶ = all vectors identical (the Mu–Viswanath "common
      direction" share of total energy).
    * ``pair_ppm = (‖S‖² − T)·10⁶ // ((n−1)·T)`` — mean pairwise dot
      over mean self dot, the exact-dot analog of Ethayarajh's mean
      pairwise cosine (equal to it when vectors are unit-norm); signed
      via the engine-wide shifted-floor convention so Python floor ==
      DuckDB truncation.

    Contract: n ≥ 2 and at least one nonzero vector (raises otherwise —
    a degenerate corpus has no geometry to audit).

    Scale shape: per-batch d-row partials ``(dim, s=Σv, ss=Σv², cnt)``
    — one integer column-sum pass, no Gram matrix — into ONE tiny
    d-keyed fold; the finish folds the d rows to the three scalars on
    the driver in Python ints (big-int safe past int64 at corpus n).
    Output: one row ``(n, center_ppm, pair_ppm)``."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(vec_col).to_numpy(
            zero_copy_only=False)).astype(np.float64)
        q = np.floor(m * scale).astype(np.int64)
        n, d = q.shape
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "s": pa.array(q.sum(axis=0)),
            "ss": pa.array((q * q).sum(axis=0)),
            "cnt": pa.array(np.full(d, n, dtype=np.int64)),
        })

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"], {"s": ("s", "sum"), "ss": ("ss", "sum"),
                  "cnt": ("cnt", "sum")},
        num_buckets=num_buckets, bucket_key="dim",
    ).to_pandas()

    if folded.empty:
        raise ValueError("embedding_isotropy: empty corpus")
    n = int(folded["cnt"].iloc[0])
    s2 = sum(int(v) ** 2 for v in folded["s"])
    t = sum(int(v) for v in folded["ss"])
    if n < 2 or t == 0:
        raise ValueError("embedding_isotropy: need n >= 2 nonzero vectors")
    shift = 10 ** 7  # |pair ratio| < n <= 10^7-bounded corpus per contract
    center = s2 * 1_000_000 // (n * t)
    pair = ((s2 - t) * 1_000_000 + shift * ((n - 1) * t)) \
        // ((n - 1) * t) - shift
    import ray.data

    return ray.data.from_pandas(pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "center_ppm": pd.Series([center], dtype="int64"),
        "pair_ppm": pd.Series([pair], dtype="int64"),
    }))


def embedding_isotropy_sql(*, table: str = "embeddings",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           scale: int = CENTROID_SCALE) -> str:
    """SQL mirror: unnest to (id, dim, v), per-dim HUGEINT sums, the two
    shifted-floor ratio finishes over the folded scalars."""
    shift = 10 ** 7
    return f"""
        WITH q AS (
          SELECT {id_col}, u.i - 1 AS dim,
                 floor({vec_col}[u.i]::DOUBLE * {scale})::BIGINT AS v
          FROM {table},
               unnest(generate_series(1, len({vec_col}))) AS u(i)
        ),
        dims AS (
          SELECT dim, sum(v)::HUGEINT AS s, sum(v::HUGEINT * v) AS ss
          FROM q GROUP BY 1
        ),
        tot AS (
          SELECT sum(s * s) AS s2, sum(ss) AS t,
                 (SELECT count(*)::HUGEINT FROM {table}) AS n
          FROM dims
        )
        SELECT n::BIGINT AS n,
               (s2 * 1000000 // (n * t))::BIGINT AS center_ppm,
               (((s2 - t) * 1000000 + {shift}::HUGEINT * ((n - 1) * t))
                // ((n - 1) * t) - {shift})::BIGINT AS pair_ppm
        FROM tot"""
