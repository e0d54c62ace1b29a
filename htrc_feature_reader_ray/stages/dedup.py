"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (per the training-data-pipeline requirements):
  * exact      — content hash per batch (vectorized) → tiny groupby on the
                 digest → keep min id. Shuffle carries only (digest, id).
  * minhash    — per-batch signature computation (numpy, one matrix op per
                 batch) → explode to (band, band_hash, id) rows → groupby
                 bands → candidate pairs → exact-Jaccard verification.
  * simhash    — 64-bit signed-bit fingerprint per doc; equal-hash grouping
                 plus 16-bit band candidates for small Hamming distances.

All base hashing uses the engine's stable 64-bit hash (functions/ids.py), so
results are reproducible across runs/processes/nodes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from htrc_feature_reader_ray.functions.ids import stable_hash64

_WS_RE = re.compile(r"\s+")

MERSENNE_P = (1 << 61) - 1


def _normalize(t: str) -> str:
    return _WS_RE.sub(" ", t).lower()


def text_md5_batch(batch: pa.Table, text_col: str) -> pa.Array:
    # null text hashes like empty text (robustness contract: a missing
    # field never aborts a corpus-wide pass; see tests null sweep)
    return pa.array(
        [
            hashlib.md5(_normalize(t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ],
        type=pa.string(),
    )


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 32):
    """One row per distinct (normalized) text: (text_md5, kept id = min id,
    n_dups). SQL mirror: GROUP BY md5(lower(regexp_replace(text,...))).

    Digest cardinality ~= corpus cardinality, so the fold runs as a
    ``bucketed_aggregate`` (vectorized per-bucket pandas) — Ray's native
    sort-aggregate walks every group in Python, which at digest
    cardinality would dominate the whole op."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def add_hash(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: batch.column(id_col),
                "text_md5": text_md5_batch(batch, text_col),
            }
        )
        # MAP-SIDE COMBINE (min/size are commutative): collapse each
        # batch's duplicate digests before the exchange, so a hot digest
        # (40% of the corpus one exact text) crosses as one row PER
        # BATCH instead of 40% of all rows landing in one bucket
        g = t.group_by("text_md5").aggregate(
            [(id_col, "min"), (id_col, "count")])
        return pa.table({
            "text_md5": g.column("text_md5"),
            id_col: g.column(f"{id_col}_min"),
            "n_dups": g.column(f"{id_col}_count").cast(pa.int64()),
        })

    # batch_size coalesces tiny source blocks so the bucket exchange sees
    # few right-sized blocks, not one per source task
    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            batch_size=8192)
    return bucketed_aggregate(
        hashed, "text_md5",
        {id_col: (id_col, "min"), "n_dups": ("n_dups", "sum")},
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def word_shingles(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def _shingle_batch(texts, k: int):
    """Batch-vectorized per-doc DISTINCT word shingles — the same
    identities ``set(word_shingles(split(text), k))`` yields per doc
    (including the short-doc fallback: 0 < n_tokens < k emits one gram
    joining all tokens) but built with Arrow kernels: one batch
    split/flatten, window concat via ``binary_join_element_wise``,
    distinct via dictionary codes + lexsort — no per-doc Python loop.

    Returns ``(grams pa.StringArray, didx int64 ndarray)`` where rows are
    (doc-index, gram) pairs, distinct within each doc, doc-grouped in
    ascending doc order."""
    flat, tcounts = _tokenize_batch(texts)
    if not len(tcounts):
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    toff = np.concatenate(([0], np.cumsum(tcounts)[:-1]))
    wc = np.where(tcounts >= k, tcounts - k + 1, 0)
    total_w = int(wc.sum())
    parts, didx_parts = [], []
    if total_w:
        goff = np.concatenate(([0], np.cumsum(wc)[:-1]))
        starts = (np.repeat(toff, wc)
                  + np.arange(total_w, dtype=np.int64)
                  - np.repeat(goff, wc))
        cols = [flat.take(pa.array(starts + j)) for j in range(k)]
        parts.append(pc.binary_join_element_wise(*cols, " "))
        didx_parts.append(np.repeat(
            np.arange(len(tcounts), dtype=np.int64), wc))
    short = np.flatnonzero((tcounts > 0) & (tcounts < k))
    if short.size:
        offs = np.empty(2 * short.size, dtype=np.int64)
        offs[0::2] = toff[short]
        offs[1::2] = toff[short] + tcounts[short]
        # interleaved [start0,end0,start1,end1,...] offsets: even list
        # slots are the short docs' token runs, odd slots inter-doc gaps
        lst = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()),
                                       flat)
        fb = pc.binary_join(lst, " ")
        # every other slice is the inter-doc gap; keep even positions
        fb = fb.take(pa.array(np.arange(0, len(fb), 2, dtype=np.int64)))
        parts.append(fb)
        didx_parts.append(short.astype(np.int64))
    if not parts:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    grams = pa.concat_arrays([p.cast(pa.string()) for p in parts])
    didx = np.concatenate(didx_parts)
    de = grams.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, didx))
    ds_, cs_ = didx[order], codes[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])
    # the lexsort order is already (doc asc, code asc) — doc-grouped
    sel = order[keep]
    return grams.take(pa.array(sel)), didx[sel]


class MinHasher:
    """Actor-pool stage: text -> (num_perm,) minhash signature + LSH band rows.

    Permutation coefficients are generated ONCE per actor in __init__ from a
    fixed seed (state amortized across batches); per batch the signature is a
    single broadcasted (num_perm × n_shingles) numpy min-reduce per doc.
    """

    def __init__(self, *, k_shingle: int = 3, num_perm: int = 64,
                 bands: int = 16, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        assert num_perm % bands == 0
        rng = np.random.RandomState(1729)
        self.a = rng.randint(1, MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.k = k_shingle
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles([t for t in (text or "").split(" ") if t], self.k)
        if not sh:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        base = stable_hash64(sh)  # (S,) uint64
        # (P, S) permuted hashes via affine map mod 2^64 (uint64 wraparound —
        # cheap, vectorized, and adequate mixing for minhash), min over shingles
        perm = self.a[:, None] * base[None, :] + self.b[:, None]
        return perm.min(axis=1)

    # docs per internal slice: keeps the (P, S_slice) permutation matrix
    # cache-resident — measured 8x faster than one whole-batch matrix at
    # P=128 on 5k fixture docs (0.4s vs 3.5s)
    _SLICE = 256

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """(D, num_perm) signatures, vectorized in cache-sized slices."""
        if len(texts) > self._SLICE:
            return np.vstack(
                [
                    self._signatures_slice(texts[i:i + self._SLICE])
                    for i in range(0, len(texts), self._SLICE)
                ]
            )
        return self._signatures_slice(texts)

    def _signatures_slice(self, texts: list[str]) -> np.ndarray:
        """One slice: all docs' DISTINCT shingles are built with the
        vectorized ``_shingle_batch`` kernel (min over distinct == min
        over all occurrences), hashed once, permuted as a (P, S_total)
        matrix, and per-doc minima taken with segmented reduceat — no
        per-document Python work."""
        grams, didx = _shingle_batch(texts, self.k)
        sigs = np.full((len(texts), self.num_perm),
                       np.uint64(0xFFFFFFFFFFFFFFFF))
        if not len(didx):
            return sigs
        counts = np.bincount(didx, minlength=len(texts))
        ne = np.flatnonzero(counts > 0)
        base = stable_hash64(grams.to_numpy(zero_copy_only=False))
        perm = self.a[:, None] * base[None, :] + self.b[:, None]  # (P, S)
        starts = np.concatenate(([0], np.cumsum(counts[ne])[:-1]))
        sigs[ne] = np.minimum.reduceat(perm, starts, axis=1).T
        return sigs

    # odd multipliers mix the band rows into one 64-bit key (cheap, stable)
    _BAND_MIX = np.uint64(0x9E3779B97F4A7C15)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        sigs = self.signatures_batch(texts)  # (D, P)
        d = len(ids)
        banded = sigs.reshape(d, self.bands, self.rows)
        mix = self._BAND_MIX ** np.arange(1, self.rows + 1, dtype=np.uint64)
        band_hash = (banded * mix[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )  # (D, bands)
        out_id = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), d)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(
                    band_hash.reshape(-1).view(np.int64), type=pa.int64()
                ),
            }
        )


def jaccard(tokens_a: list[str], tokens_b: list[str], k: int) -> float:
    sa, sb = set(word_shingles(tokens_a, k)), set(word_shingles(tokens_b, k))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_candidate_pairs(ds, *, text_col: str = "text",
                            id_col: str = "doc_id", k_shingle: int = 3,
                            num_perm: int = 64, bands: int = 16,
                            concurrency=(1, 8),
                            materialize_bands: bool = True):
    """The candidate stage of :func:`minhash_dedup_pairs`, exposed on its
    own: signature (actor pool) → band explode → band groupby → candidate
    pairs, WITHOUT the Jaccard verify. Returns ``(doc_a, doc_b, n_bands)``
    with doc_a < doc_b — the table the streaming LSH index
    (``state/dedup_index.py::incremental_minhash_pairs``) must reproduce
    on a stream, which the equality pytest pins."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            k_shingle=k_shingle, num_perm=num_perm, bands=bands,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if materialize_bands:
        # pin the (id, band, band_hash) table before the band groupby.
        # Chaining the actor-pool signature stage straight into the sort
        # exchange measured several-fold slower on the heavy-banding case
        # (500k docs, 64 bands, 17.6M candidates: ~300s lazy vs ~60s from
        # the object store; exact ratios vary with host load). The table is
        # 3 small ints per (doc, band) — spill-backed at corpus scale; pass
        # False to keep the fully streaming plan when band volume dwarfs
        # the object store.
        band_rows = band_rows.materialize()

    def pairs_of_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one band_hash hash-bucket. Most LSH
        buckets are singletons — filter them vectorized first, then loop
        only over the (few) genuine collision groups."""
        dup = df[df.duplicated(["band", "band_hash"], keep=False)]
        if dup.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "nb": pd.Series(dtype="int64")})
        parts = []
        for _, g in dup.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}))
        if not parts:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64"),
                                 "nb": pd.Series(dtype="int64")})
        # combine within the bucket (map-side): nb = this bucket's
        # colliding-band count per pair, so the exchange still carries
        # ~one row per pair per bucket while the downstream SUM yields
        # the true band-collision total (the streaming-LSH-index
        # semantics, without the one-row-per-band exchange blow-up an
        # exact dup at heavy banding would otherwise cause)
        allp = pd.concat(parts, ignore_index=True)
        out = (allp.groupby(["doc_a", "doc_b"], as_index=False).size()
               .rename(columns={"size": "nb"}))
        out["nb"] = out["nb"].astype(np.int64)
        return out

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def dedupe_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["doc_a", "doc_b"], as_index=False)
            .agg(n_bands=("nb", "sum"))
        )
        out["n_bands"] = out["n_bands"].astype(np.int64)
        return out

    pairs = bucketed_map_groups(
        band_rows, "band_hash", pairs_of_bucket, num_buckets=32
    )
    # dedupe pairs found in multiple bands; bucketing on doc_a co-locates all
    # occurrences of a pair (second bucketed pass rather than ds.groupby —
    # Ray's Aggregate can emit schemaless empty blocks that break a
    # downstream hash join in this version)
    return bucketed_map_groups(pairs, "doc_a", dedupe_pairs,
                               num_buckets=16)


def minhash_dedup_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        k_shingle: int = 3, num_perm: int = 64,
                        bands: int = 16, threshold: float = 0.5,
                        concurrency=(1, 8), verify: str = "auto",
                        broadcast_limit: int = 1_000_000,
                        corpus_rows: int | None = None,
                        materialize_bands: bool = True):
    """Near-duplicate pairs via MinHash-LSH: signature (actor pool) → band
    explode → band groupby → candidate pairs
    (:func:`minhash_candidate_pairs`) → exact n-gram-Jaccard verify.

    Verification strategies (``verify``):
      * 'broadcast' — ray.put an id→tokens map once; valid while the corpus
        token lists fit the object store (fastest at small scale);
      * 'join' — the 100 TB path: candidate pairs are hash-JOINED back to the
        documents table twice (doc_a side, doc_b side) so only candidate
        texts move, then Jaccard is computed per batch;
      * 'auto' — 'join' when the corpus exceeds ``broadcast_limit`` rows;
        pass ``corpus_rows`` when known to avoid the sizing ``ds.count()``
        (which re-executes a non-trivial upstream pipeline).

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    cand = minhash_candidate_pairs(
        ds, text_col=text_col, id_col=id_col, k_shingle=k_shingle,
        num_perm=num_perm, bands=bands, concurrency=concurrency,
        materialize_bands=materialize_bands)

    if verify == "auto":
        if corpus_rows is None:
            # no sizing hint: take the always-scale-safe path rather than
            # paying a ds.count() that re-executes the upstream pipeline
            verify = "join"
        else:
            verify = "join" if corpus_rows > broadcast_limit else "broadcast"

    if verify == "broadcast":
        docs_df = ds.select_columns([id_col, text_col]).to_pandas()
        token_map = {
            i: [t for t in (s or "").split(" ") if t]
            for i, s in zip(docs_df[id_col], docs_df[text_col])
        }
        tokens_ref = ray.put(token_map)

        def check(batch: pd.DataFrame) -> pd.DataFrame:
            toks = ray.get(tokens_ref)
            jac = [
                jaccard(toks[a], toks[b], k_shingle)
                for a, b in zip(batch["doc_a"], batch["doc_b"])
            ]
            batch = batch.assign(jaccard=jac)
            return batch[batch["jaccard"] >= threshold][
                ["doc_a", "doc_b", "jaccard"]
            ]

        return cand.map_batches(check, batch_format="pandas")

    # 'join' path: move only candidate texts via two partitioned hash joins
    from htrc_feature_reader_ray.stages.partition import bucket_join

    docs = ds.select_columns([id_col, text_col])

    def rename(suffix):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([f"id_{suffix}", f"text_{suffix}"])

        return fn

    # the candidate list is pair-sized (the tiny near-dup subset) but its
    # LINEAGE is the whole signature+banding pipeline; bucket_join reads
    # .schema() and unions its left side, each of which would re-execute
    # that lineage (measured 91s -> 31s at 500k docs). Pin both pair-sized
    # intermediates in the object store instead.
    cand = cand.materialize()
    with_a = bucket_join(
        cand, docs.map_batches(rename("a"), batch_format="pyarrow"),
        left_key="doc_a", right_key="id_a", num_buckets=16,
    ).materialize()
    with_ab = bucket_join(
        with_a, docs.map_batches(rename("b"), batch_format="pyarrow"),
        left_key="doc_b", right_key="id_b", num_buckets=16,
    )

    def check_joined(batch: pd.DataFrame) -> pd.DataFrame:
        jac = [
            jaccard(
                [t for t in (ta or "").split(" ") if t],
                [t for t in (tb or "").split(" ") if t],
                k_shingle,
            )
            for ta, tb in zip(batch["text_a"], batch["text_b"])
        ]
        batch = batch.assign(jaccard=jac)
        return batch[batch["jaccard"] >= threshold][
            ["doc_a", "doc_b", "jaccard"]
        ]

    return with_ab.map_batches(check_joined, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates


_EMPTY_PAIRS = pa.table(
    {
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
    }
)


def _empty_pairs_df() -> pd.DataFrame:
    return pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    )


def embedding_dedup_pairs(ds, *, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          method: str = "auto",
                          broadcast_limit: int = 100_000,
                          corpus_rows: int | None = None,
                          num_groups: int = 16,
                          nbits: int = 8, n_tables: int = 24,
                          seed: int = 42):
    """Near-duplicate pairs by embedding cosine similarity: (a < b) pairs with
    cos(a, b) >= threshold, as ``(id_a, id_b)`` int64. Scoring in float64.

    Three physical strategies (``method``):
      * ``'broadcast'`` — EXACT small-N fast path: the whole (normalized)
        matrix is ``ray.put`` once; each batch does one matmul against it.
        Valid only while N×d floats fit a worker heap (``broadcast_limit``).
      * ``'triangle'`` — EXACT distributed path, no driver materialization:
        rows hash into ``num_groups`` groups; each row is replicated to the
        ``num_groups`` cells (min(g,j), max(g,j)) of the upper-triangular
        group grid, and each cell runs the dense kernel on its two groups.
        Every unordered pair of rows lands in exactly one cell, so no
        cross-cell dedup. Shuffle = num_groups × corpus rows; per-cell memory
        = 2N/num_groups vectors — size ``num_groups`` so that fits a worker.
        This is the honest shape for exact all-pairs (compute is O(N²)
        regardless; the grid spreads it over g(g+1)/2 independent cells).
      * ``'lsh'`` — APPROXIMATE candidate-pruned path for high thresholds:
        random-hyperplane sign buckets (``n_tables`` tables × ``nbits`` bits,
        same family as similarity.HyperplaneLSH), candidate pairs from bucket
        collisions (only (id, bucket) rows shuffle), then candidates join
        back to their vectors (bucket_join) for EXACT cosine verification —
        false positives impossible, false negatives ≈
        (1 - p^nbits)^n_tables with p = 1 - θ/π. At the defaults and
        threshold 0.95 the miss rate per true pair is ~2e-6; at low
        thresholds (θ → π/2) LSH prunes nothing — use 'triangle'.
      * ``'auto'`` — 'broadcast' when the corpus is under ``broadcast_limit``
        rows (pass ``corpus_rows`` to avoid a sizing ``ds.count()``), else
        'triangle' (exactness preserved at any threshold).
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups
    from htrc_feature_reader_ray.stages.similarity import _as_matrix, _normalize

    if method == "auto":
        if corpus_rows is None:
            # no sizing hint: take the always-scale-safe path rather than a
            # ds.count() that re-executes the upstream pipeline (same rule
            # as minhash verify='auto')
            method = "triangle"
        else:
            method = (
                "broadcast" if corpus_rows <= broadcast_limit else "triangle"
            )

    vecs_ds = ds.select_columns([id_col, vec_col])

    if method == "broadcast":
        full = vecs_ds.materialize()
        batches = list(
            full.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        if not batches or sum(b.num_rows for b in batches) == 0:
            import ray.data as rd

            return rd.from_arrow(_EMPTY_PAIRS)
        full_tbl = pa.concat_tables(batches)
        if full_tbl.num_rows > broadcast_limit:
            raise ValueError(
                f"broadcast path on {full_tbl.num_rows} rows exceeds "
                f"broadcast_limit={broadcast_limit}; use method='triangle'"
            )
        mat = _normalize(_as_matrix(full_tbl.column(vec_col)))
        ids = full_tbl.column(id_col).to_numpy().astype(np.int64)
        ref = ray.put((mat, ids))

        def find(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return _EMPTY_PAIRS
            m, all_ids = ray.get(ref)
            vn = _normalize(_as_matrix(batch.column(vec_col)))
            bids = batch.column(id_col).to_numpy().astype(np.int64)
            sims = vn @ m.T  # (b, N)
            keep = (sims >= threshold) & (bids[:, None] < all_ids[None, :])
            bi, ni = np.nonzero(keep)
            return pa.table(
                {
                    "id_a": pa.array(bids[bi], type=pa.int64()),
                    "id_b": pa.array(all_ids[ni], type=pa.int64()),
                }
            )

        # scan the already-materialized projection, not ds (whose upstream
        # would re-execute a second time)
        return full.map_batches(find, batch_format="pyarrow")

    if method == "triangle":
        g = num_groups

        def replicate(batch: pa.Table) -> pa.Table:
            n = len(batch)
            if n == 0:
                return batch.append_column(
                    "grp", pa.array([], type=pa.int64())
                ).append_column("cell", pa.array([], type=pa.int64()))
            ids = batch.column(id_col).to_numpy().astype(np.int64)
            gi = (stable_hash64(ids.astype(object)) % np.uint64(g)).astype(
                np.int64
            )
            take = np.repeat(np.arange(n), g)
            j = np.tile(np.arange(g, dtype=np.int64), n)
            girep = np.repeat(gi, g)
            a = np.minimum(girep, j)
            b = np.maximum(girep, j)
            rep = batch.take(pa.array(take))
            rep = rep.append_column("grp", pa.array(girep, type=pa.int64()))
            return rep.append_column(
                "cell", pa.array(a * g + b, type=pa.int64())
            )

        replicated = vecs_ds.map_batches(replicate, batch_format="pyarrow")

        def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return _empty_pairs_df()
            parts = []
            for cell, cdf in df.groupby("cell", sort=False):
                a_g, b_g = divmod(int(cell), g)
                ids = cdf[id_col].to_numpy().astype(np.int64)
                mat = _normalize(
                    np.stack(cdf[vec_col].to_numpy()).astype(np.float64)
                )
                if a_g == b_g:
                    sims = mat @ mat.T
                    ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
                else:
                    left = (cdf["grp"] == a_g).to_numpy()
                    sims = mat[left] @ mat[~left].T
                    li, ri = np.nonzero(sims >= threshold)
                    ii = np.flatnonzero(left)[li]
                    jj = np.flatnonzero(~left)[ri]
                if len(ii):
                    parts.append(
                        pd.DataFrame(
                            {
                                "id_a": np.minimum(ids[ii], ids[jj]),
                                "id_b": np.maximum(ids[ii], ids[jj]),
                            }
                        )
                    )
            if not parts:
                return _empty_pairs_df()
            return pd.concat(parts, ignore_index=True)

        return bucketed_map_groups(
            replicated, "cell", pairs_in_bucket,
            num_buckets=g * (g + 1) // 2,
        )

    if method != "lsh":
        raise ValueError(f"unknown method {method!r}")

    # ---- LSH candidate path (high-threshold near-dup at corpus scale) ----
    from htrc_feature_reader_ray.stages.partition import bucket_join

    def sign(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "bkey": pa.array([], type=pa.int64()),
                }
            )
        m = _as_matrix(batch.column(vec_col))
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((m.shape[1], nbits * n_tables))
        signs = (m @ planes) > 0  # sign pattern is scale-invariant
        signs = signs.reshape(n, n_tables, nbits)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        buckets = signs @ weights  # (n, T)
        table_tag = (np.arange(n_tables, dtype=np.int64) + 1) << nbits
        bkey = (buckets + table_tag[None, :]).reshape(-1)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, n_tables), type=pa.int64()),
                "bkey": pa.array(bkey, type=pa.int64()),
            }
        )

    band_rows = vecs_ds.map_batches(sign, batch_format="pyarrow")

    def cand_of_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated("bkey", keep=False)]
        if dup.empty:
            return _empty_pairs_df().rename(
                columns={"id_a": "doc_a", "id_b": "doc_b"}
            )
        parts = []
        for _, gdf in dup.groupby("bkey", sort=False):
            ids = np.sort(gdf[id_col].unique())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}))
        if not parts:
            return _empty_pairs_df().rename(
                columns={"id_a": "doc_a", "id_b": "doc_b"}
            )
        return pd.concat(parts, ignore_index=True).drop_duplicates()

    def dedupe_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_a", "doc_b"]].drop_duplicates()

    pairs = bucketed_map_groups(band_rows, "bkey", cand_of_bucket,
                                num_buckets=32)
    cand = bucketed_map_groups(pairs, "doc_a", dedupe_pairs, num_buckets=16)

    def pack(suffix):
        # vectors travel through the join as packed float64 BYTES: a plain
        # binary column passes pandas bucket passes untouched, where a
        # list/tensor column would become Ray's Arrow tensor extension and
        # hit its sliced-buffer to_numpy bug inside map_groups
        def fn(t: pa.Table) -> pa.Table:
            m = _as_matrix(t.column(vec_col))
            packed = pa.array([row.tobytes() for row in m], type=pa.binary())
            return pa.table(
                {f"id_{suffix}": t.column(id_col), f"vec_{suffix}": packed}
            )

        return fn

    with_a = bucket_join(
        cand, vecs_ds.map_batches(pack("a"), batch_format="pyarrow"),
        left_key="doc_a", right_key="id_a", num_buckets=16,
    )
    with_ab = bucket_join(
        with_a, vecs_ds.map_batches(pack("b"), batch_format="pyarrow"),
        left_key="doc_b", right_key="id_b", num_buckets=16,
    )

    def check(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_PAIRS
        va = _normalize(
            np.stack([np.frombuffer(x, dtype=np.float64)
                      for x in batch.column("vec_a").to_pylist()])
        )
        vb = _normalize(
            np.stack([np.frombuffer(x, dtype=np.float64)
                      for x in batch.column("vec_b").to_pylist()])
        )
        sims = (va * vb).sum(axis=1)
        keep = sims >= threshold
        return pa.table(
            {
                "id_a": pa.array(
                    batch.column("doc_a").to_numpy(zero_copy_only=False)[
                        keep
                    ].astype(np.int64),
                    type=pa.int64(),
                ),
                "id_b": pa.array(
                    batch.column("doc_b").to_numpy(zero_copy_only=False)[
                        keep
                    ].astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return with_ab.map_batches(check, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Duplicate clustering (connected components over near-dup pairs)


def _unionfind_clusters(a: np.ndarray, b: np.ndarray):
    """Driver union-find with path compression; roots kept at the minimum
    node id so cluster_id = min reachable id. Nodes come out of np.unique
    sorted, so index order == id order and 'union onto smaller index' is
    'union onto smaller id'."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(inv[: len(a)], inv[len(a):]):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.fromiter((find(i) for i in range(len(nodes))),
                        dtype=np.int64, count=len(nodes))
    return nodes.astype(np.int64), nodes[roots].astype(np.int64)


def dedup_clusters(pairs_ds, *, a_col: str = "doc_a", b_col: str = "doc_b",
                   num_buckets: int = 16, max_iters: int = 50,
                   method: str = "auto", driver_limit: int = 50_000_000):
    """Connected components over duplicate PAIRS: every node gets
    ``cluster_id`` = the smallest id reachable through the dup graph — the
    canonical-document assignment step that follows pair detection in a
    training-data dedup pipeline.

    Two physical strategies (``method``):
      * ``'driver'`` — union-find over the collected (a, b) int columns.
        The PAIR LIST is the near-dup subset, orders of magnitude smaller
        than the corpus (16 bytes/pair: 50M pairs = 800 MB) — so even at
        100 TB corpus scale this is usually the right path, and it is exact
        in one pass.
      * ``'distributed'`` — min-label propagation with pointer doubling
        (label(v) <- min over edges and label(label(v))), one bucketed
        exchange per step, O(log diameter) rounds with an exact
        changed-count convergence test per round. For the regime where even
        the edge list exceeds a single node.
      * ``'auto'`` — 'driver' when the (materialized) edge count is under
        ``driver_limit``.

    The corpus itself never enters either path; left-join the result onto
    the corpus downstream (absent nodes are their own cluster).
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    edges = pairs_ds.select_columns([a_col, b_col]).materialize()

    if method == "auto":
        method = "driver" if edges.count() <= driver_limit else "distributed"

    if method == "driver":
        tbl = pa.concat_tables(
            [t for t in edges.iter_batches(batch_format="pyarrow",
                                           batch_size=None)]
        )
        import ray.data as rd

        if tbl.num_rows == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], type=pa.int64()),
                        "cluster_id": pa.array([], type=pa.int64()),
                    }
                )
            )
        nodes, roots = _unionfind_clusters(
            tbl.column(a_col).to_numpy().astype(np.int64),
            tbl.column(b_col).to_numpy().astype(np.int64),
        )
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(nodes, type=pa.int64()),
                    "cluster_id": pa.array(roots, type=pa.int64()),
                }
            )
        )
    if method != "distributed":
        raise ValueError(f"unknown method {method!r}")

    def init_labels(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                batch.column(a_col).to_numpy().astype(np.int64),
                batch.column(b_col).to_numpy().astype(np.int64),
            ]
        )
        return pa.table({"node": pa.array(np.unique(nodes), type=pa.int64())})

    def dedupe_nodes(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")

    labels = bucketed_map_groups(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        "node", dedupe_nodes, num_buckets=num_buckets,
    ).map_batches(
        lambda t: t.append_column("label", t.column("node")),
        batch_format="pyarrow",
    ).materialize()

    from htrc_feature_reader_ray.stages.partition import bucket_join

    for _ in range(max_iters):
        # proposals: each edge sends min(label_a, label_b) to both endpoints
        lab_a = labels.map_batches(
            lambda t: t.rename_columns(["node_a", "label_a"]),
            batch_format="pyarrow",
        )
        lab_b = labels.map_batches(
            lambda t: t.rename_columns(["node_b", "label_b"]),
            batch_format="pyarrow",
        )
        with_a = bucket_join(edges, lab_a, left_key=a_col,
                             right_key="node_a", num_buckets=num_buckets)
        with_ab = bucket_join(with_a, lab_b, left_key=b_col,
                              right_key="node_b", num_buckets=num_buckets)

        def proposals(batch: pa.Table) -> pa.Table:
            la = batch.column("label_a").to_numpy().astype(np.int64)
            lb = batch.column("label_b").to_numpy().astype(np.int64)
            m = np.minimum(la, lb)
            nodes = np.concatenate(
                [
                    batch.column(a_col).to_numpy().astype(np.int64),
                    batch.column(b_col).to_numpy().astype(np.int64),
                ]
            )
            return pa.table(
                {
                    "node": pa.array(nodes, type=pa.int64()),
                    "label": pa.array(np.tile(m, 2), type=pa.int64()),
                }
            )

        def fold_min(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False)["label"].min()
            out["label"] = out["label"].astype(np.int64)
            return out

        prop = with_ab.map_batches(proposals, batch_format="pyarrow")
        merged = bucketed_map_groups(
            prop.union(labels), "node", fold_min, num_buckets=num_buckets
        )

        # pointer doubling (path compression): label(v) <- min(label(v),
        # label(label(v))). Edge propagation alone needs O(diameter) rounds
        # (a 1000-dup chain = 1000 shuffles); with the shortcut the combined
        # loop converges in O(log diameter). label(v) is always itself a
        # node of the graph, so the self-join is total.
        ptr = merged.map_batches(
            lambda t: t.rename_columns(["pnode", "plabel"]),
            batch_format="pyarrow",
        )
        shortcut = bucket_join(merged, ptr, left_key="label",
                               right_key="pnode", num_buckets=num_buckets)
        merged = shortcut.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype(np.int64),
                    "label": np.minimum(
                        df["label"].to_numpy(), df["plabel"].to_numpy()
                    ).astype(np.int64),
                }
            ),
            batch_format="pandas",
        ).materialize()

        # convergence: exact count of nodes whose label shrank this round
        old = labels.map_batches(
            lambda t: t.rename_columns(["node", "old_label"]),
            batch_format="pyarrow",
        )
        joined = bucket_join(merged, old, left_key="node",
                             right_key="node", num_buckets=num_buckets)
        changed = joined.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int((df["label"] != df["old_label"]).sum())]}
            ),
            batch_format="pandas",
        ).sum("n")
        labels = merged
        if not changed:
            break

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
    )


def dedup_cluster_sizes(clusters, *, cluster_col: str = "cluster_id",
                        num_buckets: int = 16):
    """Cluster-size histogram ``(size, n_clusters)`` over a
    :func:`dedup_clusters` assignment — the dedup-health curve the
    SemDeDup/D4 line of work plots before choosing a keep policy: a long
    tail of size-2 clusters is near-dup noise a keep-first policy prices
    at ~0; a head of size-10⁴ clusters is template boilerplate whose
    removal changes the corpus mixture and deserves a look BEFORE the
    delete pass runs. (Note :func:`dedup_clusters` emits only nodes that
    appear in a dup pair, so size ≥ 2 always — singletons are the
    corpus complement, not rows here.)

    Scale shape: per-batch ``(cluster, n)`` Arrow count partials, ONE
    cluster-bucketed fold for exact sizes (members of a cluster can span
    batches), then ≤ |distinct sizes| rows into a native size fold — the
    degree_histogram posture.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([cluster_col]).group_by([cluster_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([cluster_col, "n"])

    sizes = bucketed_aggregate(
        clusters.map_batches(partial, batch_format="pyarrow"),
        [cluster_col], {"n": ("n", "sum")}, num_buckets=num_buckets)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n"].value_counts()
        return pd.DataFrame({
            "size": vc.index.to_numpy(dtype=np.int64),
            "n_clusters": vc.to_numpy(dtype=np.int64),
        })

    agg = (sizes.map_batches(hist, batch_format="pandas")
           .groupby("size").sum("n_clusters"))
    return agg.map_batches(
        lambda df: df.rename(columns={"sum(n_clusters)": "n_clusters"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash


def md5_hash64(tokens) -> np.ndarray:
    """uint64 token hash = little-endian first 8 bytes of md5 — chosen so SQL
    can replay it exactly (DuckDB ``md5_number_upper(token)``), making simhash
    a fully oracle-checkable op. Hashed once per batch VOCABULARY, not per
    occurrence."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


def simhash_scalar(text: str) -> np.uint64:
    """Reference single-doc simhash (test oracle for the batched kernel)."""
    toks = [t for t in (text or "").split(" ") if t]
    if not toks:
        return np.uint64(0)
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    h = md5_hash64(uniq)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    score = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    bitvec = (score > 0).astype(np.uint64)
    return np.bitwise_or.reduce(bitvec << np.arange(64, dtype=np.uint64))


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Batched 64-bit simhash: token-count weighted bitwise sign aggregation.

    One pass for the whole batch (the ``signatures_batch`` pattern): all
    docs' tokens are factorized into one vocabulary, each vocab entry hashed
    ONCE, per-(doc, token) counts built with one ``np.unique``, and per-doc
    bit scores reduced with a single segmented ``np.add.reduceat`` — no
    per-document hashing or (U, 64) matrices per doc."""
    all_toks: list[str] = []
    doc_of: list[int] = []
    for i, text in enumerate(texts):
        tk = [t for t in (text or "").split(" ") if t]
        all_toks.extend(tk)
        doc_of.extend([i] * len(tk))
    out = np.zeros(len(texts), dtype=np.uint64)
    if not all_toks:
        return out
    codes, vocab = pd.factorize(np.asarray(all_toks, dtype=object))
    h = md5_hash64(vocab)  # (V,)
    signed = (
        ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int8
        )
        * 2
        - 1
    )  # (V, 64) in {-1, +1}
    v = len(vocab)
    key = np.asarray(doc_of, dtype=np.int64) * v + codes
    uk, cnt = np.unique(key, return_counts=True)  # per-(doc, token) counts
    d_id = uk // v
    t_id = (uk % v).astype(np.int64)
    max_doc_len = int(np.bincount(d_id, weights=cnt).max())
    if len(texts) * v <= 1 << 25 and max_doc_len < (1 << 24):
        # dense-matmul fast path: scores = C @ signed via BLAS. float32 is
        # EXACT here — every product is an integer ±cnt < 2^24 and every
        # partial sum is an integer bounded by the doc length, all exactly
        # representable — so the sign test matches the integer path bit
        # for bit (pinned by test_simhash_batch_matches_scalar).
        dense = np.zeros((len(texts), v), dtype=np.float32)
        dense[d_id, t_id] = cnt
        scores = dense @ signed.astype(np.float32)  # (D, 64)
        return (
            (scores > 0).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
    contrib = signed[t_id].astype(np.int32) * cnt[:, None].astype(np.int32)
    starts = np.flatnonzero(np.r_[True, d_id[1:] != d_id[:-1]])
    scores = np.add.reduceat(contrib, starts, axis=0)  # (docs-present, 64)
    vals = (
        (scores > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)
    out[d_id[starts]] = vals
    return out


def simhash(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(id, simhash:int64-bitcast, band0..band3:int64) per doc. Equal simhash
    = near-dup cluster key; equal 16-bit band = Hamming<=3-candidate key."""

    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(
            [t or "" for t in batch.column(text_col).to_pylist()]
        )
        out = pa.table(
            {
                id_col: batch.column(id_col),
                "simhash": pa.array(sh.view(np.int64), type=pa.int64()),
            }
        )
        for b in range(4):
            band = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out = out.append_column(f"band{b}", pa.array(band, type=pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Exact duplicated-span detection (substring-level dedup signal)


#: fixed odd multiplier for the window-gram rolling polynomial (golden
#: ratio; odd => invertible mod 2^64, so single-token edits never collide)
_GRAM_R = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates the polynomial's low bits so
    ``hash % num_buckets`` partitions stay uniform."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _tokenize_batch(texts):
    """Arrow-vectorized whitespace tokenization of a text batch:
    ``(flat tokens pa.StringArray in doc order, token_counts int64 (D,))``
    — same semantics as per-doc ``[t for t in (x or '').split(' ') if t]``
    but one C-level split/flatten/filter pass for the whole batch."""
    if not len(texts):
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    arr = pa.array([x or "" for x in texts], type=pa.string())
    lst = pc.split_pattern(arr, " ")
    flat = pc.list_flatten(lst)
    parent = pc.list_parent_indices(lst)
    mask = pc.not_equal(flat, "")
    flat = flat.filter(mask)
    parent = parent.filter(mask).to_numpy(zero_copy_only=False)
    tcounts = np.bincount(parent, minlength=len(texts)).astype(np.int64)
    return flat, tcounts


def _flatten_windows(texts, width: int):
    """Flatten every doc's width-token windows into 64-bit identities.
    Returns ``(hashes uint64 (G_total,), gram_counts int64 (D,),
    token_counts int64 (D,))``. Docs shorter than ``width`` contribute no
    windows (no short-doc fallback — unlike ``word_shingles``, a span
    must be a full window to count as duplicated text).

    Window identity = splitmix64-finalized fixed-multiplier polynomial
    over the window's token md5 hashes: each token is md5-hashed ONCE per
    batch VOCABULARY (dictionary encode), then every window hash is a
    width-step vectorized rolling combine — no per-window string build,
    no per-gram hashlib call (the round-4 hot-loop fix). The hash is an
    internal equality identity only; the SQL oracles compare the gram
    STRINGS (``array_to_string(arr[i:i+w], ' ')``), which the identity
    reproduces exactly up to 64-bit collisions (~2⁻⁶⁴/pair,
    position-sensitive, single-token edits never collide)."""
    flat, tcounts = _tokenize_batch(texts)
    gcounts = np.maximum(tcounts - width + 1, 0)
    total_g = int(gcounts.sum())
    if total_g == 0:
        return np.empty(0, dtype=np.uint64), gcounts, tcounts
    de = flat.dictionary_encode()
    hv = md5_hash64(de.dictionary.to_pylist())  # once per vocab entry
    ht = hv[de.indices.to_numpy(zero_copy_only=False)]
    toff = np.concatenate(([0], np.cumsum(tcounts)[:-1]))
    goff = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
    starts = (np.repeat(toff, gcounts)
              + np.arange(total_g, dtype=np.int64)
              - np.repeat(goff, gcounts))
    acc = np.zeros(total_g, dtype=np.uint64)
    for k in range(width):
        acc = acc * _GRAM_R + ht[starts + k]
    return _mix64(acc), gcounts, tcounts


def _window_span_agg(d: np.ndarray, p: np.ndarray, n_docs: int, width: int):
    """(doc-index, window-pos) of marked windows, doc-grouped and
    position-sorted -> per-doc (n_marked_windows, covered_tokens). Equal
    window width makes the coverage union closed-form:
    width + sum(min(gap, width)) over consecutive marked positions."""
    n_marked = np.bincount(d, minlength=n_docs).astype(np.int64)
    if d.size:
        first = np.ones(d.size, dtype=bool)
        first[1:] = d[1:] != d[:-1]
        diff = np.empty(d.size, dtype=np.int64)
        diff[0] = 0
        diff[1:] = p[1:] - p[:-1]
        contrib = np.where(first, width, np.minimum(diff, width))
        cover = np.bincount(
            d, weights=contrib, minlength=n_docs
        ).astype(np.int64)
    else:
        cover = np.zeros(n_docs, dtype=np.int64)
    return n_marked, cover


def _window_span_table(ids, tcounts, gcounts, n_marked, cover,
                       *, id_col: str) -> pa.Table:
    frac = cover / np.maximum(tcounts, 1)
    return pa.table({
        id_col: ids,
        "n_tokens": pa.array(tcounts, type=pa.int64()),
        "n_windows": pa.array(gcounts, type=pa.int64()),
        "n_dup_windows": pa.array(n_marked, type=pa.int64()),
        "dup_tokens": pa.array(cover, type=pa.int64()),
        "dup_frac": pa.array(frac, type=pa.float64()),
    })


def _dup_gram_fold(ds, *, text_col: str, width: int, min_docs: int,
                   num_buckets: int, gram_batch_size: int):
    """Pass 1 shared by :func:`duplicated_spans` and
    :func:`remove_duplicated_spans`: distinct (doc, gram-hash) rows per
    batch (one vectorized lexsort — a doc's windows never straddle
    batches since a doc is one row), then grams present in >= min_docs
    docs, counted INSIDE hash buckets (Ray's sort-aggregate walks groups
    in Python at ~1-gram-per-token cardinality; the _gb exchange keys on
    tiny cardinality and each bucket counts with one value_counts).
    Returns the materialized dup-gram Dataset (column ``gh`` int64)."""

    def gram_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h, gcounts, _ = _flatten_windows(texts, width)
        docidx = np.repeat(np.arange(len(texts), dtype=np.int64), gcounts)
        if h.size:
            order = np.lexsort((h, docidx))
            hs, dx = h[order], docidx[order]
            keep = np.ones(hs.size, dtype=bool)
            keep[1:] = (hs[1:] != hs[:-1]) | (dx[1:] != dx[:-1])
            hs = hs[keep]
        else:
            hs = h
        bucket = (hs % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "gh": pa.array(hs.view(np.int64), type=pa.int64()),
            "_gb": pa.array(bucket, type=pa.int32()),
        })

    grams = ds.map_batches(gram_rows, batch_format="pyarrow",
                           batch_size=gram_batch_size)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["gh"].value_counts()
        return pd.DataFrame({"gh": vc.index[vc >= min_docs].to_numpy()})

    return grams.groupby("_gb").map_groups(
        count_bucket, batch_format="pandas"
    ).materialize()


def remove_duplicated_spans(ds, *, text_col: str = "text",
                            id_col: str = "doc_id", width: int = 8,
                            min_docs: int = 2, distribute: str = "auto",
                            broadcast_limit: int = 2_000_000,
                            num_buckets: int = 32,
                            gram_batch_size: int = 2048):
    """APPLY exact-substring dedup — the removal half of
    :func:`duplicated_spans` (arXiv:2107.06499's dedup step, not just its
    signal): every token covered by a duplicated ``width``-window (the
    same >= ``min_docs``-distinct-docs gram contract) is REMOVED from
    every document and the survivors re-join in original order. Output
    one row per doc: ``(id, n_tokens, n_removed, clean_text)`` with
    ``n_removed`` exactly ``duplicated_spans``' ``dup_tokens`` (the
    overlap-merged coverage union) and ``clean_text = ''`` when a doc is
    entirely duplicated text.

    Divergence from the paper, by design: ALL occurrences of a
    duplicated span go (the C4 discipline at span granularity — symmetric
    and order-free, so the op needs no global occurrence ranking);
    keep-one-copy semantics live at line granularity in
    :func:`line_dedup`.

    Scale shape: pass 1 is the shared dup-gram fold; pass 2 either
    broadcasts the sorted dup-hash array (``ray.put`` once, searchsorted
    + an interval-delta cumsum marks covered tokens — no per-window
    Python) or, above ``broadcast_limit``, semi-joins the (gh, id, wpos)
    stream against the dup table gh-bucketed and re-applies id-bucketed
    (text crosses once; nothing dup-set-sized touches the driver).
    """
    import pyarrow.compute as pc

    if distribute not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown distribute={distribute!r}")

    dup_ds = _dup_gram_fold(
        ds, text_col=text_col, width=width, min_docs=min_docs,
        num_buckets=num_buckets, gram_batch_size=gram_batch_size)
    n_dup = dup_ds.count()
    use_broadcast = (distribute == "broadcast") or (
        distribute == "auto" and n_dup <= broadcast_limit)

    def _rebuild(texts, ids_arr, marked_dx, marked_wpos):
        """Shared rebuild: marked window starts (doc-idx, token-pos) ->
        kept-token reassembly via one interval-delta cumsum."""
        flat_pa, tcounts = _tokenize_batch(texts)
        tstart = np.concatenate(([0], np.cumsum(tcounts)[:-1]))
        total = int(tcounts.sum())
        delta = np.zeros(total + 1, dtype=np.int64)
        if len(marked_dx):
            fs = tstart[marked_dx] + marked_wpos
            np.add.at(delta, fs, 1)
            np.add.at(delta, fs + width, -1)
        covered = np.cumsum(delta[:total]) > 0
        flat = flat_pa.to_numpy(zero_copy_only=False)
        parent = np.repeat(
            np.arange(len(texts), dtype=np.int64), tcounts)
        keepm = ~covered
        kept_counts = np.bincount(parent[keepm], minlength=len(texts))
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        kept_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(flat[keepm], type=pa.string()))
        n_removed = np.bincount(
            parent[covered], minlength=len(texts)).astype(np.int64)
        return pa.table({
            id_col: ids_arr,
            "n_tokens": pa.array(tcounts, type=pa.int64()),
            "n_removed": pa.array(n_removed, type=pa.int64()),
            "clean_text": pc.binary_join(kept_list, " "),
        })

    if use_broadcast:
        arr = (np.sort(dup_ds.to_pandas()["gh"].to_numpy()
                       .view(np.uint64))
               if n_dup else np.empty(0, dtype=np.uint64))
        ref = ray.put(arr)

        def clean(batch: pa.Table) -> pa.Table:
            dup = ray.get(ref)
            texts = batch.column(text_col).to_pylist()
            h, gcounts, _ = _flatten_windows(texts, width)
            dx = np.repeat(
                np.arange(len(texts), dtype=np.int64), gcounts)
            gs = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
            wpos = (np.arange(h.size, dtype=np.int64)
                    - np.repeat(gs, gcounts))
            if dup.size and h.size:
                idx = np.minimum(np.searchsorted(dup, h), dup.size - 1)
                mask = dup[idx] == h
            else:
                mask = np.zeros(h.size, dtype=bool)
            return _rebuild(texts, batch.column(id_col),
                            dx[mask], wpos[mask])

        return ds.map_batches(clean, batch_format="pyarrow")

    # join path: (gh, id, wpos) semi-join the dup table, re-apply
    # id-bucketed — text crosses once, the dup set never leaves the
    # cluster
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_map_groups,
    )

    def gram_pos_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h, gcounts, _ = _flatten_windows(texts, width)
        gs = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
        wpos = (np.arange(h.size, dtype=np.int64)
                - np.repeat(gs, gcounts))
        ids = batch.column(id_col).take(
            pa.array(np.repeat(np.arange(len(texts), dtype=np.int64),
                               gcounts)))
        return pa.table({
            "gh": pa.array(h.view(np.int64), type=pa.int64()),
            "__id": ids,
            "wpos": pa.array(wpos, type=pa.int64()),
        })

    marked = bucket_join(
        ds.map_batches(gram_pos_rows, batch_format="pyarrow"),
        dup_ds.map_batches(
            lambda t: t.select(["gh"]).rename_columns(["gh_r"]),
            batch_format="pyarrow"),
        left_key="gh", right_key="gh_r", how="semi",
        num_buckets=num_buckets,
    ).map_batches(lambda t: t.select(["__id", "wpos"]),
                  batch_format="pyarrow")

    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table({
            "__id": t.column(id_col),
            "wpos": pa.array([-1] * len(t), type=pa.int64()),
            "text": t.column(text_col),
        })

    def tag_marks(t: pa.Table) -> pa.Table:
        return t.append_column(
            "text", pa.array([None] * len(t), type=pa.string()))

    unioned = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        marked.map_batches(tag_marks, batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["wpos"] < 0]
        marks = df[df["wpos"] >= 0]
        texts = docs["text"].tolist()
        idx_of = {v: i for i, v in enumerate(docs["__id"].tolist())}
        mdx = np.array([idx_of[v] for v in marks["__id"]],
                       dtype=np.int64)
        out = _rebuild(
            texts, pa.array(docs["__id"].to_numpy()),
            mdx, marks["wpos"].to_numpy(dtype=np.int64))
        return out.rename_columns(
            [id_col, "n_tokens", "n_removed", "clean_text"]).to_pandas()

    return bucketed_map_groups(unioned, "__id", per_bucket,
                               num_buckets=num_buckets)


def mark_windows_against(batch: pa.Table, sorted_hashes: np.ndarray, *,
                         text_col: str, id_col: str,
                         width: int) -> pa.Table:
    """Mark every width-token window of each doc whose gram hash is in
    ``sorted_hashes`` (sorted uint64) and fold to per-doc span coverage —
    the broadcast-membership kernel shared by ``duplicated_spans`` and
    n-gram decontamination (``curate.ngram_decontaminate``)."""
    texts = batch.column(text_col).to_pylist()
    h, gcounts, tcounts = _flatten_windows(texts, width)
    dx = np.repeat(np.arange(len(texts), dtype=np.int64), gcounts)
    starts = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
    pos = np.arange(h.size, dtype=np.int64) - np.repeat(starts, gcounts)
    if sorted_hashes.size and h.size:
        idx = np.minimum(
            np.searchsorted(sorted_hashes, h), sorted_hashes.size - 1
        )
        mask = sorted_hashes[idx] == h
    else:
        mask = np.zeros(h.size, dtype=bool)
    n_marked, cover = _window_span_agg(dx[mask], pos[mask], len(texts),
                                       width)
    return _window_span_table(batch.column(id_col), tcounts, gcounts,
                              n_marked, cover, id_col=id_col)


def duplicated_spans(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     width: int = 8, min_docs: int = 2,
                     distribute: str = "auto",
                     broadcast_limit: int = 2_000_000,
                     num_buckets: int = 32,
                     gram_batch_size: int = 2048):
    """Exact duplicated-window detection — the substring-level complement to
    doc-level fuzzy dedup (the signal behind exact-substring training-data
    dedup, arXiv:2107.06499): a window of ``width`` consecutive tokens is
    *duplicated* when the identical token sequence occurs in at least
    ``min_docs`` distinct documents.

    Per-doc output: ``(id, n_tokens, n_windows, n_dup_windows, dup_tokens,
    dup_frac)`` where ``dup_tokens`` is the size of the union of all
    duplicated windows' token positions (overlaps merged) and ``dup_frac``
    = dup_tokens / n_tokens. Filtering/trimming policy is the caller's.

    Two passes over the corpus:
      1. distinct (doc, gram-hash) rows per batch (one vectorized lexsort —
         a doc's windows never straddle batches since a doc is one row) →
         ``groupby(gh).count()`` (map-side combined) → grams present in
         >= min_docs docs.
      2. re-hash windows with positions and mark members of the dup set:
         - ``distribute='broadcast'``: the dup hash set is ``ray.put`` ONCE
           as a sorted uint64 array and membership is a searchsorted per
           batch — no shuffle. Chosen by 'auto' when the dup table has
           <= broadcast_limit entries.
         - ``distribute='join'``: (gh, id, pos) rows semi-``bucket_join``
           the dup table on gh, then one bucketed per-doc pass — nothing is
           driver-materialized, the scale path when duplication is rampant.
    Coverage union is computed without per-doc Python: windows are equal
    width, so union size = width + sum(min(gap, width)) over consecutive
    duplicated positions, evaluated with one segmented pass per batch.

    Gram hashes are 64-bit (md5 low bytes — DuckDB-replayable); at corpus
    scale (~2^32+ distinct grams) birthday collisions can over-mark a
    window at ~1e-9 rates, acceptable for a dedup *signal*.
    """
    import pyarrow.compute as pc

    if distribute not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown distribute={distribute!r}")

    dup_ds = _dup_gram_fold(
        ds, text_col=text_col, width=width, min_docs=min_docs,
        num_buckets=num_buckets, gram_batch_size=gram_batch_size)
    n_dup = dup_ds.count()

    def _agg_masked(d: np.ndarray, p: np.ndarray, n_docs: int):
        return _window_span_agg(d, p, n_docs, width)

    def _finish(ids, tcounts, gcounts, n_dup_w, cover) -> pa.Table:
        return _window_span_table(ids, tcounts, gcounts, n_dup_w, cover,
                                  id_col=id_col)

    use_broadcast = (distribute == "broadcast") or (
        distribute == "auto" and n_dup <= broadcast_limit
    )

    if use_broadcast:
        if n_dup:
            arr = np.sort(
                dup_ds.to_pandas()["gh"].to_numpy().view(np.uint64)
            )
        else:
            arr = np.empty(0, dtype=np.uint64)
        ref = ray.put(arr)

        def mark(batch: pa.Table) -> pa.Table:
            return mark_windows_against(
                batch, ray.get(ref), text_col=text_col, id_col=id_col,
                width=width,
            )

        return ds.map_batches(mark, batch_format="pyarrow")

    # join path: nothing dup-set-sized touches the driver.
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join, bucketed_map_groups,
    )

    def base_stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        _, gcounts, tcounts = _flatten_windows(texts, width)
        z = np.zeros(len(texts), dtype=np.int64)
        return _finish(batch.column(id_col), tcounts, gcounts, z, z) \
            .select([id_col, "n_tokens", "n_windows"])

    base = ds.map_batches(base_stats, batch_format="pyarrow")
    if n_dup == 0:
        def pad_zero(t: pa.Table) -> pa.Table:
            z = np.zeros(len(t), dtype=np.int64)
            return _finish(t.column(id_col), t.column("n_tokens").to_numpy(),
                           t.column("n_windows").to_numpy(), z, z)
        return base.map_batches(pad_zero, batch_format="pyarrow")

    def long_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h, gcounts, _ = _flatten_windows(texts, width)
        starts = np.concatenate(([0], np.cumsum(gcounts)[:-1]))
        pos = np.arange(h.size, dtype=np.int64) - np.repeat(starts, gcounts)
        ids = batch.column(id_col).take(
            pa.array(np.repeat(np.arange(len(texts)), gcounts))
        )
        return pa.table({
            "gh": pa.array(h.view(np.int64), type=pa.int64()),
            id_col: ids,
            "pos": pa.array(pos, type=pa.int64()),
        })

    long = ds.map_batches(long_rows, batch_format="pyarrow",
                          batch_size=gram_batch_size)
    hits = bucket_join(long, dup_ds, left_key="gh", right_key="gh",
                       how="semi", num_buckets=num_buckets)

    def agg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        codes, uniques = pd.factorize(df[id_col], sort=False)
        n_dup_w, cover = _agg_masked(
            codes.astype(np.int64), df["pos"].to_numpy(), len(uniques)
        )
        return pd.DataFrame({
            id_col: uniques,
            "n_dup_windows": n_dup_w,
            "dup_tokens": cover,
        })

    agg = bucketed_map_groups(hits, id_col, agg_bucket,
                              num_buckets=num_buckets)
    joined = bucket_join(base, agg, left_key=id_col, right_key=id_col,
                         how="left", num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        # an all-unmatched bucket yields null-typed columns: cast first
        ndw = pc.fill_null(pc.cast(t.column("n_dup_windows"), pa.int64()), 0)
        cov = pc.fill_null(pc.cast(t.column("dup_tokens"), pa.int64()), 0)
        nt = t.column("n_tokens").to_numpy()
        cov_np = cov.combine_chunks().to_numpy()
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": t.column("n_tokens"),
            "n_windows": t.column("n_windows"),
            "n_dup_windows": ndw,
            "dup_tokens": cov,
            "dup_frac": pa.array(cov_np / np.maximum(nt, 1),
                                 type=pa.float64()),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Corpus-wide line-level dedup (C4-style)
# ---------------------------------------------------------------------------

def _line_explode(batch: pa.Table, *, text_col: str, key_cols,
                  with_text: bool) -> pa.Table:
    """(keys…, text) batch -> one row per line.

    Vectorized: one split + flatten per batch; line identity is a 128-bit
    pair of independent siphash-64s (``h1``, ``h2``) so NO line text has to
    cross an exchange (the same corpus-scale collision argument as
    ``exact_dedup``'s md5 grouping). Null text is treated as '' (one empty
    line), matching the engine-wide null-hashes-as-empty-text convention.
    """
    import pyarrow.compute as pc

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lists = pc.split_pattern(text.cast(pa.string()).fill_null(""),
                             pattern="\n")
    lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
    parent = np.repeat(np.arange(len(batch)), lens)
    offsets = np.cumsum(lens) - lens
    flat = pc.list_flatten(lists)
    idx = np.arange(len(flat)) - np.repeat(offsets, lens)

    out = batch.select(list(key_cols)).take(pa.array(parent))
    out = out.append_column("line_idx", pa.array(idx, type=pa.int64()))
    if with_text:
        out = out.append_column("line", flat)
    else:
        vals = flat.to_numpy(zero_copy_only=False)
        out = out.append_column(
            "h1", pa.array(stable_hash64(vals), type=pa.uint64()))
        out = out.append_column(
            "h2", pa.array(stable_hash64(vals, seed="graft-l2"),
                           type=pa.uint64()))
    return out


def _reassemble_lines(lines_df: pd.DataFrame, key_cols) -> pd.DataFrame:
    """Per-line frame (keys…, line_idx, line, keep) -> per-page
    (keys…, n_lines, n_kept, clean_text); kept lines joined in line order."""
    keys = list(key_cols)
    df = lines_df.sort_values(keys + ["line_idx"], kind="mergesort")
    stats = (
        df.groupby(keys, sort=False, as_index=False)
        .agg(n_lines=("line_idx", "size"), n_kept=("keep", "sum"))
    )
    kept = df[df["keep"]]
    joined = (
        kept.groupby(keys, sort=False)["line"]
        .agg("\n".join)
        .rename("clean_text")
        .reset_index()
    )
    out = stats.merge(joined, on=keys, how="left")
    out["clean_text"] = out["clean_text"].fillna("")
    out["n_lines"] = out["n_lines"].astype("int64")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out


def line_dedup(pages, *, text_col: str = "text",
               key_cols=("url", "warc_ts"),
               method: str = "auto", broadcast_limit: int = 2_000_000,
               num_buckets: int = 64):
    """C4-style corpus-wide line dedup: every distinct line keeps exactly its
    globally-FIRST occurrence (ordered by ``key_cols + line_idx``); later
    occurrences are dropped. Returns one row per input page:
    ``(keys…, n_lines, n_kept, clean_text)`` where clean_text is the kept
    lines re-joined in original order ('' when every line lost).

    Scale shape — line TEXT never enters the dedup exchange:
      1. explode to (keys, line_idx, h1, h2) — two independent 64-bit
         siphashes = a 128-bit line identity (16 bytes/line moves, not the
         line);
      2. one hash-bucket exchange on h1; inside a bucket every occurrence of
         a line is present, so the non-first rows fall out of a vectorized
         sort + duplicated() — the emitted DROP set (keys, line_idx) is
         proportional to the corpus duplication rate, not its size;
      3. drops re-apply to the source pages either by BROADCAST (drop set
         fits a worker: zero further shuffle — lines of one page never leave
         their batch) or by a tagged union co-bucketed on the page key
         (text moves exactly once). ``method='auto'`` picks by drop count
         against ``broadcast_limit``.

    Reference analog: none (the reference dedups nothing); this is the
    C4/Gopher "discard duplicated lines across documents" curation op, a
    structural level between exact_dedup (whole doc) and duplicated_spans
    (token windows).
    """
    import functools

    from htrc_feature_reader_ray.stages.partition import (
        add_bucket_column,
        bucketed_map_groups,
    )

    keys = list(key_cols)
    explode_keys = functools.partial(
        _line_explode, text_col=text_col, key_cols=keys, with_text=False)
    explode_text = functools.partial(
        _line_explode, text_col=text_col, key_cols=keys, with_text=True)

    def mark_drops(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h1", "h2"] + keys + ["line_idx"],
                            kind="mergesort")
        dup = df.duplicated(subset=["h1", "h2"])
        return df.loc[dup, keys + ["line_idx"]]

    # SKEW GUARD: a batch-local non-first occurrence of a line is a
    # GLOBAL non-first (a smaller sort key exists in the same batch), so
    # it can be emitted as a drop WITHOUT crossing the exchange; only
    # each batch's per-line MINIMUM goes to the h1 bucket. A hot line
    # (30% of all corpus lines being one boilerplate string) then
    # contributes one exchange row per batch, not 30% of all rows
    # landing in a single bucket.
    def split_local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h1", "h2"] + keys + ["line_idx"],
                            kind="mergesort")
        df = df.copy()
        df["__ldup"] = df.duplicated(subset=["h1", "h2"]).to_numpy()
        return df

    exploded = pages.map_batches(
        explode_keys, batch_format="pyarrow").map_batches(
        split_local, batch_format="pandas").materialize()

    import pyarrow.compute as pc

    def only_flag(flag: bool, cols):
        def f(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("__ldup"), flag)
            return t.filter(m).select(cols)
        return f

    local_drops = exploded.map_batches(
        only_flag(True, keys + ["line_idx"]), batch_format="pyarrow")
    mins = exploded.map_batches(
        only_flag(False, keys + ["line_idx", "h1", "h2"]),
        batch_format="pyarrow")
    global_drops = bucketed_map_groups(
        mins, "h1", mark_drops, num_buckets=num_buckets)
    drops = global_drops.union(local_drops).materialize()

    if method == "auto":
        method = ("broadcast" if drops.count() <= broadcast_limit
                  else "exchange")

    if method == "broadcast":
        drops_df = drops.to_pandas()
        if len(drops_df) == 0:
            drops_df = pd.DataFrame(
                {**{k: pd.Series(dtype="object") for k in keys},
                 "line_idx": pd.Series(dtype="int64")})
        ref = ray.put(drops_df)

        def clean(batch: pa.Table) -> pd.DataFrame:
            lines = explode_text(batch).to_pandas()
            d = ray.get(ref)
            if len(d):
                m = lines.merge(d, on=keys + ["line_idx"], how="left",
                                indicator=True)
                lines["keep"] = (m["_merge"] == "left_only").to_numpy()
            else:
                lines["keep"] = True
            return _reassemble_lines(lines, keys)

        return pages.map_batches(clean, batch_format="pyarrow")

    # exchange path: lines (with text) and drop keys co-bucketed on the
    # page key; one tagged union, one exchange, per-bucket anti-merge
    lines_ds = pages.map_batches(explode_text, batch_format="pyarrow")

    def tag(is_drop: bool):
        def fn(t: pa.Table) -> pa.Table:
            if is_drop:
                t = t.append_column(
                    "line", pa.array([None] * len(t), type=pa.string()))
            return t.append_column(
                "__drop", pa.array([is_drop] * len(t), type=pa.bool_()))
        return fn

    unioned = lines_ds.map_batches(tag(False), batch_format="pyarrow").union(
        drops.map_batches(tag(True), batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["__drop"]][keys + ["line_idx"]]
        lines = df[~df["__drop"]].drop(columns=["__drop"])
        if len(d):
            m = lines.merge(d, on=keys + ["line_idx"], how="left",
                            indicator=True)
            lines = lines.copy()
            lines["keep"] = (m["_merge"] == "left_only").to_numpy()
        else:
            lines = lines.copy()
            lines["keep"] = True
        return _reassemble_lines(lines, keys)

    return bucketed_map_groups(unioned, keys[0], per_bucket,
                               num_buckets=num_buckets)


def _host_from_url(urls: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pc.utf8_lower(pc.extract_regex(
        urls.cast(pa.string()), r"^[a-z]+://(?P<h>[^/]+)").field("h"))


def boilerplate_lines(pages, *, text_col: str = "text",
                      url_col: str = "url", key_cols=("url", "warc_ts"),
                      min_pages: int = 2, method: str = "auto",
                      broadcast_limit: int = 2_000_000,
                      num_buckets: int = 64):
    """Host-scoped boilerplate removal: a line appearing on ``min_pages``+
    DISTINCT urls of the same host (nav bars, cookie banners, footers) is
    stripped from every page of that host. Returns one row per page:
    ``(keys…, n_lines, n_kept, clean_text)`` — the host-level complement of
    corpus-wide ``line_dedup`` (C4 drops later duplicates anywhere;
    boilerplate is site template text, so ALL occurrences go).

    Scale shape: the count pass moves (host, h1, h2, url)-distinct rows —
    16-byte line identities, never line text — through one h1-bucketed
    exchange; the boilerplate set it emits is template-sized. Re-apply is
    either BROADCAST (set fits a worker: zero further shuffle, a page's
    lines never leave their batch) or one HOST-bucketed tagged union
    (text moves once; anti-merge + page reassembly happen inside the same
    bucket because a url's host is a function of the url).
    """
    import functools

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    keys = list(key_cols)
    # host rides through the explode as an extra key column
    explode_keys = functools.partial(
        _line_explode, text_col=text_col, key_cols=keys + ["host"],
        with_text=False)
    explode_text = functools.partial(
        _line_explode, text_col=text_col, key_cols=keys + ["host"],
        with_text=True)

    def with_host(batch: pa.Table) -> pa.Table:
        return batch.append_column("host", _host_from_url(
            batch.column(url_col)))

    def distinct_line_urls(batch: pa.Table) -> pa.Table:
        t = explode_keys(with_host(batch))
        return t.select(["host", "h1", "h2", url_col]).group_by(
            ["host", "h1", "h2", url_col]).aggregate([])

    def boiler_fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["host", "h1", "h2", url_col])
        g = (
            d.groupby(["host", "h1", "h2"], sort=False, as_index=False)
            .agg(n_urls=(url_col, "size"))
        )
        return g.loc[g["n_urls"] >= min_pages, ["host", "h1", "h2"]]

    boiler = bucketed_map_groups(
        pages.map_batches(distinct_line_urls, batch_format="pyarrow"),
        "h1", boiler_fold, num_buckets=num_buckets,
    ).materialize()

    def lines_with_hashes(batch: pa.Table) -> pd.DataFrame:
        t = explode_text(with_host(batch))
        df = t.to_pandas()
        vals = t.column("line").to_numpy(zero_copy_only=False)
        df["h1"] = stable_hash64(vals)
        df["h2"] = stable_hash64(vals, seed="graft-l2")
        return df

    if method == "auto":
        method = ("broadcast" if boiler.count() <= broadcast_limit
                  else "exchange")

    if method == "broadcast":
        boiler_df = boiler.to_pandas()
        ref = ray.put(boiler_df)

        def clean(batch: pa.Table) -> pd.DataFrame:
            lines = lines_with_hashes(batch)
            b = ray.get(ref)
            if len(b):
                m = lines.merge(b, on=["host", "h1", "h2"], how="left",
                                indicator=True)
                lines["keep"] = (m["_merge"] == "left_only").to_numpy()
            else:
                lines["keep"] = True
            return _reassemble_lines(lines, keys)

        return pages.map_batches(clean, batch_format="pyarrow")

    # exchange path: mark-by-join on the (host, h1, h2) composite key, then
    # a url-bucketed reassembly — two exchanges, line text moves twice; the
    # broadcast path above is the normal case (boilerplate sets are
    # template-sized), this is the unbounded-set fallback
    from htrc_feature_reader_ray.stages.partition import bucket_join

    def _bk(host, h1, h2):
        return (host.astype(str) + "|" + h1.astype(str)
                + "|" + h2.astype(str))

    def lines_keyed(batch: pa.Table) -> pd.DataFrame:
        df = lines_with_hashes(batch)
        df["bk"] = _bk(df["host"], df["h1"], df["h2"])
        return df[keys + ["line_idx", "line", "bk"]]

    def boiler_keyed(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"bk_r": _bk(df["host"], df["h1"], df["h2"])})
        out["__boiler"] = np.int8(1)
        return out

    lines_ds = pages.map_batches(lines_keyed, batch_format="pyarrow")
    boiler_ds = boiler.map_batches(boiler_keyed, batch_format="pandas")
    marked = bucket_join(lines_ds, boiler_ds, left_key="bk",
                         right_key="bk_r", how="left",
                         num_buckets=num_buckets)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["keep"] = df["__boiler"].isna()
        return df[keys + ["line_idx", "line", "keep"]]

    flagged = marked.map_batches(flag, batch_format="pandas")
    return bucketed_map_groups(
        flagged, url_col, lambda df: _reassemble_lines(df, keys),
        num_buckets=num_buckets,
    )


def host_dup_rate(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  host_col: str = "host", num_buckets: int = 32):
    """Per-host exact-duplicate rate — the crawl-QA rollup that flags
    template farms and parked domains: ``(host, n_docs, n_dup_losers,
    dup_ppm)`` where a doc is a LOSER if another doc with the same
    normalized-text digest has a smaller id (the keep-first rule
    ``exact_dedup`` applies).

    Two text-free exchanges: digests+hosts cross a digest-bucketed pass
    that marks losers vectorized (sort + duplicated per bucket) and
    collapses to (host, n, losers) partials BEFORE the second,
    host-bucketed sum — so a megasite's pages never pile into one task."""
    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            host_col: batch.column(host_col),
            "text_md5": text_md5_batch(batch, text_col),
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            batch_size=8192)

    def mark_and_collapse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_md5", id_col], kind="mergesort")
        loser = df.duplicated("text_md5", keep="first").to_numpy()
        out = pd.DataFrame({
            host_col: df[host_col].to_numpy(),
            "n_docs": np.ones(len(df), dtype=np.int64),
            "n_dup_losers": loser.astype(np.int64),
        })
        return out.groupby(host_col, sort=False, as_index=False).sum()

    partials = bucketed_map_groups(
        hashed, "text_md5", mark_and_collapse, num_buckets=num_buckets,
    )
    agg = bucketed_aggregate(
        partials, host_col,
        {"n_docs": ("n_docs", "sum"), "n_dup_losers": ("n_dup_losers", "sum")},
        num_buckets=max(8, num_buckets // 4),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_ppm"] = (
            df["n_dup_losers"].to_numpy(dtype=np.int64) * 1_000_000
        ) // df["n_docs"].to_numpy(dtype=np.int64)
        return df

    return agg.map_batches(finish, batch_format="pandas")


def host_dup_rate_sql(*, host_expr: str, text: str = "text",
                      id_col: str = "doc_id",
                      table: str = "documents") -> str:
    """SQL mirror of :func:`host_dup_rate` (same normalized-md5 digest as
    FINGERPRINT_SQL / exact_dedup, same keep-first-by-id rule)."""
    d = f"md5(lower(regexp_replace({text}, '\\s+', ' ', 'g')))"
    return f"""
        WITH l AS (
          SELECT {host_expr} AS host,
                 CASE WHEN row_number() OVER (
                     PARTITION BY {d} ORDER BY {id_col}) > 1
                 THEN 1 ELSE 0 END AS loser
          FROM {table}
        )
        SELECT host, count(*)::BIGINT AS n_docs,
               sum(loser)::BIGINT AS n_dup_losers,
               (sum(loser) * 1000000 // count(*))::BIGINT AS dup_ppm
        FROM l GROUP BY 1"""


def _shingle_rows(batch: pa.Table, text_col: str, id_col: str,
                  k: int) -> pa.Table:
    """Distinct (shingle, id) rows for one batch (``word_shingles``
    semantics incl. the short-doc whole-text fallback; a doc lives in one
    row, so per-batch distinct == global distinct)."""
    grams, didx = _shingle_batch(
        batch.column(text_col).to_pylist(), k)
    return pa.table({
        "shingle": grams,
        id_col: batch.column(id_col).cast(pa.int64()).take(pa.array(didx)),
    })


def containment_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, min_containment: float = 0.8,
                      max_docs_per_shingle: int = 64,
                      sizes_path: str = "join", num_buckets: int = 32):
    """Asymmetric near-dup detection — the doc-INSIDE-doc case Jaccard
    misses (a page quoted wholesale inside a bigger page has low Jaccard
    but containment ~1): pairs with ``n_shared / min(|A|, |B|) >=
    min_containment`` over distinct k-word shingles.

    Scale shape: the generic co-occurrence kernel
    (``partition.shared_key_pair_counts`` — shared with mirror_hosts /
    related_pages) mines (doc_a, doc_b, n_shared) with ONE shingle-bucketed
    exchange; ``max_docs_per_shingle`` caps boilerplate shingles (part of
    the contract, mirrored by the oracle — intersections count only capped
    shingles, denominators are the UNCAPPED per-doc sizes). Sizes attach
    via two ``bucket_join`` passes (``sizes_path='join'``, default — pair
    volume only) or a driver broadcast (``'broadcast'`` — only when the
    (id, size) table fits a worker); both paths are pinned equal by tests.
    """
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        shared_key_pair_counts,
    )

    rows = ds.map_batches(
        lambda b: _shingle_rows(b, text_col, id_col, k),
        batch_format="pyarrow", batch_size=4096,
    )
    pairs = shared_key_pair_counts(
        rows, key_col="shingle", member_col=id_col,
        max_members_per_key=max_docs_per_shingle, num_buckets=num_buckets,
        out_a="doc_a", out_b="doc_b", out_n="n_shared",
    )

    def size_rows(batch: pa.Table) -> pa.Table:
        t = batch.group_by(id_col).aggregate([([], "count_all")])
        return t.rename_columns([id_col, "n_sh"])

    sizes = rows.map_batches(size_rows, batch_format="pyarrow")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = df["n_shared"].to_numpy(dtype=np.int64) / np.minimum(
            df["n_a"].to_numpy(dtype=np.int64),
            df["n_b"].to_numpy(dtype=np.int64))
        df = df.assign(containment=c)
        df = df.loc[df["containment"] >= min_containment]
        return df[["doc_a", "doc_b", "n_shared", "containment"]]

    if sizes_path == "broadcast":
        import ray

        sz = sizes.to_pandas().set_index(id_col)["n_sh"]
        ref = ray.put(sz)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            s = ray.get(ref)
            df = df.assign(
                n_a=s.loc[df["doc_a"]].to_numpy(dtype=np.int64),
                n_b=s.loc[df["doc_b"]].to_numpy(dtype=np.int64))
            return score(df)

        return pairs.map_batches(attach, batch_format="pandas")

    j1 = bucket_join(
        pairs,
        sizes.map_batches(lambda t: t.rename_columns([id_col, "n_a"]),
                          batch_format="pyarrow"),
        left_key="doc_a", right_key=id_col, num_buckets=num_buckets)
    j2 = bucket_join(
        j1,
        sizes.map_batches(lambda t: t.rename_columns([id_col, "n_b"]),
                          batch_format="pyarrow"),
        left_key="doc_b", right_key=id_col, num_buckets=num_buckets)
    return j2.map_batches(score, batch_format="pandas")


def semdedup_pairs(ds, *, cluster_col: str = "label",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   threshold: float = 0.95, num_buckets: int = 16):
    """SemDeDup-shaped semantic near-dup mining (Abbas et al. 2023,
    arXiv:2303.09540): near-duplicate pairs are searched WITHIN clusters
    only — the cluster column is the co-partitioning key (k-means cell,
    LSH bucket, or any upstream assignment), so the all-pairs kernel runs
    per cell instead of per corpus. Emits ``(cluster, id_a, id_b)`` with
    cosine ≥ threshold, ids ascending.

    Scale shape: ONE cluster-bucketed exchange; per cluster a normalized
    matmul + upper-triangle threshold (vectorized; the per-cluster loop is
    over clusters in the bucket, never rows). Cell sizes bound the
    quadratic term — the documented contract of the SemDeDup recipe.
    Threshold comparisons are float64 on both engines; the oracle-parity
    caveat of `embedding_dedup_pairs` (thresholds not adversarially close
    to a pair's cosine) applies unchanged."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lab, g in df.groupby(cluster_col, sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(id_col, kind="mergesort")
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
            norms[norms == 0] = 1.0
            sims = (m / norms) @ (m / norms).T
            iu = np.triu_indices(len(g), k=1)
            hit = sims[iu] >= threshold
            ids = g[id_col].to_numpy()
            out.append(pd.DataFrame({
                cluster_col: np.repeat(lab, int(hit.sum())),
                "id_a": ids[iu[0][hit]],
                "id_b": ids[iu[1][hit]],
            }))
        if not out:
            return pd.DataFrame({
                cluster_col: pd.Series([], dtype=df[cluster_col].dtype),
                "id_a": pd.Series([], dtype=df[id_col].dtype),
                "id_b": pd.Series([], dtype=df[id_col].dtype),
            })
        return pd.concat(out, ignore_index=True)

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    return bucketed_map_groups(ds, cluster_col, per_bucket,
                               num_buckets=num_buckets)


def semdedup_pairs_sql(*, table: str = "embeddings",
                       cluster_col: str = "label", id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       threshold: float = 0.95) -> str:
    """SQL mirror: equi-join on the cluster, double-precision cosine."""
    return f"""
        SELECT a.{cluster_col}, a.{id_col} AS id_a, b.{id_col} AS id_b
        FROM {table} a JOIN {table} b
          ON a.{cluster_col} = b.{cluster_col}
         AND a.{id_col} < b.{id_col}
        WHERE list_cosine_similarity(a.{vec_col}::DOUBLE[],
                                     b.{vec_col}::DOUBLE[]) >= {threshold}"""


# ---------------------------------------------------------------------------
# exact set-similarity join (prefix filtering, Vernica et al. SIGMOD'10)


def jaccard_join(ds, *, id_col: str = "doc_id", text_col: str = "text",
                 k_shingle: int = 3, threshold_ppm: int = 500_000,
                 num_buckets: int = 32, verify_grid: int = 8,
                 df_mode: str = "auto",
                 df_broadcast_limit: int = 2_000_000,
                 cross_col: str | None = None):
    """EXACT all-pairs set-similarity join: every doc pair whose distinct
    ``k_shingle``-gram Jaccard is ≥ ``threshold_ppm/10⁶`` — no sketch, no
    recall loss.  The quadratic candidate space is cut by LOSSLESS prefix
    filtering (the MapReduce set-similarity join of Vernica/Carey/Li,
    SIGMOD'10): order every doc's shingles by ascending corpus frequency,
    keep only the first ``n − ceil(t·n) + 1`` as its PREFIX; two docs can
    reach the threshold only if their prefixes share a shingle (standard
    prefix-filter lemma, any consistent global order) — so candidates are
    mined from rare shingles only and then verified exactly.

    Plan (each stage a bounded exchange):
      1. per-batch distinct (doc, shingle) explode          [no exchange]
      2. shingle document-frequency fold                    [g-bucketed]
      3. df attach                                          [g-bucket join]
      4. per-doc payloads                                   [doc-bucketed]
         — each doc's DISTINCT shingles are md5-128-digested ONCE (per
         frame VOCABULARY, not per occurrence) into two fixed-width
         binary blobs: its PREFIX upper-64 hashes in (df, g) order and
         its full (hi, lo) set sorted numerically.  After this stage no
         shingle STRING ever crosses an exchange again (the text-free
         exchange contract of ``table_diff``/``line_dedup``); set
         equality is md5-128 (collision-free absent adversarial inputs,
         the same documented contract as ``table_diff``).
         MATERIALIZED once: three consumers below (prefix explode +
         both verify joins); re-deriving the tokenized corpus thrice
         would cost more than the checkpoint
      5. prefix explode → candidate pairs (pair kernel) on the UPPER-64
         hash as the join key — a 64-bit collision only ever ADDS a
         candidate (verified away below), so mining stays lossless while
         the exchange carries 8-byte ints instead of shingle strings
                                                            [g-bucketed]
      6. exact verify in a RENDEZVOUS GRID: candidate (a,b) goes to one
         (bucket(a), bucket(b)) cell as three ints; payloads replicate to
         their G cells — blob exchange volume is G·|payloads| instead of
         one blob copy PER CANDIDATE (wins whenever G < the per-doc
         candidate fan-out).  In-cell: pairs failing the LENGTH filter
         ``min(n_a,n_b)·10⁶ ≥ t_ppm·max(n_a,n_b)`` are dropped before any
         set work (J = i/(n_a+n_b−i) ≤ min/max since i ≤ min — pure
         arithmetic, zero recall loss); survivors' (hi, lo) blobs are
         intersected by one concatenated (pair, hi, lo) lexsort-duplicate
         pass per cell — integer compares only, no per-pair Python loop
                                                   [1 grid exchange]

    Integer contract: the threshold test is ``inter·10⁶ ≥ t_ppm·union``
    (exact ⟺ J ≥ t); ``jaccard_ppm = inter·10⁶ // union``.

    ``df_mode`` picks how document frequencies reach the prefix builder
    (the output is identical either way — the prefix order only shapes
    the CANDIDATE superset, never the verified result):
      * ``'join'`` — df attaches by a g-bucketed join and payloads are
        rebuilt doc-bucketed: 6 bounded exchanges, unbounded corpora.
      * ``'broadcast'`` — the folded df table (only df ≥ 2 rows; absent
        shingles are df = 1 by construction) ships once via ``ray.put``
        and payloads build PER BATCH (a doc's rows never leave its
        batch), cutting the plan to 3 exchanges: df fold, prefix-pair
        mining, verify grid.  Valid while the repeated-shingle table
        fits a worker heap (``df_broadcast_limit``).
      * ``'auto'`` — broadcast when the folded distinct-shingle table is
        ≤ ``df_broadcast_limit`` rows, else join.  Auto materializes the
        (small) df table to count it; at true corpus scale pass
        ``df_mode='join'`` explicitly so the fold streams.

    ``cross_col`` switches to the INCREMENTAL-dedup join: name an int64
    side column (e.g. 0 = existing corpus, 1 = new crawl) and only pairs
    whose sides DIFFER are emitted — dedup of a new crawl against the
    standing corpus without re-pairing the corpus against itself.  The
    broadcast path suppresses same-side pairs at mine time; both paths
    enforce the filter at verify.  Pair orientation stays id_a < id_b.
    """
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        bucketed_map_groups,
        shared_key_pair_counts,
    )

    M = 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        # batch-vectorized distinct per-doc shingles (_shingle_batch:
        # Arrow split + window concat + code-lexsort dedup — the r4
        # per-doc join/set loop removed)
        grams, didx = _shingle_batch(
            batch.column(text_col).to_pylist(), k_shingle)
        take = pa.array(didx)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()).take(take),
            "g": grams,
            "side": (batch.column(cross_col).cast(pa.int64()).take(take)
                     if cross_col else
                     pa.array(np.zeros(len(didx), dtype=np.int64))),
        })

    # (doc, shingle) rows are globally distinct (a doc lives in one batch),
    # so the df fold needs no second dedup
    long = ds.map_batches(explode, batch_format="pyarrow")
    dfs = bucketed_aggregate(
        long, ["g"], {"_df": (id_col, "size")}, num_buckets=num_buckets)

    mode = df_mode
    if mode == "auto":
        dfs = dfs.materialize()
        mode = ("broadcast" if dfs.count() <= df_broadcast_limit
                else "join")
    elif mode not in ("broadcast", "join"):
        raise ValueError(f"df_mode must be auto|broadcast|join, got {mode!r}")

    if mode == "broadcast":
        return _jaccard_join_broadcast_df(
            ds, dfs, id_col=id_col, text_col=text_col, k_shingle=k_shingle,
            threshold_ppm=threshold_ppm, num_buckets=num_buckets,
            verify_grid=verify_grid, df_broadcast_limit=df_broadcast_limit,
            cross_col=cross_col)

    def df_side(frame: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": frame["g"],
                             "_df": frame["_df"].astype("int64")})

    with_df = bucket_join(
        long, dfs.map_batches(df_side, batch_format="pandas"),
        left_key="g", right_key="g", num_buckets=num_buckets)

    def build_sets(frame: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64"),
                              "side": pd.Series(dtype="int64"),
                              "pref": pd.Series(dtype=object),
                              "blob": pd.Series(dtype=object)})
        if frame.empty:
            return empty
        frame = frame.sort_values([id_col, "_df", "g"], kind="mergesort")
        ids = frame[id_col].to_numpy()
        gs = frame["g"].to_numpy()
        # digest the frame VOCABULARY once (shingles repeat across docs)
        uniq, inv = np.unique(gs, return_inverse=True)
        dig = np.empty((len(uniq), 2), dtype=np.uint64)
        for i, s in enumerate(uniq):
            d = hashlib.md5(s.encode("utf-8")).digest()
            dig[i, 0] = int.from_bytes(d[:8], "little")
            dig[i, 1] = int.from_bytes(d[8:], "little")
        hi, lo = dig[inv, 0], dig[inv, 1]
        uids, starts = np.unique(ids, return_index=True)
        bounds = np.append(starts, len(ids))
        n = np.diff(bounds).astype(np.int64)
        p = n - (threshold_ppm * n + M - 1) // M + 1
        # rows stay doc-contiguous under the stable (id, hi, lo) lexsort,
        # so each doc's slice is its numerically sorted digest set
        order = np.lexsort((lo, hi, ids))
        pairs = np.empty((len(ids), 2), dtype=np.uint64)
        pairs[:, 0], pairs[:, 1] = hi[order], lo[order]
        # bytes blobs survive bucket_join's null-pad alignment (a binary
        # column; list<uint64> cannot) and frombuffer at use is zero-copy
        prefs = [hi[s:s + k].tobytes()
                 for s, k in zip(bounds[:-1], p)]
        blobs = [pairs[s:e].tobytes()
                 for s, e in zip(bounds[:-1], bounds[1:])]
        return pd.DataFrame({
            id_col: uids.astype(np.int64),
            "n": n,
            "side": frame["side"].to_numpy()[starts].astype(np.int64),
            "pref": prefs,
            "blob": blobs,
        })

    payloads = bucketed_map_groups(
        with_df, id_col, build_sets, num_buckets=num_buckets
    ).materialize()

    def prefix_rows(frame: pd.DataFrame) -> pd.DataFrame:
        if frame.empty:
            return pd.DataFrame({"g": pd.Series(dtype="uint64"),
                                 id_col: pd.Series(dtype="int64")})
        parts = [np.frombuffer(b, dtype=np.uint64) for b in frame["pref"]]
        lens = np.fromiter((len(a) for a in parts), dtype=np.int64,
                           count=len(parts))
        return pd.DataFrame({
            "g": np.concatenate(parts),
            id_col: np.repeat(frame[id_col].to_numpy(), lens),
        })

    candidates = shared_key_pair_counts(
        payloads.map_batches(prefix_rows, batch_format="pandas"),
        key_col="g", member_col=id_col, min_shared=1,
        # losslessness forbids a real cap; a hub PREFIX shingle would mean
        # the threshold is too low for this corpus, not a plan defect
        max_members_per_key=1_000_000,
        num_buckets=num_buckets,
        out_a="id_a", out_b="id_b", out_n="_n_prefix_shared",
    )

    # ---- rendezvous-grid verify (shared with the broadcast-df path) -----
    cand_cells, payload_cells, verify_cells, n_cells = _jaccard_grid_fns(
        id_col=id_col, threshold_ppm=threshold_ppm, verify_grid=verify_grid,
        cross_only=cross_col is not None)

    unioned = candidates.map_batches(
        cand_cells, batch_format="pandas",
    ).union(payloads.map_batches(payload_cells, batch_format="pandas"))

    return bucketed_map_groups(unioned, "cell", verify_cells,
                               num_buckets=n_cells)


def _jaccard_grid_fns(*, id_col: str, threshold_ppm: int, verify_grid: int,
                      cross_only: bool = False):
    """Rendezvous-grid verify kernels for the exact set-similarity join.

    Joining blobs onto candidate rows duplicates each doc's set PER
    CANDIDATE (the per-doc candidate fan-out, ~80× here) across two
    exchanges.  Instead both sides meet in a G×G bucket grid: candidate
    (a,b) goes to ONE cell (bucket(a), bucket(b)) as three ints; each
    payload doc is replicated to its G cells — blob exchange volume is
    G × |payload table|, wins whenever G < avg candidates per doc (same
    grid as the embedding all-pairs path).  Per-cell state is two
    doc-buckets of payloads, so cell memory is bounded by the bucket
    size, not the candidate count.  Candidate rows are deduplicated
    IN-CELL (all copies of a pair land in the same cell by construction),
    which lets callers skip a dedicated pair-distinct exchange.
    """
    from htrc_feature_reader_ray.functions.ids import stable_hash64

    M = 1_000_000
    G = verify_grid
    n_cells = G * (G + 1) // 2

    def _grid_bucket(ids: np.ndarray) -> np.ndarray:
        return (stable_hash64(ids.astype(object)) % np.uint64(G)).astype(
            np.int64)

    def cand_cells(frame: pd.DataFrame) -> pd.DataFrame:
        ia = frame["id_a"].to_numpy().astype(np.int64)
        ib = frame["id_b"].to_numpy().astype(np.int64)
        ba, bb = _grid_bucket(ia), _grid_bucket(ib)
        lo_b, hi_b = np.minimum(ba, bb), np.maximum(ba, bb)
        return pd.DataFrame({
            "cell": lo_b * G + hi_b,
            "id_a": ia, "id_b": ib,
            "pid": np.full(len(ia), -1, dtype=np.int64),
            "n": np.zeros(len(ia), dtype=np.int64),
            "side": np.zeros(len(ia), dtype=np.int64),
            "blob": [b""] * len(ia),
        })

    def payload_cells(frame: pd.DataFrame) -> pd.DataFrame:
        ids = frame[id_col].to_numpy().astype(np.int64)
        bi = _grid_bucket(ids)
        rep = np.repeat(np.arange(len(ids)), G)
        j = np.tile(np.arange(G, dtype=np.int64), len(ids))
        birep = bi[rep]
        cells = np.minimum(birep, j) * G + np.maximum(birep, j)
        side = (frame["side"].to_numpy().astype(np.int64)
                if "side" in frame.columns
                else np.zeros(len(ids), dtype=np.int64))
        return pd.DataFrame({
            "cell": cells,
            "id_a": np.full(len(rep), -1, dtype=np.int64),
            "id_b": np.full(len(rep), -1, dtype=np.int64),
            "pid": ids[rep],
            "n": frame["n"].to_numpy().astype(np.int64)[rep],
            "side": side[rep],
            "blob": frame["blob"].to_numpy()[rep],
        })

    OUT_EMPTY = {
        "id_a": pd.Series(dtype="int64"),
        "id_b": pd.Series(dtype="int64"),
        "inter": pd.Series(dtype="int64"),
        "union_n": pd.Series(dtype="int64"),
        "jaccard_ppm": pd.Series(dtype="int64"),
    }

    def _gather(P: np.ndarray, starts: np.ndarray,
                lens: np.ndarray) -> np.ndarray:
        # rows P[starts[i] : starts[i]+lens[i]] for every i, concatenated —
        # the standard repeat+arange slice gather, no per-pair Python
        total = int(lens.sum())
        if total == 0:
            return P[:0]
        shift = starts - np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = np.arange(total, dtype=np.int64) + np.repeat(shift, lens)
        return P[idx]

    def verify_cells(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(OUT_EMPTY)
        parts = []
        for _, cdf in df.groupby("cell", sort=False):
            is_pay = cdf["pid"].to_numpy() >= 0
            cand = cdf.loc[~is_pay]
            if cand.empty:
                continue
            pay = cdf.loc[is_pay]
            pids = pay["pid"].to_numpy()
            pns = pay["n"].to_numpy().astype(np.int64)
            # ONE concatenation of the cell's payload blobs; every pair's
            # set is then a (start, len) slice — no per-pair frombuffer
            P = np.frombuffer(b"".join(pay["blob"]),
                              dtype=np.uint64).reshape(-1, 2)
            starts = np.concatenate(([0], np.cumsum(pns)[:-1]))
            pn = pd.Series(pns, index=pids)
            pstart = pd.Series(starts, index=pids)
            # in-cell candidate dedup: a pair reached by several prefix
            # shingles (or mined in several g-buckets) verifies once
            pr = np.unique(np.stack([cand["id_a"].to_numpy(),
                                     cand["id_b"].to_numpy()], axis=1),
                           axis=0)
            ia, ib = pr[:, 0], pr[:, 1]
            if cross_only and len(ia):
                pside = pd.Series(pay["side"].to_numpy(), index=pids)
                cross = (pside.loc[ia].to_numpy()
                         != pside.loc[ib].to_numpy())
                ia, ib = ia[cross], ib[cross]
                if not len(ia):
                    continue
            la = pn.loc[ia].to_numpy()
            lb = pn.loc[ib].to_numpy()
            # exact length filter: J <= min/max, so min·10⁶ < t·max can't hit
            keep = np.minimum(la, lb) * M >= threshold_ppm * np.maximum(
                la, lb)
            if not keep.any():
                continue
            ia, ib, la, lb = ia[keep], ib[keep], la[keep], lb[keep]
            nrows = len(ia)
            cat = np.concatenate([
                _gather(P, pstart.loc[ia].to_numpy(), la),
                _gather(P, pstart.loc[ib].to_numpy(), lb),
            ])
            pidx = np.concatenate(
                [np.repeat(np.arange(nrows), la),
                 np.repeat(np.arange(nrows), lb)])
            order = np.lexsort((cat[:, 1], cat[:, 0], pidx))
            pc = pidx[order]
            h, lw = cat[order, 0], cat[order, 1]
            dup = ((pc[1:] == pc[:-1]) & (h[1:] == h[:-1])
                   & (lw[1:] == lw[:-1]))
            inter = np.bincount(pc[1:][dup], minlength=nrows).astype(
                np.int64)
            union = la + lb - inter
            hit = inter * M >= threshold_ppm * union
            if hit.any():
                parts.append(pd.DataFrame({
                    "id_a": ia[hit], "id_b": ib[hit],
                    "inter": inter[hit], "union_n": union[hit],
                    "jaccard_ppm": inter[hit] * M // union[hit],
                }))
        if not parts:
            return pd.DataFrame(OUT_EMPTY)
        return pd.concat(parts, ignore_index=True)

    return cand_cells, payload_cells, verify_cells, n_cells


def _jaccard_join_broadcast_df(ds, dfs, *, id_col, text_col, k_shingle,
                               threshold_ppm, num_buckets, verify_grid,
                               df_broadcast_limit, cross_col=None):
    """3-exchange exact set-similarity join (broadcast-df variant).

    The folded shingle document frequencies (the ONLY global state the
    prefix filter needs) ship once via ``ray.put`` — and only the df ≥ 2
    rows: a shingle absent from the broadcast occurs in exactly one doc,
    so its df is 1 by construction.  With df available map-side, the
    per-doc payloads (prefix hashes + full digest set) build PER BATCH —
    a doc's shingle rows never leave the batch that exploded them — so
    the df-attach join and the doc-bucketed payload rebuild of the join
    path disappear, and candidate pairs fuse straight into their grid
    cells inside the prefix-mining bucket pass (the pair-distinct fold is
    subsumed by the grid's in-cell dedup: all copies of a pair land in
    one cell).  Plan: df fold (caller) → prefix-pair mining → grid
    verify.  Prefix ORDER differs from the join path only inside equal
    (df, shingle) ranks — both orders are globally consistent, so the
    candidate supersets differ but the verified output is identical
    (pinned by test against the join path).
    """
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    M = 1_000_000
    cap = 1_000_000  # losslessness forbids a real hub cap (join-path rule)

    def dup_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch.column("_df"), 1))
        return pa.table({"g": pc.cast(t.column("g"), pa.large_string()),
                         "_df": pc.cast(t.column("_df"), pa.int64())})

    dup_pdf = dfs.map_batches(dup_only, batch_format="pyarrow").to_pandas()
    if dup_pdf.empty:
        # zero-block upstream drops even the columns
        dup_pdf = pd.DataFrame({"g": pd.Series(dtype=object),
                                "_df": pd.Series(dtype="int64")})
    if len(dup_pdf) > df_broadcast_limit:
        raise ValueError(
            f"repeated-shingle table ({len(dup_pdf)}) exceeds "
            f"df_broadcast_limit ({df_broadcast_limit}) — use "
            f"df_mode='join'")
    df_ref = ray.put((pd.Index(dup_pdf["g"].astype(object).to_numpy()),
                      dup_pdf["_df"].to_numpy().astype(np.int64)))

    def build_payloads(batch: pa.Table) -> pa.Table:
        idx, dfv = ray.get(df_ref)
        ids_in = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sides_in = (batch.column(cross_col).to_pylist() if cross_col
                    else [0] * len(ids_in))
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "side": pa.array([], type=pa.int64()),
            "pref": pa.array([], type=pa.large_binary()),
            "blob": pa.array([], type=pa.large_binary()),
        })
        # vectorized distinct per-doc shingles; docs with no shingles
        # drop out, survivors renumber densely in batch order
        grams, didx0 = _shingle_batch(texts, k_shingle)
        if not len(didx0):
            return empty
        kept_docs, didx = np.unique(didx0, return_inverse=True)
        keep_ids = [ids_in[i] for i in kept_docs]
        keep_sides = [sides_in[i] for i in kept_docs]
        # batch VOCABULARY (distinct shingles), lexicographically ranked
        # so `uniq`/`inv` match the former np.unique(g_arr) exactly —
        # the md5-128 digest loop then runs once per vocab entry
        de = grams.dictionary_encode()
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(de.dictionary.to_pylist(), dtype=object)
        sorder = np.argsort(vocab, kind="stable")
        rank_of = np.empty(len(vocab), dtype=np.int64)
        rank_of[sorder] = np.arange(len(vocab), dtype=np.int64)
        uniq = vocab[sorder]
        inv = rank_of[codes]
        pos = idx.get_indexer(uniq)
        dfu = np.ones(len(uniq), dtype=np.int64)
        hit = pos >= 0
        dfu[hit] = dfv[pos[hit]]
        dig = np.empty((len(uniq), 2), dtype=np.uint64)
        for i, s in enumerate(uniq):
            d = hashlib.md5(s.encode("utf-8")).digest()
            dig[i, 0] = int.from_bytes(d[:8], "little")
            dig[i, 1] = int.from_bytes(d[8:], "little")
        hi, lo = dig[inv, 0], dig[inv, 1]
        dfr = dfu[inv]
        n = np.bincount(didx, minlength=len(keep_ids)).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(n)])
        p = n - (threshold_ppm * n + M - 1) // M + 1
        # prefix order: (df asc, shingle asc) within each doc — any
        # globally consistent order keeps the prefix lemma lossless
        # (inv = lexicographic string rank, same order as the strings)
        order_pref = np.lexsort((inv, dfr, didx))
        hi_pref = hi[order_pref]
        order_num = np.lexsort((lo, hi, didx))
        pairs = np.empty((len(didx), 2), dtype=np.uint64)
        pairs[:, 0], pairs[:, 1] = hi[order_num], lo[order_num]
        prefs = [hi_pref[s:s + k].tobytes() for s, k in zip(bounds[:-1], p)]
        blobs = [pairs[s:e].tobytes()
                 for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.table({
            id_col: pa.array(keep_ids, type=pa.int64()),
            "n": pa.array(n),
            "side": pa.array(keep_sides, type=pa.int64()),
            "pref": pa.array(prefs, type=pa.large_binary()),
            "blob": pa.array(blobs, type=pa.large_binary()),
        })

    payloads = ds.map_batches(
        build_payloads, batch_format="pyarrow").materialize()

    cand_cells, payload_cells, verify_cells, n_cells = _jaccard_grid_fns(
        id_col=id_col, threshold_ppm=threshold_ppm, verify_grid=verify_grid,
        cross_only=cross_col is not None)

    def prefix_rows(frame: pd.DataFrame) -> pd.DataFrame:
        if frame.empty:
            return pd.DataFrame({"g": pd.Series(dtype="uint64"),
                                 id_col: pd.Series(dtype="int64"),
                                 "side": pd.Series(dtype="int64")})
        parts = [np.frombuffer(b, dtype=np.uint64) for b in frame["pref"]]
        lens = np.fromiter((len(a) for a in parts), dtype=np.int64,
                           count=len(parts))
        return pd.DataFrame({
            "g": np.concatenate(parts),
            id_col: np.repeat(frame[id_col].to_numpy(), lens),
            "side": np.repeat(
                frame["side"].to_numpy().astype(np.int64), lens),
        })

    def mine_cells(df: pd.DataFrame) -> pd.DataFrame:
        # pairs sharing a prefix hash, fused straight into grid cells —
        # duplicates (same pair via several shingles/buckets) are fine,
        # the grid dedups in-cell
        sizes = df.groupby("g", sort=False)[id_col].transform("size")
        d = df.loc[(sizes >= 2) & (sizes <= cap)]
        if d.empty:
            return cand_cells(pd.DataFrame({
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64")}))
        m = d.merge(d[[id_col, "g", "side"]], on="g", suffixes=("_a", "_b"))
        m = m.loc[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if cross_col is not None:
            # incremental mode: same-side pairs never leave the miner
            m = m.loc[m["side_a"] != m["side_b"]]
        pr = np.unique(np.stack([m[f"{id_col}_a"].to_numpy(),
                                 m[f"{id_col}_b"].to_numpy()], axis=1),
                       axis=0)
        return cand_cells(pd.DataFrame({"id_a": pr[:, 0], "id_b": pr[:, 1]}))

    cand_rows = bucketed_map_groups(
        payloads.map_batches(prefix_rows, batch_format="pandas"),
        "g", mine_cells, num_buckets=num_buckets)

    unioned = cand_rows.union(
        payloads.map_batches(payload_cells, batch_format="pandas"))
    return bucketed_map_groups(unioned, "cell", verify_cells,
                               num_buckets=n_cells)


def jaccard_join_sql(*, id_col: str = "doc_id", text_col: str = "text",
                     k_shingle: int = 3, threshold_ppm: int = 500_000,
                     table: str = "documents",
                     cross_side_expr: str | None = None) -> str:
    """SQL mirror: the UNFILTERED exact all-pairs join — prefix filtering
    is lossless, so the engine must reproduce it bit for bit.
    ``cross_side_expr`` (a boolean SQL template over an ``{id}``
    placeholder) mirrors the engine's ``cross_col`` incremental mode:
    only pairs whose side expressions DIFFER survive."""
    assert k_shingle == 3, "oracle only mirrors k=3"
    cross = ""
    if cross_side_expr is not None:
        ea = cross_side_expr.format(id="id_a")
        eb = cross_side_expr.format(id="id_b")
        cross = f"\n          AND (({ea}) <> ({eb}))"
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '), x -> x <> '')
                     AS arr
          FROM {table}
        ), sh AS (
          SELECT DISTINCT {id_col},
                 arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
          FROM toks, unnest(generate_series(1, len(arr) - 2)) AS u(i)
        ), sz AS (SELECT {id_col}, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
                 count(*)::BIGINT AS i
          FROM sh a JOIN sh b ON a.g = b.g
                    AND a.{id_col} < b.{id_col}
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, i AS inter,
               (sa.n + sb.n - i)::BIGINT AS union_n,
               (i * 1000000 // (sa.n + sb.n - i))::BIGINT AS jaccard_ppm
        FROM inter JOIN sz sa ON id_a = sa.{id_col}
                   JOIN sz sb ON id_b = sb.{id_col}
        WHERE i * 1000000 >= {threshold_ppm} * (sa.n + sb.n - i){cross}"""


# ---------------------------------------------------------------------------
# train/test split leakage audit
# ---------------------------------------------------------------------------

def split_leakage(ds, *, text_col: str = "text", split_col: str,
                  splits=("test", "train"), num_buckets: int = 32):
    """Evaluation-hygiene audit: content digests present in MORE THAN ONE
    split of ``split_col`` — every such digest is a leak (an eval doc the
    model saw in training verbatim). Output: (digest, splits..., counts)
    as one row per leaked digest with per-split counts.

    Shape: per-batch (digest, split) count partials (normalized-text md5,
    the exact_dedup identity), one digest-bucketed fold, leak filter
    inside the bucket — only digest rows ever cross, never text."""
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "digest": text_md5_batch(batch, text_col),
            "split": batch.column(split_col),
        })
        g = t.group_by(["digest", "split"]).aggregate([([], "count_all")])
        return g.rename_columns(["digest", "split", "n"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["digest", "split"], {"n": ("n", "sum")},
        num_buckets=num_buckets)

    splits = list(splits)

    def leaks(df: pd.DataFrame) -> pd.DataFrame:
        w = df.pivot_table(index="digest", columns="split", values="n",
                           aggfunc="sum", fill_value=0)
        # explicit split domain: bucket-local absence must not change the
        # output schema
        w = w.reindex(columns=splits, fill_value=0)
        w = w[(w > 0).sum(axis=1) > 1]
        out = w.reset_index()
        out.columns.name = None  # pivot leaves the split axis name behind
        for c in splits:
            out[f"n_{c}"] = out[c].astype("int64")
            out = out.drop(columns=[c])
        return out

    return bucketed_map_groups(folded, "digest", leaks,
                               num_buckets=num_buckets)


def split_leakage_sql(*, table: str = "documents", text: str = "text",
                      split_expr: str) -> str:
    return f"""
        WITH d AS (
          SELECT md5(lower(regexp_replace({text}, '\\s+', ' ', 'g')))
                   AS digest,
                 {split_expr} AS split
          FROM {table}
        ),
        a AS (
          SELECT digest,
                 count(*) FILTER (WHERE split = 'test')::BIGINT AS n_test,
                 count(*) FILTER (WHERE split = 'train')::BIGINT AS n_train
          FROM d GROUP BY 1
        )
        SELECT digest, n_test, n_train FROM a
        WHERE n_test > 0 AND n_train > 0"""


# ---------------------------------------------------------------------------
# simhash drift between consecutive snapshots


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    b = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return b.reshape(len(x), 64).sum(axis=1).astype(np.int64)


def simhash_drift(pages, *, url_col: str = "url", ts_col: str = "warc_ts",
                  text_col: str = "text", num_buckets: int = 32):
    """Per-snapshot content drift: the Hamming distance between each
    snapshot's simhash and its url's PREVIOUS snapshot's — the recrawl
    scheduler's "how much actually changed" signal at O(1) state per
    page (the sketch-space alternative to ``snapshot_change``'s exact
    token diff, which exchanges token sets). ``hamming = -1`` marks a
    url's first snapshot; token-free pages hash to 0 by the simhash
    convention. Snapshots of a url are assumed ts-unique (the crawl
    fixture's contract — ties would make "previous" ambiguous).

    The simhash kernel runs MAP-SIDE (scan tasks, batched) so the
    url-bucketed exchange moves only 24-byte ``(url, ts, simhash)`` sketch
    rows — page text never crosses the shuffle (~50× less exchange volume
    than sketching in-bucket); in-bucket work is just lexsort + shifted
    XOR popcount. Output ``(url, warc_ts, simhash, hamming)`` with simhash
    as signed int64 (the ``dedup_simhash`` two's-complement
    convention)."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def sketch(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch.column(text_col).to_pylist())
        return pa.table({
            url_col: batch.column(url_col),
            ts_col: batch.column(ts_col),
            "simhash": pa.array(sh.view(np.int64)),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col],
                            kind="mergesort").reset_index(drop=True)
        sh = df["simhash"].to_numpy().view(np.uint64)
        prev = np.roll(sh, 1)
        urls = df[url_col].to_numpy()
        first = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            first[1:] = urls[1:] != urls[:-1]
        ham = np.where(first, np.int64(-1),
                       _popcount64(sh ^ prev)).astype(np.int64)
        return pd.DataFrame({
            url_col: df[url_col],
            ts_col: df[ts_col],
            "simhash": sh.view(np.int64),
            "hamming": ham,
        })

    sketched = pages.select_columns(
        [url_col, ts_col, text_col]
    ).map_batches(sketch, batch_format="pyarrow")
    return bucketed_map_groups(
        sketched, url_col, per_bucket, num_buckets=num_buckets)


def simhash_drift_sql(*, table: str, url_col: str = "url",
                      ts_col: str = "warc_ts",
                      text_col: str = "text") -> str:
    """SQL fragment (continuation CTEs — prepend a WITH chain that
    defines ``table`` with (url, ts, text)): the dedup_simhash replay
    per (url, ts), then a window lag + ``bit_count(xor(...))``."""
    return f"""
        sd_tok AS (
          SELECT {url_col}, {ts_col},
                 unnest(list_filter(string_split({text_col}, ' '),
                                    x -> x <> '')) AS token
          FROM {table}
        ),
        sd_tc AS (
          SELECT {url_col}, {ts_col}, token, count(*)::BIGINT AS cnt
          FROM sd_tok GROUP BY 1, 2, 3
        ),
        sd_bits AS (
          SELECT {url_col}, {ts_col}, b.b,
                 sum(CASE WHEN (md5_number_upper(token) >> b.b) & 1 = 1
                          THEN cnt ELSE -cnt END) AS score
          FROM sd_tc, (SELECT unnest(range(64)) AS b) b
          GROUP BY 1, 2, 3
        ),
        sd_sh AS (
          SELECT {url_col}, {ts_col},
                 sum(CASE WHEN score > 0
                          THEN (1::UBIGINT << b)::HUGEINT
                          ELSE 0 END) AS s
          FROM sd_bits GROUP BY 1, 2
        ),
        sd_all AS (
          SELECT p.{url_col}, p.{ts_col}, coalesce(sd_sh.s, 0) AS s
          FROM {table} p LEFT JOIN sd_sh USING ({url_col}, {ts_col})
        ),
        sd_drift AS (
          SELECT {url_col}, {ts_col}, s,
                 lag(s) OVER (PARTITION BY {url_col}
                              ORDER BY {ts_col}) AS ps
          FROM sd_all
        )
        SELECT {url_col}, {ts_col},
               (CASE WHEN s >= 9223372036854775808
                     THEN s - 18446744073709551616
                     ELSE s END)::BIGINT AS simhash,
               (CASE WHEN ps IS NULL THEN -1
                     ELSE bit_count(xor(s::UBIGINT, ps::UBIGINT))
                END)::BIGINT AS hamming
        FROM sd_drift"""


# ---------------------------------------------------------------------------
# content-defined chunking (hash-gated boundaries)


def cdc_chunks(ds, *, text_col: str = "text", id_col: str = "doc_id",
               divisor: int = 16):
    """Content-defined chunking at token granularity: a new chunk starts
    at every token whose ``md5 % divisor == 0`` — the storage-dedup /
    LBFS-family idea (boundaries are a function of CONTENT, so inserting
    or deleting a paragraph only re-cuts the chunks it touches, where
    fixed-size windows shift every downstream chunk). Expected chunk
    length ≈ ``divisor`` tokens. This is the shift-robust unit for
    cross-document boilerplate dedup: identical paragraphs yield identical
    ``(chunk_text, chunk_digest)`` rows wherever they sit.

    Token-hash gates (vs a byte-level gear rolling hash) keep the op
    stateless and embarrassingly parallel — the gate is a function of the
    token TYPE, hashed once per batch vocabulary; FastCDC's min/max
    chunk-size clamps are a production knob deliberately left out of the
    reproducibility contract. Zero exchange; chunks rebuild through ONE
    ``pc.binary_join`` over boundary offsets. Digests are md5-64 masked
    to 63 bits (the ``winnow_fingerprints`` convention) so the SQL mirror
    compares in BIGINT.

    Output ``(id, chunk_idx, chunk_text, n_tokens, chunk_digest)``; empty
    documents emit no rows."""
    mask63 = np.uint64((1 << 63) - 1)

    def chunks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from htrc_feature_reader_ray.stages.textstats import _tok_stats

        flat, parent, nrows = _tok_stats(batch, text_col)
        if len(parent) == 0:
            return pa.table({
                id_col: batch.column(id_col).slice(0, 0),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk_digest": pa.array([], type=pa.int64()),
            })
        flat_np = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat_np, return_inverse=True)
        gate = (md5_hash64(uniq) % np.uint64(divisor) == 0)[inv]
        first = np.ones(len(parent), dtype=bool)
        first[1:] = parent[1:] != parent[:-1]
        start = first | gate
        s_idx = np.flatnonzero(start)
        off = np.concatenate((s_idx, [len(parent)])).astype(np.int64)
        texts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off, type=pa.int32()), flat),
            " ")
        cdoc = parent[s_idx]
        # chunk_idx: 0-based rank within its doc = position - first
        # start position of the doc
        doc_first = np.ones(len(s_idx), dtype=bool)
        doc_first[1:] = cdoc[1:] != cdoc[:-1]
        base = np.maximum.accumulate(
            np.where(doc_first, np.arange(len(s_idx)), 0))
        idx = np.arange(len(s_idx)) - base
        n_tok = np.diff(off)
        digest = (md5_hash64(texts.to_pylist()) & mask63).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(cdoc)),
            "chunk_idx": pa.array(idx, type=pa.int64()),
            "chunk_text": texts,
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "chunk_digest": pa.array(digest, type=pa.int64()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def cdc_chunks_sql(*, table: str = "documents", text: str = "text",
                   id_col: str = "doc_id", divisor: int = 16) -> str:
    """SQL replay: per-token gate + running-sum window → chunk ordinal,
    ordered string_agg per chunk, identical 63-bit digest."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH tok AS (
          SELECT {id_col}, arr[i.i] AS token, i.i AS pos,
                 CASE WHEN i.i > 1 AND
                           md5_number_upper(arr[i.i]) % {divisor} = 0
                      THEN 1 ELSE 0 END AS cut
          FROM (SELECT {id_col}, {toks} AS arr FROM {table}),
               LATERAL unnest(generate_series(1, len(arr))) AS i(i)
        ),
        lab AS (
          SELECT {id_col}, token, pos,
                 sum(cut) OVER (PARTITION BY {id_col}
                                ORDER BY pos)::BIGINT AS chunk_idx
          FROM tok
        ),
        agg AS (
          SELECT {id_col}, chunk_idx,
                 string_agg(token, ' ' ORDER BY pos) AS chunk_text,
                 count(*)::BIGINT AS n_tokens
          FROM lab GROUP BY 1, 2
        )
        SELECT {id_col}, chunk_idx, chunk_text, n_tokens,
               (md5_number_upper(chunk_text)
                & 9223372036854775807)::BIGINT AS chunk_digest
        FROM agg"""


def cdc_dup_rate(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 divisor: int = 16, num_buckets: int = 32):
    """Per-document boilerplate fraction under content-defined chunking:
    the share of a doc's CDC chunks whose digest also appears in at least
    one OTHER document — the actionable per-doc dedup signal (RefinedWeb-
    style "how much of this page is shared template/syndication"), robust
    to paragraph shifts because the chunk boundaries are content-defined.

    Scale shape: the chunk table is materialized once for its two
    consumers (digest fold + join back — the ``rollup_counts`` lesson);
    duplicate status folds as distinct (digest, doc) pairs so a chunk
    repeated WITHIN one doc does not count as cross-doc boilerplate; one
    digest-bucketed fold + one digest-co-partitioned join + one doc fold.
    Output ``(id, n_chunks, n_dup_chunks, dup_ppm)`` (docs with no chunks
    emit no rows — empty docs have no boilerplate to measure)."""
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    chunks = cdc_chunks(ds, text_col=text_col, id_col=id_col,
                        divisor=divisor).select_columns(
        [id_col, "chunk_digest"]).materialize()

    def pair_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by([
            "chunk_digest", id_col]).aggregate([]).rename_columns(
            ["chunk_digest", id_col])

    n_docs = bucketed_aggregate(
        chunks.map_batches(pair_distinct, batch_format="pyarrow"),
        "chunk_digest", {"n_docs_partial": (id_col, "nunique")},
        num_buckets=num_buckets,
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "digest": df["chunk_digest"],
            "n_docs": df["n_docs_partial"].astype("int64"),
        })

    joined = bucket_join(
        chunks, n_docs.map_batches(fin, batch_format="pandas"),
        left_key="chunk_digest", right_key="digest",
        num_buckets=num_buckets)

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dup = pc.cast(pc.greater(batch.column("n_docs"), 1), pa.int64())
        return pa.table({
            id_col: batch.column(id_col),
            "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "dup": dup,
        })

    per_doc = bucketed_aggregate(
        joined.map_batches(flag, batch_format="pyarrow"),
        id_col, {"n_chunks": ("one", "sum"), "n_dup_chunks": ("dup", "sum")},
        num_buckets=num_buckets,
    )

    def ratio(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_chunks"] = df["n_chunks"].astype("int64")
        df["n_dup_chunks"] = df["n_dup_chunks"].astype("int64")
        df["dup_ppm"] = (
            df["n_dup_chunks"] * 1_000_000 // df["n_chunks"]
        ).astype("int64")
        return df

    return per_doc.map_batches(ratio, batch_format="pandas")


def cdc_dup_rate_sql(*, table: str = "documents", text: str = "text",
                     id_col: str = "doc_id", divisor: int = 16) -> str:
    return f"""
        WITH chunks AS ({cdc_chunks_sql(table=table, text=text,
                                        id_col=id_col, divisor=divisor)}),
        d AS (
          SELECT chunk_digest,
                 count(DISTINCT {id_col})::BIGINT AS n_docs
          FROM chunks GROUP BY 1
        )
        SELECT c.{id_col}, count(*)::BIGINT AS n_chunks,
               sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_dup_chunks,
               (sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*))::BIGINT AS dup_ppm
        FROM chunks c JOIN d USING (chunk_digest)
        GROUP BY 1"""


def dedup_loser_rate(clusters, docs, *, id_col: str = "doc_id",
                     group_col: str = "source",
                     broadcast_limit: int = 2_000_000):
    """Corpus-health rollup of a near-dup clustering: per ``group_col``
    (source, host, snapshot…) the document count, the number of DUP
    LOSERS (cluster members that are not their cluster's canonical
    min-id doc — exactly the rows ``corpus_curation`` removes), and the
    loser rate in exact ppm.  The dashboard that says WHERE the
    duplication lives before anyone pays for a full curation run.

    Scale shape: the loser id set is pair-list-sized (``dedup_clusters``
    output), ships once via ``ray.put`` behind a loud ``broadcast_limit``
    guard; the docs table folds per batch to (group, n, n_losers)
    partials — one tiny group fold, no doc-keyed exchange."""
    import ray

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def only_losers(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.not_equal(batch.column(id_col), batch.column("cluster_id"))
        return batch.filter(m).select([id_col])

    lose_pdf = clusters.map_batches(
        only_losers, batch_format="pyarrow").to_pandas()
    ids = (lose_pdf[id_col].to_numpy() if len(lose_pdf)
           else np.array([], dtype=np.int64))
    if len(ids) > broadcast_limit:
        raise ValueError(
            f"loser set ({len(ids)}) exceeds broadcast_limit "
            f"({broadcast_limit}) — rollup needs the anti-join shape")
    ref = ray.put(pd.Index(ids))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        loser = df[id_col].isin(ray.get(ref)).astype("int64")
        g = df.assign(_l=loser).groupby(group_col, sort=False,
                                        as_index=False)
        return g.agg(n=(id_col, "size"), n_losers=("_l", "sum"))

    folded = bucketed_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        [group_col], {"n": ("n", "sum"), "n_losers": ("n_losers", "sum")},
        num_buckets=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group_col: df[group_col],
            "n_docs": df["n"].astype("int64"),
            "n_dup_losers": df["n_losers"].astype("int64"),
            "loser_ppm": (df["n_losers"] * 1_000_000
                          // df["n"]).astype("int64"),
        })

    return folded.map_batches(finish, batch_format="pandas")


def doc_novelty(ds, *, text_col: str = "text", id_col: str = "doc_id",
                n: int = 8, salt: str = "", num_buckets: int = 32):
    """Per-document n-gram novelty under the canonical corpus order — the
    Lee et al. ACL'22 ("Deduplicating Training Data Makes Language Models
    Better") dedup-health signal: for each doc, the fraction of its
    n-token shingle OCCURRENCES whose shingle the doc *owns*, where the
    owner of a shingle is the first document to contain it in the
    engine's deterministic md5 order (min over ``(md5_64(salt||id),
    id)``).  A heavily templated / syndicated corpus shows low novelty on
    late copies; a clean corpus is ~all-novel.  Unlike ``cdc_dup_rate``
    (symmetric "is this chunk shared") novelty is ORDERED — the first
    copy keeps full credit, later copies lose it — matching how a
    training run actually experiences duplication.

    Exact contract: tokens = space-split non-empties; shingles = the
    ``len-n+1`` consecutive n-token windows joined with ' '; ownership
    compares 64-bit shingle digests (``md5_hash64``; digest-level on both
    engine and oracle sides).  All occurrences in the owner doc count
    novel, including within-doc repeats.  Zero-shingle docs (< n tokens)
    emit ``n_shingles = 0`` and ``novel_ppm = 1_000_000`` (nothing
    copied).  Pure function of the data — bit-identical across runs and
    parallelism.

    Scale shape: one exploded pass pre-folds to distinct (digest, doc)
    rows map-side (a doc never splits across batches), materialized once
    for its two consumers; owner election is ONE digest-bucketed pass
    (per-bucket vectorized sort + drop_duplicates — an exact composite
    argmin over (h, id), no string order keys); one digest-co-partitioned
    join back, one doc-keyed fold, and a doc-keyed LEFT join onto the
    map-side totals.  Shingle text never crosses an exchange — only
    16-byte (digest, h) + id rows move.
    """
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        bucketed_map_groups,
    )

    if n <= 0:
        raise ValueError(f"shingle width must be positive, got {n}")

    def _shingles(batch: pa.Table):
        """(docrep int64[], digests int64[]) for one batch's shingles."""
        import pyarrow.compute as pc

        texts = batch.column(text_col)
        toks = pc.split_pattern(texts, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        mask = pc.not_equal(flat, "")
        parent = parent.filter(mask).to_numpy()
        flat = flat.filter(mask)
        lens = np.bincount(parent, minlength=len(texts)).astype(np.int64)
        ks = np.maximum(lens - n + 1, 0)
        total = int(ks.sum())
        if not total:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64), ks)
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        docrep = np.repeat(np.arange(len(lens), dtype=np.int64), ks)
        k_start = np.concatenate([[0], np.cumsum(ks)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(k_start, ks)
        start = doc_start[docrep] + local
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.cast(pa.large_string())
        parts = [flat.take(pa.array(start + j)) for j in range(n)]
        sh = pc.binary_join_element_wise(
            *parts, pa.scalar(" ", pa.large_string()))
        vals = sh.to_pandas().to_numpy(dtype=object)
        uniq, inv = np.unique(vals, return_inverse=True)
        dig = md5_hash64(uniq)[inv]  # uint64 — unsigned on BOTH sides
        return docrep, dig, ks

    def explode(batch: pa.Table) -> pa.Table:
        docrep, dig, _ = _shingles(batch)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"p": docrep, "digest": dig})
             .groupby(["p", "digest"], sort=False).size())
        p = g.index.get_level_values("p").to_numpy()
        h = md5_hash64([f"{salt}{v}" for v in ids])
        return pa.table({
            "digest": pa.array(
                g.index.get_level_values("digest").to_numpy(dtype=np.uint64),
                pa.uint64()),
            "h": pa.array(h[p], pa.uint64()),
            id_col: pa.array(ids[p]),
            "cnt": pa.array(g.to_numpy(dtype=np.int64), pa.int64()),
        })

    def totals(batch: pa.Table) -> pa.Table:
        _, _, ks = _shingles(batch)
        return pa.table({
            id_col: batch.column(id_col),
            "n_shingles": pa.array(ks, pa.int64()),
        })

    pairs = ds.map_batches(explode, batch_format="pyarrow").materialize()

    # owner election: exact composite argmin over (h, id) per digest — h
    # stays UNSIGNED uint64 on the engine side and UBIGINT in the oracle,
    # so (engine sort) ≡ (SQL ORDER BY h, did); ties in h resolve on id.
    def elect(df: pd.DataFrame) -> pd.DataFrame:
        w = (df.sort_values(["digest", "h", id_col], kind="mergesort")
             .drop_duplicates("digest"))
        return pd.DataFrame({"digest": w["digest"].to_numpy(),
                             "wid": w[id_col].to_numpy()})

    winners = bucketed_map_groups(pairs, "digest", elect,
                                  num_buckets=num_buckets)

    joined = bucket_join(pairs.select_columns(["digest", id_col, "cnt"]),
                         winners, left_key="digest", right_key="digest",
                         num_buckets=num_buckets)

    def novel_rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df[id_col] == df["wid"]]
        return pd.DataFrame({id_col: keep[id_col].to_numpy(),
                             "cnt": keep["cnt"].to_numpy()})

    novel = bucketed_aggregate(
        joined.map_batches(novel_rows, batch_format="pandas"),
        [id_col], {"novel": ("cnt", "sum")}, num_buckets=num_buckets)

    out = bucket_join(ds.map_batches(totals, batch_format="pyarrow"),
                      novel, left_key=id_col, right_key=id_col,
                      num_buckets=num_buckets, how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ns = df["n_shingles"].astype("int64")
        nov = df["novel"].fillna(0).astype("int64")
        ppm = np.where(ns.to_numpy() == 0, 1_000_000,
                       nov.to_numpy() * 1_000_000
                       // np.maximum(ns.to_numpy(), 1))
        return pd.DataFrame({
            id_col: df[id_col],
            "n_shingles": ns,
            "novel": nov,
            "novel_ppm": ppm.astype(np.int64),
        })

    return out.map_batches(finish, batch_format="pandas")


def doc_novelty_sql(*, table: str = "documents", text: str = "text",
                    id_col: str = "doc_id", n: int = 8,
                    salt: str = "") -> str:
    """SQL replay: identical shingle construction, 64-bit digest identity
    via md5_number_upper (UBIGINT — unsigned on both sides, matching the
    engine's uint64), owner via a (h, did) row_number window."""
    toks = f"list_filter(string_split({text}, ' '), x -> x <> '')"
    return f"""
        WITH nv_d AS (
          SELECT {id_col} AS did, {toks} AS t FROM {table}
        ),
        nv_sh AS (
          SELECT did,
                 md5_number_upper('{salt}' || did::VARCHAR) AS h,
                 md5_number_upper(array_to_string(
                      list_slice(t, i.i, i.i + {n} - 1), ' ')) AS digest
          FROM nv_d, unnest(generate_series(1, len(t) - {n} + 1)) AS i(i)
        ),
        nv_w AS (
          SELECT digest, did AS wid FROM (
            SELECT digest, did,
                   row_number() OVER (PARTITION BY digest
                                      ORDER BY h, did) AS rn
            FROM (SELECT DISTINCT digest, h, did FROM nv_sh))
          WHERE rn = 1
        ),
        nv_nov AS (
          SELECT s.did, count(*)::BIGINT AS novel
          FROM nv_sh s JOIN nv_w w
            ON s.digest = w.digest AND s.did = w.wid
          GROUP BY 1
        ),
        nv_tot AS (
          SELECT did, greatest(len(t) - {n} + 1, 0)::BIGINT AS n_shingles
          FROM nv_d
        )
        SELECT t.did AS {id_col}, t.n_shingles,
               coalesce(v.novel, 0)::BIGINT AS novel,
               (CASE WHEN t.n_shingles = 0 THEN 1000000
                     ELSE coalesce(v.novel, 0) * 1000000 // t.n_shingles
                END)::BIGINT AS novel_ppm
        FROM nv_tot t LEFT JOIN nv_nov v ON v.did = t.did"""


# ---------------------------------------------------------------------------
# source × source shingle-overlap matrix (which crawls duplicate each other)


def source_overlap(ds, *, text_col: str = "text",
                   source_col: str = "source", k: int = 3,
                   max_sources_per_shingle: int = 1024,
                   num_buckets: int = 32):
    """Pairwise shingle-set Jaccard between SOURCES — the dedup-planning
    matrix one level above the per-document ops: before spending a
    corpus-wide near-dup pass, "which ingest feeds duplicate each other,
    and how much" decides whether to drop a whole feed, dedup a pair of
    feeds against each other, or skip. Emits one row per source pair
    sharing ≥1 shingle: ``(source_a, source_b, n_shared, jaccard_ppm)``
    over DISTINCT k-word shingles (``word_shingles`` semantics including
    the short-doc whole-text fallback), ``jaccard_ppm = i·10⁶ //
    (|A|+|B|−i)`` exact.

    ``max_sources_per_shingle`` caps universal-boilerplate shingles out
    of the INTERSECTION counts (contract, mirrored by the oracle — with
    denominators the UNCAPPED per-source set sizes), the
    ``containment_pairs`` convention.

    Scale shape: per-batch distinct (shingle, source) rows — shingle text
    crosses the exchange once per batch-distinct occurrence, counted not
    per-token — into the generic ``shared_key_pair_counts`` kernel (ONE
    shingle-bucketed exchange, vectorized self-merge pair emission, tiny
    pair fold), plus a per-source distinct-size fold sharing the same
    bucketed dedup; the ≤ S² pair table and ≤ S size table finish on the
    driver in Python-int ppm."""
    from htrc_feature_reader_ray.stages.partition import (
        bucketed_map_groups,
        shared_key_pair_counts,
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        # NULL-source rows carry no feed identity and are excluded by
        # contract (the pair kernel would drop NaN groups anyway —
        # better to make that explicit than depend on pandas dropna)
        batch = batch.filter(pc.is_valid(batch.column(source_col)))
        grams, didx = _shingle_batch(
            batch.column(text_col).to_pylist(), k)
        if not len(didx):
            return pa.table({"shingle": pa.array([], type=pa.string()),
                             source_col: pa.array([], type=pa.string())})
        # distinct (shingle, SOURCE): fold the per-doc-distinct rows to
        # per-source-distinct via (source code, gram code) lexsort
        # no nulls reach here (filtered above), so dictionary codes are
        # plain ints — a null code would surface as a float NaN that
        # defeats the consecutive-dedup (NaN != NaN)
        src = batch.column(source_col).cast(pa.string()).combine_chunks()
        sde = src.dictionary_encode()
        scodes = (sde.indices.to_numpy(zero_copy_only=False)
                  .astype(np.int64)[didx])
        gcodes = (grams.dictionary_encode().indices
                  .to_numpy(zero_copy_only=False))
        order = np.lexsort((gcodes, scodes))
        ss, gs = scodes[order], gcodes[order]
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = (ss[1:] != ss[:-1]) | (gs[1:] != gs[:-1])
        sel = pa.array(order[keep])
        return pa.table({
            "shingle": grams.take(sel),
            source_col: src.take(pa.array(didx)).take(sel),
        })

    rows = ds.map_batches(rows_fn, batch_format="pyarrow", batch_size=4096)
    pairs = shared_key_pair_counts(
        rows, key_col="shingle", member_col=source_col,
        max_members_per_key=max_sources_per_shingle,
        num_buckets=num_buckets,
        out_a="source_a", out_b="source_b", out_n="n_shared",
    ).to_pandas()

    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["shingle", source_col])
        return d.groupby(source_col, as_index=False).agg(
            n=("shingle", "size"))

    sizes = (bucketed_map_groups(rows, "shingle", size_partial,
                                 num_buckets=num_buckets)
             .to_pandas().groupby(source_col)["n"].sum().to_dict())
    if not len(pairs):
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            "n_shared": pd.Series([], dtype="int64"),
            "jaccard_ppm": pd.Series([], dtype="int64")}))
    jac = [
        int(i) * 1_000_000
        // (int(sizes[a]) + int(sizes[b]) - int(i))
        for a, b, i in zip(pairs["source_a"], pairs["source_b"],
                           pairs["n_shared"])
    ]
    out = pairs.copy()
    out["n_shared"] = out["n_shared"].astype("int64")
    out["jaccard_ppm"] = np.array(jac, dtype=np.int64)
    import ray.data

    return ray.data.from_pandas(out.sort_values(["source_a", "source_b"])
                                .reset_index(drop=True))


def source_overlap_sql(*, table: str = "documents", text: str = "text",
                       source: str = "source",
                       max_sources_per_shingle: int = 1024) -> str:
    """SQL mirror: the SHINGLES_BODY construction per source, hub-capped
    intersection, uncapped denominators. NULL sources excluded — the
    engine contract (a row with no feed identity contributes nothing,
    including to the per-shingle cap)."""
    return f"""
        WITH toks AS (
          SELECT {source} AS src,
                 list_filter(string_split({text}, ' '), x -> x <> '') AS arr
          FROM {table}
          WHERE {source} IS NOT NULL
        ),
        sh AS (
          SELECT DISTINCT src,
                 arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS shingle
          FROM toks, LATERAL unnest(range(1, len(arr) - 1)) AS t(i)
          WHERE len(arr) >= 3
          UNION
          SELECT DISTINCT src, array_to_string(arr, ' ') AS shingle
          FROM toks WHERE len(arr) BETWEEN 1 AND 2
        ),
        keyok AS (
          SELECT shingle FROM sh GROUP BY 1
          HAVING count(*) BETWEEN 2 AND {max_sources_per_shingle}
        ),
        sizes AS (SELECT src, count(*)::BIGINT AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.src AS sa, b.src AS sb, count(*)::BIGINT AS i
          FROM sh a JOIN keyok USING (shingle)
          JOIN sh b ON b.shingle = a.shingle
          WHERE a.src < b.src GROUP BY 1, 2
        )
        SELECT sa AS source_a, sb AS source_b, i AS n_shared,
               (i::HUGEINT * 1000000
                // (za.n + zb.n - i))::BIGINT AS jaccard_ppm
        FROM inter
        JOIN sizes za ON za.src = sa
        JOIN sizes zb ON zb.src = sb
        ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# duplicate-multiplicity loss weights (down-weight instead of delete)


def dup_weights(docs, pairs_ds, *, id_col: str = "doc_id",
                num_buckets: int = 16, **cluster_kwargs):
    """Per-document training weight from near-dup cluster multiplicity:
    ``weight_ppm = 10⁶ // cluster_size`` — the down-weighting alternative
    to hard removal (Lee et al. ACL'22 discuss exactly this trade: a
    cluster of k near-copies carries one document's worth of evidence, so
    give each member ``1/k`` of a loss weight and the expected gradient
    matches the deduped corpus WITHOUT discarding the distributional
    variety the copies carry). Docs in no cluster keep weight 10⁶.
    Output ``(id, cluster_size, weight_ppm)`` — one row per input doc,
    joinable straight into a loss-weight column.

    Scale shape: composition — :func:`dedup_clusters` over the pair list
    (its own documented paths), a cluster-keyed size fold (≤ |nodes|
    rows), then two slim LEFT ``bucket_join`` passes to attach
    (cluster_id, size) back onto the id stream; absent rows coalesce to
    size 1 map-side. Integer-exact, partitioning-independent."""
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    clusters = dedup_clusters(pairs_ds, num_buckets=num_buckets,
                              **cluster_kwargs).materialize()
    sizes = bucketed_aggregate(
        clusters, "cluster_id", {"cluster_size": ("cluster_id", "size")},
        num_buckets=num_buckets,
    )
    ids = docs.select_columns([id_col])
    withc = bucket_join(
        ids,
        clusters.map_batches(
            lambda df: df.rename(columns={"doc_id": "_cid"}),
            batch_format="pandas"),
        left_key=id_col, right_key="_cid", num_buckets=num_buckets,
        how="left")
    def fill_singleton(df: pd.DataFrame) -> pd.DataFrame:
        # unclustered docs are their own singleton cluster (cluster_id ==
        # own id, the dedup_clusters min-reach convention) — also keeps
        # the second join key null-free
        df = df.copy()
        df["cluster_id"] = df["cluster_id"].fillna(
            df[id_col]).astype(np.int64)
        return df

    withs = bucket_join(
        withc.map_batches(fill_singleton, batch_format="pandas"),
        sizes.map_batches(
            lambda df: df.rename(columns={"cluster_id": "_cl"}),
            batch_format="pandas"),
        left_key="cluster_id", right_key="_cl", num_buckets=num_buckets,
        how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        size = df["cluster_size"].fillna(1).astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col].astype(np.int64),
            "cluster_size": size,
            "weight_ppm": (1_000_000 // size).astype(np.int64),
        })

    return withs.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-day crawl novelty (how much of each day's crawl is new content)


def daily_novelty(pages, *, text_col: str = "text", ts_col: str = "warc_ts",
                  num_buckets: int = 32):
    """Per-day content novelty of the crawl: for each capture day, how
    many DISTINCT content digests were seen that day and how many of
    them were seen for the FIRST time — the crawl-health dashboard
    number ("is today's crawl discovering new content or re-fetching
    what we have") that drives recrawl-budget reallocation; the
    corpus-level daily sibling of :func:`~htrc_feature_reader_ray.stages.
    sketch.snapshot_change`'s per-url view. ``novelty_ppm = n_new·10⁶ //
    n_digests`` exact; a digest captured twice on its first day counts
    new ONCE (digest-level, not capture-level — documented).

    Scale shape: per-batch distinct (digest, day) rows — the digest is
    md5 of the text, computed map-side so page text never crosses the
    exchange — then ONE digest-bucketed pass (all rows of a digest
    co-partition) does the global (digest, day) dedup, takes each
    digest's min day, and collapses to (day, n_digests, n_new) partials;
    the day-keyed fold is audit-sized (bounded crawl span) and finishes
    on the driver in Python-int ppm."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    day_us = 86_400_000_000

    def rows_fn(batch: pa.Table) -> pa.Table:
        t = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        day = pa.compute.divide(t, day_us).cast(pa.int64())
        texts = batch.column(text_col).to_pylist()
        dig = md5_hash64([x or "" for x in texts])
        tb = pa.table({"digest": pa.array(dig, type=pa.uint64()),
                       "day": day})
        return tb.group_by(["digest", "day"]).aggregate([])

    rows = pages.map_batches(rows_fn, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "new": pd.Series([], dtype="int64")})
        d = df.drop_duplicates(["digest", "day"])
        mn = d.groupby("digest", sort=False)["day"].transform("min")
        out = d.assign(_new=(d["day"] == mn).astype(np.int64)).groupby(
            "day", as_index=False).agg(n=("digest", "size"),
                                       new=("_new", "sum"))
        return out

    folded = (bucketed_map_groups(rows, "digest", per_bucket,
                                  num_buckets=num_buckets)
              .to_pandas()
              .groupby("day", as_index=False).sum()
              .sort_values("day"))
    out = pd.DataFrame({
        "day": folded["day"].to_numpy().astype(np.int64),
        "n_digests": folded["n"].to_numpy().astype(np.int64),
        "n_new": folded["new"].to_numpy().astype(np.int64),
        "novelty_ppm": np.array(
            [int(nw) * 1_000_000 // max(int(n), 1)
             for nw, n in zip(folded["new"], folded["n"])],
            dtype=np.int64),
    })
    import ray.data

    return ray.data.from_pandas(out)


def daily_novelty_sql(*, pages_pre: str, text_expr: str,
                      ts_col: str = "warc_ts") -> str:
    """SQL mirror: text identity stands in for the digest (equality
    semantics identical), distinct (text, day), min-day window."""
    return f"""
        {pages_pre},
        dd AS (
          SELECT DISTINCT {text_expr} AS t,
                 epoch_us({ts_col}) // 86400000000 AS day
          FROM pages
        ),
        m AS (
          SELECT t, day, min(day) OVER (PARTITION BY t) AS mn FROM dd
        )
        SELECT day::BIGINT AS day, count(*)::BIGINT AS n_digests,
               count(*) FILTER (WHERE day = mn)::BIGINT AS n_new,
               (count(*) FILTER (WHERE day = mn)::HUGEINT * 1000000
                // greatest(count(*), 1))::BIGINT AS novelty_ppm
        FROM m GROUP BY 1 ORDER BY 1"""
