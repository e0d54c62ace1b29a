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

import ray
from ray.data.aggregate import Count, Min

from htrc_feature_reader_ray.functions.ids import stable_hash64

_WS_RE = re.compile(r"\s+")

MERSENNE_P = (1 << 61) - 1


def _normalize(t: str) -> str:
    return _WS_RE.sub(" ", t).lower()


def text_md5_batch(batch: pa.Table, text_col: str) -> pa.Array:
    return pa.array(
        [
            hashlib.md5(_normalize(t).encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ],
        type=pa.string(),
    )


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """One row per distinct (normalized) text: (text_md5, kept id = min id,
    n_dups). SQL mirror: GROUP BY md5(lower(regexp_replace(text,...)))."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text_md5": text_md5_batch(batch, text_col),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def word_shingles(tokens: list[str], k: int) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


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
        sh = word_shingles([t for t in text.split(" ") if t], self.k)
        if not sh:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        base = stable_hash64(sh)  # (S,) uint64
        # (P, S) permuted hashes via affine map mod 2^64 (uint64 wraparound —
        # cheap, vectorized, and adequate mixing for minhash), min over shingles
        perm = self.a[:, None] * base[None, :] + self.b[:, None]
        return perm.min(axis=1)

    def signatures_batch(self, texts: list[str]) -> np.ndarray:
        """(D, num_perm) signatures for a whole batch in ONE pass: all docs'
        shingles are flattened, hashed once, permuted as a (P, S_total)
        matrix, and per-doc minima taken with segmented reduceat — no
        per-document Python work."""
        all_sh: list[str] = []
        starts = np.empty(len(texts), dtype=np.int64)
        empty = np.zeros(len(texts), dtype=bool)
        pos = 0
        for i, text in enumerate(texts):
            sh = word_shingles([t for t in text.split(" ") if t], self.k)
            starts[i] = pos
            if not sh:
                empty[i] = True
                all_sh.append("")  # placeholder so segments stay non-empty
                pos += 1
            else:
                all_sh.extend(sh)
                pos += len(sh)
        base = stable_hash64(all_sh)  # (S_total,)
        perm = self.a[:, None] * base[None, :] + self.b[:, None]  # (P, S)
        sigs = np.minimum.reduceat(perm, starts, axis=1).T  # (D, P)
        sigs[empty] = np.uint64(0xFFFFFFFFFFFFFFFF)
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


def minhash_dedup_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        k_shingle: int = 3, num_perm: int = 64,
                        bands: int = 16, threshold: float = 0.5,
                        concurrency=(1, 8), verify: str = "auto",
                        broadcast_limit: int = 1_000_000,
                        corpus_rows: int | None = None):
    """Near-duplicate pairs via MinHash-LSH: signature (actor pool) → band
    explode → band groupby → candidate pairs → exact n-gram-Jaccard verify.

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
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            k_shingle=k_shingle, num_perm=num_perm, bands=bands,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs_of_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one band_hash hash-bucket. Most LSH
        buckets are singletons — filter them vectorized first, then loop
        only over the (few) genuine collision groups."""
        dup = df[df.duplicated(["band", "band_hash"], keep=False)]
        if dup.empty:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        parts = []
        for _, g in dup.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g[id_col].unique())
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}))
        if not parts:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                 "doc_b": pd.Series(dtype="int64")})
        return pd.concat(parts, ignore_index=True).drop_duplicates()

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def dedupe_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["doc_a", "doc_b"], as_index=False)
            .size()
            .rename(columns={"size": "n_bands"})
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
    cand = bucketed_map_groups(pairs, "doc_a", dedupe_pairs, num_buckets=16)

    if verify == "auto":
        n = corpus_rows if corpus_rows is not None else ds.count()
        verify = "join" if n > broadcast_limit else "broadcast"

    if verify == "broadcast":
        docs_df = ds.select_columns([id_col, text_col]).to_pandas()
        token_map = {
            i: [t for t in s.split(" ") if t]
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

    with_a = bucket_join(
        cand, docs.map_batches(rename("a"), batch_format="pyarrow"),
        left_key="doc_a", right_key="id_a", num_buckets=16,
    )
    with_ab = bucket_join(
        with_a, docs.map_batches(rename("b"), batch_format="pyarrow"),
        left_key="doc_b", right_key="id_b", num_buckets=16,
    )

    def check_joined(batch: pd.DataFrame) -> pd.DataFrame:
        jac = [
            jaccard(
                [t for t in ta.split(" ") if t],
                [t for t in tb.split(" ") if t],
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


def embedding_dedup_pairs(ds, *, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding"):
    """Near-duplicate pairs by embedding cosine similarity: all (a < b) pairs
    with cos(a, b) >= threshold.

    Physical shape: the normalized matrix is broadcast once (``ray.put``) and
    each batch does one matmul against it — O(N·B) per batch, no shuffle. At
    corpus scale, pre-bucket by hyperplane LSH (similarity.HyperplaneLSH) and
    run this kernel per bucket; the small-side broadcast here is the
    exact-baseline variant. Scoring in float64.
    """
    from htrc_feature_reader_ray.stages.similarity import _as_matrix, _normalize

    full = ds.select_columns([id_col, vec_col]).materialize()
    full_tbl = pa.concat_tables(
        [b for b in full.iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    if full_tbl.num_rows == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    mat = _normalize(_as_matrix(full_tbl.column(vec_col)))
    ids = full_tbl.column(id_col).to_numpy().astype(np.int64)
    ref = ray.put((mat, ids))

    def find(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
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

    # scan the already-materialized projection, not ds (whose upstream would
    # re-execute a second time)
    return full.map_batches(find, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash


def simhash_batch(texts: list[str]) -> np.ndarray:
    """Vectorized-ish 64-bit simhash per text: token hashes weighted by
    counts, bitwise sign aggregation."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        h = stable_hash64(uniq)  # (U,) uint64
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )  # (U, 64) in {0,1}
        score = ((2 * bits - 1) * counts[:, None]).sum(axis=0)  # (64,)
        bitvec = (score > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(bitvec << np.arange(64, dtype=np.uint64))
    return out


def simhash(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """(id, simhash:int64-bitcast, band0..band3:int64) per doc. Equal simhash
    = near-dup cluster key; equal 16-bit band = Hamming<=3-candidate key."""

    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch.column(text_col).to_pylist())
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
