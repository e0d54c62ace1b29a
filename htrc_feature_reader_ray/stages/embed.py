"""Model-based scoring stages: chunk/document embedding vectors.

Reference analog: ``chunk_to_wem`` (transformations.py:3-45) — a
word-embedding model held in memory scores each chunk's tokenlist as the
log-count-weighted sum of its in-vocabulary token vectors. Here the model is
an actor-pool state (loaded once per actor in ``__init__`` — the SURVEY §2.5
pattern); scoring is one numpy matmul per batch group.

No embedding model ships in this container, so the default model is a
DETERMINISTIC pseudo-embedding (hash-seeded unit vectors per token): the Ray
plumbing — actor signature, batching, output schema (fixed-size list<float>)
— is real and tested; swap ``HashEmbeddingModel`` for a real lookup (e.g.
word2vec binary) via ``model_factory``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from htrc_feature_reader_ray.functions.tokenize import STOPWORDS_EN


class HashEmbeddingModel:
    """Deterministic stand-in for a word-embedding model: component d of a
    token's vector is ``(md5_u64(token + '|' + d) / 2^64) * 2 - 1`` (uniform
    in [-1, 1)), then unit-normalized. Same token → same vector on every
    actor/node/run — AND the construction is SQL-replayable (DuckDB
    ``md5_number_upper``), so model-scored pipelines can be oracle-checked
    end-to-end (see the chunk_embeddings oracle in __ray_entry__.py)."""

    def __init__(self, dim: int = 32) -> None:
        self.dim = dim

    def vectors(self, tokens: np.ndarray) -> np.ndarray:
        import hashlib

        out = np.empty((len(tokens), self.dim), dtype=np.float64)
        for i, t in enumerate(tokens):
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(f"{t}|{d}".encode("utf-8")).digest()[:8],
                        "little",
                    )
                    for d in range(self.dim)
                ),
                dtype=np.uint64,
                count=self.dim,
            )
            v = (h.astype(np.float64) / 2.0**64) * 2.0 - 1.0
            out[i] = v / np.sqrt((v * v).sum())
        return out


class MmapWordVectors:
    """Real-model loader contract: a gensim-KeyedVectors-shaped
    word-embedding model as a MEMORY-MAPPED array + token index — the
    shape reference ``transformations.py:16-24`` consumes (``model[vocab]``
    over an in-memory KeyedVectors), made multi-actor-friendly:

    * ``{path}.npy`` — the (V, dim) vector matrix, loaded once per actor
      in ``__init__`` via ``np.load(mmap_mode='r')``: the OS page cache
      shares the READ-ONLY pages across every actor replica on a node,
      so a multi-GB model costs one physical copy per node, not one per
      actor;
    * ``{path}.vocab`` — one token per line (utf-8), line i ↔ row i.

    Satisfies the :class:`ChunkEmbedder` model protocol (``dim``,
    ``vectors(tokens)``) plus the optional ``contains(tokens)`` mask —
    with it, OOV tokens contribute nothing AND don't count toward
    ``min_tokens`` (the reference's in-vocab filter,
    transformations.py:26-34). ``HashEmbeddingModel`` (no ``contains``:
    every token is in-vocab by construction) stays the test/oracle stub.
    """

    def __init__(self, path: str) -> None:
        self.mat = np.load(f"{path}.npy", mmap_mode="r")
        if self.mat.ndim != 2:
            raise ValueError(
                f"MmapWordVectors: expected (V, dim) matrix at "
                f"{path}.npy, got shape {self.mat.shape}")
        self.dim = int(self.mat.shape[1])
        with open(f"{path}.vocab", encoding="utf-8") as f:
            toks = f.read().splitlines()
        if len(toks) != self.mat.shape[0]:
            raise ValueError(
                f"MmapWordVectors: vocab has {len(toks)} tokens but "
                f"matrix has {self.mat.shape[0]} rows")
        self.index = {t: i for i, t in enumerate(toks)}

    @staticmethod
    def save(path: str, tokens, matrix: np.ndarray) -> None:
        """Write the ``{path}.npy`` + ``{path}.vocab`` pair (the format
        ``__init__`` memory-maps)."""
        tokens = list(tokens)
        matrix = np.asarray(matrix)
        if matrix.ndim != 2 or matrix.shape[0] != len(tokens):
            raise ValueError("save: matrix must be (len(tokens), dim)")
        np.save(f"{path}.npy", matrix)
        with open(f"{path}.vocab", "w", encoding="utf-8") as f:
            f.write("\n".join(tokens))

    def contains(self, tokens: np.ndarray) -> np.ndarray:
        return np.fromiter((t in self.index for t in tokens),
                           dtype=bool, count=len(tokens))

    def vectors(self, tokens: np.ndarray) -> np.ndarray:
        out = np.zeros((len(tokens), self.dim), dtype=np.float64)
        for i, t in enumerate(tokens):
            j = self.index.get(t)
            if j is not None:
                out[i] = self.mat[j]
        return out


class KeyedVectorsShapedModel:
    """Adapter binding any gensim-KeyedVectors-shaped object to the
    :class:`ChunkEmbedder` model protocol (``dim`` / ``vectors`` /
    ``contains``): the wrapped object needs only ``vector_size``,
    ``key_to_index`` and ``__getitem__`` — exactly the surface the
    reference consumes in ``transformations.py:16-34``. Outside the
    sandbox this wraps ``gensim.models.KeyedVectors.load(path,
    mmap='r')``; in tests a fake KeyedVectors-shaped object proves the
    adapter. Prefer :class:`MmapWordVectors` where you control the
    format — its read-only pages share across actor replicas."""

    def __init__(self, kv) -> None:
        self.kv = kv
        self.dim = int(kv.vector_size)

    def contains(self, tokens) -> np.ndarray:
        idx = self.kv.key_to_index
        return np.fromiter((t in idx for t in tokens),
                           dtype=bool, count=len(tokens))

    def vectors(self, tokens) -> np.ndarray:
        idx = self.kv.key_to_index
        out = np.zeros((len(tokens), self.dim), dtype=np.float64)
        for i, t in enumerate(tokens):
            if t in idx:
                out[i] = np.asarray(self.kv[t], dtype=np.float64)
        return out


def load_word_vectors(path: str, *, gensim_models=None):
    """Auto-binding model loader: the ``{path}.npy`` + ``{path}.vocab``
    mmap pair when present (:class:`MmapWordVectors`, the multi-actor
    format); otherwise a gensim ``KeyedVectors`` file when gensim is
    importable (``KeyedVectors.load(path, mmap='r')`` wrapped in
    :class:`KeyedVectorsShapedModel`). Raises NotImplementedError when
    neither applies — the documented stub behavior for this container.
    Pass ``gensim_models`` to bind another KeyedVectors-shaped API
    (tests inject a fake to prove the wiring without gensim)."""
    import os

    if os.path.exists(f"{path}.npy"):
        return MmapWordVectors(path)
    if gensim_models is None:
        try:
            import gensim.models as gensim_models  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                f"no {path}.npy mmap pair and gensim is not importable "
                "in this environment; save the model with "
                "MmapWordVectors.save or install gensim") from e
    kv = gensim_models.KeyedVectors.load(path, mmap="r")
    return KeyedVectorsShapedModel(kv)


class ChunkEmbedder:
    """Actor-pool stage: chunk tokenlist rows -> one embedding per chunk.

    Input batches: long rows (group_cols..., token_col, count). The embedding
    of a group is sum(log(1+count) * vec(token)) over non-stop in-vocab
    tokens (the reference's weighting, transformations.py:36-43), zero-vector
    when fewer than ``min_tokens`` distinct tokens match (placeholder rule,
    transformations.py:29-30).

    NOTE: a group's rows must be batch-local (run after chunked_tokenlist's
    bucketed pass, or with group keys deriving from one row).
    """

    def __init__(self, *, group_cols=("url", "chunk"), token_col: str = "token",
                 dim: int = 32, stop: bool = True, log: bool = True,
                 min_tokens: int = 1, model_factory=None) -> None:
        self.model = (model_factory or (lambda: HashEmbeddingModel(dim)))()
        self.dim = self.model.dim
        self.group_cols = list(group_cols)
        self.token_col = token_col
        self.stop = frozenset(STOPWORDS_EN) if stop else frozenset()
        self.log = log
        self.min_tokens = min_tokens
        self._cache: dict[str, np.ndarray] = {}

    _CACHE_LIMIT = 1 << 18  # bound per-actor memory: vectors are cheap to
    # recompute, so a full reset on overflow beats an LRU's bookkeeping

    def _vecs(self, tokens: np.ndarray) -> np.ndarray:
        missing = [t for t in tokens if t not in self._cache]
        if missing:
            if len(self._cache) + len(missing) > self._CACHE_LIMIT:
                # full reset: EVERY token of this call must be (re)computed,
                # not just the ones that were missing before the clear
                self._cache.clear()
                missing = list(dict.fromkeys(tokens))
            for t, v in zip(missing, self.model.vectors(np.array(missing, dtype=object))):
                self._cache[t] = v
        return np.stack([self._cache[t] for t in tokens])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over the WHOLE batch: one vocabulary factorize, one
        (rows × dim) weighted gather, one segmented reduce — no per-group
        Python loop (groups per batch grow with corpus size; rows do too,
        but all row-wise work here is numpy)."""
        df = df[~df[self.token_col].isin(self.stop)]
        if df.empty:
            return pd.DataFrame(
                {**{c: [] for c in self.group_cols}, "embedding": []}
            )
        codes = df.groupby(self.group_cols, sort=False).ngroup().to_numpy()
        tcodes, vocab = pd.factorize(
            df[self.token_col].to_numpy(dtype=object)
        )
        vmat = self._vecs(np.asarray(vocab, dtype=object))  # (V, dim)
        counts = df["count"].to_numpy(dtype=np.float64)
        w = np.log1p(counts) if self.log else counts
        if hasattr(self.model, "contains"):
            # real-model vocab filter (reference transformations.py:26-34):
            # OOV rows contribute nothing and don't count toward
            # min_tokens; the group row itself survives (zero-vector
            # placeholder when everything is OOV)
            match = self.model.contains(
                np.asarray(vocab, dtype=object))[tcodes]
            w = w * match
        else:
            match = np.ones(len(tcodes), dtype=bool)
        contrib = vmat[tcodes] * w[:, None]  # (rows, dim)
        order = np.argsort(codes, kind="stable")
        c_sorted = codes[order]
        starts = np.flatnonzero(np.r_[True, c_sorted[1:] != c_sorted[:-1]])
        sums = np.add.reduceat(contrib[order], starts, axis=0)  # (G, dim)
        sizes = np.add.reduceat(
            match[order].astype(np.int64), starts)  # in-vocab matches
        sums[sizes < self.min_tokens] = 0.0
        first_rows = order[starts]  # one representative row per group
        out = df.iloc[first_rows][self.group_cols].reset_index(drop=True)
        out["embedding"] = list(sums)
        return out


def chunk_embeddings(chunk_tokens_ds, *, group_cols=("url", "chunk"),
                     token_col: str = "token", dim: int = 32,
                     concurrency=(1, 8), **kwargs):
    """chunked tokenlist -> (group_cols..., embedding list<double>[dim]).

    Actor pool (model state amortized across batches). ``batch_size=None``
    feeds WHOLE blocks as batches: chunked_tokenlist emits one block per url
    bucket, so every chunk's rows are batch-complete (size num_buckets so a
    bucket stays under the target block size — same partitioning assumption
    as every bucketed op)."""
    return chunk_tokens_ds.map_batches(
        ChunkEmbedder,
        fn_constructor_kwargs=dict(
            group_cols=group_cols, token_col=token_col, dim=dim, **kwargs
        ),
        batch_format="pandas",
        batch_size=None,
        concurrency=concurrency,
    )
