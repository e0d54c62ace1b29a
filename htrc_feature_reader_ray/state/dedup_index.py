"""Incremental exact-dedup against a SHARED MUTABLE fingerprint index.

This is the one operator family where the Dataset API genuinely can't
express the semantics — a cross-batch, cross-dataset mutable membership
set — so it drops to raw Ray actors (the task brief's canonical example:
"a shared mutable index"). Everything else stays Ray-Data: the scan is an
ordinary streaming ``map_batches`` filter; only fingerprints (16-byte
digests), never documents, travel to the index.

Design:

* the index is SHARDED over ``num_shards`` actors by stable fingerprint
  hash — memory and message load spread evenly; at cluster scale shards
  place on different nodes (``num_shards`` ≈ nodes × a few);
* each batch makes ONE ``check_and_add`` call per touched shard with the
  batch's (intra-batch-deduped) fingerprint list; the actor mailbox
  serializes calls, so exactly one caller wins each fingerprint even under
  concurrent batches;
* "first seen wins" is therefore exact in arrival order per shard; under
  parallel execution WHICH duplicate survives a concurrent tie is
  scheduler-dependent, but exactly-one-survivor is guaranteed (tested);
* the returned Dataset is a STATEFUL STREAMING stage: consume it exactly
  once (``write_parquet`` / ``iter_batches``) — re-executing the plan
  would re-query the now-populated index and emit nothing;
* ``snapshot()``/``restore()`` give checkpoint/resume across runs (the
  read-through-cache analog of caching.py:14-89 for streaming state).

Reference analog: the ziptree write-once refusal (resolvers.py:306-310) is
exactly this check-and-add, one zipfile bucket = one shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from htrc_feature_reader_ray.functions.ids import stable_hash64


@ray.remote(num_cpus=0)
class DedupIndexShard:
    """One hash-space slice of the fingerprint index (a plain set; ~48 B
    per entry — 10^9 fingerprints ≈ 48 GB across all shards)."""

    def __init__(self):
        self._seen: set[str] = set()

    def check_and_add(self, fps: list[str]) -> list[bool]:
        """For each fingerprint IN ORDER: True if first-ever-seen (and
        insert), False if already present. Atomic per shard."""
        seen = self._seen
        out = []
        for f in fps:
            if f in seen:
                out.append(False)
            else:
                seen.add(f)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)

    def snapshot(self) -> list[str]:
        return sorted(self._seen)

    def restore(self, fps) -> None:
        self._seen.update(fps)


def create_dedup_index(num_shards: int = 8):
    return [DedupIndexShard.remote() for _ in range(num_shards)]


def index_size(index) -> int:
    return sum(ray.get([s.size.remote() for s in index]))


def incremental_dedup(ds, index, *, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Filter ``ds`` to rows whose normalized-text fingerprint has never
    been seen by ``index`` (inserting as it goes). Same fingerprint as
    ``dedup.exact_dedup`` — this is its streaming/incremental form."""
    from htrc_feature_reader_ray.stages.dedup import text_md5_batch

    index = list(index)
    num_shards = len(index)

    def fn(batch: pa.Table) -> pa.Table:
        fps = np.asarray(text_md5_batch(batch, text_col).to_pylist(),
                         dtype=object)
        n = len(fps)
        if n == 0:
            return batch
        # intra-batch first occurrence wins before any actor round-trip
        _, first_idx = np.unique(fps, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        uniq_idx = np.flatnonzero(is_first)
        uniq_fps = fps[uniq_idx]
        shard_of = (stable_hash64(uniq_fps) % np.uint64(num_shards)).astype(
            np.int64
        )
        fresh = np.zeros(len(uniq_fps), dtype=bool)
        calls, slots = [], []
        for s in range(num_shards):
            sel = np.flatnonzero(shard_of == s)
            if len(sel):
                calls.append(
                    index[s].check_and_add.remote(list(uniq_fps[sel]))
                )
                slots.append(sel)
        for sel, res in zip(slots, ray.get(calls)):
            fresh[sel] = res
        keep = np.zeros(n, dtype=bool)
        keep[uniq_idx[fresh]] = True
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Streaming MinHash-LSH band index — the near-dup extension of the exact
# fingerprint index above: the continual-crawl analog of
# stages/dedup.py::minhash_candidate_pairs. Same actor discipline (sharded
# mutable state is the one thing the Dataset API can't express), same
# snapshot/restore checkpoint contract; only (band, band_hash, doc_id)
# triples — never text or signatures — travel to the index.
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=0)
class LshBandIndexShard:
    """One hash-space slice of the (band, band_hash) → member-doc-ids
    bucket map. A bucket holds every doc id whose minhash signature
    produced that band hash; a new arrival collides with each existing
    member (the streaming form of the batch band-groupby)."""

    def __init__(self):
        self._buckets: dict = {}

    def add_and_collide(self, bands, hashes, ids):
        """For each (band, band_hash, doc_id) IN ORDER: emit collision
        pairs (min, max) against ids already in the bucket, then insert.
        Atomic per shard (actor mailbox); re-adding an id already in a
        bucket is a no-op — no self-pairs, no double counting."""
        pa_out, pb_out = [], []
        bk = self._buckets
        for b, h, i in zip(bands, hashes, ids):
            key = (b, h)
            prev = bk.get(key)
            if prev is None:
                bk[key] = [i]
                continue
            if i in prev:
                continue
            for p in prev:
                if p < i:
                    pa_out.append(p)
                    pb_out.append(i)
                else:
                    pa_out.append(i)
                    pb_out.append(p)
            prev.append(i)
        return pa_out, pb_out

    def size(self) -> int:
        return sum(len(v) for v in self._buckets.values())

    def snapshot(self) -> list:
        """Serializable checkpoint: sorted (band, band_hash, member-ids)
        triples (production would land these as one parquet per shard —
        the layout ``state/lineage.write_partitioned`` gives for free)."""
        return sorted((b, h, sorted(v)) for (b, h), v in
                      self._buckets.items())

    def restore(self, snap) -> None:
        """Merge a snapshot back in (idempotent per member)."""
        bk = self._buckets
        for b, h, members in snap:
            prev = bk.setdefault((b, h), [])
            for m in members:
                if m not in prev:
                    prev.append(m)


def create_lsh_index(num_shards: int = 8):
    return [LshBandIndexShard.remote() for _ in range(num_shards)]


def lsh_index_size(index) -> int:
    return sum(ray.get([s.size.remote() for s in index]))


def incremental_minhash_pairs(ds, index, *, id_col: str = "doc_id",
                              text_col: str = "text", k_shingle: int = 3,
                              num_perm: int = 64, bands: int = 16,
                              concurrency=(1, 8), num_buckets: int = 16):
    """Stream ``ds`` through the shared LSH band index and return the NEW
    candidate near-dup pairs it produces: ``(doc_a, doc_b, n_bands)``,
    doc_a < doc_b, n_bands = number of bands the pair collided in.

    Contract (pinned by pytest): streaming a corpus through a fresh index
    in ANY batch split yields, unioned, exactly
    ``dedup.minhash_candidate_pairs`` of the whole corpus — each pair
    reported ONCE, on the stream batch that completed it. Signatures come
    from the same :class:`~htrc_feature_reader_ray.stages.dedup.MinHasher`
    (one per actor, permutations built once), so batch and stream agree
    bit-for-bit on band hashes.

    Scale shape: the per-batch signature work is the batch pipeline's;
    the exchange is replaced by one ``add_and_collide`` call per touched
    shard per batch carrying (band, hash, id) ints; the tiny pair stream
    folds n_bands in ONE doc_a-bucketed pass. Like
    :func:`incremental_dedup`, the result is a stateful streaming stage —
    consume it exactly once."""
    from htrc_feature_reader_ray.stages.dedup import MinHasher
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    index = list(index)
    num_shards = len(index)
    mh_kwargs = dict(k_shingle=k_shingle, num_perm=num_perm, bands=bands,
                     id_col=id_col, text_col=text_col)

    class _Stream:
        def __init__(self) -> None:
            self.mh = MinHasher(**mh_kwargs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = self.mh(batch)  # (id, band, band_hash)
            ids = rows.column(id_col).to_numpy(zero_copy_only=False)
            bd = rows.column("band").to_numpy(zero_copy_only=False)
            hv = rows.column("band_hash").to_numpy(zero_copy_only=False)
            shard_of = (hv.view(np.uint64) % np.uint64(num_shards)).astype(
                np.int64)
            calls = []
            for s in range(num_shards):
                sel = np.flatnonzero(shard_of == s)
                if len(sel):
                    calls.append(index[s].add_and_collide.remote(
                        bd[sel].tolist(), hv[sel].tolist(),
                        ids[sel].tolist()))
            pa_out, pb_out = [], []
            for a, b in ray.get(calls):
                pa_out += a
                pb_out += b
            return pa.table({
                "doc_a": pa.array(pa_out, type=pa.int64()),
                "doc_b": pa.array(pb_out, type=pa.int64()),
                "n": pa.array(np.ones(len(pa_out), dtype=np.int64)),
            })

    pair_stream = ds.map_batches(_Stream, batch_format="pyarrow",
                                 concurrency=concurrency)
    return bucketed_aggregate(
        pair_stream, ["doc_a", "doc_b"], {"n_bands": ("n", "sum")},
        num_buckets=num_buckets)
