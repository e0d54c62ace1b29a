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
