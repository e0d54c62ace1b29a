"""Lineage manifests + checkpoint-resume for the partitioned parquet lake.

Reference analogs: the read-through cache resolver (caching.py:76-87 — a rerun
skips work already materialized) and the ziptree's refuse-to-overwrite
discipline (resolvers.py:306-310 — write-once outputs). North rule: "each
partition emits a lineage manifest (input files, row ranges, checksums)
enabling checkpoint-resume of any stage".

Model: a stage writes its output as hash-bucketed parquet
(``out_dir/bucket=K/``) plus ``_MANIFEST.json`` recording the input
fingerprint (paths, sizes, mtimes), per-bucket row counts, and the stage
parameters. ``run_stage`` skips recompute when the manifest matches;
``resume_missing_buckets`` recomputes ONLY absent buckets by filtering the
input on the same stable hash — safe because bucketing is deterministic
(functions/ids.py)."""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from htrc_feature_reader_ray.stages.partition import BUCKET_COL, add_bucket_column

MANIFEST = "_MANIFEST.json"


def fingerprint_inputs(paths) -> list[dict]:
    out = []
    for p in sorted(paths):
        st = os.stat(p)
        out.append({"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns})
    return out


def _load_manifest(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_partitioned(ds, out_dir: str, *, key: str, num_buckets: int,
                      inputs=(), params: dict | None = None,
                      ts_col: str | None = None,
                      partition_col: str | None = None) -> dict:
    """Write ``ds`` as a partitioned parquet lake + lineage manifest.

    Default layout: hash-bucket ``key`` into ``out_dir/bucket=K/*.parquet``
    (one directory per key range — resumable, never one giant file). With
    ``partition_col`` set, the dataset's OWN column partitions the layout
    instead (e.g. ``shard_id`` for training-shard exports) and no bucket
    column is added. Written atomically: data goes to ``out_dir.tmp``
    first, then a single rename."""
    t_start = time.time()
    # per-process tmp dir: two writers racing on one out_dir (e.g. two
    # concurrent gate shards cold-building the same checkpoint) must
    # never share a staging dir — a shared .tmp lets one writer's rmtree
    # silently mix/clobber the other's parquet mid-write
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    if os.path.exists(tmp):  # same-pid leftover (pid reuse) only
        shutil.rmtree(tmp)
    part = partition_col or "bucket"
    if partition_col is None:
        ds = add_bucket_column(ds, key, num_buckets, name="bucket")
    ds.write_parquet(tmp, partition_cols=[part])
    t_written = time.time()

    # counts from parquet footers in the same directory walk as byte sizes —
    # no second scan of the written data
    import pyarrow.parquet as pq

    counts: dict = {}
    bytes_per_bucket: dict = {}
    watermarks: dict = {}
    for name in os.listdir(tmp):
        if name.startswith(f"{part}="):
            bid = name.split("=", 1)[1]
            total_bytes = 0
            total_rows = 0
            ts_min = ts_max = None
            bdir = os.path.join(tmp, name)
            for f in os.listdir(bdir):
                fp = os.path.join(bdir, f)
                total_bytes += os.path.getsize(fp)
                if f.endswith(".parquet"):
                    meta = pq.ParquetFile(fp).metadata
                    total_rows += meta.num_rows
                    if ts_col is not None:
                        # per-partition event-time watermark from the same
                        # footers (SURVEY §7: partition metadata = counts +
                        # min/max ts), no data scan
                        schema_names = [
                            meta.row_group(0).column(i).path_in_schema
                            for i in range(meta.num_columns)
                        ] if meta.num_row_groups else []
                        if ts_col in schema_names:
                            ci = schema_names.index(ts_col)
                            for rg in range(meta.num_row_groups):
                                stats = meta.row_group(rg).column(ci).statistics
                                if stats is None or not stats.has_min_max:
                                    continue
                                lo, hi = stats.min, stats.max
                                ts_min = lo if ts_min is None else min(ts_min, lo)
                                ts_max = hi if ts_max is None else max(ts_max, hi)
            bytes_per_bucket[bid] = total_bytes
            counts[bid] = total_rows
            if ts_col is not None and ts_min is not None:
                watermarks[bid] = {"ts_min": str(ts_min), "ts_max": str(ts_max)}
    row_count = int(sum(counts.values()))
    manifest = {
        "key": key,
        "num_buckets": num_buckets,
        "partition_col": part,
        "inputs": fingerprint_inputs(inputs),
        "params": params or {},
        "buckets": {str(int(k)): int(v) for k, v in counts.items()},
        "bucket_bytes": bytes_per_bucket,
        "watermarks": watermarks,
        "row_count": row_count,
        "metrics": {
            "write_sec": round(t_written - t_start, 3),
            "rows_per_sec": round(row_count / max(t_written - t_start, 1e-9), 1),
            "total_bytes": int(sum(bytes_per_bucket.values())),
        },
        "completed_at": time.time(),
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return manifest


def run_stage(out_dir: str, build_fn, *, key: str, num_buckets: int,
              inputs=(), params: dict | None = None):
    """Checkpointed stage: if ``out_dir``'s manifest matches the current
    input fingerprint + params, read the lake instead of recomputing;
    otherwise call ``build_fn() -> Dataset`` and persist it.

    CROSS-PROCESS SAFE: the miss path (check → build → commit) holds an
    exclusive flock on ``out_dir + '.lock'`` with a double-checked
    manifest read, so N concurrent processes cold-starting the same
    checkpoint (e.g. the sharded parity gate on a fresh /tmp) build it
    exactly once; the losers block, then read the winner's lake."""
    current = {
        "inputs": fingerprint_inputs(inputs),
        "params": params or {},
        "key": key,
        "num_buckets": num_buckets,
    }

    def _hit():
        m = _load_manifest(out_dir)
        if m is not None and all(m.get(k) == v for k, v in current.items()):
            return m
        return None

    m = _hit()
    if m is not None:
        return ray.data.read_parquet(out_dir), m

    import fcntl

    os.makedirs(os.path.dirname(os.path.abspath(out_dir)), exist_ok=True)
    with open(out_dir + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        m = _hit()  # another process may have built while we waited
        if m is not None:
            return ray.data.read_parquet(out_dir), m
        # reclaim staging dirs orphaned by CRASHED builders (kill-resume
        # leaves out_dir.tmp.<dead-pid> behind, and a fresh pid never
        # matches it). Safe ONLY here, under the flock: no other process
        # can be staging this out_dir right now. Lockless callers
        # (run_chain, direct write_partitioned) must not sweep siblings
        # — they could rmtree a LIVE concurrent writer's staging.
        parent = os.path.dirname(os.path.abspath(out_dir)) or "."
        prefix = os.path.basename(out_dir) + ".tmp"
        for name in os.listdir(parent):
            if name.startswith(prefix):
                shutil.rmtree(os.path.join(parent, name),
                              ignore_errors=True)
        manifest = write_partitioned(
            build_fn(), out_dir, key=key, num_buckets=num_buckets,
            inputs=inputs, params=params,
        )
    return ray.data.read_parquet(out_dir), manifest


def manifest_digest(m: dict) -> str:
    """Stable digest of a manifest's CONTENT identity (inputs, params,
    key, buckets, row counts) — deliberately excluding ``completed_at``
    and write metrics, so a byte-identical rebuild of an upstream stage
    does NOT invalidate downstream checkpoints while any content change
    does. This is the value a downstream stage folds into its own params
    to form the multi-stage chain."""
    import hashlib

    payload = json.dumps(
        {k: m.get(k) for k in ("inputs", "params", "key", "num_buckets",
                               "buckets", "row_count")},
        sort_keys=True)
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


def run_chain(stages):
    """Multi-stage checkpointed pipeline — the chain extension of
    :func:`run_stage`: each stage's manifest folds the UPSTREAM stage's
    :func:`manifest_digest` into its params, so a rerun after a kill
    resumes from the first stage whose checkpoint is absent or stale and
    reads (never recomputes) every complete stage before it; a
    content-changed upstream transitively invalidates everything below.

    ``stages``: list of dicts with keys ``name``, ``out_dir``, ``key``,
    ``num_buckets``, ``build`` (callable ``upstream_ds|None ->
    Dataset``), optional ``inputs`` (external files to fingerprint) and
    ``params``. Returns ``(final_ds, results)`` where each result is
    ``{"name", "manifest", "hit"}`` (hit = checkpoint read, no
    recompute)."""
    upstream_ds = None
    upstream_digest = None
    results = []
    for st in stages:
        params = dict(st.get("params") or {})
        if upstream_digest is not None:
            params["__upstream"] = upstream_digest
        out_dir = st["out_dir"]
        current = {
            "inputs": fingerprint_inputs(st.get("inputs", ())),
            "params": params,
            "key": st["key"],
            "num_buckets": st["num_buckets"],
        }
        m = _load_manifest(out_dir)
        if m is not None and all(m.get(k) == v for k, v in current.items()):
            hit = True
        else:
            m = write_partitioned(
                st["build"](upstream_ds), out_dir, key=st["key"],
                num_buckets=st["num_buckets"],
                inputs=st.get("inputs", ()), params=params)
            hit = False
        ds = ray.data.read_parquet(out_dir)
        part = m.get("partition_col", "bucket")
        if part in (ds.schema().names if ds.schema() else []):
            # the layout column is lineage plumbing, not stage output
            ds = ds.drop_columns([part])
        results.append({"name": st["name"], "manifest": m, "hit": hit})
        upstream_ds = ds
        upstream_digest = manifest_digest(m)
    return upstream_ds, results


def missing_buckets(out_dir: str, num_buckets: int) -> list[int]:
    """Buckets whose directory is absent (e.g. after a partial failure)."""
    have = set()
    if os.path.exists(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("bucket="):
                have.add(int(name.split("=", 1)[1]))
    return [b for b in range(num_buckets) if b not in have]


def resume_missing_buckets(ds, out_dir: str, *, key: str, num_buckets: int):
    """Recompute ONLY the missing buckets of a partially-written lake:
    filter the input to rows hashing into missing buckets (deterministic
    bucketing) and append their partitions. Returns the list recomputed.

    Hash-bucket lakes only: a data-derived partition layout (e.g.
    ``shard_id=K/`` from a global prefix sum) is NOT per-partition
    recomputable from the inputs — rerun that stage instead (its manifest
    makes an unchanged rerun a skip)."""
    m = _load_manifest(out_dir)
    if m is not None and m.get("partition_col", "bucket") != "bucket":
        raise ValueError(
            f"resume_missing_buckets requires a hash-bucket lake; "
            f"{out_dir} is partitioned by {m['partition_col']!r}"
        )
    todo = missing_buckets(out_dir, num_buckets)
    if not todo:
        return []
    todo_set = set(todo)
    bucketed = add_bucket_column(ds, key, num_buckets, name="bucket")
    subset = bucketed.map_batches(
        lambda t: t.filter(
            pc.is_in(t.column("bucket"), value_set=pa.array(sorted(todo_set)))
        ),
        batch_format="pyarrow",
    )
    subset.write_parquet(out_dir, partition_cols=["bucket"])
    return todo
