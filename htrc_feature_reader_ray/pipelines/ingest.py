"""Bulk-fetch ingestion driver: id manifest -> fetch fan-out -> pages lake.

Closes the last two SURVEY §2.1 rows. Reference analogs:

- ``utils.py:80-204`` (``download_file``): a list of ids becomes an rsync
  ``--files-from`` manifest fanned out against a remote tree. Here the
  network is INJECTED (a resolver built by ``resolver_factory`` — usually
  ``FetchResolver(fetch_fn)``; tests bind a dict-backed fake, production
  binds an HTTP client) and the fan-out is an actor-pool ``map_batches``
  stage: one warmed fetcher per actor, ids streamed through in batches.
- ``utils.py:24-36`` (``files_available``): the pre-check "which of these
  ids already exist" — here answered against a local volume tree (or any
  resolver exposing a filesystem ``path_for``) instead of a sidecar HTTP
  API.

Output is the hash-bucketed pages lake (``out_dir/bucket=K/`` parquet, the
``state/lineage`` layout) with PER-BUCKET skip-complete resume: each bucket
directory is committed atomically together with a sidecar manifest under
``out_dir/_fetch/`` recording that bucket's id-set fingerprint and failure
count. A rerun after a kill (or after transient fetch failures with
``on_error='skip'``) re-fetches ONLY buckets that are absent, fingerprint-
stale, or carried failures — completed buckets are never re-fetched and
never re-read.

Scale shape: the id manifest is the only driver-visible data and only as a
per-bucket (count, hash-sum) fingerprint fold (≤ num_buckets rows); ids and
fetched documents stream through the actor pool; each bucket's parse+write
runs in its own shuffle-group task, so resume granularity == write
parallelism == ``num_buckets`` (size it to the cluster: ids/bucket should
fit one task's heap — at 10¹²-doc scale that means 10⁵-10⁶ buckets, and the
fingerprint fold is still tiny)."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

FETCH_DIR = "_fetch"
MANIFEST = "_MANIFEST.json"

#: token-row schema of the pages lake (parse_volume_batch's output)
_LAKE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("section", pa.string()),
    ("token", pa.string()),
    ("pos", pa.string()),
    ("count", pa.int64()),
])


def _ids_dataset(ids):
    import ray.data

    if hasattr(ids, "map_batches"):
        return ids
    return ray.data.from_arrow(
        pa.table({"url": pa.array(list(ids), type=pa.string())}))


def _hash32(urls: np.ndarray) -> np.ndarray:
    from htrc_feature_reader_ray.functions.ids import stable_hash64

    return (stable_hash64(urls) % np.uint64(1 << 32)).astype(np.int64)


def _bucket_fingerprints(ids_ds, num_buckets: int) -> pd.DataFrame:
    """Per-bucket (n_ids, ids_hsum) — an order-independent id-set
    fingerprint computed distributed (per-batch partials, tiny driver
    fold; hsum = Σ hash32(id) fits int64 up to ~2³¹ ids/bucket)."""
    from htrc_feature_reader_ray.functions.ids import hash_bucket

    def partial(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_numpy(zero_copy_only=False)
        b = hash_bucket(urls, num_buckets)
        h = _hash32(urls)
        n = np.bincount(b, minlength=num_buckets)
        # accumulate hsum in int64 (np.add.at), NOT bincount weights:
        # bincount sums in float64, which goes inexact past 2^53 per
        # bucket-batch and would never match write_bucket's exact int64
        # sum — silently degrading skip-complete resume to full refetch
        hs = np.zeros(num_buckets, dtype=np.int64)
        np.add.at(hs, b, h)
        keep = n > 0
        return pa.table({
            "bucket": pa.array(np.nonzero(keep)[0].astype(np.int64)),
            "n": pa.array(n[keep].astype(np.int64)),
            "hsum": pa.array(hs[keep]),
        })

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    # fold the per-batch partials THROUGH one small bucket-keyed
    # exchange before the driver sees them: the driver then reads at
    # most num_buckets rows even for a 10⁹-id manifest (a raw collect
    # of partials would scale with batch count × touched buckets)
    folded = bucketed_aggregate(
        ids_ds.map_batches(partial, batch_format="pyarrow"),
        ["bucket"], {"n": ("n", "sum"), "hsum": ("hsum", "sum")},
        num_buckets=max(1, min(64, num_buckets)),
    ).to_pandas()
    if folded.empty or "bucket" not in folded.columns:
        return pd.DataFrame({"n": [], "hsum": []})
    return folded.set_index("bucket")[["n", "hsum"]]


def _bucket_manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, FETCH_DIR, f"bucket-{bucket:05d}.json")


def _load_bucket_manifest(out_dir: str, bucket: int) -> dict | None:
    p = _bucket_manifest_path(out_dir, bucket)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fetch_to_lake(ids, resolver_factory, out_dir: str, *,
                  num_buckets: int = 16, batch_size: int = 64,
                  concurrency=(1, 4), on_error: str = "skip",
                  params: dict | None = None) -> dict:
    """Fetch every id in the manifest into the pages lake, resumably.

    ``ids``: list/array of url strings or a Dataset with a ``url`` column
    (ids must be UNIQUE — a fetch manifest is a set, like rsync's
    ``--files-from``). ``resolver_factory``: zero-arg callable returning
    an object with ``open(url) -> nested volume dict`` (``FetchResolver``,
    ``TreeResolver``, ``CachedResolver`` compositions) — constructed ONCE
    PER ACTOR. ``on_error``: 'skip' records failed ids in the bucket
    manifest and keeps streaming (the bucket stays incomplete, so the
    next run retries exactly those buckets); 'raise' fails the run.

    Returns a summary dict; the durable state is the lake plus
    ``out_dir/_fetch/bucket-K.json`` sidecars and a global
    ``_MANIFEST.json`` refreshed each run."""
    import ray.data

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    t0 = time.time()
    prior = None
    gp0 = os.path.join(out_dir, MANIFEST)
    if os.path.exists(gp0):
        with open(gp0) as f:
            prior = json.load(f)
        if prior.get("num_buckets") not in (None, num_buckets):
            raise ValueError(
                f"out_dir {out_dir!r} holds a lake with num_buckets="
                f"{prior['num_buckets']}; resuming with num_buckets="
                f"{num_buckets} would silently mix bucket layouts — "
                "use a fresh out_dir or the recorded num_buckets")
    ids_ds = _ids_dataset(ids)
    want = _bucket_fingerprints(ids_ds, num_buckets)

    # reconcile buckets that DROPPED OUT of the id manifest: a bucket
    # whose whole id-set left is neither pending nor skipped, so its
    # bucket=K parquet + sidecar would linger as phantom rows for any
    # out_dir scan while _MANIFEST.json totals exclude it
    removed = []
    if os.path.isdir(out_dir):
        import re
        import shutil

        wanted = set(int(b) for b in want.index)
        for name in os.listdir(out_dir):
            m = re.fullmatch(r"bucket=(\d+)", name)
            if m and int(m.group(1)) not in wanted:
                b = int(m.group(1))
                shutil.rmtree(os.path.join(out_dir, name))
                sp = _bucket_manifest_path(out_dir, b)
                if os.path.exists(sp):
                    os.remove(sp)
                removed.append(b)
        fdir = os.path.join(out_dir, FETCH_DIR)
        if os.path.isdir(fdir):
            for name in os.listdir(fdir):
                m = re.fullmatch(r"bucket-(\d+)\.json", name)
                if m and int(m.group(1)) not in wanted:
                    os.remove(os.path.join(fdir, name))
                    removed.append(int(m.group(1)))

    pending, skipped = [], []
    for b, row in want.iterrows():
        m = _load_bucket_manifest(out_dir, int(b))
        if (m is not None and m.get("n_ids") == int(row["n"])
                and m.get("ids_hsum") == int(row["hsum"])
                and m.get("n_failed") == 0
                and os.path.isdir(os.path.join(out_dir, f"bucket={int(b)}"))):
            skipped.append(int(b))
        else:
            pending.append(int(b))

    summary_rows = []
    if pending:
        from htrc_feature_reader_ray.stages.partition import (
            add_bucket_column,
        )

        bucketed = add_bucket_column(ids_ds, "url", num_buckets,
                                     name="bucket")
        subset = bucketed.map_batches(
            lambda t: t.filter(pc.is_in(
                t.column("bucket"), value_set=pa.array(sorted(pending)))),
            batch_format="pyarrow",
        )

        class _Fetch:
            """One resolver per actor; ids in, (url, bucket, ok, doc) out."""

            def __init__(self) -> None:
                self.resolver = resolver_factory()

            def __call__(self, t: pa.Table) -> pa.Table:
                urls = t.column("url").to_pylist()
                buckets = t.column("bucket").to_pylist()
                oks, docs = [], []
                for url in urls:
                    try:
                        docs.append(json.dumps(self.resolver.open(url)))
                        oks.append(1)
                    except Exception:
                        if on_error == "raise":
                            raise
                        docs.append("")
                        oks.append(0)
                return pa.table({
                    "url": pa.array(urls, type=pa.string()),
                    "bucket": pa.array(buckets, type=pa.int64()),
                    "ok": pa.array(oks, type=pa.int64()),
                    "doc": pa.array(docs, type=pa.string()),
                })

        fetched = subset.map_batches(
            _Fetch, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
        )

        def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
            from htrc_feature_reader_ray.sources.jsonvol import (
                parse_volume_batch,
            )

            b = int(df["bucket"].iloc[0])
            okd = df[df["ok"] == 1]
            failed = sorted(df.loc[df["ok"] == 0, "url"].tolist())
            rows = parse_volume_batch(
                pa.table({"doc": pa.array(okd["doc"].tolist(),
                                          type=pa.string())}))
            rows = rows.cast(_LAKE_SCHEMA).sort_by(
                [(c, "ascending") for c in
                 ("url", "warc_ts", "section", "token", "pos")])
            bdir = os.path.join(out_dir, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            data = os.path.join(bdir, "part-0.parquet")
            pq.write_table(rows, data + ".tmp")
            os.replace(data + ".tmp", data)
            urls_np = df["url"].to_numpy()
            manifest = {
                "bucket": b,
                "n_ids": int(len(df)),
                "ids_hsum": int(_hash32(urls_np).sum()),
                "n_ok": int(len(okd)),
                "n_failed": len(failed),
                "failed_ids": failed,
                "n_rows": rows.num_rows,
                "completed_at": time.time(),
            }
            mp = _bucket_manifest_path(out_dir, b)
            os.makedirs(os.path.dirname(mp), exist_ok=True)
            with open(mp + ".tmp", "w") as f:
                json.dump(manifest, f, sort_keys=True)
            os.replace(mp + ".tmp", mp)  # manifest LAST = commit point
            return pd.DataFrame({
                "bucket": [b], "n_ids": [manifest["n_ids"]],
                "n_ok": [manifest["n_ok"]],
                "n_failed": [manifest["n_failed"]],
                "n_rows": [manifest["n_rows"]],
            })

        summary = (fetched.groupby("bucket")
                   .map_groups(write_bucket, batch_format="pandas")
                   .to_pandas())
        summary_rows = summary.to_dict("records")

    # global manifest = union of per-bucket sidecars (metadata-sized)
    buckets: dict = {}
    for b in sorted(set(pending) | set(skipped)):
        m = _load_bucket_manifest(out_dir, b)
        if m is not None:
            buckets[str(b)] = {k: m[k] for k in
                               ("n_ids", "n_ok", "n_failed", "n_rows")}
    os.makedirs(out_dir, exist_ok=True)
    global_manifest = {
        "num_buckets": num_buckets,
        "params": params or {},
        "buckets": buckets,
        "n_ids": int(sum(v["n_ids"] for v in buckets.values())),
        "n_ok": int(sum(v["n_ok"] for v in buckets.values())),
        "n_failed": int(sum(v["n_failed"] for v in buckets.values())),
        "row_count": int(sum(v["n_rows"] for v in buckets.values())),
        "completed_at": time.time(),
    }
    gp = os.path.join(out_dir, MANIFEST)
    with open(gp + ".tmp", "w") as f:
        json.dump(global_manifest, f, indent=1, sort_keys=True)
    os.replace(gp + ".tmp", gp)

    return {
        "out_dir": out_dir,
        "fetched_buckets": sorted(pending),
        "skipped_buckets": sorted(skipped),
        "removed_buckets": sorted(set(removed)),
        "n_ids": global_manifest["n_ids"],
        "n_ok": global_manifest["n_ok"],
        "n_failed": global_manifest["n_failed"],
        "row_count": global_manifest["row_count"],
        "sec": round(time.time() - t0, 3),
    }


def files_available(ids, resolver, *, batch_size: int = 256,
                    concurrency=(1, 4)):
    """Existence pre-check for an id manifest against a volume tree —
    the reference's ``files_available`` (utils.py:24-36) with the sidecar
    HTTP API replaced by the resolver's own ``path_for`` (TreeResolver /
    CachedResolver; anything whose paths are real files).

    list in -> dict[id, bool] out (the reference's shape); Dataset in ->
    Dataset (url, available) out, probed by an actor pool holding one
    resolver per actor (the 10⁹-id path)."""
    path_for = getattr(resolver, "path_for", None)
    if path_for is None or str(path_for("x")).startswith("fetch://"):
        raise ValueError(
            "files_available needs a resolver with filesystem paths "
            "(TreeResolver/CachedResolver); a FetchResolver has no "
            "existence check short of fetching")

    if not hasattr(ids, "map_batches"):
        return {u: os.path.exists(resolver.path_for(u)) for u in ids}

    class _Probe:
        def __init__(self) -> None:
            self.resolver = resolver

        def __call__(self, t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pylist()
            av = [os.path.exists(self.resolver.path_for(u)) for u in urls]
            return pa.table({
                "url": pa.array(urls, type=pa.string()),
                "available": pa.array(av, type=pa.bool_()),
            })

    return ids.map_batches(_Probe, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=concurrency)
