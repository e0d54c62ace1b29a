"""Resumable bulk ingestion: id manifest → fetch fan-out → pages lake.

The reference workflow this replaces is ``utils.download_file`` (an rsync
``--files-from`` manifest against a remote tree) followed by ad-hoc rerun
scripts when the transfer died. Here the fetch is an actor-pool stage over
an injected resolver, the lake commits per bucket, and a rerun — after a
kill, transient failures, or an id-list change — fetches ONLY the buckets
that are absent, stale, or carried failures.

This demo runs entirely offline: a local volume tree stands in for the
remote endpoint, and a flaky fetcher (fails a chosen id once) shows the
record-and-heal cycle.

Run: python examples/ingest_resume.py [workdir]
"""

import json
import os
import sys


def ingest_with_resume(workdir: str, n_ids: int = 24) -> dict:
    from htrc_feature_reader_ray.pipelines.ingest import (
        fetch_to_lake,
        files_available,
    )
    from htrc_feature_reader_ray.sources.jsonvol import (
        SCHEMA_VERSION,
        FetchResolver,
        TreeResolver,
    )

    ids = [f"https://site{i % 5}.example.com/page/{i}" for i in range(n_ids)]

    # 1. lay the offline stand-in for the remote endpoint
    tree = TreeResolver(os.path.join(workdir, "srctree"), codec=None)
    for i, u in enumerate(ids):
        doc = {"url": u, "schemaVersion": SCHEMA_VERSION,
               "snapshots": [{"warc_ts": 1_600_000_000_000_000 + i,
                              "tokenPosCount": {
                                  "body": {f"w{i % 7}": {"NN": 1 + i % 3}},
                              }}]}
        p = tree.path_for(u)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(json.dumps(doc).encode())

    # 2. pre-check the manifest (files_available shape: dict of bools)
    avail = files_available(ids, tree)
    assert all(avail.values())

    # 3. first run with a fetcher that fails ONE id (transient error)
    bad = ids[7]
    marker = os.path.join(workdir, "flaky")
    open(marker, "w").close()

    def flaky_fetch(url: str) -> bytes:
        if url == bad and os.path.exists(marker):
            raise IOError("transient")
        with open(tree.path_for(url), "rb") as f:
            return f.read()

    lake = os.path.join(workdir, "lake")
    s1 = fetch_to_lake(ids, lambda: FetchResolver(flaky_fetch, attempts=1),
                       lake, num_buckets=6, on_error="skip")

    # 4. heal and rerun: only the failed id's bucket is re-fetched
    os.remove(marker)
    s2 = fetch_to_lake(ids, lambda: FetchResolver(flaky_fetch, attempts=1),
                       lake, num_buckets=6, on_error="skip")

    # 5. a third run is a full skip (every bucket complete)
    s3 = fetch_to_lake(ids, lambda: FetchResolver(flaky_fetch, attempts=1),
                       lake, num_buckets=6, on_error="skip")

    import ray.data

    rows = ray.data.read_parquet(lake).count()
    return {
        "n_ids": len(ids),
        "run1_failed": s1["n_failed"],
        "run2_refetched_buckets": s2["fetched_buckets"],
        "run3_refetched_buckets": s3["fetched_buckets"],
        "lake_rows": rows,
    }


def main(workdir: str) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    return ingest_with_resume(workdir)


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    out = main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ingest_demo")
    print(json.dumps(out, sort_keys=True))
