"""Bulk-fetch ingestion driver: manifest -> fetch fan-out -> pages lake
with per-bucket skip-complete resume (reference utils.py:80-204
download_file + utils.py:24-36 files_available, network injected)."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray

from htrc_feature_reader_ray.pipelines.ingest import (
    fetch_to_lake,
    files_available,
)
from htrc_feature_reader_ray.sources.jsonvol import (
    SCHEMA_VERSION,
    FetchResolver,
    TreeResolver,
    parse_volume_batch,
)

IDS = [f"https://site{i % 7}.example.com/page/{i}" for i in range(20)]


def _mkdoc(url):
    n = int(url.rsplit("/", 1)[1])
    return {
        "url": url,
        "schemaVersion": SCHEMA_VERSION,
        "snapshots": [{
            "warc_ts": 1_600_000_000_000_000 + n * 1_000_000,
            "tokenPosCount": {
                "body": {f"tok{j}": {"NN": j + 1} for j in range(1 + n % 3)},
                "header": {"hdr": {"NN": 1}},
            },
        }],
    }


STORE = {u: json.dumps(_mkdoc(u)).encode() for u in IDS}


def _factory(log_path, fail_marker=None, fail_ids=()):
    """Resolver factory whose fetch_fn logs every call to a shared file
    (observable across Ray actors) and fails for fail_ids while the
    fail_marker file exists (heal by deleting it)."""
    fail_ids = set(fail_ids)

    def fetch(url: str) -> bytes:
        with open(log_path, "a") as f:
            f.write(url + "\n")
        if url in fail_ids and fail_marker and os.path.exists(fail_marker):
            raise IOError(f"transient failure for {url}")
        return STORE[url]

    return lambda: FetchResolver(fetch, attempts=1)


def _calls(log_path):
    if not os.path.exists(log_path):
        return []
    with open(log_path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _expected_rows(urls):
    t = parse_volume_batch(pa.table({
        "doc": pa.array([json.dumps(_mkdoc(u)) for u in urls])}))
    return (t.to_pandas()
            .sort_values(["url", "warc_ts", "section", "token", "pos"])
            .reset_index(drop=True))


def _lake_rows(out_dir):
    df = ray.data.read_parquet(out_dir).to_pandas()
    df = df.drop(columns=[c for c in ("bucket",) if c in df.columns])
    return (df.sort_values(["url", "warc_ts", "section", "token", "pos"])
            .reset_index(drop=True))


def test_fetch_to_lake_end_to_end_and_skip_complete(tmp_path):
    out = str(tmp_path / "lake")
    log = str(tmp_path / "calls.txt")

    s1 = fetch_to_lake(IDS, _factory(log), out, num_buckets=8,
                       batch_size=4, concurrency=(1, 2))
    assert s1["n_ok"] == 20 and s1["n_failed"] == 0
    assert sorted(_calls(log)) == sorted(IDS)  # each id fetched once
    pd.testing.assert_frame_equal(_lake_rows(out), _expected_rows(IDS))
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m["n_ids"] == 20 and m["row_count"] == len(_expected_rows(IDS))

    # rerun with the SAME manifest: every bucket skip-complete, ZERO fetches
    s2 = fetch_to_lake(IDS, _factory(log), out, num_buckets=8,
                       batch_size=4, concurrency=(1, 2))
    assert s2["fetched_buckets"] == []
    assert len(s2["skipped_buckets"]) == len(s1["fetched_buckets"])
    assert sorted(_calls(log)) == sorted(IDS)  # no new calls


def test_partial_failure_records_and_heals(tmp_path):
    out = str(tmp_path / "lake")
    log = str(tmp_path / "calls.txt")
    marker = str(tmp_path / "failing")
    open(marker, "w").close()
    bad = [IDS[3], IDS[11]]

    s1 = fetch_to_lake(IDS, _factory(log, marker, bad), out,
                       num_buckets=8, batch_size=4, on_error="skip")
    assert s1["n_failed"] == 2
    failed_recorded = []
    for f in os.listdir(os.path.join(out, "_fetch")):
        failed_recorded += json.load(
            open(os.path.join(out, "_fetch", f)))["failed_ids"]
    assert sorted(failed_recorded) == sorted(bad)

    # heal the fetcher; only the buckets that carried failures re-fetch
    os.remove(marker)
    calls_before = len(_calls(log))
    s2 = fetch_to_lake(IDS, _factory(log, marker, bad), out,
                       num_buckets=8, batch_size=4, on_error="skip")
    assert s2["n_failed"] == 0
    refetched = set(_calls(log)[calls_before:])
    from htrc_feature_reader_ray.functions.ids import hash_bucket

    bad_buckets = set(hash_bucket(bad, 8).tolist())
    assert set(s2["fetched_buckets"]) == bad_buckets
    expect_refetch = {u for u in IDS
                      if hash_bucket([u], 8)[0] in bad_buckets}
    assert refetched == expect_refetch  # completed buckets untouched
    pd.testing.assert_frame_equal(_lake_rows(out), _expected_rows(IDS))


def test_kill_mid_run_resume_fetches_only_missing_buckets(tmp_path):
    out = str(tmp_path / "lake")
    log = str(tmp_path / "calls.txt")
    fetch_to_lake(IDS, _factory(log), out, num_buckets=8, batch_size=4)

    # simulate a kill before two buckets committed: remove their data
    # dirs and sidecars (manifest is the commit point, written last)
    import shutil

    from htrc_feature_reader_ray.functions.ids import hash_bucket

    victims = sorted({int(hash_bucket([IDS[0]], 8)[0]),
                      int(hash_bucket([IDS[1]], 8)[0])})
    for b in victims:
        shutil.rmtree(os.path.join(out, f"bucket={b}"))
        os.remove(os.path.join(out, "_fetch", f"bucket-{b:05d}.json"))

    calls_before = len(_calls(log))
    s2 = fetch_to_lake(IDS, _factory(log), out, num_buckets=8, batch_size=4)
    assert s2["fetched_buckets"] == victims
    refetched = set(_calls(log)[calls_before:])
    assert refetched == {u for u in IDS
                         if int(hash_bucket([u], 8)[0]) in set(victims)}
    pd.testing.assert_frame_equal(_lake_rows(out), _expected_rows(IDS))

    # data dir present but sidecar missing -> still incomplete -> refetch
    b0 = victims[0]
    os.remove(os.path.join(out, "_fetch", f"bucket-{b0:05d}.json"))
    s3 = fetch_to_lake(IDS, _factory(log), out, num_buckets=8, batch_size=4)
    assert s3["fetched_buckets"] == [b0]


def test_id_list_change_invalidates_only_touched_buckets(tmp_path):
    out = str(tmp_path / "lake")
    log = str(tmp_path / "calls.txt")
    fetch_to_lake(IDS, _factory(log), out, num_buckets=8, batch_size=4)

    new_ids = IDS + ["https://site9.example.com/page/33"]
    STORE[new_ids[-1]] = json.dumps(_mkdoc(new_ids[-1])).encode()
    calls_before = len(_calls(log))
    s2 = fetch_to_lake(new_ids, _factory(log), out, num_buckets=8,
                       batch_size=4)
    from htrc_feature_reader_ray.functions.ids import hash_bucket

    nb = int(hash_bucket([new_ids[-1]], 8)[0])
    assert s2["fetched_buckets"] == [nb]  # fingerprint-stale bucket only
    refetched = set(_calls(log)[calls_before:])
    assert refetched == {u for u in new_ids
                         if int(hash_bucket([u], 8)[0]) == nb}
    pd.testing.assert_frame_equal(_lake_rows(out), _expected_rows(new_ids))


def test_on_error_raise_propagates(tmp_path):
    out = str(tmp_path / "lake")
    log = str(tmp_path / "calls.txt")
    marker = str(tmp_path / "failing")
    open(marker, "w").close()
    with pytest.raises(Exception):
        fetch_to_lake(IDS, _factory(log, marker, [IDS[5]]), out,
                      num_buckets=8, batch_size=4, on_error="raise")


def test_files_available_tree_and_dataset(tmp_path):
    root = str(tmp_path / "tree")
    tr = TreeResolver(root, codec=None)
    present = IDS[::2]
    for u in present:
        p = tr.path_for(u)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(STORE[u])

    # list in -> dict out (the reference's files_available shape)
    got = files_available(IDS, tr)
    assert got == {u: (u in set(present)) for u in IDS}

    # Dataset in -> Dataset out (the large-manifest path)
    ds = ray.data.from_arrow(pa.table({"url": pa.array(IDS)}))
    df = (files_available(ds, tr).to_pandas()
          .sort_values("url").reset_index(drop=True))
    want = pd.DataFrame({"url": sorted(IDS)})
    want["available"] = want["url"].isin(set(present))
    pd.testing.assert_frame_equal(df, want)

    # a FetchResolver has no existence check -> explicit error
    with pytest.raises(ValueError):
        files_available(IDS, FetchResolver(lambda u: b"{}"))


def test_cli_ingest_and_files_available(tmp_path, capsys):
    from htrc_feature_reader_ray.__main__ import main

    # lay a source tree (the offline stand-in for the rsync endpoint)
    root = str(tmp_path / "srctree")
    tr = TreeResolver(root, codec=None)
    for u in IDS:
        p = tr.path_for(u)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(STORE[u])
    manifest = tmp_path / "ids.txt"
    manifest.write_text("\n".join(IDS) + "\n")

    assert main(["files-available", "--root", root,
                 "--ids-file", str(manifest)]) == 0
    got = json.loads(capsys.readouterr().out.strip())
    assert got == {u: True for u in IDS}

    out = str(tmp_path / "lake")
    assert main(["ingest-lake", "--src-tree", root, "--out", out,
                 "--ids-file", str(manifest), "--num-buckets", "4",
                 "--num-cpus", "4"]) == 0
    s = json.loads(capsys.readouterr().out.strip())
    assert s["n_ok"] == 20 and s["n_failed"] == 0
    pd.testing.assert_frame_equal(_lake_rows(out), _expected_rows(IDS))


def test_dropped_buckets_reconciled_and_num_buckets_mismatch_refused(
        tmp_path):
    out = str(tmp_path / "lake")
    log = str(tmp_path / "calls.txt")
    fetch_to_lake(IDS, _factory(log), out, num_buckets=8, batch_size=4)

    from htrc_feature_reader_ray.functions.ids import hash_bucket

    # shrink the manifest to ids of a single bucket: every OTHER bucket's
    # parquet dir + sidecar must be removed (no phantom rows for readers)
    keep_b = int(hash_bucket([IDS[0]], 8)[0])
    keep = [u for u in IDS if int(hash_bucket([u], 8)[0]) == keep_b]
    s2 = fetch_to_lake(keep, _factory(log), out, num_buckets=8,
                       batch_size=4)
    assert keep_b not in s2["removed_buckets"]
    assert s2["removed_buckets"]  # something was dropped
    assert s2["fetched_buckets"] == []  # surviving bucket skip-complete
    dirs = {d for d in os.listdir(out) if d.startswith("bucket=")}
    assert dirs == {f"bucket={keep_b}"}
    pd.testing.assert_frame_equal(_lake_rows(out), _expected_rows(keep))
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m["n_ids"] == len(keep)

    # resuming into the same out_dir with a different num_buckets would
    # silently mix layouts -> refused
    with pytest.raises(ValueError, match="num_buckets"):
        fetch_to_lake(keep, _factory(log), out, num_buckets=4)


def test_bucket_fingerprint_hsum_is_exact_int64(tmp_path):
    """hsum partials accumulate in int64 (np.add.at), not float64
    bincount weights — per-batch bucket sums past 2^53 stay exact and
    match write_bucket's int64 sum (ADVICE r4)."""
    import numpy as np

    from htrc_feature_reader_ray.pipelines.ingest import (
        _bucket_fingerprints,
        _hash32,
        _ids_dataset,
    )

    # enough ids in ONE bucket that float64 summation of ~2^31-scale
    # hashes would need luck to stay exact; verify exact match instead
    many = [f"https://h.example.com/p/{i}" for i in range(5000)]
    fp = _bucket_fingerprints(_ids_dataset(many), 1)
    exact = int(_hash32(np.array(many, dtype=object)).sum())
    assert int(fp.loc[0, "hsum"]) == exact
    assert int(fp.loc[0, "n"]) == len(many)
