"""Format-conversion conformance: the reference's copy_between_resolvers
matrix (test_resolvers.py:27-119) re-expressed — write lakes / JSON volumes,
read back, assert the tokenlist checksum invariant survives every trip."""

import shutil

import pytest

from htrc_feature_reader_ray.errors import MissingDataError, MissingFieldError
from htrc_feature_reader_ray.pipelines.etl import read_lake, save_feature_lake
from htrc_feature_reader_ray.sources.jsonvol import (
    read_json_volumes,
    volumes_to_json,
)
from htrc_feature_reader_ray.stages.extract import tokens_from_pages
from htrc_feature_reader_ray.stages.fold import fold_tokenlist

OUT = "/tmp/graft_test_etl"


def setup_module(mod):
    shutil.rmtree(OUT, ignore_errors=True)


@pytest.fixture(scope="module")
def tokens(sf_dir):
    return tokens_from_pages(sf_dir, via_html=False).materialize()


@pytest.fixture(scope="module")
def checksum(tokens):
    return int(tokens.to_pandas()["count"].sum())


def test_lake_roundtrip_checksum(sf_dir, checksum):
    save_feature_lake(sf_dir, f"{OUT}/full", num_buckets=4)
    back = read_lake(f"{OUT}/full", "tokens")
    assert int(back.to_pandas()["count"].sum()) == checksum
    # sections/chars/meta present and keyed
    meta = read_lake(f"{OUT}/full", "meta").to_pandas()
    assert meta["n_snapshots"].sum() == sum(1 + d % 3 for d in range(500))
    with pytest.raises(MissingDataError):
        read_lake(f"{OUT}/full", "nope")


def test_folded_lake_partial_schema(sf_dir, checksum):
    """A case+pos-folded lake (partialparq analog) keeps the checksum and
    raises MissingFieldError for foldings needing dropped levels."""
    save_feature_lake(
        sf_dir, f"{OUT}/folded",
        token_kwargs=dict(case=False, pos=False, section="group"),
        num_buckets=4, tables=("tokens",),
    )
    back = read_lake(f"{OUT}/folded", "tokens")
    assert int(back.to_pandas()["count"].sum()) == checksum
    # folding on the already-folded lake works on remaining levels
    refold = fold_tokenlist(back, snapshots=False, section="ignore",
                            case=False, pos=False).to_pandas()
    assert int(refold["count"].sum()) == checksum
    # requesting a dropped level raises
    with pytest.raises(MissingFieldError):
        fold_tokenlist(back, case=True, pos=False)
    with pytest.raises(MissingFieldError):
        fold_tokenlist(back, case=False, pos=True)


def test_chunked_lake_first_class(sf_dir, checksum):
    """chunkedparq analog: persist a chunk-level tokenlist; re-read and fold
    with chunk treated as the snapshot level (feature_reader.py:676-681)."""
    save_feature_lake(
        sf_dir, f"{OUT}/chunked",
        token_kwargs=dict(chunk_target=40, section="group", case=True,
                          pos=False),
        num_buckets=4, tables=("tokens",),
    )
    back = read_lake(f"{OUT}/chunked", "tokens")
    df = back.to_pandas()
    assert {"url", "chunk", "token", "count"} <= set(df.columns)
    assert "warc_ts" not in df.columns
    assert int(df["count"].sum()) == checksum
    refold = fold_tokenlist(
        back, snapshot_col="chunk", section="ignore", pos=False
    ).to_pandas()
    assert int(refold["count"].sum()) == checksum
    with pytest.raises(MissingFieldError):
        fold_tokenlist(back, pos=True, snapshot_col="chunk")


@pytest.mark.parametrize("codec", [None, "gz", "bz2"])
def test_json_volume_roundtrip(sf_dir, tokens, checksum, codec):
    """{jsonl} x {None, gz, bz2} codec matrix — the reference's resolver
    compression round-trip analog (test_resolvers.py:27-119)."""
    out = f"{OUT}/json_{codec or 'plain'}"
    manifest = volumes_to_json(tokens, out, num_buckets=4, codec=codec)
    assert manifest["n_docs"].sum() > 0
    import os
    ext = {None: ".jsonl", "gz": ".jsonl.gz", "bz2": ".jsonl.bz2"}[codec]
    assert all(p.endswith(ext) for p in manifest["path"])
    assert all(os.path.exists(p) for p in manifest["path"])
    back = read_json_volumes(out)  # codec auto-detected from suffix
    df = back.to_pandas()
    assert int(df["count"].sum()) == checksum
    # exact row-level equality after sorting
    orig = tokens.to_pandas()
    key = ["url", "warc_ts", "section", "token", "pos"]
    a = orig.sort_values(key).reset_index(drop=True)
    b = df.sort_values(key).reset_index(drop=True)[a.columns]
    assert a["count"].equals(b["count"])
    assert (a["token"] == b["token"]).all()


def test_lake_rerun_resumes(sf_dir):
    """Second save with identical inputs recomputes nothing (manifest hit)."""
    m1 = save_feature_lake(sf_dir, f"{OUT}/resume", num_buckets=4,
                           tables=("tokens",))
    t1 = m1["tokens"]["completed_at"]
    m2 = save_feature_lake(sf_dir, f"{OUT}/resume", num_buckets=4,
                           tables=("tokens",))
    assert m2["tokens"]["completed_at"] == t1


@pytest.mark.parametrize("codec", [None, "gz"])
def test_json_volume_tree_roundtrip_and_resolver(sf_dir, tokens, checksum, codec):
    """Stubbytree one-file-per-url layout: bulk read-back equals the source,
    and TreeResolver random access returns the exact per-url doc."""
    from htrc_feature_reader_ray.errors import MissingDataError
    from htrc_feature_reader_ray.sources.jsonvol import (
        TreeResolver,
        volumes_to_json_tree,
    )

    out = f"{OUT}/tree_{codec or 'plain'}"
    manifest = volumes_to_json_tree(tokens, out, num_buckets=4, codec=codec)
    assert len(manifest) == tokens.to_pandas()["url"].nunique()
    back = read_json_volumes(out).to_pandas()
    assert int(back["count"].sum()) == checksum

    res = TreeResolver(out, codec=codec)
    url = manifest["url"].iloc[0]
    doc = res.open(url)
    assert doc["url"] == url
    assert res.path_for(url) == manifest["path"].iloc[0]
    with pytest.raises(MissingDataError):
        res.open("http://nope.example/xyz")


def test_cached_resolver_read_through(sf_dir, tokens):
    """caching.py analog: miss in preferred -> copy from fallback (with
    codec re-encode) -> subsequent opens hit the preferred tree."""
    import os
    from htrc_feature_reader_ray.errors import MissingDataError
    from htrc_feature_reader_ray.sources.jsonvol import (
        CachedResolver,
        TreeResolver,
        volumes_to_json_tree,
    )

    fallback_dir = f"{OUT}/cache_fallback"
    preferred_dir = f"{OUT}/cache_preferred"
    manifest = volumes_to_json_tree(tokens, fallback_dir, num_buckets=4,
                                    codec="gz")
    url = manifest["url"].iloc[0]
    res = CachedResolver(
        TreeResolver(preferred_dir, codec=None),
        TreeResolver(fallback_dir, codec="gz"),
    )
    assert not os.path.exists(res.path_for(url))
    doc = res.open(url)  # miss -> copies (and gz -> plain re-encode)
    assert doc["url"] == url
    assert os.path.exists(res.path_for(url))
    # second open served from preferred (delete fallback to prove it)
    os.remove(TreeResolver(fallback_dir, codec="gz").path_for(url))
    assert res.open(url)["url"] == url
    with pytest.raises(MissingDataError):
        res.open("http://missing.example/x")


@pytest.mark.parametrize("codec", [None, "gz", "bz2"])
@pytest.mark.parametrize(
    "schema, begin_key, end_key",
    [
        ("graft-1.0", "beginCharCount", "endCharCount"),
        ("3.0", "beginCharCounts", "endCharCount"),  # the asymmetric pair
        ("2.0", "beginLineChars", "endLineChars"),   # pre-3.0 fallback
    ],
)
def test_line_char_schema_codec_roundtrip_matrix(
        sf_dir, codec, schema, begin_key, end_key):
    """codec x SCHEMA-SPELLING round-trip matrix for line chars — the
    reference's 3-way key branch (parsers.py:397-402): each schema
    version writes its own begin/end JSON key spelling and the per-doc
    switch in parse_line_chars_batch reads every variant back, so a
    migrating user's pre-3.0 EF files (beginLineChars/endLineChars)
    parse alongside native ones."""
    import glob
    import gzip as _gzip
    import bz2 as _bz2

    from htrc_feature_reader_ray.sources.jsonvol import (
        line_chars_to_json,
        read_json_line_chars,
    )
    from htrc_feature_reader_ray.sources.pages import read_pages
    from htrc_feature_reader_ray.stages.extract import (
        extract_pages,
        line_chars,
    )

    lc = line_chars(extract_pages(read_pages(sf_dir, drop_text=True)))
    out = f"{OUT}/lc_{schema.replace('.', '_')}_{codec or 'plain'}"
    manifest = line_chars_to_json(lc, out, num_buckets=4, codec=codec,
                                  schema=schema)
    assert manifest["n_docs"].sum() > 0

    # the on-disk JSON really uses this schema's key spelling
    path = sorted(glob.glob(f"{out}/part-*"))[0]
    raw = open(path, "rb").read()
    if codec == "gz":
        raw = _gzip.decompress(raw)
    elif codec == "bz2":
        raw = _bz2.decompress(raw)
    text = raw.decode("utf-8")
    assert begin_key in text and end_key in text
    for other in {"beginCharCount", "beginCharCounts",
                  "beginLineChars"} - {begin_key}:
        # spelling is exclusive per schema (substring-safe check via '"')
        assert f'"{other}"' not in text

    back = read_json_line_chars(out).to_pandas()
    key = ["url", "warc_ts", "section", "place", "char"]
    a = lc.to_pandas().sort_values(key).reset_index(drop=True)
    b = back.sort_values(key).reset_index(drop=True)[a.columns]
    assert len(a) == len(b) and len(a) > 0
    assert a["count"].equals(b["count"])
    assert (a["char"] == b["char"]).all()
    assert set(b["place"]) == {"begin", "end"}


def test_line_char_mixed_schema_lake_parses():
    """One lake mixing all three schema spellings parses row-complete."""
    import json as _json

    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.sources.jsonvol import (
        parse_line_chars_batch,
    )

    def doc(schema, bkey, ekey, url):
        return _json.dumps({
            "url": url, "schemaVersion": schema,
            "snapshots": [{
                "warc_ts": 1_600_000_000_000_000,
                "lineChars": {"body": {bkey: {"a": 2}, ekey: {"z": 1}}},
            }],
        })

    import pyarrow as pa
    docs = pa.table({"doc": pa.array([
        doc("graft-1.0", "beginCharCount", "endCharCount", "u1"),
        doc("3.0", "beginCharCounts", "endCharCount", "u2"),
        doc(None, "beginLineChars", "endLineChars", "u3"),  # schemaless
        doc("1.7-ancient", "beginLineChars", "endLineChars", "u4"),
    ])})
    out = parse_line_chars_batch(docs).to_pandas()
    assert sorted(out["url"].unique()) == ["u1", "u2", "u3", "u4"]
    per = out.groupby("url").size()
    assert (per == 2).all()  # begin + end row for every schema variant
    assert set(out["place"]) == {"begin", "end"}
    assert out.set_index(["url", "place"]).loc[("u3", "begin"), "count"] == 2


def test_fetch_resolver_retry_cache_and_dataset_source(sf_dir, tokens,
                                                       tmp_path):
    """HTTP-shaped resolver matrix without a socket: FetchResolver wraps a
    user fetch_fn (dict-backed fake here), retries transient errors,
    composes as CachedResolver's fallback (read-through: second open
    never fetches), and feeds the actor-pool Dataset source producing
    rows identical to reading the lake directly."""
    import gzip as _gzip
    import json as _json

    from htrc_feature_reader_ray.errors import MissingDataError
    from htrc_feature_reader_ray.sources.jsonvol import (
        CachedResolver,
        FetchResolver,
        TreeResolver,
        parse_volume_batch,
        read_volumes_via_fetch,
        volumes_to_json_tree,
    )

    # a remote "server": the volume tree serialized into a dict, half the
    # payloads gz-compressed to exercise the codec sniff
    tree = f"{tmp_path}/srv"
    manifest = volumes_to_json_tree(tokens, tree, num_buckets=4, codec=None)
    server = {}
    srv_resolver = TreeResolver(tree, codec=None)
    for i, url in enumerate(manifest["url"]):
        raw = _json.dumps(srv_resolver.open(url), sort_keys=True).encode()
        server[url] = _gzip.compress(raw) if i % 2 == 0 else raw

    calls = {"n": 0, "fail_first": set(server)}

    def fetch_fn(url):
        calls["n"] += 1
        if url in calls["fail_first"]:
            calls["fail_first"].discard(url)  # transient: fails ONCE
            raise ConnectionError("flaky")
        if url not in server:
            raise KeyError(url)
        return server[url]

    # retry: first attempt fails, second succeeds
    fr = FetchResolver(fetch_fn, attempts=3)
    some_url = next(iter(server))
    doc = fr.open(some_url)
    assert doc["url"] == some_url
    # a truly-absent url exhausts attempts -> MissingDataError
    with pytest.raises(MissingDataError):
        fr.open("https://nowhere.example.com/gone")

    # read-through cache composition: miss fetches + persists, second
    # open serves locally (no new fetch calls)
    local = TreeResolver(f"{tmp_path}/cache", codec="gz")
    cached = CachedResolver(local, FetchResolver(fetch_fn, attempts=3))
    url2 = sorted(server)[1]
    doc2 = cached.open(url2)
    n_after_miss = calls["n"]
    assert cached.open(url2) == doc2  # hit: served from the local tree
    assert calls["n"] == n_after_miss

    # Dataset source through the actor pool == reading the tree directly
    calls["fail_first"] = set(server)  # every url flaky once: retry path
    got = (read_volumes_via_fetch(
        sorted(server), lambda: FetchResolver(fetch_fn, attempts=3),
        concurrency=(1, 2), batch_size=16)
        .to_pandas())
    want = tokens.to_pandas()
    key = ["url", "warc_ts", "section", "token", "pos"]
    a = want.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)[a.columns]
    assert a["count"].equals(b["count"]) and len(a) == len(b)

    # on_error='skip' drops a dead url instead of killing the stream
    urls = sorted(server) + ["https://dead.example.com/x"]
    calls["fail_first"] = set()
    skipped = read_volumes_via_fetch(
        urls, lambda: FetchResolver(fetch_fn, attempts=2),
        on_error="skip", concurrency=(1, 2)).to_pandas()
    assert len(skipped) == len(a)
    with pytest.raises(Exception):
        read_volumes_via_fetch(
            urls, lambda: FetchResolver(fetch_fn, attempts=2),
            on_error="raise", concurrency=(1, 2)).to_pandas()


def test_read_lake_entity_bucket_pruning(sf_dir):
    """Single-entity read opens exactly ONE bucket dir (the lake analog
    of TreeResolver.path_for random access) and equals the full-scan
    filter; the pruned Dataset feeds term_snapshot_matrix unchanged."""
    import os

    import pandas as pd

    from htrc_feature_reader_ray.functions.ids import hash_bucket
    from htrc_feature_reader_ray.pipelines.etl import read_lake_entity
    from htrc_feature_reader_ray.stages.fold import term_snapshot_matrix

    lake = f"{OUT}/full"
    if not os.path.isdir(os.path.join(lake, "tokens")):
        save_feature_lake(sf_dir, lake, num_buckets=4)

    full = read_lake(lake, "tokens").to_pandas()
    url = full["url"].iloc[0]

    # pruning really happened: the routing helper picks exactly the
    # url's hash bucket (map_batches lineage hides input_files, so pin
    # the dir choice directly)
    from htrc_feature_reader_ray.pipelines.etl import _entity_bucket_dir

    b = int(hash_bucket([url], 4)[0])
    bdir = _entity_bucket_dir(os.path.join(lake, "tokens"), url)
    assert bdir is not None and bdir.endswith(f"bucket={b}")
    assert os.path.isdir(bdir)

    ent = read_lake_entity(lake, "tokens", url)

    got = (ent.to_pandas()
           .sort_values(["url", "warc_ts", "section", "token", "pos"])
           .reset_index(drop=True))
    want = (full[full["url"] == url]
            .drop(columns=[c for c in ("bucket",) if c in full.columns])
            .sort_values(["url", "warc_ts", "section", "token", "pos"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # and the per-entity pivot over the pruned read equals the pivot
    # over the full-scan filter
    m1 = term_snapshot_matrix(ent, url)
    m2 = term_snapshot_matrix(read_lake(lake, "tokens"), url)
    pd.testing.assert_frame_equal(m1, m2)

    # a url absent from the lake -> typed empty on the pruned path too
    none = read_lake_entity(lake, "tokens", "https://no.such/url")
    assert none.count() == 0
