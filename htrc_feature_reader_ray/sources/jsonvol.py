"""Nested-JSON volume ingest — the reference's EF-file path re-expressed.

The reference's primary source is one JSON document per volume with nested
per-page token maps (``{id, features:{pages:[{seq, body:{tokenPosCount:
{token:{pos:count}}}}]}}``, parsers.py:192-250), exploded into a long typed
table by ``_make_tokencount_df`` (parsers.py:342-382). Here:

  * ``volumes_to_json`` serializes a token-count Dataset into that shape —
    one JSON document per url (all snapshots nested), written as a
    hash-bucketed JSONL lake;
  * ``read_json_volumes`` parses it back with a stateless ``map_batches``
    (one ``json.loads`` + nested walk per document — the parse is per-row by
    nature; downstream everything is columnar again).

Round-tripping through this lake is the engine's format-conformance gate
(the test_resolvers.py:27-119 checksum-matrix analog).
"""

from __future__ import annotations

import bz2
import gzip
import json
import os

import pandas as pd
import pyarrow as pa

import ray.data

from htrc_feature_reader_ray.stages.partition import BUCKET_COL, bucketed_map_groups

SCHEMA_VERSION = "graft-1.0"

# codec name -> (filename suffix, compress fn, decompress fn) — the
# resolver-compression matrix analog (resolvers round-trip
# {json, parquet} x {bz2, gz, None}; test_resolvers.py:27-119)
CODECS = {
    None: ("", lambda b: b, lambda b: b),
    "gz": (".gz", gzip.compress, gzip.decompress),
    "bz2": (".bz2", bz2.compress, bz2.decompress),
}


def volumes_to_json(tokens_ds, out_dir: str, *, num_buckets: int = 16,
                    codec: str | None = None) -> pd.DataFrame:
    """Serialize (url, warc_ts, section, token, pos, count) rows into one
    nested JSON document per url, written as a hash-bucketed JSONL lake —
    one ``part-<bucket>.jsonl[.gz|.bz2]`` per bucket, atomic rename per
    file (resumable/idempotent). Returns the (path, n_docs) manifest."""
    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}; one of {sorted(map(str, CODECS))}")
    ext, compress, _ = CODECS[codec]
    os.makedirs(out_dir, exist_ok=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"path": pd.Series(dtype=object),
                 "n_docs": pd.Series(dtype="int64")}
            )
        lines = []
        for url, g in df.groupby("url", sort=True):
            snaps = []
            for ts, gs in g.groupby("warc_ts", sort=True):
                sections: dict = {}
                for (sect, token, pos), gg in gs.groupby(
                    ["section", "token", "pos"], sort=True
                ):
                    sections.setdefault(sect, {}).setdefault(token, {})[pos] = int(
                        gg["count"].sum()
                    )
                snaps.append(
                    {"warc_ts": int(ts.value // 1000), "tokenPosCount": sections}
                )
            doc = {
                "url": url,
                "schemaVersion": SCHEMA_VERSION,
                "snapshots": snaps,
            }
            lines.append(json.dumps(doc, sort_keys=True))
        bucket = int(df[BUCKET_COL].iloc[0])
        path = os.path.join(out_dir, f"part-{bucket:05d}.jsonl{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(compress(("\n".join(lines) + "\n").encode("utf-8")))
        os.replace(tmp, path)  # atomic: partial writes never become visible
        return pd.DataFrame({"path": [path], "n_docs": [len(lines)]})

    manifest = bucketed_map_groups(
        tokens_ds, "url", per_bucket, num_buckets=num_buckets,
        drop_bucket=False,
    )
    return manifest.to_pandas()


def parse_volume_batch(batch: pa.Table) -> pa.Table:
    """One nested JSON doc -> long token rows (the _make_tokencount_df walk).

    Collected into flat Python lists then one Arrow conversion per batch —
    the JSON walk itself is irreducibly per-document (reference hits the same
    wall, README.md:1082's GIL note; here each batch is a separate task)."""
    import warnings

    urls, tss, sects, toks, poss, counts = [], [], [], [], [], []
    for doc_str in batch.column("doc").to_pylist():
        doc = json.loads(doc_str) if isinstance(doc_str, str) else doc_str
        if doc.get("schemaVersion") != SCHEMA_VERSION:
            # tolerate but surface, like the reference's version-mismatch
            # warning (parsers.py:197-202)
            warnings.warn(
                f"jsonvol schema version mismatch: "
                f"{doc.get('schemaVersion')!r} != {SCHEMA_VERSION!r}",
                stacklevel=2,
            )
        url = doc["url"]
        for snap in doc["snapshots"]:
            ts = snap["warc_ts"]
            for sect, tokmap in snap["tokenPosCount"].items():
                for token, posmap in tokmap.items():
                    for pos, count in posmap.items():
                        urls.append(url)
                        tss.append(ts)
                        sects.append(sect)
                        toks.append(token)
                        poss.append(pos)
                        counts.append(count)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "section": pa.array(sects, type=pa.string()),
            "token": pa.array(toks, type=pa.string()),
            "pos": pa.array(poss, type=pa.string()),
            "count": pa.array(counts, type=pa.int64()),
        }
    )


def volumes_to_json_tree(tokens_ds, out_dir: str, *, num_buckets: int = 16,
                         codec: str | None = None,
                         layout: str = "stubbytree") -> pd.DataFrame:
    """One file PER URL under a sharded directory tree — the reference's
    resolver file layout (stubbytree resolvers.py:202-256 / pairtree
    :102-143) as an interchange format: ``<root>/<shard>/<clean-url>.json``.

    Caveat (documented contract): one-file-per-entity is an interchange /
    random-access layout, not the scan layout — at 10^12 urls the metadata
    ops alone dominate. Bulk pipelines use the bucketed JSONL lake
    (:func:`volumes_to_json`); this tree exists for reference-style per-
    volume access via :class:`TreeResolver`. Same nested JSON, same codecs;
    :func:`read_json_volumes` reads either layout (it globs recursively and
    detects codecs by content)."""
    from htrc_feature_reader_ray.functions.ids import clean_id, shard_path

    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}")
    if layout != "stubbytree":
        raise ValueError(f"unknown layout {layout!r} (stubbytree only)")
    ext, compress, _ = CODECS[codec]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        paths = []
        for url, g in df.groupby("url", sort=True):
            snaps = []
            for ts, gs in g.groupby("warc_ts", sort=True):
                sections: dict = {}
                for (sect, token, pos), gg in gs.groupby(
                    ["section", "token", "pos"], sort=True
                ):
                    sections.setdefault(sect, {}).setdefault(token, {})[
                        pos
                    ] = int(gg["count"].sum())
                snaps.append(
                    {"warc_ts": int(ts.value // 1000),
                     "tokenPosCount": sections}
                )
            doc = {"url": url, "schemaVersion": SCHEMA_VERSION,
                   "snapshots": snaps}
            rel = shard_path(url) + ".json" + ext
            path = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(compress(json.dumps(doc, sort_keys=True)
                                 .encode("utf-8")))
            os.replace(tmp, path)
            paths.append({"url": url, "path": path})
        if not paths:
            return pd.DataFrame({"url": pd.Series(dtype=object),
                                 "path": pd.Series(dtype=object)})
        return pd.DataFrame(paths)

    return bucketed_map_groups(
        tokens_ds, "url", per_bucket, num_buckets=num_buckets
    ).to_pandas()


class TreeResolver:
    """Random access into a volume tree — the IdResolver surface
    (resolvers.py:30-100): ``path_for(url)`` and ``open(url)`` -> parsed
    nested doc, any codec."""

    def __init__(self, root: str, *, codec: str | None = None) -> None:
        if codec not in CODECS:
            raise ValueError(f"unknown codec {codec!r}")
        self.root = root
        self.codec = codec

    def path_for(self, url: str) -> str:
        from htrc_feature_reader_ray.functions.ids import shard_path

        ext = CODECS[self.codec][0]
        return os.path.join(self.root, shard_path(url) + ".json" + ext)

    def open(self, url: str) -> dict:
        from htrc_feature_reader_ray.errors import MissingDataError

        path = self.path_for(url)
        if not os.path.exists(path):
            raise MissingDataError(f"no volume file for {url!r} at {path}")
        with open(path, "rb") as f:
            payload = f.read()
        if payload[:2] == b"\x1f\x8b":
            payload = gzip.decompress(payload)
        elif payload[:3] == b"BZh":
            payload = bz2.decompress(payload)
        return json.loads(payload.decode("utf-8"))


class CachedResolver:
    """Read-through cache composition — the reference's fallback resolver
    (caching.py:14-89): open() tries the PREFERRED tree first; on miss the
    volume is copied from the FALLBACK tree into the preferred one (atomic
    rename, re-encoded to the preferred codec) and served from there — the
    ``copy_between_resolvers`` miss path (resolvers.py:321-350)."""

    def __init__(self, preferred: TreeResolver, fallback: TreeResolver) -> None:
        self.preferred = preferred
        self.fallback = fallback

    def path_for(self, url: str) -> str:
        return self.preferred.path_for(url)

    def open(self, url: str) -> dict:
        from htrc_feature_reader_ray.errors import MissingDataError

        try:
            return self.preferred.open(url)
        except MissingDataError:
            doc = self.fallback.open(url)  # raises if truly absent
            path = self.preferred.path_for(url)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            compress = CODECS[self.preferred.codec][1]
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(compress(json.dumps(doc, sort_keys=True)
                                 .encode("utf-8")))
            os.replace(tmp, path)
            return self.preferred.open(url)


class FetchResolver:
    """HTTP-shaped resolver WITHOUT the network — the reference's
    ``HttpResolver`` (resolvers.py:147-176) with the GET abstracted into a
    user-supplied ``fetch_fn(url) -> bytes`` (requests/urllib3/a queue
    client — anything callable binds outside the sandbox; tests inject a
    dict-backed fake). Payloads pass the same magic-byte codec sniff +
    JSON parse as :class:`TreeResolver.open`; ``attempts`` retries
    transient fetch errors (no sleep — backoff policy belongs to the
    injected fetch_fn, where the HTTP client's own retry config lives).

    Completes the resolver matrix: ``CachedResolver(preferred=
    TreeResolver(local), fallback=FetchResolver(fetch_fn))`` is exactly
    the reference's http→local read-through cache (caching.py:14-89)
    without this module ever owning a socket."""

    def __init__(self, fetch_fn, *, attempts: int = 3) -> None:
        if attempts < 1:
            raise ValueError("attempts must be >= 1")
        self.fetch_fn = fetch_fn
        self.attempts = attempts

    def path_for(self, url: str) -> str:
        return f"fetch://{url}"

    def open(self, url: str) -> dict:
        from htrc_feature_reader_ray.errors import MissingDataError

        last: Exception | None = None
        for _ in range(self.attempts):
            try:
                payload = self.fetch_fn(url)
                break
            except Exception as e:  # noqa: BLE001 — retry any fetch error
                last = e
        else:
            raise MissingDataError(
                f"fetch failed for {url!r} after {self.attempts} "
                f"attempts: {last}") from last
        if payload[:2] == b"\x1f\x8b":
            payload = gzip.decompress(payload)
        elif payload[:3] == b"BZh":
            payload = bz2.decompress(payload)
        return json.loads(payload.decode("utf-8"))


def read_volumes_via_fetch(urls, resolver_factory, *,
                           concurrency=(1, 4), batch_size: int = 64,
                           on_error: str = "raise"):
    """Dataset source over a RESOLVER — urls in, long token rows out,
    through an actor pool holding one resolver per actor (the
    warmed-connection analog of the extractor pool: an HTTP client /
    cache handle is expensive state, built once in ``__init__``).

    ``urls``: list/array of url strings or a Dataset with a ``url``
    column. ``resolver_factory``: zero-arg callable returning any object
    with ``open(url) -> dict`` (TreeResolver, FetchResolver,
    CachedResolver compositions). ``on_error``: 'raise' propagates a
    failed url (fail-fast default); 'skip' drops it and keeps streaming
    (the 100-TB crawl posture — a dead url must not kill the job).
    """
    import ray.data

    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")

    if not hasattr(urls, "map_batches"):
        urls = ray.data.from_arrow(
            pa.table({"url": pa.array(list(urls), type=pa.string())}))

    class _FetchVolumes:
        def __init__(self) -> None:
            self.resolver = resolver_factory()

        def __call__(self, batch: pa.Table) -> pa.Table:
            docs = []
            for url in batch.column("url").to_pylist():
                try:
                    docs.append(json.dumps(self.resolver.open(url)))
                except Exception:
                    if on_error == "raise":
                        raise
            return parse_volume_batch(
                pa.table({"doc": pa.array(docs, type=pa.string())}))

    return urls.map_batches(
        _FetchVolumes,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


#: Line-char JSON key spellings by schema version — the reference's 3-way
#: branch (parsers.py:397-402): its '3.0' schema uses the asymmetric
#: beginCharCounts/endCharCount pair, the URL-identified 3.0 subschema the
#: symmetric beginCharCount/endCharCount, and every pre-3.0 file
#: beginLineChars/endLineChars. The engine's native schema uses the modern
#: symmetric spelling; ANY unrecognized / absent schemaVersion falls back
#: to the pre-3.0 spelling, which is exactly how a migrating user's old EF
#: files arrive.
LINE_CHAR_KEYS: dict = {
    SCHEMA_VERSION: (("begin", "beginCharCount"), ("end", "endCharCount")),
    "3.0": (("begin", "beginCharCounts"), ("end", "endCharCount")),
    "https://schemas.hathitrust.org/EF_Schema_FeaturesSubSchema_v_3.0":
        (("begin", "beginCharCount"), ("end", "endCharCount")),
}
_LEGACY_LINE_CHAR_KEYS = (("begin", "beginLineChars"),
                          ("end", "endLineChars"))


def line_char_keys(schema) -> tuple:
    """(place, json_key) pairs for a schemaVersion (pre-3.0 fallback)."""
    return LINE_CHAR_KEYS.get(schema, _LEGACY_LINE_CHAR_KEYS)


def line_chars_to_json(lc_ds, out_dir: str, *, num_buckets: int = 16,
                       codec: str | None = None,
                       schema: str = SCHEMA_VERSION) -> pd.DataFrame:
    """Serialize line-char rows (url, warc_ts, section, place, char,
    count) into nested JSON volume docs — the line-char sibling of
    :func:`volumes_to_json`, writing whichever begin/end KEY SPELLING the
    target ``schema`` dictates (:func:`line_char_keys`), so round-trips
    are testable per schema variant. Same bucketed JSONL layout, codecs,
    atomic renames; returns the (path, n_docs) manifest."""
    if codec not in CODECS:
        raise ValueError(
            f"unknown codec {codec!r}; one of {sorted(map(str, CODECS))}")
    ext, compress, _ = CODECS[codec]
    key_of = dict(line_char_keys(schema))
    os.makedirs(out_dir, exist_ok=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"path": pd.Series(dtype=object),
                 "n_docs": pd.Series(dtype="int64")})
        lines = []
        for url, g in df.groupby("url", sort=True):
            snaps = []
            for ts, gs in g.groupby("warc_ts", sort=True):
                sections: dict = {}
                for (sect, place, char), gg in gs.groupby(
                        ["section", "place", "char"], sort=True):
                    sections.setdefault(sect, {}).setdefault(
                        key_of[place], {})[char] = int(gg["count"].sum())
                snaps.append({"warc_ts": int(ts.value // 1000),
                              "lineChars": sections})
            doc = {"url": url, "schemaVersion": schema,
                   "snapshots": snaps}
            lines.append(json.dumps(doc, sort_keys=True))
        bucket = int(df[BUCKET_COL].iloc[0])
        path = os.path.join(out_dir, f"part-{bucket:05d}.jsonl{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(compress(("\n".join(lines) + "\n").encode("utf-8")))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "n_docs": [len(lines)]})

    return bucketed_map_groups(
        lc_ds, "url", per_bucket, num_buckets=num_buckets,
        drop_bucket=False,
    ).to_pandas()


def parse_line_chars_batch(batch: pa.Table) -> pa.Table:
    """Nested line-char JSON docs -> long rows (url, warc_ts, section,
    place, char, count) — the ``_make_line_char_df`` walk
    (parsers.py:384-429) with the reference's PER-DOCUMENT schema switch:
    the begin/end key spelling is chosen from each doc's schemaVersion
    (:func:`line_char_keys`), so one lake may mix native, 3.0-spelled and
    pre-3.0 (``beginLineChars``/``endLineChars``) files and every row
    still parses."""
    urls, tss, sects, places, chars, counts = [], [], [], [], [], []
    for doc_str in batch.column("doc").to_pylist():
        doc = json.loads(doc_str) if isinstance(doc_str, str) else doc_str
        keys = line_char_keys(doc.get("schemaVersion"))
        url = doc["url"]
        for snap in doc["snapshots"]:
            ts = snap["warc_ts"]
            for sect, placemap in snap.get("lineChars", {}).items():
                if placemap is None:
                    continue
                for place, json_key in keys:
                    charmap = placemap.get(json_key)
                    if charmap is None:
                        continue
                    for char, count in charmap.items():
                        urls.append(url)
                        tss.append(ts)
                        sects.append(sect)
                        places.append(place)
                        chars.append(char)
                        counts.append(count)
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "section": pa.array(sects, type=pa.string()),
        "place": pa.array(places, type=pa.string()),
        "char": pa.array(chars, type=pa.string()),
        "count": pa.array(counts, type=pa.int64()),
    })


def read_json_line_chars(path: str, *, codec: str | None = "auto"):
    """JSONL line-char lake -> long Dataset, any codec / any schema
    spelling mix (per-file magic-byte decompression, per-doc schema
    switch) — the :func:`read_json_volumes` sibling."""
    if codec != "auto" and codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}")
    files = ray.data.read_binary_files(path)

    def decode(batch: pa.Table) -> pa.Table:
        docs = []
        for payload in batch.column("bytes").to_pylist():
            if payload[:2] == b"\x1f\x8b":
                payload = gzip.decompress(payload)
            elif payload[:3] == b"BZh":
                payload = bz2.decompress(payload)
            raw = payload.decode("utf-8")
            docs.extend(line for line in raw.splitlines() if line)
        return pa.table({"doc": pa.array(docs, type=pa.string())})

    docs = files.map_batches(decode, batch_format="pyarrow")
    return docs.map_batches(parse_line_chars_batch, batch_format="pyarrow")


def read_json_volumes(path: str, *, codec: str | None = "auto"):
    """JSONL volume lake -> token-count Dataset (long form), any codec.

    Compression is detected per FILE by content (magic bytes), not by the
    ``codec`` argument: Arrow's ``read_binary_files`` already
    auto-decompresses known suffixes, so payloads may arrive plain even for
    ``.gz`` paths, and files a writer produced without a suffix still carry
    their magic. ``codec`` is validated (fail fast on typos) but otherwise
    informational. Each part file decompresses inside the map task (one
    task per file — the bucket is the parallelism unit, matching the
    writer's partitioning)."""
    if codec != "auto" and codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}")
    files = ray.data.read_binary_files(path)

    def decode(batch: pa.Table) -> pa.Table:
        docs = []
        for payload in batch.column("bytes").to_pylist():
            if payload[:2] == b"\x1f\x8b":
                payload = gzip.decompress(payload)
            elif payload[:3] == b"BZh":
                payload = bz2.decompress(payload)
            raw = payload.decode("utf-8")
            docs.extend(line for line in raw.splitlines() if line)
        return pa.table({"doc": pa.array(docs, type=pa.string())})

    docs = files.map_batches(decode, batch_format="pyarrow")
    return docs.map_batches(parse_volume_batch, batch_format="pyarrow")
