"""WARC (raw-crawl) source: Common Crawl's capture format — ``WARC/1.0``
``response`` records whose payload is a full HTTP response (status line +
headers + html body), Content-Length-delimited, usually gzipped.

Together with :mod:`.wet` (the plain-text conversion sibling) this completes
the Common-Crawl source family the reference's multi-format ingest
(resolvers.py open/parse) maps onto for webtext: WARC carries the raw html
the extractor consumes, WET carries pre-extracted text. Same execution
shape: ``read_binary_files`` + one stateless parse task per shard; records
never cross files, so no exchange.

Parsing is Content-Length-driven at BOTH framing levels: the WARC record
length delimits the HTTP block (html legitimately contains blank lines and
``WARC/1.0`` literals), and the HTTP header/body split is the first CRLFCRLF
*inside* that block only.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

import ray.data

from htrc_feature_reader_ray.sources.wet import _fmt_ts, _ts_us


def serialize_warc(rows) -> bytes:
    """rows of (url, ts_us, html_bytes) -> one WARC shard's bytes.

    Each row becomes one ``response`` record wrapping an ``HTTP/1.1 200``
    response with a ``text/html`` body. ``html=None`` serializes as an empty
    body (the engine-wide null-payload-as-empty convention)."""
    out = []
    for url, ts_us, html in rows:
        body = bytes(html) if html is not None else b""
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n".encode("ascii")
            + b"\r\n" + body
        )
        out.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode("utf-8")
            + f"WARC-Date: {_fmt_ts(int(ts_us))}\r\n".encode("ascii")
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode("ascii")
            + b"\r\n" + http + b"\r\n\r\n"
        )
    return b"".join(out)


def write_warc_shards(df, out_dir: str, *, url_col: str = "url",
                      ts_col: str = "warc_ts", html_col: str = "html",
                      num_shards: int = 8, compress: bool = True) -> list:
    """Write a pandas frame as ``shard-K.warc[.gz]`` files (url-hash
    sharded, (url, ts)-ordered within a shard, atomic rename, a leading
    ``warcinfo`` record per shard as real crawlers emit) — the test/bench
    fixture writer; a production crawl writes WARC at fetch time."""
    from htrc_feature_reader_ray.functions.ids import stable_hash64

    os.makedirs(out_dir, exist_ok=True)
    shard = stable_hash64(df[url_col].to_numpy()) % np.uint64(num_shards)
    ts = df[ts_col]
    if not np.issubdtype(ts.dtype, np.integer):
        ts = ts.astype("datetime64[us]").astype("int64")
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 24\r\n\r\n"
            b"software: graft-fixture\r\n\r\n")
    paths = []
    for k in range(num_shards):
        part = df.loc[shard == np.uint64(k)].sort_values(
            [url_col, ts_col], kind="mergesort")
        name = f"shard-{k}.warc" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        payload = info + serialize_warc(zip(
            part[url_col], ts.loc[part.index], part[html_col]))
        if compress:
            payload = gzip.compress(payload, mtime=0)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        paths.append(path)
    return paths


def parse_warc_bytes(payload: bytes):
    """One WARC shard's bytes -> list of (url, ts_us, html_bytes).

    Skips non-``response`` records (warcinfo/request/metadata) and
    non-200 responses; strips the HTTP header block at the first CRLFCRLF
    inside the record payload."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    recs = []
    pos = 0
    while True:
        start = payload.find(b"WARC/1.0", pos)
        if start == -1:
            break
        hdr_end = payload.find(b"\r\n\r\n", start)
        if hdr_end == -1:
            break
        fields = {}
        for line in payload[start:hdr_end].decode(
                "utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        http = payload[hdr_end + 4: hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get("warc-type") != "response":
            continue
        split = http.find(b"\r\n\r\n")
        if split == -1:
            continue  # malformed HTTP block: no header/body boundary
        status_line = http[:http.find(b"\r\n")].decode("ascii", "replace")
        parts = status_line.split(" ", 2)
        if len(parts) < 2 or parts[1] != "200":
            continue
        recs.append((
            fields.get("warc-target-uri", ""),
            _ts_us(fields["warc-date"]) if "warc-date" in fields else 0,
            http[split + 4:],
        ))
    return recs


def read_warc(path: str) -> "ray.data.Dataset":
    """WARC shard directory/glob -> Dataset(url, warc_ts[us], html:binary).

    One parse task per shard file (gzip by magic bytes, so plain and
    ``.gz`` shards mix freely); feed the result straight into
    ``stages.extract.extract_pages`` for text."""
    files = ray.data.read_binary_files(path)

    def parse(batch: pa.Table) -> pa.Table:
        urls, ts, htmls = [], [], []
        for payload in batch.column("bytes").to_pylist():
            for u, t, h in parse_warc_bytes(payload):
                urls.append(u)
                ts.append(t)
                htmls.append(h)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.int64()).cast(
                pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
        })

    return files.map_batches(parse, batch_format="pyarrow")
