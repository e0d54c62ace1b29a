"""WET (WARC conversion) source: the Common-Crawl plain-text interchange
format — ``WARC/1.0`` header blocks with ``Content-Length``-delimited
payloads, usually gzipped.

Generalizes the reference's multi-format volume ingest (resolvers.py
open/parse, utils id→path) to the file format an actual webtext corpus
arrives in. The reader is ``read_binary_files`` + a stateless per-file
parse ``map_batches`` (one task per WET shard — the shard is the
parallelism unit, exactly the reference's one-volume-one-file shape at
crawl scale); records never cross files, so no exchange is needed.

Parsing is Content-Length-driven (never "split on blank lines"): WET
payloads legitimately contain blank lines and even literal ``WARC/1.0``
strings, and the length header is the only sound record delimiter.
"""

from __future__ import annotations

import gzip
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

import ray.data

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _ts_us(warc_date: str) -> int:
    """ISO-8601 Z timestamp -> epoch microseconds (WET headers are always
    second-resolution UTC)."""
    dt = datetime.strptime(warc_date, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=timezone.utc)
    return int((dt - _EPOCH).total_seconds()) * 1_000_000


def _fmt_ts(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us // 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def serialize_wet(rows) -> bytes:
    """rows of (url, ts_us, text) -> one WET shard's bytes.

    ``text=None`` is serialized as an empty conversion record (the
    engine-wide null-text-as-empty convention)."""
    out = []
    for url, ts_us, text in rows:
        body = (text or "").encode("utf-8")
        out.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode("utf-8")
            + f"WARC-Date: {_fmt_ts(int(ts_us))}\r\n".encode("ascii")
            + b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n".encode("ascii")
            + b"\r\n" + body + b"\r\n\r\n"
        )
    return b"".join(out)


def write_wet_shards(df, out_dir: str, *, url_col: str = "url",
                     ts_col: str = "warc_ts", text_col: str = "text",
                     num_shards: int = 8, compress: bool = True) -> list:
    """Write a pandas frame as ``shard-K.wet[.gz]`` files (url-hash
    sharded, rows ordered by (url, ts) within a shard, atomic rename) —
    the test/bench fixture writer; a production crawl writes WET at fetch
    time."""
    import pandas as pd  # noqa: F401

    from htrc_feature_reader_ray.functions.ids import stable_hash64

    os.makedirs(out_dir, exist_ok=True)
    shard = stable_hash64(df[url_col].to_numpy()) % np.uint64(num_shards)
    ts = df[ts_col]
    if not np.issubdtype(ts.dtype, np.integer):
        ts = ts.astype("datetime64[us]").astype("int64")
    paths = []
    for k in range(num_shards):
        part = df.loc[shard == np.uint64(k)].sort_values(
            [url_col, ts_col], kind="mergesort")
        name = f"shard-{k}.wet" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        payload = serialize_wet(zip(
            part[url_col], ts.loc[part.index], part[text_col]))
        if compress:
            payload = gzip.compress(payload, mtime=0)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        paths.append(path)
    return paths


def parse_wet_bytes(payload: bytes):
    """One WET shard's bytes -> list of (url, ts_us, text)."""
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
        body = payload[hdr_end + 4: hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if fields.get("warc-type", "conversion") != "conversion":
            continue  # warcinfo/request/... blocks carry no text
        recs.append((
            fields.get("warc-target-uri", ""),
            _ts_us(fields["warc-date"]) if "warc-date" in fields else 0,
            body.decode("utf-8", "replace"),
        ))
    return recs


def read_wet(path: str) -> "ray.data.Dataset":
    """WET shard directory/glob -> Dataset(url, warc_ts[us], text).

    One parse task per shard file (gzip detected by magic bytes, so plain
    and ``.gz`` shards mix freely)."""
    files = ray.data.read_binary_files(path)

    def parse(batch: pa.Table) -> pa.Table:
        urls, ts, texts = [], [], []
        for payload in batch.column("bytes").to_pylist():
            for u, t, x in parse_wet_bytes(payload):
                urls.append(u)
                ts.append(t)
                texts.append(x)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.int64()).cast(
                pa.timestamp("us")),
            "text": pa.array(texts, type=pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow")
