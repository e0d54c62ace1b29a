"""WARC source: serialize/parse round-trip through the HTTP framing,
non-response / non-200 skipping, codec mixing, and extractor handoff.
Fixture-level parity is covered by the warc_roundtrip oracle."""

import gzip
import os

import pandas as pd

from htrc_feature_reader_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    serialize_warc,
    write_warc_shards,
)

TS = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch us


def test_serialize_parse_roundtrip_adversarial_payloads():
    rows = [
        ("http://a/1", TS, b"<html>plain</html>"),
        # blank lines and a literal WARC header INSIDE the body: only the
        # two-level Content-Length framing survives this
        ("http://a/2", TS + 3_600_000_000,
         b"x\r\n\r\nWARC/1.0\r\nHTTP/1.1 200 OK\r\n\r\ny"),
        ("http://a/3", TS, b""),        # empty body
        ("http://a/4", TS, None),        # null -> b'' convention
        ("http://a/5", TS, "é中文".encode("utf-8")),
    ]
    back = parse_warc_bytes(serialize_warc(rows))
    assert back == [(u, t, h or b"") for u, t, h in rows]


def test_parse_skips_non_response_and_non_200():
    non200 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://a/0\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 49\r\n\r\n"
        b"HTTP/1.1 404 Not Found\r\nContent-Length: 4\r\n\r\ngone"
        b"\r\n\r\n"
    )
    payload = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n"
    ) + non200 + serialize_warc([("http://a/1", TS, b"<p>kept</p>")])
    assert parse_warc_bytes(payload) == [("http://a/1", TS, b"<p>kept</p>")]


def test_write_read_shards_mixed_codecs(tmp_path):
    df = pd.DataFrame({
        "url": [f"http://h/{i}" for i in range(20)],
        "warc_ts": pd.array([TS + i * 1_000_000 for i in range(20)],
                            dtype="int64").astype("datetime64[us]"),
        "html": [f"<main>doc {i}</main>".encode() for i in range(20)],
    })
    d = str(tmp_path / "warc")
    write_warc_shards(df, d, num_shards=3, compress=True)
    # drop one shard to plain bytes: magic-byte detection must still read it
    p = os.path.join(d, "shard-0.warc.gz")
    raw = gzip.decompress(open(p, "rb").read())
    os.remove(p)
    open(os.path.join(d, "shard-0.warc"), "wb").write(raw)

    out = (read_warc(d).to_pandas()
           .sort_values("url", key=lambda s: s.str.split("/").str[-1]
                        .astype(int))
           .reset_index(drop=True))
    assert len(out) == 20
    assert out["url"].tolist() == df["url"].tolist()
    assert [bytes(h) for h in out["html"]] == df["html"].tolist()
    assert (out["warc_ts"].astype("datetime64[us]")
            == df["warc_ts"]).all()


def test_warc_feeds_extractor(tmp_path):
    """read_warc -> extract_pages recovers the zone text byte-identically."""
    from htrc_feature_reader_ray.stages.extract import extract_pages

    html = (b"<html><body><nav><a href='x'>x</a></nav>"
            b"<header>h one</header><main>b two</main>"
            b"<footer>f three</footer></body></html>")
    df = pd.DataFrame({
        "url": ["http://h/1"],
        "warc_ts": pd.array([TS], dtype="int64").astype("datetime64[us]"),
        "html": [html],
    })
    d = str(tmp_path / "warc")
    write_warc_shards(df, d, num_shards=1)
    out = extract_pages(read_warc(d)).to_pandas()
    assert out.loc[0, "text"] == "h one\nb two\nf three"
