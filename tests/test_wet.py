"""WET source: serialize/parse round-trip, Content-Length robustness,
codec mixing. Fixture-level parity is covered by the wet_roundtrip oracle."""

import gzip
import os

import pandas as pd
import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.sources.wet import (
    parse_wet_bytes,
    read_wet,
    serialize_wet,
    write_wet_shards,
)

TS = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch us


def test_serialize_parse_roundtrip_adversarial_payloads():
    rows = [
        ("http://a/1", TS, "plain text"),
        # blank lines and a literal record header INSIDE the payload:
        # only Content-Length delimiting survives this
        ("http://a/2", TS + 3_600_000_000, "x\r\n\r\nWARC/1.0\r\ny"),
        ("http://a/3", TS, ""),            # empty payload
        ("http://a/4", TS, None),           # null -> '' convention
        ("http://a/5", TS, "unicode é中文"),
    ]
    back = parse_wet_bytes(serialize_wet(rows))
    assert back == [(u, t, x or "") for u, t, x in rows]


def test_parse_skips_non_conversion_records():
    payload = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
        b"info\r\n\r\n"
    ) + serialize_wet([("http://a/1", TS, "kept")])
    assert parse_wet_bytes(payload) == [("http://a/1", TS, "kept")]


def test_write_read_shards_mixed_codecs(tmp_path):
    df = pd.DataFrame({
        "url": [f"http://h/{i}" for i in range(20)],
        "warc_ts": pd.array([TS + i * 1_000_000 for i in range(20)],
                            dtype="int64").astype("datetime64[us]"),
        "text": [f"doc {i}\nline two" for i in range(20)],
    })
    d = str(tmp_path / "wet")
    write_wet_shards(df, d, num_shards=3, compress=True)
    # drop one shard to plain bytes: magic-byte detection must still read it
    p = os.path.join(d, "shard-0.wet.gz")
    raw = gzip.decompress(open(p, "rb").read())
    os.remove(p)
    open(os.path.join(d, "shard-0.wet"), "wb").write(raw)

    out = (read_wet(d).to_pandas()
           .sort_values("url", key=lambda s: s.str.split("/").str[-1]
                        .astype(int))
           .reset_index(drop=True))
    assert len(out) == 20
    assert out["url"].tolist() == df["url"].tolist()
    assert out["text"].tolist() == df["text"].tolist()
    assert (out["warc_ts"].astype("datetime64[us]")
            == df["warc_ts"]).all()
