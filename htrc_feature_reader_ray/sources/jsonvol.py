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

import json

import pandas as pd
import pyarrow as pa

import ray.data

from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

SCHEMA_VERSION = "graft-1.0"


def volumes_to_json(tokens_ds, out_dir: str, *, num_buckets: int = 16) -> None:
    """Serialize (url, warc_ts, section, token, pos, count) rows into one
    nested JSON document per url; write as bucketed JSONL."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
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
            rows.append({"url": url, "doc": json.dumps(doc, sort_keys=True)})
        return pd.DataFrame(rows)

    docs = bucketed_map_groups(tokens_ds, "url", per_bucket,
                               num_buckets=num_buckets)
    docs.write_json(out_dir)


def parse_volume_batch(batch: pa.Table) -> pa.Table:
    """One nested JSON doc -> long token rows (the _make_tokencount_df walk).

    Collected into flat Python lists then one Arrow conversion per batch —
    the JSON walk itself is irreducibly per-document (reference hits the same
    wall, README.md:1082's GIL note; here each batch is a separate task)."""
    import warnings

    urls, tss, sects, toks, poss, counts = [], [], [], [], [], []
    for doc_str in batch.column("doc").to_pylist():
        doc = json.loads(doc_str)
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


def read_json_volumes(path: str):
    """JSONL volume lake -> token-count Dataset (long form)."""
    docs = ray.data.read_json(path)
    return docs.map_batches(parse_volume_batch, batch_format="pyarrow")
