"""Deterministic synthetic web-pages source (the ``input_hint`` table).

Produces the engine's primary input — Common-Crawl-style snapshots
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
— derived deterministically from the driver's ``documents`` parquet table, so
the same rows are constructible both as a Ray pipeline and as a DuckDB CTE
(``PAGES_SQL``), which is what makes every downstream pipeline
oracle-checkable.

Shape (mirrors one EF volume = ordered pages, SURVEY §1.1):
  * one document → one url; ``1 + doc_id % 3`` snapshots per url with
    irregular time gaps (0h, 1h, 4h) — the analog of ordered page ``seq``;
  * each snapshot's html wraps three section zones (header/main/footer —
    the analog of SECREF header/body/footer, parsers.py:24);
  * the ground-truth ``text`` column is exactly what the extractor must
    reproduce byte-identically: ``header \\n body \\n footer``.

The body of snapshot k drops the first k tokens of the document text, so
snapshots of one url genuinely differ over time (needed by as-of joins and
windowed features).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

EPOCH_2024_US = 1_704_067_200_000_000  # TIMESTAMP '2024-01-01' in epoch µs
MINUTE_US = 60_000_000
HOUR_US = 3_600_000_000

# DuckDB CTE producing the identical table (minus html, which SQL never needs:
# oracles always compare against the ground-truth text/sections).
PAGES_SQL = """
pages AS (
    SELECT
        'https://' || source || '.example.com/doc/' || doc_id AS url,
        TIMESTAMP '2024-01-01' + to_minutes(doc_id)
            + to_hours(CAST(snap * snap AS BIGINT)) AS warc_ts,
        'header ' || source AS header,
        array_to_string(
            list_slice(string_split(text, ' '), snap + 1,
                       len(string_split(text, ' '))), ' ') AS body,
        'footer doc ' || doc_id AS footer,
        lang
    FROM documents, unnest(range(1 + doc_id % 3)) AS t(snap)
)
"""

# Ground-truth hyperlink set embedded in each page's <nav> zone (placed
# BEFORE <header>, outside the three extracted text zones, so the
# byte-identical `text` contract is untouched). Every (href, anchor-text)
# pair is derivable from (source, doc_id) alone, so the SQL side can
# re-derive the exact edge set without parsing html: a site-home hub link
# (heavy-hitter in-degree skew by construction), two intra-site prev-doc
# links, and one cross-domain link into a 10-url search hub.
LINKS_SQL = """
link_edges AS (
    SELECT DISTINCT
        'https://' || source || '.example.com/doc/' || doc_id AS src_url,
        dst_url, anchor
    FROM (
        SELECT doc_id, source,
               'https://' || source || '.example.com/' AS dst_url,
               'home' AS anchor
        FROM documents
        UNION ALL
        SELECT doc_id, source,
               'https://' || source || '.example.com/doc/' || (doc_id - 1),
               'doc ' || (doc_id - 1)
        FROM documents WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id, source,
               'https://' || source || '.example.com/doc/' || (doc_id - 7),
               'doc ' || (doc_id - 7)
        FROM documents WHERE doc_id >= 7
        UNION ALL
        SELECT doc_id, source,
               'https://search.example.com/doc/' || (doc_id % 10),
               'search'
        FROM documents
    )
)
"""


def doc_links(source: str, doc_id: int) -> list[tuple[str, str]]:
    """The fixture's ground-truth (href, anchor-text) outlinks of one
    document (must stay in lockstep with ``LINKS_SQL``)."""
    links = [(f"https://{source}.example.com/", "home")]
    if doc_id >= 1:
        links.append(
            (f"https://{source}.example.com/doc/{doc_id - 1}",
             f"doc {doc_id - 1}")
        )
    if doc_id >= 7:
        links.append(
            (f"https://{source}.example.com/doc/{doc_id - 7}",
             f"doc {doc_id - 7}")
        )
    links.append((f"https://search.example.com/doc/{doc_id % 10}", "search"))
    return links


# Ground-truth <head> metadata per snapshot (lockstep with
# synth_pages_batch's head construction): title = url, description derived
# from (doc_id, source), content-language = the page's lang column.
HEAD_META_SQL = """
head_meta AS (
    SELECT
        'https://' || source || '.example.com/doc/' || doc_id AS url,
        TIMESTAMP '2024-01-01' + to_minutes(doc_id)
            + to_hours(CAST(snap * snap AS BIGINT)) AS warc_ts,
        'https://' || source || '.example.com/doc/' || doc_id AS title,
        'doc ' || doc_id || ' from ' || source AS description,
        lang AS content_language
    FROM documents, unnest(range(1 + doc_id % 3)) AS t(snap)
)
"""

# Section union in SQL form, matching stages/extract.py's section explode.
SECTIONS_SQL = """
sections AS (
    SELECT url, warc_ts, 'header' AS section, header AS sect_text FROM pages
    UNION ALL
    SELECT url, warc_ts, 'body', body FROM pages
    UNION ALL
    SELECT url, warc_ts, 'footer', footer FROM pages
)
"""

PAGES_TEXT_SQL = (
    "header || chr(10) || body || chr(10) || footer"
)  # ground-truth text column


def synth_pages_batch(batch: pa.Table, *, mult: int = 1) -> pa.Table:
    """documents batch -> pages batch (fixture generator, not a hot-path op).

    Deterministic; arithmetic is integer-µs so timestamps match the SQL CTE
    exactly (at ``mult=1``). ``mult > 1`` multiplies the snapshot count per
    url (extra snapshots continue the ``snap²``-hour offset series) — used by
    the benchmark to scale work without external data; the SQL oracle only
    covers ``mult=1``.
    """
    doc_id = batch.column("doc_id").to_numpy()
    source = batch.column("source").to_pylist()
    text = batch.column("text").to_pylist()
    lang = batch.column("lang").to_pylist()

    n_snaps = (1 + (doc_id % 3)) * mult
    total = int(n_snaps.sum())

    urls = np.empty(total, dtype=object)
    ts = np.empty(total, dtype=np.int64)
    htmls = np.empty(total, dtype=object)
    texts = np.empty(total, dtype=object)
    langs = np.empty(total, dtype=object)

    pos = 0
    for i in range(len(doc_id)):
        d = int(doc_id[i])
        url = f"https://{source[i]}.example.com/doc/{d}"
        header = f"header {source[i]}"
        footer = f"footer doc {d}"
        toks = text[i].split(" ")
        nav = "<nav>" + "".join(
            f'<a href="{u}">{a}</a>' for u, a in doc_links(source[i], d)
        ) + "</nav>"
        for snap in range(int(n_snaps[i])):
            body = " ".join(toks[snap:])
            gt = header + "\n" + body + "\n" + footer
            html = (
                f"<html><head><title>{url}</title>"
                f'<meta name="description" content="doc {d} from {source[i]}">'
                f'<meta http-equiv="content-language" content="{lang[i]}">'
                f"</head><body>{nav}"
                f"<header>{header}</header><main>{body}</main>"
                f"<footer>{footer}</footer></body></html>"
            ).encode("utf-8")
            urls[pos] = url
            ts[pos] = EPOCH_2024_US + d * MINUTE_US + snap * snap * HOUR_US
            htmls[pos] = html
            texts[pos] = gt
            langs[pos] = lang[i]
            pos += 1

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def snapshot_mult() -> int:
    return int(os.environ.get("GRAFT_SNAPSHOT_MULT", "1"))


def fixture_batch_size(target_pages: int = 8192) -> int:
    """Batch size (in DOCUMENT rows) for stages fused onto the synth source.

    Ray fuses the synth map into downstream ops, so their batch_size applies
    to pre-expansion rows; each doc expands to ~2×mult pages. Sizing by the
    expansion keeps task granularity (and thus parallelism) constant in
    OUTPUT rows — without this, a high mult collapses the whole pipeline to
    a handful of tasks. 8192 measured fastest at mult=20/32cpus (1.27s vs
    1.75s at 32768: 24 tasks instead of 6; below 8192 task overhead wins)."""
    return max(16, target_pages // (2 * snapshot_mult()))


def write_pages_lake(sf_dir: str, out_dir: str, *, num_buckets: int = 32) -> dict:
    """Persist the pages table as a url-hash-bucketed parquet lake — the
    PRODUCTION input shape of the input_hint (a Parquet table of
    (url, warc_ts, html, text, lang)). Returns the lineage manifest."""
    from htrc_feature_reader_ray.state.lineage import write_partitioned

    return write_partitioned(
        read_pages(sf_dir), out_dir, key="url", num_buckets=num_buckets,
        inputs=[f"{sf_dir}/documents.parquet"], ts_col="warc_ts",
    )


def read_pages_lake(lake_dir: str, *, columns=None) -> "ray.data.Dataset":
    """Stream a pages lake with column pruning — pipelines that only extract
    must NOT pay for the ground-truth text column (prune at the read)."""
    return ray.data.read_parquet(lake_dir, columns=columns)


def read_pages(sf_dir: str, *, drop_text: bool = False) -> "ray.data.Dataset":
    """The engine's primary input Dataset: synthesize pages from the
    ``documents`` table of ``sf_dir``.

    ``drop_text=True`` removes the ground-truth text column so pipelines are
    forced through the html extractor (production shape).
    ``GRAFT_SNAPSHOT_MULT`` (env, default 1) multiplies snapshots per url —
    the benchmark's scale knob; correctness gates always run with 1.
    """
    mult = snapshot_mult()
    if mult > 1:
        # bench mode: the documents table is tiny relative to the expansion —
        # read it driver-side and seed 128 blocks directly, skipping the
        # fixed multi-second ReadParquet+SplitBlocks startup that would
        # otherwise dominate the scaling measurement
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text", "lang"],
        )
        ds = ray.data.from_arrow(tbl, override_num_blocks=128)
    else:
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text", "lang"],
        )
    ds = ds.map_batches(
        lambda t: synth_pages_batch(t, mult=mult),
        batch_format="pyarrow",
        batch_size=fixture_batch_size(),
    )
    if drop_text:
        ds = ds.select_columns(["url", "warc_ts", "html", "lang"])
    return ds
