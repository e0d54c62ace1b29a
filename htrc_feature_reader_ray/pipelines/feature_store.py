"""URL feature-store assembly: ONE wide feature row per url, combining the
latest-snapshot text features with whole-graph link features — the
materialized artifact a ranking / curation / training pipeline actually
consumes, and the engine's canonical multi-operator composition next to
``pipelines/flagship.py``.

Plan (every stage the scale shape):
  * latest snapshot per url via the lossless ``topk_per_group`` combiner
    (≤ one row per url per batch crosses the exchange);
  * text features map-side on the surviving row only;
  * the link edge set extracts ONCE and pins (two graph consumers:
    degree fold + PageRank — the iterative-op residency argument,
    cf. ``linkgraph.pagerank``);
  * two url-keyed LEFT bucket joins attach (out/in degree, rank);
    pages absent from the graph coalesce to 0 by contract (a page with
    no extracted links still gets its feature row).

Reference analog: the per-volume wide feature frame a
``FeatureReader``-driven notebook assembles by hand (feature_reader.py's
Volume accessors joined ad hoc); here it is one streaming pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def url_feature_store(sf_dir: str, *, num_buckets: int = 16,
                      pagerank_iterations: int = 3):
    """(url, warc_ts, text_chars, n_lines, n_tokens, out_degree,
    in_degree, rank) — latest snapshot per url + whole-graph features."""
    from htrc_feature_reader_ray.sources.pages import read_pages
    from htrc_feature_reader_ray.stages.extract import extract_pages
    from htrc_feature_reader_ray.stages.fold import topk_per_group
    from htrc_feature_reader_ray.stages.linkgraph import (
        extract_links,
        link_degree,
        pagerank,
    )
    from htrc_feature_reader_ray.stages.partition import bucket_join

    latest = topk_per_group(
        extract_pages(read_pages(sf_dir, drop_text=True)).select_columns(
            ["url", "warc_ts", "text"]),
        group_cols=["url"], sort_col="warc_ts", k=1,
        num_buckets=num_buckets)

    def text_feats(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column("text"), pa.large_string())

        def i64(a):
            return pc.cast(a, pa.int64())

        return pa.table({
            "url": pc.cast(batch.column("url"), pa.string()),
            "warc_ts": batch.column("warc_ts"),
            "text_chars": i64(pc.utf8_length(txt)),
            "n_lines": i64(pc.add(pc.count_substring(txt, "\n"), 1)),
            "n_tokens": i64(pc.count_substring_regex(txt, r"\S+")),
        })

    feats = latest.map_batches(text_feats, batch_format="pyarrow")

    edges = extract_links(read_pages(sf_dir, drop_text=True)).materialize()
    deg = link_degree(edges, num_buckets=num_buckets)
    pr = pagerank(edges, iterations=pagerank_iterations,
                  num_buckets=num_buckets)

    def deg_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "d_url": pc.cast(batch.column("url"), pa.string()),
            "out_degree": pc.cast(batch.column("out_degree"), pa.int64()),
            "in_degree": pc.cast(batch.column("in_degree"), pa.int64()),
        })

    def pr_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "r_url": pc.cast(batch.column("url"), pa.string()),
            "rank": pc.cast(batch.column("rank"), pa.int64()),
        })

    j = bucket_join(
        feats, deg.map_batches(deg_side, batch_format="pyarrow"),
        left_key="url", right_key="d_url", how="left",
        num_buckets=num_buckets)
    j = bucket_join(
        j, pr.map_batches(pr_side, batch_format="pyarrow"),
        left_key="url", right_key="r_url", how="left",
        num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for c in ("out_degree", "in_degree", "rank"):
            out[c] = out[c].fillna(0).astype("int64")
        for c in ("text_chars", "n_lines", "n_tokens"):
            out[c] = out[c].astype("int64")
        return out[["url", "warc_ts", "text_chars", "n_lines", "n_tokens",
                    "out_degree", "in_degree", "rank"]]

    return j.map_batches(finish, batch_format="pandas")
