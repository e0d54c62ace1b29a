"""Flagship pipeline: crawl pages → extracted text → point-in-time windowed
feature table.

The end-to-end shape the north rule grades (docs/sec):
  read documents → synthesize pages (fixture source) → actor-pool HTML
  extraction (byte-identical text) → zero-copy Arrow token explode →
  per-snapshot feature fold (shuffle-free: snapshot-aligned batches) →
  ONE url-bucket co-partitioning shuffle for every order-sensitive op
  (lag/lead + sessionization fused in a single bucketed pass) →
  broadcast join of per-source metadata (the metadata↔features join,
  SURVEY §2.6).

Output: one row per (url, warc_ts) with exact windowed features and no
temporal leakage (lag features read strictly earlier snapshots).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from htrc_feature_reader_ray.sources.pages import read_pages
from htrc_feature_reader_ray.stages.extract import (
    extract_pages,
    sections_from_text,
    token_counts,
)
from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

SESSION_GAP = "90m"


def page_features_batch(batch: pa.Table) -> pa.Table:
    """Explode + per-snapshot fold in ONE batch fn: input rows are whole
    pages, so every (url, warc_ts) group is complete — no shuffle, and no
    cross-stage re-batching can split a group (fold.py docstring)."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.extract import token_counts_batch

    toks = token_counts_batch(batch)
    g = toks.group_by(["url", "warc_ts"]).aggregate(
        [("count", "sum"), ("token", "count_distinct")]
    )
    g = g.rename_columns(["url", "warc_ts", "n_tokens", "distinct_tokens"])
    for col in ("n_tokens", "distinct_tokens"):
        i = g.schema.get_field_index(col)
        g = g.set_column(i, col, pc.cast(g.column(col), pa.int64()))
    return g


def snapshot_features(sf_dir: str, *, via_html: bool = True, concurrency=None):
    """Per-(url, warc_ts) feature fold, fused INTO the extractor actor call
    (post_fn) so the wide extracted text never leaves the actor — the stage
    emits only the small feature rows (extract.py::HtmlExtractor)."""
    pages = read_pages(sf_dir, drop_text=via_html)
    if via_html:
        return extract_pages(
            pages, concurrency=concurrency, post_fn=page_features_batch
        )
    pages = pages.map_batches(sections_from_text, batch_format="pyarrow")
    return pages.map_batches(page_features_batch, batch_format="pyarrow")


def windowed_features(snap_feats, *, gap: str = SESSION_GAP, num_buckets: int = 32):
    """Fused order-sensitive pass (ONE shuffle): per url sorted by warc_ts,
    add lag/lead of n_tokens and gap-based session ids. Lag reads strictly
    earlier snapshots — the zero-leakage windowing."""
    gap_td = pd.Timedelta(gap)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="mergesort")
        g = df.groupby("url", sort=False)
        df["lag_n_tokens"] = g["n_tokens"].shift(1)
        df["lead_n_tokens"] = g["n_tokens"].shift(-1)
        prev = g["warc_ts"].shift(1)
        new_sess = (df["warc_ts"] - prev > gap_td) | prev.isna()
        df["session_id"] = new_sess.groupby(df["url"]).cumsum().astype(np.int64)
        return df

    return bucketed_map_groups(snap_feats, "url", per_bucket, num_buckets=num_buckets)


def source_stats_table(sf_dir: str) -> pd.DataFrame:
    """Small per-source dimension table (broadcast side of the
    metadata↔features join): avg document length per source.

    Computed driver-side (pyarrow read of a few-MB dimension table): a
    dimension-table aggregate is not worth a Ray execution of its own — the
    broadcast join is the distributed part. (Sum of int64 then one division
    is exact, matching DuckDB avg.)"""
    import pyarrow.parquet as pq

    df = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    ).to_pandas()
    g = df.groupby("source")["n_chars"]
    out = (g.sum() / g.count()).rename("src_avg_chars").reset_index()
    return out


def flagship_from_lake(lake_dir: str, sf_dir: str, *, num_buckets: int = 32,
                       batch_size: int = 2048, concurrency=None):
    """Production-shape flagship: stream a pages PARQUET LAKE (column-pruned
    read — html/url/warc_ts only, the ground-truth text column never leaves
    storage) through the same extract→features→windows→join pipeline."""
    from htrc_feature_reader_ray.sources.pages import read_pages_lake
    from htrc_feature_reader_ray.stages.extract import extract_pages

    pages = read_pages_lake(
        lake_dir, columns=["url", "warc_ts", "html", "lang"]
    )
    feats = extract_pages(
        pages, concurrency=concurrency, batch_size=batch_size,
        post_fn=page_features_batch,
    )
    return _join_source_stats(
        windowed_features(feats, num_buckets=num_buckets), sf_dir
    )


def flagship_checkpointed(sf_dir: str, work_dir: str, *,
                          via_html: bool = True, num_buckets: int = 32,
                          concurrency=None):
    """Flagship with END-TO-END lineage resume (state/lineage.run_chain):
    three checkpointed stages — per-snapshot features, windowed features,
    source-stats join — each persisted as a bucketed parquet lake with a
    manifest chained on the upstream manifest's content digest. A run
    killed between stages resumes from the first incomplete stage and
    READS every complete one (manifest hit, zero recompute); editing the
    input parquet invalidates the whole chain transitively. Returns
    ``(final_ds, results)`` with per-stage hit flags."""
    from htrc_feature_reader_ray.state.lineage import run_chain

    inputs = [f"{sf_dir}/documents.parquet"]
    stages = [
        {
            "name": "features",
            "out_dir": f"{work_dir}/features",
            "key": "url", "num_buckets": num_buckets,
            "inputs": inputs,
            "params": {"via_html": via_html},
            "build": lambda up: snapshot_features(
                sf_dir, via_html=via_html, concurrency=concurrency),
        },
        {
            "name": "windows",
            "out_dir": f"{work_dir}/windows",
            "key": "url", "num_buckets": num_buckets,
            "params": {"gap": SESSION_GAP},
            "build": lambda up: windowed_features(
                up, num_buckets=num_buckets),
        },
        {
            "name": "final",
            "out_dir": f"{work_dir}/final",
            "key": "url", "num_buckets": num_buckets,
            "inputs": inputs,  # the join reads source stats from sf_dir
            "params": {},
            "build": lambda up: _join_source_stats(up, sf_dir),
        },
    ]
    return run_chain(stages)


def flagship(sf_dir: str, *, via_html: bool = True, num_buckets: int = 32,
             concurrency=None):
    """The full flagship pipeline; returns the windowed feature Dataset."""
    feats = windowed_features(
        snapshot_features(sf_dir, via_html=via_html, concurrency=concurrency),
        num_buckets=num_buckets,
    )
    return _join_source_stats(feats, sf_dir)


def _join_source_stats(feats, sf_dir: str):
    src = source_stats_table(sf_dir)
    src_ref = ray.put(src.set_index("source")["src_avg_chars"].to_dict())

    def join_source(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(src_ref)
        # url = https://<source>.example.com/... — derive the key, map, drop
        src_key = batch["url"].str.extract(r"https://([^.]+)\.", expand=False)
        batch["src_avg_chars"] = src_key.map(lookup)
        return batch

    return feats.map_batches(join_source, batch_format="pandas")
