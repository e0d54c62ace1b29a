"""Feature-lake ETL: persist extracted features as partitioned parquet lakes
and read them back — the reference's ``Volume.save`` / format-conversion path
(``ParquetFileHandler.write``, parsers.py:476-558) at corpus scale.

Reference semantics kept:
  * folding happens AT WRITE TIME via ``token_kwargs``
    (parsers.py:505-506): a lake can be persisted case-folded / pos-folded /
    chunked, and is then a first-class input whose missing levels raise
    ``MissingFieldError`` only when a requested folding needs them
    (feature_reader.py:683-699);
  * one output directory per url-hash bucket + lineage manifest
    (state/lineage.py) replaces the reference's pairtree/ziptree layouts.
"""

from __future__ import annotations

import os

import ray.data

from htrc_feature_reader_ray.errors import MissingDataError
from htrc_feature_reader_ray.sources.pages import read_pages
from htrc_feature_reader_ray.stages.extract import (
    extract_pages,
    folded_token_counts,
    line_chars,
    section_features,
    sections_long,
)
from htrc_feature_reader_ray.state.lineage import run_stage

TABLES = ("tokens", "sections", "chars", "meta")


def save_feature_lake(sf_dir: str, out_dir: str, *, token_kwargs=None,
                      num_buckets: int = 16, tables=TABLES) -> dict:
    """Extract once, persist up to four logical tables as bucketed lakes:
    ``tokens`` (folded per token_kwargs), ``sections``, ``chars``, ``meta``.
    Each table is checkpointed independently (run_stage): a rerun skips
    completed tables whose inputs are unchanged."""
    inputs = [f"{sf_dir}/documents.parquet"]
    token_kwargs = token_kwargs or {}
    manifests = {}

    def extracted():
        return extract_pages(read_pages(sf_dir, drop_text=True))

    if "tokens" in tables:
        chunk_kwargs = dict(token_kwargs)
        chunk_target = chunk_kwargs.pop("chunk_target", None)
        if chunk_target is not None:
            # chunked lake (the reference's chunkedparq, tests/data/chunkedparq):
            # the chunk level REPLACES warc_ts and the persisted table is a
            # first-class input (fold with snapshot_col='chunk')
            from htrc_feature_reader_ray.stages.chunk import chunked_tokenlist
            from htrc_feature_reader_ray.stages.extract import token_counts

            def build_tokens():
                return chunked_tokenlist(
                    token_counts(extracted()), target=chunk_target,
                    num_buckets=num_buckets, **chunk_kwargs,
                )
        else:
            def build_tokens():
                return folded_token_counts(extracted(), **chunk_kwargs)

        _, manifests["tokens"] = run_stage(
            os.path.join(out_dir, "tokens"),
            build_tokens,
            key="url", num_buckets=num_buckets, inputs=inputs,
            params={"token_kwargs": {k: str(v) for k, v in token_kwargs.items()}},
        )
    if "sections" in tables:
        _, manifests["sections"] = run_stage(
            os.path.join(out_dir, "sections"),
            lambda: section_features(sections_long(extracted())),
            key="url", num_buckets=num_buckets, inputs=inputs,
        )
    if "chars" in tables:
        _, manifests["chars"] = run_stage(
            os.path.join(out_dir, "chars"),
            lambda: line_chars(extracted()),
            key="url", num_buckets=num_buckets, inputs=inputs,
        )
    if "meta" in tables:
        def meta():
            import pyarrow as pa

            def per_batch(batch: pa.Table) -> pa.Table:
                g = batch.group_by(["url", "lang"]).aggregate(
                    [("warc_ts", "min"), ("warc_ts", "max"), ([], "count_all")]
                )
                return g.rename_columns(
                    ["url", "lang", "first_ts", "last_ts", "n_snapshots"]
                )

            # per-url groups may span batches -> global fold; url
            # cardinality is corpus-scale, so bucketed (vectorized pandas)
            # rather than the per-group-Python native aggregate
            from htrc_feature_reader_ray.stages.partition import (
                bucketed_aggregate,
            )

            partial = read_pages(sf_dir, drop_text=True).map_batches(
                per_batch, batch_format="pyarrow"
            )
            return bucketed_aggregate(
                partial, ["url", "lang"],
                {
                    "first_ts": ("first_ts", "min"),
                    "last_ts": ("last_ts", "max"),
                    "n_snapshots": ("n_snapshots", "sum"),
                },
                num_buckets=num_buckets,
            )

        _, manifests["meta"] = run_stage(
            os.path.join(out_dir, "meta"), meta,
            key="url", num_buckets=num_buckets, inputs=inputs,
        )
    return manifests


def read_lake(out_dir: str, table: str):
    """Read one logical table back as a Dataset; MissingDataError when the
    lake lacks it (the reference's missing-table discipline,
    parsers.py:20-21 / test_parsers.py:28-78)."""
    path = os.path.join(out_dir, table)
    if not os.path.isdir(path):
        raise MissingDataError(f"lake at {out_dir} has no '{table}' table")
    return ray.data.read_parquet(path)


def read_lake_entity(out_dir: str, table: str, url: str):
    """Single-entity read with BUCKET PRUNING — the lake analog of
    ``TreeResolver.path_for`` random access (resolvers.py:30-100): the
    lake layout is ``bucket=hash(url)%B``, and the manifest records the
    key and B, so a one-url read opens exactly ONE bucket directory
    (1/B of the corpus) instead of filtering a full scan. This is the
    read path :func:`~htrc_feature_reader_ray.stages.fold.
    term_snapshot_matrix`-style per-entity ops should feed on.

    Equal to ``read_lake(...).filter(url == ...)`` by pytest; falls back
    to exactly that full-scan filter when the lake's manifest is absent
    or keyed on something other than url-hash buckets."""
    import pyarrow as pa
    import pyarrow.compute as pc

    path = os.path.join(out_dir, table)
    if not os.path.isdir(path):
        raise MissingDataError(f"lake at {out_dir} has no '{table}' table")

    def only(t: pa.Table) -> pa.Table:
        if "bucket" in t.column_names:  # layout plumbing, not data
            t = t.drop_columns(["bucket"])
        return t.filter(pc.equal(t.column("url"), url))

    bdir = _entity_bucket_dir(path, url)
    if bdir is None:
        return ray.data.read_parquet(path).map_batches(
            only, batch_format="pyarrow")
    if not os.path.isdir(bdir):  # bucket empty for this hash slice
        empty = ray.data.read_parquet(path).limit(0)
        return empty.map_batches(only, batch_format="pyarrow")
    return ray.data.read_parquet(bdir).map_batches(
        only, batch_format="pyarrow")


def _entity_bucket_dir(table_path: str, url: str):
    """The ONE bucket directory holding ``url``'s rows, from the lake
    manifest's (key, num_buckets) — or None when the lake is not
    url-hash-bucketed (callers then fall back to the full-scan filter)."""
    from htrc_feature_reader_ray.functions.ids import hash_bucket
    from htrc_feature_reader_ray.state.lineage import _load_manifest

    m = _load_manifest(table_path)
    if (m is None or m.get("key") != "url"
            or m.get("partition_col", "bucket") != "bucket"):
        return None
    b = int(hash_bucket([url], int(m["num_buckets"]))[0])
    return os.path.join(table_path, f"bucket={b}")
