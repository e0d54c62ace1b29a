"""Training-shard export: documents → token counts → token-budget packing →
shard-partitioned parquet lake with a lineage manifest.

The end-of-pipeline op a 100 TB curation run feeds a trainer with: every
document gets a deterministic (shard_id, offset_in_shard) via the
distributed prefix sum (stages/pack.py), document text is re-attached with
ONE co-partitioning bucket join, and the lake is written one directory per
shard (``shard_id=K/``) — the resumable layout (never one giant file;
ziptree-analog write-once discipline via the atomic tmp+rename and manifest
in state/lineage.py).

Resume granularity is the stage (manifest-match skip): shard membership
depends on the GLOBAL prefix sum, so unlike hash buckets a single missing
shard is not recomputable from the inputs alone — re-running the stage is
the correct recovery, and the manifest makes it a no-op when inputs are
unchanged.
"""

from __future__ import annotations


def write_training_shards(docs_path: str, out_dir: str, *, budget: int,
                          id_col: str = "doc_id", text_col: str = "text",
                          num_buckets: int = 32) -> dict:
    """Pack every document of ``docs_path`` (parquet with id + text) into
    fixed token-budget shards and persist ``out_dir/shard_id=K/``.

    Returns the lineage manifest (per-shard row counts under "buckets")."""
    import ray.data

    from htrc_feature_reader_ray.stages.pack import (
        pack_sequences,
        parquet_column_bounds,
    )
    from htrc_feature_reader_ray.stages.partition import bucket_join
    from htrc_feature_reader_ray.stages.textstats import token_count
    from htrc_feature_reader_ray.state.lineage import (
        _load_manifest,
        fingerprint_inputs,
        write_partitioned,
    )

    # manifest-match skip: unchanged input + params -> the lake is current
    existing = _load_manifest(out_dir)
    if (
        existing is not None
        and existing.get("inputs") == fingerprint_inputs([docs_path])
        and existing.get("params") == {"budget": budget}
        and existing.get("partition_col") == "shard_id"
    ):
        return existing

    docs = ray.data.read_parquet(docs_path, columns=[id_col, text_col])
    bounds = parquet_column_bounds(docs_path, id_col)
    counts = token_count(docs, text_col=text_col, id_cols=(id_col,))
    packed = pack_sequences(
        counts, weight_col="n_tokens", id_col=id_col, budget=budget,
        id_bounds=bounds, num_buckets=num_buckets,
    )
    with_text = bucket_join(
        packed, docs, left_key=id_col, right_key=id_col,
        num_buckets=num_buckets,
    )
    return write_partitioned(
        with_text, out_dir, key=id_col, num_buckets=num_buckets,
        partition_col="shard_id", inputs=[docs_path],
        params={"budget": budget},
    )
