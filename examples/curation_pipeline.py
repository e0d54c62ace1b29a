"""End-to-end training-data curation: quality + language filter, near-dup
removal, token-budget shard export — the pipeline a reference user scales
up to when their per-volume scripts outgrow one machine.

Every stage is an engine operator (see COVERAGE.md); the composition is
the same one the oracled `corpus_curation` driver query verifies.

Run: python examples/curation_pipeline.py [docs_parquet] [out_dir]
"""

import sys


def curate_and_pack(docs_path: str, out_dir: str, *, budget: int = 4096):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import (
        dedup_clusters,
        minhash_dedup_pairs,
    )
    from htrc_feature_reader_ray.stages.partition import bucket_join
    from htrc_feature_reader_ray.stages.textstats import langid, quality_score
    from htrc_feature_reader_ray.pipelines.export import write_training_shards

    def docs():
        return ray.data.read_parquet(docs_path, columns=["doc_id", "text"])

    # 1. per-doc quality + language (stateless vectorized batches)
    quality = quality_score(docs())
    lang = langid(docs()).map_batches(
        lambda t: t.rename_columns(["lang_doc_id", "pred_lang"]),
        batch_format="pyarrow",
    )
    feats = bucket_join(quality, lang, left_key="doc_id",
                        right_key="lang_doc_id", num_buckets=16)
    filtered = feats.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t.column("pred_lang"), "en"),
                    pc.greater_equal(t.column("n_tokens"), 30))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )

    # 2. near-dup losers out (MinHash-LSH pairs -> clusters -> anti join)
    pairs = minhash_dedup_pairs(
        docs(), corpus_rows=pq.ParquetFile(docs_path).metadata.num_rows
    )
    losers = dedup_clusters(pairs).map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("doc_id"), t.column("cluster_id"))
        ).select(["doc_id"]).rename_columns(["loser_id"]),
        batch_format="pyarrow",
    )
    kept = bucket_join(filtered, losers, left_key="doc_id",
                       right_key="loser_id", how="anti", num_buckets=16)
    n_kept = kept.count()

    # 3. pack the FULL corpus into fixed token-budget shards (packing is
    # independent of the filter here; join kept ids upstream to pack only
    # survivors)
    manifest = write_training_shards(docs_path, out_dir, budget=budget)
    return {"kept": n_kept, "shards": len(manifest["buckets"]),
            "rows_packed": manifest["row_count"]}


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    docs = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.001/documents.parquet"
    )
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_example"
    print(curate_and_pack(docs, out))
    ray.shutdown()
