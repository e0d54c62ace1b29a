"""htrc_feature_reader_ray — a Ray-Data-native feature-engineering engine.

A from-scratch re-expression of the query/data-processing capabilities of
htrc/htrc-feature-reader (reference at /root/reference, cited as file:line in
docstrings), generalized from per-book tokenlist reshaping to point-in-time
feature engineering over Common-Crawl-style web pages
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful stages,
``groupby``/``sort`` only where an all-to-all exchange is semantically required.

No module in this package calls ``ray.init()`` — the driver owns the session.
"""

from htrc_feature_reader_ray.errors import MissingDataError, MissingFieldError

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy re-exports of the main operator surface (keeps bare import light
    — no Ray import until an operator is touched)."""
    surface = {
        "read_pages": ("htrc_feature_reader_ray.sources.pages", "read_pages"),
        "extract_pages": ("htrc_feature_reader_ray.stages.extract", "extract_pages"),
        "token_counts": ("htrc_feature_reader_ray.stages.extract", "token_counts"),
        "folded_token_counts": (
            "htrc_feature_reader_ray.stages.extract", "folded_token_counts"),
        "fold_tokenlist": ("htrc_feature_reader_ray.stages.fold", "fold_tokenlist"),
        "distinct_tokens": ("htrc_feature_reader_ray.stages.fold", "distinct_tokens"),
        "term_freqs_topk": ("htrc_feature_reader_ray.stages.fold", "term_freqs_topk"),
        "term_snapshot_matrix": (
            "htrc_feature_reader_ray.stages.fold", "term_snapshot_matrix"),
        "broadcast_asof_join": (
            "htrc_feature_reader_ray.stages.temporal", "broadcast_asof_join"),
        "partitioned_asof_join": (
            "htrc_feature_reader_ray.stages.temporal", "partitioned_asof_join"),
        "lag_lead": ("htrc_feature_reader_ray.stages.temporal", "lag_lead"),
        "sessionize": ("htrc_feature_reader_ray.stages.temporal", "sessionize"),
        "tumbling_window": (
            "htrc_feature_reader_ray.stages.temporal", "tumbling_window"),
        "backfill": ("htrc_feature_reader_ray.stages.temporal", "backfill"),
        "chunk_units": ("htrc_feature_reader_ray.stages.chunk", "chunk_units"),
        "chunked_tokenlist": (
            "htrc_feature_reader_ray.stages.chunk", "chunked_tokenlist"),
        "exact_dedup": ("htrc_feature_reader_ray.stages.dedup", "exact_dedup"),
        "minhash_dedup_pairs": (
            "htrc_feature_reader_ray.stages.dedup", "minhash_dedup_pairs"),
        "simhash": ("htrc_feature_reader_ray.stages.dedup", "simhash"),
        "embedding_dedup_pairs": (
            "htrc_feature_reader_ray.stages.dedup", "embedding_dedup_pairs"),
        "dedup_clusters": (
            "htrc_feature_reader_ray.stages.dedup", "dedup_clusters"),
        "duplicated_spans": (
            "htrc_feature_reader_ray.stages.dedup", "duplicated_spans"),
        "extract_metadata": (
            "htrc_feature_reader_ray.stages.metadata", "extract_metadata"),
        "numeric_profile": (
            "htrc_feature_reader_ray.stages.profile", "numeric_profile"),
        "exact_quantiles": (
            "htrc_feature_reader_ray.stages.profile", "exact_quantiles"),
        "stratified_sample": (
            "htrc_feature_reader_ray.stages.sample", "stratified_sample"),
        "hopping_window": (
            "htrc_feature_reader_ray.stages.temporal", "hopping_window"),
        "rolling_key_features": (
            "htrc_feature_reader_ray.stages.temporal", "rolling_key_features"),
        "topk_per_group": (
            "htrc_feature_reader_ray.stages.fold", "topk_per_group"),
        "chunk_bounds": ("htrc_feature_reader_ray.stages.chunk", "chunk_bounds"),
        "bucket_join": (
            "htrc_feature_reader_ray.stages.partition", "bucket_join"),
        "bloom_join": (
            "htrc_feature_reader_ray.stages.partition", "bloom_join"),
        "mark_late_events": (
            "htrc_feature_reader_ray.stages.temporal", "mark_late_events"),
        "write_training_shards": (
            "htrc_feature_reader_ray.pipelines.export",
            "write_training_shards"),
        "TreeResolver": (
            "htrc_feature_reader_ray.sources.jsonvol", "TreeResolver"),
        "CachedResolver": (
            "htrc_feature_reader_ray.sources.jsonvol", "CachedResolver"),
        "extract_links": (
            "htrc_feature_reader_ray.stages.linkgraph", "extract_links"),
        "link_degree": (
            "htrc_feature_reader_ray.stages.linkgraph", "link_degree"),
        "pagerank": ("htrc_feature_reader_ray.stages.linkgraph", "pagerank"),
        "cosine_topk": ("htrc_feature_reader_ray.stages.similarity", "cosine_topk"),
        "lsh_topk": ("htrc_feature_reader_ray.stages.similarity", "lsh_topk"),
        "flagship": ("htrc_feature_reader_ray.pipelines.flagship", "flagship"),
        "save_feature_lake": ("htrc_feature_reader_ray.pipelines.etl",
                              "save_feature_lake"),
        "read_lake": ("htrc_feature_reader_ray.pipelines.etl", "read_lake"),
        "EngineConfig": ("htrc_feature_reader_ray.config", "EngineConfig"),
        "tfidf": ("htrc_feature_reader_ray.stages.curate", "tfidf"),
        "doc_frequency": (
            "htrc_feature_reader_ray.stages.curate", "doc_frequency"),
        "term_frequencies": (
            "htrc_feature_reader_ray.stages.curate", "term_frequencies"),
        "redact_pii": ("htrc_feature_reader_ray.stages.curate", "redact_pii"),
        "repetition_stats": (
            "htrc_feature_reader_ray.stages.curate", "repetition_stats"),
        "ngram_top": ("htrc_feature_reader_ray.stages.curate", "ngram_top"),
        "broadcast_membership_filter": (
            "htrc_feature_reader_ray.stages.curate",
            "broadcast_membership_filter"),
        "contamination_flags": (
            "htrc_feature_reader_ray.stages.curate", "contamination_flags"),
        "ngram_contamination": (
            "htrc_feature_reader_ray.stages.curate", "ngram_contamination"),
        "ngram_decontaminate": (
            "htrc_feature_reader_ray.stages.curate", "ngram_decontaminate"),
        "pack_sequences": (
            "htrc_feature_reader_ray.stages.pack", "pack_sequences"),
        "interval_join": (
            "htrc_feature_reader_ray.stages.temporal", "interval_join"),
        "approx_distinct": (
            "htrc_feature_reader_ray.stages.sketch", "approx_distinct"),
        "countmin_build": (
            "htrc_feature_reader_ray.stages.sketch", "countmin_build"),
        "countmin_estimate": (
            "htrc_feature_reader_ray.stages.sketch", "countmin_estimate"),
        "grouped_profile": (
            "htrc_feature_reader_ray.stages.profile", "grouped_profile"),
        "normalize_features": (
            "htrc_feature_reader_ray.stages.profile", "normalize_features"),
        "group_stats": (
            "htrc_feature_reader_ray.stages.profile", "group_stats"),
        "mixture_sample": (
            "htrc_feature_reader_ray.stages.sample", "mixture_sample"),
        "deterministic_shuffle": (
            "htrc_feature_reader_ray.stages.sample", "deterministic_shuffle"),
        "build_vocab": (
            "htrc_feature_reader_ray.stages.vocab", "build_vocab"),
        "encode_tokens": (
            "htrc_feature_reader_ray.stages.vocab", "encode_tokens"),
        "corpus_token_counts": (
            "htrc_feature_reader_ray.stages.vocab", "corpus_token_counts"),
        "unigram_stats": (
            "htrc_feature_reader_ray.stages.vocab", "unigram_stats"),
        "hash_split": (
            "htrc_feature_reader_ray.stages.sample", "hash_split"),
        "group_kfold": (
            "htrc_feature_reader_ray.stages.sample", "group_kfold"),
        "cramers_v": (
            "htrc_feature_reader_ray.stages.profile", "cramers_v"),
        "calibration_bins": (
            "htrc_feature_reader_ray.stages.profile", "calibration_bins"),
        "psi_drift": (
            "htrc_feature_reader_ray.stages.profile", "psi_drift"),
        "woe_iv": (
            "htrc_feature_reader_ray.stages.profile", "woe_iv"),
        "pr_curve": (
            "htrc_feature_reader_ray.stages.profile", "pr_curve"),
        "robust_scale": (
            "htrc_feature_reader_ray.stages.profile", "robust_scale"),
        "dedup_cluster_sizes": (
            "htrc_feature_reader_ray.stages.dedup", "dedup_cluster_sizes"),
        "sitemap_coverage": (
            "htrc_feature_reader_ray.stages.urltools", "sitemap_coverage"),
        "matryoshka_quality": (
            "htrc_feature_reader_ray.stages.similarity",
            "matryoshka_quality"),
        "int8_quant_error": (
            "htrc_feature_reader_ray.stages.similarity",
            "int8_quant_error"),
        "pca_power": (
            "htrc_feature_reader_ray.stages.similarity", "pca_power"),
        "link_prediction": (
            "htrc_feature_reader_ray.stages.linkgraph", "link_prediction"),
        "token_windows": (
            "htrc_feature_reader_ray.stages.chunk", "token_windows"),
        "snapshot_change": (
            "htrc_feature_reader_ray.stages.temporal", "snapshot_change"),
        "rolling_time_aggregate": (
            "htrc_feature_reader_ray.stages.temporal",
            "rolling_time_aggregate"),
        "quantile_bucketize": (
            "htrc_feature_reader_ray.stages.profile", "quantile_bucketize"),
        "ecdf": (
            "htrc_feature_reader_ray.stages.profile", "ecdf"),
        "incremental_dedup": (
            "htrc_feature_reader_ray.state.dedup_index", "incremental_dedup"),
        "create_dedup_index": (
            "htrc_feature_reader_ray.state.dedup_index", "create_dedup_index"),
        "line_dedup": ("htrc_feature_reader_ray.stages.dedup", "line_dedup"),
        "boilerplate_lines": (
            "htrc_feature_reader_ray.stages.dedup", "boilerplate_lines"),
        "build_postings": (
            "htrc_feature_reader_ray.stages.curate", "build_postings"),
        "pmi_collocations": (
            "htrc_feature_reader_ray.stages.curate", "pmi_collocations"),
        "mirror_hosts": (
            "htrc_feature_reader_ray.stages.urltools", "mirror_hosts"),
        "url_templates": (
            "htrc_feature_reader_ray.stages.urltools", "url_templates"),
        "crawl_depth": (
            "htrc_feature_reader_ray.stages.linkgraph", "crawl_depth"),
        "related_pages": (
            "htrc_feature_reader_ray.stages.linkgraph", "related_pages"),
        "hits": ("htrc_feature_reader_ray.stages.linkgraph", "hits"),
        "read_wet": ("htrc_feature_reader_ray.sources.wet", "read_wet"),
        "write_wet_shards": (
            "htrc_feature_reader_ray.sources.wet", "write_wet_shards"),
        "shared_key_pair_counts": (
            "htrc_feature_reader_ray.stages.partition",
            "shared_key_pair_counts"),
        "daily_autocorr": (
            "htrc_feature_reader_ray.stages.temporal", "daily_autocorr"),
        "gap_stats": (
            "htrc_feature_reader_ray.stages.temporal", "gap_stats"),
        "burst_detection": (
            "htrc_feature_reader_ray.stages.temporal", "burst_detection"),
        "transition_entropy": (
            "htrc_feature_reader_ray.stages.temporal",
            "transition_entropy"),
        "logrank_test": (
            "htrc_feature_reader_ray.stages.temporal", "logrank_test"),
        "activity_half_life": (
            "htrc_feature_reader_ray.stages.temporal",
            "activity_half_life"),
        "max_silence": (
            "htrc_feature_reader_ray.stages.temporal", "max_silence"),
        "seasonal_strength": (
            "htrc_feature_reader_ray.stages.temporal", "seasonal_strength"),
        "growth_accounting": (
            "htrc_feature_reader_ray.stages.temporal", "growth_accounting"),
        "hour_concentration": (
            "htrc_feature_reader_ray.stages.profile", "hour_concentration"),
        "dow_chi2": (
            "htrc_feature_reader_ray.stages.profile", "dow_chi2"),
        "weighted_median": (
            "htrc_feature_reader_ray.stages.profile", "weighted_median"),
        "datetime_features": (
            "htrc_feature_reader_ray.stages.profile", "datetime_features"),
        "count_encoding": (
            "htrc_feature_reader_ray.stages.profile", "count_encoding"),
        "kmeans_silhouette": (
            "htrc_feature_reader_ray.stages.similarity",
            "kmeans_silhouette"),
        "harmonic_centrality": (
            "htrc_feature_reader_ray.stages.linkgraph",
            "harmonic_centrality"),
        "link_resolution_rate": (
            "htrc_feature_reader_ray.stages.linkgraph",
            "link_resolution_rate"),
        "retrieval_pr_at_k": (
            "htrc_feature_reader_ray.stages.curate", "retrieval_pr_at_k"),
    }
    if name in surface:
        import importlib

        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = [
    "MissingDataError",
    "MissingFieldError",
    "__version__",
]
