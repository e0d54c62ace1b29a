"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes
(RAY_GRAFT_CPUS=8 and =32) on the same input and reports both throughputs and
the scaling efficiency (the sandbox evidence for the N→4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Scale knob: snapshots per url (pages = docs × (1 + doc_id%3) × MULT).
# Correctness gates run with MULT=1; the bench defaults to 20 so the pipeline
# is compute-bound rather than startup-bound at the small sampled SF tiers.
SNAPSHOT_MULT = os.environ.setdefault("GRAFT_SNAPSHOT_MULT", "20")

BENCH_QUERIES = [
    # name in __ray_entry__.queries()
    "flagship",            # headline: extract -> features -> windows -> join
    "tokenlist",
    "corpus_term_freqs",
    "asof_backward",
    "sessionize",
    "window_tumbling",
    "chunked_tokenlist",
    "dedup_exact",
    "dedup_minhash",
    "dedup_clusters",
    "duplicated_spans",
    "ann_cosine_topk",
    "quality_score",
    # round-2 ops
    "metadata",
    "rolling_features",
    "window_hopping",
    "dedup_embedding_cosine",
    # curation ops
    "tfidf",
    "repetition_stats",
    "pii_redaction",
    "pack_sequences",
    "bigrams_top40",
    "corpus_curation",
    "approx_distinct_users",
    "interval_join",
    "late_events",
    # training-prep ops
    "ngram_decontaminate",
    "deterministic_shuffle",
    "build_vocab",
    "encode_tokens",
    "normalize_features",
    "token_windows",
    "quantile_bucketize",
    "rolling_time",
    "top_k_per_group",
    "ecdf",
    "unigram_stats",
    "snapshot_change",
    # link-graph ops
    "link_degree",
    "pagerank",
    "link_communities",
    "url_feature_store",
    # late round-2 ops
    "head_meta",
    "line_dedup",
    "build_postings",
    "crawl_depth",
    "pmi_collocations",
    "boilerplate_lines",
    "related_pages",
    "hits",
    # round-2 continuation ops
    "funnel_steps",
    "cohort_retention",
    "rfm_features",
    "user_session_stats",
    "rolling_active_users",
    "value_outliers",
    "trending_terms",
    "quality_rule_flags",
    "host_quality",
    "syndicated_content",
    "basket_pairs",
    "triangle_stats",
    "k_core",
    # round-2 feature-vector / rollup ops
    "pivot_user_events",
    "name_dedup_pairs",
    "value_mad_outliers",
    "degree_assortativity",
    "rollup_lang_source",
    "value_hour_corr",
    "decayed_score",
    "lexical_diversity",
    "lang_source_chi2",
    "association_rules",
    "snapshot_intervals",
    "jaccard_join",
    "term_matrix",
    "snapshot_diff",
    "personalized_pagerank",
    "interpolate_daily",
    "reciprocity",
    "fetch_history",
    "local_clustering",
    "table_audit",
    "session_covisit",
    "bpe_merges",
    "bpe_encode",
    "cusum_flags",
    "kmeans",
    "kmeans_semdedup",
    "boolean_retrieval",
    "feature_hashing",
    "winsorize_value",
    "quantile_transform",
    "target_encoding",
    "winnow_fingerprints",
    "log2_value",
    "collapse_rare",
    "target_encoding_loo",
    "surprisal_score",
    "bloom_decontaminate",
    "kmv_lang_distinct",
    "kmv_lang_jaccard",
    "random_projection",
    "two_hop_neighbors",
    "touch_attribution",
    "bigram_lm",
    "events_skew_join",
    "cube_lang_source",
    "vocab_coverage",
    "rendezvous_shards",
    "rolling_approx_users",
    "hard_negatives",
    "embedding_minmax",
    "value_gini",
    "token_dropout",
    "wordpiece_merges",
    "bm25_topk",
    "pq_codes",
    "host_url_churn",
    "split_leakage",
    "readability",
    "pareto_sources",
    "fk_violations",
    "topn_sources_per_lang",
    "heavy_hitter_tokens",
    "bigram_surprisal",
    "lang_temperature_weights",
    "value_auc_by_day",
    "postings_size",
    "unigram_pieces",
    "unigram_encode",
    "dedup_keep_best",
    "freq_subsample",
    "wordpiece_encode",
    "dsir_weights",
    "mixture_interleave",
    "source_divergence",
    "hash_cross",
    "rrf_hybrid",
    "tokenizer_fertility",
    "mmr_rerank",
    "token_entropy",
    "simhash_drift",
    "oov_rate",
    "span_corruption",
    # round-2-late additions
    "daily_autocorr",
    "gap_stats",
    "hour_concentration",
    "dow_chi2",
    "activity_half_life",
    "max_silence",
    "seasonal_strength",
    "growth_accounting",
    "weighted_median_price",
    "datetime_features",
    "count_encoding",
    "kmeans_silhouette",
    "harmonic_centrality",
    "link_resolution_rate",
    "coreness",
    "local_supplier_revenue",
    "knn_label_propagation",
    "retrieval_pr_at_k",
    "cramers_v",
    "group_kfold",
    "calibration_bins",
    "psi_drift",
    "woe_iv",
    "pr_curve",
    "pca_power",
    "link_prediction",
    "robust_scale",
    "dedup_cluster_sizes",
    "sitemap_coverage",
    "matryoshka_quality",
    "int8_quant_error",
    "bowtie_structure",
    "embedding_isotropy",
    "spearman_rho",
    "conformal_threshold",
    "isotonic_calibration",
    "registered_domain",
    "retrieval_ndcg_at_k",
    "bradley_terry",
    "bootstrap_ci",
    "perplexity_buckets",
    "theils_u",
    "gini_split",
    "ab_lift",
    "gains_table",
    "brier_decomposition",
    "disparate_impact",
    "hop_histogram",
    "random_walks",
    "burst_detection",
    "mann_whitney",
    "mcnemar",
    "kruskal_wallis",
    "cochrans_q",
    "transition_entropy",
    "t_closeness",
    "friedman_test",
    "logrank_test",
    "vocab_richness",
    # round-3 ops
    "modularity",
    "fleiss_kappa",
    "remove_dup_spans",
    "term_matrix_dense",
    "multimodal_audio",
    "multimodal_frames",
    "anova_eta",
    "levene_bf",
    "host_assortativity",
    "rich_club",
    "l_diversity",
    "kneser_ney_lm",
    "holt_forecast",
    "dominant_period",
    "nb_confusion",
    "neighbor_degree_curve",
    "eigenvector_centrality",
    "asof_staleness",
    "best_window",
    "grouped_ols",
    "jain_fairness",
    "daily_ks_drift",
    "retrieval_bpref",
    "retrieval_ap",
    "rank_overlap_rbo",
    "return_label",
    "krippendorff_alpha",
    "gap_entropy",
]

HEADLINE = "flagship"


def _consume(result) -> int:
    """Materialize a query result enough to have actually executed it."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pd.DataFrame,)):
        return len(result)
    if isinstance(result, pa.Table):
        return result.num_rows
    # Dataset: count() executes the full pipeline in the cluster without
    # funnelling every block through the driver (we time compute, not IPC).
    return result.count()


def run_bench() -> dict:
    import shutil

    import ray

    # deterministic composite timings: the dedup composites share one
    # minhash checkpoint lake (state/lineage.run_stage under /tmp);
    # start cold so the mining cost always lands on the first composite
    # instead of depending on leftover /tmp state from earlier sessions
    shutil.rmtree("/tmp/htrc_ray_ckpt", ignore_errors=True)

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import __ray_entry__ as entry_mod

    queries = entry_mod.queries()

    # warm the OS page cache (untimed) so we measure compute+shuffle
    _consume(queries["token_count"](SF_DIR))

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        rows[name] = _consume(queries[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # single-entity pivot: bucket-pruned lake read (read_lake_entity,
    # opens ONE bucket dir) vs the full-scan filter — the r4 pushdown.
    # Lake build is manifest-checkpointed (skip-complete on rerun).
    from htrc_feature_reader_ray.pipelines.etl import (
        read_lake,
        read_lake_entity,
        save_feature_lake,
    )
    from htrc_feature_reader_ray.stages.fold import term_snapshot_matrix

    lake = "/tmp/graft_bench_lake"
    save_feature_lake(SF_DIR, lake, num_buckets=16, tables=("tokens",))
    url = read_lake(lake, "tokens").take(1)[0]["url"]
    t0 = time.perf_counter()
    piv = term_snapshot_matrix(read_lake_entity(lake, "tokens", url), url)
    timings["single_entity_pivot_pruned"] = round(
        time.perf_counter() - t0, 3)
    rows["single_entity_pivot_pruned"] = len(piv)
    t0 = time.perf_counter()
    piv2 = term_snapshot_matrix(read_lake(lake, "tokens"), url)
    timings["single_entity_pivot_scan"] = round(
        time.perf_counter() - t0, 3)
    rows["single_entity_pivot_scan"] = len(piv2)

    n_docs = rows[HEADLINE]
    headline_sec = timings[HEADLINE]
    out = {
        "metric": "flagship end-to-end (extract->features->windows->join) wall time",
        "value": headline_sec,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "snapshot_mult": int(SNAPSHOT_MULT),
        "docs_per_sec": round(n_docs / headline_sec, 1) if headline_sec else None,
    }
    ray.shutdown()
    return out


def run_headline() -> dict:
    """Warm-up + median-of-3 timing of the headline pipeline (one process,
    one ray session) — the unit of the scaling measurement."""
    import statistics

    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    q = entry_mod.queries()[HEADLINE]
    rows = _consume(q(SF_DIR))  # warm-up: spawns/warms all workers
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _consume(q(SF_DIR))
        times.append(round(time.perf_counter() - t0, 3))
    sec = statistics.median(times)
    out = {
        "metric": "flagship warm wall time (median of 3)",
        "value": sec,
        "unit": "sec",
        "times": times,
        "rows": rows,
        "num_cpus": NUM_CPUS,
        "snapshot_mult": int(os.environ.get("GRAFT_SNAPSHOT_MULT", "1")),
        "docs_per_sec": round(rows / sec, 1),
        "sf": SF_DIR,
    }
    ray.shutdown()
    return out


def run_control(ncpu: int) -> dict:
    """String-light control workload: pure-numeric map_batches (tiny working
    set, compute-bound). If this scales cleanly N→4N while the string-heavy
    flagship does not, the flagship's shortfall is shared-DRAM-bandwidth
    saturation of the single host — a per-node-memory cluster would not see
    it — rather than scheduler/shuffle overhead in the engine."""
    import numpy as np

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    def burn(batch):
        x = batch["id"].astype(np.float64)
        acc = np.zeros_like(x)
        for k in range(60):
            acc += np.sin(x * (1.0 + k))
        return {"id": batch["id"], "acc": acc}

    ds = ray.data.range(40_000_000, override_num_blocks=256)
    ds.map_batches(burn, batch_format="numpy").count()  # warm-up
    t0 = time.perf_counter()
    ds.map_batches(burn, batch_format="numpy").count()
    sec = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    return {"num_cpus": ncpu, "sec": sec}


def run_scaling() -> dict:
    """N vs 4N parallelism on identical input (the in-sandbox evidence for
    the north rule's two-cluster-size criterion), at BOTH 4v16 and 8v32.

    4v16 is the primary pair: the host has 32 physical cores sharing one
    memory system, and above ~16 workers this string-heavy workload
    saturates shared DRAM bandwidth — which a real multi-node cluster
    (per-node memory) would not. Rather than assert that, the report
    includes a string-light numeric control at the same CPU counts: its
    8→32 efficiency is the scheduler/engine ceiling; the gap between
    control and flagship efficiency is the memory-system share."""
    mult = os.environ.get("GRAFT_SCALING_MULT", "500")
    pairs_env = os.environ.get("GRAFT_SCALING_PAIRS", "4:16,8:32")
    pairs = [tuple(int(x) for x in p.split(":")) for p in pairs_env.split(",")]

    def run(ncpu: int, mode: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SNAPSHOT_MULT=mult)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    results = {}
    flagship_cache: dict[int, dict] = {}
    for lo, hi in pairs:
        for n in (lo, hi):
            if n not in flagship_cache:
                flagship_cache[n] = run(n, "--headline-only")
        r_lo, r_hi = flagship_cache[lo], flagship_cache[hi]
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        results[f"{lo}v{hi}"] = {
            f"sec_{lo}": r_lo["value"],
            f"sec_{hi}": r_hi["value"],
            f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
            f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
            "speedup": round(r_lo["value"] / r_hi["value"], 3),
            "scaling_efficiency": round(eff, 3),
        }

    # optional control workload at the widest pair (fresh sessions). Only
    # relevant as DRAM-saturation evidence if a flagship pair lands < 0.8;
    # both measured pairs are >= 0.8 on this host, so default off.
    control = None
    if os.environ.get("GRAFT_SCALING_CONTROL"):
        ctl_lo, ctl_hi = pairs[-1]
        c_lo = run(ctl_lo, "--control-only")
        c_hi = run(ctl_hi, "--control-only")
        ctl_eff = (c_lo["sec"] / c_hi["sec"]) / (ctl_hi / ctl_lo)
        control = {
            f"sec_{ctl_lo}": c_lo["sec"],
            f"sec_{ctl_hi}": c_hi["sec"],
            "scaling_efficiency": round(ctl_eff, 3),
        }
    rows = next(iter(flagship_cache.values()))["rows"]
    return {
        "metric": "scaling efficiency (flagship, N vs 4N CPUs)",
        "pairs": results,
        **({"control": control} if control else {}),
        "rows": rows,
        "snapshot_mult": int(mult),
        # headline number: primary pair (first listed)
        "scaling_efficiency": results[f"{pairs[0][0]}v{pairs[0][1]}"][
            "scaling_efficiency"
        ],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_headline()))
    elif "--control-only" in sys.argv:
        print(json.dumps(run_control(NUM_CPUS)))
    else:
        print(json.dumps(run_bench()))
