"""sf0.1 oracle rehearsal for the HEAVY TAIL (round-2 judge task 7).

The default gate (`test_oracle_parity`) runs every query at sf0.001 and the
driver panel at sf0.01; BENCH reports at sf0.1 — this marked suite pins
correctness at the scale BENCH reports for the ~35 most expensive queries
(graph fixpoints, the dedup family, retrieval, curation). Deselected by
default (pytest.ini addopts `-m "not sf01"`); run with:

    python -m pytest -m sf01 tests/test_sf01_heavy.py -q

Budget note: the DuckDB oracles replay graph fixpoints as unrolled CTE
chains — at sf0.1 the oracle side can dominate the wall; that cost is the
point (correctness pinned where BENCH measures).
"""

import duckdb
import pytest

SF01 = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()

#: the heavy tail by BENCH_r02 wall time (descending), all oracled
HEAVY = [
    "bowtie_structure", "coreness", "knn_label_propagation",
    "jaccard_join", "url_feature_store", "dedup_keep_best",
    "retrieval_ndcg_at_k", "corpus_curation", "kmeans_semdedup",
    "local_supplier_revenue", "retrieval_pr_at_k", "dedup_cluster_sizes",
    "dedup_minhash", "link_prediction", "dedup_clusters",
    "events_skew_join", "k_core", "harmonic_centrality",
    "sitemap_coverage", "trending_terms", "degree_assortativity",
    "association_rules", "dsir_weights", "pq_codes", "hop_histogram",
    "boilerplate_lines", "bigram_surprisal", "rrf_hybrid",
    "bootstrap_ci", "flagship", "split_leakage", "bloom_decontaminate",
    "line_dedup", "dedup_exact", "pagerank",
    # round-3 session additions worth the sf0.1 pin (graph + LM + grid)
    "modularity", "rich_club", "kneser_ney_lm", "dominant_period",
    "holt_forecast", "l_diversity",
    # round-4: the remaining dual-path op not yet pinned at sf0.1
    "neighbor_degree_curve",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.sf01
@pytest.mark.parametrize("name", HEAVY)
def test_sf01_heavy_query_parity(duck01, name):
    import __ray_entry__ as m
    from tests.util import assert_frames_match, to_pandas

    queries, oracles = m.queries(), m.oracle_sql()
    got = to_pandas(queries[name](SF01))
    want = duck01.execute(oracles[name]).df()
    assert_frames_match(got, want)
