"""Link-graph audit: the structural-health battery a crawl team runs over
its link graph before trusting rank signals or scheduling decisions — how
connected is the graph (components, degree shape), how cohesive
(clustering, coreness), how healthy is the crawl itself (frontier size,
per-host resolution rate), which pages matter (pagerank, sampled harmonic
centrality), and where the next links live (structural link prediction).

Every section is an engine operator (see COVERAGE.md), each individually
driver-oracled; this example composes them into the one-shot report a real
pipeline materializes next to its crawl. The html parse happens ONCE: the
distinct edge list is extracted and materialized (it is the loop-invariant
state of the iterative ops and the input of every section), then each
analysis streams over it.

Run: python examples/link_graph_audit.py [sf_dir]
"""

import sys


def audit_graph(sf_dir: str) -> dict:
    from htrc_feature_reader_ray.sources.pages import read_pages
    from htrc_feature_reader_ray.stages.linkgraph import (
        coreness,
        crawl_frontier,
        degree_assortativity,
        degree_histogram,
        edge_reciprocity,
        extract_links,
        harmonic_centrality,
        link_components,
        link_degree,
        link_prediction,
        link_resolution_rate,
        pagerank,
        triangle_stats,
    )

    edges = extract_links(read_pages(sf_dir, drop_text=True)).materialize()
    report = {}

    # 1. connectivity: weakly-connected components + the degree shape
    # (histogram of the out/in degree table) — the first two plots of any
    # graph census
    degree = link_degree(edges).materialize()
    report["components"] = (
        link_components(edges).to_pandas()
        .sort_values(["component", "url"]).reset_index(drop=True))
    report["degree_histogram"] = (
        degree_histogram(degree).to_pandas()
        .sort_values(["kind", "degree_bucket"]).reset_index(drop=True))

    # 2. cohesion: global clustering + full core decomposition +
    # degree assortativity + reciprocity — is this a community-structured
    # web neighborhood or a spam farm of star hubs
    report["clustering"] = triangle_stats(edges).reset_index(drop=True)
    report["coreness"] = (
        coreness(edges).to_pandas()
        .sort_values(["coreness", "url"], ascending=[False, True])
        .reset_index(drop=True))
    report["assortativity"] = (
        degree_assortativity(edges).to_pandas().reset_index(drop=True))
    report["reciprocity"] = (
        edge_reciprocity(edges).to_pandas().reset_index(drop=True))

    # 3. crawl health: undiscovered frontier + per-host outlink
    # resolution (the dead-link / dangling-pagerank-mass localization)
    report["frontier"] = (
        crawl_frontier(edges).to_pandas()
        .sort_values("url").reset_index(drop=True))
    report["resolution"] = (
        link_resolution_rate(edges).to_pandas()
        .sort_values("host").reset_index(drop=True))

    # 4. importance: top pagerank mass + sampled harmonic centrality
    # (the disconnectedness-native absolute-scale companion)
    report["pagerank_top"] = (
        pagerank(edges, iterations=3)
        .sort("rank", descending=True).limit(50).to_pandas()
        .reset_index(drop=True))
    report["harmonic"] = (
        harmonic_centrality(edges).to_pandas()
        .sort_values(["harmonic_ppm", "url"], ascending=[False, True])
        .reset_index(drop=True))

    # 5. where the next links live: structural link prediction over the
    # undirected view (frontier prioritization / related-page candidates)
    report["suggestions"] = (
        link_prediction(edges, min_cn=2).to_pandas()
        .sort_values(["jaccard_ppm", "u", "v"],
                     ascending=[False, True, True]).reset_index(drop=True))

    return report


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    report = audit_graph(sf_dir)
    return {name: len(frame) for name, frame in report.items()}


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    import json

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    print(json.dumps(main(*sys.argv[1:])))
    ray.shutdown()
