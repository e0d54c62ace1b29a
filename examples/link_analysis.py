"""Crawl link-graph analysis: edges -> degree/anchor index -> PageRank ->
frontier — the between-document half of crawl curation (the reference
reshapes WITHIN one volume; a web corpus also ranks and schedules BY the
graph).

One html parse feeds every consumer: the edge list is extracted once,
materialized (it is the loop-invariant state of PageRank and the input of
three more ops), and each analysis is an engine operator over it.

Run: python examples/link_analysis.py [sf_dir]
"""

import sys


def analyze(sf_dir: str) -> dict:
    from htrc_feature_reader_ray.sources.pages import read_pages
    from htrc_feature_reader_ray.stages.linkgraph import (
        crawl_frontier,
        extract_links,
        inlink_anchor_counts,
        k_core,
        link_degree,
        pagerank,
        triangle_stats,
    )

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    pages = read_pages(sf_dir, drop_text=True)
    edges = extract_links(pages, with_anchors=True).materialize()
    # anchored edges are distinct per (src, dst, anchor); re-distinct after
    # dropping the anchor so an edge restated under two anchor texts cannot
    # double-count in degree/rank
    no_anchor = bucketed_map_groups(
        edges.drop_columns(["anchor"]), "src_url",
        lambda df: df.drop_duplicates(["src_url", "dst_url"]), num_buckets=16,
    ).materialize()

    degree = link_degree(no_anchor)
    anchors = inlink_anchor_counts(edges)
    ranks = pagerank(no_anchor, iterations=3)
    frontier = crawl_frontier(no_anchor)
    census = triangle_stats(no_anchor)
    core = k_core(no_anchor, k=2)

    top = ranks.sort("rank", descending=True).limit(5).to_pandas()
    return {
        "edges": edges.count(),
        "urls_with_degree": degree.count(),
        "anchor_index_rows": anchors.count(),
        "frontier_urls": frontier.count(),
        "top_ranked": top["url"].tolist(),
        "clustering_ppm": int(census.global_cc_ppm.iloc[0]),
        "two_core_urls": core.count(),
    }


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    out = analyze(sf_dir)
    print(out)
    return out


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
