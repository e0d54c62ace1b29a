"""Link-graph operators: href parsing, degree, fixed-point PageRank.

Fixture-level parity (Ray pipeline vs LINKS_SQL ground truth) is covered by
the oracle rehearsal (test_oracle_parity.py: link_edges / link_degree /
pagerank); these tests pin the operator semantics on hand-built graphs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from htrc_feature_reader_ray.stages.linkgraph import (
    PR_SCALE,
    _hrefs,
    crawl_frontier,
    extract_links,
    link_components,
    link_degree,
    pagerank,
    resolve_redirects,
)


def _pages(rows):
    return ray.data.from_arrow(
        pa.table({
            "url": pa.array([r[0] for r in rows], type=pa.string()),
            "html": pa.array([r[1] for r in rows], type=pa.binary()),
        })
    )


def _edges(pairs):
    return ray.data.from_arrow(
        pa.table({
            "src_url": pa.array([p[0] for p in pairs], type=pa.string()),
            "dst_url": pa.array([p[1] for p in pairs], type=pa.string()),
        })
    )


def test_hrefs_kernel():
    assert _hrefs(b"no links here") == []
    assert _hrefs(b'<a href="http://a/">x</a><a href="http://b/"></a>') == [
        ("http://a/", "x"), ("http://b/", ""),
    ]
    # unterminated quote: parse stops cleanly
    assert _hrefs(b'<a href="http://a/">ok</a><a href="broken') == [
        ("http://a/", "ok"),
    ]
    # href with no closing tag: empty anchor, link still captured
    assert _hrefs(b'href=""') == [("", "")]


def test_extract_links_with_anchors(ray_session):
    rows = [
        ("u1", b'<a href="d1">first</a><a href="d2">second</a>'),
        ("u1", b'<a href="d1">first</a>'),  # restated -> one edge
        ("u1", b'<a href="d1">renamed</a>'),  # same edge, new anchor text
    ]
    got = (
        extract_links(_pages(rows), with_anchors=True, num_buckets=4)
        .to_pandas()
        .sort_values(["src_url", "dst_url", "anchor"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame({
        "src_url": ["u1", "u1", "u1"],
        "dst_url": ["d1", "d1", "d2"],
        "anchor": ["first", "renamed", "second"],
    })
    pd.testing.assert_frame_equal(got, want)


def test_extract_links_distinct_and_nulls():
    rows = [
        ("u1", b'<nav><a href="d1"></a><a href="d2"></a></nav>'),
        # second snapshot of u1 restates the same links -> no duplicate edges
        ("u1", b'<nav><a href="d1"></a><a href="d2"></a></nav>'),
        ("u2", b'<a href="d1"></a>'),
        ("u3", None),
        ("u4", b"no anchors"),
    ]
    got = (
        extract_links(_pages(rows), num_buckets=4)
        .to_pandas()
        .sort_values(["src_url", "dst_url"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"src_url": ["u1", "u1", "u2"], "dst_url": ["d1", "d2", "d1"]}
    )
    pd.testing.assert_frame_equal(got, want)


def test_link_degree_full_outer_semantics():
    deg = (
        link_degree(_edges([("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]),
                    num_buckets=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({
        "url": ["a", "b", "c"],
        "out_degree": [2, 1, 1],
        "in_degree": [1, 1, 2],
    })
    pd.testing.assert_frame_equal(
        deg, want, check_dtype=False
    )
    assert deg["out_degree"].dtype == np.int64
    # source-only / sink-only urls keep a row with a zero side
    deg2 = link_degree(_edges([("s", "t")]), num_buckets=2).to_pandas()
    d = deg2.set_index("url")
    assert d.loc["s", "out_degree"] == 1 and d.loc["s", "in_degree"] == 0
    assert d.loc["t", "out_degree"] == 0 and d.loc["t", "in_degree"] == 1


def _pagerank_reference(pairs, iterations, scale=PR_SCALE, damping=85):
    """Independent pure-Python replay of the documented recurrence."""
    out = {}
    for s, d in pairs:
        out.setdefault(s, []).append(d)
    nodes = sorted({u for p in pairs for u in p})
    n = len(nodes)
    r = {u: scale // n for u in nodes}
    base = (100 - damping) * (scale // n) // 100
    for _ in range(iterations):
        s = {u: 0 for u in nodes}
        for u, dsts in out.items():
            c = r[u] // len(dsts)
            for d in dsts:
                s[d] += c
        r = {u: base + damping * s[u] // 100 for u in nodes}
    return pd.DataFrame(
        {"url": nodes, "rank": [r[u] for u in nodes]}
    )


@pytest.mark.parametrize("pairs", [
    # 3-cycle: symmetric ranks, integer drift still bit-matched
    [("a", "b"), ("b", "c"), ("c", "a")],
    # star: every leaf links the hub; hub links one leaf; l3 dangles
    [("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("hub", "l1")],
    # disconnected pair + self-loop
    [("x", "x"), ("p", "q")],
])
def test_pagerank_matches_reference_recurrence(pairs):
    got = (
        pagerank(_edges(pairs), iterations=4, num_buckets=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = _pagerank_reference(pairs, iterations=4)
    pd.testing.assert_frame_equal(got, want)


def test_pagerank_hub_outranks_leaves():
    pairs = [(f"l{i}", "hub") for i in range(20)] + [("hub", "l0")]
    pr = pagerank(_edges(pairs), iterations=3, num_buckets=4).to_pandas()
    r = pr.set_index("url")["rank"]
    assert r["hub"] > r["l0"] > r["l1"]  # l0 gets the hub's backlink
    assert (r.loc[[f"l{i}" for i in range(1, 20)]] == r["l1"]).all()


def test_pagerank_empty():
    pr = pagerank(_edges([]), iterations=2, num_buckets=2).to_pandas()
    assert len(pr) == 0


def _redirects(pairs):
    return ray.data.from_arrow(
        pa.table({
            "url": pa.array([p[0] for p in pairs], type=pa.string()),
            "target": pa.array([p[1] for p in pairs], type=pa.string()),
        })
    )


def test_resolve_redirects_chains():
    # chain a->b->c->T (3 hops), isolated d->T2 (1 hop)
    got = (
        resolve_redirects(
            _redirects([("a", "b"), ("b", "c"), ("c", "T"), ("d", "T2")]),
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({
        "url": ["a", "b", "c", "d"],
        "final_url": ["T", "T", "T", "T2"],
        "hops": np.array([3, 2, 1, 1], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(got, want)


def test_resolve_redirects_long_chain_log_rounds():
    # length-20 chain must resolve within the doubling cap (2^10 >> 20)
    pairs = [(f"u{i}", f"u{i+1}") for i in range(20)]
    got = resolve_redirects(_redirects(pairs), num_buckets=4).to_pandas()
    r = got.set_index("url")
    assert r.loc["u0", "final_url"] == "u20" and r.loc["u0", "hops"] == 20
    assert r.loc["u19", "hops"] == 1


def test_resolve_redirects_cycle_terminates():
    got = resolve_redirects(
        _redirects([("a", "b"), ("b", "a")]), num_buckets=2, max_doubling=4
    ).to_pandas()
    # no crash/hang; both rows still present with capped hop counts
    assert sorted(got["url"]) == ["a", "b"]
    assert (got["hops"] >= 1).all()


def test_resolve_redirects_empty():
    assert len(resolve_redirects(_redirects([]), num_buckets=2).to_pandas()) == 0


def test_crawl_frontier():
    # c is linked-to but never a source; a and b were both fetched
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")]
    got = sorted(
        crawl_frontier(_edges(pairs), num_buckets=4).to_pandas()["url"]
    )
    assert got == ["c"]
    # a pure cycle has no frontier
    assert len(crawl_frontier(_edges([("x", "y"), ("y", "x")]),
                              num_buckets=2).to_pandas()) == 0


def test_link_components():
    pairs = [
        ("a", "b"), ("b", "c"),          # component min 'a'
        ("q", "p"),                      # component min 'p' (direction
                                         # must not matter)
        ("z", "z"),                      # self-loop singleton
    ]
    got = (
        link_components(_edges(pairs), num_buckets=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({
        "url": ["a", "b", "c", "p", "q", "z"],
        "component": ["a", "a", "a", "p", "p", "z"],
    })
    pd.testing.assert_frame_equal(got, want)


def test_host_edges_projection_and_selfloops():
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import host_edges

    edges = ray.data.from_arrow(pa.table({
        "src_url": ["https://a.com/x", "https://a.com/y",
                    "https://a.com/x", "http://b.org/p"],
        "dst_url": ["https://a.com/z", "https://b.org/q",
                    "https://b.org/q", "https://a.com/"],
    }))
    got = (host_edges(edges, num_buckets=2).to_pandas()
           .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
    assert list(map(tuple, got.to_numpy())) == [
        ("a.com", "a.com"),   # self-loop kept
        ("a.com", "b.org"),   # two page edges collapse to one host edge
        ("b.org", "a.com"),
    ]


def _edges_ds(pairs):
    return ray.data.from_pandas(pd.DataFrame(
        {"src_url": [p[0] for p in pairs],
         "dst_url": [p[1] for p in pairs]}
    ))


def test_crawl_depth_min_over_paths_and_seeds():
    from htrc_feature_reader_ray.stages.linkgraph import crawl_depth

    # s1 -> a -> b -> c, plus shortcut s1 -> c; s2 -> b (min over seeds)
    edges = _edges_ds([
        ("s1", "a"), ("a", "b"), ("b", "c"), ("s1", "c"), ("s2", "b"),
        ("z", "s1"),  # edge INTO a seed: seeds stay depth 0
    ])
    seeds = ray.data.from_pandas(pd.DataFrame({"url": ["s1", "s2", "s2"]}))
    out = (
        crawl_depth(edges, seeds, max_hops=8, num_buckets=4)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert list(zip(out.url, out.depth)) == [
        ("a", 1), ("b", 1), ("c", 1), ("s1", 0), ("s2", 0)]
    # 'z' is unreachable along link direction -> absent


def test_crawl_depth_hop_cap_and_early_exit():
    from htrc_feature_reader_ray.stages.linkgraph import crawl_depth

    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    seeds = ray.data.from_pandas(pd.DataFrame({"url": ["n0"]}))
    capped = (
        crawl_depth(_edges_ds(chain), seeds, max_hops=3, num_buckets=4)
        .to_pandas()
    )
    assert dict(zip(capped.url, capped.depth)) == {
        "n0": 0, "n1": 1, "n2": 2, "n3": 3}
    # cycle: converges via the empty-frontier exit before max_hops
    cyc = _edges_ds([("n0", "n1"), ("n1", "n0")])
    out = crawl_depth(cyc, seeds, max_hops=8, num_buckets=4).to_pandas()
    assert dict(zip(out.url, out.depth)) == {"n0": 0, "n1": 1}


def test_crawl_depth_join_fallback_equals_broadcast():
    from htrc_feature_reader_ray.stages.linkgraph import crawl_depth

    edges = _edges_ds([("s", "a"), ("a", "b"), ("b", "c"), ("s", "c"),
                       ("c", "d")])
    seeds = ray.data.from_pandas(pd.DataFrame({"url": ["s"]}))
    bc = (crawl_depth(edges, seeds, max_hops=4, num_buckets=4)
          .to_pandas().sort_values("url").reset_index(drop=True))
    # broadcast_limit=0 forces the co-partitioned join path every round
    jn = (crawl_depth(edges, seeds, max_hops=4, num_buckets=4,
                      broadcast_limit=0)
          .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, jn)
    assert dict(zip(bc.url, bc.depth)) == {
        "s": 0, "a": 1, "b": 2, "c": 1, "d": 2}


def test_related_pages_cocitation_counts_and_cap():
    from htrc_feature_reader_ray.stages.linkgraph import related_pages

    # x,y co-cited by s1 and s2 (n_shared=2); y,z only by s2 (filtered at
    # min_shared=2); farm cites everything -> dropped by the outlink cap
    edges = _edges_ds([
        ("s1", "x"), ("s1", "y"),
        ("s2", "x"), ("s2", "y"), ("s2", "z"),
        ("farm", "x"), ("farm", "y"), ("farm", "z"), ("farm", "w"),
    ])
    out = (
        related_pages(edges, min_shared=2, max_outlinks_per_src=3,
                      num_buckets=4)
        .to_pandas().sort_values(["url_a", "url_b"]).reset_index(drop=True)
    )
    assert list(zip(out.url_a, out.url_b, out.n_shared)) == [("x", "y", 2)]
    # without the cap, farm's co-citations count
    loose = (
        related_pages(edges, min_shared=2, max_outlinks_per_src=32,
                      num_buckets=4)
        .to_pandas().sort_values(["url_a", "url_b"]).reset_index(drop=True)
    )
    assert list(zip(loose.url_a, loose.url_b, loose.n_shared)) == [
        ("x", "y", 3), ("x", "z", 2), ("y", "z", 2)]


def test_hits_exact_one_iteration_and_bucket_independence():
    from htrc_feature_reader_ray.stages.linkgraph import hits

    edges = _edges_ds([("h1", "a1"), ("h1", "a2"), ("h2", "a1")])
    out = (
        hits(edges, iterations=1, num_buckets=4)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    # a_raw = (2e6, 1e6), sum 3e6 -> a = (666666, 333333)
    # h_raw = (999999, 666666), sum 1666665 -> h = (600000, 400000) exactly
    assert list(zip(out.url, out.hub, out.authority)) == [
        ("a1", 0, 666666), ("a2", 0, 333333),
        ("h1", 600000, 0), ("h2", 400000, 0)]
    # integer arithmetic => bit-identical at any parallelism level
    out2 = (
        hits(edges, iterations=1, num_buckets=17)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_hits_empty_edges():
    from htrc_feature_reader_ray.stages.linkgraph import hits

    ds = hits(_edges_ds([]), iterations=2, num_buckets=4)
    assert sorted(ds.schema().names) == ["authority", "hub", "url"]
    assert ds.count() == 0


def test_host_outlink_mix_exact_ppm():
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import host_outlink_mix

    edges = pd.DataFrame({
        "src_url": ["https://a.com/1", "https://a.com/1", "https://a.com/2",
                    "https://b.com/x", "https://c.com/y"],
        "dst_url": ["https://a.com/2", "https://x.com/", "https://a.com/3",
                    "https://b.com/z", "https://d.com/"],
    })
    out = (host_outlink_mix(ray.data.from_pandas(edges).repartition(3))
           .to_pandas().sort_values("host").reset_index(drop=True))
    assert out["host"].tolist() == ["a.com", "b.com", "c.com"]
    assert out["n_out"].tolist() == [3, 1, 1]
    assert out["n_external"].tolist() == [1, 0, 1]
    assert out["external_ppm"].tolist() == [1_000_000 // 3, 0, 1_000_000]


def test_degree_histogram_bit_buckets():
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import degree_histogram

    deg = pd.DataFrame({
        "url": ["a", "b", "c", "d"],
        "out_degree": [0, 1, 5, 8],     # buckets 0, 1, 3, 4
        "in_degree": [3, 3, 0, 16],     # buckets 2, 2, 0, 5
    })
    out = (degree_histogram(ray.data.from_pandas(deg).repartition(2))
           .to_pandas().sort_values(["kind", "degree_bucket"])
           .reset_index(drop=True))
    got = {(r.kind, r.degree_bucket): r.n_urls for r in out.itertuples()}
    assert got == {("out", 0): 1, ("out", 1): 1, ("out", 3): 1,
                   ("out", 4): 1, ("in", 0): 1, ("in", 2): 2, ("in", 5): 1}


def test_triangle_stats_k4_plus_tail():
    """K4 (4 triangles, 12 wedges, cc=1.0 on its own) plus a pendant
    vertex: exact census through the degree-ordered wedge kernel."""
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import triangle_stats

    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    edges += [("d", "e"), ("e", "d")]  # duplicate + reversed must collapse
    df = pd.DataFrame(edges, columns=["src_url", "dst_url"])
    out = triangle_stats(ray.data.from_pandas(df), num_buckets=4)
    row = out.iloc[0]
    assert row.n_nodes == 5 and row.n_edges == 7
    # wedges: a,b,c have d=3 (3 each), d has d=4 (6), e has d=1 (0) -> 15
    assert row.n_wedges == 15
    assert row.n_triangles == 4
    assert row.global_cc_ppm == (3 * 4 * 1_000_000) // 15


def test_k_core_clique_with_pendant_chain():
    """Triangle core + a 4-node pendant chain: 2-core peeling must cascade
    down the chain over MULTIPLE rounds (one chain end per round), then
    early-exit at the fixpoint."""
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import k_core

    edges = [("a", "b"), ("b", "c"), ("c", "a"),          # triangle
             ("c", "p1"), ("p1", "p2"), ("p2", "p3")]      # pendant chain
    df = pd.DataFrame(edges, columns=["src_url", "dst_url"])
    out = (k_core(ray.data.from_pandas(df), k=2, num_buckets=4)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert out.url.tolist() == ["a", "b", "c"]
    assert out.core_degree.tolist() == [2, 2, 2]


def test_k_core_empty_result():
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import k_core

    df = pd.DataFrame([("a", "b"), ("b", "c")],
                      columns=["src_url", "dst_url"])
    out = k_core(ray.data.from_pandas(df), k=2, num_buckets=4).to_pandas()
    assert len(out) == 0


def test_degree_assortativity_hand_graph():
    import math

    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import degree_assortativity

    # chain a->b->c->d plus hub a->{c,d}: degrees out(a)=3,out(b)=1,out(c)=1
    # in(b)=1, in(c)=2, in(d)=2
    edges = pd.DataFrame({
        "src_url": ["a", "b", "c", "a", "a"],
        "dst_url": ["b", "c", "d", "c", "d"],
    })
    out = degree_assortativity(
        ray.data.from_pandas(edges).repartition(2)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    xs = [3, 1, 1, 3, 3]   # out-degree of src per edge
    ys = [1, 2, 2, 2, 2]   # in-degree of dst per edge
    n = 5
    sx, sy = sum(xs), sum(ys)
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert [r["n"], r["sum_x"], r["sum_y"], r["sum_xx"], r["sum_yy"],
            r["sum_xy"]] == [n, sx, sy, sxx, syy, sxy]
    expect = float(n * sxy - sx * sy) / math.sqrt(
        float((n * sxx - sx * sx) * (n * syy - sy * sy)))
    assert r["corr"] == expect


def test_edge_reciprocity_hand_graph():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import edge_reciprocity

    edges = pd.DataFrame({
        "src_url": ["a", "b", "a", "c", "x"],
        "dst_url": ["b", "a", "c", "c", "y"],  # (a,b) mutual; c->c self-loop
    })
    out = edge_reciprocity(
        ray.data.from_pandas(edges).repartition(2)).to_pandas()
    r = out.iloc[0]
    # self-loop excluded: edges = ab, ba, ac, xy -> 4; reciprocal = 2
    assert [r["n_edges"], r["n_reciprocal"]] == [4, 2]
    assert r["reciprocity_ppm"] == 2 * 1_000_000 // 4


def test_local_clustering_k4_minus_edge():
    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import local_clustering

    # K4 minus edge (c,d): triangles {a,b,c} and {a,b,d}
    edges = pd.DataFrame({
        "src_url": ["a", "a", "a", "b", "b"],
        "dst_url": ["b", "c", "d", "c", "d"],
    })
    out = local_clustering(
        ray.data.from_pandas(edges).repartition(2)
    ).to_pandas().set_index("node")
    assert out.loc["a", ["degree", "n_triangles"]].tolist() == [3, 2]
    assert out.loc["a", "local_cc_ppm"] == 2 * 2 * 1_000_000 // 6
    assert out.loc["b", "n_triangles"] == 2
    assert out.loc["c", ["degree", "n_triangles"]].tolist() == [2, 1]
    assert out.loc["c", "local_cc_ppm"] == 1_000_000  # fully clustered pair


def test_two_hop_neighbors_hand_graph():
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import two_hop_neighbors

    # chain a->b->c->d plus hub: a->h, e->h (h is a sink)
    edges = pd.DataFrame({
        "src_url": ["a", "b", "c", "a", "e", "a"],
        "dst_url": ["b", "c", "d", "h", "h", "b"],  # dup a->b on purpose
    })
    got = (
        two_hop_neighbors(ray.data.from_pandas(edges).repartition(3))
        .to_pandas().set_index("url").sort_index()
    )
    # a: hop1 {b,h}, hop2 via b -> {c}  => n1=2, n2=3
    assert tuple(got.loc["a"][["n1", "n2"]]) == (2, 3)
    # b: hop1 {c}, hop2 {d} => (1, 2); c: (1, 1); e: (1, 1)
    assert tuple(got.loc["b"][["n1", "n2"]]) == (1, 2)
    assert tuple(got.loc["c"][["n1", "n2"]]) == (1, 1)
    assert tuple(got.loc["e"][["n1", "n2"]]) == (1, 1)
    assert "d" not in got.index and "h" not in got.index  # sinks absent


def test_label_communities_two_cliques_and_sql():
    import duckdb

    from htrc_feature_reader_ray.stages.linkgraph import (
        label_communities,
        label_communities_sql,
    )

    # two 4-cliques bridged by one edge: LPA must assign each clique one
    # community and the two communities must differ
    cliq_a = [f"a{i}" for i in range(4)]
    cliq_b = [f"b{i}" for i in range(4)]
    rows = []
    for grp in (cliq_a, cliq_b):
        rows += [(u, v) for u in grp for v in grp if u < v]
    rows.append(("a0", "b0"))  # bridge
    edges = pd.DataFrame(rows, columns=["src_url", "dst_url"])
    ds = ray.data.from_pandas(edges).repartition(3)

    out = (label_communities(ds, iterations=3)
           .to_pandas().sort_values("url").reset_index(drop=True))
    by = out.set_index("url")["community"]
    assert len(set(by.loc[cliq_a])) == 1
    assert len(set(by.loc[cliq_b])) == 1
    assert by.loc["a1"] != by.loc["b1"]

    # SQL replay identical
    con = duckdb.connect()
    con.register("edges_tbl", edges)
    sql = ("WITH e2 AS (SELECT DISTINCT src_url, dst_url FROM edges_tbl)"
           + label_communities_sql(iterations=3, edges_cte="e2"))
    ref = (con.execute(sql).df()
           .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref)

    # bucketed scale path (forced) emits the identical labels
    scale = (label_communities(ds, iterations=3, broadcast_limit=0)
             .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, scale)

    # zero-iteration contract: every node is its own community
    l0 = (label_communities(ds, iterations=0)
          .to_pandas().sort_values("url").reset_index(drop=True))
    assert (l0["url"] == l0["community"]).all()


def test_resource_allocation_exact_weights():
    from htrc_feature_reader_ray.stages.linkgraph import (
        RA_SCALE,
        resource_allocation,
    )

    # s1 (deg 2) cites x,y; s2 (deg 4) cites x,y,z,w; s3 (deg 1) dropped
    edges = [("s1", "x"), ("s1", "y"),
             ("s2", "x"), ("s2", "y"), ("s2", "z"), ("s2", "w"),
             ("s3", "x")]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src_url", "dst_url"]))
    out = (
        resource_allocation(ds, min_shared=1)
        .to_pandas().sort_values(["url_a", "url_b"]).reset_index(drop=True)
    )
    got = {(r.url_a, r.url_b): (r.n_shared, r.ra_score)
           for r in out.itertuples()}
    w2, w4 = RA_SCALE // 2, RA_SCALE // 4
    assert got[("x", "y")] == (2, w2 + w4)  # both sources
    assert got[("w", "x")] == (1, w4)
    assert got[("y", "z")] == (1, w4)
    assert len(got) == 6  # s2's C(4,2) pairs; s1's (x,y) merges into one
    # min_shared=2 keeps only the doubly-cited pair
    out2 = resource_allocation(ds, min_shared=2).to_pandas()
    assert len(out2) == 1 and out2.iloc[0]["ra_score"] == w2 + w4


def test_resource_allocation_dedups_multiedges_and_partitions():
    from htrc_feature_reader_ray.stages.linkgraph import (
        RA_SCALE,
        resource_allocation,
    )

    # duplicate (src,dst) rows must not inflate outdeg or pair counts
    edges = [("s", "x"), ("s", "x"), ("s", "y"), ("s", "y"), ("s", "z")]
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src_url", "dst_url"])).repartition(4)
    out = resource_allocation(ds, min_shared=1).to_pandas()
    assert len(out) == 3
    assert (out["ra_score"] == RA_SCALE // 3).all()
    assert (out["n_shared"] == 1).all()


def test_coreness_clique_triangle_chain():
    from htrc_feature_reader_ray.stages.linkgraph import coreness

    # K4 {a,b,c,d} -> coreness 3; triangle {g,h,i} hung off a -> 2;
    # pendant chain d-e-f -> e,f coreness 1
    und = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"), ("g", "h"), ("g", "i"), ("h", "i"), ("a", "g"),
           ("d", "e"), ("e", "f")]
    edges = pd.DataFrame(
        [(f"https://x/{s}", f"https://x/{t}") for s, t in und],
        columns=["src_url", "dst_url"])
    out = coreness(
        ray.data.from_pandas(edges).repartition(4), max_rounds=8
    ).to_pandas().set_index("url")["coreness"]
    want = {"a": 3, "b": 3, "c": 3, "d": 3, "g": 2, "h": 2, "i": 2,
            "e": 1, "f": 1}
    for n, c in want.items():
        assert out[f"https://x/{n}"] == c, (n, out[f"https://x/{n}"])


def test_coreness_broadcast_exchange_path_equality():
    """The node-count auto-switch must be invisible: broadcast (pinned
    integer-coded adjacency + per-round value-vector gather, the default
    at test scale) equals exchange (per-round co-partition joins, forced
    via broadcast_limit=0) — including a truncated max_rounds where both
    must report the same r-th H-iterate."""
    from htrc_feature_reader_ray.stages.linkgraph import coreness

    und = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"), ("g", "h"), ("g", "i"), ("h", "i"), ("a", "g"),
           ("d", "e"), ("e", "f"), ("f", "j"), ("j", "k"), ("k", "l")]
    edges = pd.DataFrame(
        [(f"https://x/{s}", f"https://x/{t}") for s, t in und],
        columns=["src_url", "dst_url"])
    for rounds in (1, 2, 8):
        bc = (coreness(ray.data.from_pandas(edges).repartition(4),
                       max_rounds=rounds)
              .to_pandas().sort_values("url").reset_index(drop=True))
        ex = (coreness(ray.data.from_pandas(edges).repartition(4),
                       max_rounds=rounds, broadcast_limit=0)
              .to_pandas().sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(bc, ex)


def test_link_resolution_rate_exact():
    from htrc_feature_reader_ray.stages.linkgraph import (
        link_resolution_rate,
    )

    edges = pd.DataFrame({
        "src_url": ["https://a.com/1", "https://a.com/1",
                    "https://a.com/2", "https://b.com/1"],
        "dst_url": ["https://a.com/2",       # resolved (a.com/2 is a src)
                    "https://gone.com/x",    # dead
                    "https://b.com/1",       # resolved
                    "https://gone.com/y"],   # dead
    })
    out = link_resolution_rate(
        ray.data.from_pandas(edges).repartition(3)
    ).to_pandas().set_index("host")
    assert out.loc["a.com", "n_links"] == 3
    assert out.loc["a.com", "n_resolved"] == 2
    assert out.loc["a.com", "resolved_ppm"] == 2 * 1_000_000 // 3
    assert out.loc["b.com", "n_links"] == 1
    assert out.loc["b.com", "n_resolved"] == 0
    assert out.loc["b.com", "resolved_ppm"] == 0


def test_harmonic_centrality_matches_scalar_bfs():
    import itertools

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.linkgraph import harmonic_centrality

    rng = np.random.RandomState(11)
    urls = [f"u{i}" for i in range(30)]
    pairs = [(urls[a], urls[b])
             for a, b in rng.randint(0, 30, (120, 2)) if a != b]
    edges = pd.DataFrame(pairs, columns=["src_url", "dst_url"])
    seed_mod, n_seeds, max_hops = 3, 4, 3

    # scalar replay of the documented contract (seeds: src universe)
    nodes = sorted(set(edges["src_url"]))
    h = md5_hash64(nodes)
    # int(hh) BEFORE %: numpy uint64 SCALAR % int promotes to float64
    # and corrupts values > 2^53 (the array path the engine uses stays
    # exact uint64)
    cand = sorted((int(hh), u) for hh, u in zip(h, nodes)
                  if int(hh) % seed_mod == 0)[:n_seeds]
    adj = {}
    for s, t in pairs:
        adj.setdefault(s, set()).add(t)
    expect = {}
    for _, seed in cand:
        dist = {seed: 0}
        frontier = {seed}
        for hop in range(1, max_hops + 1):
            nxt = set(itertools.chain.from_iterable(
                adj.get(u, ()) for u in frontier)) - dist.keys()
            for v in nxt:
                dist[v] = hop
            frontier = nxt
        for v, dv in dist.items():
            if dv >= 1:
                n, w = expect.get(v, (0, 0))
                expect[v] = (n + 1, w + 1_000_000 // dv)

    out = harmonic_centrality(
        ray.data.from_pandas(edges).repartition(5),
        seed_mod=seed_mod, n_seeds=n_seeds, max_hops=max_hops
    ).to_pandas().set_index("url")
    assert len(out) == len(expect)
    for v, (n, w) in expect.items():
        assert out.loc[v, "seeds_reached"] == n
        assert out.loc[v, "harmonic_ppm"] == w


def test_bfs_layers_shortest_hops():
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.linkgraph import bfs_layers

    # chain graph a->b->c->d plus shortcut a->c; pick seed_mod so ONLY
    # 'a' is a seed (probe hashes)
    urls = ["a", "b", "c", "d"]
    mod = None
    for m in range(2, 200):
        h = md5_hash64(urls) % m
        if h[0] == 0 and all(x != 0 for x in h[1:]):
            mod = m
            break
    assert mod is not None
    edges = pd.DataFrame({
        "src_url": ["a", "b", "c", "a"],
        "dst_url": ["b", "c", "d", "c"],
    })
    out = bfs_layers(ray.data.from_pandas(edges).repartition(2),
                     seed_mod=mod, max_hops=4).to_pandas(
    ).set_index("url")["hop"].to_dict()
    # shortest hops: a=0, b=1, c=1 (via shortcut), d=2
    assert out == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_layers_bounded_hops_and_early_stop():
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.linkgraph import bfs_layers

    urls = [f"n{i}" for i in range(6)]
    mod = None
    for m in range(2, 500):
        h = md5_hash64(urls) % m
        if h[0] == 0 and all(x != 0 for x in h[1:]):
            mod = m
            break
    assert mod is not None
    # path n0->n1->...->n5
    edges = pd.DataFrame({
        "src_url": urls[:-1],
        "dst_url": urls[1:],
    })
    out = bfs_layers(ray.data.from_pandas(edges), seed_mod=mod,
                     max_hops=2).to_pandas()
    # only hops 0..2 present; n3..n5 excluded
    assert set(out["url"]) == {"n0", "n1", "n2"}
    assert out["hop"].max() == 2


def test_k_truss_peels_to_fixpoint():
    import pandas as pd
    import pytest
    import ray.data

    from htrc_feature_reader_ray.stages.linkgraph import k_truss

    # two triangles sharing edge A-B (support 2), plus a pendant edge D-E
    edges = [("A", "B"), ("B", "C"), ("A", "C"),
             ("A", "D"), ("B", "D"), ("D", "E")]
    ds = ray.data.from_pandas(pd.DataFrame(
        edges, columns=["src_url", "dst_url"]))

    out = (k_truss(ds, k=3).to_pandas()
           .sort_values(["url_a", "url_b"]).reset_index(drop=True))
    # 3-truss: every triangle edge survives, pendant D-E drops
    assert list(map(tuple, out[["url_a", "url_b"]].to_numpy())) == [
        ("A", "B"), ("A", "C"), ("A", "D"), ("B", "C"), ("B", "D")]
    assert out.set_index(["url_a", "url_b"])["support"].to_dict() == {
        ("A", "B"): 2, ("A", "C"): 1, ("A", "D"): 1,
        ("B", "C"): 1, ("B", "D"): 1}

    # 4-truss (threshold 2): round 1 keeps only A-B, round 2 has no
    # triangles left -> empty fixpoint (exercises the iteration)
    out4 = k_truss(ds, k=4).to_pandas()
    assert len(out4) == 0

    with pytest.raises(ValueError):
        k_truss(ds, k=2)


def test_link_prediction_cycle_and_edge_exclusion():
    from htrc_feature_reader_ray.stages.linkgraph import link_prediction

    # 4-cycle A-B-C-D-A (directed one way; the undirected view closes it):
    # the two diagonals (A,C) and (B,D) each share BOTH their wedge
    # centers -> cn=2; all degrees are 2 -> jaccard = 2/(2+2-2) = 1e6
    pairs = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")]
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_url": [p[0] for p in pairs],
        "dst_url": [p[1] for p in pairs],
    })).repartition(3)
    out = (link_prediction(edges, min_cn=2).to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    assert list(zip(out["u"], out["v"])) == [("A", "C"), ("B", "D")]
    assert (out["cn"] == 2).all()
    assert (out["deg_u"] == 2).all() and (out["deg_v"] == 2).all()
    assert (out["jaccard_ppm"] == 1_000_000).all()

    # triangle A-B-C plus D linked to A and B: the pair (A,B) shares two
    # centers (C and D) but IS an edge -> excluded; (C,D) shares A and B
    # and is not an edge -> cn=2, deg both 2... deg_C=2 (A,B), deg_D=2
    pairs2 = [("A", "B"), ("B", "C"), ("A", "C"), ("A", "D"), ("B", "D")]
    e2 = ray.data.from_pandas(pd.DataFrame({
        "src_url": [p[0] for p in pairs2],
        "dst_url": [p[1] for p in pairs2],
    }))
    o2 = (link_prediction(e2, min_cn=2).to_pandas()
          .sort_values(["u", "v"]).reset_index(drop=True))
    assert list(zip(o2["u"], o2["v"])) == [("C", "D")]
    r = o2.iloc[0]
    # deg_C = deg_D = 2, cn = 2 -> jaccard = 2e6 // 2 = 1e6
    assert r["cn"] == 2 and r["jaccard_ppm"] == 1_000_000

    # hub cap: center degree above max_degree emits no wedges, but the
    # hub still counts toward endpoint degrees
    hub_pairs = [("H", f"n{i}") for i in range(5)] + [("n0", "X"),
                                                      ("n1", "X")]
    e3 = ray.data.from_pandas(pd.DataFrame({
        "src_url": [p[0] for p in hub_pairs],
        "dst_url": [p[1] for p in hub_pairs],
    }))
    o3 = (link_prediction(e3, min_cn=2, max_degree=4).to_pandas()
          .sort_values(["u", "v"]).reset_index(drop=True))
    # H's wedges (all ni pairs via H) are suppressed by the cap (deg 5);
    # X's wedges give (n0, n1) cn>=... n0,n1 share ONLY X as a usable
    # center -> cn=1 < 2 -> nothing; (H, X) shares n0 and n1 -> cn=2,
    # deg_H=5 (uncapped count), deg_X=2 -> jaccard = 2e6 // 5
    assert list(zip(o3["u"], o3["v"])) == [("H", "X")]
    assert o3.iloc[0]["deg_u"] == 5 and o3.iloc[0]["deg_v"] == 2
    assert o3.iloc[0]["jaccard_ppm"] == 2_000_000 // 5


def test_bowtie_structure_regions():
    """Hand-built bowtie: pivot 'a' sits in a 3-cycle CORE {a,b,c};
    'in1' -> 'in2' -> core; core -> 'out1' -> 'out2'; a tendril hangs
    off in1 without reaching the core; one separate component."""
    from htrc_feature_reader_ray.stages.linkgraph import bowtie_structure

    edges = _edges([
        ("a", "b"), ("b", "c"), ("c", "a"),        # CORE cycle (pivot=a)
        ("in1", "in2"), ("in2", "a"),              # IN chain
        ("a", "out1"), ("out1", "out2"),           # OUT chain
        ("in1", "t1"), ("t1", "t2"),               # tendril off IN
        ("x1", "x2"),                              # disconnected
    ])
    out = bowtie_structure(edges, max_hops=4, num_buckets=4).to_pandas()
    got = dict(zip(out["url"], out["region"]))
    assert got == {
        "a": "CORE", "b": "CORE", "c": "CORE",
        "in1": "IN", "in2": "IN",
        "out1": "OUT", "out2": "OUT",
        "t1": "TENDRIL", "t2": "TENDRIL",
        "x1": "DISCONNECTED", "x2": "DISCONNECTED",
    }


def test_bowtie_structure_broadcast_exchange_path_equality():
    """The node-count auto-switch must be invisible: broadcast
    (driver-frontier over pinned blocks, the default at test scale)
    and exchange (bucketed BFS, forced via broadcast_limit=0) classify
    identically on the full region fixture."""
    from htrc_feature_reader_ray.stages.linkgraph import bowtie_structure

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("in1", "in2"), ("in2", "a"),
        ("a", "out1"), ("out1", "out2"),
        ("in1", "t1"), ("t1", "t2"),
        ("x1", "x2"),
    ]
    bc = (bowtie_structure(_edges(pairs), max_hops=4, num_buckets=4)
          .to_pandas().sort_values("url").reset_index(drop=True))
    ex = (bowtie_structure(_edges(pairs), max_hops=4, num_buckets=4,
                           broadcast_limit=0)
          .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, ex)


def test_bowtie_structure_hop_bound():
    """max_hops truncates the closure (documented bound): a chain longer
    than the bound leaves the far end unreached -> TENDRIL (still in the
    pivot's weak component via the weak closure's own bound)."""
    from htrc_feature_reader_ray.stages.linkgraph import bowtie_structure

    # pivot 'a' (min url); forward chain of length 3 from a
    edges = _edges([("a", "m1"), ("m1", "m2"), ("m2", "m3")])
    out = bowtie_structure(edges, max_hops=2, num_buckets=2).to_pandas()
    got = dict(zip(out["url"], out["region"]))
    # m3 is 3 fwd hops away: outside the fwd bound, inside the weak bound?
    # weak closure is also bounded at 2 -> m3 unreached -> DISCONNECTED
    assert got == {"a": "CORE", "m1": "OUT", "m2": "OUT",
                   "m3": "DISCONNECTED"}
    # with a generous bound the whole chain is OUT
    out2 = bowtie_structure(edges, max_hops=4, num_buckets=2).to_pandas()
    got2 = dict(zip(out2["url"], out2["region"]))
    assert got2 == {"a": "CORE", "m1": "OUT", "m2": "OUT", "m3": "OUT"}


# ---------------------------------------------------------------------------
# hop_histogram


def test_hop_histogram_exact_on_chain_and_d90():
    import hashlib

    from htrc_feature_reader_ray.stages.linkgraph import hop_histogram

    # pick urls so exactly one passes md5 % mod == 0 and seeds the walk;
    # chain seed -> c1 -> c2 -> c3 plus a branch at hop 1
    def h(u):
        return int.from_bytes(
            hashlib.md5(u.encode()).digest()[:8], "little")

    cands = [f"n{i}" for i in range(200)]
    seedable = [u for u in cands if h(u) % 3 == 0]
    seed = seedable[0]
    others = [u for u in cands if h(u) % 3 != 0][:5]
    c1, c2, c3, br, _ = others
    pairs = [(seed, c1), (c1, c2), (c2, c3), (seed, br)]
    edges = _edges_ds(pairs)
    out = hop_histogram(edges, seed_mod=3, n_seeds=1, max_hops=4)
    # hop0: seed; hop1: c1+br; hop2: c2; hop3: c3
    assert list(out["hop"]) == [0, 1, 2, 3]
    assert list(out["n_pairs"]) == [1, 2, 1, 1]
    assert list(out["cum_pairs"]) == [1, 3, 4, 5]
    assert list(out["cum_ppm"]) == [200000, 600000, 800000, 1000000]
    # d90 = smallest hop with cum_ppm >= 900000
    d90 = int(out[out["cum_ppm"] >= 900_000]["hop"].min())
    assert d90 == 3

    # revisits don't double-count: add a back edge c2 -> seed
    out2 = hop_histogram(_edges_ds(pairs + [(c2, seed)]),
                         seed_mod=3, n_seeds=1, max_hops=4)
    assert int(out2["cum_pairs"].max()) == 5


# ---------------------------------------------------------------------------
# random_walks


def test_random_walks_scalar_replay_and_invariance():
    import hashlib

    from htrc_feature_reader_ray.stages.linkgraph import random_walks

    def h64(s):
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[:8], "little")

    # dense little digraph over urls u0..u9, every node seedable
    urls = [f"u{i}" for i in range(10)]
    pairs = [(urls[i], urls[(i * 3 + j) % 10])
             for i in range(10) for j in (1, 2, 3)]
    for parts in (1, 6):
        out = random_walks(_edges_ds(pairs).repartition(parts),
                           seed_mod=1, n_walks=4, walk_len=3,
                           salt="s")
        # scalar replay: starts = bottom-4 by (md5, url) among srcs
        starts = sorted({p[0] for p in pairs},
                        key=lambda u: (h64(u), u))[:4]
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, []).append(b)
        want = []
        for wid in range(4):
            cur = starts[wid % len(starts)]
            want.append((wid, 0, cur))
            for step in range(1, 4):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs,
                          key=lambda v: (h64(f"s|{wid}|{step}|{cur}|{v}"),
                                         v))
                want.append((wid, step, cur))
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == want
    # walks genuinely diverge across wids (not all identical paths)
    paths = out.groupby("wid")["url"].apply(tuple)
    assert len(set(paths)) > 1


def test_random_walks_dead_end_truncates():
    from htrc_feature_reader_ray.stages.linkgraph import random_walks

    out = random_walks(_edges_ds([("a", "sink")]), seed_mod=1,
                       n_walks=2, walk_len=5)
    # both walks start at 'a' (round-robin over 1 start), step to sink,
    # then truncate
    assert list(out["step"]) == [0, 1, 0, 1]
    assert set(out["url"]) == {"a", "sink"}


def test_hop_histogram_seedless_graph_returns_typed_empty():
    import hashlib

    from htrc_feature_reader_ray.stages.linkgraph import hop_histogram

    # build a graph where NO url passes the md5 % seed_mod == 0 seed
    # predicate — the SQL mirror yields zero rows, so the engine must
    # return the typed empty frame, not a degenerate (0,0,0,0) row
    def h(u):
        return int.from_bytes(
            hashlib.md5(u.encode()).digest()[:8], "little")

    cands = [f"q{i}" for i in range(100)]
    unseedable = [u for u in cands if h(u) % 7 != 0][:4]
    a, b, c, d = unseedable
    out = hop_histogram(_edges_ds([(a, b), (b, c), (c, d)]),
                        seed_mod=7, n_seeds=2, max_hops=3)
    assert len(out) == 0
    assert list(out.columns) == ["hop", "n_pairs", "cum_pairs",
                                 "cum_ppm"]
    assert all(str(dt) == "int64" for dt in out.dtypes)


def test_modularity_exact_two_cliques():
    """Two disjoint triangles: each community has e_c=3, d_c=6, so with
    m=6: q_c = 3e6//6 - 36e6//144 = 500000 - 250000 = 250000; Q = 0.5
    exactly — the textbook two-clique value."""
    from htrc_feature_reader_ray.stages.linkgraph import modularity

    pairs = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
             ("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    out = modularity(_edges_ds(pairs))
    assert len(out) == 2
    assert list(out["n_nodes"]) == [3, 3]
    assert list(out["n_edges_in"]) == [3, 3]
    assert list(out["degree_sum"]) == [6, 6]
    assert list(out["q_contrib_ppm"]) == [250000, 250000]

    # duplicate + reversed + self-loop edges don't change the score
    noisy = pairs + [("a2", "a1"), ("a1", "a1"), ("b2", "b3")]
    out2 = modularity(_edges_ds(noisy))
    assert list(out2["q_contrib_ppm"]) == [250000, 250000]

    # one connected clique: single community, Q = 1 - 1 = 0
    tri = [("x1", "x2"), ("x2", "x3"), ("x1", "x3")]
    out3 = modularity(_edges_ds(tri))
    assert len(out3) == 1
    assert int(out3["q_contrib_ppm"].iloc[0]) == 0

    # broadcast (default at test scale) == exchange (forced) — including
    # the self-loop-only-node exclusion rule the inner deg join encodes
    mixed = pairs + [("solo", "solo"), ("a1", "b1")]
    bc = modularity(_edges_ds(mixed))
    ex = modularity(_edges_ds(mixed), broadcast_limit=0)
    pd.testing.assert_frame_equal(bc, ex)


def test_host_assortativity_extremes_and_exact():
    from htrc_feature_reader_ray.stages.linkgraph import host_assortativity

    def u(host, i):
        return f"https://{host}.example.com/p/{i}"

    def run(pairs):
        return host_assortativity(_edges_ds(pairs)).to_pandas().iloc[0]

    # perfect silos: every edge intra-host -> r exactly +1e6
    silo = ([(u("a", i), u("a", i + 1)) for i in range(4)]
            + [(u("b", i), u("b", i + 1)) for i in range(3)])
    out = run(silo)
    assert int(out["r_ppm"]) == 1_000_000
    assert int(out["same_ppm"]) == 1_000_000
    assert int(out["n_hosts"]) == 2

    # perfect 2-host mutual exchange: marginals make the chance
    # diagonal m/2, observed 0 -> r exactly -1e6 via the shift path
    cross = ([(u("a", i), u("b", i)) for i in range(3)]
             + [(u("b", i), u("a", i + 10)) for i in range(3)])
    outc = run(cross)
    assert int(outc["r_ppm"]) == -1_000_000
    assert int(outc["same_ppm"]) == 0

    # one-way bipartite a->b: chance diagonal is already 0 -> r = 0
    oneway = [(u("a", i), u("b", i)) for i in range(5)]
    assert int(run(oneway)["r_ppm"]) == 0

    # hand-computed mixed case: m=4, E=2; A=(a:3,b:1), B=(a:1,b:3)
    # S = 3*1 + 1*3 = 6; r = (2*4-6)/(16-6) = 1/5 -> 200000 ppm
    mixed = [(u("a", 0), u("a", 1)), (u("a", 0), u("b", 1)),
             (u("a", 2), u("b", 2)), (u("b", 0), u("b", 3))]
    outm = run(mixed)
    assert int(outm["r_ppm"]) == 200_000
    assert int(outm["same_ppm"]) == 500_000

    # degenerate: every edge inside ONE host (m^2 == S) -> 0 by contract
    single = [(u("a", i), u("a", i + 1)) for i in range(4)]
    assert int(run(single)["r_ppm"]) == 0


def test_host_assortativity_malformed_urls_sql_parity():
    import duckdb

    from htrc_feature_reader_ray.stages.linkgraph import (
        host_assortativity,
        host_assortativity_sql,
    )

    # edges whose URLs lack '://host' must drop IDENTICALLY on both
    # sides (engine: NaN-host rows out of m/E/marginals; mirror:
    # NULLIF + IS NOT NULL) — ADVICE r3: previously the engine dropped
    # them from the marginals only while DuckDB counted '' as a real
    # host and matched two malformed URLs as same-host
    pairs = [
        ("https://a.x/1", "https://a.x/2"),     # kept, same-host
        ("https://a.x/1", "https://b.x/2"),     # kept, cross-host
        ("nohost-page", "https://a.x/3"),        # dropped (src hostless)
        ("https://b.x/1", "relative/path"),      # dropped (dst hostless)
        ("plain1", "plain2"),                    # dropped (both; '' == ''
                                                 #  must NOT count as same)
    ]
    df = pd.DataFrame({"src_url": [p[0] for p in pairs],
                       "dst_url": [p[1] for p in pairs]})
    eng = (host_assortativity(ray.data.from_pandas(df).repartition(2))
           .to_pandas())
    assert int(eng.loc[0, "n_edges"]) == 2
    assert int(eng.loc[0, "n_hosts"]) == 2
    assert int(eng.loc[0, "same_ppm"]) == 500_000

    con = duckdb.connect()
    con.register("edges", df)
    sql = con.execute(
        "WITH e2 AS (SELECT src_url, dst_url FROM edges)"
        + host_assortativity_sql()).df()
    pd.testing.assert_frame_equal(eng, sql, check_dtype=False)


def test_rich_club_clique_core_and_contracts():
    from htrc_feature_reader_ray.stages.linkgraph import rich_club

    # 4 hubs in a clique (6 edges), each hub with 3 pendant leaves:
    # hub degree = 3 + 3 = 6, leaf degree = 1. For k in {1,2,4} the
    # club is exactly the 4 hubs and phi = 2*6/(4*3) = 1.
    hubs = [f"h{i}" for i in range(4)]
    pairs = [(hubs[a], hubs[b]) for a in range(4) for b in range(a + 1, 4)]
    for h in hubs:
        pairs += [(h, f"{h}_leaf{j}") for j in range(3)]
    out = rich_club(_edges_ds(pairs),
                    thresholds=(1, 2, 4, 8)).to_pandas().set_index("k")
    for k in (1, 2, 4):
        assert int(out.loc[k, "n_nodes"]) == 4
        assert int(out.loc[k, "n_edges"]) == 6
        assert int(out.loc[k, "phi_ppm"]) == 1_000_000
    # nobody clears degree 8 -> N_k < 2 contract zero
    assert int(out.loc[8, "n_nodes"]) == 0
    assert int(out.loc[8, "phi_ppm"]) == 0

    # dup / reversed / self-loop edges collapse in the canonical fold
    noisy = pairs + [(pairs[0][1], pairs[0][0]), ("h0", "h0"), pairs[2]]
    out2 = rich_club(_edges_ds(noisy),
                     thresholds=(1, 2, 4, 8)).to_pandas().set_index("k")
    assert out2.equals(out)

    # star: only the hub clears k=1 -> N_k = 1 -> 0 by contract
    star = [("hub", f"l{j}") for j in range(5)]
    outs = rich_club(_edges_ds(star), thresholds=(1,)).to_pandas()
    assert int(outs["n_nodes"].iloc[0]) == 1
    assert int(outs["phi_ppm"].iloc[0]) == 0


def test_neighbor_degree_curve_star_and_clique():
    from htrc_feature_reader_ray.stages.linkgraph import (
        neighbor_degree_curve,
    )

    def run(pairs):
        return (neighbor_degree_curve(_edges_ds(pairs)).to_pandas()
                .set_index("degree_bucket"))

    # star with 5 leaves: leaves (d=1, bucket 1) see only the hub
    # (d=5) -> knn = 5e6; the hub (bucket 3) sees only leaves -> 1e6
    star = [("hub", f"l{j}") for j in range(5)]
    out = run(star)
    assert int(out.loc[1, "n_nodes"]) == 5
    assert int(out.loc[1, "knn_ppm"]) == 5_000_000
    assert int(out.loc[3, "n_nodes"]) == 1
    assert int(out.loc[3, "knn_ppm"]) == 1_000_000
    assert int(out.loc[1, "sum_degree"]) == 5
    assert int(out.loc[3, "sum_neighbor_degree"]) == 5

    # 4-clique: every node d=3 (bucket 2), every neighbor d=3
    clique = [(f"c{a}", f"c{b}") for a in range(4) for b in range(a + 1, 4)]
    outc = run(clique)
    assert list(outc.index) == [2]
    assert int(outc.loc[2, "knn_ppm"]) == 3_000_000

    # dup/reversed/self-loop edges collapse in the canonical fold
    noisy = star + [(star[0][1], star[0][0]), ("hub", "hub")]
    assert run(noisy).equals(out)


def test_eigenvector_centrality_cycle_hub_and_dag_drain():
    from htrc_feature_reader_ray.stages.linkgraph import (
        eigenvector_centrality,
    )

    def run(pairs, **kw):
        return (eigenvector_centrality(_edges_ds(pairs), **kw)
                .to_pandas().set_index("url")["score"])

    # 3-cycle: permutation matrix, ranks stay exactly at the init 1024
    cyc = [("a", "b"), ("b", "c"), ("c", "a")]
    outc = run(cyc)
    assert set(outc) == {1024}

    # hub with feedback + self-loop (bare star is bipartite and
    # oscillates — even-round values tie exactly; the loop breaks
    # periodicity, the classic power-method caveat): hub dominates
    k = 5
    hub = [(f"s{i}", "hub") for i in range(k)] + \
          [("hub", f"s{i}") for i in range(k)] + [("hub", "hub")]
    outh = run(hub)
    assert outh["hub"] > outh["s0"] > 0

    # pure DAG drains once t exceeds the longest path — zeros are the
    # documented correct readout
    dag = [("x", "y"), ("y", "z")]
    outd = run(dag, iterations=4)
    assert set(outd) == {0}
    # ...but within the path length the walk counts are live
    outd1 = run(dag, iterations=1)
    assert outd1["y"] == 1024 and outd1["z"] == 1024 and outd1["x"] == 0

    # bucketed path (broadcast_limit=0 forces it) is bit-identical
    outb = run(hub, broadcast_limit=0)
    assert outb.sort_index().equals(outh.sort_index())


def test_rank_overlap_rbo_exact_values():
    from htrc_feature_reader_ray.stages.linkgraph import (
        RBO_NORM,
        RBO_W,
        rank_overlap_rbo,
    )

    def run(a, b):
        da = ray.data.from_pandas(pd.DataFrame(
            {"host": [k for k, _ in a], "s1": [v for _, v in a]}))
        db = ray.data.from_pandas(pd.DataFrame(
            {"host": [k for k, _ in b], "s2": [v for _, v in b]}))
        return rank_overlap_rbo(da, db, key_col="host",
                                score_a="s1", score_b="s2").to_pandas().iloc[0]

    keys = [f"h{i:02d}" for i in range(12)]
    desc = [(k, 100 - i) for i, k in enumerate(keys)]

    # identical rankings -> exactly 1e6
    out = run(desc, desc)
    assert int(out["rbo_ppm"]) == 1_000_000
    assert int(out["overlap_at_k"]) == 10

    # completely disjoint top-10s -> 0
    other = [(f"z{i:02d}", 100 - i) for i in range(12)]
    assert int(run(desc, other)["rbo_ppm"]) == 0

    # top-2 swapped: depth 1 overlap 0, depths >= 2 full — replay the
    # literal-weight sum
    swapped = ([(keys[1], 100), (keys[0], 99)]
               + [(k, 100 - i) for i, k in enumerate(keys) if i >= 2])
    outs = run(desc, swapped)
    acc = sum(d * RBO_W[d] for d in range(2, 11)) + 0 * RBO_W[1]
    assert int(outs["rbo_ppm"]) == acc * 10**6 // RBO_NORM

    # tie-break is (score desc, key asc) on BOTH sides: equal scores
    # order by key, so permuted input rows change nothing
    tied = [(k, 1) for k in keys]
    tied_rev = list(reversed(tied))
    assert int(run(tied, tied_rev)["rbo_ppm"]) == 1_000_000


def test_degree_family_broadcast_exchange_path_equality():
    """rich_club / neighbor_degree_curve / degree_assortativity: the
    node-count auto-switch must be invisible — broadcast (degree vector
    ray.put, one map pass, the default at test scale) equals the
    bucketed-join exchange path (forced via broadcast_limit=0)."""
    from htrc_feature_reader_ray.stages.linkgraph import (
        degree_assortativity,
        neighbor_degree_curve,
        rich_club,
    )

    pairs = [(f"h{i}", f"h{(i * 3 + 1) % 11}") for i in range(11)] + [
        ("h0", "spoke1"), ("h0", "spoke2"), ("h0", "spoke3"),
        ("h1", "h0"), ("spoke1", "spoke2"),
    ]

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(df.columns.tolist()).reset_index(drop=True)

    for fn in (rich_club, neighbor_degree_curve, degree_assortativity):
        bc = norm(fn(_edges_ds(pairs)))
        ex = norm(fn(_edges_ds(pairs), broadcast_limit=0))
        pd.testing.assert_frame_equal(bc, ex)


def test_labeled_bfs_broadcast_exchange_path_equality():
    """harmonic_centrality / hop_histogram share _labeled_bfs; the
    edge-count auto-switch must be invisible (broadcast default at test
    scale vs exchange forced via broadcast_limit=0)."""
    import hashlib

    from htrc_feature_reader_ray.stages.linkgraph import (
        harmonic_centrality,
        hop_histogram,
    )

    # urls chosen so at least one passes the md5 % 10 == 0 seed gate
    def md5mod(u):
        return int(hashlib.md5(u.encode()).hexdigest()[:16], 16) % 10

    urls = [f"u{i}" for i in range(40)]
    seeds = [u for u in urls if md5mod(u) == 0]
    assert seeds  # fixture must have a seed
    pairs = [(urls[i], urls[(i * 7 + 3) % 40]) for i in range(40)] + [
        (seeds[0], urls[5]), (urls[5], urls[9]), (urls[9], urls[13]),
    ]

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(df.columns.tolist()).reset_index(drop=True)

    for fn in (harmonic_centrality, hop_histogram):
        bc = norm(fn(_edges_ds(pairs)))
        ex = norm(fn(_edges_ds(pairs), broadcast_limit=0))
        pd.testing.assert_frame_equal(bc, ex)
