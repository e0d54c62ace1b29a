"""Hyperlink-graph operators over the crawl: href extraction, degree
statistics, and fixed-point PageRank.

The reference engine reshapes WITHIN one document (Volume.tokenlist,
parsers.py:340-420); the web-scale generalization also needs the BETWEEN-
document structure — the link graph — because crawl curation ranks, filters
and samples by it (hub/authority signals, spam-farm down-weighting).

Scale shape:

* ``extract_links`` — stateless ``map_batches`` over the raw ``html``
  binary (byte ``find`` kernel, same approach as the zone extractor in
  stages/extract.py — measured faster than regex there); per-batch
  dedup, then ONE exchange keyed on ``hash(src_url)`` for global edge
  distinct (all snapshots of a url share a bucket, so bucket-local
  ``drop_duplicates`` is globally exact).
* ``link_degree`` — each edge explodes into two (url, out, in) partial
  rows; ``bucketed_aggregate`` sums them in one exchange. In-degree skew
  (site-home hubs collect an edge from every page of the site) is absorbed
  by the partial-combine: per-batch pre-aggregation collapses a hub's
  arbitrarily many edges to ≤ one row per batch before the exchange.
* ``pagerank`` — synchronous fixed-point iteration. Integer fixed-point
  arithmetic (ranks scaled by ``scale``; all updates are int floor-division
  and order-independent int sums) so results are bit-identical regardless
  of parallelism/summation order AND exactly replayable in SQL — the same
  exactness discipline as the engine's cent-integer money columns.
  Per iteration: one ``bucket_join`` (ranks onto edges, keyed src), one
  ``bucketed_aggregate`` (contribution sums, keyed dst), one union+fold to
  re-attach zero-in-degree nodes — 3 bounded exchanges, no driver-side
  state beyond the scalar node count. The rank table is materialized per
  iteration (it is the iteration state — O(nodes) rows, the standard
  PageRank frontier shape; everything else streams).

Dangling mass: nodes without out-links leak their damped mass (the common
"no redistribution" PageRank variant); the SQL oracle implements the exact
same recurrence, so parity is well-defined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from htrc_feature_reader_ray.stages.partition import (
    bucket_join,
    bucketed_aggregate,
    bucketed_map_groups,
)

PR_SCALE = 1_000_000_000  # rank fixed-point scale (ppb of total mass)


def _str_array(batch: pa.Table, name: str) -> pa.Array:
    """One contiguous string Array from a (possibly chunked) table column."""
    col = batch.column(name).cast(pa.string())
    if isinstance(col, pa.ChunkedArray):
        return pa.concat_arrays(col.chunks) if col.num_chunks != 1 else col.chunk(0)
    return col


def _hrefs(doc: bytes) -> list[tuple[str, str]]:
    """All (href, anchor-text) pairs in one html payload (byte find kernel).

    Anchor text is the run between the tag's closing ``>`` and the next
    ``</a>`` ('' when the anchor is empty or malformed)."""
    out = []
    pos = doc.find(b'href="')
    while pos != -1:
        end = doc.find(b'"', pos + 6)
        if end == -1:
            break
        href = doc[pos + 6 : end].decode("utf-8", "replace")
        anchor = ""
        gt = doc.find(b">", end + 1)
        if gt != -1:
            close = doc.find(b"</a>", gt + 1)
            if close != -1:
                anchor = doc[gt + 1 : close].decode("utf-8", "replace")
        out.append((href, anchor))
        pos = doc.find(b'href="', end + 1)
    return out


def extract_links(pages, *, url_col: str = "url", html_col: str = "html",
                  distinct: bool = True, with_anchors: bool = False,
                  num_buckets: int = 32):
    """pages(url, html, ...) -> distinct edge table (src_url, dst_url
    [, anchor] when ``with_anchors``).

    Every snapshot of a url re-states its outlinks; the per-batch dedup
    collapses the repeats that share a batch, the bucketed pass collapses
    the rest (snapshots of one url may span batches).
    """
    cols = ["src_url", "dst_url"] + (["anchor"] if with_anchors else [])

    def parse(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        src, dst, anc = [], [], []
        for u, h in zip(urls, htmls):
            if h is None:
                continue
            for link, anchor in _hrefs(h):
                src.append(u)
                dst.append(link)
                anc.append(anchor)
        data = {
            "src_url": pa.array(src, type=pa.string()),
            "dst_url": pa.array(dst, type=pa.string()),
        }
        if with_anchors:
            data["anchor"] = pa.array(anc, type=pa.string())
        # batch-local distinct (snapshot repeats of one url collapse here)
        return pa.table(data).group_by(cols).aggregate([])

    edges = pages.map_batches(parse, batch_format="pyarrow")
    if not distinct:
        return edges
    return bucketed_map_groups(
        edges, "src_url", lambda df: df.drop_duplicates(cols),
        num_buckets=num_buckets,
    )


def inlink_anchor_counts(edges_with_anchor, *, num_buckets: int = 32):
    """(src_url, dst_url, anchor) -> (dst_url, anchor, n_links): how the web
    describes each target — the classic inlink anchor-text relevance signal
    (aggregated per target, exchange keyed on ``hash(dst_url)``; hub skew
    is absorbed by bucketed_aggregate's vectorized per-bucket fold)."""
    return bucketed_aggregate(
        edges_with_anchor.map_batches(
            lambda t: t.select(["dst_url", "anchor"]), batch_format="pyarrow"
        ),
        ["dst_url", "anchor"],
        {"n_links": ("anchor", "size")},
        num_buckets=num_buckets,
        bucket_key="dst_url",
    )


def link_degree(edges, *, num_buckets: int = 32):
    """edge table -> (url, out_degree, in_degree), one exchange.

    A url appearing only as a source has in_degree 0 and vice versa (the
    two-partial-rows union is the full outer join, without a join).
    """

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ones = np.ones(n, dtype=np.int64)
        zeros = np.zeros(n, dtype=np.int64)
        t = pa.table({
            "url": pa.concat_arrays(
                [_str_array(batch, "src_url"), _str_array(batch, "dst_url")]
            ),
            "out_degree": pa.array(np.concatenate([ones, zeros])),
            "in_degree": pa.array(np.concatenate([zeros, ones])),
        })
        # partial combine: hub urls collapse to one row per batch before
        # the exchange — in-degree skew never crosses the network raw
        return t.group_by("url").aggregate(
            [("out_degree", "sum"), ("in_degree", "sum")]
        ).rename_columns(["url", "out_degree", "in_degree"])

    return bucketed_aggregate(
        edges.map_batches(explode, batch_format="pyarrow"),
        "url",
        {"out_degree": ("out_degree", "sum"), "in_degree": ("in_degree", "sum")},
        num_buckets=num_buckets,
    )


def crawl_frontier(edges, *, num_buckets: int = 32):
    """Urls the crawl has SEEN (as a link target) but never FETCHED (never a
    source) — the next-wave frontier of a breadth-first crawl.

    ONE exchange: each edge emits (url, seen_src, seen_dst) partials with a
    per-batch max-combine; the bucketed fold keeps urls where seen_dst=1
    and seen_src=0. No join, no second distinct pass.
    """

    def partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ones = np.ones(n, dtype=np.int64)
        zeros = np.zeros(n, dtype=np.int64)
        t = pa.table({
            "url": pa.concat_arrays(
                [_str_array(batch, "src_url"), _str_array(batch, "dst_url")]
            ),
            "seen_src": pa.array(np.concatenate([ones, zeros])),
            "seen_dst": pa.array(np.concatenate([zeros, ones])),
        })
        out = t.group_by("url").aggregate(
            [("seen_src", "max"), ("seen_dst", "max")]
        )
        return out.rename_columns(["url", "seen_src", "seen_dst"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("url", sort=False, as_index=False).agg(
            seen_src=("seen_src", "max"), seen_dst=("seen_dst", "max")
        )
        return g.loc[(g["seen_dst"] == 1) & (g["seen_src"] == 0), ["url"]]

    return bucketed_map_groups(
        edges.map_batches(partial, batch_format="pyarrow"), "url", finish,
        num_buckets=num_buckets,
    )


def link_components(edges, *, num_buckets: int = 16, **cluster_kwargs):
    """Connected components of the (undirected) link graph: every url gets
    ``component`` = the lexicographically smallest url reachable from it.

    Reuses the dedup-cluster machinery (stages/dedup.py::dedup_clusters —
    union-find on the collected pair list, or distributed min-label
    propagation past its driver_limit) over int64 node ids from
    ``stable_hash64(url)``; the string-min canonical member is then
    recovered with one bucketed min-fold + join-back, so the OUTPUT is
    hash-free (no collision exposure in the contract; a 64-bit collision
    among distinct urls — ~1e-9 at 10^8 urls — could only merge two
    components, same exposure the exact-dedup digest path documents).
    """
    from htrc_feature_reader_ray.functions.ids import stable_hash64
    from htrc_feature_reader_ray.stages.dedup import dedup_clusters

    edges = edges.materialize()  # two consumers (pair list, node table)

    def pairs(batch: pa.Table) -> pa.Table:
        a = stable_hash64(
            _str_array(batch, "src_url").to_numpy(zero_copy_only=False)
        ).view(np.int64)
        b = stable_hash64(
            _str_array(batch, "dst_url").to_numpy(zero_copy_only=False)
        ).view(np.int64)
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})

    clusters = dedup_clusters(
        edges.map_batches(pairs, batch_format="pyarrow"),
        num_buckets=num_buckets, **cluster_kwargs,
    )

    def node_ids(batch: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [_str_array(batch, "src_url"), _str_array(batch, "dst_url")]
        ).unique()
        nid = stable_hash64(arr.to_numpy(zero_copy_only=False)).view(np.int64)
        return pa.table({"url": arr, "nid": pa.array(nid)})

    nodes = bucketed_map_groups(
        edges.map_batches(node_ids, batch_format="pyarrow"), "url",
        lambda df: df.drop_duplicates(["url"]), num_buckets=num_buckets,
    )
    labeled = bucket_join(
        nodes, clusters, left_key="nid", right_key="doc_id",
        how="inner", num_buckets=num_buckets,
    ).materialize()
    canon = bucketed_aggregate(
        labeled, "cluster_id", {"component": ("url", "min")},
        num_buckets=num_buckets,
    )
    out = bucket_join(
        labeled, canon, left_key="cluster_id", right_key="cluster_id",
        how="inner", num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda t: t.select(["url", "component"]), batch_format="pyarrow"
    )


def modularity(edges, *, num_buckets: int = 16,
               broadcast_limit: int = 2_000_000, **component_kwargs):
    """Newman modularity of the CONNECTED-COMPONENT partition of the
    undirected link graph, per community in exact integer ppm — the
    partition-quality readout next to :func:`link_components` (how much
    denser is each community than the configuration-model expectation;
    Q = Σ_c e_c/m − (d_c/2m)², Newman & Girvan 2004). For components the
    e_c/m terms sum to 1 by construction, so the score isolates the
    degree-concentration penalty — the readout that distinguishes "one
    giant hairball" from "many balanced neighborhoods", which is what a
    crawl-frontier allocator actually wants to know about site structure.

    Exact-integer contract: per community
    ``q_contrib_ppm = e_c·10⁶ // m − d_c²·10⁶ // (4m²)`` — two
    NONNEGATIVE floors subtracted (never a floor of a negative, so
    Python // and DuckDB // agree without the shift trick); corpus
    Q_ppm = the sum of contributions.

    Scale shape: the component labels come from :func:`link_components`
    (its documented machinery); the undirected edge set canonicalizes
    with one lo-bucketed distinct fold; e_c needs the labels of BOTH
    endpoints — two bucketed joins carrying url-only rows; d_c is one
    degree fold joined with labels. Everything that crosses is
    node/edge-key-sized; the per-community finish is audit-sized.
    Output one row per community: ``(component, n_nodes, n_edges_in,
    degree_sum, q_contrib_ppm)``."""
    edges = edges.materialize()
    labels = link_components(
        edges, num_buckets=num_buckets, **component_kwargs
    ).materialize()

    def canon(batch: pa.Table) -> pa.Table:
        s = _str_array(batch, "src_url").to_numpy(zero_copy_only=False)
        d = _str_array(batch, "dst_url").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table({"lo": pa.array(lo, type=pa.string()),
                         "hi": pa.array(hi, type=pa.string())})

    und = bucketed_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"),
        "lo", lambda df: df.drop_duplicates(["lo", "hi"]),
        num_buckets=num_buckets,
    ).materialize()
    m = und.count()

    if labels.count() <= broadcast_limit:
        # broadcast fast path (node-count gate, path equality by pinned
        # pytest): labels collapse to a driver-side url→community code
        # vector; ONE map pass over the pinned undirected edges emits
        # per-community e_in partials + per-node degree partials
        # (kind-tagged bincounts), folded on node-sized driver vectors.
        # Community membership rule kept faithful to the exchange path:
        # a node counts only while its und-degree > 0 (the inner
        # deg⨝labels), so self-loop-only nodes stay excluded.
        import pyarrow.compute as pc

        import ray

        lab_pd = labels.to_pandas()
        keys = np.sort(lab_pd["url"].to_numpy())
        comp_sorted = (lab_pd.set_index("url")["component"]
                       .reindex(keys).to_numpy())
        comps, comp_code = np.unique(comp_sorted, return_inverse=True)
        n_keys, n_comps = len(keys), len(comps)
        if n_keys == 0 or m == 0:
            return pd.DataFrame({
                "component": pd.Series([], dtype="object"),
                "n_nodes": pd.Series([], dtype="int64"),
                "n_edges_in": pd.Series([], dtype="int64"),
                "degree_sum": pd.Series([], dtype="int64"),
                "q_contrib_ppm": pd.Series([], dtype="int64")})
        ref = ray.put((pa.array(keys, type=pa.string()),
                       comp_code.astype(np.int64)))

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"kind": pa.array([], pa.int64()),
                                 "idx": pa.array([], pa.int64()),
                                 "val": pa.array([], pa.int64())})
            ks, cc = ray.get(ref)
            lo = pc.index_in(t.column("lo").cast(pa.string()),
                             value_set=ks).to_numpy(zero_copy_only=False)
            hi = pc.index_in(t.column("hi").cast(pa.string()),
                             value_set=ks).to_numpy(zero_copy_only=False)
            clo, chi = cc[lo], cc[hi]
            e = np.bincount(clo[clo == chi], minlength=n_comps)
            nd = (np.bincount(lo, minlength=n_keys)
                  + np.bincount(hi, minlength=n_keys))
            ez = np.flatnonzero(e)
            nz = np.flatnonzero(nd)
            kind = np.concatenate([np.zeros(len(nz), dtype=np.int64),
                                   np.ones(len(ez), dtype=np.int64)])
            idx = np.concatenate([nz, ez]).astype(np.int64)
            val = np.concatenate([nd[nz], e[ez]]).astype(np.int64)
            return pa.table({"kind": pa.array(kind),
                             "idx": pa.array(idx),
                             "val": pa.array(val)})

        parts = und.map_batches(partial,
                                batch_format="pyarrow").to_pandas()
        node_deg = np.zeros(n_keys, dtype=np.int64)
        e_in = np.zeros(n_comps, dtype=np.int64)
        if len(parts) and "kind" in parts.columns:
            k0 = parts[parts["kind"] == 0]
            k1 = parts[parts["kind"] == 1]
            np.add.at(node_deg, k0["idx"].to_numpy(),
                      k0["val"].to_numpy())
            np.add.at(e_in, k1["idx"].to_numpy(), k1["val"].to_numpy())
        active = node_deg > 0
        n_nodes = np.bincount(comp_code[active], minlength=n_comps)
        dsum = np.bincount(comp_code, weights=node_deg,
                           minlength=n_comps).astype(np.int64)
        rows = []
        for ci in np.flatnonzero(n_nodes):
            e_ = int(e_in[ci])
            d_ = int(dsum[ci])
            q = (e_ * 1_000_000 // m
                 - d_ * d_ * 1_000_000 // (4 * m * m))
            rows.append((comps[ci], int(n_nodes[ci]), e_, d_, q))
        out = pd.DataFrame(rows, columns=[
            "component", "n_nodes", "n_edges_in", "degree_sum",
            "q_contrib_ppm"]).sort_values("component",
                                          ignore_index=True)
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"url": pa.concat_arrays([
            t.column("lo").combine_chunks(),
            t.column("hi").combine_chunks()])})

    deg = bucketed_aggregate(
        und.map_batches(endpoints, batch_format="pyarrow"),
        ["url"], {"d": ("url", "size")}, num_buckets=num_buckets)

    lab_lo = labels.map_batches(
        lambda t: t.rename_columns(["url_lo", "c_lo"]),
        batch_format="pyarrow")
    lab_hi = labels.map_batches(
        lambda t: t.rename_columns(["url_hi", "c_hi"]),
        batch_format="pyarrow")
    both = bucket_join(
        bucket_join(und, lab_lo, left_key="lo", right_key="url_lo",
                    how="inner", num_buckets=num_buckets),
        lab_hi, left_key="hi", right_key="url_hi",
        how="inner", num_buckets=num_buckets)

    def internal(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["c_lo"] == df["c_hi"]]
        g = sub.groupby("c_lo", sort=False).size().rename("e_in")
        return g.reset_index().rename(columns={"c_lo": "component"})

    ec = bucketed_aggregate(
        both.map_batches(internal, batch_format="pandas"),
        ["component"], {"e_in": ("e_in", "sum")},
        num_buckets=num_buckets).to_pandas()

    dc = bucketed_aggregate(
        bucket_join(deg, labels.map_batches(
            lambda t: t.rename_columns(["url_l", "component"]),
            batch_format="pyarrow"),
            left_key="url", right_key="url_l",
            how="inner", num_buckets=num_buckets),
        ["component"],
        {"degree_sum": ("d", "sum"), "n_nodes": ("url", "size")},
        num_buckets=num_buckets).to_pandas()

    e_map = dict(zip(ec["component"], ec["e_in"].map(int))) \
        if len(ec) else {}
    rows = []
    for r in dc.itertuples(index=False):
        e_in = e_map.get(r.component, 0)
        dsum = int(r.degree_sum)
        q = (e_in * 1_000_000 // m
             - dsum * dsum * 1_000_000 // (4 * m * m)) if m else 0
        rows.append((r.component, int(r.n_nodes), e_in, dsum, q))
    out = pd.DataFrame(rows, columns=[
        "component", "n_nodes", "n_edges_in", "degree_sum",
        "q_contrib_ppm"]).sort_values("component", ignore_index=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def resolve_redirects(redirects, *, src_col: str = "url",
                      dst_col: str = "target", num_buckets: int = 32,
                      max_doubling: int = 10):
    """Resolve redirect CHAINS to their terminal url: (url, final_url,
    hops) for every url in the redirect map — the HTTP-30x / alias /
    symlink resolution step of crawl normalization (generalizing the
    reference's id→path resolver indirection, resolvers.py).

    Pointer doubling: the state S_k maps url → (next, hops) where next is
    2^k redirect steps ahead (or terminal); each round self-joins S on
    S.next = S.url, so a chain of length L resolves in ceil(log2 L)
    bucketed exchanges — not L sequential passes. Rounds stop early when a
    round matches nothing (exact convergence test on the round's
    materialized state, one tiny aggregate).

    Redirect CYCLES never converge; the ``max_doubling`` cap terminates
    them deterministically (their next/hops are then 2^max_doubling steps
    around the loop — callers that care can filter ``hops >=
    2**max_doubling``).
    """

    def init(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "url": _str_array(batch, src_col),
            "next": _str_array(batch, dst_col),
            "hops": pa.array(np.ones(n, dtype=np.int64)),
        })

    state = redirects.map_batches(init, batch_format="pyarrow").materialize()
    if state.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "final_url": pa.array([], type=pa.string()),
            "hops": pa.array([], type=pa.int64()),
        }))

    for _ in range(max_doubling):
        # self-join: where my `next` is itself a mapped url, jump ahead by
        # that entry's (already up to 2^k) steps
        def as_map(batch: pa.Table) -> pa.Table:
            return pa.table({
                "_m_url": _str_array(batch, "url"),
                "_m_next": _str_array(batch, "next"),
                "_m_hops": batch.column("hops"),
            })

        mapping = state.map_batches(as_map, batch_format="pyarrow")
        joined = bucket_join(
            state, mapping, left_key="next", right_key="_m_url",
            how="left", num_buckets=num_buckets,
        )

        def advance(df: pd.DataFrame) -> pd.DataFrame:
            hit = df["_m_next"].notna()
            nxt = df["next"].where(~hit, df["_m_next"])
            hops = df["hops"].astype(np.int64) + np.where(
                hit, df["_m_hops"].fillna(0).astype(np.int64), 0
            )
            return pd.DataFrame({
                "url": df["url"], "next": nxt,
                "hops": hops.astype(np.int64),
                "_hit": hit.astype(np.int64),
            })

        advanced = joined.map_batches(
            advance, batch_format="pandas"
        ).materialize()
        moved = advanced.sum("_hit")
        state = advanced.drop_columns(["_hit"])  # projection on materialized
        if not moved:
            break

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "final_url": batch.column("next"),
            "hops": batch.column("hops"),
        })

    return state.map_batches(final, batch_format="pyarrow")


def _distinct_nodes(edges, *, num_buckets: int):
    def urls(batch: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [_str_array(batch, "src_url"), _str_array(batch, "dst_url")]
        ).unique()
        return pa.table({"url": arr})

    flat = edges.map_batches(urls, batch_format="pyarrow")
    return bucketed_map_groups(
        flat, "url", lambda df: df.drop_duplicates(["url"]),
        num_buckets=num_buckets,
    )


def _bcast_push_fold(edges, weights: pd.Series, *, src_col: str,
                     dst_col: str, num_buckets: int) -> pd.Series:
    """One broadcast push half-step for the score-propagation fast paths:
    ship the per-source weight Series once (``ray.put``), fold each batch's
    contributions per target locally, then ONE bucketed exchange of
    (url, s) partials; collect the ≤|nodes|-row folded result back to the
    driver.  Legal only because the caller checked |nodes| fits a worker
    (``broadcast_limit``) — the bucketed join path below stays the
    unbounded-graph plan."""
    import ray

    ref = ray.put(weights)

    def push(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        src = batch.column(src_col).to_pandas()
        s = w.loc[src.to_numpy()].to_numpy()
        t = pa.table({
            "url": batch.column(dst_col).cast(pa.string()),
            "s": pa.array(s, type=pa.int64()),
        })
        # per-batch combine: a hub target collapses pre-exchange
        g = t.group_by("url").aggregate([("s", "sum")])
        return pa.table({"url": g.column("url"), "s": g.column("s_sum")})

    folded = bucketed_aggregate(
        edges.map_batches(push, batch_format="pyarrow"),
        "url", {"s": ("s", "sum")}, num_buckets=num_buckets,
    ).to_pandas()
    return pd.Series(folded["s"].to_numpy().astype(np.int64),
                     index=folded["url"].to_numpy())


def pagerank(edges, *, iterations: int = 3, scale: int = PR_SCALE,
             damping_pct: int = 85, num_buckets: int = 32,
             broadcast_limit: int = 2_000_000):
    """Fixed-point integer PageRank over a distinct edge table.

    Recurrence (all integer; ``//`` is floor division):

        r_0(v)     = scale // N
        contrib(u) = r_t(u) // out_degree(u)
        r_{t+1}(v) = (100 - damping_pct) * (scale // N) // 100
                     + damping_pct * (sum of contrib over in-edges) // 100

    Returns (url, rank) with rank int64. Bit-exact across runs and
    parallelism levels; the driver oracle replays the identical recurrence
    as unrolled SQL CTEs (see __ray_entry__.py `pagerank`).
    """
    # the edge list feeds three consumers (node set, out-degrees, the
    # per-iteration join) — pin it once so the upstream (html parse,
    # distinct exchange) doesn't re-execute per consumer. O(E) object-store
    # residency is inherent to iterative graph algorithms.
    edges = edges.materialize()
    nodes = _distinct_nodes(edges, num_buckets=num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
        }))

    r0 = scale // n
    base = (100 - damping_pct) * r0 // 100

    if n <= broadcast_limit:
        # ---- broadcast fast path: the rank table fits one worker ----
        # Out-degrees and ranks live in a broadcast Series, so each
        # iteration is ONE exchange (the contribution fold) — no rank
        # join, no loop-invariant out-degree join, no zero-row union
        # (the driver reindex fills absent in-degrees with 0).  Same
        # integer recurrence, bit-identical to the bucketed path.
        outdeg_pd = bucketed_aggregate(
            edges, "src_url", {"out_degree": ("dst_url", "size")},
            num_buckets=num_buckets,
        ).to_pandas()
        od_idx = outdeg_pd["src_url"].to_numpy()
        od = outdeg_pd["out_degree"].to_numpy().astype(np.int64)
        urls = nodes.to_pandas()["url"].to_numpy()
        rank = pd.Series(np.full(n, r0, dtype=np.int64), index=urls)
        for _ in range(iterations):
            contrib = pd.Series(
                rank.loc[od_idx].to_numpy() // od, index=od_idx)
            summed = _bcast_push_fold(
                edges, contrib, src_col="src_url", dst_col="dst_url",
                num_buckets=num_buckets)
            s = summed.reindex(urls, fill_value=0).to_numpy()
            rank = pd.Series(base + damping_pct * s // 100, index=urls)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array(urls, type=pa.string()),
            "rank": pa.array(rank.to_numpy(), type=pa.int64()),
        }))

    outdeg = bucketed_aggregate(
        edges, "src_url", {"out_degree": ("dst_url", "size")},
        num_buckets=num_buckets,
    )
    # edge list with each source's out-degree attached — loop-invariant,
    # computed once and materialized (it is re-scanned every iteration)
    edges_od = bucket_join(
        edges, outdeg, left_key="src_url", right_key="src_url",
        how="inner", num_buckets=num_buckets,
    ).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.full(len(batch), r0, dtype=np.int64))
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url").cast(pa.string()),
            "s": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        joined = bucket_join(
            edges_od, ranks, left_key="src_url", right_key="url",
            how="inner", num_buckets=num_buckets,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("rank").to_numpy()
            od = batch.column("out_degree").to_numpy()
            return pa.table({
                "url": batch.column("dst_url").cast(pa.string()),
                "s": pa.array(r // od),
            })

        partial = joined.map_batches(contrib, batch_format="pyarrow")
        # union with an all-nodes zero row so zero-in-degree nodes survive
        # the fold (full-outer semantics without a join)
        summed = bucketed_aggregate(
            partial.union(
                nodes.map_batches(zero_rows, batch_format="pyarrow")
            ),
            "url", {"s": ("s", "sum")}, num_buckets=num_buckets,
        )

        def update(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy().astype(np.int64)
            rank = base + damping_pct * s // 100
            return pa.table({
                "url": batch.column("url").cast(pa.string()),
                "rank": pa.array(rank.astype(np.int64)),
            })

        ranks = summed.map_batches(update, batch_format="pyarrow").materialize()

    return ranks


def host_edges(edges, *, num_buckets: int = 32):
    """Page-level edge table -> distinct directed HOST pairs
    (src_host, dst_host), self-loops (intra-host links) included — the
    host-graph projection used for domain-level authority. Host = the
    authority part of the url (scheme stripped, first path slash ends it).
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    host_re = r"://(?P<host>[^/]+)"

    def project(batch: pa.Table) -> pa.Table:
        out = {}
        for col, name in (("src_url", "src_host"), ("dst_url", "dst_host")):
            ex = pc.extract_regex(_str_array(batch, col), host_re)
            out[name] = pc.struct_field(ex, "host")
        t = pa.table(out)
        return t.group_by(["src_host", "dst_host"]).aggregate([])

    projected = edges.map_batches(project, batch_format="pyarrow")
    return bucketed_map_groups(
        projected, "src_host",
        lambda df: df.drop_duplicates(["src_host", "dst_host"]),
        num_buckets=num_buckets,
    )


def host_rank(edges, *, iterations: int = 3, num_buckets: int = 16,
              **pagerank_kwargs):
    """Domain-level authority: the fixed-point integer ``pagerank`` run on
    the host-graph projection of a page-level edge table. Returns
    (host, rank). Same bit-exactness contract as ``pagerank`` — the oracle
    replays the identical recurrence over SQL-derived host edges."""

    def rename_in(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src_url", "dst_url"])

    def rename_out(t: pa.Table) -> pa.Table:
        return t.rename_columns(["host", "rank"])

    hedges = host_edges(edges, num_buckets=num_buckets).map_batches(
        rename_in, batch_format="pyarrow")
    ranked = pagerank(hedges, iterations=iterations,
                      num_buckets=num_buckets, **pagerank_kwargs)
    return ranked.map_batches(rename_out, batch_format="pyarrow")


def crawl_depth(edges, seeds, *, max_hops: int = 8, num_buckets: int = 32,
                broadcast_limit: int = 2_000_000):
    """Crawl/click depth: minimum hop distance from a seed url set along
    link direction — (url, depth) for every url reachable in <=``max_hops``
    hops (seeds themselves at depth 0). The feature crawl scheduling ranks
    by ("how far from a trusted seed did we find this?") and quality
    filtering uses as a spam prior.

    Level-synchronous frontier BFS. Each round expands the frontier one
    hop: while the frontier fits a worker (``broadcast_limit``) its url set
    ships once via ``ray.put`` and the materialized edge list is filtered
    in place (``pc.is_in``) — the edge set is scanned but never
    re-exchanged; an over-limit frontier falls back to a co-partitioned
    frontier×edges bucket join. Either way the round ends with one
    url-bucketed min-fold of dist ∪ candidates, and the loop exits early
    when a level discovers nothing (exact count on the materialized fold).
    Exchange volume: O(V·hops) folds + the edge scan per round; edges are
    exchanged only in the fallback regime.
    """
    import ray.data

    def seed_init(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": _str_array(batch, "url").unique(),
        })

    def dedup_urls(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["url"])

    seed_urls = bucketed_map_groups(
        seeds.map_batches(seed_init, batch_format="pyarrow"),
        "url", dedup_urls, num_buckets=num_buckets,
    )

    def with_depth(depth: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch.column("url"),
                "depth": pa.array(
                    np.full(len(batch), depth, dtype=np.int64)),
            })
        return fn

    dist = seed_urls.map_batches(with_depth(0),
                                 batch_format="pyarrow").materialize()
    frontier = dist

    def edge_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_url": _str_array(batch, "src_url"),
            "dst_url": _str_array(batch, "dst_url"),
        })

    edges_p = edges.map_batches(edge_proj, batch_format="pyarrow")
    # the loop joins against edges every round: pay the scan once
    edges_p = edges_p.materialize()

    import ray as _ray

    n_frontier = dist.count()

    if n_frontier <= broadcast_limit:
        # ---- driver-resident dist regime -----------------------------
        # While the reached set fits a worker, dist lives on the driver:
        # per round ONE exchange (the candidate distinct fold, sized by
        # the NEW frontier's neighborhood, not by |reached|) — the
        # distributed loop below re-folds the whole dist table every
        # round, O(V·hops) fold volume.  Falls back to that loop the
        # moment dist outgrows the limit.
        dist_pd = dist.select_columns(["url"]).to_pandas()["url"]
        depths = pd.Series(np.zeros(len(dist_pd), dtype=np.int64),
                           index=dist_pd.to_numpy())
        frontier_urls = depths.index.to_numpy()
        fell_back = False
        for hop in range(1, max_hops + 1):
            ref = _ray.put(pa.array(frontier_urls.astype(str)))

            def expand_b(batch: pa.Table, *, _ref=ref) -> pa.Table:
                import pyarrow.compute as pc

                vals = _ray.get(_ref)
                hit = batch.filter(
                    pc.is_in(batch.column("src_url"), value_set=vals))
                return pa.table({"url": hit.column("dst_url")}).group_by(
                    ["url"]).aggregate([])

            cand_pd = bucketed_map_groups(
                edges_p.map_batches(expand_b, batch_format="pyarrow"),
                "url", dedup_urls, num_buckets=num_buckets,
            ).to_pandas()
            # an all-empty fold loses its schema — no candidates this hop
            cand = (cand_pd["url"].to_numpy()
                    if "url" in cand_pd.columns else np.array([], dtype=object))
            new = cand[~pd.Index(cand).isin(depths.index)]
            if len(new) == 0:
                break
            depths = pd.concat([
                depths,
                pd.Series(np.full(len(new), hop, dtype=np.int64),
                          index=new),
            ])
            frontier_urls = new
            if len(depths) > broadcast_limit:
                fell_back = True
                break
        if not fell_back:
            return ray.data.from_arrow(pa.table({
                "url": pa.array(depths.index.to_numpy(), type=pa.string()),
                "depth": pa.array(depths.to_numpy(), type=pa.int64()),
            }))
        # rebuild distributed state and continue below from hop+1
        dist = ray.data.from_arrow(pa.table({
            "url": pa.array(depths.index.to_numpy(), type=pa.string()),
            "depth": pa.array(depths.to_numpy(), type=pa.int64()),
        })).materialize()
        frontier = dist.filter(expr=f"depth == {hop}")
        n_frontier = frontier.count()
        start_hop = hop + 1
    else:
        start_hop = 1

    for hop in range(start_hop, max_hops + 1):
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_limit:
            # frontier fits a worker: ship its url set once (ray.put) and
            # stream edges in place — no per-round edge re-exchange
            fvals = frontier.select_columns(["url"]).to_pandas()["url"]
            ref = _ray.put(pa.array(fvals.astype(str)))

            def expand(batch: pa.Table, *, _h=hop, _ref=ref) -> pa.Table:
                import pyarrow.compute as pc

                vals = _ray.get(_ref)
                hit = batch.filter(
                    pc.is_in(batch.column("src_url"), value_set=vals))
                t = pa.table({"url": hit.column("dst_url")}).group_by(
                    ["url"]).aggregate([])
                return pa.table({
                    "url": t.column("url"),
                    "depth": pa.array(
                        np.full(len(t), _h, dtype=np.int64)),
                })

            candidates = edges_p.map_batches(expand,
                                             batch_format="pyarrow")
        else:
            # frontier too big to broadcast: co-partitioned join (edges
            # re-exchange this round — the unbounded-frontier fallback)
            reached = bucket_join(
                frontier.select_columns(["url"]), edges_p,
                left_key="url", right_key="src_url",
                how="inner", num_buckets=num_buckets,
            )

            def as_candidate(batch: pa.Table, *, _h=hop) -> pa.Table:
                t = pa.table({
                    "url": _str_array(batch, "dst_url"),
                }).group_by(["url"]).aggregate([])
                return pa.table({
                    "url": t.column("url"),
                    "depth": pa.array(np.full(len(t), _h, dtype=np.int64)),
                })

            candidates = reached.map_batches(as_candidate,
                                             batch_format="pyarrow")

        def min_fold(df: pd.DataFrame) -> pd.DataFrame:
            out = (
                df.groupby("url", sort=False, as_index=False)["depth"].min()
            )
            out["depth"] = out["depth"].astype("int64")
            return out

        dist = bucketed_map_groups(
            dist.union(candidates), "url", min_fold,
            num_buckets=num_buckets,
        ).materialize()

        frontier = dist.filter(expr=f"depth == {hop}")
        n_frontier = frontier.count()
        if n_frontier == 0:
            break

    return dist


def crawl_depth_sql(*, seeds_cte: str = "seeds", max_hops: int = 8,
                    edges_cte: str = "link_edges") -> str:
    """DuckDB mirror of ``crawl_depth``: hop-capped recursive reachability
    with a min-depth fold (UNION dedups (url, depth) pairs, so the
    recursion is bounded by V × max_hops rows)."""
    return f"""
        , bfs(url, depth) AS (
            SELECT url, 0 AS depth FROM {seeds_cte}
          UNION
            SELECT e.dst_url, b.depth + 1
            FROM bfs b JOIN {edges_cte} e ON e.src_url = b.url
            WHERE b.depth + 1 <= {max_hops}
        )
        SELECT url, min(depth)::BIGINT AS depth FROM bfs GROUP BY url"""


def related_pages(edges, *, min_shared: int = 2,
                  max_outlinks_per_src: int = 32, num_buckets: int = 32):
    """Co-citation relatedness: url pairs linked FROM ``min_shared``+ common
    source pages — "people who link X also link Y"... inverted: two pages
    are related when the same sources cite both. Emits (url_a, url_b,
    n_shared) with url_a < url_b.

    Runs on the generic co-occurrence kernel
    (``partition.shared_key_pair_counts``): the key is the source page, the
    members are its outlink targets, so two targets co-cited by ``k``
    sources get n_shared = k. ``max_outlinks_per_src`` caps OUTLINKS per
    source page (a link-farm page citing thousands of urls manufactures
    quadratic relatedness with no signal).
    """
    from htrc_feature_reader_ray.stages.partition import (
        shared_key_pair_counts,
    )

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_url": _str_array(batch, "src_url"),
            "dst_url": _str_array(batch, "dst_url"),
        })

    return shared_key_pair_counts(
        edges.map_batches(proj, batch_format="pyarrow"),
        key_col="src_url", member_col="dst_url", min_shared=min_shared,
        max_members_per_key=max_outlinks_per_src, num_buckets=num_buckets,
        out_a="url_a", out_b="url_b", out_n="n_shared",
    )


def related_pages_sql(*, min_shared: int = 2, max_outlinks_per_src: int = 32,
                      edges_cte: str = "link_edges") -> str:
    """DuckDB mirror of ``related_pages`` (composes after a WITH preamble
    that defines ``edges_cte`` with src_url/dst_url columns)."""
    return f"""
        , rp_d AS (SELECT DISTINCT src_url, dst_url FROM {edges_cte}),
        rp_keep AS (
          SELECT src_url FROM rp_d GROUP BY src_url
          HAVING count(*) BETWEEN 2 AND {max_outlinks_per_src}
        ),
        rp_pairs AS (
          SELECT a.dst_url AS url_a, b.dst_url AS url_b
          FROM rp_d a JOIN rp_d b USING (src_url)
               JOIN rp_keep USING (src_url)
          WHERE a.dst_url < b.dst_url
        )
        SELECT url_a, url_b, count(*)::BIGINT AS n_shared
        FROM rp_pairs GROUP BY 1, 2
        HAVING count(*) >= {min_shared}"""


HITS_SCALE = 1_000_000  # hub/authority fixed-point scale (ppm of L1 mass)


def _norm_int(raw: np.ndarray, total: int, scale: int) -> np.ndarray:
    """Exact ``raw * scale // total`` for int64 vectors, falling back to
    python-int arithmetic when the multiply would overflow int64 (possible
    at extreme hub in-degree × scale; the SQL mirror is HUGEINT throughout
    so the fallback keeps bit-parity)."""
    if total <= 0:
        return np.zeros(len(raw), dtype=np.int64)
    if raw.size and int(raw.max()) > (2**63 - 1) // scale:
        return np.array(
            [int(v) * scale // total for v in raw], dtype=np.int64)
    return raw.astype(np.int64) * scale // total


def hits(edges, *, iterations: int = 2, scale: int = HITS_SCALE,
         num_buckets: int = 32, broadcast_limit: int = 2_000_000):
    """HITS hubs & authorities over a distinct edge table — the companion
    authority signal to :func:`pagerank` (Kleinberg's mutual recursion:
    good hubs cite good authorities, good authorities are cited by good
    hubs; crawl curation uses the hub score to find index/portal pages and
    the authority score as a content-quality prior).

    Fixed-point INTEGER iteration, L1-normalized each half-step so values
    stay in [0, scale] (ppm of the total mass):

        a_t(v) = Σ h_{t-1}(u) over in-edges   → a_t ·= scale // Σ a_t
        h_t(u) = Σ a_t(v)     over out-edges  → h_t ·= scale // Σ h_t

    All updates are order-independent integer sums and floor divisions —
    bit-exact across parallelism levels and replayed verbatim by the
    unrolled-CTE SQL oracle (``hits_sql``). Per iteration: two bucket
    joins (scores onto edges) + two bucketed folds + two scalar sums; the
    score tables are the only materialized iteration state (O(nodes)).
    """
    edges = edges.materialize()
    nodes = _distinct_nodes(edges, num_buckets=num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "hub": pa.array([], type=pa.int64()),
            "authority": pa.array([], type=pa.int64()),
        }))

    if n <= broadcast_limit:
        # broadcast fast path — see pagerank(); ONE exchange per
        # half-step, normalization and the zero re-attach happen on the
        # driver-resident score vectors.  In the bucketed path the inner
        # score join never drops an edge (every edge src has an h row,
        # every edge dst an a row), so the full-vector push with absent
        # scores as 0 is the identical sum — bit-exact parity.
        urls = nodes.to_pandas()["url"].to_numpy()
        h_vec = pd.Series(np.full(n, scale, dtype=np.int64), index=urls)
        a_vec = pd.Series(np.zeros(n, dtype=np.int64), index=urls)
        for _ in range(iterations):
            raw_a = _bcast_push_fold(
                edges, h_vec, src_col="src_url", dst_col="dst_url",
                num_buckets=num_buckets).reindex(urls, fill_value=0)
            a_vec = pd.Series(
                _norm_int(raw_a.to_numpy(), int(raw_a.sum()), scale),
                index=urls)
            raw_h = _bcast_push_fold(
                edges, a_vec, src_col="dst_url", dst_col="src_url",
                num_buckets=num_buckets).reindex(urls, fill_value=0)
            h_vec = pd.Series(
                _norm_int(raw_h.to_numpy(), int(raw_h.sum()), scale),
                index=urls)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array(urls, type=pa.string()),
            "hub": pa.array(h_vec.to_numpy(), type=pa.int64()),
            "authority": pa.array(a_vec.to_numpy(), type=pa.int64()),
        }))

    def init_h(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url").cast(pa.string()),
            "h": pa.array(np.full(len(batch), scale, dtype=np.int64)),
        })

    h = nodes.map_batches(init_h, batch_format="pyarrow").materialize()
    a = None

    def half_step(score_ds, score_col, join_on, emit_as, out_col):
        """One HITS half-step: push score over edges, fold, L1-normalize."""
        joined = bucket_join(
            edges, score_ds, left_key=join_on, right_key="url",
            how="inner", num_buckets=num_buckets,
        )

        def push(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch.column(emit_as).cast(pa.string()),
                out_col: batch.column(score_col),
            })

        raw = bucketed_aggregate(
            joined.map_batches(push, batch_format="pyarrow"),
            "url", {out_col: (out_col, "sum")}, num_buckets=num_buckets,
        ).materialize()
        total = int(raw.sum(out_col) or 0)

        def norm(batch: pa.Table) -> pa.Table:
            v = batch.column(out_col).to_numpy().astype(np.int64)
            return pa.table({
                "url": batch.column("url").cast(pa.string()),
                out_col: pa.array(_norm_int(v, total, scale)),
            })

        return raw.map_batches(norm, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        a = half_step(h, "h", "src_url", "dst_url", "a")
        h = half_step(a, "a", "dst_url", "src_url", "h")

    # full-outer re-attach over the node set (absent score = 0), one fold
    def zero_rows(batch: pa.Table) -> pa.Table:
        z = np.zeros(len(batch), dtype=np.int64)
        return pa.table({
            "url": batch.column("url").cast(pa.string()),
            "h": pa.array(z), "a": pa.array(z),
        })

    def pad(col_have, col_zero):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch.column("url").cast(pa.string()),
                "h" if col_have == "h" else "a": batch.column(col_have),
                col_zero: pa.array(
                    np.zeros(len(batch), dtype=np.int64)),
            }).select(["url", "h", "a"])
        return fn

    unioned = (
        nodes.map_batches(zero_rows, batch_format="pyarrow")
        .union(h.map_batches(pad("h", "a"), batch_format="pyarrow"))
        .union(a.map_batches(pad("a", "h"), batch_format="pyarrow"))
    )
    out = bucketed_aggregate(
        unioned, "url", {"h": ("h", "sum"), "a": ("a", "sum")},
        num_buckets=num_buckets,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "hub": batch.column("h").cast(pa.int64()),
            "authority": batch.column("a").cast(pa.int64()),
        })

    return out.map_batches(rename, batch_format="pyarrow")


def hits_sql(*, iterations: int = 2, scale: int = HITS_SCALE,
             edges_cte: str = "e2") -> str:
    """Unrolled-CTE DuckDB replay of :func:`hits` (HUGEINT arithmetic —
    composes after a WITH preamble defining ``edges_cte``)."""
    parts = [f"""
        , hits_nodes AS (
            SELECT src_url AS url FROM {edges_cte}
            UNION SELECT dst_url FROM {edges_cte}
        ),
        h0 AS (SELECT url, {scale}::HUGEINT AS h FROM hits_nodes)"""]
    prev = "h0"
    for i in range(1, iterations + 1):
        parts.append(f"""
        , a{i}r AS (
            SELECT e.dst_url AS url, sum(p.h) AS a
            FROM {edges_cte} e JOIN {prev} p ON p.url = e.src_url
            GROUP BY 1
        ),
        a{i} AS (
            SELECT url, a * {scale} // (SELECT sum(a) FROM a{i}r) AS a
            FROM a{i}r
        ),
        h{i}r AS (
            SELECT e.src_url AS url, sum(q.a) AS h
            FROM {edges_cte} e JOIN a{i} q ON q.url = e.dst_url
            GROUP BY 1
        ),
        h{i} AS (
            SELECT url, h * {scale} // (SELECT sum(h) FROM h{i}r) AS h
            FROM h{i}r
        )""")
        prev = f"h{i}"
    parts.append(f"""
        SELECT n.url,
               coalesce(h.h, 0)::BIGINT AS hub,
               coalesce(a.a, 0)::BIGINT AS authority
        FROM hits_nodes n
        LEFT JOIN h{iterations} h ON h.url = n.url
        LEFT JOIN a{iterations} a ON a.url = n.url""")
    return "".join(parts)


def host_outlink_mix(edges, *, num_buckets: int = 16):
    """Per-host outlink mix — the link-farm / SEO-spam prior: ``(host,
    n_out, n_external, external_ppm)`` over the DISTINCT page-level edge
    set, where external = the link leaves its host. Hosts that only link
    within themselves (nav boilerplate) score 0; pure link directories
    score ~10⁶.

    Scale shape: vectorized RE2 host projection + per-batch collapse to
    (host, n, n_ext) — megasite skew is absorbed before the exchange —
    then one host-bucketed sum and a stateless integer-ppm projection.
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    host_re = r"://(?P<host>[^/]+)"

    def partial(batch: pa.Table) -> pa.Table:
        src = pc.struct_field(
            pc.extract_regex(_str_array(batch, "src_url"), host_re), "host")
        dst = pc.struct_field(
            pc.extract_regex(_str_array(batch, "dst_url"), host_re), "host")
        ext = pc.cast(pc.not_equal(src, dst), pa.int64())
        t = pa.table({"host": src, "n_ext": ext})
        g = t.group_by("host").aggregate(
            [("n_ext", "sum"), ([], "count_all")])
        return g.rename_columns(["host", "n_ext", "n_out"])

    agg = bucketed_aggregate(
        edges.map_batches(partial, batch_format="pyarrow"),
        "host", {"n_out": ("n_out", "sum"), "n_ext": ("n_ext", "sum")},
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_out"].to_numpy(dtype=np.int64)
        ext = df["n_ext"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "host": df["host"],
            "n_out": n,
            "n_external": ext,
            "external_ppm": (ext * 1_000_000) // n,
        })

    return agg.map_batches(finish, batch_format="pandas")


def host_outlink_mix_sql(*, edges_cte: str = "link_edges") -> str:
    """SQL mirror (composes after a WITH preamble providing ``edges_cte``
    with distinct (src_url, dst_url))."""
    return f"""
        , he AS (
          SELECT regexp_extract(src_url, '://([^/]+)', 1) AS host,
                 regexp_extract(dst_url, '://([^/]+)', 1) AS dst_host
          FROM {edges_cte}
        )
        SELECT host, count(*)::BIGINT AS n_out,
               (count(*) FILTER (WHERE dst_host <> host))::BIGINT
                   AS n_external,
               ((count(*) FILTER (WHERE dst_host <> host)) * 1000000
                   // count(*))::BIGINT AS external_ppm
        FROM he GROUP BY 1"""


def degree_histogram(degrees):
    """Graph-QA degree distribution: ``(kind, degree_bucket, n_urls)``
    where ``kind`` ∈ {'out','in'} and ``degree_bucket`` = bit_length(d)
    (0 for d=0, else floor(log2 d)+1 — the power-of-two histogram a crawl
    dashboard plots). Exact integer bucketing via ``np.frexp`` (no log
    rounding; == SQL ``length(bin(d))``). Bucket cardinality ≤ 2×64, so
    the final fold is a native groupby over per-batch partials."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for kind, col in (("out", "out_degree"), ("in", "in_degree")):
            v = df[col].to_numpy(dtype=np.int64)
            b = np.where(v > 0, np.frexp(v.astype(np.float64))[1], 0)
            vc = pd.Series(b).value_counts()
            outs.append(pd.DataFrame({
                "kind": kind,
                "degree_bucket": vc.index.to_numpy(dtype=np.int64),
                "n_urls": vc.to_numpy(dtype=np.int64),
            }))
        return pd.concat(outs, ignore_index=True)

    agg = (degrees.map_batches(partial, batch_format="pandas")
           .groupby(["kind", "degree_bucket"]).sum("n_urls"))

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"sum(n_urls)": "n_urls"})

    return agg.map_batches(rename, batch_format="pandas")


def degree_histogram_sql(*, edges_cte: str = "link_edges") -> str:
    """SQL mirror (composes after a WITH preamble; ``length(bin(d))`` ==
    bit_length == the engine's frexp bucket)."""
    return f"""
        , deg AS (
          SELECT url, sum(o)::BIGINT AS out_degree,
                 sum(i)::BIGINT AS in_degree
          FROM (SELECT src_url AS url, 1 AS o, 0 AS i FROM {edges_cte}
                UNION ALL SELECT dst_url, 0, 1 FROM {edges_cte})
          GROUP BY url
        ), buck AS (
          SELECT 'out' AS kind,
                 CASE WHEN out_degree = 0 THEN 0
                      ELSE length(bin(out_degree)) END AS degree_bucket
          FROM deg
          UNION ALL
          SELECT 'in',
                 CASE WHEN in_degree = 0 THEN 0
                      ELSE length(bin(in_degree)) END
          FROM deg
        )
        SELECT kind, degree_bucket::BIGINT AS degree_bucket,
               count(*)::BIGINT AS n_urls
        FROM buck GROUP BY 1, 2"""


def _orient_by_degree(und, deg, *, num_buckets: int,
                      broadcast_limit: int = 2_000_000):
    """Orient each undirected edge (a, b) as (lo, hi) with ``lo`` the
    endpoint of smaller (degree, node) rank — the Suri–Vassilvitskii
    charging rule shared by the triangle census and the per-node
    clustering pass.  When the degree table fits a worker it broadcasts
    once and orientation is a single stateless map; otherwise two bucket
    joins attach the degrees (the unbounded-graph plan)."""
    import ray

    if deg.count() <= broadcast_limit:
        deg_pd = deg.to_pandas()
        dser = pd.Series(deg_pd["d"].to_numpy().astype(np.int64),
                         index=deg_pd["node"].to_numpy())
        ref = ray.put(dser)

        def orient_b(t: pa.Table) -> pa.Table:
            w = ray.get(ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da = w.loc[a].to_numpy()
            db = w.loc[b].to_numpy()
            first = (da < db) | ((da == db) & (a < b))
            return pa.table({
                "lo": pa.array(np.where(first, a, b), type=pa.string()),
                "hi": pa.array(np.where(first, b, a), type=pa.string()),
            })

        return und.map_batches(orient_b, batch_format="pyarrow")

    da = deg.map_batches(
        lambda t: t.rename_columns(["node", "da"]), batch_format="pyarrow")
    db = deg.map_batches(
        lambda t: t.rename_columns(["node_b", "db"]), batch_format="pyarrow")
    withdeg = bucket_join(
        bucket_join(und, da, left_key="a", right_key="node",
                    num_buckets=num_buckets),
        db, left_key="b", right_key="node_b", num_buckets=num_buckets,
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        less = (t.column("da").to_numpy(zero_copy_only=False)
                < t.column("db").to_numpy(zero_copy_only=False))
        eq = (t.column("da").to_numpy(zero_copy_only=False)
              == t.column("db").to_numpy(zero_copy_only=False))
        first = less | (eq & (a < b))
        return pa.table({
            "lo": pa.array(np.where(first, a, b), type=pa.string()),
            "hi": pa.array(np.where(first, b, a), type=pa.string()),
        })

    return withdeg.map_batches(orient, batch_format="pyarrow")


def _semi_on_edge_keys(keyed, und, *, num_buckets: int, n_edges: int,
                       broadcast_limit: int = 5_000_000):
    """Keep rows of ``keyed`` whose ``_k`` is an existing edge key.  When
    the edge-key set fits a worker it broadcasts as a pd.Index (exact
    hash-set membership, one stateless filter map); otherwise a bucketed
    semi-join — same result, one exchange."""
    import pyarrow.compute as pc
    import ray

    def with_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("a").cast(pa.string()),
            t.column("b").cast(pa.string()), "|")
        return t.append_column("_k", k)

    if n_edges <= broadcast_limit:
        keys = und.map_batches(
            with_key, batch_format="pyarrow",
        ).select_columns(["_k"]).to_pandas()["_k"]
        ref = ray.put(pd.Index(keys.to_numpy()))

        def filt(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            ix = ray.get(ref)
            mask = ix.get_indexer(
                t.column("_k").to_numpy(zero_copy_only=False)) >= 0
            return t.filter(pa.array(mask))

        return keyed.map_batches(filt, batch_format="pyarrow")

    return bucket_join(
        keyed,
        und.map_batches(with_key, batch_format="pyarrow")
           .select_columns(["_k"]),
        left_key="_k", right_key="_k", how="semi",
        num_buckets=num_buckets,
    )


def triangle_stats(edges, *, num_buckets: int = 32):
    """Global triangle census of the UNDIRECTED link graph: node / edge /
    wedge / triangle counts and the global clustering coefficient
    (integer ppm) — the crawl-QA structure signals (spam farms are
    triangle-dense; true link hierarchies are triangle-sparse).

    Scale shape — the degree-ordered algorithm (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11):

      1. canonical distinct undirected edges ``a < b`` (one bucketed
         distinct), materialized once — it feeds three consumers;
      2. node degrees: edge explode → per-batch partial → one bucketed
         fold;
      3. every edge oriented lo→hi by ``(degree, node)`` rank via two
         bucket joins, so each triangle is charged to its LOWEST-DEGREE
         vertex: per-key neighbor-pair emission is bounded by the oriented
         out-degree (O(√m) amortized), never the raw hub in-degree — this
         is what makes wedge emission feasible on a power-law web graph;
      4. wedge pairs (x, y) — ``shared_key_pair_counts`` keyed on lo —
         semi-joined against the edge set on a composite key; surviving
         wedge multiplicities sum to the exact triangle count.

    Returns a ONE-ROW pandas DataFrame (the five scalars are aggregates of
    tiny folded tables; only they reach the driver)."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import (
        shared_key_pair_counts,
    )

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src_url"), t.column("dst_url")
        keep = pc.invert(pc.equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]).aggregate([])

    und = bucketed_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], {"_n": ("b", "size")}, num_buckets=num_buckets,
    ).drop_columns(["_n"]).materialize()

    def explode_deg(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t.column("a").combine_chunks().cast(pa.string()),
            t.column("b").combine_chunks().cast(pa.string()),
        ])
        return (pa.table({"node": nodes})
                .group_by(["node"]).aggregate([([], "count_all")])
                .rename_columns(["node", "d"]))

    deg = bucketed_aggregate(
        und.map_batches(explode_deg, batch_format="pyarrow"),
        ["node"], {"d": ("d", "sum")}, num_buckets=num_buckets,
    ).materialize()

    n_nodes = deg.count()
    n_edges = und.count()
    n_wedges = int(deg.map_batches(
        lambda t: pa.table({"w": pa.array(
            [int((t.column("d").to_numpy() *
                  (t.column("d").to_numpy() - 1) // 2).sum())],
            type=pa.int64())}),
        batch_format="pyarrow",
    ).sum("w") or 0)

    # orientation: lo = endpoint with the smaller (degree, node) rank
    oriented = _orient_by_degree(und, deg, num_buckets=num_buckets)
    wedges = shared_key_pair_counts(
        oriented, key_col="lo", member_col="hi",
        max_members_per_key=1 << 30,  # orientation already bounds fan-out
        num_buckets=num_buckets, out_a="a", out_b="b", out_n="n_wedge",
    )

    import pyarrow.compute as _pc

    def with_key(t: pa.Table) -> pa.Table:
        k = _pc.binary_join_element_wise(
            t.column("a").cast(pa.string()), t.column("b").cast(pa.string()),
            "|")
        return t.append_column("_k", k)

    closed = _semi_on_edge_keys(
        wedges.map_batches(with_key, batch_format="pyarrow"),
        und, num_buckets=num_buckets, n_edges=n_edges,
    )
    n_triangles = int(closed.sum("n_wedge") or 0)

    cc = (3 * n_triangles * 1_000_000) // n_wedges if n_wedges else 0
    return pd.DataFrame({
        "n_nodes": np.array([n_nodes], dtype=np.int64),
        "n_edges": np.array([n_edges], dtype=np.int64),
        "n_wedges": np.array([n_wedges], dtype=np.int64),
        "n_triangles": np.array([n_triangles], dtype=np.int64),
        "global_cc_ppm": np.array([cc], dtype=np.int64),
    })


def triangle_stats_sql(*, edges_cte: str = "link_edges") -> str:
    """SQL mirror (composes after a WITH preamble): triangles counted once
    via the lexicographically-least vertex — orientation-independent, so it
    equals the engine's degree-ordered count exactly."""
    return f"""
        , und AS MATERIALIZED (
            SELECT DISTINCT least(src_url, dst_url) AS a,
                            greatest(src_url, dst_url) AS b
            FROM {edges_cte} WHERE src_url <> dst_url
        ), deg AS (
            SELECT n, count(*)::BIGINT AS d FROM (
                SELECT a AS n FROM und UNION ALL SELECT b FROM und)
            GROUP BY 1
        ), tri AS (
            SELECT count(*)::BIGINT AS t
            FROM und e1
            JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
        ), wed AS (SELECT sum(d * (d - 1) // 2)::BIGINT AS w FROM deg)
        SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
               (SELECT count(*) FROM und)::BIGINT AS n_edges,
               (SELECT w FROM wed)::BIGINT AS n_wedges,
               (SELECT t FROM tri)::BIGINT AS n_triangles,
               (CASE WHEN (SELECT w FROM wed) > 0
                     THEN (3 * (SELECT t FROM tri) * 1000000)
                          // (SELECT w FROM wed)
                     ELSE 0 END)::BIGINT AS global_cc_ppm"""


def k_core(edges, *, k: int = 2, max_rounds: int = 12,
           num_buckets: int = 32, broadcast_limit: int = 2_000_000):
    """k-core of the UNDIRECTED graph by iterative peeling: each round
    drops every node of degree < k, then the edges touching it; the k-core
    is the fixpoint (the classic crawl-graph density signal — spam farms
    and true communities live in high cores, pendant chains do not).

    The op is defined as AT MOST ``max_rounds`` peeling rounds with early
    exit at the fixpoint — so engine and SQL mirror are equal by
    construction (converged early: the mirror's remaining rounds are
    no-ops; not converged: both executed exactly ``max_rounds`` rounds).

    Scale shape, two paths on the node-count gate (:func:`coreness`'s
    broadcast↔exchange auto-switch, path equality pinned in pytest). At
    or under ``broadcast_limit`` nodes the peel iterates over the
    integer-coded adjacency pinned once: each round is a single map pass
    with the alive mask broadcast (alive-neighbor degree = one masked
    bincount), the peel decision runs on the driver's node-sized vector
    — zero exchanges per round. Above the gate, per round: degrees = one
    bucketed fold over the current edge set; survivors semi-join back
    onto the edges (two key-bucketed passes). The edge set is
    materialized per round (it IS the iteration state, like pagerank's
    rank table); the only driver values are two scalar counts per round
    (the convergence test). Returns ``(url, core_degree)`` — the node's
    degree inside the final core."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucket_join

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src_url"), t.column("dst_url")
        keep = pc.invert(pc.equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "a": pc.min_element_wise(s, d),
            "b": pc.max_element_wise(s, d),
        }).group_by(["a", "b"]).aggregate([])

    def explode_deg(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t.column("a").combine_chunks().cast(pa.string()),
            t.column("b").combine_chunks().cast(pa.string()),
        ])
        return (pa.table({"node": nodes})
                .group_by(["node"]).aggregate([([], "count_all")])
                .rename_columns(["node", "d"]))

    def degrees(edge_ds):
        return bucketed_aggregate(
            edge_ds.map_batches(explode_deg, batch_format="pyarrow"),
            ["node"], {"d": ("d", "sum")}, num_buckets=num_buckets,
        ).materialize()

    def survivors(deg_ds):
        return deg_ds.filter(
            expr=f"d >= {int(k)}").select_columns(["node"])

    def finish(deg_ds):
        out = deg_ds.filter(expr=f"d >= {int(k)}")
        return out.map_batches(
            lambda t: t.rename_columns(["url", "core_degree"]),
            batch_format="pyarrow")

    cur = bucketed_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], {"_n": ("b", "size")}, num_buckets=num_buckets,
    ).drop_columns(["_n"]).materialize()

    import ray
    import ray.data

    deg0 = degrees(cur)
    if deg0.count() <= broadcast_limit:
        # broadcast fast path: integer-coded canonical edges pinned
        # once; each peel round is one map pass with the alive mask
        # broadcast (masked bincount partials, node-sized driver fold)
        node_pd = deg0.to_pandas()
        keys = np.sort(node_pd["node"].to_numpy())
        n = len(keys)
        if n == 0:
            return finish(deg0)
        kref = ray.put(pa.array(keys, type=pa.string()))

        def encode(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ai = pc.index_in(t.column("a").cast(pa.string()),
                             value_set=ks).cast(pa.int64())
            bi = pc.index_in(t.column("b").cast(pa.string()),
                             value_set=ks).cast(pa.int64())
            return pa.table({"a": ai, "b": bi})

        pinned = cur.map_batches(encode,
                                 batch_format="pyarrow").materialize()

        def deg_of(alive: np.ndarray) -> np.ndarray:
            aref = ray.put(alive)

            def deg_map(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table({"node": pa.array([], pa.int64()),
                                     "d": pa.array([], pa.int64())})
                al = ray.get(aref)
                a = t.column("a").to_numpy(zero_copy_only=False)
                b = t.column("b").to_numpy(zero_copy_only=False)
                m = al[a] & al[b]
                cnt = (np.bincount(a[m], minlength=n)
                       + np.bincount(b[m], minlength=n))
                nz = np.flatnonzero(cnt)
                return pa.table({
                    "node": pa.array(nz.astype(np.int64)),
                    "d": pa.array(cnt[nz].astype(np.int64))})

            parts = pinned.map_batches(
                deg_map, batch_format="pyarrow").to_pandas()
            deg = np.zeros(n, dtype=np.int64)
            if len(parts) and "node" in parts.columns:
                np.add.at(deg, parts["node"].to_numpy(),
                          parts["d"].to_numpy())
            return deg

        def emit(deg: np.ndarray):
            sel = np.flatnonzero((deg > 0) & (deg >= int(k)))
            return ray.data.from_arrow(pa.table({
                "url": pa.array(keys[sel], type=pa.string()),
                "core_degree": pa.array(deg[sel], type=pa.int64())}))

        alive = np.ones(n, dtype=bool)
        for _ in range(max_rounds):
            deg = deg_of(alive)
            present = deg > 0
            keep_m = present & (deg >= int(k))
            if int(keep_m.sum()) == int(present.sum()):
                return emit(deg)  # fixpoint, same rule as the exchange
            alive = keep_m
        return emit(deg_of(alive))  # rounds exhausted: one extra pass

    for _ in range(max_rounds):
        deg = degrees(cur)
        keep = survivors(deg)
        if keep.count() == deg.count():
            return finish(deg)  # fixpoint: further rounds are no-ops
        cur = bucket_join(
            bucket_join(cur, keep, left_key="a", right_key="node",
                        how="semi", num_buckets=num_buckets),
            keep.map_batches(lambda t: t.rename_columns(["node_b"]),
                             batch_format="pyarrow"),
            left_key="b", right_key="node_b", how="semi",
            num_buckets=num_buckets,
        ).materialize()

    return finish(degrees(cur))


def k_core_sql(*, k: int = 2, max_rounds: int = 12,
               edges_cte: str = "link_edges") -> str:
    """SQL mirror (composes after a WITH preamble): exactly ``max_rounds``
    unrolled peel rounds — equal to the engine's early-exit iteration by
    the fixpoint argument in :func:`k_core`. MATERIALIZED is load-bearing
    (each round references the previous edge table three times)."""
    sql = f"""
        , und AS MATERIALIZED (
            SELECT DISTINCT least(src_url, dst_url) AS a,
                            greatest(src_url, dst_url) AS b
            FROM {edges_cte} WHERE src_url <> dst_url
        ), e0 AS MATERIALIZED (SELECT a, b FROM und)"""
    prev = "e0"
    for r in range(1, max_rounds + 1):
        sql += f"""
        , d{r} AS (SELECT n, count(*)::BIGINT AS d FROM (
              SELECT a AS n FROM {prev} UNION ALL SELECT b FROM {prev})
              GROUP BY 1)
        , s{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE d >= {k})
        , e{r} AS MATERIALIZED (
              SELECT e.a, e.b FROM {prev} e
              JOIN s{r} x ON e.a = x.n JOIN s{r} y ON e.b = y.n)"""
        prev = f"e{r}"
    return sql + f"""
        SELECT n AS url, d AS core_degree FROM (
            SELECT n, count(*)::BIGINT AS d FROM (
                SELECT a AS n FROM {prev} UNION ALL SELECT b FROM {prev})
            GROUP BY 1)
        WHERE d >= {k}"""


def coreness(edges, *, max_rounds: int = 8, num_buckets: int = 32,
             broadcast_limit: int = 2_000_000):
    """Full core decomposition of the undirected graph — every node's
    core NUMBER, where :func:`k_core` answers membership for one fixed
    k — via the distributed h-index iteration (Lü, Chen, Zhang,
    Zhou & Stanley, Nature Comm. 7:10168's H-operator): start at
    ``c₀(v) = deg(v)`` and repeat

        ``c_r(v) = H({c_{r−1}(u) : u ∈ N(v)})``

    with H the Hirsch index (largest h with ≥ h neighbors valued ≥ h).
    The sequence is pointwise non-increasing and its fixpoint IS the
    coreness — the peeling order no sequential algorithm could
    distribute becomes a message-passing iteration. As with k_core the
    op is DEFINED as at most ``max_rounds`` rounds with early exit at
    the fixpoint, so engine and unrolled mirror are equal by
    construction (values where not yet converged are the r-th H-iterate
    on both sides). Output: ``(url, coreness)``.

    Scale shape, two paths on the node-count gate (the engine-wide
    broadcast↔exchange auto-switch, paths equal by pinned pytest). At
    or under ``broadcast_limit`` nodes: the adjacency is integer-coded
    and pinned ONCE as u-bucket-complete blocks; each round is a single
    map pass over those pinned blocks with the node-value vector
    ``ray.put`` (neighbor lookup = one vectorized gather, H-index = the
    same lexsort/reduceat kernel) — ZERO exchanges per round, vs the
    two |E|-sized exchanges of the fallback. Above the gate, per round:
    neighbor values = ONE value-onto-directed-edge co-partition (state
    joined on the edge's dst), H-index = ONE src-keyed fold with a
    vectorized sort-rank kernel (h = max min(rank, value) over the
    desc-sorted neighbor values); the directed adjacency (2|E|, static)
    materializes once, the state is node-cardinality-sized; convergence
    test = one co-partition diff producing a single driver scalar."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src_url"), t.column("dst_url")
        keep = pc.invert(pc.equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "a": pc.min_element_wise(s, d),
            "b": pc.max_element_wise(s, d),
        }).group_by(["a", "b"]).aggregate([])

    und = bucketed_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], {"_n": ("b", "size")}, num_buckets=num_buckets,
    ).drop_columns(["_n"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pa.concat_arrays([t.column("a").combine_chunks(),
                                   t.column("b").combine_chunks()]),
            "v": pa.concat_arrays([t.column("b").combine_chunks(),
                                   t.column("a").combine_chunks()]),
        })

    dirs = und.map_batches(both_dirs,
                           batch_format="pyarrow").materialize()

    state = bucketed_aggregate(
        dirs.map_batches(
            lambda t: (pa.table({"node": t.column("u")})
                       .group_by("node").aggregate([([], "count_all")])
                       .rename_columns(["node", "c"])),
            batch_format="pyarrow"),
        ["node"], {"c": ("c", "sum")}, num_buckets=num_buckets,
    ).materialize()

    import ray
    import ray.data

    node_pd = state.to_pandas() if state.count() <= broadcast_limit else None
    if node_pd is not None:
        # broadcast fast path: integer-code the adjacency against the
        # sorted node vocabulary, pin it once as u-bucket-complete
        # blocks, then iterate with the value vector broadcast per round
        keys = np.sort(node_pd["node"].to_numpy())
        vals = np.zeros(len(keys), dtype=np.int64)
        vals[np.searchsorted(keys, node_pd["node"].to_numpy())] = (
            node_pd["c"].to_numpy(dtype=np.int64))
        if len(keys) == 0:
            return ray.data.from_arrow(pa.table({
                "url": pa.array([], pa.string()),
                "coreness": pa.array([], pa.int64())}))
        kref = ray.put(pa.array(keys, type=pa.string()))
        # bucket count sized so one bucket's rows stay far below the
        # block-split threshold (a split u-group would break the
        # complete-neighborhood contract of the round kernel)
        nb = max(1, num_buckets, dirs.count() // 2_000_000 + 1)

        def encode(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            ui = pc.index_in(t.column("u").cast(pa.string()),
                             value_set=ks).cast(pa.int64())
            vi = pc.index_in(t.column("v").cast(pa.string()),
                             value_set=ks).cast(pa.int64())
            g = pa.array(ui.to_numpy(zero_copy_only=False) % nb,
                         type=pa.int64())
            return pa.table({"u": ui, "v": vi, "g": g})

        pinned = (dirs.map_batches(encode, batch_format="pyarrow")
                  .groupby("g")
                  .map_groups(lambda df: df[["u", "v"]],
                              batch_format="pandas")
                  .materialize())

        def round_map_factory(sref):
            def round_map(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table({
                        "node": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                        "chg": pa.array([], pa.int64())})
                sv = ray.get(sref)
                u = t.column("u").to_numpy(zero_copy_only=False)
                v = t.column("v").to_numpy(zero_copy_only=False)
                cv = sv[v]
                order = np.lexsort((-cv, u))
                u2, cv2 = u[order], cv[order]
                new = np.empty(len(u2), dtype=bool)
                new[0] = True
                new[1:] = u2[1:] != u2[:-1]
                starts = np.flatnonzero(new)
                pos = (np.arange(len(u2), dtype=np.int64)
                       - np.repeat(starts, np.diff(
                           np.append(starts, len(u2)))))
                h = np.minimum(pos + 1, cv2)
                hm = np.maximum.reduceat(h, starts)
                uu = u2[starts]
                return pa.table({
                    "node": pa.array(uu.astype(np.int64)),
                    "c": pa.array(hm.astype(np.int64)),
                    "chg": pa.array(
                        (hm != sv[uu]).astype(np.int64))})
            return round_map

        for _ in range(max_rounds):
            sref = ray.put(vals)
            # batch_size=None EXPLICITLY: the H-index fold is the one
            # non-additive per-batch kernel in the fast paths — it is
            # only correct when a node's whole neighborhood arrives in
            # one batch, which the g-grouped pinned blocks guarantee
            # ONLY if map_batches passes whole blocks (other Ray
            # versions default batch_size=1024, which would split them)
            out = pinned.map_batches(
                round_map_factory(sref), batch_size=None,
                batch_format="pyarrow").to_pandas()
            # loud guard for the same contract: a u-group split across
            # batches emits the same node from two batches, and the
            # last-write-wins vals[...] assignment below would silently
            # keep a PARTIAL H-index
            if not out["node"].is_unique:
                raise AssertionError(
                    "coreness round kernel saw a node in >1 batch — "
                    "a pinned u-bucket block was split; the per-batch "
                    "H-index fold is not additive across splits")
            if int(out["chg"].sum()) == 0:
                break
            vals = vals.copy()
            vals[out["node"].to_numpy()] = out["c"].to_numpy()

        return ray.data.from_arrow(pa.table({
            "url": pa.array(keys, type=pa.string()),
            "coreness": pa.array(vals, type=pa.int64())}))

    def hindex_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """H-index per node over its is_self=0 neighbor values; the
        tagged is_self=1 row carries the node's OLD value so the
        convergence diff rides the same exchange (no separate join)."""
        if not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64"),
                                 "chg": pd.Series([], dtype="int64")})
        # sort self rows (is_self=1) FIRST within a node so reduceat
        # segments align; exclude them from rank/H via a -inf-like value
        df = df.sort_values(["node", "is_self", "cv"],
                            ascending=[True, False, False],
                            kind="mergesort", ignore_index=True)
        node = df["node"].to_numpy()
        cv = df["cv"].to_numpy()
        selfm = df["is_self"].to_numpy() == 1
        new = np.empty(len(node), dtype=bool)
        new[0] = True
        new[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        # neighbor rank: position within segment counting non-self only
        pos = np.arange(len(node), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(node))))
        nself = np.zeros(len(starts), dtype=np.int64)
        np.add.at(nself, seg[selfm], 1)
        rank = pos - nself[seg] + 1  # 1-based among neighbor rows
        h = np.where(selfm, 0, np.minimum(rank, cv))
        hm = np.maximum.reduceat(h, starts)
        old = np.zeros(len(starts), dtype=np.int64)
        old[seg[selfm]] = cv[selfm]
        return pd.DataFrame({
            "node": node[starts],
            "c": hm.astype(np.int64),
            "chg": (hm != old).astype(np.int64),
        })

    for _ in range(max_rounds):
        vals = bucket_join(
            dirs, state.map_batches(
                lambda t: t.rename_columns(["nv", "cv"]),
                batch_format="pyarrow"),
            left_key="v", right_key="nv", how="inner",
            num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table({
                "node": t.column("u"),
                "cv": t.column("cv"),
                "is_self": pa.array(
                    np.zeros(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow")
        tagged_state = state.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "cv": t.column("c"),
                "is_self": pa.array(
                    np.ones(t.num_rows, dtype=np.int64))}),
            batch_format="pyarrow")
        nxt = bucketed_map_groups(
            vals.union(tagged_state), "node", hindex_bucket,
            num_buckets=num_buckets).materialize()
        changed = int(nxt.sum("chg") or 0)
        state = nxt.drop_columns(["chg"])
        if changed == 0:
            break

    return state.map_batches(
        lambda t: t.rename_columns(["url", "coreness"]),
        batch_format="pyarrow")


def coreness_sql(*, max_rounds: int = 8,
                 edges_cte: str = "link_edges") -> str:
    """SQL mirror: exactly ``max_rounds`` unrolled H-operator rounds —
    H-index as max(least(rank, value)) over desc-sorted neighbor
    values; equal to the engine's early-exit iteration by the fixpoint
    argument in :func:`coreness`."""
    sql = f"""
        , und AS MATERIALIZED (
            SELECT DISTINCT least(src_url, dst_url) AS a,
                            greatest(src_url, dst_url) AS b
            FROM {edges_cte} WHERE src_url <> dst_url
        ), dir AS MATERIALIZED (
            SELECT a AS u, b AS v FROM und
            UNION ALL SELECT b, a FROM und
        ), h0 AS MATERIALIZED (
            SELECT u AS node, count(*)::BIGINT AS c FROM dir GROUP BY 1)"""
    prev = "h0"
    for r in range(1, max_rounds + 1):
        sql += f"""
        , h{r} AS MATERIALIZED (
            SELECT node, max(least(rnk, cv))::BIGINT AS c FROM (
              SELECT d.u AS node, s.c AS cv,
                     row_number() OVER (PARTITION BY d.u
                                        ORDER BY s.c DESC) AS rnk
              FROM dir d JOIN {prev} s ON s.node = d.v)
            GROUP BY 1)"""
        prev = f"h{r}"
    return sql + f"""
        SELECT node AS url, c AS coreness FROM {prev}"""


def degree_assortativity(edges, *, num_buckets: int = 32,
                         broadcast_limit: int = 2_000_000):
    """Directed degree assortativity of the crawl graph: the Pearson
    correlation, over EDGES, of (source out-degree, target in-degree) —
    negative values are the web's classic disassortative signature (hubs
    point at low-degree pages); a strongly positive value on a host graph
    is a link-farm / mutual-promotion prior (Newman, PRL 89:208701 recipe
    specialized to the out→in directed variant).

    Composition, all existing kernels: ``link_degree`` (one exchange) →
    two ``bucket_join``s attaching x = out_degree(src), y = in_degree(dst)
    to each edge (each join co-partitions on the url it needs, so a hub's
    degree row meets its edges without broadcast) → the exact-integer
    ``grouped_moments`` fold under a constant key.  Output: one row
    ``(scope='all', n, sum_x, sum_y, sum_xx, sum_yy, sum_xy, corr)`` with
    the bit-identical-double corr contract of ``grouped_moments``."""
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import bucket_join
    from htrc_feature_reader_ray.stages.profile import grouped_moments

    # edges feed three consumers (degree fold + both joins) and typically
    # sit behind an html-parse pipeline: materialize once, like pagerank's
    # loop-invariant edge list, instead of re-running the parse per consumer
    edges = edges.materialize()
    deg = link_degree(edges, num_buckets=num_buckets).materialize()

    if deg.count() <= broadcast_limit:
        # broadcast fast path: (out, in) degree vectors ride to every
        # edge batch as ONE broadcast lookup — the two endpoint joins
        # disappear; the moments fold (and its bit-identical-double
        # corr finish) is unchanged. Paths equal by pinned pytest.
        import pyarrow.compute as pc

        import ray as _ray

        deg_pd = deg.to_pandas()
        keys = np.sort(deg_pd["url"].to_numpy())
        pos = np.searchsorted(keys, deg_pd["url"].to_numpy())
        outv = np.zeros(len(keys), dtype=np.int64)
        inv = np.zeros(len(keys), dtype=np.int64)
        outv[pos] = deg_pd["out_degree"].to_numpy(dtype=np.int64)
        inv[pos] = deg_pd["in_degree"].to_numpy(dtype=np.int64)
        ref = _ray.put((pa.array(keys, type=pa.string()), outv, inv))

        def tag_bcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    "scope": pa.array([], pa.string()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64())})
            ks_, ov, iv = _ray.get(ref)
            s = pc.index_in(_str_array(t, "src_url"),
                            value_set=ks_).to_numpy(
                                zero_copy_only=False)
            d = pc.index_in(_str_array(t, "dst_url"),
                            value_set=ks_).to_numpy(
                                zero_copy_only=False)
            n = len(s)
            return pa.table({
                "scope": pa.array(np.repeat("all", n)),
                "x": pa.array(ov[s]),
                "y": pa.array(iv[d])})

        return grouped_moments(
            edges.map_batches(tag_bcast, batch_format="pyarrow"),
            key="scope", x_col="x", y_col="y", num_buckets=1)

    def src_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"],
                             "x": df["out_degree"].astype("int64")})

    def dst_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"],
                             "y": df["in_degree"].astype("int64")})

    with_x = bucket_join(
        edges, deg.map_batches(src_side, batch_format="pandas"),
        left_key="src_url", right_key="url", num_buckets=num_buckets)
    with_xy = bucket_join(
        with_x, deg.map_batches(dst_side, batch_format="pandas"),
        left_key="dst_url", right_key="url", num_buckets=num_buckets)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "scope": np.repeat("all", len(df)),
            "x": df["x"].astype("int64"),
            "y": df["y"].astype("int64"),
        })

    return grouped_moments(
        with_xy.map_batches(tag, batch_format="pandas"),
        key="scope", x_col="x", y_col="y", num_buckets=1)


def degree_assortativity_sql(*, edges_cte: str = "e2") -> str:
    """SQL mirror fragment (append after an edges CTE): degree re-derivation
    + the grouped_moments HUGEINT/one-rounding corr expression."""
    return f""",
        deg AS (
            SELECT url, sum(o)::BIGINT AS out_degree,
                   sum(i)::BIGINT AS in_degree
            FROM (SELECT src_url AS url, 1 AS o, 0 AS i FROM {edges_cte}
                  UNION ALL SELECT dst_url, 0, 1 FROM {edges_cte})
            GROUP BY url
        ),
        xy AS (
            SELECT 'all' AS scope, ds.out_degree AS x, dd.in_degree AS y
            FROM {edges_cte} e JOIN deg ds ON e.src_url = ds.url
                 JOIN deg dd ON e.dst_url = dd.url
        ),
        mom AS (
            SELECT scope, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
            FROM xy GROUP BY scope
        )
        SELECT scope, n::BIGINT AS n, sx::BIGINT AS sum_x,
               sy::BIGINT AS sum_y, sxx::BIGINT AS sum_xx,
               syy::BIGINT AS sum_yy, sxy::BIGINT AS sum_xy,
               CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
                    THEN (n*sxy - sx*sy)::DOUBLE
                         / sqrt(((n*sxx - sx*sx) * (n*syy - sy*sy))::DOUBLE)
               END AS corr
        FROM mom"""


def personalized_pagerank(edges, *, iterations: int = 3,
                          scale: int = PR_SCALE, damping_pct: int = 85,
                          seed_mod: int = 10, num_buckets: int = 32,
                          broadcast_limit: int = 2_000_000):
    """Personalized (topic-sensitive) PageRank: the teleport mass lands only
    on a SEED set instead of uniformly — the crawl-prioritization variant
    ("how reachable is v from pages we already trust").  Same fixed-point
    INTEGER recurrence as :func:`pagerank` (bit-exact across parallelism,
    unrolled-CTE replayable), with

        r_0(v)     = scale // S          if v ∈ seeds else 0
        r_{t+1}(v) = [v ∈ seeds] · (100−d)·(scale//S)//100
                     + d · Σ contrib // 100

    The seed set is a DETERMINISTIC url predicate (md5_hash64(url) %
    seed_mod == 0 — the engine/SQL-shared hash identity), so the whole op
    stays oracle-checkable; swap the predicate for a real allowlist in
    production (broadcast membership, same shape).
    """
    from htrc_feature_reader_ray.stages.dedup import md5_hash64

    edges = edges.materialize()
    nodes = _distinct_nodes(edges, num_buckets=num_buckets).materialize()

    def seed_mask(urls) -> np.ndarray:
        return (md5_hash64([str(u) for u in urls])
                % np.uint64(seed_mod)) == 0

    def count_seeds(batch: pa.Table) -> pa.Table:
        m = seed_mask(batch.column("url").to_pylist())
        return pa.table({"s": pa.array([int(m.sum())], type=pa.int64())})

    seed_counts = nodes.map_batches(count_seeds, batch_format="pyarrow")
    s_total = int(seed_counts.sum("s") or 0)
    if s_total == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "rank": pa.array([], type=pa.int64()),
        }))

    r0 = scale // s_total
    base_seed = (100 - damping_pct) * r0 // 100

    n = nodes.count()
    if n <= broadcast_limit:
        # broadcast fast path — see pagerank(); identical recurrence with
        # the seed-restricted teleport vector held driver-side
        outdeg_pd = bucketed_aggregate(
            edges, "src_url", {"out_degree": ("dst_url", "size")},
            num_buckets=num_buckets,
        ).to_pandas()
        od_idx = outdeg_pd["src_url"].to_numpy()
        od = outdeg_pd["out_degree"].to_numpy().astype(np.int64)
        urls = nodes.to_pandas()["url"].to_numpy()
        m = seed_mask(urls)
        base_vec = np.where(m, base_seed, 0).astype(np.int64)
        rank = pd.Series(np.where(m, r0, 0).astype(np.int64), index=urls)
        for _ in range(iterations):
            contrib = pd.Series(
                rank.loc[od_idx].to_numpy() // od, index=od_idx)
            summed = _bcast_push_fold(
                edges, contrib, src_col="src_url", dst_col="dst_url",
                num_buckets=num_buckets)
            s = summed.reindex(urls, fill_value=0).to_numpy()
            rank = pd.Series(base_vec + damping_pct * s // 100,
                             index=urls)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "url": pa.array(urls, type=pa.string()),
            "rank": pa.array(rank.to_numpy(), type=pa.int64()),
        }))

    outdeg = bucketed_aggregate(
        edges, "src_url", {"out_degree": ("dst_url", "size")},
        num_buckets=num_buckets,
    )
    edges_od = bucket_join(
        edges, outdeg, left_key="src_url", right_key="src_url",
        how="inner", num_buckets=num_buckets,
    ).materialize()

    def init_rank(batch: pa.Table) -> pa.Table:
        m = seed_mask(batch.column("url").to_pylist())
        return batch.append_column(
            "rank", pa.array(np.where(m, r0, 0).astype(np.int64)))

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url").cast(pa.string()),
            "s": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        joined = bucket_join(
            edges_od, ranks, left_key="src_url", right_key="url",
            how="inner", num_buckets=num_buckets,
        )

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("rank").to_numpy()
            od = batch.column("out_degree").to_numpy()
            return pa.table({
                "url": batch.column("dst_url").cast(pa.string()),
                "s": pa.array(r // od),
            })

        partial = joined.map_batches(contrib, batch_format="pyarrow")
        summed = bucketed_aggregate(
            partial.union(
                nodes.map_batches(zero_rows, batch_format="pyarrow")),
            "url", {"s": ("s", "sum")}, num_buckets=num_buckets,
        )

        def update(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy().astype(np.int64)
            m = seed_mask(batch.column("url").to_pylist())
            rank = np.where(m, base_seed, 0) + damping_pct * s // 100
            return pa.table({
                "url": batch.column("url").cast(pa.string()),
                "rank": pa.array(rank.astype(np.int64)),
            })

        ranks = summed.map_batches(
            update, batch_format="pyarrow").materialize()

    return ranks


def edge_reciprocity(edges, *, num_buckets: int = 32):
    """Graph reciprocity: the share of directed edges whose reverse edge
    also exists (u→v and v→u) — a mutual-linking / link-exchange-scheme
    prior on the crawl graph (self-loops excluded, as in the standard
    definition).

    Join-free single-exchange shape: every edge emits one row keyed on its
    UNDIRECTED pair (min,max) with a direction bit; the bucketed fold ORs
    the bits per pair — a pair with both bits contributes 2 reciprocal
    edges.  Output one row: (n_edges, n_reciprocal, reciprocity_ppm).
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        s = _str_array(batch, "src_url").to_numpy(zero_copy_only=False)
        d = _str_array(batch, "dst_url").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        fwd = (s == lo).astype(np.int64)  # direction bit per edge
        t = pa.table({
            "lo": pa.array(lo), "hi": pa.array(hi),
            "has_fwd": pa.array(fwd), "has_rev": pa.array(1 - fwd),
        })
        g = t.group_by(["lo", "hi"]).aggregate(
            [("has_fwd", "max"), ("has_rev", "max")])
        return g.rename_columns(["lo", "hi", "has_fwd", "has_rev"])

    folded = bucketed_aggregate(
        edges.map_batches(partial, batch_format="pyarrow"),
        ["lo", "hi"],
        {"has_fwd": ("has_fwd", "max"), "has_rev": ("has_rev", "max")},
        num_buckets=num_buckets,
    )

    def count(t: pa.Table) -> pa.Table:
        f = t.column("has_fwd").to_numpy().astype(np.int64)
        r = t.column("has_rev").to_numpy().astype(np.int64)
        both = int(((f == 1) & (r == 1)).sum())
        return pa.table({
            "n_edges": pa.array([int(f.sum() + r.sum())], type=pa.int64()),
            "n_reciprocal": pa.array([2 * both], type=pa.int64()),
        })

    summed = folded.map_batches(count, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ne = int(df["n_edges"].sum())
        nr = int(df["n_reciprocal"].sum())
        return pd.DataFrame({
            "n_edges": [ne], "n_reciprocal": [nr],
            "reciprocity_ppm": [nr * 1_000_000 // max(ne, 1)],
        })

    def const_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_g"] = 0
        return df

    return (
        summed.map_batches(const_key, batch_format="pandas")
        .groupby("_g")
        .map_groups(lambda df: finish(df.drop(columns=["_g"])),
                    batch_format="pandas")
    )


def edge_reciprocity_sql(*, edges_cte: str = "e2") -> str:
    """SQL mirror fragment (append after an edges CTE): undirected-pair
    fold with direction bits, identical ppm floor."""
    return f""",
        ne AS (SELECT src_url, dst_url FROM {edges_cte}
               WHERE src_url <> dst_url),
        p AS (
            SELECT least(src_url, dst_url) AS lo,
                   greatest(src_url, dst_url) AS hi,
                   max(CASE WHEN src_url = least(src_url, dst_url)
                            THEN 1 ELSE 0 END) AS has_fwd,
                   max(CASE WHEN src_url = greatest(src_url, dst_url)
                            THEN 1 ELSE 0 END) AS has_rev
            FROM ne GROUP BY 1, 2
        )
        SELECT sum(has_fwd + has_rev)::BIGINT AS n_edges,
               (2 * sum(CASE WHEN has_fwd = 1 AND has_rev = 1
                             THEN 1 ELSE 0 END))::BIGINT AS n_reciprocal,
               (2 * sum(CASE WHEN has_fwd = 1 AND has_rev = 1
                             THEN 1 ELSE 0 END) * 1000000
                // greatest(sum(has_fwd + has_rev), 1))::BIGINT
                   AS reciprocity_ppm
        FROM p"""


def local_clustering(edges, *, num_buckets: int = 32):
    """PER-NODE clustering coefficient on the undirected link graph:
    ``local_cc(v) = 2·T(v)·10⁶ // (d(v)·(d(v)−1))`` with T(v) = triangles
    through v — the node-level spam-farm / community-density signal (the
    global census is :func:`triangle_stats`; this is its vertex-resolved
    sibling).

    Same degree-ordered wedge discipline (Suri–Vassilvitskii WWW'11):
    wedges are emitted at each edge's LOWEST-degree endpoint (fan-out
    O(√m) amortized), but unlike the global census the wedge APEX is kept
    in the row, so every surviving (closed) wedge credits all THREE
    vertices of its triangle — apex and both endpoints — in one explode +
    fold.  Exchanges: undirected distinct, degree fold, two orientation
    joins, wedge-key pair pass, one semi-join, credit fold, one left join
    onto degrees.  Output: (node, degree, n_triangles, local_cc_ppm).
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src_url"), t.column("dst_url")
        keep = pc.invert(pc.equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.table({"a": lo, "b": hi}).group_by(["a", "b"]).aggregate([])

    und = bucketed_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], {"_n": ("b", "size")}, num_buckets=num_buckets,
    ).drop_columns(["_n"]).materialize()

    def explode_deg(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t.column("a").combine_chunks().cast(pa.string()),
            t.column("b").combine_chunks().cast(pa.string()),
        ])
        return (pa.table({"node": nodes})
                .group_by(["node"]).aggregate([([], "count_all")])
                .rename_columns(["node", "d"]))

    deg = bucketed_aggregate(
        und.map_batches(explode_deg, batch_format="pyarrow"),
        ["node"], {"d": ("d", "sum")}, num_buckets=num_buckets,
    ).materialize()

    oriented = _orient_by_degree(und, deg, num_buckets=num_buckets)

    # wedge TRIPLES (apex kept): self-merge per lo-bucket, canonical a < b
    def wedge_triples(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"lo": pd.Series(dtype=object),
                                 "a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object)})
        m = df.merge(df, on="lo")
        m = m[m["hi_x"] < m["hi_y"]]
        return pd.DataFrame({"lo": m["lo"], "a": m["hi_x"],
                             "b": m["hi_y"]})

    wedges = bucketed_map_groups(oriented, "lo", wedge_triples,
                                 num_buckets=num_buckets)

    def with_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("a").cast(pa.string()),
            t.column("b").cast(pa.string()), "|")
        return t.append_column("_k", k)

    closed = _semi_on_edge_keys(
        wedges.map_batches(with_key, batch_format="pyarrow"),
        und, num_buckets=num_buckets, n_edges=und.count(),
    )

    # join-free finish: triangle credits (d=0) union degree rows (t=0)
    # into ONE fold — full-outer semantics without touching the possibly
    # schemaless empty fold output with a join
    def credit(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t.column(c).combine_chunks().cast(pa.string())
            for c in ("lo", "a", "b")
        ])
        g = (pa.table({"node": nodes})
             .group_by(["node"]).aggregate([([], "count_all")])
             .rename_columns(["node", "t"]))
        return g.append_column(
            "d", pa.array(np.zeros(len(g), dtype=np.int64)))

    def deg_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node").cast(pa.string()),
            "t": pa.array(np.zeros(len(t), dtype=np.int64)),
            "d": pc.cast(t.column("d"), pa.int64()),
        })

    merged = bucketed_aggregate(
        closed.map_batches(credit, batch_format="pyarrow").union(
            deg.map_batches(deg_rows, batch_format="pyarrow")),
        ["node"], {"t": ("t", "sum"), "d": ("d", "sum")},
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].astype("int64").to_numpy()
        t = df["t"].astype("int64").to_numpy()
        den = d * (d - 1)
        cc = np.where(den > 0, 2 * t * 1_000_000 // np.maximum(den, 1), 0)
        return pd.DataFrame({
            "node": df["node"], "degree": d, "n_triangles": t,
            "local_cc_ppm": cc.astype(np.int64),
        })

    return merged.map_batches(finish, batch_format="pandas")


def local_clustering_sql(*, edges_cte: str = "e2") -> str:
    """SQL mirror fragment: lexicographic triangle triples credit all three
    vertices; identical ppm floor."""
    return f""",
        ne AS (SELECT least(src_url, dst_url) AS a,
                      greatest(src_url, dst_url) AS b
               FROM {edges_cte} WHERE src_url <> dst_url
               GROUP BY 1, 2),
        degs AS (
            SELECT node, count(*)::BIGINT AS d FROM (
                SELECT a AS node FROM ne UNION ALL SELECT b FROM ne)
            GROUP BY node
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM ne e1 JOIN ne e2 ON e2.a = e1.b
                 JOIN ne e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        tv AS (
            SELECT node, count(*)::BIGINT AS t FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
            GROUP BY node
        )
        SELECT degs.node, degs.d AS degree,
               coalesce(tv.t, 0)::BIGINT AS n_triangles,
               (CASE WHEN degs.d >= 2
                     THEN 2 * coalesce(tv.t, 0) * 1000000
                          // (degs.d * (degs.d - 1))
                     ELSE 0 END)::BIGINT AS local_cc_ppm
        FROM degs LEFT JOIN tv ON degs.node = tv.node"""


# ---------------------------------------------------------------------------
# 2-hop neighborhood size (friends-of-friends)
# ---------------------------------------------------------------------------

def two_hop_neighbors(edges, *, num_buckets: int = 32):
    """(url, n1, n2) per source node: ``n1`` = distinct direct out-
    neighbors, ``n2`` = distinct nodes reachable in <= 2 directed hops
    (self excluded from both) — the hub/spam "reach" feature a link-graph
    scorer wants next to degree.

    Shape: ONE mid-keyed bucket join materializes the hop-2 pairs
    (e1.dst = e2.src — the irreducible payload of 2-hop expansion), then
    ONE src-bucketed pass that folds (src, nbr) min-hop AND counts in the
    same bucket (the two stages share the src key, so a second exchange
    would re-shuffle already co-located rows). The distinct edge table is
    materialized once — it has three consumers (join left, join right,
    hop-1 pairs) that would each re-execute the upstream scan. Nodes with
    no out-edges don't appear (their reach is 0 by contract). Fan-out
    caveat: hop-2 volume is Σ_mid in(mid)·out(mid); on graphs whose hubs
    have BOTH high in- and out-degree, cap or sample mids first (the
    fixture's hubs are sinks, so the join is linear here)."""
    from htrc_feature_reader_ray.stages.partition import bucket_join

    def dedup(batch: pa.Table) -> pa.Table:
        return batch.select(["src_url", "dst_url"]).group_by(
            ["src_url", "dst_url"]).aggregate([])

    e = edges.map_batches(dedup, batch_format="pyarrow").materialize()

    def as_mid(batch: pa.Table) -> pa.Table:
        return pa.table({
            "mid": _str_array(batch, "src_url"),
            "nbr2": _str_array(batch, "dst_url"),
        })

    hop2 = bucket_join(
        e, e.map_batches(as_mid, batch_format="pyarrow"),
        left_key="dst_url", right_key="mid", num_buckets=num_buckets,
    )

    def pairs2(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "src_url": _str_array(batch, "src_url"),
            "nbr": _str_array(batch, "nbr2"),
            "hop": pa.array(np.full(len(batch), 2, dtype=np.int64)),
        })
        return t.group_by(["src_url", "nbr"]).aggregate(
            [("hop", "min")]).rename_columns(["src_url", "nbr", "hop"])

    def pairs1(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_url": _str_array(batch, "src_url"),
            "nbr": _str_array(batch, "dst_url"),
            "hop": pa.array(np.ones(len(batch), dtype=np.int64)),
        })

    un = e.map_batches(pairs1, batch_format="pyarrow").union(
        hop2.map_batches(pairs2, batch_format="pyarrow"))

    def drop_self(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(batch.column("src_url"), batch.column("nbr"))
        return batch.filter(keep)

    def fold_and_count(df):
        # min-hop distinct fold + count in ONE bucket: stable hop sort +
        # drop_duplicates == per-(src,nbr) min, then the hop==1 indicator
        # sums per src — all vectorized across the bucket's groups
        d = df.sort_values("hop", kind="stable").drop_duplicates(
            ["src_url", "nbr"])
        g = d.assign(is1=(d["hop"] == 1).astype("int64")).groupby(
            "src_url", sort=False, as_index=False)
        out = g.agg(n1=("is1", "sum"), n2=("hop", "size"))
        out = out.rename(columns={"src_url": "url"})
        out["n1"] = out["n1"].astype("int64")
        out["n2"] = out["n2"].astype("int64")
        return out

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    return bucketed_map_groups(
        un.map_batches(drop_self, batch_format="pyarrow"),
        "src_url", fold_and_count, num_buckets=num_buckets)


def two_hop_neighbors_sql(*, edges_cte: str = "link_edges") -> str:
    """SQL fragment (appends to the LINKS_PRE CTE): exact re-derivation."""
    return f""",
        e2h AS (SELECT DISTINCT src_url, dst_url FROM {edges_cte}),
        hop2 AS (
          SELECT a.src_url, b.dst_url AS nbr, 2 AS hop
          FROM e2h a JOIN e2h b ON a.dst_url = b.src_url
        ),
        un2h AS (
          SELECT src_url, nbr, min(hop) AS hop FROM (
            SELECT src_url, dst_url AS nbr, 1 AS hop FROM e2h
            UNION ALL SELECT src_url, nbr, hop FROM hop2
          ) WHERE nbr <> src_url GROUP BY 1, 2
        )
        SELECT src_url AS url,
               count(*) FILTER (WHERE hop = 1)::BIGINT AS n1,
               count(*)::BIGINT AS n2
        FROM un2h GROUP BY 1"""


def link_prediction(edges, *, min_cn: int = 2, max_degree: int = 64,
                    num_buckets: int = 32, counts_path: str = "auto"):
    """Structural link-prediction scores (Liben-Nowell & Kleinberg,
    CIKM'03): for every NON-adjacent url pair at distance 2, the two
    classic neighborhood-overlap features — common-neighbor count and
    neighborhood Jaccard

        cn          = |N(u) ∩ N(v)|
        jaccard_ppm = cn·10⁶ // (deg(u) + deg(v) − cn)

    over the UNDIRECTED distinct edge view (self-loops dropped) — the
    "which links are missing" signal: crawl-frontier prioritization
    (a page strongly wedged into a neighborhood it doesn't link yet is
    where the next discovery lives) and related-page suggestion beside
    :func:`related_pages`' co-citation view.

    PURE composition over oracled machinery: common neighbors ARE
    shared-basket counts with key = the wedge CENTER and member = its
    neighbors, so the pair table is
    :func:`~htrc_feature_reader_ray.stages.assoc.association_rules`
    (whose ``n_a``/``n_b`` item supports are exactly deg(u)/deg(v) here —
    a basket containing u IS a neighbor of u), followed by one tag-union
    anti-join pass against the edge set and a stateless jaccard finish.

    Contract mirrored by the oracle: ``max_degree`` caps the CENTER
    degree for wedge emission only (a stop-hub center wedges everything
    to everything — non-informative and quadratic; the standard cap of
    the pair kernel) while deg(u)/deg(v) count ALL neighbors; pairs need
    ``cn ≥ min_cn``; existing edges are excluded. Output
    ``(u, v, cn, deg_u, deg_v, jaccard_ppm)`` with ``u < v``.

    Scale shape: the pair kernel's one center-bucketed exchange bounded
    by ``max_degree``² per center + tiny pair fold (its documented
    shape); the anti-join rides ONE u-bucketed tag-union pass (edge rows
    carry ``is_edge=1`` into the same bucket — the coreness co-location
    trick); jaccard is a vectorized in-bucket finish.
    """
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.assoc import association_rules
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def und_view(batch: pa.Table) -> pa.Table:
        s = _str_array(batch, "src_url")
        d = _str_array(batch, "dst_url")
        t = pa.concat_tables([
            pa.table({"ctr": s, "nbr": d}),
            pa.table({"ctr": d, "nbr": s}),
        ])
        t = t.filter(pc.not_equal(t.column("ctr"), t.column("nbr")))
        return t.group_by(["ctr", "nbr"]).aggregate([])

    und = edges.map_batches(und_view, batch_format="pyarrow")

    assoc = association_rules(
        und, key_col="ctr", member_col="nbr", min_shared=min_cn,
        max_members_per_key=max_degree, counts_path=counts_path,
        num_buckets=num_buckets)

    def as_cand(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(len(t), dtype=np.int64))
        return pa.table({
            "u": _str_array(t, "item_a"), "v": _str_array(t, "item_b"),
            "cn": t.column("n_joint").cast(pa.int64()),
            "deg_u": t.column("n_a").cast(pa.int64()),
            "deg_v": t.column("n_b").cast(pa.int64()),
            "is_edge": z,
        })

    def as_edge(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.less(t.column("ctr"), t.column("nbr")))
        z = pa.array(np.zeros(len(keep), dtype=np.int64))
        one = pa.array(np.ones(len(keep), dtype=np.int64))
        return pa.table({
            "u": _str_array(keep, "ctr"), "v": _str_array(keep, "nbr"),
            "cn": z, "deg_u": z, "deg_v": z, "is_edge": one,
        })

    tagged = assoc.map_batches(as_cand, batch_format="pyarrow").union(
        und.map_batches(as_edge, batch_format="pyarrow"))

    def anti_and_score(df):
        cand = df.loc[df["is_edge"] == 0]
        e = df.loc[df["is_edge"] == 1, ["u", "v"]].drop_duplicates()
        m = cand.merge(e, on=["u", "v"], how="left", indicator=True)
        keep = m.loc[m["_merge"] == "left_only"].drop(
            columns=["_merge", "is_edge"])
        cn = keep["cn"].astype("int64")
        keep = keep.assign(
            jaccard_ppm=(cn * 1_000_000
                         // (keep["deg_u"].astype("int64")
                             + keep["deg_v"].astype("int64") - cn)
                         ).astype("int64"))
        return keep.reset_index(drop=True)

    return bucketed_map_groups(tagged, "u", anti_and_score,
                               num_buckets=num_buckets)


def link_prediction_sql(*, min_cn: int = 2, max_degree: int = 64,
                        edges_cte: str = "link_edges") -> str:
    """SQL fragment (appends to the LINKS_PRE CTE): exact replay — same
    center-degree cap (wedges only), uncapped endpoint degrees, edge
    anti-join, floor jaccard (nonneg, so // == floor)."""
    return f""",
        lp_e2 AS (SELECT DISTINCT src_url AS a, dst_url AS b
                  FROM {edges_cte} WHERE src_url <> dst_url),
        lp_und AS MATERIALIZED (
          SELECT a, b FROM lp_e2 UNION SELECT b, a FROM lp_e2),
        lp_deg AS (SELECT a, count(*) AS deg FROM lp_und GROUP BY 1),
        lp_ctr AS (SELECT a FROM lp_deg
                   WHERE deg BETWEEN 2 AND {max_degree}),
        lp_w AS (
          SELECT u1.b AS u, u2.b AS v, count(*)::BIGINT AS cn
          FROM lp_und u1
          JOIN lp_und u2 ON u1.a = u2.a AND u1.b < u2.b
          JOIN lp_ctr c ON c.a = u1.a
          GROUP BY 1, 2 HAVING count(*) >= {min_cn}
        )
        SELECT w.u, w.v, w.cn,
               du.deg::BIGINT AS deg_u, dv.deg::BIGINT AS deg_v,
               (w.cn * 1000000
                // (du.deg + dv.deg - w.cn))::BIGINT AS jaccard_ppm
        FROM lp_w w
        JOIN lp_deg du ON du.a = w.u
        JOIN lp_deg dv ON dv.a = w.v
        WHERE NOT EXISTS (SELECT 1 FROM lp_und e
                          WHERE e.a = w.u AND e.b = w.v)"""


def label_communities(edges, *, iterations: int = 3, num_buckets: int = 32,
                      broadcast_limit: int = 2_000_000):
    """Deterministic synchronous label propagation (Raghavan et al. 2007,
    Phys. Rev. E 76:036106) over the UNDIRECTED distinct edge view —
    the near-linear community detector next to the exact structural ops
    (components/k-core/clustering): every node starts as its own label;
    each round it adopts the MOST FREQUENT label among its distinct
    neighbors, ties broken by ascending label.  Classic LPA is
    order-and-tie random; the synchronous update plus the total
    (count desc, label asc) tie order makes this variant bit-exact
    across runs, parallelism levels and the SQL replay.

    Scale shape: the undirected edge table folds once and pins (it is
    re-scanned every round — O(E) object-store residency is inherent to
    iterative graph algorithms, the :func:`pagerank` argument).  While
    the node set fits a worker (``broadcast_limit``) each round is ONE
    node-bucketed exchange: labels ship via ``ray.put``, neighbor-label
    counts pre-fold per batch, the argmax runs in-bucket.  Beyond it,
    each round is a label bucket-join + the same argmax fold — the
    unbounded-graph plan.  Output ``(url, community)``; isolated nodes
    never appear (no neighbors to vote).  Self-loops are dropped (a node
    does not vote for itself, the standard LPA convention).
    """
    import ray.data

    def both_dirs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = _str_array(batch, "src_url")
        d = _str_array(batch, "dst_url")
        t = pa.table({
            "a": pa.concat_arrays([s, d]),
            "b": pa.concat_arrays([d, s]),
        })
        t = t.filter(pc.not_equal(t.column("a"), t.column("b")))
        return t.group_by(["a", "b"]).aggregate([])

    und = bucketed_map_groups(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        "a", lambda df: df.drop_duplicates(["a", "b"]),
        num_buckets=num_buckets,
    ).materialize()

    def vote(df: pd.DataFrame) -> pd.DataFrame:
        # per-(node,label) count -> (count desc, label asc) argmax, all
        # vectorized across the bucket's nodes
        c = df.groupby(["a", "lbl"], sort=False, as_index=False).agg(
            c=("lbl", "size"))
        c = c.sort_values(["a", "c", "lbl"],
                          ascending=[True, False, True], kind="mergesort")
        out = c.drop_duplicates(["a"])[["a", "lbl"]]
        return out.rename(columns={"a": "url", "lbl": "community"})

    n = und.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "community": pa.array([], type=pa.string()),
        }))

    if n <= broadcast_limit:  # und rows bound node count from above
        labels: pd.Series | None = None  # None = round 0, label(v) = v
        for _ in range(iterations):
            ref = ray.put(labels)

            def nbr_votes(batch: pa.Table) -> pa.Table:
                lab = ray.get(ref)
                b = batch.column("b").to_pandas().to_numpy()
                lbl = b if lab is None else lab.loc[b].to_numpy()
                t = pa.table({
                    "a": batch.column("a").cast(pa.string()),
                    "lbl": pa.array(lbl, type=pa.string()),
                })
                return t

            new = bucketed_map_groups(
                und.map_batches(nbr_votes, batch_format="pyarrow"),
                "a", vote, num_buckets=num_buckets,
            ).to_pandas()
            labels = pd.Series(new["community"].to_numpy(),
                               index=new["url"].to_numpy())
        if labels is None:
            return und.map_batches(
                lambda b: pa.table({
                    "url": b.column("a").cast(pa.string()),
                    "community": b.column("a").cast(pa.string()),
                }).group_by(["url", "community"]).aggregate([]),
                batch_format="pyarrow")
        return ray.data.from_arrow(pa.table({
            "url": pa.array(labels.index.to_numpy(), type=pa.string()),
            "community": pa.array(labels.to_numpy(), type=pa.string()),
        }))

    # ---- bucketed scale path: label table exceeds a worker heap --------
    labels_ds = und.map_batches(
        lambda b: pa.table({
            "url": b.column("a").cast(pa.string()),
            "community": b.column("a").cast(pa.string()),
        }).group_by(["url", "community"]).aggregate([]),
        batch_format="pyarrow")
    labels_ds = bucketed_map_groups(
        labels_ds, "url", lambda df: df.drop_duplicates(["url"]),
        num_buckets=num_buckets).materialize()
    for _ in range(iterations):
        joined = bucket_join(
            und, labels_ds, left_key="b", right_key="url",
            how="inner", num_buckets=num_buckets)

        def as_votes(batch: pa.Table) -> pa.Table:
            return pa.table({
                "a": batch.column("a").cast(pa.string()),
                "lbl": batch.column("community").cast(pa.string()),
            })

        labels_ds = bucketed_map_groups(
            joined.map_batches(as_votes, batch_format="pyarrow"),
            "a", vote, num_buckets=num_buckets).materialize()
    return labels_ds


def label_communities_sql(*, iterations: int = 3,
                          edges_cte: str = "e2") -> str:
    """Unrolled-CTE DuckDB replay of :func:`label_communities` (composes
    after a WITH preamble defining ``edges_cte`` with src_url/dst_url)."""
    parts = [f"""
        , lp_und AS (
            SELECT src_url AS a, dst_url AS b FROM {edges_cte}
            WHERE src_url <> dst_url
            UNION
            SELECT dst_url, src_url FROM {edges_cte}
            WHERE src_url <> dst_url
        )"""]
    prev = None
    for i in range(1, iterations + 1):
        lbl = "u.b" if prev is None else "p.lbl"
        join = "" if prev is None else f" JOIN {prev} p ON p.url = u.b"
        parts.append(f"""
        , c{i} AS (
            SELECT u.a AS url, {lbl} AS lbl, count(*) AS c
            FROM lp_und u{join} GROUP BY 1, 2
        ),
        l{i} AS (
            SELECT url, lbl FROM (
                SELECT url, lbl, row_number() OVER (
                    PARTITION BY url ORDER BY c DESC, lbl ASC) AS rn
                FROM c{i}) WHERE rn = 1
        )""")
        prev = f"l{i}"
    if prev is None:
        parts.append("""
        SELECT DISTINCT a AS url, a AS community FROM lp_und""")
    else:
        parts.append(f"""
        SELECT url, lbl AS community FROM {prev}""")
    return "".join(parts)


RA_SCALE = 1_000_000_000  # 1/deg in integer nano units (floor)


def resource_allocation(edges, *, min_shared: int = 2,
                        max_outlinks_per_src: int = 32,
                        num_buckets: int = 32):
    """Resource-allocation link prediction (Zhou, Lü & Zhang, EPJ B 2009)
    over co-citation: ``RA(x,y) = Σ_{w cites both} 1/outdeg(w)`` — the
    degree-aware upgrade of :func:`related_pages`. A selective page
    citing 3 urls certifies its targets are related; a hub citing
    hundreds says almost nothing. ``related_pages`` can only CAP hubs
    out; RA downweights them smoothly, which is why it beats plain
    common-neighbor counting on citation-shaped graphs.

    Exactness contract: each citing source contributes
    ``floor(10⁹ / outdeg)`` (outdeg = its DISTINCT outlinks, measured
    after the cap window ``[2, max_outlinks_per_src]``), so ``ra_score``
    is a plain int64 sum — reproducible across partitionings and
    SQL-replayable with ``//``. Output ``(url_a, url_b, n_shared,
    ra_score)`` with ``url_a < url_b`` and ``n_shared >= min_shared``.

    Scale shape (shared_key_pair_counts posture): per-batch distinct
    (src, dst), ONE src-bucketed exchange — outdeg is exact in-bucket
    because all rows of a source co-partition — vectorized self-merge
    pair emission carrying the per-source weight, then a tiny pair fold.
    The hub cap bounds the quadratic emission like every co-occurrence
    kernel here; it is part of the contract and mirrored by the oracle.
    """
    import pandas as pd

    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_url": _str_array(batch, "src_url"),
            "dst_url": _str_array(batch, "dst_url"),
        }).group_by(["src_url", "dst_url"]).aggregate([])

    def emit_pairs(df):
        d = df.drop_duplicates(["src_url", "dst_url"])
        sizes = d.groupby("src_url", sort=False)["dst_url"].transform("size")
        d = d.loc[(sizes >= 2) & (sizes <= max_outlinks_per_src)]
        if not len(d):
            return pd.DataFrame({
                "url_a": pd.Series([], dtype=object),
                "url_b": pd.Series([], dtype=object),
                "w": pd.Series([], dtype="int64"),
            })
        d = d.assign(w=(RA_SCALE // sizes.loc[d.index]).astype("int64"))
        m = d.merge(d[["src_url", "dst_url"]], on="src_url",
                    suffixes=("_a", "_b"))
        m = m.loc[m["dst_url_a"] < m["dst_url_b"]]
        return m.rename(columns={"dst_url_a": "url_a",
                                 "dst_url_b": "url_b"})[
            ["url_a", "url_b", "w"]]

    pairs = bucketed_map_groups(
        edges.map_batches(distinct_pairs, batch_format="pyarrow"),
        "src_url", emit_pairs, num_buckets=num_buckets,
    )
    folded = bucketed_aggregate(
        pairs, ["url_a", "url_b"],
        {"n_shared": ("w", "size"), "ra_score": ("w", "sum")},
        num_buckets=max(4, num_buckets // 4),
    )

    def threshold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.greater_equal(batch.column("n_shared"), min_shared))

    return folded.map_batches(threshold, batch_format="pyarrow")


def resource_allocation_sql(*, min_shared: int = 2,
                            max_outlinks_per_src: int = 32,
                            edges_cte: str = "link_edges") -> str:
    """DuckDB mirror (composes after a WITH preamble defining
    ``edges_cte``): identical cap window, floor-division weight, pair
    fold."""
    return f"""
        , ra_d AS (SELECT DISTINCT src_url, dst_url FROM {edges_cte}),
        ra_k AS (
          SELECT src_url, {RA_SCALE} // count(*) AS w FROM ra_d
          GROUP BY src_url
          HAVING count(*) BETWEEN 2 AND {max_outlinks_per_src}
        ),
        ra_pairs AS (
          SELECT a.dst_url AS url_a, b.dst_url AS url_b, k.w
          FROM ra_d a JOIN ra_d b USING (src_url)
               JOIN ra_k k USING (src_url)
          WHERE a.dst_url < b.dst_url
        )
        SELECT url_a, url_b, count(*)::BIGINT AS n_shared,
               sum(w)::BIGINT AS ra_score
        FROM ra_pairs GROUP BY 1, 2
        HAVING count(*) >= {min_shared}"""


# ---------------------------------------------------------------------------
# BFS reachability layers from a seed set (frontier planning)


def bfs_layers(edges, *, seed_mod: int = 10, max_hops: int = 4,
               num_buckets: int = 32):
    """Hop-labeled BFS reachability from a seed set over the directed link
    graph: every node reachable within ``max_hops`` gets its SHORTEST hop
    distance — the frontier-planning answer ("what does a depth-H crawl
    from the seeds actually cover, and how fast does coverage grow per
    hop") that :func:`personalized_pagerank` smooths into a score but
    never states as layers; the layer sizes are the crawl-budget curve.

    The seed set is the engine's deterministic url predicate
    (``md5_hash64(url) % seed_mod == 0`` — the personalized_pagerank
    convention, engine/SQL-shared), so the whole op stays
    oracle-checkable; swap in a real seed list in production (broadcast
    membership, same shape). Nodes never reached within ``max_hops`` are
    excluded (documented; hop counts are exact minima because BFS layers
    are synchronous). Seeds must occur as a SRC or DST in the edge table
    — the graph's node universe, matching the SQL mirror's.

    Scale shape: the textbook bounded-round frontier expansion — per hop
    ONE semi-join of the edge table against the materialized frontier
    (src-bucketed, co-partitioning), a distinct fold of the new dsts and
    ONE anti-join against the visited set; ``max_hops`` is a documented
    bound so the exchange count is ≤ 3·H, and every intermediate is a
    slim (url[, hop]) table. Edges materialize once for their H
    consumers (the pagerank discipline)."""
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    edges = edges.materialize()
    nodes = bucketed_aggregate(
        edges.map_batches(
            lambda t: pa.table({"url": pa.concat_arrays(
                [t.column("src_url").combine_chunks(),
                 t.column("dst_url").combine_chunks()])}),
            batch_format="pyarrow"),
        ["url"], {"_n": ("url", "size")},
        num_buckets=num_buckets,
    ).drop_columns(["_n"])

    def pick_seeds(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_hash64([str(u) for u in df["url"].to_numpy()])
        out = df.loc[h % seed_mod == 0, ["url"]].copy()
        out["hop"] = np.int64(0)
        return out

    frontier = nodes.map_batches(pick_seeds,
                                 batch_format="pandas").materialize()
    layers = [frontier]
    visited = frontier.drop_columns(["hop"]).materialize()
    for h in range(1, max_hops + 1):
        hit = bucket_join(edges, frontier.drop_columns(["hop"]),
                          left_key="src_url", right_key="url",
                          num_buckets=num_buckets, how="semi")
        nxt = bucketed_aggregate(
            hit.map_batches(
                lambda t: pa.table(
                    {"url": t.column("dst_url").combine_chunks()}),
                batch_format="pyarrow"),
            ["url"], {"_n": ("url", "size")},
            num_buckets=num_buckets,
        ).drop_columns(["_n"])
        new = bucket_join(nxt, visited, left_key="url", right_key="url",
                          num_buckets=num_buckets, how="anti")
        frontier = new.map_batches(
            lambda df, _h=h: df.assign(hop=np.int64(_h)),
            batch_format="pandas").materialize()
        if frontier.count() == 0:
            break
        layers.append(frontier)
        visited = visited.union(
            frontier.drop_columns(["hop"])).materialize()
    out = layers[0]
    for ly in layers[1:]:
        out = out.union(ly)
    return out


def link_resolution_rate(edges, *, num_buckets: int = 16):
    """Per-src-host outlink RESOLUTION rate — the dead-link crawl-QA
    audit: what share of a site's outgoing edges point at a url the
    crawl actually has (dst ∈ the distinct src universe)? Low
    resolved_ppm flags frontier gaps (pages we link to but never
    fetched — crawl-budget leaks), template rot (links into retired
    paths), or walled-garden boundaries; it's the first thing to read
    before trusting link-graph features (pagerank mass leaks exactly
    through unresolved edges — the dangling mass personalized_pagerank
    redistributes is THIS, localized to the hosts causing it).

    Output: ``(host, n_links, n_resolved, resolved_ppm)`` over the same
    distinct page-level edge multiplicity as
    :func:`host_outlink_mix` (same RE2 host projection).

    Scale shape: distinct src universe via one url-bucketed fold; ONE
    dst-keyed semi co-partition marks resolved edges; both total and
    resolved collapse to (host, n) partials map-side before their
    host fold; final left-merge is host-cardinality-sized."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    host_re = r"://(?P<host>[^/]+)"
    edges = edges.materialize()

    srcs = bucketed_aggregate(
        edges.map_batches(
            lambda t: pa.table(
                {"url": t.column("src_url").combine_chunks()}),
            batch_format="pyarrow"),
        ["url"], {"_n": ("url", "size")},
        num_buckets=num_buckets,
    ).drop_columns(["_n"])

    def host_partial(batch: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(_str_array(batch, "src_url"), host_re),
            "host")
        g = (pa.table({"host": host})
             .group_by("host").aggregate([([], "count_all")]))
        return g.rename_columns(["host", "n"])

    totals = bucketed_aggregate(
        edges.map_batches(host_partial, batch_format="pyarrow"),
        "host", {"n_links": ("n", "sum")}, num_buckets=num_buckets)

    resolved = bucket_join(
        edges, srcs, left_key="dst_url", right_key="url",
        num_buckets=num_buckets, how="semi")
    res_counts = bucketed_aggregate(
        resolved.map_batches(host_partial, batch_format="pyarrow"),
        "host", {"n_resolved": ("n", "sum")}, num_buckets=num_buckets)

    joined = bucket_join(totals, res_counts, left_key="host",
                         right_key="host", num_buckets=num_buckets,
                         how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_links"].to_numpy(dtype=np.int64)
        r = (df["n_resolved"].fillna(0).to_numpy()
             if "n_resolved" in df.columns
             else np.zeros(len(df))).astype(np.int64)
        return pd.DataFrame({
            "host": df["host"],
            "n_links": n,
            "n_resolved": r,
            "resolved_ppm": (r * 1_000_000) // n,
        })

    return joined.map_batches(finish, batch_format="pandas")


def link_resolution_rate_sql(*, edges_cte: str = "link_edges") -> str:
    """SQL mirror (composes after a WITH preamble providing
    ``edges_cte``): IN-subquery membership + the same host fold."""
    return f"""
        , srcs AS (SELECT DISTINCT src_url AS url FROM {edges_cte}),
        marked AS (
          SELECT regexp_extract(src_url, '://([^/]+)', 1) AS host,
                 CASE WHEN dst_url IN (SELECT url FROM srcs)
                      THEN 1 ELSE 0 END AS res
          FROM {edges_cte}
        )
        SELECT host, count(*)::BIGINT AS n_links,
               sum(res)::BIGINT AS n_resolved,
               (sum(res)::HUGEINT * 1000000 // count(*))::BIGINT
                 AS resolved_ppm
        FROM marked GROUP BY 1"""


def _labeled_bfs(edges, *, seed_mod: int, n_seeds: int, max_hops: int,
                 num_buckets: int, broadcast_limit: int = 2_000_000):
    """Shared (url, seed)-labeled frontier walk of harmonic_centrality /
    hop_histogram: bottom-(md5, url) seed pick among distinct SRC urls
    passing the md5 %% seed_mod predicate, then per hop ONE inner
    co-partitioned edges⋈frontier join carrying the seed id, a distinct
    fold, and ONE anti-join against the (url, seed) visited set (first
    visit == shortest hop). Returns ``(seeds_df, [(hop, frontier_ds),
    ...])`` with frontiers materialized."""
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    edges = edges.materialize()
    nodes = bucketed_aggregate(
        edges.map_batches(
            lambda t: pa.table(
                {"url": t.column("src_url").combine_chunks()}),
            batch_format="pyarrow"),
        ["url"], {"_n": ("url", "size")},
        num_buckets=num_buckets,
    ).drop_columns(["_n"])

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"url": pd.Series([], dtype=object),
                              "_h": pd.Series([], dtype="uint64")})
        if not len(df):
            return empty
        urls = df["url"].to_numpy()
        h = md5_hash64([str(u) for u in urls])
        keep = h % seed_mod == 0
        if not keep.any():
            return empty
        sub = pd.DataFrame({"url": urls[keep], "_h": h[keep]})
        return sub.sort_values(["_h", "url"]).head(n_seeds)

    cand = nodes.map_batches(bottomk, batch_format="pandas").to_pandas()
    if len(cand) == 0:
        # Seedless graph: no url passes the seed predicate — return
        # the empty seed set so callers can emit their typed empty.
        return pd.DataFrame({"url": pd.Series([], dtype=object),
                             "sid": pd.Series([], dtype="int64")}), []
    seeds = cand.sort_values(["_h", "url"]).head(n_seeds).reset_index(
        drop=True)
    seeds = pd.DataFrame({
        "url": seeds["url"],
        "sid": np.arange(len(seeds), dtype=np.int64),
    })

    if edges.count() <= broadcast_limit:
        # broadcast fast path (distinct urls ≤ 2·|edges| bounds the
        # driver-side visited state): per hop ONE map pass over the
        # pinned edges carries ALL seeds' frontiers (ray.put dict of
        # Arrow arrays, pc.is_in per seed inside the task) — vs the
        # exchange path's 3 exchanges per hop. Same first-visit ==
        # shortest-hop rule; per-seed early exhaustion, global break
        # when every frontier empties (identical to the exchange loop).
        import pyarrow.compute as pc

        import ray as _ray

        fr_sets = {int(r.sid): {r.url} for r in seeds.itertuples()}
        vis = {sid: set(s) for sid, s in fr_sets.items()}
        dists = []
        for h in range(1, max_hops + 1):
            live = {sid: pa.array(sorted(s), type=pa.string())
                    for sid, s in fr_sets.items() if s}
            if not live:
                break
            ref = _ray.put(live)

            def hop(t: pa.Table) -> pa.Table:
                lv = _ray.get(ref)
                src = _str_array(t, "src_url")
                dst = _str_array(t, "dst_url")
                tabs = []
                for sid, fr in lv.items():
                    hit = pc.is_in(src, value_set=fr)
                    d = pc.unique(dst.filter(hit))
                    tabs.append(pa.table({
                        "url": d,
                        "sid": pa.array(np.full(len(d), sid,
                                                dtype=np.int64))}))
                if not tabs:
                    return pa.table({
                        "url": pa.array([], pa.string()),
                        "sid": pa.array([], pa.int64())})
                return pa.concat_tables(tabs)

            cand2 = edges.map_batches(
                hop, batch_format="pyarrow").to_pandas()
            fr_sets = {sid: set() for sid in fr_sets}
            if len(cand2) and "url" in cand2.columns:
                for sid, g in cand2.groupby("sid"):
                    fr_sets[int(sid)] = set(g["url"]) - vis[int(sid)]
            rows = [(u, sid) for sid, s in sorted(fr_sets.items())
                    for u in sorted(s)]
            if not rows:
                break
            for sid, s in fr_sets.items():
                vis[sid] |= s
            dists.append((h, ray.data.from_pandas(pd.DataFrame(
                {"url": [u for u, _ in rows],
                 "sid": np.array([s for _, s in rows],
                                 dtype=np.int64)}))))
        return seeds, dists

    def vkeyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["vkey"] = df["url"].astype(str) + "\x1f" + df["sid"].astype(str)
        return df

    frontier = ray.data.from_pandas(vkeyed(seeds)).materialize()
    visited = frontier.select_columns(["vkey"]).materialize()
    dists = []
    for h in range(1, max_hops + 1):
        hit = bucket_join(edges, frontier.select_columns(["url", "sid"]),
                          left_key="src_url", right_key="url",
                          num_buckets=num_buckets, how="inner")
        nxt = bucketed_aggregate(
            hit.map_batches(
                lambda t: pa.table({
                    "url": t.column("dst_url").combine_chunks(),
                    "sid": t.column("sid").combine_chunks()}),
                batch_format="pyarrow"),
            ["url", "sid"], {"_n": ("url", "size")},
            num_buckets=num_buckets,
        ).drop_columns(["_n"])
        nxt = nxt.map_batches(vkeyed, batch_format="pandas")
        new = bucket_join(nxt, visited, left_key="vkey", right_key="vkey",
                          num_buckets=num_buckets, how="anti")
        frontier = new.materialize()
        if frontier.count() == 0:
            break
        dists.append((h, frontier))
        visited = visited.union(
            frontier.select_columns(["vkey"])).materialize()
    return seeds, dists


def harmonic_centrality(edges, *, seed_mod: int = 10, n_seeds: int = 4,
                        max_hops: int = 4, num_buckets: int = 32,
                        broadcast_limit: int = 2_000_000):
    """Sampled harmonic centrality over the directed link graph
    (Boldi–Vigna's recommended centrality, estimated the Eppstein–Wang
    way: exact BFS from a small deterministic seed sample instead of
    all-pairs): for every node v reachable from the sample,

        ``harmonic_ppm(v) = Σ_{s ∈ seeds, d(s→v) ≥ 1} 10⁶ // d(s→v)``

    with d the exact forward hop distance (≤ ``max_hops``) — the
    "how centrally reachable is this page from representative entry
    points" score that, unlike pagerank, has an absolute scale (each
    seed contributes at most 10⁶) and handles disconnectedness natively
    (unreachable ⇒ contributes 0 — the reason Boldi–Vigna prefer
    harmonic over closeness). Integer-exact: 10⁶//d is the documented
    per-hop weight (no float reciprocals), so the mirror replays it.

    Seeds: the ``n_seeds`` bottom nodes by (md5 hash, url) among
    DISTINCT SRC urls passing the engine's md5 % seed_mod predicate —
    deterministic, oracle-checkable, and a bottom-k (the KMV
    discipline) so seed selection never materializes the candidate
    set; restricting to nodes WITH out-edges makes seeds actual entry
    points (a dst-only node's BFS is empty by construction). Nodes
    whose only distance is hop 0 (an isolated seed) are excluded — the
    sum above is empty. Output: ``(url, seeds_reached, harmonic_ppm)``.

    Scale shape: the bfs_layers frontier loop lifted to (url, seed)
    labeled state — per hop ONE inner co-partitioned join edges⋈frontier
    carrying the seed id, a distinct fold, ONE anti-join against the
    (url, seed) visited set (first visit == shortest hop, so no min
    pass), then a single url-keyed fold of 10⁶//hop terms. ≤ 3·H
    exchanges on slim (url, sid) tables; state is n_seeds× BFS."""
    import ray.data

    seeds, dists = _labeled_bfs(edges, seed_mod=seed_mod,
                                n_seeds=n_seeds, max_hops=max_hops,
                                num_buckets=num_buckets,
                                broadcast_limit=broadcast_limit)

    if not dists:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "seeds_reached": pa.array([], type=pa.int64()),
            "harmonic_ppm": pa.array([], type=pa.int64())}))

    terms = None
    for h, fr in dists:
        t = fr.map_batches(
            lambda df, _h=h: pd.DataFrame({
                "url": df["url"],
                "n": np.int64(1),
                "w": np.int64(1_000_000 // _h)}),
            batch_format="pandas")
        terms = t if terms is None else terms.union(t)
    return bucketed_aggregate(
        terms, ["url"],
        {"seeds_reached": ("n", "sum"), "harmonic_ppm": ("w", "sum")},
        num_buckets=num_buckets)


def harmonic_centrality_sql(*, links_pre: str, seed_mod: int = 10,
                            n_seeds: int = 4, max_hops: int = 4) -> str:
    """SQL mirror: bottom-k (md5, url) seed pick, per-hop labeled CTEs,
    min-hop fold (== the engine's first-visit rule), Σ 10⁶//d."""
    steps = []
    for h in range(1, max_hops + 1):
        steps.append(f"""
        l{h} AS (
          SELECT DISTINCT e.dst_url AS url, f.sid, {h} AS hop
          FROM link_edges e JOIN l{h - 1} f ON e.src_url = f.url
        )""")
    unions = " UNION ALL ".join(
        f"SELECT * FROM l{h}" for h in range(0, max_hops + 1))
    return f"""
        {links_pre},
        nodes AS (
          SELECT DISTINCT src_url AS url FROM link_edges
        ),
        seeds AS (
          SELECT url, row_number() OVER (
              ORDER BY md5_number_upper(url), url) - 1 AS sid
          FROM nodes WHERE md5_number_upper(url) % {seed_mod} = 0
          ORDER BY md5_number_upper(url), url LIMIT {n_seeds}
        ),
        l0 AS (SELECT url, sid, 0 AS hop FROM seeds),{",".join(steps)},
        md AS (
          SELECT url, sid, min(hop) AS d FROM ({unions}) GROUP BY 1, 2
        )
        SELECT url, count(*)::BIGINT AS seeds_reached,
               sum(1000000 // d)::BIGINT AS harmonic_ppm
        FROM md WHERE d >= 1 GROUP BY 1"""


def bfs_layers_sql(*, links_pre: str, seed_mod: int = 10,
                   max_hops: int = 4) -> str:
    """SQL mirror: node universe from both edge ends, md5 seed predicate,
    one chained CTE per hop with NOT-IN visited semantics folded into a
    min-hop group at the end."""
    steps = []
    for h in range(1, max_hops + 1):
        prev = f"l{h - 1}"
        steps.append(f"""
        l{h} AS (
          SELECT DISTINCT e.dst_url AS url, {h} AS hop
          FROM link_edges e JOIN {prev} f ON e.src_url = f.url
        )""")
    unions = " UNION ALL ".join(
        f"SELECT * FROM l{h}" for h in range(0, max_hops + 1))
    return f"""
        {links_pre},
        nodes AS (
          SELECT DISTINCT url FROM (
            SELECT src_url AS url FROM link_edges
            UNION SELECT dst_url FROM link_edges)
        ),
        l0 AS (
          SELECT url, 0 AS hop FROM nodes
          WHERE md5_number_upper(url) % {seed_mod} = 0
        ),{",".join(steps)}
        SELECT url, min(hop)::BIGINT AS hop
        FROM ({unions}) GROUP BY 1 ORDER BY 1"""


def k_truss(edges, *, k: int = 3, max_rounds: int = 6,
            num_buckets: int = 32):
    """k-truss of the UNDIRECTED graph by iterative support peeling: each
    round computes per-edge triangle support (number of triangles the
    edge closes) and drops every edge with support < k−2; the k-truss is
    the fixpoint — the EDGE-level cohesion refinement of :func:`k_core`
    (a k-core keeps a node for having k neighbors anywhere; a k-truss
    keeps an edge only if its endpoints share k−2 common neighbors, so
    spam link wheels and star hubs fall out while genuinely clustered
    communities survive — Cohen, "Trusses: cohesive subgraphs for social
    network analysis", 2008).

    Defined as AT MOST ``max_rounds`` peel rounds with early exit at the
    fixpoint (same construction as :func:`k_core`: converged early means
    the mirror's remaining unrolled rounds are no-ops). Requires
    ``k >= 3`` — at k=2 the threshold is 0 and the truss is the whole
    graph, which needs no machinery.

    Scale shape per round: one degree fold; degree-rank orientation
    (Suri–Vassilvitskii) so wedge emission is bounded by oriented
    out-degree, with the CENTER kept — each surviving wedge is a whole
    triangle (c, x, y), exploded to its three canonical edges and folded
    into per-edge support with ONE bucketed exchange; the support filter
    is the next round's edge set (materialized — it IS the iteration
    state). Returns ``(url_a, url_b, support)`` — the surviving edges
    with their in-truss triangle support."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    if k < 3:
        raise ValueError("k_truss requires k >= 3")
    thresh = k - 2

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column("src_url"), t.column("dst_url")
        keep = pc.invert(pc.equal(s, d))
        s, d = s.filter(keep), d.filter(keep)
        return pa.table({
            "a": pc.min_element_wise(s, d).cast(pa.string()),
            "b": pc.max_element_wise(s, d).cast(pa.string()),
        }).group_by(["a", "b"]).aggregate([])

    def explode_deg(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            t.column("a").combine_chunks().cast(pa.string()),
            t.column("b").combine_chunks().cast(pa.string()),
        ])
        return (pa.table({"node": nodes})
                .group_by(["node"]).aggregate([([], "count_all")])
                .rename_columns(["node", "d"]))

    def emit_wedges(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"c": pd.Series([], dtype=object),
                                 "x": pd.Series([], dtype=object),
                                 "y": pd.Series([], dtype=object)})
        m = df.merge(df, on="lo", suffixes=("_a", "_b"))
        m = m.loc[m["hi_a"] < m["hi_b"]]
        return pd.DataFrame({"c": m["lo"].to_numpy(),
                             "x": m["hi_a"].to_numpy(),
                             "y": m["hi_b"].to_numpy()})

    def tri_to_edges(t: pa.Table) -> pa.Table:
        c = t.column("c").cast(pa.string())
        x = t.column("x").cast(pa.string())
        y = t.column("y").cast(pa.string())
        ea = pa.concat_arrays([
            pc.min_element_wise(c, x).combine_chunks(),
            pc.min_element_wise(c, y).combine_chunks(),
            x.combine_chunks(),   # wedge pair is already a < b
        ])
        eb = pa.concat_arrays([
            pc.max_element_wise(c, x).combine_chunks(),
            pc.max_element_wise(c, y).combine_chunks(),
            y.combine_chunks(),
        ])
        return (pa.table({"ea": ea, "eb": eb})
                .group_by(["ea", "eb"]).aggregate([([], "count_all")])
                .rename_columns(["ea", "eb", "s"]))

    def empty_truss():
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            "url_a": pd.Series([], dtype=object),
            "url_b": pd.Series([], dtype=object),
            "support": pd.Series([], dtype="int64"),
        }))

    def finish(sup_ds):
        if sup_ds is None or sup_ds.count() == 0:
            return empty_truss()
        out = sup_ds.filter(expr=f"s >= {thresh}")
        return out.map_batches(
            lambda t: pa.table({
                "url_a": t.column("ea").cast(pa.string()),
                "url_b": t.column("eb").cast(pa.string()),
                "support": t.column("s").cast(pa.int64()),
            }), batch_format="pyarrow")

    def with_key(t: pa.Table) -> pa.Table:
        kk = pc.binary_join_element_wise(
            t.column("x").cast(pa.string()),
            t.column("y").cast(pa.string()), "|")
        return t.append_column("_k", kk)

    cur = bucketed_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], {"_n": ("b", "size")}, num_buckets=num_buckets,
    ).drop_columns(["_n"]).materialize()

    sup = None
    for _ in range(max_rounds):
        n_cur = cur.count()
        if n_cur == 0:
            return empty_truss()  # peeled dry: later rounds are no-ops
        deg = bucketed_aggregate(
            cur.map_batches(explode_deg, batch_format="pyarrow"),
            ["node"], {"d": ("d", "sum")}, num_buckets=num_buckets,
        ).materialize()
        oriented = _orient_by_degree(cur, deg, num_buckets=num_buckets)
        wedges = bucketed_map_groups(oriented, "lo", emit_wedges,
                                     num_buckets=num_buckets)
        triangles = _semi_on_edge_keys(
            wedges.map_batches(with_key, batch_format="pyarrow"),
            cur, num_buckets=num_buckets, n_edges=n_cur,
        )
        sup = bucketed_aggregate(
            triangles.map_batches(tri_to_edges, batch_format="pyarrow"),
            ["ea", "eb"], {"s": ("s", "sum")}, num_buckets=num_buckets,
        ).materialize()
        nxt = (sup.filter(expr=f"s >= {thresh}")
                  .map_batches(lambda t: pa.table({
                      "a": t.column("ea"), "b": t.column("eb")}),
                      batch_format="pyarrow")
                  .materialize())
        if nxt.count() == n_cur:
            return finish(sup)  # fixpoint: further rounds are no-ops
        cur = nxt

    return finish(sup)


def k_truss_sql(*, k: int = 3, max_rounds: int = 6,
                edges_cte: str = "link_edges") -> str:
    """SQL mirror (composes after a WITH preamble): exactly ``max_rounds``
    unrolled peel rounds — triangles enumerated once as x<y<z (the
    orientation-independent set the engine's degree-charged wedges also
    enumerate), exploded to their three edges and folded to support."""
    thresh = k - 2
    sql = f"""
        , und AS MATERIALIZED (
            SELECT DISTINCT least(src_url, dst_url) AS a,
                            greatest(src_url, dst_url) AS b
            FROM {edges_cte} WHERE src_url <> dst_url
        ), te0 AS MATERIALIZED (SELECT a, b FROM und)"""
    prev = "te0"
    for r in range(1, max_rounds + 1):
        sql += f"""
        , tt{r} AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM {prev} e1
            JOIN {prev} e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN {prev} e3 ON e3.a = e1.b AND e3.b = e2.b
        ), ts{r} AS MATERIALIZED (
            SELECT a, b, count(*)::BIGINT AS sup FROM (
                SELECT x AS a, y AS b FROM tt{r}
                UNION ALL SELECT x, z FROM tt{r}
                UNION ALL SELECT y, z FROM tt{r}) GROUP BY 1, 2
        ), te{r} AS MATERIALIZED (
            SELECT a, b FROM ts{r} WHERE sup >= {thresh})"""
        prev = f"te{r}"
    return sql + f"""
        SELECT a AS url_a, b AS url_b, sup AS support
        FROM ts{max_rounds} WHERE sup >= {thresh}"""


def _reach_set(edges, seeds, *, src_col: str, dst_col: str,
               max_hops: int, num_buckets: int):
    """Closure helper for :func:`bowtie_structure`: the set of urls
    reachable from ``seeds`` by following ``src_col → dst_col`` edges in
    at most ``max_hops`` steps, as a 1-column ``url`` Dataset.

    Per hop: ONE src-keyed semi co-partition (edges × frontier), one
    distinct fold of the new dsts, ONE anti-join against the visited set
    — the bfs_layers discipline without the hop labels. Early exit when
    a frontier empties (the closure is then complete, making the bounded
    mirror's remaining unrolled hops no-ops — the k_core argument)."""
    frontier = seeds.materialize()
    visited = frontier
    for _ in range(max_hops):
        hit = bucket_join(edges, frontier, left_key=src_col,
                          right_key="url", num_buckets=num_buckets,
                          how="semi")
        nxt = bucketed_aggregate(
            hit.map_batches(
                lambda t, _d=dst_col: pa.table(
                    {"url": _str_array(t, _d)}),
                batch_format="pyarrow"),
            ["url"], {"_n": ("url", "size")}, num_buckets=num_buckets,
        ).drop_columns(["_n"])
        frontier = bucket_join(nxt, visited, left_key="url",
                               right_key="url", num_buckets=num_buckets,
                               how="anti").materialize()
        if frontier.count() == 0:
            break
        visited = visited.union(frontier).materialize()
    return visited


def _reach_set_broadcast(edges, seed: str, pairs, *, max_hops: int) -> set:
    """Driver-frontier closure for :func:`bowtie_structure`'s broadcast
    fast path: the frontier/visited sets live on the driver (valid by
    the caller's node-count gate), each hop is ONE map pass over the
    pinned edge blocks with the frontier ``ray.put`` as an Arrow array
    (C++ hash-probe via ``pc.is_in``) — ZERO exchanges per hop, vs the
    3-exchange hop of :func:`_reach_set`. ``pairs`` lists the
    (src_col, dst_col) directions followed per hop, so the weak closure
    runs over the raw edge table both ways without materializing the
    symmetrized copy."""
    import pyarrow.compute as pc

    import ray

    frontier = {seed}
    visited = {seed}
    for _ in range(max_hops):
        fref = ray.put(pa.array(sorted(frontier), type=pa.string()))

        def hop(t: pa.Table, _f=fref) -> pa.Table:
            fr = ray.get(_f)
            outs = []
            for s, d in pairs:
                hit = pc.is_in(t.column(s), value_set=fr)
                outs.append(t.column(d).filter(hit).combine_chunks())
            u = pc.unique(pa.concat_arrays(
                [o.cast(pa.string()) for o in outs]))
            return pa.table({"url": u})

        cand = edges.map_batches(hop, batch_format="pyarrow").to_pandas()
        new = (set(cand["url"]) - visited
               if "url" in cand.columns else set())
        if not new:
            break
        visited |= new
        frontier = new
    return visited


def bowtie_structure(edges, *, max_hops: int = 4, num_buckets: int = 32,
                     broadcast_limit: int = 2_000_000):
    """Broder et al.'s bowtie decomposition of the directed crawl graph
    ("Graph structure in the Web", WWW 2000) relative to a deterministic
    pivot — THE macro-structure read of a web corpus, and the first
    thing to check before trusting link-derived features corpus-wide:
    pagerank mass, BFS crawl coverage and link-prediction candidates all
    behave completely differently in IN (reaches the core but is never
    reached: mass sources, unreachable by a core-seeded crawl), OUT
    (reached but never returns: mass sinks), the CORE SCC (where random
    walks actually mix) and the disconnected fringe. A crawl whose OUT
    dwarfs its IN is frontier-starved; a tiny CORE means the graph is
    effectively a DAG and iterative scores converge degenerately.

    Pivot contract (what makes the op oracle-checkable without a full
    SCC peel): the pivot is the lexicographically smallest url in the
    node universe, and every node is classified relative to it —

    * ``CORE``          — forward-reachable from the pivot AND reaches
      the pivot (= the pivot's strongly connected component),
    * ``IN``            — reaches the pivot but is not CORE,
    * ``OUT``           — forward-reachable but is not CORE,
    * ``TENDRIL``       — in the pivot's WEAK component but none of the
      above (the paper's tendrils + tubes, unsplit — splitting needs
      two more closures for a distinction curation never acts on),
    * ``DISCONNECTED``  — a different weak component entirely.

    Reachability is the ``max_hops``-bounded closure (documented bound,
    the harmonic_centrality convention; early exit makes it exact when
    the true eccentricity is smaller, which the fixture graphs — and the
    tests — pin). Production swaps the pivot for the known core seed
    (same shape); at 10^12 nodes each closure is the standard frontier
    BFS whose exchanges stay slim (url-only tables).

    Scale shape, two paths on the node-count gate (the engine-wide
    broadcast↔exchange auto-switch): at or under ``broadcast_limit``
    nodes, the closures run driver-frontier over the pinned edge blocks
    (:func:`_reach_set_broadcast` — zero exchanges per hop, the weak
    closure following both directions of the raw table so the
    symmetrized copy is never materialized) and classification is one
    stateless ``pc.is_in`` pass over the node universe. Above it: node
    universe fold (one exchange); THREE bounded closures via
    :func:`_reach_set` — forward (src→dst), backward (dst→src), weak
    (over the symmetrized edge table, materialized once);
    classification is a tag-union — nodes ride flag 0 rows, each
    closure rides a flag-1 column — folded per url in ONE bucketed
    pass, then a stateless vectorized CASE map. Paths are equal by the
    pinned pytest. Output ``(url, region)``."""
    import pyarrow.compute as pc

    edges = edges.materialize()

    nodes = bucketed_aggregate(
        edges.map_batches(
            lambda t: pa.table({"url": pa.concat_arrays(
                [_str_array(t, "src_url"), _str_array(t, "dst_url")])}),
            batch_format="pyarrow"),
        ["url"], {"_n": ("url", "size")}, num_buckets=num_buckets,
    ).drop_columns(["_n"]).materialize()

    # deterministic pivot: global string-min over the node universe
    # (per-batch min partials -> a driver min over <= num_blocks scalars)
    def batch_min(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"url": pa.array([], pa.string())})
        return pa.table({"url": [pc.min(t.column("url")).as_py()]})

    # BOUNDED take_all: batch_min collapses every batch to <=1 row, so
    # this collects at most one url per block (O(num_blocks), not
    # O(nodes)) — do not copy this pattern onto an uncollapsed dataset
    mins = nodes.map_batches(batch_min, batch_format="pyarrow").take_all()
    pivot = min(r["url"] for r in mins)
    import ray
    import ray.data

    if nodes.count() <= broadcast_limit:
        # broadcast fast path: the three closures run driver-frontier
        # over the pinned edge blocks (zero exchanges per hop), and the
        # classification is one stateless pass over the node universe
        # with the three membership sets ray.put as sorted Arrow arrays
        fset = _reach_set_broadcast(
            edges, pivot, [("src_url", "dst_url")], max_hops=max_hops)
        bset = _reach_set_broadcast(
            edges, pivot, [("dst_url", "src_url")], max_hops=max_hops)
        wset = _reach_set_broadcast(
            edges, pivot, [("src_url", "dst_url"),
                           ("dst_url", "src_url")], max_hops=max_hops)
        ref = ray.put(tuple(pa.array(sorted(s), type=pa.string())
                            for s in (fset, bset, wset)))

        def classify_bcast(t: pa.Table) -> pa.Table:
            fa, ba, wa = ray.get(ref)
            url = _str_array(t, "url")
            f = pc.is_in(url, value_set=fa).to_numpy(zero_copy_only=False)
            b = pc.is_in(url, value_set=ba).to_numpy(zero_copy_only=False)
            w = pc.is_in(url, value_set=wa).to_numpy(zero_copy_only=False)
            region = np.where(
                f & b, "CORE",
                np.where(b, "IN",
                         np.where(f, "OUT",
                                  np.where(w, "TENDRIL",
                                           "DISCONNECTED"))))
            return pa.table({"url": url,
                             "region": pa.array(region, pa.string())})

        return nodes.map_batches(classify_bcast, batch_format="pyarrow")

    seed = ray.data.from_arrow(
        pa.table({"url": pa.array([pivot], pa.string())}))

    sym = edges.map_batches(
        lambda t: pa.table({
            "u": pa.concat_arrays(
                [_str_array(t, "src_url"), _str_array(t, "dst_url")]),
            "w": pa.concat_arrays(
                [_str_array(t, "dst_url"), _str_array(t, "src_url")]),
        }), batch_format="pyarrow").materialize()

    fwd = _reach_set(edges, seed, src_col="src_url", dst_col="dst_url",
                     max_hops=max_hops, num_buckets=num_buckets)
    bwd = _reach_set(edges, seed, src_col="dst_url", dst_col="src_url",
                     max_hops=max_hops, num_buckets=num_buckets)
    weak = _reach_set(sym, seed, src_col="u", dst_col="w",
                      max_hops=max_hops, num_buckets=num_buckets)

    def tag(flag: str):
        def _t(t: pa.Table) -> pa.Table:
            n = len(t)
            z = np.zeros(n, dtype=np.int64)
            cols = {"url": _str_array(t, "url"),
                    "f": pa.array(z), "b": pa.array(z), "w": pa.array(z)}
            if flag:
                cols[flag] = pa.array(np.ones(n, dtype=np.int64))
            return pa.table(cols)
        return _t

    tagged = (nodes.map_batches(tag(""), batch_format="pyarrow")
              .union(fwd.map_batches(tag("f"), batch_format="pyarrow"))
              .union(bwd.map_batches(tag("b"), batch_format="pyarrow"))
              .union(weak.map_batches(tag("w"), batch_format="pyarrow")))
    flags = bucketed_aggregate(
        tagged, ["url"],
        {"f": ("f", "max"), "b": ("b", "max"), "w": ("w", "max")},
        num_buckets=num_buckets)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        f = df["f"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        w = df["w"].to_numpy(dtype=np.int64)
        region = np.where(
            (f == 1) & (b == 1), "CORE",
            np.where(b == 1, "IN",
                     np.where(f == 1, "OUT",
                              np.where(w == 1, "TENDRIL",
                                       "DISCONNECTED"))))
        return pd.DataFrame({"url": df["url"], "region": region})

    return flags.map_batches(classify, batch_format="pandas")


def bowtie_structure_sql(*, links_pre: str, max_hops: int = 4) -> str:
    """SQL mirror: node universe from both edge ends, min(url) pivot,
    three ``max_hops``-unrolled reach chains (forward, backward, and
    over the symmetrized edges), IN-membership CASE classification."""
    fwd_steps, bwd_steps, wk_steps = [], [], []
    for h in range(1, max_hops + 1):
        fwd_steps.append(f"""
        fw{h} AS (
          SELECT DISTINCT e.dst_url AS url
          FROM link_edges e JOIN fw{h - 1} p ON e.src_url = p.url
        )""")
        bwd_steps.append(f"""
        bw{h} AS (
          SELECT DISTINCT e.src_url AS url
          FROM link_edges e JOIN bw{h - 1} p ON e.dst_url = p.url
        )""")
        wk_steps.append(f"""
        wk{h} AS (
          SELECT DISTINCT e.w AS url
          FROM sym e JOIN wk{h - 1} p ON e.u = p.url
        )""")
    fu = " UNION ".join(f"SELECT url FROM fw{h}"
                        for h in range(max_hops + 1))
    bu = " UNION ".join(f"SELECT url FROM bw{h}"
                        for h in range(max_hops + 1))
    wu = " UNION ".join(f"SELECT url FROM wk{h}"
                        for h in range(max_hops + 1))
    return f"""
        {links_pre},
        nodes AS MATERIALIZED (
          SELECT DISTINCT url FROM (
            SELECT src_url AS url FROM link_edges
            UNION SELECT dst_url FROM link_edges)
        ),
        sym AS MATERIALIZED (
          SELECT src_url AS u, dst_url AS w FROM link_edges
          UNION SELECT dst_url, src_url FROM link_edges
        ),
        fw0 AS (SELECT min(url) AS url FROM nodes),
        bw0 AS (SELECT url FROM fw0),
        wk0 AS (SELECT url FROM fw0),{",".join(fwd_steps)},{",".join(bwd_steps)},{",".join(wk_steps)},
        fwd AS MATERIALIZED ({fu}),
        bwd AS MATERIALIZED ({bu}),
        wk  AS MATERIALIZED ({wu})
        SELECT n.url,
               CASE
                 WHEN n.url IN (SELECT url FROM fwd)
                  AND n.url IN (SELECT url FROM bwd) THEN 'CORE'
                 WHEN n.url IN (SELECT url FROM bwd) THEN 'IN'
                 WHEN n.url IN (SELECT url FROM fwd) THEN 'OUT'
                 WHEN n.url IN (SELECT url FROM wk)  THEN 'TENDRIL'
                 ELSE 'DISCONNECTED'
               END AS region
        FROM nodes n ORDER BY 1"""


# ---------------------------------------------------------------------------
# neighbourhood-function hop histogram / effective diameter
# ---------------------------------------------------------------------------


def hop_histogram(edges, *, seed_mod: int = 10, n_seeds: int = 4,
                  max_hops: int = 4, num_buckets: int = 32,
                  broadcast_limit: int = 2_000_000):
    """Sampled neighbourhood function N(h) and its normalized CDF — the
    HyperANF readout (Palmer et al.'s ANF, Boldi–Vigna–Rosa's HyperANF:
    the number behind every "the web is ~19 clicks across" claim):
    per hop h, how many (seed, node) pairs are within distance ≤ h of
    the deterministic seed sample; the smallest h whose ``cum_ppm ≥
    900 000`` is the EFFECTIVE DIAMETER d90, the graph-wide reach scalar
    read next to :func:`bowtie_structure`'s region split. Exact labeled
    BFS from the harmonic_centrality seed sample instead of sketched
    counters — the Eppstein–Wang discipline again; the hop bound is
    part of the contract (cum_ppm normalizes by the ≤ max_hops total,
    exact when the true eccentricity is below the bound — the
    harmonic/bowtie convention).

    Output one row per realized hop 0..H: ``(hop, n_pairs, cum_pairs,
    cum_ppm)`` — hop 0 counts the seeds themselves, n_pairs counts
    FIRST visits at exactly hop h (distinct (seed, node) pairs), and
    ``cum_ppm = cum_pairs·10⁶ // total``.

    Scale shape: the shared :func:`_labeled_bfs` frontier walk (≤ 3·H
    slim exchanges); the histogram itself is H+1 driver scalars —
    frontier COUNTS, never contents.
    """
    seeds, dists = _labeled_bfs(edges, seed_mod=seed_mod,
                                n_seeds=n_seeds, max_hops=max_hops,
                                num_buckets=num_buckets,
                                broadcast_limit=broadcast_limit)
    if not len(seeds):
        # Seedless graph: the SQL mirror's recursive CTE yields zero
        # rows, so return the typed empty frame rather than a
        # degenerate (0, 0, 0, 0) row (harmonic_centrality's guard).
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("hop", "n_pairs", "cum_pairs",
                                       "cum_ppm")})
    counts = [(0, len(seeds))]
    for h, fr in dists:
        counts.append((h, fr.count()))
    total = sum(c for _, c in counts)
    cum = 0
    rows = []
    for h, c in counts:
        cum += c
        rows.append((h, c, cum,
                     cum * 1_000_000 // total if total else 0))
    out = pd.DataFrame(rows, columns=["hop", "n_pairs", "cum_pairs",
                                      "cum_ppm"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def hop_histogram_sql(*, links_pre: str, seed_mod: int = 10,
                      n_seeds: int = 4, max_hops: int = 4) -> str:
    """SQL mirror: the harmonic_centrality labeled-CTE chain, min-hop
    fold INCLUDING d = 0, hop-level counts + window cumulatives."""
    steps = []
    for h in range(1, max_hops + 1):
        steps.append(f"""
        l{h} AS (
          SELECT DISTINCT e.dst_url AS url, f.sid, {h} AS hop
          FROM link_edges e JOIN l{h - 1} f ON e.src_url = f.url
        )""")
    unions = " UNION ALL ".join(
        f"SELECT * FROM l{h}" for h in range(0, max_hops + 1))
    return f"""
        {links_pre},
        nodes AS (
          SELECT DISTINCT src_url AS url FROM link_edges
        ),
        seeds AS (
          SELECT url, row_number() OVER (
              ORDER BY md5_number_upper(url), url) - 1 AS sid
          FROM nodes WHERE md5_number_upper(url) % {seed_mod} = 0
          ORDER BY md5_number_upper(url), url LIMIT {n_seeds}
        ),
        l0 AS (SELECT url, sid, 0 AS hop FROM seeds),{",".join(steps)},
        md AS (
          SELECT url, sid, min(hop) AS d FROM ({unions}) GROUP BY 1, 2
        ),
        c AS (SELECT d AS hop, count(*)::BIGINT AS n_pairs
              FROM md GROUP BY 1),
        g AS (SELECT sum(n_pairs)::BIGINT AS total FROM c)
        SELECT hop::BIGINT AS hop, n_pairs,
               sum(n_pairs) OVER (ORDER BY hop)::BIGINT AS cum_pairs,
               (sum(n_pairs) OVER (ORDER BY hop)::HUGEINT * 1000000
                // g.total)::BIGINT AS cum_ppm
        FROM c CROSS JOIN g
        ORDER BY 1"""


# ---------------------------------------------------------------------------
# deterministic random walks (DeepWalk corpus prep)
# ---------------------------------------------------------------------------


def random_walks(edges, *, seed_mod: int = 10, n_walks: int = 8,
                 walk_len: int = 4, salt: str = "",
                 num_buckets: int = 32):
    """Walk corpus over the link graph — the DeepWalk/node2vec data-prep
    stage (Perozzi et al. KDD'14: truncated walks ARE the sentences a
    skip-gram embedding trains on), with the walk made a PURE FUNCTION
    of the data the way every sampler in this engine is: at each step
    the walk at node u moves to the out-neighbor v minimizing
    ``(md5_hash64(salt|wid|step|u|v), v)`` — per-(walk, step) keyed
    hashing so distinct walks from the same start diverge and re-visits
    at different steps take different edges, while any cluster shape
    and the SQL mirror replay the identical corpus (the md5 analog of a
    seeded RNG; marginally each choice is hash-uniform over the
    neighbors). Walk starts: the harmonic_centrality bottom-(md5, url)
    seed discipline, ``n_walks`` ids round-robined over the seed set.
    Dead ends truncate the walk (the DeepWalk convention).

    Scale shape: walk state is one (wid, url) row per live walk; per
    step ONE inner co-partitioned edges⋈state join, then a vectorized
    per-wid argmin inside the bucket (lexsort on (wid, hash, dst)) —
    nothing corpus-sized ever sits on the driver; n_walks·walk_len
    bounded output. Output ``(wid, step, url)`` — step 0 is the start.
    """
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
    )

    edges = edges.materialize()
    nodes = bucketed_aggregate(
        edges.map_batches(
            lambda t: pa.table(
                {"url": t.column("src_url").combine_chunks()}),
            batch_format="pyarrow"),
        ["url"], {"_n": ("url", "size")},
        num_buckets=num_buckets,
    ).drop_columns(["_n"])

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        urls = df["url"].to_numpy()
        h = md5_hash64([str(u) for u in urls])
        keep = h % seed_mod == 0
        sub = pd.DataFrame({"url": urls[keep], "_h": h[keep]})
        return sub.sort_values(["_h", "url"]).head(n_walks)

    cand = nodes.map_batches(bottomk, batch_format="pandas").to_pandas()
    starts = cand.sort_values(["_h", "url"]).head(n_walks).reset_index(
        drop=True)["url"].tolist()
    if not starts:
        return pd.DataFrame({
            "wid": pd.Series([], dtype="int64"),
            "step": pd.Series([], dtype="int64"),
            "url": pd.Series([], dtype=object),
        })
    state = pd.DataFrame({
        "wid": np.arange(n_walks, dtype=np.int64),
        "url": [starts[i % len(starts)] for i in range(n_walks)],
    })
    out_rows = [state.assign(step=np.int64(0))]
    cur = ray.data.from_pandas(state).materialize()
    for step in range(1, walk_len + 1):
        hit = bucket_join(edges, cur, left_key="src_url",
                          right_key="url", num_buckets=num_buckets,
                          how="inner")

        def step_pick(df: pd.DataFrame, _s=step) -> pd.DataFrame:
            # per-batch PARTIAL argmin (min is associative — the hash
            # rides along so the wid-keyed fold finishes it exactly)
            if len(df) == 0:
                return pd.DataFrame({
                    "wid": pd.Series([], dtype="int64"),
                    "_h": pd.Series([], dtype="uint64"),
                    "url": pd.Series([], dtype=object)})
            h = md5_hash64([
                f"{salt}|{w}|{_s}|{u}|{v}"
                for w, u, v in zip(df["wid"], df["src_url"],
                                   df["dst_url"])])
            d = pd.DataFrame({"wid": df["wid"].to_numpy(),
                              "_h": h, "url": df["dst_url"].to_numpy()})
            d = d.sort_values(["wid", "_h", "url"], kind="mergesort")
            return d.groupby("wid", sort=False, as_index=False).first()

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            d = df.sort_values(["wid", "_h", "url"], kind="mergesort")
            return d.groupby("wid", sort=False, as_index=False).first()[
                ["wid", "url"]]

        from htrc_feature_reader_ray.stages.partition import (
            bucketed_map_groups,
        )
        nxt = bucketed_map_groups(
            hit.map_batches(step_pick, batch_format="pandas"),
            "wid", finish, num_buckets=num_buckets)
        got = nxt.to_pandas()
        if len(got) == 0:
            break
        out_rows.append(got.assign(step=np.int64(step)))
        cur = ray.data.from_pandas(got[["wid", "url"]]).materialize()
    out = pd.concat(out_rows, ignore_index=True)[["wid", "step", "url"]]
    out["wid"] = out["wid"].astype("int64")
    out["step"] = out["step"].astype("int64")
    return out.sort_values(["wid", "step"]).reset_index(drop=True)


def random_walks_sql(*, links_pre: str, seed_mod: int = 10,
                     n_walks: int = 8, walk_len: int = 4,
                     salt: str = "") -> str:
    """SQL mirror: bottom-k starts round-robined to wids, walk_len
    unrolled steps each picking min-(md5_number_upper, dst) among the
    current node's out-edges per wid."""
    steps = []
    for s in range(1, walk_len + 1):
        steps.append(f"""
        w{s} AS (
          SELECT wid, url FROM (
            SELECT f.wid, e.dst_url AS url,
                   row_number() OVER (
                     PARTITION BY f.wid
                     ORDER BY md5_number_upper(
                       '{salt}|' || f.wid::VARCHAR || '|{s}|'
                       || f.url || '|' || e.dst_url), e.dst_url) AS rk
            FROM w{s - 1} f JOIN link_edges e ON e.src_url = f.url
          ) WHERE rk = 1
        )""")
    unions = " UNION ALL ".join(
        f"SELECT wid, {s} AS step, url FROM w{s}"
        for s in range(0, walk_len + 1))
    return f"""
        {links_pre},
        nodes AS (
          SELECT DISTINCT src_url AS url FROM link_edges
        ),
        starts AS (
          SELECT url, row_number() OVER (
              ORDER BY md5_number_upper(url), url) - 1 AS sid
          FROM nodes WHERE md5_number_upper(url) % {seed_mod} = 0
          ORDER BY md5_number_upper(url), url LIMIT {n_walks}
        ),
        w0 AS (
          SELECT t.wid, s.url
          FROM generate_series(0, {n_walks - 1}) t(wid)
          JOIN starts s
            ON s.sid = t.wid % (SELECT count(*) FROM starts)
        ),{",".join(steps)}
        SELECT wid::BIGINT AS wid, step::BIGINT AS step, url
        FROM ({unions})
        ORDER BY 1, 2"""


def host_assortativity(edges, *, num_buckets: int = 16):
    """Newman CATEGORICAL attribute assortativity of the link graph with
    attribute = host — the chance-corrected companion to
    :func:`host_outlink_mix`: the mix reports each host's raw
    same-host share, while assortativity asks "is within-host linking
    higher than the hosts' in/out marginals would produce by chance"
    across the whole graph (Newman, PRE 67:026126 eq. 2, the
    discrete-attribute form of :func:`degree_assortativity`). A crawl
    where every host is a silo scores near +1; a hub-and-spoke corpus
    where navigation all flows through a few cross-host portals goes
    negative.

    Exact integer form: with m = |edges|, E = same-host edges, A_i/B_i
    the per-host out/in edge counts and S = Σ_i A_i·B_i:

        r = (E·m − S) / (m² − S)
        r_ppm   — shift-clamp fixed-point division (engine floor ==
                  DuckDB truncation on negative r); m² = S (every edge
                  inside one host) reports 0 by contract
        same_ppm = E·10⁶ // m rides along (the raw diagonal share)

    The attribute is DERIVED FROM THE URL STRING itself (the
    ``host_edges`` regex identity, mirrored by ``regexp_extract``), so
    unlike a node-label assortativity no attribute join touches the
    edges — zero lookups, and the exchange carries (host, o, i) count
    rows only.

    Scale shape: per-batch pandas value_counts partials (one row per
    host per batch + one sentinel row carrying the batch's diagonal
    and edge counts), ONE host-keyed fold, then the Σ A_i·B_i /
    marginal totals ride a per-batch scalar partial + native sum —
    the driver sees four scalars, never the host table. A_i·B_i
    passes int64 up to ~3·10⁹ edges on one host pair; the HUGEINT
    mirror bounds at ~10¹⁹ (documented). Input must be the DISTINCT
    edge set (extract_links' contract). Output one row
    ``(n_edges, n_hosts, same_ppm, r_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    SENT = "\x00same"
    host_re = r"://([^/]+)"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sh = df["src_url"].astype(str).str.extract(host_re, expand=False)
        dh = df["dst_url"].astype(str).str.extract(host_re, expand=False)
        # an edge needs BOTH endpoints hosted: rows where either URL
        # has no '://host' are dropped from m, E and the marginals
        # alike, mirrored by the SQL's NULLIF + IS NOT NULL filter
        # (ADVICE r3: NaN-vs-'' asymmetry on malformed URLs)
        ok = sh.notna() & dh.notna()
        sh, dh, df = sh[ok], dh[ok], df[ok]
        o = sh.value_counts()
        i = dh.value_counts()
        hosts = o.index.union(i.index)
        out = pd.DataFrame({
            "host": hosts.astype(str),
            "o": o.reindex(hosts, fill_value=0).astype("int64").to_numpy(),
            "i": i.reindex(hosts, fill_value=0).astype("int64").to_numpy(),
        })
        sent = pd.DataFrame({"host": [SENT],
                             "o": [int((sh == dh).sum())],
                             "i": [len(df)]})
        return pd.concat([out, sent], ignore_index=True)

    folded = bucketed_aggregate(
        edges.map_batches(partial, batch_format="pandas"),
        ["host"], {"o": ("o", "sum"), "i": ("i", "sum")},
        num_buckets=num_buckets,
    )

    def scalars(df: pd.DataFrame) -> pd.DataFrame:
        sent = df["host"] == SENT
        hosts = df[~sent]
        return pd.DataFrame({
            "e": [int(df.loc[sent, "o"].sum())],
            "m": [int(df.loc[sent, "i"].sum())],
            "s": [int((hosts["o"].to_numpy().astype(object)
                       * hosts["i"].to_numpy()).sum())],
            "k": [int(len(hosts))],
        })

    agg = folded.map_batches(scalars, batch_format="pandas").sum(
        ["e", "m", "s", "k"])
    e_ = int(agg["sum(e)"] or 0)
    m = int(agg["sum(m)"] or 0)
    s_ = int(agg["sum(s)"] or 0)
    k = int(agg["sum(k)"] or 0)
    same = e_ * 1_000_000 // m if m > 0 else 0
    den = m * m - s_
    if den > 0:
        num = max(e_ * m - s_, -den)
        r = (num + den) * 1_000_000 // den - 1_000_000
    else:
        r = 0
    out = pd.DataFrame({
        "n_edges": [m], "n_hosts": [k],
        "same_ppm": [same], "r_ppm": [r],
    }).astype("int64")
    return ray.data.from_pandas(out)


def host_assortativity_sql(*, edges_cte: str = "e2") -> str:
    """SQL mirror fragment (append after a WITH preamble providing
    ``edges_cte`` with distinct (src_url, dst_url)): the same marginal
    fold + shift-clamp HUGEINT algebra."""
    return f""",
        he AS (
          SELECT sh, dh FROM (
            SELECT NULLIF(regexp_extract(src_url, '://([^/]+)', 1),
                          '') AS sh,
                   NULLIF(regexp_extract(dst_url, '://([^/]+)', 1),
                          '') AS dh
            FROM {edges_cte}
          ) WHERE sh IS NOT NULL AND dh IS NOT NULL
        ),
        mx AS (
          SELECT host, sum(o)::HUGEINT AS a, sum(i)::HUGEINT AS b
          FROM (SELECT sh AS host, 1 AS o, 0 AS i FROM he
                UNION ALL SELECT dh, 0, 1 FROM he)
          GROUP BY host
        ),
        alg AS (
          SELECT (SELECT count(*) FROM he)::HUGEINT AS m,
                 (SELECT count(*) FROM he WHERE sh = dh)::HUGEINT AS e,
                 coalesce((SELECT sum(a * b) FROM mx), 0)::HUGEINT AS s,
                 (SELECT count(*) FROM mx)::BIGINT AS k
        )
        SELECT m::BIGINT AS n_edges, k AS n_hosts,
               CASE WHEN m > 0 THEN (e * 1000000 // m)::BIGINT
                    ELSE 0 END AS same_ppm,
               CASE WHEN m * m - s > 0 THEN
                 ((greatest(e * m - s, -(m * m - s)) + (m * m - s))
                  * 1000000 // (m * m - s) - 1000000)::BIGINT
               ELSE 0 END AS r_ppm
        FROM alg"""


def rich_club(edges, *, thresholds=(1, 2, 4, 8, 16, 32, 64, 128),
              num_buckets: int = 16, broadcast_limit: int = 2_000_000):
    """Rich-club coefficient curve of the undirected link graph
    (Zhou & Mondragón 2004): for each degree threshold k,
    ``φ(k) = 2·E_k / (N_k·(N_k−1))`` where N_k = nodes with degree > k
    and E_k = edges BETWEEN two such nodes — do the hubs of the crawl
    link preferentially to each other (a tightly-wired core of portals
    and link farms) or only down into their spokes? The curve is the
    core-wiring readout next to :func:`k_core` (which asks who SURVIVES
    iterated pruning; the rich club asks how densely the survivors
    wire to each other at each degree tier).

    Exact integer ppm, one nonnegative floor per threshold:
    ``phi_ppm = 2·E_k·10⁶ // (N_k·(N_k−1))``, 0 by contract when
    N_k < 2. Raw φ, not the rewiring-normalized ρ (a null model needs
    degree-preserving randomization — out of scope, documented).

    Scale shape: :func:`modularity`'s documented machinery — one
    lo-bucketed distinct fold canonicalizing the undirected edge set
    (dups / reversals / self-loops dropped), one degree fold, two
    url-only bucketed joins attaching both endpoint degrees to each
    edge; then BOTH histograms collapse per batch to ≤|thresholds|
    partial rows (an edge contributes to E_k iff min(d_lo, d_hi) > k;
    a node to N_k iff d > k), ONE tiny k-keyed fold, driver finish.
    Output one row per threshold: ``(k, n_nodes, n_edges, phi_ppm)``.
    Under the node-count gate, E_k comes from ONE map pass over the
    pinned edges with the degree vector broadcast and N_k driver-side
    (no endpoint-degree joins) — paths equal by pinned pytest."""
    import pyarrow.compute as pc

    import ray.data

    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        bucketed_map_groups,
    )

    ks = sorted(int(k) for k in thresholds)

    def canon(batch: pa.Table) -> pa.Table:
        s = _str_array(batch, "src_url").to_numpy(zero_copy_only=False)
        d = _str_array(batch, "dst_url").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "lo": pa.array(np.minimum(s, d), type=pa.string()),
            "hi": pa.array(np.maximum(s, d), type=pa.string()),
        })

    und = bucketed_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"),
        "lo", lambda df: df.drop_duplicates(["lo", "hi"]),
        num_buckets=num_buckets,
    ).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"url": pa.concat_arrays([
            t.column("lo").combine_chunks(),
            t.column("hi").combine_chunks()])})

    deg = bucketed_aggregate(
        und.map_batches(endpoints, batch_format="pyarrow"),
        ["url"], {"d": ("url", "size")}, num_buckets=num_buckets,
    ).materialize()

    def _finish(ekn):
        rows = []
        for k, e, n in ekn:
            e, n = int(e), int(n)
            phi = 2 * e * 1_000_000 // (n * (n - 1)) if n >= 2 else 0
            rows.append((int(k), n, e, phi))
        out = pd.DataFrame(rows, columns=["k", "n_nodes", "n_edges",
                                          "phi_ppm"]).astype("int64")
        return ray.data.from_pandas(out)

    if deg.count() <= broadcast_limit:
        # broadcast fast path (the modularity recipe): the degree
        # vector rides to the driver; N_k is a driver-side count and
        # E_k is ONE map pass over the pinned undirected edges with the
        # vector broadcast — no endpoint-degree joins
        import ray as _ray

        deg_pd = deg.to_pandas()
        keys = np.sort(deg_pd["url"].to_numpy())
        dvec = np.zeros(len(keys), dtype=np.int64)
        dvec[np.searchsorted(keys, deg_pd["url"].to_numpy())] = (
            deg_pd["d"].to_numpy(dtype=np.int64))
        n_of = {k: int((dvec > k).sum()) for k in ks}
        ref = _ray.put((pa.array(keys, type=pa.string()), dvec))

        def edge_partial_bcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "e": pa.array([], pa.int64())})
            ks_, dv = _ray.get(ref)
            lo = pc.index_in(t.column("lo").cast(pa.string()),
                             value_set=ks_).to_numpy(
                                 zero_copy_only=False)
            hi = pc.index_in(t.column("hi").cast(pa.string()),
                             value_set=ks_).to_numpy(
                                 zero_copy_only=False)
            md = np.minimum(dv[lo], dv[hi])
            return pa.table({
                "k": pa.array(np.array(ks, dtype=np.int64)),
                "e": pa.array(np.array(
                    [int((md > k).sum()) for k in ks],
                    dtype=np.int64))})

        parts = und.map_batches(edge_partial_bcast,
                                batch_format="pyarrow").to_pandas()
        e_of = (parts.groupby("k")["e"].sum().to_dict()
                if len(parts) and "k" in parts.columns else {})
        return _finish([(k, int(e_of.get(k, 0)), n_of[k]) for k in ks])

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy()
        return pd.DataFrame({
            "k": np.array(ks, dtype=np.int64),
            "e": np.zeros(len(ks), dtype=np.int64),
            "n": np.array([int((d > k).sum()) for k in ks],
                          dtype=np.int64),
        })

    def d_lo(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"],
                             "d_lo": df["d"].astype("int64")})

    def d_hi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"],
                             "d_hi": df["d"].astype("int64")})

    with_lo = bucket_join(
        und, deg.map_batches(d_lo, batch_format="pandas"),
        left_key="lo", right_key="url", num_buckets=num_buckets)
    with_both = bucket_join(
        with_lo, deg.map_batches(d_hi, batch_format="pandas"),
        left_key="hi", right_key="url", num_buckets=num_buckets)

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        md = np.minimum(df["d_lo"].to_numpy(), df["d_hi"].to_numpy())
        return pd.DataFrame({
            "k": np.array(ks, dtype=np.int64),
            "e": np.array([int((md > k).sum()) for k in ks],
                          dtype=np.int64),
            "n": np.zeros(len(ks), dtype=np.int64),
        })

    partials = deg.map_batches(node_partial, batch_format="pandas").union(
        with_both.map_batches(edge_partial, batch_format="pandas"))
    folded = bucketed_aggregate(
        partials, ["k"], {"e": ("e", "sum"), "n": ("n", "sum")},
        num_buckets=1,
    ).to_pandas().sort_values("k")
    return _finish(zip(folded["k"], folded["e"], folded["n"]))


def rich_club_sql(*, edges_cte: str = "e2",
                  thresholds=(1, 2, 4, 8, 16, 32, 64, 128)) -> str:
    """SQL mirror fragment (append after a WITH preamble providing
    ``edges_cte`` with distinct (src_url, dst_url)): canonical
    undirected set, degree fold, min-endpoint-degree per edge, one
    threshold row each."""
    ks = sorted(int(k) for k in thresholds)
    klist = ", ".join(str(k) for k in ks)
    return f""",
        und AS MATERIALIZED (
          SELECT DISTINCT least(src_url, dst_url) AS lo,
                 greatest(src_url, dst_url) AS hi
          FROM {edges_cte} WHERE src_url != dst_url
        ),
        deg AS MATERIALIZED (
          SELECT url, count(*)::BIGINT AS d
          FROM (SELECT lo AS url FROM und UNION ALL SELECT hi FROM und)
          GROUP BY 1
        ),
        th AS (SELECT unnest([{klist}])::BIGINT AS k),
        ec AS (
          SELECT th.k, count(*)::HUGEINT AS e
          FROM und JOIN deg dl ON und.lo = dl.url
                   JOIN deg dh ON und.hi = dh.url
               CROSS JOIN th
          WHERE least(dl.d, dh.d) > th.k
          GROUP BY th.k
        ),
        nc AS (
          SELECT th.k, count(*)::HUGEINT AS n
          FROM deg CROSS JOIN th WHERE deg.d > th.k
          GROUP BY th.k
        )
        SELECT th.k AS k, coalesce(nc.n, 0)::BIGINT AS n_nodes,
               coalesce(ec.e, 0)::BIGINT AS n_edges,
               CASE WHEN coalesce(nc.n, 0) >= 2 THEN
                 (2 * coalesce(ec.e, 0) * 1000000
                  // (nc.n * (nc.n - 1)))::BIGINT
               ELSE 0 END AS phi_ppm
        FROM th LEFT JOIN ec ON th.k = ec.k
                LEFT JOIN nc ON th.k = nc.k
        ORDER BY th.k"""


def neighbor_degree_curve(edges, *, num_buckets: int = 16,
                          broadcast_limit: int = 2_000_000):
    """Average-neighbor-degree curve knn(k) of the undirected link
    graph (Pastor-Satorras, Vázquez & Vespignani, PRL 87:258701) over
    power-of-two degree tiers — the CURVE behind
    :func:`degree_assortativity`'s single scalar: a falling knn(k) is
    the web's disassortative signature localized to the tiers where
    it happens (WHICH hubs sit atop low-degree spokes), and read next
    to :func:`rich_club` it separates "hubs avoid each other" from
    "hubs wire densely" tier by tier.

    Exact integer contract per degree bucket b = bitlen(d) (the
    :func:`degree_histogram` bucketing):

        knn_ppm(b) = Σ_{(u,v): u∈b} deg(v) · 10⁶ // Σ_{u∈b} deg(u)

    — the edge-endpoint-weighted mean neighbor degree, one
    nonnegative floor; the denominator equals the bucket's total
    edge-endpoint count, so no per-node averaging floors accumulate.
    Buckets with no edges report 0 by contract (isolated nodes don't
    occur: nodes come from edges).

    Scale shape: :func:`rich_club`'s machinery verbatim — canonical
    undirected distinct fold, degree fold; under the node-count gate
    ONE map pass over the pinned edges with the degree vector
    broadcast (node stats straight off the driver vector — paths
    equal by pinned pytest), else two url-only bucketed joins
    attaching both endpoint degrees where each edge emits TWO
    (bucket, neighbor-degree) contributions that collapse per batch
    to ≤64 partial rows, node-side sums ride the degree fold the same
    way, ONE tiny bucket-keyed fold finishes. Output
    ``(degree_bucket, n_nodes, sum_degree, sum_neighbor_degree,
    knn_ppm)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import (
        bucket_join,
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def canon(batch: pa.Table) -> pa.Table:
        s = _str_array(batch, "src_url").to_numpy(zero_copy_only=False)
        d = _str_array(batch, "dst_url").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "lo": pa.array(np.minimum(s, d), type=pa.string()),
            "hi": pa.array(np.maximum(s, d), type=pa.string()),
        })

    und = bucketed_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"),
        "lo", lambda df: df.drop_duplicates(["lo", "hi"]),
        num_buckets=num_buckets,
    ).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"url": pa.concat_arrays([
            t.column("lo").combine_chunks(),
            t.column("hi").combine_chunks()])})

    deg = bucketed_aggregate(
        und.map_batches(endpoints, batch_format="pyarrow"),
        ["url"], {"d": ("url", "size")}, num_buckets=num_buckets,
    ).materialize()

    def blen(a: np.ndarray) -> np.ndarray:
        return np.frexp(a.astype(np.float64))[1].astype(np.int64)

    def _finish(b_arr, n_arr, sd_arr, snd_arr):
        knn = [int(s_n) * 1_000_000 // int(s_d) if int(s_d) > 0 else 0
               for s_n, s_d in zip(snd_arr, sd_arr)]
        out = pd.DataFrame({
            "degree_bucket": np.asarray(b_arr, dtype=np.int64),
            "n_nodes": np.asarray(n_arr, dtype=np.int64),
            "sum_degree": np.asarray(sd_arr, dtype=np.int64),
            "sum_neighbor_degree": np.asarray(snd_arr, dtype=np.int64),
            "knn_ppm": pd.Series(knn, dtype="int64"),
        }).reset_index(drop=True)
        return ray.data.from_pandas(out)

    if deg.count() <= broadcast_limit:
        # broadcast fast path (the rich_club recipe): node stats come
        # straight off the driver-side degree vector; neighbor-degree
        # sums are ONE map pass over the pinned edges — no joins
        import pyarrow.compute as pc

        import ray as _ray

        deg_pd = deg.to_pandas()
        keys = np.sort(deg_pd["url"].to_numpy())
        dvec = np.zeros(len(keys), dtype=np.int64)
        dvec[np.searchsorted(keys, deg_pd["url"].to_numpy())] = (
            deg_pd["d"].to_numpy(dtype=np.int64))
        nb = blen(dvec) if len(dvec) else np.zeros(0, dtype=np.int64)
        n_of = np.bincount(nb, minlength=65) if len(nb) else \
            np.zeros(65, dtype=np.int64)
        sd_of = (np.bincount(nb, weights=dvec, minlength=65)
                 .astype(np.int64) if len(nb) else
                 np.zeros(65, dtype=np.int64))
        ref = _ray.put((pa.array(keys, type=pa.string()), dvec))

        def edge_partial_bcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"b": pa.array([], pa.int64()),
                                 "snd": pa.array([], pa.int64())})
            ks_, dv = _ray.get(ref)
            lo = pc.index_in(t.column("lo").cast(pa.string()),
                             value_set=ks_).to_numpy(
                                 zero_copy_only=False)
            hi = pc.index_in(t.column("hi").cast(pa.string()),
                             value_set=ks_).to_numpy(
                                 zero_copy_only=False)
            dl, dh = dv[lo], dv[hi]
            b = np.concatenate([blen(dl), blen(dh)])
            nbr = np.concatenate([dh, dl])
            snd = np.bincount(b, weights=nbr, minlength=65).astype(
                np.int64)
            nz = np.flatnonzero(snd)
            return pa.table({"b": pa.array(nz.astype(np.int64)),
                             "snd": pa.array(snd[nz])})

        parts = und.map_batches(edge_partial_bcast,
                                batch_format="pyarrow").to_pandas()
        snd_of = np.zeros(65, dtype=np.int64)
        if len(parts) and "b" in parts.columns:
            np.add.at(snd_of, parts["b"].to_numpy(),
                      parts["snd"].to_numpy())
        bs = np.flatnonzero(n_of)
        return _finish(bs, n_of[bs], sd_of[bs], snd_of[bs])

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy().astype(np.int64)
        b = blen(d)
        out = pd.DataFrame({"b": b, "n": 1, "sd": d, "snd": 0})
        return (out.groupby("b", as_index=False)
                .agg(n=("n", "sum"), sd=("sd", "sum"),
                     snd=("snd", "sum")))

    def d_lo(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"],
                             "d_lo": df["d"].astype("int64")})

    def d_hi(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": df["url"],
                             "d_hi": df["d"].astype("int64")})

    with_lo = bucket_join(
        und, deg.map_batches(d_lo, batch_format="pandas"),
        left_key="lo", right_key="url", num_buckets=num_buckets)
    with_both = bucket_join(
        with_lo, deg.map_batches(d_hi, batch_format="pandas"),
        left_key="hi", right_key="url", num_buckets=num_buckets)

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["d_lo"].to_numpy().astype(np.int64)
        dh = df["d_hi"].to_numpy().astype(np.int64)
        b = np.concatenate([blen(dl), blen(dh)])
        nbr = np.concatenate([dh, dl])
        out = pd.DataFrame({"b": b, "n": 0, "sd": 0, "snd": nbr})
        return (out.groupby("b", as_index=False)
                .agg(n=("n", "sum"), sd=("sd", "sum"),
                     snd=("snd", "sum")))

    partials = deg.map_batches(node_partial, batch_format="pandas").union(
        with_both.map_batches(edge_partial, batch_format="pandas"))
    folded = bucketed_aggregate(
        partials, ["b"], {"n": ("n", "sum"), "sd": ("sd", "sum"),
                          "snd": ("snd", "sum")},
        num_buckets=1,
    ).to_pandas().sort_values("b")

    return _finish(folded["b"].to_numpy(), folded["n"].to_numpy(),
                   folded["sd"].to_numpy(), folded["snd"].to_numpy())


def neighbor_degree_curve_sql(*, edges_cte: str = "e2") -> str:
    """SQL mirror fragment (append after a WITH preamble providing
    ``edges_cte``): canonical undirected set, degree fold, two
    endpoint contributions per edge, length(bin(d)) buckets."""
    return f""",
        und AS MATERIALIZED (
          SELECT DISTINCT least(src_url, dst_url) AS lo,
                 greatest(src_url, dst_url) AS hi
          FROM {edges_cte} WHERE src_url != dst_url
        ),
        deg AS MATERIALIZED (
          SELECT url, count(*)::BIGINT AS d
          FROM (SELECT lo AS url FROM und UNION ALL SELECT hi FROM und)
          GROUP BY 1
        ),
        contrib AS (
          SELECT length(bin(dl.d))::BIGINT AS b, dh.d AS nbr
          FROM und JOIN deg dl ON und.lo = dl.url
                   JOIN deg dh ON und.hi = dh.url
          UNION ALL
          SELECT length(bin(dh.d))::BIGINT, dl.d
          FROM und JOIN deg dl ON und.lo = dl.url
                   JOIN deg dh ON und.hi = dh.url
        ),
        nodes AS (
          SELECT length(bin(d))::BIGINT AS b,
                 count(*)::BIGINT AS n, sum(d)::HUGEINT AS sd
          FROM deg GROUP BY 1
        ),
        edges_b AS (
          SELECT b, sum(nbr)::HUGEINT AS snd FROM contrib GROUP BY 1
        )
        SELECT nodes.b AS degree_bucket, nodes.n AS n_nodes,
               nodes.sd::BIGINT AS sum_degree,
               coalesce(edges_b.snd, 0)::BIGINT AS sum_neighbor_degree,
               CASE WHEN nodes.sd > 0 THEN
                 (coalesce(edges_b.snd, 0) * 1000000
                  // nodes.sd)::BIGINT
               ELSE 0 END AS knn_ppm
        FROM nodes LEFT JOIN edges_b USING (b)
        ORDER BY nodes.b"""


EV_INIT = 1 << 10       # r_0 per node
EV_NORM_BITS = 20       # shift raw sums back under 2^20 each round


def eigenvector_centrality(edges, *, iterations: int = 4,
                           num_buckets: int = 32,
                           broadcast_limit: int = 2_000_000):
    """Integer power-iteration eigenvector centrality over the directed
    edge set — the centrality-family member PageRank deliberately
    damps away: no teleport, no out-degree normalization, so a node's
    score is the (normalized) count of length-t walks ENDING at it —
    prestige flows whole from every endorser, which is why a page
    endorsed by one mega-hub outranks one endorsed by three minor
    pages here, while PageRank (which splits each endorser's vote)
    can order them the other way. Completes the family: degree
    (local), harmonic (distance), coreness (cohesion), PageRank
    (damped random walk), HITS (bipartite hub/authority), this
    (undamped adjacency spectrum).

    Exact-integer contract (bit-exact across parallelism; unrolled-CTE
    replayable):

        r_0(v)     = 2¹⁰
        raw(v)     = Σ_{u→v} r_t(u)
        shift_t    = max(0, bitlen(max_v raw) − 20)
        r_{t+1}(v) = raw(v) >> shift_t

    The per-round right-shift is the integer stand-in for the power
    method's norm division — rank ORDER is exact, magnitudes are the
    documented fixed-point. A DAG can legitimately drain to all-zero
    ranks once t exceeds its longest path (no length-t walks exist);
    zeros are the correct readout, kept.

    Scale shape: pagerank's two documented paths — the worker-fit
    broadcast fast path (ONE exchange per round via the push fold;
    max on the driver), else the bucketed plan (per round: one rank
    join, one dst fold, one scalar max fold, one stateless shift
    map). Output ``(url, score)``."""
    import ray.data

    edges = edges.materialize()
    nodes = _distinct_nodes(edges, num_buckets=num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "url": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.int64()),
        }))

    if n <= broadcast_limit:
        urls = nodes.to_pandas()["url"].to_numpy()
        rank = pd.Series(np.full(n, EV_INIT, dtype=np.int64), index=urls)
        for _ in range(iterations):
            summed = _bcast_push_fold(
                edges, rank, src_col="src_url", dst_col="dst_url",
                num_buckets=num_buckets)
            raw = summed.reindex(urls, fill_value=0).to_numpy()
            m = int(raw.max()) if len(raw) else 0
            shift = max(0, int(m).bit_length() - EV_NORM_BITS)
            rank = pd.Series(raw >> shift, index=urls)
        return ray.data.from_arrow(pa.table({
            "url": pa.array(urls, type=pa.string()),
            "score": pa.array(rank.to_numpy(), type=pa.int64()),
        }))

    def init_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.full(len(batch), EV_INIT, dtype=np.int64)))

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url").cast(pa.string()),
            "s": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    ranks = nodes.map_batches(init_rank,
                              batch_format="pyarrow").materialize()
    for _ in range(iterations):
        joined = bucket_join(
            edges, ranks, left_key="src_url", right_key="url",
            how="inner", num_buckets=num_buckets)

        def push(batch: pa.Table) -> pa.Table:
            return pa.table({
                "url": batch.column("dst_url").cast(pa.string()),
                "s": batch.column("rank"),
            })

        summed = bucketed_aggregate(
            joined.map_batches(push, batch_format="pyarrow").union(
                nodes.map_batches(zero_rows, batch_format="pyarrow")),
            "url", {"s": ("s", "sum")}, num_buckets=num_buckets,
        ).materialize()
        m = int(summed.max("s") or 0)
        shift = max(0, m.bit_length() - EV_NORM_BITS)

        def reshift(batch: pa.Table, _s=shift) -> pa.Table:
            s = batch.column("s").to_numpy()
            return pa.table({
                "url": batch.column("url"),
                "rank": pa.array(s >> _s, type=pa.int64()),
            })

        ranks = summed.map_batches(reshift,
                                   batch_format="pyarrow").materialize()

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["url", "score"])

    return ranks.map_batches(rename, batch_format="pyarrow")


def eigenvector_centrality_sql(*, iterations: int = 4,
                               e2_select: str =
                               "SELECT DISTINCT src_url, dst_url"
                               " FROM link_edges") -> str:
    """Unrolled-CTE replay of the shift-normalized integer power
    iteration (length(bin(m)) == bit_length; DuckDB >> == numpy >>
    on nonnegative BIGINT)."""
    sql = f""",
e2 AS MATERIALIZED ({e2_select}),
evn AS (SELECT DISTINCT url FROM (
    SELECT src_url AS url FROM e2
    UNION ALL SELECT dst_url FROM e2)),
ev0 AS (SELECT url, {EV_INIT}::BIGINT AS r FROM evn),
"""
    prev = "ev0"
    for i in range(1, iterations + 1):
        sql += f"""evc{i} AS (
  SELECT e.dst_url AS url, sum(r.r)::BIGINT AS s
  FROM e2 e JOIN {prev} r ON e.src_url = r.url GROUP BY 1),
evm{i} AS (SELECT greatest(0,
    length(bin(coalesce((SELECT max(s) FROM evc{i}), 0)))
    - {EV_NORM_BITS})::INTEGER AS sh),
ev{i} AS (
  SELECT evn.url, (coalesce(c.s, 0) >> evm{i}.sh)::BIGINT AS r
  FROM evn LEFT JOIN evc{i} c ON evn.url = c.url, evm{i}),
"""
        prev = f"ev{i}"
    return sql.rstrip(",\n") + (
        f"\nSELECT url, r AS score FROM ev{iterations}")


#: RBO@10 dyadic weights, p = 1/2, embedded as LITERALS (the _NDCG_W
#: convention): W[d] = D // (2^d · d) with D = 2^10 · lcm(1..10)
#: = 2,580,480, so every per-depth term overlap_d · W[d] is an exact
#: integer; RBO_NORM = Σ_d d·W[d] = D − D//2^10 (perfect agreement).
RBO_W = (0, 1290240, 322560, 107520, 40320, 16128, 6720, 2880, 1260,
         560, 252)
RBO_NORM = 2_577_960
RBO_K = 10


def rank_overlap_rbo(rank_a, rank_b, *, key_col: str, score_a: str,
                     score_b: str):
    """Rank-biased overlap @ 10 (Webber, Moffat & Zobel, TOIS 2010)
    between two score tables over the same keys — "do two rankers
    agree WHERE IT MATTERS", weighting prefix overlap geometrically
    (depth d carries weight p^d, p = 1/2) so the top of the list
    dominates, unlike :func:`kendall_tau`'s every-pair-equal view.
    The driver query asks the classic crawl question: does raw
    in-degree approximate PageRank on this graph (if yes, a frontier
    can skip the fixpoint).

    Exact integer contract: dyadic p = 1/2 clears every weight into
    the literal ``RBO_W`` table (the ``_NDCG_W`` convention — no libm
    at runtime): with overlap_d = |top-d(A) ∩ top-d(B)| under the
    (score desc, key asc) rank contract,

        rbo_ppm = Σ_{d=1..10} overlap_d · RBO_W[d] · 10⁶ // RBO_NORM

    — one floor; identical lists score exactly 10⁶, disjoint prefixes
    0. Tables shorter than 10 rows truncate the sum at their length
    (both sides).

    Scale shape: the two score tables are op OUTPUTS (already
    audit-or-node-sized); only their top-10 prefixes matter, pulled
    with the rank contract — the comparison itself is driver-trivial.
    Output one row: ``(k, overlap_at_k, rbo_ppm)``."""
    import ray.data

    def prefix(ds, score):
        # distributed top-k: only the 10-row prefix reaches the driver
        df = (ds.sort([score, key_col], descending=[True, False])
              .limit(RBO_K).to_pandas())
        return list(df[key_col])

    a = prefix(rank_a, score_a)
    b = prefix(rank_b, score_b)
    acc = 0
    last = 0
    for d in range(1, min(RBO_K, len(a), len(b)) + 1):
        last = len(set(a[:d]) & set(b[:d]))
        acc += last * RBO_W[d]
    out = pd.DataFrame({
        "k": [RBO_K], "overlap_at_k": [last],
        "rbo_ppm": [acc * 1_000_000 // RBO_NORM],
    }).astype("int64")
    return ray.data.from_pandas(out)


def host_indegree(edges, *, num_buckets: int = 16):
    """Distinct-source in-degree per host on the host-graph projection
    (self-loops included — a host linking to itself is an edge of the
    projection): the zero-fixpoint authority proxy
    :func:`rank_overlap_rbo`'s driver query compares against
    :func:`host_rank`. Output (host, in_degree)."""

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["src_url", "dst_url"])

    hedges = host_edges(edges, num_buckets=num_buckets).map_batches(
        rename, batch_format="pyarrow")
    deg = bucketed_aggregate(
        hedges, ["dst_url"], {"in_degree": ("src_url", "size")},
        num_buckets=num_buckets)
    return deg.map_batches(
        lambda t: t.rename_columns(["host", "in_degree"]),
        batch_format="pyarrow")


def rank_overlap_rbo_sql(*, rank_a_sql: str, rank_b_sql: str,
                         key: str, score_a: str, score_b: str) -> str:
    """SQL mirror: row_number both rankings under the shared rank
    contract, per-depth prefix-overlap counts via a depth table, the
    identical literal-weight single-floor sum."""
    wvals = ", ".join(f"({d}, {RBO_W[d]})" for d in range(1, RBO_K + 1))
    return f"""
        WITH ra AS (
          SELECT {key} AS k1, row_number() OVER (
              ORDER BY {score_a} DESC, {key} ASC) AS r
          FROM ({rank_a_sql}) QUALIFY r <= {RBO_K}
        ),
        rb AS (
          SELECT {key} AS k2, row_number() OVER (
              ORDER BY {score_b} DESC, {key} ASC) AS r
          FROM ({rank_b_sql}) QUALIFY r <= {RBO_K}
        ),
        w(d, w) AS (VALUES {wvals}),
        ov AS (
          SELECT w.d,
                 (SELECT count(*) FROM ra JOIN rb ON ra.k1 = rb.k2
                  WHERE ra.r <= w.d AND rb.r <= w.d) AS o
          FROM w
          WHERE w.d <= least((SELECT count(*) FROM ra),
                             (SELECT count(*) FROM rb))
        )
        SELECT {RBO_K}::BIGINT AS k,
               coalesce((SELECT o FROM ov ORDER BY d DESC LIMIT 1),
                        0)::BIGINT AS overlap_at_k,
               (coalesce((SELECT sum(o * w.w) FROM ov
                          JOIN w ON w.d = ov.d), 0)
                * 1000000 // {RBO_NORM})::BIGINT AS rbo_ppm"""
