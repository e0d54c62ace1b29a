"""URL hygiene operators for crawl curation: canonicalization, robots-style
prefix filtering, and per-host rollups.

The reference's id/path normalization surface (utils.py id→path cleaning,
resolver path schemes) generalizes at web scale to URL canonicalization —
the step that makes exact dedup and re-crawl diffing meaningful, because a
crawl sees the same resource under fragment/tracking-param/port/case
variants. All ops are stateless ``map_batches`` (the rules side of
``robots_filter`` is a broadcast small side, looped over RULES — never over
rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# query parameters dropped during canonicalization: click/campaign trackers
# that never change the addressed resource
TRACKING_EXACT = frozenset(
    {"fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid", "igshid"}
)
TRACKING_PREFIX = ("utm_",)


def _canon_query(q: str) -> str:
    """Drop tracking params, sort the rest by (key, value). '' if none."""
    kept = []
    for part in q.split("&"):
        if not part:
            continue
        key = part.split("=", 1)[0].lower()
        if key in TRACKING_EXACT or key.startswith(TRACKING_PREFIX):
            continue
        kept.append(part)
    kept.sort()
    return "&".join(kept)


def canonicalize_batch(urls: pd.Series) -> pd.Series:
    """Vectorized canonical form of a url column:

      * fragment (#...) dropped
      * scheme and host lowercased
      * default port stripped (:80 for http, :443 for https)
      * tracking query params dropped (utm_*, fbclid, gclid, ...);
        remaining params sorted; a now-empty query drops its '?'
      * empty path becomes '/'

    String surgery is pandas-vectorized; only rows WITH a query string pay
    the per-row param sort (a loop over that minority's short param lists).
    """
    s = urls.astype(str)
    s = s.str.split("#", n=1).str[0]  # fragment off first
    has_scheme = s.str.contains("://", regex=False)
    scheme = (
        s.str.split("://", n=1, regex=False).str[0].str.lower().where(
            has_scheme, ""
        )
    )
    rest = s.str.split("://", n=1, regex=False).str[-1]
    hostport = rest.str.split("/", n=1, regex=False).str[0].str.lower()
    pathq = rest.str.replace(r"^[^/]*", "", regex=True)

    host = np.where(
        (scheme == "http") & hostport.str.endswith(":80"),
        hostport.str.slice(0, -3),
        np.where(
            (scheme == "https") & hostport.str.endswith(":443"),
            hostport.str.slice(0, -4),
            hostport,
        ),
    )

    path = pathq.str.split("?", n=1, regex=False).str[0]
    path = path.where(path != "", "/")
    has_q = pathq.str.contains("?", regex=False)
    query = pathq.str.split("?", n=1, regex=False).str[-1].where(has_q, "")
    if has_q.any():
        # per-row param sort only where a query exists
        idx = query.index[has_q]
        query.loc[idx] = [_canon_query(q) for q in query.loc[idx]]

    out = scheme + "://" + host + path
    out = out.where(query == "", out + "?" + query)
    return out.where(has_scheme, urls.astype(str))  # schemeless: unchanged


def canonicalize_urls(ds, *, url_col: str = "url",
                      out_col: str = "canonical_url"):
    """Append ``out_col`` = canonical form of ``url_col``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = canonicalize_batch(df[url_col])
        return df

    return ds.map_batches(fn, batch_format="pandas")


def robots_filter(ds, rules: pd.DataFrame, *, url_col: str = "url",
                  flag_col: str = "allowed", keep_denied: bool = True):
    """Flag (or drop) rows whose url matches a (host, disallow path-prefix)
    rule — the robots.txt/blocklist shape of crawl filtering.

    ``rules``: DataFrame with columns ``host``, ``disallow`` (path prefix).
    The rule table is the broadcast small side: shipped once into the batch
    closure; evaluation loops over RULES (vectorized mask per rule), never
    over rows.
    """
    hosts = rules["host"].to_numpy()
    prefixes = rules["disallow"].to_numpy()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df[url_col].astype(str)
        rest = s.str.split("://", n=1, regex=False).str[-1]
        host = rest.str.split("/", n=1, regex=False).str[0].str.lower()
        path = rest.str.replace(r"^[^/]*", "", regex=True)
        denied = np.zeros(len(df), dtype=bool)
        for h, p in zip(hosts, prefixes):
            denied |= ((host == h) & path.str.startswith(p)).to_numpy()
        if keep_denied:
            df[flag_col] = ~denied
            return df
        return df[~denied]

    return ds.map_batches(fn, batch_format="pandas")


def crawl_schedule(pages, *, url_col: str = "url", ts_col: str = "warc_ts",
                   num_buckets: int = 32):
    """Per-url recrawl-scheduling features from the snapshot history:
    (url, n_snapshots, first_ts, last_ts, max_gap_us, mean_gap_us) — the
    signals a crawler's revisit policy ranks by (stale-but-changing urls
    first). Single-snapshot urls get 0 gaps (never-nullable ints keep the
    engine's exact-integer contract).

    One bucketed pass (all snapshots of a url share a bucket); gaps via a
    vectorized per-bucket sorted diff, mean gap by the exact closed form
    span // (n-1).
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([url_col, ts_col], kind="mergesort")
        ts64 = df[ts_col].astype("int64")
        prev = ts64.groupby(df[url_col], sort=False).shift(1)  # NaN at firsts
        gap = (ts64 - prev).fillna(0.0)
        g = df.groupby(url_col, sort=False)
        sizes = g.size()
        agg = pd.DataFrame({
            "url": sizes.index,
            "n_snapshots": sizes.to_numpy(dtype=np.int64),
            "first_ts": g[ts_col].min().to_numpy(),
            "last_ts": g[ts_col].max().to_numpy(),
            "max_gap_us": gap.groupby(df[url_col], sort=False).max()
            .reindex(sizes.index).to_numpy().astype(np.int64),
        })
        span = (agg["last_ts"].astype("int64")
                - agg["first_ts"].astype("int64")).to_numpy()
        denom = np.maximum(agg["n_snapshots"].to_numpy() - 1, 1)
        agg["mean_gap_us"] = (span // denom).astype(np.int64)
        return agg

    return bucketed_map_groups(
        pages.map_batches(
            lambda t: t.select([url_col, ts_col]), batch_format="pyarrow"
        ),
        url_col, per_bucket, num_buckets=num_buckets,
    )


def host_stats(pages, *, url_col: str = "url", lang_col: str = "lang",
               text_col: str = "text", num_buckets: int = 8):
    """Per-host crawl rollup: (host, n_snapshots, n_urls, n_langs,
    sum_chars).

    Host cardinality is tiny relative to the stream (every page of a site
    shares a host — the heavy-hitter key by construction), so the per-batch
    partial collapses to (host, url, lang) rows BEFORE the exchange: the
    shuffle carries ~distinct-url volume, not page volume, and the final
    per-bucket fold is a vectorized two-level groupby.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[url_col].astype(str)
        rest = s.str.split("://", n=1, regex=False).str[-1]
        out = pd.DataFrame({
            "host": rest.str.split("/", n=1, regex=False).str[0].str.lower(),
            "url": df[url_col],
            "lang": df[lang_col],
            "n": np.ones(len(df), dtype=np.int64),
            "chars": df[text_col].astype(str).str.len().astype(np.int64),
        })
        return (
            out.groupby(["host", "url", "lang"], sort=False, as_index=False)
            .agg(n=("n", "sum"), chars=("chars", "sum"))
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host", sort=False)
        return pd.DataFrame({
            "host": g.size().index,
            "n_snapshots": g["n"].sum().to_numpy(dtype=np.int64),
            "n_urls": g["url"].nunique().to_numpy(dtype=np.int64),
            "n_langs": g["lang"].nunique().to_numpy(dtype=np.int64),
            "sum_chars": g["chars"].sum().to_numpy(dtype=np.int64),
        })

    import ray.data  # noqa: F401  (Dataset type comes in via `pages`)

    partials = pages.map_batches(partial, batch_format="pandas")
    return bucketed_map_groups(partials, "host", finish,
                               num_buckets=num_buckets)


def mirror_hosts(docs, *, host_col: str = "source", text_col: str = "text",
                 prefix_tokens: int = 8, min_shared: int = 1,
                 max_hosts_per_fp: int = 64, num_buckets: int = 32):
    """Mirror/syndication host detection: host pairs sharing ``min_shared``+
    content fingerprints, where a fingerprint is the md5 of a document's
    first ``prefix_tokens`` tokens (the cheap prefix proxy real crawl-QA
    uses before paying for full-body comparison).

    Scale shape: per batch, distinct ``(fingerprint, host)`` pairs (text
    never leaves the batch — the exchange carries 32-hex digests); ONE
    fingerprint-bucketed exchange; per bucket a vectorized global distinct,
    then pair emission per fingerprint via a merge on the fingerprint key
    (host lists are sorted so emitted pairs are canonically ``host_a <
    host_b``); final (host_a, host_b) count is a second tiny bucketed fold.

    ``max_hosts_per_fp`` drops boilerplate fingerprints (an empty page or a
    parked-domain template can appear on thousands of hosts — quadratic pair
    blowup with no mirror signal). The cap is part of the op's contract and
    is mirrored exactly in the SQL oracle.

    Pair mining runs on the generic co-occurrence kernel
    (``partition.shared_key_pair_counts``), shared with co-citation
    relatedness (``linkgraph.related_pages``).
    """
    import hashlib

    from htrc_feature_reader_ray.stages.partition import (
        shared_key_pair_counts,
    )

    def fingerprint(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split(" ")
        pre = toks.map(
            lambda ts: " ".join([t for t in ts if t][:prefix_tokens])
        )
        fp = pre.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        out = pd.DataFrame({"fp": fp, "host": df[host_col].astype(str)})
        return out.drop_duplicates()

    fps = docs.map_batches(fingerprint, batch_format="pandas",
                           batch_size=8192)
    return shared_key_pair_counts(
        fps, key_col="fp", member_col="host", min_shared=min_shared,
        max_members_per_key=max_hosts_per_fp, num_buckets=num_buckets,
        out_a="host_a", out_b="host_b", out_n="n_shared",
    )


def mirror_hosts_sql(*, table: str = "documents", host_col: str = "source",
                     text_col: str = "text", prefix_tokens: int = 8,
                     min_shared: int = 1, max_hosts_per_fp: int = 64) -> str:
    """DuckDB mirror of ``mirror_hosts`` (same tokenizer contract: split on
    single spaces, drop empties, md5 of the space-joined prefix)."""
    return f"""
        WITH fp AS (
          SELECT DISTINCT
            md5(array_to_string(
                  list_slice(
                    list_filter(string_split({text_col}, ' '),
                                t -> t != ''),
                    1, {prefix_tokens}), ' ')) AS fp,
            {host_col}::VARCHAR AS host
          FROM {table}
        ),
        keep AS (
          SELECT fp FROM fp GROUP BY fp
          HAVING count(*) BETWEEN 2 AND {max_hosts_per_fp}
        ),
        pr AS (
          SELECT a.host AS host_a, b.host AS host_b
          FROM fp a JOIN fp b USING (fp) JOIN keep USING (fp)
          WHERE a.host < b.host
        )
        SELECT host_a, host_b, count(*)::BIGINT AS n_shared
        FROM pr GROUP BY 1, 2
        HAVING count(*) >= {min_shared}"""


def url_templates(pages, *, url_col: str = "url",
                  num_buckets: int = 16):
    """URL template mining per host: collapse every digit run in the url
    path to ``N`` and count distinct urls per ``(host, template)`` — the
    signal crawl scheduling uses to spot infinite calendar/pagination
    spaces and to cap per-template crawl budgets.

    Scale shape: vectorized regex template per batch, per-batch distinct
    ``(host, template, url)``, ONE host-bucketed exchange (per-batch
    distinct already collapsed the snapshot dimension, so the exchange
    carries ~distinct-url volume), vectorized per-bucket nunique.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def template(df: pd.DataFrame) -> pd.DataFrame:
        s = df[url_col].astype(str)
        rest = s.str.split("://", n=1, regex=False).str[-1]
        host = rest.str.split("/", n=1, regex=False).str[0].str.lower()
        path = "/" + rest.str.split("/", n=1, regex=False).str[1].fillna("")
        out = pd.DataFrame({
            "host": host,
            "template": path.str.replace(r"[0-9]+", "N", regex=True),
            "url": df[url_col],
        })
        return out.drop_duplicates()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby(["host", "template"], sort=False)
        out = g["url"].nunique().rename("n_urls").reset_index()
        out["n_urls"] = out["n_urls"].astype("int64")
        return out

    partials = pages.map_batches(template, batch_format="pandas",
                                 batch_size=8192)
    return bucketed_map_groups(partials, "host", finish,
                               num_buckets=num_buckets)


def url_templates_sql(*, url_expr: str = "url",
                      from_clause: str = "pages",
                      standalone: bool = False) -> str:
    """DuckDB mirror of ``url_templates`` over any url-producing relation.

    With ``standalone=False`` (default) the text begins with ``, u AS`` so
    it composes after an existing ``WITH <cte>`` preamble (e.g.
    ``PAGES_PRE``); pass ``standalone=True`` for a self-contained query.
    """
    head = "WITH" if standalone else ","
    return f"""
        {head} u AS (
          SELECT DISTINCT {url_expr} AS url FROM {from_clause}
        ),
        t AS (
          SELECT
            lower(string_split(string_split(url, '://')[2], '/')[1]) AS host,
            regexp_replace(
              '/' || coalesce(
                       array_to_string(
                         list_slice(string_split(
                                      string_split(url, '://')[2], '/'),
                                    2, 100000), '/'),
                       ''),
              '[0-9]+', 'N', 'g') AS template,
            url
          FROM u
        )
        SELECT host, template, count(distinct url)::BIGINT AS n_urls
        FROM t GROUP BY 1, 2"""


def host_lang_mix(pages, *, url_col: str = "url", lang_col: str = "lang",
                  num_buckets: int = 8):
    """Per-host language mix — the language-routing / mixed-language-site
    signal crawl pipelines feed the langid stage: ``(host, n_pages,
    n_langs, top_lang, top_lang_ppm)`` where ``top_lang`` is the host's
    dominant language (ties by lang ascending) and ``top_lang_ppm`` its
    integer-exact share of the host's pages.

    Same hot-key shape as :func:`host_stats`: the per-batch partial
    collapses page rows to (host, lang, n) — the exchange carries at most
    hosts×langs rows per batch regardless of how large a megasite is —
    then one host-bucketed vectorized fold."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[url_col].astype(str)
        rest = s.str.split("://", n=1, regex=False).str[-1]
        out = pd.DataFrame({
            "host": rest.str.split("/", n=1, regex=False).str[0].str.lower(),
            "lang": df[lang_col],
            "n": np.ones(len(df), dtype=np.int64),
        })
        return out.groupby(["host", "lang"], sort=False, as_index=False).agg(
            n=("n", "sum")
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pl = df.groupby(["host", "lang"], sort=False, as_index=False).agg(
            n=("n", "sum")
        )
        pl = pl.sort_values(["host", "n", "lang"],
                            ascending=[True, False, True], kind="mergesort")
        g = pl.groupby("host", sort=False)
        top = g.head(1).set_index("host")
        n_pages = g["n"].sum()
        out = pd.DataFrame({
            "host": n_pages.index,
            "n_pages": n_pages.to_numpy(dtype=np.int64),
            "n_langs": g.size().to_numpy(dtype=np.int64),
            "top_lang": top.loc[n_pages.index, "lang"].to_numpy(),
            "top_lang_ppm": (
                top.loc[n_pages.index, "n"].to_numpy(dtype=np.int64)
                * 1_000_000
            ) // n_pages.to_numpy(dtype=np.int64),
        })
        return out

    partials = pages.map_batches(partial, batch_format="pandas")
    return bucketed_map_groups(partials, "host", finish,
                               num_buckets=num_buckets)


def host_lang_mix_sql(*, from_clause: str = "pages",
                      standalone: bool = False) -> str:
    """SQL mirror of :func:`host_lang_mix` (same host projection as
    host_stats, same (n DESC, lang) tie-break, exact // ppm). Default
    composes after an existing ``WITH`` preamble (url_templates_sql
    convention); ``standalone=True`` emits a self-contained query."""
    head = "WITH" if standalone else ","
    return f"""
        {head} pl AS (
          SELECT lower(split_part(split_part(url, '://', 2), '/', 1))
                   AS host,
                 lang, count(*)::BIGINT AS n
          FROM {from_clause} GROUP BY 1, 2
        ), tot AS (
          SELECT host, sum(n)::BIGINT AS n_pages,
                 count(*)::BIGINT AS n_langs
          FROM pl GROUP BY 1
        ), top AS (
          SELECT host, lang, n,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY n DESC, lang) AS rn
          FROM pl
        )
        SELECT t.host, t.n_pages, t.n_langs, p.lang AS top_lang,
               (p.n * 1000000 // t.n_pages)::BIGINT AS top_lang_ppm
        FROM tot t JOIN top p ON t.host = p.host AND p.rn = 1"""


def url_features(ds, *, url_col: str = "url"):
    """Structural URL features for crawl prioritization / URL-level quality
    priors: scheme, lowercased host, non-empty path-segment depth, query
    parameter count and fragment presence.

    Parsing is defined by EXPLICIT split rules (first ``://``, first ``/``,
    first ``?``, first ``#``) rather than a URL library, so the SQL mirror
    is split-for-split identical on any input — the same exactness
    discipline as ``canonicalize_urls``. Stateless vectorized map, zero
    shuffle."""
    import pyarrow.compute as pc

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].astype(str)
        parts = u.str.partition("://")
        scheme = parts[0].str.lower()
        rest = parts[2]
        hp = rest.str.partition("/")
        hostport = hp[0]
        pathqf = hp[1] + hp[2]  # '' when the url has no path at all
        host = hostport.str.partition(":")[0].str.lower()
        after_q = pathqf.str.partition("?")
        path = after_q[0].str.partition("#")[0]
        query = after_q[2].str.partition("#")[0]
        depth = pc.count_substring_regex(
            pa.array(path, type=pa.string()), pattern="[^/]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        has_q = query.str.len() > 0
        n_params = np.where(
            has_q, query.str.count("&").to_numpy() + 1, 0
        ).astype(np.int64)
        out = df.copy()
        out["is_https"] = (scheme == "https").to_numpy()
        out["host"] = host.to_numpy()
        out["path_depth"] = depth
        out["n_params"] = n_params
        out["has_fragment"] = pathqf.str.contains("#", regex=False).to_numpy()
        return out

    return ds.map_batches(fn, batch_format="pandas")


def url_features_sql(*, url: str = "url", columns: str = "doc_id") -> str:
    """Column expressions mirroring :func:`url_features` split-for-split
    (``split_part`` takes the FIRST occurrence, like ``str.partition``)."""
    rest = f"split_part({url}, '://', 2)"
    hostport = f"split_part({rest}, '/', 1)"
    # pathqf: everything from the first '/' after the authority (may be '')
    pathqf = (f"CASE WHEN length({rest}) > length({hostport})"
              f" THEN substr({rest}, length({hostport}) + 1) ELSE '' END")
    path = f"split_part(split_part({pathqf}, '?', 1), '#', 1)"
    query = f"split_part(split_part({pathqf}, '?', 2), '#', 1)"
    return f"""
        {columns}, {url},
        (lower(split_part({url}, '://', 1)) = 'https') AS is_https,
        lower(split_part({hostport}, ':', 1)) AS host,
        len(list_filter(string_split({path}, '/'),
                        s -> s != ''))::BIGINT AS path_depth,
        (CASE WHEN {query} = '' THEN 0
              ELSE len(string_split({query}, '&')) END)::BIGINT AS n_params,
        contains({pathqf}, '#') AS has_fragment
    """


def parse_robots(ds, *, host_col: str = "host", txt_col: str = "robots_txt"):
    """robots.txt directive extraction: one output row per Allow/Disallow
    line — ``(host, directive, rule_path)`` — ignoring comments, blank
    lines, and other directives (User-agent, Crawl-delay, Sitemap…). The
    producer of `robots_filter`'s rule table.

    Vectorized explode: one Arrow ``split_pattern`` per batch, flat line
    array with a repeated-host parent map, RE2 prefix match + slice — no
    per-row Python. Zero shuffle."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(txt_col), pa.string())
        lines = pc.split_pattern(txt, pattern="\n")
        counts = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        flat = pc.utf8_trim_whitespace(pc.list_flatten(lines))
        hosts = batch.column(host_col).take(pa.array(parent))
        out_rows = []
        for directive, prefix in (("allow", "Allow:"),
                                  ("disallow", "Disallow:")):
            m = pc.starts_with(flat, pattern=prefix)
            sel = flat.filter(m)
            path = pc.utf8_trim_whitespace(
                pc.utf8_slice_codeunits(sel, start=len(prefix)))
            out_rows.append(pa.table({
                "host": hosts.filter(m),
                "directive": pa.array([directive] * len(sel),
                                      type=pa.string()),
                "rule_path": path,
            }))
        return pa.concat_tables(out_rows)

    return ds.map_batches(fn, batch_format="pyarrow")


def parse_robots_sql(*, robots_cte: str = "robots", host: str = "host",
                     txt: str = "robots_txt") -> str:
    """SQL mirror (composes after a WITH preamble providing the robots
    table): line unnest + prefix filter + trim — identical line algebra."""
    return f"""
        , lines AS (
            SELECT {host}, trim(l.line, ' ' || chr(9) || chr(13))
                       AS line
            FROM {robots_cte},
                 unnest(string_split({txt}, chr(10))) AS l(line)
        )
        SELECT {host} AS host,
               CASE WHEN starts_with(line, 'Allow:')
                    THEN 'allow' ELSE 'disallow' END AS directive,
               trim(CASE WHEN starts_with(line, 'Allow:')
                         THEN substr(line, 7)
                         ELSE substr(line, 10) END,
                    ' ' || chr(9) || chr(13)) AS rule_path
        FROM lines
        WHERE starts_with(line, 'Allow:')
           OR starts_with(line, 'Disallow:')"""


def robots_crawl_delay(ds, *, host_col: str = "host",
                       txt_col: str = "robots_txt", num_buckets: int = 8):
    """Per-host ``Crawl-delay`` extraction — the politeness input a crawl
    scheduler pairs with :func:`parse_robots`'s allow/disallow rules:
    ``(host, crawl_delay_s)`` = the MINIMUM nonnegative integer among the
    host's ``Crawl-delay:`` lines (min = the most conservative reading of
    conflicting directives; non-numeric values are ignored per the
    de-facto standard's leniency; hosts with no valid directive emit no
    row).

    Vectorized: the parse_robots line explode + one RE2 full-match gate;
    one tiny host-bucketed min fold."""
    import pyarrow.compute as pc

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def fn(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch.column(txt_col), pa.string())
        lines = pc.split_pattern(txt, pattern="\n")
        counts = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        flat = pc.utf8_trim_whitespace(pc.list_flatten(lines))
        # spaces-only interior padding (the trim removed edge whitespace):
        # keeps the RE2 and SQL patterns character-identical
        val = pc.struct_field(
            pc.extract_regex(flat, r"^Crawl-delay: *(?P<v>[0-9]+) *$"),
            "v")
        keep = pc.is_valid(val)
        hosts = batch.column(host_col).take(pa.array(parent)).filter(keep)
        secs = pc.cast(val.filter(keep), pa.int64())
        return pa.table({"host": pc.cast(hosts, pa.string()),
                         "crawl_delay_s": secs})

    rows = ds.map_batches(fn, batch_format="pyarrow")
    return bucketed_aggregate(
        rows, ["host"], {"crawl_delay_s": ("crawl_delay_s", "min")},
        num_buckets=num_buckets)


def robots_crawl_delay_sql(*, robots_cte: str = "robots",
                           host: str = "host",
                           txt: str = "robots_txt") -> str:
    return f"""
        , cd_lines AS (
            SELECT {host},
                   trim(l.line, ' ' || chr(9) || chr(13)) AS line
            FROM {robots_cte},
                 unnest(string_split({txt}, chr(10))) AS l(line)
        )
        SELECT {host} AS host,
               min(CAST(regexp_extract(
                   line, '^Crawl-delay: *([0-9]+) *$', 1)
                   AS BIGINT))::BIGINT AS crawl_delay_s
        FROM cd_lines
        WHERE regexp_matches(line, '^Crawl-delay: *[0-9]+ *$')
        GROUP BY 1"""


def parse_sitemaps(ds, *, host_col: str = "host",
                   xml_col: str = "sitemap_xml"):
    """sitemap.xml extraction — the crawl-frontier seed feed next to
    :func:`parse_robots`: one output row per ``<url>`` entry —
    ``(host, loc, lastmod)`` with ``lastmod`` null when the entry omits
    it.  Entries without a ``<loc>`` are dropped (they are invalid per
    the sitemaps.org protocol).

    Vectorized explode: one Arrow ``split_pattern`` on the ``<url>``
    entry delimiter per batch (each fragment then holds at most one
    loc/lastmod pair), two RE2 ``extract_regex`` calls over the flat
    fragment array — no per-row Python, no XML library (the protocol's
    element grammar is regular at this granularity). Zero shuffle."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        xml = pc.cast(batch.column(xml_col), pa.large_string())
        segs = pc.split_pattern(xml, pattern="<url>")
        counts = pc.list_value_length(segs).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        flat = pc.list_flatten(segs)
        loc = pc.struct_field(
            pc.extract_regex(flat, r"<loc>(?P<v>[^<]*)</loc>"), "v")
        lastmod = pc.struct_field(
            pc.extract_regex(flat, r"<lastmod>(?P<v>[^<]*)</lastmod>"),
            "v")
        keep = pc.is_valid(loc)
        hosts = batch.column(host_col).take(pa.array(parent))
        return pa.table({
            "host": pc.cast(hosts.filter(keep), pa.string()),
            "loc": pc.cast(loc.filter(keep), pa.string()),
            "lastmod": pc.cast(lastmod.filter(keep), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def parse_sitemaps_sql(*, sitemaps_cte: str = "sitemaps",
                       host: str = "host",
                       xml: str = "sitemap_xml") -> str:
    """SQL mirror (composes after a WITH preamble providing the sitemap
    table): <url> split + regexp_extract — identical fragment algebra
    (DuckDB's '' no-match sentinel is NULLIFed to match Arrow's null)."""
    return f"""
        , sm_frags AS (
            SELECT {host}, f.frag
            FROM {sitemaps_cte},
                 unnest(string_split({xml}, '<url>')) AS f(frag)
        )
        SELECT {host} AS host,
               regexp_extract(frag, '<loc>([^<]*)</loc>', 1) AS loc,
               nullif(regexp_extract(frag, '<lastmod>([^<]*)</lastmod>', 1),
                      '') AS lastmod
        FROM sm_frags
        WHERE regexp_matches(frag, '<loc>[^<]*</loc>')"""


def sitemap_coverage(listed, crawled, *, host_col: str = "host",
                     loc_col: str = "loc", url_col: str = "url",
                     num_buckets: int = 16):
    """Sitemap-vs-crawl coverage per host — the OTHER direction of
    :func:`~htrc_feature_reader_ray.stages.linkgraph.link_resolution_rate`'s
    dead-link audit: the site TELLS the crawler what exists
    (sitemaps.org's whole purpose); every listed url the crawl lacks is
    declared-but-missed inventory, the first place a coverage SLA
    conversation goes. Output per host: ``(host, n_listed, n_crawled,
    coverage_ppm)`` over DISTINCT listed locs, with
    ``coverage_ppm = n_crawled·10⁶ // n_listed``.

    Inputs: ``listed`` = a ``(host, loc)`` table (the
    :func:`parse_sitemaps` output); ``crawled`` = any dataset with the
    crawl's ``url`` column (pages). Scale shape: ONE url-keyed tag-union
    co-partition (crawl rows ride ``is_crawl=1`` into the loc's bucket —
    membership is decided where the key lives, no join materializes),
    listed rows dedup in-bucket (all copies of a loc share its bucket,
    so the distinct is global), collapse to (host, n, n_crawled)
    partials, one audit-sized host fold.
    """
    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def as_listed(t: pa.Table) -> pa.Table:
        d = t.select([host_col, loc_col]).group_by(
            [host_col, loc_col]).aggregate([])
        return pa.table({
            "key": d.column(loc_col).cast(pa.string()),
            "h": d.column(host_col).cast(pa.string()),
            "is_crawl": pa.array(np.zeros(len(d), dtype=np.int64)),
        })

    def as_crawl(t: pa.Table) -> pa.Table:
        d = t.select([url_col]).group_by([url_col]).aggregate([])
        return pa.table({
            "key": d.column(url_col).cast(pa.string()),
            "h": pa.array([""] * len(d), type=pa.string()),
            "is_crawl": pa.array(np.ones(len(d), dtype=np.int64)),
        })

    tagged = listed.map_batches(as_listed, batch_format="pyarrow").union(
        crawled.map_batches(as_crawl, batch_format="pyarrow"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        crawl = set(df.loc[df["is_crawl"] == 1, "key"])
        d = df.loc[df["is_crawl"] == 0, ["h", "key"]].drop_duplicates()
        if not len(d):
            return pd.DataFrame({"h": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "n_crawled": pd.Series([], dtype="int64")})
        d = d.assign(hit=d["key"].isin(crawl).astype("int64"))
        out = d.groupby("h", sort=False, as_index=False).agg(
            n=("key", "size"), n_crawled=("hit", "sum"))
        out["n"] = out["n"].astype("int64")
        out["n_crawled"] = out["n_crawled"].astype("int64")
        return out

    partials = bucketed_map_groups(tagged, "key", per_bucket,
                                   num_buckets=num_buckets)
    folded = bucketed_aggregate(
        partials, ["h"], {"n": ("n", "sum"),
                          "n_crawled": ("n_crawled", "sum")},
        num_buckets=max(4, num_buckets // 4), bucket_key="h")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype("int64")
        nc = df["n_crawled"].astype("int64")
        return pd.DataFrame({
            "host": df["h"],
            "n_listed": n,
            "n_crawled": nc,
            "coverage_ppm": (nc * 1_000_000 // n).astype("int64"),
        })

    return folded.map_batches(finish, batch_format="pandas")


def sitemap_coverage_sql(*, listed_expr: str, crawled_expr: str) -> str:
    """SQL mirror over a listed ``(host, loc)`` expression and a crawled
    ``(url)`` expression: distinct locs, IN-membership, floor ppm."""
    return f"""
        WITH dl AS (SELECT DISTINCT host, loc FROM {listed_expr}),
        cr AS (SELECT DISTINCT url FROM {crawled_expr})
        SELECT host, count(*)::BIGINT AS n_listed,
               count(*) FILTER (WHERE loc IN (SELECT url FROM cr))::BIGINT
                   AS n_crawled,
               (count(*) FILTER (WHERE loc IN (SELECT url FROM cr))::HUGEINT
                * 1000000 // count(*))::BIGINT AS coverage_ppm
        FROM dl GROUP BY 1"""


def host_url_churn(pages, *, url_col: str = "url", ts_col: str = "warc_ts",
                   num_buckets: int = 16):
    """Per (host, day) crawl churn: (n_fetches, n_new_urls,
    n_revisit_fetches) — fetch volume, urls whose FIRST-EVER fetch day is
    that day, and fetches of urls first seen on an earlier day (fetches on
    the discovery day itself are not revisits; day granularity by
    contract). The crawl-scheduler freshness signal: a host whose churn is
    all revisits wants slower recrawl than one still surfacing new urls.

    Shape: ONE url-bucketed pass (a url's whole history shares its bucket)
    computes per-(url, day) counts and the url's first day, collapses to
    (host, day) partials BEFORE leaving the bucket, then one tiny
    host-day fold."""
    from htrc_feature_reader_ray.stages.partition import (
        bucketed_aggregate,
        bucketed_map_groups,
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df[url_col].astype(str)
        rest = s.str.split("://", n=1, regex=False).str[-1]
        host = rest.str.split("/", n=1, regex=False).str[0].str.lower()
        day = df[ts_col].astype("datetime64[us]").dt.floor("D")
        fd = pd.DataFrame({"host": host, "url": s, "day": day}).groupby(
            ["host", "url", "day"], sort=False, as_index=False).agg(
            n=("day", "size"))
        fd["d0"] = fd.groupby("url", sort=False)["day"].transform("min")
        fd["new_u"] = (fd["day"] == fd["d0"]).astype("int64")
        fd["revis"] = np.where(fd["day"] > fd["d0"], fd["n"], 0)
        out = fd.groupby(["host", "day"], sort=False, as_index=False).agg(
            n_fetches=("n", "sum"), n_new_urls=("new_u", "sum"),
            n_revisit_fetches=("revis", "sum"))
        for c in ("n_fetches", "n_new_urls", "n_revisit_fetches"):
            out[c] = out[c].astype("int64")
        return out

    partials = bucketed_map_groups(pages, url_col, per_bucket,
                                   num_buckets=num_buckets)
    folded = bucketed_aggregate(
        partials, ["host", "day"],
        {"n_fetches": ("n_fetches", "sum"),
         "n_new_urls": ("n_new_urls", "sum"),
         "n_revisit_fetches": ("n_revisit_fetches", "sum")},
        num_buckets=4)

    def fix_dtypes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["day"].astype("datetime64[us]")
        return df

    return folded.map_batches(fix_dtypes, batch_format="pandas")


def host_url_churn_sql(*, pages_cte: str = "pages") -> str:
    """SQL fragment appended to the pages CTE: identical day/first-day
    churn definitions."""
    return f""",
        fch AS (SELECT url, date_trunc('day', warc_ts) AS day
                FROM {pages_cte}),
        fdc AS (SELECT url, day, count(*)::BIGINT AS n
                FROM fch GROUP BY 1, 2),
        fuc AS (SELECT url, min(day) AS d0 FROM fdc GROUP BY 1),
        jc AS (
          SELECT lower(string_split(
                   string_split(fdc.url, '://')[2], '/')[1]) AS host,
                 fdc.day, fdc.n, fuc.d0
          FROM fdc JOIN fuc USING (url)
        )
        SELECT host, day, sum(n)::BIGINT AS n_fetches,
               count(*) FILTER (WHERE day = d0)::BIGINT AS n_new_urls,
               coalesce(sum(n) FILTER (WHERE day > d0), 0)::BIGINT
                 AS n_revisit_fetches
        FROM jc GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# CDX-style crawl index with SURT keys (the web archive's lookup artifact)


def cdx_index(pages, *, url_col: str = "url", ts_col: str = "warc_ts",
              text_col: str = "text"):
    """CDX-style crawl index: one ``(surt, url, warc_ts, digest)`` row per
    capture, range-sorted by ``(surt, warc_ts)`` — the canonical lookup
    artifact of every web archive (Common Crawl's cc-index, IA's CDX
    files): a binary-searchable, host-grouped index where all captures of
    one page sit adjacent and a host's pages are a contiguous key range.

    SURT (Sort-friendly URI Reordering Transform, the public
    webarchive-commons / pywb convention) under EXPLICIT split rules so
    the SQL mirror agrees character-for-character on any input, with no
    URL-library divergence (same posture as ``url_features``):

      1. scheme = everything up to the FIRST ``://`` (dropped; absent →
         nothing dropped),
      2. host:port = up to the first ``/``; the path INCLUDING query and
         fragment is everything from that ``/`` on (no path left → ``/``),
      3. the port is dropped at the first ``:``; the host lowercased,
      4. one leading ``www.`` label is dropped,
      5. key = dot-labels reversed and comma-joined, then ``)`` + path:
         ``https://sub.Example.com:8080/a?b=1`` → ``com,example,sub)/a?b=1``.

    Query-param canonicalization is deliberately NOT applied here —
    :func:`canonicalize_urls` is the canonicalizer; compose it upstream
    when index keys should collapse tracking-param variants.

    ``digest`` = lowercase md5 hex of the capture's extracted text (what
    CDX's content digest is for: revisit detection — identical digest
    under one surt means the recrawl fetched unchanged content), exactly
    DuckDB's ``md5(text)``.

    Scale shape: the per-batch kernel is stateless and vectorized (host
    label reversal runs once per DISTINCT host in the batch — bounded
    support — and is scattered back by inverse index); the page text
    never crosses an exchange (digested map-side, only 4 slim index
    columns leave the batch); then ONE range-partition sort on
    ``(surt, ts)`` — the sort IS the artifact, a CDX index is defined by
    its order. Reference parity: no analog (the reference's id→path
    resolvers, SURVEY §2.1, are the closest shape)."""
    import hashlib

    import ray.data  # noqa: F401  (pages is already a Dataset)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        url = df[url_col].astype(str)
        parts = url.str.partition("://")
        rest = np.where(parts[1].eq("://"), parts[2], url)
        rest = pd.Series(rest, index=df.index, dtype=object)
        hp = rest.str.partition("/")
        path = np.where(hp[1].eq("/"), "/" + hp[2], "/")
        host = hp[0].str.partition(":")[0].str.lower()
        host = host.mask(host.str.startswith("www."), host.str.slice(4))
        uh, inv = np.unique(host.to_numpy(), return_inverse=True)
        rev = np.array(
            [",".join(reversed(h.split("."))) for h in uh], dtype=object
        )
        surt = rev[inv] + ")" + path
        digest = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in df[text_col].astype(str)
        ]
        return pd.DataFrame({
            "surt": surt,
            url_col: url,
            ts_col: df[ts_col].to_numpy(),
            "digest": np.array(digest, dtype=object),
        })

    idx = pages.map_batches(kernel, batch_format="pandas")
    return idx.sort(["surt", ts_col])


def cdx_index_sql(*, pages_pre: str, text_expr: str,
                  url_col: str = "url", ts_col: str = "warc_ts") -> str:
    """SQL mirror: identical first-occurrence split rules (``strpos`` = 1st
    match, as in the engine's ``str.partition``), ``list_reverse`` host
    labels, ``md5(text)``."""
    return f"""
        {pages_pre},
        u AS (
          SELECT {url_col} AS url, {ts_col} AS ts, {text_expr} AS text
          FROM pages
        ),
        r AS (
          SELECT url, ts, text,
                 CASE WHEN strpos(url, '://') > 0
                      THEN substr(url, strpos(url, '://') + 3)
                      ELSE url END AS rest
          FROM u
        ),
        hp AS (
          SELECT url, ts, text,
                 CASE WHEN strpos(rest, '/') > 0
                      THEN substr(rest, 1, strpos(rest, '/') - 1)
                      ELSE rest END AS hostport,
                 CASE WHEN strpos(rest, '/') > 0
                      THEN substr(rest, strpos(rest, '/'))
                      ELSE '/' END AS path
          FROM r
        ),
        h AS (
          SELECT url, ts, text, path,
                 lower(CASE WHEN strpos(hostport, ':') > 0
                            THEN substr(hostport, 1,
                                        strpos(hostport, ':') - 1)
                            ELSE hostport END) AS host0
          FROM hp
        ),
        s AS (
          SELECT url, ts, text, path,
                 CASE WHEN starts_with(host0, 'www.')
                      THEN substr(host0, 5) ELSE host0 END AS host
          FROM h
        )
        SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
                   || ')' || path AS surt,
               url AS {url_col}, ts AS {ts_col}, md5(text) AS digest
        FROM s
        ORDER BY 1, 3"""


# ---------------------------------------------------------------------------
# hierarchical directory rollup (which subtrees hold the crawl's mass)


def path_rollup(ds, *, url_col: str = "url", num_buckets: int = 16):
    """Hierarchical directory rollup: every url contributes one count to
    EACH ancestor directory of its path — ``(host, dir, n_pages)`` with
    ``dir`` always '/'-terminated — the crawl-analytics artifact that
    answers "which subtree holds the mass" (site-section budgeting,
    sitemap inference, boilerplate-section detection: a /tag/ subtree
    with 80% of a host's pages is a faceted-navigation trap the frontier
    should down-prioritize; compose with :func:`url_templates`, which
    clusters LEAF shapes, where this rolls up ANCESTOR mass).

    Split rules are :func:`url_features`'s exactly (first ``://``, first
    ``/``, port at first ``:``, query/fragment cut at first ``?`` / ``#``;
    urls are scheme'd by that shared contract). A path with k slashes
    yields its k ancestors: ``/doc/123`` → ``/`` and ``/doc/`` (the leaf
    itself is not a directory); a bare authority with no path yields
    nothing.

    Scale shape: the ancestor explode is a LEVEL loop — one vectorized
    ``str.partition`` pass per path depth level, every row at that depth
    handled at once (html_tables' explode posture; no per-row Python) —
    then per-batch (host, dir) Arrow count partials collapse the explode
    map-side before ONE host-bucketed fold, so the exchange carries
    counted prefixes, not per-page rows, and a host's whole subtree
    finishes in one bucket."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].astype(str)
        rest = u.str.partition("://")[2]
        hp = rest.str.partition("/")
        host = hp[0].str.partition(":")[0].str.lower()
        pathqf = hp[1] + hp[2]
        path = pathqf.str.partition("?")[0].str.partition("#")[0]
        hosts, dirs = [], []
        prefix = pd.Series("", index=df.index, dtype=object)
        remainder = path
        while True:
            sp = remainder.str.partition("/")
            has = sp[1].eq("/")
            if not has.any():
                break
            prefix = (prefix + sp[0] + "/").where(has, prefix)
            hosts.append(host[has].to_numpy())
            dirs.append(prefix[has].to_numpy())
            remainder = sp[2].where(has, "")
        if not hosts:
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "dir": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        flat = pd.DataFrame({
            "host": np.concatenate(hosts),
            "dir": np.concatenate(dirs),
        })
        return flat.groupby(["host", "dir"], as_index=False).agg(
            n=("dir", "size"))

    partials = ds.map_batches(fn, batch_format="pandas")
    out = bucketed_aggregate(partials, ["host", "dir"], {"n": ("n", "sum")},
                             num_buckets=num_buckets, bucket_key="host")
    return out.map_batches(
        lambda df: df.rename(columns={"n": "n_pages"}),
        batch_format="pandas")


def path_rollup_sql(*, src_sql: str, url: str = "url") -> str:
    """SQL mirror: url_features' split expressions, then a lateral
    ``generate_series(1, n_slashes)`` ancestor explode where
    ``dir_k = array_to_string(list_slice(parts, 1, k), '/') || '/'``."""
    rest = f"split_part({url}, '://', 2)"
    hostport = f"split_part({rest}, '/', 1)"
    pathqf = (f"CASE WHEN length({rest}) > length({hostport})"
              f" THEN substr({rest}, length({hostport}) + 1) ELSE '' END")
    path = f"split_part(split_part({pathqf}, '?', 1), '#', 1)"
    return f"""
        WITH src AS ({src_sql}),
        p AS (
          SELECT lower(split_part({hostport}, ':', 1)) AS host,
                 string_split({path}, '/') AS parts
          FROM src
        ),
        e AS (
          SELECT host,
                 array_to_string(list_slice(parts, 1, t.k), '/') || '/'
                     AS dir
          FROM p, unnest(generate_series(1, len(parts) - 1)) AS t(k)
        )
        SELECT host, dir, count(*)::BIGINT AS n_pages
        FROM e GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# crawl-politeness violation audit (observed gaps vs Crawl-delay)


def politeness_audit(pages, delays: pd.DataFrame, *, url_col: str = "url",
                     ts_col: str = "warc_ts", host_col: str = "host",
                     delay_col: str = "crawl_delay_s",
                     num_buckets: int = 16):
    """Crawl-politeness compliance audit: per host, how many consecutive
    fetch gaps violated the host's robots ``Crawl-delay`` — the check a
    crawler ops team runs on its own logs before a webmaster does it
    for them (each violation is a ban risk; the rate is the scheduler
    bug signal). Consumes :func:`robots_crawl_delay`'s output as the
    ``delays`` side. Per host: ``n_fetches``, ``n_gaps``,
    ``n_violations`` (gap strictly below ``delay·10⁶`` µs between
    CONSECUTIVE fetches in ``(ts, url)`` order — same-timestamp pairs
    count, they are the worst violation), ``violation_ppm``. Hosts with
    no Crawl-delay directive are excluded (nothing to violate —
    documented).

    Scale shape: host derived map-side via the url_features split rules
    and the page payload dropped before ONE host-bucketed exchange of
    (host, ts, url) rows; inside each bucket one mergesort + a shifted
    vectorized gap compare against the broadcast delay map; the delay
    table is audit-sized (hosts with directives) and broadcasts via the
    map closure."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    dmap = {h: int(d) * 1_000_000
            for h, d in zip(delays[host_col], delays[delay_col])}

    def project(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].astype(str)
        rest = u.str.partition("://")[2]
        host = (rest.str.partition("/")[0]
                .str.partition(":")[0].str.lower())
        out = pd.DataFrame({"host": host.to_numpy(),
                            "ts": df[ts_col].to_numpy(),
                            "url": u.to_numpy()})
        return out[out["host"].isin(dmap.keys())]

    rows = pages.map_batches(project, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "n_fetches": pd.Series([], dtype="int64"),
                "n_gaps": pd.Series([], dtype="int64"),
                "n_violations": pd.Series([], dtype="int64"),
                "violation_ppm": pd.Series([], dtype="int64")})
        df = df.sort_values(["host", "ts", "url"], kind="mergesort")
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.concatenate(
            [[False], df["host"].to_numpy()[1:]
             == df["host"].to_numpy()[:-1]])
        gap = np.concatenate([[0], t[1:] - t[:-1]])
        lim = df["host"].map(dmap).to_numpy().astype(np.int64)
        viol = same & (gap < lim)
        out = pd.DataFrame({"host": df["host"].to_numpy(),
                            "g": same.astype(np.int64),
                            "v": viol.astype(np.int64)})
        agg = out.groupby("host", as_index=False).agg(
            n_fetches=("g", "size"), n_gaps=("g", "sum"),
            n_violations=("v", "sum"))
        agg["violation_ppm"] = np.array(
            [int(v) * 1_000_000 // max(int(g), 1)
             for v, g in zip(agg["n_violations"], agg["n_gaps"])],
            dtype=np.int64)
        for c in ("n_fetches", "n_gaps", "n_violations"):
            agg[c] = agg[c].astype("int64")
        return agg

    return bucketed_map_groups(rows, "host", per_bucket,
                               num_buckets=num_buckets)


def politeness_audit_sql(*, pages_pre: str, delays_sql: str,
                         url_col: str = "url",
                         ts_col: str = "warc_ts") -> str:
    """SQL mirror: host projection via the shared split rules, lag window
    over (host ORDER BY ts, url), strict-below compare."""
    rest = f"split_part({url_col}, '://', 2)"
    host = f"lower(split_part(split_part({rest}, '/', 1), ':', 1))"
    return f"""
        {pages_pre},
        delays AS ({delays_sql}),
        f AS (
          SELECT {host} AS host, {ts_col} AS ts, {url_col} AS url
          FROM pages
        ),
        j AS (
          SELECT f.host, f.ts, f.url,
                 delays.crawl_delay_s * 1000000 AS lim,
                 epoch_us(f.ts) - lag(epoch_us(f.ts)) OVER (
                   PARTITION BY f.host ORDER BY f.ts, f.url) AS gap
          FROM f JOIN delays ON delays.host = f.host
        )
        SELECT host, count(*)::BIGINT AS n_fetches,
               count(gap)::BIGINT AS n_gaps,
               count(*) FILTER (WHERE gap < lim)::BIGINT AS n_violations,
               (count(*) FILTER (WHERE gap < lim)::HUGEINT * 1000000
                // greatest(count(gap), 1))::BIGINT AS violation_ppm
        FROM j GROUP BY 1 ORDER BY 1"""


# Two-level public suffixes the registered-domain rule must not split —
# a pinned, documented subset of the Mozilla Public Suffix List covering
# the common ccTLD second-level registries (the full PSL is a data file a
# production deployment broadcasts the same way; the CONTRACT — longest
# matching suffix, then one more label — is what the operator pins).
PSL2 = (
    "ac.jp", "ac.uk", "co.il", "co.in", "co.jp", "co.kr", "co.nz",
    "co.uk", "co.za", "com.ar", "com.au", "com.br", "com.cn", "com.mx",
    "com.sg", "com.tr", "com.tw", "edu.au", "gov.au", "gov.uk", "ne.jp",
    "net.au", "or.jp", "org.au", "org.uk",
)


def registered_domain(ds, *, host_col: str = "host",
                      out_col: str = "site"):
    """eTLD+1 / registered-domain projection — the SITE grouping key every
    crawl policy actually wants where raw ``host`` over-splits
    (``news.bbc.co.uk`` and ``www.bbc.co.uk`` are one site, one robots
    owner, one dedup/blocklist/host-cap unit) and a naive last-two-labels
    rule corrupts ccTLD registries (``bbc.co.uk`` would become ``co.uk``,
    merging every UK company into one key — the classic crawler bug the
    Public Suffix List exists to prevent).

    Contract (vectorized, zero-shuffle, SQL-replayable): if the host's
    last TWO labels form a suffix in the pinned :data:`PSL2` table, the
    site is the last THREE labels; otherwise the last two; hosts with too
    few labels (bare TLDs, intranet names, IP-ish strings) pass through
    unchanged. Matching is on the lowercased host (the
    :func:`url_features` host convention feeds this directly).

    Scale shape: one stateless ``map_batches`` — two anchored RE2
    extracts + one membership test against the broadcast-by-closure
    suffix tuple; no exchange. Adds ``out_col`` to the row."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = df[host_col].astype(str).str.lower()
        last2 = h.str.extract(r"([^.]+\.[^.]+)$", expand=False)
        last3 = h.str.extract(r"([^.]+\.[^.]+\.[^.]+)$", expand=False)
        site = np.where(
            last2.isin(PSL2) & last3.notna(), last3,
            np.where(last2.notna(), last2, h))
        out = df.copy()
        out[out_col] = site
        return out

    return ds.map_batches(fn, batch_format="pandas")


def registered_domain_sql(*, host: str = "host") -> str:
    """Column expression mirroring :func:`registered_domain` — same
    anchored extracts, same literal suffix list."""
    in_list = ", ".join(f"'{s}'" for s in PSL2)
    l2 = f"regexp_extract(lower({host}), '([^.]+\\.[^.]+)$', 1)"
    l3 = f"regexp_extract(lower({host}), '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    return f"""CASE
        WHEN {l2} IN ({in_list}) AND {l3} != '' THEN {l3}
        WHEN {l2} != '' THEN {l2}
        ELSE lower({host}) END"""


def jain_fairness(ds, *, key_col: str, num_buckets: int = 16):
    """Jain's fairness index over per-key row counts — the canonical
    allocation-fairness readout (Jain, Chiu & Hawe, DEC-TR-301 1984):
    ``J = (Σx)² / (n·Σx²)`` over the per-key share x, = 1 when every
    key gets an equal share and → 1/n when one key takes everything.
    Beside :func:`host_stats`' raw counts and the Gini/Pareto family
    (inequality of the WHOLE distribution) J answers the scheduler's
    question directly: "what fraction of keys are effectively being
    served" (J·n is the classic effective-user count) — the
    crawl-budget fairness gate a politeness-aware frontier runs per
    cycle.

    Exact integer: ``jain_ppm = S²·10⁶ // (n·Q)`` with S = Σ counts,
    Q = Σ counts² — one nonnegative floor; ``effective_keys =
    S²·// Q`` rides along (floor of J·n). Empty input reports the
    typed zero row.

    Scale shape: ONE key-bucketed count fold (hot keys collapse in the
    per-batch Arrow partial), then per-batch (n, S, Q) scalar partials
    + native sum — the driver sees three scalars. S² passes int64 to
    ~3·10⁹ rows; the mirror is HUGEINT (documented). Output one row
    ``(n_keys, n_rows, jain_ppm, effective_keys)``."""
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key_col]).group_by([key_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([key_col, "c"])

    folded = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col], {"c": ("c", "sum")}, num_buckets=num_buckets)

    def scalars(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy().astype(object)
        return pd.DataFrame({
            "n": [int(len(df))], "s": [int(c.sum())],
            "q": [int((c * c).sum())],
        })

    agg = folded.map_batches(scalars, batch_format="pandas").sum(
        ["n", "s", "q"])
    n = int(agg["sum(n)"] or 0)
    s = int(agg["sum(s)"] or 0)
    q = int(agg["sum(q)"] or 0)
    jain = s * s * 1_000_000 // (n * q) if n > 0 and q > 0 else 0
    eff = s * s // q if q > 0 else 0
    out = pd.DataFrame({
        "n_keys": [n], "n_rows": [s],
        "jain_ppm": [jain], "effective_keys": [eff],
    }).astype("int64")
    return ray.data.from_pandas(out)


def jain_fairness_sql(*, from_clause: str, key_expr: str) -> str:
    """SQL mirror fragment (composes after a WITH preamble, e.g.
    PAGES_PRE): per-key count fold + the identical one-floor HUGEINT
    algebra."""
    return f"""
        , c AS (
          SELECT {key_expr} AS k, count(*)::HUGEINT AS c
          FROM {from_clause} GROUP BY 1
        ),
        a AS (
          SELECT count(*)::HUGEINT AS n,
                 coalesce(sum(c), 0)::HUGEINT AS s,
                 coalesce(sum(c * c), 0)::HUGEINT AS q
          FROM c
        )
        SELECT n::BIGINT AS n_keys, s::BIGINT AS n_rows,
               CASE WHEN n > 0 AND q > 0
                    THEN (s * s * 1000000 // (n * q))::BIGINT
                    ELSE 0 END AS jain_ppm,
               CASE WHEN q > 0 THEN (s * s // q)::BIGINT
                    ELSE 0 END AS effective_keys
        FROM a"""
