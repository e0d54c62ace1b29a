"""URL hygiene ops: canonicalization, robots prefix filter, host rollup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.stages.urltools import (
    canonicalize_batch,
    canonicalize_urls,
    crawl_schedule,
    host_stats,
    robots_filter,
)


def test_canonicalize_batch_cases():
    got = canonicalize_batch(pd.Series([
        "HTTPS://WWW.Example.COM:443/A/b?utm_source=x&b=2&a=1#frag",
        "http://example.com:80/",
        "http://example.com:8080/x",          # non-default port kept
        "https://example.com",                # empty path -> '/'
        "https://example.com/p?fbclid=1",     # all params tracking -> no '?'
        "https://example.com/p?b=2&a=1&a=0",  # sort by (key, value)
        "relative/path#f",                    # schemeless: untouched
        "https://example.com/p?",             # empty query -> dropped
    ]))
    want = [
        "https://www.example.com/A/b?a=1&b=2",
        "http://example.com/",
        "http://example.com:8080/x",
        "https://example.com/",
        "https://example.com/p",
        "https://example.com/p?a=0&a=1&b=2",
        "relative/path#f",
        "https://example.com/p",
    ]
    assert list(got) == want


def test_canonicalize_urls_dataset():
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(
            ["https://A.com:443/x?utm_a=1&k=v#z"], type=pa.string()
        ),
    }))
    out = canonicalize_urls(ds).to_pandas()
    assert out["canonical_url"].tolist() == ["https://a.com/x?k=v"]
    assert out["url"].tolist() == ["https://A.com:443/x?utm_a=1&k=v#z"]


def test_robots_filter_rules():
    rules = pd.DataFrame([
        {"host": "a.com", "disallow": "/private/"},
        {"host": "a.com", "disallow": "/tmp"},
        {"host": "b.com", "disallow": "/"},
    ])
    ds = ray.data.from_arrow(pa.table({"url": pa.array([
        "https://a.com/private/x",   # denied (rule 1)
        "https://a.com/tmpfile",     # denied (prefix, not directory, match)
        "https://a.com/public",      # allowed
        "https://A.COM/private/y",   # host matching is case-insensitive
        "https://b.com/anything",    # denied (whole host)
        "https://c.com/private/x",   # allowed (no rules for host)
    ], type=pa.string())}))
    out = robots_filter(ds, rules).to_pandas()
    assert out["allowed"].tolist() == [False, False, True, False, False, True]
    kept = robots_filter(ds, rules, keep_denied=False).to_pandas()
    assert kept["url"].tolist() == [
        "https://a.com/public", "https://c.com/private/x",
    ]


def test_crawl_schedule_gaps():
    us = 1_000_000
    rows = [  # u1: fetches at 0s, 10s, 70s -> gaps 10s, 60s; u2: single
        ("u1", 0), ("u1", 10 * us), ("u1", 70 * us), ("u2", 5 * us),
    ]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], type=pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
    }))
    got = (
        crawl_schedule(ds, num_buckets=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got["n_snapshots"].tolist() == [3, 1]
    assert got["max_gap_us"].tolist() == [60 * us, 0]
    assert got["mean_gap_us"].tolist() == [35 * us, 0]  # 70s span // 2
    assert got["first_ts"].astype("int64").tolist() == [0, 5 * us]
    assert got["last_ts"].astype("int64").tolist() == [70 * us, 5 * us]
    assert got["max_gap_us"].dtype == np.int64


def test_host_stats_rollup():
    rows = [
        # (url, lang, text) — a.com: 3 snapshots over 2 urls, 2 langs
        ("https://a.com/1", "en", "xx"),
        ("https://a.com/1", "en", "xxx"),
        ("https://a.com/2", "de", "x"),
        ("https://b.com/1", "en", "yyyy"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], type=pa.string()),
        "lang": pa.array([r[1] for r in rows], type=pa.string()),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
    }))
    got = (
        host_stats(ds, num_buckets=4)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({
        "host": ["a.com", "b.com"],
        "n_snapshots": np.array([3, 1], dtype=np.int64),
        "n_urls": np.array([2, 1], dtype=np.int64),
        "n_langs": np.array([2, 1], dtype=np.int64),
        "sum_chars": np.array([6, 4], dtype=np.int64),
    })
    pd.testing.assert_frame_equal(got, want)


def test_mirror_hosts_shared_prefix_and_cap():
    from htrc_feature_reader_ray.stages.urltools import mirror_hosts

    # a/b share two 2-token prefixes; c shares one with a; "x y" appears on
    # ALL four hosts -> dropped by max_hosts_per_fp=3 (boilerplate cap)
    docs = ray.data.from_pandas(pd.DataFrame({
        "source": ["a", "b", "a", "b", "c", "a", "b", "c", "d"],
        "text": ["p q tail1", "p q tail2", "r s", "r s more",
                 "p q other", "x y", "x y", "x y", "x y"],
    }))
    out = (
        mirror_hosts(docs, prefix_tokens=2, max_hosts_per_fp=3,
                     num_buckets=4)
        .to_pandas().sort_values(["host_a", "host_b"])
        .reset_index(drop=True)
    )
    assert list(zip(out.host_a, out.host_b, out.n_shared)) == [
        ("a", "b", 2), ("a", "c", 1), ("b", "c", 1)]


def test_mirror_hosts_min_shared_threshold():
    from htrc_feature_reader_ray.stages.urltools import mirror_hosts

    docs = ray.data.from_pandas(pd.DataFrame({
        "source": ["a", "b", "a", "b", "c"],
        "text": ["p q", "p q", "r s", "r s", "p q"],
    }))
    out = (
        mirror_hosts(docs, prefix_tokens=2, min_shared=2, num_buckets=4)
        .to_pandas()
    )
    assert list(zip(out.host_a, out.host_b, out.n_shared)) == [("a", "b", 2)]


def test_url_templates_digit_collapse_and_distinct():
    from htrc_feature_reader_ray.stages.urltools import url_templates

    urls = [
        "https://E.com/doc/1",
        "https://e.com/doc/2",         # same template, distinct url
        "https://e.com/doc/1",         # dup url (snapshot) not re-counted
        "https://e.com/cal/2024/01/5",
        "https://e.com/cal/2024/02/6",
        "https://f.com/doc/9",
        "https://f.com/",              # bare path
    ]
    out = (
        url_templates(ray.data.from_pandas(pd.DataFrame({"url": urls})),
                      num_buckets=4)
        .to_pandas().sort_values(["host", "template"])
        .reset_index(drop=True)
    )
    assert list(zip(out.host, out.template, out.n_urls)) == [
        ("e.com", "/cal/N/N/N", 2),
        ("e.com", "/doc/N", 3),
        ("f.com", "/", 1),
        ("f.com", "/doc/N", 1),
    ]


def test_host_lang_mix_dominance_and_ties():
    import ray.data

    from htrc_feature_reader_ray.stages.urltools import host_lang_mix

    df = pd.DataFrame({
        "url": (["https://A.com/x"] * 3 + ["https://a.com/y"] * 2
                + ["https://b.com/1", "https://b.com/2"]),
        # a.com: en=3, de=2 -> top en 600000ppm; b.com: de=1, en=1 tie
        # -> lang-ascending tie-break picks 'de'
        "lang": ["en", "en", "en", "de", "de", "de", "en"],
    })
    out = (host_lang_mix(ray.data.from_pandas(df).repartition(4))
           .to_pandas().sort_values("host").reset_index(drop=True))
    a, b = out.iloc[0], out.iloc[1]
    assert a.host == "a.com" and a.n_pages == 5 and a.n_langs == 2
    assert a.top_lang == "en" and a.top_lang_ppm == 600000
    assert b.host == "b.com" and b.n_pages == 2 and b.n_langs == 2
    assert b.top_lang == "de" and b.top_lang_ppm == 500000


def test_url_features_edge_shapes():
    import ray.data

    from htrc_feature_reader_ray.stages.urltools import url_features

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "url": [
            "https://a.example.com",                    # no path at all
            "http://B.example.com:8080/",               # root path, port
            "https://c.example.com/x//y/?a=1&b=2&c=3",  # empty segment
            "https://d.example.com/p#frag?notquery",    # '#' before '?'
        ],
    })
    out = (url_features(ray.data.from_pandas(df))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.host.tolist() == [
        "a.example.com", "b.example.com", "c.example.com", "d.example.com"]
    assert out.is_https.tolist() == [True, False, True, True]
    assert out.path_depth.tolist() == [0, 0, 2, 1]
    # case 4: the explicit split rules read text after the first '?'
    # as query even when a '#' precedes it — SQL split_part agrees
    assert out.n_params.tolist() == [0, 0, 3, 1]
    assert out.has_fragment.tolist() == [False, False, False, True]


def test_parse_robots_ignores_noise():
    import ray.data

    from htrc_feature_reader_ray.stages.urltools import parse_robots

    df = pd.DataFrame({
        "host": ["h1"],
        "robots_txt": ["User-agent: *\n# c\n\nDisallow: /a\n"
                       "Allow:\t/b\nSitemap: x\nDisallow: /c  "],
    })
    out = (parse_robots(ray.data.from_pandas(df))
           .to_pandas().sort_values("rule_path").reset_index(drop=True))
    assert out.directive.tolist() == ["disallow", "allow", "disallow"]
    assert out.rule_path.tolist() == ["/a", "/b", "/c"]


def test_host_url_churn_hand_fixture():
    import ray.data

    from htrc_feature_reader_ray.stages.urltools import host_url_churn

    T = pd.Timestamp
    rows = [
        ("https://a.com/x", T("2024-01-01 05:00")),  # x discovered d1
        ("https://a.com/x", T("2024-01-01 09:00")),  # same-day refetch
        ("https://a.com/x", T("2024-01-02 05:00")),  # revisit d2
        ("https://a.com/y", T("2024-01-02 06:00")),  # y discovered d2
        ("https://b.com/z", T("2024-01-01 01:00")),  # other host
    ]
    df = pd.DataFrame(rows, columns=["url", "warc_ts"])
    got = (
        host_url_churn(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index(["host", got_day := "day"]).sort_index()
    )
    a1 = got.loc[("a.com", pd.Timestamp("2024-01-01"))]
    assert tuple(a1) == (2, 1, 0)  # both d1 fetches are discovery-day
    a2 = got.loc[("a.com", pd.Timestamp("2024-01-02"))]
    assert tuple(a2) == (2, 1, 1)  # y new + x revisit
    b1 = got.loc[("b.com", pd.Timestamp("2024-01-01"))]
    assert tuple(b1) == (1, 1, 0)


def test_parse_sitemaps_hand_fixture():
    import duckdb

    from htrc_feature_reader_ray.stages.urltools import (
        parse_sitemaps,
        parse_sitemaps_sql,
    )

    xml_a = ('<?xml version="1.0"?><urlset>'
             '<url><loc>https://a.com/x</loc>'
             '<lastmod>2024-05-01</lastmod></url>'
             '<url><loc>https://a.com/y</loc></url>'
             '<url><lastmod>2024-05-02</lastmod></url>'  # no loc: dropped
             '</urlset>')
    df = pd.DataFrame({"host": ["a.com", "b.com"],
                       "sitemap_xml": [xml_a, "<urlset></urlset>"]})
    out = (parse_sitemaps(ray.data.from_pandas(df).repartition(2))
           .to_pandas().sort_values(["host", "loc"]).reset_index(drop=True))
    assert out["loc"].tolist() == ["https://a.com/x", "https://a.com/y"]
    assert out["lastmod"].tolist()[0] == "2024-05-01"
    assert out["lastmod"].isna().tolist() == [False, True]

    con = duckdb.connect()
    con.register("sm", df)
    sql = (con.execute(
        "WITH sitemaps AS (SELECT * FROM sm)"
        + parse_sitemaps_sql()).df()
        .sort_values(["host", "loc"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)


def test_robots_crawl_delay_min_and_leniency():
    import duckdb

    from htrc_feature_reader_ray.stages.urltools import (
        robots_crawl_delay,
        robots_crawl_delay_sql,
    )

    df = pd.DataFrame({
        "host": ["a.com", "b.com", "c.com"],
        "robots_txt": [
            "User-agent: *\nCrawl-delay: 10\nCrawl-delay:  3\nAllow: /",
            "Crawl-delay: x\nCrawl-delay: 7s",   # no valid directive
            "  Crawl-delay: 5  \nDisallow: /p",  # edge whitespace trimmed
        ],
    })
    out = (robots_crawl_delay(ray.data.from_pandas(df).repartition(2))
           .to_pandas().sort_values("host").reset_index(drop=True))
    assert out["host"].tolist() == ["a.com", "c.com"]
    assert out["crawl_delay_s"].tolist() == [3, 5]

    con = duckdb.connect()
    con.register("r", df)
    sql = (con.execute("WITH robots AS (SELECT * FROM r)"
                       + robots_crawl_delay_sql()).df()
           .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)


def test_cdx_index_surt_branches_and_digest():
    import hashlib

    from htrc_feature_reader_ray.stages.urltools import cdx_index

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "url": [
            "https://sub.Example.COM:8080/a/b?x=1#f",  # port+case+query
            "http://www.example.com/",                 # www strip, bare /
            "example.com",                             # no scheme, no path
            "https://one.two.three.org/deep",          # 4-label reverse
        ],
        "warc_ts": [t0, t0, t0, t0],
        "text": ["alpha", "beta", "gamma", "delta"],
    })
    out = cdx_index(ray.data.from_pandas(df)).to_pandas()
    got = dict(zip(out["url"], out["surt"]))
    assert got["https://sub.Example.COM:8080/a/b?x=1#f"] == \
        "com,example,sub)/a/b?x=1#f"
    assert got["http://www.example.com/"] == "com,example)/"
    assert got["example.com"] == "com,example)/"
    assert got["https://one.two.three.org/deep"] == "org,three,two,one)/deep"
    dig = dict(zip(out["url"], out["digest"]))
    assert dig["example.com"] == hashlib.md5(b"gamma").hexdigest()


def test_cdx_index_sorted_and_groups_captures():
    from htrc_feature_reader_ray.stages.urltools import cdx_index

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for d in range(20):
        for s in range(1 + d % 3):
            rows.append((f"https://h{d % 5}.example.com/doc/{d}",
                         t0 + pd.Timedelta(hours=s), f"text {d} {s}"))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
    out = cdx_index(
        ray.data.from_pandas(df).repartition(6)).to_pandas()
    assert len(out) == len(df)
    # global order: (surt, ts) non-decreasing
    key = list(zip(out["surt"], out["warc_ts"]))
    assert key == sorted(key)
    # all captures of one url adjacent under one surt
    assert out.groupby("surt")["url"].nunique().max() == 1


def test_path_rollup_ancestor_counts():
    from htrc_feature_reader_ray.stages.urltools import path_rollup

    df = pd.DataFrame({"url": [
        "https://a.com/blog/2024/post-1?q=1",
        "https://a.com/blog/2024/post-2#frag",
        "https://a.com/blog/about",
        "https://a.com/shop/item",
        "https://A.com:8080/",          # bare dir, port+case
        "https://b.com",                # no path at all -> contributes 0
    ]})
    out = path_rollup(ray.data.from_pandas(df).repartition(3)).to_pandas()
    got = {(h, d): n for h, d, n in
           zip(out["host"], out["dir"], out["n_pages"])}
    assert got[("a.com", "/")] == 5
    assert got[("a.com", "/blog/")] == 3
    assert got[("a.com", "/blog/2024/")] == 2
    assert got[("a.com", "/shop/")] == 1
    assert ("a.com", "/blog/2024/post-1") not in got  # leaves excluded
    assert not any(h == "b.com" for h, _ in got)
    # every dir '/'-terminated
    assert out["dir"].str.endswith("/").all()


def test_politeness_audit_gap_semantics():
    from htrc_feature_reader_ray.stages.urltools import politeness_audit

    t0 = pd.Timestamp("2024-01-01")
    delays = pd.DataFrame({"host": ["a.com", "b.com"],
                           "crawl_delay_s": [5, 2]})
    df = pd.DataFrame({
        "url": ["https://a.com/1", "https://a.com/2", "https://a.com/3",
                "https://A.com:80/4",         # case/port -> same host
                "https://b.com/1", "https://b.com/2",
                "https://nodirective.com/1"],  # excluded host
        "warc_ts": [t0,
                    t0 + pd.Timedelta(seconds=3),   # gap 3 < 5: violation
                    t0 + pd.Timedelta(seconds=9),   # gap 6: ok
                    t0 + pd.Timedelta(seconds=9),   # gap 0: violation
                    t0, t0 + pd.Timedelta(seconds=2),  # gap 2: ok (not <2)
                    t0],
    })
    out = politeness_audit(
        ray.data.from_pandas(df).repartition(3), delays
    ).to_pandas().set_index("host")
    assert out.loc["a.com", "n_fetches"] == 4
    assert out.loc["a.com", "n_gaps"] == 3
    assert out.loc["a.com", "n_violations"] == 2
    assert out.loc["a.com", "violation_ppm"] == 2 * 1_000_000 // 3
    assert out.loc["b.com", "n_violations"] == 0
    assert "nodirective.com" not in out.index


def test_sitemap_coverage_hand():
    import ray.data

    from htrc_feature_reader_ray.stages.urltools import sitemap_coverage

    listed = ray.data.from_pandas(pd.DataFrame({
        "host": ["a.com", "a.com", "a.com", "b.com", "b.com", "a.com"],
        "loc": ["https://a.com/1", "https://a.com/2", "https://a.com/3",
                "https://b.com/1", "https://b.com/2",
                "https://a.com/1"],  # duplicate listing dedups
    })).repartition(3)
    crawled = ray.data.from_pandas(pd.DataFrame({
        "url": ["https://a.com/1", "https://a.com/2", "https://b.com/9",
                "https://a.com/1"],  # crawl dups don't double-count
    })).repartition(2)
    out = (sitemap_coverage(listed, crawled).to_pandas()
           .sort_values("host").reset_index(drop=True))
    a, b = out.iloc[0], out.iloc[1]
    assert a["host"] == "a.com" and a["n_listed"] == 3
    assert a["n_crawled"] == 2 and a["coverage_ppm"] == 666666
    assert b["host"] == "b.com" and b["n_listed"] == 2
    assert b["n_crawled"] == 0 and b["coverage_ppm"] == 0


def test_registered_domain_psl_rule():
    import ray.data

    from htrc_feature_reader_ray.stages.urltools import registered_domain

    df = pd.DataFrame({"host": [
        "news.bbc.co.uk",        # PSL 2-level suffix -> 3 labels
        "www.bbc.co.uk",         # same site as above
        "BBC.CO.UK",             # case folded; host == registrable
        "a.b.example.com",       # plain TLD -> last 2
        "example.com",
        "localhost",             # no dot -> passthrough
        "sub.shop.com.au",       # PSL -> shop.com.au
        "x.co.jp",
    ]})
    out = registered_domain(
        ray.data.from_pandas(df)).to_pandas()["site"].tolist()
    assert out == [
        "bbc.co.uk", "bbc.co.uk", "bbc.co.uk", "example.com",
        "example.com", "localhost", "shop.com.au", "x.co.jp"]
