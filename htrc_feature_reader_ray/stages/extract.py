"""HTML extraction + token-count explode — the engine's core parse stage.

Reference analog: ``JsonFileHandler.parse`` + ``_make_tokencount_df``
(parsers.py:192-250, 342-382) which explode per-page nested token maps into a
long typed table. Here the input is raw html bytes; the stage is an actor pool
(``map_batches(HtmlExtractor, concurrency=N)``) holding compiled regexes —
state built once per actor (__init__), applied per Arrow batch (__call__).

Invariant (BASELINE.json input_hint): the extracted ``text`` is byte-identical
to the ground-truth ``text`` column of the pages source for every row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from htrc_feature_reader_ray.errors import require_columns
from htrc_feature_reader_ray.functions.tokenize import (
    nonempty_mask,
    pos_tags,
    split_tokens,
)

SECTIONS = ("header", "body", "footer")


class HtmlExtractor:
    """Actor-pool stage: html binary -> header/body/footer zones + text.

    ``__init__`` compiles the zone regex once per actor (the analog of the
    reference's warmed parser state, SURVEY §2.5). ``__call__`` is per-batch.
    Extraction is deterministic: no locale, no dict ordering.

    ``post_fn`` (a module-level Table->Table function) fuses downstream
    per-batch work INTO the actor call — e.g. the token explode + feature
    fold — so the wide intermediate (all extracted text) never crosses the
    object store between stages. This is the engine's main data-movement
    lever: actor-stage output drops from O(corpus text) to O(features).
    """

    # (?s) = DOTALL in RE2; anchored zone order, non-greedy bodies — the
    # same pattern the scalar fallback compiles below
    _ZONE_PATTERN = (
        r"(?s)<header>(?P<header>.*?)</header>"
        r"<main>(?P<body>.*?)</main>"
        r"<footer>(?P<footer>.*?)</footer>"
    )

    def __init__(self, post_fn=None) -> None:
        self._zone_re = re.compile(
            self._ZONE_PATTERN.replace("(?s)", "").encode("utf-8"), re.DOTALL
        )
        self._post_fn = post_fn

    def _extract_scalar(self, html: list) -> dict[str, np.ndarray]:
        """Python-loop fallback (kept as the conformance reference for the
        vectorized kernel; exercised by tests)."""
        n = len(html)
        cols = {
            name: np.empty(n, dtype=object)
            for name in ("header", "body", "footer", "text")
        }
        search = self._zone_re.search
        for i, doc in enumerate(html):
            m = search(doc)
            if m is None:
                cols["header"][i] = cols["body"][i] = cols["footer"][i] = ""
                cols["text"][i] = ""
                continue
            h = m.group("header").decode("utf-8")
            b = m.group("body").decode("utf-8")
            f = m.group("footer").decode("utf-8")
            cols["header"][i] = h
            cols["body"][i] = b
            cols["footer"][i] = f
            cols["text"][i] = h + "\n" + b + "\n" + f
        return cols

    def _extract_find(self, html: list) -> dict[str, np.ndarray]:
        """Production kernel: ordered C-memmem ``bytes.find`` instead of
        regex. PROVABLY equal to the lazy regex: each ``.*?<literal>`` step
        reduces to the first occurrence of the (adjacency-composited) literal
        after the previous anchor, and a find that fails from the earliest
        anchor fails from every later one — so no backtracking case diverges.
        Measured 3x faster than re.search and 2.5x faster than RE2
        pc.extract_regex on fixture pages (see tests for the conformance
        check against _extract_scalar)."""
        n = len(html)
        cols = {
            name: np.empty(n, dtype=object)
            for name in ("header", "body", "footer", "text")
        }
        for i, doc in enumerate(html):
            i0 = doc.find(b"<header>")
            if i0 >= 0:
                i1 = doc.find(b"</header><main>", i0 + 8)
                if i1 >= 0:
                    i2 = doc.find(b"</main><footer>", i1 + 15)
                    if i2 >= 0:
                        i3 = doc.find(b"</footer>", i2 + 15)
                        if i3 >= 0:
                            h = doc[i0 + 8:i1].decode("utf-8")
                            b = doc[i1 + 15:i2].decode("utf-8")
                            f = doc[i2 + 15:i3].decode("utf-8")
                            cols["header"][i] = h
                            cols["body"][i] = b
                            cols["footer"][i] = f
                            cols["text"][i] = h + "\n" + b + "\n" + f
                            continue
            cols["header"][i] = cols["body"][i] = cols["footer"][i] = ""
            cols["text"][i] = ""
        return cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        zones = self._extract_find(html.to_pylist())

        keep = [c for c in batch.column_names if c not in ("html", "text")]
        out = batch.select(keep)
        for name in ("header", "body", "footer", "text"):
            out = out.append_column(
                name, pa.array(zones[name], type=pa.string())
            )
        if self._post_fn is not None:
            out = self._post_fn(out)
        return out


def default_actor_pool():
    """Autoscaling actor-pool size (1, CPUs-2): leaves headroom for the read
    and downstream stages so the pool never starves the pipeline."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus - 2))


# Per-worker-process extractor cache for the task path: Ray reuses worker
# processes across map tasks, so the compiled extractor state amortizes
# exactly like an actor's __init__ — without ActorPoolMapOperator dispatch.
_WARM_EXTRACTORS: dict = {}


def _extract_batch(batch: pa.Table, post_fn=None) -> pa.Table:
    ex = _WARM_EXTRACTORS.get(post_fn)
    if ex is None:
        ex = _WARM_EXTRACTORS[post_fn] = HtmlExtractor(post_fn=post_fn)
    return ex(batch)


def extract_pages(pages_ds, *, concurrency=None, batch_size: int | None = None,
                  post_fn=None, use_actors: bool = False):
    """pages (with html) -> pages with header/body/footer/text columns
    (+ fused ``post_fn``, see HtmlExtractor).

    Two physical strategies for the warmed-extractor stage:
      * tasks (default): stateless map tasks with a per-worker-process
        extractor cache — same warm-state amortization (workers are reused),
        elastic, and crucially FUSES with the upstream pages map so raw html
        never crosses the object store between stages (an actor op is a
        fusion barrier in Ray 2.49). Round-1's "8× slower actors" was this
        fusion/batch-size interaction; re-measured round 2 on
        pre-materialized blocks the actor pool is at parity or slightly
        ahead (1.4 s vs 1.75 s warm on 1M pages, 14 actors) — the task
        default is about keeping the fused pipeline, not actor overhead;
      * ``use_actors=True``: a classic ``map_batches(Cls, concurrency=N)``
        actor pool — the right shape when extractor state is too big for
        every worker (e.g. a model), needs a controlled replica count, or
        the input is already materialized (no fusion to lose).

    Default batch_size is None = whole upstream blocks. Task parallelism is
    governed by the SOURCE's batching (sources/pages.py::fixture_batch_size
    sizes the synth map in pre-expansion doc rows); re-slicing here would
    fragment each expanded block into thousands of tiny batches (measured
    ~16× slowdown). Pass an explicit page-row batch size only when reading a
    pages lake whose blocks are too large for worker heaps.
    """
    import functools

    bs = batch_size
    if use_actors:
        return pages_ds.map_batches(
            HtmlExtractor,
            fn_constructor_kwargs=dict(post_fn=post_fn),
            batch_format="pyarrow",
            batch_size=bs,
            concurrency=concurrency or default_actor_pool(),
        )
    return pages_ds.map_batches(
        functools.partial(_extract_batch, post_fn=post_fn),
        batch_format="pyarrow",
        batch_size=bs,
    )


def sections_long(extracted_ds):
    """Explode extracted pages into the long section table
    ``(url, warc_ts, lang, section, sect_text)`` — 3 rows per snapshot
    (the SECREF explode, parsers.py:315-330 analog). Pure batch op: each
    output group (url, warc_ts) stays inside one batch."""

    def explode(batch: pa.Table) -> pa.Table:
        parts = []
        for sect in SECTIONS:
            t = pa.table(
                {
                    "url": batch.column("url"),
                    "warc_ts": batch.column("warc_ts"),
                    "lang": batch.column("lang"),
                    "section": pa.array([sect] * len(batch), type=pa.string()),
                    "sect_text": batch.column(sect),
                }
            )
            parts.append(t)
        return pa.concat_tables(parts)

    return extracted_ds.map_batches(explode, batch_format="pyarrow")


def token_counts_batch(batch: pa.Table) -> pa.Table:
    """extracted-pages batch (ONE ROW PER SNAPSHOT, header/body/footer
    columns) -> token-count batch, fully vectorized Arrow.

    ``(url, warc_ts, section, token, pos, count)`` — the web analog of the
    reference's ``_make_tokencount_df`` typed explode (parsers.py:342-382),
    done with list-flatten + parent-index take + Arrow group_by instead of a
    Python walk over nested dicts.

    ALIGNMENT GUARANTEE (the structural basis of every shuffle-free fold
    downstream): all sections of a snapshot live in ONE input row, and a
    batch boundary can never split a row — so the per-batch group_by is
    complete for ANY key subset that includes (url, warc_ts).
    """
    flats = []
    for sect in SECTIONS:
        tok_list = split_tokens(batch.column(sect))
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        parent = pc.list_parent_indices(tok_list)
        tokens = pc.list_flatten(tok_list)
        mask = nonempty_mask(tokens)
        tokens = tokens.filter(mask)
        parent = parent.filter(mask)
        flats.append(
            pa.table(
                {
                    "url": batch.column("url").take(parent),
                    "warc_ts": batch.column("warc_ts").take(parent),
                    "section": pa.array(
                        [sect] * len(tokens), type=pa.string()
                    ),
                    "token": tokens,
                }
            )
        )
    flat = pa.concat_tables(flats)
    flat = flat.append_column("pos", pos_tags(flat.column("token")))
    grouped = flat.group_by(
        ["url", "warc_ts", "section", "token", "pos"]
    ).aggregate([([], "count_all")])
    return grouped.rename_columns(
        ["url", "warc_ts", "section", "token", "pos", "count"]
    )


def token_counts(extracted_ds):
    """extracted pages -> long token-count Dataset (see token_counts_batch)."""
    require_columns(
        extracted_ds.schema().names,
        ["url", "warc_ts", *SECTIONS],
        op="token_counts",
    )
    return extracted_ds.map_batches(token_counts_batch, batch_format="pyarrow")


def folded_token_counts(extracted_ds, **fold_kwargs):
    """Fused explode + fold in ONE batch function — the shuffle-free
    tokenlist path.

    Soundness: the batch function's input rows are whole pages, so every
    (url, warc_ts) group it produces is complete within the call; folding to
    any key set that keeps (url, warc_ts) therefore needs NO global merge
    (phase1_complete). Folds that drop url/warc_ts still get the fused
    per-batch combiner, then one small global groupby. This is the fusion the
    reference performs implicitly by being volume-at-a-time
    (feature_reader.py:615-721); Ray re-batches between separate stages, so
    the fusion must be explicit (cf. fold.py docstring)."""
    from htrc_feature_reader_ray.stages.fold import (
        FoldSpec,
        finish_fold,
        phase1_fold,
    )

    require_columns(
        extracted_ds.schema().names,
        ["url", "warc_ts", *SECTIONS],
        op="folded_token_counts",
    )
    tok_cols = ["url", "warc_ts", "section", "token", "pos", "count"]
    spec = FoldSpec(tok_cols, **{
        "entity": fold_kwargs.pop("entity", True),
        "snapshots": fold_kwargs.pop("snapshots", True),
        "section": fold_kwargs.pop("section", "all"),
        "case": fold_kwargs.pop("case", True),
        "pos": fold_kwargs.pop("pos", True),
        "page_freq": fold_kwargs.pop("page_freq", False),
        "snapshot_col": "warc_ts",
        "drop_section": fold_kwargs.pop("drop_section", False),
    })
    if fold_kwargs:
        raise TypeError(f"unknown fold kwargs: {sorted(fold_kwargs)}")

    def fused(batch: pa.Table) -> pa.Table:
        return phase1_fold(token_counts_batch(batch), spec)

    partials = extracted_ds.map_batches(fused, batch_format="pyarrow")
    complete = "url" in spec.phase1_keys and "warc_ts" in spec.phase1_keys
    return finish_fold(partials, spec, phase1_complete=complete)


def section_features(sections_ds):
    """Per-(url, warc_ts, section) scalar features — the analog of the
    reference's ``_make_section_feature_df`` 5-int table (parsers.py:315-330),
    web-generalized: token_count, char_count, distinct_tokens. Shuffle-free
    (sections of one snapshot are batch-local)."""

    def fn(batch: pa.Table) -> pa.Table:
        tok_list = split_tokens(batch.column("sect_text"))
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        parent = pc.list_parent_indices(tok_list)
        tokens = pc.list_flatten(tok_list)
        mask = nonempty_mask(tokens)
        tokens = tokens.filter(mask)
        parent = parent.filter(mask)
        n = len(batch)
        import numpy as np

        counts = np.bincount(parent.to_numpy(), minlength=n).astype("int64")
        # distinct per row: unique (parent, token) pairs, then count per parent
        pairs = (
            pa.table({"p": parent, "t": tokens})
            .group_by(["p", "t"])
            .aggregate([])
        )
        distinct = np.bincount(
            pairs.column("p").to_numpy(), minlength=n
        ).astype("int64")
        out = batch.select(["url", "warc_ts", "section"])
        out = out.append_column("token_count", pa.array(counts, type=pa.int64()))
        out = out.append_column(
            "char_count", pc.utf8_length(batch.column("sect_text")).cast(pa.int64())
        )
        out = out.append_column(
            "distinct_tokens", pa.array(distinct, type=pa.int64())
        )
        return out

    return sections_ds.map_batches(fn, batch_format="pyarrow")


def line_chars(extracted_ds, *, section: str = "all", place: str = "all"):
    """Begin/end line-character counts — the analog of the reference's
    ``_make_line_char_df`` + ``group_linechars`` (parsers.py:384-429,
    feature_reader.py:144-173): each extracted section zone is one text line;
    count first/last characters per snapshot. Output:
    (url, warc_ts[, section][, place], char, count).

    ``section``: 'all' (keep level) | one of header/body/footer (filter) |
    'group' (fold the level out). ``place``: 'all' | 'begin' | 'end' |
    'group'. Consumes extracted pages (one row per snapshot) so per-snapshot
    groups are batch-complete structurally — shuffle-free."""
    import pandas as pd

    if section not in SECTIONS and section not in ("all", "group"):
        raise ValueError(f"invalid section argument: {section!r}")
    if place not in ("begin", "end", "all", "group"):
        raise ValueError(f"invalid place argument: {place!r}")

    keys = ["url", "warc_ts"]
    if section in SECTIONS or section == "all":
        keys.append("section")
    if place in ("begin", "end", "all"):
        keys.append("place")
    keys.append("char")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        sects = [section] if section in SECTIONS else list(SECTIONS)
        places = [place] if place in ("begin", "end") else ["begin", "end"]
        for sect in sects:
            line = df[sect]
            keep = line != ""
            for pl in places:
                sl = line.str[:1] if pl == "begin" else line.str[-1:]
                parts.append(
                    pd.DataFrame(
                        {
                            "url": df.loc[keep, "url"],
                            "warc_ts": df.loc[keep, "warc_ts"],
                            "section": sect,
                            "place": pl,
                            "char": sl[keep],
                        }
                    )
                )
        longf = pd.concat(parts, ignore_index=True)
        out = (
            longf.groupby(keys, sort=False)
            .size()
            .rename("count")
            .reset_index()
        )
        out["count"] = out["count"].astype("int64")
        return out

    return extracted_ds.map_batches(fn, batch_format="pandas")


def tokens_from_pages(sf_dir: str, *, via_html: bool = True, concurrency=None):
    """Convenience composition: pages source -> (extract) -> sections ->
    token counts. ``via_html=True`` runs the production path through the
    actor-pool extractor."""
    from htrc_feature_reader_ray.sources.pages import read_pages

    pages = read_pages(sf_dir, drop_text=via_html)
    if via_html:
        pages = extract_pages(pages, concurrency=concurrency)
    else:
        pages = pages.map_batches(sections_from_text, batch_format="pyarrow")
    return token_counts(pages)


def sections_from_text(batch: pa.Table) -> pa.Table:
    """Trusted-text path: derive the three section columns from the
    ground-truth ``text`` column (header\\nbody\\nfooter)."""
    split = pc.split_pattern(batch.column("text"), pattern="\n")
    out = batch.select(["url", "warc_ts", "lang"])
    for i, sect in enumerate(SECTIONS):
        out = out.append_column(sect, pc.list_element(split, i))
    return out


# ---------------------------------------------------------------------------
# <head> metadata extraction
# ---------------------------------------------------------------------------

# RE2-compatible named-group patterns; each extracts one head field. Kept as
# three single-field patterns (not one combined regex) so a page missing any
# one tag still yields the others — pc.extract_regex nulls the whole struct
# on a non-match.
_HEAD_PATTERNS = {
    "title": r"<title>(?P<title>[^<]*)</title>",
    "description":
        r'<meta name="description" content="(?P<description>[^"]*)"',
    "content_language":
        r'<meta http-equiv="content-language" content="'
        r'(?P<content_language>[^"]*)"',
}


def head_meta_batch(batch: pa.Table, *, html_col: str = "html",
                    keep_cols=("url", "warc_ts")) -> pa.Table:
    """One Arrow batch of pages -> (keep_cols…, title, description,
    content_language). Fully vectorized: one utf-8 cast + one
    ``pc.extract_regex`` (RE2, no backtracking) per field; rows whose html
    lacks a tag get null for that field only.

    Reference analog: the head-of-file metadata block the reference exposes
    via ``Volume.parser.meta`` (parsers.py:206-242) — here the metadata
    lives in the raw html head instead of a JSON sidecar.
    """
    html = batch.column(html_col)
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    # head tags are pure ASCII markup around utf-8 payloads: cast validates
    text = html.cast(pa.string())
    out = batch.select(list(keep_cols))
    for field, pattern in _HEAD_PATTERNS.items():
        extracted = pc.extract_regex(text, pattern)
        out = out.append_column(field, pc.struct_field(extracted, field))
    return out


def head_meta(pages_ds, *, html_col: str = "html",
              keep_cols=("url", "warc_ts")):
    """pages (with raw html) -> per-snapshot head metadata table
    (url, warc_ts, title, description, content_language).

    Stateless vectorized map — fuses with the upstream read; no shuffle.
    """
    import functools

    fn = functools.partial(head_meta_batch, html_col=html_col,
                           keep_cols=keep_cols)
    return pages_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-snapshot crawl-QA profile
# ---------------------------------------------------------------------------

_PROFILE_EXTRACTOR = HtmlExtractor()


def page_profile_batch(batch: pa.Table, *, html_col: str = "html",
                       keep_cols=("url", "warc_ts")) -> pa.Table:
    """One pages batch -> (keys…, text_chars, n_lines, n_tokens,
    n_out_links): the stateless per-snapshot quality/size profile a crawl
    QA dashboard reads. All int64; all kernels vectorized (utf8_length,
    count_substring, count_substring_regex over the extracted text / raw
    html)."""
    html = batch.column(html_col)
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    zones = _PROFILE_EXTRACTOR._extract_find(html.to_pylist())
    text = pa.array(zones["text"], type=pa.string())
    html_str = html.cast(pa.string())

    def i64(arr):
        return arr.cast(pa.int64())

    out = batch.select(list(keep_cols))
    out = out.append_column("text_chars", i64(pc.utf8_length(text)))
    out = out.append_column(
        "n_lines", i64(pc.add(pc.count_substring(text, "\n"), 1)))
    out = out.append_column(
        "n_tokens", i64(pc.count_substring_regex(text, r"\S+")))
    out = out.append_column(
        "n_out_links", i64(pc.count_substring(html_str, 'href="')))
    return out


def page_profile(pages_ds, *, html_col: str = "html",
                 keep_cols=("url", "warc_ts")):
    """pages (raw html) -> per-snapshot size/quality profile. Stateless
    vectorized map (fuses with the read; zero shuffle)."""
    import functools

    fn = functools.partial(page_profile_batch, html_col=html_col,
                           keep_cols=keep_cols)
    return pages_ds.map_batches(fn, batch_format="pyarrow")


def _explode_level(frags: pa.Array, open_tag: str, close_tag: str):
    """One level of the nested tag explode: split every fragment on
    ``open_tag``, drop the preamble before the first occurrence, and cut
    each child at its ``close_tag``.  Returns (parent_index, local_index,
    child_fragments) — all flat, no per-row Python."""
    lists = pc.list_slice(pc.split_pattern(frags, pattern=open_tag),
                          start=1)
    counts = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    parent = np.repeat(np.arange(len(frags), dtype=np.int64), counts)
    excl = (np.concatenate(([0], np.cumsum(counts)[:-1]))
            if len(counts) else counts)
    local = (np.arange(int(counts.sum()), dtype=np.int64)
             - np.repeat(excl, counts))
    flat = pc.list_flatten(lists)
    child = pc.list_element(
        pc.split_pattern(flat, pattern=close_tag, max_splits=1), 0)
    return parent, local, child


def html_tables(ds, *, url_col: str = "url", html_col: str = "html"):
    """<table> cell extraction — the semi-structured ETL feed (tabular
    facts inside crawled pages): one row per cell,
    ``(url, table_idx, row_idx, col_idx, cell)``, indexes 0-based in
    document order.

    Contract (documented, regular grammar): literal attribute-free
    ``<table>``/``<tr>``/``<td>`` tags and plain-text cells — the shape a
    normalizing pre-pass emits; a full HTML5 parser is a codec by the
    multimodal-stub argument and out of scope.  A fragment missing its
    close tag yields the remainder verbatim (split-once semantics,
    identical in SQL).

    Three vectorized explode levels (split + list_slice + list_flatten
    with parent/local index arithmetic — no per-row Python), zero
    shuffle.
    """

    def fn(batch: pa.Table) -> pa.Table:
        html = pc.cast(batch.column(html_col), pa.large_string())
        t_parent, t_idx, t_html = _explode_level(
            html, "<table>", "</table>")
        r_parent, r_idx, r_html = _explode_level(t_html, "<tr>", "</tr>")
        c_parent, c_idx, cell = _explode_level(r_html, "<td>", "</td>")
        urls = batch.column(url_col).take(
            pa.array(t_parent[r_parent[c_parent]]))
        return pa.table({
            "url": pc.cast(urls, pa.string()),
            "table_idx": pa.array(t_idx[r_parent[c_parent]]),
            "row_idx": pa.array(r_idx[c_parent]),
            "col_idx": pa.array(c_idx),
            "cell": pc.cast(cell, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def html_tables_sql(*, pages_cte: str = "tpages", url: str = "url",
                    html: str = "html") -> str:
    """SQL mirror (composes after a WITH preamble providing the page
    table): three nested split+generate_series explodes with identical
    split-once close-tag semantics."""
    return f"""
        , ht_t AS (
            SELECT {url}, u.i - 2 AS table_idx,
                   string_split(tf[u.i], '</table>')[1] AS thtml
            FROM (SELECT {url}, string_split({html}, '<table>') AS tf
                  FROM {pages_cte}),
                 unnest(generate_series(2, len(tf))) AS u(i)
        ),
        ht_r AS (
            SELECT {url}, table_idx, v.i - 2 AS row_idx,
                   string_split(rf[v.i], '</tr>')[1] AS rhtml
            FROM (SELECT {url}, table_idx,
                         string_split(thtml, '<tr>') AS rf
                  FROM ht_t),
                 unnest(generate_series(2, len(rf))) AS v(i)
        )
        SELECT {url} AS url, table_idx::BIGINT AS table_idx,
               row_idx::BIGINT AS row_idx,
               (w.i - 2)::BIGINT AS col_idx,
               string_split(cf[w.i], '</td>')[1] AS cell
        FROM (SELECT {url}, table_idx, row_idx,
                     string_split(rhtml, '<td>') AS cf
              FROM ht_r),
             unnest(generate_series(2, len(cf))) AS w(i)"""
