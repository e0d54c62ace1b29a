"""Tokenlist folding — the engine's central reshaping operator.

Re-expresses the reference's ``group_tokenlist`` (feature_reader.py:25-112) —
fold token counts onto any subset of {entity, snapshot, section, token-case,
pos}, with optional presence binarization (``page_freq``) — as a two-phase
Ray-Data aggregate:

  phase 1 (``map_batches``, zero-copy Arrow): filter + derive the lowercase
     column + PARTIAL ``pyarrow.Table.group_by(...).sum`` inside each batch
     (the combiner: shrinks the shuffle input to per-batch key cardinality);
  phase 2: bucketed vectorized merge across batches
     (``partition.bucketed_aggregate`` — fold keys retain url/page at
     corpus cardinality, where Ray's native per-group-Python
     sort-aggregate would dominate).

Phase 2 can be skipped ONLY when phase 1 is known to produce exactly one row
per key — which holds when the fold is FUSED into the same batch function as
the page-row token explode (every (url, warc_ts) group derives from a single
page row there; see stages/extract.py::folded_token_counts). It does NOT hold
across separate pipeline stages: Ray may re-batch/split blocks between
stages, so a standalone ``fold_tokenlist`` always runs phase 2.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


from htrc_feature_reader_ray.errors import MissingFieldError, require_columns
from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

SECTIONS = ("header", "body", "footer")


class FoldSpec:
    """Resolved folding plan: output keys, phase-1 keys, filters."""

    def __init__(self, cols, *, entity: bool, snapshots: bool, section: str,
                 case: bool, pos: bool, page_freq: bool, snapshot_col: str,
                 drop_section: bool):
        keys: list[str] = []
        if entity:
            require_columns(cols, ["url"], op="fold_tokenlist(entity=True)")
            keys.append("url")
        if snapshots:
            require_columns(
                cols, [snapshot_col],
                op=f"fold_tokenlist(snapshots={snapshot_col})",
            )
            keys.append(snapshot_col)

        self.sect_filter = None
        if "section" not in cols:
            section = "ignore"  # reference: missing section level is ignored
        if section == "all":
            keys.append("section")
        elif section in SECTIONS:
            keys.append("section")
            self.sect_filter = section
        elif section in ("group", "ignore"):
            pass
        else:
            raise ValueError(f"invalid section argument: {section}")

        self.need_lower = False
        if case:
            require_columns(cols, ["token"], op="fold_tokenlist(case=True)")
            keys.append("token")
        else:
            if "lowercase" not in cols:
                if "token" not in cols:
                    raise MissingFieldError(
                        "fold_tokenlist(case=False) needs a 'token' or "
                        "'lowercase' column"
                    )
                self.need_lower = True
            keys.append("lowercase")

        if pos:
            require_columns(cols, ["pos"], op="fold_tokenlist(pos=True)")
            keys.append("pos")

        self.keys = keys
        self.page_freq = page_freq
        self.snapshot_col = snapshot_col
        self.drop_section = drop_section and self.sect_filter is not None

        # page_freq: presence must be binarized per PAGE = (url, snapshot) —
        # phase 1 keeps full page granularity whenever either page component
        # is folded away (feature_reader.py:106-112). Folding only one of
        # them (e.g. entity=False, snapshots=True) would collapse distinct
        # urls sharing a snapshot ts into a single presence row.
        if page_freq and ("url" not in keys or snapshot_col not in keys):
            require_columns(
                cols, ["url", snapshot_col], op="fold_tokenlist(page_freq)"
            )
            self.phase1_keys = ["url", snapshot_col] + [
                k for k in keys if k not in ("url", snapshot_col)
            ]
        else:
            self.phase1_keys = keys


def phase1_fold(batch: pa.Table, spec: FoldSpec) -> pa.Table:
    """Per-table fold at phase-1 granularity (COMPLETE iff the table contains
    whole (url, snapshot) groups; otherwise a partial combiner)."""
    if spec.sect_filter is not None:
        batch = batch.filter(pc.equal(batch.column("section"), spec.sect_filter))
    if spec.need_lower:
        batch = batch.append_column(
            "lowercase", pc.utf8_lower(batch.column("token"))
        )
    g = batch.group_by(spec.phase1_keys).aggregate([("count", "sum")])
    return g.rename_columns(spec.phase1_keys + ["count"])


def finish_fold(ds, spec: FoldSpec, *, phase1_complete: bool):
    """Phase 2: global merge (skipped when phase 1 is complete), page_freq
    binarization/second fold, dtype normalization, section drop."""
    from htrc_feature_reader_ray.stages.partition import bucketed_aggregate

    out = ds
    if not phase1_complete:
        # fold keys retain url/page at corpus cardinality — bucketed
        # vectorized merge (native sort-aggregate is per-group Python)
        out = bucketed_aggregate(
            out, spec.phase1_keys, {"count": ("count", "sum")},
            num_buckets=32,
        )

    if spec.page_freq:
        def binarize(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("count"),
                "count",
                pa.array([1] * len(batch), type=pa.int64()),
            )

        out = out.map_batches(binarize, batch_format="pyarrow")
        if spec.phase1_keys != spec.keys:
            # fold presence over snapshots -> snapshot frequency; phase-1
            # rows for one output key can span batches -> global groupby.
            out = bucketed_aggregate(
                out, spec.keys, {"count": ("count", "sum")},
                num_buckets=32,
            )

    if spec.drop_section:
        out = out.select_columns(
            [c for c in spec.keys if c != "section"] + ["count"]
        )

    def normalize_types(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("count")
        batch = batch.set_column(
            idx, "count", pc.cast(batch.column("count"), pa.int64())
        )
        # Ray's groupby can downcast timestamp[us] -> [s] when every value is
        # whole-second; restore the engine-wide µs contract
        for i, f in enumerate(batch.schema):
            if pa.types.is_timestamp(f.type) and f.type.unit != "us":
                batch = batch.set_column(
                    i, f.name, batch.column(i).cast(pa.timestamp("us"))
                )
        return batch

    return out.map_batches(normalize_types, batch_format="pyarrow")


def fold_tokenlist(
    tokens_ds,
    *,
    entity: bool = True,
    snapshots: bool = True,
    section: str = "all",
    case: bool = True,
    pos: bool = True,
    page_freq: bool = False,
    snapshot_col: str = "warc_ts",
    drop_section: bool = False,
):
    """Fold a long token-count Dataset onto the requested key subset
    (semantics per the reference, feature_reader.py:25-112 — see FoldSpec).

    Standalone version: ALWAYS runs the global phase-2 groupby (correct for
    any batching). For the shuffle-free path over raw pages use
    ``stages.extract.folded_token_counts`` which fuses phase 1 with the
    explode inside one batch function."""
    cols = tokens_ds.schema().names
    require_columns(cols, ["count"], op="fold_tokenlist")
    spec = FoldSpec(
        cols, entity=entity, snapshots=snapshots, section=section, case=case,
        pos=pos, page_freq=page_freq, snapshot_col=snapshot_col,
        drop_section=drop_section,
    )
    partials = tokens_ds.map_batches(
        lambda t: phase1_fold(t, spec), batch_format="pyarrow"
    )
    return finish_fold(partials, spec, phase1_complete=False)


def term_snapshot_matrix(tokens_ds, url: str, *, page_freq: bool = False):
    """Per-entity wide pivot — the reference's ``term_page_freqs``
    (feature_reader.py:723-733): snapshot × token count (or 0/1 presence)
    matrix for ONE url, NaN→0.

    Deliberately per-entity: a corpus-wide snapshot×vocab pivot blows up row
    width (SURVEY §7.5.4), so the engine keeps long form globally and pivots
    only after filtering to one entity (small driver-side frame)."""
    sub = tokens_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("url"), url)),
        batch_format="pyarrow",
    )
    df = sub.to_pandas()
    if df.empty:
        import pandas as pd

        return pd.DataFrame()
    grouped = (
        df.groupby(["warc_ts", "token"], as_index=False)["count"].sum()
    )
    if page_freq:
        grouped["count"] = 1
    wide = grouped.pivot(index="warc_ts", columns="token", values="count")
    return wide.fillna(0).astype("int64")


def term_matrix_dense(tokens_ds, *, page_freq: bool = False,
                      max_terms: int = 10_000, num_buckets: int = 32):
    """DISTRIBUTED per-entity wide pivot, serialized dense-long — the
    reference's ``term_page_freqs`` (feature_reader.py:723-733) for EVERY
    url at once, without the corpus-wide wide-row blow-up
    (:func:`term_snapshot_matrix` handles the one-url driver-side case;
    this runs the SAME pandas pivot per entity INSIDE a url-bucketed
    pass). Output is the dense long serialization ``(url, warc_ts,
    token, count)`` containing every cell of each per-entity matrix —
    INCLUDING the ``fillna(0)`` zeros, which is precisely what
    distinguishes the pivot from a plain long-form fold: each url
    contributes its full |snapshots| × |tokens| cross product, 0 where
    the token never occurs in that snapshot, presence-binarized when
    ``page_freq=True``.

    Wide-row hazard (SURVEY §7.5.4): an entity's matrix width is its
    distinct-token count; ``max_terms`` caps it and raises rather than
    letting one giant entity materialize an unbounded row — the cap is
    part of the contract.

    Scale shape: ONE url-bucketed exchange of the folded long rows; the
    pivot+melt runs per entity inside the bucket (an entity's matrix is
    worker-fit BY CONTRACT via max_terms); output streams back out
    dense-long."""
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    def per_bucket(df):
        import pandas as pd

        outs = []
        for url, g in df.groupby("url", sort=False):
            grouped = g.groupby(
                ["warc_ts", "token"], as_index=False)["count"].sum()
            if page_freq:
                grouped["count"] = 1
            wide = grouped.pivot(index="warc_ts", columns="token",
                                 values="count")
            if wide.shape[1] > max_terms:
                raise ValueError(
                    f"term_matrix_dense: entity {url!r} has "
                    f"{wide.shape[1]} distinct tokens > max_terms="
                    f"{max_terms} (wide-row hazard; raise max_terms "
                    f"only if a {wide.shape[1]}-column row is truly "
                    f"worker-fit)")
            wide = wide.fillna(0).astype("int64")
            long = wide.reset_index().melt(
                id_vars="warc_ts", var_name="token", value_name="count")
            long.insert(0, "url", url)
            outs.append(long)
        if not outs:
            import pandas as pd

            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "warc_ts": pd.Series([], dtype="datetime64[us]"),
                "token": pd.Series([], dtype=object),
                "count": pd.Series([], dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["count"] = out["count"].astype("int64")
        return out

    return bucketed_map_groups(tokens_ds, "url", per_bucket,
                               num_buckets=num_buckets)


def distinct_tokens(tokens_ds, *, min_count: int = 1, case: bool = True):
    """Distinct tokens with a minimum total-count threshold — the reference's
    ``Volume.tokens(min_count=…)`` (feature_reader.py:559-568) at corpus
    scale: partial per-batch fold → global groupby-sum → threshold filter."""
    folded = fold_tokenlist(
        tokens_ds,
        entity=False,
        snapshots=False,
        section="ignore",
        case=case,
        pos=False,
    )
    if min_count > 1:
        folded = folded.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("count"), min_count)),
            batch_format="pyarrow",
        )
    return folded


def topk_per_group(ds, *, group_cols, sort_col, k: int, tie_cols=(),
                   descending: bool = True, num_buckets: int = 32,
                   rank_col=None):
    """Top-k ROWS per group by ``sort_col`` (ties broken by ``tie_cols``
    ascending) — the per-entity sibling of the corpus-level desc-sort top-k
    (``term_volume_freqs``, feature_reader.py:772-779).

    Two-phase: a per-batch local top-k (any row outside its batch's group
    top-k can't be in the global top-k, so the combiner is lossless) shrinks
    the exchange to ≤ groups×k rows per batch, then one bucketed pass
    finishes each group. Input rows must already be globally aggregated
    (one row per candidate) — run the fold first.

    ``rank_col`` (optional) emits the 1-based within-group rank in the
    finishing pass — SQL's ``row_number() OVER (PARTITION BY g ORDER BY v
    [DESC], ties)`` — computed only after the lossless combiner, so the
    exchange shape is unchanged."""
    group_cols = list(group_cols)
    sort_by = group_cols + [sort_col] + list(tie_cols)
    asc = [True] * len(group_cols) + [not descending] + [True] * len(tie_cols)

    def local_topk(df):
        df = df.sort_values(sort_by, ascending=asc, kind="mergesort")
        return df.groupby(group_cols, sort=False).head(k)

    def finish(df):
        df = df.sort_values(sort_by, ascending=asc,
                            kind="mergesort").reset_index(drop=True)
        g = df.groupby(group_cols, sort=False, observed=True)
        if rank_col is None:
            return g.head(k)
        df[rank_col] = (g.cumcount() + 1).astype("int64")
        return df[df[rank_col] <= k]

    partial = ds.map_batches(local_topk, batch_format="pandas")
    return bucketed_map_groups(
        partial, group_cols[0], finish, num_buckets=num_buckets
    )


def term_freqs_topk(tokens_ds, k: int = 50, *, descending: bool = True):
    """Corpus term frequencies sorted desc with deterministic token tie-break,
    limited to k — the reference's ``term_volume_freqs`` desc sort
    (feature_reader.py:772-779) + top-k."""
    folded = fold_tokenlist(
        tokens_ds, entity=False, snapshots=False, section="ignore",
        case=True, pos=False,
    )
    return folded.sort(["count", "token"], descending=[descending, False]).limit(k)


def collect_sorted(ds, *, key, order_col: str, value_col: str,
                   sep: str = "|", out_col: str = "collected",
                   num_buckets: int = 32):
    """Deterministic ordered collect (SQL ``string_agg(v, sep ORDER BY
    o)`` / ordered ``array_agg``): per key, the value strings joined in
    ``order_col`` order.  Collection order is part of the CONTRACT (an
    unordered collect is nondeterministic under parallelism and therefore
    untestable); ties in ``order_col`` must not exist — the caller picks a
    unique order key, as in SQL.

    One key-bucketed exchange; inside the bucket one global sort + a
    C-level ``groupby().agg(join)`` across all keys.  The output row
    count is |keys| — the op ASSEMBLES history rows (re-crawl timelines,
    session event paths) for feature stores that want one row per entity.
    """
    from htrc_feature_reader_ray.stages.partition import bucketed_map_groups

    keys = [key] if isinstance(key, str) else list(key)

    def per_bucket(df):
        import pandas as pd

        if df.empty:
            return pd.DataFrame(
                {**{k: pd.Series(dtype=object) for k in keys},
                 out_col: pd.Series(dtype=object)})
        if df.duplicated(keys + [order_col]).any():
            raise ValueError("collect_sorted: order_col ties within a key")
        df = df.sort_values(keys + [order_col], kind="mergesort")
        return (
            df.assign(**{out_col: df[value_col].astype(str)})
            .groupby(keys, sort=False, as_index=False, observed=True)
            .agg(**{out_col: (out_col, sep.join)})
        )

    return bucketed_map_groups(ds.select_columns(
        keys + [order_col] + ([value_col] if value_col not in
                              keys + [order_col] else [])),
        keys[0], per_bucket, num_buckets=num_buckets)
