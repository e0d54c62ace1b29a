"""Tokenlist folding — the engine's central reshaping operator.

Re-expresses the reference's ``group_tokenlist`` (feature_reader.py:25-112) —
fold token counts onto any subset of {entity, snapshot, section, token-case,
pos}, with optional presence binarization (``page_freq``) — as a two-phase
Ray-Data aggregate:

  phase 1 (``map_batches``, zero-copy Arrow): filter + derive the lowercase
     column + PARTIAL ``pyarrow.Table.group_by(...).sum`` inside each batch
     (the combiner: shrinks the shuffle input to per-batch key cardinality);
  phase 2 (only when needed): ``ds.groupby(keys).sum`` across batches.

Phase 2 is skipped entirely when the key set contains (url, warc_ts) and the
input is *snapshot-aligned* (every (url, warc_ts) group lives inside one batch
— guaranteed by the extract stage, stages/extract.py): per-entity folds are
shuffle-free, matching SURVEY §2.3's "key incl. url keeps it shuffle-free".
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from htrc_feature_reader_ray.errors import MissingFieldError, require_columns

SECTIONS = ("header", "body", "footer")


def _resolve_keys(
    cols,
    *,
    entity: bool,
    snapshots: bool,
    section: str,
    case: bool,
    pos: bool,
    snapshot_col: str,
):
    """Compute (output key list, needs section filter, needs lowercase)."""
    keys: list[str] = []
    if entity:
        require_columns(cols, ["url"], op="fold_tokenlist(entity=True)")
        keys.append("url")
    if snapshots:
        require_columns(
            cols, [snapshot_col], op=f"fold_tokenlist(snapshots={snapshot_col})"
        )
        keys.append(snapshot_col)

    sect_filter = None
    if "section" not in cols:
        section = "ignore"  # reference: missing section level is ignored
    if section == "all":
        keys.append("section")
    elif section in SECTIONS:
        keys.append("section")
        sect_filter = section
    elif section in ("group", "ignore"):
        pass
    else:
        raise ValueError(f"invalid section argument: {section}")

    need_lower = False
    if case:
        require_columns(cols, ["token"], op="fold_tokenlist(case=True)")
        keys.append("token")
    else:
        if "lowercase" not in cols:
            if "token" not in cols:
                raise MissingFieldError(
                    "fold_tokenlist(case=False) needs a 'token' or 'lowercase' column"
                )
            need_lower = True
        keys.append("lowercase")

    if pos:
        require_columns(cols, ["pos"], op="fold_tokenlist(pos=True)")
        keys.append("pos")
    return keys, sect_filter, need_lower


def fold_tokenlist(
    tokens_ds,
    *,
    entity: bool = True,
    snapshots: bool = True,
    section: str = "all",
    case: bool = True,
    pos: bool = True,
    page_freq: bool = False,
    aligned: bool = True,
    snapshot_col: str = "warc_ts",
    drop_section: bool = False,
):
    """Fold a long token-count Dataset onto the requested key subset.

    Args mirror the reference semantics (feature_reader.py:25-112):
      entity: keep the url level (False = corpus-wide fold).
      snapshots: keep the warc_ts level (the reference's ``pages``);
        ``snapshot_col`` may name a different ordered level (e.g. ``chunk`` —
        chunked lakes are first-class, feature_reader.py:676-681).
      section: 'all' | 'header'|'body'|'footer' (filter) | 'group' (fold out).
      case: False folds counts onto lowercase tokens.
      pos: False folds the pos facet out.
      page_freq: True counts per-snapshot presence (0/1) instead of counts;
        with snapshots folded out it returns the number of snapshots
        containing the key (two-stage fold, feature_reader.py:106-112).
      aligned: input guarantees every (url, snapshot) group is inside one
        batch (true for the extract stage's output) — enables the
        shuffle-free fast path.
      drop_section: after filtering to one section, drop the constant column
        (feature_reader.py:707-710 analog).
    """
    cols = tokens_ds.schema().names
    require_columns(cols, ["count"], op="fold_tokenlist")
    keys, sect_filter, need_lower = _resolve_keys(
        cols,
        entity=entity,
        snapshots=snapshots,
        section=section,
        case=case,
        pos=pos,
        snapshot_col=snapshot_col,
    )

    # page_freq with snapshots folded: first fold at snapshot granularity.
    presence_keys = None
    if page_freq and not snapshots:
        presence_keys = ["url", snapshot_col] + [k for k in keys if k != "url"]
        require_columns(cols, ["url", snapshot_col], op="fold_tokenlist(page_freq)")
        phase1_keys = presence_keys
    else:
        phase1_keys = keys

    def partial(batch: pa.Table) -> pa.Table:
        if sect_filter is not None:
            batch = batch.filter(pc.equal(batch.column("section"), sect_filter))
        if need_lower:
            batch = batch.append_column(
                "lowercase", pc.utf8_lower(batch.column("token"))
            )
        g = batch.group_by(phase1_keys).aggregate([("count", "sum")])
        return g.rename_columns(phase1_keys + ["count"])

    out = tokens_ds.map_batches(partial, batch_format="pyarrow")

    snapshot_complete = aligned and "url" in phase1_keys and snapshot_col in phase1_keys
    if not snapshot_complete:
        out = out.groupby(phase1_keys).aggregate(Sum("count", alias_name="count"))

    if page_freq:
        def binarize(batch: pa.Table) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("count"),
                "count",
                pa.array([1] * len(batch), type=pa.int64()),
            )

        out = out.map_batches(binarize, batch_format="pyarrow")
        if presence_keys is not None:
            # second stage: sum presence over snapshots -> snapshot frequency
            def partial2(batch: pa.Table) -> pa.Table:
                g = batch.group_by(keys).aggregate([("count", "sum")])
                return g.rename_columns(keys + ["count"])

            out = out.map_batches(partial2, batch_format="pyarrow")
            out = out.groupby(keys).aggregate(Sum("count", alias_name="count"))

    if drop_section and sect_filter is not None:
        out = out.select_columns([c for c in keys if c != "section"] + ["count"])

    # normalize count dtype to int64 (pandas-sum parity, SURVEY §7.5.5)
    def to_int64(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("count")
        return batch.set_column(
            idx, "count", pc.cast(batch.column("count"), pa.int64())
        )

    return out.map_batches(to_int64, batch_format="pyarrow")


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


def term_freqs_topk(tokens_ds, k: int = 50, *, descending: bool = True):
    """Corpus term frequencies sorted desc with deterministic token tie-break,
    limited to k — the reference's ``term_volume_freqs`` desc sort
    (feature_reader.py:772-779) + top-k."""
    folded = fold_tokenlist(
        tokens_ds, entity=False, snapshots=False, section="ignore",
        case=True, pos=False,
    )
    return folded.sort(["count", "token"], descending=[descending, False]).limit(k)
