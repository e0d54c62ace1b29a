"""Regression tests for the re-batching bug: folds must be exact regardless
of how Ray slices batches/blocks between stages (a (url, warc_ts) group may
straddle batch boundaries in any standalone stage)."""

import numpy as np
import pandas as pd

from tests.util import assert_frames_match

from htrc_feature_reader_ray.stages.extract import (
    folded_token_counts,
    tokens_from_pages,
)
from htrc_feature_reader_ray.stages.fold import fold_tokenlist
from htrc_feature_reader_ray.sources.pages import read_pages
from htrc_feature_reader_ray.stages.extract import sections_from_text


def test_fold_exact_after_repartition(sf_dir):
    """Scrambling block boundaries must not change fold results."""
    tokens = tokens_from_pages(sf_dir, via_html=False).materialize()
    scrambled = tokens.repartition(37)
    a = (
        fold_tokenlist(tokens, section="group", pos=False)
        .to_pandas()
        .sort_values(["url", "warc_ts", "token"])
        .reset_index(drop=True)
    )
    b = (
        fold_tokenlist(scrambled, section="group", pos=False)
        .to_pandas()
        .sort_values(["url", "warc_ts", "token"])
        .reset_index(drop=True)
    )
    assert_frames_match(a, b)
    assert not a.duplicated(["url", "warc_ts", "token"]).any()


def test_fused_fold_matches_standalone(sf_dir):
    pages = read_pages(sf_dir).map_batches(
        sections_from_text, batch_format="pyarrow"
    )
    fused = (
        folded_token_counts(pages, section="group", pos=False)
        .to_pandas()
        .sort_values(["url", "warc_ts", "token"])
        .reset_index(drop=True)
    )
    tokens = tokens_from_pages(sf_dir, via_html=False)
    standalone = (
        fold_tokenlist(tokens, section="group", pos=False)
        .to_pandas()
        .sort_values(["url", "warc_ts", "token"])
        .reset_index(drop=True)
    )
    assert_frames_match(fused, standalone)
    assert not fused.duplicated(["url", "warc_ts", "token"]).any()


def test_fused_fold_no_duplicate_keys_with_tiny_batches(sf_dir):
    """Force extreme re-batching upstream; the fused fold must still emit
    exactly one row per key."""
    pages = read_pages(sf_dir).map_batches(
        sections_from_text, batch_format="pyarrow", batch_size=16
    )
    out = folded_token_counts(pages).to_pandas()
    assert not out.duplicated(
        ["url", "warc_ts", "section", "token", "pos"]
    ).any()


def test_snapshot_features_exact_rowcount(sf_dir):
    from htrc_feature_reader_ray.pipelines.flagship import snapshot_features

    out = snapshot_features(sf_dir, via_html=False).to_pandas()
    assert len(out) == sum(1 + d % 3 for d in range(500))
    assert not out.duplicated(["url", "warc_ts"]).any()
