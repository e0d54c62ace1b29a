"""Randomized dual-path equality sweep: every operator with a
broadcast↔exchange auto-switch must produce IDENTICAL output on both
paths over seeded random graphs (the hand-fixture equality tests pin
known edge cases; this sweep guards the general case)."""

import numpy as np
import pandas as pd
import pytest
import ray

from htrc_feature_reader_ray.stages.linkgraph import (
    bowtie_structure,
    coreness,
    degree_assortativity,
    harmonic_centrality,
    hop_histogram,
    k_core,
    modularity,
    neighbor_degree_curve,
    rich_club,
)

DUAL_PATH_OPS = [
    bowtie_structure,
    coreness,
    k_core,
    modularity,
    rich_club,
    neighbor_degree_curve,
    degree_assortativity,
    harmonic_centrality,
    hop_histogram,
]


def _random_edges(seed: int, n_nodes: int = 24, n_edges: int = 60):
    rng = np.random.RandomState(seed)
    # power-law-ish degree skew + a few self-loops and duplicates,
    # the shapes the canonicalizers must agree on
    w = 1.0 / np.arange(1, n_nodes + 1)
    p = w / w.sum()
    src = rng.choice(n_nodes, size=n_edges, p=p)
    dst = rng.choice(n_nodes, size=n_edges)
    df = pd.DataFrame({
        "src_url": [f"https://n{i}.x/p" for i in src],
        "dst_url": [f"https://n{i}.x/p" for i in dst],
    })
    return ray.data.from_pandas(df).repartition(3)


def _norm(res):
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return df.sort_values(df.columns.tolist()).reset_index(drop=True)


@pytest.mark.parametrize("op", DUAL_PATH_OPS,
                         ids=[f.__name__ for f in DUAL_PATH_OPS])
@pytest.mark.parametrize("seed", [17])
def test_broadcast_equals_exchange_on_random_graphs(op, seed):
    bc = _norm(op(_random_edges(seed)))
    ex = _norm(op(_random_edges(seed), broadcast_limit=0))
    pd.testing.assert_frame_equal(bc, ex)
