"""Numeric profiling + deterministic stratified sampling."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.stages.profile import (
    exact_quantiles,
    numeric_profile,
    value_histogram,
)
from htrc_feature_reader_ray.stages.sample import stratified_sample


def _vals_ds(vals):
    return ray.data.from_arrow(
        pa.table({"v": pa.array(vals, type=pa.int64())})
    ).repartition(5)


def test_exact_quantiles_matches_numpy_rank():
    rng = np.random.RandomState(4)
    vals = rng.randint(0, 300, size=5000).tolist()
    out = exact_quantiles(_vals_ds(vals), "v", qs=(0.25, 0.5, 0.9, 0.99))
    s = np.sort(vals)
    n = len(s)
    for q, v in zip(out["q"], out["value"]):
        assert v == s[int(np.ceil(q * n)) - 1], q


def test_numeric_profile_exact():
    vals = [5, 1, 9, 9, 3]
    prof = numeric_profile(_vals_ds(vals), "v", qs=(0.5,))
    row = prof.iloc[0]
    assert (row["n"], row["min"], row["max"], row["sum"]) == (5, 1, 9, 27)
    assert row["p50"] == 5


def test_value_histogram_folds_across_blocks():
    vals = [7] * 100 + [2] * 50
    h = value_histogram(_vals_ds(vals), "v").to_pandas()
    got = dict(zip(h["v"], h["cnt"]))
    assert got == {7: 100, 2: 50}


def test_stratified_sample_exact_fraction_and_determinism():
    rng = np.random.RandomState(8)
    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], size=n, p=[0.7, 0.2, 0.1]),
        }
    )
    ds = ray.data.from_pandas(df).repartition(20)
    a = stratified_sample(ds, stratum_col="lang", id_col="doc_id",
                          fraction=0.25, num_buckets=4).to_pandas()
    # exact per-stratum size
    for lang, g in df.groupby("lang"):
        assert (a["lang"] == lang).sum() == int(np.ceil(0.25 * len(g)))
    # deterministic: same rows regardless of partitioning/bucketing
    b = stratified_sample(
        ray.data.from_pandas(df).repartition(3), stratum_col="lang",
        id_col="doc_id", fraction=0.25, num_buckets=11,
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_stratified_sample_decimal_exact_quota():
    """fraction=0.07 on a 300-row stratum: float ceil gives 22, the SQL
    DECIMAL replay gives 21 — the op must match SQL (regression)."""
    import duckdb

    df = pd.DataFrame(
        {"doc_id": np.arange(300, dtype=np.int64), "lang": ["en"] * 300}
    )
    out = stratified_sample(
        ray.data.from_pandas(df), stratum_col="lang", id_col="doc_id",
        fraction=0.07, num_buckets=2,
    ).to_pandas()
    sql_quota = duckdb.sql("SELECT ceil(0.07 * 300)").fetchone()[0]
    assert len(out) == int(sql_quota) == 21
