import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from htrc_feature_reader_ray.stages.partition import (
    add_bucket_column,
    bucketed_map_groups,
    salt_column,
)


def _skewed():
    """One hot key owning ~90% of rows (the hot-domain shape, SURVEY §4)."""
    n = 20_000
    keys = np.where(np.arange(n) % 10 < 9, "hot.example.com", None)
    cold = np.array([f"cold{i % 50}.example.com" for i in range(n)], dtype=object)
    keys = np.where(keys == None, cold, keys)  # noqa: E711
    return pa.table(
        {
            "domain": pa.array(keys.astype(str)),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        }
    )


def test_salted_two_stage_sum_exact():
    ds = ray.data.from_arrow(_skewed())
    salted = salt_column(ds, num_salts=8)
    stage1 = salted.groupby(["domain", "_salt"]).aggregate(
        Sum("v", alias_name="v")
    )
    final = stage1.groupby("domain").aggregate(Sum("v", alias_name="v"))
    got = final.to_pandas().set_index("domain")["v"]
    expect = _skewed().to_pandas().groupby("domain")["v"].sum()
    assert got.sort_index().equals(expect.sort_index())


def test_bucketing_deterministic_and_total():
    ds = ray.data.from_arrow(_skewed())
    b1 = add_bucket_column(ds, "domain", 16).to_pandas()
    b2 = add_bucket_column(ds, "domain", 16).to_pandas()
    assert b1["_bucket"].equals(b2["_bucket"])
    # every row of a key lands in one bucket
    assert (b1.groupby("domain")["_bucket"].nunique() == 1).all()


def test_bucketed_map_groups_sees_whole_keys():
    ds = ray.data.from_arrow(_skewed())

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("domain", as_index=False)["v"].sum()

    out = bucketed_map_groups(ds, "domain", per_bucket, num_buckets=8)
    got = out.to_pandas().set_index("domain")["v"].sort_index()
    expect = _skewed().to_pandas().groupby("domain")["v"].sum().sort_index()
    assert got.equals(expect)
