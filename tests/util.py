"""Test helpers: order-insensitive frame comparison (mirrors the driver's
sort-columns-by-name + value compare)."""

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def assert_frames_match(ray_result, duck_df: pd.DataFrame):
    left = normalize(to_pandas(ray_result))
    right = normalize(duck_df)
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"row count {len(left)} vs {len(right)}"
    pd.testing.assert_frame_equal(left, right, check_dtype=False)
