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


def _dtype_class(dtype) -> str:
    """Representation class the driver's value hash is sensitive to:
    int width is irrelevant (int32 == int64) but int-vs-float matters
    (123 != 123.0), and datetime UNIT matters ([s] != [us])."""
    kind = dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "M":
        return str(dtype)  # unit-sensitive
    if kind == "b":
        return "bool"
    return "object"


def assert_frames_match(ray_result, duck_df: pd.DataFrame):
    left = normalize(to_pandas(ray_result))
    right = normalize(duck_df)
    assert list(left.columns) == list(right.columns), (
        f"column mismatch: {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"row count {len(left)} vs {len(right)}"
    # dtype gate (modulo int width) — mirrors the driver's hash, which sees
    # 123 vs 123.0 and datetime64[s] vs [us] as mismatches
    for c in left.columns:
        lc, rc = _dtype_class(left[c].dtype), _dtype_class(right[c].dtype)
        assert lc == rc, f"dtype class mismatch on {c!r}: {lc} vs {rc}"
    pd.testing.assert_frame_equal(left, right, check_dtype=False)
