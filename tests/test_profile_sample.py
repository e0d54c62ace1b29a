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


def test_deterministic_shuffle_is_permutation_and_shape_independent():
    from htrc_feature_reader_ray.stages.sample import deterministic_shuffle

    rows = [{"doc_id": i, "payload": f"p{i}"} for i in range(211)]
    ds = ray.data.from_items(rows)
    out = (
        deterministic_shuffle(ds, id_col="doc_id", salt="s:", num_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # exact 0..n-1 permutation, payload intact
    assert sorted(out.shuffle_pos.tolist()) == list(range(211))
    assert out.payload.tolist() == [f"p{i}" for i in range(211)]
    # cluster-shape independence: different bucket count AND block shape
    # give the identical permutation (pure function of the data)
    ds2 = ray.data.from_items(rows).repartition(7)
    out2 = (
        deterministic_shuffle(ds2, id_col="doc_id", salt="s:",
                              num_buckets=32)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out2.shuffle_pos.tolist() == out.shuffle_pos.tolist()
    # a different salt draws a different permutation (per-epoch reshuffle)
    out3 = (
        deterministic_shuffle(ds, id_col="doc_id", salt="t:", num_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out3.shuffle_pos.tolist() != out.shuffle_pos.tolist()
    # serial reference: rank of (md5 little-endian-8(salt+id), id)
    import hashlib

    h = [
        int.from_bytes(
            hashlib.md5(f"s:{i}".encode()).digest()[:8], "little"
        )
        for i in range(211)
    ]
    order = sorted(range(211), key=lambda i: (h[i], i))
    expect = [0] * 211
    for pos, i in enumerate(order):
        expect[i] = pos
    assert out.shuffle_pos.tolist() == expect


def test_normalize_features_exact_vs_pandas():
    from htrc_feature_reader_ray.stages.profile import normalize_features

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(300),
        "g": rng.choice(["a", "b", "c", "solo"], 300,
                        p=[0.5, 0.3, 0.19, 0.01]),
        "v": rng.integers(0, 10_000, 300),
    })
    # force a constant group (std == 0 and mx == mn -> both features 0.0)
    df.loc[df.g == "solo", "v"] = 42
    ds = ray.data.from_pandas(df).repartition(5)
    out = (
        normalize_features(ds, key="g", value_col="v")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # reference: population z-score with the same expression order
    st = df.groupby("g")["v"].agg(["size", "sum", "min", "max"])
    ss = df.assign(v2=df.v.astype(np.int64) ** 2).groupby("g")["v2"].sum()
    for gname, sub in out.groupby("g"):
        n = float(st.loc[gname, "size"]); s = float(st.loc[gname, "sum"])
        var = max((float(ss.loc[gname]) - s * s / n) / n, 0.0)
        std = var ** 0.5
        mn, mx = st.loc[gname, "min"], st.loc[gname, "max"]
        v = sub.v.to_numpy()
        ez = (v - s / n) / std if std > 0 else np.zeros(len(v))
        em = (v - mn) / (mx - mn) if mx > mn else np.zeros(len(v))
        assert np.array_equal(sub.z_v.to_numpy(), ez)
        assert np.array_equal(sub.minmax_v.to_numpy(), em)
    solo = out[out.g == "solo"]
    assert (solo.z_v == 0.0).all() and (solo.minmax_v == 0.0).all()


def test_hash_split_entity_keyed_and_deterministic():
    from htrc_feature_reader_ray.stages.sample import hash_split

    rows = [
        {"doc_id": i, "source": f"src{i % 37}"} for i in range(400)
    ]
    ds = ray.data.from_items(rows)
    out = hash_split(
        ds, fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        by="source", salt="v1:",
    ).to_pandas()
    # exhaustive + disjoint: every row gets exactly one valid label
    assert set(out.split.unique()) <= {"train", "val", "test"}
    assert len(out) == 400
    # entity consistency: all docs of a source share one split
    assert (out.groupby("source").split.nunique() == 1).all()
    # pure function of the data: block shape doesn't change assignment
    out2 = hash_split(
        ray.data.from_items(rows).repartition(9),
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        by="source", salt="v1:",
    ).to_pandas()
    m1 = out.set_index("doc_id").split
    m2 = out2.set_index("doc_id").split
    assert m1.sort_index().equals(m2.sort_index())
    # serial reference: md5 little-endian-8 vs exact-rational thresholds
    import hashlib
    t_train = (4 << 64) // 5
    t_val = (9 << 64) // 10
    for src in {r["source"] for r in rows}:
        h = int.from_bytes(
            hashlib.md5(f"v1:{src}".encode()).digest()[:8], "little")
        expect = ("train" if h < t_train
                  else "val" if h < t_val else "test")
        assert (out[out.source == src].split == expect).all()


def test_hash_split_rejects_bad_fractions():
    import pytest as _pytest
    from htrc_feature_reader_ray.stages.sample import _split_thresholds

    with _pytest.raises(ValueError):
        _split_thresholds({"a": 0.5, "b": 0.6})
    with _pytest.raises(ValueError):
        _split_thresholds({"a": 1.2, "b": -0.2})
    # exact decimal strings sum to 1 via Fraction('0.9') etc.
    names, cum = _split_thresholds({"a": 0.9, "b": 0.05, "c": 0.05})
    assert names == ["a", "b", "c"] and len(cum) == 2
    assert cum[0] == (9 << 64) // 10


def test_quantile_bucketize_vs_sql_and_ties():
    import duckdb

    from htrc_feature_reader_ray.stages.profile import (
        quantile_bucketize,
        quantile_bucketize_sql,
    )

    rng = np.random.default_rng(11)
    # heavy ties: values drawn from a tiny space so thresholds collide
    df = pd.DataFrame({
        "doc_id": np.arange(500),
        "v": rng.integers(0, 7, 500).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = (
        quantile_bucketize(ds, "v", num_buckets=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_df", df)
    exp = (
        con.execute(quantile_bucketize_sql(
            "v", num_buckets=10, table="docs_df",
            columns="d.doc_id, d.v",
        )).df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)
    # equal values always share a bucket; buckets monotone in value
    m = out.groupby("v").bucket
    assert (m.nunique() == 1).all()
    assert m.first().sort_index().is_monotonic_increasing
    # shape independence
    out2 = (
        quantile_bucketize(ray.data.from_pandas(df).repartition(13),
                           "v", num_buckets=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out2.bucket.tolist() == out.bucket.tolist()


def test_ecdf_vs_sql():
    import duckdb

    from htrc_feature_reader_ray.stages.profile import ecdf, ecdf_sql

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "doc_id": np.arange(400),
        "v": rng.integers(0, 30, 400).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        ecdf(ds, "v")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = (
        con.execute(ecdf_sql("v", table="t", columns="doc_id, v"))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=True)
    # invariants: ties share a value; max is exactly 1.0
    assert (out.groupby("v").cume_dist.nunique() == 1).all()
    assert out.cume_dist.max() == 1.0


def test_host_cap_quota_and_partitioning_independence():
    """Cap enforced per host; selection is a pure function of (salt, id) —
    identical rows whether the corpus arrives in 1 block or 13."""
    import ray.data

    from htrc_feature_reader_ray.stages.sample import host_cap

    df = pd.DataFrame({
        "doc_id": range(100),
        # megasite host 'a' (70 docs) vs tail hosts
        "host": ["a"] * 70 + ["b"] * 20 + ["c"] * 9 + ["d"],
    })

    def run(blocks):
        ds = ray.data.from_pandas(df).repartition(blocks)
        return (host_cap(ds, host_col="host", id_col="doc_id", k=5,
                         salt="s:")
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    one, many = run(1), run(13)
    pd.testing.assert_frame_equal(one, many)
    sizes = one.groupby("host").size()
    assert sizes["a"] == 5 and sizes["b"] == 5
    assert sizes["c"] == 5 and sizes["d"] == 1          # under-quota kept
    assert set(one["cap_rank"]) <= set(range(1, 6))
    # rank is dense 1..min(k, n) within each host
    assert (one.groupby("host")["cap_rank"].max().to_numpy()
            == [5, 5, 5, 1]).all()
    # different salt draws a different subsample of the megasite
    other = (host_cap(ray.data.from_pandas(df), host_col="host",
                      id_col="doc_id", k=5, salt="t:")
             .to_pandas())
    assert set(other.loc[other.host == "a", "doc_id"]) != set(
        one.loc[one.host == "a", "doc_id"])


# ---------------------------------------------------------------------------
# pivot_counts / rollup_counts / grouped_moments / decayed_score


def test_pivot_counts_fixed_layout_and_zero_fill():
    from htrc_feature_reader_ray.stages.profile import pivot_counts

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        "t": ["a", "a", "b", "b", "zz", "a"],  # zz: not in the layout
    })
    out = (
        pivot_counts(ray.data.from_pandas(df).repartition(4),
                     key="u", cat_col="t", categories=("a", "b", "c"))
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    assert list(out.columns) == ["u", "n_a", "n_b", "n_c"]
    assert out["n_a"].tolist() == [2, 0, 1]
    assert out["n_b"].tolist() == [1, 1, 0]
    assert out["n_c"].tolist() == [0, 0, 0]  # zero-filled, zz dropped
    assert all(out[c].dtype == "int64" for c in ["n_a", "n_b", "n_c"])


def test_rollup_counts_levels_and_nulls():
    from htrc_feature_reader_ray.stages.profile import rollup_counts

    df = pd.DataFrame({
        "k1": ["x", "x", "x", "y"],
        "k2": ["p", "p", "q", "p"],
        "v": [1, 2, 4, 8],
    })
    out = rollup_counts(
        ray.data.from_pandas(df).repartition(3),
        keys=("k1", "k2"), sum_col="v",
    ).to_pandas()
    finest = out[out["k2"].notna()].set_index(["k1", "k2"])
    assert finest.loc[("x", "p"), "total"] == 3
    assert finest.loc[("x", "q"), "total"] == 4
    assert finest.loc[("y", "p"), "total"] == 8
    lvl1 = out[out["k2"].isna() & out["k1"].notna()].set_index("k1")
    assert lvl1.loc["x", "n"] == 3 and lvl1.loc["x", "total"] == 7
    assert lvl1.loc["y", "n"] == 1 and lvl1.loc["y", "total"] == 8
    grand = out[out["k1"].isna()]
    assert len(grand) == 1
    assert grand.iloc[0]["n"] == 4 and grand.iloc[0]["total"] == 15


def test_grouped_moments_corr_exact_and_degenerate():
    import math

    from htrc_feature_reader_ray.stages.profile import grouped_moments

    df = pd.DataFrame({
        "g": ["lin"] * 4 + ["anti"] * 3 + ["flat"] * 3,
        "x": [1, 2, 3, 4, 1, 2, 3, 5, 5, 5],
        "y": [2, 4, 6, 8, 9, 6, 3, 1, 2, 3],
    })
    out = grouped_moments(
        ray.data.from_pandas(df).repartition(4),
        key="g", x_col="x", y_col="y",
    ).to_pandas().set_index("g")
    assert out.loc["lin", "corr"] == 1.0
    assert out.loc["anti", "corr"] == -1.0
    assert math.isnan(out.loc["flat", "corr"])  # zero x-variance -> NULL
    # exact moments
    assert out.loc["lin", ["n", "sum_x", "sum_y", "sum_xx", "sum_yy",
                           "sum_xy"]].tolist() == [4, 10, 20, 30, 120, 60]


def test_grouped_trend_exact_and_degenerate():
    import math

    from htrc_feature_reader_ray.stages.profile import grouped_trend

    df = pd.DataFrame({
        "g": ["lin"] * 4 + ["noisy"] * 3 + ["flat"] * 2,
        "x": [1, 2, 3, 4, 0, 1, 2, 7, 7],
        "y": [5, 7, 9, 11, 1, 4, 5, 3, 9],
    })
    out = grouped_trend(
        ray.data.from_pandas(df).repartition(4),
        key="g", x_col="x", y_col="y",
    ).to_pandas().set_index("g")
    # y = 2x + 3 exactly
    assert out.loc["lin", "slope"] == 2.0
    assert out.loc["lin", "intercept"] == 3.0
    # least squares on (0,1),(1,4),(2,5): slope = 2, intercept = 4/3
    assert out.loc["noisy", "slope"] == 2.0
    assert out.loc["noisy", "intercept"] == (
        float(10) - 2.0 * float(3)) / float(3)
    # zero x-variance -> NULL slope/intercept
    assert math.isnan(out.loc["flat", "slope"])
    assert math.isnan(out.loc["flat", "intercept"])
    assert out["n"].tolist() == [2, 4, 3] or set(
        out["n"].tolist()) == {2, 4, 3}


def test_impute_group_median_fill_and_all_null_group():
    from htrc_feature_reader_ray.stages.profile import impute_group_median

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6, 7, 8],
        "g": ["a", "a", "a", "a", "b", "b", "c", "c"],
        # a: non-null {10, 20, 30} -> median rank ceil(3/2)=2 -> 20
        # b: non-null {7} -> 7;  c: ALL NULL -> stays NULL
        "v": pd.array([10, None, 20, 30, None, 7, None, None],
                      dtype="Int64"),
    })
    out = impute_group_median(
        ray.data.from_pandas(df).repartition(4), key="g", col="v",
    ).to_pandas().sort_values("id").set_index("id")
    assert out["v"].tolist()[:6] == [10, 20, 20, 30, 7, 7]
    assert out.loc[7, "v"] is pd.NA and out.loc[8, "v"] is pd.NA
    assert out["was_null"].tolist() == [
        False, True, False, False, True, False, True, True]


def test_decayed_score_shift_kernel_and_cap():
    from htrc_feature_reader_ray.stages.temporal import decayed_score

    base = pd.Timestamp("2026-01-10")
    df = pd.DataFrame({
        "u": [1, 1, 1, 2],
        "ts": [base, base - pd.Timedelta(days=1),
               base - pd.Timedelta(days=2), base - pd.Timedelta(days=200)],
        "amount": [10.00, 10.00, 10.00, 10.00],
    })
    out = decayed_score(
        ray.data.from_pandas(df).repartition(3),
        key="u", ts="ts", amount_col="amount",
    ).to_pandas().set_index("u")
    # 1000 + 1000>>1 + 1000>>2 = 1000 + 500 + 250
    assert out.loc[1, "decayed_cents"] == 1750
    assert out.loc[1, "n_events"] == 3
    # age 200 days -> shift capped at 62 -> exactly 0
    assert out.loc[2, "decayed_cents"] == 0


def test_grouped_mad_hand_fixture():
    from htrc_feature_reader_ray.stages.profile import grouped_mad

    # g1: values 1..7 plus outlier 100 -> med ceil-rank(8/2)=4th = 4;
    # dev sorted: 0,1,1,2,2,3,3,96 -> mad = 2; outliers: dev > 6 -> {100}
    df = pd.DataFrame({
        "g": ["g1"] * 8 + ["g2"] * 2,
        "v": [1, 2, 3, 4, 5, 6, 7, 100, 5, 5],
    })
    out = grouped_mad(
        ray.data.from_pandas(df).repartition(4), key="g", col="v", k=3,
    ).to_pandas().set_index("g")
    assert out.loc["g1", ["n", "median", "mad", "n_outliers"]].tolist() == \
        [8, 4, 2, 1]
    # constant group: mad 0, strict > keeps outliers at 0
    assert out.loc["g2", ["n", "median", "mad", "n_outliers"]].tolist() == \
        [2, 5, 0, 0]


def test_contingency_chi2_independent_and_skewed():
    from htrc_feature_reader_ray.stages.profile import contingency_chi2

    # perfectly independent 2x2 -> every chi2 term exactly 0
    ind = pd.DataFrame({
        "a": ["x"] * 4 + ["y"] * 4,
        "b": ["p", "p", "q", "q"] * 2,
    })
    out = contingency_chi2(
        ray.data.from_pandas(ind).repartition(3), k1="a", k2="b"
    ).sort_values(["a", "b"]).reset_index(drop=True)
    assert out["observed"].tolist() == [2, 2, 2, 2]
    assert out["chi2_term"].tolist() == [0.0, 0.0, 0.0, 0.0]

    # skewed cell: verify against the exact rational formula
    sk = pd.DataFrame({
        "a": ["x", "x", "x", "y"],
        "b": ["p", "p", "q", "q"],
    })
    out2 = contingency_chi2(
        ray.data.from_pandas(sk), k1="a", k2="b"
    ).set_index(["a", "b"])
    # cell (x,p): o=2, rt=3, ct=2, n=4 -> (8-6)^2/(4*3*2)
    assert out2.loc[("x", "p"), "chi2_term"] == float(4) / float(24)


def test_association_rules_hand_baskets():
    from htrc_feature_reader_ray.stages.assoc import association_rules

    # baskets: {A,B} x3, {A,C}, {B,C}, {A}, {D}  -> N=7
    rows = []
    for k, items in enumerate(
            [("A", "B"), ("A", "B"), ("A", "B"), ("A", "C"),
             ("B", "C"), ("A",), ("D",)]):
        rows += [(k, it) for it in items]
    df = pd.DataFrame(rows, columns=["basket", "item"])
    out = association_rules(
        ray.data.from_pandas(df).repartition(3),
        key_col="basket", member_col="item", min_shared=2,
    ).to_pandas().set_index(["item_a", "item_b"])
    r = out.loc[("A", "B")]
    # n_joint=3, n_a=5, n_b=4, N=7
    assert r[["n_joint", "n_a", "n_b"]].tolist() == [3, 5, 4]
    assert r["support_ppm"] == 3 * 1_000_000 // 7
    assert r["conf_a_to_b_ppm"] == 3 * 1_000_000 // 5
    assert r["conf_b_to_a_ppm"] == 3 * 1_000_000 // 4
    assert r["lift_ppm"] == 3 * 7 * 1_000_000 // (5 * 4)
    # pairs sharing only one basket are below min_shared
    assert ("A", "C") not in out.index


def test_association_rules_paths_equal():
    from htrc_feature_reader_ray.stages.assoc import association_rules

    rows = []
    for k, items in enumerate(
            [("A", "B", "C"), ("A", "B"), ("B", "C"), ("A", "C"),
             ("A", "B"), ("D",)]):
        rows += [(k, it) for it in items]
    df = pd.DataFrame(rows, columns=["basket", "item"])
    ds = ray.data.from_pandas(df).repartition(3)
    out = {}
    for path in ("broadcast", "join"):
        out[path] = (
            association_rules(ds, key_col="basket", member_col="item",
                              min_shared=2, counts_path=path)
            .to_pandas().sort_values(["item_a", "item_b"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(
        out["broadcast"], out["join"][out["broadcast"].columns])


def test_pivot_counts_composite_key_weighted():
    from htrc_feature_reader_ray.stages.profile import pivot_counts

    df = pd.DataFrame({
        "k1": ["u", "u", "u", "v"],
        "k2": [1, 1, 2, 1],
        "cat": ["a", "a", "b", "a"],
        "w": [10, 5, 7, 2],
    })
    out = (
        pivot_counts(ray.data.from_pandas(df).repartition(3),
                     key=["k1", "k2"], cat_col="cat",
                     categories=("a", "b"), value_col="w")
        .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    )
    assert list(out.columns) == ["k1", "k2", "n_a", "n_b"]
    assert out.values.tolist() == [
        ["u", 1, 15, 0], ["u", 2, 0, 7], ["v", 1, 2, 0]]


def test_table_audit_nulls_and_exact_small_distinct():
    from htrc_feature_reader_ray.stages.profile import table_audit

    df = pd.DataFrame({
        "a": [1, 2, 2, None],
        "b": ["x", "x", None, None],
    })
    out = table_audit(
        ray.data.from_pandas(df).repartition(2), columns=["a", "b"]
    ).set_index("col_name")
    assert out.loc["a", ["n", "n_null"]].tolist() == [4, 1]
    assert out.loc["b", ["n", "n_null"]].tolist() == [4, 2]
    # HLL with m=64 registers is near-exact at these cardinalities
    assert 1 <= out.loc["a", "registers_used"] <= 2
    assert out.loc["b", "registers_used"] == 1


def test_winsorize_group_hand_fixture():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import winsorize_group

    df = pd.DataFrame({
        "id": range(10),
        "k": ["a"] * 10,
        "v": [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000],
    })
    out = winsorize_group(
        ray.data.from_pandas(df).repartition(3), key="k", col="v",
        q_lo=0.1, q_hi=0.9,
    ).to_pandas().sort_values("id")
    # quantile_disc(0.1)=ceil(1)=1st value=1; 0.9 -> 9th value = 9
    assert out["v_winsor"].tolist() == [1, 2, 3, 4, 5, 6, 7, 8, 9, 9]


def test_quantile_transform_ties_and_singleton():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import (
        quantile_transform_group,
    )

    df = pd.DataFrame({
        "id": range(6),
        "k": ["a", "a", "a", "a", "b", "c"],
        "v": [10, 20, 20, 30, 7, 7],
    })
    out = quantile_transform_group(
        ray.data.from_pandas(df).repartition(2), key="k", col="v",
    ).to_pandas().set_index("id")
    # group a (n=4): ranks 1,2,2,4 -> (r-1)*1e6//3
    assert out.loc[0, "q_ppm"] == 0
    assert out.loc[1, "q_ppm"] == 333333
    assert out.loc[2, "q_ppm"] == 333333
    assert out.loc[3, "q_ppm"] == 1000000
    # singleton groups map to 0 (den guard)
    assert out.loc[4, "q_ppm"] == 0
    assert out.loc[5, "q_ppm"] == 0


def test_target_encoding_smoothing():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.profile import target_encoding

    df = pd.DataFrame({
        "cat": ["x"] * 8 + ["rare"],
        "label": [100] * 8 + [9000],
    })

    def lab(t: pa.Table):
        return t.column("label").to_numpy().astype(np.int64)

    out = target_encoding(
        ray.data.from_pandas(df).repartition(2),
        cat_col="cat", label_expr=lab, m=10,
    ).to_pandas().set_index("cat")
    mu = (800 + 9000) // 9  # 1088
    assert out.loc["x", "enc"] == (800 + 10 * mu) // 18
    # the rare category is pulled hard toward the prior
    assert out.loc["rare", "enc"] == (9000 + 10 * mu) // 11
    assert out.loc["rare", "n"] == 1


def test_log2_bucketize_exact_boundaries():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import log2_bucketize

    df = pd.DataFrame({
        "id": range(8),
        "v": [0, 1, 2, 3, 4, 1023, 1024, -5],
    })
    out = log2_bucketize(
        ray.data.from_pandas(df).repartition(2), col="v",
    ).to_pandas().sort_values("id")
    assert out["log2_bucket"].tolist() == [-1, 0, 1, 1, 2, 9, 10, -1]


def test_log2_bucketize_exact_past_2_53():
    # the float-log failure zone: 2^60 and 2^60 - 1 must split buckets
    import ray.data

    from htrc_feature_reader_ray.stages.profile import log2_bucketize

    df = pd.DataFrame({"id": [0, 1], "v": [(1 << 60) - 1, 1 << 60]})
    out = log2_bucketize(
        ray.data.from_pandas(df), col="v").to_pandas().sort_values("id")
    assert out["log2_bucket"].tolist() == [59, 60]


def test_collapse_rare_hand_fixture():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import collapse_rare

    df = pd.DataFrame({
        "id": range(7),
        "cat": ["a", "a", "a", "b", "b", "c", "d"],
    })
    out = collapse_rare(
        ray.data.from_pandas(df).repartition(2), cat_col="cat",
        min_count=2,
    ).to_pandas().sort_values("id")
    assert out["cat_c"].tolist() == [
        "a", "a", "a", "b", "b", "__other__", "__other__"]


def test_target_encoding_loo_hand_fixture():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.profile import target_encoding_loo

    df = pd.DataFrame({
        "id": range(4),
        "cat": ["x", "x", "x", "solo"],
        "label": [100, 200, 300, 9000],
    })

    def lab(t: pa.Table):
        return t.column("label").to_numpy().astype(np.int64)

    out = target_encoding_loo(
        ray.data.from_pandas(df).repartition(2),
        cat_col="cat", label_expr=lab, m=10,
    ).to_pandas().set_index("id")
    mu = 9600 // 4  # 2400
    assert out.loc[0, "enc_loo"] == (600 - 100 + 10 * mu) // 12
    assert out.loc[1, "enc_loo"] == (600 - 200 + 10 * mu) // 12
    # singleton category: pure prior (n-1=0, only the pseudo-count)
    assert out.loc[3, "enc_loo"] == (10 * mu) // 10


def test_cube_rollup_lattice_hand_check():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import cube_rollup

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", "q"],
        "v": [1, 2, 4, 8, 16],
    })
    got = cube_rollup(
        ray.data.from_pandas(df).repartition(3),
        dims=["a", "b"],
        aggs={"n": ("v", "count"), "sv": ("v", "sum")})
    assert len(got) == 4 + 2 + 2 + 1  # cells + two rollups + grand total
    gt = got[got["a"].isna() & got["b"].isna()].iloc[0]
    assert (gt["n"], gt["sv"]) == (5, 31)
    ya = got[(got["a"] == "y") & got["b"].isna()].iloc[0]
    assert (ya["n"], ya["sv"]) == (3, 28)
    yp = got[(got["a"] == "y") & (got["b"] == "p")].iloc[0]
    assert (yp["n"], yp["sv"]) == (2, 12)
    pb = got[got["a"].isna() & (got["b"] == "p")].iloc[0]
    assert (pb["n"], pb["sv"]) == (3, 13)


def test_grouped_gini_reference_values():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import grouped_gini

    # g=eq: all equal -> 0; g=max: one holder -> (n-1)/n; g=zero: sum 0
    df = pd.DataFrame({
        "g": ["eq"] * 4 + ["max"] * 5 + ["zero"] * 3,
        "v": [7, 7, 7, 7] + [0, 0, 0, 0, 100] + [0, 0, 0],
    })
    got = (
        grouped_gini(ray.data.from_pandas(df).repartition(3),
                     group_cols=["g"], value_col="v")
        .to_pandas().set_index("g")
    )
    assert got.loc["eq", "gini_ppm"] == 0
    assert got.loc["max", "gini_ppm"] == 4 * 1_000_000 // 5
    assert got.loc["zero", "gini_ppm"] == 0
    # scalar reference on a mixed group
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1000, 50)
    x = np.sort(vals)
    i = np.arange(1, 51)
    want = int(((2 * i - 50 - 1) * x).sum()) * 1_000_000 // (50 * int(x.sum()))
    df2 = pd.DataFrame({"g": ["m"] * 50, "v": vals})
    got2 = grouped_gini(ray.data.from_pandas(df2).repartition(4),
                        group_cols=["g"], value_col="v").to_pandas()
    assert got2["gini_ppm"].iloc[0] == want


def test_pareto_rank_head_flag_and_ties():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import pareto_rank

    df = pd.DataFrame({"k": ["a"] * 6 + ["b"] * 3 + ["c"],
                       "w": [10] * 6 + [10] * 3 + [10]})
    got = pareto_rank(ray.data.from_pandas(df).repartition(3),
                      key_col="k", weight_col="w",
                      threshold_ppm=800_000)
    # weights: a=60, b=30, c=10; cum ppm 600000, 900000, 1000000
    assert got["k"].tolist() == ["a", "b", "c"]
    assert got["cum_ppm"].tolist() == [600000, 900000, 1000000]
    assert got["in_head"].tolist() == [1, 1, 0]  # b first to reach 80%


def test_fk_violations_and_topn_collapse():
    import ray.data

    from htrc_feature_reader_ray.stages.profile import (
        fk_violations,
        topn_collapse,
    )

    child = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2, 3, 9, 9, 9]})).repartition(3)
    parent = ray.data.from_pandas(pd.DataFrame(
        {"pk": [1, 2, 4]})).repartition(2)
    got = (
        fk_violations(child, parent, child_key="k", parent_key="pk")
        .to_pandas().set_index("k").sort_index()
    )
    assert got["n_rows"].to_dict() == {3: 1, 9: 3}
    # broadcast fast path (dimension-sized parent) pinned equal to the
    # co-partitioned join path
    bc = (
        fk_violations(child, parent, child_key="k", parent_key="pk",
                      parent_rows=3)
        .to_pandas().set_index("k").sort_index()
    )
    assert bc["n_rows"].to_dict() == got["n_rows"].to_dict()
    import pytest

    with pytest.raises(ValueError):
        fk_violations(child, parent, child_key="k", parent_key="pk",
                      method="broadcast", broadcast_limit=2).to_pandas()

    df = pd.DataFrame({
        "g": ["x"] * 10 + ["y"] * 3,
        "s": ["p"] * 5 + ["q"] * 3 + ["r", "t"] + ["p", "q", "q"],
    })
    tc = (
        topn_collapse(ray.data.from_pandas(df).repartition(4),
                      group_cols=["g"], key_col="s", n=2)
        .to_pandas().set_index(["g", "s"]).sort_index()
    )
    assert tc.loc[("x", "p"), "n_rows"] == 5
    assert tc.loc[("x", "q"), "n_rows"] == 3
    assert tc.loc[("x", "__other__"), "n_rows"] == 2
    # y has only 2 distinct keys -> no __other__ row
    assert ("y", "__other__") not in tc.index
    assert tc.loc[("y", "q"), "n_rows"] == 2


# ---------------------------------------------------------------------------
# exact two-pass heavy hitters


def _hh_ds(vals, parts=7):
    return ray.data.from_arrow(
        pa.table({"k": pa.array(vals, type=pa.string())})
    ).repartition(parts)


def test_heavy_hitters_exact_on_skew():
    # zipf-ish skew: 'hot' 40%, 'warm' 15%, long uniform tail
    vals = (["hot"] * 400 + ["warm"] * 150
            + [f"t{i}" for i in range(450)])
    from htrc_feature_reader_ray.stages.profile import heavy_hitters

    out = heavy_hitters(_hh_ds(vals), col="k", k=10).to_pandas()
    got = dict(zip(out["k"], out["n"]))
    # exact definition: count*k > N  (N=1000, k=10 -> count > 100)
    assert got == {"hot": 400, "warm": 150}


def test_heavy_hitters_candidate_union_is_lossless():
    # adversarial: the heavy key is spread thin across partitions so no
    # single partition makes it look dominant relative to OTHER keys,
    # yet it exceeds B/k somewhere by the union bound.
    vals = []
    for p in range(10):
        vals += [f"u{p}_{i}" for i in range(80)] + ["heavy"] * 20
    from htrc_feature_reader_ray.stages.profile import heavy_hitters

    out = heavy_hitters(_hh_ds(vals, parts=10), col="k", k=6).to_pandas()
    got = dict(zip(out["k"], out["n"]))
    # N=1000, threshold N/6=166.7 -> only 'heavy' (200) qualifies
    assert got == {"heavy": 200}


def test_heavy_hitters_empty_answer():
    vals = [f"v{i}" for i in range(300)]  # all distinct
    from htrc_feature_reader_ray.stages.profile import heavy_hitters

    out = heavy_hitters(_hh_ds(vals), col="k", k=50).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# temperature-rebalanced mixture weights


def test_temperature_weights_isqrt_exact():
    import math

    from htrc_feature_reader_ray.stages.sample import temperature_weights

    counts = {"en": 900, "de": 100, "yo": 4}
    rows = [lang for lang, n in counts.items() for _ in range(n)]
    ds = ray.data.from_arrow(
        pa.table({"lang": pa.array(rows, type=pa.string())})
    ).repartition(6)
    out = temperature_weights(ds, stratum_col="lang").to_pandas()
    out = out.set_index("lang")
    denom = sum(math.isqrt(n) for n in counts.values())  # 30+10+2 = 42
    for lang, n in counts.items():
        assert out.loc[lang, "n_rows"] == n
        assert out.loc[lang, "weight_ppm"] == math.isqrt(n) * 10**6 // denom
    # flattening: en is 89.6% of docs but only ~71% of the sample weight
    assert out.loc["en", "weight_ppm"] < 900_000 // 1  # sanity
    assert out.loc["yo", "weight_ppm"] * 225 > out.loc["en", "weight_ppm"]


# ---------------------------------------------------------------------------
# exact grouped ROC-AUC (Mann-Whitney)


def _auc_brute(scores, labels):
    """Pair-counting AUC with ties = 1/2, in exact doubled integers."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    two_u = sum(2 if p > n else (1 if p == n else 0)
                for p in pos for n in neg)
    return two_u * 10**6 // (2 * len(pos) * len(neg))


def test_grouped_auc_matches_pair_counting_with_ties():
    from htrc_feature_reader_ray.stages.profile import grouped_auc

    rng = np.random.RandomState(11)
    rows = []
    for g in ("a", "b", "c"):
        n = 200
        scores = rng.randint(0, 25, size=n)  # heavy ties
        labels = rng.randint(0, 2, size=n)
        rows += [(g, int(s), int(y)) for s, y in zip(scores, labels)]
    df = pd.DataFrame(rows, columns=["g", "s", "y"])
    ds = ray.data.from_pandas(df).repartition(7)
    out = grouped_auc(ds, group_col="g", label_col="y",
                      score_col="s").to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        assert out.loc[g, "auc_ppm"] == _auc_brute(
            sub["s"].tolist(), sub["y"].tolist()), g
        assert out.loc[g, "n_pos"] == int(sub["y"].sum())


def test_grouped_auc_perfect_and_degenerate():
    from htrc_feature_reader_ray.stages.profile import grouped_auc

    df = pd.DataFrame({
        "g": ["p"] * 6 + ["onecls"] * 3,
        "s": [1, 2, 3, 10, 11, 12, 5, 5, 5],
        "y": [0, 0, 0, 1, 1, 1, 1, 1, 1],
    })
    out = grouped_auc(ray.data.from_pandas(df).repartition(4),
                      group_col="g", label_col="y",
                      score_col="s").to_pandas()
    assert set(out["g"]) == {"p"}  # single-class group dropped
    assert out.set_index("g").loc["p", "auc_ppm"] == 1_000_000


def test_mixture_interleave_stride_schedule():
    import duckdb

    from htrc_feature_reader_ray.stages.sample import (
        mixture_interleave,
        mixture_interleave_sql,
    )

    df = pd.DataFrame({
        "doc_id": np.arange(240, dtype=np.int64),
        "source": [f"s{i % 3}" for i in range(240)],
    })
    W = {"s0": 5, "s1": 2, "s2": 1}
    ds = ray.data.from_pandas(df).repartition(4)
    eng = (mixture_interleave(ds, source_col="source", id_col="doc_id",
                              weights=W).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.execute(mixture_interleave_sql(
        source_col="source", id_col="doc_id", weights=W)).df()
        .sort_values("doc_id").reset_index(drop=True))
    cols = ["doc_id", "source", "src_rank", "mix_key"]
    pd.testing.assert_frame_equal(eng[cols], sql[cols])

    # stride guarantee: every weight-multiple prefix of the order is
    # EXACTLY proportional (low-discrepancy interleave) — while no
    # source is exhausted (80 items each; s0 runs dry past P=128)
    order = eng.sort_values(["mix_key", "source", "src_rank"])
    for P in (8, 80, 120):
        cnt = order.head(P)["source"].value_counts()
        for s, w in W.items():
            assert cnt.get(s, 0) == P * w // 8, (P, s)
    # per-source ranks are dense 0..n-1 under the md5 order
    for s, grp in eng.groupby("source"):
        assert sorted(grp["src_rank"]) == list(range(len(grp)))
    # unknown source fails loudly
    import pytest

    with pytest.raises(KeyError):
        mixture_interleave(
            ds, source_col="source", id_col="doc_id",
            weights={"s0": 1, "s1": 1}).materialize()
    with pytest.raises(ValueError):
        mixture_interleave(ds, source_col="source", id_col="doc_id",
                           weights={"s0": 0, "s1": 1, "s2": 1})


def test_hash_cross_namespaces_and_sign():
    import duckdb

    from htrc_feature_reader_ray.stages.profile import (
        hash_cross,
        hash_cross_sql,
    )

    df = pd.DataFrame({
        "doc_id": range(8),
        "lang": ["en", "fr", "en", "de", "en", "fr", "de", "en"],
        "source": [f"s{i % 3}" for i in range(8)],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    kw = dict(id_col="doc_id", cols=["lang", "source"],
              quadratic=[("lang", "source")], dims=32)
    eng = (hash_cross(ds, **kw).to_pandas()
           .sort_values(["doc_id", "dim"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    sql = (con.execute(hash_cross_sql(table="t", **kw)).df()
           .sort_values(["doc_id", "dim"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, sql)

    # 3 features per row (2 singles + 1 cross), each with |value| == 1
    # barring same-dim collisions
    per_doc = eng.groupby("doc_id")["value"].apply(
        lambda v: v.abs().sum())
    assert (per_doc <= 3).all() and (per_doc >= 1).all()
    # namespacing: equal VALUES in different columns hash apart — rows
    # with lang=='en' and source=='s0' share no forced dim collision
    import pytest

    with pytest.raises(ValueError):
        hash_cross(ds, id_col="doc_id", cols=["lang"],
                   quadratic=[("lang", "source")])


def test_grouped_emd_exact_and_sql():
    import duckdb

    from htrc_feature_reader_ray.stages.profile import (
        grouped_emd,
        grouped_emd_sql,
    )

    # corpus: values 1,1,3,5 (N=4); group A = {1,1}, group B = {3,5}
    # support 1,3,5; gaps 2,2
    # F_A = 1, 1, 1;  F = 1/2, 3/4, 1;  F_B = 0, 1/2, 1
    # W1_A = (1/2)*2 + (1/4)*2 = 1.5 -> 1_500_000 ppm
    # W1_B = (1/2)*2 + (1/4)*2 = 1.5 -> 1_500_000 ppm
    df = pd.DataFrame({"g": ["A", "A", "B", "B"], "v": [1, 1, 3, 5]})
    ds = ray.data.from_pandas(df).repartition(2)
    out = (grouped_emd(ds, group_col="g", value_col="v").to_pandas()
           .set_index("g").sort_index())
    assert out.loc["A", "emd_ppm"] == 1_500_000
    assert out.loc["B", "emd_ppm"] == 1_500_000
    assert out["n_rows"].tolist() == [2, 2]

    # identical distribution -> 0; single-value support -> 0 rows kept
    df2 = pd.DataFrame({"g": ["A", "B"], "v": [7, 7]})
    out2 = (grouped_emd(ray.data.from_pandas(df2), group_col="g",
                        value_col="v").to_pandas().set_index("g"))
    assert out2["emd_ppm"].tolist() == [0, 0]

    con = duckdb.connect()
    con.register("t", df)
    sql = (con.execute(
        grouped_emd_sql(table="t", group="g", value_expr="v")).df()
        .set_index("g").sort_index())
    pd.testing.assert_frame_equal(out, sql)
    con.register("t2", df2)
    sql2 = (con.execute(
        grouped_emd_sql(table="t2", group="g", value_expr="v")).df()
        .set_index("g").sort_index())
    pd.testing.assert_frame_equal(out2, sql2)


def test_k_anonymity_exact_violations():
    from htrc_feature_reader_ray.stages.profile import k_anonymity

    # group A: 6 rows, 3 users -> compliant (k=5, l=2)
    # group B: 3 rows, 3 users -> k-violation (size < 5)
    # group C: 7 rows, 1 user  -> l-violation (large but single subject)
    rows = (
        [("A", u) for u in [1, 2, 3, 1, 2, 3]]
        + [("B", u) for u in [4, 5, 6]]
        + [("C", 7)] * 7
    )
    df = pd.DataFrame(rows, columns=["qi", "user"])
    ds = ray.data.from_pandas(df)
    out = (
        k_anonymity(ds, qi_cols=["qi"], sensitive_col="user", k=5, l_div=2)
        .to_pandas().sort_values("qi").reset_index(drop=True)
    )
    assert out["qi"].tolist() == ["B", "C"]
    assert out["group_size"].tolist() == [3, 7]
    assert out["n_sensitive"].tolist() == [3, 1]
    assert str(out["group_size"].dtype) == "int64"
    # partition invariance: distinct counting stays exact when a group's
    # rows split across many blocks
    out2 = (
        k_anonymity(ray.data.from_pandas(df).repartition(8),
                    qi_cols=["qi"], sensitive_col="user", k=5, l_div=2)
        .to_pandas().sort_values("qi").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_k_anonymity_composite_qi():
    from htrc_feature_reader_ray.stages.profile import k_anonymity

    # same first component, different second: must NOT merge
    df = pd.DataFrame({
        "a": ["x"] * 10, "b": [0] * 5 + [1] * 5,
        "user": [1, 2, 3, 4, 5, 6, 6, 6, 6, 6],
    })
    out = (
        k_anonymity(ray.data.from_pandas(df), qi_cols=["a", "b"],
                    sensitive_col="user", k=5, l_div=2)
        .to_pandas()
    )
    # (x,0): 5 rows 5 users -> ok; (x,1): 5 rows 1 user -> l-violation
    assert len(out) == 1
    assert out.iloc[0]["b"] == 1 and out.iloc[0]["n_sensitive"] == 1


def test_benford_constants_match_log10():
    import math

    from htrc_feature_reader_ray.stages.profile import BENFORD_PPM

    for d, ppm in BENFORD_PPM.items():
        assert ppm == math.floor(math.log10(1 + 1 / d) * 1_000_000)
    assert sum(BENFORD_PPM.values()) == 999995  # floors lose 5 ppm


def test_benford_audit_exact_grid():
    from htrc_feature_reader_ray.stages.profile import benford_audit

    # group g: values with leading digits 1,1,1,9 (incl. power-of-10
    # boundaries 10 and 1000 where float log10 could misround);
    # zeros/negatives excluded
    df = pd.DataFrame({
        "g": ["g"] * 6 + ["h"] * 2,
        "v": [10, 1000, 199, 9, 0, -5, 7, 70],
    })
    out = (
        benford_audit(ray.data.from_pandas(df).repartition(4),
                      group_col="g", value_col="v")
        .to_pandas().sort_values(["g", "digit"]).reset_index(drop=True)
    )
    assert len(out) == 18  # full 9-digit grid per group
    g = out[out.g == "g"].set_index("digit")
    assert g.loc[1, "n"] == 3 and g.loc[9, "n"] == 1
    assert g.loc[2, "n"] == 0  # absent digit present with n=0
    assert g.loc[1, "obs_ppm"] == 3 * 1_000_000 // 4
    h = out[out.g == "h"].set_index("digit")
    assert h.loc[7, "n"] == 2 and h.loc[7, "obs_ppm"] == 1_000_000
    assert (out.benford_ppm[out.digit == 1] == 301029).all()


def test_cohens_kappa_exact():
    from htrc_feature_reader_ray.stages.profile import cohens_kappa

    # classic 2x2: pred/true over 100 rows
    # agree: 45 (a,a) + 30 (b,b); disagree: 15 (a,b pred=a true=b), 10 (b,a)
    rows = ([("a", "a")] * 45 + [("b", "b")] * 30
            + [("a", "b")] * 15 + [("b", "a")] * 10)
    df = pd.DataFrame(rows, columns=["p", "t"])
    out = (
        cohens_kappa(ray.data.from_pandas(df).repartition(7),
                     pred_col="p", true_col="t")
        .to_pandas()
    )
    n, a = 100, 75
    s = 60 * 55 + 40 * 45  # rowmarg(a)=60, colmarg(a)=55; b: 40/45
    want = (n * a - s) * 1_000_000 // (n * n - s)
    assert out.iloc[0]["n"] == n and out.iloc[0]["n_agree"] == a
    assert out.iloc[0]["kappa_ppm"] == want
    # float cross-check of the fixed-point value
    assert abs(want - (0.75 - s / 10000) / (1 - s / 10000) * 1e6) <= 1


def test_cohens_kappa_chance_and_perfect():
    from htrc_feature_reader_ray.stages.profile import cohens_kappa

    # independence: kappa ~ 0 (exactly 0 for this balanced construction)
    rows = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 5
    out = cohens_kappa(ray.data.from_pandas(
        pd.DataFrame(rows, columns=["p", "t"])), pred_col="p",
        true_col="t").to_pandas()
    assert out.iloc[0]["kappa_ppm"] == 0
    # perfect agreement: exactly 1e6
    rows = [("a", "a")] * 3 + [("b", "b")] * 7
    out = cohens_kappa(ray.data.from_pandas(
        pd.DataFrame(rows, columns=["p", "t"])), pred_col="p",
        true_col="t").to_pandas()
    assert out.iloc[0]["kappa_ppm"] == 1_000_000
    # total disagreement with pe=1/2: kappa = -1e6 (clamp boundary)
    rows = [("a", "b")] * 5 + [("b", "a")] * 5
    out = cohens_kappa(ray.data.from_pandas(
        pd.DataFrame(rows, columns=["p", "t"])), pred_col="p",
        true_col="t").to_pandas()
    assert out.iloc[0]["kappa_ppm"] == -1_000_000


def test_shuffle_audit_matches_serial_reference():
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.sample import shuffle_audit

    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "src": np.array(["a", "b", "c"])[np.arange(n) % 3],
    })
    out = (
        shuffle_audit(ray.data.from_pandas(df).repartition(9),
                      id_col="doc_id", cat_col="src", num_buckets=16)
        .to_pandas().sort_values("src").reset_index(drop=True)
    )
    # serial reference: sort by (md5, id), count adjacent same pairs
    h = md5_hash64([str(v) for v in df["doc_id"]])
    order = np.lexsort((df["doc_id"].to_numpy(), h))
    cats = df["src"].to_numpy()[order]
    same = cats[1:] == cats[:-1]
    for _, r in out.iterrows():
        want_adj = int(np.sum(same & (cats[1:] == r["src"])))
        ns = int((df["src"] == r["src"]).sum())
        assert r["n_adj_same"] == want_adj
        assert r["n_rows"] == ns
        assert r["obs_ppm"] == want_adj * 1_000_000 // (n - 1)
        assert r["exp_ppm"] == ns * (ns - 1) * 1_000_000 // (n * (n - 1))
    assert out["n_rows"].sum() == n
    # partitioning invariance (boundary stitching must not depend on
    # block layout)
    out2 = (
        shuffle_audit(ray.data.from_pandas(df).repartition(2),
                      id_col="doc_id", cat_col="src", num_buckets=16)
        .to_pandas().sort_values("src").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_shuffle_audit_detects_clumping():
    from htrc_feature_reader_ray.stages.sample import shuffle_audit

    # ids chosen so category == coarse hash region: category 'hot' holds
    # every row (a single-category corpus), so ALL adjacent pairs are
    # same-pair: obs = 1e6 * (n-1)/(n-1) = 1e6 >> exp
    df = pd.DataFrame({"doc_id": np.arange(50), "src": ["hot"] * 50})
    out = shuffle_audit(ray.data.from_pandas(df), id_col="doc_id",
                        cat_col="src").to_pandas()
    assert out.iloc[0]["n_adj_same"] == 49
    assert out.iloc[0]["obs_ppm"] == 1_000_000


def test_grouped_ks_exact_vs_scipy_style_reference():
    from htrc_feature_reader_ray.stages.profile import grouped_ks

    rng = np.random.RandomState(3)
    # group a: values 0..9 uniform; group b: shifted 5..14 uniform
    va = rng.randint(0, 10, 300)
    vb = rng.randint(5, 15, 200)
    df = pd.DataFrame({
        "g": ["a"] * 300 + ["b"] * 200,
        "v": np.concatenate([va, vb]).astype(np.int64),
    })
    out = (
        grouped_ks(ray.data.from_pandas(df).repartition(7),
                   group_col="g", value_col="v")
        .to_pandas().set_index("g")
    )
    # serial two-sample KS of each group vs the rest over the support
    support = np.sort(df["v"].unique())
    for g, other in (("a", vb), ("b", va)):
        mine = df.loc[df.g == g, "v"].to_numpy()
        fg = np.array([(mine <= s).sum() for s in support]) / len(mine)
        fr = np.array([(other <= s).sum() for s in support]) / len(other)
        want = int(np.max(np.abs(fg - fr)) * 1e6)  # exact: denom divides
        got = int(out.loc[g, "ks_ppm"])
        assert abs(got - want) <= 1  # float reference rounding only
        assert out.loc[g, "n_rows"] == len(mine)
    # one group == whole corpus -> ks 0 by contract
    solo = pd.DataFrame({"g": ["x"] * 10, "v": range(10)})
    o2 = grouped_ks(ray.data.from_pandas(solo), group_col="g",
                    value_col="v").to_pandas()
    assert o2.iloc[0]["ks_ppm"] == 0


def test_grouped_ks_identical_groups_zero():
    from htrc_feature_reader_ray.stages.profile import grouped_ks

    df = pd.DataFrame({"g": ["a"] * 50 + ["b"] * 50,
                       "v": list(range(50)) * 2})
    out = grouped_ks(ray.data.from_pandas(df), group_col="g",
                     value_col="v").to_pandas()
    assert (out["ks_ppm"] == 0).all()


def test_unimax_epochs_water_filling():
    from htrc_feature_reader_ray.stages.sample import unimax_epochs

    # sources: tiny=10, small=100, big=1000 tokens; budget 600, cap 4
    # ascending walk: tiny quota 600//3=200 -> capped at 40, rem 560
    #                 small quota 560//2=280 -> capped at 400? min(400,280)=280
    #                 big quota 280//1=280 -> min(4000,280)=280
    df = pd.DataFrame({
        "src": ["tiny"] * 1 + ["small"] * 2 + ["big"] * 4,
        "w": [10, 40, 60, 250, 250, 250, 250],
    })
    out = (
        unimax_epochs(ray.data.from_pandas(df).repartition(3),
                      group_col="src", weight_col="w",
                      budget=600, max_epochs=4)
        .to_pandas().set_index("src")
    )
    assert out.loc["tiny", "n_tokens"] == 10
    assert out.loc["tiny", "alloc_tokens"] == 40   # 4 epochs, cap binds
    assert out.loc["tiny", "epochs_ppm"] == 4_000_000
    assert out.loc["small", "alloc_tokens"] == 280  # budget binds
    assert out.loc["small", "epochs_ppm"] == 2_800_000
    assert out.loc["big", "alloc_tokens"] == 280
    assert out.loc["big", "epochs_ppm"] == 280_000
    assert out["alloc_tokens"].sum() == 600  # budget exhausted


def test_unimax_epochs_cap_slack_and_zero_source():
    from htrc_feature_reader_ray.stages.sample import unimax_epochs

    # budget larger than every cap: slack remains, every source capped
    df = pd.DataFrame({"src": ["a", "b", "z"], "w": [10, 20, 0]})
    out = unimax_epochs(ray.data.from_pandas(df), group_col="src",
                        weight_col="w", budget=10_000,
                        max_epochs=2).to_pandas().set_index("src")
    assert out.loc["a", "alloc_tokens"] == 20
    assert out.loc["b", "alloc_tokens"] == 40
    assert out.loc["z", "alloc_tokens"] == 0
    assert out.loc["z", "epochs_ppm"] == 0  # zero-token contract


def test_temporal_split_purge_invariant():
    from htrc_feature_reader_ray.stages.sample import temporal_split

    t0 = pd.Timestamp("2024-01-01").value // 1000
    ts = (t0 + np.arange(0, 100) * 3_600_000_000).astype(
        "datetime64[us]")  # 100 hourly events
    df = pd.DataFrame({"event_id": np.arange(100, dtype=np.int64),
                       "ts": ts})
    out = temporal_split(
        ray.data.from_pandas(df).repartition(5), ts_col="ts",
        test_num=1, test_den=4, embargo_us=5 * 3_600_000_000,
    ).to_pandas()
    # span = 99h; cut = t0 + 99*3//4 h = t0+74.25h -> ts>=cut means idx>=75
    assert set(out.loc[out.split == "test", "event_id"]) == set(range(75, 100))
    # train ends 5h before the cut: idx*1h < 74.25-5 -> idx <= 69
    assert set(out.loc[out.split == "train", "event_id"]) == set(range(0, 70))
    assert set(out.loc[out.split == "embargo", "event_id"]) == set(
        range(70, 75))
    # purge invariant: no train row within embargo of any test row
    tr = out.loc[out.split == "train", "ts"].max()
    te = out.loc[out.split == "test", "ts"].min()
    assert (te - tr).value // 1000 >= 5 * 3_600_000_000


def test_temporal_split_degenerate_single_instant():
    from htrc_feature_reader_ray.stages.sample import temporal_split

    df = pd.DataFrame({"event_id": [1, 2],
                       "ts": pd.to_datetime(["2024-01-01"] * 2)})
    out = temporal_split(ray.data.from_pandas(df), ts_col="ts").to_pandas()
    assert (out["split"] == "test").all()  # zero span -> cut == mn


def test_kendall_tau_exact_vs_scipy_style_reference():
    from htrc_feature_reader_ray.stages.profile import kendall_tau

    rng = np.random.RandomState(11)
    x = rng.randint(0, 40, 250).astype(np.int64)
    noise = rng.randint(-6, 7, 250)
    y = (x + noise).astype(np.int64)  # positively rank-associated
    df = pd.DataFrame({"g": ["a"] * 250, "x": x, "y": y})
    out = kendall_tau(ray.data.from_pandas(df).repartition(5),
                      group_col="g", x_col="x", y_col="y").to_pandas()
    # brute force tau-a on the same (unquantized: qx=qy=1) values
    C = D = 0
    for i in range(250):
        for j in range(i + 1, 250):
            dx, dy = x[j] - x[i], y[j] - y[i]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    n0 = 250 * 249 // 2
    want = (C - D + n0) * 1_000_000 // n0 - 1_000_000
    assert int(out.iloc[0]["tau_ppm"]) == want
    assert int(out.iloc[0]["n_rows"]) == 250
    assert want > 500_000  # sanity: strong positive association


def test_kendall_tau_extremes_and_singleton():
    from htrc_feature_reader_ray.stages.profile import kendall_tau

    x = np.arange(60, dtype=np.int64)
    df = pd.DataFrame({
        "g": ["up"] * 60 + ["down"] * 60 + ["solo"],
        "x": np.concatenate([x, x, [0]]),
        "y": np.concatenate([x * 3, -x, [5]]),
    })
    out = kendall_tau(ray.data.from_pandas(df), group_col="g",
                      x_col="x", y_col="y").to_pandas().set_index("g")
    assert out.loc["up", "tau_ppm"] == 1_000_000
    assert out.loc["down", "tau_ppm"] == -1_000_000
    assert out.loc["solo", "tau_ppm"] == 0  # m<2 contract


def test_eval_quota_hamilton_exact_and_deterministic():
    from htrc_feature_reader_ray.stages.sample import eval_quota

    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "lang": ["en"] * 55 + ["de"] * 30 + ["fr"] * 14 + ["xx"],
    })
    out = eval_quota(ray.data.from_pandas(df).repartition(7),
                     stratum_col="lang", id_col="doc_id", k=17,
                     salt="t:").to_pandas()
    assert len(out) == 17  # exact budget
    got = out.groupby("lang").size().to_dict()
    # Hamilton by hand: shares 9.35/5.1/2.38/0.17 -> base 9/5/2/0,
    # leftover 1 -> largest remainder (.38 fr) wins
    assert got == {"en": 9, "de": 5, "fr": 3}
    # determinism across partitioning
    out2 = eval_quota(ray.data.from_pandas(df).repartition(2),
                      stratum_col="lang", id_col="doc_id", k=17,
                      salt="t:").to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # different salt -> (almost surely) different members, same quotas
    out3 = eval_quota(ray.data.from_pandas(df), stratum_col="lang",
                      id_col="doc_id", k=17, salt="u:").to_pandas()
    assert out3.groupby("lang").size().to_dict() == got
    assert sorted(out3["doc_id"]) != sorted(out["doc_id"])


def test_eval_quota_k_equals_n_and_overflow():
    import pytest

    from htrc_feature_reader_ray.stages.sample import eval_quota

    df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                       "lang": ["a"] * 7 + ["b"] * 3})
    out = eval_quota(ray.data.from_pandas(df), stratum_col="lang",
                     id_col="doc_id", k=10).to_pandas()
    assert len(out) == 10  # k == N takes everything
    with pytest.raises(ValueError):
        eval_quota(ray.data.from_pandas(df), stratum_col="lang",
                   id_col="doc_id", k=11)


def test_quantile_normalize_exact_mapping():
    from htrc_feature_reader_ray.stages.profile import quantile_normalize

    # group a: values 0..9 (10 rows); group b: values 100..104 (5 rows)
    df = pd.DataFrame({
        "doc_id": np.arange(15, dtype=np.int64),
        "g": ["a"] * 10 + ["b"] * 5,
        "v": np.concatenate([np.arange(10), np.arange(100, 105)]
                            ).astype(np.int64),
    })
    out = quantile_normalize(
        ray.data.from_pandas(df).repartition(5), group_col="g",
        id_col="doc_id", value_col="v").to_pandas().set_index("doc_id")
    pooled = np.sort(df["v"].to_numpy())
    N = 15
    # group a rank r (0-based) -> pooled[ r*15//10 ]
    for i, r in enumerate(range(10)):
        assert out.loc[i, "norm_v"] == pooled[r * N // 10]
    # group b rank r -> pooled[ r*15//5 ] = pooled[3r]
    for i, r in zip(range(10, 15), range(5)):
        assert out.loc[i, "norm_v"] == pooled[r * N // 5]
    # post-normalization, the two groups' distributions are aligned:
    # both medians land in the pooled middle
    med_a = np.median(out[out.g == "a"]["norm_v"])
    med_b = np.median(out[out.g == "b"]["norm_v"])
    assert abs(med_a - med_b) <= pooled[9] - pooled[4]


def test_quantile_normalize_identity_single_group():
    from htrc_feature_reader_ray.stages.profile import quantile_normalize

    # one group: rank r of m maps to pooled index r*N//m = r (N == m),
    # i.e. the op is the identity
    df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                       "g": ["x"] * 30,
                       "v": np.random.RandomState(5).permutation(30)
                       .astype(np.int64)})
    out = quantile_normalize(ray.data.from_pandas(df), group_col="g",
                             id_col="doc_id", value_col="v").to_pandas()
    assert (out["norm_v"] == out["v"]).all()


def test_effective_sample_size_regimes():
    from htrc_feature_reader_ray.stages.sample import effective_sample_size

    df = pd.DataFrame({
        "g": ["u"] * 10 + ["h"] * 10 + ["z"] * 3,
        "w": ([5] * 10                 # uniform -> ESS = n -> 1e6
              + [100] + [1] * 9        # one heavy row dominates
              + [0, 0, 0]),            # all-zero -> 0 by contract
    })
    out = effective_sample_size(
        ray.data.from_pandas(df).repartition(4), group_col="g",
        weight_col="w").to_pandas().set_index("g")
    assert out.loc["u", "ess_ppm"] == 1_000_000
    # heavy: (109)^2*1e6 // (10*(10000+9))
    assert out.loc["h", "ess_ppm"] == 109 * 109 * 1_000_000 // (10 * 10009)
    assert out.loc["h", "ess_ppm"] < 150_000  # degeneracy visible
    assert out.loc["z", "ess_ppm"] == 0 and out.loc["z", "n_rows"] == 3


def test_peak_hour_share_bot_vs_human():
    from htrc_feature_reader_ray.stages.profile import peak_hour_share

    t0 = pd.Timestamp("2024-01-01")  # midnight -> hour 0
    rows = []
    # user 1 (cron bot): 30 events at 03:xx across days, 2 elsewhere
    for d in range(30):
        rows.append((1, t0 + pd.Timedelta(days=d, hours=3, minutes=d)))
    rows += [(1, t0 + pd.Timedelta(hours=10)),
             (1, t0 + pd.Timedelta(hours=15))]
    # user 2 (human-ish): one event in each of 8 different hours ->
    # tie broken to the smallest hour
    for h in range(8, 16):
        rows.append((2, t0 + pd.Timedelta(hours=h)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = peak_hour_share(
        ray.data.from_pandas(df).repartition(5), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert out.loc[1, "peak_hour"] == 3
    assert out.loc[1, "share_ppm"] == 30 * 1_000_000 // 32
    assert out.loc[2, "peak_hour"] == 8  # smallest hour on ties
    assert out.loc[2, "share_ppm"] == 1_000_000 // 8


def test_datetime_features_iso_convention():
    from htrc_feature_reader_ray.stages.profile import datetime_features

    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3], dtype=np.int64),
        # 2024-01-01 is a Monday; 2024-01-06 Saturday; 2024-01-07 Sunday
        "ts": pd.to_datetime(["2024-01-01 05:30:00",
                              "2024-01-06 23:59:59",
                              "2024-01-07 00:00:00"]),
    })
    out = datetime_features(
        ray.data.from_pandas(df), id_col="event_id", ts="ts"
    ).to_pandas().set_index("event_id")
    assert out.loc[1, "isodow"] == 1 and out.loc[1, "is_weekend"] == 0
    assert out.loc[2, "isodow"] == 6 and out.loc[2, "is_weekend"] == 1
    assert out.loc[3, "isodow"] == 7 and out.loc[3, "is_weekend"] == 1
    assert out.loc[1, "hour"] == 5 and out.loc[2, "hour"] == 23
    assert (out["year"] == 2024).all() and (out["month"] == 1).all()
    assert list(out["dom"]) == [1, 6, 7]


def test_count_encoding_exact():
    from htrc_feature_reader_ray.stages.profile import count_encoding

    df = pd.DataFrame({"c": ["a"] * 6 + ["b"] * 3 + ["z"]})
    out = count_encoding(
        ray.data.from_pandas(df).repartition(4), cat_col="c"
    ).to_pandas().set_index("c")
    assert out.loc["a", "n"] == 6 and out.loc["a", "freq_ppm"] == 600_000
    assert out.loc["b", "freq_ppm"] == 300_000
    assert out.loc["z", "freq_ppm"] == 100_000


def test_hour_concentration_cron_vs_uniform():
    from htrc_feature_reader_ray.stages.profile import hour_concentration

    t0 = pd.Timestamp("2024-01-01")  # midnight -> hour 0
    rows = []
    # user 1 (cron): all 12 events in hour 3 -> HHI = 1e6 exactly
    for d in range(12):
        rows.append((1, t0 + pd.Timedelta(days=d, hours=3)))
    # user 2 (uniform over 24 hours, 1 each) -> HHI = 1e6 // 24 = 41666
    for h in range(24):
        rows.append((2, t0 + pd.Timedelta(hours=h)))
    # user 3: counts (2,1,1) over 3 hours -> 6e6 // 16 = 375000
    rows += [(3, t0), (3, t0),
             (3, t0 + pd.Timedelta(hours=1)),
             (3, t0 + pd.Timedelta(hours=2))]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = hour_concentration(
        ray.data.from_pandas(df).repartition(5), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert out.loc[1, "hhi_ppm"] == 1_000_000
    assert out.loc[1, "active_hours"] == 1
    assert out.loc[2, "hhi_ppm"] == 41_666
    assert out.loc[2, "active_hours"] == 24
    assert out.loc[3, "hhi_ppm"] == 375_000
    assert out.loc[3, "n_events"] == 4


def test_dow_chi2_weekly_vs_uniform():
    from htrc_feature_reader_ray.stages.profile import dow_chi2

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: 7 events on 7 consecutive days (one per weekday bin)
    # -> chi2 = (7*7 - 49)/7 = 0 exactly
    for d in range(7):
        rows.append((1, t0 + pd.Timedelta(days=d)))
    # user 2: 14 events all on the same weekday (every 7 days)
    # -> chi2 = (7*196 - 196)/14 = 84 -> 84e6 ppm (>> 12.59e6 critical)
    for w in range(14):
        rows.append((2, t0 + pd.Timedelta(days=7 * w)))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = dow_chi2(
        ray.data.from_pandas(df).repartition(4), key="user_id", ts="ts"
    ).to_pandas().set_index("user_id")
    assert out.loc[1, "chi2_ppm"] == 0
    assert out.loc[1, "active_days"] == 7
    assert out.loc[2, "chi2_ppm"] == 84_000_000
    assert out.loc[2, "active_days"] == 1


def test_weighted_median_exact():
    from htrc_feature_reader_ray.stages.profile import weighted_median

    df = pd.DataFrame({
        # group 1: values 10(w1), 20(w1), 30(w10) -> W=12, first
        #   2*cumw>=12 at 30 (cumw 12): plain median 20, weighted 30
        # group 2: values 5(w2), 7(w2) -> W=4, 2*2>=4 at 5 (lower)
        # group 3: duplicate values fold: 9 w=1 three times -> 9
        "g": np.array([1, 1, 1, 2, 2, 3, 3, 3], dtype=np.int64),
        "v": np.array([10, 20, 30, 5, 7, 9, 9, 9], dtype=np.int64),
        "w": np.array([1, 1, 10, 2, 2, 1, 1, 1], dtype=np.int64),
    })
    out = weighted_median(
        ray.data.from_pandas(df).repartition(4),
        group_col="g", value_col="v", weight_col="w"
    ).to_pandas().set_index("g")
    assert out.loc[1, "wmedian"] == 30
    assert out.loc[1, "total_weight"] == 12 and out.loc[1, "n_rows"] == 3
    assert out.loc[2, "wmedian"] == 5  # lower median on even weight
    assert out.loc[3, "wmedian"] == 9 and out.loc[3, "n_rows"] == 3


def test_weighted_median_unit_weights_match_quantile_disc():
    from htrc_feature_reader_ray.stages.profile import weighted_median

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 200).astype(np.int64),
        "v": rng.integers(-50, 50, 200).astype(np.int64),
        "w": np.ones(200, dtype=np.int64),
    })
    out = weighted_median(
        ray.data.from_pandas(df).repartition(7),
        group_col="g", value_col="v", weight_col="w"
    ).to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy())
        assert out.loc[g, "wmedian"] == v[(len(v) - 1) // 2]


def test_curriculum_order_stage_then_shuffle():
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.sample import curriculum_order

    df = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "phase": np.repeat([0, 1, 2], 20),
    })
    out = curriculum_order(
        ray.data.from_pandas(df).repartition(7), phase_col="phase",
        id_col="doc_id", salt="s:").to_pandas()
    # permutation of 0..59
    assert sorted(out["curriculum_pos"]) == list(range(60))
    out = out.sort_values("curriculum_pos")
    # stage ordering: all phase 0 before any phase 1 before any phase 2
    assert list(out["phase"]) == sorted(out["phase"])
    # within-phase order == (md5(salt||id), id)
    p0 = out[out.phase == 0]["doc_id"].to_numpy()
    h = md5_hash64([f"s:{v}" for v in p0])
    assert (np.argsort(np.arange(len(p0))) == np.argsort(
        np.lexsort((p0, h)))).all() or list(p0) == [
        x for _, x in sorted(zip(h, p0))]
    # partitioning independence
    out2 = curriculum_order(
        ray.data.from_pandas(df).repartition(2), phase_col="phase",
        id_col="doc_id", salt="s:").to_pandas().sort_values(
        "curriculum_pos")
    assert list(out2["doc_id"]) == list(out["doc_id"])


def test_epoch_assignment_full_and_fractional():
    from htrc_feature_reader_ray.stages.sample import epoch_assignment

    # source A: 10 docs x 10 tokens = 100; B: 40 docs x 10 = 400.
    # budget 700, cap 4: ascending greedy -> A gets min(400, 350)=350?
    # no: A first (n=100): min(4*100, 700//2=350) = 350 -> but alloc
    # capped at 400.. min(400,350)=350 -> A alloc 350 (3.5 epochs),
    # B: min(1600, 350//1)=350 (0.875 epochs)
    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "g": ["A"] * 10 + ["B"] * 40,
        "w": np.full(50, 10, dtype=np.int64),
    })
    out = epoch_assignment(
        ray.data.from_pandas(df).repartition(4), group_col="g",
        weight_col="w", id_col="doc_id", budget=700, max_epochs=4,
        salt="t:").to_pandas()
    a = out[out.g == "A"]
    b = out[out.g == "B"]
    # A: every doc in epochs 0,1,2; ~half in epoch 3
    assert (a.groupby("doc_id")["epoch"].min() == 0).all()
    n3 = (a["epoch"] == 3).sum()
    assert a.groupby("doc_id").size().min() >= 3 and 0 < n3 < 10
    # B: no full epoch; subset of docs in epoch 0 only
    assert set(b["epoch"]) == {0} and 0 < len(b) < 40
    # determinism across partitioning
    out2 = epoch_assignment(
        ray.data.from_pandas(df), group_col="g", weight_col="w",
        id_col="doc_id", budget=700, max_epochs=4, salt="t:").to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_id", "epoch"]].to_numpy()))
    assert key(out) == key(out2)


def test_hdr_quantiles_error_bound_and_exact_small():
    from htrc_feature_reader_ray.stages.profile import hdr_quantiles

    rng = np.random.RandomState(9)
    v = rng.randint(0, 1_000_000, 5000).astype(np.int64)
    df = pd.DataFrame({"g": ["x"] * 5000, "v": v})
    out = hdr_quantiles(
        ray.data.from_pandas(df).repartition(6), group_col="g",
        value_col="v", sig_bits=5).to_pandas().set_index("q_ppm")
    sv = np.sort(v)
    for qn, qd in ((1, 2), (19, 20), (99, 100)):
        p = (5000 - 1) * qn // qd
        exact = int(sv[p])
        est = int(out.loc[qn * 1_000_000 // qd, "estimate"])
        # lower bound within 2^-5 relative error
        assert est <= exact
        assert exact - est <= exact // 32 + 1
    # small values (< 2^sig_bits+1) are EXACT (no quantization)
    df2 = pd.DataFrame({"g": ["y"] * 41, "v": np.arange(41,
                                                        dtype=np.int64)})
    o2 = hdr_quantiles(ray.data.from_pandas(df2), group_col="g",
                       value_col="v", sig_bits=5).to_pandas()
    assert int(o2[o2.q_ppm == 500_000].iloc[0]["estimate"]) == 20


def test_grouped_mannwhitney_exact_vs_brute_force():
    from htrc_feature_reader_ray.stages.profile import grouped_mannwhitney

    rng = np.random.RandomState(17)
    va = rng.randint(0, 30, 200)   # group a
    vb = rng.randint(10, 40, 300)  # rest runs higher
    df = pd.DataFrame({
        "g": ["a"] * 200 + ["b"] * 300,
        "v": np.concatenate([va, vb]).astype(np.int64),
    })
    out = grouped_mannwhitney(
        ray.data.from_pandas(df).repartition(5), group_col="g",
        value_col="v").to_pandas().set_index("g")
    # brute force: a-vs-rest(b)
    u2 = 0
    for x in va:
        for y in vb:
            u2 += 2 if x > y else (1 if x == y else 0)
    want = u2 * 1_000_000 // (2 * 200 * 300)
    assert int(out.loc["a", "u_ppm"]) == want
    assert out.loc["a", "u_ppm"] < 400_000  # a runs low
    # symmetry: u(a) + u(b) == 1e6 (up to floor) for two groups
    assert abs(int(out.loc["a", "u_ppm"]) + int(out.loc["b", "u_ppm"])
               - 1_000_000) <= 1
    # whole-corpus group: neutral 500000
    solo = pd.DataFrame({"g": ["x"] * 9, "v": np.arange(9)})
    o2 = grouped_mannwhitney(ray.data.from_pandas(solo), group_col="g",
                             value_col="v").to_pandas()
    assert o2.iloc[0]["u_ppm"] == 500_000


def test_trimmed_mean_exact_partial_buckets():
    from htrc_feature_reader_ray.stages.profile import trimmed_mean

    # group a: values [0]*5 + [10]*10 + [1000]*5 ; n=20, trim 25% -> k=5
    # drop all five 0s and all five 1000s -> mean of ten 10s = 10
    df = pd.DataFrame({
        "g": ["a"] * 20,
        "v": np.array([0] * 5 + [10] * 10 + [1000] * 5, dtype=np.int64),
    })
    out = trimmed_mean(ray.data.from_pandas(df).repartition(4),
                       group_col="g", value_col="v",
                       trim_ppm=250_000).to_pandas()
    assert out.iloc[0]["tmean_ppm"] == 10 * 1_000_000
    # partial bucket: trim k=2 from [1,1,1,5,9,9,9] (n=7) -> drop two 1s
    # and two 9s -> mean of [1,5,9] = 5
    df2 = pd.DataFrame({"g": ["b"] * 7,
                        "v": np.array([1, 1, 1, 5, 9, 9, 9],
                                      dtype=np.int64)})
    o2 = trimmed_mean(ray.data.from_pandas(df2), group_col="g",
                      value_col="v", trim_ppm=290_000).to_pandas()
    assert o2.iloc[0]["tmean_ppm"] == 5 * 1_000_000
    # trim to the single middle row: k=3 of n=7 -> mean of [5]
    o3 = trimmed_mean(ray.data.from_pandas(df2), group_col="g",
                      value_col="v", trim_ppm=500_000).to_pandas()
    assert o3.iloc[0]["tmean_ppm"] == 5_000_000
    # over-trim (k=4, m=-1) excludes the group
    o4 = trimmed_mean(ray.data.from_pandas(df2), group_col="g",
                      value_col="v", trim_ppm=600_000).to_pandas()
    assert len(o4) == 0


def test_cramers_v_perfect_and_independent():
    from htrc_feature_reader_ray.stages.profile import cramers_v

    # perfect 2x2 association: full-grid chi2 == n exactly (the two
    # empty diagonal-complement cells contribute their e terms), V2 = 1
    rows = ([{"lang": "en", "src": "a"}] * 30
            + [{"lang": "de", "src": "b"}] * 20)
    out = cramers_v(ray.data.from_items(rows).repartition(4),
                    k1="lang", k2="src")
    r = out.iloc[0]
    assert r["n"] == 50 and r["k1_card"] == 2 and r["k2_card"] == 2
    assert r["chi2_ppm"] == 50 * 1_000_000
    assert r["v2_ppm"] == 1_000_000
    # exact independence (balanced grid): every term 0
    rows2 = [{"lang": lg, "src": s}
             for lg in ("en", "de") for s in ("a", "b", "c")
             for _ in range(7)]
    o2 = cramers_v(ray.data.from_items(rows2).repartition(5),
                   k1="lang", k2="src")
    assert o2.iloc[0]["chi2_ppm"] == 0 and o2.iloc[0]["v2_ppm"] == 0
    # single-category axis: no association dimension -> 0 by contract
    rows3 = [{"lang": "en", "src": s} for s in ("a", "b", "a", "c")]
    o3 = cramers_v(ray.data.from_items(rows3), k1="lang", k2="src")
    assert o3.iloc[0]["v2_ppm"] == 0


def test_calibration_bins_hand():
    from htrc_feature_reader_ray.stages.profile import calibration_bins

    # scores in ppm; bin = min(s*10 // 1e6, 9); scale top edge closes
    df = pd.DataFrame({
        "s": np.array([50_000, 99_999, 950_000, 1_000_000, 820_000],
                      dtype=np.int64),
        "y": np.array([0, 1, 1, 1, 0], dtype=np.int64),
    })
    out = calibration_bins(ray.data.from_pandas(df).repartition(3),
                           score_col="s", label_col="y")
    out = out.set_index("bin")
    # bin 0: scores 50000, 99999 -> n=2, pos=1
    assert out.loc[0, "n"] == 2 and out.loc[0, "n_pos"] == 1
    assert out.loc[0, "mean_score_ppm"] == (50_000 + 99_999) // 2
    assert out.loc[0, "pos_rate_ppm"] == 500_000
    # bin 8: 820000 alone, neg
    assert out.loc[8, "n"] == 1 and out.loc[8, "pos_rate_ppm"] == 0
    # top edge: s == scale lands in bin 9 with 950000
    assert out.loc[9, "n"] == 2 and out.loc[9, "n_pos"] == 2
    # empty bins omitted
    assert set(out.index) == {0, 8, 9}
    # negative score violates the contract
    bad = pd.DataFrame({"s": np.array([-1], dtype=np.int64),
                        "y": np.array([0], dtype=np.int64)})
    import pytest
    with pytest.raises(Exception):
        calibration_bins(ray.data.from_pandas(bad),
                         score_col="s", label_col="y")


def test_psi_drift_hand_and_zero():
    from htrc_feature_reader_ray.stages.profile import psi_drift

    # identical sides -> every term exactly 0
    df = pd.DataFrame({
        "v": np.array([0, 1, 3, 7, 100] * 4, dtype=np.int64),
        "sd": ["a", "a", "a", "a", "a", "b", "b", "b", "b", "b"] * 2,
    })
    out = psi_drift(ray.data.from_pandas(df).repartition(3),
                    value_col="v", side_col="sd", left="a", right="b")
    assert (out["psi_term"] == 0).all()
    assert (out["p_ppm"] == out["q_ppm"]).all()
    # hand case: left all in bin 0 (v=0), right all in bin 3 (v in 7..14)
    df2 = pd.DataFrame({
        "v": np.array([0] * 4 + [8] * 4, dtype=np.int64),
        "sd": ["a"] * 4 + ["b"] * 4,
    })
    o2 = psi_drift(ray.data.from_pandas(df2).repartition(2),
                   value_col="v", side_col="sd", left="a", right="b")
    o2 = o2.set_index("bin")
    # bin 0: p=1e6, q=0 -> term = 1e6 * (ilog2(1e6+1) - ilog2(1))
    #      = 1e6 * (19 - 0)
    assert o2.loc[0, "psi_term"] == 1_000_000 * 19
    assert o2.loc[3, "psi_term"] == 1_000_000 * 19
    # terms are always nonnegative (weak-sign agreement of the factors)
    assert (o2["psi_term"] >= 0).all()
    # rows of other sides are ignored
    df3 = pd.concat([df2, pd.DataFrame(
        {"v": np.array([10**12], dtype=np.int64), "sd": ["zz"]})])
    o3 = psi_drift(ray.data.from_pandas(df3), value_col="v",
                   side_col="sd", left="a", right="b")
    assert set(o3["bin"]) == {0, 3}


def test_group_kfold_contract():
    from htrc_feature_reader_ray.stages.sample import group_kfold

    df = pd.DataFrame({
        "event_id": np.arange(200, dtype=np.int64),
        "user_id": np.arange(200, dtype=np.int64) % 17,
    })
    out = group_kfold(ray.data.from_pandas(df).repartition(8),
                      by="user_id", k=5).to_pandas()
    # every group maps to exactly one fold
    assert (out.groupby("user_id")["fold"].nunique() == 1).all()
    assert out["fold"].between(0, 4).all()
    # pure function of the data: partitioning-independent
    o2 = group_kfold(ray.data.from_pandas(df).repartition(1),
                     by="user_id", k=5).to_pandas()
    merged = out.drop_duplicates("user_id").merge(
        o2.drop_duplicates("user_id"), on="user_id")
    assert (merged["fold_x"] == merged["fold_y"]).all()
    # salt re-draws an independent fold structure
    o3 = group_kfold(ray.data.from_pandas(df), by="user_id", k=5,
                     salt="other").to_pandas()
    m3 = out.drop_duplicates("user_id").merge(
        o3.drop_duplicates("user_id"), on="user_id")
    assert (m3["fold_x"] != m3["fold_y"]).any()


def test_woe_iv_hand():
    from htrc_feature_reader_ray.stages.profile import woe_iv

    # goods all small (bin 0: v=0), bads all large (bin 3: v=8)
    df = pd.DataFrame({
        "v": np.array([0] * 4 + [8] * 4, dtype=np.int64),
        "y": np.array([0] * 4 + [1] * 4, dtype=np.int64),
    })
    out = woe_iv(ray.data.from_pandas(df).repartition(3),
                 value_col="v", label_col="y").set_index("bin")
    # bin 0: g=1e6, b=0 -> woe = ilog2(1e6+1) - ilog2(1) = 19
    assert out.loc[0, "woe_bits"] == 19
    assert out.loc[0, "iv_term"] == 1_000_000 * 19
    # bin 3: g=0, b=1e6 -> woe = -19, iv_term = (-1e6)*(-19) >= 0
    assert out.loc[3, "woe_bits"] == -19
    assert out.loc[3, "iv_term"] == 1_000_000 * 19
    assert (out["iv_term"] >= 0).all()
    # non-informative feature: same distribution per label -> all 0
    df2 = pd.DataFrame({
        "v": np.array([0, 8] * 6, dtype=np.int64),
        "y": np.array([0, 0, 1, 1] * 3, dtype=np.int64),
    })
    o2 = woe_iv(ray.data.from_pandas(df2), value_col="v", label_col="y")
    assert (o2["iv_term"] == 0).all() and (o2["woe_bits"] == 0).all()


def test_pr_curve_hand():
    from htrc_feature_reader_ray.stages.profile import pr_curve

    # scores: 90 (pos), 80 (neg), 80 (pos), 10 (neg)
    df = pd.DataFrame({
        "s": np.array([90, 80, 80, 10], dtype=np.int64),
        "y": np.array([1, 0, 1, 0], dtype=np.int64),
    })
    out = (pr_curve(ray.data.from_pandas(df).repartition(3),
                    score_col="s", label_col="y")
           .sort_values("threshold", ascending=False)
           .reset_index(drop=True))
    assert list(out["threshold"]) == [90, 80, 10]
    # t=90: 1 row, 1 tp -> precision 1e6, recall 1/2
    assert out.iloc[0]["precision_ppm"] == 1_000_000
    assert out.iloc[0]["recall_ppm"] == 500_000
    # t=80: 3 rows, 2 tp -> precision 2e6//3, recall 1e6
    assert out.iloc[1]["precision_ppm"] == 2_000_000 // 3
    assert out.iloc[1]["recall_ppm"] == 1_000_000
    # t=10: 4 rows, 2 tp
    assert out.iloc[2]["precision_ppm"] == 500_000
    assert out.iloc[2]["recall_ppm"] == 1_000_000
    # recall is monotone nonincreasing in threshold (cum property)
    assert (out["recall_ppm"].diff().dropna() >= 0).all()
    # no positives -> empty by contract, typed schema kept
    df2 = pd.DataFrame({"s": np.array([5, 6], dtype=np.int64),
                        "y": np.array([0, 0], dtype=np.int64)})
    o2 = pr_curve(ray.data.from_pandas(df2), score_col="s",
                  label_col="y")
    assert len(o2) == 0 and list(o2.columns) == [
        "threshold", "n_ge", "tp", "precision_ppm", "recall_ppm"]


def test_robust_scale_hand():
    from htrc_feature_reader_ray.stages.profile import robust_scale

    # values 1..9: q1 = ceil(.25*9)=rank3 -> 3; med = rank5 -> 5;
    # q3 = rank7 -> 7; iqr = 4
    df = pd.DataFrame({"id": np.arange(9, dtype=np.int64),
                       "v": np.arange(1, 10, dtype=np.int64)})
    out = (robust_scale(ray.data.from_pandas(df).repartition(4),
                        value_col="v").to_pandas()
           .sort_values("id").reset_index(drop=True))
    # v=5 -> 0; v=9 -> (4*1e6)//4 = 1e6; v=1 -> -1e6; v=2 -> trunc(-750000)
    byv = dict(zip(out["v"], out["robust_ppm"]))
    assert byv[5] == 0 and byv[9] == 1_000_000 and byv[1] == -1_000_000
    assert byv[2] == -750_000
    # truncation toward zero on a non-exact negative: v=4 with med 5,
    # iqr 4 -> (-1e6)//4 = -250000 exact; use iqr=3 case instead:
    df2 = pd.DataFrame({"id": [0, 1, 2, 3],
                        "v": np.array([0, 1, 2, 3], dtype=np.int64)})
    # q1=rank1->0, med=rank2->1, q3=rank3->2, iqr=2; v=0 -> -500000
    o2 = robust_scale(ray.data.from_pandas(df2), value_col="v").to_pandas()
    assert dict(zip(o2["v"], o2["robust_ppm"]))[0] == -500_000
    # degenerate spread -> 0 by contract
    df3 = pd.DataFrame({"id": [0, 1], "v": np.array([7, 7],
                                                    dtype=np.int64)})
    o3 = robust_scale(ray.data.from_pandas(df3), value_col="v").to_pandas()
    assert (o3["robust_ppm"] == 0).all()


def test_spearman_rho_exact_vs_fraction_reference():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.profile import spearman_rho

    rng = np.random.RandomState(23)
    x = rng.randint(0, 25, 200).astype(np.int64)  # heavy ties
    y = (x * 2 + rng.randint(-8, 9, 200)).astype(np.int64)
    df = pd.DataFrame({"g": ["a"] * 200, "x": x, "y": y})
    out = spearman_rho(ray.data.from_pandas(df).repartition(5),
                       group_col="g", x_col="x", y_col="y").to_pandas()

    # reference: Pearson on ties-AVERAGED ranks, exact via Fraction
    def avg_ranks(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v), dtype=object)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ar = Fraction(i + 1 + j, 2)  # average of ranks i+1..j
            for k in range(i, j):
                r[order[k]] = ar
            i = j
        return r

    rx, ry = avg_ranks(x), avg_ranks(y)
    n = len(x)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sc = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    frac = sc * sc * 1_000_000 / (vx * vy)
    mag = int(frac)  # trunc toward zero on the nonnegative square
    want = mag if sc >= 0 else -mag
    assert int(out.iloc[0]["rho2_ppm"]) == want
    assert want > 700_000  # sanity: strong positive rank association


def test_spearman_rho_extremes_and_contracts():
    from htrc_feature_reader_ray.stages.profile import spearman_rho

    x = np.arange(50, dtype=np.int64)
    df = pd.DataFrame({
        "g": ["up"] * 50 + ["down"] * 50 + ["flat"] * 5 + ["solo"],
        "x": np.concatenate([x, x, np.arange(5), [0]]),
        "y": np.concatenate([x * 7 + 1, -x, [3] * 5, [5]]),
    })
    out = spearman_rho(ray.data.from_pandas(df), group_col="g",
                       x_col="x", y_col="y").to_pandas().set_index("g")
    assert out.loc["up", "rho2_ppm"] == 1_000_000
    assert out.loc["down", "rho2_ppm"] == -1_000_000
    assert out.loc["flat", "rho2_ppm"] == 0   # zero y-variance contract
    assert out.loc["solo", "rho2_ppm"] == 0   # m<2 contract


def test_conformal_threshold_exact_guarantee_and_contracts():
    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.profile import conformal_threshold

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": ["a"] * n,
        "s": rng.randint(0, 10_000, n).astype(np.int64),
    })
    out = conformal_threshold(
        ray.data.from_pandas(df).repartition(5), group_col="g",
        id_col="id", score_col="s", alpha_ppm=200_000, cal_mod=2,
        salt="t:").to_pandas()
    row = out.iloc[0]

    # scalar replay of the contract
    h = md5_hash64([f"t:{v}" for v in df["id"]])
    cal = np.sort(df["s"].to_numpy()[h % 2 == 0])
    tst = df["s"].to_numpy()[h % 2 != 0]
    k = ((len(cal) + 1) * 800_000 + 999_999) // 1_000_000
    thr = int(cal[k - 1])
    assert int(row["n_cal"]) == len(cal)
    assert int(row["n_test"]) == len(tst)
    assert int(row["threshold"]) == thr
    want_cov = int((tst <= thr).sum()) * 1_000_000 // len(tst)
    assert int(row["coverage_ppm"]) == want_cov
    # the conformal promise is marginal over splits; this single draw
    # sits within binomial noise of the promised 800000
    assert want_cov >= 700_000

    # exclusion contracts: a group too small for alpha (k > n_cal) and a
    # group whose audit side is empty are both dropped
    tiny = pd.DataFrame({
        "id": [1_000_001, 1_000_003],  # both hash to the same split side?
        "g": ["tiny"] * 2,
        "s": [5, 6],
    })
    out2 = conformal_threshold(
        ray.data.from_pandas(pd.concat([df, tiny], ignore_index=True)),
        group_col="g", id_col="id", score_col="s",
        alpha_ppm=1_000, cal_mod=2, salt="t:").to_pandas()
    # alpha=0.1%: k = n_cal+1 > n_cal for any group -> everything excluded
    assert len(out2) == 0


def test_isotonic_calibration_equals_stack_pav():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.profile import isotonic_calibration

    rng = np.random.RandomState(3)
    s = rng.randint(0, 120, 600).astype(np.int64)
    # noisy monotone relationship with deliberate local violations
    y = (rng.rand(600) < np.clip(s / 150.0 + rng.randn(600) * 0.3,
                                 0, 1)).astype(np.int64)
    df = pd.DataFrame({"s": s, "y": y})
    out = isotonic_calibration(
        ray.data.from_pandas(df).repartition(5), score_col="s",
        label_col="y", qs=10).to_pandas()

    # reference: classic weighted PAV stack over the same bins, exact
    g = df.assign(b=s // 10).groupby("b").agg(
        n=("y", "size"), p=("y", "sum")).reset_index()
    stack = []  # (n, p) pools
    for _, row in g.iterrows():
        stack.append([int(row["n"]), int(row["p"])])
        while len(stack) > 1 and (
            Fraction(stack[-2][1], stack[-2][0])
            >= Fraction(stack[-1][1], stack[-1][0])
        ):
            b2 = stack.pop()
            stack[-1][0] += b2[0]
            stack[-1][1] += b2[1]
    want = []
    i = 0
    sizes = g["n"].to_numpy()
    # expand pools back to bins (pool averages floored to ppm)
    consumed = 0
    bin_rows = 0
    for pool_n, pool_p in stack:
        covered = 0
        while covered < pool_n:
            covered += int(sizes[bin_rows])
            want.append(pool_p * 1_000_000 // pool_n)
            bin_rows += 1
    assert list(out["fitted_ppm"]) == want
    assert list(out["bin"]) == list(g["b"])
    # monotone by construction
    assert (np.diff(out["fitted_ppm"].to_numpy()) >= 0).all()


def test_isotonic_calibration_perfectly_separated():
    from htrc_feature_reader_ray.stages.profile import isotonic_calibration

    df = pd.DataFrame({
        "s": [0, 1, 2, 3, 10, 11, 12],
        "y": [0, 0, 0, 0, 1, 1, 1],
    })
    out = isotonic_calibration(
        ray.data.from_pandas(df), score_col="s", label_col="y",
        qs=1).to_pandas()
    assert list(out["fitted_ppm"][:4]) == [0, 0, 0, 0]
    assert list(out["fitted_ppm"][4:]) == [1_000_000] * 3


# ---------------------------------------------------------------------------
# bradley_terry


def _bt_reference(comparisons, rounds):
    """Independent scalar replay of the bradley_terry fixed-point
    contract (pairs canonicalized, 10^12 fixed point, trunc division,
    mean-1e6 renorm each round)."""
    pairs = {}
    for w, l in comparisons:
        if w == l:
            continue
        lo, hi = min(w, l), max(w, l)
        n, lw = pairs.get((lo, hi), (0, 0))
        pairs[(lo, hi)] = (n + 1, lw + (1 if w == lo else 0))
    items = sorted({x for k in pairs for x in k})
    idx = {it: i for i, it in enumerate(items)}
    m = len(items)
    wins = [0] * m
    games = [0] * m
    for (lo, hi), (n, lw) in pairs.items():
        wins[idx[lo]] += lw
        wins[idx[hi]] += n - lw
        games[idx[lo]] += n
        games[idx[hi]] += n
    p = [1_000_000] * m
    for _ in range(rounds):
        denom = [0] * m
        for (lo, hi), (n, _) in pairs.items():
            d = (n * 10**12) // max(p[idx[lo]] + p[idx[hi]], 1)
            denom[idx[lo]] += d
            denom[idx[hi]] += d
        q = [(wins[i] * 10**12) // max(denom[i], 1) for i in range(m)]
        s = sum(q)
        p = [(q[i] * m * 1_000_000) // max(s, 1) for i in range(m)]
    return items, games, wins, p


def test_bradley_terry_exact_scalar_replay_and_partition_invariance():
    from htrc_feature_reader_ray.stages.profile import bradley_terry

    rng = np.random.RandomState(7)
    names = ["ada", "bob", "cid", "dee"]
    true = {"ada": 4.0, "bob": 2.0, "cid": 1.0, "dee": 0.5}
    comps = []
    for _ in range(400):
        a, b = rng.choice(names, 2, replace=False)
        # deterministic winner draw from the BT model itself
        u = rng.rand()
        w, l = (a, b) if u < true[a] / (true[a] + true[b]) else (b, a)
        comps.append((w, l))
    comps.append(("ada", "ada"))  # self-pair: dropped by contract
    df = pd.DataFrame(comps, columns=["winner", "loser"])

    items, games, wins, p = _bt_reference(comps, rounds=6)
    for parts in (1, 7):
        out = bradley_terry(
            ray.data.from_pandas(df).repartition(parts),
            winner_col="winner", loser_col="loser", rounds=6)
        assert list(out["item"]) == items
        assert list(out["games"]) == games
        assert list(out["wins"]) == wins
        assert list(out["strength_ppm"]) == p

    # dominance ordering recovered: ada > bob > cid
    s = dict(zip(out["item"], out["strength_ppm"]))
    assert s["ada"] > s["bob"] > s["cid"]
    # renorm contract: mean strength pinned near 1e6
    assert abs(sum(s.values()) - len(s) * 1_000_000) < len(s) * 4


def test_bradley_terry_never_wins_goes_to_zero_and_empty():
    from htrc_feature_reader_ray.stages.profile import bradley_terry

    df = pd.DataFrame(
        [("a", "z")] * 10 + [("b", "z")] * 10,
        columns=["winner", "loser"])
    out = bradley_terry(ray.data.from_pandas(df).repartition(3),
                        winner_col="winner", loser_col="loser")
    s = dict(zip(out["item"], out["strength_ppm"]))
    assert s["z"] == 0  # MLE boundary: never wins
    assert s["a"] > 0 and s["b"] > 0

    empty = bradley_terry(
        ray.data.from_pandas(
            pd.DataFrame({"winner": pd.Series([], dtype=object),
                          "loser": pd.Series([], dtype=object)})),
        winner_col="winner", loser_col="loser")
    assert len(empty) == 0
    assert list(empty.columns) == ["item", "games", "wins",
                                   "strength_ppm"]


# ---------------------------------------------------------------------------
# bootstrap_ci


def test_bootstrap_ci_exact_scalar_replay():
    import hashlib

    from htrc_feature_reader_ray.stages.profile import (
        _POIS_C,
        bootstrap_ci,
    )

    rng = np.random.RandomState(11)
    n = 120
    df = pd.DataFrame({
        "grp": np.where(np.arange(n) % 3 == 0, "a", "b"),
        "v": rng.randint(0, 5000, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64) * 7 + 1,
    })
    B, alpha = 12, 200_000

    def u64(s):
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[:8], "little")

    ref_rows = []
    for grp in ["a", "b"]:
        sub = df[df["grp"] == grp]
        means = []
        for r in range(B):
            sk = skv = 0
            for _, row in sub.iterrows():
                u = u64(f"|{r}|{row['id']}")
                k = sum(1 for c in _POIS_C if u >= c)
                sk += k
                skv += k * int(row["v"])
            means.append(skv // max(sk, 1))
        means.sort()
        lo = B * alpha // 2_000_000 + 1
        hi = B - B * alpha // 2_000_000
        ref_rows.append((grp, len(sub), int(sub["v"].sum()) // len(sub),
                         means[lo - 1], means[hi - 1]))

    for parts in (1, 9):
        out = bootstrap_ci(
            ray.data.from_pandas(df).repartition(parts),
            group_col="grp", value_col="v", id_col="id",
            n_reps=B, alpha_ppm=alpha)
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref_rows

    # bounds: replicate means of nonneg values live inside [min, max]
    for grp, nn, mean, lo, hi in got:
        sub = df[df["grp"] == grp]["v"]
        assert sub.min() <= lo <= hi <= sub.max()
        assert lo <= hi


def test_bootstrap_ci_negative_value_raises():
    import pytest as _pytest

    from htrc_feature_reader_ray.stages.profile import bootstrap_ci

    df = pd.DataFrame({"grp": ["a"], "v": [-1], "id": [1]})
    with _pytest.raises(Exception):
        bootstrap_ci(ray.data.from_pandas(df), group_col="grp",
                     value_col="v", id_col="id", n_reps=4)


# ---------------------------------------------------------------------------
# theils_u


def test_theils_u_extremes_and_asymmetry():
    from htrc_feature_reader_ray.stages.profile import theils_u

    # perfect determination: y is a function of x -> u close to 1e6
    # (floor-log2 quantization keeps it near, not exactly at, 1e6 when
    # marginals aren't powers of two; use power-of-two cells for exact)
    df = pd.DataFrame({
        "x": ["a"] * 8 + ["b"] * 8,
        "y": ["p"] * 8 + ["q"] * 8,
    })
    out = theils_u(ray.data.from_pandas(df).repartition(3),
                   x_col="x", y_col="y")
    # cells o=8, n=16, marginals 8*8: term 8*(il2(128)-il2(64))=8 each
    # mi_fix=16; hy_fix=2*8*(4-3)=16 -> u = 1e6 exactly
    assert int(out.iloc[0]["u_ppm"]) == 1_000_000

    # independence with power-of-two counts: mi_fix exactly 0
    df2 = pd.DataFrame({
        "x": ["a", "a", "b", "b"] * 4,
        "y": ["p", "q", "p", "q"] * 4,
    })
    out2 = theils_u(ray.data.from_pandas(df2).repartition(2),
                    x_col="x", y_col="y")
    assert int(out2.iloc[0]["mi_fix"]) == 0
    assert int(out2.iloc[0]["u_ppm"]) == 0

    # constant y: hy_fix = 0 -> u 0 by contract
    df3 = pd.DataFrame({"x": ["a", "b"] * 4, "y": ["p"] * 8})
    out3 = theils_u(ray.data.from_pandas(df3), x_col="x", y_col="y")
    assert int(out3.iloc[0]["hy_fix"]) == 0
    assert int(out3.iloc[0]["u_ppm"]) == 0

    # asymmetry: x with 4 values determining y with 2 -> U(y|x)=1 full,
    # but U(x|y) < 1 (y can't pin down x)
    df4 = pd.DataFrame({
        "x": ["a"] * 4 + ["b"] * 4 + ["c"] * 4 + ["d"] * 4,
        "y": ["p"] * 8 + ["q"] * 8,
    })
    u_yx = int(theils_u(ray.data.from_pandas(df4),
                        x_col="x", y_col="y").iloc[0]["u_ppm"])
    u_xy = int(theils_u(ray.data.from_pandas(df4),
                        x_col="y", y_col="x").iloc[0]["u_ppm"])
    assert u_yx == 1_000_000
    assert u_xy < u_yx


# ---------------------------------------------------------------------------
# gini_split


def test_gini_split_exact_fraction_reference_and_argmax():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.profile import gini_split

    rng = np.random.RandomState(3)
    v = rng.randint(0, 12, 300).astype(np.int64)
    y = (v >= 7).astype(np.int64)
    # 10% label noise so the split isn't trivially clean
    flip = rng.rand(300) < 0.1
    y[flip] = 1 - y[flip]
    df = pd.DataFrame({"v": v, "y": y})
    out = gini_split(ray.data.from_pandas(df).repartition(6),
                     value_col="v", label_col="y")

    n, p = 300, int(y.sum())
    support = sorted(set(v))
    assert list(out["threshold"]) == support[:-1]
    for row in out.itertuples(index=False):
        nl = int((v <= row.threshold).sum())
        pl = int(y[v <= row.threshold].sum())
        nr, pr = n - nl, p - pl
        child = Fraction(2 * pl * (nl - pl), n * nl) \
            + Fraction(2 * pr * (nr - pr), n * nr)
        assert row.child_gini_ppm == int(child * 1_000_000)
        parent = 2 * p * (n - p) * 1_000_000 // (n * n)
        assert row.gain_ppm == parent - row.child_gini_ppm
        assert row.gain_ppm >= 0
    # best split recovers the generating threshold despite the noise
    best = out.sort_values(["gain_ppm", "threshold"],
                           ascending=[False, True]).iloc[0]
    assert best["threshold"] == 6


def test_gini_split_degenerate_inputs():
    from htrc_feature_reader_ray.stages.profile import gini_split

    one = pd.DataFrame({"v": [5] * 10, "y": [0, 1] * 5})
    out = gini_split(ray.data.from_pandas(one),
                     value_col="v", label_col="y")
    assert len(out) == 0
    assert list(out.columns) == ["threshold", "n_le", "pos_le",
                                 "child_gini_ppm", "gain_ppm"]


# ---------------------------------------------------------------------------
# ab_lift


def test_ab_lift_exact_hand_computation():
    import hashlib

    from htrc_feature_reader_ray.stages.profile import ab_lift

    # units 1..40, unit converts iff unit % 5 == 0; arm from md5 % 2
    rows = []
    for u in range(1, 41):
        for _ in range(3):  # repeated rows: unit-level max collapse
            rows.append((u, 1 if u % 5 == 0 else 0))
    df = pd.DataFrame(rows, columns=["u", "y"])
    out = ab_lift(ray.data.from_pandas(df).repartition(7),
                  unit_col="u", convert_col="y")
    row = out.iloc[0]

    def arm(u):
        h = int.from_bytes(
            hashlib.md5(str(u).encode()).digest()[:8], "little")
        return h % 2

    units = {u: 1 if u % 5 == 0 else 0 for u in range(1, 41)}
    n_a = sum(1 for u in units if arm(u) == 0)
    conv_a = sum(v for u, v in units.items() if arm(u) == 0)
    n_b, conv_b = 40 - n_a, sum(units.values()) - conv_a
    assert (row["n_a"], row["conv_a"]) == (n_a, conv_a)
    assert (row["n_b"], row["conv_b"]) == (n_b, conv_b)
    assert row["rate_a_ppm"] == conv_a * 1_000_000 // max(n_a, 1)
    assert row["lift_ppm"] == (conv_b * 1_000_000 // max(n_b, 1)
                               - conv_a * 1_000_000 // max(n_a, 1))
    det = conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b
    c, nc = conv_a + conv_b, 40 - conv_a - conv_b
    assert row["chi2_ppm"] == 40 * det * det * 1_000_000 // (
        n_a * n_b * c * nc)


def test_ab_lift_degenerate_marginal_zero_chi2():
    from htrc_feature_reader_ray.stages.profile import ab_lift

    df = pd.DataFrame({"u": list(range(10)), "y": [1] * 10})
    out = ab_lift(ray.data.from_pandas(df), unit_col="u",
                  convert_col="y")
    assert int(out.iloc[0]["chi2_ppm"]) == 0  # nc marginal = 0
    assert int(out.iloc[0]["lift_ppm"]) == 0


# ---------------------------------------------------------------------------
# gains_table


def test_gains_table_exact_and_tie_semantics():
    from htrc_feature_reader_ray.stages.profile import gains_table

    # 100 rows, scores 0..99 distinct, positives = top 10 scores
    df = pd.DataFrame({"s": np.arange(100, dtype=np.int64),
                       "y": (np.arange(100) >= 90).astype(np.int64)})
    out = gains_table(ray.data.from_pandas(df).repartition(5),
                      score_col="s", label_col="y")
    assert list(out["decile"]) == list(range(1, 11))
    d1 = out.iloc[0]
    # top decile captures ALL positives: gain 1e6, lift 10x
    assert (d1["n_ge"], d1["tp"]) == (10, 10)
    assert d1["gain_ppm"] == 1_000_000
    assert d1["lift_ppm"] == 10_000_000
    # gains monotone nondecreasing, last decile covers everything
    assert list(out["gain_ppm"]) == sorted(out["gain_ppm"])
    assert out.iloc[-1]["n_ge"] == 100
    assert out.iloc[-1]["lift_ppm"] == 1_000_000

    # ties inflate the realized bucket instead of splitting a score:
    # 50 rows share the top score -> decile 1 (cutoff 6) realizes n_ge=50
    df2 = pd.DataFrame({
        "s": np.array([5] * 50 + list(range(5)) * 2, dtype=np.int64),
        "y": np.array([1] * 50 + [0] * 10, dtype=np.int64)})
    out2 = gains_table(ray.data.from_pandas(df2).repartition(3),
                       score_col="s", label_col="y")
    assert out2.iloc[0]["n_ge"] == 50

    # no positives -> typed empty
    df3 = pd.DataFrame({"s": [1, 2], "y": [0, 0]})
    out3 = gains_table(ray.data.from_pandas(df3),
                       score_col="s", label_col="y")
    assert len(out3) == 0 and "lift_ppm" in out3.columns


# ---------------------------------------------------------------------------
# brier_decomposition


def test_brier_decomposition_reference_and_extremes():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.profile import brier_decomposition

    rng = np.random.RandomState(13)
    s = rng.randint(0, 1_000_001, 400).astype(np.int64)
    # labels correlated with score: P(y=1) grows with s
    y = (rng.rand(400) * 1_000_000 < s).astype(np.int64)
    df = pd.DataFrame({"s": s, "y": y})
    out = brier_decomposition(ray.data.from_pandas(df).repartition(5),
                              score_col="s", label_col="y")
    row = out.iloc[0]

    sm = s * 1000 // 1_000_000
    b = np.minimum(sm * 10 // 1000, 9)
    n, p = 400, int(y.sum())
    brier = int(((sm - 1000 * y) ** 2).sum()) // n
    rel = sum(
        (int(sm[b == k].sum()) - 1000 * int(y[b == k].sum())) ** 2
        // int((b == k).sum())
        for k in range(10) if (b == k).any()) // n
    res = sum(
        1_000_000 * (int(y[b == k].sum()) * n - p * int((b == k).sum()))
        ** 2 // (int((b == k).sum()) * n * n)
        for k in range(10) if (b == k).any()) // n
    assert row["brier_pm2"] == brier
    assert row["rel_pm2"] == rel
    assert row["res_pm2"] == res
    assert row["unc_pm2"] == 1_000_000 * p * (n - p) // (n * n)
    # murphy identity holds within the documented floor slack plus the
    # within-bin forecast variance (bounded by the bin width squared)
    approx = rel - res + row["unc_pm2"]
    assert abs(brier - approx) < 12_000

    # a perfect scorer: s==1e6 iff y==1 -> brier 0, rel 0
    df2 = pd.DataFrame({"s": np.array([0, 0, 1_000_000] * 5,
                                      dtype=np.int64),
                        "y": np.array([0, 0, 1] * 5, dtype=np.int64)})
    out2 = brier_decomposition(ray.data.from_pandas(df2),
                               score_col="s", label_col="y")
    assert int(out2.iloc[0]["brier_pm2"]) == 0
    assert int(out2.iloc[0]["rel_pm2"]) == 0
    # resolution == uncertainty for the perfect scorer (exact here:
    # bin rates are 0 and 1)
    assert int(out2.iloc[0]["res_pm2"]) == int(out2.iloc[0]["unc_pm2"])


# ---------------------------------------------------------------------------
# disparate_impact


def test_disparate_impact_exact_and_flag():
    from htrc_feature_reader_ray.stages.profile import disparate_impact

    # rates: a=1.0 (ref), b=0.5 (di 500000, flagged), c=0.9 (not)
    df = pd.DataFrame({
        "g": ["a"] * 10 + ["b"] * 10 + ["c"] * 10,
        "f": [1] * 10 + [1, 0] * 5 + [1] * 9 + [0],
    })
    out = disparate_impact(ray.data.from_pandas(df).repartition(4),
                           group_col="g", flag_col="f")
    r = {row.g: row for row in out.itertuples(index=False)}
    assert r["a"].rate_ppm == 1_000_000 and r["a"].di_ppm == 1_000_000
    assert r["b"].di_ppm == 500_000 and r["b"].below_80pct == 1
    assert r["c"].di_ppm == 900_000 and r["c"].below_80pct == 0

    # all-zero reference: di 0 everywhere by contract
    df2 = pd.DataFrame({"g": ["a", "b"], "f": [0, 0]})
    out2 = disparate_impact(ray.data.from_pandas(df2),
                            group_col="g", flag_col="f")
    assert list(out2["di_ppm"]) == [0, 0]


def test_mann_whitney_exact_scipy_free_reference():
    """Engine == a Fraction-exact direct pair count on a small skewed
    fixture (with ties), including the tie-corrected z²."""
    from htrc_feature_reader_ray.stages.profile import mann_whitney

    # group 'hi' stochastically dominates 'lo'; shared tie value 5
    vals = {"hi": [5, 7, 9, 9, 12], "lo": [1, 2, 5, 5, 7, 3]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = pd.DataFrame(rows, columns=["grp", "v"])
    out = mann_whitney(
        ray.data.from_pandas(df).repartition(4),
        group_col="grp", value_col="v",
    ).to_pandas().set_index("grp")

    all_vals = [v for vs in vals.values() for v in vs]
    n = len(all_vals)
    from collections import Counter
    tie = sum(t ** 3 - t for t in Counter(all_vals).values())
    for g, vs in vals.items():
        rest = [v for og, ovs in vals.items() if og != g for v in ovs]
        u2 = sum(2 * sum(r < x for r in rest) + sum(r == x for r in rest)
                 for x in vs)
        n_g, n_r = len(vs), len(rest)
        diff = u2 - n_g * n_r
        rb = (-((-diff) * 10**6 // (n_g * n_r)) if diff < 0
              else diff * 10**6 // (n_g * n_r))
        vden = n_g * n_r * ((n**3 - n) - tie)
        z2 = 3 * n * (n - 1) * diff * diff * 10**6 // vden
        assert out.loc[g, "u2"] == u2
        assert out.loc[g, "rank_biserial_ppm"] == rb
        assert out.loc[g, "z2_ppm"] == z2
    assert out.loc["hi", "rank_biserial_ppm"] > 0
    assert out.loc["lo", "rank_biserial_ppm"] < 0
    # vs-rest partition symmetry: two groups' u2 sum to 2*n_g*n_r
    assert out["u2"].sum() == 2 * 5 * 6


def test_mann_whitney_degenerate_contracts():
    from htrc_feature_reader_ray.stages.profile import mann_whitney

    # all values tied -> z2 = 0 (variance 0), rank_biserial 0 (u2 == den)
    df = pd.DataFrame({"grp": ["a"] * 3 + ["b"] * 2, "v": [4] * 5})
    out = mann_whitney(ray.data.from_pandas(df), group_col="grp",
                       value_col="v").to_pandas().set_index("grp")
    assert (out["z2_ppm"] == 0).all()
    assert (out["rank_biserial_ppm"] == 0).all()
    assert out.loc["a", "u2"] == 2 * 3 * 2 // 2 * 1  # all ties: u2 = n_g*n_r
    # single group == whole corpus -> all zeros by contract
    df2 = pd.DataFrame({"grp": ["only"] * 4, "v": [1, 2, 3, 4]})
    out2 = mann_whitney(ray.data.from_pandas(df2), group_col="grp",
                        value_col="v").to_pandas()
    assert out2.iloc[0]["u2"] == 0 and out2.iloc[0]["z2_ppm"] == 0


def test_mcnemar_two_by_two_exact():
    from htrc_feature_reader_ray.stages.profile import mcnemar

    # 3 both-right, 2 both-wrong, 4 A-only, 1 B-only
    a = [1, 1, 1, 0, 0, 1, 1, 1, 1, 0]
    b = [1, 1, 1, 0, 0, 0, 0, 0, 0, 1]
    df = pd.DataFrame({"a": a, "b": b})
    out = mcnemar(ray.data.from_pandas(df).repartition(3),
                  a_col="a", b_col="b").to_pandas().iloc[0]
    assert out["n_pairs"] == 10
    assert out["n_a_only"] == 4 and out["n_b_only"] == 1
    assert out["chi2_ppm"] == (4 - 1) ** 2 * 10**6 // 5
    assert out["acc_a_ppm"] == 700_000 and out["acc_b_ppm"] == 400_000
    # never-disagree contract
    df2 = pd.DataFrame({"a": [1, 0, 1], "b": [1, 0, 1]})
    out2 = mcnemar(ray.data.from_pandas(df2), a_col="a",
                   b_col="b").to_pandas().iloc[0]
    assert out2["chi2_ppm"] == 0 and out2["n_a_only"] == 0


def test_kruskal_wallis_fraction_exact_reference():
    """Engine == a Fraction-exact reference (per-group floor convention
    applied identically) on a 3-group fixture with ties; doubled-rank
    sum identity Σ DR_g = n(n+1) pinned along the way."""
    from htrc_feature_reader_ray.stages.profile import kruskal_wallis

    vals = {"a": [1, 3, 5, 7, 7], "b": [2, 4, 6, 7], "c": [8, 9, 10]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = pd.DataFrame(rows, columns=["grp", "v"])
    out = kruskal_wallis(
        ray.data.from_pandas(df).repartition(4),
        group_col="grp", value_col="v",
    ).to_pandas().iloc[0]

    from collections import Counter
    all_vals = sorted(v for vs in vals.values() for v in vs)
    n = len(all_vals)
    cnt = Counter(all_vals)
    support = sorted(cnt)
    cum = {}
    run = 0
    for v in support:
        run += cnt[v]
        cum[v] = run
    tie = sum(t ** 3 - t for t in cnt.values())
    drs = {}
    for g, vs in vals.items():
        drs[g] = sum(2 * cum[v] - cnt[v] + 1 for v in vs)
    assert sum(drs.values()) == n * (n + 1)
    qsum = sum(d * d // len(vals[g]) for g, d in drs.items())
    num = qsum - n * (n + 1) ** 2
    h = 3 * (n - 1) * num * 10**6 // ((n**3 - n) - tie)
    assert out["h_ppm"] == h
    assert out["n_groups"] == 3 and out["n_rows"] == n
    # group c clearly dominates -> significant at k=3 (chi2_2 5.99e6)
    assert out["h_ppm"] > 5_990_000


def test_kruskal_wallis_identical_groups_near_zero():
    from htrc_feature_reader_ray.stages.profile import kruskal_wallis

    # same multiset in both groups -> exact H is 0 up to floor slack
    df = pd.DataFrame({"grp": ["a"] * 4 + ["b"] * 4,
                       "v": [1, 2, 3, 4, 1, 2, 3, 4]})
    out = kruskal_wallis(ray.data.from_pandas(df), group_col="grp",
                         value_col="v").to_pandas().iloc[0]
    assert out["h_ppm"] == 0
    # all-tied support -> 0 by contract
    df2 = pd.DataFrame({"grp": ["a", "a", "b"], "v": [5, 5, 5]})
    out2 = kruskal_wallis(ray.data.from_pandas(df2), group_col="grp",
                          value_col="v").to_pandas().iloc[0]
    assert out2["h_ppm"] == 0


def test_cochrans_q_exact_and_mcnemar_reduction():
    from htrc_feature_reader_ray.stages.profile import cochrans_q, mcnemar

    # classic 3-treatment fixture
    a = [1, 1, 0, 1, 0, 1, 1, 0, 1, 1]
    b = [0, 1, 0, 0, 0, 1, 0, 0, 1, 0]
    c = [1, 1, 1, 0, 0, 1, 1, 1, 1, 1]
    df = pd.DataFrame({"a": a, "b": b, "c": c})
    out = cochrans_q(ray.data.from_pandas(df).repartition(3),
                     cols=["a", "b", "c"]).to_pandas().iloc[0]
    k, cj = 3, [sum(a), sum(b), sum(c)]
    s = sum(cj)
    r2 = sum((x + y + z) ** 2 for x, y, z in zip(a, b, c))
    expect = (k - 1) * (k * sum(v * v for v in cj) - s * s) \
        * 10**6 // (k * s - r2)
    assert out["q_ppm"] == expect
    assert out["n_a"] == 7 and out["n_b"] == 3 and out["n_c"] == 8
    # k=2 Cochran's Q == McNemar chi2 (no continuity correction)
    q2 = cochrans_q(ray.data.from_pandas(df[["a", "b"]]),
                    cols=["a", "b"]).to_pandas().iloc[0]
    m2 = mcnemar(ray.data.from_pandas(df[["a", "b"]]),
                 a_col="a", b_col="b").to_pandas().iloc[0]
    assert q2["q_ppm"] == m2["chi2_ppm"]
    # unanimous rows only -> 0 by contract
    df3 = pd.DataFrame({"a": [1, 0, 1], "b": [1, 0, 1]})
    out3 = cochrans_q(ray.data.from_pandas(df3),
                      cols=["a", "b"]).to_pandas().iloc[0]
    assert out3["q_ppm"] == 0


def test_t_closeness_exact_emd_and_violations_only():
    from htrc_feature_reader_ray.stages.profile import t_closeness

    # corpus sensitive support {1,2,3}: counts 4,4,4 -> cum 4,8,12
    # group 'low' = [1,1,1,1] (the all-bottom-band leak), 'mid' = four
    # of each spread evenly, in two QI groups
    rows = ([("low", 0, 1)] * 4
            + [("even", 0, 1), ("even", 0, 1), ("even", 0, 2),
               ("even", 0, 2), ("even", 0, 3), ("even", 0, 3)]
            + [("rest", 0, 2), ("rest", 0, 3)])
    df = pd.DataFrame(rows, columns=["slice", "day", "band"])
    out = t_closeness(
        ray.data.from_pandas(df).repartition(3),
        qi_cols=["slice", "day"], sensitive_col="band", t_ppm=150_000,
    ).set_index("slice")
    # hand EMD for 'low': N=12, corpus bands (6,3,3) -> cum_c=(6,9);
    #   n_g=4, cum_g=(4,4): num = |4*12-6*4| + |4*12-9*4| = 24+12 = 36
    #   emd = 36e6 // (4*12*2) = 375_000
    assert out.loc["low", "emd_ppm"] == 375_000
    assert out.loc["low", "group_size"] == 4
    # 'even' (emd 125_000) tracks the corpus -> below t, not emitted
    assert "even" not in out.index
    assert out.loc["rest", "emd_ppm"] == 375_000


def test_t_closeness_typed_empty_and_constant_sensitive():
    from htrc_feature_reader_ray.stages.profile import t_closeness

    # all groups == corpus distribution -> no violations, TYPED empty
    df = pd.DataFrame({"slice": ["a", "a", "b", "b"], "day": [0] * 4,
                       "band": [1, 2, 1, 2]})
    out = t_closeness(ray.data.from_pandas(df), qi_cols=["slice", "day"],
                      sensitive_col="band", t_ppm=10_000)
    assert len(out) == 0
    assert list(out.columns) == ["slice", "day", "group_size", "emd_ppm"]
    assert str(out["emd_ppm"].dtype) == "int64"
    # constant sensitive column (m=1): distance undefined -> 0, no rows
    df2 = pd.DataFrame({"slice": ["a", "b"], "day": [0, 0],
                        "band": [7, 7]})
    out2 = t_closeness(ray.data.from_pandas(df2), qi_cols=["slice", "day"],
                       sensitive_col="band", t_ppm=0)
    assert len(out2) == 0


def test_friedman_exact_consistency_and_ties():
    from htrc_feature_reader_ray.stages.profile import friedman_test

    # perfectly consistent ranking, n=3 blocks, k=3 treatments
    # classic chi2 = n(k-1) = 6 at perfect consistency
    rows = []
    for b in range(3):
        for j, t in enumerate(["lo", "mid", "hi"]):
            rows.append((b, t, 10 * (j + 1) + b))
    df = pd.DataFrame(rows, columns=["blk", "trt", "v"])
    out = friedman_test(ray.data.from_pandas(df).repartition(3),
                        block_col="blk", treatment_col="trt",
                        value_col="v")
    r = out.iloc[0]
    assert r["n_blocks"] == 3 and r["k"] == 3
    assert r["chi2_ppm"] == 6_000_000
    # all-tied blocks -> denominator 0 -> 0 by contract
    df2 = pd.DataFrame([(b, t, 5) for b in range(2)
                        for t in ("x", "y")],
                       columns=["blk", "trt", "v"])
    out2 = friedman_test(ray.data.from_pandas(df2), block_col="blk",
                         treatment_col="trt", value_col="v")
    assert out2.iloc[0]["chi2_ppm"] == 0


def test_friedman_zero_fill_missing_cells():
    from htrc_feature_reader_ray.stages.profile import friedman_test

    # treatment 'b' missing in block 1 -> zero-filled, ranked last
    # block 0: a=1, b=9 -> dr(a)=2, dr(b)=4
    # block 1: a=5, b=0 -> dr(b)=2, dr(a)=4
    # DR_a = 6, DR_b = 6 == n(k+1) -> num 0 -> chi2 0 (perfect swap)
    df = pd.DataFrame([(0, "a", 1), (0, "b", 9), (1, "a", 5)],
                      columns=["blk", "trt", "v"])
    out = friedman_test(ray.data.from_pandas(df), block_col="blk",
                        treatment_col="trt", value_col="v")
    r = out.iloc[0]
    assert r["n_blocks"] == 2 and r["k"] == 2
    assert r["chi2_ppm"] == 0


def test_bradley_terry_integer_items_stay_native_and_sort_numerically():
    from htrc_feature_reader_ray.stages.profile import bradley_terry

    # items 2, 10, 100: str() coercion would sort them "10" < "100" <
    # "2"; native ints must sort numerically, matching the SQL mirror
    df = pd.DataFrame(
        [(10, 2)] * 5 + [(100, 10)] * 5 + [(2, 100)] * 2,
        columns=["winner", "loser"])
    out = bradley_terry(ray.data.from_pandas(df).repartition(3),
                        winner_col="winner", loser_col="loser")
    assert list(out["item"]) == [2, 10, 100]
    assert str(out["item"].dtype) == "int64"
    # games: 2 plays in 5+2, 10 in 5+5, 100 in 5+2
    g = dict(zip(out["item"], out["games"]))
    assert g == {2: 7, 10: 10, 100: 7}


def test_mcnemar_and_cochrans_q_zero_block_input():
    from htrc_feature_reader_ray.stages.profile import cochrans_q, mcnemar

    empty = ray.data.from_pandas(
        pd.DataFrame({"a": pd.Series([], dtype="int64"),
                      "b": pd.Series([], dtype="int64")}))
    m = mcnemar(empty, a_col="a", b_col="b").to_pandas()
    assert len(m) == 1
    assert int(m["n_pairs"][0]) == 0 and int(m["chi2_ppm"][0]) == 0

    q = cochrans_q(empty, cols=["a", "b"]).to_pandas()
    assert len(q) == 1
    assert int(q["n_rows"][0]) == 0 and int(q["q_ppm"][0]) == 0


def test_fleiss_kappa_exact_and_edges():
    from htrc_feature_reader_ray.stages.profile import fleiss_kappa

    def run(df, cols=("r1", "r2", "r3")):
        return fleiss_kappa(
            ray.data.from_pandas(df).repartition(3),
            cols=list(cols)).to_pandas().iloc[0]

    # Fleiss 1971 closed form replayed in Python floats for a random
    # fixture: engine's exact-ppm must floor the same value
    rng = np.random.RandomState(3)
    df = pd.DataFrame({c: rng.randint(0, 4, 300)
                       for c in ("r1", "r2", "r3")})
    # inject real agreement so kappa isn't ~0
    agree = rng.rand(300) < 0.5
    df.loc[agree, "r2"] = df.loc[agree, "r1"]
    df.loc[agree, "r3"] = df.loc[agree, "r1"]
    out = run(df)
    n, k = 300, 3
    counts = np.zeros((n, 4), dtype=np.int64)
    for c in ("r1", "r2", "r3"):
        np.add.at(counts, (np.arange(n), df[c].to_numpy()), 1)
    pairs = int((counts ** 2).sum())
    a, b = pairs - n * k, n * k * (k - 1)
    cj = counts.sum(axis=0)
    c_, d_ = int((cj ** 2).sum()), (n * k) ** 2
    den = b * (d_ - c_)
    want = (max(a * d_ - c_ * b, -den) + den) * 10**6 // den - 10**6
    assert int(out["kappa_ppm"]) == want
    assert int(out["n_categories"]) == 4
    assert 0 < int(out["kappa_ppm"]) < 1_000_000

    # perfect agreement -> exactly 1e6
    dfp = pd.DataFrame({"r1": [0, 1, 2] * 20, "r2": [0, 1, 2] * 20,
                        "r3": [0, 1, 2] * 20})
    assert int(run(dfp)["kappa_ppm"]) == 1_000_000

    # systematic disagreement -> negative kappa through the shift path
    dfn = pd.DataFrame({"r1": [0, 1] * 30, "r2": [1, 0] * 30,
                        "r3": [0, 1] * 30})
    kn = int(run(dfn)["kappa_ppm"])
    assert kn < 0

    # degenerate: every assignment one category -> 0 by contract
    dfz = pd.DataFrame({"r1": [5] * 10, "r2": [5] * 10, "r3": [5] * 10})
    assert int(run(dfz)["kappa_ppm"]) == 0


def test_anova_eta_exact_and_edges():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.profile import anova_eta

    def run(df):
        return anova_eta(
            ray.data.from_pandas(df).repartition(3),
            group_col="g", value_col="x").to_pandas().iloc[0]

    # textbook fixture replayed with exact Fractions: the engine's
    # single documented floor (per-group n*Tj^2 // nj) must match
    rng = np.random.RandomState(7)
    gs = np.repeat(["a", "b", "c"], [40, 50, 60])
    xs = np.concatenate([rng.randint(0, 50, 40),
                         rng.randint(20, 70, 50),
                         rng.randint(40, 90, 60)])
    out = run(pd.DataFrame({"g": gs, "x": xs}))
    n, k = 150, 3
    t_ = int(xs.sum())
    s_ = int((xs.astype(np.int64) ** 2).sum())
    sst_n = n * s_ - t_ * t_
    ssb_n = 0
    for g in ("a", "b", "c"):
        tj = int(xs[gs == g].sum())
        nj = int((gs == g).sum())
        ssb_n += (n * tj * tj) // nj
    ssb_n = max(0, ssb_n - t_ * t_)
    ssw_n = sst_n - ssb_n
    assert int(out["eta2_ppm"]) == ssb_n * 10**6 // sst_n
    assert int(out["f_ppm"]) == ssb_n * (n - k) * 10**6 // (ssw_n * (k - 1))
    # separated means -> big F, and eta2 agrees with the float SSB/SST
    f_float = (Fraction(ssb_n, n) / (k - 1)) / (Fraction(ssw_n, n) / (n - k))
    assert abs(int(out["f_ppm"]) - int(f_float * 10**6)) <= 1
    assert int(out["f_ppm"]) > 10**6  # F > 1 on separated means

    # identical groups: SSB floors below zero -> clamped, eta2 = F = 0
    dfe = pd.DataFrame({"g": np.repeat(["a", "b", "c"], 9),
                        "x": list([1, 2, 4] * 3) * 3})
    oute = run(dfe)
    assert int(oute["eta2_ppm"]) == 0
    assert int(oute["f_ppm"]) == 0

    # constant column: sst_n = 0 -> both 0 by contract
    outc = run(pd.DataFrame({"g": ["a", "b"] * 5, "x": [7] * 10}))
    assert int(outc["eta2_ppm"]) == 0 and int(outc["f_ppm"]) == 0

    # groups differing ONLY in mean, zero within-variance: ssw_n = 0
    # -> F reports 0 by contract with eta2 = 1e6 carrying the signal
    outm = run(pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5,
                             "x": [10] * 5 + [20] * 5}))
    assert int(outm["eta2_ppm"]) == 1_000_000
    assert int(outm["f_ppm"]) == 0


def test_anova_levene_empty_input_sql_parity():
    import duckdb

    from htrc_feature_reader_ray.stages.profile import (
        anova_eta,
        anova_eta_sql,
        levene_bf,
        levene_bf_sql,
    )

    # empty input: engine emits the typed all-zero row; the mirrors
    # must match it (coalesced sums over the empty pg CTE — ADVICE r3:
    # previously n_rows/k_groups came back NULL from SQL)
    df = pd.DataFrame({"g": pd.Series([], dtype=str),
                       "x": pd.Series([], dtype="int64")})
    ds = ray.data.from_pandas(df)
    con = duckdb.connect()
    con.register("t_empty", df)

    eng_a = anova_eta(ds, group_col="g", value_col="x").to_pandas()
    sql_a = con.execute(anova_eta_sql(
        src_sql="SELECT g, x FROM t_empty", group="g",
        value_expr="x")).df()
    assert eng_a.iloc[0].tolist() == [0, 0, 0, 0]
    pd.testing.assert_frame_equal(eng_a, sql_a, check_dtype=False)

    eng_l = levene_bf(ds, group_col="g", value_col="x").to_pandas()
    sql_l = con.execute(levene_bf_sql(
        src_sql="SELECT g, x FROM t_empty", group="g",
        value_expr="x")).df()
    assert eng_l.iloc[0].tolist() == [0, 0, 0, 0]
    pd.testing.assert_frame_equal(eng_l, sql_l, check_dtype=False)


def test_levene_bf_exact_and_edges():
    from htrc_feature_reader_ray.stages.profile import levene_bf

    def run(df, q=1):
        return levene_bf(
            ray.data.from_pandas(df).repartition(3),
            group_col="g", value_col="x", quantize=q).to_pandas().iloc[0]

    # equal-spread groups with different means: W ~ 0 (deviation
    # distributions identical) regardless of the mean shift
    df = pd.DataFrame({
        "g": ["a"] * 7 + ["b"] * 7,
        "x": [10, 11, 12, 13, 14, 15, 16,
              50, 51, 52, 53, 54, 55, 56]})
    out = run(df)
    assert int(out["w_ppm"]) == 0
    assert int(out["eta2_ppm"]) == 0

    # one wide group vs one tight group: W large
    dfw = pd.DataFrame({
        "g": ["a"] * 8 + ["b"] * 8,
        "x": [100, 100, 101, 101, 99, 99, 100, 100,
              0, 50, 100, 150, 200, 250, 300, 350]})
    outw = run(dfw)
    assert int(outw["w_ppm"]) > 10**6

    # replay the exact algebra incl. the LOWER-median pin on an even
    # group (sorted b: median = element at index (8-1)//2 = 3 -> 150)
    med_a, med_b = 100, 150
    d = np.abs(dfw["x"].to_numpy() -
               np.where(dfw["g"] == "a", med_a, med_b))
    n, k = 16, 2
    t_ = int(d.sum()); s_ = int((d.astype(np.int64) ** 2).sum())
    sst_n = n * s_ - t_ * t_
    ssb_n = 0
    for g, m in (("a", med_a), ("b", med_b)):
        mask = (dfw["g"] == g).to_numpy()
        tj = int(d[mask].sum()); nj = int(mask.sum())
        ssb_n += (n * tj * tj) // nj
    ssb_n = max(0, ssb_n - t_ * t_)
    want_w = ssb_n * (n - k) * 10**6 // ((sst_n - ssb_n) * (k - 1))
    assert int(outw["w_ppm"]) == want_w

    # quantize bounds the support grid: /10 grid still flags the gap
    assert int(run(dfw, q=10)["w_ppm"]) > 10**6

    # constant groups: all deviations 0 -> 0 by contract
    outz = run(pd.DataFrame({"g": ["a", "b"] * 4, "x": [5] * 8}))
    assert int(outz["w_ppm"]) == 0


def test_l_diversity_dominance_and_contracts():
    import pytest

    from htrc_feature_reader_ray.stages.profile import l_diversity

    def run(df, l=4):
        return (l_diversity(ray.data.from_pandas(df).repartition(3),
                            qi_cols=["qa", "qb"], sensitive_col="s",
                            l=l).to_pandas()
                .sort_values(["qa", "qb"]).reset_index(drop=True))

    # the case k-anonymity AND distinct-l both pass: 20 rows, 3 distinct
    # users, but 18 rows belong to one user -> H well under 2 bits
    dom = pd.DataFrame({"qa": ["t"] * 20, "qb": [1] * 20,
                        "s": [7] * 18 + [8, 9]})
    # a balanced group of the same size: 4 users x 5 rows -> H = 2 bits
    # exactly (uniform over 4) -> NOT a violation at l=4
    bal = pd.DataFrame({"qa": ["u"] * 20, "qb": [2] * 20,
                        "s": [1, 2, 3, 4] * 5})
    out = run(pd.concat([dom, bal], ignore_index=True))
    assert len(out) == 1
    row = out.iloc[0]
    assert row["qa"] == "t" and int(row["group_size"]) == 20
    assert int(row["n_sensitive"]) == 3
    # replay the half-bit identity: n=20, c=(18,1,1)
    import numpy as np
    want = sum(int(c) * ((400).bit_length() - (c * c).bit_length())
               for c in (18, 1, 1))
    assert int(row["entropy_half_bits"]) == want
    assert want < 20 * 4  # and it is indeed under the 2-bit threshold

    # uniform-over-4 sits exactly AT the threshold: bitlen(400)-bitlen(25)
    # = 9-5 = 4 per row -> 80 = n*thr -> compliant (>= is pass)
    # singletons: entropy 0 -> always violating
    single = pd.DataFrame({"qa": ["v", "w"], "qb": [3, 3], "s": [1, 2]})
    outs = run(single)
    assert len(outs) == 2
    assert set(outs["group_size"]) == {1}

    # l must be a power of two
    with pytest.raises(ValueError):
        l_diversity(ray.data.from_pandas(single), qi_cols=["qa", "qb"],
                    sensitive_col="s", l=3)


def test_grouped_ols_exact_lines_and_contracts():
    from fractions import Fraction

    from htrc_feature_reader_ray.stages.profile import grouped_ols

    def run(df):
        return (grouped_ols(ray.data.from_pandas(df).repartition(3),
                            key="g", x_col="x", y_col="y")
                .to_pandas().set_index("g").sort_index())

    xs = list(range(10))
    df = pd.DataFrame({
        "g": (["line"] * 10 + ["neg"] * 10 + ["flat"] * 4
              + ["noisy"] * 5),
        "x": xs + xs + [3] * 4 + [0, 1, 2, 3, 4],
        "y": ([3 * x + 7 for x in xs]            # exact y = 3x + 7
              + [-2 * x + 100 for x in xs]       # exact y = -2x + 100
              + [11, 12, 13, 14]                 # zero x-variance
              + [1, 4, 4, 8, 9]),                # inexact fit
    })
    out = run(df)
    assert int(out.loc["line", "slope_ppm"]) == 3_000_000
    assert int(out.loc["line", "intercept_ppm"]) == 7_000_000
    assert int(out.loc["neg", "slope_ppm"]) == -2_000_000
    assert int(out.loc["neg", "intercept_ppm"]) == 100_000_000
    # zero x-variance: slope 0, intercept = mean y (50/4 = 12.5)
    assert int(out.loc["flat", "slope_ppm"]) == 0
    assert int(out.loc["flat", "intercept_ppm"]) == 12_500_000
    # inexact fit: replay with Fractions, truncation toward zero
    n, sx, sy = 5, 10, 26
    sxx = sum(x * x for x in [0, 1, 2, 3, 4])
    sxy = sum(x * y for x, y in zip([0, 1, 2, 3, 4], [1, 4, 4, 8, 9]))
    slope = Fraction(n * sxy - sx * sy, n * sxx - sx * sx)
    inter = Fraction(sy, n) - slope * Fraction(sx, n)
    assert int(out.loc["noisy", "slope_ppm"]) == int(slope * 10**6)
    assert int(out.loc["noisy", "intercept_ppm"]) == int(inter * 10**6)


def test_daily_ks_series_drift_and_gaps():
    from htrc_feature_reader_ray.stages.profile import daily_ks_series

    day = 86_400_000_000

    def run(rows, q=1):
        df = pd.DataFrame({
            "ts": pd.to_datetime([d * day + i for i, (d, _) in
                                  enumerate(rows)], unit="us"),
            "x": [v for _, v in rows],
        })
        return (daily_ks_series(ray.data.from_pandas(df).repartition(3),
                                ts_col="ts", value_col="x", quantize=q)
                .to_pandas().set_index("day"))

    # day 0 and day 1 identical distributions -> ks 0;
    # day 2 shifts completely -> ks exactly 1e6;
    # day 4 exists but day 3 does not -> NO row for day 4 (gap rule)
    rows = ([(0, v) for v in [1, 2, 3, 4]]
            + [(1, v) for v in [1, 2, 3, 4]]
            + [(2, v) for v in [10, 11, 12, 13]]
            + [(4, v) for v in [1, 2]])
    out = run(rows)
    assert list(out.index) == [1, 2]
    assert int(out.loc[1, "ks_ppm"]) == 0
    assert int(out.loc[2, "ks_ppm"]) == 1_000_000

    # hand case: prev {1,1,2}, cur {1,2,2}: sup {1,2};
    # F_prev = (2,3)/3, F_cur = (1,3)/3 -> max|2*3-1*3| = 3 over 9
    rows2 = [(0, 1), (0, 1), (0, 2), (1, 1), (1, 2), (1, 2)]
    out2 = run(rows2)
    assert int(out2.loc[1, "ks_ppm"]) == 3 * 1_000_000 // 9


def test_krippendorff_alpha_missing_and_exact():
    import math

    from htrc_feature_reader_ray.stages.profile import krippendorff_alpha

    def run(df, cols=("r1", "r2", "r3")):
        return (krippendorff_alpha(
            ray.data.from_pandas(df).repartition(3), cols=list(cols))
            .to_pandas().iloc[0])

    def replay(rows):
        # rows: list of dicts value-lists per item (non-null only)
        k = max(len(r) for r in rows)
        L = math.lcm(*range(1, max(k, 2)))
        A = n_tot = 0
        margins = {}
        for r in rows:
            m = len(r)
            if m < 2:
                continue
            cnt = {}
            for v in r:
                cnt[v] = cnt.get(v, 0) + 1
                margins[v] = margins.get(v, 0) + 1
            s2 = sum(c * c for c in cnt.values())
            A += (m * m - s2) * L // (m - 1)
            n_tot += m
        C = sum(x * (n_tot - x) for x in margins.values())
        den = L * C
        num = max(den - A * (n_tot - 1), -den)
        return (num + den) * 10**6 // den - 10**6

    # random fixture with 25% missing in r3, 10% in r2, plus agreement
    rng = np.random.RandomState(11)
    n = 240
    df = pd.DataFrame({c: rng.randint(0, 4, n).astype("float64")
                       for c in ("r1", "r2", "r3")})
    agree = rng.rand(n) < 0.6
    df.loc[agree, "r2"] = df.loc[agree, "r1"]
    df.loc[agree, "r3"] = df.loc[agree, "r1"]
    df.loc[rng.rand(n) < 0.25, "r3"] = np.nan
    df.loc[rng.rand(n) < 0.10, "r2"] = np.nan
    out = run(df)
    rows = []
    for _, r in df.iterrows():
        rows.append([str(int(v)) for v in r if not np.isnan(v)])
    assert int(out["alpha_ppm"]) == replay(rows)
    assert 0 < int(out["alpha_ppm"]) < 1_000_000
    # items with a single remaining rating are excluded from pairing
    assert int(out["n_pairable"]) == sum(
        len(r) for r in rows if len(r) >= 2)

    # perfect agreement incl. missing -> exactly 1e6
    dfp = pd.DataFrame({
        "r1": [0.0, 1, 2] * 20,
        "r2": [0.0, 1, 2] * 20,
        "r3": [np.nan, 1, 2] * 20,
    })
    assert int(run(dfp)["alpha_ppm"]) == 1_000_000

    # systematic disagreement -> negative through the shift path
    dfn = pd.DataFrame({"r1": [0.0, 1] * 30, "r2": [1.0, 0] * 30,
                        "r3": [np.nan] * 60})
    assert int(run(dfn)["alpha_ppm"]) < 0

    # one pooled category -> 0 by contract
    dfz = pd.DataFrame({"r1": [5.0] * 8, "r2": [5.0] * 8,
                        "r3": [np.nan] * 8})
    assert int(run(dfz)["alpha_ppm"]) == 0


def test_grouped_finishes_bit_exact_across_guard_boundary():
    """The r5 vectorized int64 fast paths in grouped_moments /
    grouped_trend / grouped_ols must match the Python-int (HUGEINT
    mirror) reference BIT FOR BIT, including groups whose intermediates
    cross the 2^53 / 2^61 magnitude guards into the exact-loop tail."""
    import math

    import ray.data

    from htrc_feature_reader_ray.stages.profile import (
        grouped_moments,
        grouped_ols,
        grouped_trend,
    )

    rng = np.random.RandomState(11)
    rows = []
    for g in range(8):
        scale = 10 ** (g + 1)  # sums fit int64; n*sxx crosses both guards
        for _ in range(50):
            rows.append((f"g{g}", int(rng.randint(0, scale)),
                         int(rng.randint(0, scale))))
    df = pd.DataFrame(rows, columns=["k", "x", "y"])
    ds = ray.data.from_pandas(df).repartition(3)

    def pyint_sums(g):
        return (len(g), int(g.x.sum()), int(g.y.sum()),
                int((g.x.astype(object) ** 2).sum()),
                int((g.y.astype(object) ** 2).sum()),
                int((g.x.astype(object) * g.y).sum()))

    def trunc(a, b):
        return -((-a) // b) if a < 0 else a // b

    got = (grouped_moments(ds, key="k", x_col="x", y_col="y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = []
    for _, g in df.groupby("k"):
        n, sx, sy, sxx, syy, sxy = pyint_sums(g)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        want.append(float(n * sxy - sx * sy) / math.sqrt(float(vx * vy))
                    if vx > 0 and vy > 0 else np.nan)
    assert np.array_equal(got["corr"].to_numpy().view(np.int64),
                          np.array(want).view(np.int64))

    got_t = (grouped_trend(ds, key="k", x_col="x", y_col="y")
             .to_pandas().sort_values("k").reset_index(drop=True))
    ws, wi = [], []
    for _, g in df.groupby("k"):
        n, sx, sy, sxx, syy, sxy = pyint_sums(g)
        den = n * sxx - sx * sx
        if den <= 0:
            ws.append(np.nan)
            wi.append(np.nan)
            continue
        s = float(n * sxy - sx * sy) / float(den)
        ws.append(s)
        wi.append((float(sy) - s * float(sx)) / float(n))
    assert np.array_equal(got_t["slope"].to_numpy().view(np.int64),
                          np.array(ws).view(np.int64))
    assert np.array_equal(got_t["intercept"].to_numpy().view(np.int64),
                          np.array(wi).view(np.int64))

    got_o = (grouped_ols(ds, key="k", x_col="x", y_col="y")
             .to_pandas().sort_values("k").reset_index(drop=True))
    wsp, wip = [], []
    for _, g in df.groupby("k"):
        n, sx, sy, sxx, syy, sxy = pyint_sums(g)
        dx = n * sxx - sx * sx
        if dx <= 0:
            wsp.append(0)
            wip.append(trunc(sy * 1_000_000, n))
            continue
        num = n * sxy - sx * sy
        wsp.append(trunc(num * 1_000_000, dx))
        wip.append(trunc((sy * dx - num * sx) * 1_000_000, n * dx))
    assert got_o["slope_ppm"].tolist() == wsp
    assert got_o["intercept_ppm"].tolist() == wip
