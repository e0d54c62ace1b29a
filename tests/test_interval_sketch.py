"""Tests for the equi-key range join (temporal.interval_join) and the
HyperLogLog distinct sketch (sketch.approx_distinct)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from htrc_feature_reader_ray.stages.sketch import (
    approx_distinct,
    hll_registers_batch,
)
from htrc_feature_reader_ray.stages.temporal import interval_join

T = pd.Timestamp


def _us(series):
    return pd.Series(series).astype("datetime64[us]")


def _points(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "pid": np.arange(len(rows), dtype=np.int64),
                "k": [r[0] for r in rows],
                "ts": _us([r[1] for r in rows]),
            }
        )
    )


def _intervals(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "lo": _us([r[1] for r in rows]),
                "hi": _us([r[2] for r in rows]),
                "tag": [r[3] for r in rows],
            }
        )
    )


def test_interval_join_multiplicity_and_closed_bounds():
    pts = _points(
        [
            (1, T("2024-01-01 10:00")),  # inside both intervals of k=1
            (1, T("2024-01-01 12:00")),  # exactly on a closed upper bound
            (1, T("2024-01-01 13:00")),  # outside all
            (2, T("2024-01-01 10:00")),  # right key, no intervals
        ]
    )
    ivs = _intervals(
        [
            (1, T("2024-01-01 09:00"), T("2024-01-01 12:00"), "a"),
            (1, T("2024-01-01 10:00"), T("2024-01-01 11:00"), "b"),
        ]
    )
    out = (
        interval_join(pts, ivs, on="k", ts="ts", start="lo", end="hi",
                      num_buckets=4)
        .to_pandas()
        .sort_values(["pid", "tag"])
    )
    assert list(zip(out.pid, out.tag)) == [(0, "a"), (0, "b"), (1, "a")]


def test_interval_join_left_keeps_unmatched():
    pts = _points([(1, T("2024-01-01 10:00")), (3, T("2024-01-01 10:00"))])
    ivs = _intervals([(1, T("2024-01-01 09:00"), T("2024-01-01 11:00"), "a")])
    out = (
        interval_join(pts, ivs, on="k", ts="ts", start="lo", end="hi",
                      how="left", num_buckets=4)
        .to_pandas()
        .sort_values("pid")
    )
    assert len(out) == 2
    assert out.iloc[0].tag == "a"
    assert pd.isna(out.iloc[1].tag) and pd.isna(out.iloc[1].lo)


def test_interval_join_matches_bruteforce_random():
    rng = np.random.RandomState(5)
    n_p, n_i = 400, 120
    pts_df = pd.DataFrame(
        {
            "pid": np.arange(n_p, dtype=np.int64),
            "k": rng.randint(0, 12, n_p).astype(np.int64),
            "ts": _us(pd.to_datetime(rng.randint(0, 10**6, n_p), unit="s")),
        }
    )
    ivs_lo = pd.to_datetime(rng.randint(0, 10**6, n_i), unit="s")
    ivs_df = pd.DataFrame(
        {
            "k": rng.randint(0, 12, n_i).astype(np.int64),
            "lo": _us(ivs_lo),
            "hi": _us(ivs_lo + pd.to_timedelta(
                rng.randint(0, 10**5, n_i), unit="s"
            )),
            "tag": np.arange(n_i, dtype=np.int64),
        }
    )
    got = (
        interval_join(
            ray.data.from_pandas(pts_df).repartition(9),
            ray.data.from_pandas(ivs_df), on="k", ts="ts",
            start="lo", end="hi", num_buckets=5,
        )
        .to_pandas()
        .sort_values(["pid", "tag"])
        .reset_index(drop=True)
    )
    brute = pts_df.merge(ivs_df, on="k", how="inner")
    brute = (
        brute[(brute.lo <= brute.ts) & (brute.ts <= brute.hi)]
        .sort_values(["pid", "tag"])
        .reset_index(drop=True)
    )
    assert list(got.pid) == list(brute.pid)
    assert list(got.tag) == list(brute.tag)


def test_interval_join_rejects_column_clash():
    pts = _points([(1, T("2024-01-01"))])
    bad = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "lo": _us([T("2024-01-01")]),
                      "hi": _us([T("2024-01-02")]),
                      "ts": _us([T("2024-01-01")])})
    )
    with pytest.raises(ValueError, match="clash"):
        interval_join(pts, bad, on="k", ts="ts", start="lo", end="hi")


# ---------------------------------------------------------------------------
# HyperLogLog


def _hll_scalar(values, p=6):
    """Serial reference estimator (same math as the distributed op)."""
    m = 1 << p
    j, rho = hll_registers_batch([str(v) for v in set(values)], p)
    M = np.zeros(m, dtype=np.int64)
    np.maximum.at(M, j, rho)
    S = sum(2 ** (64 - int(r)) for r in M)
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m * 2.0**64 / float(S)


def _groups_ds(n_rows, n_vals, seed=0):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], n_rows),
            "v": rng.randint(0, n_vals, n_rows).astype(np.int64),
        }
    )


def test_approx_distinct_equals_serial_reference():
    df = _groups_ds(5000, 800)
    out = (
        approx_distinct(
            ray.data.from_pandas(df).repartition(11),
            group_cols=["g"], value_col="v", num_buckets=4,
        )
        .to_pandas()
        .set_index("g")
    )
    for g in ("x", "y"):
        expect = _hll_scalar(df[df.g == g]["v"])
        assert out.loc[g, "approx_distinct"] == expect  # bit-identical


def test_approx_distinct_independent_of_cluster_shape():
    df = _groups_ds(3000, 500, seed=3)
    outs = []
    for parts, buckets in ((1, 2), (7, 4), (23, 8)):
        outs.append(
            approx_distinct(
                ray.data.from_pandas(df).repartition(parts),
                group_cols=["g"], value_col="v", num_buckets=buckets,
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_approx_distinct_error_band():
    rng = np.random.RandomState(9)
    true = 2500
    df = pd.DataFrame(
        {"g": "a", "v": rng.randint(0, true * 50, 20000) % true}
    )
    est = (
        approx_distinct(ray.data.from_pandas(df), group_cols=["g"],
                        value_col="v")
        .to_pandas()
        .iloc[0]["approx_distinct"]
    )
    n_true = df["v"].nunique()
    # m=64 -> sigma ~ 13%; allow 3 sigma
    assert abs(est - n_true) / n_true < 0.4


def test_approx_distinct_duplicates_do_not_inflate():
    df = pd.DataFrame({"g": "a", "v": [7] * 10000})
    out = approx_distinct(
        ray.data.from_pandas(df).repartition(13), group_cols=["g"],
        value_col="v",
    ).to_pandas()
    assert out.iloc[0]["registers_used"] == 1
    assert out.iloc[0]["approx_distinct"] == _hll_scalar([7])


# ---------------------------------------------------------------------------
# Count-Min


def test_countmin_overestimates_only_and_is_exact_when_sparse():
    from htrc_feature_reader_ray.stages.sketch import (
        countmin_build,
        countmin_estimate,
    )

    texts = ["a a a b", "b c", "a d"]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(3), "text": texts})
    )
    cms = countmin_build(ds, width=1024).to_pandas()
    est = countmin_estimate(cms, ["a", "b", "c", "d", "absent"]).set_index(
        "token"
    )["cms_est"]
    # 5 tokens in 1024 cells x 4 rows: collisions essentially impossible
    assert est["a"] == 4 and est["b"] == 2
    assert est["c"] == 1 and est["d"] == 1
    assert est["absent"] == 0


def test_countmin_merge_across_partitions_equals_single_pass():
    from htrc_feature_reader_ray.stages.sketch import countmin_build

    texts = [f"t{i % 40} t{i % 7} shared" for i in range(500)]
    df = pd.DataFrame({"doc_id": range(500), "text": texts})
    one = (
        countmin_build(ray.data.from_pandas(df)).to_pandas()
        .sort_values(["row", "cell"]).reset_index(drop=True)
    )
    many = (
        countmin_build(ray.data.from_pandas(df).repartition(17)).to_pandas()
        .sort_values(["row", "cell"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_countmin_bounded_error_under_collisions():
    from htrc_feature_reader_ray.stages.sketch import (
        countmin_build,
        countmin_estimate,
    )

    # 2000 distinct tokens in width=256 cells -> real collisions
    texts = [f"tok{i} tok{i} filler{i % 2000}" for i in range(2000)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(2000), "text": texts})
    )
    cms = countmin_build(ds, width=256).to_pandas()
    est = countmin_estimate(
        cms, [f"tok{i}" for i in range(50)], width=256
    )["cms_est"].to_numpy()
    true = 2
    assert (est >= true).all()  # never under
    total = 6000  # total token occurrences
    # CMS bound: err <= e/width * total with prob 1-e^-depth; generous 3x
    assert (est - true).max() <= 3 * np.e / 256 * total


def test_interval_join_composite_keys():
    rng = np.random.RandomState(13)
    pts_df = pd.DataFrame(
        {
            "pid": np.arange(200, dtype=np.int64),
            "k1": rng.randint(0, 4, 200).astype(np.int64),
            "k2": rng.choice(["a", "b"], 200),
            "ts": _us(pd.to_datetime(rng.randint(0, 10**5, 200), unit="s")),
        }
    )
    lo = pd.to_datetime(rng.randint(0, 10**5, 40), unit="s")
    ivs_df = pd.DataFrame(
        {
            "k1": rng.randint(0, 4, 40).astype(np.int64),
            "k2": rng.choice(["a", "b"], 40),
            "lo": _us(lo),
            "hi": _us(lo + pd.Timedelta("4h")),
            "tag": np.arange(40, dtype=np.int64),
        }
    )
    got = (
        interval_join(
            ray.data.from_pandas(pts_df), ray.data.from_pandas(ivs_df),
            on=["k1", "k2"], ts="ts", start="lo", end="hi", num_buckets=3,
        )
        .to_pandas().sort_values(["pid", "tag"]).reset_index(drop=True)
    )
    brute = pts_df.merge(ivs_df, on=["k1", "k2"], how="inner")
    brute = (
        brute[(brute.lo <= brute.ts) & (brute.ts <= brute.hi)]
        .sort_values(["pid", "tag"]).reset_index(drop=True)
    )
    assert list(got.pid) == list(brute.pid)
    assert list(got.tag) == list(brute.tag)


def test_bloom_build_flag_no_false_negatives_and_sql_convention():
    import ray.data

    from htrc_feature_reader_ray.stages.dedup import md5_hash64
    from htrc_feature_reader_ray.stages.sketch import (
        bloom_build,
        bloom_flag,
        bloom_positions,
    )

    members = [f"v-{i}" for i in range(600)]
    ds = ray.data.from_pandas(pd.DataFrame({"v": members})).repartition(4)
    bitmap = bloom_build(ds, value_col="v", m_bits=12, k=4)

    # the distributed fold equals the scalar position derivation
    ref = np.zeros(1 << 12, dtype=bool)
    ref[bloom_positions(members, m_bits=12, k=4)] = True
    assert (bitmap == ref).all()
    # position convention == the countmin/simhash seeded-md5 cell
    p0 = int(md5_hash64(["0:v-0"])[0] % np.uint64(1 << 12))
    assert bitmap[p0]

    probe = ray.data.from_pandas(pd.DataFrame(
        {"v": members + [f"other-{i}" for i in range(5000)]}
    )).repartition(3)
    got = bloom_flag(probe, bitmap, value_col="v", m_bits=12,
                     k=4).to_pandas()
    hits = dict(zip(got["v"], got["bloom_hit"]))
    assert all(hits[v] == 1 for v in members)  # no false negatives
    fp = np.mean([hits[f"other-{i}"] for i in range(5000)])
    assert fp < 0.05  # n=600, m=4096, k=4 -> ~0.3% expected


def test_kmv_distinct_estimate_and_shape_independence():
    import ray.data

    from htrc_feature_reader_ray.stages.sketch import kmv_distinct, kmv_sketch

    vals = pd.DataFrame({
        "g": ["a"] * 9000 + ["b"] * 40,
        "v": [f"x-{i % 3000}" for i in range(9000)]
             + [f"y-{i}" for i in range(40)],
    })
    out = {}
    for parts in (1, 7):
        ds = ray.data.from_pandas(vals).repartition(parts)
        sk = kmv_sketch(ds, group_cols=["g"], value_col="v",
                        k=128).to_pandas()
        out[parts] = kmv_distinct(sk, group_cols=["g"], k=128)
    pd.testing.assert_frame_equal(out[1], out[7])  # cluster-shape-proof
    est = dict(zip(out[1]["g"], out[1]["distinct_est"]))
    assert est["b"] == 40  # below k: exact
    assert abs(est["a"] - 3000) / 3000 < 0.30  # ~1/sqrt(k) band


def test_kmv_jaccard_overlap_bands():
    import ray.data

    from htrc_feature_reader_ray.stages.sketch import kmv_jaccard, kmv_sketch

    shared = [f"s-{i}" for i in range(2000)]
    only_a = [f"a-{i}" for i in range(2000)]
    only_c = [f"c-{i}" for i in range(2000)]
    df = pd.DataFrame({
        "g": ["A"] * 4000 + ["B"] * 4000 + ["C"] * 2000,
        "v": shared + only_a + shared + only_a[:0] + [f"b-{i}" for i in
                                                      range(2000)] + only_c,
    })
    ds = ray.data.from_pandas(df).repartition(5)
    sk = kmv_sketch(ds, group_cols=["g"], value_col="v", k=256).to_pandas()
    jac = kmv_jaccard(sk, group_col="g", k=256)
    j = {(r.g_a, r.g_b): r.jaccard_ppm / 1e6 for r in jac.itertuples()}
    assert abs(j[("A", "B")] - 1 / 3) < 0.12  # true J = 2000/6000
    assert j[("A", "C")] < 0.05 and j[("B", "C")] < 0.05  # disjoint


def test_rolling_approx_distinct_merge_vs_single_day():
    import ray.data

    from htrc_feature_reader_ray.stages.sketch import (
        rolling_approx_distinct,
    )

    # days 1-3 have disjoint user sets; the 7-day window must merge them.
    # n >> m keeps the raw estimator (no small-range correction — see the
    # module docstring) in its valid regime.
    rows = []
    for d, users in ((1, range(0, 500)), (2, range(500, 1000)),
                     (3, range(1000, 1500))):
        for u in users:
            rows.append((pd.Timestamp(f"2024-01-0{d} 10:00"), u))
    df = pd.DataFrame(rows, columns=["ts", "user_id"])
    out = {}
    for parts in (1, 5):
        got = rolling_approx_distinct(
            ray.data.from_pandas(df).repartition(parts),
            ts_col="ts", value_col="user_id", window_days=7, p=6)
        out[parts] = got
    pd.testing.assert_frame_equal(out[1], out[5])  # shape-independent
    got = out[1].set_index(out[1]["day"].dt.day)
    # estimates grow with the merged window and land near truth
    assert abs(got.loc[1, "approx_distinct"] - 500) < 200
    assert abs(got.loc[3, "approx_distinct"] - 1500) < 500
    assert (got.loc[3, "approx_distinct"]
            > got.loc[1, "approx_distinct"] * 1.8)
    assert (got["registers_used"].diff().dropna() >= 0).all()
