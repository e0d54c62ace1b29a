"""Degenerate-input sweep: every operator in the sweep must survive a
SINGLE-ROW input without crashing (returning its documented zero/empty
contract instead). This pins the failure class the round-2 audit kept
finding (None aggregates, div-by-zero, empty-seed fixpoints) so new ops
can't regress it: a 1-row corpus exercises n=1, zero-variance,
no-valid-lag, single-class and single-node paths all at once."""

import pandas as pd
import pytest
import ray.data


def _one_event():
    return ray.data.from_pandas(pd.DataFrame({
        "event_type": ["click"],
        "user_id": [7],
        "ts": pd.to_datetime([1_700_000_000_000_000], unit="us"),
        "cents": [1234],
    }))


def _one_doc():
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1],
        "lang": ["en"],
        "text": ["lone document with a few tokens"],
    }))


def _one_edge():
    return ray.data.from_pandas(pd.DataFrame({
        "src_url": ["https://a.example.com/x"],
        "dst_url": ["https://a.example.com/y"],
    }))


def test_single_row_stats_ops():
    from htrc_feature_reader_ray.stages.profile import (
        anova_eta,
        kruskal_wallis,
        l_diversity,
        levene_bf,
    )

    ev = _one_event()
    a = anova_eta(ev, group_col="event_type",
                  value_col="cents").to_pandas().iloc[0]
    assert (int(a["n_rows"]), int(a["eta2_ppm"]), int(a["f_ppm"])) == \
        (1, 0, 0)
    lv = levene_bf(ev, group_col="event_type",
                   value_col="cents").to_pandas().iloc[0]
    assert int(lv["w_ppm"]) == 0
    kw = kruskal_wallis(_one_event(), group_col="event_type",
                        value_col="cents").to_pandas()
    assert len(kw) == 1
    ld = l_diversity(ev, qi_cols=["event_type"], sensitive_col="user_id",
                     l=4).to_pandas()
    assert len(ld) == 1  # a singleton group always violates entropy-l


def test_single_row_temporal_ops():
    from htrc_feature_reader_ray.stages.temporal import (
        dominant_period,
        holt_forecast,
    )

    dp = dominant_period(_one_event(), key="user_id",
                         ts="ts").to_pandas().iloc[0]
    assert (int(dp["best_lag"]), int(dp["autocorr_ppm"])) == (0, 0)
    hf = holt_forecast(_one_event(), key="user_id",
                       ts="ts").to_pandas().iloc[0]
    assert int(hf["n_days"]) == 1
    assert int(hf["trend_x4096"]) == 0
    assert int(hf["level_x4096"]) == 4096  # one event that day


def test_single_row_text_ops():
    from htrc_feature_reader_ray.stages.curate import best_window
    from htrc_feature_reader_ray.stages.textstats import (
        naive_bayes_confusion,
    )
    from htrc_feature_reader_ray.stages.vocab import kneser_ney_lm

    nb = naive_bayes_confusion(_one_doc(),
                               label_col="lang").to_pandas()
    assert nb.to_dict("records") == [
        {"lang": "en", "pred_label": "en", "n_docs": 1}]
    kn = kneser_ney_lm(_one_doc()).to_pandas()
    assert len(kn) == 5  # 6 tokens -> 5 distinct adjacent pairs
    assert (kn["c_ctx"] > 0).all()
    bw = best_window(_one_doc(), ["document"], width=50).to_pandas()
    assert bw.to_dict("records") == [
        {"doc_id": 1, "n_hits": 1, "win_pos": 0, "win_hits": 1}]
    # no hits -> empty result, not a crash
    bw0 = best_window(_one_doc(), ["zzz"], width=4).to_pandas()
    assert len(bw0) == 0


def test_single_edge_graph_ops():
    from htrc_feature_reader_ray.stages.linkgraph import (
        eigenvector_centrality,
        host_assortativity,
        neighbor_degree_curve,
        rich_club,
    )

    e = _one_edge()
    ha = host_assortativity(e).to_pandas().iloc[0]
    # one intra-host edge: m^2 == S -> 0 by contract, same_ppm = 1e6
    assert int(ha["r_ppm"]) == 0 and int(ha["same_ppm"]) == 1_000_000
    rc = rich_club(_one_edge(), thresholds=(1, 2)).to_pandas()
    assert (rc["phi_ppm"] == 0).all()  # both nodes degree 1
    nd = neighbor_degree_curve(_one_edge()).to_pandas()
    assert nd.to_dict("records") == [
        {"degree_bucket": 1, "n_nodes": 2, "sum_degree": 2,
         "sum_neighbor_degree": 2, "knn_ppm": 1_000_000}]
    ev = eigenvector_centrality(_one_edge(), iterations=2).to_pandas()
    assert set(ev["score"]) == {0}  # 2-node DAG drains, documented
