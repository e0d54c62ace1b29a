"""Smoke tests: the examples/ scripts run end-to-end on sf0.001."""

import sys

sys.path.insert(0, "examples")


def test_termcount_corpus_example():
    from examples.termcount_corpus import main

    top = main("/root/testdata/sf0.001")
    assert len(top) == 10
    assert (top["count"].to_numpy()[:-1] >= top["count"].to_numpy()[1:]).all()


def test_curation_pipeline_example(tmp_path):
    from examples.curation_pipeline import curate_and_pack

    out = curate_and_pack(
        "/root/testdata/sf0.001/documents.parquet", str(tmp_path / "cur")
    )
    assert out["rows_packed"] == 500
    assert 0 < out["kept"] <= 500
    assert out["shards"] >= 1


def test_link_analysis_example():
    from examples.link_analysis import analyze

    out = analyze("/root/testdata/sf0.001")
    assert out["edges"] > 0
    assert out["urls_with_degree"] > 0
    assert out["frontier_urls"] > 0
    assert len(out["top_ranked"]) == 5
    # the highest-rank urls are the engineered hubs (site homes / search)
    assert any("search.example.com" in u or u.endswith(".example.com/")
               for u in out["top_ranked"])
    # fixture link graph is triangle-free; its 2-core is non-empty
    assert out["clustering_ppm"] == 0
    assert out["two_core_urls"] > 0


def test_training_prep_pipeline(tmp_path):
    from examples.training_prep import prepare

    out = prepare("/root/testdata/sf0.001/documents.parquet",
                  str(tmp_path / "prep"), width=16, stride=12,
                  epoch_salt="e0:")
    import pyarrow.parquet as pq

    win = pq.read_table(f"{out}/windows").to_pandas()
    tok = pq.read_table(f"{out}/tokens").to_pandas()
    assert len(win) > 0 and len(tok) > 0
    # shuffle_pos is a permutation of the WINDOWS (epoch order)
    assert sorted(win.shuffle_pos.tolist()) == list(range(len(win)))
    assert win.win_key.is_unique
    # every token row belongs to a known window; OOV ids >= -1
    assert set(tok.win_key) <= set(win.win_key)
    assert int(tok.token_id.min()) >= -1


def test_corpus_audit_example():
    from examples.corpus_audit import audit_corpus

    rep = audit_corpus("/root/testdata/sf0.001/documents.parquet",
                       "/root/testdata/sf0.001/events.parquet")
    assert set(rep) == {"hapax", "zipf", "padding", "truncation", "ess",
                        "eval_suite", "split_sizes", "length_ks"}
    assert len(rep["eval_suite"]) == 100
    assert (rep["padding"]["n_seqs"] > 0).all()
    assert set(rep["split_sizes"]["split"]) <= {"train", "test", "embargo"}
    assert (rep["ess"]["ess_ppm"] <= 1_000_000).all()


def test_embedding_audit_example():
    from examples.embedding_audit import main

    sizes = main("/root/testdata/sf0.001")
    assert sizes["isotropy"] == 1
    assert sizes["pca_axis"] == 64
    assert sizes["silhouette"] == sizes["hubness"] > 0
    assert sizes["mutual_nn"] > 0


def test_eval_audit_example():
    from examples.eval_audit import main

    sizes = main("/root/testdata/sf0.001")
    assert sizes["gains"] == 10
    assert sizes["brier"] == 1 and sizes["omnibus"] == 1
    assert sizes["separation"] == 2 and sizes["score_ci"] == 2
    assert sizes["conformal"] >= 4        # one row per language slice
    assert sizes["pr_curve"] > 50         # bounded distinct-score support
    assert sizes["cutoff_battery"] == 1 and sizes["cutoff_compare"] == 1


def test_ingest_resume_example(tmp_path):
    from examples.ingest_resume import ingest_with_resume

    out = ingest_with_resume(str(tmp_path))
    assert out["run1_failed"] == 1
    assert len(out["run2_refetched_buckets"]) == 1  # only the failed bucket
    assert out["run3_refetched_buckets"] == []      # full skip-complete
    assert out["lake_rows"] == out["n_ids"]         # one token row per doc
