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
