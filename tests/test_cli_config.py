import json
import subprocess
import sys

from htrc_feature_reader_ray.config import EngineConfig
from htrc_feature_reader_ray.__main__ import main


def test_cli_id_utils(capsys):
    assert main(["clean-id", "https://a.b/c"]) == 0
    out = capsys.readouterr().out.strip()
    assert "/" not in out and ":" not in out
    assert main(["extract-id", out]) == 0
    assert capsys.readouterr().out.strip() == "https://a.b/c"
    assert main(["shard-path", "https://a.b/c"]) == 0
    parts = capsys.readouterr().out.strip().split("/")
    assert len(parts) == 3


def test_config_layering(tmp_path, monkeypatch):
    (tmp_path / "graft_engine.yml").write_text(
        "num_buckets: 17\nsession_gap: 45m\n"
    )
    cfg = EngineConfig.load(cwd=str(tmp_path))
    assert cfg.num_buckets == 17
    assert cfg.session_gap == "45m"
    monkeypatch.setenv("GRAFT_NUM_BUCKETS", "23")
    cfg2 = EngineConfig.load(cwd=str(tmp_path))
    assert cfg2.num_buckets == 23  # env beats file
    assert cfg2.chunk_target == 40  # default survives


def test_filename_or_id_classifier():
    import pytest
    from htrc_feature_reader_ray.functions.ids import filename_or_id

    assert filename_or_id("part-00001.jsonl.gz") == "filename"
    assert filename_or_id("lake/tokens.parquet") == "filename"
    assert filename_or_id("vol.123.json") == "filename"
    assert filename_or_id("https://example.com/a/b") == "id"
    assert filename_or_id("example.com/page") == "id"
    with pytest.raises(ValueError):
        filename_or_id("ambiguous_thing")


def test_cli_dedup_and_metadata(tmp_path):
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "htrc_feature_reader_ray", "dedup-docs",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--out", str(tmp_path / "dd"), "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    res = json.loads(out.strip().splitlines()[-1])
    assert res["pairs"] > 0 and res["clusters"] > 0

    out = subprocess.run(
        [sys.executable, "-m", "htrc_feature_reader_ray", "extract-metadata",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--synthesize", "--out", str(tmp_path / "meta"),
         "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    res = json.loads(out.strip().splitlines()[-1])
    assert res["rows"] == 500


def test_cli_train_tokenizer(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "htrc_feature_reader_ray", "train-tokenizer",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--algo", "bpe", "--rounds", "2",
         "--out", str(tmp_path / "merges.parquet"), "--num-cpus", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    res = json.loads(out.strip().splitlines()[-1])
    assert res["rows"] == 2 and res["algo"] == "bpe"
    import pandas as pd

    merges = pd.read_parquet(tmp_path / "merges.parquet")
    assert list(merges.columns) == ["round", "left", "right", "merged",
                                    "count"]
    assert (merges["merged"] == merges["left"] + merges["right"]).all()


def test_url_parts_frame():
    import pandas as pd
    from htrc_feature_reader_ray.functions.ids import url_parts_frame

    df = url_parts_frame(
        pd.Series(
            ["https://H.com/p", "http://a.b.example.com/x/y",
             "https://example.com", "ftp://one"]
        )
    )
    assert df["scheme"].tolist() == ["https", "http", "https", "ftp"]
    assert df["host"].tolist() == ["h.com", "a.b.example.com",
                                   "example.com", "one"]
    assert df["domain"].tolist() == ["h.com", "example.com",
                                     "example.com", "one"]
    assert df["path"].tolist() == ["/p", "/x/y", "", ""]


def test_cli_audit_corpus(tmp_path, capsys):
    import json

    from htrc_feature_reader_ray.__main__ import main

    out = tmp_path / "audit"
    rc = main([
        "audit-corpus",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--events", "/root/testdata/sf0.001/events.parquet",
        "--out", str(out),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["sections"]["eval_suite"] == 100
    assert (out / "zipf.parquet").exists()


def test_cli_audit_graph(tmp_path, capsys):
    import json

    from htrc_feature_reader_ray.__main__ import main

    out = tmp_path / "gaudit"
    rc = main([
        "audit-graph",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", str(out),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["sections"]) == {
        "components", "degree_histogram", "clustering", "coreness",
        "assortativity", "reciprocity", "frontier", "resolution",
        "pagerank_top", "harmonic", "suggestions"}
    assert rep["sections"]["clustering"] == 1
    assert rep["sections"]["pagerank_top"] <= 50
    assert (out / "coreness.parquet").exists()
    assert (out / "suggestions.parquet").exists()


def test_cli_audit_embeddings(tmp_path, capsys):
    import json

    from htrc_feature_reader_ray.__main__ import main

    out = tmp_path / "eaudit"
    rc = main([
        "audit-embeddings",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", str(out),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["sections"]) == {
        "isotropy", "pca_axis", "covariance", "int8_quant",
        "matryoshka", "silhouette", "hubness", "mutual_nn"}
    assert rep["sections"]["isotropy"] == 1
    assert rep["sections"]["silhouette"] == rep["sections"]["hubness"]
    assert (out / "isotropy.parquet").exists()
    assert (out / "matryoshka.parquet").exists()


def test_cli_audit_privacy(tmp_path, capsys):
    import json

    from htrc_feature_reader_ray.__main__ import main

    out = tmp_path / "paudit"
    rc = main([
        "audit-privacy",
        "--sf-dir", "/root/testdata/sf0.001",
        "--out", str(out),
    ])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["sections"]) == {
        "k_anon", "entropy_l", "t_close", "pii_by_source", "card_flags"}
    # QI violation sections are non-empty on the fixture grid
    assert rep["sections"]["k_anon"] > 0
    assert rep["sections"]["entropy_l"] > 0
    assert rep["sections"]["card_flags"] == 1
    assert (out / "k_anon.parquet").exists()
    assert (out / "pii_by_source.parquet").exists()


def test_cli_run_flagship_checkpoint_resume(tmp_path, capsys):
    """--checkpoint drives the chained lineage resume end-to-end: build,
    full-hit rerun, and stage-loss rebuild (downstream stays hit because
    the rebuilt stage's content digest is unchanged)."""
    import shutil

    from htrc_feature_reader_ray.__main__ import main

    ck = str(tmp_path / "ck")
    args = ["run-flagship", "--sf-dir", "/root/testdata/sf0.001",
            "--checkpoint", ck]
    assert main(args) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["rows"] == 999
    assert set(out1["stages"].values()) == {"built"}

    assert main(args) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out2["stages"].values()) == {"hit"}

    shutil.rmtree(f"{ck}/windows")
    assert main(args) == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["stages"] == {"features": "hit", "windows": "built",
                              "final": "hit"}
    assert out3["rows"] == 999
