import os
import shutil

import pandas as pd
import ray.data

from htrc_feature_reader_ray.state.lineage import (
    missing_buckets,
    resume_missing_buckets,
    run_stage,
    write_partitioned,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
OUT = "/tmp/graft_test_lineage"


def setup_function(fn):
    shutil.rmtree(OUT, ignore_errors=True)


def _docs():
    return ray.data.read_parquet(DOCS, columns=["doc_id", "source", "n_chars"])


def test_write_partitioned_manifest_and_layout():
    m = write_partitioned(
        _docs(), f"{OUT}/docs", key="source", num_buckets=8, inputs=[DOCS]
    )
    assert m["row_count"] == 500
    assert sum(m["buckets"].values()) == 500
    dirs = [d for d in os.listdir(f"{OUT}/docs") if d.startswith("bucket=")]
    assert len(dirs) == len(m["buckets"])
    back = ray.data.read_parquet(f"{OUT}/docs").to_pandas()
    assert len(back) == 500


def test_watermarks_from_footers():
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "ts"],
    )
    m = write_partitioned(ds, f"{OUT}/wm", key="user_id", num_buckets=4,
                          ts_col="ts")
    assert m["watermarks"]
    import pandas as pd

    df = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts"])
    global_max = max(
        pd.Timestamp(w["ts_max"]) for w in m["watermarks"].values()
    )
    assert global_max == df["ts"].max()


def test_run_stage_skips_when_manifest_matches():
    calls = []

    def build():
        calls.append(1)
        return _docs()

    ds1, m1 = run_stage(
        f"{OUT}/stage", build, key="source", num_buckets=4, inputs=[DOCS]
    )
    ds2, m2 = run_stage(
        f"{OUT}/stage", build, key="source", num_buckets=4, inputs=[DOCS]
    )
    assert len(calls) == 1  # second run resumed from checkpoint
    assert ds2.count() == 500
    # changed params -> recompute
    ds3, _ = run_stage(
        f"{OUT}/stage", build, key="source", num_buckets=4, inputs=[DOCS],
        params={"v": 2},
    )
    assert len(calls) == 2


def test_resume_missing_buckets():
    write_partitioned(_docs(), f"{OUT}/lake", key="source", num_buckets=8,
                      inputs=[DOCS])
    all_dirs = sorted(
        d for d in os.listdir(f"{OUT}/lake") if d.startswith("bucket=")
    )
    victim = all_dirs[0]
    shutil.rmtree(f"{OUT}/lake/{victim}")
    missing = missing_buckets(f"{OUT}/lake", 8)
    assert int(victim.split("=")[1]) in missing

    redone = resume_missing_buckets(_docs(), f"{OUT}/lake", key="source",
                                    num_buckets=8)
    assert int(victim.split("=")[1]) in redone
    back = ray.data.read_parquet(f"{OUT}/lake").to_pandas()
    assert len(back) == 500
    assert back["doc_id"].nunique() == 500
