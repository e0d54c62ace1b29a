"""Embedding-corpus audit: the geometry-and-serving health battery a
vector-store team runs before trusting cosine thresholds, cutting
serving footprint, or building ANN indexes over a new embedding table —
is the space isotropic enough for cosine to mean anything (isotropy,
dominant PCA axis, covariance), is it safe to serve compressed (int8
quantization error, Matryoshka truncation curve), and is the local
neighborhood structure healthy (k-means silhouette, kNN hubness,
reciprocal matches).

Every section is an engine operator (see COVERAGE.md), each individually
driver-oracled; this example composes them into the one-shot report. The
embedding table is read ONCE and the k-means cell assignment is computed
ONCE (it is the shared bucketing of the three neighborhood sections).

Run: python examples/embedding_audit.py [sf_dir]
"""

import sys


def audit_embeddings(sf_dir: str) -> dict:
    import ray.data

    from htrc_feature_reader_ray.stages.partition import bucket_join
    from htrc_feature_reader_ray.stages.similarity import (
        embedding_covariance,
        embedding_isotropy,
        int8_quant_error,
        kmeans_fixed,
        kmeans_silhouette,
        knn_hubness,
        matryoshka_quality,
        mutual_nn,
        pca_power,
    )


    def _pd(x):
        import pandas as pd

        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"]).materialize()
    report = {}

    # 1. geometry: is cosine trustworthy here — one-row isotropy audit,
    # the dominant variance direction (the Mu-Viswanath de-biasing axis),
    # and the full (bounded, d²) moment matrix
    report["isotropy"] = _pd(embedding_isotropy(emb))
    report["pca_axis"] = (
        _pd(pca_power(emb, rounds=8))
        .sort_values("dim").reset_index(drop=True))
    report["covariance"] = (
        _pd(embedding_covariance(emb))
        .sort_values(["i", "j"]).reset_index(drop=True))

    # 2. serving economics: how lossy is compressed serving — per-dim
    # int8 symmetric-quantization error (outlier-feature alarm) and the
    # Matryoshka prefix-energy curve (is truncated serving safe)
    report["int8_quant"] = (
        _pd(int8_quant_error(emb))
        .sort_values("dim").reset_index(drop=True))
    report["matryoshka"] = (
        _pd(matryoshka_quality(emb))
        .sort_values("budget").reset_index(drop=True))

    # 3. neighborhood structure (all three share one k-means cell
    # assignment — the SemDeDup bucketing): cluster quality, hub vectors
    # that pollute kNN graphs, and reciprocal-match pairs
    assign = kmeans_fixed(emb, k=8, rounds=3).drop_columns(["dist"])
    joined = bucket_join(
        emb, assign.map_batches(
            lambda df: df.rename(columns={"vec_id": "vid"}),
            batch_format="pandas"),
        left_key="vec_id", right_key="vid").materialize()
    report["silhouette"] = (
        _pd(kmeans_silhouette(emb, k=8, rounds=3))
        .sort_values("vec_id").reset_index(drop=True))
    report["hubness"] = (
        _pd(knn_hubness(joined, k=5))
        .sort_values(["n_k", "vec_id"], ascending=[False, True])
        .reset_index(drop=True))
    report["mutual_nn"] = (
        _pd(mutual_nn(joined))
        .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))

    return report


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    report = audit_embeddings(sf_dir)
    return {name: len(frame) for name, frame in report.items()}


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    import json

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    print(json.dumps(main(*sys.argv[1:])))
    ray.shutdown()
