"""Pre-training corpus audit: the battery of distribution-health checks a
data team runs BEFORE spending GPU-hours — is the mixture balanced, is the
duplication budgeted, will the batch shapes waste compute, is the eval
split honest.

Every stage is an engine operator (see COVERAGE.md) and each is
individually driver-oracled; this example shows them composed into the
one-shot audit report a real pipeline materializes next to its corpus.

Run: python examples/corpus_audit.py [docs_parquet] [events_parquet]
"""

import sys


def audit_corpus(docs_path: str, events_path: str) -> dict:
    import ray.data

    from htrc_feature_reader_ray.stages.pack import (
        length_buckets,
        truncation_loss,
    )
    from htrc_feature_reader_ray.stages.profile import grouped_ks
    from htrc_feature_reader_ray.stages.sample import (
        effective_sample_size,
        eval_quota,
        temporal_split,
    )
    from htrc_feature_reader_ray.stages.textstats import (
        hapax_rate,
        token_count,
        zipf_deviation,
    )

    def docs(cols):
        return ray.data.read_parquet(docs_path, columns=list(cols))

    report = {}

    # 1. token-distribution health per language (templated / boilerplate
    #    content fingerprints)
    report["hapax"] = hapax_rate(docs(["lang", "text"])).to_pandas()
    report["zipf"] = zipf_deviation(docs(["lang", "text"]),
                                    top_k=20).to_pandas()

    # 2. batch-shape economics: padding waste per 2^k bucket and token
    #    loss per candidate max_seq_len — the pad-vs-pack-vs-truncate call
    withtok = token_count(docs(["doc_id", "text"]))
    report["padding"] = length_buckets(
        withtok, weight_col="n_tokens").to_pandas()
    report["truncation"] = truncation_loss(
        token_count(docs(["doc_id", "text"])), weight_col="n_tokens",
        lengths=(64, 256, 1024)).to_pandas()

    # 3. mixture health: how many unweighted samples each source is worth
    report["ess"] = effective_sample_size(
        docs(["source", "n_chars"]), group_col="source",
        weight_col="n_chars").to_pandas()

    # 4. a fixed-size stratified eval suite, reproducible on any cluster
    report["eval_suite"] = eval_quota(
        docs(["doc_id", "lang"]), stratum_col="lang", id_col="doc_id",
        k=100, salt="audit:").to_pandas()

    # 5. eval-split honesty over the event stream: purge an embargo band,
    #    then measure drift across the boundary
    ev = temporal_split(
        ray.data.read_parquet(events_path, columns=["event_id", "ts"]),
        ts_col="ts")
    report["split_sizes"] = (
        ev.groupby("split").count().to_pandas())
    report["length_ks"] = grouped_ks(
        docs(["source", "n_chars"]), group_col="source",
        value_col="n_chars").to_pandas()
    return report


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    docs = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.001/documents.parquet")
    events = sys.argv[2] if len(sys.argv) > 2 else (
        "/root/testdata/sf0.001/events.parquet")
    rep = audit_corpus(docs, events)
    for k, v in rep.items():
        print(f"== {k} ==\n{v.head(8)}")
