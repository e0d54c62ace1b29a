"""Privacy-release audit: the battery a team runs over an event log and a
document corpus BEFORE shipping either outside the trust boundary — which
quasi-identifier slices re-identify their subjects (k-anonymity), which
large-and-diverse slices still leak through dominance (entropy
l-diversity) or distributional skew (t-closeness), and how much textual
PII the documents carry (regex scrub counts + Luhn-validated card runs).

Every section is an engine operator (see COVERAGE.md), each individually
driver-oracled; this example composes them into the one-shot report a
release process materializes next to its lake. Violation sections are
violations-only (audit-sized by construction); the document sections fold
to per-source counts inside the cluster, so nothing row-scale reaches the
driver.

Run: python examples/privacy_audit.py [sf_dir]
"""

import sys


def audit_privacy(sf_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from htrc_feature_reader_ray.stages.curate import (
        luhn_card_flags,
        redact_pii,
    )
    from htrc_feature_reader_ray.stages.profile import (
        k_anonymity,
        l_diversity,
        t_closeness,
    )

    def events(cols):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=list(cols))

    def derive(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")),
                     pa.int64()).to_numpy()
        cents = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "event_type": t.column("event_type"),
            "day": pa.array(us // 86_400_000_000),
            "band": pa.array(cents // 5000),
            "user_id": t.column("user_id"),
        })

    def qi_events():
        return events(["ts", "user_id", "event_type", "value"]).map_batches(
            derive, batch_format="pyarrow")

    import pandas as _pdmod

    def _pd(x):
        return x if isinstance(x, _pdmod.DataFrame) else x.to_pandas()

    report = {}
    # 1. small / single-subject QI groups (Sweeney k + distinct-l)
    report["k_anon"] = _pd(k_anonymity(
        qi_events(), qi_cols=["event_type", "day", "band"],
        sensitive_col="user_id", k=5, l_div=2))
    # 2. large groups one subject still dominates (entropy-l, half-bits)
    report["entropy_l"] = _pd(l_diversity(
        qi_events(), qi_cols=["event_type", "day", "band"],
        sensitive_col="user_id", l=4))
    # 3. groups whose sensitive DISTRIBUTION drifts from the corpus
    report["t_close"] = _pd(t_closeness(
        qi_events(), qi_cols=["event_type", "day"],
        sensitive_col="band", t_ppm=25_000))

    # 4. textual PII load per source: the redaction counts fold to
    # source-cardinality inside the cluster (clean_text never leaves)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
    red = redact_pii(docs, id_cols=("doc_id", "source"))

    def pii_fold(t: pa.Table) -> pa.Table:
        g = t.group_by(["source"]).aggregate(
            [("n_email", "sum"), ("n_phone", "sum"), ("n_ip", "sum")])
        return g.rename_columns(["source", "n_email", "n_phone", "n_ip"])

    report["pii_by_source"] = (
        red.map_batches(pii_fold, batch_format="pyarrow")
        .groupby("source")
        .sum(["n_email", "n_phone", "n_ip"])
        .to_pandas()
        .rename(columns={"sum(n_email)": "n_email",
                         "sum(n_phone)": "n_phone",
                         "sum(n_ip)": "n_ip"})
        .sort_values("source", ignore_index=True)
    )

    # 5. checksum-validated card runs (the digit-run false-positive cut)
    cards = luhn_card_flags(docs)

    def card_fold(t: pa.Table) -> pa.Table:
        nc = t.column("n_candidates").to_numpy()
        nv = t.column("n_luhn_valid").to_numpy()
        return pa.table({
            "n_candidates": pa.array([int(nc.sum())], type=pa.int64()),
            "n_luhn_valid": pa.array([int(nv.sum())], type=pa.int64()),
            "docs_flagged": pa.array([int((nv > 0).sum())],
                                     type=pa.int64()),
        })

    card_sums = cards.map_batches(card_fold, batch_format="pyarrow").sum(
        ["n_candidates", "n_luhn_valid", "docs_flagged"])
    import pandas as pd

    report["card_flags"] = pd.DataFrame({
        "n_candidates": [int(card_sums["sum(n_candidates)"] or 0)],
        "n_luhn_valid": [int(card_sums["sum(n_luhn_valid)"] or 0)],
        "docs_flagged": [int(card_sums["sum(docs_flagged)"] or 0)],
    })
    return report


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    rep = audit_privacy(sf_dir)
    for name, frame in rep.items():
        print(f"== {name} ({len(frame)} rows)")
        print(frame.head(8).to_string(index=False))
    ray.shutdown()


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    main(*sys.argv[1:2])
