"""Scorer-quality audit: the eval battery a curation team runs before
trusting ANY scalar quality/langid/classifier score as a corpus-wide
keep rule — operating points (PR curve, gains deciles, CART stump),
calibration (reliability bins, Brier decomposition, isotonic map,
Mondrian conformal cut-offs with delivered coverage), separation
(Mann–Whitney rank dominance, Kruskal–Wallis omnibus across slices),
threshold hygiene (Cochran's Q over a cutoff battery, McNemar between
two candidate cutoffs), and error bars (Poisson-bootstrap CI per class).

Every section is an engine operator (see COVERAGE.md), each individually
driver-oracled; this example composes them into the one-shot report over
ONE scored table (the stopword-ratio English scorer vs the lang label —
the corpus-derived (score, label) pair the standalone queries use), built
once and shared by all twelve sections.

Run: python examples/eval_audit.py [sf_dir]
"""

import sys


def _scored(sf_dir: str):
    """(doc_id, lang, s, y): stopword-ratio ppm score + lang=='en' label."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from htrc_feature_reader_ray.stages.textstats import (
        STOPWORDS_EN,
        _tok_stats,
    )

    stopset = pa.array(sorted(set(STOPWORDS_EN)))

    def score(batch: pa.Table) -> pa.Table:
        flat, parent, n = _tok_stats(batch, "text")
        is_stop = pc.is_in(flat, value_set=stopset).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nstop = np.zeros(n, dtype=np.int64)
        np.add.at(nstop, parent, is_stop)
        ntok = np.bincount(parent, minlength=n).astype(np.int64)
        s = nstop * 1_000_000 // np.maximum(ntok, 1)
        y = pc.equal(batch.column("lang"), "en").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "s": pa.array(s), "y": pa.array(y)})

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    return docs.map_batches(score, batch_format="pyarrow").materialize()


def audit_eval(sf_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data

    from htrc_feature_reader_ray.stages.profile import (
        bootstrap_ci,
        brier_decomposition,
        calibration_bins,
        cochrans_q,
        conformal_threshold,
        gains_table,
        gini_split,
        isotonic_calibration,
        kruskal_wallis,
        mann_whitney,
        mcnemar,
        pr_curve,
    )

    def _pd(x):
        import pandas as pd

        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    scored = _scored(sf_dir)
    report = {}

    # 1. operating points: every achievable threshold, targeting deciles,
    # and the single best CART cut of the score against the label
    report["pr_curve"] = (
        _pd(pr_curve(scored, score_col="s", label_col="y"))
        .sort_values("threshold").reset_index(drop=True))
    report["gains"] = (
        _pd(gains_table(scored, score_col="s", label_col="y"))
        .sort_values("decile").reset_index(drop=True))
    report["stump"] = _pd(gini_split(scored, value_col="s", label_col="y"))

    # 2. calibration: does score x mean P(positive) ≈ x — the diagram,
    # the one-row Murphy scorecard, the best monotone repair map, and a
    # per-language finite-sample-guaranteed cut-off with its delivered
    # held-out coverage
    report["calibration"] = (
        _pd(calibration_bins(scored, score_col="s", label_col="y"))
        .sort_values("bin").reset_index(drop=True))
    report["brier"] = _pd(brier_decomposition(
        scored, score_col="s", label_col="y"))
    report["isotonic"] = (
        _pd(isotonic_calibration(scored, score_col="s", label_col="y"))
        .sort_values("bin").reset_index(drop=True))
    report["conformal"] = (
        _pd(conformal_threshold(scored, group_col="lang", id_col="doc_id",
                                score_col="s"))
        .sort_values("lang").reset_index(drop=True))

    # 3. separation: do positives actually out-score negatives (the
    # rank-biserial IS Cliff's delta), and does ANY language slice sit
    # apart (the omnibus gate before per-slice reads)
    report["separation"] = (
        _pd(mann_whitney(scored, group_col="y", value_col="s"))
        .sort_values("y").reset_index(drop=True))
    report["omnibus"] = _pd(kruskal_wallis(
        scored, group_col="lang", value_col="s"))

    # 4. threshold hygiene: do three candidate cutoffs differ at all
    # (Cochran's Q over the battery), and is the mid cutoff actually
    # better than the loose one as a predictor of the label (McNemar on
    # correctness) — both paired, reading only disagree rows
    def cuts(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy()
        y = t.column("y").to_numpy()
        out = {f"pass_{c}": pa.array((s >= c).astype(np.int64))
               for c in (20_000, 40_000, 60_000)}
        out["a"] = pa.array(((s >= 40_000).astype(np.int64) == y)
                            .astype(np.int64))
        out["b"] = pa.array(((s >= 20_000).astype(np.int64) == y)
                            .astype(np.int64))
        return pa.table(out)

    flags = scored.map_batches(cuts, batch_format="pyarrow").materialize()
    report["cutoff_battery"] = _pd(cochrans_q(
        flags, cols=["pass_20000", "pass_40000", "pass_60000"]))
    report["cutoff_compare"] = _pd(mcnemar(flags, a_col="a", b_col="b"))

    # 5. error bars: bootstrap CI of the mean score per class — a
    # separation read without one mistakes noise for signal
    report["score_ci"] = (
        _pd(bootstrap_ci(scored, group_col="y", value_col="s",
                         id_col="doc_id"))
        .sort_values("y").reset_index(drop=True))

    return report


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    report = audit_eval(sf_dir)
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
