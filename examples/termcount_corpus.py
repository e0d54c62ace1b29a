"""Corpus term counts — the engine analog of the reference's dask corpus
example (README.md:1057-1076: per-volume tokenlists -> concat ->
groupby('pos').sum()) and examples/better-termcount-example.py.

There: the user hand-manages parallelism and merges per-volume frames on
the driver. Here: ONE lazy Dataset pipeline — the streaming executor
schedules the extract fan-out and the vocabulary-sized fold replaces the
driver-side concat.

Run: python examples/termcount_corpus.py [sf_dir]
"""

import sys


def corpus_pos_counts(sf_dir: str):
    from htrc_feature_reader_ray.sources.pages import read_pages
    from htrc_feature_reader_ray.stages.extract import (
        extract_pages,
        folded_token_counts,
    )

    pages = extract_pages(read_pages(sf_dir, drop_text=True))
    # fold away entity/snapshot/section: corpus-wide (token, pos) counts
    return folded_token_counts(
        pages, entity=False, snapshots=False, section="ignore"
    )


def main(sf_dir: str = "/root/testdata/sf0.001"):
    counts = corpus_pos_counts(sf_dir)
    top = counts.sort(["count", "token"], descending=[True, False]).limit(10)
    return top.to_pandas()


if __name__ == "__main__":
    # direct-script runs put examples/ (not the repo root) on sys.path
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    print(main(*(sys.argv[1:2] or [])))
    ray.shutdown()
