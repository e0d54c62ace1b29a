"""htrc_feature_reader_ray — a Ray-Data-native feature-engineering engine.

A from-scratch re-expression of the query/data-processing capabilities of
htrc/htrc-feature-reader (reference at /root/reference, cited as file:line in
docstrings), generalized from per-book tokenlist reshaping to point-in-time
feature engineering over Common-Crawl-style web pages
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful stages,
``groupby``/``sort`` only where an all-to-all exchange is semantically required.

No module in this package calls ``ray.init()`` — the driver owns the session.
"""

from htrc_feature_reader_ray.errors import MissingDataError, MissingFieldError

__version__ = "0.1.0"

__all__ = [
    "MissingDataError",
    "MissingFieldError",
    "__version__",
]
