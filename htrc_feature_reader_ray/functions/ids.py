"""Entity-id encoding and key-space partitioning scalar functions.

Reference analogs: ``clean_htid``/``extract_htid`` filesystem-safe id codecs
(utils.py:9-22, 38-63) and the pairtree/stubbytree/ziptree id→path layouts
(utils.py:206-233, resolvers.py:202-318). In the web-scale engine the entity
key is a ``url``; the ziptree's sha1-prefix sharding becomes stable
hash-bucketing of urls, used for partitioned parquet lakes and co-partitioned
shuffle ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ENC = str.maketrans({":": "+", "/": "=", ".": ","})
_DEC = str.maketrans({"+": ":", "=": "/", ",": "."})


def clean_id(raw_id: str) -> str:
    """Filesystem-safe encoding of an entity id (``:/.`` → ``+=,``)."""
    return raw_id.translate(_ENC)


def extract_id(clean: str) -> str:
    """Inverse of :func:`clean_id` (also strips a trailing ``.ext`` suffix
    chain if the input looks like a filename) — reference parity with
    ``utils.extract_htid`` (utils.py:38-54): compression, then format,
    then the parquet-lake facet sidecars (.meta/.tokens/.chars/.section),
    one strip per tier."""
    base = clean
    for tier in ((".gz", ".bz2"), (".json", ".parquet"),
                 (".meta", ".tokens", ".chars", ".section")):
        for suffix in tier:
            if base.endswith(suffix):
                base = base[: -len(suffix)]
    return base.translate(_DEC)


DATA_SUFFIXES = (".gz", ".bz2", ".json", ".jsonl", ".parquet")


def filename_or_id(s: str) -> str:
    """Classify an input string as a data-file path or an entity id — the
    reference's arg-learning classifier (feature_reader.py:300-311): known
    data suffixes mean 'filename'; a dotted host (every url has one, like
    every Hathi id has an early dot) means 'id'; anything else is ambiguous
    and must be named explicitly."""
    for ending in DATA_SUFFIXES:
        if s.endswith(ending):
            return "filename"
    host = s.split("://", 1)[-1].split("/", 1)[0]
    if "." in host:
        return "id"
    raise ValueError(
        f"can't tell whether {s!r} is a filename or an entity id; "
        "name the argument explicitly"
    )


def url_parts_frame(urls: pd.Series) -> pd.DataFrame:
    """Vectorized URL decomposition (scheme, host, domain, path) — the
    web-scale id→components normalizer (every pandas .str op is one C pass).
    Semantics (mirrored 1:1 by the SQL oracle):
      scheme = text before '://' ('' if absent); rest = text after;
      host   = lowercased text before the first '/' of rest;
      path   = the remainder INCLUDING its leading '/' ('' if none);
      domain = last two dot-labels of host (the host itself if fewer)."""
    s = urls.astype(str)
    has_scheme = s.str.contains("://", regex=False)
    scheme = s.str.split("://", n=1, regex=False).str[0].where(has_scheme, "")
    rest = s.str.split("://", n=1, regex=False).str[-1]
    host = rest.str.split("/", n=1, regex=False).str[0].str.lower()
    path = rest.str.replace(r"^[^/]*", "", regex=True)
    domain = host.str.split(".").str[-2:].str.join(".")
    return pd.DataFrame(
        {"scheme": scheme, "host": host, "domain": domain, "path": path}
    )


def stable_hash64(values, *, seed: str = "graft") -> np.ndarray:
    """Deterministic (cross-process, cross-run) uint64 hash of a string array.

    Uses pandas' siphash with a fixed key — vectorized in C, stable regardless
    of PYTHONHASHSEED. This is the engine's ONE hash used for url bucketing,
    exact-dup keys and minhash base hashes, so partitioning is reproducible.
    """
    arr = np.asarray(values, dtype=object)
    key = (seed * 16)[:16]
    return pd.util.hash_array(arr, hash_key=key, categorize=False)


def hash_bucket(values, num_buckets: int, *, seed: str = "graft") -> np.ndarray:
    """``hash(value) % num_buckets`` as int64 — the shuffle/partition key."""
    return (stable_hash64(values, seed=seed) % np.uint64(num_buckets)).astype(
        np.int64
    )


def shard_path(entity_id: str, depth: int = 2, width: int = 2) -> str:
    """Stubbytree-style deterministic directory prefix for one entity
    (utils.py:222-233 analog): hex of the stable hash, sliced into
    ``depth`` path components of ``width`` chars."""
    h = format(int(stable_hash64([entity_id])[0]), "016x")
    parts = [h[i * width : (i + 1) * width] for i in range(depth)]
    return "/".join(parts + [clean_id(entity_id)])
