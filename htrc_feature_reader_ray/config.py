"""Layered engine configuration — the reference's YAML-layer loader
(config.py:18-44: package default → home → cwd) re-expressed, with env-var
overrides on top (the cluster-friendly layer).

Precedence (low → high): defaults < ~/.graft_engine.yml < ./graft_engine.yml
< GRAFT_* environment variables.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    num_buckets: int = 64            # url-hash co-partitioning width
    extract_batch_size: int | None = None  # None = whole blocks
    session_gap: str = "90m"
    chunk_target: int = 40
    chunk_strategy: str = "even"
    snapshot_mult: int = 1           # fixture scale knob (bench only)
    lake_dir: str = "/tmp/graft_lake"

    @classmethod
    def load(cls, cwd: str | None = None) -> "EngineConfig":
        cfg = cls()
        for path in (
            os.path.expanduser("~/.graft_engine.yml"),
            os.path.join(cwd or os.getcwd(), "graft_engine.yml"),
        ):
            cfg._apply(_read_yaml(path))
        env = {
            f.name: os.environ[f"GRAFT_{f.name.upper()}"]
            for f in fields(cls)
            if f"GRAFT_{f.name.upper()}" in os.environ
        }
        cfg._apply(env)
        return cfg

    _INT_FIELDS = frozenset(
        {"num_buckets", "extract_batch_size", "chunk_target", "snapshot_mult"}
    )

    def _apply(self, overrides: dict) -> None:
        for f in fields(self):
            if f.name in overrides and overrides[f.name] is not None:
                raw = overrides[f.name]
                if f.name in self._INT_FIELDS:
                    try:
                        raw = int(raw)
                    except (TypeError, ValueError):
                        continue
                setattr(self, f.name, raw)


def _read_yaml(path: str) -> dict:
    """Minimal flat YAML (key: value) reader — no yaml dependency needed for
    the flat config shape; silently empty when the file is absent."""
    out: dict = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or ":" not in line:
                    continue
                k, v = line.split(":", 1)
                out[k.strip()] = v.strip().strip("'\"")
    except OSError:
        return {}
    return out
