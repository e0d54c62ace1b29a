"""Driver-gate rehearsal: run every queries() entry at sf0.001 and compare
against its oracle_sql() via DuckDB (order-insensitive, like the driver).

Every parity case additionally carries ONE of the stable shard marks
``parity_a`` / ``parity_b`` / ``parity_c`` (md5(name) % 3, so a query
keeps its shard as the panel grows): three concurrent pytest processes
(``-m parity_a`` etc., each with its own local Ray) cover the whole
panel in roughly a third of the single-process wall — the documented
≤5-minute gate invocation in BASELINE.md. Run WITHOUT a mark filter,
this module still executes every case exactly once (the marks only
partition; they never skip)."""

import hashlib

import pytest

import __ray_entry__ as entry_mod
from tests.util import assert_frames_match, to_pandas

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

_SHARDS = "abc"


def _shard(name: str) -> str:
    h = int(hashlib.md5(name.encode()).hexdigest(), 16)
    return _SHARDS[h % len(_SHARDS)]


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=getattr(pytest.mark, f"parity_{_shard(n)}"))
     for n in sorted(QUERIES.keys())])
def test_query_parity(name, duck, sf_dir):
    result = QUERIES[name](sf_dir)
    df = to_pandas(result)
    if name in ORACLES:
        oracle = duck.execute(ORACLES[name]).df()
        assert_frames_match(df, oracle)
    else:
        # rows-only check (non-SQL-expressible sketch ops)
        assert len(df.columns) > 0
        assert len(df) >= 0


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


def test_entry_smoke():
    res = entry_mod.entry()
    df = to_pandas(res)
    assert len(df) > 0
