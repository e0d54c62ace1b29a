"""Driver-gate rehearsal: run every queries() entry at sf0.001 and compare
against its oracle_sql() via DuckDB (order-insensitive, like the driver)."""

import pytest

import __ray_entry__ as entry_mod
from tests.util import assert_frames_match, to_pandas

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
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
