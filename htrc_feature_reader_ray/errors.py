"""Error types mirroring the reference's schema-capability discipline.

The reference raises ``MissingFieldError`` when a requested tokenlist folding
needs an index level the persisted table lacks (feature_reader.py:683-699,
tested at tests/test_parsers.py:80-112) and ``MissingDataError`` when a whole
table is absent (parsers.py:20-21). Here both become Arrow-schema capability
checks over column presence.
"""


class MissingFieldError(Exception):
    """A folding/op requested a column the input table does not carry."""


class MissingDataError(Exception):
    """A whole logical table (tokens / section features / chars) is absent."""


def require_columns(schema_names, needed, op=""):
    """Raise MissingFieldError unless every name in ``needed`` is present.

    ``schema_names``: iterable of column names actually available.
    """
    missing = [c for c in needed if c not in set(schema_names)]
    if missing:
        raise MissingFieldError(
            f"{op or 'operation'} requires column(s) {missing}; "
            f"available: {sorted(set(schema_names))}"
        )
