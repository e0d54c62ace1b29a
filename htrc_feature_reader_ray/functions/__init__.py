"""Pure scalar/vector functions (no Ray dependency): tokenization, POS
heuristics, id/url encoding, stable hashing. Each function that participates in
a DuckDB-oracled query carries a matching ``*_SQL`` expression so the Python
and SQL sides share one definition site.
"""
