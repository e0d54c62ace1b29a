"""Tokenization + POS-heuristic parity contract (Python ⇄ DuckDB SQL).

The reference's token/POS facets come pre-computed in EF JSON
(``tokenPosCount``, parsers.py:352-370). Our web-scale engine computes them
from text. To make every pipeline exactly DuckDB-oracle-checkable, tokenization
is defined ONCE here in two synchronized forms:

* vectorized pyarrow/numpy kernels (used inside ``map_batches``), and
* the equivalent DuckDB SQL expression strings.

Contract:
  tokens(text)  == string_split(text, ' ') with empty tokens removed
  pos(token)    == first match of [CD, NNP, VBG, VBD, NNS] else NN
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# tokens

TOKEN_SPLIT_SQL = "string_split({col}, ' ')"
# filter applied after unnest on the SQL side:
TOKEN_NONEMPTY_SQL = "token != ''"


def split_tokens(text_col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """``text`` column -> list<string> of tokens (split on single space).

    Empty tokens are retained here (so list offsets align with the SQL
    ``string_split``); drop them after flattening with ``nonempty_mask``.
    """
    return pc.split_pattern(text_col, pattern=" ")


def nonempty_mask(token_arr: pa.Array) -> pa.BooleanArray:
    return pc.not_equal(token_arr, "")


# ---------------------------------------------------------------------------
# POS heuristic — deterministic, vectorized, SQL-mirrored.
# Order matters and must match POS_SQL exactly.

POS_SQL = (
    "CASE WHEN regexp_matches({tok}, '^[0-9]+$') THEN 'CD' "
    "WHEN regexp_matches({tok}, '^[A-Z]') THEN 'NNP' "
    "WHEN {tok} LIKE '%ing' THEN 'VBG' "
    "WHEN {tok} LIKE '%ed' THEN 'VBD' "
    "WHEN {tok} LIKE '%s' THEN 'NNS' "
    "ELSE 'NN' END"
)


def pos_tags(token_arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized POS tags for a token array (see POS_SQL)."""
    is_cd = pc.match_substring_regex(token_arr, "^[0-9]+$")
    is_nnp = pc.match_substring_regex(token_arr, "^[A-Z]")
    is_vbg = pc.ends_with(token_arr, "ing")
    is_vbd = pc.ends_with(token_arr, "ed")
    is_nns = pc.ends_with(token_arr, "s")
    out = pc.if_else(
        is_cd,
        "CD",
        pc.if_else(
            is_nnp,
            "NNP",
            pc.if_else(
                is_vbg,
                "VBG",
                pc.if_else(is_vbd, "VBD", pc.if_else(is_nns, "NNS", "NN")),
            ),
        ),
    )
    return out


# Stopword set shared by quality scoring / langid (see stages/textstats.py).
STOPWORDS_EN = ("the", "and", "of", "to", "a", "in")


def sql_in_list(values) -> str:
    return "(" + ", ".join("'" + v + "'" for v in values) + ")"
