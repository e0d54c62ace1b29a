import pyarrow as pa
import pyarrow.compute as pc

from htrc_feature_reader_ray.functions.ids import (
    clean_id,
    extract_id,
    hash_bucket,
    stable_hash64,
)
from htrc_feature_reader_ray.functions.tokenize import (
    POS_SQL,
    nonempty_mask,
    pos_tags,
    split_tokens,
)


def test_split_tokens_matches_python_split():
    texts = pa.array(["a b c", "", "x  y", "single"])
    lists = split_tokens(texts).to_pylist()
    assert lists == [t.split(" ") for t in texts.to_pylist()]


def test_nonempty_mask():
    toks = pa.array(["a", "", "b"])
    assert nonempty_mask(toks).to_pylist() == [True, False, True]


def test_pos_tags_precedence():
    toks = pa.array(
        ["123", "Paris", "running", "jumped", "tables", "word", "Things", "90s"]
    )
    assert pos_tags(toks).to_pylist() == [
        "CD", "NNP", "VBG", "VBD", "NNS", "NN", "NNP", "NNS",
    ]


def test_pos_sql_parity(duck):
    toks = ["123", "Paris", "running", "jumped", "tables", "word", "", "Ed"]
    duck.execute("CREATE OR REPLACE TEMP TABLE _toks(i INT, tok VARCHAR)")
    duck.executemany(
        "INSERT INTO _toks VALUES (?, ?)", list(enumerate(toks))
    )
    sql_pos = [
        r[0]
        for r in duck.execute(
            "SELECT " + POS_SQL.format(tok="tok") + " FROM _toks ORDER BY i"
        ).fetchall()
    ]
    py_pos = pos_tags(pa.array(toks)).to_pylist()
    assert py_pos == sql_pos


def test_clean_extract_id_roundtrip():
    rid = "https://src0.example.com/doc/1"
    assert extract_id(clean_id(rid)) == rid
    assert "/" not in clean_id(rid)
    assert ":" not in clean_id(rid)


def test_stable_hash_deterministic():
    a = stable_hash64(["x", "y"])
    b = stable_hash64(["x", "y"])
    assert (a == b).all()
    assert (hash_bucket(["x"] * 5, 16) == hash_bucket(["x"] * 5, 16)).all()
    assert (hash_bucket(["x", "y", "z"], 4) < 4).all()


def test_extract_id_strips_facet_sidecars():
    # reference utils.extract_htid parity: compression -> format -> facet
    assert extract_id("nyp.334330.json.bz2") == "nyp.334330"
    assert extract_id("mdp.39015.tokens.parquet") == "mdp.39015"
    assert extract_id("uc1.b33+=4.meta.json.gz") == "uc1.b33:/4"
    # one strip per tier, like the reference (no infinite chain strip)
    assert extract_id("a.section.section") == "a.section"

