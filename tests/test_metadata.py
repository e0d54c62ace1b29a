"""Metadata extraction parity tests — the test_volume.py:82-129 analog:
handcrafted documents in both schema shapes, every field asserted."""

import json

import pyarrow as pa
import ray.data

from htrc_feature_reader_ray.stages.metadata import (
    MARCGT,
    MARCGT_PREFIX,
    decode_genres,
    extract_meta_doc,
    extract_metadata,
    extract_metadata_batch,
    synthesize_meta_json,
    unwrap_ld,
    walk_path,
)

LEGACY_DOC = {
    "id": "uc2.ark:/13960/t1xd0sc6x",
    "metadata": {
        "schemaVersion": "2.0",
        "title": "Anne of Green Gables / L.M. Montgomery.",
        "pubDate": "1908",
        "language": "eng",
        "typeOfResource": "text",
        "accessProfile": "open",
        "imprint": "Ryerson Press, c1908 by L.C. Page.",
        "names": ["Montgomery, L. M. (Lucy Maud) 1874-1942 "],
        "genre": [],
        "pubPlace": "onc",
        "sourceInstitution": "UC",
    },
    "features": {"pageCount": 414, "schemaVersion": "2.0"},
}

LD_DOC = {
    "htid": "uc2.ark+=13960=t1xd0sc6x",
    "metadata": {
        "schemaVersion": "3.0-ld",
        "title": "Anne of Green Gables",
        "pubDate": "1908",
        "language": "eng",
        "typeOfResource": "text",
        "accessProfile": "open",
        "publisher": {"id": "#pub", "name": "Ryerson Press"},
        "contributor": [
            {"id": "#c1", "name": "Montgomery, L. M."},
            {"id": "#c2", "name": "Another, Name"},
        ],
        "genre": [MARCGT_PREFIX + "nov", "unmapped-genre"],
        "pubPlace": {"id": "#p", "name": "onc"},
        "sourceInstitution": {"id": "#s", "name": "UC"},
    },
    "features": {"pageCount": 414, "schemaVersion": "3.0-ld"},
}


def test_legacy_fields():
    m = extract_meta_doc(LEGACY_DOC)
    md = LEGACY_DOC["metadata"]
    assert m["metadata_schema_version"] == "2.0"
    assert m["title"] == md["title"]
    assert m["pub_date"] == "1908"
    assert m["language"] == "eng"
    assert m["type_of_resource"] == "text"
    assert m["access_profile"] == "open"
    assert m["page_count"] == 414
    assert m["feature_schema_version"] == "2.0"
    assert m["imprint"] == md["imprint"]
    assert m["names"] == md["names"]
    assert m["genre"] == []
    assert m["pub_place"] == "onc"
    assert m["source_institution"] == "UC"
    assert m["id"] == LEGACY_DOC["id"]


def test_ld_fields_unwrap_and_genre_decode():
    m = extract_meta_doc(LD_DOC)
    assert m["metadata_schema_version"] == "3.0-ld"
    assert m["publisher"] == "Ryerson Press"
    assert m["names"] == ["Montgomery, L. M.", "Another, Name"]
    # marcgt URI decodes to its LOC label; unknown strings pass through
    assert m["genre"] == ["novel", "unmapped-genre"]
    assert m["pub_place"] == "onc"
    assert m["source_institution"] == "UC"
    assert m["id"] == LD_DOC["htid"]
    assert "imprint" not in m or m.get("imprint") is None


def test_missing_fields_are_none():
    m = extract_meta_doc(
        {"metadata": {"schemaVersion": "2.0", "title": "t"},
         "features": {"schemaVersion": "2.0"}}
    )
    assert m["title"] == "t"
    assert m["pub_date"] is None
    assert m["page_count"] is None
    assert m["imprint"] is None


def test_walk_and_unwrap_primitives():
    assert walk_path({"a": {"b": 1}}, ".a.b") == 1
    assert walk_path({"metadata": {"x": 2}}, "x") == 2
    assert walk_path({}, "x") is None
    assert unwrap_ld({"name": "n"}) == "n"
    assert unwrap_ld([{"name": "a"}, {"nope": 1}, {"name": "b"}]) == ["a", "b"]
    assert unwrap_ld(None) is None
    assert decode_genres(MARCGT_PREFIX + "fic") == ["fiction"]
    assert decode_genres("plain") == ["plain"]
    assert len(MARCGT) == 100


def test_batch_extraction_typed_table():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "meta_json": [json.dumps(LEGACY_DOC), json.dumps(LD_DOC)],
        }
    )
    out = extract_metadata_batch(batch)
    assert out.column("page_count").type == pa.int64()
    assert out.column("names").type == pa.list_(pa.string())
    assert out.column("genre").to_pylist() == [[], ["novel", "unmapped-genre"]]


def test_dataset_roundtrip_both_variants():
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).limit(20)
    meta = extract_metadata(
        docs.map_batches(synthesize_meta_json, batch_format="pyarrow")
    ).to_pandas()
    assert len(meta) == 20
    even = meta[meta.doc_id % 2 == 0]
    odd = meta[meta.doc_id % 2 == 1]
    assert even["imprint"].notna().all() and even["publisher"].isna().all()
    assert odd["publisher"].notna().all() and odd["imprint"].isna().all()
    # every odd doc's first genre decoded away from the URI form
    assert odd["genre"].map(lambda g: not g[0].startswith("http")).all()


def test_marc_record_pymarc_surface():
    """The Bib-API metadata path (reference feature_reader.py:535-557):
    payload -> marc-xml -> a pymarc-shaped record with tag/subfield
    accessors; network injected as the payload itself."""
    import json

    from htrc_feature_reader_ray.stages.metadata import (
        MarcRecord,
        bib_api_record,
        parse_marcxml,
    )

    xml = """<collection xmlns="http://www.loc.gov/MARC21/slim">
      <record>
        <leader>01234cam a2200301 a 4500</leader>
        <controlfield tag="001">ocm00000001</controlfield>
        <controlfield tag="008">890512s1989    nyu           000 0 eng  </controlfield>
        <datafield tag="100" ind1="1" ind2=" ">
          <subfield code="a">Doe, Jane,</subfield>
          <subfield code="d">1950-</subfield>
        </datafield>
        <datafield tag="245" ind1="1" ind2="0">
          <subfield code="a">A treatise on corpora :</subfield>
          <subfield code="b">web scale and beyond /</subfield>
          <subfield code="c">Jane Doe.</subfield>
        </datafield>
        <datafield tag="650" ind1=" " ind2="0">
          <subfield code="a">Corpora</subfield>
        </datafield>
        <datafield tag="650" ind1=" " ind2="0">
          <subfield code="a">Web archives</subfield>
        </datafield>
      </record>
    </collection>"""

    recs = parse_marcxml(xml)
    assert len(recs) == 1
    r = recs[0]
    assert r.leader.startswith("01234cam")
    assert r["001"].value() == "ocm00000001"
    assert r["245"]["a"] == "A treatise on corpora :"
    assert r["245"].indicators == ("1", "0")
    assert r.title() == "A treatise on corpora : web scale and beyond /"
    assert r.author() == "Doe, Jane,"
    assert [f["a"] for f in r.get_fields("650")] == ["Corpora",
                                                     "Web archives"]
    assert r["999"] is None and r["245"]["z"] is None
    assert len(r.get_fields()) == 6

    # the Bib-API JSON unwrap, fed an injected payload (dict AND string)
    payload = {"items": [{"fromRecord": "rec1"}],
               "records": {"rec1": {"marc-xml": xml}}}
    got = bib_api_record(payload)
    assert got.title() == r.title()
    got2 = bib_api_record(json.dumps(payload))
    assert got2.author() == "Doe, Jane,"

    # corporate author fallback (110 when no 100)
    r2 = MarcRecord(fields=[recs[0].get_fields("245")[0]])
    assert r2.author() is None
