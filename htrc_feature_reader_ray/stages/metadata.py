"""Schema-versioned volume metadata extraction — the reference's 30-field
metadata surface re-expressed as a typed Arrow table op.

Reference analogs (parity targets):
  * field tables METADATA_FIELDS / METADATA_FIELDS_1_3 / METADATA_FIELDS_3_0
    (parsers.py:145-175): dotted-path -> snake_case attribute mapping, chosen
    by the document's schemaVersion;
  * the dotted-path walk with missing-field -> None (parsers.py:213-226);
  * JSON-LD post-processing for ``*_ld`` fields (parsers.py:227-242):
    ``{..., "name": x}`` unwraps to ``x``; a list unwraps to the list of
    names; ``genre`` additionally decodes MARC Genre Terms URIs
    (``http://id.loc.gov/vocabulary/marcgt/<code>``) via the LOC vocabulary
    table (utils.py:7; public data from http://id.loc.gov/vocabulary/marcgt/).

Execution shape: one stateless ``map_batches`` (pyarrow) — the JSON walk is
per-document by nature, but the batch emits a single typed Arrow table, list
columns included, so everything downstream stays columnar.
"""

from __future__ import annotations

import json

import pyarrow as pa

# LOC MARC Genre Terms code -> label (public vocabulary; utils.py:7 analog),
# sorted by code.
MARCGT = {
    "abs": "abstract or summary", "aro": "art original", "arr": "art reproduction",
    "art": "article", "atl": "atlas", "aut": "autobiography",
    "bda": "bibliographic data", "bib": "bibliography", "bio": "biography",
    "boo": "book", "cal": "calendar", "cat": "catalog",
    "cgn": "comic or graphic novel", "cha": "chart", "cod": "comedy",
    "com": "computer program", "cpb": "conference publication", "dic": "dictionary",
    "dio": "diorama", "dir": "directory", "dis": "discography",
    "doc": "document (computer)", "dra": "drama", "dtb": "database",
    "enc": "encyclopedia", "ess": "essay", "fes": "festschrift",
    "fic": "fiction", "fil": "filmography", "fin": "finding aid",
    "fla": "flash card", "fls": "filmstrip", "fol": "folktale",
    "fon": "font", "gam": "game", "glo": "globe",
    "gov": "government publication", "gra": "graphic", "han": "handbook",
    "his": "history", "hum": "humor, satire", "ind": "index",
    "inm": "interactive multimedia", "ins": "instruction", "int": "interview",
    "iss": "issue", "jou": "journal", "kit": "kit",
    "lan": "language instruction", "law": "law report or digest", "lea": "legal article",
    "lec": "legal case and case notes", "leg": "legislation", "let": "letter",
    "loo": "loose-leaf", "man": "manuscript", "map": "map",
    "mem": "memoir", "mic": "microscope slide", "mod": "model",
    "mot": "motion picture", "new": "newspaper", "nos": "nonmusical sound",
    "nov": "novel", "num": "numeric data", "off": "offprint",
    "ons": "online system or service", "pat": "patent", "per": "periodical",
    "pic": "picture", "pla": "playing cards", "poe": "poetry",
    "pos": "postcard", "pro": "programmed text", "puz": "puzzle",
    "rea": "realia", "reh": "rehearsal", "rem": "remote sensing image",
    "rep": "representational", "rev": "review", "rpt": "reporting",
    "scr": "script", "ser": "series", "sho": "short story",
    "sli": "slide", "sou": "sound", "spe": "speech",
    "sta": "statistics", "stp": "standard or specification", "sur": "survey of literature",
    "ted": "technical drawing", "ter": "technical report", "the": "thesis",
    "toy": "toy", "tra": "transparency", "tre": "treaty",
    "vid": "videorecording", "wal": "wall map", "web": "web site",
    "yea": "yearbook",
}


MARCGT_PREFIX = "http://id.loc.gov/vocabulary/marcgt/"

# (dotted source path, snake_case output name) — parsers.py:145-152 analog.
# Paths without a leading component are rooted at the document; bare-name
# paths are rooted at the 'metadata' object (the reference's implicit
# 'metadata.' prefix, parsers.py:214-216).
METADATA_FIELDS = [
    ("schemaVersion", "metadata_schema_version"),
    ("title", "title"),
    ("pubDate", "pub_date"),
    ("language", "language"),
    ("typeOfResource", "type_of_resource"),
    ("accessProfile", "access_profile"),
    ("features.pageCount", "page_count"),
    ("features.schemaVersion", "feature_schema_version"),
]

# legacy (v1/2) extra fields — parsers.py:154-166 analog
METADATA_FIELDS_LEGACY = [
    ("imprint", "imprint"),
    ("names", "names"),
    ("genre", "genre"),
    ("pubPlace", "pub_place"),
    ("sourceInstitution", "source_institution"),
    (".id", "id"),
]

# JSON-LD (v3) extra fields; *_ld fields get name-unwrap post-processing —
# parsers.py:168-175 analog
METADATA_FIELDS_LD = [
    ("publisher", "publisher_ld"),
    ("contributor", "contributor_ld"),
    ("genre", "genre_ld"),
    ("pubPlace", "pub_place_ld"),
    ("sourceInstitution", "source_institution_ld"),
    (".htid", "id"),
]

LEGACY_SCHEMAS = ("1.0", "2.0")


def walk_path(obj, dotted: str):
    """Dotted-path descent with missing -> None (parsers.py:213-226)."""
    if not dotted.startswith(".") and not dotted.split(".", 1)[0] in (
        "features",
    ):
        dotted = "metadata." + dotted
    ptr = obj
    for field in dotted.strip(".").split("."):
        if isinstance(ptr, dict) and field in ptr:
            ptr = ptr[field]
        else:
            return None
    return ptr


def unwrap_ld(value):
    """JSON-LD name unwrap (parsers.py:236-242): dict with 'name' -> the
    name; list -> list of member names; None passes through."""
    if value is None:
        return None
    if isinstance(value, dict):
        return value.get("name")
    if isinstance(value, list):
        return [v["name"] for v in value if isinstance(v, dict) and "name" in v]
    return value


def decode_genres(value):
    """MARC URI decode (parsers.py:229-235): known marcgt URIs become their
    label, everything else passes through unchanged."""
    if value is None:
        return []
    if not isinstance(value, list):
        value = [value]
    out = []
    for g in value:
        if (
            isinstance(g, str)
            and g.startswith(MARCGT_PREFIX)
            and g[len(MARCGT_PREFIX):] in MARCGT
        ):
            out.append(MARCGT[g[len(MARCGT_PREFIX):]])
        else:
            out.append(g)
    return out


def extract_meta_doc(doc: dict) -> dict:
    """One parsed JSON document -> flat snake_case metadata dict, with the
    schema-version switch, LD unwrap and genre decode applied. The switch
    reads features.schemaVersion (the reference switches on the same path,
    parsers.py:196-209)."""
    schema = walk_path(doc, "features.schemaVersion")
    fields = list(METADATA_FIELDS)
    legacy = schema in LEGACY_SCHEMAS
    fields += METADATA_FIELDS_LEGACY if legacy else METADATA_FIELDS_LD
    meta: dict = {}
    for dotted, name in fields:
        val = walk_path(doc, dotted)
        if name == "genre_ld":
            meta["genre_ld"] = val
            meta["genre"] = decode_genres(val)
        elif name.endswith("_ld"):
            meta[name] = val
            meta[name[:-3]] = unwrap_ld(val)
        else:
            meta[name] = val
    if legacy:
        # unify the author column: legacy 'names' list == LD contributor names
        meta.setdefault("names", None)
    else:
        names = meta.get("contributor")
        meta["names"] = names if isinstance(names, list) else (
            [names] if names else None
        )
    g = meta.get("genre")
    if g is not None and not isinstance(g, list):
        meta["genre"] = [g]
    return meta


OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("metadata_schema_version", pa.string()),
        ("title", pa.string()),
        ("pub_date", pa.string()),
        ("language", pa.string()),
        ("type_of_resource", pa.string()),
        ("access_profile", pa.string()),
        ("page_count", pa.int64()),
        ("feature_schema_version", pa.string()),
        ("imprint", pa.string()),
        ("pub_place", pa.string()),
        ("source_institution", pa.string()),
        ("publisher", pa.string()),
        ("id", pa.string()),
        ("names", pa.list_(pa.string())),
        ("genre", pa.list_(pa.string())),
    ]
)


def extract_metadata_batch(batch: pa.Table, *, json_col: str = "meta_json",
                           id_col: str = "doc_id") -> pa.Table:
    """(id, nested-JSON) batch -> typed flat metadata table (OUTPUT_SCHEMA).
    Fields a schema variant lacks are null (the reference's Volume exposes
    exactly the fields its schema defines; the unified lake keeps one
    superset schema so downstream projections are schema-stable)."""
    cols: dict[str, list] = {f.name: [] for f in OUTPUT_SCHEMA}
    ids = batch.column(id_col).to_pylist()
    for i, doc_str in enumerate(batch.column(json_col).to_pylist()):
        meta = extract_meta_doc(json.loads(doc_str))
        cols["doc_id"].append(ids[i])
        for f in OUTPUT_SCHEMA:
            if f.name == "doc_id":
                continue
            # LD pub_place/source_institution unwrap into the base name
            cols[f.name].append(meta.get(f.name))
    return pa.table(
        {f.name: pa.array(cols[f.name], type=f.type) for f in OUTPUT_SCHEMA}
    )


def extract_metadata(ds, *, json_col: str = "meta_json",
                     id_col: str = "doc_id"):
    """Dataset of (id, nested metadata JSON) -> typed metadata Dataset."""
    import functools

    return ds.map_batches(
        functools.partial(
            extract_metadata_batch, json_col=json_col, id_col=id_col
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Deterministic metadata synthesis over the documents table (the sandbox has
# no real crawl metadata; BASELINE.json input-hint rule: synthesize the input
# shape deterministically). Even doc_ids get a legacy-schema doc, odd ones a
# JSON-LD doc — so one batch exercises both parse paths.

MARC_CODES = sorted(MARCGT)


def synthesize_meta_json(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, meta_json) nested docs, deterministic in
    (doc_id, lang, source, n_chars)."""
    ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    chars = batch.column("n_chars").to_pylist()
    docs = []
    for i, lang, src, nc in zip(ids, langs, sources, chars):
        common = {
            "title": f"Doc {i}",
            "pubDate": str(1950 + i % 50),
            "language": lang,
            "typeOfResource": "text",
            "accessProfile": "open" if i % 3 else "restricted",
        }
        if i % 2 == 0:
            doc = {
                "id": f"doc.{i}",
                "metadata": {
                    "schemaVersion": "2.0",
                    **common,
                    "imprint": f"{src} Press",
                    "names": [f"Author {i % 7}"],
                    "genre": ["fiction", f"subject-{i % 4}"],
                    "pubPlace": f"p{i % 5}",
                    "sourceInstitution": src.upper(),
                },
                "features": {"pageCount": nc % 100 + 1,
                             "schemaVersion": "2.0"},
            }
        else:
            code = MARC_CODES[i % len(MARC_CODES)]
            doc = {
                "htid": f"doc.{i}",
                "metadata": {
                    "schemaVersion": "3.0-ld",
                    **common,
                    "publisher": {"id": f"#pub{i % 9}",
                                  "name": f"{src} Press"},
                    "contributor": [
                        {"id": f"#a{i % 7}", "name": f"Author {i % 7}"},
                        {"id": f"#a{(i + 1) % 7}",
                         "name": f"Author {(i + 1) % 7}"},
                    ],
                    "genre": [MARCGT_PREFIX + code, f"subject-{i % 4}"],
                    "pubPlace": {"id": f"#p{i % 5}", "name": f"p{i % 5}"},
                    "sourceInstitution": {"id": f"#s", "name": src.upper()},
                },
                "features": {"pageCount": nc % 100 + 1,
                             "schemaVersion": "3.0-ld"},
            }
        docs.append(json.dumps(doc, sort_keys=True))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "meta_json": pa.array(docs, type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# pymarc-shaped MARC record surface — the reference's ``Volume.metadata``
# (feature_reader.py:535-557): Bib-API JSON -> marc-xml -> a parsed record
# the caller navigates by tag/subfield. The HTTP GET is injected (payload
# in, record out — the FetchResolver discipline); the MARCXML walk is
# stdlib etree over the public MARC21/slim schema, and the record object
# exposes the pymarc accessors the reference's docs point users at
# (``record['245']``, ``field['a']``, ``.title()``, ``.author()``).
# ---------------------------------------------------------------------------

_MARC_NS = "{http://www.loc.gov/MARC21/slim}"


class MarcField:
    """One MARC field: control fields carry ``data``; data fields carry
    ordered ``subfields`` [(code, value), ...] plus indicators."""

    def __init__(self, tag, *, data=None, indicators=("", ""),
                 subfields=()):
        self.tag = tag
        self.data = data
        self.indicators = tuple(indicators)
        self.subfields = list(subfields)

    def __getitem__(self, code):
        """First subfield value for ``code`` (pymarc surface), None if
        absent or a control field."""
        for c, v in self.subfields:
            if c == code:
                return v
        return None

    def get_subfields(self, *codes):
        return [v for c, v in self.subfields if c in codes]

    def value(self) -> str:
        if self.data is not None:
            return self.data
        return " ".join(v for _, v in self.subfields)


class MarcRecord:
    """Minimal pymarc-shaped record: ``record['245']`` -> first field of
    that tag (None if absent), ``get_fields('650', ...)`` -> all matches
    (all fields with no args), ``.title()`` = 245 $a+$b, ``.author()`` =
    first of 100/110/111 $a — the accessors the reference's Bib-API
    metadata path hands to users."""

    def __init__(self, leader: str = "", fields=()):
        self.leader = leader
        self.fields = list(fields)

    def __getitem__(self, tag):
        for f in self.fields:
            if f.tag == tag:
                return f
        return None

    def get_fields(self, *tags):
        if not tags:
            return list(self.fields)
        return [f for f in self.fields if f.tag in tags]

    def title(self):
        f = self["245"]
        if f is None:
            return None
        parts = f.get_subfields("a") + f.get_subfields("b")
        return " ".join(p.strip() for p in parts) if parts else None

    def author(self):
        for tag in ("100", "110", "111"):
            f = self[tag]
            if f is not None and f["a"] is not None:
                return f["a"].strip()
        return None


def parse_marcxml(xml_text: str):
    """Parse a MARC21/slim XML string into MarcRecord objects (the
    pymarc.parse_xml_to_array analog, stdlib-only). Accepts a bare
    ``<record>`` or a ``<collection>`` of records, namespaced or not."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)

    def local(el):
        return el.tag.split("}", 1)[-1]

    rec_els = [root] if local(root) == "record" else [
        el for el in root.iter() if local(el) == "record"]
    out = []
    for rec in rec_els:
        leader = ""
        fields = []
        for el in rec:
            name = local(el)
            if name == "leader":
                leader = el.text or ""
            elif name == "controlfield":
                fields.append(MarcField(el.get("tag"),
                                        data=el.text or ""))
            elif name == "datafield":
                subs = [(sf.get("code"), sf.text or "")
                        for sf in el if local(sf) == "subfield"]
                fields.append(MarcField(
                    el.get("tag"),
                    indicators=(el.get("ind1", " "), el.get("ind2", " ")),
                    subfields=subs))
        out.append(MarcRecord(leader, fields))
    return out


def bib_api_record(payload) -> MarcRecord:
    """The reference's Bib-API unwrap (feature_reader.py:544-551): from
    the API's JSON (dict or string) take ``items[0].fromRecord``, look
    the id up in ``records``, parse its ``marc-xml``. Network-free: the
    caller fetches the payload (FetchResolver et al.) and passes it in."""
    import json as _json

    data = _json.loads(payload) if isinstance(payload, str) else payload
    record_id = data["items"][0]["fromRecord"]
    marc = data["records"][record_id]["marc-xml"]
    recs = parse_marcxml(marc)
    if not recs:
        raise ValueError("bib payload contained no MARC records")
    return recs[0]
