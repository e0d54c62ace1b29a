import pyarrow as pa

from htrc_feature_reader_ray.sources.pages import (
    PAGES_SQL,
    PAGES_TEXT_SQL,
    read_pages,
    synth_pages_batch,
)
from htrc_feature_reader_ray.stages.extract import (
    HtmlExtractor,
    extract_pages,
    sections_long,
    token_counts,
    tokens_from_pages,
)
from tests.util import assert_frames_match


def test_synth_pages_matches_sql(duck):
    ray_pages = read_pages("/root/testdata/sf0.001").to_pandas()
    ray_pages = ray_pages.drop(columns=["html"])
    oracle = duck.execute(
        f"WITH {PAGES_SQL.strip()} SELECT url, warc_ts, "
        f"{PAGES_TEXT_SQL} AS text, lang FROM pages"
    ).df()
    assert_frames_match(ray_pages, oracle)


def test_extractor_byte_identical_text():
    """input_hint invariant: extracted text == ground-truth text per row."""
    docs = pa.table(
        {
            "doc_id": pa.array([7, 8], type=pa.int64()),
            "source": ["srcA", "srcB"],
            "text": ["hello world foo", "bar baz"],
            "lang": ["en", "de"],
        }
    )
    pages = synth_pages_batch(docs)
    out = HtmlExtractor()(pages)
    assert out.column("text").to_pylist() == pages.column("text").to_pylist()


def test_extract_pages_dataset_byte_identity(sf_dir):
    pages = read_pages(sf_dir)
    truth = pages.select_columns(["url", "warc_ts", "text"]).to_pandas()
    extracted = (
        extract_pages(read_pages(sf_dir, drop_text=True))
        .select_columns(["url", "warc_ts", "text"])
        .to_pandas()
    )
    merged = truth.merge(
        extracted, on=["url", "warc_ts"], suffixes=("_gt", "_ex"), how="outer"
    )
    assert len(merged) == len(truth)
    assert (merged["text_gt"] == merged["text_ex"]).all()


def test_token_counts_small_exact():
    pages = pa.table(
        {
            "url": ["u1"],
            "warc_ts": pa.array([1], type=pa.timestamp("us")),
            "header": ["head hi"],
            "body": ["dog dog cats"],
            "footer": ["bye"],
        }
    )
    from htrc_feature_reader_ray.stages.extract import token_counts_batch

    out = token_counts_batch(pages).to_pandas()
    got = {(r.section, r.token, r.pos): r.count for r in out.itertuples()}
    assert got == {
        ("header", "head", "NN"): 1,
        ("header", "hi", "NN"): 1,
        ("body", "dog", "NN"): 2,
        ("body", "cats", "NNS"): 1,
        ("footer", "bye", "NN"): 1,
    }


def test_tokens_from_pages_html_vs_text_paths(sf_dir):
    via_html = tokens_from_pages(sf_dir, via_html=True).to_pandas()
    via_text = tokens_from_pages(sf_dir, via_html=False).to_pandas()
    key = ["url", "warc_ts", "section", "token", "pos"]
    left = via_html.sort_values(key).reset_index(drop=True)
    right = via_text.sort_values(key).reset_index(drop=True)
    assert left.equals(right[left.columns])
    assert left["count"].sum() > 0


def test_extractor_vectorized_matches_scalar():
    """The RE2 batch kernel must agree byte-for-byte with the Python-loop
    reference on adversarial shapes (no match, multiline zones, unicode,
    stray tags, empty zones)."""
    from htrc_feature_reader_ray.stages.extract import HtmlExtractor

    docs = [
        b"<header>h1</header><main>b1</main><footer>f1</footer>",
        b"no zones here at all",
        b"<header>multi\nline\nhead</header><main>b\n\nb</main><footer></footer>",
        b"prefix junk <header>h</header><main>m</main><footer>f</footer> suffix",
        "<header>ünicode</header><main>中文</main><footer>x</footer>".encode(),
        b"<header>h</header><main>m</main>",  # incomplete -> no match
        b"<header></header><main></main><footer></footer>",
        b"<header>a<main>inner?</main>b</header><main>m</main><footer>f</footer>",
    ]
    batch = pa.table(
        {
            "url": [f"u{i}" for i in range(len(docs))],
            "warc_ts": pa.array([1] * len(docs), type=pa.timestamp("us")),
            "lang": ["en"] * len(docs),
            "html": pa.array(docs, type=pa.binary()),
        }
    )
    ex = HtmlExtractor()
    got = ex(batch)
    ref = ex._extract_scalar(docs)
    for col in ("header", "body", "footer", "text"):
        assert got.column(col).to_pylist() == list(ref[col]), col


def test_head_meta_batch_missing_tags_null():
    """Each head field is extracted independently: a page missing one tag
    nulls that field only; null html nulls all three."""
    from htrc_feature_reader_ray.stages.extract import head_meta_batch

    docs = [
        b'<html><head><title>t0</title>'
        b'<meta name="description" content="d0">'
        b'<meta http-equiv="content-language" content="en"></head></html>',
        b"<html><head><title>only title</title></head></html>",
        b'<meta name="description" content="only desc">',
        b"no head at all",
        None,
    ]
    batch = pa.table(
        {
            "url": [f"u{i}" for i in range(len(docs))],
            "warc_ts": pa.array([1] * len(docs), type=pa.timestamp("us")),
            "html": pa.array(docs, type=pa.binary()),
        }
    )
    out = head_meta_batch(batch)
    assert out.column("title").to_pylist() == [
        "t0", "only title", None, None, None]
    assert out.column("description").to_pylist() == [
        "d0", None, "only desc", None, None]
    assert out.column("content_language").to_pylist() == [
        "en", None, None, None, None]
    assert out.column_names == [
        "url", "warc_ts", "title", "description", "content_language"]


def test_page_profile_batch_counts():
    from htrc_feature_reader_ray.stages.extract import page_profile_batch

    docs = [
        b'<html><head></head><body><nav><a href="u1">x</a>'
        b'<a href="u2">y</a></nav><header>h h</header><main>m1  m2</main>'
        b"<footer>f</footer></body></html>",
        b"no zones, no links",  # extractor miss -> empty text, 1 'line'
    ]
    batch = pa.table({
        "url": ["a", "b"],
        "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
        "html": pa.array(docs, type=pa.binary()),
    })
    out = page_profile_batch(batch)
    # text = "h h\nm1  m2\nf": 12 chars, 3 lines, 5 \S+ tokens (double
    # space does NOT create an empty token), 2 hrefs
    assert out.column("text_chars").to_pylist() == [12, 0]
    assert out.column("n_lines").to_pylist() == [3, 1]
    assert out.column("n_tokens").to_pylist() == [5, 0]
    assert out.column("n_out_links").to_pylist() == [2, 0]
    assert out.schema.field("n_tokens").type == pa.int64()


def test_html_tables_hand_fixture():
    import duckdb

    import pandas as pd
    import ray.data

    from htrc_feature_reader_ray.stages.extract import (
        html_tables,
        html_tables_sql,
    )

    html = ("<p>pre</p>"
            "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>"
            "mid<table><tr><td>x</td></tr></table>")
    df = pd.DataFrame({"url": ["u1", "u2"], "html": [html, "<p>none</p>"]})
    out = (html_tables(ray.data.from_pandas(df).repartition(2))
           .to_pandas()
           .sort_values(["url", "table_idx", "row_idx", "col_idx"])
           .reset_index(drop=True))
    assert out["url"].tolist() == ["u1"] * 4
    assert out["cell"].tolist() == ["a", "b", "c", "x"]
    assert out["table_idx"].tolist() == [0, 0, 0, 1]
    assert out["row_idx"].tolist() == [0, 0, 1, 0]
    assert out["col_idx"].tolist() == [0, 1, 0, 0]

    con = duckdb.connect()
    con.register("pg", df)
    sql = (con.execute("WITH tpages AS (SELECT * FROM pg)"
                       + html_tables_sql()).df()
           .sort_values(["url", "table_idx", "row_idx", "col_idx"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(out, sql)
