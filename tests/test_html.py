"""HTML extraction semantics (gemmsql/pipeline/html.py) — the rules
the corpus gate's value hash rides on, pinned on handwritten pages."""

import pytest

from tests.conftest import SF_SMOKE

FIXTURE = [
    # script/style/comment content must vanish WITH the tags; plain
    # tags become word boundaries; attributes vanish
    (
        1,
        "<html><head><style>.x{color:red}</style></head>"
        '<body><script src="t.js">var hidden="SECRET";</script>'
        "<!-- also hidden --><p class='a'>alpha</p><p>beta</p>"
        "</body></html>",
        "",
        0,
        "alpha beta",
    ),
    # entity decode order: &amp;lt; is an ESCAPED "&lt;" -> decodes
    # one step to "&lt;", never double-decodes to "<"
    (
        2,
        "<p>a &amp;lt; b &lt;tag&gt; &quot;q&quot; x &amp; y</p>",
        "",
        0,
        'a &lt; b <tag> "q" x & y',
    ),
    # title + links: title text survives in the body stream too (tag
    # stripped), href attributes never leak, link text survives
    (
        3,
        "<html><head><title>T1</title></head><body>"
        '<a href="/secret-url">one</a> and '
        '<a rel="x" href="/u2">two</a></body></html>',
        "T1",
        2,
        "T1 one and two",
    ),
    # whitespace collapse: newlines/tabs/runs -> single spaces, trimmed
    (4, "  <p>\n a \t\t b \r\n</p>  ", "", 0, "a b"),
    # non-greedy strip: two script blocks must not merge into one
    # match that eats the text between them
    (
        5,
        "<script>s1</script>keep<script>s2</script>",
        "",
        0,
        "keep",
    ),
]


@pytest.fixture(scope="module")
def extracted(spark):
    from gemmsql.pipeline.html import html_extract

    pages = spark.createDataFrame(
        [(i, h) for i, h, *_ in FIXTURE], "doc_id long, html string"
    )
    rows = html_extract(pages).collect()
    return {r.doc_id: r for r in rows}


@pytest.mark.parametrize(
    "doc_id,_html,title,n_links,text",
    FIXTURE,
    ids=[str(f[0]) for f in FIXTURE],
)
def test_html_extract_semantics(extracted, doc_id, _html, title, n_links, text):
    row = extracted[doc_id]
    assert row.title == title
    assert row.n_links == n_links
    assert row.extracted == text


def test_html_corpus_gate_parity(spark, tmp_path):
    """In-repo twin of the driver hash gate (no gate entrant without
    in-repo parity) — and the synthesis variability is real: link
    counts and entity-decoded fragments differ across docs."""
    import duckdb

    from gemmsql.pipeline.html import HTML_EXTRACT_SQL, html_extract_corpus
    from tests.test_rotation import _hash

    sdf = html_extract_corpus(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    odf = con.execute(HTML_EXTRACT_SQL).df()
    con.close()
    assert len(sdf) == len(odf) > 0
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)
    assert sdf.n_links.nunique() > 1, "membership bits gated nothing"
    assert sdf.extracted.str.contains("<end>", regex=False).any()
    assert sdf.extracted.str.contains('R&D "', regex=False).any()


def test_html_extract_is_single_narrow_map(spark):
    """Plan guard: derive + strip + decode fuse into ONE projection
    over ONE documents scan — no exchange anywhere (the 100 TB shape:
    extraction cost == scan cost)."""
    from gemmsql.pipeline.html import html_extract_corpus

    plan = html_extract_corpus(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan") + plan.count("BatchScan") == 1, plan
