"""HTML text extraction — the web-corpus ingestion stage of a
pretraining pipeline (the CommonCrawl step): strip markup and
boilerplate from raw HTML pages, decode entities, and keep typed
page metadata (title, link count) for quality filtering.

Spark side is a pure narrow map — one projection of chained JVM-side
``regexp_replace`` / ``replace`` / ``regexp_extract`` calls, zero
Python UDFs, zero shuffle at any corpus size; at 100 TB the cost is
the scan, which is the correct bound for an extraction pass.

The synthetic corpus has no HTML, so (exactly like the PII gate,
``text.pii_dirty_docs``) a deterministic page is DERIVED from each
document — ``<head>`` with title + ``<style>``, a ``<nav>`` of
hash-gated links, a ``<script>`` tracker, an HTML comment, and the
document text entity-encoded inside ``<p>`` — so extraction runs
corpus-scale with a full DuckDB twin that replays the derivation, the
Java/RE2-common regex subset, the strip order, and the entity-decode
order exactly.  Everything the extractor must do is load-bearing in
the value hash: script/style/comment content must vanish WITH its
tags, tag attributes must vanish, link text must survive, entities
must decode (``&amp;`` last, or ``&amp;lt;`` would double-decode),
and whitespace must collapse.

Reference parity: the reference engine has no web-ingestion tier
(ref: core.py spans attention/mlp/xentropy only); this module is part
of the north-star LLM-data-pipeline surface, same tier as
``text.pii_scrub`` / ``dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

# ---- extraction rules (Java/RE2-common subset) ------------------------

#: strip order is fixed: containers with content first (script, style,
#: comment — dotall + non-greedy so one pathological page can't eat its
#: neighbors), then every remaining tag.  Each match becomes ONE space
#: so word boundaries survive (`a</p><p>b` -> `a b`, not `ab`).
HTML_STRIP_PATTERNS = [
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]*>",
]

#: decode order is fixed and load-bearing: ``&amp;`` LAST, so a
#: literal ``&amp;lt;`` in the source decodes to ``&lt;`` (one step),
#: never to ``<`` (double decode) — the same rule HTML5 specifies.
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&amp;", "&"),
]

#: anchor-tag detector for the link-count metadata column.
HTML_LINK_PATTERN = r"<a [^>]*href=[^>]*>"

#: explicit whitespace class (space/tab/newline/CR) instead of ``\s``:
#: Java ``\s`` includes \x0B where RE2's does not — this subset is
#: engine-identical.
HTML_WS_PATTERN = r"[ \t\n\r]+"

HTML_TITLE_PATTERN = r"<title>([^<]*)</title>"


def html_extract(pages: DataFrame, col: str = "html") -> DataFrame:
    """``(doc_id, html)`` -> ``(doc_id, title, n_links, extracted)``.

    The reusable operator: strip script/style/comment blocks with
    their content, drop all remaining tags, decode the core entities,
    collapse whitespace; keep the ``<title>`` text and the anchor-tag
    count as typed metadata.  One narrow projection, JVM-side
    whole-stage-codegen end to end.
    """
    h = F.col(col)
    title = F.regexp_extract(h, HTML_TITLE_PATTERN, 1)
    n_links = F.size(
        F.regexp_extract_all(h, F.lit(HTML_LINK_PATTERN), F.lit(0))
    ).cast("long")
    txt = h
    for pat in HTML_STRIP_PATTERNS:
        txt = F.regexp_replace(txt, pat, " ")
    for ent, ch in HTML_ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    txt = F.trim(F.regexp_replace(txt, HTML_WS_PATTERN, " "))
    return pages.select(
        "doc_id",
        title.alias("title"),
        n_links.alias("n_links"),
        txt.alias("extracted"),
    )


# ---- deterministic page synthesis (corpus-scale gate) -----------------


def _hx(h, start: int, length: int):
    """Integer value of ``length`` hex chars of ``h`` at 1-based
    ``start`` (twin: ``CAST('0x' || substring(h, ...) AS BIGINT)``)."""
    return F.conv(F.substring(h, start, length), 16, 10).cast("long")


def html_wrap_docs(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` -> ``(doc_id, html)``: a deterministic page
    derived from ``md5(doc_id)`` — pure narrow map, replayed verbatim
    by :data:`_HTML_PAGES_CTE`.

    Variability (so extraction output actually varies per doc):
    membership bits gate the 2nd/3rd nav link (``bit%2`` / ``bit%3``),
    an entity-quoted ``R&amp;D`` body prefix (``bit%5``), and an
    ``&lt;end&gt;`` suffix (``bit%7``); every hash-derived fragment
    (title id, hrefs, link texts, style color, script payload, comment
    build id) differs per doc."""
    h = F.md5(F.col("doc_id").cast("string"))
    bit = _hx(h, 16, 2)

    def link(at: int) -> F.Column:
        return F.concat(
            F.lit('<a href="/p/'),
            F.substring(h, at, 4),
            F.lit('">'),
            F.substring(h, at + 4, 3),
            F.lit("</a>"),
        )

    nl = F.lit("\n")
    title = F.concat(F.lit("Doc "), F.substring(h, 1, 8))
    style = F.concat(
        F.lit("<style>.c"),
        F.substring(h, 1, 2),
        F.lit("{color:#"),
        F.substring(h, 3, 6),
        F.lit("}</style>"),
    )
    script = F.concat(
        F.lit('<script type="text/javascript">var t="'),
        F.substring(h, 9, 8),
        F.lit('";nav(t);</script>'),
    )
    comment = F.concat(
        F.lit("<!-- build "), F.substring(h, 17, 6), F.lit(" -->")
    )
    nav = F.concat(
        F.lit("<nav>"),
        link(1),
        F.when(bit % 2 == 0, link(9)).otherwise(F.lit("")),
        F.when(bit % 3 == 0, link(17)).otherwise(F.lit("")),
        F.lit("</nav>"),
    )
    body_text = F.concat(
        F.when(bit % 5 == 0, F.lit("R&amp;D &quot;")).otherwise(F.lit("")),
        F.col("text"),
        F.when(bit % 5 == 0, F.lit("&quot;")).otherwise(F.lit("")),
        F.when(bit % 7 == 0, F.lit(" &lt;end&gt;")).otherwise(F.lit("")),
    )
    page = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title>"),
        nl,
        style,
        F.lit("</head>"),
        nl,
        F.lit("<body>"),
        comment,
        nl,
        nav,
        nl,
        script,
        nl,
        F.lit('<p class="c'),
        F.substring(h, 1, 2),
        F.lit('">'),
        body_text,
        F.lit("</p></body></html>"),
    )
    return docs.select("doc_id", page.alias("html"))


def html_extract_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate form: synthesize the page and extract, in ONE
    narrow projection (derive + strip + decode fuse into a single
    whole-stage-codegen map over the documents scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return html_extract(html_wrap_docs(docs))


# ---- DuckDB twin -------------------------------------------------------


def _sql_hx(start: int, length: int) -> str:
    return f"CAST('0x' || substring(h, {start}, {length}) AS BIGINT)"


def _sql_link(at: int) -> str:
    return (
        f"'<a href=\"/p/' || substring(h, {at}, 4) || '\">' || "
        f"substring(h, {at + 4}, 3) || '</a>'"
    )


def _html_pages_cte() -> str:
    bit = _sql_hx(16, 2)
    return f"""
hashed AS (
  SELECT doc_id, text, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
pages AS (
  SELECT doc_id,
         '<html><head><title>Doc ' || substring(h, 1, 8) || '</title>'
         || chr(10)
         || '<style>.c' || substring(h, 1, 2) || '{{color:#'
         || substring(h, 3, 6) || '}}</style></head>' || chr(10)
         || '<body><!-- build ' || substring(h, 17, 6) || ' -->'
         || chr(10)
         || '<nav>' || {_sql_link(1)}
         || CASE WHEN {bit} % 2 = 0 THEN {_sql_link(9)} ELSE '' END
         || CASE WHEN {bit} % 3 = 0 THEN {_sql_link(17)} ELSE '' END
         || '</nav>' || chr(10)
         || '<script type="text/javascript">var t="'
         || substring(h, 9, 8) || '";nav(t);</script>' || chr(10)
         || '<p class="c' || substring(h, 1, 2) || '">'
         || CASE WHEN {bit} % 5 = 0 THEN 'R&amp;D &quot;' ELSE '' END
         || text
         || CASE WHEN {bit} % 5 = 0 THEN '&quot;' ELSE '' END
         || CASE WHEN {bit} % 7 = 0 THEN ' &lt;end&gt;' ELSE '' END
         || '</p></body></html>' AS html
  FROM hashed
)"""


def _sql_extracted() -> str:
    txt = "html"
    for pat in HTML_STRIP_PATTERNS:
        txt = f"regexp_replace({txt}, '{pat}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        txt = f"replace({txt}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({txt}, '{HTML_WS_PATTERN}', ' ', 'g'))"


HTML_EXTRACT_SQL = f"""
WITH {_html_pages_cte()}
SELECT doc_id,
       regexp_extract(html, '{HTML_TITLE_PATTERN}', 1) AS title,
       CAST(len(regexp_extract_all(html, '{HTML_LINK_PATTERN}'))
            AS BIGINT) AS n_links,
       {_sql_extracted()} AS extracted
FROM pages
"""
