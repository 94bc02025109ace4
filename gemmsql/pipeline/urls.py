"""URL canonicalization — the normalization pass web-corpus exact
dedup keys on: two spellings of the same resource must map to one
canonical string BEFORE any hash-based dedup sees them, or the corpus
keeps both copies (and a crawl frontier re-fetches forever).

Rules implemented (the RFC 3986 syntax-based normalizations plus the
conventional crawl ones), each hash-load-bearing in the gate:

1. scheme and host lowercased (path/query case preserved);
2. fragment dropped;
3. default port elided (``:80`` for http, ``:443`` for https; other
   ports kept);
4. path dot-segments resolved (``.`` dropped, ``..`` pops, empty
   segments collapsed; ``..`` at root is a no-op; result always
   starts with ``/``, bare root is ``/``);
5. query parameters sorted bytewise (empty parameters dropped; an
   empty query loses its ``?``);
6. percent-encoding normalized (RFC 3986 6.2.2.1-2): unreserved
   octets decoded (``%7E`` -> ``~``), everything else uppercased
   (``%2f`` -> ``%2F``), malformed escapes passed through verbatim.
   Runs before the structural rules — decoding an unreserved octet
   can never create a delimiter.

Everything is built-in string/array expressions — a NARROW map inside
whole-stage codegen (plan-pinned zero-shuffle): at 100 TB this runs
at scan speed next to the ingest that produced the URLs.  The
dot-segment resolution is an in-row ``aggregate`` fold, the same
shape as the BPE merge fold (`bpe.merge_pair_expr`).

The DuckDB twin re-implements every rule independently (scalar
``list_reduce`` fold with a sentinel accumulator for the path), so
the gate cross-checks two implementations of the spec, not one
implementation against itself.  Regexes use the repo's portable
subset (explicit classes, no shorthand escapes).

(No analog in the reference, ref:gemm_map_reduce.py:1; web-corpus
ingest tier.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

#: host[:port] stops at the first of / ? #
_RE_SCHEME = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_RE_HOSTPORT = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_RE_PATH = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = "[?]([^#]*)"

#: in-row dot-segment resolution: fold the split path, '' and '.'
#: skipped, '..' pops (no-op at root), else append
_PATH_FOLD = (
    "aggregate(split({p}, '/'), CAST(array() AS ARRAY<STRING>),"
    " (acc, s) -> CASE"
    " WHEN s = '' OR s = '.' THEN acc"
    " WHEN s = '..' THEN slice(acc, 1, greatest(size(acc) - 1, 0))"
    " ELSE concat(acc, array(s)) END)"
)

#: RFC 3986 6.2.2.1-2 percent-encoding normalization, Spark dialect:
#: split on '%'; every later piece starts with the two hex digits of
#: one escape — decode it when the octet is UNRESERVED
#: (ALPHA / DIGIT / - . _ ~; decoding those can never create a
#: delimiter), uppercase the hex otherwise, and pass malformed
#: escapes (non-hex, or a trailing lone '%') through verbatim
_PCT_DECODED = "char(cast(conv(substring(p, 1, 2), 16, 10) as int))"
_PCT_NORM = (
    "concat(element_at(split({s}, '%'), 1),"
    " array_join(transform("
    "   slice(split({s}, '%'), 2,"
    "         greatest(size(split({s}, '%')) - 1, 0)),"
    "   p -> CASE"
    "   WHEN NOT p rlike '^[0-9A-Fa-f][0-9A-Fa-f]'"
    "     THEN concat('%', p)"
    f"  WHEN {_PCT_DECODED} rlike '^[A-Za-z0-9._~-]$'"
    f"    THEN concat({_PCT_DECODED}, substring(p, 3))"
    "   ELSE concat('%', upper(substring(p, 1, 2)), substring(p, 3))"
    "   END), ''))"
)


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` as a single JVM-side expression."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _RE_SCHEME, 1))
    hostport = F.regexp_extract(u, _RE_HOSTPORT, 1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    portpart = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    # the folds are expr strings, so they reference the column by NAME
    # — callers go through canonicalize_urls, which guarantees ``url``.
    # Percent-normalization runs FIRST (decoding unreserved octets can
    # never create a '/' or '&' delimiter, so segment/parameter splits
    # are unaffected), then the dot-segment fold.
    norm_path = _PCT_NORM.format(
        s=f"regexp_extract(url, '{_RE_PATH}', 1)"
    )
    segs = F.expr(_PATH_FOLD.format(p=norm_path))
    path = F.concat(F.lit("/"), F.array_join(segs, "/"))
    raw_q = F.expr(
        _PCT_NORM.format(s=f"regexp_extract(url, '{_RE_QUERY}', 1)")
    )
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(raw_q, "&"), lambda x: x != "")),
        "&",
    )
    qpart = F.when(
        sorted_q != "", F.concat(F.lit("?"), sorted_q)
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)


def canonicalize_urls(df: DataFrame, col: str = "url") -> DataFrame:
    """Add ``canon`` next to ``col`` (renamed to ``url`` internally —
    the fold expression references the column by name)."""
    d = df.withColumnRenamed(col, "url") if col != "url" else df
    return d.withColumn("canon", canonical_url("url"))


# ---------------------------------------------------- gated corpus query

def _messy_url_spark() -> Column:
    """Deterministic messy URL per doc_id — every canonicalization
    rule exercised somewhere in the corpus: mixed-case scheme/host,
    default AND non-default ports, ``.``/``..``/empty path segments,
    unsorted query parameters, fragments."""
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = F.concat(
        F.lit("WWW.Example"), (d % 7).cast("string"), F.lit(".COM")
    )
    port = (
        F.when(d % 2 == 0, F.lit(":80"))      # http default -> elide
        .otherwise(
            F.when(d % 3 == 0, F.lit(":8080"))  # kept
            .otherwise(
                F.when(d % 5 == 0, F.lit(":443"))  # https default -> elide
                .otherwise(F.lit(""))
            )
        )
    )
    path = F.concat(
        F.lit("/a/./b"),
        F.when(d % 4 == 0, F.lit("/../c"))
        .otherwise(F.when(d % 4 == 1, F.lit("//d"))
                   .otherwise(F.when(d % 4 == 2, F.lit("/e/"))
                              .otherwise(F.lit("")))),
        # percent-escape variants: decodable lowercase hex, a reserved
        # octet that must only uppercase, and a malformed escape
        F.when(d % 5 == 1, F.lit("/%7euser"))
        .otherwise(F.when(d % 5 == 2, F.lit("/%2fraw"))
                   .otherwise(F.when(d % 5 == 3, F.lit("/x%zz"))
                              .otherwise(F.lit("")))),
    )
    query = (
        F.when(d % 3 == 0, F.lit("?b=%32&a=1"))
        .otherwise(F.when(d % 3 == 1, F.lit("?z=9&&m=1"))
                   .otherwise(F.lit("")))
    )
    frag = F.when(d % 2 == 1, F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: synthesize the messy URL corpus from doc_id, canonicalize
    with :func:`canonical_url` -> ``(doc_id, url, canon)``.  The twin
    re-synthesizes the SAME urls (same formula) and canonicalizes with
    an independent DuckDB implementation, so every rule — case, port
    elision, dot-segment fold, query sort, fragment drop — is
    cross-checked between two codebases."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    messy = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _messy_url_spark().alias("url"),
    )
    return canonicalize_urls(messy).select("doc_id", "url", "canon")


def _pct_norm_duck(s: str) -> str:
    """DuckDB dialect of :data:`_PCT_NORM` (chr/CAST-0x instead of
    char/conv; empty-list array_to_string is NULL — coalesced)."""
    dec = "chr(CAST('0x' || substring(p, 1, 2) AS INT))"
    return (
        f"string_split({s}, '%')[1] || coalesce(array_to_string("
        f" list_transform(string_split({s}, '%')[2:],"
        "   p -> CASE"
        "   WHEN NOT regexp_matches(p, '^[0-9A-Fa-f][0-9A-Fa-f]')"
        "     THEN '%' || p"
        f"  WHEN regexp_matches({dec}, '^[A-Za-z0-9._~-]$')"
        f"    THEN {dec} || substring(p, 3)"
        "   ELSE '%' || upper(substring(p, 1, 2)) || substring(p, 3)"
        "   END), ''), '')"
    )


URL_CANONICAL_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END
         || '://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
         || CASE WHEN doc_id % 2 = 0 THEN ':80'
                 WHEN doc_id % 3 = 0 THEN ':8080'
                 WHEN doc_id % 5 = 0 THEN ':443'
                 ELSE '' END
         || '/a/./b'
         || CASE WHEN doc_id % 4 = 0 THEN '/../c'
                 WHEN doc_id % 4 = 1 THEN '//d'
                 WHEN doc_id % 4 = 2 THEN '/e/'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 1 THEN '/%7euser'
                 WHEN doc_id % 5 = 2 THEN '/%2fraw'
                 WHEN doc_id % 5 = 3 THEN '/x%zz'
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN '?b=%32&a=1'
                 WHEN doc_id % 3 = 1 THEN '?z=9&&m=1'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 1 THEN '#sec' ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url,
           '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
         __PCT_PATH__ AS raw_path,
         __PCT_QUERY__ AS raw_q
  FROM m
),
split_hp AS (
  SELECT *,
         lower(CASE WHEN strpos(hostport, ':') > 0
               THEN string_split(hostport, ':')[1]
               ELSE hostport END) AS host,
         CASE WHEN strpos(hostport, ':') > 0
              THEN string_split(hostport, ':')[2] ELSE '' END AS port
  FROM parts
),
folded AS (
  SELECT *,
         list_reduce(
           list_prepend(chr(2), string_split(raw_path, '/')),
           (acc, s) -> CASE
             WHEN s = '' OR s = '.' THEN acc
             WHEN s = '..' THEN
               CASE WHEN acc = chr(2) THEN acc
                    ELSE regexp_replace(acc, '/[^/]*$', '') END
             ELSE acc || '/' || s END) AS pathacc,
         -- array_to_string of an EMPTY list is NULL in DuckDB
         coalesce(array_to_string(
           list_sort(list_filter(string_split(raw_q, '&'),
                                 x -> x <> '')), '&'), '') AS sorted_q
  FROM split_hp
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, url,
       scheme || '://' || host
       || CASE WHEN port = '' THEN ''
               WHEN scheme = 'http' AND port = '80' THEN ''
               WHEN scheme = 'https' AND port = '443' THEN ''
               ELSE ':' || port END
       || CASE WHEN pathacc = chr(2) THEN '/'
               ELSE substring(pathacc, 2) END
       || CASE WHEN sorted_q = '' THEN '' ELSE '?' || sorted_q END
       AS canon
FROM folded
"""

# percent-normalize path and query in the oracle too; DuckDB
# regexp_extract is NULL on no match (Spark: ''), so coalesce first
URL_CANONICAL_SQL = URL_CANONICAL_SQL.replace(
    "__PCT_PATH__",
    _pct_norm_duck(
        "coalesce(regexp_extract(url,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')"
    ),
).replace(
    "__PCT_QUERY__",
    _pct_norm_duck(
        "coalesce(regexp_extract(url, '[?]([^#]*)', 1), '')"
    ),
)


# ------------------------------------- web-ingest dedup composition gate

def _messy_web_url() -> Column:
    """Deterministic messy crawl URL from a WARC record's recovered
    ``(doc_id, source)`` — every spelling variant canonicalizes AWAY,
    so the canonical key is ``http://www.{source}.com/p/x{doc_id % 7}
    /u~?a=1&b=2`` and ~7 docs per (source, path-slot) collide: the
    dedup stage has real work at every sf tier."""
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    host_lc = F.concat(F.lit("www."), F.col("source"), F.lit(".com"))
    host = F.when(d % 3 == 0, F.upper(host_lc)).otherwise(host_lc)
    port = F.when(d % 4 == 0, F.lit(":80")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/p"),
        F.when(d % 3 == 0, F.lit("/./x"))
        .otherwise(F.when(d % 3 == 1, F.lit("//x"))
                   .otherwise(F.lit("/q/../x"))),
        (d % 7).cast("string"),
        F.when(d % 2 == 0, F.lit("/u%7E")).otherwise(F.lit("/u~")),
    )
    query = F.when(
        d % 2 == 0, F.lit("?b=2&a=1")
    ).otherwise(F.lit("?a=1&b=2"))
    frag = F.when(d % 5 == 0, F.lit("#top")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def web_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed web-ingest dedup chain (VERDICT r11 next #5) —
    WARC walk -> messy crawl URL -> :func:`canonical_url` -> exact
    dedup keeping the SMALLEST doc_id per canonical URL -> per-host
    counts, as ONE composed plan -> ``(host, n_records, n_unique,
    kept_doc_sum, kept_sig)``.

    Every stage boundary is hash-load-bearing: records come from the
    REAL ``.warc.gz`` member walk (`warc.warc_ingest` — gzip member
    split, WARC parse, HTTP parse, md5 of the recovered body), the
    URL is canonicalized BEFORE the dedup key is grouped on (running
    the rules on the wrong column, or after grouping, collapses
    different groups), keep-smallest is pinned per group by
    ``kept_doc_sum`` AND by ``kept_sig`` (md5 over the sorted
    ``canon:doc:md5`` membership strings — a wrong keeper or a lost
    group cannot hash-match).

    Scale shape: the member walk is a narrow Arrow map over shards;
    canonicalization is zero-shuffle codegen; the chain shuffles
    exactly twice — once on the canonical key (the dedup, unavoidable
    and key-partitioned) and once on the ~|sources| hosts (tiny,
    post-reduction).  The DuckDB twin recomputes the whole chain
    independently from ``documents``."""
    from gemmsql.pipeline.warc import warc_ingest

    recs = warc_ingest(spark, sf_dir).select(
        "doc_id", "source", "text_md5"
    )
    messy = recs.withColumn("url", _messy_web_url())
    canon = canonicalize_urls(messy)
    keyed = canon.select(
        "doc_id", "text_md5", "canon",
        F.regexp_extract("canon", "^[a-z]+://([^/:?#]*)", 1).alias("host"),
    )
    per_canon = keyed.groupBy("host", "canon").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.min("doc_id").alias("keep_doc"),
        F.min_by("text_md5", "doc_id").alias("keep_md5"),
    )
    member = F.concat_ws(
        ":", "canon", F.col("keep_doc").cast("string"), "keep_md5"
    )
    return per_canon.groupBy("host").agg(
        F.sum("n_raw").cast("long").alias("n_records"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum("keep_doc").cast("long").alias("kept_doc_sum"),
        F.md5(
            F.concat_ws(",", F.array_sort(F.collect_list(member)))
        ).alias("kept_sig"),
    )


#: the twin rebuilds the chain from ``documents`` alone: the walk's
#: recovered md5 is md5(text) (ASCII corpus, `warc.py` twin), the
#: messy formula is re-spelled, and canonicalization reuses the
#: independent DuckDB rule implementations (pct-norm + path fold)
WEB_DEDUP_PIPELINE_SQL = """
WITH m AS (
  SELECT doc_id, md5(text) AS text_md5,
         CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END
         || '://'
         || CASE WHEN doc_id % 3 = 0
                 THEN upper('www.' || source || '.com')
                 ELSE 'www.' || source || '.com' END
         || CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END
         || '/p'
         || CASE WHEN doc_id % 3 = 0 THEN '/./x'
                 WHEN doc_id % 3 = 1 THEN '//x'
                 ELSE '/q/../x' END
         || CAST(doc_id % 7 AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0 THEN '/u%7E' ELSE '/u~' END
         || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1'
                 ELSE '?a=1&b=2' END
         || CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, text_md5,
         lower(regexp_extract(url,
           '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
         __PCT_PATH__ AS raw_path,
         __PCT_QUERY__ AS raw_q
  FROM m
),
split_hp AS (
  SELECT *,
         lower(CASE WHEN strpos(hostport, ':') > 0
               THEN string_split(hostport, ':')[1]
               ELSE hostport END) AS host,
         CASE WHEN strpos(hostport, ':') > 0
              THEN string_split(hostport, ':')[2] ELSE '' END AS port
  FROM parts
),
folded AS (
  SELECT *,
         list_reduce(
           list_prepend(chr(2), string_split(raw_path, '/')),
           (acc, s) -> CASE
             WHEN s = '' OR s = '.' THEN acc
             WHEN s = '..' THEN
               CASE WHEN acc = chr(2) THEN acc
                    ELSE regexp_replace(acc, '/[^/]*$', '') END
             ELSE acc || '/' || s END) AS pathacc,
         coalesce(array_to_string(
           list_sort(list_filter(string_split(raw_q, '&'),
                                 x -> x <> '')), '&'), '') AS sorted_q
  FROM split_hp
),
canonical AS (
  SELECT doc_id, text_md5, host,
         scheme || '://' || host
         || CASE WHEN port = '' THEN ''
                 WHEN scheme = 'http' AND port = '80' THEN ''
                 WHEN scheme = 'https' AND port = '443' THEN ''
                 ELSE ':' || port END
         || CASE WHEN pathacc = chr(2) THEN '/'
                 ELSE substring(pathacc, 2) END
         || CASE WHEN sorted_q = '' THEN ''
                 ELSE '?' || sorted_q END AS canon
  FROM folded
),
per_canon AS (
  SELECT host, canon,
         COUNT(*) AS n_raw,
         MIN(doc_id) AS keep_doc,
         arg_min(text_md5, doc_id) AS keep_md5
  FROM canonical
  GROUP BY host, canon
)
SELECT host,
       CAST(SUM(n_raw) AS BIGINT) AS n_records,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(keep_doc) AS BIGINT) AS kept_doc_sum,
       md5(string_agg(
         canon || ':' || CAST(keep_doc AS VARCHAR) || ':' || keep_md5,
         ',' ORDER BY canon)) AS kept_sig
FROM per_canon
GROUP BY host
"""

WEB_DEDUP_PIPELINE_SQL = WEB_DEDUP_PIPELINE_SQL.replace(
    "__PCT_PATH__",
    _pct_norm_duck(
        "coalesce(regexp_extract(url,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')"
    ),
).replace(
    "__PCT_QUERY__",
    _pct_norm_duck(
        "coalesce(regexp_extract(url, '[?]([^#]*)', 1), '')"
    ),
)
