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
