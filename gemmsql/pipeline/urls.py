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
   empty query loses its ``?``).

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
    # the fold is an expr string, so it references the column by NAME —
    # callers go through canonicalize_urls, which guarantees ``url``
    segs = F.expr(
        _PATH_FOLD.format(p=f"regexp_extract(url, '{_RE_PATH}', 1)")
    )
    path = F.concat(F.lit("/"), F.array_join(segs, "/"))
    raw_q = F.regexp_extract(u, _RE_QUERY, 1)
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
    )
    query = (
        F.when(d % 3 == 0, F.lit("?b=2&a=1"))
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
         || CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1'
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
         regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
         -- DuckDB regexp_extract is NULL on no match (Spark: '')
         coalesce(regexp_extract(url, '[?]([^#]*)', 1), '') AS raw_q
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
