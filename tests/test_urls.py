"""URL canonicalization rules (gemmsql/pipeline/urls.py) on edge
cases the synthesized gate corpus cannot cover."""

from __future__ import annotations

import pytest

from gemmsql.pipeline.urls import canonicalize_urls


@pytest.mark.parametrize("url,want", [
    # dot-dot at root is a no-op; bare root stays '/'
    ("http://A.com/../..", "http://a.com/"),
    ("HTTPS://h.COM", "https://h.com/"),
    # non-default port kept; default for the OTHER scheme kept too
    ("http://h.com:443/x", "http://h.com:443/x"),
    ("https://h.com:80/x", "https://h.com:80/x"),
    # deep pop chain + case preserved in path/query
    ("http://H.com/A/B/../../C/./D?b=1&A=2#f", "http://h.com/C/D?A=2&b=1"),
    # duplicate slashes collapse; trailing slash drops
    ("http://h.com//x///y//", "http://h.com/x/y"),
    # empty query loses its '?'
    ("http://h.com/x?", "http://h.com/x"),
])
def test_canonical_rules(spark, url, want):
    df = spark.createDataFrame([(url,)], "url string")
    got = canonicalize_urls(df).collect()[0]["canon"]
    assert got == want, url
