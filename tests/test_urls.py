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
    # percent-encoding: unreserved decodes, reserved uppercases,
    # malformed passes through, and decode runs BEFORE segment fold
    ("http://h.com/%7euser/%2fraw", "http://h.com/~user/%2Fraw"),
    ("http://h.com/a%zz/b?q=%41%2b", "http://h.com/a%zz/b?q=A%2B"),
    # %2e decodes to '.' (unreserved), so '/%2e%2e/x' becomes '/../x'
    # BEFORE the fold — which pops at root, leaving '/x'
    ("http://h.com/%2e%2e/x", "http://h.com/x"),
])
def test_canonical_rules(spark, url, want):
    df = spark.createDataFrame([(url,)], "url string")
    got = canonicalize_urls(df).collect()[0]["canon"]
    assert got == want, url
