"""Extraction + resolution: reference fixture corpus and python/vectorized parity.

Fixtures ported row-for-row from /root/reference/Bot.Specifications/
Description/ResourceExtractionDescription.cs:24-123.
"""

from __future__ import annotations

import pandas as pd
import pytest

from helix_spark.functions.urls import canonicalize_url_py, resolve_url_py
from helix_spark.operators.extract import (
    canonicalize_urls_vec,
    extract_hrefs_py,
    extract_links,
    resolve_urls_vec,
)

SIX_ANCHOR_HTML = (
    "<html><body>"
    '<a href="//www.sanity.com">1</a>'
    '<a href="http://www.sanity.com/">2</a>'
    '<a href="ftp://www.sanity.com">3</a>'
    '<a href="/with-leading-slash">4</a>'
    '<a href="without-leading-slash">5</a>'
    '<a href="http://192.168.1.2">6</a>'
    "</body></html>"
)
BASE = "http://www.helix.com"


def test_six_anchor_fixture():
    """ResourceExtractionDescription.cs:28-48: all 6 extracted in order."""
    hrefs = extract_hrefs_py(SIX_ANCHOR_HTML)
    assert hrefs == [
        "//www.sanity.com",
        "http://www.sanity.com/",
        "ftp://www.sanity.com",
        "/with-leading-slash",
        "without-leading-slash",
        "http://192.168.1.2",
    ]
    resolved = [resolve_url_py(h, BASE) for h in hrefs]
    assert resolved == [
        "http://www.sanity.com",
        "http://www.sanity.com/",
        "ftp://www.sanity.com",
        "http://www.helix.com/with-leading-slash",
        "http://www.helix.com/without-leading-slash",
        "http://192.168.1.2",
    ]


@pytest.mark.parametrize(
    "html",
    [
        "<html><body><a>no href</a></body></html>",  # lines 92-106
        '<html><body><a href="">empty</a></body></html>',  # 58-73
        '<html><body><a href="   ">ws</a></body></html>',
        '<html><body><a href="javascript:test()">js</a></body></html>',  # 75-90
        '<html><body><a href="JavaScript:Test()">js2</a></body></html>',
        "<html><body></body></html>",  # 108-121
        "",
    ],
)
def test_skip_rules(html):
    assert extract_hrefs_py(html) == []


def test_resolve_vec_matches_py():
    hrefs = [
        "//www.sanity.com", "http://abs.com/x", "ftp://f.com", "/lead", "bare",
        "#frag", "?q=1", "../up", "./same", "mailto:a@b.c", "", "   ",
        "sub/dir/page.html",
    ]
    parents = [BASE + "/d1/d2/page.html"] * len(hrefs)
    got = resolve_urls_vec(pd.Series(hrefs), pd.Series(parents))
    want = [resolve_url_py(h, parents[0]) for h in hrefs]
    assert list(got.where(got.notna(), None)) == want


def test_canonicalize_vec_matches_py():
    urls = [
        "http://A.com:80/x#f", "https://b.com:443/", "http://c.com/a/../b?z=1&a=2",
        "HTTP://HOST.com/P", "http://u:p@h.com:8080/q?b&a", "http://h.com",
        "notaurl", "mailto:x@y.z", "http://[::1]:80/v6",
    ]
    got = canonicalize_urls_vec(pd.Series(urls))
    for u, g in zip(urls, got):
        want, _ = canonicalize_url_py(u, None)
        if want is not None and "://" not in want:
            want = None  # vec handles hierarchical urls only
        assert (None if pd.isna(g) else g) == want, f"{u!r}: vec={g!r} py={want!r}"


def test_extract_links_spark(spark):
    df = spark.createDataFrame(
        [(BASE + "/page", SIX_ANCHOR_HTML), (BASE + "/empty", "<html></html>")],
        ["url", "html"],
    )
    rows = extract_links(df).orderBy("seq").collect()
    assert len(rows) == 6
    assert [r["seq"] for r in rows] == list(range(6))
    assert rows[0]["resolved_url"] == "http://www.sanity.com"
    assert rows[4]["resolved_url"] == "http://www.helix.com/without-leading-slash"


def test_extract_links_jvm_equals_pandas_and_py(spark):
    """The three extraction/resolution implementations (JVM column exprs —
    the hot path; pandas UDF; plain python — the oracle) must agree on the
    fixture corpus, skip rules included, and on a slice of the synthetic
    universe."""
    from helix_spark.operators.extract import extract_links_jvm
    from helix_spark.sources import synthetic

    skip_html = (
        '<html><body><a href="">e</a><a href="   ">w</a>'
        '<a href="javascript:x()">j</a><a href="JavaScript:Y()">J</a>'
        "<a>none</a><a href='/single-quoted'>s</a></body></html>"
    )
    pages = [(BASE + "/page", SIX_ANCHOR_HTML), (BASE + "/empty", "<html></html>"),
             (BASE + "/d1/d2/skips", skip_html)]
    pages += [
        (r["url"], r["html"])
        for r in synthetic.gen_pages_py(40, 4).to_dict("records")
        if r["html"]
    ]
    df = spark.createDataFrame(pages, ["url", "html"])

    def key(rows):
        return sorted((r["url"], r["seq"], r["href"], r["resolved_url"]) for r in rows)

    jvm = key(extract_links_jvm(df).collect())
    pdu = key(extract_links(df).collect())
    assert jvm == pdu
    want = sorted(
        (u, i, h, resolve_url_py(h, u))
        for u, html in pages
        for i, h in enumerate(extract_hrefs_py(html))
    )
    assert jvm == want
