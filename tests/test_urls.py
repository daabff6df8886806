"""URL kernel tests.

Fixture rows ported from the reference specification corpus:
- relative/absolute/scheme cases: Bot.Specifications/Description/
  ResourceExtractionDescription.cs:24-56
- default-port normalization: StartUriDescription.cs:38
- fragment stripping: Resource.cs:63-66
- malformed −101 / unsupported scheme −102: Resource.cs:47-58,
  StatusCode.cs:14-15

Plus the keystone property: the Python implementation (oracle path) and the
Spark column-expression implementation agree on every absolute URL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helix_spark.functions.urls import (
    STATUS_MALFORMED_URI,
    STATUS_URI_SCHEME_NOT_SUPPORTED,
    canonical_status_col,
    canonical_url_col,
    canonicalize_url_py,
    resolve_url_py,
    url_host_py,
    with_url_columns,
)

PARENT = "http://www.helix.com/base/page.html"

# (raw, parent, expected_canonical, expected_status)
CANON_CASES = [
    # ResourceExtractionDescription.cs:28-48 — the 6-anchor fixture
    ("//www.sanity.com", PARENT, "http://www.sanity.com/", 0),
    ("http://www.sanity.com/", PARENT, "http://www.sanity.com/", 0),
    ("ftp://www.sanity.com", PARENT, "ftp://www.sanity.com/", STATUS_URI_SCHEME_NOT_SUPPORTED),
    ("/with-leading-slash", PARENT, "http://www.helix.com/with-leading-slash", 0),
    ("without-leading-slash", PARENT, "http://www.helix.com/base/without-leading-slash", 0),
    ("http://192.168.1.2", PARENT, "http://192.168.1.2/", 0),
    # fragment stripping (Resource.cs:63-66)
    ("http://a.com/x#frag", None, "http://a.com/x", 0),
    ("http://a.com/#", None, "http://a.com/", 0),
    ("#same-page", PARENT, "http://www.helix.com/base/page.html", 0),
    # default ports (StartUriDescription.cs:38)
    ("http://192.168.1.2:80", None, "http://192.168.1.2/", 0),
    ("https://a.com:443/x", None, "https://a.com/x", 0),
    ("http://a.com:8080/x", None, "http://a.com:8080/x", 0),
    # scheme/host lowercasing
    ("HTTP://WWW.Helix.COM/Path", None, "http://www.helix.com/Path", 0),
    # query-param sorting (north-rule extension)
    ("http://a.com/p?b=2&a=1", None, "http://a.com/p?a=1&b=2", 0),
    ("http://a.com/p?z=1", None, "http://a.com/p?z=1", 0),
    # dot segments
    ("http://a.com/x/../y", None, "http://a.com/y", 0),
    ("http://a.com/x/./y", None, "http://a.com/x/y", 0),
    ("../up", "http://a.com/d1/d2/page", "http://a.com/d1/up", 0),
    # unsupported schemes (Resource.cs:51-58)
    ("mailto:x@y.com", None, "mailto:x@y.com", STATUS_URI_SCHEME_NOT_SUPPORTED),
    ("tel:+123", None, "tel:+123", STATUS_URI_SCHEME_NOT_SUPPORTED),
    # malformed (Resource.cs:47-49)
    ("relative-no-parent", None, None, STATUS_MALFORMED_URI),
    ("", PARENT, None, STATUS_MALFORMED_URI),
    ("   ", PARENT, None, STATUS_MALFORMED_URI),
    # userinfo preserved
    ("http://u:p@a.com/x", None, "http://u:p@a.com/x", 0),
    # empty path → '/'
    ("http://a.com", None, "http://a.com/", 0),
    ("http://a.com?q=1", None, "http://a.com/?q=1", 0),
]


@pytest.mark.parametrize("raw,parent,expected,status", CANON_CASES)
def test_canonicalize_py(raw, parent, expected, status):
    got, got_status = canonicalize_url_py(raw, parent)
    assert got == expected, f"{raw!r} → {got!r}, want {expected!r}"
    assert got_status == status


def test_resolve_query_relative():
    assert resolve_url_py("?x=1", PARENT) == "http://www.helix.com/base/page.html?x=1"


def test_host_extraction():
    assert url_host_py("http://a.com:8080/x") == "a.com:8080"
    assert url_host_py("http://u@a.com/x") == "a.com"


ABSOLUTE_CASES = [c for c in CANON_CASES if c[1] is None and c[0].strip()]


def test_column_expr_matches_python(spark):
    """Keystone: Spark column-expr canonicalization == Python implementation
    on every absolute hierarchical URL."""
    urls = [c[0] for c in ABSOLUTE_CASES if "://" in c[0]]
    urls += [
        "http://Host.COM:80/a/b/../c/./d?z=9&a=1&m=3#frag",
        "https://x.y.z:8443/only",
        "http://a.com/a/b/c/../../x",
        "http://[::1]:80/v6",
        "http://a.com/trailing/",
        "ftp://f.com:21/file",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url",
        canonical_url_col(F.col("url")).alias("canon"),
        canonical_status_col(F.col("url")).alias("status"),
    ).collect()
    for r in rows:
        py_canon, py_status = canonicalize_url_py(r["url"], None)
        assert r["canon"] == py_canon, f"{r['url']!r}: spark={r['canon']!r} py={py_canon!r}"
        assert r["status"] == py_status, f"{r['url']!r}: spark={r['status']} py={py_status}"


def test_with_url_columns_hash_stable(spark):
    df = spark.createDataFrame(
        [("http://A.com/x#f",), ("http://a.com:80/x",)], ["url"]
    )
    out = with_url_columns(df).select("canonical_url", "url_hash", "host").collect()
    # both rows canonicalize identically → identical hash
    assert out[0]["canonical_url"] == out[1]["canonical_url"] == "http://a.com/x"
    assert out[0]["url_hash"] == out[1]["url_hash"]
    assert out[0]["host"] == "a.com"


def test_two_step_canonicalization_matches_one_step(spark):
    """with_canonical_url_2step (the multi-projection evaluation form the
    crawl's admit path uses) must be BIT-IDENTICAL to canonical_url_col on
    every fixture URL plus generated tricky cases, for both sort_query
    settings — same formulas, different materialization only."""
    from helix_spark.functions.urls import with_canonical_url_2step

    urls = [c[0] for c in CANON_CASES if c[0].strip()]
    urls += [
        "http://Host.COM:80/a/b/../c/./d?z=9&a=1&m=3#frag",
        "https://x.y.z:8443/only",
        "http://a.com/a/b/c/../../x",
        "http://[::1]:80/v6",
        "http://[2001:db8::1]:8080/v6?b=2&a=1",
        "http://user:pw@a.com:80/p?x=1",
        "http://u@v@w.com/amb",
        "ftp://f.com:21/file",
        "mailto:someone@example.com",
        "HTTP://UPPER.com",
        "http://a.com",
        "http://a.com?q=1",
        "http://a.com/p/../..",
        "http://a.com//double//slash",
        "   http://pad.com/x  ",
        "notaurl",
        "http:///nohost",
        "wss://sock.example:443/chat?b&a",
    ]
    for sq in (True, False):
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        one = df.select(
            "url", canonical_url_col(F.col("url"), sort_query=sq).alias("c1")
        )
        two = with_canonical_url_2step(
            df, F.col("url"), out="c2", sort_query=sq
        ).select("url", "c2")
        got = {
            r["url"]: (r["c1"], r2["c2"])
            for r, r2 in zip(
                sorted(one.collect(), key=lambda r: r["url"]),
                sorted(two.collect(), key=lambda r: r["url"]),
            )
        }
        for u, (c1, c2) in got.items():
            assert c1 == c2, f"sort_query={sq} {u!r}: one-step={c1!r} two-step={c2!r}"
