"""Link extraction — the renderer's flatMap, as a vectorized pandas UDF.

Parity contract (/root/reference/Bot/Business/ResourceExtractor.cs:14-40):
- anchors `<a href=...>` in DOCUMENT ORDER (XPath //a[@href])
- skip anchors with no href, empty/whitespace href (line 33)
- skip `javascript:` hrefs case-insensitively (line 34)
- every surviving href becomes a resource with the page as parent

Everything is vectorized pandas string ops (str.extractall / masked str
concat) over Arrow batches — no per-row Python. The relative-URL resolution
twin lives in functions/urls.resolve_url_py; tests assert both agree.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from helix_spark.functions.urls import _ABS_RE, _DOT_ITERS, _SCHEME_RE

HREF_RE = r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)')"""


def extract_hrefs_py(html: str) -> list[str]:
    """Python twin used by the serial oracle: document-order hrefs with the
    reference's skip rules applied."""
    out = []
    for m in re.finditer(HREF_RE, html or "", flags=re.IGNORECASE | re.DOTALL):
        href = m.group(1) if m.group(1) is not None else m.group(2)
        if href is None or href.strip() == "":
            continue
        if href.strip().lower().startswith("javascript:"):
            continue
        out.append(href)
    return out


def resolve_urls_vec(href: pd.Series, parent: pd.Series) -> pd.Series:
    """Vectorized resolve-against-parent (twin of urls.resolve_url_py)."""
    href = href.fillna("").str.strip()
    parent = parent.fillna("")
    comp = parent.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)")
    scheme, authority, ppath = comp[0].fillna(""), comp[1].fillna(""), comp[2].fillna("")
    origin = scheme + "://" + authority
    parent_ok = scheme != ""

    is_abs = href.str.match(_SCHEME_RE)
    is_proto_rel = href.str.startswith("//")
    is_root_rel = href.str.startswith("/") & ~is_proto_rel
    is_frag = href.str.startswith("#")
    is_query = href.str.startswith("?")
    nofrag = parent.str.split("#").str[0]
    noquery = nofrag.str.split("?").str[0]
    pdir = ppath.str.replace(r"[^/]*$", "", regex=True)
    pdir = pdir.where(pdir.str.startswith("/"), "/" + pdir)

    out = pd.Series([None] * len(href), index=href.index, dtype=object)
    out[is_abs] = href[is_abs]
    m = is_proto_rel & parent_ok & ~is_abs
    out[m] = scheme[m] + ":" + href[m]
    m = is_root_rel & parent_ok
    out[m] = origin[m] + href[m]
    m = is_frag & parent_ok
    out[m] = nofrag[m] + href[m]
    m = is_query & parent_ok
    out[m] = noquery[m] + href[m]
    bare = ~(is_abs | is_proto_rel | is_root_rel | is_frag | is_query) & (href != "") & parent_ok
    out[bare] = origin[bare] + pdir[bare] + href[bare]
    return out


def canonicalize_urls_vec(url: pd.Series, sort_query: bool = True) -> pd.Series:
    """Vectorized canonicalization of ABSOLUTE urls (twin of
    urls.canonicalize_url_py steps 2-7; pandas str ops only)."""
    u = url.fillna("").str.strip().str.split("#").str[0]
    comp = u.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://((?:[^/?#@]*@)?)([^/?#]*)([^?]*)(?:\?(.*))?$")
    scheme = comp[0].str.lower()
    userinfo = comp[1].fillna("")
    hostport = comp[2].fillna("")
    path = comp[3].fillna("")
    query = comp[4]

    is_v6 = hostport.str.startswith("[")
    host = hostport.str.replace(r":(\d*)$", "", regex=True).str.lower()
    host = host.where(~is_v6, hostport.str.extract(r"^(\[[^\]]*\])")[0].fillna("").str.lower())
    port = hostport.str.extract(r":(\d+)$")[0].fillna("")
    port = port.where(~is_v6, hostport.str.extract(r"\]:(\d+)$")[0].fillna(""))
    default_port = scheme.map({"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}).fillna("")
    port_part = (":" + port).where((port != "") & (port != default_port), "")

    path = path.where(path != "", "/")
    path = path.where(path.str.startswith("/"), "/" + path)
    for _ in range(_DOT_ITERS):
        path = path.str.replace(r"/\./", "/", regex=True).str.replace(r"/\.$", "/", regex=True)
    for _ in range(_DOT_ITERS):
        path = (
            path.str.replace(r"/(?!\.\./)[^/]+/\.\./", "/", regex=True)
            .str.replace(r"/(?!\.\./)[^/]+/\.\.$", "/", regex=True)
            .str.replace(r"^/\.\.(/|$)", "/", regex=True)
        )
    if sort_query:
        query = query.map(lambda q: "&".join(sorted(q.split("&"))) if isinstance(q, str) else q)
    qpart = ("?" + query.fillna("")).where(query.notna() & (query != ""), "")
    out = scheme + "://" + userinfo + host + port_part + path + qpart
    bad = scheme.isna() | (host.fillna("") == "") | ~u.str.match(_ABS_RE).fillna(False)
    return out.mask(bad, None)


_EXTRACT_SCHEMA = StructType(
    [
        StructField("href", StringType()),
        StructField("resolved_url", StringType()),
        StructField("seq", IntegerType()),
    ]
)


# single-capture-group variant for the JVM path: group 1 keeps the quotes
# (regexp_extract_all takes ONE group index); stripped with substring after
_HREF_RE_JVM = r"""(?is)<a\b[^>]*?\bhref\s*=\s*("[^"]*"|'[^']*')"""


def extract_links_jvm(pages_df: DataFrame, url_col: str = "url",
                      html_col: str = "html", resolver=None) -> DataFrame:
    """JVM-only link extraction: regexp_extract_all + posexplode + the
    column-expression resolver (functions/urls.resolve_url_col). Same rows
    and document order as the pandas ``extract_links`` (pinned against it
    and against the oracle's extract_hrefs_py in tests/test_extract.py),
    but stays inside whole-stage codegen — no Python workers, no Arrow
    transfer of page HTML. This is the crawl engine's hot path; the pandas
    variant remains as the cross-check and the UDF pattern exemplar.

    ``resolver``: a prebuilt resolve_url_col(F.col("href"), F.col(url_col))
    Column — constructing it costs ~0.4 s of py4j round-trips, so per-wave
    callers build it once and pass it in."""
    from helix_spark.functions.urls import resolve_url_col

    quoted = F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE_JVM), 1)
    hrefs = F.transform(quoted, lambda s: F.substring(s, 2, F.length(s) - 2))
    hrefs = F.filter(
        hrefs,
        lambda h: (F.trim(h) != "") & ~F.lower(F.trim(h)).startswith("javascript:"),
    )
    exploded = pages_df.select(
        *pages_df.columns, F.posexplode(hrefs).alias("seq", "href")
    )
    if resolver is None:
        resolver = resolve_url_col(F.col("href"), F.col(url_col))
    return exploded.withColumn("resolved_url", resolver).drop(html_col)


def extract_links(pages_df: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """pages(url, html, ...) → one row per extracted anchor:
    (url_col…, href, resolved_url, seq). seq is document order, offset by the
    caller if captured assets precede (PostProcessorBlock.cs:26-28)."""
    in_cols = pages_df.columns

    def do_extract(batches):
        for pdf in batches:
            html = pdf[html_col].fillna("")
            found = html.str.extractall(HREF_RE, flags=re.IGNORECASE | re.DOTALL)
            if len(found) == 0:
                yield pd.DataFrame(columns=[*in_cols, "href", "resolved_url", "seq"])
                continue
            # pandas extractall yields NaN (not "") for an EMPTY capture —
            # without the final fillna a page containing href="" crashed the
            # whole batch (caught by the three-way parity test)
            href = found[0].fillna(found[1]).fillna("")
            keep = (href.str.strip() != "") & ~href.str.strip().str.lower().str.startswith("javascript:")
            href = href[keep]
            idx = href.index.get_level_values(0)
            out = pdf.loc[idx, in_cols].reset_index(drop=True)
            out["href"] = href.to_numpy()
            out["seq"] = href.groupby(level=0).cumcount().to_numpy()
            out["resolved_url"] = resolve_urls_vec(out["href"], out[url_col]).to_numpy()
            yield out[[*in_cols, "href", "resolved_url", "seq"]]

    schema = StructType(
        list(pages_df.schema.fields)
        + [
            StructField("href", StringType()),
            StructField("resolved_url", StringType()),
            StructField("seq", IntegerType()),
        ]
    )
    return pages_df.mapInPandas(do_extract, schema)
