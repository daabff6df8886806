"""URL canonicalization kernel — the crawl's identity function.

Semantics follow the reference's ``Resource`` constructor
(/root/reference/Bot.Abstractions/Model/Resource.cs:36-66) plus the implicit
.NET ``Uri`` normalization it relies on, extended per the north rule:

1. resolve relative hrefs against the parent URL (Resource.cs:46)
2. strip fragments ALWAYS (Resource.cs:63-66)
3. lowercase scheme and host (.NET Uri normalization)
4. drop default ports (http:80, https:443 — StartUriDescription.cs:38 parity)
5. empty path → "/" (.NET AbsoluteUri behavior)
6. remove dot segments (bounded, identical regex both impls)
7. sort query parameters (north-rule extension, NOT in the reference —
   callers that need strict reference parity pass sort_query=False)
8. unparseable → status −101 (MalformedUri, StatusCode.cs:14)
   non-http(s) scheme → status −102 (UriSchemeNotSupported, StatusCode.cs:15)

Two implementations of ONE spec:
- ``canonicalize_url_py`` — plain Python, used by the serial oracle
  (helix_spark/plans/oracle.py) and inside extraction pandas UDFs.
- ``with_canonical_url`` — pure Spark column expressions (JVM-side,
  whole-stage-codegen friendly), used by the engine on absolute URLs.
tests/test_urls.py asserts the two agree on the ported reference fixture
corpus (FIXTURES.md §5.5) plus generated cases.

The URL identity key everywhere is ``xxhash64(canonical_url)`` — Spark's
native xxhash64 function, per the north rule.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Status codes (reference: Bot.Abstractions/Enum/StatusCode.cs:11-16)
STATUS_OK_UNKNOWN = 0
STATUS_FAILED = -400
STATUS_MALFORMED_URI = -101
STATUS_URI_SCHEME_NOT_SUPPORTED = -102
STATUS_ORPHANED_URI = -103

SUPPORTED_SCHEMES = ("http", "https")
DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*):"
_ABS_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"
# dot-segment removal patterns — IDENTICAL strings for Python re and Java regex
_DOT_SLASH = r"/\./"
_DOT_END = r"/\.$"
_UP_SEG = r"/(?!\.\./)[^/]+/\.\./"
_UP_END = r"/(?!\.\./)[^/]+/\.\.$"
_LEAD_UP = r"^/\.\.(/|$)"
# Bounded dot-segment removal: both implementations apply the SAME fixed
# number of passes, so parity holds by construction even on pathological
# inputs. 4 covers any realistic nesting while keeping the Catalyst
# expression tree (4×6 regex nodes) small enough to compile fast.
_DOT_ITERS = 4


# ---------------------------------------------------------------------------
# Python implementation (oracle + inside extraction UDF, vectorized via pandas)
# ---------------------------------------------------------------------------

def _remove_dot_segments(path: str) -> str:
    for _ in range(_DOT_ITERS):
        new = re.sub(_DOT_SLASH, "/", path)
        new = re.sub(_DOT_END, "/", new)
        if new == path:
            break
        path = new
    for _ in range(_DOT_ITERS):
        new = re.sub(_UP_SEG, "/", path)
        new = re.sub(_UP_END, "/", new)
        new = re.sub(_LEAD_UP, r"/", new)
        if new == path:
            break
        path = new
    return path


def resolve_url_py(raw: str | None, parent: str | None) -> str | None:
    """Resolve a (possibly relative) href against an absolute parent URL.

    Mirrors .NET ``Uri.TryCreate(parentUri, originalUrl)`` (Resource.cs:46)
    closely enough for the reference's fixture corpus. Returns None when the
    href is relative and no usable parent exists.
    """
    if raw is None:
        return None
    raw = raw.strip()
    if raw == "":
        return None
    if re.match(_SCHEME_RE, raw):
        return raw  # absolute (any scheme, incl. mailto:, ftp://)
    if parent is None or not re.match(_ABS_RE, parent or ""):
        return None
    parent = parent.strip()
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)", parent)
    if not m:
        return None
    scheme, authority, ppath = m.group(1), m.group(2), m.group(3)
    origin = f"{scheme}://{authority}"
    if raw.startswith("//"):
        return f"{scheme}:{raw}"
    if raw.startswith("/"):
        return origin + raw
    if raw.startswith("#"):
        return parent.split("#")[0] + raw
    if raw.startswith("?"):
        base = parent.split("#")[0].split("?")[0]
        return base + raw
    # bare relative: resolve against the parent path's directory
    pdir = ppath[: ppath.rfind("/") + 1] if "/" in ppath else "/"
    if not pdir.startswith("/"):
        pdir = "/" + pdir
    return origin + pdir + raw


def resolve_url_col(href, parent):
    """Column-expression twin of resolve_url_py (third implementation next
    to the pandas resolve_urls_vec — all three are pinned against each
    other in tests/test_extract.py). Keeps link resolution inside
    whole-stage codegen: no Python/Arrow in the extraction hot path."""
    from pyspark.sql import functions as F

    h = F.trim(href)
    m_scheme = h.rlike(_SCHEME_RE)  # already ^-anchored
    parent_ok = F.coalesce(parent.rlike(_ABS_RE), F.lit(False))
    scheme = F.regexp_extract(parent, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    authority = F.regexp_extract(parent, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)
    ppath = F.regexp_extract(parent, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    origin = F.concat(scheme, F.lit("://"), authority)
    nofrag = F.substring_index(parent, "#", 1)
    noquery = F.substring_index(nofrag, "?", 1)
    pdir = F.regexp_replace(ppath, r"[^/]*$", "")
    pdir = F.when(pdir.startswith("/"), pdir).otherwise(F.concat(F.lit("/"), pdir))
    return (
        F.when(h.isNull() | (h == ""), F.lit(None).cast("string"))
        .when(m_scheme, h)
        .when(~parent_ok, F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("#"), F.concat(nofrag, h))
        .when(h.startswith("?"), F.concat(noquery, h))
        .otherwise(F.concat(origin, pdir, h))
    )


def canonicalize_url_py(
    raw: str | None, parent: str | None = None, sort_query: bool = True
) -> tuple[str | None, int]:
    """Canonicalize → (canonical_url | None, status_code).

    status 0 means fine; −101 malformed; −102 unsupported scheme (canonical
    form still returned when parseable, because the reference reports these
    URLs, CoordinatorBlock.cs:240-256).
    """
    resolved = resolve_url_py(raw, parent)
    if resolved is None:
        return None, STATUS_MALFORMED_URI
    m = re.match(_SCHEME_RE, resolved)
    if not m:
        return None, STATUS_MALFORMED_URI
    scheme = m.group(1).lower()
    status = 0 if scheme in SUPPORTED_SCHEMES else STATUS_URI_SCHEME_NOT_SUPPORTED
    rest = resolved[len(m.group(0)):]
    if not rest.startswith("//"):
        # non-hierarchical URI (mailto:, tel:, javascript:) — keep as-is
        return scheme + ":" + rest.split("#")[0], status or STATUS_URI_SCHEME_NOT_SUPPORTED
    body = rest[2:].split("#")[0]  # strip fragment
    qsplit = body.split("?", 1)
    authpath, query = qsplit[0], (qsplit[1] if len(qsplit) > 1 else None)
    slash = authpath.find("/")
    authority, path = (authpath, "") if slash < 0 else (authpath[:slash], authpath[slash:])
    userinfo = ""
    hostport = authority
    if "@" in authority:
        at = authority.rfind("@")
        userinfo, hostport = authority[: at + 1], authority[at + 1:]
    if hostport.startswith("["):  # IPv6 literal
        close = hostport.find("]")
        host = hostport[: close + 1].lower()
        port = hostport[close + 2:] if close + 1 < len(hostport) and hostport[close + 1] == ":" else ""
    elif ":" in hostport:
        host, port = hostport.rsplit(":", 1)
        host = host.lower()
    else:
        host, port = hostport.lower(), ""
    if host == "":
        return None, STATUS_MALFORMED_URI
    if port == DEFAULT_PORTS.get(scheme, None) or port == "":
        port = ""
    path = _remove_dot_segments(path or "/")
    if not path.startswith("/"):
        path = "/" + path
    out = scheme + "://" + userinfo + host + ((":" + port) if port else "") + path
    if query:
        if sort_query:
            query = "&".join(sorted(query.split("&")))
        out += "?" + query
    return out, status


def url_host_py(canonical: str | None) -> str | None:
    if not canonical:
        return None
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#]*)", canonical)
    return m.group(1) if m else None


# ---------------------------------------------------------------------------
# Spark column-expression implementation (JVM-side, codegen)
# ---------------------------------------------------------------------------

def _remove_dot_segments_col(path: Column) -> Column:
    for _ in range(_DOT_ITERS):
        path = F.regexp_replace(path, _DOT_SLASH, "/")
        path = F.regexp_replace(path, _DOT_END, "/")
    for _ in range(_DOT_ITERS):
        path = F.regexp_replace(path, _UP_SEG, "/")
        path = F.regexp_replace(path, _UP_END, "/")
        path = F.regexp_replace(path, _LEAD_UP, "/")
    return path


def canonical_url_col(url: Column, sort_query: bool = True) -> Column:
    """Canonical form of an ABSOLUTE hierarchical URL, as a column expression.

    Relative resolution happens earlier (extraction UDF); by the time URLs hit
    the frontier they are absolute. Non-hierarchical or hostless inputs yield
    NULL (callers classify via canonical_status_col).
    """
    u = F.regexp_replace(F.trim(url), r"#.*", "")  # strip fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    is_hier = u.rlike(_ABS_RE)
    body = F.regexp_replace(u, _ABS_RE, "")
    authpath = F.substring_index(body, "?", 1)
    query = F.when(body.contains("?"), F.regexp_replace(body, r"^[^?]*\?", "")).otherwise(F.lit(None))
    authority = F.substring_index(authpath, "/", 1)
    path = F.substring(authpath, F.length(authority) + 1, F.lit(2**31 - 1))
    has_user = authority.contains("@")
    # userinfo: everything up to and incl. the LAST '@'
    userinfo = F.when(
        has_user,
        F.concat(F.regexp_replace(authority, r"@[^@]*$", ""), F.lit("@")),
    ).otherwise(F.lit(""))
    hostport = F.when(has_user, F.regexp_extract(authority, r"@([^@]*)$", 1)).otherwise(authority)
    is_v6 = hostport.startswith("[")
    host = F.when(is_v6, F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1))).otherwise(
        F.lower(F.substring_index(hostport, ":", 1))
    )
    port = F.when(is_v6, F.regexp_extract(hostport, r"\]:(\d+)$", 1)).otherwise(
        F.when(hostport.contains(":"), F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    )
    default_port = (
        F.when(scheme == "http", F.lit("80"))
        .when(scheme == "https", F.lit("443"))
        .when(scheme == "ftp", F.lit("21"))
        .when(scheme == "ws", F.lit("80"))
        .when(scheme == "wss", F.lit("443"))
        .otherwise(F.lit(""))
    )
    port_part = F.when((port == "") | (port == default_port), F.lit("")).otherwise(F.concat(F.lit(":"), port))
    norm_path = _remove_dot_segments_col(F.when(path == "", F.lit("/")).otherwise(path))
    norm_path = F.when(norm_path.startswith("/"), norm_path).otherwise(F.concat(F.lit("/"), norm_path))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&") if sort_query else query
    query_part = F.when(query.isNull() | (query == ""), F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )
    canon = F.concat(scheme, F.lit("://"), userinfo, host, port_part, norm_path, query_part)
    return F.when(is_hier & (host != ""), canon).otherwise(F.lit(None))


# (gateway id, sort_query) → (ordered intermediate steps, final expr). The
# cached Columns reference only the fixed ``__cu_*`` intermediate names, so
# the trees are reusable across DataFrames — building them costs ~250 ms of
# py4j round trips, and the crawl's admit path pays it EVERY wave without
# this cache. Keyed on the py4j gateway so a recycled JVM rebuilds.
_2STEP_PROGRAM_CACHE: dict = {}


def _two_step_program(sort_query: bool):
    """Ordered (name, Column) projection steps + the final canonical expr of
    the multi-projection canonicalization — built once per JVM."""
    from pyspark import SparkContext

    key = (id(SparkContext._gateway), bool(sort_query))
    hit = _2STEP_PROGRAM_CACHE.get(key)
    if hit is not None:
        return hit
    P = "__cu_"
    steps: list[tuple[str, Column]] = []
    cu = F.col(P + "u")
    steps.append((P + "scheme", F.lower(F.regexp_extract(cu, _SCHEME_RE, 1))))
    steps.append((P + "hier", cu.rlike(_ABS_RE)))
    steps.append((P + "body", F.regexp_replace(cu, _ABS_RE, "")))
    body = F.col(P + "body")
    steps.append((P + "ap", F.substring_index(body, "?", 1)))
    steps.append((
        P + "q",
        F.when(body.contains("?"), F.regexp_replace(body, r"^[^?]*\?", ""))
        .otherwise(F.lit(None)),
    ))
    ap = F.col(P + "ap")
    steps.append((P + "auth", F.substring_index(ap, "/", 1)))
    auth = F.col(P + "auth")
    steps.append((
        P + "path", F.substring(ap, F.length(auth) + 1, F.lit(2**31 - 1))
    ))
    has_user = auth.contains("@")
    steps.append((
        P + "user",
        F.when(
            has_user,
            F.concat(F.regexp_replace(auth, r"@[^@]*$", ""), F.lit("@")),
        ).otherwise(F.lit("")),
    ))
    steps.append((
        P + "hp",
        F.when(has_user, F.regexp_extract(auth, r"@([^@]*)$", 1)).otherwise(auth),
    ))
    hp = F.col(P + "hp")
    is_v6 = hp.startswith("[")
    steps.append((
        P + "host",
        F.when(is_v6, F.lower(F.regexp_extract(hp, r"^(\[[^\]]*\])", 1)))
        .otherwise(F.lower(F.substring_index(hp, ":", 1))),
    ))
    steps.append((
        P + "port",
        F.when(is_v6, F.regexp_extract(hp, r"\]:(\d+)$", 1)).otherwise(
            F.when(hp.contains(":"), F.substring_index(hp, ":", -1)).otherwise(
                F.lit("")
            )
        ),
    ))
    scheme = F.col(P + "scheme")
    port = F.col(P + "port")
    default_port = (
        F.when(scheme == "http", F.lit("80"))
        .when(scheme == "https", F.lit("443"))
        .when(scheme == "ftp", F.lit("21"))
        .when(scheme == "ws", F.lit("80"))
        .when(scheme == "wss", F.lit("443"))
        .otherwise(F.lit(""))
    )
    path = F.col(P + "path")
    steps.append((
        P + "pp",
        F.when((port == "") | (port == default_port), F.lit("")).otherwise(
            F.concat(F.lit(":"), port)
        ),
    ))
    steps.append((
        P + "np",
        _remove_dot_segments_col(F.when(path == "", F.lit("/")).otherwise(path)),
    ))
    np_ = F.col(P + "np")
    steps.append((
        P + "np2",
        F.when(np_.startswith("/"), np_).otherwise(F.concat(F.lit("/"), np_)),
    ))
    q = F.col(P + "q")
    sorted_query = F.array_join(F.array_sort(F.split(q, "&")), "&") if sort_query else q
    query_part = F.when(q.isNull() | (q == ""), F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )
    host = F.col(P + "host")
    canon = F.concat(
        scheme, F.lit("://"), F.col(P + "user"), host, F.col(P + "pp"),
        F.col(P + "np2"), query_part,
    )
    final = F.when(F.col(P + "hier") & (host != ""), canon).otherwise(F.lit(None))
    _2STEP_PROGRAM_CACHE[key] = (steps, final)
    return steps, final


def with_canonical_url_2step(df, src: Column, out: str = "canonical_url",
                             sort_query: bool = True):
    """Multi-projection twin of ``withColumn(out, canonical_url_col(src))``
    — bit-identical output, radically cheaper evaluation and planning.

    ``canonical_url_col`` is one Column tree in which the shared
    sub-expressions (fragment-stripped url, body, authority, hostport,
    host, port, …) are textually re-inlined dozens of times; interpreted
    expression evaluation (the tree contains an ``array_sort`` lambda →
    whole-stage-codegen fallback) computes every occurrence independently,
    and Catalyst re-analyzes the ~50 KB tree on every plan that embeds it
    (measured: a visible slice of the crawl's per-wave driver gap). This
    form materializes each shared intermediate ONCE per row in a chain of
    projections over bound attributes — the same two-step trick as
    ``shingles_from_tokens_col`` — using the IDENTICAL formulas, so values
    match the one-step form exactly (pinned by tests/test_urls.py).
    CollapseProject keeps the steps apart (non-cheap, multiply
    referenced). Intermediates use the ``__cu_`` prefix and are dropped.
    The step trees are module-cached (_two_step_program): only the
    ``src``-dependent first projection and the per-call withColumn chain
    are built per invocation, cutting the per-wave py4j build cost."""
    P = "__cu_"
    steps, final = _two_step_program(sort_query)
    df = df.withColumn(P + "u", F.regexp_replace(F.trim(src), r"#.*", ""))
    for name, expr in steps:
        df = df.withColumn(name, expr)
    df = df.withColumn(out, final)
    return df.drop(*[c for c in df.columns if c.startswith(P)])


def canonical_status_col(url: Column) -> Column:
    """Status classification of a raw absolute URL (pre-canonicalization).

    −101 malformed (no scheme / no host), −102 unsupported scheme, else 0.
    Mirrors Resource.cs:47-58.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    has_scheme = u.rlike(_SCHEME_RE)
    is_hier = u.rlike(_ABS_RE)
    host_ok = F.regexp_extract(u, _ABS_RE + r"(?:[^/?#@]*@)?([^/?#:\[]+|\[[^\]]*\])", 1) != ""
    return (
        F.when(~has_scheme, F.lit(STATUS_MALFORMED_URI))
        .when(scheme.isin(*SUPPORTED_SCHEMES) & is_hier & host_ok, F.lit(0))
        .when(scheme.isin(*SUPPORTED_SCHEMES), F.lit(STATUS_MALFORMED_URI))
        .otherwise(F.lit(STATUS_URI_SCHEME_NOT_SUPPORTED))
    )


def url_hash_col(canonical: Column) -> Column:
    """URL identity key: xxhash64 of the canonical URL (north rule)."""
    return F.xxhash64(canonical)


def host_col(canonical: Column) -> Column:
    """Politeness partition key: the host[:port] of a canonical URL."""
    return F.regexp_extract(canonical, _ABS_RE[1:] + r"(?:[^/?#@]*@)?([^/?#]*)", 1)


def localize_url_col(url: Column, remote_host: str, start_host: str, start_port: str = "") -> Column:
    """URI localization (ResourceScope.cs:29-36): rewrite URLs whose
    authority equals ``remote_host`` (case-insensitive) to the start URI's
    host[:port]; pass every other URL through unchanged."""
    auth = F.regexp_extract(url, _ABS_RE[1:] + r"(?:[^/?#@]*@)?([^/?#]*)", 1)
    target = start_host + ((":" + start_port) if start_port else "")
    rewritten = F.concat(
        F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?)", 1),
        F.lit(target),
        F.regexp_replace(url, _ABS_RE[1:] + r"(?:[^/?#@]*@)?[^/?#]*", ""),
    )
    return F.when(F.lower(auth) == remote_host.lower(), rewritten).otherwise(url)


def localize_url_py(url: str, remote_host: str, start_host: str, start_port: str = "") -> str:
    """Python twin of localize_url_col."""
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?)([^/?#]*)(.*)$", url or "")
    if not m:
        return url
    if m.group(2).lower() != remote_host.lower():
        return url
    target = start_host + ((":" + start_port) if start_port else "")
    return m.group(1) + target + m.group(3)


def with_url_columns(df, url_col_name: str = "url", sort_query: bool = True):
    """Standard frontier enrichment: canonical_url, url_hash, host, url_status."""
    c = F.col(url_col_name)
    canon = canonical_url_col(c, sort_query=sort_query)
    return (
        df.withColumn("canonical_url", canon)
        .withColumn("url_status", canonical_status_col(c))
        .withColumn("url_hash", url_hash_col(F.col("canonical_url")))
        .withColumn("host", host_col(F.col("canonical_url")))
    )
