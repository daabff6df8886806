"""Status classification + content-type → resource-type mapping.

Parity sources:
- broken range: abs(status) >= 400 (/root/reference/Bot/Core/ExtensionMethods.cs:9)
- content-type prefix table, FIRST match wins, case-insensitive, in declared
  order (/root/reference/Bot/Business/HttpContentTypeToResourceTypeDictionary.cs:12-53)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (prefix, resource_type) in reference declaration order — ORDER IS SEMANTIC:
# "image/" must precede "text/", "application/" must come last.
CONTENT_TYPE_MAP: list[tuple[str, str]] = [
    ("text/html", "Html"),
    ("text/css", "Css"),
    ("application/javascript", "Script"),
    ("application/x-javascript", "Script"),
    ("application/ecmascript", "Script"),
    ("text/javascript", "Script"),
    ("application/json", "Json"),
    ("application/xml", "Xml"),
    ("text/event-stream", "ServerSentEvent"),
    ("image/", "Image"),
    ("audio/", "Audio"),
    ("video/", "Video"),
    ("font/", "Font"),
    ("application/font", "Font"),
    ("text/", "Text"),
    ("application/", "Blob"),
]


def is_broken_col(status: Column) -> Column:
    """broken ⇔ abs(status) >= 400 (ExtensionMethods.cs:9)."""
    return F.abs(status) >= 400


def is_redirect_col(status: Column) -> Column:
    return (status >= 300) & (status < 400)


def resource_type_col(content_type: Column) -> Column:
    """Ordered first-match prefix classification; null/unmatched → Unknown."""
    lct = F.lower(content_type)
    expr = None
    for prefix, rtype in CONTENT_TYPE_MAP:
        cond = lct.startswith(prefix)
        expr = F.when(cond, F.lit(rtype)) if expr is None else expr.when(cond, F.lit(rtype))
    return expr.otherwise(F.lit("Unknown"))


def resource_type_py(content_type: str | None) -> str:
    """Python twin of resource_type_col (used by the serial oracle)."""
    if content_type is None:
        return "Unknown"
    lct = content_type.lower()
    for prefix, rtype in CONTENT_TYPE_MAP:
        if lct.startswith(prefix):
            return rtype
    return "Unknown"


def is_broken_py(status: int) -> bool:
    return abs(status) >= 400


def status_class_col(status: Column) -> Column:
    """Bucket a status code into a reporting class (for per-wave metrics)."""
    return (
        F.when(status < 0, F.lit("synthetic_error"))
        .when((status >= 100) & (status < 200), F.lit("informational"))
        .when((status >= 200) & (status < 300), F.lit("success"))
        .when((status >= 300) & (status < 400), F.lit("redirect"))
        .when((status >= 400) & (status < 500), F.lit("client_error"))
        .when(status >= 500, F.lit("server_error"))
        .otherwise(F.lit("unknown"))
    )
