"""Deterministic synthetic web universe — the crawl's content store.

Replaces the reference's live HTTP + Chromium rendering (SURVEY.md §1.5):
`pages` stands in for the web, `page_assets` for proxy-captured traffic
(HtmlRenderer.cs:54-152), `images` for fetched payloads, `robots` for the
north-rule politeness extension.

ONE integer-arithmetic spec, two materializations:
- ``gen_*_py``: plain-Python at small N — feeds the serial oracle and the
  Spark engine in parity tests (both read THE SAME tables).
- ``gen_pages_spark``: the same spec as pure column expressions over
  ``spark.range(N)`` — lazily generates million-page graphs for benchmarks
  without ever materializing on the driver.

Everything derives from the page index i / image index k. Seed pages, hot
hosts (skew fixture), redirect chains, broken links, robots-blocked paths,
oversized pages, and non-html content types are all present by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from helix_spark.sources import codecs

# ------------------------------- graph constants (shared by both impls)
HOT_HOST_MOD = 3          # i % 3 == 0 → host 0 (hot: ~33% of pages)
KNUTH = 2654435761        # multiplicative scatter for host assignment
PRIVATE_MOD = 31          # i % 31 == 12 → /private/ path (robots fixture)
P404_MOD, P404_RES = 13, 6
P500_MOD, P500_RES = 29, 7
REDIR_MOD, REDIR_RES = 17, 3
IMG_MOD, IMG_RES = 23, 9
BIG_MOD, BIG_RES = 37, 11
SPECIAL_MOD = 11          # i % 11 == 0 → mailto/javascript/fragment anchors
EXT_MOD, EXT_RES = 13, 5  # i % 13 == 5 → external link
ASSET_BROKEN_MOD, ASSET_BROKEN_RES = 19, 2
BIG_SIZE = 11 * 1024 * 1024


def host_id(i: int, H: int) -> int:
    return 0 if i % HOT_HOST_MOD == 0 else 1 + (i * KNUTH) % max(H - 1, 1)


def page_path(i: int) -> str:
    return f"/private/p{i}" if i % PRIVATE_MOD == 12 else f"/p/{i}"


def page_url(i: int, H: int) -> str:
    return f"http://host{host_id(i, H)}.test{page_path(i)}"


def page_status(i: int) -> int:
    if i % REDIR_MOD == REDIR_RES:
        return 301
    if i % P404_MOD == P404_RES:
        return 404
    if i % P500_MOD == P500_RES:
        return 500
    return 200


def redirect_target(i: int, N: int) -> int:
    """Same-host-biased for host-0 pages so internal redirect chains exist
    (cross-host targets are external → verified but never expanded)."""
    if i % HOT_HOST_MOD == 0:
        t = HOT_HOST_MOD * (((i // HOT_HOST_MOD) * 3 + 7) % max(N // HOT_HOST_MOD, 1))
    else:
        t = (i * 3 + 7) % N
    return t if t != i else (t + HOT_HOST_MOD) % N


def page_content_type(i: int) -> str:
    return "image/png" if i % IMG_MOD == IMG_RES else "text/html"


def page_size(i: int) -> int:
    return BIG_SIZE if i % BIG_MOD == BIG_RES else 1000 + (i * 997) % 50000


def page_load_ms(i: int) -> int:
    """Deterministic per-page load time (ProcessingResult.cs:7
    MillisecondsPageLoadTime analog) — feeds the avg-page-load-time metric
    (README.md:28-29, StatisticsSnapshot.cs:7)."""
    return 50 + (i * 37) % 950


def n_links(i: int) -> int:
    return (i % 4) + 1


def link_target(i: int, j: int, N: int) -> int:
    """Even j → same-host target (internal, expandable); odd j → scattered
    (mostly external: verified-not-expanded, ResourceVerifierBlock.cs:68)."""
    if j % 2 == 0 and i % HOT_HOST_MOD == 0:
        return HOT_HOST_MOD * (
            ((i // HOT_HOST_MOD) * 7 + j * 13 + 1) % max(N // HOT_HOST_MOD, 1)
        )
    return (i * 7 + j * 13 + 1) % N


def page_html(i: int, N: int, H: int) -> str:
    anchors = []
    for j in range(n_links(i)):
        t = link_target(i, j, N)
        href = page_url(t, H) if j % 2 == 0 else page_path(t)
        anchors.append(f'<a href="{href}">link{j}</a>')
    if i % SPECIAL_MOD == 0:
        anchors.append('<a href="mailto:contact@test.example">mail</a>')
        anchors.append('<a href="javascript:void(0)">js</a>')
        anchors.append('<a href="#section">frag</a>')
        anchors.append("<a>nohref</a>")
    if i % EXT_MOD == EXT_RES:
        anchors.append(f'<a href="http://ext{i % 7}.example/x">ext</a>')
    return "<html><body>" + "".join(anchors) + "</body></html>"


def gen_pages_py(N: int, H: int = 8) -> pd.DataFrame:
    rows = [
        {
            "url": page_url(i, H),
            "html": page_html(i, N, H) if page_content_type(i) == "text/html" else "",
            "status_code": page_status(i),
            "content_type": page_content_type(i),
            "size": page_size(i),
            "redirect_to": page_url(redirect_target(i, N), H)
            if page_status(i) == 301
            else None,
            "load_ms": page_load_ms(i),
        }
        for i in range(N)
    ]
    return pd.DataFrame(rows)


def gen_assets_py(N: int, H: int = 8, n_images: int = 64) -> pd.DataFrame:
    rows = []
    for i in range(N):
        if page_content_type(i) != "text/html" or page_status(i) != 200:
            continue
        seq = 0
        for j in range(i % 3):
            k = (i * 5 + j) % n_images
            rows.append(
                {
                    "page_url": page_url(i, H),
                    "asset_url": f"http://img.cdn.test/im/{k}.png",
                    "content_type": "image/png",
                    "size": 800 + k % 5000,
                    "status_code": 200,
                    "seq": seq,
                }
            )
            seq += 1
        if i % ASSET_BROKEN_MOD == ASSET_BROKEN_RES:
            rows.append(
                {
                    "page_url": page_url(i, H),
                    "asset_url": f"http://host{host_id(i, H)}.test/missing/{i}.css",
                    "content_type": "text/css",
                    "size": 0,
                    "status_code": 404,
                    "seq": seq,
                }
            )
    return pd.DataFrame(
        rows,
        columns=["page_url", "asset_url", "content_type", "size", "status_code", "seq"],
    )


def gen_robots_py(H: int = 8) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "host": f"host{h}.test",
                "disallow_prefixes": ["/private"] if h % 4 == 1 else [],
                "crawl_delay_waves": h % 3,
            }
            for h in range(H)
        ]
    )


# --------------------------------------------------------------- images
def _image_pixels(k: int) -> np.ndarray:
    rng = np.random.default_rng(k * 7919 + 42)
    w = 32 if k % 2 == 0 else 64
    h = 32 if k % 5 < 3 else 64
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8), w, h


_CAPTION_WORDS = (
    "sunset ocean mountain forest city skyline river bridge portrait "
    "abstract texture pattern night light shadow color crowd street market"
).split()


def image_caption(k: int) -> str:
    n = 4 + k % 5
    return " ".join(_CAPTION_WORDS[(k * 13 + j * 7) % len(_CAPTION_WORDS)] for j in range(n))


def image_fmt(k: int) -> str:
    return "jpeg" if k % 3 == 0 else "png"


def gen_image_row(k: int) -> dict:
    pixels, w, h = _image_pixels(k)
    fmt = image_fmt(k)
    data = codecs.encode_png(pixels) if fmt == "png" else codecs.encode_lossy(pixels)
    return {
        "image_id": f"img{k:08d}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": image_caption(k),
        "phash": codecs.phash64(codecs.decode_image(data, fmt)),
    }


IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def gen_images_spark(spark: SparkSession, n_images: int) -> DataFrame:
    """Distributed payload generation: each partition encodes its own rows
    (generation-only Python; the engine's hot path never re-encodes)."""

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([gen_image_row(int(k)) for k in pdf["id"]])

    return spark.range(n_images).repartition(32).mapInPandas(gen, IMAGES_SCHEMA)


def gen_images_py(n_images: int) -> pd.DataFrame:
    return pd.DataFrame([gen_image_row(k) for k in range(n_images)])


# ------------------------------------------------ spark-scale page graph
def gen_pages_spark(spark: SparkSession, N: int, H: int = 8) -> DataFrame:
    """Same spec as gen_pages_py, as lazy column expressions over range(N).
    Used for bench-scale graphs (10^6+ pages) — no driver materialization."""
    i = F.col("id")
    hid = F.when(i % HOT_HOST_MOD == 0, F.lit(0)).otherwise(
        (i * KNUTH) % F.lit(max(H - 1, 1)) + 1
    )
    path = F.when(
        i % PRIVATE_MOD == 12, F.concat(F.lit("/private/p"), i.cast("string"))
    ).otherwise(F.concat(F.lit("/p/"), i.cast("string")))
    url = F.concat(F.lit("http://host"), hid.cast("string"), F.lit(".test"), path)
    status = (
        F.when(i % REDIR_MOD == REDIR_RES, F.lit(301))
        .when(i % P404_MOD == P404_RES, F.lit(404))
        .when(i % P500_MOD == P500_RES, F.lit(500))
        .otherwise(F.lit(200))
    )
    ctype = F.when(i % IMG_MOD == IMG_RES, F.lit("image/png")).otherwise(F.lit("text/html"))
    size = F.when(i % BIG_MOD == BIG_RES, F.lit(BIG_SIZE)).otherwise(
        F.lit(1000) + (i * 997) % 50000
    )

    def url_of(t):
        thid = F.when(t % HOT_HOST_MOD == 0, F.lit(0)).otherwise(
            (t * KNUTH) % F.lit(max(H - 1, 1)) + 1
        )
        tpath = F.when(
            t % PRIVATE_MOD == 12, F.concat(F.lit("/private/p"), t.cast("string"))
        ).otherwise(F.concat(F.lit("/p/"), t.cast("string")))
        return F.concat(F.lit("http://host"), thid.cast("string"), F.lit(".test"), tpath)

    def path_of(t):
        return F.when(
            t % PRIVATE_MOD == 12, F.concat(F.lit("/private/p"), t.cast("string"))
        ).otherwise(F.concat(F.lit("/p/"), t.cast("string")))

    HOT = HOT_HOST_MOD
    idiv = F.floor(i / HOT).cast("long")
    rt0 = F.when(
        i % HOT == 0, F.lit(HOT) * ((idiv * 3 + 7) % F.lit(max(N // HOT, 1)))
    ).otherwise((i * 3 + 7) % N)
    rt = F.when(rt0 == i, (rt0 + HOT) % N).otherwise(rt0)
    redirect_to = F.when(status == 301, url_of(rt)).otherwise(F.lit(None))

    def tgt(j):
        same_host = F.lit(HOT) * ((idiv * 7 + j * 13 + 1) % F.lit(max(N // HOT, 1)))
        scattered = (i * 7 + j * 13 + 1) % N
        return F.when((j % 2 == 0) & (i % HOT == 0), same_host).otherwise(scattered)

    anchors = F.transform(
        F.sequence(F.lit(0), (i % 4).cast("int")),
        lambda j: F.concat(
            F.lit('<a href="'),
            F.when(j % 2 == 0, url_of(tgt(j))).otherwise(path_of(tgt(j))),
            F.lit('">link'),
            j.cast("string"),
            F.lit("</a>"),
        ),
    )
    specials = F.when(
        i % SPECIAL_MOD == 0,
        F.lit(
            '<a href="mailto:contact@test.example">mail</a>'
            '<a href="javascript:void(0)">js</a>'
            '<a href="#section">frag</a><a>nohref</a>'
        ),
    ).otherwise(F.lit(""))
    ext = F.when(
        i % EXT_MOD == EXT_RES,
        F.concat(F.lit('<a href="http://ext'), (i % 7).cast("string"), F.lit('.example/x">ext</a>')),
    ).otherwise(F.lit(""))
    html = F.when(
        ctype == "text/html",
        F.concat(F.lit("<html><body>"), F.array_join(anchors, ""), specials, ext, F.lit("</body></html>")),
    ).otherwise(F.lit(""))

    return spark.range(N).select(
        url.alias("url"),
        html.alias("html"),
        status.cast("int").alias("status_code"),
        ctype.alias("content_type"),
        size.cast("long").alias("size"),
        redirect_to.alias("redirect_to"),
        (F.lit(50) + (i * 37) % 950).cast("long").alias("load_ms"),
    )
