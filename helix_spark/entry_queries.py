"""Driver-checkable query battery: each crawl operator / pipeline op from
SURVEY.md §2, expressed over the driver's TPC-H-ish testdata with an exact
ANSI-SQL (DuckDB) oracle twin.

Determinism rules applied throughout (the driver hash-compares values):
- every output column is int64 or string — NO DECIMAL/HUGEINT leaves a query
  (the driver's normalizer renders those differently per engine; round-1
  CORRECTNESS showed exactly the DECIMAL/HUGEINT queries hash-failing)
- monetary sums go through DECIMAL(18,2) casts (exact, order-free), then are
  emitted as BIGINT cents: CAST(sum*100 AS BIGINT) on both engines
- DuckDB SUM over integers yields HUGEINT — always CAST(... AS BIGINT) in SQL
- ratios become integers via floor(x*1000) (no round-half rules in play)
- every top-k ranks with an explicit unique tiebreaker, never bare LIMIT
- md5-derived int60 is the cross-engine hash (Spark conv() == DuckDB 0x cast)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from helix_spark.functions.status import resource_type_col
from helix_spark.functions.text import (
    LANG_STOPWORDS,
    BPE_TOKEN_RE,
    TOKEN_SPLIT_RE,
    lang_id_col,
    token_count_col,
    tokens_col,
)
from helix_spark.functions.urls import canonical_url_col
from helix_spark.operators.textdedup import (
    exact_dedup,
    md5_int60_col,
    minhash_signature,
    ngram_jaccard_pairs,
)
from helix_spark.operators.similarity import brute_force_topk


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _t_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table scan + fan-out for the CPU-heavy narrow projections (URL
    canonicalization, PII regexes, per-doc text stats): the testdata tables
    are single parquet files, so the scan is ONE task and a projection whose
    per-row cost is 100-1000× the scan runs on one core (guide §2.2/§6.1 —
    measured: url_canonicalize 3.3 s single-task at sf0.1). _fan_out
    round-robins to core count only when the file-split count is below it —
    at real scale (many splits) this is a no-op, never an extra shuffle.
    Results are row-identical; only placement changes."""
    from helix_spark.operators.textdedup import _fan_out

    return _fan_out(_t(spark, sf_dir, name))


DEC = "decimal(18,2)"

# ---------------------------------------------------------------------------
# crawl-operator family (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

def q_seen_anti_join(spark, sf):
    """The seen-set dedup join (CoordinatorBlock.cs:235-264 analog):
    parts that never appear in lineitem."""
    part = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    return part.join(li.select("l_partkey"), part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


SQL_SEEN_ANTI_JOIN = """
SELECT p_partkey, p_name FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
"""


def q_first_wins_dedup(spark, sf):
    """First-wins TryAdd semantics (CoordinatorBlock.cs:259): first event per
    user in (ts, event_id) order."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("first_event_id"),
                F.col("event_type").alias("first_event_type"))
    )


SQL_FIRST_WINS = """
SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
FROM events QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
"""


def q_per_host_topk(spark, sf):
    """Politeness batch selection window (per-host budget top-k)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "event_id", "rank")
    )


SQL_PER_HOST_TOPK = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rank
FROM events QUALIFY rank <= 3
"""


def q_status_class_agg(spark, sf):
    """Status-class counters (Statistics.cs analog) — TPC-H Q1 shape."""
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(F.col("l_quantity").cast(DEC)) * 100).cast("long").alias("sum_qty_cents"),
            (F.sum(F.col("l_extendedprice").cast(DEC)) * 100).cast("long").alias("sum_price_cents"),
            F.count("*").alias("n_rows"),
        )
    )


SQL_STATUS_CLASS_AGG = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_broken_range_filter(spark, sf):
    """broken ⇔ abs(status) ≥ threshold (ExtensionMethods.cs:9)."""
    ev = _t(spark, sf, "events")
    return ev.filter(F.abs(F.col("value")) >= 150).select("event_id", "event_type")


SQL_BROKEN_RANGE = "SELECT event_id, event_type FROM events WHERE abs(value) >= 150"


def q_union_dedup(spark, sf):
    """captured ∪ extracted set union (PostProcessorBlock.cs:26-28 analog)."""
    c = _t(spark, sf, "customer").select(F.col("c_name").alias("name"))
    s = _t(spark, sf, "supplier").select(F.col("s_name").alias("name"))
    return c.union(s).distinct()


SQL_UNION_DEDUP = "SELECT c_name AS name FROM customer UNION SELECT s_name FROM supplier"


_EVENT_CTYPE = [
    ("click", "text/html; charset=utf-8"),
    ("view", "image/png"),
    ("purchase", "application/json"),
    ("signup", "application/font-woff"),
    ("error", "text/plain"),
]


def q_content_type_classify(spark, sf):
    """The ordered prefix-match content-type map itself
    (HttpContentTypeToResourceTypeDictionary.cs:12-53)."""
    ev = _t(spark, sf, "events")
    ct = None
    for etype, c in _EVENT_CTYPE:
        ct = (F.when(F.col("event_type") == etype, F.lit(c)) if ct is None
              else ct.when(F.col("event_type") == etype, F.lit(c)))
    return (
        ev.withColumn("resource_type", resource_type_col(ct))
        .groupBy("resource_type")
        .agg(F.count("*").alias("n"))
    )


def _sql_ctype_case() -> str:
    whens = "\n".join(
        f"WHEN event_type = '{e}' THEN '{c}'" for e, c in _EVENT_CTYPE
    )
    from helix_spark.functions.status import CONTENT_TYPE_MAP

    classify = "\n".join(
        f"WHEN lower(ct) LIKE '{p}%' THEN '{r}'" for p, r in CONTENT_TYPE_MAP
    )
    return f"""
WITH typed AS (
  SELECT CASE {whens} END AS ct FROM events
)
SELECT CASE {classify} ELSE 'Unknown' END AS resource_type, COUNT(*) AS n
FROM typed GROUP BY 1
"""


def q_url_canonicalize(spark, sf):
    """URL canonicalization kernel over synthesized URLs (Resource.cs:36-66
    semantics: lower scheme/host, strip fragment, drop :80, sort params,
    remove dot segments)."""
    from helix_spark.functions.urls import with_canonical_url_2step

    ev = _t_spread(spark, sf, "events")
    url = F.concat(
        F.lit("HTTP://Host"), (F.col("user_id") % 50).cast("string"),
        F.lit(".Test.com:80/a/b/../c/./d?b="), (F.col("event_id") % 13).cast("string"),
        F.lit("&a="), (F.col("user_id") % 7).cast("string"), F.lit("#frag"),
    )
    # multi-projection canonicalization (bit-identical to canonical_url_col;
    # see functions/urls.with_canonical_url_2step): the one-step tree is
    # interpreted and re-evaluates its shared subexpressions per reference
    return with_canonical_url_2step(ev, url, out="canonical_url").select(
        "event_id", "canonical_url"
    )


SQL_URL_CANONICALIZE = """
SELECT event_id,
       'http://host' || (user_id % 50) || '.test.com/a/c/d?' ||
       array_to_string(list_sort(['b=' || (event_id % 13), 'a=' || (user_id % 7)]), '&')
       AS canonical_url
FROM events
"""


def q_host_budget_agg(spark, sf):
    """Per-host frontier statistics (politeness budget inputs)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
    )


SQL_HOST_BUDGET = """
SELECT user_id, COUNT(*) AS n_events, MIN(event_id) AS min_event, MAX(event_id) AS max_event
FROM events GROUP BY user_id
"""


def q_except_anti(spark, sf):
    """except/anti set op: customers who never ordered."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


SQL_EXCEPT_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_topk_revenue_join(spark, sf):
    """Join + agg + deterministic top-k (TPC-H Q3 shape): top 10 orders of
    BUILDING-segment customers by line count and decimal price sum."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)) * 100).cast("long").alias("sum_price_cents"),
            F.count("*").alias("n_lines"),
        )
    )
    w = Window.orderBy(F.col("sum_price_cents").desc(), F.col("o_orderkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("o_orderkey", "sum_price_cents", "n_lines", "rank")
    )


SQL_TOPK_REVENUE = """
WITH agg AS (
  SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents,
         COUNT(*) AS n_lines
  FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING'
  GROUP BY o_orderkey
)
SELECT o_orderkey, sum_price_cents, n_lines,
       row_number() OVER (ORDER BY sum_price_cents DESC, o_orderkey) AS rank
FROM agg QUALIFY rank <= 10
"""


def q_region_rollup_join(spark, sf):
    """Broadcast dim-chain join (TPC-H Q5 shape): line counts + decimal
    revenue by region and nation."""
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum(F.col("l_extendedprice").cast(DEC)) * 100).cast("long").alias("sum_price_cents"),
        )
    )


SQL_REGION_ROLLUP = """
SELECT r_name, n_name, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_sessionize(spark, sf):
    """Stateful sessionization (30-min gap) via lag + running sum."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(new_s).over(w)
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM g
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id
"""


def q_windowed_counts(spark, sf):
    """Tumbling 1-hour event counts (streaming-agg analog, batch form)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )


SQL_WINDOWED_COUNTS = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def q_json_extract(spark, sf):
    """Semi-structured props extraction."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy((k % 10).alias("k_mod")).agg(F.count("*").alias("n"))


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod, COUNT(*) AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# training-data pipeline ops (documents / embeddings)
# ---------------------------------------------------------------------------

def q_exact_dedup(spark, sf):
    docs = _t(spark, sf, "documents")
    return exact_dedup(docs)


SQL_EXACT_DEDUP = """
SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", md5_int60_col(F.col("text")).alias("fp"))


SQL_DOC_FINGERPRINT = """
SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp FROM documents
"""


def q_token_count(spark, sf):
    docs = _t_spread(spark, sf, "documents")
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tok"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), 0)).alias("n_bpe"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS n_tok,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe
FROM documents
"""


def q_quality_score(spark, sf):
    """Surface-statistics quality score in integer milli-units (the single
    spec lives in functions/text.py:_quality_sum_col)."""
    from helix_spark.functions.text import quality_score_milli_col

    docs = _t_spread(spark, sf, "documents")
    return docs.select("doc_id", quality_score_milli_col(F.col("text")).alias("quality_milli"))


SQL_QUALITY_SCORE = f"""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS n_tok
  FROM documents
)
SELECT doc_id, CAST(floor((
    (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
  + (CASE WHEN n_tok > 0 AND n_alpha / n_tok BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
  + (CASE WHEN n_tok >= 5 THEN 1.0 ELSE 0.0 END)) / 3.0 * 1000) AS BIGINT) AS quality_milli
FROM s
"""


def q_lang_id(spark, sf):
    docs = _t_spread(spark, sf, "documents")
    return docs.select("doc_id", lang_id_col(F.col("text")).alias("pred_lang"))


def _sql_lang_id() -> str:
    hits = []
    for lang, sw in sorted(LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in sw)
        hits.append(
            f"len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),"
            f" x -> x IN ({lst}))) AS h_{lang}"
        )
    langs_desc = sorted(LANG_STOPWORDS, reverse=True)  # ties → greatest code
    case = []
    for lang in langs_desc:
        others = [o for o in langs_desc if o != lang]
        cond = " AND ".join(f"h_{lang} >= h_{o}" for o in others)
        case.append(f"WHEN {cond} THEN '{lang}'")
    return f"""
WITH h AS (SELECT doc_id, {', '.join(hits)} FROM documents)
SELECT doc_id, CASE {' '.join(case)} END AS pred_lang FROM h
"""


def q_minhash_signature(spark, sf):
    docs = _t(spark, sf, "documents")
    return minhash_signature(docs, k=4)


def _sql_minhash() -> str:
    from helix_spark.operators.textdedup import MINHASH_PERMS, MINHASH_PRIME

    comps = []
    for i in range(4):
        a, b = MINHASH_PERMS[i]
        comps.append(
            f"list_min(list_transform(shingle_ints,"
            f" x -> ((x % {MINHASH_PRIME}) * {a} + {b}) % {MINHASH_PRIME})) AS mh{i}"
        )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> array_to_string(t[i:i+2], ' ')) AS shingles
  FROM toks
), ints AS (
  SELECT doc_id,
         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS shingle_ints
  FROM sh
)
SELECT doc_id, {', '.join(comps)} FROM ints
"""


def q_ngram_jaccard(spark, sf):
    """Corpus-wide exact Jaccard — the quadratic verify-twin, so the battery
    runs it WITH the fail-fast guard on: past 20k docs an exact all-pairs
    run is not a sane request and the operator refuses (use near_dup_pairs,
    the LSH-pruned scale path, instead)."""
    docs = _t(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2,
                               assert_max_docs=20_000)


SQL_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                          i -> array_to_string(t[i:i+2], ' ')))) AS sh
  FROM toks
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_b, id_a, n_common,
       CAST(floor(1000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS jaccard_milli
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE floor(1000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= 200
"""


def q_embedding_topk(spark, sf):
    """Brute-force cosine top-10 against the vec_id=0 query vector."""
    emb = _t(spark, sf, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return brute_force_topk(emb.filter(F.col("vec_id") > 0), qvec, k=10)


SQL_EMBEDDING_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) AS cos
  FROM embeddings, q WHERE vec_id > 0
)
SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_e4
FROM scored QUALIFY rank <= 10
"""


def q_embedding_label_centroid_dist(spark, sf):
    """Per-label vector stats: counts + integer-quantized mean norm."""
    emb = _t(spark, sf, "embeddings")
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return (
        emb.select("label", F.floor(norm2 * 1000).cast("long").alias("norm2_milli"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.sum("norm2_milli").alias("sum_norm2_milli"))
    )


SQL_EMB_LABEL_STATS = """
WITH n AS (
  SELECT label,
         CAST(floor(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x), (a,b) -> a+b) * 1000) AS BIGINT) AS norm2_milli
  FROM embeddings
)
SELECT label, COUNT(*) AS n, CAST(SUM(norm2_milli) AS BIGINT) AS sum_norm2_milli FROM n GROUP BY label
"""


# the static ANN/near-dup oracle strings bake plane & centroid literals for
# THIS dimension; the Spark twins assert the live data matches before running
EMB_ORACLE_DIM = 64
EMB_NEAR_DUP_CAP = 40  # sized so sf0.01's biggest buckets exercise the star rule


def _assert_emb_dim(emb):
    d = emb.select(F.size("embedding").alias("d")).first()["d"]
    if d != EMB_ORACLE_DIM:
        raise ValueError(
            f"embeddings dim {d} != {EMB_ORACLE_DIM}: the SQL oracles bake "
            f"plane/centroid literals for dim {EMB_ORACLE_DIM} — regenerate "
            f"them (entry_queries EMB_ORACLE_DIM) instead of silently "
            f"bucketing with wrong-length planes"
        )
    return emb


def q_embedding_near_dup(spark, sf):
    """Embedding-cosine near-dup pairs: sign-bit LSH buckets → exact
    integer-quantized cosine verify on same-bucket candidates (the vector
    twin of minhash_lsh_pairs; never all-pairs) — with the hot-bucket star
    cap ON, so the oracle also pins the skew-guard semantics."""
    from helix_spark.operators.similarity import embedding_near_dup_pairs

    emb = _assert_emb_dim(_t(spark, sf, "embeddings"))
    return embedding_near_dup_pairs(
        emb, threshold_e2=30, n_planes=4, max_bucket_size=EMB_NEAR_DUP_CAP
    )


def _sql_quant_list(col: str, quant: int) -> str:
    return f"list_transform({col}::DOUBLE[], x -> CAST(floor(x * {quant}) AS BIGINT))"


def _sql_bucket_terms(qplanes: list[list[int]], over: str) -> str:
    terms = []
    for i, row in enumerate(qplanes):
        lit = "[" + ", ".join(str(v) for v in row) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({over}, {lit}::BIGINT[]) >= 0 THEN {2**i} ELSE 0 END"
        )
    return " + ".join(terms)


def _sql_embedding_near_dup(threshold_e2: int = 30, n_planes: int = 4,
                            quant: int = 100, dim: int = EMB_ORACLE_DIM,
                            cap: int = EMB_NEAR_DUP_CAP) -> str:
    from helix_spark.operators.similarity import quantized_planes

    qplanes = quantized_planes(dim, n_planes, quant)
    t2 = threshold_e2 * threshold_e2
    return f"""
WITH base AS (
  SELECT vec_id, {_sql_quant_list('embedding', quant)} AS q
  FROM embeddings
), tagged AS (
  SELECT vec_id, q,
         CAST({_sql_bucket_terms(qplanes, 'q')} AS BIGINT) AS bucket,
         list_dot_product(q, q) AS n2
  FROM base
), stats AS (
  SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS rep FROM tagged GROUP BY 1
), pairs AS (
  -- hot-bucket star rule (same as the Spark operator): over-cap buckets
  -- emit only (rep=min id, member) candidates, small buckets all-pairs
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.q, b.q) AS dot, a.n2 AS na, b.n2 AS nb
  FROM tagged a
  JOIN tagged b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  JOIN stats s ON s.bucket = a.bucket
  WHERE s.n <= {cap} OR a.vec_id = s.rep
)
SELECT DISTINCT id_a, id_b,
       CAST(floor(10000.0 * dot / sqrt(CAST(na * nb AS DOUBLE))) AS BIGINT) AS cos_e4
FROM pairs
WHERE dot > 0 AND dot * dot * 10000 >= {t2} * na * nb
"""


def q_simhash(spark, sf):
    from helix_spark.operators.textdedup import simhash64

    docs = _t(spark, sf, "documents")
    return simhash64(docs, bits=16)


def _sql_simhash(bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(
            f"CASE WHEN 2 * len(list_filter(ints, x -> (x >> {i}) % 2 = 1)) > len(ints)"
            f" THEN {2**i} ELSE 0 END"
        )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
), i AS (
  SELECT doc_id, list_transform(t, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS ints
  FROM toks
)
SELECT doc_id, CAST({' + '.join(terms)} AS BIGINT) AS simhash FROM i
"""


def q_minhash_lsh_pairs(spark, sf):
    from helix_spark.operators.textdedup import minhash_lsh_pairs

    docs = _t(spark, sf, "documents")
    return minhash_lsh_pairs(docs, k=8, bands=4)


def _sql_lsh_pairs(k: int = 8, bands: int = 4) -> str:
    from helix_spark.operators.textdedup import MINHASH_PERMS, MINHASH_PRIME

    comps = []
    for i in range(k):
        a, b = MINHASH_PERMS[i]
        comps.append(
            f"list_min(list_transform(shingle_ints,"
            f" x -> ((x % {MINHASH_PRIME}) * {a} + {b}) % {MINHASH_PRIME})) AS mh{i}"
        )
    rows_per_band = k // bands
    band_rows = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        concat = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(
            f"SELECT doc_id, {b} AS band,"
            f" ('0x' || substr(md5({concat}), 1, 15))::BIGINT AS bucket FROM sig"
        )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> array_to_string(t[i:i+2], ' ')) AS shingles
  FROM toks
), ints AS (
  SELECT doc_id,
         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS shingle_ints
  FROM sh
), sig AS (
  SELECT doc_id, {', '.join(comps)} FROM ints
), exploded AS (
  {' UNION ALL '.join(band_rows)}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM exploded a JOIN exploded b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


NEAR_DUP_CAP = 16


def q_near_dup_pairs(spark, sf):
    """Scale path for near-dup detection: LSH candidates → exact Jaccard
    verify on candidates only (never corpus-wide quadratic). The hot-bucket
    guard is ON (cap 16): the synthetic corpus shares boilerplate phrasing
    across documents, so some band buckets collect large near-identical
    clusters and would go quadratic uncapped — over-cap buckets emit star
    pairs to the bucket's min id instead (union-find-equivalent
    connectivity, O(bucket) output). The oracle reproduces the star rule."""
    from helix_spark.operators.textdedup import near_dup_pairs

    docs = _t(spark, sf, "documents")
    return near_dup_pairs(docs, k=8, bands=4, threshold=0.2, max_bucket_size=NEAR_DUP_CAP)


def _sql_near_dup(k: int = 8, bands: int = 4, threshold_milli: int = 200,
                  cap: int | None = None) -> str:
    from helix_spark.operators.textdedup import MINHASH_PERMS, MINHASH_PRIME

    comps = []
    for i in range(k):
        a, b = MINHASH_PERMS[i]
        comps.append(
            f"list_min(list_transform(shingle_ints,"
            f" x -> ((x % {MINHASH_PRIME}) * {a} + {b}) % {MINHASH_PRIME})) AS mh{i}"
        )
    rows_per_band = k // bands
    band_rows = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        concat = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(
            f"SELECT doc_id, {b} AS band,"
            f" ('0x' || substr(md5({concat}), 1, 15))::BIGINT AS bucket FROM sig"
        )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
), sh_arr AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> array_to_string(t[i:i+2], ' ')) AS shingles
  FROM toks
), ints AS (
  SELECT doc_id,
         list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS shingle_ints
  FROM sh_arr
), sig AS (
  SELECT doc_id, {', '.join(comps)} FROM ints
), exploded AS (
  {' UNION ALL '.join(band_rows)}
), {'''sized AS (
  SELECT band, bucket, COUNT(*) AS n, MIN(doc_id) AS rep
  FROM exploded GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM exploded a
    JOIN sized s ON s.band = a.band AND s.bucket = a.bucket AND s.n <= ''' + str(cap) + '''
    JOIN exploded b ON b.band = a.band AND b.bucket = a.bucket AND a.doc_id < b.doc_id
    UNION ALL
    SELECT s.rep AS id_a, e.doc_id AS id_b
    FROM exploded e
    JOIN sized s ON s.band = e.band AND s.bucket = e.bucket AND s.n > ''' + str(cap) + '''
    WHERE e.doc_id <> s.rep
  )
)''' if cap is not None else '''cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM exploded a JOIN exploded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)'''}, sh AS (
  SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM sh_arr
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       CAST(floor(1000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS jaccard_milli
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE floor(1000.0 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= {threshold_milli}
"""


def q_lsh_ann_topk(spark, sf):
    """Approximate NN via hyperplane-LSH bucket scan with one-flip
    multiprobe. Bucketing is integer-quantized (floor(x·100)) AND ranking
    runs on the integer-exact quantized_topk key (floor(x·10⁶) vectors) —
    the whole result incl. ranks is SQL-exact-oracled with no bitwise-
    double assumption (round-3 ADVICE); recall@10 vs brute force is
    additionally asserted in
    tests/test_similarity.py::test_lsh_ann_recall_multiprobe."""
    from helix_spark.operators.similarity import lsh_ann_topk

    emb = _assert_emb_dim(_t(spark, sf, "embeddings"))
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return lsh_ann_topk(emb.filter(F.col("vec_id") > 0), qvec, k=10, n_planes=3, multiprobe=1)


def _sql_exact_dot(a: str, b: str) -> str:
    """EXACT BIGINT dot product (list_dot_product returns DOUBLE — rounds
    above 2^53, which would break the integer rank key)."""
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i] * {b}[i])) AS BIGINT)"
    )


# integer-exact ANN rank key (quantized_topk twin): sign(dot)·(dot²·10⁴ div
# n2) over floor(x·10⁶) vectors — dot² in HUGEINT (the Spark side uses
# decimal(38,0); `div`/`//` verified bit-identical). Both engines compute
# the SAME integer, so ranks can never flip at a float boundary (round-3
# ADVICE); cos_e4 derives from the same integers through one fixed double
# expression.
_SQL_ANN_RANK = """
SELECT vec_id,
       row_number() OVER (ORDER BY
         CASE WHEN n2 = 0 THEN 0
              WHEN dot >= 0 THEN (dot::HUGEINT * dot * 10000) // greatest(n2, 1)
              ELSE -((dot::HUGEINT * dot * 10000) // greatest(n2, 1)) END DESC,
         vec_id) AS rank,
       CASE WHEN n2 = 0 THEN 0
            ELSE CAST(floor(10000.0 * dot / sqrt(CAST(n2 AS DOUBLE) * CAST(qn2 AS DOUBLE))) AS BIGINT)
       END AS cos_e4
FROM scored QUALIFY rank <= {k}
"""


def _sql_lsh_ann_topk(k: int = 10, n_planes: int = 3, quant: int = 100,
                      dim: int = EMB_ORACLE_DIM) -> str:
    """Multiprobe=1 probe set IN SQL: the query row's own integer sign-bit
    bucket plus its n_planes one-flip (xor) neighbors; ranking by the
    integer-exact quantized-cosine key (_SQL_ANN_RANK)."""
    from helix_spark.operators.similarity import quantized_planes

    qplanes = quantized_planes(dim, n_planes, quant)
    probe_cond = " OR ".join(
        ["t.bucket = qb.qbits"]
        + [f"t.bucket = xor(qb.qbits, {1 << i})" for i in range(n_planes)]
    )
    from helix_spark.operators.similarity import ANN_SCORE_QUANT

    return f"""
WITH q AS (
  SELECT {_sql_quant_list('embedding', quant)} AS qq,
         {_sql_quant_list('embedding', ANN_SCORE_QUANT)} AS qs
  FROM embeddings WHERE vec_id = 0
), qb AS (
  SELECT CAST({_sql_bucket_terms(qplanes, 'qq')} AS BIGINT) AS qbits FROM q
), tagged AS (
  SELECT vec_id, {_sql_quant_list('embedding', ANN_SCORE_QUANT)} AS vs,
         CAST({_sql_bucket_terms(qplanes, _sql_quant_list('embedding', quant))} AS BIGINT) AS bucket
  FROM embeddings WHERE vec_id > 0
), scored AS (
  SELECT t.vec_id, {_sql_exact_dot('t.vs', 'q.qs')} AS dot,
         {_sql_exact_dot('t.vs', 't.vs')} AS n2,
         {_sql_exact_dot('q.qs', 'q.qs')} AS qn2
  FROM tagged t, qb, q WHERE {probe_cond}
)
{_SQL_ANN_RANK.format(k=k)}
"""


def q_ann_quantized_exact(spark, sf):
    """EXACT corpus-wide top-k under the integer-quantized cosine rank
    (quantized_topk, floor(x·10⁶) vectors) — the deterministic scorer the
    LSH/IVF ANN paths share, exercised with no bucket pruning: the whole
    result, ranks included, is the same integer arithmetic in any engine
    (no bitwise-double assumptions — round-3 ADVICE resolution, shown
    standalone)."""
    from helix_spark.operators.similarity import quantized_topk

    emb = _assert_emb_dim(_t(spark, sf, "embeddings"))
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return quantized_topk(emb.filter(F.col("vec_id") > 0), qvec, k=10)


def _sql_ann_quantized_exact(k: int = 10) -> str:
    from helix_spark.operators.similarity import ANN_SCORE_QUANT

    qlist = _sql_quant_list("embedding", ANN_SCORE_QUANT)
    return f"""
WITH q AS (
  SELECT {qlist} AS qs FROM embeddings WHERE vec_id = 0
), base AS (
  SELECT vec_id, {qlist} AS vs FROM embeddings WHERE vec_id > 0
), scored AS (
  SELECT b.vec_id, {_sql_exact_dot('b.vs', 'q.qs')} AS dot,
         {_sql_exact_dot('b.vs', 'b.vs')} AS n2,
         {_sql_exact_dot('q.qs', 'q.qs')} AS qn2
  FROM base b, q
)
{_SQL_ANN_RANK.format(k=k)}
"""


IVF_ORACLE_K = 8
IVF_ORACLE_NPROBE = 2


def q_ivf_ann_topk(spark, sf):
    """IVF coarse-quantizer ANN (centroid-bucketed scan, the data-adaptive
    alternative to hyperplane LSH) — in the oracle-able configuration:
    fixed deterministic centroids + integer-quantized assignment and probe
    selection, so assignment/probe/scoring are all SQL-exact. The TRAINED
    path (ivf_train_centroids, iterative float k-means — no SQL twin) is
    covered by tests/test_similarity.py::test_ivf_ann_recall_and_determinism."""
    from helix_spark.operators.similarity import deterministic_centroids, ivf_ann_topk

    emb = _assert_emb_dim(_t(spark, sf, "embeddings"))
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = deterministic_centroids(EMB_ORACLE_DIM, IVF_ORACLE_K)
    return ivf_ann_topk(emb.filter(F.col("vec_id") > 0), qvec, k=10,
                        centroids=cents, nprobe=IVF_ORACLE_NPROBE, quant=100)


def _sql_ivf_ann_topk(k: int = 10, n_centroids: int = IVF_ORACLE_K,
                      nprobe: int = IVF_ORACLE_NPROBE, quant: int = 100,
                      dim: int = EMB_ORACLE_DIM) -> str:
    """Integer IVF in SQL: dist(v,c) = |v|² − 2·v·c + |c|² over quantized
    vectors and literal centroids; assignment = first index achieving the
    least distance (ties → lowest index, same as the Spark operator); the
    nprobe probe centroids are ranked by the query's integer distance."""
    import math as _m

    from helix_spark.operators.similarity import deterministic_centroids

    qcents = [
        [int(_m.floor(x * quant)) for x in c]
        for c in deterministic_centroids(dim, n_centroids)
    ]
    c2s = [sum(x * x for x in c) for c in qcents]
    cent_rows = ", ".join(
        f"({i}, [{', '.join(str(v) for v in c)}]::BIGINT[], {c2})"
        for i, (c, c2) in enumerate(zip(qcents, c2s))
    )
    dist_cols = ", ".join(
        f"n2 - 2 * list_dot_product(vq, [{', '.join(str(v) for v in c)}]::BIGINT[]) + {c2} AS d{i}"
        for i, (c, c2) in enumerate(zip(qcents, c2s))
    )
    least = "least(" + ", ".join(f"d{i}" for i in range(n_centroids)) + ")"
    assign = "CASE " + " ".join(
        f"WHEN d{i} = m THEN {i}" for i in range(n_centroids)
    ) + " END"
    from helix_spark.operators.similarity import ANN_SCORE_QUANT as _ANN_SCORE_QUANT

    return f"""
WITH q AS (
  SELECT {_sql_quant_list('embedding', quant)} AS qq,
         {_sql_quant_list('embedding', _ANN_SCORE_QUANT)} AS qs
  FROM embeddings WHERE vec_id = 0
), cents AS (
  SELECT * FROM (VALUES {cent_rows}) AS t(i, c, c2)
), probes AS (
  SELECT i FROM cents, q
  ORDER BY list_dot_product(qq, qq) - 2 * list_dot_product(qq, c) + c2, i
  LIMIT {nprobe}
), base AS (
  SELECT vec_id, {_sql_quant_list('embedding', quant)} AS vq,
         {_sql_quant_list('embedding', _ANN_SCORE_QUANT)} AS vs
  FROM embeddings WHERE vec_id > 0
), dists AS (
  SELECT vec_id, vs, {dist_cols}
  FROM (SELECT vec_id, vq, vs, list_dot_product(vq, vq) AS n2 FROM base)
), assigned AS (
  SELECT vec_id, vs, {assign} AS c FROM (SELECT *, {least} AS m FROM dists)
), scored AS (
  SELECT a.vec_id, {_sql_exact_dot('a.vs', 'q.qs')} AS dot,
         {_sql_exact_dot('a.vs', 'a.vs')} AS n2,
         {_sql_exact_dot('q.qs', 'q.qs')} AS qn2
  FROM assigned a, q WHERE a.c IN (SELECT i FROM probes)
)
{_SQL_ANN_RANK.format(k=k)}
"""


def q_near_dup_components(spark, sf):
    """The union-find CONSUMER of the near-dup pipeline: connected
    components over the verified near-dup pairs. Every document gets
    component_id = the smallest doc id reachable through near-dup pairs
    (singletons are their own component) — the key a keep-one-per-cluster
    dedup pass deletes against. The hot-bucket star rule doubles as a
    convergence guarantee: star candidates keep cluster diameters small,
    so the min-label propagation fixpoints in a few rounds."""
    from helix_spark.operators.textdedup import connected_components, near_dup_pairs

    docs = _t(spark, sf, "documents")
    pairs = near_dup_pairs(docs, k=8, bands=4, threshold=0.2,
                           max_bucket_size=NEAR_DUP_CAP)
    return connected_components(pairs, docs.select("doc_id"))


def _sql_near_dup_components(cap: int = NEAR_DUP_CAP) -> str:
    """Exact SQL twin: transitive closure via a recursive CTE over the
    symmetrized near-dup pair set, component = min reachable node."""
    inner = _sql_near_dup(cap=cap)
    return f"""
WITH RECURSIVE pairs AS ({inner}),
sym(a, b) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
)
SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component FROM reach GROUP BY node
"""


def q_simhash_near_dup(spark, sf):
    """SimHash-Hamming near-dup pairs: band-bucket candidates + exact
    bit_count(xor) verify, with the identical-signature COLLAPSE guard on
    (the default): one representative per distinct simhash + hamming-0 star
    pairs for its members, cross pairs at rep level only — component
    structure identical to all-pairs, Θ(cluster) instead of Θ(cluster²) on
    duplicate-heavy corpora. With bands > max_hamming the pigeonhole makes
    the rep-level pair set EXACTLY the within-radius cluster adjacency
    (see operators/textdedup.simhash_near_dup_pairs). The oracle reproduces
    the collapse rule, so the skew-guard semantics are themselves pinned.
    bits=16 here (not the production default 60) keeps the oracle's 2^i
    term list readable AND makes sf0.01 actually exercise the collapse
    (many duplicate signatures)."""
    from helix_spark.operators.textdedup import simhash_near_dup_pairs

    docs = _t(spark, sf, "documents")
    return simhash_near_dup_pairs(docs, bits=16, bands=4, max_hamming=3,
                                  collapse_identical=True)


def _sql_simhash_near_dup(bits: int = 16, bands: int = 4,
                          max_hamming: int = 3) -> str:
    """Collapse-rule twin: group by signature → min-id rep; hamming-0
    within-group stars ∪ rep-level band-bucket pairs within the radius."""
    inner = _sql_simhash(bits)
    width = bits // bands
    mask = (1 << width) - 1
    slice_sel = " UNION ALL ".join(
        f"SELECT rep, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS slice FROM reps"
        for b in range(bands)
    )
    return f"""
WITH sig AS ({inner}),
grp AS (SELECT simhash, MIN(doc_id) AS rep, COUNT(*) AS n FROM sig GROUP BY simhash),
within AS (
  SELECT g.rep AS id_a, s.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
  FROM sig s JOIN grp g ON g.simhash = s.simhash
  WHERE s.doc_id <> g.rep
),
reps AS (SELECT simhash, rep FROM grp),
ex AS ({slice_sel}),
cross_pairs AS (
  SELECT DISTINCT a.rep AS id_a, b.rep AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM ex a JOIN ex b ON a.band = b.band AND a.slice = b.slice AND a.rep < b.rep
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
)
SELECT id_a, id_b, hamming FROM cross_pairs
UNION ALL
SELECT id_a, id_b, hamming FROM within
"""



# portable (Java regex == RE2) PII patterns: no lookaround, no backrefs
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE_RE = r"\+1-555-\d{4}"


def q_pii_redact(spark, sf):
    """Training-data PII scrubbing: synthesize log lines carrying an email,
    an IPv4, and a phone number from event columns (the battery's standard
    trick for exercising string kernels on deterministic data), then redact
    all three with global regexp_replace and count what was removed. The
    patterns are lookaround-free so Java regex and RE2 agree."""
    ev = _t_spread(spark, sf, "events")
    text = F.concat(
        F.lit("user"), F.col("user_id").cast("string"),
        F.lit(" <u"), F.col("user_id").cast("string"),
        F.lit("@mail"), (F.col("event_id") % 20).cast("string"),
        F.lit(".example.com> logged in from 10."),
        (F.col("user_id") % 256).cast("string"), F.lit("."),
        (F.col("event_id") % 256).cast("string"), F.lit("."),
        (F.abs(F.col("value")) % 256).cast("string"),
        F.lit(" callback +1-555-"),
        F.lpad((F.col("event_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PII_IPV4_RE), F.lit("<IP>"),
        ),
        F.lit(PII_PHONE_RE), F.lit("<PHONE>"),
    )
    return ev.select(
        "event_id",
        redacted.alias("clean_text"),
        F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
    )


def _sql_pii_redact() -> str:
    return f"""
WITH raw AS (
  SELECT event_id,
         'user' || user_id || ' <u' || user_id || '@mail' || (event_id % 20) ||
         '.example.com> logged in from 10.' || (user_id % 256) || '.' ||
         (event_id % 256) || '.' || (abs(value) % 256) ||
         ' callback +1-555-' || lpad((event_id % 10000)::VARCHAR, 4, '0') AS text
  FROM events
)
SELECT event_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
         '{PII_IPV4_RE}', '<IP>', 'g'),
         '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_IPV4_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones
FROM raw
"""



def q_dedup_keep_best(spark, sf):
    """END-TO-END dedup decision: near-dup pairs → connected components →
    keep the highest-quality document per component (quality_milli desc,
    doc_id asc tiebreak). This is the row a 100 TB dedup pass actually
    writes: every document tagged with its cluster and whether it survives."""
    from helix_spark.functions.text import quality_score_milli_col
    from helix_spark.operators.textdedup import connected_components, near_dup_pairs

    docs = _t(spark, sf, "documents")
    pairs = near_dup_pairs(docs, k=8, bands=4, threshold=0.2,
                           max_bucket_size=NEAR_DUP_CAP)
    comp = connected_components(pairs, docs.select("doc_id"))
    scored = docs.select(
        "doc_id", quality_score_milli_col(F.col("text")).alias("quality_milli")
    )
    joined = comp.join(scored, on="doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("quality_milli").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "component", "quality_milli",
                (F.col("rk") == 1).alias("is_keeper"))
    )


def _sql_dedup_keep_best(cap: int = NEAR_DUP_CAP) -> str:
    pairs = _sql_near_dup(cap=cap)
    quality = SQL_QUALITY_SCORE
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
sym(a, b) AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component FROM reach GROUP BY node),
q AS ({quality})
SELECT c.doc_id, c.component, q.quality_milli,
       row_number() OVER (PARTITION BY c.component
                          ORDER BY q.quality_milli DESC, c.doc_id) = 1 AS is_keeper
FROM comp c JOIN q ON q.doc_id = c.doc_id
"""



def q_image_decode_stats(spark, sf):
    """Multimodal plumbing on generated payloads (testdata has no images
    table): decode 48 deterministic images, recompute phash — rows-only."""
    from helix_spark.operators.multimodal import decode_stats
    from helix_spark.sources.synthetic import gen_images_spark

    return decode_stats(gen_images_spark(spark, 48))


def q_payload_verify(spark, sf):
    """input_hint payload invariant demo (PNG byte-exact / lossy PSNR≥40 /
    caption equality) on generated payloads — rows-only."""
    from helix_spark.operators.multimodal import verify_payloads
    from helix_spark.sources.synthetic import gen_images_spark

    imgs = gen_images_spark(spark, 32).localCheckpoint()
    return verify_payloads(imgs, imgs)


# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "seen_anti_join": q_seen_anti_join,
    "first_wins_dedup": q_first_wins_dedup,
    "per_host_topk": q_per_host_topk,
    "status_class_agg": q_status_class_agg,
    "broken_range_filter": q_broken_range_filter,
    "union_dedup": q_union_dedup,
    "content_type_classify": q_content_type_classify,
    "url_canonicalize": q_url_canonicalize,
    "host_budget_agg": q_host_budget_agg,
    "except_anti": q_except_anti,
    "topk_revenue_join": q_topk_revenue_join,
    "region_rollup_join": q_region_rollup_join,
    "sessionize": q_sessionize,
    "windowed_counts": q_windowed_counts,
    "json_extract": q_json_extract,
    "exact_dedup": q_exact_dedup,
    "doc_fingerprint": q_doc_fingerprint,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "minhash_signature": q_minhash_signature,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_topk": q_embedding_topk,
    "embedding_label_stats": q_embedding_label_centroid_dist,
    "embedding_near_dup": q_embedding_near_dup,
    "simhash": q_simhash,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "near_dup_pairs": q_near_dup_pairs,
    "near_dup_components": q_near_dup_components,
    "simhash_near_dup": q_simhash_near_dup,
    "pii_redact": q_pii_redact,
    "dedup_keep_best": q_dedup_keep_best,
    "lsh_ann_topk": q_lsh_ann_topk,
    "ann_quantized_exact": q_ann_quantized_exact,
    "ivf_ann_topk": q_ivf_ann_topk,
    "image_decode_stats": q_image_decode_stats,
    "payload_verify": q_payload_verify,
}

ORACLE: dict[str, str] = {
    "seen_anti_join": SQL_SEEN_ANTI_JOIN,
    "first_wins_dedup": SQL_FIRST_WINS,
    "per_host_topk": SQL_PER_HOST_TOPK,
    "status_class_agg": SQL_STATUS_CLASS_AGG,
    "broken_range_filter": SQL_BROKEN_RANGE,
    "union_dedup": SQL_UNION_DEDUP,
    "content_type_classify": _sql_ctype_case(),
    "url_canonicalize": SQL_URL_CANONICALIZE,
    "host_budget_agg": SQL_HOST_BUDGET,
    "except_anti": SQL_EXCEPT_ANTI,
    "topk_revenue_join": SQL_TOPK_REVENUE,
    "region_rollup_join": SQL_REGION_ROLLUP,
    "sessionize": SQL_SESSIONIZE,
    "windowed_counts": SQL_WINDOWED_COUNTS,
    "json_extract": SQL_JSON_EXTRACT,
    "exact_dedup": SQL_EXACT_DEDUP,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "token_count": SQL_TOKEN_COUNT,
    "quality_score": SQL_QUALITY_SCORE,
    "lang_id": _sql_lang_id(),
    "minhash_signature": _sql_minhash(),
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "embedding_topk": SQL_EMBEDDING_TOPK,
    "embedding_label_stats": SQL_EMB_LABEL_STATS,
    "embedding_near_dup": _sql_embedding_near_dup(),
    "simhash": _sql_simhash(),
    "minhash_lsh_pairs": _sql_lsh_pairs(),
    "near_dup_pairs": _sql_near_dup(cap=NEAR_DUP_CAP),
    "near_dup_components": _sql_near_dup_components(),
    "simhash_near_dup": _sql_simhash_near_dup(),
    "pii_redact": _sql_pii_redact(),
    "dedup_keep_best": _sql_dedup_keep_best(),
    "lsh_ann_topk": _sql_lsh_ann_topk(),
    "ann_quantized_exact": _sql_ann_quantized_exact(),
    "ivf_ann_topk": _sql_ivf_ann_topk(),
    # image_decode_stats / payload_verify oracles are VALUES literals
    # computed from the seed-deterministic generator + Python codec twin —
    # see build_oracles() (kept lazy: ~0.8 s of driver-side image encoding
    # that bench.py's import path shouldn't pay). The ANN queries are
    # exact-oracled via integer-quantized bucketing/assignment
    # (floor(x·quant) int64 arithmetic on both engines).
}


def _sql_values(rows: list[tuple], cols: list[str]) -> str:
    """Render rows as a DuckDB VALUES literal (the same pinned-literal trick
    the ANN oracles use for centroid/plane constants)."""

    def lit(v):
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, float):
            # bare 99.0 would parse as DECIMAL(3,1) in DuckDB; force DOUBLE
            return f"CAST({v!r} AS DOUBLE)"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    body = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES {body}) AS t({', '.join(cols)})"


def _sql_image_decode_stats(n: int = 48) -> str:
    """Oracle for q_image_decode_stats: the generator (sources/synthetic.py
    gen_image_row) is a pure function of k, so the expected decode stats are
    computed once driver-side with the *Python* codec twin (the same code the
    executors run) and pinned as a VALUES literal."""
    import numpy as np

    from helix_spark.sources import codecs
    from helix_spark.sources.synthetic import gen_image_row

    luma_w = np.array([0.299, 0.587, 0.114])
    rows = []
    for k in range(n):
        r = gen_image_row(k)
        p = codecs.decode_image(r["bytes"], r["fmt"])
        rows.append((
            r["image_id"], int(p.shape[1]), int(p.shape[0]),
            int(float(np.mean(p @ luma_w)) * 1000),
            bool(codecs.phash64(p) == r["phash"]),
        ))
    return _sql_values(rows, ["image_id", "dec_w", "dec_h", "mean_luma_milli", "phash_match"])


def _sql_payload_verify(n: int = 32) -> str:
    """Oracle for q_payload_verify (self-vs-self invariant run): expected
    (pixels_ok, psnr_db, caption_ok) per image, computed driver-side with
    the identical Python decode/psnr code the executors run."""
    import numpy as np

    from helix_spark.sources import codecs
    from helix_spark.sources.synthetic import gen_image_row

    rows = []
    for k in range(n):
        r = gen_image_row(k)
        px = codecs.decode_image(r["bytes"], r["fmt"])
        if r["fmt"] == "png":
            ok = bool(np.array_equal(px, px))
            p = float("inf") if ok else codecs.psnr(px, px)
        else:
            p = codecs.psnr(px, px)
            ok = p >= 40.0
        rows.append((r["image_id"], ok, min(p, 99.0), True))
    return _sql_values(rows, ["image_id", "pixels_ok", "psnr_db", "caption_ok"])


def build_oracles() -> dict[str, str]:
    """Full oracle map: the static SQL twins plus the two generated-payload
    VALUES-literal oracles (computed on demand)."""
    d = dict(ORACLE)
    d["image_decode_stats"] = _sql_image_decode_stats()
    d["payload_verify"] = _sql_payload_verify()
    return d
