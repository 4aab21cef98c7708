"""Relational-breadth tier: pivot/unpivot, explode, higher-order array
functions, map functions, regexp/math scalar packs, multi-join TPC-H
shapes (Q3/Q5), decorrelated scalar-subquery (Q17 shape), and a
deterministic hash sample.

These widen the engine surface beyond SURVEY.md §2C's minimum: the
reference's map-entry prefix filter (SURVEY.md §2A row 21,
Test_census_tract.py:92) appears here as a *data-level* map_filter;
everything else is the relational algebra a warehouse user expects.

Determinism discipline as in queries.py: integer aggregation (cents),
single post-agg double division, total orderings with unique tiebreaks,
identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clean_census_acs_data_spark.functions import cents, as_long
from clean_census_acs_data_spark.io import load_table
from clean_census_acs_data_spark.queries import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# pivot / unpivot
# ---------------------------------------------------------------------------


@register(
    "pivot_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS cents_f,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS cents_o,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS cents_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit value list (no extra job to
    discover pivot values — at 100 TB value discovery is a full scan,
    so pinning values matters). Compiles to one hash aggregate with
    conditional expressions; shuffle carries |priorities| rows."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)).alias("cents"),
        )
    )
    return piv.select(
        "o_orderpriority",
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
        F.col("P_n").alias("n_p"),
        F.col("F_cents").alias("cents_f"),
        F.col("O_cents").alias("cents_o"),
        F.col("P_cents").alias("cents_p"),
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS BIGINT) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice_cents' AS measure,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS value
    FROM part
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→tall unpivot (melt) of the part measures. Spark plans a
    single Expand node — one pass, rows×measures output, no shuffle,
    no self-union scan duplication (the oracle's UNION ALL form scans
    twice; unpivot scans once — strictly better at scale)."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        cents("p_retailprice").alias("retailprice_cents"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "retailprice_cents"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# explode / posexplode (lateral flatten)
# ---------------------------------------------------------------------------


@register(
    "explode_tokens",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id % 53 = 0
    )
    SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, t[u.i] AS token
    FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the token array — the generator/UDTF shape (one
    input row → N output rows) used by every shingling/tokenizing
    pipeline stage. Narrow op: each partition explodes locally, no
    shuffle; output size is bounded upstream by the pushed-down
    doc_id filter."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 53 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 user-defined table function)
# ---------------------------------------------------------------------------


@register(
    "udtf_tokenize",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id % 53 = 0
    )
    SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, t[u.i] AS token
    FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tokenization as explode_tokens, but through a Python
    UDTF + LATERAL join — Spark 4's user-defined table function API
    (SURVEY.md §2B UDF/UDAF/UDTF row). Produces identical results to
    the built-in explode; kept alongside it deliberately: UDTFs are
    row-at-a-time Python (the slow path — use them only for generators
    that built-ins can't express, e.g. calling an external library per
    row), and having both lets the bench quantify that gap."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield i, t

    spark.udtf.register("udtf_tokenize_fn", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM __udtf_docs d, LATERAL udtf_tokenize_fn(d.text) t
        WHERE d.doc_id % 53 = 0
        """
    )


# ---------------------------------------------------------------------------
# higher-order array functions
# ---------------------------------------------------------------------------


@register(
    "array_higher_order",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(list_filter(q, x -> x > 0)) AS BIGINT)        AS n_pos,
           CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS sum_sq,
           CAST(list_sum(list_transform(range(1, len(q) + 1),
                j -> q[j] * q[len(q) - j + 1])) AS BIGINT)          AS dot_reversed,
           list_max(q)                                              AS max_q
    FROM e
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array kernel: transform (quantize), filter (count
    positives), aggregate (sum of squares), zip_with against the
    reversed array (dot product), array_max. All JVM-side expressions —
    the vector math stays inside codegen, no Python, no UDF.

    Scale bound: e6-quantized components |q| ≤ 1e6·max|x| (~2e6 here); per-row dot/norm sums are ≤ dim·max(q)² — a per-VECTOR bound (~2.3e6 dims at |x| ≤ 2 before int64 wraps), independent of row count."""
    e = _t(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    qc = F.col("q")
    return (
        e.select("vec_id", q.alias("q"))
        .select(
            "vec_id",
            F.size(F.filter(qc, lambda x: x > 0)).cast("long").alias("n_pos"),
            F.aggregate(
                qc, F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).alias("sum_sq"),
            F.aggregate(
                F.zip_with(qc, F.reverse(qc), lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_reversed"),
            F.array_max(qc).alias("max_q"),
        )
    )


# ---------------------------------------------------------------------------
# map functions — the reference's x-ratelimit header filter as a data op
# ---------------------------------------------------------------------------


@register(
    "map_prefix_filter",
    oracle="""
    WITH hdrs AS (
      SELECT o_orderkey, k, v FROM (
        SELECT o_orderkey, 'x-ratelimit-remaining' AS k,
               CAST(o_orderkey % 100 AS VARCHAR) AS v FROM orders
        UNION ALL
        SELECT o_orderkey, 'X-RateLimit-Limit' AS k, '500' AS v FROM orders
        UNION ALL
        SELECT o_orderkey, 'server' AS k, 'census' AS v FROM orders
        UNION ALL
        SELECT o_orderkey, 'content-type' AS k, 'application/json' AS v FROM orders
      )
    )
    SELECT o_orderkey, k AS header_key, v AS header_value
    FROM hdrs
    WHERE lower(k) LIKE 'x-ratelimit%'
    """,
)
def map_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's response-header prefix filter
    (Test_census_tract.py:92, SURVEY.md §2A row 21) as a data-level
    map op: build a header map per row, F.map_filter on
    lower(key).startswith('x-ratelimit'), explode surviving entries.
    Map construction + filter + explode are all row-local codegen."""
    o = _t(spark, sf_dir, "orders")
    hdrs = F.create_map(
        F.lit("x-ratelimit-remaining"), (F.col("o_orderkey") % 100).cast("string"),
        F.lit("X-RateLimit-Limit"), F.lit("500"),
        F.lit("server"), F.lit("census"),
        F.lit("content-type"), F.lit("application/json"),
    )
    kept = F.map_filter(hdrs, lambda k, _: F.lower(k).startswith("x-ratelimit"))
    return o.select(
        "o_orderkey", F.explode(kept).alias("header_key", "header_value")
    )


# ---------------------------------------------------------------------------
# regexp scalar pack
# ---------------------------------------------------------------------------


@register(
    "regexp_scalars",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                       AS first_word,
           CAST(len(regexp_extract_all(text, 'e')) AS BIGINT)        AS n_e,
           regexp_replace(text, ' ', '_', 'g')                       AS underscored,
           (text LIKE '%data%')                                      AS has_data,
           CAST(regexp_matches(text, '^[a-z]') AS BOOLEAN)           AS starts_alpha
    FROM documents WHERE doc_id % 29 = 0
    """,
)
def regexp_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar pack: extract / count / replace-all / LIKE /
    anchored match. All compile to JVM regex inside codegen (patterns
    are literals → compiled once per task, not per row)."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 29 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit("e")).cast("long").alias("n_e"),
        F.regexp_replace("text", " ", "_").alias("underscored"),
        F.col("text").like("%data%").alias("has_data"),
        F.col("text").rlike("^[a-z]").alias("starts_alpha"),
    )


# ---------------------------------------------------------------------------
# math scalar pack
# ---------------------------------------------------------------------------


@register(
    "math_scalars",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05)                            AS abs_disc_delta,
           CAST(FLOOR(l_extendedprice) AS BIGINT)            AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT)             AS price_ceil,
           CAST(ROUND(l_tax * 100) AS BIGINT)                AS tax_pct,
           SQRT(l_quantity)                                  AS qty_sqrt,
           CAST(l_orderkey % 7 AS BIGINT)                    AS key_mod7,
           CAST(SIGN(l_quantity - 25) AS DOUBLE)             AS qty_sign,
           GREATEST(l_discount, l_tax)                       AS max_rate,
           LEAST(l_discount, l_tax)                          AS min_rate
    FROM lineitem WHERE l_orderkey % 31 = 0
    """,
)
def math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar pack over IEEE-exact operations only (abs, floor,
    ceil, round, sqrt — correctly rounded per IEEE-754 —, mod, sign,
    greatest/least). Transcendentals (ln/exp/pow) are deliberately
    excluded from oracle checks: libm results differ across engines."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 31 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        F.signum(F.col("l_quantity") - 25).alias("qty_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: multi-join + agg + top-k
# ---------------------------------------------------------------------------


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dim-side filter → fact join → agg → top-k.
    The segment filter cuts customer ~5× before the join; both filters
    push to the scans. Final top-10 is TakeOrderedAndProject (k-row
    heap per partition) — no global sort. At 100 TB, AQE picks
    broadcast for the filtered customer side if it fits, else
    shuffle-hash; the plan needs no hints to stay sane."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(F.round(rev * 100).cast("long")).alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way join
# ---------------------------------------------------------------------------


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: 6-way join where only lineitem⋈orders is fact-fact;
    supplier/nation/region are broadcast so the big probe side never
    shuffles for them. The region filter transitively prunes nation
    and supplier *before* broadcast (Catalyst pushes it through the
    join graph). One shuffle total (orders⋈lineitem), then a 25-group
    agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.round(rev * 100).cast("long")).alias("revenue_cents"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: decorrelated scalar subquery
# ---------------------------------------------------------------------------


@register(
    "scalar_subquery_smallqty",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS qty_sum,
             COUNT(*) AS qty_cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem JOIN pa USING (l_partkey)
    WHERE 5 * CAST(l_quantity AS BIGINT) * qty_cnt < qty_sum
    """,
)
def scalar_subquery_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: per-part average as a decorrelated aggregate joined
    back to the fact — the manual form of `qty < 0.2 * (SELECT AVG ...)`.
    The predicate is pure integer arithmetic (5·qty·cnt < sum ⇔
    qty < 0.2·avg) so both engines agree bit-exactly with no double
    division. At scale: the aggregate side shrinks to |parts| rows
    before the join; same shuffle key (l_partkey) on both sides means
    AQE can reuse the exchange."""
    li = _t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        F.sum(as_long("l_quantity")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    joined = li.join(pa, "l_partkey")
    small = joined.where(
        F.lit(5) * as_long("l_quantity") * F.col("qty_cnt") < F.col("qty_sum")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.sum(cents("l_extendedprice")).alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# checksum / digest functions
# ---------------------------------------------------------------------------


@register(
    "checksum_functions",
    oracle="""
    SELECT doc_id,
           md5(text)    AS text_md5,
           sha256(text) AS text_sha256,
           md5(CAST(doc_id AS VARCHAR) || '|' || text) AS keyed_md5
    FROM documents WHERE doc_id % 43 = 0
    """,
)
def checksum_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest pack (md5/sha-256 + a keyed digest) — content addressing,
    integrity checks, and the portable hash layer every dedup/sampling
    op here builds on. (xxhash64 is the faster JVM-side choice in a
    pure-Spark deployment; md5/sha are what cross-engine contracts can
    check.)"""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 43 == 0)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))).alias(
            "keyed_md5"
        ),
    )


# ---------------------------------------------------------------------------
# fuzzy matching: Levenshtein pairs within blocks
# ---------------------------------------------------------------------------


@register(
    "fuzzy_match_levenshtein",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, substring(text, 1, 40) AS prefix
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_distance
    FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 15
    """,
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching within a blocking key — the
    record-linkage primitive for noisy near-duplicates that token-set
    methods miss (transpositions, typos). Levenshtein is O(m·n) per
    pair, so the discipline is everything around it: block first
    (source), compare bounded prefixes (40 chars), and at scale put a
    cheap filter (length delta, shared-shingle count) before the DP.
    """
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0).select(
        "doc_id", "source", F.substring("text", 1, 40).alias("prefix")
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(b, (F.col("a.source") == F.col("b.source")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(dist <= 15)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_distance"),
        )
    )


# ---------------------------------------------------------------------------
# latest-record-per-key compaction (SCD-1 / CDC upsert shape)
# ---------------------------------------------------------------------------


@register(
    "latest_by_key",
    oracle="""
    SELECT user_id, event_type,
           arg_max(event_id, ts::VARCHAR || '#' || lpad(event_id::VARCHAR, 12, '0'))
             AS latest_event_id,
           MAX(ts) AS latest_ts,
           COUNT(*) AS n_versions
    FROM events
    GROUP BY user_id, event_type
    """,
)
def latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction — the CDC/upsert "newest version
    wins" shape every snapshot pipeline needs. One aggregation with an
    arg-max on (ts, unique id) rather than a window + filter: a single
    shuffle of |keys| rows after partial aggregation, vs the window
    form's full-data shuffle + sort. The comparand string makes the
    (ts, event_id) ordering total, so ties are deterministic."""
    e = _t(spark, sf_dir, "events")
    # lexicographic (ts, zero-padded id) == chronological with unique tiebreak
    comparand = F.concat_ws(
        "#",
        F.col("ts").cast("string"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return e.groupBy("user_id", "event_type").agg(
        F.max_by("event_id", comparand).alias("latest_event_id"),
        F.max("ts").alias("latest_ts"),
        F.count(F.lit(1)).alias("n_versions"),
    )


# ---------------------------------------------------------------------------
# outer joins + null-safe equality
# ---------------------------------------------------------------------------


@register(
    "full_outer_join",
    oracle="""
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey
    ),
    urgent AS (
      SELECT o_custkey, COUNT(*) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    )
    SELECT COALESCE(big.o_custkey, urgent.o_custkey) AS custkey,
           COALESCE(n_big, 0)    AS n_big,
           COALESCE(n_urgent, 0) AS n_urgent,
           (big.o_custkey IS NULL)    AS only_urgent,
           (urgent.o_custkey IS NULL) AS only_big
    FROM big FULL OUTER JOIN urgent ON big.o_custkey = urgent.o_custkey
    """,
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated views with COALESCE'd keys and
    per-side presence flags — the reconciliation shape (which customers
    appear in exactly one snapshot). Outer joins can't broadcast the
    nullable side; Spark plans sort-merge with both sides shuffled on
    the key — at 100 TB pre-bucketing both snapshots by key removes
    those shuffles (tests/test_bucketing.py)."""
    o = _t(spark, sf_dir, "orders")
    big = (
        o.where(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
        .alias("big")
    )
    urgent = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
        .alias("urgent")
    )
    j = big.join(urgent, F.col("big.o_custkey") == F.col("urgent.o_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("big.o_custkey"), F.col("urgent.o_custkey")).alias("custkey"),
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
        F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
        F.col("big.o_custkey").isNull().alias("only_urgent"),
        F.col("urgent.o_custkey").isNull().alias("only_big"),
    )


@register(
    "nullsafe_equality",
    oracle="""
    WITH probe AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS seg
      FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b, a.seg
    FROM probe a JOIN probe b
      ON a.seg IS NOT DISTINCT FROM b.seg
     AND a.c_custkey + 1 = b.c_custkey
    """,
)
def nullsafe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) as a join key:
    NULL matches NULL, so rows with missing segments still pair with
    their successor when both are NULL — plain = would silently drop
    them (the classic missing-data join bug). Planned as a normal
    hash-joinable equality (null-safe keys hash like values)."""
    c = _t(spark, sf_dir, "customer")
    probe = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    a, b = probe.alias("a"), probe.alias("b")
    return (
        a.join(
            b,
            F.col("a.seg").eqNullSafe(F.col("b.seg"))
            & (F.col("a.c_custkey") + 1 == F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.seg").alias("seg"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic hash sampling (training-pipeline op)
# ---------------------------------------------------------------------------


@register(
    "stratified_split",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
               AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM assigned
    GROUP BY lang, CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END
    """,
)
def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content
    hash — stable across runs, engines, partitioning, and re-ingestion
    (df.sample() is none of those). Per-language counts verify the
    split is balanced within strata. Row-local assignment, one
    aggregation shuffle."""
    from clean_census_acs_data_spark.operators.text import md5_long

    d = _t(spark, sf_dir, "documents")
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "hash_sample",
    oracle="""
    SELECT doc_id, text
    FROM documents
    WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0
    """,
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash — unlike
    df.sample(), reproducible across engines, runs, and partitioning
    (the property a training pipeline needs for held-out splits).
    Row-local predicate → embarrassingly parallel."""
    from clean_census_acs_data_spark.operators.text import md5_long

    d = _t(spark, sf_dir, "documents")
    return d.where(md5_long(F.col("doc_id").cast("string")) % 10 == 0).select(
        "doc_id", "text"
    )
