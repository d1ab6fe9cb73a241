"""Relational + KCVS-surface queries (SURVEY §2.1/§2.2) with DuckDB oracles.

Each query exercises a reference operator (cited) as a declarative Spark
plan. Conventions for oracle hash-stability:
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded identically on both sides;
- window orderings always carry a unique tiebreaker column.

All literals (custkey 42, orderkeys 0-4, ...) exist at every scale factor
(keys are 0-based and dense; see FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import kcvs
from ..sources import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# KCVS operator surface (SURVEY §2.1 ops #1,#2,#5,#6,#7)
# ---------------------------------------------------------------------------

@query(
    "q01_slice_point",
    oracle="""
    SELECT l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_orderkey = 7 AND l_linenumber >= 1 AND l_linenumber < 6
    ORDER BY l_linenumber
    LIMIT 4
    """,
)
def q01_slice_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getSlice #1 (ClickhouseKeyColumnValueStore.java:78-95): point row
    lookup + half-open column range + sort + limit → TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    return kcvs.slice_query(
        li, key_col="l_orderkey", col_col="l_linenumber", key=7,
        col_start=1, col_end=6, limit=4,
        projection=["l_linenumber", "l_partkey", "l_suppkey", "l_quantity"],
    )


@query(
    "q02_slice_multikey",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey) AS rn
      FROM lineitem
      WHERE l_orderkey IN (0, 1, 2, 3, 4)
    ) WHERE rn <= 2
    """,
)
def q02_slice_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getSlice #2 (ClickhouseKeyColumnValueStore.java:108-112): the
    reference loops keys sequentially (multiQuery=false); here one scan +
    per-key window top-K."""
    li = _t(spark, sf_dir, "lineitem")
    # THE operator COVERAGE.md maps this query to (was an inline fork
    # until r7; order_extra carries the l_partkey tiebreak)
    return kcvs.multi_key_slice(
        li, key_col="l_orderkey", col_col="l_linenumber",
        keys=[0, 1, 2, 3, 4], limit_per_key=2,
        projection=["l_orderkey", "l_linenumber", "l_partkey",
                    "l_quantity"],
        order_extra=["l_partkey"])


@query(
    "q03_key_range_scan",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_custkey >= 10 AND o_custkey < 60
    ORDER BY o_custkey
    """,
)
def q03_key_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getKeys #5 (KEY_QUERY, QueryHelper.java:65): ordered distinct keys in
    range; the reference's eager materialization + N+1 slices collapse into
    one distributed scan."""
    return kcvs.key_range_scan(_t(spark, sf_dir, "orders"),
                               key_col="o_custkey", key_start=10, key_end=60)


@query(
    "q04_multi_range_scan",
    oracle="""
    SELECT l_returnflag,
           count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE (l_quantity >= 1 AND l_quantity < 10)
       OR (l_quantity >= 40 AND l_quantity < 50)
    GROUP BY l_returnflag
    """,
)
def q04_multi_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getKeys(MultiSlicesQuery) #7 — UnsupportedOperationException in the
    reference (ClickhouseKeyColumnValueStore.java:218-220); here one scan
    with OR'd range predicates pushed to parquet."""
    li = _t(spark, sf_dir, "lineitem")
    scanned = kcvs.multi_range_scan(li, "l_quantity", [(1, 10), (40, 50)])
    return (scanned.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_price")))


@query(
    "q05_unordered_scan_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q05_unordered_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getKeys(unordered) #6 — unsupported in the reference
    (ClickhouseKeyColumnValueStore.java:213-215) — plus order().by().limit():
    full scan + global top-K (TakeOrderedAndProject, no total sort)."""
    o = _t(spark, sf_dir, "orders")
    return kcvs.top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        order_cols=[F.col("o_totalprice").desc(), F.col("o_orderkey")], k=10)


# ---------------------------------------------------------------------------
# Aggregation / grouping (Gremlin group()/groupCount()/fold() surface, §2.3)
# ---------------------------------------------------------------------------

@query(
    "q06_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 6)                                   AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q06_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: hash aggregate with automatic
    partial/final combine (the map-side combine the reference cannot do)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@query(
    "q07_group_count",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
    FROM orders GROUP BY o_orderpriority, o_orderstatus
    """,
)
def q07_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin groupCount() (client-side in the reference system; SURVEY
    §2.3) → one hash aggregate."""
    return (_t(spark, sf_dir, "orders")
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt")))


# ---------------------------------------------------------------------------
# Joins = adjacency expansion (out()/in() traversals, §2.3)
# ---------------------------------------------------------------------------

@query(
    "q08_customer_top_parts",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS spend,
           sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE c.c_custkey = 42
    GROUP BY p.p_partkey, p.p_name
    ORDER BY spend DESC, p_partkey
    LIMIT 10
    """,
)
def q08_customer_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (SURVEY §7 M1): g.V(cust).out('placed').out('contains') —
    point lookup (ref op #1) + two adjacency joins + agg + top-K.  The
    customer filter is pushed below the joins; `part` is broadcast."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    spend = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (F.broadcast(c)
            .join(o, c.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_partkey", "p_name")
            .agg(F.round(F.sum(spend), 2).alias("spend"),
                 F.sum("l_quantity").alias("total_qty"))
            .orderBy(F.col("spend").desc(), F.col("p_partkey"))
            .limit(10))


@query(
    "q09_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 40000)
    """,
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin where(out(...)) → left-semi join (SURVEY §2.3 adjacency
    row): customers having at least one order over 40000."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 40000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_name"))


@query(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin not(out(...)) → left-anti join: customers with no finished
    order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name"))


@query(
    "q11_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q11_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → two shuffles max; the
    customer side is broadcast after the segment filter."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (F.broadcast(c)
            .join(o, c.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(rev), 2).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


@query(
    "q12_region_revenue",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q12_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-hop: 5 joins; all dimension sides broadcast so
    the only shuffles are the orders↔lineitem equi-join and the final agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (c.join(o, c.c_custkey == o.o_custkey)
             .join(li, o.o_orderkey == li.l_orderkey)
             .join(F.broadcast(s), (s.s_suppkey == li.l_suppkey)
                   & (s.s_nationkey == c.c_nationkey))
             .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
             .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
             .groupBy("n_name")
             .agg(F.round(F.sum(rev), 2).alias("revenue")))


# ---------------------------------------------------------------------------
# Predicate library / dedup / union / windows (§2.3 scalar surface)
# ---------------------------------------------------------------------------

@query(
    "q13_predicate_library",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND c_acctbal BETWEEN 1000 AND 6000
      AND c_name LIKE 'Customer#%'
      AND regexp_matches(c_name, '[02468]$')
    """,
)
def q13_predicate_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JanusGraph predicate surface (within / between / textPrefix /
    textRegex — SURVEY §2.3) → isin / between / startswith / rlike, all
    Catalyst-visible and pushed to the scan."""
    c = _t(spark, sf_dir, "customer")
    return (c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
             .filter(F.col("c_acctbal").between(1000, 6000))
             .filter(F.col("c_name").startswith("Customer#"))
             .filter(F.col("c_name").rlike("[02468]$"))
             .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"))


@query(
    "q14_union_dedup",
    oracle="""
    SELECT DISTINCT c_custkey, c_name FROM (
      SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 3
      UNION ALL
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
    )
    """,
)
def q14_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin union(...).dedup() → unionByName + dropDuplicates
    (ReplaceDistinctWithAggregate gives partial/final hash agg)."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_nationkey") == 3).select("c_custkey", "c_name")
    b = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_name")
    return a.unionByName(b).dropDuplicates()


@query(
    "q15_per_group_topk",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q15_per_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group order().by().limit(): top-3 customers by balance per
    nation via window row_number (ref emits only global ORDER BY+LIMIT,
    QueryHelper.java:61)."""
    c = _t(spark, sf_dir, "customer")
    return kcvs.top_k(
        c.select("c_nationkey", "c_custkey", "c_acctbal"),
        order_cols=[F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=3, partition_by=["c_nationkey"])


@query(
    "q16_distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q16_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup() — DISTINCT pushdown analog (QueryHelper.java:65)."""
    return _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus").distinct()


@query(
    "q17_scalar_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    WHERE upper(o_orderstatus) = 'O'
    GROUP BY order_year, order_month
    """,
)
def q17_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/math/string scalar surface (stored as opaque bytes by the
    reference, computed by nothing in it — SURVEY §2.3): year/month
    extraction + min/max/sum rollup."""
    o = _t(spark, sf_dir, "orders")
    return (o.filter(F.upper(F.col("o_orderstatus")) == "O")
             .groupBy(F.year("o_orderdate").cast("int").alias("order_year"),
                      F.month("o_orderdate").cast("int").alias("order_month"))
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.round(F.sum("o_totalprice"), 2).alias("total"),
                  F.round(F.min("o_totalprice"), 2).alias("min_price"),
                  F.round(F.max("o_totalprice"), 2).alias("max_price")))


@query(
    "q18_json_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           count(*) AS cnt
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type, k_value
    """,
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events props column (from_json /
    get_json_object — SURVEY §2.3)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (e.withColumn("k_value", k)
             .filter(F.col("k_value") >= 50)
             .groupBy("event_type", "k_value")
             .agg(F.count(F.lit(1)).alias("cnt")))


@query(
    "q19_mutate_upsert",
    oracle="""
    WITH additions AS MATERIALIZED (
      SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
             round(o_totalprice * 1.1, 2) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey < 100
    ),
    kept AS MATERIALIZED (
      SELECT * FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders
                               WHERE o_orderkey >= 100 AND o_orderkey < 200)
        AND o_orderkey NOT IN (SELECT o_orderkey FROM additions)
    ),
    merged AS MATERIALIZED (SELECT * FROM kept UNION ALL SELECT * FROM additions)
    SELECT count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total,
           count(*) FILTER (o_orderstatus = 'X') AS n_upserted
    FROM merged
    """,
)
def q19_mutate_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mutate/mutateMany semantics (SURVEY §2.1 #3/#4) as a single plan:
    deletions strictly before additions, additions overwrite their own
    keys (ClickhouseKeyColumnValueStore.java:118-121,150-158) — expressed
    as anti-join ∪ additions, zero per-row deletes.  The oracle replays
    the same mutation relationally and checks the merged aggregate."""
    o = _t(spark, sf_dir, "orders")
    additions = (o.filter(F.col("o_orderkey") < 100)
                 .withColumn("o_orderstatus", F.lit("X"))
                 .withColumn("o_totalprice",
                             F.round(F.col("o_totalprice") * 1.1, 2)))
    deletions = o.filter(F.col("o_orderkey").between(100, 199))
    merged = kcvs.mutate(o, additions, deletions, key_cols=["o_orderkey"])
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.when(F.col("o_orderstatus") == "X", 1)).alias("n_upserted"))


@query(
    "q20_group_collect",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_name)), '|') AS names,
           count(*) AS n
    FROM customer
    WHERE c_acctbal > 8000
    GROUP BY c_nationkey
    """,
)
def q20_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin group().by(nation).by(values('name').fold()) →
    groupBy + sort_array(collect_list(...)) (sorted for determinism —
    collect order is partition-dependent in any engine).  The folded list
    is surfaced as a '|'-joined string: ARRAY result columns crash the
    driver's pandas canonicalizer (unhashable), and a delimited string
    hashes identically across engines."""
    c = _t(spark, sf_dir, "customer")
    return (c.filter(F.col("c_acctbal") > 8000)
            .groupBy("c_nationkey")
            .agg(F.array_join(F.sort_array(F.collect_list("c_name")), "|")
                 .alias("names"),
                 F.count(F.lit(1)).alias("n")))


@query(
    "q21_array_functions",
    oracle="""
    WITH t AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_distinct,
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(
               w, ['spark', 'table', 'query', 'join']))), '|'), '')
             AS kw_hits,
           w[1] AS first_token,
           w[-1] AS last_token
    FROM t
    """,
)
def q21_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function surface (SURVEY §2.3: array_* family — the
    reference stores arrays as opaque bytes and computes nothing): size,
    distinct, intersect with a literal set, element_at from both ends.
    kw_hits is surfaced '|'-joined (driver canonicalizer can't hash ARRAY
    cells)."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    kw = F.array(F.lit("spark"), F.lit("table"), F.lit("query"), F.lit("join"))
    return d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        F.array_join(F.sort_array(F.array_distinct(F.array_intersect(w, kw))),
                     "|").alias("kw_hits"),
        F.element_at(w, 1).alias("first_token"),
        F.element_at(w, -1).alias("last_token"))


@query(
    "q22_left_outer_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ) GROUP BY n_orders
    """,
)
def q22_left_outer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less customers,
    two stacked aggregations (per-customer count → histogram)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per = (c.join(o, c.c_custkey == o.o_custkey, "left")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").alias("n_orders")))
    return per.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q23_having",
    oracle="""
    SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING count(*) >= 35 AND sum(l_quantity) > 800
    """,
)
def q23_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.sum("l_quantity"), 2).alias("qty"),
                 F.sum("l_quantity").alias("_raw_qty"))
            .filter((F.col("cnt") >= 35) & (F.col("_raw_qty") > 800))
            .drop("_raw_qty"))


@query(
    "q24_correlated_min",
    oracle="""
    SELECT p.p_partkey, p.p_name, round(m.min_price, 2) AS min_price
    FROM part p
    JOIN (SELECT l_partkey, min(l_extendedprice) AS min_price
          FROM lineitem GROUP BY l_partkey) m
      ON m.l_partkey = p.p_partkey
    WHERE p.p_size <= 5
    """,
)
def q24_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group minimum joined back (the decorrelated
    form of a correlated scalar subquery — what Catalyst rewrites such
    subqueries into)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    li = _t(spark, sf_dir, "lineitem")
    m = (li.groupBy("l_partkey")
         .agg(F.min("l_extendedprice").alias("min_price")))
    return (F.broadcast(p)
            .join(m, p.p_partkey == m.l_partkey)
            .select("p_partkey", "p_name",
                    F.round("min_price", 2).alias("min_price")))


@query(
    "q25_count_distinct",
    oracle="""
    SELECT p.p_type,
           count(DISTINCT l.l_suppkey) AS n_suppliers,
           count(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_type
    """,
)
def q25_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) over a join (expand + two-phase distinct
    aggregation in Spark's planner)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .groupBy("p_type")
            .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
                 F.countDistinct("l_orderkey").alias("n_orders")))


@query(
    "q26_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q26_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total) — the
    grouping-sets surface the reference system lacks entirely."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
            .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
            .rollup("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n_cust"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_bal")))


@query(
    "q27_set_operations",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 30000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9900
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q27_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / UNION / EXCEPT set algebra (left-assoc, matching SQL
    precedence of the oracle: ((A∩B)∪C)∖D)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = (c.filter(F.col("c_mktsegment") == "BUILDING")
         .select(F.col("c_custkey")))
    b = (o.filter(F.col("o_totalprice") > 30000)
         .select(F.col("o_custkey").alias("c_custkey")))
    u = (c.filter(F.col("c_acctbal") > 9900).select("c_custkey"))
    d = (o.filter(F.col("o_orderstatus") == "P")
         .select(F.col("o_custkey").alias("c_custkey")))
    return a.intersect(b).union(u).distinct().exceptAll(d.distinct())


@query(
    "q28_sql_surface",
    oracle="""
    SELECT n.n_name,
           count(DISTINCT c.c_custkey) AS n_customers,
           round(avg(o.o_totalprice), 2) AS avg_order
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    HAVING count(*) > 50
    """,
)
def q28_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) textual surface: the same ANSI SQL the oracle
    runs, executed through Catalyst over registered temp views — showing
    both API layers (DataFrame and SQL) hit the identical engine."""
    from ..sources import register_views
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT n.n_name,
               count(DISTINCT c.c_custkey) AS n_customers,
               round(avg(o.o_totalprice), 2) AS avg_order
        FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        GROUP BY n.n_name
        HAVING count(*) > 50
    """)


@query(
    "q29_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(l_extendedprice) FILTER (l_linestatus = 'F'), 0), 2) AS F,
           round(coalesce(sum(l_extendedprice) FILTER (l_linestatus = 'O'), 0), 2) AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q29_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): groupBy().pivot() with explicit value
    list so the planner needs no extra pass to discover pivot values —
    at scale always pass the values explicitly."""
    li = _t(spark, sf_dir, "lineitem")
    out = (li.groupBy("l_returnflag")
           .pivot("l_linestatus", ["F", "O"])
           .agg(F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 2)))
    # empty pivot cells are NULL (the in-agg coalesce never sees them);
    # fill after the pivot so they match the oracle's coalesce(..., 0)
    out = out.na.fill(0.0, ["F", "O"])
    return out.select("l_returnflag", F.col("F").alias("F"),
                      F.col("O").alias("O"))


@query(
    "q30_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q30_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (== quantile_cont), in the
    shuffle-sort form of `functions.sketches.exact_percentiles_cont`
    rather than the builtin `percentile` AGGREGATE: the builtin
    buffers a whole group's value→count map in ONE aggregation buffer
    and the r13 x30 probe measured it OOM a JVM solo at 18M rows / 3
    groups on the 8g heap.  The operator is bit-identical to the
    builtin (same Percentile.getPercentile float-op order,
    property-pinned) and spills through the external sorter instead
    of buffering.  At true 100 TB with few groups, percentile_approx
    (t-digest) remains the right tool; this keeps the exact form the
    oracle can match bit-for-bit."""
    from ..functions.sketches import exact_percentiles_cont
    li = _t(spark, sf_dir, "lineitem")
    q = exact_percentiles_cont(li, ["l_returnflag"], "l_extendedprice",
                               [0.5, 0.9, 0.99])
    return (q.groupBy("l_returnflag")
            .agg(F.round(F.max(F.when(F.col("p") == 0.5,
                                      F.col("q_cont"))), 4).alias("p50"),
                 F.round(F.max(F.when(F.col("p") == 0.9,
                                      F.col("q_cont"))), 4).alias("p90"),
                 F.round(F.max(F.when(F.col("p") == 0.99,
                                      F.col("q_cont"))), 4).alias("p99")))


@query(
    "q31_statistics",
    oracle="""
    SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS sd,
           round(var_samp(o_totalprice), 2) AS var,
           round(corr(o_totalprice, o_custkey), 6) AS c,
           round(covar_samp(o_totalprice, o_custkey), 2) AS cov
    FROM orders GROUP BY o_orderpriority
    """,
)
def q31_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance/corr/covariance
    (all single-pass, partial+final combinable)."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
                 F.round(F.var_samp("o_totalprice"), 2).alias("var"),
                 F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("c"),
                 F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("cov")))


@query(
    "q32_cross_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q32_cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the SAME dimension joined twice under different
    roles (supplier nation vs customer nation) — alias discipline plus a
    symmetric OR filter."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
            .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg(F.round(F.sum(rev), 2).alias("revenue")))


@query(
    "q33_large_order_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice, big.total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150) big
      ON big.l_orderkey = o.o_orderkey
    """,
)
def q33_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING, decorrelated
    into an aggregate + join (what the optimizer does with the textual
    form)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 150))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(big, o.o_orderkey == big.l_orderkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "total_qty"))


@query(
    "q34_window_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
           round(percent_rank() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey), 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q34_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window surface: running sums, lag deltas, ntile
    quartiles, percent_rank — one shuffle per distinct partitioning, all
    orderings carry unique tiebreakers for cross-engine determinism."""
    o = _t(spark, sf_dir, "orders")
    wt = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_custkey",
        F.round(F.sum("o_totalprice").over(
            wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
         .alias("running_total"),
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(wt), 2)
         .alias("delta_prev"),
        F.ntile(4).over(wp).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(wp), 6).alias("pr"))


@query(
    "q35_range_step",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 10
    """,
)
def q35_range_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gremlin range(10, 25) — paging within a sorted traversal: ORDER BY
    + OFFSET + LIMIT.  (Deep paging re-sorts the prefix each page; at
    scale prefer keyset pagination — filter on the last-seen sort key —
    which this same plan expresses as a WHERE instead of OFFSET.)"""
    o = _t(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .offset(10).limit(15))


@query(
    "q36_cube_grouping",
    oracle="""
    SELECT n_name, o_orderpriority,
           CAST(GROUPING(n_name, o_orderpriority) AS INT) AS gid,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY CUBE (n_name, o_orderpriority)
    """,
)
def q36_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, order-priority) with the GROUPING bitmask —
    all four grouping sets in one pass (partial aggregation expands the
    grouping-set id before the shuffle, so it stays a single hash
    aggregate, not four scans).  The gid column disambiguates aggregate
    NULLs from (hypothetical) data NULLs — the full grouping-sets
    surface on top of q26's ROLLUP."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (o.join(c, c.c_custkey == o.o_custkey)
            .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
            .cube("n_name", "o_orderpriority")
            .agg(F.grouping_id().cast("int").alias("gid"),
                 F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


@query(
    "q37_geo_within",
    oracle="""
    WITH pts AS MATERIALIZED (
      SELECT c_custkey, c_nationkey,
             -90.0 + ((c_custkey * 7919) % 18000) / 100.0 AS lat,
             -180.0 + ((c_custkey * 104729) % 36000) / 100.0 AS lon
      FROM customer),
    d AS MATERIALIZED (
      SELECT c_nationkey,
             round(2 * 6371.0 * asin(sqrt(
               power(sin((radians(25.0) - radians(lat)) / 2), 2)
               + cos(radians(lat)) * cos(radians(25.0))
                 * power(sin((radians(45.0) - radians(lon)) / 2), 2))),
               6) AS dist
      FROM pts
      WHERE lat >= -60.0 AND lat <= 75.0 AND lon >= -120.0 AND lon <= 120.0)
    SELECT c_nationkey AS nationkey, count(*) AS n_within,
           round(avg(dist), 4) AS avg_dist_km
    FROM d WHERE dist <= 6000.0
    GROUP BY 1
    """,
)
def q37_geo_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo predicate surface (JanusGraph Geoshape / Gremlin geoWithin —
    the reference system indexes Geoshape properties, SURVEY §1.2):
    customers at deterministic key-derived coordinates, filtered by a
    bounding BOX (scan-side range conjunctions — pushes down) and a
    great-circle CIRCLE (haversine ≤ 6000 km of (25°, 45°)), counted
    per nation.

    The circle compares the 6dp-ROUNDED distance (l06 discipline) so
    cross-engine trig ulp noise can't flip membership; coordinates are
    integer-modulus-derived so both engines synthesize identical
    doubles.  Zero UDFs — the whole predicate stack is codegen trig."""
    from ..functions.predicates import P
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_nationkey",
        (F.lit(-90.0) + ((F.col("c_custkey") * 7919) % 18000) / 100.0)
        .alias("lat"),
        (F.lit(-180.0) + ((F.col("c_custkey") * 104729) % 36000) / 100.0)
        .alias("lon"))
    boxed = pts.filter(P.geo_within_box("lat", "lon",
                                        -60.0, 75.0, -120.0, 120.0))
    d = boxed.select("c_nationkey",
                     P.geo_distance_km("lat", "lon", 25.0, 45.0)
                     .alias("dist"))
    return (d.filter(F.col("dist") <= 6000.0)
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.count(F.lit(1)).alias("n_within"),
                 F.round(F.avg("dist"), 4).alias("avg_dist_km")))


@query(
    "q38_argmax_latest",
    oracle="""
    SELECT user_id,
           arg_max(event_type, printf('%020d%012d', epoch_us(ts), event_id))
             AS last_type,
           arg_max(value, printf('%020d%012d', epoch_us(ts), event_id))
             AS last_value,
           arg_min(event_type, printf('%020d%012d', epoch_us(ts), event_id))
             AS first_type,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def q38_argmax_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse argMax/argMin aggregate surface (the signature
    "value at the extremum of another column" aggregates of the
    reference's backing store; SELECT argMax(v, ts) is the canonical
    last-point-per-series ClickHouse query): per user, the event type
    and value at the LATEST event and the type at the EARLIEST — one
    partial+final aggregate pair, no window, no self-join: max_by
    keeps one running extremum per group, so the shuffle carries one
    row per (map partition, user), never the raw events (the window
    formulation would shuffle and sort every event).  Plan-pinned in
    tests/test_plans.py.

    Determinism at ts ties: the ordering key is the zero-padded
    (epoch_micros, event_id) string — a total order both engines
    compare identically (Spark max_by on the same string = DuckDB
    arg_max).  `value` passes through untouched (stored doubles are
    compared exactly; no arithmetic, no rounding needed)."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.format_string("%020d%012d", F.unix_micros("ts"),
                           F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", okey).alias("last_type"),
        F.max_by("value", okey).alias("last_value"),
        F.min_by("event_type", okey).alias("first_type"),
        F.count(F.lit(1)).alias("n_events"))


@query(
    "q39_window_funnel",
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT user_id, ts AS t1 FROM events WHERE event_type = 'view'),
    s2 AS MATERIALIZED (
      SELECT v.user_id, v.t1, min(c.ts) AS t2
      FROM v JOIN events c
        ON c.user_id = v.user_id AND c.event_type = 'click'
       AND c.ts > v.t1 AND c.ts <= v.t1 + INTERVAL '1 hour'
      GROUP BY v.user_id, v.t1),
    s3 AS MATERIALIZED (
      SELECT s2.user_id, s2.t1, min(p.ts) AS t3
      FROM s2 JOIN events p
        ON p.user_id = s2.user_id AND p.event_type = 'purchase'
       AND p.ts > s2.t2 AND p.ts <= s2.t1 + INTERVAL '1 hour'
      GROUP BY s2.user_id, s2.t1),
    lv AS MATERIALIZED (
      SELECT v.user_id,
             1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END AS lvl
      FROM v
      LEFT JOIN s2 ON s2.user_id = v.user_id AND s2.t1 = v.t1
      LEFT JOIN s3 ON s3.user_id = v.user_id AND s3.t1 = v.t1)
    SELECT u.user_id,
           coalesce(max(lv.lvl), 0) AS funnel_level
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN lv ON lv.user_id = u.user_id
    GROUP BY u.user_id
    """,
)
def q39_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse windowFunnel analog: per user, the deepest prefix of
    the view → click → purchase funnel completed inside a 1-hour window
    anchored at the view (each later step strictly after the previous
    one, all within anchor + window) — THE event-analytics function of
    the reference's backing store.  Semantics: for every anchor view,
    greedily take the EARLIEST qualifying click then the earliest
    qualifying purchase after it (greedy-earliest is optimal for a
    fixed anchor), and report the max level over anchors; users with
    no view score 0.

    Scale shape: two event-time-bounded interval joins (the s07 class —
    per-anchor fan-out is bounded by events per user per hour, never
    the corpus) + min/max aggregates.  All decisions are min/max over
    exact timestamps — no floats, tie-free by construction."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", F.col("ts").alias("t1")))
    c = (ev.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts")))
    hour = F.expr("INTERVAL 1 HOUR")
    s2 = (v.join(c, (F.col("cu") == F.col("user_id"))
                 & (F.col("cts") > F.col("t1"))
                 & (F.col("cts") <= F.col("t1") + hour))
          .groupBy("user_id", "t1").agg(F.min("cts").alias("t2")))
    s3 = (s2.join(p, (F.col("pu") == F.col("user_id"))
                  & (F.col("pts") > F.col("t2"))
                  & (F.col("pts") <= F.col("t1") + hour))
          .groupBy("user_id", "t1").agg(F.min("pts").alias("t3")))
    lv = (v.join(s2, ["user_id", "t1"], "left")
          .join(s3, ["user_id", "t1"], "left")
          .select("user_id",
                  (F.lit(1)
                   + F.when(F.col("t2").isNull(), 0).otherwise(1)
                   + F.when(F.col("t3").isNull(), 0).otherwise(1))
                  .alias("lvl")))
    users = ev.select("user_id").distinct()
    return (users.join(lv, "user_id", "left")
            .groupBy("user_id")
            .agg(F.coalesce(F.max("lvl"), F.lit(0))
                 .cast("int").alias("funnel_level")))


@query(
    "q40_retention",
    oracle="""
    SELECT user_id,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             AS r_signup,
           least(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END),
                 max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END))
             AS r_view,
           least(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END),
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END))
             AS r_purchase
    FROM events GROUP BY user_id
    """,
)
def q40_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse retention() analog: per user, whether the base
    condition fired (signup) and, for each follow-up condition (view,
    purchase), whether BOTH the base and it fired — the cohort-
    retention building block (the base flag ANDs into every later
    column, exactly ClickHouse's semantics).  One hash aggregate of
    0/1 flags over one scan; the conditions are scan-side predicates
    Catalyst folds into the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    flag = lambda t: F.max(
        F.when(F.col("event_type") == t, 1).otherwise(0))
    return ev.groupBy("user_id").agg(
        flag("signup").alias("r_signup"),
        F.least(flag("signup"), flag("view")).alias("r_view"),
        F.least(flag("signup"), flag("purchase")).alias("r_purchase"))


@query(
    "q41_hll_distinct",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT h % 256 AS bucket,
             CASE WHEN (h >> 8) > 0 THEN 53 - length(bin(h >> 8))
                  ELSE 53 END AS rank
      FROM (SELECT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                   1, 15))::BIGINT AS h
            FROM orders)),
    reg AS MATERIALIZED (
      SELECT bucket, max(rank) AS m FROM r GROUP BY bucket),
    z AS MATERIALIZED (
      SELECT CAST(sum(CAST(2.0 ** (53 - m) AS BIGINT)) AS BIGINT)
             + (256 - count(*)) * 9007199254740992 AS z
      FROM reg),
    ex AS MATERIALIZED (SELECT count(DISTINCT o_custkey) AS n_exact FROM orders)
    SELECT n_exact,
           round(4.2399330249068963e+20 / z, 4) AS hll_estimate,
           round((4.2399330249068963e+20 / z - n_exact) / n_exact, 6)
             AS rel_error
    FROM ex, z
    """,
)
def q41_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse uniq/uniqHLL12 analog, rebuilt deterministic: an
    m=256 HyperLogLog over the engine-portable md5 hash, with exact
    leading-zero ranks (binary-string length, never float log2) and an
    EXACT int64 register fold (2^(53-M) terms) so the estimate is
    bit-identical on both engines — the property Spark's black-box
    approx_count_distinct cannot give an oracle.  Reports the exact
    count and realized relative error alongside
    (functions.sketches.hll_distinct)."""
    from ..functions.sketches import hll_distinct
    return hll_distinct(load_table(spark, sf_dir, "orders"), "o_custkey")


@query(
    "q42_cms_heavy_hitters",
    oracle="""
    WITH keys AS MATERIALIZED (
      SELECT user_id AS key, count(*) AS exact_cnt
      FROM events GROUP BY user_id),
    inst AS MATERIALIZED (
      SELECT r.r AS r,
             ('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '|'
                                 || CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 256 AS bucket
      FROM events, LATERAL unnest([0, 1, 2, 3]) AS r(r)),
    counters AS MATERIALIZED (
      SELECT r, bucket, count(*) AS c FROM inst GROUP BY r, bucket),
    probes AS MATERIALIZED (
      SELECT k.key, k.exact_cnt, r.r AS r,
             ('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '|'
                                 || CAST(k.key AS VARCHAR)), 1, 15))
               ::BIGINT % 256 AS bucket
      FROM keys k, LATERAL unnest([0, 1, 2, 3]) AS r(r)),
    est AS MATERIALIZED (
      SELECT p.key, p.exact_cnt, CAST(min(c.c) AS BIGINT) AS cms_estimate
      FROM probes p JOIN counters c ON c.r = p.r AND c.bucket = p.bucket
      GROUP BY p.key, p.exact_cnt)
    SELECT key, cms_estimate, exact_cnt,
           cms_estimate - exact_cnt AS overcount
    FROM est ORDER BY cms_estimate DESC, key LIMIT 20
    """,
)
def q42_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse topK analog: top-20 users by Count-Min-sketch
    frequency estimate (d=4 × w=256 md5-salted counters, min over
    rows — never an underestimate), with exact count and realized
    overcount beside it.  All integers, no floats — exact cross-engine
    parity; the sketch build is one bounded-group aggregate and the
    probe joins a broadcast 1024-row counter table
    (functions.sketches.cms_heavy_hitters)."""
    from ..functions.sketches import cms_heavy_hitters
    return cms_heavy_hitters(load_table(spark, sf_dir, "events"),
                             "user_id", k=20)


@query(
    "q43_kmv_set_ops",
    oracle="""
    WITH ha AS MATERIALIZED (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                      1, 15))::BIGINT AS h
      FROM events WHERE event_type = 'view'),
    hb AS MATERIALIZED (
      SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                      1, 15))::BIGINT AS h
      FROM events WHERE event_type = 'purchase'),
    sa AS MATERIALIZED (SELECT h FROM ha ORDER BY h LIMIT 32),
    sb AS MATERIALIZED (SELECT h FROM hb ORDER BY h LIMIT 32),
    su AS MATERIALIZED (
      SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
      ORDER BY h LIMIT 32),
    st AS MATERIALIZED (
      SELECT (SELECT count(*) FROM sa) AS na,
             (SELECT max(h) FROM sa) AS hak,
             (SELECT count(*) FROM sb) AS nb,
             (SELECT max(h) FROM sb) AS hbk,
             (SELECT count(*) FROM su) AS nu,
             (SELECT max(h) FROM su) AS huk,
             (SELECT count(*) FROM su
              WHERE h IN (SELECT h FROM sa)
                AND h IN (SELECT h FROM sb)) AS rho),
    ex AS MATERIALIZED (
      SELECT (SELECT count(DISTINCT user_id) FROM events
              WHERE event_type = 'view') AS n_a,
             (SELECT count(DISTINCT user_id) FROM events
              WHERE event_type = 'purchase') AS n_b,
             (SELECT count(*) FROM
                (SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'view') x
                JOIN (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'purchase') y
                USING (user_id)) AS n_intersect)
    SELECT 32 AS k,
      round(CASE WHEN na < 32 THEN CAST(na AS DOUBLE)
                 ELSE 31 * 1152921504606846976.0 / hak END, 4) AS est_a,
      round(CASE WHEN nb < 32 THEN CAST(nb AS DOUBLE)
                 ELSE 31 * 1152921504606846976.0 / hbk END, 4) AS est_b,
      round(CASE WHEN nu < 32 THEN CAST(nu AS DOUBLE)
                 ELSE 31 * 1152921504606846976.0 / huk END, 4)
        AS est_union,
      round((CAST(rho AS DOUBLE) / least(nu, 32))
            * CASE WHEN nu < 32 THEN CAST(nu AS DOUBLE)
                   ELSE 31 * 1152921504606846976.0 / huk END, 4)
        AS est_intersect,
      round(CAST(rho AS DOUBLE) / least(nu, 32), 6) AS jaccard_est,
      n_a, n_b, n_intersect
    FROM st, ex
    """,
)
def q43_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse uniqCombined / theta-sketch set algebra analog:
    K-minimum-value sketches (k=32) over the md5_long60 hash of the
    'view' and 'purchase' user sets, emitting distinct / union /
    intersection / Jaccard ESTIMATES with the exact values beside
    them.  All sketch decisions are integer-exact, so the estimates
    are bit-identical across engines (functions.sketches.kmv_set_ops);
    the only corpus-sized work is one distinct-aggregate per side —
    everything downstream is ≤k-row broadcast algebra."""
    from ..functions.sketches import kmv_set_ops
    ev = load_table(spark, sf_dir, "events")
    return kmv_set_ops(ev.filter(F.col("event_type") == "view"),
                       ev.filter(F.col("event_type") == "purchase"),
                       "user_id", k=32)


@query(
    "q44_delta_sum",
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT)
               - lag(CAST(floor(value * 100 + 0.5) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
      FROM events)
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_increases,
           CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT)
             AS delta_sum_cents
    FROM d GROUP BY user_id
    """,
)
def q44_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse deltaSum / runningDifference analog: per user, the
    sum of POSITIVE value differences between consecutive events in
    time order (monotone-counter increase extraction).  Cents
    quantization BEFORE differencing makes every diff and sum an exact
    integer — bit-identical parity with no float summation order (the
    s13 discipline; operators.temporal.delta_sum).  One key shuffle +
    one window pass + one aggregate."""
    from ..operators.temporal import delta_sum
    ev = load_table(spark, sf_dir, "events")
    return delta_sum(ev, "user_id", "ts", "value", order_extra="event_id")


@query(
    "q45_ttl_partition_prune",
    oracle="""
    WITH days AS MATERIALIZED (
      SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS d,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    c AS MATERIALIZED (SELECT mn + CAST(floor((mx - mn) / 2) AS BIGINT) AS cutoff
          FROM (SELECT min(d) AS mn, max(d) AS mx FROM days))
    SELECT d, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents,
           (SELECT CAST(count(DISTINCT d) AS BIGINT)
            FROM days, c WHERE d < cutoff) AS n_dropped_partitions
    FROM days, c WHERE d >= cutoff GROUP BY d, cutoff
    """,
)
def q45_ttl_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse TTL / DROP PARTITION maintenance, driver-checked end
    to end: the query WRITES events partitioned by epoch-day, applies
    a metadata-only TTL (sources.layout.apply_ttl unlinks whole
    partition directories below the cutoff — O(partitions), no row
    read or rewritten), then reads the survivors back and aggregates
    per day.  The read-back must equal the oracle's WHERE d >= cutoff
    — proving the partition drop removed exactly the expired days.
    Cutoff = median day, derived from the data on both sides.  The
    s12 pattern: real side-effects inside the registered query, work
    dir deleted after a localCheckpoint."""
    import os
    import shutil
    import tempfile
    from ..sources.layout import apply_ttl
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    work = tempfile.mkdtemp(prefix="q45_ttl_")
    try:
        tbl = os.path.join(work, "events_by_day")
        # NULL days never partake in TTL (apply_ttl retains the NULL
        # partition by contract, but the oracle's d >= cutoff excludes
        # NULLs) — drop them at write time so a fixture regen with NULL
        # ts can't become a silent parity divergence
        (ev.select(day.alias("d"), cents.alias("cents"))
         .filter(F.col("d").isNotNull())
         .write.partitionBy("d").parquet(tbl))
        b = (spark.read.parquet(tbl)
             .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
             .first())
        cutoff = int(b.mn + (b.mx - b.mn) // 2)
        dropped = apply_ttl(tbl, "d", cutoff)
        out = (spark.read.parquet(tbl)
               .groupBy(F.col("d").cast("long").alias("d"))
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum("cents").alias("sum_cents"))
               .withColumn("n_dropped_partitions",
                           F.lit(dropped).cast("long"))
               .localCheckpoint())
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


@query(
    "q46_hll_mergeable_rollup",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT grp, h % 256 AS bucket,
             CASE WHEN (h >> 8) > 0 THEN 53 - length(bin(h >> 8))
                  ELSE 53 END AS rank
      FROM (SELECT o_orderpriority AS grp,
                   ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                   1, 15))::BIGINT AS h
            FROM orders)),
    reg AS MATERIALIZED (
      SELECT grp, bucket, max(rank) AS m FROM r GROUP BY grp, bucket),
    allreg AS MATERIALIZED (
      SELECT 'ALL' AS grp, bucket, max(m) AS m FROM reg GROUP BY bucket),
    u AS MATERIALIZED (
      SELECT grp, bucket, m FROM reg
      UNION ALL SELECT grp, bucket, m FROM allreg),
    z AS MATERIALIZED (
      SELECT grp,
             CAST(sum(CAST(2.0 ** (53 - m) AS BIGINT)) AS BIGINT)
             + (256 - count(*)) * 9007199254740992 AS z
      FROM u GROUP BY grp),
    ex AS MATERIALIZED (
      SELECT o_orderpriority AS grp,
             count(DISTINCT o_custkey) AS n_exact
      FROM orders GROUP BY 1
      UNION ALL
      SELECT 'ALL', count(DISTINCT o_custkey) FROM orders)
    SELECT z.grp AS o_orderpriority,
           round(4.2399330249068963e+20 / z.z, 4) AS uniq_estimate,
           ex.n_exact
    FROM z JOIN ex ON ex.grp = z.grp
    """,
)
def q46_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse uniqState/uniqMerge analog (the AggregatingMergeTree
    materialized-view idiom): per-priority HLL REGISTER STATES for
    distinct customers, per-group estimates folded from the states, and
    the global 'ALL' rollup derived by MERGING the five register tables
    (per-bucket MAX) — never rescanning the fact table.  The hash-match
    against the oracle's full rederivation proves the merge is exact:
    the coarse estimate equals what a direct global sketch would give.
    At 100 TB this is the shape that makes rollup hierarchies cheap —
    states are 256 rows per group, mergeable in any order
    (functions.sketches.hll_registers / hll_estimate_from_registers)."""
    from ..functions.sketches import (hll_estimate_from_registers,
                                      hll_registers)
    # r15 note: a one-pass rework (materialized distinct (priority,
    # custkey) frame feeding registers + exact counts, orders scanned
    # once instead of 4×) was built, parity-verified and MEASURED:
    # x30 flat (1.60 → 1.70 s) and fixture 2× slower (0.31 → 0.57 s,
    # the checkpoint-job constant) — the partial-aggregation forms
    # below ship almost nothing to the shuffle, so the extra scans
    # are cheaper than materializing |customers|·|priorities| rows.
    # Reverted; do not retry without a ≥x30 win (the l17 discipline).
    orders = load_table(spark, sf_dir, "orders")
    regs = hll_registers(orders, "o_custkey", ["o_orderpriority"])
    per = hll_estimate_from_registers(regs, ["o_orderpriority"])
    merged = (regs.groupBy("bucket").agg(F.max("m").alias("m"))
              .withColumn("o_orderpriority", F.lit("ALL")))
    allr = hll_estimate_from_registers(merged, ["o_orderpriority"])
    ex = (orders.groupBy("o_orderpriority")
          .agg(F.countDistinct("o_custkey").alias("n_exact"))
          .union(orders.agg(F.countDistinct("o_custkey").alias("n_exact"))
                 .select(F.lit("ALL").alias("o_orderpriority"),
                         "n_exact")))
    return per.union(allr).join(ex, "o_orderpriority")


@query(
    "q47_map_aggregates",
    oracle="""
    WITH a AS MATERIALIZED (
      SELECT l_returnflag AS f, l_linestatus AS k,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS sc,
             CAST(max(CAST(floor(l_quantity + 0.5) AS BIGINT))
                  AS BIGINT) AS mq
      FROM lineitem GROUP BY 1, 2)
    SELECT f AS l_returnflag,
           string_agg(k || ':' || CAST(sc AS VARCHAR), ','
                      ORDER BY k) AS sum_map,
           string_agg(k || ':' || CAST(mq AS VARCHAR), ','
                      ORDER BY k) AS max_map
    FROM a GROUP BY f
    """,
)
def q47_map_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sumMap/maxMap analog (functions.maps): per return
    flag, a key-sorted MAP linestatus -> summed revenue cents and ->
    max quantity, rendered in the canonical 'k:v,...' form both engines
    share.  Two hash aggregates: the per-(group, key) rollup does the
    real work with map-side combine; map assembly moves one row per
    (group, key) — bounded by key cardinality, never row count."""
    from ..functions.maps import map_as_string, max_map, sum_map
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_linestatus",
                  F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                  .cast("long").alias("cents"),
                  F.floor(F.col("l_quantity") + F.lit(0.5))
                  .cast("long").alias("qty")))
    s = sum_map(li, ["l_returnflag"], "l_linestatus", "cents")
    m = max_map(li, ["l_returnflag"], "l_linestatus", "qty")
    return (s.join(m, "l_returnflag")
            .select("l_returnflag",
                    map_as_string("sum_map").alias("sum_map"),
                    map_as_string("max_map").alias("max_map")))


@query(
    "q48_histogram_quantiles",
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders),
    st AS MATERIALIZED (
      SELECT g, least(63, greatest(0, c // 1000000)) AS bin,
             count(*) AS cnt
      FROM v GROUP BY 1, 2),
    allst AS MATERIALIZED (
      SELECT 'ALL' AS g, bin, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM st GROUP BY bin),
    u AS MATERIALIZED (
      SELECT g, bin, CAST(cnt AS BIGINT) AS cnt FROM st
      UNION ALL SELECT g, bin, cnt FROM allst),
    cc AS MATERIALIZED (
      SELECT g, bin, cnt,
             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bin
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum,
             CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
      FROM u),
    pp AS MATERIALIZED (
      SELECT cc.g, cc.bin, cc.cnt, cc.cum, cc.n, p.pct,
             (cc.n * p.pct + 99) // 100 AS r
      FROM cc, LATERAL unnest([50, 90, 99]) AS p(pct))
    SELECT g AS o_orderpriority, CAST(pct AS INT) AS pct,
           round(CAST((bin * 1000000) * CAST(1000000 AS BIGINT)
                      + (CAST(1000000 AS BIGINT) * 1000000
                         * (2 * (r - (cum - cnt)) - 1))
                        // (2 * cnt) AS BIGINT) / 1e8, 4) AS est_dollars
    FROM pp WHERE cum >= r AND cum - cnt < r
    """,
)
def q48_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile states (ClickHouse quantile-state idiom,
    deterministic): per order priority, a 64-bin fixed-width histogram
    of order value in cents (functions.sketches.histogram_state), the
    global 'ALL' state derived by MERGING per-group states (per-bin
    SUM — never rescanning orders), and p50/p90/p99 folded from each
    state with integer-exact midpoint interpolation
    (histogram_quantiles).  States are ≤64 rows per group at any data
    scale; the fold's arithmetic is pure int64 DIV until the one
    display division, so both engines agree bit-for-bit."""
    from ..functions.sketches import histogram_quantiles, histogram_state
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long").alias("c"))
    st = histogram_state(v, "c", ["g"], lo=0, width=1_000_000, n_bins=64)
    merged = (st.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
              .withColumn("g", F.lit("ALL"))
              .select("g", "bin", "cnt"))
    q = histogram_quantiles(st.union(merged), ["g"], lo=0,
                            width=1_000_000, percents=[50, 90, 99])
    return q.select(F.col("g").alias("o_orderpriority"),
                    F.col("pct").cast("int").alias("pct"),
                    F.round(F.col("est_micro") / F.lit(1e8), 4)
                    .alias("est_dollars"))


@query(
    "q49_weighted_quantiles",
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT l_returnflag AS g,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
      FROM lineitem),
    a AS MATERIALIZED (
      SELECT g, c, CAST(sum(w) AS BIGINT) AS w FROM v GROUP BY g, c),
    cc AS MATERIALIZED (
      SELECT g, c, w,
             CAST(sum(w) OVER (PARTITION BY g ORDER BY c
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum,
             CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS tot
      FROM a),
    p AS MATERIALIZED (
      SELECT cc.g, cc.c, cc.w, cc.cum, cc.tot, pp.pct,
             (cc.tot * pp.pct + 99) // 100 AS r
      FROM cc, LATERAL unnest([50, 90, 99]) AS pp(pct))
    SELECT g AS l_returnflag, CAST(pct AS INT) AS pct,
           c AS q_value_cents
    FROM p WHERE cum >= r AND cum - w < r
    """,
)
def q49_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse quantileExactWeighted analog (functions.sketches
    .weighted_quantiles): per return flag, the EXACT quantity-weighted
    p50/p90/p99 of line revenue — the smallest value whose cumulative
    weight reaches ceil(W·p/100).  Values pre-collapsed per (group,
    value) so the window runs over value cardinality, not row count;
    rank arithmetic pure int64 — both engines agree exactly."""
    from ..functions.sketches import weighted_quantiles
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long").alias("c"),
        F.floor(F.col("l_quantity") + F.lit(0.5))
        .cast("long").alias("w"))
    q = weighted_quantiles(v, "c", "w", ["g"], [50, 90, 99])
    return q.select(F.col("g").alias("l_returnflag"),
                    F.col("pct").cast("int").alias("pct"),
                    F.col("q_value").alias("q_value_cents"))


@query(
    "q50_range_frame_windows",
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events)
    SELECT user_id, event_id, ts_sec,
           CAST(count(*) OVER w AS BIGINT) AS n_events_1h,
           CAST(sum(cents) OVER w AS BIGINT) AS sum_cents_1h,
           CAST(max(cents) OVER w AS BIGINT) AS max_cents_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q50_range_frame_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame (time-interval) window aggregates — the moving
    "last hour per user" rollup every monitoring query needs, and a
    window surface q34's ROWS frames don't cover: the frame is bounded
    by VALUE distance (ts within 3600 s), not row count, so ties and
    gaps behave per the SQL standard on both engines.  One key shuffle
    + one ordered window pass; cents quantization keeps the moving
    sums integer-exact.  (Rows sharing a ts_sec share a frame — RANGE
    semantics — which is why the frame column set is deterministic
    without an event_id tiebreak.)"""
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id",
                  F.unix_timestamp("ts").alias("ts_sec"),
                  F.floor(F.col("value") * 100 + F.lit(0.5))
                  .cast("long").alias("cents"))
    w = (Window.partitionBy("user_id").orderBy("ts_sec")
         .rangeBetween(-3600, 0))
    return e.select(
        "user_id", "event_id", "ts_sec",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.sum("cents").over(w).alias("sum_cents_1h"),
        F.max("cents").over(w).alias("max_cents_1h"))


@query(
    "q51_bitmap_segments",
    oracle="""
    WITH m AS MATERIALIZED (
      SELECT event_type AS seg, user_id AS mid
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      GROUP BY 1, 2 HAVING count(*) >= 14),
    s AS MATERIALIZED (SELECT seg, count(*) AS n FROM m GROUP BY seg),
    i AS MATERIALIZED (
      SELECT a.seg AS seg_a, b.seg AS seg_b, count(*) AS n_inter
      FROM m a JOIN m b ON a.mid = b.mid AND a.seg < b.seg
      GROUP BY 1, 2)
    SELECT sa.seg AS seg_a, sb.seg AS seg_b, sa.n AS n_a, sb.n AS n_b,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS BIGINT) AS n_union,
           round(CAST(coalesce(i.n_inter, 0) AS DOUBLE)
                 / (sa.n + sb.n - coalesce(i.n_inter, 0)), 6) AS jaccard
    FROM s sa JOIN s sb ON sa.seg < sb.seg
    LEFT JOIN i ON i.seg_a = sa.seg AND i.seg_b = sb.seg
    """,
)
def q51_bitmap_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact segment-overlap matrix — the ClickHouse groupBitmap /
    bitmapAndCardinality idiom (audience-overlap analytics) without the
    bitmap type: a user belongs to a behavior segment iff they have
    ≥14 events of that type, and every unordered segment pair reports
    exact intersection/union cardinalities + Jaccard
    (functions.bitmaps.segment_overlap_matrix).  Membership is one
    hash aggregate; the pair join shuffles on user_id with fan-out
    bounded by |segments|², never corpus size; the segment-level
    matrices are broadcast algebra."""
    from ..functions.bitmaps import segment_overlap_matrix
    ev = load_table(spark, sf_dir, "events")
    return segment_overlap_matrix(ev, member_col="user_id",
                                  segment_col="event_type", min_rows=14)


@query(
    "q52_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def q52_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit irregular GROUPING SETS — the surface CUBE (q36) and
    ROLLUP (q26) can't express: exactly the (priority, status),
    (priority), () sets WITHOUT the (status)-only set a CUBE would
    add.  Still one hash aggregate (the grouping-set id expands before
    the shuffle, so partial aggregation applies per set); the GROUPING
    bitmask disambiguates aggregate NULLs; cents quantization keeps
    the sum integer-exact across engines."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (o.withColumn("cents", cents)
            .groupingSets([["o_orderpriority", "o_orderstatus"],
                           ["o_orderpriority"], []],
                          "o_orderpriority", "o_orderstatus")
            .agg(F.grouping_id().cast("int").alias("gid"),
                 F.count(F.lit(1)).alias("n_orders"),
                 F.sum("cents").alias("total_cents")))


@query(
    "q53_topk_weighted",
    oracle="""
    WITH ec AS MATERIALIZED (
      SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    keys AS MATERIALIZED (
      SELECT user_id AS key, CAST(sum(cents) AS BIGINT) AS exact_cnt
      FROM ec GROUP BY user_id),
    inst AS MATERIALIZED (
      SELECT r.r AS r, cents,
             ('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '|'
                                 || CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 256 AS bucket
      FROM ec, LATERAL unnest([0, 1, 2, 3]) AS r(r)),
    counters AS MATERIALIZED (
      SELECT r, bucket, CAST(sum(cents) AS BIGINT) AS c
      FROM inst GROUP BY r, bucket),
    probes AS MATERIALIZED (
      SELECT k.key, k.exact_cnt, r.r AS r,
             ('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '|'
                                 || CAST(k.key AS VARCHAR)), 1, 15))
               ::BIGINT % 256 AS bucket
      FROM keys k, LATERAL unnest([0, 1, 2, 3]) AS r(r)),
    est AS MATERIALIZED (
      SELECT p.key, p.exact_cnt, CAST(min(c.c) AS BIGINT) AS cms_estimate
      FROM probes p JOIN counters c ON c.r = p.r AND c.bucket = p.bucket
      GROUP BY p.key, p.exact_cnt)
    SELECT key, cms_estimate, exact_cnt,
           cms_estimate - exact_cnt AS overcount
    FROM est ORDER BY cms_estimate DESC, key LIMIT 20
    """,
)
def q53_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse topKWeighted analog: top-20 users by Count-Min
    WEIGHTED frequency estimate — the counters sum exact integer cents
    of the event value instead of row counts (q42's sketch with the
    q44 cents discipline; the min-over-rows never-underestimate
    guarantee holds for any non-negative additive weight).  Same
    bounded 1024-group build + broadcast probe shape as q42."""
    from ..functions.sketches import cms_heavy_hitters
    ev = load_table(spark, sf_dir, "events")
    e = ev.withColumn(
        "cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
    return cms_heavy_hitters(e, "user_id", k=20, weight_col="cents")


@query(
    "q54_top_event_paths",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    p AS MATERIALIZED (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 8 GROUP BY user_id)
    SELECT path, count(*) AS n_users FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT 15
    """,
)
def q54_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-flow path analysis (the ClickHouse groupArray funnel-path
    idiom): each user's first 8 event types in event order collapse to
    a '>'-joined path string, top-15 paths by user count.  One ordered
    window (rn), one per-user aggregate assembling the path via
    array_sort(struct(rn, type)) — deterministic without relying on
    collect_list order — and one path-keyed count; the (ts, event_id)
    tiebreak makes the path unique at any scale."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = (ev.withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= 8))
    paths = (r.groupBy("user_id")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("rn", "event_type"))),
                     lambda s: s["event_type"]), ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy(F.col("n_users").desc(), "path").limit(15))


@query(
    "q55_conditional_aggregates",
    oracle="""
    WITH c AS MATERIALIZED (
      SELECT o_orderpriority, o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_f,
           CAST(coalesce(sum(cents) FILTER (WHERE o_orderstatus = 'F'),
                         0) AS BIGINT) AS cents_f,
           CAST(min(cents) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS min_cents_f,
           CAST(max(cents) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS max_cents_f,
           round(CASE WHEN count(*) FILTER (WHERE o_orderstatus = 'F') > 0
                 THEN CAST(sum(cents) FILTER (WHERE o_orderstatus = 'F')
                           AS DOUBLE)
                      / count(*) FILTER (WHERE o_orderstatus = 'F')
                 END, 6) AS avg_cents_f
    FROM c GROUP BY o_orderpriority
    """,
)
def q55_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse -If aggregate combinators (countIf/sumIf/minIf/maxIf/
    avgIf) — conditional aggregation WITHOUT pre-filtering the scan, so
    one pass serves every condition.  All are when()-guarded built-ins
    inside ONE hash aggregate; empty-condition groups yield 0 for the
    count, 0 for the sum and NULL for min/max/avg (the SQL FILTER
    semantics both engines share); avgIf derives from the exact cents
    sum and count in one rounded division."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    cond = F.col("o_orderstatus") == "F"
    cf = F.when(cond, cents)
    n_f = F.sum(F.when(cond, 1).otherwise(0)).cast("long")
    sum_f = F.coalesce(F.sum(cf), F.lit(0)).cast("long")
    return (o.groupBy("o_orderpriority")
            .agg(n_f.alias("n_f"),
                 sum_f.alias("cents_f"),
                 F.min(cf).cast("long").alias("min_cents_f"),
                 F.max(cf).cast("long").alias("max_cents_f"),
                 F.round(F.when(n_f > 0,
                                sum_f.cast("double") / n_f), 6)
                 .alias("avg_cents_f")))


@query(
    "q56_sliding_hll",
    oracle="""
    WITH r AS MATERIALIZED (
      SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts)))
                  AS BIGINT) AS h,
             user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hh
      FROM events),
    b AS MATERIALIZED (
      SELECT h, hh % 256 AS bucket,
             CASE WHEN (hh >> 8) > 0 THEN 53 - length(bin(hh >> 8))
                  ELSE 53 END AS rank
      FROM r),
    reg AS MATERIALIZED (
      SELECT h, bucket, max(rank) AS m FROM b GROUP BY h, bucket),
    hrs AS MATERIALIZED (SELECT DISTINCT h FROM reg),
    mg AS MATERIALIZED (
      SELECT hrs.h, rg.bucket, max(rg.m) AS m
      FROM hrs JOIN reg rg
        ON rg.h IN (hrs.h, hrs.h - 3600, hrs.h - 7200)
      GROUP BY hrs.h, rg.bucket),
    z AS MATERIALIZED (
      SELECT h,
             CAST(sum(CAST(2.0 ** (53 - m) AS BIGINT)) AS BIGINT)
             + (256 - count(*)) * 9007199254740992 AS z
      FROM mg GROUP BY h),
    ex AS MATERIALIZED (
      SELECT hrs.h, count(DISTINCT e.user_id) AS n_exact
      FROM hrs JOIN r e ON e.h IN (hrs.h, hrs.h - 3600, hrs.h - 7200)
      GROUP BY hrs.h)
    SELECT z.h, round(4.2399330249068963e+20 / z.z, 4) AS uniq_estimate,
           ex.n_exact
    FROM z JOIN ex ON ex.h = z.h
    """,
)
def q56_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-hour distinct users per hour, computed ENTIRELY from
    hourly mergeable HLL states (functions.sketches.hll_sliding_estimate
    — the uniqMerge-over-window idiom): each output hour merges 3×256
    state rows by per-bucket MAX; the fact table is scanned once to
    build the hourly states and never again.  The hash-match against
    the oracle's full rederivation proves the window merge is exactly
    a direct trailing-window sketch; exact distinct rides beside it."""
    from ..functions.sketches import (hll_registers,
                                      hll_sliding_estimate)
    ev = load_table(spark, sf_dir, "events")
    hours = ev.withColumn(
        "h", F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
    # materialize-once (r15): the register build is referenced 3× by
    # the sliding window's shift-and-union plus once by the exact
    # side's hour axis, so the corpus aggregate ran 4× (the registered
    # q56 plan read 11 Exchange / 8 corpus scans).  States are
    # |hours|·256 rows — the mergeable-sketch point is precisely that
    # this frame is tiny at any corpus scale.
    from ..llm.dedup import _materialize
    regs = _materialize(hll_registers(hours, "user_id", ["h"]))
    est = hll_sliding_estimate(regs, "h", step=3600, window=3)
    # exact side: explode the 3 window offsets on the BROADCAST hour
    # frame and equi-join — an OR-of-equalities condition cannot
    # hash-join and would run a BroadcastNestedLoopJoin over the whole
    # fact table (the g17-class join-shape pathology)
    wexp = (regs.select("h").distinct()
            .select(F.col("h").alias("wh"),
                    F.explode(F.array(F.lit(0), F.lit(3600),
                                      F.lit(7200))).alias("off"))
            .select("wh", (F.col("wh") - F.col("off")).alias("h")))
    ex = (hours.select("h", "user_id")
          .join(F.broadcast(wexp), "h")
          .groupBy(F.col("wh").alias("h"))
          .agg(F.countDistinct("user_id").alias("n_exact")))
    return est.join(ex, "h")


@query(
    "q57_jsonl_roundtrip",
    oracle="""
    SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', ts)))
                AS BIGINT) AS h,
           event_type, count(*) AS cnt,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(0 AS BIGINT) AS n_corrupt
    FROM events GROUP BY h, event_type
    """,
)
def q57_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL interchange round trip, driver-checked end to end: the
    events table is serialized to JSON-lines (timestamps as integer
    epoch-micros — JSON has no timestamp type and string formats are
    round-trip bait), read back through the corpus reader's PERMISSIVE
    quarantine path with an explicit schema, and rolled up hourly.
    The rollup must hash-match the oracle computed on the ORIGINAL
    parquet — proving the sink+source pair is lossless — and the
    corrupt-line count (0 on a clean write) rides in the result so a
    lossy serialization could not silently drop rows and still pass
    the count check (sources.formats.read_jsonl_corpus /
    write_jsonl_corpus)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..sources.formats import read_jsonl_corpus, write_jsonl_corpus
    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q57_jsonl_")
    try:
        out = os.path.join(work, "events.jsonl")
        write_jsonl_corpus(
            ev.select("event_id", "user_id", "event_type", "value",
                      "props",
                      F.unix_micros(F.col("ts")).alias("ts_us")), out)
        schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
            T.StructField("ts_us", T.LongType()),
        ])
        # Spark refuses to query the internal corrupt-record column
        # straight off a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
        # CORRUPT_RECORD_COLUMN); the documented pattern is to cache
        # the parsed frame first — fine here, the audit + rollup both
        # consume it and it unpersists before return
        back = read_jsonl_corpus(spark, out, schema).cache()
        audit = (back.agg(
            F.sum(F.col("_corrupt_record").isNotNull().cast("long"))
            .alias("n_corrupt")))
        res = (back
               .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
               .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts"))
                        .alias("h"), "event_type")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                          .cast("long")).alias("sum_cents"))
               .crossJoin(F.broadcast(audit))
               .localCheckpoint())
        back.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return res


@query(
    "q58_unpivot_measures",
    oracle="""
    WITH c AS MATERIALIZED (
      SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c
      FROM lineitem),
    long AS MATERIALIZED (
      SELECT 'l_quantity' AS measure, qty_c AS cents FROM c
      UNION ALL SELECT 'l_extendedprice', price_c FROM c
      UNION ALL SELECT 'l_discount', disc_c FROM c
      UNION ALL SELECT 'l_tax', tax_c FROM c)
    SELECT measure, CAST(sum(cents) AS BIGINT) AS sum_cents,
           count(*) AS n
    FROM long GROUP BY measure
    """,
)
def q58_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of q29's pivot surface: the four
    lineitem measures turn into (measure, value) long form via the
    DataFrame unpivot operator (ONE Expand node before the aggregate —
    the same single-pass plan shape as grouping sets, never four
    scans), then a per-measure cents-exact rollup.  The oracle states
    the portable UNION ALL equivalent."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")
    wide = li.select(cents("l_quantity").alias("l_quantity"),
                     cents("l_extendedprice").alias("l_extendedprice"),
                     cents("l_discount").alias("l_discount"),
                     cents("l_tax").alias("l_tax"))
    long = wide.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure", "cents")
    return (long.groupBy("measure")
            .agg(F.sum("cents").alias("sum_cents"),
                 F.count(F.lit(1)).alias("n")))
