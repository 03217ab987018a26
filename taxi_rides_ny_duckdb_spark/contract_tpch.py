"""Classic analytic query shapes (TPC-H-derived) over the driver tables.

Round-1 covered the reference's own operator inventory (SURVEY §2) plus
Q1/Q5/Q13/Q14/Q17/Q21 shapes. This module completes the canonical
analytic-shape matrix — multi-way join chains with two dimension roles,
scalar-subquery thresholds (HAVING against a global aggregate),
join-back after aggregation, NOT-EXISTS against a scalar filter, and
top-N with join enrichment. Each is the standard decision-support shape
(public TPC-H spec) re-expressed Spark-first, with a DuckDB oracle.

Scale notes apply to every query here: nation/region/supplier are
broadcast-size dims (25/5/100·sf rows); orders⨝lineitem is the one real
shuffle pair and AQE handles its post-shuffle coalescing; every filter
is placed before its join so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .contract import query
from .functions.parity import davg, dsum
from .sources.registry import load


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """Q3 shape: segment-filtered customer ⨝ orders ⨝ lineitem, revenue
    per order, top 10. The two date filters and the segment filter are
    applied pre-join (pushed to the scans); customer-after-filter is
    ~1/5 of the table, so at 100 TB this stays a shuffle join on
    o_custkey while lineitem⨝orders shuffles on the order key — two
    shuffles total, then a tiny top-K (TakeOrderedAndProject, no global
    sort). Tiebreak on l_orderkey pins the limit across engines."""
    cutoff = "1998-07-01"
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, 18, 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_trunc("day", F.col("o_orderdate")).alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """Q4 shape: EXISTS-correlated semi-join (orders with at least one
    line shipped >60 days after ordering), counted per priority class.
    LEFT SEMI keeps orders-side columns only and short-circuits on
    first match — no fan-out, no dedup needed. The non-equi residual
    (l_shipdate > o_orderdate + 60d) rides on the equi-key join.
    The reference's relationships test (J3) is the anti twin of this.

    Two scale guards, both found by the sf1 checkpoint (BASELINE.md):
    Catalyst can't derive a lineitem-side filter from a predicate that
    references BOTH sides, so the implied constraint l_shipdate >
    min(o_orderdate)+60d = 1999-03-02 is stated explicitly — it
    reaches the parquet scan and prunes most of the fact table. And
    without a hint the optimizer happily BROADCASTS the 2-column
    lineitem projection (small on disk, huge as a hashed relation —
    18× superlinear at sf1, fatal at 100 TB where lineitem is the big
    side); the merge hint pins a sort-merge semi join that shuffles
    both sides on the order key and scales symmetrically."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "1999-07-01")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        # Implied by o_orderdate >= 1999-01-01 ∧ l_shipdate > o_orderdate+60d.
        .filter(F.col("l_shipdate") > F.lit("1999-03-02"))
    )
    late = (
        orders.join(
            li.hint("merge"),
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 60)),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """Q7 shape: the same dimension (nation) in two roles — supplier
    nation and customer nation — with a symmetric pair predicate, plus
    year extraction. Both nation joins and the supplier join broadcast;
    the pair predicate is applied after the broadcasts but before the
    orders⨝lineitem shuffle pair, so only matching rows shuffle. The
    nation-pair filter cannot be pushed below the joins (it spans two
    dims), which is exactly what makes this shape worth pinning."""
    n1, n2 = "NATION_3", "NATION_8"
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(n1, n2))
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(n1, n2))
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), 18, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                           THEN CAST(volume AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)
           AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """Q8 shape: national market share — a ratio of a conditional sum
    to a total sum over an 8-table join (part, supplier, nation ×2,
    region all broadcast; the orders⨝lineitem pair is the only
    shuffle). The p_type filter prunes the probe side via the part
    broadcast; region restricts the *customer* nation while the CASE
    tests the *supplier* nation — two independent dimension roles."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = (
        nat.join(
            F.broadcast(region),
            nat["n_regionkey"] == region["r_regionkey"],
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    all_nations = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    dec = F.col("volume").cast("decimal(18,4)")
    nation_sum = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", dec).otherwise(F.lit(0))
    ).cast("double")
    total_sum = F.sum(dec).cast("double")
    return (
        all_nations.groupBy("o_year")
        .agg((nation_sum / total_sum).cast("double").alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """Q10 shape: top-20 customers by lost revenue (returned items in
    one half-year), enriched with nation via broadcast. Aggregation
    keys include the customer attributes, so the groupBy shuffle
    carries them instead of a second join-back — correct when the
    group key is already the customer grain. Pinned tiebreak on
    c_custkey makes the LIMIT deterministic cross-engine."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "2000-01-01")
            & (F.col("o_orderdate") < "2000-07-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue, 18, 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH part_value AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      FROM lineitem GROUP BY l_partkey
    ), total AS (
      SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS t,
             COUNT(DISTINCT l_partkey) AS n_parts
      FROM lineitem
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS total_value
    FROM part_value, total
    WHERE value_dec * n_parts * 10 > t * 12
    ORDER BY total_value DESC, l_partkey
    """,
)
def q11_important_parts(spark, sf_dir):
    """Q11 shape: per-key aggregate filtered against a *global* scalar
    aggregate (parts whose traded value exceeds 1.2× the per-part
    average). The scalar side is a 1-row DataFrame cross-joined in —
    Catalyst broadcasts it, so the HAVING predicate evaluates map-side
    with zero extra shuffle. The threshold is scale-invariant (relative
    to the average, not an absolute share, so selectivity holds from
    sf0.001 to 100 TB) and cross-multiplied (value × n × 10 > 12 ×
    total) so the comparison stays in exact decimal/integer arithmetic
    on both engines — a fractional multiplier would route through
    double and make the > boundary nondeterministic."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    per_part = li.groupBy("l_partkey").agg(F.sum(dec).alias("value_dec"))
    # Global side re-aggregates the per-part result instead of
    # re-scanning lineitem: decimal sums are exact, so sum-of-groups ≡
    # sum-of-rows and count(groups) ≡ count_distinct(key). AQE then
    # plans ONE lineitem scan + one grouped exchange and feeds the
    # global agg from a ReusedExchange — at 100 TB this halves the
    # dominant cost (the fact scan).
    total = per_part.agg(
        F.sum("value_dec").alias("t"), F.count("l_partkey").alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") * F.col("n_parts") * 10 > F.col("t") * 12)
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("total_value")
        )
        .orderBy(F.col("total_value").desc(), F.col("l_partkey"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """Q15 shape: argmax against an aggregate-of-an-aggregate — the
    supplier(s) whose quarterly revenue equals the max over all
    suppliers. The revenue CTE is computed once and reused for both
    the max and the join (same DataFrame object → same logical
    subtree; with exact decimals the equality survives recomputation
    even if Catalyst doesn't dedup the subtree). The max is a 1-row
    broadcast; supplier join broadcasts too."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2000-04-01")
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_dec")
    )
    best = revenue.agg(F.max("total_dec").alias("max_dec"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_dec") == F.col("max_dec"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#7'
      AND p_size IN (1, 9, 17, 25, 33, 41, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_diversity(spark, sf_dir):
    """Q16 shape: COUNT(DISTINCT) per attribute triple with an
    exclusion subquery. The NOT IN is a LEFT ANTI join against the
    (tiny, broadcast) negative-balance supplier set — NOT IN's
    null-trap doesn't bite because s_suppkey is non-null, and anti
    join is the scale-safe form regardless. The distinct-agg plans as
    two-phase (partial distinct per partition, then final), Catalyst's
    standard expansion; part attributes come in via broadcast."""
    part = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#7")
            & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: HAVING on an aggregate, then enrichment joins. The
    textbook SQL (the oracle) joins the qualifying keys BACK to raw
    lineitem and re-aggregates — but the final GROUP BY is keyed by
    the order primary key, so the re-aggregated SUM is exactly the
    ``sum_qty`` the HAVING already computed. The Spark plan exploits
    that algebraic identity (group-then-join): aggregate lineitem
    ONCE per order, filter > 180, then join orders/customer and
    project the sum — one lineitem shuffle instead of two and no
    second fact join, identical results (o_orderkey and c_custkey are
    PKs, so groups ≡ qualifying orders). ``big`` is an
    aggregation-bounded derivative but still grows with order count —
    it is joined, never broadcast. Exact-decimal HAVING keeps the
    >180 boundary deterministic; r6 rewrite measured ~2× at sf0.1
    (1.9 s → 0.9 s) and removes one of the two scale-dominant
    lineitem shuffles."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qdec).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_trunc("day", F.col("o_orderdate")).alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
             COUNT(*) AS n_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c_custkey % 10 AS INTEGER) AS bucket,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q22_dormant_customers(spark, sf_dir):
    """Q22 shape: above-average-balance customers with NO orders —
    scalar-subquery threshold (broadcast 1-row) + anti join against
    the fact, bucketed report. The anti join shuffles customer against
    orders' custkeys; at scale pre-project orders to the join key only
    (done here) so the anti side shuffles just the key column. The
    above-average test is cross-multiplied (bal × n > sum) so it stays
    in exact decimal arithmetic on both engines — decimal AVG division
    rounds differently across engines at the boundary."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    bal_dec = F.col("c_acctbal").cast("decimal(18,2)")
    threshold = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_dec).alias("sum_pos"), F.count(F.lit(1)).alias("n_pos")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(threshold))
        .filter(bal_dec * F.col("n_pos") > F.col("sum_pos"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_dec).cast("double").alias("totacctbal"),
        )
        .orderBy("bucket")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH eur_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_dec
      FROM lineitem JOIN eur_supp ON l_suppkey = s_suppkey
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey AS b_partkey, MIN(cost_dec) AS min_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT CAST(s_acctbal AS DOUBLE) AS acctbal, s_name, n_name,
           p_partkey, p_type, CAST(cost_dec AS DOUBLE) AS supply_cost
    FROM part
    JOIN costs ON p_partkey = costs.l_partkey
    JOIN best ON b_partkey = costs.l_partkey AND cost_dec = min_cost
    JOIN eur_supp ON costs.l_suppkey = s_suppkey
    WHERE p_size <= 15 AND p_type = 'STANDARD'
    ORDER BY acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: multi-level correlated MIN — for each part, the
    region's cheapest supplier(s), enriched with supplier/nation
    attributes, top-100. (The classic form reads partsupp; the driver
    tables have no partsupp, so lineitem serves as the part↔supplier
    link with MIN(l_extendedprice) as the supply cost — same
    correlated-min-then-match shape.) Expressed Spark-first the way
    Catalyst would decorrelate it: aggregate per (part, supplier) once,
    take the per-part min as a WINDOW over that aggregate — NOT a
    second aggregate joined back, which re-derives `costs` twice and
    with it the lineitem scan (plan audit: 12 scans, 0 ReusedExchange
    on that form vs 1 fact scan here) — and filter on exact-decimal
    equality (a double-valued min would make `cost = min`
    nondeterministic). One fact scan, one (part, supplier) shuffle,
    one window exchange; region suppliers and filtered parts
    broadcast."""
    from pyspark.sql.window import Window
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = load(spark, sf_dir, "nation")
    eur_supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    costs = (
        li.join(
            F.broadcast(eur_supp.select("s_suppkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("cost_dec"))
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_type")
    )
    w = Window.partitionBy("l_partkey")
    return (
        costs.withColumn("min_cost", F.min("cost_dec").over(w))
        .filter(F.col("cost_dec") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_acctbal").cast("double").alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("cost_dec").cast("double").alias("supply_cost"),
        )
        .orderBy(F.col("acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q20_part_promo_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_total,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
                      THEN CAST(l_quantity AS DECIMAL(18,2))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_2000
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped WHERE 2 * qty_2000 > qty_total
      )
    ORDER BY s_suppkey
    """,
)
def q20_part_promo_suppliers(spark, sf_dir):
    """Q20 shape: a nested semi-join chain — suppliers (in one region)
    having at least one PROMO part whose year-2000 shipments exceed
    half that (part, supplier)'s all-time shipments. (Classic Q20
    correlates partsupp availability against shipped quantity; without
    a partsupp table the same chain runs part-filter → per-(part,
    supplier) aggregate with a correlated threshold → supplier
    semi-join.) Each IN becomes LEFT SEMI: lineitem is pre-pruned by
    the broadcast part filter, the threshold is cross-multiplied
    (2·qty_2000 > qty_total) to stay in exact decimal, and the final
    semi-join feeds the (broadcast) nation/region enrichment — the
    fact table is touched once."""
    promo = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity"
    )
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    in_2000 = (F.col("l_shipdate") >= "2000-01-01") & (
        F.col("l_shipdate") < "2001-01-01"
    )
    shipped = (
        li.join(F.broadcast(promo), li["l_partkey"] == promo["p_partkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qdec).alias("qty_total"),
            F.sum(F.when(in_2000, qdec).otherwise(F.lit(0).cast("decimal(18,2)"))).alias(
                "qty_2000"
            ),
        )
    )
    qualifying = (
        shipped.filter(2 * F.col("qty_2000") > F.col("qty_total"))
        .select("l_suppkey")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    nat = load(spark, sf_dir, "nation")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qualifying, F.col("s_suppkey") == qualifying["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "q12_priority_classes",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
      AND l_returnflag IN ('A', 'R')
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_classes(spark, sf_dir):
    """Q12 shape: two-branch priority classification counted per line
    attribute after the orders⨝lineitem join. (Classic Q12 groups by
    l_shipmode with commit/receipt-date residuals; this schema has
    neither, so l_returnflag carries the group and the ship-year
    filter the selectivity — same join + CASE-classification + count
    shape.) Both CASE sums ride the single shuffle; the shipdate and
    returnflag filters push to the lineitem scan, so only matching
    lines join."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2001-01-01")
            & F.col("l_returnflag").isin("A", "R")
        )
        .select("l_orderkey", "l_returnflag")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q19_bracketed_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_bracketed_revenue(spark, sf_dir):
    """Q19 shape: a disjunction of conjunctive brackets spanning BOTH
    join sides — the OR cannot be pushed wholesale, but Catalyst
    extracts the per-side implications: the part scan keeps only the
    three brands (p_brand IN …) and lineitem only the quantity-range
    union, so each side prunes before the broadcast join and the full
    bracket predicate evaluates only on survivors. Single-row
    decimal-routed revenue output."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(dsum(revenue, 18, 4).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """Q6 shape: the canonical scan-dominated filter+aggregate — three
    conjunctive range predicates and one sum, no join, no groupBy. The
    whole query is a single whole-stage-codegen'd scan: every
    predicate reaches the parquet reader (PushedFilters + row-group
    min/max pruning), the partial sums combine map-side, and exactly
    one row crosses the wire — the pattern whose throughput IS the
    scan throughput at 100 TB."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01")
        & (F.col("l_shipdate") < "2001-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 18, 4).alias("revenue")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE)
             - CAST(SUM(CAST(p_retailprice * l_quantity AS DECIMAL(18,4)))
                AS DOUBLE) / 10 AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """Q9 shape (product-type profit): the widest join tree in the
    classic matrix — lineitem joined to part, supplier, nation AND
    orders, profit per supplier-nation per order-year. The driver
    tables carry no partsupp, so supply cost is modeled as 10% of
    p_retailprice × quantity — same join shape, same column roles
    (the cost factor comes from the part side, the year from orders).

    Completes the 22-shape TPC-H matrix (the other 21 live in this
    module and contract_reference.py — Q5=j5, Q13=j6, Q14=a9, Q17=s6,
    Q21=j7's compound-exists twin at contract_reference.py:1196).

    Scale: part is pre-filtered by the LIKE (pushed as a scan filter;
    string-contains can't prune row groups but does short-circuit rows
    before the join) and broadcast with supplier and nation — three
    broadcast hash joins riding on the lineitem scan, so the ONLY
    shuffle pair is lineitem⨝orders on the order key — merge-hinted,
    exactly like q4's lineitem side (`q4_order_priority`): at small SF
    Catalyst's size estimator sees the 2-column orders projection as
    broadcastable, but a fact-sized hashed relation is superlinear in
    memory at sf1 and fatal at 100 TB, so the hint pins sort-merge at
    every scale. Then the 2-key groupBy re-shuffles the tiny
    (nation × year) aggregate. Parity:
    both engines sum revenue and raw cost as exact decimal(18,4)
    separately, cast to double, and apply the /10 and subtraction as
    the same two IEEE ops — no double accumulation anywhere."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    raw_cost = F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            dsum(revenue, 18, 4).alias("rev"),
            dsum(raw_cost, 18, 4).alias("cost"),
        )
        .select(
            "nation",
            "o_year",
            (F.col("rev") - F.col("cost") / 10).alias("profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )
