"""Star-schema analytics exercising Catalyst end-to-end.

The reference has no SQL corpus (SURVEY.md §5.5) — these queries exist because
"same capabilities on Spark" inherits the whole relational engine, and they
are the plans whose physical shape matters most at 100 TB: pushed scans,
broadcast dimension joins, partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..core.registry import register


@register(
    "q_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)       AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)  AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                                                                            AS sum_disc_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS avg_qty,
               count(*)                                                     AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
    tags=("agg", "group", "relational"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem.

    The classic partial-aggregation showcase: billions of rows reduce to a
    handful of (returnflag, linestatus) groups map-side before the shuffle.
    Decimal folds keep the float sums order-independent (engine parity rule).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_star_join",
    oracle="""
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                                                             AS revenue,
               count(*)                                      AS n_lineitems
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        GROUP BY r.r_name, n.n_name
        """,
    tags=("join", "group", "relational"),
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation: 4-way star join with broadcast dimensions.

    customer/nation/region are dimension-sized at every SF, so they are
    explicitly broadcast — the fact table (lineitem) is never shuffled for
    them. Only the lineitem<->orders join moves big data, and AQE handles any
    orderkey skew. This is the join topology every reference "resolution
    strategy" approximates (small side replicated to the big side's tasks).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.to_date("o_orderdate") <= F.lit("1996-12-31").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


@register(
    "q_top_parts",
    oracle="""
        SELECT p_brand, p_partkey, p_name, total_qty
        FROM (
          SELECT p.p_brand, p.p_partkey, p.p_name,
                 CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
                 row_number() OVER (
                   PARTITION BY p.p_brand
                   ORDER BY CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) DESC, p.p_partkey
                 ) AS rk
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand, p.p_partkey, p.p_name
        )
        WHERE rk <= 3
        """,
    tags=("join", "window", "topk", "relational"),
)
def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by shipped quantity within each brand (windowed top-k).

    Generalizes the reference's min-by selection (§2.6) to grouped top-k:
    aggregate first (shrinks to |part| rows), then rank within brand — the
    window runs on the aggregated table, never on raw lineitem.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("total_qty"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("total_qty").desc(), F.col("p_partkey"))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "total_qty")
    )


@register(
    "q_ship_priority",
    oracle="""
        SELECT l_orderkey, revenue, order_date, o_orderpriority
        FROM (
          SELECT l.l_orderkey,
                 CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                                                 AS revenue,
                 CAST(o.o_orderdate AS DATE)     AS order_date,
                 o.o_orderpriority
          FROM customer c
          JOIN orders o   ON c.c_custkey = o.o_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          WHERE c.c_mktsegment = 'BUILDING'
            AND CAST(o.o_orderdate AS DATE) < DATE '1996-06-01'
            AND CAST(l.l_shipdate AS DATE) > DATE '1996-06-01'
          GROUP BY 1, 3, 4
        )
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """,
    tags=("join", "group", "topk", "relational"),
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: top-10 unshipped orders by revenue.

    Both selective filters (market segment, date window) sit on the scan
    side of their joins, so pushdown shrinks every input before any shuffle;
    customer is dimension-sized and broadcast. The final top-10 is a
    TakeOrderedAndProject — no full sort of the aggregate — with l_orderkey
    as the deterministic tie-break (engine parity rule for LIMIT).
    """
    cutoff = F.lit("1996-06-01").cast("date")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.to_date("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.to_date("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)"))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
    )


@register(
    "q_local_volume",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                                               AS revenue,
               count(*)                        AS n_lineitems
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        GROUP BY 1
        """,
    tags=("join", "group", "relational"),
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: revenue where the customer and
    the lineitem's supplier share a nation, grouped by nation in one region.

    The interesting join is supplier: its key is composite
    (l_suppkey = s_suppkey AND s_nationkey = c_nationkey) — the second
    conjunct correlates two dimensions through the fact row. All four
    dimensions broadcast, so lineitem<->orders is the only shuffled join;
    the region filter prunes nations before the fact table ever sees them.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.to_date("o_orderdate") <= F.lit("1996-12-31").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,10)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# correlated EXISTS through the SQL front door
# ---------------------------------------------------------------------------

_LATE_ORDERS_SQL = """
    SELECT o_orderpriority,
           count(*) AS order_count
    FROM {orders} o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM {lineitem} l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@register(
    "q_late_orders",
    oracle=_LATE_ORDERS_SQL.format(orders="orders", lineitem="lineitem"),
    tags=("sql", "subquery", "semi-join"),
)
def q_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS, submitted as SQL text.

    Every other registered query declares its plan through the DataFrame
    API; this one goes through the engine's SQL front door (spark.sql over
    temp views) to exercise the parser + analyzer path and Catalyst's
    subquery decorrelation: the correlated EXISTS — whose inner predicate
    references BOTH sides (l_shipdate > o_orderdate + 90 days), more than a
    key match — must be rewritten into a left-semi join with the correlated
    predicate pulled into the join condition. The identical SQL text is the
    DuckDB oracle, modulo view names.

    Scale: after decorrelation the plan is a semi join on l_orderkey with
    the date filter pushed to the orders scan; the lineitem side prunes to
    two columns. Semi-join output is bounded by the orders side, and the
    priority rollup is a 5-row aggregate.
    """
    ov = "q_late_orders_orders"
    lv = "q_late_orders_lineitem"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(ov)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(lv)
    return spark.sql(_LATE_ORDERS_SQL.format(orders=ov, lineitem=lv))


LARGE_ORDER_QTY = 180  # total-quantity threshold (TPC-H Q18 uses 300 at SF1)


@register(
    "q_large_orders",
    oracle=f"""
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
          FROM lineitem
          GROUP BY 1
          HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > {LARGE_ORDER_QTY}
        )
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               b.total_qty
        FROM big b
        JOIN orders o   ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        """,
    tags=("join", "having", "tpch-q18"),
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers holding large-volume orders.

    The group-HAVING-join-back pattern: aggregate the fact table to find
    qualifying orders, then join the qualifier set back to orders and
    customer. Scale story: the only full-table shuffle is the lineitem
    groupBy on l_orderkey. The fixture threshold keeps ~10% of orders, so
    the qualifier join is left to AQE — a FORCED broadcast hint here would
    bypass AQE's size demotion and try to collect billions of rows at large
    SF (at TPC-H's own threshold the set is a genuine sliver and AQE
    broadcasts it anyway). Quantity folds through DECIMAL so the HAVING cut
    is exact on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy(F.col("l_orderkey"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > LARGE_ORDER_QTY)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "total_qty",
        )
    )


@register(
    "q_promo_revenue",
    oracle="""
        SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))
                 ELSE CAST(0 AS DECIMAL(38,10)) END) AS DOUBLE)  AS promo_revenue,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                                                                 AS total_revenue,
               count(*)                                          AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1997-10-01'
        """,
    tags=("join", "agg", "relational"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one ship month.

    Conditional aggregation over a fact-dimension join: the date predicate
    pushes to the lineitem scan (one month survives), part BROADCASTS, and
    the conditional sums partial-aggregate map-side into a single row. The
    promo share is computed by the caller from the two exact decimal-folded
    sums — emitting both (instead of the ratio) keeps the hash comparison on
    exactly-reproducible values.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev.cast("decimal(38,10)")).otherwise(
                    F.lit(0).cast("decimal(38,10)")
                )
            )
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev.cast("decimal(38,10)")).cast("double").alias("total_revenue"),
            F.count("*").alias("n_items"),
        )
    )


#: Q19-shaped OR-of-ANDs predicate: three (brand, size-range, qty-range)
#: branches — the disjunctive-pushdown stress case
_Q19_BRANCHES = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#13", 10, 30, 10, 35),
    ("Brand#20", 20, 50, 20, 50),
)

_Q19_SQL_PRED = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {s0} AND {s1} AND l_quantity BETWEEN {q0} AND {q1})"
    for b, s0, s1, q0, q1 in _Q19_BRANCHES
)


@register(
    "q_disjunct_revenue",
    oracle=f"""
        SELECT count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                 AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE {_Q19_SQL_PRED}
        """,
    tags=("join", "filter", "relational"),
)
def q_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs cross-table predicate.

    The disjunctive-predicate stress case: three (brand, size, quantity)
    branches where each conjunct spans both tables, so no single branch can
    be pushed wholesale. Catalyst extracts the common single-side residues
    (brand IN set, size/quantity hull ranges) for scan-level pruning and
    evaluates the full disjunction after the broadcast join — the part side
    stays dimension-sized, the fact side is scanned once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    pred = None
    for brand, s0, s1, q0, q1 in _Q19_BRANCHES:
        branch = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )
        pred = branch if pred is None else (pred | branch)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(pred).agg(
        F.count("*").alias("n_items"),
        F.sum(rev.cast("decimal(38,10)")).cast("double").alias("revenue"),
    )


@register(
    "q_returned_revenue",
    oracle="""
        SELECT c_custkey,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS DOUBLE)
                 AS lost_revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE l_returnflag = 'R'
          AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
        GROUP BY c_custkey
        HAVING count(*) >= 5
        """,
    tags=("join", "agg", "relational"),
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer.

    The shape q_ship_priority/q_promo_revenue do NOT cover: the group key
    (customer) is high-cardinality, so neither the qualifier set nor the
    grouped result is broadcastable — this is the genuine shuffle-join +
    shuffle-agg path. Scale: the returnflag + ship-year predicates push to
    the lineitem scan (a small slice survives), the orders join shuffles on
    orderkey with AQE sizing the partitions, customer broadcasts (dimension),
    and the revenue sums partial-aggregate map-side before the custkey
    shuffle. Decimal folds keep the HAVING cut and sums engine-exact.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R")
        & (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev.cast("decimal(38,10)")).cast("double").alias("lost_revenue"),
        )
        .filter(F.col("n_items") >= 5)
    )
