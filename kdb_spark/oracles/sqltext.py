"""Oracle registry — SQL-text entry points (TPC-H-flavored business queries).

Cut verbatim from the monolithic __spark_entry__.py (r14); every key
registers a Spark query and its DuckDB oracle SQL into this module's
local dicts, merged in frozen order by kdb_spark/oracles/__init__.py.
"""

from __future__ import annotations

from kdb_spark.oracles._shared import *  # noqa: F401,F403

QUERIES, ORACLES, _reg = make_registry()


_reg(
    "sql_pricing_summary",
    lambda s, d: agg.sql_pricing_summary(load(s, d, "lineitem")),
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             AS sum_disc_price_c,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)


_reg(
    "sql_region_revenue",
    lambda s, d: agg.sql_region_revenue(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem"),
        load(s, d, "nation"), load(s, d, "region"),
    ),
    """
    SELECT r.r_name AS region, o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, o.o_orderpriority
    """,
)


_reg(
    "sql_ship_priority",
    lambda s, d: agg.sql_ship_priority(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS orderdate_us,
           o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_c DESC, l.l_orderkey LIMIT 10
    """,
)


_reg(
    "sql_returned_customers",
    lambda s, d: agg.sql_returned_customers(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem"),
        load(s, d, "nation"),
    ),
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_c DESC, c.c_custkey LIMIT 20
    """,
)


_reg(
    "sql_top_supplier",
    lambda s, d: agg.sql_top_supplier(load(s, d, "supplier"), load(s, d, "lineitem")),
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_revenue_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey),
    ranked AS (
      SELECT supplier_no, total_revenue_c,
             max(total_revenue_c) OVER () AS max_revenue_c
      FROM revenue)
    SELECT s.s_suppkey, s.s_name, r.total_revenue_c
    FROM supplier s
    JOIN ranked r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_c = r.max_revenue_c
    ORDER BY s.s_suppkey
    """,
)


_reg(
    "sql_forecast_revenue",
    lambda s, d: agg.sql_forecast_revenue(load(s, d, "lineitem")),
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST(0.05 AS DOUBLE)
      AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
    """,
)


_reg(
    "sql_nation_volume",
    lambda s, d: agg.sql_nation_volume(
        load(s, d, "lineitem"), load(s, d, "orders"), load(s, d, "customer"),
        load(s, d, "supplier"), load(s, d, "nation"),
    ),
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)


_reg(
    "sql_market_share",
    lambda s, d: agg.sql_market_share(
        load(s, d, "part"), load(s, d, "lineitem"), load(s, d, "orders"),
        load(s, d, "customer"), load(s, d, "supplier"), load(s, d, "nation"),
        load(s, d, "region"),
    ),
    """
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS vol_c,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol_c
                         ELSE 0 END) AS BIGINT) AS nation_vol_c,
           CAST(sum(vol_c) AS BIGINT) AS total_vol_c,
           CAST((2000000 * CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                         THEN vol_c ELSE 0 END) AS HUGEINT)
                 + sum(vol_c))
                // (2 * CAST(sum(vol_c) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS mkt_share
    FROM flat
    GROUP BY o_year
    """,
)


_reg(
    "sql_promo_revenue",
    lambda s, d: agg.sql_promo_revenue(load(s, d, "lineitem"), load(s, d, "part")),
    """
    SELECT year(l.l_shipdate) AS y, month(l.l_shipdate) AS m,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(round(l.l_extendedprice
                                         * (1 - l.l_discount) * 100)
                                   AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_revenue_c,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_revenue_c,
           CAST((200000000 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                           THEN CAST(round(l.l_extendedprice
                                                           * (1 - l.l_discount)
                                                           * 100) AS BIGINT)
                                           ELSE 0 END) AS HUGEINT)
                 + sum(CAST(round(l.l_extendedprice
                                  * (1 - l.l_discount) * 100) AS BIGINT)))
                // (2 * CAST(sum(CAST(round(l.l_extendedprice
                                            * (1 - l.l_discount) * 100)
                                      AS BIGINT)) AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY year(l.l_shipdate), month(l.l_shipdate)
    """,
)


_reg(
    "sql_small_qty_revenue",
    lambda s, d: agg.sql_small_qty_revenue(
        load(s, d, "lineitem"), load(s, d, "part")
    ),
    """
    WITH part_avg AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < 0.5 * pa.avg_qty
    """,
)


_reg(
    "sql_large_orders",
    lambda s, d: agg.sql_large_orders(
        load(s, d, "customer"), load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > CAST(200 AS DOUBLE))
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice_c DESC, o.o_orderkey
    LIMIT 100
    """,
)


_reg(
    "sql_bracketed_revenue",
    lambda s, d: agg.sql_bracketed_revenue(
        load(s, d, "lineitem"), load(s, d, "part")
    ),
    """
    SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN CAST(1 AS DOUBLE) AND CAST(11 AS DOUBLE))
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN CAST(10 AS DOUBLE) AND CAST(20 AS DOUBLE))
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN CAST(20 AS DOUBLE) AND CAST(30 AS DOUBLE))
    """,
)


_reg(
    "sql_idle_rich_customers",
    lambda s, d: agg.sql_idle_rich_customers(
        load(s, d, "customer"), load(s, d, "orders")
    ),
    """
    WITH avg_bal AS (
      SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT)) AS ab_c
      FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE))
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS total_bal_c
    FROM customer c, avg_bal
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > avg_bal.ab_c
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)


# ---- round-10 TPC-H-shaped SQL texts (Q4/Q12/Q13/Q21 on the trimmed schema)

_reg(
    "sql_late_orders",
    lambda s, d: agg.sql_late_orders(load(s, d, "orders"), load(s, d, "lineitem")),
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)


_reg(
    "sql_cust_distribution",
    lambda s, d: agg.sql_cust_distribution(
        load(s, d, "customer"), load(s, d, "orders")
    ),
    """
    WITH co AS (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


_reg(
    "sql_priority_lines",
    lambda s, d: agg.sql_priority_lines(
        load(s, d, "orders"), load(s, d, "lineitem")
    ),
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)


_reg(
    "sql_waiting_supplier",
    lambda s, d: agg.sql_waiting_supplier(
        load(s, d, "supplier"), load(s, d, "lineitem")
    ),
    """
    WITH sm AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS m
      FROM lineitem GROUP BY l_orderkey, l_suppkey),
    multi AS (
      SELECT l_orderkey FROM sm GROUP BY l_orderkey HAVING count(*) >= 2),
    mx AS (
      SELECT sm.l_orderkey, max(sm.m) AS mx
      FROM sm JOIN multi USING (l_orderkey)
      GROUP BY sm.l_orderkey),
    at_mx AS (
      SELECT sm.l_orderkey, CAST(count(*) AS BIGINT) AS n_at
      FROM sm JOIN mx ON mx.l_orderkey = sm.l_orderkey AND sm.m = mx.mx
      GROUP BY sm.l_orderkey),
    blamed AS (
      SELECT sm.l_suppkey
      FROM sm
      JOIN mx ON mx.l_orderkey = sm.l_orderkey AND sm.m = mx.mx
      JOIN at_mx ON at_mx.l_orderkey = sm.l_orderkey AND at_mx.n_at = 1)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)


# Q16-shaped supplier-variety census (lineitem as the supplier-part
# bridge on the trimmed schema); exact integer counts
_reg(
    "sql_part_supplier_variety",
    lambda s, d: agg.sql_part_supplier_variety(
        load(s, d, "part"), load(s, d, "lineitem")
    ),
    """
    SELECT p.p_brand,
           CASE WHEN instr(p.p_type, ' ') > 0
                THEN substring(p.p_type, 1, instr(p.p_type, ' ') - 1)
                ELSE '' END AS type_class,
           CAST(p.p_size // 10 AS BIGINT) AS size_band,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
           CAST(count(*) AS BIGINT) AS n_shipments
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM%'
    GROUP BY 1, 2, 3
    """,
)


# RFM segmentation census: exact integer recency/frequency/monetary with
# bit-math bands; the BI cohort cut as a SQL text entry
_reg(
    "sql_rfm_segments",
    lambda s, d: agg.sql_rfm_segments(load(s, d, "orders")),
    """
    WITH per AS (
      SELECT o_custkey,
             CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
                           DATE '2001-09-01') AS BIGINT) AS r_days,
             CAST(count(*) AS BIGINT) AS f_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS m_cents
      FROM orders GROUP BY 1),
    b AS (
      SELECT r_days, f_orders, m_cents,
             CAST(length(bin(r_days)) - 1 AS INT) AS r_band,
             CAST(length(bin(f_orders)) - 1 AS INT) AS f_band,
             CAST(length(bin(m_cents // 100000)) - 1 AS INT) AS m_band
      FROM per)
    SELECT r_band, f_band, m_band,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(m_cents) AS BIGINT) AS revenue_c,
           CAST(min(r_days) AS BIGINT) AS min_r_days,
           CAST(max(r_days) AS BIGINT) AS max_r_days
    FROM b GROUP BY 1, 2, 3
    """,
)


# Month-over-month revenue growth as SQL text: integer month key, exact
# cents, sign-aware device growth; the lag window sees only month rows
_reg(
    "sql_monthly_growth",
    lambda s, d: agg.sql_monthly_growth(load(s, d, "orders")),
    """
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_c
      FROM orders GROUP BY 1),
    l AS (
      SELECT ym, n_orders, revenue_c,
             lag(revenue_c) OVER (ORDER BY ym) AS prev_c
      FROM m)
    SELECT ym, n_orders, revenue_c, prev_c,
           CASE WHEN prev_c > 0 THEN
             (CASE WHEN revenue_c - prev_c < 0 THEN -1 ELSE 1 END)
             * CAST((2000000 * CAST(abs(revenue_c - prev_c) AS HUGEINT)
                     + prev_c)
                    // (2 * CAST(prev_c AS HUGEINT)) AS DOUBLE) / 1e6
           END AS mom_growth
    FROM l
    """,
)


# Repeat-purchase census per market segment: the retention KPI SQL entry
_reg(
    "sql_repeat_rate",
    lambda s, d: agg.sql_repeat_rate(load(s, d, "orders"), load(s, d, "customer")),
    """
    WITH per AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1),
    seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN p.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat,
             CAST(sum(p.n) AS BIGINT) AS n_orders
      FROM per p JOIN customer c ON c.c_custkey = p.o_custkey
      GROUP BY 1)
    SELECT segment, n_active, n_repeat, n_orders,
           CAST((2000000 * CAST(n_repeat AS HUGEINT) + n_active)
                // (2 * CAST(n_active AS HUGEINT)) AS DOUBLE) / 1e6
             AS repeat_share,
           CAST((2000000 * CAST(n_orders AS HUGEINT) + n_active)
                // (2 * CAST(n_active AS HUGEINT)) AS DOUBLE) / 1e6
             AS orders_per_active
    FROM seg
    """,
)


# Fulfillment SLA table: order-to-ship lead time per priority — device
# mean, exact p95 order statistic, late-line share
_reg(
    "sql_lead_time",
    lambda s, d: agg.sql_lead_time(load(s, d, "orders"), load(s, d, "lineitem")),
    """
    WITH ld AS (
      SELECT o.o_orderpriority AS priority,
             CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    r AS (
      SELECT priority, d,
             row_number() OVER (PARTITION BY priority ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM ld),
    g AS (
      SELECT priority,
             CAST(max(n) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS sum_days,
             CAST(sum(CASE WHEN d > 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(min(CASE WHEN rn >= (95 * n + 99) // 100 THEN d END)
                  AS BIGINT) AS p95_days
      FROM r GROUP BY 1)
    SELECT priority, n, p95_days,
           CAST((2000000 * CAST(sum_days AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS mean_days,
           CAST((2000000 * CAST(n_late AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS late_share
    FROM g
    """,
)


# LTV decile table: explicit integer decile cut over the per-customer
# aggregate (the one deliberate dimension-sized global sort, disclosed)
_reg(
    "sql_ltv_deciles",
    lambda s, d: agg.sql_ltv_deciles(load(s, d, "orders")),
    """
    WITH per AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS ltv_c
      FROM orders GROUP BY 1),
    r AS (
      SELECT o_custkey, ltv_c,
             row_number() OVER (ORDER BY ltv_c DESC, o_custkey) AS rn,
             count(*) OVER () AS n,
             sum(ltv_c) OVER () AS tot
      FROM per),
    d AS (
      SELECT CAST(((rn - 1) * 10) // n AS INT) AS decile, ltv_c, tot
      FROM r),
    g AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(ltv_c) AS BIGINT) AS ltv_c,
             CAST(max(tot) AS BIGINT) AS total_c
      FROM d GROUP BY 1)
    SELECT decile, n_customers, ltv_c,
           CAST((2000000 * CAST(ltv_c AS HUGEINT) + total_c)
                // (2 * CAST(total_c AS HUGEINT)) AS DOUBLE) / 1e6
             AS ltv_share
    FROM g
    """,
)


# Cohort revenue-retention triangle: integer month math, exact cents,
# device shares vs the age-0 cell
_reg(
    "sql_cohort_retention",
    lambda s, d: agg.sql_cohort_retention(load(s, d, "orders")),
    """
    WITH m AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS ym,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders),
    first_m AS (SELECT o_custkey, min(ym) AS cohort FROM m GROUP BY 1),
    cells AS (
      SELECT f.cohort, m.ym - f.cohort AS age,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(m.c) AS BIGINT) AS revenue_c
      FROM m JOIN first_m f ON f.o_custkey = m.o_custkey
      GROUP BY 1, 2),
    b AS (
      SELECT cohort, age, n_orders, revenue_c,
             max(CASE WHEN age = 0 THEN revenue_c END)
               OVER (PARTITION BY cohort) AS base_c
      FROM cells)
    SELECT cohort, age, n_orders, revenue_c,
           CASE WHEN base_c > 0 THEN
             CAST((2000000 * CAST(revenue_c AS HUGEINT) + base_c)
                  // (2 * CAST(base_c AS HUGEINT)) AS DOUBLE) / 1e6
           END AS revenue_retention
    FROM b
    """,
)


# ABC inventory classification: integer cumulative-share predicate over
# the part-revenue rank (the disclosed dimension-sized sort), 3-row census
_reg(
    "sql_abc_parts",
    lambda s, d: agg.sql_abc_parts(load(s, d, "lineitem")),
    """
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1),
    r AS (
      SELECT partkey, rev_c,
             sum(rev_c) OVER (ORDER BY rev_c DESC, partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_c,
             sum(rev_c) OVER () AS total_c
      FROM rev),
    cls AS (
      SELECT partkey, rev_c, total_c,
             CASE WHEN 100 * cum_c <= 80 * total_c THEN 'A'
                  WHEN 100 * cum_c <= 95 * total_c THEN 'B'
                  ELSE 'C' END AS abc
      FROM r),
    g AS (
      SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(rev_c) AS BIGINT) AS class_c,
             CAST(max(total_c) AS BIGINT) AS total_c
      FROM cls GROUP BY 1)
    SELECT abc, n_parts, class_c,
           CAST((2000000 * CAST(class_c AS HUGEINT) + total_c)
                // (2 * CAST(total_c AS HUGEINT)) AS DOUBLE) / 1e6
             AS revenue_share
    FROM g
    """,
)


# Month-of-year seasonal index: means-of-means cleared to exact rationals
_reg(
    "sql_seasonal_index",
    lambda s, d: agg.sql_seasonal_index(load(s, d, "orders")),
    """
    WITH ym AS (
      SELECT CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1, 2),
    mo AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_m,
             CAST(sum(rev_c) AS BIGINT) AS rev_c
      FROM ym GROUP BY 1),
    t AS (
      SELECT m, n_m, rev_c,
             CAST(sum(n_m) OVER () AS BIGINT) AS n_all,
             CAST(sum(rev_c) OVER () AS BIGINT) AS total_c
      FROM mo)
    SELECT m, n_m, rev_c,
           CAST((2000000 * CAST(rev_c AS HUGEINT)
                 + 100 * CAST(n_m AS HUGEINT))
                // (2 * 100 * CAST(n_m AS HUGEINT)) AS DOUBLE) / 1e6
             AS mean_month_usd,
           CASE WHEN total_c > 0 THEN
             CAST((2000000 * CAST(rev_c AS HUGEINT) * n_all
                   + CAST(n_m AS HUGEINT) * total_c)
                  // (2 * CAST(n_m AS HUGEINT) * total_c) AS DOUBLE) / 1e6
           END AS seasonal_index
    FROM t
    """,
)


# Discount-band elasticity census: exact integer bands, device mean qty
_reg(
    "sql_discount_bands",
    lambda s, d: agg.sql_discount_bands(load(s, d, "lineitem")),
    """
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS INT) AS disc_pct,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    g AS (
      SELECT disc_pct, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pc) AS BIGINT) AS revenue_c,
             CAST(sum(q) AS BIGINT) AS sum_qty
      FROM b GROUP BY 1)
    SELECT disc_pct, n, revenue_c, sum_qty,
           CAST((2000000 * CAST(sum_qty AS HUGEINT) + n)
                // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS mean_qty
    FROM g
    """,
)


# Rapid-reorder forensics: consecutive same-customer orders within 7 days
_reg(
    "sql_rapid_reorders",
    lambda s, d: agg.sql_rapid_reorders(load(s, d, "orders")),
    """
    WITH t AS (
      SELECT o_custkey, o_orderkey,
             epoch_us(o_orderdate) // 86400000000 AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders),
    l AS (
      SELECT o_custkey, day, price_c,
             day - lag(day) OVER (PARTITION BY o_custkey
                                  ORDER BY day, o_orderkey) AS gap_d
      FROM t)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN gap_d <= 7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rapid,
           CAST(min(gap_d) AS BIGINT) AS min_gap_d,
           CAST(sum(CASE WHEN gap_d <= 7 THEN price_c ELSE 0 END) AS BIGINT)
             AS rapid_c
    FROM l
    GROUP BY 1
    HAVING sum(CASE WHEN gap_d <= 7 THEN 1 ELSE 0 END) > 0
    """,
)


# Open-order aging bands vs an explicit as-of day
_reg(
    "sql_open_order_aging",
    lambda s, d: agg.sql_open_order_aging(load(s, d, "orders")),
    f"""
    WITH o AS (
      SELECT CAST(11536 - epoch_us(o_orderdate) // 86400000000
                  AS BIGINT) AS age_d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders WHERE o_orderstatus = 'O'),
    b AS (
      SELECT CAST(LEAST(age_d // 90, 8) AS BIGINT) AS band, age_d, price_c
      FROM o)
    SELECT band, CAST(band * 90 AS BIGINT) AS min_age_d,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(price_c) AS BIGINT) AS total_c,
           CAST(max(age_d) AS BIGINT) AS oldest_d
    FROM b GROUP BY 1
    """,
)


# Customer segment-migration matrix: spend quartiles H1 vs H2
_reg(
    "sql_segment_migration",
    lambda s, d: agg.sql_segment_migration(load(s, d, "orders")),
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN epoch_us(o_orderdate) // 86400000000 < 10227
                           THEN round(o_totalprice * 100) ELSE 0 END)
                  AS BIGINT) AS h1_c,
             CAST(sum(CASE WHEN epoch_us(o_orderdate) // 86400000000 >= 10227
                           THEN round(o_totalprice * 100) ELSE 0 END)
                  AS BIGINT) AS h2_c
      FROM orders GROUP BY 1),
    both_halves AS (SELECT * FROM spend WHERE h1_c > 0 AND h2_c > 0),
    seg AS (
      SELECT o_custkey, h1_c, h2_c,
             ntile(4) OVER (ORDER BY h1_c, o_custkey) AS seg_h1,
             ntile(4) OVER (ORDER BY h2_c, o_custkey) AS seg_h2
      FROM both_halves)
    SELECT CAST(seg_h1 AS BIGINT) AS seg_h1,
           CAST(seg_h2 AS BIGINT) AS seg_h2,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(h1_c) AS BIGINT) AS h1_total_c,
           CAST(sum(h2_c) AS BIGINT) AS h2_total_c
    FROM seg GROUP BY 1, 2
    """,
)


# Q9-shaped product-line profit (no partsupp in this schema: profit is the
# discounted revenue, a documented adaptation — see the impl docstring)
_reg(
    "sql_nation_product_profit",
    lambda s, d: agg.sql_nation_product_profit(
        load(s, d, "lineitem"), load(s, d, "orders"), load(s, d, "supplier"),
        load(s, d, "nation"), load(s, d, "part"),
    ),
    """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS profit_c,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
