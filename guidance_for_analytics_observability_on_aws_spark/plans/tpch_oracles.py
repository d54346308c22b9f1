"""DuckDB oracle SQL for the OLAP group (T), mirroring ``operators/tpch.py``."""

from ..sources.telemetry import EPOCH_MS_SQL

REV = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"

TPCH_ORACLES: dict[str, str] = {}

TPCH_ORACLES["tpch_q1_pricing_summary"] = f"""
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
         CAST(SUM({REV}) AS BIGINT) AS sum_disc_price_cents,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
         CAST(SUM(CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price_cents,
       sum_disc_price_cents, sum_charge_cents,
       sum_qty / count_order AS avg_qty,
       sum_base_price_cents / 100.0 / count_order AS avg_price,
       sum_disc_bp / 10000.0 / count_order AS avg_disc,
       count_order
FROM agg
"""

TPCH_ORACLES["tpch_q3_shipping_priority"] = f"""
SELECT l_orderkey,
       epoch_ms(o_orderdate) AS order_date_ms,
       o_orderpriority,
       CAST(SUM({REV}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""

TPCH_ORACLES["tpch_q5_local_supplier"] = f"""
SELECT n_name, CAST(SUM({REV}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""

TPCH_ORACLES["tpch_q10_returned_items"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({REV}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""

TPCH_ORACLES["star_join_broadcast"] = f"""
SELECT r_name, n_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM({REV}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""

TPCH_ORACLES["window_running_totals"] = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         epoch_ms(o_orderdate) AS order_date_ms,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_orderkey, o_custkey, order_date_ms, price_cents,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_rank,
       CAST(SUM(price_cents) OVER (PARTITION BY o_custkey ORDER BY order_date_ms, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
FROM base
WINDOW w AS (PARTITION BY o_custkey ORDER BY order_date_ms, o_orderkey)
"""

TPCH_ORACLES["rollup_priority_status"] = """
SELECT COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
       COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""

TPCH_ORACLES["asof_join_attribution"] = f"""
WITH base AS (
  SELECT event_id, user_id, event_type, {EPOCH_MS_SQL} AS ev_ms
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
enriched AS (
  SELECT *,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS last_click_event_id,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN ev_ms END IGNORE NULLS)
           OVER w AS last_click_ms
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ev_ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ev_ms AS purchase_ms,
       last_click_event_id, last_click_ms,
       ev_ms - last_click_ms AS gap_ms
FROM enriched
WHERE event_type = 'purchase'
"""

TPCH_ORACLES["promo_revenue_share"] = f"""
WITH agg AS (
  SELECT p_brand,
         COUNT(*) AS n_items,
         CAST(SUM({REV}) AS BIGINT) AS revenue_cents,
         CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV} ELSE 0 END) AS BIGINT)
           AS promo_revenue_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT *, promo_revenue_cents / revenue_cents AS promo_share FROM agg
"""

TPCH_ORACLES["events_funnel"] = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN {EPOCH_MS_SQL} END) AS first_signup_ms,
         MIN(CASE WHEN event_type = 'click' THEN {EPOCH_MS_SQL} END) AS first_click_ms,
         MIN(CASE WHEN event_type = 'purchase' THEN {EPOCH_MS_SQL} END) AS first_purchase_ms
  FROM events
  GROUP BY 1
),
flags AS (
  SELECT user_id,
         first_signup_ms IS NOT NULL AS did_signup,
         first_signup_ms IS NOT NULL AND first_click_ms IS NOT NULL
           AND first_click_ms > first_signup_ms AS signup_then_click,
         first_signup_ms IS NOT NULL AND first_click_ms IS NOT NULL
           AND first_click_ms > first_signup_ms
           AND first_purchase_ms IS NOT NULL
           AND first_purchase_ms > first_click_ms AS full_funnel
  FROM per_user
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN did_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN signup_then_click THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
       CAST(SUM(CASE WHEN full_funnel THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM flags
"""

TPCH_ORACLES["tpch_q4_order_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY 1
ORDER BY 1
"""

TPCH_ORACLES["anti_join_inactive_customers"] = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1998-01-01'
)
ORDER BY c_custkey
"""

TPCH_ORACLES["tpch_q18_large_orders"] = """
SELECT c_custkey, c_name, o_orderkey,
       epoch_ms(o_orderdate) AS order_date_ms,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS total_price_cents,
       total_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING total_qty > 300
) q ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
"""

TPCH_ORACLES["tpch_q13_customer_distribution"] = """
WITH counts AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM counts
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""

TPCH_ORACLES["tpch_q19_discounted_revenue"] = f"""
SELECT p_brand,
       COUNT(*) AS n_items,
       CAST(SUM({REV}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
GROUP BY 1
"""

TPCH_ORACLES["tpch_q22_dormant_balance"] = """
WITH threshold AS (
  SELECT CAST(SUM(FLOOR(c_acctbal * 100 + 0.5)) AS BIGINT) // COUNT(*) AS avg_bal_cents
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
FROM customer, threshold
WHERE CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) > avg_bal_cents
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1
"""

TPCH_ORACLES["tpch_q12_priority_by_status"] = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""

TPCH_ORACLES["tpch_q6_forecast_revenue"] = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

TPCH_ORACLES["tpch_q15_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({REV}) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-07-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM rev)
ORDER BY s_suppkey
"""

TPCH_ORACLES["tpch_q16_supplier_counts"] = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

TPCH_ORACLES["tpch_q17_small_qty_revenue"] = """
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
pp AS (
  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty, COUNT(*) AS cnt
  FROM li GROUP BY 1
),
small AS (
  SELECT COUNT(*) AS n_items,
         COALESCE(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT), 0)
           AS total_extprice_cents
  FROM li JOIN pp USING (l_partkey)
  WHERE 5 * qty * cnt < sum_qty
)
SELECT n_items, total_extprice_cents,
       total_extprice_cents / 100.0 / 7.0 AS avg_yearly
FROM small
"""

TPCH_ORACLES["tpch_q21_waiting_supplier"] = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY 1
ORDER BY numwait DESC, s_name
"""

TPCH_ORACLES["tpch_q7_volume_shipping"] = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({REV}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
    OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

TPCH_ORACLES["tpch_q8_market_share"] = f"""
WITH agg AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {REV} ELSE 0 END) AS BIGINT)
           AS nation_revenue_cents,
         CAST(SUM({REV}) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND c_nationkey IN (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    )
  GROUP BY 1
)
SELECT o_year, nation_revenue_cents, total_revenue_cents,
       nation_revenue_cents / CAST(total_revenue_cents AS DOUBLE) AS mkt_share
FROM agg
ORDER BY o_year
"""

TPCH_ORACLES["tpch_q20_excess_share"] = """
WITH li AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
),
per_ps AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(qty) AS BIGINT) AS supp_qty
  FROM li GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total_qty FROM li GROUP BY 1
)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN per_ps ON s_suppkey = l_suppkey
JOIN per_part USING (l_partkey)
WHERE 4 * supp_qty > total_qty
ORDER BY s_suppkey
"""

TPCH_ORACLES["cube_priority_segment"] = """
SELECT COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
       COALESCE(c_mktsegment, '(all)') AS c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderpriority, c_mktsegment)
"""

_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
_PIVOT_COLS = ",\n       ".join(
    f"CAST(COALESCE(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 END), 0) AS BIGINT) AS n_{s.lower()},\n"
    f"       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = '{s}' THEN {_CENTS} END), 0) AS BIGINT) AS cents_{s.lower()}"
    for s in ("F", "O", "P")
)

TPCH_ORACLES["pivot_status_by_priority"] = f"""
SELECT o_orderpriority,
       {_PIVOT_COLS}
FROM orders GROUP BY 1
"""

TPCH_ORACLES["events_retention"] = f"""
WITH active AS (
  SELECT DISTINCT user_id, {EPOCH_MS_SQL} // 86400000 AS day FROM events
),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY 1
)
SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active_users
FROM active a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""

TPCH_ORACLES["window_lead_lag_ntile"] = f"""
WITH base AS (
  SELECT o_custkey, o_orderkey, {_CENTS} AS price_cents, o_orderdate
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents,
       LAG(price_cents) OVER w AS prev_price_cents,
       LEAD(price_cents) OVER w AS next_price_cents,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       FIRST_VALUE(price_cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
         AND CURRENT ROW) AS first_price_cents,
       price_cents - LAG(price_cents) OVER w AS delta_cents
FROM base
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

TPCH_ORACLES["set_ops_customers"] = """
WITH high AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
),
active AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderdate >= DATE '1998-01-01'
)
SELECT
  (SELECT COUNT(*) FROM (SELECT custkey FROM high INTERSECT SELECT custkey FROM active)) AS n_both,
  (SELECT COUNT(*) FROM (SELECT custkey FROM high EXCEPT SELECT custkey FROM active)) AS n_high_only,
  (SELECT COUNT(*) FROM (SELECT custkey FROM active EXCEPT SELECT custkey FROM high)) AS n_active_only
"""

TPCH_ORACLES["merge_scd1_customers"] = f"""
WITH delta AS (
  SELECT o_custkey AS custkey,
         CAST(SUM({_CENTS}) AS BIGINT) AS delta_cents
  FROM orders WHERE o_orderdate >= DATE '1998-01-01'
  GROUP BY 1
),
changes AS (
  SELECT custkey, delta_cents FROM delta
  UNION ALL
  SELECT custkey + 1000000, delta_cents FROM delta WHERE custkey % 100 = 0
),
base AS (
  SELECT c_custkey AS custkey,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS balance_cents
  FROM customer
),
merged AS (
  SELECT COALESCE(b.custkey, c.custkey) AS custkey,
         CASE WHEN b.balance_cents IS NULL THEN 'insert'
              WHEN c.delta_cents IS NULL THEN 'keep'
              ELSE 'update' END AS merge_action,
         COALESCE(b.balance_cents, 0) + COALESCE(c.delta_cents, 0) AS new_balance_cents
  FROM base b FULL OUTER JOIN changes c ON b.custkey = c.custkey
)
SELECT merge_action,
       COUNT(*) AS n_rows,
       CAST(SUM(new_balance_cents) AS BIGINT) AS sum_balance_cents,
       MIN(custkey) AS min_custkey,
       MAX(custkey) AS max_custkey
FROM merged GROUP BY 1
"""

TPCH_ORACLES["grouping_sets_mixed"] = f"""
SELECT COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
       COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM({_CENTS}) AS BIGINT) AS total_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""

TPCH_ORACLES["events_transition_matrix"] = """
WITH steps AS (
  SELECT user_id, event_type AS from_event,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_event
  FROM events
),
counts AS (
  SELECT from_event, to_event,
         COUNT(*) AS n_transitions,
         COUNT(DISTINCT user_id) AS n_users
  FROM steps WHERE to_event IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_event, to_event, n_transitions, n_users,
       n_transitions / CAST(SUM(n_transitions) OVER (PARTITION BY from_event)
                            AS BIGINT) AS p_transition
FROM counts
"""

TPCH_ORACLES["orders_seasonality"] = f"""
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS month_idx,
         COUNT(*) AS n_orders,
         CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT month_idx,
       month_idx // 12 AS year,
       month_idx % 12 + 1 AS month,
       n_orders,
       revenue_cents,
       revenue_cents - FIRST_VALUE(revenue_cents) OVER (
         ORDER BY month_idx RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING)
         AS mom_delta_cents,
       revenue_cents - FIRST_VALUE(revenue_cents) OVER (
         ORDER BY month_idx RANGE BETWEEN 12 PRECEDING AND 12 PRECEDING)
         AS yoy_delta_cents
FROM monthly
"""

TPCH_ORACLES["merge_scd2_customers"] = """
WITH ev AS (
  SELECT o_custkey AS custkey,
         epoch_ms(o_orderdate) AS valid_from_ms,
         o_orderkey AS event_id,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS spend_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       valid_from_ms,
       LEAD(valid_from_ms) OVER w AS valid_to_ms,
       CAST(SUM(spend_cents) OVER (PARTITION BY custkey ORDER BY valid_from_ms, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS balance_cents,
       LEAD(valid_from_ms) OVER w IS NULL AS is_current
FROM ev
WINDOW w AS (PARTITION BY custkey ORDER BY valid_from_ms, event_id)
"""

TPCH_ORACLES["customers_monthly_cohorts"] = """
WITH per AS (
  SELECT o_custkey AS custkey,
         CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT) AS mo
  FROM orders
),
monthly AS (
  SELECT mo, COUNT(*) AS n_orders,
         CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_active_customers
  FROM per GROUP BY 1
),
first_mo AS (SELECT custkey, MIN(mo) AS mo FROM per GROUP BY 1),
news AS (SELECT mo, COUNT(*) AS n_new_customers FROM first_mo GROUP BY 1),
joined AS (
  SELECT m.mo, m.n_orders, m.n_active_customers,
         CAST(COALESCE(n.n_new_customers, 0) AS BIGINT) AS n_new_customers
  FROM monthly m LEFT JOIN news n USING (mo)
)
SELECT *,
       CAST(SUM(n_new_customers) OVER (ORDER BY mo
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_distinct_customers
FROM joined
"""

TPCH_ORACLES["tpch_q9_profit"] = f"""
WITH named_parts AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 10 + 0.5) AS BIGINT) AS unit_cost_cents
  FROM part WHERE p_name LIKE '%bolt%'
)
SELECT n.n_name AS supp_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({REV} - p.unit_cost_cents * CAST(l_quantity AS BIGINT)) AS BIGINT)
         AS profit_cents,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN named_parts p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
ORDER BY 1, 2
"""

TPCH_ORACLES["tpch_q11_important_parts"] = f"""
WITH per_part AS (
  SELECT p.p_partkey, p.p_brand,
         CAST(SUM({REV}) AS BIGINT) AS revenue_cents,
         COUNT(*) AS n_lineitems
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
total AS (
  SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM per_part
)
SELECT p_partkey, p_brand, revenue_cents, n_lineitems,
       revenue_cents / CAST(total_cents AS DOUBLE) AS share
FROM per_part, total
WHERE revenue_cents * 2000 > total_cents
ORDER BY revenue_cents DESC, p_partkey
"""

TPCH_ORACLES["customers_abc_pareto"] = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
total AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total_cents FROM per_cust),
ranked AS (
  SELECT p.*, t.total_cents,
         CAST(ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, o_custkey)
              AS BIGINT) AS revenue_rank,
         CAST(SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM per_cust p, total t
)
SELECT o_custkey, n_orders, revenue_cents, revenue_rank, cum_cents,
       cum_cents / CAST(total_cents AS DOUBLE) AS cum_share,
       CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
            WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""

TPCH_ORACLES["customers_rfm_segments"] = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, n_orders, revenue_cents,
         CAST(NTILE(5) OVER (ORDER BY last_order, o_custkey) AS BIGINT) AS r_score,
         CAST(NTILE(5) OVER (ORDER BY n_orders, o_custkey) AS BIGINT) AS f_score,
         CAST(NTILE(5) OVER (ORDER BY revenue_cents, o_custkey) AS BIGINT) AS m_score
  FROM per_cust
)
SELECT *,
       r_score * 100 + f_score * 10 + m_score AS rfm_code,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            ELSE 'regular' END AS segment
FROM scored
"""

TPCH_ORACLES["tpch_q2_min_cost_supplier"] = """
WITH region_suppliers AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
pair_costs AS (
  SELECT l.l_partkey AS p_partkey, p.p_size, l.l_suppkey AS s_suppkey,
         MIN(CAST(FLOOR(l.l_extendedprice / l.l_quantity * 100 + 0.5) AS BIGINT))
           AS cost_cents
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD'
    AND l.l_suppkey IN (SELECT s_suppkey FROM region_suppliers)
  GROUP BY 1, 2, 3
),
best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                                 ORDER BY cost_cents, s_suppkey) AS rn
    FROM pair_costs
  ) WHERE rn = 1
)
SELECT b.p_partkey, b.p_size, b.s_suppkey, rs.s_name, rs.n_name,
       rs.s_acctbal, b.cost_cents
FROM best b
JOIN region_suppliers rs ON rs.s_suppkey = b.s_suppkey
ORDER BY rs.s_acctbal DESC, rs.n_name, rs.s_name, b.p_partkey
LIMIT 100
"""

TPCH_ORACLES["events_rolling_wau"] = """
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events
),
span AS (SELECT MAX(day) AS last_day FROM pairs),
covered AS (
  SELECT p.user_id,
         unnest(generate_series(p.day, LEAST(p.day + 6, s.last_day))) AS report_day
  FROM pairs p, span s
)
SELECT report_day * 86400000 AS report_day_ms,
       COUNT(DISTINCT user_id) AS rolling_active_users
FROM covered
GROUP BY 1
"""

# T44: market-basket association rules over brand co-purchases; BIGINT
# counts/products, final IEEE divisions — mirrors the builder op-for-op.
TPCH_ORACLES["orders_market_basket"] = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
nb AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM baskets
),
items AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY 1
),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_co
  FROM baskets a
  JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= 20
)
SELECT pr.brand_a, pr.brand_b, pr.n_co,
       ia.n_item AS n_a, ib.n_item AS n_b, nb.n_baskets,
       pr.n_co / ia.n_item AS confidence_a_b,
       pr.n_co / ib.n_item AS confidence_b_a,
       (nb.n_baskets * pr.n_co) / (ia.n_item * ib.n_item) AS lift
FROM pairs pr
JOIN items ia ON ia.p_brand = pr.brand_a
JOIN items ib ON ib.p_brand = pr.brand_b
CROSS JOIN nb
"""

# T45: order→ship latency percentiles per priority; day quotients are
# exact (midnight-aligned timestamps), shared order-statistic convention.
TPCH_ORACLES["orders_ship_latency"] = """
WITH base AS (
  SELECT o.o_orderpriority, l.l_orderkey, l.l_linenumber,
         (epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate)) // 86400000
           AS lat_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY lat_days, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM base
),
agg AS (
  SELECT o_orderpriority,
         CAST(MAX(n) AS BIGINT) AS n_lines,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.25) AS BIGINT)
                  THEN lat_days END) AS p25_days,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.5) AS BIGINT)
                  THEN lat_days END) AS p50_days,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.75) AS BIGINT)
                  THEN lat_days END) AS p75_days,
         MAX(CASE WHEN rn - 1 = CAST(FLOOR((n - 1) * 0.99) AS BIGINT)
                  THEN lat_days END) AS p99_days,
         MAX(lat_days) AS max_days,
         CAST(SUM(CASE WHEN lat_days > 120 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_over_sla
  FROM ranked GROUP BY 1
)
SELECT o_orderpriority, n_lines, p25_days, p50_days, p75_days, p99_days,
       max_days, n_over_sla,
       n_over_sla / n_lines AS sla_breach_share
FROM agg
"""


# T46: open-order backlog sweep line — midnight-aligned epoch-day
# quotients, per-order last ship date, running (opens - closes).
TPCH_ORACLES["orders_backlog_timeline"] = """
WITH last_ship AS (
  SELECT l_orderkey, MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey, o_orderdate, last_ship
  FROM orders JOIN last_ship ON o_orderkey = l_orderkey
),
deltas AS (
  SELECT epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 86400000 AS day_num,
         CAST(1 AS BIGINT) AS opened, CAST(0 AS BIGINT) AS closed
  FROM o
  UNION ALL
  SELECT epoch_ms(CAST(last_ship AS TIMESTAMP)) // 86400000 + 1 AS day_num,
         CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  FROM o
),
per_day AS (
  SELECT day_num, CAST(SUM(opened) AS BIGINT) AS n_opened,
         CAST(SUM(closed) AS BIGINT) AS n_closed
  FROM deltas GROUP BY 1
)
SELECT day_num, n_opened, n_closed,
       CAST(SUM(n_opened - n_closed) OVER (ORDER BY day_num
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS backlog
FROM per_day
"""

# T47: windowFunnel — the two window passes mirror the builder exactly;
# RANGE … 1 PRECEDING keeps the strict-before semantics value-based.
TPCH_ORACLES["events_funnel_windowed"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ev_ms
  FROM events
),
p1 AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'signup' THEN ev_ms END) OVER (
           PARTITION BY user_id ORDER BY ev_ms
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ls_ms
  FROM ev
),
p2 AS (
  SELECT *,
         MAX(CASE WHEN event_type = 'click' THEN ls_ms END) OVER (
           PARTITION BY user_id ORDER BY ev_ms
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_ms
  FROM p1
),
per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS d1,
         MAX(CASE WHEN event_type = 'click' AND ls_ms IS NOT NULL
                   AND ev_ms - ls_ms <= 21600000 THEN 1 ELSE 0 END) AS d2,
         MAX(CASE WHEN event_type = 'purchase' AND best_ms IS NOT NULL
                   AND ev_ms - best_ms <= 21600000 THEN 1 ELSE 0 END) AS d3
  FROM p2 GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(d1) AS BIGINT) AS n_signup,
         CAST(SUM(d2) AS BIGINT) AS n_click_in_window,
         CAST(SUM(d3) AS BIGINT) AS n_full_funnel_in_window
  FROM per_user
)
SELECT *,
       CASE WHEN n_signup = 0 THEN NULL
            ELSE n_click_in_window / n_signup END AS conv_click,
       CASE WHEN n_signup = 0 THEN NULL
            ELSE n_full_funnel_in_window / n_signup END AS conv_full
FROM agg
"""


# T48: multi-touch attribution — per-user click×purchase lookback join,
# recency-desc touch ranks, exact SIGN-SAFE largest-remainder cent split
# (pmod remainder + exactly-divisible floor share, so DuckDB // and
# Spark DIV agree for negative refund cents too).
TPCH_ORACLES["events_attribution_multitouch"] = """
WITH clicks AS (
  SELECT user_id, event_id AS click_event_id, epoch_ms(ts) AS click_ms
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, event_id AS purchase_event_id, epoch_ms(ts) AS purchase_ms,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS purchase_cents
  FROM events WHERE event_type = 'purchase'
),
touched AS (
  SELECT p.*, c.click_event_id, c.click_ms
  FROM purchases p JOIN clicks c USING (user_id)
  WHERE c.click_ms < p.purchase_ms
    AND c.click_ms >= p.purchase_ms - 604800000
),
ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (PARTITION BY purchase_event_id
              ORDER BY click_ms DESC, click_event_id DESC) AS BIGINT)
           AS touch_rank,
         CAST(COUNT(*) OVER (PARTITION BY purchase_event_id) AS BIGINT)
           AS n_touches
  FROM touched
)
SELECT purchase_event_id, user_id, purchase_ms, purchase_cents,
       click_event_id, click_ms, touch_rank, n_touches,
       CASE WHEN n_touches = 1 THEN 'only'
            WHEN touch_rank = n_touches THEN 'first'
            WHEN touch_rank = 1 THEN 'last'
            ELSE 'middle' END AS position,
       CAST((purchase_cents - ((purchase_cents % n_touches) + n_touches)
                              % n_touches) // n_touches
            + CASE WHEN touch_rank <= ((purchase_cents % n_touches)
                                       + n_touches) % n_touches
                   THEN 1 ELSE 0 END AS BIGINT) AS credit_cents
FROM ranked
"""
