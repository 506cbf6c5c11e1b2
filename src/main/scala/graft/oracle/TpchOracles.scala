package graft.oracle

import graft.operators
import OracleCtes._

/** DuckDB oracle SQL — TPC-H star-schema family (see OracleCtes for shared fragments). */
private[graft] object TpchOracles {
  val sql: Map[String, String] = Map(
    // Q18 shape: IN-subquery-with-HAVING decorrelated to an aggregate
    // join on the fact's own key; quantity sums are integral doubles
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200.0)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |            JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    // Q20 shape adapted (no partsupp): supplier dominates a part when
    // its shipped qty > share × the part's total shipped qty
    "q20_dominant_suppliers" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM sp GROUP BY 1),
        |f AS (
        |  SELECT l_suppkey, count(*) AS n_parts_dominated,
        |    floor(max(supp_qty / part_qty) * 10000 + 0.5) / 10000.0 AS max_share
        |  FROM sp JOIN pt USING (l_partkey)
        |  WHERE supp_qty > 0.3 * part_qty GROUP BY 1)
        |SELECT s_suppkey, s_name, n_parts_dominated, max_share
        |FROM f JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY n_parts_dominated DESC, s_suppkey""".stripMargin,
    // Q6 shape: triple-pushed-filter scan, one-row aggregate
    "q6_forecast_revenue" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    // Q9 shape: LIKE-gated 4-way join, profit by supplier nation × year
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    // Q10 shape: one-quarter returned-line revenue per customer, top 20
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
        |  c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    // Q12 adapted: late = shipped >30 days after order date; mode = linestatus
    "q12_late_priority_audit" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    // Q5 shape: one-region revenue where supplier and customer share a nation
    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    // Q7 shape: bilateral nation-pair trade volume by ship year
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    // Q13 shape: histogram of orders-per-customer (LEFT JOIN keeps zeros)
    "q13_order_count_distribution" ->
      """WITH c AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_orderkey, o_custkey FROM orders
        |    WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |  ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM c GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14 shape: conditional-ratio aggregate from ONE integer-unit pass
    "q14_promo_revenue" ->
      """WITH t AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_units,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS total_units
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT promo_units / 10000.0 AS promo_revenue,
        |  total_units / 10000.0 AS total_revenue,
        |  CASE WHEN total_units > 0
        |    THEN floor(promo_units * 100.0 / total_units * 10000 + 0.5) / 10000.0 END AS promo_pct
        |FROM t""".stripMargin,
    // Q15 shape: tie-preserving argmax over integer-unit revenue
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_units
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, rev_units / 10000.0 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_units = (SELECT max(rev_units) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // Q16 shape: distinct-supplier counts per part class, NOT-IN exclusion
    "q16_supplier_relationships" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |  AND p_brand <> 'Brand#15' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "nation_trade_flows" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cheapest_supplier_per_part" ->
      """WITH unit AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice / l_quantity * 1000 + 0.5) AS BIGINT)) AS best_milli
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY best_milli, l_suppkey) AS rn
        |  FROM unit)
        |SELECT l_partkey, l_suppkey, s_name,
        |  best_milli / CAST(1000 AS DOUBLE) AS best_unit_price
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1 ORDER BY l_partkey""".stripMargin,
    // Q11 group-vs-global-scalar HAVING; value in integer units end-to-end
    "q11_important_stock" ->
      """WITH lv AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS value_units
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_15'
        |  GROUP BY 1),
        |tot AS (SELECT sum(value_units) AS t FROM lv)
        |SELECT p_partkey, value_units / 10000.0 AS stock_value
        |FROM lv CROSS JOIN tot
        |WHERE value_units > t * 0.0001
        |ORDER BY value_units DESC, p_partkey""".stripMargin,
    "orders_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "orders_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "lineitem_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "top3_orders_per_segment" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice
        |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin,
    "tpch_integrity_audit" ->
      """WITH checks AS (
        |  SELECT 'customer.pk_unique' AS chk,
        |    CAST(count(*) AS BIGINT) AS n_checked,
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations
        |  FROM customer
        |  UNION ALL SELECT 'customer.acctbal_non_negative',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM customer
        |  UNION ALL SELECT 'orders.fk_custkey_resolves',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey AS __k FROM customer) k
        |    ON o_custkey = k.__k
        |  UNION ALL SELECT 'orders.status_in_set',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'lineitem.pk_unique',
        |    CAST(count(*) AS BIGINT),
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.qty_in_range',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.fk_orderkey_resolves',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN k.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey AS __k FROM orders) k
        |    ON l_orderkey = k.__k
        |  UNION ALL SELECT 'events.value_present',
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events)
        |SELECT chk AS "check", n_checked, n_violations
        |FROM checks ORDER BY chk""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "mktsegment_revenue" ->
      """SELECT c_mktsegment, count(*) AS order_count,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_spent,
        |  count(*) AS order_count
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spent DESC, c_custkey LIMIT 10""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "customers_with_big_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "high_value_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin,
    "customer_order_stats" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS order_count,
        |  CAST(sum(CAST(floor(COALESCE(o_totalprice, 0) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "orders_status_matrix" ->
      """SELECT o_orderpriority, count(*) AS total,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
        |  WHEN '3-MEDIUM' THEN 3 ELSE 4 END, o_orderpriority""".stripMargin,
    "union_high_low_parts" ->
      """SELECT p_partkey, p_name, 'large' AS bucket FROM part WHERE p_size >= 40
        |UNION ALL
        |SELECT p_partkey, p_name, 'small' AS bucket FROM part WHERE p_size <= 5
        |ORDER BY p_partkey""".stripMargin,
    "parts_except" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
        |WHERE p_size > 45 ORDER BY p_partkey""".stripMargin,
    "regions_cross" ->
      """SELECT r_regionkey, r_name, nation_total
        |FROM region CROSS JOIN (SELECT count(*) AS nation_total FROM nation)
        |ORDER BY r_regionkey""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // integer-exact 0.2*avg rule: qc*n*5 < sum_qc <=> qty < sum/(5n)
    "q17_small_qty_revenue" ->
      """WITH f AS (
        |  SELECT l_partkey, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |st AS (SELECT l_partkey AS ap, CAST(sum(qc) AS BIGINT) AS sum_qc,
        |              count(*) AS n
        |       FROM f GROUP BY 1)
        |SELECT count(*) AS n_lines, CAST(sum(pc) AS BIGINT) / 700.0 AS avg_yearly
        |FROM f JOIN st ON l_partkey = ap
        |WHERE qc * n * 5 < sum_qc""".stripMargin,
    // integer-exact above-average rule: bal_cents * n > sum_cents
    "q22_sales_opportunity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer),
        |st AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents, count(*) AS n FROM c),
        |big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |       CAST(sum(bal_cents) AS BIGINT) / 100.0 AS total_acctbal
        |FROM c, st
        |WHERE bal_cents * n > sum_cents
        |  AND c_custkey NOT IN (SELECT o_custkey FROM big)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // double correlation: EXISTS + NOT EXISTS on the same fact, equi
    // key + supplier inequality (Q21 shape over available columns)
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    // the pivot round-trip: wide matrix melted back to long form
    "orders_unpivot" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |    CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
        |    CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_finished,
        |    CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_pending
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, o_orderstatus, n FROM (
        |  SELECT o_orderpriority, 'O' AS o_orderstatus, n_open AS n FROM w
        |  UNION ALL SELECT o_orderpriority, 'F', n_finished FROM w
        |  UNION ALL SELECT o_orderpriority, 'P', n_pending FROM w)
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
        |    / 10000.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "orders_price_percentile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS pct_rank,
        |  floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cume
        |FROM orders WHERE o_orderkey <= 1000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT) AS vol_units,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey),
        |agg AS (
        |  SELECT o_year,
        |    CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol_units ELSE 0 END) AS BIGINT) AS nation_units,
        |    CAST(sum(vol_units) AS BIGINT) AS total_units
        |  FROM vol GROUP BY 1)
        |SELECT o_year,
        |  nation_units / CAST(10000 AS DOUBLE) AS nation_volume,
        |  total_units / CAST(10000 AS DOUBLE) AS total_volume,
        |  floor(CAST(nation_units AS DOUBLE) / total_units * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS mkt_share
        |FROM agg ORDER BY o_year""".stripMargin,
    "customer_pii_scrub" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]', 'X', 'g') AS name_redacted,
        |  CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_pii_chars,
        |  md5(regexp_replace(c_name, '[0-9]', 'X', 'g')) AS redacted_digest
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "lineitem_zorder" ->
      """WITH s0 AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_partkey & 65535 AS x0, l_suppkey & 65535 AS y0
        |  FROM lineitem),
        |s1 AS (SELECT *, (x0 | (x0 << 8)) & 16711935 AS x1, (y0 | (y0 << 8)) & 16711935 AS y1 FROM s0),
        |s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
        |m AS (SELECT l_partkey, l_suppkey, x4 | (y4 << 1) AS morton FROM s4)
        |SELECT CAST(morton >> 22 AS INT) AS zbucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(morton) AS morton_min, max(morton) AS morton_max,
        |  min(l_partkey) AS part_min, max(l_partkey) AS part_max,
        |  min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
