package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The correlated-subquery / decorrelation family of TPC-H query shapes
  * (Q2, Q8, Q11, Q12, Q13, Q15, Q16, Q17, Q18, Q20, Q21, Q22 — adapted
  * to the testdata's simplified star schema; partsupp-dependent queries
  * use lineitem as the supply catalog), completing the analytic surface
  * next to
  * [[Analytics]]'s scan/join/window family.
  *
  * Each scalar or EXISTS subquery is expressed as the decorrelated plan a
  * Catalyst rewrite would produce — a grouped aggregate joined back on the
  * correlation key, or a left-semi/left-anti self-join — so the shuffle
  * structure is explicit and reviewable instead of hidden behind a
  * correlated-SQL rewrite. Scale notes per query; the oracle states the
  * subquery form so a green row proves the decorrelation preserved
  * semantics.
  */
object AnalyticsSubqueries {

  /** TPC-H Q8-style national market share: NATION_2's slice of supplier
    * volume sold to ASIA customers in PROMO parts, by order year.
    *
    * Scale: nation/region are fixed-cardinality (25/5 rows) and hinted;
    * part/customer/supplier are SF-scaled so AQE decides; the two fact
    * shuffles (lineitem⋈orders on orderkey, then on custkey) are the
    * unavoidable ones. The share division happens once per year group. */
  def marketShare(t: Tables): DataFrame = {
    val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem
      .join(t.part.filter(col("p_type") === "PROMO"), col("l_partkey") === col("p_partkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation).as("cn"), col("c_nationkey") === col("cn.n_nationkey"))
      .join(broadcast(t.region).filter(col("r_name") === "ASIA"),
        col("cn.n_regionkey") === col("r_regionkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation).as("sn"), col("s_nationkey") === col("sn.n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("sn.n_name") === "NATION_2", volume).otherwise(lit(0.0))) / sum(volume),
        4).as("mkt_share"))
      .orderBy("o_year")
  }

  private val marketShareSql =
    """SELECT year(o_orderdate) AS o_year,
      |  round(sum(CASE WHEN sn.n_name='NATION_2' THEN l_extendedprice*(1-l_discount) ELSE 0 END)
      |        / sum(l_extendedprice*(1-l_discount)), 4) AS mkt_share
      |FROM lineitem JOIN part ON l_partkey=p_partkey
      |JOIN orders ON l_orderkey=o_orderkey
      |JOIN customer ON o_custkey=c_custkey
      |JOIN nation cn ON c_nationkey=cn.n_nationkey
      |JOIN region ON cn.n_regionkey=r_regionkey
      |JOIN supplier ON l_suppkey=s_suppkey
      |JOIN nation sn ON s_nationkey=sn.n_nationkey
      |WHERE p_type='PROMO' AND r_name='ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q12-style shipping-delay priority split: lines bucketed by
    * ship-vs-order delay, with conditional counts of high/low-priority
    * orders per bucket — one fact join, one tiny aggregate. (The schema
    * has no commit/receipt dates, so the delay is shipdate − orderdate.) */
  def shipDelayPriority(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, lit("late"))
          .otherwise(lit("ontime")))
      .groupBy(col("delay_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("delay_bucket")

  private val shipDelayPrioritySql =
    """SELECT (CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60 THEN 'late' ELSE 'ontime' END) AS delay_bucket,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    * with a join-clause filter (customers with zero qualifying orders must
    * survive with count 0), then a second aggregation over the counts.
    *
    * Scale: the first groupBy is on c_custkey (full key space, the big
    * shuffle); the second is on c_count (tiny domain) — partial map-side
    * combine collapses it before the exchange. */
  def custOrderDistribution(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val custOrderDistributionSql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey=o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, then
    * the suppliers hitting the global max — the scalar `= (SELECT max …)`
    * subquery decorrelated into a 1-row aggregate joined back (broadcast:
    * it is always exactly one row, regardless of SF).
    *
    * Without care Spark plans the `rev` subtree TWICE (once per join
    * side) and shuffle merge order is nondeterministic, so the two float
    * sums of the same group can differ in the last ulp — an
    * exact-equality join would then intermittently drop the winner,
    * while widening the equality (e.g. to 4 dp) would diverge from exact
    * argmax semantics by emitting every round-equal supplier. `rev` is
    * therefore eagerly `localCheckpoint`ed — both the max and the join
    * probe read the SAME materialized floats, so exact `=` is sound, and
    * the truncated lineage means a lost block fails loud instead of
    * silently recomputing different last-ulp sums. Unlike `persist`,
    * the blocks are freed when the frame is garbage-collected (no
    * CacheManager entry pinned for the session's lifetime). The frame is
    * one row per active supplier (manifest-scale at any SF), and the max
    * side stays a 1-row broadcast. */
  def topSupplier(t: Tables): DataFrame = {
    val rev = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
      .localCheckpoint()
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue"), 4).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val topSupplierSql =
    """WITH rev AS (
      |  SELECT l_suppkey, sum(l_extendedprice*(1-l_discount)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(total_revenue,4) AS total_revenue
      |FROM supplier JOIN rev ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: lines of one brand whose
    * quantity is below 20% of that part's average — the correlated
    * per-part AVG decorrelated into a grouped aggregate joined back on
    * partkey.
    *
    * Scale: the brand filter is pushed into the average's input via the
    * part-key semi-join, so the avg aggregates ~1/25th of the fact instead
    * of every part's lines. The threshold is rounded to 4dp on both sides
    * to pin the float boundary. */
  def smallQtyRevenue(t: Tables): DataFrame = {
    val brandParts = t.part.filter(col("p_brand") === "Brand#5").select(col("p_partkey"))
    val partAvg = t.lineitem
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("ap_partkey"))
      .agg(round(avg(col("l_quantity")) * 0.2, 4).as("qty_threshold"))
    t.lineitem
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
  }

  private val smallQtyRevenueSql =
    """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand='Brand#5'),
      |pa AS (SELECT l_partkey AS ap_partkey, round(avg(l_quantity)*0.2, 4) AS qty_threshold
      |       FROM lineitem JOIN bp ON l_partkey = p_partkey GROUP BY l_partkey)
      |SELECT round(sum(l_extendedprice)/7.0, 4) AS avg_yearly
      |FROM lineitem JOIN bp ON l_partkey = p_partkey
      |JOIN pa ON l_partkey = ap_partkey
      |WHERE l_quantity < qty_threshold""".stripMargin

  /** TPC-H Q18-style large-volume customers: orders whose total line
    * quantity clears a threshold (HAVING over a fact-wide groupBy), joined
    * back to orders+customer. Quantities are integral so the HAVING
    * boundary is exact in both engines. */
  def largeVolumeCustomers(t: Tables): DataFrame =
    t.orders
      .join(
        t.lineitem.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300),
        col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 4).as("o_totalprice_r"),
        round(col("sum_qty"), 4).as("sum_qty"))
      .orderBy(col("o_totalprice_r").desc, col("o_orderkey"))
      .limit(100)

  private val largeVolumeCustomersSql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |  round(o_totalprice,4) AS o_totalprice_r, round(sum_qty,4) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
      |  ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice_r DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q21-style waiting suppliers: NATION_7 suppliers whose line was
    * the only late one (> 60 days after order date) on a multi-supplier
    * completed order.
    *
    * The EXISTS/NOT EXISTS pair collapses into ONE per-order aggregate:
    * "another supplier exists" ⇔ the order has ≥ 2 distinct suppliers,
    * and "no OTHER supplier is late" ⇔ (given this supplier IS late) the
    * order has exactly 1 distinct late supplier. Self-joining `lines`
    * three times (the naive semi/anti decorrelation) would re-execute the
    * lineitem⋈orders subtree per reference — Catalyst shares exchanges,
    * not whole subplans; the aggregate form computes lateness in one
    * genuine pass and joins the per-order stats back once, on orderkey.
    *
    * The distinct-supplier counts are staged as (order, supplier) →
    * order plain aggregates rather than two count_distincts — the
    * multi-distinct form plans through Expand (the fact duplicated per
    * distinct column in the shuffle); two stacked hash aggregates
    * map-side combine instead. BOTH consumers (the per-order stats and
    * the late-supplier rows carrying the wait counts) hang off the same
    * (order, supplier) aggregate, so everything downstream works on
    * order×supplier-sized relations. (Catalyst prunes g_suppkey from the
    * stats copy, so the two aggregate subtrees canonicalize differently
    * and only the orders broadcast is runtime-reused — the lineitem scan
    * still runs once per consumer; measured at 10×: 13.5M input rows /
    * 47 MB peak vs 21M / 178 MB for the semi/anti-join form.) */
  def waitingSuppliers(t: Tables): DataFrame = {
    val perSupp = t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")).as("late"))
      .groupBy(col("l_orderkey").as("g_orderkey"), col("l_suppkey").as("g_suppkey"))
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late_lines"))
    val ordStats = perSupp
      .groupBy(col("g_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("n_late_lines") > 0, 1L).otherwise(0L)).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("g_orderkey").as("q_orderkey"))
    perSupp.filter(col("n_late_lines") > 0)
      .join(ordStats, col("g_orderkey") === col("q_orderkey"))
      .join(t.supplier, col("g_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation).filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  private val waitingSuppliersSql =
    """WITH lines AS (
      |  SELECT l_orderkey, l_suppkey,
      |         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, count(*) AS numwait
      |FROM lines l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE l1.late
      |  AND n_name = 'NATION_7'
      |  AND EXISTS (SELECT 1 FROM lines l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lines l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** TPC-H Q22-style idle high-balance segments: customers (bucketed by a
    * substring "country code" of the zero-padded name) whose balance beats
    * the positive-balance average and who placed no order since 2000 —
    * scalar AVG subquery (1-row broadcast) + NOT EXISTS (left-anti join).
    *
    * Scale: the anti-join's right side is pre-filtered to recent orders
    * (the correlation predicate pushed down), so the shuffle carries the
    * date-sliced fact, not all orders. */
  def idleBalanceSegments(t: Tables): DataFrame = {
    val base = t.customer
      .withColumn("cntrycode", substring(col("c_name"), 17, 2))
      .filter(col("cntrycode").isin("13", "31", "23", "29", "30", "18", "17"))
    val avgBal = base.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val recent = t.orders
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    base.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 4).as("totacctbal"))
      .orderBy("cntrycode")
  }

  private val idleBalanceSegmentsSql =
    """WITH base AS (
      |  SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey FROM customer
      |  WHERE substring(c_name, 17, 2) IN ('13','31','23','29','30','18','17'))
      |SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal),4) AS totacctbal
      |FROM base
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM base WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin

  /** TPC-H Q2 shape — correlated MIN in WHERE (the min-cost supplier per
    * part). The testdata has no partsupp, so lineitem stands in as the
    * supply catalog: keep (part, supplier, price) rows whose price IS the
    * part's minimum. `min` is order-independent and the equality compares
    * stored doubles, so both engines agree exactly.
    *
    * Scale: the correlated `= (SELECT min …)` decorrelates to a per-part
    * aggregate joined back on the part key — one extra shuffle over the
    * same key the probe join already uses; supplier/nation sides
    * broadcast or AQE-decide. */
  def minCostSupplier(t: Tables): DataFrame = {
    val minCost = t.lineitem.groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("min_cost"))
    t.lineitem
      .join(minCost, Seq("l_partkey"))
      .filter(col("l_extendedprice") === col("min_cost"))
      .join(t.part.filter(col("p_size") < 10), col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        round(col("min_cost"), 4).as("min_cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val minCostSupplierSql =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey,
      |  round(l_extendedprice, 4) AS min_cost
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_size < 10
      |  AND l_extendedprice = (SELECT min(l_extendedprice) FROM lineitem l2
      |                         WHERE l2.l_partkey = lineitem.l_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** TPC-H Q11 shape — GROUP BY … HAVING > (scalar subquery over the
    * SAME filtered set): parts whose NATION_1-supplied value exceeds a
    * fraction of the national total.
    *
    * Scale: the scalar total is a 1-row aggregate broadcast into the
    * HAVING filter (crossJoin of a 1-row frame — a bounds-join, not a
    * data cross product); the per-part aggregate is the only fact
    * shuffle. */
  def nationalPartValue(t: Tables): DataFrame = {
    val value = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val national = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation).filter(col("n_name") === "NATION_1"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey"), value.as("value"))
    val total = national.agg(sum(col("value")).as("total"))
    national.groupBy(col("l_partkey"))
      .agg(sum(col("value")).as("part_value"))
      .crossJoin(broadcast(total))
      .filter(col("part_value") > col("total") * 0.001)
      .select(col("l_partkey"), round(col("part_value"), 4).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  private val nationalPartValueSql =
    """WITH national AS (
      |  SELECT l_partkey, l_extendedprice * (1 - l_discount) AS value
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_1')
      |SELECT l_partkey, round(sum(value), 4) AS part_value
      |FROM national
      |GROUP BY l_partkey
      |HAVING sum(value) > (SELECT sum(value) FROM national) * 0.001
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** TPC-H Q16 shape — NOT IN subquery + COUNT(DISTINCT) per group:
    * distinct suppliers per (brand, size) for selected sizes, excluding
    * a supplier blocklist (negative balances standing in for Q16's
    * complaint-comment filter).
    *
    * Scale: the blocklist is tiny by construction → broadcast anti-join;
    * count-distinct shuffles on the (brand, size) group key with
    * partial aggregation. */
  def supplierCounts(t: Tables): DataFrame = {
    val blocked = t.supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    t.lineitem
      .join(t.part.filter(col("p_size").isin(1, 5, 9, 13)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  private val supplierCountsSql =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size IN (1, 5, 9, 13)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  /** TPC-H Q20 shape — nested IN subqueries with a correlated-aggregate
    * threshold: suppliers who dominate (>10% of shipped quantity) any
    * small part's volume. Quantities are integer-valued doubles, so the
    * sums are exact in both engines and the threshold cannot flip on
    * float noise.
    *
    * Scale: decorrelates to two aggregates over the same part key (per
    * (supplier, part) and per part) joined on that key, then a semi-join
    * into supplier — no correlated re-execution. */
  def dominantSuppliers(t: Tables): DataFrame = {
    val smallParts = t.part.filter(col("p_size") < 5).select(col("p_partkey"))
    val supplied = t.lineitem
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = supplied.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("part_qty"))
    val dominant = supplied.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
      .join(perPart, Seq("l_partkey"))
      .filter(col("supp_qty") > col("part_qty") * 0.1)
      .select(col("l_suppkey")).distinct()
    t.supplier
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), round(col("s_acctbal"), 4).as("s_acctbal"))
      .orderBy("s_name")
  }

  private val dominantSuppliersSql =
    """SELECT s_name, round(s_acctbal, 4) AS s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 5)
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(l_quantity) > 0.1 * (SELECT sum(l_quantity) FROM lineitem l2
      |                                  WHERE l2.l_partkey = lineitem.l_partkey
      |                                    AND l2.l_partkey IN
      |                                      (SELECT p_partkey FROM part WHERE p_size < 5)))
      |ORDER BY s_name""".stripMargin

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q2_min_cost_supplier", minCostSupplier, Some(minCostSupplierSql)),
    QueryDef("q11_national_part_value", nationalPartValue, Some(nationalPartValueSql)),
    QueryDef("q16_supplier_counts", supplierCounts, Some(supplierCountsSql)),
    QueryDef("q20_dominant_suppliers", dominantSuppliers, Some(dominantSuppliersSql)),
    QueryDef("q8_market_share", marketShare, Some(marketShareSql)),
    QueryDef("q12_ship_delay", shipDelayPriority, Some(shipDelayPrioritySql)),
    QueryDef("q13_cust_distribution", custOrderDistribution, Some(custOrderDistributionSql)),
    QueryDef("q15_top_supplier", topSupplier, Some(topSupplierSql)),
    QueryDef("q17_small_qty_revenue", smallQtyRevenue, Some(smallQtyRevenueSql)),
    QueryDef("q18_large_volume", largeVolumeCustomers, Some(largeVolumeCustomersSql)),
    QueryDef("q21_waiting_suppliers", waitingSuppliers, Some(waitingSuppliersSql)),
    QueryDef("q22_idle_balance", idleBalanceSegments, Some(idleBalanceSegmentsSql))
  )
}
