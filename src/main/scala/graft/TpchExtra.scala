package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Adapted TPC-H q2/q4/q7–q22 shapes — the regression net the reference
 * carries as `benchmark/tpch/sf=1/q01..q22` (answers-verified sqllogictests,
 * `tpch.benchmark.in:68-71`). The driver-generated testdata omits `partsupp`
 * and several columns (l_commitdate/receiptdate/shipmode, c_phone, p_mfgr,
 * o_comment…), so each query keeps the ORIGINAL relational shape —
 * correlated scalar subqueries, EXISTS/NOT EXISTS, NOT IN, outer joins,
 * having-over-scalar-subquery, disjunctive multi-range predicates — with
 * filters re-targeted at columns that exist.
 *
 * Each SQL text is written in the shared Spark/DuckDB dialect and runs
 * VERBATIM in both engines: the oracle gets the text as-is over raw parquet;
 * the Spark side rewrites table names to per-query temp views, a subset of
 * which route through a full Iceberg write+read roundtrip
 * ([[Fixtures.plain]]) so manifests/stats/field-id projection are in the
 * loop, not just Catalyst.
 */
object TpchExtra {
  private val tableNames =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** Tables routed through the Iceberg roundtrip, per query (13 of 18
    * queries read at least one table through the real engine path). */
  private val iceRouted: Map[String, Set[String]] = Map(
    "tq2_min_supplier" -> Set("part"),
    "tq4_priority_exists" -> Set("orders", "lineitem"),
    "tq7_volume" -> Set("lineitem"),
    "tq9_profit" -> Set("part"),
    "tq10_returned" -> Set("customer", "nation"),
    "tq11_part_value" -> Set("supplier"),
    "tq12_priority_class" -> Set("orders"),
    "tq13_custdist" -> Set("customer"),
    "tq15_top_supplier" -> Set("supplier"),
    "tq18_large_volume" -> Set("customer", "orders", "lineitem"),
    "tq19_disjunctive" -> Set("part"),
    "tq21_waiting" -> Set("supplier", "nation"),
    "tq22_acctbal" -> Set("customer"))

  /** Synthetic `partsupp` as a shared CTE: the driver testdata omits the
    * table, so the official q9/q11/q16/q20 shapes ran "substituted" (no
    * supplycost term, no composite-key partsupp join) through round 12.
    * This derives one DETERMINISTICALLY inside the query text — the key
    * set is lineitem's distinct (partkey, suppkey) pairs (every lineitem
    * row matches exactly one partsupp row, the official generator's
    * invariant) and availqty/supplycost are closed-form integer/decimal
    * functions of the keys — so Spark and the DuckDB oracle compute the
    * IDENTICAL table from the same base data, no fixture needed.
    * supplycost is exact DECIMAL (cents * 0.01), keeping the q9 profit
    * sums order-exact on both engines. */
  private val partsuppCte: String =
    """partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST(1 + (ps_partkey * 7 + ps_suppkey * 13) % 9999 AS INT) AS ps_availqty,
      |    CAST(100 + (ps_partkey * 31 + ps_suppkey * 101) % 99900 AS DECIMAL(12,0))
      |      * CAST(0.01 AS DECIMAL(3,2)) AS ps_supplycost
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  /** One shared SQL text per query (valid in Spark SQL and DuckDB). */
  val sql: Map[String, String] = Map(
    // Official q9 TEXT over the synthetic partsupp: the full 6-way join
    // with the composite-key (l_partkey, l_suppkey) partsupp match and the
    // real ps_supplycost term (tq9_profit keeps the r1-r12 substituted
    // shape for bench continuity).
    //
    // WIRE FORMAT (r14): the profit is emitted as exact integer
    // ten-thousandths (`sum_profit_e4` BIGINT), not DECIMAL(38,4). Three
    // driver rounds proved that every DECIMAL(38,s) emission hash-fails
    // the driver comparator while rows+schema match and the local DuckDB
    // agrees 105/105 — a representation divergence in the driver's
    // HUGEINT-backed max-precision decimal fetch path, not a value error
    // (tq15's DECIMAL(28,2) and every BIGINT emission pass). The per-row
    // amount has exact scale 4, so `amount * 10^4` is a lossless integral
    // shift; summing int64 is order-exact and renders one way in every
    // engine. sf1 magnitude ~1e13 per group — 5 orders of headroom.
    "tq9_ps_profit" ->
      s"""WITH $partsuppCte
         |SELECT nat, o_year,
         |  CAST(sum(CAST(CAST(amount AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS sum_profit_e4
         |FROM (
         |  SELECT n_name AS nat, CAST(year(o_orderdate) AS INT) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
         |      - ps_supplycost * CAST(l_quantity AS DECIMAL(10,2)) AS amount
         |  FROM part, supplier, lineitem, partsupp, orders, nation
         |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
         |    AND p_partkey = l_partkey AND o_orderkey = l_orderkey
         |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
         |) profit
         |GROUP BY nat, o_year""".stripMargin,

    // Official q11 SHAPE: part value from ps_supplycost * ps_availqty with
    // the HAVING-over-scalar-subquery fraction. Two deviations from the
    // verbatim text, both deliberate:
    //   - the official FRACTION is 0.0001/SF (SF-parameterized by the spec
    //     itself); a fixed 0.0001 went vacuous as data grew (0 rows at
    //     sf1). The threshold here is SF-invariant — parts above 2x the
    //     average part value — and expressed MULTIPLICATION-ONLY
    //     (sum * count > 2 * total), so both engines compare exact
    //     decimals/integers with no division-rounding divergence.
    //     The operands are cast to DECIMAL(28,2) × DECIMAL(9,0) so the
    //     products stay within decimal width 38 in BOTH engines: DuckDB
    //     silently falls back to DOUBLE past width 38 (DECIMAL(38,2) ×
    //     BIGINT), which could flip a group sitting within double-ulp of
    //     the threshold vs Spark's exact decimal compare at large SF.
    //     Non-vacuous at every SF (240 rows at sf0.01, 17000 at sf1).
    //   - emission is exact integer cents (BIGINT) — see the
    //     tq9_ps_profit wire-format note.
    "tq11_ps_value" ->
      s"""WITH $partsuppCte
         |SELECT ps_partkey,
         |  CAST(sum(CAST(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS part_value_e2
         |FROM partsupp, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING CAST(sum(ps_supplycost * ps_availqty) AS DECIMAL(28,2)) * (
         |  SELECT CAST(count(DISTINCT ps_partkey) AS DECIMAL(9,0)) FROM partsupp, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
         |) > (
         |  SELECT CAST(2 AS DECIMAL(2,0)) * CAST(sum(ps_supplycost * ps_availqty) AS DECIMAL(28,2))
         |  FROM partsupp, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7')""".stripMargin,

    // Official q16 TEXT: supplier_cnt = count(DISTINCT ps_suppkey) over the
    // partsupp-part join with the NOT IN anti-subquery.
    "tq16_ps_cnt" ->
      s"""WITH $partsuppCte
         |SELECT p_brand, p_type, p_size, CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM partsupp, part
         |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#25'
         |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size""".stripMargin,

    // Official q20 TEXT: availqty vs half the shipped quantity through the
    // doubly-nested IN with a correlated scalar subquery on BOTH partsupp
    // keys.
    "tq20_ps_suppliers" ->
      s"""WITH $partsuppCte
         |SELECT s_suppkey, s_name
         |FROM supplier, nation
         |WHERE s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND ps_availqty > (
         |        SELECT 0.5 * sum(l_quantity) FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'))
         |  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'""".stripMargin,
    // q2 shape: correlated scalar MIN subquery over a 5-way join.
    "tq2_min_supplier" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND p_size = 15
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  AND l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, p_brand
        |LIMIT 100""".stripMargin,

    // q4 shape: EXISTS semi-join + date-window aggregate.
    "tq4_priority_exists" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    // q7 shape: two-nation volume with a self-joined dimension + OR pair.
    "tq7_volume" ->
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS INT) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        |      OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7'))
        |    AND l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,

    // q8 shape: market-share ratio of conditional sums over an 8-way join.
    "tq8_market_share" ->
      """SELECT o_year, round(sum(CASE WHEN nat = 'NATION_5' THEN volume ELSE 0 END) / sum(volume), 4) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nat
        |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey AND p_type = 'PROMO'
        |) all_nations
        |GROUP BY o_year""".stripMargin,

    // q9 shape: LIKE-filtered profit by nation x year (supplycost term
    // substituted with retailprice — no partsupp table in the testdata).
    // Emission is exact integer hundred-thousandths (the per-row amount
    // has exact scale 5) — see the tq9_ps_profit wire-format note for why
    // DECIMAL(38,s) had to go.
    "tq9_profit" ->
      """SELECT nat, o_year,
        |  CAST(sum(CAST(CAST(amount AS DECIMAL(28,5)) * CAST(100000 AS DECIMAL(6,0)) AS BIGINT)) AS BIGINT) AS sum_profit_e5
        |FROM (
        |  SELECT n_name AS nat, CAST(year(o_orderdate) AS INT) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |           - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(10,2)) * CAST(0.1 AS DECIMAL(3,1)) AS amount
        |  FROM part, supplier, lineitem, orders, nation
        |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
        |) profit
        |GROUP BY nat, o_year""".stripMargin,

    // q10 shape: returned-item revenue, top 20.
    "tq10_returned" ->
      """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= '1996-10-01' AND o_orderdate < '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    // q11 shape: HAVING over an uncorrelated scalar-subquery fraction.
    // The fraction is SF-invariant (parts above 3x the average part value,
    // multiplication-only) — the earlier fixed 0.001 went vacuous as data
    // grew (0 rows at sf1/sf10); see tq11_ps_value. 33 rows at sf0.01,
    // 4090 at sf1.
    "tq11_part_value" ->
      """SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |GROUP BY l_partkey
        |HAVING sum(l_extendedprice * l_quantity) * (
        |  SELECT count(DISTINCT l_partkey) FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |) > (
        |  SELECT 3 * sum(l_extendedprice * l_quantity)
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7')""".stripMargin,

    // q12 shape: conditional counts by class (shipmode substituted).
    "tq12_priority_class" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  AND l_quantity > 25
        |GROUP BY l_linestatus""".stripMargin,

    // q13 shape: LEFT OUTER JOIN with join-condition filter + double group.
    "tq13_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count""".stripMargin,

    // q14 shape: promo-revenue percentage (conditional/total ratio).
    "tq14_promo" ->
      """SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND l_shipdate >= '1997-03-01' AND l_shipdate < '1997-04-01'""".stripMargin,

    // q15 shape: CTE revenue view + scalar MAX subquery over it.
    // Emission is exact integer e4 units (BIGINT): the r14 wire probes
    // proved the driver comparator hash-fails trailing-zero decimal
    // rendering at ANY precision, so a DECIMAL(28,2) here was green only
    // while the top revenue happened to carry nonzero cents.
    "tq15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         sum(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(CAST(total_revenue AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT) AS total_revenue_e4
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin,

    // q16 shape: NOT IN subquery + count(DISTINCT) by part attributes.
    "tq16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#25'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    // q17 shape: correlated AVG scalar subquery per part.
    "tq17_small_qty" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    // q18 shape: IN over GROUP BY ... HAVING subquery, top 100.
    "tq18_large_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, round(sum(l_quantity), 2) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    // q19 shape: disjunction of conjunctive range predicates.
    "tq19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND (
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin,

    // q20 shape: IN over a grouped-HAVING join subquery.
    "tq20_promo_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem, part
        |    WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING sum(l_quantity) > 100)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_5'""".stripMargin,

    // q21 shape: EXISTS + NOT EXISTS self-joins with an inequality
    // correlation (waiting-supplier pattern on l_shipdate).
    "tq21_waiting" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    // q22 shape: NOT EXISTS anti-join + uncorrelated AVG scalar subquery
    // (cntrycode substituted with a key modulus — no c_phone column).
    "tq22_acctbal" ->
      """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        |FROM (
        |  SELECT CAST(c_custkey % 7 AS INT) AS cntrycode, c_acctbal
        |  FROM customer
        |  WHERE c_custkey % 7 IN (1, 2, 3, 4, 5)
        |    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 2, 3, 4, 5))
        |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |) custsale
        |GROUP BY cntrycode""".stripMargin)

  private def run(name: String)(s: SparkSession, dir: String): DataFrame =
    runText(name, sql(name))(s, dir)

  /** Run an arbitrary SQL text through `name`'s table routing/registration
    * (used by the `side_wire_*` divergence probes, which re-emit a query's
    * aggregate under a different wire type). */
  private[graft] def runText(name: String, text: String)(s: SparkSession, dir: String): DataFrame = {
    val routed = iceRouted.getOrElse(name, Set.empty)
    // Experiment switch (bench A/B): route Iceberg tables through the DSv2
    // front-end over ANALYZEd fixtures, so CBO (enable via
    // SPARK_GRAFT_EXTRA_CONF="spark.sql.cbo.enabled=true") sees the scans'
    // column statistics (NDV/null/min-max). Default path unchanged.
    val dsv2 = sys.env.contains("SPARK_GRAFT_TQ_DSV2")
    // Modified-data bench variant (reference dm=5): route the Iceberg
    // tables through fixtures that accumulated N refresh rounds of
    // merge-on-read DML, so every scan pays the delete-apply path.
    val dmRounds = sys.env.get("SPARK_GRAFT_TQ_DM")
      .orElse(sys.props.get("spark.graft.tq.dm")).map(_.toInt).getOrElse(0)
    // Simulated object-store latency (the reference benchmark's
    // `debug_fs_delay_mean_ms=3` + external-file-cache-off regime): route
    // every table path through graftdelay:// so each metadata/manifest/
    // data request pays a fixed per-request sleep — see
    // [[graft.sources.DelaySimFileSystem]]. The DuckDB proxy applies the
    // same charge via fsspec (bench_duckdb_proxy.py --fs-delay-ms).
    val fsDelayMs = sys.env.get("SPARK_GRAFT_FS_DELAY_MS").map(_.toLong).getOrElse(0L)
    def delayed(path: String): String =
      if (fsDelayMs <= 0) path
      else {
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.graftdelay.impl", classOf[graft.sources.DelaySimFileSystem].getName)
        hc.setLong("fs.graftdelay.mean.ms", fsDelayMs)
        "graftdelay://" + new java.io.File(path).getAbsolutePath
      }
    // Register only the tables this query's text references: each
    // registration costs real I/O in the timed pass (Iceberg metadata +
    // manifest reads, parquet footer/listing — ~3 ms per ranged request
    // under the delay3 protocol), and loading all 7 tables charged every
    // 2-table query (tq13/tq22) a fixed floor for scans it never ran.
    // (?i): Spark SQL identifiers are case-insensitive, so a future query
    // writing `FROM Orders` must still register the view (a miss fails at
    // analysis with a confusing unresolved-relation error).
    val used = tableNames.filter(t => s"(?i)\\b$t\\b".r.findFirstIn(text).isDefined)
    require(used.nonEmpty && routed.subsetOf(used.toSet),
      s"$name: table detection found $used but iceRouted declares $routed — " +
        "the word-boundary scan under-matched the query text")
    used.foreach { t =>
      val df =
        // dm routing covers orders+lineitem ONLY, like the reference's
        // dm=5 refresh (insert/delete batches hit the two fact tables;
        // a 0.1% keyslice DELETE on 25-row nation would remove 20% of
        // the table and change join selectivities, not measure MoR).
        if (routed(t) && dmRounds > 0 && (t == "orders" || t == "lineitem"))
          IcebergTable.load(s, delayed(Fixtures.dm(s, dir, t, dmRounds)))
        else if (routed(t) && dsv2)
          s.read.format("graft").load(delayed(Fixtures.plainAnalyzed(s, dir, t)))
        else if (routed(t)) IcebergTable.load(s, delayed(Fixtures.plain(s, dir, t)))
        else s.read.parquet(delayed(s"$dir/$t.parquet"))
      df.createOrReplaceTempView(s"${name}_$t")
    }
    // Table names never collide with column names / aliases (l_*, o_*,
    // "nat", subquery aliases), so a word-boundary rewrite is safe.
    val q = used.foldLeft(text)((acc, t) =>
      acc.replaceAll(s"(?i)\\b$t\\b", s"${name}_$t"))
    s.sql(q)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.keys.map(n => n -> (run(n) _)).toMap

  def oracleSql: Map[String, String] = sql

  /** Spark-only divergence-probe texts for the r11–r13 driver hash-fail
    * set: each re-emits the query's aggregate BOTH as the old
    * DECIMAL(38,s) value rendered to a fixed-scale STRING (the exact
    * digits Spark computed — trailing zeros preserved, no engine-specific
    * decimal wire encoding) AND as the r14 integer-units BIGINT, sorted by
    * group key. Dumped by Verify as `side_wire_*` parquet (no oracle): if
    * any hash-fail survives the wire change, the driver artifact itself
    * now records the bytes to diff against the oracle's values
    * (VERDICT r13 ask #2). */
  private val wireProbeSql: Map[String, String] = Map(
    "tq9_profit" ->
      """SELECT nat, o_year,
        |  CAST(CAST(sum(amount) AS DECIMAL(38,5)) AS STRING) AS sum_profit_dec38_str,
        |  CAST(sum(CAST(CAST(amount AS DECIMAL(28,5)) * CAST(100000 AS DECIMAL(6,0)) AS BIGINT)) AS BIGINT) AS sum_profit_e5
        |FROM (
        |  SELECT n_name AS nat, CAST(year(o_orderdate) AS INT) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |           - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(10,2)) * CAST(0.1 AS DECIMAL(3,1)) AS amount
        |  FROM part, supplier, lineitem, orders, nation
        |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND o_orderkey = l_orderkey
        |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
        |) profit
        |GROUP BY nat, o_year
        |ORDER BY nat, o_year""".stripMargin,

    "tq9_ps_profit" ->
      s"""WITH $partsuppCte
         |SELECT nat, o_year,
         |  CAST(CAST(sum(amount) AS DECIMAL(38,4)) AS STRING) AS sum_profit_dec38_str,
         |  CAST(sum(CAST(CAST(amount AS DECIMAL(28,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT)) AS BIGINT) AS sum_profit_e4
         |FROM (
         |  SELECT n_name AS nat, CAST(year(o_orderdate) AS INT) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
         |      - ps_supplycost * CAST(l_quantity AS DECIMAL(10,2)) AS amount
         |  FROM part, supplier, lineitem, partsupp, orders, nation
         |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
         |    AND p_partkey = l_partkey AND o_orderkey = l_orderkey
         |    AND s_nationkey = n_nationkey AND p_name LIKE '%red%'
         |) profit
         |GROUP BY nat, o_year
         |ORDER BY nat, o_year""".stripMargin,

    "tq11_ps_value" ->
      s"""WITH $partsuppCte
         |SELECT ps_partkey,
         |  CAST(CAST(sum(ps_supplycost * ps_availqty) AS DECIMAL(38,2)) AS STRING) AS part_value_dec38_str,
         |  CAST(sum(CAST(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,2)) * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS part_value_e2
         |FROM partsupp, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING CAST(sum(ps_supplycost * ps_availqty) AS DECIMAL(28,2)) * (
         |  SELECT CAST(count(DISTINCT ps_partkey) AS DECIMAL(9,0)) FROM partsupp, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
         |) > (
         |  SELECT CAST(2 AS DECIMAL(2,0)) * CAST(sum(ps_supplycost * ps_availqty) AS DECIMAL(28,2))
         |  FROM partsupp, supplier, nation
         |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_7')
         |ORDER BY ps_partkey""".stripMargin)

  def wireProbes: Map[String, (SparkSession, String) => DataFrame] =
    wireProbeSql.map { case (n, t) => s"side_wire_$n" -> (runText(n, t) _) }.toMap
}
