package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{dec, t}

/** Flagship query (SURVEY.md §2-L): TPC-H-Q3-style revenue rollup —
  * 5-way join over the star schema, filtered to one market segment,
  * grouped by nation and order year, top 10 by revenue.
  *
  * Scale notes (100 TB): lineitem⋈orders and orders⋈customer are the
  * big shuffles — Catalyst plans them as sort-merge (or shuffled-hash
  * under AQE); nation (25 rows) and region (5 rows) are explicitly
  * broadcast so they never shuffle the fact table. The segment filter
  * and column pruning push down to the parquet scans.
  */
object Flagship {
  def q(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val o  = t(spark, sfDir, "orders")
    val c  = t(spark, sfDir, "customer")
    val n  = t(spark, sfDir, "nation")
    val r  = t(spark, sfDir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(c("c_mktsegment") === "BUILDING")
      .groupBy(n("n_name").as("n_name"), year(o("o_orderdate")).as("o_year"))
      .agg(
        sum(dec(li("l_extendedprice")) * (lit(BigDecimal(1)) - dec(li("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("revenue").desc, col("n_name"), col("o_year"))
      .limit(10)
  }

  val sql: String =
    """SELECT n_name,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1, 2
ORDER BY revenue DESC, n_name, o_year
LIMIT 10"""

  /** L. TPC-H Q5 (local-supplier volume): the 6-way join whose
    * distinguishing constraint is the SECOND equi-condition between
    * two already-joined tables (c_nationkey = s_nationkey — customer
    * and supplier must share a nation), which the optimizer applies as
    * a join filter rather than another shuffle. lineitem is the only
    * big table: orders co-shuffles with it, and supplier / nation /
    * region broadcast. One date-year of orders, one region. */
  private def q5(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val o  = t(spark, sfDir, "orders")
      .where(year(col("o_orderdate")) === 1996)
    val c  = t(spark, sfDir, "customer")
    val s  = t(spark, sfDir, "supplier")
    val n  = t(spark, sfDir, "nation")
    val r  = t(spark, sfDir, "region").where(col("r_name") === "ASIA")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name").as("n_name"))
      .agg(
        sum(dec(li("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(li("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql: String =
    """SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey AND year(o_orderdate) = 1996
JOIN customer ON o_custkey   = c_custkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
GROUP BY 1
ORDER BY revenue DESC, n_name"""

  /** L. TPC-H Q1 (pricing summary): the canonical full-scan aggregate
    * — 8 aggregates over one pass of lineitem, partial/final
    * HashAggregate with map-side combine so the shuffle carries 4
    * groups, not 600k rows. Sums and averages are decimal-exact;
    * averages are expressed as sum/count in DOUBLE on both sides
    * (DuckDB's avg(decimal) returns DOUBLE, Spark's returns decimal —
    * the one cross-engine avg pitfall). */
  private def q1(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .where(col("l_returnflag").isin("A", "N", "R"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(col("l_discount"))) *
          (lit(BigDecimal(1)) + dec(col("l_tax"))))
          .cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)))
          .as("avg_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_returnflag IN ('A', 'N', 'R')
GROUP BY 1, 2
ORDER BY l_returnflag, l_linestatus"""

  /** L. TPC-H Q3 (shipping priority): per-ORDER revenue ranking — the
    * result set before the top-k is order-cardinality (millions at
    * scale), so the ORDER BY + LIMIT must plan as
    * TakeOrderedAndProject, never a global sort. The date cutoffs land
    * on both fact scans as pushed filters; customer joins shuffle-free
    * only through the segment filter's selectivity (Catalyst decides —
    * at sf it broadcasts, at 100 TB it co-shuffles). */
  private def q3(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1997-06-01").cast("timestamp")
    val li = t(spark, sfDir, "lineitem").where(col("l_shipdate") > cutoff)
    val o  = t(spark, sfDir, "orders").where(col("o_orderdate") < cutoff)
    val c  = t(spark, sfDir, "customer")
      .where(col("c_mktsegment") === "MACHINERY")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(li("l_orderkey").as("l_orderkey"),
        o("o_orderdate").as("o_orderdate"))
      .agg(
        sum(dec(li("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(li("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql: String =
    """SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'MACHINERY'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10"""

  /** L. TPC-H Q6 (forecast revenue change): the pure scan-side query —
    * every predicate and both aggregated columns push into one parquet
    * pass, zero joins, a 1-row global aggregate whose shuffle carries
    * exactly one partial per task. The decimal band predicate runs on
    * DECIMAL(18,2) on BOTH engines so 0.05/0.07 are exact, not float
    * neighborhoods. */
  private def q6(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        dec(col("l_discount")).between(BigDecimal("0.05"), BigDecimal("0.07")) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  private val q6Sql: String =
    """SELECT
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(18,2))
        BETWEEN CAST(0.05 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
  AND l_quantity < 24"""

  /** L. TPC-H Q18 (large-volume customers): the HAVING-subquery
    * pattern — aggregate lineitem per order FIRST (map-side partials
    * collapse ~6 lines/order before the shuffle), filter to the heavy
    * tail, THEN join the survivors to orders/customer. The qualifying
    * set is tiny (p99 of order quantity ≈ 265), so both enrichment
    * joins broadcast the filtered aggregate, never re-shuffling the
    * fact table. */
  private def q18(spark: SparkSession, sfDir: String): DataFrame = {
    val big = t(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("total_qty"))
      .where(col("total_qty") > 300)
    val o = t(spark, sfDir, "orders")
    val c = t(spark, sfDir, "customer")
    broadcast(big)
      .join(o, big("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"),
        col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       total_qty
FROM (SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
      FROM lineitem GROUP BY 1) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 300
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100"""

  /** L. TPC-H Q4 (order-priority checking), adapted: testdata carries
    * no l_commitdate/l_receiptdate, so the EXISTS predicate becomes
    * "some line of the order was returned" (l_returnflag = 'R') — the
    * plan shape is the point and is unchanged: a LEFT SEMI join
    * (orders probe, lineitem build) that emits each qualifying order
    * ONCE no matter how many lines match, so the per-priority counts
    * never inflate with line multiplicity. The date half-year prunes
    * the orders scan; the flag filter prunes lineitem before the
    * shuffle. */
  private def q4(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val returned = t(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R").select(col("l_orderkey"))
    o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
ORDER BY o_orderpriority"""

  /** L. TPC-H Q13 (customer order-count distribution), adapted: the
    * excluded order class is o_orderpriority = '1-URGENT' (testdata
    * has no o_comment). The shape that matters survives: a LEFT OUTER
    * join whose filter lives in the JOIN CONDITION (not WHERE — a
    * where-filter would silently turn the outer join inner and drop
    * the zero-order customers that are the query's point), then two
    * aggregation levels — per-customer counts (customer-cardinality
    * shuffle) collapsing to a histogram whose key domain is tiny
    * (max orders per customer), so the second shuffle is trivial. */
  private def q13(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer").select(col("c_custkey"))
    val o = t(spark, sfDir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY 1) dist
GROUP BY 1
ORDER BY custdist DESC, c_count DESC"""

  /** L. TPC-H Q16 (supplier-part relationship), adapted: testdata has
    * no partsupp, so lineitem stands in as the observed part↔supplier
    * pairs, and the "complaint" supplier exclusion keys off
    * s_acctbal < 1000 (< 0 is EMPTY at sf0.001, and AQE's
    * empty-relation propagation would erase the anti join — the cut
    * must be non-empty at every SF for the pin to hold; ~17% of a
    * uniform [-999,9999] balance). The plan shapes preserved: a NOT
    * IN subquery that
    * Catalyst turns into a LEFT ANTI join (broadcast — the excluded
    * set is supplier-scale, tiny), then a grouped COUNT DISTINCT,
    * which plans as the two-shuffle expand/partial-count pipeline
    * (first dedup (brand,type,size,suppkey), then count) rather than
    * buffering supplier sets per group. */
  private def q16(spark: SparkSession, sfDir: String): DataFrame = {
    val complaints = t(spark, sfDir, "supplier")
      .where(col("s_acctbal") < 1000).select(col("s_suppkey"))
    val p = t(spark, sfDir, "part")
      .where(col("p_brand") =!= "Brand#45" &&
        !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    li.join(broadcast(complaints),
        li("l_suppkey") === complaints("s_suppkey"), "left_anti")
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** L. TPC-H Q22 (global sales opportunity), adapted: "country code"
    * is c_nationkey ∈ {10..15} (no c_phone in testdata). Both Q22
    * signatures survive: a SCALAR subquery threshold (the positive-
    * balance average — computed once, 1 row, broadcast-cross-joined so
    * the filter stays map-side; decimal-exact sum / count in DOUBLE so
    * both engines derive the bit-identical cutoff) and a NOT EXISTS
    * anti-join against orders (the only data-sized shuffle). Every
    * testdata customer has SOME order, so the dormancy test is "no
    * order since mid-2000" — the anti-join side carries the date
    * filter, which pushes into its scan. */
  private def q22(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = Seq(10, 11, 12, 13, 14, 15)
    val c = t(spark, sfDir, "customer")
      .where(col("c_nationkey").isin(codes: _*))
    val thresh = c.where(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val o = t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(thresh))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(c("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("cntrycode")
  }

  private val q22Sql: String =
    """SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (10, 11, 12, 13, 14, 15)
  AND c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
                               AS DOUBLE) / count(*)
                   FROM customer
                   WHERE c_acctbal > 0
                     AND c_nationkey IN (10, 11, 12, 13, 14, 15))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY 1
ORDER BY cntrycode"""

  /** L. TPC-H Q7 (volume shipping), adapted: the nation set is
    * {NATION_0..3} (the classic FRANCE/GERMANY pair is empty at
    * sf0.001 — the pin must hold at every SF). The scale move is that
    * BOTH dimension filters apply before the fact joins: supplier and
    * customer are each pre-joined to the 4-row filtered nation
    * broadcast, so the disjunctive "different nations, either
    * direction" condition degenerates to a cheap post-join filter on
    * two already-attached name columns — never a theta-join. lineitem
    * carries the two-year shipdate band as a pushed scan filter. */
  private def q7(spark: SparkSession, sfDir: String): DataFrame = {
    val nations = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
    val li = t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = t(spark, sfDir, "orders")
    val n1 = t(spark, sfDir, "nation").where(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = t(spark, sfDir, "nation").where(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val s = t(spark, sfDir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
    val c = t(spark, sfDir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(li("l_shipdate")).as("l_year"))
      .agg(
        sum(dec(li("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(li("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
  AND n2.n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3')
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year"""

  /** L. TPC-H Q10 (returned-item reporting): rank customers by revenue
    * lost to returns in one quarter. The quarter filter prunes the
    * orders scan and the flag filter prunes lineitem BEFORE their
    * shuffle; the group-by keys include every customer attribute the
    * report shows (all functionally dependent on c_custkey — carrying
    * them through the aggregate beats a second enrichment join against
    * a top-20 that hasn't been computed yet). TakeOrderedAndProject
    * caps the customer-cardinality result at 20 rows. */
  private def q10(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem").where(col("l_returnflag") === "R")
    val o = t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val c = t(spark, sfDir, "customer")
    val n = t(spark, sfDir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"), col("c_mktsegment"))
      .agg(
        sum(dec(li("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(li("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4, 5
ORDER BY revenue DESC, c_custkey
LIMIT 20"""

  /** L. TPC-H Q14 (promotion effect): a single-row conditional-share
    * aggregate — promo revenue over total revenue for one shipping
    * month. Both numerator and denominator are decimal-exact sums
    * (order-independent), cast to DOUBLE only for the final ratio, so
    * the percentage is bit-identical across engines. The month filter
    * pushes into the lineitem scan; the part join carries only
    * (p_partkey, p_type). */
  private def q14(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
    val p = t(spark, sfDir, "part").select(col("p_partkey"), col("p_type"))
    val disc = dec(li("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec(li("l_discount")))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", disc)
          .otherwise(lit(BigDecimal(0)))).cast("double") * 100.0 /
          sum(disc).cast("double")).as("promo_pct"),
        count(lit(1)).as("n_rows"))
  }

  private val q14Sql: String =
    """SELECT
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_pct,
       count(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'"""

  /** L. TPC-H Q15 (top supplier): the argmax-via-scalar-subquery shape
    * — per-supplier quarterly revenue, keep the suppliers achieving
    * the maximum. The revenue table is supplier-cardinality (small),
    * so the 1-row max broadcast-cross-joins back onto it map-side; the
    * equality compare is safe because both sides derive the revenue
    * the same way (decimal sum, cast double — bit-identical). One
    * data-sized shuffle total (the supplier aggregate). */
  private def q15(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(dec(col("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    val s = t(spark, sfDir, "supplier")
    rev.crossJoin(broadcast(maxRev))
      .where(col("total_revenue") === col("max_rev"))
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql: String =
    """WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey"""

  /** L. TPC-H Q17 (small-quantity-order revenue), adapted: the part
    * cut is (Brand#12, ECONOMY) — testdata has no p_container. The
    * correlated "20% of this part's average quantity" subquery becomes
    * an explicit per-part aggregate joined back by key: lineitem is
    * first SEMI-reduced to the selected parts (broadcast — the cut is
    * part-scale), the per-part cutoffs are computed over exactly those
    * lines, and the cutoff table (≤|selected parts| rows) broadcasts
    * back for the final quantity filter. The fact table shuffles once
    * (the per-part aggregate), never for the cutoff re-attach. */
  private def q17(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part")
      .where(col("p_brand") === "Brand#12" && col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val li = t(spark, sfDir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val cut = li.groupBy(col("l_partkey").as("cut_key"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)) * 0.2)
        .as("qty_cut"))
    li.join(broadcast(cut), col("l_partkey") === col("cut_key"))
      .where(dec(col("l_quantity")).cast("double") < col("qty_cut"))
      .agg(
        (sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  private val q17Sql: String =
    """WITH sel AS (
  SELECT p_partkey FROM part
  WHERE p_brand = 'Brand#12' AND p_type = 'ECONOMY'),
cut AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / count(*) * 0.2 AS qty_cut
  FROM lineitem JOIN sel ON l_partkey = p_partkey
  GROUP BY 1)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_rows
FROM lineitem
JOIN sel ON lineitem.l_partkey = sel.p_partkey
JOIN cut ON lineitem.l_partkey = cut.l_partkey
WHERE CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) < qty_cut"""

  /** L. TPC-H Q8 (national market share): NATION_2's share of PROMO-part
    * revenue sold into ASIA-region customers, by order year. All four
    * dimension cuts (part type, customer region via nation→region, the
    * two-year order band) are attached BEFORE the fact rows widen: part
    * and the region-filtered customer-nation map broadcast into the
    * lineitem/orders join, and the supplier-nation name rides a third
    * broadcast — so the only data-sized exchange is the final 2-group
    * aggregate. The share divides two decimal-exact sums cast to double
    * at the end (bit-identical across engines, 0/total stays exact). */
  private def q8(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part").where(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val o = t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val asiaNations = t(spark, sfDir, "nation")
      .join(broadcast(t(spark, sfDir, "region").where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val c = t(spark, sfDir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"))
    val sn = t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val li = t(spark, sfDir, "lineitem")
    val disc = dec(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec(col("l_discount")))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_2", disc)
          .otherwise(lit(BigDecimal(0)))).cast("double") /
          sum(disc).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_year")
  }

  private val q8Sql: String =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS mkt_share,
       count(*) AS n_rows
FROM lineitem
JOIN part     ON l_partkey   = p_partkey
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey   = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY o_year"""

  /** L. TPC-H Q9 (product-type profit), adapted: testdata has no
    * partsupp, so supply cost is proxied by a deterministic tenth of
    * p_retailprice per unit — profit = disc_revenue − retailprice ×
    * quantity × 0.1, every factor an exact DECIMAL so the per-group sum
    * is order-independent and only the final cast produces the double.
    * The p_name cut broadcasts into lineitem before the orders join
    * (part is the small side, the filter drops ~2/3 of fact rows
    * early); supplier→nation is a second broadcast. One data-sized
    * shuffle: the (nation, year) aggregate. */
  private def q9(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part").where(col("p_name").like("%blue%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val o = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val profit = dec(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec(col("l_discount"))) -
      dec(col("p_retailprice")) * dec(col("l_quantity")) *
        lit(BigDecimal("0.1"))
    t(spark, sfDir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).cast("double").as("profit"),
        count(lit(1)).as("n_rows"))
      .orderBy("nation", "o_year")
  }

  private val q9Sql: String =
    """SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(0.1 AS DECIMAL(2,1))) AS DOUBLE) AS profit,
       count(*) AS n_rows
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
ORDER BY nation, o_year"""

  /** L. TPC-H Q2 (minimum-cost supplier), adapted: testdata has no
    * partsupp, so the observed part↔supplier offers come from lineitem
    * and "supply cost" is the observed unit price
    * l_extendedprice / l_quantity (plain DOUBLE division of identical
    * doubles — IEEE-deterministic, so both engines derive bit-equal
    * costs and the min-equality join below is safe). The Q2 signature
    * preserved is the correlated MIN subquery per part, decorrelated the
    * way every planner does it: a grouped MIN joined back on
    * (partkey, cost). Scale shape: part cut and the region-filtered
    * supplier map are both broadcast (dimension-sized), the offers
    * relation shuffles once on partkey for the MIN and the join-back
    * reuses that partitioning; DISTINCT makes the display rows unique so
    * the fully-tiebroken ORDER BY + LIMIT is deterministic. */
  private def q2(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part")
      .where(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
    val eu = t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")
        .join(broadcast(t(spark, sfDir, "region")
          .where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val offers = t(spark, sfDir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .withColumn("unit_cost", col("l_extendedprice") / col("l_quantity"))
    val minc = offers.groupBy(col("p_partkey").as("mc_key"))
      .agg(min(col("unit_cost")).as("min_cost"))
    offers.join(minc, offers("p_partkey") === col("mc_key") &&
        col("unit_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("min_cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  private val q2Sql: String =
    """WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         l_extendedprice / l_quantity AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN eu   ON l_suppkey = s_suppkey
  WHERE p_type = 'LARGE' AND p_size <= 10),
minc AS (
  SELECT p_partkey AS mc_key, min(unit_cost) AS min_cost
  FROM offers GROUP BY 1)
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name, min_cost
FROM offers JOIN minc ON p_partkey = mc_key AND unit_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100"""

  /** L. TPC-H Q11 (important inventory), adapted: no partsupp, so a
    * part's "inventory value" is the discounted revenue its AFRICA-
    * region suppliers shipped (region, not single nation — at sf0.001
    * only 10 suppliers exist and a one-nation cut can be empty; a
    * region holds ≥2 at every SF). The Q11 signature preserved is the
    * scalar-subquery threshold — here 2× the MEAN per-part value rather
    * than TPC-H's fixed fraction of the total, because the fixed
    * fraction is implicitly SF-scaled in the spec (0.0001/SF) and a
    * mean-relative cut is the SF-invariant equivalent. The threshold is
    * one row, broadcast-cross-joined so the HAVING stays map-side after
    * the per-part aggregate's single shuffle. */
  private def q11(spark: SparkSession, sfDir: String): DataFrame = {
    val af = t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")
        .join(broadcast(t(spark, sfDir, "region")
          .where(col("r_name") === "AFRICA")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    // The threshold compare runs ENTIRELY in exact decimals: the
    // earlier form summed per-part DOUBLES into the cutoff —
    // partition-order-dependent accumulation feeding a strict '>', the
    // one nondeterminism class left in the tier. 'pv > total/n * 2' is
    // cross-multiplied to 'pv * n > total * 2' so no division (and no
    // double) ever touches the predicate; the double cast survives only
    // in the DISPLAYED part_value. Bounded precisions keep both
    // engines' decimal arithmetic exact (never silently widened to
    // float) through sf1-scale magnitudes.
    val vals = t(spark, sfDir, "lineitem")
      .join(broadcast(af), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(BigDecimal(1)) - dec(col("l_discount"))))
        .cast("decimal(20,4)").as("pv_dec"))
    val thresh = vals.agg(
      sum(col("pv_dec")).cast("decimal(28,4)").as("total_dec"),
      count(lit(1)).cast("decimal(10,0)").as("n_parts"))
    vals.crossJoin(broadcast(thresh))
      .where(col("pv_dec") * col("n_parts") > col("total_dec") * 2)
      .select(col("l_partkey"), col("pv_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  private val q11Sql: String =
    """WITH af AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AFRICA'),
vals AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2))))
              AS DECIMAL(20,4)) AS pv_dec
  FROM lineitem JOIN af ON l_suppkey = s_suppkey
  GROUP BY 1),
tot AS (
  SELECT CAST(sum(pv_dec) AS DECIMAL(28,4)) AS total_dec,
         CAST(count(*) AS DECIMAL(10,0)) AS n_parts
  FROM vals)
SELECT l_partkey, CAST(pv_dec AS DOUBLE) AS part_value
FROM vals, tot
WHERE pv_dec * n_parts > total_dec * 2
ORDER BY part_value DESC, l_partkey"""

  /** L. TPC-H Q12 (shipping modes / priority classes), adapted: no
    * l_shipmode or commit/receipt dates, so the mode dimension is
    * l_linestatus and "late" is shipped more than 90 days after the
    * order date. The Q12 signature preserved is the CASE-sum pivot of
    * order priorities over a joined date-band fact cut: both the
    * two-year shipdate band (pushed into the lineitem scan) and the
    * lateness predicate (a post-join filter between the two tables'
    * columns) survive, and the priority split is the same
    * urgent-vs-not CASE. One shuffle: lineitem⋈orders on orderkey;
    * the 2-group aggregate combines map-side. */
  private def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val o = t(spark, sfDir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .where(li("l_shipdate") >
        o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  private val q12Sql: String =
    """SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate >  o_orderdate + INTERVAL 90 DAY
GROUP BY 1
ORDER BY l_linestatus"""

  /** L. TPC-H Q19 (discounted revenue): the disjunctive-predicate join
    * — three (brand, size-range, quantity-range) conjuncts OR'd
    * together over lineitem⋈part. The scale point is that the OR must
    * NOT demote the join to a nested-loop: the partkey equality is a
    * common factor outside the disjunction, so Catalyst plans a plain
    * equi-join (broadcast — part is dimension-sized) and evaluates the
    * disjunction as a post-join filter; the residual p_brand IN and
    * quantity/size range bounds still push into the two scans. */
  private def q19(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part")
      .where(col("p_brand").isin("Brand#3", "Brand#12", "Brand#23"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = t(spark, sfDir, "lineitem")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50)))
      .agg(
        sum(dec(col("l_extendedprice")) *
          (lit(BigDecimal(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)"""

  /** L. TPC-H Q20 (potential part promotion), adapted: no partsupp
    * availqty, so the "excess availability" test becomes: a supplier
    * qualifies when its shipped quantity of a 'large%'-named part
    * exceeds 1.2× the MEAN shipped quantity across that part's
    * suppliers (scale-invariant, like the Q11 adaptation; no nation cut
    * — 10 suppliers at sf0.001 make any further thinning empty-prone).
    * The Q20 signature preserved is the nested semi-join chain:
    * aggregated pair subquery → per-part threshold → DISTINCT supplier
    * set → semi-join into supplier, enriched with nation. Scale shape:
    * the part cut broadcasts into lineitem, pairs aggregate with one
    * shuffle on (partkey, suppkey), the per-part mean joins back keyed
    * by partkey (co-partitioned — map-side), and the surviving supplier
    * ids are dimension-sized for the final LEFT SEMI. */
  private def q20(spark: SparkSession, sfDir: String): DataFrame = {
    val p = t(spark, sfDir, "part")
      .where(col("p_name").like("large%")).select(col("p_partkey"))
    // Threshold compare in exact decimals (same rewrite as q11): the
    // earlier avg_qty summed DOUBLE pair quantities — order-dependent
    // accumulation feeding a strict '>'. 'pq > (tot/n) * 1.2' is
    // cross-multiplied to 'pq * n * 10 > tot * 12', so the predicate
    // never touches a float or a division.
    val pairs = t(spark, sfDir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).cast("decimal(18,2)").as("pq_dec"))
    val partAvg = pairs.groupBy(col("l_partkey").as("pa_key"))
      .agg(sum(col("pq_dec")).cast("decimal(24,2)").as("tot_dec"),
        count(lit(1)).cast("decimal(8,0)").as("n_sup"))
    val winners = pairs
      .join(partAvg, col("l_partkey") === col("pa_key"))
      .where(col("pq_dec") * col("n_sup") * 10 > col("tot_dec") * 12)
      .select(col("l_suppkey")).distinct()
    t(spark, sfDir, "supplier")
      .join(winners, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(t(spark, sfDir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_name")
  }

  private val q20Sql: String =
    """WITH pairs AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS pq_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'large%'
  GROUP BY 1, 2),
part_avg AS (
  SELECT l_partkey AS pa_key,
         CAST(sum(pq_dec) AS DECIMAL(24,2)) AS tot_dec,
         CAST(count(*) AS DECIMAL(8,0)) AS n_sup
  FROM pairs GROUP BY 1),
winners AS (
  SELECT DISTINCT l_suppkey
  FROM pairs JOIN part_avg ON l_partkey = pa_key
  WHERE pq_dec * n_sup * 10 > tot_dec * 12)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM winners)
ORDER BY s_name"""

  /** L. TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    * commit/receipt dates, so a supplier "failed" a finished ('F')
    * order when it shipped a line more than a year after the order
    * date. The Q21 signature — EXISTS (another supplier on the order)
    * AND NOT EXISTS (another FAILED supplier on the order) — is
    * rewritten as every scale-aware planner decorrelates it: aggregate
    * per (order, supplier) once, derive per-order supplier / failed
    * counts from those pairs, and keep the pairs where the order is
    * multi-supplier and this supplier is the SOLE failure. Scale shape:
    * one fact shuffle on orderkey for the pair aggregate; the per-order
    * rollup and the pairs⋈stats join-back both reuse that partitioning
    * (orderkey is a prefix of the pair key), the EUROPE supplier map is
    * a broadcast, and the s_name rollup is group-count-sized. */
  private def q21(spark: SparkSession, sfDir: String): DataFrame = {
    val o = t(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val pairs = t(spark, sfDir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 365 DAYS"), 1L)
        .otherwise(0L)).as("failed"))
    val stats = pairs.groupBy(col("l_orderkey").as("st_key"))
      .agg(count(lit(1)).as("n_supp"), sum(col("failed")).as("n_failed"))
    val eu = t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")
        .join(broadcast(t(spark, sfDir, "region")
          .where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    pairs.where(col("failed") === 1L)
      .join(stats, col("l_orderkey") === col("st_key"))
      .where(col("n_supp") > 1L && col("n_failed") === 1L)
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val q21Sql: String =
    """WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY
                  THEN 1 ELSE 0 END) AS failed
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
stats AS (
  SELECT l_orderkey AS st_key,
         CAST(count(*) AS BIGINT) AS n_supp,
         CAST(sum(failed) AS BIGINT) AS n_failed
  FROM pairs GROUP BY 1),
eu AS (
  SELECT s_suppkey, s_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s_name, count(*) AS numwait
FROM pairs
JOIN stats ON l_orderkey = st_key
JOIN eu    ON l_suppkey = s_suppkey
WHERE failed = 1 AND n_supp > 1 AND n_failed = 1
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100"""

  val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_flagship" -> (q _), "tpch_q1" -> (q1 _), "tpch_q2" -> (q2 _),
      "tpch_q3" -> (q3 _),
      "tpch_q4" -> (q4 _), "tpch_q5" -> (q5 _), "tpch_q6" -> (q6 _),
      "tpch_q7" -> (q7 _), "tpch_q8" -> (q8 _), "tpch_q9" -> (q9 _),
      "tpch_q10" -> (q10 _), "tpch_q11" -> (q11 _), "tpch_q12" -> (q12 _),
      "tpch_q13" -> (q13 _),
      "tpch_q14" -> (q14 _), "tpch_q15" -> (q15 _), "tpch_q16" -> (q16 _),
      "tpch_q17" -> (q17 _), "tpch_q18" -> (q18 _), "tpch_q19" -> (q19 _),
      "tpch_q20" -> (q20 _), "tpch_q21" -> (q21 _), "tpch_q22" -> (q22 _))
  val oracle: Map[String, String] =
    Map("q_flagship" -> sql, "tpch_q1" -> q1Sql, "tpch_q2" -> q2Sql,
      "tpch_q3" -> q3Sql,
      "tpch_q4" -> q4Sql, "tpch_q5" -> q5Sql, "tpch_q6" -> q6Sql,
      "tpch_q7" -> q7Sql, "tpch_q8" -> q8Sql, "tpch_q9" -> q9Sql,
      "tpch_q10" -> q10Sql, "tpch_q11" -> q11Sql, "tpch_q12" -> q12Sql,
      "tpch_q13" -> q13Sql,
      "tpch_q14" -> q14Sql, "tpch_q15" -> q15Sql, "tpch_q16" -> q16Sql,
      "tpch_q17" -> q17Sql, "tpch_q18" -> q18Sql, "tpch_q19" -> q19Sql,
      "tpch_q20" -> q20Sql, "tpch_q21" -> q21Sql, "tpch_q22" -> q22Sql)
}
