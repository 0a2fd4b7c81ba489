package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Second TPC-H-shaped query pack, adapted to the corpus schema (no
 * partsupp / commitdate / shipmode columns — predicates re-targeted to
 * columns that exist; plan shapes preserved). Exercises: EXISTS
 * semi-join (q4), nation-pair theta-ish join (q7), top-k grouped join
 * (q10), left-outer count distribution (q13), conditional aggregation
 * (q14), agg-max subquery (q15), correlated-avg join (q17), HAVING
 * semi-join (q18), disjunctive multi-range predicates (q19).
 *
 * Scale notes: dims (nation, part at these SFs) broadcast; fact-fact
 * joins (orders⋈lineitem) shuffle on the join key once and reuse the
 * exchange; q17's per-part average is a partial+final agg on the
 * lineitem scan, joined broadcast-side at small SF but planned as a
 * shuffle join at scale by AQE on real part counts.
 */
object Tpch2 {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")
  private def dsumSql(expr: String) =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  private def ts(s: String) = lit(s).cast("timestamp")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q4 shape: priority count of orders with at least one late-shipped
    // lineitem (l_shipdate > o_orderdate stands in for the reference's
    // commit/receipt comparison). EXISTS → left_semi join.
    "q4_order_priority" -> { (spark, dir) =>
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
                col("o_orderdate") < ts("1996-10-01"))
      val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
      orders.join(li,
          orders("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > orders("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q7 shape: bilateral trade volume between two nations by ship year.
    "q7_volume_shipping" -> { (spark, dir) =>
      val n1 = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      val sup = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val orders = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1998-01-01"))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(n1), sup("s_nationkey") === n1("s_nkey"))
        .join(broadcast(n2), cust("c_nationkey") === n2("c_nkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8 shape: market share of one supplier nation within one region's
    // customer volume, by order year (conditional agg over a 7-table join).
    "q8_market_share" -> { (spark, dir) =>
      val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
      val n1 = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
      val n2 = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(n1), cust("c_nationkey") === n1("c_nkey"))
        .join(broadcast(region), n1("n_regionkey") === region("r_regionkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n2), sup("s_nationkey") === n2("s_nkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0))) /
          dsum(vol)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9 shape: supplier-nation revenue by year over a part-name
    // subset (profit query minus the absent partsupp cost column).
    "q9_product_profit" -> { (spark, dir) =>
      val part = Tables.load(spark, dir, "part")
        .filter(col("p_name").contains("widget")).select("p_partkey")
      val sup = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nation = Tables.load(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val orders = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
        .join(orders, li("l_orderkey") === orders("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q10 shape: top-20 customers by returned-item revenue in a quarter.
    "q10_returned_items" -> { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      val nation = Tables.load(spark, dir, "nation")
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1996-04-01"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q13 shape: distribution of per-customer order counts, including
    // zero-order customers (left outer join with an ON-clause filter).
    "q13_customer_distribution" -> { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer").select("c_custkey")
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14 shape: promo revenue share in one month (conditional agg).
    "q14_promo_revenue" -> { (spark, dir) =>
      val part = Tables.load(spark, dir, "part").select("p_partkey", "p_type")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-03-01") &&
                col("l_shipdate") < ts("1996-04-01"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .agg((lit(100.0) *
          dsum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))) /
          dsum(vol)).as("promo_revenue"))
    },

    // Q15 shape: supplier(s) achieving max quarterly revenue
    // (agg → global-max scalar subquery → join back).
    "q15_top_supplier" -> { (spark, dir) =>
      val sup = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_name")
      val rev = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
      val best = rev.agg(max(col("total_revenue")).as("m"))
      rev.join(broadcast(best), rev("total_revenue") === best("m"))
        .join(broadcast(sup), rev("l_suppkey") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },

    // Q17 shape: revenue from small-quantity orders of one brand —
    // correlated per-part average decorrelated into an agg + join.
    "q17_small_quantity" -> { (spark, dir) =>
      val part = Tables.load(spark, dir, "part")
        .filter(col("p_brand") === "Brand#11")
        .select("p_partkey")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val avgQ = li.groupBy(col("l_partkey").as("a_partkey"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(avgQ, li("l_partkey") === avgQ("a_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n"))
    },

    // Q18 shape: large-volume orders (HAVING sum(qty) > 280 semi-join).
    "q18_large_volume" -> { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_name")
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 280)
      orders.join(big, orders("o_orderkey") === big("l_orderkey"))
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Q16 shape: distinct supplier breadth per part type/size bucket
    // (partsupp replaced by observed lineitem part-supplier pairs).
    "q16_supplier_breadth" -> { (spark, dir) =>
      val part = Tables.load(spark, dir, "part")
        .filter(col("p_size") <= 20)
        .select("p_partkey", "p_type", "p_size")
      val li = Tables.load(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_type"), col("p_size"))
    },

    // Q22 shape: high-balance customers gone idle (scalar aggregate
    // subquery in the filter + anti join). "Idle" = no order since the
    // cutoff, not "never ordered" — this corpus gives every customer
    // at least one lifetime order, which would make the anti-join
    // vacuously empty at small SFs (0 rows at sf0.01); the dated form
    // exercises the same plan with a non-empty cohort at every SF.
    "q22_idle_customers" -> { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      // threshold must be bit-identical to the oracle's: exact decimal
      // sum (→ double, exactly representable) / integer count — a plain
      // double avg is accumulation-order-dependent across engines and
      // could flip a boundary row
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("ab"))
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
        .select("o_custkey")
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("nationkey")
    },

    // Q19 shape: disjunctive brand × size × quantity range predicates.
    "q19_discounted_revenue" -> { (spark, dir) =>
      val part = Tables.load(spark, dir, "part")
        .select("p_partkey", "p_brand", "p_size")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .filter(cond)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  ${dsumSql("volume")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    year(l_shipdate) AS l_year,
         |    l_extendedprice * (1 - l_discount) AS volume
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') t
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  ${dsumSql("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |  / ${dsumSql("l_extendedprice * (1 - l_discount)")} AS mkt_share
         |FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
         |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_profit
         |FROM lineitem, part, supplier, nation, orders
         |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
         |  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
         |  AND p_name LIKE '%widget%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      s"""SELECT 100.0 *
         |  ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
         |  / ${dsumSql("l_extendedprice * (1 - l_discount)")} AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier, revenue
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    "q17_small_quantity" ->
      s"""SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND p_brand = 'Brand#11'
         |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
         |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q18_large_volume" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 280)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q16_supplier_breadth" ->
      """SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND p_size <= 20
        |GROUP BY p_type, p_size
        |ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin,
    "q22_idle_customers" ->
      s"""SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |  COUNT(*) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${dsumSql("c_acctbal")} / COUNT(*)
         |                   FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '1998-06-01')
         |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin,
    "q19_discounted_revenue" ->
      s"""SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND (
         |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |   AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |      AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin
  )
}
