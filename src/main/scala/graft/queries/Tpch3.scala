package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Third TPC-H-shaped pack completing the 22-query set: q2, q11, q12,
 * q20, q21 — adapted to the corpus schema (no partsupp/shipmode/
 * commitdate; "supply cost" ← min lineitem price per (part, supplier),
 * "late" ← shipdate vs orderdate + grace; plan shapes preserved).
 * Exercises: correlated-min subquery join (q2), global-scalar threshold
 * over grouped values (q11), conditional classification agg (q12),
 * semi-join chain with HAVING (q20), exactly-one-offender aggregation —
 * the EXISTS / NOT-EXISTS self-join pair collapsed into one grouped
 * pass (q21).
 *
 * Scale notes: dims broadcast; every "correlated subquery" is a
 * partial+final aggregate on the fact scan joined back by key (one
 * shuffle, reused); q11/q21's single-row scalars cross-join via a
 * 1-row broadcast (the benign scalar BNLJ, same as q22). Exact-decimal
 * sums (`dsum`) keep threshold comparisons order-independent — a plain
 * double sum would make HAVING decisions nondeterministic across
 * partitionings for values near the cut.
 */
object Tpch3 {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")
  private def dsumSql(expr: String) =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  private def ts(s: String) = lit(s).cast("timestamp")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2 shape: cheapest regional supplier per qualifying part —
    // correlated MIN subquery becomes agg + equi-join on (part, min).
    "q2_min_cost_supplier" -> { (spark, dir) =>
      val region = Tables.load(spark, dir, "region").filter(col("r_name") === "EUROPE")
      val nat = Tables.load(spark, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.load(spark, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_name"))
      val cost = Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
      val minCost = cost.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      cost.join(minCost,
          col("l_partkey") === col("mc_partkey") && col("cost") === col("min_cost"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(20)
    },

    // Q11 shape: parts whose (one nation's) value share exceeds a
    // global-scalar threshold; exact-decimal sums both sides of the cut.
    "q11_important_parts" -> { (spark, dir) =>
      val sup = Tables.load(spark, dir, "supplier")
        .join(broadcast(Tables.load(spark, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val li = Tables.load(spark, dir, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(dsum(col("l_extendedprice")).as("part_value"))
      val total = li.agg(dsum(col("l_extendedprice")).as("total_value"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_value") > col("total_value") * 0.001)
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // Q12 shape: order-priority classification of late shipments per
    // returnflag class (flag stands in for shipmode; late = shipped
    // more than 60 days after the order date).
    "q12_late_priority" -> { (spark, dir) =>
      val orders = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
                col("l_shipdate") < ts("1998-01-01"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // Q20 shape: suppliers of one nation who shipped a significant
    // volume of the prefix-named parts — nested IN subqueries become a
    // broadcast semi chain + HAVING on the grouped fact.
    "q20_promotion_suppliers" -> { (spark, dir) =>
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_name").startsWith("small"))
        .select("p_partkey")
      val shipped = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
        .filter(col("qty") > 100L)
      Tables.load(spark, dir, "supplier")
        .join(broadcast(Tables.load(spark, dir, "nation")
          .filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    },

    // Q21 shape: the supplier who single-handedly held up a
    // multi-supplier order — EXISTS (another supplier) + NOT EXISTS
    // (another LATE supplier) collapsed into one per-order aggregate:
    // keep orders with >=2 suppliers and exactly 1 late one.
    "q21_waiting_suppliers" -> { (spark, dir) =>
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")
      val perOrder = Tables.load(spark, dir, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(late, col("l_suppkey"))).as("n_late"),
          max(when(late, col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
      perOrder.groupBy(col("late_supp"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.load(spark, dir, "supplier")),
          col("late_supp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH sup AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cost AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |rc AS (SELECT c.*, s.s_name, s.s_acctbal, s.n_name
        |       FROM cost c JOIN sup s ON c.l_suppkey = s.s_suppkey),
        |mc AS (SELECT l_partkey, min(cost) AS min_cost FROM rc GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM rc JOIN mc USING (l_partkey)
        |JOIN part ON l_partkey = p_partkey
        |WHERE cost = min_cost AND p_type = 'LARGE' AND p_size <= 10
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 20""".stripMargin,
    "q11_important_parts" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_extendedprice FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'),
         |pp AS (SELECT l_partkey, ${dsumSql("l_extendedprice")} AS part_value
         |       FROM li GROUP BY 1),
         |t AS (SELECT ${dsumSql("l_extendedprice")} AS total_value FROM li)
         |SELECT l_partkey, part_value FROM pp, t
         |WHERE part_value > total_value * 0.001
         |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q20_promotion_suppliers" ->
      """WITH shipped AS (
        |  SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 100)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |  AND s_suppkey IN (SELECT l_suppkey FROM shipped)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH po AS (
        |  SELECT o_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS n_supp,
        |    COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |                        THEN l_suppkey END) AS n_late,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |             THEN l_suppkey END) AS late_supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY o_orderkey
        |  HAVING COUNT(DISTINCT l_suppkey) >= 2
        |     AND COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |                             THEN l_suppkey END) = 1)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM po JOIN supplier ON late_supp = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin
  )
}
