package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/**
 * Headline analytical queries over the corpus — TPC-H-shaped plans that
 * exercise the engine the way a user of the reference would compose
 * Map/Filter/Reduce/Cogroup pipelines, expressed Spark-first:
 * declarative plans, broadcast joins for dims, partial aggregation.
 * These are the BENCH queries.
 */
object Tpch {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")
  private def dsumSql(expr: String) =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1: pricing summary. One scan, one partial+final aggregate.
    "q1_pricing_summary" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty").cast("double") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q3: shipping priority — join customer⋈orders⋈lineitem with
    // the small dim side broadcast; top-10 by revenue.
    "q3_shipping_priority" -> { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5: local supplier volume — 6-way join, dims broadcast.
    "q5_local_supplier" -> { (spark, dir) =>
      val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables.load(spark, dir, "nation")
      val cust = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val sup = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
      val orders = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(sup),
          li("l_suppkey") === sup("s_suppkey") && cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nation), sup("s_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6: forecast revenue — pure scan+filter+agg; predicates
    // push down to parquet row groups.
    "q6_revenue" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n"))
    },

    // Window functions (beyond reference parity — free on Spark):
    // top-3 customers by spend per nation.
    "q_window_top_customers" -> { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      val orders = Tables.load(spark, dir, "orders")
      val spend = orders.groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("spend").desc, col("c_custkey"))
      cust.join(spend, cust("c_custkey") === spend("o_custkey"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_nationkey"), col("rnk"), col("c_custkey"), col("spend"))
        .orderBy(col("c_nationkey"), col("rnk"))
    },

    // Set ops (beyond reference parity): customers with orders in 1996
    // but none in 1997.
    "q_set_except" -> { (spark, dir) =>
      val orders = Tables.load(spark, dir, "orders")
      val y96 = orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp")).select("o_custkey")
      val y97 = orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")).select("o_custkey")
      y96.except(y97).withColumnRenamed("o_custkey", "custkey").orderBy("custkey")
    },

    // Events rollup: per-day per-type counts and exact value sums.
    "q_events_daily" -> { (spark, dir) =>
      Tables.load(spark, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("day"), col("event_type"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  COUNT(*) AS count_order,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  ${dsumSql("l_extendedprice")} / COUNT(*) AS avg_price
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING'
         |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_revenue" ->
      s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q_window_top_customers" ->
      s"""WITH spend AS (
         |  SELECT o_custkey, ${dsumSql("o_totalprice")} AS spend
         |  FROM orders GROUP BY o_custkey)
         |SELECT c_nationkey, rnk, c_custkey, spend FROM (
         |  SELECT c_nationkey, c_custkey, spend,
         |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
         |                       ORDER BY spend DESC, c_custkey) AS rnk
         |  FROM customer JOIN spend ON c_custkey = o_custkey)
         |WHERE rnk <= 3 ORDER BY c_nationkey, rnk""".stripMargin,
    "q_set_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_custkey NOT IN (
        |    SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY custkey""".stripMargin,
    "q_events_daily" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin
  )
}
