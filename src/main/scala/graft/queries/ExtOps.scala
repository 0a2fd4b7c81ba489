package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin, Skew, StringJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Extended operators beyond reference parity: as-of join, rollup
 * (grouping sets), intersect/union set ops, distinct aggregation,
 * and skew-salted aggregation. Each with a DuckDB oracle.
 */
object ExtOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: each purchase matched to the same user's latest
    // signup at or before it. Timestamps compared in epoch-micros on
    // both engines (the parquet source is nanos; Spark stores micros).
    "q_asof_signup" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("signup_us"))
        .agg(max(col("event_id")).as("signup_event"))
      AsOfJoin.backward(purchases, signups,
        keys = Seq("user_id"), leftTs = "us", rightTs = "signup_us",
        rightVals = Seq("signup_us", "signup_event"))
        .orderBy("event_id")
    },

    // Range (interval) join via bucketing: purchases inside each
    // user's 7-day post-signup window. Equi-join on (key, bucket) +
    // residual filter — no BNLJ (asserted in PlanSpec).
    "q_range_join" -> { (spark, dir) =>
      val dayUs = 86400000000L
      val ev = Tables.load(spark, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + lit(7L * dayUs)).as("end_us"),
          col("event_id").as("signup_event"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
          col("event_id").as("purchase_event"))
      RangeJoin.intervalJoin(signups, purchases, Seq("user_id"),
        "start_us", "end_us", "p_us", dayUs)
        .select("user_id", "signup_event", "purchase_event", "p_us")
        .orderBy("user_id", "signup_event", "purchase_event")
    },

    // Rollup / grouping sets (absent from the reference; free on Spark).
    "q_rollup" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_q"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Set intersection: customers ordering in both 1996 and 1997.
    "q_intersect" -> { (spark, dir) =>
      val orders = Tables.load(spark, dir, "orders")
      def year(y: Int) = orders.filter(
        col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select("o_custkey")
      year(1996).intersect(year(1997))
        .withColumnRenamed("o_custkey", "custkey").orderBy("custkey")
    },

    // Union of two sources (reference users express this via multiple
    // cogroup inputs; first-class here).
    "op_union" -> { (spark, dir) =>
      val r = Tables.load(spark, dir, "region")
        .select(lit("region").as("kind"), col("r_name").as("name"))
      val n = Tables.load(spark, dir, "nation")
        .select(lit("nation").as("kind"), col("n_name").as("name"))
      r.unionByName(n).orderBy("kind", "name")
    },

    // Distinct aggregation (no distinct-agg in the reference).
    "q_count_distinct" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")
    },

    // Scalar-function surface (string/date/math — the reference has
    // none built in, SURVEY §2.2; Spark's functions library is the
    // upgrade). Every computed column oracle-checked.
    "q_scalar_funcs" -> { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
          length(col("o_orderpriority")).cast("long").as("pri_len"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          floor(abs(col("o_totalprice") - lit(100000.0))).cast("long").as("dist_bucket"),
          greatest(col("o_custkey") % 7, lit(3L)).as("g7"))
        .orderBy("o_orderkey")
    },

    // JSON extraction (events.props is a JSON string column).
    "q_json_props" -> { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
      ev.groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_big"))
        .orderBy("event_type")
    },

    // Rolling window functions: per-user event sequence with lag and a
    // trailing 3-row moving aggregate (frame-bounded window).
    "q_window_rolling" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val w3 = w.rowsBetween(-2, Window.currentRow)
      Tables.load(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          col("value").cast(DecimalType(18, 6)).as("v"))
        .select(col("user_id"), col("event_id"),
          lag(col("v"), 1).over(w).cast("double").as("prev_v"),
          sum(col("v")).over(w3).cast("double").as("sum3"),
          count(lit(1)).over(w3).as("n3"))
        .orderBy("user_id", "event_id")
    },

    // Exact percentiles (interpolated) — Spark `percentile` and DuckDB
    // `quantile_cont` share the linear-interpolation definition, so the
    // doubles match bit-for-bit. (percentile_approx would need a
    // rows-only check; the exact form is oracle-enforceable.)
    "q_percentiles" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
          percentile(col("l_quantity"), lit(0.25)).as("q25"))
        .orderBy("l_returnflag")
    },

    // Global top-k: orderBy+limit plans as TakeOrderedAndProject —
    // per-partition heaps + driver merge of k rows, never a full global
    // sort (asserted in PlanSpec). The reference has no global sort at
    // all (SURVEY §2.2); this is the scalable form.
    "op_topk_global" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(50)
    },

    // HLL approximate distinct — sketch differs per engine → rows-only
    // driver check; relative-error bound vs exact asserted in SliceSpec.
    "q_approx_distinct" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")
    },

    // Approximate percentiles — the 100 TB twin of q_percentiles: the
    // exact `percentile` agg buffers every group value, this one keeps
    // a bounded mergeable sketch (rank error <= n/accuracy). Sketch is
    // engine-private and order-dependent -> rows-only; value error vs
    // the exact form asserted in PlanSpec.
    "q_approx_quantiles" -> { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5),
            lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.9),
            lit(10000)).as("p90"))
        .orderBy("l_returnflag")
    },

    // Skew-salted two-phase aggregation — same result as a direct
    // groupBy, robust to hot keys at scale.
    "op_salted_agg" -> { (spark, dir) =>
      Skew.saltedAgg(
        Tables.load(spark, dir, "lineitem")
          .select(col("l_returnflag"), col("l_quantity").cast("long").as("q")),
        keys = Seq("l_returnflag"), nSalts = 16)(
        partial = Seq(count(lit(1)).as("n"), sum(col("q")).as("sum_q")),
        merge = Seq(sum(col("n")).cast("long").as("n"), sum(col("sum_q")).as("sum_q")))
        .orderBy("l_returnflag")
    },

    // Skew-safe join on the (skewed) l_returnflag key: salted fan-out,
    // exact inner-join semantics — oracle is the plain join aggregate.
    "op_salted_join" -> { (spark, dir) =>
      val l = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
      val r = Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("flag_rows"))
      Skew.saltedJoin(l, r, Seq("l_returnflag"), nSalts = 8)
        .groupBy(col("l_returnflag"), col("flag_rows"))
        .agg(sum(col("q")).as("sum_q"), count(lit(1)).cast("long").as("n"))
        .orderBy("l_returnflag")
    },

    // Edit-distance similarity self-join (fuzzy entity matching):
    // every customer-name pair within levenshtein distance 1, via
    // q-gram prefix filtering (rarity-ordered, exactness-preserving —
    // no cross join, no df cap) + banded-DP verify. The oracle IS the
    // n² cross join — tractable only at oracle scale, which is the
    // point of the operator.
    "q_editdist_join" -> { (spark, dir) =>
      StringJoin.editDistancePairs(
        Tables.load(spark, dir, "customer"), "c_custkey", "c_name", k = 1)
        .orderBy("id1", "id2")
    },

    // Bipartite fuzzy lookup (near-exact-match decontamination shape):
    // a 5% hash bucket of customers probes the remaining 95% for names
    // within one edit — one rarity order over the union backs the
    // prefix filter for cross-side pairs.
    "q_editdist_lookup" -> { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer")
      val isProbe = graft.operators.Sampling.hashBucket(col("c_custkey")) <
        lit(graft.operators.Sampling.cuts(Seq(0.05))(1))
      StringJoin.editDistanceJoin(
        c.filter(isProbe), "c_custkey", "c_name",
        c.filter(!isProbe), "c_custkey", "c_name", k = 1)
        .orderBy("id1", "id2")
    },

    // Sorted-neighborhood blocking: every supplier-name pair within 3
    // positions of the (name, id) sort order — the windowed-scan ER
    // candidate generator, realized as a block-band equi-join over
    // range-sorted positions (no global window, no BNLJ).
    "q_snm_pairs" -> { (spark, dir) =>
      StringJoin.sortedNeighborhoodPairs(
        Tables.load(spark, dir, "supplier"), "s_suppkey", "s_name", w = 3)
        .orderBy("id1", "id2")
    },

    // Snapshot diff (incremental corpus refresh): version B is a
    // deterministic mutation of the documents table — some ids removed,
    // some texts revised, some new ids appended — and the operator
    // classifies every key in one full-outer join over (key, digest)
    // projections. The delta set (added|removed|changed) is what an
    // incremental pipeline re-processes.
    "q_dataset_diff" -> { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val a = docs.select("doc_id", "text", "lang", "source")
      val b = docs.filter(col("doc_id") % 17 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 5, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"),
          col("lang"), col("source"))
        .unionByName(docs.filter(col("doc_id") % 19 === 7)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("new "), col("text")).as("text"),
            col("lang"), col("source")))
      graft.operators.Diff.snapshot(a, b,
        keyCols = Seq("doc_id"), compareCols = Seq("text", "lang", "source"))
        .filter(col("status") =!= "unchanged")
        .select("doc_id", "status", "digest_a", "digest_b")
        .orderBy("doc_id")
    },

    // Pivot (wide per-day event-type counts): Spark's pivot with
    // EXPLICIT values — no extra distinct-values job, fixed schema,
    // one aggregation Exchange.
    "q_pivot" -> { (spark, dir) =>
      Tables.load(spark, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")
    },

    // Unpivot (melt) — the inverse: the wide per-day frame back to
    // long form, keeping explicit zero rows (which a plain GROUP BY
    // drops). Narrow row-expansion, no shuffle beyond the pivot's own.
    "q_unpivot" -> { (spark, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.load(spark, dir, "events")
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("day")), types.map(col).toArray, "event_type", "n")
        .orderBy("day", "event_type")
    },

    // Gap-filling over a date spine with carry-forward — the
    // time-series resample shape: sparse daily aggregates left-joined
    // onto a generated spine, missing counts zeroed, values filled
    // with last-observation-carried-forward. The global window is over
    // the SPINE (days, driver-bounded), never over events.
    "q_gapfill" -> { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.load(spark, dir, "events")
        .filter(col("event_type") === "purchase" && col("user_id") % 97 === 0)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("v"))
      val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true)
          .over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("day", "n", "v_filled")
        .orderBy("day")
    },

    // Column-level table profile (ANALYZE face): one agg pass + one
    // multi-distinct Exchange, one output row per column.
    "q_profile" -> { (spark, dir) =>
      graft.operators.Quality.profile(
        Tables.load(spark, dir, "documents"),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("col_name")
    },

    // Deterministic HLL distinct — unlike q_approx_distinct (stock
    // sketch, engine-private hash, rows-only), this one replays the
    // ENTIRE sketch + estimator in the DuckDB oracle bit-for-bit:
    // md5 registers, integer harmonic sum, linear-counting branch.
    "q_hll_distinct" -> { (spark, dir) =>
      graft.operators.Hll.approxDistinct(
        Tables.load(spark, dir, "lineitem"),
        Seq("l_returnflag"), col("l_partkey"))
        .orderBy("l_returnflag")
    },

    // Approximate column profile — q_profile's n_distinct at sketch
    // cost, in ONE pass: each row feeds a (col_name, value-as-string)
    // pair per profiled column, one grouped HLL over the exploded
    // frame. At 100 TB this replaces q_profile's multi-distinct
    // Exchange (which keys the shuffle by every distinct value of
    // every column) with m registers per column. Deterministic HLL ->
    // fully oracle-exact, nulls ignored exactly like COUNT(DISTINCT).
    "q_profile_hll" -> { (spark, dir) =>
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val pre = Tables.load(spark, dir, "documents")
        .select(posexplode(array(cols.map(c =>
          struct(lit(c).as("col_name"),
            col(c).cast("string").as("k"))): _*)).as(Seq("p", "s")))
        .select(col("s.col_name").as("col_name"), col("s.k").as("k"))
      graft.operators.Hll.approxDistinct(pre, Seq("col_name"), col("k"))
        .orderBy("col_name")
    },

    // Snapshot-overlap at sketch cost: |A|, |B|, |A∪B| from three HLL
    // register sets built in ONE pass over the tagged union (each row
    // feeds its own tag and 'u'), |A∩B| by inclusion-exclusion — the
    // corpus-drift summary you run daily at 100 TB where the exact
    // intersect join is a full shuffle. Deterministic HLL throughout,
    // so ALL FOUR estimates are oracle-exact.
    "q_hll_overlap" -> { (spark, dir) =>
      val d = Tables.load(spark, dir, "documents")
      val tagged = d.filter(col("doc_id") % 10 < 8)
        .select(col("doc_id"), lit("a").as("t"))
        .unionByName(d.filter(col("doc_id") % 10 >= 2)
          .select(col("doc_id"), lit("b").as("t")))
      val pre = tagged.select(col("doc_id"),
        explode(array(col("t"), lit("u"))).as("g"))
      graft.operators.Hll.approxDistinct(pre, Seq("g"), col("doc_id"))
        .groupBy(lit(1).as("one")).pivot("g", Seq("a", "b", "u"))
        .agg(first(col("approx_distinct")))
        .select(col("a").as("est_a"), col("b").as("est_b"),
          col("u").as("est_u"),
          ((col("a") + col("b")) - col("u")).as("est_intersect"))
    },

    // Count-min point estimates, same cross-engine-exact discipline:
    // sketch lineitem part references, probe a deterministic 5% slice
    // of the part keys (absent keys exercise the zero/collision path).
    "q_cms_counts" -> { (spark, dir) =>
      val sketch = graft.operators.Cms.build(
        Tables.load(spark, dir, "lineitem"), col("l_partkey"))
      val probes = Tables.load(spark, dir, "part")
        .filter(graft.operators.Sampling.hashBucket(col("p_partkey")) <
          lit(214748364L))
        .select(col("p_partkey").as("pk"))
      graft.operators.Cms.pointEstimates(sketch, probes, "pk")
        .orderBy("pk")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_asof_signup" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, epoch_us(ts) AS signup_us,
        |             max(event_id) AS signup_event
        |      FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.us, s.signup_us, s.signup_event
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND p.us >= s.signup_us
        |ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """WITH s AS (SELECT user_id, epoch_us(ts) AS start_us,
        |    epoch_us(ts) + 7 * 86400000000 AS end_us,
        |    event_id AS signup_event
        |  FROM events WHERE event_type = 'signup'),
        |p AS (SELECT user_id, epoch_us(ts) AS p_us,
        |    event_id AS purchase_event
        |  FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id AS user_id, signup_event, purchase_event, p_us
        |FROM s JOIN p ON s.user_id = p.user_id
        |  AND p_us >= start_us AND p_us < end_us
        |ORDER BY s.user_id, signup_event, purchase_event""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_intersect" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_custkey IN (
        |    SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY custkey""".stripMargin,
    "op_union" ->
      """SELECT kind, name FROM (
        |  SELECT 'region' AS kind, r_name AS name FROM region
        |  UNION ALL
        |  SELECT 'nation' AS kind, n_name AS name FROM nation)
        |ORDER BY kind, name""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "op_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "op_salted_join" ->
      """WITH r AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS flag_rows
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, r.flag_rows,
        |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem l JOIN r USING (l_returnflag)
        |GROUP BY l.l_returnflag, r.flag_rows
        |ORDER BY l.l_returnflag""".stripMargin,
    "op_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 50""".stripMargin,
    "q_window_rolling" ->
      """SELECT user_id, event_id,
        |  CAST(lag(CAST(value AS DECIMAL(18,6)), 1) OVER w AS DOUBLE) AS prev_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w3 AS DOUBLE) AS sum3,
        |  count(*) OVER w3 AS n3
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
        |  w3 AS (PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  quantile_cont(l_quantity, 0.25) AS q25
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(substr(o_orderpriority, 1, 3)) AS pri3,
        |  o_orderstatus || '-' || o_orderpriority AS status_pri,
        |  CAST(len(o_orderpriority) AS BIGINT) AS pri_len,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  CAST(floor(abs(o_totalprice - 100000.0)) AS BIGINT) AS dist_bucket,
        |  greatest(o_custkey % 7, 3) AS g7
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_json_props" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
        |        THEN 1 END) AS n_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_editdist_join" ->
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |       levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id1, id2""".stripMargin,
    "q_editdist_lookup" ->
      s"""WITH p AS (SELECT c_custkey, c_name FROM customer
         |  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),1,8))::BIGINT
         |        < ${(0.05 * (1L << 32)).toLong}),
         |c AS (SELECT c_custkey, c_name FROM customer
         |  WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),1,8))::BIGINT
         |        >= ${(0.05 * (1L << 32)).toLong})
         |SELECT p.c_custkey AS id1, c.c_custkey AS id2,
         |       levenshtein(p.c_name, c.c_name) AS dist
         |FROM p JOIN c ON levenshtein(p.c_name, c.c_name) <= 1
         |ORDER BY id1, id2""".stripMargin,
    "q_snm_pairs" ->
      """WITH p AS (SELECT s_suppkey AS sid,
        |    ROW_NUMBER() OVER (ORDER BY s_name, s_suppkey) - 1 AS pos
        |  FROM supplier)
        |SELECT a.sid AS id1, b.sid AS id2, CAST(b.pos - a.pos AS BIGINT) AS gap
        |FROM p a JOIN p b ON b.pos > a.pos AND b.pos - a.pos < 3
        |ORDER BY id1, id2""".stripMargin,
    "q_dataset_diff" -> {
      // same length-prefixed digest as Diff.rowDigest (|| propagates
      // NULL in DuckDB, matching Spark concat semantics)
      // single line: a leading || on a continuation line would lose a
      // pipe to the outer stripMargin
      def part(c: String) =
        s"COALESCE(CAST(length($c) AS VARCHAR) || ':' || $c, '~') || '|'"
      def dig(cs: String*) = "md5(" + cs.map(part).mkString(" || ") + ")"
      s"""WITH a AS (SELECT doc_id, text, lang, source FROM documents),
         |b AS (SELECT doc_id,
         |        CASE WHEN doc_id % 13 = 5 THEN text || ' [rev2]' ELSE text END AS text,
         |        lang, source
         |      FROM documents WHERE doc_id % 17 <> 3
         |      UNION ALL
         |      SELECT doc_id + 10000000, 'new ' || text, lang, source
         |      FROM documents WHERE doc_id % 19 = 7),
         |da AS (SELECT doc_id, ${dig("text", "lang", "source")} AS digest_a FROM a),
         |db AS (SELECT doc_id, ${dig("text", "lang", "source")} AS digest_b FROM b),
         |j AS (SELECT COALESCE(da.doc_id, db.doc_id) AS doc_id, digest_a, digest_b,
         |        CASE WHEN digest_a IS NULL THEN 'added'
         |             WHEN digest_b IS NULL THEN 'removed'
         |             WHEN digest_a = digest_b THEN 'unchanged'
         |             ELSE 'changed' END AS status
         |      FROM da FULL OUTER JOIN db ON da.doc_id = db.doc_id)
         |SELECT doc_id, status, digest_a, digest_b FROM j
         |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin
    },
    "q_pivot" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        | COUNT(*) FILTER (WHERE event_type='click') AS click,
        | COUNT(*) FILTER (WHERE event_type='error') AS error,
        | COUNT(*) FILTER (WHERE event_type='purchase') AS purchase,
        | COUNT(*) FILTER (WHERE event_type='signup') AS signup,
        | COUNT(*) FILTER (WHERE event_type='view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_unpivot" ->
      """WITH days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |t AS (SELECT UNNEST(['click','error','purchase','signup','view']) AS event_type),
        |agg AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |               COUNT(*) AS n FROM events GROUP BY 1, 2)
        |SELECT d.day, t.event_type, COALESCE(a.n, 0) AS n
        |FROM days d CROSS JOIN t
        |LEFT JOIN agg a ON a.day = d.day AND a.event_type = t.event_type
        |ORDER BY d.day, t.event_type""".stripMargin,
    "q_gapfill" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events WHERE event_type='purchase' AND user_id % 97 = 0
        |  GROUP BY 1),
        |spine AS (
        |  SELECT CAST(UNNEST(generate_series(
        |    (SELECT MIN(day) FROM daily), (SELECT MAX(day) FROM daily),
        |    INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT s.day, COALESCE(d.n, 0) AS n,
        |  LAST_VALUE(d.v IGNORE NULLS) OVER (ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM spine s LEFT JOIN daily d USING(day) ORDER BY day""".stripMargin,
    "q_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_v,
           |  CAST(MAX($c) AS VARCHAR) AS max_v
           |FROM documents""".stripMargin
      Seq("doc_id", "text", "lang", "source", "n_chars").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q_hll_distinct" ->
      (graft.operators.Hll.oracleSql("lineitem", Seq("l_returnflag"),
        "l_partkey") + "ORDER BY l_returnflag"),
    "q_cms_counts" ->
      (graft.operators.Cms.oracleSql("lineitem", "l_partkey",
        "SELECT p_partkey AS pk FROM part WHERE ('0x' || " +
          "substr(md5(CAST(p_partkey AS VARCHAR)),1,8))::BIGINT " +
          "< 214748364") + "ORDER BY pk"),
    "q_profile_hll" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val src = cols.map(c =>
          s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS k FROM documents")
        .mkString("(", "\n UNION ALL ", ") hll_src")
      graft.operators.Hll.oracleSql(src, Seq("col_name"), "k") +
        "ORDER BY col_name"
    },
    "q_hll_overlap" -> {
      val src =
        """(SELECT doc_id, 'a' AS g FROM documents WHERE doc_id % 10 < 8
          | UNION ALL SELECT doc_id, 'b' FROM documents WHERE doc_id % 10 >= 2
          | UNION ALL SELECT doc_id, 'u' FROM documents WHERE doc_id % 10 < 8
          | UNION ALL SELECT doc_id, 'u' FROM documents WHERE doc_id % 10 >= 2
          |) hll_src""".stripMargin
      val inner = graft.operators.Hll.oracleSql(src, Seq("g"), "doc_id")
      s"""SELECT
         |  max(CASE WHEN g='a' THEN approx_distinct END) AS est_a,
         |  max(CASE WHEN g='b' THEN approx_distinct END) AS est_b,
         |  max(CASE WHEN g='u' THEN approx_distinct END) AS est_u,
         |  (max(CASE WHEN g='a' THEN approx_distinct END) +
         |   max(CASE WHEN g='b' THEN approx_distinct END)) -
         |   max(CASE WHEN g='u' THEN approx_distinct END) AS est_intersect
         |FROM ($inner) hll_base""".stripMargin
    }
  )
}
