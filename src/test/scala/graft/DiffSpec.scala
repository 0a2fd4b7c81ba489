package graft

import graft.operators.{Diff, Quality}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Snapshot diff + table profile: exactness pinned against a by-hand
 * classification, digest collision-resistance against the adversarial
 * boundary-shift case, and the scale contract (digests computed before
 * the join, so only key+digest shuffles) against the plan.
 */
class DiffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "text", "tag")
  }

  test("snapshot classifies added/removed/changed/unchanged by hand-checked case") {
    val a = df(Seq((1L, "alpha", "x"), (2L, "beta", "x"), (3L, "gamma", "y"),
      (4L, "delta", "y")))
    val b = df(Seq((1L, "alpha", "x"), // unchanged
      (2L, "beta2", "x"), // changed text
      (4L, "delta", "z"), // changed tag
      (5L, "eps", "x"))) // added; 3 removed
    val got = Diff.snapshot(a, b, Seq("id"), Seq("text", "tag"))
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("rowDigest is boundary-safe: (ab,c) != (a,bc) and NULL != empty") {
    val a = df(Seq((1L, "ab", "c"), (2L, "", "q")))
    val b = {
      import spark.implicits._
      Seq((1L, "a", "bc"), (2L, null.asInstanceOf[String], "q"))
        .toDF("id", "text", "tag")
    }
    val st = Diff.snapshot(a, b, Seq("id"), Seq("text", "tag"))
      .select("id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "changed", 2L -> "changed"))
  }

  test("diff plan shuffles digests, not content: no text column past the scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qe = Diff.snapshot(docs, docs.filter(col("doc_id") % 2 === 0),
      Seq("doc_id"), Seq("text")).queryExecution
    // digests are computed BELOW the full-outer join (in the per-side
    // projections feeding the Exchange), so only (key, digest) moves:
    // in the top-down optimized-plan print, md5 appears after Join
    val lines = qe.optimizedPlan.toString.linesIterator.toSeq
    val joinAt = lines.indexWhere(_.contains("Join"))
    val md5At = lines.indexWhere(_.contains("md5"))
    assert(joinAt >= 0 && md5At > joinAt, lines.mkString("\n"))
    // and the join itself compares digest columns, not text
    assert(!lines(joinAt).contains("text"), lines(joinAt))
  }

  test("diff-driven refresh: applying the delta to an IvfIndex == probing snapshot B") {
    import graft.operators.{Diff, IvfIndex}
    import graft.functions.VectorExpressions.{dotF, normF}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // snapshot B: remove %17==3, re-embed %13==5 (negated), add shifted
    // copies of %19==7 under new ids
    val removed = emb.filter(col("vec_id") % 17 === 3)
    val b = emb.filter(col("vec_id") % 17 =!= 3)
      .select(col("vec_id"),
        when(col("vec_id") % 13 === 5,
          org.apache.spark.sql.functions.transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
      .unionByName(emb.filter(col("vec_id") % 19 === 7)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val cfg = IvfIndex.Config(dim = 64, nList = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_diff_refresh")
      .toString + "/idx"
    IvfIndex.build(spark, emb, "vec_id", "embedding", dir, cfg)
    // the refresh loop: classify with Diff, then delete/upsert/append
    val d = Diff.snapshot(emb, b, Seq("vec_id"), Seq("embedding")).persist()
    IvfIndex.delete(spark, dir,
      d.filter(col("status") === "removed").select("vec_id"), "vec_id")
    IvfIndex.upsert(spark, dir,
      b.join(d.filter(col("status") === "changed"), Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", cfg)
    IvfIndex.append(spark, dir,
      b.join(d.filter(col("status") === "added"), Seq("vec_id"), "left_semi"),
      "vec_id", "embedding", cfg)
    d.unpersist()
    // exhaustive probe of the refreshed index == independent cosine
    // top-k over snapshot B (same kernel, different plan)
    val q = emb.filter(col("vec_id") < 8)
    val got = IvfIndex.topK(spark, dir, q, "vec_id", "embedding", 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expected = q
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(b.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dotF(col("qv"), col("cv")) / (normF(col("qv")) * normF(col("cv"))))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rnk") <= 5)
      .select("query_id", "rnk", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected, "refreshed index diverges from snapshot B")
    assert(removed.count() > 0 &&
      !got.exists(t => t._3 % 17 == 3 && t._3 < 1000000L))
  }

  test("snapshot matches rows on NULL keys null-safely (no phantom removed+added)") {
    import spark.implicits._
    val a = Seq((Option(1L), "alpha", "x"), (Option.empty[Long], "beta", "x"))
      .toDF("id", "text", "tag")
    val b = Seq((Option(1L), "alpha", "x"), (Option.empty[Long], "beta2", "x"))
      .toDF("id", "text", "tag")
    val got = Diff.snapshot(a, b, Seq("id"), Seq("text", "tag"))
      .select("id", "status").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1))
      .toMap
    // the NULL-keyed row compares (changed), not removed+added twice
    assert(got == Map(1L -> "unchanged", -1L -> "changed"))
  }

  test("profile of an EMPTY table returns zero counts, not NPE") {
    import spark.implicits._
    val t = Seq.empty[(Long, String)].toDF("k", "v")
    val p = Quality.profile(t, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 0 && p("k").getLong(2) == 0 &&
      p("k").getLong(3) == 0)
    assert(p("v").getString(4) == null && p("v").getString(5) == null)
  }

  test("profile: counts/nulls/distinct/min/max per column, exact") {
    import spark.implicits._
    val t = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("a"))).toDF("k", "v")
    val p = Quality.profile(t, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = p("k"); val v = p("v")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 4)
    assert(k.getString(4) == "1" && k.getString(5) == "4")
    assert(v.getLong(1) == 4 && v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getString(4) == "a" && v.getString(5) == "b")
  }
}
