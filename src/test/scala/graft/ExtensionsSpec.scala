package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions registration: native kernels reachable
  * from SQL text, values identical to the Column API. */
class ExtensionsSpec extends AnyFunSuite {
  // getOrCreate may hand back another suite's session in a shared test
  // JVM (builder extensions only apply at construction) — register on
  // whatever session we get, which is also the documented path for
  // sessions whose builder isn't ours.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("graft_dot / graft_hyperplane_sig callable from spark.sql") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.limit(20).createOrReplaceTempView("e")
    val sql = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS selfdot,
        |       graft_hyperplane_sig(embedding, 24) AS sig
        |FROM e ORDER BY vec_id""".stripMargin).collect()
    assert(sql.length == 20)
    import org.apache.spark.sql.functions.col
    val api = emb.limit(20).select(col("vec_id"),
      graft.functions.VectorExpressions.dotF(col("embedding"), col("embedding")).as("selfdot"),
      graft.functions.VectorExpressions.hyperplaneSigF(col("embedding"), 24).as("sig"))
      .orderBy("vec_id").collect()
    sql.zip(api).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1) && a.getLong(2) == b.getLong(2))
    }
  }

  test("graft_shingles / graft_minhash / graft_token_count callable from spark.sql") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(20).createOrReplaceTempView("d")
    val sql = spark.sql(
      """SELECT doc_id, graft_token_count(text) AS n,
        |       graft_shingles(text, 3) AS sh,
        |       graft_minhash(graft_shingles(text, 3), 16) AS sig
        |FROM d ORDER BY doc_id""".stripMargin).collect()
    assert(sql.length == 20)
    import org.apache.spark.sql.functions.col
    import graft.functions.MinhashFunctions.minhashSigF
    import graft.functions.ShingleFunctions.{shingleArrF, tokenCountF}
    val api = docs.limit(20).select(col("doc_id"),
      tokenCountF(col("text")).as("n"),
      shingleArrF(col("text"), 3).as("sh"),
      minhashSigF(shingleArrF(col("text"), 3), 16).as("sig"))
      .orderBy("doc_id").collect()
    sql.zip(api).foreach { case (a, b) =>
      assert(a.getInt(1) == b.getInt(1))
      assert(a.getSeq[String](2) == b.getSeq[String](2))
      assert(a.getSeq[Long](3) == b.getSeq[Long](3))
    }
  }
}
