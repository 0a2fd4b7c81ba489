package graft.examples

import graft.{GraftSession, Tables}
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/**
 * End-to-end LLM training-data pipeline over the documents corpus —
 * the composition the individual operators exist for:
 *
 *   load → language filter → quality filter → exact dedup →
 *   near-dup clusters (MinHash+LSH → verified pairs → connected
 *   components) → keep one canonical doc per cluster → token stats.
 *
 * Every stage is declarative or a bucket-joined sketch; nothing
 * materializes on the driver, so the same code runs at corpus scale
 * (the stages shuffle on digest/doc_id/bucket keys only).
 *
 * Usage: runMain graft.examples.TrainingDataPipeline [sfDir]
 */
object TrainingDataPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")
    val total = docs.count()

    // 1. language + quality gates (cheap, run first to shrink everything)
    val gated = docs
      .withColumn("lang", TF.langId(col("text")))
      .withColumn("quality", TF.qualityScore(col("text")))
      .filter(col("lang") =!= "und" && col("quality") > 0.3)
      .persist()
    val kept1 = gated.count()

    // 2. exact dedup: canonical = min doc_id per content digest
    val exactCanon = gated
      .groupBy(md5(col("text").cast("binary")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact = gated.join(exactCanon, "doc_id").persist()
    val kept2 = exact.count()

    // 3. near-dup clusters: MinHash+LSH candidates → exact-verified
    //    pairs → connected components → drop non-canonical members
    val pairs = Dedup.minhashDupPairs(exact, "doc_id", "text",
      k = 3, numPerms = 64, bandRows = 2, minJ = 0.5)
    val comps = Dedup.connectedComponents(pairs)
    val dropDocs = comps.filter(col("doc_id") =!= col("component")).select("doc_id")
    val deduped = exact.join(dropDocs, Seq("doc_id"), "left_anti").persist()
    val kept3 = deduped.count()

    // 4. token accounting on the surviving corpus
    val stats = deduped.agg(
      sum(TF.wsTokenCount(col("text")).cast("long")).as("ws_tokens"),
      sum(TF.bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"),
      avg(col("quality")).as("mean_quality")).head()

    println(s"docs: $total -> lang/quality: $kept1 -> exact-dedup: $kept2 " +
      s"-> near-dedup: $kept3")
    println(s"tokens(ws)=${stats.getLong(0)} tokens(bpe)=${stats.getLong(1)} " +
      f"mean_quality=${stats.getDouble(2)}%.3f")
    require(kept3 > 0 && kept3 <= kept2 && kept2 <= kept1 && kept1 <= total)
    spark.stop()
  }
}
