package graft.examples

import graft.{GraftSession, Tables}
import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, Quality, Sampling}
import org.apache.spark.sql.functions._

/**
 * End-to-end LLM training-data pipeline over the documents corpus —
 * the composition the individual operators exist for:
 *
 *   load → quality gates (named expectations, quarantine with
 *   reasons) → exact dedup → near-dup clusters (MinHash+LSH →
 *   verified pairs → connected components) → keep one canonical doc
 *   per cluster → stratified language rebalancing → deterministic
 *   train/val/test split → token stats.
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

    // 1. quality gates (cheap, run first to shrink everything):
    //    named expectations, violators quarantined WITH reasons
    val tagged = docs
      .withColumn("lang", TF.langId(col("text")))
      .withColumn("quality", TF.qualityScore(col("text")))
    val (gatedRaw, quarantined) = Quality.quarantine(tagged, Seq(
      "unknown_lang" -> (col("lang") =!= "und"),
      "low_quality" -> (col("quality") > 0.3)))
    val gated = gatedRaw.persist()
    val kept1 = gated.count()
    val nQuar = quarantined.count()

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

    // 4. stratified rebalancing (downsample the dominant language) and
    //    deterministic split — both pure hash membership, scan-speed
    // distinct salt: the rebalancing decision must be INDEPENDENT of
    // the split decision below (same key, same hash → correlated
    // membership; see Sampling.hashBucket's pitfall note)
    val balanced = Sampling.stratifiedSample(deduped, "doc_id", col("lang"),
      Map("en" -> 0.5), salt = "balance")
    val split = Sampling.assignSplit(balanced, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).persist()
    val kept4 = split.count()

    // 5. token accounting on the final corpus, per split
    val stats = split.agg(
      sum(TF.wsTokenCount(col("text")).cast("long")).as("ws_tokens"),
      sum(TF.bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"),
      avg(col("quality")).as("mean_quality")).head()
    val perSplit = split.groupBy("split").count().orderBy("split")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")

    println(s"docs: $total -> gates: $kept1 (quarantined $nQuar) " +
      s"-> exact-dedup: $kept2 -> near-dedup: $kept3 -> balanced: $kept4")
    println(s"splits: $perSplit")
    println(s"tokens(ws)=${stats.getLong(0)} tokens(bpe)=${stats.getLong(1)} " +
      f"mean_quality=${stats.getDouble(2)}%.3f")
    require(kept1 + nQuar == total, "gates must partition the corpus")
    require(kept3 > 0 && kept3 <= kept2 && kept2 <= kept1 && kept1 <= total)
    require(kept4 > 0 && kept4 <= kept3)
    spark.stop()
  }
}
