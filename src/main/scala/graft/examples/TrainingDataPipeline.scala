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
 *   per cluster → benchmark decontamination → target-mixture
 *   rebalancing (derived per-language fractions) → deterministic
 *   train/val/test split → reproducible epoch ordering → token stats.
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
    // lang_pred = the stopword-heuristic language ID (gates on it);
    // the corpus's own `lang` column stays intact for the mixture step
    val tagged = docs
      .withColumn("lang_pred", TF.langId(col("text")))
      .withColumn("quality", TF.qualityScore(col("text")))
    val (gatedRaw, quarantined) = Quality.quarantine(tagged, Seq(
      "unknown_lang" -> (col("lang_pred") =!= "und"),
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

    // 3b. benchmark decontamination: scrub docs sharing any 8-token
    //     shingle with the eval/probe set (here a held-out hash slice
    //     stands in for a benchmark); probe shingles broadcast, the
    //     corpus text never shuffles
    val isProbe =
      Sampling.hashBucket(col("doc_id"), "probe") <
        lit(Sampling.cuts(Seq(0.05))(1))
    val contaminatedIds = Dedup.contaminated(
      deduped.filter(!isProbe), deduped.filter(isProbe),
      "doc_id", "text", k = 8).select("doc_id")
    val clean = deduped.filter(!isProbe)
      .join(broadcast(contaminatedIds), Seq("doc_id"), "left_anti").persist()
    val kept3b = clean.count()

    // 3c. retrieval audit over a PERSISTED index: the shingle scrub
    //     above catches verbatim overlap; a BM25 pass over the cleaned
    //     corpus surfaces the strongest remaining lexical matches per
    //     benchmark doc for human review. The index is built once and
    //     would be append-extended on later ingests — probes read only
    //     the term buckets the benchmark vocabulary hashes to.
    val tidxDir = java.nio.file.Files
      .createTempDirectory("graft_pipeline_tidx").toString
    graft.operators.TermIndex.build(spark, clean, "doc_id", "text", tidxDir)
    val auditHits = graft.operators.TermIndex.topK(spark, tidxDir,
      deduped.filter(isProbe), "doc_id", "text", k = 3).count()

    // 4. target-mixture rebalancing (fractions DERIVED from declared
    //    language weights — the binding language keeps every row) and
    //    deterministic split — both pure hash membership, scan-speed
    // distinct salt: the rebalancing decision must be INDEPENDENT of
    // the split decision below (same key, same hash → correlated
    // membership; see Sampling.hashBucket's pitfall note)
    val balanced = Sampling.mixtureSample(clean, "doc_id", col("lang"),
      Map("en" -> 0.4, "fr" -> 0.2, "es" -> 0.2, "de" -> 0.2),
      salt = "balance")
    val split = Sampling.assignSplit(balanced, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).persist()
    val kept4 = split.count()

    // 5. reproducible epoch ordering for the train split: positions are
    //    a pure function of corpus contents; salt selects the epoch
    val epoch0 = Sampling.shuffleEpoch(
      split.filter(col("split") === "train").select("doc_id", "text"),
      "doc_id", salt = "epoch0")
    val nTrain = epoch0.count()

    // 6. token accounting on the final corpus, per split
    val stats = split.agg(
      sum(TF.wsTokenCount(col("text")).cast("long")).as("ws_tokens"),
      sum(TF.bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"),
      avg(col("quality")).as("mean_quality")).head()
    val perSplit = split.groupBy("split").count().orderBy("split")
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")

    println(s"docs: $total -> gates: $kept1 (quarantined $nQuar) " +
      s"-> exact-dedup: $kept2 -> near-dedup: $kept3 " +
      s"-> decontaminated: $kept3b (retrieval-audit hits: $auditHits) " +
      s"-> balanced: $kept4")
    println(s"splits: $perSplit  (train epoch-0 ordered rows: $nTrain)")
    println(s"tokens(ws)=${stats.getLong(0)} tokens(bpe)=${stats.getLong(1)} " +
      f"mean_quality=${stats.getDouble(2)}%.3f")
    require(kept1 + nQuar == total, "gates must partition the corpus")
    require(kept3 > 0 && kept3 <= kept2 && kept2 <= kept1 && kept1 <= total)
    require(kept3b > 0 && kept3b <= kept3 && kept4 > 0 && kept4 <= kept3b)
    require(nTrain > 0 && nTrain <= kept4)
    spark.stop()
  }
}
