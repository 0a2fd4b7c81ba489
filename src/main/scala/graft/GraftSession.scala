package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session factory with scale-appropriate defaults (≅ the reference's
 * exec.Start/Session, exec/session.go:102-105 — except Spark provides
 * the executor, so "starting a session" is all that remains).
 */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the corpus's events.ts is TIMESTAMP(NANOS), which Spark 4 only
      // reads as long; Tables.load converts it back to a timestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Corpus table loader (TESTDATA.md layout: one parquet per table). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    // events.ts is TIMESTAMP(NANOS) in parquet; with
    // spark.sql.legacy.parquet.nanosAsLong it arrives as a long. Convert
    // with exact integer division (a double division would lose µs —
    // epoch-ns exceeds double's 2^53 exact range).
    if (table == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else df
  }

  def slice(spark: SparkSession, sfDir: String, table: String): Slice =
    Slice(load(spark, sfDir, table))
}
