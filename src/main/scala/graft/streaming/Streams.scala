package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Streaming surface — an EXTENSION beyond the reference, which is batch
 * only (SURVEY §1.6): Structured Streaming versions of the engine's
 * aggregation shapes, so the same pipelines run incrementally with
 * watermarked event-time state.
 */
object Streams {

  /** Open the events table as a stream (batch parquet driven through
    * the streaming engine — the local test harness; in production the
    * source is kafka/files with identical downstream code). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // glob form: FileStreamSource requires a directory-rooted pattern,
    // not a bare file path (basePath must be a directory).
    val raw = spark.readStream.schema(schema)
      .parquet(s"$sfDir/events.parque[t]")
    // events.ts arrives as long nanos (see Tables.load); same conversion.
    raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Windowed per-type counts/sums with late-data handling: the
    * streaming analog of the q_events_daily rollup. */
  def windowedTypeCounts(events: DataFrame,
                         window_ : String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a streaming query to completion against the (finite) batch
    * source and return the result — the slicetest.Run analog for
    * streaming (memory sink + processAllAvailable). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  outputMode: String = "update"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
