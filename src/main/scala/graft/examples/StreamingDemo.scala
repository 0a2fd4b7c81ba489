package graft.examples

import graft.GraftSession
import graft.streaming.Streams

/** Incremental events rollup through Structured Streaming.
  * Run: sbt "runMain graft.examples.StreamingDemo [sfDir]" */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val rollup = Streams.windowedTypeCounts(Streams.eventsStream(spark, sfDir))
    val result = Streams.runToMemory(spark, rollup, "demo_rollup")
    result.orderBy("win_start", "event_type").show(12, truncate = false)
    println(s"windows x types: ${result.count()}")
    spark.stop()
  }
}
