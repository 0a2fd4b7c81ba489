package graft.examples

import graft.{GraftSession, Slice, Tables}
import graft.sources.Sources
import org.apache.spark.sql.functions._

/**
 * The reference's hello-world (docs/index.md wordcount:
 * ScanReader → Flatmap(Fields) → Map(word→(word,1)) → Reduce(+)),
 * re-expressed graft-style over the documents corpus.
 * Run: sbt "runMain graft.examples.WordCount [sfDir]"
 */
object WordCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    import spark.implicits._

    val docs = Tables.slice(spark, sfDir, "documents")
    val counts = docs
      .select(col("text"))
      .explodeCol(split(col("text"), "\\s+"), "word")
      .filter(length(col("word")) > 0)
      .reduce(count(lit(1)).as("n"))
      .sort(col("n").desc, col("word"))

    counts.df.show(10, truncate = false)
    println(s"distinct words: ${counts.count()}")

    // typed-path equivalent (bigslice-shaped: user functions end-to-end)
    val typed = docs.select(col("text"))
      .flatMap[String, (String, Int)](t => t.split("\\s+").iterator.filter(_.nonEmpty).map((_, 1)))
      .reduceF[String, Int](_ + _)
    println(s"typed-path distinct words: ${typed.count()}")
    spark.stop()
  }
}
