package graft

import graft.sources.Sources
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Shard-count matrix — the analog of the reference's dual-executor test
 * matrix (slice_test.go:64-105, every operator re-run under local and
 * multi-machine executors). The failure mode those runs guard against —
 * per-shard logic leaking into results — maps in Spark to partition
 * count, so every operator family here runs at 1, 3 and 8 shards (97
 * rows: not divisible by either) and must produce identical results.
 */
class MatrixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val shardCounts = Seq(1, 3, 8)
  private val data: Seq[(String, Int)] =
    (1 to 97).map(i => (s"k${i % 11}", i))

  private def src(n: Int): Slice = {
    import spark.implicits._
    Sources.const(spark, n, data)
  }

  /** Assert `op` yields the same row set at every shard count. */
  private def stable(op: Slice => Slice): Unit = {
    val results = shardCounts.map { n =>
      n -> op(src(n)).df.collect().toSet.map((r: Row) => r.toSeq)
    }
    val (n0, expect) = results.head
    for ((n, got) <- results.tail)
      assert(got == expect, s"shards=$n differs from shards=$n0")
    assert(expect.nonEmpty)
  }

  test("matrix: map → filter → flatMap chain") {
    import spark.implicits._
    stable(_.map[(String, Int), (String, Int)] { case (k, v) => (k, v * 2) }
      .filterF[(String, Int)](_._2 % 3 != 0)
      .flatMap[(String, Int), (String, Int)] { case (k, v) => Seq((k, v), (k, -v)) })
  }

  test("matrix: reduce (declarative), reduceF (typed), fold") {
    import spark.implicits._
    stable(_.reduce(sum(col("_2")).cast("long").as("s"),
      count(lit(1)).as("n")))
    stable(_.reduceF[String, Int](math.max))
    stable(_.fold[String, Int, Long](7L)((acc, v) => acc + v))
  }

  test("matrix: cogroup group contents (order-normalized)") {
    import spark.implicits._
    // collect_list order is partitioning-dependent by design (the
    // reference also promises no order, cogroup.go:244-258): compare
    // sorted group contents.
    stable { s =>
      val other = Sources.const(spark, 2,
        Seq(("k1", "x"), ("k1", "y"), ("k3", "z"), ("kZ", "w")))
      s.cogroup(other)
        .select(col("_1"), sort_array(col("g0")).as("g0"),
          sort_array(col("g1")).as("g1"))
    }
  }

  test("matrix: join kinds against a fixed right side") {
    import spark.implicits._
    for (kind <- Seq("inner", "left", "left_semi", "left_anti"))
      stable { s =>
        val dim = Sources.const(spark, 2,
          Seq(("k1", "a"), ("k2", "b"), ("kZ", "c")))
        s.join(dim, kind)
      }
  }

  test("matrix: reshuffle / reshard / rangePartition preserve content") {
    stable(_.reshuffle())
    stable(_.reshard(5))
    stable(_.rangePartition(4))
  }

  test("matrix: prefixed multi-column reduce") {
    import spark.implicits._
    stable { s =>
      Slice(s.df.withColumn("p", col("_2") % 2), 1)
        .select(col("_1"), col("p"), col("_2"))
        .prefixed(2)
        .reduce(sum(col("_2")).cast("long").as("s"))
    }
  }

  test("matrix: distinct / union / head(all) / writerFunc passthrough") {
    import spark.implicits._
    stable(_.distinct())
    stable(s => s.union(s))
    // head(n) with n >= any shard size degenerates to identity at every
    // shard count (per-shard semantics are otherwise count-dependent BY
    // CONTRACT — slice.go:957-994)
    stable(_.head(1000))
    stable(_.writerFunc((_, it) => it))
  }

  test("matrix: scan consumes every row exactly once at any shard count") {
    for (n <- shardCounts) {
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      MatrixProbe.total.set(0)
      src(n).scan { (_, it) => MatrixProbe.total.addAndGet(it.size.toLong); () }
      seen.set(MatrixProbe.total.get)
      assert(seen.get == data.size.toLong, s"shards=$n consumed ${seen.get}")
    }
  }
}

object MatrixProbe {
  val total = new java.util.concurrent.atomic.AtomicLong(0)
}
