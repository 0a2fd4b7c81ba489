package graft

import graft.operators.{Dedup, Graph, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-8 widening: graph analytics over the dup graph (triangles,
 * integer PageRank), containment pairs, Bloom-prefiltered
 * decontamination, integer random projection. Each test pins the
 * exactness contract against an independent formulation.
 */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  import scala.jdk.CollectionConverters._

  private def edgeDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  test("triangles: degree-oriented join == brute-force triple enumeration") {
    // K4 (4 triangles) + a star (0 triangles) + a 5-chain (0) + one
    // extra triangle sharing a vertex with the star hub
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // K4
      (10, 11), (10, 12), (10, 13), (10, 14), // star at 10
      (20, 21), (21, 22), (22, 23), (23, 24), // chain
      (10, 30), (10, 31), (30, 31)) // triangle at the hub
    val got = Graph.triangles(edgeDf(edges))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the vertex set
    val es = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val vs = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = (for {
      i <- vs; j <- vs if i < j; k <- vs if j < k
      if es((i, j)) && es((j, k)) && es((i, k))
    } yield (i, j, k)).toSet
    assert(want.size == 5, s"fixture should have 5 triangles, got ${want.size}")
    assert(got == want)
  }

  test("pageRankInt: mass concentrates on the hub; ranks are partitioning-independent") {
    val star = Seq[(Long, Long)]((1, 2), (1, 3), (1, 4), (1, 5), (2, 3))
    val pr = Graph.pageRankInt(edgeDf(star), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // hub out-ranks every leaf, leaves 4 and 5 tie by symmetry
    assert(pr(1L) > pr(2L) && pr(1L) > pr(4L))
    assert(pr(4L) == pr(5L))
    // 2 and 3 (extra edge between them) tie and out-rank 4/5
    assert(pr(2L) == pr(3L) && pr(2L) > pr(4L))
    // partitioning independence: same result at a different shuffle width
    val pr1 = Graph.pageRankInt(edgeDf(star).repartition(1), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr1 == pr)
  }

  test("containmentPairs: asymmetric — excerpt found in host, not vice versa") {
    import spark.implicits._
    val host = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (11 to 20).map(i => s"w$i").mkString(" ") // 10 tokens of host
    val docs = Seq((1L, host), (2L, excerpt), (3L, "completely different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", k = 3, minC = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // excerpt has 8 trigram shingles, all present in host → C(2→1)=1.0;
    // host has 38 shingles, 8 shared → C(1→2)=8/38 < 0.9
    assert(got.toSeq == Seq((2L, 1L, 1.0)))
  }

  test("contaminatedBloom == contaminated (Bloom only over-keeps, verify restores)") {
    val d = Tables.load(spark, sf, "documents")
    val probeIds = d.select("doc_id").limit(20)
    val probes = d.join(probeIds, Seq("doc_id"))
    val corpus = d.join(probeIds, Seq("doc_id"), "left_anti")
    val a = Dedup.contaminated(corpus, probes, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.contaminatedBloom(corpus, probes, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.nonEmpty, "fixture should have contamination")
    assert(a == b)
  }

  test("randomProject: matches per-element driver recomputation; partitioning-independent") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50).cache()
    val got = Similarity.randomProject(emb, "vec_id", "embedding", 64, dOut = 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toVector).toMap
    // independent driver-side recomputation from the raw floats
    val raw = emb.collect().map { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).toArray
      r.getLong(r.fieldIndex("vec_id")) -> v
    }
    val want = raw.map { case (id, v) =>
      val mx = v.map(x => math.abs(x.toDouble)).max
      val scale = if (mx > 0) mx / 127.0 else 1.0
      val q = v.map(x => math.floor(x.toDouble / scale + 0.5).toLong)
      id -> (0 until 16).map { j =>
        (0 until 64).map(i => q(i) * Similarity.projSign(i, j)).sum
      }.toVector
    }.toMap
    assert(got == want)
    assert(got.values.exists(_.exists(_ != 0L)))
  }
}
