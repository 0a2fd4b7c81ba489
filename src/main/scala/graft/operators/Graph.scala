package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph analytics over the duplicate-pair graph (or any
 * undirected edge list) — the analysis layer on top of the dedup
 * operators: [[Dedup.connectedComponents]] finds the clusters, these
 * find their STRUCTURE. Triangle density separates true duplicate
 * cliques (mirrors, reposts — mutually similar) from hub-shaped false
 * clusters (boilerplate pulling unrelated docs together — star graphs
 * with no triangles); PageRank ranks documents by how centrally they
 * sit in the duplication web, a useful canonical-pick signal beyond
 * min-id.
 *
 * Everything is exact integer/count arithmetic so both operators carry
 * full DuckDB oracles.
 */
object Graph {

  /**
   * Exact triangle enumeration over an undirected edge list given in
   * canonical (a < b) form. Degree-oriented wedge join — each edge is
   * directed from its lower (degree, id) endpoint, so wedges are
   * generated at their minimum-degree apex: a hot vertex of degree d
   * only pays d² wedge rows when BOTH partners out-rank it, which
   * bounds the classic "curse of the last reducer" skew (Suri &
   * Vassilvitskii, WWW'11). The closing edge is verified against the
   * canonical edge set by equi-join — three joins, zero nested loops.
   *
   * Output: one row per triangle, vertices sorted ascending
   * (ta < tb < tc) — orientation changes the generation site, never
   * the triangle set, which is what the id-ordered oracle recomputes.
   */
  def triangles(pairs: DataFrame, a: String = "a", b: String = "b"): DataFrame = {
    val canon = pairs.select(col(a).as("u"), col(b).as("v")).distinct()
    val deg = canon.select(col("u").as("x"))
      .union(canon.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // direct each edge low-(degree,id) → high-(degree,id)
    val du = deg.select(col("x").as("u"), col("d").as("du"))
    val dv = deg.select(col("x").as("v"), col("d").as("dv"))
    val oriented = canon.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    val e1 = oriented.select(col("src"), col("dst").as("y"))
    val e2 = oriented.select(col("src"), col("dst").as("z"))
    val wedges = e1.join(e2, "src").filter(col("y") < col("z"))
    val closed = wedges.join(canon,
      least(col("y"), col("z")) === col("u") &&
        greatest(col("y"), col("z")) === col("v"))
    closed.select(
      array_sort(array(col("src"), col("y"), col("z"))).as("t"))
      .select(col("t").getItem(0).as("ta"), col("t").getItem(1).as("tb"),
        col("t").getItem(2).as("tc"))
  }

  /**
   * Fixed-iteration PageRank in pure 64-bit INTEGER arithmetic over an
   * undirected edge list — cross-engine exact, so the ranking itself
   * is oracled (float PageRank can never be: summation order changes
   * ulps). Quantization contract, applied identically per iteration:
   *   contrib(u)   = pr(u) DIV deg(u)                (floor division)
   *   pr'(v)       = (15·scale) DIV 100
   *                + (85 · Σ_{(u,v)∈E} contrib(u)) DIV 100
   * All values non-negative, so Spark's truncating DIV and DuckDB's
   * flooring `//` agree everywhere.
   *
   * Scale shape: one broadcast-sized degree table, then per iteration
   * ONE join (edges ⋈ ranks, shuffle on vertex id) + one partial/final
   * sum — the canonical Pregel-without-Pregel loop. `localCheckpoint`
   * truncates lineage so plan size stays O(1) in iterations. Skew: a
   * celebrity vertex concentrates its IN-edges on one reducer; the
   * partial aggregation combines contributions map-side, so the
   * reducer receives one partial per upstream partition, not one row
   * per edge.
   */
  def pageRankInt(pairs: DataFrame, a: String = "a", b: String = "b",
                  iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    val e = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct().persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val withDeg = e.join(deg, "src").persist()
    val vertices = e.select(col("src").as("doc_id")).distinct()
    val base = (15L * scale) / 100L
    var pr = vertices.withColumn("pr", lit(scale)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = withDeg
        .join(pr, withDeg("src") === pr("doc_id"))
        .select(col("dst"), expr("pr DIV d").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      pr = vertices.join(contrib, vertices("doc_id") === contrib("dst"), "left")
        .select(col("doc_id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("pr"))
        .localCheckpoint()
    }
    e.unpersist(); withDeg.unpersist()
    pr
  }
}
