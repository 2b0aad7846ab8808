package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-node triangle counting — the third member of the graph family
  * (with [[ConnectedComponents]] and [[PageRank]]): clustering
  * coefficient numerators, community-structure signals, spam/bot
  * detection features.
  *
  * Degree-ordered enumeration (Schank–Wagner / "node-iterator++"):
  * every edge is oriented from its lower- to its higher-(degree, id)
  * endpoint, wedges are built only at each triangle's LOWEST-rank
  * vertex over its two higher-rank neighbors, and the closing edge is
  * probed in the same oriented set. Each triangle is found exactly
  * once, and — the scale point — wedge fan-out at a hub is bounded by
  * its ORIENTED out-degree (≈ O(√m) after orientation), not its raw
  * degree: a celebrity node with 10M neighbors contributes almost no
  * wedges because nearly all its edges orient toward it. Everything is
  * equi-joins + one aggregate; no theta join anywhere.
  */
object TriangleCount {

  /** (deg, id) lexicographic rank comparison — a total order because
    * ids are distinct. */
  private def rankLt(dA: Column, idA: Column, dB: Column, idB: Column) =
    dA < dB || (dA === dB && idA < idB)

  /** Per-node triangle participation counts.
    * @param edges undirected edge table; either or both orientations
    *   per edge accepted, self-loops and duplicates dropped.
    * @return (id, n_triangles) for every node incident to an edge —
    *   nodes in no triangle report 0. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    // canonical undirected edges u < v (drops self-loops + duplicates)
    val ce = edges.select(least(s, d).as("u"), greatest(s, d).as("v"))
      .filter(col("u") < col("v")).distinct()
    val deg = ce.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient lo→hi by (deg, id); carry the hi endpoint's rank for the
    // wedge ordering below. Persisted: three plan branches below (both
    // wedge sides + the closing-edge probe) reference this subtree, and
    // without the cache the orientation join tree executes three times
    // (cache released with the plan by the ContextCleaner, as in
    // Dbscan.run).
    val o = ce
      .join(deg.withColumnsRenamed(Map("id" -> "u", "deg" -> "du")), "u")
      .join(deg.withColumnsRenamed(Map("id" -> "v", "deg" -> "dv")), "v")
      .select(
        when(rankLt(col("du"), col("u"), col("dv"), col("v")),
          col("u")).otherwise(col("v")).as("lo"),
        when(rankLt(col("du"), col("u"), col("dv"), col("v")),
          col("v")).otherwise(col("u")).as("hi"),
        when(rankLt(col("du"), col("u"), col("dv"), col("v")),
          col("dv")).otherwise(col("du")).as("dhi"))
      .persist()
    // wedges at the lowest-rank vertex, neighbors ordered by rank; the
    // closing edge hi1→hi2 is oriented that way BECAUSE rank(hi1) <
    // rank(hi2) — one equi-join probe, no orientation guessing
    val e1 = o.select(col("lo"), col("hi").as("hi1"), col("dhi").as("d1"))
    val e2 = o.select(col("lo"), col("hi").as("hi2"), col("dhi").as("d2"))
    val tri = e1.join(e2, Seq("lo"))
      .filter(rankLt(col("d1"), col("hi1"), col("d2"), col("hi2")))
      .join(o.select(col("lo").as("hi1"), col("hi").as("hi2")),
        Seq("hi1", "hi2"))
      .select(col("lo"), col("hi1"), col("hi2"))
    val counts = tri
      .select(explode(array(col("lo"), col("hi1"), col("hi2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.select("id").join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
