package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics over an edge list. First member:
  * degree assortativity — the Pearson correlation of endpoint degrees
  * over the symmetrized edge list (Newman's r): positive when hubs
  * attach to hubs, negative for hub-and-spoke topologies. A one-number
  * health check that a sampled or synthetic graph preserved its
  * degree-mixing structure.
  *
  * Plan shape: canonicalize + symmetrize once (cached — the degree
  * aggregate and both endpoint joins read the same edge set; without
  * the cache each reference re-executes the upstream edge derivation,
  * measured 3× on the co-purchase graph), one degree aggregate, two
  * hash joins keyed on the endpoints, then [[Stats.corrMatrix]]'s
  * decimal-exact single-pass moment aggregate. The cache releases via
  * ContextCleaner when the returned plan is collected (the documented
  * Dbscan.run lifecycle).
  */
object GraphStats {

  /** @param edges undirected edges, any orientation; duplicates and
    *   self-loops collapse/drop (KCore's canonical form).
    * @return one row (var_a='deg_a', var_b='deg_b', corr) */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = GraphEdges.symmetrize(
      GraphEdges.canonical(edges, srcCol, dstCol)).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val dPairs = e.join(deg, "src").withColumnRenamed("d", "da")
      .join(deg.select(col("src").as("dst"), col("d").as("db")), "dst")
    Stats.corrMatrix(dPairs, Seq("deg_a" -> col("da"), "deg_b" -> col("db")))
  }
}
