package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared undirected-edge normalization for the graph operators
  * ([[KCore]], [[GraphStats]]) — one definition of "the same graph":
  * canonical (a < b) deduplicated loop-free pairs, and the symmetrized
  * two-orientation view that degree aggregates run on. NOTE
  * `least`/`greatest` skip NULLs, so an edge with one NULL endpoint
  * degenerates to a self-loop (a = b) and is dropped — the desired
  * semantics for dirty edge lists, encoded here exactly once.
  */
object GraphEdges {

  /** (a, b) with a < b, duplicates and self-loops dropped. */
  def canonical(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val a = col(srcCol).cast("long"); val b = col(dstCol).cast("long")
    edges
      .select(least(a, b).as("a"), greatest(a, b).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Both orientations of a [[canonical]] edge set, as (src, dst) —
    * degree = a plain `groupBy(src).count` afterwards. The explode of a
    * 2-element array (not a union) evaluates the input subtree once. */
  def symmetrize(canon: DataFrame): DataFrame =
    canon
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
}
