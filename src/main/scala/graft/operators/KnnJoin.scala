package graft.operators

import graft.functions.{TopKByScore, VectorExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbor joins over a point table — the reference's heap-based
  * n-nearest query capability (`kdtree2.cpp:504-601`, result heap
  * `kdtree2.cpp:45-65`; brute-force oracle declared `kdtree2.hpp:106-108`),
  * re-expressed as pair generation + a per-query top-k window.
  *
  * `selfKnn` is the exact brute-force baseline (IX-5): O(n²) candidate
  * pairs, then `row_number()` per query point. Deterministic tie-break:
  * (distance, neighbor id). At 100 TB brute force is only for oracle /
  * small query sets — the scale path is [[AnnSearch]] (LSH/IVF bucketed
  * candidates, same top-k window over far fewer pairs).
  */
object KnnJoin {

  /** Exact k-NN for every point against all others (self excluded).
    * @return (`idCol`, `nbr_id`, `rnk`) with rnk in 1..k ordered by
    *         squared L2 distance, ties by neighbor id. */
  def selfKnn(points: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val a = points.select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
    val b = points.select(col(idCol).as("b_id"), col(vecCol).as("b_v"))
    knn(a, b, k).select(col("a_id").as(idCol), col("nbr_id"), col("rnk"))
  }

  /** Exact k-NN of each query row against the full build side, via the
    * [[graft.functions.TopKByScore]] bounded-heap aggregate: a partial/
    * final hash agg where only k-sized buffers cross the shuffle — no
    * per-group sort of all candidates (see [[knnWindow]] for the sort
    * formulation it replaces).
    * Inputs must have columns (`a_id`, `a_v`) / (`b_id`, `b_v`). */
  def knn(queries: DataFrame, build: DataFrame, k: Int): DataFrame = {
    val d2 = VectorExpressions.squaredL2(col("a_v"), col("b_v"))
    queries.join(build, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), d2.as("d2"))
      .groupBy("a_id")
      .agg(TopKByScore.topkMin(col("b_id"), col("d2"), k).as("topk"))
      .select(col("a_id"), posexplode(col("topk")).as(Seq("pos", "p")))
      .select(col("a_id"), col("p.id").as("nbr_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Window/sort formulation of [[knn]] — kept as the cross-check oracle
    * (sorts every candidate per group; the aggregate path is the scale
    * one). */
  def knnWindow(queries: DataFrame, build: DataFrame, k: Int): DataFrame = {
    val d2 = VectorExpressions.squaredL2(col("a_v"), col("b_v"))
    queries.join(build, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), d2.as("d2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("a_id").orderBy(col("d2"), col("b_id"))).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("a_id"), col("b_id").as("nbr_id"), col("rnk"))
  }
}
