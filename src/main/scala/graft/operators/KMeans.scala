package graft.operators

import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd k-means as a first-class clustering operator — the
  * centroid-based complement of [[Dbscan]] (the reference's
  * density-based core, SURVEY §2.4): fixed rounds, deterministic
  * seeding, and EXACT cross-engine semantics, unlike
  * [[AnnSearch.centroidArrays]] whose float-avg centroids are
  * deliberately approximate (an ANN index only needs recall).
  *
  * Determinism contract (mirrored term-for-term by a SQL oracle):
  *   - coordinates quantize once: `vq = round(double(v) · quant)` —
  *     integral doubles, so every difference below is exact;
  *   - seeds: the k smallest ids' vectors, cid = 0-based id rank;
  *   - assignment: argmin of the fixed-order squared-L2 fold
  *     ([[VectorExpressions.squaredL2]] — both engines fold dims
  *     left-to-right, so d² is the identical IEEE double), ties on
  *     centroid id;
  *   - update: per-dim integer sum (exact longs) divided once —
  *     `CAST(sum AS DOUBLE)/cnt` is the identical double;
  *   - a centroid that loses every point drops out (k shrinks).
  *
  * Scale shape: per round ONE aggregate job — the assignment is a
  * pure literal-expression projection (centroids inline as
  * `struct(d2, cid)` literals, the IVF pattern; ≤ [[AnnSearch
  * .literalCentroidLimit]] centroids), fused into a (cid, dim)
  * partial+final hash aggregate. Points never shuffle by cluster;
  * only k·dims sum rows cross the wire. Centroids (k·dims doubles)
  * collect to the driver between rounds — always tiny. Integer-sum
  * exactness bounds corpus size: |Σ vq| per (cid, dim) must stay
  * below 2^53 (at quant=10⁶ and unit-scale features that is ~10⁹
  * rows per cluster — shard or coarsen `quant` beyond that).
  */
object KMeans {

  /** @param rounds assignment steps (rounds−1 Lloyd updates between
    *   them — the returned labels are the assignment that the last
    *   update saw, so oracle CTE unrolls end on an assignment).
    * @return (idCol, cluster) — cluster is the 0-based seed rank. */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int, quant: Double = 1e6): DataFrame = {
    val (pts, cents) = fitCentroids(points, idCol, vecCol, k, rounds, quant)
    pts.select(col("id").as(idCol), assignExpr(cents).as("cluster"))
  }

  /** The Lloyd loop behind [[fit]], exposed for consumers that need the
    * MODEL as well as the labels (e.g. [[ClusterEval
    * .simplifiedSilhouette]]'s per-centroid distances): returns the
    * persisted quantized point table `(id, qv)` (integral-double
    * coordinates — every distance off it is the exact cross-engine
    * fold) and the final centroids, i.e. the ones the last assignment
    * in [[fit]] sees (`c_{rounds-1}` in the oracle CTE chain). */
  def fitCentroids(points: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int,
      quant: Double = 1e6): (DataFrame, Array[(Int, Array[Double])]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(k <= AnnSearch.literalCentroidLimit,
      s"k beyond ${AnnSearch.literalCentroidLimit} needs the " +
        "broadcast-join assignment — not implemented here")
    val pts = points.select(col(idCol).as("id"),
      transform(col(vecCol), x =>
        round(x.cast("double") * quant)).as("qv"))
      .persist() // rounds+1 readers; released by ContextCleaner with
                 // the plan (the documented Dbscan.run lifecycle)
    var cents: Array[(Int, Array[Double])] = pts
      .orderBy(col("id")).limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    require(cents.nonEmpty, "empty input")
    for (_ <- 1 until rounds) {
      val sums = pts
        .select(assignExpr(cents).as("cid"),
          posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("v").cast("long")).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      cents = sums.groupBy(_.getInt(0)).toArray.sortBy(_._1)
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1))
            .map(r => r.getLong(2).toDouble / r.getLong(3)).toArray)
        }
    }
    (pts, cents)
  }

  /** `least(struct(d2, cid)…).cid` — argmin by (distance, centroid
    * id), the same total order as `ORDER BY d2, cid` in SQL. */
  private def assignExpr(cents: Array[(Int, Array[Double])]): Column = {
    val structs = cents.toSeq.map { case (cid, cv) =>
      struct(
        VectorExpressions.squaredL2(col("qv"), typedlit(cv.toSeq))
          .as("d2"),
        lit(cid).as("cid"))
    }
    val pick = if (structs.length == 1) structs.head
      else least(structs: _*)
    pick.getField("cid")
  }
}
