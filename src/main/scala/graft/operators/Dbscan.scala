package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed DBSCAN over a point table `(id: long, features: array<float>)`
  * — the full capability of the reference engine
  * (PDSDBSCAN-D, `mpi_main.cpp:47-197`), as a declarative Spark pipeline:
  *
  *   ε self-join (EpsilonJoin)           ≈ geometric partition + halo + kd-tree
  *   groupBy(id).count ≥ minPts          ≈ core-point test (dbscan.cpp:720-743)
  *   connected components on core edges  ≈ union-find merge (dbscan.cpp:744-1038)
  *   border attach + dense labels        ≈ get_clusters_distributed (dbscan.cpp:125-506)
  *
  * Semantics preserved from the reference:
  *  - neighbor count INCLUDES the point itself and the core test is `>=`
  *    (`dbscan.cpp:739`, self returned at distance 0 by the radius query);
  *  - noise cluster id is 0 (`dbscan.cpp:399`); real ids are dense
  *    positive ints;
  *  - border points (non-core within ε of a core) join a neighboring
  *    core's cluster. The reference attaches them to the FIRST claiming
  *    cluster — order-dependent (`dbscan.cpp:760-761`); we canonicalize to
  *    the minimum component id among core neighbors, making output
  *    deterministic and partition-count invariant.
  *
  * Everything below is shuffles + hash aggregates + the CC loop: no
  * driver-side point data, no collect — scales with cluster size.
  */
object Dbscan {

  /** Per-point ε-neighbor count (self included) — SURVEY §2.7 Q3. */
  def neighborCounts(points: DataFrame, idCol: String, vecCol: String,
      eps: Double, bucketDims: Seq[Int]): DataFrame = {
    val pairs = EpsilonJoin.selfJoin(points, idCol, vecCol, eps, bucketDims)
    val counts = pairs.groupBy(col("a_id").as(idCol)).count()
    // left join back: points with zero neighbors still count themselves
    points.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("count"), lit(0L)) + lit(1L)).as("n_neighbors"))
  }

  /** Full DBSCAN labels: (`id`, `cluster_id`), noise = 0, ids dense from 1
    * ordered by the component's minimum point id.
    *
    * @param minClusterSize a "cluster" must have at least this many member
    *   points (cores + attached borders); smaller components are relabeled
    *   noise. The reference requires ≥ 2 (`child_count > 1`,
    *   `dbscan.cpp:347-352`, `:395`) — a core whose every neighbor was
    *   claimed by other clusters does NOT form a cluster of its own. */
  def run(points: DataFrame, idCol: String, vecCol: String,
      eps: Double, minPts: Int, bucketDims: Seq[Int],
      minClusterSize: Int = 2): DataFrame = {
    // the point table is scanned by both join sides and the final label
    // join — cache it once (no-op if the caller already persisted it)
    val pts = points.persist()
    val pairs = EpsilonJoin
      .selfJoin(pts, idCol, vecCol, eps, bucketDims)
      .select(col("a_id"), col("b_id"))
      .persist()

    // core test: |N_eps(p)| >= minPts, self included (dbscan.cpp:739)
    val cores = pairs.groupBy("a_id").agg(count(lit(1)).as("n"))
      .filter(col("n") + lit(1L) >= lit(minPts.toLong))
      .select(col("a_id").as("id"))
      .persist()

    // core-core edges (+ self loops so isolated cores form singletons)
    val coreEdges = pairs
      .join(cores.withColumnRenamed("id", "a_id"), "a_id")
      .join(cores.withColumnRenamed("id", "b_id"), "b_id")
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(cores.select(col("id").as("src"), col("id").as("dst")))

    val coreComp = ConnectedComponents.run(coreEdges) // (id, comp)

    // border points: non-core, within eps of >=1 core -> min core comp
    val borderComp = pairs
      .join(cores.withColumnRenamed("id", "b_id"), "b_id") // b is core
      .join(cores.withColumnRenamed("id", "a_id"), Seq("a_id"), "left_anti") // a is not
      .join(coreComp.withColumnRenamed("id", "b_id"), "b_id")
      .groupBy(col("a_id").as("id"))
      .agg(min("comp").as("comp"))

    // (id, comp) for clustered points — consumed by BOTH the dense-id
    // distinct agg and the final label join: persist to compute once
    val labeled = coreComp.union(borderComp).persist()

    // dense cluster ids 1..K ordered by comp (tiny distinct set -> window
    // over the distinct comps only, then broadcast back); components below
    // minClusterSize are dropped -> their points fall back to noise
    val compIds = labeled.groupBy("comp").agg(count(lit(1)).as("csz"))
      .filter(col("csz") >= minClusterSize)
      .select("comp")
      .withColumn("cluster_id",
        row_number().over(Window.orderBy("comp")).cast("int"))
    val withIds = labeled.join(broadcast(compIds), "comp")
      .select(col("id"), col("cluster_id"))

    // Lazy result: the caller's first action executes one unified DAG over
    // the cached intermediates (pairs/cores/pts stay persisted — Spark's
    // ContextCleaner unpersists them once the label plan is unreachable).
    // Callers that iterate over the labels repeatedly should persist().
    pts.select(col(idCol).as("id"))
      .join(withIds, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), lit(0)).as("cluster_id")) // noise = 0
  }

  /** Cluster statistics — the reference's end-of-run report
    * (`dbscan.cpp:344-367`): points in clusters, noise, total, #clusters. */
  def stats(labels: DataFrame): DataFrame =
    labels.agg(
      sum(when(col("cluster_id") =!= 0, 1L).otherwise(0L)).as("points_in_clusters"),
      sum(when(col("cluster_id") === 0, 1L).otherwise(0L)).as("noise"),
      count(lit(1)).as("total_points"),
      max(col("cluster_id")).cast("long").as("n_clusters"))
}
