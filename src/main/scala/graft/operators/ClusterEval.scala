package graft.operators

import graft.functions.{TopKByScore, VectorExpressions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-quality evaluation — the report the reference's workflow
  * produces BY HAND: its progress logs compare cluster counts / in-cluster
  * vs noise mass across runs and ranks (`Progress-5-Nov-19.txt:9-52`,
  * `manyTests.py:264-266` parses them per run) and its ε/minPts choices
  * per dataset are a manually tuned table (`manyTests.py:29-55`). These
  * operators make that evaluation loop first-class:
  *
  *   - [[simplifiedSilhouette]] — per-cluster cohesion/separation score
  *     of a k-means model (centroid-based simplified silhouette: one
  *     literal-projection pass, no pairwise distances);
  *   - [[adjustedRandIndex]] — agreement between two labelings (e.g.
  *     recovered clusters vs planted labels — exactly the "did the rank
  *     count change the answer" drift question in the reference's logs),
  *     pure integer pair-counting off the contingency table;
  *   - [[kDistProfile]] — the sorted k-dist curve of Ester et al.'s
  *     DBSCAN paper (§4.2, the 4-dist heuristic the reference's manual
  *     eps table stands in for), reduced to an equi-depth decile profile.
  *
  * Scale shape: silhouette is a projection + one hash aggregate (the
  * centroid table inlines as literals, the k-means assignment pattern);
  * ARI shuffles only the tiny contingency table; the k-dist curve uses
  * the bounded-heap k-NN aggregate (k-sized buffers cross the wire) and
  * the zipWithIndex global-rank pattern — never a single-task window.
  */
object ClusterEval {

  /** Simplified (centroid-based) silhouette per cluster of a k-means
    * fit: for each point, a = distance to its own (nearest) centroid,
    * b = distance to the second-nearest, s = (b − a) / max(a, b) =
    * 1 − a/b ∈ [0, 1] (0 when b = 0: duplicate centroids). Scores
    * quantize once (`round(s·1e9)` — exact longs) so the per-cluster
    * mean is an order-free integer sum with one closing division.
    *
    * @return (cluster, n_pts, mean_sil) — one row per non-empty
    *         cluster of the final assignment. */
  def simplifiedSilhouette(points: DataFrame, idCol: String,
      vecCol: String, k: Int, rounds: Int,
      quant: Double = 1e6): DataFrame = {
    val (pts, cents) = KMeans.fitCentroids(points, idCol, vecCol, k,
      rounds, quant)
    require(cents.length >= 2,
      "silhouette needs >= 2 surviving centroids")
    val structs = cents.toSeq.map { case (cid, cv) =>
      struct(
        VectorExpressions.squaredL2(col("qv"), typedlit(cv.toSeq))
          .as("d2"),
        lit(cid).as("cid"))
    }
    // ascending (d2, cid) — the assignExpr/ORDER BY total order; [0]
    // is the assigned centroid, [1] the runner-up
    val ranked = array_sort(array(structs: _*))
    pts
      .select(
        ranked.getItem(0).getField("cid").as("cluster"),
        ranked.getItem(0).getField("d2").as("ad2"),
        ranked.getItem(1).getField("d2").as("bd2"))
      .select(col("cluster"),
        when(col("bd2") > 0d,
          (sqrt(col("bd2")) - sqrt(col("ad2"))) / sqrt(col("bd2")))
          .otherwise(0d).as("s"))
      .select(col("cluster"),
        round(col("s") * 1e9).cast("long").as("sq"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_pts"), sum(col("sq")).as("ssq"))
      .select(col("cluster"), col("n_pts"),
        (col("ssq").cast("double") / col("n_pts").cast("double")
          / lit(1e9)).as("mean_sil"))
  }

  /** Within-cluster sum of squared distances (inertia) per cluster of
    * a k-means fit — the elbow-method readout beside
    * [[simplifiedSilhouette]]'s cohesion/separation score: re-fit with
    * varying k and watch where the SSE curve bends. Same plan shape as
    * the silhouette (literal-centroid projection + ONE hash
    * aggregate); per-point d² quantizes to micro-units of the original
    * scale (`round(d2/quant²·1e6)` longs) so the per-cluster sum is an
    * order-free exact integer with one closing division.
    *
    * @return (cluster, n_pts, sse) — SSE in original squared units. */
  def inertia(points: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int, quant: Double = 1e6): DataFrame = {
    val (pts, cents) = KMeans.fitCentroids(points, idCol, vecCol, k,
      rounds, quant)
    val structs = cents.toSeq.map { case (cid, cv) =>
      struct(
        VectorExpressions.squaredL2(col("qv"), typedlit(cv.toSeq))
          .as("d2"),
        lit(cid).as("cid"))
    }
    // same (d2, cid) total order as the assignment/silhouette; [0] is
    // the assigned centroid and its d² IS the point's SSE contribution
    val ranked = array_sort(array(structs: _*))
    // d2 is in quant-scaled units (quant² per squared unit); one
    // division to micro-units, then round — identical text in the twin
    val micro = quant * quant / 1e6
    pts
      .select(
        ranked.getItem(0).getField("cid").as("cluster"),
        round(ranked.getItem(0).getField("d2") / lit(micro))
          .cast("long").as("qd2"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_pts"), sum(col("qd2")).as("sq"))
      .select(col("cluster"), col("n_pts"),
        (col("sq").cast("double") / lit(1e6)).as("sse"))
  }

  /** Adjusted Rand Index between two labelings of the same ids —
    * Hubert & Arabie's chance-corrected pair-counting agreement.
    * Everything up to the final ratio is exact BIGINT combinatorics on
    * the contingency table, carried ×2-scaled (Σ x(x−1) = twice the
    * pair count — no /2 ever divides an odd integer): with
    * T = n(n−1), Sij = Σ nij(nij−1), Sa = Σ ai(ai−1), Sb = Σ bj(bj−1),
    * ARI = 2·(T·Sij − Sa·Sb) / (T·(Sa+Sb) − 2·Sa·Sb) — the scale
    * factors cancel, one closing double division. NULL when the
    * denominator is 0 (both labelings trivial — all singletons or one
    * cluster — where ARI is undefined).
    *
    * Bound: T·Sij ≤ n⁴, so exact longs hold to n ≈ 5·10⁴ ids; beyond
    * that cast the four terms to decimal(38,0) before the products
    * (the corrMatrix discipline — good to n ≈ 3·10⁹).
    *
    * @param a (id, label) left labeling; @param b (id, label) right.
    * @return one row: (n, k_a, k_b, ari). */
  def adjustedRandIndex(a: DataFrame, b: DataFrame): DataFrame = {
    // Σ x(x−1) over a grouped count column — exact long, ×2 a pair count
    def pairs2(c: org.apache.spark.sql.Column) = sum(c * (c - 1L))
    val ct = a.toDF("id", "ca").join(b.toDF("id", "cb"), "id")
      .groupBy(col("ca"), col("cb"))
      .agg(count(lit(1)).as("nij"))
      .persist() // three readers below; freed with the plan
    val sij = ct.agg(pairs2(col("nij")).as("sij"),
      sum(col("nij")).as("n"),
      countDistinct(col("ca")).as("k_a"),
      countDistinct(col("cb")).as("k_b"))
    val sa = ct.groupBy(col("ca")).agg(sum(col("nij")).as("ai"))
      .agg(pairs2(col("ai")).as("sa"))
    val sb = ct.groupBy(col("cb")).agg(sum(col("nij")).as("bj"))
      .agg(pairs2(col("bj")).as("sb"))
    sij.crossJoin(sa).crossJoin(sb)
      .select(col("n"), col("k_a"), col("k_b"),
        (col("n") * (col("n") - 1L)).as("t"),
        col("sij"), col("sa"), col("sb"))
      .select(col("n"), col("k_a"), col("k_b"),
        (lit(2L) * (col("t") * col("sij") - col("sa") * col("sb")))
          .as("num"),
        (col("t") * (col("sa") + col("sb"))
          - lit(2L) * col("sa") * col("sb")).as("den"))
      .select(col("n"), col("k_a"), col("k_b"),
        when(col("den") =!= 0L,
          col("num").cast("double") / col("den").cast("double"))
          .as("ari"))
  }

  /** Equi-depth profile of the k-dist curve (Ester et al. §4.2): each
    * point's distance to its k-th nearest neighbor, quantized to
    * micro-units (`round(sqrt(d2)·1e6)` BIGINT), globally ranked by
    * (distance, id) through [[GlobalIndex.rowNumbers]] (range-partition
    * + zipWithIndex — no single-task window), and folded into
    * `buckets` equal-population bands. Reading the profile bottom-up
    * is the paper's elbow heuristic for choosing ε.
    *
    * Exact k-NN here is the brute-force bounded-heap aggregate — the
    * oracle-able diagnostic; at corpus scale feed [[AnnSearch]]
    * candidates through the same reduction.
    *
    * @return (decile, n_pts, min_d_e6, max_d_e6), decile in 1..buckets. */
  def kDistProfile(points: DataFrame, idCol: String, vecCol: String,
      k: Int, buckets: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val d2 = VectorExpressions.squaredL2(col("a_v"), col("b_v"))
    val kth = points.select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
      .join(points.select(col(idCol).as("b_id"), col(vecCol).as("b_v")),
        col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), d2.as("d2"))
      .groupBy(col("a_id"))
      .agg(TopKByScore.topkMin(col("b_id"), col("d2"), k).as("topk"))
      // points with < k neighbors (n <= k) have no k-dist — drop them
      .filter(size(col("topk")) >= k)
      .select(col("a_id").as("id"),
        round(sqrt(col("topk").getItem(k - 1).getField("score")) * 1e6)
          .cast("long").as("qd"))
      // three consumers (zipWithIndex's count pass, the rank pass, and
      // the total-count scalar) — without this the O(n²) k-NN aggregate
      // re-executes per action; freed with the plan (ContextCleaner)
      .persist()
    val ranked = GlobalIndex.rowNumbers(kth, Seq("qd", "id"), "rk")
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      // both operands non-negative, so DIV == floor division — the
      // q149 pmod adjustment is not needed here
      .select(
        expr(s"CAST(((rk - 1) * $buckets) DIV n + 1 AS INT)")
          .as("decile"),
        col("qd"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pts"),
        min(col("qd")).as("min_d_e6"),
        max(col("qd")).as("max_d_e6"))
  }
}
