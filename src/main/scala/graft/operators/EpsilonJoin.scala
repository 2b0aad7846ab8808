package graft.operators

import graft.functions.{VectorExpressions, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-radius spatial self-join: all ordered pairs (a, b), a ≠ b, with
  * ‖a − b‖² ≤ ε². This is the reference's central relational operation —
  * kd-tree radius query per point (`kdtree2.cpp:382-401`, `:606-665`)
  * plus the ε-halo ghost exchange (`geometric_partitioning.cpp:32-235`)
  * — re-expressed as one declarative grid-bucketed equi-join that
  * Catalyst plans as a shuffled hash/sort-merge join.
  *
  * Scheme (the classic cell-replication trick, half-space variant):
  *  - every point gets a home cell = `floor(coord/ε)` over k bucketed dims;
  *  - same-cell pairs come from a plain equi-join with `a_id < b_id`;
  *    cross-cell pairs replicate probes along the POSITIVE offset
  *    half-space only — each undirected pair is produced and
  *    distance-checked exactly once, then both orientations are emitted
  *    by a narrow union;
  *  - an exact codegen'd distance filter decides membership.
  *
  * Scale notes (100 TB):
  *  - k is capped (default ≤ 3) so probe-side replication is ≤ 14×; dims
  *    are chosen by spread/ε so the grid actually prunes (a dim whose range
  *    spans < minCellsPerDim cells adds replication without pruning and is
  *    skipped — in the degenerate case k = 0 this becomes an explicit
  *    cross join, correct but only acceptable for small inputs).
  *  - the join is a pure equi-join on `array<long>` cell keys: partition
  *    pruning by cell adjacency is by construction (the reference's
  *    box-overlap pruning, `geometric_partitioning.cpp:92-114`, for free);
  *  - AQE handles skewed (dense) cells; for pathological skew add salting
  *    on the build side within a cell.
  */
object EpsilonJoin {

  /** Pick bucket dims by spread: dims whose data range covers at least
    * `minCellsPerDim` ε-cells, widest first, at most `maxDims` (mirrors the
    * reference's widest-dimension split heuristic,
    * `geometric_partitioning.cpp:430-437`). One aggregate pass. */
  def pickBucketDims(points: DataFrame, vecCol: String, eps: Double,
      maxDims: Int = 3, minCellsPerDim: Int = 4,
      knownDim: Int = -1): Seq[Int] = {
    // knownDim skips the one-row probe job when the caller already knows
    // the dimensionality (e.g. from the binary file header)
    val dim =
      if (knownDim > 0) knownDim
      else graft.functions.VectorOps.probeDim(points, vecCol).getOrElse(0)
    if (dim == 0) return Nil // empty input: no dims to pick, k=0 is fine
    val aggs = (0 until dim).flatMap { d =>
      val c = element_at(col(vecCol), d + 1).cast("double")
      Seq(min(c).as(s"mn$d"), max(c).as(s"mx$d"))
    }
    val row = ConnectedComponents.withJobDesc(points, "pickBucketDims: ranges") {
      points.agg(aggs.head, aggs.tail: _*).first()
    }
    if (row.isNullAt(0)) return Nil // knownDim set but zero rows
    val ranges = (0 until dim).map(d =>
      d -> (row.getDouble(2 * d + 1) - row.getDouble(2 * d)))
    ranges
      .filter { case (_, r) => r / eps >= minCellsPerDim }
      .sortBy { case (d, r) => (-r, d) }
      .take(maxDims)
      .map(_._1)
  }

  /** All 3^k neighbor-cell offsets (including the zero offset). */
  private[graft] def offsets(k: Int): Seq[Seq[Int]] =
    (0 until k).foldLeft(Seq(Seq.empty[Int])) { (acc, _) =>
      for (o <- acc; d <- -1 to 1) yield o :+ d
    }

  /** The "positive half" of the non-zero offsets: first non-zero component
    * is +1. For any two DISTINCT adjacent cells exactly one of (c_b−c_a,
    * c_a−c_b) is positive — so replicating probes along positive offsets
    * only finds each cross-cell pair exactly once (and halves the join
    * work vs full 3^k replication). */
  private[graft] def positiveOffsets(k: Int): Seq[Seq[Int]] =
    offsets(k).filter(o => o.dropWhile(_ == 0).headOption.contains(1))

  /** Ordered neighbor pairs `(a_id, b_id, d2)` with d2 ≤ ε², a ≠ b.
    * Each ordered pair appears exactly once.
    *
    * @param saltBuckets skew guard: when > 1, the build side of every cell
    *   is split into this many salt shards (build row → one shard by id
    *   hash; probe row → replicated to all shards), so one ultra-dense
    *   ε-cell fans out across `saltBuckets` reducers instead of pinning a
    *   single task. Complements AQE skew-join (which can only split
    *   post-shuffle files, not a single giant hash group). Default 1 —
    *   salting costs probe×saltBuckets replication, pay only on skew. */
  def selfJoin(points: DataFrame, idCol: String, vecCol: String,
      eps: Double, bucketDims: Seq[Int], saltBuckets: Int = 1): DataFrame = {
    val k = bucketDims.size
    val cell: Column => Column = VectorOps.cellId(_, eps, bucketDims)

    val build0 = points.select(
      col(idCol).as("b_id"), col(vecCol).as("b_v"),
      cell(col(vecCol)).as("cell"))
    val build =
      if (saltBuckets <= 1) build0.withColumn("salt", lit(0))
      else build0.withColumn("salt",
        pmod(xxhash64(col("b_id")), lit(saltBuckets.toLong)).cast("int"))

    val home0 = points.select(
      col(idCol).as("a_id"), col(vecCol).as("a_v"),
      cell(col(vecCol)).as("home"))
    // Brute-force path (k = 0): the cell key is one constant, so the
    // planner degenerates to a broadcast nested-loop join whose
    // parallelism is the STREAMED side's partition count — a small
    // single-file input would run the whole O(n²) distance scan on one
    // core. Redistribute the probe side first: the shuffle is linear and
    // negligible next to the quadratic scan it parallelizes.
    val home = if (k == 0) home0.repartition(col("a_id")) else home0
    def salted(df: DataFrame): DataFrame =
      if (saltBuckets <= 1) df.withColumn("salt", lit(0))
      else df.withColumn("salt",
        explode(typedlit((0 until saltBuckets).toList)))

    // Each UNDIRECTED pair is produced exactly once:
    //  - same cell: equi-join on the home cell, a_id < b_id;
    //  - adjacent cells: probes replicated along the positive offset
    //    half-space only (cells differ ⇒ a ≠ b, no id filter needed).
    // This halves both replication (1 + (3^k−1)/2 probe rows) and distance
    // evaluations vs full 3^k replication; both orientations are emitted
    // at the end by a narrow projection union.
    val sameCell = salted(home.select(col("a_id"), col("a_v"),
        col("home").as("cell")))
      .join(build, Seq("cell", "salt"))
      .filter(col("a_id") < col("b_id"))
    val crossCell =
      if (k == 0) sameCell.limit(0)
      else salted(home
        .withColumn("off", explode(typedlit(positiveOffsets(k))))
        .select(col("a_id"), col("a_v"),
          zip_with(col("home"), col("off"), (h, o) => h + o.cast("long"))
            .as("cell")))
        .join(build, Seq("cell", "salt"))

    // membership first with the early-exit predicate (most candidates are
    // far — the fold exits in O(1) dims), then the full d2 fold only for
    // the surviving pairs; both fold left-to-right in double, so the
    // emitted d2 and the predicate agree exactly with squaredL2 <= ε²
    val undirected = sameCell.union(crossCell)
      .filter(VectorExpressions.withinEps(col("a_v"), col("b_v"), eps * eps))
      .select(col("a_id"), col("b_id"),
        VectorExpressions.squaredL2(col("a_v"), col("b_v")).as("d2"))
    // both orientations in ONE pass (a union of the subtree with its own
    // projection would re-execute the join twice)
    undirected.select(explode(array(
        struct(col("a_id"), col("b_id"), col("d2")),
        struct(col("b_id").as("a_id"), col("a_id").as("b_id"), col("d2"))))
      .as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        col("p.d2").as("d2"))
  }

  /** selfJoin with automatic bucket-dim selection. */
  def selfJoinAuto(points: DataFrame, idCol: String, vecCol: String,
      eps: Double, maxDims: Int = 3): DataFrame =
    selfJoin(points, idCol, vecCol, eps,
      pickBucketDims(points, vecCol, eps, maxDims))

  /** Bipartite ε-join: all pairs (a ∈ left, b ∈ right) with
    * ‖a − b‖² ≤ ε², BOTH orientations emitted — the delta query of
    * [[IncrementalDbscan]] (new batch × standing corpus) and the
    * general "probe a point set against an indexed corpus" shape.
    * The two tables must have disjoint id sets (an id present in both
    * would emit its self-pair — callers own that invariant).
    *
    * Scale shape: the LEFT (probe/delta) side replicates across the
    * full 3^k neighbor-cell offsets and equi-joins the right side's
    * home cells — each unordered pair meets exactly once, no dedup
    * shuffle. Put the smaller batch on the left: replication cost is
    * 3^k·|left|, the right side never copies. k = 0 degenerates to a
    * nested-loop scan (repartitioned so it parallelizes). */
  def join(left: DataFrame, right: DataFrame, idCol: String,
      vecCol: String, eps: Double, bucketDims: Seq[Int]): DataFrame = {
    val k = bucketDims.size
    val cell: Column => Column = VectorOps.cellId(_, eps, bucketDims)
    val build = right.select(
      col(idCol).as("b_id"), col(vecCol).as("b_v"),
      cell(col(vecCol)).as("cell"))
    val probe0 = left.select(
      col(idCol).as("a_id"), col(vecCol).as("a_v"),
      cell(col(vecCol)).as("home"))
    val probe =
      if (k == 0) probe0.repartition(col("a_id"))
        .withColumn("cell", col("home"))
      else probe0
        .withColumn("off", explode(typedlit(offsets(k))))
        .withColumn("cell",
          zip_with(col("home"), col("off"), (h, o) => h + o.cast("long")))
    val undirected = probe.join(build, Seq("cell"))
      .filter(VectorExpressions.withinEps(col("a_v"), col("b_v"), eps * eps))
      .select(col("a_id"), col("b_id"),
        VectorExpressions.squaredL2(col("a_v"), col("b_v")).as("d2"))
    undirected.select(explode(array(
        struct(col("a_id"), col("b_id"), col("d2")),
        struct(col("b_id").as("a_id"), col("a_id").as("b_id"), col("d2"))))
      .as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        col("p.d2").as("d2"))
  }
}
