package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Multi-source BFS hop labeling: the minimum hop count from any seed
  * node to every reachable node of a directed edge table. The "blast
  * radius" primitive behind reachability audits, influence frontiers,
  * and dependency-depth reports — and the third member of the engine's
  * iterate-to-fixpoint family (connected components, PageRank, this),
  * all reusing the reference's interleaved-merge execution shape
  * (`dbscan.cpp:847-1012`: rounds of exchange until a global "no new
  * information" test).
  *
  * Semantics: seeds are hop 0; `hops(v) = 1 + min over in-neighbors`;
  * unreachable nodes are absent from the output. `maxHops` bounds the
  * exploration depth — the result is exact for every node whose true
  * distance is ≤ maxHops (and the oracle can mirror the same bound).
  *
  * Scale shape (distributed path): classic frontier BFS — per round the
  * FRONTIER (not the full visited set) joins the edge table, newly
  * reached nodes come from one anti join against the visited set, and
  * `localCheckpoint` cuts the growing lineage. Edges are partitioned by
  * src once and cached; each round shuffles only frontier-sized data.
  * The driver's emptiness check on the new frontier is the fixpoint
  * test. Like [[PageRank.run]], a deduplicated edge set at or below
  * `localThreshold` takes a fused single-task path instead: CSR
  * adjacency + an int work-queue, zero per-round jobs. Both paths are
  * exact (integer hops — no float order issues), spec-enforced equal.
  */
object ShortestPath {

  private val outSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("hops", IntegerType, nullable = false)))

  /** @param edges directed edge table (traversed src → dst);
    *   duplicates are collapsed.
    * @param seeds one long id column; seeds absent from the edge table
    *   still appear in the output at hop 0.
    * @param localThreshold max deduplicated edge count for the fused
    *   single-task path; 0 forces the distributed loop.
    * @return (id, hops) for every node within maxHops of a seed. */
  def hops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int = 20,
      localThreshold: Long = 5_000_000L): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    val s = seeds.select(col(seedCol).cast("long").as("id")).distinct()
    val nEdges = e.count()
    if (nEdges <= localThreshold) runFused(e, s, maxHops)
    else runDistributed(e, s, maxHops)
  }

  /** Small-graph path: CSR + array-based BFS in ONE task. Seeds are
    * flagged in-band (edge rows with src = id, dst = MinValue sentinel
    * never collide with real edges, which were distinct-projected
    * first), so the single task sees both inputs without a join. */
  private def runFused(e: DataFrame, s: DataFrame,
      maxHops: Int): DataFrame = {
    val tagged = e.select(col("src"), col("dst"), lit(false).as("seed"))
      .unionAll(s.select(col("id").as("src"),
        lit(Long.MinValue).as("dst"), lit(true).as("seed")))
    tagged.coalesce(1).mapPartitions { it =>
      val sb = new scala.collection.mutable.ArrayBuilder.ofLong
      val db = new scala.collection.mutable.ArrayBuilder.ofLong
      val seedB = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        if (r.getBoolean(2)) seedB += r.getLong(0)
        else { sb += r.getLong(0); db += r.getLong(1) }
      }
      val srcId = sb.result(); val dstId = db.result()
      val seedId = seedB.result()
      val m = srcId.length
      // node table = edge endpoints ∪ seeds: sort + in-place dedup
      val all = new Array[Long](2 * m + seedId.length)
      System.arraycopy(srcId, 0, all, 0, m)
      System.arraycopy(dstId, 0, all, m, m)
      System.arraycopy(seedId, 0, all, 2 * m, seedId.length)
      java.util.Arrays.sort(all)
      var n = 0
      var i = 0
      while (i < all.length) {
        if (n == 0 || all(n - 1) != all(i)) { all(n) = all(i); n += 1 }
        i += 1
      }
      val ids = java.util.Arrays.copyOf(all, n)
      if (n == 0) Iterator.empty
      else {
        // CSR: counting sort of edges by src index
        val deg = new Array[Int](n)
        val srcIx = new Array[Int](m)
        val dstIx = new Array[Int](m)
        i = 0
        while (i < m) {
          srcIx(i) = java.util.Arrays.binarySearch(ids, srcId(i))
          dstIx(i) = java.util.Arrays.binarySearch(ids, dstId(i))
          deg(srcIx(i)) += 1
          i += 1
        }
        val off = new Array[Int](n + 1)
        i = 0
        while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
        val adj = new Array[Int](m)
        val cursor = off.clone()
        i = 0
        while (i < m) {
          adj(cursor(srcIx(i))) = dstIx(i); cursor(srcIx(i)) += 1; i += 1
        }
        val hops = Array.fill(n)(-1)
        var frontier = new Array[Int](seedId.length)
        var fn = 0
        seedId.foreach { sid =>
          val ix = java.util.Arrays.binarySearch(ids, sid)
          if (hops(ix) < 0) { hops(ix) = 0; frontier(fn) = ix; fn += 1 }
        }
        var depth = 0
        while (fn > 0 && depth < maxHops) {
          depth += 1
          val next = new Array[Int](n)
          var nn = 0
          i = 0
          while (i < fn) {
            val v = frontier(i)
            var j = off(v)
            while (j < off(v + 1)) {
              val w = adj(j)
              if (hops(w) < 0) { hops(w) = depth; next(nn) = w; nn += 1 }
              j += 1
            }
            i += 1
          }
          frontier = next; fn = nn
        }
        Iterator.range(0, n).filter(hops(_) >= 0)
          .map(v => Row(ids(v), hops(v)))
      }
    }(Encoders.row(outSchema))
  }

  private val wOutSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  /** Weighted single-source (multi-seed) shortest paths, Bellman–Ford
    * style: after `rounds` relaxation rounds every node carries the
    * minimum total edge weight over paths of ≤ `rounds` edges from any
    * seed — exact for every node whose true shortest path uses ≤ rounds
    * edges. Weights are LONG (integer — e.g. cents): distances are sums
    * of longs, so both paths here and any SQL twin agree bit-for-bit
    * with no float-order caveats.
    *
    * Scale shape: the relaxation round is the engine's iterate-to-
    * fixpoint shape again — one join (edges ⋈ dist on src; edges
    * partitioned once and cached) and one min-aggregate per round,
    * `localCheckpoint` cutting lineage. The fused path (≤ localThreshold
    * distinct edges) runs the same rounds over CSR arrays in one task.
    *
    * @param rounds relaxation rounds (= max path edge count considered).
    * @return (id, dist) for every node within `rounds` edges of a seed. */
  def weighted(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, seedCol: String, rounds: Int,
      localThreshold: Long = 5_000_000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // parallel edges collapse to their min weight — the only one that
    // can ever win a relaxation
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"), col(wCol).cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w")).persist()
    val s = seeds.select(col(seedCol).cast("long").as("id")).distinct()
    val nEdges = e.count()
    if (nEdges <= localThreshold) weightedFused(e, s, rounds)
    else weightedDistributed(e, s, rounds)
  }

  /** Small-graph path: Bellman–Ford rounds over CSR arrays in ONE task.
    * Seeds ride in-band like [[runFused]]. */
  private def weightedFused(e: DataFrame, s: DataFrame,
      rounds: Int): DataFrame = {
    val tagged = e.select(col("src"), col("dst"), col("w"),
      lit(false).as("seed"))
      .unionAll(s.select(col("id").as("src"),
        lit(Long.MinValue).as("dst"), lit(0L).as("w"),
        lit(true).as("seed")))
    tagged.coalesce(1).mapPartitions { it =>
      val sb = new scala.collection.mutable.ArrayBuilder.ofLong
      val db = new scala.collection.mutable.ArrayBuilder.ofLong
      val wb = new scala.collection.mutable.ArrayBuilder.ofLong
      val seedB = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        if (r.getBoolean(3)) seedB += r.getLong(0)
        else { sb += r.getLong(0); db += r.getLong(1); wb += r.getLong(2) }
      }
      val srcId = sb.result(); val dstId = db.result()
      val w = wb.result(); val seedId = seedB.result()
      val m = srcId.length
      val all = new Array[Long](2 * m + seedId.length)
      System.arraycopy(srcId, 0, all, 0, m)
      System.arraycopy(dstId, 0, all, m, m)
      System.arraycopy(seedId, 0, all, 2 * m, seedId.length)
      java.util.Arrays.sort(all)
      var n = 0
      var i = 0
      while (i < all.length) {
        if (n == 0 || all(n - 1) != all(i)) { all(n) = all(i); n += 1 }
        i += 1
      }
      val ids = java.util.Arrays.copyOf(all, n)
      if (n == 0) Iterator.empty
      else {
        val srcIx = new Array[Int](m)
        val dstIx = new Array[Int](m)
        i = 0
        while (i < m) {
          srcIx(i) = java.util.Arrays.binarySearch(ids, srcId(i))
          dstIx(i) = java.util.Arrays.binarySearch(ids, dstId(i))
          i += 1
        }
        val NoDist = Long.MaxValue
        var dist = Array.fill(n)(NoDist)
        seedId.foreach { sid =>
          dist(java.util.Arrays.binarySearch(ids, sid)) = 0L
        }
        for (_ <- 1 to rounds) {
          val next = dist.clone()
          i = 0
          while (i < m) {
            val ds = dist(srcIx(i))
            if (ds != NoDist && ds + w(i) < next(dstIx(i)))
              next(dstIx(i)) = ds + w(i)
            i += 1
          }
          dist = next
        }
        Iterator.range(0, n).filter(dist(_) != NoDist)
          .map(v => Row(ids(v), dist(v)))
      }
    }(Encoders.row(wOutSchema))
  }

  /** Cluster-scale path: join + min-aggregate per round, checkpointed. */
  private def weightedDistributed(e: DataFrame, s: DataFrame,
      rounds: Int): DataFrame = {
    var dist = s.select(col("id"), lit(0L).as("dist")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relax = e.join(dist, col("src") === col("id"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relax)
        .groupBy("id").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    e.unpersist()
    dist
  }

  /** Cluster-scale path: frontier join per round, checkpointed. */
  private def runDistributed(e: DataFrame, s: DataFrame,
      maxHops: Int): DataFrame = {
    var visited = s.select(col("id"), lit(0).as("hops")).localCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxHops && !frontier.isEmpty) {
      depth += 1
      val next = e.join(frontier, col("src") === col("id"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(depth).as("hops"))
        .localCheckpoint() // cut lineage; also pins the frontier for reuse
      visited = visited.unionAll(next).localCheckpoint()
      frontier = next
    }
    e.unpersist()
    visited
  }
}
