package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Synchronous label propagation (community detection): every node
  * starts as its own label; each round all nodes SIMULTANEOUSLY adopt
  * the most frequent label among their in-neighbors (ties to the
  * smallest label). The deterministic, oracle-checkable variant of LPA
  * — asynchronous LPA's result depends on visit order, which no SQL
  * twin could reproduce; synchronous rounds are a pure dataflow.
  *
  * The fourth member of the iterate-to-fixpoint family (CC, PageRank,
  * BFS/SSSP): per round one join (edges ⋈ labels on src — edges
  * partitioned once and cached) and two aggregates (label counts per
  * node, then the (count DESC, label ASC) argmin via the one-pass
  * min(struct(-cnt, lbl)) trick — no window), `localCheckpoint`
  * cutting lineage. Nodes with no in-edges keep their current label.
  */
object LabelProp {

  private val outSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("label", LongType, nullable = false)))

  /** @param edges directed (labels flow src → dst); pass both
    *   orientations for an undirected graph. Duplicates collapse.
    * @param localThreshold max deduplicated edge count for the fused
    *   single-task path (all-integer semantics, so the paths are
    *   bit-identical — spec-enforced); 0 forces the distributed loop.
    * @return (id, label) after `rounds` synchronous rounds. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, localThreshold: Long = 5_000_000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    val nEdges = e.count()
    if (nEdges <= localThreshold) runFused(e, rounds)
    else runDistributed(e, rounds)
  }

  /** Small-graph path: CSR-by-dst + per-node count maps in ONE task. */
  private def runFused(e: DataFrame, rounds: Int): DataFrame =
    e.coalesce(1).mapPartitions { it =>
      val sb = new scala.collection.mutable.ArrayBuilder.ofLong
      val db = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r => sb += r.getLong(0); db += r.getLong(1) }
      val srcId = sb.result(); val dstId = db.result()
      val m = srcId.length
      if (m == 0) Iterator.empty
      else {
        val all = new Array[Long](2 * m)
        System.arraycopy(srcId, 0, all, 0, m)
        System.arraycopy(dstId, 0, all, m, m)
        java.util.Arrays.sort(all)
        var n = 0
        var i = 0
        while (i < all.length) {
          if (n == 0 || all(n - 1) != all(i)) { all(n) = all(i); n += 1 }
          i += 1
        }
        val ids = java.util.Arrays.copyOf(all, n)
        // CSR indexed by DST: for each node, its in-neighbor sources
        val indeg = new Array[Int](n)
        val srcIx = new Array[Int](m)
        val dstIx = new Array[Int](m)
        i = 0
        while (i < m) {
          srcIx(i) = java.util.Arrays.binarySearch(ids, srcId(i))
          dstIx(i) = java.util.Arrays.binarySearch(ids, dstId(i))
          indeg(dstIx(i)) += 1
          i += 1
        }
        val off = new Array[Int](n + 1)
        i = 0
        while (i < n) { off(i + 1) = off(i) + indeg(i); i += 1 }
        val inAdj = new Array[Int](m)
        val cursor = off.clone()
        i = 0
        while (i < m) {
          inAdj(cursor(dstIx(i))) = srcIx(i); cursor(dstIx(i)) += 1; i += 1
        }
        var label: Array[Long] = ids.clone()
        for (_ <- 1 to rounds) {
          val next = label.clone() // Jacobi: no-in-edge nodes keep theirs
          val counts = new java.util.HashMap[Long, Int]()
          var v = 0
          while (v < n) {
            if (off(v + 1) > off(v)) {
              counts.clear()
              var bestL = Long.MaxValue
              var bestC = 0
              var j = off(v)
              while (j < off(v + 1)) {
                val l = label(inAdj(j))
                val c = counts.merge(l, 1, Integer.sum)
                if (c > bestC || (c == bestC && l < bestL)) {
                  bestC = c; bestL = l
                }
                j += 1
              }
              next(v) = bestL
            }
            v += 1
          }
          label = next
        }
        Iterator.range(0, n).map(v => Row(ids(v), label(v)))
      }
    }(Encoders.row(outSchema))

  /** Cluster-scale path: join + two aggregates per round, checkpointed. */
  private def runDistributed(e: DataFrame, rounds: Int): DataFrame = {
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
    var labels = nodes.select(col("id"), col("id").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val adopted = e.join(labels, col("src") === col("id"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("dst").as("id"), col("m.l").as("label"))
      labels = labels.join(adopted.withColumnRenamed("label", "__new"),
          Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint()
    }
    e.unpersist()
    labels
  }

  /** Semi-supervised label SPREADING: a small labeled seed set is
    * clamped, every other node adopts each round the most frequent
    * label among its CURRENTLY-labeled in-neighbors (ties to the
    * smallest label; no labeled neighbor → keep the previous state,
    * possibly unlabeled) — [[run]]'s transductive-classification
    * sibling, the standard "propagate the 10% you annotated across
    * the similarity graph" step over an ε-graph or k-NN graph.
    *
    * Same per-round plan as the community loop (one edge⋈labels join,
    * the min(struct(-cnt, label)) argmax, localCheckpoint) with a
    * NULL-aware twist: unlabeled nodes simply cast no votes, and the
    * clamp is a coalesce with the seed column — all-integer
    * semantics, so an unrolled SQL twin matches exactly.
    *
    * @param seeds (idCol, labelCol) — the annotated subset; ids not in
    *   the graph are ignored, and duplicate ids collapse to their
    *   SMALLEST label (one seed row per node, deterministically).
    * @return (id, label) for every node incident to an edge; label is
    *   NULL where no seed's influence arrived within `rounds`. */
  def spread(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, idCol: String, labelCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst"))).distinct()
    // one row per seed id: disagreeing duplicates would otherwise fan
    // the node into multiple label rows and double-count its votes
    val sd = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("__lbl"))
      .groupBy(col("id")).agg(min(col("__lbl")).as("__seed"))
    var labels = nodes.join(broadcast(sd), Seq("id"), "left")
      .select(col("id"), col("__seed"), col("__seed").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = e
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .filter(col("label").isNotNull) // unlabeled nodes cast no vote
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("dst").as("id"), col("m.l").as("__vote"))
      labels = labels.join(votes, Seq("id"), "left")
        .select(col("id"), col("__seed"),
          coalesce(col("__seed"), col("__vote"), col("label"))
            .as("label"))
        .localCheckpoint()
    }
    e.unpersist()
    labels.select(col("id"), col("label"))
  }
}
