package graft

import scala.collection.mutable

/** Brute-force single-node DBSCAN oracle with the engine's exact semantics
  * (which mirror the reference, `dbscan.cpp:720-791`, with deterministic
  * canonicalization):
  *  - neighbor count includes the point itself, core test is `>= minPts`;
  *  - clusters = connected components of the core-core ε-graph;
  *  - border points join the minimum-component among their core neighbors;
  *  - component key = min point id; cluster ids dense from 1 ordered by
  *    component key; noise = 0.
  */
object SequentialDbscan {

  /** @return (labels: id → clusterId, coreIds)
    * @param minClusterSize components smaller than this become noise
    *   (reference `child_count > 1` rule, `dbscan.cpp:347-352`) */
  def run(ids: Array[Long], pts: Array[Array[Float]], eps: Double,
      minPts: Int, minClusterSize: Int = 2): (Map[Long, Int], Set[Long]) = {
    val n = pts.length
    val eps2 = eps * eps
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    // neighbor lists (self excluded; count below adds self back)
    val nbrs = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    for (i <- 0 until n; j <- (i + 1) until n if d2(pts(i), pts(j)) <= eps2) {
      nbrs(i) += j; nbrs(j) += i
    }
    val isCore = Array.tabulate(n)(i => nbrs(i).size + 1 >= minPts)

    // union-find over core points
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for (i <- 0 until n if isCore(i); j <- nbrs(i) if isCore(j)) union(i, j)

    // component key = min id in component (core points only)
    val compKey = mutable.Map.empty[Int, Long]
    for (i <- 0 until n if isCore(i)) {
      val r = find(i)
      compKey(r) = math.min(compKey.getOrElse(r, Long.MaxValue), ids(i))
    }
    // border points -> min component key among core neighbors
    val pointComp = mutable.Map.empty[Int, Long]
    for (i <- 0 until n) {
      if (isCore(i)) pointComp(i) = compKey(find(i))
      else {
        val coreNbrComps = nbrs(i).filter(isCore(_)).map(j => compKey(find(j)))
        if (coreNbrComps.nonEmpty) pointComp(i) = coreNbrComps.min
      }
    }
    val compSizes = pointComp.values.groupBy(identity).map { case (k, v) => k -> v.size }
    val keptComps = compSizes.filter(_._2 >= minClusterSize).keySet
    val denseIds = keptComps.toSeq.sorted.zipWithIndex
      .map { case (k, idx) => k -> (idx + 1) }.toMap
    val labels = (0 until n).map { i =>
      ids(i) -> pointComp.get(i).flatMap(denseIds.get).getOrElse(0)
    }.toMap
    (labels, (0 until n).filter(isCore(_)).map(ids(_)).toSet)
  }
}
