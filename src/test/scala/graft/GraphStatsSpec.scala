package graft

import graft.operators.GraphStats

class GraphStatsSpec extends SparkSpec {

  private def run(es: Seq[(Long, Long)], parts: Int = 3): Double =
    GraphStats.degreeAssortativity(
      spark.createDataFrame(
        spark.sparkContext.parallelize(es, parts)).toDF("s", "d"),
      "s", "d").collect()(0).getDouble(2)

  test("star graph is maximally disassortative") {
    // hub 0 ↔ leaves 1..5: every edge pairs deg 5 with deg 1
    val star = (1L to 5L).map(l => (0L, l))
    assert(run(star) == -1.0)
  }

  test("degree-regular graphs have undefined (NULL) assortativity") {
    // a 4-cycle: all degrees 2 → zero variance → NULL corr
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r = GraphStats.degreeAssortativity(
      spark.createDataFrame(cycle).toDF("s", "d"), "s", "d").collect()(0)
    assert(r.isNullAt(2))
  }

  test("matches brute-force Pearson over endpoint degrees") {
    val rnd = new scala.util.Random(7)
    val es = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val canon = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val sym = canon ++ canon.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = sym.map { case (u, v) => (deg(u), deg(v)) }
    val n = xs.size.toDouble
    val (sa, sb) = (xs.map(_._1).sum.toDouble, xs.map(_._2).sum.toDouble)
    val ssa = xs.map(p => p._1 * p._1).sum.toDouble
    val ssb = xs.map(p => p._2 * p._2).sum.toDouble
    val sp = xs.map(p => p._1 * p._2).sum.toDouble
    val want = (n * sp - sa * sb) /
      (math.sqrt(n * ssa - sa * sa) * math.sqrt(n * ssb - sb * sb))
    assert(math.abs(run(es) - math.rint(want * 1e6) / 1e6) < 2e-6)
    // duplicate/reversed/self-loop noise collapses to the same value
    assert(run(es ++ es.map(_.swap) ++ Seq((1L, 1L)), 5) == run(es))
  }

  private def simMap(es: Seq[(Long, Long)], minCommon: Int = 1,
      maxDegree: Int = Int.MaxValue): Map[(Long, Long), (Long, Double)] =
    GraphStats.commonNeighborSim(
        spark.createDataFrame(es).toDF("s", "d"), "s", "d",
        minCommon, maxDegree)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("commonNeighborSim: opposite corners of a 4-cycle are twins") {
    // 1-2-3-4-1: N(1)=N(3)={2,4}, N(2)=N(4)={1,3}; adjacent nodes share
    // nothing, so exactly the two diagonals appear, at sim 1
    val sim = simMap(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(sim == Map((1L, 3L) -> ((2L, 1.0)), (2L, 4L) -> ((2L, 1.0))))
  }

  test("commonNeighborSim == brute force over neighbor sets") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 400).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val nbr = (es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.flatMap(e => Seq(e, e.swap)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = (for {
      u <- nbr.keys; v <- nbr.keys if u < v
      c = (nbr(u) & nbr(v)).size.toLong if c >= 2
    } yield (u, v) -> ((c,
      c.toDouble / (nbr(u).size + nbr(v).size - c)))).toMap
    assert(simMap(es, minCommon = 2) == want)
  }

  test("adamicAdar == brute force over neighbor sets") {
    val rnd = new scala.util.Random(17)
    val es = (1 to 400).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val nbr = (es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.flatMap(e => Seq(e, e.swap)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // replicate the operator's numeric discipline exactly: per-center
    // term round(1/log2(deg), 9) HALF_UP, exact decimal sum, round(,6)
    val want = (for {
      u <- nbr.keys; v <- nbr.keys if u < v
      common = nbr(u) & nbr(v) if common.size >= 2
    } yield {
      val s = common.toSeq.map(w => BigDecimal(
          1.0 / (math.log(nbr(w).size.toDouble) / math.log(2.0)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      (u, v) -> ((common.size.toLong, BigDecimal(s.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    val got = GraphStats.adamicAdar(
        spark.createDataFrame(es).toDF("s", "d"), "s", "d", minCommon = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == want)
  }

  test("adamicAdar: rare shared neighbor outscores a shared hub") {
    // pair (1,2) shares only hub 0 (deg 4 -> weight 1/log2(4) = 0.5);
    // pair (3,4) shares only the deg-2 node 5 (weight 1/log2(2) = 1)
    val es = Seq((0L, 1L), (0L, 2L), (0L, 8L), (0L, 9L),
      (5L, 3L), (5L, 4L))
    val got = GraphStats.adamicAdar(
        spark.createDataFrame(es).toDF("s", "d"), "s", "d", minCommon = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got((1L, 2L)) == 0.5 && got((3L, 4L)) == 1.0)
  }

  test("commonNeighborSim: maxDegree drops hub-centered wedges only") {
    // hub 0 touches everyone; 1-2 also share non-hub neighbor 3
    val es = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 3L), (2L, 3L))
    val exact = simMap(es)
    assert(exact((1L, 2L))._1 == 2L) // common = {0, 3}
    val pruned = simMap(es, maxDegree = 2)
    // centers 0 and 3 (deg 3) pruned: the (1,2) pair loses both its
    // wedges and disappears; (0,3) keeps its deg-2 centers 1 and 2, and
    // its sim uses the TRUE degrees (the deg table is never pruned)
    assert(pruned == Map((0L, 3L) -> ((2L, 0.5))))
  }

  private def ccMap(es: Seq[(Long, Long)], threshold: Long = 2_000_000L)
      : Map[Long, (Long, Long, Double)] =
    GraphStats.clusteringCoefficient(
        spark.createDataFrame(es).toDF("s", "d"), "s", "d", threshold)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("clusteringCoefficient: triangle with a pendant") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val r = ccMap(es)
    assert(r(1L) == ((2L, 1L, 1.0)))
    assert(r(2L) == ((2L, 1L, 1.0)))
    assert(r(3L) == ((3L, 1L, 1.0 / 3.0))) // 1 of 3 neighbor pairs closed
    assert(r(4L) == ((1L, 0L, 0.0)))       // deg < 2: cc = 0 by convention
  }

  test("clusteringCoefficient == brute force; fused == distributed") {
    val rnd = new scala.util.Random(13)
    val es = (1 to 300).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val nbr = (es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.flatMap(e => Seq(e, e.swap)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = nbr.map { case (v, ns) =>
      val nsq = ns.toSeq
      val t = (for {
        u <- nsq; w <- nsq if u < w && nbr(u).contains(w)
      } yield 1).size.toLong
      val d = ns.size.toLong
      v -> ((d, t, if (d >= 2) 2.0 * t / (d * (d - 1)) else 0.0))
    }
    val fused = ccMap(es)
    assert(fused == want)
    assert(ccMap(es, threshold = 0L) == want) // distributed path agrees
  }

  private def modMap(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]) =
    GraphStats.modularity(
      spark.createDataFrame(edges).toDF("s", "d").repartition(4),
      "s", "d",
      spark.createDataFrame(labels).toDF("id", "lbl"), "id", "lbl")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

  test("modularity: two triangles + bridge, hand-computed Q") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L)
    val got = modMap(edges, labels)
    // |A| = 14 arcs; each community: 6 internal arcs, degree sum 7
    // contribution = (6*14 - 49)/196 = 35/196 = 0.178571...
    assert(got == Map(
      1L -> ((3L, 7L, 6L, 0.178571)),
      4L -> ((3L, 7L, 6L, 0.178571))))
  }

  test("modularity: the all-in-one partition scores exactly zero") {
    val rnd = new scala.util.Random(71)
    val edges = (1 to 200).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val got = modMap(edges, nodes.map(_ -> 0L))
    assert(got.keySet == Set(0L))
    assert(got(0L)._4 == 0.0)
  }

  test("modularity == brute force on random graphs and labelings") {
    val rnd = new scala.util.Random(73)
    val edges = (1 to 250).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val arcs = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.flatMap(e => Seq(e, e.swap))
    val nodes = arcs.map(_._1).distinct
    val labels = nodes.map(v => v -> (v % 5))
    val lab = labels.toMap
    val m2 = arcs.size.toLong
    val want = labels.groupBy(_._2).map { case (c, members) =>
      val ms = members.map(_._1).toSet
      val ia = arcs.count(a => ms(a._1) && lab(a._2) == c).toLong
      val dsum = arcs.count(a => ms(a._1)).toLong
      val q = BigDecimal((ia * m2 - dsum * dsum).toDouble / (m2.toDouble * m2))
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      c -> ((ms.size.toLong, dsum, ia, q))
    }
    assert(modMap(edges, labels) == want)
    // contributions sum to a sane Q in [-1, 1]
    val qTotal = modMap(edges, labels).values.map(_._4).sum
    assert(qTotal >= -1.0 && qTotal <= 1.0)
  }
}
