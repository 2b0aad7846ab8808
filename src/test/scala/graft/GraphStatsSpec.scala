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
}
