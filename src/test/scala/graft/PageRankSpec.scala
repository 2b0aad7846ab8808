package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  /** In-memory reference: same simplified formulation (uniform init,
    * dangling mass dropped), plain Scala doubles. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map(p => r(p._1) / out(p._1)).sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private val chain = Seq( // hub-and-chain with a dangling sink (4)
    1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L, 3L -> 4L, 2L -> 4L)

  test("matches the in-memory reference on a hand graph") {
    val df = spark.createDataFrame(chain).toDF("s", "t")
    val got = PageRank.run(df, "s", "t", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refRanks(chain, 10, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, rk) =>
      assert(math.abs(rk - want(id)) < 1e-12, s"node $id: $rk vs ${want(id)}")
    }
    // dangling sink keeps collecting but never emits: total mass < 1
    assert(got.values.sum < 1.0)
    assert(got(4L) > got(1L) * 0.5, "sink fed by two nodes ranks high")
  }

  test("fused and distributed paths agree (to float sum-order)") {
    val df = spark.createDataFrame(chain).toDF("s", "t")
    val fused = PageRank.run(df, "s", "t", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = PageRank.run(df, "s", "t", 10, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused.keySet == dist.keySet)
    fused.foreach { case (id, rk) =>
      assert(math.abs(rk - dist(id)) < 1e-12, s"node $id: $rk vs ${dist(id)}")
    }
  }

  test("duplicate edges collapse; partitioning never changes ranks") {
    val dup = chain ++ chain ++ chain
    val df = spark.createDataFrame(dup).toDF("s", "t").repartition(7)
    val got = PageRank.run(df, "s", "t", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refRanks(chain, 10, 0.85)
    got.foreach { case (id, rk) =>
      assert(math.abs(rk - want(id)) < 1e-12)
    }
  }

  test("symmetric complete graph is uniform; guards reject bad params") {
    val k3 = for (a <- 1L to 3L; b <- 1L to 3L if a != b) yield (a, b)
    val df = spark.createDataFrame(k3).toDF("s", "t")
    val got = PageRank.run(df, "s", "t", 5).collect().map(_.getDouble(1))
    got.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12))
    assertThrows[IllegalArgumentException] { PageRank.run(df, "s", "t", 0) }
    assertThrows[IllegalArgumentException] {
      PageRank.run(df, "s", "t", 3, damping = 1.0)
    }
  }
}
