package graft

import graft.operators.Hits

class HitsSpec extends SparkSpec {
  private lazy val sq = spark
  import sq.implicits._

  // bipartite star-ish graph: node 10 is cited by both hubs, 11 by one
  private def edges = Seq((1L, 10L), (2L, 10L), (1L, 11L))
    .toDF("src", "dst")

  test("hits: authority/hub ordering on a hand graph, L1-normalized") {
    val m = Hits.run(edges, "src", "dst", rounds = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // 10 (2 in-edges) must out-rank 11; 1 (2 out-edges) out-ranks 2
    assert(m(10L)._2 > m(11L)._2)
    assert(m(1L)._1 > m(2L)._1)
    // sources have no authority, sinks no hub score
    assert(m(1L)._2 == 0.0 && m(10L)._1 == 0.0)
    assert(math.abs(m.values.map(_._1).sum - 1.0) < 1e-6)
    assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("hits: fused and distributed paths agree") {
    val rnd = new scala.util.Random(3)
    val e = (1 to 500).map(_ =>
      (rnd.nextInt(40).toLong, (100 + rnd.nextInt(60)).toLong))
      .toDF("src", "dst")
    val fused = Hits.run(e, "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val dist = Hits.run(e, "src", "dst", 4, localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(fused.keySet == dist.keySet)
    fused.foreach { case (id, (h, a)) =>
      assert(math.abs(h - dist(id)._1) < 1e-7, s"hub($id)")
      assert(math.abs(a - dist(id)._2) < 1e-7, s"auth($id)")
    }
  }

  test("hits: duplicate edges collapse; partitioning-invariant") {
    val dup = edges.union(edges).repartition(5)
    val a = Hits.run(dup, "src", "dst", 3).collect().map(_.toSeq).toSet
    val b = Hits.run(edges.coalesce(1), "src", "dst", 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
