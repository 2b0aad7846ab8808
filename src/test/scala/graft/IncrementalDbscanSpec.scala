package graft

import graft.operators.{Dbscan, IncrementalDbscan}

class IncrementalDbscanSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(rows).toDF("id", "vec")

  private def labelsOf(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  /** incremental over the given batches == from-scratch run on the union */
  private def checkEqual(batches: Seq[Seq[(Long, Seq[Float])]],
      eps: Double, minPts: Int, dims: Seq[Int]): Unit = {
    var st = IncrementalDbscan.init(df(batches.head), "id", "vec",
      eps, minPts, dims)
    batches.tail.foreach { b =>
      st = IncrementalDbscan.addPoints(st, df(b), "id", "vec",
        eps, minPts, dims)
    }
    val got = labelsOf(IncrementalDbscan.labels(st))
    val want = labelsOf(Dbscan.run(df(batches.flatten), "id", "vec",
      eps, minPts, dims))
    assert(got == want)
  }

  test("addPoints: random blobs over three batches match the full run") {
    val rnd = new scala.util.Random(23)
    val centers = Seq((0.0, 0.0), (10.0, 0.0), (5.0, 8.0))
    val pts = (0 until 240).map { i =>
      if (i % 8 == 7) // noise
        (i.toLong, Seq((rnd.nextDouble() * 30 - 5).toFloat,
          (rnd.nextDouble() * 30 - 10).toFloat))
      else {
        val (cx, cy) = centers(i % 3)
        (i.toLong, Seq((cx + rnd.nextGaussian() * 0.5).toFloat,
          (cy + rnd.nextGaussian() * 0.5).toFloat))
      }
    }
    val batches = Seq(pts.filter(_._1 % 3 == 0), pts.filter(_._1 % 3 == 1),
      pts.filter(_._1 % 3 == 2))
    checkEqual(batches, eps = 1.0, minPts = 4, dims = Seq(0, 1))
  }

  test("addPoints: an old non-core point promoted to core by the batch") {
    // base: p and q are mutual neighbors but 2 < minPts=3 -> both noise
    val base = Seq(1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.5f, 0.0f))
    // r is within eps of both -> everyone reaches 2 neighbors + self = 3
    val batch = Seq(3L -> Seq(0.25f, 0.4f))
    var st = IncrementalDbscan.init(df(base), "id", "vec", 1.0, 3, Seq(0))
    assert(labelsOf(IncrementalDbscan.labels(st))
      == Map(1L -> 0, 2L -> 0))
    st = IncrementalDbscan.addPoints(st, df(batch), "id", "vec",
      1.0, 3, Seq(0))
    val got = labelsOf(IncrementalDbscan.labels(st))
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1))
    checkEqual(Seq(base, batch), 1.0, 3, Seq(0))
  }

  test("addPoints: a bridge batch merges two standing clusters") {
    val base = Seq(1L -> Seq(0.0f), 2L -> Seq(0.5f),
      10L -> Seq(3.0f), 11L -> Seq(3.5f))
    val bridge = Seq(20L -> Seq(1.5f), 21L -> Seq(2.4f))
    var st = IncrementalDbscan.init(df(base), "id", "vec", 1.0, 2, Seq(0))
    assert(labelsOf(IncrementalDbscan.labels(st)).values.toSet == Set(1, 2))
    st = IncrementalDbscan.addPoints(st, df(bridge), "id", "vec",
      1.0, 2, Seq(0))
    val got = labelsOf(IncrementalDbscan.labels(st))
    assert(got.values.toSet == Set(1)) // one merged cluster
    checkEqual(Seq(base, bridge), 1.0, 2, Seq(0))
  }

  test("addPoints: brute-force path (no bucket dims) and isolated batch") {
    val base = Seq(1L -> Seq(0.0f, 0.0f), 2L -> Seq(0.2f, 0.0f),
      3L -> Seq(0.4f, 0.0f))
    val far = Seq(50L -> Seq(90.0f, 90.0f)) // connects to nothing
    checkEqual(Seq(base, far), 0.5, 2, Nil)
  }

  test("addPoints: minPts=1 makes every point core, including isolated") {
    val base = Seq(1L -> Seq(0.0f), 2L -> Seq(10.0f))
    val batch = Seq(3L -> Seq(0.5f), 4L -> Seq(20.0f))
    checkEqual(Seq(base, batch), 1.0, 1, Seq(0))
  }

  test("addPoints: repeated batches keep border attachment minimal-comp") {
    // border point 5 sits between two cores from different clusters —
    // label must follow the MIN component, exactly like Dbscan.run
    val rnd = new scala.util.Random(7)
    val cloud = (0 until 60).map { i =>
      (i.toLong, Seq((rnd.nextDouble() * 6).toFloat,
        (rnd.nextDouble() * 2).toFloat))
    }
    checkEqual(Seq(cloud.filter(_._1 < 20), cloud.filter(x =>
      x._1 >= 20 && x._1 < 40), cloud.filter(_._1 >= 40)),
      eps = 0.6, minPts = 3, dims = Seq(0, 1))
  }
}
