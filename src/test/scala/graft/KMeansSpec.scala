package graft

import graft.operators.KMeans

class KMeansSpec extends SparkSpec {
  private lazy val sq = spark
  import sq.implicits._

  /** two tight blobs around (0,0) and (10,10) */
  private def blobs = {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq(c + rnd.nextFloat() * 0.5f, c + rnd.nextFloat() * 0.5f))
    }
    rows.toDF("id", "vec")
  }

  test("fit: separates two blobs after one update round") {
    val got = KMeans.fit(blobs, "id", "vec", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // seeds are ids 0 (blob A) and 1 (blob B) — labels align with blobs
    (0 until 40).foreach { i =>
      assert(got(i.toLong) == i % 2, s"point $i")
    }
  }

  test("fit: rounds=1 is plain assignment to the seed vectors") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(4.0f, 4.0f)),
      (3L, Seq(0.1f, 0.1f)), (4L, Seq(3.9f, 4.1f)))
      .toDF("id", "vec")
    val got = KMeans.fit(df, "id", "vec", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1))
  }

  test("fit: equidistant point breaks tie to the lower centroid id") {
    val df = Seq(
      (1L, Seq(0.0f)), (2L, Seq(2.0f)), (3L, Seq(1.0f)))
      .toDF("id", "vec")
    val got = KMeans.fit(df, "id", "vec", k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(3L) == 0)
  }

  test("fit: a centroid that loses all points drops out without error") {
    // seeds are ids 1,2,3 — all of blob A; after one update the far
    // blob pulls points away and duplicate/empty centroids may vanish
    val df = (Seq((1L, Seq(0.0f)), (2L, Seq(0.2f)), (3L, Seq(0.1f))) ++
      (10L to 20L).map(i => (i, Seq(50.0f + (i % 3))))).toDF("id", "vec")
    val got = KMeans.fit(df, "id", "vec", k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == 14)
    // the far blob ends in one cluster, distinct from blob A's
    val farLabels = (10L to 20L).map(got).toSet
    assert(farLabels.size == 1)
    assert(!(1L to 3L).map(got).toSet.exists(farLabels.contains))
  }

  test("fit: deterministic and partitioning-invariant") {
    val a = KMeans.fit(blobs.repartition(7), "id", "vec", 4, 3)
      .collect().map(_.toSeq).toSet
    val b = KMeans.fit(blobs.coalesce(1), "id", "vec", 4, 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
