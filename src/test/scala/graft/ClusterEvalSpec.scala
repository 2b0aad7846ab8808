package graft

import graft.operators.{ClusterEval, KMeans, KnnJoin}
import org.apache.spark.sql.functions._

class ClusterEvalSpec extends SparkSpec {
  private lazy val sq = spark
  import sq.implicits._

  /** two tight blobs around (0,0) and (10,10) — KMeansSpec's fixture */
  private def blobs = {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq(c + rnd.nextFloat() * 0.5f, c + rnd.nextFloat() * 0.5f))
    }
    rows.toDF("id", "vec")
  }

  test("silhouette: tight separated blobs score near 1 in every cluster") {
    val got = ClusterEval.simplifiedSilhouette(blobs, "id", "vec",
      k = 2, rounds = 2).collect()
    assert(got.length == 2)
    assert(got.map(_.getLong(1)).sum == 40)
    got.foreach { r =>
      val s = r.getDouble(2)
      assert(s > 0.9 && s <= 1.0, s"cluster ${r.getInt(0)} sil $s")
    }
  }

  test("silhouette: scores stay in [0, 1] on an unclustered line") {
    val line = (0 until 30).map(i => (i.toLong, Seq(i.toFloat)))
      .toDF("id", "vec")
    val got = ClusterEval.simplifiedSilhouette(line, "id", "vec",
      k = 3, rounds = 3).collect()
    assert(got.map(_.getLong(1)).sum == 30)
    got.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= 0.0 && s <= 1.0, s"sil $s out of range")
    }
  }

  test("ARI: identical labelings score exactly 1") {
    val a = (0 until 30).map(i => (i.toLong, i % 3)).toDF("id", "l")
    val got = ClusterEval.adjustedRandIndex(a, a).collect()(0)
    assert(got.getLong(0) == 30)
    assert(got.getLong(1) == 3 && got.getLong(2) == 3)
    assert(got.getDouble(3) == 1.0)
  }

  test("ARI: invariant under label renaming") {
    val a = (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "l")
    val b = (0 until 40).map(i => (i.toLong, (i % 40) / 10)).toDF("id", "l")
    val renamed = b.select(col("id"), (col("l") * 100 + 7).as("l"))
    val x = ClusterEval.adjustedRandIndex(a, b).collect()(0).getDouble(3)
    val y = ClusterEval.adjustedRandIndex(a, renamed).collect()(0).getDouble(3)
    assert(x == y)
  }

  test("ARI: matches the brute-force pair-counting definition") {
    val rnd = new scala.util.Random(5)
    val la = (0 until 60).map(i => i.toLong -> rnd.nextInt(4)).toMap
    val lb = (0 until 60).map(i => i.toLong -> rnd.nextInt(3)).toMap
    val got = ClusterEval.adjustedRandIndex(
      la.toSeq.toDF("id", "l"), lb.toSeq.toDF("id", "l"))
      .collect()(0).getDouble(3)
    // brute force over all unordered pairs
    val ids = (0L until 60L).toArray
    var a11 = 0L; var a00 = 0L; var a10 = 0L; var a01 = 0L
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val sa = la(ids(i)) == la(ids(j)); val sb = lb(ids(i)) == lb(ids(j))
      if (sa && sb) a11 += 1 else if (!sa && !sb) a00 += 1
      else if (sa) a10 += 1 else a01 += 1
    }
    val n2 = ids.length.toLong * (ids.length - 1) / 2
    val expIdx = (a11 + a10).toDouble * (a11 + a01).toDouble / n2
    val maxIdx = ((a11 + a10) + (a11 + a01)).toDouble / 2
    val want = (a11 - expIdx) / (maxIdx - expIdx)
    assert(math.abs(got - want) < 1e-12, s"got $got want $want")
  }

  test("ARI: one-cluster vs one-cluster labeling is NULL (undefined)") {
    val a = (0 until 10).map(i => (i.toLong, 0)).toDF("id", "l")
    val got = ClusterEval.adjustedRandIndex(a, a).collect()(0)
    assert(got.isNullAt(3))
  }

  test("kdist: deciles partition all points with monotone bands") {
    val got = ClusterEval.kDistProfile(blobs, "id", "vec", k = 4)
      .orderBy("decile").collect()
    assert(got.map(_.getInt(0)).toSeq == (1 to 10))
    assert(got.map(_.getLong(1)).sum == 40)
    // equi-depth: 40 points over 10 buckets = 4 each
    assert(got.forall(_.getLong(1) == 4))
    // band minima are non-decreasing and each band's min >= previous max
    got.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getLong(2) >= lo.getLong(3),
        s"decile ${hi.getInt(0)} overlaps ${lo.getInt(0)}")
    }
  }

  test("kdist: kth distance agrees with the window-ranked kNN formulation") {
    val pts = blobs
    val k = 3
    val a = pts.select(col("id").as("a_id"), col("vec").as("a_v"))
    val b = pts.select(col("id").as("b_id"), col("vec").as("b_v"))
    val win = KnnJoin.knnWindow(a, b, k)
      .filter(col("rnk") === k)
    val d2 = graft.functions.VectorExpressions.squaredL2(
      col("a_v"), col("b_v"))
    val wantMax = win.join(a, "a_id").join(b, col("nbr_id") === col("b_id"))
      .select(round(sqrt(d2) * 1e6).cast("long").as("qd"))
      .agg(max("qd")).collect()(0).getLong(0)
    val gotMax = ClusterEval.kDistProfile(pts, "id", "vec", k)
      .agg(max("max_d_e6")).collect()(0).getLong(0)
    assert(gotMax == wantMax)
  }

  test("kdist: points with fewer than k neighbors are dropped") {
    val tiny = Seq((1L, Seq(0.0f)), (2L, Seq(1.0f)), (3L, Seq(5.0f)))
      .toDF("id", "vec")
    val got = ClusterEval.kDistProfile(tiny, "id", "vec", k = 5)
    assert(got.count() == 0)
  }
}
