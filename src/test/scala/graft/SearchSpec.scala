package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  // 3-doc corpus with hand-checkable tf/df/dl:
  //   d1: "a b a c"   (dl 4, tf_a=2, tf_b=1)
  //   d2: "b b d"     (dl 3, tf_b=2)
  //   d3: "c c c d"   (dl 4, no query terms)
  private def corpus = spark.createDataFrame(Seq(
    (1L, "a b a c"), (2L, "b b d"), (3L, "c c c d")))
    .toDF("doc_id", "text")

  test("bm25: hand-computed scores, non-matching doc excluded") {
    val got = Search.bm25(corpus, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    // N=3, sumdl=11, avgdl=11/3; idf_a = ln(1+(3-1+0.5)/1.5),
    // idf_b = ln(1+(3-2+0.5)/2.5)
    val n = 3.0; val avg = 11.0 / 3.0
    def sat(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avg)))
    val idfA = math.log(1 + 2.5 / 1.5); val idfB = math.log(1 + 1.5 / 2.5)
    val exp1 = BigDecimal(idfA * sat(2, 4) + idfB * sat(1, 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val exp2 = BigDecimal(idfB * sat(2, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    assert(got.map(_._1) == Seq(1L, 2L)) // d3 matches nothing
    assert(got.map(_._2) == Seq(2L, 1L)) // matched-term counts
    assert(math.abs(got(0)._3 - exp1) < 2e-6)
    assert(math.abs(got(1)._3 - exp2) < 2e-6)
  }

  test("bm25: rare term outscores common term at equal tf") {
    // 'r' appears in 1 of 4 docs, 'c' in all 4 — same tf in the probe doc
    val df = spark.createDataFrame(Seq(
      (1L, "r c"), (2L, "c x"), (3L, "c x"), (4L, "c x")))
      .toDF("doc_id", "text")
    val m = Search.bm25(df, "doc_id", "text", Seq("r", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(m(1L)._1 == 2 && m(2L)._1 == 1)
    // doc 1's extra score comes from the high-idf rare term
    assert(m(1L)._2 > 2 * m(2L)._2)
  }

  test("bm25TopK: ordered by score desc then id, limited") {
    val df = spark.createDataFrame(Seq(
      (10L, "a a a"), (2L, "a b"), (7L, "a b"), (5L, "x y")))
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(df, "doc_id", "text", Seq("a", "b"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    // docs 2 and 7 tie exactly (same tf vector, same dl) — id breaks it;
    // both beat doc 10 (which matches only 'a', and 'a' has df=3 ⇒ low idf)
    assert(got == Seq(2L, 7L))
  }

  test("bm25: partitioning-invariant") {
    val a = Search.bm25(corpus.repartition(7), "doc_id", "text",
      Seq("a", "b", "d")).collect().map(_.toSeq).toSet
    val b = Search.bm25(corpus.coalesce(1), "doc_id", "text",
      Seq("a", "b", "d")).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("moreLikeThis: identical twin ranks first with cosine 1") {
    val df = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "alpha delta"), (3L, "zeta eta theta")))
      .toDF("doc_id", "text")
    val got = Search.moreLikeThis(df, "doc_id", "text",
        d => d === 0, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.head == ((1L, 1.0, 1)))
    assert(!got.map(_._1).contains(0L)) // self excluded
  }

  test("moreLikeThis == brute-force tf-idf cosine top-k") {
    val rnd = new scala.util.Random(83)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0L until 30L).map(i =>
      i -> (1 to 3 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(8))))
    val df = spark.createDataFrame(
        docs.map { case (i, ws) => (i, ws.mkString(" ")) })
      .toDF("doc_id", "text").repartition(5)
    val k = 4
    val got = Search.moreLikeThis(df, "doc_id", "text",
        d => pmod(d, lit(10)) === 0, k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // brute force with the same weight formula and rounding
    val n = docs.size
    val tf = docs.map { case (i, ws) =>
      i -> ws.groupBy(identity).map { case (w, o) => w -> o.size } }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size }
    def wv(i: Long): Map[String, Double] = tf(i).map { case (t, f) =>
      t -> f * math.log((n + 1.0) / (dfreq(t) + 1.0)) }
    def nrm(v: Map[String, Double]) =
      math.sqrt(v.values.map(x => x * x).sum)
    val want = (for {
      q <- docs.map(_._1) if q % 10 == 0 && nrm(wv(q)) > 0
      cands = docs.map(_._1)
        .filter(d => d != q && nrm(wv(d)) > 0 &&
          wv(d).keySet.intersect(wv(q).keySet).nonEmpty)
        .map { d =>
          val (a, b) = (wv(q), wv(d))
          val dot = a.keys.toSeq.intersect(b.keys.toSeq)
            .map(t => a(t) * b(t)).sum
          d -> BigDecimal(dot / (nrm(a) * nrm(b)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        .sortBy { case (d, s) => (-s, d) }.take(k)
      ((d, s), r) <- cands.zipWithIndex
    } yield (q, r + 1) -> ((d, s))).toMap
    assert(got == want)
  }

  test("rrfFuse: hand-computed fusion, absent ids score one-sided") {
    import spark.implicits._
    val l1 = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rnk")
    val l2 = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rnk")
    val got = Search.rrfFuse(Seq(l1, l2), "doc_id", "rnk",
        kRrf = 10, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // id2: 1/12 + 1/11 = .174242; id1: 1/11 = .090909; id4: 1/12
    assert(got.toSeq == Seq(
      (2L, 0.174242, 2L), (1L, 0.090909, 1L), (4L, 0.083333, 1L)))
  }

  test("rrfFuse: a list's order is all that matters, not its scores") {
    import spark.implicits._
    // same ranking expressed twice fuses to exactly double
    val l = Seq((5L, 1), (6L, 2), (7L, 3)).toDF("doc_id", "rnk")
    val one = Search.rrfFuse(Seq(l), "doc_id", "rnk", 60, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = Search.rrfFuse(Seq(l, l), "doc_id", "rnk", 60, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one.keySet == Set(5L, 6L, 7L))
    one.foreach { case (id, s) =>
      assert(math.abs(two(id) - 2 * s) < 2e-6)
    }
  }

  test("dirichletQl: hand-computed scores, non-matching doc excluded") {
    val mu = 5.0
    val got = Search.dirichletQl(corpus, "doc_id", "text",
        Seq("a", "b"), mu)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    // ct=11; cf_a=2, cf_b=3; the absent-term mass folds into the
    // per-doc normalizer |q|·log2(μ/(dl+μ))
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val exp1 = lg2(1 + 2 / (mu * 2 / 11)) + lg2(1 + 1 / (mu * 3 / 11)) +
      2 * lg2(mu / (4 + mu))
    val exp2 = lg2(1 + 2 / (mu * 3 / 11)) + 2 * lg2(mu / (3 + mu))
    assert(got.map(_._1) == Seq(1L, 2L)) // d3 matches nothing
    assert(got.map(_._2) == Seq(2L, 1L))
    assert(math.abs(got(0)._3 - exp1) < 2e-6)
    assert(math.abs(got(1)._3 - exp2) < 2e-6)
    // a longer doc with the same matched counts scores lower (length
    // normalization): d1 vs a hypothetical shorter doc is covered by
    // the formula; here just check the ordering is score-desc sane
    assert(got(0)._3 > got(1)._3)
  }
}
