package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions.{col, log2}

class LanguageModelSpec extends SparkSpec {

  import spark.implicits._

  /** Brute-force add-one bigram NLL over single-space tokenization. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, Double] = {
    def bigrams(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 2) Seq.empty
      else ws.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap { case (_, t) => bigrams(t) }
    val c2 = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = all.map(_.split(" ", -1)(0)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val v = c2.keys.map(bg => bg.split(" ", -1)(1)).toSet.size
    docs.flatMap { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) None
      else {
        val nll = bs.map { bg =>
          val w1 = bg.split(" ", -1)(0)
          -math.log((c2(bg) + 1.0) / (c1(w1) + v.toDouble)) / math.log(2.0)
        }.sum / bs.size
        Some(id -> math.rint(nll * 1e6) / 1e6)
      }
    }.toMap
  }

  test("matches brute force; repeated bigrams raise likelihood") {
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the cat",   // reuses frequent bigrams
      3L -> "zq xw vy uk",              // all-rare bigrams
      4L -> "single",                   // no bigram -> omitted
      5L -> "the cat sat on the mat")   // duplicate of 1
    val got = LanguageModel
      .bigramNll(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = brute(docs)
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    got.foreach { case (id, nll) =>
      assert(math.abs(nll - want(id)) < 2e-6, s"doc $id: $nll vs ${want(id)}")
    }
    // the all-rare doc must score strictly worse than the common one
    assert(got(3L) > got(1L))
    assert(got(1L) == got(5L))
  }

  test("pmi matches brute force and ranks true collocations highest") {
    // "strong tea" always together (high PMI); "the" pairs with
    // everything (low PMI despite high raw count)
    val docs = Seq(
      1L -> "strong tea is the drink the man likes",
      2L -> "the man brews strong tea in the pot",
      3L -> "strong tea and the pot sit by the man",
      4L -> "the drink in the pot is strong tea")
    val got = LanguageModel.pmi(docs.toDF("doc_id", "text"), "text",
        minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // brute force with the same formula
    val toks = docs.flatMap(_._2.split(" ", -1))
    val w = toks.size.toDouble
    val uc = toks.groupBy(identity).view.mapValues(_.size).toMap
    val bgs = docs.flatMap(_._2.split(" ", -1).sliding(2).map(_.toSeq))
    val n = bgs.size.toDouble
    val bc = bgs.groupBy(identity).view.mapValues(_.size).toMap
    val want = bc.collect { case (Seq(a, b), c) if c >= 2 =>
      val pmi = math.log((c / n) / ((uc(a) / w) * (uc(b) / w))) /
        math.log(2.0)
      (a, b) -> (c.toLong, math.rint(pmi * 1e6) / 1e6)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (c, p)) =>
      assert(c == want(k)._1, s"$k count")
      assert(math.abs(p - want(k)._2) < 2e-6, s"$k pmi $p vs ${want(k)._2}")
    }
    // the dedicated collocation beats the promiscuous function word
    assert(got(("strong", "tea"))._2 > got(("the", "man"))._2)
  }

  test("naiveBayes: separable corpus diagonal; cross-vocab doc routed") {
    // class x speaks {a,b}, class y speaks {c,d}; doc 5 is labeled x
    // but written in y's vocabulary -> predicted y (hand-checked:
    // score(5,y)=-3.97 beats score(5,x)=-5.66 under add-one smoothing)
    val docs = Seq(
      (1L, "x", "a a b"), (2L, "x", "a b"),
      (3L, "y", "c c d"), (4L, "y", "c d d"),
      (5L, "x", "c d")).toDF("doc_id", "lang", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.naiveBayes(df, "doc_id", "text", "lang")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    val got = run(docs)
    assert(got == Map(("x", "x") -> 2L, ("x", "y") -> 1L, ("y", "y") -> 2L))
    assert(run(docs.repartition(7)) == got) // partition invariance
  }

  test("naiveBayes: fused model path == distributed; log2 bit parity") {
    val rnd = new scala.util.Random(31)
    val langs = Seq("aa", "bb", "cc")
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1 to 120).map { i =>
      val words = (0 until 1 + rnd.nextInt(12))
        .map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, langs(rnd.nextInt(3)), words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    def run(thr: Long) =
      LanguageModel.naiveBayes(docs, "doc_id", "text", "lang", thr)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    assert(run(0L) == run(1_000_000L))
    // the driver-built model computes log2 as StrictMath.log(x)/log(2)
    // — it must be BIT-equal to the engine's log2 or the fused path
    // silently drifts (Math.log is an intrinsic that differs by 1 ulp
    // on some inputs; this assertion caught exactly that)
    val xs = (1 to 1000).map(i => i / 7.0)
    val eng = xs.toDF("x").select(log2(col("x")).as("y"))
      .collect().map(_.getDouble(0))
    val drv = xs.map(x => StrictMath.log(x) / StrictMath.log(2.0))
    assert(eng.zip(drv).forall { case (a, b) => a == b })
  }

  test("stupidBackoff walks the full backoff chain with exact scores") {
    // train trigrams: "a b c", "b c a", "c a b", "a b d"; N = 6 tokens
    val train = Seq(0L -> "a b c a b d").toDF("doc_id", "text")
    val docs = Seq(
      1L -> "a b c",   // trigram seen: c3=1 / c2("a b")=2
      2L -> "b c a",   // trigram seen: c3=1 / c2("b c")=1
      3L -> "x b c",   // backoff to bigram "b c": 0.4 * (1 / c1(b)=2)
      4L -> "a b x",   // backoff to unigram, x unseen: 0.16 * (1/6)
      5L -> "a b a",   // unigram "a" seen: 0.16 * (2/6)
      6L -> "a b")     // no trigram -> omitted
      .toDF("doc_id", "text")
    val got = LanguageModel.stupidBackoff(train, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def lg2(x: Double) = StrictMath.log(x) / StrictMath.log(2.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val want = Map(
      1L -> r6(lg2(1.0 / 2.0)),
      2L -> r6(lg2(1.0 / 1.0)),
      3L -> r6(lg2(0.4 * (1.0 / 2.0))),
      4L -> r6(lg2(0.4 * 0.4 * (1.0 / 6.0))),
      5L -> r6(lg2(0.4 * 0.4 * (2.0 / 6.0))))
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id)._1 == 1L)
      assert(math.abs(got(id)._2 - w) < 2e-6,
        s"doc $id: ${got(id)._2} vs $w")
    }
    // seen text scores strictly better than OOV text
    assert(got(1L)._2 > got(4L)._2)
  }

  test("knBigram: hand-checked interpolated Kneser-Ney with OOV floor") {
    // train "a b a c a b": bigram types {a b:2, b a:1, a c:1, c a:1},
    // N1+(..)=4; ctx a: c1ctx=3 n1f=2; cont: a:2, b:1, c:1
    val train = Seq(0L -> "a b a c a b").toDF("doc_id", "text")
    val docs = Seq(
      1L -> "a b",   // seen: (2-.75)/3 + (.75*2/3)*(1/4)
      2L -> "a x",   // seen ctx, unseen cont: (.75*2/3)*(1/4)
      3L -> "x a",   // unseen ctx: pcont(a) = 2/4
      4L -> "x z",   // unseen ctx + cont: floor 1/4
      5L -> "a")     // no bigram -> omitted
      .toDF("doc_id", "text")
    val got = LanguageModel.knBigram(train, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def lg2(x: Double) = StrictMath.log(x) / StrictMath.log(2.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val want = Map(
      1L -> r6(lg2((2.0 - 0.75) / 3.0 + ((0.75 * 2.0) / 3.0) * (1.0 / 4.0))),
      2L -> r6(lg2(((0.75 * 2.0) / 3.0) * (1.0 / 4.0))),
      3L -> r6(lg2(2.0 / 4.0)),
      4L -> r6(lg2(1.0 / 4.0)))
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id)._1 == 1L)
      assert(math.abs(got(id)._2 - w) < 2e-6,
        s"doc $id: ${got(id)._2} vs $w")
    }
    // interpolated KN is a TRUE distribution: P(.|a) sums to 1 over the
    // continuation vocabulary {a, b, c} (the property Stupid Backoff
    // deliberately gives up)
    val probe = Seq(10L -> "a a", 11L -> "a b", 12L -> "a c")
      .toDF("doc_id", "text")
    val ps = LanguageModel.knBigram(train, probe, "doc_id", "text")
      .collect().map(r => math.pow(2.0, r.getDouble(2)))
    assert(math.abs(ps.sum - 1.0) < 1e-5, s"sum=${ps.sum}")
  }

  test("countOfCounts: hand-checked N_r and Good-Turing r*") {
    val docs = Seq(1L -> "a a a b b c", 2L -> "d d e").toDF("doc_id", "text")
    // counts: a=3, d=2, b=2, c=1, e=1 -> N_1=2, N_2=2, N_3=1
    val got = LanguageModel.countOfCounts(docs, "text", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(got == Map(
      1L -> (2L, Some(2.0)),   // r*=2*N_2/N_1 = 2*2/2
      2L -> (2L, Some(1.5)),   // r*=3*N_3/N_2 = 3*1/2
      3L -> (1L, None)))       // N_4 = 0 -> null
    assertThrows[IllegalArgumentException] {
      LanguageModel.countOfCounts(docs, "text", 0)
    }
  }

  test("pmi: bigram-free and empty corpora yield empty results, not NPE") {
    val single = Seq(1L -> "solo", 2L -> "word").toDF("doc_id", "text")
    assert(LanguageModel.pmi(single, "text", 1).count() == 0)
    val empty = spark.createDataFrame(
      Seq.empty[(Long, String)]).toDF("doc_id", "text")
    assert(LanguageModel.pmi(empty, "text", 1).count() == 0)
  }
}
