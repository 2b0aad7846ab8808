package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def learn(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] =
    Bpe.learnMerges(
      spark.createDataFrame(texts.map(Tuple1(_))).toDF("text")
        .repartition(3),
      "text", k)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("hand corpus: merges follow weighted pair frequency with tie-break") {
    // "low" x3, "lower" x2, "newest" x1 (word frequencies via repetition)
    val texts = Seq("low low lower", "low lower newest")
    val got = learn(texts, 3)
    // pair counts round 1: (l,o)=5, (o,w)=5, (w,e)=3, (e,r)=2, (e,w)=1,
    // (n,e)=1, (e,s)=1, (s,t)=1 — tie (l,o) vs (o,w) breaks to (l,o)
    assert(got(0) == (1, "l", "o", 5L))
    // after merge: lo w | lo w e r | n e w e s t → (lo,w)=5 wins
    assert(got(1) == (2, "lo", "w", 5L))
    // then "low" is one symbol: (low,e)=2, (e,r)=2, ... tie breaks to
    // (e,r) by lhs ("e" < "low")
    assert(got(2) == (3, "e", "r", 2L))
  }

  test("early stop when no pairs remain; single-char words contribute none") {
    val got = learn(Seq("a b a b ab"), 10)
    // only "ab" has an adjacent pair; after merging it nothing remains
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("same-pair runs merge through the triple replace scan") {
    val got = learn(Seq("aaaa aaaa"), 2)
    // round 1: (a,a) freq 2*3=6; the scan pairs each word fully: aa aa
    assert(got(0) == (1, "a", "a", 6L))
    // round 2: (aa,aa) freq 2
    assert(got(1) == (2, "aa", "aa", 2L))
  }

  test("tokenCounts compresses with the learned merges") {
    val texts = Seq("low low lower", "low lower newest")
    val merges = learn(texts, 3).map(m => (m._2, m._3))
    val got = Bpe.tokenCounts(
      spark.createDataFrame(texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t) }).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 0: low(1 tok) low(1) lower(3: low e r→ low er? no — merges are
    // (l,o),(lo,w),(e,r): lower → lo w e r → low e r → low er ⇒ 2 toks)
    assert(got(0L) == (3L, 1L + 1L + 2L))
    // doc 1: low=1, lower=2, newest: n e w e s t (no merges apply except
    // (e,r)? none adjacent) ⇒ 6 toks
    assert(got(1L) == (3L, 1L + 2L + 6L))
  }

  test("fused local path == distributed loop, bit for bit") {
    val texts = (1 to 80).map(i =>
      s"lower lowest newer newest wider widest w$i x${i % 7}")
    def learnT(threshold: Long) = Bpe.learnMerges(
      spark.createDataFrame(texts.map(Tuple1(_))).toDF("text")
        .repartition(7),
      "text", 6, localThreshold = threshold)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val local = learnT(1000000L)
    val dist = learnT(0L) // forces the distributed per-round loop
    assert(local == dist)
    assert(local.size == 6)
  }

  test("partition-count invariance") {
    val texts = (1 to 50).map(i => s"alpha beta gamma delta epsilon w$i")
    val a = learn(texts, 5)
    val b = Bpe.learnMerges(
      spark.createDataFrame(texts.map(Tuple1(_))).toDF("text")
        .repartition(13),
      "text", 5)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(a == b)
  }
}
