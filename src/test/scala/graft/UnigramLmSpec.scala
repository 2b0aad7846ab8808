package graft

import graft.operators.UnigramLm
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer learning: hand-checked seed/EM/prune/Viterbi
  * behavior on corpora small enough to segment by hand. */
class UnigramLmSpec extends SparkSpec {

  private def docs(texts: String*) = {
    val spark2 = spark
    import spark2.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def segOf(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (w, ps) => w -> ps.sortBy(_._2).map(_._3).toSeq }

  test("wordFreqs counts occurrences, drops empty tokens") {
    val wf = UnigramLm.wordFreqs(docs("ab ab ba", "ab  ba"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wf == Map("ab" -> 3L, "ba" -> 2L))
  }

  test("seedVocab: all substring occurrences weighted by word freq; " +
      "minCount floor spares single chars") {
    val words = UnigramLm.wordFreqs(docs("aab aab ab"), "text")
    val seed = UnigramLm.seedVocab(words, maxPieceLen = 3, minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aab"×2: a@0, a@1, b@2, aa, ab, aab; "ab"×1: a, b, ab
    // counts: a = 2·2+1 = 5, b = 2+1 = 3, aa = 2, ab = 2+1 = 3, aab = 2
    assert(seed == Map("a" -> 5L, "b" -> 3L, "aa" -> 2L, "ab" -> 3L,
      "aab" -> 2L))
    // with minCount = 3, aa and aab fall out, single chars survive
    val floored = UnigramLm.seedVocab(words, 3, 3)
      .collect().map(_.getString(0)).toSet
    assert(floored == Set("a", "b", "ab"))
  }

  test("viterbi: max total score wins; ties prefer the smallest split") {
    val spark2 = spark
    import spark2.implicits._
    val words = Seq(("abab", 1L)).toDF("word", "wf")
    // "ab" scores high: abab -> ab|ab beats a|b|a|b and aba|b
    val v1 = Seq(("a", -10L), ("b", -10L), ("ab", -3L)).toDF("piece", "sq")
    assert(segOf(UnigramLm.viterbi(words, v1, 4).collect())("abab") ==
      Seq("ab", "ab"))
    // exact tie between ab|ab and abab (both -6): at the final position
    // the smallest split point (0, i.e. the WHOLE word) must win
    val v2 = Seq(("a", -100L), ("b", -100L), ("ab", -3L), ("abab", -6L))
      .toDF("piece", "sq")
    assert(segOf(UnigramLm.viterbi(words, v2, 4).collect())("abab") ==
      Seq("abab"))
    // a vocab missing a corpus char fails loudly, not silently
    val bad = Seq(("a", -1L)).toDF("piece", "sq")
    val e = intercept[Exception] {
      UnigramLm.viterbi(words, bad, 4).collect()
    }
    assert(e.getMessage.contains("unsegmentable"), e.getMessage)
  }

  test("emRound: usage M-step, +1 single-char smoothing, top-K prune " +
      "with (cnt desc, piece asc) ties") {
    val spark2 = spark
    import spark2.implicits._
    val words = UnigramLm.wordFreqs(docs("abab abab cd"), "text")
    val seed = UnigramLm.seedVocab(words, 2, 1)
    val v1 = UnigramLm.emRound(words, seed, 2, vocabK = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // seed counts: ab=4(2 per word ×2), ba=2, cd=1, a=4, b=4, c=1, d=1
    // → "ab" outscores per-char splits, "cd" outscores c|d (one piece
    // beats two: each piece pays the ln-N normalizer) → usage:
    // ab: 2·2 = 4 uses? no — abab segments as ab|ab: 2 uses × wf 2 = 4;
    // cd: 1. vocabK=1 keeps only "ab" among multi-char; singles get
    // usage 0 + 1 = 1 each
    assert(v1 == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 4L))
    // prune tie: two multi-char pieces with equal usage — piece asc wins
    val words2 = UnigramLm.wordFreqs(docs("xy zw xy zw"), "text")
    val v2 = UnigramLm.emRound(words2, UnigramLm.seedVocab(words2, 2, 1),
      2, vocabK = 1).collect().map(_.getString(0)).toSet
    assert(v2.contains("xy") && !v2.contains("zw"),
      s"tie must keep the lexicographically smaller piece: $v2")
  }

  test("learn is partitioning-invariant and tokenize round-trips words") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val v1 = UnigramLm.learn(d, "text", 4, 2, 24, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val v2 = UnigramLm.learn(d.repartition(13), "text", 4, 2, 24, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(v1 == v2 && v1.nonEmpty)
    // tokenization reassembles every word exactly (offsets + pieces)
    val vocab = UnigramLm.learn(d, "text", 4, 2, 24, 2)
    val toks = UnigramLm.tokenize(d, "text", vocab, 4).collect()
    segOf(toks).foreach { case (w, pieces) =>
      assert(pieces.mkString("") == w, s"pieces of '$w' were $pieces")
    }
    // multi-char pieces actually formed (the point of the exercise)
    assert(toks.exists(_.getString(2).length > 1),
      "EM learned no multi-char pieces on a 31-word corpus")
  }
}
