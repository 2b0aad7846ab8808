package graft

import graft.operators.SubstringDedup
import org.apache.spark.sql.functions._

/** ExactSubstr spans against a brute-force in-memory oracle: enumerate
  * every L-char window, count content multiplicity corpus-wide, merge
  * consecutive duplicated starts, union char intervals. Exercises the
  * cases the fixture may not: same-doc repeats, spans overlapping by
  * < L chars, docs shorter than L, a doc that is one giant dup. */
class SubstringDedupSpec extends SparkSpec {

  private val L = 8
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    // shares a long run with doc 1 -> cross-doc span
    2L -> "xx the quick brown fox sleeps",
    // internal repeat: same 12-char phrase twice in ONE doc
    3L -> "abcdefghijkl....abcdefghijkl",
    // entirely duplicated: exact copy of doc 2
    4L -> "xx the quick brown fox sleeps",
    // shorter than L: must be ignored, not crash
    5L -> "tiny",
    // no duplicated window anywhere
    6L -> "zzzz unique content 0123456789 qqqq")

  private def bruteSpans: Map[Long, Set[(Long, Long, Long)]] = {
    val wins = corpus.flatMap { case (id, t) =>
      (0 to t.length - L).map(p => (id, p + 1L, t.substring(p, p + L)))
    }
    val mult = wins.groupBy(_._3).map { case (w, g) => w -> g.size }
    val dup = wins.filter(w => mult(w._3) > 1)
    dup.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      // merge consecutive starts into runs
      val runs = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, n) :: rest, p) if p == e + 1 => (s, p, n + 1) :: rest
        case (acc, p) => (p, p, 1L) :: acc
      }
      id -> runs.map { case (s, e, n) => (s, e - s + L, n) }.toSet
    }
  }

  test("duplicatedSpans == brute-force oracle (same-doc repeats, " +
      "full-doc dups, short docs)") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
      .repartition(4)
    val got = SubstringDedup.duplicatedSpans(df, "doc_id", "text", L)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      }
    val exp = bruteSpans
    assert(got == exp, s"got=$got\nexp=$exp")
    // the planted cases actually fire
    assert(exp.contains(3L), "same-doc repeat must produce spans")
    assert(exp(2L) == exp(4L), "identical docs must get identical spans")
    assert(!exp.contains(5L) && !exp.contains(6L))
  }

  test("anchored variant: exact spans on long regions, containment, " +
      "stride-fold shuffle reduction") {
    // pseudo-random non-repeating text so planted blocks are the ONLY
    // duplicated content
    def junk(seed: Long, n: Int): String = {
      val sb = new StringBuilder
      var z = seed
      (0 until n).foreach { _ =>
        z = z * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((z >>> 33) % 26)).toChar
      }
      sb.toString
    }
    val block = junk(99L, 400) // long shared region: R = 393 windows at
    val corpus2 = Seq(         // L=8 -> P(miss) = (3/4)^393 ~ 0
      10L -> (junk(1L, 80) + block + junk(2L, 60)),
      11L -> (junk(3L, 50) + block + junk(4L, 90)),
      12L -> junk(5L, 300)) // no dups
    val df = spark.createDataFrame(corpus2).toDF("doc_id", "text")
      .repartition(4)
    def spans(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    val full = spans(SubstringDedup.duplicatedSpans(df, "doc_id", "text", L))
    val anch = spans(SubstringDedup.duplicatedSpansAnchored(
      df, "doc_id", "text", L, stride = 4))
    // long-region case: detection certain, boundaries exact
    assert(anch == full, s"anchored=$anch\nfull=$full")
    // the planted 400-char block merges to one span: 393 window starts
    // + (L-1) trailing chars = 400
    assert(full.exists(_._3 == 400L))
    // containment contract on the mixed small corpus (regions at the
    // bare-L floor MAY be missed, must never be invented or extended)
    val df1 = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val f1 = spans(SubstringDedup.duplicatedSpans(df1, "doc_id", "text", L))
    val a1 = spans(SubstringDedup.duplicatedSpansAnchored(
      df1, "doc_id", "text", L, stride = 4))
    a1.foreach { case (id, s, len, _) =>
      assert(f1.exists { case (id2, s2, len2, _) =>
        id2 == id && s2 <= s && s + len <= s2 + len2
      }, s"anchored span ($id,$s,$len) not inside any stride-1 span")
    }
    // the multiplicity shuffle really shrinks ~stride-fold: recompute
    // the window/anchor streams the operator builds
    val wins = df.filter(length(col("text")) >= L)
      .select(explode(sequence(lit(1), length(col("text")) - lit(L - 1)))
        .as("pos"), col("text"))
      .select(xxhash64(expr(s"substring(text, pos, $L)")).as("h1"))
    val nWin = wins.count()
    val nAnchor = wins.filter(pmod(col("h1"), lit(4L)) === 0).count()
    assert(nAnchor * 2 < nWin && nWin < nAnchor * 8,
      s"anchor sampling off: $nAnchor of $nWin windows at stride 4")
  }

  test("cutDuplicates == brute splice; full-copy docs come back empty") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
      .repartition(4)
    val got = SubstringDedup.cutDuplicates(df, "doc_id", "text", L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    // brute: remove the union of [p, p+L) over duplicated starts p
    val wins = corpus.flatMap { case (id, t) =>
      (0 to t.length - L).map(p => (id, p, t.substring(p, p + L)))
    }
    val mult = wins.groupBy(_._3).map { case (w, g) => w -> g.size }
    corpus.foreach { case (id, t) =>
      val cutIdx = wins.filter(w => w._1 == id && mult(w._3) > 1)
        .flatMap(w => w._2 until (w._2 + L)).toSet
      val expect = t.zipWithIndex.collect {
        case (c, i) if !cutIdx.contains(i) => c
      }.mkString
      val (nc, nk, cut) = got(id)
      assert(nc == t.length.toLong && cut == expect && nk == expect.length,
        s"doc $id: got '$cut' expect '$expect'")
    }
    // the planted invariants actually fired
    assert(got(4L)._3.isEmpty, "full-copy doc must cut to empty")
    assert(got(5L)._3 == "tiny" && got(6L)._2 == got(6L)._1)
  }

  test("cutDuplicatesAnchored == stride-1 cut on long regions; " +
      "never over-cuts on the floor corpus") {
    def junk(seed: Long, n: Int): String = {
      val sb = new StringBuilder
      var z = seed
      (0 until n).foreach { _ =>
        z = z * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + ((z >>> 33) % 26)).toChar
      }
      sb.toString
    }
    // long planted blocks: anchored detection is certain, boundaries
    // exact -> the cleaned corpus must equal the stride-1 cut verbatim
    val block = junk(99L, 400)
    val corpus2 = Seq(
      10L -> (junk(1L, 80) + block + junk(2L, 60)),
      11L -> (junk(3L, 50) + block + junk(4L, 90)),
      12L -> junk(5L, 300))
    val df = spark.createDataFrame(corpus2).toDF("doc_id", "text")
      .repartition(4)
    def cuts(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => x.getLong(0) -> x.getString(3)).toMap
    val full = cuts(SubstringDedup.cutDuplicates(df, "doc_id", "text", L))
    val anch = cuts(SubstringDedup.cutDuplicatesAnchored(
      df, "doc_id", "text", L, stride = 4))
    assert(anch == full, "anchored cut must equal stride-1 on long regions")
    // floor corpus (regions at bare L): recall may drop, but every
    // anchored-cut doc is the stride-1 cut WITH SOME SPANS RESTORED —
    // i.e. anchored text is a supersequence: same doc, never cuts a
    // char the stride-1 pass kept
    val df1 = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val f1 = cuts(SubstringDedup.cutDuplicates(df1, "doc_id", "text", L))
    val a1 = cuts(SubstringDedup.cutDuplicatesAnchored(
      df1, "doc_id", "text", L, stride = 4))
    def isSubsequence(small: String, big: String): Boolean = {
      var i = 0
      big.foreach { c => if (i < small.length && small(i) == c) i += 1 }
      i == small.length
    }
    a1.foreach { case (id, txt) =>
      assert(isSubsequence(f1(id), txt),
        s"doc $id: anchored cut removed chars stride-1 kept")
    }
  }

  test("duplicatedCharStats unions overlapping span intervals exactly") {
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val got = SubstringDedup.duplicatedCharStats(df, "doc_id", "text", L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute: union of [p, p+L-1] for every duplicated start p
    val exp = bruteSpans.map { case (id, spans) =>
      val chars = spans.flatMap { case (s, len, _) => s until (s + len) }
      id -> ((corpus.find(_._1 == id).get._2.length.toLong,
        chars.size.toLong))
    }
    assert(got == exp, s"got=$got\nexp=$exp")
    // doc 4 is a verbatim copy of doc 2: every char duplicated
    assert(got(4L)._1 == got(4L)._2, "full-copy doc must be 100% covered")
  }
}
