package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private def one(text: String) =
    spark.createDataFrame(Seq(Tuple1(text))).toDF("text")

  test("shinglesAll keeps every occurrence in order; shingles dedups") {
    val df = one("a b a b a")
    assert(df.select(TextFunctions.shinglesAll(col("text"), 2))
      .head.getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(df.select(TextFunctions.shingles(col("text"), 2))
      .head.getSeq[String](0) == Seq("a b", "b a"))
    // short-doc and null behavior match the distinct kernel
    assert(one("a").select(TextFunctions.shinglesAll(col("text"), 2))
      .head.getSeq[String](0) == Seq.empty)
    assert(one(null).select(TextFunctions.shinglesAll(col("text"), 2))
      .head.isNullAt(0))
  }

  test("langId picks the lexicon with most distinct stopword hits") {
    val cases = Seq(
      "the cat sat of the mat and to in is" -> "en",
      "el la de que y los en un perro" -> "es",
      "der die das und ist von mit den hund" -> "de",
      "le chien et les des est une dans maison" -> "fr",
      "xyzzy plugh quux" -> "und")
    cases.foreach { case (txt, exp) =>
      val got = one(txt).select(TextFunctions.langId(col("text")))
        .collect()(0).getString(0)
      assert(got == exp, s"'$txt' -> got $got want $exp")
    }
  }

  test("piiCount/piiRedact find and mask emails, IPs, phone fragments") {
    val txt = "mail a.b_c%d@host.example.com or x@y.io call 555-1234 " +
      "alt 010-0007 from 10.0.255.3 end"
    val Seq(email, ipv4, phone) = TextFunctions.PiiPatterns.map(_._2)
    val row = one(txt).select(
      TextFunctions.piiCount(col("text"), email).as("e"),
      TextFunctions.piiCount(col("text"), ipv4).as("i"),
      TextFunctions.piiCount(col("text"), phone).as("p"),
      TextFunctions.piiRedact(col("text")).as("r")).collect()(0)
    assert(row.getInt(0) == 2 && row.getInt(1) == 1 && row.getInt(2) == 2)
    assert(row.getString(3) == "mail <EMAIL> or <EMAIL> call <PHONE> " +
      "alt <PHONE> from <IPV4> end")
    // a dotted digit run in an email local part must NOT leak an ipv4
    // hit (redaction order: the email is consumed first), and counts on
    // the raw text agree because the quad needs three digit-dot repeats
    val tricky = one("ping customer.000000123@auto.example.com now")
      .select(TextFunctions.piiCount(col("text"), ipv4).as("i"),
        TextFunctions.piiRedact(col("text")).as("r")).collect()(0)
    assert(tricky.getInt(0) == 0)
    assert(tricky.getString(1) == "ping <EMAIL> now")
    // clean text passes through untouched
    val clean = one("no contact info here")
      .select(TextFunctions.piiRedact(col("text"))).collect()(0)
    assert(clean.getString(0) == "no contact info here")
  }

  test("redact masks blocklisted tokens and counts occurrences") {
    val bl = Seq("secret", "id")
    val row = one("the secret id is secret done")
      .select(TextFunctions.redact(col("text"), bl).as("r"),
        TextFunctions.redactCount(col("text"), bl).as("n"))
      .collect()(0)
    assert(row.getString(0) == "the <MASK> <MASK> is <MASK> done")
    assert(row.getInt(1) == 3)
    // no hits -> text unchanged, zero count
    val clean = one("nothing to see").select(
      TextFunctions.redact(col("text"), bl).as("r"),
      TextFunctions.redactCount(col("text"), bl).as("n")).collect()(0)
    assert(clean.getString(0) == "nothing to see" && clean.getInt(1) == 0)
    // native == declarative, including separator edge cases (trailing /
    // doubled spaces produce empty tokens both must preserve)
    val edges = Seq("a secret  b ", " secret", "", "  ", "secret secret")
    val both = spark.createDataFrame(edges.map(Tuple1(_))).toDF("text")
      .select(
        TextFunctions.redact(col("text"), bl).as("nf"),
        TextFunctions.redactDeclarative(col("text"), bl).as("df"),
        TextFunctions.redactCount(col("text"), bl).as("nc"),
        TextFunctions.redactCountDeclarative(col("text"), bl).as("dc"))
      .collect()
    both.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"native='${r.getString(0)}' declarative='${r.getString(1)}'")
      assert(r.getInt(2) == r.getInt(3))
    }
  }

  test("fingerprintMd5 matches java.security MD5") {
    val txt = "hello graft world"
    val got = one(txt).select(TextFunctions.fingerprintMd5(col("text")))
      .collect()(0).getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == md)
  }

  test("tokens / stopwordHits basics") {
    val df = one("the the quick fox the")
    assert(df.select(size(TextFunctions.tokens(col("text"))))
      .collect()(0).getInt(0) == 5)
    assert(df.select(size(TextFunctions.tokenSet(col("text"))))
      .collect()(0).getInt(0) == 3)
    assert(df.select(TextFunctions.stopwordHits(col("text"), Seq("the", "of")))
      .collect()(0).getInt(0) == 1) // distinct hits
  }

  test("bpeTokens splits letter runs, digit runs, and marks") {
    val got = one("hello world42 a-b!").select(TextFunctions.bpeTokens(col("text")))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("hello", "world", "42", "a", "-", "b", "!"))
  }

  test("winnowing: shared substring of length >= k+w-1 shares a fingerprint") {
    import graft.functions.WinnowingExpression.winnow
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = spark.createDataFrame(Seq(
      (1L, base),
      (2L, "PREFIX " + base + " SUFFIX"), // contains base verbatim
      (3L, "completely different content with no overlap whatsoever here")))
      .toDF("id", "text")
    val fps = df.select(col("id"), winnow(col("text"), 5, 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)   // guarantee from the paper
    assert((fps(1L) & fps(3L)).isEmpty)    // disjoint texts -> no overlap
    // deterministic + short-input safety
    val again = df.select(col("id"), winnow(col("text"), 5, 4))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(again == fps)
    val tiny = one("ab").select(winnow(col("text"), 5, 4))
      .collect()(0).getSeq[Long](0)
    assert(tiny.isEmpty)
  }

  test("winnowing hashes codepoints, not UTF-16 units (non-BMP safe)") {
    import graft.functions.WinnowingExpression.winnow
    // 😀 is a surrogate pair: 5 codepoints here but 8 UTF-16 units. With
    // k=5, w=2 a codepoint implementation sees exactly ONE 5-gram (one
    // fingerprint); a code-unit one would see 4 k-grams and (k >= 5)
    // admit "ab😀" (5 units, 3 codepoints) too — DuckDB's ord()/len()
    // oracle counts codepoints.
    val df = spark.createDataFrame(Seq(
        (1L, "😀😀😀ab"), (2L, "ab😀")))
      .toDF("id", "text")
    val fps = df.select(col("id"), winnow(col("text"), 5, 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L).length == 1, s"expected one fingerprint, got ${fps(1L)}")
    assert(fps(2L).isEmpty, "3-codepoint text must fail the k=5 gate")
  }

  test("fingerprint64 is deterministic and spreads") {
    val df = spark.createDataFrame(
      (1 to 100).map(i => Tuple1(s"doc number $i"))).toDF("text")
    val fps = df.select(TextFunctions.fingerprint64(col("text")))
      .collect().map(_.getLong(0))
    assert(fps.distinct.length == 100)
    val again = df.select(TextFunctions.fingerprint64(col("text")))
      .collect().map(_.getLong(0))
    assert(fps.sameElements(again))
  }

  test("cdcBoundaries: brute KR match, edit locality, short-doc empty") {
    import graft.functions.WinnowingExpression.cdcBoundaries
    val spark2 = spark
    import spark2.implicits._
    def cuts(text: String, k: Int, m: Int): Seq[Long] =
      Seq(Tuple1(text)).toDF("text")
        .select(cdcBoundaries(col("text"), k, m)).head.getSeq[Long](0)
    // brute-force KR over codepoints must agree position for position
    def brute(text: String, k: Int, m: Int): Seq[Long] = {
      val cps = text.codePoints().toArray
      val M = (1L << 31) - 1
      (0 to cps.length - k).flatMap { i =>
        val h = (i until i + k).foldLeft(0L)((a, j) => (a * 131 + cps(j)) % M)
        if (h % m == 0 && i + k < cps.length) Some((i + k).toLong) else None
      }
    }
    val rnd = new scala.util.Random(5)
    val doc = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (m <- Seq(16, 64)) assert(cuts(doc, 8, m) == brute(doc, 8, m))
    // EDIT LOCALITY — the reason CDC exists: chunk the doc, insert one
    // char near the front, re-chunk; every chunk after the edited one
    // is content-identical (fixed-stride chunking would shift them all)
    def chunkSet(text: String): Seq[String] = {
      val cs = cuts(text, 8, 16) :+ text.length.toLong
      cs.foldLeft((1L, Seq.empty[String])) { case ((start, acc), cut) =>
        (cut + 1, acc :+ text.substring(start.toInt - 1, cut.toInt))
      }._2
    }
    val before = chunkSet(doc)
    val after = chunkSet(doc.substring(0, 5) + "X" + doc.substring(5))
    assert(before.length >= 5, s"fixture too few chunks: ${before.length}")
    // all but the first O(1) chunks survive the edit verbatim
    assert(before.drop(2) == after.drop(after.length - (before.length - 2)))
    // shorter than k: no boundaries, never a crash
    assert(cuts("tiny", 8, 4).isEmpty)
  }

  test("hashedTf: native kernel == the declarative portableHash60 " +
      "bucket counts; empty/trailing-token and null contracts hold") {
    import graft.functions.TextExpressions
    val dims = 8
    val docs = spark.createDataFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a a a b"),
      (3L, ""),            // ONE empty token -> a single 1.0 bucket
      (4L, "x y z "),      // trailing empty token counts (limit -1)
      (5L, "solo"))).toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
        TextExpressions.hashedTf(col("text"), dims).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // declarative twin: explode tokens, bucket by the COLUMN-level
    // portable hash (the documented DuckDB bridge), count, divide —
    // the cross-check that the native md5 path IS portableHash60
    val twin = docs
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .groupBy(col("doc_id"),
        pmod(TextFunctions.portableHash60(col("w")), lit(dims)).as("b"))
      .count()
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("count"))))
        .as("m"), sum("count").as("tot"))
      .collect().map { r =>
        val m = r.getMap[Long, Long](1)
        val tot = r.getLong(2)
        r.getLong(0) -> (0 until dims).map(d =>
          (m.getOrElse(d.toLong, 0L).toDouble / tot).toFloat)
      }.toMap
    assert(native.keySet == twin.keySet)
    native.foreach { case (id, v) =>
      assert(v.length == dims, s"doc $id dims")
      assert(v == twin(id), s"doc $id native vs declarative")
    }
    // every doc's values sum to ~1 (counts/total is a distribution)
    native.values.foreach(v =>
      assert(math.abs(v.map(_.toDouble).sum - 1.0) < 1e-6))
    // "" has exactly one token -> one bucket holds 1.0
    assert(native(3L).count(_ == 1.0f) == 1 &&
      native(3L).count(_ == 0.0f) == dims - 1)
    // null text -> null embedding (UnaryExpression null propagation)
    val n = spark.createDataFrame(Seq(Tuple1(Option.empty[String])))
      .toDF("text")
      .select(TextExpressions.hashedTf(col("text"), dims)).head
    assert(n.isNullAt(0))
  }
}
