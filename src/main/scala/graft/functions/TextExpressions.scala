package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass word-n-gram shingling.
  *
  * The declarative formulation (split → transform(sequence(...)) →
  * concat_ws → array_distinct) is correct but slow: Spark's higher-order
  * functions are evaluated with interpreted lambdas (no whole-stage
  * codegen), costing ~25 µs/document. This expression does the same work
  * in one Scala pass (~1 µs/document): split on single space, slide an
  * n-window, dedup preserving first-occurrence order.
  *
  * Semantics contract (must stay aligned with the DuckDB oracle
  * formulation in SparkEntry.jaccardOracle): tokens = single-space split;
  * shingle = tokens joined by one space; docs with < n tokens → empty
  * array; result distinct (first-occurrence order) unless
  * `distinct = false` (every occurrence, document order — frequency
  * consumers like heavy hitters need the multiset).
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1 keeps trailing empty tokens, matching Spark's split(col, " ",
    // -1) and DuckDB's string_split on trailing-separator inputs
    val toks = text.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](m * 2)
      else new java.util.ArrayList[String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** Native single-pass blocklist token masking (see
  * [[TextFunctions.redactDeclarative]] for the interpreted-HOF twin the
  * specs cross-check against). Semantics contract, aligned with the
  * DuckDB oracle: tokens = single-space split keeping trailing empties;
  * every token equal to a blocklist entry becomes `mask`; tokens rejoin
  * with one space. */
case class RedactTokens(child: Expression, blocklist: Seq[String],
    mask: String) extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType

  @transient private lazy val banned: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](blocklist.size * 2)
    blocklist.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val sb = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(' ')
      sb.append(if (banned.contains(toks(i))) mask else toks(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "redact_tokens"
}

/** Occurrence count of blocklisted tokens — the single-pass twin of
  * [[RedactTokens]] for masking-rate stats without building the masked
  * string. */
case class RedactCount(child: Expression, blocklist: Seq[String])
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val banned: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](blocklist.size * 2)
    blocklist.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    var i = 0
    var c = 0
    while (i < toks.length) {
      if (banned.contains(toks(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "redact_count"
}

/** Single-pass multi-pattern substring matching — an Aho–Corasick
  * automaton over the pattern list, evaluated once per document. The
  * scalable form of phrase blocklist filtering (C4/RefinedWeb "bad
  * words" lists run to thousands of multi-word phrases): one O(|text| +
  * matches) scan regardless of pattern count, where the regex-union
  * alternative re-scans per pattern and a token-set lookup
  * ([[RedactCount]]) cannot see multi-word or mid-token phrases.
  *
  * Returns one Int per pattern (input order): the count of
  * NON-OVERLAPPING occurrences, greedy left-to-right — `replace()`
  * counting semantics, chosen so a SQL oracle can reproduce the numbers
  * exactly for ANY pattern (all-occurrence counting diverges from
  * `replace` whenever a pattern can overlap itself). Patterns count
  * independently: "scan" still matches inside a "scan slow" match.
  *
  * The automaton builds lazily per executor from the pattern list the
  * expression carries (patterns are plan metadata, broadcast with the
  * serialized plan — no driver-side state, no UDF registry).
  */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  /** goto/fail/output tables, built once per deserialized expression.
    * Nodes are dense ints; goto is a per-node char map (patterns are
    * short ASCII-ish phrases — a HashMap per node beats a 64k array). */
  @transient private lazy val automaton: (Array[java.util.HashMap[Character, Integer]], Array[Int], Array[Array[Int]]) = {
    val goto = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val out = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        val next = goto(node).get(ch)
        node = if (next != null) next.intValue()
        else {
          goto += new java.util.HashMap[Character, Integer]()
          out += Array.empty[Int]
          goto(node).put(ch, goto.size - 1)
          goto.size - 1
        }
      }
      out(node) = out(node) :+ pi
    }
    val fail = new Array[Int](goto.size)
    val queue = new java.util.ArrayDeque[Integer]()
    goto(0).forEach((_, v) => queue.add(v))
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      goto(u).forEach { (ch, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && !goto(f).containsKey(ch)) f = fail(f)
        val fNext = goto(f).get(ch)
        fail(v) = if (fNext != null && fNext != v) fNext.intValue() else 0
        // output link: matches ending at fail(v) also end at v
        if (out(fail(v)).nonEmpty) out(v) = out(v) ++ out(fail(v))
      }
    }
    (goto.toArray, fail, out.toArray)
  }

  @transient private lazy val patLen: Array[Int] = patterns.map(_.length).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val (goto, fail, out) = automaton
    val text = input.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](patterns.size)
    // per-pattern last accepted match END (exclusive), for the greedy
    // non-overlap rule: accept a match starting at or after it
    val lastEnd = new Array[Int](patterns.size)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !goto(node).containsKey(ch)) node = fail(node)
      val next = goto(node).get(ch)
      node = if (next != null) next.intValue() else 0
      val hits = out(node)
      var h = 0
      while (h < hits.length) {
        val pi = hits(h)
        val start = i + 1 - patLen(pi)
        if (start >= lastEnd(pi)) {
          counts(pi) += 1
          lastEnd(pi) = i + 1
        }
        h += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "multi_match_counts"
}

/** Native single-pass hashed-TF text embedding — the REAL content
  * embedding for the text modality (the round-11 counterpart of
  * `Multimodal.imageEmbedding` for images): tokens = single-space
  * split keeping trailing empties (the corpus-wide convention, ==
  * DuckDB `string_split(text, ' ')`), each token hashed to a bucket by
  * the portable md5 bridge (first 15 hex chars as a 60-bit integer,
  * mod `dims` — `TextFunctions.portableHash60`'s exact value), and
  * dim d = bucketCount(d) / nTokens as one exact double division
  * narrowed to float (== `CAST(<double> AS REAL)`). Every value is
  * therefore bit-reproducible in SQL from token-level CTEs, so the
  * ANN/dedup stack runs on REAL text content under the same
  * hash-equality gate as everything else.
  *
  * One Scala pass per document (the Shingles discipline — Spark HOFs
  * would run interpreted); md5 per token is the portability cost and
  * stays ~0.5 µs/token. */
case class HashedTf(child: Expression, dims: Int)
    extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {
  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1 keeps trailing empties — "" has ONE (empty) token, so
    // nTokens >= 1 always and the division below never sees 0
    val toks = text.split(" ", -1)
    val counts = new Array[Long](dims)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars of the digest = top 7.5 bytes big-endian —
      // the same 60-bit value as conv(substr(md5(t),1,15),16,10);
      // 60 bits is non-negative in a long, so % stays non-negative
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >> 4)
      counts((v % dims).toInt) += 1
      i += 1
    }
    val out = new Array[Any](dims)
    var j = 0
    while (j < dims) {
      // divide in double then narrow — matches CAST(<double> AS REAL)
      out(j) = (counts(j).toDouble / toks.length).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hashed_tf"
}

object TextExpressions {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  def shingles(text: Column, n: Int): Column =
    column(Shingles(expression(text), n))
  def shinglesAll(text: Column, n: Int): Column =
    column(Shingles(expression(text), n, distinct = false))
  def redact(text: Column, blocklist: Seq[String], mask: String): Column =
    column(RedactTokens(expression(text), blocklist, mask))
  def redactCount(text: Column, blocklist: Seq[String]): Column =
    column(RedactCount(expression(text), blocklist))
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column =
    column(MultiMatchCounts(expression(text), patterns))
  def hashedTf(text: Column, dims: Int): Column =
    column(HashedTf(expression(text), dims))
}
