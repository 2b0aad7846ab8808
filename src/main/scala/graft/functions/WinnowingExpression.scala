package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The ONE Karp–Rabin definition both fingerprinting and
  * content-defined chunking share — and the one the DuckDB oracles
  * reproduce digit for digit. Changing the base/modulus here changes
  * every consumer and every oracle TOGETHER; duplicating it would let
  * them drift apart silently.
  *
  * Modulus small enough that every product stays inside a signed
  * 64-bit long (h < 2^31, h·B < 2^39) — a larger modulus silently
  * overflows and the hash stops being position-independent. */
private[functions] object KarpRabin {
  val B = 131L            // rolling base
  val M = (1L << 31) - 1  // Mersenne prime 2^31−1

  /** Rolling hashes of every k-gram of `cps` (codepoints), in order:
    * out(i) = hash of cps[i, i+k). Empty when cps has < k codepoints. */
  def gramHashes(cps: Array[Int], k: Int): Array[Long] = {
    val n = cps.length
    if (n < k) return Array.empty
    val nh = n - k + 1
    val hs = new Array[Long](nh)
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow = pow * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      h = ((h - cps(i - 1) * pow % M + M * 2) % M * B + cps(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    hs
  }
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03): [[KarpRabin]] ROLLING hash over character k-grams, then
  * the minimum hash of every w-hash window, deduplicated — the standard
  * local-fingerprint scheme whose guarantee is that any shared substring
  * of length ≥ k + w − 1 yields at least one shared fingerprint.
  *
  * Single-pass native expression: O(1) per character; window minima via
  * a monotone deque, O(1) amortized. Fingerprint set size is ~2/(w+1)
  * of the k-gram count — a compact sketch for containment / near-dup
  * detection at corpus scale. */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    // hash Unicode CODEPOINTS, not UTF-16 code units: the DuckDB oracle
    // twin uses ord()/len(), which are codepoint-based — surrogate-pair
    // characters (emoji, rare CJK) would otherwise shift every k-gram
    // hash and the length gate (ASCII corpora mask the difference)
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val hs = KarpRabin.gramHashes(cps, k) // rolling k-gram hashes
    val nh = hs.length
    var i = 0
    if (nh <= w) {
      // fewer k-grams than a window: keep the single global min
      var mn = hs(0); i = 1
      while (i < nh) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return new GenericArrayData(Array[Any](mn))
    }
    // min of each w-window via monotone deque; dedup consecutive picks
    val out = new java.util.LinkedHashSet[Long]()
    val deque = new Array[Int](nh)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < nh) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnowing_fingerprints"
}

/** Content-defined chunk boundaries (the CDC idea behind FastCDC /
  * LBFS): a cut falls AFTER codepoint position p (1-based) whenever the
  * Karp–Rabin hash of the k-gram ENDING at p satisfies `h mod m = 0` —
  * boundaries depend on CONTENT, not offsets, so an insertion early in
  * a document shifts only the chunk it lands in (fixed-stride chunking
  * q40 re-cuts everything downstream; CDC chunks stay dedupable).
  * Expected chunk length ≈ m. Same rolling hash as
  * [[WinnowingFingerprints]] (base 131 mod 2³¹−1, codepoint input —
  * DuckDB-reproducible digit for digit). Min/max chunk-length
  * normalization composes DOWNSTREAM (merge tiny chunks: one
  * gaps-and-islands pass) rather than inside the boundary rule — a
  * greedy in-scan constraint would make the oracle recursive.
  * @return ascending array<long> of boundary END positions in [k, n);
  *   a boundary at n is suppressed (the final chunk always closes
  *   there). Empty for docs shorter than k. */
case class CdcBoundaries(child: Expression, k: Int, mod: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && mod >= 1, "need k >= 2, mod >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val hs = KarpRabin.gramHashes(cps, k)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < hs.length) {
      // gram starting at i ends at position i + k (1-based)
      if (hs(i) % mod == 0 && i + k < n) out += (i + k).toLong
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_boundaries"
}

object WinnowingExpression {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  /** Winnowing fingerprint set of `text` (k-gram size k, window w). */
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    column(WinnowingFingerprints(expression(text), k, w))

  /** Content-defined chunk boundary positions of `text` — see
    * [[CdcBoundaries]]. */
  def cdcBoundaries(text: Column, k: Int, mod: Int): Column =
    column(CdcBoundaries(expression(text), k, mod))
}
