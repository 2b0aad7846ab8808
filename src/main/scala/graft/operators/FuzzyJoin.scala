package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching — the string sibling of the ε-join:
  * all distinct value pairs within Levenshtein distance 1, without a
  * quadratic scan.
  *
  * Blocking is the symmetric-delete scheme (SymSpell): each string
  * emits itself plus its |s| single-deletion variants; any two strings
  * with ed ≤ 1 provably share a variant (equal → the string itself;
  * substitution → both drop the substituted position; indel → the
  * longer drops the inserted char and meets the shorter whole). The
  * join is therefore a plain equi-join on the variant key, and the
  * exact `levenshtein` filter removes blocking false positives (e.g.
  * transpositions share a variant but have ed 2) — lossless by
  * construction, like the ε-grid join's cell-then-distance shape.
  *
  * Scale: ~(len+1)× row replication on the blocking key, one shuffle,
  * one distinct over candidates; a popular variant (many near-equal
  * strings) is an AQE-skew case, same as a dense ε-cell. Run it on the
  * DISTINCT value table, not the raw corpus — ed ≤ k on values, then
  * join matches back. Generalizes to k > 1 with depth-k deletion
  * neighborhoods (variant count grows ~len^k — keep k small).
  */
object FuzzyJoin {

  /** Ordered distinct pairs `(a_<key>, b_<key>, d)` with
    * `d = levenshtein ≤ 1`, `a < b` lexicographically. Input rows are
    * deduplicated on `keyCol` first; NULLs are dropped. */
  def selfJoinEd1(values: DataFrame, keyCol: String): DataFrame = {
    // the string + every single-deletion variant (HOF-generated: the
    // variant generator runs on the distinct-value table, not the
    // corpus — interpreted eval is fine off the hot path)
    def variants(c: String) = expr(
      s"array_distinct(concat(array($c), " +
        s"transform(sequence(0, length($c) - 1), " +
        s"i -> concat(substring($c, 1, i), " +
        s"substring($c, i + 2, 2147483647)))))")
    val names = values.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .distinct()
    val a = names.select(col(keyCol).as(s"a_$keyCol"),
      explode(variants(keyCol)).as("blk"))
    val b = names.select(col(keyCol).as(s"b_$keyCol"),
      explode(variants(keyCol)).as("blk"))
    a.join(b, Seq("blk"))
      .filter(col(s"a_$keyCol") < col(s"b_$keyCol"))
      .select(s"a_$keyCol", s"b_$keyCol")
      .distinct() // a pair can share several variants
      .filter(levenshtein(col(s"a_$keyCol"), col(s"b_$keyCol")) <= 1)
      .select(col(s"a_$keyCol"), col(s"b_$keyCol"),
        levenshtein(col(s"a_$keyCol"), col(s"b_$keyCol")).cast("int").as("d"))
  }
}
