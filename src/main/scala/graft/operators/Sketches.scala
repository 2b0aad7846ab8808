package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, via Spark's built-in
  * Apache DataSketches integration) — the approximate path for
  * "distinct X per Y" at 100 TB, where an exact countDistinct's expand +
  * two-phase shuffle moves every distinct value.
  *
  * The pattern these wrappers encode is sketch-once / re-aggregate-many:
  * build fine-grained sketches (per partition-unit: day, source,
  * shard), persist the few-KB binaries, then answer ANY coarser rollup
  * by unioning sketches — no rescan of the corpus. HLL union merges
  * register maxima losslessly, so a merged estimate tracks the
  * direct coarse-level sketch to well under the error envelope
  * (spec-enforced; not bit-equal — DataSketches' HIP estimator on a
  * directly-built sketch is insertion-order dependent and a union
  * falls back to the composite estimator), and accuracy is a fixed
  * ~1.04/√2^lgK (≈1.6% at lgK=12) regardless of cardinality.
  *
  * The exact twins stay first-class: q48 answers the same question with
  * countDistinct and remains the DuckDB-oracled correctness anchor.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol`'s distinct values.
    * @param lgK log2 of the register count (12 ⇒ ~1.6% rel. std. error,
    *   4 KiB per sketch). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
  }

  /** Re-aggregate sketches to a coarser grouping (sketch union). */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as("sketch"))

  /** Distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  // --- Count-Min frequency sketches -------------------------------------
  //
  // The frequency-counting sibling of the HLL wrappers: "how often did
  // item X occur per Y" without shuffling the full (Y, X) grain. Unlike
  // HLL, a Count-Min sketch is LINEAR — merging per-shard sketches sums
  // their counter matrices, so a merged rollup is bit-identical to a
  // sketch built directly over the union (spec-enforced), and estimates
  // are one-sided: estimate ≥ true count always, within ε·total at the
  // configured confidence. Same seed + same (ε, δ) is the merge
  // compatibility contract; the default seed is fixed so independently
  // built shards merge by construction.

  /** Per-group Count-Min sketch of `valueCol` occurrences (weighted by
    * one per row). ε is the overestimate bound as a fraction of the
    * group's total count; confidence the probability it holds. */
  def freqSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as("sketch"))
  }

  /** Re-aggregate Count-Min sketches to a coarser grouping. Counter
    * matrices add, so this is lossless relative to a direct build. */
  def mergeFreqSketches(df: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(CmsUnion.agg(col(sketchCol)).as("sketch"))
  }

  /** Estimated occurrence count of a string item in a sketch column.
    * A plain UDF probe: sketches are few-KB values on already-aggregated
    * rows — never the hot path, so codegen doesn't matter here. The
    * probe type must match the sketched column's type (CMS hashes
    * strings and longs differently). */
  def estimateFreq(sketch: Column, item: Column): Column =
    udf((bytes: Array[Byte], v: String) =>
      if (bytes == null || v == null) null
      else java.lang.Long.valueOf(
        org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
          .estimateCount(v)))
      .apply(sketch, item)

  /** [[estimateFreq]] for integral-typed sketched columns. */
  def estimateFreqLong(sketch: Column, item: Column): Column =
    udf((bytes: Array[Byte], v: java.lang.Long) =>
      if (bytes == null || v == null) null
      else java.lang.Long.valueOf(
        org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
          .estimateCount(v)))
      .apply(sketch, item)

  /** Mergeable quantile sketch by deterministic bottom-k sampling: per
    * group, keep the k rows with the smallest salted portable hash of
    * `keyCol` (a uniform random — but reproducible — row sample) and
    * report exact quantiles OF THE SAMPLE. The bounded
    * [[graft.functions.TopKByScore]] heap is the sketch: O(k) state per
    * partition, partial heaps merge losslessly map-side, so full rows
    * never reach the shuffle — the quantile analog of the KMV theta
    * sketch (q137), next to q73's exact full-shuffle twin.
    *
    * Determinism/oracle-exactness: the hash is 48-bit
    * ([[TextFunctions.portableHash48]] — every value exact as the
    * heap's Double score) and heap ties break by (score, value)
    * exactly like `ORDER BY hash, value`, so an external SQL engine
    * selects the IDENTICAL sample; sample quantiles at dyadic p over
    * ×4-scaled integer values interpolate exactly (q97's trick).
    *
    * Accuracy is the classic sampling bound (±O(1/√k) in rank), NOT a
    * deterministic KLL ε — the tradeoff bought by exact cross-engine
    * reproducibility.
    *
    * @param valueCol integral values (cents pattern)
    * @param keyCol   unique row key — hashed with the salt to pick
    * @return (groupCols…, n_sample, p25, p50, p75) */
  def quantileSample(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, keyCol: Column, k: Int, salt: String): DataFrame = {
    require(k >= 4, s"sample size must be >= 4, got $k")
    val hv = graft.functions.TextFunctions
      .portableHash48(concat(keyCol.cast("string"), lit(salt)))
      .cast("double")
    df.select(groupCols.map(col) :+ valueCol.cast("long").as("__v") :+
        hv.as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopKByScore.topkMin(col("__v"), col("__h"), k)
        .as("__smp"))
      .select(groupCols.map(col) :+ explode(col("__smp.id")).as("__v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_sample"),
        (expr("percentile(__v * 4, 0.25D)") / 400.0).as("p25"),
        (expr("percentile(__v * 4, 0.5D)") / 400.0).as("p50"),
        (expr("percentile(__v * 4, 0.75D)") / 400.0).as("p75"))
  }

  // --- Portable HLL (relational registers, cross-engine exact) ----------
  //
  // A from-the-paper HyperLogLog (Flajolet et al. 2007) whose sketch is
  // a plain (group, bucket, reg) ROW TABLE instead of an opaque binary:
  // registers are max-aggregates, so build, merge, and estimate are all
  // ordinary relational operators — order-free by construction — and
  // every arithmetic step is either exact-integer or a fixed-order
  // double expression, so an external SQL engine reproduces the
  // ESTIMATE bit-for-bit (q59's DuckDB oracle does). b = 12 ⇒ 4096
  // registers, ~1.04/√4096 ≈ 1.6% rel. std. error. The hash is the
  // repo's 60-bit md5 bridge: bucket = top 12 bits, rho over the
  // remaining 48 — wide enough that the classic 2^32/30 large-range
  // collision correction never applies (its analog sits near 2^60/30).
  // Scale shape: a register table is ≤ 4096 rows per group — the
  // sketch-once / re-aggregate-many path with sketches you can also
  // JOIN, DIFF, and inspect. The DataSketches wrappers above remain the
  // compact-binary variant; this one trades ~32 KB/group for exact
  // portability.

  /** Per-group portable-HLL register table of `valueCol`'s distinct
    * values: (groupCols…, bucket, reg) with bucket ∈ [0, 4096),
    * reg ∈ [1, 49]. Absent buckets are implicit zeros (carried by
    * [[hllPortableEstimate]]'s complement term, never materialized). */
  def hllPortableRegisters(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15),
      16, 10).cast("long")
    val rest = col("__h").bitwiseAND(lit((1L << 48) - 1))
    df.select(groupCols.map(col) :+ h.as("__h"): _*)
      .select(groupCols.map(col) ++ Seq(
        shiftright(col("__h"), 48).as("bucket"),
        when(rest === 0, lit(49))
          .otherwise(lit(49) - length(bin(rest))).as("__rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("__rho").cast("int").as("reg"))
  }

  /** Union register tables to a coarser grouping — register max, the
    * lossless HLL merge (a merged table equals one built directly over
    * the union, bit-for-bit — spec-enforced). */
  def hllPortableMerge(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("reg").as("reg"))

  /** Distinct-count estimate per group from a register table. The
    * harmonic-mean denominator Σ 2^(−reg) is computed as the EXACT
    * integer Σ 2^(62−reg) (absent buckets contribute 2^62 each via the
    * complement term), so the only floating-point steps are one
    * division by a constant-literal numerator and — on the
    * small-range linear-counting branch — one ln() rounded to 9
    * places before an exact decimal multiply (the q226 discipline).
    * `5.57931869232093113e25` = α₄₀₉₆ · 4096² · 2^62 exactly as an
    * IEEE double; both engines parse it to the same bits. */
  def hllPortableEstimate(df: DataFrame, groupCols: Seq[String],
      estCol: String = "est"): DataFrame = {
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 62 - reg) " +
          "AS DECIMAL(38,0))")).as("__s"))
      .select(groupCols.map(col) :+
        expr(s"""CASE WHEN __n < 4096 AND
            5.57931869232093113e25 /
              CAST(CAST(4096 - __n AS DECIMAL(6,0)) * 4611686018427387904
                + __s AS DOUBLE) <= 1.024e4
          THEN CAST(round(4096 * CAST(round(
              ln(CAST(4096 AS DOUBLE) / CAST(4096 - __n AS DOUBLE)), 9)
              AS DECIMAL(18,9)), 6) AS DOUBLE)
          ELSE round(5.57931869232093113e25 /
            CAST(CAST(4096 - __n AS DECIMAL(6,0)) * 4611686018427387904
              + __s AS DOUBLE), 6) END""").as(estCol): _*)
  }
}

/** Binary Count-Min union as a typed Aggregator (Spark ships the CMS
  * agg builder but no SQL-level union — the class's `mergeInPlace` is
  * the merge; this lifts it to a grouped aggregate). */
private object CmsUnion
    extends org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] {
  import org.apache.spark.util.sketch.CountMinSketch

  override def zero: Array[Byte] = null
  private def m(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a == null) b else if (b == null) a
    else {
      val s = CountMinSketch.readFrom(a)
      s.mergeInPlace(CountMinSketch.readFrom(b))
      s.toByteArray
    }
  override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
    m(buf, in)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = m(a, b)
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY

  def agg(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(c)
}
