package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftInternals.column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._

/** Bloom-filtered join pruning — semi-join reduction for a selective
  * build side: build an approximate membership filter over the build
  * side's join key, prune the probe side BEFORE its exchange, then run
  * the exact join (bloom false positives are eliminated by the join
  * itself, so results are identical to the plain join — the plain
  * join IS the oracle).
  *
  * This is the manual, always-on twin of Spark's runtime row-group /
  * InSubquery bloom filtering: at 100 TB the probe side's shuffle is
  * the dominant cost, and a 3%-FPP bloom shrinks the exchanged bytes
  * to ≈ selectivity + 3% while the filter itself is one broadcast
  * read-only bitset probed by a codegen'd hash — no per-row join, no
  * driver-side key list in the plan (an `isin` of a million keys
  * would not even parse usefully).
  *
  * The probe predicate is Catalyst's own [[BloomFilterMightContain]]
  * over [[XxHash64]], fed by a filter built with the public
  * `DataFrameStatFunctions.bloomFilter` over the same hash — both
  * sides use the identical `putLong`/`mightContainLong` bit layout
  * (the aggregate Spark's runtime filter uses serializes the same
  * sketch class).
  */
object BloomJoin {

  /** A probe-side `Column` predicate: key might be in `build(key)`.
    * Build side is aggregated eagerly (one small job). */
  def mightContainKey(build: DataFrame, buildKey: String, probeKey: Column,
      expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0: $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val bf = build.select(xxhash64(col(buildKey)).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    column(BloomFilterMightContain(Literal(bos.toByteArray),
      new XxHash64(
        Seq(org.apache.spark.sql.GraftInternals.expression(probeKey)))))
  }

  /** Inner equi-join with the probe side bloom-pruned first.
    * Results are exactly the plain `probe.join(build, key)`. */
  def innerPruned(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long = 1_000_000L, fpp: Double = 0.03): DataFrame = {
    val pruned = probe.filter(
      mightContainKey(build, key, col(key), expectedItems, fpp))
    pruned.join(build, Seq(key))
  }
}
