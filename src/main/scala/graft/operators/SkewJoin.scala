package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions — the classic remedy
  * when ONE key owns a disproportionate share of the probe side and a
  * plain shuffle join would funnel it into a single straggler task.
  *
  * The reference's analog is its median-split load balancing
  * (`geometric_partitioning.cpp:299-487`: equal ROWS per rank, not equal
  * key ranges); this operator applies the same idea to hash joins. AQE's
  * skew-join split covers sort-merge joins after the fact — explicit
  * salting also covers shuffled-hash joins, works when statistics are
  * stale, and bounds the blow-up to an explicit factor.
  *
  * Mechanics: every big-side row gets a deterministic content-derived
  * salt in [0, saltFactor); the small side is replicated once per salt
  * value; the join key becomes (key, salt). Each matching pair survives
  * under exactly one salt value, so the result is the plain inner join,
  * while a hot key's probe rows spread over `saltFactor` shuffle
  * partitions instead of one.
  *
  * Use when BOTH sides are too large to broadcast (a broadcastable
  * small side needs no salting — `broadcast()` it instead); the small
  * side pays a ×saltFactor replication, so size the factor to the skew,
  * not to the cluster. The shuffle-hash hint pins the physical join to
  * the salted exchange (no per-partition sort, and no broadcast
  * "rescue" that would silently bypass the demonstration of the
  * distribution at small scale).
  */
object SkewJoin {

  /** Inner equi-join `big.bigKey == small.smallKey`, salted `saltFactor`
    * ways. Output columns: big's then small's (both key columns kept,
    * like a plain join). */
  def saltedInner(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require((big.columns ++ small.columns).forall(c =>
      !c.equalsIgnoreCase("_salt_l") && !c.equalsIgnoreCase("_salt_r")),
      "inputs already have a _salt_l/_salt_r column — rename it first")
    // content-derived salt: deterministic under retries and speculative
    // execution (rand() is not), and it spreads a hot key's rows by the
    // rest of their content; identical full rows share a salt, which
    // affects balance only, never correctness
    val bigS = big.withColumn("_salt_l",
      pmod(xxhash64(big.columns.map(col) :+ lit(saltFactor): _*),
        lit(saltFactor)).cast("int"))
    val smallS = small.withColumn("_salt_r",
      explode(typedLit((0 until saltFactor).toArray)))
    // side-qualified key refs: both sides naming the key identically
    // (the common join shape) must not trip AMBIGUOUS_REFERENCE
    bigS.join(smallS.hint("shuffle_hash"),
        bigS(bigKey) === smallS(smallKey) &&
          bigS("_salt_l") === smallS("_salt_r"))
      .drop("_salt_l", "_salt_r")
  }
}
