package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing and disclosure-control operators — the release
  * gate a curation pipeline runs before a table (or an aggregate
  * report) leaves the trust boundary. Two complementary layers:
  * does the MICRO-data re-identify (k-anonymity / l-diversity over
  * quasi-identifier classes), and do the AGGREGATES leak (differentially
  * private noise on released counts).
  *
  * Both are single-aggregate-pass shapes: the fact table shuffles once
  * keyed by the class/group, and everything after runs on the tiny
  * class table. The DP noise is a deterministic hash-seeded Laplace
  * draw — same release, same noise (no RNG state, re-runs are
  * idempotent, and a SQL twin reproduces every digit).
  */
object Privacy {

  /** k-anonymity / l-diversity audit: group the table by its
    * quasi-identifier columns and report every equivalence class that
    * violates either bound — fewer than k rows (re-identifiable by
    * linkage) or fewer than l distinct sensitive values (attribute
    * disclosure even at k). The returned classes are exactly the rows
    * a release would have to suppress or generalize.
    *
    * One scan over the input (count + distinct-count per class plan
    * as the two-level distinct aggregate); the violation filter runs
    * on the class table.
    *
    * @param quasiCols columns an attacker can link on
    * @param sensitive the column whose value must stay ambiguous
    * @return (quasiCols..., n_rows, n_sensitive, k_violation,
    *   l_violation) — violating classes only. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_violation", col("n_rows") < k)
      .withColumn("l_violation", col("n_sensitive") < l)
      .filter(col("k_violation") || col("l_violation"))
  }

  /** ε-differentially-private released counts per group: true count
    * plus Laplace(Δ/ε) noise (Δ = 1 for a count query), with the draw
    * seeded from a salted portable hash of the group key — the release
    * is deterministic and auditable, and DISTINCT salts give
    * independent releases (each spending its own ε from the budget).
    *
    * The inverse-CDF draw: u = (h mod 2⁵² + 0.5)/2⁵² ∈ (0,1) from the
    * 60-bit md5 prefix (52 bits stay exact in a double; the +0.5 keeps
    * u off both endpoints so ln never sees 0), then
    * noise = b·ln(2u) for u ≤ ½, −b·ln(2−2u) above — a fixed-order
    * expression both engines evaluate identically (round(6) absorbs
    * the ln ulp). ONE aggregate pass; noise attaches on the group
    * table.
    *
    * @param groupCol released dimension (cast to string for hashing)
    * @param epsilon  privacy budget for THIS release (> 0)
    * @param salt     release identifier mixed into the draw
    * @return (dim, n, noisy_n) — n is the true count (caller drops
    *   it for an actual release; kept here for the audit/oracle).
    *
    * Domain caveat: rows are emitted only for dimension values OBSERVED
    * in the data, so presence/absence of a group in the release is
    * itself data-dependent and unprotected. For strict ε-DP over the
    * dimension domain the caller must treat domain membership as public
    * knowledge — or use [[dpNoisyCountsOverDomain]], which releases
    * exactly the declared domain (empty groups get a noisy zero). */
  def dpNoisyCounts(df: DataFrame, groupCol: Column, epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    df.select(groupCol.as("dim"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n",
        round(col("n") + laplaceNoise(1.0 / epsilon, salt), 6))
  }

  /** Hash-seeded Laplace(b) draw over the `dim` column (see
    * [[dpNoisyCounts]] for the inverse-CDF derivation). */
  private def laplaceNoise(b: Double, salt: String): Column = {
    val u = (pmod(TextFunctions.portableHash60(
      concat(lit(salt), lit(":"), col("dim").cast("string"))),
      lit(4503599627370496L)).cast("double") + 0.5) / 4.503599627370496e15
    when(u <= 0.5, lit(b) * log(u * 2.0))
      .otherwise(lit(-b) * log(lit(2.0) - u * 2.0))
  }

  /** [[dpNoisyCounts]] with a declared releasable domain — the strict
    * ε-DP form. The release has EXACTLY one row per domain value:
    * domain values never observed get a noisy zero, and observed values
    * outside the domain are dropped (the domain, not the data, decides
    * what appears — so presence/absence leaks nothing). The domain must
    * be public knowledge (a dimension table, an enum), not derived from
    * the protected data.
    *
    * Scale shape: the fact table still shuffles once for the count
    * aggregate; the domain join runs on the tiny GROUP table (left join
    * from the domain side), never on facts.
    *
    * @param domain one-column DataFrame of releasable dimension values
    *   (deduplicated here; type-coerced to the observed dim's type via
    *   the join) */
  def dpNoisyCountsOverDomain(df: DataFrame, groupCol: Column,
      domain: DataFrame, epsilon: Double, salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    require(domain.columns.length == 1,
      s"domain must have exactly one column, got ${domain.columns.length}")
    val counts = df.select(groupCol.as("dim"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_obs"))
    domain.select(col(domain.columns.head).as("dim")).distinct()
      .join(counts, Seq("dim"), "left")
      .select(col("dim"),
        coalesce(col("n_obs"), lit(0L)).as("n"))
      .withColumn("noisy_n",
        round(col("n") + laplaceNoise(1.0 / epsilon, salt), 6))
  }
}
