package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — frequent item pairs with the
  * A-priori prune: an item pair can only reach `minSupport` baskets if
  * BOTH items individually do, so the (small) frequent-item set filters
  * the basket table BEFORE the quadratic pair step. The canonical
  * first stage of association-rule mining, and squarely the reference
  * course's home turf.
  *
  * Scale shape: basket-item dedup is one shuffle; the frequent-item
  * set is a broadcast semi filter (downward closure — lossless); pair
  * generation is a self-equi-join on the basket key, so its cost is
  * Σ_basket |items|² over SURVIVING items only — the prune is what
  * keeps a 100 TB run from exploding on promiscuous items, and basket
  * size caps (if needed) would bound the worst case explicitly.
  */
object Basket {

  /** @param df one row per (basket, item) observation; duplicates
    *   within a basket collapse.
    * @return (item_a, item_b, support) for unordered pairs co-occurring
    *   in ≥ `minSupport` baskets, item_a < item_b. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().persist()
    val freq = items.groupBy("i").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport).select("i")
    val pruned = items.join(broadcast(freq), Seq("i"), "left_semi")
    val out = pruned.as("x")
      .join(pruned.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    out
  }
}
