package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis — the transactional twin of
 *  the text-side PMI collocations (x108): which item PAIRS appear in
 *  the same basket far more often than their individual popularities
 *  predict. Lift(a,b) = P(a,b) / (P(a)·P(b)) with basket-level
 *  probabilities; a curation/commerce pipeline reads the top-lift list
 *  for bundling, substitution and data-leak signals (two "independent"
 *  sources sharing baskets is a provenance smell).
 */
object Basket {

  /** Top item pairs by lift with a support floor.
   *
   *  Scale shape: one distinct (basket, item) projection, pair
   *  generation ONLY through a basket-keyed self-join — per-basket
   *  quadratic, so `maxBasketSize` excludes degenerate mega-baskets
   *  from pairing (the d06 df-cap / x110 degree-cap move: a 10⁵-item
   *  basket would mint 10¹⁰ pairs); item frequencies and the basket
   *  count still include every basket, so capped lifts stay honest.
   *  Support floor BEFORE the frequency joins keeps the joined side
   *  minSupport-pruned; lift micro-quantizes before the top cut.
   *
   *  Returns (item_a, item_b, n_both, n_a, n_b, lift), lift desc. */
  def coOccurrenceLift(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 2,
      top: Int = 50,
      maxBasketSize: Long = 100): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(top > 0 && maxBasketSize >= 2, "top > 0, maxBasketSize >= 2")
    // distinct membership feeds FOUR consumers (self-join both sides
    // via `sized`, item frequencies, basket count) — lineage-cut once
    val op = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
      .localCheckpoint()
    // an empty (or all-null) input degrades to an empty result — the
    // pair join never fires, so nBaskets=0 is never a divisor
    val nBaskets = op.select("__b").distinct().count()
    val itemN = op.groupBy("__i").agg(count(lit(1)).as("__ni"))
    val sized = op
      .join(op.groupBy("__b").agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBasketSize), "__b")
      .select("__b", "__i")
      .localCheckpoint()
    val pairs = sized.as("l")
      .join(sized.as("r"),
        col("l.__b") === col("r.__b") && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairs
      .join(itemN.select(col("__i").as("item_a"), col("__ni").as("n_a")),
        "item_a")
      .join(itemN.select(col("__i").as("item_b"), col("__ni").as("n_b")),
        "item_b")
      // operation order mirrors the oracle: numerator product, then
      // denominator product, one divide, quantize
      .withColumn("__micro",
        round((col("n_both").cast("double") * nBaskets)
          / (col("n_a").cast("double") * col("n_b")) * 1e6, 0)
          .cast("long"))
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("n_a"), col("n_b"),
        round(col("__micro").cast("double") / 1e6, 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(top)
  }
}
