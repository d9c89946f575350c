"""Market-basket co-occurrence: pairwise support and lift.

The association-rule substrate ("customers who bought X also bought
Y"): for every unordered item pair, how many baskets contain both
(support) and how that compares to independence (lift).  The reference
has no co-occurrence surface; this is the same capped
bucket-grouped pair expansion as the dedup shingle paths
(dedup._shingle_pair_counts) pointed at transactional baskets instead
of documents.

Scale shape: distinct (basket, item) → ONE basket-keyed hash-agg
collecting the sorted item list → pure-array pair explode (bounded by
``max_basket`` — a degenerate basket with thousands of items is
C(k,2)-quadratic and carries no signal, the same argument as the
hot-shingle df cap) → pair hash-agg.  Item marginals and the basket
count ride in as one broadcast join + one broadcast scalar; nothing
ever self-joins the basket table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pairs: int = 2,
    max_basket: "int | None" = 1024,
) -> DataFrame:
    """(item_a, item_b, n_pairs, support, lift) for every unordered
    item pair appearing together in >= ``min_pairs`` baskets
    (item_a < item_b).  support = n_pairs / |baskets|;
    lift = P(a,b) / (P(a)·P(b)) — > 1 means the pair co-occurs more
    than independence predicts.  Both rounded to 6 dp."""
    ob = df.select(
        F.col(basket_col).alias("_o"), F.col(item_col).alias("_i")
    ).distinct()
    nb = ob.agg(F.count_distinct("_o").cast("double").alias("_nb"))
    ic = ob.groupBy(F.col("_i")).agg(F.count(F.lit(1)).alias("_c"))
    baskets = ob.groupBy("_o").agg(F.sort_array(F.collect_list("_i")).alias("_items"))
    baskets = baskets.filter(F.size("_items") >= 2)
    if max_basket is not None:
        baskets = baskets.filter(F.size("_items") <= max_basket)
    pair_structs = F.flatten(
        F.transform(
            F.col("_items"),
            lambda x, i: F.transform(
                F.slice(F.col("_items"), i + 2, F.size(F.col("_items"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("item_a"), F.col("p.b").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_pairs)
    )
    ca = ic.select(F.col("_i").alias("item_a"), F.col("_c").alias("_ca"))
    cb = ic.select(F.col("_i").alias("item_b"), F.col("_c").alias("_cb"))
    # marginals joins are NOT hint-forced to broadcast: the item
    # dimension can be genuinely large (raw SKUs/doc ids), and a forced
    # broadcast OOMs the driver there — AQE broadcasts when |items|
    # is actually small (it is for the brand-level query)
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_pairs",
            F.round(F.col("n_pairs") / F.col("_nb"), 6).alias("support"),
            F.round(
                F.col("n_pairs") * F.col("_nb") / (F.col("_ca") * F.col("_cb")), 6
            ).alias("lift"),
        )
    )
