"""Market-basket co-occurrence: item-pair support and lift within orders.

The association-rule substrate (frequent itemsets of size 2): which parts
ship together more often than chance? Reference parity: the reference has
no basket operator — this is part of the training-data-pipeline surface
(co-occurrence features, complementary-product candidates, fraud rings
buying the same item combos).

Design (Spark-first, no self-join):
- distinct (order, item) pairs reduce to ONE sorted item array per order
  (a keyed aggregation — the only shuffle that touches raw rows);
- pair expansion is ARRAY-LOCAL: a nested ``transform`` over the sorted
  array emits (a, b) with a < b, so fan-out is bounded by
  ``max_basket``^2 per order and never leaves the partition — where a
  shingle-style self-join would shuffle |items| rows per order again;
- degenerate baskets (an order with thousands of items — the basket
  analogue of a hot LSH bucket) are dropped by ``max_basket`` BEFORE
  expansion, and marginals/totals are computed over the same capped basket
  set so support and lift stay mutually consistent;
- lift = n_ab * n_orders / (n_a * n_b) from exact integer counts — no
  float accumulation, deterministic on any engine.

Scale: shuffles carry (order, item-id) then (item, item) pairs — fixed-width
integers, never payload rows. The pair aggregation key space is bounded by
the catalog (|items|^2 worst case) but the min_support filter follows one
map-side-combined aggregation, so the reducer sees only observed pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_fraud_detection_spark.functions.numeric import round4_stable


def basket_pairs(
    df: DataFrame,
    order_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 100,
) -> DataFrame:
    """(item_a, item_b, n_ab, lift) for item pairs co-occurring in at
    least ``min_support`` orders (item_a < item_b)."""
    items = df.select(
        F.col(order_col).alias("__o"), F.col(item_col).alias("__i")
    ).distinct()
    baskets = (
        items.groupBy("__o")
        .agg(F.sort_array(F.collect_list("__i")).alias("__items"))
        .filter(F.size("__items") <= max_basket)
    )
    n_orders = baskets.select(F.count(F.lit(1)).alias("__n_orders"))
    marginals = (
        baskets.select(F.explode("__items").alias("__i"))
        .groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__n_i"))
    )
    # array-local (a, b) expansion, a < b by construction (sorted array)
    arr = F.col("__items")
    pairs_expr = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pairs_expr).alias("__p"))
        .groupBy(
            F.col("__p.item_a").alias("item_a"),
            F.col("__p.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    ma = marginals.select(
        F.col("__i").alias("item_a"), F.col("__n_i").alias("__n_a")
    )
    mb = marginals.select(
        F.col("__i").alias("item_b"), F.col("__n_i").alias("__n_b")
    )
    return (
        pair_counts.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            round4_stable(
                (F.col("n_ab") * F.col("__n_orders")).cast("double")
                / (F.col("__n_a") * F.col("__n_b"))
            ).alias("lift"),
        )
    )
