"""Classic warehouse join pipelines over the TPC-H-shaped tables —
the multi-join showcase (fact ⋈ fact shuffle join + broadcast dimension
chain) that exercises Catalyst's join planning end to end.

Scale shape: the lineitem ⋈ orders join is the one genuinely large
shuffle (both sides fact-sized, co-partitioned on the order key by the
join itself); customer joins on the shuffled key's projection; nation
and region are DIMENSIONS — broadcast explicitly so no fact row ever
shuffles for them. Filters (the order-date window) sit directly on the
orders scan so Parquet pushdown prunes before the join. Money sums go
through DECIMAL(18,2) (per-row double product rounds identically on
both engines; the reduction is exact decimal addition) — the same
float discipline as the availability volume operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    date_from: str,
    date_to: str,
) -> DataFrame:
    """Revenue per (region, nation) for orders in a date window:
    (region_name, nation_name, n_lineitems, revenue) — the TPC-H Q5
    family re-expressed on this schema.

    revenue = Σ (price · (1 − discount)) computed ENTIRELY in decimals:
    both inputs are 2-decimal-sourced, so casting each to DECIMAL(18,2)
    recovers the exact value, the product is exact at scale 4, and the
    reduction is exact decimal addition. Rounding the double PRODUCT
    would not work — Spark rounds the double's shortest decimal
    representation (HALF_UP over BigDecimal(toString)) while DuckDB
    rounds the full binary value, and they disagree in the last cent.
    The customer→nation→region dimension chain is broadcast; the only
    fact shuffle is lineitem ⋈ orders on the order key.
    """
    dec = "decimal(18,2)"
    dims = F.broadcast(
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        ).select(
            "n_nationkey",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )
    o = orders.filter(
        F.col("o_orderdate").between(F.lit(date_from), F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    cust = customer.select("c_custkey", "c_nationkey")
    line = lineitem.select(
        "l_orderkey",
        F.col("l_extendedprice").cast(dec)
        * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec)),
    ).toDF("l_orderkey", "rev")
    joined = (
        line.join(o, line["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(dims, cust["c_nationkey"] == F.col("n_nationkey"))
    )
    return joined.groupBy("region_name", "nation_name").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum("rev").cast("double").alias("revenue"),
    )


def pricing_summary(
    lineitem: DataFrame,
    ship_before: str,
) -> DataFrame:
    """Pricing summary report (the TPC-H Q1 family): per (returnflag,
    linestatus) — row counts and exact decimal sums of quantity, base
    price, discounted price, and discounted+taxed price, plus integer-
    ratio averages.

    Scan-dominated: one filter pushed to the parquet scan, one
    partial-agg shuffle on a 6-value key — the shape that saturates I/O
    at 100 TB with near-zero shuffle volume. All sums are exact decimal
    reductions (2-decimal-sourced inputs; products exact at scale 4/6);
    averages divide the exact sums by the exact count — one double
    division, deterministic.
    """
    dec = "decimal(18,2)"
    qty = F.col("l_quantity").cast(dec)
    price = F.col("l_extendedprice").cast(dec)
    disc = F.col("l_discount").cast(dec)
    tax = F.col("l_tax").cast(dec)
    one = F.lit(1).cast(dec)
    disc_price = price * (one - disc)
    charge = disc_price * (one + tax)
    agg = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_before))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
        )
    )
    return agg
