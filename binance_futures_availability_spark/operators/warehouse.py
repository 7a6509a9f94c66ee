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
