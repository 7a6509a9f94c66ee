"""Two-dataset row-level differ.

Parity: reference scripts/verify-database-consistency.py:206-339 (J8 in
SURVEY.md: dict-keyed row comparison of two databases' snapshots). Spark-first:
full outer join on the key columns, then classify each key as only-left /
only-right / mismatched / equal. This is the same shape the correctness gate
uses (Spark result vs DuckDB oracle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_datasets(
    left: DataFrame, right: DataFrame, key: list[str]
) -> DataFrame:
    """J8 — per-key diff status of two same-schema DataFrames.

    Returns (key..., status) where status ∈ {only_left, only_right,
    mismatch, equal}. Null-safe comparison (<=>) on every non-key column.
    """
    value_cols = [c for c in left.columns if c not in key]
    l = left.alias("l")
    r = right.alias("r")
    cond = [F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}")) for k in key]
    joined = l.join(r, reduce(lambda a, b: a & b, cond), "full_outer")

    l_present = reduce(
        lambda a, b: a | b, [F.col(f"l.{k}").isNotNull() for k in key]
    )
    r_present = reduce(
        lambda a, b: a | b, [F.col(f"r.{k}").isNotNull() for k in key]
    )
    if value_cols:
        all_equal = reduce(
            lambda a, b: a & b,
            [F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in value_cols],
        )
    else:
        all_equal = F.lit(True)

    status = (
        F.when(~r_present, F.lit("only_left"))
        .when(~l_present, F.lit("only_right"))
        .when(all_equal, F.lit("equal"))
        .otherwise(F.lit("mismatch"))
    )
    key_out = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in key
    ]
    return joined.select(*key_out, status.alias("status"))


def diff_summary(left: DataFrame, right: DataFrame, key: list[str]) -> dict:
    """Counts by diff status — the consistency report of the reference."""
    rows = (
        diff_datasets(left, right, key)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out = {"only_left": 0, "only_right": 0, "mismatch": 0, "equal": 0}
    for r in rows:
        out[r["status"]] = r["n"]
    return out
