"""As-of join — for each left row, the latest right row with
right.ts <= left.ts within the same key (the time-series join Spark lacks
natively; DuckDB has ASOF JOIN, which is the driver oracle).

Implementation is the union-tag trick, fully declarative (one shuffle on
the key, one window):

  1. union the two sides with a side tag, right rows carrying their payload;
  2. one window per key ordered by (ts, side) computes last_value of the
     right payload with IGNORE NULLS up to the current row;
  3. keep left rows: each now holds the most recent right payload at-or-
     before its timestamp.

Ordering puts the right side FIRST at equal timestamps (side 0 < side 1),
so a right row with ts == left.ts matches (the standard ASOF <= contract).

Scale: no range explosion, no per-key collect — the window shuffles once on
the join key; skewed keys are AQE-handled like any other window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Returns `left` with, for each row, the latest `right` row's
    `right_cols` (renamed with `suffix`) where right.on <= left.on and the
    `by` keys match. Left rows with no earlier right row get nulls."""
    right_cols = right_cols or [c for c in right.columns if c not in {on, by}]
    key_cols = [by] if by else []

    l_tag = left.select(
        *key_cols,
        F.col(on),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *key_cols,
        F.col(on),
        F.lit(0).alias("_side"),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(f"{c}: {t}" for c, t in left.dtypes)
            + ">"
        )
        .alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    uni = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = uni.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
