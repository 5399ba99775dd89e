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
the join key. CAVEAT (hot keys): a window partition is ONE task — AQE does
not split windows — so a single key holding e.g. 10^9 rows serializes on one
executor. For that regime use `asof_join_bucketed`, which adds a coarse
time-bucket to the window key: per-(key, bucket) windows run in parallel
across buckets, and matches that cross bucket boundaries come from a
cumulative per-bucket "last right row" table (a window over #buckets rows
per key — thousands, not billions). Same output contract (verified
row-for-row against asof_join in tests/test_dataops.py).
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    n_buckets: int = 64,
    bucket_width: float | None = None,
) -> DataFrame:
    """As-of join for HOT keys: same contract as `asof_join`, but the window
    key is (by, coarse-time-bucket) so one skewed key parallelizes across
    `n_buckets` tasks instead of serializing on one.

    Plan (three declarative stages, no straggler window):
      1. per-(key, bucket) LAST right row — a window whose largest partition
         is ~rows/n_buckets even for a single hot key;
      2. cumulative "latest right payload through bucket b-1" per key — a
         window over the per-key DISTINCT bucket list (tiny by construction);
      3. union-tag fill WITHIN each (key, bucket) — the asof_join trick with
         the bucket added to the partition key, seeded by stage 2's prior
         payload for left rows preceding any right row in their bucket.

    Semantics notes vs `asof_join`:
      * matched right columns come from one ROW (the latest right row at or
        before left.on), packed as a struct — `asof_join` fills each column
        independently with its own last-non-null, which differs only when
        right payload columns contain nulls;
      * ties on right.on within a key are broken deterministically by the
        bucket window's rowsBetween order, as in `asof_join`; with unique
        right timestamps per key the two functions agree row-for-row.

    `bucket_width` (in units of `on` cast to double — seconds for timestamps)
    overrides the default width derived from the observed ts range (one
    cheap min/max aggregate over the union of both sides).
    """
    right_cols = right_cols or [c for c in right.columns if c not in {on, by}]
    key_cols = [by] if by else []
    on_type = dict(left.dtypes).get(on, "")
    if on_type.startswith("timestamp"):
        # TIMESTAMP(_NTZ) cannot cast to double under ANSI; go through
        # unix_micros (NTZ → LTZ uses the session tz, pinned UTC)
        tsd = F.unix_micros(F.col(on).cast("timestamp")) / F.lit(1e6)
    else:
        tsd = F.col(on).cast("double")

    if bucket_width is None:
        bounds = (
            left.select(tsd.alias("_t"))
            .unionAll(right.select(tsd.alias("_t")))
            .agg(F.min("_t").alias("lo"), F.max("_t").alias("hi"))
            .first()
        )
        t0 = float(bounds["lo"] if bounds["lo"] is not None else 0.0)
        span = max(float(bounds["hi"] or 0.0) - t0, 1e-9)
        bucket_width = span / n_buckets
    else:
        t0 = 0.0
    bcol = F.floor((tsd - F.lit(t0)) / F.lit(float(bucket_width))).cast("long")

    pay_type = "struct<" + ", ".join(f"{c}: {dict(right.dtypes)[c]}" for c in right_cols) + ">"
    lrow_type = "struct<" + ", ".join(f"{c}: {t}" for c, t in left.dtypes) + ">"
    rb = right.select(
        *key_cols,
        tsd.alias("_ts"),
        bcol.alias("_b"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rpay"),
    )

    # stage 1: last right row per (key, bucket)
    w_b = Window.partitionBy(*key_cols, "_b").orderBy(F.col("_ts").desc())
    last_in_bucket = (
        rb.withColumn("_rn", F.row_number().over(w_b))
        .filter(F.col("_rn") == 1)
        .select(*key_cols, "_b", "_rpay")
    )

    # stage 2: cumulative prior payload per (key, bucket) over the union of
    # bucket ids seen on EITHER side (so empty right buckets inherit)
    l_b = left.select(*key_cols, bcol.alias("_b")).distinct()
    all_b = l_b.unionByName(last_in_bucket.select(*key_cols, "_b")).distinct()
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = all_b.join(last_in_bucket, [*key_cols, "_b"], "left").select(
        *key_cols,
        "_b",
        F.last("_rpay", ignorenulls=True).over(w_cum).alias("_prior"),
    )

    # stage 3: union-tag fill within (key, bucket)
    l_tag = left.select(
        *key_cols,
        tsd.alias("_ts"),
        bcol.alias("_b"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(pay_type).alias("_rpay"),
    )
    r_tag = rb.select(
        *key_cols,
        "_ts",
        "_b",
        F.lit(0).alias("_side"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        "_rpay",
    )
    w_fill = (
        Window.partitionBy(*key_cols, "_b")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).withColumn(
        "_f", F.last("_rpay", ignorenulls=True).over(w_fill)
    )
    out = (
        filled.filter(F.col("_side") == 1)
        .join(prior, [*key_cols, "_b"], "left")
        .withColumn("_m", F.coalesce("_f", "_prior"))
    )
    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
