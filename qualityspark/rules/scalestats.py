"""Scale-safe exact global ordering primitives.

The reference's split-half / rank statistics are defined over "file order"
(checks/hypothesis_checks.py:32-35) or over a global value order.  The
direct Spark translation — ``ntile/rank().over(Window.orderBy(...))`` with
no partitionBy — funnels the whole table through ONE task (Spark plans it
as ``Window [...] SinglePartition``), the classic 100x-scale killer
(SURVEY.md §7.4 item 2).

This module provides the bucketed two-pass alternative:

  1. sample the order key's quantiles once (``percentile_approx`` — a
     mergeable sketch, one narrow agg);
  2. assign each row a bucket by comparing the key to the (deduplicated)
     boundaries — equal keys always land in the same bucket, so rank ties
     never straddle buckets;
  3. window WITHIN each bucket (hash-partitioned shuffle, ~even by
     construction) and add the bucket's cumulative row-count offset
     (collected once at the driver: <= ``buckets`` longs).

The result is the EXACT global row_number / min-rank — identical output to
the single-partition window, but the sort is B-way parallel and no task
ever holds more than ~n/B rows.  Cost: one extra scan for the quantile
sketch + a tiny driver collect.

Skew note: a single key value holding >> 1/B of the table collapses into
one bucket (correctness unaffected; that bucket's task is large).  For the
continuous/timestamp keys these statistics run on, the quantile cuts keep
buckets balanced; heavy-tie categorical ranks should use a groupBy-value
histogram instead (two-pass rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def boundary_sketch_expr(key: Column, buckets: int) -> Column:
    """The aggregate expression `_boundaries` collects — exposed so callers
    that already run a driver-side agg (min/max, counts) can fold the
    quantile sketch into the SAME pass and hand the result to
    ``with_global_order(..., boundaries=...)``, saving one full scan."""
    probs = [i / buckets for i in range(1, buckets)]
    return F.percentile_approx(key, probs, 10_000)


def dedup_boundaries(bnds) -> list:
    uniq = []
    for b in bnds or []:
        if b is not None and (not uniq or b != uniq[-1]):
            uniq.append(b)
    return uniq


def _boundaries(df: DataFrame, key: Column, buckets: int) -> list:
    """Deduplicated quantile cut points of the (non-null) key."""
    row = df.agg(boundary_sketch_expr(key, buckets).alias("b")).head()
    return dedup_boundaries(row["b"])


def _bucket_expr(key: Column, bnds: list) -> Column:
    """bucket = number of boundaries strictly below the key (equal keys ->
    equal bucket).  NULL keys -> bucket -1 (they order first, matching
    asc_nulls_first; callers on null-free keys are unaffected)."""
    b = F.lit(0)
    for x in bnds:
        b = b + (key > F.lit(x)).cast("int")
    return F.when(key.isNull(), F.lit(-1)).otherwise(b)


def with_global_order(df: DataFrame, key: Column,
                      tiebreaks: list | None = None,
                      buckets: int = 32,
                      rn_col: str = "_rn",
                      rank_col: str | None = None,
                      boundaries: list | None = None) -> tuple[DataFrame, int]:
    """Adds the exact global ``row_number`` (and optionally min-``rank``)
    over ORDER BY key [, *tiebreaks] without a single-partition sort.

    Returns (df+columns, total_row_count) — the count comes free from the
    offset collect, so callers needing n (ntile maths) don't pay another
    action.

    ``boundaries``: precomputed (deduplicated) cut points — pass when the
    caller already collected ``boundary_sketch_expr`` in its own agg to
    avoid the extra sketch scan.
    """
    tiebreaks = tiebreaks or []
    if boundaries is None:
        boundaries = _boundaries(df, key, buckets)
    df = df.withColumn("_bkt", _bucket_expr(key, boundaries))
    counts = {r["_bkt"]: r["c"]
              for r in df.groupBy("_bkt").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    total, offsets = 0, {}
    for bkt in sorted(counts):
        offsets[bkt] = total
        total += counts[bkt]
    off = F.lit(0)
    for bkt, o in offsets.items():
        off = F.when(F.col("_bkt") == bkt, F.lit(o)).otherwise(off)

    w = Window.partitionBy("_bkt").orderBy(key, *tiebreaks)
    out = df.withColumn(rn_col, F.row_number().over(w) + off)
    if rank_col is not None:
        # min-rank: ties share the smallest row number; ties never straddle
        # buckets (bucket is a pure function of the key), so within-bucket
        # rank + bucket offset is the exact global rank
        wr = Window.partitionBy("_bkt").orderBy(key)
        out = out.withColumn(rank_col, F.rank().over(wr) + off)
    return out.drop("_bkt"), total


def ntile_from_rn(rn: Column, n: int, k: int) -> Column:
    """Exact ntile(k) bucket from a global row_number over n rows: the
    first (n % k) tiles hold ceil(n/k) rows (ANSI ntile semantics, matching
    Spark's and DuckDB's window ntile)."""
    big = n // k + 1
    # max(1, .): when n < k the otherwise-branch is unreachable but codegen
    # may still evaluate it — keep the divisor nonzero (ANSI mode safe)
    small = max(1, n // k)
    n_big = n % k
    cut = n_big * big  # rows covered by the big tiles
    return (F.when(rn <= F.lit(cut),
                   ((rn - 1) / F.lit(big)).cast("int") + 1)
            .otherwise(F.lit(n_big)
                       + ((rn - 1 - F.lit(cut)) / F.lit(small)).cast("int")
                       + 1))


def with_halves(df: DataFrame, key: Column, tiebreaks: list | None = None,
                buckets: int = 32, col: str = "half",
                boundaries: list | None = None) -> DataFrame:
    """Exact ntile(2) OVER (ORDER BY key, *tiebreaks) — scale-safe."""
    out, n = with_global_order(df, key, tiebreaks, buckets,
                               boundaries=boundaries)
    return (out.withColumn(col, ntile_from_rn(F.col("_rn"), n, 2))
            .drop("_rn"))


def with_ntile(df: DataFrame, key: Column, k: int,
               tiebreaks: list | None = None, buckets: int = 32,
               col: str = "tile") -> DataFrame:
    out, n = with_global_order(df, key, tiebreaks, buckets)
    return (out.withColumn(col, ntile_from_rn(F.col("_rn"), n, k))
            .drop("_rn"))


def with_global_lag(df: DataFrame, key: Column,
                    tiebreaks: list | None = None,
                    lag_cols: list[str] | None = None,
                    buckets: int = 32,
                    suffix: str = "_prev") -> DataFrame:
    """Exact lag(col, 1) over a global ORDER BY without a single-partition
    sort: global row_number (bucketed) then an equi self-join on rn-1 —
    both sides hash-partition on _rn, no global funnel.  The lagged columns
    arrive as <col><suffix> (NULL for the first row).  Keeps ``_rn``."""
    out, _ = with_global_order(df, key, tiebreaks, buckets)
    prev = out.select((F.col("_rn") + 1).alias("_rn"),
                      *[F.col(c).alias(c + suffix)
                        for c in (lag_cols or [])])
    return out.join(prev, "_rn", "left")


def with_running_sum(df: DataFrame, key: Column, value: Column,
                     tiebreaks: list | None = None, buckets: int = 32,
                     col: str = "_rsum") -> DataFrame:
    """Exact prefix sum of ``value`` over a global ORDER BY: within-bucket
    running-sum window + the cumulative sum of prior buckets' totals
    (collected once: <= ``buckets`` doubles).  Floating-point note: the
    additions re-associate vs a strictly sequential scan — differences are
    ~1 ulp relative, far inside the round-4 comparisons these stats use."""
    d2 = df.withColumn("_v", value)
    d2 = d2.withColumn("_bkt", _bucket_expr(key, _boundaries(d2, key,
                                                             buckets)))
    sums = {r["_bkt"]: r["s"]
            for r in d2.groupBy("_bkt").agg(F.sum("_v").alias("s"))
            .collect()}
    run, offs = 0.0, {}
    for b in sorted(sums):
        offs[b] = run
        run += sums[b] or 0.0
    off = F.lit(0.0)
    for b, o in offs.items():
        off = F.when(F.col("_bkt") == b, F.lit(o)).otherwise(off)
    w = (Window.partitionBy("_bkt").orderBy(key, *(tiebreaks or []))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d2.withColumn(col, F.sum("_v").over(w) + off)
            .drop("_v", "_bkt"))


def with_value_ranks(df: DataFrame, value: Column, buckets: int = 32,
                     rank_col: str = "rk",
                     avg_rank_col: str | None = None) -> DataFrame:
    """Exact global min-rank (and scipy-convention average rank for ties:
    rank + (ties-1)/2) over ORDER BY value — the Mann-Whitney / Kruskal /
    ECDF building block, without the single-partition sort."""
    out, _ = with_global_order(df, value, [], buckets, rank_col="_mr",
                               rn_col="_rn_tmp")
    out = out.drop("_rn_tmp").withColumnRenamed("_mr", rank_col)
    if avg_rank_col is not None:
        ties = F.count(F.lit(1)).over(Window.partitionBy(value))
        out = out.withColumn(avg_rank_col,
                             F.col(rank_col) + (ties - 1) / 2.0)
    return out
