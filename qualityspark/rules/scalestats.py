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
     (a tiny in-plan aggregate broadcast back; the eager variant collects
     the <= ``buckets`` longs at the driver instead).

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


def _with_rn_lazy(df: DataFrame, key: Column,
                  tiebreaks: list | None = None,
                  buckets: int = 32,
                  rn_col: str = "_rn",
                  rank_col: str | None = None,
                  boundaries: list | None = None,
                  total_col: str | None = None) -> DataFrame:
    """Adds the exact global ``row_number`` (and optionally min-``rank``,
    and the total row count as ``total_col``) over ORDER BY key
    [, *tiebreaks] without a single-partition sort AND without a driver
    action (r7): the per-bucket offsets used to be collect()ed — one full
    extra scan and one extra job round-trip per helper call — and are now
    a tiny in-plan aggregate (<= buckets+2 rows, prefix-summed by exploding
    each count onto its later buckets so no SinglePartition node appears
    anywhere) broadcast-joined back on the bucket id.  Values are
    identical: same counts, same ascending-bucket cumulative offsets."""
    tiebreaks = tiebreaks or []
    if boundaries is None:
        boundaries = _boundaries(df, key, buckets)
    df = df.withColumn("_bkt", _bucket_expr(key, boundaries))
    cnt = df.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_c"))
    # prefix offsets WITHOUT a global-order window (the plan must stay free
    # of ANY SinglePartition funnel — tests/test_components.py pins that)
    # and without recomputing cnt: the possible bucket ids are known at
    # plan time ({-1} ∪ 0..len(boundaries)), so each count row is exploded
    # onto every possible target bucket, contributing its count to targets
    # strictly above it (the prefix sum) and to every target's total.  One
    # scan, <= (buckets+2)^2 tiny rows, hash-keyed aggregation only;
    # integer addition is order-free so the offsets are exactly the old
    # ascending-bucket cumulative sums.
    all_b = [-1] + list(range(len(boundaries) + 1))
    contrib = cnt.select(F.explode(F.array(*[
        F.struct(F.lit(b2).alias("_tb"),
                 F.when(F.col("_bkt") < F.lit(b2), F.col("_c"))
                 .otherwise(F.lit(0)).alias("_oc"),
                 F.col("_c").alias("_tc"))
        for b2 in all_b])).alias("_x")).select("_x.*")
    agg_cols = [F.sum("_oc").alias("_off")]
    if total_col is not None:
        agg_cols.append(F.sum("_tc").alias(total_col))
    offs = (contrib.groupBy("_tb").agg(*agg_cols)
            .withColumnRenamed("_tb", "_bkt"))
    df = df.join(F.broadcast(offs), "_bkt")
    w = Window.partitionBy("_bkt").orderBy(key, *tiebreaks)
    out = df.withColumn(rn_col, F.row_number().over(w) + F.col("_off"))
    if rank_col is not None:
        # min-rank: ties share the smallest row number; ties never straddle
        # buckets (bucket is a pure function of the key), so within-bucket
        # rank + bucket offset is the exact global rank
        wr = Window.partitionBy("_bkt").orderBy(key)
        out = out.withColumn(rank_col, F.rank().over(wr) + F.col("_off"))
    return out.drop("_bkt", "_off")


def with_global_order(df: DataFrame, key: Column,
                      tiebreaks: list | None = None,
                      buckets: int = 32,
                      rn_col: str = "_rn",
                      rank_col: str | None = None,
                      boundaries: list | None = None) -> tuple[DataFrame, int]:
    """Eager variant for callers that need the total row count as a
    Python int: pays the offset collect the lazy form avoids (the ntile /
    rank helpers all use ``_with_rn_lazy``)."""
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
        wr = Window.partitionBy("_bkt").orderBy(key)
        out = out.withColumn(rank_col, F.rank().over(wr) + off)
    return out.drop("_bkt"), total


def ntile_from_rn(rn: Column, n, k: int) -> Column:
    """Exact ntile(k) bucket from a global row_number over n rows: the
    first (n % k) tiles hold ceil(n/k) rows (ANSI ntile semantics, matching
    Spark's and DuckDB's window ntile).  ``n`` may be a Python int or an
    integral Column (the lazy total) — the arithmetic is integer-exact
    either way (double division of exact ints < 2^53, truncating int cast
    == floor for non-negatives)."""
    if isinstance(n, int):
        big, small, n_big = n // k + 1, max(1, n // k), n % k
        # max(1, .): when n < k the otherwise-branch is unreachable but
        # codegen may still evaluate it — keep the divisor nonzero
        big, small, n_big, cut = (F.lit(big), F.lit(small), F.lit(n_big),
                                  F.lit(n_big * big))
    else:
        nk = (n / F.lit(k)).cast("long")
        big = nk + 1
        small = F.greatest(nk, F.lit(1))
        n_big = n % F.lit(k)
        cut = n_big * big
    return (F.when(rn <= cut,
                   ((rn - 1) / big).cast("int") + 1)
            .otherwise(n_big.cast("int")
                       + ((rn - 1 - cut) / small).cast("int")
                       + 1))


def with_halves(df: DataFrame, key: Column, tiebreaks: list | None = None,
                buckets: int = 32, col: str = "half",
                boundaries: list | None = None) -> DataFrame:
    """Exact ntile(2) OVER (ORDER BY key, *tiebreaks) — scale-safe, and
    since r7 fully lazy (no counting action; the total rides along as a
    broadcast column).

    A straddle-only variant (window only the bucket containing the ntile
    cut, constant tile for every other bucket from the broadcast offsets)
    was measured in r7 and REJECTED: it trades the B-way-parallel bucket
    sort for one extra full scan (a union of two filtered branches), and
    at 100k-1M-row bench scale the extra scan costs ~0.1-0.2 s more than
    the sort it saves.  The bucketed window here is already parallel and
    bounded (no SinglePartition), so the sort is not a scale hazard."""
    out = _with_rn_lazy(df, key, tiebreaks, buckets,
                        boundaries=boundaries, total_col="_total")
    return (out.withColumn(col, ntile_from_rn(F.col("_rn"),
                                              F.col("_total"), 2))
            .drop("_rn", "_total"))


def with_ntile(df: DataFrame, key: Column, k: int,
               tiebreaks: list | None = None, buckets: int = 32,
               col: str = "tile") -> DataFrame:
    out = _with_rn_lazy(df, key, tiebreaks, buckets, total_col="_total")
    return (out.withColumn(col, ntile_from_rn(F.col("_rn"),
                                              F.col("_total"), k))
            .drop("_rn", "_total"))


def with_global_lag(df: DataFrame, key: Column,
                    tiebreaks: list | None = None,
                    lag_cols: list[str] | None = None,
                    buckets: int = 32,
                    suffix: str = "_prev") -> DataFrame:
    """Exact lag(col, 1) over a global ORDER BY without a single-partition
    sort: global row_number (bucketed) then an equi self-join on rn-1 —
    both sides hash-partition on _rn, no global funnel.  The lagged columns
    arrive as <col><suffix> (NULL for the first row).  Keeps ``_rn``."""
    out = _with_rn_lazy(df, key, tiebreaks, buckets)
    prev = out.select((F.col("_rn") + 1).alias("_rn"),
                      *[F.col(c).alias(c + suffix)
                        for c in (lag_cols or [])])
    return out.join(prev, "_rn", "left")


def with_running_sum(df: DataFrame, key: Column, value: Column,
                     tiebreaks: list | None = None, buckets: int = 32,
                     col: str = "_rsum") -> DataFrame:
    """Exact prefix sum of ``value`` over a global ORDER BY: within-bucket
    running-sum window + the cumulative sum of prior buckets' totals (a
    tiny in-plan aggregate broadcast back).  Floating-point note: the
    additions re-associate vs a strictly sequential scan — differences are
    ~1 ulp relative, far inside the round-4 comparisons these stats use."""
    d2 = df.withColumn("_v", value)
    bnds = _boundaries(d2, key, buckets)
    d2 = d2.withColumn("_bkt", _bucket_expr(key, bnds))
    # prior-bucket totals as a lazy in-plan aggregate + broadcast join
    # (r7 — the collect cost a full scan and a job round-trip).  Same
    # one-scan explode-onto-targets shape as _with_rn_lazy (no
    # SinglePartition funnel anywhere in the plan); because these totals
    # are DOUBLES the prior sums are folded over a sort_array'd struct
    # list in ascending _bkt order — the exact association of the old
    # sequential Python loop — and NULL bucket totals are filtered out
    # exactly like the loop's `or 0.0` / SQL sum's null-skip.
    cnt = d2.groupBy("_bkt").agg(F.sum("_v").alias("_s"))
    all_b = [-1] + list(range(len(bnds) + 1))
    contrib = cnt.select(F.explode(F.array(*[
        F.struct(F.lit(b2).alias("_tb"), F.col("_bkt"), F.col("_s"))
        for b2 in all_b])).alias("_x")).select("_x.*")
    offs = (contrib.groupBy("_tb")
            .agg(F.sort_array(F.collect_list(
                F.when(F.col("_bkt") < F.col("_tb"),
                       F.struct("_bkt", "_s")))).alias("_arr"))
            .select(F.col("_tb").alias("_bkt"),
                    F.aggregate(
                        F.filter("_arr", lambda x: x["_s"].isNotNull()),
                        F.lit(0.0),
                        lambda acc, x: acc + x["_s"]).alias("_roff")))
    d2 = d2.join(F.broadcast(offs), "_bkt")
    w = (Window.partitionBy("_bkt").orderBy(key, *(tiebreaks or []))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d2.withColumn(col, F.sum("_v").over(w) + F.col("_roff"))
            .drop("_v", "_bkt", "_roff"))


def with_value_ranks(df: DataFrame, value: Column, buckets: int = 32,
                     rank_col: str = "rk",
                     avg_rank_col: str | None = None) -> DataFrame:
    """Exact global min-rank (and scipy-convention average rank for ties:
    rank + (ties-1)/2) over ORDER BY value — the Mann-Whitney / Kruskal /
    ECDF building block, without the single-partition sort."""
    out = _with_rn_lazy(df, value, [], buckets, rank_col="_mr",
                        rn_col="_rn_tmp")
    out = out.drop("_rn_tmp").withColumnRenamed("_mr", rank_col)
    if avg_rank_col is not None:
        ties = F.count(F.lit(1)).over(Window.partitionBy(value))
        out = out.withColumn(avg_rank_col,
                             F.col(rank_col) + (ties - 1) / 2.0)
    return out
