"""Keep-first duplicate flags (DUPLICATE_ROWS / ID_DUPLICATES analogs,
reference checks/universal_checks.py:52-84 and checks/id_checks.py:9-38).

Semantics: order rows by (warc_ts NULLS LAST, url NULLS LAST); the first row
per key survives, later ones get the duplicate flag (pandas
``duplicated(keep='first')`` with an explicit total order).

Scale design — the naive version is a row_number window over the full table
per key, i.e. two full shuffles of WIDE rows (html/text/scrubbed text).
Instead:

  1. ``groupBy(key).count()`` — shuffles only (key, 1) pairs with map-side
     combine; keeps keys with count > 1 (the duplicate-candidate set).
  2. Join candidates back (AQE picks broadcast when the dup-key set is
     small) and window ONLY those rows — the window shuffle now carries the
     tiny (key, order) projection, not the corpus.
  3. Left-join the flagged (key, order) tuples to the main table — again
     broadcast for typical dup fractions, so the wide rows never shuffle.

Tie caveat: rows with identical (key, warc_ts, url) are all flagged; the
synthetic corpus guarantees unique warc_ts, and production tables should
add a unique ingest id to the order.  (pandas resolves such ties by file
order, which has no distributed analog.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityspark.rules.heuristics import is_null_like

ORDER_COLS = ["warc_ts", "url"]


def dedup_order():
    return [F.col("warc_ts").asc_nulls_last(),
            F.col("url").asc_nulls_last()]


def keep_first_flag(df: DataFrame, key_name: str, valid: Column,
                    flag_name: str, narrow: DataFrame | None = None,
                    broadcast_flags: bool = True) -> DataFrame:
    """Adds ``flag_name``: true iff the row is a non-first occurrence of
    df[key_name] among rows where ``valid`` holds; false otherwise.

    ``narrow``: optional pre-computed (cached) projection of the key +
    order columns — avoids re-scanning the corpus per branch (the dup-key
    aggregation and the candidate join each consume it).

    ``broadcast_flags``: broadcast the flagged-row table into the join-back
    so the wide corpus rows never shuffle (AQE does not convert the
    null-safe-equality SMJ on its own).  Correct default for web corpora
    where the flagged set is the duplicate TAIL (non-first copies only);
    set False when the duplicate fraction is so high the tail exceeds
    executor memory — the join then degrades to a sort-merge shuffle,
    which is the unavoidable classical dedup cost."""
    cols = [key_name] + [c for c in ORDER_COLS if c != key_name]
    src = narrow if narrow is not None else df
    valid_rows = src.filter(valid).select(*cols)
    dup_keys = (valid_rows.groupBy(key_name)
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .select(key_name))
    cand = valid_rows.join(dup_keys, key_name)
    w = Window.partitionBy(key_name).orderBy(*dedup_order())
    # .distinct(): rows fully tied on (key, warc_ts, url) produce one flag
    # row each; without it the eqNullSafe join-back below fans out (k tied
    # copies -> k^2 output rows).  With it, row counts are preserved; all
    # tied copies still get flag=true (pandas keep='first' keeps one by file
    # order, which has no distributed analog — documented tie semantics).
    flagged = (cand.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") > 1)
               .select(*[F.col(c).alias(f"_f_{c}") for c in cols],
                       F.lit(True).alias(flag_name))
               .distinct())
    # null-safe join: order columns may legitimately be NULL (nulls-last
    # ordering) and a plain equi-join would silently drop those matches
    cond = None
    for c in cols:
        e = F.col(c).eqNullSafe(F.col(f"_f_{c}"))
        cond = e if cond is None else (cond & e)
    if broadcast_flags:
        flagged = F.broadcast(flagged)
    out = df.join(flagged, cond, "left").drop(*[f"_f_{c}" for c in cols])
    return out.withColumn(flag_name,
                          F.coalesce(F.col(flag_name), F.lit(False)) & valid)


def text_sha_expr(text: Column | None = None) -> Column:
    """Dedup key: sha2 of non-null-like text (null otherwise)."""
    text = F.col("text") if text is None else text
    return F.when(~is_null_like(text), F.sha2(text, 256))


def with_dedup_flags(df: DataFrame,
                     narrow: DataFrame | None = None) -> DataFrame:
    """sig_TEXT_EXACT_DUPLICATE via sha2(text,256) key (hash, not full text,
    crosses the wire); sig_URL_DUPLICATE via url.  Expects a ``text_sha``
    column (pipeline adds it before dropping the raw text).

    ``narrow``: (text_sha, url, warc_ts) projection built from the RAW scan
    (pipeline.audit supplies it).  Critical for throughput: if the narrow
    frame is derived from ``df`` *after* the Arrow model pass, materializing
    its cache executes the entire model pass a second time; built from the
    scan it costs one scan + sha2."""
    if "text_sha" not in df.columns:
        df = df.withColumn("text_sha", text_sha_expr())
    if narrow is None:
        # one narrow scan (3 columns) serves all four flag branches — without
        # it each branch re-reads and re-hashes the corpus text
        narrow = df.select("text_sha", "url", "warc_ts").cache()
    df = keep_first_flag(df, "text_sha", F.col("text_sha").isNotNull(),
                         "sig_TEXT_EXACT_DUPLICATE", narrow=narrow)
    df = keep_first_flag(df, "url", ~is_null_like(F.col("url")),
                         "sig_URL_DUPLICATE", narrow=narrow)
    return df
