"""Keep-first duplicate flags (DUPLICATE_ROWS / ID_DUPLICATES analogs,
reference checks/universal_checks.py:52-84 and checks/id_checks.py:9-38).

Semantics: order rows by (warc_ts NULLS LAST, url NULLS LAST, text_sha
NULLS LAST); the first row per key survives, later ones get the duplicate
flag (pandas ``duplicated(keep='first')`` with an explicit total order).

Scale design — the naive version is a row_number window over the full table
per key, i.e. full shuffles of WIDE rows (html/text/scrubbed text), twice
(text key + url key).  Since round 3 the two key passes are FUSED into one
chain over an exploded (kind, key) projection:

  1. each narrow row emits up to two (kind, key) rows ('sha', text_sha)
     and ('url', url) — one projection, no shuffle;
  2. ONE ``groupBy(kind, key).count()`` — shuffles only (kind, key, 1)
     with map-side combine; keeps keys with count > 1;
  3. join candidates back (AQE picks broadcast when the dup-key set is
     small) and window ONLY those rows, partitioned by (kind, key) — the
     single window shuffle carries the tiny exploded projection;
  4. pivot the flagged rows to one row per (text_sha, url, warc_ts) triple
     carrying both flags, and LEFT-join that (broadcast) to the main table
     ONCE — the wide rows never shuffle, and the r2 version's second
     aggregation + second window + second join-back disappear (they were
     the measured serial fraction in the 4-vs-16-core scaling runs).

Tie caveat: the order key includes the full (warc_ts, url, text_sha)
triple, so ordering is deterministic; rows IDENTICAL on the whole triple
(byte-identical text + url + timestamp, i.e. true recrawl copies) are
interchangeable and — WITHOUT a tiebreaker — ALL get the duplicate flag,
while pandas keeps exactly one by file order (no distributed analog).
Supplying an ``ingest_id`` column closes the gap: any unique-per-row value
assigned at ingest (a WARC record offset, a file+row position, a UUID —
NOT ``monotonically_increasing_id``, which depends on partitioning and
breaks resume determinism).  When the input carries ``ingest_id``,
``with_dedup_flags`` appends it to the keep-first order and flags at
(triple, ingest_id) granularity, so fully-tied recrawl copies keep exactly
one row — matching pandas ``duplicated(keep='first')`` exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityspark.rules.heuristics import is_null_like

TRIPLE = ["text_sha", "url", "warc_ts"]


def text_sha_expr(text: Column | None = None) -> Column:
    """Dedup key: sha2 of non-null-like text (null otherwise)."""
    text = F.col("text") if text is None else text
    return F.when(~is_null_like(text), F.sha2(text, 256))


def _dup_flag_table(narrow: DataFrame,
                    tiebreaker: str | None = None) -> DataFrame:
    """One row per flagged (text_sha, url, warc_ts[, tiebreaker]) key with
    boolean ``_fb_sha`` / ``_fb_url`` columns — the single fused
    aggregation+window chain described in the module docstring."""
    key_cols = TRIPLE + ([tiebreaker] if tiebreaker else [])
    emit = F.array_compact(F.array(
        F.when(F.col("text_sha").isNotNull(), F.lit("sha")),
        F.when(~is_null_like(F.col("url")), F.lit("url"))))
    keyed = (narrow.select(*key_cols, F.explode(emit).alias("kind"))
             .withColumn("key", F.when(F.col("kind") == "sha",
                                       F.col("text_sha"))
                         .otherwise(F.col("url"))))
    dup_keys = (keyed.groupBy("kind", "key")
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .select("kind", "key"))
    cand = keyed.join(dup_keys, ["kind", "key"])
    order = [F.col("warc_ts").asc_nulls_last(),
             F.col("url").asc_nulls_last(),
             F.col("text_sha").asc_nulls_last()]
    if tiebreaker:
        order.append(F.col(tiebreaker).asc_nulls_last())
    w = Window.partitionBy("kind", "key").orderBy(*order)
    # groupBy(key_cols) both pivots the two kinds into one row AND — when
    # no tiebreaker distinguishes them — collapses fully-tied copies (each
    # emits its own flag row) to a single flag row, so the null-safe
    # join-back below never fans out; with a tiebreaker each copy keeps
    # its own flag row and the min-tiebreaker copy survives unflagged
    return (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .groupBy(*key_cols)
            .agg(F.max(F.col("kind") == "sha").alias("_fb_sha"),
                 F.max(F.col("kind") == "url").alias("_fb_url")))


def with_dedup_flags(df: DataFrame,
                     narrow: DataFrame | None = None,
                     broadcast_flags: bool = True,
                     tiebreaker: str | None = None) -> DataFrame:
    """sig_TEXT_EXACT_DUPLICATE via sha2(text,256) key (hash, not full text,
    crosses the wire); sig_URL_DUPLICATE via url.  Expects a ``text_sha``
    column (pipeline adds it before dropping the raw text).

    ``narrow``: (text_sha, url, warc_ts) projection built from the RAW scan
    (pipeline.audit supplies it, CACHED).  Critical for throughput: if the
    narrow frame is derived from ``df`` *after* the Arrow model pass,
    materializing its cache executes the entire model pass a second time;
    built from the scan it costs one scan + sha2.  When ``narrow`` is not
    supplied it is derived from ``df`` UNCACHED — the aggregation, the
    candidate join and the join-back then each re-evaluate it (~3 passes
    over df's plan); callers on a non-trivial df should pass a cached
    narrow projection as pipeline.audit does (r3 ADVICE).

    ``broadcast_flags``: broadcast the flagged-triple table into the
    join-back so the wide corpus rows never shuffle (AQE does not convert
    the null-safe-equality SMJ on its own).  Correct default for web
    corpora where the flagged set is the duplicate TAIL (non-first copies
    only); set False when the duplicate fraction is so high the tail
    exceeds executor memory — the join then degrades to a sort-merge
    shuffle, which is the unavoidable classical dedup cost.

    ``tiebreaker``: name of a unique-per-row ingest column (see module
    docstring tie caveat).  Auto-detected: an ``ingest_id`` column on
    ``df`` is used when the argument is None."""
    if "text_sha" not in df.columns:
        df = df.withColumn("text_sha", text_sha_expr())
    if tiebreaker is None and "ingest_id" in df.columns:
        tiebreaker = "ingest_id"
    key_cols = TRIPLE + ([tiebreaker] if tiebreaker else [])
    if narrow is None:
        narrow = df.select(*key_cols)
    flags = _dup_flag_table(narrow, tiebreaker)
    flags = flags.select(*[F.col(c).alias(f"_f_{c}") for c in key_cols],
                         "_fb_sha", "_fb_url")
    # null-safe join: url/warc_ts (and text_sha for null-like texts) may
    # legitimately be NULL and a plain equi-join would drop those matches
    cond = None
    for c in key_cols:
        e = F.col(c).eqNullSafe(F.col(f"_f_{c}"))
        cond = e if cond is None else (cond & e)
    if broadcast_flags:
        flags = F.broadcast(flags)
    out = df.join(flags, cond, "left").drop(*[f"_f_{c}" for c in key_cols])
    return (out.withColumn(
                "sig_TEXT_EXACT_DUPLICATE",
                F.coalesce(F.col("_fb_sha"), F.lit(False))
                & F.col("text_sha").isNotNull())
            .withColumn(
                "sig_URL_DUPLICATE",
                F.coalesce(F.col("_fb_url"), F.lit(False))
                & ~is_null_like(F.col("url")))
            .drop("_fb_sha", "_fb_url"))
