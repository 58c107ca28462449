"""Keep-first duplicate flags (DUPLICATE_ROWS / ID_DUPLICATES analogs,
reference checks/universal_checks.py:52-84 and checks/id_checks.py:9-38).

Semantics: order rows by (warc_ts NULLS LAST, url NULLS LAST); the first row
per key survives, later ones get the duplicate flag (pandas
``duplicated(keep='first')`` with an explicit total order).

Scale design: the flag is a row_number window over the key.  Rows whose key
is null/invalid never count as duplicates; instead of letting them pile into
one giant null partition (classic shuffle skew), each gets a unique salt key
so the shuffle stays balanced.  At 100 TB the right physical layout is a
table bucketed by ``sha2(text,256)`` which makes this window shuffle-free;
AQE skew-join splitting covers pathological hot keys otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qualityspark.rules.heuristics import is_null_like

def dedup_order():
    # lazy: Column construction needs an active session
    return [F.col("warc_ts").asc_nulls_last(),
            F.col("url").asc_nulls_last()]


def keep_first_flag(df: DataFrame, key: Column, valid: Column,
                    flag_name: str) -> DataFrame:
    """Adds ``flag_name``: true iff row is a non-first occurrence of ``key``
    among rows where ``valid``; false otherwise."""
    salted = F.when(valid, key).otherwise(
        F.concat(F.lit("__nodup__"), F.monotonically_increasing_id()))
    w = Window.partitionBy(salted).orderBy(*dedup_order())
    rn = F.row_number().over(w)
    return df.withColumn(flag_name, valid & (rn > 1))


def with_dedup_flags(df: DataFrame) -> DataFrame:
    """sig_TEXT_EXACT_DUPLICATE: exact text dup via sha2(text,256) key
    (hash shuffles cheaper than full text); sig_URL_DUPLICATE: url dup."""
    text_valid = ~is_null_like(F.col("text"))
    url_valid = ~is_null_like(F.col("url"))
    df = df.withColumn("text_sha", F.when(text_valid,
                                          F.sha2(F.col("text"), 256)))
    df = keep_first_flag(df, F.col("text_sha"), text_valid,
                         "sig_TEXT_EXACT_DUPLICATE")
    df = keep_first_flag(df, F.col("url"), url_valid, "sig_URL_DUPLICATE")
    return df
