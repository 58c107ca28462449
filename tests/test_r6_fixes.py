"""Regression pins for the r5 ADVICE fixes (round 6).

One test per advisory item: empty-text chunk fingerprints, empty-column
normality statistics, Wasserstein degenerate parity, Java-regex contract
patterns, and the dedup tiebreak's mixed-type equality.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from qualityspark.rules import neardup as ND


def test_chunk_fingerprint_empty_text_matches_duckdb(spark):
    """n_chunks = 0 fingerprints as NULL in both engines (r5 ADVICE:
    Spark's sequence(0, -1) yielded two bogus digests for '' where
    DuckDB's range(0, 0) nulls through)."""
    df = spark.createDataFrame([("",), ("ab",)], "text string")
    got = {r["text"]: r["fp"] for r in
           df.select("text",
                     ND.chunk_fingerprint(F.col("text")).alias("fp"))
           .collect()}
    con = duckdb.connect()
    want = {t: con.execute(f"""
        SELECT CAST(('0x' || substring(md5(array_to_string(
            list_transform(range(0, CAST(ceil(length(?) / 64.0) AS BIGINT)),
                i -> substring(md5(substring(?, CAST(i * 64 + 1 AS INT),
                                             64)), 1, 15)), '')), 1, 15))
            AS BIGINT) % 2147483647""", [t, t]).fetchone()[0]
            for t in ("", "ab")}
    assert got == want


def test_normality_stats_survive_empty_column(spark, tmp_path):
    """anderson_darling / lilliefors_ks on a zero-row value column must
    return their SQL-twin shapes, not ZeroDivisionError (r5 ADVICE)."""
    from qualityspark.queries import anderson_darling, lilliefors_ks
    sf = tmp_path / "sf_empty"
    sf.mkdir()
    spark.createDataFrame(
        [], "event_id long, ts timestamp, value double, props string"
    ).write.parquet(str(sf / "events.parquet"))
    ad = anderson_darling(spark, str(sf))
    assert ad.columns == ["a2_stat", "a2_adj", "reject_normal"]
    assert ad.count() == 0          # SQL GROUP BY n over 0 rows: 0 groups
    lf = lilliefors_ks(spark, str(sf)).collect()
    assert len(lf) == 1             # SQL bare aggregate: 1 all-null row
    assert lf[0]["d_stat"] is None and lf[0]["reject_normal"] is None


def test_wasserstein_constant_column_null_both_engines(spark, tmp_path):
    """hi == lo (constant column): Spark already returned NULL; the SQL
    twin's final scale now nullif's the span so DuckDB agrees."""
    from qualityspark.queries import (wasserstein_value_halves,
                                      ORACLES)
    sf = tmp_path / "sf_const"
    sf.mkdir()
    rows = [(i, f"2026-01-{(i % 27) + 1:02d} 00:00:00", 5.0, None)
            for i in range(40)]
    spark.createDataFrame(
        rows, "event_id long, ts string, value double, props string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "value", "props"
                 ).write.parquet(str(sf / "events.parquet"))
    got = wasserstein_value_halves(spark, str(sf)).collect()
    assert len(got) == 1 and got[0]["w1_dist"] is None
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW events AS
                    SELECT * FROM '{sf}/events.parquet/*.parquet'""")
    want = con.execute(ORACLES["wasserstein_value_halves"]).fetchall()
    assert len(want) == 1 and want[0][0] is None


def test_contract_pattern_translated_to_java(tmp_path):
    """(?P<name>...) passes Python re but crashes JVM rlike mid-audit —
    load_contract must translate it to the Java spelling up front; the
    Java-less conditional construct must be rejected at load."""
    import json
    from qualityspark.schema_contract import load_contract
    p = tmp_path / "c.json"
    p.write_text(json.dumps(
        {"columns": {"url": {"pattern": r"(?P<scheme>https?)://"}}}))
    contract = load_contract(str(p))
    assert contract["columns"]["url"]["pattern"] == r"(?<scheme>https?)://"

    p2 = tmp_path / "c2.json"
    p2.write_text(json.dumps(
        {"columns": {"url": {"pattern": r"(?P<a>x)(?(a)y|z)"}}}))
    with pytest.raises(ValueError, match="java.util.regex"):
        load_contract(str(p2))

    p3 = tmp_path / "c3.json"
    p3.write_text(json.dumps(
        {"columns": {"url": {"pattern": r"(?P<a>x)-(?P=a)"}}}))
    contract3 = load_contract(str(p3))
    assert contract3["columns"]["url"]["pattern"] == r"(?<a>x)-\k<a>"


def test_native_or_str_mixed_type_equality_and_hash():
    """int 9 and str '9' must NOT compare equal (the str fallback made the
    dedup keep-row choice input-order-dependent); equal values still
    hash-equal so keys are usable in sets."""
    from qualityspark.oracle import _NativeOrStr
    assert _NativeOrStr(9) != _NativeOrStr("9")
    assert _NativeOrStr(9) == _NativeOrStr(9)
    assert hash(_NativeOrStr(9)) == hash(_NativeOrStr(9))
    assert len({_NativeOrStr(9), _NativeOrStr(9), _NativeOrStr("9")}) == 2
    # ordering fallback unchanged: deterministic str order on TypeError
    assert (_NativeOrStr(10) < _NativeOrStr("9")) == ("10" < "9")


def test_brute_force_baseline_refuses_corpus(spark):
    """r5 VERDICT item 8: the O(n^2) baseline must not be pointable at a
    corpus — a frame above the row cap raises before any pairwise work;
    below the cap it still runs."""
    big = spark.range(0, 1000).selectExpr(
        "id AS vec_id", "array(cast(id AS double)) AS embedding")
    with pytest.raises(ValueError, match="brute-force baseline"):
        ND.cosine_near_dup_pairs(big, max_rows=999)
    small = spark.range(0, 8).selectExpr(
        "id AS vec_id",
        "array(cast(1 AS double), cast(id AS double)) AS embedding")
    assert ND.cosine_near_dup_pairs(small, threshold=0.99).count() >= 0
