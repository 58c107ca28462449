"""Scoring math pinned to the reference's exact-arithmetic vectors
(reference tests/test_new_features.py:103-122 analog: one HIGH + one MEDIUM
-> 85.0; deductions core/scoring_system.py:7-14; keep/drop mapping
data_quality_auditor.py:308-314)."""

from pyspark.sql import functions as F

from qualityspark import constants as C
from qualityspark.scoring import with_scores, lineage_table, metrics_table


def _mk(spark, fired: list[str]):
    df = spark.createDataFrame(
        [("https://x.example.org/1", None)], "url string, warc_ts timestamp")
    for rule, _ in C.DOC_RULES:
        df = df.withColumn(f"sig_{rule}", F.lit(rule in fired))
    return with_scores(df)


def test_high_plus_medium_is_85(spark):
    # NOTE: TS_NULL would fire from the null warc_ts; use text rules only
    r = _mk(spark, ["URL_MALFORMED", "MEAN_WORD_LEN_OOB", "TS_NULL"]).first()
    # HIGH 10 + MEDIUM 5 + MEDIUM 5 = 20
    assert float(r["score"]) == 80.0
    assert r["grade"] == "B"
    assert bool(r["keep"]) is True


def test_critical_drops(spark):
    r = _mk(spark, ["TEXT_NULL_LIKE"]).first()
    assert float(r["score"]) == 75.0
    assert bool(r["keep"]) is False  # any CRITICAL -> drop


def test_score_floor_zero(spark):
    fired = [rule for rule, sev in C.DOC_RULES if sev in ("CRITICAL", "HIGH")]
    r = _mk(spark, fired).first()
    assert float(r["score"]) == 0.0
    assert r["grade"] == "F"


def test_clean_doc_perfect(spark):
    r = _mk(spark, []).first()
    assert float(r["score"]) == 100.0
    assert r["grade"] == "A"
    assert bool(r["keep"]) is True
    assert r["rules_fired"] == []


def test_info_rules_do_not_deduct(spark):
    r = _mk(spark, ["PII_EMAIL", "PII_SSN_US"]).first()
    assert float(r["score"]) == 100.0
    assert bool(r["keep"]) is True
    assert sorted(r["rules_fired"]) == ["PII_EMAIL", "PII_SSN_US"]


def test_dataset_score_reference_arithmetic():
    """Pins the reference's weighted dataset score (core/scoring_system.py:
    81-94) with the reference's own test vectors (tests/test_new_features.py
    test_scoring_configurable / test_column_weights)."""
    from qualityspark.scoring import dataset_score
    # equal scores -> weights cancel (reference test_column_weights)
    assert dataset_score({"important": 90.0, "minor": 90.0},
                         {"important": 0.0, "minor": 0.0},
                         {"important": 5.0, "minor": 1.0}) == 90.0
    # default weight = 1/(1+null_pct): a and b equally null-free
    assert dataset_score({"a": 85.0, "b": 70.0},
                         {"a": 0.0, "b": 0.0}) == 77.5
    # nullier column down-weighted: w_a=1, w_b=1/2 -> (85 + 35)/(1.5) = 80
    assert dataset_score({"a": 85.0, "b": 70.0},
                         {"a": 0.0, "b": 1.0}) == 80.0
    assert dataset_score({}, {}) == 0.0


def test_metrics_weighted_score(spark):
    """weighted_score down-weights docs missing null-tracked fields:
    clean doc (w=1, score 100) + TS_NULL doc (w=1/(1+1/3)=0.75,
    score 95) -> (100 + 71.25) / 1.75 = 97.857..."""
    clean = _mk(spark, [])
    nully = _mk(spark, ["TS_NULL"])
    m = metrics_table(clean.unionByName(nully)).first()
    assert abs(m["avg_score"] - 97.5) < 1e-9
    expected = (100.0 * 1.0 + 95.0 * 0.75) / 1.75
    assert abs(m["weighted_score"] - expected) < 1e-9


def test_lineage_and_metrics(spark):
    df = _mk(spark, ["URL_MALFORMED", "PII_EMAIL"])
    lin = lineage_table(df).collect()
    got = {(r["rule"], r["severity"]) for r in lin}
    assert got == {("URL_MALFORMED", "HIGH"), ("PII_EMAIL", "INFO")}
    m = metrics_table(df).first()
    assert m["n_docs"] == 1
    assert m["n_URL_MALFORMED"] == 1
    assert m["n_TEXT_NULL_LIKE"] == 0
