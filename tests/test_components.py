"""Component tests: schema contract, drift compare, near-dup recall,
multimodal plumbing, heuristic SQL-free units."""

import datetime as dt

from pyspark.sql import functions as F

from qualityspark.schema_contract import validate_schema
from qualityspark.drift import compare_metrics
from qualityspark.rules import neardup as ND
from qualityspark.rules import multimodal as MM


# ---- schema contract (reference core/schema_validator.py analog) ----

def test_schema_contract(spark):
    df = spark.createDataFrame(
        [("https://a.org/1", 50.0, "en"),
         ("not a url", 150.0, "xx"),
         (None, -1.0, "en"),
         ("https://a.org/1", 70.0, "es")],
        "url string, score double, lang string")
    contract = {"columns": {
        "url": {"type": "string", "required": True, "not_null": True,
                "pattern": "^https?://", "unique": True},
        "score": {"type": "double", "min": 0, "max": 100},
        "lang": {"allowed_values": ["en", "es"]},
        "missing_col": {"required": True},
    }}
    res = {(r["check_id"], r["column"]): r for r in
           validate_schema(df, contract)}
    assert res[("SCHEMA_MISSING_COLUMN", "missing_col")]["passed"] is False
    assert res[("SCHEMA_NOT_NULL", "url")]["affected_count"] == 1
    assert res[("SCHEMA_PATTERN_VIOLATION", "url")]["affected_count"] == 1
    assert res[("SCHEMA_ALLOWED_VALUES", "lang")]["affected_count"] == 1
    assert res[("SCHEMA_UNIQUE_VIOLATION", "url")]["affected_count"] == 1
    range_viol = [r for r in validate_schema(df, contract)
                  if r["check_id"] == "SCHEMA_RANGE_VIOLATION"
                  and r["affected_count"] > 0]
    assert len(range_viol) == 2  # one below min, one above max


def test_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k1 int, k2 string")
    res = validate_schema(df, {"columns": {},
                               "composite_keys": [["k1", "k2"]]})
    assert res[0]["check_id"] == "COMPOSITE_KEY_VIOLATION"
    assert res[0]["affected_count"] == 1


# ---- drift compare (reference core/drift_detector.py analog) ----

def test_drift_compare():
    prev = {"n_docs": 1000, "keep_rate": 0.9, "avg_score": 95.0,
            "n_TEXT_NULL_LIKE": 10, "n_WORDS_TOO_FEW": 20}
    cur = {"n_docs": 1000, "keep_rate": 0.7, "avg_score": 80.0,
           "n_TEXT_NULL_LIKE": 150, "n_WORDS_TOO_FEW": 25}
    out = compare_metrics(prev, cur)
    assert out["trend"] == "DEGRADING"
    assert out["summary_severity"] == "HIGH"
    rules = {d["rule"]: d for d in out["drifts"]}
    assert rules["TEXT_NULL_LIKE"]["severity"] == "HIGH"
    assert "WORDS_TOO_FEW" not in rules  # 0.5pt delta below ladder


def test_drift_stable():
    m = {"n_docs": 100, "keep_rate": 0.9, "avg_score": 95.0}
    out = compare_metrics(m, dict(m))
    assert out["trend"] == "STABLE" and out["drifts"] == []


# ---- near-dup: LSH recall vs brute force on crafted docs ----

def _doc(words):
    return " ".join(words)


def test_lsh_finds_all_near_dups(spark):
    base = [f"w{i}" for i in range(100)]
    rows = []
    # 5 clusters of 3 near-identical docs (J >= 0.8) + 10 unrelated docs
    for c in range(5):
        words = [f"c{c}_{w}" for w in base]
        rows.append((c * 10 + 0, _doc(words)))
        rows.append((c * 10 + 1, _doc(words[:95] + ["zz1", "zz2", "zz3",
                                                    "zz4", "zz5"])))
        rows.append((c * 10 + 2, _doc(words)))
    for u in range(10):
        rows.append((1000 + u, _doc([f"u{u}_{i}" for i in range(100)])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"])
           for r in ND.verified_near_dups(df, threshold=0.8).collect()}
    want = set()
    for c in range(5):
        want |= {(c * 10 + 0, c * 10 + 1), (c * 10 + 0, c * 10 + 2),
                 (c * 10 + 1, c * 10 + 2)}
    assert got == want  # perfect recall at these parameters, no spurious


def test_simhash_near_identical_collide(spark):
    words = [f"tok{i}" for i in range(200)]
    df = spark.createDataFrame(
        [(0, _doc(words)), (1, _doc(words)),            # identical
         (2, _doc([f"o{i}" for i in range(200)]))],     # unrelated
        "doc_id long, text string")
    s = {r["doc_id"]: r["sh"] for r in
         df.select("doc_id", ND.simhash64(F.col("text")).alias("sh"))
         .collect()}
    assert s[0] == s[1]
    assert s[0] != s[2]


def test_lsh_ann_recall_vs_bruteforce(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {}
    for r in ND.lsh_ann_topk(df, n_planes=4, k=3, dim=64).collect():
        exact.setdefault(r["qid"], []).append(r["neighbor_id"])
    # every query got up to 3 neighbors from its bucket, ordered by cosine
    assert len(exact) > 150  # most buckets are non-singleton at 4 planes


# ---- multimodal plumbing ----

def test_multimodal_extract(spark):
    rows = [(0, bytearray(b"\x89PNG\r\n" + b"\x00" * 100)),
            (1, bytearray(b"<html><body>hi</body></html>")),
            (2, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r["id"]: r for r in MM.extract_features(df).collect()}
    assert got[0]["format_guess"] == "png"
    assert got[0]["nul_frac"] > 0.9
    assert got[1]["format_guess"] == "html"
    assert got[2]["n_bytes"] == 0
    assert len(got[0]["features"]) == MM.FEATURE_DIM
    # deterministic features
    again = {r["id"]: r for r in MM.extract_features(df).collect()}
    assert got[0]["features"] == again[0]["features"]
