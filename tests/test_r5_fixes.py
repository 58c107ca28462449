"""Round-5 regression tests for the r4 ADVICE findings: non-ISO date
ladders in typed views, arbitrary CSV headers, native-typed ingest_id
tiebreak parity, statistic-vs-rate affected counts, and batch exit codes."""

import pytest

from qualityspark.csv_audit import _affected, audit_csv, batch_exit_code
from qualityspark.oracle import _dedup_order_key
from qualityspark.reports import build_recommendations


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_non_iso_date_column_parses_through_ladder(spark, tmp_path):
    """A detected dd/MM/yyyy DATE column must type through the same format
    ladder detection counted with — NOT fire DATE_INVALID_PARSED ~100%
    (r4 ADVICE high; reference checks/date_checks.py shares DATE_FORMATS)."""
    rows = [f"R{i:04d},{(i % 28) + 1:02d}/{(i % 12) + 1:02d}/2024"
            for i in range(120)]
    rows[7] = "R9999,31/12/2095"            # one future date
    rep = audit_csv(spark, _write(tmp_path / "d.csv",
                                  ["rid,fecha"] + rows))
    assert rep["column_types"]["fecha"] == "DATE"
    fired = {c["check_id"]: c for c in rep["columns"]["fecha"]["checks"]
             if not c["passed"]}
    assert "DATE_INVALID_PARSED" not in fired
    assert "DATE_FUTURE" in fired
    assert fired["DATE_FUTURE"]["value"] == pytest.approx(1 / 120, abs=1e-4)


def test_dotted_datetime_format_parses(spark, tmp_path):
    rows = [f"{(i % 28) + 1:02d}.{(i % 12) + 1:02d}.2023" for i in range(110)]
    rep = audit_csv(spark, _write(tmp_path / "d2.csv", ["when"] + rows))
    assert rep["column_types"]["when"] == "DATE"
    assert not any(c["check_id"] == "DATE_INVALID_PARSED"
                   for c in rep["columns"]["when"]["checks"]
                   if not c["passed"])


def test_arbitrary_headers_survive_typed_view(spark, tmp_path):
    """Headers with spaces, hyphens, dots and SQL keywords must audit
    cleanly — the typed view resolves columns without f-string SQL
    (r4 ADVICE medium)."""
    hdr = "order id,total-amount,a.b,select"
    rows = [f"O{i:03d},{i}.5,{i},2024-01-{(i % 28) + 1:02d}"
            for i in range(120)]
    rep = audit_csv(spark, _write(tmp_path / "h.csv", [hdr] + rows))
    assert rep["n_columns"] == 4
    assert rep["column_types"]["total-amount"] == "NUMERIC_CONTINUOUS"
    assert rep["column_types"]["a.b"] in ("NUMERIC_DISCRETE",
                                          "NUMERIC_CONTINUOUS",
                                          "ID_CANDIDATE")
    assert rep["column_types"]["select"] == "DATE"


def test_oracle_ingest_id_orders_natively():
    """Numeric ingest ids must order numerically (9 < 10), matching the
    Spark window over the native column (r4 ADVICE medium)."""
    base = {"warc_ts": "2024-01-01T00:00:00Z",
            "url": "https://example.org/a", "text": "same text"}
    k9 = _dedup_order_key({**base, "ingest_id": 9})
    k10 = _dedup_order_key({**base, "ingest_id": 10})
    assert k9 < k10                      # lexicographic would say '10'<'9'
    ka = _dedup_order_key({**base, "ingest_id": "a"})
    kb = _dedup_order_key({**base, "ingest_id": "b"})
    assert ka < kb                       # strings still order as strings


def test_affected_semantics():
    n = 1000
    rate = _affected({"check_id": "NULL_RATE", "value": 0.25}, n)
    assert rate == {"affected_count": 250, "affected_pct": 0.25}
    skew = _affected({"check_id": "DISTRIBUTION_SKEW", "value": 2.5}, n)
    assert skew == {"affected_count": None, "affected_pct": None}
    benford = _affected({"check_id": "BENFORD_LAW", "value": 0.02}, n)
    assert benford["affected_count"] is None
    rare = _affected({"check_id": "RARE_CATEGORIES", "value": 12}, n)
    assert rare == {"affected_count": 12, "affected_pct": 0.012}


def test_recommendations_none_safe_ranking():
    rules = [
        {"rule": "DISTRIBUTION_SKEW", "severity": "MEDIUM",
         "affected_count": None, "affected_pct": None, "column": "x"},
        {"rule": "WHITESPACE_ISSUES", "severity": "MEDIUM",
         "affected_count": 40, "affected_pct": 0.04, "column": "x"},
        {"rule": "NULL_RATE", "severity": "HIGH",
         "affected_count": 10, "affected_pct": 0.01, "column": "x"},
    ]
    recs = build_recommendations(rules)
    assert [r["rule"] for r in recs] == [
        "NULL_RATE", "WHITESPACE_ISSUES", "DISTRIBUTION_SKEW"]


def test_batch_exit_code_counts_failures():
    clean = {"files": {"a.csv": {"exit_code": 0}}, "failed_files": {}}
    assert batch_exit_code(clean) == 0
    all_failed = {"files": {}, "failed_files": {"b.csv": "header-only"}}
    assert batch_exit_code(all_failed) == 1
    mixed = {"files": {"a.csv": {"exit_code": 2}},
             "failed_files": {"b.csv": "empty"}}
    assert batch_exit_code(mixed) == 2


def test_high_cardinality_categorical_bounded_driver(spark, tmp_path):
    """A relative-cardinality CATEGORICAL column (many distinct values,
    ratio < 0.15) must audit with O(cap) driver memory: exact n_rare /
    n_case_groups from Spark aggregates, only capped samples collected
    (r4 VERDICT item 1)."""
    n, k = 30000, 2000
    rows = [f"r{i},cat{i % k:04d}" for i in range(n)]
    rows[17] = "r17,CAT0001"            # one casing variant
    rep = audit_csv(spark, _write(tmp_path / "hc.csv", ["rid,cat"] + rows))
    assert rep["column_types"]["cat"] == "CATEGORICAL"
    info = rep["columns"]["cat"]
    assert len(info.get("categories", [])) <= 50
    fired = {c["check_id"]: c for c in info["checks"] if not c["passed"]}
    # every category is ~0.05% of rows -> all rare; count is EXACT even
    # though only 5 samples come back
    assert fired["RARE_CATEGORIES"]["value"] >= k - 1
    assert len(fired["RARE_CATEGORIES"].get("sample_values", [])) <= 5
    assert "CASE_INCONSISTENCY" in fired
    assert fired["CASE_INCONSISTENCY"]["value"] == 1


def test_chunk_fingerprint_parity_and_dups(spark):
    """chunk_fingerprint must match DuckDB's digest chain exactly on
    adversarial texts (unicode, chunk-boundary lengths) and collapse
    identical texts to one fingerprint (r4 VERDICT item 2)."""
    import duckdb
    from pyspark.sql import functions as F

    from qualityspark.rules import neardup as ND

    texts = ["a", "x" * 63, "y" * 64, "z" * 65, "hello world " * 40,
             "café — naïve 你好" * 10,
             "dup text " * 7, "dup text " * 7]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id",
                     ND.chunk_fingerprint(F.col("text")).alias("fp"))
           .collect()}
    ck = ND.FINGERPRINT_CHUNK
    want = {i: duckdb.sql(f"""
        SELECT CAST(('0x' || substring(md5(array_to_string(
            list_transform(range(0, CAST(ceil(length(?) / {ck}.0) AS BIGINT)),
                i -> substring(md5(substring(?, CAST(i * {ck} + 1 AS INT),
                                             {ck})), 1, 15)), '')), 1, 15))
            AS BIGINT) % {ND.MERSENNE}""",
                          params=[t, t]).fetchone()[0]
            for i, t in enumerate(texts)}
    assert got == want
    assert got[6] == got[7] and len(set(got.values())) == len(texts) - 1


def test_no_tracked_cache_outlives_release(spark):
    """caching.py protocol (r4 VERDICT item 4): cache-creating plan
    builders (audit's narrow projection, LSH's shingle frame) register
    their persists; release_caches() empties executor storage entirely."""
    from qualityspark.caching import release_caches
    from qualityspark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    release_caches()                     # clean slate from earlier tests
    # baseline: the session-scoped pages_small fixture cache (and nothing
    # else) may legitimately be resident when the full suite runs
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    QUERIES["minhash_near_dups"](spark, sf).collect()
    QUERIES["audit_pipeline_summary"](spark, sf).collect()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert jmap.size() > base            # the barriers really persisted
    assert release_caches() >= 2
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == base


def test_benford_first_significant_digit(spark, tmp_path):
    """Benford digit extraction matches the reference definition
    (f'{x:.10e}'[0], benford_check.py:31): fractional values included,
    10-significant-digit rounding, zeros excluded (r4 VERDICT item 8)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    vals = [rng.uniform(1e-6, 1.0) * 10 ** rng.randint(-6, 12)
            for _ in range(400)]
    vals += [0.999999999999, 9.99999999999, 0.0042, -0.57, 123.456,
             99999999999.9, 1.0, -1e-9, 0.5, 0.05]
    df = spark.createDataFrame([(float(x),) for x in vals], "v double")
    got = [r["d"] for r in df.select(
        F.substring(F.format_string("%.10e", F.abs(F.col("v"))), 1, 1)
        .alias("d")).collect()]
    want = [f"{abs(x):.10e}"[0] for x in vals]
    assert got == want
    # the 11-nines magnitudes round UP to the next decade, like Python
    assert f"{0.999999999999:.10e}"[0] == "1"


def test_benford_fires_on_fractional_column(spark, tmp_path):
    """A column of values in (0,1) must feed the Benford counter (r4
    excluded |v| < 1 entirely, silencing BENFORD_LAW on e.g. rates)."""
    import math
    import random
    rng = random.Random(3)
    # anti-Benford fractional data: first significant digit uniform
    rows = [f"{rng.uniform(1.0, 9.99) * 10 ** -rng.randint(1, 4):.6f}"
            for _ in range(300)]
    rep = audit_csv(spark, _write(tmp_path / "b.csv", ["rate"] + rows))
    checks = {c["check_id"]: c for c in rep["columns"]["rate"]["checks"]}
    assert "BENFORD_LAW" in checks      # enough nonzero digits counted
    # uniform first digits -> MAD way over the 0.015 Nigrini bound
    assert checks["BENFORD_LAW"]["value"] > 0.015
    assert checks["BENFORD_LAW"]["severity"] == "MEDIUM"


def _py_normality(vals):
    """Pure-Python replica of the anderson_darling / lilliefors_ks
    formulas (same erfc polynomial, same estimates) for parity checks."""
    import math
    n = len(vals)
    m = sum(vals) / n
    sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (n - 1))
    zs = sorted((v - m) / sd for v in vals)

    def phi_pair(z):
        u = abs(z) / 1.4142135623730951
        t = 1.0 / (1.0 + 0.3275911 * u)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                    + t * (-1.453152027 + t * 1.061405429))))
        c = max(poly * math.exp(-u * u), 1e-300)
        return ((1.0 - 0.5 * c, 0.5 * c) if z >= 0
                else (0.5 * c, 1.0 - 0.5 * c))

    s = 0.0
    d = 0.0
    for i, z in enumerate(zs, start=1):
        phi, comp = phi_pair(z)
        s += (2 * i - 1) * math.log(phi) + (2 * n + 1 - 2 * i) * math.log(comp)
        d = max(d, i / n - phi, phi - (i - 1) / n)
    return -n - s / n, d


def test_normality_tests_match_pure_python(spark, tmp_path):
    """anderson_darling / lilliefors_ks agree with a pure-Python replica
    on a synthetic events table, and their verdicts separate normal from
    uniform data (real tests, not the r1-r4 Jarque-Bera stand-in)."""
    import random

    from qualityspark.queries import QUERIES

    rng = random.Random(11)
    for gen, should_reject in (
            (lambda: rng.gauss(50.0, 8.0), False),
            (lambda: rng.uniform(0.0, 100.0), True)):
        vals = [gen() for _ in range(1500)]
        d = tmp_path / f"ev{should_reject}"
        d.mkdir()
        spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)],
            "event_id long, value double").write.parquet(
            str(d / "events.parquet"))
        ad = QUERIES["anderson_darling"](spark, str(d)).first()
        ks = QUERIES["lilliefors_ks"](spark, str(d)).first()
        a2_py, d_py = _py_normality(vals)
        assert ad["a2_stat"] == pytest.approx(a2_py, abs=2e-4)
        assert ks["d_stat"] == pytest.approx(d_py, abs=2e-4)
        assert ad["reject_normal"] == should_reject
        assert ks["reject_normal"] == should_reject


def test_drift_query_invariants(spark):
    """Mathematical invariants the DuckDB oracle cannot enforce (a
    same-way-wrong formula passes cross-engine): PSI >= 0 with identical
    halves -> ~0; JSD within [0, ln 2]; W1 >= 0 and bounded by the value
    span; centroid cosine in [-1, 1] with L2 >= 0."""
    import math

    from pyspark.sql import functions as F

    from qualityspark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    psi = QUERIES["psi_value_halves"](spark, sf).first()
    assert psi["psi"] >= 0.0
    assert psi["verdict"] in ("stable", "moderate", "major")

    jsd = QUERIES["js_divergence_lang"](spark, sf).first()
    assert 0.0 <= jsd["jsd_nats"] <= math.log(2) + 1e-9
    assert jsd["jsd_bits"] == pytest.approx(
        jsd["jsd_nats"] / math.log(2), abs=2e-6)

    w1 = QUERIES["wasserstein_value_halves"](spark, sf).first()
    ev = spark.read.parquet(f"{sf}/events.parquet").agg(
        F.min("value"), F.max("value")).first()
    assert 0.0 <= w1["w1_dist"] <= (ev[1] - ev[0])

    cd = QUERIES["embedding_centroid_drift"](spark, sf).first()
    # NOTE: parity halves of a zero-centered corpus have NOISE centroids,
    # so the cosine itself is arbitrary — only the bounds are invariant.
    assert -1.0 <= cd["centroid_cos"] <= 1.0
    assert cd["centroid_l2"] >= 0.0
    assert cd["drifted"] == (cd["centroid_cos"] < 0.99)
