"""CSV source (dialect sniff, permissive parse, typed view) + report sinks."""

import json
import os

from qualityspark.sources import (sniff_csv_dialect, read_csv_audited,
                                  typed_view)
from qualityspark import reports


def test_sniff_dialect():
    assert sniff_csv_dialect(b"a;b;c\n1;2;3\n4;5;6\n")["sep"] == ";"
    assert sniff_csv_dialect(b"a,b\n1,2\n")["sep"] == ","
    assert sniff_csv_dialect(b"a\tb\n1\t2\n")["sep"] == "\t"
    assert sniff_csv_dialect("añ,b\n1,2\n".encode("latin-1"))["encoding"] \
        == "ISO-8859-1"
    assert sniff_csv_dialect(b"\xef\xbb\xbfa,b\n1,2")["encoding"] == "UTF-8"


def test_read_csv_audited(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id;amount;when\n1;10.5;2024-01-01\n2;oops;2024-02-30\n"
                 "3;7;2024-03-03\n")
    df = read_csv_audited(spark, str(p))
    assert set(df.columns) >= {"id", "amount", "when"}
    t = typed_view(df, {"amount": "double", "when": "date"})
    rows = {r["id"]: r for r in t.collect()}
    assert rows["1"]["amount_typed"] == 10.5
    assert rows["2"]["amount_typed"] is None      # coerce, don't throw
    assert rows["2"]["when_typed"] is None        # invalid date
    assert str(rows["3"]["when_typed"]) == "2024-03-03"


def test_header_only_and_empty_rejected(spark, tmp_path):
    """Header-only / empty rejection (reference core/data_loader.py:66-67)."""
    import pytest
    ho = tmp_path / "header_only.csv"
    ho.write_text("id,amount,when\n")
    with pytest.raises(ValueError, match="header-only"):
        read_csv_audited(spark, str(ho))


def test_reports(spark, pages_small, tmp_path):
    from qualityspark.pipeline import audit
    out = reports.write_reports(spark, audit(pages_small),
                                str(tmp_path / "rep"), run_id="t1")
    rep = out["report"]
    assert rep["n_docs"] == 800
    assert 0 < rep["keep_rate"] < 1
    assert rep["rules"], "some rules must have fired on the dirty corpus"
    for name in ("report.json", "report.md", "report.txt", "report.html",
                 "executive_summary.txt"):
        assert os.path.exists(out["paths"][name])
    loaded = json.load(open(out["paths"]["report.json"]))
    assert loaded["grade"] == rep["grade"]
    assert "Verdict" in open(out["paths"]["executive_summary.txt"]).read()


def test_xlsx_sheet_layout():
    """The xlsx sink's sheet content (reference generate_report_excel.py
    analog) is pure data and testable without openpyxl; the actual write
    runs only where the optional dep exists."""
    report = {"run_id": "t1", "n_docs": 10, "keep_rate": 0.8,
              "avg_score": 91.0, "grade": "A",
              "issues_by_severity": {"CRITICAL": 1, "HIGH": 2, "MEDIUM": 0,
                                     "LOW": 0, "INFO": 0},
              "rules": [{"rule": "TEXT_NULL_LIKE", "severity": "CRITICAL",
                         "affected_count": 1, "affected_pct": 0.1}],
              "top_flagged": [{"rule": "TEXT_NULL_LIKE",
                               "severity": "CRITICAL", "n": 1}]}
    sheets = dict(reports.xlsx_sheets(report))
    assert set(sheets) == {"Summary", "Rules", "Top flagged"}
    assert ["documents", 10] in sheets["Summary"]
    assert ["CRITICAL", 1] in sheets["Summary"]
    assert sheets["Rules"][0] == ["rule", "severity", "affected", "pct"]
    assert sheets["Rules"][1][0] == "TEXT_NULL_LIKE"
    assert sheets["Top flagged"][1] == ["TEXT_NULL_LIKE", "CRITICAL", 1]

    try:
        import openpyxl  # noqa: F401
    except ImportError:
        assert reports.to_xlsx(report, "/tmp/never.xlsx") is False
    else:
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".xlsx") as f:
            assert reports.to_xlsx(report, f.name) is True


def test_recommendations_and_profile(spark, pages_small, tmp_path):
    """Recommended actions + per-column statistical profile (reference
    core/report_builder.py:199-225, 286-390): sections present in
    report.json and report.md, ranked CRITICAL-first, profile moments
    sane."""
    from qualityspark.pipeline import audit
    out = reports.write_reports(spark, audit(pages_small),
                                str(tmp_path / "rep2"), run_id="t2")
    rep = out["report"]

    recs = rep["recommendations"]
    assert recs and recs[0]["priority"] == 1
    prio = {"CRITICAL": 1, "HIGH": 2, "MEDIUM": 3, "LOW": 4}
    ranks = [prio[r["estimated_impact"]] for r in recs]
    assert ranks == sorted(ranks)          # severity-ordered
    assert all(r["action"] for r in recs)
    assert len(recs) <= 20
    by_rule = {r["rule"]: r for r in recs}
    if "TEXT_NULL_LIKE" in by_rule:
        assert by_rule["TEXT_NULL_LIKE"]["category"] == "completeness"

    prof = rep["column_profile"]
    sc = prof["numeric_columns"]["score"]
    assert 0 <= sc["min"] <= sc["median"] <= sc["max"] <= 100
    assert sc["percentiles"]["p25"] <= sc["percentiles"]["p75"]
    assert sc["iqr"] is not None and sc["iqr"] >= 0
    lang = prof["categorical_columns"]["lang"]
    assert lang["top_value"] and 0 < lang["top_freq"] <= 1
    assert prof["date_columns"]["warc_ts"]["distinct_days"] > 0

    md = open(out["paths"]["report.md"]).read()
    assert "## Recommendations" in md
    assert "## Column profile" in md
    loaded = json.load(open(out["paths"]["report.json"]))
    assert loaded["recommendations"] == recs


def test_friendly_titles():
    """Every live rule/check id renders a human-readable title in report
    rows (reference core/check_descriptions.py analog): no doc rule or
    CSV check falls back to its raw id, and the title propagates into
    the rules list, recommendations, and the executive summary."""
    from qualityspark import constants as C
    for rule, _sev in C.DOC_RULES:
        t = reports.friendly_title(rule)
        assert t and t != rule, rule
    assert reports.friendly_title("PII_EMAIL").startswith("Personal data")
    assert reports.friendly_title("BIZ_my_rule").startswith("Business rule")
    assert reports.friendly_title("UNKNOWN_X") == "UNKNOWN_X"  # fallback

    metrics = {"n_docs": 10, "keep_rate": 0.9, "avg_score": 80.0,
               "n_TEXT_NULL_LIKE": 3}
    rep = reports.build_report(metrics, [], run_id="tt")
    rule_row = rep["rules"][0]
    assert rule_row["title"] == "Empty or placeholder document body"
    rec = rep["recommendations"][0]
    assert rec["title"] == rule_row["title"]
    assert rec["business_impact"]          # completeness family text
    exec_txt = reports.executive_summary(rep)
    assert "Empty or placeholder document body" in exec_txt

    # business impact: per-rule override beats category fallback;
    # unknown rules fall back to their category text or empty
    assert "Mojibake" in reports.business_impact("ENCODING_ANOMALY")
    assert reports.business_impact("TEXT_NULL_LIKE") == \
        reports._CATEGORY_IMPACT["completeness"]
    assert reports.business_impact("PII_EMAIL") == \
        reports._CATEGORY_IMPACT["pii"]

    # semantic-type labels (reference friendly_type)
    from qualityspark import typeinfer as TI
    for t in TI.TYPE_LABELS:
        assert TI.friendly_type(t) != t
    assert TI.friendly_type("WEIRD") == "WEIRD"


def test_xlsx_new_sheets():
    """Recommendations + column-profile sheets appear when the report
    carries those sections (reference Excel workbook parity)."""
    report = {"run_id": "t3", "n_docs": 5, "keep_rate": 1.0,
              "avg_score": 100.0, "grade": "A",
              "issues_by_severity": {s: 0 for s in
                                     ("CRITICAL", "HIGH", "MEDIUM",
                                      "LOW", "INFO")},
              "rules": [], "top_flagged": [],
              "recommendations": [
                  {"priority": 1, "category": "completeness",
                   "rule": "NULL_RATE", "action": "fix it",
                   "estimated_impact": "HIGH", "affected_count": 2}],
              "column_profile": {"numeric_columns": {
                  "score": {"mean": 1, "median": 1, "std": 0, "min": 1,
                            "max": 1, "skewness": 0, "iqr": 0, "cv": 0,
                            "percentiles": {}}}}}
    sheets = dict(reports.xlsx_sheets(report))
    assert "Recommendations" in sheets and "Column profile" in sheets
    assert sheets["Recommendations"][1][2] == "NULL_RATE"
    assert sheets["Column profile"][1][0] == "score"


def test_html_presentation_parity():
    """Inline-CSS score card + severity color pills (reference
    generate_report_html.py:9-24 palette), lib-free (r4 VERDICT item 7)."""
    report = {"run_id": "t2", "n_docs": 100, "keep_rate": 0.9,
              "avg_score": 72.5, "grade": "C",
              "issues_by_severity": {"CRITICAL": 2, "HIGH": 5, "MEDIUM": 1,
                                     "LOW": 0, "INFO": 0},
              "rules": [{"rule": "TEXT_NULL_LIKE", "severity": "CRITICAL",
                         "affected_count": 2, "affected_pct": 0.02}],
              "recommendations": [
                  {"priority": 1, "rule": "TEXT_NULL_LIKE",
                   "title": "Null-like text", "action": "Drop rows",
                   "estimated_impact": "CRITICAL"}]}
    html = reports.to_html(report)
    assert "score-badge" in html
    assert reports.GRADE_COLORS["C"] in html          # grade-colored badge
    assert reports.SEVERITY_COLORS["CRITICAL"] in html  # severity pill
    assert "72.5/100" in html and "(C)" in html
    assert "Recommendations" in html and "Drop rows" in html
    assert "cdn" not in html.lower() and "<script" not in html.lower()
