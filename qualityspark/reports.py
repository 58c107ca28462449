"""Human report sinks (reference core/report_builder.py:22-146 +
generate_report_{md,html,executive}.py analogs).

All reports render from the tiny collected metrics row + top-lineage
aggregates — never from raw data (driver-side work stays O(rules), the
tables stay distributed).  Formats: json, md, txt, html; xlsx is
import-gated like the reference's optional deps (openpyxl absent here)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityspark import constants as C


def build_report(metrics_row: dict, top_rules: list[dict],
                 run_id: str = "run0", profile: dict | None = None,
                 cfg=None) -> dict:
    from qualityspark.config import resolve
    cfg = resolve(cfg)
    n = max(metrics_row.get("n_docs", 0), 1)
    rules = []
    for rule, sev in cfg.doc_rules():
        cnt = metrics_row.get(f"n_{rule}", 0)
        if cnt:
            rules.append({"rule": rule, "title": friendly_title(rule),
                          "severity": sev, "affected_count": int(cnt),
                          "affected_pct": round(cnt / n, 4)})
    rules.sort(key=lambda r: (C.SEVERITIES.index(r["severity"]),
                              -r["affected_count"]))
    issues_by_severity = {s: 0 for s in ("CRITICAL", "HIGH", "MEDIUM",
                                         "LOW", "INFO")}
    for r in rules:
        issues_by_severity[r["severity"]] += r["affected_count"]
    score = round(float(metrics_row.get("avg_score", 0.0)), 1)
    return {
        "run_id": run_id,
        "n_docs": int(metrics_row.get("n_docs", 0)),
        "keep_rate": round(float(metrics_row.get("keep_rate", 0.0)), 4),
        "avg_score": score,
        "grade": C.grade_from_score(score),
        "issues_by_severity": issues_by_severity,
        "rules": rules,
        "top_flagged": top_rules,
        "recommendations": build_recommendations(rules),
        "column_profile": profile or {},
    }


# ---------------------------------------------------------------------------
# Recommendations (reference core/report_builder.py:199-225
# _build_recommendations + :227-260 _recommend_action): per fired rule,
# ranked by severity priority then affected count, capped at 20, with a
# recommended action string and a coarse category.
# ---------------------------------------------------------------------------
RECOMMENDED_ACTIONS = {
    "TEXT_NULL_LIKE": "Drop or re-extract: document body is null-like",
    "URL_NULL": "Backfill source url from the crawl manifest",
    "URL_MALFORMED": "Normalize url scheme/host; re-validate extraction",
    "TEXT_EXACT_DUPLICATE": "Remove duplicate bodies or investigate "
                            "recrawl cadence",
    "URL_DUPLICATE": "Keep first crawl per url; check crawler dedup",
    "ENCODING_ANOMALY": "Re-decode source bytes; check charset detection",
    "HTML_BINARY_JUNK": "Exclude binary payloads at ingest (content-type "
                        "filter)",
    "TS_FUTURE": "Verify crawl timestamps: future dates indicate clock or "
                 "parse errors",
    "TS_ANCIENT": "Verify pre-1900 timestamps: likely parse errors",
    "TS_NULL": "Backfill warc_ts from the WARC record header",
    "WORDS_TOO_FEW": "Review extraction: very short bodies are usually "
                     "boilerplate-only pages",
    "WORDS_TOO_MANY": "Chunk or truncate very long documents",
    "MEAN_WORD_LEN_OOB": "Inspect tokenization: extreme mean word length "
                         "indicates junk or concatenation",
    "SYMBOL_WORD_RATIO_HIGH": "Strip markup/symbol runs before audit",
    "BULLET_LINES_HIGH": "Likely list/navigation page: review extraction",
    "ELLIPSIS_LINES_HIGH": "Truncated snippets: fetch full content",
    "ALPHA_RATIO_LOW": "Mostly non-alphabetic tokens: check for tables/"
                       "code dumps",
    "REQUIRED_STOPWORDS_MISSING": "Likely non-prose or wrong language tag",
    "STOPWORD_DENSITY_LOW": "Low function-word density: verify language "
                            "and prose quality",
    "REPETITION_HIGH": "Deduplicate repeated blocks within the document",
    "CAPS_RATIO_HIGH": "Normalize casing; check for shouting/boilerplate",
    "WHITESPACE_UNSTRIPPED": "Trim leading/trailing whitespace at ingest",
    "TRUNCATION_SIGNS": "Document ends mid-sentence: fetch full content",
    "LANG_NOT_ALLOWED": "Route to the language-specific pipeline or drop",
    "LANG_MISMATCH": "Re-run language id; declared tag disagrees with "
                     "prediction",
    "PERPLEXITY_HIGH": "Gibberish-like text: review extraction and "
                       "encoding",
    "TOXICITY_HIGH": "Review toxic-token density; scrubbed copy provided",
    # CSV-audit check ids (reference core/report_builder.py:227-260)
    "NULL_RATE": "Investigate null source; consider imputation or "
                 "exclusion",
    "DUPLICATE_ROWS": "Remove duplicate rows or investigate their origin",
    "OUTLIER_IQR": "Review outliers: capture errors vs legitimate "
                   "extremes",
    "OUTLIER_ZSCORE": "Review z-score outliers: possible measurement "
                      "errors",
    "DISTRIBUTION_SKEW": "Assess whether skew affects analysis; consider "
                         "a transform",
    "ZERO_VALUES": "High zero fraction: confirm zeros are real values, "
                   "not null stand-ins",
    "NEGATIVE_VALUES": "Verify negatives are valid for this field",
    "BENFORD_LAW": "First-digit distribution deviates from Benford: "
                   "screen for fabricated or truncated values",
    "DATE_FORMAT_MIX": "Standardize date format to ISO 8601",
    "DATE_FUTURE": "Verify future dates: likely capture error",
    "DATE_ANCIENT": "Verify pre-1900 dates: likely data error",
    "DATE_INVALID_PARSED": "Fix unparseable date values",
    "ID_DUPLICATES": "Duplicate ids: verify referential integrity",
    "ID_NULL": "Null ids break joins: backfill or drop",
    "EMAIL_FORMAT": "Normalize or quarantine invalid email values",
    "PHONE_FORMAT": "Normalize or quarantine invalid phone values",
    "RARE_CATEGORIES": "Review rare categories: typos vs genuine "
                       "long-tail values",
    "CASE_INCONSISTENCY": "Normalize category casing",
    "CONSTANT_COLUMN": "Column carries no information: drop or verify "
                       "extraction",
    "WHITESPACE_ISSUES": "Trim leading/trailing whitespace at ingest",
    "TYPE_COERCION_FAILED": "Fix values that fail numeric coercion",
}
_PII_ACTION = ("PII scrubbed in output; verify masking coverage at the "
               "source")

# Executive-friendly titles per rule/check id (reference
# core/check_descriptions.py CHECK_FRIENDLY_TITLE — our own wording for
# this engine's rule set; unknown ids fall back to the id itself).
FRIENDLY_TITLES = {
    "TEXT_NULL_LIKE": "Empty or placeholder document body",
    "URL_NULL": "Missing source URL",
    "URL_MALFORMED": "Malformed source URL",
    "TEXT_EXACT_DUPLICATE": "Duplicate document body",
    "URL_DUPLICATE": "Repeated URL (recrawl)",
    "ENCODING_ANOMALY": "Broken character encoding",
    "HTML_BINARY_JUNK": "Binary payload where HTML expected",
    "TS_FUTURE": "Crawl timestamp in the future",
    "TS_ANCIENT": "Implausibly old timestamp",
    "TS_NULL": "Missing crawl timestamp",
    "WORDS_TOO_FEW": "Document too short",
    "WORDS_TOO_MANY": "Document extremely long",
    "MEAN_WORD_LEN_OOB": "Unnatural word lengths",
    "SYMBOL_WORD_RATIO_HIGH": "Symbol-heavy text",
    "BULLET_LINES_HIGH": "Mostly bullet/list lines",
    "ELLIPSIS_LINES_HIGH": "Many truncated lines",
    "ALPHA_RATIO_LOW": "Mostly non-alphabetic tokens",
    "REQUIRED_STOPWORDS_MISSING": "Missing common function words",
    "STOPWORD_DENSITY_LOW": "Low natural-language density",
    "REPETITION_HIGH": "Heavily repeated phrasing",
    "CAPS_RATIO_HIGH": "Excessive capitalization",
    "WHITESPACE_UNSTRIPPED": "Leading/trailing whitespace",
    "TRUNCATION_SIGNS": "Document ends mid-sentence",
    "LANG_NOT_ALLOWED": "Language outside the allowed set",
    "LANG_MISMATCH": "Declared language disagrees with detection",
    "PERPLEXITY_HIGH": "Gibberish-like text",
    "TOXICITY_HIGH": "High toxic-token density",
    "NULL_RATE": "Empty or missing data",
    "DUPLICATE_ROWS": "Duplicate rows",
    "WHITESPACE_ISSUES": "Invisible whitespace in values",
    "CONSTANT_COLUMN": "Single-valued column",
    "OUTLIER_IQR": "Values outside the typical range",
    "OUTLIER_ZSCORE": "Values extremely far from the mean",
    "DISTRIBUTION_SKEW": "Heavily one-sided distribution",
    "NEGATIVE_VALUES": "Negative values present",
    "ZERO_VALUES": "High share of zeros",
    "BENFORD_LAW": "First-digit pattern looks unnatural",
    "DATE_FUTURE": "Dates in the future",
    "DATE_ANCIENT": "Dates before 1900",
    "DATE_INVALID_PARSED": "Unparseable dates",
    "ID_DUPLICATES": "Duplicate identifiers",
    "ID_NULL": "Missing identifiers",
    "EMAIL_FORMAT": "Invalid email addresses",
    "PHONE_FORMAT": "Invalid phone numbers",
    "RARE_CATEGORIES": "Very rare categories",
    "CASE_INCONSISTENCY": "Inconsistent letter casing",
    "TYPE_COERCION_FAILED": "Values failing type conversion",
}


def friendly_title(rule: str) -> str:
    if rule.startswith("PII_"):
        return f"Personal data found ({rule[4:].replace('_', ' ')})"
    if rule.startswith("BIZ_"):
        return f"Business rule violated ({rule[4:].replace('_', ' ')})"
    return FRIENDLY_TITLES.get(rule, rule)


# Business-consequence strings per rule family (reference
# core/check_descriptions.py CHECK_BUSINESS_IMPACT — ours keyed by the
# rule category with per-rule overrides, same fallback-to-empty contract).
_CATEGORY_IMPACT = {
    "completeness": "Missing values reduce usable training volume and can "
                    "bias any metric computed over the table",
    "duplication": "Duplicates over-weight repeated content in training "
                   "and inflate row counts in reporting",
    "temporal": "Bad timestamps break time-partitioned training splits "
                "and freshness guarantees",
    "pii": "Personal data in a corpus is a compliance and release risk",
    "language": "Off-language or non-prose text degrades model quality "
                "for the target languages",
    "business": "A declared domain invariant is violated; downstream "
                "consumers may silently mis-compute",
    "content": "Low-quality content dilutes the corpus and wastes "
               "training compute",
}
_RULE_IMPACT = {
    "NULL_RATE": "Missing values reduce usable volume and bias any "
                 "metric computed over the column",
    "ENCODING_ANOMALY": "Mojibake corrupts tokenization and leaks into "
                        "generated text",
    "HTML_BINARY_JUNK": "Binary payloads waste storage and can crash "
                        "text-only consumers",
    "BENFORD_LAW": "Unnatural digit distributions can indicate fabricated "
                   "or truncated values feeding financial metrics",
    "ID_DUPLICATES": "Duplicate keys break joins and double-count facts",
    "ID_NULL": "Null keys drop rows from every downstream join",
    "CONSTANT_COLUMN": "A single-valued column carries no signal and may "
                       "indicate a broken extractor",
    "TYPE_COERCION_FAILED": "Values that fail typing silently become NULL "
                            "in typed pipelines",
}


def business_impact(rule: str) -> str:
    return _RULE_IMPACT.get(rule, _CATEGORY_IMPACT.get(_categorize(rule),
                                                       ""))

_RULE_CATEGORY = [
    (("TEXT_NULL", "URL_NULL", "TS_NULL"), "completeness"),
    (("DUPLICATE",), "duplication"),
    (("TS_", "DATE_"), "temporal"),
    (("PII_",), "pii"),
    (("LANG_", "STOPWORD", "REQUIRED_STOPWORDS", "PERPLEXITY"), "language"),
    (("BIZ_",), "business"),
]


def _categorize(rule: str) -> str:
    for prefixes, cat in _RULE_CATEGORY:
        if any(p in rule for p in prefixes):
            return cat
    return "content"


def build_recommendations(rules: list[dict], limit: int = 20) -> list[dict]:
    """Ranked recommended actions from the fired-rule list (already
    aggregated — no extra Spark work).  Reference semantics: CRITICAL
    first, stable by affected count, capped."""
    priority = {"CRITICAL": 1, "HIGH": 2, "MEDIUM": 3, "LOW": 4}
    failed = [r for r in rules if r["severity"] in priority]
    # statistic-valued checks carry affected_count=None (not a row count);
    # rank them after any check with a real count at the same severity
    failed.sort(key=lambda r: (priority[r["severity"]],
                               -(r["affected_count"] or 0)))
    recs = []
    for r in failed[:limit]:
        action = RECOMMENDED_ACTIONS.get(
            r["rule"], _PII_ACTION if r["rule"].startswith("PII_")
            else "Investigate rule trigger and upstream data source")
        recs.append({"priority": len(recs) + 1,
                     "category": _categorize(r["rule"]),
                     "rule": r["rule"],
                     "title": friendly_title(r["rule"]),
                     "action": action,
                     "business_impact": business_impact(r["rule"]),
                     "estimated_impact": r["severity"],
                     "affected_count": r["affected_count"]})
    return recs


# ---------------------------------------------------------------------------
# Per-column statistical profiling (reference core/report_builder.py:286-390
# _build_statistical_summary + _build_column_profiling), over the audited
# table's numeric / categorical / temporal columns.  ONE aggregation job
# computes every numeric moment + percentile sketch; categorical columns are
# tiny-cardinality groupBys; everything collected is O(columns), never rows.
# ---------------------------------------------------------------------------
_PROFILE_NUMERIC = ["score", "perplexity", "lang_prob", "_n_words"]
_PROFILE_CATEGORICAL = ["lang", "lang_pred", "grade"]
_PCTS = [0.01, 0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99]


def column_profile(audited: DataFrame) -> dict:
    """{'numeric_columns': {...}, 'categorical_columns': {...},
    'date_columns': {...}} — the reference's per-column statistical
    summary re-expressed for the audited document table."""
    num_cols = [c for c in _PROFILE_NUMERIC if c in audited.columns]
    cat_cols = [c for c in _PROFILE_CATEGORICAL if c in audited.columns]
    aggs = []
    for c in num_cols:
        col = F.col(c).cast("double")
        aggs += [F.avg(col).alias(f"{c}_mean"),
                 F.stddev(col).alias(f"{c}_std"),
                 F.min(col).alias(f"{c}_min"),
                 F.max(col).alias(f"{c}_max"),
                 F.skewness(col).alias(f"{c}_skew"),
                 F.kurtosis(col).alias(f"{c}_kurt"),
                 F.percentile_approx(col, _PCTS, 10000).alias(f"{c}_pcts")]
    for c in cat_cols:
        aggs.append(F.approx_count_distinct(c).alias(f"{c}_unique"))
    if "warc_ts" in audited.columns:
        aggs += [F.min("warc_ts").alias("ts_min"),
                 F.max("warc_ts").alias("ts_max"),
                 F.approx_count_distinct(F.to_date("warc_ts"))
                 .alias("ts_days")]
    row = audited.agg(*aggs).first().asDict()

    def r4(v):
        return None if v is None else round(float(v), 4)

    out = {"numeric_columns": {}, "categorical_columns": {},
           "date_columns": {}}
    for c in num_cols:
        pcts = row[f"{c}_pcts"] or []
        pct_map = {f"p{int(p * 100)}": r4(v)
                   for p, v in zip(_PCTS, pcts)}
        mean, std = row[f"{c}_mean"], row[f"{c}_std"]
        q1, q3 = pct_map.get("p25"), pct_map.get("p75")
        out["numeric_columns"][c] = {
            "mean": r4(mean), "median": pct_map.get("p50"),
            "std": r4(std), "min": r4(row[f"{c}_min"]),
            "max": r4(row[f"{c}_max"]),
            "skewness": r4(row[f"{c}_skew"]),
            "kurtosis": r4(row[f"{c}_kurt"]),
            "percentiles": pct_map,
            "iqr": (r4(q3 - q1) if q1 is not None and q3 is not None
                    else None),
            "cv": (r4(std / mean) if std is not None and mean else None),
        }
    for c in cat_cols:
        counts = (audited.filter(F.col(c).isNotNull()).groupBy(c)
                  .agg(F.count(F.lit(1)).alias("n"))
                  .orderBy(F.desc("n"), F.asc(c)).collect())
        total = sum(r["n"] for r in counts) or 1
        out["categorical_columns"][c] = {
            "n_unique": int(row[f"{c}_unique"] or 0),
            "top_value": (str(counts[0][c]) if counts else None),
            "top_freq": (r4(counts[0]["n"] / total) if counts else None),
            "rare_categories": [str(r[c]) for r in counts
                                if r["n"] / total < 0.005][:10],
        }
    if "warc_ts" in audited.columns:
        out["date_columns"]["warc_ts"] = {
            "min_date": str(row["ts_min"]),
            "max_date": str(row["ts_max"]),
            "distinct_days": int(row["ts_days"] or 0),
        }
    return out


def to_markdown(report: dict) -> str:
    lines = [f"# Quality audit — {report['run_id']}", "",
             f"- documents: **{report['n_docs']:,}**",
             f"- keep rate: **{report['keep_rate']:.1%}**",
             f"- average score: **{report['avg_score']}** "
             f"(grade {report['grade']})", "",
             "| rule | severity | affected | pct |", "|---|---|---|---|"]
    for r in report["rules"]:
        lines.append(f"| {r['rule']} | {r['severity']} | "
                     f"{r['affected_count']:,} | {r['affected_pct']:.2%} |")
    if report.get("recommendations"):
        lines += ["", "## Recommendations", "",
                  "| # | category | rule | action | impact |",
                  "|---|---|---|---|---|"]
        for rec in report["recommendations"]:
            lines.append(f"| {rec['priority']} | {rec['category']} | "
                         f"{rec['rule']} | {rec['action']} | "
                         f"{rec['estimated_impact']} |")
    prof = report.get("column_profile") or {}
    if prof.get("numeric_columns"):
        lines += ["", "## Column profile", "",
                  "| column | mean | median | std | min | max | skew |",
                  "|---|---|---|---|---|---|---|"]
        for c, p in prof["numeric_columns"].items():
            lines.append(f"| {c} | {p['mean']} | {p['median']} | "
                         f"{p['std']} | {p['min']} | {p['max']} | "
                         f"{p['skewness']} |")
        for c, p in (prof.get("categorical_columns") or {}).items():
            lines.append(f"| {c} (cat) | top={p['top_value']} "
                         f"({p['top_freq']:.1%}) | n_unique="
                         f"{p['n_unique']} | | | | |")
    return "\n".join(lines) + "\n"


def to_text(report: dict) -> str:
    out = [f"QUALITY AUDIT {report['run_id']}",
           f"docs={report['n_docs']} keep={report['keep_rate']:.1%} "
           f"score={report['avg_score']} grade={report['grade']}"]
    for r in report["rules"]:
        out.append(f"  [{r['severity']:8s}] {r['rule']:28s} "
                   f"{r['affected_count']:>8,} ({r['affected_pct']:.2%})")
    return "\n".join(out) + "\n"


def csv_to_text(report: dict) -> str:
    """Plain-text rendering of an audit_csv report (reference --text-report,
    core/report_builder.to_text semantics: headline score, per-column
    grades, failed checks with severity, dataset-level findings,
    recommendations)."""
    out = [f"CSV QUALITY AUDIT  {report.get('input', '')}",
           f"rows={report['n_rows']:,} columns={report['n_columns']} "
           f"score={report['dataset_score']} grade={report['grade']} "
           f"exit={report['exit_code']}"]
    sev = report.get("issues_by_severity") or {}
    out.append("issues: " + "  ".join(f"{k}={v}" for k, v in sev.items()))
    for col, info in report.get("columns", {}).items():
        out.append(f"\n[{info['grade']}] {col} "
                   f"({info['type_label']}, score {info['score']})")
        for ch in info["checks"]:
            if not ch["passed"]:
                out.append(f"  [{ch['severity']:8s}] "
                           f"{ch['check_id']:26s} value={ch['value']} "
                           f"{ch.get('detail', '')}")
    table = [c for c in report.get("table_checks", []) if not c["passed"]]
    if table:
        out.append("\nDATASET-LEVEL FINDINGS")
        for ch in table:
            where = f" [{ch['column']}]" if ch.get("column") else ""
            out.append(f"  [{ch['severity']:8s}] "
                       f"{ch['check_id']:26s}{where} value={ch['value']} "
                       f"{ch.get('detail', '')}")
    recs = report.get("recommendations") or []
    if recs:
        out.append("\nRECOMMENDATIONS")
        for r in recs[:10]:
            out.append(f"  - {r.get('title') or r.get('rule')}")
    return "\n".join(out) + "\n"


# presentation constants shared with the reference HTML report
# (generate_report_html.py:9-24) — same severity/grade color coding so a
# reference user reads the same visual language
SEVERITY_COLORS = {"CRITICAL": "#e74c3c", "HIGH": "#e67e22",
                   "MEDIUM": "#f1c40f", "LOW": "#27ae60",
                   "INFO": "#3498db", "PASS": "#95a5a6"}
GRADE_COLORS = {"A": "#27ae60", "B": "#3498db", "C": "#f1c40f",
                "D": "#e67e22", "F": "#e74c3c"}


def _sev_pill(sev: str) -> str:
    c = SEVERITY_COLORS.get(sev, "#95a5a6")
    return (f'<span style="display:inline-block;padding:2px 8px;'
            f'border-radius:10px;color:white;font-size:0.85em;'
            f'font-weight:600;background:{c}">{sev}</span>')


def to_html(report: dict) -> str:
    """Self-contained HTML report: inline-CSS score card, severity-colored
    pills and pure-CSS severity distribution bars — presentation parity
    with reference generate_report_html.py:27-216 minus the Chart.js CDN
    (no external libs by design: the report must render offline on a
    cluster gateway)."""
    grade = report["grade"]
    gcolor = GRADE_COLORS.get(grade, "#95a5a6")
    issues = report.get("issues_by_severity", {})
    max_n = max(list(issues.values()) + [1])
    bars = "".join(
        f'<div style="display:flex;align-items:center;margin:4px 0">'
        f'<span style="width:80px;color:#7f8c8d">{s}</span>'
        f'<div style="background:{SEVERITY_COLORS[s]};height:16px;'
        f'border-radius:4px;width:{max(2, int(300 * issues.get(s, 0) / max_n))}px"></div>'
        f'<span style="margin-left:8px;font-weight:600">'
        f'{issues.get(s, 0):,}</span></div>'
        for s in ("CRITICAL", "HIGH", "MEDIUM", "LOW", "INFO"))
    rows = "".join(
        f'<tr><td style="padding:10px 12px;border-bottom:1px solid #eee">'
        f'{r["rule"]}</td>'
        f'<td style="padding:10px 12px;border-bottom:1px solid #eee">'
        f'{_sev_pill(r["severity"])}</td>'
        f'<td style="padding:10px 12px;border-bottom:1px solid #eee;'
        f'text-align:right">{r["affected_count"]:,}</td>'
        f'<td style="padding:10px 12px;border-bottom:1px solid #eee;'
        f'text-align:right">{r["affected_pct"]:.2%}</td></tr>'
        for r in report["rules"])
    recs = "".join(
        f'<tr><td style="padding:8px 12px;border-bottom:1px solid #eee">'
        f'{rec["priority"]}</td>'
        f'<td style="padding:8px 12px;border-bottom:1px solid #eee">'
        f'{rec.get("title") or rec["rule"]}</td>'
        f'<td style="padding:8px 12px;border-bottom:1px solid #eee">'
        f'{rec["action"]}</td>'
        f'<td style="padding:8px 12px;border-bottom:1px solid #eee">'
        f'{_sev_pill(rec["estimated_impact"])}</td></tr>'
        for rec in report.get("recommendations", []))
    th = ('style="background:#f8f9fa;text-align:left;padding:10px 12px;'
          'font-weight:600;color:#34495e"')
    card = ('style="background:white;border-radius:12px;padding:20px;'
            'box-shadow:0 2px 10px rgba(0,0,0,0.08);margin-bottom:20px"')
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="UTF-8">
<title>Quality audit — {report['run_id']}</title></head>
<body style="font-family:-apple-system,'Segoe UI',Roboto,sans-serif;
background:#f5f6fa;color:#2c3e50;line-height:1.6;margin:0">
<div style="max-width:1100px;margin:0 auto;padding:20px">
<div style="background:linear-gradient(135deg,#667eea 0%,#764ba2 100%);
color:white;padding:30px;border-radius:12px;margin-bottom:20px">
<h1 style="margin:0;font-size:1.8em">Quality audit</h1>
<div style="opacity:0.8">{report['run_id']} &mdash;
{report['n_docs']:,} documents &middot; keep rate
{report['keep_rate']:.1%}</div>
<div class="score-badge" style="display:inline-block;background:{gcolor};
color:white;padding:8px 20px;border-radius:20px;font-size:1.4em;
font-weight:bold;margin-top:10px">{report['avg_score']}/100
({grade})</div>
</div>
<div {card}><h2 style="margin-top:0;font-size:1.1em;color:#34495e">
Issues by severity</h2>{bars}</div>
<div {card}><h2 style="margin-top:0;font-size:1.1em;color:#34495e">
Fired rules</h2>
<table style="width:100%;border-collapse:collapse">
<tr><th {th}>rule</th><th {th}>severity</th><th {th}>affected</th>
<th {th}>pct</th></tr>{rows}</table></div>
{'<div ' + card + '><h2 style="margin-top:0;font-size:1.1em;'
 'color:#34495e">Recommendations</h2>'
 '<table style="width:100%;border-collapse:collapse">'
 f'<tr><th {th}>#</th><th {th}>finding</th><th {th}>action</th>'
 f'<th {th}>impact</th></tr>{recs}</table></div>' if recs else ''}
<div style="text-align:center;color:#95a5a6;padding:20px;
font-size:0.85em">qualityspark</div>
</div></body></html>"""


def executive_summary(report: dict) -> str:
    """Exec summary (reference generate_report_executive.py:22-130 analog):
    verdict + top findings in prose."""
    crit = report["issues_by_severity"]["CRITICAL"]
    verdict = ("NOT USABLE — critical issues" if crit
               else ("USABLE WITH FIXES"
                     if report["avg_score"] < 90 else "HEALTHY"))
    top = report["rules"][:5]
    lines = [f"Verdict: {verdict}",
             f"{report['n_docs']:,} documents audited; "
             f"{report['keep_rate']:.1%} kept; average score "
             f"{report['avg_score']} (grade {report['grade']}).",
             "Top findings:"]
    for r in top:
        lines.append(f"  - {r.get('title') or friendly_title(r['rule'])} "
                     f"[{r['rule']}, {r['severity']}]: "
                     f"{r['affected_pct']:.2%} of documents")
    return "\n".join(lines) + "\n"


def xlsx_sheets(report: dict) -> list[tuple[str, list[list]]]:
    """Workbook content as (sheet_name, rows) pairs — the per-document
    analog of the reference's Resumen / Por Columna / Issues sheets
    (generate_report_excel.py:39-318).  Pure data, so the sheet layout is
    unit-tested even where openpyxl is absent and to_xlsx only handles
    the library calls."""
    summary = [["Quality audit", report["run_id"]],
               ["documents", report["n_docs"]],
               ["keep rate", report["keep_rate"]],
               ["average score", report["avg_score"]],
               ["grade", report["grade"]],
               [],
               ["severity", "affected"]]
    for sev, cnt in report["issues_by_severity"].items():
        summary.append([sev, cnt])
    rules = [["rule", "severity", "affected", "pct"]]
    for r in report["rules"]:
        rules.append([r["rule"], r["severity"], r["affected_count"],
                      r["affected_pct"]])
    flagged = [["rule", "severity", "count"]]
    for r in report.get("top_flagged", []):
        flagged.append([r.get("rule"), r.get("severity"), r.get("n")])
    sheets = [("Summary", summary), ("Rules", rules),
              ("Top flagged", flagged)]
    if report.get("recommendations"):
        recs = [["priority", "category", "rule", "action", "impact"]]
        for r in report["recommendations"]:
            recs.append([r["priority"], r["category"], r["rule"],
                         r["action"], r["estimated_impact"]])
        sheets.append(("Recommendations", recs))
    prof = (report.get("column_profile") or {}).get("numeric_columns")
    if prof:
        rows = [["column", "mean", "median", "std", "min", "max",
                 "skewness", "iqr", "cv"]]
        for c, p in prof.items():
            rows.append([c, p["mean"], p["median"], p["std"], p["min"],
                         p["max"], p["skewness"], p["iqr"], p["cv"]])
        sheets.append(("Column profile", rows))
    return sheets


def to_xlsx(report: dict, path: str) -> bool:
    """Write the workbook when openpyxl is available (the reference treats
    it as an optional dependency too); returns False when gated off."""
    try:
        import openpyxl
    except ImportError:
        return False
    wb = openpyxl.Workbook()
    wb.remove(wb.active)
    for name, rows in xlsx_sheets(report):
        ws = wb.create_sheet(name)
        for row in rows:
            ws.append(row if row else [None])
    wb.save(path)
    return True


def write_reports(spark: SparkSession, audited: DataFrame, out_dir: str,
                  run_id: str = "run0", cfg=None) -> dict:
    """All sinks from one metrics pass + one profile pass.  xlsx is
    import-gated (reference makes openpyxl optional too)."""
    from qualityspark.scoring import metrics_table, lineage_table
    metrics = metrics_table(audited, run_id, cfg=cfg).first().asDict()
    top = [r.asDict() for r in
           (lineage_table(audited, cfg=cfg).groupBy("rule", "severity")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n")).limit(20).collect())]
    report = build_report(metrics, top, run_id,
                          profile=column_profile(audited), cfg=cfg)
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, content in [
            ("report.json", json.dumps(report, indent=2)),
            ("report.md", to_markdown(report)),
            ("report.txt", to_text(report)),
            ("report.html", to_html(report)),
            ("executive_summary.txt", executive_summary(report))]:
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            f.write(content)
        paths[name] = p
    xp = os.path.join(out_dir, "report.xlsx")
    paths["report.xlsx"] = (xp if to_xlsx(report, xp)
                            else "skipped: openpyxl not installed")
    return {"report": report, "paths": paths}
