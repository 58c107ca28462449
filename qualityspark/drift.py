"""Run-over-run drift + trend (reference core/drift_detector.py:25-202 and
core/trend_analyzer.py:61-110 analogs, over the metrics table).

The heavy distributional tests (KS histogram, chi2 category shift) live in
qualityspark.queries as tagged-union aggregations; this module compares the
tiny per-run metrics rows driver-side, which is the cheap path the reference
takes when both runs' aggregates already exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from qualityspark import constants as C

# thresholds mirror reference core/drift_detector.py:96-108 (null-rate delta
# ladder) and :187-198 (cardinality change)
RATE_DELTA_HIGH = 0.10
RATE_DELTA_MEDIUM = 0.05


def compare_metrics(prev: dict, cur: dict) -> dict:
    """prev/cur: single metrics rows as dicts (from scoring.metrics_table).
    Returns per-rule rate deltas with severities + trend verdict."""
    drifts = []
    n_prev = max(prev.get("n_docs", 0), 1)
    n_cur = max(cur.get("n_docs", 0), 1)
    for rule, _sev in C.DOC_RULES:
        a = prev.get(f"n_{rule}", 0) / n_prev
        b = cur.get(f"n_{rule}", 0) / n_cur
        delta = b - a
        if abs(delta) >= RATE_DELTA_HIGH:
            severity = "HIGH"
        elif abs(delta) >= RATE_DELTA_MEDIUM:
            severity = "MEDIUM"
        else:
            severity = "PASS"
        if severity != "PASS":
            drifts.append({"rule": rule, "prev_rate": round(a, 4),
                           "cur_rate": round(b, 4),
                           "delta": round(delta, 4),
                           "severity": severity})
    keep_delta = cur.get("keep_rate", 0.0) - prev.get("keep_rate", 0.0)
    # trend ladder mirrors reference core/trend_analyzer.py:61-110
    # (IMPROVING / DEGRADING / STABLE at +-5 score points)
    score_delta = cur.get("avg_score", 0.0) - prev.get("avg_score", 0.0)
    if score_delta > 5:
        trend = "IMPROVING"
    elif score_delta < -5:
        trend = "DEGRADING"
    else:
        trend = "STABLE"
    return {"drifts": drifts,
            "keep_rate_delta": round(keep_delta, 4),
            "avg_score_delta": round(score_delta, 4),
            "trend": trend,
            "summary_severity": max(
                (d["severity"] for d in drifts),
                key=lambda s: ["PASS", "MEDIUM", "HIGH"].index(s),
                default="PASS")}


def compare_metrics_tables(prev_df: DataFrame, cur_df: DataFrame) -> dict:
    return compare_metrics(prev_df.first().asDict(),
                           cur_df.first().asDict())
