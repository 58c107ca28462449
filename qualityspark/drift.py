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


# ---------------------------------------------------------------------------
# Multi-run trend history (reference core/trend_analyzer.py:17-59 reads N
# prior run reports; :61-110 builds the trend report).  The reference
# globs outputs/NNN_*/report.json; here each run APPENDS its one-row
# metrics table to a history directory (tiny parquet appends — one row
# per run regardless of corpus size), and the trend report is built
# driver-side from the collected series.
# ---------------------------------------------------------------------------

def append_run_history(metrics_df: DataFrame, history_dir: str) -> None:
    """Append this run's metrics row (scoring.metrics_table output) to the
    run-history table, stamped with a wall-clock write time for ordering
    when run_ids do not sort."""
    from pyspark.sql import functions as F
    (metrics_df.withColumn("written_at", F.current_timestamp())
     .write.mode("append").parquet(history_dir))


def run_history(spark, history_dir: str) -> list[dict]:
    """All recorded runs, oldest first."""
    rows = (spark.read.parquet(history_dir)
            .orderBy("written_at", "run_id").collect())
    return [r.asDict() for r in rows]


def trend_report(history: list[dict], current: dict | None = None) -> dict:
    """Score time series + IMPROVING/DEGRADING/STABLE ladder (reference
    core/trend_analyzer.py:61-110: +-5 score points vs the previous run;
    avg/best/worst over the prior series when >= 2 prior runs).

    ``history``: run_history output (oldest first).  ``current``: the
    in-flight run's metrics dict; when None the last history row is
    treated as current and the rest as prior."""
    if current is None:
        if not history:
            return {"previous_runs": 0, "trend": "NO_HISTORY"}
        history, current = history[:-1], history[-1]
    cur_score = round(float(current.get("avg_score", 0.0)), 1)
    out = {
        "previous_runs": len(history),
        "current_run_id": current.get("run_id"),
        "current_score": cur_score,
        "score_history": [round(float(h.get("avg_score", 0.0)), 1)
                          for h in history] + [cur_score],
        "keep_rate_history": [round(float(h.get("keep_rate", 0.0)), 4)
                              for h in history]
                             + [round(float(current.get("keep_rate",
                                                        0.0)), 4)],
        "run_ids": [h.get("run_id") for h in history]
                   + [current.get("run_id")],
    }
    if not history:
        out["trend"] = "NO_HISTORY"
        return out
    delta = cur_score - round(float(history[-1].get("avg_score", 0.0)), 1)
    if delta > 5:
        out["trend"] = "IMPROVING"
        out["trend_description"] = (f"improved {delta:+.1f} points vs "
                                    f"previous run")
    elif delta < -5:
        out["trend"] = "DEGRADING"
        out["trend_description"] = (f"degraded {delta:+.1f} points vs "
                                    f"previous run")
    else:
        out["trend"] = "STABLE"
        out["trend_description"] = (f"stable ({delta:+.1f} points vs "
                                    f"previous run)")
    out["delta_vs_previous"] = round(delta, 1)
    if len(history) >= 2:
        prev_scores = [float(h.get("avg_score", 0.0)) for h in history]
        out["avg_previous_score"] = round(sum(prev_scores)
                                          / len(prev_scores), 1)
        out["best_score"] = round(max(prev_scores), 1)
        out["worst_score"] = round(min(prev_scores), 1)
    return out
