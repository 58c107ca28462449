"""Multi-run trend history (reference core/trend_analyzer.py:17-110): the
score time series persists across runs and the IMPROVING / DEGRADING /
STABLE ladder is computed over N >= 3 recorded runs."""

import time

from qualityspark.drift import append_run_history, run_history, trend_report


def _m(run_id, score, keep):
    return {"run_id": run_id, "avg_score": score, "keep_rate": keep,
            "n_docs": 1000}


def test_ladder_improving_degrading_stable():
    hist = [_m("r1", 70.0, 0.8), _m("r2", 71.0, 0.81)]
    up = trend_report(hist, _m("r3", 80.0, 0.9))
    assert up["trend"] == "IMPROVING" and up["delta_vs_previous"] == 9.0
    down = trend_report(hist, _m("r3", 60.0, 0.6))
    assert down["trend"] == "DEGRADING"
    flat = trend_report(hist, _m("r3", 72.0, 0.81))
    assert flat["trend"] == "STABLE"
    assert flat["score_history"] == [70.0, 71.0, 72.0]
    assert flat["previous_runs"] == 2
    assert flat["avg_previous_score"] == 70.5
    assert flat["best_score"] == 71.0 and flat["worst_score"] == 70.0


def test_ladder_edge_cases():
    assert trend_report([])["trend"] == "NO_HISTORY"
    one = trend_report([], _m("r1", 50.0, 0.5))
    assert one["trend"] == "NO_HISTORY"
    assert one["score_history"] == [50.0]
    # current=None: last history row is the current run
    auto = trend_report([_m("r1", 70.0, 0.8), _m("r2", 90.0, 0.95)])
    assert auto["trend"] == "IMPROVING"
    assert auto["current_run_id"] == "r2"


def test_history_persists_across_runs(spark, tmp_path):
    """Three appended one-row metrics tables come back as an ordered
    series and the trend report reads the full ladder (N >= 3)."""
    hist_dir = str(tmp_path / "history")
    schema = "run_id string, avg_score double, keep_rate double, n_docs long"
    for run_id, score in [("r1", 80.0), ("r2", 74.0), ("r3", 66.0)]:
        df = spark.createDataFrame([(run_id, score, 0.8, 1000)], schema)
        append_run_history(df, hist_dir)
        time.sleep(0.01)   # distinct written_at ordering
    hist = run_history(spark, hist_dir)
    assert [h["run_id"] for h in hist] == ["r1", "r2", "r3"]
    rep = trend_report(hist)
    assert rep["previous_runs"] == 2
    assert rep["score_history"] == [80.0, 74.0, 66.0]
    assert rep["trend"] == "DEGRADING"
    assert rep["best_score"] == 80.0 and rep["worst_score"] == 74.0


def test_run_resumable_history(spark, pages_small, tmp_path):
    """run_resumable wires the history: two real runs, second reports a
    trend (same corpus -> STABLE)."""
    from qualityspark.io import run_resumable
    hist = str(tmp_path / "hist")
    i1 = run_resumable(spark, pages_small, str(tmp_path / "o1"), chunks=4,
                       run_id="runA", history_dir=hist)
    assert i1["trend"]["trend"] == "NO_HISTORY"
    i2 = run_resumable(spark, pages_small, str(tmp_path / "o2"), chunks=4,
                       run_id="runB", history_dir=hist)
    assert i2["trend"]["trend"] == "STABLE"
    assert i2["trend"]["run_ids"] == ["runA", "runB"]
    assert i2["trend"]["previous_runs"] == 1
