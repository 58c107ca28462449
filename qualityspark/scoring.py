"""Per-document scoring, grading, keep/drop and lineage.

Mirrors the reference scoring layer (core/scoring_system.py:7-29,66-79:
deductions CRITICAL 25 / HIGH 10 / MEDIUM 5 / LOW 2, floor 0, grades
A>=90 B>=75 C>=60 D>=40 F) applied per *document* instead of per column, and
the keep/drop mapping (data_quality_auditor.py:308-314: any CRITICAL ->
drop).  Pure Column expressions; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityspark import constants as C
from qualityspark.config import resolve


def with_business_rules(df: DataFrame, cfg=None) -> DataFrame:
    """Adds one ``sig_BIZ_<NAME>`` boolean per configured business rule
    (reference core/business_rules.py analog): the rule FIRES for a row
    when its SQL assertion is false or null there — pure F.expr column
    expressions, codegen'd with the rest of the signal projection."""
    cfg = resolve(cfg)
    if not cfg.business_rules:
        return df
    return df.withColumns({
        f"sig_{b['rule_id']}":
            ~F.coalesce(F.expr(b["assertion"]).cast("boolean"),
                        F.lit(False))
        for b in cfg.business_rules})


def with_scores(df: DataFrame, cfg=None) -> DataFrame:
    cfg = resolve(cfg)
    rules = cfg.doc_rules()
    penalty = None
    for rule, sev in rules:
        ded = cfg.deduction(sev)
        term = F.when(F.col(f"sig_{rule}"), F.lit(ded)).otherwise(F.lit(0))
        penalty = term if penalty is None else penalty + term

    score = F.greatest(F.lit(0.0), F.lit(100.0) - penalty.cast("double"))

    grade = F.lit("F")
    for threshold, g in sorted(C.GRADE_SCALE):  # ascending: last when wins
        grade = F.when(score >= threshold, F.lit(g)).otherwise(grade)

    crit_cols = [F.coalesce(F.col(f"sig_{r}"), F.lit(False))
                 for r, sev in rules if sev == "CRITICAL"]
    has_critical = F.lit(False)
    for c in crit_cols:
        has_critical = has_critical | c

    rules_fired = F.array_compact(F.array(*[
        F.when(F.coalesce(F.col(f"sig_{r}"), F.lit(False)), F.lit(r))
        for r, _ in rules]))

    return df.withColumns({
        "score": F.round(score, 1),
        "grade": grade,
        "rules_fired": rules_fired,
        "keep": (~has_critical)
                & (score >= cfg.param("KEEP_SCORE_CUTOFF")),
    })


def lineage_table(df: DataFrame, cfg=None) -> DataFrame:
    """One row per (url, rule, severity) — the flagged-rows table analog
    (reference core/flagged_rows.py:71-144), derived by exploding the
    already-computed signals instead of re-deriving masks."""
    cfg = resolve(cfg)
    sev_map = F.create_map(*[x for r, s in cfg.doc_rules()
                             for x in (F.lit(r), F.lit(s))])
    return (df.select("url", "warc_ts",
                      F.explode("rules_fired").alias("rule"))
            .withColumn("severity", sev_map[F.col("rule")]))


def dataset_score(column_scores: dict, null_pcts: dict,
                  column_weights: dict | None = None) -> float:
    """Reference weighted dataset score (core/scoring_system.py:81-94):
    weight per column = column_weights.get(col, 1/(1+null_pct)); dataset
    score = sum(score*w)/sum(w).  Pure-python mirror, pinned by
    tests/test_scoring.py against the reference's own test arithmetic."""
    column_weights = column_weights or {}
    total_w = weighted = 0.0
    for col, score in column_scores.items():
        w = column_weights.get(col, 1.0 / (1.0 + null_pcts.get(col, 0.0)))
        weighted += score * w
        total_w += w
    return weighted / total_w if total_w > 0 else 0.0


# the per-document analog of the reference's per-column null_pct weighting:
# fraction of the tracked nullable input fields (text, url, warc_ts) the
# document is missing — docs with more missing fields count less toward the
# corpus score, mirroring 1/(1+null_pct) column weighting at doc granularity
_NULL_FIELD_RULES = ("TEXT_NULL_LIKE", "URL_NULL", "TS_NULL")


def _metric_aggs(df: DataFrame, cfg=None) -> list:
    """Shared aggregate list for corpus-level and per-partition metrics."""
    cfg = resolve(cfg)
    has_sigs = any(c.startswith("sig_") for c in df.columns)

    def fired(rule):
        if has_sigs:
            return F.coalesce(F.col(f"sig_{rule}"), F.lit(False))
        # re-read audited table carries only the rules_fired array
        return F.array_contains("rules_fired", rule)

    null_rules = [r for r in _NULL_FIELD_RULES if cfg.rule_enabled(r)]
    null_frac = (sum((fired(r).cast("int") for r in null_rules), F.lit(0))
                 / float(len(null_rules))) if null_rules else F.lit(0.0)
    w = 1.0 / (1.0 + null_frac)
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("keep").cast("double")).alias("keep_rate"),
            F.avg("score").alias("avg_score"),
            (F.sum(F.col("score") * w) / F.sum(w))
            .alias("weighted_score")]
    for rule, _ in cfg.doc_rules():
        aggs.append(F.sum(fired(rule).cast("long")).alias(f"n_{rule}"))
    return aggs


def metrics_table(df: DataFrame, run_id: str = "run0",
                  cfg=None) -> DataFrame:
    """Corpus-level metrics: per-rule fire counts + rates, keep rate, score
    moments + the reference-weighted dataset score.  One grouped
    aggregation (single shuffle over tiny key space)."""
    return (df.agg(*_metric_aggs(df, cfg))
            .withColumn("run_id", F.lit(run_id)))


def metrics_by_partition(df: DataFrame, partition_col: str = "_chunk",
                         run_id: str = "run0", cfg=None) -> DataFrame:
    """Per-PARTITION metrics (north_rule: "per-partition lineage and
    metrics tables written alongside the ... output"): the same aggregates
    as metrics_table, grouped by the snapshot chunk key — one row per
    committed chunk, so a chunk's quality profile is inspectable without
    touching the others and global metrics are the exact column-wise merge
    (counts sum; rates re-derive from the sums)."""
    return (df.groupBy(partition_col).agg(*_metric_aggs(df, cfg))
            .withColumn("run_id", F.lit(run_id)))
