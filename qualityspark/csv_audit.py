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


def _melted_frame(tv, types, data_cols):
    """(k, pos, c raw-string, dv typed-double, tv typed-timestamp) — the
    unpivoted view behind the wide-table strategy (see _pass_a_melted).
    Map-explode keeps NULL values, so every column contributes exactly
    n_rows pairs (same idiom as csv_breadth._unpivot)."""
    from qualityspark.sources import quoted_col
    pairs = []
    for col in data_cols:
        t = types[col]
        dv = (F.col(f"`{col}_typed`").cast("double") if t in _NUMERIC
              else F.lit(None).cast("double"))
        ts = (F.col(f"`{col}_typed`").cast("timestamp") if t in _DATES
              else F.lit(None).cast("timestamp"))
        pairs += [F.lit(col),
                  F.struct(quoted_col(col).alias("c"), dv.alias("dv"),
                           ts.alias("tv"))]
    u = tv.select(F.col("_pos").alias("pos"),
                  F.explode(F.create_map(*pairs)).alias("k", "m"))
    return u.select("k", "pos", F.col("m.c").alias("c"),
                    F.col("m.dv").alias("dv"), F.col("m.tv").alias("tv"))


def _pass_a_melted(tv, types, data_cols, date_axis):
    """Pass A for WIDE tables: the same statistics as _pass_a_aggs, from
    the melted frame.

    Past typeinfer.WIDE_COLS_THRESHOLD columns the wide single-agg plan
    (25-40 expressions PER COLUMN) exceeds the whole-stage-codegen field
    limit; janino then fails outright on the generated class and Spark
    evaluates every expression interpreted — measured 244 s for pass A
    alone at 300 cols x 20k rows.  Here every derived signal (null-like
    mask, whitespace mask, the guarded 11-format date ladder, the
    Benford %.10e digit) is ONE codegen'd expression instance over the
    narrow exploded frame, the groupBy(k) carries a fixed ~60 partial
    aggregates per (column, task) regardless of width, and the
    type-specific statistics are computed uniformly but assembled
    per-type driver-side so the returned dict has exactly the wide
    path's keys (equality pinned by test_r6_perf.py).  Global literals
    (n_rows, mid_pos, date_q) come from one 3-expression agg on the
    unmelted frame."""
    u = _melted_frame(tv, types, data_cols)
    c, dv, tvc = F.col("c"), F.col("dv"), F.col("tv")
    s = F.trim(c)
    ne = TI._nonempty(c)
    val = F.when(ne, s)
    nl = c.isNull() | s.rlike(
        "^(?iu:" + "|".join(_re.escape(w)
                            for w in sorted(C.NULL_LIKE) if w) + ")?$")
    ws = c.isNotNull() & (c != s) & (s != "")
    fmt = masks.date_format_index(c, _FMT_LADDER)
    digit = F.when(dv.isNotNull() & (F.abs(dv) > 0),
                   F.substring(F.format_string("%.10e", F.abs(dv)), 1, 1))
    proj = u.select(
        "k", "c", s.alias("s"), ne.alias("ne"), val.alias("val"),
        nl.alias("nl"), ws.alias("ws"), dv, tvc,
        fmt.alias("fmt"), digit.alias("digit"))
    c, s, ne, val = (F.col("c"), F.col("s"), F.col("ne"), F.col("val"))
    nl, ws, dv, tvc = (F.col("nl"), F.col("ws"), F.col("dv"), F.col("tv"))
    fmt, digit = F.col("fmt"), F.col("digit")
    as_of = F.lit(C.AS_OF_TS).cast("timestamp")
    ancient = F.lit(C.ANCIENT_TS).cast("timestamp")
    num_inv = ne & dv.isNull()
    date_inv = ne & tvc.isNull()
    bad_e = ne & ~val.rlike(TI.EMAIL_RE)
    bad_p = ne & ~val.rlike(TI.PHONE_RE)
    nullish = c.isNotNull() & nl & (s != "")
    id_cols = [col for col, t in types.items() if t == TI.ID_CANDIDATE]
    aggs = [
        F.sum(nl.cast("long")).alias("n_null"),
        F.sum(ne.cast("long")).alias("nn"),
        F.approx_count_distinct(val).alias("n_unique"),
        F.sum(ws.cast("long")).alias("n_ws"),
        F.min(val).alias("s_any_min"),
        F.min(F.when(nullish, s)).alias("s_nullish_min"),
        F.max(F.when(nullish, s)).alias("s_nullish_max"),
        F.min(F.when(ws, c)).alias("s_ws_min"),
        F.max(F.when(ws, c)).alias("s_ws_max"),
        # numeric family (null outside numeric groups)
        F.min(F.when(num_inv, s)).alias("num_inv_min"),
        F.max(F.when(num_inv, s)).alias("num_inv_max"),
        F.min(F.when(dv < 0, dv)).alias("s_neg_min"),
        F.sum(dv.isNotNull().cast("long")).alias("n_num"),
        F.sum(num_inv.cast("long")).alias("num_invalid"),
        F.sum((dv < 0).cast("long")).alias("n_neg"),
        F.sum((dv == 0).cast("long")).alias("n_zero"),
        F.avg(dv).alias("mean"),
        F.stddev(dv).alias("std"),
        F.skewness(dv).alias("skew"),
        F.kurtosis(dv).alias("kurt"),
        F.percentile_approx(dv, [0.001, 0.25, 0.5, 0.75, 0.999],
                            10000).alias("q"),
        # date family
        F.sum(date_inv.cast("long")).alias("date_invalid"),
        F.sum((tvc > as_of).cast("long")).alias("n_future"),
        F.sum((tvc < ancient).cast("long")).alias("n_ancient"),
        F.max(F.when(tvc > as_of, s)).alias("s_future_max"),
        F.min(F.when(tvc < ancient, s)).alias("s_ancient_min"),
        F.min(tvc).alias("d_min"),
        F.max(tvc).alias("d_max"),
        F.min(F.when(date_inv, s)).alias("date_inv_min"),
        F.max(F.when(date_inv, s)).alias("date_inv_max"),
        # email / phone family
        F.sum(bad_e.cast("long")).alias("e_invalid"),
        F.min(F.when(bad_e, s)).alias("e_inv_min"),
        F.max(F.when(bad_e, s)).alias("e_inv_max"),
        F.sum(bad_p.cast("long")).alias("p_invalid"),
        F.min(F.when(bad_p, s)).alias("p_inv_min"),
        F.max(F.when(bad_p, s)).alias("p_inv_max"),
        # categorical / boolean
        F.approx_count_distinct(F.lower(val)).alias("n_unique_ci"),
    ]
    for d in range(1, 10):
        aggs.append(F.coalesce(F.sum((digit == str(d)).cast("long")),
                               F.lit(0)).alias(f"bf{d}"))
    for i in range(len(_FMT_LADDER)):
        aggs += [F.sum((fmt == i).cast("long")).alias(f"fmt{i}"),
                 F.min(F.when(fmt == i, s)).alias(f"fmt_s{i}")]
    if id_cols:
        # exact distinct only where phantom-duplicate error is not
        # tolerable; null outside id groups so nothing else pays for it
        aggs.append(F.countDistinct(
            F.when(F.col("k").isin(*id_cols), val))
            .alias("n_unique_exact"))
    by_col = {r["k"]: r.asDict()
              for r in proj.groupBy("k").agg(*aggs).collect()}

    # global literals: one tiny agg on the unmelted frame
    gl = [F.count(F.lit(1)).alias("::n_rows"),
          F.percentile_approx("_pos", 0.5, 10000).alias("::mid_pos")]
    if date_axis is not None:
        axis_ts = F.col(f"`{date_axis}_typed`").cast("timestamp")
        gl.append(F.percentile_approx(
            axis_ts.cast("double"), [0.25, 0.75], 10000).alias("::date_q"))
    row = tv.agg(*gl).first().asDict()

    # assemble EXACTLY the wide path's key set per type
    for col, t in types.items():
        r = by_col.get(col) or {}

        def put(key, src=None):
            row[f"{col}::{key}"] = r.get(src or key)

        for key in ("n_null", "nn", "n_unique", "n_ws", "s_any_min",
                    "s_nullish_min", "s_nullish_max",
                    "s_ws_min", "s_ws_max"):
            put(key)
        if t in _NUMERIC:
            put("s_inv_min", "num_inv_min")
            put("s_inv_max", "num_inv_max")
            put("n_invalid", "num_invalid")
            for key in ("s_neg_min", "n_num", "n_neg", "n_zero", "mean",
                        "std", "skew", "kurt", "q"):
                put(key)
            for d in range(1, 10):
                put(f"bf{d}")
        elif t in _DATES:
            put("n_invalid", "date_invalid")
            put("s_inv_min", "date_inv_min")
            put("s_inv_max", "date_inv_max")
            for key in ("n_future", "n_ancient", "s_future_max",
                        "s_ancient_min", "d_min", "d_max"):
                put(key)
            for i in range(len(_FMT_LADDER)):
                put(f"fmt{i}")
                put(f"fmt_s{i}")
        elif t == TI.ID_CANDIDATE:
            put("n_unique_exact")
        elif t == TI.EMAIL:
            put("n_invalid", "e_invalid")
            put("s_inv_min", "e_inv_min")
            put("s_inv_max", "e_inv_max")
        elif t == TI.PHONE:
            put("n_invalid", "p_invalid")
            put("s_inv_min", "p_inv_min")
            put("s_inv_max", "p_inv_max")
        if t in (TI.CATEGORICAL, TI.BOOLEAN):
            put("n_unique_ci")
    return row


def _melted_numeric(tv, types, stats):
    """(k, pos, v) over the numeric typed columns pass B/C work on."""
    num_cols = [col for col, t in types.items()
                if t in _NUMERIC and stats[col].get("n_num")]
    if not num_cols:
        return None, []
    pairs = []
    for col in num_cols:
        pairs += [F.lit(col), F.col(f"`{col}_typed`").cast("double")]
    u = (tv.select(F.col("_pos").alias("pos"),
                   F.explode(F.create_map(*pairs)).alias("k", "v")))
    return u, num_cols


def _lit_join(u, rows, schema):
    """Broadcast the per-column pass-A/B literals onto the melted frame:
    an O(1) hash probe per value where a per-column CASE chain would be
    O(n_cols), interpreted.  NULL literals gate each aggregate exactly
    like the wide plan's add-the-agg-only-if conditions — a NULL-gated
    predicate sums to NULL, and the callers' is-not-None filter drops it
    just as the absent wide-plan key would be."""
    lit_df = u.sparkSession.createDataFrame(rows, schema)
    return u.join(F.broadcast(lit_df), "k")


def _pass_b_melted(tv, types, stats, mid_pos):
    """Pass B for WIDE tables — the same `{col}::key` dict the wide
    single-agg plan produces (see _pass_a_melted's rationale and the
    null-gating contract in _lit_join)."""
    u, num_cols = _melted_numeric(tv, types, stats)
    if u is None:
        return {}
    rows = []
    for col in num_cols:
        st = stats[col]
        rows.append((col, st.get("q1"), st.get("q3"), st.get("mean"),
                     st.get("std"), st.get("med"), st.get("p001"),
                     st.get("p999")))
    u = _lit_join(u, rows, "k string, q1 double, q3 double, mean double,"
                           " std double, med double, p001 double,"
                           " p999 double")
    v = F.col("v")
    q1, q3 = F.col("q1"), F.col("q3")
    mean, std, med = F.col("mean"), F.col("std"), F.col("med")
    p001, p999 = F.col("p001"), F.col("p999")
    iqr = q3 - q1
    vr_ok = p001.isNotNull() & p999.isNotNull()
    vr = vr_ok & ((v < p001) | (v > p999))
    half1 = F.col("pos") <= (mid_pos if mid_pos is not None else 0)
    aggs = [
        F.sum(F.when(q3 > q1, ((v < q1 - 1.5 * iqr)
                               | (v > q3 + 1.5 * iqr)).cast("long")))
        .alias("iqr"),
        F.sum(F.when(mean.isNotNull() & std.isNotNull() & (std != 0),
                     (F.abs((v - mean) / std) > 3).cast("long")))
        .alias("z"),
        F.percentile_approx(F.when(med.isNotNull(), F.abs(v - med)),
                            0.5, 10000).alias("mad"),
        F.sum(F.when(vr_ok, vr.cast("long"))).alias("vr"),
        F.min(F.when(vr, v)).alias("s_vr_min"),
        F.max(F.when(vr, v)).alias("s_vr_max"),
    ]
    for tag, pred in (("h1", half1), ("h2", ~half1)):
        hv = F.when(pred, v)
        aggs += [F.count(hv).alias(f"{tag}_n"),
                 F.avg(hv).alias(f"{tag}_mean"),
                 F.var_samp(hv).alias(f"{tag}_var"),
                 F.skewness(hv).alias(f"{tag}_skew"),
                 F.kurtosis(hv).alias(f"{tag}_kurt"),
                 F.percentile_approx(hv, 0.5, 10000).alias(f"{tag}_med")]
    out = {}
    for r in u.groupBy("k").agg(*aggs).collect():
        d = r.asDict()
        col = d.pop("k")
        out.update({f"{col}::{key}": val for key, val in d.items()})
    return out


def _pass_c_melted(tv, types, stats, outliers, mid_pos):
    """Pass C for WIDE tables (modified-Z counts + Levene |x-median|
    moments per half) — same contract as _pass_b_melted."""
    u, num_cols = _melted_numeric(tv, types, stats)
    if u is None:
        return {}
    rows = []
    for col in num_cols:
        rows.append((col, stats[col].get("med"),
                     outliers.get(f"{col}::mad"),
                     outliers.get(f"{col}::h1_med"),
                     outliers.get(f"{col}::h2_med")))
    u = _lit_join(u, rows, "k string, med double, mad double,"
                           " h1_med double, h2_med double")
    v = F.col("v")
    med, mad = F.col("med"), F.col("mad")
    modz_ok = med.isNotNull() & mad.isNotNull() & (mad != 0)
    modz = modz_ok & (F.abs(0.6745 * (v - med) / mad) > 3.5)
    half1 = F.col("pos") <= (mid_pos if mid_pos is not None else 0)
    aggs = [
        F.sum(F.when(modz_ok, modz.cast("long"))).alias("modz"),
        F.min(F.when(modz, v)).alias("s_modz_min"),
        F.max(F.when(modz, v)).alias("s_modz_max"),
    ]
    for tag, pred in (("h1", half1), ("h2", ~half1)):
        z = F.when(pred, F.abs(v - F.col(f"{tag}_med")))
        aggs += [F.avg(z).alias(f"{tag}_zmean"),
                 F.var_samp(z).alias(f"{tag}_zvar")]
    out = {}
    for r in u.groupBy("k").agg(*aggs).collect():
        d = r.asDict()
        col = d.pop("k")
        out.update({f"{col}::{key}": val for key, val in d.items()})
    return out


def _catstats_melted(raw, types, stats):
    """Every categorical/boolean column's value statistics in ~8 jobs
    TOTAL (the per-column loop costs ~5 jobs PER COLUMN — ~600 driver
    round-trips at 120 categorical columns): one melted
    groupBy(col, value) counts frame, then per-column scalars via one
    grouped aggregate, bounded samples via per-col row_number windows
    (the window's (k; order) total order reproduces the loop's
    orderBy+limit exactly), case-variant groups via groupBy(col,
    lower(value)), and typo candidates via a per-col equi-self-join of
    each column's top-200 repeated categories (the loop's crossJoin
    becomes a broadcast hash join keyed on the column).  Output is the
    same catstats dict, entry for entry."""
    from pyspark.sql import Window
    from qualityspark.sources import quoted_col
    cat_cols = [c for c, t in types.items()
                if t in (TI.CATEGORICAL, TI.BOOLEAN)]
    if not cat_cols:
        return {}
    pairs = []
    for col in cat_cols:
        pairs += [F.lit(col), quoted_col(col)]
    u = (raw.select(F.explode(F.create_map(*pairs)).alias("k", "c"))
         .filter(TI._nonempty(F.col("c")))
         .select("k", F.trim("c").alias("v")))
    counts = (u.groupBy("k", "v").agg(F.count(F.lit(1)).alias("n"))
              .persist())
    out = {}
    try:
        tot = raw.sparkSession.createDataFrame(
            [(c, int(stats[c]["nn"] or 1)) for c in cat_cols],
            "k string, nn long")
        j = counts.join(F.broadcast(tot), "k")
        is_rare = (F.col("n") / F.col("nn")) < 0.005
        per = {r["k"]: r.asDict() for r in j.groupBy("k").agg(
            F.sum(is_rare.cast("long")).alias("n_rare"),
            F.count(F.lit(1)).alias("n_unique")).collect()}
        w_top = Window.partitionBy("k").orderBy(F.desc("n"), "v")
        top = {r["k"]: r for r in counts
               .withColumn("rn", F.row_number().over(w_top))
               .filter(F.col("rn") == 1).collect()}
        w_v = Window.partitionBy("k").orderBy("v")
        rare_s, vals = {}, {}
        for r in (j.filter(is_rare)
                  .withColumn("rn", F.row_number().over(w_v))
                  .filter(F.col("rn") <= _CAT_SAMPLE_CAP)
                  .orderBy("k", "v").collect()):
            rare_s.setdefault(r["k"], []).append(r["v"])
        for r in (counts.withColumn("rn", F.row_number().over(w_v))
                  .filter(F.col("rn") <= _CAT_VALUES_CAP)
                  .orderBy("k", "v").collect()):
            vals.setdefault(r["k"], []).append(r["v"])
        grp = (counts.groupBy("k", F.lower(F.col("v")).alias("lv"))
               .agg(F.countDistinct("v").alias("nv"),
                    F.sort_array(F.collect_set("v")).alias("variants"))
               .filter(F.col("nv") > 1).persist())
        try:
            n_case = {r["k"]: r["cnt"] for r in
                      grp.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
                      .collect()}
            w_case = Window.partitionBy("k").orderBy(F.col("variants")[0])
            case_s = {}
            for r in (grp.withColumn("rn", F.row_number().over(w_case))
                      .filter(F.col("rn") <= _CAT_SAMPLE_CAP)
                      .orderBy("k", F.col("variants")[0]).collect()):
                case_s.setdefault(r["k"], []).append(list(r["variants"]))
        finally:
            grp.unpersist()
        # typo candidates: per-col top-200 repeated categories self-join
        cats = (counts.filter(F.col("n") > 1)
                .withColumn("rn", F.row_number().over(w_top))
                .filter(F.col("rn") <= B.MAX_TYPO_CATS).select("k", "v"))
        a = cats.select("k", F.col("v").alias("va"))
        b = cats.select("k", F.col("v").alias("vb"))
        la, lb = F.lower(F.col("va")), F.lower(F.col("vb"))
        sim = 1.0 - F.levenshtein(la, lb) / F.greatest(F.length(la),
                                                       F.length(lb))
        tpairs = (a.join(F.broadcast(b), "k")
                  .filter((F.col("va") < F.col("vb")) & (la != lb))
                  .withColumn("sim", sim)
                  .filter(F.col("sim") >= 0.85).persist())
        try:
            n_typo = {r["k"]: r["cnt"] for r in
                      tpairs.groupBy("k")
                      .agg(F.count(F.lit(1)).alias("cnt")).collect()}
            w_t = Window.partitionBy("k").orderBy(F.desc("sim"),
                                                  "va", "vb")
            typo_s = {}
            for r in (tpairs.withColumn("rn", F.row_number().over(w_t))
                      .filter(F.col("rn") <= B._SAMPLE_CAP)
                      .orderBy("k", F.desc("sim"), "va", "vb").collect()):
                typo_s.setdefault(r["k"], []).append(
                    f"'{r['va']}' ~ '{r['vb']}' (sim={r['sim']:.2f})")
        finally:
            tpairs.unpersist()
    finally:
        counts.unpersist()
    for col in cat_cols:
        nn = stats[col]["nn"]
        p = per.get(col) or {"n_rare": 0, "n_unique": 0}
        selected = TI.checks_for_type(types[col])
        checks = []
        if nn:
            t_ = top.get(col)
            if t_ is not None and "CLASS_IMBALANCE" in selected:
                pct = t_["n"] / nn
                sev = ("HIGH" if pct >= 0.95 else
                       "MEDIUM" if pct >= 0.90 else "PASS")
                checks.append(B._check(
                    "CLASS_IMBALANCE", sev, pct,
                    f"dominant category '{t_['v']}' = {pct:.1%}"))
            if "CARDINALITY_CHANGE" in selected:
                nu = p["n_unique"]
                checks.append(B._check(
                    "CARDINALITY_CHANGE", "INFO", nu,
                    f"{nu} distinct categories (ratio {nu / nn:.2%})",
                    passed_ok=("PASS", "INFO")))
            if "TYPO_CANDIDATES" in selected:
                np_ = n_typo.get(col, 0)
                sev = ("MEDIUM" if np_ > 5 else "LOW" if np_ else "PASS")
                checks.append(B._check(
                    "TYPO_CANDIDATES", sev, np_,
                    f"{np_} candidate typo pair(s) "
                    f"(normalized Levenshtein ≥0.85)",
                    samples=typo_s.get(col)))
        out[col] = {"n_rare": int(p["n_rare"]),
                    "rare": rare_s.get(col, []) if p["n_rare"] else [],
                    "n_case_groups": n_case.get(col, 0),
                    "case_samples": case_s.get(col, []),
                    "values": vals.get(col, []),
                    "breadth_checks": checks}
    return out


def _date_values_melted(tv, date_cols):
    """date_value_pass for every date column in 3 jobs total: melted
    groupBy(col, value) counts, one per-col summary aggregate, and ONE
    bounded collect of the sorted distinct values for the columns under
    the MAX_DATE_DISTINCT driver cap.  Returns {col: (summary, gap)}."""
    if not date_cols:
        return {}
    pairs = []
    for col in date_cols:
        pairs += [F.lit(col),
                  F.col(f"`{col}_typed`").cast("timestamp")]
    u = (tv.select(F.explode(F.create_map(*pairs)).alias("k", "d"))
         .filter(F.col("d").isNotNull()))
    g = u.groupBy("k", "d").agg(F.count(F.lit(1)).alias("n")).persist()
    out = {}
    try:
        per = {r["k"]: r for r in g.groupBy("k").agg(
            F.count(F.lit(1)).alias("nd"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("nv"),
            F.coalesce(F.sum(F.when(F.col("n") > 1, F.col("n"))),
                       F.lit(0)).alias("ndup")).collect()}
        gap_cols = [c for c in date_cols
                    if c in per and per[c]["nv"] >= 10
                    and per[c]["nd"] <= B.MAX_DATE_DISTINCT]
        rows_by_col = {}
        if gap_cols:
            for r in (g.filter(F.col("k").isin(*gap_cols))
                      .orderBy("k", "d").collect()):
                rows_by_col.setdefault(r["k"], []).append(r)
        for col in date_cols:
            s = per.get(col)
            if s is None:
                out[col] = ({"n_date_valid": 0, "n_date_distinct": 0,
                             "n_dup_dates": 0}, None)
                continue
            summary = {"n_date_valid": int(s["nv"]),
                       "n_date_distinct": int(s["nd"]),
                       "n_dup_dates": int(s["ndup"])}
            gap = None
            if s["nv"] >= 10:
                if s["nd"] > B.MAX_DATE_DISTINCT:
                    gap = B._check(
                        "DATE_SEQUENCE_GAPS", "INFO", 0.0,
                        f"skipped: {s['nd']} distinct timestamps exceed "
                        f"the {B.MAX_DATE_DISTINCT} driver cap",
                        passed_ok=("PASS", "INFO"))
                else:
                    gap = B._gap_check_from_rows(rows_by_col.get(col, []))
            out[col] = (summary, gap)
    finally:
        g.unpersist()
    return out


def _id_formats_melted(raw, id_cols):
    """id_format_check for every id column in 2 jobs: melted
    groupBy(col, fingerprint) + one per-col summary, top-5 patterns via
    a per-col window.  Returns {col: check | None}."""
    from pyspark.sql import Window
    from qualityspark.rules import masks as M
    from qualityspark.sources import quoted_col
    if not id_cols:
        return {}
    pairs = []
    for col in id_cols:
        pairs += [F.lit(col), quoted_col(col)]
    u = (raw.select(F.explode(F.create_map(*pairs)).alias("k", "c"))
         .filter(TI._nonempty(F.col("c"))))
    g = (u.groupBy("k", M.id_fingerprint(F.col("c")).alias("fp"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.min(F.trim(F.col("c"))).alias("sample"))
         .persist())
    out = {}
    try:
        per = {r["k"]: r for r in g.groupBy("k").agg(
            F.count(F.lit(1)).alias("n_patterns"),
            F.sum("n").alias("total")).collect()}
        w = Window.partitionBy("k").orderBy(F.desc("n"), "fp")
        tops = {}
        for r in (g.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= 5)
                  .orderBy("k", F.desc("n"), "fp").collect()):
            tops.setdefault(r["k"], []).append(r)
        for col in id_cols:
            s, top = per.get(col), tops.get(col)
            if not s or not top or s["total"] < 10:
                out[col] = None
                continue
            n_patterns, total = s["n_patterns"], s["total"]
            dominant_pct = top[0]["n"] / total
            if dominant_pct < 0.80 and n_patterns > 3:
                sev = "HIGH"
            elif dominant_pct < 0.90:
                sev = "MEDIUM"
            elif n_patterns > 2:
                sev = "LOW"
            else:
                sev = "PASS"
            out[col] = B._check(
                "ID_FORMAT_CONSISTENCY", sev, dominant_pct,
                f"{n_patterns} format patterns "
                f"(dominant '{top[0]['fp']}' {dominant_pct:.1%})",
                samples=[r["sample"] for r in top[1:4]])
    finally:
        g.unpersist()
    return out


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

    wide_strategy = len(data_cols) > TI.WIDE_COLS_THRESHOLD

    # ---- concurrent family submission (r7, guide §2.6): the audit's
    # wall-clock was dominated by ~30-100 SERIALIZED driver jobs, each
    # paying scheduler latency while 32 cores idled (measured: 110-col x
    # 5k-row file, 105 s wall vs ~15 s client CPU).  Families with no
    # data dependency are submitted from a driver thread pool
    # (qualityspark.parallel): phase 0 = pass A plus everything that
    # needs only raw/tv/types; phase 1 = everything that needs pass A's
    # statistics.  Each thunk is exactly the serial code it replaces and
    # assembly waits for every future, so the report is byte-identical
    # (pinned by test_r6_perf.py); QS_AUDIT_PARALLEL=0 restores serial
    # submission. ----

    def fam_pass_a():
        # pass A: one stats job over every column.  Narrow tables use
        # the wide single-agg plan (no shuffle; heavy per-row signals
        # projected once beneath the agg — _pass_a_prep); past the
        # codegen field cliff the melted plan computes the same
        # statistics (_pass_a_melted)
        if wide_strategy:
            return _pass_a_melted(tv, types, data_cols, date_axis)
        prep, helper_names = _pass_a_prep(tv, types)
        return (prep.agg(*_pass_a_aggs(prep, types, date_axis,
                                       helper_names))
                .first().asDict())

    def fam_s1s2():
        # stacked breadth passes: each ONE job regardless of column count
        s1 = B.stacked_pass1(raw, data_cols)
        return s1, B.stacked_pass2(raw, data_cols, s1)

    def fam_mono():
        date_cols = [c for c, t in types.items() if t in _DATES]
        if not any("DATE_MONOTONICITY" in TI.checks_for_type(types[c])
                   for c in date_cols):
            return {}
        fn = (B.monotonicity_melted if wide_strategy
              else B.monotonicity_pass)
        return fn(tv, date_cols)

    def fam_ndup():
        # exact duplicate rows: one groupBy over a row HASH, not the row
        # (a groupBy on all columns shuffles full-width rows; the sha2 of
        # the null-marked concatenation shuffles 32 bytes/row — exact up
        # to a 2^-256 collision).  \x1f separates fields, \x00 marks NULL
        # so ("a",NULL) never collides with ("a","")
        row_key = F.sha2(F.concat_ws(
            "\x1f", *[F.coalesce(F.col(f"`{c}`"), F.lit("\x00"))
                      for c in data_cols]), 256)
        return (raw.select(row_key.alias("k")).groupBy("k")
                .agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
                .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)))
                .first()[0])

    def fam_datevals():
        # per-date-column distinct-value stats (gaps + duplicates);
        # summaries are merged into ``stats`` at assembly time — their
        # keys (n_date_*) are only read by _column_checks
        dv_cols = [col for col, t in types.items() if t in _DATES
                   and {"DATE_SEQUENCE_GAPS", "DATE_DUPLICATES"}
                   & set(TI.checks_for_type(t))]
        if wide_strategy:
            return _date_values_melted(tv, dv_cols)
        return {col: B.date_value_pass(tv, col) for col in dv_cols}

    def fam_idfmt():
        # per-ID-column format-consistency (id columns are few — unless
        # the table is wide, where the melted variant caps the job count)
        id_cols_sel = [col for col, t in types.items()
                       if t == TI.ID_CANDIDATE
                       and "ID_FORMAT_CONSISTENCY" in TI.checks_for_type(t)]
        if wide_strategy:
            return {col: ch for col, ch in
                    _id_formats_melted(raw, id_cols_sel).items() if ch}
        out = {}
        for col in id_cols_sel:
            ch = B.id_format_check(raw, col)
            if ch:
                out[col] = ch
        return out

    from qualityspark.parallel import audit_pool, submit
    pool = audit_pool()
    try:
        fut_a = submit(pool, fam_pass_a, "pass_a")
        fut0 = {"s1s2": submit(pool, fam_s1s2, "s1s2"),
                "mono": submit(pool, fam_mono, "mono"),
                "ndup": submit(pool, fam_ndup, "ndup"),
                "datevals": submit(pool, fam_datevals, "datevals"),
                "idfmt": submit(pool, fam_idfmt, "idfmt")}
        row = fut_a.result()
    except BaseException:
        pool.shutdown(wait=False, cancel_futures=True)
        raise
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
    # hypothesis family — csv_breadth module doc).  Wide tables take the
    # melted plan (same statistics; see _pass_a_melted's rationale) ----
    half1 = F.col("_pos") <= (mid_pos if mid_pos is not None else 0)
    out_aggs = []
    for col, t in () if wide_strategy else types.items():
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
    def fam_bc():
        outliers = (_pass_b_melted(tv, types, stats, mid_pos)
                    if wide_strategy else
                    (tv.agg(*out_aggs).first().asDict() if out_aggs
                     else {}))
        outliers = {k: v for k, v in outliers.items() if v is not None}

        # pass C: one job for checks needing pass-B literals
        c_aggs = []
        for col, t in () if wide_strategy else types.items():
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
        passc = (_pass_c_melted(tv, types, stats, outliers, mid_pos)
                 if wide_strategy else
                 (tv.agg(*c_aggs).first().asDict() if c_aggs else {}))
        passc = {k: v for k, v in passc.items() if v is not None}
        return outliers, passc

    def fam_ks():
        return B.ks_pass(
            tv, types, stats, date_axis,
            tuple(date_q) if date_q and date_q[0] is not None else None)

    def fam_cats():
        # per-categorical value stats: Spark-side aggregates, BOUNDED
        # driver collects.  A relative-cardinality CATEGORICAL column can
        # carry ~100k distinct values at 100-TB scale, so collecting
        # every (value, count) row would blow the driver; instead n_rare
        # and n_case_groups are Spark aggregates over the cached counts
        # frame and only capped deterministic samples come back (the
        # reference caps its value_counts the same way,
        # checks/categorical_checks.py:158-159).  Sample orderings
        # replicate the old sorted()-then-slice exactly, so
        # low-cardinality reports are byte-identical
        if wide_strategy:
            return _catstats_melted(raw, types, stats)
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
                    F.coalesce(F.sum(is_rare.cast("long")),
                               F.lit(0))).first()[0])
                rare = ([r["v"] for r in counts.filter(is_rare)
                         .orderBy("v").limit(_CAT_SAMPLE_CAP).collect()]
                        if n_rare else [])
                # case-variant groups: lower(v) buckets with >1 distinct
                # casing; a group's variant set is bounded by real
                # casings, not rows
                grp = (counts.groupBy(F.lower(F.col("v")).alias("lv"))
                       .agg(F.countDistinct("v").alias("nv"),
                            F.sort_array(F.collect_set("v"))
                            .alias("variants"))
                       .filter(F.col("nv") > 1))
                n_case = grp.count()
                case_samples = ([list(r["variants"]) for r in
                                 grp.orderBy(F.col("variants")[0])
                                 .limit(_CAT_SAMPLE_CAP).collect()]
                                if n_case else [])
                values = [r["v"] for r in
                          counts.orderBy("v")
                          .limit(_CAT_VALUES_CAP).collect()]
                breadth_checks = B.categorical_breadth(
                    counts, stats[col]["nn"], TI.checks_for_type(t))
            finally:
                counts.unpersist()
            catstats[col] = {"n_rare": n_rare, "rare": rare,
                             "n_case_groups": n_case,
                             "case_samples": case_samples,
                             "values": values,
                             "breadth_checks": breadth_checks}
        return catstats

    def fam_chi2():
        return B.chi2_pair_pass(raw, types, stats)

    def fam_xcol():
        return B.cross_column_pass(tv, types, stats, n_rows)

    def fam_temporal():
        if not date_axis:
            return {"dataset": [], "by_col": {}}
        return B.temporal_pass(
            tv, types, stats, date_axis, n_rows,
            {c: TI.TEMPORAL_DATASET_CHECKS for c, t in types.items()
             if t in _NUMERIC})

    fut1 = {"bc": submit(pool, fam_bc, "bc"),
            "ks": submit(pool, fam_ks, "ks"),
            "cats": submit(pool, fam_cats, "cats"),
            "chi2": submit(pool, fam_chi2, "chi2"),
            "xcol": submit(pool, fam_xcol, "xcol"),
            "temporal": submit(pool, fam_temporal, "temporal")}

    # ---- resolve every family; from here on the code is the serial
    # assembly it always was ----
    try:
        s1, s2 = fut0["s1s2"].result()
        mono = fut0["mono"].result()
        n_dup = fut0["ndup"].result()
        datevals = fut0["datevals"].result()
        id_checks = fut0["idfmt"].result()
        outliers, passc = fut1["bc"].result()
        ks_res = fut1["ks"].result()
        catstats = fut1["cats"].result()
        chi2_per_col, cat_assoc = fut1["chi2"].result()
        xcol_checks = fut1["xcol"].result()
        temporal = fut1["temporal"].result()
    finally:
        pool.shutdown(wait=True)

    dup_pct = n_dup / n_rows if n_rows else 0.0

    # per-date-column summaries merge into stats now (their keys are read
    # only by _column_checks below)
    date_gaps = {}
    for col, (summary, gap) in datevals.items():
        stats[col].update(summary)
        if gap and "DATE_SEQUENCE_GAPS" in TI.checks_for_type(types[col]):
            date_gaps[col] = gap

    dataset_checks = xcol_checks
    if cat_assoc:
        dataset_checks.append(cat_assoc)
    dataset_checks += B.pii_dataset_checks(s1, n_rows)
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
