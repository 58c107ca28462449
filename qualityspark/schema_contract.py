"""Declared-schema validation (reference core/schema_validator.py:4-222).

The reference accepts a YAML contract; here the contract is a plain dict
(YAML loads to exactly this shape) and every per-row rule compiles to a
Column expression; structural checks (missing/extra/type) compare
StructTypes driver-side.

Contract shape:
    {"columns": {
        "url": {"type": "string", "required": True, "not_null": True,
                 "pattern": r"^https?://", "unique": True},
        "score": {"type": "double", "min": 0, "max": 100},
        "lang": {"allowed_values": ["en", "es"]}},
     "composite_keys": [["url", "warc_ts"]]}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# semantic contract type -> acceptable Spark physical types, so ONE
# contract file validates both the typed-parquet `run` path (physical
# comparison here) and the all-string CSV path (semantic comparison in
# validate_semantic).  A literal Spark simpleString also works as `type:`.
_PHYSICAL_OK = {
    "numeric": {"double", "float", "int", "bigint", "smallint", "tinyint",
                "long"},
    "date": {"date", "timestamp", "timestamp_ntz"},
    "boolean": {"boolean"},
    "categorical": {"string"},
    "text": {"string"},
    "email": {"string"},
    "phone": {"string"},
    "id": {"string", "int", "bigint", "long"},
}


def _physical_type_ok(actual: str, want: str) -> bool:
    ok = _PHYSICAL_OK.get(want, {want})
    return actual in ok or (want == "numeric"
                            and actual.startswith("decimal"))


def validate_schema(df: DataFrame, contract: dict) -> list[dict]:
    """Returns a list of violation dicts
    {check_id, column, passed, affected_count} — the CheckResult analog."""
    results: list[dict] = []
    cols = contract.get("columns", {})
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}

    # structural (reference core/schema_validator.py:71-113)
    for name, spec in cols.items():
        if spec.get("required", False) and name not in actual:
            results.append({"check_id": "SCHEMA_MISSING_COLUMN",
                            "column": name, "passed": False,
                            "affected_count": 0})
    extra = set(actual) - set(cols)
    if cols and extra:
        results.append({"check_id": "SCHEMA_EXTRA_COLUMNS",
                        "column": ",".join(sorted(extra)), "passed": True,
                        "affected_count": len(extra)})  # INFO in reference
    for name, spec in cols.items():
        want = spec.get("type")
        if want and name in actual and not _physical_type_ok(actual[name],
                                                             want):
            results.append({"check_id": "SCHEMA_TYPE_MISMATCH",
                            "column": name, "passed": False,
                            "affected_count": 0,
                            "detail": f"{actual[name]} != {want}"})

    # row-level: compose ONE aggregation for all rules (single pass)
    aggs = []
    labels = []
    for name, spec in cols.items():
        if name not in actual:
            continue
        c = F.col(name)
        if spec.get("not_null"):
            aggs.append(F.sum(c.isNull().cast("long")))
            labels.append(("SCHEMA_NOT_NULL", name))
        if "min" in spec:
            aggs.append(F.sum((c < spec["min"]).cast("long")))
            labels.append(("SCHEMA_RANGE_VIOLATION", name))
        if "max" in spec:
            aggs.append(F.sum((c > spec["max"]).cast("long")))
            labels.append(("SCHEMA_RANGE_VIOLATION", name))
        # nulls are SCHEMA_NOT_NULL's business, not a value violation
        if "allowed_values" in spec:
            aggs.append(F.sum((c.isNotNull()
                               & ~c.isin(*spec["allowed_values"]))
                              .cast("long")))
            labels.append(("SCHEMA_ALLOWED_VALUES", name))
        if "pattern" in spec:
            aggs.append(F.sum((c.isNotNull() & ~c.rlike(spec["pattern"]))
                              .cast("long")))
            labels.append(("SCHEMA_PATTERN_VIOLATION", name))
        if spec.get("unique"):
            aggs.append(F.count(c) - F.count_distinct(c))
            labels.append(("SCHEMA_UNIQUE_VIOLATION", name))
    if aggs:
        row = df.agg(*aggs).first()
        for (check_id, name), cnt in zip(labels, row):
            cnt = int(cnt or 0)
            results.append({"check_id": check_id, "column": name,
                            "passed": cnt == 0, "affected_count": cnt})

    # composite keys (reference core/schema_validator.py:203-222)
    for key in contract.get("composite_keys", []):
        if not all(k in actual for k in key):
            continue
        dup = (df.groupBy(*key).count().filter(F.col("count") > 1)
               .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)))
               .first()[0])
        results.append({"check_id": "COMPOSITE_KEY_VIOLATION",
                        "column": ",".join(key),
                        "passed": int(dup) == 0,
                        "affected_count": int(dup)})
    return results


# ---------------------------------------------------------------------------
# Semantic-type-aware validation for the arbitrary-CSV audit path
# (reference SchemaValidator.validate(df_raw, df, column_types),
# core/schema_validator.py:49-222: the `type:` field names a SEMANTIC type
# — numeric / categorical / date / text / boolean / email / phone / id —
# compared against the detection result, not a physical Spark type).
# ---------------------------------------------------------------------------

# reference severities (core/schema_validator.py:77-216)
SCHEMA_SEVERITY = {
    "SCHEMA_MISSING_COLUMN": "CRITICAL",
    "SCHEMA_EXTRA_COLUMNS": "INFO",
    "SCHEMA_TYPE_MISMATCH": "HIGH",
    "SCHEMA_NOT_NULL": "HIGH",
    "SCHEMA_RANGE_VIOLATION": "HIGH",
    "SCHEMA_ALLOWED_VALUES": "HIGH",
    "SCHEMA_PATTERN_VIOLATION": "MEDIUM",
    "SCHEMA_UNIQUE_VIOLATION": "HIGH",
    "COMPOSITE_KEY_VIOLATION": "HIGH",
}

# reference EXPECTED_TYPE_MAP (core/schema_validator.py:29-38), keyed by
# this engine's typeinfer semantic-type names
EXPECTED_TYPE_MAP = {
    "numeric": ("NUMERIC_CONTINUOUS", "NUMERIC_DISCRETE"),
    "categorical": ("CATEGORICAL",),
    "date": ("DATE", "DATETIME"),
    "text": ("HIGH_CARDINALITY",),
    "boolean": ("BOOLEAN",),
    "email": ("EMAIL",),
    "phone": ("PHONE",),
    "id": ("ID_CANDIDATE",),
}

_ROW_RULE_KEYS = {"not_null", "min", "max", "allowed_values", "pattern",
                  "unique"}
_COLUMN_SPEC_KEYS = _ROW_RULE_KEYS | {"type", "required"}


def _to_java_regex(pat: str) -> tuple[str | None, str | None]:
    """(translated_pattern, error): contract patterns run via rlike —
    java.util.regex, NOT Python re — so Python-only spellings either
    translate to their exact Java equivalent ((?P<n>) -> (?<n>),
    (?P=n) -> \\k<n>) or are rejected with a load-time error
    (conditionals (?(id)...), which Java lacks).  Shared constructs
    (classes, quantifiers, inline (?i) flags, lookaround) pass through
    unchanged; \\d/\\w/\\s are ASCII in Java vs Unicode in Python re —
    a semantic (not syntactic) gap we document rather than rewrite,
    matching the raw-string CSV columns this validates."""
    import re
    out, i, n = [], 0, len(pat)
    while i < n:
        ch = pat[i]
        if ch == "\\" and i + 1 < n:
            out.append(pat[i:i + 2])
            i += 2
            continue
        if pat.startswith("(?P<", i):
            out.append("(?<")          # Java named group
            i += 4
            continue
        if pat.startswith("(?P=", i):
            m = re.match(r"\(\?P=(\w+)\)", pat[i:])
            if not m:
                return None, "malformed (?P=name) backreference"
            out.append(f"\\k<{m.group(1)}>")   # Java named backref
            i += m.end()
            continue
        if pat.startswith("(?(", i):
            return None, ("conditional group (?(id)...) has no "
                          "java.util.regex equivalent (pattern runs "
                          "JVM-side via rlike)")
        out.append(ch)
        i += 1
    return "".join(out), None


def load_contract(path: str) -> dict:
    """YAML/JSON schema contract from disk, shape-validated BEFORE any
    SparkSession exists (reference --schema, data_quality_auditor.py:127,
    148-152).  Raises ValueError listing every problem."""
    with open(path, encoding="utf-8") as f:
        raw = f.read()
    if path.endswith(".json"):
        import json
        data = json.loads(raw)
    else:
        import yaml
        data = yaml.safe_load(raw) or {}
    errs = []
    if not isinstance(data, dict):
        raise ValueError(f"schema contract must be a mapping: {path}")
    cols = data.get("columns", {})
    if not isinstance(cols, dict):
        errs.append("columns: must be a mapping of column -> spec")
        cols = {}
    for name, spec in cols.items():
        if not isinstance(spec, dict):
            errs.append(f"columns.{name}: spec must be a mapping")
            continue
        for k in set(spec) - _COLUMN_SPEC_KEYS:
            errs.append(f"columns.{name}.{k}: unknown key")
        t = spec.get("type")
        valid_types = (set(EXPECTED_TYPE_MAP)
                       | set().union(*_PHYSICAL_OK.values()))
        if t is not None and t not in valid_types:
            errs.append(f"columns.{name}.type: '{t}' not one of "
                        f"{sorted(valid_types)}")
        if "allowed_values" in spec and not isinstance(
                spec["allowed_values"], list):
            errs.append(f"columns.{name}.allowed_values: must be a list")
        if "pattern" in spec:
            import re
            pat = str(spec["pattern"])
            try:
                re.compile(pat)
            except re.error as e:
                errs.append(f"columns.{name}.pattern: invalid regex ({e})")
            else:
                # the pattern EXECUTES JVM-side (rlike = java.util.regex),
                # so Python-only syntax must fail HERE, at fail-fast load
                # time, not mid-audit after session startup (r5 ADVICE).
                # (?P<name>)/(?P=name) have exact Java spellings — translate;
                # conditionals (?(id)...) have none — reject.
                translated, err = _to_java_regex(pat)
                if err:
                    errs.append(f"columns.{name}.pattern: {err}")
                else:
                    spec["pattern"] = translated
    keys = data.get("composite_keys", [])
    if not isinstance(keys, list) or any(
            not isinstance(k, list) or not k for k in keys):
        errs.append("composite_keys: must be a list of non-empty lists")
    if errs:
        raise ValueError("schema contract validation errors:\n  - "
                         + "\n  - ".join(errs))
    return data


def validate_semantic(raw: DataFrame, typed: DataFrame,
                      types: dict[str, str], contract: dict) -> list[dict]:
    """Contract validation against a detected-type CSV audit frame.

    Structural checks compare SEMANTIC types driver-side; every row-level
    rule folds into ONE aggregation over the typed view (value rules read
    `<col>_typed` where a cast exists, pattern/allowed/unique read the
    trimmed raw string, mirroring reference df vs df_raw usage), with
    min/max offending samples collected in the same pass.  Composite keys
    are one tiny groupBy each.  Returns reference-shaped CheckResult
    dicts: {check_id, column, passed, severity, affected_count,
    affected_pct, sample_values}."""
    from qualityspark import typeinfer as TI
    from qualityspark.sources import quoted_col

    results: list[dict] = []
    cols = contract.get("columns", {})
    data_cols = [c for c in raw.columns if c != "_corrupt_record"]

    def res(check_id, column, n_bad, n_total=None, passed=None, samples=None,
            detail=""):
        out = {"check_id": check_id, "column": column,
               "passed": (n_bad == 0) if passed is None else passed,
               "severity": SCHEMA_SEVERITY[check_id],
               "affected_count": int(n_bad),
               "affected_pct": round(n_bad / n_total, 4) if n_total
               else 0.0}
        if samples:
            out["sample_values"] = [str(s) for s in samples][:5]
        if detail:
            out["detail"] = detail
        return out

    # structural: missing / extra / semantic type
    for name, spec in cols.items():
        if spec.get("required", False) and name not in data_cols:
            results.append(res("SCHEMA_MISSING_COLUMN", name, 0))
            results[-1]["passed"] = False
    extra = sorted(set(data_cols) - set(cols))
    if cols and extra:
        results.append(res("SCHEMA_EXTRA_COLUMNS", "__dataset__",
                           len(extra), passed=True,
                           samples=extra[:10]))
    for name, spec in cols.items():
        want = spec.get("type")
        if want and name in types and types[name] not in \
                EXPECTED_TYPE_MAP.get(want, ()):
            results.append(res(
                "SCHEMA_TYPE_MISMATCH", name, 0,
                detail=f"expected {want}, detected {types[name]}"))
            results[-1]["passed"] = False

    # row-level: ONE aggregation for every rule on every present column
    aggs, labels = [F.count(F.lit(1)).alias("__n")], []
    for name, spec in cols.items():
        if name not in data_cols:
            continue
        c = quoted_col(name)
        s = F.trim(c)
        ne = TI._nonempty(c)
        val = F.when(ne, s)
        typed_name = f"{name}_typed"
        v = (F.col(f"`{typed_name}`") if typed_name in typed.columns
             else val.try_cast("double"))

        def rule(check_id, pred, sample_col):
            i = len(labels)
            aggs.append(F.sum(pred.cast("long")).alias(f"__b{i}"))
            aggs.append(F.min(F.when(pred, sample_col)).alias(f"__lo{i}"))
            aggs.append(F.max(F.when(pred, sample_col)).alias(f"__hi{i}"))
            labels.append((check_id, name))

        if spec.get("not_null"):
            rule("SCHEMA_NOT_NULL", ~ne, c)
        if "min" in spec:
            rule("SCHEMA_RANGE_VIOLATION", v < F.lit(spec["min"]), v)
        if "max" in spec:
            rule("SCHEMA_RANGE_VIOLATION", v > F.lit(spec["max"]), v)
        if "allowed_values" in spec:
            allowed = [str(x) for x in spec["allowed_values"]]
            rule("SCHEMA_ALLOWED_VALUES", ne & ~s.isin(*allowed), s)
        if "pattern" in spec:
            # re.match anchors at the start (reference :188); rlike
            # searches anywhere, so anchor explicitly
            rx = "^(?:" + str(spec["pattern"]) + ")"
            rule("SCHEMA_PATTERN_VIOLATION", ne & ~s.rlike(rx), s)
        if spec.get("unique"):
            i = len(labels)
            aggs.append((F.count(val) - F.count_distinct(val))
                        .alias(f"__b{i}"))
            aggs.append(F.lit(None).alias(f"__lo{i}"))
            aggs.append(F.lit(None).alias(f"__hi{i}"))
            labels.append(("SCHEMA_UNIQUE_VIOLATION", name))
    if labels:
        row = typed.agg(*aggs).first().asDict()
        n_rows = row["__n"] or 0
        for i, (check_id, name) in enumerate(labels):
            n_bad = int(row[f"__b{i}"] or 0)
            if n_bad == 0:
                continue
            samples = [x for x in (row[f"__lo{i}"], row[f"__hi{i}"])
                       if x is not None]
            if len(samples) == 2 and samples[0] == samples[1]:
                samples = samples[:1]
            results.append(res(check_id, name, n_bad, n_total=n_rows,
                               samples=samples))

    # composite keys (reference :203-222)
    for key in contract.get("composite_keys", []):
        if not all(k in data_cols for k in key):
            continue
        dup = (raw.groupBy(*[quoted_col(k) for k in key])
               .agg(F.count(F.lit(1)).alias("__c"))
               .filter(F.col("__c") > 1)
               .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)))
               .first()[0])
        if int(dup):
            results.append(res("COMPOSITE_KEY_VIOLATION", ",".join(key),
                               int(dup)))
    return results
