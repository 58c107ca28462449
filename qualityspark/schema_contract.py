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
        if want and name in actual and actual[name] != want:
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
