"""Generic audit of an ALREADY-TYPED table (parquet / any DataFrame) —
the beyond-reference generalization of the CSV audit to where 100-TB data
actually lives.  The reference auditor is CSV-only (its loader is two
pd.read_csv calls, core/data_loader.py:14-80); this module runs the SAME
check engine (csv_audit._audit_frame: passes A/B/C, stacked breadth
passes, bounded per-type jobs, dataset-level families, scoring, report)
over columnar input with the two changes a typed source demands:

* **semantic types come from the schema, not a string cascade.**  A
  double column IS numeric; a timestamp column IS datetime — running the
  11-format parse ladder over a stringified timestamp would misclassify
  fractional-second values (strict full-match formats reject ``.123``)
  and waste a regex walk per row.  Only genuine string columns go
  through the detection cascade (typeinfer.detect_types on just that
  subset — one aggregation job).  Typed columns get one cheap
  count/nonnull/approx-distinct aggregation (no regex, no ladder) to
  refine EMPTY / CONSTANT / discrete-vs-continuous with the same
  thresholds as typeinfer._classify.
* **the typed view is a passthrough, not a re-parse.**  ``<col>_typed``
  is the original column (cast double / timestamp / date / boolean), so
  values never round-trip through strings for the numeric/date math;
  the all-string ``raw`` view (one cast-to-string projection, codegen'd)
  exists only for the format/whitespace/PII string checks the engine
  shares with the CSV path.

Complex-typed columns (array / map / struct / binary) are excluded from
the audit and reported in ``skipped_columns`` — the per-column check
families are scalar by construction (the reference caps its surface the
same way via MAX_COLUMNS and string coercion, core/data_loader.py:61-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityspark import typeinfer as TI
from qualityspark.config import resolve
from qualityspark.csv_audit import _audit_frame
from qualityspark.sources import quoted_col

_NUM_DTYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _dtype_kind(simple: str) -> str | None:
    """Spark simpleString -> coarse kind handled by the typed path."""
    if simple in _NUM_DTYPES or simple.startswith("decimal"):
        return "num"
    if simple == "date":
        return "date"
    if simple.startswith("timestamp"):
        return "ts"
    if simple == "boolean":
        return "bool"
    if simple == "string":
        return "str"
    return None


def _classify_typed(kind: str, n: int, nn: int, nu: int) -> str:
    """typeinfer._classify thresholds applied to a schema-typed column:
    EMPTY (>=95%% null) and CONSTANT (one distinct value) override the
    dtype; numeric refines discrete/continuous on the same <0.05
    unique-ratio the cascade uses."""
    if n == 0 or nn / n <= 0.05:
        return TI.EMPTY
    if nu == 1:
        return TI.CONSTANT
    if kind == "bool":
        return TI.BOOLEAN
    if kind == "num":
        ratio = nu / nn if nn else 0.0
        return (TI.NUMERIC_DISCRETE if ratio < 0.05
                else TI.NUMERIC_CONTINUOUS)
    return TI.DATE if kind == "date" else TI.DATETIME


def audit_table(spark: SparkSession, df: DataFrame, cfg=None,
                schema: dict | None = None, date_col: str | None = None,
                label: str = "table") -> dict:
    """Full audit of a typed DataFrame -> the same report dict
    audit_csv produces (plus ``skipped_columns`` for complex types)."""
    cfg = resolve(cfg)
    kinds = {f.name: _dtype_kind(f.dataType.simpleString())
             for f in df.schema.fields}
    skipped = [c for c, k in kinds.items() if k is None]
    string_cols = [c for c, k in kinds.items() if k == "str"]
    typed_cols = {c: k for c, k in kinds.items()
                  if k is not None and k != "str"}
    data_cols = [c for c in df.columns if c not in skipped]

    types: dict[str, str] = {}
    if string_cols:
        # full detection cascade, but only over the genuinely-string
        # subset — one aggregation job
        types.update(TI.detect_types(
            df.select(*[quoted_col(c) for c in string_cols])))
    if typed_cols:
        # one regex-free stats job: count / nonnull / approx distinct
        aggs = [F.count(F.lit(1)).alias("::n")]
        for i, c in enumerate(typed_cols):
            qc = quoted_col(c)
            aggs += [F.count(qc).alias(f"{i}::nn"),
                     F.approx_count_distinct(qc).alias(f"{i}::nu")]
        row = df.agg(*aggs).first().asDict()
        for i, (c, k) in enumerate(typed_cols.items()):
            types[c] = _classify_typed(k, row["::n"] or 0,
                                       row[f"{i}::nn"] or 0,
                                       row[f"{i}::nu"] or 0)

    # ONE projection builds the all-string raw view AND the typed
    # passthrough columns; _pos follows file/row-group order like the
    # CSV scan's split order
    sel = [quoted_col(c).cast("string").alias(c) if c in typed_cols
           else quoted_col(c) for c in data_cols]
    cast_to = {TI.NUMERIC_CONTINUOUS: "double",
               TI.NUMERIC_DISCRETE: "double",
               TI.DATE: "date", TI.DATETIME: "timestamp",
               TI.BOOLEAN: "boolean"}
    for c in typed_cols:
        tgt = cast_to.get(types[c])
        if tgt:
            sel.append(quoted_col(c).cast(tgt).alias(f"{c}_typed"))
    base = df.select(*sel).withColumn(
        "_pos", F.monotonically_increasing_id())
    # string columns the cascade typed as date/numeric/boolean still
    # parse through the shared ladder, exactly like the CSV path
    tv = TI.auto_typed_view(base, {c: types[c] for c in string_cols})
    return _audit_frame(tv, tv, types, cfg, schema=schema,
                        date_col=date_col, label=label,
                        data_cols=data_cols,
                        skipped_columns=skipped or None)


def audit_parquet(spark: SparkSession, path: str, cfg=None,
                  schema: dict | None = None,
                  date_col: str | None = None) -> dict:
    """Audit a parquet file/directory (CLI ``audit-parquet``)."""
    return audit_table(spark, spark.read.parquet(path), cfg=cfg,
                       schema=schema, date_col=date_col, label=path)
