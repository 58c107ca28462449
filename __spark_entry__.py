"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship web-text quality-audit pipeline
(qualityspark.pipeline: signals -> Arrow model pass -> keep-first dedup ->
scoring) over the sf0.001 documents table mapped to the Common-Crawl-style
pages schema from BASELINE.json input_hint.

``queries()`` / ``oracle_sql()`` expose the operator registry in
qualityspark.queries — every SQL-expressible operator from SURVEY.md §2 has
a DuckDB oracle with identical column names and rounding; model-bound or
approximate-by-design operators (pandas-UDF langid/perplexity/scrub,
SimHash, LSH ANN, multimodal decode) are rows-only here and get exact
parity coverage against the pure-Python oracle in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality-audit over sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F
    from qualityspark.queries import documents_as_pages
    from qualityspark.pipeline import audit

    pages = documents_as_pages(spark, "/root/testdata/sf0.001")
    res = audit(pages)
    return res.select(
        "url", "warc_ts", "lang", "lang_pred",
        F.round("lang_prob", 4).alias("lang_prob"),
        F.round("perplexity", 4).alias("perplexity"),
        "score", "grade", "keep", "rules_fired", "scrubbed_text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from qualityspark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from qualityspark.queries import ORACLES
    return dict(ORACLES)
