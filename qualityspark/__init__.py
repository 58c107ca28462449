"""qualityspark — PySpark-native web-text quality pipeline.

Language-ID + quality-filter + PII scrub over Common-Crawl-style page tables
(url, warc_ts, html, text, lang), re-expressing the per-column statistical
validation semantics of the reference repo
(Jorge-Polanco-Roque/Data_Quality_Auditoring) as idiomatic Spark:
Column expressions for everything vectorizable, Arrow-batched pandas UDFs
only for model inference and the byte-identical PII scrub.
"""

__version__ = "0.1.0"
