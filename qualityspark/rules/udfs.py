"""The single Arrow-batched Python pass of the pipeline.

Everything that genuinely needs Python (model inference + the byte-identical
PII scrub, which must use Python ``re`` semantics — SURVEY.md §7.4 item 1)
runs in ONE pandas UDF so each row crosses the JVM↔Python boundary once.
Models are module-level: loaded once per executor python worker, not per
batch (the iterator form's usual benefit, achieved via import caching).

Outputs one struct column:
  lang_pred / lang_prob  — n-gram langid (fastText slot)
  perplexity             — char-trigram LM score (KenLM slot)
  nul_frac               — NUL fraction of first 8 KiB of html
                           (reference core/data_loader.py:82-89 analog)
  scrubbed_text          — PII-masked text (byte-identical to oracle)
  pii_hits               — array of PII pattern names found
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from qualityspark import constants as C
from qualityspark import langmodel as L
from qualityspark import textstats as T
from qualityspark.oracle import scrub_and_hits

MODEL_STRUCT = ("struct<lang_pred:string, lang_prob:double, "
                "perplexity:double, nul_frac:double, "
                "scrubbed_text:string, pii_hits:array<string>>")


def _model_pass_fn(text: pd.Series, lang: pd.Series,
                   html_head: pd.Series) -> pd.DataFrame:
    n = len(text)
    out = {"lang_pred": [None] * n, "lang_prob": [0.0] * n,
           "perplexity": [0.0] * n, "nul_frac": [0.0] * n,
           "scrubbed_text": [None] * n, "pii_hits": [[]] * n}
    texts = text.tolist()
    langs = lang.tolist()
    htmls = html_head.tolist()
    for i in range(n):
        t = texts[i]
        lg = langs[i]
        lang_pred, lang_prob = L.predict_lang(t)
        ppl = L.perplexity(t, lg)
        out["lang_pred"][i] = lang_pred
        out["lang_prob"][i] = lang_prob
        # inf not representable in Arrow->Spark double cleanly everywhere;
        # clamp to a sentinel far above MAX_PERPLEXITY
        out["perplexity"][i] = min(ppl, 1e12)
        out["nul_frac"][i] = T.nul_fraction(htmls[i])
        if t is not None:
            scrubbed, hits = scrub_and_hits(t)
            out["scrubbed_text"][i] = scrubbed
            out["pii_hits"][i] = hits
    return pd.DataFrame(out)


_model_pass_udf = None


def model_pass():
    """pandas UDF, created lazily (DDL parsing needs an active session)."""
    global _model_pass_udf
    if _model_pass_udf is None:
        _model_pass_udf = pandas_udf(MODEL_STRUCT)(_model_pass_fn)
    return _model_pass_udf


def with_model_columns(df: DataFrame) -> DataFrame:
    """Adds the model struct fields + derived rule signals."""
    head = F.expr(f"substring(html, 1, {C.HTML_SCAN_BYTES})")
    df = df.withColumn("_m", model_pass()(F.col("text"), F.col("lang"), head))
    text_null = F.col("sig_TEXT_NULL_LIKE")
    cols = {
        "lang_pred": F.col("_m.lang_pred"),
        "lang_prob": F.col("_m.lang_prob"),
        "perplexity": F.col("_m.perplexity"),
        "scrubbed_text": F.col("_m.scrubbed_text"),
        "pii_hits": F.col("_m.pii_hits"),
        "sig_HTML_BINARY_JUNK": F.col("_m.nul_frac") > C.MAX_NUL_FRACTION,
        "sig_LANG_MISMATCH":
            (~text_null)
            & F.col("lang").isin(*C.ALLOWED_LANGS)
            & (F.col("_m.lang_pred") != "und")
            & (F.col("_m.lang_pred") != F.col("lang"))
            & (F.col("_m.lang_prob") >= C.MIN_LANG_PROB),
        "sig_PERPLEXITY_HIGH":
            (~text_null) & (F.col("_m.perplexity") > C.MAX_PERPLEXITY),
    }
    for name, _rx, _sev in C.PII_PATTERNS:
        cols[f"sig_PII_{name}"] = F.array_contains(F.col("_m.pii_hits"),
                                                   name)
    return df.withColumns(cols).drop("_m")
