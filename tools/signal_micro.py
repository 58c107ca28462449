"""Per-signal cost attribution for the pipeline signal projection.

Times pages.select(<one signal>) with a noop sink, signal by signal, so
OPTIMIZATION_r07.md can cite which expressions dominate the 300k-doc
signal stage.  Usage: python tools/signal_micro.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    from qualityspark.session import get_spark
    from qualityspark import synth
    from qualityspark import constants as C
    from qualityspark.rules import heuristics as H
    from qualityspark.config import resolve

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="signal-micro", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    spark.conf.set("spark.sql.files.minPartitionNum", str(cpus * 2))

    path = f"/tmp/qs_bench_pages_{n_docs}.parquet"
    if not os.path.exists(path):
        (synth.pages_df(spark, n_docs, partitions=64)
         .write.mode("overwrite").parquet(path))
    pages = spark.read.parquet(path)
    cfg = resolve(None)

    text, url, ts, lang = (F.col("text"), F.col("url"), F.col("warc_ts"),
                           F.col("lang"))
    toks = H.tokens_expr(text)
    n = F.regexp_count(F.coalesce(text, F.lit("")),
                       F.lit(H.NON_WS_CLASS + "+"))
    lines = (F.when(text.isNull() | (text == ""),
                    F.array().cast("array<string>"))
             .otherwise(F.split(text, "\n", -1)))
    text_lower = F.lower(F.coalesce(text, F.lit("")))

    cases = {
        "baseline_len": F.length(text),
        "n_words_regexp_count": n,
        "tokens_expr(split+filter)": F.size(toks),
        "null_like": H.is_null_like(text),
        "control_chars": H.has_control_chars(text),
        "mean_word_len": H.mean_word_len(text, n),
        "symbol_ratio": H.symbol_word_ratio(text, n),
        "bullet_lines": H.bullet_line_ratio(lines),
        "ellipsis_lines": H.ellipsis_line_ratio(lines),
        "alpha_ratio": H.alpha_word_ratio(text, n),
        "req_stopwords": H.required_stopword_hits(text_lower, lang),
        "stopword_density": H.stopword_density(text_lower, n, lang),
        "toxicity_count": F.regexp_count(
            text_lower, F.lit(H._bounded_words_re(sorted(C.TOXICITY_WORDS)))),
        "repetition_3gram": H.repetition_3gram(toks, n),
        "caps_ratio": H.caps_ratio(text),
        "ws_unstripped": H.has_unstripped_whitespace(text),
        "truncation": H.has_truncation_signs(text),
        "url_malformed": H.url_is_malformed(url),
        "ts_checks": (F.coalesce(ts > F.lit(C.AS_OF_TS).cast("timestamp"),
                                 F.lit(False)).cast("int")
                      + ts.isNull().cast("int")),
        "lower_only": F.length(text_lower),
        "sha2_text": F.sha2(F.coalesce(text, F.lit("")), 256),
    }

    out = {}
    for name, expr in cases.items():
        samples = []
        for _ in range(3):
            t0 = time.time()
            (pages.select(expr.cast("string").alias("x"))
             .write.format("noop").mode("overwrite").save())
            samples.append(round(time.time() - t0, 3))
        out[name] = min(samples)
        print(f"{name:32s} {out[name]:7.3f}  {samples}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
