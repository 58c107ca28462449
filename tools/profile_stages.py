"""Per-stage scaling profile for the flagship pipeline: times scan,
signal projection, Arrow model pass, dedup, and full audit separately at a
given core count, printing one JSON line.  Used to locate which stage caps
N->4N scaling efficiency (BASELINE.json north_rule >= 0.8).

Usage: python tools/profile_stages.py <cpus> [docs]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1])
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from pyspark.sql import functions as F
    from qualityspark.session import get_spark
    from qualityspark import synth
    from qualityspark.rules.heuristics import signal_columns
    from qualityspark.rules.udfs import with_model_columns
    from qualityspark.pipeline import audit

    spark = get_spark(app=f"profile{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))

    path = f"/tmp/qs_bench_pages_{docs}.parquet"
    if not os.path.exists(path):
        (synth.pages_df(spark, docs, partitions=64)
         .write.mode("overwrite").parquet(path))

    warm_path = "/tmp/qs_bench_pages_30000.parquet"
    if not os.path.exists(warm_path):
        (synth.pages_df(spark, 30_000, partitions=64)
         .write.mode("overwrite").parquet(warm_path))

    def force(df):
        cols = df.columns
        aggs = []
        if "scrubbed_text" in cols:
            aggs.append(F.sum(F.length("scrubbed_text")))
        if "keep" in cols:
            aggs.append(F.sum(F.col("keep").cast("long")))
        if not aggs:
            aggs = [F.count(F.lit(1))]
        df.agg(*aggs).collect()

    stages = {
        "scan": lambda df: df.agg(F.count(F.lit(1)),
                                  F.sum(F.length("text"))).collect(),
        "signal": lambda df: (signal_columns(df)
                              .agg(F.sum(F.col("sig_TEXT_NULL_LIKE")
                                         .cast("long")),
                                   F.sum("_n_words")).collect()),
        "signal_model": lambda df: force(
            with_model_columns(signal_columns(df))),
        "full_audit": lambda df: force(audit(df)),
    }

    # warm everything twice on the small corpus (JIT/codegen + python workers)
    warm = spark.read.parquet(warm_path)
    for fn in stages.values():
        fn(warm)
        fn(warm)

    pages = spark.read.parquet(path)
    out = {"cpus": cpus, "docs": docs}
    for name, fn in stages.items():
        samples = []
        for _ in range(2):
            t0 = time.time()
            fn(pages)
            samples.append(time.time() - t0)
        out[name] = round(min(samples), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
