"""Benchmark driver: headline queries + the flagship pipeline.

Prints ONE JSON line:
  {"metric": "e2e headline suite wallclock", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ...,
   "pipeline_docs": N, "cpus": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR     input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS       local[N] cores (default 32)
  SPARK_GRAFT_BENCH_DOCS synthetic pages for the pipeline bench (default
                         300000 — steady-state size: at 50k docs over 32
                         cores the run is dominated by fixed costs and the
                         docs/sec headline under-reports the engine)

Scaling-efficiency evidence (N vs 4N cores) is produced by
tools/scaling_bench.py which runs this file at two parallelism levels and
writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "quality_filter_decisions",
    "exact_dup_stats",
    "token_stats_by_lang",
    "minhash_near_dups",
    "ann_bruteforce_topk",
    "pricing_summary",
    "events_hourly",
    "benford_totalprice",
    "chi2_independence",
    "ks_histogram_halves",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from qualityspark.session import get_spark
    from qualityspark import synth
    from qualityspark.pipeline import audit
    from qualityspark.queries import QUERIES

    spark = get_spark(app="qualityspark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # the bench corpus is small on disk; keep scan splits fine-grained so
    # the Arrow model pass parallelizes across all cores (at 100 TB the
    # default 128 MB splits already give full parallelism)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    spark.conf.set("spark.sql.files.minPartitionNum", str(cpus * 2))

    timings: dict[str, float] = {}

    # --- flagship pipeline over synthetic pages (docs/sec headline) ---
    pages_path = f"/tmp/qs_bench_pages_{n_docs}.parquet"
    if not os.path.exists(pages_path):
        (synth.pages_df(spark, n_docs, partitions=64)
         .write.mode("overwrite").parquet(pages_path))
    pages = spark.read.parquet(pages_path)
    from pyspark.sql import functions as F

    from qualityspark.caching import release_caches

    def run_once(df):
        res = audit(df)
        # force full materialization of every output column incl. scrub
        res.agg(F.sum(F.length("scrubbed_text")),
                F.sum(F.col("keep").cast("long")),
                F.sum("score"), F.count("rules_fired")).collect()
        # each audit() call registers a fresh narrow-projection cache;
        # without this the repeated timing passes accumulate storage
        release_caches()

    # JIT/codegen warmup ON A SMALL SAME-SCHEMA CORPUS: the signal stage
    # compiles to huge generated methods that run INTERPRETED (~20x slower,
    # measured 4,100 JVM-CPU-seconds vs 200 steady-state on 300k docs)
    # until C2 finishes.  The codegen + JIT caches key on the generated
    # source, which is identical for any input of the pages schema — so
    # 2 warm passes over 30k docs compile everything the timed 300k-doc
    # runs execute, at ~1/10 the warm-up cost.
    warm_docs = min(n_docs, 30_000)
    warm_path = f"/tmp/qs_bench_pages_warm_{warm_docs}.parquet"
    if not os.path.exists(warm_path):
        (synth.pages_df(spark, warm_docs, partitions=64)
         .write.mode("overwrite").parquet(warm_path))
    warm_pages = spark.read.parquet(warm_path)
    run_once(warm_pages)
    run_once(warm_pages)
    samples = []
    for _ in range(2):
        t0 = time.time()
        run_once(pages)
        samples.append(time.time() - t0)
    dt = min(samples)
    timings["pipeline_audit"] = round(dt, 3)
    docs_per_sec = round(n_docs / dt, 1)

    # --- headline registry queries at sf_dir ---
    # (skippable for scaling runs where only pipeline_audit matters:
    #  tools/scaling_bench.py sets SPARK_GRAFT_BENCH_QUERIES=0)
    if os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "1") != "0":
        for name in HEADLINE:
            fn = QUERIES[name]
            # min of 2 runs per query: the first also warms that query's
            # codegen/JIT, and the min rejects this host's 3-6x contention
            # spikes (same policy as the pipeline timing above and
            # tools/seq_scaling.py)
            per_q = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                per_q.append(time.time() - t0)
                # builders' tracked caches die with their query: timings
                # stay cache-honest AND storage doesn't accumulate
                release_caches()
            timings[name] = round(min(per_q), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "e2e headline suite wallclock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": docs_per_sec,
        "pipeline_docs": n_docs,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
