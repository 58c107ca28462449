"""Deep profile of the flagship audit at one core count: runs full audit
once (after warm), then dumps per-stage metrics from the Spark UI REST API
(executorRunTime, executorCpuTime, jvmGcTime, python eval time via
executorDeserializeTime is not split out, shuffle bytes) so N-vs-4N
inefficiency can be attributed to specific stages.

Usage: python tools/profile_rest.py <cpus> [docs]
"""

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1])
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from pyspark.sql import functions as F
    from qualityspark.session import get_spark
    from qualityspark.pipeline import audit

    spark = get_spark(app=f"rest{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    ui = spark.sparkContext.uiWebUrl

    def run_once(path):
        df = audit(spark.read.parquet(path))
        df.agg(F.sum(F.length("scrubbed_text")),
               F.sum(F.col("keep").cast("long"))).collect()

    run_once("/tmp/qs_bench_pages_30000.parquet")
    run_once("/tmp/qs_bench_pages_30000.parquet")

    # mark the boundary: stages submitted after this are the timed run
    t_mark = time.time()
    t0 = time.time()
    run_once(f"/tmp/qs_bench_pages_{docs}.parquet")
    wall = time.time() - t0

    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)

    rows = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        # ISO "2026-08-16T18:00:00.000GMT"
        ts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
        if ts < t_mark - time.timezone - 1:
            continue
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "run_ms": s["executorRunTime"],
            "cpu_ms": round(s["executorCpuTime"] / 1e6),
            "gc_ms": s["jvmGcTime"],
            "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
            "in_mb": round(s["inputBytes"] / 1e6, 1),
        })
    rows.sort(key=lambda r: -r["run_ms"])
    out = {"cpus": cpus, "docs": docs, "wall": round(wall, 2),
           "total_run_s": round(sum(r["run_ms"] for r in rows) / 1000, 1),
           "total_cpu_s": round(sum(r["cpu_ms"] for r in rows) / 1000, 1),
           "total_gc_s": round(sum(r["gc_ms"] for r in rows) / 1000, 1)}
    print(json.dumps(out))
    for r in rows[:14]:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
