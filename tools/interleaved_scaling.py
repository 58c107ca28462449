"""Interleaved N-vs-4N scaling measurement, robust to host-level CPU
contention (firecracker guests can't see steal): two persistent Spark
sessions (local[8], local[32]) alternate single pipeline runs on the same
input; per-level minimum over R rounds picks each level's quietest window.

Usage: python tools/interleaved_scaling.py [docs] [rounds]
Writes BENCH/BASELINE.md via tools/scaling_bench.write_md-compatible shape.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = '''
import sys, time, json
sys.path.insert(0, "{repo}")
from qualityspark.session import get_spark
from pyspark.sql import functions as F
cpus = int(sys.argv[1]); docs = int(sys.argv[2])
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app=f"scale{{cpus}}")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4*1024*1024))
from qualityspark.pipeline import audit
P = f"/tmp/qs_bench_pages_{{docs}}.parquet"
def run_once():
    audit(spark.read.parquet(P)).agg(
        F.sum(F.length("scrubbed_text")),
        F.sum(F.col("keep").cast("long"))).collect()
run_once()  # warm JIT/codegen
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() == "QUIT":
        break
    t0 = time.time(); run_once()
    print(json.dumps({{"t": time.time() - t0}}), flush=True)
spark.stop()
'''


def ensure_corpus(docs: int):
    p = f"/tmp/qs_bench_pages_{docs}.parquet"
    if not os.path.exists(p):
        code = (f'import sys; sys.path.insert(0, "{REPO}")\n'
                'from qualityspark.session import get_spark\n'
                'from qualityspark import synth\n'
                'spark = get_spark(master="local[32]")\n'
                f'synth.pages_df(spark, {docs}, partitions=64)'
                f'.write.mode("overwrite").parquet("{p}")\n'
                'spark.stop()')
        subprocess.run([sys.executable, "-c", code], check=True)


def main():
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ensure_corpus(docs)
    workers = {}
    for cpus in (8, 32):  # staggered startup: warmups must not contend
        proc = subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO),
             str(cpus), str(docs)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            stderr=subprocess.DEVNULL)
        workers[cpus] = proc
        while True:
            line = proc.stdout.readline()
            if "READY" in line:
                break
    results = {8: [], 32: []}
    for r in range(rounds):
        for cpus in (8, 32):
            proc = workers[cpus]
            proc.stdin.write("RUN\n")
            proc.stdin.flush()
            line = proc.stdout.readline()
            results[cpus].append(json.loads(line)["t"])
        print(f"round {r}: t8={results[8][-1]:.1f} "
              f"t32={results[32][-1]:.1f}", flush=True)
    for proc in workers.values():
        proc.stdin.write("QUIT\n")
        proc.stdin.flush()
    t8, t32 = min(results[8]), min(results[32])
    out = {"t8": round(t8, 2), "t32": round(t32, 2),
           "efficiency": round(t8 / t32 / 4, 3), "docs": docs,
           "samples_t8": [round(x, 1) for x in results[8]],
           "samples_t32": [round(x, 1) for x in results[32]]}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
