"""Isolate which pipeline half limits N->4N scaling: runs (a) the JVM-only
signal+dedup+score path with the Python model stage replaced by literals,
and (b) a UDF-only pass (model UDF + count), each at two core counts in
sequential subprocesses.  Usage: python tools/isolate_scaling.py [docs]
"""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = '''
import sys, time, json
sys.path.insert(0, "{repo}")
from qualityspark.session import get_spark
from pyspark.sql import functions as F
from qualityspark.rules.heuristics import signal_columns
from qualityspark.rules.dedup import with_dedup_flags, text_sha_expr
from qualityspark.rules.udfs import model_pass, nul_fraction_expr, with_model_columns
from qualityspark.scoring import with_scores
from qualityspark import constants as C
cpus = int(sys.argv[1]); docs = int(sys.argv[2]); mode = sys.argv[3]
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app=f"iso{{cpus}}{{mode}}")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4*1024*1024))

def jvm_only(df):
    df = signal_columns(df)
    # literal stand-ins for every model-derived column: same downstream
    # expression shapes, zero python
    cols = {{"lang_pred": F.lit("en"), "lang_prob": F.lit(0.9),
            "perplexity": F.lit(100.0),
            "scrubbed_text": F.col("text"),
            "sig_HTML_BINARY_JUNK": nul_fraction_expr() > C.MAX_NUL_FRACTION,
            "sig_LANG_MISMATCH": F.lit(False),
            "sig_PERPLEXITY_HIGH": F.lit(False)}}
    for name, _rx, _sev in C.PII_PATTERNS:
        cols[f"sig_PII_{{name}}"] = F.lit(False)
    df = df.withColumns(cols)
    df = df.withColumn("text_sha", text_sha_expr())
    narrow = None
    df = df.drop("html", "text")
    df = with_dedup_flags(df)
    return with_scores(df)

def udf_only(df):
    return df.withColumn("_m", model_pass()(F.col("text"), F.col("lang")))

def force(df):
    aggs = [F.count(F.lit(1))]
    if "scrubbed_text" in df.columns:
        aggs.append(F.sum(F.length("scrubbed_text")))
    if "_m" in df.columns:
        aggs.append(F.sum(F.length(F.col("_m.lang_pred"))))
        aggs.append(F.sum("_m.perplexity"))
    df.agg(*aggs).collect()

fn = jvm_only if mode == "jvm" else udf_only
force(fn(spark.read.parquet("/tmp/qs_bench_pages_30000.parquet")))
force(fn(spark.read.parquet("/tmp/qs_bench_pages_30000.parquet")))
P = f"/tmp/qs_bench_pages_{{docs}}.parquet"
ts = []
for _ in range(3):
    t0 = time.time(); force(fn(spark.read.parquet(P)))
    ts.append(round(time.time() - t0, 2))
print(json.dumps(ts), flush=True)
spark.stop()
'''


def main():
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    for mode in ("jvm", "udf"):
        for cpus in (4, 16):
            out = subprocess.run(
                [sys.executable, "-c", WORKER.format(repo=REPO),
                 str(cpus), str(docs), mode],
                capture_output=True, text=True)
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr[-500:]
            print(mode, cpus, line, flush=True)


if __name__ == "__main__":
    main()
