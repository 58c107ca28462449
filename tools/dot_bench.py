"""Embedding-dot microbench (r3 VERDICT item 1 'done' criterion): time the
full LSH ANN top-k at production dim (256) with (a) the interpreted
aggregate(zip_with) HOF dot in the classic bucket-join shape (the r3
implementation) vs (b) the shipped bucket-cogrouped numpy implementation
(rules/neardup.lsh_ann_topk), on the same synthetic corpus.

A THIRD shape was measured and rejected (see neardup.py block comment): a
per-PAIR pandas-UDF dot in the bucket-join shape, which ships both
vectors through Arrow per candidate — 1.8x SLOWER than the HOF at dim
256 (66.6 s vs 37.2 s at n=20k); per-pair vector duplication dominates.

Usage: python tools/dot_bench.py [n_vectors] [dim] [n_planes]
Prints one JSON line; results are appended to BENCH/BASELINE.md by hand.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F


def hof_dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q),
                       F.lit(0.0), lambda acc, p: acc + p)


def synth_embeddings(spark, n, dim, parts=32):
    """Deterministic pseudo-random embeddings, JVM-side (sin-hash mix)."""
    return (spark.range(0, n, 1, parts)
            .select(F.col("id").alias("vec_id"),
                    F.array(*[
                        F.sin(F.col("id") * (i + 1) * 0.7071 + i * 1.618)
                        for i in range(dim)]).alias("v")))


def run_lsh_topk(emb, planes, dot_fn, sig_col_fn, k=3):
    from qualityspark.rules.neardup import probe_buckets
    n_planes = len(planes)
    eb = (emb.withColumn("bucket", sig_col_fn(F.col("v"), planes))
          .withColumn("nrm", F.sqrt(dot_fn(F.col("v"), F.col("v")))))
    a = (eb.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                   F.col("nrm").alias("qn"),
                   F.explode(probe_buckets(F.col("bucket"), n_planes))
                   .alias("bucket")))
    j = a.join(eb, "bucket").filter(F.col("vec_id") != F.col("qid"))
    cos = dot_fn(F.col("qv"), F.col("v")) / F.nullif(
        F.col("qn") * F.col("nrm"), F.lit(0.0))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (j.select("qid", "vec_id", cos.alias("cos"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def hof_sig_col(v, planes):
    return F.concat_ws("", *[
        F.when(hof_dot(v, F.array(*[F.lit(x) for x in p])) >= 0, "1")
        .otherwise("0") for p in planes])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_planes = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from qualityspark.session import get_spark
    from qualityspark.rules.neardup import lsh_ann_topk, lsh_planes
    spark = get_spark(app="dot-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = (synth_embeddings(spark, n, dim)
           .select("vec_id", F.col("v").alias("embedding")).cache())
    emb.count()
    planes = lsh_planes(n_planes, dim, 42)

    def timed(mk):
        best = None
        for _ in range(2):   # min-of-2 (documented host-contention policy)
            t0 = time.time()
            cnt = mk().count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        return best, cnt

    cg_s, n_cg = timed(lambda: lsh_ann_topk(
        emb, n_planes=n_planes, dim=dim))
    hof_s, n_hof = timed(lambda: run_lsh_topk(
        emb.select("vec_id", F.col("embedding").alias("v")),
        planes, hof_dot, hof_sig_col))
    assert n_cg == n_hof, (n_cg, n_hof)

    print(json.dumps({
        "bench": "ann_lsh_topk_dim_sweep", "n": n, "dim": dim,
        "n_planes": n_planes, "rows_out": n_cg,
        "hof_dot_sec": round(hof_s, 2),
        "cogroup_numpy_sec": round(cg_s, 2),
        "speedup": round(hof_s / cg_s, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
