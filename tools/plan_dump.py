"""Dump .explain('formatted') for registry queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]
  tag     e.g. r07
  suffix  e.g. before / after
  query   names from the registry (default: the bench HEADLINE list)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "quality_filter_decisions", "exact_dup_stats", "token_stats_by_lang",
    "minhash_near_dups", "ann_bruteforce_topk", "pricing_summary",
    "events_hourly", "benford_totalprice", "chi2_independence",
    "ks_histogram_halves",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from qualityspark.session import get_spark
    from qualityspark.queries import QUERIES
    from qualityspark.caching import release_caches

    spark = get_spark(app="qualityspark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        release_caches()
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
