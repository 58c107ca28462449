"""Snapshot registry query outputs (sorted rows) to JSON for before/after
equivalence diffing during optimization work.

Usage: python tools/snap_queries.py <out.json> <sf_dir> [query ...]
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    out_path, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from qualityspark.session import get_spark
    from qualityspark.queries import QUERIES
    from qualityspark.caching import release_caches

    spark = get_spark(app="snap", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    snap = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        cols = df.columns
        rows = [[repr(x) for x in r] for r in df.collect()]
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        rows = sorted([tuple(r[i] for i in idx) for r in rows])
        snap[name] = {"cols": sorted(cols), "rows": rows}
        release_caches()
        print(name, len(rows), "rows", flush=True)
    with open(out_path, "w") as f:
        json.dump(snap, f, indent=0, default=str)
    spark.stop()


if __name__ == "__main__":
    main()
