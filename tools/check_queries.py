"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir; compare row count,
sorted column names, and exact values (rows sorted, columns sorted by name).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import math
    import datetime as dt
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, Decimal := type(v)) and v.__class__.__name__ == "Decimal":
        return round(float(v), 9)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from qualityspark.session import get_spark
    from qualityspark.queries import QUERIES, ORACLES

    spark = get_spark(app="check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            # no tracked cache outlives its query (caching.py protocol)
            from qualityspark.caching import release_caches
            release_caches()
        if name not in ORACLES:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
            continue
        try:
            res = con.sql(ORACLES[name])
            d_cols = [c.lower() for c in res.columns]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sr = norm_rows([c.lower() for c in s_cols], s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first:")
            for a, b in bad[:3]:
                print(f"   spark={a}\n   duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    spark.stop()


if __name__ == "__main__":
    main()
