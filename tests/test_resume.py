"""Resumability (north_rule): kill after partial commit, rerun, final table
identical to a single-shot run (SURVEY.md §5 test plan item 5)."""

import pytest

from qualityspark.io import SnapshotWriter, run_resumable


def _table_key(rows):
    return sorted((r["url"] or "", str(r["warc_ts"]), float(r["score"]),
                   bool(r["keep"]), r["scrubbed_text"] or "")
                  for r in rows)


def test_crash_and_resume_identical(spark, pages_small, tmp_path):
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")

    run_resumable(spark, pages_small, single, chunks=8)

    # crash after 3 of 8 chunk commits
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_resumable(spark, pages_small, resumed, chunks=8, fail_after=3)
    w = SnapshotWriter(resumed, 8)
    assert len(w.committed()) == 3
    assert not w.is_complete()

    # resume: only the 5 missing chunks are written
    info = run_resumable(spark, pages_small, resumed, chunks=8)
    assert info["committed"] == 8

    a = spark.read.parquet(f"{single}/data").collect()
    b = spark.read.parquet(f"{resumed}/data").collect()
    assert _table_key(a) == _table_key(b)
    assert len(a) == pages_small.count()


def test_single_write_job(spark, pages_small, tmp_path):
    """The chunked write is ONE partitionBy job, not a per-chunk write
    loop: every part file across every chunk dir carries the SAME write
    UUID (part-NNNNN-<uuid>-...), which a sequential per-chunk writer
    cannot produce (each of its write jobs stamps its own UUID)."""
    import glob
    import re
    out = str(tmp_path / "out")
    run_resumable(spark, pages_small, out, chunks=8)
    w = SnapshotWriter(out, 8)
    assert len(w.committed()) == 8
    parts = glob.glob(f"{out}/data/chunk=*/part-*")
    assert parts
    uuids = {re.match(r"part-\d+-([0-9a-f-]{36})", p.split("/")[-1]).group(1)
             for p in parts}
    assert len(uuids) == 1, f"expected one write job, saw {len(uuids)}"


def test_rerun_is_noop(spark, pages_small, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(spark, pages_small, out, chunks=4)
    w = SnapshotWriter(out, 4)
    from qualityspark.pipeline import audit, RESULT_COLUMNS
    assert w.write(audit(pages_small).select(*RESULT_COLUMNS)) == 0


def test_per_partition_metrics_merge_to_global(spark, pages_small, tmp_path):
    """north_rule: per-partition lineage + metrics alongside the output.
    Per-chunk metric rows must merge exactly to the global metrics table
    (counts sum), and the partitioned lineage must cover every global
    lineage row."""
    from pyspark.sql import functions as F
    out = str(tmp_path / "out")
    run_resumable(spark, pages_small, out, chunks=4)

    g = spark.read.parquet(f"{out}/metrics").first()
    per = spark.read.parquet(f"{out}/metrics_by_partition")
    assert per.count() > 1  # genuinely partitioned
    sums = per.agg(F.sum("n_docs").alias("n_docs"),
                   F.sum("n_TEXT_NULL_LIKE").alias("nn"),
                   F.sum("n_TEXT_EXACT_DUPLICATE").alias("nd")).first()
    assert sums["n_docs"] == g["n_docs"]
    assert sums["nn"] == g["n_TEXT_NULL_LIKE"]
    assert sums["nd"] == g["n_TEXT_EXACT_DUPLICATE"]

    lin = spark.read.parquet(f"{out}/lineage")
    assert "_chunk" in lin.columns
    n_rules_global = (spark.read.parquet(f"{out}/data")
                      .agg(F.sum(F.size("rules_fired"))).first()[0])
    assert lin.count() == n_rules_global
