"""The correctness gate: the Spark pipeline must reproduce the pure-Python
oracle exactly — keep/drop decision (F1 target >= 0.99; we assert equality),
fired rules, score, grade, and byte-identical scrubbed text per url
(BASELINE.json metric + input_hint)."""

from qualityspark.pipeline import audit


def test_full_parity(spark, pages_small, oracle_small):
    rows, orc = oracle_small
    res = audit(pages_small).select(
        "url", "warc_ts", "score", "grade", "keep", "rules_fired",
        "scrubbed_text").collect()
    assert len(res) == len(rows)

    by_key = {}
    for r in res:
        by_key.setdefault((r["url"], r["warc_ts"]), []).append(r)

    keep_tp = keep_fp = keep_fn = 0
    for row, o in zip(rows, orc):
        key = (row["url"], row["warc_ts"])
        cand = by_key[key]
        assert len(cand) == 1, f"ambiguous key {key}"
        r = cand[0]
        assert sorted(r["rules_fired"]) == sorted(o["rules"]), (
            key, sorted(r["rules_fired"]), sorted(o["rules"]))
        assert float(r["score"]) == o["score"], key
        assert r["grade"] == o["grade"], key
        assert bool(r["keep"]) == o["keep"], key
        # byte-identity of the scrub
        assert r["scrubbed_text"] == o["scrubbed_text"], key
        if o["keep"] and r["keep"]:
            keep_tp += 1
        elif r["keep"] and not o["keep"]:
            keep_fp += 1
        elif o["keep"] and not r["keep"]:
            keep_fn += 1

    f1 = 2 * keep_tp / (2 * keep_tp + keep_fp + keep_fn)
    assert f1 >= 0.99
    assert keep_fp == 0 and keep_fn == 0  # we hold ourselves to exact


def test_partitioning_invariance(spark):
    """Result is independent of input partitioning (synth is a pure
    function of the row index; dedup order is explicit)."""
    from qualityspark import synth
    a = audit(synth.pages_df(spark, 300, partitions=2)).select(
        "url", "warc_ts", "score", "keep").collect()
    b = audit(synth.pages_df(spark, 300, partitions=7)).select(
        "url", "warc_ts", "score", "keep").collect()
    ka = sorted((r["url"] or "", str(r["warc_ts"]), r["score"], r["keep"])
                for r in a)
    kb = sorted((r["url"] or "", str(r["warc_ts"]), r["score"], r["keep"])
                for r in b)
    assert ka == kb
