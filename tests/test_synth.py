"""Synthetic corpus determinism + fixture-shape guarantees (FIXTURES.md F1)."""

from collections import Counter

from qualityspark import synth


def test_pure_function_of_index():
    a = list(synth.page_rows(200))
    b = list(synth.page_rows(200))
    assert a == b


def test_spark_generation_matches_driver(spark, pages_small):
    driver = list(synth.page_rows(800))
    got = sorted(((r["url"], r["warc_ts"], r["text"])
                  for r in pages_small.collect()),
                 key=lambda x: (x[0] or "", str(x[1])))
    want = sorted(((r["url"], r["warc_ts"], r["text"]) for r in driver),
                  key=lambda x: (x[0] or "", str(x[1])))
    assert got == want


def test_hot_domain_skew():
    rows = list(synth.page_rows(2000))
    domains = Counter((r["url"] or "none").split("/")[2]
                      for r in rows if r["url"] and "://" in r["url"])
    hot = domains[synth.HOT_DOMAIN] / sum(domains.values())
    assert 0.25 < hot < 0.35  # ~30% hot domain (salting path exercised)


def test_defect_classes_present():
    rows = list(synth.page_rows(2000, with_class=True))
    classes = Counter(r["_class"] for r in rows)
    for cls in ("clean", "null_text", "text_dup", "url_dup", "url_null",
                "ts_future", "mojibake", "repetitive", "wrong_lang",
                "html_junk", "low_stopword"):
        assert classes[cls] > 0, cls
    assert classes["clean"] > 1000


def test_unique_timestamps():
    rows = list(synth.page_rows(2000))
    ts = [r["warc_ts"] for r in rows if r["warc_ts"] is not None]
    assert len(ts) == len(set(ts))  # dedup order is total
