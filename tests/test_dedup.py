"""Keep-first dedup semantics (pandas duplicated(keep='first') analog,
reference checks/universal_checks.py:67 / checks/id_checks.py:9-38) with the
explicit (warc_ts, url) total order."""

import datetime as dt

from qualityspark.rules.dedup import with_dedup_flags


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")


def test_text_dup_keep_first(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("https://a.example.org/1", t0, "same text body"),
        ("https://a.example.org/2", t0 + dt.timedelta(1), "same text body"),
        ("https://a.example.org/3", t0 + dt.timedelta(2), "same text body"),
        ("https://a.example.org/4", t0 + dt.timedelta(3), "unique body"),
    ]
    res = {r["url"]: r["sig_TEXT_EXACT_DUPLICATE"]
           for r in with_dedup_flags(_df(spark, rows)).collect()}
    assert res == {"https://a.example.org/1": False,
                   "https://a.example.org/2": True,
                   "https://a.example.org/3": True,
                   "https://a.example.org/4": False}


def test_null_like_text_never_dup(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("https://a.example.org/1", t0, "null"),
            ("https://a.example.org/2", t0 + dt.timedelta(1), "null"),
            ("https://a.example.org/3", t0 + dt.timedelta(2), None)]
    res = with_dedup_flags(_df(spark, rows)).collect()
    assert all(not r["sig_TEXT_EXACT_DUPLICATE"] for r in res)


def test_tied_rows_no_fanout(spark):
    """Rows fully tied on (key, warc_ts, url) must not multiply output rows
    through the flag join-back (3 identical rows + 1 unique -> 4 rows out);
    all tied copies carry the duplicate flag (documented tie semantics)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [("https://a.example.org/t", t0, "tied body")] * 3 + [
        ("https://a.example.org/u", t0 + dt.timedelta(1), "unique body")]
    out = with_dedup_flags(_df(spark, rows)).collect()
    assert len(out) == 4
    flags = sorted(r["sig_TEXT_EXACT_DUPLICATE"] for r in out)
    assert flags == [False, True, True, True]
    uflags = sorted(r["sig_URL_DUPLICATE"] for r in out)
    assert uflags == [False, True, True, True]


def test_url_dup_null_ts_last(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("https://a.example.org/1", None, "x1"),
            ("https://a.example.org/1", t0, "x2")]
    res = {r["text"]: r["sig_URL_DUPLICATE"]
           for r in with_dedup_flags(_df(spark, rows)).collect()}
    # the row WITH a timestamp is first (nulls last), so it survives
    assert res == {"x2": False, "x1": True}
