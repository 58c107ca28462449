"""Deterministic Common-Crawl-style page synthesizer.

Every row is a pure function of ``(i, n_rows, seed)`` — so the distributed
generator (``pages_df``: spark.range → mapInPandas) and the driver-side
oracle iterate the *same* rows regardless of partitioning.  Defect classes
follow FIXTURES.md F1: a hot domain (~30 % of rows) for the skew path, null /
duplicate / malformed urls, future/ancient/null timestamps, NUL-junk html,
and a catalogue of text defects matching the rule table in constants.DOC_RULES.

Rows 0..POOL-1 are always-clean "canonical" documents; duplicate-text and
duplicate-url defect rows copy from that pool, so keep-first dedup semantics
(first occurrence survives) are exercised deterministically.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

from qualityspark import constants as C
from qualityspark.langmodel import SEED_CORPORA

POOL = 50  # canonical clean rows

_BASE_TS = dt.datetime(2023, 1, 1, 0, 0, 0)
_FUTURE_TS = dt.datetime(2030, 6, 1, 0, 0, 0)
_ANCIENT_TS = dt.datetime(1890, 3, 1, 0, 0, 0)

_DOMAINS = [f"site{k:02d}.example.org" for k in range(49)]
HOT_DOMAIN = "hot.example.com"

_LANGS = ("en", "es", "fr", "de", "pt", "it")
# imbalanced: en >= 90 % (CLASS_IMBALANCE analog, FIXTURES.md F1)
_LANG_WEIGHTS = (90, 3, 2, 2, 2, 1)

_CORPUS_TOKENS = {lang: corpus.split() for lang, corpus in SEED_CORPORA.items()}

_PII_SAMPLES = [
    ("CREDIT_CARD", "4111-1111-1111-1111"),
    ("CREDIT_CARD", "5500 0000 0000 0004"),
    ("SSN_US", "123-45-6789"),
    ("CURP_MX", "GOMC860413HDFLRR02"),
    ("RFC_MX", "GOMC860413AB1"),
    ("EMAIL", "maria.lopez@example.com"),
    ("PHONE_INTL", "+52 55 1234 5678"),
    ("IP_ADDRESS", "192.168.10.25"),
    ("IBAN", "DE44500105175407324931"),
]

_NULL_LIKE_TOKENS = ["", "null", "N/A", "missing", "unknown", "-", "  ", "nan"]


def _pick_lang(rng: random.Random) -> str:
    return rng.choices(_LANGS, weights=_LANG_WEIGHTS, k=1)[0]


def _clean_text(rng: random.Random, lang: str, min_words: int = 60,
                max_words: int = 140) -> str:
    """Contiguous spans of the seed corpus: keeps char-trigram stats (low
    perplexity, correct langid) while varying content per row."""
    toks = _CORPUS_TOKENS[lang]
    target = rng.randint(min_words, max_words)
    out: list[str] = []
    while len(out) < target:
        span = rng.randint(12, 28)
        start = rng.randint(0, len(toks) - span - 1)
        out.extend(toks[start:start + span])
    return " ".join(out[:target])


def _canon_text(j: int, seed: int) -> str:
    rng = random.Random((seed << 20) ^ 0xC0FFEE ^ j)
    return _clean_text(rng, "en")


def _domain(rng: random.Random) -> str:
    # hot domain holds ~30 % of rows; the rest Zipf-ish over 49 domains
    if rng.random() < 0.30:
        return HOT_DOMAIN
    r = rng.paretovariate(1.2)
    return _DOMAINS[min(int(r) % 49, 48)]


_MAJOR_CLASSES = [
    # (class, weight)
    ("clean", 620),
    ("null_text", 30),
    ("short_text", 20),
    ("symbol_heavy", 20),
    ("repetitive", 20),
    ("mojibake", 20),
    ("caps", 15),
    ("wrong_lang", 30),
    ("bad_lang_code", 10),
    ("text_dup", 25),
    ("url_dup", 15),
    ("url_null", 15),
    ("url_malformed", 10),
    ("ts_future", 10),
    ("ts_ancient", 5),
    ("ts_null", 10),
    ("html_junk", 10),
    ("low_stopword", 15),
    ("toxic", 15),
]


def gen_page(i: int, n_rows: int, seed: int = 42) -> dict:
    rng = random.Random((seed << 32) ^ (i * 1_000_003))
    lang = _pick_lang(rng)
    ts = _BASE_TS + dt.timedelta(seconds=7 * i)
    url = f"https://{_domain(rng)}/p/{seed}/{i:09d}"

    if i < POOL:
        cls = "clean"
        lang = "en"
        text = _canon_text(i, seed)
    else:
        cls = rng.choices([c for c, _ in _MAJOR_CLASSES],
                          weights=[w for _, w in _MAJOR_CLASSES], k=1)[0]
        text = None

    if text is None:
        if cls == "null_text":
            text = rng.choice(_NULL_LIKE_TOKENS)
        elif cls == "short_text":
            text = _clean_text(rng, lang, 4, 20)
        elif cls == "symbol_heavy":
            base = _clean_text(rng, lang).split()
            for k in range(0, len(base), 4):
                base[k] = base[k] + " ###"
            text = " ".join(base)
        elif cls == "repetitive":
            phrase = _clean_text(rng, lang, 5, 7)
            text = " ".join([phrase] * 30)
        elif cls == "mojibake":
            t = _clean_text(rng, lang)
            text = t[:40] + "\x00\x1f�" + t[40:]
        elif cls == "caps":
            text = _clean_text(rng, lang).upper()
        elif cls == "wrong_lang":
            other = rng.choice([l for l in _LANGS if l != lang])
            text = _clean_text(rng, other)
        elif cls == "bad_lang_code":
            text = _clean_text(rng, "en")
            lang = rng.choice(["ru", "zz", "xx"])
        elif cls == "text_dup":
            text = _canon_text(rng.randint(0, POOL - 1), seed)
        elif cls == "toxic":
            # clean prose with profanity every ~8 tokens: density ~0.125,
            # far above MAX_TOXICITY_DENSITY — fires the rule and exercises
            # the masking scrub
            base = _clean_text(rng, lang).split()
            tox = ("shit", "fuck", "bullshit", "asshole", "piss")
            for k in range(0, len(base), 8):
                base[k] = rng.choice(tox)
            text = " ".join(base)
        elif cls == "low_stopword":
            # number/symbol soup: fails stopword + alpha-ratio rules
            text = " ".join(str(rng.randint(1000, 999999))
                            for _ in range(80))
        else:
            text = _clean_text(rng, lang)

    if cls == "url_dup":
        j = rng.randint(0, POOL - 1)
        # replay row j's RNG draws in generation order (_pick_lang consumes
        # the stream before _domain) so the reconstructed URL is exactly the
        # pool row's URL — a real collision, not an accidental one
        rng_j = random.Random((seed << 32) ^ (j * 1_000_003))
        _pick_lang(rng_j)
        url = f"https://{_domain(rng_j)}/p/{seed}/{j:09d}"
    elif cls == "url_null":
        url = None if rng.random() < 0.5 else rng.choice(["null", "N/A", ""])
    elif cls == "url_malformed":
        url = rng.choice(["not a url", "ftp://old.example.org/x",
                          "htp:/broken", "www.example.org/noproto"])
    elif cls == "ts_future":
        ts = _FUTURE_TS + dt.timedelta(seconds=i)
    elif cls == "ts_ancient":
        ts = _ANCIENT_TS + dt.timedelta(seconds=i)
    elif cls == "ts_null":
        ts = None

    # independent minor injections (can stack on clean docs)
    if cls not in ("null_text", "mojibake") and text:
        r = rng.random()
        if r < 0.04:
            pii = rng.sample(_PII_SAMPLES, rng.randint(1, 2))
            words = text.split()
            for _, val in pii:
                pos = rng.randint(0, len(words))
                words.insert(pos, f"contact {val} ref")
            text = " ".join(words)
        elif r < 0.07:
            text = "   " + text + "  \t"
        elif r < 0.09:
            text = text.rstrip(".") + "..."

    if cls == "html_junk":
        html = b"\x00" * 1200 + b"<junk>" + b"\x00" * 400
    elif text is None:
        html = b"<html><body></body></html>"
    else:
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"

    return {"url": url, "warc_ts": ts, "html": html, "text": text,
            "lang": lang, "_class": cls}


def page_rows(n_rows: int, seed: int = 42, with_class: bool = False):
    for i in range(n_rows):
        row = gen_page(i, n_rows, seed)
        if not with_class:
            row.pop("_class")
        yield row


PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def pages_df(spark, n_rows: int, seed: int = 42, partitions: int = 32):
    """Distributed generator: spark.range → mapInPandas, one pure-function
    row per index.  Output is independent of ``partitions``."""

    def gen(batches):
        for pdf in batches:
            rows = [gen_page(int(i), n_rows, seed) for i in pdf["id"]]
            for r in rows:
                r.pop("_class")
            yield pd.DataFrame(rows,
                               columns=["url", "warc_ts", "html", "text",
                                        "lang"])

    return (spark.range(0, n_rows, 1, partitions)
            .mapInPandas(gen, schema=PAGES_DDL))
