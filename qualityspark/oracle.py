"""Pure-Python oracle: the reference-derived label generator.

Applies exactly the rule definitions in ``constants`` + ``textstats`` +
``langmodel`` to a list of page dicts and returns, per document:
fired rules, score, grade, keep flag, scrubbed text.  The Spark pipeline
must reproduce these labels (keep/drop F1 >= 0.99 target in BASELINE.json —
by construction we test for exact equality) and the scrubbed text
byte-for-byte.

Dedup keep-first order: (warc_ts NULLS LAST, url NULLS LAST) — mirrors
pandas ``duplicated(keep='first')`` semantics from the reference
(checks/universal_checks.py:67, checks/id_checks.py:9-38) with an explicit
total order instead of file order.
"""

from __future__ import annotations

import datetime as dt
import re

from qualityspark import constants as C
from qualityspark import textstats as T
from qualityspark import langmodel as L

_AS_OF = dt.datetime.fromisoformat(C.AS_OF_TS)
_ANCIENT = dt.datetime.fromisoformat(C.ANCIENT_TS)


import re as _re

_HAS_DIGIT = _re.compile(r"\d")
# patterns that cannot match without a digit (all but none — every PII
# pattern here contains mandatory digits); EMAIL additionally needs '@'
_NEEDS_AT = {"EMAIL"}

# Toxicity-mask precheck (r7): TOXICITY_MASK_RE is an IGNORECASE bounded
# alternation that costs ~50 us/doc on clean prose; a substring test of
# the lowercased text skips it on the ~95% of docs containing no toxic
# word at all.  Skipping is exact: a masked-regex match requires every
# pattern letter to match an input char under re's per-char case
# equivalence, so the folded text must contain the word as a substring.
# The translate step maps the four Unicode chars whose re-IGNORECASE
# equivalence diverges from str.lower() (dotless i, long s, Kelvin sign,
# dotted I — CPython sre's ASCII-relevant extra cases) onto their ascii
# partners BEFORE lowering, so e.g. 'shİt' still prechecks True.
_TOX_FOLD = str.maketrans({"ı": "i", "ſ": "s",
                           "K": "k", "İ": "i"})


def _may_have_toxicity(text: str) -> bool:
    low = text.translate(_TOX_FOLD).lower() if not text.isascii() \
        else text.lower()
    return any(w in low for w in C.TOXICITY_WORDS)


def scrub_and_hits(text: str | None,
                   tox_hint: bool | None = None) -> tuple[str | None,
                                                          list[str]]:
    """PII scrub + hit list in ONE pass per pattern (subn), applied in
    PII_PATTERNS order.  The scrubbed string IS the byte-identity contract.
    Cheap prechecks (every pattern requires a digit; EMAIL requires '@')
    skip regex work on clean prose without changing results.

    ``tox_hint`` may pass in ``any lowered token of text is in
    TOXICITY_SET`` precomputed (the Arrow pass knows it from
    signal_stats).  For ASCII text untouched by PII masking the hint is
    EXACT: the mask pattern is anchored token-start to token-end over the
    same ASCII-WS class tokenize splits on, every word is plain lowercase
    ASCII, and sre IGNORECASE on ASCII equals str.lower equality — so
    mask fires iff some token lowers into the set.  Non-ASCII text (sre's
    ı/ſ/K/İ fold divergences) and PII-modified text fall back to the
    substring precheck, so results never change."""
    if text is None:
        return None, []
    hits: list[str] = []
    out = text
    has_digit = _HAS_DIGIT.search(text) is not None
    has_at = "@" in text
    if has_digit or has_at:
        for name, rx, _sev in C.PII_COMPILED:
            if name in _NEEDS_AT:
                if not has_at:
                    continue
            elif not has_digit:
                continue
            out, n = rx.subn(C.PII_MASK_FMT.format(name), out)
            if n:
                hits.append(name)
    # toxicity masking (north_rule "PII/toxicity scrubbing"): same-length
    # asterisk runs preserve offsets; token-delimited, matching exactly the
    # tokens the TOXICITY_HIGH density rule counts.  Runs AFTER the PII
    # passes so PII mask tags are never partially re-masked.
    if hits or tox_hint is None or not text.isascii():
        tox = _may_have_toxicity(out)
    else:
        tox = tox_hint
    if tox:
        out, n = C.TOXICITY_MASK_RE.subn(lambda m: "*" * len(m.group(0)),
                                         out)
        if n:
            hits.append("TOXICITY")
    return out, hits


def scrub_text(text: str | None) -> str | None:
    return scrub_and_hits(text)[0]


def pii_hits(text: str | None) -> dict[str, bool]:
    _, hits = scrub_and_hits(text)
    return {name: name in hits for name, _, _ in C.PII_COMPILED}


import hashlib as _hashlib


def _dedup_order_key(row: dict):
    # (warc_ts, url, text_sha[, ingest_id]) NULLS LAST — the same total
    # order rules/dedup.py windows by; the ingest_id tiebreaker makes
    # fully-tied recrawl copies keep exactly one on both engines
    ts, url, ing = (row.get("warc_ts"), row.get("url"),
                    row.get("ingest_id"))
    text = row.get("text")
    sha = (None if text is None or T.is_null_like(text)
           else _hashlib.sha256(text.encode("utf-8")).hexdigest())
    # compare ingest_id in its NATIVE type (Spark orders the column
    # natively: 9 < 10 for numerics); stringify only mixed/unorderable
    # batches, which Spark would reject as a type error anyway
    ing_key = (_NativeOrStr(ing) if ing is not None else _NativeOrStr(""))
    return (ts is None, ts or _ANCIENT, url is None, url or "",
            sha is None, sha or "",
            ing is None, ing_key)


class _NativeOrStr:
    """Orders by the wrapped value's native comparison, falling back to a
    string comparison only when Python raises TypeError (mixed types)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        try:
            return self.v < other.v
        except TypeError:
            return str(self.v) < str(other.v)

    def __eq__(self, other):
        # native equality ONLY: mixed types (9 vs "9") compare UNEQUAL so
        # the tiebreak falls through to __lt__'s deterministic str order
        # instead of declaring a tie and keeping whichever row arrived
        # first (r5 ADVICE — input-order-dependent keep choice).  Builtin
        # == never raises across types; the try mirrors __lt__ for
        # exotic value classes that do.
        try:
            return self.v == other.v
        except TypeError:
            return str(self.v) == str(other.v)

    def __hash__(self):
        # defining __eq__ would otherwise set __hash__ = None; hash on
        # str keeps equal values hash-equal (collisions across types OK)
        return hash(str(self.v))


def audit_rows(rows: list[dict], cfg=None) -> list[dict]:
    """Returns one result dict per input row (same order):
    {url, rules: [rule_id...], score, grade, keep, scrubbed_text,
     lang_pred, lang_prob, perplexity}.

    ``cfg`` (qualityspark.config.RunConfig) applies the same threshold /
    disabled-rule / severity-override / scoring reconfiguration as the
    Spark pipeline, so configured runs stay parity-testable.  Configs
    carrying business rules are REJECTED here: their assertions are Spark
    SQL expressions this pure-Python oracle cannot evaluate, and silently
    skipping them would fake a parity check."""
    from qualityspark.config import resolve
    cfg = resolve(cfg)
    if cfg.business_rules:
        raise ValueError("oracle cannot evaluate Spark SQL business rules; "
                         "audit with a config without business_rules for "
                         "parity checks")
    severity = dict(cfg.doc_rules())   # enabled rules -> effective severity
    # ---- global passes: exact-text dedup + url dedup (keep-first) ----
    order = sorted(range(len(rows)), key=lambda i: _dedup_order_key(rows[i]))
    seen_text: set[str] = set()
    seen_url: set[str] = set()
    text_dup = [False] * len(rows)
    url_dup = [False] * len(rows)
    for i in order:
        t = rows[i].get("text")
        if t is not None and not T.is_null_like(t):
            if t in seen_text:
                text_dup[i] = True
            else:
                seen_text.add(t)
        u = rows[i].get("url")
        if u is not None and not T.is_null_like(u):
            if u in seen_url:
                url_dup[i] = True
            else:
                seen_url.add(u)

    results = []
    for i, row in enumerate(rows):
        text, url, ts, lang = (row.get("text"), row.get("url"),
                               row.get("warc_ts"), row.get("lang"))
        html = row.get("html")
        fired: list[str] = []

        def fire(rule: str, cond: bool):
            if cond and rule in severity:   # disabled rules never fire
                fired.append(rule)

        text_null = T.is_null_like(text)
        fire("TEXT_NULL_LIKE", text_null)
        url_null = url is None or T.is_null_like(url)
        fire("URL_NULL", url_null)
        fire("URL_MALFORMED", T.url_is_malformed(url))
        fire("TEXT_EXACT_DUPLICATE", text_dup[i])
        fire("URL_DUPLICATE", url_dup[i])
        fire("ENCODING_ANOMALY", T.has_control_chars(text))
        fire("HTML_BINARY_JUNK",
             T.nul_fraction(html) > cfg.param("MAX_NUL_FRACTION"))
        fire("TS_FUTURE", ts is not None and ts > _AS_OF)
        fire("TS_ANCIENT", ts is not None and ts < _ANCIENT)
        fire("TS_NULL", ts is None)

        wc = T.word_count(text)
        lang_pred, lang_prob = L.predict_lang(text)
        ppl = L.perplexity(text, lang)
        if not text_null:
            fire("WORDS_TOO_FEW", wc < cfg.param("MIN_WORDS"))
            fire("WORDS_TOO_MANY", wc > cfg.param("MAX_WORDS"))
            mwl = T.mean_word_len(text)
            fire("MEAN_WORD_LEN_OOB",
                 mwl < cfg.param("MIN_MEAN_WORD_LEN")
                 or mwl > cfg.param("MAX_MEAN_WORD_LEN"))
            fire("SYMBOL_WORD_RATIO_HIGH",
                 T.symbol_word_ratio(text)
                 > cfg.param("MAX_SYMBOL_WORD_RATIO"))
            fire("BULLET_LINES_HIGH",
                 T.bullet_line_ratio(text)
                 > cfg.param("MAX_BULLET_LINE_RATIO"))
            fire("ELLIPSIS_LINES_HIGH",
                 T.ellipsis_line_ratio(text)
                 > cfg.param("MAX_ELLIPSIS_LINE_RATIO"))
            fire("ALPHA_RATIO_LOW",
                 T.alpha_word_ratio(text)
                 < cfg.param("MIN_ALPHA_WORD_RATIO"))
            fire("REQUIRED_STOPWORDS_MISSING",
                 T.required_stopword_hits(text, lang)
                 < cfg.param("MIN_REQUIRED_STOPWORDS"))
            fire("STOPWORD_DENSITY_LOW",
                 T.stopword_density(text, lang)
                 < cfg.param("MIN_STOPWORD_DENSITY"))
            fire("REPETITION_HIGH",
                 T.repetition_3gram(text)
                 > cfg.param("MAX_REPETITION_3GRAM"))
            fire("CAPS_RATIO_HIGH",
                 T.caps_ratio(text) > cfg.param("MAX_CAPS_RATIO"))
            fire("WHITESPACE_UNSTRIPPED", T.has_unstripped_whitespace(text))
            fire("TRUNCATION_SIGNS", T.has_truncation_signs(text))
            fire("LANG_NOT_ALLOWED", lang not in C.ALLOWED_LANGS)
            fire("LANG_MISMATCH",
                 lang in C.ALLOWED_LANGS and lang_pred != "und"
                 and lang_pred != lang
                 and lang_prob >= cfg.param("MIN_LANG_PROB"))
            fire("PERPLEXITY_HIGH", ppl > cfg.param("MAX_PERPLEXITY"))
            fire("TOXICITY_HIGH",
                 T.toxicity_density(text)
                 > cfg.param("MAX_TOXICITY_DENSITY"))

        hits = pii_hits(text)
        for name, hit in hits.items():
            fire(f"PII_{name}", hit)

        score = 100.0
        for r in fired:
            score -= cfg.deduction(severity[r])
        score = max(0.0, score)
        has_critical = any(severity[r] == "CRITICAL" for r in fired)
        keep = (not has_critical) and score >= cfg.param("KEEP_SCORE_CUTOFF")

        results.append({
            "url": url,
            "rules": fired,
            "score": round(score, 1),
            "grade": C.grade_from_score(score),
            "keep": keep,
            "scrubbed_text": scrub_text(text),
            "lang_pred": lang_pred,
            "lang_prob": lang_prob,
            "perplexity": ppl,
        })
    return results
