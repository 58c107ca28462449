"""Pure-Python per-document signal functions.

These are the *definition* of every heuristic signal.  The Spark pipeline
re-expresses each one as a native Column expression (rules/heuristics.py);
``tests/test_parity.py`` asserts expression == this module for every synthetic
document, so any Java-vs-Python semantic drift (regex dialect, split
behaviour) is caught immediately.

Tokenization contract (must match Java regex semantics, where ``\\s`` is
ASCII-only): tokens are maximal runs of non-ASCII-whitespace characters;
ASCII whitespace = space, \\t, \\n, \\r, \\f, \\x0b.
"""

from __future__ import annotations

import math
import re

from qualityspark import constants as C

_WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")
_LWS_RE = re.compile(r"^[ \t\n\r\f\x0b]+")
_RWS_RE = re.compile(r"[ \t\n\r\f\x0b]+$")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_CONTROL_RE = re.compile(C.CONTROL_CHARS_RE)
_URL_FULL_RE = re.compile(C.URL_RE)


def strip_ws(text: str) -> str:
    """ASCII-whitespace strip (matches Java regex ``\\s`` semantics)."""
    return _RWS_RE.sub("", _LWS_RE.sub("", text))


def lstrip_ws(text: str) -> str:
    return _LWS_RE.sub("", text)


def rstrip_ws(text: str) -> str:
    return _RWS_RE.sub("", text)


def tokenize(text: str) -> list[str]:
    if text is None:
        return []
    return [t for t in _WS_RE.split(text) if t != ""]


def is_null_like(text: str | None) -> bool:
    if text is None:
        return True
    return strip_ws(text).lower() in C.NULL_LIKE


def word_count(text: str | None) -> int:
    return len(tokenize(text))


def mean_word_len(text: str | None) -> float:
    toks = tokenize(text)
    if not toks:
        return 0.0
    return sum(len(t) for t in toks) / len(toks)


def alpha_word_ratio(text: str | None) -> float:
    toks = tokenize(text)
    if not toks:
        return 0.0
    return sum(1 for t in toks if _ALPHA_RE.search(t)) / len(toks)


def symbol_word_ratio(text: str | None) -> float:
    """('#' count + ellipsis count) / word count (Gopher symbol-to-word)."""
    toks = tokenize(text)
    if not toks:
        return 0.0
    t = text or ""
    n_hash = t.count("#")
    n_ell = t.count("...") + t.count("…")
    return (n_hash + n_ell) / len(toks)


def lines(text: str | None) -> list[str]:
    if text is None or text == "":
        return []
    return text.split("\n")


def bullet_line_ratio(text: str | None) -> float:
    ls = lines(text)
    if not ls:
        return 0.0
    n = sum(1 for l in ls if lstrip_ws(l).startswith(("•", "-", "*")))
    return n / len(ls)


def ellipsis_line_ratio(text: str | None) -> float:
    ls = lines(text)
    if not ls:
        return 0.0
    n = sum(1 for l in ls if rstrip_ws(l).endswith(("...", "…")))
    return n / len(ls)


def stopword_density(text: str | None, lang: str | None) -> float:
    toks = [t.lower() for t in tokenize(text)]
    if not toks:
        return 0.0
    sw = set(C.STOPWORDS.get(lang or "en", C.STOPWORDS["en"]))
    return sum(1 for t in toks if t in sw) / len(toks)


def required_stopword_hits(text: str | None, lang: str | None) -> int:
    toks = {t.lower() for t in tokenize(text)}
    req = set(C.REQUIRED_STOPWORDS.get(lang or "en", C.REQUIRED_STOPWORDS["en"]))
    return len(toks & req)


def toxicity_density(text: str | None) -> float:
    """Toxic tokens / tokens (lowercased token membership in
    constants.TOXICITY_SET — same bounded-token semantics as
    stopword_density)."""
    toks = [t.lower() for t in tokenize(text)]
    if not toks:
        return 0.0
    return sum(1 for t in toks if t in C.TOXICITY_SET) / len(toks)


def repetition_3gram(text: str | None) -> float:
    """1 - distinct/total over word 3-grams; 0.0 when < 3 tokens."""
    toks = tokenize(text)
    if len(toks) < 3:
        return 0.0
    grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    return 1.0 - len(set(grams)) / len(grams)


def caps_ratio(text: str | None) -> float:
    if not text:
        return 0.0
    letters = _ALPHA_RE.findall(text)
    if not letters:
        return 0.0
    return sum(1 for ch in letters if ch.isupper()) / len(letters)


def has_control_chars(text: str | None) -> bool:
    if text is None:
        return False
    return bool(_CONTROL_RE.search(text))


def has_unstripped_whitespace(text: str | None) -> bool:
    if text is None:
        return False
    return text != strip_ws(text) and strip_ws(text) != ""


def has_truncation_signs(text: str | None) -> bool:
    if text is None:
        return False
    s = rstrip_ws(text)
    return s.endswith("...") or s.endswith("…")


def url_is_malformed(url: str | None) -> bool:
    if url is None or is_null_like(url):
        return False  # URL_NULL fires instead
    return _URL_FULL_RE.match(url) is None


def nul_fraction(html: bytes | None, scan: int = C.HTML_SCAN_BYTES) -> float:
    """NUL-byte fraction of first ``scan`` bytes
    (binary-file guard analog, reference core/data_loader.py:82-89)."""
    if not html:
        return 0.0
    head = html[:scan]
    return head.count(0) / len(head)


def perplexity_char_trigram(text: str | None, model: dict, vocab: int) -> float:
    """Char-trigram perplexity with add-one smoothing.

    ``model`` maps (c1+c2) -> {c3: count, ...; '' : context_total}.
    Deterministic, shared by oracle and the pandas UDF."""
    if text is None:
        return float("inf")
    s = " " + " ".join(tokenize(text.lower())) + " "
    if len(s) < 3:
        return float("inf")
    # deterministic cost cap: a 1000-char prefix pins the n-gram estimate
    # tightly enough for the gibberish cut at any document length
    s = s[:1002]
    log_sum = 0.0
    n = 0
    for i in range(len(s) - 2):
        ctx = s[i:i + 2]
        nxt = s[i + 2]
        counts = model.get(ctx)
        if counts is None:
            p = 1.0 / vocab
        else:
            total = counts[""]
            p = (counts.get(nxt, 0) + 1.0) / (total + vocab)
        log_sum += math.log(p)
        n += 1
    return math.exp(-log_sum / n)
