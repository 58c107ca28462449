"""Unit tests for the pure-Python signal definitions (the oracle side).
Hand-computed expectations, mirroring the reference's per-check assertion
style (reference tests/test_universal_checks.py etc.)."""

import math

from qualityspark import constants as C
from qualityspark import textstats as T
from qualityspark import langmodel as L
from qualityspark.oracle import scrub_text


def test_tokenize_ascii_ws():
    assert T.tokenize("  a\tb\nc  ") == ["a", "b", "c"]
    assert T.tokenize(None) == []
    assert T.tokenize("") == []


def test_null_like():
    for v in ("", "null", " N/A ", "NaN", "-", "sin dato", None, "  \t"):
        assert T.is_null_like(v), v
    assert not T.is_null_like("hello")


def test_word_stats():
    assert T.word_count("one two three") == 3
    assert T.mean_word_len("ab abcd") == 3.0
    assert T.alpha_word_ratio("ab 12 cd") == 2 / 3


def test_symbol_ratio():
    # 2 hashes + 1 ellipsis over 4 words
    assert T.symbol_word_ratio("a # b # c... d") == 3 / 6  # '#' tokens count as words


def test_repetition():
    assert T.repetition_3gram("a b c a b c a b c") == 1.0 - 3 / 7
    assert T.repetition_3gram("a b") == 0.0


def test_caps_ratio():
    assert T.caps_ratio("ABc") == 2 / 3
    assert T.caps_ratio("123") == 0.0


def test_control_chars():
    assert T.has_control_chars("ab\x00cd")
    assert T.has_control_chars("ab�cd")
    assert not T.has_control_chars("plain text\n")  # \n excluded by the class


def test_whitespace_truncation():
    assert T.has_unstripped_whitespace(" x ")
    assert not T.has_unstripped_whitespace("   ")  # empty after strip
    assert T.has_truncation_signs("cut off...")
    assert T.has_truncation_signs("cut off… ")
    assert not T.has_truncation_signs("complete.")


def test_url_malformed():
    assert not T.url_is_malformed("https://a.example.org/x")
    assert not T.url_is_malformed("http://a.b")
    assert T.url_is_malformed("not a url")
    assert T.url_is_malformed("ftp://x.org")
    assert not T.url_is_malformed(None)        # URL_NULL fires instead
    assert not T.url_is_malformed("null")


def test_nul_fraction():
    assert T.nul_fraction(b"\x00" * 10 + b"ab") == 10 / 12
    assert T.nul_fraction(b"abcd") == 0.0
    assert T.nul_fraction(None) == 0.0


def test_stopwords():
    txt = "the cat and the dog went to the house of that man"
    assert T.required_stopword_hits(txt, "en") >= 2
    assert T.stopword_density(txt, "en") > 0.3
    assert T.required_stopword_hits("zzz qqq www", "en") == 0


def test_langid_on_seed_corpora():
    for lang, corpus in L.SEED_CORPORA.items():
        pred, prob = L.predict_lang(corpus[:300])
        assert pred == lang, (lang, pred)
        # es/pt are close; softmax confidence is lower there but still
        # above the MIN_LANG_PROB gate
        assert prob >= C.MIN_LANG_PROB


def test_perplexity_orders():
    clean = L.SEED_CORPORA["en"][:400]
    gibberish = "qzx jkw vbn " * 30
    assert L.perplexity(clean, "en") < L.perplexity(gibberish, "en")
    assert L.perplexity(clean, "en") < C.MAX_PERPLEXITY
    assert math.isinf(L.perplexity(None, "en"))


def test_scrub_byte_identity():
    cases = {
        "call 4111-1111-1111-1111 now":
            "call <PII:CREDIT_CARD> now",
        "ssn 123-45-6789 ok": "ssn <PII:SSN_US> ok",
        "mail bob.smith@example.com please":
            "mail <PII:EMAIL> please",
        "ip 192.168.10.25 end": "ip <PII:IP_ADDRESS> end",
        "iban DE44500105175407324931 x": "iban <PII:IBAN> x",
        "no pii here at all": "no pii here at all",
    }
    for src, want in cases.items():
        assert scrub_text(src) == want, src
    assert scrub_text(None) is None


def test_mask_value():
    assert C.mask_value("abcd") == "****"
    assert C.mask_value("1234567890") == "12******90"


def test_severity_ladder():
    assert C.severity_from_thresholds(0.6, C.THRESHOLDS_NULL) == "CRITICAL"
    assert C.severity_from_thresholds(0.21, C.THRESHOLDS_NULL) == "HIGH"
    assert C.severity_from_thresholds(0.06, C.THRESHOLDS_NULL) == "MEDIUM"
    assert C.severity_from_thresholds(0.015, C.THRESHOLDS_NULL) == "LOW"
    assert C.severity_from_thresholds(0.001, C.THRESHOLDS_NULL) == "PASS"


def test_grades():
    assert C.grade_from_score(95) == "A"
    assert C.grade_from_score(85) == "B"
    assert C.grade_from_score(70) == "C"
    assert C.grade_from_score(50) == "D"
    assert C.grade_from_score(10) == "F"


def test_toxicity_density_and_masking():
    """north_rule "PII/toxicity scrubbing": token-bounded density + the
    same-length asterisk mask in the scrub, punctuation-adjacent tokens
    excluded on both sides (token semantics, like stopwords)."""
    from qualityspark import textstats as T
    from qualityspark.oracle import scrub_and_hits

    txt = "well shit this looks FUCK bad but shit. stays and fuckface too"
    # tokens: shit + FUCK count; "shit." and "fuckface" do not
    assert T.toxicity_density(txt) == 2 / 12
    scrubbed, hits = scrub_and_hits(txt)
    assert "TOXICITY" in hits
    assert scrubbed == ("well **** this looks **** bad but shit. "
                        "stays and fuckface too")
    assert len(scrubbed) == len(txt)

    clean = "perfectly ordinary text with nothing wrong"
    s2, h2 = scrub_and_hits(clean)
    assert s2 == clean and h2 == []
    assert T.toxicity_density(None) == 0.0
