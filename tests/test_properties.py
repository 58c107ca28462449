"""Property-based tests (hypothesis) over the pure-Python oracle layer —
the semantics the Spark expressions must mirror.  These pin structural
invariants that example-based parity tests can't sweep: arbitrary unicode,
adversarial whitespace, embedded PII-mask-shaped strings."""

import string

from hypothesis import given, settings, strategies as st

from qualityspark import constants as C
from qualityspark import textstats as T
from qualityspark.oracle import scrub_and_hits, scrub_text

# text strategy: mixes printable ascii, whitespace runs, digits, unicode
_texts = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from(" \t\n\r\x0b\f"),
        st.characters(min_codepoint=0xC0, max_codepoint=0x17F),
    ),
    max_size=400)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_scrub_idempotent(text):
    """scrub(scrub(x)) == scrub(x): PII mask tags contain no digits or
    '@' so no pattern re-matches them, and toxicity masks are asterisk
    runs that are not badword tokens — the module docstring's 'mask tags
    are never re-masked' claim, property-swept."""
    once = scrub_text(text)
    assert scrub_text(once) == once


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_scrub_preserves_null_and_whitespace_shape(text):
    """Scrubbing never changes line count (masks contain no newlines) and
    hits are reported iff the text changed or a detector fired."""
    out, hits = scrub_and_hits(text)
    assert out.count("\n") == text.count("\n")
    if out != text:
        assert hits


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tokenizer_invariants(text):
    toks = T.tokenize(text)
    assert T.word_count(text) == len(toks)
    assert all(t for t in toks)                     # no empty tokens
    assert sum(len(t) for t in toks) <= len(text)
    mwl = T.mean_word_len(text)
    assert mwl >= 0.0
    if toks:
        assert min(len(t) for t in toks) <= mwl <= max(len(t)
                                                       for t in toks)


@settings(max_examples=300, deadline=None)
@given(_texts, st.sampled_from(sorted(C.STOPWORDS)))
def test_ratio_signals_bounded(text, lang):
    assert 0.0 <= T.stopword_density(text, lang) <= 1.0
    assert 0.0 <= T.alpha_word_ratio(text) <= 1.0
    assert 0.0 <= T.caps_ratio(text) <= 1.0
    assert 0.0 <= T.repetition_3gram(text) <= 1.0
    assert 0.0 <= T.toxicity_density(text) <= 1.0
    assert 0 <= T.required_stopword_hits(text, lang) <= len(
        C.REQUIRED_STOPWORDS[lang])


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False))
def test_severity_ladder_monotone(v):
    """A larger value never yields a LESS severe verdict."""
    order = {s: i for i, s in enumerate(
        ("PASS", "LOW", "MEDIUM", "HIGH", "CRITICAL"))}
    a = C.severity_from_thresholds(v, C.THRESHOLDS_NULL)
    b = C.severity_from_thresholds(v + 0.01, C.THRESHOLDS_NULL)
    assert order[b] >= order[a]


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-50, max_value=150, allow_nan=False))
def test_grade_ladder_total(score):
    assert C.grade_from_score(score) in "ABCDF"


@settings(max_examples=200, deadline=None)
@given(_texts, st.sampled_from(("en", "es", "fr", "de", "pt", "it", "xx")))
def test_langmodel_invariants(text, lang):
    """Model outputs are bounded and deterministic: lang_prob in [0,1],
    perplexity > 0, und prediction for empty-ish text, repeat call
    identical (no hidden state)."""
    from qualityspark import langmodel as L
    pred, prob = L.predict_lang(text)
    assert 0.0 <= prob <= 1.0
    assert pred == "und" or pred in ("en", "es", "fr", "de", "pt", "it")
    ppl = L.perplexity(text, lang)
    assert ppl > 0.0
    assert (pred, prob) == L.predict_lang(text)
    assert ppl == L.perplexity(text, lang)
