"""Chunked batch scoring must be bit-identical to single-pass scoring:
the cache-sizing chunk split (langmodel._CHUNK_KEYS) is a pure physical
optimization — per-document results may not depend on batch boundaries
(parity with the pure-python oracle depends on this invariance)."""

import random

from qualityspark import langmodel as L


def _corpus(n=400):
    rng = random.Random(7)
    words = ("the river rises and flows past the old mill before the sea "
             "el rio nace en las colinas antes de llegar al mar "
             "la riviere prend sa source dans les collines de l est").split()
    docs = []
    langs = []
    for i in range(n):
        k = rng.randint(0, 60)
        docs.append(" ".join(rng.choice(words) for _ in range(k)) or None)
        langs.append(rng.choice(["en", "es", "fr", "xx", None]))
    docs[0] = None
    docs[1] = ""
    return docs, langs


def test_langid_chunk_invariant(monkeypatch):
    docs, _ = _corpus()
    monkeypatch.setattr(L, "_CHUNK_KEYS", 10 ** 9)
    one_p, one_q = L.predict_lang_batch(docs)
    # force many tiny chunks (step = max(256, keys//cap) -> 256 docs)
    monkeypatch.setattr(L, "_CHUNK_KEYS", 1)
    many_p, many_q = L.predict_lang_batch(docs)
    assert one_p == many_p
    assert one_q == many_q  # exact float equality, not approx


def test_perplexity_chunk_invariant(monkeypatch):
    docs, langs = _corpus()
    monkeypatch.setattr(L, "_CHUNK_KEYS", 10 ** 9)
    one = L.perplexity_batch(docs, langs)
    monkeypatch.setattr(L, "_CHUNK_KEYS", 1)
    many = L.perplexity_batch(docs, langs)
    assert one == many
