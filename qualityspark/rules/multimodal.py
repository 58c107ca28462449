"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this environment, so
the decode step is STUBBED (deterministic fake features, clearly marked);
the Spark-side plumbing — schema, Arrow batching, mapInPandas signature,
partition behaviour — is real and tested.  Swapping ``_decode_stub`` for a
PIL/torchaudio call is the only production change.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

MM_SCHEMA = ("id bigint, n_bytes bigint, nul_frac double, "
             "format_guess string, features array<float>")

_MAGIC = [(b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpeg"),
          (b"GIF8", "gif"), (b"RIFF", "riff"), (b"<htm", "html"),
          (b"<!do", "html"), (b"%PDF", "pdf")]


def _decode_stub(payload: bytes) -> list[float]:
    """STUB for the real decoder (PIL image decode / audio frame sample).

    Deterministic: features derived from a sha256 of the payload so tests
    are reproducible.  Raise NotImplementedError here if you want hard
    failure instead of fake features:
        raise NotImplementedError("install pillow/torchaudio and replace")
    """
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def _format_guess(payload: bytes) -> str:
    head = payload[:8].lower() if payload else b""
    for magic, name in _MAGIC:
        if payload.startswith(magic) or head.startswith(magic.lower()):
            return name
    return "unknown"


def extract_features(df: DataFrame, id_col: str = "id",
                     payload_col: str = "payload") -> DataFrame:
    """mapInPandas over (id, payload) -> typed metadata + feature vector.
    Arrow-batched; one Python crossing per row batch, models/decoders load
    once per executor worker (module import caching)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].tolist()
            payloads = pdf[payload_col].tolist()
            out = {"id": [], "n_bytes": [], "nul_frac": [],
                   "format_guess": [], "features": []}
            for i, p in zip(ids, payloads):
                p = p or b""
                out["id"].append(int(i))
                out["n_bytes"].append(len(p))
                head = p[:8192]
                out["nul_frac"].append(
                    head.count(0) / len(head) if head else 0.0)
                out["format_guess"].append(_format_guess(p))
                out["features"].append(_decode_stub(p))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(gen, schema=MM_SCHEMA)
