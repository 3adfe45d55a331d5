"""Embedding generation — the engine's one true UDF surface.

The reference embeds per-row with an async OpenAI call
(``text-embedding-3-large``, 3072-d, 8191-token truncation, retry with
exponential backoff — reference ``core/embedding.py:9-73``).  Spark-first
this becomes an Arrow-batched pandas UDF: one Python invocation per
batch of rows amortizes client setup exactly the way the reference's
event loop amortizes awaits, and executors scale it horizontally —
per-row serial embedding was the reference's ingest bottleneck
(SURVEY §3.3).

Two implementations:

- ``deterministic_embedder``: seeded hashing projection (token → seeded
  Gaussian vector, sum, L2-normalize).  Network-free and reproducible, so
  vector results are oracle-checkable (FIXTURES.md determinism rules).
- ``openai_embedder``: the production shape — lazy per-executor client,
  batched API calls, tenacity-style retry.  Gated behind import/env so
  the engine never needs network in tests; raises cleanly without a key
  (matching the reference's fail-fast, ``core/search.py:30-38``).
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64  # fixture dim; reference uses 3072 (core/embedding.py:9-11)
MAX_TOKENS = 8191  # reference truncation cap (core/embedding.py:10)

# reference retry policy: 5 attempts, 1 s initial, ×2 (core/embedding.py:12-14)
RETRIES = 5
BACKOFF_INITIAL_S = 1.0
BACKOFF_FACTOR = 2.0


def with_backoff(fn, retries: int = RETRIES, initial: float = BACKOFF_INITIAL_S,
                 factor: float = BACKOFF_FACTOR, sleep=None):
    """Call ``fn()`` with exponential-backoff retries (U3).  Re-raises the
    last error once attempts are exhausted; delays are 1, 2, 4, ... s."""
    import time

    sleep = sleep or time.sleep
    delay = initial
    for attempt in range(retries):
        try:
            return fn()
        except Exception:  # noqa: BLE001 — transient API errors by contract
            if attempt == retries - 1:
                raise
            sleep(delay)
            delay *= factor


def _token_vector(token: str, dim: int) -> np.ndarray:
    """Seeded Gaussian vector for one token (stable across processes —
    numpy RandomState seeded from a crypto hash of the token bytes)."""
    seed = int.from_bytes(hashlib.sha256(token.encode("utf-8")).digest()[:4], "big")
    return np.random.RandomState(seed).standard_normal(dim)


def embed_text_local(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Driver-side single-text embedding (query path)."""
    tokens = text.lower().split()[:MAX_TOKENS]
    if not tokens:
        return [0.0] * dim
    acc = np.zeros(dim)
    for t in tokens:
        acc += _token_vector(t, dim)
    norm = float(np.linalg.norm(acc))
    if norm > 0:
        acc = acc / norm
    return [float(x) for x in acc.astype(np.float32)]


def deterministic_embedder(dim: int = DEFAULT_DIM) -> Column:
    """Returns a pandas UDF column factory: ``col = det_embed(F.col("text"))``.

    Per Arrow batch: build a token→vector cache once, then sum+normalize
    each row — O(distinct tokens) RNG setups per batch, not per row.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def det_embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        cache: dict[str, np.ndarray] = {}

        def one(text: str) -> list[float]:
            if text is None:
                return None
            tokens = text.lower().split()[:MAX_TOKENS]
            if not tokens:
                return [0.0] * dim
            acc = np.zeros(dim)
            for t in tokens:
                v = cache.get(t)
                if v is None:
                    v = cache[t] = _token_vector(t, dim)
                acc += v
            norm = float(np.linalg.norm(acc))
            if norm > 0:
                acc = acc / norm
            return [float(x) for x in acc.astype(np.float32)]

        for s in batches:
            yield s.map(one)

    return det_embed


def openai_embedder(model: str = "text-embedding-3-large", batch_size: int = 100) -> Column:
    """Production embedder shape (reference core/embedding.py:44-73).

    The client is created lazily once per executor process inside the UDF
    closure; each Arrow batch becomes ≤``batch_size``-sized API calls.
    Raises at plan-build time without an API key — matching the
    reference's fail-fast client factory.
    """
    if not os.environ.get("OPENAI_API_KEY"):
        raise RuntimeError(
            "OPENAI_API_KEY not set — use deterministic_embedder() for "
            "offline/test runs (reference behavior: core/search.py:30-38)"
        )

    @F.pandas_udf(ArrayType(FloatType()))
    def api_embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import openai  # deferred: executor-side import

        client = openai.OpenAI()  # one client per executor process

        def embed_chunk(texts: list[str]) -> list[list[float]]:
            resp = with_backoff(
                lambda: client.embeddings.create(model=model, input=texts)
            )
            return [d.embedding for d in resp.data]

        for s in batches:
            out: list[list[float] | None] = []
            buf: list[str] = []
            idx: list[int] = []
            for i, t in enumerate(s):
                out.append(None)
                if t:
                    buf.append(t)
                    idx.append(i)
                if len(buf) >= batch_size:
                    for j, v in zip(idx, embed_chunk(buf)):
                        out[j] = v
                    buf, idx = [], []
            if buf:
                for j, v in zip(idx, embed_chunk(buf)):
                    out[j] = v
            yield pd.Series(out)

    return api_embed
