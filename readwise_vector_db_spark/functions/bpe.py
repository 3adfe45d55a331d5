"""Byte-level BPE tokenization with cl100k_base-parity mechanics.

The reference counts and truncates embedding input with tiktoken's
``cl100k_base`` (reference ``core/embedding.py:17-31``; cap 8191
tokens), so its chunking/packing budgets are BPE budgets, not
whitespace budgets.  Neither tiktoken nor its ~1.7 MB rank artifact is
available offline here, so this module implements the SAME public
algorithm — byte-level BPE, greedy lowest-rank merges, applied per
pre-token under the published ``cl100k_base`` split regex — behind a
pluggable rank table:

- ``load_tiktoken_ranks(path)`` parses the public ``.tiktoken`` file
  format (one ``base64(token) rank`` pair per line).  Point
  ``$RWVDB_BPE_RANKS`` (or the ``ranks_path`` argument) at the real
  ``cl100k_base.tiktoken`` artifact and every count/truncation below is
  bit-for-bit tiktoken parity — the rank table is the ONLY missing
  piece, the mechanics are identical.
- Without the artifact, a PINNED vocabulary is trained once per process
  by a fully deterministic BPE trainer (greedy most-frequent pair,
  lexicographic tie-break) over the fixed multilingual corpus embedded
  below.  tests/test_bpe.py pins exact token counts against recorded
  fixtures, so any drift in trainer/encoder behavior fails loudly.

Distributed use is Arrow-batched (`pandas_udf`) — pure-Python BPE is
the textbook slow path, so the codegen regex proxy in functions/text.py
remains the default for oracle-checked analytics queries; this module
is for paths where the BUDGET must be a real BPE budget (embedding
input caps, sequence packing against a trained model's tokenizer).
"""

from __future__ import annotations

import base64
import functools
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Degraded stdlib fallback: no \p classes / possessive quantifiers.
# MUST be compiled with re.ASCII so \w and \d are ASCII-only — without
# it Python's Unicode-aware \w keeps non-ASCII letters out of the
# [^\s\w] symbol branch AND out of [A-Za-z]+, silently dropping them
# from the pre-token stream (decode(encode(x)) != x).  Under re.ASCII
# non-ASCII letters match the symbol branch: counts differ from real
# cl100k but no bytes are lost (tests/test_bpe.py proves round-trip).
FALLBACK_SPLIT_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\w]?[A-Za-z]+|\d{1,3}"""
    r"""| ?[^\s\w]+[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)

try:  # the third-party ``regex`` module supports \p{L} and possessive
    import regex as _re

    # The published cl100k_base pre-tokenization pattern (public in
    # tiktoken's source, tiktoken_ext/openai_public.py).
    CL100K_SPLIT_PATTERN = (
        r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}"""
        r"""| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
    )
    _SPLIT = _re.compile(CL100K_SPLIT_PATTERN)
except ImportError:  # pragma: no cover - regex is present in this env
    import re as _re

    CL100K_SPLIT_PATTERN = FALLBACK_SPLIT_PATTERN
    _SPLIT = _re.compile(CL100K_SPLIT_PATTERN, _re.ASCII)


def pretokenize(text: str) -> list[str]:
    """Split ``text`` into BPE pre-tokens under the cl100k regex.  BPE
    merges never cross pre-token boundaries — this is what makes
    encoding embarrassingly parallel at 100 TB (no cross-row, not even
    cross-word, state)."""
    return _SPLIT.findall(text)


# --- rank tables ------------------------------------------------------------

RANKS_ENV = "RWVDB_BPE_RANKS"

# Fixed multilingual training corpus for the pinned fallback vocabulary.
# Deliberately covers: English function words (the reference corpus is
# English), German/Spanish/French diacritics, numbers, punctuation runs,
# contractions, CJK + emoji (multi-byte UTF-8 so merges learn byte
# pairs beyond ASCII).  DO NOT EDIT casually: recorded token counts in
# tests/test_bpe.py pin the trained table's behavior.
_PINNED_CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "the project of a distributed engine is the sum of the parts "
    "and the whole of the parts is more than the sum. "
    "it's a truth universally acknowledged, that a single reader "
    "in possession of a good library, must be in want of a search engine. "
    "wir müssen wissen, wir werden wissen — über allen gipfeln ist ruh. "
    "el ingenioso hidalgo don quijote de la mancha, de cuyo nombre no "
    "quiero acordarme, no ha mucho tiempo que vivía un hidalgo. "
    "longtemps, je me suis couché de bonne heure; c'est une affaire classée. "
    "0123456789 3.14159 2.71828 1,000,000 #!/usr/bin/env python3 "
    "def tokenize(text): return [t for t in split(text) if t] "
    "学而时习之不亦说乎 有朋自远方来不亦乐乎 日本語のテキスト "
    "🙂🙂 emoji bytes and ümlaut straße façade niño œuvre "
    "a an and are as at be by for from has he in is it its of on that "
    "to was were will with you your they them this these those there "
)

PINNED_VOCAB_SIZE = 512  # 256 byte tokens + 256 learned merges


def train_bpe(corpus: str, vocab_size: int) -> dict[bytes, int]:
    """Deterministic byte-level BPE trainer.

    Greedy: repeatedly merge the most frequent adjacent token pair
    across all pre-token byte sequences; ties break on the
    lexicographically smallest (left, right) byte pair, so the result
    is a pure function of (corpus, vocab_size).  O(vocab · corpus) —
    a training utility for pinned/test vocabularies, not a corpus-scale
    trainer (at scale you'd train with a distributed pair-count
    aggregation; encoding, the hot path, is unchanged either way).
    """
    ranks: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    # work on the pre-token multiset: identical pre-tokens share work
    freq: dict[tuple[bytes, ...], int] = {}
    for pt in pretokenize(corpus):
        key = tuple(bytes([b]) for b in pt.encode("utf-8"))
        if len(key) > 0:
            freq[key] = freq.get(key, 0) + 1
    while len(ranks) < vocab_size:
        counts: dict[tuple[bytes, bytes], int] = {}
        for parts, n in freq.items():
            for i in range(len(parts) - 1):
                pair = (parts[i], parts[i + 1])
                counts[pair] = counts.get(pair, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merged = best[0] + best[1]
        if merged in ranks:  # a pre-token equal to an existing token
            freq = _apply_merge(freq, best)
            continue
        ranks[merged] = len(ranks)
        freq = _apply_merge(freq, best)
    return ranks


def _apply_merge(
    freq: dict[tuple[bytes, ...], int], pair: tuple[bytes, bytes]
) -> dict[tuple[bytes, ...], int]:
    out: dict[tuple[bytes, ...], int] = {}
    a, b = pair
    for parts, n in freq.items():
        i, acc = 0, []
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                acc.append(a + b)
                i += 2
            else:
                acc.append(parts[i])
                i += 1
        key = tuple(acc)
        out[key] = out.get(key, 0) + n
    return out


def load_tiktoken_ranks(path: str) -> dict[bytes, int]:
    """Parse the public ``.tiktoken`` rank-file format: one
    ``base64(token_bytes)<space>rank`` per line."""
    ranks: dict[bytes, int] = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            tok_b64, rank = line.split()
            ranks[base64.b64decode(tok_b64)] = int(rank)
    return ranks


@functools.lru_cache(maxsize=2)
def default_ranks() -> dict[bytes, int]:
    """The active rank table: the real artifact if ``$RWVDB_BPE_RANKS``
    points at one, else the pinned deterministic vocabulary."""
    path = os.environ.get(RANKS_ENV)
    if path and os.path.exists(path):
        return load_tiktoken_ranks(path)
    return train_bpe(_PINNED_CORPUS, PINNED_VOCAB_SIZE)


# --- encoder ----------------------------------------------------------------


def _merge_piece(piece: bytes, ranks: dict[bytes, int]) -> list[bytes]:
    """Greedy BPE over one pre-token: repeatedly merge the adjacent pair
    with the LOWEST rank (the order merges were learned — the public
    tiktoken/GPT-2 rule), leftmost first among equals."""
    parts = [piece[i : i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best_rank, best_i = None, None
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def encode(text: str, ranks: dict[bytes, int] | None = None) -> list[int]:
    """Token ids for ``text`` (ordinary text; no special tokens — the
    embedding path never uses them)."""
    ranks = ranks if ranks is not None else default_ranks()
    out: list[int] = []
    for pt in pretokenize(text):
        out.extend(ranks[p] for p in _merge_piece(pt.encode("utf-8"), ranks))
    return out


def count_tokens(text: str, ranks: dict[bytes, int] | None = None) -> int:
    ranks = ranks if ranks is not None else default_ranks()
    n = 0
    for pt in pretokenize(text):
        n += len(_merge_piece(pt.encode("utf-8"), ranks))
    return n


# id(ranks) → (ranks, inverse).  The memo holds a STRONG reference to
# the ranks dict it was built from, so a memoized id can never be
# recycled by the allocator while its entry lives — decode() cannot
# alias a dead table's inverse onto a new dict.  Eviction (cap 8)
# drops both together; an evicted table just rebuilds on next use.
_INVERSES: dict[int, tuple[dict[bytes, int], dict[int, bytes]]] = {}


def _inverse(ranks: dict[bytes, int]) -> dict[int, bytes]:
    entry = _INVERSES.get(id(ranks))
    if entry is not None and entry[0] is ranks:
        return entry[1]
    inv = {v: k for k, v in ranks.items()}
    while len(_INVERSES) >= 8:
        # Drop-oldest (dict preserves insertion order): live tables keep
        # their memo; only the stalest entry pays a rebuild on next use.
        _INVERSES.pop(next(iter(_INVERSES)))
    _INVERSES[id(ranks)] = (ranks, inv)
    return inv


def decode(ids: list[int], ranks: dict[bytes, int] | None = None) -> str:
    """Inverse of :func:`encode`.  Byte-level BPE concatenates token
    byte sequences back to the exact original bytes; ``errors="replace"``
    mirrors tiktoken's decode when a truncation split a multi-byte
    character."""
    ranks = ranks if ranks is not None else default_ranks()
    inv = _inverse(ranks)
    return b"".join(inv[i] for i in ids).decode("utf-8", errors="replace")


def truncate_to_tokens(
    text: str, max_tokens: int, ranks: dict[bytes, int] | None = None
) -> str:
    """First ``max_tokens`` BPE tokens, decoded — the reference's
    ``truncate_text_to_tokens`` (core/embedding.py:24-31) with this
    module's rank table."""
    ranks = ranks if ranks is not None else default_ranks()
    ids = encode(text, ranks)
    if len(ids) <= max_tokens:
        return text
    return decode(ids[:max_tokens], ranks)


# --- Spark surface ----------------------------------------------------------


def bpe_count(col: Column | str) -> Column:
    """Arrow-batched BPE token count.  Python path by necessity (BPE is
    a data-dependent loop no Catalyst expression expresses); per-batch
    cost is linear in bytes, no shuffle implications — a projection."""

    @pandas_udf("int")
    def _count(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = default_ranks()  # resolved once per executor, not per row
        for s in it:
            yield s.map(lambda t: count_tokens(t, ranks) if t is not None else None)

    return _count(F.col(col) if isinstance(col, str) else col)


def bpe_truncate(col: Column | str, max_tokens: int) -> Column:
    """Arrow-batched BPE truncation to ``max_tokens`` tokens."""

    @pandas_udf("string")
    def _trunc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = default_ranks()
        for s in it:
            yield s.map(
                lambda t: truncate_to_tokens(t, max_tokens, ranks)
                if t is not None
                else None
            )

    return _trunc(F.col(col) if isinstance(col, str) else col)
