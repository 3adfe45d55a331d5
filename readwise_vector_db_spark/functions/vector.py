"""Vector math as Catalyst Column expressions.

The reference computes cosine distance inside Postgres with pgvector's
``embedding <=> $query`` operator (reference: ``db/supabase_ops.py:267``,
``core/search.py:142``).  Spark has no vector builtin, but the semantics
are a fold over two arrays — exactly what the higher-order functions
``zip_with`` + ``aggregate`` express.  These stay JVM-side (no Python
boundary) and participate in whole-stage codegen, so the hot path of the
top-k scan never leaves Tungsten.

All math is done in ``double``: inputs are cast from ``array<float>`` so
results are bit-identical with the DuckDB oracle (both engines then run
the same sequential IEEE-754 double fold).

Scale note: for a 100 TB corpus the scan cost is dominated by reading the
embedding column; precompute ``l2_norm(embedding)`` once at index-build
time (see ``sources/highlights.py``) so the per-query work is one dot
product per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array columns (double)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column | str) -> Column:
    """Divide each element by the vector's L2 norm (null-safe; zero vector → null)."""
    c = _as_double(a)
    n = l2_norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x / n))


def cosine_similarity(
    a: Column | str,
    b: Column | str,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """cos(a, b) = dot(a,b) / (|a| * |b|); pass precomputed norms to skip work.

    Null-safe: a zero-norm vector has no direction → NULL (also keeps
    ANSI mode from raising DIVIDE_BY_ZERO).
    """
    na = a_norm if a_norm is not None else l2_norm(a)
    nb = b_norm if b_norm is not None else l2_norm(b)
    denom = na * nb
    return F.when(denom > 0, dot(a, b) / denom)


def cosine_distance(
    a: Column | str,
    b: Column | str,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """pgvector's ``<=>``: 1 - cosine similarity (smaller = closer)."""
    return F.lit(1.0) - cosine_similarity(a, b, a_norm, b_norm)
